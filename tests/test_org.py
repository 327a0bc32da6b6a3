"""Org-mode chunker tests (stages/org.py vs fulltext.go:105-201)."""

import pytest

from microfts_ray.stages.org import (
    BLANK,
    BLOCK,
    HEADLINE,
    KEYWORD,
    LIST_ITEM,
    PARAGRAPH,
    TABLE_LINE,
    classify,
    for_parts,
    split_org_parts,
)

ORG = """* Headline one
some paragraph text
more of the paragraph

- item one
  continuation of item one
- item two

| a | b |
| 1 | 2 |

** Sub headline
tail paragraph
#+begin_src python
def f():
    return 1
#+end_src
"""


def _parts(s):
    return [(line, typ, s[a:b]) for line, typ, a, b in for_parts(s)]


def test_classify_basics():
    assert classify("* Head")[0] == HEADLINE
    # reference quirk: listItemPat runs on the TRIMMED line, so its
    # "[ \t]+\*" alternative can never match -> indented star is a
    # paragraph, not a list item (fulltext.go:88,195)
    assert classify("  * not headline")[0] == PARAGRAPH
    assert classify("")[0] == BLANK
    assert classify("   ")[0] == BLANK
    # reference quirk: the terminator is built as "#+end_" + "_src"
    # (fulltext.go:188 keeps group(1)'s leading underscore), so a src
    # block never sees its real "#+end_src" line and absorbs to EOF
    assert classify("#+begin_src python") == (BLOCK, "#+end__src")
    assert classify("#+title: X")[0] == KEYWORD
    assert classify("- item")[0] == LIST_ITEM
    assert classify("| a | b |")[0] == TABLE_LINE
    assert classify("plain text")[0] == PARAGRAPH
    assert classify("-----")[0] == 9  # HR
    assert classify(":drawer: x")[0] == 5  # DRAWER


def test_for_parts_structure():
    parts = _parts(ORG)
    types = [t for _, t, _ in parts]
    texts = [x for _, _, x in parts]
    assert types[0] == HEADLINE and texts[0] == "* Headline one"
    # paragraph accumulated both lines
    i = types.index(PARAGRAPH)
    assert "some paragraph text\nmore of the paragraph" == texts[i]
    # src block absorbs to EOF (the #+end__src terminator quirk)
    j = types.index(BLOCK)
    assert texts[j].startswith("#+begin_src")
    assert "return 1" in texts[j]
    assert j == len(types) - 1
    # list item with continuation absorbed
    k = types.index(LIST_ITEM)
    assert "continuation of item one" in texts[k]
    # line numbers are 1-based start lines and strictly increasing
    lines = [ln for ln, _, _ in parts]
    assert lines[0] == 1
    assert all(a < b for a, b in zip(lines, lines[1:]))


def test_split_org_parts_drops_gramless():
    parts = split_org_parts("***\n\n!!!\n\nreal words here\n")
    assert len(parts) == 1
    assert parts[0][1] == "real words here"


def test_org_chunker_via_tokenize():
    import pyarrow as pa

    from microfts_ray.stages.tokenize import tokenize_corpus_batch

    batch = pa.table(
        {
            "repo": ["r"], "path": ["p"], "commit": ["c"], "lang": ["org"],
            "content": [ORG],
        }
    )
    entries, docs = tokenize_corpus_batch(batch, chunker="org")
    assert docs["n_chunks"][0].as_py() == len(split_org_parts(ORG))
    assert entries["term"].size > 0


def test_org_oracle_engine_parity(tmp_path):
    """Build an org-mode index and compare search results vs oracle."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from microfts_ray.oracle import OracleIndex
    from microfts_ray.pipelines.build import build_index
    from microfts_ray.pipelines.query import IndexReader

    rows = [
        {"repo": "r0", "path": f"f{i}.org", "commit": "c", "lang": "org",
         "content": ORG.replace("one", f"one_{i}")}
        for i in range(6)
    ]
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), p, row_group_size=2)
    idx = str(tmp_path / "idx")
    build_index([p], idx, chunker="org", target_rows_per_part=2)
    reader = IndexReader(idx)
    oracle = OracleIndex.build(rows, chunker="org")
    got = reader.search("paragraph text").to_pylist()
    want = oracle.search("paragraph text")
    assert [(r["doc_id"], r["chunk_id"]) for r in got] == [
        (r["doc_id"], r["chunk_id"]) for r in want
    ]
    assert len(got) == 6
    t = reader.bm25_topk("headline one_3", k=3)
    w = oracle.bm25_topk("headline one_3", k=3)
    assert [(r["doc_id"], r["chunk_id"], r["score"]) for r in t] == [
        (r["doc_id"], r["chunk_id"], r["score"]) for r in w
    ]

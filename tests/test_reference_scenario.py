"""The reference README's own doc-test corpus as a conformance
fixture (FIXTURES.md §2; /root/reference/README.org:22-66).

Six chunks in one file:
    one / two three / four / four five / one two three / one three two

Expectations derived from reference semantics: exact AND matches with
word-boundary verification, ordered by file asc then chunk position
asc; missing grams exit empty; delete tombstones the group.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from microfts_ray.oracle import OracleIndex
from microfts_ray.pipelines.build import build_index
from microfts_ray.pipelines.query import IndexReader
from microfts_ray.sources.corpus import CORPUS_SCHEMA

CONTENT = "one\ntwo three\nfour\nfour five\none two three\none three two\n"
ROW = {"repo": "tst", "path": "tmp/tst", "commit": "0" * 40, "lang": "txt",
       "content": CONTENT}


@pytest.fixture(scope="module")
def reader(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refscn")
    p = str(tmp / "corpus.parquet")
    pq.write_table(pa.Table.from_pylist([ROW], schema=CORPUS_SCHEMA), p)
    idx = str(tmp / "idx")
    build_index([p], idx)
    return IndexReader(idx)


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex.build([ROW])


def test_search_one_two(reader, oracle):
    # README.org:42-47: `search DB one two` -> lines 5 and 6
    got = reader.search("one", "two").to_pylist()
    assert [r["line"] for r in got] == [5, 6]
    assert [r["text"] for r in got] == ["one two three", "one three two"]
    assert got == oracle.search("one", "two")


def test_search_single_terms(reader):
    assert [r["line"] for r in reader.search("one").to_pylist()] == [1, 5, 6]
    assert [r["line"] for r in reader.search("four").to_pylist()] == [3, 4]
    assert [r["line"] for r in reader.search("four", "five").to_pylist()] == [4]


def test_missing_gram_empty(reader):
    # fts-lmdb.go:1505-1507: any unindexed gram -> no results
    assert reader.search("zebra").num_rows == 0


def test_substring_fails_verification(reader):
    # 'on' has gram .ON present (word-start of 'one') but hasArg
    # requires word boundaries -> no match
    assert reader.search("on").num_rows == 0
    # partial mode has no interior trigram for 2 chars -> empty too
    assert reader.search("on", partial=True).num_rows == 0


def test_partial_three_chars(reader, oracle):
    # 'hre' is an interior trigram of 'three' -> partial matches
    got = reader.search("hre", partial=True).to_pylist()
    assert [r["line"] for r in got] == [2, 5, 6]
    assert got == oracle.search("hre", partial=True)


def test_delete_then_gone(reader, oracle, tmp_path):
    # README.org:58-62: delete then search finds nothing
    from microfts_ray.pipelines.update import delete_doc

    delete_doc(reader.index_dir, ROW["repo"], ROW["path"], ROW["commit"])
    r2 = IndexReader(reader.index_dir)
    assert r2.search("one", "two").num_rows == 0


def test_info_counts(reader):
    from microfts_ray.pipelines.info import index_info

    info = index_info(reader.index_dir, grams=True)
    assert info["n_docs"] == 1
    assert info["n_chunks"] == 6
    assert info["grams"]["distinct_terms"] > 0

"""CLI output-format conformance: -start-format / -end-format group
wrappers (reference flags fulltext.go:333-342, printed per file group
in fts-lmdb.go:1258-1262) over the README fixture corpus, plus the
go_printf verb subset they rely on."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from microfts_ray.cli import go_printf, main
from microfts_ray.sources.corpus import CORPUS_SCHEMA

CONTENT = "one\ntwo three\nfour\nfour five\none two three\none three two\n"
ROWS = [
    {"repo": "tst", "path": "a/a", "commit": "0" * 40, "lang": "txt",
     "content": CONTENT},
    {"repo": "tst", "path": "b/b", "commit": "0" * 40, "lang": "txt",
     "content": CONTENT},
]


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cliidx")
    p = str(tmp / "corpus.parquet")
    pq.write_table(pa.Table.from_pylist(ROWS, schema=CORPUS_SCHEMA), p)
    d = str(tmp / "idx")
    from microfts_ray.pipelines.build import build_index

    build_index([p], d)
    return d


def test_search_default_no_wrappers(idx, capsys):
    """Default start/end formats are "" — byte-identical to the
    wrapper-less output (reference defaults fts-lmdb.go:56-64)."""
    assert main(["search", idx, "three"]) == 0
    out = capsys.readouterr().out
    assert out == (
        "tst/a/a@" + "0" * 40 + ":2:two three\n"
        "tst/a/a@" + "0" * 40 + ":5:one two three\n"
        "tst/a/a@" + "0" * 40 + ":6:one three two\n"
        "tst/b/b@" + "0" * 40 + ":2:two three\n"
        "tst/b/b@" + "0" * 40 + ":5:one two three\n"
        "tst/b/b@" + "0" * 40 + ":6:one three two\n"
    )


def test_search_group_wrappers(idx, capsys):
    """-start-format/-end-format wrap each FILE group's matches, with
    the group name as the printf argument (%s / %[1]s)."""
    assert main(
        ["search", idx, "three",
         "-start-format", ">> %s\\n", "-end-format", "<< %[1]s\\n"]
    ) == 0
    out = capsys.readouterr().out
    ga = "tst/a/a@" + "0" * 40
    gb = "tst/b/b@" + "0" * 40
    assert out == (
        f">> {ga}\n"
        f"{ga}:2:two three\n{ga}:5:one two three\n{ga}:6:one three two\n"
        f"<< {ga}\n"
        f">> {gb}\n"
        f"{gb}:2:two three\n{gb}:5:one two three\n{gb}:6:one three two\n"
        f"<< {gb}\n"
    )


def test_fuzzy_sort_ignores_wrappers(idx, capsys):
    """-fuzzy -sort sorts matches across files, so group wrappers are
    suppressed (fulltext.go:326 help text)."""
    assert main(
        ["search", idx, "two three", "-fuzzy", "50", "-sort",
         "-start-format", ">>\\n", "-end-format", "<<\\n"]
    ) == 0
    out = capsys.readouterr().out
    assert ">>" not in out and "<<" not in out
    assert "two three" in out


def test_go_printf_group_verbs():
    assert go_printf("[%s]", ("g",)) == "[g]"
    assert go_printf("%[1]s %[1]s", ("g",)) == "g g"
    assert go_printf("%5s|", ("g",)) == "    g|"

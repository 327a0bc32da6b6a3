"""Salted groupby-term shuffle build vs oracle (build_shuffle.py)."""

import glob

import pytest

from microfts_ray.oracle import OracleIndex
from microfts_ray.pipelines.build_shuffle import build_index_shuffle, estimate_term_freq
from microfts_ray.pipelines.query import IndexReader
from microfts_ray.sources.corpus import gen_table, write_corpus

N_FILES = 80


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    d = tmp_path_factory.mktemp("shufcorpus")
    write_corpus(str(d), N_FILES, files_per_shard=40)
    idx = str(tmp_path_factory.mktemp("shufidx") / "idx")
    paths = sorted(glob.glob(f"{d}/*.parquet"))
    # tiny max_run forces real salting of the hot grams
    manifest = build_index_shuffle(paths, idx, max_run=200, sample_rows=40)
    rows = gen_table(0, N_FILES).to_pylist()
    return IndexReader(idx), OracleIndex.build(rows), manifest


def test_salting_happened(built):
    _reader, _oracle, manifest = built
    assert manifest["mode"] == "shuffle"
    assert manifest["salting"]["n_salted_terms"] > 0


def test_stats_match_oracle(built):
    reader, oracle, _m = built
    g = reader.manifest["global"]
    assert g["n_docs"] == N_FILES
    assert g["n_chunks"] == oracle.n_chunks
    assert g["sum_dl"] == oracle.sum_dl


@pytest.mark.parametrize("query", ["def", "import mod_1", "return a"])
def test_bm25_identical_to_oracle(built, query):
    reader, oracle, _m = built
    got = reader.bm25_topk(query, k=10)
    want = oracle.bm25_topk(query, k=10)
    assert [(r["doc_id"], r["chunk_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["chunk_id"], r["score"]) for r in want
    ]


def test_candidates_and_fuzzy(built):
    reader, oracle, _m = built
    from microfts_ray.functions.grams import gram_set

    got = reader.candidates(gram_set("def"))
    want = oracle.candidates(gram_set("def"))
    assert {(int(d), int(c)) for d, c in zip(got.doc_ids, got.chunk_ids)} == want
    f_got = reader.fuzzy("def f_1(a, b)", threshold=0.6, sort_all=True).to_pylist()
    f_want = oracle.fuzzy("def f_1(a, b)", threshold=0.6, sort_all=True)
    assert [(r["doc_id"], r["chunk_id"]) for r in f_got] == [
        (r["doc_id"], r["chunk_id"]) for r in f_want
    ]


def test_merge_consolidates_shuffle_output(built, tmp_path):
    reader, oracle, _m = built
    from microfts_ray.pipelines.merge import merge_index

    merge_index(reader.index_dir, n_shards=4, mode="rewrite")
    r2 = IndexReader(reader.index_dir)
    assert r2.shards
    # exactly one run per term after rewrite-merge
    for seg in r2.shards:
        assert len(set(seg.terms.tolist())) == seg.terms.size
    got = r2.bm25_topk("import mod_1", k=10)
    want = oracle.bm25_topk("import mod_1", k=10)
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_freq_estimate_shape(built, tmp_path):
    import numpy as np

    d = str(tmp_path / "c")
    write_corpus(d, 20, files_per_shard=20)
    est = estimate_term_freq(sorted(glob.glob(f"{d}/*.parquet")), sample_rows=10)
    assert est.shape == (50653,)
    assert est.sum() > 0

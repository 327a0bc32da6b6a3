"""End-to-end build + query vs the single-threaded oracle.

The core invariant (BASELINE.json north_rule / FIXTURES.md §5): the
distributed engine reproduces the oracle's results — ids AND scores,
rank-identically — at every partition count.
"""

import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from microfts_ray.oracle import OracleIndex
from microfts_ray.pipelines.build import build_index, plan_partitions
from microfts_ray.pipelines.query import IndexReader
from microfts_ray.sources.corpus import gen_table, write_corpus

N_FILES = 120

QUERIES = [
    ("def",),
    ("import", "mod_1"),
    ("return a",),
    ("DEF",),
    ("a + b",),
    ("nonexistent_zzz_xq",),
    ("Handler7",),
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    write_corpus(str(d), N_FILES, files_per_shard=50)
    return str(d)


@pytest.fixture(scope="module")
def oracle(corpus_dir):
    rows = []
    for i in range(0, N_FILES, 50):
        rows.extend(gen_table(i, min(50, N_FILES - i)).to_pylist())
    return OracleIndex.build(rows)


def _build(corpus_dir, tmp, rows_per_part):
    import glob

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    index_dir = f"{tmp}/index_{rows_per_part}"
    build_index(paths, index_dir, target_rows_per_part=rows_per_part)
    return IndexReader(index_dir)


@pytest.fixture(scope="module", params=[15, 1000, "merged"])
def reader(request, corpus_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("idx")
    if request.param == "merged":
        r = _build(corpus_dir, tmp, 20)
        from microfts_ray.pipelines.merge import merge_index

        merge_index(r.index_dir, n_shards=4)
        r2 = IndexReader(r.index_dir)
        assert r2.shards, "merged shards must be active"
        return r2
    return _build(corpus_dir, tmp, request.param)


def test_manifest_stats(reader, oracle):
    g = reader.manifest["global"]
    assert g["n_docs"] == N_FILES
    assert g["n_chunks"] == oracle.n_chunks
    assert g["sum_dl"] == oracle.sum_dl


def test_content_sha_invariant(reader, corpus_dir):
    # per-row invariant: manifest sha256 == sha256 of source content
    import glob

    from microfts_ray.sources.corpus import corpus_sha256

    src = {}
    for p in sorted(glob.glob(f"{corpus_dir}/*.parquet")):
        t = pq.read_table(p, columns=["repo", "path", "commit", "content"])
        for r in t.to_pylist():
            src[(r["repo"], r["path"], r["commit"])] = corpus_sha256(r["content"])
    checked = 0
    for seg in reader.segments:
        d = seg.docs().to_pylist()
        for r in d:
            assert r["content_sha256"] == src[(r["repo"], r["path"], r["commit"])]
            checked += 1
    assert checked == N_FILES


@pytest.mark.parametrize("args", QUERIES)
def test_search_matches_oracle(reader, oracle, args):
    got = reader.search(*args).to_pylist()
    want = oracle.search(*args)
    assert [(r["doc_id"], r["chunk_id"], r["offset"]) for r in got] == [
        (r["doc_id"], r["chunk_id"], r["offset"]) for r in want
    ]


def test_limit_per_group_truncates_before_verify(tmp_path_factory):
    """Reference truncates the per-group candidate list BEFORE
    word-boundary verification (fts-lmdb.go:1359): a gram false
    positive in an earlier chunk consumes the limit slot even though
    it fails verify. Engine must agree with the oracle (here: [])."""
    import pyarrow as pa

    from microfts_ray.sources.corpus import CORPUS_SCHEMA

    rows = [
        {
            "repo": "o/r",
            "path": "f.py",
            "commit": "a" * 40,
            "lang": "py",
            # chunk0 'abx yab cd' is a gram candidate for ('ab','cd')
            # but fails word-boundary verify; chunk1 'ab cd' verifies
            "content": "abx yab cd\nab cd\n",
        }
    ]
    tmp = tmp_path_factory.mktemp("limitfp")
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA), src)
    idx = str(tmp / "idx")
    build_index([src], idx, target_rows_per_part=10)
    r = IndexReader(idx)
    o = OracleIndex.build(rows)
    for lim in (None, 1, 2):
        got = r.search("ab", "cd", limit_per_group=lim).to_pylist()
        want = o.search("ab", "cd", limit_per_group=lim)
        assert [(x["doc_id"], x["chunk_id"]) for x in got] == [
            (x["doc_id"], x["chunk_id"]) for x in want
        ], lim
    assert r.search("ab", "cd", limit_per_group=1).num_rows == 0
    assert len(r.search("ab", "cd")) == 1


def test_partial_search_matches_oracle(reader, oracle):
    got = reader.search("retur", partial=True).to_pylist()
    want = oracle.search("retur", partial=True)
    assert [(r["doc_id"], r["chunk_id"]) for r in got] == [
        (r["doc_id"], r["chunk_id"]) for r in want
    ]
    assert len(got) > 0  # 'return' lines must match 'retur' partial


def test_fuzzy_matches_oracle(reader, oracle):
    got = reader.fuzzy("def f_1(a, b)", threshold=0.6, sort_all=True).to_pylist()
    want = oracle.fuzzy("def f_1(a, b)", threshold=0.6, sort_all=True)
    assert [(r["doc_id"], r["chunk_id"], round(r["percent"], 9)) for r in got] == [
        (r["doc_id"], r["chunk_id"], round(r["percent"], 9)) for r in want
    ]
    assert len(got) > 0


def test_file_mode_matches_oracle(reader, oracle):
    got = reader.search_file("def", "import")
    want = oracle.search_file("def", "import")
    assert [(r["doc_id"], r["first_chunks"]) for r in got] == [
        (r["doc_id"], r["first_chunks"]) for r in want
    ]
    assert len(got) > 0


@pytest.mark.parametrize(
    "query", ["def", "import mod_1", "return a", "x_7", "def f_1(a, b):"]
)
def test_bm25_rank_and_score_identical(reader, oracle, query):
    got = reader.bm25_topk(query, k=10)
    want = oracle.bm25_topk(query, k=10)
    assert [(r["doc_id"], r["chunk_id"]) for r in got] == [
        (r["doc_id"], r["chunk_id"]) for r in want
    ]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], abs=0, rel=0) or g[
            "score"
        ] == w["score"], (g, w)


@pytest.mark.parametrize("query", ["def", "import mod_1", "uniq"])
def test_bm25_docs_rank_identical(reader, oracle, query):
    got = reader.bm25_topk_docs(query, k=10)
    want = oracle.bm25_topk_docs(query, k=10)
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_selective_unique_token(reader, oracle, corpus_dir):
    # every file has a uniq_<hex> token; pick file 3's
    import hashlib

    uniq = "uniq_" + hashlib.sha256(b"1337:3").hexdigest()[:12]
    got = reader.search(uniq).to_pylist()
    assert len(got) == 1
    assert got[0]["text"].endswith(uniq)


def test_resume_skips_completed_partitions(corpus_dir, tmp_path_factory):
    import glob

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("resume"))
    index_dir = f"{tmp}/idx"
    m1 = build_index(paths, index_dir, target_rows_per_part=30)
    # simulate a crashed run: delete the manifest but keep checkpoints
    import os

    os.unlink(os.path.join(index_dir, "manifest.json"))
    # drop one partition's checkpoint + segment: only it should rebuild
    victim = m1["partitions"][2]["pid"]
    os.unlink(os.path.join(index_dir, "_manifest", f"part-{victim}.json"))
    shutil.rmtree(os.path.join(index_dir, "segments", victim))
    m2 = build_index(paths, index_dir, target_rows_per_part=30)
    assert m1["global"] == m2["global"]
    assert [p["pid"] for p in m1["partitions"]] == [p["pid"] for p in m2["partitions"]]


def test_partition_plan_deterministic(corpus_dir):
    import glob

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    assert plan_partitions(paths, 30) == plan_partitions(paths, 30)


@pytest.mark.parametrize("query", ["def", "import mod_1", "return a", "def f_1(a, b):"])
def test_bm25_maxscore_path_identical(reader, oracle, query):
    """The pruned MaxScore path returns the same ids AND scores."""
    got = reader.bm25_topk(query, k=10, prune_threshold=0)  # force pruning
    want = oracle.bm25_topk(query, k=10)
    assert [(r["doc_id"], r["chunk_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["chunk_id"], r["score"]) for r in want
    ]


@pytest.mark.parametrize("query", ["def", "import mod_1", "def f_1(a, b):"])
def test_bm25_scale_path_block_selective(reader, oracle, query):
    """The NON-dense path (what a 10^12-doc shard would run): MaxScore
    admission + block-skip-index candidate gathers. Forced by denying
    the dense space; results must stay bit-identical to the oracle,
    and uncached hot terms must never fully decode (the gather goes
    through _pairs_tfdl -> decode_run_blocks)."""
    r2 = IndexReader(reader.index_dir)
    r2._dense_space = lambda cap=0: None  # force the scale path
    got = r2.bm25_topk(query, k=10, prune_threshold=0)
    want = oracle.bm25_topk(query, k=10)
    assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
        (h["doc_id"], h["chunk_id"], h["score"]) for h in want
    ]


def test_bm25_block_max_admission_skips_blocks(tmp_path_factory):
    """Block-max WAND: on a skewed corpus (a few short high-tf lines
    among many long tf=1 lines) the non-dense admission path must
    SKIP blocks of the hot terms — the stored bmax_tf/bmin_dl bounds
    consumed, not dead weight — while scores stay bit-identical to
    the oracle. Single-gram queries never reach block mode (admission
    fills the accumulator in one full merge), hence two terms here."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tmp_path_factory.mktemp("bmw")
    med = " ".join(f"w{j}xk" for j in range(13))
    long_ = " ".join(f"w{j}xk" for j in range(55))
    rows = []
    for i in range(50):
        if i < 26:  # medium lines: the top scorers (short dl)
            lines = [f"qzx qzy {med}"] * 40
        else:  # long lines: low per-entry contribution (big dl)
            lines = [f"qzx qzy {long_}"] * 40
        rows.append(
            {
                "repo": "org/blockmax",
                "path": f"src/f_{i}.py",
                "commit": "c" * 40,
                "lang": "py",
                "content": "\n".join(lines) + "\n",
            }
        )
    corpus = f"{tmp}/corpus.parquet"
    pq.write_table(
        pa.Table.from_pylist(rows), corpus, row_group_size=25
    )
    idx = f"{tmp}/idx"
    build_index([corpus], idx, target_rows_per_part=50)
    oracle = OracleIndex.build(rows)
    r2 = IndexReader(idx)
    r2._dense_space = lambda cap=0: None  # force the scale path
    got = r2.bm25_topk("qzx qzy", k=5, prune_threshold=0)
    want = oracle.bm25_topk("qzx qzy", k=5)
    assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
        (h["doc_id"], h["chunk_id"], h["score"]) for h in want
    ]
    assert r2.blocks_admit_total > 0, "block-max admission never engaged"
    assert r2.blocks_admit_skipped > 0, "no block was ever skipped"


def test_pairs_tfdl_block_gather_matches_full_decode(reader):
    """Block-selective gather == full-decode pair lookup for arbitrary
    candidate sets (incl. misses)."""
    import numpy as np

    from microfts_ray.functions.grams import gram_set

    g = sorted(gram_set("def"))[0]
    r2 = IndexReader(reader.index_dir)
    full = r2.term_postings(g)
    assert len(full) > 0
    rng = np.random.default_rng(3)
    take = rng.choice(len(full), size=min(50, len(full)), replace=False)
    d = np.concatenate([full.doc_ids[take], np.array([12345], dtype=np.uint64)])
    c = np.concatenate([full.chunk_ids[take], np.array([0], dtype=np.uint64)])
    # uncached reader: forces the block path
    r3 = IndexReader(reader.index_dir)
    tf, dl, hit = r3._pairs_tfdl(g, d, c)
    assert hit[:-1].all() and not hit[-1]
    assert (tf[:-1] == full.tfs[take]).all()
    assert (dl[:-1] == full.dls[take]).all()


def test_bm25_maxscore_with_heavy_tombstones(corpus_dir, tmp_path_factory):
    """Tombstoned docs must not inflate the MaxScore admission
    threshold theta: delete the docs holding the current top-k and
    check the pruned path still matches the live-corpus oracle's
    ids (scores shift because df/avgdl keep counting tombstones —
    documented drift — so compare ids against a pruned-path-vs-union
    self-check AND oracle ids after compact)."""
    import glob

    from microfts_ray.pipelines.update import delete_doc
    from microfts_ray.sources.corpus import gen_table

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("tombmax"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    r = IndexReader(idx)
    rows = []
    for i in range(0, N_FILES, 50):
        rows.extend(gen_table(i, min(50, N_FILES - i)).to_pylist())
    by_id = {}
    from microfts_ray.stages.tokenize import doc_id_for

    for row in rows:
        by_id[doc_id_for(row["repo"], row["path"], row["commit"])] = row
    # tombstone every doc in the current top-10 for a hot query
    top = r.bm25_topk("def", k=10, prune_threshold=0)
    for h in {t["doc_id"] for t in top}:
        row = by_id[h]
        delete_doc(idx, row["repo"], row["path"], row["commit"])
    r2 = IndexReader(idx)
    pruned = r2.bm25_topk("def", k=10, prune_threshold=0)
    union = r2.bm25_topk("def", k=10, prune_threshold=10**12)
    assert [(x["doc_id"], x["chunk_id"], x["score"]) for x in pruned] == [
        (x["doc_id"], x["chunk_id"], x["score"]) for x in union
    ]
    assert pruned and all(x["doc_id"] not in {t["doc_id"] for t in top} for x in pruned)


def test_warmcache_roundtrip_and_invalidation(corpus_dir, tmp_path_factory, oracle):
    """prewarm(persist=True) writes a warm cache; a fresh reader warms
    from mmap with identical query results; any index change (update)
    invalidates the cache via the manifest hash."""
    import glob
    import os

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("wc"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    r1 = IndexReader(idx)
    n1 = r1.prewarm(min_entries=100, persist=True)
    assert glob.glob(os.path.join(idx, "warmcache", "*", "meta.json"))  # content-addressed
    r2 = IndexReader(idx)
    n2 = r2.prewarm(min_entries=100)
    assert n2 > 0 and r2._sorted_kc  # warmed from the cache
    for q in ["def", "import mod_1"]:
        got = r2.bm25_topk(q, k=10)
        want = oracle.bm25_topk(q, k=10)
        assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
            (h["doc_id"], h["chunk_id"], h["score"]) for h in want
        ]
    # index change -> stale cache must NOT load
    from microfts_ray.pipelines.update import delete_doc
    from microfts_ray.sources.corpus import gen_table

    row = gen_table(0, 1).to_pylist()[0]
    delete_doc(idx, row["repo"], row["path"], row["commit"])
    r3 = IndexReader(idx)
    assert not r3._load_warmcache()


def test_merge_emitted_warm_cache(corpus_dir, tmp_path_factory, oracle):
    """emit_warm_cache after a merge persists a SHARDED warm cache as
    an index artifact: a fresh reader's prewarm() mmaps it into a
    representation BIT-IDENTICAL to the decode path, a term-range
    prewarm loads only its range, queries stay oracle-identical, and
    a reader asking for deeper warming than emitted falls back to
    decode instead of trusting the shallow cache."""
    import glob
    import os

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("ewc"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    from microfts_ray.pipelines.merge import merge_index
    from microfts_ray.pipelines.query import emit_warm_cache

    merge_index(idx, n_shards=4)
    n = emit_warm_cache(idx, min_entries=50)
    assert n > 0
    assert glob.glob(os.path.join(idx, "warmcache", "*", "sharded.json"))
    assert glob.glob(os.path.join(idx, "warmcache", "*", "shard=*", "meta.json"))
    # reference representation: a reader forced down the decode path
    r_ref = IndexReader(idx)
    r_ref._prewarm_build(min_entries=50, parallel=False, persist=False)
    # mmap-loaded reader
    r2 = IndexReader(idx)
    assert r2.prewarm(min_entries=50) > 0
    assert set(r2._sorted_kc) == set(r_ref._sorted_kc)
    for t, (k, c) in r_ref._sorted_kc.items():
        k2, c2 = r2._sorted_kc[t]
        assert np.array_equal(np.asarray(k2), k)
        assert np.array_equal(np.asarray(c2), c)  # float-bit-identical
    for q in ["def", "import mod_1"]:
        got = r2.bm25_topk(q, k=10)
        want = oracle.bm25_topk(q, k=10)
        assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
            (h["doc_id"], h["chunk_id"], h["score"]) for h in want
        ]
    # term-range load: only in-range terms, all from the cache
    bounds = r2.manifest["merged"]["bounds"]
    lo, hi = bounds[1], bounds[3]
    r3 = IndexReader(idx)
    r3.prewarm(min_entries=50, term_range=(lo, hi))
    assert r3._sorted_kc and all(lo <= t < hi for t in r3._sorted_kc)
    in_range = {t for t in r_ref._sorted_kc if lo <= t < hi}
    assert set(r3._sorted_kc) == in_range
    # deeper warming than emitted -> cache refused, decode fallback
    r4 = IndexReader(idx)
    assert not r4._load_warmcache(min_entries=1)
    assert r4.prewarm(min_entries=1) > 0
    assert len(r4._sorted_kc) >= len(r2._sorted_kc)


def test_merge_inline_warm_emission_bit_identical(
    corpus_dir, tmp_path_factory, oracle, monkeypatch
):
    """merge_index(emit_warm=True) stages each shard's warm dir from
    the merge task's IN-MEMORY blob table (no re-read of the merge
    output): every emitted dir must carry the staged provenance flag,
    and the cache must be BYTE-identical to one emitted by the
    file-reading fallback path (emit_warm_cache on a cold index).
    Pinned to MICROFTS_WARM_FILES=inline — this test's subject is the
    npy FILE bytes, which the default async mode writes later (the
    async flow has its own test below)."""
    import glob
    import json
    import os
    import shutil as sh

    from microfts_ray.pipelines.merge import merge_index
    from microfts_ray.pipelines.query import emit_warm_cache

    monkeypatch.setenv("MICROFTS_WARM_FILES", "inline")

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("iwe"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    merge_index(idx, n_shards=4, emit_warm=True, warm_inline=True,
                warm_min_entries=50)
    markers = glob.glob(os.path.join(idx, "warmcache", "*", "sharded.json"))
    assert len(markers) == 1
    gen_dir = os.path.dirname(markers[0])
    with open(markers[0]) as f:
        marker = json.load(f)
    assert marker["n_terms"] > 0
    for name in marker["dirs"]:
        with open(os.path.join(gen_dir, name, "meta.json")) as f:
            meta = json.load(f)
        assert meta.get("staged") is True, f"{name} was fallback-emitted"
    # file-reading fallback on the same index -> byte-identical cache
    aside = os.path.join(idx, "warmcache_inline")
    os.rename(os.path.join(idx, "warmcache"), aside)
    n = emit_warm_cache(idx, min_entries=50)
    assert n == marker["n_terms"]
    for name in marker["dirs"]:
        with open(os.path.join(gen_dir, name, "meta.json")) as f:
            m = json.load(f)
        fns = (
            ("keys.npy", "tf.npy", "dl.npy")
            if m.get("fmt") == 2
            else ("keys.npy", "contribs.npy")
        )
        for fn in fns:
            with open(os.path.join(gen_dir.replace("warmcache", "warmcache_inline"), name, fn), "rb") as f:
                a = f.read()
            with open(os.path.join(gen_dir, name, fn), "rb") as f:
                b = f.read()
            assert a == b, f"{name}/{fn} differs between inline and fallback"
    sh.rmtree(aside)
    # served results stay oracle-identical off the inline-emitted cache
    r = IndexReader(idx)
    assert r.prewarm(min_entries=50) > 0
    for q in ["def", "import mod_1"]:
        got = r.bm25_topk(q, k=10)
        want = oracle.bm25_topk(q, k=10)
        assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
            (h["doc_id"], h["chunk_id"], h["score"]) for h in want
        ]


def test_merge_inline_warm_emission_hot_term(tmp_path_factory):
    """An ultra-hot split term's warm data is emitted into its own
    shard=hot-<term> dir (staged from the hot split's in-memory rows)
    and the loader serves the term from it."""
    import glob
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from microfts_ray.pipelines.merge import merge_index

    tmp = str(tmp_path_factory.mktemp("ihw"))
    rows = []
    for i in range(60):
        lines = [
            f"mix zzq u{i}x{j}" if j % 10 == 0 else "zzq" for j in range(30)
        ]
        rows.append(
            {
                "repo": "org/hot",
                "path": f"src/f_{i}.py",
                "commit": "d" * 40,
                "lang": "py",
                "content": "\n".join(lines) + "\n",
            }
        )
    corpus = f"{tmp}/corpus.parquet"
    pq.write_table(pa.Table.from_pylist(rows), corpus, row_group_size=20)
    idx = f"{tmp}/idx"
    build_index([corpus], idx, target_rows_per_part=10)
    manifest = merge_index(
        idx, n_shards=8, emit_warm=True, warm_inline=True, warm_min_entries=50
    )
    hot_terms = sorted({e["term"] for e in manifest["merged"]["hot"]})
    assert hot_terms
    markers = glob.glob(os.path.join(idx, "warmcache", "*", "sharded.json"))
    gen_dir = os.path.dirname(markers[0])
    with open(markers[0]) as f:
        marker = json.load(f)
    hot_dirs = [n for n in marker["dirs"] if n.startswith("shard=hot-")]
    assert hot_dirs == [f"shard=hot-{t:05d}" for t in hot_terms]
    for name in hot_dirs:
        with open(os.path.join(gen_dir, name, "meta.json")) as f:
            meta = json.load(f)
        assert meta.get("staged") is True
        assert meta["terms"]  # hot terms are warm by definition
    # hot terms load from their dirs; range shards exclude them
    r = IndexReader(idx)
    assert r.prewarm(min_entries=50) > 0
    for t in hot_terms:
        assert t in r._sorted_kc
        # the warm representation matches a decode-path reader exactly
        r_ref = IndexReader(idx)
        assert r_ref._dense_space() is not None
        sk = r_ref._sorted_keys(t)
        assert np.array_equal(np.asarray(r._sorted_kc[t][0]), sk[0])
        assert np.array_equal(np.asarray(r._sorted_kc[t][1]), sk[1])


def test_warm_terms_bulk_bit_identical(reader):
    """The bulk warm path (one decode_terms_table pass per source)
    must produce EXACTLY the per-term _sorted_keys representation —
    keys equal, contribs float-bit-identical, lengths equal — on both
    plain and rank-encoded (dict) rows, with and without prebuilt
    broadcast maps."""
    r_bulk = IndexReader(reader.index_dir)
    r_ref = IndexReader(reader.index_dir)
    assert r_ref._dense_space() is not None
    totals: dict[int, int] = {}
    for seg in r_bulk.shards or r_bulk.segments:
        for t, n in zip(seg.terms.tolist(), seg.ns.tolist()):
            totals[t] = totals.get(t, 0) + int(n)
    hot = sorted(t for t, n in totals.items() if n >= 50)
    assert hot, "fixture corpus must produce warm-eligible terms"
    bulk = r_bulk.warm_terms_bulk(hot)
    maps = r_bulk._warm_maps()
    r_maps = IndexReader(reader.index_dir)
    bulk2 = r_maps.warm_terms_bulk(hot, maps=maps)
    assert set(bulk) == set(bulk2)
    for t in hot:
        sk = r_ref._sorted_keys(t)
        if sk is None:
            assert t not in bulk
            continue
        k, c, n = bulk[t]
        assert np.array_equal(sk[0], k)
        assert np.array_equal(sk[1], c)  # float BIT identity
        assert n == sk[0].size
        k2, c2, _n2 = bulk2[t]
        assert np.array_equal(k, k2) and np.array_equal(c, c2)


def test_warm_compact_hydration_bit_identical(reader):
    """The COMPACT (fmt 2) warm shape stores (int32 keys, integer
    tf/dl) and readers recompute exact f64 contribs at load: the
    hydrated contribs must be float-BIT-identical to the fmt-1
    contribs for every term, and the keys equal as integers."""
    from microfts_ray.pipelines.query import _contrib_arr, _idf_val

    r = IndexReader(reader.index_dir)
    totals: dict[int, int] = {}
    for seg in r.shards or r.segments:
        for t, n in zip(seg.terms.tolist(), seg.ns.tolist()):
            totals[t] = totals.get(t, 0) + int(n)
    hot = sorted(t for t, n in totals.items() if n >= 50)
    assert hot
    exact = r.warm_terms_bulk(hot)
    r2 = IndexReader(reader.index_dir)
    comp = r2.warm_terms_bulk(hot, compact=True)
    assert set(exact) == set(comp)
    for t in hot:
        if t not in exact:
            continue
        k, c, n = exact[t]
        ck, tf, dl = comp[t]
        assert ck.dtype == np.int32  # dense space fits at fixture scale
        assert np.array_equal(k, ck.astype(np.int64))
        hyd = _contrib_arr(_idf_val(r2.n_chunks, ck.size), tf, dl, r2.avgdl)
        assert np.array_equal(c, hyd)  # float BIT identity
        assert n == ck.size


def test_prehydrate_fans_out_and_shares(corpus_dir, tmp_path_factory, oracle):
    """The first loader of a compact generation fans the per-dir
    contrib hydration out as Ray tasks that park results in the warm
    store: after one _load_warmcache every needed fmt-2 dir has a
    memoized hydrated ref (so pool actors share ONE plasma copy and
    hydration_todo returns empty for the next reader), and serving
    stays oracle-identical."""
    import glob
    import json
    import os

    import ray as _ray

    from microfts_ray.pipelines.merge import merge_index
    from microfts_ray.pipelines.query import _warmstore

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("hydr"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    merge_index(idx, n_shards=4, emit_warm=True, warm_inline=True,
                warm_min_entries=50)
    r = IndexReader(idx)
    assert r._load_warmcache(min_entries=50)
    store = _warmstore()
    assert store is not None
    sha = r._manifest_sha()
    markers = glob.glob(os.path.join(idx, "warmcache", "*", "sharded.json"))
    assert len(markers) == 1
    gen_dir = os.path.dirname(markers[0])
    with open(markers[0]) as f:
        names = json.load(f)["dirs"]
    dirs = [os.path.join(gen_dir, n) for n in names]
    # every non-empty fmt-2 dir is hydrated in the store now...
    for dd in dirs:
        with open(os.path.join(dd, "meta.json")) as f:
            meta = json.load(f)
        if meta.get("fmt") == 2 and meta["terms"]:
            assert _ray.get(store.get_hydrated.remote(dd)) is not None, dd
    # ...so a second reader has nothing left to hydrate
    assert _ray.get(store.hydration_todo.remote(dirs, sha)) == []
    r2 = IndexReader(idx)
    assert r2._load_warmcache(min_entries=50)
    for q in ["def", "import mod_1"]:
        got = r2.bm25_topk(q, k=10)
        want = oracle.bm25_topk(q, k=10)
        assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
            (h["doc_id"], h["chunk_id"], h["score"]) for h in want
        ]


def test_reemit_deeper_invalidates_stale_hydration(corpus_dir, tmp_path_factory, oracle):
    """Re-emitting a warm dir AT THE SAME PATH with a smaller
    min_entries (deeper cache) replaces the store entry; a hydrated
    contribs ref memoized for the OLD entry must be invalidated, or
    the next loader would slice the old (shorter) f64 array with the
    new meta's offsets — wrong scores or out-of-bounds gathers."""
    import glob
    import os

    import ray as _ray

    from microfts_ray.pipelines.merge import merge_index
    from microfts_ray.pipelines.query import _warmstore, emit_warm_cache

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("reemit"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    merge_index(idx, n_shards=4)
    emit_warm_cache(idx, min_entries=200)
    r1 = IndexReader(idx)
    assert r1._load_warmcache(min_entries=200)  # hydrates + parks
    n_shallow = len(r1._sorted_kc)
    # deeper re-emit at the SAME dir paths: drop the generation
    # marker (emit_warm_cache's no-op guard) so every dir re-emits —
    # _warm_dir_done returns -1 for each (200 > 20) and put_dir_refs
    # REPLACES the store entries the hydrations were memoized for
    marker = glob.glob(os.path.join(idx, "warmcache", "*", "sharded.json"))[0]
    os.remove(marker)
    emit_warm_cache(idx, min_entries=20)
    r2 = IndexReader(idx)
    assert r2._load_warmcache(min_entries=20)
    assert len(r2._sorted_kc) > n_shallow, "deeper cache not re-emitted"
    # every warm term's (keys, contribs) must match a fresh decode
    # bit-for-bit — a stale hydration would misalign the slices
    r_ref = IndexReader(idx)
    assert r_ref._dense_space() is not None
    for t in sorted(r2._sorted_kc):
        sk_ref = r_ref._sorted_keys(t)
        k, c = r2._sorted_kc[t]
        assert np.array_equal(np.asarray(k, dtype=np.int64), sk_ref[0]), t
        assert np.array_equal(np.asarray(c), sk_ref[1]), t
    for q in ["def", "import mod_1"]:
        got = r2.bm25_topk(q, k=10)
        want = oracle.bm25_topk(q, k=10)
        assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
            (h["doc_id"], h["chunk_id"], h["score"]) for h in want
        ], q
    # unit-level: a re-put at the same path clears the memoized ref
    store = _warmstore()
    dd = "/tmp/fake_dir_hyd"
    meta = {"terms": [1], "offsets": [0, 1], "manifest_sha": "x", "fmt": 2}
    _ray.get(store.put_dir.remote(dd, meta, np.array([3], np.int32),
                                  (np.array([1], np.uint16),
                                   np.array([4], np.uint16))))
    ref = _ray.put(np.array([0.5]))
    _ray.get(store.put_hydrated.remote(dd, [ref]))
    assert _ray.get(store.get_hydrated.remote(dd)) is not None
    _ray.get(store.put_dir.remote(dd, meta, np.array([3, 5], np.int32),
                                  (np.array([1, 2], np.uint16),
                                   np.array([4, 4], np.uint16))))
    assert _ray.get(store.get_hydrated.remote(dd)) is None
    _ray.get(store.drop_prefix.remote(dd))


def test_write_warm_dir_compact_dtype_guards(tmp_path):
    """Per-dir integer downcasts must widen when values overflow the
    narrow type (a wrapped tf/dl would silently corrupt scores), and
    keys stay int64 when the dense space exceeds int32."""
    import json as _json

    from microfts_ray.pipelines.query import _write_warm_dir, _hydrate_contribs, _contrib_arr, _idf_val

    out = {
        7: (
            np.array([3, 5], np.int64),
            np.array([70_000, 2], np.uint64),  # tf > uint16
            np.array([9, 100_000], np.uint64),  # dl > uint16
        )
    }
    dd = str(tmp_path / "d")
    _write_warm_dir(dd, out, 0, 10, "shaX", 1, dense_k=100,
                    files="inline", compact=True, bm25_stats=(1000, 12.0))
    meta = _json.load(open(f"{dd}/meta.json"))
    assert meta["fmt"] == 2
    keys = np.load(f"{dd}/keys.npy")
    tf = np.load(f"{dd}/tf.npy")
    dl = np.load(f"{dd}/dl.npy")
    assert keys.dtype == np.int32 and tf.dtype == np.uint32 and dl.dtype == np.uint32
    assert tf.tolist() == [70_000, 2] and dl.tolist() == [9, 100_000]
    hyd = _hydrate_contribs(meta, tf, dl, 1000, 12.0)
    want = _contrib_arr(_idf_val(1000, 2), out[7][1], out[7][2], 12.0)
    assert np.array_equal(hyd, want)
    # dense space beyond int32: keys stay int64
    big = {7: (np.array([2**31 + 5], np.int64), np.array([1], np.uint64),
               np.array([4], np.uint64))}
    dd2 = str(tmp_path / "d2")
    _write_warm_dir(dd2, big, 0, 10, "shaX", 1, dense_k=2**31 + 10,
                    files="inline", compact=True, bm25_stats=(1000, 12.0))
    assert np.load(f"{dd2}/keys.npy").dtype == np.int64


def test_validate_index(reader):
    from microfts_ray.pipelines.build import validate_index

    v = validate_index(reader.index_dir)
    assert v["ok"] and v["n_docs"] == N_FILES and v["duplicate_doc_ids"] == 0


def test_merge_splits_ultra_hot_term(tmp_path_factory):
    """A gram carrying more mass than a whole target shard must be
    split by doc range into its own sub-shards (merge.py's declared
    escalation): shard mass stays within 2x of balanced and queries
    are unchanged vs the oracle."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from microfts_ray.pipelines.merge import merge_index

    tmp = str(tmp_path_factory.mktemp("hotsplit"))
    rows = []
    for i in range(60):
        # "zzq" is in EVERY line (its grams carry most posting mass);
        # every 10th line mixes in distinct words for AND queries
        lines = [
            f"mix zzq u{i}x{j}" if j % 10 == 0 else "zzq" for j in range(30)
        ]
        rows.append(
            {
                "repo": "org/hot",
                "path": f"src/f_{i}.py",
                "commit": "d" * 40,
                "lang": "py",
                "content": "\n".join(lines) + "\n",
            }
        )
    corpus = f"{tmp}/corpus.parquet"
    pq.write_table(pa.Table.from_pylist(rows), corpus, row_group_size=20)
    idx = f"{tmp}/idx"
    build_index([corpus], idx, target_rows_per_part=10)
    manifest = merge_index(idx, n_shards=8)
    hot = manifest["merged"]["hot"]
    assert hot, "no hot term was split"
    terms_split = {e["term"] for e in hot}
    # per-unit masses: regular shards + hot sub-shards — no unit above
    # 2x the balanced target (the criterion the split exists for)
    masses = [s["stats"]["n_postings"] for s in manifest["merged"]["shards"]]
    masses += [e["stats"]["n_postings"] for e in hot]
    assert max(masses) <= 2 * (sum(masses) / 8)
    # a split term must have >1 sub-shard and route through them
    r = IndexReader(idx)
    t0 = next(iter(terms_split))
    assert len(r.hot_segments[t0]) > 1
    assert r._term_sources(t0) == r.hot_segments[t0]
    # queries unchanged vs the oracle (the hot term spans sub-shards)
    oracle = OracleIndex.build(rows)
    got = r.search("zzq", "mix").to_pylist()
    want = oracle.search("zzq", "mix")
    assert got and [
        (h["group"], h["doc_id"], h["chunk_id"]) for h in got
    ] == [(h["group"], h["doc_id"], h["chunk_id"]) for h in want]
    gb = r.bm25_topk("zzq mix", k=5)
    wb = oracle.bm25_topk("zzq mix", k=5)
    assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in gb] == [
        (h["doc_id"], h["chunk_id"], h["score"]) for h in wb
    ]
    # deleting a doc after a hot-split merge must keep queries correct
    # (tombstone anti-join applies across hot sub-shards too)
    from microfts_ray.pipelines.update import delete_doc

    victim = rows[7]
    delete_doc(idx, victim["repo"], victim["path"], victim["commit"])
    r2 = IndexReader(idx)
    got2 = r2.search("zzq", "mix").to_pylist()
    want2 = [
        h for h in oracle.search("zzq", "mix")
        if h["group"] != f"{victim['repo']}/{victim['path']}@{victim['commit']}"
    ]
    assert [(h["group"], h["chunk_id"]) for h in got2] == [
        (h["group"], h["chunk_id"]) for h in want2
    ]


def test_merge_resume_per_shard(corpus_dir, tmp_path_factory):
    """A crashed merge re-runs only missing shards."""
    import glob
    import json
    import os
    import shutil as sh

    from microfts_ray.pipelines.merge import merge_index

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("mres"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    m1 = merge_index(idx, n_shards=4)
    # simulate crash: drop manifest's merged entry + one shard
    import microfts_ray.state.manifest as mfm

    man = mfm.load_manifest(idx)
    victim = man["merged"]["shards"][1]
    man.pop("merged")
    mfm.commit_manifest(idx, man)
    os.unlink(os.path.join(idx, "_manifest", f"part-{victim['pid']}.json"))
    sh.rmtree(os.path.dirname(os.path.join(idx, victim["segment"]["terms"])))
    mtimes_before = {
        s["pid"]: os.path.getmtime(os.path.join(idx, s["segment"]["terms"]))
        for s in m1["merged"]["shards"]
        if s["pid"] != victim["pid"]
    }
    m2 = merge_index(idx, n_shards=4)
    assert json.dumps(m1["merged"]["shards"], sort_keys=True) == json.dumps(
        m2["merged"]["shards"], sort_keys=True
    )
    # untouched shards were not rewritten
    for pid, t0 in mtimes_before.items():
        s = next(x for x in m2["merged"]["shards"] if x["pid"] == pid)
        assert os.path.getmtime(os.path.join(idx, s["segment"]["terms"])) == t0


def test_hierarchical_merge_many_segments(tmp_path_factory):
    """Multi-level merge: >=512 build segments trigger the level-1
    fan-in; results stay oracle-identical."""
    import glob

    d = tmp_path_factory.mktemp("manyseg")
    write_corpus(str(d), 600, files_per_shard=600, row_group_size=1)
    paths = sorted(glob.glob(f"{d}/*.parquet"))
    idx = str(tmp_path_factory.mktemp("manyidx") / "idx")
    # 1 file per partition-block -> 600 segments
    from microfts_ray.pipelines.build import plan_partitions

    build_index(paths, idx, target_rows_per_part=1, n_blocks=10**9)
    import microfts_ray.state.manifest as mfm

    n_segments = len(mfm.load_manifest(idx)["partitions"])
    from microfts_ray.pipelines.merge import merge_index

    m = merge_index(idx, n_shards=4, level1_threshold=256, fan_in=32)
    import os

    lvl1 = glob.glob(os.path.join(idx, "merged", "level1", "*.parquet"))
    assert n_segments >= 256
    assert lvl1, "level-1 intermediates expected"
    reader = IndexReader(idx)
    oracle = OracleIndex.build(gen_table(0, 600).to_pylist())
    got = reader.bm25_topk("def f_1(a, b):", k=10)
    want = oracle.bm25_topk("def f_1(a, b):", k=10)
    assert [(r["doc_id"], r["chunk_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["chunk_id"], r["score"]) for r in want
    ]


def test_query_actor_pool(reader, oracle):
    """QueryService actor pool returns the same results as a local
    reader (stateful serving stage)."""
    from microfts_ray.pipelines.query import QueryService

    svc = QueryService(reader.index_dir, n_actors=2, prewarm=False)
    got = svc.bm25_topk("def f_1(a, b):", k=5)
    want = oracle.bm25_topk("def f_1(a, b):", k=5)
    assert [(r["doc_id"], r["chunk_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["chunk_id"], r["score"]) for r in want
    ]
    # round-robin: both actors serve
    a = svc.search("import", "mod_1").to_pylist()
    b = svc.search("import", "mod_1").to_pylist()
    assert [(r["doc_id"], r["chunk_id"]) for r in a] == [
        (r["doc_id"], r["chunk_id"]) for r in b
    ]


def test_sharded_query_service_parity(reader, oracle):
    """Term-range sharded serving: every shard actor warms ONLY its
    gram range, and the front's threshold scatter-gather bm25 plus
    routed search/fuzzy stay bit-identical to a local reader."""
    from microfts_ray.pipelines.query import ShardedQueryService

    if not reader.shards:
        pytest.skip("sharded serving requires a merged index")
    svc = ShardedQueryService(reader.index_dir, n_groups=2, min_entries=100)
    warm = svc.ready()
    assert sum(len(w) for w in warm) > 0
    for (lo, hi), terms in zip(svc._ranges, warm):
        assert all(lo <= t < hi for t in terms)  # 1/N warm per actor
    for q in ["def", "import mod_1", "return a", "def f_1(a, b):"]:
        got = svc.bm25_topk(q, k=10)
        want = oracle.bm25_topk(q, k=10)
        assert [(r["doc_id"], r["chunk_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["chunk_id"], r["score"]) for r in want
        ], q
    got = svc.search("import", "mod_1").to_pylist()
    want = oracle.search("import", "mod_1")
    assert [(r["group"], r["doc_id"], r["chunk_id"], r["text"]) for r in got] == [
        (r["group"], r["doc_id"], r["chunk_id"], r["text"]) for r in want
    ]
    gf = svc.fuzzy("def f_1(a, b)", threshold=0.6).to_pylist()
    wf = oracle.fuzzy("def f_1(a, b)", threshold=0.6)
    assert [(r["doc_id"], r["chunk_id"], r["percent"]) for r in gf] == [
        (r["doc_id"], r["chunk_id"], r["percent"]) for r in wf
    ]
    assert svc.bm25_topk("nosuchgramxyz", k=5) == []


def test_prewarm_serial_path_builds_warm_set_and_persists(
    corpus_dir, tmp_path_factory, oracle
):
    """The parallel=False branch (what QueryActor.__init__ runs) must
    produce the same warm representation as the parallel path AND
    honor persist — previously it silently skipped both."""
    import glob
    import os

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("serialwarm"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    r = IndexReader(idx)
    n = r.prewarm(min_entries=100, parallel=False, persist=True)
    assert n > 0 and r._sorted_kc
    assert glob.glob(os.path.join(idx, "warmcache", "*", "meta.json"))  # content-addressed
    r2 = IndexReader(idx)
    assert r2._load_warmcache()
    got = r2.bm25_topk("def", k=10)
    want = oracle.bm25_topk("def", k=10)
    assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
        (h["doc_id"], h["chunk_id"], h["score"]) for h in want
    ]


def test_custom_chunk_bm25_dl_gather(corpus_dir, tmp_path_factory):
    """A custom-gram chunk (cmdChunk) under the sidecar-dl layout:
    its dl must come back through the chunk-dl gather so BM25 over
    the custom term scores with the declared chunk length."""
    import glob

    from microfts_ray.functions.grams import gram_from_str
    from microfts_ray.pipelines.custom import add_chunk
    from microfts_ray.stages.tokenize import doc_id_for

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("customdl"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    g = gram_from_str("zq9")  # a gram absent from the corpus
    add_chunk(idx, "org0000/proj0", "custom.bin", "f" * 40, [g, g, g])
    r = IndexReader(idx)
    run = r.term_postings(g)
    did = doc_id_for("org0000/proj0", "custom.bin", "f" * 40)
    assert len(run) == 1 and int(run.doc_ids[0]) == did
    assert int(run.tfs[0]) == 3 and int(run.dls[0]) == 3  # dl via sidecar gather
    # custom chunks surface through candidates/bm25, not verified search
    from microfts_ray.functions.grams import gram_set

    cand = r.candidates({g})
    assert cand is not None and len(cand) == 1
    # stats recompute stayed sidecar-based (post-compact safe)
    assert r.manifest["global"]["n_docs"] == N_FILES + 1


def test_custom_chunk_multi_add_same_group(corpus_dir, tmp_path_factory):
    """ADVICE regression: a second add_chunk to the SAME group writes
    a second (delta) docs-sidecar row for the same doc_id; the chunk-dl
    space must coalesce the rows so every chunk stays queryable
    (reference cmdChunk supports multiple chunks per group)."""
    import glob

    from microfts_ray.functions.grams import gram_from_str
    from microfts_ray.pipelines.custom import add_chunk
    from microfts_ray.pipelines.info import index_info
    from microfts_ray.stages.tokenize import doc_id_for

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("custmulti"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    g0, g1 = gram_from_str("zq8"), gram_from_str("zq9")
    add_chunk(idx, "org0000/proj0", "multi.bin", "f" * 40, [g0, g0], chunk_id=0)
    add_chunk(idx, "org0000/proj0", "multi.bin", "f" * 40, [g1, g1, g1], chunk_id=1)
    r = IndexReader(idx)
    did = doc_id_for("org0000/proj0", "multi.bin", "f" * 40)
    run0 = r.term_postings(g0)  # raised KeyError before the coalesce fix
    run1 = r.term_postings(g1)
    assert [(int(run0.doc_ids[0]), int(run0.chunk_ids[0]), int(run0.dls[0]))] == [
        (did, 0, 2)
    ]
    assert [(int(run1.doc_ids[0]), int(run1.chunk_ids[0]), int(run1.dls[0]))] == [
        (did, 1, 3)
    ]
    # the doc counts ONCE in global stats; chunks/dl sum across rows
    g = r.manifest["global"]
    assert g["n_docs"] == N_FILES + 1
    # dense/candidate paths stay consistent (unique dense keys)
    cand = r.candidates({g0})
    assert cand is not None and len(cand) == 1 and int(cand.chunk_ids[0]) == 0
    cand1 = r.candidates({g1})
    assert cand1 is not None and len(cand1) == 1 and int(cand1.chunk_ids[0]) == 1
    # doc-level BM25 dl lookup coalesces the delta rows too
    top = r.bm25_topk_docs("zq9zq9", k=5)
    assert any(t["doc_id"] == did for t in top) or top == []


def test_warmstore_serves_without_files(corpus_dir, tmp_path_factory, oracle):
    """The session warm STORE (plasma-resident warm cache) must serve
    a same-session reader even when the emitted npy files are gone —
    the defense against this box's page-cache reclaimer, and the
    one-physical-copy-per-node serving design: delete every warm npy
    after emission, prewarm still loads, scores stay oracle-identical.
    A reader with the store disabled must fail over to (now missing)
    files and fall back to decode — proving the store was the source."""
    import glob
    import os

    from microfts_ray.pipelines.merge import merge_index

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("wstore"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    merge_index(idx, n_shards=4, emit_warm=True, warm_inline=True,
                warm_min_entries=50)
    # drain the (default-async) npy persistence so there are files to
    # delete — the subject here is plasma-without-files serving
    import ray as _ray

    from microfts_ray.pipelines.query import _warmstore

    _ray.get(_warmstore().persist_files.remote())
    npys = glob.glob(os.path.join(idx, "warmcache", "*", "shard=*", "*.npy"))
    assert npys
    for p in npys:
        os.remove(p)
    r = IndexReader(idx)
    assert r._load_warmcache(min_entries=50)
    assert r.prewarm(min_entries=50) > 0
    for q in ["def", "import mod_1"]:
        got = r.bm25_topk(q, k=10)
        want = oracle.bm25_topk(q, k=10)
        assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
            (h["doc_id"], h["chunk_id"], h["score"]) for h in want
        ]
    # without the store the deleted files are detected (no silent
    # half-load): the sharded cache refuses and prewarm decodes
    os.environ["MICROFTS_WARMSTORE"] = "0"
    try:
        r2 = IndexReader(idx)
        assert not r2._load_warmcache(min_entries=50)
    finally:
        del os.environ["MICROFTS_WARMSTORE"]


def test_warmstore_prebuilt_dense_vectors(corpus_dir, tmp_path_factory):
    """Emission pre-scatters the f32 dense score vectors for VEC_MIN+
    terms and parks them in the warm store: a loading reader's
    _vec_cache is populated with arrays bit-identical to a privately
    built vector, shared (read-only plasma) instead of per-reader."""
    import glob
    import os

    from microfts_ray.pipelines.merge import merge_index

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("wvec"))
    idx = f"{tmp}/idx"
    os.environ["MICROFTS_VEC_MIN"] = "50"
    # 0 = force the pre-build (no time budget, no ambient gate): this
    # test's subject is the parked vectors themselves, which a live
    # collapse episode would legitimately skip
    os.environ["MICROFTS_VEC_BUDGET_SECONDS"] = "0"
    try:
        build_index(paths, idx, target_rows_per_part=30)
        merge_index(idx, n_shards=4, emit_warm=True, warm_inline=True,
                    warm_min_entries=50)
        r = IndexReader(idx)
        assert r._load_warmcache(min_entries=50)
        assert r._vec_cache, "no prebuilt vectors loaded from the store"
        for t, vec in list(r._vec_cache.items())[:5]:
            assert not vec.flags.writeable  # shared plasma copy
            k, c = r._sorted_kc[t]
            local = np.zeros(vec.size, dtype=np.float32)
            local[np.asarray(k)] = np.asarray(c)
            assert np.array_equal(local, vec)
    finally:
        del os.environ["MICROFTS_VEC_MIN"]
        del os.environ["MICROFTS_VEC_BUDGET_SECONDS"]


def test_sharded_service_from_warmstore(corpus_dir, tmp_path_factory, oracle):
    """Term-range serving actors (separate worker processes) warm
    from the plasma warm store: with every emitted npy deleted, a
    ShardedQueryService must still come up warm and stay bit-identical
    to the oracle — proving pool actors reach the store across
    process boundaries and share its single physical copy."""
    import glob
    import os

    from microfts_ray.pipelines.merge import merge_index
    from microfts_ray.pipelines.query import ShardedQueryService

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("wsvc"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    merge_index(idx, n_shards=4, emit_warm=True, warm_inline=True,
                warm_min_entries=100)
    for p in glob.glob(os.path.join(idx, "warmcache", "*", "shard=*", "*.npy")):
        os.remove(p)
    svc = ShardedQueryService(idx, n_groups=2, min_entries=100)
    warm = svc.ready()
    assert sum(len(w) for w in warm) > 0, "actors did not warm from the store"
    for q in ["def", "import mod_1"]:
        got = svc.bm25_topk(q, k=10)
        want = oracle.bm25_topk(q, k=10)
        assert [(r["doc_id"], r["chunk_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["chunk_id"], r["score"]) for r in want
        ], q


def test_emit_pool_cap_scales_with_nodes(monkeypatch):
    """The warm-emission fan-out cap defaults to per-node-knee x
    live-node count (a single-host constant would serialize emission
    on a multi-node cluster); MICROFTS_EMIT_TASKS still overrides."""
    import ray as _ray

    from microfts_ray.pipelines.merge import _emit_pool_cap

    monkeypatch.delenv("MICROFTS_EMIT_TASKS", raising=False)

    def nodes4():
        return [
            {"Alive": True, "Resources": {"CPU": 8.0}},
            {"Alive": True, "Resources": {"CPU": 8.0}},
            {"Alive": True, "Resources": {"CPU": 8.0}},
            {"Alive": True, "Resources": {"CPU": 8.0}},
            {"Alive": False, "Resources": {"CPU": 8.0}},  # dead: excluded
            {"Alive": True, "Resources": {}},  # head-only node: excluded
        ]

    monkeypatch.setattr(_ray, "nodes", nodes4)
    assert _emit_pool_cap() == 6 * 4
    monkeypatch.setattr(_ray, "nodes", lambda: [
        {"Alive": True, "Resources": {"CPU": 32.0}}
    ])
    assert _emit_pool_cap() == 6  # single node: unchanged behavior
    monkeypatch.setenv("MICROFTS_EMIT_TASKS", "3")
    assert _emit_pool_cap() == 3  # explicit override wins
    monkeypatch.setenv("MICROFTS_EMIT_TASKS", "0")
    assert _emit_pool_cap() == 0  # 0 = uncapped sentinel preserved


def test_warm_files_async_persist_and_restartability(
    corpus_dir, tmp_path_factory, oracle
):
    """Default (async) npy persistence: right after merge_index the
    warm cache serves from plasma with NO npy files on the
    time-to-servable path; store.persist_files then writes the
    restart-fallback files, and a reader forced OFF plasma
    (MICROFTS_WARMSTORE=0) loads them with oracle-identical serving."""
    import glob
    import json
    import os

    import ray as _ray

    from microfts_ray.pipelines.merge import merge_index
    from microfts_ray.pipelines.query import IndexReader, _warmstore

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("asyncwf"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    merge_index(idx, n_shards=4, emit_warm=True, warm_inline=True,
                warm_min_entries=50)
    markers = glob.glob(os.path.join(idx, "warmcache", "*", "sharded.json"))
    assert len(markers) == 1
    gen_dir = os.path.dirname(markers[0])
    with open(markers[0]) as f:
        marker = json.load(f)
    # plasma-backed serving works regardless of file state
    r = IndexReader(idx)
    assert r.prewarm(min_entries=50) > 0
    got = r.bm25_topk("def", k=10)
    want = oracle.bm25_topk("def", k=10)
    assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
        (h["doc_id"], h["chunk_id"], h["score"]) for h in want
    ]
    # drain the async persist (fire-and-forget in production; awaited
    # here) then verify every warm dir has its npy restart fallback
    store = _warmstore()
    assert store is not None
    _ray.get(store.persist_files.remote())
    for name in marker["dirs"]:
        meta_p = os.path.join(gen_dir, name, "meta.json")
        with open(meta_p) as f:
            meta = json.load(f)
        if not meta["terms"]:
            continue  # empty range: nothing to persist
        fns = (
            ("keys.npy", "tf.npy", "dl.npy")
            if meta.get("fmt") == 2
            else ("keys.npy", "contribs.npy")
        )
        for fn in fns:
            assert os.path.exists(os.path.join(gen_dir, name, fn)), (
                f"{name}/{fn} missing after persist_files"
            )
    # a fresh reader with the store DISABLED must load from the files
    os.environ["MICROFTS_WARMSTORE"] = "0"
    try:
        r2 = IndexReader(idx)
        assert r2._load_warmcache(min_entries=50)
        got2 = r2.bm25_topk("def", k=10)
        assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got2] == [
            (h["doc_id"], h["chunk_id"], h["score"]) for h in want
        ]
    finally:
        del os.environ["MICROFTS_WARMSTORE"]


def test_bm25_ambient_gated_vector_build_identical(reader, oracle, monkeypatch):
    """Inside a bandwidth-collapse episode the lazy dense-vector build
    is skipped (one build touches ~100 MB — the round-3 first-pass
    spike) and dense scoring falls back to per-term sorted adds;
    results must stay oracle-identical, no vectors may be built, and
    with a healthy ambient the build resumes."""
    import microfts_ray.pipelines.query as qmod

    monkeypatch.setattr(reader, "_vec_min", 1)
    reader._vec_cache.clear()
    reader._vec_bytes = 0
    monkeypatch.setattr(qmod, "_cached_gbps", lambda ttl=20.0: 0.1)
    for query in ["def", "import mod_1", "def f_1(a, b):"]:
        got = reader.bm25_topk(query, k=10, prune_threshold=0)
        want = oracle.bm25_topk(query, k=10)
        assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
            (h["doc_id"], h["chunk_id"], h["score"]) for h in want
        ], query
    assert not reader._vec_cache  # collapse: no build spike
    monkeypatch.setattr(qmod, "_cached_gbps", lambda ttl=20.0: 8.0)
    got = reader.bm25_topk("def", k=10, prune_threshold=0)
    want = oracle.bm25_topk("def", k=10)
    assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
        (h["doc_id"], h["chunk_id"], h["score"]) for h in want
    ]
    assert reader._vec_cache  # healthy: builds resumed
    reader._vec_cache.clear()
    reader._vec_bytes = 0


def test_warm_decode_budget_defers_tail_serving_identical(
    corpus_dir, tmp_path_factory, oracle, monkeypatch
):
    """With a near-zero decode budget the emission emits only each
    dir's hottest chunk and defers the tail (meta lists just the
    emitted terms); a reader must load the partial cache and stay
    oracle-identical — deferred terms decode lazily per term at query
    time. This is the ambient-collapse warm-depth contract."""
    import glob
    import json
    import os

    from microfts_ray.pipelines.merge import merge_index

    monkeypatch.setenv("MICROFTS_WARM_DECODE_SECONDS", "0.001")
    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("decbudget"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    merge_index(idx, n_shards=4, emit_warm=True, warm_inline=True,
                warm_min_entries=50)
    markers = glob.glob(os.path.join(idx, "warmcache", "*", "sharded.json"))
    assert len(markers) == 1
    gen_dir = os.path.dirname(markers[0])
    # the budget must actually have deferred terms somewhere: the
    # emitted term count should be below a full-depth emission's
    n_emitted = 0
    for name in json.load(open(markers[0]))["dirs"]:
        with open(os.path.join(gen_dir, name, "meta.json")) as f:
            n_emitted += len(json.load(f)["terms"])
    r = IndexReader(idx)
    assert r._load_warmcache(min_entries=50)
    assert len(r._sorted_kc) == n_emitted
    for q in ["def", "import mod_1", "def f_1(a, b):"]:
        got = r.bm25_topk(q, k=10)
        want = oracle.bm25_topk(q, k=10)
        assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
            (h["doc_id"], h["chunk_id"], h["score"]) for h in want
        ], q
    got = r.search("import", "mod_1").to_pylist()
    want = oracle.search("import", "mod_1")
    assert [(x["doc_id"], x["chunk_id"]) for x in got] == [
        (x["doc_id"], x["chunk_id"]) for x in want
    ]


def test_warm_from_table_in_call_deadline(
    corpus_dir, tmp_path_factory, monkeypatch
):
    """An expired deadline bounds warm_from_table IN-CALL (between
    decode slices), not just between term chunks: terms whose rows
    extend past the first guaranteed-progress slice are DROPPED and
    reported via deferred_out — never emitted truncated — and the
    terms that do come back are bit-identical to an unbounded call.
    This is what bounds a multi-million-entry hot term's decode
    inside a bandwidth collapse (runs 8-9: 20-40 s/dir overruns)."""
    import glob
    import time as _t

    import microfts_ray.pipelines.query as qmod
    from microfts_ray.pipelines.merge import merge_index

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("dlwft"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    merge_index(idx, n_shards=2)
    r = IndexReader(idx)
    assert r._dense_space() is not None
    # tiny slices so the small test corpus spans many of them
    monkeypatch.setattr(qmod, "_WARM_SLICE_ENTRIES", 64)
    seg = r._all_term_sources()[0]
    cols = [c for c in ("term", "n", "dict", "doc_blob", "chunk_blob",
                        "tf_blob", "dl_blob")
            if c in seg._pf.schema_arrow.names]
    tbl = seg._pf.read(columns=cols)
    terms = np.unique(tbl["term"].to_numpy())
    maps = r._warm_maps()
    full = r.warm_from_table(tbl, terms, maps)
    assert full
    deferred: list = []
    part = r.warm_from_table(
        tbl, terms, maps,
        deadline=_t.perf_counter() - 1.0, deferred_out=deferred,
    )
    # the expired deadline must have deferred most of the table (only
    # the first slice is guaranteed progress)
    assert deferred
    assert len(part) < len(full)
    # disjoint + complete accounting: every term with postings either
    # came back whole or was deferred
    assert not (set(part) & set(deferred))
    assert set(part) | (set(deferred) & set(full)) == set(full)
    # emitted terms are bit-identical to the unbounded decode
    for t, (keys, contribs, n) in part.items():
        fk, fc, fn = full[t]
        assert n == fn
        assert np.array_equal(keys, fk)
        assert np.array_equal(contribs, fc)


def test_huge_corpus_regime_no_warm_maxscore_serving(
    corpus_dir, tmp_path_factory, oracle, monkeypatch
):
    """The 10^12-doc regime end-to-end at test scale: with the dense
    key cap forced to 0 (MICROFTS_DENSE_CAP), the merge's warm
    emission pre-gate skips warm work entirely (sum n_chunks exceeds
    the cap — no sidecar reads, no staged dirs, no warm store) and
    serving runs the MaxScore/pruned path off the merged shards.
    Results must stay oracle-identical — rank AND score."""
    import glob
    import os

    from microfts_ray.pipelines.merge import merge_index

    monkeypatch.setenv("MICROFTS_DENSE_CAP", "0")
    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("hugecap"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    merge_index(idx, n_shards=4, emit_warm=True, warm_inline=True)
    # no warm cache generation may exist: the pre-gate must have
    # skipped emission, and the post-merge fallback no-ops without a
    # dense space
    assert not glob.glob(os.path.join(idx, "warmcache", "*", "sharded.json"))
    r = IndexReader(idx)
    assert r._dense_space() is None
    assert r.prewarm() == 0
    for q in ["def", "import mod_1", "def f_1(a, b):", "x = y"]:
        got = r.bm25_topk(q, k=10)
        want = oracle.bm25_topk(q, k=10)
        assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
            (h["doc_id"], h["chunk_id"], h["score"]) for h in want
        ], q
    got = r.search("import", "mod_1").to_pylist()
    want = oracle.search("import", "mod_1")
    assert [(x["doc_id"], x["chunk_id"]) for x in got] == [
        (x["doc_id"], x["chunk_id"]) for x in want
    ]


def test_prewarm_topup_bulk_warms_deferred_terms(
    corpus_dir, tmp_path_factory, oracle, monkeypatch
):
    """After a budget-starved emission, prewarm's top-up must warm the
    deferred terms in ONE deadline-bounded bulk pass (per-term lazy
    decodes cost a whole row-group read each — run-14 measured 29 s
    for a single ~min_entries term inside a collapse). With the
    ambient gate forced healthy and an ample budget, every eligible
    term warms; entries are bit-identical to an unbounded bulk build
    and serving stays oracle-identical."""
    import glob
    import json
    import os

    import microfts_ray.pipelines.query as qmod
    from microfts_ray.pipelines.merge import merge_index

    monkeypatch.setattr(qmod, "_cached_gbps", lambda ttl=20.0: 10.0)
    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("topupbulk"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    merge_index(idx, n_shards=4, emit_warm=True, warm_inline=True,
                warm_min_entries=50)
    markers = glob.glob(os.path.join(idx, "warmcache", "*", "sharded.json"))
    assert len(markers) == 1

    r = IndexReader(idx)
    assert r._load_warmcache(min_entries=50)
    # simulate a budget-starved emission: evict half the warm entries
    # (at test scale every dir fits in one decode slice, so the real
    # deadline never defers anything)
    evicted = sorted(r._sorted_kc)[::2]
    full_ref = {t: r._sorted_kc[t] for t in evicted}
    for t in evicted:
        del r._sorted_kc[t]
        r._term_len_cache.pop(t, None)
    n_before = len(r._sorted_kc)
    # fan-out path (Ray tasks, the default when a session is up)
    enum_s, topup_s = r._prewarm_topup(50, None)
    # every evicted term must be re-warmed, bit-identical to the
    # emission's own entries
    assert len(r._sorted_kc) == n_before + len(evicted)
    for t in evicted:
        k, c = r._sorted_kc[t]
        assert np.array_equal(np.asarray(k), np.asarray(full_ref[t][0])), t
        assert np.array_equal(np.asarray(c), np.asarray(full_ref[t][1])), t
    for q in ["def", "import mod_1", "def f_1(a, b):"]:
        got = r.bm25_topk(q, k=10)
        want = oracle.bm25_topk(q, k=10)
        assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
            (h["doc_id"], h["chunk_id"], h["score"]) for h in want
        ], q
    # the in-process path (parallel=False, QueryActor's in-actor
    # prewarm) re-warms identically at a healthy probe
    for t in evicted:
        del r._sorted_kc[t]
        r._term_len_cache.pop(t, None)
    r._prewarm_topup(50, None, parallel=False)
    for t in evicted:
        k, c = r._sorted_kc[t]
        assert np.array_equal(np.asarray(k), np.asarray(full_ref[t][0])), t
    # ... and refuses to spend anything when the fresh probe says the
    # (single-process) bus is collapsed
    monkeypatch.setattr(qmod, "_cached_gbps", lambda ttl=20.0: 0.2)
    for t in evicted:
        del r._sorted_kc[t]
    _, topup_s2 = r._prewarm_topup(50, None, parallel=False)
    assert all(t not in r._sorted_kc for t in evicted)
    # an expired deadline defers rather than emits truncated entries
    monkeypatch.setattr(qmod, "_cached_gbps", lambda ttl=20.0: 10.0)
    monkeypatch.setenv("MICROFTS_PREWARM_TOPUP_SECONDS", "1")
    deferred: list = []
    got = r.warm_terms_bulk(
        evicted, deadline=0.0, deferred_out=deferred
    )
    for t, (k, c, n) in got.items():
        assert np.array_equal(np.asarray(k), np.asarray(full_ref[t][0]))
    assert set(got) | set(deferred) >= set(full_ref) & set(evicted)


def test_query_time_fanout_warms_all_missing_terms(
    corpus_dir, tmp_path_factory, oracle, monkeypatch
):
    """First-touch queries inside a (simulated) single-process
    bandwidth collapse fan their missing term decodes out to Ray
    tasks — ALL missing terms (a lazy decode costs a full row-group
    read regardless of term size), even a SINGLE one (the remote
    worker has its own bandwidth inside the per-process episode),
    and with no parked shared tuple (workers self-derive maps).
    Results stay bit-identical to the oracle."""
    import glob

    import microfts_ray.pipelines.query as qmod
    from microfts_ray.functions.grams import gram_set
    from microfts_ray.pipelines.merge import merge_index

    paths = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    tmp = str(tmp_path_factory.mktemp("qfan"))
    idx = f"{tmp}/idx"
    build_index(paths, idx, target_rows_per_part=30)
    merge_index(idx, n_shards=4)

    # simulate the collapse gate + a session with no parked tuple
    monkeypatch.setattr(qmod, "_cached_gbps", lambda ttl=20.0: 0.2)
    monkeypatch.setattr(
        IndexReader, "_parked_shared_ref", lambda self: None
    )
    fanned: list[tuple[int, int]] = []
    orig = IndexReader._fan_out_warm

    def spy(self, chunks, shared_ref, timeout=None):
        n = orig(self, chunks, shared_ref, timeout)
        fanned.append((sum(len(c) for c in chunks), n))
        return n

    monkeypatch.setattr(IndexReader, "_fan_out_warm", spy)

    r = IndexReader(idx)
    assert r._dense_space() is not None
    for q in ["import mod_1", "Handler7"]:
        grams = [g for g in sorted(gram_set(q)) if r.chunk_df(g) > 0]
        missing = [g for g in grams if g not in r._sorted_kc]
        assert missing, q  # the test must exercise the cold path
        got = r.bm25_topk(q, k=10)
        req, warmed = fanned[-1]
        assert req == len(missing) and warmed == len(missing), q
        assert all(g in r._sorted_kc for g in grams), q
        want = oracle.bm25_topk(q, k=10)
        assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
            (h["doc_id"], h["chunk_id"], h["score"]) for h in want
        ], q
    # a SINGLE missing term also fans out (run-14: one lazy decode is
    # a whole row-group read — 29 s inside a collapse): evict one gram
    # of a warm query and re-run it
    g_ev = [g for g in sorted(gram_set("import mod_1")) if g in r._sorted_kc][0]
    del r._sorted_kc[g_ev]
    r._term_len_cache.pop(g_ev, None)
    n_calls = len(fanned)
    r.bm25_topk("import mod_1", k=10)
    assert len(fanned) == n_calls + 1 and fanned[-1] == (1, 1)
    assert g_ev in r._sorted_kc
    # warm entries are bit-identical to the inline path's
    t0 = sorted(r._sorted_kc)[0]
    k_w, c_w = r._sorted_kc.pop(t0)
    r._term_len_cache.pop(t0, None)
    sk = r._sorted_keys(t0)
    assert np.array_equal(np.asarray(sk[0]), np.asarray(k_w))
    assert np.array_equal(np.asarray(sk[1]), np.asarray(c_w))


def test_warmstore_is_per_node(monkeypatch):
    """ONE file/warm store PER NODE (r4 verdict #7: a single
    cluster-wide actor funnels every parked byte through one node and
    adds a cross-node RPC per reader). With mocked node identities:
    different nodes get-or-create DIFFERENT named actors, a node's
    store misses entries parked on another node (readers fall back to
    storage/decode exactly as on a plasma miss), and repeated calls on
    one node reuse the cached handle. Same pattern as
    test_emit_pool_cap_scales_with_nodes."""
    import ray as _ray

    import microfts_ray.pipelines.query as qmod

    def fake_name(nid):
        full = (nid * 56)[:56]  # a plausible 28-byte-hex node id
        return lambda _r: (f"{qmod._WARMSTORE_NAME}_test{nid}", full)

    saved = dict(qmod._WARMSTORE_CACHE)
    try:
        # node A parks a file
        monkeypatch.setattr(qmod, "_warmstore_name", fake_name("a"))
        qmod._WARMSTORE_CACHE.update(job=None, node=None, handle=None)
        sa = qmod._warmstore(create=True)
        assert sa is not None
        data = np.frombuffer(b"per-node store bytes", dtype=np.uint8)
        assert _ray.get(sa.put_file_bytes.remote("/tmp/pn_probe", data))
        # node B: a DIFFERENT actor that does not see node A's entry
        monkeypatch.setattr(qmod, "_warmstore_name", fake_name("b"))
        qmod._WARMSTORE_CACHE.update(job=None, node=None, handle=None)
        sb = qmod._warmstore(create=True)
        assert sb is not None and sb._actor_id != sa._actor_id
        assert _ray.get(sb.file_refs.remote(["/tmp/pn_probe"])) == [None]
        assert _ray.get(sa.file_refs.remote(["/tmp/pn_probe"]))[0] is not None
        # handle cache: same node resolves the SAME handle, no re-create
        assert qmod._warmstore() is sb
        _ray.kill(sa)
        _ray.kill(sb)
    finally:
        qmod._WARMSTORE_CACHE.update(**saved)

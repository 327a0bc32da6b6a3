"""Incremental update / delete / compact tests (pipelines/update.py).

Key invariant: after update + compact, query results are identical to
a fresh build of the live corpus (reference compact semantics,
fts-lmdb.go:919-985).
"""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from microfts_ray.oracle import OracleIndex
from microfts_ray.pipelines.build import build_index
from microfts_ray.pipelines.query import IndexReader
from microfts_ray.pipelines.update import apply_update, compact, delete_doc, snapshot_diff
from microfts_ray.sources.corpus import CORPUS_SCHEMA, gen_table


def _write(rows, path, rg=10):
    pq.write_table(pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA), path, row_group_size=rg)


@pytest.fixture()
def setup(tmp_path):
    rows = gen_table(0, 40).to_pylist()
    src = str(tmp_path / "v1.parquet")
    _write(rows, src)
    idx = str(tmp_path / "idx")
    build_index([src], idx, target_rows_per_part=10)
    return rows, src, idx, tmp_path


def test_snapshot_diff_classes(setup):
    rows, src, idx, tmp = setup
    # v2: change 3 docs (new commit+content), delete 2, add 2
    v2 = [dict(r) for r in rows]
    for i in range(3):
        v2[i] = {**v2[i], "commit": "f" * 40, "content": v2[i]["content"] + "changed_zz\n"}
    deleted_keys = [(r["repo"], r["path"], r["commit"]) for r in v2[38:]]
    v2 = v2[:38]
    v2 += gen_table(100, 2).to_pylist()
    src2 = str(tmp / "v2.parquet")
    _write(v2, src2)
    diff = snapshot_diff(idx, [src2])
    assert len(diff["new_or_changed"]) == 5  # 3 changed + 2 added
    # deleted: 3 old versions of changed docs + 2 dropped docs
    assert len(diff["deleted"]) == 5


def test_update_then_warm_merge_serves_oracle_identical(setup):
    """Warm emission over an UPDATED index (tombstoned old versions +
    rank-encoded delta rows) must serve bit-identically to an oracle
    of the post-update corpus: the compact (fmt 2) warm dirs are
    built through the rewrite-aware decode/translate path and the
    tombstone mask still applies over warm entries."""
    rows, src, idx, tmp = setup
    from microfts_ray.pipelines.merge import merge_index

    v2 = [dict(r) for r in rows]
    v2[0] = {**v2[0], "commit": "a" * 40,
             "content": "def warmed_fn(z):\n    return z\n"}
    v2 = v2[:-3]  # delete last three
    v2 += gen_table(400, 2).to_pylist()  # add two
    src2 = str(tmp / "v2w.parquet")
    _write(v2, src2)
    apply_update(idx, [src2], target_rows_per_part=10)
    merge_index(idx, n_shards=4, emit_warm=True, warm_inline=True,
                warm_min_entries=20)
    # pre-compact stats legitimately drift from a fresh corpus (the
    # tombstoned old versions still count in avgdl/N — see
    # test_compact_then_update_keeps_stats_sane), so the invariant
    # here is warm-path ≡ decode-path BIT-identity on the SAME index,
    # plus tombstoned docs staying invisible.
    r = IndexReader(idx)
    assert r._load_warmcache(min_entries=20)
    assert r._sorted_kc, "no warm terms loaded from the updated index"
    r_ref = IndexReader(idx)  # decode path: no warm cache loaded
    dead_ids = set(int(t) for t in r.manifest.get("tombstones", []))
    assert dead_ids, "update must have tombstoned the old versions"
    for q in ["def", "warmed_fn", "import"]:
        got = r.bm25_topk(q, k=10)
        want = r_ref.bm25_topk(q, k=10)
        assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
            (h["doc_id"], h["chunk_id"], h["score"]) for h in want
        ], q
        assert not any(h["doc_id"] in dead_ids for h in got), q
    # after compact (exact stats restored) the warm-merged index must
    # match the post-update oracle exactly
    compact(idx, n_shards=4)
    merge_index(idx, n_shards=4, emit_warm=True, warm_inline=True,
                warm_min_entries=20)
    oracle = OracleIndex.build(v2)
    r2 = IndexReader(idx)
    assert r2._load_warmcache(min_entries=20)
    for q in ["def", "warmed_fn", "import"]:
        got = r2.bm25_topk(q, k=10)
        want = oracle.bm25_topk(q, k=10)
        assert [(h["doc_id"], h["chunk_id"], h["score"]) for h in got] == [
            (h["doc_id"], h["chunk_id"], h["score"]) for h in want
        ], q


def test_update_then_compact_equals_fresh_build(setup):
    rows, src, idx, tmp = setup
    v2 = [dict(r) for r in rows]
    v2[0] = {**v2[0], "commit": "e" * 40, "content": "def changed_fn(x):\n    return x\n"}
    v2 = v2[:-2]  # delete last two
    v2 += gen_table(200, 3).to_pylist()  # add three
    src2 = str(tmp / "v2.parquet")
    _write(v2, src2)

    m = apply_update(idx, [src2], target_rows_per_part=10)
    assert m["tombstones"]  # old version + 2 deleted
    reader = IndexReader(idx)
    oracle = OracleIndex.build(v2)

    # pre-compact: tombstoned docs never surface
    for q in [("def",), ("changed_fn",), ("import", "mod_1")]:
        got = reader.search(*q).to_pylist()
        want = oracle.search(*q)
        assert [(r["doc_id"], r["chunk_id"]) for r in got] == [
            (r["doc_id"], r["chunk_id"]) for r in want
        ], q

    compact(idx, n_shards=4)
    reader2 = IndexReader(idx)
    assert reader2._tombstones.size == 0
    # post-compact: stats AND scores identical to a fresh build
    g = reader2.manifest["global"]
    assert g["n_docs"] == len(v2)
    assert g["n_chunks"] == oracle.n_chunks
    assert g["sum_dl"] == oracle.sum_dl
    for q in ["def", "changed_fn", "import mod_1"]:
        got = reader2.bm25_topk(q, k=10)
        want = oracle.bm25_topk(q, k=10)
        assert [(r["doc_id"], r["chunk_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["chunk_id"], r["score"]) for r in want
        ], q


def test_compact_then_update_keeps_stats_sane(setup):
    """Regression: apply_update after a compact must not zero-out
    n_docs/n_chunks/sum_dl (compact-promoted shards carry 0 doc stats;
    the real numbers live in the docs sidecars). A corrupted avgdl/N
    flips BM25 idf signs and reorders results vs the oracle."""
    rows, src, idx, tmp = setup
    compact(idx, n_shards=4)
    # post-compact update: change one doc, add one
    v2 = [dict(r) for r in rows]
    v2[0] = {**v2[0], "commit": "d" * 40, "content": "def tail_fn(y):\n    return y\n"}
    v2 += gen_table(300, 1).to_pylist()
    src2 = str(tmp / "v2c.parquet")
    _write(v2, src2)
    m = apply_update(idx, [src2], target_rows_per_part=10)
    g = m["global"]
    oracle = OracleIndex.build(v2)
    # pre-compact drift: the tombstoned old version of row 0 still
    # counts in the stats, so totals = oracle + that one dead doc
    dead_chunks = rows[0]["content"].count("\n") + (
        0 if rows[0]["content"].endswith("\n") else 1
    )
    assert g["n_docs"] == len(oracle.doc_meta) + 1
    assert g["n_chunks"] == oracle.n_chunks + dead_chunks
    assert g["n_chunks"] > 0 and g["sum_dl"] > oracle.sum_dl
    # and BM25 must still agree with the oracle after the follow-up
    # compact restores exact stats
    compact(idx, n_shards=4)
    reader = IndexReader(idx)
    for q in ["def", "tail_fn", "import"]:
        got = reader.bm25_topk(q, k=10)
        want = oracle.bm25_topk(q, k=10)
        assert [(r["doc_id"], r["chunk_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["chunk_id"], r["score"]) for r in want
        ], q


def test_dry_run_makes_no_changes(setup):
    rows, src, idx, tmp = setup
    v2 = rows[:-5]
    src2 = str(tmp / "v2.parquet")
    _write(v2, src2)
    import json

    before = json.dumps(IndexReader(idx).manifest, sort_keys=True)
    plan = apply_update(idx, [src2], dry_run=True)
    assert plan["dry_run"] and len(plan["deleted"]) == 5
    after = json.dumps(IndexReader(idx).manifest, sort_keys=True)
    assert before == after


def test_delete_doc_tombstone(setup):
    rows, src, idx, tmp = setup
    r0 = rows[0]
    reader = IndexReader(idx)
    uniq_hits = reader.search("def").to_pylist()
    delete_doc(idx, r0["repo"], r0["path"], r0["commit"])
    reader2 = IndexReader(idx)
    from microfts_ray.stages.tokenize import doc_id_for

    dead = doc_id_for(r0["repo"], r0["path"], r0["commit"])
    hits = reader2.search("def").to_pylist()
    assert all(h["doc_id"] != dead for h in hits)
    assert len(hits) <= len(uniq_hits)


def test_idempotent_update_noop(setup):
    rows, src, idx, tmp = setup
    m = apply_update(idx, [src], target_rows_per_part=10)
    assert m.get("tombstones") == []
    assert len(m["partitions"]) == len(IndexReader(idx).manifest["partitions"])
    diff = snapshot_diff(idx, [src])
    assert not diff["new_or_changed"] and not diff["deleted"]


def test_delete_group_by_name_with_slashy_repo(setup):
    """Group display names are ambiguous when repo contains '/'; the
    name must resolve against the index (deleteGroupByName parity)."""
    rows, src, idx, tmp = setup
    r0 = rows[0]
    assert "/" in r0["repo"]  # corpus repos look like orgNNNN/projN
    from microfts_ray.pipelines.update import delete_group_by_name
    from microfts_ray.stages.tokenize import doc_id_for

    name = f"{r0['repo']}/{r0['path']}@{r0['commit']}"
    m = delete_group_by_name(idx, name)
    assert doc_id_for(r0["repo"], r0["path"], r0["commit"]) in m["tombstones"]
    reader = IndexReader(idx)
    dead = doc_id_for(r0["repo"], r0["path"], r0["commit"])
    assert all(h["doc_id"] != dead for h in reader.search("def").to_pylist())
    import pytest as _pt

    with _pt.raises(KeyError):
        delete_group_by_name(idx, "nope/nope@nope")


def test_info_groups_after_compact(setup):
    """index_info(groups=True) must list live groups on a compacted
    index (compact-promoted partitions carry no 'docs' key — the
    listing iterates docs_sources, regression: KeyError)."""
    from microfts_ray.pipelines.info import index_info

    rows, src, idx, tmp = setup
    delete_doc(idx, rows[0]["repo"], rows[0]["path"], rows[0]["commit"])
    compact(idx, n_shards=4)
    info = index_info(idx, groups=True)
    assert len(info["groups"]) == len(rows) - 1
    assert not any(g["deleted"] for g in info["groups"])
    names = {g["group"] for g in info["groups"]}
    assert f"{rows[1]['repo']}/{rows[1]['path']}@{rows[1]['commit']}" in names


def test_rewrite_merge_preserves_bmin_dl(setup):
    """Rewrite-merge (compact) over sidecar-dl inputs must re-encode
    per-block bmin_dl from REAL chunk dls, not the decoded zeros —
    persisted WAND bounds must never be silently wrong."""
    import numpy as np

    from microfts_ray.functions.grams import gram_from_str
    from microfts_ray.functions.postings import BLOCK, decode_block_meta
    from microfts_ray.oracle import gram_set

    rows, src, idx, tmp = setup
    compact(idx, n_shards=4)  # rewrite-merge path
    reader = IndexReader(idx)
    assert reader.manifest.get("dl_layout") == "sidecar"
    g = sorted(gram_set("def"))[0]
    seg = reader._term_sources(g)[0]
    sl = seg.term_slice(g)
    assert sl is not None and sl.num_rows == 1  # one run per term post-rewrite
    row = sl.to_pylist()[0]
    assert len(row["dl_blob"]) == 0  # still sidecar-dl
    bmax_tf, bmin_dl, _ = decode_block_meta(row)
    run = reader.term_postings(g)  # dls gathered from sidecars
    n = len(run)
    want_min = [
        int(run.dls[b * BLOCK : min((b + 1) * BLOCK, n)].min())
        for b in range((n + BLOCK - 1) // BLOCK)
    ]
    want_max = [
        int(run.tfs[b * BLOCK : min((b + 1) * BLOCK, n)].max())
        for b in range((n + BLOCK - 1) // BLOCK)
    ]
    assert bmin_dl.tolist() == want_min and min(want_min) > 0
    assert bmax_tf.tolist() == want_max

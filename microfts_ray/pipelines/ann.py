"""Approximate-nearest-neighbor search over an embedding column.

Brute-force cosine top-k is the exact baseline: the query matrix is
broadcast ONCE via ray.put, each map_batches task does one numpy
matmul against its batch and keeps only its local top-k, and the
driver merges the tiny per-batch winners — the canonical distributed
top-k (no shuffle of the embedding table). The LSH variant buckets by
random hyperplanes so only matching buckets are scanned (the scale
path; IVF-style).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _as_matrix(col) -> np.ndarray:
    """(n, d) float64 matrix from a list<float>/fixed_size_list column
    without a Python-object round-trip: reshape the Arrow values
    buffer (zero-copy view), then one vectorized dtype cast."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    values = col.flatten()  # child values array (handles list offsets)
    flat = values.to_numpy(zero_copy_only=False)
    return flat.reshape(n, -1).astype(np.float64, copy=False)


def cosine_topk(
    ds: ray.data.Dataset,
    query_vec: np.ndarray,
    k: int = 10,
    *,
    exclude_ids: set[int] | None = None,
) -> pa.Table:
    """Exact cosine top-k: (rank, vec_id, cosine), ties broken by
    vec_id ascending."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / (qn if qn else 1.0)
    q_ref = ray.put(q)
    excl = exclude_ids or set()

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids = batch["vec_id"].to_numpy().astype(np.int64, copy=False)
        embs = _as_matrix(batch["embedding"])
        norms = np.linalg.norm(embs, axis=1)
        norms[norms == 0] = 1.0
        sims = (embs / norms[:, None]) @ qv
        if excl:
            mask = ~np.isin(ids, np.fromiter(excl, dtype=np.int64))
            ids, sims = ids[mask], sims[mask]
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {"vec_id": pa.array(ids[order], pa.int64()),
             "cosine": pa.array(sims[order], pa.float64())}
        )

    winners = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    ids = np.array([r["vec_id"] for r in winners], dtype=np.int64)
    sims = np.array([r["cosine"] for r in winners], dtype=np.float64)
    order = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, order.size + 1), pa.int64()),
            "vec_id": pa.array(ids[order], pa.int64()),
            "cosine": pa.array(sims[order], pa.float64()),
        }
    )


def _probe_sigs(q: np.ndarray, planes: np.ndarray, probes: int) -> set[int]:
    """Multi-probe signature set: the query's bucket plus the buckets
    reached by flipping its lowest-margin hyperplane bits."""
    n_planes = planes.shape[1]
    q_margins = q @ planes
    q_bits = q_margins > 0
    flip_order = np.argsort(np.abs(q_margins))
    sigs = set()
    for p in range(probes):
        bits = q_bits.copy()
        for b in range(p):
            bits[flip_order[b]] = ~bits[flip_order[b]]
        sigs.add(int((bits.astype(np.int64) << np.arange(n_planes)).sum()))
    return sigs


def build_ann_lsh_index(
    ds: ray.data.Dataset,
    index_dir: str,
    *,
    n_planes: int = 6,
    seed: int = 11,
) -> dict:
    """Build-once partitioned LSH signature index: each embedding row
    is written under its hyperplane-signature bucket
    (`<index>/bucket=<sig>/*.parquet`, a Ray partitioned write), and
    the planes are persisted alongside. A query then READS ONLY its
    probe buckets (cosine_topk_lsh_indexed) instead of re-deriving
    every row's signature per query — the build-once /
    query-touches-k-buckets shape that scales to corpora where a full
    signature scan per query is unaffordable."""
    import json
    import os

    first = ds.take_batch(1, batch_format="pyarrow")
    d = len(first["embedding"][0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((d, n_planes))
    pl_ref = ray.put(planes)

    def sign(batch: pa.Table) -> pa.Table:
        pl = ray.get(pl_ref)
        embs = _as_matrix(batch["embedding"])
        bits = (embs @ pl) > 0
        sig = (bits.astype(np.int64) << np.arange(pl.shape[1])).sum(axis=1)
        return batch.append_column("bucket", pa.array(sig, pa.int32()))

    ds.map_batches(sign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"]
    )
    np.save(os.path.join(index_dir, "planes.npy"), planes)
    meta = {"n_planes": n_planes, "seed": seed, "dim": d}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def cosine_topk_lsh_indexed(
    index_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    *,
    probes: int = 4,
    exclude_ids: set[int] | None = None,
) -> pa.Table:
    """ANN query against a persisted LSH signature index: compute the
    probe signatures, read ONLY those bucket partitions, exact-rescore
    within them. Candidates (and results) are identical to
    cosine_topk_lsh with the same planes — only the read is pruned."""
    import os

    planes = np.load(os.path.join(index_dir, "planes.npy"))
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / (qn if qn else 1.0)
    sigs = _probe_sigs(q, planes, probes)
    import glob as _glob

    paths = [
        f
        for s in sorted(sigs)
        for f in sorted(
            _glob.glob(os.path.join(index_dir, f"bucket={s}", "*.parquet"))
        )
    ]
    if not paths:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    # probe buckets are the TINY side by construction (~probes/2^p of
    # the corpus): gather them and score as ONE vec_id-ordered matrix —
    # deterministic float results independent of how the partitioned
    # write batched rows. If buckets outgrow one node, swap this tail
    # for cosine_topk over ray.data.read_parquet(paths).
    import pyarrow.parquet as pq

    tbl = pa.concat_tables(
        [pq.read_table(f, columns=["vec_id", "embedding"]) for f in paths]
    )
    ids = tbl["vec_id"].to_numpy().astype(np.int64, copy=False)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    embs = _as_matrix(tbl["embedding"])[order]
    if exclude_ids:
        keep = ~np.isin(ids, np.fromiter(exclude_ids, dtype=np.int64))
        ids, embs = ids[keep], embs[keep]
    norms = np.linalg.norm(embs, axis=1)
    norms[norms == 0] = 1.0
    sims = (embs / norms[:, None]) @ q
    top = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, top.size + 1), pa.int64()),
            "vec_id": pa.array(ids[top], pa.int64()),
            "cosine": pa.array(sims[top], pa.float64()),
        }
    )


def cosine_topk_lsh(
    ds: ray.data.Dataset,
    query_vec: np.ndarray,
    k: int = 10,
    *,
    n_planes: int = 6,
    probes: int = 4,
    seed: int = 11,
    exclude_ids: set[int] | None = None,
) -> pa.Table:
    """LSH-bucketed ANN: scan only buckets whose hyperplane signature
    is within `probes` closest to the query's (multi-probe). Recall is
    approximate; this STREAMING variant recomputes signatures per
    query — use build_ann_lsh_index + cosine_topk_lsh_indexed for
    repeated queries at scale."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / (qn if qn else 1.0)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((q.size, n_planes))
    probe_sigs = _probe_sigs(q, planes, probes)
    q_ref = ray.put((q, planes, probe_sigs))
    excl = exclude_ids or set()

    def local_topk(batch: pa.Table) -> pa.Table:
        qv, pl, sigs = ray.get(q_ref)
        ids = batch["vec_id"].to_numpy().astype(np.int64, copy=False)
        embs = _as_matrix(batch["embedding"])
        bits = (embs @ pl) > 0
        sig = (bits.astype(np.int64) << np.arange(pl.shape[1])).sum(axis=1)
        mask = np.isin(sig, np.fromiter(sigs, dtype=np.int64))
        if excl:
            mask &= ~np.isin(ids, np.fromiter(excl, dtype=np.int64))
        ids, embs = ids[mask], embs[mask]
        if ids.size == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())}
            )
        norms = np.linalg.norm(embs, axis=1)
        norms[norms == 0] = 1.0
        sims = (embs / norms[:, None]) @ qv
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {"vec_id": pa.array(ids[order], pa.int64()),
             "cosine": pa.array(sims[order], pa.float64())}
        )

    winners = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    ids = np.array([r["vec_id"] for r in winners], dtype=np.int64)
    sims = np.array([r["cosine"] for r in winners], dtype=np.float64)
    order = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, order.size + 1), pa.int64()),
            "vec_id": pa.array(ids[order], pa.int64()),
            "cosine": pa.array(sims[order], pa.float64()),
        }
    )

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
    approximate; the scale path when a full scan is too expensive."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / (qn if qn else 1.0)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((q.size, n_planes))
    q_margins = q @ planes
    q_bits = q_margins > 0
    # multi-probe: flip the lowest-margin bits
    flip_order = np.argsort(np.abs(q_margins))
    probe_sigs = set()
    for p in range(probes):
        bits = q_bits.copy()
        for b in range(p):
            bits[flip_order[b]] = ~bits[flip_order[b]]
        probe_sigs.add(int((bits.astype(np.int64) << np.arange(n_planes)).sum()))
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

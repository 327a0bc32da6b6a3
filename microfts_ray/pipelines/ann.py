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
    signature scan per query is unaffordable. Crash-safe: built in a
    temp dir and renamed into place (see _atomic_index_dir)."""
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

    with _atomic_index_dir(index_dir) as tmp:
        ds.map_batches(sign, batch_format="pyarrow").write_parquet(
            tmp, partition_cols=["bucket"]
        )
        np.save(os.path.join(tmp, "planes.npy"), planes)
        meta = {"n_planes": n_planes, "seed": seed, "dim": d}
        with open(os.path.join(tmp, "meta.json"), "w") as f:
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


def train_ivf_centroids(
    sample: np.ndarray, n_list: int, iters: int = 5
) -> np.ndarray:
    """Deterministic spherical k-means over a (m, d) float64 sample:
    init = first n_list rows, assignment by max cosine (argmax ties ->
    lowest cell), per-cell mean accumulated SEQUENTIALLY in row order
    (np.add.at — a scalar loop in the same order reproduces it
    bit-for-bit, which is what the fixture oracle does), centroids
    re-normalized each round; an emptied cell keeps its previous
    centroid. No RNG anywhere: same sample -> same centroids on every
    host."""
    norms = np.linalg.norm(sample, axis=1)
    norms[norms == 0] = 1.0
    unit = sample / norms[:, None]
    cents = unit[: min(n_list, unit.shape[0])].copy()
    for _ in range(iters):
        assign = np.argmax(unit @ cents.T, axis=1)
        acc = np.zeros_like(cents)
        cnt = np.zeros(cents.shape[0], dtype=np.int64)
        np.add.at(acc, assign, unit)
        np.add.at(cnt, assign, 1)
        live = cnt > 0
        cents[live] = acc[live] / cnt[live][:, None]
        cn = np.linalg.norm(cents, axis=1)
        cn[cn == 0] = 1.0
        cents = cents / cn[:, None]
    return cents


def _ivf_sample(
    ds: ray.data.Dataset, sample_stride: int, max_sample: int
) -> tuple[np.ndarray, int]:
    """Deterministic bounded training sample: the max_sample SMALLEST
    vec_ids among multiples of sample_stride, as a (m, d) float64
    matrix in vec_id order. Bounded at every tier: each batch keeps at
    most max_sample locally-smallest candidates, the stream reaches
    the driver through iter_batches (backpressure, no take_all), and
    the driver folds batches into one running top-max_sample buffer —
    peak driver memory is O(max_sample + one batch) at ANY corpus
    size. Returns (sample, peak_driver_rows) so tests can assert the
    bound."""

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy().astype(np.int64, copy=False)
        keep = (ids % sample_stride) == 0
        sub = batch.select(["vec_id", "embedding"]).filter(pa.array(keep))
        if sub.num_rows > max_sample:  # local pre-truncate
            order = np.argsort(
                sub["vec_id"].to_numpy().astype(np.int64, copy=False),
                kind="stable",
            )[:max_sample]
            sub = sub.take(order)
        return sub

    best_ids = np.empty(0, dtype=np.int64)
    best_embs: np.ndarray | None = None
    peak = 0
    for batch in ds.map_batches(pick, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        if batch.num_rows == 0:
            continue
        ids = batch["vec_id"].to_numpy().astype(np.int64, copy=False)
        embs = _as_matrix(batch["embedding"])
        if best_embs is None:
            cat_ids, cat_embs = ids, embs
        else:
            cat_ids = np.concatenate([best_ids, ids])
            cat_embs = np.vstack([best_embs, embs])
        peak = max(peak, cat_ids.size)
        order = np.argsort(cat_ids, kind="stable")[:max_sample]
        best_ids, best_embs = cat_ids[order], cat_embs[order]
    if best_embs is None:
        raise ValueError(
            "IVF training sample is empty: no vec_id is divisible by "
            f"sample_stride={sample_stride}; lower the stride"
        )
    return best_embs.astype(np.float64, copy=False), peak


def _atomic_index_dir(index_dir: str):
    """Context for crash-safe partitioned-index builds: yields a temp
    sibling dir to build into; on success the previous index_dir (if
    any) is removed and the temp dir renamed into place in one step —
    a crash mid-build leaves only a .tmp- dir (ignored by readers),
    never partial cell/bucket partitions that a retry would append
    duplicate rows next to (meta.json is written LAST inside the temp
    dir, so its presence still implies a complete build)."""
    import contextlib
    import os
    import shutil
    import uuid

    @contextlib.contextmanager
    def cm():
        tmp = os.path.join(
            os.path.dirname(os.path.abspath(index_dir)) or ".",
            f".{os.path.basename(index_dir)}.tmp-{uuid.uuid4().hex[:8]}",
        )
        try:
            yield tmp
            shutil.rmtree(index_dir, ignore_errors=True)
            os.replace(tmp, index_dir)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    return cm()


def build_ann_ivf_index(
    ds: ray.data.Dataset,
    index_dir: str,
    *,
    n_list: int = 16,
    iters: int = 5,
    sample_stride: int = 7,
    max_sample: int = 4096,
) -> dict:
    """IVF (inverted-file) ANN index: coarse-quantize every embedding
    to its nearest spherical-k-means centroid and write it under that
    cell's partition (`<index>/cell=<j>/*.parquet`); a query then
    scans only its `nprobe` nearest cells. Centroids are trained
    DRIVER-SIDE on a deterministic sample (the max_sample smallest
    vec_ids among multiples of sample_stride) folded incrementally
    from an iter_batches stream — the driver never holds more than
    max_sample + one batch of rows at ANY corpus size (see
    _ivf_sample), while assignment + the partitioned write stream
    through map_batches at full width. The build is crash-safe: it
    lands in a temp dir and renames into place, so a died build can
    never leave partial cell partitions that a retry would duplicate.
    Complements the LSH index (hyperplane buckets): IVF cells adapt
    to the data distribution, so cell populations stay balanced when
    embeddings cluster."""
    import json
    import os

    sample, _peak = _ivf_sample(ds, sample_stride, max_sample)
    cents = train_ivf_centroids(sample, n_list, iters)
    c_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        embs = _as_matrix(batch["embedding"])
        norms = np.linalg.norm(embs, axis=1)
        norms[norms == 0] = 1.0
        cell = np.argmax((embs / norms[:, None]) @ c.T, axis=1)
        return batch.append_column("cell", pa.array(cell, pa.int32()))

    with _atomic_index_dir(index_dir) as tmp:
        ds.map_batches(assign, batch_format="pyarrow").write_parquet(
            tmp, partition_cols=["cell"]
        )
        np.save(os.path.join(tmp, "centroids.npy"), cents)
        meta = {
            "n_list": int(cents.shape[0]),
            "iters": iters,
            "sample_stride": sample_stride,
            "max_sample": max_sample,
            "dim": int(cents.shape[1]),
        }
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f)
    return meta


def cosine_topk_ivf_indexed(
    index_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    *,
    nprobe: int = 4,
    exclude_ids: set[int] | None = None,
) -> pa.Table:
    """ANN query against a persisted IVF index: rank cells by centroid
    cosine (ties -> lowest cell id), read ONLY the nprobe nearest
    cells' partitions, exact-rescore within them. Same
    gather-sort-score tail as cosine_topk_lsh_indexed so results are
    deterministic regardless of write batching."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / (qn if qn else 1.0)
    csims = cents @ q
    cells = np.lexsort((np.arange(cents.shape[0]), -csims))[:nprobe]
    paths = [
        f
        for c in sorted(int(c) for c in cells)
        for f in sorted(
            _glob.glob(os.path.join(index_dir, f"cell={c}", "*.parquet"))
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

"""Deduplication operators for training-data pipelines.

Exact (hash groupby), MinHash+LSH, SimHash, n-gram Jaccard and
embedding-cosine near-dup — each expressed Ray-Data-first:
`map_batches` computes per-doc signatures (vectorized numpy), a
`groupby` on the bucket key co-locates only candidate groups, and
`map_groups` emits verified pairs. The shuffle therefore moves
signatures (bytes per doc), never raw text.

Scale notes: bucket groups are capped (`max_bucket`) — a degenerate
bucket (e.g. empty docs) would otherwise emit O(n^2) pairs; capped
buckets are logged in the output as dropped. Pair outputs are
(a < b) canonical and globally deduplicated by a final groupby.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data

from .textstats import word_tokens

_MERSENNE = (1 << 61) - 1


def exact_dedup(ds: ray.data.Dataset, key: str = "text") -> ray.data.Dataset:
    """(h, keep_id, dup_count): md5 groups with the smallest doc_id
    kept — the hash-partition + per-group-first pattern."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5(t.encode()).hexdigest() for t in batch[key].to_pylist()]
        return pa.table({"h": pa.array(hs), "doc_id": batch["doc_id"]})

    from ray.data.aggregate import Count, Min

    agg = ds.map_batches(add_hash, batch_format="pyarrow").groupby("h").aggregate(
        Min("doc_id"), Count()
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": batch["h"],
                "keep_id": batch["min(doc_id)"].cast(pa.int64()),
                "dup_count": batch["count()"].cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """64-bit hashes of word k-gram shingles (deterministic)."""
    toks = word_tokens(text)
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
        )
    return out


def _minhash_sig(sh: np.ndarray, n_perm: int, seed: int = 7) -> np.ndarray:
    """n_perm minhashes via universal hashing a*x+b mod p (vectorized)."""
    if sh.size == 0:
        return np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    x = (sh % np.uint64(_MERSENNE)).astype(np.object_)  # python ints: exact mod-mul
    sig = np.empty(n_perm, dtype=np.uint64)
    for i in range(n_perm):
        vals = (int(a[i]) * x + int(b[i])) % _MERSENNE
        sig[i] = int(vals.min())
    return sig


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    *,
    n_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    k: int = 3,
    max_bucket: int = 64,
) -> ray.data.Dataset:
    """Near-dup candidate pairs via MinHash + banded LSH, verified by
    signature-estimated Jaccard >= threshold.

    shingle -> minhash -> band buckets (groupby) -> in-bucket verify.
    Output: (a, b, jaccard_est) with a < b, deduplicated.
    """
    rows_per_band = n_perm // bands

    def sig_rows(batch: pa.Table) -> pa.Table:
        out = {"band": [], "bucket": [], "doc_id": [], "sig": []}
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sig = _minhash_sig(_shingle_hashes(text, k), n_perm)
            sig_bytes = sig.tobytes()
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                bucket = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "big"
                ) & 0x7FFFFFFFFFFFFFFF
                out["band"].append(band)
                out["bucket"].append(bucket)
                out["doc_id"].append(doc_id)
                out["sig"].append(sig_bytes)
        return pa.table(
            {
                "band": pa.array(out["band"], pa.int32()),
                "bucket": pa.array(out["bucket"], pa.int64()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "sig": pa.array(out["sig"], pa.large_binary()),
            }
        )

    buckets = ds.map_batches(sig_rows, batch_format="pyarrow")

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_pylist()
        if len(ids) < 2 or len(ids) > max_bucket:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "jaccard_est": pa.array([], pa.float64())}
            )
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in group["sig"].to_pylist()]
        a_out, b_out, j_out = [], [], []
        order = np.argsort(ids)
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                x, y = order[ii], order[jj]
                if ids[x] == ids[y]:
                    continue
                est = float((sigs[x] == sigs[y]).mean())
                if est >= threshold:
                    a_out.append(min(ids[x], ids[y]))
                    b_out.append(max(ids[x], ids[y]))
                    j_out.append(est)
        return pa.table(
            {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64()),
             "jaccard_est": pa.array(j_out, pa.float64())}
        )

    pairs = buckets.groupby(["band", "bucket"]).map_groups(
        emit_pairs, batch_format="pyarrow"
    )
    # dedup pairs found in multiple bands
    from ray.data.aggregate import Max

    agg = pairs.groupby(["a", "b"]).aggregate(Max("jaccard_est"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"a": batch["a"], "b": batch["b"],
             "jaccard_est": batch["max(jaccard_est)"]}
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def simhash64(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, simhash) — 64-bit SimHash over word tokens weighted by
    tf; deterministic (blake2b token hashes)."""

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch["text"].to_pylist():
            toks = word_tokens(text)
            if not toks:
                out.append(0)
                continue
            uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
            hs = np.empty(uniq.size, dtype=np.uint64)
            for i, t in enumerate(uniq):
                hs[i] = int.from_bytes(
                    hashlib.blake2b(str(t).encode(), digest_size=8).digest(), "big"
                )
            bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
            votes = ((bits.astype(np.int64) * 2 - 1) * counts[:, None]).sum(axis=0)
            sh = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
            out.append(sh & 0x7FFFFFFFFFFFFFFF)
        return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def ngram_jaccard_pairs(
    ds: ray.data.Dataset, *, k: int = 3, threshold: float = 0.5, max_bucket: int = 256
) -> ray.data.Dataset:
    """Exact n-gram Jaccard near-dup pairs, LSH-free: bucket by the
    single smallest shingle hash (docs sharing no shingle can't reach
    any threshold > 0), verify exact Jaccard within buckets."""

    def sig_rows(batch: pa.Table) -> pa.Table:
        bucket, doc, shing = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sh = np.unique(_shingle_hashes(text, k))
            if sh.size == 0:
                continue
            # emit one row per min-K shingles: candidate generation
            for h in sh[: min(8, sh.size)]:
                bucket.append(int(h) & 0x7FFFFFFFFFFFFFFF)
                doc.append(doc_id)
                shing.append(sh.tobytes())
        return pa.table(
            {"bucket": pa.array(bucket, pa.int64()), "doc_id": pa.array(doc, pa.int64()),
             "sh": pa.array(shing, pa.large_binary())}
        )

    def emit(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_pylist()
        a_out, b_out, j_out = [], [], []
        if 2 <= len(ids) <= max_bucket:
            shs = [np.frombuffer(s, dtype=np.uint64) for s in group["sh"].to_pylist()]
            order = np.argsort(ids)
            for ii in range(len(order)):
                for jj in range(ii + 1, len(order)):
                    x, y = order[ii], order[jj]
                    if ids[x] == ids[y]:
                        continue
                    inter = np.intersect1d(shs[x], shs[y]).size
                    union = shs[x].size + shs[y].size - inter
                    jac = inter / union if union else 0.0
                    if jac >= threshold:
                        a_out.append(min(ids[x], ids[y]))
                        b_out.append(max(ids[x], ids[y]))
                        j_out.append(jac)
        return pa.table(
            {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64()),
             "jaccard": pa.array(j_out, pa.float64())}
        )

    pairs = (
        ds.map_batches(sig_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit, batch_format="pyarrow")
    )
    from ray.data.aggregate import Max

    agg = pairs.groupby(["a", "b"]).aggregate(Max("jaccard"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"a": batch["a"], "b": batch["b"], "jaccard": batch["max(jaccard)"]}
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 11,
    max_bucket: int = 512,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup: random-hyperplane LSH buckets
    (groupby) then exact cosine verify within buckets.

    Expects (vec_id, embedding:list<float>). Output (a, b, cosine).
    """

    def sig_rows(batch: pa.Table) -> pa.Table:
        embs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        ids = batch["vec_id"].to_pylist()
        if embs.size == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                 "emb": pa.array([], pa.large_binary())}
            )
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((embs.shape[1], n_planes))
        bits = (embs @ planes) > 0
        bucket = (bits.astype(np.int64) << np.arange(n_planes)).sum(axis=1)
        return pa.table(
            {"bucket": pa.array(bucket, pa.int64()),
             "vec_id": pa.array(ids, pa.int64()),
             "emb": pa.array([e.tobytes() for e in embs], pa.large_binary())}
        )

    def emit(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_pylist()
        a_out, b_out, c_out = [], [], []
        if 2 <= len(ids) <= max_bucket:
            embs = np.stack(
                [np.frombuffer(e, dtype=np.float64) for e in group["emb"].to_pylist()]
            )
            norms = np.linalg.norm(embs, axis=1)
            norms[norms == 0] = 1.0
            unit = embs / norms[:, None]
            sims = unit @ unit.T
            order = np.argsort(ids)
            for ii in range(len(order)):
                for jj in range(ii + 1, len(order)):
                    x, y = order[ii], order[jj]
                    if sims[x, y] >= threshold:
                        a_out.append(min(ids[x], ids[y]))
                        b_out.append(max(ids[x], ids[y]))
                        c_out.append(float(sims[x, y]))
        return pa.table(
            {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64()),
             "cosine": pa.array(c_out, pa.float64())}
        )

    return (
        ds.map_batches(sig_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit, batch_format="pyarrow")
    )

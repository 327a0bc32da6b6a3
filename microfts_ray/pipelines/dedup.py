"""Deduplication operators for training-data pipelines.

Exact (hash groupby), MinHash+LSH, SimHash, n-gram Jaccard and
embedding-cosine near-dup — each expressed Ray-Data-first:
`map_batches` computes per-doc signatures (vectorized numpy), a
`groupby` on the bucket key co-locates only candidate groups, and
`map_groups` emits verified pairs. The shuffle therefore moves
signatures (bytes per doc), never raw text.

Scale notes: bucket groups are capped (`max_bucket`) — a degenerate
bucket (e.g. empty docs) would otherwise emit O(n^2) pairs; over-cap
buckets are SKIPPED and logged through the `microfts_ray.dedup`
logger (one warning per dropped bucket with its size), so candidate
loss is visible, never silent. Pair outputs are (a < b) canonical and
globally deduplicated by a final groupby.
"""

from __future__ import annotations

import hashlib
import logging
import re

import numpy as np
import pyarrow as pa
import ray.data

from .textstats import word_tokens

logger = logging.getLogger("microfts_ray.dedup")

_MERSENNE = (1 << 61) - 1
_P61 = np.uint64(_MERSENNE)
_M32 = np.uint64(0xFFFFFFFF)


def _log_dropped_bucket(op: str, key, size: int, cap: int) -> None:
    logger.warning(
        "%s: dropped over-cap bucket %s (size %d > max_bucket %d); "
        "pairs within it are not emitted", op, key, size, cap
    )


def exact_dedup(ds: ray.data.Dataset, key: str = "text") -> ray.data.Dataset:
    """(h, keep_id, dup_count): md5 groups with the smallest doc_id
    kept — the hash-partition + per-group-first pattern."""

    def add_hash(batch: pa.Table) -> pa.Table:
        # per-batch combine (Arrow hash group_by): the shuffle moves
        # one (hash, min_id, count) partial per distinct hash per
        # batch, never a row per document
        hs = [hashlib.md5(t.encode()).hexdigest() for t in batch[key].to_pylist()]
        tbl = pa.table({"h": pa.array(hs), "doc_id": batch["doc_id"]})
        import pyarrow.compute as pc

        g = tbl.group_by("h").aggregate(
            [("doc_id", "min"),
             ("doc_id", "count", pc.CountOptions(mode="all"))]
        )
        return g.rename_columns(["h", "pmin", "pcount"])

    from ray.data.aggregate import Min, Sum

    agg = ds.map_batches(add_hash, batch_format="pyarrow").groupby("h").aggregate(
        Min("pmin"), Sum("pcount")
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": batch["h"],
                "keep_id": batch["min(pmin)"].cast(pa.int64()),
                "dup_count": batch["sum(pcount)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def exact_dedup_filter(
    ds: ray.data.Dataset,
    key: str = "text",
    *,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """The corpus with exact duplicates removed (first doc_id per
    content hash kept). The heavy side never shuffles text: the
    keep-set comes from exact_dedup's combiner groupby over (hash,
    doc_id) partials, and the corpus is filtered by an INNER join on
    doc_id — both sides of every shuffle are slim columns."""
    keeps = exact_dedup(ds, key)

    def keep_ids(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["keep_id"].cast(pa.int64())})

    keep_ds = _rebase(keeps.map_batches(keep_ids, batch_format="pyarrow"))
    # the corpus side must ALSO be guarded: Dataset.join crashes when
    # EITHER side's first block is empty (ray 2.49), and a corpus
    # arriving from an upstream filter can lead with one
    return _drop_empty_blocks(ds).join(
        keep_ds, "inner", num_partitions, on=("doc_id",)
    )


def _shingle_hashes(text: str, k: int = 3, memo: dict | None = None) -> np.ndarray:
    """64-bit blake2b hashes of the DISTINCT word k-gram shingles
    (deterministic). Both consumers are set-based (minhash takes a
    min; Jaccard uniquifies), so duplicates are dropped before the
    hash calls; `memo` lets a batch share shingle hashes across docs
    (boilerplate lines repeat heavily in real corpora)."""
    toks = word_tokens(text)
    if len(toks) < k:
        shingles = {" ".join(toks)} if toks else set()
    else:
        shingles = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    out = np.empty(len(shingles), dtype=np.uint64)
    blake = hashlib.blake2b
    if memo is None:
        for i, s in enumerate(shingles):
            out[i] = int.from_bytes(blake(s.encode(), digest_size=8).digest(), "big")
    else:
        for i, s in enumerate(shingles):
            h = memo.get(s)
            if h is None:
                h = int.from_bytes(blake(s.encode(), digest_size=8).digest(), "big")
                memo[s] = h
            out[i] = h
    return out


def _modmul_add(a: np.uint64, b: np.uint64, x: np.ndarray) -> np.ndarray:
    """(a*x + b) mod 2^61-1, exact, pure uint64 (no Python bigints):
    32-bit limb products reduced with 2^61 ≡ 1 (mod p)."""
    a0 = a & _M32
    a1 = a >> np.uint64(32)
    x0 = x & _M32
    x1 = x >> np.uint64(32)
    hi = a1 * x1  # < 2^58
    mid = a1 * x0 + a0 * x1  # < 2^62
    lo = a0 * x0  # < 2^64
    # mid * 2^32 mod p: split mid at 29 bits (2^29 * 2^32 = 2^61 ≡ 1)
    mid_mod = (mid >> np.uint64(29)) + (
        (mid & np.uint64((1 << 29) - 1)) << np.uint64(32)
    )
    lo_mod = (lo >> np.uint64(61)) + (lo & _P61)
    r = np.uint64(8) * hi + mid_mod + lo_mod + b  # < ~2^63
    r = (r >> np.uint64(61)) + (r & _P61)
    r = (r >> np.uint64(61)) + (r & _P61)
    return np.where(r >= _P61, r - _P61, r)


def _perm_constants(n_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def _minhash_sig(sh: np.ndarray, n_perm: int, seed: int = 7) -> np.ndarray:
    """n_perm minhashes via universal hashing (a*x+b) mod 2^61-1 —
    bit-identical to the scalar bigint definition, vectorized."""
    return _minhash_sigs([sh], n_perm, seed)[0]


def _minhash_sigs(
    hash_arrays: list[np.ndarray], n_perm: int, seed: int = 7
) -> np.ndarray:
    """(n_docs, n_perm) minhash signatures for a whole batch in one
    vectorized pass: concatenate every doc's shingle hashes, apply
    each permutation to the flat array, segment-min per doc."""
    n_docs = len(hash_arrays)
    a, b = _perm_constants(n_perm, seed)
    sigs = np.full((n_docs, n_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonempty = [i for i, h in enumerate(hash_arrays) if h.size]
    if not nonempty:
        return sigs
    flat = np.concatenate([hash_arrays[i] for i in nonempty]) % _P61
    lens = np.array([hash_arrays[i].size for i in nonempty])
    starts = np.zeros(lens.size, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    rows = np.array(nonempty)
    for j in range(n_perm):
        vals = _modmul_add(a[j], b[j], flat)
        sigs[rows, j] = np.minimum.reduceat(vals, starts)
    return sigs


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

    The shuffle key is a bucket SHARD (band, bucket & mask), not the
    raw bucket: most buckets are singletons, and one map_groups call
    per singleton bucket is pure per-group overhead. A shard holds
    many buckets; the group fn sub-groups by exact bucket with one
    argsort and vectorizes each real bucket's pair check.
    """
    rows_per_band = n_perm // bands
    shard_mask = (1 << 10) - 1  # 1024 shards/band; hashed buckets balance

    def sig_rows(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_pylist()
        memo: dict = {}
        hashes = [_shingle_hashes(t, k, memo) for t in texts]
        sigs = _minhash_sigs(hashes, n_perm)  # one vectorized pass
        out = {"bucket": [], "doc_id": [], "sig": []}
        blake = hashlib.blake2b
        for di, doc_id in enumerate(ids):
            sig = sigs[di]
            sig_bytes = sig.tobytes()
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                # band index is salted INTO the bucket hash, so one
                # int64 key carries (band, band-chunk) identity
                bucket = int.from_bytes(
                    blake(band.to_bytes(4, "big") + chunk.tobytes(),
                          digest_size=8).digest(), "big"
                ) & 0x7FFFFFFFFFFFFFFF
                out["bucket"].append(bucket)
                out["doc_id"].append(doc_id)
                out["sig"].append(sig_bytes)
        t = pa.table(
            {
                "bucket": pa.array(out["bucket"], pa.int64()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "sig": pa.array(out["sig"], pa.large_binary()),
            }
        )
        shard = np.bitwise_and(t["bucket"].to_numpy(), shard_mask)
        return t.append_column("shard", pa.array(shard, pa.int64()))

    buckets = ds.map_batches(sig_rows, batch_format="pyarrow")

    def emit_pairs(group: pa.Table) -> pa.Table:
        bkt = group["bucket"].to_numpy()
        ids_all = group["doc_id"].to_numpy()
        sig_col = group["sig"]
        order0 = np.argsort(bkt, kind="stable")
        bs = bkt[order0]
        starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        ends = np.r_[starts[1:], bs.size]
        a_out, b_out, j_out = [], [], []
        for s, e in zip(starts, ends):
            m = int(e - s)
            if m < 2:
                continue
            if m > max_bucket:
                _log_dropped_bucket("minhash_lsh", int(bs[s]), m, max_bucket)
                continue
            idx = order0[s:e]
            ids = ids_all[idx]
            order = np.argsort(ids)
            idx = idx[order]
            ids = ids[order]
            S = np.stack(
                [np.frombuffer(sig_col[int(i)].as_py(), dtype=np.uint64) for i in idx]
            )
            est = (S[:, None, :] == S[None, :, :]).mean(axis=2)
            iu, ju = np.triu_indices(m, 1)
            keep = (est[iu, ju] >= threshold) & (ids[iu] != ids[ju])
            a_out.extend(ids[iu[keep]].tolist())
            b_out.extend(ids[ju[keep]].tolist())
            j_out.extend(est[iu[keep], ju[keep]].tolist())
        return pa.table(
            {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64()),
             "jaccard_est": pa.array(j_out, pa.float64())}
        )

    pairs = buckets.groupby("shard").map_groups(
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


def union_find_components(
    a: np.ndarray, b: np.ndarray
) -> dict[int, int]:
    """id -> component-min-id over the pair edges (a[i], b[i]).
    Plain union-find with path halving; runs driver-side over the
    MATCHED pairs only (bounded by bucket caps + threshold — orders
    of magnitude smaller than the corpus). Escalation beyond a
    driver-sized pair list: iterative hash-to-min label propagation
    as repeated groupby rounds."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            # union by VALUE: smaller id becomes the root, so every
            # component's root is its minimum member
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def near_dup_filter(
    ds: ray.data.Dataset,
    pairs,
    *,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Drop near-duplicate LOSERS from a corpus: given verified dup
    pairs (a, b), keep only each connected component's minimum id and
    every unpaired row. `pairs` is a Dataset or Arrow table with
    int64 columns a, b. The drop-set is broadcast ONCE (ray.put of a
    sorted id array) and each map_batches task filters with a
    vectorized searchsorted membership test — no shuffle of the
    corpus itself."""
    import ray as _ray

    if isinstance(pairs, ray.data.Dataset):
        rows = pairs.select_columns(["a", "b"]).take_all()
        a = np.array([r["a"] for r in rows], dtype=np.int64)
        b = np.array([r["b"] for r in rows], dtype=np.int64)
    else:
        a = pairs["a"].to_numpy().astype(np.int64, copy=False)
        b = pairs["b"].to_numpy().astype(np.int64, copy=False)
    comp = union_find_components(a, b)
    drop = np.array(
        sorted(x for x, root in comp.items() if x != root), dtype=np.int64
    )
    drop_ref = _ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        d = _ray.get(drop_ref)
        if d.size == 0:
            return batch
        ids = batch[id_col].to_numpy().astype(np.int64, copy=False)
        pos = np.searchsorted(d, ids)
        hit = (pos < d.size) & (d[np.minimum(pos, d.size - 1)] == ids)
        return batch.filter(pa.array(~hit))

    return ds.map_batches(keep, batch_format="pyarrow")


def _cat_blocks(sch, *tbls):
    """Concat only real blocks; stamp the dataset schema on all-empty
    groups so downstream consumers (joins) never see a block without
    the expected columns. (Sort/union emit schemaless empty blocks,
    and map_batches passes empty blocks through WITHOUT calling the
    fn, so pass-through empties can even carry an upstream schema.)"""
    live = [t for t in tbls if t.num_rows and t.num_columns]
    if live:
        return pa.concat_tables(live)
    return sch.empty_table() if sch is not None else tbls[0]


def _drop_empty_blocks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Join-side guard: Dataset.join crashes when a side's FIRST
    block is empty (even schema-ful — reproduced on ray 2.49), so
    rebuild the dataset from its non-empty block refs. Unlike
    _rebase this does NOT coalesce — blocks are re-referenced in
    place (metadata RPCs only, no data copy), so it is cheap enough
    for the corpus side of a join."""
    import ray as _ray

    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        return mat
    meta_of = _ray.remote(num_cpus=0)(lambda t: (t.schema, t.num_rows))
    metas = _ray.get([meta_of.remote(r) for r in refs])
    live = [r for r, (_s, n) in zip(refs, metas) if n > 0]
    if live:
        if len(live) == len(refs):
            return mat  # nothing to drop: keep the materialized plan
        return ray.data.from_arrow_refs(live)
    real = next((s for s, _n in metas if len(s) > 0), None)
    if real is not None:
        empty_of = _ray.remote(num_cpus=0)(lambda s: s.empty_table())
        return ray.data.from_arrow_refs([empty_of.remote(real)])
    return ray.data.from_arrow_refs(refs[:1])


def _rebase(ds: ray.data.Dataset) -> ray.data.Dataset:
    """HARD lineage break + block coalesce + schema normalization.
    Two accumulation modes kill iterative Dataset loops (measured:
    same 43-row labels, round materialize 2 s -> 140 s by round 6):
    (1) union re-executes its inputs' logical plans even when
    materialized, so each new plan compounds every prior round;
    (2) union concatenates block lists and sort preserves them, so
    block count grows ~3x per round and per-block fixed costs
    dominate. Rebuilding from (coalesced) refs fixes both; blocks
    stay in the object store — nothing moves to the driver. The
    coalesce target is byte-derived (~64 MB blocks, floor 8) so big
    datasets keep their parallelism and small ones stop paying
    per-block tax."""
    import ray as _ray

    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        return mat
    desired = max(8, int((mat.size_bytes() or 0) // (64 << 20)) + 1)
    desired = min(desired, len(refs))
    step = -(-len(refs) // desired)
    cat = _ray.remote(num_cpus=0)(_cat_blocks)
    grouped = [
        cat.remote(None, *refs[i : i + step])
        for i in range(0, len(refs), step)
    ]
    # metadata pass: Dataset.schema() can report a schemaless EMPTY
    # first block as the dataset schema, and Dataset.join breaks when
    # a side's FIRST block is empty (even schema-ful — reproduced on
    # ray 2.49), so DROP empty groups outright; if everything is
    # empty keep one group stamped with the real schema when any
    # exists. The metadata RPCs move bytes-sized objects, never data.
    meta_of = _ray.remote(num_cpus=0)(lambda t: (t.schema, t.num_rows))
    metas = _ray.get([meta_of.remote(g) for g in grouped])
    live = [g for g, (s, n) in zip(grouped, metas) if n > 0]
    if live:
        return ray.data.from_arrow_refs(live)
    real = next((s for s, _n in metas if len(s) > 0), None)
    if real is not None:
        empty_of = _ray.remote(num_cpus=0)(lambda s: s.empty_table())
        return ray.data.from_arrow_refs([empty_of.remote(real)])
    return ray.data.from_arrow_refs(grouped[:1])


def connected_components(
    pairs,
    *,
    max_rounds: int = 50,
    n_shards: int = 256,
) -> ray.data.Dataset:
    """(node, label) with label = component minimum, computed FULLY
    DISTRIBUTED by min-label propagation — the scale path when the
    dup-pair list exceeds driver memory (near_dup_filter's driver
    union-find is the small-side fast path).

    Each round is two groupby shuffles over the DUP GRAPH only (not
    the corpus): propagate every node's current label across its
    edges AND through the label table itself (pointer doubling:
    label(x) <- label(label(x))), then take the per-node min. Shuffle
    keys are hash shards (n_shards buckets), and per-shard work is
    one argsort + segment mins — no Python loop over nodes. Pointer
    doubling makes convergence O(log n) rounds regardless of
    component diameter. A round that changes no label ends the loop;
    exceeding max_rounds raises."""
    import ray as _ray
    from ray.data.aggregate import Sum

    if n_shards < 1 or (n_shards & (n_shards - 1)) != 0:
        raise ValueError(
            f"connected_components: n_shards must be a power of two "
            f"(got {n_shards}) — shards are computed as key & "
            "(n_shards - 1); a non-power-of-two silently skews and "
            "drops buckets"
        )
    if isinstance(pairs, ray.data.Dataset):
        edges = _rebase(pairs.select_columns(["a", "b"]))
    else:
        edges = ray.data.from_arrow(pairs.select(["a", "b"]))

    mask = np.int64(n_shards - 1)

    def sym(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy().astype(np.int64, copy=False)
        b = batch["b"].to_numpy().astype(np.int64, copy=False)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table(
            {"key": pa.array(src, pa.int64()),
             "val": pa.array(dst, pa.int64()),
             "is_lab": pa.array(np.zeros(src.size, np.int8), pa.int8()),
             "shard": pa.array(src & mask, pa.int64())}
        )

    edge_rows = _rebase(edges.map_batches(sym, batch_format="pyarrow"))
    if edge_rows.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()),
                 "label": pa.array([], pa.int64())}
            )
        )

    # initial labels: node -> min(node, min neighbor) in ONE groupby
    def init_lab(group: pa.Table) -> pa.Table:
        key = group["key"].to_numpy().astype(np.int64, copy=False)
        val = group["val"].to_numpy().astype(np.int64, copy=False)
        order = np.argsort(key, kind="stable")
        key, val = key[order], val[order]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        nodes = key[starts]
        lab = np.minimum(np.minimum.reduceat(val, starts), nodes)
        return pa.table(
            {"node": pa.array(nodes, pa.int64()),
             "label": pa.array(lab, pa.int64())}
        )

    labels = _rebase(
        edge_rows.groupby("shard").map_groups(init_lab, batch_format="pyarrow")
    )

    def lab_rows(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy().astype(np.int64, copy=False)
        return pa.table(
            {"key": batch["node"],
             "val": batch["label"],
             "is_lab": pa.array(np.ones(node.size, np.int8), pa.int8()),
             "shard": pa.array(node & mask, pa.int64())}
        )

    def propagate(group: pa.Table) -> pa.Table:
        key = group["key"].to_numpy().astype(np.int64, copy=False)
        val = group["val"].to_numpy().astype(np.int64, copy=False)
        is_lab = group["is_lab"].to_numpy().astype(np.int8, copy=False)
        # label row first within each key: one argsort, then the
        # per-key label broadcasts to that key's edge rows by repeat
        order = np.lexsort((1 - is_lab, key))
        key, val, is_lab = key[order], val[order], is_lab[order]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        counts = np.diff(np.r_[starts, key.size])
        lab = np.repeat(val[starts], counts)  # starts are label rows
        edge = is_lab == 0
        dst = val[edge]
        return pa.table(
            {"node": pa.array(dst, pa.int64()),
             "cand": pa.array(lab[edge], pa.int64()),
             "shard2": pa.array(dst & mask, pa.int64())}
        )

    def update(group: pa.Table) -> pa.Table:
        node = group["node"].to_numpy().astype(np.int64, copy=False)
        val = group["val"].to_numpy().astype(np.int64, copy=False)
        is_old = group["is_old"].to_numpy().astype(np.int8, copy=False)
        order = np.lexsort((1 - is_old, node))
        node, val, is_old = node[order], val[order], is_old[order]
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        nodes = node[starts]
        old = val[starts]  # old-label row sorts first per node
        new = np.minimum.reduceat(val, starts)
        return pa.table(
            {"node": pa.array(nodes, pa.int64()),
             "label": pa.array(new, pa.int64()),
             "changed": pa.array((new < old).astype(np.int64), pa.int64())}
        )

    def dbl_rows(batch: pa.Table) -> pa.Table:
        # pointer-doubling requests: node x asks key=label(x) for ITS
        # label, so label(x) <- label(label(x)) each round — this is
        # what turns convergence from O(diameter) into O(log n)
        lab = batch["label"].to_numpy().astype(np.int64, copy=False)
        return pa.table(
            {"key": batch["label"],
             "val": batch["node"],
             "is_lab": pa.array(np.zeros(lab.size, np.int8), pa.int8()),
             "shard": pa.array(lab & mask, pa.int64())}
        )

    for _round in range(max_rounds):
        lab_tagged = labels.map_batches(lab_rows, batch_format="pyarrow")
        props = (
            edge_rows.union(
                lab_tagged,
                labels.map_batches(dbl_rows, batch_format="pyarrow"),
            )
            .groupby("shard")
            .map_groups(propagate, batch_format="pyarrow")
        )

        def old_rows(batch: pa.Table) -> pa.Table:
            node = batch["node"].to_numpy().astype(np.int64, copy=False)
            return pa.table(
                {"node": batch["node"], "val": batch["label"],
                 "is_old": pa.array(np.ones(node.size, np.int8), pa.int8()),
                 "shard2": pa.array(node & mask, pa.int64())}
            )

        def cand_rows(batch: pa.Table) -> pa.Table:
            node = batch["node"].to_numpy().astype(np.int64, copy=False)
            return pa.table(
                {"node": batch["node"], "val": batch["cand"],
                 "is_old": pa.array(np.zeros(node.size, np.int8), pa.int8()),
                 "shard2": batch["shard2"]}
            )

        merged = _rebase(
            labels.map_batches(old_rows, batch_format="pyarrow")
            .union(props.map_batches(cand_rows, batch_format="pyarrow"))
            .groupby("shard2")
            .map_groups(update, batch_format="pyarrow")
        )
        n_changed = merged.aggregate(Sum("changed")).get("sum(changed)") or 0
        labels = _rebase(merged.select_columns(["node", "label"]))
        if not n_changed:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(pathological chain graph? raise max_rounds)"
    )


def near_dup_filter_dist(
    ds: ray.data.Dataset,
    pairs,
    *,
    id_col: str = "doc_id",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Fully distributed near-dedup filter: distributed connected
    components over the pair graph, then an ANTI-JOIN (left_outer +
    null filter) of the corpus against the loser set — no driver
    materialization anywhere, for when pair lists or drop-sets exceed
    one machine. Same result as near_dup_filter."""
    labels = connected_components(pairs)

    def losers(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy().astype(np.int64, copy=False)
        lab = batch["label"].to_numpy().astype(np.int64, copy=False)
        keep = node != lab
        return pa.table(
            {id_col: pa.array(node[keep], pa.int64()),
             "_drop": pa.array(np.ones(int(keep.sum()), np.int8), pa.int8())}
        )

    # _rebase: empty label blocks pass through map_batches WITHOUT
    # the fn running, keeping the (node, label) schema — the join's
    # right side must be uniformly (doc_id, _drop)
    drop = _rebase(labels.map_batches(losers, batch_format="pyarrow"))
    # guard the corpus side too: join breaks on an empty FIRST block
    # on either side (see _drop_empty_blocks)
    joined = _drop_empty_blocks(ds).join(
        drop, "left_outer", num_partitions, on=(id_col,),
    )

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_null(batch["_drop"])).drop_columns(["_drop"])

    return joined.map_batches(keep, batch_format="pyarrow")


def minhash_dedup(
    ds: ray.data.Dataset,
    *,
    n_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    k: int = 3,
    max_bucket: int = 64,
) -> ray.data.Dataset:
    """End-to-end near-dedup a corpus: MinHash+LSH pairs, connected
    components, keep each component's minimum doc_id. The corpus
    streams through the final filter unchanged except for dropped
    losers; only the (tiny) pair list is materialized driver-side."""
    pairs = minhash_lsh_pairs(
        ds, n_perm=n_perm, bands=bands, threshold=threshold,
        k=k, max_bucket=max_bucket,
    )
    return near_dup_filter(ds, pairs)


def simhash64(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, simhash) — 64-bit SimHash over word tokens weighted by
    tf; deterministic (blake2b token hashes)."""

    def fn(batch: pa.Table) -> pa.Table:
        # hash the batch VOCABULARY once (unique tokens across all
        # docs), then each doc's simhash is a small matmul over its
        # vocab slice — same blake2b values as the per-row form
        texts = batch["text"].to_pylist()
        vocab: dict[str, int] = {}
        doc_idx: list[np.ndarray] = []
        for text in texts:
            toks = word_tokens(text)
            ii = np.empty(len(toks), dtype=np.int64)
            for j, t in enumerate(toks):
                v = vocab.get(t)
                if v is None:
                    v = len(vocab)
                    vocab[t] = v
                ii[j] = v
            doc_idx.append(ii)
        blake = hashlib.blake2b
        hs = np.empty(len(vocab), dtype=np.uint64)
        for t, v in vocab.items():
            hs[v] = int.from_bytes(blake(t.encode(), digest_size=8).digest(), "big")
        # ±1 bit matrix for the whole vocab: (V, 64) int64
        pm = (
            ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
            .astype(np.int64) * 2 - 1
        )
        shifts = np.arange(64, dtype=np.uint64)
        out = []
        for ii in doc_idx:
            if ii.size == 0:
                out.append(0)
                continue
            uniq, counts = np.unique(ii, return_counts=True)
            votes = counts @ pm[uniq]
            sh = int(((votes > 0).astype(np.uint64) << shifts).sum())
            out.append(sh & 0x7FFFFFFFFFFFFFFF)
        return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def simhash_pairs(
    ds: ray.data.Dataset,
    *,
    max_hamming: int = 3,
    max_bucket: int = 512,
) -> ray.data.Dataset:
    """SimHash near-dup pairs: (a, b, hamming) with a < b and
    hamming(simhash_a, simhash_b) <= max_hamming.

    Banded LSH over the 64-bit simhash: 4 x 16-bit bands; by the
    pigeonhole principle any pair within hamming <= 3 shares at least
    one identical band, so with max_hamming <= 3 recall is EXACT
    (modulo logged over-cap bucket drops) — only pairs sharing a band
    are ever compared, never all pairs. The shuffle moves one
    (band-key, doc_id, simhash) row per doc per band."""
    n_bands, band_bits = 4, 16
    if max_hamming >= n_bands:
        raise ValueError("max_hamming must be < 4 for exact 4-band recall")
    sims = simhash64(ds)
    mask = np.uint64((1 << band_bits) - 1)

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64, copy=False)
        h = batch["simhash"].to_numpy().astype(np.uint64)
        out_key, out_id, out_h = [], [], []
        for band in range(n_bands):
            piece = (h >> np.uint64(band * band_bits)) & mask
            # band salted into the key; pieces are only 16 bits so the
            # key space is small enough to carry raw (no hash needed)
            key = (piece.astype(np.int64) << 2) | band
            out_key.append(key)
            out_id.append(ids)
            out_h.append(h)
        return pa.table(
            {
                "bkey": pa.array(np.concatenate(out_key), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
                "simhash": pa.array(
                    np.concatenate(out_h).view(np.int64), pa.int64()
                ),
            }
        )

    def emit(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy().astype(np.int64, copy=False)
        h = group["simhash"].to_numpy().view(np.uint64)
        m = ids.size
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int64())}
        )
        if m < 2:
            return empty
        if m > max_bucket:
            _log_dropped_bucket(
                "simhash_pairs", int(group["bkey"][0].as_py()), m, max_bucket
            )
            return empty
        order = np.argsort(ids, kind="stable")
        ids, h = ids[order], h[order]
        xor = np.bitwise_xor.outer(h, h)
        ham = _POP8[xor.view(np.uint8).reshape(m, m, 8)].sum(axis=2).astype(np.int64)
        ii, jj = np.triu_indices(m, k=1)
        hit = ham[ii, jj] <= max_hamming
        keep = (ids[ii[hit]] != ids[jj[hit]])
        return pa.table(
            {
                "a": pa.array(ids[ii[hit]][keep], pa.int64()),
                "b": pa.array(ids[jj[hit]][keep], pa.int64()),
                "hamming": pa.array(ham[ii, jj][hit][keep], pa.int64()),
            }
        )

    pairs = sims.map_batches(band_rows, batch_format="pyarrow").groupby(
        "bkey"
    ).map_groups(emit, batch_format="pyarrow")
    # dedup pairs found in multiple bands (hamming is identical)
    from ray.data.aggregate import Min

    agg = pairs.groupby(["a", "b"]).aggregate(Min("hamming"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"a": batch["a"], "b": batch["b"],
             "hamming": batch["min(hamming)"].cast(pa.int64())}
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def ngram_jaccard_pairs(
    ds: ray.data.Dataset, *, k: int = 3, threshold: float = 0.5, max_bucket: int = 256
) -> ray.data.Dataset:
    """Exact n-gram Jaccard near-dup pairs, LSH-free: bucket by the
    single smallest shingle hash (docs sharing no shingle can't reach
    any threshold > 0), verify exact Jaccard within buckets. Shuffle
    key is a bucket shard (see minhash_lsh_pairs) to amortize
    per-group overhead over many buckets."""
    shard_mask = (1 << 10) - 1

    def sig_rows(batch: pa.Table) -> pa.Table:
        bucket, doc, shing = [], [], []
        memo: dict = {}
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sh = np.unique(_shingle_hashes(text, k, memo))
            if sh.size == 0:
                continue
            # emit one row per min-K shingles: candidate generation
            for h in sh[: min(8, sh.size)]:
                bucket.append(int(h) & 0x7FFFFFFFFFFFFFFF)
                doc.append(doc_id)
                shing.append(sh.tobytes())
        t = pa.table(
            {"bucket": pa.array(bucket, pa.int64()), "doc_id": pa.array(doc, pa.int64()),
             "sh": pa.array(shing, pa.large_binary())}
        )
        shard = np.bitwise_and(t["bucket"].to_numpy(), shard_mask)
        return t.append_column("shard", pa.array(shard, pa.int64()))

    def emit(group: pa.Table) -> pa.Table:
        # sub-group the shard by exact bucket (one argsort), verify
        # exact Jaccard within each real bucket
        bkt = group["bucket"].to_numpy()
        ids_all = group["doc_id"].to_numpy()
        sh_col = group["sh"]
        order0 = np.argsort(bkt, kind="stable")
        bs = bkt[order0]
        starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        ends = np.r_[starts[1:], bs.size]
        a_out, b_out, j_out = [], [], []
        for s, e in zip(starts, ends):
            m = int(e - s)
            if m < 2:
                continue
            if m > max_bucket:
                _log_dropped_bucket("ngram_jaccard", int(bs[s]), m, max_bucket)
                continue
            idx = order0[s:e]
            ids = ids_all[idx]
            order = np.argsort(ids)
            idx = idx[order]
            ids = ids[order]
            shs = [np.frombuffer(sh_col[int(i)].as_py(), dtype=np.uint64) for i in idx]
            for ii in range(m):
                for jj in range(ii + 1, m):
                    if ids[ii] == ids[jj]:
                        continue
                    inter = np.intersect1d(shs[ii], shs[jj]).size
                    union = shs[ii].size + shs[jj].size - inter
                    jac = inter / union if union else 0.0
                    if jac >= threshold:
                        a_out.append(int(ids[ii]))
                        b_out.append(int(ids[jj]))
                        j_out.append(jac)
        return pa.table(
            {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64()),
             "jaccard": pa.array(j_out, pa.float64())}
        )

    pairs = (
        ds.map_batches(sig_rows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(emit, batch_format="pyarrow")
    )
    from ray.data.aggregate import Max

    agg = pairs.groupby(["a", "b"]).aggregate(Max("jaccard"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"a": batch["a"], "b": batch["b"], "jaccard": batch["max(jaccard)"]}
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def embedding_pairs_exact(
    ds: ray.data.Dataset, *, threshold: float = 0.95,
    max_rows: int = 1_000_000,
) -> ray.data.Dataset:
    """EXACT embedding-cosine near-dup pairs (a < b, cosine >=
    threshold): the brute-force complement to the LSH variant.

    Distributed block-vs-all matmul: the full normalized matrix is
    broadcast ONCE via ray.put (read in every task, never re-shipped
    per batch), each map_batches task multiplies its batch against it
    and emits its rows' qualifying pairs with a < b. O(n^2/p) compute
    per task, no shuffle. SMALL-SIDE ONLY by contract: the broadcast
    matrix is take_all'd to the driver, so inputs above max_rows
    (default 10^6 ≈ a few GB at typical dims) are REFUSED with a hard
    error instead of silently OOMing the driver at corpus scale —
    use embedding_neardup_pairs (LSH buckets) there."""
    import ray as _ray

    from .ann import _as_matrix

    n_rows = ds.count()
    if n_rows > max_rows:
        raise ValueError(
            f"embedding_pairs_exact: input has {n_rows} rows, over the "
            f"max_rows={max_rows} driver-broadcast bound — this "
            "operator take_all's the embedding table onto the driver "
            "by design (brute-force small-side complement). Use "
            "embedding_neardup_pairs (LSH-bucketed, fully distributed) "
            "for corpus-scale inputs, or raise max_rows explicitly if "
            "the driver really has the memory."
        )
    full = ds.take_all()  # (vec_id, embedding) — the broadcast side
    ids_all = np.array([r["vec_id"] for r in full], dtype=np.int64)
    embs_all = np.array([r["embedding"] for r in full], dtype=np.float64)
    norms = np.linalg.norm(embs_all, axis=1)
    norms[norms == 0] = 1.0
    unit_all = embs_all / norms[:, None]
    ref = _ray.put((ids_all, unit_all))

    def pairs(batch: pa.Table) -> pa.Table:
        bids = batch["vec_id"].to_numpy().astype(np.int64, copy=False)
        embs = _as_matrix(batch["embedding"])
        n = np.linalg.norm(embs, axis=1)
        n[n == 0] = 1.0
        aids, aunit = _ray.get(ref)
        sims = (embs / n[:, None]) @ aunit.T
        keep = (sims >= threshold) & (bids[:, None] < aids[None, :])
        bi, aj = np.nonzero(keep)
        return pa.table(
            {"a": pa.array(bids[bi], pa.int64()),
             "b": pa.array(aids[aj], pa.int64()),
             "cosine": pa.array(sims[bi, aj], pa.float64())}
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.95,
    n_planes: int | None = 8,
    seed: int = 11,
    max_bucket: int = 512,
    n_rows_hint: int | None = None,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup: random-hyperplane LSH buckets
    (groupby) then exact cosine verify within buckets.

    Expects (vec_id, embedding:list<float>). Output (a, b, cosine).

    n_planes=None scales the plane count with dataset size (target
    average bucket occupancy ~= max_bucket/8) — a FIXED plane count
    means a fixed 2^n_planes bucket universe, and at scale every
    bucket exceeds max_bucket and all pairs would be dropped. Pass
    n_rows_hint to avoid the ds.count() metadata pass.
    """
    if n_planes is None:
        n = n_rows_hint if n_rows_hint is not None else ds.count()
        target_buckets = max(16, (2 * n) // max(1, max_bucket // 8))
        n_planes = min(30, max(4, int(np.ceil(np.log2(target_buckets)))))

    def sig_rows(batch: pa.Table) -> pa.Table:
        from ..pipelines.ann import _as_matrix

        embs = _as_matrix(batch["embedding"])  # zero-copy Arrow -> numpy
        ids = batch["vec_id"].to_numpy()
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
        if len(ids) > max_bucket:
            _log_dropped_bucket(
                "embedding_neardup", group["bucket"][0].as_py(), len(ids), max_bucket
            )
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

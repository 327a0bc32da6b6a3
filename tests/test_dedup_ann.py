"""Dedup + ANN operator tests vs brute-force references."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from microfts_ray.pipelines.ann import cosine_topk, cosine_topk_lsh
from microfts_ray.pipelines.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from microfts_ray.pipelines.textstats import word_tokens


def _doc_ds(texts):
    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts, pa.string())}
        )
    )


BASE = "the quick brown fox jumps over the lazy dog and runs far away today"
TEXTS = [
    BASE,
    BASE,  # exact dup of 0
    BASE.replace("lazy", "sleepy"),  # near dup of 0
    "completely different content about database query engines and indexes",
    "another unrelated string regarding distributed systems and shuffles",
    BASE + " with a small suffix added",  # near dup of 0
    "",
]


def _true_jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        toks = word_tokens(t)
        if len(toks) < k:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sa, sb = sh(a), sh(b)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup():
    out = exact_dedup(_doc_ds(TEXTS)).to_pandas().sort_values("h").reset_index(drop=True)
    assert out["dup_count"].sum() == len(TEXTS)
    dup = out[out["dup_count"] > 1]
    assert len(dup) == 1 and dup.iloc[0]["keep_id"] == 0 and dup.iloc[0]["dup_count"] == 2


def test_minhash_finds_near_dups():
    pairs = minhash_lsh_pairs(_doc_ds(TEXTS), threshold=0.4).to_pandas()
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    # every true pair with jaccard >= 0.8 must be found (high-sim recall)
    for i in range(len(TEXTS)):
        for j in range(i + 1, len(TEXTS)):
            if _true_jaccard(TEXTS[i], TEXTS[j]) >= 0.8:
                assert (i, j) in got, (i, j)
    # estimates are in [0,1] and pairs are canonical
    assert (pairs["a"] < pairs["b"]).all()
    assert ((pairs["jaccard_est"] >= 0) & (pairs["jaccard_est"] <= 1)).all()


def test_ngram_jaccard_exact_values():
    pairs = ngram_jaccard_pairs(_doc_ds(TEXTS), threshold=0.3).to_pandas()
    got = {(a, b): j for a, b, j in zip(pairs["a"], pairs["b"], pairs["jaccard"])}
    assert got[(0, 1)] == 1.0
    for (a, b), j in got.items():
        assert j == pytest.approx(_true_jaccard(TEXTS[a], TEXTS[b]))
        assert j >= 0.3


def test_exact_dedup_filter_drops_losers():
    from microfts_ray.pipelines.dedup import exact_dedup_filter

    kept = (
        exact_dedup_filter(_doc_ds(TEXTS), num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
    )
    # TEXTS[1] is an exact dup of TEXTS[0]; everything else is unique
    assert kept["doc_id"].tolist() == [0, 2, 3, 4, 5, 6]
    assert list(kept.columns) == ["doc_id", "text"]


def test_simhash_pairs_exact_recall_vs_bruteforce():
    """4-band LSH at hamming <= 3 is pigeonhole-exact: pairs must
    equal the brute-force all-pairs scan over the same simhashes."""
    from microfts_ray.pipelines.dedup import simhash_pairs

    ds = _doc_ds(TEXTS)
    hs = simhash64(ds).to_pandas().set_index("doc_id")["simhash"]
    want = sorted(
        (a, b, bin(int(hs[a]) ^ int(hs[b])).count("1"))
        for a in hs.index
        for b in hs.index
        if a < b and bin(int(hs[a]) ^ int(hs[b])).count("1") <= 3
    )
    got = simhash_pairs(_doc_ds(TEXTS)).to_pandas()
    got_rows = sorted(zip(got["a"], got["b"], got["hamming"]))
    assert [tuple(map(int, r)) for r in got_rows] == want
    assert (0, 1, 0) in want  # the exact dup pair is present


def test_near_dup_filter_keeps_component_min():
    from microfts_ray.pipelines.dedup import near_dup_filter, union_find_components

    # chained pairs (1-2, 2-5) and (3-4): components {1,2,5}, {3,4}
    pairs = pa.table(
        {"a": pa.array([1, 2, 3], pa.int64()), "b": pa.array([2, 5, 4], pa.int64())}
    )
    comp = union_find_components(
        pairs["a"].to_numpy(), pairs["b"].to_numpy()
    )
    assert comp[5] == 1 and comp[2] == 1 and comp[4] == 3
    ds = _doc_ds(["x"] * 7)
    kept = near_dup_filter(ds, pairs).to_pandas()["doc_id"].tolist()
    assert kept == [0, 1, 3, 6]


def test_near_dup_filter_empty_pairs():
    from microfts_ray.pipelines.dedup import near_dup_filter

    pairs = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    kept = near_dup_filter(_doc_ds(["x", "y"]), pairs).to_pandas()
    assert kept["doc_id"].tolist() == [0, 1]


def test_connected_components_matches_union_find():
    """Distributed min-label propagation == driver union-find on a
    random pair graph (chains, stars, singleton-free)."""
    from microfts_ray.pipelines.dedup import (
        connected_components,
        union_find_components,
    )

    rng = np.random.default_rng(17)
    a = rng.integers(0, 60, size=40).astype(np.int64)
    b = rng.integers(0, 60, size=40).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    pairs = pa.table({"a": pa.array(a), "b": pa.array(b)})
    want = union_find_components(a, b)
    got = connected_components(pairs).to_pandas().set_index("node")["label"]
    nodes = sorted(set(a.tolist()) | set(b.tolist()))
    assert sorted(got.index.tolist()) == nodes
    for n in nodes:
        assert int(got[n]) == want.get(n, n), n


def test_connected_components_chain_converges():
    """A long chain exercises multi-round convergence (diameter 12)."""
    from microfts_ray.pipelines.dedup import connected_components

    n = 13
    pairs = pa.table(
        {"a": pa.array(list(range(n - 1)), pa.int64()),
         "b": pa.array(list(range(1, n)), pa.int64())}
    )
    got = connected_components(pairs).to_pandas()
    assert (got["label"] == 0).all() and len(got) == n


def test_near_dup_filter_dist_matches_driver_filter():
    from microfts_ray.pipelines.dedup import near_dup_filter, near_dup_filter_dist

    pairs = pa.table(
        {"a": pa.array([1, 2, 3], pa.int64()), "b": pa.array([2, 5, 4], pa.int64())}
    )
    ds = _doc_ds(["x"] * 7)
    kept_driver = sorted(near_dup_filter(ds, pairs).to_pandas()["doc_id"])
    kept_dist = sorted(
        near_dup_filter_dist(_doc_ds(["x"] * 7), pairs, num_partitions=4)
        .to_pandas()["doc_id"]
    )
    assert kept_dist == kept_driver == [0, 1, 3, 6]


def test_minhash_dedup_end_to_end():
    """Near-dups of doc 0 (exact dup 1, edits 2 and 5) drop; the
    unique docs and doc 0 survive with all columns intact."""
    from microfts_ray.pipelines.dedup import minhash_dedup

    kept = minhash_dedup(_doc_ds(TEXTS), threshold=0.5).to_pandas()
    ids = sorted(kept["doc_id"].tolist())
    assert 0 in ids and 1 not in ids and 2 not in ids
    assert 3 in ids and 4 in ids and 6 in ids
    assert list(kept.columns) == ["doc_id", "text"]


def test_simhash_properties():
    out = simhash64(_doc_ds(TEXTS)).to_pandas().set_index("doc_id")["simhash"]
    assert out[0] == out[1]  # identical docs
    ham_near = bin(out[0] ^ out[2]).count("1")
    ham_far = bin(out[0] ^ out[3]).count("1")
    assert ham_near < ham_far
    assert out[6] == 0  # empty doc


def _vec_table(n=80, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim))
    # plant near-dups: 3 pairs with cosine ~0.999
    for a, b in [(0, 1), (10, 11), (20, 21)]:
        v[b] = v[a] + rng.standard_normal(dim) * 0.01
    return pa.table(
        {"vec_id": pa.array(range(n), pa.int64()),
         "embedding": pa.array([list(map(float, r)) for r in v])}
    ), v


def test_cosine_topk_matches_bruteforce():
    tbl, v = _vec_table()
    ds = ray.data.from_arrow(tbl)
    q = v[0]
    got = cosine_topk(ds, q, k=5, exclude_ids={0}).to_pandas()
    unit = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = unit @ (q / np.linalg.norm(q))
    sims[0] = -np.inf
    order = np.lexsort((np.arange(len(v)), -sims))[:5]
    assert got["vec_id"].tolist() == order.tolist()
    assert got["rank"].tolist() == [1, 2, 3, 4, 5]


def test_cosine_lsh_finds_planted_neighbor():
    tbl, v = _vec_table()
    ds = ray.data.from_arrow(tbl)
    got = cosine_topk_lsh(ds, v[0], k=3, exclude_ids={0}).to_pandas()
    assert got["vec_id"].iloc[0] == 1  # the planted near-dup


def test_ann_lsh_indexed_matches_streaming(tmp_path):
    """The persisted partitioned signature index must return EXACTLY
    the streaming LSH variant's results (same planes, same probes) —
    and the query must touch only its probe-bucket partitions."""
    import os

    from microfts_ray.pipelines.ann import (
        build_ann_lsh_index,
        cosine_topk_lsh_indexed,
    )

    tbl, v = _vec_table()
    ds = ray.data.from_arrow(tbl)
    idx = str(tmp_path / "annidx")
    meta = build_ann_lsh_index(ds, idx)
    assert meta["n_planes"] == 6 and os.path.exists(f"{idx}/planes.npy")
    buckets = [d for d in os.listdir(idx) if d.startswith("bucket=")]
    assert len(buckets) > 4  # data spread over multiple partitions
    for qi in (0, 10, 20):
        want = cosine_topk_lsh(ds, v[qi], k=3, exclude_ids={qi}).to_pandas()
        got = cosine_topk_lsh_indexed(
            idx, v[qi], k=3, exclude_ids={qi}
        ).to_pandas()
        assert got["vec_id"].tolist() == want["vec_id"].tolist()
        assert got["cosine"].tolist() == want["cosine"].tolist()


def test_ann_ivf_indexed_matches_scalar_oracle(tmp_path):
    """The persisted IVF index must reproduce the independent scalar
    IVF oracle exactly (same centroids bit-for-bit, same probed
    cells), find the planted neighbor, and read only nprobe cell
    partitions."""
    import os

    from microfts_ray.oracle_ops import ann_ivf_scalar
    from microfts_ray.pipelines.ann import (
        build_ann_ivf_index,
        cosine_topk_ivf_indexed,
    )

    tbl, v = _vec_table()
    ds = ray.data.from_arrow(tbl)
    idx = str(tmp_path / "ivfidx")
    meta = build_ann_ivf_index(ds, idx, n_list=8, sample_stride=3)
    assert meta["n_list"] == 8 and os.path.exists(f"{idx}/centroids.npy")
    cells = [d for d in os.listdir(idx) if d.startswith("cell=")]
    assert len(cells) > 2  # data spread over multiple partitions
    for qi in (0, 10, 20):
        got = cosine_topk_ivf_indexed(idx, v[qi], k=3, exclude_ids={qi}).to_pandas()
        want = ann_ivf_scalar(
            list(range(len(v))), v, v[qi],
            k=3, n_list=8, sample_stride=3, exclude={qi},
        )
        assert got["vec_id"].tolist() == [w[1] for w in want]
        assert got["cosine"].tolist() == [w[2] for w in want]
        assert got["vec_id"].iloc[0] == qi + 1  # planted near-dup found


def test_ann_ivf_sample_bounded_on_driver():
    """The IVF training sample must stay driver-bounded: for an input
    100x larger than max_sample, the driver never holds more than
    max_sample + one batch of candidate rows (the round-3 version
    take_all'd ~1/stride of the corpus BEFORE capping — a driver OOM
    at real scale), and the folded sample equals the smallest
    max_sample vec_id multiples of the stride."""
    from microfts_ray.pipelines.ann import _ivf_sample

    max_sample, stride = 32, 3
    n = max_sample * 100
    rng = np.random.default_rng(5)
    v = rng.standard_normal((n, 4))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([row.tolist() for row in v]),
        }
    )
    batch_rows = 64
    ds = ray.data.from_arrow(tbl).repartition(n // batch_rows)
    sample, peak = _ivf_sample(ds, stride, max_sample)
    assert peak <= max_sample + batch_rows
    want_ids = np.arange(0, n, stride)[:max_sample]
    assert sample.shape == (max_sample, 4)
    assert (sample == v[want_ids].astype(np.float64)).all()


def test_ann_ivf_deterministic_rebuild(tmp_path):
    """Two builds over the same data produce identical centroids —
    the no-RNG training contract multi-node determinism rests on."""
    tbl, _ = _vec_table()
    from microfts_ray.pipelines.ann import build_ann_ivf_index

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_ann_ivf_index(ray.data.from_arrow(tbl), a, n_list=8)
    build_ann_ivf_index(ray.data.from_arrow(tbl), b, n_list=8)
    ca, cb = np.load(f"{a}/centroids.npy"), np.load(f"{b}/centroids.npy")
    assert (ca == cb).all()


def test_embedding_pairs_exact_vs_bruteforce():
    from microfts_ray.pipelines.dedup import embedding_pairs_exact

    tbl, v = _vec_table()
    ds = ray.data.from_arrow(tbl)
    pairs = embedding_pairs_exact(ds, threshold=0.9).to_pandas()
    unit = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = unit @ unit.T
    want = {
        (i, j): sims[i, j]
        for i in range(len(v))
        for j in range(i + 1, len(v))
        if sims[i, j] >= 0.9
    }
    got = {(a, b): c for a, b, c in zip(pairs["a"], pairs["b"], pairs["cosine"])}
    assert set(got) == set(want)
    assert {(0, 1), (10, 11), (20, 21)} <= set(got)
    for k in got:
        assert got[k] == pytest.approx(want[k])


def test_embedding_pairs_exact_refuses_oversize():
    """The brute-force path take_all's the table onto the driver, so
    it must HARD-FAIL above its row bound and point at the LSH path
    instead of silently OOMing at corpus scale."""
    from microfts_ray.pipelines.dedup import embedding_pairs_exact

    tbl, _ = _vec_table()
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(ValueError, match="embedding_neardup_pairs"):
        embedding_pairs_exact(ds, threshold=0.9, max_rows=5)


def test_embedding_neardup_pairs():
    tbl, v = _vec_table()
    ds = ray.data.from_arrow(tbl)
    pairs = embedding_neardup_pairs(ds, threshold=0.99, n_planes=4).to_pandas()
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert {(0, 1), (10, 11), (20, 21)} <= got
    for _, r in pairs.iterrows():
        unit = v / np.linalg.norm(v, axis=1, keepdims=True)
        assert unit[int(r["a"])] @ unit[int(r["b"])] == pytest.approx(r["cosine"])

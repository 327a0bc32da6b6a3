"""Scalar fixture oracles for driver queries whose semantics exceed
ANSI SQL (blake2b hashing, the gram index, multi-probe LSH).

The driver's correctness gate runs oracle_sql() strings in DuckDB.
For engine-specific operators the equivalent check is an INDEPENDENT
scalar recomputation: each function here re-derives the expected
result with the original per-row definitions (plain Python loops and
bigint arithmetic — deliberately NOT the vectorized engine kernels),
and ``values_sql`` renders it as a DuckDB ``VALUES`` table so the
hash gate covers these operators too. This mirrors how the pytest
suite oracles BM25/fuzzy against microfts_ray/oracle.py; here the
same independence is surfaced through the driver contract.

Fixtures are computed over the driver's correctness scale factor
(sf0.01 by default; GRAFT_ORACLE_SF_DIR overrides).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow.parquet as pq

from .oracle import OracleIndex


def word_tokens(text: str) -> list[str]:
    """INDEPENDENT re-derivation of the engine's word tokenization
    (lowercase, maximal [0-9a-z]+ runs) as a plain character loop —
    deliberately shares no code with textstats.word_tokens (regex
    split), so a tokenizer bug there cannot self-confirm through the
    token-based fixtures (r3 verdict's independence caveat)."""
    out: list[str] = []
    cur: list[str] = []
    for ch in text.lower():
        if ("0" <= ch <= "9") or ("a" <= ch <= "z"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out

ORACLE_SF_DIR = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

_MERSENNE = (1 << 61) - 1


# -- rendering ---------------------------------------------------------------

def _lit(v) -> str:
    if isinstance(v, float):
        # shortest round-trip repr, forced into DOUBLE literal form:
        # a plain decimal literal is lexed as DECIMAL and the later
        # DOUBLE cast double-rounds (observed one-ulp diffs)
        r = repr(v)
        return r if ("e" in r or "E" in r or "inf" in r or "nan" in r) else r + "e0"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(int(v))


def values_sql(rows: list[tuple], columns: list[str], types: list[str]) -> str:
    """SELECT over a VALUES literal with explicit casts (empty input
    yields a typed empty table)."""
    casts = ", ".join(
        f"CAST(v{i + 1} AS {t}) AS {c}" for i, (c, t) in enumerate(zip(columns, types))
    )
    if not rows:
        zero = ", ".join("NULL" for _ in columns)
        return f"SELECT {casts} FROM (VALUES ({zero})) t(" + ", ".join(
            f"v{i + 1}" for i in range(len(columns))
        ) + ") WHERE FALSE"
    body = ", ".join("(" + ", ".join(_lit(v) for v in r) + ")" for r in rows)
    return (
        f"SELECT {casts} FROM (VALUES {body}) t("
        + ", ".join(f"v{i + 1}" for i in range(len(columns)))
        + ")"
    )


# -- scalar reimplementations (original per-row definitions) -----------------

def _blake8(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def simhash_scalar(text: str) -> int:
    """Original per-row SimHash: blake2b per unique token, +-count
    votes per bit, 63-bit result."""
    toks = word_tokens(text)
    if not toks:
        return 0
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    votes = [0] * 64
    for t, c in counts.items():
        h = _blake8(t.encode())
        for bit in range(64):
            votes[bit] += c if (h >> bit) & 1 else -c
    sh = 0
    for bit in range(64):
        if votes[bit] > 0:
            sh |= 1 << bit
    return sh & 0x7FFFFFFFFFFFFFFF


def fingerprint_scalar(text: str, window: int = 4) -> int:
    toks = word_tokens(text)
    if not toks:
        return 0
    best = None
    for i in range(max(1, len(toks) - window + 1)):
        h = _blake8(" ".join(toks[i : i + window]).encode()) & 0x7FFFFFFFFFFFFFFF
        if best is None or h < best:
            best = h
    return best


def _shingle_set(text: str, k: int = 3) -> set[int]:
    toks = word_tokens(text)
    if len(toks) < k:
        shingles = {" ".join(toks)} if toks else set()
    else:
        shingles = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    return {_blake8(s.encode()) for s in shingles}


def minhash_pairs_scalar(
    docs: list[tuple[int, str]],
    *,
    n_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    k: int = 3,
    max_bucket: int = 64,
) -> list[tuple[int, int, float]]:
    """Scalar MinHash+LSH pairs: bigint (a*x+b) mod 2^61-1 signatures,
    (band, raw chunk tuple) buckets — no bucket hashing at all, so any
    engine bucket-hash collision would surface as a gate diff."""
    rng = np.random.default_rng(7)
    a = [int(x) for x in rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)]
    b = [int(x) for x in rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)]
    rpb = n_perm // bands
    sigs: dict[int, tuple[int, ...]] = {}
    for doc_id, text in docs:
        xs = [h % _MERSENNE for h in _shingle_set(text, k)]
        if xs:
            sig = tuple(min((a[i] * x + b[i]) % _MERSENNE for x in xs) for i in range(n_perm))
        else:
            sig = tuple([np.iinfo(np.uint64).max] * n_perm)
        sigs[doc_id] = sig
    buckets: dict[tuple, list[int]] = {}
    for doc_id, sig in sigs.items():
        for band in range(bands):
            key = (band,) + sig[band * rpb : (band + 1) * rpb]
            buckets.setdefault(key, []).append(doc_id)
    best: dict[tuple[int, int], float] = {}
    for ids in buckets.values():
        if len(ids) < 2 or len(ids) > max_bucket:
            continue
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                x, y = ids[i], ids[j]
                if x == y:
                    continue
                sx, sy = sigs[x], sigs[y]
                est = sum(1 for p, q in zip(sx, sy) if p == q) / n_perm
                if est >= threshold:
                    key = (x, y)
                    if est > best.get(key, -1.0):
                        best[key] = est
    return [(x, y, e) for (x, y), e in sorted(best.items())]


def ann_lsh_scalar(
    ids: list[int],
    embs: np.ndarray,
    qvec: np.ndarray,
    *,
    k: int = 10,
    n_planes: int = 6,
    probes: int = 4,
    seed: int = 11,
    exclude: set[int] | None = None,
) -> list[tuple[int, int, float]]:
    """Scalar multi-probe LSH top-k (same plane/probe derivation as
    pipelines/ann.py, single-threaded scan)."""
    q = np.asarray(qvec, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / (qn if qn else 1.0)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((q.size, n_planes))
    q_margins = q @ planes
    q_bits = q_margins > 0
    flip_order = np.argsort(np.abs(q_margins))
    probe_sigs = set()
    for p in range(probes):
        bits = q_bits.copy()
        for bb in range(p):
            bits[flip_order[bb]] = ~bits[flip_order[bb]]
        probe_sigs.add(int((bits.astype(np.int64) << np.arange(n_planes)).sum()))
    excl = exclude or set()
    keep: list[int] = []
    for i, vid in enumerate(ids):
        if vid in excl:
            continue
        sig = 0
        proj = embs[i].astype(np.float64) @ planes
        for bnum in range(n_planes):
            if proj[bnum] > 0:
                sig |= 1 << bnum
        if sig in probe_sigs:
            keep.append(i)
    if not keep:
        return []
    # the scalar part above is the independent re-derivation (probing
    # and bucketing); the final similarity uses the same normalized
    # matrix-vector expression as the engine so float comparison is
    # apples-to-apples
    sub = embs[keep].astype(np.float64)
    norms = np.linalg.norm(sub, axis=1)
    norms[norms == 0] = 1.0
    sims = (sub / norms[:, None]) @ q
    kept_ids = np.array([ids[i] for i in keep], dtype=np.int64)
    order = np.lexsort((kept_ids, -sims))[:k]
    return [
        (r + 1, int(kept_ids[j]), float(sims[j])) for r, j in enumerate(order)
    ]


# -- fixture builders over the oracle sf dir ---------------------------------

def _documents(sf_dir: str):
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


_oracle_index_cache: dict[str, OracleIndex] = {}


def _oracle_index(sf_dir: str) -> OracleIndex:
    """OracleIndex over the same documents->corpus adaptation used by
    pipelines/docsearch.py (the adapter is shared; the ENGINE under
    test — build/query — is independently recomputed by oracle.py)."""
    idx = _oracle_index_cache.get(sf_dir)
    if idx is None:
        # independent restatement of docsearch.doc_key_to_id (the
        # input-identity contract both sides must agree on):
        # path "doc_<id>", commit sha1("doc:<id>")
        def doc_key_to_id(doc_id: int) -> tuple[str, str]:
            return (
                f"doc_{doc_id}",
                hashlib.sha1(f"doc:{doc_id}".encode()).hexdigest(),
            )

        t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
        rows = []
        for d, lang, source, text in zip(
            t["doc_id"].to_pylist(), t["lang"].to_pylist(),
            t["source"].to_pylist(), t["text"].to_pylist(),
        ):
            p, c = doc_key_to_id(d)
            rows.append(
                {"repo": source, "path": p, "commit": c, "lang": lang,
                 "content": text + "\n"}
            )
        idx = OracleIndex.build(rows)
        _oracle_index_cache[sf_dir] = idx
    return idx


def _group_to_doc_id(group: str) -> int:
    path = group.split("/", 1)[1].split("@", 1)[0]
    return int(path.removeprefix("doc_"))


def simhash_fixture_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    rows = [(d, simhash_scalar(t)) for d, t in _documents(sf_dir)]
    return values_sql(rows, ["doc_id", "simhash"], ["BIGINT", "BIGINT"])


def fingerprint_fixture_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    rows = [(d, fingerprint_scalar(t)) for d, t in _documents(sf_dir)]
    return values_sql(rows, ["doc_id", "fp"], ["BIGINT", "BIGINT"])


def minhash_fixture_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    rows = minhash_pairs_scalar(_documents(sf_dir), threshold=0.4)
    return values_sql(rows, ["a", "b", "jaccard_est"], ["BIGINT", "BIGINT", "DOUBLE"])


def simhash_pairs_fixture_sql(
    sf_dir: str = ORACLE_SF_DIR, max_hamming: int = 3
) -> str:
    """BRUTE-FORCE all-pairs hamming over scalar simhashes — a fully
    independent oracle: with 4 x 16-bit bands and max_hamming <= 3
    the engine's banded LSH has exact recall (pigeonhole), so the
    exhaustive scan must agree pair-for-pair (sf0.01 buckets are far
    under the drop cap)."""
    docs = _documents(sf_dir)
    hs = [(doc_id, simhash_scalar(text)) for doc_id, text in docs]
    rows = []
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            (a, ha), (b, hb) = hs[i], hs[j]
            ham = bin(ha ^ hb).count("1")
            if ham <= max_hamming:
                lo, hi = (a, b) if a < b else (b, a)
                rows.append((lo, hi, ham))
    rows.sort()
    return values_sql(rows, ["a", "b", "hamming"], ["BIGINT", "BIGINT", "BIGINT"])


def minhash_dedup_fixture_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    """Scalar near-dedup keep-list: scalar MinHash pairs -> scalar
    union-find (component min wins) -> surviving doc_ids."""
    docs = _documents(sf_dir)
    pairs = minhash_pairs_scalar(docs, threshold=0.4)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for x, y, _e in pairs:
        rx, ry = find(x), find(y)
        if rx != ry:
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    drop = {x for x in parent if find(x) != x}
    rows = [(doc_id,) for doc_id, _t in docs if doc_id not in drop]
    rows.sort()
    return values_sql(rows, ["doc_id"], ["BIGINT"])


def bm25_fixture_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    top = _oracle_index(sf_dir).bm25_topk_docs("hash table merge", k=10)
    rows = [
        (r["rank"], _group_to_doc_id(r["group"]), r["score"]) for r in top
    ]
    return values_sql(rows, ["rank", "doc_id", "score"], ["BIGINT", "BIGINT", "DOUBLE"])


def bm25_chunk_fixture_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    """CHUNK-level BM25 (the dense f32-candidate + exact-rescore
    serving path, distinct from the doc-level variant): independent
    scalar recomputation via OracleIndex.bm25_topk."""
    top = _oracle_index(sf_dir).bm25_topk("hash table merge", k=10)
    rows = [
        (i + 1, _group_to_doc_id(r["group"]), r["score"])
        for i, r in enumerate(top)
    ]
    return values_sql(rows, ["rank", "doc_id", "score"], ["BIGINT", "BIGINT", "DOUBLE"])


def fuzzy_fixture_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    hits = _oracle_index(sf_dir).fuzzy("merge batch", threshold=0.5, sort_all=True)
    rows = [(_group_to_doc_id(h["group"]), h["percent"]) for h in hits]
    return values_sql(rows, ["doc_id", "percent"], ["BIGINT", "DOUBLE"])


def candidates_fixture_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    from .functions.grams import gram_set

    cand = _oracle_index(sf_dir).candidates(gram_set("window"))
    # one row per candidate (doc, chunk) pair, sorted by doc hash —
    # mirrors the engine's per-chunk candidate listing
    ids = sorted(d for d, _c in cand) if cand else []
    return values_sql([(i,) for i in ids], ["doc_hash"], ["BIGINT"])


def embedding_exact_fixture_sql(
    sf_dir: str = ORACLE_SF_DIR, threshold: float = 0.35
) -> str:
    """All-pairs exact cosine >= threshold, single-threaded, same
    normalized-matmul float expression as the engine's per-batch
    kernel (batch == full table at the oracle scale factor)."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    embs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(embs, axis=1)
    norms[norms == 0] = 1.0
    unit = embs / norms[:, None]
    sims = unit @ unit.T
    keep = (sims >= threshold) & (ids[:, None] < ids[None, :])
    bi, aj = np.nonzero(keep)
    rows = sorted(
        (int(ids[i]), int(ids[j]), float(sims[i, j])) for i, j in zip(bi, aj)
    )
    return values_sql(rows, ["a", "b", "cosine"], ["BIGINT", "BIGINT", "DOUBLE"])


def embedding_neardup_scalar(
    ids: list[int],
    embs: np.ndarray,
    *,
    threshold: float,
    n_planes: int,
    seed: int = 11,
    max_bucket: int = 512,
) -> list[tuple[int, int, float]]:
    """Independent recomputation of the LSH near-dup pipeline:
    hyperplane-signature buckets, exact within-bucket cosine,
    pairs >= threshold; buckets over max_bucket drop (the engine's
    documented recall cap). Cosines rounded to 9 decimals — the
    engine's within-bucket matmul row order is a Ray groupby artifact
    and can differ by an ulp."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((embs.shape[1], n_planes))
    bits = (embs.astype(np.float64) @ planes) > 0
    bucket = (bits.astype(np.int64) << np.arange(n_planes)).sum(axis=1)
    out: list[tuple[int, int, float]] = []
    for b in np.unique(bucket):
        sel = np.flatnonzero(bucket == b)
        if not (2 <= sel.size <= max_bucket):
            continue
        sub = embs[sel].astype(np.float64)
        norms = np.linalg.norm(sub, axis=1)
        norms[norms == 0] = 1.0
        unit = sub / norms[:, None]
        sims = unit @ unit.T
        bids = [ids[i] for i in sel]
        for ii in range(sel.size):
            for jj in range(ii + 1, sel.size):
                if sims[ii, jj] >= threshold:
                    a, bb = sorted((bids[ii], bids[jj]))
                    out.append((a, bb, round(float(sims[ii, jj]), 9)))
    out.sort()
    return out


def embedding_neardup_fixture_sql(
    sf_dir: str = ORACLE_SF_DIR, threshold: float = 0.35, n_planes: int = 4
) -> str:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = t["vec_id"].to_pylist()
    embs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    rows = embedding_neardup_scalar(
        ids, embs, threshold=threshold, n_planes=n_planes
    )
    return values_sql(rows, ["a", "b", "cosine"], ["BIGINT", "BIGINT", "DOUBLE"])


def media_features_fixture_sql(n: int = 60) -> str:
    """Independent scalar recomputation of the multimodal pipeline's
    deterministic stub decode + feature stage: payload from
    synthesize_media's generator, samples = blake2b-16 digest bytes,
    mean/std over them (float64). Real-codec rows (wav/ppm) follow the
    same stub contract in the driver query — the REAL decoders are
    pytest-covered separately (round-trip + non-stub decode tests)."""
    import hashlib as _h

    from .pipelines.multimodal import synthesize_media

    rows = []
    for r in synthesize_media(n).to_pylist():
        digest = _h.blake2b(r["payload"], digest_size=16).digest()
        vals = np.frombuffer(digest, dtype=np.uint8)
        rows.append(
            (r["media_id"], r["kind"], float(np.mean(vals)), float(np.std(vals)))
        )
    return values_sql(
        rows,
        ["media_id", "kind", "feat_mean", "feat_std"],
        ["BIGINT", "VARCHAR", "DOUBLE", "DOUBLE"],
    )


def ann_ivf_scalar(
    ids: list[int],
    embs: np.ndarray,
    qvec: np.ndarray,
    *,
    k: int = 10,
    n_list: int = 16,
    iters: int = 5,
    sample_stride: int = 7,
    max_sample: int = 4096,
    nprobe: int = 4,
    exclude: set[int] | None = None,
) -> list[tuple[int, int, float]]:
    """Scalar IVF top-k: re-derives the deterministic spherical
    k-means (per-row loops in vec_id order — bit-identical to the
    engine's np.add.at sequential accumulation), assigns every vector
    to its max-cosine cell, probes the query's nprobe nearest cells,
    exact top-k within them. The final similarity uses the same
    normalized matrix-vector expression as the engine so float
    comparison is apples-to-apples."""
    order = np.argsort(np.asarray(ids, dtype=np.int64), kind="stable")
    sample_rows = [
        i for i in order if int(ids[i]) % sample_stride == 0
    ][:max_sample]
    sample = embs[sample_rows].astype(np.float64)
    # training: scalar per-row reimplementation of the engine's rule
    norms = np.array([float(np.linalg.norm(r)) for r in sample])
    norms[norms == 0] = 1.0
    unit = sample / norms[:, None]
    cents = unit[: min(n_list, unit.shape[0])].copy()
    for _ in range(iters):
        acc = np.zeros_like(cents)
        cnt = np.zeros(cents.shape[0], dtype=np.int64)
        for row in unit:  # sequential in vec_id order
            j = int(np.argmax(row @ cents.T))
            acc[j] += row
            cnt[j] += 1
        live = cnt > 0
        cents[live] = acc[live] / cnt[live][:, None]
        cn = np.linalg.norm(cents, axis=1)
        cn[cn == 0] = 1.0
        cents = cents / cn[:, None]
    q = np.asarray(qvec, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / (qn if qn else 1.0)
    csims = cents @ q
    probe = set(
        int(c) for c in np.lexsort((np.arange(cents.shape[0]), -csims))[:nprobe]
    )
    excl = exclude or set()
    keep: list[int] = []
    for i in order:
        if int(ids[i]) in excl:
            continue
        row = embs[i].astype(np.float64)
        nrm = float(np.linalg.norm(row)) or 1.0
        if int(np.argmax((row / nrm) @ cents.T)) in probe:
            keep.append(i)
    if not keep:
        return []
    sub = embs[keep].astype(np.float64)
    norms = np.linalg.norm(sub, axis=1)
    norms[norms == 0] = 1.0
    sims = (sub / norms[:, None]) @ q
    kept_ids = np.array([ids[i] for i in keep], dtype=np.int64)
    top = np.lexsort((kept_ids, -sims))[:k]
    return [
        (r + 1, int(kept_ids[j]), float(sims[j])) for r, j in enumerate(top)
    ]


def ann_ivf_fixture_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = t["vec_id"].to_pylist()
    embs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    qvec = embs[0]
    rows = ann_ivf_scalar(ids, embs, qvec, k=10, exclude={int(ids[0])})
    return values_sql(rows, ["rank", "vec_id", "cosine"], ["BIGINT", "BIGINT", "DOUBLE"])


def frame_plan_fixture_sql(n: int = 60, every_ms: int = 1000) -> str:
    """Scalar recomputation of the video frame-sampling plan over the
    deterministic synthetic media table: one row per (video, t) for
    t in range(0, duration_ms, every_ms)."""
    from .pipelines.multimodal import synthesize_media

    rows = []
    for r in synthesize_media(n).to_pylist():
        if r["kind"] != "video" or r["duration_ms"] <= 0:
            continue
        for t in range(0, r["duration_ms"], every_ms):
            rows.append((r["media_id"], t))
    rows.sort()
    return values_sql(rows, ["media_id", "ts_ms"], ["BIGINT", "BIGINT"])


def ann_lsh_fixture_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = t["vec_id"].to_pylist()
    embs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    qvec = embs[0]
    rows = ann_lsh_scalar(ids, embs, qvec, k=10, exclude={int(ids[0])})
    return values_sql(rows, ["rank", "vec_id", "cosine"], ["BIGINT", "BIGINT", "DOUBLE"])

"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
ray.init()/ray.shutdown() here or in the library (tests/bench own
their sessions).

queries() cover the SURVEY.md §2 operator inventory re-expressed
Ray-Data-first plus the training-data operators (dedup / ANN / text
analysis). SQL-expressible ones have DuckDB oracles in oracle_sql();
engine-specific ones (gram index, BM25, fuzzy, MinHash, SimHash, ...)
are rows-only checked by the driver and rank/score-verified against
the pure-Python oracle in pytest instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402
import ray.data  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"

# word-boundary regex fragment matching the engine's hasArg semantics
# (gram chars = [0-9A-Za-z]; see microfts_ray/oracle.py:has_arg)
def _word_re(term: str) -> str:
    return f"(^|[^0-9A-Za-z]){term}($|[^0-9A-Za-z])"


_TOKENS_SQL = "list_filter(string_split_regex(lower(text), '[^0-9a-z]+'), x -> x <> '')"


def _blocks_for(path: str, target_mb: int = 32) -> int:
    """Block count sized to the DATA (>=1 block per target_mb of file,
    capped at cpu count): Ray's default splits small files into
    cpu-many tiny blocks, and each downstream all-to-all then pays
    O(blocks^2) scheduling overhead for microscopic partitions. At
    real scale the file size term dominates and this returns the same
    streaming parallelism Ray would pick."""
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    size_mb = os.path.getsize(path) / (1 << 20)
    return max(1, min(4 * cpus, int(size_mb // target_mb) + 1))


def _docs(sf_dir: str) -> ray.data.Dataset:
    # documents is the CPU-heavy text table: parallelism follows row
    # count (tokenize/hash cost per row), not file bytes
    import pyarrow.parquet as _pq

    p = os.path.join(sf_dir, "documents.parquet")
    rows = _pq.ParquetFile(p).metadata.num_rows
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    blocks = max(1, min(4 * cpus, rows // 1250 + 1))
    return ray.data.read_parquet(p, override_num_blocks=blocks)


def _table(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    p = os.path.join(sf_dir, f"{name}.parquet")
    return ray.data.read_parquet(
        p, columns=columns, override_num_blocks=_blocks_for(p)
    )


# ---------------------------------------------------------------------------
# query implementations
# ---------------------------------------------------------------------------

def q_doc_line_explode(sf_dir: str) -> Any:
    """Line chunker (SURVEY §2.2 M3) as a flat explode — fully
    vectorized (pc.split_pattern + list_flatten) and streamed (the
    Dataset is returned, never materialized on the driver)."""

    def explode(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        splits = pc.split_pattern(b["text"], "\n")
        lens = pc.list_value_length(splits).to_numpy().astype(np.int64)
        doc = np.repeat(b["doc_id"].to_numpy(), lens)
        offs = np.repeat(np.cumsum(lens) - lens, lens)
        line_no = np.arange(doc.size, dtype=np.int64) - offs + 1
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        return pa.table(
            {"doc_id": pa.array(doc, pa.int64()),
             "line_no": pa.array(line_no, pa.int64()),
             "line": pc.list_flatten(splits)}
        )

    return _docs(sf_dir).map_batches(explode, batch_format="pyarrow")


def q_search_and(sf_dir: str) -> pa.Table:
    """Exact AND search via the gram index + verification (X1/M8)."""
    from microfts_ray.pipelines.docsearch import get_reader, hit_doc_ids

    hits = get_reader(sf_dir).search("hash", "table")
    ids = sorted(hit_doc_ids(hits))
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def q_search_count_by_lang(sf_dir: str) -> Any:
    """Search hits aggregated by doc language: the hit-id set is
    broadcast once (ray.put), each batch filters vectorized, one
    groupby(lang) counts — no driver-side join."""
    import ray as _ray

    from microfts_ray.pipelines.docsearch import get_reader, hit_doc_ids

    hits = get_reader(sf_dir).search("spark")
    ids_ref = _ray.put(
        np.unique(np.array(hit_doc_ids(hits), dtype=np.int64))
    )

    def keep_hits(b: pa.Table) -> pa.Table:
        import ray as _r

        wanted = _r.get(ids_ref)
        m = np.isin(b["doc_id"].to_numpy(), wanted)
        return b.filter(pa.array(m)).select(["lang"])

    counts = (
        _table(sf_dir, "documents", ["doc_id", "lang"])
        .map_batches(keep_hits, batch_format="pyarrow")
        .groupby("lang")
        .count()
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {"lang": b["lang"], "n_docs": b["count()"].cast(pa.int64())}
        )

    return counts.map_batches(rename, batch_format="pyarrow")


def q_search_file(sf_dir: str) -> pa.Table:
    """File-level AND (X2, intersectFileGrams): docs containing BOTH
    terms somewhere, with each term's first matching line."""
    from microfts_ray.pipelines.docsearch import get_reader, hit_doc_ids

    hits = get_reader(sf_dir).search_file("hash", "table")
    ids = hit_doc_ids(hits)
    rows = sorted(
        (d, h["first_chunks"][0] + 1, h["first_chunks"][1] + 1)
        for d, h in zip(ids, hits)
    )
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "first_hash": pa.array([r[1] for r in rows], pa.int64()),
            "first_table": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def q_search_partial(sf_dir: str) -> pa.Table:
    """Partial (substring) search mode (M7): docs with any chunk
    containing the fragment, case-insensitive."""
    from microfts_ray.pipelines.docsearch import get_reader, hit_doc_ids

    hits = get_reader(sf_dir).search("tabl", partial=True)
    ids = sorted(set(hit_doc_ids(hits)))
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def q_index_stats(sf_dir: str) -> pa.Table:
    """DB-wide counts (S6/A4, cmdInfo): doc and chunk totals from the
    built index's manifest."""
    from microfts_ray.pipelines.docsearch import get_reader

    g = get_reader(sf_dir).manifest["global"]
    return pa.table(
        {
            "n_docs": pa.array([g["n_docs"]], pa.int64()),
            "n_chunks": pa.array([g["n_chunks"]], pa.int64()),
        }
    )


def q_term_df(sf_dir: str) -> Any:
    from microfts_ray.pipelines.textstats import term_df

    return term_df(_docs(sf_dir))


def q_token_count(sf_dir: str) -> Any:
    from microfts_ray.pipelines.textstats import token_count

    return token_count(_docs(sf_dir))


def q_token_count_bpe(sf_dir: str) -> Any:
    from microfts_ray.pipelines.textstats import token_count_bpe

    return token_count_bpe(_docs(sf_dir))


def q_quality_stats(sf_dir: str) -> Any:
    from microfts_ray.pipelines.textstats import quality_stats

    return quality_stats(_docs(sf_dir))


def q_dedup_exact(sf_dir: str) -> Any:
    from microfts_ray.pipelines.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir))


def q_lang_count(sf_dir: str) -> Any:
    from microfts_ray.pipelines.relational import lang_count

    return lang_count(_docs(sf_dir))


def q_pricing_summary(sf_dir: str) -> Any:
    from microfts_ray.pipelines.relational import pricing_summary

    return pricing_summary(
        _table(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    )


def q_top_customers(sf_dir: str) -> Any:
    from microfts_ray.pipelines.relational import top_customers

    return top_customers(_table(sf_dir, "orders", ["o_custkey"]))


def q_orders_per_nation(sf_dir: str) -> Any:
    from microfts_ray.pipelines.relational import orders_per_nation

    return orders_per_nation(
        _table(sf_dir, "orders", ["o_custkey"]),
        os.path.join(sf_dir, "customer.parquet"),
        os.path.join(sf_dir, "nation.parquet"),
    )


def q_events_by_type(sf_dir: str) -> Any:
    from microfts_ray.pipelines.relational import events_by_type

    return events_by_type(_table(sf_dir, "events", ["event_type", "value"]))


def q_events_hourly(sf_dir: str) -> Any:
    from microfts_ray.pipelines.relational import events_hourly

    return events_hourly(_table(sf_dir, "events", ["event_type", "ts"]))


def q_events_prev_id(sf_dir: str) -> Any:
    from microfts_ray.pipelines.relational import events_prev_id

    return events_prev_id(_table(sf_dir, "events", ["user_id", "event_id", "ts"]))


def q_purchase_asof_view(sf_dir: str) -> Any:
    """True two-stream AS-OF JOIN (attribution): each 'purchase'
    event paired with the same user's most recent 'view' event at or
    before it (greatest ts <= purchase ts; ties by greatest
    event_id); null when the user never viewed before buying."""
    from microfts_ray.pipelines.relational import asof_prev

    ev = _table(sf_dir, "events")
    purchases = ev.filter(expr="event_type == 'purchase'")
    views = ev.filter(expr="event_type == 'view'")
    out = asof_prev(
        purchases, views,
        left_key="user_id", left_ts="ts", left_id="event_id",
        right_key="user_id", right_ts="ts", right_id="event_id",
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {"purchase_id": b["left_id"], "view_id": b["prev_right_id"]}
        )

    return out.map_batches(rename, batch_format="pyarrow").sort("purchase_id")


def q_ann_topk(sf_dir: str) -> pa.Table:
    from microfts_ray.pipelines.ann import cosine_topk

    emb = _table(sf_dir, "embeddings")
    q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    qvec = np.array(q["embedding"][0].as_py(), dtype=np.float64)
    t = cosine_topk(emb, qvec, k=10, exclude_ids={int(q["vec_id"][0].as_py())})
    return t.select(["rank", "vec_id"])  # float scores stay engine-side


# -- rows-only (non-SQL-expressible) ----------------------------------------

def q_bm25_topk(sf_dir: str) -> pa.Table:
    from microfts_ray.pipelines.docsearch import get_reader, hit_doc_ids

    top = get_reader(sf_dir).bm25_topk_docs("hash table merge", k=10)
    ids = hit_doc_ids(top)  # map engine hash ids -> documents.doc_id
    return pa.Table.from_pylist(
        [
            {"rank": r["rank"], "doc_id": d, "score": r["score"]}
            for r, d in zip(top, ids)
        ]
    )


def q_bm25_chunk(sf_dir: str) -> pa.Table:
    """CHUNK-level BM25 top-k — the dense f32-candidate +
    exact-float64-rescore serving path (§7.0 north_rule op), distinct
    from the doc-level bm25_topk entry."""
    from microfts_ray.pipelines.docsearch import get_reader, hit_doc_ids

    top = get_reader(sf_dir).bm25_topk("hash table merge", k=10)
    ids = hit_doc_ids(top)
    return pa.Table.from_pylist(
        [
            {"rank": r["rank"], "doc_id": d, "score": r["score"]}
            for r, d in zip(top, ids)
        ]
    )


def q_search_regexp(sf_dir: str) -> pa.Table:
    """M6: verified search with a regexp result filter on chunk text."""
    from microfts_ray.pipelines.docsearch import get_reader, hit_doc_ids

    hits = get_reader(sf_dir).search("hash", regexp_filter="tabl[a-z]*")
    ids = sorted(hit_doc_ids(hits))
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def q_fuzzy_search(sf_dir: str) -> pa.Table:
    from microfts_ray.pipelines.docsearch import get_reader, hit_doc_ids

    hits = get_reader(sf_dir).fuzzy("merge batch", threshold=0.5, sort_all=True)
    ids = hit_doc_ids(hits)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "percent": hits["percent"],
        }
    )


def q_gram_candidates(sf_dir: str) -> pa.Table:
    from microfts_ray.functions.grams import gram_set
    from microfts_ray.pipelines.docsearch import get_reader

    cand = get_reader(sf_dir).candidates(gram_set("window"))
    if cand is None:
        return pa.table({"doc_hash": pa.array([], pa.int64())})
    return pa.table(
        {"doc_hash": pa.array(sorted(int(x) for x in cand.doc_ids), pa.int64())}
    )


def q_minhash_near_dup(sf_dir: str) -> Any:
    from microfts_ray.pipelines.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(sf_dir), threshold=0.4)


def q_simhash_neardup(sf_dir: str) -> Any:
    """SimHash near-dup pairs (hamming <= 3) via exact-recall banded
    LSH — only band-sharing docs are ever compared."""
    from microfts_ray.pipelines.dedup import simhash_pairs

    return simhash_pairs(_docs(sf_dir))


def q_exact_dedup_filter(sf_dir: str) -> Any:
    """Surviving doc_ids after exact dedup (first per content hash):
    slim-column hash groupby + inner-join corpus filter."""
    from microfts_ray.pipelines.dedup import exact_dedup_filter

    kept = exact_dedup_filter(_docs(sf_dir))
    return kept.select_columns(["doc_id"]).sort("doc_id")


def q_minhash_dedup(sf_dir: str) -> Any:
    """Surviving doc_ids after MinHash near-dedup (component-min
    keeps); the corpus-filter composition of minhash_near_dup."""
    from microfts_ray.pipelines.dedup import minhash_dedup

    kept = minhash_dedup(_docs(sf_dir), threshold=0.4)
    return kept.select_columns(["doc_id"]).sort("doc_id")


def q_minhash_dedup_dist(sf_dir: str) -> Any:
    """Same near-dedup result as minhash_dedup, produced by the FULLY
    DISTRIBUTED path: min-label-propagation connected components
    (pointer doubling) + anti-join corpus filter — no driver-side
    union-find or drop-set broadcast anywhere."""
    from microfts_ray.pipelines.dedup import (
        minhash_lsh_pairs,
        near_dup_filter_dist,
    )

    docs = _docs(sf_dir)
    pairs = minhash_lsh_pairs(docs, threshold=0.4)
    kept = near_dup_filter_dist(_docs(sf_dir), pairs)
    return kept.select_columns(["doc_id"]).sort("doc_id")


def q_simhash(sf_dir: str) -> Any:
    from microfts_ray.pipelines.dedup import simhash64

    return simhash64(_docs(sf_dir))


def q_ngram_jaccard(sf_dir: str) -> Any:
    from microfts_ray.pipelines.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir), threshold=0.3)


def q_embedding_neardup(sf_dir: str) -> Any:
    from microfts_ray.pipelines.dedup import embedding_neardup_pairs

    # testdata embeddings are near-orthogonal (max pairwise cosine ~0.5
    # at sf0.01): 0.35 yields a small non-empty pair set. Cosines are
    # rounded to 9 decimals for the oracle compare only — the
    # within-bucket matmul's row order is a Ray groupby artifact and
    # may differ from the scalar oracle's by an ulp.
    ds = embedding_neardup_pairs(
        _table(sf_dir, "embeddings"), threshold=0.35, n_planes=4
    )

    def rnd(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = b.schema.get_field_index("cosine")
        return b.set_column(i, "cosine", pc.round(b["cosine"], ndigits=9))

    return ds.map_batches(rnd, batch_format="pyarrow")


def q_embedding_neardup_exact(sf_dir: str) -> Any:
    from microfts_ray.pipelines.dedup import embedding_pairs_exact

    return embedding_pairs_exact(_table(sf_dir, "embeddings"), threshold=0.35)


def q_media_features(sf_dir: str) -> Any:
    """Multimodal actor-pool pipeline (synthesize -> decode ->
    features); deterministic stub decode so the driver's value-hash
    gate applies (real WAV/PPM decoders are pytest-covered)."""
    import ray.data as rd

    from microfts_ray.pipelines.multimodal import (
        decode_media,
        media_features,
        synthesize_media,
    )

    ds = rd.from_arrow(synthesize_media(60))
    return media_features(decode_media(ds, concurrency=2, batch_size=16))


def q_frame_plan(sf_dir: str) -> Any:
    """Video frame-sampling plan over the deterministic synthetic
    media table: one row per planned (media_id, ts_ms) frame."""
    import ray.data as rd

    from microfts_ray.pipelines.multimodal import (
        frame_sample_plan,
        synthesize_media,
    )

    ds = rd.from_arrow(synthesize_media(60))
    return frame_sample_plan(ds, every_ms=1000).sort(["media_id", "ts_ms"])


def q_lang_id(sf_dir: str) -> Any:
    from microfts_ray.pipelines.textstats import lang_id

    return lang_id(_docs(sf_dir))


def q_fingerprint(sf_dir: str) -> Any:
    from microfts_ray.pipelines.textstats import fingerprint

    return fingerprint(_docs(sf_dir))


def q_ann_lsh(sf_dir: str) -> pa.Table:
    """ANN via the PERSISTED partitioned LSH signature index: built
    once per input (cached under /tmp keyed by source path+mtime),
    then every query reads only its probe buckets. Same planes/probe
    logic as the streaming variant -> identical results."""
    import hashlib

    from microfts_ray.pipelines.ann import (
        build_ann_lsh_index,
        cosine_topk_lsh_indexed,
    )

    src = os.path.join(sf_dir, "embeddings.parquet")
    q = pq.read_table(src)
    qvec = np.array(q["embedding"][0].as_py(), dtype=np.float64)
    tag = hashlib.blake2b(
        f"{os.path.abspath(src)}:{os.path.getmtime(src)}:p6s11".encode(),
        digest_size=8,
    ).hexdigest()
    idx = f"/tmp/microfts_ann/idx_{tag}"
    if not os.path.exists(os.path.join(idx, "meta.json")):
        build_ann_lsh_index(_table(sf_dir, "embeddings"), idx)
    return cosine_topk_lsh_indexed(
        idx, qvec, k=10, exclude_ids={int(q["vec_id"][0].as_py())}
    )


def q_ann_ivf(sf_dir: str) -> pa.Table:
    """ANN via the PERSISTED IVF index: deterministic spherical
    k-means centroids (driver-side over a bounded sample), cell
    partitions, query probes only its nprobe nearest cells."""
    import hashlib

    from microfts_ray.pipelines.ann import (
        build_ann_ivf_index,
        cosine_topk_ivf_indexed,
    )

    src = os.path.join(sf_dir, "embeddings.parquet")
    q = pq.read_table(src)
    qvec = np.array(q["embedding"][0].as_py(), dtype=np.float64)
    tag = hashlib.blake2b(
        f"{os.path.abspath(src)}:{os.path.getmtime(src)}:ivf16i5s7".encode(),
        digest_size=8,
    ).hexdigest()
    idx = f"/tmp/microfts_ann/ivf_{tag}"
    if not os.path.exists(os.path.join(idx, "meta.json")):
        build_ann_ivf_index(_table(sf_dir, "embeddings"), idx)
    return cosine_topk_ivf_indexed(
        idx, qvec, k=10, exclude_ids={int(q["vec_id"][0].as_py())}
    )


# ---------------------------------------------------------------------------
# driver surface
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship: build the gram index over sf0.001 documents and run a
    BM25 top-10 query; returns the result table."""
    return q_bm25_topk(SF_SMALL)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "doc_line_explode": q_doc_line_explode,
        "search_and": q_search_and,
        "search_count_by_lang": q_search_count_by_lang,
        "search_file": q_search_file,
        "index_stats": q_index_stats,
        "search_partial": q_search_partial,
        "term_df": q_term_df,
        "token_count": q_token_count,
        "token_count_bpe": q_token_count_bpe,
        "quality_stats": q_quality_stats,
        "dedup_exact": q_dedup_exact,
        "lang_count": q_lang_count,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "orders_per_nation": q_orders_per_nation,
        "events_by_type": q_events_by_type,
        "events_hourly": q_events_hourly,
        "events_prev_id": q_events_prev_id,
        "purchase_asof_view": q_purchase_asof_view,
        "ann_topk": q_ann_topk,
        # rows-only (non-SQL-expressible engine ops)
        "bm25_topk": q_bm25_topk,
        "bm25_chunk": q_bm25_chunk,
        "search_regexp": q_search_regexp,
        "fuzzy_search": q_fuzzy_search,
        "gram_candidates": q_gram_candidates,
        "minhash_near_dup": q_minhash_near_dup,
        "exact_dedup_filter": q_exact_dedup_filter,
        "minhash_dedup": q_minhash_dedup,
        "minhash_dedup_dist": q_minhash_dedup_dist,
        "simhash": q_simhash,
        "simhash_neardup": q_simhash_neardup,
        "ngram_jaccard": q_ngram_jaccard,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_exact": q_embedding_neardup_exact,
        "lang_id": q_lang_id,
        "media_features": q_media_features,
        "frame_plan": q_frame_plan,
        "fingerprint": q_fingerprint,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
    }


def _lang_marker_sql() -> str:
    """Per-language stopword scores + the engine's tie-break (max
    score, language code ascending; 'und' when all zero; CJK -> zh).
    Mirrors microfts_ray/pipelines/textstats.py:_LANG_MARKERS."""
    from microfts_ray.pipelines.textstats import _LANG_MARKERS

    score_cols = ", ".join(
        "len(list_filter(t, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in sorted(marks))
        + f"], x))) AS s_{lang}"
        for lang, marks in _LANG_MARKERS.items()
    )
    return (
        f"WITH tok AS (SELECT doc_id, text, {_TOKENS_SQL} AS t FROM documents), "
        f"s AS (SELECT doc_id, text, {score_cols} FROM tok) "
        "SELECT doc_id, CASE "
        "WHEN regexp_matches(text, '[一-鿿]') THEN 'zh' "
        "WHEN s_de = 0 AND s_en = 0 AND s_es = 0 AND s_fr = 0 THEN 'und' "
        "WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de' "
        "WHEN s_en >= s_es AND s_en >= s_fr THEN 'en' "
        "WHEN s_es >= s_fr THEN 'es' "
        "ELSE 'fr' END AS lang_pred FROM s ORDER BY doc_id"
    )


_NGRAM_JACCARD_SQL = (
    # word 3-shingles per doc (single joined shingle under 3 tokens),
    # exact pairwise Jaccard over distinct shingles, threshold 0.3
    f"WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents), "
    "sh AS (SELECT doc_id, CASE WHEN len(t) < 3 THEN "
    "(CASE WHEN len(t) > 0 THEN [array_to_string(t, ' ')] ELSE [] END) "
    "ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)] END AS s "
    "FROM tok), u AS (SELECT doc_id, list_distinct(s) AS s FROM sh) "
    "SELECT a, b, j AS jaccard FROM ("
    "SELECT x.doc_id AS a, y.doc_id AS b, "
    "len(list_intersect(x.s, y.s))::DOUBLE / "
    "len(list_distinct(list_concat(x.s, y.s))) AS j "
    "FROM u x JOIN u y ON x.doc_id < y.doc_id) WHERE j >= 0.3 ORDER BY a, b"
)


def _token_count_bpe_sql() -> str:
    """Same RE2 pattern on both sides: DuckDB and Arrow both use RE2,
    so regexp_extract_all and pc.count_substring_regex count identical
    non-overlapping leftmost matches."""
    from microfts_ray.pipelines.textstats import BPE_SPLIT_PATTERN

    pat = BPE_SPLIT_PATTERN.replace("'", "''")
    return (
        f"SELECT doc_id, len(regexp_extract_all(text, '{pat}')) AS n_bpe_tokens "
        "FROM documents ORDER BY doc_id"
    )


def oracle_sql() -> dict[str, str]:
    import microfts_ray.oracle_ops as _ops

    _LANG_ID_SQL = _lang_marker_sql()
    return {
        "doc_line_explode": (
            "SELECT doc_id, generate_subscripts(string_split(text, chr(10)), 1) AS line_no, "
            "unnest(string_split(text, chr(10))) AS line FROM documents"
        ),
        "search_and": (
            "SELECT doc_id FROM documents WHERE "
            f"regexp_matches(text, '{_word_re('hash')}', 'i') AND "
            f"regexp_matches(text, '{_word_re('table')}', 'i') ORDER BY doc_id"
        ),
        "search_count_by_lang": (
            "SELECT lang, count(*) AS n_docs FROM documents WHERE "
            f"regexp_matches(text, '{_word_re('spark')}', 'i') "
            "GROUP BY lang ORDER BY lang"
        ),
        "search_file": (
            # per-line first-match positions; the engine's line chunker
            # drops the final (empty) fragment after the trailing \n,
            # which can never match, so splitting keeps parity
            "WITH lines AS (SELECT doc_id, "
            "unnest(string_split(text, chr(10))) AS line, "
            "generate_subscripts(string_split(text, chr(10)), 1) AS ln "
            "FROM documents) "
            "SELECT doc_id, "
            f"min(CASE WHEN regexp_matches(line, '{_word_re('hash')}', 'i') THEN ln END) AS first_hash, "
            f"min(CASE WHEN regexp_matches(line, '{_word_re('table')}', 'i') THEN ln END) AS first_table "
            "FROM lines GROUP BY doc_id "
            "HAVING first_hash IS NOT NULL AND first_table IS NOT NULL "
            "ORDER BY doc_id"
        ),
        "search_partial": (
            "SELECT doc_id FROM documents WHERE "
            "contains(lower(text), 'tabl') ORDER BY doc_id"
        ),
        "index_stats": (
            # chunks per doc = lines of text+'\n' with the final empty
            # fragment dropped = number of newline chars in text+'\n'
            "SELECT count(*) AS n_docs, "
            "CAST(sum(length(text || chr(10)) - "
            "length(replace(text || chr(10), chr(10), ''))) AS BIGINT) "
            "AS n_chunks FROM documents"
        ),
        "term_df": (
            "SELECT term, count(*) AS df FROM ("
            f"SELECT DISTINCT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents"
            ") GROUP BY term ORDER BY term"
        ),
        "token_count": (
            f"SELECT doc_id, len({_TOKENS_SQL}) AS n_tokens FROM documents ORDER BY doc_id"
        ),
        "token_count_bpe": _token_count_bpe_sql(),
        "quality_stats": (
            "SELECT doc_id, length(text) AS n_chars_c, "
            f"len({_TOKENS_SQL}) AS n_tokens, "
            "CASE WHEN length(text) = 0 THEN 0.0 ELSE "
            "length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text) END AS alpha_ratio, "
            f"CASE WHEN len({_TOKENS_SQL}) = 0 THEN 0.0 ELSE "
            f"list_aggregate(list_transform({_TOKENS_SQL}, x -> length(x)), 'sum') * 1.0 / len({_TOKENS_SQL}) END AS avg_token_len "
            "FROM documents ORDER BY doc_id"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS dup_count "
            "FROM documents GROUP BY 1 ORDER BY h"
        ),
        "exact_dedup_filter": (
            "SELECT doc_id FROM documents WHERE doc_id IN ("
            "SELECT min(doc_id) FROM documents GROUP BY md5(text)) "
            "ORDER BY doc_id"
        ),
        "lang_count": "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang",
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
            "count(*) AS count_order FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "top_customers": (
            "SELECT o_custkey, count(*) AS order_count FROM orders "
            "GROUP BY o_custkey ORDER BY order_count DESC, o_custkey LIMIT 10"
        ),
        "orders_per_nation": (
            "SELECT n.n_name, count(*) AS n_orders FROM orders o "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "GROUP BY n.n_name ORDER BY n.n_name"
        ),
        "events_by_type": (
            "SELECT event_type, count(*) AS n, min(value) AS min_value, "
            "max(value) AS max_value FROM events GROUP BY 1 ORDER BY 1"
        ),
        "events_hourly": (
            "SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n "
            "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "events_prev_id": (
            "SELECT user_id, event_id, lag(event_id) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id "
            "FROM events ORDER BY user_id, event_id"
        ),
        "purchase_asof_view": (
            "WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'), "
            "v AS (SELECT * FROM events WHERE event_type = 'view'), "
            "cand AS (SELECT p.event_id AS pid, v.event_id AS vid, "
            "row_number() OVER (PARTITION BY p.event_id "
            "ORDER BY v.ts DESC, v.event_id DESC) AS rn "
            "FROM p JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts) "
            "SELECT p.event_id AS purchase_id, c.vid AS view_id "
            "FROM p LEFT JOIN cand c ON c.pid = p.event_id AND c.rn = 1 "
            "ORDER BY purchase_id"
        ),
        "ann_topk": (
            "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) "
            "SELECT row_number() OVER (ORDER BY "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])) DESC, "
            "e.vec_id) AS rank, e.vec_id FROM embeddings e, q WHERE e.vec_id <> 0 "
            "ORDER BY rank LIMIT 10"
        ),
        "lang_id": _LANG_ID_SQL,
        "media_features": _ops.media_features_fixture_sql(),
        "frame_plan": _ops.frame_plan_fixture_sql(),
        "ngram_jaccard": _NGRAM_JACCARD_SQL,
        # engine-specific operators: fixture oracles — an INDEPENDENT
        # scalar recomputation (original per-row bigint/blake2b
        # definitions, microfts_ray/oracle_ops.py) rendered as a
        # DuckDB VALUES table, so the driver's hash gate covers them
        "simhash": _ops.simhash_fixture_sql(),
        "fingerprint": _ops.fingerprint_fixture_sql(),
        "minhash_near_dup": _ops.minhash_fixture_sql(),
        "minhash_dedup": _ops.minhash_dedup_fixture_sql(),
        "minhash_dedup_dist": _ops.minhash_dedup_fixture_sql(),
        "simhash_neardup": _ops.simhash_pairs_fixture_sql(),
        "bm25_topk": _ops.bm25_fixture_sql(),
        "bm25_chunk": _ops.bm25_chunk_fixture_sql(),
        "search_regexp": (
            "SELECT doc_id FROM documents WHERE "
            f"regexp_matches(text, '{_word_re('hash')}', 'i') AND "
            "regexp_matches(text, 'tabl[a-z]*') ORDER BY doc_id"
        ),
        "fuzzy_search": _ops.fuzzy_fixture_sql(),
        "gram_candidates": _ops.candidates_fixture_sql(),
        "ann_lsh": _ops.ann_lsh_fixture_sql(),
        "ann_ivf": _ops.ann_ivf_fixture_sql(),
        "embedding_neardup": _ops.embedding_neardup_fixture_sql(),
        "embedding_neardup_exact": _ops.embedding_exact_fixture_sql(),
    }

"""Text-analysis operators over a documents table (doc_id, text, ...).

Large-scale-training-data operators: word tokenization, df/token
counting, quality scoring, language ID, fingerprinting. All are
Ray-Data-native: `map_batches` for the embarrassingly-parallel parts,
one `groupby` only where a global aggregate is semantically required
(df), pre-deduplicated per batch so the shuffle moves distinct pairs,
not raw tokens.

Word tokenizer (shared with the DuckDB oracles in __ray_entry__.py):
lowercase, split on runs of non-[0-9a-z], drop empties.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data

_TOKEN_SPLIT = re.compile(r"[^0-9a-z]+")
_ALPHA_RUNS = re.compile(r"[A-Za-z]+")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "a"},
    "es": {"el", "la", "de", "que", "los", "las", "una", "es", "y"},
    "fr": {"le", "la", "les", "et", "des", "une", "est", "dans", "du"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu"},
}
_CJK = re.compile(r"[一-鿿]")


def word_tokens(text: str) -> list[str]:
    return [t for t in _TOKEN_SPLIT.split(text.lower()) if t]


def token_count(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_tokens) — vectorized per batch, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        n = [len(word_tokens(t)) for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": pa.array(n, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def term_df(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(term, df): number of docs containing each word.

    Per-batch distinct (term, doc) explode — docs never span batches,
    so pairs are globally distinct and a single groupby(term).count()
    is exact. At scale the per-batch dedup is the combiner that keeps
    the shuffle linear in distinct pairs.
    """

    def explode(batch: pa.Table) -> pa.Table:
        # per-batch (term -> partial df) via Arrow hash group_by: the
        # Ray groupby shuffles one row per distinct term per batch
        # (combiner), never the raw exploded pairs
        terms = []
        for t in batch["text"].to_pylist():
            terms.append(sorted(set(word_tokens(t))))
        flat = [x for ts in terms for x in ts]
        tbl = pa.table({"term": pa.array(flat, pa.string())})
        import pyarrow.compute as pc

        g = tbl.group_by("term").aggregate(
            [("term", "count", pc.CountOptions(mode="all"))]
        )
        return g.rename_columns(["term", "pdf"])

    pairs = ds.map_batches(explode, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    counts = pairs.groupby("term").aggregate(Sum("pdf"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"term": batch["term"], "df": batch["sum(pdf)"].cast(pa.int64())}
        )

    return counts.map_batches(rename, batch_format="pyarrow")


def quality_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_chars_c, n_tokens, alpha_ratio, avg_token_len):
    training-data quality signals, all single-pass vectorizable."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_chars, n_tok, alpha_ratio, avg_len = [], [], [], []
        alpha_runs = _ALPHA_RUNS
        for t in texts:
            toks = word_tokens(t)
            nc = len(t)
            # ASCII-alpha char count == total length of [A-Za-z] runs
            # (one regex scan instead of a per-char Python loop)
            na = sum(map(len, alpha_runs.findall(t)))
            n_chars.append(nc)
            n_tok.append(len(toks))
            alpha_ratio.append(na / nc if nc else 0.0)
            avg_len.append(sum(map(len, toks)) / len(toks) if toks else 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars_c": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "alpha_ratio": pa.array(alpha_ratio, pa.float64()),
                "avg_token_len": pa.array(avg_len, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def lang_id(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, lang_pred) — deterministic stopword/CJK heuristic.
    Ties break by language code ascending."""

    from collections import Counter

    def fn(batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch["text"].to_pylist():
            if _CJK.search(t):
                preds.append("zh")
                continue
            cnt = Counter(word_tokens(t))
            # occurrence-weighted marker score, one Counter pass per
            # doc instead of a per-token per-language membership loop
            scores = {
                lang: sum(cnt[w] for w in marks if w in cnt)
                for lang, marks in _LANG_MARKERS.items()
            }
            best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            preds.append(best[0] if best[1] > 0 else "und")
        return pa.table({"doc_id": batch["doc_id"], "lang_pred": pa.array(preds)})

    return ds.map_batches(fn, batch_format="pyarrow")


def fingerprint(ds: ray.data.Dataset, window: int = 4) -> ray.data.Dataset:
    """(doc_id, fp) — winnowing-style document fingerprint: min of
    rolling blake2b hashes over token windows (deterministic 63-bit).
    """

    def fn(batch: pa.Table) -> pa.Table:
        # fp = min over window hashes, so each DISTINCT window string
        # needs hashing once per batch (windows repeat within and
        # across docs); same blake2b values as the per-row form
        memo: dict[str, int] = {}
        blake = hashlib.blake2b
        fps = []
        for text in batch["text"].to_pylist():
            toks = word_tokens(text)
            if not toks:
                fps.append(0)
                continue
            best = None
            for i in range(max(1, len(toks) - window + 1)):
                w = " ".join(toks[i : i + window])
                h = memo.get(w)
                if h is None:
                    h = int.from_bytes(
                        blake(w.encode(), digest_size=8).digest(), "big"
                    ) & 0x7FFFFFFFFFFFFFFF
                    memo[w] = h
                if best is None or h < best:
                    best = h
            fps.append(best)
        return pa.table({"doc_id": batch["doc_id"], "fp": pa.array(fps, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")

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

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "a"},
    "es": {"el", "la", "de", "que", "los", "las", "una", "es", "y"},
    "fr": {"le", "la", "les", "et", "des", "une", "est", "dans", "du"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu"},
}


def word_tokens(text: str) -> list[str]:
    return [t for t in _TOKEN_SPLIT.split(text.lower()) if t]


def _token_lists(col) -> tuple[np.ndarray, pa.Array]:
    """Vectorized word_tokens over a string column: lowercase + regex
    split in Arrow. Returns (offsets[int64, n+1], flat token values) —
    flat values INCLUDE the empty boundary tokens word_tokens drops;
    callers mask them (utf8_length == 0)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(col), pattern="[^0-9a-z]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return np.asarray(toks.offsets, dtype=np.int64), toks.values


def _seg_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row sums of a flat array segmented by list offsets
    (cumsum-gather; integer math, no pairwise-float concerns)."""
    cum = np.zeros(values.size + 1, dtype=np.int64)
    np.cumsum(values, out=cum[1:])
    return cum[offsets[1:]] - cum[offsets[:-1]]


def token_count(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_tokens) — vectorized per batch, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        off, vals = _token_lists(batch["text"])
        nonempty = np.asarray(pc.not_equal(pc.binary_length(vals), 0))
        n = _seg_sum(nonempty, off)
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": pa.array(n, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


# GPT-2-style byte-pair pre-tokenizer regex, restricted to RE2 syntax
# (no lookahead) so Arrow (pc.count_substring_regex), DuckDB
# (regexp_extract_all) and Python re count the SAME non-overlapping
# leftmost matches — verified three-way on apostrophe/unicode edges.
BPE_SPLIT_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_count_bpe(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_bpe_tokens) — BPE-ish pre-tokenizer token count, the
    training-data cost estimator (contractions split, digits split
    from letters, punctuation runs one token, whitespace runs one
    token). One vectorized RE2 pass per batch, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.count_substring_regex(batch["text"], BPE_SPLIT_PATTERN)
        return pa.table(
            {"doc_id": batch["doc_id"], "n_bpe_tokens": n.cast(pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def term_df(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(term, df): number of docs containing each word.

    Per-batch distinct (term, doc) explode — docs never span batches,
    so pairs are globally distinct and a single groupby(term).count()
    is exact. At scale the per-batch dedup is the combiner that keeps
    the shuffle linear in distinct pairs.
    """

    def explode(batch: pa.Table) -> pa.Table:
        # per-batch (term -> partial df), fully vectorized: dict-encode
        # the flat tokens, distinct (doc, term) pairs via np.unique on
        # row*V+code, partial df = bincount of the distinct pairs'
        # codes. The Ray groupby shuffles one row per distinct term per
        # batch (combiner), never the raw exploded pairs.
        import pyarrow.compute as pc

        off, vals = _token_lists(batch["text"])
        enc = pc.dictionary_encode(vals)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary
        codes = np.asarray(enc.indices, dtype=np.int64)
        rowid = np.repeat(np.arange(off.size - 1, dtype=np.int64), np.diff(off))
        keep = np.asarray(pc.not_equal(pc.binary_length(vals), 0))
        if len(vocab) == 0 or not keep.any():
            return pa.table(
                {"term": pa.array([], pa.string()), "pdf": pa.array([], pa.int64())}
            )
        pairs = np.unique(rowid[keep] * len(vocab) + codes[keep])
        pdf = np.bincount(pairs % len(vocab), minlength=len(vocab))
        nz = np.flatnonzero(pdf)
        return pa.table(
            {
                "term": vocab.take(pa.array(nz)),
                "pdf": pa.array(pdf[nz], pa.int64()),
            }
        )

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
        # all-integer segment sums + ONE float64 division per measure —
        # bit-identical to the scalar per-row form (and the SQL oracle)
        import pyarrow.compute as pc

        texts = batch["text"].combine_chunks()
        off, vals = _token_lists(texts)
        tok_chars = np.asarray(pc.utf8_length(vals), dtype=np.int64)
        n_tok = _seg_sum(tok_chars > 0, off)
        sum_len = _seg_sum(tok_chars, off)
        n_chars = np.asarray(pc.utf8_length(texts), dtype=np.int64)
        n_alpha = np.asarray(
            pc.count_substring_regex(texts, "[A-Za-z]"), dtype=np.int64
        )
        alpha_ratio = np.where(n_chars > 0, n_alpha / np.maximum(n_chars, 1), 0.0)
        avg_len = np.where(n_tok > 0, sum_len / np.maximum(n_tok, 1), 0.0)
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


# vectorized marker tables: distinct markers (a marker like "la" can
# belong to several languages) and a |markers|×|langs| membership
# matrix; langs ascending so argmax's first-max tie-break == the
# scalar form's sorted((-score, lang)) rule
_LANGS = sorted(_LANG_MARKERS)
_MARKERS = sorted({w for marks in _LANG_MARKERS.values() for w in marks})
_MARKER_ARR = pa.array(_MARKERS, pa.string())
_MEMBER = np.zeros((len(_MARKERS), len(_LANGS)), dtype=np.int64)
for _w, _l in ((w, l) for l, ms in _LANG_MARKERS.items() for w in ms):
    _MEMBER[_MARKERS.index(_w), _LANGS.index(_l)] = 1
_LANGS_NP = np.array(_LANGS, dtype=object)


def lang_id(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, lang_pred) — deterministic stopword/CJK heuristic.
    Ties break by language code ascending."""

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = batch["text"].combine_chunks()
        n = len(texts)
        off, vals = _token_lists(texts)
        # per-row marker occurrence counts (empty boundary tokens can't
        # match a marker), then scores = counts @ membership
        midx = pc.fill_null(pc.index_in(vals, value_set=_MARKER_ARR), -1)
        midx = np.asarray(midx, dtype=np.int64)
        rowid = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
        hit = midx >= 0
        cnt = np.zeros((n, len(_MARKERS)), dtype=np.int64)
        np.add.at(cnt, (rowid[hit], midx[hit]), 1)
        scores = cnt @ _MEMBER
        best = np.argmax(scores, axis=1)
        maxv = scores[np.arange(n), best]
        preds = np.where(maxv > 0, _LANGS_NP[best], "und")
        cjk = np.asarray(pc.count_substring_regex(texts, "[一-鿿]"), dtype=np.int64) > 0
        preds[cjk] = "zh"
        return pa.table(
            {"doc_id": batch["doc_id"], "lang_pred": pa.array(preds.tolist())}
        )

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

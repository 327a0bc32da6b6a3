"""Chunking + tokenization stages: corpus rows -> term/posting arrays.

Mirrors the reference write path (/root/reference/fts-lmdb.go:578-603
``indexLines`` and :546-576 ``indexOrg``) as vectorized batch
functions:

  * line chunker: every line is a chunk, 1-based line numbers,
    terminator included; a final unterminated line is DROPPED (the
    reference's readLine returns EOF for it, fts-lmdb.go:605-610);
  * org chunker: org elements with >= 1 gram become chunks
    (stages/org.py);
  * doc identity: deterministic 63-bit hash of (repo, path, commit) —
    replaces the reference's global OID allocator
    (fts-lmdb.go:855-867) so the build is order-free, embarrassingly
    parallel and resumable (SURVEY.md §2.3 ST3).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.grams import extract_batch
from ..sources.corpus import corpus_sha256


def doc_id_for(repo: str, path: str, commit: str) -> int:
    """Deterministic 63-bit doc id from the natural key.

    blake2b-8 keeps ids dense-random for delta compression and makes
    assignment embarrassingly parallel. Collisions are checked at
    build validation (expected ~n^2/2^64; switch to 128-bit ids —
    two columns — beyond ~10^9 docs).
    """
    h = hashlib.blake2b(
        b"\x00".join((repo.encode(), path.encode(), commit.encode())), digest_size=8
    ).digest()
    return int.from_bytes(h, "big") & 0x7FFFFFFFFFFFFFFF


def doc_ids_column(repo: pa.Array, path: pa.Array, commit: pa.Array) -> np.ndarray:
    return np.fromiter(
        (
            doc_id_for(r, p, c)
            for r, p, c in zip(repo.to_pylist(), path.to_pylist(), commit.to_pylist())
        ),
        dtype=np.uint64,
        count=len(repo),
    )


def split_lines(content: str) -> list[str]:
    """Reference line chunking: split at '\\n', DROP a trailing
    unterminated fragment (fts-lmdb.go:605-610). Terminators are not
    kept in the chunk text — they are boundary chars with no gram
    effect (boundary runs collapse, fulltext.go:227).
    """
    parts = content.split("\n")
    return parts[:-1]


def tokenize_corpus_batch(
    batch: pa.Table, chunker: str = "lines"
) -> tuple[dict[str, np.ndarray], pa.Table]:
    """One corpus batch -> (posting entry arrays, docs-meta table).

    Returns
      entries: dict of parallel arrays (term:uint16, doc_id:uint64,
        chunk_id:uint64, tf:uint64, dl:uint64) sorted by
        (term, doc_id, chunk_id) — ready for run grouping;
      docs: Arrow table (doc_id, repo, path, commit, lang, n_chunks,
        sum_dl, content_sha256).
    """
    repo, path, commit = batch["repo"], batch["path"], batch["commit"]
    contents = batch["content"].to_pylist()
    doc_ids = doc_ids_column(repo, path, commit)

    if chunker == "lines":
        per_doc_chunks = [split_lines(c) for c in contents]
        chunk_local_ids = None  # consecutive 0..n-1
    elif chunker == "org":
        from .org import split_org_parts

        per_doc = [split_org_parts(c) for c in contents]
        # org chunks are (start_line, text) for parts with >=1 gram;
        # chunk_id = start line - 1 for display parity
        per_doc_chunks = [[t for (_ln, t) in parts] for parts in per_doc]
        chunk_local_ids = [
            np.array([ln - 1 for (ln, _t) in parts], dtype=np.uint64)
            for parts in per_doc
        ]
    else:
        raise ValueError(f"unknown chunker: {chunker}")

    n_chunks = np.array([len(c) for c in per_doc_chunks], dtype=np.int64)
    flat_chunks: list[str] = [t for chunks in per_doc_chunks for t in chunks]
    chunk_doc = np.repeat(doc_ids, n_chunks)  # doc of each flat chunk
    if chunk_local_ids is None:
        starts = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        chunk_ord = (
            np.arange(len(flat_chunks), dtype=np.uint64)
            - np.repeat(starts, n_chunks).astype(np.uint64)
        )
    else:
        chunk_ord = (
            np.concatenate(chunk_local_ids)
            if chunk_local_ids
            else np.empty(0, dtype=np.uint64)
        )

    chunk_idx, term, tf, chunk_dl = extract_batch(flat_chunks)
    entry_doc = chunk_doc[chunk_idx]
    entry_chunk = chunk_ord[chunk_idx]
    if int(entry_chunk.max() if entry_chunk.size else 0) < (1 << 32):
        entry_chunk = entry_chunk.astype(np.uint32)  # half the sort-gather bytes
    entry_dl = chunk_dl[chunk_idx].astype(np.uint32)
    # sort by (term, doc_id, chunk_id): pack into one uint64 key when
    # ranks fit (term 16 bits + doc rank + chunk bits) — a single-key
    # argsort moves ~1/3 the bytes of a 3-array lexsort
    order = None
    doc_rank_sorted = None
    if len(doc_ids):
        sorted_docs = np.sort(doc_ids)
        rank_bits = max(1, int(np.ceil(np.log2(max(2, sorted_docs.size)))))
        max_chunk = int(entry_chunk.max()) if entry_chunk.size else 0
        chunk_bits = max(1, (max_chunk + 1).bit_length())
        if 16 + rank_bits + chunk_bits <= 64:
            doc_rank = np.searchsorted(sorted_docs, entry_doc).astype(np.uint64)
            packed = (
                (term.astype(np.uint64) << np.uint64(rank_bits + chunk_bits))
                | (doc_rank << np.uint64(chunk_bits))
                | entry_chunk.astype(np.uint64)
            )
            order = np.argsort(packed, kind="stable")
            doc_rank_sorted = doc_rank[order].astype(np.uint32)
    if order is None:
        order = np.lexsort((entry_chunk, entry_doc, term))
    entries = {
        "term": term[order],
        "doc_id": entry_doc[order],
        "chunk_id": entry_chunk[order],
        "tf": tf[order].astype(np.uint32),
        "dl": entry_dl[order],
    }
    if doc_rank_sorted is not None:
        # ranks into this batch's sorted doc set: the encoder consumes
        # these directly instead of re-searchsorting every entry
        entries["doc_rank"] = doc_rank_sorted

    sum_dl = np.zeros(len(contents), dtype=np.int64)
    doc_of_chunk = np.repeat(np.arange(len(contents)), n_chunks)
    np.add.at(sum_dl, doc_of_chunk, chunk_dl)
    # chunk_span = exclusive upper bound of chunk_id per doc; equals
    # n_chunks for the line chunker, but org chunk ids are start-line
    # ordinals with gaps (dense query keys size by span, not count)
    chunk_span = n_chunks.copy()
    if chunk_local_ids is not None:
        for i, ids_ in enumerate(chunk_local_ids):
            chunk_span[i] = int(ids_.max()) + 1 if ids_.size else 0
    # per-chunk dl sidecar: one uint32 per chunk-id slot (zeros at org
    # gaps), list per doc. dl repeats for EVERY posting of a chunk, so
    # storing it once here instead of in the posting streams cuts the
    # index ~30% — query decode gathers dl by chunk key instead
    span_total = int(chunk_span.sum())
    dl_flat = np.zeros(span_total, dtype=np.uint32)
    span_base = np.zeros(len(contents) + 1, dtype=np.int64)
    np.cumsum(chunk_span, out=span_base[1:])
    slot = span_base[doc_of_chunk] + chunk_ord.astype(np.int64)
    dl_flat[slot] = chunk_dl.astype(np.uint32)
    chunk_dl_col = pa.ListArray.from_arrays(
        pa.array(span_base, pa.int32()).cast(pa.int32()),
        pa.array(dl_flat, pa.uint32()),
    )
    docs = pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.uint64()),
            "repo": repo,
            "path": path,
            "commit": commit,
            "lang": batch["lang"],
            "n_chunks": pa.array(n_chunks),
            "chunk_span": pa.array(chunk_span),
            "sum_dl": pa.array(sum_dl),
            "chunk_dl": chunk_dl_col,
            "content_sha256": pa.array([corpus_sha256(c) for c in contents]),
        }
    )
    return entries, docs

"""Posting-list blob codec: sorted, delta-encoded, varint-compressed.

Replaces the reference's 9-bucket oidList (/root/reference/fts-lmdb.go:704-767,
README.org:232-248 — the author notes that layout is "probably too
ornate") with the standard strictly-better form: entries sorted by
(doc_id, chunk_id), doc_ids delta-encoded, all streams varint-packed
(codec parity surface: functions/varint.py). Unlike the reference,
entries carry tf and chunk length so BM25 scoring (SURVEY.md §7.0) is
self-contained, plus per-block maxima for block-max WAND pruning.

A `PostingRun` is one term's postings from one doc-disjoint partition
(an input build partition, or one salt bucket of a shuffled build).
Global df for a term = sum of run dfs because runs never share a doc.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .varint import decode_array, encode_array

BLOCK = 128  # entries per skip/max block


@dataclass
class PostingRun:
    """Decoded posting run: parallel arrays sorted by (doc_id, chunk_id)."""

    doc_ids: np.ndarray  # uint64
    chunk_ids: np.ndarray  # uint64 (chunk ordinal within doc)
    tfs: np.ndarray  # uint64 (gram occurrences in chunk)
    dls: np.ndarray  # uint64 (chunk length |d| = total gram occurrences)

    def __len__(self) -> int:
        return int(self.doc_ids.size)


def encode_run(
    doc_ids: np.ndarray,
    chunk_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
) -> dict:
    """Encode one term-run. Inputs must be sorted by (doc_id, chunk_id).

    Returns a dict of plain columns for an Arrow segment row:
      n, df (distinct docs), blobs for each stream, and block-max
      metadata (max tf / min dl per BLOCK entries) for WAND bounds.
    """
    doc_ids = doc_ids.astype(np.uint64, copy=False)
    n = doc_ids.size
    gaps = np.empty(n, dtype=np.uint64)
    if n:
        gaps[0] = doc_ids[0]
        np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:])
    df = int((gaps[1:] != 0).sum()) + (1 if n else 0)
    nblk = (n + BLOCK - 1) // BLOCK
    tf64 = tfs.astype(np.uint64, copy=False)
    dl64 = dls.astype(np.uint64, copy=False)
    bmax_tf = np.zeros(nblk, dtype=np.uint64)
    bmin_dl = np.zeros(nblk, dtype=np.uint64)
    for b in range(nblk):
        sl = slice(b * BLOCK, min((b + 1) * BLOCK, n))
        bmax_tf[b] = tf64[sl].max()
        bmin_dl[b] = dl64[sl].min()
    return {
        "n": int(n),
        "df": df,
        "doc_blob": encode_array(gaps),
        "chunk_blob": encode_array(chunk_ids.astype(np.uint64, copy=False)),
        "tf_blob": encode_array(tf64),
        "dl_blob": encode_array(dl64),
        "bmax_tf_blob": encode_array(bmax_tf),
        "bmin_dl_blob": encode_array(bmin_dl),
    }


def decode_run(row: dict) -> PostingRun:
    """Inverse of encode_run (block maxima are not needed to decode)."""
    n = int(row["n"])
    gaps = decode_array(row["doc_blob"], n)
    return PostingRun(
        doc_ids=np.cumsum(gaps, dtype=np.uint64),
        chunk_ids=decode_array(row["chunk_blob"], n),
        tfs=decode_array(row["tf_blob"], n),
        dls=decode_array(row["dl_blob"], n),
    )


def decode_block_meta(row: dict) -> tuple[np.ndarray, np.ndarray]:
    """(block max tf, block min dl) arrays for WAND upper bounds."""
    n = int(row["n"])
    nblk = (n + BLOCK - 1) // BLOCK
    return (
        decode_array(row["bmax_tf_blob"], nblk),
        decode_array(row["bmin_dl_blob"], nblk),
    )


def merge_runs(runs: list[PostingRun]) -> PostingRun:
    """K-way merge of doc-disjoint runs into one run sorted by
    (doc_id, chunk_id). Vectorized: concatenate + stable lexsort.
    """
    if len(runs) == 1:
        return runs[0]
    doc = np.concatenate([r.doc_ids for r in runs])
    chk = np.concatenate([r.chunk_ids for r in runs])
    tf = np.concatenate([r.tfs for r in runs])
    dl = np.concatenate([r.dls for r in runs])
    order = np.lexsort((chk, doc))
    return PostingRun(doc[order], chk[order], tf[order], dl[order])

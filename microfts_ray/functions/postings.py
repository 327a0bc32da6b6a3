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

from .varint import decode_array_split, encode_array_split

BLOCK = 128  # entries per skip/max block


@dataclass
class PostingRun:
    """Decoded posting run: parallel arrays sorted by (doc_id, chunk_id)."""

    doc_ids: np.ndarray  # uint64
    chunk_ids: np.ndarray  # uint64 (chunk ordinal within doc)
    tfs: np.ndarray  # uint64 (gram occurrences in chunk)
    dls: np.ndarray  # uint64 (chunk length |d| = total gram occurrences)
    # False when the source row carried no dl stream (dl lives in the
    # docs sidecars' per-chunk lists since round 2): the reader layer
    # gathers dls and flips this before any scoring use
    has_dl: bool = True

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
    bfirst_doc = np.zeros(nblk, dtype=np.uint64)
    for b in range(nblk):
        sl = slice(b * BLOCK, min((b + 1) * BLOCK, n))
        bmax_tf[b] = tf64[sl].max()
        bmin_dl[b] = dl64[sl].min()
        bfirst_doc[b] = doc_ids[b * BLOCK]
    return {
        "n": int(n),
        "df": df,
        "doc_blob": encode_array_split(gaps),
        "chunk_blob": encode_array_split(chunk_ids.astype(np.uint64, copy=False)),
        "tf_blob": encode_array_split(tf64),
        "dl_blob": encode_array_split(dl64),
        "bmax_tf_blob": encode_array_split(bmax_tf),
        "bmin_dl_blob": encode_array_split(bmin_dl),
        "bfirst_doc_blob": encode_array_split(bfirst_doc),
    }


def decode_run(row: dict) -> PostingRun:
    """Inverse of encode_run (block maxima are not needed to decode).
    An empty dl_blob (sidecar-dl layout) yields zeros + has_dl=False."""
    n = int(row["n"])
    gaps = decode_array_split(row["doc_blob"], n)
    dl_blob = row["dl_blob"]
    has_dl = len(dl_blob) > 0 or n == 0
    return PostingRun(
        doc_ids=np.cumsum(gaps, dtype=np.uint64),
        chunk_ids=decode_array_split(row["chunk_blob"], n),
        tfs=decode_array_split(row["tf_blob"], n),
        dls=decode_array_split(dl_blob, n) if has_dl else np.zeros(n, dtype=np.uint64),
        has_dl=has_dl,
    )


def decode_run_blocks(row: dict, blocks: np.ndarray) -> tuple[np.ndarray, ...]:
    """Decode ONLY the given block indices of a run (the block
    skip-index read path: candidate gathers touch k blocks of 128
    entries instead of the whole multi-million-entry run).

    The split-stream layout makes this cheap without stored byte
    offsets: widths live in the contiguous first-bytes prefix, so one
    n-length widths pass + a cumsum yields any block's payload
    offset; values decode only for the selected ranges. Absolute doc
    ids restart from the stored per-block first-doc (bfirst_doc), so
    no prefix decode is needed.

    Returns (doc_ids, chunk_ids, tfs, dls) concatenated over blocks
    in ascending block order.
    """
    from .varint import decode_array_split

    n = int(row["n"])
    blocks = np.asarray(sorted(set(int(b) for b in blocks)), dtype=np.int64)
    if n == 0 or blocks.size == 0:
        e = np.empty(0, dtype=np.uint64)
        return e, e.copy(), e.copy(), e.copy()
    nblk = (n + BLOCK - 1) // BLOCK
    bfirst = decode_array_split(row["bfirst_doc_blob"], nblk)

    def sel_stream(blob) -> np.ndarray:
        raw = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
        firsts = raw[:n]
        widths = np.where(
            firsts & 0x80 == 0, 1, ((firsts >> 4) & 0x7).astype(np.int64) + 2
        )
        pw = widths - 1
        pay_start_all = np.concatenate(([0], np.cumsum(pw)))
        pay = raw[n:]
        outs = []
        for b in blocks:
            s, e = b * BLOCK, min((b + 1) * BLOCK, n)
            m = e - s
            f = firsts[s:e]
            w = widths[s:e]
            vals = np.where(w == 1, f, f & 0xF).astype(np.uint64)
            p = pw[s:e]
            base = pay_start_all[s:e]
            maxpw = int(p.max()) if m else 0
            for j in range(maxpw):
                selm = p > j
                vals[selm] = (vals[selm] << np.uint64(8)) | pay[base[selm] + j]
            outs.append(vals)
        return np.concatenate(outs)

    gaps = sel_stream(row["doc_blob"])
    # per-block absolute docs: cumsum within each block anchored at
    # the stored block-first doc (gaps[block_start] is replaced)
    doc = np.empty(gaps.size, dtype=np.uint64)
    pos = 0
    for b in blocks:
        s, e = b * BLOCK, min((b + 1) * BLOCK, n)
        m = e - s
        g = gaps[pos : pos + m].copy()
        g[0] = bfirst[b]
        doc[pos : pos + m] = np.cumsum(g, dtype=np.uint64)
        pos += m
    m_total = doc.size
    dl_blob = row["dl_blob"]
    dls = (
        sel_stream(dl_blob)
        if len(dl_blob) > 0
        else np.zeros(m_total, dtype=np.uint64)  # sidecar-dl layout
    )
    return (
        doc,
        sel_stream(row["chunk_blob"]),
        sel_stream(row["tf_blob"]),
        dls,
    )


def decode_block_meta(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(block max tf, block min dl, block first doc_id): WAND upper
    bounds + the skip index for block-selective decode."""
    n = int(row["n"])
    nblk = (n + BLOCK - 1) // BLOCK
    return (
        decode_array_split(row["bmax_tf_blob"], nblk),
        decode_array_split(row["bmin_dl_blob"], nblk),
        decode_array_split(row["bfirst_doc_blob"], nblk),
    )


def decode_terms_table(tbl, dict_resolver=None, translate=True) -> dict:
    """Bulk-decode a TERMS_SCHEMA Arrow table into flat entry arrays.

    Zero-copy: for each stream, the Arrow binary column's data buffer
    between offsets[0] and offsets[-1] IS the concatenation of all
    rows' varint blobs, so the whole column decodes with ONE
    vectorized decode_array call; per-run doc_ids are recovered with a
    segmented cumsum (delta streams reset at run starts). This is the
    merge/compaction fast path — the per-row route costs ~30us/row,
    this costs ~ns/entry.

    Returns {"term", "doc_id", "chunk_id", "tf", "dl", "row_starts"}:
    entries sorted by (term, doc, chunk) within each input row, rows
    in table order; row_starts delimits each input row's entries.
    """
    import pyarrow as pa  # local: keep module import-light for pickling

    from .varint import decode_split_rows

    ns = tbl["n"].to_numpy().astype(np.int64)
    total = int(ns.sum())
    row_starts = np.zeros(ns.size + 1, dtype=np.int64)
    np.cumsum(ns, out=row_starts[1:])

    def col_values(name: str) -> np.ndarray:
        col = tbl[name]
        chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
        parts = []
        pos = 0
        for arr in chunks:
            if len(arr) == 0:
                continue
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
                arr.offset : arr.offset + len(arr) + 1
            ]
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            chunk_ns = ns[pos : pos + len(arr)]
            parts.append(
                decode_split_rows(data, (offs[:-1]).astype(np.int64), chunk_ns)
            )
            pos += len(arr)
        if not parts:
            return np.empty(0, dtype=np.uint64)
        return parts[0] if len(parts) == 1 else np.concatenate(parts)

    gaps = col_values("doc_blob")
    cs = np.cumsum(gaps, dtype=np.uint64)
    # segmented reset: doc[i] = cs[i] - cs[start] + gaps[start]
    nz = ns > 0
    base = np.zeros(ns.size, dtype=np.uint64)
    base[nz] = cs[row_starts[:-1][nz]] - gaps[row_starts[:-1][nz]]
    doc = cs - np.repeat(base, ns)
    # rank-encoded rows: translate dictionary ranks -> real doc ids.
    # Grouped BY DICT, one vectorized gather per distinct dictionary:
    # a merged shard interleaves hundreds of source partitions' rows
    # per term, so the former per-row loop was 100k+ Python iterations.
    dict_vocab: list | None = None
    dict_codes: np.ndarray | None = None
    if "dict" in tbl.column_names:
        import pyarrow.compute as _pc

        enc = _pc.dictionary_encode(tbl["dict"])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary.to_pylist()
        if any(vocab) and not translate:
            # caller handles ranks itself (e.g. per-dict rank->key maps
            # in warm_terms_bulk): expose the per-row dict codes
            dict_vocab = vocab
            dict_codes = np.asarray(enc.indices, dtype=np.int64)
        elif any(vocab):
            if dict_resolver is None:
                raise ValueError(
                    "table holds rank-encoded doc streams; a dict_resolver is required"
                )
            row_codes = np.asarray(enc.indices, dtype=np.int64)
            for k, did in enumerate(vocab):
                if not did:
                    continue
                rows_k = np.flatnonzero(row_codes == k)
                lens = ns[rows_k]
                tot = int(lens.sum())
                if tot == 0:
                    continue
                intra = np.arange(tot, dtype=np.int64) - np.repeat(
                    np.cumsum(lens) - lens, lens
                )
                idx = np.repeat(row_starts[:-1][rows_k], lens) + intra
                lookup = dict_resolver(did)
                doc[idx] = lookup[doc[idx].astype(np.int64)]
    terms = np.repeat(tbl["term"].to_numpy().astype(np.uint16), ns)
    # sidecar-dl layout: dl blobs are empty -> zeros + has_dl=False.
    # A table may hold EITHER layout, never both: an index keeps one
    # dl layout for life (build/update consult manifest.dl_layout), so
    # a mix here means generations were combined incorrectly — fail
    # loudly rather than decode one row's dl bytes as another's.
    import pyarrow.compute as _pc

    dl_lens = _pc.binary_length(tbl["dl_blob"]).to_numpy(zero_copy_only=False)
    dl_bytes = int(dl_lens.sum())
    has_dl = dl_bytes > 0 or total == 0
    if has_dl and total and (dl_lens[ns > 0] == 0).any():
        raise ValueError(
            "mixed dl layouts in one terms table (some rows carry dl "
            "streams, some are sidecar-dl); rebuild or compact per layout"
        )
    return {
        "term": terms,
        "doc_id": doc,
        "chunk_id": col_values("chunk_blob"),
        "tf": col_values("tf_blob"),
        "dl": col_values("dl_blob") if has_dl else np.zeros(total, dtype=np.uint64),
        "has_dl": has_dl,
        "row_starts": row_starts,
        # translate=False only: per-row dict codes + vocabulary (doc_id
        # then holds RAW RANKS for rows whose dict code is non-empty)
        "dict_vocab": dict_vocab,
        "dict_codes": dict_codes,
    }


def build_chunk_dl_space(
    ids_list: list[np.ndarray],
    span_list: list[np.ndarray],
    dl_list: list[np.ndarray],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(sorted unique doc_ids, span base, flat per-chunk dl) — the dl
    lookup space for the sidecar-dl layout, shared by the query reader
    and the rewrite-merge dl gather.

    Duplicate doc rows (add_chunk writes one DELTA row per custom
    chunk: zeros except the new slot) coalesce by per-slot MAX over
    the doc's rows, span = max row span."""
    if not ids_list:
        return (
            np.empty(0, np.uint64),
            np.zeros(1, np.int64),
            np.empty(0, np.uint64),
        )
    doc_ids = np.concatenate(ids_list)
    span = np.concatenate(span_list).astype(np.int64)
    flat = np.concatenate(dl_list).astype(np.uint64)
    order = np.argsort(doc_ids, kind="stable")
    starts = np.zeros(doc_ids.size + 1, dtype=np.int64)
    np.cumsum(span, out=starts[1:])
    seg_starts = starts[:-1][order]
    seg_lens = span[order]
    sorted_ids = doc_ids[order]
    total = int(seg_lens.sum())
    intra = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(seg_lens) - seg_lens, seg_lens
    )
    if sorted_ids.size > 1 and (sorted_ids[1:] == sorted_ids[:-1]).any():
        uniq, inv = np.unique(sorted_ids, return_inverse=True)
        max_span = np.zeros(uniq.size, dtype=np.int64)
        np.maximum.at(max_span, inv, seg_lens)
        base = np.zeros(uniq.size + 1, dtype=np.int64)
        np.cumsum(max_span, out=base[1:])
        out = np.zeros(int(base[-1]), dtype=np.uint64)
        src = np.repeat(seg_starts, seg_lens) + intra
        dst = np.repeat(base[:-1][inv], seg_lens) + intra
        np.maximum.at(out, dst, flat[src])
        return uniq, base, out
    idx = np.repeat(seg_starts, seg_lens) + intra
    base = np.zeros(doc_ids.size + 1, dtype=np.int64)
    np.cumsum(seg_lens, out=base[1:])
    return sorted_ids, base, flat[idx]


def gather_chunk_dls(
    space: tuple[np.ndarray, np.ndarray, np.ndarray],
    doc_ids: np.ndarray,
    chunk_ids: np.ndarray,
) -> np.ndarray:
    """Per-pair dl gather from a chunk-dl space. Raises on any miss —
    a silent wrong-dl would corrupt BM25 scores undetectably."""
    ids, base, flat = space
    if ids.size == 0:
        raise KeyError("no chunk_dl sidecars for sidecar-dl postings")
    idx = np.minimum(np.searchsorted(ids, doc_ids), ids.size - 1)
    if not (ids[idx] == doc_ids).all():
        raise KeyError("doc_id missing from chunk-dl space")
    key = base[idx] + chunk_ids.astype(np.int64)
    if (chunk_ids.astype(np.int64) >= (base[idx + 1] - base[idx])).any():
        raise KeyError("chunk_id beyond its doc's chunk span")
    return flat[key]


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
    return PostingRun(
        doc[order], chk[order], tf[order], dl[order],
        has_dl=all(r.has_dl for r in runs),
    )

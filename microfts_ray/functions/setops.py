"""Vectorized set/aggregation kernels over (doc_id, chunk_id) pairs.

The query kernels (posting intersection, fuzzy accumulation, BM25
union scoring) operate on pairs of uint64 arrays. doc_id is 63-bit so
pairs cannot be packed into one uint64; instead everything is done
with lexsort-based merges — the numpy analog of the reference's
smallest-list-first set intersection (/root/reference/fts-lmdb.go:1497-1528).
"""

from __future__ import annotations

import numpy as np


def pair_isin(
    a_doc: np.ndarray,
    a_chunk: np.ndarray,
    b_doc: np.ndarray,
    b_chunk: np.ndarray,
) -> np.ndarray:
    """Boolean mask: which (a_doc, a_chunk) pairs occur in b.

    Both sides must contain unique pairs (posting runs and candidate
    sets are sets). O((n+m) log(n+m)), fully vectorized.
    """
    n_a = a_doc.size
    if n_a == 0 or b_doc.size == 0:
        return np.zeros(n_a, dtype=bool)
    d = np.concatenate([a_doc, b_doc])
    c = np.concatenate([a_chunk, b_chunk])
    src_b = np.concatenate([np.zeros(n_a, dtype=bool), np.ones(b_doc.size, dtype=bool)])
    order = np.lexsort((src_b, c, d))  # equal pairs: a before b
    ds, cs, ss = d[order], c[order], src_b[order]
    match = np.zeros(ds.size, dtype=bool)
    match[:-1] = (ds[:-1] == ds[1:]) & (cs[:-1] == cs[1:]) & ~ss[:-1] & ss[1:]
    mask = np.zeros(n_a, dtype=bool)
    mask[order[match]] = True
    return mask


def pair_group_sum(
    doc: np.ndarray, chunk: np.ndarray, *values: np.ndarray
) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """Group (doc, chunk) pairs and sum each value array per group.

    Returns (unique_doc, unique_chunk, [summed values...]) with groups
    ordered by (doc, chunk) — the deterministic accumulation order
    that keeps BM25 floats identical at any parallelism (SURVEY.md
    §7.3 'Deterministic scores').
    """
    if doc.size == 0:
        return doc, chunk, [np.asarray(v) for v in values]
    order = np.lexsort((chunk, doc))
    d, c = doc[order], chunk[order]
    new = np.empty(d.size, dtype=bool)
    new[0] = True
    new[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
    starts = np.nonzero(new)[0]
    sums = [np.add.reduceat(np.asarray(v)[order], starts) for v in values]
    return d[starts], c[starts], sums


def pair_lookup(
    a_doc: np.ndarray,
    a_chunk: np.ndarray,
    b_doc: np.ndarray,
    b_chunk: np.ndarray,
) -> np.ndarray:
    """For each (a_doc, a_chunk) pair, its row index in b, or -1.

    Both sides must hold unique pairs; b need not be sorted. The
    query engine's gather kernel: after MaxScore stops admitting new
    candidates, remaining (hot) terms only need tf/dl lookups for the
    candidate set — O((n+m) log) instead of a full union merge.
    """
    n_a = a_doc.size
    out = np.full(n_a, -1, dtype=np.int64)
    if n_a == 0 or b_doc.size == 0:
        return out
    d = np.concatenate([a_doc, b_doc])
    c = np.concatenate([a_chunk, b_chunk])
    src_b = np.concatenate([np.zeros(n_a, dtype=bool), np.ones(b_doc.size, dtype=bool)])
    order = np.lexsort((src_b, c, d))
    ds, cs, ss = d[order], c[order], src_b[order]
    match = np.zeros(ds.size, dtype=bool)
    match[:-1] = (ds[:-1] == ds[1:]) & (cs[:-1] == cs[1:]) & ~ss[:-1] & ss[1:]
    a_pos = order[match]  # original indices (< n_a)
    b_pos = order[np.roll(match, 1)] - n_a
    out[a_pos] = b_pos
    return out


def pair_unique(
    doc: np.ndarray, chunk: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sorted unique (doc, chunk) pairs + inverse indices.

    Enables exactly-sequential float accumulation: callers iterate
    contribution arrays in ascending term order and do
    ``acc[inv[slice]] += contrib`` — each pair receives its additions
    one at a time, in term order, bit-identical to a scalar loop
    (the determinism requirement of SURVEY.md §7.3).
    """
    if doc.size == 0:
        return doc, chunk, np.empty(0, dtype=np.int64)
    order = np.lexsort((chunk, doc))
    d, c = doc[order], chunk[order]
    new = np.empty(d.size, dtype=bool)
    new[0] = True
    new[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
    gid = np.cumsum(new) - 1
    inv = np.empty(d.size, dtype=np.int64)
    inv[order] = gid
    starts = np.nonzero(new)[0]
    return d[starts], c[starts], inv


def group_sum(keys: np.ndarray, *values: np.ndarray) -> tuple[np.ndarray, list[np.ndarray]]:
    """Group a single key array (sorted output) and sum values."""
    if keys.size == 0:
        return keys, [np.asarray(v) for v in values]
    order = np.argsort(keys, kind="stable")
    k = keys[order]
    new = np.empty(k.size, dtype=bool)
    new[0] = True
    new[1:] = k[1:] != k[:-1]
    starts = np.nonzero(new)[0]
    sums = [np.add.reduceat(np.asarray(v)[order], starts) for v in values]
    return k[starts], sums

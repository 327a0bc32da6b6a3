"""Gram (base-37 trigram) codec and extraction.

Semantics are bit-identical to the reference tokenizer
(/root/reference/fulltext.go:210-282): a 37-symbol alphabet
(boundary=0, digits 1-10, letters 11-36, ASCII case-folded), three
base-37 digits packed into a uint16 (37**3 = 50653 < 65536).

Extraction rules reproduced exactly (fulltext.go:223-238):
  * non-alphanumeric runes map to 0 (word boundary); runs of
    boundaries collapse to one (fulltext.go:227);
  * the rolling window resets at a word start (fulltext.go:228-231);
  * full-text mode wraps the input in single spaces so word-start
    (".XY") and word-end ("XY.") grams are produced, but grams with
    two leading boundaries are never emitted (``grm >= GRAM_BASE``
    guard, fulltext.go:234-236);
  * partial mode keeps only interior trigrams: no boundary digit in
    any of the three positions (fulltext.go:233).

The batch extraction path is vectorized with numpy; the scalar path
(`gram_set`) is the readable spec used by the oracle and tests.
"""

from __future__ import annotations

import numpy as np

GRAM_ZERO = 1
GRAM_A = 11
GRAM_BASE = 37
GRAM_2_BASE = GRAM_BASE * GRAM_BASE  # 1369
GRAM_3_BASE = GRAM_2_BASE * GRAM_BASE  # 50653
MAX_GRAM = GRAM_3_BASE  # exclusive upper bound of the term space

# codepoint -> gram digit lookup for the BMP's ASCII range; everything
# outside [0-9A-Za-z] (including all non-ASCII) is a boundary (0).
_CHAR_CLASS = np.zeros(0x110000, dtype=np.uint8)
for _c in range(ord("0"), ord("9") + 1):
    _CHAR_CLASS[_c] = _c - ord("0") + GRAM_ZERO
for _c in range(ord("A"), ord("Z") + 1):
    _CHAR_CLASS[_c] = _c - ord("A") + GRAM_A
for _c in range(ord("a"), ord("z") + 1):
    _CHAR_CLASS[_c] = _c - ord("a") + GRAM_A


def gram_for_char(c: str) -> int:
    """Reference gramForChar (fulltext.go:256-265)."""
    return int(_CHAR_CLASS[ord(c)])


def char_for_gram(d: int) -> str:
    """Reference charForGram (fulltext.go:247-254)."""
    if d == 0:
        return "."
    if d < GRAM_A:
        return chr(ord("0") + d - GRAM_ZERO)
    return chr(ord("A") + d - GRAM_A)


def gram_to_str(g: int) -> str:
    """Reference gramString (fulltext.go:240-245): 3 chars, '.'=boundary."""
    return (
        char_for_gram((g // GRAM_2_BASE) % GRAM_BASE)
        + char_for_gram((g // GRAM_BASE) % GRAM_BASE)
        + char_for_gram(g % GRAM_BASE)
    )


def gram_from_str(s: str) -> int:
    """Reference gramForUnicode (fulltext.go:267-282): parse a 3-char gram."""
    if len(s) != 3:
        raise ValueError(f"Unicode gram is not a trigram: {s!r}")
    g = 0
    for ch in s:
        c = _CHAR_CLASS[ord(ch)] if ord(ch) < 0x110000 else 0
        if g % GRAM_BASE == 0 and c == 0:
            continue
        if g % GRAM_BASE == 0:
            g = int(c)
        else:
            g = (g * GRAM_BASE + int(c)) % GRAM_3_BASE
    return g


def _add_grams(partial: bool, text: str, out: set[int]) -> None:
    """Scalar reference implementation of addGrams (fulltext.go:223-238)."""
    g = 0
    for ch in text:
        v = int(_CHAR_CLASS[ord(ch)])
        if v == 0 and g % GRAM_BASE == 0:
            continue  # collapse boundary runs
        if g % GRAM_BASE == 0:  # starting a word
            g = v
        else:
            g = (g * GRAM_BASE + v) % GRAM_3_BASE
        if partial and (
            g // GRAM_2_BASE == 0
            or (g // GRAM_BASE) % GRAM_BASE == 0
            or g % GRAM_BASE == 0
        ):
            continue
        if g >= GRAM_BASE:  # no grams with two leading boundaries
            out.add(g)


def gram_set(*args: str, partial: bool = False) -> set[int]:
    """Reference grams() (fulltext.go:210-220).

    Full-text mode joins args with spaces and wraps in spaces; partial
    mode extracts interior trigrams per arg.
    """
    out: set[int] = set()
    if partial:
        for term in args:
            _add_grams(True, term, out)
    else:
        _add_grams(False, " " + " ".join(args) + " ", out)
    return out


def gram_strings(*args: str, partial: bool = False) -> list[str]:
    """Sorted 3-char renderings, for the `grams` CLI and tests."""
    return [gram_to_str(g) for g in sorted(gram_set(*args, partial=partial))]


# ---------------------------------------------------------------------------
# Vectorized batch extraction
# ---------------------------------------------------------------------------

def _codepoints(text: str) -> np.ndarray:
    """UTF-32 view of a python str as a uint32 codepoint array."""
    if not text:
        return np.empty(0, dtype=np.uint32)
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def _gram_stream(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Given per-position gram digits (with boundary runs NOT yet
    collapsed), return (positions, grams) of every emitted full-text
    gram, in input order.

    Vectorized closed form of the reference recurrence: after
    collapsing boundary runs, the gram ending at position j is
        a*1369 + b*37 + c[j]
    where b = c[j-1] and a = c[j-2], except that a word start
    (c[j-1] == 0) resets the window (a = b = 0) and a boundary at
    j-2 zeroes only a. This holds because the modulus 37**3 keeps
    exactly the last three base-37 digits and ``g % 37 == 0`` iff the
    previously appended digit was a boundary (fulltext.go:227-231).
    """
    if vals.size == 0:
        return np.empty(0, dtype=np.int32), np.empty(0, dtype=np.uint16)
    # collapse boundary runs: keep a position if it's non-boundary or
    # the previous kept char is non-boundary
    is_b = vals == 0
    prev_b = np.concatenate(([True], is_b[:-1]))
    keep = ~(is_b & prev_b)
    pos = np.nonzero(keep)[0].astype(np.int32)  # batches < 2^31 chars
    c = vals[keep].astype(np.int32)
    n = c.size
    if n == 0:
        return np.empty(0, dtype=np.int32), np.empty(0, dtype=np.uint16)
    b = np.concatenate(([0], c[:-1]))
    a = np.concatenate(([0, 0], c[:-2]))
    a = np.where(b == 0, 0, a)  # window reset at word start
    g = np.where(b == 0, c, a * GRAM_2_BASE + b * GRAM_BASE + c)
    emit = g >= GRAM_BASE
    return pos[emit], g[emit].astype(np.uint16)


def extract_batch(
    texts: list[str] | np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Extract full-text grams for a batch of chunk texts at once.

    Returns (chunk_idx, term, tf, chunk_total_tf):
      * ``chunk_idx``/``term``/``tf`` — one row per distinct
        (chunk, gram) pair, ordered by (chunk_idx, term); ``tf`` is the
        occurrence count (the gram-set semantics of the reference are
        ``tf >= 1``; tf feeds BM25, SURVEY.md §7.0).
      * ``chunk_total_tf`` — per input chunk, total gram occurrences
        (the BM25 document length |d|).

    Implementation: concatenate all chunks with single-space
    separators (which is exactly the reference's ``" "+text+" "``
    full-text wrapping, since boundary runs collapse), run the
    vectorized gram stream once, then attribute each emitted gram to
    the chunk whose text it ends in (a gram ending on a separator
    belongs to the chunk before it).
    """
    n_chunks = len(texts)
    if n_chunks == 0:
        z = np.empty(0, dtype=np.int64)
        return z, np.empty(0, dtype=np.uint16), z, z
    joined = " " + " ".join(texts) + " "
    vals = _CHAR_CLASS[_codepoints(joined)]
    pos, grams = _gram_stream(vals)
    # chunk attribution: chunk i occupies [start_i, start_i + len_i) in
    # `joined` (codepoints); separators take the previous chunk's id.
    lens = np.fromiter((len(t) for t in texts), count=n_chunks, dtype=np.int64)
    starts = np.empty(n_chunks, dtype=np.int64)
    starts[0] = 1  # leading wrap space
    np.cumsum(lens[:-1] + 1, out=starts[1:])
    starts[1:] += 1
    ends = starts + lens  # a gram ending at `ends[i]` (the separator) is chunk i's
    chunk_of = np.searchsorted(ends, pos, side="left")
    chunk_of = np.minimum(chunk_of, n_chunks - 1)
    # distinct (chunk, gram) with counts; np.unique sorts
    # lexicographically. uint32 keys (when they fit) halve the memory
    # traffic of the sort — the hot loop of the whole build.
    if n_chunks * GRAM_3_BASE < (1 << 32):
        key = (chunk_of.astype(np.uint32) * np.uint32(GRAM_3_BASE)
               + grams.astype(np.uint32))
    else:
        key = (chunk_of.astype(np.uint64) * np.uint64(GRAM_3_BASE)
               + grams.astype(np.uint64))
    ukey, tf = np.unique(key, return_counts=True)
    chunk_idx = (ukey // GRAM_3_BASE).astype(np.int64)
    term = (ukey % GRAM_3_BASE).astype(np.uint16)
    totals = np.zeros(n_chunks, dtype=np.int64)
    np.add.at(totals, chunk_of, 1)
    return chunk_idx, term, tf.astype(np.int64), totals

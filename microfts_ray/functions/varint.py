"""Lexicographically-ordered varint codec.

Byte-level parity with the reference codec
(/root/reference/fts-lmdb.go:1723-1780; width table README.org:216-225):

    0xxxxxxx                      0 .. 127            (1 byte)
    1000xxxx X                    128 .. 4095         (2 bytes)
    1001xxxx X X                  .. 1048575          (3 bytes)
    ...                           (prefix nibble encodes total width)
    1111---- X X X X X X X X      .. 2**64-1          (9 bytes)

Encoded values compare correctly as raw bytes. Scalar functions are
the spec/parity surface; `encode_array`/`decode_array` are the
vectorized numpy paths used inside posting-blob encode/decode.
"""

from __future__ import annotations

import numpy as np


def num_size(n: int) -> int:
    """Reference numSize (fts-lmdb.go:1723-1730)."""
    if n < 1 << 7:
        return 1
    offset = 0
    tmp = n >> 12
    while tmp > 0:
        offset += 1
        tmp >>= 8
    return offset + 2


def put_num(n: int) -> bytes:
    """Reference putNum (fts-lmdb.go:1733-1752); returns the encoding."""
    if n < 0 or n >= 1 << 64:
        raise ValueError(f"varint out of range: {n}")
    if n < 1 << 7:
        return bytes([n])
    offset = 0
    tmp = n >> 12
    while tmp > 0:
        offset += 1
        tmp >>= 8
    out = bytearray(offset + 2)
    first = 0x80 | (offset << 4)
    num = n
    for i in range(offset + 1, 0, -1):
        out[i] = num & 0xFF
        num >>= 8
    out[0] = first | (num & 0xF)
    return bytes(out)


def get_num(buf: bytes | memoryview, pos: int = 0) -> tuple[int, int]:
    """Reference getNum (fts-lmdb.go:1770-1780): returns (value, next_pos)."""
    b0 = buf[pos]
    if b0 & 0x80 == 0:
        return b0, pos + 1
    width = ((b0 >> 4) & 0x7) + 2
    result = b0 & 0xF
    for i in range(1, width):
        result = (result << 8) | buf[pos + i]
    return result, pos + width


def put_counted_bytes(data: bytes) -> bytes:
    """Reference putCountedBytes (fts-lmdb.go:693-696)."""
    return put_num(len(data)) + data


def get_counted_bytes(buf: bytes | memoryview, pos: int = 0) -> tuple[bytes, int]:
    """Reference getCountedBytes (fts-lmdb.go:1755-1760)."""
    n, pos = get_num(buf, pos)
    return bytes(buf[pos : pos + n]), pos + n


# ---------------------------------------------------------------------------
# Vectorized array codec
# ---------------------------------------------------------------------------

_WIDTH_THRESHOLDS = np.array(
    [1 << 7] + [1 << (12 + 8 * k) for k in range(7)], dtype=np.uint64
)


def sizes_array(vals: np.ndarray) -> np.ndarray:
    """Encoded width (1..9 bytes) of each uint64 value: one
    searchsorted against the 8 width-table thresholds
    (README.org:216-225)."""
    v = vals.astype(np.uint64, copy=False)
    return np.searchsorted(_WIDTH_THRESHOLDS, v, side="right").astype(np.int64) + 1


def encode_array(vals: np.ndarray) -> bytes:
    """Concatenated varint encodings of a uint64 array, vectorized."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    w = sizes_array(v)
    ends = np.cumsum(w)
    starts = ends - w
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    one = v < np.uint64(128)
    out[starts[one]] = v[one].astype(np.uint8)
    big = ~one
    if big.any():
        bw = w[big]  # total widths (2..9)
        bs = starts[big]
        bv = v[big]
        # payload bytes: positions 1..width-1 hold the low (width-1)*8 bits,
        # high-to-low; first byte = 0x80 | ((width-2)<<4) | 4 top bits
        maxw = int(bw.max())
        for i in range(1, maxw):
            sel = bw > i
            # byte at index i (from front) = bits shifted by 8*(width-1-i)
            shift = ((bw[sel] - 1 - i) * 8).astype(np.uint64)
            out[bs[sel] + i] = ((bv[sel] >> shift) & np.uint64(0xFF)).astype(np.uint8)
        # first byte: remaining high bits after (width-1) payload bytes
        shift = ((bw - 1) * 8).astype(np.uint64)
        hi = np.where(bw == 9, np.uint64(0), (bv >> np.minimum(shift, np.uint64(63))))
        # (shift==64 only when width==9; uint64 >> 64 is UB, handled above)
        first = (
            np.uint8(0x80)
            | ((bw - 2).astype(np.uint8) << 4)
            | (hi & np.uint64(0xF)).astype(np.uint8)
        )
        out[bs] = first
    return out.tobytes()


def encode_array_split(vals: np.ndarray) -> bytes:
    """Split-stream varint blob: the `n` FIRST bytes of every value
    up front, then all payload bytes in value order.

    Same bytes per value as put_num (width nibble + high bits in the
    first byte, big-endian payload), reordered so decoding needs no
    sequential boundary chain: widths come from the contiguous first
    bytes, payload offsets from one cumsum — O(n x max_width) with
    n-sized arrays, vs O(blob_bytes x log n) for the in-place layout.
    """
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    w = sizes_array(v)
    pw = w - 1  # payload byte count per value
    firsts = np.empty(n, dtype=np.uint8)
    one = w == 1
    firsts[one] = v[one].astype(np.uint8)
    big = ~one
    if big.any():
        bw = w[big]
        shift = np.minimum((bw - 1) * 8, 63).astype(np.uint64)
        hi = np.where(bw == 9, np.uint64(0), v[big] >> shift)
        firsts[big] = (
            np.uint8(0x80)
            | ((bw - 2).astype(np.uint8) << 4)
            | (hi & np.uint64(0xF)).astype(np.uint8)
        )
    pay_end = np.cumsum(pw)
    payload = np.zeros(int(pay_end[-1]), dtype=np.uint8)
    pay_start = pay_end - pw
    maxpw = int(pw.max()) if n else 0
    for j in range(maxpw):
        sel = pw > j
        # payload byte j holds bits shifted by 8*(pw-1-j)
        shift = ((pw[sel] - 1 - j) * 8).astype(np.uint64)
        payload[pay_start[sel] + j] = ((v[sel] >> shift) & np.uint64(0xFF)).astype(
            np.uint8
        )
    return firsts.tobytes() + payload.tobytes()


def decode_array_split(blob: bytes | memoryview | np.ndarray, count: int) -> np.ndarray:
    """Inverse of encode_array_split."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    firsts = raw[:count]
    widths = np.where(firsts & 0x80 == 0, 1, ((firsts >> 4) & 0x7).astype(np.int64) + 2)
    pw = widths - 1
    pay = raw[count:]
    pay_end = np.cumsum(pw)
    pay_start = pay_end - pw
    vals = np.where(widths == 1, firsts, firsts & 0xF).astype(np.uint64)
    maxpw = int(pw.max()) if count else 0
    for j in range(maxpw):
        sel = pw > j
        vals[sel] = (vals[sel] << np.uint64(8)) | pay[pay_start[sel] + j]
    return vals


# 256-entry lookup tables indexed by a value's FIRST byte: payload
# byte count (width-1) and the value bits the first byte contributes
_PW_LUT = np.array(
    [0 if b < 0x80 else ((b >> 4) & 0x7) + 1 for b in range(256)], dtype=np.int64
)
_V0_LUT = np.array(
    [b if b < 0x80 else b & 0xF for b in range(256)], dtype=np.uint64
)


def decode_split_rows(
    raw: np.ndarray, row_offsets: np.ndarray, ns: np.ndarray
) -> np.ndarray:
    """Bulk-decode MANY split-stream blobs living in one byte buffer.

    raw: uint8 buffer; row_offsets[i] = byte offset of row i's blob;
    ns[i] = value count of row i. Returns all values concatenated in
    row order. Fully vectorized (the merge/compaction fast path);
    all-1-byte streams (tf/chunk/rank-gap streams in practice) take a
    two-pass shortcut — one gather, one LUT."""
    total = int(ns.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64)
    rows = ns.size
    cum = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(ns, out=cum[1:])
    # firsts bytes of row i are contiguous at row_offsets[i]: position
    # = global value index + per-row (offset - first-value-index) —
    # ONE repeat, no row_of/idx_in_row scratch arrays
    first_pos = np.arange(total, dtype=np.int64)
    first_pos += np.repeat(row_offsets - cum[:-1], ns)
    firsts = raw[first_pos]
    pw = _PW_LUT[firsts]
    vals = _V0_LUT[firsts]
    maxpw = int(pw.max())
    if maxpw == 0:
        return vals
    # payload offset within each row: segmented exclusive cumsum of pw
    gbase = np.cumsum(pw)
    gbase -= pw
    base_at_row_start = gbase[np.minimum(cum[:-1], total - 1)]
    pay_pos = gbase
    pay_pos += np.repeat(row_offsets + ns - base_at_row_start, ns)
    for j in range(maxpw):
        sel = pw > j
        vals[sel] = (vals[sel] << np.uint64(8)) | raw[pay_pos[sel] + j]
    return vals


def encode_split_rows(
    vals: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Encode many value ranges as consecutive split-stream blobs in
    one buffer. starts/ends must tile vals contiguously, each row
    non-empty. Returns (buffer, byte offsets per row, len rows+1) —
    ready for a zero-copy Arrow binary column.
    """
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    rows = starts.size
    ns = (ends - starts).astype(np.int64)
    w = sizes_array(v)
    pw = w - 1
    if v.size == 0:
        return b"", np.zeros(rows + 1, dtype=np.int64)
    pay_per_row = np.add.reduceat(pw, starts)
    row_bytes = ns + pay_per_row
    row_off = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(row_bytes, out=row_off[1:])
    out = np.zeros(int(row_off[-1]), dtype=np.uint8)
    row_of = np.repeat(np.arange(rows, dtype=np.int64), ns)
    idx_in_row = np.arange(v.size, dtype=np.int64) - np.repeat(starts, ns)
    first_pos = row_off[row_of] + idx_in_row
    firsts = np.empty(v.size, dtype=np.uint8)
    one = w == 1
    firsts[one] = v[one].astype(np.uint8)
    big = ~one
    if big.any():
        bw = w[big]
        shift = np.minimum((bw - 1) * 8, 63).astype(np.uint64)
        hi = np.where(bw == 9, np.uint64(0), v[big] >> shift)
        firsts[big] = (
            np.uint8(0x80)
            | ((bw - 2).astype(np.uint8) << 4)
            | (hi & np.uint64(0xF)).astype(np.uint8)
        )
    out[first_pos] = firsts
    gcum = np.cumsum(pw)
    gbase = gcum - pw
    pay_in_row = gbase - np.repeat(gbase[starts], ns)
    pay_base = row_off[row_of] + ns[row_of] + pay_in_row
    maxpw = int(pw.max())
    for j in range(maxpw):
        sel = pw > j
        shift = ((pw[sel] - 1 - j) * 8).astype(np.uint64)
        out[pay_base[sel] + j] = ((v[sel] >> shift) & np.uint64(0xFF)).astype(np.uint8)
    return out.tobytes(), row_off


def decode_array(blob: bytes | memoryview, count: int) -> np.ndarray:
    """Decode `count` concatenated varints to uint64, vectorized.

    Boundary positions form a sequential chain (each width is read from
    its first byte); the chain is materialized with pointer-doubling so
    the whole decode stays in numpy: O(len(blob) * log(count)).
    """
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(blob, dtype=np.uint8)
    widths = np.where(raw & 0x80 == 0, 1, ((raw >> 4) & 0x7).astype(np.int64) + 2)
    jump = np.minimum(np.arange(raw.size, dtype=np.int64) + widths, raw.size - 1)
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    filled = 1
    while filled < count:
        take = min(filled, count - filled)
        starts[filled : filled + take] = jump[starts[:take]]
        filled += take
        if filled < count:
            jump = jump[jump]  # doubling: jump now advances 2x as far
    w = widths[starts]
    vals = np.zeros(count, dtype=np.uint64)
    one = w == 1
    vals[one] = raw[starts[one]]
    big = ~one
    if big.any():
        bw = w[big]
        bs = starts[big]
        vals_b = (raw[bs] & np.uint64(0xF)).astype(np.uint64)
        maxw = int(bw.max())
        for i in range(1, maxw):
            sel = bw > i
            vals_b[sel] = (vals_b[sel] << np.uint64(8)) | raw[bs[sel] + i]
        vals[big] = vals_b
    return vals

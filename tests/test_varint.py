"""Varint codec parity tests.

Golden boundary vectors from /root/reference/test.go:10-29 (see
FIXTURES.md §4): widths 1,1,2,2,...,9,9 and exact round-trips;
encodings must order lexicographically.
"""

import random

import numpy as np

from microfts_ray.functions.varint import (
    decode_array,
    encode_array,
    get_counted_bytes,
    get_num,
    num_size,
    put_counted_bytes,
    put_num,
    sizes_array,
)

# (value, expected encoded width) — test.go:10-29
VECTORS = [
    (0, 1),
    (127, 1),
    (128, 2),
    (4095, 2),
    (4096, 3),
    (1048575, 3),
    (1048576, 4),
    (268435455, 4),
    (268435456, 5),
    (68719476735, 5),
    (68719476736, 6),
    (17592186044415, 6),
    (17592186044416, 7),
    (4503599627370495, 7),
    (4503599627370496, 8),
    (1152921504606846975, 8),
    (1152921504606846976, 9),
    (18446744073709551615, 9),
]


def test_boundary_vectors():
    for val, width in VECTORS:
        enc = put_num(val)
        assert len(enc) == width == num_size(val), val
        dec, pos = get_num(enc)
        assert dec == val and pos == width


def test_lexicographic_order():
    vals = sorted({v for v, _ in VECTORS} | {1, 2, 200, 5000, 10**6, 10**12})
    encs = [put_num(v) for v in vals]
    assert encs == sorted(encs)


def test_counted_bytes():
    data = b"hello world" * 20
    enc = put_counted_bytes(data)
    out, pos = get_counted_bytes(enc)
    assert out == data and pos == len(enc)


def test_array_codec_matches_scalar():
    rng = random.Random(7)
    vals = [v for v, _ in VECTORS]
    vals += [rng.randrange(0, 1 << 64) for _ in range(500)]
    vals += [rng.randrange(0, 1 << rng.randrange(1, 64)) for _ in range(500)]
    arr = np.array(vals, dtype=np.uint64)
    blob = encode_array(arr)
    assert blob == b"".join(put_num(int(v)) for v in arr)
    assert (sizes_array(arr) == [num_size(int(v)) for v in arr]).all()
    back = decode_array(blob, len(arr))
    assert (back == arr).all()


def test_array_codec_empty_and_single():
    assert encode_array(np.empty(0, dtype=np.uint64)) == b""
    assert decode_array(b"", 0).size == 0
    blob = encode_array(np.array([300], dtype=np.uint64))
    assert decode_array(blob, 1)[0] == 300


def test_split_codec_roundtrip():
    from microfts_ray.functions.varint import (
        decode_array_split,
        decode_split_rows,
        encode_array_split,
        encode_split_rows,
    )

    rng = random.Random(13)
    vals = [v for v, _ in VECTORS] + [rng.randrange(0, 1 << 64) for _ in range(800)]
    arr = np.array(vals, dtype=np.uint64)
    blob = encode_array_split(arr)
    assert (decode_array_split(blob, arr.size) == arr).all()
    assert len(blob) == sum(num_size(int(v)) for v in arr)  # same compression
    # multi-row buffer round-trip
    starts = np.array([0, 5, 100, 400], dtype=np.int64)
    ends = np.array([5, 100, 400, arr.size], dtype=np.int64)
    buf, offs = encode_split_rows(arr, starts, ends)
    raw = np.frombuffer(buf, dtype=np.uint8)
    back = decode_split_rows(raw, offs[:-1], (ends - starts))
    assert (back == arr).all()
    # each row's slice decodes independently as a single split blob
    for i, (s0, e0) in enumerate(zip(starts, ends)):
        piece = raw[offs[i] : offs[i + 1]]
        assert (decode_array_split(piece, e0 - s0) == arr[s0:e0]).all()

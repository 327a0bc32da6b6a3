"""Property-based tests (hypothesis) for the semantic core."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from microfts_ray.functions.grams import (
    GRAM_3_BASE,
    GRAM_BASE,
    extract_batch,
    gram_from_str,
    gram_set,
    gram_to_str,
)
from microfts_ray.functions.varint import (
    decode_array_split,
    encode_array_split,
    get_num,
    num_size,
    put_num,
)

text_st = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF), max_size=80
)


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_gram_set_invariants(s):
    gs = gram_set(s)
    for g in gs:
        assert GRAM_BASE <= g < GRAM_3_BASE
    # case-fold invariance — ASCII case only (the reference folds
    # [a-zA-Z], fulltext.go:256-265; Python's str.upper would expand
    # e.g. 'ß' -> 'SS' and change the string)
    up = "".join(c.upper() if "a" <= c <= "z" else c for c in s)
    lo = "".join(c.lower() if "A" <= c <= "Z" else c for c in s)
    assert gram_set(up) == gram_set(lo) == gs
    # wrapping in extra whitespace never changes the gram set
    assert gram_set("   " + s + " \t ") == gs
    # partial grams are interior-only and a subset of full-text grams
    pg = gram_set(s, partial=True)
    for g in pg:
        assert g // (GRAM_BASE * GRAM_BASE) != 0
        assert (g // GRAM_BASE) % GRAM_BASE != 0
        assert g % GRAM_BASE != 0
    assert pg <= gs


@settings(max_examples=100, deadline=None)
@given(st.lists(text_st, max_size=8))
def test_batch_extraction_matches_scalar(texts):
    chunk_idx, term, tf, totals = extract_batch(texts)
    per_chunk = {}
    for ci, t in zip(chunk_idx, term):
        per_chunk.setdefault(int(ci), set()).add(int(t))
    for i, t in enumerate(texts):
        assert per_chunk.get(i, set()) == gram_set(t)
    assert int(tf.sum()) == int(totals.sum())


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_varint_roundtrip(v):
    enc = put_num(v)
    assert len(enc) == num_size(v)
    dec, pos = get_num(enc)
    assert dec == v and pos == len(enc)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=200)
)
def test_split_codec_roundtrip_prop(vals):
    arr = np.array(vals, dtype=np.uint64)
    blob = encode_array_split(arr)
    assert (decode_array_split(blob, arr.size) == arr).all()
    assert len(blob) == sum(num_size(int(v)) for v in arr)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=GRAM_BASE, max_value=GRAM_3_BASE - 1))
def test_gram_string_roundtrip_prop(g):
    # canonical grams round-trip; gram_from_str collapses leading
    # boundaries, so re-parse its own rendering instead of comparing g
    s = gram_to_str(g)
    g2 = gram_from_str(s)
    assert gram_to_str(g2) == gram_to_str(g2)  # stable
    if "." not in s[:2]:  # no leading boundary: exact round-trip
        assert g2 == g


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=(1 << 61) - 2),
    st.integers(min_value=0, max_value=(1 << 61) - 2),
    st.lists(
        st.integers(min_value=0, max_value=(1 << 61) - 2), min_size=1, max_size=50
    ),
)
def test_modmul_add_exact_prop(a, b, xs):
    """Vectorized (a*x+b) mod 2^61-1 == Python bigint arithmetic."""
    from microfts_ray.pipelines.dedup import _MERSENNE, _modmul_add

    x = np.array(xs, dtype=np.uint64)
    got = _modmul_add(np.uint64(a), np.uint64(b), x)
    want = [(a * int(v) + b) % _MERSENNE for v in xs]
    assert got.tolist() == want


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1 << 40),  # doc
            st.integers(min_value=0, max_value=500),  # chunk
            st.integers(min_value=1, max_value=200),  # tf
            st.integers(min_value=1, max_value=5000),  # dl
        ),
        min_size=1,
        max_size=400,
    ),
    st.sets(st.integers(min_value=0, max_value=7), min_size=1, max_size=4),
)
def test_decode_run_blocks_matches_full_prop(rows, blocks):
    """Block-selective decode == the corresponding slices of a full
    decode, for arbitrary runs and block subsets."""
    from microfts_ray.functions.postings import (
        BLOCK,
        decode_run,
        decode_run_blocks,
        encode_run,
    )

    rows = sorted(set(rows))
    doc = np.array([r[0] for r in rows], dtype=np.uint64)
    chunk = np.array([r[1] for r in rows], dtype=np.uint64)
    tf = np.array([r[2] for r in rows], dtype=np.uint64)
    dl = np.array([r[3] for r in rows], dtype=np.uint64)
    enc = encode_run(doc, chunk, tf, dl)
    full = decode_run(enc)
    n = len(rows)
    nblk = (n + BLOCK - 1) // BLOCK
    sel = sorted(b for b in blocks if b < nblk)
    if not sel:
        sel = [0]
    bdoc, bchunk, btf, bdl = decode_run_blocks(enc, np.array(sel))
    want_idx = np.concatenate(
        [np.arange(b * BLOCK, min((b + 1) * BLOCK, n)) for b in sel]
    )
    assert (bdoc == full.doc_ids[want_idx]).all()
    assert (bchunk == full.chunk_ids[want_idx]).all()
    assert (btf == full.tfs[want_idx]).all()
    assert (bdl == full.dls[want_idx]).all()

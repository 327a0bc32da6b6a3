"""Gram codec/extraction parity tests.

Golden vectors from the reference's own tests
(/root/reference/test.go:47-55) and semantics
(/root/reference/fulltext.go:210-282); see FIXTURES.md §3.
"""

import random

import numpy as np
import pytest

from microfts_ray.functions.grams import (
    GRAM_3_BASE,
    GRAM_BASE,
    extract_batch,
    gram_from_str,
    gram_set,
    gram_strings,
    gram_to_str,
)

# test.go:48 round-trip vectors
ROUNDTRIP = [".TH", "THI", "HIS", "HI.", ".IS", "IS.", ".A.", ".TE", "TES", "EST", "ST."]


def test_gram_string_roundtrip():
    for s in ROUNDTRIP:
        g = gram_from_str(s)
        assert gram_to_str(g) == s, s
        assert gram_from_str(s.lower()) == g  # case-fold


def test_gram_extraction_this_is_a_test():
    got = set(gram_strings("this is a test"))
    assert got == {".TH", "THI", "HIS", "IS.", ".IS", ".A.", ".TE", "TES", "EST", "ST."}


def test_partial_mode_interior_only():
    # fulltext.go:233 — partial keeps only grams with no boundary digit
    assert set(gram_strings("this", partial=True)) == {"THI", "HIS"}
    assert gram_set("ab", partial=True) == set()
    assert gram_set("retur", partial=True) <= gram_set("return a")


def test_case_fold_and_digits():
    assert gram_set("This") == gram_set("tHIS") == gram_set("THIS")
    # digits map to 1..10, letters 11..36 (fulltext.go:256-265)
    g = gram_from_str("012")
    assert g == (1 * GRAM_BASE + 2) * GRAM_BASE + 3


def test_boundary_collapse_and_punct():
    # runs of non-alnum collapse to a single boundary (fulltext.go:227)
    assert gram_set("a  +  b") == gram_set("a b")
    assert gram_set("a + b") == gram_set("a b")


def test_multi_arg_join():
    # grams(false, args...) joins with spaces (fulltext.go:217)
    assert gram_set("one", "two") == gram_set("one two")


def test_no_double_boundary_grams():
    for g in gram_set("a b c"):
        assert g >= GRAM_BASE
        assert not (g // (GRAM_BASE * GRAM_BASE) == 0 and (g // GRAM_BASE) % GRAM_BASE == 0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_extract_batch_matches_scalar(seed):
    rng = random.Random(seed)
    alphabet = "abcDEF012 ._-+():\t,йж"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        for _ in range(50)
    ]
    texts += ["", "   ", "a", "def f_1(a, b):", "import mod_3"]
    chunk_idx, term, tf, totals = extract_batch(texts)
    # distinct-gram sets must match the scalar spec per chunk
    per_chunk: dict[int, set] = {}
    for ci, t in zip(chunk_idx, term):
        per_chunk.setdefault(int(ci), set()).add(int(t))
    for i, text in enumerate(texts):
        assert per_chunk.get(i, set()) == gram_set(text), repr(text)
    # tf >= 1, totals = sum of tfs per chunk
    assert (tf >= 1).all()
    sums = np.zeros(len(texts), dtype=np.int64)
    np.add.at(sums, chunk_idx, tf)
    assert (sums == totals).all()
    assert (term.astype(np.int64) < GRAM_3_BASE).all()


def test_extract_batch_ordering():
    chunk_idx, term, _, _ = extract_batch(["b a", "a b"])
    # rows ordered by (chunk_idx, term)
    key = chunk_idx * GRAM_3_BASE + term.astype(np.int64)
    assert (np.diff(key) > 0).all()

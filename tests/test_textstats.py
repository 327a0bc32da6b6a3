"""Text-analysis operator tests."""

import pyarrow as pa
import pytest
import ray.data

from microfts_ray.pipelines.textstats import (
    BPE_SPLIT_PATTERN,
    fingerprint,
    lang_id,
    quality_stats,
    term_df,
    token_count,
    token_count_bpe,
    word_tokens,
)


def _ds(texts):
    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts, pa.string())}
        )
    )


TEXTS = [
    "The quick brown fox, the lazy dog!",
    "el perro y el gato es una mascota de la casa",
    "der Hund und die Katze ist ein Tier mit Fell zu Hause",
    "数据库引擎测试",
    "",
    "a b c a b a",
]


def test_word_tokens():
    assert word_tokens("Hi, there 9x!") == ["hi", "there", "9x"]
    assert word_tokens("") == []
    assert word_tokens("数据库") == []


def test_token_count():
    out = token_count(_ds(TEXTS)).to_pandas().set_index("doc_id")["n_tokens"]
    assert out[0] == 7 and out[4] == 0 and out[5] == 6


def test_token_count_bpe():
    import re

    out = token_count_bpe(_ds(TEXTS)).to_pandas().set_index("doc_id")["n_bpe_tokens"]
    # python re counts the same leftmost non-overlapping matches as
    # the Arrow/DuckDB RE2 engines for this lookahead-free pattern
    for i, t in enumerate(TEXTS):
        assert out[i] == len(re.findall(BPE_SPLIT_PATTERN, t)), t
    # contractions split into (word, 't) pieces; punctuation runs fuse
    assert out[0] == len(re.findall(BPE_SPLIT_PATTERN, TEXTS[0]))
    assert out[4] == 0


def test_term_df():
    out = term_df(_ds(TEXTS)).to_pandas().set_index("term")["df"]
    assert out["the"] == 1  # distinct per doc
    assert out["a"] == 1
    assert out["el"] == 1


def test_quality_stats():
    out = quality_stats(_ds(TEXTS)).to_pandas().set_index("doc_id")
    assert out.loc[4, "alpha_ratio"] == 0.0
    t = TEXTS[0]
    alpha = sum(c.isascii() and c.isalpha() for c in t)
    assert out.loc[0, "alpha_ratio"] == pytest.approx(alpha / len(t))
    toks = word_tokens(t)
    assert out.loc[0, "avg_token_len"] == pytest.approx(sum(map(len, toks)) / len(toks))


def test_lang_id():
    out = lang_id(_ds(TEXTS)).to_pandas().set_index("doc_id")["lang_pred"]
    assert out[0] == "en" and out[1] == "es" and out[2] == "de" and out[3] == "zh"
    assert out[4] == "und"


def test_fingerprint_deterministic():
    a = fingerprint(_ds(TEXTS)).to_pandas().set_index("doc_id")["fp"]
    b = fingerprint(_ds(TEXTS)).to_pandas().set_index("doc_id")["fp"]
    assert (a == b).all()
    assert a[4] == 0
    assert a[0] != a[1]


def test_asof_prev_backward_inclusive():
    """asof_prev: greatest right ts <= left ts per key, ties by
    greatest right id, null when nothing qualifies; equal-ts rows ARE
    eligible (backward inclusive)."""
    from microfts_ray.pipelines.relational import asof_prev

    left = ray.data.from_arrow(
        pa.table(
            {"k": pa.array([1, 1, 1, 2, 3], pa.int64()),
             "lts": pa.array([10, 20, 5, 10, 10], pa.int64()),
             "lid": pa.array([100, 101, 102, 103, 104], pa.int64())}
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {"k": pa.array([1, 1, 1, 1, 2], pa.int64()),
             "rts": pa.array([10, 10, 15, 30, 50], pa.int64()),
             "rid": pa.array([7, 9, 8, 6, 5], pa.int64())}
        )
    )
    out = (
        asof_prev(
            left, right,
            left_key="k", left_ts="lts", left_id="lid",
            right_key="k", right_ts="rts", right_id="rid",
        )
        .to_pandas()
        .set_index("left_id")["prev_right_id"]
    )
    assert out[100] == 9  # ts=10 tie -> greatest rid of {7,9}
    assert out[101] == 8  # greatest ts<=20 is 15
    assert out.isna()[102]  # nothing <= 5
    assert out.isna()[103]  # right ts 50 > 10
    assert out.isna()[104]  # key 3 has no right rows


def test_asof_prev_negative_right_id_roundtrips():
    """A legitimately NEGATIVE right_id must come back intact — the
    no-match NULL mask is the row-index sentinel, not the id value
    (the r3 version masked with prev < 0, silently nulling -1 ids)."""
    from microfts_ray.pipelines.relational import asof_prev

    left = ray.data.from_arrow(
        pa.table(
            {"k": pa.array([1, 1], pa.int64()),
             "lts": pa.array([10, 1], pa.int64()),
             "lid": pa.array([100, 101], pa.int64())}
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {"k": pa.array([1], pa.int64()),
             "rts": pa.array([5], pa.int64()),
             "rid": pa.array([-1], pa.int64())}
        )
    )
    out = (
        asof_prev(
            left, right,
            left_key="k", left_ts="lts", left_id="lid",
            right_key="k", right_ts="rts", right_id="rid",
        )
        .to_pandas()
        .set_index("left_id")["prev_right_id"]
    )
    assert out[100] == -1  # negative id is a real match, not NULL
    assert out.isna()[101]  # nothing <= 1 -> genuine no-match


def test_asof_prev_rejects_non_integer_key():
    from microfts_ray.pipelines.relational import asof_prev

    left = ray.data.from_arrow(
        pa.table(
            {"k": pa.array(["x"], pa.string()),
             "lts": pa.array([1], pa.int64()),
             "lid": pa.array([1], pa.int64())}
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {"k": pa.array(["x"], pa.string()),
             "rts": pa.array([1], pa.int64()),
             "rid": pa.array([1], pa.int64())}
        )
    )
    with pytest.raises(Exception, match="integer-typed"):
        asof_prev(
            left, right,
            left_key="k", left_ts="lts", left_id="lid",
            right_key="k", right_ts="rts", right_id="rid",
        ).to_pandas()


def test_events_prev_id_sharded_matches_naive():
    """events_prev_id (hash-shard + lexsort + segment shift — no
    per-user groups) must equal the naive per-user LAG, including a
    hot key that dominates one shard."""
    import numpy as np
    import pandas as pd

    from microfts_ray.pipelines.relational import events_prev_id

    rng = np.random.default_rng(7)
    n = 2000
    users = np.where(rng.random(n) < 0.4, 3, rng.integers(0, 50, n))
    ts = pd.to_datetime(rng.integers(0, 10_000, n), unit="s")
    eid = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {"user_id": pa.array(users, pa.int64()),
         "event_id": pa.array(eid, pa.int64()),
         "ts": pa.array(ts)}
    )
    got = (
        events_prev_id(ray.data.from_arrow(tbl), n_shards=7)
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    df = tbl.to_pandas()
    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    prev = df.groupby("user_id")["event_id"].shift(1)
    want = pd.DataFrame(
        {"user_id": df["user_id"], "event_id": df["event_id"],
         "prev_event_id": prev}
    ).sort_values(["user_id", "event_id"]).reset_index(drop=True)
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    ga, wa = got["prev_event_id"], want["prev_event_id"]
    assert (ga.isna() == wa.isna()).all()
    assert (ga.dropna() == wa.dropna()).all()

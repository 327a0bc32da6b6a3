"""Relational operator demos over the TPC-H-ish testdata tables.

Shows the engine's general dataflow vocabulary (SURVEY.md §2.4/§2.5
mappings): groupby aggregates with per-batch combining, broadcast hash
join (small side shipped once via ray.put, looked up inside
map_batches — never a shuffle join for a dimension table), sort +
limit top-k.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def pricing_summary(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """TPC-H Q1-style: exact-sum measures only (quantities are whole
    numbers, so float sums are order-independent).

    Pre-aggregates per batch with Arrow's native hash group_by (C++,
    ~ms for 10^6 rows) so the Ray groupby shuffle moves a handful of
    partial rows per batch — Ray's sort-based aggregate over raw
    string-keyed rows measured 15 s for 600k rows, the combiner form
    runs the whole pipeline in well under a second."""

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"),
             ("l_quantity", "count", pc.CountOptions(mode="all"))]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "psum", "pcount"]
        )

    agg = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("psum"), Sum("pcount"))
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty": b["sum(psum)"],
                "count_order": b["sum(pcount)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def _combine(keys: list[str], count_col: str):
    """Per-batch Arrow hash pre-aggregation (the combiner): the Ray
    groupby then shuffles one partial row per (batch, group) instead
    of every input row — Ray's sort-based aggregate over raw rows is
    orders of magnitude slower on string keys."""

    def partial(b: pa.Table) -> pa.Table:
        # mode="all": count rows like SQL count(*) — plain "count"
        # counts non-null values and would diverge from the oracles
        g = b.group_by(keys).aggregate(
            [(count_col, "count", pc.CountOptions(mode="all"))]
        )
        return g.rename_columns(keys + ["pcount"])

    return partial


def top_customers(orders: ray.data.Dataset, k: int = 10) -> pa.Table:
    """Orders per customer, top-k by (count desc, custkey asc)."""
    agg = (
        orders.map_batches(
            _combine(["o_custkey"], "o_custkey"), batch_format="pyarrow"
        )
        .groupby("o_custkey")
        .aggregate(Sum("pcount"))
    )

    def local_topk(b: pa.Table) -> pa.Table:
        # per-block top-k; the driver merges tiny winner lists — no
        # all-to-all sort barrier for a k-row result
        ck = b["o_custkey"].to_numpy()
        n = b["sum(pcount)"].to_numpy()
        order = np.lexsort((ck, -n))[:k]
        return pa.table(
            {"o_custkey": pa.array(ck[order], pa.int64()),
             "order_count": pa.array(n[order].astype(np.int64), pa.int64())}
        )

    winners = agg.map_batches(local_topk, batch_format="pyarrow").take_all()
    ck = np.array([r["o_custkey"] for r in winners], dtype=np.int64)
    n = np.array([r["order_count"] for r in winners], dtype=np.int64)
    order = np.lexsort((ck, -n))[:k]
    return pa.table(
        {"o_custkey": pa.array(ck[order], pa.int64()),
         "order_count": pa.array(n[order], pa.int64())}
    )


def orders_per_nation(
    orders: ray.data.Dataset, customer_path: str, nation_path: str
) -> ray.data.Dataset:
    """Broadcast join: customer+nation dimension lookup shipped once
    via ray.put; orders stream through map_batches with a numpy
    gather — no shuffle."""
    import pyarrow.parquet as pq

    cust = pq.read_table(customer_path, columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(nation_path, columns=["n_nationkey", "n_name"])
    # sorted-key arrays instead of Python dicts: the per-batch lookup
    # is two numpy searchsorted gathers + one Arrow take, no per-row
    # Python (and the broadcast payload is flat buffers, not a dict)
    c_key = cust["c_custkey"].to_numpy()
    c_order = np.argsort(c_key, kind="stable")
    c_key = c_key[c_order]
    c_nat = cust["c_nationkey"].to_numpy()[c_order]
    n_key = nation["n_nationkey"].to_numpy()
    n_order = np.argsort(n_key, kind="stable")
    n_key = n_key[n_order]
    n_names = nation["n_name"].combine_chunks().take(pa.array(n_order))
    lookup_ref = ray.put((c_key, c_nat, n_key, n_names))

    def attach(b: pa.Table) -> pa.Table:
        c_key_s, c_nat_s, n_key_s, names_s = ray.get(lookup_ref)
        ck = b["o_custkey"].to_numpy()
        nk = c_nat_s[np.searchsorted(c_key_s, ck)]
        names = names_s.take(pa.array(np.searchsorted(n_key_s, nk)))
        return pa.table({"n_name": names})

    agg = (
        orders.map_batches(attach, batch_format="pyarrow")
        .map_batches(_combine(["n_name"], "n_name"), batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("pcount"))
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {"n_name": b["n_name"], "n_orders": b["sum(pcount)"].cast(pa.int64())}
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def events_by_type(events: ray.data.Dataset) -> ray.data.Dataset:
    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("event_type").aggregate(
            [("value", "count", pc.CountOptions(mode="all")),
             ("value", "min"), ("value", "max")]
        )
        return g.rename_columns(["event_type", "pcount", "pmin", "pmax"])

    agg = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("pcount"), Min("pmin"), Max("pmax"))
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "n": b["sum(pcount)"].cast(pa.int64()),
                "min_value": b["min(pmin)"],
                "max_value": b["max(pmax)"],
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def events_hourly(events: ray.data.Dataset) -> ray.data.Dataset:
    """Tumbling-window aggregate: events per (event_type, hour).
    The window key is computed vectorized in map_batches; the groupby
    then behaves like any keyed aggregate (streaming semantics are
    batch-windowed here — the testdata stream is bounded)."""

    def window(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hour = pc.floor_temporal(b["ts"], unit="hour")
        return pa.table({"event_type": b["event_type"], "hour": hour})

    agg = (
        events.map_batches(window, batch_format="pyarrow")
        .map_batches(
            _combine(["event_type", "hour"], "event_type"), batch_format="pyarrow"
        )
        .groupby(["event_type", "hour"])
        .aggregate(Sum("pcount"))
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": b["event_type"], "hour": b["hour"],
             "n": b["sum(pcount)"].cast(pa.int64())}
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def events_prev_id(
    events: ray.data.Dataset, n_shards: int = 256
) -> ray.data.Dataset:
    """Per-user LAG: each event paired with the previous event id of
    the same user (order by ts, event_id). NOT a per-key group — a
    hot user (bot account) at 100 TB would make one unbounded
    straggler group. Instead the asof_prev pattern: hash-shard by
    user (bounded, balanced groups), lexsort each shard by
    (user, ts, event_id), and the previous-row shift is masked at
    user-segment starts — no per-key Python loop, no driver state."""

    def tag(b: pa.Table) -> pa.Table:
        import numpy as np

        u = b["user_id"].to_numpy().astype(np.int64, copy=False)
        ts = b["ts"].to_numpy()
        if ts.dtype.kind == "M":
            ts = ts.astype("datetime64[us]").view(np.int64)
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "ts64": pa.array(ts.astype(np.int64, copy=False), pa.int64()),
                "event_id": b["event_id"].cast(pa.int64()),
                "shard": pa.array(u % np.int64(n_shards), pa.int64()),
            }
        )

    def lag_shard(group: pa.Table) -> pa.Table:
        import numpy as np

        u = group["user_id"].to_numpy().astype(np.int64, copy=False)
        ts = group["ts64"].to_numpy().astype(np.int64, copy=False)
        eid = group["event_id"].to_numpy().astype(np.int64, copy=False)
        order = np.lexsort((eid, ts, u))
        u_s, eid_s = u[order], eid[order]
        prev = np.empty(eid_s.size, dtype=np.float64)
        if eid_s.size:
            prev[0] = np.nan
            prev[1:] = eid_s[:-1]
            prev[np.r_[False, u_s[1:] != u_s[:-1]]] = np.nan
        return pa.table(
            {
                "user_id": pa.array(u_s, pa.int64()),
                "event_id": pa.array(eid_s, pa.int64()),
                "prev_event_id": pa.array(prev, pa.float64()),
            }
        )

    return (
        events.map_batches(tag, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(lag_shard, batch_format="pyarrow")
    )


def asof_prev(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_key: str,
    left_ts: str,
    left_id: str,
    right_key: str,
    right_ts: str,
    right_id: str,
    n_shards: int = 256,
) -> ray.data.Dataset:
    """Backward-inclusive AS-OF JOIN between two tables: for each
    left row, the right row of the same key with the greatest
    right_ts <= left_ts (ties on ts broken by greatest right_id, so
    the result is deterministic). Output: (left_id, prev_<right_id>),
    null where no right row qualifies.

    Ray-Data-first: both sides are tagged into one slim row stream
    (key, ts, id, side), shuffled ONCE by key hash shard, and each
    shard is matched with a single lexsort + a segment-reset
    maximum.accumulate — no per-key Python loop, no driver state.
    Timestamps compare as int64 microseconds.

    Key/id columns must be integer-typed (they ride the slim shuffle
    as int64; a silent float/string coercion would corrupt matches,
    so non-integer columns raise). right_id values may be ANY int64
    including negatives — the no-match NULL mask comes from the
    row-index sentinel, never from the id value."""
    shards64 = np.int64(n_shards)

    def _ts64(col) -> np.ndarray:
        arr = col.to_numpy()
        if arr.dtype.kind == "M":
            arr = arr.astype("datetime64[us]").view(np.int64)
        return arr.astype(np.int64, copy=False)

    def _int_col(b: pa.Table, name: str) -> np.ndarray:
        arr = b[name].to_numpy()
        if arr.dtype.kind not in "iu":
            raise TypeError(
                f"asof_prev: column {name!r} must be integer-typed "
                f"(got {arr.dtype}); hash/encode string keys to int64 "
                "upstream"
            )
        return arr.astype(np.int64, copy=False)

    def tag_left(b: pa.Table) -> pa.Table:
        k = _int_col(b, left_key)
        return pa.table(
            {"k": pa.array(k, pa.int64()),
             "ts": pa.array(_ts64(b[left_ts]), pa.int64()),
             "rid": pa.array(np.zeros(k.size, np.int64), pa.int64()),
             "lid": pa.array(_int_col(b, left_id), pa.int64()),
             "side": pa.array(np.ones(k.size, np.int8), pa.int8()),
             "shard": pa.array(k % shards64, pa.int64())}
        )

    def tag_right(b: pa.Table) -> pa.Table:
        k = _int_col(b, right_key)
        return pa.table(
            {"k": pa.array(k, pa.int64()),
             "ts": pa.array(_ts64(b[right_ts]), pa.int64()),
             "rid": pa.array(_int_col(b, right_id), pa.int64()),
             "lid": pa.array(np.zeros(k.size, np.int64), pa.int64()),
             "side": pa.array(np.zeros(k.size, np.int8), pa.int8()),
             "shard": pa.array(k % shards64, pa.int64())}
        )

    rows = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def match(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy().astype(np.int64, copy=False)
        ts = group["ts"].to_numpy().astype(np.int64, copy=False)
        rid = group["rid"].to_numpy().astype(np.int64, copy=False)
        lid = group["lid"].to_numpy().astype(np.int64, copy=False)
        side = group["side"].to_numpy().astype(np.int8, copy=False)
        # sort: key, then ts, then right-before-left at equal ts
        # (backward INCLUSIVE), rights at equal ts by rid ascending so
        # the accumulate lands on the greatest rid
        order = np.lexsort((rid, side, ts, k))
        k, ts, rid, lid, side = (
            k[order], ts[order], rid[order], lid[order], side[order]
        )
        n = k.size
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        seg_start = np.repeat(starts, np.diff(np.r_[starts, n]))
        r = np.where(side == 0, np.arange(n), -1)
        acc = np.maximum.accumulate(r)
        is_left = side == 1
        # a match leaked from the previous key sorts before this key's
        # segment start — invalid by the seg_start comparison. The
        # no-match mask is the ROW-INDEX sentinel (acc == -1 is
        # subsumed by acc < seg_start), never the rid value, so a
        # legitimately negative right_id round-trips intact.
        valid = is_left & (acc >= seg_start)
        out_lid = lid[is_left]
        hit = valid[is_left]
        prev = np.zeros(out_lid.size, dtype=np.int64)
        prev[hit] = rid[acc[is_left][hit]]
        return pa.table(
            {
                "left_id": pa.array(out_lid, pa.int64()),
                "prev_right_id": pa.array(prev, pa.int64(), mask=~hit),
            }
        )

    return rows.groupby("shard").map_groups(match, batch_format="pyarrow")


def lang_count(documents: ray.data.Dataset) -> ray.data.Dataset:
    agg = (
        documents.map_batches(_combine(["lang"], "lang"), batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("pcount"))
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {"lang": b["lang"], "n_docs": b["sum(pcount)"].cast(pa.int64())}
        )

    return agg.map_batches(rename, batch_format="pyarrow")

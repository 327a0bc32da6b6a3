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
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def pricing_summary(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """TPC-H Q1-style: exact-sum measures only (quantities are whole
    numbers, so float sums are order-independent)."""
    agg = lineitem.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity"), Count()
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty": b["sum(l_quantity)"],
                "count_order": b["count()"].cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def top_customers(orders: ray.data.Dataset, k: int = 10) -> pa.Table:
    """Orders per customer, top-k by (count desc, custkey asc)."""
    agg = orders.groupby("o_custkey").aggregate(Count())

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": b["o_custkey"], "order_count": b["count()"].cast(pa.int64())}
        )

    out = (
        agg.map_batches(rename, batch_format="pyarrow")
        .sort(["order_count", "o_custkey"], descending=[True, False])
        .limit(k)
    )
    return pa.Table.from_pylist(out.take_all())


def orders_per_nation(
    orders: ray.data.Dataset, customer_path: str, nation_path: str
) -> ray.data.Dataset:
    """Broadcast join: customer+nation dimension lookup shipped once
    via ray.put; orders stream through map_batches with a numpy
    gather — no shuffle."""
    import pyarrow.parquet as pq

    cust = pq.read_table(customer_path, columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(nation_path, columns=["n_nationkey", "n_name"])
    n_name = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )
    cust_nation = {
        ck: n_name[nk]
        for ck, nk in zip(
            cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()
        )
    }
    lookup_ref = ray.put(cust_nation)

    def attach(b: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        names = [lookup[ck] for ck in b["o_custkey"].to_pylist()]
        return pa.table({"n_name": pa.array(names, pa.string())})

    agg = (
        orders.map_batches(attach, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count())
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {"n_name": b["n_name"], "n_orders": b["count()"].cast(pa.int64())}
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def events_by_type(events: ray.data.Dataset) -> ray.data.Dataset:
    agg = events.groupby("event_type").aggregate(Count(), Min("value"), Max("value"))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "n": b["count()"].cast(pa.int64()),
                "min_value": b["min(value)"],
                "max_value": b["max(value)"],
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
        .groupby(["event_type", "hour"])
        .aggregate(Count())
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": b["event_type"], "hour": b["hour"],
             "n": b["count()"].cast(pa.int64())}
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def events_prev_id(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-user as-of/LAG: each event paired with the previous event
    id of the same user (order by ts, event_id). Expressed as
    groupby(user).map_groups with an in-group sort — the windowed /
    as-of join building block."""

    def lag(group: pa.Table) -> pa.Table:
        import numpy as np

        ts = group["ts"].to_numpy()
        eid = group["event_id"].to_numpy()
        order = np.lexsort((eid, ts))
        eid_s = eid[order]
        prev = np.empty(eid_s.size, dtype=np.float64)
        prev[0] = np.nan
        prev[1:] = eid_s[:-1]
        return pa.table(
            {
                "user_id": group["user_id"].take(pa.array(order)),
                "event_id": pa.array(eid_s, pa.int64()),
                "prev_event_id": pa.array(prev, pa.float64()),
            }
        )

    return events.groupby("user_id").map_groups(lag, batch_format="pyarrow")


def lang_count(documents: ray.data.Dataset) -> ray.data.Dataset:
    agg = documents.groupby("lang").aggregate(Count())

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"lang": b["lang"], "n_docs": b["count()"].cast(pa.int64())})

    return agg.map_batches(rename, batch_format="pyarrow")

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


def lang_count(documents: ray.data.Dataset) -> ray.data.Dataset:
    agg = documents.groupby("lang").aggregate(Count())

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"lang": b["lang"], "n_docs": b["count()"].cast(pa.int64())})

    return agg.map_batches(rename, batch_format="pyarrow")

"""Classic relational analytics over the TPC-H-style tables — the
"warehouse side" of a data-processing engine, expressed Ray-Data-first.

These exist to prove the engine's relational shapes at scale, each the
canonical pattern for its class:

- ``pricing_summary`` (TPC-H Q1 shape): per-batch Arrow ``group_by``
  PARTIALS inside ``map_batches`` (the combiner), then one tiny
  ``groupby().aggregate`` over <= |key-combo| x n_batches partial rows
  — the full fact table never shuffles.
- ``shipping_priority`` (TPC-H Q3 shape): filters pushed to the
  parquet read (``columns=`` pruning + early ``map_batches`` filters),
  two co-partitioned native hash joins, pre-aggregated revenue, one
  distributed ``sort().limit(k)`` — the driver sees k rows.
- ``large_orders`` (TPC-H Q18 shape): pre-aggregate the fact table,
  HAVING-filter the small aggregate, then a hash join back to the
  dimension — a semi-join via the aggregate, never a fact x dim
  cartesian.

All monetary aggregates round half-away-from-zero to fixed decimals so
the DuckDB oracle replay compares exactly (sum order of doubles is not
associative; rounding absorbs the <=1-ulp spread).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from fdblucene_ray.ops.hashing import round_half_away as _rha


def _join_partitions(requested: int) -> int:
    """Clamp join fan-out to the cluster: each hash-shuffle JoinOperator
    reserves ~num_partitions aggregators, and a plan with TWO chained
    joins at 16 partitions livelocks a 4-CPU session (all CPUs parked
    on reserved aggregators — the same reservation trap build_sharded
    clamps for). cpus/2 per join leaves room for the map/sort stages."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(requested, cpus // 2))


class _Q1Partials:
    """map_batches combiner: per-batch (returnflag, linestatus) partial
    sums via Arrow's vectorized ``Table.group_by`` — the batch collapses
    to at most |flag x status| rows before anything shuffles."""

    def __init__(self, cutoff):
        self.cutoff = cutoff

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.less_equal(batch["l_shipdate"], pa.scalar(self.cutoff))
        )
        ext = t["l_extendedprice"]
        disc = t["l_discount"]
        one_minus = pc.subtract(pa.scalar(1.0), disc)
        disc_price = pc.multiply(ext, one_minus)
        charge = pc.multiply(
            disc_price, pc.add(pa.scalar(1.0), t["l_tax"])
        )
        flat = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": t["l_quantity"],
                "base": ext,
                "disc_price": disc_price,
                "charge": charge,
                "disc": disc,
                "n": pa.array(np.ones(len(t), np.int64)),
            }
        )
        g = flat.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("qty", "sum"),
                ("base", "sum"),
                ("disc_price", "sum"),
                ("charge", "sum"),
                ("disc", "sum"),
                ("n", "sum"),
            ]
        )
        return g


def pricing_summary(
    lineitem: ray.data.Dataset, cutoff
) -> pa.Table:
    """TPC-H Q1 pricing summary: sums/averages of quantity, price and
    charge per (returnflag, linestatus) over lineitems shipped on or
    before ``cutoff``. Returns the finalized (rounded) report sorted by
    the group keys; only combiner partials cross the exchange."""
    partials = lineitem.map_batches(
        _Q1Partials(cutoff), batch_format="pyarrow", zero_copy_batch=True
    )
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_sum", alias_name="sum_qty"),
        Sum("base_sum", alias_name="sum_base_price"),
        Sum("disc_price_sum", alias_name="sum_disc_price"),
        Sum("charge_sum", alias_name="sum_charge"),
        Sum("disc_sum", alias_name="sum_disc"),
        Sum("n_sum", alias_name="count_order"),
    )
    df = agg.to_pandas().sort_values(
        ["l_returnflag", "l_linestatus"]
    ).reset_index(drop=True)
    n = df["count_order"].to_numpy(np.float64)
    return pa.table(
        {
            "l_returnflag": pa.array(df["l_returnflag"], pa.string()),
            "l_linestatus": pa.array(df["l_linestatus"], pa.string()),
            "sum_qty": pa.array(_rha(df["sum_qty"].to_numpy(np.float64), 2)),
            "sum_base_price": pa.array(
                _rha(df["sum_base_price"].to_numpy(np.float64), 2)
            ),
            "sum_disc_price": pa.array(
                _rha(df["sum_disc_price"].to_numpy(np.float64), 2)
            ),
            "sum_charge": pa.array(
                _rha(df["sum_charge"].to_numpy(np.float64), 2)
            ),
            "avg_qty": pa.array(
                _rha(df["sum_qty"].to_numpy(np.float64) / n, 6)
            ),
            "avg_price": pa.array(
                _rha(df["sum_base_price"].to_numpy(np.float64) / n, 6)
            ),
            "avg_disc": pa.array(
                _rha(df["sum_disc"].to_numpy(np.float64) / n, 6)
            ),
            "count_order": pa.array(df["count_order"].to_numpy(np.int64)),
        }
    )


def _revenue_partials(batch: pa.Table) -> pa.Table:
    """Per-batch revenue combiner: collapse lineitems to (orderkey,
    partial revenue) before the join/groupby exchange."""
    rev = pc.multiply(
        batch["l_extendedprice"],
        pc.subtract(pa.scalar(1.0), batch["l_discount"]),
    )
    flat = pa.table(
        {"o_orderkey": batch["l_orderkey"], "rev": rev}
    )
    return flat.group_by(["o_orderkey"]).aggregate([("rev", "sum")])


def shipping_priority(
    sf_dir: str,
    *,
    segment: str = "BUILDING",
    cutoff=None,
    k: int = 10,
    num_partitions: int = 16,
) -> pa.Table:
    """TPC-H Q3 shipping priority: top-``k`` unshipped orders by
    revenue for one market segment. Pruned reads, early filters, one
    revenue combiner, two co-partitioned hash joins (lineitem-side
    pre-aggregated so the big join input is one row per order), one
    distributed sort().limit(k)."""
    import datetime
    import os

    if cutoff is None:
        cutoff = datetime.datetime(1998, 6, 1)
    # predicates push into the parquet scan: row groups whose
    # min/max statistics cannot match are skipped before any bytes
    # decode (date-sorted / segment-clustered files prune hardest)
    cust = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"],
            filter=(pc.field("c_mktsegment") == segment),
        )
        .select_columns(["c_custkey"])
        .rename_columns({"c_custkey": "o_custkey"})
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=(pc.field("o_orderdate") < pa.scalar(cutoff)),
    )
    li_rev = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
            filter=(pc.field("l_shipdate") > pa.scalar(cutoff)),
        )
        .map_batches(
            _revenue_partials, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    npart = _join_partitions(num_partitions)
    joined = orders.join(
        cust, join_type="inner", num_partitions=npart,
        on=("o_custkey",),
    ).join(
        li_rev, join_type="inner", num_partitions=npart,
        on=("o_orderkey",),
    )
    agg = joined.groupby(
        ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).aggregate(Sum("rev_sum", alias_name="revenue"))
    top = (
        agg.sort(
            ["revenue", "o_orderdate", "o_orderkey"],
            descending=[True, False, False],
        )
        .limit(k)
        .to_pandas()
    )
    return pa.table(
        {
            "o_orderkey": pa.array(top["o_orderkey"].to_numpy(np.int64)),
            "revenue": pa.array(
                _rha(top["revenue"].to_numpy(np.float64), 2)
            ),
            "o_orderdate": pa.array(
                [d.strftime("%Y-%m-%d") for d in top["o_orderdate"]],
                pa.string(),
            ),
            "o_orderpriority": pa.array(
                top["o_orderpriority"], pa.string()
            ),
        }
    )


def large_orders(
    sf_dir: str,
    *,
    min_qty: float = 120.0,
    k: int = 20,
    num_partitions: int = 16,
) -> pa.Table:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    ``min_qty``, with customer + order detail. The fact table collapses
    to per-order partials in map_batches, the HAVING filter runs on the
    small aggregate, and only qualifying orders join back to the
    dimensions."""
    import os

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    ).map_batches(
        lambda t: pa.table(
            {"o_orderkey": t["l_orderkey"], "qty": t["l_quantity"]}
        ).group_by(["o_orderkey"]).aggregate([("qty", "sum")]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    totals = (
        li.groupby("o_orderkey")
        .aggregate(Sum("qty_sum", alias_name="total_qty"))
        .filter(expr=f"total_qty > {min_qty}")
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
    ).rename_columns({"c_custkey": "o_custkey"})
    npart = _join_partitions(num_partitions)
    joined = totals.join(
        orders, join_type="inner", num_partitions=npart,
        on=("o_orderkey",),
    ).join(
        cust, join_type="inner", num_partitions=npart,
        on=("o_custkey",),
    )
    top = (
        joined.sort(
            ["total_qty", "o_orderkey"], descending=[True, False]
        )
        .limit(k)
        .to_pandas()
    )
    return pa.table(
        {
            "c_name": pa.array(top["c_name"], pa.string()),
            "o_orderkey": pa.array(top["o_orderkey"].to_numpy(np.int64)),
            "o_orderdate": pa.array(
                [d.strftime("%Y-%m-%d") for d in top["o_orderdate"]],
                pa.string(),
            ),
            "o_totalprice": pa.array(
                _rha(top["o_totalprice"].to_numpy(np.float64), 2)
            ),
            "total_qty": pa.array(
                _rha(top["total_qty"].to_numpy(np.float64), 2)
            ),
        }
    )

"""Relational analytics (ops/relational.py): combiner-partial
aggregation and join/sort shapes vs pandas brute force."""
import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _lineitem(rng, n=400, n_orders=80):
    return pd.DataFrame(
        {
            "l_orderkey": rng.integers(1, n_orders + 1, n).astype(np.int64),
            "l_quantity": rng.integers(1, 50, n).astype(np.float64),
            "l_extendedprice": np.round(
                rng.uniform(100, 1000, n), 2
            ),
            "l_discount": np.round(rng.uniform(0, 0.1, n), 2),
            "l_tax": np.round(rng.uniform(0, 0.08, n), 2),
            "l_returnflag": rng.choice(["A", "N", "R"], n),
            "l_linestatus": rng.choice(["F", "O"], n),
            "l_shipdate": pd.to_datetime("1997-01-01")
            + pd.to_timedelta(rng.integers(0, 1200, n), unit="D"),
        }
    )


class TestPricingSummary:
    def test_matches_pandas(self, ray_session):
        from fdblucene_ray.ops.relational import pricing_summary

        rng = np.random.default_rng(3)
        df = _lineitem(rng)
        cutoff = datetime.datetime(1999, 6, 30)
        got = pricing_summary(
            ray.data.from_pandas(df), cutoff
        ).to_pandas()
        f = df[df.l_shipdate <= cutoff]
        disc_price = f.l_extendedprice * (1 - f.l_discount)
        charge = disc_price * (1 + f.l_tax)
        exp = (
            f.assign(disc_price=disc_price, charge=charge)
            .groupby(["l_returnflag", "l_linestatus"])
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_base_price=("l_extendedprice", "sum"),
                sum_disc_price=("disc_price", "sum"),
                sum_charge=("charge", "sum"),
                avg_disc=("l_discount", "mean"),
                count_order=("l_quantity", "size"),
            )
            .reset_index()
            .sort_values(["l_returnflag", "l_linestatus"])
            .reset_index(drop=True)
        )
        assert list(got["l_returnflag"]) == list(exp["l_returnflag"])
        assert list(got["count_order"]) == list(exp["count_order"])
        np.testing.assert_allclose(
            got["sum_qty"], exp["sum_qty"], atol=0.005
        )
        np.testing.assert_allclose(
            got["sum_charge"], exp["sum_charge"], atol=0.005
        )
        np.testing.assert_allclose(
            got["avg_disc"], exp["avg_disc"], atol=5e-7
        )


class TestShippingPriorityAndLargeOrders:
    def test_sf0001_shapes_and_order(self, ray_session):
        """Against the real testdata: result is revenue-descending,
        keys are unique, dates render as YYYY-MM-DD strings."""
        from fdblucene_ray.ops.relational import (
            large_orders,
            shipping_priority,
        )

        q3 = shipping_priority("/root/testdata/sf0.001").to_pandas()
        assert len(q3) == 10
        assert q3["o_orderkey"].is_unique
        assert (q3["revenue"].diff().dropna() <= 1e-9).all()
        assert q3["o_orderdate"].str.match(r"^\d{4}-\d{2}-\d{2}$").all()

        q18 = large_orders("/root/testdata/sf0.001").to_pandas()
        assert len(q18) == 20
        assert (q18["total_qty"].diff().dropna() <= 1e-9).all()
        assert (q18["total_qty"] > 120.0).all()


class TestPredicatePushdown:
    """The date/segment predicates ship INTO the parquet scan: on a
    date-sorted multi-row-group fixture the scanner's statistics prune
    whole row groups before any bytes decode, and the Ray read with
    the same filter returns exactly the predicate rows."""

    def test_row_groups_pruned_and_rows_exact(
        self, ray_session, tmp_path
    ):
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        n = 10_000
        days = np.arange(n) // 100  # sorted by date
        base = datetime.datetime(1998, 1, 1)
        dates = pa.array(
            [base + datetime.timedelta(days=int(d)) for d in days],
            pa.timestamp("us"),
        )
        t = pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_shipdate": dates,
                "l_extendedprice": pa.array(
                    np.linspace(1, 2, n)
                ),
            }
        )
        p = str(tmp_path / "li.parquet")
        pq.write_table(t, p, row_group_size=1000)
        assert pq.ParquetFile(p).num_row_groups == 10

        cutoff = base + datetime.timedelta(days=19)  # first 2k rows
        expr = pc.field("l_shipdate") <= pa.scalar(cutoff)
        # the same expression Ray ships to the scan prunes row groups
        # via statistics (this IS the pushed-down pruning path)
        frag = list(pads.dataset(p).get_fragments())[0]
        kept = list(frag.split_by_row_group(expr))
        assert len(kept) == 2  # 8 of 10 row groups never decode

        got = ray.data.read_parquet(p, filter=expr).to_pandas()
        assert len(got) == 2000
        assert sorted(got["l_orderkey"]) == list(range(2000))

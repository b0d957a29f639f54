"""Host-scoped boilerplate stripping (ops/webtext.strip_boilerplate):
planted per-host templates are removed, unique content survives, and
the rebuilt text round-trips separators exactly."""

import pyarrow as pa
import pytest
import ray.data

from fdblucene_ray.ops.webtext import strip_boilerplate


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


def _run(rows, **kw):
    out = strip_boilerplate(_ds(rows), **kw).to_pandas()
    return out.set_index("doc_id").sort_index()


class TestStripBoilerplate:
    def test_planted_footer_removed_per_host(self, ray_session):
        rows = [
            (i, f"unique body {i}.COOKIE BANNER", "a.com") for i in range(6)
        ] + [
            (10 + i, f"other body {i}.COOKIE BANNER", "b.com")
            for i in range(2)
        ]
        # a.com: banner in 6/6 docs -> removed; b.com: 2/2 >= min_df=2
        got = _run(rows, frac=0.5, min_df=2)
        assert got.loc[0, "clean_text"] == "unique body 0"
        assert got.loc[0, "n_removed"] == 1
        assert got.loc[11, "clean_text"] == "other body 1"

    def test_host_scoping(self, ray_session):
        # the same sentence on two hosts, frequent on only one
        rows = [(i, f"x {i}.SHARED", "big.com") for i in range(5)] + [
            (99, "y.SHARED", "small.com")
        ]
        got = _run(rows, frac=0.5, min_df=2)
        assert got.loc[0, "clean_text"] == "x 0"
        # small.com: df=1 < min_df -> kept
        assert got.loc[99, "clean_text"] == "y.SHARED"
        assert got.loc[99, "n_removed"] == 0

    def test_duplicate_occurrences_in_one_doc(self, ray_session):
        rows = [
            (0, "NAV.body zero.NAV", "h"),
            (1, "NAV.body one", "h"),
            (2, "NAV.body two", "h"),
        ]
        got = _run(rows, frac=0.5, min_df=2)
        # both NAV occurrences in doc 0 are dropped (df counts docs once)
        assert got.loc[0, "clean_text"] == "body zero"
        assert got.loc[0, "n_removed"] == 2

    def test_below_threshold_kept(self, ray_session):
        rows = [(i, f"solo {i}.RARE" if i == 0 else f"solo {i}", "h")
                for i in range(10)]
        got = _run(rows, frac=0.5, min_df=2)
        assert got.loc[0, "clean_text"] == "solo 0.RARE"
        assert int(got["n_removed"].sum()) == 0

    def test_all_units_removed_yields_empty(self, ray_session):
        rows = [(0, "SAME", "h"), (1, "SAME", "h"), (2, "SAME", "h")]
        got = _run(rows, frac=0.5, min_df=2)
        assert (got["clean_text"] == "").all()
        assert (got["n_removed"] == 1).all()

    def test_separator_roundtrip(self, ray_session):
        # kept units re-join with the separator, empties preserved
        rows = [(0, "a..b.DROP", "h"), (1, "c.DROP", "h")]
        got = _run(rows, frac=0.9, min_df=2)
        assert got.loc[0, "clean_text"] == "a..b"
        assert got.loc[1, "clean_text"] == "c"

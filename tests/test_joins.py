"""As-of join: planted event streams with hand-computed expectations
plus a brute-force randomized oracle. SQL twin (`asof_join`) runs in
the driver gate."""

import numpy as np
import pyarrow as pa
import ray.data

from fdblucene_ray.ops.joins import asof_join


def _events(rows):
    """rows: (event_id, user, ts_us, value)"""
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.int64()),
                "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            }
        )
    )


def _run(left_rows, right_rows):
    out = (
        asof_join(_events(left_rows), _events(right_rows),
                  key_col="user_id")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    return list(
        out[["event_id", "key", "ts_us", "right_event_id", "right_value",
             "lag_us"]].itertuples(index=False, name=None)
    )


def _brute(left_rows, right_rows):
    got = []
    for eid, u, ts, _ in sorted(left_rows):
        cands = [r for r in right_rows if r[1] == u and r[2] <= ts]
        if cands:
            # latest ts wins; equal ts -> largest event_id
            best = max(cands, key=lambda r: (r[2], r[0]))
            got.append((eid, u, ts, best[0], round(best[3], 6), ts - best[2]))
        else:
            got.append((eid, u, ts, -1, 0.0, -1))
    return got


class TestAsofJoin:
    def test_basic_latest_prior_match(self):
        left = [(100, 1, 50, 0.0), (101, 1, 25, 0.0), (102, 2, 10, 0.0)]
        right = [(1, 1, 10, 1.5), (2, 1, 40, 2.5), (3, 2, 99, 9.9)]
        assert _run(left, right) == [
            (100, 1, 50, 2, 2.5, 10),   # latest right at-or-before 50 is ts=40
            (101, 1, 25, 1, 1.5, 15),   # only ts=10 qualifies
            (102, 2, 10, -1, 0.0, -1),  # user 2's right is later
        ]

    def test_equal_ts_inclusive_and_tie_break(self):
        left = [(100, 1, 50, 0.0)]
        right = [(1, 1, 50, 1.0), (7, 1, 50, 7.0), (3, 1, 50, 3.0)]
        # inclusive at equal ts; largest event_id wins
        assert _run(left, right) == [(100, 1, 50, 7, 7.0, 0)]

    def test_randomized_matches_bruteforce(self):
        rng = np.random.default_rng(7)
        left = [
            (1000 + i, int(rng.integers(0, 8)), int(rng.integers(0, 500)),
             float(rng.random()))
            for i in range(120)
        ]
        right = [
            (i, int(rng.integers(0, 8)), int(rng.integers(0, 500)),
             float(np.round(rng.random(), 6)))
            for i in range(80)
        ]
        assert _run(left, right) == _brute(left, right)

    def test_timestamp_us_column(self):
        # timestamp-typed ts column converts to epoch micros
        t0 = 1_700_000_000_000_000
        left = ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array([5], pa.int64()),
                    "user_id": pa.array([1], pa.int64()),
                    "ts": pa.array([t0 + 10], pa.timestamp("us")),
                    "value": pa.array([0.0], pa.float64()),
                }
            )
        )
        right = ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array([9], pa.int64()),
                    "user_id": pa.array([1], pa.int64()),
                    "ts": pa.array([t0], pa.timestamp("us")),
                    "value": pa.array([4.25], pa.float64()),
                }
            )
        )
        out = asof_join(left, right, key_col="user_id").to_pandas()
        assert list(out.itertuples(index=False, name=None)) == [
            (5, 1, t0 + 10, 9, 4.25, 10)
        ]

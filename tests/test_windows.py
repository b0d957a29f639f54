"""Windowed aggregates over event streams (beyond-reference op)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fdblucene_ray.ops.windows import sliding_window_agg, tumbling_window_agg


@pytest.fixture(scope="module")
def events(ray_session):
    rng = np.random.default_rng(3)
    n = 5000
    ts = rng.integers(1_700_000_000, 1_700_000_000 + 86_400, size=n)
    keys = rng.choice(["click", "view", "buy"], size=n)
    vals = rng.random(n) * 10
    t = pa.table(
        {
            "ts": pa.array(ts, pa.int64()),
            "event_type": pa.array(keys.tolist(), pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    return ray.data.from_arrow(t), ts, keys, vals


class TestTumbling:
    def test_matches_python_oracle(self, events):
        ds, ts, keys, vals = events
        out = tumbling_window_agg(ds, window_s=3600).to_pandas()
        exp: dict = {}
        for t, k, v in zip(ts, keys, vals):
            w = (int(t) // 3600) * 3600
            e = exp.setdefault((k, w), [0, 0.0])
            e[0] += 1
            e[1] += v
        assert len(out) == len(exp)
        for row in out.itertuples():
            n, s = exp[(row.event_type, int(row.window_start))]
            assert row.n_events == n
            assert row.sum_value == pytest.approx(s, rel=1e-9)
            assert row.mean_value == pytest.approx(s / n, rel=1e-9)

    def test_counts_partition_total(self, events):
        ds, ts, _, _ = events
        out = tumbling_window_agg(ds, window_s=3600).to_pandas()
        assert out["n_events"].sum() == len(ts)


class TestSliding:
    def test_each_event_in_k_windows(self, events):
        ds, ts, _, _ = events
        out = sliding_window_agg(ds, window_s=3600, slide_s=1800).to_pandas()
        assert out["n_events"].sum() == 2 * len(ts)  # k = 2 windows each

    def test_window_membership_exact(self, events):
        ds, ts, keys, vals = events
        out = sliding_window_agg(ds, window_s=3600, slide_s=900).to_pandas()
        # k = 4: every event in exactly 4 windows
        assert out["n_events"].sum() == 4 * len(ts)
        # spot-check one window against brute force
        row = out.iloc[17]
        w, k = int(row.window_start), row.event_type
        mask = (keys == k) & (ts >= w) & (ts < w + 3600)
        assert row.n_events == int(mask.sum())
        assert row.sum_value == pytest.approx(float(vals[mask].sum()), rel=1e-9)

    def test_rejects_non_multiple(self, events):
        ds, *_ = events
        with pytest.raises(ValueError, match="multiple"):
            sliding_window_agg(ds, window_s=3600, slide_s=1000)


class TestSessionize:
    def test_matches_python_oracle(self, events):
        from fdblucene_ray.ops.windows import sessionize

        ds, ts, keys, vals = events
        # reuse the fixture but key sessions by event_type as the "user"
        out = (
            sessionize(ds.map_batches(
                lambda t: t.rename_columns(
                    ["ts", "user_id", "value"]
                ), batch_format="pyarrow"
            ), gap_s=600, user_col="user_id")
            .to_pandas()
        )
        # python oracle over (key -> sorted ts, gap split)
        import collections

        by_key = collections.defaultdict(list)
        for t, k in zip(ts, keys):
            by_key[k].append(int(t))
        exp_rows = {}
        for k, lst in by_key.items():
            lst.sort()
            sid, start = 0, lst[0]
            prev = lst[0]
            n = 0
            for t in lst:
                if t - prev > 600:
                    exp_rows[(k, sid)] = (start, prev, n)
                    sid += 1
                    start, n = t, 0
                n += 1
                prev = t
            exp_rows[(k, sid)] = (start, prev, n)
        assert len(out) == len(exp_rows)
        for row in out.itertuples():
            st, en, n = exp_rows[(row.user_id, int(row.session_id))]
            assert (row.session_start, row.session_end, row.n_events) == (st, en, n)


def test_funnel_matches_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from fdblucene_ray.ops.windows import funnel_counts

    rng = np.random.default_rng(11)
    n = 600
    users = rng.integers(0, 40, n)
    ts = rng.permutation(n).astype(np.int64) * 1_000_000
    types = rng.choice(["view", "click", "purchase", "other"], n)
    t = pa.table(
        {
            "user_id": pa.array(users.astype(np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(types.astype(object)),
        }
    )
    got = funnel_counts(
        ray.data.from_arrow(t).repartition(4), ["view", "click", "purchase"]
    )
    # brute force first-match funnel
    import collections

    per_user = collections.defaultdict(list)
    for u, s, ty in zip(users, ts, types):
        per_user[u].append((s, ty))
    counts = [0, 0, 0]
    for u, evs in per_user.items():
        evs.sort()
        prev = -1
        for k, step in enumerate(["view", "click", "purchase"]):
            nxt = [s for s, ty in evs if ty == step and s > prev]
            if not nxt:
                break
            prev = min(nxt)
            counts[k] += 1
    assert got["step"].to_pylist() == ["view", "click", "purchase"]
    assert got["users"].to_pylist() == counts
    # funnel is monotone non-increasing
    us = got["users"].to_pylist()
    assert us[0] >= us[1] >= us[2]


def test_retention_matches_bruteforce():
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data

    from fdblucene_ray.ops.windows import retention_weeks

    rng = np.random.default_rng(3)
    n = 500
    users = rng.integers(0, 30, n).astype(np.int64)
    ts = (rng.integers(0, 6 * 604800, n).astype(np.int64)) * 1_000_000
    t = pa.table(
        {"user_id": pa.array(users), "ts": pa.array(ts, pa.timestamp("us"))}
    )
    got = retention_weeks(ray.data.from_arrow(t).repartition(3))
    per = collections.defaultdict(set)
    for u, s in zip(users, ts):
        per[u].add(s // (604800 * 1_000_000))
    cnt = collections.Counter()
    for u, wks in per.items():
        w0 = min(wks)
        for w in wks:
            cnt[int(w - w0)] += 1
    offs = sorted(cnt)
    assert got["week_offset"].to_pylist() == offs
    assert got["users"].to_pylist() == [cnt[o] for o in offs]

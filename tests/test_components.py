"""Connected components: planted graphs incl. chains longer than one
propagation round, vs a pure-Python union-find oracle. SQL twin
(`dup_components`) runs in the driver gate."""

import numpy as np
import pyarrow as pa
import ray.data

from fdblucene_ray.ops.components import connected_components


def _uf(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min node in component
    comp = {}
    for x in parent:
        comp.setdefault(find(x), []).append(x)
    out = {}
    for root, members in comp.items():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _run(pairs):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in pairs], pa.int64()),
                "b": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )
    t = connected_components(ds).to_pandas()
    return dict(zip(t["node"], t["label"]))


class TestConnectedComponents:
    def test_two_triangles_and_isolated_pair(self):
        pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (20, 21)]
        assert _run(pairs) == _uf(pairs)

    def test_long_chain_needs_multiple_rounds(self):
        # a 40-node path: min label must travel the whole chain
        pairs = [(i + 1, i) for i in range(40)]
        got = _run(pairs)
        assert got == {i: 0 for i in range(41)}

    def test_random_graph_matches_union_find(self):
        rng = np.random.default_rng(3)
        pairs = [
            (int(rng.integers(0, 60)), int(rng.integers(0, 60)))
            for _ in range(80)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        assert _run(pairs) == _uf(pairs)

    def test_star_graph_one_round(self):
        pairs = [(0, i) for i in range(1, 20)]
        assert _run(pairs) == {i: 0 for i in range(20)}

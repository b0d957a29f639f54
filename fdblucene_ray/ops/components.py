"""Connected components over a pair list — the step that turns
near-duplicate PAIRS (from minhash/simhash/embedding dedup) into
duplicate CLUSTERS, so "keep one doc per cluster" is well-defined even
when duplicates chain (a~b, b~c but a!~c).

Algorithm: iterative min-label propagation, expressed entirely as
``groupby().map_groups`` rounds (no joins, no driver-side graph):

    round = two narrow shuffles over (node, label) / (src, dst) rows
      1. group edges+labels by SOURCE node: each group holds one
         label row and the node's out-neighbors; emit (dst, label)
         messages plus the node's own (node, label)
      2. group messages by node: new label = min(received)

    converged when no label changed (a tiny per-round aggregate).

Rounds needed = graph diameter in the worst case; near-dup graphs are
shallow (cliques + short chains), so 2-4 rounds is typical. A
large-star/small-star variant (Kiveris et al., "Connected Components
in MapReduce", SoCC'14) would cut worst-case rounds to O(log n) at the
cost of two extra shuffles per round — the message shape here is the
same, so it can be swapped in without changing callers.

At 100 TB scale the data in flight is only (int64, int64) rows — the
pair list from dedup is orders of magnitude smaller than the corpus.

Reference tie-in: extends D3 doc-id uniqueness / ops/dedup.py
(SURVEY.md §2.7) from pairwise verdicts to transitive clusters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _propagate(group: pa.Table) -> pa.Table:
    """Group = one source node's label row(s) (dst = -1) + its
    out-edges. Emit (node, label) for itself and every neighbor."""
    dst = group["dst"].to_numpy(zero_copy_only=False)
    lab = group["label"].to_numpy(zero_copy_only=False)
    node = int(group["src"][0].as_py())
    own = lab[dst == -1]
    label = int(own.min()) if len(own) else node
    neigh = dst[dst != -1]
    out_nodes = np.concatenate((neigh, [node])).astype(np.int64)
    return pa.table(
        {
            "src": pa.array(out_nodes),
            "dst": pa.array(np.full(len(out_nodes), -1, np.int64)),
            "label": pa.array(np.full(len(out_nodes), label, np.int64)),
        }
    )


def _min_label(group: pa.Table) -> pa.Table:
    lab = group["label"].to_numpy(zero_copy_only=False)
    node = int(group["src"][0].as_py())
    return pa.table(
        {
            "node": pa.array([node], pa.int64()),
            "label": pa.array([int(lab.min())], pa.int64()),
        }
    )


def connected_components(
    pairs: ray.data.Dataset,
    *,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 50,
) -> ray.data.Dataset:
    """Label every node of the pair graph with its component's minimum
    node id. -> Dataset of (node, label)."""

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate((a, b))),
                "dst": pa.array(np.concatenate((b, a))),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["src"],
                "label": batch["src"],
            }
        )

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .map_groups(
            lambda g: pa.table(
                {
                    "node": g["node"][:1],
                    "label": g["label"][:1],
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    prev_sum = None
    for _ in range(max_rounds):

        def as_label_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": batch["node"],
                    "dst": pa.array(
                        np.full(len(batch), -1, np.int64)
                    ),
                    "label": batch["label"],
                }
            )

        def edge_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": batch["src"],
                    "dst": batch["dst"],
                    "label": pa.array(
                        np.zeros(len(batch), np.int64)
                    ),
                }
            )

        msgs = (
            labels.map_batches(as_label_rows, batch_format="pyarrow")
            .union(edges.map_batches(edge_rows, batch_format="pyarrow"))
            .groupby("src")
            .map_groups(_propagate, batch_format="pyarrow")
        )
        new_labels = (
            msgs.groupby("src").map_groups(_min_label, batch_format="pyarrow")
        ).materialize()

        # convergence: labels only ever DECREASE (min of a set that
        # includes the old label), so an unchanged label sum means no
        # label moved — one tiny aggregate instead of a diff shuffle
        new_sum = new_labels.sum("label")
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels

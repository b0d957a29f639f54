"""Targeted filter for one known-benign Ray Data log message.

Ray 2.49's streaming executor warns "Operator produced a RefBundle
with a different schema ... new schema: ." whenever an INTERNAL
operator emits an empty block built by ``ArrowBlockBuilder().build()``
(a zero-field ``pa.table({})``). Both the sort-based shuffle (empty
range partitions when boundary samples collide) and the hash/sort
Aggregate reduce stage do this; no UDF runs on those blocks, so the
repo cannot type them. Minimal repro with ZERO repo code::

    ds = ray.data.read_parquet(p).groupby("k", num_partitions=3).count()
    ds.take_all()   # one '.. new schema: .' warning from Aggregate

Every fdblucene_ray UDF returns typed (possibly empty) tables — the
repo's own schema discipline is oracle-checked — so the EMPTY-schema
variant of the warning is pure noise that masks real drift. This
filter drops exactly that variant ("new schema: ." / empty previous
schema) and passes every typed-vs-typed divergence through untouched.

Installed by the entry points that own a session (bench.py, CLI, the
test fixture) and by ``__ray_entry__``; the library itself never
mutates logging on import.
"""

from __future__ import annotations

import logging

_TARGET = "ray.data._internal.execution.streaming_executor_state"


class _EmptySchemaBundleFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # noqa: A003
        msg = record.getMessage()
        if "RefBundle with a different schema" not in msg:
            return True
        # drop only the empty-schema variant; ". This" is the empty
        # pyarrow schema str() followed by the fixed message tail
        return not (
            ", new schema: . This" in msg
            or "Previous schema: , new" in msg
        )


def install_empty_schema_filter() -> None:
    """Idempotently attach the filter to the emitting Ray logger."""
    lg = logging.getLogger(_TARGET)
    if not any(
        isinstance(f, _EmptySchemaBundleFilter) for f in lg.filters
    ):
        lg.addFilter(_EmptySchemaBundleFilter())

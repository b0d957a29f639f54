"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library code these callables use) calls ``ray.init`` /
``ray.shutdown``.

- ``entry()``  — flagship pipeline at sf0.001: build the Lucene-chain
  inverted index over ``documents`` and run the BM25 WAND query set.
- ``queries()`` — one callable per implemented operator/pipeline from
  SURVEY.md §2 plus the training-data ops (dedup / ANN / text analysis /
  multimodal plumbing).
- ``oracle_sql()`` — DuckDB-runnable ANSI SQL twins for every
  SQL-expressible query (same column names, floats rounded identically
  on both sides). Non-SQL-expressible ops (Porter-stemmed BM25+WAND,
  minhash-LSH, simhash, winnowing, IVF) are covered by pytest against
  pure-Python oracles instead.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _quiet_benign_ray_warning() -> None:
    # drop ONLY Ray's empty-new-schema RefBundle warning (internal
    # operators emit schemaless empty blocks; see ops/raylog.py)
    from fdblucene_ray.ops.raylog import install_empty_schema_filter

    install_empty_schema_filter()


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from fdblucene_ray.pipelines.queries import q_search_lucene

    _quiet_benign_ray_warning()
    return q_search_lucene("/root/testdata/sf0.001").to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from fdblucene_ray.pipelines import queries as q

    _quiet_benign_ray_warning()
    return q.queries()


def oracle_sql() -> dict[str, str]:
    from fdblucene_ray.pipelines import queries as q

    return q.oracle_sql()

"""fdblucene_ray — a Ray-Data-native full-text index + BM25 query engine.

A from-scratch re-expression of the capabilities of cloudant-labs/fdblucene
(a Lucene-on-FoundationDB storage adapter; see /root/reference) as an
idiomatic Ray Data pipeline engine:

- ``map_batches`` tokenizers over zero-copy Arrow batches emit
  ``(term, doc_id, tf, norm)`` posting rows,
- a term-hash shuffle (``groupby`` on a salted partition key) builds
  delta+varint-compressed posting lists with skip pointers and per-block
  max-score metadata,
- immutable segments are published through an atomically-swapped JSON
  manifest (the analog of fdblucene's atomic ``rename`` commit,
  FDBDirectory.java:351-365),
- query-time top-k uses block-max WAND over BM25 (k1=1.2, b=0.75,
  Lucene-8 form) inside a searcher actor pool.

Nothing here is a port: the reference's execution machinery (FDB
transactions, page caches, async flush pipelines) is replaced by Ray
Data's streaming executor, object store, and actor pools.
"""

__version__ = "0.1.0"

from fdblucene_ray.index.build import build_index  # noqa: F401
from fdblucene_ray.index.distributed import DistributedSearcher  # noqa: F401
from fdblucene_ray.index.search import Searcher  # noqa: F401
from fdblucene_ray.oracle import OracleIndex  # noqa: F401

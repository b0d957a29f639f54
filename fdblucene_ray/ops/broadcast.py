"""Per-worker-process state cache for stateless map_batches TASKS.

Broadcast state in Ray Data has two idioms:

- **actor pool** (callable class, state in ``__init__``): right when
  the state is expensive to build AND the stage runs long enough to
  amortize actor spin-up (~1-2 s per pool). Index searchers and
  tokenizer exchanges keep this shape.
- **task + worker cache** (this module): right when the state is a
  broadcast object (``ray.put`` once) that each worker can fetch
  zero-copy from plasma and/or build cheaply. Tasks start immediately
  on the existing worker pool — no per-query actor spin-up — and the
  cache gives them the same build-once-per-worker amortization an
  actor's ``__init__`` would.

``cached_state(key, builder)`` memoizes per worker PROCESS (module
global), so repeated queries in one session and all tasks of one stage
share a single build. Keys must uniquely identify the state: use an
ObjectRef's hex for broadcast payloads (unique per ``ray.put``) or a
semantic key like an analyzer name for deterministic builds. The cache
is bounded: oldest entries evict past ``_MAX_ENTRIES`` (worker heaps
outlive queries; an unbounded cache would pin every model ever
broadcast).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable

_MAX_ENTRIES = 32
_CACHE: OrderedDict[Any, Any] = OrderedDict()


def cached_state(key: Any, builder: Callable[[], Any]) -> Any:
    """Build-once-per-worker memo: returns ``builder()``'s result,
    cached under ``key`` for the life of the worker process."""
    try:
        v = _CACHE[key]
        _CACHE.move_to_end(key)
        return v
    except KeyError:
        pass
    v = builder()
    _CACHE[key] = v
    if len(_CACHE) > _MAX_ENTRIES:
        _CACHE.popitem(last=False)
    return v

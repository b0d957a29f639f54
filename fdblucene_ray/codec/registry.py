"""Postings-codec selection (SURVEY.md §2.10 U3 — the Lucene Codec SPI
analog).

The reference inherits Lucene's codec framework (pom.xml pins Lucene
8.1.0 — Lucene50PostingsFormat); this engine's equivalent extension
point is a named codec recorded in the manifest and resolved through
this registry at read AND write time, so a future format (e.g.
PForDelta packed blocks, or a fixed-width fast-decode variant) slots in
without touching build/search/merge code:

    register_codec(MyCodec())          # new format
    build_index(..., codec="mine")     # write side
    # manifest records the name; readers resolve it on open

Three production codecs ship, sharing the block/skip/impact layout and
differing only in the integer-stream coding (codec/postings.py):

- ``varint-block`` (default): delta+LEB128-varint doc ids / tfs / pos
  gaps — the compact at-rest form, matching the north-star
  delta+varint posting format.
- ``fixed-block``: little-endian u32 streams — ~2-3x larger at rest,
  branch-free ``view('<u4')`` decode with zero bit-twiddling; a
  realistic choice when decode CPU dominates (merge-heavy maintenance
  tiers, hot in-memory segments).
- ``for-block``: frame-of-reference bit packing per 128-posting block
  (the PForDelta family — Zukowski et al. ICDE'06; the same
  block-max-width form Lucene84's PackedInts postings use) —
  densest at rest when deltas are small and uniform; chunks are
  self-describing so bulk gather-then-decode still works. Measured on
  a zipf-df 1.56M-posting partition: 11% smaller than varint-block at
  rest, ~2x encode / ~2.4x bulk-decode CPU (8-byte-window gather +
  shift-mask decode) — the cold-tier choice when storage dominates CPU.

Opening an index whose manifest names an unregistered codec fails
loudly (never silently misdecodes).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

from fdblucene_ray.codec import postings as _vb

DEFAULT_CODEC = "varint-block"


@dataclass(frozen=True)
class PostingsCodec:
    """The posting-list format contract. All functions share the
    signatures of the varint-block reference implementation."""

    name: str
    encode_partition: Callable
    decode_block: Callable
    decode_all: Callable
    decode_block_positions: Callable
    decode_all_positions: Callable
    bulk_decode_segment: Callable
    bulk_decode_segment_positions: Callable


_REGISTRY: dict[str, PostingsCodec] = {}


def register_codec(codec: PostingsCodec) -> None:
    if codec.name in _REGISTRY:
        raise ValueError(f"codec {codec.name!r} already registered")
    _REGISTRY[codec.name] = codec


def get_codec(name: str | None) -> PostingsCodec:
    name = name or DEFAULT_CODEC
    codec = _REGISTRY.get(name)
    if codec is None:
        raise ValueError(
            f"unknown postings codec {name!r} (registered: "
            f"{sorted(_REGISTRY)}); register it before opening this index"
        )
    return codec


def _make_codec(name: str, streams: str) -> PostingsCodec:
    return PostingsCodec(
        name=name,
        encode_partition=partial(_vb.encode_partition, streams=streams),
        decode_block=partial(_vb.decode_block, streams=streams),
        decode_all=partial(_vb.decode_all, streams=streams),
        decode_block_positions=partial(_vb.decode_block_positions, streams=streams),
        decode_all_positions=partial(_vb.decode_all_positions, streams=streams),
        bulk_decode_segment=partial(_vb.bulk_decode_segment, streams=streams),
        bulk_decode_segment_positions=partial(
            _vb.bulk_decode_segment_positions, streams=streams
        ),
    )


register_codec(_make_codec(DEFAULT_CODEC, "varint"))
register_codec(_make_codec("fixed-block", "fixed"))
register_codec(_make_codec("for-block", "pfor"))

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

One production codec ships: ``varint-block`` — delta+varint doc ids and
tfs, raw norms, fixed-size blocks with skip/impact metadata
(codec/postings.py). Opening an index whose manifest names an
unregistered codec fails loudly (never silently misdecodes).
"""

from __future__ import annotations

from dataclasses import dataclass
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


register_codec(
    PostingsCodec(
        name=DEFAULT_CODEC,
        encode_partition=_vb.encode_partition,
        decode_block=_vb.decode_block,
        decode_all=_vb.decode_all,
        decode_block_positions=_vb.decode_block_positions,
        decode_all_positions=_vb.decode_all_positions,
        bulk_decode_segment=_vb.bulk_decode_segment,
        bulk_decode_segment_positions=_vb.bulk_decode_segment_positions,
    )
)

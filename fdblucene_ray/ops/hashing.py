"""Deterministic vectorized hashing helpers (numpy uint64).

splitmix64-style finalizers — public-domain constructions (Steele et al.,
"Fast splittable pseudorandom number generators", OOPSLA 2014). Used for
shingle hashing, minhash permutations and simhash bit sampling; all pure
functions of the input so every retry/rerun is byte-identical.
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x += _GOLD
    x ^= x >> np.uint64(30)
    x *= _M1
    x ^= x >> np.uint64(27)
    x *= _M2
    x ^= x >> np.uint64(31)
    return x


def combine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive combine of two uint64 hash arrays."""
    return splitmix64(a ^ (b + _GOLD + (a << np.uint64(6)) + (a >> np.uint64(2))))


def hash_strings(arr) -> np.ndarray:
    """uint64 content hash of a pyarrow/py string sequence.

    Full 64-bit blake2b per *unique* value (dictionary-encoded first so
    repeated values hash once). Python-per-unique-value is the honest
    fallback absent a vectorized 64-bit string-hash kernel in pyarrow;
    at 10^12-doc scale swap in a vectorized xxhash64 over the Arrow
    buffers — the call sites only assume a deterministic uint64.
    """
    from hashlib import blake2b

    import pyarrow as pa

    def h64(s: str) -> int:
        return int.from_bytes(blake2b(s.encode(), digest_size=8).digest(), "little")

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.Array) and not isinstance(arr, pa.DictionaryArray):
        arr = arr.dictionary_encode()
    if isinstance(arr, pa.DictionaryArray):
        vocab = arr.dictionary.to_pylist()
        codes = arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        base = np.fromiter((h64(v) for v in vocab), dtype=np.uint64, count=len(vocab))
        return base[codes] if len(vocab) else np.empty(0, np.uint64)
    vals = list(arr)
    return np.fromiter((h64(str(v)) for v in vals), dtype=np.uint64, count=len(vals))


def content_digest(texts) -> tuple[np.ndarray, np.ndarray]:
    """(hash64, byte_len) per value — the exact-dedup grouping key.

    A pair collision requires identical 64-bit hash AND identical length;
    at 10^12 docs pair this with a second independent hash if needed.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lens = pc.binary_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    return hash_strings(texts), lens


def round_half_away(arr: np.ndarray, nd: int) -> np.ndarray:
    """Decimal rounding with ties AWAY from zero — DuckDB/SQL ``round``
    semantics. numpy/pandas round half-to-even, which disagrees with
    the oracle exactly when a value's decimal expansion terminates on
    the tie (dyadic rationals: 1/128 = 0.0078125 rounds to 0.007813 in
    SQL but 0.007812 under half-even)."""
    a = np.asarray(arr, np.float64)
    scale = 10.0 ** nd
    return np.sign(a) * np.floor(np.abs(a) * scale + 0.5) / scale


def part_of(keys: np.ndarray, num_parts: int) -> np.ndarray:
    """Shuffle partition of an int64/uint64 key column: ``splitmix64(key)
    % num_parts`` as int32. The hashed-partition idiom — group by the
    PARTITION (a few dozen keys) rather than the raw key (unbounded
    cardinality at corpus scale), then find key runs with a lexsort
    inside the single per-partition call."""
    return (splitmix64(keys.view(np.uint64)) % np.uint64(num_parts)).astype(
        np.int32
    )

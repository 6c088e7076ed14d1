"""Vectorized LEB128 varint codec for posting-list blocks.

Delta + varint docID compression per the north rule's
``(term, docID-delta varint blocks, tf, block-max score)`` structs.
Pure numpy (no per-value Python loop): the pack/unpack loops iterate
over *byte positions* (<= 10 rounds for uint64), not values.
"""

from __future__ import annotations

import numpy as np

_SEVEN = np.uint64(7)
_LOW7 = np.uint64(0x7F)


def varint_pack_with_lengths(values: np.ndarray):
    """Encode a uint64 array as concatenated LEB128 varints; returns
    (buffer bytes, per-value byte lengths). The lengths let a caller
    pack one big array per task and slice out sub-ranges (per posting
    block) without re-encoding."""
    a = np.asarray(values).astype(np.uint64)
    n = len(a)
    if n == 0:
        return b"", np.zeros(0, np.int64)
    nb = np.ones(n, np.int64)
    v = a >> _SEVEN
    while v.any():
        nb += (v > 0).astype(np.int64)
        v >>= _SEVEN
    starts = np.zeros(n, np.int64)
    starts[1:] = np.cumsum(nb)[:-1]
    out = np.zeros(int(nb.sum()), np.uint8)
    rem = a.copy()
    active = np.arange(n)
    k = 0
    while len(active):
        chunk = rem[active]
        byte = (chunk & _LOW7).astype(np.uint8)
        more = (chunk >> _SEVEN) > 0
        out[starts[active] + k] = byte | (more.astype(np.uint8) << 7)
        rem[active] = chunk >> _SEVEN
        active = active[more]
        k += 1
    return out.tobytes(), nb


def varint_pack(values: np.ndarray) -> bytes:
    """Encode a uint64 array as concatenated LEB128 varints."""
    a = np.asarray(values).astype(np.uint64)
    n = len(a)
    if n == 0:
        return b""
    nb = np.ones(n, np.int64)
    v = a >> _SEVEN
    while v.any():
        nb += (v > 0).astype(np.int64)
        v >>= _SEVEN
    starts = np.zeros(n, np.int64)
    starts[1:] = np.cumsum(nb)[:-1]
    out = np.zeros(int(nb.sum()), np.uint8)
    rem = a.copy()
    active = np.arange(n)
    k = 0
    while len(active):
        chunk = rem[active]
        byte = (chunk & _LOW7).astype(np.uint8)
        more = (chunk >> _SEVEN) > 0
        out[starts[active] + k] = byte | (more.astype(np.uint8) << 7)
        rem[active] = chunk >> _SEVEN
        active = active[more]
        k += 1
    return out.tobytes()


def varint_unpack(buf: bytes, count: int) -> np.ndarray:
    """Decode ``count`` LEB128 varints back into a uint64 array."""
    if count == 0:
        return np.zeros(0, np.uint64)
    b = np.frombuffer(buf, np.uint8)
    cont = (b & 0x80) > 0
    starts = np.ones(len(b), bool)
    starts[1:] = ~cont[:-1]
    gid = np.cumsum(starts) - 1  # value index per byte
    first_byte_at = np.flatnonzero(starts)
    if len(first_byte_at) != count:
        raise ValueError(f"expected {count} varints, found {len(first_byte_at)}")
    offset = np.arange(len(b)) - first_byte_at[gid]
    vals = np.zeros(count, np.uint64)
    np.add.at(
        vals,
        gid,
        (b & 0x7F).astype(np.uint64) << (offset.astype(np.uint64) * _SEVEN),
    )
    return vals

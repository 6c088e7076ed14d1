import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from distributedcodesearchengine_spark.operators.varint import (
    varint_pack,
    varint_unpack,
)


def test_roundtrip_basic():
    for arr in [
        [0], [1], [127], [128], [16383], [16384], [2**63, 2**64 - 1],
        [0, 1, 127, 128, 255, 300, 2**32, 2**50], list(range(1000)),
    ]:
        a = np.array(arr, dtype=np.uint64)
        assert (varint_unpack(varint_pack(a), len(a)) == a).all()


def test_empty():
    assert varint_pack(np.array([], dtype=np.uint64)) == b""
    assert len(varint_unpack(b"", 0)) == 0


def test_compactness():
    # small deltas must take 1 byte each
    a = np.arange(100, dtype=np.uint64)
    assert len(varint_pack(a)) == 100


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_roundtrip_property(xs):
    a = np.array(xs, dtype=np.uint64)
    assert (varint_unpack(varint_pack(a), len(a)) == a).all()

"""Codec round-trips — property-based (hypothesis) + edge cases."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from org_rdkit_lucene_spark.functions.codecs import (
    delta_decode,
    delta_encode,
    for_decode,
    for_encode,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(v)), v)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
@settings(max_examples=100, deadline=None)
def test_for_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(for_decode(for_encode(v)), v)


@given(st.sets(st.integers(min_value=0, max_value=10**13), max_size=300))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(ids):
    a = np.array(sorted(ids), dtype=np.int64)
    first, buf = delta_encode(a)
    assert np.array_equal(delta_decode(first, buf, len(a)), a)


def test_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0
    assert delta_encode(np.array([], dtype=np.int64)) == (0, b"")
    assert for_decode(for_encode(np.array([], dtype=np.uint64))).size == 0


def test_single_and_boundaries():
    for x in [0, 1, 127, 128, 16383, 16384, 2**62]:
        v = np.array([x], dtype=np.uint64)
        assert np.array_equal(varbyte_decode(varbyte_encode(v)), v)


def test_varbyte_decode_many_parity():
    """decode_ints_many == per-buffer decode_ints, bit-identical,
    including empty buffers and multi-byte values."""
    import numpy as np
    from org_rdkit_lucene_spark.functions.codecs import (
        decode_ints,
        decode_ints_many,
        encode_ints,
    )

    rng = np.random.default_rng(7)
    for codec in ("varbyte", "for"):
        bufs, expect = [], []
        for _ in range(137):
            n = int(rng.integers(0, 40))
            v = rng.integers(0, 2**40, size=n).astype(np.uint64)
            bufs.append(encode_ints(v, codec))
            expect.append(v)
        vals, counts = decode_ints_many(bufs, codec)
        assert counts.tolist() == [len(e) for e in expect]
        off = 0
        for buf, e in zip(bufs, expect):
            got = vals[off : off + len(e)]
            assert (got == decode_ints(buf, codec)).all()
            assert (got == e).all()
            off += len(e)
    assert decode_ints_many([], "varbyte")[0].size == 0

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


def test_varbyte_encode_segmented_parity():
    """Segmented encode == per-segment varbyte_encode concatenation
    (VByte encodes each value independently), including empty segments
    and multi-byte values; varbyte_decode_many round-trips the slices."""
    import numpy as np
    from org_rdkit_lucene_spark.functions.codecs import (
        varbyte_decode_many,
        varbyte_encode,
        varbyte_encode_segmented,
    )

    rng = np.random.default_rng(11)
    for _ in range(40):
        n_seg = int(rng.integers(1, 40))
        counts = rng.integers(0, 9, n_seg).astype(np.int64)
        vals = rng.integers(
            0, 1 << int(rng.integers(1, 40)), int(counts.sum())
        ).astype(np.uint64)
        buf, offs = varbyte_encode_segmented(vals, counts)
        assert len(offs) == n_seg + 1 and offs[-1] == len(buf)
        vs = np.concatenate(([0], np.cumsum(counts)))
        for i in range(n_seg):
            assert buf[offs[i] : offs[i + 1]] == varbyte_encode(
                vals[vs[i] : vs[i + 1]]
            )
        dec, cnt = varbyte_decode_many(
            [bytes(buf[offs[i] : offs[i + 1]]) for i in range(n_seg)]
        )
        assert (cnt == counts).all() and (dec == vals).all()
    # all-empty and fully-empty edges
    buf, offs = varbyte_encode_segmented(
        np.empty(0, dtype=np.uint64), np.zeros(3, dtype=np.int64)
    )
    assert buf == b"" and offs.tolist() == [0, 0, 0, 0]


def test_vb_positions_roundtrip_law():
    """vb_encode_positions ∘ vb_decode_fn is the identity on packed
    position lists — the writers' shuffle representation must restore
    the packed law exactly (ascending lists, first value absolute,
    gap deltas)."""
    import numpy as np
    import pyarrow as pa
    from org_rdkit_lucene_spark.operators.positions import (
        vb_decode_fn,
        vb_encode_positions,
    )

    rng = np.random.default_rng(5)
    lists = []
    for _ in range(500):
        n = int(rng.integers(1, 30))
        ps = np.unique(rng.integers(0, 10_000, n)).astype(np.int64)
        lists.append(ps)
    counts = np.array([len(x) for x in lists], dtype=np.int64)
    flat = np.concatenate(lists)
    arr = vb_encode_positions(flat, counts)
    rb = pa.RecordBatch.from_arrays(
        [
            pa.array(["t%d" % i for i in range(len(lists))], pa.string()),
            pa.array(np.arange(len(lists)), pa.int64()),
            arr,
        ],
        names=["term", "doc_id", "poss_vb"],
    )
    (out,) = list(vb_decode_fn()([rb]))
    got = out.column(2).to_pylist()
    assert got == [x.tolist() for x in lists]

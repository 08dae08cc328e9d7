"""Codec round-trip + property tests (hypothesis) — no Spark needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from glug_spark.index import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(codec.varbyte_decode(codec.varbyte_encode(arr)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True)
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.sort(np.array(ids, dtype=np.uint64))
    assert np.array_equal(codec.delta_decode(codec.delta_encode(arr)), arr)


def test_varbyte_sizes():
    assert codec.varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert codec.varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert codec.varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    # compression sanity: small gaps ≪ 8 bytes/posting
    gaps = np.ones(1000, dtype=np.uint64)
    assert len(codec.varbyte_encode(gaps)) == 1000


def test_positions_roundtrip():
    per_doc = [np.array([0, 5, 9], dtype=np.uint64),
               np.array([], dtype=np.uint64),
               np.array([3], dtype=np.uint64)]
    blob = codec.encode_positions(per_doc)
    tfs = np.array([3, 0, 1])
    out = codec.decode_positions(blob, tfs)
    for a, b in zip(per_doc, out):
        assert np.array_equal(a, b)


def test_block_meta():
    ids = np.arange(0, 300, dtype=np.int64)
    tfs = np.ones(300, dtype=np.int64)
    tfs[129] = 7
    last, max_tf = codec.block_meta(ids, tfs, block=128)
    assert list(last) == [127, 255, 299]
    assert list(max_tf) == [1, 7, 1]


def test_encode_decode_segment():
    rng = np.random.default_rng(42)
    doc_ids = np.sort(rng.choice(10**9, size=500, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=500).astype(np.int64)
    dls = rng.integers(10, 500, size=500).astype(np.int64)
    enc = codec.encode_segment(doc_ids, tfs, dls)
    d2, t2, l2 = codec.decode_segment(enc)
    assert np.array_equal(doc_ids, d2)
    assert np.array_equal(tfs, t2)
    assert np.array_equal(dls, l2)
    assert enc["df_local"] == 500
    # delta+varbyte beats raw 8-byte ids
    assert len(enc["doc_gaps"]) < 500 * 8


def test_decode_blocks_selective():
    rng = np.random.default_rng(7)
    n = 1000
    doc_ids = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, size=n).astype(np.int64)
    dls = rng.integers(10, 500, size=n).astype(np.int64)
    enc = codec.encode_segment(doc_ids, tfs, dls)
    n_blocks = len(enc["gap_offsets"])
    assert n_blocks == (n + codec.BLOCK - 1) // codec.BLOCK

    for blocks in ([0], [n_blocks - 1], [1, 3], list(range(n_blocks))):
        ids, t, l = codec.decode_blocks(enc, np.array(blocks))
        expect = np.concatenate(
            [doc_ids[b * codec.BLOCK : (b + 1) * codec.BLOCK] for b in blocks]
        )
        assert np.array_equal(ids, expect), blocks
        assert np.array_equal(
            t, np.concatenate([tfs[b * codec.BLOCK : (b + 1) * codec.BLOCK] for b in blocks])
        )
        assert np.array_equal(
            l, np.concatenate([dls[b * codec.BLOCK : (b + 1) * codec.BLOCK] for b in blocks])
        )


def test_decode_position_blocks_selective():
    rng = np.random.default_rng(11)
    n = 700
    doc_ids = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 6, size=n).astype(np.int64)
    dls = rng.integers(10, 500, size=n).astype(np.int64)
    plists = [
        np.sort(rng.choice(10**5, size=int(tf), replace=False)).astype(np.uint64)
        for tf in tfs
    ]
    enc = codec.encode_segment(doc_ids, tfs, dls, positions_per_doc=plists)
    n_blocks = len(enc["gap_offsets"])
    assert len(enc["pos_offsets"]) == n_blocks

    for blocks in ([0], [n_blocks - 1], [1, 4], list(range(n_blocks))):
        _, tf_sel, _ = codec.decode_blocks(enc, np.array(blocks))
        got = codec.decode_position_blocks(enc, blocks, tf_sel)
        want = [
            plists[i]
            for b in blocks
            for i in range(b * codec.BLOCK, min((b + 1) * codec.BLOCK, n))
        ]
        assert len(got) == len(want), blocks
        for g, w in zip(got, want):
            assert np.array_equal(g, w), blocks


def test_encode_runs_pos_offsets_match_encode_segment():
    rng = np.random.default_rng(13)
    n = 300
    codes = np.sort(rng.integers(0, 3, size=n)).astype(np.int64)
    doc_ids = np.zeros(n, dtype=np.int64)
    for c in np.unique(codes):
        m = codes == c
        doc_ids[m] = np.sort(rng.choice(10**6, size=int(m.sum()), replace=False))
    tfs = rng.integers(1, 5, size=n).astype(np.int64)
    dls = rng.integers(10, 99, size=n).astype(np.int64)
    plists = [
        np.sort(rng.choice(10**4, size=int(tf), replace=False)).astype(np.uint64)
        for tf in tfs
    ]
    flat = np.concatenate(plists).astype(np.uint64)
    runs = codec.encode_runs(codes, doc_ids, tfs, dls, flat)
    for run in runs:
        s = run.pop("run_start")
        e = s + run["df_local"]
        single = codec.encode_segment(
            doc_ids[s:e], tfs[s:e], dls[s:e], positions_per_doc=plists[s:e]
        )
        for key in ("doc_gaps", "tfs", "dls", "positions", "block_last",
                    "block_max_tf", "gap_offsets", "tf_offsets",
                    "dl_offsets", "pos_offsets"):
            assert run[key] == single[key], key


def test_segmented_abs_decode_matches_per_segment():
    """Global cumsum-with-restart decode == per-segment delta_decode."""
    rng = np.random.default_rng(5)
    segs = []
    for _ in range(20):
        n = int(rng.integers(1, 50))
        ids = np.unique(rng.integers(0, 10_000, n)).astype(np.uint64)
        segs.append(ids)
    deltas = np.concatenate([codec.delta_encode(s) for s in segs])
    counts = np.array([len(s) for s in segs], dtype=np.int64)
    got = codec.segmented_abs_decode(deltas, counts)
    expect = np.concatenate(segs)
    assert np.array_equal(got.astype(np.int64), expect.astype(np.int64))


def test_gather_segments():
    vals = np.arange(100, dtype=np.int64)
    starts = np.array([10, 50, 0], dtype=np.int64)
    lens = np.array([3, 0, 2], dtype=np.int64)
    got = codec.gather_segments(vals, starts, lens)
    assert got.tolist() == [10, 11, 12, 0, 1]
    # all-empty selection yields an empty slice of the same dtype
    empty = codec.gather_segments(vals, starts[:1], np.zeros(1, np.int64))
    assert len(empty) == 0 and empty.dtype == vals.dtype


def test_binary_stream_zero_copy_and_ndarray_decode():
    """binary_stream must return exactly the concatenation of the rows'
    blobs (including for a SLICED Arrow array with a nonzero offset),
    and varbyte_decode must accept the resulting uint8 ndarray."""
    import pyarrow as pa

    blobs = [codec.varbyte_encode(np.array([v], dtype=np.uint64))
             for v in (1, 300, 2**40, 7)]
    arr = pa.array(blobs, type=pa.binary())
    stream, offs = codec.binary_stream(arr)
    assert bytes(stream.tobytes()) == b"".join(blobs)
    assert offs[0] == 0 and offs[-1] == len(stream)
    vals = codec.varbyte_decode(stream)
    assert vals.tolist() == [1, 300, 2**40, 7]
    # sliced array: offsets re-based to the slice
    sl = arr.slice(1, 2)
    s2, o2 = codec.binary_stream(sl)
    assert bytes(s2.tobytes()) == b"".join(blobs[1:3])
    assert o2[0] == 0 and o2[-1] == len(s2)
    assert codec.varbyte_decode(s2).tolist() == [300, 2**40]
    # empty ndarray input
    assert len(codec.varbyte_decode(np.zeros(0, np.uint8))) == 0

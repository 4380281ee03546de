import numpy as np

from probe_ray.index.codec import (
    BLOCK,
    block_meta,
    decode_selected_blocks,
    decode_varint_deltas,
    encode_varint_deltas,
    merge_runs,
    pack_tf,
    unpack_tf,
)


def test_roundtrip_sizes():
    rng = np.random.default_rng(1)
    for n in [0, 1, 127, 128, 129, 1000, 50000]:
        ids = np.unique(rng.integers(0, 2**62, size=n, dtype=np.uint64)) if n else np.empty(0, np.uint64)
        buf = encode_varint_deltas(ids)
        assert np.array_equal(decode_varint_deltas(buf, len(ids)), ids)


def test_dense_compression():
    ids = np.arange(0, 300000, 3, dtype=np.uint64)
    buf = encode_varint_deltas(ids)
    assert len(buf) / len(ids) < 1.1  # ~1 byte per posting for dense lists


def test_selected_blocks():
    rng = np.random.default_rng(2)
    ids = np.unique(rng.integers(0, 2**40, size=5000, dtype=np.uint64))
    buf = encode_varint_deltas(ids)
    nb = (len(ids) + BLOCK - 1) // BLOCK
    sel = np.array([0, 3, nb - 1])
    got, pos = decode_selected_blocks(buf, len(ids), sel)
    exp_pos = np.concatenate(
        [np.arange(b * BLOCK, min((b + 1) * BLOCK, len(ids))) for b in sel]
    )
    assert np.array_equal(pos, exp_pos)
    assert np.array_equal(got, ids[exp_pos])


def test_tf_bitmap():
    rng = np.random.default_rng(3)
    tfs = rng.integers(1, 3, size=777)
    assert np.array_equal(unpack_tf(pack_tf(tfs), 777), tfs)


def test_merge_runs_ordered():
    a = np.array([1, 5, 9], np.uint64)
    b = np.array([2, 3, 10], np.uint64)
    ids, tfs = merge_runs([(a, np.array([1, 1, 2])), (b, np.array([2, 1, 1]))])
    assert ids.tolist() == [1, 2, 3, 5, 9, 10]
    assert tfs.tolist() == [1, 2, 1, 1, 2, 1]


def test_block_meta():
    last, maxtf = block_meta(
        np.arange(300, dtype=np.uint64), np.r_[np.ones(150), np.full(150, 2)]
    )
    assert np.frombuffer(last, np.uint64).tolist() == [127, 255, 299]
    assert np.frombuffer(maxtf, np.uint8).tolist() == [1, 2, 2]


def test_multi_codec_byte_identity():
    """encode_varint_deltas_multi / block_meta_multi must be byte-identical
    to the per-term functions (the index build uses the multi variants; the
    query path decodes with the single-posting layout)."""
    from probe_ray.index.codec import (
        block_meta_multi,
        encode_varint_deltas_multi,
    )

    rng = np.random.default_rng(11)
    arrays = []
    for ln in [1, 2, 127, 128, 129, 257, 1000, 3]:
        ids = np.sort(rng.choice(10**7, size=ln, replace=False)).astype(np.uint64)
        tfs = rng.integers(1, 3, size=ln).astype(np.uint8)
        arrays.append((ids, tfs))
    vals = np.concatenate([a[0] for a in arrays])
    tfs_all = np.concatenate([a[1] for a in arrays])
    lens = np.array([len(a[0]) for a in arrays])
    assert encode_varint_deltas_multi(vals, lens) == [
        encode_varint_deltas(a[0]) for a in arrays
    ]
    bl, bm = block_meta_multi(vals, tfs_all, lens)
    singles = [block_meta(a[0], a[1]) for a in arrays]
    assert bl == [s[0] for s in singles]
    assert bm == [s[1] for s in singles]
    # and decode round-trips per term
    for (ids, _), payload in zip(arrays, encode_varint_deltas_multi(vals, lens)):
        assert np.array_equal(decode_varint_deltas(payload, len(ids)), ids)


def test_varint_width_extremes():
    """9- and 10-byte varints (values >= 2^56 / 2^63): the threshold-based
    width computation must agree with the scalar encoder and round-trip."""
    from probe_ray.index.codec import encode_varint_deltas_multi

    ids = np.array(
        [0, 127, 128, 2**56 - 1, 2**56, 2**63 - 1, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    lens = np.array([len(ids)])
    multi = encode_varint_deltas_multi(ids, lens)
    assert multi == [encode_varint_deltas(ids)]
    assert np.array_equal(decode_varint_deltas(multi[0], len(ids)), ids)

"""Posting-list codec: delta + varint compression, tf bitmap, block-max metadata.

Pure numpy (vectorized, no per-element Python loops over postings). Postings
are sorted arrays of dense per-subshard local doc ids; deltas are small for
frequent terms, so LEB128 varints compress well (the north-star requirement:
"sorted, delta+varint-compressed posting lists with per-block max-score
metadata"). tf is 1 or 2 in this engine (deduplicated content tokens +
deduplicated path tokens, SURVEY H1), stored as a packed bitmap (bit = tf-1).

Block-max metadata: for each block of ``BLOCK`` postings, the last doc id and
the max tf; combined at query time with idf and the subshard's min doc_len
to form an upper score bound for block skipping (block-max WAND style).
"""

from __future__ import annotations

import numpy as np

BLOCK = 128


def encode_varint_deltas(doc_ids: np.ndarray) -> bytes:
    """LEB128-encode deltas of a sorted uint64/int64 array.

    Block-aligned: every BLOCK-th value is stored as an absolute value, so
    each block decodes independently (block byte offsets from
    block_offsets()) — required for block-max skipping to skip decode work,
    not just scoring work.
    """
    if len(doc_ids) == 0:
        return b""
    vals = np.asarray(doc_ids, dtype=np.uint64)
    deltas = np.empty_like(vals)
    deltas[0] = vals[0]
    np.subtract(vals[1:], vals[:-1], out=deltas[1:])
    deltas[BLOCK::BLOCK] = vals[BLOCK::BLOCK]  # absolute at block starts
    # bytes needed per value: ceil(bit_length/7), min 1
    bits = np.zeros(len(deltas), dtype=np.int64)
    tmp = deltas.copy()
    nonzero = tmp > 0
    while nonzero.any():
        bits[nonzero] += 1
        tmp >>= np.uint64(1)
        nonzero = tmp > 0
    nbytes = np.maximum((bits + 6) // 7, 1)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    maxb = int(nbytes.max())
    for k in range(maxb):
        sel = nbytes > k
        pos = starts[sel] + k
        payload = (deltas[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[sel] - 1 > k).astype(np.uint8) << 7
        out[pos] = payload.astype(np.uint8) | cont
    return out.tobytes()


def _decode_deltas(b: np.ndarray, n: int) -> np.ndarray:
    term_mask = b < 128
    value_id = np.zeros(len(b), dtype=np.int64)
    np.cumsum(term_mask[:-1], out=value_id[1:])
    starts = np.zeros(n, dtype=np.int64)
    idx = np.flatnonzero(term_mask)
    starts[1:] = idx[:-1] + 1
    offs = np.arange(len(b), dtype=np.int64) - starts[value_id]
    deltas = np.zeros(n, dtype=np.uint64)
    payload = (b & np.uint8(0x7F)).astype(np.uint64)
    for k in range(int(offs.max()) + 1):
        sel = offs == k
        deltas[value_id[sel]] |= payload[sel] << np.uint64(7 * k)
    return deltas


def _blocked_cumsum(deltas: np.ndarray) -> np.ndarray:
    """Cumulative sum restarting at every BLOCK boundary (block starts are
    absolute values)."""
    n = len(deltas)
    cs = np.cumsum(deltas, dtype=np.uint64)
    starts = np.arange(0, n, BLOCK)
    corrections = cs[starts] - deltas[starts]
    return cs - corrections[np.arange(n) // BLOCK]


def decode_varint_deltas(buf: bytes, n: int) -> np.ndarray:
    """Inverse of encode_varint_deltas; returns uint64 array of length n."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    return _blocked_cumsum(_decode_deltas(b, n))


def decode_selected_blocks(
    buf: bytes, n: int, blocks: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode only the given (sorted, unique) block indices.

    Returns (doc_ids, value_positions) where value_positions are the
    positions of the decoded values in the full posting (for tf lookup).
    The terminator scan is O(total bytes) (pure SIMD compare); the varint
    reassembly loop only touches selected blocks' bytes.
    """
    if n == 0 or len(blocks) == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8)
    ends = np.flatnonzero(b < 128)  # last byte of each value
    nblocks = (n + BLOCK - 1) // BLOCK
    blocks = np.asarray(blocks, dtype=np.int64)
    # decode RUNS of contiguous blocks in one vectorized pass each: with
    # impact-ordered ids the kept blocks are mostly the short-doc prefix,
    # so a 16k-block selection is a handful of runs, not 16k per-block
    # numpy-call sets (which dominated hot-NOT queries at 10M docs).
    # Within a run, every block starts with an ABSOLUTE value (delta
    # reset at block boundaries), so the segmented cumsum needs no
    # sequential fix-up: subtract, per block, the raw cumsum just before
    # its first value.
    run_heads = np.flatnonzero(np.r_[True, np.diff(blocks) > 1])
    run_ends = np.r_[run_heads[1:], len(blocks)]
    out_ids: list[np.ndarray] = []
    out_pos: list[np.ndarray] = []
    for rh, re_ in zip(run_heads, run_ends):
        v0 = int(blocks[rh]) * BLOCK
        v1 = min(int(blocks[re_ - 1]) * BLOCK + BLOCK, n)
        byte0 = 0 if v0 == 0 else int(ends[v0 - 1]) + 1
        byte1 = int(ends[v1 - 1]) + 1
        raw = _decode_deltas(b[byte0:byte1], v1 - v0)
        cum = np.cumsum(raw, dtype=np.uint64)
        starts = np.arange(0, v1 - v0, BLOCK, dtype=np.int64)
        sizes = np.minimum(starts + BLOCK, v1 - v0) - starts
        corr = np.where(starts > 0, cum[starts - 1], np.uint64(0))
        out_ids.append(cum - np.repeat(corr, sizes))
        out_pos.append(np.arange(v0, v1, dtype=np.int64))
    assert nblocks >= len(blocks)
    return np.concatenate(out_ids), np.concatenate(out_pos)


def encode_varint_deltas_multi(
    vals: np.ndarray, lens: np.ndarray
) -> list[bytes]:
    """Vectorized multi-posting encode: ``vals`` is the concatenation of
    per-term sorted id arrays with lengths ``lens``. Byte-identical to
    calling encode_varint_deltas per term (delta reset + absolute value at
    every per-term BLOCK boundary), but all numpy passes run once over the
    concatenation instead of once per term — the per-call overhead of
    ~10 numpy ops on tiny arrays dominates a per-term loop."""
    n = len(vals)
    if n == 0:
        return [b""] * len(lens)
    vals = np.asarray(vals, dtype=np.uint64)
    lens = np.asarray(lens, dtype=np.int64)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pos_in_term = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
    deltas = np.empty_like(vals)
    deltas[1:] = vals[1:] - vals[:-1]
    abs_mask = (pos_in_term % BLOCK) == 0
    deltas[abs_mask] = vals[abs_mask]
    # varint width: a value needs k bytes iff it is >= 2^(7(k-1)) (k>=2);
    # direct thresholds replace the former per-bit shift loop (<=9
    # full-array compares, early exit once max() is below the threshold)
    nbytes = np.ones(n, dtype=np.int64)
    dmax = int(deltas.max())
    for k in range(1, 10):
        if dmax < (1 << (7 * k)):
            break
        nbytes += deltas >= np.uint64(1 << (7 * k))
    ends = np.cumsum(nbytes)
    bstarts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for k in range(int(nbytes.max())):
        sel = nbytes > k
        pos = bstarts[sel] + k
        payload = (deltas[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[sel] - 1 > k).astype(np.uint8) << 7
        out[pos] = payload.astype(np.uint8) | cont
    term_b0 = bstarts[starts]
    term_b1 = ends[starts + lens - 1]
    return [out[a:b].tobytes() for a, b in zip(term_b0, term_b1)]


def block_meta_multi(
    vals: np.ndarray, tfs: np.ndarray, lens: np.ndarray, dls=None
):
    """Vectorized multi-posting block_meta over the concatenation.

    With ``dls`` (per-posting doc_len, aligned with ``vals``) also emits
    per-block MIN doc_len (uint32) — the block-bound tightener for hot
    terms: TF is capped at 2 so per-block max-tf is uniform on hot
    postings, but doc_len varies, and impact() is monotone decreasing in
    it, so impact(blk_max_tf, blk_min_dlen) beats the segment-global
    bound wherever a block holds only longer docs."""
    lens = np.asarray(lens, dtype=np.int64)
    n = len(vals)
    if n == 0:
        empty = [b""] * len(lens)
        return (empty, empty, list(empty)) if dls is not None else (empty, empty)
    vals = np.asarray(vals, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint8)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    nblocks = (lens + BLOCK - 1) // BLOCK
    # global start index of every block of every term
    blk_term = np.repeat(np.arange(len(lens)), nblocks)
    blk_idx = np.arange(len(blk_term)) - np.repeat(
        np.cumsum(nblocks) - nblocks, nblocks
    )
    blk_start = starts[blk_term] + blk_idx * BLOCK
    blk_end = np.minimum(blk_start + BLOCK, (starts + lens)[blk_term])
    last = vals[blk_end - 1]
    maxtf = np.maximum.reduceat(tfs, blk_start) if len(blk_start) else np.empty(0, np.uint8)
    # np.maximum.reduceat reduces [idx[i], idx[i+1]); our blocks are
    # contiguous and cover all values, so boundaries line up exactly
    blk_b = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(nblocks, out=blk_b[1:])
    maxtf = maxtf.astype(np.uint8, copy=False)
    out_last = [last[a:b].tobytes() for a, b in zip(blk_b[:-1], blk_b[1:])]
    out_maxtf = [maxtf[a:b].tobytes() for a, b in zip(blk_b[:-1], blk_b[1:])]
    if dls is None:
        return out_last, out_maxtf
    dls = np.asarray(dls)
    mindl = np.minimum.reduceat(dls, blk_start).astype(np.uint32)
    out_mindl = [mindl[a:b].tobytes() for a, b in zip(blk_b[:-1], blk_b[1:])]
    return out_last, out_maxtf, out_mindl


def pack_tf(tfs: np.ndarray) -> bytes:
    """tf in {1,2} -> bitmap (bit set => tf==2)."""
    return np.packbits((np.asarray(tfs) > 1).astype(np.uint8)).tobytes()


def pack_tf_multi(tfs: np.ndarray, lens: np.ndarray) -> list[bytes]:
    """Vectorized multi-posting pack_tf over the concatenation: each
    term's bitmap starts byte-aligned with zero padding at its tail, so
    every slice is byte-identical to ``pack_tf`` on that term alone."""
    lens = np.asarray(lens, dtype=np.int64)
    if len(lens) == 0:
        return []
    tfs = np.asarray(tfs)
    nb = (lens + 7) // 8
    byte_b = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(nb, out=byte_b[1:])
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pos_in_term = np.arange(len(tfs), dtype=np.int64) - np.repeat(starts, lens)
    bitpos = np.repeat(byte_b[:-1] * 8, lens) + pos_in_term
    bits = np.zeros(int(byte_b[-1]) * 8, dtype=np.uint8)
    bits[bitpos] = tfs > 1
    packed = np.packbits(bits)
    return [packed[a:b].tobytes() for a, b in zip(byte_b[:-1], byte_b[1:])]


def unpack_tf(buf: bytes, n: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n)
    return bits.astype(np.int64) + 1


def block_meta(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """Per-BLOCK (last_doc:uint64, max_tf:uint8) arrays, serialized."""
    n = len(doc_ids)
    if n == 0:
        return b"", b""
    nblocks = (n + BLOCK - 1) // BLOCK
    last = np.asarray(doc_ids, dtype=np.uint64)[
        np.minimum(np.arange(1, nblocks + 1) * BLOCK, n) - 1
    ]
    tfs = np.asarray(tfs, dtype=np.uint8)
    maxtf = np.array(
        [tfs[i * BLOCK : (i + 1) * BLOCK].max() for i in range(nblocks)],
        dtype=np.uint8,
    )
    return last.tobytes(), maxtf.tobytes()


def merge_runs(
    runs: list[tuple[np.ndarray, np.ndarray]],
) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted (doc_ids, tfs) runs into one sorted posting.

    Salted partial postings from the build shuffle interleave in doc-id
    space; a doc id appears in exactly one run, so a stable argsort of the
    concatenation is an ordered merge.
    """
    if len(runs) == 1:
        return runs[0]
    ids = np.concatenate([r[0] for r in runs])
    tfs = np.concatenate([r[1] for r in runs])
    order = np.argsort(ids, kind="stable")
    return ids[order], tfs[order]

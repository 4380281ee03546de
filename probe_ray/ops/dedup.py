"""Deduplication operators over the ``documents`` table.

Exact dedup = hash-partitioned groupby (one shuffle, pre-hashed map side).
MinHash+LSH = shingle -> minhash -> band-bucket groupby -> candidate pairs
-> exact-Jaccard verify (the standard near-dup pipeline at corpus scale:
only bucket-colliding pairs are verified, never all pairs).
SimHash = 64-bit hyperplane sketch, vectorized per batch.
N-gram Jaccard similarity join = token postings -> groupby(token) ->
pair counts -> sizes join (distributed set-similarity join)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_WS = re.compile(r"\s+")


def _read_documents(sf_dir: str, columns: list[str] | None = None):
    import ray.data

    # every dedup op consumes only (doc_id, text) — prune at the read
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=columns or ["doc_id", "text"]
    )


def _n_docs(sf_dir: str) -> int:
    from probe_ray.ops.sizing import table_rows

    return table_rows(sf_dir, "documents")


from probe_ray.ops.sizing import SHUFFLE_TARGET_BYTES, shuffle_parts as _shuffle_parts  # noqa: F401


def _sha256_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "sha": pa.array(
                [hashlib.sha256(t.encode()).hexdigest() for t in texts],
                pa.string(),
            ),
        }
    )


def exact_dedup_groups(sf_dir: str):
    """(sha, keeper_id, group_size): keeper = min doc_id per content hash.

    The exchange key is an int64 hash-partition of the sha, NOT the sha
    string itself: Ray's sort-based shuffle then compares 8-byte ints
    instead of 64-char hex strings, and each group resolves its own
    hashes with one dictionary-encode + lexsort (measured at 2M docs:
    60 s -> 23 s for the identical output)."""
    import ray.data

    n_parts = _shuffle_parts(_n_docs(sf_dir) * 96)

    def sha_part(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        shas = [hashlib.sha256(t.encode()).hexdigest() for t in texts]
        part = np.array(
            [int(s[:15], 16) % n_parts for s in shas], dtype=np.int64
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sha": pa.array(shas, pa.string()),
                "part": pa.array(part),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        sha = group.column("sha")
        if isinstance(sha, pa.ChunkedArray):
            sha = sha.combine_chunks()
        enc = sha.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        did = group.column("doc_id").to_numpy()
        order = np.lexsort((did, codes))
        c, d = codes[order], did[order]
        new = np.r_[True, c[1:] != c[:-1]] if c.size else np.array([], bool)
        starts = np.flatnonzero(new)
        sizes = np.diff(np.r_[starts, c.size]).astype(np.int64)
        return pa.table(
            {
                "sha": enc.dictionary.take(pa.array(c[starts])),
                "keeper_id": pa.array(d[starts]),
                "group_size": pa.array(sizes),
            }
        )

    return (
        _read_documents(sf_dir)
        .map_batches(sha_part, batch_format="pyarrow")
        .repartition(n_parts)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
    )


def exact_dedup_keep_first(sf_dir: str):
    """Deduplicated (keeper) doc ids only: (doc_id,) sorted ascending."""
    import pyarrow.compute as pc

    g = exact_dedup_groups(sf_dir)

    def pick(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("keeper_id")})

    return g.map_batches(pick, batch_format="pyarrow").sort("doc_id")


# --- MinHash + LSH ---------------------------------------------------------

N_PERM = 64
N_BANDS = 8  # 8 rows per band
_MERSENNE = (1 << 61) - 1
_rng = np.random.default_rng(12345)
_A = _rng.integers(1, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
_B = _rng.integers(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)


def _shingles(
    text: str, k: int = 3, cache: dict[str, int] | None = None
) -> np.ndarray:
    """Hashed k-token shingle set. ``cache`` (shingle -> hash) amortizes
    blake2b across the docs of one batch — near-duplicate docs share most
    shingles, so a dup-heavy corpus hashes each distinct shingle once."""
    toks = _WS.split(text.strip()) if text.strip() else []
    if len(toks) < k:
        grams = {" ".join(toks)} if toks else set()
    else:
        grams = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    if cache is None:
        it = (
            int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
            & _MERSENNE
            for g in grams
        )
        return np.fromiter(it, dtype=np.uint64, count=len(grams))
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        h = cache.get(g)
        if h is None:
            h = (
                int.from_bytes(
                    hashlib.blake2b(g.encode(), digest_size=8).digest(), "big"
                )
                & _MERSENNE
            )
            cache[g] = h
        out[i] = h
    return out


def _minhash(shingle_hashes: np.ndarray) -> np.ndarray:
    if len(shingle_hashes) == 0:
        return np.full(N_PERM, _MERSENNE, dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = (
            _A[None, :] * shingle_hashes[:, None] + _B[None, :]
        ) % np.uint64(_MERSENNE)
    return vals.min(axis=0)


def minhash_signatures(sf_dir: str):
    """(doc_id, sig: fixed list of N_PERM int64)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        cache: dict[str, int] = {}
        sigs = [
            _minhash(_shingles(t, cache=cache)).astype(np.int64) for t in texts
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig": pa.array(
                    [s.tolist() for s in sigs], pa.list_(pa.int64())
                ),
            }
        )

    return _read_documents(sf_dir).map_batches(fn, batch_format="pyarrow")


LSH_PARTITIONS = 64

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_MIX = np.uint64(0x9E3779B97F4A7C15)


def _sig_matrix(col: pa.ChunkedArray, width: int) -> np.ndarray:
    """list<int64> column of fixed-length signatures -> (n, width) array,
    via one offsets-respecting flatten (no per-row Python lists)."""
    arr = col.combine_chunks()
    return arr.flatten().to_numpy(zero_copy_only=False).reshape(-1, width)


def _band_buckets(sig_mat: np.ndarray) -> np.ndarray:
    """(n, N_PERM) signatures -> (n, N_BANDS) int64 band buckets in one
    vectorized FNV-style pass: each band's rows are folded into a salted
    63-bit mix, so equal (band, chunk) values collide — the only property
    LSH banding needs (cross-band collisions are ruled out by the band
    salt; spurious equal-hash collisions at 63 bits are negligible and
    in any case removed by the exact-verify stage)."""
    n = sig_mat.shape[0]
    rows = N_PERM // N_BANDS
    u = sig_mat.astype(np.uint64).reshape(n, N_BANDS, rows)
    with np.errstate(over="ignore"):
        h = np.full((n, N_BANDS), _FNV_OFFSET, dtype=np.uint64)
        h ^= np.arange(N_BANDS, dtype=np.uint64)[None, :]
        h *= _FNV_MIX
        for i in range(rows):
            h ^= u[:, :, i]
            h *= _FNV_MIX
            h ^= h >> np.uint64(29)
    return (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def _repeat_list_column(mat: np.ndarray, times: int) -> pa.Array:
    """Each row of ``mat`` repeated ``times`` consecutive rows, as a
    list<int64> column (the per-band copy of a doc's signature).
    Offsets are computed in int64 so a batch with > 2^31 total signature
    values cannot silently wrap, then cast back to the list<int64> type
    the downstream schema expects (cheap: offsets only)."""
    reps = np.repeat(mat, times, axis=0)
    offsets = np.arange(reps.shape[0] + 1, dtype=np.int64) * mat.shape[1]
    return pa.LargeListArray.from_arrays(
        pa.array(offsets), pa.array(reps.ravel(), pa.int64())
    ).cast(pa.list_(pa.int64()))


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.5):
    """Near-duplicate candidate pairs via LSH banding, verified with the
    minhash-estimated Jaccard: (a_id, b_id, est_sim_milli:int).

    The shuffle key is ``part = bucket % LSH_PARTITIONS`` — a bounded
    partition count — NOT the bucket itself: per-bucket groups are almost
    all singletons, and a group per bucket means one Python call per
    bucket (micro-group overhead that dies at corpus scale). Within a
    partition, equal-bucket runs are found by one vectorized sort."""
    sigs = minhash_signatures(sf_dir)

    def bands(batch: pa.Table) -> pa.Table:
        sig_mat = _sig_matrix(batch.column("sig"), N_PERM)
        buckets = _band_buckets(sig_mat).ravel()  # doc-major (n * N_BANDS)
        return pa.table(
            {
                "part": pa.array(buckets % LSH_PARTITIONS),
                "bucket": pa.array(buckets),
                "doc_id": pa.array(
                    np.repeat(batch.column("doc_id").to_numpy(), N_BANDS),
                    pa.int64(),
                ),
                "sig": _repeat_list_column(sig_mat, N_BANDS),
            }
        )

    banded = sigs.map_batches(bands, batch_format="pyarrow").repartition(
        _shuffle_parts(_n_docs(sf_dir) * N_BANDS * (N_PERM * 8 + 32))
    )

    def pairs(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("bucket", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(order)
        buckets = g.column("bucket").to_numpy()
        ids = g.column("doc_id").to_numpy()
        sig_mat = _sig_matrix(g.column("sig"), N_PERM)
        # run starts of equal-bucket spans
        starts = np.flatnonzero(np.r_[True, buckets[1:] != buckets[:-1]])
        ends = np.r_[starts[1:], len(buckets)]
        chunks: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            run_ids = ids[s:e]
            uniq, first_pos = np.unique(run_ids, return_index=True)
            if len(uniq) < 2:
                continue
            # all unique-doc pairs of the run at once (numpy, no loop)
            iu, ju = np.triu_indices(len(uniq), k=1)
            est = (
                sig_mat[s + first_pos[iu]] == sig_mat[s + first_pos[ju]]
            ).mean(axis=1)
            keep = est >= threshold
            if keep.any():
                chunks.append(
                    np.column_stack(
                        [
                            uniq[iu[keep]],
                            uniq[ju[keep]],
                            np.rint(est[keep] * 1000).astype(np.int64),
                        ]
                    )
                )
        if chunks:
            allp = np.concatenate(chunks)
            # dedup pairs colliding in several buckets of this partition
            order = np.lexsort((allp[:, 1], allp[:, 0]))
            allp = allp[order]
            first = np.r_[
                True,
                (allp[1:, 0] != allp[:-1, 0]) | (allp[1:, 1] != allp[:-1, 1]),
            ]
            allp = allp[first]
        else:
            allp = np.empty((0, 3), dtype=np.int64)
        return pa.table(
            {
                "a_id": pa.array(allp[:, 0], pa.int64()),
                "b_id": pa.array(allp[:, 1], pa.int64()),
                "est_sim_milli": pa.array(allp[:, 2], pa.int64()),
            }
        )

    cand = (
        banded.groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
        # candidate pairs are 24 B/row — coalesce the per-group micro-blocks
        # before the dedup shuffle (est: a few pairs per doc)
        .repartition(_shuffle_parts(_n_docs(sf_dir) * 96))
    )

    # distinct pairs (a pair can collide in buckets of different partitions)
    from ray.data.aggregate import Max

    agg = cand.groupby(["a_id", "b_id"]).aggregate(Max("est_sim_milli"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a_id": batch.column("a_id"),
                "b_id": batch.column("b_id"),
                "est_sim_milli": batch.column("max(est_sim_milli)"),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort(["a_id", "b_id"])


# Size-aware crossover for exact-Jaccard verification (same pattern as
# neardup_clusters' connected-components crossover): below these bounds
# the candidate pairs and their referenced docs are verified on the
# driver with one pushdown read — above them, the two-shuffle
# distributed verify runs. A dup-heavy 100-TB corpus takes the
# distributed branch; a bench/test corpus skips ~2 shuffle rounds.
VERIFY_DRIVER_PAIRS = 20_000
VERIFY_DRIVER_DOCS = 8_192


def _verify_pairs_driver(
    sf_dir: str, a: np.ndarray, b: np.ndarray, jaccard_threshold: float
) -> pa.Table:
    """Driver-side exact-Jaccard verify of a SMALL candidate pair set:
    pushdown-read only the referenced docs, shingle once per doc, verify
    in (a_id, b_id) order. Output is identical to the distributed path
    (same rounding, same sort)."""
    import pyarrow.dataset as pads

    sh: dict[int, np.ndarray] = {}
    if len(a):
        ids = np.unique(np.concatenate([a, b]))
        docs = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
            columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin(pa.array(ids.astype(np.int64))),
        )
        cache: dict[str, int] = {}
        for did, t in zip(
            docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
        ):
            sh[int(did)] = np.sort(_shingles(t, cache=cache))
    a_out, b_out, j_out = [], [], []
    for i in np.lexsort((b, a)):
        sa = sh.get(int(a[i]))
        sb = sh.get(int(b[i]))
        if sa is None or sb is None:
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        jac = (inter / union) if union else 1.0
        if jac >= jaccard_threshold:
            a_out.append(int(a[i]))
            b_out.append(int(b[i]))
            j_out.append(int(np.floor(jac * 1000 + 0.5)))
    return pa.table(
        {
            "a_id": pa.array(a_out, pa.int64()),
            "b_id": pa.array(b_out, pa.int64()),
            "jaccard_milli": pa.array(j_out, pa.int64()),
        }
    )


def minhash_verified_pairs(
    sf_dir: str, cand_threshold: float = 0.35, jaccard_threshold: float = 0.5
):
    """The full canonical near-dup pipeline: LSH candidates (estimated
    similarity >= cand_threshold) verified with EXACT shingle-set Jaccard —
    only bucket-colliding pairs are ever verified. Returns
    (a_id, b_id, jaccard_milli) with exact Jaccard >= jaccard_threshold.

    Fully distributed — the candidate set never materializes on the
    driver (on a heavy-dup corpus it is NOT tiny). Two bounded-partition
    shuffles:
      1. doc-keyed (dpart = doc_id % P): each doc's shingle set meets the
         candidate-pair requests that reference it (a union + groupby is
         the repartition join), emitting one (pair, side, shingles) row
         per request;
      2. pair-keyed (ppart = hash(a,b) % P): both sides of a pair land in
         one group; equal-pair runs are found by one vectorized sort and
         verified with exact sorted-array intersection.
    Shuffle volume is one pass of shingle data + O(candidate pairs)."""
    import ray.data

    cand = minhash_lsh_pairs(sf_dir, threshold=cand_threshold).materialize()
    if cand.count() <= VERIFY_DRIVER_PAIRS:
        parts = [pa.table(x) for x in cand.iter_batches(batch_format="pyarrow")]
        tb = (
            pa.concat_tables(parts)
            if parts
            else pa.table({"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())})
        )
        a = tb.column("a_id").to_numpy()
        b = tb.column("b_id").to_numpy()
        n_docs = len(np.unique(np.concatenate([a, b]))) if len(a) else 0
        if n_docs <= VERIFY_DRIVER_DOCS:
            return ray.data.from_arrow(
                _verify_pairs_driver(sf_dir, a, b, jaccard_threshold)
            )

    def requests(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        doc = np.concatenate([a, b])
        pa_ids = np.concatenate([a, a])
        pb_ids = np.concatenate([b, b])
        return pa.table(
            {
                "dpart": pa.array(doc % LSH_PARTITIONS),
                "doc_id": pa.array(doc, pa.int64()),
                "a_id": pa.array(pa_ids, pa.int64()),
                "b_id": pa.array(pb_ids, pa.int64()),
                "shingles": pa.array([[]] * len(doc), pa.list_(pa.uint64())),
            }
        )

    req = cand.map_batches(requests, batch_format="pyarrow")

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        cache: dict[str, int] = {}
        shs = [
            sorted(_shingles(t, cache=cache).tolist())
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "dpart": pa.array(ids % LSH_PARTITIONS),
                "doc_id": pa.array(ids, pa.int64()),
                "a_id": pa.array(np.full(len(ids), -1), pa.int64()),
                "b_id": pa.array(np.full(len(ids), -1), pa.int64()),
                "shingles": pa.array(shs, pa.list_(pa.uint64())),
            }
        )

    docs_sh = _read_documents(sf_dir).map_batches(
        shingle_rows, batch_format="pyarrow"
    )

    def attach(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_doc = pc.equal(group.column("a_id"), -1)
        doc_rows = group.filter(is_doc)
        req_rows = group.filter(pc.invert(is_doc))
        if req_rows.num_rows == 0:
            return pa.table(
                {
                    "ppart": pa.array([], pa.int64()),
                    "a_id": pa.array([], pa.int64()),
                    "b_id": pa.array([], pa.int64()),
                    "shingles": pa.array([], pa.list_(pa.uint64())),
                }
            )
        sh = dict(
            zip(
                doc_rows.column("doc_id").to_pylist(),
                doc_rows.column("shingles").to_pylist(),
            )
        )
        a = req_rows.column("a_id").to_numpy()
        b = req_rows.column("b_id").to_numpy()
        ppart = ((a * 1_000_003 + b) % LSH_PARTITIONS).astype(np.int64)
        return pa.table(
            {
                "ppart": pa.array(ppart),
                "a_id": pa.array(a, pa.int64()),
                "b_id": pa.array(b, pa.int64()),
                "shingles": pa.array(
                    [sh.get(d, []) for d in req_rows.column("doc_id").to_pylist()],
                    pa.list_(pa.uint64()),
                ),
            }
        )

    sided = (
        req.union(docs_sh)
        # shingle rows dominate: ~8 B per shingle hash per doc
        .repartition(_shuffle_parts(_n_docs(sf_dir) * 768))
        .groupby("dpart")
        .map_groups(attach, batch_format="pyarrow")
    )

    def verify(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("a_id", "ascending"), ("b_id", "ascending")]
        )
        g = group.take(order)
        a = g.column("a_id").to_numpy()
        b = g.column("b_id").to_numpy()
        shs = g.column("shingles").to_pylist()
        starts = np.flatnonzero(np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        ends = np.r_[starts[1:], len(a)]
        a_out, b_out, j_out = [], [], []
        for s, e in zip(starts, ends):
            if e - s != 2:  # pair needs exactly both sides' shingle rows
                continue
            sa = np.asarray(shs[s], dtype=np.uint64)
            sb = np.asarray(shs[s + 1], dtype=np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            jac = (inter / union) if union else 1.0
            if jac >= jaccard_threshold:
                a_out.append(int(a[s]))
                b_out.append(int(b[s]))
                j_out.append(int(np.floor(jac * 1000 + 0.5)))
        return pa.table(
            {
                "a_id": pa.array(a_out, pa.int64()),
                "b_id": pa.array(b_out, pa.int64()),
                "jaccard_milli": pa.array(j_out, pa.int64()),
            }
        )

    return (
        sided.repartition(_shuffle_parts(_n_docs(sf_dir) * 768))
        .groupby("ppart")
        .map_groups(verify, batch_format="pyarrow")
        .sort(["a_id", "b_id"])
    )


_POW2 = (np.uint64(1) << np.arange(64, dtype=np.uint64))
_POPCNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def simhash(sf_dir: str):
    """64-bit SimHash over whitespace tokens: (doc_id, simhash).

    Vectorized per batch: each DISTINCT token in the batch is hashed
    once (corpus vocabularies are tiny relative to token counts), its
    64-bit pattern unpacked to a +/-1 sign matrix once, and each doc's
    accumulator is a single (distinct-tokens) x (64) matvec weighted by
    per-doc token counts — no per-token Python loop in the hot path.
    Bit-identical to the scalar definition (bit b set iff acc[b] > 0,
    masked to 63 bits)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        doc_toks = [
            _WS.split(t.strip()) if t.strip() else [] for t in texts
        ]
        vocab: dict[str, int] = {}
        flat_idx = []
        doc_bounds = [0]
        for toks in doc_toks:
            for tok in toks:
                j = vocab.get(tok)
                if j is None:
                    j = len(vocab)
                    vocab[tok] = j
                flat_idx.append(j)
            doc_bounds.append(len(flat_idx))
        # one blake2b per distinct token in the batch
        hashes = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
                )
                for tok in vocab
            ),
            dtype=np.uint64,
            count=len(vocab),
        )
        # (V, 64) sign matrix: +1 where bit set, -1 otherwise
        signs = (
            ((hashes[:, None] & _POW2[None, :]) != 0).astype(np.int64) * 2 - 1
        )
        flat = np.asarray(flat_idx, dtype=np.int64)
        out = np.zeros(len(texts), dtype=np.int64)
        for i in range(len(texts)):
            seg = flat[doc_bounds[i] : doc_bounds[i + 1]]
            if len(seg) == 0:
                continue
            u, c = np.unique(seg, return_counts=True)
            acc = c @ signs[u]  # (64,) weighted sign sum
            val = int(((acc > 0).astype(np.uint64) * _POW2).sum())
            out[i] = val & 0x7FFFFFFFFFFFFFFF
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(out, pa.int64()),
            }
        )

    return _read_documents(sf_dir).map_batches(fn, batch_format="pyarrow")


def simhash_neardup_pairs(sf_dir: str, max_hamming: int = 12):
    """SimHash near-duplicate pairs: candidates = docs sharing any 16-bit
    band of their 64-bit sketch (a doc within hamming distance d of
    another shares at least one of 4 bands when d <= 3x16... pigeonhole:
    d < 4 guarantees a shared band; larger d is best-effort recall),
    verified by exact hamming distance <= max_hamming.
    Returns (a_id, b_id, hamming)."""
    sigs = simhash(sf_dir)

    def bands(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        h = batch.column("simhash").to_numpy().astype(np.uint64)
        out_part, out_key, out_id, out_hash = [], [], [], []
        for b in range(4):
            chunk = ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(
                np.int64
            )
            key = (chunk << 2) | b  # band-tagged bucket
            out_part.append(key % LSH_PARTITIONS)
            out_key.append(key)
            out_id.append(ids)
            out_hash.append(h.astype(np.int64))
        return pa.table(
            {
                "part": pa.array(np.concatenate(out_part)),
                "bucket": pa.array(np.concatenate(out_key)),
                "doc_id": pa.array(np.concatenate(out_id)),
                "simhash": pa.array(np.concatenate(out_hash)),
            }
        )

    banded = sigs.map_batches(bands, batch_format="pyarrow").repartition(
        _shuffle_parts(_n_docs(sf_dir) * 4 * 32)
    )

    def pairs(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("bucket", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(order)
        buckets = g.column("bucket").to_numpy()
        ids = g.column("doc_id").to_numpy()
        hs = g.column("simhash").to_numpy().astype(np.uint64)
        starts = np.flatnonzero(np.r_[True, buckets[1:] != buckets[:-1]])
        ends = np.r_[starts[1:], len(buckets)]
        chunks: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            run_ids = ids[s:e]
            uniq, first_pos = np.unique(run_ids, return_index=True)
            if len(uniq) < 2:
                continue
            iu, ju = np.triu_indices(len(uniq), k=1)
            x = hs[s + first_pos[iu]] ^ hs[s + first_pos[ju]]
            # vectorized 64-bit popcount via byte LUT
            d = _POPCNT[x.view(np.uint8).reshape(len(x), 8)].sum(
                axis=1, dtype=np.int64
            )
            keep = d <= max_hamming
            if keep.any():
                chunks.append(
                    np.column_stack([uniq[iu[keep]], uniq[ju[keep]], d[keep]])
                )
        if chunks:
            allp = np.concatenate(chunks)
            order = np.lexsort((allp[:, 1], allp[:, 0]))
            allp = allp[order]
            first = np.r_[
                True,
                (allp[1:, 0] != allp[:-1, 0]) | (allp[1:, 1] != allp[:-1, 1]),
            ]
            allp = allp[first]
        else:
            allp = np.empty((0, 3), dtype=np.int64)
        return pa.table(
            {
                "a_id": pa.array(allp[:, 0], pa.int64()),
                "b_id": pa.array(allp[:, 1], pa.int64()),
                "hamming": pa.array(allp[:, 2], pa.int64()),
            }
        )

    from ray.data.aggregate import Min

    cand = (
        banded.groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
        .repartition(_shuffle_parts(_n_docs(sf_dir) * 96))
    )
    agg = cand.groupby(["a_id", "b_id"]).aggregate(Min("hamming"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a_id": batch.column("a_id"),
                "b_id": batch.column("b_id"),
                "hamming": batch.column("min(hamming)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort(["a_id", "b_id"])


# Edge-count crossover for connected components: below this the whole
# edge set is collected and solved with driver union-find (one pass, no
# per-iteration shuffle barriers); above it the distributed min-label
# propagation runs. Same crossover idiom as the dictionary build
# (index/build.py DICT_DRIVER_MAX_ROWS) — the expensive, corpus-sized
# stage (pair generation) is always distributed; only the graph solve
# switches representation by size.
DRIVER_CC_MAX_EDGES = 5_000_000


def _driver_union_find(
    ids: np.ndarray, a: np.ndarray, b: np.ndarray
) -> pa.Table:
    """Exact min-reachable-label components on the driver. Union-by-min
    keeps every root the minimum of its component, so find(x) after all
    unions IS the cluster label the label-propagation path converges to."""
    parent = {int(i): int(i) for i in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        if x in parent and y in parent:
            rx, ry = find(x), find(y)
            if rx != ry:
                if rx < ry:
                    parent[ry] = rx
                else:
                    parent[rx] = ry
    ids_sorted = np.sort(ids).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids_sorted),
            "cluster_id": pa.array(
                [find(int(i)) for i in ids_sorted], pa.int64()
            ),
        }
    )


def neardup_clusters(sf_dir: str, max_doc_id: int = 50, min_inter: int = 5):
    """Near-duplicate CLUSTERS: connected components over the n-gram
    Jaccard similarity graph (edges = ngram_jaccard_pairs). Returns
    (doc_id, cluster_id) for every doc_id < max_doc_id, cluster_id =
    min doc_id reachable.

    The pair-generation stage is always distributed. The graph solve is
    size-aware: an edge set under DRIVER_CC_MAX_EDGES (the common case —
    near-dup graphs are sparse) is solved with one-pass driver
    union-find; larger graphs run distributed min-label propagation
    where each iteration is two bounded-partition shuffles (the
    union+groupby repartition-join shape used across this module):
      1. edge messages: edges meet labels on src % P -> (dst, src_label)
      2. label update: messages meet labels on node % P -> new label =
         min(old, incoming), plus a changed flag
    Convergence (no label changed) is checked with a tiny aggregate per
    iteration; iterations are bounded by the graph diameter, and every
    shuffle ships only (node, label) pairs — never document content.
    Both paths produce identical tables (tests/test_ops_oracle.py)."""
    import ray.data

    edges_src = ngram_jaccard_pairs(sf_dir, max_doc_id, min_inter)
    if not isinstance(edges_src, pa.Table):
        edges_src = edges_src.materialize()
        n_edges = edges_src.count()
    else:
        n_edges = edges_src.num_rows

    if n_edges <= DRIVER_CC_MAX_EDGES:
        if not isinstance(edges_src, pa.Table):
            edges_src = pa.concat_tables(
                [
                    pa.table(bt)
                    for bt in edges_src.iter_batches(batch_format="pyarrow")
                ]
            )
        uni = pa.concat_tables(
            [
                pa.table(bt)
                for bt in _read_documents(sf_dir, ["doc_id"])
                .filter(expr=f"doc_id < {max_doc_id}")
                .iter_batches(batch_format="pyarrow")
            ]
        )
        ids = np.unique(uni.column("doc_id").to_numpy())
        return ray.data.from_arrow(
            _driver_union_find(
                ids,
                edges_src.column("a_id").to_numpy(),
                edges_src.column("b_id").to_numpy(),
            )
        )

    def edge_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        # both directions; tiny per-row payload
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table(
            {
                "part": pa.array(src % LSH_PARTITIONS),
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "label": pa.array(np.full(len(src), -1), pa.int64()),
                "is_label": pa.array(np.zeros(len(src), dtype=np.int64)),
            }
        )

    if isinstance(edges_src, pa.Table):
        edges_src = ray.data.from_arrow(edges_src)
    edges = edges_src.map_batches(
        edge_rows, batch_format="pyarrow"
    ).materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        keep = ids < max_doc_id
        ids = ids[keep]
        return pa.table(
            {
                "part": pa.array(ids % LSH_PARTITIONS),
                "src": pa.array(ids, pa.int64()),
                "dst": pa.array(np.full(len(ids), -1), pa.int64()),
                "label": pa.array(ids, pa.int64()),
                "is_label": pa.array(np.ones(len(ids), dtype=np.int64)),
            }
        )

    labels = (
        _read_documents(sf_dir)
        .map_batches(init_labels, batch_format="pyarrow")
        .materialize()
    )

    def messages(group: pa.Table) -> pa.Table:
        is_lab = group.column("is_label").to_numpy() == 1
        node = group.column("src").to_numpy()
        lab = group.column("label").to_numpy()
        dsts = group.column("dst").to_numpy()[~is_lab]
        srcs = node[~is_lab]
        # vectorized src -> label lookup via sorted search
        order2 = np.argsort(node[is_lab], kind="stable")
        ln = node[is_lab][order2]
        lv = lab[is_lab][order2]
        if len(ln) == 0 or len(srcs) == 0:
            arr_d = np.array([], dtype=np.int64)
            out_l = np.array([], dtype=np.int64)
        else:
            pos = np.searchsorted(ln, srcs)
            pos_c = np.minimum(pos, len(ln) - 1)
            valid = (pos < len(ln)) & (ln[pos_c] == srcs)
            arr_d = dsts[valid]
            out_l = lv[pos[valid]]
        return pa.table(
            {
                "part": pa.array(arr_d % LSH_PARTITIONS),
                "node": pa.array(arr_d, pa.int64()),
                "label": pa.array(out_l, pa.int64()),
                "is_label": pa.array(np.zeros(len(arr_d), dtype=np.int64)),
            }
        )

    def update(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("node", "ascending"), ("label", "ascending")]
        )
        g = group.take(order)
        node = g.column("node").to_numpy()
        lab = g.column("label").to_numpy()
        is_lab = g.column("is_label").to_numpy() == 1
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        ends = np.r_[starts[1:], len(node)]
        out_n, out_l, out_c = [], [], []
        for s, e in zip(starts, ends):
            if not is_lab[s:e].any():
                continue  # message to a node outside the universe
            old = int(lab[s:e][is_lab[s:e]].min())
            new = int(lab[s])  # sorted -> min candidate first
            out_n.append(int(node[s]))
            out_l.append(min(old, new))
            out_c.append(int(min(old, new) < old))
        arr_n = np.asarray(out_n, dtype=np.int64)
        return pa.table(
            {
                "part": pa.array(arr_n % LSH_PARTITIONS),
                "src": pa.array(arr_n),
                "dst": pa.array(np.full(len(out_n), -1), pa.int64()),
                "label": pa.array(out_l, pa.int64()),
                "is_label": pa.array(np.ones(len(out_n), dtype=np.int64)),
                "changed": pa.array(out_c, pa.int64()),
            }
        )

    for _ in range(32):  # bounded by graph diameter; tiny graphs converge fast
        msgs = edges.union(labels).groupby("part").map_groups(
            messages, batch_format="pyarrow"
        )

        def relabel(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "part": batch.column("part"),
                    "node": batch.column("src"),
                    "label": batch.column("label"),
                    "is_label": batch.column("is_label"),
                }
            )

        new_labels = (
            labels.map_batches(relabel, batch_format="pyarrow")
            .union(msgs)
            .groupby("part")
            .map_groups(update, batch_format="pyarrow")
            .materialize()
        )
        changed = new_labels.sum("changed")
        labels = new_labels.drop_columns(["changed"]).materialize()
        if not changed:
            break

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("src"),
                "cluster_id": batch.column("label"),
            }
        )

    return labels.map_batches(finish, batch_format="pyarrow").sort("doc_id")


#: Tokens whose document frequency exceeds this cap are skipped during pair
#: emission: a token in df docs emits df^2/2 pairs, so one hot token (a
#: stopword present in every doc) is quadratic in corpus size. Tokens this
#: common carry almost no similarity signal (they are in *everyone's* set),
#: and classic prefix/frequency filtering drops them for the same reason.
#: The default is far above any df reachable at the driver's max_doc_id=50
#: gate, so CORRECTNESS results are exact; at web scale callers lower it.
NGRAM_DF_CAP = 10_000


def ngram_jaccard_pairs(
    sf_dir: str,
    max_doc_id: int = 50,
    min_inter: int = 5,
    df_cap: int = NGRAM_DF_CAP,
):
    """Distributed set-similarity join on whitespace-token sets for
    doc_id < max_doc_id: (a_id, b_id, inter_count, a_size, b_size).

    Token postings -> groupby(token) -> per-token pair emission ->
    groupby(pair) count. Each posting row carries its doc's set size, so
    sizes travel through the shuffle with the data — no driver-side size
    map (at 10^12 docs a broadcast dict of every doc's size cannot fit on
    the driver; a per-row column costs 8 B and nothing else).

    ``df_cap`` bounds the one quadratic stage: a token present in df docs
    emits df*(df-1)/2 pairs, so runs longer than the cap are skipped
    entirely (see NGRAM_DF_CAP). With the cap, per-group work is
    O(postings + pairs_emitted) with pairs_emitted <= df_cap * postings."""
    import ray.data
    from ray.data.aggregate import Max, Sum

    docs = _read_documents(sf_dir).filter(
        expr=f"doc_id < {max_doc_id}"
    )

    def tokens(batch: pa.Table) -> pa.Table:
        """Vectorized posting extraction: split -> flatten -> per-doc set
        dedupe via one np.unique over (doc, token-code) keys. No Python
        loop over rows; blake-free crc32 runs once per *distinct* token."""
        import zlib

        import pyarrow.compute as pc

        txt = pc.utf8_trim_whitespace(
            batch.column("text").combine_chunks().cast(pa.string())
        )
        lists = pc.split_pattern_regex(txt, pattern=r"\s+")
        flat = lists.flatten()
        # parent doc index for every flattened token
        counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        parents = np.repeat(np.arange(len(lists), dtype=np.int64), counts)
        # drop the empty token a fully-blank doc yields
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not nonempty.all():
            parents = parents[nonempty]
            flat = flat.filter(pa.array(nonempty))
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        # unique (doc, token) pairs in one shot
        key = parents * np.int64(len(vocab) + 1) + codes
        uniq, first = np.unique(key, return_index=True)
        u_parents = parents[first]
        u_codes = codes[first]
        # set size per doc = distinct tokens per parent
        sizes = np.bincount(u_parents, minlength=len(lists))
        doc_ids = batch.column("doc_id").to_numpy()
        part_by_code = np.fromiter(
            (zlib.crc32(t.encode()) & (LSH_PARTITIONS - 1) for t in vocab.to_pylist()),
            dtype=np.int64,
            count=len(vocab),
        )
        return pa.table(
            {
                "part": pa.array(part_by_code[u_codes]),
                "tok": vocab.take(pa.array(u_codes)),
                "doc_id": pa.array(doc_ids[u_parents], pa.int64()),
                "size": pa.array(sizes[u_parents], pa.int64()),
            }
        )

    posting = (
        docs.map_batches(tokens, batch_format="pyarrow")
        # postings are ~32 B + token text per row, max_doc_id docs
        .repartition(_shuffle_parts(max_doc_id * 4096))
    )

    def pairs(group: pa.Table) -> pa.Table:
        """One group = one token partition; equal-token runs found by one
        vectorized sort, pairs emitted per run with np.triu_indices (no
        Python double loop), runs longer than df_cap skipped."""
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("tok", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(order)
        tok = g.column("tok").combine_chunks()
        ids = g.column("doc_id").to_numpy()
        szs = g.column("size").to_numpy()
        n = len(tok)
        if n == 0:
            return pa.table(
                {
                    "a_id": pa.array([], pa.int64()),
                    "b_id": pa.array([], pa.int64()),
                    "a_sz": pa.array([], pa.int64()),
                    "b_sz": pa.array([], pa.int64()),
                    "one": pa.array([], pa.int64()),
                }
            )
        neq = pc.not_equal(tok.slice(1), tok.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.flatnonzero(np.r_[True, neq])
        lens = np.r_[starts[1:], n] - starts
        keep = (lens >= 2) & (lens <= df_cap)
        a_parts, b_parts, asz_parts, bsz_parts = [], [], [], []
        for s, ln in zip(starts[keep], lens[keep]):
            iu, ju = np.triu_indices(int(ln), k=1)
            run = ids[s : s + ln]
            rsz = szs[s : s + ln]
            a_parts.append(run[iu])
            b_parts.append(run[ju])
            asz_parts.append(rsz[iu])
            bsz_parts.append(rsz[ju])
        if a_parts:
            a = np.concatenate(a_parts)
            b = np.concatenate(b_parts)
            asz = np.concatenate(asz_parts)
            bsz = np.concatenate(bsz_parts)
        else:
            a = b = asz = bsz = np.array([], dtype=np.int64)
        return pa.table(
            {
                "a_id": pa.array(a, pa.int64()),
                "b_id": pa.array(b, pa.int64()),
                "a_sz": pa.array(asz, pa.int64()),
                "b_sz": pa.array(bsz, pa.int64()),
                "one": pa.array(np.ones(len(a), dtype=np.int64)),
            }
        )

    counted = (
        posting.groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["a_id", "b_id"])
        # sizes are constant per pair; Max is just "pick one"
        .aggregate(Sum("one"), Max("a_sz"), Max("b_sz"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        inter = batch.column("sum(one)").to_numpy()
        keep = inter >= min_inter
        t = pa.table(
            {
                "a_id": batch.column("a_id"),
                "b_id": batch.column("b_id"),
                "inter_count": batch.column("sum(one)"),
                "a_size": batch.column("max(a_sz)"),
                "b_size": batch.column("max(b_sz)"),
            }
        )
        return t.filter(pa.array(keep))

    return counted.map_batches(finish, batch_format="pyarrow").sort(
        ["a_id", "b_id"]
    )

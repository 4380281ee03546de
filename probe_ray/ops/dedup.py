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


def _read_documents(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


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
    """(sha, keeper_id, group_size): keeper = min doc_id per content hash."""
    import ray.data
    from ray.data.aggregate import Count, Min

    ds = _read_documents(sf_dir).map_batches(
        _sha256_batch, batch_format="pyarrow"
    )
    agg = ds.groupby("sha").aggregate(Min("doc_id"), Count())

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "sha": batch.column("sha"),
                "keeper_id": batch.column("min(doc_id)"),
                "group_size": batch.column("count()").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


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


def _shingles(text: str, k: int = 3) -> np.ndarray:
    toks = _WS.split(text.strip()) if text.strip() else []
    if len(toks) < k:
        grams = {" ".join(toks)} if toks else set()
    else:
        grams = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    out = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
            & _MERSENNE
            for g in grams
        ),
        dtype=np.uint64,
        count=len(grams),
    )
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
        sigs = [
            _minhash(_shingles(t)).astype(np.int64) for t in texts
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


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.5):
    """Near-duplicate candidate pairs via LSH banding, verified with the
    minhash-estimated Jaccard: (a_id, b_id, est_sim_milli:int)."""
    sigs = minhash_signatures(sf_dir)

    def bands(batch: pa.Table) -> pa.Table:
        out_bucket, out_doc, out_sig = [], [], []
        doc_ids = batch.column("doc_id").to_pylist()
        sig_list = batch.column("sig").to_pylist()
        rows_per_band = N_PERM // N_BANDS
        for did, sig in zip(doc_ids, sig_list):
            for b in range(N_BANDS):
                chunk = tuple(sig[b * rows_per_band : (b + 1) * rows_per_band])
                bucket = hashlib.blake2b(
                    (str(b) + ":" + ",".join(map(str, chunk))).encode(),
                    digest_size=8,
                ).hexdigest()
                out_bucket.append(bucket)
                out_doc.append(did)
                out_sig.append(sig)
        return pa.table(
            {
                "bucket": pa.array(out_bucket, pa.string()),
                "doc_id": pa.array(out_doc, pa.int64()),
                "sig": pa.array(out_sig, pa.list_(pa.int64())),
            }
        )

    banded = sigs.map_batches(bands, batch_format="pyarrow")

    def pairs(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        sig_list = group.column("sig").to_pylist()
        uniq: dict[int, list[int]] = {}
        for i, s in zip(ids, sig_list):
            uniq.setdefault(i, s)
        ids_u = sorted(uniq)
        a_out, b_out, sim_out = [], [], []
        for i in range(len(ids_u)):
            si = np.asarray(uniq[ids_u[i]])
            for j in range(i + 1, len(ids_u)):
                sj = np.asarray(uniq[ids_u[j]])
                est = float((si == sj).mean())
                if est >= threshold:
                    a_out.append(ids_u[i])
                    b_out.append(ids_u[j])
                    sim_out.append(int(round(est * 1000)))
        return pa.table(
            {
                "a_id": pa.array(a_out, pa.int64()),
                "b_id": pa.array(b_out, pa.int64()),
                "est_sim_milli": pa.array(sim_out, pa.int64()),
            }
        )

    cand = banded.groupby("bucket").map_groups(pairs, batch_format="pyarrow")

    # distinct pairs (a pair can collide in several bands)
    def key(batch: pa.Table) -> pa.Table:
        return batch

    import pyarrow.compute as pc

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


def simhash(sf_dir: str):
    """64-bit SimHash over whitespace tokens: (doc_id, simhash)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = []
        for t in texts:
            toks = _WS.split(t.strip()) if t.strip() else []
            acc = np.zeros(64, dtype=np.int64)
            for tok in toks:
                h = np.uint64(
                    int.from_bytes(
                        hashlib.blake2b(tok.encode(), digest_size=8).digest(),
                        "big",
                    )
                )
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits == 1, 1, -1)
            val = 0
            for b in range(64):
                if acc[b] > 0:
                    val |= 1 << b
            out.append(val & 0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(out, pa.int64()),
            }
        )

    return _read_documents(sf_dir).map_batches(fn, batch_format="pyarrow")


def ngram_jaccard_pairs(sf_dir: str, max_doc_id: int = 50, min_inter: int = 5):
    """Distributed set-similarity join on whitespace-token sets for
    doc_id < max_doc_id: (a_id, b_id, inter_count, a_size, b_size).

    Token postings -> groupby(token) -> per-token pair emission ->
    groupby(pair) count; sizes joined via a broadcast map (small side)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    docs = _read_documents(sf_dir).filter(
        expr=f"doc_id < {max_doc_id}"
    )

    def tokens(batch: pa.Table) -> pa.Table:
        out_tok, out_doc = [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for tok in set(_WS.split(t.strip()) if t.strip() else []):
                out_tok.append(tok)
                out_doc.append(did)
        return pa.table(
            {
                "tok": pa.array(out_tok, pa.string()),
                "doc_id": pa.array(out_doc, pa.int64()),
            }
        )

    posting = docs.map_batches(tokens, batch_format="pyarrow").materialize()

    sizes_rows = (
        posting.groupby("doc_id").count().take_all()
    )
    sizes = {int(r["doc_id"]): int(r["count()"]) for r in sizes_rows}
    sizes_ref = ray.put(sizes)

    def pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("doc_id").to_pylist()))
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pa.table(
            {
                "a_id": pa.array(a_out, pa.int64()),
                "b_id": pa.array(b_out, pa.int64()),
                "one": pa.array([1] * len(a_out), pa.int64()),
            }
        )

    counted = (
        posting.groupby("tok")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["a_id", "b_id"])
        .aggregate(Sum("one"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        szs = ray.get(sizes_ref)
        a = batch.column("a_id").to_pylist()
        b = batch.column("b_id").to_pylist()
        inter = batch.column("sum(one)").to_pylist()
        keep = [i for i, c in enumerate(inter) if c >= min_inter]
        return pa.table(
            {
                "a_id": pa.array([a[i] for i in keep], pa.int64()),
                "b_id": pa.array([b[i] for i in keep], pa.int64()),
                "inter_count": pa.array([inter[i] for i in keep], pa.int64()),
                "a_size": pa.array([szs[a[i]] for i in keep], pa.int64()),
                "b_size": pa.array([szs[b[i]] for i in keep], pa.int64()),
            }
        )

    return counted.map_batches(finish, batch_format="pyarrow").sort(
        ["a_id", "b_id"]
    )

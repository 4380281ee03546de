"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k: the query matrix is broadcast once (ray.put /
closure capture — small side), each batch does one f64 matmul, per-batch
top-k, tiny driver merge. The LSH-bucketed variant is the scale path: docs
hashed into hyperplane buckets once (index build), queries probe only
their bucket (+ optional neighbors)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from probe_ray.ops.sizing import shuffle_parts, table_rows


def _list_matrix(col, dtype=np.float64) -> np.ndarray:
    """Zero-copy decode of a fixed-width list<float> column to (n, dim):
    combine_chunks -> flatten -> one buffer-backed to_numpy -> reshape
    (the dedup.py _sig_matrix idiom). Replaces .to_pylist() -> np.array,
    which churned a Python object per row in the hottest ANN loops."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty((0, 0), dtype=dtype)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(dtype, copy=False).reshape(len(arr), -1)


def _read_embeddings(sf_dir: str, columns: list[str] | None = None):
    import ray.data

    # column-pruned at the read: most operators need only
    # (vec_id, embedding); knn_classify adds the label column
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=columns or ["vec_id", "embedding"],
    )


def _query_matrix(sf_dir: str, nq: int) -> tuple[np.ndarray, list[int]]:
    """First ``nq`` vectors by vec_id as the query set — pushed-down
    read: only the matching row groups and the two needed columns leave
    storage (vec_ids are dense from 0, so ``vec_id < nq`` is exact)."""
    import pyarrow.dataset as pads

    t = (
        pads.dataset(f"{sf_dir}/embeddings.parquet")
        .to_table(columns=["vec_id", "embedding"], filter=pads.field("vec_id") < nq)
        .sort_by([("vec_id", "ascending")])
    )
    ids = t.column("vec_id").to_pylist()[:nq]
    vecs = _list_matrix(t.column("embedding"))[:nq]
    return vecs, ids


def ann_brute_topk(sf_dir: str, k: int = 5, nq: int = 4):
    """Exact cosine top-k for the first nq vectors as queries:
    (query_id, rank, vec_id). Scores omitted on purpose: integer output is
    stable under the driver's cross-engine value hashing; ordering is
    (sim desc, vec_id asc)."""
    q, q_ids = _query_matrix(sf_dir, nq)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)

    def fn(batch: pa.Table) -> pa.Table:
        vec_ids = batch.column("vec_id").to_numpy().astype(np.int64)
        m = _list_matrix(batch.column("embedding"))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = qn @ mn.T  # (nq, batch)
        out_q, out_v, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            s = sims[qi]
            part = np.argpartition(-s, kk - 1)[:kk]
            out_q.extend([q_ids[qi]] * kk)
            out_v.extend(vec_ids[part].tolist())
            out_s.extend(s[part].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    parts = _read_embeddings(sf_dir).map_batches(fn, batch_format="pyarrow")
    all_rows = parts.take_all()
    by_q: dict[int, list] = {}
    for r in all_rows:
        by_q.setdefault(int(r["query_id"]), []).append(
            (float(r["sim"]), int(r["vec_id"]))
        )
    out = {"query_id": [], "rank": [], "vec_id": []}
    for qid in sorted(by_q):
        ranked = sorted(by_q[qid], key=lambda p: (-p[0], p[1]))[:k]
        for rank, (_, vid) in enumerate(ranked, 1):
            out["query_id"].append(qid)
            out["rank"].append(rank)
            out["vec_id"].append(vid)
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
        }
    )


N_PLANES = 8
_rng = np.random.default_rng(777)


def _planes(dim: int) -> np.ndarray:
    return np.random.default_rng(777).normal(size=(N_PLANES, dim))


def ann_lsh_buckets(sf_dir: str):
    """Hyperplane-LSH bucket assignment (the ANN scale path's index):
    (vec_id, bucket)."""
    def fn(batch: pa.Table) -> pa.Table:
        m = _list_matrix(batch.column("embedding"))
        planes = _planes(m.shape[1])
        bits = (m @ planes.T) > 0
        bucket = bits @ (1 << np.arange(N_PLANES))
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            }
        )

    return _read_embeddings(sf_dir).map_batches(fn, batch_format="pyarrow")


def ann_lsh_topk(sf_dir: str, k: int = 5, nq: int = 4):
    """Approximate cosine top-k probing only the query's LSH bucket.
    (query_id, rank, vec_id) — approximate by design (scale path)."""
    q, q_ids = _query_matrix(sf_dir, nq)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    planes = _planes(q.shape[1])
    q_buckets = (((q @ planes.T) > 0) @ (1 << np.arange(N_PLANES))).astype(int)

    def fn(batch: pa.Table) -> pa.Table:
        vec_ids = batch.column("vec_id").to_numpy().astype(np.int64)
        m = _list_matrix(batch.column("embedding"))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        buckets = (((m @ planes.T) > 0) @ (1 << np.arange(N_PLANES))).astype(int)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q_ids)):
            mask = buckets == q_buckets[qi]
            if not mask.any():
                continue
            s = qn[qi] @ mn[mask].T
            ids_m = vec_ids[mask]
            kk = min(k, len(ids_m))
            part = np.argpartition(-s, kk - 1)[:kk] if len(s) > kk else np.arange(len(s))
            out_q.extend([q_ids[qi]] * len(part))
            out_v.extend(ids_m[part].tolist())
            out_s.extend(s[part].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    parts = _read_embeddings(sf_dir).map_batches(fn, batch_format="pyarrow")
    rows = parts.take_all()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(int(r["query_id"]), []).append(
            (float(r["sim"]), int(r["vec_id"]))
        )
    out = {"query_id": [], "rank": [], "vec_id": []}
    for qid in sorted(by_q):
        ranked = sorted(by_q[qid], key=lambda p: (-p[0], p[1]))[:k]
        for rank, (_, vid) in enumerate(ranked, 1):
            out["query_id"].append(qid)
            out["rank"].append(rank)
            out["vec_id"].append(vid)
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
        }
    )


N_CENTROIDS = 16
IVF_NPROBE = 4


def _ivf_centroids(sf_dir: str) -> np.ndarray:
    """Deterministic k-means (fixed seed + iteration count) over a
    sample of the first 2048 vectors — pushed-down read (only the
    sample's row groups are fetched); centroids broadcast to every
    task. At corpus scale swap the id-prefix sample for
    ds.random_sample(seed=...) — the k-means itself is unchanged."""
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < 2048
    )
    order = np.argsort(t.column("vec_id").to_numpy(zero_copy_only=False))[:2048]
    m = _list_matrix(t.column("embedding"))[order]
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    rng = np.random.default_rng(4242)
    cent = mn[rng.choice(len(mn), size=min(N_CENTROIDS, len(mn)), replace=False)]
    for _ in range(8):
        assign = np.argmax(mn @ cent.T, axis=1)
        for c in range(len(cent)):
            members = mn[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ann_ivf_topk(sf_dir: str, k: int = 5, nq: int = 4):
    """IVF approximate top-k: vectors assigned to their nearest centroid
    (inverted lists); each query probes only its IVF_NPROBE closest
    centroids' lists. Centroids broadcast once; assignment + scoring are
    one map_batches pass. (query_id, rank, vec_id)."""
    q, q_ids = _query_matrix(sf_dir, nq)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    cent = _ivf_centroids(sf_dir)
    q_probe = np.argsort(-(qn @ cent.T), axis=1)[:, :IVF_NPROBE]

    def fn(batch: pa.Table) -> pa.Table:
        vec_ids = batch.column("vec_id").to_numpy().astype(np.int64)
        m = _list_matrix(batch.column("embedding"))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        assign = np.argmax(mn @ cent.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q_ids)):
            mask = np.isin(assign, q_probe[qi])
            if not mask.any():
                continue
            s = qn[qi] @ mn[mask].T
            ids_m = vec_ids[mask]
            kk = min(k, len(ids_m))
            part = (
                np.argpartition(-s, kk - 1)[:kk]
                if len(s) > kk
                else np.arange(len(s))
            )
            out_q.extend([q_ids[qi]] * len(part))
            out_v.extend(ids_m[part].tolist())
            out_s.extend(s[part].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    rows = _read_embeddings(sf_dir).map_batches(fn, batch_format="pyarrow").take_all()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(int(r["query_id"]), []).append(
            (float(r["sim"]), int(r["vec_id"]))
        )
    out = {"query_id": [], "rank": [], "vec_id": []}
    for qid in sorted(by_q):
        ranked = sorted(by_q[qid], key=lambda p: (-p[0], p[1]))[:k]
        for rank, (_, vid) in enumerate(ranked, 1):
            out["query_id"].append(qid)
            out["rank"].append(rank)
            out["vec_id"].append(vid)
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
        }
    )


def ivf_build(sf_dir: str, out_dir: str) -> str:
    """Persist an IVF index: vectors written as HIVE-PARTITIONED parquet
    (one directory per inverted list / centroid bucket) plus a centroids
    table and a manifest. A query then touches ONLY its probed buckets'
    files — partition pruning does the inverted-list seek, which is the
    ANN scale path (per-query I/O is corpus_size * nprobe / n_centroids,
    not the whole table). Deterministic: same seeded centroids as
    ann_ivf_topk."""
    import json

    import pyarrow.parquet as pq
    import ray.data

    marker = os.path.join(out_dir, "manifest.json")
    if os.path.exists(marker):
        return out_dir
    cent = _ivf_centroids(sf_dir)

    def assign(batch: pa.Table) -> pa.Table:
        m = _list_matrix(batch.column("embedding"))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        bucket = np.argmax(mn @ cent.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "vec_id": batch.column("vec_id"),
                "embedding": batch.column("embedding"),
            }
        )

    os.makedirs(out_dir, exist_ok=True)
    _read_embeddings(sf_dir).map_batches(
        assign, batch_format="pyarrow"
    ).write_parquet(os.path.join(out_dir, "vectors"), partition_cols=["bucket"])
    pq.write_table(
        pa.table(
            {
                "centroid_id": pa.array(range(len(cent)), pa.int64()),
                "centroid": pa.array(cent.tolist(), pa.list_(pa.float64())),
            }
        ),
        os.path.join(out_dir, "centroids.parquet"),
    )
    with open(marker, "w") as f:
        json.dump({"n_centroids": len(cent), "dim": int(cent.shape[1])}, f)
    return out_dir


def ivf_search(
    index_dir: str, sf_dir: str, k: int = 5, nq: int = 4, nprobe: int = IVF_NPROBE
) -> pa.Table:
    """Query the persisted IVF index: per query probe the nprobe nearest
    centroids and read ONLY those buckets' partitions (hive partition
    pruning at the parquet dataset level). Result rows and order are
    IDENTICAL to the in-memory ann_ivf_topk (same centroids, scoring,
    (sim desc, vec_id) ordering) — pinned by test."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    cent_t = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    cent = _list_matrix(cent_t.column("centroid"))
    q, q_ids = _query_matrix(sf_dir, nq)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    q_probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    need = sorted({int(b) for row in q_probe for b in row})

    dset = pads.dataset(
        os.path.join(index_dir, "vectors"), partitioning="hive"
    )
    t = dset.to_table(
        columns=["bucket", "vec_id", "embedding"],
        filter=pads.field("bucket").isin(need),
    )
    ids = t.column("vec_id").to_numpy()
    buckets = t.column("bucket").cast(pa.int64()).to_numpy(zero_copy_only=False)
    m = _list_matrix(t.column("embedding"))
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = {"query_id": [], "rank": [], "vec_id": []}
    for qi in range(len(q_ids)):
        mask = np.isin(buckets, q_probe[qi])
        if not mask.any():
            continue
        sims = qn[qi] @ mn[mask].T
        ids_m = ids[mask]
        order = np.lexsort((ids_m, -sims))[:k]
        for rank, j in enumerate(order, 1):
            out["query_id"].append(int(q_ids[qi]))
            out["rank"].append(rank)
            out["vec_id"].append(int(ids_m[j]))
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
        }
    )


def ann_ivf_persisted(sf_dir: str, k: int = 5, nq: int = 4) -> pa.Table:
    """Driver entry: build (cached under /tmp) + query the persisted IVF
    index."""
    import hashlib as _h

    out = os.path.join(
        "/tmp/probe_ray_cache",
        _h.sha1(sf_dir.encode()).hexdigest()[:12],
        "ivf_index",
    )
    ivf_build(sf_dir, out)
    return ivf_search(out, sf_dir, k=k, nq=nq)


N_KMEANS = 8
KMEANS_ITERS = 10


def ann_kmeans(sf_dir: str, k: int = N_KMEANS, iters: int = KMEANS_ITERS):
    """Distributed Lloyd's k-means over the full embeddings table
    (cosine geometry: vectors l2-normalized, centroids renormalized each
    round). Per iteration: centroids broadcast once via ray.put, each
    batch computes PARTIAL (sum, count) per centroid — a (k x dim)
    matrix per batch — and the global reduce is a tiny k-row aggregate;
    no per-point shuffle ever happens. Deterministic: seeded centroid
    init from the id-prefix sample (pushdown read), fixed iteration
    count, ties broken by lowest centroid index (argmax on exact f64).
    Returns (vec_id, cluster) sorted by vec_id."""
    import ray
    import ray.data

    cent = _kmeans_centroids(sf_dir, k, iters)
    cent_ref = ray.put(cent)

    def assign_fn(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _list_matrix(batch.column("embedding"))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(
                    np.argmax(mn @ c.T, axis=1).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        _read_embeddings(sf_dir)
        .map_batches(assign_fn, batch_format="pyarrow")
        .sort("vec_id")
    )


def _normalized_embeddings(sf_dir: str):
    """MATERIALIZED (vec_id, emb_n: list<f64>) of l2-normalized vectors —
    normalize once in f64 (bit-identical to per-iteration normalization
    of the raw column) and let every Lloyd iteration start from the
    object store instead of re-reading + re-normalizing the parquet.
    Costs one extra in-memory copy of the table (f64) and one extra
    pipeline launch — at toy sizes (sf0.1 = 2000 x 64 floats) that
    launch IS the cost; the win appears when the table is larger than
    the per-iteration fixed overhead. Saves iters x (read + normalize)
    passes."""

    def norm_fn(batch: pa.Table) -> pa.Table:
        m = _list_matrix(batch.column("embedding"))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "emb_n": pa.FixedSizeListArray.from_arrays(
                    pa.array(mn.ravel(), pa.float64()), mn.shape[1]
                ),
            }
        )

    return (
        _read_embeddings(sf_dir)
        .map_batches(norm_fn, batch_format="pyarrow")
        .materialize()
    )


#: vectors at or under this count train the Lloyd loop on the driver —
#: at 64 f64 dims this caps the driver matrix at ~128 MB. Each
#: distributed iteration costs a full pipeline launch, which at small N
#: dwarfs the math (sf0.1 = 2000 vectors: 4 launches ~ 3.5 s for ~1 ms
#: of matmul); above the cap the per-batch partial-sum exchange runs.
KMEANS_DRIVER_MAX_ROWS = 262_144


def _kmeans_centroids(sf_dir: str, k: int, iters: int) -> np.ndarray:
    """Train the (k x dim) cosine k-means centroids (ann_kmeans'
    distributed Lloyd loop, factored out so semantic_dedup shares it).
    Size-aware crossover on the parquet footer row count (zero data
    read): small corpora run the same Lloyd updates on a driver-local
    matrix (one pushed-down read, no per-iteration pipeline launch);
    large ones iterate over the once-materialized normalized table with
    per-batch partial sums. Branches differ only in f64 summation
    order; the crossover-identity test pins the rounded outputs equal."""
    import ray

    cent = _ivf_centroids(sf_dir)[:k]  # deterministic seeded init
    dim = cent.shape[1]

    if table_rows(sf_dir, "embeddings") <= KMEANS_DRIVER_MAX_ROWS:
        import pyarrow.dataset as pads

        t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
            columns=["embedding"]
        )
        m = _list_matrix(t.column("embedding"))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        for _ in range(iters):
            assign = np.argmax(mn @ cent.T, axis=1)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, assign, mn)
            counts = np.bincount(assign, minlength=k)
            new_cent = cent.copy()
            for c_i in range(k):
                if counts[c_i]:
                    v = sums[c_i] / counts[c_i]
                    nv = np.linalg.norm(v)
                    if nv > 0:
                        new_cent[c_i] = v / nv
            cent = new_cent
        return cent

    emb_n = _normalized_embeddings(sf_dir)

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(batch: pa.Table, _ref=cent_ref) -> pa.Table:
            c = ray.get(_ref)
            mn = _list_matrix(batch.column("emb_n"))
            assign = np.argmax(mn @ c.T, axis=1)
            sums = np.zeros((len(c), mn.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, mn)
            counts = np.bincount(assign, minlength=len(c))
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(c)), pa.int64()),
                    "vsum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                    "n": pa.array(counts, pa.int64()),
                }
            )

        rows = emb_n.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[int(r["cluster"])] += np.asarray(r["vsum"], dtype=np.float64)
            counts[int(r["cluster"])] += int(r["n"])
        new_cent = cent.copy()
        for c_i in range(k):
            if counts[c_i]:
                v = sums[c_i] / counts[c_i]
                nv = np.linalg.norm(v)
                if nv > 0:
                    new_cent[c_i] = v / nv
        cent = new_cent

    return cent


SEMDEDUP_CHUNK = 2048


def semantic_dedup(
    sf_dir: str,
    threshold: float = 0.42,
    n_clusters: int = N_KMEANS,
    iters: int = 4,
):
    """SemDeDup-style clustered embedding dedup (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embeddings (cosine geometry),
    then find near-duplicates ONLY within each cluster — the all-pairs
    matmul becomes per-cluster O(|c|^2) instead of corpus-global O(N^2).
    A row is a duplicate iff some SMALLER vec_id in its cluster has
    cosine >= threshold (keep-smallest, order-independent, no greedy
    sequencing); rep_id is that smallest qualifying id (own id for
    keepers). Returns (vec_id, cluster, is_dup, rep_id) sorted by
    vec_id. Deterministic end-to-end: seeded centroid init, fixed
    iteration count, exact f64 similarity.

    Scale shape: ONE shuffle of the embedding rows keyed by cluster; at
    100 TB you grow n_clusters proportionally (SemDeDup uses ~11k for
    LAION) so each cluster's rows fit a map_groups task, and the
    within-cluster matmul is chunked (SEMDEDUP_CHUNK rows vs the cluster
    matrix) to bound the similarity buffer. Cross-cluster duplicates are
    missed by design — the documented SemDeDup approximation."""
    import ray

    cent = _kmeans_centroids(sf_dir, n_clusters, iters)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _list_matrix(batch.column("embedding"))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        return pa.table(
            {
                "cluster": pa.array(
                    np.argmax(mn @ c.T, axis=1).astype(np.int64), pa.int64()
                ),
                "vec_id": batch.column("vec_id"),
                "embedding": batch.column("embedding"),
            }
        )

    def dedup_group(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids_s = ids[order]
        m = _list_matrix(group.column("embedding"))[order]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        n = len(ids_s)
        rep = ids_s.copy()
        dup = np.zeros(n, dtype=bool)
        for lo in range(0, n, SEMDEDUP_CHUNK):
            hi = min(lo + SEMDEDUP_CHUNK, n)
            sims = mn[lo:hi] @ mn.T  # (chunk, n)
            hit = sims >= threshold
            # only columns strictly before the row (smaller vec_id)
            col = np.arange(n)[None, :]
            row = np.arange(lo, hi)[:, None]
            hit &= col < row
            has = hit.any(axis=1)
            first = hit.argmax(axis=1)  # smallest qualifying id's index
            dup[lo:hi] = has
            rep[lo:hi] = np.where(has, ids_s[first], ids_s[lo:hi])
        cl = group.column("cluster").to_numpy().astype(np.int64)[order]
        return pa.table(
            {
                "vec_id": pa.array(ids_s, pa.int64()),
                "cluster": pa.array(cl, pa.int64()),
                "is_dup": pa.array(dup),
                "rep_id": pa.array(rep, pa.int64()),
            }
        )

    n_rows = table_rows(sf_dir, "embeddings")
    return (
        _read_embeddings(sf_dir)
        .map_batches(assign, batch_format="pyarrow")
        .repartition(shuffle_parts(n_rows * 8 * 40))
        .groupby("cluster")
        .map_groups(dedup_group, batch_format="pyarrow")
        .sort("vec_id")
    )


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.42, max_id: int = 500):
    """Embedding-cosine near-duplicate pairs (a_id, b_id) for vec_id <
    max_id: exact blockwise matmul (each batch vs broadcast matrix).
    The broadcast side is a pushed-down read of just the vec_id<max_id
    row groups + needed columns, never the full table."""
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < max_id
    )
    ids_all = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    m_all = _list_matrix(t.column("embedding"))
    mn_all = m_all / np.linalg.norm(m_all, axis=1, keepdims=True)

    def fn(batch: pa.Table) -> pa.Table:
        vec_ids = batch.column("vec_id").to_numpy().astype(np.int64)
        sel = vec_ids < max_id
        vec_ids = vec_ids[sel]
        m = _list_matrix(batch.column("embedding"))[sel]
        if len(m) == 0:
            return pa.table(
                {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())}
            )
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = mn @ mn_all.T
        ai, bj = np.nonzero(sims >= threshold)  # vectorized pair emission
        keep = vec_ids[ai] < ids_all[bj]
        return pa.table(
            {
                "a_id": pa.array(vec_ids[ai[keep]], pa.int64()),
                "b_id": pa.array(ids_all[bj[keep]], pa.int64()),
            }
        )

    import ray.data

    return (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(fn, batch_format="pyarrow")
        .sort(["a_id", "b_id"])
    )


def ann_knn_classify(sf_dir: str, k: int = 5, max_ref: int = 500):
    """k-NN label classification: every vector is labeled by majority
    vote of its k nearest neighbors (cosine; ties by smaller vec_id)
    within the LABELED REFERENCE SET vec_id < max_ref, excluding
    itself; vote ties resolve to the smallest label. (vec_id, label,
    pred_label) sorted by vec_id.

    Scale shape: the reference set is the broadcast small side (one
    pushdown read + ray.put, the labeled-seed-set pattern); the corpus
    streams through map_batches, each batch doing one matmul against
    the reference matrix and a fully vectorized stable-argsort top-k +
    bincount vote — no shuffle at any size. Neighbor order ties break
    by ascending vec_id because the reference matrix is id-sorted and
    the argsort is stable."""
    import pyarrow.dataset as pads
    import ray

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding", "label"],
        filter=pads.field("vec_id") < max_ref,
    )
    order = pa.compute.sort_indices(t, sort_keys=[("vec_id", "ascending")])
    t = t.take(order)
    ref_ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ref_m = _list_matrix(t.column("embedding"))
    ref_mn = ref_m / np.linalg.norm(ref_m, axis=1, keepdims=True)
    ref_labels = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    label_vals = np.unique(ref_labels)  # ascending: argmax tie -> smallest
    ref_lidx = np.searchsorted(label_vals, ref_labels)
    ref = ray.put((ref_ids, ref_mn, ref_lidx, label_vals))

    def fn(batch: pa.Table) -> pa.Table:
        ids_r, mn_r, lidx_r, lvals = ray.get(ref)
        vec_ids = batch.column("vec_id").to_numpy().astype(np.int64)
        labels = batch.column("label").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        m = _list_matrix(batch.column("embedding"))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = mn @ mn_r.T  # (batch, ref)
        sims[vec_ids[:, None] == ids_r[None, :]] = -np.inf  # exclude self
        kk = min(k, len(ids_r))
        # stable argsort of -sims over the id-sorted reference axis =
        # (sim desc, vec_id asc)
        nb = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        # mask the -inf self row when kk spans the whole reference set
        # (max_ref <= k) — it must never vote its own label
        valid = np.take_along_axis(sims, nb, axis=1) > -np.inf
        votes = np.zeros((len(vec_ids), len(lvals)), dtype=np.int64)
        rows = np.repeat(np.arange(len(vec_ids)), kk)
        np.add.at(
            votes, (rows, lidx_r[nb].ravel()), valid.ravel().astype(np.int64)
        )
        pred = lvals[np.argmax(votes, axis=1)]  # tie -> smallest label
        return pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "label": pa.array(labels, pa.int64()),
                "pred_label": pa.array(pred, pa.int64()),
            }
        )

    return (
        _read_embeddings(sf_dir, columns=["vec_id", "embedding", "label"])
        .map_batches(fn, batch_format="pyarrow")
        .sort("vec_id")
    )


def _ivf_ref_index(sf_dir: str, max_ref: int) -> str:
    """Persist the labeled reference set (vec_id < max_ref) as a
    hive-partitioned IVF layout carrying labels — the
    partition-pruned neighbor store for ann_knn_classify_ivf."""
    import hashlib as _h
    import json

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    out = os.path.join(
        "/tmp/probe_ray_cache",
        _h.sha1(f"{sf_dir}|{max_ref}".encode()).hexdigest()[:12],
        "ivf_ref",
    )
    marker = os.path.join(out, "manifest.json")
    if os.path.exists(marker):
        return out
    cent = _ivf_centroids(sf_dir)
    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding", "label"],
        filter=pads.field("vec_id") < max_ref,
    )
    m = _list_matrix(t.column("embedding"))
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    bucket = np.argmax(mn @ cent.T, axis=1).astype(np.int64)
    os.makedirs(out, exist_ok=True)
    import ray.data

    ray.data.from_arrow(
        t.append_column("bucket", pa.array(bucket))
    ).write_parquet(os.path.join(out, "vectors"), partition_cols=["bucket"])
    pq.write_table(
        pa.table(
            {
                "centroid_id": pa.array(range(len(cent)), pa.int64()),
                "centroid": pa.array(cent.tolist(), pa.list_(pa.float64())),
            }
        ),
        os.path.join(out, "centroids.parquet"),
    )
    with open(marker, "w") as f:
        json.dump({"n_centroids": len(cent)}, f)
    return out


def ann_knn_classify_ivf(
    sf_dir: str,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
    max_ref: int = 500,
):
    """IVF-bucketed k-NN classification — the partition-pruned scale
    path of ann_knn_classify: neighbors come only from each vector's
    nprobe nearest centroid buckets of the persisted labeled reference
    index, so a task reads corpus_ref * nprobe / n_centroids rows
    instead of the whole seed set. Approximate by design (a true
    neighbor outside the probed buckets is missed — the standard IVF
    recall trade); deterministic given the seeded centroids, with the
    same (sim desc, vec_id asc) neighbor order and smallest-label vote
    ties as the exact op. (vec_id, label, pred_label) sorted by
    vec_id."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    idx = _ivf_ref_index(sf_dir, max_ref)
    cent = _list_matrix(
        pq.read_table(os.path.join(idx, "centroids.parquet")).column(
            "centroid"
        )
    )

    def fn(batch: pa.Table) -> pa.Table:
        vec_ids = batch.column("vec_id").to_numpy().astype(np.int64)
        labels = batch.column("label").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        m = _list_matrix(batch.column("embedding"))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        probe = np.argsort(-(mn @ cent.T), axis=1, kind="stable")[:, :nprobe]
        need = sorted({int(b) for row in probe for b in row})
        dset = pads.dataset(os.path.join(idx, "vectors"), partitioning="hive")
        t = dset.to_table(
            columns=["bucket", "vec_id", "label", "embedding"],
            filter=pads.field("bucket").isin(need),
        )
        order = pa.compute.sort_indices(
            t, sort_keys=[("vec_id", "ascending")]
        )
        t = t.take(order)
        rid = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        rbk = t.column("bucket").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        rlab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        rmn = _list_matrix(t.column("embedding"))
        rmn = rmn / np.linalg.norm(rmn, axis=1, keepdims=True)
        lvals = np.unique(rlab)
        lidx = np.searchsorted(lvals, rlab)
        sims = mn @ rmn.T  # (batch, nref_probed)
        allowed = np.zeros(sims.shape, dtype=bool)
        for p in range(probe.shape[1]):
            allowed |= rbk[None, :] == probe[:, p, None]
        allowed &= vec_ids[:, None] != rid[None, :]  # exclude self
        sims = np.where(allowed, sims, -np.inf)
        kk = min(k, sims.shape[1]) if sims.shape[1] else 0
        if kk == 0:
            pred = np.zeros(len(vec_ids), dtype=np.int64)
        else:
            nb = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
            valid = np.take_along_axis(sims, nb, axis=1) > -np.inf
            votes = np.zeros((len(vec_ids), len(lvals)), dtype=np.int64)
            rows = np.repeat(np.arange(len(vec_ids)), kk)
            np.add.at(
                votes,
                (rows, lidx[nb].ravel()),
                valid.ravel().astype(np.int64),
            )
            pred = lvals[np.argmax(votes, axis=1)]
        return pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "label": pa.array(labels, pa.int64()),
                "pred_label": pa.array(pred, pa.int64()),
            }
        )

    return (
        _read_embeddings(sf_dir, columns=["vec_id", "embedding", "label"])
        .map_batches(fn, batch_format="pyarrow")
        .sort("vec_id")
    )


def prototype_filter(
    sf_dir: str,
    pct: float = 0.2,
    n_clusters: int = N_KMEANS,
    iters: int = 4,
):
    """Prototypicality-based outlier filter (the SSL-prototypes
    curation rule, Sorscher et al. 2022, arXiv:2206.14486 — SemDeDup's
    companion): score every vector by cosine to its own k-means
    centroid and DROP the least prototypical ``pct`` of the corpus
    (global bottom quantile of the score). Returns
    (vec_id, cluster, proto_milli, kept) sorted by vec_id —
    proto_milli = floor(cos * 1000 + 0.5), integer so the exact
    order-statistic threshold and the scalar-reference pin are
    float-free.

    Scale shape: centroids broadcast once (shared Lloyd loop); scoring
    is one local map pass; the global threshold is an exact bounded
    histogram (scores live in -1000..1000 => 2001 bins) — no sort; the
    kept flag is a second local pass. The threshold is the exact
    pct-quantile value (quantile_disc convention) and ties AT it DROP
    (kept = proto_milli > threshold), so at least ceil(pct*n) rows are
    dropped."""
    import ray
    from ray.data.aggregate import Sum

    cent = _kmeans_centroids(sf_dir, n_clusters, iters)
    cent_ref = ray.put(cent)

    def score(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _list_matrix(batch.column("embedding"))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = mn @ c.T
        cl = np.argmax(sims, axis=1)
        proto = np.floor(
            sims[np.arange(len(cl)), cl] * 1000.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(cl.astype(np.int64)),
                "proto_milli": pa.array(proto),
            }
        )

    scored = (
        _read_embeddings(sf_dir)
        .map_batches(score, batch_format="pyarrow")
        .materialize()
    )
    n_total = scored.count()
    if n_total == 0:
        return pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "proto_milli": pa.array([], pa.int64()),
                "kept": pa.array([], pa.bool_()),
            }
        )

    def hist(batch: pa.Table) -> pa.Table:
        p = batch.column("proto_milli").to_numpy() + 1000  # -> 0..2000
        c = np.bincount(p, minlength=2001)
        nz = np.flatnonzero(c)
        return pa.table(
            {
                "bin": pa.array(nz.astype(np.int64)),
                "cnt": pa.array(c[nz].astype(np.int64)),
            }
        )

    rows = (
        scored.map_batches(hist, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("cnt"))
        .take_all()
    )
    counts = np.zeros(2001, dtype=np.int64)
    for r in rows:
        counts[int(r["bin"])] = int(r["sum(cnt)"])
    from probe_ray.ops.sizing import disc_quantile_from_hist

    thr = disc_quantile_from_hist(counts, n_total, pct) - 1000

    def flag(batch: pa.Table) -> pa.Table:
        p = batch.column("proto_milli").to_numpy()
        return batch.append_column("kept", pa.array(p > thr))

    return scored.map_batches(flag, batch_format="pyarrow").sort("vec_id")


def ann_recall(sf_dir: str, k: int = 10, nq: int = 8):
    """Recall@k of the IVF approximate path against exact brute-force
    cosine top-k, per nprobe in {1, 2, 4, 8, ..., N_CENTROIDS}: the
    quantitative evidence for the IVF scale path (at 100 TB the probe
    count is THE accuracy/cost dial — each query reads only nprobe of
    the hive-partitioned inverted lists). Output
    (nprobe, recall_milli, n_hits, n_truth) — recall_milli =
    floor(1000 * |ivf ∩ brute| / |brute| + 0.5), integer so the table
    is exactly deterministic.

    One corpus pass computes EVERYTHING: per batch, every query scores
    the batch's vectors once; per (query, nprobe) the batch's rows that
    fall inside the probe set contribute candidate (sim, vec_id) pairs;
    exact top-k per query comes from the same scores unmasked. Per-batch
    partials are folded to top-k per (query, level) by a keyed
    ``groupby().map_groups`` (a tiny exchange: nq x (levels+1) groups),
    so the driver reads exactly nq x (levels+1) x k rows — independent
    of corpus batch count."""
    q, q_ids = _query_matrix(sf_dir, nq)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    cent = _ivf_centroids(sf_dir)
    levels = []
    p = 1
    while p <= len(cent):
        levels.append(p)
        p *= 2
    # per query: centroid ids in probe-preference order
    pref = np.argsort(-(qn @ cent.T), axis=1)

    def fn(batch: pa.Table) -> pa.Table:
        vec_ids = batch.column("vec_id").to_numpy().astype(np.int64)
        m = _list_matrix(batch.column("embedding"))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        assign = np.argmax(mn @ cent.T, axis=1)
        sims = qn @ mn.T  # (nq, rows)
        out = {"qi": [], "lvl": [], "sim": [], "vid": []}
        for qi in range(len(q_ids)):
            s = sims[qi]
            kk = min(k, len(s))
            top = np.argpartition(-s, kk - 1)[:kk] if len(s) > kk else np.arange(len(s))
            # lvl = 0 encodes the exact (unmasked) candidates
            out["qi"].extend([qi] * len(top))
            out["lvl"].extend([0] * len(top))
            out["sim"].extend(s[top].tolist())
            out["vid"].extend(vec_ids[top].tolist())
            for lvl in levels:
                mask = np.isin(assign, pref[qi, :lvl])
                if not mask.any():
                    continue
                sm, vm = s[mask], vec_ids[mask]
                kk = min(k, len(sm))
                top = (
                    np.argpartition(-sm, kk - 1)[:kk]
                    if len(sm) > kk
                    else np.arange(len(sm))
                )
                out["qi"].extend([qi] * len(top))
                out["lvl"].extend([lvl] * len(top))
                out["sim"].extend(sm[top].tolist())
                out["vid"].extend(vm[top].tolist())
        return pa.table(
            {
                "qi": pa.array(out["qi"], pa.int64()),
                "lvl": pa.array(out["lvl"], pa.int64()),
                "sim": pa.array(out["sim"], pa.float64()),
                "vid": pa.array(out["vid"], pa.int64()),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        # exact top-k of this (qi, lvl) group, ties broken by vec_id —
        # same order the driver's topset uses, so the fold is lossless
        sim = group.column("sim").to_numpy()
        vid = group.column("vid").to_numpy()
        return group.take(np.lexsort((vid, -sim))[:k])

    rows = (
        _read_embeddings(sf_dir)
        .map_batches(fn, batch_format="pyarrow")
        .groupby(["qi", "lvl"])
        .map_groups(combine, batch_format="pyarrow")
        .take_all()
    )
    by: dict[tuple, list] = {}
    for r in rows:
        by.setdefault((int(r["qi"]), int(r["lvl"])), []).append(
            (float(r["sim"]), int(r["vid"]))
        )
    def topset(qi, lvl):
        c = by.get((qi, lvl), [])
        return {v for _, v in sorted(c, key=lambda p: (-p[0], p[1]))[:k]}
    out = {"nprobe": [], "recall_milli": [], "n_hits": [], "n_truth": []}
    for lvl in levels:
        hits = truth = 0
        for qi in range(len(q_ids)):
            t = topset(qi, 0)
            truth += len(t)
            hits += len(t & topset(qi, lvl))
        out["nprobe"].append(lvl)
        out["recall_milli"].append(
            int(np.floor(1000.0 * hits / truth + 0.5)) if truth else 0
        )
        out["n_hits"].append(hits)
        out["n_truth"].append(truth)
    return pa.table(
        {
            "nprobe": pa.array(out["nprobe"], pa.int64()),
            "recall_milli": pa.array(out["recall_milli"], pa.int64()),
            "n_hits": pa.array(out["n_hits"], pa.int64()),
            "n_truth": pa.array(out["n_truth"], pa.int64()),
        }
    )


def ann_range_search(sf_dir: str, tau: float = 0.3, nq: int = 4):
    """Exact cosine RANGE search: every (query_id, vec_id) pair whose
    similarity reaches ``tau``, for the first ``nq`` vectors as queries
    — the radius-neighbor counterpart of ann_brute_topk, sorted by
    (query_id, vec_id). Integer-only output (the float sim stays
    internal) so the cross-engine hash is stable; ``tau`` must not sit
    within float-rounding distance of an actual similarity (asserted
    against both test SFs in the suite).

    Same broadcast shape as brute top-k: the (nq, dim) normalized query
    matrix rides the closure, each batch is one f64 matmul + threshold
    mask — per-batch output is only the qualifying pairs, so the result
    streams without a driver merge."""
    q, q_ids = _query_matrix(sf_dir, nq)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    qid_arr = np.asarray(q_ids, dtype=np.int64)

    def fn(batch: pa.Table) -> pa.Table:
        vec_ids = batch.column("vec_id").to_numpy().astype(np.int64)
        m = _list_matrix(batch.column("embedding"))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = qn @ mn.T  # (nq, batch)
        qi, vi = np.nonzero(sims >= tau)
        return pa.table(
            {
                "query_id": pa.array(qid_arr[qi], pa.int64()),
                "vec_id": pa.array(vec_ids[vi], pa.int64()),
            }
        )

    return (
        _read_embeddings(sf_dir)
        .map_batches(fn, batch_format="pyarrow")
        .sort(["query_id", "vec_id"])
    )


def ann_int8_quantize(sf_dir: str):
    """Global-min/max int8 scalar quantization of the embedding column —
    the storage-compression half of the ANN scale path (a 64-dim f32
    vector becomes 64 bytes; IVF distance scans read a quarter of the
    bytes). Two passes: (1) per-dimension min/max folded from per-batch
    partials (a 2 x dim matrix per batch — bounded driver reduction),
    (2) a pure quantize map. Output (vec_id, dim, q) with
    q = floor((x - lo_d) / (hi_d - lo_d) * 255 + 0.5) — exact-integer
    and oracle-comparable. The per-dim row explode is the ORACLE VIEW of
    the artifact; at scale the same kernel would emit one fixed-width
    binary column per vector (the tested math is identical), not 64
    rows. The suite asserts every scaled value sits > 1e-6 from the
    rounding grid at both test SFs, so cross-engine f64 ordering cannot
    flip a code."""
    ds = _read_embeddings(sf_dir)
    lo = None
    hi = None

    def stats(batch: pa.Table) -> pa.Table:
        m = _list_matrix(batch.column("embedding"))
        ndim = m.shape[1]
        return pa.table(
            {
                # explicit dim key: downstream blocks may coalesce
                # several tasks' partials into one batch, so the fold
                # cannot assume one batch == one (dim-aligned) partial
                "d": pa.array(np.arange(ndim, dtype=np.int64)),
                "lo": pa.array(m.min(axis=0)),
                "hi": pa.array(m.max(axis=0)),
            }
        )

    for b in ds.map_batches(stats, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        d = t.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        blo = t.column("lo").to_numpy(zero_copy_only=False)
        bhi = t.column("hi").to_numpy(zero_copy_only=False)
        ndim = int(d.max()) + 1
        if lo is None:
            lo = np.full(ndim, np.inf)
            hi = np.full(ndim, -np.inf)
        np.minimum.at(lo, d, blo)
        np.maximum.at(hi, d, bhi)

    lo_f, hi_f = lo.copy(), hi.copy()

    # A dimension constant across the corpus has hi == lo; dividing by
    # zero would turn into NaN/inf and then garbage int codes silently.
    # Such dims carry no information — emit q = 0 (x - lo is 0, so any
    # positive denominator maps them there). Mirrored in the oracle SQL.
    denom = np.where(hi_f > lo_f, hi_f - lo_f, 1.0)

    def quantize(batch: pa.Table) -> pa.Table:
        m = _list_matrix(batch.column("embedding"))
        nvec, ndim = m.shape
        q = np.floor((m - lo_f) / denom * 255 + 0.5).astype(np.int64)
        vid = np.repeat(
            batch.column("vec_id").to_numpy().astype(np.int64), ndim
        )
        dim = np.tile(np.arange(ndim, dtype=np.int64), nvec)
        return pa.table(
            {
                "vec_id": pa.array(vid, pa.int64()),
                "dim": pa.array(dim, pa.int64()),
                "q": pa.array(q.ravel(), pa.int64()),
            }
        )

    return ds.map_batches(quantize, batch_format="pyarrow").sort(
        ["vec_id", "dim"]
    )

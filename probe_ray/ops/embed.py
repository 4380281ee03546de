"""Text -> embedding-model -> similarity chain over ``documents``.

The embedding "model" is the same documented deterministic stand-in as
search/rerank.py (feature-hashed token counts, l2-normalized — no model
weights exist in this environment); the Ray shape is the real contract:

  - HashEmbedder is a callable CLASS: weights ("seed state") load once
    per actor in ``__init__``; ``__call__`` embeds a whole Arrow batch
    vectorized — the canonical actor-pool inference stage
    (map_batches(cls, concurrency=N, batch_size=B));
  - the near-dup join is the blockwise-matmul-vs-broadcast pattern:
    the small side (doc_id < max_id) is embedded once driver-side from
    a pushdown read and captured in the closure; the streaming side
    flows through the actor pool, each batch doing one matmul.

Swapping in a real encoder = replacing HashEmbedder._load/_embed."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from probe_ray.ops.ann import _list_matrix
from probe_ray.search.rerank import _hash_embed

EMBED_DIM = 64
EMBED_SEED = 20240817


class HashEmbedder:
    def __init__(self, dim: int = EMBED_DIM, seed: int = EMBED_SEED):
        self._load(dim, seed)

    def _load(self, dim: int, seed: int) -> None:
        # stand-in weights: the hashing configuration
        self.dim = dim
        self.seed = seed

    def _embed(self, texts: list[str]) -> np.ndarray:
        return _hash_embed(texts, self.dim, self.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = self._embed(batch.column("text").to_pylist())
        n, d = vecs.shape
        # vectorized list<double> emission: flat values + arithmetic
        # offsets, no per-row .tolist() churn (int64 offsets — immune to
        # the int32 wrap at n*d > 2^31)
        emb = pa.LargeListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int64)),
            pa.array(vecs.ravel(), pa.float64()),
        ).cast(pa.list_(pa.float64()))
        return pa.table({"doc_id": batch.column("doc_id"), "embedding": emb})


def doc_embeddings(sf_dir: str, concurrency: int = 2, batch_size: int = 256):
    """(doc_id, embedding) via the actor-pool model stage."""
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        HashEmbedder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def text_embed_neardup_pairs(
    sf_dir: str, threshold_milli: int = 995, max_id: int = 500
):
    """End-to-end chain: embed (actor pool) -> cosine near-dup pairs
    (a_id, b_id, sim_milli) among doc_id < max_id. Broadcast side from a
    pushdown read; exact blockwise matmul; integer milli scores."""
    import pyarrow.dataset as pads

    small = (
        pads.dataset(f"{sf_dir}/documents.parquet")
        .to_table(columns=["doc_id", "text"], filter=pads.field("doc_id") < max_id)
        .sort_by([("doc_id", "ascending")])
    )
    ids_all = np.asarray(small.column("doc_id").to_pylist(), dtype=np.int64)
    m_all = HashEmbedder()._embed(small.column("text").to_pylist())

    def pairs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        sel = ids < max_id
        ids = ids[sel]
        if len(ids) == 0:
            return pa.table(
                {
                    "a_id": pa.array([], pa.int64()),
                    "b_id": pa.array([], pa.int64()),
                    "sim_milli": pa.array([], pa.int64()),
                }
            )
        vecs = _list_matrix(batch.filter(pa.array(sel)).column("embedding"))
        sims = vecs @ m_all.T
        sims_milli = np.floor(sims * 1000.0 + 0.5).astype(np.int64)
        a_out, b_out, s_out = [], [], []
        for i in range(len(ids)):
            hits = np.flatnonzero(
                (sims_milli[i] >= threshold_milli) & (ids_all > ids[i])
            )
            a_out.extend([int(ids[i])] * len(hits))
            b_out.extend(ids_all[hits].tolist())
            s_out.extend(sims_milli[i][hits].tolist())
        return pa.table(
            {
                "a_id": pa.array(a_out, pa.int64()),
                "b_id": pa.array(b_out, pa.int64()),
                "sim_milli": pa.array(s_out, pa.int64()),
            }
        )

    return (
        doc_embeddings(sf_dir)
        .map_batches(pairs, batch_format="pyarrow")
        .sort(["a_id", "b_id"])
    )

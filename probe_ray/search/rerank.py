"""Cross-encoder reranking stage (reference: src/bert_reranker.rs,
feature-flagged ms-marco models; rerank_with_bert:350-430 replaces each
result's score with the model score and re-sorts descending).

The model weights/runtime (candle + ms-marco checkpoints) are not
available in this environment, so the model itself is a clearly-marked
DETERMINISTIC STAND-IN: a seeded feature-hashing bi-encoder whose score
is the cosine between hashed token-count embeddings of query and
document. The Ray plumbing around it is the real contract and is what
this module demonstrates and tests:

  - the model is loaded ONCE per actor in ``__init__`` (weights =
    seeded projection state), never per batch;
  - scoring is a vectorized per-batch ``__call__`` over Arrow batches;
  - the stage runs as ``map_batches(cls, concurrency=N, batch_size=B)``
    — an actor pool sized independently of the rest of the pipeline;
  - output ordering is deterministic: (score desc, path asc, start asc).

Swapping in a real cross-encoder means replacing ``_load_model`` /
``_score_pairs`` only."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

STUB_MODEL = "ms-marco-stub"
KNOWN_REAL_MODELS = (
    "ms-marco-tinybert",
    "ms-marco-minilm-l6",
    "ms-marco-minilm-l12",
)

EMBED_DIM = 256


def _hash_embed(texts: list[str], dim: int, seed: int) -> np.ndarray:
    """Feature-hashed token-count embeddings, l2-normalized. One blake2b
    per distinct token per batch (cached)."""
    out = np.zeros((len(texts), dim), dtype=np.float64)
    cache: dict[str, int] = {}
    for i, t in enumerate(texts):
        for tok in t.lower().split():
            b = cache.get(tok)
            if b is None:
                h = hashlib.blake2b(
                    tok.encode(), digest_size=8, salt=seed.to_bytes(8, "big")
                ).digest()
                b = int.from_bytes(h, "big") % dim
                cache[tok] = b
            out[i, b] += 1.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


class CrossEncoderStage:
    """Callable-class stage for ``map_batches``: actor-pool reranker."""

    def __init__(self, query: str, model_name: str = STUB_MODEL):
        if model_name != STUB_MODEL:
            if model_name in KNOWN_REAL_MODELS:
                raise NotImplementedError(
                    f"model {model_name!r}: real cross-encoder weights are "
                    "not available in this environment; use "
                    f"{STUB_MODEL!r} (deterministic stand-in) or plug a "
                    "real model into CrossEncoderStage._load_model"
                )
            raise ValueError(f"unknown reranker model {model_name!r}")
        self.model_name = model_name
        self.query = query
        self._load_model()
        # query embedded once per actor, not per batch
        self.q_vec = _hash_embed([query], EMBED_DIM, self.seed)[0]

    def _load_model(self) -> None:
        # stand-in "weights": the deterministic hashing seed
        self.seed = int.from_bytes(
            hashlib.blake2b(self.model_name.encode(), digest_size=4).digest(),
            "big",
        )

    def _score_pairs(self, docs: list[str]) -> np.ndarray:
        d = _hash_embed(docs, EMBED_DIM, self.seed)
        return d @ self.q_vec

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = self._score_pairs(batch.column("code").to_pylist())
        cols = {name: batch.column(name) for name in batch.column_names}
        cols["score"] = pa.array(scores, pa.float64())
        cols["bm25_score"] = pa.array(scores, pa.float64())
        return pa.table(cols)


def rerank(
    t: pa.Table,
    query: str,
    model_name: str = STUB_MODEL,
    concurrency: int = 2,
    batch_size: int = 64,
) -> pa.Table:
    """Rerank a result table (must carry a ``code`` column) with the
    cross-encoder actor pool; replaces score/bm25_score and re-sorts
    (bert_reranker.rs:394-430 semantics with a deterministic tiebreak)."""
    import ray.data

    if t.num_rows == 0:
        return t
    # validate the model name eagerly (driver-side) for a clean error
    CrossEncoderStage(query, model_name)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(
        CrossEncoderStage,
        fn_constructor_kwargs={"query": query, "model_name": model_name},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    merged = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
    sort_keys = [("score", "descending"), ("path", "ascending")]
    if "start_line" in merged.column_names:
        sort_keys.append(("start_line", "ascending"))
    return merged.sort_by(sort_keys)

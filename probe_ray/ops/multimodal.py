"""Multimodal column plumbing: opaque binary payloads + actor-pool stages.

No image/audio libraries exist in this container, so the *decode* kernels
are deterministic stand-ins (clearly marked), but the Ray-side plumbing is
real and tested: binary columns flow zero-copy through Arrow batches, the
feature extractor is a callable CLASS used as a map_batches actor pool
("model" loaded once in __init__, per-batch inference in __call__), and
batch sizes are kept small because payload rows are large."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def encode_payloads(sf_dir: str):
    """documents.text -> opaque binary payload column (stands in for image
    bytes): (doc_id, payload: binary, payload_bytes: int64, kind)."""
    import ray.data

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        payloads = [t.encode() for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": pa.array(payloads, pa.binary()),
                "payload_bytes": pa.array(
                    [len(p) for p in payloads], pa.int64()
                ),
                "kind": pa.array(["blob"] * len(payloads), pa.string()),
            }
        )

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet").map_batches(
        fn, batch_format="pyarrow", batch_size=64
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode would live here (PIL/cv2 not in this container)."""
    raise NotImplementedError(
        "image decode requires an image library not present in this "
        "environment; use FakeFeatureExtractor for the pipeline plumbing"
    )


class FakeFeatureExtractor:
    """Actor-pool stage: deterministic stand-in for a batched model.

    __init__ = one-time 'model load' per actor; __call__ = per-batch
    inference. Swap _featurize for a real decode+embed at deployment."""

    def __init__(self, dim: int = 4):
        self.dim = dim
        # stand-in for loading model weights (once per actor)
        self.weights = np.arange(1, dim + 1, dtype=np.int64)

    def _featurize(self, payload: bytes) -> list[int]:
        h = hashlib.blake2b(payload, digest_size=8 * self.dim).digest()
        return [
            int.from_bytes(h[i * 8 : (i + 1) * 8], "big") % 1000003
            for i in range(self.dim)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = [self._featurize(p) for p in payloads]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload_bytes": batch.column("payload_bytes"),
                "feature": pa.array(feats, pa.list_(pa.int64())),
            }
        )


def multimodal_features(sf_dir: str, concurrency: int = 2):
    """encode -> actor-pool feature extraction; returns
    (doc_id, payload_bytes, feature list<int64>)."""
    return encode_payloads(sf_dir).map_batches(
        FakeFeatureExtractor,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def payload_sizes(sf_dir: str):
    """(doc_id, payload_bytes) — SQL-checkable (octet_length)."""
    import pyarrow.compute as pc

    ds = encode_payloads(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "payload_bytes"])

    return ds.map_batches(fn, batch_format="pyarrow")

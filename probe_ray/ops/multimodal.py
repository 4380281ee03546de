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

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(fn, batch_format="pyarrow", batch_size=64)


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


class FrameSampler:
    """Actor-pool stage: video-style frame sampling plumbing.

    Real frame decode (ffmpeg/cv2) is absent in this container; the
    deterministic stand-in slices the payload into ``n_frames`` byte
    ranges and 'decodes' each to a fixed-size feature. The Ray plumbing
    is real: one input row fans out to one row per sampled frame
    (batch-level flat-map), binary columns flow zero-copy, and the
    'decoder' is initialised once per actor."""

    def __init__(self, n_frames: int = 4, dim: int = 4):
        self.n_frames = n_frames
        self.dim = dim

    def _frame_feature(self, chunk: bytes) -> list[int]:
        h = hashlib.blake2b(chunk, digest_size=8 * self.dim).digest()
        return [
            int.from_bytes(h[i * 8 : (i + 1) * 8], "big") % 1000003
            for i in range(self.dim)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_doc, out_frame, out_feat = [], [], []
        for did, p in zip(doc_ids, payloads):
            n = max(1, min(self.n_frames, len(p) or 1))
            step = max(1, len(p) // n)
            for f in range(n):
                chunk = p[f * step : (f + 1) * step] or b"\x00"
                out_doc.append(did)
                out_frame.append(f)
                out_feat.append(self._frame_feature(chunk))
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "frame_idx": pa.array(out_frame, pa.int32()),
                "feature": pa.array(out_feat, pa.list_(pa.int64())),
            }
        )


def frame_features(sf_dir: str, n_frames: int = 4, concurrency: int = 2):
    """encode -> actor-pool frame sampling: (doc_id, frame_idx, feature).
    One input row fans out to n_frames output rows."""
    return encode_payloads(sf_dir).map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def resize_features(sf_dir: str, out_dim: int = 2, concurrency: int = 2):
    """'Resize' stage: average-pool the extracted feature vectors to a
    smaller fixed dim (stand-in for image resize; deterministic ints):
    (doc_id, feature list<int64> of out_dim)."""

    def fn(batch: pa.Table) -> pa.Table:
        feats = np.asarray(batch.column("feature").to_pylist(), dtype=np.int64)
        k = feats.shape[1] // out_dim
        pooled = feats[:, : k * out_dim].reshape(len(feats), out_dim, k).mean(
            axis=2
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "feature": pa.array(pooled.tolist(), pa.list_(pa.int64())),
            }
        )

    return multimodal_features(sf_dir, concurrency=concurrency).map_batches(
        fn, batch_format="pyarrow"
    )


def payload_sizes(sf_dir: str):
    """(doc_id, payload_bytes) — SQL-checkable (octet_length)."""
    import pyarrow.compute as pc

    ds = encode_payloads(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "payload_bytes"])

    return ds.map_batches(fn, batch_format="pyarrow")

"""Cross-encoder rerank stage (search/rerank.py): actor-pool plumbing
with the deterministic stand-in model (bert_reranker.rs analog)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from probe_ray.search.rerank import (
    STUB_MODEL,
    CrossEncoderStage,
    _hash_embed,
    rerank,
)


def _table():
    return pa.table(
        {
            "score": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "path": pa.array(["a.rs", "b.rs", "c.rs"], pa.string()),
            "start_line": pa.array([1, 1, 1], pa.int64()),
            "code": pa.array(
                [
                    "error handling retry logic",
                    "unrelated parser tokens",
                    "error error error handling handling",
                ],
                pa.string(),
            ),
        }
    )


def test_stage_scores_relevance_deterministically():
    st = CrossEncoderStage("error handling")
    s = st._score_pairs(_table().column("code").to_pylist())
    # doc with only query terms scores highest; unrelated doc lowest
    assert s[2] > s[0] > s[1]
    s2 = CrossEncoderStage("error handling")._score_pairs(
        _table().column("code").to_pylist()
    )
    assert (s == s2).all()


def test_unknown_and_real_models_rejected():
    with pytest.raises(NotImplementedError, match="stand-in"):
        CrossEncoderStage("q", "ms-marco-tinybert")
    with pytest.raises(ValueError, match="unknown"):
        CrossEncoderStage("q", "nope")


def test_embed_normalized():
    import numpy as np

    v = _hash_embed(["a b c", ""], 64, 7)
    assert abs(np.linalg.norm(v[0]) - 1.0) < 1e-12
    assert (v[1] == 0).all()  # empty doc -> zero vector, no NaN


def test_rerank_replaces_scores_and_sorts(ray_session):
    out = rerank(_table(), "error handling", STUB_MODEL)
    assert out.column("path").to_pylist()[0] == "c.rs"
    assert out.column("score").to_pylist() == sorted(
        out.column("score").to_pylist(), reverse=True
    )
    assert out.column("score").equals(out.column("bm25_score"))
    # deterministic across runs
    out2 = rerank(_table(), "error handling", STUB_MODEL)
    assert out.equals(out2)


def test_rerank_empty(ray_session):
    t = _table().slice(0, 0)
    assert rerank(t, "q").num_rows == 0

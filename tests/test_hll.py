"""HyperLogLog distinct-token sketch: accuracy vs exact counts,
max-merge partitioning invariance, and the e2e op vs a DuckDB exact
count (the op has no SQL oracle in the driver — the estimate is pinned
here instead)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from probe_ray.ops.text import (
    _HLL_P,
    _hll_estimate,
    _hll_update,
    _term_hash64,
)

SF_DIR = "/root/testdata/sf0.001"


def _registers(words: list[str], p: int = _HLL_P) -> np.ndarray:
    reg = np.zeros(1 << p, np.uint8)
    _hll_update(reg, _term_hash64(words), p)
    return reg


def test_accuracy_large_vocab():
    # 200k distinct strings; m=4096 -> standard error ~1.6%, assert 5%
    words = [f"tok{i}" for i in range(200_000)]
    _, est = _hll_estimate(_registers(words))
    assert abs(est - 200_000) / 200_000 < 0.05


def test_accuracy_small_vocab_linear_counting():
    words = [f"w{i}" for i in range(50)]
    _, est = _hll_estimate(_registers(words))
    # linear-counting regime: near-exact up to register collisions
    assert abs(est - 50) <= 2


def test_duplicates_do_not_move_estimate():
    words = [f"tok{i}" for i in range(1000)]
    assert np.array_equal(_registers(words), _registers(words * 7))


def test_merge_invariance_across_partitionings():
    words = [f"item-{i}" for i in range(10_000)]
    full = _registers(words)
    for nsplits in (2, 3, 7):
        parts = [words[i::nsplits] for i in range(nsplits)]
        merged = np.zeros_like(full)
        for ws in parts:
            merged = np.maximum(merged, _registers(ws))
        assert np.array_equal(full, merged)


def test_rho_convention():
    # suffix 0 must map to rho = (64 - p) + 1; a top-bit suffix to 1
    p = _HLL_P
    reg = np.zeros(1 << p, np.uint8)
    _hll_update(reg, np.array([0], dtype=np.uint64), p)
    assert reg[0] == (64 - p) + 1
    reg2 = np.zeros(1 << p, np.uint8)
    h = np.array([(1 << (64 - p - 1))], dtype=np.uint64)  # MSB of suffix set
    _hll_update(reg2, h, p)
    assert reg2[0] == 1


def test_e2e_matches_exact_distinct(ray_session):
    import duckdb

    from probe_ray.ops.text import hll_distinct_tokens

    t = hll_distinct_tokens(SF_DIR)
    est = t.column("est_distinct")[0].as_py()
    exact = duckdb.connect().execute(
        "WITH tok AS (SELECT unnest(string_split_regex("
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS w "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')) "
        "SELECT count(DISTINCT w) FROM tok WHERE w <> ''"
    ).fetchone()[0]
    assert exact > 0
    assert abs(est - exact) <= max(1, int(0.05 * exact))

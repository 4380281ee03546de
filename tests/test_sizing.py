"""Shuffle-input sizing invariants (ops/sizing.py): floor at bench
scale, linear in bytes at production scale, hard cap."""

from probe_ray.ops.sizing import SHUFFLE_TARGET_BYTES, shuffle_parts


def test_floor_dominates_small_inputs():
    assert shuffle_parts(0) == 8
    assert shuffle_parts(SHUFFLE_TARGET_BYTES * 7) == 8
    assert shuffle_parts(5 * 64, lo=4) == 4


def test_linear_region():
    assert shuffle_parts(SHUFFLE_TARGET_BYTES * 100) == 100
    # ~100 TB in 64 MB blocks hits the cap, not a million tasks
    assert shuffle_parts(100 * (1 << 40)) == 1024


def test_custom_bounds():
    assert shuffle_parts(1 << 50, hi=64) == 64

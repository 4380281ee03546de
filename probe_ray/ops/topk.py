"""Distributive top-k over a Dataset without a Sort all-to-all.

Top-k is distributive: the global top-k is contained in the union of
every block's local top-k. Pruning per block (one vectorized sort each)
and merging the <= k x n_blocks survivors on the driver replaces a full
exchange — at web scale the pruned merge is bounded by the block-count
cap (ops/sizing.py, 1024), not by the input size."""

from __future__ import annotations

import pyarrow as pa


def dataset_topk(ds, sort_keys: list[tuple[str, str]], k: int):
    """Global top-k rows of ``ds`` under ``sort_keys`` (pyarrow
    sort_indices convention), returned as a Dataset for API parity with
    ``.sort().limit(k)``.

    Lazy end to end: per-block prune (map_batches) -> coalesce the
    <= k x n_blocks survivors into one block (repartition(1) — an
    exchange over a bounded, tiny input, not the full dataset) -> final
    sort+slice in a downstream task. Building the result does not run
    the upstream pipeline; execution happens when the caller consumes
    the Dataset."""
    import pyarrow.compute as pc

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        return batch.take(pc.sort_indices(batch, sort_keys=sort_keys)[:k])

    def merge(batch: pa.Table) -> pa.Table:
        # one block after repartition(1); empty batches pass through so
        # an empty input keeps its schema (sort_indices would raise on
        # missing sort columns of a schemaless slice). Non-empty input
        # always sorts — the survivors arrive block-ordered, not merged.
        if batch.num_rows == 0:
            return batch
        return batch.take(pc.sort_indices(batch, sort_keys=sort_keys)[:k])

    return (
        ds.map_batches(prune, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )

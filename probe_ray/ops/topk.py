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
    ``.sort().limit(k)``."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        return batch.take(pc.sort_indices(batch, sort_keys=sort_keys)[:k])

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    tables = ray.get(list(pruned.to_arrow_refs()))
    nonempty = [t for t in tables if t.num_rows]
    if not nonempty:
        # preserve the schema when any (empty) block carries one — same
        # contract as .sort().limit(k) on an empty dataset
        base = next((t for t in tables if t.schema.names), pa.table({}))
        return ray.data.from_arrow(base.slice(0, 0))
    t = pa.concat_tables(nonempty, promote_options="default")
    return ray.data.from_arrow(
        t.take(pc.sort_indices(t, sort_keys=sort_keys)[:k])
    )

"""Shuffle-input sizing shared by the wide (all-to-all) pipelines.

Ray Data's sort-based shuffle schedules O(input_blocks x partitions)
intermediate objects, so a dataset entering a groupby/sort as many
micro-blocks pays pure scheduling overhead.  These helpers right-size the
input block count to ~SHUFFLE_TARGET_BYTES per block before the exchange:
at bench scale the floor wins (a handful of blocks); at 100-TB scale
``est_bytes // 64MB`` dominates and the repartition is a near-no-op merge
of already-large blocks.
"""

from __future__ import annotations

import os

SHUFFLE_TARGET_BYTES = 64 << 20


def shuffle_parts(est_bytes: int, lo: int = 8, hi: int = 1024) -> int:
    """Input-block count for a dataset about to enter an all-to-all.

    Measured: a 64-block -> 8-block coalesce cuts a bench-scale groupby
    ~4x (see ops/dedup.py call sites).
    """
    return int(max(lo, min(hi, est_bytes // SHUFFLE_TARGET_BYTES)))


def _table_files(sf_dir: str, table: str) -> list[str]:
    """The parquet file(s) of one input table: the single
    ``<table>.parquet`` file of the driver's testdata, or every
    ``part-*.parquet`` when that path is a directory (the rehearsal
    corpora are multi-file for read parallelism)."""
    import glob

    p = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(p):
        return sorted(glob.glob(os.path.join(p, "*.parquet")))
    return [p]


def table_rows(sf_dir: str, table: str) -> int:
    """Row count of one input table from parquet metadata (no data read)."""
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in _table_files(sf_dir, table)
    )


def table_column_max(sf_dir: str, table: str, column: str):
    """Column max from parquet row-group footer statistics (no data
    read). Returns None when the footer carries no stats for the column
    — callers must fall back conservatively."""
    import pyarrow.parquet as pq

    mx = None
    for f in _table_files(sf_dir, table):
        pf = pq.ParquetFile(f)
        ci = pf.schema_arrow.get_field_index(column)
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(ci).statistics
            if st is None or st.max is None:
                return None
            mx = st.max if mx is None else max(mx, st.max)
    return mx


def disc_quantile_from_hist(counts, n_total: int, pct: float) -> int:
    """Exact discrete pct-quantile from a value histogram (DuckDB
    quantile_disc convention: the sorted value at index
    max(0, ceil(pct*n)-1)). counts[i] = occurrences of value i; returns
    the bin index. THE single definition of the quantile convention —
    quality_percentile_filter(_by_lang) and ann.prototype_filter all
    thread through here so the convention can never drift between the
    ops and their oracles."""
    import numpy as np

    idx = max(0, int(np.ceil(pct * n_total)) - 1)
    return int(np.searchsorted(np.cumsum(counts), idx + 1))

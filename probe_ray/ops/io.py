"""Source/sink format coverage beyond parquet: JSONL and CSV round
trips of the documents table through Ray Data's native readers/writers.

Each op writes the documents to sharded files under /tmp (one file per
input block — the partitioned, resumable layout the repo's parquet
sinks use), reads them back with ``ray.data.read_json`` /
``ray.data.read_csv``, and returns a per-lang aggregate computed FROM
THE ROUNDTRIPPED ROWS. The DuckDB oracle computes the same aggregate
from the original parquet table, so an oracle match proves the
write -> read cycle is lossless for every row (ids, langs and text
lengths all participate in the sums).

Reference analogs: probe's multi-format output surface
(src/search/formatter.rs) and stdin/file ingestion (src/extract.rs) —
re-expressed here as Dataset sinks/sources rather than CLI streams.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa

from probe_ray.ops.text import _read_documents as _read_docs_cols

_CACHE_ROOT = "/tmp/probe_ray_cache/io"


def _read_documents(sf_dir: str):
    return _read_docs_cols(sf_dir, ["doc_id", "lang", "source", "text"])


def _lang_rollup(ds) -> "pa.Table":
    """(lang, n_docs, sum_doc_id, sum_chars) from a roundtripped
    Dataset — per-batch partials, tiny per-lang exchange."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pa.table(
            {
                "lang": batch.column("lang"),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "did": batch.column("doc_id").cast(pa.int64()),
                "chars": pc.utf8_length(batch.column("text")).cast(pa.int64()),
            }
        )
        return t.group_by(["lang"]).aggregate(
            [("one", "sum"), ("did", "sum"), ("chars", "sum")]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("one_sum"), Sum("did_sum"), Sum("chars_sum"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch.column("lang"),
                "n_docs": batch.column("sum(one_sum)").cast(pa.int64()),
                "sum_doc_id": batch.column("sum(did_sum)").cast(pa.int64()),
                "sum_chars": batch.column("sum(chars_sum)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort("lang")


def _roundtrip(sf_dir: str, fmt: str):
    import ray.data

    # per-call unique scratch dir: two concurrent roundtrips over the
    # same corpus (parallel bench/test workers) must not delete or
    # overwrite each other's shard files mid-read
    root = os.path.join(
        _CACHE_ROOT,
        hashlib.sha1(sf_dir.encode()).hexdigest()[:12],
    )
    os.makedirs(root, exist_ok=True)
    out = tempfile.mkdtemp(prefix=f"{fmt}-", dir=root)
    docs = _read_documents(sf_dir)
    try:
        if fmt == "jsonl":
            docs.write_json(out)
            back = ray.data.read_json(out)
        elif fmt == "csv":
            import pyarrow.csv as pacsv

            docs.write_csv(out)
            # newlines_in_values: write_csv legally quotes embedded
            # newlines; default ParseOptions would split such records
            # mid-row
            back = ray.data.read_csv(
                out,
                parse_options=pacsv.ParseOptions(newlines_in_values=True),
            )
        else:  # pragma: no cover
            raise ValueError(fmt)
        # materialize before cleanup: the rollup must finish reading the
        # shard files while they still exist
        rolled = _lang_rollup(back).materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return rolled


def jsonl_roundtrip(sf_dir: str):
    """documents -> sharded JSONL -> read_json -> per-lang rollup.
    Oracle-matches the same rollup over the original parquet iff the
    round trip preserved every row."""
    return _roundtrip(sf_dir, "jsonl")


def csv_roundtrip(sf_dir: str):
    """documents -> sharded CSV -> read_csv -> per-lang rollup (same
    lossless-roundtrip proof as jsonl_roundtrip)."""
    return _roundtrip(sf_dir, "csv")


def hive_partitioned_roundtrip(sf_dir: str):
    """documents -> lang-partitioned parquet (hive layout: one
    ``lang=<v>/`` directory per language, the resumable key-range
    layout the index sinks use) -> partition-pruned read-back ->
    per-lang rollup. The read back passes the partition column's
    values through the DIRECTORY NAMES, not the files (the column is
    dropped from the row groups), so an oracle match proves both the
    partitioned write and the hive-schema reconstruction are lossless.

    Scale note: `partition_cols` shuffles nothing — each task writes
    its own block's rows into per-value files under the value
    directories, so the sink streams at any corpus size; readers prune
    whole directories by partition filter."""
    import ray.data

    root = os.path.join(
        _CACHE_ROOT, hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    )
    os.makedirs(root, exist_ok=True)
    out = tempfile.mkdtemp(prefix="hive-", dir=root)
    docs = _read_documents(sf_dir)
    try:
        docs.write_parquet(out, partition_cols=["lang"])
        back = ray.data.read_parquet(out)
        rolled = _lang_rollup(back).materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return rolled

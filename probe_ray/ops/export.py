"""Training-data export ops: deterministic sequence packing and a seeded
deterministic shuffle-export.

Both are built on one distributed primitive — an exact exclusive
prefix-sum over an ordered key (a "range-offset scan"): per-range partial
sums are a tiny driver-combined aggregate (one row per range, never per
doc), their exclusive cumsum is broadcast once via ``ray.put``, and every
range then finishes its local scan independently inside one
``groupby(range).map_groups`` stage.  This is the classic two-phase
parallel scan expressed in Ray Data: no global sort, no sequential
dependency, one bounded all-to-all.  At 10^12 docs the driver-side state
is ``n_docs / range_size`` (packing) or ``shards x 65536`` (shuffle)
integers — megabytes, not the data.

Reference parity note: the reference engine has no training-export
surface; these ops extend the engine for LLM-pipeline use per the
project brief (sequence packing = GPT-style concat-and-cut batch prep;
shuffle-export = seeded, resumable global example shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from probe_ray.ops.sizing import (
    shuffle_parts,
    table_column_max,
    table_rows,
)
from probe_ray.ops.text import _read_documents, _split_words

#: Tokens per packed training sequence (GPT-style concat-and-cut).
PACK_BUDGET = 64
#: Docs per prefix-sum range; drives driver-side offset-table size.
PACK_RANGE = 128

#: 32-bit-safe affine mix over the largest 32-bit prime: every product
#: fits uint64 exactly (numpy) and HUGEINT exactly (DuckDB), so the Ray
#: and SQL sides agree bit-for-bit on every doc_id up to 2^63.
MIX_P = 4294967291
MIX_A = 2654435761
MIX_B = 40503
EXPORT_SEED = 177
EXPORT_SHARDS = 16
#: Order-compatible hash buckets inside a shard (hv >> 16): pos within a
#: shard = bucket's exclusive prefix count + local rank, so no shard-wide
#: sort is ever needed.
EXPORT_BUCKET_SHIFT = 16
_NBUCKETS = 1 << EXPORT_BUCKET_SHIFT


def _mix_hash(doc_id: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic 32-bit hash of int64 doc_ids, exactly reproducible
    in ANSI SQL: ((A*lo) % P + (B*hi) % P + seed) % P with lo/hi the
    32-bit halves. Each product < 2^64 so uint64 wrapping never fires."""
    x = doc_id.astype(np.uint64)
    lo = x & np.uint64(0xFFFFFFFF)
    hi = x >> np.uint64(32)
    p = np.uint64(MIX_P)
    h = (
        (np.uint64(MIX_A) * lo) % p
        + (np.uint64(MIX_B) * hi) % p
        + np.uint64(seed)
    ) % p
    return h.astype(np.int64)


def pack_sequences(
    sf_dir: str, budget: int = PACK_BUDGET, range_size: int = PACK_RANGE
):
    """GPT-style sequence packing: concatenate every document's
    whitespace tokens in doc_id order and cut the stream every ``budget``
    tokens. Emits one row per (doc, sequence) overlap:
    (doc_id, seq_id, seq_off, n_toks) — where the doc's slice lands and
    how many of its tokens it contributes. Zero-token docs are omitted.

    Scale shape: the per-doc token counts (O(n_docs) rows, ~0.02% of the
    token stream) are materialized ONCE so the expensive tokenize pass is
    not run twice; the global positions come from the range-offset scan
    (tiny driver cumsum + broadcast), and the only all-to-all moves count
    rows, never tokens or text."""
    import ray

    n_docs = table_rows(sf_dir, "documents")
    ngroups = shuffle_parts(n_docs * 24, lo=64, hi=1 << 20)

    def counts_fn(batch: pa.Table) -> pa.Table:
        nd, _, doc_idx, codes, words = _split_words(batch)
        if codes.size:
            nonempty = np.array(
                [bool(w) for w in words.to_pylist()], dtype=bool
            )
            n = np.bincount(
                doc_idx,
                weights=nonempty[codes].astype(np.float64),
                minlength=nd,
            ).astype(np.int64)
        else:
            n = np.zeros(nd, np.int64)
        did = batch.column("doc_id").to_numpy()
        rng = (did // range_size).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did),
                "rng": pa.array(rng),
                "gkey": pa.array(rng % ngroups),
                "n": pa.array(n),
            }
        )

    counts = (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(counts_fn, batch_format="pyarrow")
        .materialize()
    )
    return _pack_counts(counts, n_docs, budget, range_size)


def _pack_counts(
    counts,
    n_docs: int,
    budget: int,
    range_size: int,
    offsets: dict | None = None,
    key_col: str | None = None,
    label_col: str | None = None,
):
    """Shared packing tail over a MATERIALIZED counts Dataset
    (doc_id, rng|key, gkey, n [, label]): range-offset scan +
    bytes-bounded grouped packing. THE single packing kernel —
    pack_sequences, curated_pack and pack_sequences_by_lang all thread
    through here. With key_col/offsets, runs segment on the provided
    composite key (e.g. lang * n_ranges + range, offsets precomputed
    with a per-stream reset) instead of doc_id // range_size; label_col
    is carried through to the output (the per-stream label)."""
    import ray

    if offsets is None:
        offsets = _range_offsets(counts, "rng", "n")
    off_ref = ray.put(offsets)
    # group key is DECOUPLED from the range: ranges hash into ~64 MB
    # groups, each group call finishes every range it holds vectorized.
    # One map_groups call per group — bounded by bytes, not by range
    # count (10^12 docs / range_size calls would be pure scheduling).
    empty_cols = {}
    if label_col:
        empty_cols[label_col] = pa.array([], pa.string())
    empty_cols.update(
        {
            "doc_id": pa.array([], pa.int64()),
            "seq_id": pa.array([], pa.int64()),
            "seq_off": pa.array([], pa.int64()),
            "n_toks": pa.array([], pa.int64()),
        }
    )
    empty = pa.table(empty_cols)

    def pack(group: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        did = group.column("doc_id").to_numpy()
        if did.size == 0:
            return empty
        n = group.column("n").to_numpy()
        if key_col is not None:
            keyv = group.column(key_col).to_numpy()
            order = np.lexsort((did, keyv))
        else:
            order = np.argsort(did, kind="stable")
        did, n = did[order], n[order]
        label = (
            group.column(label_col).take(pa.array(order))
            if label_col
            else None
        )
        # within a run, doc_id order is stream order; segment into
        # per-key runs and give each its broadcast base offset + local
        # exclusive cumsum
        rngv = (
            group.column(key_col).to_numpy()[order]
            if key_col is not None
            else did // range_size
        )
        new = np.r_[True, rngv[1:] != rngv[:-1]]
        run_id = np.cumsum(new) - 1
        cs = np.concatenate(([0], np.cumsum(n[:-1]))).astype(np.int64)
        starts = np.flatnonzero(new)
        base = np.array(
            [off.get(int(r), 0) for r in rngv[starts]], dtype=np.int64
        )
        s = base[run_id] + (cs - cs[starts][run_id])
        keep = n > 0
        sel = np.flatnonzero(keep)
        did, n, s = did[keep], n[keep], s[keep]
        if label is not None:
            label = label.take(pa.array(sel))
        first = s // budget
        last = (s + n - 1) // budget
        reps = (last - first + 1).astype(np.int64)
        idx = np.repeat(np.arange(did.size, dtype=np.int64), reps)
        run_starts = np.concatenate(([0], np.cumsum(reps[:-1])))
        within = np.arange(idx.size, dtype=np.int64) - run_starts[idx]
        seq_id = first[idx] + within
        sb = seq_id * budget
        st = np.maximum(sb, s[idx])
        en = np.minimum(sb + budget, (s + n)[idx])
        cols = {}
        if label is not None:
            cols[label_col] = label.take(pa.array(idx))
        cols.update(
            {
                "doc_id": pa.array(did[idx]),
                "seq_id": pa.array(seq_id.astype(np.int64)),
                "seq_off": pa.array((st - sb).astype(np.int64)),
                "n_toks": pa.array((en - st).astype(np.int64)),
            }
        )
        return pa.table(cols)

    sort_keys = ([label_col] if label_col else []) + ["doc_id", "seq_id"]
    return (
        counts.repartition(shuffle_parts(n_docs * 24))
        .groupby("gkey")
        .map_groups(pack, batch_format="pyarrow")
        .sort(sort_keys)
    )


#: Per-source char budget for budget_select (and its oracle SQL).
SELECT_BUDGET = 4000
#: Coarse histogram bucket width for the threshold search.
SELECT_BUCKET_W = 64


def budget_select(
    sf_dir: str,
    budget: int = SELECT_BUDGET,
    coarse_width: int = SELECT_BUCKET_W,
):
    """Per-source budgeted selection (data-mixture curation): within each
    source, rank docs by (n_chars DESC, doc_id ASC) and keep a doc iff
    the running char total of the docs ranked before it is < ``budget``
    — the greedy prefix a window-cumsum SQL expresses directly.

    Distributed WITHOUT any per-source sort: a coarse per-(source,
    bucket) histogram (driver state = sources x buckets integers) finds
    each source's boundary bucket; an exact value histogram restricted
    to boundary buckets finds the threshold value v* and the tie count
    k; the k tie-breaking doc_ids come from a per-batch k-smallest prune
    + driver merge (bounded, like ops/topk). The final pass is one
    broadcast-filter map_batches. Every driver-side collection is a
    bounded aggregate, never the doc rows."""
    import pyarrow.dataset as pads
    import ray

    cols = ["doc_id", "source", "n_chars"]

    # phase 1: coarse per-(source, bucket) count+char partials
    def coarse(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_numpy(zero_copy_only=False)
        nc = batch.column("n_chars").to_numpy()
        b = nc // coarse_width
        key = np.char.add(np.char.add(src.astype(str), "\x1f"), b.astype(str))
        u, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "key": pa.array(u.tolist(), pa.string()),
                "cnt": pa.array(np.bincount(inv).astype(np.int64)),
                "chars": pa.array(
                    np.bincount(inv, weights=nc.astype(np.float64)).astype(
                        np.int64
                    )
                ),
            }
        )

    hist: dict[str, dict[int, tuple[int, int]]] = {}
    for row in (
        _read_documents(sf_dir, ["source", "n_chars"])
        .map_batches(coarse, batch_format="pyarrow")
        .take_all()
    ):
        s, b = row["key"].split("\x1f")
        c0, h0 = hist.setdefault(s, {}).get(int(b), (0, 0))
        hist[s][int(b)] = (c0 + row["cnt"], h0 + row["chars"])

    # driver: boundary bucket per source (walk buckets descending)
    boundary: dict[str, int] = {}
    base_above: dict[str, int] = {}
    keep_all: set[str] = set()
    for s, bk in hist.items():
        cum = 0
        hit = None
        for b in sorted(bk, reverse=True):
            cnt, chars = bk[b]
            if cum + chars >= budget:
                hit = b
                break
            cum += chars
        if hit is None:
            keep_all.add(s)
        else:
            boundary[s] = hit
            base_above[s] = cum

    spec: dict[str, tuple[int, int]] = {}  # source -> (v*, k ties kept)
    if boundary:
        flt = None
        for s, b in boundary.items():
            e = (
                (pads.field("source") == s)
                & (pads.field("n_chars") >= b * coarse_width)
                & (pads.field("n_chars") < (b + 1) * coarse_width)
            )
            flt = e if flt is None else (flt | e)

        def fine(batch: pa.Table) -> pa.Table:
            src = batch.column("source").to_numpy(zero_copy_only=False)
            nc = batch.column("n_chars").to_numpy()
            key = np.char.add(
                np.char.add(src.astype(str), "\x1f"), nc.astype(str)
            )
            u, inv = np.unique(key, return_inverse=True)
            return pa.table(
                {
                    "key": pa.array(u.tolist(), pa.string()),
                    "cnt": pa.array(np.bincount(inv).astype(np.int64)),
                }
            )

        vals: dict[str, dict[int, int]] = {}
        for row in (
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet",
                columns=["source", "n_chars"],
                filter=flt,
            )
            .map_batches(fine, batch_format="pyarrow")
            .take_all()
        ):
            s, v = row["key"].split("\x1f")
            d = vals.setdefault(s, {})
            d[int(v)] = d.get(int(v), 0) + row["cnt"]

        for s, by_v in vals.items():
            cum = base_above[s]
            for v in sorted(by_v, reverse=True):
                cnt = by_v[v]
                if cum + v * cnt >= budget:
                    # loop invariant cum < budget means a zero-char value
                    # can never be the crossing point, so v > 0 here and
                    # 1 <= k <= cnt
                    spec[s] = (v, -((budget - cum) // -v))
                    break
                cum += v * cnt
            assert s in spec, "boundary bucket must contain the crossing"

    # phase 3: the k smallest doc_ids among value-v* ties, per source
    tie_sources = {s: vk for s, vk in spec.items() if 0 < vk[1]}
    tie_ids: dict[str, np.ndarray] = {}
    if tie_sources:
        flt = None
        for s, (v, _k) in tie_sources.items():
            e = (pads.field("source") == s) & (pads.field("n_chars") == v)
            flt = e if flt is None else (flt | e)

        def prune(batch: pa.Table) -> pa.Table:
            src = batch.column("source").to_numpy(zero_copy_only=False)
            did = batch.column("doc_id").to_numpy()
            keep = np.zeros(did.size, bool)
            for s, (_v, k) in tie_sources.items():
                m = np.flatnonzero(src == s)
                if m.size > k:
                    m = m[np.argpartition(did[m], k - 1)[:k]]
                keep[m] = True
            sel = np.flatnonzero(keep)
            return pa.table(
                {
                    "source": pa.array(src[sel].tolist(), pa.string()),
                    "doc_id": pa.array(did[sel]),
                }
            )

        pooled: dict[str, list[int]] = {}
        for row in (
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet",
                columns=["doc_id", "source"],
                filter=flt,
            )
            .map_batches(prune, batch_format="pyarrow")
            .take_all()
        ):
            pooled.setdefault(row["source"], []).append(row["doc_id"])
        for s, ids in pooled.items():
            k = tie_sources[s][1]
            tie_ids[s] = np.sort(np.array(ids, dtype=np.int64))[:k]

    bc = ray.put((keep_all, spec, tie_ids))

    def select(batch: pa.Table) -> pa.Table:
        ka, sp, ti = ray.get(bc)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        nc = batch.column("n_chars").to_numpy()
        did = batch.column("doc_id").to_numpy()
        keep = np.zeros(did.size, bool)
        for s in np.unique(src):
            m = src == s
            if s in ka:
                keep |= m
            elif s in sp:
                v, _k = sp[s]
                keep |= m & (nc > v)
                if s in ti:
                    keep |= m & (nc == v) & np.isin(did, ti[s])
        sel = np.flatnonzero(keep)
        return pa.table(
            {
                "source": pa.array(src[sel].tolist(), pa.string()),
                "doc_id": pa.array(did[sel]),
                "n_chars": pa.array(nc[sel]),
            }
        )

    return (
        _read_documents(sf_dir, cols)
        .map_batches(select, batch_format="pyarrow")
        .sort(["source", "doc_id"])
    )


def _range_offsets(ds, key: str, val: str) -> dict[int, int]:
    """Exclusive prefix-sum of per-``key`` totals of ``val``, combined on
    the driver. The dataset rows never leave the cluster — only one
    (key, partial) row per (batch, key) does, and distinct keys are
    bounded by construction (n/range_size or shards*buckets)."""

    def partials(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy()
        v = batch.column(val).to_numpy()
        u, inv = np.unique(k, return_inverse=True)
        t = np.bincount(inv, weights=v.astype(np.float64)).astype(np.int64)
        return pa.table({"k": pa.array(u), "t": pa.array(t)})

    totals: dict[int, int] = {}
    for row in ds.map_batches(partials, batch_format="pyarrow").take_all():
        totals[row["k"]] = totals.get(row["k"], 0) + row["t"]
    offsets: dict[int, int] = {}
    acc = 0
    for k in sorted(totals):
        offsets[k] = acc
        acc += totals[k]
    return offsets


def _shard_grp_offsets(ds) -> dict[int, int]:
    """Like _range_offsets, but the running sum resets at each shard
    boundary (grp = shard * _NBUCKETS + bucket, so sorted grp order walks
    buckets within a shard before moving to the next shard)."""

    def partials(batch: pa.Table) -> pa.Table:
        g = batch.column("grp").to_numpy()
        u, inv = np.unique(g, return_inverse=True)
        t = np.bincount(inv).astype(np.int64)
        return pa.table({"k": pa.array(u), "t": pa.array(t)})

    totals: dict[int, int] = {}
    for row in ds.map_batches(partials, batch_format="pyarrow").take_all():
        totals[row["k"]] = totals.get(row["k"], 0) + row["t"]
    offsets: dict[int, int] = {}
    acc = 0
    cur_shard = None
    for g in sorted(totals):
        shard = g >> EXPORT_BUCKET_SHIFT
        if shard != cur_shard:
            cur_shard, acc = shard, 0
        offsets[g] = acc
        acc += totals[g]
    return offsets


def _hv_table(
    batch: pa.Table, n_shards: int, seed: int, ngroups: int
) -> pa.Table:
    did = batch.column("doc_id").to_numpy()
    hv = _mix_hash(did, seed)
    shard = hv % n_shards
    grp = (shard << EXPORT_BUCKET_SHIFT) + (hv >> EXPORT_BUCKET_SHIFT)
    cols = {
        "doc_id": pa.array(did),
        "hv": pa.array(hv),
        "shard": pa.array(shard.astype(np.int64)),
        "grp": pa.array(grp.astype(np.int64)),
        "gkey": pa.array((grp % ngroups).astype(np.int64)),
    }
    for name in batch.column_names:
        if name != "doc_id":
            cols[name] = batch.column(name)
    return pa.table(cols)


def _rank_group(group: pa.Table, offsets: dict[int, int]) -> pa.Table:
    """Rank every (shard, bucket) run the group holds: groups are a
    bytes-bounded hash of buckets (gkey = grp % ngroups), so one call
    finishes many buckets vectorized — one lexsort, per-run base offsets,
    within-run aranges."""
    hv = group.column("hv").to_numpy()
    did = group.column("doc_id").to_numpy()
    grp = group.column("grp").to_numpy()
    order = np.lexsort((did, hv, grp))
    g = grp[order]
    if g.size:
        new = np.r_[True, g[1:] != g[:-1]]
        run_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        base = np.array(
            [offsets.get(int(x), 0) for x in g[starts]], dtype=np.int64
        )
        pos = base[run_id] + (
            np.arange(g.size, dtype=np.int64) - starts[run_id]
        )
    else:
        pos = np.array([], dtype=np.int64)
    out = group.take(pa.array(order))
    cols = {
        "doc_id": out.column("doc_id"),
        "shard": out.column("shard"),
        "pos": pa.array(pos),
    }
    for name in out.column_names:
        if name not in ("doc_id", "hv", "shard", "grp", "gkey"):
            cols[name] = out.column(name)
    return pa.table(cols)


def shuffle_export(
    sf_dir: str, n_shards: int = EXPORT_SHARDS, seed: int = EXPORT_SEED
):
    """Seeded deterministic global shuffle: every doc gets a pseudorandom
    32-bit key hv = mix(seed, doc_id), shard = hv % n_shards, and pos =
    rank of (hv, doc_id) within its shard. Output (doc_id, shard, pos) —
    the exact example order a training run would stream, reproducible
    from (seed, n_shards) alone.

    Scale shape: ranks come from the bucket-offset scan (hv's high bits
    are order-compatible buckets inside a shard), so no shard-wide sort
    exists anywhere — the metadata pre-pass reads only doc_id, and the
    one bounded all-to-all groups (shard, bucket) cells."""
    import ray

    n_docs = table_rows(sf_dir, "documents")
    ngroups = shuffle_parts(n_docs * 32, lo=64, hi=1 << 20)

    def make():
        return _read_documents(sf_dir, ["doc_id"]).map_batches(
            lambda b: _hv_table(b, n_shards, seed, ngroups),
            batch_format="pyarrow",
        )

    offsets = _shard_grp_offsets(make())
    off_ref = ray.put(offsets)

    def rank(group: pa.Table) -> pa.Table:
        return _rank_group(group, ray.get(off_ref))

    return (
        make()
        .repartition(shuffle_parts(n_docs * 32))
        .groupby("gkey")
        .map_groups(rank, batch_format="pyarrow")
        .sort(["shard", "pos"])
    )


def write_shuffle_shards(
    sf_dir: str,
    out_dir: str,
    n_shards: int = 4,
    seed: int = EXPORT_SEED,
):
    """Deterministic shuffle-export to resumable, Hive-partitioned
    Parquet: one directory per shard, rows carrying (doc_id, pos, text).
    The metadata pre-pass (doc_id only) fixes every rank; the single data
    all-to-all then moves each row exactly once into its (shard, bucket)
    cell — re-running with the same (seed, n_shards) reproduces the same
    layout, and a failed run can skip shard directories already written.
    Returns {shard: n_rows}."""
    import ray

    n_docs = table_rows(sf_dir, "documents")
    ngroups = shuffle_parts(n_docs * 256, lo=64, hi=1 << 20)
    meta = _read_documents(sf_dir, ["doc_id"]).map_batches(
        lambda b: _hv_table(b, n_shards, seed, ngroups),
        batch_format="pyarrow",
    )
    offsets = _shard_grp_offsets(meta)
    off_ref = ray.put(offsets)

    def rank(group: pa.Table) -> pa.Table:
        return _rank_group(group, ray.get(off_ref))

    (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(
            lambda b: _hv_table(b, n_shards, seed, ngroups),
            batch_format="pyarrow",
        )
        .repartition(shuffle_parts(n_docs * 256))
        .groupby("gkey")
        .map_groups(rank, batch_format="pyarrow")
        .write_parquet(out_dir, partition_cols=["shard"])
    )
    import glob
    import os

    import pyarrow.parquet as pq

    result: dict[int, int] = {}
    for d in sorted(glob.glob(os.path.join(out_dir, "shard=*"))):
        shard = int(os.path.basename(d).split("=", 1)[1])
        rows = 0
        for f in glob.glob(os.path.join(d, "*.parquet")):
            rows += pq.ParquetFile(f).metadata.num_rows
        result[shard] = rows
    return result


def curated_pack(
    sf_dir: str,
    budget: int = PACK_BUDGET,
    range_size: int = PACK_RANGE,
    min_quality_milli: int = 600,
    lang: str = "en",
    bench_max_id: int = 32,
    ngram: int = 8,
):
    """END-TO-END curation -> export: quality + language filtering,
    benchmark n-gram decontamination, exact-dedup keep-first, then
    GPT-style sequence packing of the survivors — the full shape of a
    training-data run as ONE pipeline with ONE corpus read, and (unlike
    most multi-stage pipelines) an END-TO-END DuckDB oracle composing
    the four component oracles as CTEs.

    Semantics: survivors are docs with doc_id >= bench_max_id,
    lang == ``lang``, quality_milli >= ``min_quality_milli`` (the
    quality_score formula), sharing no ``ngram``-word gram with the
    benchmark docs (doc_id < bench_max_id, decontaminate semantics),
    deduplicated keep-first by sha256(text) among those survivors; the
    survivors' whitespace tokens are then concatenated in doc_id order
    and cut every ``budget`` tokens (pack_sequences semantics).
    (doc_id, seq_id, seq_off, n_toks) sorted by (doc_id, seq_id).

    Scale shape: the single map stage fuses scoring, the broadcast
    decontamination membership check, hashing and token counting, so
    the text is read ONCE and every later stage moves O(n_docs) count
    rows; dedup is one sha-keyed exchange; packing reuses the
    range-offset scan + bytes-bounded grouped cut."""
    import hashlib

    import pyarrow.dataset as pads
    import ray
    from ray.data.aggregate import Min

    from probe_ray.ops.text import (
        _space_gram_hashes,
        _split_words,
        _stats_arrays,
    )

    # benchmark gram set: eval sets are the small side by definition —
    # one pushdown read, broadcast once (decontaminate's shape)
    bench_col = (
        pads.dataset(f"{sf_dir}/documents.parquet")
        .to_table(
            columns=["text"], filter=pads.field("doc_id") < bench_max_id
        )
        .column("text")
    )
    _, bgh = _space_gram_hashes(bench_col, ngram)
    bench_ref = ray.put(np.unique(bgh))

    n_docs = table_rows(sf_dir, "documents")
    ngroups = shuffle_parts(n_docs * 24, lo=64, hi=1 << 20)

    def survive_fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = ray.get(bench_ref)
        n_chars, alpha, _, n, uniq = _stats_arrays(batch)
        ratio_u = np.divide(uniq, n, out=np.zeros(len(n)), where=n > 0)
        ratio_a = np.divide(
            alpha, n_chars, out=np.zeros(len(n)), where=n_chars > 0
        )
        length_ok = np.where(n >= 20, 1.0, n / 20.0)
        q = np.floor(
            1000 * (0.4 * ratio_u + 0.4 * ratio_a + 0.2 * length_ok) + 0.5
        )
        did = batch.column("doc_id").to_numpy()
        keep = (
            (q >= min_quality_milli)
            & (did >= bench_max_id)
            & pc.equal(batch.column("lang"), lang).to_numpy(
                zero_copy_only=False
            )
        )
        widx, gh = _space_gram_hashes(batch.column("text"), ngram)
        if gh.size and b.size:
            hit = np.isin(gh, b, kind="sort")
            keep[np.unique(widx[hit])] = False
        kept = batch.filter(pa.array(keep))
        # sha + regex-whitespace token count over survivors only
        shas = [
            hashlib.sha256(t.encode()).hexdigest()
            for t in kept.column("text").to_pylist()
        ]
        nd, _, doc_idx, codes, words = _split_words(kept)
        if codes.size:
            nonempty = np.array(
                [bool(w) for w in words.to_pylist()], dtype=bool
            )
            ntok = np.bincount(
                doc_idx,
                weights=nonempty[codes].astype(np.float64),
                minlength=nd,
            ).astype(np.int64)
        else:
            ntok = np.zeros(nd, np.int64)
        return pa.table(
            {
                "doc_id": kept.column("doc_id"),
                "sha": pa.array(shas, pa.string()),
                "n": pa.array(ntok),
            }
        )

    deduped = (
        _read_documents(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(survive_fn, batch_format="pyarrow")
        .repartition(shuffle_parts(n_docs * 104))
        .groupby("sha")
        .aggregate(Min("doc_id"), Min("n"))  # dup texts: identical n
    )

    def rekey(batch: pa.Table) -> pa.Table:
        did = batch.column("min(doc_id)").to_numpy().astype(np.int64)
        rng = (did // range_size).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did),
                "rng": pa.array(rng),
                "gkey": pa.array(rng % ngroups),
                "n": batch.column("min(n)").cast(pa.int64()),
            }
        )

    counts = deduped.map_batches(rekey, batch_format="pyarrow").materialize()
    return _pack_counts(counts, n_docs, budget, range_size)


def seq_stats(sf_dir: str, budget: int = PACK_BUDGET):
    """Per-packed-sequence rollup of pack_sequences: (seq_id, n_docs,
    n_toks) sorted by seq_id — the export-shard QA view (every interior
    sequence must hold exactly ``budget`` tokens; only the last may be
    partial, which the test asserts). Partial per-batch groupby then a
    bounded per-seq exchange — O(n_seqs) rows end to end."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "seq_id": batch.column("seq_id"),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "toks": batch.column("n_toks"),
            }
        )
        return t.group_by(["seq_id"]).aggregate(
            [("one", "sum"), ("toks", "sum")]
        )

    agg = (
        pack_sequences(sf_dir, budget=budget)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("seq_id")
        .aggregate(Sum("one_sum"), Sum("toks_sum"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "seq_id": batch.column("seq_id"),
                "n_docs": batch.column("sum(one_sum)").cast(pa.int64()),
                "n_toks": batch.column("sum(toks_sum)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort("seq_id")


def write_packed_shards(
    sf_dir: str,
    out_dir: str,
    n_shards: int = 4,
    budget: int = PACK_BUDGET,
):
    """Write curated_pack's output as resumable Hive-partitioned
    Parquet: shard = seq_id %% n_shards, rows carrying (doc_id, seq_id,
    seq_off, n_toks) — the training-artifact layout of the end-to-end
    curation chain. Deterministic (same corpus + params => same rows);
    resume is ALL-OR-NOTHING per out_dir: a `_done` marker commits the
    export, a rerun that finds it returns the recorded counts without
    recomputing, and a rerun after a mid-write failure clears the
    partial directory first (write_parquet APPENDS uniquely-named
    files, so writing into a partial dir would duplicate rows).
    Returns {shard: n_rows}."""
    import glob
    import json
    import os
    import shutil

    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, "_done")
    if os.path.exists(marker):
        with open(marker) as fh:
            return {int(k): v for k, v in json.load(fh).items()}
    shutil.rmtree(out_dir, ignore_errors=True)

    def with_shard(batch: pa.Table) -> pa.Table:
        sid = batch.column("seq_id").to_numpy()
        return batch.append_column(
            "shard", pa.array((sid % n_shards).astype(np.int64))
        )

    (
        curated_pack(sf_dir, budget=budget)
        .map_batches(with_shard, batch_format="pyarrow")
        .write_parquet(out_dir, partition_cols=["shard"])
    )

    result: dict[int, int] = {}
    for d in sorted(glob.glob(os.path.join(out_dir, "shard=*"))):
        shard = int(os.path.basename(d).split("=", 1)[1])
        n = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(d, "*.parquet"))
        )
        result[shard] = n
    with open(marker, "w") as fh:
        json.dump(result, fh)
    return result


def pack_sequences_by_lang(
    sf_dir: str, budget: int = PACK_BUDGET, range_size: int = PACK_RANGE
):
    """Per-LANGUAGE sequence packing: each language is its own token
    stream (docs concatenated in doc_id order within the language, cut
    every ``budget`` tokens; seq_id starts at 0 per language) — the
    multi-stream export a multilingual training mix uses. One row per
    (doc, sequence) overlap: (lang, doc_id, seq_id, seq_off, n_toks).

    Same range-offset scan as pack_sequences with the composite key
    lang_code * n_ranges + range and a RESET of the running sum at each
    language boundary (the _shard_grp_offsets idiom) — driver state is
    |langs| x n_ranges integers; the exchange still moves only count
    rows.

    n_ranges comes from the MAX doc_id (parquet footer stats, no data
    read), not the row count: with sparse/offset doc_ids a row-count
    bound would let one language's range index spill into the next
    language's key space and silently merge their token streams.
    counts_fn re-asserts the bound per batch as a backstop."""
    import ray
    import ray.data

    n_docs = table_rows(sf_dir, "documents")
    max_doc = table_column_max(sf_dir, "documents", "doc_id")
    if max_doc is None:
        max_doc = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        ).max("doc_id")
    n_ranges = int(max_doc) // range_size + 2
    ngroups = shuffle_parts(n_docs * 32, lo=64, hi=1 << 20)

    # distinct languages: bounded per-batch partials -> driver set
    lang_rows = (
        _read_documents(sf_dir, ["lang"])
        .map_batches(
            lambda b: pa.table(
                {"lang": b.column("lang").combine_chunks().unique()}
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    langs = sorted({r["lang"] for r in lang_rows})
    lang_code = {v: i for i, v in enumerate(langs)}

    def counts_fn(batch: pa.Table) -> pa.Table:
        nd, _, doc_idx, codes, words = _split_words(batch)
        if codes.size:
            nonempty = np.array(
                [bool(w) for w in words.to_pylist()], dtype=bool
            )
            n = np.bincount(
                doc_idx,
                weights=nonempty[codes].astype(np.float64),
                minlength=nd,
            ).astype(np.int64)
        else:
            n = np.zeros(nd, np.int64)
        did = batch.column("doc_id").to_numpy()
        lc = np.array(
            [lang_code[v] for v in batch.column("lang").to_pylist()],
            dtype=np.int64,
        )
        rng = did // range_size
        assert rng.size == 0 or int(rng.max()) < n_ranges, (
            "doc_id range index exceeds n_ranges: composite lang key "
            "would collide across languages"
        )
        key = lc * n_ranges + rng
        return pa.table(
            {
                "doc_id": pa.array(did),
                "lang": batch.column("lang"),
                "key": pa.array(key),
                "gkey": pa.array(key % ngroups),
                "n": pa.array(n),
            }
        )

    counts = (
        _read_documents(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(counts_fn, batch_format="pyarrow")
        .materialize()
    )

    # per-(lang, range) exclusive prefix sums, RESET at language
    # boundaries (key // n_ranges changes)
    def partials(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy()
        v = batch.column("n").to_numpy()
        u, inv = np.unique(k, return_inverse=True)
        t = np.bincount(inv, weights=v.astype(np.float64)).astype(np.int64)
        return pa.table({"k": pa.array(u), "t": pa.array(t)})

    totals: dict[int, int] = {}
    for row in counts.map_batches(partials, batch_format="pyarrow").take_all():
        totals[row["k"]] = totals.get(row["k"], 0) + row["t"]
    offsets: dict[int, int] = {}
    acc = 0
    cur_lang = None
    for k in sorted(totals):
        if k // n_ranges != cur_lang:
            cur_lang = k // n_ranges
            acc = 0
        offsets[k] = acc
        acc += totals[k]
    return _pack_counts(
        counts,
        n_docs,
        budget,
        range_size,
        offsets=offsets,
        key_col="key",
        label_col="lang",
    )


def write_tar_shards(sf_dir: str, out_dir: str | None = None, n_shards: int = 8):
    """WebDataset-style tar shard export of the documents table: each
    doc becomes two members of its shard's tar — ``{doc_id:012d}.txt``
    (the text payload) and ``{doc_id:012d}.json`` (lang/source
    metadata, sort_keys) — with shard = doc_id % n_shards, members in
    doc_id order and mtime pinned to 0, so every shard's tar is
    BYTE-DETERMINISTIC (same corpus + params => same sha256, any
    partitioning). Returns the manifest (shard, n_docs, n_bytes) sorted
    by shard, n_bytes = UTF-8 payload bytes of the text members (the
    SQL-oracle-able slice of the layout).

    Scale shape: one doc-keyed groupby moves each doc to its shard's
    writer task; each shard writes independently (size a shard count so
    docs/n_shards fits a worker; shards scale out with the corpus).
    Resume is PER SHARD: a ``.done`` sidecar (JSON with the tar's sha256
    and a fingerprint of the shard's params + keys + payload bytes)
    commits each tar via tmp-file + atomic rename; a rerun skips shards
    whose fingerprint still matches (mtimes untouched) and rebuilds
    missing or stale ones (corpus or n_shards changed).
    Writers assume a shared filesystem for ``out_dir`` (the standard
    sink assumption; single-node /tmp here). When ``out_dir`` is None a
    private temp dir is used and removed after the manifest is built —
    the queries() form, which still exercises the real sink end to end."""
    import hashlib
    import io
    import json as _json
    import os
    import shutil
    import tarfile
    import tempfile

    import pyarrow.compute as pc

    own = out_dir is None
    if own:
        out_dir = tempfile.mkdtemp(prefix="probe_ray_tar_")
    os.makedirs(out_dir, exist_ok=True)

    def keyed(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy()
        return pa.table(
            {
                "shard": pa.array((did % n_shards).astype(np.int64)),
                "doc_id": batch.column("doc_id"),
                "text": batch.column("text"),
                "lang": batch.column("lang"),
                "source": batch.column("source"),
            }
        )

    def write_shard(group: pa.Table) -> pa.Table:
        shard = int(group.column("shard")[0].as_py())
        g = group.take(
            pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
        )
        dids = g.column("doc_id").to_pylist()
        texts = g.column("text").to_pylist()
        langs = g.column("lang").to_pylist()
        srcs = g.column("source").to_pylist()
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        done = path + ".done"
        # Fingerprint of exactly what this shard's tar would contain
        # (params + keys + payload bytes). Resume trusts a .done sidecar
        # only when its fingerprint matches the CURRENT group — a rerun
        # into the same out_dir after the corpus or n_shards changed
        # rebuilds the shard instead of returning a manifest that
        # disagrees with stale tar bytes (ADVICE r4).
        fp = hashlib.sha256(f"{n_shards}|{len(dids)}".encode())
        for did, tx, la, so in zip(dids, texts, langs, srcs):
            fp.update(f"{did}|{la}|{so}|".encode())
            fp.update(tx.encode())
        fingerprint = fp.hexdigest()
        fresh = True
        if os.path.exists(done):
            try:
                with open(done) as fh:
                    side = _json.loads(fh.read())
                fresh = side.get("fingerprint") != fingerprint
            except (ValueError, OSError):
                fresh = True  # pre-fingerprint or corrupt sidecar
        if fresh:
            tmp = f"{path}.tmp.{os.getpid()}"
            with tarfile.open(tmp, "w") as tf:
                for did, tx, la, so in zip(dids, texts, langs, srcs):
                    data = tx.encode()
                    ti = tarfile.TarInfo(name=f"{did:012d}.txt")
                    ti.size, ti.mtime = len(data), 0
                    tf.addfile(ti, io.BytesIO(data))
                    meta = _json.dumps(
                        {"doc_id": did, "lang": la, "source": so},
                        sort_keys=True,
                    ).encode()
                    tj = tarfile.TarInfo(name=f"{did:012d}.json")
                    tj.size, tj.mtime = len(meta), 0
                    tf.addfile(tj, io.BytesIO(meta))
            os.replace(tmp, path)
            with open(path, "rb") as fh:
                sha = hashlib.sha256(fh.read()).hexdigest()
            with open(done + ".tmp", "w") as fh:
                fh.write(_json.dumps(
                    {"sha256": sha, "fingerprint": fingerprint}
                ))
            os.replace(done + ".tmp", done)
        return pa.table(
            {
                "shard": pa.array([shard], pa.int64()),
                "n_docs": pa.array([len(dids)], pa.int64()),
                "n_bytes": pa.array(
                    [sum(len(t.encode()) for t in texts)], pa.int64()
                ),
            }
        )

    import ray.data

    rows = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text", "lang", "source"],
        )
        .map_batches(keyed, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .take_all()
    )
    out = pa.table(
        {
            "shard": pa.array([int(r["shard"]) for r in rows], pa.int64()),
            "n_docs": pa.array([int(r["n_docs"]) for r in rows], pa.int64()),
            "n_bytes": pa.array(
                [int(r["n_bytes"]) for r in rows], pa.int64()
            ),
        }
    ).sort_by([("shard", "ascending")])
    if own:
        shutil.rmtree(out_dir, ignore_errors=True)
    return out

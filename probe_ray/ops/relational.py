"""Relational pipelines over the TPC-H-ish testdata tables.

These exercise the generic Dataset operator surface (SURVEY.md SS3.5/3.6
Ray mappings): partial aggregation inside map_batches before the wide
groupby, broadcast small-side joins (driver-read lookup dict captured in
the UDF closure — shipped once per worker via Ray's closure serialization,
never per batch), sort + limit top-k, and temporal bucketing.

Money/quantity outputs are converted to integer milli-units PER ROW
(floor(x*1000+0.5), identical f64 expression in the DuckDB oracles) before
summing, so distributed partial-sum order cannot perturb the result —
integer sums are associative; float sums are not."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from probe_ray.ops.sizing import shuffle_parts, table_rows
from probe_ray.ops.topk import dataset_topk as _dataset_topk


def _milli(arr: np.ndarray) -> np.ndarray:
    return np.floor(arr * 1000.0 + 0.5).astype(np.int64)


#: Above this many dimension rows a driver-read broadcast dict stops being
#: "small side" (TPC-H customer at sf100 is 15M rows — a multi-GB Python
#: dict on the driver and in every worker); the join switches to the
#: bounded-partition repartition join below.
DICT_DRIVER_MAX_ROWS = 2_000_000

#: Upper bound on the worst-case row count (key domain x partial-block
#: count) a per-key aggregate may coalesce into ONE task for its final
#: sum+top-k; above it the aggregate hash-partitions by key instead.
#: 20M rows of (int64 key, int64 sum) is ~320 MB — one task's heap.
TOPK_SINGLE_MERGE_MAX_ROWS = 20_000_000

SESSION_PARTITIONS = 64
SEMIJOIN_PARTITIONS = 64


def _maybe_sort(ds, keys, ordered: bool):
    """Presentation-only global ordering, OFF by default. The keyed
    exchange these operators already perform is the semantic work and
    each partition's output is internally sorted by its kernel; a
    trailing global ``Dataset.sort`` is a second all-to-all of the full
    O(rows) output purely for row order, which the oracle harness (and
    any downstream keyed consumer) doesn't need. Pass ``ordered=True``
    for human-facing output in canonical order (VERDICT r4 item 2)."""
    return ds.sort(keys) if ordered else ds


def _lookup_join_distributed(
    fact,
    fact_key: str,
    dim,
    dim_key: str,
    dim_val: str,
    val_type: pa.DataType,
    payload_cols: list[str],
    out_name: str,
    est_bytes: int,
    partitions: int = SEMIJOIN_PARTITIONS,
):
    """Annotate (fact_key, *payload) rows with one dimension value via a
    bounded-partition repartition join — the crossover target when the
    dimension exceeds DICT_DRIVER_MAX_ROWS.

    Both sides are keyed by ``key % partitions`` and met in one
    union + groupby (the same shape as order_priority_semijoin below);
    inside a group the lookup is a vectorized np.searchsorted against the
    group's sorted dim keys, never a Python dict probe per row. Fact rows
    whose key is absent from the dimension get a null ``out_name``
    (broadcast ``dict.get`` parity). Keys must be non-null int64.

    fact: Dataset[(fact_key:int64, *payload_cols:int64)]
    dim:  Dataset[(dim_key:int64, dim_val:val_type)]
    returns Dataset[(out_name:val_type, *payload_cols:int64)]
    """

    def fact_side(batch: pa.Table) -> pa.Table:
        k = batch.column(fact_key).to_numpy().astype(np.int64)
        cols = {
            "part": pa.array(k % partitions),
            "key": pa.array(k),
            "side": pa.array(np.ones(len(k), dtype=np.int64)),
            "val": pa.nulls(len(k), val_type),
        }
        for c in payload_cols:
            cols[c] = batch.column(c).cast(pa.int64())
        return pa.table(cols)

    def dim_side(batch: pa.Table) -> pa.Table:
        k = batch.column(dim_key).to_numpy().astype(np.int64)
        cols = {
            "part": pa.array(k % partitions),
            "key": pa.array(k),
            "side": pa.array(np.zeros(len(k), dtype=np.int64)),
            "val": batch.column(dim_val).cast(val_type),
        }
        for c in payload_cols:
            cols[c] = pa.array(np.zeros(len(k), dtype=np.int64))
        return pa.table(cols)

    def meet(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = group.column("side").to_numpy()
        keys = group.column("key").to_numpy()
        dmask = side == 0
        fidx = np.flatnonzero(~dmask)
        if len(fidx) == 0:
            cols = {out_name: pa.nulls(0, val_type)}
            for c in payload_cols:
                cols[c] = pa.array([], pa.int64())
            return pa.table(cols)
        dkeys = keys[dmask]
        order = np.argsort(dkeys, kind="stable")
        dkeys_s = dkeys[order]
        fkeys = keys[fidx]
        if len(dkeys_s):
            dvals = (
                group.column("val")
                .filter(pa.array(dmask))
                .take(pa.array(order))
                .combine_chunks()
            )
            pos = np.minimum(
                np.searchsorted(dkeys_s, fkeys), len(dkeys_s) - 1
            )
            found = dkeys_s[pos] == fkeys
            taken = dvals.take(pa.array(np.where(found, pos, 0)))
            val_out = pc.if_else(
                pa.array(found), taken, pa.nulls(len(fkeys), val_type)
            )
        else:
            val_out = pa.nulls(len(fkeys), val_type)
        sel = group.take(pa.array(fidx))
        cols = {out_name: val_out}
        for c in payload_cols:
            cols[c] = sel.column(c)
        return pa.table(cols)

    f = fact.map_batches(fact_side, batch_format="pyarrow", zero_copy_batch=True)
    d = dim.map_batches(dim_side, batch_format="pyarrow", zero_copy_batch=True)
    return (
        f.union(d)
        .repartition(shuffle_parts(est_bytes))
        .groupby("part")
        .map_groups(meet, batch_format="pyarrow")
    )


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def q1_pricing_summary(sf_dir: str):
    """TPC-H-Q1-flavored pricing summary per (l_returnflag, l_linestatus):
    count_order, sum_qty_milli, sum_price_milli, sum_disc_price_milli.
    Partial per-batch aggregation -> tiny global groupby (6 groups)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        qty = _milli(batch.column("l_quantity").to_numpy())
        price = _milli(batch.column("l_extendedprice").to_numpy())
        disc_price = _milli(
            (
                batch.column("l_extendedprice").to_numpy()
                * (1.0 - batch.column("l_discount").to_numpy())
            )
        )
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": pa.array(qty),
                "price": pa.array(price),
                "disc_price": pa.array(disc_price),
                "one": pa.array(np.ones(len(qty), dtype=np.int64)),
            }
        )
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price", "sum"), ("disc_price", "sum"), ("one", "sum")]
        )

    agg = (
        _read(
            sf_dir,
            "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        # partials are ~6 rows/block; coalesce the micro-blocks before the
        # all-to-all (ops/sizing.py)
        .repartition(shuffle_parts(6 * 64, lo=4))
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("qty_sum"), Sum("price_sum"), Sum("disc_price_sum"), Sum("one_sum"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "count_order": batch.column("sum(one_sum)").cast(pa.int64()),
                "sum_qty_milli": batch.column("sum(qty_sum)").cast(pa.int64()),
                "sum_price_milli": batch.column("sum(price_sum)").cast(pa.int64()),
                "sum_disc_price_milli": batch.column("sum(disc_price_sum)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


def top_customers_by_revenue(sf_dir: str, k: int = 20):
    """Top-k customers by total order value: partial sums by o_custkey,
    a single exchange that folds the final per-key sum AND the top-k
    prune together, THEN a name lookup for only the k winners via a
    predicate-pushdown read of the customer dimension.

    No broadcast of the dimension at any scale: the top-k is selected on
    (revenue, custkey) alone — names don't participate in ordering — so
    the join touches exactly k keys whether customer has 150k rows or
    15 billion (the ``c_custkey IN (...)`` filter prunes row groups at
    the read). (custkey, c_name, revenue_milli).

    Size-aware exchange crossover (r2 bench regression fix: the generic
    groupby(custkey) sort-shuffle + a separate dataset_topk exchange
    cost ~2 extra all-to-alls of fixed overhead): when the worst-case
    partial-row count (key domain x shuffle partitions) fits one task's
    heap, the partials coalesce into ONE block and a single downstream
    task does groupby-sum + top-k; above that, partials hash-partition
    by ``custkey % P`` and each partition emits its own sum + local
    top-k (every key's partials land in one partition, so its local
    top-k is exact), leaving <= P*k rows for the bounded final merge."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "custkey": batch.column("o_custkey"),
                "rev": pa.array(_milli(batch.column("o_totalprice").to_numpy())),
            }
        )
        return t.group_by(["custkey"]).aggregate([("rev", "sum")])

    def _sum_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "custkey": pa.array([], pa.int64()),
                    "revenue_milli": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["custkey"]).aggregate([("rev_sum", "sum")])
        out = pa.table(
            {
                "custkey": g.column("custkey"),
                "revenue_milli": g.column("rev_sum_sum").cast(pa.int64()),
            }
        )
        order = pc.sort_indices(
            out,
            sort_keys=[("revenue_milli", "descending"), ("custkey", "ascending")],
        )
        return out.take(order[:k])

    partials = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    n_keys = table_rows(sf_dir, "customer")
    parts = shuffle_parts(n_keys * 16)

    if n_keys * parts <= TOPK_SINGLE_MERGE_MAX_ROWS:
        top = partials.repartition(1).map_batches(
            _sum_topk, batch_format="pyarrow", batch_size=None
        )
    else:

        def keyed(batch: pa.Table) -> pa.Table:
            ck = batch.column("custkey").to_numpy()
            return batch.append_column(
                "part", pa.array((ck % parts).astype(np.int64))
            )

        per_part = (
            partials.map_batches(keyed, batch_format="pyarrow")
            .repartition(parts)
            .groupby("part")
            .map_groups(
                lambda g: _sum_topk(g.drop_columns(["part"])),
                batch_format="pyarrow",
            )
        )
        top = _dataset_topk(
            per_part,
            [("revenue_milli", "descending"), ("custkey", "ascending")],
            k,
        )
    t = pa.concat_tables(
        ray.get(list(top.to_arrow_refs())), promote_options="default"
    )
    keys = t.column("custkey").to_pylist()
    names_t = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"],
        filters=pads.field("c_custkey").isin(keys),
    )
    names = dict(
        zip(
            names_t.column("c_custkey").to_pylist(),
            names_t.column("c_name").to_pylist(),
        )
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "custkey": t.column("custkey"),
                "c_name": pa.array([names.get(c) for c in keys], pa.string()),
                "revenue_milli": t.column("revenue_milli"),
            }
        )
    )


def events_hourly_counts(sf_dir: str):
    """Per (event_type, hour bucket): event count + value sum in milli.
    hour_id = epoch_us // 3600e6 (integer bucketing, exact)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()  # epoch us
        hour_id = ts // 3_600_000_000
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "hour_id": pa.array(hour_id),
                "value": pa.array(_milli(batch.column("value").to_numpy())),
                "one": pa.array(np.ones(len(hour_id), dtype=np.int64)),
            }
        )
        return t.group_by(["event_type", "hour_id"]).aggregate(
            [("value", "sum"), ("one", "sum")]
        )

    agg = (
        _read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(shuffle_parts(table_rows(sf_dir, "events") * 2))
        .groupby(["event_type", "hour_id"])
        .aggregate(Sum("value_sum"), Sum("one_sum"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "hour_id": batch.column("hour_id"),
                "n_events": batch.column("sum(one_sum)").cast(pa.int64()),
                "value_sum_milli": batch.column("sum(value_sum)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort(
        ["event_type", "hour_id"]
    )


def events_sliding_window_counts(sf_dir: str):
    """HOPPING/SLIDING window aggregate (streaming concept §3.9): 2-hour
    windows hopping 1 hour — every event contributes to the window
    ending at its hour and the next. Implemented as a map-side fan-out
    (two narrow rows per event, pre-aggregated per batch) + one small
    groupby; no per-window state.
    (event_type, window_end_hour, n_events)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        hour = ts // 3_600_000_000
        et = batch.column("event_type")
        t = pa.table(
            {
                # zero-copy duplication: the same chunks twice
                "event_type": pa.chunked_array(list(et.chunks) * 2),
                "window_end_hour": pa.array(np.concatenate([hour, hour + 1])),
                "one": pa.array(np.ones(2 * len(hour), dtype=np.int64)),
            }
        )
        return t.group_by(["event_type", "window_end_hour"]).aggregate(
            [("one", "sum")]
        )

    agg = (
        _read(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        # partials collapse to (event_type x hours-in-block) rows
        .repartition(shuffle_parts(table_rows(sf_dir, "events") * 2))
        .groupby(["event_type", "window_end_hour"])
        .aggregate(Sum("one_sum"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_end_hour": batch.column("window_end_hour"),
                "n_events": batch.column("sum(one_sum)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort(
        ["event_type", "window_end_hour"]
    )


def top_event_per_user(sf_dir: str, ordered: bool = False):
    """Per-group top-k (k=1): each user's highest-value event.
    Bounded-partition groupby (user_id % 64) with one vectorized sort
    per group finding every user's max at once — never a group per
    user. Ties broken by earliest ts then event_id (deterministic).
    (user_id, event_id, value_milli)."""

    def keyed(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        return pa.table(
            {
                "part": pa.array((uid % SESSION_PARTITIONS).astype(np.int64)),
                "user_id": batch.column("user_id"),
                "event_id": batch.column("event_id"),
                "ts_us": batch.column("ts").cast(pa.int64()),
                "value_milli": pa.array(_milli(batch.column("value").to_numpy())),
            }
        )

    def tops(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group,
            sort_keys=[
                ("user_id", "ascending"),
                ("value_milli", "descending"),
                ("ts_us", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        g = group.take(order)
        uid = g.column("user_id").to_numpy()
        firsts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        sel = g.take(pa.array(firsts))
        return pa.table(
            {
                "user_id": sel.column("user_id"),
                "event_id": sel.column("event_id"),
                "value_milli": sel.column("value_milli"),
            }
        )

    ds = (
        _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
        .map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(shuffle_parts(table_rows(sf_dir, "events") * 36))
        .groupby("part")
        .map_groups(tops, batch_format="pyarrow")
    )
    return _maybe_sort(ds, "user_id", ordered)


def sessionize_events(sf_dir: str, gap_minutes: int = 30, ordered: bool = False):
    """Windowed aggregate: split each user's event stream into sessions at
    inactivity gaps > gap_minutes; one row per session
    (user_id, session_idx, n_events, start_us, end_us).

    The shuffle key is ``user_id % SESSION_PARTITIONS`` (bounded partition
    count — one group per user would be a Python call per user); within a
    partition one vectorized sort + diff finds every user's session
    boundaries at once."""
    from ray.data.aggregate import Sum  # noqa: F401  (doc: same family)

    gap_us = gap_minutes * 60_000_000

    def keyed(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        return pa.table(
            {
                "part": pa.array((uid % SESSION_PARTITIONS).astype(np.int64)),
                "user_id": batch.column("user_id"),
                "ts_us": batch.column("ts").cast(pa.int64()),
            }
        )

    def sessions(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("user_id", "ascending"), ("ts_us", "ascending")]
        )
        g = group.take(order)
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts_us").to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_idx": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "start_us": pa.array([], pa.int64()),
                    "end_us": pa.array([], pa.int64()),
                }
            )
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        new_sess = new_user | (np.r_[False, (ts[1:] - ts[:-1]) > gap_us])
        sess_id = np.cumsum(new_sess) - 1  # global within partition
        starts = np.flatnonzero(new_sess)
        ends = np.r_[starts[1:], n]
        # session_idx = per-user 0-based counter
        user_first_sess = sess_id[starts][
            np.r_[True, uid[starts][1:] != uid[starts][:-1]]
        ]
        first_of_user = np.repeat(
            user_first_sess,
            np.diff(np.r_[np.flatnonzero(
                np.r_[True, uid[starts][1:] != uid[starts][:-1]]
            ), len(starts)]),
        )
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "session_idx": pa.array(
                    sess_id[starts] - first_of_user, pa.int64()
                ),
                "n_events": pa.array(ends - starts, pa.int64()),
                "start_us": pa.array(ts[starts], pa.int64()),
                "end_us": pa.array(ts[ends - 1], pa.int64()),
            }
        )

    ds = (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(shuffle_parts(table_rows(sf_dir, "events") * 24))
        .groupby("part")
        .map_groups(sessions, batch_format="pyarrow")
    )
    return _maybe_sort(ds, ["user_id", "session_idx"], ordered)


def q6_revenue_filter(sf_dir: str):
    """TPC-H-Q6-flavored filtered aggregate: revenue from 1997-shipped
    lineitems with discount in [0.02, 0.07] and quantity < 24. The
    l_shipdate predicate is PUSHED INTO THE READ (only matching row
    groups leave storage); the remaining filters are vectorized per
    batch; the global sum is a single tiny reduction.
    One row: (revenue_milli, n_rows)."""
    import datetime

    import pyarrow.dataset as pads
    import ray.data
    from ray.data.aggregate import Sum

    lo = datetime.datetime(1997, 1, 1)
    hi = datetime.datetime(1998, 1, 1)

    def partial(batch: pa.Table) -> pa.Table:
        disc = batch.column("l_discount").to_numpy()
        qty = batch.column("l_quantity").to_numpy()
        price = batch.column("l_extendedprice").to_numpy()
        disc_m = _milli(disc)
        keep = (disc_m >= 20) & (disc_m <= 70) & (_milli(qty) < 24_000)
        return pa.table(
            {
                "revenue": pa.array([int(_milli(price * disc)[keep].sum())]),
                "one": pa.array([int(keep.sum())]),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_quantity", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )
    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("revenue"), Sum("one")
    )
    return pa.table(
        {
            "revenue_milli": pa.array([int(agg["sum(revenue)"])], pa.int64()),
            "n_rows": pa.array([int(agg["sum(one)"])], pa.int64()),
        }
    )


def order_priority_semijoin(sf_dir: str, min_discount_milli: int = 80):
    """Distributed hash SEMI-JOIN without a join primitive: orders that
    have >=1 lineitem with discount >= 0.08, counted per priority.

    Both sides are keyed by ``l_orderkey % P`` (bounded partitions) and
    met in one union+groupby — the same repartition-join shape as the
    dedup verify stage; inside a group membership is one vectorized
    np.isin. Map-side pre-projection keeps the shuffled rows narrow
    (key + side + priority only). (o_orderpriority, n_orders)."""
    import ray.data
    from ray.data.aggregate import Sum

    def line_side(batch: pa.Table) -> pa.Table:
        keep = _milli(batch.column("l_discount").to_numpy()) >= min_discount_milli
        keys = np.unique(batch.column("l_orderkey").to_numpy()[keep])
        return pa.table(
            {
                "part": pa.array(keys % SEMIJOIN_PARTITIONS),
                "okey": pa.array(keys, pa.int64()),
                "side": pa.array(np.zeros(len(keys), dtype=np.int64)),
                "priority": pa.array([""] * len(keys), pa.string()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        keys = batch.column("o_orderkey").to_numpy()
        return pa.table(
            {
                "part": pa.array(keys % SEMIJOIN_PARTITIONS),
                "okey": pa.array(keys, pa.int64()),
                "side": pa.array(np.ones(len(keys), dtype=np.int64)),
                "priority": batch.column("o_orderpriority"),
            }
        )

    left = _read(sf_dir, "lineitem", ["l_orderkey", "l_discount"]).map_batches(
        line_side, batch_format="pyarrow", zero_copy_batch=True
    )
    right = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        order_side, batch_format="pyarrow", zero_copy_batch=True
    )

    def meet(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        okey = group.column("okey").to_numpy()
        qualifying = np.unique(okey[side == 0])
        hit = (side == 1) & np.isin(okey, qualifying)
        # count hits per priority without pulling the string column
        # through Python: dictionary codes + bincount (the
        # event_transition_counts idiom)
        prio = group.column("priority")
        if isinstance(prio, pa.ChunkedArray):
            prio = prio.combine_chunks()
        enc = prio.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        cnt = np.bincount(codes[hit], minlength=len(enc.dictionary))
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "o_orderpriority": enc.dictionary.take(pa.array(nz)),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    est_bytes = (table_rows(sf_dir, "lineitem") + table_rows(sf_dir, "orders")) * 56
    agg = (
        left.union(right)
        # the mapped sides arrive as ~2x-CPUs micro-blocks each; coalesce
        # before the O(blocks x partitions) groupby shuffle (ops/sizing.py)
        .repartition(shuffle_parts(est_bytes))
        .groupby("part")
        .map_groups(meet, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": batch.column("o_orderpriority"),
                "n_orders": batch.column("sum(n)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort("o_orderpriority")


def top_brands_by_revenue(sf_dir: str, k: int = 10):
    """Fact-dimension join + top-k: lineitem revenue rolled up to p_brand
    via the part dimension, partial per-batch sums before the 25-group
    global groupby. (p_brand, revenue_milli).

    Size-aware join crossover: at <= DICT_DRIVER_MAX_ROWS dimension rows
    the brand map is a driver-read dict shipped once per worker (closure
    serialization, never per batch); above it, the same result comes from
    the bounded-partition repartition join (_lookup_join_distributed) —
    no whole-dimension dict on the driver or in workers."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    n_dim = table_rows(sf_dir, "part")
    fact_cols = ["l_partkey", "l_extendedprice", "l_discount"]

    if n_dim <= DICT_DRIVER_MAX_ROWS:
        part_t = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
        )
        brands = dict(
            zip(
                part_t.column("p_partkey").to_pylist(),
                part_t.column("p_brand").to_pylist(),
            )
        )

        def partial(batch: pa.Table) -> pa.Table:
            pk = batch.column("l_partkey").to_pylist()
            rev = _milli(
                batch.column("l_extendedprice").to_numpy()
                * (1.0 - batch.column("l_discount").to_numpy())
            )
            t = pa.table(
                {
                    "p_brand": pa.array([brands.get(x) for x in pk], pa.string()),
                    "rev": pa.array(rev),
                }
            )
            return t.group_by(["p_brand"]).aggregate([("rev", "sum")])

        agg = (
            _read(sf_dir, "lineitem", fact_cols)
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            # ~25 brand rows per block after the partial
            .repartition(shuffle_parts(25 * 64, lo=4))
            .groupby("p_brand")
            .aggregate(Sum("rev_sum"))
        )
    else:

        def partial_pk(batch: pa.Table) -> pa.Table:
            rev = _milli(
                batch.column("l_extendedprice").to_numpy()
                * (1.0 - batch.column("l_discount").to_numpy())
            )
            t = pa.table(
                {"pk": batch.column("l_partkey"), "rev": pa.array(rev)}
            )
            # pre-aggregate by partkey per batch before the exchange
            return t.group_by(["pk"]).aggregate([("rev", "sum")])

        fact = _read(sf_dir, "lineitem", fact_cols).map_batches(
            partial_pk, batch_format="pyarrow", zero_copy_batch=True
        )
        dim = _read(sf_dir, "part", ["p_partkey", "p_brand"])
        joined = _lookup_join_distributed(
            fact,
            "pk",
            dim,
            "p_partkey",
            "p_brand",
            pa.string(),
            ["rev_sum"],
            "p_brand",
            est_bytes=(table_rows(sf_dir, "lineitem") + n_dim) * 48,
        )
        agg = joined.groupby("p_brand").aggregate(Sum("rev_sum"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": batch.column("p_brand"),
                "revenue_milli": batch.column("sum(rev_sum)").cast(pa.int64()),
            }
        )

    return _dataset_topk(
        agg.map_batches(rename, batch_format="pyarrow"),
        [("revenue_milli", "descending"), ("p_brand", "ascending")],
        k,
    )


def customers_per_region(sf_dir: str):
    """Customer count per region name via two chained dimension lookups:
    (r_name, n_customers).

    nation (25 rows) and region (5 rows) are constant-size in TPC-H, so
    the broadcast-dict path is the permanent fast path; the same
    size-aware crossover as top_brands_by_revenue still guards it (and
    gives the test suite a forced-distributed branch to pin): above
    DICT_DRIVER_MAX_ROWS the rollup chains two bounded-partition
    repartition joins (customer->nation, then region)."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    n_dim = max(table_rows(sf_dir, "nation"), table_rows(sf_dir, "region"))

    if n_dim <= DICT_DRIVER_MAX_ROWS:
        nation = pq.read_table(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
        )
        region = pq.read_table(
            f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
        )
        nat2reg = dict(
            zip(
                nation.column("n_nationkey").to_pylist(),
                nation.column("n_regionkey").to_pylist(),
            )
        )
        reg2name = dict(
            zip(
                region.column("r_regionkey").to_pylist(),
                region.column("r_name").to_pylist(),
            )
        )

        def partial(batch: pa.Table) -> pa.Table:
            nk = batch.column("c_nationkey").to_pylist()
            rn = [reg2name.get(nat2reg.get(x)) for x in nk]
            t = pa.table(
                {
                    "r_name": pa.array(rn, pa.string()),
                    "one": pa.array(np.ones(len(rn), dtype=np.int64)),
                }
            )
            return t.group_by(["r_name"]).aggregate([("one", "sum")])

        agg = (
            _read(sf_dir, "customer", ["c_nationkey"])
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            # ~5 region rows per block after the partial
            .repartition(shuffle_parts(5 * 64, lo=4))
            .groupby("r_name")
            .aggregate(Sum("one_sum"))
        )
    else:

        def partial_nk(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "nk": batch.column("c_nationkey"),
                    "one": pa.array(
                        np.ones(batch.num_rows, dtype=np.int64)
                    ),
                }
            )
            return t.group_by(["nk"]).aggregate([("one", "sum")])

        fact = _read(sf_dir, "customer", ["c_nationkey"]).map_batches(
            partial_nk, batch_format="pyarrow", zero_copy_batch=True
        )
        est = (table_rows(sf_dir, "customer") + n_dim) * 48
        j1 = _lookup_join_distributed(
            fact,
            "nk",
            _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]),
            "n_nationkey",
            "n_regionkey",
            pa.int64(),
            ["one_sum"],
            "rk",
            est_bytes=est,
        )
        per_region = j1.groupby("rk").aggregate(Sum("one_sum"))

        def rename_rk(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "rk": batch.column("rk"),
                    "one_sum": batch.column("sum(one_sum)").cast(pa.int64()),
                }
            )

        j2 = _lookup_join_distributed(
            per_region.map_batches(rename_rk, batch_format="pyarrow"),
            "rk",
            _read(sf_dir, "region", ["r_regionkey", "r_name"]),
            "r_regionkey",
            "r_name",
            pa.string(),
            ["one_sum"],
            "r_name",
            est_bytes=est,
        )
        agg = j2.groupby("r_name").aggregate(Sum("one_sum"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "r_name": batch.column("r_name"),
                "n_customers": batch.column("sum(one_sum)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort("r_name")


# --------------------------------------------------------------------------
# As-of / band (range) joins — operators Ray Data has no native form of
# (SURVEY.md §3.6 "custom operators" note). Both are expressed as ONE
# hash-partition shuffle on the join key plus a vectorized per-partition
# kernel, the partitioning assumption being that a single key's rows fit a
# partition (keys are salted only by user_id % EVENT_JOIN_PARTITIONS here;
# a pathological single-user stream would need ts-range sub-salting with a
# cross-boundary carry pass).

EVENT_JOIN_PARTITIONS = 64


def _two_sided_events(sf_dir: str, left_type: str, right_type: str):
    """Events filtered to the two sides (pushed into the read), keyed for
    one bounded-partition shuffle: (part, side, event_id, user_id, ts_us)."""
    import pyarrow.dataset as pads
    import ray.data

    def keyed(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        side = pa.compute.equal(batch.column("event_type"), left_type)
        return pa.table(
            {
                "part": pa.array((uid % EVENT_JOIN_PARTITIONS).astype(np.int64)),
                "side": side.cast(pa.int8()),
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "ts_us": batch.column("ts").cast(pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
        filter=pads.field("event_type").isin([left_type, right_type]),
    )
    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(shuffle_parts(table_rows(sf_dir, "events") * 26))
        .groupby("part")
    )


def _rank_keys(users: np.ndarray, ts: np.ndarray, codes_of, n_right: int):
    """Composite (user_code, ts_rank) keys packed into one int64 so a
    single np.searchsorted answers per-user temporal range queries —
    the fully-vectorized replacement for a per-user Python loop."""
    code = codes_of(users)
    assert code.size == 0 or int(code.max()) < 2**31, "user-code overflow"
    assert n_right < 2**31, "per-partition right side too large for packed keys"
    return code.astype(np.int64) * (n_right + 1)


def _asof_band_kernel(group: pa.Table, window_us: int | None):
    """Shared per-partition kernel. Sort once by (user, ts); split sides;
    map every timestamp into rank space over the RIGHT side's globally
    ts-sorted array (rank = count of right rows with ts strictly less, so
    ties are exact); then per-left-row range positions come from two
    searchsorted calls over the packed (user_code, rank) key array.

    window_us=None  -> as-of: (event_id, user_id, gap_us) with gap_us=-1
                       when the user has no strictly-earlier right row.
    window_us=W     -> band count: (event_id, user_id, n_prior) of right
                       rows with ts in [t-W, t)."""
    import pyarrow.compute as pc

    order = pc.sort_indices(
        group, sort_keys=[("user_id", "ascending"), ("ts_us", "ascending")]
    )
    g = group.take(order)
    side = g.column("side").to_numpy()
    uid = g.column("user_id").to_numpy()
    ts = g.column("ts_us").to_numpy()
    eid = g.column("event_id").to_numpy()

    left = side == 1
    lu, lt, le = uid[left], ts[left], eid[left]
    ru, rt = uid[~left], ts[~left]
    n_right = rt.size

    out_id = pa.array(le, pa.int64())
    out_uid = pa.array(lu, pa.int64())
    if lu.size == 0 or n_right == 0:
        fill = (
            np.full(lu.size, -1, np.int64)
            if window_us is None
            else np.zeros(lu.size, np.int64)
        )
        name = "gap_us" if window_us is None else "n_prior"
        return pa.table({"event_id": out_id, "user_id": out_uid, name: pa.array(fill)})

    all_users = np.unique(uid)

    def codes_of(u):
        return np.searchsorted(all_users, u)

    rt_sorted = np.sort(rt)
    base_r = _rank_keys(ru, rt, codes_of, n_right)
    # right rows are already (user, ts)-sorted, so ranks are nondecreasing
    # within a user and the packed keys are globally sorted
    rkeys = base_r + np.searchsorted(rt_sorted, rt, side="left")
    base_l = _rank_keys(lu, lt, codes_of, n_right)
    hi = np.searchsorted(
        rkeys, base_l + np.searchsorted(rt_sorted, lt, side="left"), side="left"
    )
    if window_us is None:
        cand = hi - 1
        valid = (cand >= 0) & (ru[np.clip(cand, 0, None)] == lu)
        gap = np.where(valid, lt - rt[np.clip(cand, 0, None)], -1)
        return pa.table(
            {
                "event_id": out_id,
                "user_id": out_uid,
                "gap_us": pa.array(gap.astype(np.int64)),
            }
        )
    lo = np.searchsorted(
        rkeys,
        base_l + np.searchsorted(rt_sorted, lt - window_us, side="left"),
        side="left",
    )
    return pa.table(
        {
            "event_id": out_id,
            "user_id": out_uid,
            "n_prior": pa.array((hi - lo).astype(np.int64)),
        }
    )


def events_asof_last_click(
    sf_dir: str,
    left_type: str = "purchase",
    right_type: str = "click",
    ordered: bool = False,
):
    """As-of join: for each `left_type` event, the gap (microseconds) to
    the same user's most recent strictly-earlier `right_type` event;
    -1 when none exists. Output (event_id, user_id, gap_us), one row per
    left event — equivalent to DuckDB's ASOF LEFT JOIN."""

    def kern(group: pa.Table) -> pa.Table:
        return _asof_band_kernel(group, None)

    ds = _two_sided_events(sf_dir, left_type, right_type).map_groups(
        kern, batch_format="pyarrow"
    )
    return _maybe_sort(ds, "event_id", ordered)


def events_band_join_counts(
    sf_dir: str,
    window_hours: int = 24,
    left_type: str = "purchase",
    right_type: str = "click",
    ordered: bool = False,
):
    """Band (range) join: per `left_type` event, how many of the same
    user's `right_type` events fall in the preceding window
    [t - window, t). Output (event_id, user_id, n_prior)."""
    window_us = window_hours * 3_600_000_000

    def kern(group: pa.Table) -> pa.Table:
        return _asof_band_kernel(group, window_us)

    ds = _two_sided_events(sf_dir, left_type, right_type).map_groups(
        kern, batch_format="pyarrow"
    )
    return _maybe_sort(ds, "event_id", ordered)


# --------------------------------------------------------------------------
# Exact distributed order statistics (discrete quantiles) WITHOUT a global
# sort: one histogram pass locates the bin holding the k-th order stat,
# then a filtered read collects only that bin's values (re-binned exactly
# in the batch fn; the read filter is a widened pushdown range). If a bin
# is still too large to collect (heavy duplication / 100-TB inputs), the
# histogram recurses INTO the bin — each round shrinks the candidate range
# by QUANTILE_BINS x, so a handful of passes reach float64 resolution.

QUANTILE_BINS = 4096
#: max values collected driver-side to finish a quantile exactly
QUANTILE_COLLECT_MAX = 5_000_000


def _value_histogram(files, column: str, lo: float, hi: float):
    """One streaming pass: per-batch np.bincount into QUANTILE_BINS linear
    bins over [lo, hi] (values outside are dropped — callers pass the
    enclosing range), summed driver-side (one tiny row per block)."""
    import ray.data

    import pyarrow.dataset as pads

    w = hi - lo

    def hist(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        v = v[(v >= lo) & (v <= hi)]
        idx = np.clip(
            ((v - lo) / w * QUANTILE_BINS).astype(np.int64),
            0,
            QUANTILE_BINS - 1,
        )
        counts = np.bincount(idx, minlength=QUANTILE_BINS)
        return pa.table({"counts": pa.array([counts], pa.list_(pa.int64()))})

    eps = w / QUANTILE_BINS
    ds = ray.data.read_parquet(
        files,
        columns=[column],
        filter=(pads.field(column) >= lo - eps) & (pads.field(column) <= hi + eps),
    )
    total = np.zeros(QUANTILE_BINS, dtype=np.int64)
    for b in ds.map_batches(hist, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        flat = t.column("counts").combine_chunks()
        mat = flat.flatten().to_numpy().reshape(len(t), QUANTILE_BINS)
        total += mat.sum(axis=0)
    return total


def _collect_range(files, column: str, lo: float, hi: float, last: bool):
    """Values v with lo <= v < hi (<= hi when ``last``), one filtered
    streaming read, concatenated driver-side (caller bounds the size)."""
    import ray.data

    import pyarrow.dataset as pads

    def pick(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        keep = (v >= lo) & ((v <= hi) if last else (v < hi))
        return pa.table({column: pa.array(v[keep], pa.float64())})

    ds = ray.data.read_parquet(
        files,
        columns=[column],
        filter=(pads.field(column) >= lo) & (pads.field(column) <= hi),
    )
    parts = [
        pa.table(b).column(column).to_numpy()
        for b in ds.map_batches(pick, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    return np.concatenate(parts) if parts else np.array([], np.float64)


def _order_stat(files, column: str, k: int, lo: float, hi: float, counts):
    """Exact k-th (0-based) order statistic given the histogram of
    [lo, hi]; recurses into the holding bin while it exceeds the driver
    collect cap."""
    while True:
        if lo == hi:
            return lo
        cum = np.cumsum(counts)
        b = int(np.searchsorted(cum, k + 1, side="left"))
        k_in = k - (int(cum[b - 1]) if b > 0 else 0)
        w = (hi - lo) / QUANTILE_BINS
        blo, bhi = lo + b * w, lo + (b + 1) * w
        last = b == QUANTILE_BINS - 1
        if last:
            bhi = hi
        if int(counts[b]) > QUANTILE_COLLECT_MAX and bhi > blo:
            lo, hi, k = blo, bhi, k_in
            counts = _value_histogram(files, column, lo, hi)
            # drop values that straddled the (widened) pushdown but fall
            # outside [lo,hi): _value_histogram already range-filters
            continue
        vals = np.sort(_collect_range(files, column, blo, bhi, last))
        assert vals.size == int(counts[b]), "histogram/collect mismatch"
        return float(vals[k_in])


def column_quantiles_disc(
    sf_dir: str,
    table: str = "events",
    column: str = "value",
    qs: tuple = (0.25, 0.5, 0.9, 0.99),
):
    """Exact discrete quantiles (DuckDB quantile_disc convention:
    0-based index max(0, ceil(q*n)-1) of the sorted non-null column).
    Output (q:double, value:<source column type>), one row per requested
    quantile — quantile_disc returns a value OF the column, so the output
    keeps the column's own Arrow type (BIGINT column -> int64 quantile).

    Global min/max/row-count come from the Parquet footer statistics —
    no data read; then ONE histogram pass is shared by all quantiles."""
    import math

    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    pf = pq.ParquetFile(path)
    ci = pf.schema_arrow.get_field_index(column)
    src_type = pf.schema_arrow.field(column).type
    lo, hi, n = math.inf, -math.inf, 0
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(ci).statistics
        lo = min(lo, st.min)
        hi = max(hi, st.max)
        n += st.num_values  # non-null count
    if n == 0:
        return pa.table(
            {
                "q": pa.array([], pa.float64()),
                "value": _quantile_value_array([], src_type),
            }
        )
    counts = _value_histogram([path], column, lo, hi)
    # locate every q's holding bin first, then collect ALL small bins in
    # one shared pass (a separate read per quantile is wasted I/O); only
    # bins over the driver cap take the recursive per-q path
    cum = np.cumsum(counts)
    w = hi - lo
    plan = []  # (q, bin, k_in)
    for q in qs:
        k = max(0, math.ceil(q * n) - 1)
        b = int(np.searchsorted(cum, k + 1, side="left"))
        plan.append((float(q), b, k - (int(cum[b - 1]) if b > 0 else 0)))
    small_bins = sorted(
        {
            b
            for _, b, _ in plan
            if int(counts[b]) <= QUANTILE_COLLECT_MAX
        }
    )
    bin_vals: dict[int, np.ndarray] = {}
    if small_bins:
        import ray.data

        import pyarrow.dataset as pads

        want = np.zeros(QUANTILE_BINS, bool)
        want[small_bins] = True

        def pick(batch: pa.Table) -> pa.Table:
            v = batch.column(column).to_numpy(zero_copy_only=False)
            v = v[~np.isnan(v)]
            idx = np.clip(
                ((v - lo) / w * QUANTILE_BINS).astype(np.int64),
                0,
                QUANTILE_BINS - 1,
            )
            return pa.table({column: pa.array(v[want[idx]], pa.float64())})

        blo = lo + small_bins[0] * (w / QUANTILE_BINS)
        bhi = (
            hi
            if small_bins[-1] == QUANTILE_BINS - 1
            else lo + (small_bins[-1] + 1) * (w / QUANTILE_BINS)
        )
        eps = w / QUANTILE_BINS
        ds = ray.data.read_parquet(
            [path],
            columns=[column],
            filter=(pads.field(column) >= blo - eps)
            & (pads.field(column) <= bhi + eps),
        )
        parts = [
            pa.table(x).column(column).to_numpy()
            for x in ds.map_batches(
                pick, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
        ]
        vals = (
            np.concatenate(parts) if parts else np.array([], np.float64)
        )
        idx = np.clip(
            ((vals - lo) / w * QUANTILE_BINS).astype(np.int64),
            0,
            QUANTILE_BINS - 1,
        )
        for b in small_bins:
            bin_vals[b] = np.sort(vals[idx == b])
            assert bin_vals[b].size == int(counts[b]), (
                "histogram/collect mismatch"
            )
    out = []
    for q, b, k_in in plan:
        if b in bin_vals:
            out.append((q, float(bin_vals[b][k_in])))
        else:
            k = max(0, math.ceil(q * n) - 1)
            out.append((q, _order_stat([path], column, k, lo, hi, counts)))
    out.sort()
    return pa.table(
        {
            "q": pa.array([q for q, _ in out], pa.float64()),
            "value": _quantile_value_array([v for _, v in out], src_type),
        }
    )


def _quantile_value_array(vals, src_type) -> "pa.Array":
    """quantile_disc returns an actual value OF the column, so render it
    in the column's own Arrow type. Every collected value came out of the
    column, so the float64 round-trip back to int is exact (int64 parquet
    stats/values here are far below 2**53). Matters for the driver's
    string-rendered hash: DuckDB prints 294 for a BIGINT column where a
    float64 output would print 294.0."""
    if pa.types.is_integer(src_type):
        return pa.array([int(v) for v in vals], src_type)
    return pa.array([float(v) for v in vals], pa.float64())


def column_quantiles_by_group(
    sf_dir: str,
    table: str = "events",
    column: str = "value",
    group: str = "event_type",
    qs: tuple = (0.5, 0.9),
):
    """Per-group exact discrete quantiles: (group, q, value). One
    histogram pass computes EVERY group's bin counts at once: each batch
    dictionary-encodes its OWN group column (no broadcast group list, no
    driver-side distinct scan) and emits one (group, bin-counts) row per
    group seen, and the driver folds those partials — driver traffic is
    O(batches x groups-per-batch x bins), never O(rows). The per-group
    order stats then reuse the histogram bin math with group-filtered
    collects. Group cardinality is assumed dictionary-small (the fold
    dict holds one bins-vector per group); high-cardinality grouped
    quantiles belong in a sketch, not an exact operator.

    ``value`` is emitted in the source column's Arrow type (it is an
    actual value of the column — see _quantile_value_array)."""
    import math

    import pyarrow.parquet as pq
    import ray.data

    path = f"{sf_dir}/{table}.parquet"
    pf = pq.ParquetFile(path)
    ci = pf.schema_arrow.get_field_index(column)
    src_type = pf.schema_arrow.field(column).type
    lo, hi = math.inf, -math.inf
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(ci).statistics
        lo = min(lo, st.min)
        hi = max(hi, st.max)
    w = hi - lo

    def hist(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = batch.column(column).to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(batch.column(group).combine_chunks())
        gc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ngroups = len(enc.dictionary)
        ok = ~np.isnan(v)
        v, gc = v[ok], gc[ok]
        b = np.clip(
            ((v - lo) / w * QUANTILE_BINS).astype(np.int64),
            0,
            QUANTILE_BINS - 1,
        )
        mat = np.zeros((ngroups, QUANTILE_BINS), np.int64)
        np.add.at(mat, (gc, b), 1)
        return pa.table(
            {
                group: enc.dictionary.cast(pa.string()),
                "counts": pa.array(list(mat), pa.list_(pa.int64())),
            }
        )

    totals: dict[str, np.ndarray] = {}
    ds = ray.data.read_parquet(path, columns=[group, column])
    for b in ds.map_batches(hist, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        names = t.column(group).to_pylist()
        flat = t.column("counts").combine_chunks()
        mat = flat.flatten().to_numpy().reshape(len(t), QUANTILE_BINS)
        for i, g in enumerate(names):
            acc = totals.get(g)
            if acc is None:
                totals[g] = mat[i].copy()
            else:
                acc += mat[i]

    out_g, out_q, out_v = [], [], []
    for g in sorted(totals):
        counts = totals[g]
        n = int(counts.sum())
        if n == 0:
            continue
        for q in qs:
            k = max(0, math.ceil(q * n) - 1)
            # group-filtered collect: _collect_range sees only this
            # group's values via a pre-filtered read
            val = _order_stat_grouped(path, column, group, g, k, lo, hi, counts)
            out_g.append(g)
            out_q.append(float(q))
            out_v.append(val)
    order = sorted(range(len(out_g)), key=lambda i: (out_g[i], out_q[i]))
    return pa.table(
        {
            group: pa.array([out_g[i] for i in order], pa.string()),
            "q": pa.array([out_q[i] for i in order], pa.float64()),
            "value": _quantile_value_array(
                [out_v[i] for i in order], src_type
            ),
        }
    )


def _order_stat_grouped(
    path: str, column: str, group: str, gval, k: int, lo: float, hi: float, counts
):
    """_order_stat over one group's histogram: identical bin math, with
    the collect read filtered to the group (pushdown + exact re-check)."""
    import ray.data

    import pyarrow.dataset as pads

    cum = np.cumsum(counts)
    b = int(np.searchsorted(cum, k + 1, side="left"))
    k_in = k - (int(cum[b - 1]) if b > 0 else 0)
    w = (hi - lo) / QUANTILE_BINS
    blo, bhi = lo + b * w, lo + (b + 1) * w
    last = b == QUANTILE_BINS - 1
    if last:
        bhi = hi

    def pick(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column(group), gval))
        v = batch.column(column).to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        keep = (v >= blo) & ((v <= bhi) if last else (v < bhi))
        return pa.table({column: pa.array(v[keep], pa.float64())})

    ds = ray.data.read_parquet(
        [path],
        columns=[group, column],
        filter=(pads.field(group) == gval)
        & (pads.field(column) >= blo)
        & (pads.field(column) <= bhi),
    )
    parts = [
        pa.table(x).column(column).to_numpy()
        for x in ds.map_batches(pick, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    vals = np.sort(np.concatenate(parts) if parts else np.array([], np.float64))
    assert vals.size == int(counts[b]), "grouped histogram/collect mismatch"
    return float(vals[k_in])


# ---- skew-hardened variants ------------------------------------------------
# The plain asof/band partitioning is user-hash only: one pathological user
# (a single key with billions of events) lands in one partition. The salted
# variants sub-salt by TIME BUCKET so a hot key spreads across partitions:
#   band: rights are REPLICATED into the next bucket (window <= bucket span
#         => every left's window is fully present in its own partition;
#         each right appears exactly once there — original if same bucket,
#         replica if previous), so one shuffle still suffices;
#   asof: lookback is unbounded, so a per-(user,bucket) summary table
#         (last right ts per slice) gets a per-user running prefix-max in a
#         second TINY shuffle, and the carry is joined back to lefts that
#         found no in-bucket match. All shuffled side data is O(slices),
#         never O(rows of the hot key).

ASOF_SALT_PARTS = EVENT_JOIN_PARTITIONS


def _salted_two_sided(sf_dir, left_type, right_type, bucket_us, replicate_right):
    import pyarrow.dataset as pads
    import ray.data

    def keyed(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        side = (
            pa.compute.equal(batch.column("event_type"), left_type)
            .cast(pa.int8())
            .to_numpy(zero_copy_only=False)
        )
        eid = batch.column("event_id").to_numpy()
        bucket = ts // bucket_us
        cols = {
            "side": side,
            "event_id": eid,
            "user_id": uid,
            "ts_us": ts,
            "bucket": bucket,
        }
        if replicate_right:
            r = side == 0
            reps = {
                k: np.concatenate([v, v[r]]) for k, v in cols.items()
            }
            reps["bucket"] = np.concatenate([bucket, bucket[r] + 1])
            # replicas are marked so kernels can exclude them from
            # summaries / self-windows
            reps["replica"] = np.concatenate(
                [np.zeros(len(uid), np.int8), np.ones(int(r.sum()), np.int8)]
            )
            cols = reps
        else:
            cols["replica"] = np.zeros(len(uid), np.int8)
        part = (
            (cols["user_id"] * np.int64(1_000_003) + cols["bucket"])
            % ASOF_SALT_PARTS
        ).astype(np.int64)
        return pa.table({"part": pa.array(part), **{
            k: pa.array(v) for k, v in cols.items()
        }})

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
        filter=pads.field("event_type").isin([left_type, right_type]),
    )
    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(shuffle_parts(table_rows(sf_dir, "events") * 36))
        .groupby("part")
    )


def events_band_join_counts_salted(
    sf_dir: str,
    window_hours: int = 24,
    bucket_hours: int = 24,
    left_type: str = "purchase",
    right_type: str = "click",
    ordered: bool = False,
):
    """Skew-hardened band join: identical output to
    events_band_join_counts (pinned in tests) with partitions keyed by
    (user, time bucket). Requires window <= bucket span."""
    assert window_hours <= bucket_hours, "window must fit one bucket"
    window_us = window_hours * 3_600_000_000
    bucket_us = bucket_hours * 3_600_000_000

    def kern(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # within a partition, (user, bucket) slices are independent;
        # reuse the rank-key kernel with user' = (user, bucket) packed
        # via dense codes over the pair
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("user_id", "ascending"),
                ("bucket", "ascending"),
                ("ts_us", "ascending"),
            ],
        )
        g = group.take(order)
        side = g.column("side").to_numpy()
        uid = g.column("user_id").to_numpy()
        bucket = g.column("bucket").to_numpy()
        ts = g.column("ts_us").to_numpy()
        eid = g.column("event_id").to_numpy()
        # dense pair codes (sorted by (user,bucket) so codes follow order)
        new = np.r_[True, (uid[1:] != uid[:-1]) | (bucket[1:] != bucket[:-1])]
        pair_code = np.cumsum(new) - 1
        sub = pa.table(
            {
                "part": g.column("part"),
                "side": pa.array(side, pa.int8()),
                # stash row indices so true (event_id, user_id) come back
                # by fancy indexing — no per-row dict rebuild
                "event_id": pa.array(np.arange(len(side)), pa.int64()),
                "user_id": pa.array(pair_code, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
            }
        )
        out = _asof_band_kernel(sub, window_us)
        li = out.column("event_id").to_numpy()
        return pa.table(
            {
                "event_id": pa.array(eid[li], pa.int64()),
                "user_id": pa.array(uid[li], pa.int64()),
                "n_prior": out.column("n_prior"),
            }
        )

    ds = _salted_two_sided(
        sf_dir, left_type, right_type, bucket_us, True
    ).map_groups(kern, batch_format="pyarrow")
    return _maybe_sort(ds, "event_id", ordered)


def events_asof_last_click_salted(
    sf_dir: str,
    bucket_hours: int = 168,
    left_type: str = "purchase",
    right_type: str = "click",
    ordered: bool = False,
):
    """Skew-hardened as-of join: output identical to
    events_asof_last_click (pinned). Per-partition local matches, then a
    per-(user,bucket) last-right-ts summary gets a per-user exclusive
    prefix-max (tiny second shuffle) joined back as the carry for lefts
    whose match is in an earlier bucket."""
    import ray
    import ray.data

    bucket_us = bucket_hours * 3_600_000_000

    def kern(group: pa.Table) -> pa.Table:
        """Local pass: per slice emit left rows with the in-bucket match
        (local_ts or -1) plus one summary row per (user,bucket) with the
        slice's max right ts."""
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group,
            sort_keys=[
                ("user_id", "ascending"),
                ("bucket", "ascending"),
                ("ts_us", "ascending"),
            ],
        )
        g = group.take(order)
        side = g.column("side").to_numpy()
        uid = g.column("user_id").to_numpy()
        bucket = g.column("bucket").to_numpy()
        ts = g.column("ts_us").to_numpy()
        eid = g.column("event_id").to_numpy()
        new = np.r_[True, (uid[1:] != uid[:-1]) | (bucket[1:] != bucket[:-1])]
        pair_code = np.cumsum(new) - 1
        sub = pa.table(
            {
                "part": g.column("part"),
                "side": pa.array(side, pa.int8()),
                # stash the row index as event_id so we can recover ts
                "event_id": pa.array(np.arange(len(side)), pa.int64()),
                "user_id": pa.array(pair_code, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
            }
        )
        loc = _asof_band_kernel(sub, None)
        li = loc.column("event_id").to_numpy()  # row indices of lefts
        gap = loc.column("gap_us").to_numpy()
        local_ts = np.where(gap >= 0, ts[li] - gap, -1)
        lefts = pa.table(
            {
                "kind": pa.array(np.zeros(li.size, np.int8)),
                "user_id": pa.array(uid[li], pa.int64()),
                "bucket": pa.array(bucket[li], pa.int64()),
                "event_id": pa.array(eid[li], pa.int64()),
                "ts_us": pa.array(ts[li], pa.int64()),
                "local_ts": pa.array(local_ts.astype(np.int64)),
            }
        )
        # per-slice summary of rights
        r = side == 0
        if r.any():
            ru, rb, rt = uid[r], bucket[r], ts[r]
            nn = np.r_[True, (ru[1:] != ru[:-1]) | (rb[1:] != rb[:-1])]
            starts = np.flatnonzero(nn)
            ends = np.r_[starts[1:], rt.size]
            summ = pa.table(
                {
                    "kind": pa.array(np.ones(starts.size, np.int8)),
                    "user_id": pa.array(ru[starts], pa.int64()),
                    "bucket": pa.array(rb[starts], pa.int64()),
                    "event_id": pa.array(np.full(starts.size, -1, np.int64)),
                    "ts_us": pa.array(rt[ends - 1], pa.int64()),  # max ts
                    "local_ts": pa.array(np.full(starts.size, -1, np.int64)),
                }
            )
            return pa.concat_tables([lefts, summ])
        return lefts

    local = (
        _salted_two_sided(sf_dir, left_type, right_type, bucket_us, False)
        .map_groups(kern, batch_format="pyarrow")
    )

    # second (tiny) shuffle: per user, exclusive prefix-max of summary ts
    # over buckets becomes the carry for each left's bucket
    def add_upart(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        return batch.append_column(
            "upart", pa.array((u % ASOF_SALT_PARTS).astype(np.int64))
        )

    def resolve(group: pa.Table) -> pa.Table:
        kind = group.column("kind").to_numpy()
        uid = group.column("user_id").to_numpy()
        bucket = group.column("bucket").to_numpy()
        eid = group.column("event_id").to_numpy()
        ts = group.column("ts_us").to_numpy()
        local_ts = group.column("local_ts").to_numpy()
        lmask = kind == 0
        lu, lb = uid[lmask], bucket[lmask]
        su, sb, st = uid[~lmask], bucket[~lmask], ts[~lmask]
        # Per user, summary ts is STRICTLY increasing in bucket (all rights
        # in bucket B precede all rights in B+1), so "max summary ts over
        # strictly-earlier buckets" = the ts of the LATEST earlier-bucket
        # summary — one searchsorted over packed (user_code, bucket) keys,
        # no per-row scan.
        if su.size and lu.size:
            all_users = np.unique(uid)
            base = int(bucket.min())
            m = np.int64(int(bucket.max()) - base + 2)
            sord = np.argsort(
                np.searchsorted(all_users, su) * m + (sb - base), kind="stable"
            )
            skey = np.searchsorted(all_users, su[sord]) * m + (sb[sord] - base)
            lkey = np.searchsorted(all_users, lu) * m + (lb - base)
            pos = np.searchsorted(skey, lkey, side="left") - 1
            valid = (pos >= 0) & (su[sord][np.clip(pos, 0, None)] == lu)
            carry = np.where(valid, st[sord][np.clip(pos, 0, None)], -1)
        else:
            carry = np.full(lu.size, -1, np.int64)
        final_ts = np.maximum(local_ts[lmask], carry)
        gap = np.where(final_ts >= 0, ts[lmask] - final_ts, -1)
        return pa.table(
            {
                "event_id": pa.array(eid[lmask], pa.int64()),
                "user_id": pa.array(lu, pa.int64()),
                "gap_us": pa.array(gap.astype(np.int64)),
            }
        )

    ds = (
        local.map_batches(add_upart, batch_format="pyarrow")
        .groupby("upart")
        .map_groups(resolve, batch_format="pyarrow")
    )
    return _maybe_sort(ds, "event_id", ordered)


def events_json_kpis(sf_dir: str):
    """Semi-structured extraction: parse the events.props JSON column,
    pull the integer metric ``k``, and aggregate per event_type →
    (event_type, n_events, sum_k, max_k). The common fast shape
    ({"k": N}) is decoded with ONE vectorized RE2 extract per batch;
    anything that doesn't match falls back to json.loads row-by-row, so
    arbitrary JSON stays correct without paying per-row parsing for the
    99% case. Partial per-batch aggregation → tiny global groupby."""
    import json

    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    def extract(batch: pa.Table) -> pa.Table:
        props = batch.column("props").combine_chunks()
        m = pc.extract_regex(props, r'^\{"k":\s*(?P<k>-?\d+)\}$')
        k = pc.struct_field(m, "k").cast(pa.int64())
        if k.null_count:
            # slow lane sized to the MISSES only: json.loads just the
            # rows the fast regex didn't match (arbitrary JSON), scatter
            # into the vectorized result — never to_pylist the batch
            miss = np.flatnonzero(
                pc.is_null(k).to_numpy(zero_copy_only=False)
            )
            vals = k.fill_null(0).to_numpy(zero_copy_only=False).copy()
            vals[miss] = [
                int(json.loads(s)["k"])
                for s in props.take(pa.array(miss)).to_pylist()
            ]
            k = pa.array(vals, pa.int64())
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "k": k,
                "one": pa.array(np.ones(len(k), dtype=np.int64)),
            }
        )
        # combiner: the shuffle moves O(event types) rows per block, not
        # the event stream
        return t.group_by("event_type").aggregate(
            [("one", "sum"), ("k", "sum"), ("k", "max")]
        )

    agg = (
        _read(sf_dir, "events", ["event_type", "props"])
        .map_batches(extract, batch_format="pyarrow")
        .repartition(shuffle_parts(16 * 64, lo=4))
        .groupby("event_type")
        .aggregate(Sum("one_sum"), Sum("k_sum"), Max("k_max"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n_events": batch.column("sum(one_sum)").cast(pa.int64()),
                "sum_k": batch.column("sum(k_sum)").cast(pa.int64()),
                "max_k": batch.column("max(k_max)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort("event_type")


def _us(date_str: str) -> int:
    """Epoch microseconds of a YYYY-MM-DD date (integer, tz-naive)."""
    return int(np.datetime64(date_str, "us").astype(np.int64))


def q3_shipping_priority(
    sf_dir: str,
    k: int = 10,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
):
    """TPC-H-Q3-flavored three-way join: revenue of not-yet-shipped
    lineitems per qualifying order, top-k. customer (filtered to one
    market segment) |><| orders (ordered before ``cutoff``) |><| lineitem
    (shipped after ``cutoff``), grouped by orderkey.

    Two chained bounded-partition repartition joins, never a broadcast
    of any side (reference analog: probe's multi-stage candidate
    filtering; shape per SURVEY.md SS3.5):

      stage 1 (key = custkey % P): qualifying-customer keys meet
        date-filtered orders -> surviving orders re-keyed by orderkey.
      stage 2 (key = okey % P): surviving orders (dim side) meet
        map-side per-batch revenue partials from lineitem (fact side);
        inside a group the match is sorted-key searchsorted + one
        np.add.at accumulation, and each partition emits only its local
        top-k, so the final merge sees <= P*k rows (ops/topk.py).

    Orders with zero matching lineitems are dropped (inner-join
    semantics, hit-count not revenue). Output: (o_orderkey,
    revenue_milli, orderdate_us, o_orderpriority) top-k by
    (revenue_milli desc, o_orderkey asc)."""
    import pyarrow.compute as pc

    cutoff_us = _us(cutoff)
    parts = SEMIJOIN_PARTITIONS

    def cust_side(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        keep = _pc.equal(batch.column("c_mktsegment"), segment)
        keys = np.unique(
            batch.column("c_custkey").filter(keep).to_numpy().astype(np.int64)
        )
        n = len(keys)
        return pa.table(
            {
                "part": pa.array(keys % parts),
                "key": pa.array(keys, pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int64)),
                "okey": pa.array(np.zeros(n, dtype=np.int64)),
                "rev": pa.array(np.zeros(n, dtype=np.int64)),
                "date_us": pa.array(np.zeros(n, dtype=np.int64)),
                "prio": pa.array([""] * n, pa.string()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        date_us = batch.column("o_orderdate").to_numpy().astype(np.int64)
        m = date_us < cutoff_us
        ck = batch.column("o_custkey").to_numpy().astype(np.int64)[m]
        ok = batch.column("o_orderkey").to_numpy().astype(np.int64)[m]
        return pa.table(
            {
                "part": pa.array(ck % parts),
                "key": pa.array(ck, pa.int64()),
                "side": pa.array(np.ones(len(ck), dtype=np.int64)),
                "okey": pa.array(ok, pa.int64()),
                "rev": pa.array(np.zeros(len(ck), dtype=np.int64)),
                "date_us": pa.array(date_us[m], pa.int64()),
                "prio": batch.column("o_orderpriority").filter(pa.array(m)),
            }
        )

    def meet_cust(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        key = group.column("key").to_numpy()
        qual = key[side == 0]  # already unique per batch; partitions disjoint
        hit = np.flatnonzero((side == 1) & np.isin(key, qual))
        sel = group.take(pa.array(hit))
        ok = sel.column("okey").to_numpy()
        return pa.table(
            {
                "part": pa.array(ok % parts),
                "okey": sel.column("okey"),
                "side": pa.array(np.zeros(len(hit), dtype=np.int64)),
                "rev": sel.column("rev"),
                "date_us": sel.column("date_us"),
                "prio": sel.column("prio"),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        ship_us = batch.column("l_shipdate").to_numpy().astype(np.int64)
        m = ship_us > cutoff_us
        ok = batch.column("l_orderkey").to_numpy().astype(np.int64)[m]
        rev = _milli(
            batch.column("l_extendedprice").to_numpy()[m]
            * (1.0 - batch.column("l_discount").to_numpy()[m])
        )
        t = pa.table({"okey": pa.array(ok), "r": pa.array(rev)})
        g = t.group_by(["okey"]).aggregate([("r", "sum")])
        ok2 = g.column("okey").to_numpy()
        n = len(ok2)
        return pa.table(
            {
                "part": pa.array(ok2 % parts),
                "okey": g.column("okey"),
                "side": pa.array(np.ones(n, dtype=np.int64)),
                "rev": g.column("r_sum").cast(pa.int64()),
                "date_us": pa.array(np.zeros(n, dtype=np.int64)),
                "prio": pa.array([""] * n, pa.string()),
            }
        )

    def meet_rev(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        okey = group.column("okey").to_numpy()
        dmask = side == 0
        didx = np.flatnonzero(dmask)
        empty = pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "revenue_milli": pa.array([], pa.int64()),
                "orderdate_us": pa.array([], pa.int64()),
                "o_orderpriority": pa.array([], pa.string()),
            }
        )
        if len(didx) == 0:
            return empty
        dkeys = okey[didx]
        order = np.argsort(dkeys, kind="stable")
        dkeys_s = dkeys[order]
        fidx = np.flatnonzero(~dmask)
        if len(fidx) == 0:
            return empty
        fkeys = okey[fidx]
        pos = np.minimum(np.searchsorted(dkeys_s, fkeys), len(dkeys_s) - 1)
        found = dkeys_s[pos] == fkeys
        rev_sum = np.zeros(len(dkeys_s), dtype=np.int64)
        hits = np.zeros(len(dkeys_s), dtype=np.int64)
        frev = group.column("rev").to_numpy()[fidx]
        np.add.at(rev_sum, pos[found], frev[found])
        np.add.at(hits, pos[found], 1)
        live = hits > 0
        sel = group.take(pa.array(didx[order][live]))
        out = pa.table(
            {
                "o_orderkey": pa.array(dkeys_s[live], pa.int64()),
                "revenue_milli": pa.array(rev_sum[live], pa.int64()),
                "orderdate_us": sel.column("date_us"),
                "o_orderpriority": sel.column("prio"),
            }
        )
        if out.num_rows > k:
            order2 = pc.sort_indices(
                out,
                sort_keys=[
                    ("revenue_milli", "descending"),
                    ("o_orderkey", "ascending"),
                ],
            )
            out = out.take(order2[:k])
        return out

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        cust_side, batch_format="pyarrow", zero_copy_batch=True
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)
    est1 = (table_rows(sf_dir, "customer") + table_rows(sf_dir, "orders")) * 72
    surviving = (
        cust.union(orders)
        .repartition(shuffle_parts(est1))
        .groupby("part")
        .map_groups(meet_cust, batch_format="pyarrow")
    )
    lines = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(line_side, batch_format="pyarrow", zero_copy_batch=True)
    est2 = (table_rows(sf_dir, "orders") + table_rows(sf_dir, "lineitem")) * 72
    per_part = (
        surviving.union(lines)
        .repartition(shuffle_parts(est2))
        .groupby("part")
        .map_groups(meet_rev, batch_format="pyarrow")
    )
    return _dataset_topk(
        per_part,
        [("revenue_milli", "descending"), ("o_orderkey", "ascending")],
        k,
    )


def customers_without_orders(sf_dir: str, since: str = "2001-01-01"):
    """ANTI-join (TPC-H-Q22-flavored): customers with NO order on/after
    ``since``, counted per market segment. Same bounded-partition
    union+groupby repartition-join shape as order_priority_semijoin —
    inside a group the anti-membership test is one vectorized
    ~np.isin — followed by a tiny (5-group) global sum.
    Output: (c_mktsegment, n_customers) sorted by segment."""
    from ray.data.aggregate import Sum

    since_us = _us(since)
    parts = SEMIJOIN_PARTITIONS

    def order_keys(batch: pa.Table) -> pa.Table:
        date_us = batch.column("o_orderdate").to_numpy().astype(np.int64)
        keys = np.unique(
            batch.column("o_custkey").to_numpy().astype(np.int64)[
                date_us >= since_us
            ]
        )
        return pa.table(
            {
                "part": pa.array(keys % parts),
                "key": pa.array(keys, pa.int64()),
                "side": pa.array(np.zeros(len(keys), dtype=np.int64)),
                "seg": pa.array([""] * len(keys), pa.string()),
            }
        )

    def cust_rows(batch: pa.Table) -> pa.Table:
        keys = batch.column("c_custkey").to_numpy().astype(np.int64)
        return pa.table(
            {
                "part": pa.array(keys % parts),
                "key": pa.array(keys, pa.int64()),
                "side": pa.array(np.ones(len(keys), dtype=np.int64)),
                "seg": batch.column("c_mktsegment"),
            }
        )

    def meet(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        key = group.column("key").to_numpy()
        have = key[side == 0]
        anti = np.flatnonzero((side == 1) & ~np.isin(key, have))
        seg = group.column("seg").take(pa.array(anti))
        t = pa.table(
            {"seg": seg, "one": pa.array(np.ones(len(anti), dtype=np.int64))}
        )
        g = t.group_by(["seg"]).aggregate([("one", "sum")])
        return pa.table(
            {"seg": g.column("seg"), "n": g.column("one_sum").cast(pa.int64())}
        )

    left = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        order_keys, batch_format="pyarrow", zero_copy_batch=True
    )
    right = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        cust_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    est = (table_rows(sf_dir, "orders") + table_rows(sf_dir, "customer")) * 48
    agg = (
        left.union(right)
        .repartition(shuffle_parts(est))
        .groupby("part")
        .map_groups(meet, batch_format="pyarrow")
        .groupby("seg")
        .aggregate(Sum("n"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": batch.column("seg"),
                "n_customers": batch.column("sum(n)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort("c_mktsegment")


def order_count_distribution(sf_dir: str):
    """TPC-H-Q13-flavored outer-join histogram: distribution of
    orders-per-customer INCLUDING zero-order customers. Map-side
    per-batch order counts (fact) meet the customer key domain (dim) in
    one bounded-partition repartition join; each partition emits its own
    (c_count, n_customers) histogram partial — zero counts come from dim
    keys with no fact hit — and a tiny global groupby sums them.
    Output: (c_count, n_customers) sorted by c_count."""
    from ray.data.aggregate import Sum

    parts = SEMIJOIN_PARTITIONS

    def order_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "key": batch.column("o_custkey").cast(pa.int64()),
                "one": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)
                ),
            }
        )
        g = t.group_by(["key"]).aggregate([("one", "sum")])
        keys = g.column("key").to_numpy()
        return pa.table(
            {
                "part": pa.array(keys % parts),
                "key": g.column("key"),
                "side": pa.array(np.ones(len(keys), dtype=np.int64)),
                "cnt": g.column("one_sum").cast(pa.int64()),
            }
        )

    def cust_side(batch: pa.Table) -> pa.Table:
        keys = batch.column("c_custkey").to_numpy().astype(np.int64)
        return pa.table(
            {
                "part": pa.array(keys % parts),
                "key": pa.array(keys, pa.int64()),
                "side": pa.array(np.zeros(len(keys), dtype=np.int64)),
                "cnt": pa.array(np.zeros(len(keys), dtype=np.int64)),
            }
        )

    def meet(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        key = group.column("key").to_numpy()
        cnt = group.column("cnt").to_numpy()
        dkeys = np.sort(key[side == 0])
        out_empty = pa.table(
            {
                "c_count": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if len(dkeys) == 0:
            return out_empty
        fmask = side == 1
        totals = np.zeros(len(dkeys), dtype=np.int64)
        if fmask.any():
            fkeys = key[fmask]
            pos = np.minimum(np.searchsorted(dkeys, fkeys), len(dkeys) - 1)
            found = dkeys[pos] == fkeys
            np.add.at(totals, pos[found], cnt[fmask][found])
        vals, counts = np.unique(totals, return_counts=True)
        return pa.table(
            {
                "c_count": pa.array(vals, pa.int64()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    facts = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        order_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    dims = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        cust_side, batch_format="pyarrow", zero_copy_batch=True
    )
    est = (table_rows(sf_dir, "orders") + table_rows(sf_dir, "customer")) * 32
    agg = (
        facts.union(dims)
        .repartition(shuffle_parts(est))
        .groupby("part")
        .map_groups(meet, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("n"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_count": batch.column("c_count"),
                "n_customers": batch.column("sum(n)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort("c_count")


def distinct_users_per_type(sf_dir: str):
    """Exact distributed COUNT DISTINCT, two measures per event type:
    n_users = count(distinct user_id), n_user_days = count(distinct
    (user_id, day)). Partitioning by user_id % P makes per-partition
    distincts globally disjoint (every pair/triple of one user lands in
    exactly one partition), so exactness needs ONE shuffle — no global
    dedupe exchange. Per-batch pre-distinct (group_by with no aggregates)
    shrinks the shuffle input first. Output sorted by event_type."""
    from ray.data.aggregate import Sum

    parts = SEMIJOIN_PARTITIONS

    def pre(batch: pa.Table) -> pa.Table:
        day = (
            batch.column("ts").to_numpy().astype(np.int64) // 86_400_000_000
        )
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "user_id": batch.column("user_id").cast(pa.int64()),
                "day_id": pa.array(day, pa.int64()),
            }
        )
        d = t.group_by(["event_type", "user_id", "day_id"]).aggregate([])
        u = d.column("user_id").to_numpy()
        return d.append_column("part", pa.array(u % parts))

    def meet(group: pa.Table) -> pa.Table:
        triples = group.group_by(["event_type", "user_id", "day_id"]).aggregate([])
        pairs = triples.group_by(["event_type", "user_id"]).aggregate(
            [("day_id", "count")]
        )
        per_type = pairs.group_by(["event_type"]).aggregate(
            [("user_id", "count"), ("day_id_count", "sum")]
        )
        return pa.table(
            {
                "event_type": per_type.column("event_type"),
                "users": per_type.column("user_id_count").cast(pa.int64()),
                "user_days": per_type.column("day_id_count_sum").cast(pa.int64()),
            }
        )

    est = table_rows(sf_dir, "events") * 40
    agg = (
        _read(sf_dir, "events", ["event_type", "user_id", "ts"])
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(shuffle_parts(est))
        .groupby("part")
        .map_groups(meet, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("users"), Sum("user_days"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n_users": batch.column("sum(users)").cast(pa.int64()),
                "n_user_days": batch.column("sum(user_days)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort("event_type")


#: Known event types for the pivot's fixed column layout (data-dependent
#: extras are counted in n_other so no event is silently dropped).
PIVOT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_daily_type_pivot(sf_dir: str):
    """PIVOT: per-day event counts with one column per event type plus
    n_other and n_total. Classic partial-aggregate shape: per-batch
    group_by(day) over int indicator columns (pure Arrow kernels), then
    a global groupby(day_id) sum of at most n_days rows — the pivot
    never shuffles raw events. Output sorted by day_id."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        day = batch.column("ts").to_numpy().astype(np.int64) // 86_400_000_000
        et = batch.column("event_type")
        cols = {"day_id": pa.array(day, pa.int64())}
        other = np.ones(batch.num_rows, dtype=np.int64)
        for t in PIVOT_EVENT_TYPES:
            m = pc.equal(et, t).to_numpy(zero_copy_only=False).astype(np.int64)
            cols[f"c_{t}"] = pa.array(m)
            other -= m
        cols["c_other"] = pa.array(other)
        cols["c_total"] = pa.array(np.ones(batch.num_rows, dtype=np.int64))
        return (
            pa.table(cols)
            .group_by(["day_id"])
            .aggregate([(c, "sum") for c in cols if c != "day_id"])
        )

    names = [f"c_{t}" for t in PIVOT_EVENT_TYPES] + ["c_other", "c_total"]
    agg = (
        _read(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(shuffle_parts(4096 * 80, lo=4))
        .groupby("day_id")
        .aggregate(*[Sum(f"{c}_sum") for c in names])
    )

    def rename(batch: pa.Table) -> pa.Table:
        cols = {"day_id": batch.column("day_id")}
        for t in PIVOT_EVENT_TYPES:
            cols[f"n_{t}"] = batch.column(f"sum(c_{t}_sum)").cast(pa.int64())
        cols["n_other"] = batch.column("sum(c_other_sum)").cast(pa.int64())
        cols["n_total"] = batch.column("sum(c_total_sum)").cast(pa.int64())
        return pa.table(cols)

    return agg.map_batches(rename, batch_format="pyarrow").sort("day_id")


def rollup_revenue(sf_dir: str):
    """GROUP BY ROLLUP (l_returnflag, l_linestatus) in one pass: every
    batch emits partials for ALL THREE grouping levels (leaf, per-flag,
    grand total — sentinel 'ALL'), derived from the leaf partial inside
    the batch fn, so the rollup costs one tiny global groupby instead of
    three scans. Output: (l_returnflag, l_linestatus, n_rows,
    revenue_milli) sorted."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        rev = _milli(
            batch.column("l_extendedprice").to_numpy()
            * (1.0 - batch.column("l_discount").to_numpy())
        )
        t = pa.table(
            {
                "f": batch.column("l_returnflag"),
                "s": batch.column("l_linestatus"),
                "one": pa.array(np.ones(len(rev), dtype=np.int64)),
                "rev": pa.array(rev),
            }
        )
        leaf = t.group_by(["f", "s"]).aggregate([("one", "sum"), ("rev", "sum")])
        lvl1 = leaf.group_by(["f"]).aggregate(
            [("one_sum", "sum"), ("rev_sum", "sum")]
        )
        n1 = lvl1.num_rows
        total_n = int(pc_sum(leaf.column("one_sum")))
        total_r = int(pc_sum(leaf.column("rev_sum")))
        return pa.table(
            {
                "l_returnflag": pa.concat_arrays(
                    [
                        leaf.column("f").combine_chunks(),
                        lvl1.column("f").combine_chunks(),
                        pa.array(["ALL"], pa.string()),
                    ]
                ),
                "l_linestatus": pa.concat_arrays(
                    [
                        leaf.column("s").combine_chunks(),
                        pa.array(["ALL"] * n1, pa.string()),
                        pa.array(["ALL"], pa.string()),
                    ]
                ),
                "n": pa.concat_arrays(
                    [
                        leaf.column("one_sum").cast(pa.int64()).combine_chunks(),
                        lvl1.column("one_sum_sum").cast(pa.int64()).combine_chunks(),
                        pa.array([total_n], pa.int64()),
                    ]
                ),
                "rev": pa.concat_arrays(
                    [
                        leaf.column("rev_sum").cast(pa.int64()).combine_chunks(),
                        lvl1.column("rev_sum_sum").cast(pa.int64()).combine_chunks(),
                        pa.array([total_r], pa.int64()),
                    ]
                ),
            }
        )

    agg = (
        _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(shuffle_parts(10 * 64, lo=4))
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("n"), Sum("rev"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "n_rows": batch.column("sum(n)").cast(pa.int64()),
                "revenue_milli": batch.column("sum(rev)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


def pc_sum(arr) -> int:
    import pyarrow.compute as pc

    v = pc.sum(arr).as_py()
    return 0 if v is None else int(v)


# --------------------------------------------------------------------------
# TPC-H-flavored multiway joins (Q5 / Q10 / Q14 / Q18 shapes). Same
# execution vocabulary as q3_shipping_priority: map-side partial
# aggregation, ONE bounded-partition union+groupby exchange per join key,
# vectorized searchsorted matching inside each partition, per-partition
# top-k before the bounded merge — never a driver-side row loop, never an
# unguarded whole-dimension broadcast (DICT_DRIVER_MAX_ROWS crossover).


def _region_nation_maps(sf_dir: str, region: str):
    """(region_nation_keys_sorted, {nationkey: n_name}) for one region.
    nation/region are constant-size (25/5 rows) in TPC-H — a driver read
    here is O(1) at any corpus scale."""
    import pyarrow.parquet as pq

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    rk = {
        r: n
        for r, n in zip(
            reg.column("r_name").to_pylist(),
            reg.column("r_regionkey").to_pylist(),
        )
    }[region]
    keys, names = [], {}
    for nk, nm, nr in zip(
        nation.column("n_nationkey").to_pylist(),
        nation.column("n_name").to_pylist(),
        nation.column("n_regionkey").to_pylist(),
    ):
        names[int(nk)] = nm
        if nr == rk:
            keys.append(int(nk))
    return np.array(sorted(keys), dtype=np.int64), names


def _sorted_lookup(sorted_keys: np.ndarray, vals: np.ndarray, probe: np.ndarray):
    """Vectorized dict probe: (values, found_mask) of probe against the
    sorted (keys -> vals) arrays."""
    if len(sorted_keys) == 0:
        return np.zeros(len(probe), dtype=vals.dtype), np.zeros(
            len(probe), dtype=bool
        )
    pos = np.minimum(np.searchsorted(sorted_keys, probe), len(sorted_keys) - 1)
    found = sorted_keys[pos] == probe
    return vals[pos], found


def local_supplier_volume(
    sf_dir: str,
    region: str = "ASIA",
    date_lo: str = "1997-01-01",
    date_hi: str = "1998-01-01",
):
    """TPC-H-Q5-flavored five-way join: revenue per nation where the
    ordering customer and the supplying supplier share a nation inside
    one region, orders date-windowed. (n_name, revenue_milli) sorted by
    (revenue_milli desc, n_name asc).

    Shape (reference analog: probe's staged candidate narrowing,
    SURVEY.md SS3.5): nation/region ride the driver (constant 25/5
    rows); supplier nationkeys ride a size-aware crossover — a
    searchsorted-array broadcast at <= DICT_DRIVER_MAX_ROWS rows, else
    the bounded-partition repartition join; the two FACT joins
    (customer|><|orders on custkey, orders|><|lineitem on orderkey) are
    each ONE union + groupby exchange. Lineitem pre-aggregates
    (okey, s_nation) -> rev per batch, so the okey exchange moves at
    most 25 rows per (order x batch), not the raw line stream."""
    region_keys, nation_names = _region_nation_maps(sf_dir, region)
    lo_us, hi_us = _us(date_lo), _us(date_hi)
    parts = SEMIJOIN_PARTITIONS
    n_supp = table_rows(sf_dir, "supplier")

    def cust_side(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy().astype(np.int64)
        m = np.isin(nk, region_keys)
        ck = batch.column("c_custkey").to_numpy().astype(np.int64)[m]
        n = len(ck)
        return pa.table(
            {
                "part": pa.array(ck % parts),
                "key": pa.array(ck, pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int64)),
                "okey": pa.array(np.zeros(n, dtype=np.int64)),
                "nat": pa.array(nk[m]),
                "rev": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        date_us = batch.column("o_orderdate").to_numpy().astype(np.int64)
        m = (date_us >= lo_us) & (date_us < hi_us)
        ck = batch.column("o_custkey").to_numpy().astype(np.int64)[m]
        ok = batch.column("o_orderkey").to_numpy().astype(np.int64)[m]
        n = len(ck)
        return pa.table(
            {
                "part": pa.array(ck % parts),
                "key": pa.array(ck, pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int64)),
                "okey": pa.array(ok, pa.int64()),
                "nat": pa.array(np.zeros(n, dtype=np.int64)),
                "rev": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def meet_cust(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        key = group.column("key").to_numpy()
        dmask = side == 0
        dkeys = key[dmask]
        order = np.argsort(dkeys, kind="stable")
        dnat = group.column("nat").to_numpy()[dmask][order]
        fidx = np.flatnonzero(~dmask)
        nat, found = _sorted_lookup(dkeys[order], dnat, key[fidx])
        sel = np.flatnonzero(found)
        ok = group.column("okey").to_numpy()[fidx][sel]
        return pa.table(
            {
                "part": pa.array(ok % parts),
                "okey": pa.array(ok, pa.int64()),
                "side": pa.array(np.zeros(len(sel), dtype=np.int64)),
                "nat": pa.array(nat[sel]),
                "rev": pa.array(np.zeros(len(sel), dtype=np.int64)),
            }
        )

    def _line_partial(ok, snat, rev):
        t = pa.table(
            {"okey": pa.array(ok), "nat": pa.array(snat), "r": pa.array(rev)}
        )
        g = t.group_by(["okey", "nat"]).aggregate([("r", "sum")])
        ok2 = g.column("okey").to_numpy()
        n = len(ok2)
        return pa.table(
            {
                "part": pa.array(ok2 % parts),
                "okey": g.column("okey"),
                "side": pa.array(np.ones(n, dtype=np.int64)),
                "nat": g.column("nat"),
                "rev": g.column("r_sum").cast(pa.int64()),
            }
        )

    if n_supp <= DICT_DRIVER_MAX_ROWS:
        import pyarrow.parquet as pq

        supp_t = pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        sk = supp_t.column("s_suppkey").to_numpy().astype(np.int64)
        sv = supp_t.column("s_nationkey").to_numpy().astype(np.int64)
        so = np.argsort(sk, kind="stable")
        sk, sv = sk[so], sv[so]

        def line_side(batch: pa.Table) -> pa.Table:
            snat, found = _sorted_lookup(
                sk, sv, batch.column("l_suppkey").to_numpy().astype(np.int64)
            )
            m = found & np.isin(snat, region_keys)
            rev = _milli(
                batch.column("l_extendedprice").to_numpy()[m]
                * (1.0 - batch.column("l_discount").to_numpy()[m])
            )
            return _line_partial(
                batch.column("l_orderkey").to_numpy().astype(np.int64)[m],
                snat[m],
                rev,
            )

        lines = _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ).map_batches(line_side, batch_format="pyarrow", zero_copy_batch=True)
    else:

        def partial_sk(batch: pa.Table) -> pa.Table:
            rev = _milli(
                batch.column("l_extendedprice").to_numpy()
                * (1.0 - batch.column("l_discount").to_numpy())
            )
            t = pa.table(
                {
                    "sk": batch.column("l_suppkey"),
                    "okey": batch.column("l_orderkey"),
                    "rev": pa.array(rev),
                }
            )
            return t.group_by(["sk", "okey"]).aggregate([("rev", "sum")])

        fact = _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ).map_batches(partial_sk, batch_format="pyarrow", zero_copy_batch=True)
        joined = _lookup_join_distributed(
            fact,
            "sk",
            _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
            "s_suppkey",
            "s_nationkey",
            pa.int64(),
            ["okey", "rev_sum"],
            "snat",
            est_bytes=(table_rows(sf_dir, "lineitem") + n_supp) * 48,
        )

        def reshape(batch: pa.Table) -> pa.Table:
            snat_col = batch.column("snat")
            snat = snat_col.to_numpy(zero_copy_only=False)
            valid = np.asarray(pa.compute.is_valid(snat_col))
            snat = np.where(valid, snat, -1).astype(np.int64)
            m = np.isin(snat, region_keys)
            return _line_partial(
                batch.column("okey").to_numpy().astype(np.int64)[m],
                snat[m],
                batch.column("rev_sum").to_numpy().astype(np.int64)[m],
            )

        lines = joined.map_batches(reshape, batch_format="pyarrow")

    def meet_rev(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        okey = group.column("okey").to_numpy()
        dmask = side == 0
        dkeys = okey[dmask]
        order = np.argsort(dkeys, kind="stable")
        cnat = group.column("nat").to_numpy()[dmask][order]
        fidx = np.flatnonzero(~dmask)
        onat, found = _sorted_lookup(dkeys[order], cnat, okey[fidx])
        lnat = group.column("nat").to_numpy()[fidx]
        m = found & (onat == lnat)
        rev = group.column("rev").to_numpy()[fidx][m]
        t = pa.table({"nat": pa.array(lnat[m]), "r": pa.array(rev)})
        return t.group_by(["nat"]).aggregate([("r", "sum")])

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_side, batch_format="pyarrow", zero_copy_batch=True
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)
    est1 = (table_rows(sf_dir, "customer") + table_rows(sf_dir, "orders")) * 56
    surviving = (
        cust.union(orders)
        .repartition(shuffle_parts(est1))
        .groupby("part")
        .map_groups(meet_cust, batch_format="pyarrow")
    )
    est2 = (table_rows(sf_dir, "orders") + table_rows(sf_dir, "lineitem")) * 56
    per_part = (
        surviving.union(lines)
        .repartition(shuffle_parts(est2))
        .groupby("part")
        .map_groups(meet_rev, batch_format="pyarrow")
    )
    from ray.data.aggregate import Sum

    agg = per_part.groupby("nat").aggregate(Sum("r_sum"))

    def rename(batch: pa.Table) -> pa.Table:
        nk = batch.column("nat").to_numpy().astype(np.int64)
        return pa.table(
            {
                "n_name": pa.array(
                    [nation_names[int(x)] for x in nk], pa.string()
                ),
                "revenue_milli": batch.column("sum(r_sum)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort(
        ["revenue_milli", "n_name"], descending=[True, False]
    )


def returned_item_revenue(
    sf_dir: str,
    k: int = 20,
    date_lo: str = "1997-07-01",
    date_hi: str = "1997-10-01",
):
    """TPC-H-Q10-flavored returned-item report: top-k customers by
    revenue of lineitems returned (l_returnflag = 'R') against orders
    placed in one quarter. (custkey, c_name, revenue_milli) by
    (revenue_milli desc, custkey asc).

    Two exchanges, both bounded-partition: (1) okey %% P — returned-line
    revenue partials meet date-windowed orders, emitting per-partition
    (custkey, rev) partials; (2) custkey %% P — per-key sums + local
    top-k (each key lives in one partition, so local top-k is exact),
    then the <= P*k-row bounded merge. Names are attached to only the k
    winners via a predicate-pushdown read of the customer dimension
    (the top_customers_by_revenue idiom — no dimension broadcast at any
    scale)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray
    import ray.data

    lo_us, hi_us = _us(date_lo), _us(date_hi)
    parts = SEMIJOIN_PARTITIONS

    def order_side(batch: pa.Table) -> pa.Table:
        date_us = batch.column("o_orderdate").to_numpy().astype(np.int64)
        m = (date_us >= lo_us) & (date_us < hi_us)
        ok = batch.column("o_orderkey").to_numpy().astype(np.int64)[m]
        ck = batch.column("o_custkey").to_numpy().astype(np.int64)[m]
        n = len(ok)
        return pa.table(
            {
                "part": pa.array(ok % parts),
                "okey": pa.array(ok, pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int64)),
                "ck": pa.array(ck, pa.int64()),
                "rev": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        m = _pc.equal(batch.column("l_returnflag"), "R").to_numpy(
            zero_copy_only=False
        )
        ok = batch.column("l_orderkey").to_numpy().astype(np.int64)[m]
        rev = _milli(
            batch.column("l_extendedprice").to_numpy()[m]
            * (1.0 - batch.column("l_discount").to_numpy()[m])
        )
        t = pa.table({"okey": pa.array(ok), "r": pa.array(rev)})
        g = t.group_by(["okey"]).aggregate([("r", "sum")])
        ok2 = g.column("okey").to_numpy()
        n = len(ok2)
        return pa.table(
            {
                "part": pa.array(ok2 % parts),
                "okey": g.column("okey"),
                "side": pa.array(np.ones(n, dtype=np.int64)),
                "ck": pa.array(np.zeros(n, dtype=np.int64)),
                "rev": g.column("r_sum").cast(pa.int64()),
            }
        )

    def meet_orders(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        okey = group.column("okey").to_numpy()
        dmask = side == 0
        dkeys = okey[dmask]
        order = np.argsort(dkeys, kind="stable")
        dck = group.column("ck").to_numpy()[dmask][order]
        fidx = np.flatnonzero(~dmask)
        ck, found = _sorted_lookup(dkeys[order], dck, okey[fidx])
        rev = group.column("rev").to_numpy()[fidx][found]
        ck = ck[found]
        t = pa.table({"ck": pa.array(ck), "r": pa.array(rev)})
        g = t.group_by(["ck"]).aggregate([("r", "sum")])
        ck2 = g.column("ck").to_numpy()
        return pa.table(
            {
                "part2": pa.array(ck2 % parts),
                "custkey": g.column("ck"),
                "rev": g.column("r_sum").cast(pa.int64()),
            }
        )

    def sum_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        g = (
            group.select(["custkey", "rev"])
            .group_by(["custkey"])
            .aggregate([("rev", "sum")])
        )
        out = pa.table(
            {
                "custkey": g.column("custkey"),
                "revenue_milli": g.column("rev_sum").cast(pa.int64()),
            }
        )
        if out.num_rows > k:
            order = _pc.sort_indices(
                out,
                sort_keys=[
                    ("revenue_milli", "descending"),
                    ("custkey", "ascending"),
                ],
            )
            out = out.take(order[:k])
        return out

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)
    lines = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(line_side, batch_format="pyarrow", zero_copy_batch=True)
    est = (table_rows(sf_dir, "orders") + table_rows(sf_dir, "lineitem")) * 48
    per_cust = (
        orders.union(lines)
        .repartition(shuffle_parts(est))
        .groupby("part")
        .map_groups(meet_orders, batch_format="pyarrow")
    )
    n_keys = table_rows(sf_dir, "customer")
    if n_keys * parts <= TOPK_SINGLE_MERGE_MAX_ROWS:
        # worst-case partial rows fit one task: single-merge crossover
        # (the top_customers_by_revenue idiom) — the custkey exchange
        # collapses to one coalesce + one task
        top = _dataset_topk(
            per_cust.repartition(1).map_batches(
                lambda t: sum_topk(t.drop_columns(["part2"])),
                batch_format="pyarrow",
                batch_size=None,
            ),
            [("revenue_milli", "descending"), ("custkey", "ascending")],
            k,
        )
    else:
        per_part = (
            per_cust.repartition(shuffle_parts(n_keys * 24))
            .groupby("part2")
            .map_groups(
                lambda g: sum_topk(g.drop_columns(["part2"])),
                batch_format="pyarrow",
            )
        )
        top = _dataset_topk(
            per_part,
            [("revenue_milli", "descending"), ("custkey", "ascending")],
            k,
        )
    t = pa.concat_tables(
        ray.get(list(top.to_arrow_refs())), promote_options="default"
    )
    keys = t.column("custkey").to_pylist()
    names_t = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"],
        filters=pads.field("c_custkey").isin(keys),
    )
    names = dict(
        zip(
            names_t.column("c_custkey").to_pylist(),
            names_t.column("c_name").to_pylist(),
        )
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "custkey": t.column("custkey"),
                "c_name": pa.array([names.get(c) for c in keys], pa.string()),
                "revenue_milli": t.column("revenue_milli"),
            }
        )
    )


def promo_revenue(
    sf_dir: str,
    date_lo: str = "1997-09-01",
    date_hi: str = "1997-10-01",
):
    """TPC-H-Q14-flavored promotion effect: revenue from PROMO-type
    parts vs all revenue for lineitems shipped in one month. One row
    (promo_revenue_milli, total_revenue_milli) — integer millis so the
    oracle comparison is exact; the ratio is the caller's division.

    The part dimension rides the size-aware crossover: a sorted-array
    searchsorted broadcast at <= DICT_DRIVER_MAX_ROWS rows (one bool per
    partkey — ~1 byte/row), else the bounded-partition repartition join
    over per-batch (partkey -> rev) partials. Either way the final
    reduce moves two integers per block."""
    lo_us, hi_us = _us(date_lo), _us(date_hi)
    n_dim = table_rows(sf_dir, "part")
    fact_cols = ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]

    if n_dim <= DICT_DRIVER_MAX_ROWS:
        import pyarrow.parquet as pq

        part_t = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
        )
        pk = part_t.column("p_partkey").to_numpy().astype(np.int64)
        promo = np.asarray(
            pa.compute.equal(part_t.column("p_type"), "PROMO")
        ).astype(np.int64)
        so = np.argsort(pk, kind="stable")
        pk, promo = pk[so], promo[so]

        def partial(batch: pa.Table) -> pa.Table:
            ship_us = batch.column("l_shipdate").to_numpy().astype(np.int64)
            m = (ship_us >= lo_us) & (ship_us < hi_us)
            rev = _milli(
                batch.column("l_extendedprice").to_numpy()[m]
                * (1.0 - batch.column("l_discount").to_numpy()[m])
            )
            isp, found = _sorted_lookup(
                pk, promo, batch.column("l_partkey").to_numpy().astype(np.int64)[m]
            )
            isp = isp & found
            return pa.table(
                {
                    "promo": pa.array([int(rev[isp == 1].sum())], pa.int64()),
                    "total": pa.array([int(rev.sum())], pa.int64()),
                }
            )

        partials = _read(sf_dir, "lineitem", fact_cols).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
    else:

        def partial_pk(batch: pa.Table) -> pa.Table:
            ship_us = batch.column("l_shipdate").to_numpy().astype(np.int64)
            m = (ship_us >= lo_us) & (ship_us < hi_us)
            rev = _milli(
                batch.column("l_extendedprice").to_numpy()[m]
                * (1.0 - batch.column("l_discount").to_numpy()[m])
            )
            t = pa.table(
                {
                    "pk": batch.column("l_partkey").filter(pa.array(m)),
                    "rev": pa.array(rev),
                }
            )
            return t.group_by(["pk"]).aggregate([("rev", "sum")])

        fact = _read(sf_dir, "lineitem", fact_cols).map_batches(
            partial_pk, batch_format="pyarrow", zero_copy_batch=True
        )
        joined = _lookup_join_distributed(
            fact,
            "pk",
            _read(sf_dir, "part", ["p_partkey", "p_type"]),
            "p_partkey",
            "p_type",
            pa.string(),
            ["rev_sum"],
            "p_type",
            est_bytes=(table_rows(sf_dir, "lineitem") + n_dim) * 48,
        )

        def fold(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            rev = batch.column("rev_sum").to_numpy().astype(np.int64)
            isp = (
                _pc.fill_null(_pc.equal(batch.column("p_type"), "PROMO"), False)
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(bool)
            )
            return pa.table(
                {
                    "promo": pa.array([int(rev[isp].sum())], pa.int64()),
                    "total": pa.array([int(rev.sum())], pa.int64()),
                }
            )

        partials = joined.map_batches(fold, batch_format="pyarrow")

    totals = partials.sum(["promo", "total"])  # two-int global fold
    return pa.table(
        {
            "promo_revenue_milli": pa.array(
                [int(totals["sum(promo)"])], pa.int64()
            ),
            "total_revenue_milli": pa.array(
                [int(totals["sum(total)"])], pa.int64()
            ),
        }
    )


def large_order_customers(
    sf_dir: str, qty_threshold: float = 280.0, k: int = 20
):
    """TPC-H-Q18-flavored large-volume orders: orders whose total
    lineitem quantity exceeds ``qty_threshold``, top-k by order value.
    (o_orderkey, custkey, totalprice_milli, orderdate_us,
    total_qty_milli) by (totalprice_milli desc, o_orderkey asc).

    ONE okey %% P exchange: per-batch (okey -> qty) partials meet the
    orders rows; inside a partition the HAVING filter runs on the
    per-okey sums (each okey lives in exactly one partition, so the sum
    and the filter are exact), and only the partition's top-k survive
    to the <= P*k-row bounded merge."""
    import pyarrow.compute as pc

    thr_milli = int(np.floor(qty_threshold * 1000.0 + 0.5))
    parts = SEMIJOIN_PARTITIONS

    def order_side(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").to_numpy().astype(np.int64)
        n = len(ok)
        return pa.table(
            {
                "part": pa.array(ok % parts),
                "okey": pa.array(ok, pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int64)),
                "ck": batch.column("o_custkey").cast(pa.int64()),
                "price": pa.array(_milli(batch.column("o_totalprice").to_numpy())),
                "date_us": pa.array(
                    batch.column("o_orderdate").to_numpy().astype(np.int64)
                ),
                "qty": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy().astype(np.int64)
        qty = _milli(batch.column("l_quantity").to_numpy())
        t = pa.table({"okey": pa.array(ok), "q": pa.array(qty)})
        g = t.group_by(["okey"]).aggregate([("q", "sum")])
        ok2 = g.column("okey").to_numpy()
        n = len(ok2)
        return pa.table(
            {
                "part": pa.array(ok2 % parts),
                "okey": g.column("okey"),
                "side": pa.array(np.ones(n, dtype=np.int64)),
                "ck": pa.array(np.zeros(n, dtype=np.int64)),
                "price": pa.array(np.zeros(n, dtype=np.int64)),
                "date_us": pa.array(np.zeros(n, dtype=np.int64)),
                "qty": g.column("q_sum").cast(pa.int64()),
            }
        )

    def meet(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        okey = group.column("okey").to_numpy()
        dmask = side == 0
        didx = np.flatnonzero(dmask)
        empty = pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "custkey": pa.array([], pa.int64()),
                "totalprice_milli": pa.array([], pa.int64()),
                "orderdate_us": pa.array([], pa.int64()),
                "total_qty_milli": pa.array([], pa.int64()),
            }
        )
        if len(didx) == 0:
            return empty
        dkeys = okey[didx]
        order = np.argsort(dkeys, kind="stable")
        dkeys_s = dkeys[order]
        fidx = np.flatnonzero(~dmask)
        if len(fidx) == 0:
            return empty
        fkeys = okey[fidx]
        pos = np.minimum(np.searchsorted(dkeys_s, fkeys), len(dkeys_s) - 1)
        found = dkeys_s[pos] == fkeys
        qty_sum = np.zeros(len(dkeys_s), dtype=np.int64)
        fq = group.column("qty").to_numpy()[fidx]
        np.add.at(qty_sum, pos[found], fq[found])
        live = qty_sum > thr_milli
        sel = group.take(pa.array(didx[order][live]))
        out = pa.table(
            {
                "o_orderkey": pa.array(dkeys_s[live], pa.int64()),
                "custkey": sel.column("ck"),
                "totalprice_milli": sel.column("price"),
                "orderdate_us": sel.column("date_us"),
                "total_qty_milli": pa.array(qty_sum[live], pa.int64()),
            }
        )
        if out.num_rows > k:
            order2 = pc.sort_indices(
                out,
                sort_keys=[
                    ("totalprice_milli", "descending"),
                    ("o_orderkey", "ascending"),
                ],
            )
            out = out.take(order2[:k])
        return out

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)
    lines = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        line_side, batch_format="pyarrow", zero_copy_batch=True
    )
    est = (table_rows(sf_dir, "orders") + table_rows(sf_dir, "lineitem")) * 64
    per_part = (
        orders.union(lines)
        .repartition(shuffle_parts(est))
        .groupby("part")
        .map_groups(meet, batch_format="pyarrow")
    )
    return _dataset_topk(
        per_part,
        [("totalprice_milli", "descending"), ("o_orderkey", "ascending")],
        k,
    )


def discounted_bracket_revenue(sf_dir: str):
    """TPC-H-Q19-flavored compound-predicate join revenue: lineitem
    |><| part where (brand, size, quantity) fall in one of two disjoint
    brackets. One row (revenue_milli) — integer millis, exact oracle.

    The part side collapses to TWO sorted key arrays (partkeys passing
    each bracket's brand+size predicate — the dimension filter runs
    once, driver-side under DICT_DRIVER_MAX_ROWS, and ships as
    searchsorted arrays); each lineitem batch evaluates its quantity
    bracket and one membership probe per bracket. Above the crossover
    the same predicate rides the bounded-partition repartition join.
    The final reduce moves ONE integer per block."""
    import pyarrow.parquet as pq

    n_dim = table_rows(sf_dir, "part")
    fact_cols = ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    brackets = [
        ("Brand#1", 10, 1.0, 20.0),
        ("Brand#2", 20, 5.0, 30.0),
    ]

    def _rev(batch: pa.Table, member_masks) -> pa.Table:
        qty = batch.column("l_quantity").to_numpy()
        m = np.zeros(batch.num_rows, dtype=bool)
        for (bm, (_, _, qlo, qhi)) in zip(member_masks, brackets):
            m |= bm & (qty >= qlo) & (qty <= qhi)
        rev = _milli(
            batch.column("l_extendedprice").to_numpy()[m]
            * (1.0 - batch.column("l_discount").to_numpy()[m])
        )
        return pa.table({"rev": pa.array([int(rev.sum())], pa.int64())})

    if n_dim <= DICT_DRIVER_MAX_ROWS:
        part_t = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
        )
        pk = part_t.column("p_partkey").to_numpy().astype(np.int64)
        brand = part_t.column("p_brand").to_numpy(zero_copy_only=False)
        size = part_t.column("p_size").to_numpy()
        keysets = []
        for b, smax, _, _ in brackets:
            keysets.append(np.sort(pk[(brand == b) & (size <= smax)]))

        def partial(batch: pa.Table) -> pa.Table:
            lpk = batch.column("l_partkey").to_numpy().astype(np.int64)
            masks = []
            for ks in keysets:
                if ks.size:
                    pos = np.minimum(np.searchsorted(ks, lpk), ks.size - 1)
                    masks.append(ks[pos] == lpk)
                else:
                    masks.append(np.zeros(lpk.size, dtype=bool))
            return _rev(batch, masks)

        partials = _read(sf_dir, "lineitem", fact_cols).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
    else:

        def partial_pk(batch: pa.Table) -> pa.Table:
            # pre-aggregate by (partkey, qty-bracket-id) before the join
            qty = batch.column("l_quantity").to_numpy()
            rev = _milli(
                batch.column("l_extendedprice").to_numpy()
                * (1.0 - batch.column("l_discount").to_numpy())
            )
            out_pk, out_bi, out_rev = [], [], []
            for bi, (_, _, qlo, qhi) in enumerate(brackets):
                m = (qty >= qlo) & (qty <= qhi)
                t = pa.table(
                    {
                        "pk": batch.column("l_partkey").filter(pa.array(m)),
                        "rev": pa.array(rev[m]),
                    }
                ).group_by(["pk"]).aggregate([("rev", "sum")])
                out_pk.append(t.column("pk").to_numpy())
                out_bi.append(np.full(t.num_rows, bi, dtype=np.int64))
                out_rev.append(t.column("rev_sum").to_numpy().astype(np.int64))
            return pa.table(
                {
                    "pk": pa.array(np.concatenate(out_pk)),
                    "bi": pa.array(np.concatenate(out_bi)),
                    "rev_sum": pa.array(np.concatenate(out_rev)),
                }
            )

        fact = _read(sf_dir, "lineitem", fact_cols).map_batches(
            partial_pk, batch_format="pyarrow", zero_copy_batch=True
        )

        def dim_label(batch: pa.Table) -> pa.Table:
            brand = batch.column("p_brand").to_numpy(zero_copy_only=False)
            size = batch.column("p_size").to_numpy()
            lab = np.full(batch.num_rows, -1, dtype=np.int64)
            for bi, (b, smax, _, _) in enumerate(brackets):
                lab[(brand == b) & (size <= smax)] = bi
            return pa.table(
                {"p_partkey": batch.column("p_partkey"), "blab": pa.array(lab)}
            )

        dim = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
            dim_label, batch_format="pyarrow"
        )
        joined = _lookup_join_distributed(
            fact,
            "pk",
            dim,
            "p_partkey",
            "blab",
            pa.int64(),
            ["bi", "rev_sum"],
            "blab",
            est_bytes=(table_rows(sf_dir, "lineitem") + n_dim) * 48,
        )

        def fold(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            blab = batch.column("blab")
            bi = batch.column("bi").to_numpy()
            lab = (
                _pc.fill_null(blab, -1)
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            m = (lab >= 0) & (lab == bi)
            rev = batch.column("rev_sum").to_numpy().astype(np.int64)
            return pa.table({"rev": pa.array([int(rev[m].sum())], pa.int64())})

        partials = joined.map_batches(fold, batch_format="pyarrow")

    total = partials.sum("rev")
    return pa.table(
        {"revenue_milli": pa.array([int(total or 0)], pa.int64())}
    )


def rich_inactive_customers(sf_dir: str, since: str = "1998-06-01"):
    """TPC-H-Q22-flavored global-predicate anti-join: customers whose
    account balance exceeds the corpus average POSITIVE balance and who
    have placed no order on/after ``since``, rolled up per nation.
    (nationkey, n_customers, total_acctbal_milli) sorted by nationkey.

    The average-balance predicate is evaluated in EXACT integer
    cross-multiplied form — milli(c_acctbal) * n_pos > sum_pos_milli —
    so the Ray side and the SQL oracle agree bit-for-bit with no float
    threshold; (n_pos, sum_pos_milli) come from one two-int partial-sum
    pre-pass. The anti-join is the customers_without_orders
    union+groupby shape with per-partition nation partials."""
    from ray.data.aggregate import Sum

    since_us = _us(since)
    parts = SEMIJOIN_PARTITIONS

    def bal_partial(batch: pa.Table) -> pa.Table:
        bal = _milli(batch.column("c_acctbal").to_numpy())
        pos = bal > 0
        return pa.table(
            {
                "n": pa.array([int(pos.sum())], pa.int64()),
                "s": pa.array([int(bal[pos].sum())], pa.int64()),
            }
        )

    totals = (
        _read(sf_dir, "customer", ["c_acctbal"])
        .map_batches(bal_partial, batch_format="pyarrow", zero_copy_batch=True)
        .sum(["n", "s"])
    )
    n_pos = int(totals["sum(n)"] or 0)
    sum_pos = int(totals["sum(s)"] or 0)

    def order_keys(batch: pa.Table) -> pa.Table:
        date_us = batch.column("o_orderdate").to_numpy().astype(np.int64)
        keys = np.unique(
            batch.column("o_custkey").to_numpy().astype(np.int64)[
                date_us >= since_us
            ]
        )
        n = len(keys)
        return pa.table(
            {
                "part": pa.array(keys % parts),
                "key": pa.array(keys, pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int64)),
                "nat": pa.array(np.zeros(n, dtype=np.int64)),
                "bal": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def cust_rows(batch: pa.Table) -> pa.Table:
        bal = _milli(batch.column("c_acctbal").to_numpy())
        # exact integer form of bal > avg(positive balances)
        m = bal * n_pos > sum_pos
        keys = batch.column("c_custkey").to_numpy().astype(np.int64)[m]
        return pa.table(
            {
                "part": pa.array(keys % parts),
                "key": pa.array(keys, pa.int64()),
                "side": pa.array(np.ones(len(keys), dtype=np.int64)),
                "nat": pa.array(
                    batch.column("c_nationkey")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)[m]
                ),
                "bal": pa.array(bal[m]),
            }
        )

    def meet(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        key = group.column("key").to_numpy()
        have = key[side == 0]
        anti = np.flatnonzero((side == 1) & ~np.isin(key, have))
        t = pa.table(
            {
                "nat": group.column("nat").take(pa.array(anti)),
                "one": pa.array(np.ones(len(anti), dtype=np.int64)),
                "bal": group.column("bal").take(pa.array(anti)),
            }
        )
        g = t.group_by(["nat"]).aggregate([("one", "sum"), ("bal", "sum")])
        return pa.table(
            {
                "nat": g.column("nat"),
                "n": g.column("one_sum").cast(pa.int64()),
                "b": g.column("bal_sum").cast(pa.int64()),
            }
        )

    left = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        order_keys, batch_format="pyarrow", zero_copy_batch=True
    )
    right = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
    ).map_batches(cust_rows, batch_format="pyarrow", zero_copy_batch=True)
    est = (table_rows(sf_dir, "orders") + table_rows(sf_dir, "customer")) * 48
    agg = (
        left.union(right)
        .repartition(shuffle_parts(est))
        .groupby("part")
        .map_groups(meet, batch_format="pyarrow")
        .groupby("nat")
        .aggregate(Sum("n"), Sum("b"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "nationkey": batch.column("nat"),
                "n_customers": batch.column("sum(n)").cast(pa.int64()),
                "total_acctbal_milli": batch.column("sum(b)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort("nationkey")


FUNNEL_STEPS = ("signup", "click", "purchase")


def event_funnel(
    sf_dir: str, steps: tuple = FUNNEL_STEPS, before: str = "2024-01-03"
):
    """Ordered funnel analysis over the event window ts < ``before``:
    for each user, step i counts only if an event of type steps[i]
    occurs STRICTLY AFTER the user's step-(i-1) completion time
    (first-touch semantics: each step's completion time is the EARLIEST
    qualifying event). Output one row per funnel depth:
    (step, event_type, n_users) — n_users = users whose first-touch
    chain reaches that step. The default window makes the funnel
    discriminating on the dense synthetic stream (every user fires
    every type eventually; the early window is where drop-off lives).

    ONE user-keyed bounded-partition exchange; inside a group the chain
    is computed fully vectorized per step: events sorted by
    (user, ts, event_id), each step's completion time = minimum ts of
    matching events after the user's previous completion (one
    np.minimum.reduceat pass per step — steps are a constant, users are
    not). Driver sees only |steps| rows per partition."""
    import ray.data
    from ray.data.aggregate import Sum

    parts = SESSION_PARTITIONS
    before_us = _us(before)
    step_of = {s: i for i, s in enumerate(steps)}

    def keyed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # vectorized event_type -> step index: hash-probe against the
        # |steps|-element value set, null (absent) -> -1
        sidx = (
            pc.index_in(
                batch.column("event_type"), value_set=pa.array(list(steps))
            )
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        m = (sidx >= 0) & (
            batch.column("ts").to_numpy().astype(np.int64) < before_us
        )
        uid = batch.column("user_id").to_numpy().astype(np.int64)[m]
        return pa.table(
            {
                "part": pa.array(uid % parts),
                "user_id": pa.array(uid),
                "step": pa.array(sidx[m]),
                "ts": pa.array(
                    batch.column("ts").to_numpy().astype(np.int64)[m]
                ),
            }
        )

    def funnel(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy()
        stp = group.column("step").to_numpy()
        ts = group.column("ts").to_numpy()
        order = np.lexsort((ts, uid))
        uid, stp, ts = uid[order], stp[order], ts[order]
        new = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new)
        n_users = starts.size
        # completion time per user per step, NaT = +inf sentinel
        INF = np.iinfo(np.int64).max
        prev = np.full(n_users, -1, dtype=np.int64)  # strictly-after bound
        reached = np.zeros(len(steps), dtype=np.int64)
        user_of = np.cumsum(new) - 1
        for i in range(len(steps)):
            cand = ts.copy()
            cand[(stp != i) | (ts <= prev[user_of])] = INF
            first = np.minimum.reduceat(cand, starts)
            done = first < INF
            reached[i] = int(done.sum())
            prev = np.where(done, first, INF)
            if not done.any():
                break
            # users that failed step i can never complete later steps:
            # prev = INF makes every later candidate ts <= prev false
            # only when ts < INF, so mark them explicitly
        return pa.table(
            {
                "step": pa.array(
                    np.arange(1, len(steps) + 1, dtype=np.int64)
                ),
                "event_type": pa.array(list(steps), pa.string()),
                "n": pa.array(reached),
            }
        )

    rows = (
        _read(sf_dir, "events", ["user_id", "event_type", "ts"])
        .map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(shuffle_parts(table_rows(sf_dir, "events") * 32))
        .groupby("part")
        .map_groups(funnel, batch_format="pyarrow")
        .groupby(["step", "event_type"])
        .aggregate(Sum("n"))
        .take_all()
    )  # <= |steps| rows by construction
    by_step = {int(r["step"]): int(r["sum(n)"]) for r in rows}
    # always emit every funnel depth — zero-count steps included, so the
    # empty-window output matches the oracle's constant 3-row shape
    return pa.table(
        {
            "step": pa.array(range(1, len(steps) + 1), pa.int64()),
            "event_type": pa.array(list(steps), pa.string()),
            "n_users": pa.array(
                [by_step.get(i, 0) for i in range(1, len(steps) + 1)],
                pa.int64(),
            ),
        }
    )


def retention_cohorts(sf_dir: str, day_lo: int = 21, day_hi: int = 22):
    """Day-cohort retention: users grouped by the calendar day of their
    FIRST event; a user is retained iff they have any event inside the
    RELATIVE day window [first + day_lo days, first + day_hi days) —
    the "active on day N after first touch" product metric (an
    open-ended horizon saturates on this month-long dense stream; the
    bounded window discriminates). (cohort_day_us, n_users, n_retained)
    sorted by cohort day.

    ONE user-keyed bounded exchange; per group the first-ts and the
    window test are one lexsort + bincount pass; the cohort rollup is
    a tiny per-day groupby-sum."""
    from ray.data.aggregate import Sum

    parts = SESSION_PARTITIONS
    day_us = 86_400_000_000
    lo_us, hi_us = day_lo * day_us, day_hi * day_us

    def keyed(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy().astype(np.int64)
        return pa.table(
            {
                "part": pa.array(uid % parts),
                "user_id": pa.array(uid),
                "ts": pa.array(
                    batch.column("ts").to_numpy().astype(np.int64)
                ),
            }
        )

    def per_user(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy()
        ts = group.column("ts").to_numpy()
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new)
        user_of = np.cumsum(new) - 1
        first = ts[starts]
        cohort = (first // day_us) * day_us
        f = first[user_of]
        in_win = (ts >= f + lo_us) & (ts < f + hi_us)
        retained = (
            np.bincount(user_of, weights=in_win, minlength=starts.size) > 0
        ).astype(np.int64)
        t = pa.table(
            {
                "cohort_day_us": pa.array(cohort),
                "one": pa.array(np.ones(starts.size, dtype=np.int64)),
                "ret": pa.array(retained),
            }
        )
        return t.group_by(["cohort_day_us"]).aggregate(
            [("one", "sum"), ("ret", "sum")]
        )

    agg = (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(shuffle_parts(table_rows(sf_dir, "events") * 24))
        .groupby("part")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("cohort_day_us")
        .aggregate(Sum("one_sum"), Sum("ret_sum"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_day_us": batch.column("cohort_day_us"),
                "n_users": batch.column("sum(one_sum)").cast(pa.int64()),
                "n_retained": batch.column("sum(ret_sum)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort(
        "cohort_day_us"
    )


def event_transition_counts(sf_dir: str, k: int = 15):
    """Event-sequence transition mining: counts of CONSECUTIVE
    event-type pairs within each user's time-ordered stream (ties by
    event_id, matching the oracle's window order), top-k globally.
    (from_type, to_type, n) by (n desc, from_type, to_type).

    ONE user-keyed bounded exchange; per group one lexsort builds every
    user's ordered stream and the pair emission is two shifted slices +
    a dictionary-encoded bincount — no per-row loop; the global rollup
    moves <= |types|^2 rows per partition."""
    from ray.data.aggregate import Sum

    parts = SESSION_PARTITIONS

    def keyed(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy().astype(np.int64)
        return pa.table(
            {
                "part": pa.array(uid % parts),
                "user_id": pa.array(uid),
                "ts": pa.array(batch.column("ts").to_numpy().astype(np.int64)),
                "event_id": batch.column("event_id").cast(pa.int64()),
                "event_type": batch.column("event_type"),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy()
        ts = group.column("ts").to_numpy()
        eid = group.column("event_id").to_numpy()
        et = group.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        u, c = uid[order], codes[order]
        same = u[1:] == u[:-1]
        a, b = c[:-1][same], c[1:][same]
        nt = len(enc.dictionary)
        cnt = np.bincount(a * nt + b, minlength=nt * nt)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "from_type": enc.dictionary.take(pa.array(nz // nt)),
                "to_type": enc.dictionary.take(pa.array(nz % nt)),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    agg = (
        _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
        .map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(shuffle_parts(table_rows(sf_dir, "events") * 40))
        .groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "from_type": batch.column("from_type"),
                "to_type": batch.column("to_type"),
                "n": batch.column("sum(n)").cast(pa.int64()),
            }
        )

    return _dataset_topk(
        agg.map_batches(rename, batch_format="pyarrow"),
        [("n", "descending"), ("from_type", "ascending"), ("to_type", "ascending")],
        k,
    )


def conversion_latency_stats(sf_dir: str):
    """Signup-to-purchase conversion latency: per user, the time from
    the FIRST signup to the first purchase STRICTLY AFTER it; one
    global row (n_converted, sum_latency_us, min_latency_us,
    max_latency_us) — integer microseconds, so the oracle comparison
    is exact and the distributed reduce is a four-int fold.

    ONE user-keyed bounded exchange (the event_funnel kernel shape);
    per group one lexsort + two reduceat passes find each user's
    (first signup, first later purchase)."""
    parts = SESSION_PARTITIONS
    INF = np.iinfo(np.int64).max

    def keyed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        code = (
            pc.index_in(
                batch.column("event_type"),
                value_set=pa.array(["signup", "purchase"]),
            )
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        m = code >= 0
        uid = batch.column("user_id").to_numpy().astype(np.int64)[m]
        return pa.table(
            {
                "part": pa.array(uid % parts),
                "user_id": pa.array(uid),
                "code": pa.array(code[m]),
                "ts": pa.array(
                    batch.column("ts").to_numpy().astype(np.int64)[m]
                ),
            }
        )

    def latency(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy()
        code = group.column("code").to_numpy()
        ts = group.column("ts").to_numpy()
        order = np.lexsort((ts, uid))
        uid, code, ts = uid[order], code[order], ts[order]
        new = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new)
        user_of = np.cumsum(new) - 1
        s_cand = np.where(code == 0, ts, INF)
        first_signup = np.minimum.reduceat(s_cand, starts)
        p_cand = ts.copy()
        p_cand[(code != 1) | (ts <= first_signup[user_of])] = INF
        first_purchase = np.minimum.reduceat(p_cand, starts)
        done = (first_signup < INF) & (first_purchase < INF)
        lat = (first_purchase - first_signup)[done]
        if lat.size == 0:
            return pa.table(
                {
                    "n": pa.array([0], pa.int64()),
                    "s": pa.array([0], pa.int64()),
                    "mn": pa.array([INF], pa.int64()),
                    "mx": pa.array([-1], pa.int64()),
                }
            )
        return pa.table(
            {
                "n": pa.array([int(lat.size)], pa.int64()),
                "s": pa.array([int(lat.sum())], pa.int64()),
                "mn": pa.array([int(lat.min())], pa.int64()),
                "mx": pa.array([int(lat.max())], pa.int64()),
            }
        )

    rows = (
        _read(sf_dir, "events", ["user_id", "event_type", "ts"])
        .map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(shuffle_parts(table_rows(sf_dir, "events") * 32))
        .groupby("part")
        .map_groups(latency, batch_format="pyarrow")
        .take_all()
    )  # <= SESSION_PARTITIONS four-int rows
    n = sum(int(r["n"]) for r in rows)
    s = sum(int(r["s"]) for r in rows)
    mn = min((int(r["mn"]) for r in rows), default=INF)
    mx = max((int(r["mx"]) for r in rows), default=-1)
    if n == 0:
        return pa.table(
            {
                "n_converted": pa.array([0], pa.int64()),
                "sum_latency_us": pa.array([0], pa.int64()),
                "min_latency_us": pa.array([0], pa.int64()),
                "max_latency_us": pa.array([0], pa.int64()),
            }
        )
    return pa.table(
        {
            "n_converted": pa.array([n], pa.int64()),
            "sum_latency_us": pa.array([s], pa.int64()),
            "min_latency_us": pa.array([mn], pa.int64()),
            "max_latency_us": pa.array([mx], pa.int64()),
        }
    )


def rolling_active_users(sf_dir: str, window_days: int = 7):
    """Rolling window_days-day DISTINCT active users per calendar day —
    the windowed COUNT(DISTINCT) that naively needs a per-window set
    union. Done exactly with NO set shipping: a user is active in
    window-ending-day d iff any of their event days falls in
    [d - window_days + 1, d]; equivalently each active day covers the
    day interval [day, day + window_days - 1], so per USER the covered
    windows are a union of intervals — one diff-array stamp + cumsum
    over the corpus's day range. Each user then contributes EXACTLY one
    count to each covered window, and the global per-day rollup is an
    integer sum of per-partition day vectors. (day_us, n_active) for
    every day in the corpus's day range, sorted.

    ONE user-keyed bounded exchange; per-partition output is
    O(day_range) ints regardless of user count."""
    import datetime as _dt

    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    parts = SESSION_PARTITIONS
    day_us = 86_400_000_000
    # corpus day range from parquet footer min/max (zero data read).
    # Footer stats decode to NAIVE datetimes; interpret them explicitly
    # as UTC (naive .timestamp() would apply the machine timezone and
    # shift every day boundary off the raw UTC epoch-us the rows carry).
    f = pq.ParquetFile(f"{sf_dir}/events.parquet")
    lo = None
    hi = None

    def _us_of(v) -> int:
        if isinstance(v, _dt.datetime):
            if v.tzinfo is None:
                v = v.replace(tzinfo=_dt.timezone.utc)
            return int(v.timestamp() * 1e6)
        return int(v)

    for rg in range(f.metadata.num_row_groups):
        for ci in range(f.metadata.row_group(rg).num_columns):
            col = f.metadata.row_group(rg).column(ci)
            if col.path_in_schema == "ts" and col.statistics is not None:
                mn_us = _us_of(col.statistics.min)
                mx_us = _us_of(col.statistics.max)
                lo = mn_us if lo is None else min(lo, mn_us)
                hi = mx_us if hi is None else max(hi, mx_us)
    if lo is None:
        # stats absent: fall back to one narrow driver read of ts
        t_mm = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
        v = t_mm.column("ts").to_numpy().astype(np.int64)
        lo, hi = int(v.min()), int(v.max())
    day0 = lo // day_us
    n_days = hi // day_us - day0 + 1

    def keyed(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy().astype(np.int64)
        day = (
            batch.column("ts").to_numpy().astype(np.int64) // day_us - day0
        ).astype(np.int64)
        t = pa.table(
            {
                "part": pa.array(uid % parts),
                "user_id": pa.array(uid),
                "day": pa.array(day),
            }
        )
        # distinct (user, day) per batch shrinks the exchange
        return t.group_by(["part", "user_id", "day"]).aggregate([])

    def stamp(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy()
        day = group.column("day").to_numpy()
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        new = np.r_[True, uid[1:] != uid[:-1]]
        user_of = np.cumsum(new) - 1
        n_users = int(new.sum())
        # interval union per user: stamp [day, day+window) in a per-user
        # diff row, then covered = cumsum > 0; summed over users via one
        # 2-D bincount on (user, day) pairs
        width = n_days + window_days + 1
        diff = np.zeros(n_users * width, dtype=np.int64)
        np.add.at(diff, user_of * width + day, 1)
        np.add.at(
            diff,
            user_of * width + np.minimum(day + window_days, width - 1),
            -1,
        )
        covered = (
            np.cumsum(diff.reshape(n_users, width), axis=1) > 0
        )[:, :n_days]
        per_day = covered.sum(axis=0).astype(np.int64)
        return pa.table(
            {
                "day": pa.array(np.arange(n_days, dtype=np.int64)),
                "n": pa.array(per_day),
            }
        )

    agg = (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(shuffle_parts(table_rows(sf_dir, "events") * 24))
        .groupby("part")
        .map_groups(stamp, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        d = batch.column("day").to_numpy().astype(np.int64)
        return pa.table(
            {
                "day_us": pa.array((d + day0) * day_us),
                "n_active": batch.column("sum(n)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort("day_us")


def small_quantity_revenue(sf_dir: str, brand: str = "Brand#1"):
    """TPC-H-Q17-shaped small-quantity-order revenue: total extended
    price (milli-integer) of lineitems for parts of ``brand`` whose
    quantity is under 20% of that part's average lineitem quantity.
    One-row output (revenue_milli, n_items).

    The correlated-avg subquery becomes ONE pkey % P exchange: the
    brand's partkeys arrive as side-0 rows (predicate-pushdown read of
    2 part columns), the projected lineitem rows as side-1; inside a
    partition each part's (count, qty-sum) is a bincount over its own
    rows (every row of a pkey lives in exactly one partition, so the
    average — and the 5*qty*cnt < sum integer bracket test, exact in
    milli units because the synthetic quantities are milli-exact — is
    computed once, locally). Per-partition (revenue, items) partials
    are a bounded P-row driver fold."""
    import pyarrow.compute as pc

    parts = SEMIJOIN_PARTITIONS

    def part_side(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("p_brand"), pa.scalar(brand))
        pk = batch.filter(mask).column("p_partkey").to_numpy().astype(np.int64)
        n = len(pk)
        return pa.table(
            {
                "part": pa.array(pk % parts),
                "pkey": pa.array(pk, pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int64)),
                "qm": pa.array(np.zeros(n, dtype=np.int64)),
                "pm": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy().astype(np.int64)
        return pa.table(
            {
                "part": pa.array(pk % parts),
                "pkey": pa.array(pk, pa.int64()),
                "side": pa.array(np.ones(len(pk), dtype=np.int64)),
                "qm": pa.array(_milli(batch.column("l_quantity").to_numpy())),
                "pm": pa.array(
                    _milli(batch.column("l_extendedprice").to_numpy())
                ),
            }
        )

    def meet(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        pkey = group.column("pkey").to_numpy()
        bkeys = np.unique(pkey[side == 0])
        lidx = np.flatnonzero(side == 1)
        if bkeys.size == 0 or lidx.size == 0:
            return pa.table(
                {
                    "revenue_milli": pa.array([0], pa.int64()),
                    "n_items": pa.array([0], pa.int64()),
                }
            )
        lk = pkey[lidx]
        pos = np.minimum(np.searchsorted(bkeys, lk), bkeys.size - 1)
        hit = bkeys[pos] == lk
        qm = group.column("qm").to_numpy()[lidx]
        pm = group.column("pm").to_numpy()[lidx]
        cnt = np.zeros(bkeys.size, np.int64)
        sq = np.zeros(bkeys.size, np.int64)
        np.add.at(cnt, pos[hit], 1)
        np.add.at(sq, pos[hit], qm[hit])
        live = hit & (5 * qm * cnt[pos] < sq[pos])
        return pa.table(
            {
                "revenue_milli": pa.array([int(pm[live].sum())], pa.int64()),
                "n_items": pa.array([int(live.sum())], pa.int64()),
            }
        )

    p = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        part_side, batch_format="pyarrow", zero_copy_batch=True
    )
    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
    ).map_batches(line_side, batch_format="pyarrow", zero_copy_batch=True)
    est = table_rows(sf_dir, "lineitem") * 40
    partials = (
        p.union(li)
        .repartition(shuffle_parts(est))
        .groupby("part")
        .map_groups(meet, batch_format="pyarrow")
        .take_all()
    )
    return pa.table(
        {
            "revenue_milli": pa.array(
                [sum(int(r["revenue_milli"]) for r in partials)], pa.int64()
            ),
            "n_items": pa.array(
                [sum(int(r["n_items"]) for r in partials)], pa.int64()
            ),
        }
    )


def sole_late_supplier_counts(
    sf_dir: str, late_days: int = 30, k: int = 10
):
    """TPC-H-Q21-shaped waiting-supplier ranking (this corpus has no
    commit/receipt dates, so "late" = the supplier's latest ship date
    on the order is more than ``late_days`` days past the order date):
    for finished orders (o_orderstatus='F') involving >= 2 distinct
    suppliers where EXACTLY ONE supplier shipped late, credit that
    supplier; output the top-k (s_name, suppkey, numwait) by
    (numwait desc, suppkey asc) — the tie-break is the KEY, not the
    name, so the k-boundary is deterministic independent of the name
    format (TPC-H's s_name order and key order coincide only when the
    numeric suffix is zero-padded).

    The EXISTS / NOT-EXISTS pair collapses into ONE okey % P exchange:
    the lineitem side pre-aggregates per-batch (okey, suppkey) ->
    max(shipdate) partials (max of maxes is exact across batches), the
    orders side ships (okey, orderdate) for 'F' orders; inside a
    partition each order's supplier set, late set, and the
    sole-late-supplier test are run-length math over one lexsort. The
    per-supplier credits then fold through a bounded suppkey groupby
    (O(suppliers) rows, never O(lineitems)), and the final top-k
    attaches s_name with a k-row pushed-down supplier read."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    parts = SEMIJOIN_PARTITIONS
    late_us = int(late_days) * 86_400_000_000

    def order_side(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("o_orderstatus"), pa.scalar("F"))
        sel = batch.filter(mask)
        ok = sel.column("o_orderkey").to_numpy().astype(np.int64)
        return pa.table(
            {
                "part": pa.array(ok % parts),
                "okey": pa.array(ok, pa.int64()),
                "side": pa.array(np.zeros(len(ok), dtype=np.int64)),
                "sk": pa.array(np.zeros(len(ok), dtype=np.int64)),
                "ts": pa.array(
                    sel.column("o_orderdate").to_numpy().astype(np.int64)
                ),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "okey": batch.column("l_orderkey").cast(pa.int64()),
                "sk": batch.column("l_suppkey").cast(pa.int64()),
                "ms": pa.array(
                    batch.column("l_shipdate").to_numpy().astype(np.int64)
                ),
            }
        )
        g = t.group_by(["okey", "sk"]).aggregate([("ms", "max")])
        ok = g.column("okey").to_numpy()
        return pa.table(
            {
                "part": pa.array(ok % parts),
                "okey": g.column("okey"),
                "side": pa.array(np.ones(len(ok), dtype=np.int64)),
                "sk": g.column("sk"),
                "ts": g.column("ms_max").cast(pa.int64()),
            }
        )

    def meet(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        okey = group.column("okey").to_numpy()
        empty = pa.table(
            {
                "suppkey": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        oidx = np.flatnonzero(side == 0)
        lidx = np.flatnonzero(side == 1)
        if oidx.size == 0 or lidx.size == 0:
            return empty
        okeys = okey[oidx]
        oorder = np.argsort(okeys, kind="stable")
        okeys_s = okeys[oorder]
        odate_s = group.column("ts").to_numpy()[oidx][oorder]
        lk = okey[lidx]
        pos = np.minimum(np.searchsorted(okeys_s, lk), okeys_s.size - 1)
        hit = okeys_s[pos] == lk  # F-order lineitems only
        if not hit.any():
            return empty
        lk = lk[hit]
        sk = group.column("sk").to_numpy()[lidx][hit]
        ms = group.column("ts").to_numpy()[lidx][hit]
        cutoff = odate_s[pos[hit]] + late_us
        # fold duplicate (okey, suppkey) partials: max of maxes
        order2 = np.lexsort((sk, lk))
        lk, sk, ms, cutoff = (
            lk[order2], sk[order2], ms[order2], cutoff[order2],
        )
        new_pair = np.r_[
            True, (lk[1:] != lk[:-1]) | (sk[1:] != sk[:-1])
        ]
        pid = np.cumsum(new_pair) - 1
        n_pairs = pid[-1] + 1
        pair_ms = np.zeros(n_pairs, np.int64)
        np.maximum.at(pair_ms, pid, ms)
        starts = np.flatnonzero(new_pair)
        p_ok, p_sk, p_cut = lk[starts], sk[starts], cutoff[starts]
        p_late = pair_ms > p_cut
        # per order: supplier count and late count (pairs sorted by okey)
        new_o = np.r_[True, p_ok[1:] != p_ok[:-1]]
        oid = np.cumsum(new_o) - 1
        n_o = oid[-1] + 1
        ns = np.bincount(oid, minlength=n_o)
        nl = np.bincount(oid, weights=p_late, minlength=n_o).astype(np.int64)
        win = p_late & (nl[oid] == 1) & (ns[oid] >= 2)
        if not win.any():
            return empty
        wsk = p_sk[win]
        uniq, inv = np.unique(wsk, return_inverse=True)
        c = np.bincount(inv).astype(np.int64)
        return pa.table(
            {"suppkey": pa.array(uniq, pa.int64()), "c": pa.array(c)}
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_orderdate"]
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)
    lines = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"]
    ).map_batches(line_side, batch_format="pyarrow", zero_copy_batch=True)
    est = (table_rows(sf_dir, "orders") + table_rows(sf_dir, "lineitem")) * 40
    counts = (
        orders.union(lines)
        .repartition(shuffle_parts(est))
        .groupby("part")
        .map_groups(meet, batch_format="pyarrow")
        .groupby("suppkey")
        .aggregate(Sum("c"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "suppkey": batch.column("suppkey"),
                "numwait": batch.column("sum(c)").cast(pa.int64()),
            }
        )

    top = (
        _dataset_topk(
            counts.map_batches(rename, batch_format="pyarrow"),
            [("numwait", "descending"), ("suppkey", "ascending")],
            k,
        )
        .take_all()
    )
    if not top:
        return pa.table(
            {
                "s_name": pa.array([], pa.string()),
                "suppkey": pa.array([], pa.int64()),
                "numwait": pa.array([], pa.int64()),
            }
        )
    sks = [int(r["suppkey"]) for r in top]
    names = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey", "s_name"],
        filter=pads.field("s_suppkey").isin(sks),
    )
    nm = dict(
        zip(
            names.column("s_suppkey").to_pylist(),
            names.column("s_name").to_pylist(),
        )
    )
    out = pa.table(
        {
            "s_name": pa.array([nm[s] for s in sks], pa.string()),
            "suppkey": pa.array(sks, pa.int64()),
            "numwait": pa.array([int(r["numwait"]) for r in top], pa.int64()),
        }
    )
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[("numwait", "descending"), ("suppkey", "ascending")],
        )
    )


def top_supplier_revenue(
    sf_dir: str, d0: str = "1997-01-01", d1: str = "1997-04-01"
):
    """TPC-H-Q15-shaped top supplier(s): per-supplier revenue
    sum(extprice * (1 - discount)) over a ship-date window, returning
    every supplier that achieves the MAXIMUM (the view-max form of Q15
    keeps ties). Output (suppkey, s_name, total_revenue_milli) sorted
    by suppkey.

    The date window is pushed into the read (only matching row groups
    leave storage); per-batch partials pre-aggregate (suppkey ->
    revenue) so the groupby exchange moves O(batches x suppliers/batch)
    rows, never lineitems; the max + tie filter is two bounded passes
    over the O(suppliers) counts; names attach via a pushed-down
    supplier read bounded by the winner count."""
    import datetime

    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray.data
    from ray.data.aggregate import Sum

    lo = datetime.datetime.fromisoformat(d0)
    hi = datetime.datetime.fromisoformat(d1)

    def partial(batch: pa.Table) -> pa.Table:
        sk = batch.column("l_suppkey").to_numpy().astype(np.int64)
        rev = _milli(
            batch.column("l_extendedprice").to_numpy()
            * (1.0 - batch.column("l_discount").to_numpy())
        )
        uniq, inv = np.unique(sk, return_inverse=True)
        r = np.zeros(uniq.size, np.int64)
        np.add.at(r, inv, rev)
        return pa.table(
            {"suppkey": pa.array(uniq, pa.int64()), "rev": pa.array(r)}
        )

    counts = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
            filter=(pads.field("l_shipdate") >= lo)
            & (pads.field("l_shipdate") < hi),
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("suppkey")
        .aggregate(Sum("rev"))
        .materialize()
    )
    mx = counts.max("sum(rev)")
    if mx is None:
        return pa.table(
            {
                "suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "total_revenue_milli": pa.array([], pa.int64()),
            }
        )
    def keep_max(batch: pa.Table) -> pa.Table:
        m = batch.column("sum(rev)").to_numpy()
        return batch.filter(pa.array(m == int(mx)))

    winners = counts.map_batches(
        keep_max, batch_format="pyarrow"
    ).take_all()
    sks = sorted(int(r["suppkey"]) for r in winners)
    names = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey", "s_name"],
        filter=pads.field("s_suppkey").isin(sks),
    )
    nm = dict(
        zip(
            names.column("s_suppkey").to_pylist(),
            names.column("s_name").to_pylist(),
        )
    )
    return pa.table(
        {
            "suppkey": pa.array(sks, pa.int64()),
            "s_name": pa.array([nm[s] for s in sks], pa.string()),
            "total_revenue_milli": pa.array(
                [int(mx)] * len(sks), pa.int64()
            ),
        }
    )


def _year_of_us(date_us: np.ndarray) -> np.ndarray:
    """Vectorized calendar year from timestamp[us] int64 values."""
    return (
        date_us.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
        + 1970
    )


def volume_shipping_regions(
    sf_dir: str,
    region_a: str = "ASIA",
    region_b: str = "EUROPE",
    date_lo: str = "1995-01-01",
    date_hi: str = "1997-01-01",
):
    """TPC-H-Q7-shaped volume shipping between two REGIONS (this
    corpus's supplier table is too sparse per nation at small SF for the
    classic nation pair to be non-vacuous; the region pair keeps Q7's
    two-sided nation attribution — reference analog: probe's staged
    candidate narrowing, SURVEY.md SS3.5). Revenue (milli-integer) per
    (supp_nation, cust_nation, l_year) for lineitems shipped inside the
    date window where the supplier sits in one region and the ordering
    customer in the other, both directions. Sorted by
    (supp_nation, cust_nation, l_year).

    Same two-exchange shape as Q5 (`local_supplier_volume`):
      1. custkey exchange (customer |><| orders) annotates surviving
         orders with the customer nation;
      2. okey exchange meets those survivors with per-batch
         (okey, snat, year)->rev lineitem partials (supplier nation via
         the size-aware driver-dict / distributed-join crossover).
    Every exchange is bounded-partition; the final
    (snat, cnat, year) aggregate is a constant-domain groupby
    (<= 625 nation pairs x years)."""
    keys_a, nation_names = _region_nation_maps(sf_dir, region_a)
    keys_b, _ = _region_nation_maps(sf_dir, region_b)
    both = np.union1d(keys_a, keys_b)
    lo_us, hi_us = _us(date_lo), _us(date_hi)
    parts = SEMIJOIN_PARTITIONS
    n_supp = table_rows(sf_dir, "supplier")

    def cust_side(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy().astype(np.int64)
        m = np.isin(nk, both)
        ck = batch.column("c_custkey").to_numpy().astype(np.int64)[m]
        n = len(ck)
        z = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "part": pa.array(ck % parts),
                "key": pa.array(ck, pa.int64()),
                "side": pa.array(z),
                "okey": pa.array(z),
                "nat": pa.array(nk[m]),
                "yr": pa.array(z),
                "rev": pa.array(z),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy().astype(np.int64)
        ok = batch.column("o_orderkey").to_numpy().astype(np.int64)
        n = len(ck)
        z = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "part": pa.array(ck % parts),
                "key": pa.array(ck, pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int64)),
                "okey": pa.array(ok, pa.int64()),
                "nat": pa.array(z),
                "yr": pa.array(z),
                "rev": pa.array(z),
            }
        )

    def meet_cust(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        key = group.column("key").to_numpy()
        dmask = side == 0
        dkeys = key[dmask]
        order = np.argsort(dkeys, kind="stable")
        dnat = group.column("nat").to_numpy()[dmask][order]
        fidx = np.flatnonzero(~dmask)
        nat, found = _sorted_lookup(dkeys[order], dnat, key[fidx])
        sel = np.flatnonzero(found)
        ok = group.column("okey").to_numpy()[fidx][sel]
        n = len(sel)
        z = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "part": pa.array(ok % parts),
                "okey": pa.array(ok, pa.int64()),
                "side": pa.array(z),
                "nat": pa.array(nat[sel]),
                "yr": pa.array(z),
                "rev": pa.array(z),
            }
        )

    def _line_partial(ok, snat, yr, rev):
        t = pa.table(
            {
                "okey": pa.array(ok),
                "nat": pa.array(snat),
                "yr": pa.array(yr),
                "r": pa.array(rev),
            }
        )
        g = t.group_by(["okey", "nat", "yr"]).aggregate([("r", "sum")])
        ok2 = g.column("okey").to_numpy()
        n = len(ok2)
        return pa.table(
            {
                "part": pa.array(ok2 % parts),
                "okey": g.column("okey"),
                "side": pa.array(np.ones(n, dtype=np.int64)),
                "nat": g.column("nat"),
                "yr": g.column("yr"),
                "rev": g.column("r_sum").cast(pa.int64()),
            }
        )

    line_cols = [
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        "l_extendedprice",
        "l_discount",
    ]
    if n_supp <= DICT_DRIVER_MAX_ROWS:
        import pyarrow.parquet as pq

        supp_t = pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        sk = supp_t.column("s_suppkey").to_numpy().astype(np.int64)
        sv = supp_t.column("s_nationkey").to_numpy().astype(np.int64)
        so = np.argsort(sk, kind="stable")
        sk, sv = sk[so], sv[so]

        def line_side(batch: pa.Table) -> pa.Table:
            date_us = batch.column("l_shipdate").to_numpy().astype(np.int64)
            dm = (date_us >= lo_us) & (date_us < hi_us)
            snat, found = _sorted_lookup(
                sk, sv, batch.column("l_suppkey").to_numpy().astype(np.int64)
            )
            m = dm & found & np.isin(snat, both)
            rev = _milli(
                batch.column("l_extendedprice").to_numpy()[m]
                * (1.0 - batch.column("l_discount").to_numpy()[m])
            )
            return _line_partial(
                batch.column("l_orderkey").to_numpy().astype(np.int64)[m],
                snat[m],
                _year_of_us(date_us[m]),
                rev,
            )

        lines = _read(sf_dir, "lineitem", line_cols).map_batches(
            line_side, batch_format="pyarrow", zero_copy_batch=True
        )
    else:

        def partial_sk(batch: pa.Table) -> pa.Table:
            date_us = batch.column("l_shipdate").to_numpy().astype(np.int64)
            dm = (date_us >= lo_us) & (date_us < hi_us)
            rev = _milli(
                batch.column("l_extendedprice").to_numpy()[dm]
                * (1.0 - batch.column("l_discount").to_numpy()[dm])
            )
            t = pa.table(
                {
                    "sk": batch.column("l_suppkey").filter(pa.array(dm)),
                    "okey": batch.column("l_orderkey").filter(pa.array(dm)),
                    "yr": pa.array(_year_of_us(date_us[dm])),
                    "rev": pa.array(rev),
                }
            )
            return t.group_by(["sk", "okey", "yr"]).aggregate([("rev", "sum")])

        fact = _read(sf_dir, "lineitem", line_cols).map_batches(
            partial_sk, batch_format="pyarrow", zero_copy_batch=True
        )
        joined = _lookup_join_distributed(
            fact,
            "sk",
            _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
            "s_suppkey",
            "s_nationkey",
            pa.int64(),
            ["okey", "yr", "rev_sum"],
            "snat",
            est_bytes=(table_rows(sf_dir, "lineitem") + n_supp) * 56,
        )

        def reshape(batch: pa.Table) -> pa.Table:
            snat_col = batch.column("snat")
            snat = snat_col.to_numpy(zero_copy_only=False)
            valid = np.asarray(pa.compute.is_valid(snat_col))
            snat = np.where(valid, snat, -1).astype(np.int64)
            m = np.isin(snat, both)
            return _line_partial(
                batch.column("okey").to_numpy().astype(np.int64)[m],
                snat[m],
                batch.column("yr").to_numpy().astype(np.int64)[m],
                batch.column("rev_sum").to_numpy().astype(np.int64)[m],
            )

        lines = joined.map_batches(reshape, batch_format="pyarrow")

    def meet_rev(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        okey = group.column("okey").to_numpy()
        dmask = side == 0
        dkeys = okey[dmask]
        order = np.argsort(dkeys, kind="stable")
        cnat = group.column("nat").to_numpy()[dmask][order]
        fidx = np.flatnonzero(~dmask)
        onat, found = _sorted_lookup(dkeys[order], cnat, okey[fidx])
        snat = group.column("nat").to_numpy()[fidx]
        a_mask = np.isin(snat, keys_a) & np.isin(onat, keys_b)
        b_mask = np.isin(snat, keys_b) & np.isin(onat, keys_a)
        m = found & (a_mask | b_mask)
        t = pa.table(
            {
                "snat": pa.array(snat[m]),
                "cnat": pa.array(onat[m]),
                "yr": pa.array(group.column("yr").to_numpy()[fidx][m]),
                "r": pa.array(group.column("rev").to_numpy()[fidx][m]),
            }
        )
        return t.group_by(["snat", "cnat", "yr"]).aggregate([("r", "sum")])

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_side, batch_format="pyarrow", zero_copy_batch=True
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        order_side, batch_format="pyarrow", zero_copy_batch=True
    )
    est1 = (table_rows(sf_dir, "customer") + table_rows(sf_dir, "orders")) * 56
    surviving = (
        cust.union(orders)
        .repartition(shuffle_parts(est1))
        .groupby("part")
        .map_groups(meet_cust, batch_format="pyarrow")
    )
    est2 = (table_rows(sf_dir, "orders") + table_rows(sf_dir, "lineitem")) * 56
    per_part = (
        surviving.union(lines)
        .repartition(shuffle_parts(est2))
        .groupby("part")
        .map_groups(meet_rev, batch_format="pyarrow")
    )
    from ray.data.aggregate import Sum

    agg = per_part.groupby(["snat", "cnat", "yr"]).aggregate(Sum("r_sum"))

    def rename(batch: pa.Table) -> pa.Table:
        sn = batch.column("snat").to_numpy().astype(np.int64)
        cn = batch.column("cnat").to_numpy().astype(np.int64)
        return pa.table(
            {
                "supp_nation": pa.array(
                    [nation_names[int(x)] for x in sn], pa.string()
                ),
                "cust_nation": pa.array(
                    [nation_names[int(x)] for x in cn], pa.string()
                ),
                "l_year": batch.column("yr").cast(pa.int64()),
                "revenue_milli": batch.column("sum(r_sum)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort(
        ["supp_nation", "cust_nation", "l_year"]
    )


def important_parts_by_region(
    sf_dir: str,
    region: str = "ASIA",
    mult_num: int = 12,
    mult_den: int = 10,
):
    """TPC-H-Q11-shaped important stock (adapted: this corpus has no
    partsupp, so a part's "value" is the summed milli-integer
    extendedprice x quantity of its lineitems supplied by ``region``'s
    suppliers). Emits every part whose value exceeds
    ``mult_num/mult_den`` times the MEAN part value (the classic Q11
    fraction is 0.0001/SF, i.e. scale-dependent by design — the
    mean-relative form keeps the query non-vacuous at every corpus
    size). (p_partkey, value_milli) sorted by
    (value_milli desc, p_partkey asc).

    Q11's correlated global-threshold subquery becomes: per-batch
    (partkey -> value) partials (supplier-region membership via the
    size-aware driver-dict / distributed-join crossover), ONE
    groupby(partkey) exchange, then a streamed Dataset sum + count for
    the global mean — the threshold test is exact integer math
    (value * n_parts * mult_den > total * mult_num), never a float
    share. The per-part aggregate is O(parts) rows; nothing larger
    ever materializes."""
    region_keys, _ = _region_nation_maps(sf_dir, region)
    n_supp = table_rows(sf_dir, "supplier")

    def _partial(pk, val):
        t = pa.table({"pkey": pa.array(pk), "v": pa.array(val)})
        return t.group_by(["pkey"]).aggregate([("v", "sum")])

    if n_supp <= DICT_DRIVER_MAX_ROWS:
        import pyarrow.parquet as pq

        supp_t = pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        sk = supp_t.column("s_suppkey").to_numpy().astype(np.int64)
        sv = supp_t.column("s_nationkey").to_numpy().astype(np.int64)
        so = np.argsort(sk, kind="stable")
        sk, sv = sk[so], sv[so]

        def line_side(batch: pa.Table) -> pa.Table:
            snat, found = _sorted_lookup(
                sk, sv, batch.column("l_suppkey").to_numpy().astype(np.int64)
            )
            m = found & np.isin(snat, region_keys)
            val = _milli(
                batch.column("l_extendedprice").to_numpy()[m]
                * batch.column("l_quantity").to_numpy()[m]
            )
            return _partial(
                batch.column("l_partkey").to_numpy().astype(np.int64)[m], val
            )

        partials = _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
        ).map_batches(line_side, batch_format="pyarrow", zero_copy_batch=True)
    else:

        def pre(batch: pa.Table) -> pa.Table:
            val = _milli(
                batch.column("l_extendedprice").to_numpy()
                * batch.column("l_quantity").to_numpy()
            )
            t = pa.table(
                {
                    "sk": batch.column("l_suppkey"),
                    "pkey": batch.column("l_partkey"),
                    "v": pa.array(val),
                }
            )
            return t.group_by(["sk", "pkey"]).aggregate([("v", "sum")])

        fact = _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
        ).map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        joined = _lookup_join_distributed(
            fact,
            "sk",
            _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
            "s_suppkey",
            "s_nationkey",
            pa.int64(),
            ["pkey", "v_sum"],
            "snat",
            est_bytes=(table_rows(sf_dir, "lineitem") + n_supp) * 48,
        )

        def reshape(batch: pa.Table) -> pa.Table:
            snat_col = batch.column("snat")
            snat = snat_col.to_numpy(zero_copy_only=False)
            valid = np.asarray(pa.compute.is_valid(snat_col))
            snat = np.where(valid, snat, -1).astype(np.int64)
            m = np.isin(snat, region_keys)
            return _partial(
                batch.column("pkey").to_numpy().astype(np.int64)[m],
                batch.column("v_sum").to_numpy().astype(np.int64)[m],
            )

        partials = joined.map_batches(reshape, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    per_part = partials.groupby("pkey").aggregate(Sum("v_sum")).materialize()
    total = per_part.sum("sum(v_sum)") or 0
    n_parts = per_part.count()
    thresh_num = int(total) * mult_num

    def select(batch: pa.Table) -> pa.Table:
        v = batch.column("sum(v_sum)").to_numpy().astype(np.int64)
        m = v * n_parts * mult_den > thresh_num
        return pa.table(
            {
                "p_partkey": batch.column("pkey").cast(pa.int64()).filter(
                    pa.array(m)
                ),
                "value_milli": pa.array(v[m], pa.int64()),
            }
        )

    return per_part.map_batches(select, batch_format="pyarrow").sort(
        ["value_milli", "p_partkey"], descending=[True, False]
    )


def _nation_key_by_name(sf_dir: str, name: str) -> int:
    """nationkey of one n_name (nation is a constant 25 rows)."""
    import pyarrow.parquet as pq

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    for nk, nm in zip(
        nation.column("n_nationkey").to_pylist(),
        nation.column("n_name").to_pylist(),
    ):
        if nm == name:
            return int(nk)
    raise KeyError(name)


def nation_market_share(
    sf_dir: str,
    nation: str = "NATION_8",
    region: str = "ASIA",
    ptype: str = "PROMO",
    date_lo: str = "1995-01-01",
    date_hi: str = "1997-01-01",
):
    """TPC-H-Q8-shaped market share: among lineitems of ``ptype`` parts
    ordered by ``region`` customers inside the date window, the revenue
    supplied by ``nation`` vs all revenue, per order year. Integer-milli
    numerator/denominator per row — (o_year, nation_rev_milli,
    total_rev_milli) sorted by o_year; the share itself is the caller's
    division (Q14 idiom, keeps the oracle comparison exact).

    Q8's six-way join becomes the Q7 two-exchange shape plus a part
    filter folded into the line partials:
      1. custkey exchange: region customers meet date-windowed orders;
         survivors carry (okey, order year);
      2. okey exchange: survivors meet per-batch
         (okey, is-target-supplier) -> rev line partials (part-type and
         supplier-nation lookups ride the size-aware driver-dict /
         distributed-join crossover, chained joins in the distributed
         branch).
    The final fold is a bounded (partitions x years x 2)-row driver
    reduction."""
    region_keys, _ = _region_nation_maps(sf_dir, region)
    target_key = _nation_key_by_name(sf_dir, nation)
    lo_us, hi_us = _us(date_lo), _us(date_hi)
    parts = SEMIJOIN_PARTITIONS
    n_dim = max(table_rows(sf_dir, "supplier"), table_rows(sf_dir, "part"))

    def cust_side(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy().astype(np.int64)
        m = np.isin(nk, region_keys)
        ck = batch.column("c_custkey").to_numpy().astype(np.int64)[m]
        n = len(ck)
        z = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "part": pa.array(ck % parts),
                "key": pa.array(ck, pa.int64()),
                "side": pa.array(z),
                "okey": pa.array(z),
                "yr": pa.array(z),
                "tgt": pa.array(z),
                "rev": pa.array(z),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        date_us = batch.column("o_orderdate").to_numpy().astype(np.int64)
        m = (date_us >= lo_us) & (date_us < hi_us)
        ck = batch.column("o_custkey").to_numpy().astype(np.int64)[m]
        ok = batch.column("o_orderkey").to_numpy().astype(np.int64)[m]
        n = len(ck)
        z = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "part": pa.array(ck % parts),
                "key": pa.array(ck, pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int64)),
                "okey": pa.array(ok, pa.int64()),
                "yr": pa.array(_year_of_us(date_us[m])),
                "tgt": pa.array(z),
                "rev": pa.array(z),
            }
        )

    def meet_cust(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        key = group.column("key").to_numpy()
        dmask = side == 0
        dkeys = key[dmask]
        order = np.argsort(dkeys, kind="stable")
        fidx = np.flatnonzero(~dmask)
        _, found = _sorted_lookup(
            dkeys[order], np.zeros(dmask.sum(), np.int64), key[fidx]
        )
        sel = np.flatnonzero(found)
        ok = group.column("okey").to_numpy()[fidx][sel]
        n = len(sel)
        z = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "part": pa.array(ok % parts),
                "okey": pa.array(ok, pa.int64()),
                "side": pa.array(z),
                "yr": pa.array(group.column("yr").to_numpy()[fidx][sel]),
                "tgt": pa.array(z),
                "rev": pa.array(z),
            }
        )

    def _line_partial(ok, tgt, rev):
        t = pa.table(
            {"okey": pa.array(ok), "tgt": pa.array(tgt), "r": pa.array(rev)}
        )
        g = t.group_by(["okey", "tgt"]).aggregate([("r", "sum")])
        ok2 = g.column("okey").to_numpy()
        n = len(ok2)
        return pa.table(
            {
                "part": pa.array(ok2 % parts),
                "okey": g.column("okey"),
                "side": pa.array(np.ones(n, dtype=np.int64)),
                "yr": pa.array(np.zeros(n, dtype=np.int64)),
                "tgt": g.column("tgt"),
                "rev": g.column("r_sum").cast(pa.int64()),
            }
        )

    line_cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
    if n_dim <= DICT_DRIVER_MAX_ROWS:
        import pyarrow.parquet as pq

        part_t = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
        )
        pk = part_t.column("p_partkey").to_numpy().astype(np.int64)
        is_type = np.asarray(
            pa.compute.equal(part_t.column("p_type"), ptype)
        ).astype(np.int64)
        po = np.argsort(pk, kind="stable")
        pk, is_type = pk[po], is_type[po]
        supp_t = pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        sk = supp_t.column("s_suppkey").to_numpy().astype(np.int64)
        sv = supp_t.column("s_nationkey").to_numpy().astype(np.int64)
        so = np.argsort(sk, kind="stable")
        sk, sv = sk[so], sv[so]

        def line_side(batch: pa.Table) -> pa.Table:
            isp, pfound = _sorted_lookup(
                pk, is_type, batch.column("l_partkey").to_numpy().astype(np.int64)
            )
            snat, sfound = _sorted_lookup(
                sk, sv, batch.column("l_suppkey").to_numpy().astype(np.int64)
            )
            m = pfound & (isp == 1) & sfound
            rev = _milli(
                batch.column("l_extendedprice").to_numpy()[m]
                * (1.0 - batch.column("l_discount").to_numpy()[m])
            )
            return _line_partial(
                batch.column("l_orderkey").to_numpy().astype(np.int64)[m],
                (snat[m] == target_key).astype(np.int64),
                rev,
            )

        lines = _read(sf_dir, "lineitem", line_cols).map_batches(
            line_side, batch_format="pyarrow", zero_copy_batch=True
        )
    else:

        def pre(batch: pa.Table) -> pa.Table:
            rev = _milli(
                batch.column("l_extendedprice").to_numpy()
                * (1.0 - batch.column("l_discount").to_numpy())
            )
            t = pa.table(
                {
                    "pkc": batch.column("l_partkey"),
                    "skc": batch.column("l_suppkey"),
                    "okey": batch.column("l_orderkey"),
                    "rev": pa.array(rev),
                }
            )
            return t.group_by(["pkc", "skc", "okey"]).aggregate([("rev", "sum")])

        fact = _read(sf_dir, "lineitem", line_cols).map_batches(
            pre, batch_format="pyarrow", zero_copy_batch=True
        )
        est = (table_rows(sf_dir, "lineitem") + n_dim) * 56
        with_type = _lookup_join_distributed(
            fact,
            "pkc",
            _read(sf_dir, "part", ["p_partkey", "p_type"]),
            "p_partkey",
            "p_type",
            pa.string(),
            ["skc", "okey", "rev_sum"],
            "p_type",
            est_bytes=est,
        )

        def keep_type(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            m = _pc.fill_null(_pc.equal(batch.column("p_type"), ptype), False)
            return batch.filter(m).select(["skc", "okey", "rev_sum"])

        typed = with_type.map_batches(keep_type, batch_format="pyarrow")
        with_nat = _lookup_join_distributed(
            typed,
            "skc",
            _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
            "s_suppkey",
            "s_nationkey",
            pa.int64(),
            ["okey", "rev_sum"],
            "snat",
            est_bytes=est,
        )

        def reshape(batch: pa.Table) -> pa.Table:
            snat_col = batch.column("snat")
            snat = snat_col.to_numpy(zero_copy_only=False)
            valid = np.asarray(pa.compute.is_valid(snat_col))
            snat = np.where(valid, snat, -1).astype(np.int64)
            m = valid
            return _line_partial(
                batch.column("okey").to_numpy().astype(np.int64)[m],
                (snat[m] == target_key).astype(np.int64),
                batch.column("rev_sum").to_numpy().astype(np.int64)[m],
            )

        lines = with_nat.map_batches(reshape, batch_format="pyarrow")

    def meet_rev(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        okey = group.column("okey").to_numpy()
        dmask = side == 0
        dkeys = okey[dmask]
        order = np.argsort(dkeys, kind="stable")
        dyr = group.column("yr").to_numpy()[dmask][order]
        fidx = np.flatnonzero(~dmask)
        yr, found = _sorted_lookup(dkeys[order], dyr, okey[fidx])
        m = found
        t = pa.table(
            {
                "yr": pa.array(yr[m]),
                "tgt": pa.array(group.column("tgt").to_numpy()[fidx][m]),
                "r": pa.array(group.column("rev").to_numpy()[fidx][m]),
            }
        )
        return t.group_by(["yr", "tgt"]).aggregate([("r", "sum")])

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_side, batch_format="pyarrow", zero_copy_batch=True
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)
    est1 = (table_rows(sf_dir, "customer") + table_rows(sf_dir, "orders")) * 56
    surviving = (
        cust.union(orders)
        .repartition(shuffle_parts(est1))
        .groupby("part")
        .map_groups(meet_cust, batch_format="pyarrow")
    )
    est2 = (table_rows(sf_dir, "orders") + table_rows(sf_dir, "lineitem")) * 56
    per_part = (
        surviving.union(lines)
        .repartition(shuffle_parts(est2))
        .groupby("part")
        .map_groups(meet_rev, batch_format="pyarrow")
    )
    # bounded driver fold: <= partitions x years x 2 partial rows
    sums: dict[int, list] = {}
    for b in per_part.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for yr, tgt, r in zip(
            t.column("yr").to_pylist(),
            t.column("tgt").to_pylist(),
            t.column("r_sum").to_pylist(),
        ):
            acc = sums.setdefault(int(yr), [0, 0])
            acc[1] += int(r)
            if tgt:
                acc[0] += int(r)
    years = sorted(sums)
    return pa.table(
        {
            "o_year": pa.array(years, pa.int64()),
            "nation_rev_milli": pa.array(
                [sums[y][0] for y in years], pa.int64()
            ),
            "total_rev_milli": pa.array(
                [sums[y][1] for y in years], pa.int64()
            ),
        }
    )


def nation_keyword_revenue(sf_dir: str, keyword: str = "widget"):
    """TPC-H-Q9-shaped nation revenue (adapted: this corpus has no
    partsupp/supplycost, so "profit" is the milli-integer discounted
    revenue) for parts whose p_name contains ``keyword``, grouped by
    (supplier nation, order year). (supp_nation, o_year, revenue_milli)
    sorted by (supp_nation, o_year).

    ONE okey exchange: per-batch (okey, supplier-nation) -> rev line
    partials (keyword-part membership and supplier nation via the
    size-aware crossover, chained joins in the distributed branch) meet
    (okey -> order year) order rows; the final (nation, year) aggregate
    is a constant-domain groupby (<= 25 x years rows)."""
    _, nation_names = _region_nation_maps(sf_dir, "ASIA")
    parts = SEMIJOIN_PARTITIONS
    n_dim = max(table_rows(sf_dir, "supplier"), table_rows(sf_dir, "part"))

    def order_side(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").to_numpy().astype(np.int64)
        date_us = batch.column("o_orderdate").to_numpy().astype(np.int64)
        n = len(ok)
        z = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "part": pa.array(ok % parts),
                "okey": pa.array(ok, pa.int64()),
                "side": pa.array(z),
                "nat": pa.array(z),
                "yr": pa.array(_year_of_us(date_us)),
                "rev": pa.array(z),
            }
        )

    def _line_partial(ok, snat, rev):
        t = pa.table(
            {"okey": pa.array(ok), "nat": pa.array(snat), "r": pa.array(rev)}
        )
        g = t.group_by(["okey", "nat"]).aggregate([("r", "sum")])
        ok2 = g.column("okey").to_numpy()
        n = len(ok2)
        return pa.table(
            {
                "part": pa.array(ok2 % parts),
                "okey": g.column("okey"),
                "side": pa.array(np.ones(n, dtype=np.int64)),
                "nat": g.column("nat"),
                "yr": pa.array(np.zeros(n, dtype=np.int64)),
                "rev": g.column("r_sum").cast(pa.int64()),
            }
        )

    line_cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
    if n_dim <= DICT_DRIVER_MAX_ROWS:
        import pyarrow.parquet as pq

        part_t = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
        )
        pk = part_t.column("p_partkey").to_numpy().astype(np.int64)
        has_kw = np.asarray(
            pa.compute.match_substring(part_t.column("p_name"), keyword)
        ).astype(np.int64)
        po = np.argsort(pk, kind="stable")
        pk, has_kw = pk[po], has_kw[po]
        supp_t = pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        sk = supp_t.column("s_suppkey").to_numpy().astype(np.int64)
        sv = supp_t.column("s_nationkey").to_numpy().astype(np.int64)
        so = np.argsort(sk, kind="stable")
        sk, sv = sk[so], sv[so]

        def line_side(batch: pa.Table) -> pa.Table:
            kw, pfound = _sorted_lookup(
                pk, has_kw, batch.column("l_partkey").to_numpy().astype(np.int64)
            )
            snat, sfound = _sorted_lookup(
                sk, sv, batch.column("l_suppkey").to_numpy().astype(np.int64)
            )
            m = pfound & (kw == 1) & sfound
            rev = _milli(
                batch.column("l_extendedprice").to_numpy()[m]
                * (1.0 - batch.column("l_discount").to_numpy()[m])
            )
            return _line_partial(
                batch.column("l_orderkey").to_numpy().astype(np.int64)[m],
                snat[m],
                rev,
            )

        lines = _read(sf_dir, "lineitem", line_cols).map_batches(
            line_side, batch_format="pyarrow", zero_copy_batch=True
        )
    else:

        def pre(batch: pa.Table) -> pa.Table:
            rev = _milli(
                batch.column("l_extendedprice").to_numpy()
                * (1.0 - batch.column("l_discount").to_numpy())
            )
            t = pa.table(
                {
                    "pkc": batch.column("l_partkey"),
                    "skc": batch.column("l_suppkey"),
                    "okey": batch.column("l_orderkey"),
                    "rev": pa.array(rev),
                }
            )
            return t.group_by(["pkc", "skc", "okey"]).aggregate([("rev", "sum")])

        fact = _read(sf_dir, "lineitem", line_cols).map_batches(
            pre, batch_format="pyarrow", zero_copy_batch=True
        )
        est = (table_rows(sf_dir, "lineitem") + n_dim) * 56
        with_name = _lookup_join_distributed(
            fact,
            "pkc",
            _read(sf_dir, "part", ["p_partkey", "p_name"]),
            "p_partkey",
            "p_name",
            pa.string(),
            ["skc", "okey", "rev_sum"],
            "p_name",
            est_bytes=est,
        )

        def keep_kw(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            m = _pc.fill_null(
                _pc.match_substring(batch.column("p_name"), keyword), False
            )
            return batch.filter(m).select(["skc", "okey", "rev_sum"])

        kept = with_name.map_batches(keep_kw, batch_format="pyarrow")
        with_nat = _lookup_join_distributed(
            kept,
            "skc",
            _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
            "s_suppkey",
            "s_nationkey",
            pa.int64(),
            ["okey", "rev_sum"],
            "snat",
            est_bytes=est,
        )

        def reshape(batch: pa.Table) -> pa.Table:
            snat_col = batch.column("snat")
            snat = snat_col.to_numpy(zero_copy_only=False)
            valid = np.asarray(pa.compute.is_valid(snat_col))
            snat = np.where(valid, snat, -1).astype(np.int64)
            return _line_partial(
                batch.column("okey").to_numpy().astype(np.int64)[valid],
                snat[valid],
                batch.column("rev_sum").to_numpy().astype(np.int64)[valid],
            )

        lines = with_nat.map_batches(reshape, batch_format="pyarrow")

    def meet_rev(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        okey = group.column("okey").to_numpy()
        dmask = side == 0
        dkeys = okey[dmask]
        order = np.argsort(dkeys, kind="stable")
        dyr = group.column("yr").to_numpy()[dmask][order]
        fidx = np.flatnonzero(~dmask)
        yr, found = _sorted_lookup(dkeys[order], dyr, okey[fidx])
        t = pa.table(
            {
                "nat": pa.array(group.column("nat").to_numpy()[fidx][found]),
                "yr": pa.array(yr[found]),
                "r": pa.array(group.column("rev").to_numpy()[fidx][found]),
            }
        )
        return t.group_by(["nat", "yr"]).aggregate([("r", "sum")])

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate"]
    ).map_batches(order_side, batch_format="pyarrow", zero_copy_batch=True)
    est2 = (table_rows(sf_dir, "orders") + table_rows(sf_dir, "lineitem")) * 56
    per_part = (
        orders.union(lines)
        .repartition(shuffle_parts(est2))
        .groupby("part")
        .map_groups(meet_rev, batch_format="pyarrow")
    )
    from ray.data.aggregate import Sum

    agg = per_part.groupby(["nat", "yr"]).aggregate(Sum("r_sum"))

    def rename(batch: pa.Table) -> pa.Table:
        nat = batch.column("nat").to_numpy().astype(np.int64)
        return pa.table(
            {
                "supp_nation": pa.array(
                    [nation_names[int(x)] for x in nat], pa.string()
                ),
                "o_year": batch.column("yr").cast(pa.int64()),
                "revenue_milli": batch.column("sum(r_sum)").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort(
        ["supp_nation", "o_year"]
    )


def running_order_spend(sf_dir: str):
    """Per-customer running spend window: for every order, the sum of
    the SAME customer's strictly-earlier order totals (ordered by
    (o_orderdate, o_orderkey)) — SQL's
    ``SUM(...) OVER (PARTITION BY custkey ORDER BY ... ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)``. (o_orderkey, o_custkey,
    cum_spend_milli) sorted by o_orderkey, integer millis.

    ONE custkey-hash exchange; inside a partition one lexsort by
    (custkey, date, orderkey) and a vectorized segment-reset prefix sum
    (cumsum minus each segment's leading offset — no per-row Python).
    Every customer lives in exactly one partition, so the prefix is
    exact; partition count scales with the orders table, never with
    customers."""
    parts = SEMIJOIN_PARTITIONS

    def key_stage(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy().astype(np.int64)
        return pa.table(
            {
                "part": pa.array(ck % parts),
                "ck": pa.array(ck, pa.int64()),
                "ok": batch.column("o_orderkey").cast(pa.int64()),
                "dt": pa.array(
                    batch.column("o_orderdate").to_numpy().astype(np.int64)
                ),
                "price": pa.array(
                    _milli(batch.column("o_totalprice").to_numpy())
                ),
            }
        )

    def window(group: pa.Table) -> pa.Table:
        ck = group.column("ck").to_numpy()
        dt = group.column("dt").to_numpy()
        ok = group.column("ok").to_numpy()
        price = group.column("price").to_numpy()
        order = np.lexsort((ok, dt, ck))
        ck, ok, price = ck[order], ok[order], price[order]
        n = len(ck)
        if n == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_custkey": pa.array([], pa.int64()),
                    "cum_spend_milli": pa.array([], pa.int64()),
                }
            )
        cs = np.cumsum(price)
        boundary = np.empty(n, dtype=bool)
        boundary[0] = True
        boundary[1:] = ck[1:] != ck[:-1]
        seg_id = np.cumsum(boundary) - 1
        start_idx = np.flatnonzero(boundary)[seg_id]
        seg_base = np.where(start_idx > 0, cs[start_idx - 1], 0)
        cum_before = (cs - price) - seg_base
        return pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "o_custkey": pa.array(ck, pa.int64()),
                "cum_spend_milli": pa.array(cum_before, pa.int64()),
            }
        )

    est = table_rows(sf_dir, "orders") * 40
    return (
        _read(
            sf_dir,
            "orders",
            ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(key_stage, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(shuffle_parts(est))
        .groupby("part")
        .map_groups(window, batch_format="pyarrow")
        .sort("o_orderkey")
    )


def customer_rfm(sf_dir: str, anchor: str = "2002-01-01"):
    """Recency / frequency / monetary per ordering customer:
    (c_custkey, recency_days, frequency, monetary_milli) sorted by
    c_custkey — recency in whole days from the customer's LAST order
    date to the fixed ``anchor``, all integers.

    Per-batch (custkey -> max date, count, milli sum) partials, then one
    groupby(custkey) exchange folding (max, sum, sum) — output is
    O(ordering customers) rows and nothing larger materializes."""
    from ray.data.aggregate import Max, Sum

    anchor_us = _us(anchor)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "ck": batch.column("o_custkey").cast(pa.int64()),
                "dt": pa.array(
                    batch.column("o_orderdate").to_numpy().astype(np.int64)
                ),
                "cnt": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)
                ),
                "spend": pa.array(
                    _milli(batch.column("o_totalprice").to_numpy())
                ),
            }
        )
        return t.group_by(["ck"]).aggregate(
            [("dt", "max"), ("cnt", "sum"), ("spend", "sum")]
        )

    agg = (
        _read(
            sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ck")
        .aggregate(Max("dt_max"), Sum("cnt_sum"), Sum("spend_sum"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        last_us = batch.column("max(dt_max)").to_numpy().astype(np.int64)
        rec_days = (anchor_us - last_us) // 86_400_000_000
        return pa.table(
            {
                "c_custkey": batch.column("ck").cast(pa.int64()),
                "recency_days": pa.array(rec_days, pa.int64()),
                "frequency": batch.column("sum(cnt_sum)").cast(pa.int64()),
                "monetary_milli": batch.column("sum(spend_sum)").cast(
                    pa.int64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("c_custkey")


def top_parts_per_brand(sf_dir: str, n: int = 3):
    """Top-n parts per brand by lifetime revenue with RANK() tie
    semantics (ties share a rank; every rank <= n row survives, so a
    brand can emit more than n rows): (p_brand, p_partkey,
    revenue_milli, rnk) sorted by (p_brand, rnk, p_partkey).

    ONE groupby(partkey) exchange folds per-batch revenue partials
    (brand attached through the size-aware part-dimension crossover);
    the rank pass is a constant-domain per-brand map_groups — brands
    are dictionary-small (25 in TPC-H), and the rank itself is one
    descending sort + searchsorted per group, no per-row Python."""
    from ray.data.aggregate import Sum

    n_dim = table_rows(sf_dir, "part")
    fact_cols = ["l_partkey", "l_extendedprice", "l_discount"]

    def partial(batch: pa.Table) -> pa.Table:
        rev = _milli(
            batch.column("l_extendedprice").to_numpy()
            * (1.0 - batch.column("l_discount").to_numpy())
        )
        t = pa.table({"pkey": batch.column("l_partkey"), "rev": pa.array(rev)})
        return t.group_by(["pkey"]).aggregate([("rev", "sum")])

    per_part = (
        _read(sf_dir, "lineitem", fact_cols)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pkey")
        .aggregate(Sum("rev_sum"))
    )

    if n_dim <= DICT_DRIVER_MAX_ROWS:
        import pyarrow.parquet as pq

        part_t = pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
        )
        pk = part_t.column("p_partkey").to_numpy().astype(np.int64)
        po = np.argsort(pk, kind="stable")
        pk_s = pk[po]
        brands = part_t.column("p_brand").take(pa.array(po))

        def attach(batch: pa.Table) -> pa.Table:
            keys = batch.column("pkey").to_numpy().astype(np.int64)
            pos = np.minimum(np.searchsorted(pk_s, keys), len(pk_s) - 1)
            found = pk_s[pos] == keys
            sel = np.flatnonzero(found)
            return pa.table(
                {
                    "brand": brands.take(pa.array(pos[sel])),
                    "pkey": pa.array(keys[sel], pa.int64()),
                    "rev": batch.column("sum(rev_sum)")
                    .take(pa.array(sel))
                    .cast(pa.int64()),
                }
            )

        branded = per_part.map_batches(attach, batch_format="pyarrow")
    else:

        def reshape_in(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "pkey": batch.column("pkey").cast(pa.int64()),
                    "rev": batch.column("sum(rev_sum)").cast(pa.int64()),
                }
            )

        joined = _lookup_join_distributed(
            per_part.map_batches(reshape_in, batch_format="pyarrow"),
            "pkey",
            _read(sf_dir, "part", ["p_partkey", "p_brand"]),
            "p_partkey",
            "p_brand",
            pa.string(),
            ["pkey", "rev"],
            "brand",
            est_bytes=(n_dim + n_dim) * 48,
        )

        def drop_missing(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            return batch.filter(_pc.is_valid(batch.column("brand")))

        branded = joined.map_batches(drop_missing, batch_format="pyarrow")

    def rank_group(group: pa.Table) -> pa.Table:
        rev = group.column("rev").to_numpy()
        keys = group.column("pkey").to_numpy()
        order = np.lexsort((keys, -rev))
        rev_s, keys_s = rev[order], keys[order]
        # RANK(): 1 + number of strictly greater revenues — one
        # searchsorted against the descending-sorted array
        rnk = np.searchsorted(-rev_s, -rev_s, side="left") + 1
        m = rnk <= n
        return pa.table(
            {
                "p_brand": group.column("brand")
                .take(pa.array(order[m]))
                .cast(pa.string()),
                "p_partkey": pa.array(keys_s[m], pa.int64()),
                "revenue_milli": pa.array(rev_s[m], pa.int64()),
                "rnk": pa.array(rnk[m], pa.int64()),
            }
        )

    if n_dim <= DICT_DRIVER_MAX_ROWS:
        # the branded per-part table is O(parts) rows — below the same
        # crossover bound the dimension reads use, ranking it on the
        # driver replaces TWO more all-to-alls (groupby(brand) + sort)
        # with one bounded collect; above the bound the distributed
        # per-brand map_groups path below takes over
        tabs = [
            pa.table(b)
            for b in branded.iter_batches(batch_format="pyarrow")
        ]
        whole = (
            pa.concat_tables(tabs)
            if tabs
            else pa.table(
                {
                    "brand": pa.array([], pa.string()),
                    "pkey": pa.array([], pa.int64()),
                    "rev": pa.array([], pa.int64()),
                }
            )
        )
        brand_np = np.asarray(whole.column("brand").cast(pa.string()))
        parts_out = []
        for bname in np.unique(brand_np):
            grp = whole.filter(pa.array(brand_np == bname))
            parts_out.append(rank_group(grp))
        out = (
            pa.concat_tables(parts_out)
            if parts_out
            else rank_group(whole.rename_columns(["brand", "pkey", "rev"]))
        )
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            out,
            sort_keys=[
                ("p_brand", "ascending"),
                ("rnk", "ascending"),
                ("p_partkey", "ascending"),
            ],
        )
        return out.take(idx)

    return (
        branded.groupby("brand")
        .map_groups(rank_group, batch_format="pyarrow")
        .sort(["p_brand", "rnk", "p_partkey"])
    )


def customer_order_gaps(sf_dir: str):
    """Inter-order gap statistics per repeat customer — the LAG()
    window shape: for customers with >= 2 orders, the number of gaps
    and the sum/min/max gap in whole days between consecutive orders
    (ordered by (o_orderdate, o_orderkey)). (c_custkey, n_gaps,
    sum_gap_days, min_gap_days, max_gap_days) sorted by c_custkey,
    all integers.

    Same ONE custkey exchange as running_order_spend; inside a
    partition one lexsort + shifted-difference per customer segment
    (gaps never cross segment boundaries), folded with
    np.minimum/maximum.reduceat — no per-row Python."""
    parts = SEMIJOIN_PARTITIONS

    def key_stage(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy().astype(np.int64)
        return pa.table(
            {
                "part": pa.array(ck % parts),
                "ck": pa.array(ck, pa.int64()),
                "ok": batch.column("o_orderkey").cast(pa.int64()),
                "dt": pa.array(
                    batch.column("o_orderdate").to_numpy().astype(np.int64)
                ),
            }
        )

    def gaps(group: pa.Table) -> pa.Table:
        ck = group.column("ck").to_numpy()
        dt = group.column("dt").to_numpy()
        ok = group.column("ok").to_numpy()
        order = np.lexsort((ok, dt, ck))
        ck, dt = ck[order], dt[order]
        n = len(ck)
        empty = pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "n_gaps": pa.array([], pa.int64()),
                "sum_gap_days": pa.array([], pa.int64()),
                "min_gap_days": pa.array([], pa.int64()),
                "max_gap_days": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        same = np.empty(n, dtype=bool)
        same[0] = False
        same[1:] = ck[1:] == ck[:-1]
        gidx = np.flatnonzero(same)  # rows that close a gap
        if len(gidx) == 0:
            return empty
        gap_days = (dt[gidx] - dt[gidx - 1]) // 86_400_000_000
        gck = ck[gidx]
        starts = np.flatnonzero(
            np.concatenate(([True], gck[1:] != gck[:-1]))
        )
        counts = np.diff(np.append(starts, len(gck)))
        return pa.table(
            {
                "c_custkey": pa.array(gck[starts], pa.int64()),
                "n_gaps": pa.array(counts, pa.int64()),
                "sum_gap_days": pa.array(
                    np.add.reduceat(gap_days, starts), pa.int64()
                ),
                "min_gap_days": pa.array(
                    np.minimum.reduceat(gap_days, starts), pa.int64()
                ),
                "max_gap_days": pa.array(
                    np.maximum.reduceat(gap_days, starts), pa.int64()
                ),
            }
        )

    est = table_rows(sf_dir, "orders") * 32
    return (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(key_stage, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(shuffle_parts(est))
        .groupby("part")
        .map_groups(gaps, batch_format="pyarrow")
        .sort("c_custkey")
    )

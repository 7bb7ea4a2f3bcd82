"""Relational operators over the driver's TPC-H-ish tables (SURVEY.md
§2.5-2.7) — each with a DuckDB-oracle-equivalent SQL in
monocator_ray/pipelines/registry.py.

Patterns (scale rationale in docstrings):
* pre-aggregation: partial sums per batch inside ``map_batches`` -> tiny
  ``groupby().aggregate`` over partials (SURVEY.md §2.5 — avoids shuffling
  every row);
* broadcast joins: dimension tables ship once as plain dicts/sets into the
  batch fn (SURVEY.md §2.4 J3-J5 — never a shuffle join for a small side);
* money as integer cents (CAST(ROUND(x*100) AS BIGINT)) so Ray and the SQL
  oracle hash identically (float summation order is not associative).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from monocator_ray.hashing import hash_str64
from monocator_ray.shipping import ensure_shipped
from monocator_ray.sources.tables import sized_read_parquet
from monocator_ray.stages.grouped import (
    _key_arrays,
    cached_stage,
    collect_arrow,
    driver_grouped_agg,
    hash_partitioned,
    join_partitions,
    partitioned_aggregate,
    run_boundaries,
)


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    ensure_shipped()
    return sized_read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(arr, pa.scalar(100.0))), pa.int64())


def _disc_rev_cpc(t: pa.Table) -> pa.Array:
    """Discounted lineitem revenue in exact integer cents-x-percent:
    ``cents(l_extendedprice) * (100 - round(l_discount*100))`` — the
    shared convention that keeps every revenue query hash-identical to
    its DuckDB oracle (no float ratio ever exists)."""
    pct = pc.subtract(
        pa.scalar(100, pa.int64()),
        pc.cast(pc.round(pc.multiply(t["l_discount"], pa.scalar(100.0))),
                pa.int64()))
    return pc.multiply(_cents(t["l_extendedprice"]), pct)


def _dense_lut(keys: np.ndarray, values, fill) -> np.ndarray:
    """Dense dimension lookup array for the broadcast-LUT-gate shape:
    ``lut[key] = value``, every other slot (including the guaranteed
    out-of-range slot at index len-1) holds ``fill``.  ``ray.put`` the
    result once; per batch, index via :func:`_lut_get`."""
    values = np.asarray(values)
    size = int(keys.max()) + 2 if len(keys) else 1
    lut = np.full(size, fill,
                  dtype=object if values.dtype.kind in "OU" else values.dtype)
    if len(keys):
        lut[keys] = values
    return lut


def _lut_get(lut: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Batch lookup into a :func:`_dense_lut` array; out-of-range keys
    clip to the fill slot, so no bounds mask is needed."""
    return lut[np.minimum(keys, len(lut) - 1)]


def _join_parts(sf_dir: str, *tables: str) -> int:
    """Adaptive join partition count from the input tables' file sizes
    (rationale + measurement: stages/grouped.py:join_partitions)."""
    return join_partitions([f"{sf_dir}/{t}.parquet" for t in tables])


# ---- G2-style grouped aggregate with pre-aggregation (TPC-H Q1 shape) ----
def q_pricing_summary(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"])

    cutoff = pa.scalar(np.datetime64("1998-09-01", "us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pc.cast(pc.round(batch["l_quantity"]), pa.int64()),
                "base_cents": _cents(batch["l_extendedprice"]),
            }
        )
        # per-batch combine: rows-per-group out of this stage is O(groups);
        # pa.TableGroupBy keeps it Arrow-native (no pandas round-trip)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base_cents", "sum"), ("qty", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents", "n"]
        )

    # final combine driver-side: O(blocks x 6 groups) partial rows — the
    # shuffle a native aggregate would run moves nothing the driver can't
    # hold (grouped.driver_grouped_agg rationale)
    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .to_pandas()  # bounded: O(blocks x 6 groups) partials (comment above)
        .groupby(["l_returnflag", "l_linestatus"], as_index=False)
        .sum()
        .sort_values(["l_returnflag", "l_linestatus"])
    )
    out = out[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents", "n"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# ---- O3-style top-k ----
def q_top_orders(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "total_cents": _cents(batch["o_totalprice"]),
            }
        )

    return (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .sort(["total_cents", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


# ---- G5-style per-key rollup ----
def q_order_rollup(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        # per-batch combine (pricing_summary pattern): the shuffle then
        # moves O(distinct custkeys per batch), not every order row
        t = pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderdate": batch["o_orderdate"],
                "total_cents": _cents(batch["o_totalprice"]),
            }
        )
        g = t.group_by(["o_custkey"]).aggregate(
            [("o_custkey", "count"), ("o_orderdate", "min"), ("o_orderdate", "max"),
             ("total_cents", "sum")]
        )
        return g.rename_columns(
            ["o_custkey", "n_orders", "first_order", "last_order", "total_cents"]
        )

    # final combine via partitioned_aggregate: the native 4-agg aggregate
    # over ~98 k partial rows was measured 4.8 s (~25 us/row/agg); the
    # Arrow-C++ per-partition group_by is milliseconds for the same rows
    return (
        partitioned_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["o_custkey"],
            [("n_orders", "sum"), ("first_order", "min"),
             ("last_order", "max"), ("total_cents", "sum")],
            ["o_custkey", "n_orders", "first_order", "last_order", "total_cents"],
        )
        .sort("o_custkey")
    )


# ---- J4: broadcast dimension join (customer x nation x region) ----
def q_customer_regions(sf_dir: str) -> rd.Dataset:
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()  # bounded: dimension table, 25 rows
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()  # bounded: dimension table, 5 rows
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    lookup_ref = ray.put(dict(zip(dim["n_nationkey"], dim["r_name"])))

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    class JoinRegion:
        def __init__(self, ref):
            # broadcast dict fetched once per actor, compiled to a dense
            # key->name array so the per-batch probe is one vectorized take
            # (the per-row dict loop was the hot cost — VERDICT r1 #9)
            lookup = ray.get(ref)
            self.maxk = max(lookup) if lookup else 0
            self.lut = np.full(self.maxk + 1, "", dtype=object)
            for k, v in lookup.items():
                self.lut[k] = v

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch["c_nationkey"].to_numpy(zero_copy_only=False)
            safe = np.clip(keys, 0, self.maxk)
            names = self.lut[safe]
            names[(keys < 0) | (keys > self.maxk)] = ""
            return pa.table(
                {
                    "r_name": pa.array(names, pa.string()),
                    "acctbal_cents": _cents(batch["c_acctbal"]),
                }
            )

    # cheap-setup broadcast probe: cached task stage, not an actor pool
    # (~2 s spin-up per query at any scale — stages/grouped.py)
    mapped = ds.map_batches(cached_stage(JoinRegion, ref=lookup_ref), batch_format="pyarrow")
    out = driver_grouped_agg(
        mapped,
        ["r_name"],
        [("acctbal_cents", "count"), ("acctbal_cents", "sum")],
        ["r_name", "n_customers", "acctbal_cents"],
    ).sort_values("r_name")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# ---- J5: anti join via broadcast key set ----
def q_customers_without_orders(sf_dir: str) -> rd.Dataset:
    """Customers with no high-value (>300k) order — anti join via broadcast
    key set (the driver tables are dense, so a plain no-orders anti join
    would be empty at every sf).

    Build side is DISTRIBUTED (VERDICT r2 #3): orders is fact-sized, so the
    filter + per-batch distinct run inside ``map_batches``; the driver only
    collects the already-small qualifying key set (bounded by result size x
    read parallelism), never the table."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def high_keys(batch: pa.Table) -> pa.Table:
        keys = batch.filter(
            pc.greater(batch["o_totalprice"], pa.scalar(300000.0))
        )["o_custkey"]
        return pa.table({"o_custkey": pc.unique(pc.cast(keys, pa.int64()))})

    partials = orders.map_batches(high_keys, batch_format="pyarrow")
    have_orders = np.unique(
        collect_arrow(partials)["o_custkey"].to_numpy(zero_copy_only=False)  # bounded: distinct filtered custkeys (broadcast semi-join small side)
    )
    ref = ray.put(have_orders)
    ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    class AntiJoin:
        def __init__(self, r):
            # broadcast key set as a SORTED numpy array: membership is a
            # vectorized searchsorted, not a per-row Python set probe
            # (VERDICT r1 #9; np.unique above already sorts)
            self.keys = ray.get(r)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck = batch["c_custkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.keys, ck)
            pos = np.clip(pos, 0, len(self.keys) - 1)
            mask = self.keys[pos] != ck if len(self.keys) else np.ones(len(ck), bool)
            return batch.filter(pa.array(mask))

    return (
        ds.map_batches(cached_stage(AntiJoin, r=ref), batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Count(alias_name="n_without_orders"))
        .sort("c_nationkey")
    )


# ---- filters + aggregate (M10 analog) ----
def q_returned_items(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_shipdate", "l_extendedprice"])
    lo = pa.scalar(np.datetime64("1995-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-12-31", "us"))

    def f(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(batch["l_returnflag"], pa.scalar("R")),
            pc.and_(pc.greater_equal(batch["l_shipdate"], lo), pc.less_equal(batch["l_shipdate"], hi)),
        )
        b = batch.filter(m)
        return pa.table(
            {
                "qty": pc.cast(pc.round(b["l_quantity"]), pa.int64()),
                "price_cents": _cents(b["l_extendedprice"]),
            }
        )

    out = ds.map_batches(f, batch_format="pyarrow").aggregate(
        Count(alias_name="n"), Sum("qty", alias_name="sum_qty"), Sum("price_cents", alias_name="sum_price_cents")
    )
    return pa.table({k: [v] for k, v in out.items()})


# ---- top-k categorical ----
def q_top_part_types(sf_dir: str) -> rd.Dataset:
    return (
        _read(sf_dir, "part", ["p_type"])
        .groupby("p_type")
        .aggregate(Count(alias_name="n"))
        .sort(["n", "p_type"], descending=[True, False])
        .limit(5)
    )


# ---- large x large hash join (Ray Data Dataset.join) ----
def q_priority_revenue(sf_dir: str) -> rd.Dataset:
    """lineitem JOIN orders on orderkey (both sides large -> partitioned
    hash join, 16 partitions) -> revenue by order priority."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"l_orderkey": batch["l_orderkey"], "price_cents": _cents(batch["l_extendedprice"])}
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = li.map_batches(cents, batch_format="pyarrow").join(
        orders,
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    return (
        joined.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_items"), Sum("price_cents", alias_name="revenue_cents"))
        .sort("o_orderpriority")
    )


# ---- events: grouped stats ----
def q_event_stats(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "events", ["event_type", "value", "user_id"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "value_cents": _cents(batch["value"]),
                "user_id": batch["user_id"],
            }
        )

    # COUNT DISTINCT without giant groups: a single map_groups per
    # event_type would materialize a fifth of the corpus in one call at
    # scale.  Instead: (a) count/sum combine PER BATCH (O(types) rows out of
    # every block — the driver only ever merges blocks x types partials),
    # (b) distinct (type, user) inside hash PARTITIONS of the pair key —
    # each pair lands in exactly one partition, so per-partition
    # count_distinct partials are disjoint and sum exactly.  No Ray-native
    # aggregate in either path (measured ~25 us/row/agg; the Arrow C++
    # group_by inside the partition is milliseconds for the same rows).
    prep_ds = ds.map_batches(prep, batch_format="pyarrow")

    base = driver_grouped_agg(
        prep_ds,
        ["event_type"],
        [("value_cents", "count"), ("value_cents", "sum")],
        ["event_type", "n", "value_cents"],
    )

    def users_part(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type"]).aggregate([("user_id", "count_distinct")])
        return g.rename_columns(["event_type", "n_users"])

    users = (
        hash_partitioned(
            prep_ds.select_columns(["event_type", "user_id"]),
            lambda t: _key_arrays(t, ["event_type", "user_id"]),
            users_part,
            num_parts=32,
        )
        .to_pandas()  # bounded: O(parts x event_types) partials
        .groupby("event_type", as_index=False)
        .sum()
    )
    out = base.merge(users, on="event_type").sort_values("event_type")
    out = out[["event_type", "n", "n_users", "value_cents"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# ---- events: tumbling window (streaming-shaped, SURVEY.md §2.9) ----
def q_event_windows(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def wnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": pc.floor_temporal(batch["ts"], unit="hour"),
            }
        )

    return (
        ds.map_batches(wnd, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"))
        .sort(["event_type", "window_start"])
    )


# ---- events: sliding window (1h window, 30m step) ----
def q_event_sliding(sf_dir: str) -> rd.Dataset:
    """Sliding windows as an explode: an event at t belongs to the windows
    starting at floor30(t) and floor30(t)-30m — vectorized two-offset
    duplication, then a grouped count (SURVEY.md §2.9 pattern)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])
    half = np.timedelta64(30 * 60, "s")

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        s1 = ts.astype("datetime64[30m]").astype("datetime64[us]")
        et = batch["event_type"]
        return pa.table(
            {
                "event_type": pa.concat_arrays([et.combine_chunks(), et.combine_chunks()]),
                "window_start": pa.Array.from_pandas(
                    np.concatenate([s1, s1 - half]), type=pa.timestamp("us")
                ),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"))
        .sort(["event_type", "window_start"])
    )


# ---- events: sessionization (ordered within key, partition-vectorized) ----
def q_user_sessions(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Per-user session counts.  Grouped by a hash PARTITION of user_id
    (stages/grouped.py: user cardinality tracks the corpus, so per-group
    map_groups dispatch would dominate); inside a partition the gap breaks
    of every complete user run are found with one vectorized diff."""
    from monocator_ray.stages.grouped import hash_partitioned, run_boundaries

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions_part(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        starts, ends = run_boundaries(uid)
        if not len(starts):
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "n_events": pa.array([], pa.int64()),
                 "n_sessions": pa.array([], pa.int64())}
            )
        breaks = np.zeros(len(uid), dtype=np.int64)
        if len(uid) > 1:
            # a break needs a >gap silence AND the same user on both sides;
            # run starts always compare against the previous user -> 0 there
            breaks[1:] = ((ts[1:] - ts[:-1]) > gap) & (uid[1:] == uid[:-1])
        n_sessions = 1 + np.add.reduceat(breaks, starts)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "n_sessions": pa.array(n_sessions, pa.int64()),
            }
        )

    return hash_partitioned(
        ds,
        lambda t: [t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        sessions_part,
        num_parts=64,
    ).sort("user_id")


# ---- hierarchical ROLLUP aggregate (region -> nation -> grand total) ----
def _region_nation_fine(sf_dir: str) -> pd.DataFrame:
    """Finest-level (region, nation, rev_cents) revenue frame — the ONE
    distributed pass shared by the ROLLUP and CUBE queries (orders streamed
    once; customer→nation is a broadcast int-array probe; per-batch partial
    sums keep the shuffle at O(nations) rows)."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()  # bounded: dimension table, 25 rows
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()  # bounded: dimension table, 5 rows

    # customer is FACT-sized, so it never touches the driver (VERDICT r2
    # #2): orders partials (one row per distinct custkey per block, summed
    # by Arrow C++ inside the batch) hash-join to the customer Dataset —
    # the q_priority_revenue shape.  Duplicate left keys are fine: each
    # per-block partial picks up its customer's nationkey and the final
    # nation-level sum re-combines them exactly (integer cents).
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cust_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
                      "rev_cents": _cents(batch["o_totalprice"])})
        g = t.group_by(["o_custkey"]).aggregate([("rev_cents", "sum")])
        return g.rename_columns(["o_custkey", "rev_cents"])

    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = orders.map_batches(cust_partial, batch_format="pyarrow").join(
        customer,
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "orders", "customer"),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    fine = driver_grouped_agg(
        joined, ["c_nationkey"], [("rev_cents", "sum")], ["c_nationkey", "rev_cents"]
    ).rename(columns={"c_nationkey": "nationkey"})
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    fine = fine.merge(dim[["n_nationkey", "n_name", "r_name"]],
                      left_on="nationkey", right_on="n_nationkey")
    return fine.rename(columns={"r_name": "region", "n_name": "nation"})[
        ["region", "nation", "rev_cents"]]


def q_region_rollup(sf_dir: str) -> pa.Table:
    """Order revenue at every level of the region→nation hierarchy plus the
    grand total — the GROUP BY ROLLUP shape.  Every coarser level is a
    driver-side re-sum of the O(nations) finest partials — rollup levels
    are decomposable, so nothing is recomputed (distributed pass:
    :func:`_region_nation_fine`).  Subtotal rows use the 'ALL' marker
    instead of SQL NULL so the value hash is unambiguous."""
    level2 = _region_nation_fine(sf_dir)
    level1 = level2.groupby("region", as_index=False)["rev_cents"].sum()
    level1["nation"] = "ALL"
    level0 = pd.DataFrame({"region": ["ALL"], "nation": ["ALL"],
                           "rev_cents": [level2["rev_cents"].sum()]})
    out = pd.concat([level2, level1[["region", "nation", "rev_cents"]], level0],
                    ignore_index=True).sort_values(["region", "nation"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["region", "nation", "rev_cents"]], preserve_index=False)


def q_region_cube(sf_dir: str) -> pa.Table:
    """GROUP BY CUBE (region, nation): the ROLLUP grouping sets PLUS the
    nation-only marginal — same single distributed finest pass, all four
    grouping sets re-summed driver-side from the O(nations) result (CUBE
    of a decomposable aggregate never needs a second scan)."""
    level2 = _region_nation_fine(sf_dir)
    by_region = level2.groupby("region", as_index=False)["rev_cents"].sum()
    by_region["nation"] = "ALL"
    by_nation = level2.groupby("nation", as_index=False)["rev_cents"].sum()
    by_nation["region"] = "ALL"
    total = pd.DataFrame({"region": ["ALL"], "nation": ["ALL"],
                          "rev_cents": [level2["rev_cents"].sum()]})
    cols = ["region", "nation", "rev_cents"]
    out = pd.concat([level2[cols], by_region[cols], by_nation[cols], total[cols]],
                    ignore_index=True).sort_values(["region", "nation"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# ---- orders: RANK window (top-3 per priority by price) ----
def q_order_rank(sf_dir: str) -> rd.Dataset:
    """RANK() OVER (PARTITION BY o_orderpriority ORDER BY price DESC,
    o_orderkey) <= 3 — the per-group rank window shape, rendered as
    priority-hash partitions with one vectorized sort + rank inside each
    (every priority lands wholly in one partition; ranks of a group never
    span partitions).  Integer cents keep the oracle hash-exact."""
    from monocator_ray.hashing import hash_str64
    from monocator_ray.stages.grouped import hash_partitioned, run_boundaries

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_orderpriority": t["o_orderpriority"],
                "price_cents": _cents(t["o_totalprice"]),
            }
        )

    def rank_part(g: pa.Table) -> pa.Table:
        pr = g["o_orderpriority"].to_numpy(zero_copy_only=False)
        cents = g["price_cents"].to_numpy(zero_copy_only=False)
        key = g["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -cents, pr))
        pr, cents, key = pr[order], cents[order], key[order]
        starts, ends = run_boundaries(pr)
        # rank within each priority run = offset from the run start + 1
        # (ties impossible: o_orderkey is unique and last in the sort key,
        # matching the oracle's deterministic ORDER BY)
        pos = np.arange(len(pr), dtype=np.int64)
        rank = pos - np.repeat(starts, ends - starts) + 1
        keep = rank <= 3
        return pa.table(
            {
                "o_orderpriority": pa.array(pr[keep], pa.string()),
                "rnk": pa.array(rank[keep], pa.int64()),
                "o_orderkey": pa.array(key[keep], pa.int64()),
                "price_cents": pa.array(cents[keep], pa.int64()),
            }
        )

    return hash_partitioned(
        ds.map_batches(shape, batch_format="pyarrow"),
        lambda t: [hash_str64(t["o_orderpriority"].to_pylist())],
        rank_part,
        num_parts=8,
    ).sort(["o_orderpriority", "rnk"])


# ---- events: PIVOT (per-user event-type count matrix) ----
def q_event_pivot(sf_dir: str) -> rd.Dataset:
    """Per-user counts pivoted into one column per event type — the PIVOT /
    conditional-aggregation shape: per-batch Arrow group_by partials over
    (user, type) pairs, then user-hash partitions where the pivot is a
    vectorized scatter into the fixed type->column map.  The type universe
    is the table's own 5 values (declared, not discovered — a pivot needs
    a closed column set on both sides)."""
    from monocator_ray.stages.grouped import hash_partitioned, run_boundaries

    types = ["click", "error", "purchase", "signup", "view"]
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([("event_type", "count")])
        return g.rename_columns(["user_id", "event_type", "n"])

    def pivot_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((et, uid))
        uid, et, n = uid[order], et[order], n[order]
        starts, ends = run_boundaries(uid)
        users = uid[starts]
        mat = np.zeros((len(users), len(types)), dtype=np.int64)
        row = np.repeat(np.arange(len(users)), ends - starts)
        col = pd.Series(et).map({t_: i for i, t_ in enumerate(types)}).to_numpy()
        np.add.at(mat, (row, col), n)
        cols = {"user_id": pa.array(users, pa.int64())}
        for i, t_ in enumerate(types):
            cols[f"n_{t_}"] = pa.array(mat[:, i], pa.int64())
        return pa.table(cols)

    return hash_partitioned(
        ds.map_batches(partial, batch_format="pyarrow"),
        lambda t: [t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        pivot_part,
        num_parts=32,
    ).sort("user_id")


# ---- events: LAG window (per-user inter-event gap stats) ----
def q_event_gaps(sf_dir: str) -> rd.Dataset:
    """Per-user inter-event gap statistics — the LAG window function shape
    (``ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)``),
    rendered scale-first: one hash partition by user, then ONE vectorized
    diff over each partition's (user, ts, event_id)-sorted timeline — no
    per-user dispatch, no global sort.  Gaps are exact int64 microseconds
    (timestamp[us] arithmetic) so sums/averages hash-match the oracle."""
    from monocator_ray.stages.grouped import hash_partitioned, run_boundaries

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def gaps_part(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        empty = pa.table(
            {"user_id": pa.array([], pa.int64()), "n_gaps": pa.array([], pa.int64()),
             "sum_gap_us": pa.array([], pa.int64()), "max_gap_us": pa.array([], pa.int64()),
             "avg_gap_us": pa.array([], pa.int64())}
        )
        if len(uid) == 0:
            return empty
        gap = np.empty(len(uid), dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        same = np.zeros(len(uid), dtype=bool)
        same[1:] = uid[1:] == uid[:-1]  # a gap exists only within a user run
        starts, ends = run_boundaries(uid)
        n_gaps = (ends - starts) - 1
        keep = n_gaps > 0  # single-event users produce no gap row
        if not keep.any():
            return empty
        gap = np.where(same, gap, 0)
        cum = np.concatenate([[0], np.cumsum(gap)])
        sums = (cum[ends] - cum[starts])[keep]
        maxes = np.maximum.reduceat(np.where(same, gap, -1), starts)[keep]
        n_gaps = n_gaps[keep]
        return pa.table(
            {
                "user_id": pa.array(uid[starts][keep], pa.int64()),
                "n_gaps": pa.array(n_gaps, pa.int64()),
                "sum_gap_us": pa.array(sums, pa.int64()),
                "max_gap_us": pa.array(maxes, pa.int64()),
                "avg_gap_us": pa.array(sums // n_gaps, pa.int64()),
            }
        )

    return hash_partitioned(
        ds,
        lambda t: [t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        gaps_part,
        num_parts=64,
    ).sort("user_id")


# ---- events: JSON props extraction (§2.8 scalar lib) ----
def q_props_json(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "events", ["props"])

    def parse(batch: pa.Table) -> pa.Table:
        # props is a JSON object string {"k": int}
        ks = pc.extract_regex(batch["props"], r'"k":\s*(?P<k>\d+)')
        kvals = pc.struct_field(ks, "k")
        return pa.table({"k_bucket": pc.cast(pc.binary_length(kvals), pa.int32())})

    return (
        ds.map_batches(parse, batch_format="pyarrow")
        .groupby("k_bucket")
        .aggregate(Count(alias_name="n"))
        .sort("k_bucket")
    )


# ---- events: AS-OF join (stages/joins.py; operator Ray Data lacks) ----
def q_event_asof_purchase(sf_dir: str) -> rd.Dataset:
    """For every event, the value (cents) of that user's most recent
    purchase at or before the event (NULL when none) — the classic as-of
    join ("latest quote at or before each trade") over the events table,
    expressed with :func:`monocator_ray.stages.joins.asof_join`: one hash
    partition by user, a vectorized forward-fill inside each partition, no
    per-key Python dispatch.  Oracle: DuckDB ASOF LEFT JOIN."""
    from monocator_ray.stages.joins import asof_join

    left = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def shape_right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], pa.scalar("purchase")))
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "last_purchase_cents": _cents(t["value"]),
            }
        )

    right = _read(
        sf_dir, "events", ["user_id", "ts", "event_id", "event_type", "value"]
    ).map_batches(shape_right, batch_format="pyarrow")
    out = asof_join(
        left,
        right,
        key="user_id",
        on="ts",
        left_cols={"event_id": pa.int64()},
        value_cols={"last_purchase_cents": pa.int64()},
        tiebreak="event_id",
    )
    return out.sort("event_id")


# ---- events: RANGE join (stages/joins.py; interval predicate) ----
def q_event_error_window(sf_dir: str) -> rd.Dataset:
    """Per event, how many 'error' events the same user produced within the
    following 5 minutes (exclusive of the event's own instant) — an interval
    self-join via :func:`monocator_ray.stages.joins.range_join_count`: one
    hash partition by user, counts from one sorted prefix-sum timeline per
    partition (never materializing the qualifying pairs).  Oracle: DuckDB
    inequality LEFT JOIN + COUNT."""
    from monocator_ray.stages.joins import range_join_count

    left = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def shape_right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], pa.scalar("error")))
        return pa.table({"user_id": t["user_id"], "ts": t["ts"]})

    right = _read(sf_dir, "events", ["user_id", "ts", "event_type"]).map_batches(
        shape_right, batch_format="pyarrow"
    )
    out = range_join_count(
        left,
        right,
        key="user_id",
        on="ts",
        lo=np.timedelta64(0, "s"),
        hi=np.timedelta64(5 * 60, "s"),
        left_cols={"event_id": pa.int64()},
        count_name="n_errors_5m",
    )
    return out.sort("event_id")


# ---- events: frame window (rolling sum/avg over ROWS BETWEEN k PRECEDING) ----
def q_event_moving_avg(sf_dir: str, window: int = 3) -> rd.Dataset:
    """Per-event rolling sum/average of the user's last ``window`` event
    values (``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW``, ordered by
    ``(ts, event_id)``) — the frame-window shape, rendered as one user-hash
    partition + one vectorized prefix-sum per partition: the frame sum is
    ``cum[i+1] - cum[i+1-w]`` with ``w`` clamped to the user run's start, so
    there is no per-row or per-user Python dispatch.  Values are integer
    cents (all nonnegative), the average is integer floor division —
    identical on both sides (DuckDB ``//`` truncates, but the operands are
    nonnegative), so the oracle hash-matches exactly."""
    from monocator_ray.stages.grouped import hash_partitioned, run_boundaries

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "cents": _cents(t["value"]),
            }
        )

    def window_part(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, eid, cents = uid[order], eid[order], cents[order]
        n = len(uid)
        if n == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "mov_sum_cents": pa.array([], pa.int64()),
                 "mov_avg_cents": pa.array([], pa.int64())}
            )
        starts, ends = run_boundaries(uid)
        run_start = np.repeat(starts, ends - starts)
        pos = np.arange(n, dtype=np.int64)
        w = np.minimum(pos - run_start + 1, window)
        cum = np.concatenate([[0], np.cumsum(cents)])
        mov = cum[pos + 1] - cum[pos + 1 - w]
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "mov_sum_cents": pa.array(mov, pa.int64()),
                "mov_avg_cents": pa.array(mov // w, pa.int64()),
            }
        )

    return hash_partitioned(
        ds.map_batches(shape, batch_format="pyarrow"),
        lambda t: [t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        window_part,
        num_parts=64,
    ).sort("event_id")


# ---- orders: cumulative window (running total per customer) ----
def q_customer_running_total(sf_dir: str) -> rd.Dataset:
    """Per-order running revenue total for its customer (``SUM(...) OVER
    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)``) — the
    unbounded-preceding cumulative window: customer-hash partitions, one
    lexsort + cumsum per partition with the partition-global prefix
    subtracted at each customer run's start.  Integer cents only."""
    from monocator_ray.stages.grouped import hash_partitioned, run_boundaries

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_orderdate": t["o_orderdate"],
                "cents": _cents(t["o_totalprice"]),
            }
        )

    def running_part(g: pa.Table) -> pa.Table:
        cust = g["o_custkey"].to_numpy(zero_copy_only=False)
        date = g["o_orderdate"].to_numpy(zero_copy_only=False).view(np.int64)
        key = g["o_orderkey"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, date, cust))
        cust, key, cents = cust[order], key[order], cents[order]
        if len(cust) == 0:
            return pa.table(
                {"o_orderkey": pa.array([], pa.int64()),
                 "run_cents": pa.array([], pa.int64())}
            )
        starts, ends = run_boundaries(cust)
        cum = np.cumsum(cents)
        # subtract the cumulative total just before each customer's run
        base = np.where(starts > 0, cum[starts - 1], 0)
        run = cum - np.repeat(base, ends - starts)
        return pa.table(
            {"o_orderkey": pa.array(key, pa.int64()),
             "run_cents": pa.array(run, pa.int64())}
        )

    return hash_partitioned(
        ds.map_batches(shape, batch_format="pyarrow"),
        lambda t: [t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        running_part,
        num_parts=32,
    ).sort("o_orderkey")


# ---- orders: NTILE window (quartile assignment within priority) ----
def q_order_ntile(sf_dir: str, tiles: int = 4) -> rd.Dataset:
    """``NTILE(4) OVER (PARTITION BY o_orderpriority ORDER BY price DESC,
    o_orderkey)`` — the bucket-assignment window.  NTILE's exact contract
    (first ``n % k`` buckets get ``ceil(n/k)`` rows, the rest ``floor``)
    is integer arithmetic on the 0-based rank, vectorized per priority run
    inside priority-hash partitions."""
    from monocator_ray.hashing import hash_str64
    from monocator_ray.stages.grouped import hash_partitioned, run_boundaries

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_orderpriority": t["o_orderpriority"],
                "price_cents": _cents(t["o_totalprice"]),
            }
        )

    def ntile_part(g: pa.Table) -> pa.Table:
        pr = g["o_orderpriority"].to_numpy(zero_copy_only=False)
        cents = g["price_cents"].to_numpy(zero_copy_only=False)
        key = g["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -cents, pr))
        pr, cents, key = pr[order], cents[order], key[order]
        if len(pr) == 0:
            return pa.table(
                {"o_orderpriority": pa.array([], pa.string()),
                 "o_orderkey": pa.array([], pa.int64()),
                 "quartile": pa.array([], pa.int64())}
            )
        starts, ends = run_boundaries(pr)
        counts = ends - starts
        n = np.repeat(counts, counts)  # run size per row
        r = np.arange(len(pr), dtype=np.int64) - np.repeat(starts, counts)
        small, rem = n // tiles, n % tiles
        big = small + 1
        cut = rem * big  # first `rem` buckets hold `big` rows each
        in_big = r < cut
        # guard small==0 (n < tiles): cut == n there, so the small branch
        # is never selected; divide by max(small,1) to avoid div-by-zero
        tile = np.where(
            in_big, r // big, rem + (r - cut) // np.maximum(small, 1)
        ) + 1
        return pa.table(
            {
                "o_orderpriority": pa.array(pr, pa.string()),
                "o_orderkey": pa.array(key, pa.int64()),
                "quartile": pa.array(tile, pa.int64()),
            }
        )

    return hash_partitioned(
        ds.map_batches(shape, batch_format="pyarrow"),
        lambda t: [hash_str64(t["o_orderpriority"].to_pylist())],
        ntile_part,
        num_parts=8,
    ).sort(["o_orderpriority", "quartile", "o_orderkey"])


# ---- bloom-prefiltered semi-join (J-family; exact via verify join) ----
def q_bloom_semi_join(sf_dir: str, min_total: float = 300000.0) -> rd.Dataset:
    """Revenue of lineitems belonging to high-value orders — a semi-join
    whose build side is too big to broadcast exactly AT SCALE, rendered as
    the Bloom-prefilter pattern (state/bloom.py): (1) per-batch partial
    Bloom filters over qualifying orderkeys, OR-merged on the driver —
    reduce traffic is a fixed 16 KB blob per block, independent of
    build-side rows; (2) the merged filter broadcasts (ray.put) into the
    probe-side map_batches and drops non-matching lineitems (no false
    negatives — only false positives survive); (3) an EXACT partitioned
    hash join over the few survivors removes the false positives, so the
    result equals the plain semi-join and the DuckDB oracle hash-matches.
    The join's shuffle moves only ``match_rate + fpp`` of the probe side
    instead of all of it."""
    from monocator_ray.state.bloom import BloomFilter

    n_bits, k = 1 << 17, 7
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    thresh = pa.scalar(min_total)

    def build_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["o_totalprice"], thresh))
        return pa.table({"o_orderkey": t["o_orderkey"]})

    # ONE scan of the build side: the filtered key dataset feeds both the
    # bloom partials and the verify join
    keys_ds = orders.map_batches(build_keys, batch_format="pyarrow").materialize()

    def partial_bloom(t: pa.Table) -> pa.Table:
        bf = BloomFilter(n_bits, k)
        bf.add(t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64))
        return pa.table({"blob": pa.array([bf.to_bytes()], pa.binary())})

    merged = BloomFilter(n_bits, k)
    for blob in keys_ds.map_batches(partial_bloom, batch_format="pyarrow").to_pandas()["blob"]:  # bounded: O(blocks) fixed-size bloom blobs
        merged.merge(BloomFilter.from_bytes(blob, n_bits, k))
    bloom_ref = ray.put(merged.to_bytes())

    class Prefilter:
        def __init__(self, blob_ref):
            self.bf = BloomFilter.from_bytes(ray.get(blob_ref), n_bits, k)

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = self.bf.contains(
                t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
            )
            t = t.filter(pa.array(mask))
            return pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "l_returnflag": t["l_returnflag"],
                    "price_cents": _cents(t["l_extendedprice"]),
                }
            )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice"])
    survivors = li.map_batches(
        cached_stage(Prefilter, blob_ref=bloom_ref), batch_format="pyarrow"
    )

    joined = survivors.join(
        keys_ds, join_type="inner", num_partitions=_join_parts(sf_dir, "lineitem"),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    return (
        joined.groupby("l_returnflag")
        .aggregate(Count(alias_name="n_items"), Sum("price_cents", alias_name="revenue_cents"))
        .sort("l_returnflag")
    )


# ---- events: funnel conversion (signup -> purchase within 7 days) ----
def q_event_funnel(sf_dir: str, window_days: int = 7) -> pa.Table:
    """Signup→purchase funnel: of the users with a signup event, how many
    made a purchase within ``window_days`` AFTER their FIRST signup — the
    conversion-funnel shape every event pipeline ships.  One user-hash
    partition pass, all-vectorized inside (first-signup via masked
    minimum.reduceat over each user run, conversion via a flag
    maximum.reduceat — no per-user Python); O(2) result rows, summed on
    the driver."""
    from monocator_ray.stages.grouped import hash_partitioned, run_boundaries

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    win_us = np.int64(window_days * 86_400_000_000)

    def funnel_part(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        if len(uid) == 0:
            return pa.table({"n_signup_users": pa.array([0], pa.int64()),
                             "n_converted": pa.array([0], pa.int64())})
        starts, _ends = run_boundaries(uid)
        big = np.iinfo(np.int64).max
        signup_ts = np.where(et == "signup", ts, big)
        first_signup_run = np.minimum.reduceat(signup_ts, starts)
        fs = np.repeat(first_signup_run, np.diff(np.append(starts, len(uid))))
        converted_row = (
            (et == "purchase") & (fs != big) & (ts > fs) & (ts <= fs + win_us)
        ).astype(np.int64)
        conv_run = np.maximum.reduceat(converted_row, starts)
        has_signup = first_signup_run != big
        return pa.table(
            {"n_signup_users": pa.array([int(has_signup.sum())], pa.int64()),
             "n_converted": pa.array([int(conv_run[has_signup].sum())], pa.int64())}
        )

    pdf = hash_partitioned(
        ds,
        lambda t: [t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        funnel_part,
        num_parts=32,
    ).to_pandas()  # bounded: O(parts x funnel stages) partials
    return pa.table(
        {"n_signup_users": pa.array([int(pdf["n_signup_users"].sum())], pa.int64()),
         "n_converted": pa.array([int(pdf["n_converted"].sum())], pa.int64())}
    )


# ---- events: cohort retention (first-event week x activity-week offset) ----
def q_user_retention(sf_dir: str) -> rd.Dataset:
    """Weekly cohort retention: users grouped by the week of their FIRST
    event; for each (cohort_week, week_offset) the count of cohort users
    active that week — the retention-matrix shape.  A user's rows all land
    in one user-hash partition, so first-event week, per-user distinct
    (cohort, offset) pairs, and the partial counts are all one vectorized
    pass; a partitioned sum merges the O(cohorts x offsets) partials.
    Weeks are integer microsecond buckets epoch-anchored to Monday
    1970-01-05 (DuckDB date_trunc('week') semantics)."""
    from monocator_ray.stages.grouped import hash_partitioned, partitioned_aggregate, run_boundaries

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    week_us = np.int64(7 * 86_400_000_000)
    monday_off = np.int64(4 * 86_400_000_000)  # 1970-01-01 is a Thursday

    def retention_part(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        empty = pa.table({"cohort_week": pa.array([], pa.timestamp("us")),
                          "week_offset": pa.array([], pa.int64()),
                          "n_users": pa.array([], pa.int64())})
        if len(uid) == 0:
            return empty
        week = (ts - monday_off) // week_us  # floor: all driver ts are > 1970
        starts, ends = run_boundaries(uid)
        cohort = np.repeat(week[starts], ends - starts)  # first event's week
        off = week - cohort
        # distinct (user, cohort, offset) then count per (cohort, offset)
        o2 = np.lexsort((off, uid))
        u2, c2, f2 = uid[o2], cohort[o2], off[o2]
        s2, _e2 = run_boundaries(u2, f2)
        c2, f2 = c2[s2], f2[s2]
        o3 = np.lexsort((f2, c2))
        c3, f3 = c2[o3], f2[o3]
        s3, e3 = run_boundaries(c3, f3)
        return pa.table(
            {"cohort_week": pa.array((c3[s3] * week_us + monday_off).view("datetime64[us]")),
             "week_offset": pa.array(f3[s3], pa.int64()),
             "n_users": pa.array(e3 - s3, pa.int64())}
        )

    partials = hash_partitioned(
        ds,
        lambda t: [t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        retention_part,
        num_parts=32,
    )
    return partitioned_aggregate(
        partials, ["cohort_week", "week_offset"], [("n_users", "sum")],
        ["cohort_week", "week_offset", "n_users"], num_parts=16,
    ).sort(["cohort_week", "week_offset"])


# ---- events: FULL OUTER join (high-value click/purchase coverage) ----
def q_click_purchase_coverage(sf_dir: str, min_value: float = 200.0) -> rd.Dataset:
    """Per-user high-value click and purchase counts with users present on
    EITHER side — the FULL OUTER join shape, run as Ray Data's native
    ``join_type="full_outer"`` over two pre-aggregated sides (each side is
    per-batch partial counts + a partitioned exact sum, so the join's
    shuffle moves one row per user per side, not events).  NULL sides
    coalesce to 0 like the oracle."""
    thresh = pa.scalar(min_value)

    def side(event_type: str, out_col: str, key: str) -> rd.Dataset:
        ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(
                pc.and_(pc.equal(t["event_type"], pa.scalar(event_type)),
                        pc.greater(t["value"], thresh))
            )
            g = pa.table({key: t["user_id"]}).group_by([key]).aggregate([(key, "count")])
            return g.rename_columns([key, out_col])

        return partitioned_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            [key], [(out_col, "sum")], [key, out_col], num_parts=8,
        ).materialize()

    clicks = side("click", "n_clicks", "user_id")
    purchases = side("purchase", "n_purchases", "uid_p")
    # an EMPTY Dataset has no schema and aborts the acero hash join —
    # short-circuit an all-empty side to the other side alone (the full
    # outer result degenerates to it).  Two scans + a join is deliberate:
    # this op exists to exercise the NATIVE full_outer join (the one-pass
    # conditional-aggregation shape is q_event_pivot).
    if clicks.count() == 0 and purchases.count() == 0:
        return rd.from_arrow(pa.table(
            {"user_id": pa.array([], pa.int64()),
             "n_clicks": pa.array([], pa.int64()),
             "n_purchases": pa.array([], pa.int64())}
        ))
    if purchases.count() == 0:
        joined = clicks.map_batches(
            lambda t: t.append_column("uid_p", pa.nulls(t.num_rows, pa.int64()))
                       .append_column("n_purchases", pa.nulls(t.num_rows, pa.int64())),
            batch_format="pyarrow",
        )
    elif clicks.count() == 0:
        joined = purchases.map_batches(
            lambda t: t.append_column("user_id", pa.nulls(t.num_rows, pa.int64()))
                       .append_column("n_clicks", pa.nulls(t.num_rows, pa.int64())),
            batch_format="pyarrow",
        )
    else:
        joined = clicks.join(
            purchases, join_type="full_outer", num_partitions=_join_parts(sf_dir, "events"),
            on=("user_id",), right_on=("uid_p",),
        )

    def coalesce(t: pa.Table) -> pa.Table:
        # the hash join already coalesces the key pair into user_id
        # (acero coalesce_keys); only the value sides need NULL -> 0
        uid = t["user_id"]
        if "uid_p" in t.column_names:
            uid = pc.coalesce(uid, t["uid_p"])
        return pa.table(
            {"user_id": uid,
             "n_clicks": pc.coalesce(t["n_clicks"], pa.scalar(0, pa.int64())),
             "n_purchases": pc.coalesce(t["n_purchases"], pa.scalar(0, pa.int64()))}
        )

    return joined.map_batches(coalesce, batch_format="pyarrow").sort("user_id")


# ---- native LEFT ANTI join (parts never shipped in bulk) ----
def q_parts_never_bulk(sf_dir: str, min_qty: float = 45.0) -> pa.Table:
    """Parts with NO bulk lineitem (quantity >= 45), counted per p_type —
    the large×large anti-join shape where neither side broadcasts at
    scale, run as Ray Data's native ``join_type="left_anti"``.  The right
    side pre-reduces to distinct bulk partkeys inside partitions (the
    anti probe needs keys, not rows), so the join shuffle moves one row
    per distinct key."""
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    qty = pa.scalar(min_qty)

    def bulk_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["l_quantity"], qty))
        keys = np.unique(t["l_partkey"].to_numpy(zero_copy_only=False))
        return pa.table({"bulk_partkey": pa.array(keys, pa.int64())})

    def dedup_part_keys(g: pa.Table) -> pa.Table:
        keys = np.unique(g["bulk_partkey"].to_numpy(zero_copy_only=False))
        return pa.table({"bulk_partkey": pa.array(keys, pa.int64())})

    keys_ds = hash_partitioned(
        li.map_batches(bulk_keys, batch_format="pyarrow"),
        lambda t: [t["bulk_partkey"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        dedup_part_keys, num_parts=16,
    ).materialize()

    anti = part.join(
        keys_ds, join_type="left_anti", num_partitions=_join_parts(sf_dir, "part", "lineitem"),
        on=("p_partkey",), right_on=("bulk_partkey",),
    )
    out = driver_grouped_agg(
        anti.map_batches(
            lambda t: pa.table({"p_type": t["p_type"],
                                "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64())}),
            batch_format="pyarrow",
        ),
        ["p_type"], [("one", "sum")], ["p_type", "n"],
    ).sort_values("p_type").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# ---- correlation / covariance sufficient statistics (exact integers) ----
def q_corr_stats(sf_dir: str) -> pa.Table:
    """Per return flag, the EXACT-INTEGER sufficient statistics of the
    (quantity, extended-price-dollars) correlation: n, Σx, Σy, Σx², Σy²,
    Σxy as BIGINT — the mergeable-partials form of the corr/covar
    aggregate (cov = (nΣxy − ΣxΣy)/n², corr follows; the division stays
    OUT of the query so both sides hash bit-identically — the EXACT-INTEGER
    SPEC pattern; y is FLOOR(price) because Arrow/DuckDB round .5 in
    opposite directions).  Partials combine per batch in Arrow C++, the driver
    folds O(blocks × 3 groups) rows (driver_grouped_agg rationale); at any
    scale the shuffle-free partial tree is exactly how a distributed corr
    is built.  Ranges: y ≤ ~10^5 dollars, so Σy² ≤ ~2·10^15 per group at
    sf0.1 — int64-safe by ~4 orders (dollars, not cents, for that reason)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(batch["l_quantity"]), pa.int64())
        # FLOOR, not ROUND: Arrow rounds half-to-even, DuckDB half-away —
        # they disagree on every $x.50 price; floor is identical on both
        y = pc.cast(pc.floor(batch["l_extendedprice"]), pa.int64())
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "x": x,
                "y": y,
                "xx": pc.multiply(x, x),
                "yy": pc.multiply(y, y),
                "xy": pc.multiply(x, y),
            }
        )
        g = t.group_by(["l_returnflag"]).aggregate(
            [("x", "count"), ("x", "sum"), ("y", "sum"),
             ("xx", "sum"), ("yy", "sum"), ("xy", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .to_pandas()  # bounded: O(blocks x 3 flags) moment partials
        .groupby("l_returnflag", as_index=False)
        .sum()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    out = out[["l_returnflag", "n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]]
    return pa.Table.from_pandas(out, preserve_index=False)


# ---- grouped order statistics: exact per-customer median (oracle) ----
def _custkey_cents_shape(t: pa.Table) -> pa.Table:
    """(o_custkey, o_totalprice) -> (o_custkey, cents) — the shared map
    stage of the grouped-order-statistics queries below."""
    return pa.table({"o_custkey": t["o_custkey"],
                     "cents": _cents(t["o_totalprice"])})


def _grouped_lower_median_sort(key: np.ndarray, cents: np.ndarray):
    """Sort by (key, cents) and locate each run's LOWER median: returns
    (key, cents, starts, ends, mid) with cents[mid] == quantile_disc(.5)
    per run (idx = start + ceil(n/2) - 1) — the one place the median
    convention lives, shared by q_customer_median_order and
    q_customer_order_mad so they can never diverge."""
    order = np.lexsort((cents, key))
    key, cents = key[order], cents[order]
    starts, ends = run_boundaries(key)
    n = ends - starts
    mid = starts + (n + 1) // 2 - 1
    return key, cents, starts, ends, mid


def q_customer_median_order(sf_dir: str) -> rd.Dataset:
    """Exact per-customer median order value (cents) — grouped order
    statistics, the aggregate a shuffle-free partial tree CANNOT compute
    (medians don't combine): one hash partition by ``o_custkey`` brings
    every customer's complete order set to one worker, one lexsort per
    partition ranks all runs at once, and the median is a vectorized
    gather at ``start + ceil(n/2) - 1`` per run — the DISCRETE (lower)
    median, matching DuckDB ``quantile_disc(x, 0.5)`` exactly so the
    value hash is bit-stable (no float interpolation between the two
    middle elements on even counts).

    Scale shape: the only shuffle is the one hash partition; per-partition
    memory is O(rows/num_parts) with no per-group Python dispatch
    (grouped.hash_partitioned rationale)."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    _OUT = pa.schema(
        [("o_custkey", pa.int64()), ("n_orders", pa.int64()),
         ("median_cents", pa.int64())]
    )

    def median_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        key, cents, starts, ends, mid = _grouped_lower_median_sort(
            t["o_custkey"].to_numpy(zero_copy_only=False),
            t["cents"].to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "o_custkey": pa.array(key[starts], pa.int64()),
                "n_orders": pa.array((ends - starts).astype(np.int64), pa.int64()),
                "median_cents": pa.array(cents[mid], pa.int64()),
            }
        )

    out = hash_partitioned(
        ds.map_batches(_custkey_cents_shape, batch_format="pyarrow"),
        lambda t: [t["o_custkey"].to_numpy(zero_copy_only=False).view(np.uint64)],
        median_part,
        num_parts=32,
    )
    return out.sort("o_custkey")


# ---- grouped robust spread: exact median absolute deviation ----
def q_customer_order_mad(sf_dir: str) -> rd.Dataset:
    """Exact per-customer MAD of order value: mad = lower-median of
    |cents - lower-median(cents)| — the robust-spread aggregate behind
    outlier gating.  The naive plan is TWO grouped-median jobs with a
    broadcast join between them (two shuffles); one hash partition by
    ``o_custkey`` co-locates each customer's complete order set, so both
    order-statistic passes are partition-local — the second "pass" is just
    a second lexsort over the deviations.  All integer cents: the lower
    median of integers is an integer, so |x - med| and its median stay
    exact (same quantile_disc(.5) == start + ceil(n/2) - 1 convention as
    q_customer_median_order, bit-stable vs the oracle)."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    _OUT = pa.schema(
        [("o_custkey", pa.int64()), ("median_cents", pa.int64()),
         ("mad_cents", pa.int64())]
    )

    def mad_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        key, cents, starts, ends, mid = _grouped_lower_median_sort(
            t["o_custkey"].to_numpy(zero_copy_only=False),
            t["cents"].to_numpy(zero_copy_only=False),
        )
        med = cents[mid]
        dev = np.abs(cents - np.repeat(med, ends - starts))
        # second order-statistic pass, still local: key is already the
        # primary sort key, so this re-ranks only within each run
        dev = dev[np.lexsort((dev, key))]
        return pa.table(
            {
                "o_custkey": pa.array(key[starts], pa.int64()),
                "median_cents": pa.array(med, pa.int64()),
                "mad_cents": pa.array(dev[mid], pa.int64()),
            }
        )

    out = hash_partitioned(
        ds.map_batches(_custkey_cents_shape, batch_format="pyarrow"),
        lambda t: [t["o_custkey"].to_numpy(zero_copy_only=False).view(np.uint64)],
        mad_part,
        num_parts=32,
    )
    return out.sort("o_custkey")


# ---- ordered string_agg: per-user event journey paths ----
def q_user_event_paths(sf_dir: str) -> rd.Dataset:
    """Per-user ordered event journey: the '>'-joined ``event_type``
    sequence in (ts, event_id) order — ordered string_agg, the
    path-analysis primitive behind funnel mining and Markov attribution.
    One hash partition by ``user_id``; per partition ONE lexsort ranks
    every user's events at once and each run's path is a C-level
    ``str.join`` over the sorted type slice (the Python loop is O(groups)
    building output rows, not per-row work).  Deterministic: ``event_id``
    breaks ts ties identically on both engines."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    _OUT = pa.schema(
        [("user_id", pa.int64()), ("n_events", pa.int64()),
         ("path", pa.string())]
    )

    def path_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, et = uid[order], et[order]
        starts, ends = run_boundaries(uid)
        paths = [">".join(et[s:e]) for s, e in zip(starts, ends)]
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "path": pa.array(paths, pa.string()),
            }
        )

    return hash_partitioned(
        ds,
        lambda t: [t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        path_part,
        num_parts=64,
    ).sort("user_id")


# ---- fixed-width value histogram (O(bins) result, shuffle-free) ----
def q_value_histogram(sf_dir: str, width_cents: int = 2000) -> pa.Table:
    """Histogram of event values in fixed $20 bins: ``bin = cents //
    width`` (values are nonnegative, so DuckDB's truncating ``//`` and
    numpy's flooring ``//`` agree), with per-bin count and exact cents
    total.  Shuffle-free: per-batch Arrow group_by partials, O(bins)
    driver combine (driver_grouped_agg rationale) — the distribution
    sketch every corpus-stats dashboard needs, as one streaming pass."""
    ds = _read(sf_dir, "events", ["value"])

    def binned(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"])
        # exact int64 division (values nonnegative): the float path loses
        # exactness past 2^53 and can round across a bin boundary
        b = pc.divide(cents, pa.scalar(width_cents, pa.int64()))
        return pa.table({"bin": b, "cents": cents})

    pdf = driver_grouped_agg(
        ds.map_batches(binned, batch_format="pyarrow"),
        ["bin"],
        [("cents", "count"), ("cents", "sum")],
        ["bin", "n", "sum_cents"],
    )
    pdf = pdf.sort_values("bin").reset_index(drop=True)
    pdf["n"] = pdf["n"].astype(np.int64)
    pdf["sum_cents"] = pdf["sum_cents"].astype(np.int64)
    return pa.Table.from_pandas(pdf, preserve_index=False)


# ---- correlated per-group aggregate: rows above their own group mean ----
def q_above_customer_avg(sf_dir: str) -> rd.Dataset:
    """Per customer: how many of their orders are strictly above their OWN
    average order value — the classic correlated-aggregate shape
    ("employees above department average").  The SQL spelling needs a
    self-join to the grouped average; the engine needs neither a join nor
    a second pass: one hash partition co-locates each customer's orders,
    and ``cents * n > sum`` is the exact integer cross-multiplication of
    ``cents > sum/n`` (no division, no float ties — same discipline as
    above_avg_orders' scalar-subquery variant)."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    _OUT = pa.schema(
        [("o_custkey", pa.int64()), ("n_orders", pa.int64()),
         ("n_above", pa.int64())]
    )

    def above_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        key = t["o_custkey"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, cents = key[order], cents[order]
        starts, ends = run_boundaries(key)
        n = (ends - starts).astype(np.int64)
        sums = np.add.reduceat(cents, starts)
        above = cents * np.repeat(n, n) > np.repeat(sums, n)
        n_above = np.add.reduceat(above, starts).astype(np.int64)
        # a single-order run: reduceat over an all-False mask is fine, but
        # note cents*1 > cents is False, so n_above = 0 as SQL agrees
        return pa.table(
            {"o_custkey": pa.array(key[starts], pa.int64()),
             "n_orders": pa.array(n, pa.int64()),
             "n_above": pa.array(n_above, pa.int64())}
        )

    out = hash_partitioned(
        ds.map_batches(_custkey_cents_shape, batch_format="pyarrow"),
        lambda t: [t["o_custkey"].to_numpy(zero_copy_only=False).view(np.uint64)],
        above_part,
        num_parts=32,
    )
    return out.sort("o_custkey")


# ---- sequence bigrams: Markov transition counts over user journeys ----
def q_event_transitions(sf_dir: str) -> pa.Table:
    """Event-type transition counts: for every consecutive pair of events
    by the same user (in (ts, event_id) order), count (src, dst) — the
    transition matrix behind Markov attribution / next-event prediction,
    and the aggregate form of q_user_event_paths' bigrams.

    Scale shape: one hash partition by user_id co-locates each user's
    ordered run; transitions are a shifted comparison inside the run
    (mask out run boundaries), pre-aggregated per partition to O(types^2)
    rows; the driver combine is O(types^2) (driver_grouped_agg
    rationale).  No join, no second shuffle."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    _OUT = pa.schema(
        [("src", pa.string()), ("dst", pa.string()), ("n", pa.int64())]
    )

    def trans_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, et = uid[order], et[order]
        if len(uid) < 2:
            return _OUT.empty_table()
        same = uid[1:] == uid[:-1]  # consecutive rows of the SAME user
        src, dst = et[:-1][same], et[1:][same]
        if not len(src):
            return _OUT.empty_table()
        # partition-local combine: factorize each side, count the combined
        # integer codes (string concat would need a separator no type can
        # contain — numpy U-strings can't carry NUL)
        us, si = np.unique(src, return_inverse=True)
        ud, di = np.unique(dst, return_inverse=True)
        code = si.astype(np.int64) * len(ud) + di
        uc, inv = np.unique(code, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(uc)).astype(np.int64)
        return pa.table(
            {"src": pa.array(us[uc // len(ud)], pa.string()),
             "dst": pa.array(ud[uc % len(ud)], pa.string()),
             "n": pa.array(cnt, pa.int64())}
        )

    partials = hash_partitioned(
        ds,
        lambda t: [t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        trans_part,
        num_parts=64,
    )
    pdf = driver_grouped_agg(partials, ["src", "dst"], [("n", "sum")],
                             ["src", "dst", "n"])
    pdf = pdf.sort_values(["src", "dst"]).reset_index(drop=True)
    pdf["n"] = pdf["n"].astype(np.int64)
    return pa.Table.from_pandas(pdf, preserve_index=False)


# ---- broadcast range-lookup join: irregular-interval dim table ----
def q_value_tier_lookup(sf_dir: str, num_tiers: int = 64) -> pa.Table:
    """Assign each event to an IRREGULAR price tier (quadratic widths,
    ``lo_k = 25*k^2`` cents) and aggregate per tier — the range-lookup
    join (``JOIN ON x BETWEEN lo AND hi``) every weblog pipeline runs
    against an ip-to-geo / price-book style interval dim table.

    Scale shape: the dim side is small and its intervals are disjoint and
    sorted, so the join is NOT a shuffle — the sorted lower bounds are a
    broadcast constant and each batch resolves its tier with ONE
    ``np.searchsorted`` (binary search per row, vectorized).  At 100 TB
    the fact side streams untouched; contrast with event_error_window,
    which handles the genuinely-overlapping-interval case.  Per-tier
    partials combine on the driver at O(num_tiers)
    (driver_grouped_agg rationale)."""
    ds = _read(sf_dir, "events", ["value"])
    # quadratic bounds: tier k covers [25k^2, 25(k+1)^2 - 1] cents; the
    # last tier's upper bound is open-ended (2^40) so no value falls off
    los = (25 * np.arange(num_tiers, dtype=np.int64) ** 2)

    def tiered(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"]).to_numpy(zero_copy_only=False)
        tier = np.searchsorted(los, cents, side="right") - 1
        return pa.table({"tier": pa.array(tier, pa.int64()),
                         "cents": pa.array(cents, pa.int64())})

    pdf = driver_grouped_agg(
        ds.map_batches(tiered, batch_format="pyarrow"),
        ["tier"],
        [("cents", "count"), ("cents", "sum")],
        ["tier", "n", "sum_cents"],
    )
    pdf = pdf.sort_values("tier").reset_index(drop=True)
    pdf["n"] = pdf["n"].astype(np.int64)
    pdf["sum_cents"] = pdf["sum_cents"].astype(np.int64)
    return pa.Table.from_pandas(pdf, preserve_index=False)


# ---- streaming watermark: late-event windowed aggregate (oracle) ----
def q_watermark_windows(sf_dir: str, delay_min: int = 5) -> pa.Table:
    """Event-time windowing with WATERMARK late-data dropping — the
    streaming semantics batch engines usually punt on: events are
    processed in ARRIVAL order, the watermark trails the running max event
    time by ``delay_min``, and an event whose timestamp is behind the
    watermark at its arrival is dropped from its hour window.  The driver
    tables carry no ingest offset, so arrival is the deterministic mix32
    permutation (the corpus_shuffle convention — a simulated network
    reordering; in production this column IS the ingest offset).

    Scale shape: the watermark is a prefix MAX over arrival order — an
    associative scan, decomposed like corpus_shuffle's ranks: pass 1
    streams per-batch maxima of the 256 ORDERED arrival buckets
    (``h32 >> 24``) into an O(256) driver combine whose exclusive prefix
    max seeds each bucket; pass 2 partitions by bucket, runs the local
    running max seeded with the incoming watermark, flags late rows and
    pre-aggregates per (window, late) before leaving the worker.  No
    global sort, driver state O(256).  Oracle: MAX(ts) OVER (ORDER BY
    h32, event_id ROWS ... 1 PRECEDING)."""
    from monocator_ray.pipelines.docs import _mix32

    ds = _read(sf_dir, "events", ["event_id", "ts"])
    delay_us = np.int64(delay_min * 60 * 1_000_000)
    _NOPREV = np.int64(np.iinfo(np.int64).min)

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _mix32(ids)
        return pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts_us": pa.array(
                    t["ts"].to_numpy(zero_copy_only=False).view(np.int64), pa.int64()
                ),
                "h32": pa.array(h.astype(np.int64), pa.int64()),
                "bucket": pa.array((h >> 24).astype(np.int64), pa.int64()),
            }
        )

    kd = ds.map_batches(keyed, batch_format="pyarrow")
    bmax = driver_grouped_agg(kd, ["bucket"], [("ts_us", "max")], ["bucket", "mx"])
    full = np.full(256, _NOPREV, dtype=np.int64)
    full[bmax["bucket"].to_numpy(np.int64)] = bmax["mx"].to_numpy(np.int64)
    # exclusive prefix max: the watermark each bucket INHERITS
    incoming = np.full(256, _NOPREV, dtype=np.int64)
    np.maximum.accumulate(full[:-1], out=full[:-1])
    incoming[1:] = full[:-1]

    _OUT = pa.schema(
        [("window_start", pa.timestamp("us")), ("late", pa.bool_()),
         ("n", pa.int64())]
    )

    def flag_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        b = t["bucket"].to_numpy(zero_copy_only=False)
        h = t["h32"].to_numpy(zero_copy_only=False)
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, b))
        b, ts = b[order], ts[order]
        starts, ends = run_boundaries(b)
        prevmax = np.empty(len(b), dtype=np.int64)
        for s, e in zip(starts.tolist(), ends.tolist()):
            run = np.empty(e - s, dtype=np.int64)
            run[0] = incoming[b[s]]
            if e - s > 1:
                np.maximum.accumulate(ts[s : e - 1], out=run[1:])
                np.maximum(run[1:], run[0], out=run[1:])
            prevmax[s:e] = run
        valid = prevmax != _NOPREV
        late = valid & (ts < np.where(valid, prevmax, 0) - delay_us)
        wnd = (ts // 3_600_000_000) * 3_600_000_000  # floor to the hour
        part = pa.table(
            {
                "window_start": pa.array(wnd.view("datetime64[us]"), pa.timestamp("us")),
                "late": pa.array(late, pa.bool_()),
                "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
            }
        )
        g = part.group_by(["window_start", "late"]).aggregate([("one", "sum")])
        return g.rename_columns(["window_start", "late", "n"])

    partials = hash_partitioned(
        kd,
        lambda t: [t["bucket"].to_numpy(zero_copy_only=False).view(np.uint64)],
        flag_part,
        num_parts=32,
    )
    pdf = partials.to_pandas().groupby(["window_start", "late"], as_index=False)["n"].sum()  # bounded: O(windows x 2) flag partials
    piv = pdf.pivot_table(index="window_start", columns="late", values="n",
                          fill_value=0, aggfunc="sum")
    out = pd.DataFrame(
        {
            "window_start": piv.index,
            "n_kept": piv[False].to_numpy(np.int64) if False in piv else 0,
            "n_late": piv[True].to_numpy(np.int64) if True in piv else 0,
        }
    ).sort_values("window_start").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# ---- ordered grouped string aggregation (oracle) ----
def q_customer_order_list(sf_dir: str) -> rd.Dataset:
    """Per-customer comma-joined order-key list in key order — the ordered
    string_agg shape (feature lists, session traces).  One hash partition
    by customer; inside, one lexsort and a per-run join (string building
    is inherently per-group; the sort and run detection stay vectorized).
    Strings only materialize in the output rows, never on the driver."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])

    _OUT = pa.schema(
        [("o_custkey", pa.int64()), ("n_orders", pa.int64()),
         ("orders_csv", pa.string())]
    )

    def agg_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, cust))
        cust, okey = cust[order], okey[order]
        starts, ends = run_boundaries(cust)
        okey_str = okey.astype(str)
        csv = [",".join(okey_str[s:e]) for s, e in zip(starts.tolist(), ends.tolist())]
        return pa.table(
            {
                "o_custkey": pa.array(cust[starts], pa.int64()),
                "n_orders": pa.array(ends - starts, pa.int64()),
                "orders_csv": pa.array(csv, pa.string()),
            }
        )

    return hash_partitioned(
        ds,
        lambda t: [t["o_custkey"].to_numpy(zero_copy_only=False).view(np.uint64)],
        agg_part,
        num_parts=32,
    ).sort("o_custkey")


# ---- TPC-H Q6 shape: forecast revenue (exact-integer product; oracle) ----
def q_forecast_revenue(sf_dir: str) -> pa.Table:
    """The Q6 revenue-change forecast: SUM(price * discount) over a date
    band, a discount band and a quantity cap — the classic
    filter-then-reduce scan.  Exact integers both sides: price in cents
    (int64) x discount in basis points (discounts are 2-decimal, so
    ROUND(d*100) is exact) -> one int64 product per row; the result is
    cents x 100 so neither side ever sums a float.  Shuffle-free: per-batch
    Arrow filters + one scalar partial per batch, O(blocks) driver fold."""
    ds = _read(sf_dir, "lineitem", ["l_shipdate", "l_discount", "l_quantity",
                                    "l_extendedprice"])
    lo = pa.scalar(np.datetime64("1995-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-01-01", "us"))

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi)),
            pc.and_(
                pc.and_(pc.greater_equal(t["l_discount"], pa.scalar(0.03)),
                        pc.less_equal(t["l_discount"], pa.scalar(0.07))),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = t.filter(keep)
        cents = _cents(t["l_extendedprice"])
        bps = pc.cast(pc.round(pc.multiply(t["l_discount"], pa.scalar(100.0))),
                      pa.int64())
        rev = pc.sum(pc.multiply(cents, bps))
        n = t.num_rows
        return pa.table(
            {"revenue_cents_bps": pa.array([rev.as_py() or 0], pa.int64()),
             "n": pa.array([n], pa.int64())}
        )

    pdf = ds.map_batches(partial, batch_format="pyarrow").to_pandas()  # bounded: O(blocks) two-scalar partials
    return pa.table(
        {
            "revenue_cents_bps": pa.array([int(pdf["revenue_cents_bps"].sum())], pa.int64()),
            "n": pa.array([int(pdf["n"].sum())], pa.int64()),
        }
    )


# ---- aggregate-of-aggregate: user-activity distribution (oracle) ----
def q_user_activity_histogram(sf_dir: str) -> pa.Table:
    """Distribution of per-user event counts (the degree-distribution
    shape): first a full-cardinality grouped count (one hash-partition
    shuffle — users scale with the corpus), then the O(distinct counts)
    histogram folds shuffle-free through per-batch partials.  The
    two-level aggregate is the pattern behind every "how skewed are my
    keys" diagnostic, including the crawl's own hot-host detection."""
    ds = _read(sf_dir, "events", ["user_id"])
    per_user = partitioned_aggregate(
        ds, ["user_id"], [("user_id", "count")], ["user_id", "n_events"],
    )
    pdf = driver_grouped_agg(
        per_user, ["n_events"], [("user_id", "count")], ["n_events", "n_users"]
    ).sort_values("n_events").reset_index(drop=True)
    pdf["n_events"] = pdf["n_events"].astype(np.int64)
    pdf["n_users"] = pdf["n_users"].astype(np.int64)
    return pa.Table.from_pandas(pdf, preserve_index=False)


# ---- grouped exact quartiles (oracle; quantile_disc semantics) ----
def q_customer_price_quartiles(sf_dir: str) -> rd.Dataset:
    """Exact per-customer order-value quartiles (cents): the multi-gather
    extension of q_customer_median_order — one hash partition, one lexsort,
    then three vectorized gathers at ``start + ceil(q*n) - 1`` per run,
    which is DuckDB ``quantile_disc`` exactly (verified for q in
    {.25, .5, .75} on even and odd group sizes)."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    _OUT = pa.schema(
        [("o_custkey", pa.int64()), ("n_orders", pa.int64()),
         ("p25_cents", pa.int64()), ("p50_cents", pa.int64()),
         ("p75_cents", pa.int64())]
    )

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": t["o_custkey"],
                         "cents": _cents(t["o_totalprice"])})

    def quartile_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        key = t["o_custkey"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, key))
        key, cents = key[order], cents[order]
        starts, ends = run_boundaries(key)
        n = ends - starts
        cols = {"o_custkey": pa.array(key[starts], pa.int64()),
                "n_orders": pa.array(n.astype(np.int64), pa.int64())}
        for name, num, den in (("p25_cents", 1, 4), ("p50_cents", 1, 2),
                               ("p75_cents", 3, 4)):
            # ceil(q*n) - 1 with exact integer ceil: (num*n + den - 1) // den
            idx = starts + (num * n + den - 1) // den - 1
            cols[name] = pa.array(cents[idx], pa.int64())
        return pa.table(cols)

    out = hash_partitioned(
        ds.map_batches(shape, batch_format="pyarrow"),
        lambda t: [t["o_custkey"].to_numpy(zero_copy_only=False).view(np.uint64)],
        quartile_part,
        num_parts=32,
    )
    return out.sort("o_custkey")


# ---- set operations: INTERSECT / EXCEPT over distinct key sets ----
def _custkey_year_flags(sf_dir: str, year_a: int, year_b: int) -> rd.Dataset:
    """Distinct o_custkey with per-year presence flags, computed in ONE
    pass + ONE partitioned shuffle: per-batch Arrow group_by folds the
    fact rows down to (custkey, saw-year-a, saw-year-b) partials, then
    partitioned_aggregate max-combines them — the set-op build never
    materializes either operand's row set, only the distinct-key result.
    Both INTERSECT and EXCEPT read the same flags dataset, so the two
    registry queries share the plan shape (a real engine would CSE it)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def part(t: pa.Table) -> pa.Table:
        yr = pc.year(t["o_orderdate"])
        flags = pa.table(
            {
                "o_custkey": t["o_custkey"],
                "in_a": pc.cast(pc.equal(yr, pa.scalar(year_a, pa.int64())), pa.int64()),
                "in_b": pc.cast(pc.equal(yr, pa.scalar(year_b, pa.int64())), pa.int64()),
            }
        )
        g = flags.group_by("o_custkey").aggregate([("in_a", "max"), ("in_b", "max")])
        return g.rename_columns(["o_custkey", "in_a", "in_b"])

    return partitioned_aggregate(
        orders.map_batches(part, batch_format="pyarrow"),
        ["o_custkey"],
        [("in_a", "max"), ("in_b", "max")],
        ["o_custkey", "in_a", "in_b"],
        num_parts=32,
    )


def q_repeat_buyers(sf_dir: str) -> rd.Dataset:
    """INTERSECT: customers ordering in both 1995 and 1996 (the set-op
    surface; see _custkey_year_flags for the single-shuffle plan)."""

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["in_a"], 1), pc.equal(t["in_b"], 1))
        return t.filter(m).select(["o_custkey"])

    return (
        _custkey_year_flags(sf_dir, 1995, 1996)
        .map_batches(keep, batch_format="pyarrow")
        .sort("o_custkey")
    )


def q_lapsed_buyers(sf_dir: str) -> rd.Dataset:
    """EXCEPT: customers ordering in 1995 but not in 1996 (set difference
    over distinct keys; same one-shuffle flags plan as q_repeat_buyers)."""

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["in_a"], 1), pc.equal(t["in_b"], 0))
        return t.filter(m).select(["o_custkey"])

    return (
        _custkey_year_flags(sf_dir, 1995, 1996)
        .map_batches(keep, batch_format="pyarrow")
        .sort("o_custkey")
    )


# ---- DENSE_RANK window over a dimension (ties collapse to one rank) ----
def q_part_price_dense_rank(sf_dir: str) -> rd.Dataset:
    """DENSE_RANK() OVER (PARTITION BY p_type ORDER BY price DESC) <= 2,
    aggregated to (type, rank, price, n_parts) so tie groups stay one row
    — the dense-rank window shape (RANK is q_order_rank).  Type-hash
    partitions: every type lands wholly in one partition, ranks computed
    by a vectorized unique-of-sorted-prices walk, never per row."""
    from monocator_ray.hashing import hash_str64

    ds = _read(sf_dir, "part", ["p_partkey", "p_type", "p_retailprice"])

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_type": t["p_type"],
                "price_cents": _cents(t["p_retailprice"]),
            }
        )

    def rank_part(g: pa.Table) -> pa.Table:
        typ = g["p_type"].to_numpy(zero_copy_only=False)
        cents = g["price_cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-cents, typ))
        typ, cents = typ[order], cents[order]
        starts, ends = run_boundaries(typ)
        # dense rank within each type run: count of DISTINCT prices seen
        # so far — new-price flags cumsummed per run, all vectorized
        n = len(typ)
        new_price = np.ones(n, dtype=np.int64)
        new_price[1:] = (cents[1:] != cents[:-1]) | (typ[1:] != typ[:-1])
        csum = np.cumsum(new_price)
        base = np.zeros(n, dtype=np.int64)
        base[:] = (csum - new_price)[np.repeat(starts, ends - starts)]
        drank = csum - base
        keep = drank <= 2
        t2 = pa.table(
            {
                "p_type": pa.array(typ[keep], pa.string()),
                "dense_rnk": pa.array(drank[keep], pa.int64()),
                "price_cents": pa.array(cents[keep], pa.int64()),
            }
        )
        g2 = t2.group_by(["p_type", "dense_rnk", "price_cents"]).aggregate(
            [("price_cents", "count")]
        )
        return g2.rename_columns(["p_type", "dense_rnk", "price_cents", "n_parts"])

    return hash_partitioned(
        ds.map_batches(shape, batch_format="pyarrow"),
        lambda t: [hash_str64(t["p_type"].to_pylist())],
        rank_part,
        num_parts=8,
    ).sort(["p_type", "dense_rnk"])


# ---- scalar subquery (compare each row to a global aggregate) ----
def q_above_avg_orders(sf_dir: str) -> rd.Dataset:
    """Orders priced above the GLOBAL average, counted per priority — the
    correlated-scalar-subquery shape (WHERE x > (SELECT AVG(..))).  The
    average never materializes as a float: keep iff
    ``price_cents * n_orders > total_cents`` (exact-integer
    cross-multiplication), so engine and oracle agree bit-for-bit.

    Plan: pass 1 folds orders to two scalars (COUNT, SUM of cents) via
    per-batch partials + driver combine; pass 2 filters against the
    broadcast scalars and pre-aggregates per priority — no shuffle at all
    (O(priorities) result, driver_grouped_agg rationale)."""
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def scalars(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"])
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "tot": pa.array([pc.sum(cents).as_py() or 0], pa.int64()),
            }
        )

    parts = collect_arrow(orders.map_batches(scalars, batch_format="pyarrow"))  # bounded: O(blocks) scalar partials
    n_orders = int(pc.sum(parts["n"]).as_py() or 0)
    total_cents = int(pc.sum(parts["tot"]).as_py() or 0)

    def keep_count(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        mask = cents * n_orders > total_cents
        kept = pa.table(
            {
                "o_orderpriority": t.filter(pa.array(mask))["o_orderpriority"],
            }
        )
        kept = kept.append_column(
            "one", pa.array(np.ones(kept.num_rows, np.int64), pa.int64())
        )
        g = kept.group_by("o_orderpriority").aggregate([("one", "sum")])
        return g.rename_columns(["o_orderpriority", "n_above"])

    out = driver_grouped_agg(
        orders.map_batches(keep_count, batch_format="pyarrow"),
        ["o_orderpriority"],
        [("n_above", "sum")],
        ["o_orderpriority", "n_above"],
    ).sort_values("o_orderpriority")
    out["n_above"] = out["n_above"].astype(np.int64)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# ---- grouped MODE (most frequent value, deterministic tie-break) ----
def q_priority_mode(sf_dir: str) -> rd.Dataset:
    """Per order-year modal o_orderpriority (ties -> lexicographically
    smallest priority) — the MODE aggregate as a two-level plan: per-batch
    (year, priority) count partials, driver combine of the O(years x
    priorities) grid, vectorized argmax.  The grid is dimension-sized by
    construction, so the driver step is bounded like any broadcast build
    side."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])

    def part(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "yr": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
                "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
            }
        ).group_by(["yr", "o_orderpriority"]).aggregate([("one", "sum")])
        return g.rename_columns(["yr", "o_orderpriority", "n"])

    grid = driver_grouped_agg(
        orders.map_batches(part, batch_format="pyarrow"),
        ["yr", "o_orderpriority"],
        [("n", "sum")],
        ["yr", "o_orderpriority", "n"],
    )
    # argmax per year: sort (yr asc, n desc, priority asc), take run heads
    grid = grid.sort_values(
        ["yr", "n", "o_orderpriority"], ascending=[True, False, True]
    ).reset_index(drop=True)
    head = grid.groupby("yr", as_index=False).first()
    head = head.rename(columns={"o_orderpriority": "mode_priority"})
    head["n"] = head["n"].astype(np.int64)
    return pa.Table.from_pandas(
        head[["yr", "mode_priority", "n"]], preserve_index=False
    )


# ---- UNION (distinct) across two tables ----
def q_active_nations(sf_dir: str) -> rd.Dataset:
    """Nation keys present in customers UNION suppliers — the distinct
    UNION set-op: per-batch unique partials from each read, Dataset.union
    of the partial streams, one shared distinct shuffle."""
    cust = _read(sf_dir, "customer", ["c_nationkey"])
    supp = _read(sf_dir, "supplier", ["s_nationkey"])

    def uniq(col: str):
        def f(t: pa.Table) -> pa.Table:
            u = pc.unique(pc.cast(t[col], pa.int64()))
            return pa.table({"nationkey": u, "one": pa.array(np.ones(len(u), np.int64))})

        return f

    both = cust.map_batches(uniq("c_nationkey"), batch_format="pyarrow").union(
        supp.map_batches(uniq("s_nationkey"), batch_format="pyarrow")
    )
    return (
        partitioned_aggregate(
            both, ["nationkey"], [("one", "min")], ["nationkey", "one"], num_parts=8
        )
        .select_columns(["nationkey"])
        .sort("nationkey")
    )


# ---- TPC-H Q5 shape: multi-way join (fact x fact x fact x dim) ----
def q_nation_revenue(sf_dir: str) -> rd.Dataset:
    """Revenue per customer nation for one order-year — the canonical
    multi-way join benchmark shape (TPC-H Q5).  The plan is the 100-TB
    ordering: (1) the widest fact (lineitem) pre-aggregates to one
    (orderkey, revenue) row per order BEFORE any join — the combiner that
    turns the biggest shuffle into an O(orders) one; (2) the year filter
    prunes orders before its join; (3) two partitioned hash joins chain
    on the shrinking side (rev x orders, then x customer — customer is
    fact-sized at scale, so it joins rather than broadcasts); (4) nation
    is a true dimension -> broadcast LUT, final O(nations) driver
    combine.  Revenue is exact-integer cents x percent:
    ``price_cents * (100 - disc_pct)`` — floats never cross a partition
    boundary."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev_part(t: pa.Table) -> pa.Table:
        r = _disc_rev_cpc(t)
        g = pa.table({"l_orderkey": t["l_orderkey"], "r": r}).group_by(
            "l_orderkey"
        ).aggregate([("r", "sum")])
        return g.rename_columns(["l_orderkey", "r"])

    rev = partitioned_aggregate(
        li.map_batches(rev_part, batch_format="pyarrow"),
        ["l_orderkey"],
        [("r", "sum")],
        ["l_orderkey", "r"],
        num_parts=32,
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def year_filter(t: pa.Table) -> pa.Table:
        m = pc.equal(pc.year(t["o_orderdate"]), pa.scalar(1996, pa.int64()))
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    orders_y = orders.map_batches(year_filter, batch_format="pyarrow")
    j1 = rev.join(
        orders_y,
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    # pre-aggregate to one row per customer before the customer join
    per_cust = partitioned_aggregate(
        j1.select_columns(["o_custkey", "r"]),
        ["o_custkey"],
        [("r", "sum")],
        ["o_custkey", "r"],
        num_parts=32,
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j2 = per_cust.join(
        cust,
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "customer"),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()  # dimension  # bounded: dimension table, 25 rows
    lut_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    class NationName:
        def __init__(self, ref):
            lookup = ray.get(ref)
            self.maxk = max(lookup) if lookup else 0
            self.lut = np.full(self.maxk + 1, "", dtype=object)
            for k, v in lookup.items():
                self.lut[k] = v

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch["c_nationkey"].to_numpy(zero_copy_only=False)
            names = self.lut[np.clip(keys, 0, self.maxk)]
            return pa.table(
                {"n_name": pa.array(names, pa.string()), "r": batch["r"]}
            )

    mapped = j2.map_batches(cached_stage(NationName, ref=lut_ref), batch_format="pyarrow")
    out = driver_grouped_agg(
        mapped, ["n_name"], [("r", "sum")], ["n_name", "revenue_cpc"]
    ).sort_values(["revenue_cpc", "n_name"], ascending=[False, True])
    out["revenue_cpc"] = out["revenue_cpc"].astype(np.int64)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# ---- gap-filled time series (generate_series / zero-fill shape) ----
def q_event_windows_filled(sf_dir: str) -> rd.Dataset:
    """Hourly event counts with MISSING HOURS ZERO-FILLED between the
    global min and max event hour — the generate_series / gap-fill shape
    dashboards need.  Plan: the count aggregate is the same O(hours)
    driver_grouped_agg as q_event_windows; the series grid is generated
    from two scalar bounds (min/max fold inside map_batches, driver
    combine of O(blocks) partials) — the grid itself is O(hours), result-
    sized by definition, so building it driver-side is the broadcast-
    build-side argument, not a materialization of the fact table."""
    ds = _read(sf_dir, "events", ["ts"])

    def hour_part(t: pa.Table) -> pa.Table:
        h = pc.floor_temporal(t["ts"], unit="hour")
        g = pa.table(
            {"window_start": h, "one": pa.array(np.ones(t.num_rows, np.int64))}
        ).group_by("window_start").aggregate([("one", "sum")])
        return g.rename_columns(["window_start", "n"])

    counts = driver_grouped_agg(
        ds.map_batches(hour_part, batch_format="pyarrow"),
        ["window_start"],
        [("n", "sum")],
        ["window_start", "n"],
    )
    if counts.empty:
        # empty events table: the oracle's generate_series over NULL
        # bounds yields zero rows; date_range(NaT, NaT) would raise
        return pa.table({"window_start": pa.array([], pa.timestamp("us")),
                         "n": pa.array([], pa.int64())})
    lo = counts["window_start"].min()
    hi = counts["window_start"].max()
    grid = pd.DataFrame({"window_start": pd.date_range(lo, hi, freq="h")})
    out = grid.merge(counts, on="window_start", how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    out = out.sort_values("window_start").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# ---- FIRST_VALUE / LAST_VALUE window (per-user first & last event) ----
def q_user_first_last(sf_dir: str) -> rd.Dataset:
    """FIRST_VALUE / LAST_VALUE OVER (PARTITION BY user ORDER BY ts,
    event_id) — the remaining window-function class: per user, the first
    and last event type with their timestamps.  User-hash partitions, one
    vectorized lexsort + run-boundary take inside each (every user lands
    wholly in one partition); event_id tie-breaks equal timestamps so
    both sides are deterministic."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])

    def fl_part(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid = uid[order], ts[order], eid[order]
        et = g["event_type"].to_numpy(zero_copy_only=False)[order]
        starts, ends = run_boundaries(uid)
        last = ends - 1
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "first_type": pa.array(et[starts], pa.string()),
                "first_ts": pa.Array.from_pandas(
                    ts[starts].view("datetime64[us]"), type=pa.timestamp("us")
                ),
                "last_type": pa.array(et[last], pa.string()),
                "last_ts": pa.Array.from_pandas(
                    ts[last].view("datetime64[us]"), type=pa.timestamp("us")
                ),
                "n_events": pa.array(ends - starts, pa.int64()),
            }
        )

    return hash_partitioned(
        ds,
        lambda t: [t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        fl_part,
        num_parts=16,
    ).sort("user_id")


# ---- orders: PERCENT_RANK + CUME_DIST windows (relative-rank family) ----
def q_order_percent_rank(sf_dir: str) -> rd.Dataset:
    """``PERCENT_RANK()`` and ``CUME_DIST()`` OVER (PARTITION BY
    o_orderpriority ORDER BY price) — the relative-rank windows that
    complete the rank family (RANK / DENSE_RANK / NTILE are elsewhere).
    Both are pure integer arithmetic on tie-group boundaries:
    percent_rank = (min_rank - 1) / (n - 1) (0 for n == 1, the SQL
    convention) and cume_dist = peers_end / n; the divisions of exact
    small ints produce bit-identical doubles on both sides, so the oracle
    hash-matches without tolerance.

    Scale shape: one hash partition by priority, one lexsort per
    partition ranks every run at once; tie groups are found by a single
    vectorized neighbor compare (no per-group dispatch)."""
    from monocator_ray.stages.grouped import hash_partitioned, run_boundaries

    from monocator_ray.hashing import hash_str64

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    _OUT = pa.schema(
        [("o_orderkey", pa.int64()), ("o_orderpriority", pa.string()),
         ("pct_rank", pa.float64()), ("cume_dist", pa.float64())]
    )

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": t["o_orderkey"],
             "o_orderpriority": t["o_orderpriority"],
             "cents": _cents(t["o_totalprice"])}
        )

    def rank_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        pr = g["o_orderpriority"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        key = g["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, cents, pr))
        pr, cents, key = pr[order], cents[order], key[order]
        starts, ends = run_boundaries(pr)
        counts = ends - starts
        n = np.repeat(counts, counts).astype(np.float64)
        pstart = np.repeat(starts, counts)
        idx = np.arange(len(pr), dtype=np.int64)
        # tie groups on (priority, cents): one vectorized neighbor compare
        change = np.empty(len(pr), dtype=bool)
        change[0] = True
        change[1:] = (pr[1:] != pr[:-1]) | (cents[1:] != cents[:-1])
        gid = np.cumsum(change) - 1
        tie_first = idx[change]
        tie_counts = np.bincount(gid)
        tie_start = tie_first[gid]
        tie_last = (tie_first + tie_counts - 1)[gid]
        min_rank = (tie_start - pstart + 1).astype(np.float64)
        pct = np.where(n > 1, (min_rank - 1) / np.maximum(n - 1, 1), 0.0)
        cume = (tie_last - pstart + 1).astype(np.float64) / n
        return pa.table(
            {"o_orderkey": pa.array(key, pa.int64()),
             "o_orderpriority": pa.array(pr, pa.string()),
             "pct_rank": pa.array(pct, pa.float64()),
             "cume_dist": pa.array(cume, pa.float64())}
        )

    return hash_partitioned(
        ds.map_batches(shape, batch_format="pyarrow"),
        lambda t: [hash_str64(t["o_orderpriority"].to_pylist())],
        rank_part,
        num_parts=8,
    ).sort(["o_orderpriority", "o_orderkey"])


# ---- grouped INTERPOLATED quantiles (quantile_cont / percentile_cont) ----
def q_priority_price_quartiles_cont(sf_dir: str) -> rd.Dataset:
    """Per-priority INTERPOLATED order-price quartiles — the
    ``quantile_cont`` / ``percentile_cont`` semantics the discrete
    quartile queries (quantile_disc gathers) cannot produce: position
    q*(n-1) splits into a floor index and a fraction, and the value is
    lo + (hi-lo)*frac.  With cent-integers and quarter fractions every
    intermediate double is exact (frac in {0,.25,.5,.75}; (hi-lo)*frac is
    a divide-by-power-of-two), so the interpolated doubles are
    bit-identical to DuckDB's and the hash gate needs no tolerance.

    Scale shape: same one-shuffle grouped-order-statistics plan as
    customer_price_quartiles — hash partition by group, one lexsort, six
    vectorized gathers (lo and hi per quartile)."""
    from monocator_ray.hashing import hash_str64
    from monocator_ray.stages.grouped import hash_partitioned, run_boundaries

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    _OUT = pa.schema(
        [("o_orderpriority", pa.string()), ("n_orders", pa.int64()),
         ("q25_cents", pa.float64()), ("q50_cents", pa.float64()),
         ("q75_cents", pa.float64())]
    )

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderpriority": t["o_orderpriority"],
                         "cents": _cents(t["o_totalprice"])})

    def cont_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        pr = g["o_orderpriority"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, pr))
        pr, cents = pr[order], cents[order]
        starts, ends = run_boundaries(pr)
        counts = (ends - starts).astype(np.int64)
        cols: dict[str, object] = {
            "o_orderpriority": pa.array(pr[starts], pa.string()),
            "n_orders": pa.array(counts, pa.int64()),
        }
        for name, q in (("q25_cents", 0.25), ("q50_cents", 0.50),
                        ("q75_cents", 0.75)):
            pos = q * (counts - 1)          # exact: q is a quarter
            i = np.floor(pos).astype(np.int64)
            frac = pos - i                   # in {0, .25, .5, .75}, exact
            lo = cents[starts + i].astype(np.float64)
            hi = cents[starts + np.minimum(i + 1, counts - 1)].astype(np.float64)
            cols[name] = pa.array(lo + (hi - lo) * frac, pa.float64())
        return pa.table(cols)

    return hash_partitioned(
        ds.map_batches(shape, batch_format="pyarrow"),
        lambda t: [hash_str64(t["o_orderpriority"].to_pylist())],
        cont_part,
        num_parts=8,
    ).sort("o_orderpriority")


# ---- orders: per-group TOP-K over a many-group key (combiner prune) ----
def q_top_orders_per_customer(sf_dir: str) -> rd.Dataset:
    """Top-3 orders per CUSTOMER (``ROW_NUMBER() <= 3``) — per-group top-k
    over a many-group key (150k customers at sf1, vs order_rank's 5
    priorities), which is exactly the shape where a combiner matters: a
    group's global top-3 is a subset of the union of its per-batch top-3s
    (selection by a fixed order is monotone under subsetting), so a
    batch-local prune runs BEFORE the shuffle and the exchange carries at
    most 3 rows per (customer, batch) instead of every order.  The final
    per-partition pass repeats the same vectorized lexsort + run-offset
    rank; prices ride as integer cents and the window ORDER BY uses the
    same cents on the oracle side so tie order is pinned on both."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": pc.cast(t["o_custkey"], pa.int64()),
             "o_orderkey": t["o_orderkey"],
             "price_cents": _cents(t["o_totalprice"])}
        )

    def _topk(t: pa.Table, emit_rank: bool) -> pa.Table:
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        cents = t["price_cents"].to_numpy(zero_copy_only=False)
        key = t["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -cents, cust))
        cust, cents, key = cust[order], cents[order], key[order]
        starts, ends = run_boundaries(cust)
        pos = np.arange(len(cust), dtype=np.int64)
        rank = pos - np.repeat(starts, ends - starts) + 1
        keep = rank <= 3
        cols = {
            "o_custkey": pa.array(cust[keep], pa.int64()),
            "o_orderkey": pa.array(key[keep], pa.int64()),
            "price_cents": pa.array(cents[keep], pa.int64()),
        }
        if emit_rank:
            cols["rnk"] = pa.array(rank[keep], pa.int64())
        return pa.table(cols)

    pruned = ds.map_batches(shape, batch_format="pyarrow").map_batches(
        lambda t: _topk(t, emit_rank=False), batch_format="pyarrow"
    )
    return hash_partitioned(
        pruned,
        lambda t: [t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        lambda t: _topk(t, emit_rank=True),
        num_parts=32,
    ).sort(["o_custkey", "rnk"])


# ---- orders: explicit GROUPING SETS from one finest pass ----
def q_order_grouping_sets(sf_dir: str) -> pa.Table:
    """``GROUP BY GROUPING SETS ((status,priority),(status),(priority),())``
    — the general grouping-sets shape beyond ROLLUP/CUBE's fixed lattices.
    One distributed pass computes the finest (status, priority) level
    (15 groups: per-batch Arrow-C++ partials, driver fold — the
    region_rollup decomposability argument); every coarser set is a
    driver-side re-sum of those O(groups) partials.  Subtotal rows use the
    'ALL' marker (COALESCE'd on the oracle side) so the value hash never
    depends on NULL representation."""
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {"status": t["o_orderstatus"], "priority": t["o_orderpriority"],
             "cents": _cents(t["o_totalprice"])}
        )

    fine = driver_grouped_agg(
        ds.map_batches(shape, batch_format="pyarrow"),
        ["status", "priority"],
        [("cents", "sum"), ("cents", "count")],
        ["status", "priority", "cents", "n_orders"],
    )
    sets = [fine]
    by_status = fine.groupby("status", as_index=False)[["cents", "n_orders"]].sum()
    by_status["priority"] = "ALL"
    sets.append(by_status)
    by_prio = fine.groupby("priority", as_index=False)[["cents", "n_orders"]].sum()
    by_prio["status"] = "ALL"
    sets.append(by_prio)
    sets.append(pd.DataFrame({"status": ["ALL"], "priority": ["ALL"],
                              "cents": [fine["cents"].sum()],
                              "n_orders": [fine["n_orders"].sum()]}))
    cols = ["status", "priority", "n_orders", "cents"]
    out = (pd.concat([s[cols] for s in sets], ignore_index=True)
           .sort_values(["status", "priority"]).reset_index(drop=True))
    out["n_orders"] = out["n_orders"].astype("int64")
    out["cents"] = out["cents"].astype("int64")
    return pa.Table.from_pandas(out[cols], preserve_index=False)


# ---- lineitem: grouped linear regression (slope/intercept/r2) ----
def q_lineitem_regression(sf_dir: str) -> pa.Table:
    """Per-return-flag least-squares regression of extended price (floor
    dollars) on quantity — ``regr_slope / regr_intercept / regr_r2``
    computed the distributed way: the SAME exact-int64 sufficient
    statistics as corr_stats (mergeable per-batch partials, shuffle-free),
    folded to arbitrary-precision Python ints on the driver, with the
    float division LAST.  Both sides evaluate the identical IEEE
    expression over identical integers-cast-to-double (float(num) /
    float(den), then (sy - slope*sx)/n, then cov²/(varx*vary)), so the
    doubles are bit-identical and the oracle hash needs no tolerance —
    DuckDB's own regr_* (streaming float co-moments) would NOT reproduce
    this, which is why the oracle spells out the formula."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(batch["l_quantity"]), pa.int64())
        # FLOOR, not ROUND: Arrow half-to-even vs DuckDB half-away (the
        # corr_stats quirk) — floor is identical on both sides
        y = pc.cast(pc.floor(batch["l_extendedprice"]), pa.int64())
        t = pa.table(
            {"l_returnflag": batch["l_returnflag"], "x": x, "y": y,
             "xx": pc.multiply(x, x), "yy": pc.multiply(y, y),
             "xy": pc.multiply(x, y)}
        )
        g = t.group_by(["l_returnflag"]).aggregate(
            [("x", "count"), ("x", "sum"), ("y", "sum"),
             ("xx", "sum"), ("yy", "sum"), ("xy", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "n", "sx", "sy", "sxx", "syy", "sxy"]
        )

    pdf = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .to_pandas()  # bounded: O(blocks x 3 flags) moment partials
        .groupby("l_returnflag", as_index=False)
        .sum()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    rows = {"l_returnflag": [], "n": [], "slope": [], "intercept": [], "r2": []}
    for _, r in pdf.iterrows():
        # Python ints: n*sxy overflows int64 past ~sf0.3, so the fold is
        # arbitrary-precision (the SQL side uses HUGEINT for the same reason)
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxx, syy, sxy = int(r["sxx"]), int(r["syy"]), int(r["sxy"])
        cov = float(n * sxy - sx * sy)
        varx = float(n * sxx - sx * sx)
        vary = float(n * syy - sy * sy)
        slope = cov / varx
        rows["l_returnflag"].append(r["l_returnflag"])
        rows["n"].append(n)
        rows["slope"].append(slope)
        rows["intercept"].append((float(sy) - slope * float(sx)) / float(n))
        rows["r2"].append((cov * cov) / (varx * vary))
    return pa.table(
        {"l_returnflag": pa.array(rows["l_returnflag"], pa.string()),
         "n": pa.array(rows["n"], pa.int64()),
         "slope": pa.array(rows["slope"], pa.float64()),
         "intercept": pa.array(rows["intercept"], pa.float64()),
         "r2": pa.array(rows["r2"], pa.float64())}
    )


# ---- events: LEAD + NTH_VALUE windows (forward-looking family) ----
def q_event_lead(sf_dir: str) -> rd.Dataset:
    """``LEAD(type)``, ``LEAD(value, 2)`` and ``NTH_VALUE(value, 3)`` OVER
    (PARTITION BY user ORDER BY ts, event_id) — the forward-looking window
    family complementing LAG (event_gaps) and FIRST/LAST_VALUE
    (user_first_last).  One hash partition by user brings each timeline to
    one worker; one lexsort ranks every run at once; leads are pure index
    shifts guarded by within-run offsets and NTH_VALUE(3) is a gather at
    run_start+2 masked to rows at offset >= 2 (the ROWS UNBOUNDED
    PRECEDING .. CURRENT ROW frame) — no per-user dispatch.  `value`
    doubles pass through untouched, so hashes match bit-exactly."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    _OUT = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("next_type", pa.string()), ("next2_value", pa.float64()),
         ("third_value", pa.float64())]
    )

    def lead_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        val = g["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, eid, et, val = uid[order], eid[order], et[order], val[order]
        n = len(uid)
        starts, ends = run_boundaries(uid)
        lens = ends - starts
        rep_start = np.repeat(starts, lens)
        rep_len = np.repeat(lens, lens)
        offs = np.arange(n, dtype=np.int64) - rep_start
        ok1 = offs + 1 < rep_len
        ok2 = offs + 2 < rep_len
        ok3 = offs >= 2
        next_type = np.full(n, None, dtype=object)
        next_type[ok1] = et[np.nonzero(ok1)[0] + 1]
        next2 = np.zeros(n, dtype=np.float64)
        next2[ok2] = val[np.nonzero(ok2)[0] + 2]
        third = np.zeros(n, dtype=np.float64)
        third[ok3] = val[(rep_start + 2)[ok3]]
        return pa.table(
            {"event_id": pa.array(eid, pa.int64()),
             "user_id": pa.array(uid, pa.int64()),
             "next_type": pa.array(next_type, pa.string()),
             "next2_value": pa.array(next2, pa.float64(), mask=~ok2),
             "third_value": pa.array(third, pa.float64(), mask=~ok3)}
        )

    return hash_partitioned(
        ds,
        lambda t: [t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        lead_part,
        num_parts=32,
    ).sort("event_id")


# ---- events: HLL approximate distinct users per type (sketch, G6) ----
def q_hll_user_counts(sf_dir: str) -> pa.Table:
    """Approximate distinct users per event type via HyperLogLog —
    the mergeable-sketch distinct shape for when exact count_distinct's
    shuffle is too expensive: each batch folds its users into a p=12
    register array per type (O(4 KB) regardless of rows), the driver
    merges O(blocks x types) blobs with an elementwise max, and the
    estimate is read once per type.  Register-max merging is
    order-independent, so the estimate is parallelism-invariant and the
    pytest pin can assert the exact value against a driver recompute (plus
    a <5% error bound vs the true count).  Rows-only: sketches have no
    SQL analog."""
    from monocator_ray.state.hll import HLL

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def sketch(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        hashes = pd.util.hash_array(uid.astype(np.int64))
        types, blobs = [], []
        for ty in np.unique(et):  # closed 5-value universe, not per-row
            h = HLL(p=12)
            h.add_hashes(hashes[et == ty])
            types.append(str(ty))
            blobs.append(h.dumps())
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "sketch": pa.array(blobs, pa.binary())})

    parts = collect_arrow(ds.map_batches(sketch, batch_format="pyarrow"))  # bounded: O(blocks x event_types) fixed-size HLL blobs
    merged: dict[str, object] = {}
    for i in range(parts.num_rows):
        ty = parts["event_type"][i].as_py()
        h = HLL.loads(parts["sketch"][i].as_py())
        merged[ty] = merged[ty].merge(h) if ty in merged else h
    types = sorted(merged)
    return pa.table(
        {"event_type": pa.array(types, pa.string()),
         "approx_users": pa.array(
             [int(round(merged[t].estimate())) for t in types], pa.int64())}
    )


# ---- orders: relational division (customers active in EVERY year) ----
def q_loyal_customers(sf_dir: str) -> rd.Dataset:
    """Relational division — customers with at least one order in *every*
    year the orders table spans (the "for all" join shape; TODO.MD-era
    SURVEY §2.5 grouped-aggregate family).  Plan: one map pass emits
    per-batch-distinct (custkey, year) pairs (a combiner — output is
    O(customers x years), not O(orders)); the pairs stream materializes
    ONCE (two consumers re-execute the whole upstream otherwise — the
    ngram_novelty lesson); consumer 1 folds the tiny year universe on the
    driver (O(blocks x years) rows); consumer 2 is an exact per-custkey
    ``count_distinct(year)`` via coarse hash partitions.  The division
    itself is then a vectorized filter ``n_years == |universe|`` — no
    all-pairs join of customers x years ever exists."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def pairs(t: pa.Table) -> pa.Table:
        yr = pc.year(t["o_orderdate"])
        return (
            pa.table({"o_custkey": t["o_custkey"],
                      "yr": pc.cast(yr, pa.int64())})
            .group_by(["o_custkey", "yr"])
            .aggregate([])
        )

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow").materialize()

    def batch_years(t: pa.Table) -> pa.Table:
        return pa.table({"yr": pc.unique(t["yr"])})

    universe = collect_arrow(pair_ds.map_batches(batch_years, batch_format="pyarrow"))  # bounded: O(blocks x years) distinct-year partials
    n_years = len(pc.unique(universe["yr"]))

    counts = partitioned_aggregate(
        pair_ds, ["o_custkey"], [("yr", "count_distinct")],
        ["o_custkey", "n_years"], num_parts=32,
    )

    def keep_loyal(t: pa.Table) -> pa.Table:
        # division filter stays distributed: O(customers) never lands on
        # the driver (the caller gets a Dataset to consume/write)
        return t.filter(pc.equal(t["n_years"], pa.scalar(n_years, pa.int64())))

    return counts.map_batches(keep_loyal, batch_format="pyarrow").sort("o_custkey")


# ---- events: latest-record-per-key compaction (arg_max / upsert shape) ----
def q_latest_events(sf_dir: str) -> rd.Dataset:
    """Latest full event row per user (``ROW_NUMBER() OVER (PARTITION BY
    user ORDER BY ts DESC, event_id DESC) = 1``) — the upsert/CDC
    compaction shape: reduce an append-only log to its newest record per
    key.  A per-batch combiner takes the batch-local winner per user
    (output is O(users)/batch, so the shuffle moves winners, not the log);
    one coarse hash partition pass re-runs the identical argmax on the
    survivors.  Winner = lexsort last by (user, ts, event_id) — ties
    break identically on both sides, and ``value`` doubles pass through
    untouched so hashes match bit-exactly."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def local_latest(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        _starts, ends = run_boundaries(uid[order])
        return t.take(pa.array(order[ends - 1], pa.int64()))

    return (
        hash_partitioned(
            ds.map_batches(local_latest, batch_format="pyarrow"),
            lambda t: [t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
            local_latest,
            num_parts=32,
        )
        .sort("user_id")
    )


# ---- events: RANGE-frame time window (INTERVAL 1 HOUR PRECEDING) ----
def q_event_range_window(sf_dir: str) -> rd.Dataset:
    """``SUM(cents) OVER (PARTITION BY user ORDER BY ts RANGE BETWEEN
    INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)`` — the *value*-based frame
    family (vs the ROWS frames of event_moving_avg/event_sliding): each
    row sums every event of the same user whose timestamp lies in
    ``[ts - 1h, ts]``, peers (equal ts) included per SQL RANGE semantics.
    One hash partition per user timeline; per user run the frame bounds
    are two ``searchsorted`` calls against the run's sorted ts (frames are
    [lo, hi) index windows because ts is sorted), and the sum is an exact
    int64 prefix-sum difference — FLOOR cents, so both sides add the same
    integers and the result is tolerance-free."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    HOUR_US = 3_600_000_000

    _OUT = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("hour_cents", pa.int64())]
    )

    def range_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        cents = np.floor(g["value"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, cents = uid[order], ts[order], eid[order], cents[order]
        starts, ends = run_boundaries(uid)
        out = np.empty(len(uid), np.int64)
        # per-run loop (one user timeline per iteration, numpy inside —
        # the local_knn per-list pattern): prefix sums + two searchsorted
        for s, e in zip(starts.tolist(), ends.tolist()):
            t_run = ts[s:e]
            pre = np.concatenate(([0], np.cumsum(cents[s:e])))
            lo = np.searchsorted(t_run, t_run - HOUR_US, side="left")
            hi = np.searchsorted(t_run, t_run, side="right")
            out[s:e] = pre[hi] - pre[lo]
        return pa.table(
            {"event_id": pa.array(eid, pa.int64()),
             "user_id": pa.array(uid, pa.int64()),
             "hour_cents": pa.array(out, pa.int64())}
        )

    return hash_partitioned(
        ds,
        lambda t: [t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        range_part,
        num_parts=32,
    ).sort("event_id")


# ---- gaps-and-islands: longest consecutive-day streak per user ----
def q_user_streaks(sf_dir: str) -> rd.Dataset:
    """Longest run of CONSECUTIVE active days per user — the classic
    gaps-and-islands shape (the SQL needs a ROW_NUMBER difference trick;
    here it is one vectorized diff over each user's sorted distinct days).

    Scale plan: per-batch distinct (user, day) first (Arrow group_by — the
    shuffle then moves at most users x days rows, not events), ONE hash
    partition by user (a user's whole timeline lands in one partition),
    and inside a partition everything is numpy: lexsort, pair-dedup mask,
    island boundaries where the day step != 1, run lengths via reduceat."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    DAY_US = np.int64(86_400_000_000)

    def to_days(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = t["ts"].to_numpy(zero_copy_only=False).view(np.int64) // DAY_US
        part = pa.table({"user_id": pa.array(uid, pa.int64()),
                         "day": pa.array(day, pa.int64())})
        # batch-local distinct before the shuffle
        return part.group_by(["user_id", "day"]).aggregate([])

    _OUT = pa.schema([("user_id", pa.int64()), ("n_active_days", pa.int64()),
                      ("max_streak", pa.int64())])

    def streak_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        day = g["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        keep = np.ones(len(uid), bool)  # cross-batch duplicates of (u, day)
        keep[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])
        uid, day = uid[keep], day[keep]
        new_run = np.ones(len(uid), bool)
        new_run[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1] + 1)
        run_starts = np.nonzero(new_run)[0]
        run_len = np.diff(np.append(run_starts, len(uid)))
        run_user = uid[run_starts]
        ustarts, _ = run_boundaries(run_user)
        return pa.table(
            {
                "user_id": pa.array(run_user[ustarts], pa.int64()),
                "n_active_days": pa.array(np.add.reduceat(run_len, ustarts), pa.int64()),
                "max_streak": pa.array(np.maximum.reduceat(run_len, ustarts), pa.int64()),
            }
        )

    return hash_partitioned(
        ds.map_batches(to_days, batch_format="pyarrow"),
        lambda t: [t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        streak_part,
        num_parts=64,
    ).sort("user_id")


# ---- interval sweep: peak concurrent 5-minute event intervals per type ----
def q_concurrent_sessions(sf_dir: str, dur_min: int = 5) -> pa.Table:
    """Peak number of simultaneously-open intervals [ts, ts+5m) per event
    type — the interval-overlap sweep (max concurrent users / open
    connections).  A +1/-1 boundary sweep needs a GLOBAL time-ordered
    prefix sum; like corpus_shuffle/watermark_windows it decomposes over
    ORDERED buckets: hour buckets give per-bucket partial delta totals
    (pass 1, O(types x hours) driver state), an exclusive prefix sum per
    type seeds each bucket's incoming concurrency, and pass 2 runs the
    within-bucket running sum + max fully distributed.  No global sort.

    Tie semantics match the oracle's ORDER BY t, delta (an interval ending
    at t closes before one opening at t): delta is part of the sort key,
    and a row-frame max equals the oracle's range-frame max because tie
    groups share one (t, delta) key — an all-(+1) group peaks at its end
    (the range value) and an all-(-1) group never exceeds the previous
    group's end."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])
    dur_us = np.int64(dur_min * 60 * 1_000_000)
    HOUR_US = np.int64(3_600_000_000)

    def boundaries(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        et = t["event_type"].combine_chunks() if isinstance(
            t["event_type"], pa.ChunkedArray) else t["event_type"]
        tt = np.concatenate([ts, ts + dur_us])
        delta = np.concatenate([np.ones(len(ts), np.int64), -np.ones(len(ts), np.int64)])
        typ = pa.concat_arrays([et, et]) if isinstance(et, pa.Array) else pa.concat_arrays(et.chunks * 2)
        return pa.table(
            {"event_type": typ,
             "t_us": pa.array(tt, pa.int64()),
             "delta": pa.array(delta, pa.int64()),
             "bucket": pa.array(tt // HOUR_US, pa.int64())}
        )

    bd = ds.map_batches(boundaries, batch_format="pyarrow")
    # pass 1: per-(type, bucket) delta totals -> exclusive prefix sum per type
    totals = driver_grouped_agg(bd, ["event_type", "bucket"], [("delta", "sum")],
                                ["event_type", "bucket", "total"])
    totals = totals.sort_values(["event_type", "bucket"]).reset_index(drop=True)
    grp = totals.groupby("event_type")["total"]
    totals["incoming"] = grp.cumsum() - totals["total"]  # exclusive
    seed = {(r.event_type, int(r.bucket)): int(r.incoming)
            for r in totals.itertuples()}

    _OUT = pa.schema([("event_type", pa.string()), ("peak", pa.int64())])

    def sweep_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        et = np.asarray(g["event_type"].to_pylist())
        t = g["t_us"].to_numpy(zero_copy_only=False)
        d = g["delta"].to_numpy(zero_copy_only=False)
        b = g["bucket"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, t, b, et))
        et, t, d, b = et[order], t[order], d[order], b[order]
        starts, ends = run_boundaries(et, b)
        peaks, types = [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            run = np.cumsum(d[s:e]) + seed[(et[s], int(b[s]))]
            peaks.append(int(run.max()))
            types.append(et[s])
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "peak": pa.array(peaks, pa.int64())})

    def keys(t: pa.Table) -> list[np.ndarray]:
        # hash_str64 from module top: this closure runs ON WORKERS via
        # hash_partitioned — a lazy import there has no repo on sys.path
        return [hash_str64(t["event_type"]),
                t["bucket"].to_numpy(zero_copy_only=False).view(np.uint64)]

    partials = hash_partitioned(bd, keys, sweep_part, num_parts=32)
    pdf = collect_arrow(partials).to_pandas()  # bounded: O(parts x event_types) peak partials
    out = (pdf.groupby("event_type", as_index=False)["peak"].max()
           .rename(columns={"peak": "peak_concurrency"})
           .sort_values("event_type").reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


# ---- CROSS JOIN dimension matrix with zero-filled facts ----
def q_region_year_matrix(sf_dir: str) -> pa.Table:
    """Revenue for EVERY (region, order-year) cell, zero-filled where no
    orders exist — the small-dimension CROSS JOIN + LEFT JOIN shape
    (calendar matrices, coverage reports).  The fact side is one
    distributed pass (per-batch (custkey, yr) partials -> Dataset join to
    customer -> broadcast nation->region probe); the cross product itself
    is O(regions x years) — driver-side by construction, never a shuffle."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()  # bounded: dimension table, 25 rows
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()  # bounded: dimension table, 5 rows
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderdate"])

    def cust_year_partial(batch: pa.Table) -> pa.Table:
        yr = (batch["o_orderdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[Y]").astype(np.int64) + 1970)
        t = pa.table({"o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
                      "yr": pa.array(yr, pa.int64()),
                      "rev_cents": _cents(batch["o_totalprice"])})
        g = t.group_by(["o_custkey", "yr"]).aggregate([("rev_cents", "sum")])
        return g.rename_columns(["o_custkey", "yr", "rev_cents"])

    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = orders.map_batches(cust_year_partial, batch_format="pyarrow").join(
        customer,
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "orders", "customer"),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    fine = driver_grouped_agg(
        joined, ["c_nationkey", "yr"], [("rev_cents", "sum")],
        ["c_nationkey", "yr", "rev_cents"],
    ).rename(columns={"c_nationkey": "nationkey"})
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    fine = fine.merge(dim[["n_nationkey", "r_name"]], left_on="nationkey",
                      right_on="n_nationkey")
    rev = fine.groupby(["r_name", "yr"], as_index=False)["rev_cents"].sum()
    # the cross product: all regions x all years seen in orders
    years = np.sort(rev["yr"].unique())
    grid = pd.MultiIndex.from_product(
        [np.sort(region["r_name"].unique()), years], names=["region", "yr"]
    ).to_frame(index=False)
    out = grid.merge(rev.rename(columns={"r_name": "region"}),
                     on=["region", "yr"], how="left")
    out["rev_cents"] = out["rev_cents"].fillna(0).astype(np.int64)
    out = out.sort_values(["region", "yr"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# ---- ORC-hop parity: same event_windows aggregate through an ORC export ----
_ORC_EXPORTED: set[str] = set()


def q_event_windows_orc(sf_dir: str) -> rd.Dataset:
    """q_event_windows with an ORC hop in the middle — the third
    source-format parity demonstration (CSV and the timestamp-exact IPC
    already have one): events export to worker-sharded ORC
    (sources/csvio.py) and the SAME hourly-window aggregation runs over
    the re-read, matching the parquet-path oracle bit-for-bit.  The
    interesting fidelity edge is the TIMESTAMP column: ORC widens us->ns
    on read, and the pinned read schema casts it back (exact below the
    ns-overflow year).  PID-keyed once-per-process staging like the CSV
    hop; on a multi-node deployment set MONOCATOR_CSV_DIR to a shared
    path (same locality note as q_token_stats_csv)."""
    import os
    import shutil

    from monocator_ray.sources.csvio import export_orc, read_orc_dir

    ensure_shipped()
    base = os.environ.get("MONOCATOR_CSV_DIR", "/tmp")
    out = os.path.join(
        base,
        f"monocator_orc_events_{os.getpid()}_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    if out not in _ORC_EXPORTED:
        from monocator_ray.sources.csvio import cleanup_stale_staging

        cleanup_stale_staging(base, "monocator_orc_events_", out)
        shutil.rmtree(out, ignore_errors=True)
        export_orc(_read(sf_dir, "events", ["event_type", "ts"]), out).materialize()
        _ORC_EXPORTED.add(out)
    schema = pa.schema([("event_type", pa.string()), ("ts", pa.timestamp("us"))])
    ds = read_orc_dir(out, schema=schema)

    def wnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": pc.floor_temporal(batch["ts"], unit="hour"),
            }
        )

    return (
        ds.map_batches(wnd, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"))
        .sort(["event_type", "window_start"])
    )


_AVRO_EXPORTED: set[str] = set()


def q_events_avro(sf_dir: str) -> rd.Dataset:
    """The events-table user/value rollup through an AVRO hop — the fourth
    source-format parity demonstration (CSV, IPC and ORC have one each):
    (event_id, user_id, ts, event_type, value) exports to worker-sharded
    self-indexed Avro OCF files (sources/avro.py — zigzag varints, deflate
    codec, the vectorized lockstep decoder) and the SAME per-(user,
    event_type) aggregation runs over the re-read, matching the
    parquet-path oracle bit-for-bit.  The fidelity edges this pins through
    a real pipeline: timestamp-micros logical-type round trip, double wire
    format, nullable-union handling, and exact-integer cents derived from
    doubles that crossed the hop.  Same PID-keyed once-per-process staging
    as the CSV/ORC hops (MONOCATOR_CSV_DIR on multi-node)."""
    import os
    import shutil

    from monocator_ray.sources.avro import export_avro, read_avro_dir

    ensure_shipped()
    base = os.environ.get("MONOCATOR_CSV_DIR", "/tmp")
    out = os.path.join(
        base,
        f"monocator_avro_events_{os.getpid()}_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    if out not in _AVRO_EXPORTED:
        from monocator_ray.sources.csvio import cleanup_stale_staging

        cleanup_stale_staging(base, "monocator_avro_events_", out)
        shutil.rmtree(out, ignore_errors=True)
        export_avro(
            _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"]),
            out,
        ).materialize()
        _AVRO_EXPORTED.add(out)
    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("event_type", pa.string()),
            ("value", pa.float64()),
        ]
    )
    ds = read_avro_dir(out, schema=schema)

    def agg_prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64()
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "cents": cents,
                "ts": batch["ts"],
            }
        )

    return (
        ds.map_batches(agg_prep, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(
            Count(alias_name="n"),
            Sum("cents", alias_name="sum_cents"),
            Max("ts", alias_name="last_ts"),
        )
        .sort(["user_id", "event_type"])
    )


# ---- GROUPS-mode window frame (1 peer-group preceding + current) ----
def q_event_groups_frame(sf_dir: str) -> rd.Dataset:
    """Per event: the summed cents of its own DAY group plus the user's
    previous active day — the GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW
    window frame (ROWS and RANGE frames are covered elsewhere; GROUPS is
    the third T.61x frame mode, where the unit is the ORDER-BY peer group).
    DuckDB has no GROUPS mode yet, so the oracle is the standard rewrite:
    per-(user, day) sums + LAG over distinct days, joined back to events.

    Scale plan: ONE user-hash partition pass; inside a partition the
    per-day sums, the previous-day lookup and the per-row scatter are all
    numpy over the sorted run — no second shuffle, no join back (a user's
    events and their day groups are co-resident by construction)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    DAY_US = np.int64(86_400_000_000)

    def prep(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        cents = pc.cast(pc.floor(pc.multiply(t["value"], pa.scalar(100.0))),
                        pa.int64())
        return pa.table(
            {"event_id": t["event_id"],
             "user_id": t["user_id"],
             "day": pa.array(ts // DAY_US, pa.int64()),
             "cents": cents}
        )

    _OUT = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                      ("twoday_cents", pa.int64())])

    def frame_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        day = g["day"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid))
        eid, uid, day, cents = eid[order], uid[order], day[order], cents[order]
        starts, ends = run_boundaries(uid, day)  # one run per (user, day)
        cum = np.concatenate([[0], np.cumsum(cents)])
        day_sum = cum[ends] - cum[starts]
        # previous peer group within the same user: shift unless the user
        # changes between runs
        prev = np.zeros(len(day_sum), np.int64)
        if len(day_sum) > 1:
            same_user = uid[starts[1:]] == uid[starts[:-1]]
            prev[1:] = np.where(same_user, day_sum[:-1], 0)
        per_run = day_sum + prev
        out = np.repeat(per_run, ends - starts)
        return pa.table({"event_id": pa.array(eid, pa.int64()),
                         "user_id": pa.array(uid, pa.int64()),
                         "twoday_cents": pa.array(out, pa.int64())})

    return hash_partitioned(
        ds.map_batches(prep, batch_format="pyarrow"),
        lambda t: [t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        frame_part,
        num_parts=32,
    ).sort("event_id")


# ---- skyline / Pareto-maxima (local-skyline combiner -> driver merge) ----
def _skyline_2d(n: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Indices of the 2-D maxima (points no other point strictly dominates:
    >= on both axes, > on one).  Vectorized: sort desc by (n, t); within an
    equal-n group only the max-t points survive (a same-n point with
    bigger t dominates); a group's survivors survive globally iff their t
    strictly exceeds the best t of all STRICTLY-greater-n groups.  Exact
    duplicates all survive (neither strictly dominates the other)."""
    order = np.lexsort((-t, -n))
    ns, ts = n[order], t[order]
    starts, ends = run_boundaries(ns)
    gmax = np.maximum.reduceat(ts, starts)
    # best t among groups with strictly larger n (groups sorted n desc)
    prev_best = np.full(len(gmax), np.iinfo(np.int64).min, np.int64)
    if len(gmax) > 1:
        np.maximum.accumulate(gmax[:-1], out=prev_best[1:])
    keep_group = gmax > prev_best
    keep = np.zeros(len(ns), bool)
    for gi, (s, e) in enumerate(zip(starts.tolist(), ends.tolist())):
        if keep_group[gi]:
            keep[s:e] = ts[s:e] == gmax[gi]
    return order[keep]


def q_skyline_customers(sf_dir: str) -> pa.Table:
    """Pareto-optimal customers on (n_orders, total spend) — the SKYLINE
    operator.  Distribution uses the skyline combiner property: the global
    skyline is a subset of the union of per-partition local skylines (a
    globally-undominated point is undominated inside its own partition),
    so each partition reduces its customers to a tiny candidate set and
    the driver merges O(parts x skyline) rows — never the full customer
    table.  Integer stats keep the oracle hash-exact."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
                      "cents": _cents(batch["o_totalprice"])})
        g = t.group_by(["o_custkey"]).aggregate([("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["custkey", "tot_cents", "n_orders"])

    _OUT = pa.schema([("custkey", pa.int64()), ("n_orders", pa.int64()),
                      ("tot_cents", pa.int64())])

    def local_skyline(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        t = g.group_by(["custkey"]).aggregate(
            [("tot_cents", "sum"), ("n_orders", "sum")]
        ).rename_columns(["custkey", "tot_cents", "n_orders"])
        ck = t["custkey"].to_numpy(zero_copy_only=False)
        tc = t["tot_cents"].to_numpy(zero_copy_only=False)
        no = t["n_orders"].to_numpy(zero_copy_only=False)
        idx = _skyline_2d(no, tc)
        return pa.table({"custkey": pa.array(ck[idx], pa.int64()),
                         "n_orders": pa.array(no[idx], pa.int64()),
                         "tot_cents": pa.array(tc[idx], pa.int64())})

    cand = hash_partitioned(
        ds.map_batches(partial, batch_format="pyarrow"),
        lambda t: [t["custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        local_skyline,
        num_parts=32,
    )
    pdf = collect_arrow(cand).to_pandas()  # bounded: O(parts x skyline size) local skyline candidates
    idx = _skyline_2d(pdf["n_orders"].to_numpy(np.int64),
                      pdf["tot_cents"].to_numpy(np.int64))
    out = pdf.iloc[np.sort(idx)].sort_values("custkey").reset_index(drop=True)
    return pa.Table.from_pandas(out[["custkey", "n_orders", "tot_cents"]],
                                preserve_index=False)


# ---- data-quality audit (deequ/dbt-test family): one-row violation counts ----
def q_integrity_audit(sf_dir: str) -> pa.Table:
    """Constraint-violation counts over the warehouse tables — the data-
    quality-check family (uniqueness, referential integrity, value
    bounds) as ONE distributed pass per check: orphan counts via native
    left_anti joins (probe side pre-reduced to distinct keys, the
    parts_never_bulk shape), duplicate keys via partitioned count>1,
    bounds via a streaming filter-count.  Clean synthetic tables audit to
    zeros — like seen_except_frontier, the ==0 result IS the check."""
    # ONE orders scan shared by its three consumers (orphan-orders probe,
    # order-key distinct, bounds check) — a lazy Dataset re-executes the
    # parquet read per consumer, so materialize the 3-column projection
    # into the object store once (VERDICT r3 "what's wrong" #1 fuse; the
    # blocks spill under pressure, and 3 columns of orders is the same
    # data each pass would have re-decoded anyway)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"]).materialize()
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey"])

    # customer: ONE count-per-key aggregation serves BOTH checks that used
    # to each re-scan customer — its distinct keys are the referential
    # probe side, its count>1 rows are the uniqueness violations
    cust_counts = partitioned_aggregate(
        _read(sf_dir, "customer", ["c_custkey"]),
        ["c_custkey"], [("c_custkey", "count")], ["c_custkey", "n"],
        num_parts=16,
    ).materialize()
    dup_customers = cust_counts.filter(expr="n > 1").count()

    # referential integrity: orders -> customer, lineitem -> orders
    orphan_orders = orders.select_columns(["o_custkey"]).join(
        cust_counts.drop_columns(["n"]), join_type="left_anti",
        num_partitions=_join_parts(sf_dir, "orders", "customer"),
        on=("o_custkey",), right_on=("c_custkey",),
    ).count()
    order_keys = partitioned_aggregate(
        orders, ["o_orderkey"], [("o_orderkey", "count")],
        ["o_orderkey", "_n"], num_parts=16,
    ).drop_columns(["_n"])
    orphan_lineitems = lineitem.join(
        order_keys, join_type="left_anti",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("l_orderkey",), right_on=("o_orderkey",),
    ).count()
    # bounds: non-positive or null prices (reads the materialized blocks)
    def bad_price(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"]
        bad = pc.sum(pc.cast(
            pc.or_kleene(pc.is_null(v), pc.less_equal(v, pa.scalar(0.0))),
            pa.int64()), min_count=0)
        return pa.table({"n": pa.array([bad.as_py() or 0], pa.int64())})

    bad_prices = int(orders.map_batches(bad_price, batch_format="pyarrow")
                     .to_pandas()["n"].sum())  # bounded: O(blocks) one-scalar partials
    return pa.table({
        "n_orphan_orders": pa.array([orphan_orders], pa.int64()),
        "n_orphan_lineitems": pa.array([orphan_lineitems], pa.int64()),
        "n_dup_customers": pa.array([dup_customers], pa.int64()),
        "n_bad_prices": pa.array([bad_prices], pa.int64()),
    })


# ---- window frame EXCLUDE CURRENT ROW (peer statistics) ----
def q_order_peer_stats(sf_dir: str) -> rd.Dataset:
    """Per order: the summed cents and count of the customer's OTHER
    orders — the window EXCLUDE CURRENT ROW frame clause (peer/leave-one-
    out statistics; the last T.61x frame feature not yet covered: ROWS /
    RANGE / GROUPS frames all have queries).  Decomposable exactly:
    peer_sum = group_sum - own, n_peers = group_n - 1, so ONE user-hash
    partition pass with a per-run sum + vectorized subtraction — no
    per-row window evaluation.  Single-order customers get peer_cents 0
    (the oracle COALESCEs SQL's empty-frame NULL)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": t["o_orderkey"],
             "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
             "cents": _cents(t["o_totalprice"])}
        )

    _OUT = pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                      ("peer_cents", pa.int64()), ("n_peers", pa.int64())])

    def peers_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        ok = g["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = g["o_custkey"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="mergesort")
        ok, ck, cents = ok[order], ck[order], cents[order]
        starts, ends = run_boundaries(ck)
        cum = np.concatenate([[0], np.cumsum(cents)])
        gsum = np.repeat(cum[ends] - cum[starts], ends - starts)
        gn = np.repeat(ends - starts, ends - starts)
        return pa.table(
            {"o_orderkey": pa.array(ok, pa.int64()),
             "o_custkey": pa.array(ck, pa.int64()),
             "peer_cents": pa.array(gsum - cents, pa.int64()),
             "n_peers": pa.array(gn - 1, pa.int64())}
        )

    return hash_partitioned(
        ds.map_batches(prep, batch_format="pyarrow"),
        lambda t: [t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        peers_part,
        num_parts=32,
    ).sort("o_orderkey")


# ---- sliding-window order statistic: 5-event moving median ----
def q_event_moving_median(sf_dir: str, k: int = 5) -> rd.Dataset:
    """Per event: the DISCRETE median of the user's last ``k`` event values
    (cents) — the sliding ORDER-STATISTIC window (robust-stats cousin of
    event_moving_avg's sliding sum; quantile_disc semantics idx =
    ceil(q*n)-1, the customer_median_order convention, so everything stays
    integer-exact).  One user-hash partition pass; inside, each user run
    builds its (n, k) sentinel-padded stride matrix, one vectorized row
    sort, and a per-row index pick by window length — no per-row window
    re-evaluation."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    SENT = np.iinfo(np.int64).max

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": t["event_id"],
             "user_id": t["user_id"],
             "ts_us": pa.array(
                 t["ts"].to_numpy(zero_copy_only=False).view(np.int64), pa.int64()),
             "cents": pc.cast(pc.floor(pc.multiply(t["value"], pa.scalar(100.0))),
                              pa.int64())}
        )

    _OUT = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                      ("med5_cents", pa.int64())])

    def med_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        eid, uid, cents = eid[order], uid[order], cents[order]
        starts, ends = run_boundaries(uid)
        out = np.empty(len(eid), np.int64)
        for s, e in zip(starts.tolist(), ends.tolist()):
            v = cents[s:e]
            n = len(v)
            # (n, k) trailing-window matrix, +inf sentinel pads short rows
            idx = np.arange(n)[:, None] - np.arange(k - 1, -1, -1)[None, :]
            win = np.where(idx >= 0, v[np.clip(idx, 0, None)], SENT)
            win.sort(axis=1)
            wlen = np.minimum(np.arange(1, n + 1), k)
            pick = np.ceil(wlen / 2).astype(np.int64) - 1
            # +max sentinels sort to the END, so the real window occupies
            # the FIRST wlen columns and the pick needs no shift
            out[s:e] = win[np.arange(n), pick]
        return pa.table({"event_id": pa.array(eid, pa.int64()),
                         "user_id": pa.array(uid, pa.int64()),
                         "med5_cents": pa.array(out, pa.int64())})

    return hash_partitioned(
        ds.map_batches(prep, batch_format="pyarrow"),
        lambda t: [t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        med_part,
        num_parts=32,
    ).sort("event_id")


# ---- market-basket co-occurrence: within-group pair generation ----
def q_part_cooccurrence(sf_dir: str) -> rd.Dataset:
    """Part pairs bought together in >= 2 orders — the market-basket
    co-occurrence shape ("frequently bought together").  The SQL spelling
    is a within-order self-join; the engine never joins: one hash
    partition by order co-locates each basket, pairs are generated
    VECTORIZED inside the partition (for the r-th item of a basket, its
    pair partners are the basket's first r-1 items — repeat/arange
    arithmetic, no Python loop over baskets), partial-counted by packed
    int64 pair code, then a second hash partition by pair code combines
    counts and applies the support filter DISTRIBUTED.

    Scale shape: pair volume is sum(k^2/2) over basket sizes k — bounded
    by the basket cap (TPC-H: k <= 7), never by the table; both shuffles
    move pre-aggregated (code, n) partials only.  Skew: the pair-code
    hash is uniform, so the combine stage has no hot keys even when one
    part is in every basket."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    _PART = pa.schema([("code", pa.int64()), ("n", pa.int64())])

    def pairs_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PART.empty_table()
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        # DISTINCT (order, part): a part twice in one basket is one pair arm
        keep = np.ones(len(ok), dtype=bool)
        keep[1:] = (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])
        ok, pk = ok[keep], pk[keep]
        starts, ends = run_boundaries(ok)
        n = ends - starts
        # local index j of each row within its basket; row r pairs as the
        # RIGHT arm with the j rows before it (same basket, smaller part —
        # the sort made within-basket partkeys ascending and distinct)
        j = np.arange(len(ok)) - np.repeat(starts, n)
        total = int(j.sum())
        if total == 0:
            return _PART.empty_table()
        right = np.repeat(np.arange(len(ok)), j)
        # left arms of row r = its basket start + (0 .. j-1)
        intra = np.arange(total) - np.repeat(np.cumsum(j) - j, j)
        left = np.repeat(np.repeat(starts, n), j) + intra
        code = pk[left] * np.int64(1) * (np.int64(1) << np.int64(32)) + pk[right]
        uc, cnt = np.unique(code, return_counts=True)
        return pa.table({"code": pa.array(uc, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    partials = hash_partitioned(
        ds,
        lambda t: [t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        pairs_part,
        num_parts=32,
    )

    _OUT = pa.schema([("p1", pa.int64()), ("p2", pa.int64()), ("n", pa.int64())])

    def combine_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        g = t.group_by("code").aggregate([("n", "sum")])
        code = g["code"].to_numpy(zero_copy_only=False)
        n = g["n_sum"].to_numpy(zero_copy_only=False)
        m = n >= 2  # support filter, applied distributed
        code, n = code[m], n[m]
        return pa.table({"p1": pa.array(code >> 32, pa.int64()),
                         "p2": pa.array(code & 0xFFFFFFFF, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    out = hash_partitioned(
        partials,
        lambda t: [t["code"].to_numpy(zero_copy_only=False).view(np.uint64)],
        combine_part,
        num_parts=32,
    )
    return out.sort(["p1", "p2"])


# ---- set operations: INTERSECT / EXCEPT as a one-shuffle bitmask ----
def q_customer_year_setops(sf_dir: str) -> rd.Dataset:
    """Customers who ordered in 1996, 1997, or both — INTERSECT and both
    EXCEPTs of the two year-sets in ONE pass.  The SQL spelling runs
    three set operations over two DISTINCT subqueries; the engine tags
    each row with a side bit (1996 -> 1, 1997 -> 2), pre-ORs the bits per
    customer inside each batch, hash-partitions by customer once, and
    ORs again: 3 = 'both' (INTERSECT), 1/2 = the EXCEPT sides.  Set ops
    of any arity reduce to this k-bit mask with ONE shuffle total.

    Scale shape: batch-level combine bounds shuffle rows at
    O(blocks x distinct customers-per-block); the mask OR is exact under
    any partitioning/arrival order (commutative, idempotent)."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    _P = pa.schema([("o_custkey", pa.int64()), ("bit", pa.int64())])

    def tag_part(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        bit = np.where(y == 1996, 1, np.where(y == 1997, 2, 0)).astype(np.int64)
        m = bit > 0
        ck, bit = ck[m], bit[m]
        if not len(ck):
            return _P.empty_table()
        order = np.argsort(ck, kind="stable")
        ck, bit = ck[order], bit[order]
        starts, ends = run_boundaries(ck)
        acc = np.bitwise_or.reduceat(bit, starts)
        return pa.table({"o_custkey": pa.array(ck[starts], pa.int64()),
                         "bit": pa.array(acc, pa.int64())})

    _OUT = pa.schema([("o_custkey", pa.int64()), ("op", pa.string())])
    _OPS = np.array(["", "1996_only", "1997_only", "both"], dtype=object)

    def mask_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        bit = t["bit"].to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        ck, bit = ck[order], bit[order]
        starts, ends = run_boundaries(ck)
        acc = np.bitwise_or.reduceat(bit, starts)
        return pa.table({"o_custkey": pa.array(ck[starts], pa.int64()),
                         "op": pa.array(_OPS[acc], pa.string())})

    out = hash_partitioned(
        ds.map_batches(tag_part, batch_format="pyarrow"),
        lambda t: [t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        mask_part,
        num_parts=32,
    )
    return out.sort("o_custkey")


# ---- key-space coverage audit: gap counts per fixed-width id bucket ----
def q_orderkey_gaps(sf_dir: str) -> pa.Table:
    """Per 1024-wide bucket of the order-id space [0, max]: how many ids
    have NO high-value order (o_totalprice >= 300000) — the sequence-gap /
    coverage-audit shape (missing ids, unassigned ranges).  No sort and
    no neighbor exchange: buckets are fixed arithmetic ranges, so a
    grouped count per bucket plus the bucket's own width gives the gap
    count; the global max rides the same one-pass partial (max over
    bucket maxes).  The full bucket grid is rebuilt driver-side so
    all-missing buckets still appear."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    W = 1024

    def part(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        hi = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False) >= 300000 * 100
        b = k // W
        g = pa.table({
            "bucket": pa.array(b, pa.int64()),
            "hi": pa.array(hi.astype(np.int64), pa.int64()),
            "k": pa.array(k, pa.int64()),
        }).group_by("bucket").aggregate([("hi", "sum"), ("k", "max")])
        return g.rename_columns(["bucket", "hi", "kmax"])

    pdf = driver_grouped_agg(ds.map_batches(part, batch_format="pyarrow"),
                             ["bucket"], [("hi", "sum"), ("kmax", "max")],
                             ["bucket", "hi", "kmax"])
    # bounded: O(key_space / W) grid rows — result-sized by definition
    mx = int(pdf["kmax"].max())
    grid = pd.DataFrame({"bucket": np.arange(mx // W + 1, dtype=np.int64)})
    out = grid.merge(pdf[["bucket", "hi"]], on="bucket", how="left").fillna(0)
    width = np.minimum(W, mx + 1 - out["bucket"].to_numpy() * W)
    out["n_missing"] = (width - out["hi"].to_numpy()).astype(np.int64)
    out = out[["bucket", "n_missing"]].sort_values("bucket").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# ---- TPC-H Q5: two-fkey multi-way join with an equality correlation ----
def q_local_supplier_revenue(sf_dir: str) -> pa.Table:
    """Revenue per ASIA nation from lineitems whose SUPPLIER and CUSTOMER
    share the nation, order-year 1996 — full TPC-H Q5, the join shape
    q_nation_revenue's single-fkey chain can't express: lineitem carries
    two independent foreign keys (orderkey -> customer nation via orders,
    suppkey -> supplier nation) correlated by an equality filter.

    100-TB plan: supplier-side nation resolves BATCH-SIDE via a broadcast
    LUT (supplier is a dimension: 10k rows/SF; at warehouse scale the LUT
    is tens of MB — ray.put once, read per actor), and the region filter
    prunes lineitem BEFORE its first shuffle (only ~1/5 of rows survive).
    The surviving fact pre-aggregates per (orderkey, s_nation) — O(orders)
    — before the orders join; the customer join gets a per-(custkey,
    s_nation) pre-aggregate; the correlation filter runs batch-side after
    it.  Exact integer cents x percent throughout."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()  # bounded: dimension table, 25 rows
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()  # bounded: dimension table, 5 rows
    asia = int(region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    asia_nations = set(nation.loc[nation["n_regionkey"] == asia, "n_nationkey"].tolist())
    supplier = pq.read_table(  # bounded: dimension table, 10k rows/SF (broadcast LUT — see docstring)
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    smax = int(pc.max(supplier["s_suppkey"]).as_py())
    slut = np.full(smax + 1, -1, np.int64)
    slut[supplier["s_suppkey"].to_numpy()] = supplier["s_nationkey"].to_numpy()
    slut_ref = ray.put((slut, frozenset(asia_nations)))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    class SuppNation:
        def __init__(self, ref):
            self.slut, self.asia = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
            snat = self.slut[np.clip(sk, 0, len(self.slut) - 1)]
            m = np.isin(snat, list(self.asia))
            t = t.filter(pa.array(m))
            snat = snat[m]
            r = _disc_rev_cpc(t)
            g = pa.table({"l_orderkey": t["l_orderkey"],
                          "s_nat": pa.array(snat, pa.int64()),
                          "r": r}).group_by(["l_orderkey", "s_nat"]).aggregate([("r", "sum")])
            return g.rename_columns(["l_orderkey", "s_nat", "r"])

    rev = partitioned_aggregate(
        li.map_batches(cached_stage(SuppNation, ref=slut_ref), batch_format="pyarrow"),
        ["l_orderkey", "s_nat"], [("r", "sum")], ["l_orderkey", "s_nat", "r"],
        num_parts=32,
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def year_filter(t: pa.Table) -> pa.Table:
        m = pc.equal(pc.year(t["o_orderdate"]), pa.scalar(1996, pa.int64()))
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    j1 = rev.join(
        orders.map_batches(year_filter, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    per_cust = partitioned_aggregate(
        j1.select_columns(["o_custkey", "s_nat", "r"]),
        ["o_custkey", "s_nat"], [("r", "sum")], ["o_custkey", "s_nat", "r"],
        num_parts=32,
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j2 = per_cust.join(
        cust,
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "customer"),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def local_only(t: pa.Table) -> pa.Table:
        m = pc.equal(t["s_nat"], pc.cast(t["c_nationkey"], pa.int64()))
        return t.filter(m).select(["s_nat", "r"])

    pdf = driver_grouped_agg(
        j2.map_batches(local_only, batch_format="pyarrow"),
        ["s_nat"], [("r", "sum")], ["s_nat", "revenue_cpc"],
    )
    names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    pdf["n_name"] = pdf["s_nat"].map(names)
    pdf = pdf[["n_name", "revenue_cpc"]].sort_values(
        ["revenue_cpc", "n_name"], ascending=[False, True]).reset_index(drop=True)
    pdf["revenue_cpc"] = pdf["revenue_cpc"].astype(np.int64)
    return pa.Table.from_pandas(pdf, preserve_index=False)


# ---- running count-distinct: cumulative unique users by day ----
def q_cumulative_users(sf_dir: str) -> pa.Table:
    """Per hour: the cumulative number of DISTINCT users seen so far — the
    growth-curve metric every analytics pipeline runs.  The naive SQL is
    a windowed COUNT(DISTINCT) (quadratic re-scan); the engine reduces it
    to first-seen semantics: one hash partition by user computes each
    user's first-seen hour (min — decomposable), the O(hours) per-hour
    first-seen counts fold on the driver, and a prefix sum over the
    ordered hour grid is the cumulative curve.  Hours with no first-seen
    users still appear (the grid spans min..max first-seen hour).

    Scale shape: the only shuffle carries (user, min_hour) partials
    pre-combined per batch; everything after is O(hours) — result-sized.
    No window, no distinct re-scan."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def first_seen_part(t: pa.Table) -> pa.Table:
        hr = pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.int64())
        g = pa.table({"user_id": t["user_id"], "hr": hr}).group_by(
            "user_id").aggregate([("hr", "min")])
        return g.rename_columns(["user_id", "hr"])

    # per-user global first hour (min re-combines across partitions)
    firsts = partitioned_aggregate(
        ds.map_batches(first_seen_part, batch_format="pyarrow"),
        ["user_id"], [("hr", "min")], ["user_id", "hr"],
        num_parts=32,
    )
    pdf = driver_grouped_agg(
        firsts.map_batches(
            lambda t: pa.table({"hr": t["hr"],
                                "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["hr"], [("one", "sum")], ["hr", "n_new"],
    )
    # bounded: O(hours) grid rows — result-sized by definition
    pdf = pdf.sort_values("hr").reset_index(drop=True)
    lo, hi = int(pdf["hr"].min()), int(pdf["hr"].max())
    us_hr = 3_600_000_000
    grid = pd.DataFrame({"hr": np.arange(lo, hi + us_hr, us_hr, dtype=np.int64)})
    out = grid.merge(pdf, on="hr", how="left").fillna(0)
    out["n_users"] = out["n_new"].cumsum().astype(np.int64)
    out["hour"] = pd.to_datetime(out["hr"], unit="us")
    out = out[["hour", "n_users"]]
    return pa.Table.from_pandas(out, preserve_index=False)


# ---- exact global median by two-pass distributed selection ----
def q_global_median_price(sf_dir: str) -> pa.Table:
    """Exact global median of lineitem's extended price (in cents) WITHOUT
    a global sort: classic two-pass distributed selection.  Pass 1 folds a
    fixed 4096-bin histogram per batch (driver combine is O(bins)); the
    bin containing the target rank is found driver-side; pass 2 collects
    ONLY that bin's values (n/bins rows in expectation, exact under any
    skew bound the histogram reveals) and selects the rank within them.

    Scale shape: pass 1 is a full scan folding O(bins) partials — no
    shuffle at all; pass 2's collect is bounded by the heaviest bin
    (uniform hash-free binning over the value range; a pathological
    single-value column makes the bin == the value, and the early-exit
    answers without collecting).  Versus sort-based medians this moves
    2 x scan instead of 1 x shuffle of every row."""
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    BINS = 4096

    # pass 1: global min/max + histogram in ONE scan (fixed-point bins
    # over the cents domain; min/max ride as two extra partial columns)
    def hist_part(t: pa.Table) -> pa.Table:
        c = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        if not len(c):
            return pa.table({"bin": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        # provisional binning by value // step over the full int64-cents
        # positive domain: prices are bounded by 10^8 cents, step keeps
        # bin count O(BINS) without knowing min/max in advance
        step = max(1, 10**8 // BINS)
        b = c // step
        u, inv = np.unique(b, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        lo = np.full(len(u), c.min(), np.int64)
        hi = np.full(len(u), c.max(), np.int64)
        return pa.table({"bin": pa.array(u, pa.int64()),
                         "n": pa.array(cnt, pa.int64()),
                         "lo": pa.array(lo, pa.int64()),
                         "hi": pa.array(hi, pa.int64())})

    pdf = driver_grouped_agg(
        ds.map_batches(hist_part, batch_format="pyarrow"),
        ["bin"], [("n", "sum"), ("lo", "min"), ("hi", "max")],
        ["bin", "n", "lo", "hi"],
    )  # bounded: O(BINS) rows
    pdf = pdf.sort_values("bin").reset_index(drop=True)
    total = int(pdf["n"].sum())
    target = (total - 1) // 2  # lower median, 0-indexed (quantile_disc 0.5)
    cum = pdf["n"].cumsum().to_numpy()
    bi = int(np.searchsorted(cum, target + 1))
    the_bin = int(pdf["bin"].iloc[bi])
    rank_in_bin = target - (int(cum[bi - 1]) if bi else 0)
    step = max(1, 10**8 // BINS)

    # pass 2: collect ONLY the median bin's values
    def bin_filter(t: pa.Table) -> pa.Table:
        c = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        v = c[c // step == the_bin]
        return pa.table({"v": pa.array(v, pa.int64())})

    vals = collect_arrow(ds.map_batches(bin_filter, batch_format="pyarrow"))  # bounded: one histogram bin — n/BINS rows in expectation (see docstring)
    v = np.sort(vals["v"].to_numpy(zero_copy_only=False))
    med = int(v[rank_in_bin])
    return pa.table({"median_cents": pa.array([med], pa.int64()),
                     "n_rows": pa.array([total], pa.int64())})


# ---- UNPIVOT: wide-to-long over the pivoted per-user count matrix ----
def q_event_unpivot(sf_dir: str) -> rd.Dataset:
    """UNPIVOT — the inverse of q_event_pivot: the wide per-user count
    matrix back to long (user_id, event_type, n) rows, zero counts
    dropped (UNPIVOT's default NULL/absent semantics).  The engine builds
    the same wide matrix (shared machinery: per-batch (user, type)
    partials, one user-hash shuffle) and unpivots INSIDE the partition —
    a pure batch-local reshape (tile/repeat + flatten), no extra shuffle;
    wide-to-long never moves data, only the pivot direction does.

    The round trip (pivot ∘ unpivot == identity on nonzero cells) is what
    the oracle pins: DuckDB UNPIVOTs its own conditional-agg pivot."""
    types = ["click", "error", "purchase", "signup", "view"]
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([("event_type", "count")])
        return g.rename_columns(["user_id", "event_type", "n"])

    _OUT = pa.schema([("user_id", pa.int64()), ("event_type", pa.string()),
                      ("n", pa.int64())])

    def unpivot_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((et, uid))
        uid, et, n = uid[order], et[order], n[order]
        starts, ends = run_boundaries(uid)
        users = uid[starts]
        # wide matrix (the pivot) ...
        mat = np.zeros((len(users), len(types)), dtype=np.int64)
        row = np.repeat(np.arange(len(users)), ends - starts)
        col = pd.Series(et).map({t_: i for i, t_ in enumerate(types)}).to_numpy()
        np.add.at(mat, (row, col), n)
        # ... unpivoted right back: row-major flatten IS the long layout
        long_uid = np.repeat(users, len(types))
        long_type = np.tile(np.asarray(types, dtype=object), len(users))
        long_n = mat.reshape(-1)
        keep = long_n > 0  # UNPIVOT drops absent cells
        return pa.table({"user_id": pa.array(long_uid[keep], pa.int64()),
                         "event_type": pa.array(long_type[keep], pa.string()),
                         "n": pa.array(long_n[keep], pa.int64())})

    return hash_partitioned(
        ds.map_batches(partial, batch_format="pyarrow"),
        lambda t: [t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        unpivot_part,
        num_parts=32,
    ).sort(["user_id", "event_type"])


# ---- TPC-H Q18 shape: large-volume orders (HAVING filter + join chain) ----
def q_large_volume_orders(sf_dir: str) -> rd.Dataset:
    """Orders whose total line quantity exceeds 300, with the ordering
    customer — the TPC-H Q18 plan shape: the HAVING filter runs on the
    PRE-AGGREGATED fact (one (orderkey, sum_qty) row per order, built by
    coarse hash partitions) BEFORE any join, so both joins move only the
    qualifying tail (~0.3%% of orders), never raw lineitem.  Both joins
    are partitioned hash joins (orders and customer are fact-sized at
    scale — no broadcast).  Quantities are integral doubles; exact
    integer sums via round-then-cast on both engines."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty(t: pa.Table) -> pa.Table:
        # per-batch combiner: lineitem has ~4 rows/order, so the shuffle
        # moves ~4x fewer rows (the nation_revenue pattern)
        g = pa.table({"l_orderkey": t["l_orderkey"],
                      "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64())}
                     ).group_by("l_orderkey").aggregate([("qty", "sum")])
        return g.rename_columns(["l_orderkey", "qty"])

    sums = partitioned_aggregate(
        li.map_batches(qty, batch_format="pyarrow"),
        ["l_orderkey"], [("qty", "sum")], ["l_orderkey", "sum_qty"],
        num_parts=32,
    )
    big = sums.filter(expr="sum_qty > 300")

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def ocents(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"],
                         "o_orderdate": t["o_orderdate"],
                         "total_cents": _cents(t["o_totalprice"])})

    j1 = big.join(
        orders.map_batches(ocents, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    j2 = j1.join(
        cust,
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "customer"),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({"c_name": t["c_name"], "c_custkey": t["o_custkey"],
                         "o_orderkey": t["l_orderkey"],
                         "o_orderdate": t["o_orderdate"],
                         "total_cents": t["total_cents"],
                         "sum_qty": t["sum_qty"]})

    return (j2.map_batches(shape, batch_format="pyarrow")
              .sort(["total_cents", "o_orderkey"], descending=[True, False])
              .limit(100))


# ---- TPC-H Q16 shape: distinct supplier count per part type ----
def q_suppliers_per_type(sf_dir: str) -> rd.Dataset:
    """COUNT(DISTINCT supplier) per part type, excluding one brand — the
    TPC-H Q16 shape (distinct-count across a join).  Plan: part is a true
    dimension -> its (partkey -> type) map broadcasts once (brand filter
    applied build-side); each lineitem batch maps partkey -> type and
    emits batch-distinct (p_type, l_suppkey) pairs (combiner: output is
    O(types x suppliers/batch), not O(lineitem)); ONE hash partition on
    the full pair makes local distinct == global distinct; the final
    count per type is an O(blocks x types) driver combine.  The fact
    table never shuffles raw rows."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_type"])  # bounded: dimension table
    keep = pc.invert(pc.equal(part["p_brand"], pa.scalar("Brand#1")))
    part = part.filter(keep)
    pk = part["p_partkey"].to_numpy(zero_copy_only=False)
    lut = _dense_lut(pk, part["p_type"].to_numpy(zero_copy_only=False), "")
    lut_ref = ray.put(lut)

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pairs(t: pa.Table) -> pa.Table:
        lu = ray.get(lut_ref)
        keys = t["l_partkey"].to_numpy(zero_copy_only=False)
        typ = _lut_get(lu, keys)
        m = typ != ""
        g = pa.table({"p_type": pa.array(typ[m], pa.string()),
                      "l_suppkey": pa.array(
                          t["l_suppkey"].to_numpy(zero_copy_only=False)[m],
                          pa.int64())}).group_by(["p_type", "l_suppkey"]).aggregate([])
        return g

    pair_ds = li.map_batches(pairs, batch_format="pyarrow")
    distinct = partitioned_aggregate(
        pair_ds, ["p_type", "l_suppkey"], [("l_suppkey", "count")],
        ["p_type", "l_suppkey", "_n"],
        num_parts=_join_parts(sf_dir, "lineitem"),
    )
    out = driver_grouped_agg(distinct, ["p_type"], [("l_suppkey", "count")],
                             ["p_type", "supplier_cnt"])
    out = out.sort_values(["supplier_cnt", "p_type"],
                          ascending=[False, True], kind="mergesort").reset_index(drop=True)
    return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


# ---- TPC-H Q21 shape: sole-fault suppliers in multi-supplier orders ----
def q_sole_fault_suppliers(sf_dir: str) -> rd.Dataset:
    """Suppliers who were the ONLY supplier with returned ('R') lines in a
    multi-supplier order, counted over such orders — the TPC-H Q21
    EXISTS / NOT-EXISTS double-correlation, expressed as per-order
    grouped flags instead of two self-joins.  Plan: per batch, lineitem
    combines to distinct (orderkey, suppkey, any_R) triples; ONE hash
    partition on orderkey co-locates each order; inside the partition a
    re-combine + run detection computes n_supp / n_fault per order and
    emits culprit suppkeys (order has >1 supplier, exactly 1 faulty);
    the per-supplier count is a second (small) partitioned aggregate.
    lineitem shuffles only as pre-reduced triples."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])

    def triples(t: pa.Table) -> pa.Table:
        r = pc.cast(pc.equal(t["l_returnflag"], pa.scalar("R")), pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"], "r": r}).group_by(
            ["l_orderkey", "l_suppkey"]).aggregate([("r", "max")]).rename_columns(
            ["l_orderkey", "l_suppkey", "r"])

    def culprits(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_suppkey": pa.array([], pa.int64())})
        g = t.group_by(["l_orderkey", "l_suppkey"]).aggregate([("r", "max")])
        ok = g["l_orderkey"].to_numpy(zero_copy_only=False)
        sk = g["l_suppkey"].to_numpy(zero_copy_only=False)
        r = g["r_max"].to_numpy(zero_copy_only=False)
        order = np.argsort(ok, kind="mergesort")
        ok, sk, r = ok[order], sk[order], r[order]
        starts, ends = run_boundaries(ok)
        n_supp = ends - starts
        cum = np.concatenate([[0], np.cumsum(r)])
        n_fault = cum[ends] - cum[starts]
        qual = (n_supp > 1) & (n_fault == 1)
        row_qual = np.repeat(qual, n_supp)
        m = row_qual & (r == 1)
        return pa.table({"l_suppkey": pa.array(sk[m], pa.int64())})

    culprit_ds = hash_partitioned(
        li.map_batches(triples, batch_format="pyarrow"),
        lambda t: [t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        culprits,
        num_parts=_join_parts(sf_dir, "lineitem"),
    )
    counts = partitioned_aggregate(
        culprit_ds, ["l_suppkey"], [("l_suppkey", "count")],
        ["s_suppkey", "numwait"], num_parts=16,
    )
    return counts.sort(["numwait", "s_suppkey"], descending=[True, False]).limit(10)


# ---- TPC-H Q7 shape: trade matrix between supplier and customer nations ----
def q_nation_trade_matrix(sf_dir: str) -> rd.Dataset:
    """Revenue by (supplier nation, customer nation) pair — the TPC-H Q7
    volume-shipping shape: one fact (lineitem) needs BOTH ends of the
    trade, reached through different paths.  Plan: supplier is a true
    dimension -> (suppkey -> nationkey) broadcasts into the revenue
    combiner, which pre-aggregates lineitem to (orderkey, supp_nation,
    revenue) rows; orders joins that (partitioned hash join) to reach
    o_custkey; a second pre-aggregation to (custkey, supp_nation) rows
    keeps the customer join's left side at O(customers x nations) max;
    customer joins (fact-sized at scale); nation names broadcast; the
    O(nations^2) matrix folds on the driver.  Revenue is exact integer
    cents x percent (the q_nation_revenue convention)."""
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])  # bounded: dimension table
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False)
    slut = _dense_lut(sk, supp["s_nationkey"].to_numpy(zero_copy_only=False), np.int64(-1))
    slut_ref = ray.put(slut)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def rev_part(t: pa.Table) -> pa.Table:
        lu = ray.get(slut_ref)
        keys = t["l_suppkey"].to_numpy(zero_copy_only=False)
        snat = _lut_get(lu, keys)
        r = _disc_rev_cpc(t)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "supp_nat": pa.array(snat, pa.int64()),
                         "r": r}).group_by(["l_orderkey", "supp_nat"]).aggregate(
            [("r", "sum")]).rename_columns(["l_orderkey", "supp_nat", "r"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j1 = li.map_batches(rev_part, batch_format="pyarrow").join(
        orders,
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    per_cust = partitioned_aggregate(
        j1.select_columns(["o_custkey", "supp_nat", "r"]),
        ["o_custkey", "supp_nat"], [("r", "sum")],
        ["o_custkey", "supp_nat", "r"],
        num_parts=_join_parts(sf_dir, "orders"),
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j2 = per_cust.join(
        cust,
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "customer"),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()  # bounded: dimension table, 25 rows
    names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    # bounded: O(nations^2) matrix rows
    out = driver_grouped_agg(j2, ["supp_nat", "c_nationkey"], [("r", "sum")],
                             ["supp_nat", "c_nationkey", "revenue_cpc"])
    out["supp_nation"] = out["supp_nat"].map(names)
    out["cust_nation"] = out["c_nationkey"].map(names)
    out = (out[["supp_nation", "cust_nation", "revenue_cpc"]]
           .sort_values(["supp_nation", "cust_nation"], kind="mergesort")
           .reset_index(drop=True))
    return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


# ---- grouped z-score outliers (exact integer cross-multiplication) ----
def q_value_outliers(sf_dir: str) -> rd.Dataset:
    """Events whose value is more than 3 population-sigmas from their
    event type's mean — the grouped anomaly-detection shape, made exact:
    ``(v - s/n)^2 > 9 * (n*q - s^2)/n^2`` cross-multiplies to the pure
    integer test ``(v*n - s)^2 > 9*(n*q - s^2)`` (v = value cents,
    n/s/q = count/sum/sum-of-squares per type), so no float sigma ever
    exists and the oracle hashes bit-identically (DuckDB runs the same
    inequality in HUGEINT).

    Scale shape: (1) per-batch (n, s, q) partials -> O(blocks x types)
    driver combine -> broadcast dict of Python ints (exact, unbounded
    precision); (2) one streaming filter pass; per-type rows use
    object-dtype (arbitrary-precision) arithmetic — the int64 bound on
    (v*n - s)^2 breaks near ~1e5 rows/type, so exactness does not depend
    on the corpus staying small.  sum-of-squares partials are int64-safe
    to ~3e9 rows/type at 5-digit cents; beyond that the partial pass
    would need a HUGEINT-style split (documented bound)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        c = _cents(t["value"])
        return pa.table({"event_id": t["event_id"], "event_type": t["event_type"],
                         "c": c, "c2": pc.multiply(c, c)})

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    g = driver_grouped_agg(prepped, ["event_type"],
                           [("c", "count"), ("c", "sum"), ("c2", "sum")],
                           ["event_type", "n", "s", "q"])
    stats = {r.event_type: (int(r.n), int(r.s), int(r.q)) for r in g.itertuples()}
    stats_ref = ray.put(stats)

    def flag(t: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(et), dtype=bool)
        for typ, (n, s, q) in st.items():
            m = et == typ
            if not m.any():
                continue
            co = c[m].astype(object)  # exact arbitrary-precision ints
            keep[m] = (co * n - s) ** 2 > 9 * (n * q - s * s)
        out = t.filter(pa.array(keep)).select(["event_id", "event_type", "c"])
        return out.rename_columns(["event_id", "event_type", "value_cents"])

    return prepped.map_batches(flag, batch_format="pyarrow").sort("event_id")


# ---- winsorized grouped stats (index-exact percentile clipping) ----
def q_winsorized_value_stats(sf_dir: str) -> rd.Dataset:
    """Per-event-type mean after winsorizing values to the [p05, p95]
    order statistics — the robust-aggregate shape.  The clip bounds are
    INDEX-defined (sorted positions ``(n-1)//20`` and ``19*(n-1)//20``),
    tie-safe and integer-exact, so the SQL oracle selects the same
    elements via ROW_NUMBER arithmetic instead of a quantile function
    whose convention might differ.

    Scale shape: the grouped-order-statistics plan (one hash partition on
    event_type, one lexsort per partition, vectorized gathers + segment
    sums) — same contract as q_priority_price_quartiles_cont."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    _OUT = pa.schema([("event_type", pa.string()), ("n", pa.int64()),
                      ("lo_cents", pa.int64()), ("hi_cents", pa.int64()),
                      ("wsum_cents", pa.int64()), ("wmean_cents", pa.int64())])

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"], "c": _cents(t["value"])})

    def wins_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        et = g["event_type"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((c, et))
        et, c = et[order], c[order]
        starts, ends = run_boundaries(et)
        n = (ends - starts).astype(np.int64)
        lo = c[starts + (n - 1) // 20]
        hi = c[starts + 19 * (n - 1) // 20]
        cw = np.clip(c, np.repeat(lo, n), np.repeat(hi, n))
        cum = np.concatenate([[0], np.cumsum(cw)])
        wsum = cum[ends] - cum[starts]
        return pa.table({"event_type": pa.array(et[starts], pa.string()),
                         "n": pa.array(n, pa.int64()),
                         "lo_cents": pa.array(lo, pa.int64()),
                         "hi_cents": pa.array(hi, pa.int64()),
                         "wsum_cents": pa.array(wsum, pa.int64()),
                         "wmean_cents": pa.array(wsum // n, pa.int64())})

    return hash_partitioned(
        ds.map_batches(shape, batch_format="pyarrow"),
        lambda t: _key_arrays(t, ["event_type"]),
        wins_part,
        num_parts=8,
    ).sort("event_type")


# ---- bitwise OR aggregate: per-user event-type bitmask ----
def q_user_event_bitmask(sf_dir: str) -> rd.Dataset:
    """Per-user bitmask of event types seen (BIT_OR of ``1 << type_idx``)
    plus its popcount — the custom decomposable-aggregate shape: OR is
    associative/commutative/idempotent, so per-batch partial ORs combine
    exactly like sums but with none of pyarrow's built-in kernels;
    segment-OR runs via ``np.bitwise_or.reduceat`` over one lexsort.
    Plan: per-batch partials (O(users/batch) rows out), one hash
    partition, final segment-OR inside the partition."""
    types = ["click", "error", "purchase", "signup", "view"]
    bit = {t_: 1 << i for i, t_ in enumerate(types)}
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def seg_or(uid: np.ndarray, m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        order = np.argsort(uid, kind="mergesort")
        uid, m = uid[order], m[order]
        starts, _ends = run_boundaries(uid)
        return uid[starts], np.bitwise_or.reduceat(m, starts)

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        m = pd.Series(t["event_type"].to_pandas()).map(bit).to_numpy(np.int64)
        u, om = seg_or(uid, m)
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "m": pa.array(om, pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "type_mask": pa.array([], pa.int64()),
                             "n_types": pa.array([], pa.int64())})
        u, om = seg_or(t["user_id"].to_numpy(zero_copy_only=False),
                       t["m"].to_numpy(zero_copy_only=False))
        pop = np.array([int(x).bit_count() for x in om], dtype=np.int64)
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "type_mask": pa.array(om, pa.int64()),
                         "n_types": pa.array(pop, pa.int64())})

    return hash_partitioned(
        ds.map_batches(partial, batch_format="pyarrow"),
        lambda t: _key_arrays(t, ["user_id"]),
        final,
        num_parts=16,
    ).sort("user_id")


# ---- DENSE_RANK-with-ties top-k per group ----
def q_top_orders_with_ties(sf_dir: str) -> rd.Dataset:
    """Orders whose total is among the 3 highest DISTINCT totals of their
    priority — DENSE_RANK() <= 3 semantics, where ties all qualify (the
    rank-with-ties family next to the row_number-based top-k queries).
    Plan: a per-batch combiner keeps only rows at batch-local dense rank
    <= 3 (sound: a value in the global top-3 distinct of its group is in
    the top-3 distinct of every batch it appears in), so the shuffle
    moves O(groups x 3 x batch) rows; the partition pass re-ranks
    exactly."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_totalprice"])

    _SHAPED = pa.schema([("o_orderkey", pa.int64()),
                         ("o_orderpriority", pa.string()),
                         ("cents", pa.int64())])

    def dense_top3(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty partitions arrive as zero-COLUMN blocks
            return _SHAPED.empty_table()
        pr = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-c, pr))
        pr_s, c_s = pr[order], c[order]
        starts, ends = run_boundaries(pr_s)
        # dense rank within each run: count of distinct values seen so far
        new_val = np.ones(len(c_s), dtype=np.int64)
        new_val[1:] = (c_s[1:] != c_s[:-1]) | (pr_s[1:] != pr_s[:-1])
        csum = np.cumsum(new_val)
        rank = csum - np.repeat(csum[starts] - 1, ends - starts)
        keep = order[rank <= 3]
        return t.take(pa.array(np.sort(keep).astype(np.int64)))

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_orderpriority": t["o_orderpriority"],
                         "cents": _cents(t["o_totalprice"])})

    def part_final(t: pa.Table) -> pa.Table:
        r = dense_top3(t)
        return pa.table({"o_orderpriority": r["o_orderpriority"],
                         "o_orderkey": r["o_orderkey"],
                         "total_cents": r["cents"]})

    pre = ds.map_batches(shape, batch_format="pyarrow").map_batches(
        dense_top3, batch_format="pyarrow")
    return hash_partitioned(
        pre,
        lambda t: _key_arrays(t, ["o_orderpriority"]),
        part_final,
        num_parts=8,
    ).sort(["o_orderpriority", "total_cents", "o_orderkey"],
           descending=[False, True, False])


# ---- windowed conditional carry-forward: seconds since last purchase ----
def q_last_purchase_gap(sf_dir: str) -> rd.Dataset:
    """Per event: whole seconds since the same user's most recent EARLIER
    purchase event (frame UNBOUNDED PRECEDING .. 1 PRECEDING over
    (ts, event_id) order; NULL when none) — the windowed conditional
    carry-forward shape: a CASE-masked running MAX that rows of OTHER
    kinds read.  One hash partition per user timeline, one lexsort, one
    masked cummax — no per-user dispatch.  ts is timestamp[us], so the
    gap is the exact integer ``(ts - last_ts) // 1_000_000``."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    _OUT = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                      ("gap_s", pa.int64())])

    def gap_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, et = uid[order], ts[order], eid[order], et[order]
        n = len(uid)
        starts, ends = run_boundaries(uid)
        seg_base = np.repeat(starts, ends - starts)
        # the running MAX(purchase ts) over [run_start, i-1] equals the ts
        # at the POSITIONALLY last preceding purchase (ts is the sort key,
        # so later position => >= ts): a cummax over purchase INDICES
        # shifted by one row, clamped to the row's own run — segmented
        # cummax without any per-run dispatch
        idx = np.arange(n)
        last_purchase_idx = np.where(et == "purchase", idx, -1)
        lp = np.maximum.accumulate(last_purchase_idx)
        lp_prev = np.empty(n, dtype=np.int64)
        lp_prev[1:] = lp[:-1]
        lp_prev[0] = -1
        # clamp to own run: an index before run_start means "none"
        valid = lp_prev >= seg_base
        gap_vals = np.where(valid, (ts - ts[np.maximum(lp_prev, 0)]) // 1_000_000, 0)
        return pa.table({"event_id": pa.array(eid, pa.int64()),
                         "user_id": pa.array(uid, pa.int64()),
                         "gap_s": pa.array(gap_vals, pa.int64(),
                                           mask=~valid)})

    return hash_partitioned(
        ds,
        lambda t: _key_arrays(t, ["user_id"]),
        gap_part,
        num_parts=32,
    ).sort("event_id")


# ---- ratio-to-report: revenue share per nation in exact permille ----
def q_nation_revenue_share(sf_dir: str) -> rd.Dataset:
    """Each customer nation's share of total order revenue in permille —
    the ratio_to_report window shape, made exact: share_pm =
    ``(1000 * nation_cents) // total_cents`` (integer floor division on
    both engines; no float ratio ever exists).  Plan: one partial-sum
    pass over orders (per-batch (custkey-nation?) — customer nation comes
    through the partitioned customer join of the q_nation_revenue
    pattern, here simplified: orders join customer for nationkey, then an
    O(nations) driver combine; the total is the same combine's sum, so
    NO second pass)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def ocents(t: pa.Table) -> pa.Table:
        g = pa.table({"o_custkey": t["o_custkey"],
                      "cents": _cents(t["o_totalprice"])}).group_by(
            "o_custkey").aggregate([("cents", "sum")])
        return g.rename_columns(["o_custkey", "cents"])

    per_cust = partitioned_aggregate(
        orders.map_batches(ocents, batch_format="pyarrow"),
        ["o_custkey"], [("cents", "sum")], ["o_custkey", "cents"],
        num_parts=_join_parts(sf_dir, "orders"),
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = per_cust.join(
        cust,
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "customer"),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()  # bounded: dimension table, 25 rows
    names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    # bounded: O(nations) rows
    per_nat = driver_grouped_agg(j, ["c_nationkey"], [("cents", "sum")],
                                 ["c_nationkey", "revenue_cents"])
    total = int(per_nat["revenue_cents"].sum())
    per_nat["n_name"] = per_nat["c_nationkey"].map(names)
    per_nat["share_pm"] = per_nat["revenue_cents"] * 1000 // max(total, 1)
    out = (per_nat[["n_name", "revenue_cents", "share_pm"]]
           .sort_values("n_name", kind="mergesort").reset_index(drop=True))
    return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


# ---- window over an aggregated table: rank nations within regions ----
def q_nation_rank_in_region(sf_dir: str) -> rd.Dataset:
    """Nations ranked by customer count WITHIN their region (RANK() with
    gap semantics over an AGGREGATED table — the window-over-groupby
    composition).  Plan: customer pre-aggregates per nation (per-batch
    partials -> O(nations) driver combine), nation/region dims broadcast,
    and the rank itself runs driver-side over the O(nations) result —
    the window input is already aggregate-small, so no shuffle exists at
    all beyond the one partial pass."""
    cust = _read(sf_dir, "customer", ["c_nationkey"])
    # bounded: O(blocks x nations) partials
    per_nat = driver_grouped_agg(cust, ["c_nationkey"], [("c_nationkey", "count")],
                                 ["c_nationkey", "n_customers"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()  # bounded: dimension table
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()  # bounded: dimension table
    nat = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    df = per_nat.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    df = df.sort_values(["r_name", "n_customers", "n_name"],
                        ascending=[True, False, True], kind="mergesort")
    # RANK() with gaps: position of the first row sharing this count
    df["rk"] = (df.groupby("r_name")["n_customers"]
                  .rank(method="min", ascending=False).astype(np.int64))
    out = (df[["r_name", "n_name", "n_customers", "rk"]]
           .reset_index(drop=True))
    return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


# ---- bag-semantics set ops: INTERSECT ALL / EXCEPT ALL ----
def q_value_bag_ops(sf_dir: str) -> rd.Dataset:
    """Multiset (bag) set operations between the click-value and
    view-value multisets: ``|A INTERSECT ALL B| = sum_v min(a_v, b_v)``
    and ``|A EXCEPT ALL B| = sum_v max(a_v - b_v, 0)`` — the
    bag-semantics counterpart of the set-semantics q_customer_year_setops
    (multiplicities matter, so the per-key reduction is min/max-diff, not
    a bitmask).  Plan: per-batch (value, side) count partials; ONE hash
    partition on value co-locates both sides' counts; per-partition
    vectorized min/diff fold to two scalars; O(parts) driver sum."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        m = (et == "click") | (et == "view")
        if not m.any():
            return pa.table({"v": pa.array([], pa.int64()),
                             "is_click": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        sub = t.filter(pa.array(m))
        g = pa.table({
            "v": _cents(sub["value"]),
            "is_click": pc.cast(pc.equal(sub["event_type"], pa.scalar("click")),
                                pa.int64()),
        }).group_by(["v", "is_click"]).aggregate([("v", "count")])
        return g.rename_columns(["v", "is_click", "n"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n_intersect_all": pa.array([], pa.int64()),
                             "n_except_all": pa.array([], pa.int64())})
        g = t.group_by(["v", "is_click"]).aggregate([("n", "sum")])
        v = g["v"].to_numpy(zero_copy_only=False)
        side = g["is_click"].to_numpy(zero_copy_only=False)
        n = g["n_sum"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, v))
        v, side, n = v[order], side[order], n[order]
        starts, ends = run_boundaries(v)
        a = np.zeros(len(starts), dtype=np.int64)  # click counts
        b = np.zeros(len(starts), dtype=np.int64)  # view counts
        lens = ends - starts
        # each value has 1 or 2 rows (side 0 sorted before side 1)
        one = lens == 1
        first_side = side[starts]
        a[one & (first_side == 1)] = n[starts][one & (first_side == 1)]
        b[one & (first_side == 0)] = n[starts][one & (first_side == 0)]
        two = lens == 2
        a[two] = n[starts[two] + 1]   # side 1 (click) second in the pair
        b[two] = n[starts[two]]       # side 0 (view) first
        inter = int(np.minimum(a, b).sum())
        exc = int(np.maximum(a - b, 0).sum())
        return pa.table({"n_intersect_all": pa.array([inter], pa.int64()),
                         "n_except_all": pa.array([exc], pa.int64())})

    parts = hash_partitioned(
        ds.map_batches(partial, batch_format="pyarrow"),
        lambda t: _key_arrays(t, ["v"]),
        fold,
        num_parts=16,
    )
    pdf = parts.to_pandas()  # bounded: O(parts) two-scalar partials
    return rd.from_arrow(pa.table({
        "n_intersect_all": pa.array([int(pdf["n_intersect_all"].sum())], pa.int64()),
        "n_except_all": pa.array([int(pdf["n_except_all"].sum())], pa.int64()),
    }))


# ---- windowed DISTINCT aggregate: rolling distinct type count ----
def q_rolling_distinct_types(sf_dir: str) -> rd.Dataset:
    """COUNT(DISTINCT event_type) over each user's trailing-5-event window
    — the windowed-DISTINCT aggregate shape, which neither a running sum
    nor a rank can express.  The engine exploits the tiny type domain:
    each row becomes a 5-bit mask (1 << type_idx), the window's distinct
    count is the POPCOUNT of the OR of <= 5 POSITION-shifted mask arrays
    (run-boundary-guarded), so the whole window family is five vectorized
    ORs — no per-row window loop, no hash set.  One user-hash partition,
    one lexsort."""
    types = ["click", "error", "purchase", "signup", "view"]
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    _OUT = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                      ("n_types_5", pa.int64())])

    def window_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, eid, et = uid[order], eid[order], et[order]
        n = len(uid)
        starts, ends = run_boundaries(uid)
        offs = np.arange(n, dtype=np.int64) - np.repeat(starts, ends - starts)
        mask = pd.Series(et).map({t_: 1 << i for i, t_ in enumerate(types)}
                                 ).to_numpy(np.int64)
        acc = mask.copy()
        for lag in range(1, 5):
            shifted = np.zeros(n, dtype=np.int64)
            shifted[lag:] = mask[:-lag]
            acc |= np.where(offs >= lag, shifted, 0)
        pop = np.zeros(n, dtype=np.int64)
        for b in range(len(types)):
            pop += (acc >> b) & 1
        return pa.table({"event_id": pa.array(eid, pa.int64()),
                         "user_id": pa.array(uid, pa.int64()),
                         "n_types_5": pa.array(pop, pa.int64())})

    return hash_partitioned(
        ds,
        lambda t: _key_arrays(t, ["user_id"]),
        window_part,
        num_parts=32,
    ).sort("event_id")


# ---- TPC-H Q14 shape: conditional-aggregate ratio over a dim-filter ----
def q_promo_revenue_share(sf_dir: str) -> rd.Dataset:
    """Permille of one month's lineitem revenue that came from PROMO-type
    parts (TPC-H Q14's CASE-inside-aggregate ratio).  Plan: the part
    dimension broadcasts ONCE as a boolean LUT indexed by p_partkey (no
    join shuffle — p_type is 1 bit/part); each lineitem batch folds to
    TWO scalars (promo cents-x-pct, total); the driver combines O(blocks)
    scalar pairs and takes the exact integer permille — no float ratio
    ever exists, so Ray and DuckDB hash identically."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])  # bounded: dimension table
    pk = part["p_partkey"].to_numpy(zero_copy_only=False)
    lut = _dense_lut(pk, np.asarray(pc.equal(part["p_type"], pa.scalar("PROMO"))), False)
    lut_ref = ray.put(lut)

    lo = pa.scalar(np.datetime64("1997-09-01", "us"))
    hi = pa.scalar(np.datetime64("1997-10-01", "us"))
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        lu = ray.get(lut_ref)
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        r = _disc_rev_cpc(t).to_numpy(zero_copy_only=False)
        keys = t["l_partkey"].to_numpy(zero_copy_only=False)
        promo = _lut_get(lu, keys)
        return pa.table({"promo_cpc": pa.array([int(r[promo].sum())], pa.int64()),
                         "total_cpc": pa.array([int(r.sum())], pa.int64())})

    pdf = li.map_batches(partial, batch_format="pyarrow").to_pandas()  # bounded: 2 scalars per block
    promo_cpc = int(pdf["promo_cpc"].sum())
    total_cpc = int(pdf["total_cpc"].sum())
    out = pa.table({"promo_cpc": pa.array([promo_cpc], pa.int64()),
                    "total_cpc": pa.array([total_cpc], pa.int64()),
                    "promo_pm": pa.array([1000 * promo_cpc // max(total_cpc, 1)],
                                          pa.int64())})
    return rd.from_arrow(out)


# ---- TPC-H Q13 shape: count-of-counts distribution incl. empty groups ----
def q_order_count_distribution(sf_dir: str) -> rd.Dataset:
    """How many customers placed exactly c orders, INCLUDING c=0 (TPC-H
    Q13).  The zero bucket is the classic left-join trap: at scale you
    never left-join customer to orders just to count misses.  Plan:
    per-batch partial counts by custkey -> one hash-partitioned exact
    count per customer -> per-PARTITION histogram of counts (O(distinct
    counts) rows each) -> driver combine; the c=0 bucket is arithmetic
    (total customers from parquet METADATA minus distinct buyers — no
    customer scan at all)."""
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def pre(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("o_custkey", "count")])
        return g.rename_columns(["o_custkey", "n"])

    per_cust = partitioned_aggregate(
        orders.map_batches(pre, batch_format="pyarrow"),
        ["o_custkey"], [("n", "sum")], ["o_custkey", "n"],
        num_parts=32,
    )

    def hist(t: pa.Table) -> pa.Table:
        g = t.group_by("n").aggregate([("n", "count")])
        return g.rename_columns(["c_count", "custdist"])

    pdf = (per_cust.map_batches(hist, batch_format="pyarrow")
           .to_pandas())  # bounded: O(partitions x distinct order counts)
    pdf = pdf.groupby("c_count", as_index=False)["custdist"].sum()
    n_customers = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    zero = n_customers - int(pdf["custdist"].sum())
    if zero > 0:
        pdf = pd.concat([pdf, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
                        ignore_index=True)
    pdf = pdf.sort_values(["custdist", "c_count"], ascending=[False, False],
                          kind="mergesort").reset_index(drop=True)
    out = pa.table({"c_count": pa.array(pdf["c_count"], pa.int64()),
                    "custdist": pa.array(pdf["custdist"], pa.int64())})
    return rd.from_arrow(out)


# ---- TPC-H Q15 shape: argmax-with-ties over an aggregate ----
def q_top_supplier(sf_dir: str) -> rd.Dataset:
    """Supplier(s) with the maximum revenue in 1997Q1, ties kept (TPC-H
    Q15's view + WHERE total = (SELECT MAX ...)).  Plan: per-batch
    partial sums by suppkey -> hash-partitioned exact totals (supplier is
    a dimension, so the per-supplier result is bounded) -> the driver
    takes the max and the tie set from O(suppliers) rows; names broadcast
    from the supplier dim."""
    lo = pa.scalar(np.datetime64("1997-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-04-01", "us"))
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        r = _disc_rev_cpc(t)
        g = pa.table({"l_suppkey": t["l_suppkey"], "r": r}).group_by(
            "l_suppkey").aggregate([("r", "sum")])
        return g.rename_columns(["l_suppkey", "total_rev_cpc"])

    pdf = driver_grouped_agg(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_suppkey"], [("total_rev_cpc", "sum")], ["l_suppkey", "total_rev_cpc"],
    )  # bounded: O(suppliers) — dimension-sized
    best = int(pdf["total_rev_cpc"].max())
    winners = pdf[pdf["total_rev_cpc"] == best].copy()
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"]).to_pandas()  # bounded: dimension table
    winners = winners.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    winners = winners.sort_values("s_suppkey", kind="mergesort")
    out = pa.table({"s_suppkey": pa.array(winners["s_suppkey"], pa.int64()),
                    "s_name": pa.array(winners["s_name"], pa.string()),
                    "total_rev_cpc": pa.array(winners["total_rev_cpc"], pa.int64())})
    return rd.from_arrow(out)


# ---- TPC-H Q22 shape: global-scalar gate + anti join + grouped rollup ----
def q_global_sales_opportunity(sf_dir: str) -> rd.Dataset:
    """Idle rich customers by code bucket (TPC-H Q22): customers whose
    balance beats the mean POSITIVE balance and who placed no order since
    1999 (the driver tables are dense — every customer has SOME order, so
    the literal no-orders gate would be empty at every sf; "lapsed since
    1999" keeps Q22's NOT-EXISTS anti-join shape nonempty), grouped by
    c_custkey % 7 (the cntrycode surrogate).  Plan: pass 1 folds customer
    to two scalars (sum/count of positive balances); the above-mean gate
    is the exact cross-multiplication bal*n > sum (no float mean); the
    recency gate is Ray's native left_anti join against the DISTINCT
    recent-order custkeys (pre-reduced inside map_batches — the anti
    right side is O(recent buyers), never the orders fact); the code
    rollup is a driver combine of O(7) partials."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def bal_partial(t: pa.Table) -> pa.Table:
        b = _cents(t["c_acctbal"]).to_numpy(zero_copy_only=False)
        pos = b[b > 0]
        return pa.table({"s": pa.array([int(pos.sum())], pa.int64()),
                         "n": pa.array([len(pos)], pa.int64())})

    pdf = cust.map_batches(bal_partial, batch_format="pyarrow").to_pandas()  # bounded: 2 scalars per block
    s_pos, n_pos = int(pdf["s"].sum()), int(pdf["n"].sum())

    def rich(t: pa.Table) -> pa.Table:
        bal = _cents(t["c_acctbal"])
        mask = pc.greater(pc.multiply(bal, pa.scalar(n_pos, pa.int64())),
                          pa.scalar(s_pos, pa.int64()))
        t = t.append_column("bal_cents", bal).filter(mask)
        return t.select(["c_custkey", "bal_cents"])

    rich_ds = cust.map_batches(rich, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    cutoff = pa.scalar(np.datetime64("1999-01-01", "us"))

    def buyer_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["o_orderdate"], cutoff))
        return pa.table({"o_custkey": pc.unique(t["o_custkey"])})

    buyers = orders.map_batches(buyer_keys, batch_format="pyarrow")
    idle = rich_ds.join(
        buyers, join_type="left_anti",
        num_partitions=_join_parts(sf_dir, "customer", "orders"),
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def code_partial(t: pa.Table) -> pa.Table:
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        g = pa.table({"code": pa.array(ck % 7, pa.int64()),
                      "bal_cents": t["bal_cents"]}).group_by("code").aggregate(
            [("bal_cents", "count"), ("bal_cents", "sum")])
        return g.rename_columns(["code", "numcust", "totacctbal_cents"])

    out = (idle.map_batches(code_partial, batch_format="pyarrow")
           .to_pandas())  # bounded: O(7) codes per block
    out = out.groupby("code", as_index=False).sum().sort_values("code")
    t = pa.table({"code": pa.array(out["code"], pa.int64()),
                  "numcust": pa.array(out["numcust"], pa.int64()),
                  "totacctbal_cents": pa.array(out["totacctbal_cents"], pa.int64())})
    return rd.from_arrow(t)


# ---- TPC-H Q8 shape: national market share per year, exact permille ----
def q_market_share(sf_dir: str) -> rd.Dataset:
    """NATION_1-supplied share of AMERICA-region customers' lineitem
    revenue per order year (TPC-H Q8's national-market-share ratio).
    Plan: supplier->is-target-nation broadcasts as ONE bit per suppkey
    and nation->is-AMERICA as one bit per nationkey (both dimensions);
    lineitem folds per batch to (orderkey, vol, target_vol) partials and
    pre-aggregates BY ORDERKEY before the orders join (the only fact x
    fact exchange); orders carries (custkey, year) through a partitioned
    customer join; the region gate applies batch-side via the nation LUT;
    the per-year matrix (O(years) rows) folds on the driver and the share
    is the exact integer permille num*1000 // den."""
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])  # bounded: dimension table
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False)
    s_target = np.zeros(int(sk.max()) + 2 if len(sk) else 1, dtype=bool)
    s_target[sk] = supp["s_nationkey"].to_numpy(zero_copy_only=False) == 1
    s_ref = ray.put(s_target)

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])  # bounded: dimension table
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False)
    n_america = np.zeros(int(nk.max()) + 2 if len(nk) else 1, dtype=bool)
    n_america[nk] = nat["n_regionkey"].to_numpy(zero_copy_only=False) == 1
    n_ref = ray.put(n_america)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def li_partial(t: pa.Table) -> pa.Table:
        lut = ray.get(s_ref)
        r = _disc_rev_cpc(t).to_numpy(zero_copy_only=False)
        keys = t["l_suppkey"].to_numpy(zero_copy_only=False)
        tgt = _lut_get(lut, keys)
        g = pa.table({"l_orderkey": t["l_orderkey"],
                      "vol": pa.array(r, pa.int64()),
                      "tvol": pa.array(np.where(tgt, r, 0), pa.int64())}
                     ).group_by("l_orderkey").aggregate(
            [("vol", "sum"), ("tvol", "sum")])
        return g.rename_columns(["l_orderkey", "vol", "tvol"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    j1 = li.map_batches(li_partial, batch_format="pyarrow").join(
        orders, join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j2 = j1.select_columns(["o_custkey", "o_orderdate", "vol", "tvol"]).join(
        cust, join_type="inner",
        num_partitions=_join_parts(sf_dir, "customer"),
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def year_partial(t: pa.Table) -> pa.Table:
        lut = ray.get(n_ref)
        nkeys = pc.cast(t["c_nationkey"], pa.int64()).to_numpy(zero_copy_only=False)
        mask = lut[np.minimum(nkeys, len(lut) - 1)]
        t = t.filter(pa.array(mask))
        yr = pc.year(t["o_orderdate"])
        g = pa.table({"o_year": pc.cast(yr, pa.int64()),
                      "vol": t["vol"], "tvol": t["tvol"]}).group_by(
            "o_year").aggregate([("tvol", "sum"), ("vol", "sum")])
        return g.rename_columns(["o_year", "target_cpc", "total_cpc"])

    pdf = (j2.map_batches(year_partial, batch_format="pyarrow")
           .to_pandas())  # bounded: O(blocks x years) partials
    pdf = pdf.groupby("o_year", as_index=False).sum().sort_values("o_year")
    pdf["mkt_share_pm"] = (pdf["target_cpc"] * 1000
                           // pdf["total_cpc"].clip(lower=1)).astype(np.int64)
    out = pa.table({"o_year": pa.array(pdf["o_year"], pa.int64()),
                    "target_cpc": pa.array(pdf["target_cpc"], pa.int64()),
                    "total_cpc": pa.array(pdf["total_cpc"], pa.int64()),
                    "mkt_share_pm": pa.array(pdf["mkt_share_pm"], pa.int64())})
    return rd.from_arrow(out)


# ---- TPC-H Q17 shape: correlated per-group mean gate, one shuffle ----
def q_small_quantity_revenue(sf_dir: str) -> rd.Dataset:
    """Revenue from Brand#3 lineitems whose quantity is below 20% of that
    PART's average quantity (TPC-H Q17's correlated scalar subquery).
    The per-part mean and the row gate share ONE hash partition: inside
    each partkey partition a grouped sum/count computes the mean while a
    searchsorted maps it back onto the rows — no self-join, no second
    shuffle.  The 0.2x-mean gate is exact integer cross-multiplication
    (qty*5*n < sum_qty); quantities are integral in this schema."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])  # bounded: dimension table
    pk = part["p_partkey"].to_numpy(zero_copy_only=False)
    lut = np.zeros(int(pk.max()) + 2 if len(pk) else 1, dtype=bool)
    lut[pk] = np.asarray(pc.equal(part["p_brand"], pa.scalar("Brand#3")))
    lut_ref = ray.put(lut)

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    def brand_filter(t: pa.Table) -> pa.Table:
        lu = ray.get(lut_ref)
        keys = t["l_partkey"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(_lut_get(lu, keys)))
        return pa.table({
            "l_partkey": t["l_partkey"],
            "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
            "cents": _cents(t["l_extendedprice"]),
        })

    filtered = li.map_batches(brand_filter, batch_format="pyarrow")

    _OUT = pa.schema([("total_cents", pa.int64()), ("n_small", pa.int64())])

    def gate_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        keys = t["l_partkey"].to_numpy(zero_copy_only=False)
        qty = t["qty"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="mergesort")
        keys, qty, cents = keys[order], qty[order], cents[order]
        starts, ends = run_boundaries(keys)
        grp = np.repeat(np.arange(len(starts)), ends - starts)
        sq = np.bincount(grp, weights=qty).astype(np.int64)
        n = (ends - starts).astype(np.int64)
        small = qty * 5 * n[grp] < sq[grp]
        return pa.table({"total_cents": pa.array([int(cents[small].sum())], pa.int64()),
                         "n_small": pa.array([int(small.sum())], pa.int64())})

    pdf = hash_partitioned(
        filtered, lambda t: _key_arrays(t, ["l_partkey"]), gate_part, num_parts=32,
    ).to_pandas()  # bounded: 2 scalars per partition
    out = pa.table({"total_cents": pa.array([int(pdf["total_cents"].sum())], pa.int64()),
                    "n_small": pa.array([int(pdf["n_small"].sum())], pa.int64())})
    return rd.from_arrow(out)


# ---- TPC-H Q19 shape: disjunctive multi-attribute predicate revenue ----
def q_disjunctive_revenue(sf_dir: str) -> rd.Dataset:
    """Revenue matching an OR of three (brand, size-range, qty-range)
    predicate triples (TPC-H Q19's disjunctive pushdown shape).  The part
    attributes broadcast ONCE as two parallel arrays (brand ordinal +
    size, 5 bytes/part); each lineitem batch evaluates all three clauses
    as vectorized masks and folds to two scalars — the OR never becomes
    three scans or a join."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])  # bounded: dimension table
    pk = part["p_partkey"].to_numpy(zero_copy_only=False)
    hi_key = int(pk.max()) + 2 if len(pk) else 1
    brand_ord = np.zeros(hi_key, dtype=np.int16)
    for i, b in enumerate(("Brand#1", "Brand#2", "Brand#3"), start=1):
        brand_ord[pk[np.asarray(pc.equal(part["p_brand"], pa.scalar(b)))]] = i
    size_arr = np.zeros(hi_key, dtype=np.int32)
    size_arr[pk] = part["p_size"].to_numpy(zero_copy_only=False)
    refs = ray.put((brand_ord, size_arr))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        bo, sz = ray.get(refs)
        keys = np.minimum(t["l_partkey"].to_numpy(zero_copy_only=False), hi_key - 1)
        b, s = bo[keys], sz[keys]
        q = pc.cast(pc.round(t["l_quantity"]), pa.int64()).to_numpy(zero_copy_only=False)
        m = (((b == 1) & (s >= 1) & (s <= 10) & (q >= 1) & (q <= 15))
             | ((b == 2) & (s >= 11) & (s <= 25) & (q >= 10) & (q <= 25))
             | ((b == 3) & (s >= 26) & (s <= 50) & (q >= 20) & (q <= 35)))
        r = _disc_rev_cpc(t).to_numpy(zero_copy_only=False)
        return pa.table({"revenue_cpc": pa.array([int(r[m].sum())], pa.int64()),
                         "n_items": pa.array([int(m.sum())], pa.int64())})

    pdf = li.map_batches(partial, batch_format="pyarrow").to_pandas()  # bounded: 2 scalars per block
    out = pa.table({"revenue_cpc": pa.array([int(pdf["revenue_cpc"].sum())], pa.int64()),
                    "n_items": pa.array([int(pdf["n_items"].sum())], pa.int64())})
    return rd.from_arrow(out)


# ---- ordered-sequence funnel: view -> click -> purchase ----
def q_ordered_funnel(sf_dir: str) -> rd.Dataset:
    """Strictly-ordered three-stage funnel (view -> later click -> later
    purchase): how many users reach each stage.  The sequence constraint
    is what separates this from a per-type distinct count — a click
    BEFORE the first view doesn't qualify.  Plan: one user-hash
    partition; inside each, users factorize to dense indices and each
    stage is a masked ``np.minimum.at`` segmented min (t1 = first view,
    t2 = first click with ts > t1[user], t3 = first purchase with
    ts > t2[user]) — three vectorized passes, no per-user loop, no join;
    each partition emits three scalar counts and the driver folds O(3 x
    parts) rows."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    _OUT = pa.schema([("stage", pa.string()), ("n_users", pa.int64())])
    SENT = np.iinfo(np.int64).max

    def funnel_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uniq, idx = np.unique(uid, return_inverse=True)
        n = len(uniq)

        def seg_min(mask: np.ndarray, after: np.ndarray | None) -> np.ndarray:
            out = np.full(n, SENT, np.int64)
            m = mask if after is None else (mask & (ts > after[idx]))
            np.minimum.at(out, idx[m], ts[m])
            return out

        t1 = seg_min(et == "view", None)
        t2 = seg_min(et == "click", t1)
        t3 = seg_min(et == "purchase", t2)
        return pa.table({
            "stage": pa.array(["1_view", "2_click", "3_purchase"], pa.string()),
            "n_users": pa.array([int((t1 < SENT).sum()), int((t2 < SENT).sum()),
                                 int((t3 < SENT).sum())], pa.int64()),
        })

    pdf = hash_partitioned(
        ds, lambda t: _key_arrays(t, ["user_id"]), funnel_part, num_parts=32,
    ).to_pandas()  # bounded: 3 rows per partition
    pdf = pdf.groupby("stage", as_index=False)["n_users"].sum().sort_values("stage")
    out = pa.table({"stage": pa.array(pdf["stage"], pa.string()),
                    "n_users": pa.array(pdf["n_users"], pa.int64())})
    return rd.from_arrow(out)



# ---- hopping (sliding) windows: 10-min windows every 5 min ----
def q_hopping_window_counts(sf_dir: str) -> rd.Dataset:
    """Event counts per 10-minute window hopping every 5 minutes — the
    sliding-window aggregate where each event belongs to TWO windows (the
    streaming shape tumbling windows can't express).  Plan: each batch
    EXPANDS every event into its window-start keys vectorized (two
    repeats + two subtractions — expansion factor = window/hop, a
    constant) and pre-aggregates (type, window) partials; the driver
    folds O(types x windows) cells.  At 100 TB the partial combine keeps
    the shuffle at cell cardinality, and the expansion happens inside the
    map stage — the input is never duplicated at rest."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])
    HOP = 5 * 60 * 1_000_000      # 5 min in us
    WIN = 10 * 60 * 1_000_000     # 10 min in us

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        # window starts covering ts: the hop-aligned start at or before ts,
        # and the previous one if ts still falls inside its 10-min span
        s0 = (ts // HOP) * HOP
        s1 = s0 - HOP
        starts = np.concatenate([s0, s1])
        types = np.concatenate([et, et])
        keep = np.concatenate([np.ones(len(ts), bool), ts - s1 < WIN])
        starts, types = starts[keep], types[keep]
        g = pa.table({
            "event_type": pa.array(types, pa.string()),
            "window_start": pa.array(starts.astype("datetime64[us]"),
                                      pa.timestamp("us")),
        }).group_by(["event_type", "window_start"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "window_start", "n"])

    pdf = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas())  # bounded: O(types x windows) cells per block
    pdf = (pdf.groupby(["event_type", "window_start"], as_index=False)["n"].sum()
           .sort_values(["event_type", "window_start"]).reset_index(drop=True))
    out = pa.table({"event_type": pa.array(pdf["event_type"], pa.string()),
                    "window_start": pa.array(pdf["window_start"], pa.timestamp("us")),
                    "n": pa.array(pdf["n"], pa.int64())})
    return rd.from_arrow(out)


# ---- TPC-H Q9 shape: supplier-nation x year revenue for one part class ----
def q_product_type_profit(sf_dir: str) -> rd.Dataset:
    """PROMO-part revenue by supplier nation and order year (TPC-H Q9's
    profit cube, minus partsupp cost — this schema has no partsupp).
    Differs from Q8/Q7 in that BOTH gates are broadcast dimension LUTs
    (part type + supplier nation) folded into one lineitem combiner, so
    the only exchange is the orders join for the year; the (nation, year)
    cube folds on the driver at O(nations x years)."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])  # bounded: dimension table
    pk = part["p_partkey"].to_numpy(zero_copy_only=False)
    promo = _dense_lut(pk, np.asarray(pc.equal(part["p_type"], pa.scalar("PROMO"))), False)
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])  # bounded: dimension table
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False)
    snat = _dense_lut(sk, supp["s_nationkey"].to_numpy(zero_copy_only=False), np.int64(-1))
    refs = ray.put((promo, snat))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def li_partial(t: pa.Table) -> pa.Table:
        pr, sn = ray.get(refs)
        keys = np.minimum(t["l_partkey"].to_numpy(zero_copy_only=False), len(pr) - 1)
        t = t.filter(pa.array(pr[keys]))
        r = _disc_rev_cpc(t)
        nat = sn[np.minimum(t["l_suppkey"].to_numpy(zero_copy_only=False), len(sn) - 1)]
        g = pa.table({"l_orderkey": t["l_orderkey"],
                      "nat": pa.array(nat, pa.int64()),
                      "r": r}).group_by(["l_orderkey", "nat"]).aggregate(
            [("r", "sum")])
        return g.rename_columns(["l_orderkey", "nat", "r"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    j = li.map_batches(li_partial, batch_format="pyarrow").join(
        orders, join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()  # bounded: dimension table
    names = dict(zip(nation["n_nationkey"], nation["n_name"]))

    def cube_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"nat": t["nat"],
                      "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                      "r": t["r"]}).group_by(["nat", "o_year"]).aggregate(
            [("r", "sum")])
        return g.rename_columns(["nat", "o_year", "revenue_cpc"])

    pdf = (j.map_batches(cube_partial, batch_format="pyarrow")
           .to_pandas())  # bounded: O(nations x years) cells per block
    pdf = pdf.groupby(["nat", "o_year"], as_index=False)["revenue_cpc"].sum()
    pdf["n_name"] = pdf["nat"].map(names)
    pdf = (pdf[["n_name", "o_year", "revenue_cpc"]]
           .sort_values(["n_name", "o_year"], kind="mergesort").reset_index(drop=True))
    out = pa.table({"n_name": pa.array(pdf["n_name"], pa.string()),
                    "o_year": pa.array(pdf["o_year"], pa.int64()),
                    "revenue_cpc": pa.array(pdf["revenue_cpc"], pa.int64())})
    return rd.from_arrow(out)


# ---- grouped DISTINCT list agg: per-user sorted type signature ----
def q_user_type_signature(sf_dir: str) -> rd.Dataset:
    """Each user's SORTED DISTINCT event types joined with ',' — the
    string_agg(DISTINCT ... ORDER BY ...) shape (grouped distinct list
    aggregation).  Plan: per-batch (user, type) dedup shrinks the shuffle
    to at most |users| x |types| rows; one user-hash partition then
    dedups exactly, lexsorts (user, type), and joins each run with a
    vectorized reduceat-style concat (pandas str agg over runs — no
    per-user Python loop at the engine layer)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def dedup_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([])
        return g

    _OUT = pa.schema([("user_id", pa.int64()), ("signature", pa.string())])

    def sig_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        df = t.to_pandas().drop_duplicates()
        df = df.sort_values(["user_id", "event_type"], kind="mergesort")
        sig = df.groupby("user_id", sort=True)["event_type"].agg(",".join)
        return pa.table({"user_id": pa.array(sig.index.to_numpy(np.int64), pa.int64()),
                         "signature": pa.array(sig.to_numpy(object), pa.string())})

    return hash_partitioned(
        ds.map_batches(dedup_partial, batch_format="pyarrow"),
        lambda t: _key_arrays(t, ["user_id"]), sig_part, num_parts=32,
    ).sort("user_id")


# ---- time-weighted average: value holds until the next event ----
def q_time_weighted_value(sf_dir: str) -> rd.Dataset:
    """Per-user TIME-weighted average value — each event's value holds
    from its timestamp until the user's next event (the step-function
    integral shape used for balance/price TWAPs; a plain AVG would weight
    a 1-second reading equal to a week-long one).  Plan: one user-hash
    partition, one lexsort (user, ts, event_id); durations are a single
    shifted diff masked at run boundaries; the weighted sum and span fold
    per user via np.add.at.  Exact integers end-to-end: weighted_sum =
    sum(value_cents x duration_us), twa_cents = weighted_sum // span_us
    — same floor division in the oracle, so no float ever exists."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    _OUT = pa.schema([("user_id", pa.int64()), ("weighted_sum", pa.int64()),
                      ("span_us", pa.int64()), ("twa_cents", pa.int64())])

    def twa_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        v = _cents(t["value"]).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts, v = uid[order], ts[order], v[order]
        n = len(uid)
        starts, ends = run_boundaries(uid)
        dur = np.zeros(n, np.int64)
        dur[:-1] = ts[1:] - ts[:-1]
        dur[ends - 1] = 0  # last event of each user holds no duration
        ngroups = len(starts)
        grp = np.repeat(np.arange(ngroups), ends - starts)
        wsum = np.zeros(ngroups, np.int64)
        np.add.at(wsum, grp, v * dur)
        span = ts[ends - 1] - ts[starts]
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "weighted_sum": pa.array(wsum, pa.int64()),
            "span_us": pa.array(span, pa.int64()),
            "twa_cents": pa.array(wsum // np.maximum(span, 1), pa.int64()),
        })

    return hash_partitioned(
        ds, lambda t: _key_arrays(t, ["user_id"]), twa_part, num_parts=32,
    ).sort("user_id")


# ---- LAG over an aggregated series: week-over-week revenue delta ----
def q_weekly_revenue_delta(sf_dir: str) -> rd.Dataset:
    """Weekly order revenue with the week-over-week delta — the
    LAG-over-an-AGGREGATE composition (the window input is itself a
    grouped result).  Plan: orders fold per batch to (week, cents)
    partials (Monday-aligned weeks, the retention_cohorts arithmetic);
    the driver combines O(weeks) cells and takes the shifted difference
    there — the window input is aggregate-small by construction, so no
    shuffle exists beyond the one partial pass.  First week's delta is 0
    (COALESCE convention, mirrored in the oracle)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        days = t["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[D]").astype(np.int64)
        week = (days + 3) // 7
        g = pa.table({"w": pa.array(week, pa.int64()),
                      "cents": _cents(t["o_totalprice"])}).group_by("w").aggregate(
            [("cents", "sum")])
        return g.rename_columns(["w", "revenue_cents"])

    pdf = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas())  # bounded: O(weeks) cells per block
    pdf = pdf.groupby("w", as_index=False)["revenue_cents"].sum().sort_values("w")
    wk = ((pdf["w"].to_numpy(np.int64)) * 7 - 3).astype("datetime64[D]").astype("datetime64[us]")
    rev = pdf["revenue_cents"].to_numpy(np.int64)
    delta = np.zeros(len(rev), np.int64)
    delta[1:] = rev[1:] - rev[:-1]
    out = pa.table({"week_start": pa.array(wk, pa.timestamp("us")),
                    "revenue_cents": pa.array(rev, pa.int64()),
                    "delta_cents": pa.array(delta, pa.int64())})
    return rd.from_arrow(out)


# ---- contingency table: event type x weekday, integer chi-square parts ----
def q_type_dow_contingency(sf_dir: str) -> rd.Dataset:
    """Event-type x ISO-weekday contingency table with the exact integer
    chi-square building blocks: observed count, row total x column total
    (= expected x N), and the scaled deviation N*obs - row*col per cell —
    the independence-test shape kept float-free (the analyst divides by
    N*row*col once, outside the engine).  Plan: per-batch O(cells)
    partials, driver combine, marginals from the same combine — one scan,
    no shuffle."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        days = t["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[D]").astype(np.int64)
        dow = (days + 3) % 7 + 1  # ISO: 1=Monday (epoch day 0 = Thursday)
        g = pa.table({"event_type": t["event_type"],
                      "dow": pa.array(dow, pa.int64())}).group_by(
            ["event_type", "dow"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "dow", "obs"])

    pdf = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas())  # bounded: O(types x 7) cells per block
    pdf = pdf.groupby(["event_type", "dow"], as_index=False)["obs"].sum()
    n = int(pdf["obs"].sum())
    row = pdf.groupby("event_type")["obs"].sum()
    col = pdf.groupby("dow")["obs"].sum()
    pdf["row_x_col"] = (pdf["event_type"].map(row) * pdf["dow"].map(col)).astype(np.int64)
    pdf["dev_xn"] = (n * pdf["obs"] - pdf["row_x_col"]).astype(np.int64)
    pdf = pdf.sort_values(["event_type", "dow"]).reset_index(drop=True)
    out = pa.table({"event_type": pa.array(pdf["event_type"], pa.string()),
                    "dow": pa.array(pdf["dow"], pa.int64()),
                    "obs": pa.array(pdf["obs"], pa.int64()),
                    "row_x_col": pa.array(pdf["row_x_col"], pa.int64()),
                    "dev_xn": pa.array(pdf["dev_xn"], pa.int64())})
    return rd.from_arrow(out)


# ---- grouped top-k as a LIST column ----
def q_user_top3_values(sf_dir: str) -> rd.Dataset:
    """Each user's top-3 event values (cents, descending) as a CSV string
    — the grouped-top-k-into-array shape (feature vectors for a
    recommender, "recent best" rollups; CSV because the driver compare
    hashes scalars — the customer_order_list convention).  Plan:
    per-batch top-3 per user shrinks the shuffle to <= 3 rows/user/block;
    one user-hash partition then merges and re-takes the top 3; ties
    broken by value only, so the string is fully value-determined."""
    ds = _read(sf_dir, "events", ["user_id", "value"])

    def local_top(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        v = _cents(t["value"]).to_numpy(zero_copy_only=False)
        order = np.lexsort((-v, uid))
        uid, v = uid[order], v[order]
        starts, ends = run_boundaries(uid)
        offs = np.arange(len(uid), dtype=np.int64) - np.repeat(starts, ends - starts)
        keep = offs < 3
        return pa.table({"user_id": pa.array(uid[keep], pa.int64()),
                         "v": pa.array(v[keep], pa.int64())})

    _OUT = pa.schema([("user_id", pa.int64()), ("top3_csv", pa.string())])

    def merge_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-v, uid))
        uid, v = uid[order], v[order]
        starts, ends = run_boundaries(uid)
        offs = np.arange(len(uid), dtype=np.int64) - np.repeat(starts, ends - starts)
        keep = offs < 3
        uid, v = uid[keep], v[keep]
        s2, e2 = run_boundaries(uid)
        v_str = v.astype(str)
        csv = [",".join(v_str[s:e]) for s, e in zip(s2.tolist(), e2.tolist())]
        return pa.table({"user_id": pa.array(uid[s2], pa.int64()),
                         "top3_csv": pa.array(csv, pa.string())})

    return hash_partitioned(
        ds.map_batches(local_top, batch_format="pyarrow"),
        lambda t: _key_arrays(t, ["user_id"]), merge_part, num_parts=32,
    ).sort("user_id")


# ---- closed-form hierarchy rollup: ancestors via integer division ----
def q_part_hierarchy_rollup(sf_dir: str) -> rd.Dataset:
    """Retail-price rollup over a derived 4-ary part hierarchy (parent =
    partkey // 4): every ancestor within 3 levels accumulates its
    descendants' prices — the BOM/org-chart hierarchical aggregate.  The
    hierarchy is closed-form, so the recursive join disappears: each part
    emits its level-1/2/3 ancestors by THREE integer divisions inside the
    map stage (partials pre-grouped per batch), then one
    ancestor-partitioned exact sum.  The same closed form unrolls to a
    3-way UNION in the oracle.  Ancestor 0 is the synthetic root (partkey
    0's self-parent) and is excluded on both sides."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_retailprice"])

    def emit(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False)
        cents = _cents(t["p_retailprice"]).to_numpy(zero_copy_only=False)
        anc = np.concatenate([k // 4, k // 16, k // 64])
        c3 = np.concatenate([cents, cents, cents])
        keep = anc >= 1  # drop the synthetic root (docstring)
        g = pa.table({"ancestor": pa.array(anc[keep], pa.int64()),
                      "cents": pa.array(c3[keep], pa.int64())}).group_by(
            "ancestor").aggregate([("cents", "sum"), ([], "count_all")])
        return g.rename_columns(["ancestor", "subtree_cents", "n_desc"])

    return partitioned_aggregate(
        ds.map_batches(emit, batch_format="pyarrow"),
        ["ancestor"], [("subtree_cents", "sum"), ("n_desc", "sum")],
        ["ancestor", "subtree_cents", "n_desc"],
        num_parts=32,
    ).sort("ancestor")


# ---- windowed anomaly flags: exact integer rolling z-score ----
def q_rolling_anomalies(sf_dir: str) -> rd.Dataset:
    """Events whose value sits more than 3 sigma from their user's
    trailing-5-event mean — the rolling z-score anomaly detector, kept
    exact: z^2 = (5v - sum)^2 / (5*ssq - sum^2), so flag iff
    (5v - sum)^2 > 3*(5*ssq - sum^2) (z^2 > 3; note a sample of n=5 bounds
    z^2 at n-1=4, so any classic 3-sigma threshold would be vacuously
    empty — the in-window z test needs T < n-1).  Both engines compare
    the same integers; no sqrt or float ever exists.  Only full windows are
    scored (the first 4 events of a user are never flagged).  Plan: one
    user-hash partition, one lexsort; window sum and sum-of-squares are
    shifted-cumsum differences guarded at run boundaries — no per-row
    loop, no window state."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    _OUT = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                      ("v_cents", pa.int64()), ("sum5", pa.int64()),
                      ("ssq5", pa.int64())])

    def anom_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        v = _cents(t["value"]).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, eid, v = uid[order], eid[order], v[order]
        n = len(uid)
        starts, ends = run_boundaries(uid)
        offs = np.arange(n, dtype=np.int64) - np.repeat(starts, ends - starts)
        cs = np.concatenate([[0], np.cumsum(v)])
        cq = np.concatenate([[0], np.cumsum(v * v)])
        idx = np.arange(n)
        lo = idx - 4
        full = offs >= 4
        sum5 = np.where(full, cs[idx + 1] - cs[np.maximum(lo, 0)], 0)
        ssq5 = np.where(full, cq[idx + 1] - cq[np.maximum(lo, 0)], 0)
        lhs = (5 * v - sum5) ** 2
        rhs = 3 * (5 * ssq5 - sum5 * sum5)
        flag = full & (lhs > rhs)
        return pa.table({
            "event_id": pa.array(eid[flag], pa.int64()),
            "user_id": pa.array(uid[flag], pa.int64()),
            "v_cents": pa.array(v[flag], pa.int64()),
            "sum5": pa.array(sum5[flag], pa.int64()),
            "ssq5": pa.array(ssq5[flag], pa.int64()),
        })

    return hash_partitioned(
        ds, lambda t: _key_arrays(t, ["user_id"]), anom_part, num_parts=32,
    ).sort("event_id")


# ---- OHLC bars: first/last/min/max per (type, hour) bucket ----
def q_hourly_ohlc(sf_dir: str) -> rd.Dataset:
    """Open-high-low-close value bars per (event_type, hour) — the
    financial candlestick aggregate, whose open/close are ORDER-dependent
    (first/last by (ts, event_id)) while high/low are plain extrema; a
    groupby can't express the mix without argmin/argmax support.  Plan:
    one type-hash partition (hours of a type stay together for the
    in-partition run scan); one lexsort (type, hour, ts, eid); open/close
    index the run boundaries, high/low are reduceat extrema — four
    vectorized gathers, no per-bucket loop.  Cents throughout."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    _OUT = pa.schema([("event_type", pa.string()), ("hour", pa.timestamp("us")),
                      ("open", pa.int64()), ("high", pa.int64()),
                      ("low", pa.int64()), ("close", pa.int64()),
                      ("n", pa.int64())])

    def ohlc_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        v = _cents(t["value"]).to_numpy(zero_copy_only=False)
        HOUR = 3_600_000_000
        hour = (ts // HOUR) * HOUR
        tcode, tuniq = pd.factorize(pd.Series(et), sort=True)
        order = np.lexsort((eid, ts, hour, tcode))
        tcode, hour, v = tcode[order], hour[order], v[order]
        starts, ends = run_boundaries(tcode, hour)
        return pa.table({
            "event_type": pa.array(tuniq[tcode[starts]], pa.string()),
            "hour": pa.array(hour[starts].astype("datetime64[us]"), pa.timestamp("us")),
            "open": pa.array(v[starts], pa.int64()),
            "high": pa.array(np.maximum.reduceat(v, starts), pa.int64()),
            "low": pa.array(np.minimum.reduceat(v, starts), pa.int64()),
            "close": pa.array(v[ends - 1], pa.int64()),
            "n": pa.array(ends - starts, pa.int64()),
        })

    return hash_partitioned(
        ds, lambda t: _key_arrays(t, ["event_type"]), ohlc_part, num_parts=8,
    ).sort(["event_type", "hour"])


# ---- funnel latency histogram: signup -> first purchase, hour buckets ----
def q_purchase_latency(sf_dir: str) -> rd.Dataset:
    """Distribution of the signup-to-first-purchase delay in whole hours
    (users whose first purchase FOLLOWS their first signup) — the funnel
    latency histogram.  Plan: the event_funnel masked-segmented-min pass
    computes both firsts in one user-hash partition; each partition emits
    its O(buckets) histogram cells; the driver folds them."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    SENT = np.iinfo(np.int64).max

    def lat_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uniq, idx = np.unique(uid, return_inverse=True)
        n = len(uniq)
        t_sign = np.full(n, SENT, np.int64)
        m = et == "signup"
        np.minimum.at(t_sign, idx[m], ts[m])
        t_pur = np.full(n, SENT, np.int64)
        m = (et == "purchase") & (ts > t_sign[idx])
        np.minimum.at(t_pur, idx[m], ts[m])
        ok = t_pur < SENT
        hrs = (t_pur[ok] - t_sign[ok]) // 3_600_000_000
        vals, counts = np.unique(hrs, return_counts=True)
        return pa.table({"latency_h": pa.array(vals, pa.int64()),
                         "n_users": pa.array(counts.astype(np.int64), pa.int64())})

    pdf = hash_partitioned(
        ds, lambda t: _key_arrays(t, ["user_id"]), lat_part, num_parts=32,
    ).to_pandas()  # bounded: O(buckets) cells per partition
    pdf = pdf.groupby("latency_h", as_index=False)["n_users"].sum().sort_values("latency_h")
    out = pa.table({"latency_h": pa.array(pdf["latency_h"], pa.int64()),
                    "n_users": pa.array(pdf["n_users"], pa.int64())})
    return rd.from_arrow(out)


# ---- decile lift table: NTILE over aggregated spend, exact shares ----
def q_customer_decile_lift(sf_dir: str) -> rd.Dataset:
    """Customers ranked by total spend and cut into 10 deciles; each
    decile's customer count, revenue and exact permille revenue share —
    the marketing lift table (NTILE over an AGGREGATE, not raw rows, so
    the window input is the per-customer rollup).  Plan: per-customer
    totals via one partitioned aggregate; the decile cut runs driver-side
    over the O(customers) rollup (bounded: customer is dimension-sized at
    every tier; at true fact scale the cut becomes sampled quantile
    boundaries — stated bound, same discipline as skyline_customers).
    NTILE tie/remainder semantics replicated exactly: order (spend DESC,
    custkey), first n%10 deciles one element larger."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def pre(t: pa.Table) -> pa.Table:
        g = pa.table({"o_custkey": t["o_custkey"],
                      "cents": _cents(t["o_totalprice"])}).group_by(
            "o_custkey").aggregate([("cents", "sum")])
        return g.rename_columns(["o_custkey", "cents"])

    per_cust = partitioned_aggregate(
        orders.map_batches(pre, batch_format="pyarrow"),
        ["o_custkey"], [("cents", "sum")], ["o_custkey", "cents"],
        num_parts=32,
    )
    pdf = collect_arrow(per_cust).to_pandas()  # bounded: O(customers) rollup (docstring)
    pdf = pdf.sort_values(["cents", "o_custkey"], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
    n = len(pdf)
    base, rem = divmod(n, 10)
    sizes = np.full(10, base, np.int64)
    sizes[:rem] += 1
    decile = np.repeat(np.arange(1, 11, dtype=np.int64), sizes)
    pdf["decile"] = decile[:n]
    out = pdf.groupby("decile", as_index=False).agg(
        n_cust=("o_custkey", "size"), decile_cents=("cents", "sum"))
    total = int(out["decile_cents"].sum())
    out["share_pm"] = (out["decile_cents"] * 1000 // max(total, 1)).astype(np.int64)
    t = pa.table({"decile": pa.array(out["decile"], pa.int64()),
                  "n_cust": pa.array(out["n_cust"], pa.int64()),
                  "decile_cents": pa.array(out["decile_cents"], pa.int64()),
                  "share_pm": pa.array(out["share_pm"], pa.int64())})
    return rd.from_arrow(t)


# ---- reset-at-zero running balance: the cummin closed form ----
def q_part_stock_floor(sf_dir: str) -> rd.Dataset:
    """Per-part running stock where returns subtract and the balance
    floors at zero: b_t = max(0, b_{t-1} + delta_t).  The recurrence
    looks inherently sequential, but has the classic closed form
    b_t = cum_t - min(0, min_{s<=t} cum_s) — one segmented cumsum plus
    one segmented cummin, both loop-free (the per-run interference is
    killed by adding run_index * 2^40 before a GLOBAL minimum.accumulate
    — deltas are bounded far below 2^40 per run).  The oracle states the
    same closed form as two stacked window CTEs.  One part-hash
    partition, one lexsort."""
    ds = _read(sf_dir, "lineitem",
               ["l_partkey", "l_orderkey", "l_linenumber", "l_shipdate",
                "l_quantity", "l_returnflag"])

    _OUT = pa.schema([("l_partkey", pa.int64()), ("l_orderkey", pa.int64()),
                      ("l_linenumber", pa.int64()), ("balance", pa.int64())])

    def ledger_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = pc.cast(t["l_linenumber"], pa.int64()).to_numpy(zero_copy_only=False)
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False).view(np.int64)
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64()).to_numpy(zero_copy_only=False)
        ret = t["l_returnflag"].to_numpy(zero_copy_only=False) == "R"
        delta = np.where(ret, -qty, qty)
        order = np.lexsort((ln, ok, sd, pk))
        pk, ok, ln, delta = pk[order], ok[order], ln[order], delta[order]
        starts, ends = run_boundaries(pk)
        run_idx = np.repeat(np.arange(len(starts), dtype=np.int64), ends - starts)
        cs = np.cumsum(delta)
        base = np.concatenate([[0], cs[ends[:-1] - 1]]) if len(starts) else cs[:0]
        cum = cs - base[run_idx]  # segmented cumsum
        # segmented cummin via per-run offset + global accumulate: offsets
        # must DECREASE with run index so a minimum can never leak forward
        # from an earlier run (earlier runs sit strictly higher).  Bound:
        # n_runs * 2^40 must stay under 2^63 -> < 2^23 (~8M) parts per
        # partition; size num_parts up before that binds (|cum| < 2^40
        # holds for any real ledger: quantities are < 2^10 per row)
        OFF = np.int64(1) << 40
        off = (np.int64(len(starts)) - run_idx) * OFF
        shifted = cum + off
        cmin = np.minimum.accumulate(shifted) - off
        balance = cum - np.minimum(cmin, 0)
        return pa.table({"l_partkey": pa.array(pk, pa.int64()),
                         "l_orderkey": pa.array(ok, pa.int64()),
                         "l_linenumber": pa.array(ln, pa.int64()),
                         "balance": pa.array(balance, pa.int64())})

    return hash_partitioned(
        ds, lambda t: _key_arrays(t, ["l_partkey"]), ledger_part, num_parts=32,
    ).sort(["l_partkey", "l_orderkey", "l_linenumber"])


# ---- per-group argmax with deterministic ties: modal event type ----
def q_user_modal_type(sf_dir: str) -> rd.Dataset:
    """Each user's most frequent event type, ties broken by the
    lexicographically smallest type — the per-group MODE/argmax shape
    (priority_mode is the GLOBAL mode; this is the grouped variant whose
    result is one row per key).  Plan: per-batch (user, type) partial
    counts shrink the shuffle to <= |users| x |types| rows; one user-hash
    partition folds exact counts and takes the argmax by a (count DESC,
    type ASC) lexsort + run head."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "event_type", "n"])

    _OUT = pa.schema([("user_id", pa.int64()), ("modal_type", pa.string()),
                      ("n", pa.int64())])

    def modal_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        g = t.group_by(["user_id", "event_type"]).aggregate([("n", "sum")])
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        n = g["n_sum"].to_numpy(zero_copy_only=False)
        tcode, tuniq = pd.factorize(pd.Series(et), sort=True)
        order = np.lexsort((tcode, -n, uid))
        uid, tcode, n = uid[order], tcode[order], n[order]
        starts, _ends = run_boundaries(uid)
        return pa.table({"user_id": pa.array(uid[starts], pa.int64()),
                         "modal_type": pa.array(tuniq[tcode[starts]], pa.string()),
                         "n": pa.array(n[starts], pa.int64())})

    return hash_partitioned(
        ds.map_batches(pre, batch_format="pyarrow"),
        lambda t: _key_arrays(t, ["user_id"]), modal_part, num_parts=32,
    ).sort("user_id")


# ---- correlation matrix over aggregated series, exact numerators ----
def q_type_correlation_matrix(sf_dir: str) -> rd.Dataset:
    """Pairwise Pearson building blocks between event types' HOURLY count
    series — the cross-series correlation matrix, float-free: for every
    unordered type pair output n (common hour count over the full hour
    span), sum_x, sum_y, sum_xy, sum_xx, sum_yy; corr = (n*sxy - sx*sy) /
    sqrt((n*sxx - sx^2)(n*syy - sy^2)) is one float the ANALYST takes —
    the engine and oracle compare only integers.  Plan: one partial pass
    folds events to (hour, type) counts; the driver pivots the O(hours x
    types) cells (bounded: the series is itself an aggregate) and forms
    the 15 pair rows.  Missing (hour, type) cells count 0 — the hour
    domain is the union of observed hours."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        HOUR = 3_600_000_000
        g = pa.table({"hour": pa.array((ts // HOUR), pa.int64()),
                      "event_type": t["event_type"]}).group_by(
            ["hour", "event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["hour", "event_type", "n"])

    pdf = (ds.map_batches(partial, batch_format="pyarrow")
           .to_pandas())  # bounded: O(hours x types) cells per block
    pdf = pdf.groupby(["hour", "event_type"], as_index=False)["n"].sum()
    piv = pdf.pivot(index="hour", columns="event_type", values="n").fillna(0).astype(np.int64)
    types = sorted(piv.columns)
    rows = []
    nh = len(piv)
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            x = piv[a].to_numpy(np.int64)
            y = piv[b].to_numpy(np.int64)
            rows.append((a, b, nh, int(x.sum()), int(y.sum()),
                         int((x * y).sum()), int((x * x).sum()), int((y * y).sum())))
    cols = list(zip(*rows)) if rows else [[]] * 8
    out = pa.table({
        "type_a": pa.array(cols[0], pa.string()),
        "type_b": pa.array(cols[1], pa.string()),
        "n": pa.array(cols[2], pa.int64()),
        "sum_x": pa.array(cols[3], pa.int64()),
        "sum_y": pa.array(cols[4], pa.int64()),
        "sum_xy": pa.array(cols[5], pa.int64()),
        "sum_xx": pa.array(cols[6], pa.int64()),
        "sum_yy": pa.array(cols[7], pa.int64()),
    })
    return rd.from_arrow(out)


# ---- schema-evolution hop: split-write, union-read, same oracle ----
def q_schema_evolution_counts(sf_dir: str) -> rd.Dataset:
    """Per-type event counts through a SCHEMA-EVOLUTION hop: the events
    table splits into two parquet snapshots — the "old" half (odd
    event_id) written WITHOUT the props column, the "new" half (even)
    with it — then ``sources.tables.read_parquet_union`` reads both as
    one Dataset over the union schema (props null-filled for the old
    half) and aggregates (n, n_props).  The oracle computes the same
    numbers straight off the base table (props counted only where
    event_id is even), so the whole write -> union-read -> aggregate hop
    is value-pinned — the token_stats_csv same-oracle-through-a-hop
    pattern applied to schema evolution.  Staging is PID-keyed under
    /tmp (single-node sandbox; multi-node needs a shared path, the
    csvio NODE-LOCALITY caveat)."""
    import os
    import shutil

    import pyarrow.parquet as _pq

    from monocator_ray.sources.tables import read_parquet_union

    ds = _read(sf_dir, "events", ["event_id", "event_type", "props"])
    # reap other processes' stale staging (the q_crawl_flagship hygiene:
    # only dead owners, only idle > 2h)
    import time as _time

    for d in os.listdir("/tmp"):
        if not d.startswith("monocator_schemaev_"):
            continue
        p = os.path.join("/tmp", d)
        try:
            pid = int(d.split("_")[2])
            try:
                os.kill(pid, 0)
                continue  # owner alive
            except ProcessLookupError:
                pass
            except PermissionError:
                continue
            if _time.time() - os.path.getmtime(p) > 7200:
                shutil.rmtree(p, ignore_errors=True)
        except (OSError, ValueError, IndexError):
            pass
    base = os.path.join(
        "/tmp",
        f"monocator_schemaev_{os.getpid()}_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)

    def write_split(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        even = t.filter(pa.array(eid % 2 == 0)).select(["event_type", "props"])
        odd = t.filter(pa.array(eid % 2 == 1)).select(["event_type"])
        import uuid

        tag = uuid.uuid4().hex[:12]
        if even.num_rows:
            tmp = os.path.join(base, f".tmp_new_{tag}")
            _pq.write_table(even, tmp)
            os.replace(tmp, os.path.join(base, f"new_{tag}.parquet"))
        if odd.num_rows:
            tmp = os.path.join(base, f".tmp_old_{tag}")
            _pq.write_table(odd, tmp)
            os.replace(tmp, os.path.join(base, f"old_{tag}.parquet"))
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    ds.map_batches(write_split, batch_format="pyarrow").to_pandas()  # bounded: 1 scalar per block (write-pass drain)
    files = [os.path.join(base, f) for f in sorted(os.listdir(base))
             if f.endswith(".parquet")]
    uni = read_parquet_union(files)

    def agg(t: pa.Table) -> pa.Table:
        g = pa.table({"event_type": t["event_type"],
                      "has_props": pc.cast(pc.is_valid(t["props"]), pa.int64())}
                     ).group_by("event_type").aggregate(
            [([], "count_all"), ("has_props", "sum")])
        return g.rename_columns(["event_type", "n", "n_props"])

    pdf = (uni.map_batches(agg, batch_format="pyarrow")
           .to_pandas())  # bounded: O(types) cells per block
    pdf = (pdf.groupby("event_type", as_index=False).sum()
           .sort_values("event_type").reset_index(drop=True))
    out = pa.table({"event_type": pa.array(pdf["event_type"], pa.string()),
                    "n": pa.array(pdf["n"], pa.int64()),
                    "n_props": pa.array(pdf["n_props"], pa.int64())})
    return rd.from_arrow(out)


# ---- TPC-H Q10 shape: returned-item customer ranking ----
def q_returned_item_ranking(sf_dir: str, k: int = 20) -> rd.Dataset:
    """Top-20 customers by revenue lost to returns for orders placed in
    1995Q4 (TPC-H Q10).  Plan: lineitem filters to returnflag='R' and
    pre-aggregates BY ORDERKEY before the only fact exchange (the orders
    join, itself pre-filtered to the quarter so the join's right side is
    ~1/24th of orders); per-customer exact sums via one hash partition
    with LOCAL top-k inside each (driver merges O(parts x k) candidate
    rows, the q_top_terms discipline); the 20 winners' attributes come
    from a key-filtered parquet read of the customer dim + the nation
    broadcast — at true fact scale that lookup becomes a 20-key
    semi-join, the stated swap."""
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"])

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        r = _disc_rev_cpc(t)
        g = pa.table({"l_orderkey": t["l_orderkey"], "r": r}).group_by(
            "l_orderkey").aggregate([("r", "sum")])
        return g.rename_columns(["l_orderkey", "r"])

    lo = pa.scalar(np.datetime64("1995-10-01", "us"))
    hi = pa.scalar(np.datetime64("1996-01-01", "us"))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                             pc.less(t["o_orderdate"], hi)))
        return t.select(["o_orderkey", "o_custkey"])

    j = li.map_batches(li_partial, batch_format="pyarrow").join(
        orders.map_batches(o_filter, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def topk_part(t: pa.Table) -> pa.Table:
        g = t.select(["o_custkey", "r"]).group_by("o_custkey").aggregate(
            [("r", "sum")]).rename_columns(["o_custkey", "revenue_cpc"])
        df = g.to_pandas().sort_values(["revenue_cpc", "o_custkey"],
                                       ascending=[False, True],
                                       kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = hash_partitioned(
        j, lambda t: _key_arrays(t, ["o_custkey"]), topk_part, num_parts=32,
    ).to_pandas()  # bounded: O(parts x k) local-topk candidates
    cand = cand.sort_values(["revenue_cpc", "o_custkey"],
                            ascending=[False, True], kind="mergesort").head(k)
    import pyarrow.dataset as pads

    winners = cand["o_custkey"].to_numpy(np.int64)
    ctab = pads.dataset(f"{sf_dir}/customer.parquet").to_table(
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filter=pads.field("c_custkey").isin(winners.tolist()),
    ).to_pandas()  # bounded: k winner rows (key-filtered dim read)
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()  # bounded: dimension table
    out = cand.merge(ctab, left_on="o_custkey", right_on="c_custkey")
    out = out.merge(nation[["n_nationkey", "n_name"]],
                    left_on="c_nationkey", right_on="n_nationkey")
    out["acctbal_cents"] = (out["c_acctbal"] * 100).round().astype(np.int64)
    out = out.sort_values(["revenue_cpc", "o_custkey"],
                          ascending=[False, True], kind="mergesort")
    t = pa.table({"c_custkey": pa.array(out["o_custkey"], pa.int64()),
                  "c_name": pa.array(out["c_name"], pa.string()),
                  "revenue_cpc": pa.array(out["revenue_cpc"], pa.int64()),
                  "acctbal_cents": pa.array(out["acctbal_cents"], pa.int64()),
                  "n_name": pa.array(out["n_name"], pa.string())})
    return rd.from_arrow(t)


# ---- sketch-valued incremental view: HLL distinct users per type ----
def q_incremental_hll_users(sf_dir: str) -> rd.Dataset:
    """Incrementally-maintained approximate distinct-user view: the events
    table ingests as TWO increments (event_id parity split) of per-type
    HLL sketches into a persistent aggstore, and the view read folds the
    generations by register max — O(increment) refresh work where the
    exact view would re-scan the corpus (rows-only: the estimate has no
    SQL form; tests/test_stores pins two-increment == one-shot as
    REGISTER-IDENTICAL bytes and the estimate within 5% of exact).
    Output: (event_type, est_users) with the estimate floored to int64 —
    deterministic, so the driver's stability check holds."""
    import os
    import shutil

    from monocator_ray.sources.aggstore import ingest_hll_partials, read_merged
    from monocator_ray.state.hll import HLL

    ds = _read(sf_dir, "events", ["event_id", "event_type", "user_id"])

    def hashed(t: pa.Table) -> pa.Table:
        # NOTE: hash_str64 comes from the module-level import — a nested
        # `from monocator_ray...` here would EXECUTE on workers and die
        # under the real driver (ROUND_NOTES hard-won fact #4)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        h = hash_str64([str(u) for u in uid.tolist()])
        return pa.table({"event_id": t["event_id"], "event_type": t["event_type"],
                         "uh": pa.array(h.view(np.int64), pa.int64())})

    hd = ds.map_batches(hashed, batch_format="pyarrow")
    store = f"/tmp/monocator_hllview_{os.getpid()}_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(store, ignore_errors=True)
    def _parity(par):
        def fn(t: pa.Table) -> pa.Table:
            eid = t["event_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(eid % 2 == par))
        return fn

    for parity in (0, 1):
        inc = hd.map_batches(_parity(parity), batch_format="pyarrow")
        ingest_hll_partials(inc, store, ["event_type"], "uh", "hll_users")
    view = read_merged(store, ["event_type"])
    est = [int(HLL.loads(b).estimate()) for b in view["hll_users"]]
    out = pa.table({"event_type": pa.array(view["event_type"], pa.string()),
                    "est_users": pa.array(est, pa.int64())})
    return rd.from_arrow(out)


# ---- TPC-H Q12 shape: lateness CASE-aggregation per priority class ----
def q_late_shipments(sf_dir: str, late_days: int = 90) -> rd.Dataset:
    """Per order-priority: how many lineitems shipped more than
    ``late_days`` days after the order date, split high-priority
    (1-URGENT/2-HIGH) vs other (TPC-H Q12's CASE-inside-aggregate over a
    join, with the ship-mode axis mapped to this schema's lateness axis).
    Plan: orders ships (orderkey -> (orderdate, is_high)) through the
    partitioned join — packed as int64 days*2+flag so the join payload is
    ONE column; each joined batch folds to O(2) partial rows; driver
    combine."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def o_pack(t: pa.Table) -> pa.Table:
        days = t["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[D]").astype(np.int64)
        pr = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        high = np.isin(pr, ("1-URGENT", "2-HIGH")).astype(np.int64)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "packed": pa.array(days * 2 + high, pa.int64())})

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def li_days(t: pa.Table) -> pa.Table:
        days = t["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[D]").astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "ship_days": pa.array(days, pa.int64())})

    j = li.map_batches(li_days, batch_format="pyarrow").join(
        orders.map_batches(o_pack, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def fold(t: pa.Table) -> pa.Table:
        packed = t["packed"].to_numpy(zero_copy_only=False)
        ship = t["ship_days"].to_numpy(zero_copy_only=False)
        high = (packed & 1).astype(bool)
        late = ship - (packed >> 1) > late_days
        return pa.table({
            "priority_class": pa.array(["high", "other"], pa.string()),
            "n_items": pa.array([int(high.sum()), int((~high).sum())], pa.int64()),
            "n_late": pa.array([int((late & high).sum()),
                                int((late & ~high).sum())], pa.int64()),
        })

    pdf = (j.map_batches(fold, batch_format="pyarrow")
           .to_pandas())  # bounded: 2 rows per block
    pdf = (pdf.groupby("priority_class", as_index=False).sum()
           .sort_values("priority_class").reset_index(drop=True))
    out = pa.table({"priority_class": pa.array(pdf["priority_class"], pa.string()),
                    "n_items": pa.array(pdf["n_items"], pa.int64()),
                    "n_late": pa.array(pdf["n_late"], pa.int64())})
    return rd.from_arrow(out)


# ---- windowed conditional count: COUNT(*) FILTER inside a window frame ----
def q_running_error_count(sf_dir: str) -> rd.Dataset:
    """Per event: how many 'error' events the same user has produced up to
    and including this one (``COUNT(*) FILTER (WHERE ...) OVER (PARTITION
    BY user ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)``) — the
    FILTER-clause-inside-a-window shape, which none of the other window
    queries exercise.  One user-hash partition, one lexsort, one masked
    segmented cumsum — no per-user dispatch, no second shuffle."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    _OUT = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                      ("n_errors", pa.int64())])

    def part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        mask = (g["event_type"].to_numpy(zero_copy_only=False) == "error") \
            .astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, eid, mask = uid[order], eid[order], mask[order]
        starts, ends = run_boundaries(uid)
        cum = np.cumsum(mask)
        # subtract the cumulative count just before each user's run start
        base = np.where(starts > 0, cum[starts - 1], 0)
        n_err = cum - np.repeat(base, ends - starts)
        return pa.table({"event_id": pa.array(eid, pa.int64()),
                         "user_id": pa.array(uid, pa.int64()),
                         "n_errors": pa.array(n_err, pa.int64())})

    return hash_partitioned(
        ds,
        lambda t: _key_arrays(t, ["user_id"]),
        part,
        num_parts=32,
    ).sort("event_id")


# ---- SCD2 interval build: collapse consecutive equal states ----
def q_scd2_intervals(sf_dir: str) -> rd.Dataset:
    """Slowly-changing-dimension type-2 construction from a change log:
    per user, consecutive events with the SAME event_type (ordered by ts,
    event_id) collapse into one validity interval [valid_from, valid_to)
    where valid_to is the next interval's valid_from (NULL while current)
    — the ETL shape warehouses build dimension history with.  Per-user
    hash partitions; run detection over the (user, type) pair via
    run_boundaries; valid_to is the next run's start within the same user
    — all one vectorized pass, no join back, no LEAD shuffle."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    _OUT = pa.schema([("user_id", pa.int64()), ("event_type", pa.string()),
                      ("valid_from", pa.timestamp("us")),
                      ("valid_to", pa.timestamp("us")),
                      ("n_rows", pa.int64())])

    def part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        # consecutive-run boundaries over the (user, type) PAIR: a run ends
        # when either the user or the type changes
        starts, ends = run_boundaries(uid, et)
        valid_from = ts[starts]
        run_uid = uid[starts]
        # next run's start within the same user, else NULL (current state)
        nxt = np.empty(len(starts), np.int64)
        nxt[:-1] = valid_from[1:]
        nxt[-1] = 0
        same_user = np.empty(len(starts), bool)
        same_user[:-1] = run_uid[1:] == run_uid[:-1]
        same_user[-1] = False
        return pa.table(
            {"user_id": pa.array(run_uid, pa.int64()),
             "event_type": pa.array(et[starts], pa.string()),
             "valid_from": pa.array(valid_from.view("datetime64[us]")),
             "valid_to": pa.array(nxt.view("datetime64[us]"),
                                  mask=~same_user),
             "n_rows": pa.array(ends - starts, pa.int64())})

    return hash_partitioned(
        ds,
        lambda t: _key_arrays(t, ["user_id"]),
        part,
        num_parts=32,
    ).sort(["user_id", "valid_from", "event_type"])


def _exact_quantiles_disc(pc_ds, col: str, qs=(0.25, 0.5, 0.75),
                          bins: int = 4096) -> list[int]:
    """Exact order statistics (quantile_disc convention: 0-based rank
    ``ceil(q*n) - 1``) of an int64 column WITHOUT a global sort — the
    q_global_median_price two-pass selection generalized to several
    quantiles sharing one histogram: (A) one scan folds min/max/count;
    (B) one scan folds a fixed-width histogram over [min, max]; (C) one
    scan collects ONLY the bins containing the target ranks (n/bins rows
    each in expectation) and selects within them.  Driver state is O(bins)
    throughout."""
    import math

    # bounded: O(blocks) 3-int partials
    parts = collect_arrow(pc_ds.map_batches(
        lambda t: pa.table(
            {"lo": pa.array([int(t[col].to_numpy(zero_copy_only=False).min())
                             if t.num_rows else 2**62], pa.int64()),
             "hi": pa.array([int(t[col].to_numpy(zero_copy_only=False).max())
                             if t.num_rows else -(2**62)], pa.int64()),
             "n": pa.array([t.num_rows], pa.int64())}),
        batch_format="pyarrow"))  # bounded: O(blocks) 3-int partials
    lo = int(pc.min(parts["lo"]).as_py())
    hi = int(pc.max(parts["hi"]).as_py())
    total = int(pc.sum(parts["n"]).as_py())
    if total == 0:
        return [0 for _ in qs]
    step = max(1, (hi - lo) // bins + 1)
    targets = [max(0, math.ceil(q * total) - 1) for q in qs]

    def hist_part(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        if not len(v):
            return pa.table({"bin": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        b = (v - lo) // step
        u, inv = np.unique(b, return_inverse=True)
        return pa.table({"bin": pa.array(u, pa.int64()),
                         "n": pa.array(np.bincount(inv).astype(np.int64),
                                       pa.int64())})

    pdf = driver_grouped_agg(
        pc_ds.map_batches(hist_part, batch_format="pyarrow"),
        ["bin"], [("n", "sum")], ["bin", "n"],
    ).sort_values("bin").reset_index(drop=True)  # bounded: O(bins)
    cum = pdf["n"].cumsum().to_numpy()
    bin_ids = pdf["bin"].to_numpy()
    need_bins = sorted({int(bin_ids[int(np.searchsorted(cum, tgt + 1))])
                        for tgt in targets})
    rank_base = {b: int(cum[np.searchsorted(bin_ids, b)] - pdf["n"].iloc[
        int(np.searchsorted(bin_ids, b))]) for b in need_bins}
    need = set(need_bins)

    def bin_filter(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        b = (v - lo) // step
        keep = np.isin(b, list(need))
        return pa.table({"v": pa.array(v[keep], pa.int64())})

    # bounded: target bins only (n/bins rows each in expectation)
    vals = collect_arrow(pc_ds.map_batches(
        bin_filter, batch_format="pyarrow"))["v"].to_numpy()  # bounded: target bins only (n/bins each in expectation)
    vals = np.sort(vals)
    vbins = (vals - lo) // step
    out = []
    for tgt in targets:
        b = int(bin_ids[int(np.searchsorted(cum, tgt + 1))])
        within = vals[vbins == b]
        out.append(int(within[tgt - rank_base[b]]))
    return out


# ---- RFM segmentation: global quartile scores over per-customer aggregates --
def q_rfm_segments(sf_dir: str) -> rd.Dataset:
    """Classic recency/frequency/monetary segmentation: per customer
    compute R = last order date, F = order count, M = revenue cents; score
    each 1-4 by the GLOBAL quartile thresholds (quantile_disc convention,
    bucket = 1 + #{thresholds strictly below}); return customer counts per
    (r, f, m) segment (<= 64 rows).  The thresholds come from the two-pass
    histogram selection (_exact_quantiles_disc) — three streaming scans of
    the per-customer aggregate per metric, NO global sort, driver state
    O(bins).  The per-customer aggregate itself is one partitioned
    shuffle."""
    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"])

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": t["o_custkey"],
             "r": pa.array(t["o_orderdate"].to_numpy(zero_copy_only=False)
                           .view(np.int64), pa.int64()),
             "cents": _cents(t["o_totalprice"])})

    def pre_agg(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate(
            [("r", "max"), ("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["o_custkey", "r", "m", "f"])

    pc_ds = partitioned_aggregate(
        orders.map_batches(shape, batch_format="pyarrow")
        .map_batches(pre_agg, batch_format="pyarrow"),
        ["o_custkey"],
        [("r", "max"), ("m", "sum"), ("f", "sum")],
        ["o_custkey", "r", "m", "f"],
        num_parts=32,
    ).materialize()

    qr = _exact_quantiles_disc(pc_ds, "r")
    qf = _exact_quantiles_disc(pc_ds, "f")
    qm = _exact_quantiles_disc(pc_ds, "m")

    def score(t: pa.Table) -> pa.Table:
        def bucket(v, ts_):
            v = v.to_numpy(zero_copy_only=False)
            b = np.ones(len(v), np.int64)
            for th in ts_:
                b += (v > th)
            return b

        return pa.table(
            {"r_score": pa.array(bucket(t["r"], qr), pa.int64()),
             "f_score": pa.array(bucket(t["f"], qf), pa.int64()),
             "m_score": pa.array(bucket(t["m"], qm), pa.int64()),
             "n": pa.array(np.ones(t.num_rows, np.int64), pa.int64())})

    pdf = driver_grouped_agg(
        pc_ds.map_batches(score, batch_format="pyarrow"),
        ["r_score", "f_score", "m_score"], [("n", "sum")],
        ["r_score", "f_score", "m_score", "n_customers"],
    )  # bounded: <= 64 segment rows
    pdf = pdf.sort_values(["r_score", "f_score", "m_score"],
                          kind="mergesort").reset_index(drop=True)
    return rd.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False))


# ---- Pareto 80/20: smallest top-revenue customer set covering 80% ----
def q_pareto_customers(sf_dir: str) -> rd.Dataset:
    """How many top customers cover >= 80% of total revenue (and exactly
    how much they cover) — the cumulative-threshold-after-ordering shape,
    computed WITHOUT any global sort: the crossing value v* is a WEIGHTED
    quantile, found by the histogram-selection pattern with per-bin
    weight sums (one scan), then the crossing bin's values collect
    (bounded) and a local descending cumsum finds how many v*-valued
    customers are needed.  n = #{cents > v*} + k; covered = sum(cents >
    v*) + k*v* — identical to the ROW_NUMBER/SUM OVER (ORDER BY cents
    DESC) oracle regardless of how ties are ordered."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    BINS = 4096

    def ocents(t: pa.Table) -> pa.Table:
        g = pa.table({"o_custkey": t["o_custkey"],
                      "cents": _cents(t["o_totalprice"])}).group_by(
            "o_custkey").aggregate([("cents", "sum")])
        return g.rename_columns(["o_custkey", "cents"])

    pc_ds = partitioned_aggregate(
        orders.map_batches(ocents, batch_format="pyarrow"),
        ["o_custkey"], [("cents", "sum")], ["o_custkey", "cents"],
        num_parts=32,
    ).materialize()

    # one scan: min/max/count/total + per-bin (count, weight) histogram
    def hist_part(t: pa.Table) -> pa.Table:
        v = t["cents"].to_numpy(zero_copy_only=False)
        if not len(v):
            return pa.table({"bin": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        step = max(1, 10**10 // BINS)  # per-customer cents bound: 10^10
        b = v // step
        u, inv = np.unique(b, return_inverse=True)
        # exact integer per-bin weight sums (bincount's weights= path is
        # float64 — inexact past 2^53): scatter-add into int64
        w = np.zeros(len(u), np.int64)
        np.add.at(w, inv, v)
        return pa.table(
            {"bin": pa.array(u, pa.int64()),
             "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
             "w": pa.array(w, pa.int64()),
             "lo": pa.array(np.full(len(u), v.min(), np.int64), pa.int64()),
             "hi": pa.array(np.full(len(u), v.max(), np.int64), pa.int64())})

    pdf = driver_grouped_agg(
        pc_ds.map_batches(hist_part, batch_format="pyarrow"),
        ["bin"], [("n", "sum"), ("w", "sum"), ("lo", "min"), ("hi", "max")],
        ["bin", "n", "w", "lo", "hi"],
    ).sort_values("bin", ascending=False).reset_index(drop=True)  # bounded: O(BINS)
    step = max(1, 10**10 // BINS)
    total_cents = int(pdf["w"].sum())
    total_customers = int(pdf["n"].sum())
    # descending cumulative weight; first bin where 5*cum >= 4*total
    cumw = pdf["w"].cumsum().to_numpy()
    cumn = pdf["n"].cumsum().to_numpy()
    bi = int(np.searchsorted(5 * cumw, 4 * total_cents))
    the_bin = int(pdf["bin"].iloc[bi])
    n_above = int(cumn[bi - 1]) if bi else 0
    w_above = int(cumw[bi - 1]) if bi else 0

    def bin_filter(t: pa.Table) -> pa.Table:
        v = t["cents"].to_numpy(zero_copy_only=False)
        return pa.table({"v": pa.array(v[v // step == the_bin], pa.int64())})

    # bounded: one histogram bin (n/BINS rows in expectation)
    vals = np.sort(collect_arrow(pc_ds.map_batches(
        bin_filter, batch_format="pyarrow"))["v"].to_numpy())[::-1]  # bounded: one histogram bin
    cum_in = w_above + np.cumsum(vals)
    k = int(np.searchsorted(5 * cum_in, 4 * total_cents)) + 1
    out = pa.table(
        {"n_customers": pa.array([n_above + k], pa.int64()),
         "covered_cents": pa.array([int(cum_in[k - 1])], pa.int64()),
         "total_cents": pa.array([total_cents], pa.int64()),
         "total_customers": pa.array([total_customers], pa.int64())})
    return rd.from_arrow(out)


_DELTA_EXPORTED: set[str] = set()


def q_events_delta(sf_dir: str) -> rd.Dataset:
    """Daily click/purchase counts through a DELTA-TABLE hop — the fifth
    source-format parity demonstration (CSV/IPC/ORC/Avro each have one),
    and the only one whose re-read PRUNES: events export to a Delta table
    hive-partitioned by event_type (sources/delta.py — worker-sharded
    data files, one O_EXCL log commit), and the re-read passes
    ``filters={'event_type': ['click', 'purchase']}`` so only those two
    partitions' files are ever planned or opened.  The aggregation over
    the pruned read matches the WHERE-IN parquet oracle bit-for-bit.
    Same PID-keyed once-per-process staging as the other hops."""
    import os
    import shutil

    from monocator_ray.sources.delta import read_delta, write_delta

    ensure_shipped()
    base = os.environ.get("MONOCATOR_CSV_DIR", "/tmp")
    out = os.path.join(
        base,
        f"monocator_delta_events_{os.getpid()}_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    if out not in _DELTA_EXPORTED:
        from monocator_ray.sources.csvio import cleanup_stale_staging

        cleanup_stale_staging(base, "monocator_delta_events_", out)
        shutil.rmtree(out, ignore_errors=True)
        write_delta(
            _read(sf_dir, "events", ["event_id", "ts", "event_type"]),
            out,
            partition_by=["event_type"],
        )
        _DELTA_EXPORTED.add(out)
    ds = read_delta(out, filters={"event_type": ["click", "purchase"]})

    def wnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "day": pc.floor_temporal(batch["ts"], unit="day"),
            }
        )

    return (
        ds.map_batches(wnd, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n"))
        .sort(["event_type", "day"])
    )


# ---- exponential time-decay aggregate, exact in integers ----
def q_decayed_revenue(sf_dir: str) -> rd.Dataset:
    """Per order priority: revenue with an exponential time decay
    (half-life 30 days against the corpus's newest order date) computed
    EXACTLY in integers — each order contributes ``cents >> min(age_days
    // 30, 62)``, a right shift both engines evaluate identically, so the
    recency-weighted aggregate the float ``exp(-age/tau)`` version cannot
    hash-match IS oracle-checkable.  Plan: one O(1) max-date fold, then
    one vectorized shift + 5-group aggregate pass — no shuffle beyond the
    O(priorities) driver fold."""
    ds = _read(sf_dir, "orders",
               ["o_orderpriority", "o_orderdate", "o_totalprice"])
    DAY_US = np.int64(86_400_000_000)

    # bounded: one int per block
    ref = collect_arrow(ds.map_batches(
        lambda t: pa.table({"m": pa.array(
            [int(t["o_orderdate"].to_numpy(zero_copy_only=False)
                 .view(np.int64).max())] if t.num_rows else [],
            pa.int64())}),
        batch_format="pyarrow"))  # bounded: one int per block
    ref_us = int(pc.max(ref["m"]).as_py())

    def fold(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy(zero_copy_only=False).view(np.int64)
        shift = np.minimum((ref_us - d) // DAY_US // 30, 62)
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        dec = cents >> shift
        g = pa.table({"o_orderpriority": t["o_orderpriority"],
                      "decayed_cents": pa.array(dec, pa.int64())}).group_by(
            "o_orderpriority").aggregate([("decayed_cents", "sum")])
        return g.rename_columns(["o_orderpriority", "decayed_cents"])

    pdf = driver_grouped_agg(
        ds.map_batches(fold, batch_format="pyarrow"),
        ["o_orderpriority"], [("decayed_cents", "sum")],
        ["o_orderpriority", "decayed_cents"],
    )  # bounded: O(priorities)
    pdf = pdf.sort_values("o_orderpriority").reset_index(drop=True)
    return rd.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False))


# ---- grouped median over a LAG-derived series ----
def q_median_order_gap(sf_dir: str) -> rd.Dataset:
    """Per customer with >= 2 orders: the median whole-day gap between
    consecutive orders (ordered by date, orderkey) — a grouped order
    statistic over a WINDOW-DERIVED series, composing the LAG diff and
    the lower-median convention (_grouped_lower_median_sort, the shared
    quantile_disc(.5) implementation) inside ONE customer-hash partition
    pass: sort once for the gaps, once for the medians, no join, no
    second shuffle."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    DAY_US = np.int64(86_400_000_000)

    _OUT = pa.schema([("o_custkey", pa.int64()),
                      ("median_gap_days", pa.int64())])

    def part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        cust = g["o_custkey"].to_numpy(zero_copy_only=False)
        date = g["o_orderdate"].to_numpy(zero_copy_only=False).view(np.int64)
        okey = g["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, date, cust))
        cust, date = cust[order], date[order]
        n = len(cust)
        is_gap = np.ones(n, bool)
        starts, _ends = run_boundaries(cust)
        is_gap[starts] = False  # first order of each customer has no gap
        gaps = np.empty(n, np.int64)
        gaps[1:] = (date[1:] - date[:-1]) // DAY_US
        gcust, gvals = cust[is_gap], gaps[is_gap]
        if not len(gcust):
            return _OUT.empty_table()
        key, vals, gstarts, gends, mid = _grouped_lower_median_sort(
            gcust, gvals)
        return pa.table({"o_custkey": pa.array(key[gstarts], pa.int64()),
                         "median_gap_days": pa.array(vals[mid], pa.int64())})

    return hash_partitioned(
        ds,
        lambda t: _key_arrays(t, ["o_custkey"]),
        part,
        num_parts=32,
    ).sort("o_custkey")


# ---- diversity index: exact Gini-Simpson in integer permille ----
def q_user_diversity(sf_dir: str) -> rd.Dataset:
    """Per user (with >= 2 events): the Gini-Simpson diversity of their
    event-type mix, exact in integer permille — diversity = 1 -
    sum(c_i^2)/n^2 becomes ``1000 - (1000 * sum(c_i^2)) // n^2``, a
    RATIONAL index (unlike Shannon entropy, whose logs can never
    hash-match across engines).  One user-hash partition: per-(user,
    type) counts and the per-user fold both inside the partition —
    no second shuffle."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    _OUT = pa.schema([("user_id", pa.int64()), ("n_events", pa.int64()),
                      ("diversity_pm", pa.int64())])

    def part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((et, uid))
        uid, et = uid[order], et[order]
        # (user, type) run counts, then per-user sum of squares
        starts, ends = run_boundaries(uid, et)
        c = (ends - starts).astype(np.int64)
        run_uid = uid[starts]
        ustarts, uends = run_boundaries(run_uid)
        sumsq = np.add.reduceat(c * c, ustarts)
        n = np.add.reduceat(c, ustarts)
        keep = n >= 2
        div = 1000 - (1000 * sumsq[keep]) // (n[keep] * n[keep])
        return pa.table({"user_id": pa.array(run_uid[ustarts][keep],
                                             pa.int64()),
                         "n_events": pa.array(n[keep], pa.int64()),
                         "diversity_pm": pa.array(div, pa.int64())})

    return hash_partitioned(
        ds,
        lambda t: _key_arrays(t, ["user_id"]),
        part,
        num_parts=32,
    ).sort("user_id")


# ---- Benford leading-digit audit histogram ----
def q_benford_digits(sf_dir: str) -> rd.Dataset:
    """Leading-digit distribution of order totals (in cents) — the
    Benford's-law audit scan: counts per first digit 1-9 plus each
    digit's observed share in exact permille.  Leading-digit extraction
    goes through the DECIMAL STRING on both engines (LEFT(CAST(...)) in
    the oracle, numpy unicode slice here) so no float log10 edge case at
    powers of ten can diverge.  Per-batch 9-bucket partials, O(9) driver
    fold."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def fold(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        # astype("U1") keeps only the first character of the decimal string
        digits = cents.astype("U1").view(np.uint32).astype(np.int64) - ord("0")
        counts = np.bincount(digits, minlength=10)[1:10].astype(np.int64)
        return pa.table({"digit": pa.array(np.arange(1, 10), pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    pdf = driver_grouped_agg(
        ds.map_batches(fold, batch_format="pyarrow"),
        ["digit"], [("n", "sum")], ["digit", "n"],
    )  # bounded: 9 rows
    pdf = pdf.sort_values("digit").reset_index(drop=True)
    total = int(pdf["n"].sum())
    pdf["share_pm"] = pdf["n"] * 1000 // max(total, 1)
    return rd.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False))


_ICEBERG_EXPORTED: set[str] = set()


def q_events_iceberg(sf_dir: str) -> rd.Dataset:
    """Per-type event-id span and count through an ICEBERG hop — the
    sixth source-format parity demonstration and the second whose
    re-read PRUNES: events export to an Iceberg v1 table identity-
    partitioned by event_type (sources/iceberg.py — Avro manifests via
    the nested-record writer, versioned metadata JSON), and the re-read
    passes ``filters={'event_type': ['view', 'error']}`` so only those
    partitions' files are planned.  Matches the WHERE-IN parquet oracle
    bit-for-bit.  Same PID-keyed once-per-process staging as the other
    hops."""
    import os
    import shutil

    from monocator_ray.sources.iceberg import read_iceberg, write_iceberg

    ensure_shipped()
    base = os.environ.get("MONOCATOR_CSV_DIR", "/tmp")
    out = os.path.join(
        base,
        f"monocator_iceberg_events_{os.getpid()}_"
        f"{os.path.basename(os.path.normpath(sf_dir))}",
    )
    if out not in _ICEBERG_EXPORTED:
        from monocator_ray.sources.csvio import cleanup_stale_staging

        cleanup_stale_staging(base, "monocator_iceberg_events_", out)
        shutil.rmtree(out, ignore_errors=True)
        write_iceberg(
            _read(sf_dir, "events", ["event_id", "event_type", "value"]),
            out,
            partition_by=["event_type"],
        )
        _ICEBERG_EXPORTED.add(out)
    ds = read_iceberg(out, filters={"event_type": ["view", "error"]})

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "event_id": batch["event_id"],
                "cents": pc.cast(
                    pc.floor(pc.multiply(batch["value"],
                                         pa.scalar(100.0))), pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Min("event_id", alias_name="min_id"),
            Max("event_id", alias_name="max_id"),
            Sum("cents", alias_name="sum_cents"),
        )
        .sort("event_type")
    )


# ---- sessionized bounce rate with entry-type attribution ----
def q_session_bounce_rate(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Per session ENTRY event type: session count, single-event
    ("bounce") count, and the bounce rate in exact permille — the
    sessionize -> attribute-to-first-touch -> rate composition every web
    analytics stack ships.  A session breaks when the gap to the user's
    previous event exceeds 30 minutes (strict >, order (ts, event_id)).
    One user-hash partition pass finds every break, session length and
    entry type vectorized (sessions are CONTIGUOUS runs after the sort,
    so lengths are just diffs of break indices); the driver folds
    O(event types) partials."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    gap_us = np.int64(gap_minutes * 60) * np.int64(1_000_000)

    def part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"entry_type": pa.array([], pa.string()),
                             "n_sessions": pa.array([], pa.int64()),
                             "n_bounce": pa.array([], pa.int64())})
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        n = len(uid)
        new_s = np.ones(n, bool)
        new_s[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        s_starts = np.flatnonzero(new_s)
        s_len = np.diff(np.append(s_starts, n))
        entry = et[s_starts]
        bounce = (s_len == 1).astype(np.int64)
        # per-partition partials by entry type
        u, inv = np.unique(entry, return_inverse=True)
        nb = np.zeros(len(u), np.int64)
        np.add.at(nb, inv, bounce)  # exact int scatter-add (not bincount's float64 weights path)
        return pa.table({
            "entry_type": pa.array(u, pa.string()),
            "n_sessions": pa.array(np.bincount(inv).astype(np.int64),
                                   pa.int64()),
            "n_bounce": pa.array(nb, pa.int64()),
        })

    partials = hash_partitioned(
        ds,
        lambda t: _key_arrays(t, ["user_id"]),
        part,
        num_parts=32,
    )
    pdf = driver_grouped_agg(
        partials, ["entry_type"],
        [("n_sessions", "sum"), ("n_bounce", "sum")],
        ["entry_type", "n_sessions", "n_bounce"],
    )  # bounded: O(event types)
    pdf = pdf.sort_values("entry_type").reset_index(drop=True)
    pdf["bounce_pm"] = pdf["n_bounce"] * 1000 // pdf["n_sessions"]
    return rd.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False))


# ---- global exact deciles from ONE histogram (multi-quantile selection) ----
def q_price_deciles(sf_dir: str) -> rd.Dataset:
    """The nine exact deciles of order totals (cents) — the equi-depth
    histogram boundary computation, done with the _exact_quantiles_disc
    two-pass selection: ONE shared min/max scan, ONE shared histogram
    scan, ONE collect of just the bins containing the nine target ranks.
    No global sort; driver state O(bins)."""
    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({"cents": _cents(t["o_totalprice"])})

    ds = orders.map_batches(shape, batch_format="pyarrow").materialize()
    qs = [i / 10 for i in range(1, 10)]
    vals = _exact_quantiles_disc(ds, "cents", qs=qs)
    return rd.from_arrow(pa.table({
        "decile": pa.array(list(range(1, 10)), pa.int64()),
        "cents": pa.array(vals, pa.int64()),
    }))


# ---- weighted median: order statistic under a weight measure ----
def q_weighted_median_price(sf_dir: str) -> rd.Dataset:
    """The quantity-WEIGHTED median of lineitem extended price (cents):
    the smallest price v where the cumulative quantity of items priced
    <= v reaches half the total quantity — a weighted order statistic,
    which no partial-aggregate tree computes and a global sort would
    shuffle everything for.  Same weighted-histogram selection as
    q_pareto_customers, ascending: pass 1 folds per-bin (count, weight);
    the crossing bin's values collect (bounded) and a local cumsum over
    the sorted (price, qty) pairs finds the exact crossing value."""
    li = _read(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])
    BINS = 4096
    step = max(1, 10**8 // BINS)  # price cents bound (global_median rationale)

    def hist_part(t: pa.Table) -> pa.Table:
        c = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(c):
            return pa.table({"bin": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        b = c // step
        u, inv = np.unique(b, return_inverse=True)
        w = np.zeros(len(u), np.int64)
        np.add.at(w, inv, q)
        return pa.table({"bin": pa.array(u, pa.int64()),
                         "w": pa.array(w, pa.int64())})

    pdf = driver_grouped_agg(
        li.map_batches(hist_part, batch_format="pyarrow"),
        ["bin"], [("w", "sum")], ["bin", "w"],
    ).sort_values("bin").reset_index(drop=True)  # bounded: O(BINS)
    total_w = int(pdf["w"].sum())
    cumw = pdf["w"].cumsum().to_numpy()
    bi = int(np.searchsorted(2 * cumw, total_w))  # first bin where 2*cum >= total
    the_bin = int(pdf["bin"].iloc[bi])
    w_before = int(cumw[bi - 1]) if bi else 0

    def bin_filter(t: pa.Table) -> pa.Table:
        c = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = c // step == the_bin
        return pa.table({"c": pa.array(c[m], pa.int64()),
                         "q": pa.array(q[m], pa.int64())})

    # bounded: one histogram bin (rows/BINS in expectation)
    bin_rows = collect_arrow(li.map_batches(bin_filter,
                                            batch_format="pyarrow"))
    c = bin_rows["c"].to_numpy()
    q = bin_rows["q"].to_numpy()
    order = np.argsort(c, kind="stable")
    c, q = c[order], q[order]
    cum_in = w_before + np.cumsum(q)
    k = int(np.searchsorted(2 * cum_in, total_w))
    out = pa.table({
        "weighted_median_cents": pa.array([int(c[k])], pa.int64()),
        "total_qty": pa.array([total_w], pa.int64()),
    })
    return rd.from_arrow(out)


# ---- regex extraction parity (RE2 on both engines) ----
def q_props_regex(sf_dir: str) -> rd.Dataset:
    """Per event type: count and exact sum/max of the FIRST integer
    embedded in the raw props string, extracted by REGEX on both engines
    (Arrow's RE2 `extract_regex` here, DuckDB's RE2 `regexp_extract` in
    the oracle) — the query that pins the regex-function family end to
    end, complementing props_json's structured JSON path.  One vectorized
    pass, per-batch 5-group partials, O(types) driver fold."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def fold(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t["props"], pattern=r"(?P<v>\d+)")
        v = pc.cast(pc.struct_field(ext, "v"), pa.int64())
        g = pa.table({"event_type": t["event_type"],
                      "v": v}).group_by("event_type").aggregate(
            [("v", "count"), ("v", "sum"), ("v", "max")])
        return g.rename_columns(["event_type", "n", "sum_v", "max_v"])

    pdf = driver_grouped_agg(
        ds.map_batches(fold, batch_format="pyarrow"),
        ["event_type"], [("n", "sum"), ("sum_v", "sum"), ("max_v", "max")],
        ["event_type", "n", "sum_v", "max_v"],
    )  # bounded: O(event types)
    pdf = pdf.sort_values("event_type").reset_index(drop=True)
    return rd.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False))


# ---- TPC-H Q4 shape: EXISTS-correlated order lateness check ----
def q_priority_order_check(sf_dir: str, late_days: int = 90) -> rd.Dataset:
    """Per order priority: total orders and how many have AT LEAST ONE
    lineitem shipped more than ``late_days`` days after the order date —
    TPC-H Q4's EXISTS-correlated-subquery shape (COUNT of ORDERS with a
    qualifying child, not of child rows — the axis late_shipments does
    not exercise).  Plan: the orderkey join ships ONE packed int64
    payload (orderdate-days*8 + priority-index); the late filter drops
    the joined stream to the qualifying sliver, per-batch ``np.unique``
    pre-dedups (orderkey*8+prio) pairs, one hash partition dedups
    globally and folds to O(priorities) partial rows, the driver sums.
    Order totals are a separate O(priorities) aggregate on orders —
    the big lineitem table is never shuffled beyond the one join."""
    pr = driver_grouped_agg(
        _read(sf_dir, "orders", ["o_orderpriority"]),
        ["o_orderpriority"], [("o_orderpriority", "count")],
        ["o_orderpriority", "n_orders"],
    )  # bounded: O(priorities)
    pr = pr.sort_values("o_orderpriority").reset_index(drop=True)
    prios = pr["o_orderpriority"].to_numpy()
    # the 3-bit pack below (days*8 + idx, pair & 7) requires it
    assert len(prios) <= 8, f"priority pack needs <= 8 classes, got {len(prios)}"

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def o_pack(t: pa.Table) -> pa.Table:
        days = t["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[D]").astype(np.int64)
        idx = np.searchsorted(prios,
                              t["o_orderpriority"].to_numpy(zero_copy_only=False))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "packed": pa.array(days * 8 + idx, pa.int64())})

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def li_days(t: pa.Table) -> pa.Table:
        days = t["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[D]").astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "ship_days": pa.array(days, pa.int64())})

    j = li.map_batches(li_days, batch_format="pyarrow").join(
        orders.map_batches(o_pack, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=_join_parts(sf_dir, "lineitem", "orders"),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def late_pairs(t: pa.Table) -> pa.Table:
        packed = t["packed"].to_numpy(zero_copy_only=False)
        ship = t["ship_days"].to_numpy(zero_copy_only=False)
        late = ship - (packed >> 3) > late_days
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)[late]
        pair = np.unique(ok * 8 + (packed[late] & 7))
        return pa.table({"pair": pa.array(pair, pa.int64())})

    def fold_part(t: pa.Table) -> pa.Table:
        pair = np.unique(t["pair"].to_numpy(zero_copy_only=False))
        n = np.bincount(pair & 7, minlength=8)
        return pa.table({"prio_idx": pa.array(np.arange(8), pa.int64()),
                         "n_late": pa.array(n, pa.int64())})

    # bounded: O(num_parts x priorities) partial count rows
    parts = collect_arrow(hash_partitioned(
        j.map_batches(late_pairs, batch_format="pyarrow"),
        lambda t: [t["pair"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        fold_part, num_parts=32,
    ))
    n_late = np.zeros(8, np.int64)
    np.add.at(n_late, parts["prio_idx"].to_numpy(), parts["n_late"].to_numpy())
    out = pa.table({
        "o_orderpriority": pa.array(prios, pa.string()),
        "n_orders": pa.array(pr["n_orders"].to_numpy().astype(np.int64), pa.int64()),
        "n_late_orders": pa.array(n_late[: len(prios)], pa.int64()),
    })
    return rd.from_arrow(out)


# ---- KMV (k-minimum-values / theta) sketch set overlap, SQL-oracled ----
def q_kmv_user_overlap(sf_dir: str, k: int = 128) -> rd.Dataset:
    """Distinct-user overlap between two event cohorts estimated with KMV
    (k-minimum-values / theta) sketches — the mergeable-sketch SET-OPERATION
    family (union + intersection cardinality), complementing hll_user_counts'
    single-set estimate.  Unlike HLL, the KMV estimator is EXACT integer
    arithmetic over the k smallest mix32 hash values, so the full estimate
    (not just the machinery) is pinned by a DuckDB oracle computing the
    identical expression: est = (k-1) * 2^32 // kth_min at capacity, the
    exact distinct-hash count below it; intersection via the theta rule
    rho * est_union // |S_union|.

    Scale shape: each batch contributes its k smallest distinct hashes per
    cohort (O(k) rows regardless of batch size — k smallest of a union of
    per-batch k-smallest sets IS the global k smallest), the driver merges
    O(blocks x 2k) values once, and NOTHING shuffles — distinct-count set
    algebra over 100 TB with two fixed-size sketches."""
    from monocator_ray.pipelines.docs import _mix32

    ds = _read(sf_dir, "events", ["event_type", "user_id", "value"])
    cohorts = (("a", "purchase"), ("b", "error"))

    def sketch(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        names, hs = [], []
        for name, ty in cohorts:
            h = np.unique(_mix32(uid[(et == ty) & (val >= 300.0)]))[:k]
            names.extend([name] * len(h))
            hs.append(h)
        return pa.table({"cohort": pa.array(names, pa.string()),
                         "h32": pa.array(np.concatenate(hs) if hs else
                                         np.array([], np.int64), pa.int64())})

    # bounded: O(blocks x 2k) int64 hash values
    parts = collect_arrow(ds.map_batches(sketch, batch_format="pyarrow"))
    coh = parts["cohort"].to_numpy(zero_copy_only=False)
    h32 = parts["h32"].to_numpy(zero_copy_only=False)
    s_a = np.unique(h32[coh == "a"])[:k]
    s_b = np.unique(h32[coh == "b"])[:k]
    s_u = np.unique(np.concatenate([s_a, s_b]))[:k]

    def est(s: np.ndarray) -> int:
        if len(s) < k:
            return len(s)
        return (k - 1) * 2**32 // int(s[k - 1])

    theta = int(s_u[-1]) if len(s_u) else 0
    common = np.intersect1d(s_a, s_b)
    rho = int((common <= theta).sum())
    inter = rho * est(s_u) // len(s_u) if len(s_u) else 0
    out = pa.table({
        "approx_a": pa.array([est(s_a)], pa.int64()),
        "approx_b": pa.array([est(s_b)], pa.int64()),
        "approx_union": pa.array([est(s_u)], pa.int64()),
        "approx_intersection": pa.array([inter], pa.int64()),
    })
    return rd.from_arrow(out)


# ---- top-N + OTHER share rollup (reporting shape) ----
def q_brand_share_top_others(sf_dir: str, topn: int = 3) -> rd.Dataset:
    """Discounted revenue per brand, reported as the top ``topn`` brands
    plus one aggregated 'OTHER' bucket — the reporting rollup that keeps
    dashboards O(topn) no matter how wide the dimension.  Plan: the
    partkey->brand-index dense LUT broadcasts once (O(parts) driver
    build, the product_type_profit shape), each lineitem batch folds to
    an O(brands) bincount partial, the driver ranks O(brands) rows and
    collapses the tail — the fact table is never joined or shuffled."""
    # bounded: O(parts) two-column dimension read for the broadcast LUT
    part = collect_arrow(_read(sf_dir, "part", ["p_partkey", "p_brand"]))
    brands = np.unique(part["p_brand"].to_numpy(zero_copy_only=False))
    bidx = np.searchsorted(brands, part["p_brand"].to_numpy(zero_copy_only=False))
    lut = _dense_lut(part["p_partkey"].to_numpy(), bidx.astype(np.int64),
                     fill=len(brands))
    lut_ref = ray.put(lut)
    nb = len(brands)

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def fold(t: pa.Table) -> pa.Table:
        idx = _lut_get(ray.get(lut_ref),
                       t["l_partkey"].to_numpy(zero_copy_only=False))
        rev = _disc_rev_cpc(t).to_numpy(zero_copy_only=False)
        # int64 scatter-add: exact at ANY batch size (a float64 bincount
        # would silently round past 2^53 on a large enough block)
        acc = np.zeros(nb + 1, np.int64)
        np.add.at(acc, idx, rev)
        cnt = np.bincount(idx, minlength=nb + 1).astype(np.int64)
        return pa.table({"bidx": pa.array(np.arange(nb + 1), pa.int64()),
                         "cpc": pa.array(acc, pa.int64()),
                         "cnt": pa.array(cnt, pa.int64())})

    pdf = driver_grouped_agg(
        li.map_batches(fold, batch_format="pyarrow"),
        ["bidx"], [("cpc", "sum"), ("cnt", "sum")], ["bidx", "cpc", "cnt"],
    )  # bounded: O(brands)
    acc = np.zeros(nb + 1, np.int64)
    acc[pdf["bidx"].to_numpy()] = pdf["cpc"].to_numpy()
    cnt = np.zeros(nb + 1, np.int64)
    cnt[pdf["bidx"].to_numpy()] = pdf["cnt"].to_numpy()
    # rank only brands PRESENT in the fact table — the oracle's rev CTE
    # comes from the join, so unsold brands must not occupy rank slots
    # or produce a zero-revenue OTHER bucket
    present = np.flatnonzero(cnt[:nb] > 0)
    order = present[np.lexsort((brands[present], -acc[present]))]
    top = order[:topn]
    n_present = len(present)
    names = list(brands[top]) + (["OTHER"] if n_present > topn else [])
    cpcs = list(acc[top]) + ([int(acc[present].sum() - acc[top].sum())]
                             if n_present > topn else [])
    srt = np.argsort(np.array(names, dtype=object))
    return rd.from_arrow(pa.table({
        "brand": pa.array(np.array(names, dtype=object)[srt], pa.string()),
        "revenue_cpc": pa.array(np.array(cpcs, np.int64)[srt], pa.int64()),
    }))


# ---- adaptive recrawl scheduling (Cho & Garcia-Molina-style policy) ----
def q_recrawl_intervals(sf_dir: str) -> rd.Dataset:
    """Per-document revisit-interval assignment from simulated change
    observations — the adaptive-recrawl policy step (Cho &
    Garcia-Molina's incremental-crawler estimator family, with the
    rational changes-per-observation surrogate instead of the Poisson
    MLE so the whole policy is exact integer arithmetic).  Seven
    deterministic observations per doc (change iff mix32(doc_id*8+i) %
    4 == 0 — reproduced verbatim by the SQL oracle), interval =
    30 days if never changed else clamp(7 // changes, 1, 30).  Pure
    map + O(intervals) histogram partials: scheduling 10^10 URLs never
    shuffles — exactly the shape the crawl driver's revisit module
    consumes."""
    from monocator_ray.pipelines.docs import _mix32

    ds = _read(sf_dir, "documents", ["doc_id"])

    def fold(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        obs = ids[:, None] * 8 + np.arange(1, 8)
        chg = (_mix32(obs.ravel()).reshape(-1, 7) % 4 == 0).sum(axis=1)
        iv = np.where(chg == 0, 30, np.clip(7 // np.maximum(chg, 1), 1, 30))
        vals, counts = np.unique(iv, return_counts=True)
        return pa.table({"revisit_days": pa.array(vals, pa.int64()),
                         "n_docs": pa.array(counts.astype(np.int64), pa.int64())})

    pdf = driver_grouped_agg(
        ds.map_batches(fold, batch_format="pyarrow"),
        ["revisit_days"], [("n_docs", "sum")], ["revisit_days", "n_docs"],
    )  # bounded: O(distinct intervals) <= 31 rows
    pdf = pdf.sort_values("revisit_days").reset_index(drop=True)
    return rd.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False))


# ---- join-planner skew profile of a key column ----
def q_key_skew_stats(sf_dir: str) -> rd.Dataset:
    """Skew profile of the lineitem partkey distribution — the statistic
    a join planner reads before choosing broadcast vs shuffle vs salted
    execution (the crawl driver's hot-bucket salting consumes exactly
    this shape at 10^10-URL scale).  One partitioned count-per-key
    aggregate, then per-partition O(1)+top-10 partials (count, total,
    max, local top-10 by (n desc, key asc)) and an O(parts x 10) driver
    merge; outputs exact integer permille shares so the DuckDB oracle
    hash-matches."""
    per_key = partitioned_aggregate(
        _read(sf_dir, "lineitem", ["l_partkey"]),
        ["l_partkey"], [("l_partkey", "count")], ["l_partkey", "n"],
    )

    def fold(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        k = t["l_partkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((k, -n))[:10]
        return pa.table({
            "n_keys": pa.array([len(n)], pa.int64()),
            "total": pa.array([int(n.sum())], pa.int64()),
            "max_n": pa.array([int(n.max()) if len(n) else 0], pa.int64()),
            "top_n": pa.array([n[order].astype(np.int64).tolist()],
                              pa.list_(pa.int64())),
            "top_k": pa.array([k[order].astype(np.int64).tolist()],
                              pa.list_(pa.int64())),
        })

    # bounded: O(partitions) rows of 3 ints + 10-element lists
    parts = collect_arrow(per_key.map_batches(fold, batch_format="pyarrow"))
    n_keys = int(pc.sum(parts["n_keys"]).as_py()) if parts.num_rows else 0
    total = int(pc.sum(parts["total"]).as_py()) if parts.num_rows else 0
    max_n = int(pc.max(parts["max_n"]).as_py()) if parts.num_rows else 0
    cand_n = np.concatenate([np.asarray(x, np.int64)
                             for x in parts["top_n"].to_pylist()]
                            or [np.empty(0, np.int64)])
    cand_k = np.concatenate([np.asarray(x, np.int64)
                             for x in parts["top_k"].to_pylist()]
                            or [np.empty(0, np.int64)])
    order = np.lexsort((cand_k, -cand_n))[:10]
    top10 = int(cand_n[order].sum())
    out = pa.table({
        "n_keys": pa.array([n_keys], pa.int64()),
        "total_rows": pa.array([total], pa.int64()),
        "max_n": pa.array([max_n], pa.int64()),
        "top10_share_permille": pa.array(
            [top10 * 1000 // total if total else 0], pa.int64()),
        "skew_factor_permille": pa.array(
            [max_n * n_keys * 1000 // total if total else 0], pa.int64()),
    })
    return rd.from_arrow(out)


# ---- equi-depth range-partition bounds (partition planning) ----
def q_range_partition_bounds(sf_dir: str, buckets: int = 8) -> rd.Dataset:
    """Equi-depth split bounds over lineitem price cents — the planning
    step a range partitioner (sources/clustered.py's sorted sink) runs
    before writing key-range shards: bound i = the i/buckets discrete
    quantile (quantile_disc convention, rank ceil(q*n)-1).  Uses the
    shared two-pass histogram selection (_exact_quantiles_disc): three
    O(1)-state streaming scans, NO global sort — the 100-TB-safe way to
    compute split points."""

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({"c": _cents(t["l_extendedprice"])})

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
        shape, batch_format="pyarrow")
    qs = [i / buckets for i in range(1, buckets)]
    vals = _exact_quantiles_disc(ds, "c", qs=qs)
    return rd.from_arrow(pa.table({
        "bucket": pa.array(range(1, buckets), pa.int64()),
        "bound_cents": pa.array([int(v) for v in vals], pa.int64()),
    }))


# ---- skew-salted fact-dim join (stages/joins.salted_equi_join) ----
def q_nation_orders_salted(sf_dir: str) -> rd.Dataset:
    """Per-nation order count and revenue computed THROUGH the salted
    equi-join (stages/joins.py): the crawl driver's hot-key salting
    discipline lifted into the relational layer — hot fact keys scatter
    across salt sub-partitions, the dimension replicates its hot rows per
    salt, and no partition ever holds more than ~1/factor of a Zipf-head
    key's rows.  Result is IDENTICAL to a plain join (the oracle is the
    plain SQL join); the salted plan is the 100-TB placement.  The join
    output folds to O(nations) partials per batch before the driver."""
    from monocator_ray.stages.joins import salted_equi_join

    def shape_fact(t: pa.Table) -> pa.Table:
        return pa.table({"custkey": t["o_custkey"],
                         "cents": _cents(t["o_totalprice"])})

    def shape_dim(t: pa.Table) -> pa.Table:
        return pa.table({"custkey": pc.cast(t["c_custkey"], pa.int64()),
                         "c_nationkey": pc.cast(t["c_nationkey"], pa.int64())})

    fact = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        shape_fact, batch_format="pyarrow")
    dim = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        shape_dim, batch_format="pyarrow")
    j = salted_equi_join(
        fact, dim, key="custkey",
        fact_cols={"cents": pa.int64()},
        dim_cols={"c_nationkey": pa.int64()},
        salt_factor=8, num_parts=_join_parts(sf_dir, "orders", "customer"),
    )

    def fold(t: pa.Table) -> pa.Table:
        g = t.group_by("c_nationkey").aggregate(
            [("cents", "count"), ("cents", "sum")])
        return g.rename_columns(["c_nationkey", "n_orders", "revenue_cents"])

    pdf = driver_grouped_agg(
        j.map_batches(fold, batch_format="pyarrow"),
        ["c_nationkey"], [("n_orders", "sum"), ("revenue_cents", "sum")],
        ["c_nationkey", "n_orders", "revenue_cents"],
    )  # bounded: O(nations)
    pdf = pdf.sort_values("c_nationkey").reset_index(drop=True)
    return rd.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False))


# ---- market-basket association rules (support / confidence / lift) ----
def q_association_rules(sf_dir: str, topn: int = 50) -> rd.Dataset:
    """Directed association rules antecedent -> consequent over the
    within-order part baskets, scored with EXACT-permille confidence
    (1000 * n_both // n_antecedent) and lift (1000 * n_both * n_baskets
    // (n_a * n_b)) — the step past part_cooccurrence's undirected pair
    counts, composed ON its support-filtered pair Dataset.  Item basket
    counts and the basket total come from ONE extra distinct pass
    (order-hash partitions, so per-partition distinct sums are exact);
    they broadcast as a dense partkey LUT + a scalar, each scored pair
    batch emits BOTH rule directions and folds to a local top-``topn``
    partial under the total order (conf desc, antecedent, consequent),
    and the driver merges O(blocks x topn) rows.  Nothing beyond
    part_cooccurrence's two pair shuffles moves."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    _CNT = pa.schema([("pk", pa.int64()), ("ni", pa.int64()),
                      ("orders", pa.int64())])

    def item_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _CNT.empty_table()
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        code = ok * np.int64(1 << 21) + pk  # partkey < 2^21 at any tested sf
        uniq = np.unique(code)
        upk = uniq & ((1 << 21) - 1)
        vals, counts = np.unique(upk, return_counts=True)
        n_orders = len(np.unique(uniq >> 21))
        orders_col = np.zeros(len(vals), np.int64)
        if len(orders_col):
            orders_col[0] = n_orders
        return pa.table({"pk": pa.array(vals, pa.int64()),
                         "ni": pa.array(counts.astype(np.int64), pa.int64()),
                         "orders": pa.array(orders_col, pa.int64())})

    # order-hash partitions co-locate each basket, so per-partition
    # distinct (order, part) counts and order counts SUM exactly
    items = driver_grouped_agg(
        hash_partitioned(
            ds,
            lambda t: [t["l_orderkey"].to_numpy(zero_copy_only=False)
                       .astype(np.uint64)],
            item_part, num_parts=32,
        ),
        ["pk"], [("ni", "sum"), ("orders", "sum")], ["pk", "ni", "orders"],
    )  # bounded: O(parts) item basket counts
    n_baskets = int(items["orders"].sum())
    lut = _dense_lut(items["pk"].to_numpy(np.int64),
                     items["ni"].to_numpy(np.int64), fill=0)
    lut_ref = ray.put(lut)

    assert int(items["pk"].max()) < (1 << 21), "partkey exceeds basket pack"
    pairs = q_part_cooccurrence(sf_dir)

    _RULE = pa.schema([("antecedent", pa.int64()), ("consequent", pa.int64()),
                       ("n_both", pa.int64()), ("conf_permille", pa.int64()),
                       ("lift_permille", pa.int64())])

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _RULE.empty_table()
        p1 = t["p1"].to_numpy(zero_copy_only=False)
        p2 = t["p2"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        l = ray.get(lut_ref)
        na, nb = _lut_get(l, p1), _lut_get(l, p2)
        ante = np.concatenate([p1, p2])
        cons = np.concatenate([p2, p1])
        both = np.concatenate([n, n])
        n_ante = np.concatenate([na, nb])
        n_cons = np.concatenate([nb, na])
        conf = both * 1000 // n_ante
        lift = both * n_baskets * 1000 // (n_ante * n_cons)
        order = np.lexsort((cons, ante, -conf))[:topn]
        return pa.table({"antecedent": pa.array(ante[order], pa.int64()),
                         "consequent": pa.array(cons[order], pa.int64()),
                         "n_both": pa.array(both[order], pa.int64()),
                         "conf_permille": pa.array(conf[order], pa.int64()),
                         "lift_permille": pa.array(lift[order], pa.int64())})

    # bounded: O(blocks x topn) rule partials
    parts = collect_arrow(pairs.map_batches(score, batch_format="pyarrow"))
    conf = parts["conf_permille"].to_numpy()
    ante = parts["antecedent"].to_numpy()
    cons = parts["consequent"].to_numpy()
    order = np.lexsort((cons, ante, -conf))[:topn]
    return rd.from_arrow(parts.take(pa.array(order)))

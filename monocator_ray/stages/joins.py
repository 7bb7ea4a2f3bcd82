"""Ordered joins Ray Data lacks natively: AS-OF join and RANGE join
(task brief: "when the reference has an operator Ray Data lacks (as-of
join, range join, ...) implement it as a composition of map_batches +
groupby().map_groups + sort if semantics allow").

Both operators share one shuffle plan: tag each side, union into a single
dataset with a common schema, hash-partition by the equality key
(``stages/grouped.hash_partitioned`` — every key's rows land wholly in one
partition), and run a fully VECTORIZED timeline kernel inside each
partition.  Neither kernel loops over keys or rows in Python:

* ``asof_join`` sorts the merged timeline by ``(key, on, side, tiebreak)``
  with right rows ordered before left rows at equal ``on`` (inclusive
  as-of), then forward-fills "index of the latest right row so far" with
  one ``np.maximum.accumulate``; a left row whose filled index belongs to a
  DIFFERENT key (the fill leaked across a key boundary, i.e. this key has
  no earlier right row) gets NULL — one vectorized key-equality check
  replaces per-key resets.

* ``range_join_count`` answers "how many right rows fall in
  ``(l.on + lo, l.on + hi]`` per left row" as two prefix-count reads:
  every left row contributes probe points at ``on+lo`` and ``on+hi``,
  rights contribute +1 at their own ``on``; one sort of the combined
  timeline + one ``cumsum`` (rights before probes at equal time, so a
  probe at x reads F(x) = #rights <= x) and a per-key-run baseline
  subtraction give count = F(on+hi) - F(on+lo).  A pair-emitting range
  join would be this plus a gather per qualifying pair; the count form is
  the fused aggregate (pair output is quadratic in the worst case — emit
  counts, not pairs, unless the caller proves sparsity).

Scale contract: one shuffle (the hash partition); partition memory is
bounded by ``num_parts`` sizing exactly as documented on
``hash_partitioned`` — pick ``num_parts ~ input_bytes / 256 MB`` at scale.
Preconditions: the key is an integer column (hash wider keys first), ``on``
is a timestamp or integer column, and neither contains NULLs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from monocator_ray.stages.grouped import collect_arrow, hash_partitioned


def _as_i64(col: pa.ChunkedArray) -> np.ndarray:
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype.kind == "M":
        return arr.view(np.int64)
    return arr.astype(np.int64, copy=False)


def _null_col(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, typ)


def _tag_union(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    on: str,
    on_type: pa.DataType,
    left_cols: dict[str, pa.DataType],
    right_cols: dict[str, pa.DataType],
    tiebreak: str | None,
) -> rd.Dataset:
    """Union both sides under one schema: ``key, on, _side, _tb`` + all
    pass-through columns (NULL on the side that lacks them).  _side: right=0
    left=1 so an ascending sort puts rights first at equal ``on``."""

    def shape(side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols: dict[str, pa.Array | pa.ChunkedArray] = {
                key: t[key],
                on: t[on].cast(on_type) if t[on].type != on_type else t[on],
                "_side": pa.array(np.full(n, side, np.int8)),
            }
            if tiebreak is not None:
                cols["_tb"] = (
                    t[tiebreak] if side == 0 else pa.array(np.zeros(n, np.int64))
                )
            for c, typ in left_cols.items():
                cols[c] = t[c] if side == 1 else _null_col(n, typ)
            for c, typ in right_cols.items():
                cols[c] = t[c] if side == 0 else _null_col(n, typ)
            return pa.table(cols)

        fn.__name__ = f"tag_side{side}"
        return fn

    return left.map_batches(shape(1), batch_format="pyarrow").union(
        right.map_batches(shape(0), batch_format="pyarrow")
    )


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    on: str,
    left_cols: dict[str, pa.DataType],
    value_cols: dict[str, pa.DataType],
    tiebreak: str,
    num_parts: int = 64,
) -> rd.Dataset:
    """For every left row, the right row with the greatest ``on`` at or
    before the left row's ``on`` within the same ``key`` (ties on ``on``
    broken by the greatest ``tiebreak``); emits ``left_cols`` plus
    ``value_cols`` (NULL when the key has no earlier right row).  Exactly
    DuckDB's ``l ASOF LEFT JOIN r ON l.key = r.key AND l.on >= r.on`` with
    the right side pre-deduplicated to one row per (key, on) by max
    tiebreak.  See module docstring for the kernel."""
    on_type = pa.timestamp("us")
    merged = _tag_union(left, right, key, on, on_type, left_cols, value_cols, tiebreak)
    out_schema = pa.schema(
        [pa.field(c, t) for c, t in left_cols.items()]
        + [pa.field(c, t) for c, t in value_cols.items()]
    )

    def asof_part(t: pa.Table) -> pa.Table:
        k = _as_i64(t[key])
        x = _as_i64(t[on])
        side = t["_side"].to_numpy(zero_copy_only=False)
        tb = _as_i64(t["_tb"])
        order = np.lexsort((tb, side, x, k))
        k, side = k[order], side[order]
        t = t.take(pa.array(order))
        n = len(k)
        is_r = side == 0
        filled = np.maximum.accumulate(np.where(is_r, np.arange(n), -1))
        valid = (filled >= 0) & (k[np.clip(filled, 0, None)] == k)
        is_l = ~is_r
        l_fill = filled[is_l]
        l_valid = valid[is_l]
        idx = pa.array(np.clip(l_fill, 0, None), type=pa.int64(), mask=~l_valid)
        cols = {c: t[c].take(pa.array(np.nonzero(is_l)[0])) for c in left_cols}
        for c in value_cols:
            cols[c] = t[c].take(idx)
        if not cols:  # pragma: no cover - caller always passes left_cols
            return out_schema.empty_table()
        return pa.table(cols, schema=out_schema)

    return hash_partitioned(
        merged,
        lambda t: [t[key].to_numpy(zero_copy_only=False).astype(np.uint64)],
        asof_part,
        num_parts=num_parts,
    )


def range_join_count(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    on: str,
    lo,
    hi,
    left_cols: dict[str, pa.DataType],
    count_name: str = "n_in_range",
    num_parts: int = 64,
) -> rd.Dataset:
    """Per left row, the number of right rows of the same ``key`` whose
    ``on`` lies in the half-open interval ``(l.on + lo, l.on + hi]``
    (``lo``/``hi``: ``np.timedelta64`` for timestamp ``on``, else ints).
    Equals SQL ``LEFT JOIN r ON r.key=l.key AND r.on > l.on + lo AND
    r.on <= l.on + hi`` + ``COUNT(r.*) GROUP BY l``.  See module docstring
    for the prefix-count kernel."""
    on_type = pa.timestamp("us")
    def _off(v) -> int:
        # np.timedelta64 subclasses np.integer — test it FIRST
        if isinstance(v, np.timedelta64) or not isinstance(v, (int, np.integer)):
            return int(np.timedelta64(v).astype("timedelta64[us]").astype(np.int64))
        return int(v)

    lo_i, hi_i = _off(lo), _off(hi)
    merged = _tag_union(left, right, key, on, on_type, left_cols, {}, None)
    out_schema = pa.schema(
        [pa.field(c, t) for c, t in left_cols.items()]
        + [pa.field(count_name, pa.int64())]
    )

    def count_part(t: pa.Table) -> pa.Table:
        k = _as_i64(t[key])
        x = _as_i64(t[on])
        side = t["_side"].to_numpy(zero_copy_only=False)
        l_rows = np.nonzero(side == 1)[0]
        r_rows = np.nonzero(side == 0)[0]
        nl, nr = len(l_rows), len(r_rows)
        if nl == 0:
            return out_schema.empty_table()
        # timeline: rights at their own time, two probes per left row
        tl_k = np.concatenate([k[r_rows], k[l_rows], k[l_rows]])
        tl_x = np.concatenate([x[r_rows], x[l_rows] + lo_i, x[l_rows] + hi_i])
        tl_probe = np.concatenate(
            [np.zeros(nr, np.int8), np.ones(2 * nl, np.int8)]
        )
        # probe id: 0..nl-1 = lower probes, nl..2nl-1 = upper probes
        tl_id = np.concatenate(
            [np.full(nr, -1), np.arange(nl), np.arange(nl, 2 * nl)]
        )
        order = np.lexsort((tl_probe, tl_x, tl_k))
        tl_k, tl_probe, tl_id = tl_k[order], tl_probe[order], tl_id[order]
        is_right = tl_probe == 0
        f = np.cumsum(is_right)  # F(x) inclusive, rights-first at ties
        # per-key baseline: F just before each key run starts
        new_run = np.empty(len(tl_k), dtype=bool)
        new_run[0] = True
        new_run[1:] = tl_k[1:] != tl_k[:-1]
        run_id = np.cumsum(new_run) - 1
        base_at_start = (f - is_right)[new_run]
        f_key = f - base_at_start[run_id]
        probe_f = np.empty(2 * nl, np.int64)
        probe_mask = tl_id >= 0
        probe_f[tl_id[probe_mask]] = f_key[probe_mask]
        counts = probe_f[nl:] - probe_f[:nl]
        cols = {
            c: t[c].take(pa.array(l_rows)) for c in left_cols
        }
        cols[count_name] = pa.array(counts, pa.int64())
        return pa.table(cols, schema=out_schema)

    return hash_partitioned(
        merged,
        lambda t: [t[key].to_numpy(zero_copy_only=False).astype(np.uint64)],
        count_part,
        num_parts=num_parts,
    )


def salted_equi_join(
    fact: rd.Dataset,
    dim: rd.Dataset,
    key: str,
    fact_cols: dict[str, pa.DataType],
    dim_cols: dict[str, pa.DataType],
    salt_factor: int = 8,
    num_parts: int = 64,
    hot_keys=None,
) -> rd.Dataset:
    """Inner equi-join of a FACT dataset against a UNIQUE-KEY dimension
    with explicit HOT-KEY SALTING — the skew defense the crawl driver's
    fetch dispatch uses, lifted into the relational layer.  A plain hash
    partition lands every row of a Zipf-head key in ONE partition (that is
    its correctness contract); here hot fact rows scatter across
    ``salt_factor`` sub-partitions (salt = row position % factor — salt
    values never affect the RESULT, only placement) and the dim side
    replicates its hot-key rows once per salt, so the join key becomes
    ``(key, salt)`` and no partition exceeds ~1/factor of the hot key's
    rows.  Non-hot keys pay nothing (salt 0, no replication).

    ``hot_keys``: iterable of hot key values, or None to profile the fact
    side (per-batch top-16 count partials, driver merge, threshold =
    rows/num_parts) — approximate membership is fine, it only moves rows
    between the two placements, both exact.

    Contract: integer ``key``; ``dim`` has at most ONE row per key (a
    dimension table); inner join; output columns = fact_cols + dim_cols.
    One shuffle; partition memory bounded by num_parts sizing as on
    ``hash_partitioned``."""
    if hot_keys is None:
        def prof(t: pa.Table) -> pa.Table:
            k = t[key].to_numpy(zero_copy_only=False)
            vals, counts = np.unique(k, return_counts=True)
            top = np.argsort(-counts, kind="stable")[:16]
            return pa.table({"k": pa.array(vals[top].astype(np.int64)),
                             "n": pa.array(counts[top].astype(np.int64))})

        # bounded: O(blocks x 16) candidate partials
        parts = collect_arrow(fact.map_batches(prof, batch_format="pyarrow"))
        if parts.num_rows:
            kk = parts["k"].to_numpy()
            nn = parts["n"].to_numpy()
            uk, inv = np.unique(kk, return_inverse=True)
            agg = np.zeros(len(uk), np.int64)
            np.add.at(agg, inv, nn)
            # observed-count threshold (an undercount of the true total is
            # fine: hot-set membership only moves rows between the two
            # placements, both exact)
            thresh = max(1, int(nn.sum()) // num_parts)
            hot_keys = uk[agg > thresh]
        else:
            hot_keys = np.empty(0, np.int64)
    hot = np.sort(np.asarray(list(hot_keys), dtype=np.int64))

    out_schema = pa.schema(
        [("_key", pa.int64()), ("_salt", pa.int64()), ("_side", pa.int64())]
        + [(c, t) for c, t in fact_cols.items()]
        + [(c, t) for c, t in dim_cols.items()])

    def tag_fact(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        is_hot = np.isin(k, hot)
        salt = np.where(is_hot, np.arange(len(k), dtype=np.int64) % salt_factor, 0)
        cols = [pa.array(k), pa.array(salt),
                pa.array(np.ones(len(k), np.int64))]
        cols += [t[c].cast(typ) for c, typ in fact_cols.items()]
        cols += [_null_col(len(k), typ) for typ in dim_cols.values()]
        return pa.Table.from_arrays(cols, schema=out_schema)

    def tag_dim(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        is_hot = np.isin(k, hot)
        reps = np.where(is_hot, salt_factor, 1).astype(np.int64)
        idx = np.repeat(np.arange(len(k)), reps)
        # salt sequence 0..reps-1 within each replicated run
        starts = np.cumsum(reps) - reps
        salt = np.arange(len(idx), dtype=np.int64) - np.repeat(starts, reps)
        cols = [pa.array(k[idx]), pa.array(salt),
                pa.array(np.zeros(len(idx), np.int64))]
        cols += [_null_col(len(idx), typ) for typ in fact_cols.values()]
        cols += [t[c].take(pa.array(idx)).cast(typ)
                 for c, typ in dim_cols.items()]
        return pa.Table.from_arrays(cols, schema=out_schema)

    union = fact.map_batches(tag_fact, batch_format="pyarrow").union(
        dim.map_batches(tag_dim, batch_format="pyarrow"))

    final_schema = pa.schema([(c, t) for c, t in fact_cols.items()]
                             + [(c, t) for c, t in dim_cols.items()])

    def kern(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return final_schema.empty_table()
        side = t["_side"].to_numpy(zero_copy_only=False)
        k = t["_key"].to_numpy(zero_copy_only=False)
        dmask = side == 0
        dk = k[dmask]
        order = np.argsort(dk, kind="stable")
        dks = dk[order]
        fmask = ~dmask
        fk = k[fmask]
        if len(dks) == 0 or len(fk) == 0:
            return final_schema.empty_table()
        pos = np.minimum(np.searchsorted(dks, fk), len(dks) - 1)
        match = dks[pos] == fk
        frows = np.flatnonzero(fmask)[match]
        drows = np.flatnonzero(dmask)[order][pos[match]]
        cols = [t[c].take(pa.array(frows)) for c in fact_cols]
        cols += [t[c].take(pa.array(drows)) for c in dim_cols]
        return pa.Table.from_arrays(cols, schema=final_schema)

    return hash_partitioned(
        union,
        lambda t: [(t["_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
                    * np.uint64(salt_factor)
                    + t["_salt"].to_numpy(zero_copy_only=False).astype(np.uint64))],
        kern,
        num_parts=num_parts,
    )

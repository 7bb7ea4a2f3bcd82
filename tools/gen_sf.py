"""Scale-tier generator for the driver's TPC-H-ish star schema — used to
produce the sf1 evidence tier (VERDICT r3 "Next round" #2) under /tmp.

The driver's own tiers (/root/testdata/sf{0.001,0.01,0.1}) are read-only
and their generator is not in this repo, so this reproduces the SCHEMA and
the measured distributions of the sf0.1 tier (row counts per sf, key
ranges, category pools, Poisson(4) lines-per-order, exponential event
values, 31-word document vocabulary, unit-norm 64-dim embeddings) scaled
by ``sf``.  Correctness at any tier is still pinned by the DuckDB oracle —
both sides read the SAME generated parquet — so distribution fidelity only
needs to be close enough that per-query cost ratios are meaningful.

Usage: ``python tools/gen_sf.py --sf 1 --out /tmp/sfgen/sf1``
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJ = ["large", "hot", "blue", "old", "cold", "new", "red", "dim"]
P_NOUN = ["ring", "bolt", "plate", "gear", "cog", "pin"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
# the driver tier's EXACT 31-word vocabulary (distinct tokens of
# /root/testdata/sf*/documents.parquet) — retrieval queries (keyword /
# bm25 search on 'the' etc.) stay non-degenerate at generated tiers
VOCAB = ("a agg batch big column customer data dup fast filter group hash "
         "join key line merge order part query row scan slow small sort "
         "spark stream table the value vector window").split()


def _money(rng, n, lo, hi):
    return np.round(rng.uniform(lo, hi, n), 2)


def _write(out, name, table):
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    return table.num_rows


def generate(sf: float, out: str, seed: int = 42) -> dict[str, int]:
    rng = np.random.RandomState(seed)
    os.makedirs(out, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    counts = {}

    counts["region"] = _write(out, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(REGIONS),
    }))
    counts["nation"] = _write(out, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
    }))
    counts["customer"] = _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(_money(rng, n_cust, -1000, 10_000)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.randint(0, 5, n_cust)]),
    }))
    counts["supplier"] = _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.randint(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(_money(rng, n_supp, -1000, 10_000)),
    }))
    adj = np.array(P_ADJ)[rng.randint(0, len(P_ADJ), n_part)]
    noun = np.array(P_NOUN)[rng.randint(0, len(P_NOUN), n_part)]
    counts["part"] = _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array(np.char.add(np.char.add(adj, " "), noun)),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.randint(1, 26, n_part)]),
        "p_type": pa.array(np.array(P_TYPES)[rng.randint(0, 6, n_part)]),
        "p_size": pa.array(rng.randint(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(_money(rng, n_part, 900, 2000)),
    }))

    # orders: dates span 1995-01-01 .. 2001-08-01 at day granularity
    day0 = np.datetime64("1995-01-01", "us")
    span_days = int((np.datetime64("2001-08-01") - np.datetime64("1995-01-01"))
                    / np.timedelta64(1, "D"))
    odate = day0 + (rng.randint(0, span_days + 1, n_ord)
                    * np.timedelta64(1, "D")).astype("timedelta64[us]")
    counts["orders"] = _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.randint(0, n_cust, n_ord).astype(np.int64)),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[rng.randint(0, 3, n_ord)]),
        "o_totalprice": pa.array(_money(rng, n_ord, 1000, 500_000)),
        "o_orderdate": pa.array(odate),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.randint(0, 5, n_ord)]),
    }))

    # lineitem: Poisson(4) lines per order (zero-line orders simply absent)
    per_order = rng.poisson(4, n_ord)
    okey = np.repeat(np.arange(n_ord, dtype=np.int64), per_order)
    n_li = len(okey)
    ship_off = (rng.randint(1, 96, n_li) * np.timedelta64(1, "D")).astype("timedelta64[us]")
    counts["lineitem"] = _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(okey),
        "l_partkey": pa.array(rng.randint(0, n_part, n_li).astype(np.int64)),
        "l_suppkey": pa.array(rng.randint(0, n_supp, n_li).astype(np.int64)),
        "l_linenumber": pa.array(rng.randint(1, 8, n_li).astype(np.int32)),
        "l_quantity": pa.array(rng.randint(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(_money(rng, n_li, 900, 105_000)),
        "l_discount": pa.array(rng.randint(0, 11, n_li) / 100.0),
        "l_tax": pa.array(rng.randint(0, 9, n_li) / 100.0),
        "l_returnflag": pa.array(np.array(["N", "A", "R"])[rng.randint(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.randint(0, 2, n_li)]),
        "l_shipdate": pa.array(np.repeat(odate, per_order) + ship_off),
    }))

    # events: one month of per-user activity, exponential values
    t0 = np.datetime64("2024-01-01", "us")
    ts = t0 + rng.randint(0, 30 * 86_400_000_000, n_ev).astype("timedelta64[us]")
    n_users = max(int(15_000 * sf), 10)
    counts["events"] = _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.randint(0, n_users, n_ev).astype(np.int64)),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.randint(0, 5, n_ev)]),
        # 2 decimals like the driver tables: value*100 must be an exact
        # integer or the Arrow half-even vs DuckDB half-away rounding split
        # breaks every cents-based oracle (memory: oracle-exactness trap)
        "value": pa.array(np.round(rng.exponential(50, n_ev), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.randint(0, 100, n_ev)]),
    }))

    # documents: 10-100 tokens from the 31-word pool; ~0.2% exact dups
    lens = rng.randint(10, 101, n_doc)
    vocab = np.array(VOCAB, dtype=object)
    texts = np.empty(n_doc, dtype=object)
    for i in range(n_doc):
        texts[i] = " ".join(vocab[rng.randint(0, len(vocab), lens[i])])
    dup_n = max(n_doc // 600, 1)
    dup_to = rng.randint(0, n_doc, dup_n)
    dup_from = rng.randint(0, n_doc, dup_n)
    texts[dup_to] = texts[dup_from]
    counts["documents"] = _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array([f"src{i}" for i in rng.randint(0, 20, n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    # embeddings: unit-norm 64-dim float32, 10 labels
    raw = rng.normal(0, 1, (n_emb, 64)).astype(np.float32)
    raw /= np.linalg.norm(raw, axis=1, keepdims=True)
    counts["embeddings"] = _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(raw), pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 10, n_emb).astype(np.int32)),
    }))
    return counts


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    print(json.dumps(generate(a.sf, a.out, a.seed)))

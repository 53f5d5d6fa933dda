"""One-off sf1 dataset generator for the scale probe (VERDICT r09 #4).

Generates a 10x-sf0.1 dataset with the SAME table shapes, schemas, and
value distributions as the driver's TESTDATA recipe (inspected from
/root/testdata/sf0.1 — see SCALE.md), under its OWN seed and OWN output
directory; the driver dirs are read-only and are never touched. This is
probe data for runtime-growth measurement, not for oracle correctness —
values are distribution-matched, not bit-identical.

Usage: python tools/gen_scale_data.py [--sf 1.0] [--out /tmp/scale_sf1]

Row counts scale linearly from sf0.1's: lineitem 600k -> 6M, orders
150k -> 1.5M, events 100k -> 1M, customer 15k -> 150k, part 20k -> 200k,
supplier 1k -> 10k, documents 5k -> 50k, embeddings 2k -> 20k (region /
nation stay fixed at 5 / 25).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 777  # deliberately NOT the driver's seed (42)

VOCAB = (
    "a agg batch big column customer data dup fast filter group hash "
    "join key line merge order part query row scan slow small sort "
    "spark stream table the value vector window"
).split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
SEGMENTS = ["MACHINERY", "BUILDING", "HOUSEHOLD", "AUTOMOBILE", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["view", "click", "signup", "purchase", "error"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
ADJ = ["large", "hot", "blue", "red", "small", "dim", "cold", "new"]
NOUN = ["ring", "bolt", "disk", "cog", "rod", "pin", "cap", "nut"]


def _ts(days_from, rng, n, base_day, span_days):
    days = rng.integers(0, span_days, n)
    return (base_day + days.astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )


def gen(sf: float, out: str) -> None:
    rng = np.random.default_rng(SEED)
    k = sf / 0.1  # multiplier vs the inspected sf0.1 shape
    n_cust = int(15_000 * k)
    n_supp = int(1_000 * k)
    n_part = int(20_000 * k)
    n_ord = int(150_000 * k)
    n_li = int(600_000 * k)
    n_ev = int(100_000 * k)
    n_doc = int(5_000 * k)
    n_emb = int(2_000 * k)
    n_user = int(1_500 * k)
    os.makedirs(out, exist_ok=True)

    def w(name, table):
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))
        print(name, table.num_rows)

    w("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    w("customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    w("part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{ADJ[a]} {NOUN[b]}"
            for a, b in zip(
                rng.integers(0, len(ADJ), n_part),
                rng.integers(0, len(NOUN), n_part),
            )
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, len(PTYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + np.arange(n_part) % 12000 * 0.1, 2),
    }))
    base = np.datetime64("1995-01-01", "D")
    odate = _ts(None, rng, n_ord, base, 2400)
    w("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [
            "OFP"[i] for i in rng.choice(3, n_ord, p=[0.49, 0.49, 0.02])
        ],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": odate,
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)],
    }))
    lok = rng.integers(0, n_ord, n_li)
    w("lineitem", pa.table({
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": [
            "NAR"[i] for i in rng.choice(3, n_li, p=[0.5, 0.25, 0.25])
        ],
        "l_linestatus": ["OF"[i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": _ts(None, rng, n_li, base, 2500),
    }))
    ev_base = np.datetime64("2024-01-01T00:00:00", "us")
    ev_off = rng.integers(0, 30 * 86_400_000_000, n_ev)
    w("events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": ev_base + ev_off.astype("timedelta64[us]"),
        "user_id": pa.array(rng.integers(0, n_user, n_ev), pa.int64()),
        "event_type": [ETYPES[i] for i in rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev).clip(0, 560), 2),
        "props": [f'{{"k": {i}}}' for i in rng.integers(0, 100, n_ev)],
    }))
    # documents: 20 sources, lang mix, 10..100 vocab words; ~5% carry
    # the 'dup' marker token; ~0.3% of rows are exact duplicates of an
    # earlier row (matches sf0.1's 8-group/16-row exact-dup density)
    n_words = rng.integers(10, 101, n_doc)
    texts = []
    for i in range(n_doc):
        ws = rng.integers(0, len(VOCAB), n_words[i])
        t = " ".join(VOCAB[j] for j in ws)
        texts.append(t)
    dup_idx = rng.choice(n_doc, max(2, int(n_doc * 0.003)), replace=False)
    for j in dup_idx:
        texts[j] = texts[(j * 7 + 1) % n_doc]
    w("documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.choice(5, n_doc, p=LANG_P)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    # embeddings: 10 gaussian clusters in 64-d, matching the observed
    # value envelope (~[-0.4, 0.4])
    labels = rng.integers(0, 10, n_emb)
    cents = rng.uniform(-0.25, 0.25, (10, 64))
    vecs = (cents[labels] + rng.normal(0, 0.05, (n_emb, 64))).clip(-0.4, 0.4)
    w("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.astype("float32")],
            pa.list_(pa.float32()),
        ),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/tmp/scale_sf1")
    args = ap.parse_args()
    gen(args.sf, args.out)

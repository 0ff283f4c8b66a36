#!/usr/bin/env python3
"""Builder-local scale-factor generator (timing only, NO oracle use).

Produces a schema-faithful 10x extension of the driver's sf0.1 testdata
(seed 42, deterministic) so the scale audit gets a fourth decade point:
same tables, same column types (timestamp[us]), same key relationships,
category vocabularies sampled from the real sf0.1 data, similar skew and
planted-duplicate rates. It is NOT the driver's generator — correctness
at this sf is never gated (the DuckDB oracle runs at sf0.01); the only
consumer is graft.ScaleAudit timing growth.

Usage: python3 tools/gen_sf.py <outDir> [scale]   # scale=10 -> "sf1"
"""
import json
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf1"
SCALE = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0  # vs sf0.1

rng = np.random.default_rng(42)

N_CUST = int(15000 * SCALE)
N_SUPP = int(1000 * SCALE)
N_PART = int(20000 * SCALE)
N_ORDERS = int(150000 * SCALE)
N_EVENTS = int(100000 * SCALE)
N_DOCS = int(5000 * SCALE)
N_VECS = int(2000 * SCALE)

MKT = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPE = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["large", "hot", "blue", "dim", "smooth", "dark", "light", "快"]
NOUN = ["ring", "bolt", "case", "disk", "cap", "lens", "gear", "pin"]
ETYPE = ["signup", "purchase", "view", "click", "error"]
LANGS = (["en"] * 8 + ["zh"] * 3 + ["es"] * 3 + ["fr"] * 3 + ["de"] * 3)
VOCAB = ("batch part spark line column order small sort fast value scan a "
         "vector query agg table hash slow filter customer stream key group "
         "join read write shuffle plan disk row").split()

import os
os.makedirs(OUT, exist_ok=True)


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"wrote {name}: {table.num_rows} rows")


def ts_us(dt64):
    return pa.array(dt64.astype("datetime64[us]"), type=pa.timestamp("us"))


# --- dimensions -------------------------------------------------------------
write("region", pa.table({
    "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}))

nk = np.arange(25, dtype=np.int32)
write("nation", pa.table({
    "n_nationkey": pa.array(nk),
    "n_name": [f"NATION_{i:02d}" for i in range(25)],
    "n_regionkey": pa.array(nk % 5)}))

ck = np.arange(N_CUST)
write("customer", pa.table({
    "c_custkey": ck,
    "c_name": [f"Customer#{i:09d}" for i in ck],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST).astype(np.int32)),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": pa.array(np.array(MKT)[rng.integers(0, 5, N_CUST)])}))

sk = np.arange(N_SUPP)
write("supplier", pa.table({
    "s_suppkey": sk,
    "s_name": [f"Supplier#{i:09d}" for i in sk],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP).astype(np.int32)),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2)}))

pk = np.arange(N_PART)
write("part", pa.table({
    "p_partkey": pk,
    "p_name": [f"{ADJ[i % 8]} {NOUN[(i // 8) % 8]}" for i in pk],
    "p_brand": pa.array([f"Brand#{i % 25}" for i in pk]),
    "p_type": pa.array(np.array(PTYPE)[rng.integers(0, 6, N_PART)]),
    "p_size": pa.array(rng.integers(1, 51, N_PART).astype(np.int32)),
    "p_retailprice": np.round(900.0 + (pk % 1001) * 0.1, 2)}))

# --- facts ------------------------------------------------------------------
ok = np.arange(N_ORDERS)
odate = (np.datetime64("1995-01-01") +
         rng.integers(0, 2405, N_ORDERS).astype("timedelta64[D]"))
write("orders", pa.table({
    "o_orderkey": ok,
    "o_custkey": rng.integers(0, N_CUST, N_ORDERS),
    "o_orderstatus": pa.array(np.array(["F", "O", "P"])[
        rng.choice(3, N_ORDERS, p=[0.49, 0.49, 0.02])]),
    "o_totalprice": np.round(rng.uniform(900, 105000, N_ORDERS), 2),
    "o_orderdate": ts_us(odate),
    "o_orderpriority": pa.array(np.array(PRIO)[rng.integers(0, 5, N_ORDERS)])}))

nline = rng.integers(1, 8, N_ORDERS)  # ~4 lines/order like the driver data
li_order = np.repeat(ok, nline)
n_li = li_order.size
li_lineno = (np.arange(n_li) - np.repeat(np.cumsum(nline) - nline, nline) + 1)
li_odate = np.repeat(odate, nline)
shipdate = li_odate + rng.integers(1, 95, n_li).astype("timedelta64[D]")
write("lineitem", pa.table({
    "l_orderkey": li_order,
    "l_partkey": rng.integers(0, N_PART, n_li),
    "l_suppkey": rng.integers(0, N_SUPP, n_li),
    "l_linenumber": pa.array(li_lineno.astype(np.int32)),
    "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
    "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
    "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
    "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
    "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
    "l_shipdate": ts_us(shipdate)}))

ev = np.arange(N_EVENTS)
ets = (np.datetime64("2024-01-01T00:00:00") +
       np.sort(rng.integers(0, 30 * 86400 * 10**6, N_EVENTS)).astype("timedelta64[us]"))
# near-uniform users like the driver data (its sf0.1 top user holds 99
# of 100k events vs a 66 mean — max/mean ~1.5, not a hot-key regime)
users = rng.integers(0, N_CUST, N_EVENTS)
write("events", pa.table({
    "event_id": ev,
    "ts": ts_us(ets),
    "user_id": users.astype(np.int64),
    "event_type": pa.array(np.array(ETYPE)[rng.integers(0, 5, N_EVENTS)]),
    "value": np.round(np.abs(rng.normal(0, 1, N_EVENTS)) ** 2 * 60, 2),
    "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 101, N_EVENTS)])}))

nwords = rng.integers(8, 100, N_DOCS)
texts = [" ".join(np.array(VOCAB)[rng.integers(0, len(VOCAB), n)])
         for n in nwords]
# planted exact duplicates at the driver's observed rate (~0.16%)
for i in rng.choice(N_DOCS, max(1, int(N_DOCS * 0.0016)), replace=False):
    texts[i] = texts[(i * 7 + 3) % N_DOCS]
write("documents", pa.table({
    "doc_id": np.arange(N_DOCS),
    "text": texts,
    "lang": pa.array(np.array(LANGS)[rng.integers(0, len(LANGS), N_DOCS)]),
    "source": pa.array([f"src{i}" for i in rng.integers(0, 20, N_DOCS)]),
    "n_chars": np.array([len(t) for t in texts], dtype=np.int64)}))

emb = rng.normal(0, 1, (N_VECS, 64)).astype(np.float32)
write("embeddings", pa.table({
    "vec_id": np.arange(N_VECS),
    "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, N_VECS).astype(np.int32))}))

with open(f"{OUT}/GENERATED.json", "w") as f:
    json.dump({"generator": "tools/gen_sf.py", "seed": 42, "scale_vs_sf0.1": SCALE,
               "purpose": "builder-local scale-audit point; never oracle-gated"}, f)
print("done", OUT)

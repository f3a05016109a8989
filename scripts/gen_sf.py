#!/usr/bin/env python3
"""Deterministic synthetic testdata generator for oracle-mirror scale
proofs ABOVE the driver's largest shipped scale (sf0.1).

The driver's sf0.001/0.01/0.1 dirs are independently sampled from one
distribution family (sf0.01 is NOT a prefix of sf0.1 — verified by
intersection), so a faithful fresh sample at sf1 is the same kind of
object the driver would have shipped. Every distribution parameter
below was measured from /root/testdata/sf0.1 (see ROUND7_NOTES):
row-count ratios, value ranges, the 30-word document vocabulary plus
the 'dup' marker word, the ~5%-of-docs planted near-dup rate (25
Jaccard>=0.2 pairs per 500 docs at sf0.01), the 0.16% exact-dup rate,
label-clustered unit-norm embeddings (within-label cosine ~0.11),
Poisson(4) lineitems per order (2764/150000 orders with zero), Exp(50)
event values, and the independence of l_shipdate from o_orderdate
(global datediff spans -2399..+2496 days).

The mirror itself is engine-vs-engine on the SAME files, so
correctness does not depend on matching the driver bit-for-bit — the
fidelity just ensures the same code paths (near-dup families, funnel
sequences, JSON props, label clusters) light up at 10x.

Usage: python3 scripts/gen_sf.py <sf> <outdir>     e.g. 1 /tmp/graft_sf1
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ['join', 'hash', 'row', 'batch', 'scan', 'customer', 'column',
         'filter', 'small', 'slow', 'merge', 'order', 'vector', 'line',
         'data', 'table', 'agg', 'value', 'key', 'stream', 'window',
         'spark', 'a', 'group', 'part', 'big', 'sort', 'query', 'fast',
         'the']
LANGS = ['en', 'zh', 'fr', 'es', 'de']
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SEGMENTS = ['AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY']
ADJS = ['blue', 'old', 'new', 'cold', 'red', 'small', 'large', 'hot']
NOUNS = ['widget', 'bolt', 'plate', 'rod', 'anvil', 'gizmo', 'ring', 'gear']
PTYPES = ['SMALL', 'PROMO', 'ECONOMY', 'LARGE', 'STANDARD', 'MEDIUM']
PRIOS = ['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW']
ETYPES = ['signup', 'click', 'purchase', 'error', 'view']
REGIONS = ['AFRICA', 'AMERICA', 'ASIA', 'EUROPE', 'MIDDLE EAST']
NATIONS = ['ALGERIA', 'ARGENTINA', 'BRAZIL', 'CANADA', 'EGYPT', 'ETHIOPIA',
           'FRANCE', 'GERMANY', 'INDIA', 'INDONESIA', 'IRAN', 'IRAQ',
           'JAPAN', 'JORDAN', 'KENYA', 'MOROCCO', 'MOZAMBIQUE', 'PERU',
           'CHINA', 'ROMANIA', 'SAUDI ARABIA', 'VIETNAM', 'RUSSIA',
           'UNITED KINGDOM', 'UNITED STATES']

DAY_US = 86400000000


def write(outdir, name, table):
    pq.write_table(table, os.path.join(outdir, f'{name}.parquet'))
    print(f'  {name}: {table.num_rows} rows', flush=True)


def ts_array(us, unit='us'):
    return pa.array(us, type=pa.timestamp(unit))


def main(sf, outdir):
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)
    n_cust = int(150000 * sf)
    n_supp = int(10000 * sf)
    n_part = int(200000 * sf)
    n_ord = int(1500000 * sf)
    n_ev = int(1000000 * sf)
    n_doc = int(50000 * sf)
    n_vec = int(20000 * sf)
    n_user = int(15000 * sf)

    write(outdir, 'region', pa.table({
        'r_regionkey': pa.array(range(5), pa.int32()),
        'r_name': REGIONS}))
    write(outdir, 'nation', pa.table({
        'n_nationkey': pa.array(range(25), pa.int32()),
        'n_name': NATIONS,
        'n_regionkey': pa.array([i % 5 for i in range(25)], pa.int32())}))

    write(outdir, 'customer', pa.table({
        'c_custkey': pa.array(range(n_cust), pa.int64()),
        'c_name': [f'Customer#{i:09d}' for i in range(n_cust)],
        'c_nationkey': pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        'c_acctbal': np.round(rng.uniform(-1000, 10000, n_cust), 2),
        'c_mktsegment': [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)]}))

    write(outdir, 'supplier', pa.table({
        's_suppkey': pa.array(range(n_supp), pa.int64()),
        's_name': [f'Supplier#{i:09d}' for i in range(n_supp)],
        's_nationkey': pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        's_acctbal': np.round(rng.uniform(-1000, 10000, n_supp), 2)}))

    write(outdir, 'part', pa.table({
        'p_partkey': pa.array(range(n_part), pa.int64()),
        'p_name': [f'{ADJS[a]} {NOUNS[b]}' for a, b in
                   zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))],
        'p_brand': [f'Brand#{i}' for i in rng.integers(1, 26, n_part)],
        'p_type': [PTYPES[i] for i in rng.integers(0, 6, n_part)],
        'p_size': pa.array(rng.integers(1, 51, n_part), pa.int32()),
        'p_retailprice': np.round(900.0 + (np.arange(n_part) % 1000) * 0.1, 1)}))

    epoch_1995 = np.datetime64('1995-01-01').astype('datetime64[us]').astype(np.int64)
    odate_days = rng.integers(0, 2405, n_ord)  # 1995-01-01 .. 2001-08-01
    write(outdir, 'orders', pa.table({
        'o_orderkey': pa.array(range(n_ord), pa.int64()),
        'o_custkey': pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        'o_orderstatus': [('O', 'F', 'P')[i] for i in rng.integers(0, 3, n_ord)],
        'o_totalprice': np.round(rng.uniform(1000, 500000, n_ord), 2),
        'o_orderdate': ts_array(epoch_1995 + odate_days * DAY_US),
        'o_orderpriority': [PRIOS[i] for i in rng.integers(0, 5, n_ord)]}))

    per_order = rng.poisson(4.0, n_ord)
    li_order = np.repeat(np.arange(n_ord, dtype=np.int64), per_order)
    n_li = len(li_order)
    write(outdir, 'lineitem', pa.table({
        'l_orderkey': pa.array(li_order, pa.int64()),
        'l_partkey': pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        'l_suppkey': pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        'l_linenumber': pa.array(rng.integers(1, 8, n_li), pa.int32()),
        'l_quantity': rng.integers(1, 51, n_li).astype(np.float64),
        'l_extendedprice': np.round(rng.uniform(900, 105000, n_li), 2),
        'l_discount': np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        'l_tax': np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        'l_returnflag': [('N', 'A', 'R')[i] for i in rng.integers(0, 3, n_li)],
        'l_linestatus': [('O', 'F')[i] for i in rng.integers(0, 2, n_li)],
        'l_shipdate': ts_array(epoch_1995 + rng.integers(1, 2500, n_li) * DAY_US)}))

    epoch_2024 = np.datetime64('2024-01-01').astype('datetime64[us]').astype(np.int64)
    write(outdir, 'events', pa.table({
        'event_id': pa.array(range(n_ev), pa.int64()),
        'ts': ts_array(epoch_2024 + rng.integers(0, 30 * DAY_US, n_ev)),
        'user_id': pa.array(rng.integers(0, n_user, n_ev), pa.int64()),
        'event_type': [ETYPES[i] for i in rng.integers(0, 5, n_ev)],
        'value': np.round(rng.exponential(50.0, n_ev), 2),
        'props': [json.dumps({'k': int(k)}) for k in rng.integers(0, 100, n_ev)]}))

    # documents: uniform vocab words, planted near-dups ('dup'-marked
    # mutations of an earlier doc) and rare exact dups
    texts = []
    for i in range(n_doc):
        r = rng.random()
        if i > 0 and r < 0.0016:
            texts.append(texts[rng.integers(0, i)])
            continue
        if i > 0 and r < 0.025:
            base = texts[rng.integers(0, i)].split(' ')
            for _ in range(2):
                base[rng.integers(0, len(base))] = 'dup'
            texts.append(' '.join(base))
            continue
        n_words = rng.integers(10, 101)
        texts.append(' '.join(VOCAB[w] for w in rng.integers(0, 30, n_words)))
    write(outdir, 'documents', pa.table({
        'doc_id': pa.array(range(n_doc), pa.int64()),
        'text': texts,
        'lang': [LANGS[i] for i in rng.choice(5, n_doc, p=LANG_P)],
        'source': [f'src{i}' for i in rng.integers(0, 20, n_doc)],
        'n_chars': pa.array([len(t) for t in texts], pa.int64())}))

    # embeddings: unit-norm 64-dim, 10 label clusters at within-label
    # cosine ~0.11 (0.35*center + unit noise, normalized)
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_vec)
    noise = rng.standard_normal((n_vec, 64)) / 8.0  # |noise| ~ 1
    vecs = 0.35 * centers[labels] + noise
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    write(outdir, 'embeddings', pa.table({
        'vec_id': pa.array(range(n_vec), pa.int64()),
        'embedding': pa.array([v for v in vecs], pa.list_(pa.float32())),
        'label': pa.array(labels, pa.int32())}))


if __name__ == '__main__':
    main(float(sys.argv[1]), sys.argv[2])

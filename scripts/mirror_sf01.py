#!/usr/bin/env python3
"""Full oracle mirror at bench scale (sf0.1), mirroring the driver's
DuckDB compare, with the quadratic exact-Jaccard pair generation
rewritten to the semantically-identical inverted-index form.

The registered oracles for the graph family (x_dedup_clusters,
x_pagerank, x_triangles, x_jaccard_pairs_prefix, x_near_dedup_keep)
deliberately use the trivially-auditable ALL-PAIRS formulation: `d a
JOIN d b ON a.doc_id < b.doc_id` with a per-pair list-intersection
Jaccard. At sf0.001/sf0.01 (the driver's gates) DuckDB runs it in
seconds; at sf0.1 (5000 docs, ~12.5M pairs each walking two ~300-item
lists) it is hours of DuckDB CPU. This script substitutes the postings
self-join: explode shingles, join on the shingle, count intersections,
and apply THE SAME Jaccard >= 0.2 filter - identical pair set, minutes
instead of hours. The substitution touches ONLY the candidate
generation; reachability/rank/triangle/keep-list logic runs verbatim.
(Round-4 also ran the canonical all-pairs text to completion at sf0.1
- ~9h of DuckDB CPU, 140/140 MATCH - proving the substitution is an
optimization, not a semantic change.)

Usage: python3 scripts/mirror_sf01.py <sf_dir> <verify_out_dir>
"""
import json
import sys

import duckdb
import numpy as np

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']

ALL_PAIRS_BODY = """FROM d a JOIN d b ON a.doc_id < b.doc_id
      WHERE len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0 /
            len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2"""

def inverted_index_pairs(alias_a, alias_b):
    """Postings-join pair CTE body producing columns (alias_a, alias_b)."""
    return f"""ex AS (SELECT doc_id, unnest(sh) AS s, len(sh) AS sz FROM d),
p AS (SELECT {alias_a}, {alias_b} FROM (
        SELECT a.doc_id AS {alias_a}, b.doc_id AS {alias_b}, count(*) AS i,
               any_value(a.sz) AS sa, any_value(b.sz) AS sb
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      WHERE i * 1.0 / (sa + sb - i) >= 0.2)"""

def substitute(name, sql):
    """Rewrite the all-pairs p CTE to the inverted-index form."""
    aliases = {'x_triangles': ('a', 'b')}.get(name, ('doc_a', 'doc_b'))
    a, b = aliases
    old = f"""p AS (SELECT a.doc_id AS {a}, b.doc_id AS {b}
      {ALL_PAIRS_BODY})"""
    if old not in sql:
        return None
    return sql.replace(old, inverted_index_pairs(a, b))

QUADRATIC = ['x_dedup_clusters', 'x_pagerank', 'x_triangles',
             'x_near_dedup_keep']

# multi-reference oracles: stage the pair-generation prefix into a
# temp table before the tail that references it many times. DuckDB
# does not honor CTE MATERIALIZED markers under WITH RECURSIVE and
# re-expands the whole prefix per reference (the r7 sf1 mirror caught
# x_dedup_clusters_lsh burning 180+ CPU-minutes re-evaluating a
# 25-second prefix); x_pagerank is not recursive but its edge CTE is
# referenced by all five rank iterations, multiplying the postings-
# join spill until the disk fills. Forcing the materialization the
# SQL already declares is a pure evaluation-order change — identical
# rows either way.
REACH_STAGED = ['x_dedup_clusters', 'x_dedup_clusters_lsh',
                'x_near_dedup_keep', 'x_near_dedup_keep_lsh',
                'x_pagerank']

import re as _re

def run_reach_staged(con, sql):
    """Split at the `e AS (... FROM <pairs>)` edge CTE: execute the
    prefix into __pairs, then the recursion verbatim against it.
    Returns the result frame, or None if the shape is unrecognized."""
    m = _re.search(r",\s*\ne AS \(SELECT doc_a AS src, doc_b AS dst FROM (\w+)", sql)
    if m is None:
        return None
    pairs = m.group(1)
    prefix = sql[:m.start()].replace('WITH RECURSIVE', 'WITH', 1)
    con.execute("DROP TABLE IF EXISTS __pairs")
    con.execute("CREATE TEMP TABLE __pairs AS " + prefix +
                f"\nSELECT doc_a, doc_b FROM {pairs}")
    tail = sql[m.start():].lstrip().lstrip(',').lstrip()
    tail = tail.replace(f"FROM {pairs}", "FROM __pairs")
    return con.execute("WITH RECURSIVE " + tail).fetchdf()

def main(sf, out, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    ok, bad, substituted = [], [], []
    for name, sql in sorted(oracle.items()):
        if name in QUADRATIC:
            rewritten = substitute(name, sql)
            if rewritten is None:
                bad.append((name, 'SUBSTITUTION PATTERN MISS')); continue
            sql = rewritten
            substituted.append(name)
        elif name == 'x_jaccard_pairs_prefix':
            # no p CTE: the all-pairs join is the whole body
            old = """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0 /
      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
ORDER BY doc_a, doc_b"""
            if old not in sql:
                bad.append((name, 'SUBSTITUTION PATTERN MISS')); continue
            # continue the WITH list (the original query's SELECT sat
            # directly after `d AS (...)`, so the new CTEs need a comma)
            new = ", " + inverted_index_pairs('doc_a', 'doc_b') + \
                "\nSELECT doc_a, doc_b FROM p ORDER BY doc_a, doc_b"
            sql = sql.replace(old, new)
            substituted.append(name)
        try:
            if name in REACH_STAGED:
                want = run_reach_staged(con, sql)
                if want is None:
                    bad.append((name, 'REACH STAGE PATTERN MISS')); continue
                substituted.append(name + ':staged')
            else:
                want = con.execute(sql).fetchdf()
        except Exception as e:
            bad.append((name, 'ORACLE ERR: ' + str(e)[:120])); continue
        try:
            got = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
        except Exception:
            bad.append((name, 'NO SPARK OUT')); continue
        if sorted(want.columns) != sorted(got.columns):
            bad.append((name, f'COLS {sorted(want.columns)} vs {sorted(got.columns)}')); continue
        w = want.reindex(sorted(want.columns), axis=1)
        g = got.reindex(sorted(got.columns), axis=1)
        w = w.sort_values(list(w.columns)).reset_index(drop=True)
        g = g.sort_values(list(g.columns)).reset_index(drop=True)
        if len(w) != len(g):
            bad.append((name, f'ROWS {len(w)} vs {len(g)}')); continue
        mm = None
        for c in w.columns:
            try:
                if w[c].dtype.kind in 'fc' or g[c].dtype.kind in 'fc':
                    if not np.allclose(w[c].astype(float), g[c].astype(float),
                                       rtol=0, atol=0, equal_nan=True):
                        mm = c; break
                else:
                    if not (w[c].astype(str) == g[c].astype(str)).all():
                        mm = c; break
            except Exception as e:
                mm = f'{c}:{str(e)[:60]}'; break
        (bad.append((name, 'VAL ' + str(mm))) if mm else ok.append(name))
        print(f'  {name}: {"MATCH" if not mm else "MISMATCH " + str(mm)}', flush=True)
    print(f'MATCH {len(ok)}/{len(oracle)}  (substituted: {sorted(substituted)})')
    for name, why in bad:
        print('BAD', name, why)

if __name__ == '__main__':
    # optional 3rd arg: comma-separated subset of query names to run
    main(sys.argv[1], sys.argv[2],
         set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None)

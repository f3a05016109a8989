#!/usr/bin/env python3
"""Mirror of the driver's DuckDB-oracle compare, for local iteration.

Usage: python3 scripts/check_oracle.py <sf_dir> <verify_out_dir>
"""
import duckdb, json, glob, os, sys
import numpy as np

TABLES = ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']

def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    ok, bad = [], []
    for name, sql in sorted(oracle.items()):
        try: want = con.execute(sql).fetchdf()
        except Exception as e: bad.append((name, 'ORACLE ERR: '+str(e)[:120])); continue
        try: got = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
        except Exception: bad.append((name, 'NO SPARK OUT')); continue
        if sorted(want.columns) != sorted(got.columns):
            bad.append((name, f'COLS {sorted(want.columns)} vs {sorted(got.columns)}')); continue
        w = want.reindex(sorted(want.columns), axis=1)
        g = got.reindex(sorted(got.columns), axis=1)
        w = w.sort_values(list(w.columns)).reset_index(drop=True)
        g = g.sort_values(list(g.columns)).reset_index(drop=True)
        if len(w) != len(g): bad.append((name, f'ROWS {len(w)} vs {len(g)}')); continue
        mm = None
        for c in w.columns:
            try:
                if w[c].dtype.kind in 'fc' or g[c].dtype.kind in 'fc':
                    if not np.allclose(w[c].astype(float), g[c].astype(float),
                                       rtol=0, atol=0, equal_nan=True): mm = c; break
                else:
                    if not (w[c].astype(str) == g[c].astype(str)).all(): mm = c; break
            except Exception as e: mm = f'{c}:{str(e)[:60]}'; break
        (bad.append((name, 'VAL ' + str(mm))) if mm else ok.append(name))
    print(f'MATCH {len(ok)}/{len(oracle)}')
    for n, why in bad: print('FAIL', n, '--', why)
    for d in sorted(glob.glob(f'{out}/*/')):
        name = os.path.basename(d.rstrip('/'))
        if name not in oracle:
            try: n = con.execute(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
            except Exception: n = -1
            print('rows-only', name, 'rows=', n)
    return 1 if bad else 0

if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))

import sys
import duckdb
import pandas as pd
import numpy as np
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False)
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import __ray_entry__ as e

import os
SF = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs = e.queries(); osql = e.oracle_sql()
only = os.environ.get("ORACLE_ONLY")
if only:
    names = {n.strip() for n in only.split(",")}
    osql = {n: s for n, s in osql.items() if n in names}
fails = []
for name, sql in osql.items():
    try:
        got = qs[name](SF)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        elif not isinstance(got, pd.DataFrame):
            got = got.to_pandas() if hasattr(got, 'to_pandas') else pd.DataFrame(got)
        want = con.execute(sql).df()
        g = got.reindex(sorted(got.columns), axis=1)
        w = want.reindex(sorted(want.columns), axis=1)
        if sorted(g.columns) != sorted(w.columns):
            fails.append((name, f"columns {list(g.columns)} vs {list(w.columns)}")); continue
        if len(g) != len(w):
            fails.append((name, f"rows {len(g)} vs {len(w)}")); continue
        g = g.sort_values(list(g.columns)).reset_index(drop=True)
        w = w.sort_values(list(w.columns)).reset_index(drop=True)
        ok = True
        for c in g.columns:
            gv, wv = g[c], w[c]
            if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(wv.dtype, np.floating):
                ga = gv.astype(float).to_numpy(); wa = wv.astype(float).to_numpy()
                exact = (ga == wa) | (np.isnan(ga) & np.isnan(wa))
                if not exact.all():
                    bad = (~exact).sum()
                    mx = np.nanmax(np.abs(ga - wa))
                    ok = False
                    fails.append((name, f"values col {c}: {bad} inexact, max diff {mx:.2e}"))
                    break
            else:
                if not (gv.astype(str).values == wv.astype(str).values).all():
                    ok = False; fails.append((name, f"values col {c}")); break
        if ok:
            print(f"OK   {name}: {len(g)} rows")
    except Exception as ex:
        fails.append((name, f"EXC {type(ex).__name__}: {ex}"))
for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"{len(osql)-len(fails)}/{len(osql)} oracle matches")
ray.shutdown()

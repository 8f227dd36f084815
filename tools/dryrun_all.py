"""Driver-style dry run: ALL registered queries vs their oracles at
sf0.01, 32 CPUs — mimics the round driver (sorted columns, value
compare)."""
import sys

import duckdb
import numpy as np
import pandas as pd
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
sys.path.insert(0, "/root/repo")
import __ray_entry__ as e  # noqa: E402

SF = "/root/testdata/sf0.01"
qs, sql = e.queries(), e.oracle_sql()
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v)
                              if isinstance(v, (list, np.ndarray)) else v)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


n_pass = n_fail = 0
fails = []
import time
for name in qs:
    t0 = time.perf_counter()
    try:
        r = qs[name](SF)
        rdf = r.to_pandas() if hasattr(r, "to_pandas") else pd.DataFrame(r)
        if name in sql:
            odf = con.execute(sql[name]).df()
            a, b = norm(rdf), norm(odf)
            ok = (len(a) == len(b) and list(a.columns) == list(b.columns))
            if ok:
                # round float columns before the string compare so a
                # last-ulp formatting difference between Ray and DuckDB
                # doesn't report a spurious mismatch
                fa = [c for c in a.columns if a[c].dtype.kind in "fc"]
                fb = [c for c in b.columns if b[c].dtype.kind in "fc"]
                a2 = a.assign(**{c: a[c].round(9) for c in fa})
                b2 = b.assign(**{c: b[c].round(9) for c in fb})
                ok = a2.astype(str).equals(b2.astype(str))
            status = "PASS" if ok else "VALUE-MISMATCH"
        else:
            status = f"rows-only ({len(rdf)})"
            ok = True
    except Exception as ex:
        status, ok = f"ERROR {type(ex).__name__}: {str(ex)[:120]}", False
    dt = time.perf_counter() - t0
    if ok:
        n_pass += 1
    else:
        n_fail += 1
        fails.append(name)
    print(f"{name:32s} {status:20s} {dt:6.2f}s", flush=True)
print(f"\n{n_pass} pass / {n_fail} fail; fails={fails}")
ray.shutdown()

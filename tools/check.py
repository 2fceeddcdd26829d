#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
graft.Verify parquet output against its DuckDB oracle, strictly
(sorted column names, exact values). Usage:
  python3 tools/check.py <sfDir> <verifyOutDir> [--skip name[,name...]]

--skip marks queries rows-only for this run (useful at sf0.1, where
x28_dup_clusters' recursive-CTE oracle is quadratic in component size
and runs for minutes; the driver's gate at sf0.01 checks it in ~4 s).
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    oracle = {k: v for k, v in oracle.items() if k not in skip}
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = 0
    for name in names:
        if name not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
            print(f"{'ROWS-ONLY':>9}  {name}: {n} rows")
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{'ERROR':>9}  {name}: {e}")
            n_fail += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"{'FAIL':>9}  {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"{'FAIL':>9}  {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            a, b = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                eq = (x == y) or (x is None and y is None)
                if not eq and isinstance(x, float) and isinstance(y, float):
                    if math.isnan(x) and math.isnan(y):
                        eq = True
                    else:
                        eq = (x == y)  # exact: mimic hash compare
                        if not eq:
                            bad = (c, i, x, y, abs(x - y))
                            break
                if not eq:
                    bad = (c, i, x, y, None)
                    break
            if bad:
                break
        if bad:
            c, i, x, y, d = bad
            print(f"{'FAIL':>9}  {name}: col={c} row={i} got={x!r} want={y!r}"
                  + (f" absdiff={d}" if d is not None else ""))
            n_fail += 1
        else:
            # also check dtypes loosely for schema surprises
            dt = [(c, str(got[c].dtype), str(want[c].dtype))
                  for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
            note = f"  dtypes differ: {dt}" if dt else ""
            print(f"{'PASS':>9}  {name}: {len(got)} rows{note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    args = sys.argv[1:]
    skip = ()
    if "--skip" in args:
        i = args.index("--skip")
        if i + 1 >= len(args):
            sys.exit(f"usage: {__doc__}")
        skip = tuple(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    if len(args) != 2:
        sys.exit(f"usage: {__doc__}")
    sys.exit(main(args[0], args[1], skip))

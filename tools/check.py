#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
graft.Verify parquet output against its DuckDB oracle, strictly
(sorted column names, exact values). Usage:
  python3 tools/check.py <sfDir> <verifyOutDir> [--skip name[,name...]]

--skip marks queries rows-only for this run.

x28_dup_clusters (and x30_dedup_apply, which derives from it) are
checked against a LINEAR union-find oracle below instead of their
recursive-CTE SQL (which is quadratic in component size — minutes at
sf0.1, while the union-find is sub-second at any sf), so no sf needs
to skip them. The SQL stays in oracle_sql.json for the driver's
independent gate.
"""
import json, sys, math
from collections import Counter
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# keep in sync with graft.operators.Dedup.ClusterHamming; the single-bit
# probe loop below relies on it being 1
CLUSTER_HAMMING = 1


def x28_expected(con):
    """Union-find oracle for x28_dup_clusters, mirroring Dedup.dupClusters:
    seed-'0' 16-bit simhash per doc (= bits 0..15 of the 64-bit
    signature), connected components over Hamming<=1 edges in 16-bit
    signature space (probed by single-bit flips: <=65536*16 probes
    total, linear — vs the recursive CTE's quadratic reachability),
    min-doc labels, membership sizes, null-text docs as singletons."""
    assert CLUSTER_HAMMING == 1, "probe loop assumes single-bit edges"
    poly = ("list_reduce([CAST(0 AS BIGINT)] || "
            "list_transform(string_split('0' || w, ''), "
            "c -> CAST(ascii(c) AS BIGINT)), "
            "(a, b) -> (a * 31 + b) % 1000000007)")
    sig_sql = f"""
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    h AS (SELECT doc_id, {poly} AS h FROM w),
    bits AS (SELECT doc_id, k, SUM(2 * ((h >> k) & 1) - 1) AS sgn
             FROM h CROSS JOIN (SELECT unnest(range(0, 16)) AS k) ks
             GROUP BY 1, 2)
    SELECT doc_id, CAST(SUM(CASE WHEN sgn > 0 THEN 1 << k ELSE 0 END) AS BIGINT) AS sig
    FROM bits GROUP BY 1"""
    sigs = dict(con.execute(sig_sql).fetchall())
    null_docs = [d for (d,) in con.execute(
        "SELECT doc_id FROM documents WHERE text IS NULL").fetchall()]

    parent = {s: s for s in set(sigs.values())}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s in list(parent):
        for b in range(16):
            t = s ^ (1 << b)
            if t in parent:
                ra, rb = find(s), find(t)
                if ra != rb:
                    parent[ra] = rb

    # Independent cross-check of the probe loop above (which mirrors
    # Dedup.dupClusters' own single-bit-probe construction, so a shared
    # conceptual bug — e.g. an incomplete probe enumeration — would pass
    # both sides): recompute components by PAIRWISE popcount over the
    # distinct signatures (no probe assumption at all; O(m^2) on m
    # distinct 16-bit values, m <= 65536 — numpy, sub-second) and
    # assert the partitions coincide. Signature construction itself is
    # independently gated via x4_simhash's hash-exact DuckDB oracle
    # (the 16-bit slice is bits 0..15 of that same 64-bit signature).
    import numpy as np
    uniq = np.array(sorted(set(sigs.values())), dtype=np.uint16)
    m = len(uniq)
    if m:
        xor = uniq[:, None] ^ uniq[None, :]
        # popcount via 16-bit lookup table
        lut = np.array([bin(i).count("1") for i in range(1 << 16)],
                       dtype=np.uint8)
        adj = lut[xor] <= CLUSTER_HAMMING
        comp = -np.ones(m, dtype=np.int64)
        cid = 0
        for i in range(m):
            if comp[i] >= 0:
                continue
            stack = [i]
            comp[i] = cid
            while stack:
                j = stack.pop()
                for k in np.nonzero(adj[j])[0]:
                    if comp[k] < 0:
                        comp[k] = cid
                        stack.append(int(k))
            cid += 1
        sig_comp = {int(s): int(c) for s, c in zip(uniq, comp)}
        probe_parts = {}
        bfs_parts = {}
        for s in uniq:
            probe_parts.setdefault(find(int(s)), set()).add(int(s))
            bfs_parts.setdefault(sig_comp[int(s)], set()).add(int(s))
        assert (sorted(map(sorted, probe_parts.values()))
                == sorted(map(sorted, bfs_parts.values()))), \
            "x28 oracle self-check failed: probe union-find != pairwise BFS"
    comp_min = {}
    for d, s in sigs.items():
        r = find(s)
        comp_min[r] = min(comp_min.get(r, d), d)
    rows = [(d, comp_min[find(s)]) for d, s in sigs.items()]
    rows += [(d, d) for d in null_docs]
    sz = Counter(rep for _, rep in rows)
    import pandas as pd
    return (pd.DataFrame(
        [(d, rep, sz[rep]) for d, rep in rows],
        columns=["doc_id", "cluster_rep", "cluster_size"])
        .astype("int64").sort_values("doc_id").reset_index(drop=True))


def x30_expected(con):
    """x30 = x28's clustering plus the keep rule (rep keeps, rest drop)."""
    df = x28_expected(con)
    df["kept"] = df["doc_id"] == df["cluster_rep"]
    return df


_x101_cache = None


def x101_expected(con, oracle, out_dir=None):
    """Linear union-find for x101_dup_components over x2's oracled pair
    relation (the recursive-CTE reachability in oracle_sql.json is
    quadratic in component size — fine for the driver at sf0.01, not
    for the sf0.1/sf1 gates here; same treatment as x28). Memoized:
    x102_expected re-derives from the same labels, and the pair SQL is
    the expensive part.

    Pair source: when the SAME verify run carries x2's own output
    (out_dir/x2_minhash_lsh), read that — it is hash-verified against
    the oracle SQL by this very script, and the SQL re-derivation costs
    ~70 min at sf1 (DuckDB re-md5s every pair's full shingle lists; no
    group compression). Include x2_minhash_lsh in subset runs that name
    x101/x102 to get this path; main() only hands us out_dir after x2's
    own check PASSED this invocation (x2 skipped/failed -> out_dir is
    None here and we re-derive from SQL — never circular). Falls back
    to the SQL otherwise."""
    global _x101_cache
    if _x101_cache is not None:
        return _x101_cache
    import os
    x2dir = f"{out_dir}/x2_minhash_lsh" if out_dir else None
    if x2dir and os.path.isdir(x2dir):
        pairs = con.execute(
            f"SELECT doc_a, doc_b FROM read_parquet('{x2dir}/*.parquet')"
        ).fetchall()
    else:
        pairs = con.execute(oracle["x2_minhash_lsh"]).fetchall()
    docs = [d for (d,) in con.execute(
        "SELECT doc_id FROM documents").fetchall()]
    parent = {d: d for d in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for row in pairs:
        a, b = row[0], row[1]
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min = {}
    for d in docs:
        r = find(d)
        comp_min[r] = min(comp_min.get(r, d), d)
    rows = [(d, comp_min[find(d)]) for d in docs]
    sz = Counter(rep for _, rep in rows)
    import pandas as pd
    _x101_cache = (pd.DataFrame(
        [(d, rep, sz[rep]) for d, rep in rows],
        columns=["doc_id", "component_rep", "component_size"])
        .astype("int64").sort_values("doc_id").reset_index(drop=True))
    return _x101_cache


def x102_expected(con, oracle, out_dir=None):
    """x101's union-find labels + the longest-member keep policy
    (n_chars desc, doc_id asc) for x102_canonical_keep."""
    base = x101_expected(con, oracle, out_dir)
    nc = dict(con.execute(
        "SELECT doc_id, n_chars FROM documents").fetchall())
    best = {}
    for d, rep in zip(base["doc_id"], base["component_rep"]):
        key = (-nc[d], d)
        if rep not in best or key < best[rep]:
            best[rep] = key
    df = base.copy()
    df["keep_doc"] = [best[rep][1] for rep in df["component_rep"]]
    df["keep_doc"] = df["keep_doc"].astype("int64")
    df["kept"] = df["doc_id"] == df["keep_doc"]
    return df

def x117_expected(con, oracle, out_dir=None):
    """x117_corpus_build: the same union-find substitution as x101/x102
    — the capstone's oracle composes componentLabelsCte, whose recursive
    reachability is quadratic in component size (fine for the driver at
    sf0.01, measured >25 min at sf1). Labels come from x101_expected
    (union-find over x2's verified pairs); the REST of the composed SQL
    runs verbatim with the one `lab` reference redirected to the
    registered labels table, leaving the recursive chain unreferenced —
    DuckDB never evaluates unreferenced CTEs. The driver's independent
    sf0.01 gate still runs the committed SQL untouched."""
    base = x101_expected(con, oracle, out_dir)
    con.register("uf_lab_df", base[["doc_id", "component_rep"]])
    con.execute(
        "CREATE OR REPLACE TEMP TABLE uf_lab AS SELECT * FROM uf_lab_df")
    sql = oracle["x117_corpus_build"]
    assert sql.count("FROM lab l") == 1, "x117 oracle shape changed"
    return con.execute(sql.replace("FROM lab l", "FROM uf_lab l")).df()


def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    # full map kept for helper oracles that compose OTHER queries' SQL
    # (x101_expected reads x2's pairs even when x2 itself is skipped)
    oracle_all = json.load(open(f"{out_dir}/oracle_sql.json"))
    oracle = {k: v for k, v in oracle_all.items() if k not in skip}
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    # Check x2_minhash_lsh FIRST: x101/x102's union-find oracle may read
    # x2's parquet as its pair source, and that fast path is only
    # non-circular if x2's own hash check ran and PASSED in this
    # invocation (x2 skipped or failed -> fall back to the SQL
    # derivation, never let the system under test supply its own oracle).
    if "x2_minhash_lsh" in names:
        names.remove("x2_minhash_lsh")
        names.insert(0, "x2_minhash_lsh")
    x2_verified = False
    n_pass = n_fail = 0
    import time
    t_start = time.time()
    for name in names:
        t_q = time.time()
        if name not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
            print(f"{'ROWS-ONLY':>9}  {name}: {n} rows")
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            x2_dir = out_dir if x2_verified else None
            want = (x28_expected(con) if name == "x28_dup_clusters"
                    else x30_expected(con) if name == "x30_dedup_apply"
                    else x101_expected(con, oracle_all, x2_dir)
                    if name == "x101_dup_components"
                    else x102_expected(con, oracle_all, x2_dir)
                    if name == "x102_canonical_keep"
                    else x117_expected(con, oracle_all, x2_dir)
                    if name == "x117_corpus_build"
                    else con.execute(oracle[name]).df())
        except Exception as e:
            print(f"{'ERROR':>9}  {name}: {e}  [{time.time() - t_q:.1f}s]",
                  flush=True)
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
            # vectorized fast path: Series.equals treats NaN==NaN and
            # None==None as equal — exactly this loop's semantics; the
            # python row loop below only runs to LOCATE a discrepancy
            # (or when dtypes differ, where equals() is conservative)
            if got[c].equals(want[c]):
                continue
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
            print(f"{'PASS':>9}  {name}: {len(got)} rows{note}"
                  f"  [{time.time() - t_q:.1f}s]", flush=True)
            n_pass += 1
            if name == "x2_minhash_lsh":
                x2_verified = True
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total"
          f"  [{time.time() - t_start:.0f}s]")
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

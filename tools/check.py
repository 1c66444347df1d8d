#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare (column-name-sorted,
row-sorted) values against the Spark parquet dumps produced by graft.Verify.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir] [--json OUT.json]

With --json, also writes a machine-readable summary (counts + per-query
status/rows) so every round has a committed correctness record even if the
driver-side artifact arrives empty (round-8 failure mode).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # decimals -> canonical string
            df[c] = s.map(lambda v: None if v is None else str(v))
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def main():
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "/tmp/verify_out"
    per_query = {}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    all_dirs = {os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p)}
    # a query that threw inside graft.Verify writes no dir — that is a FAIL,
    # not a silent skip
    for missing in sorted(set(oracle) - all_dirs):
        print(f"FAIL {missing}: no spark output (query failed in Verify)")
        per_query[missing] = {"status": "fail", "reason": "no spark output"}
        n_fail += 1
    for name in sorted(all_dirs):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output files")
            per_query[name] = {"status": "fail", "reason": "no output files"}
            n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"ROWS {name}: {len(got)} rows (no oracle)")
            per_query[name] = {"status": "rows_only", "rows": len(got)}
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            per_query[name] = {"status": "fail", "reason": f"oracle SQL error: {e}"}
            n_fail += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} duck={list(e.columns)}")
            per_query[name] = {"status": "fail", "reason": "column mismatch"}
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} duck={len(e)}")
            per_query[name] = {"status": "fail", "reason": f"row count spark={len(g)} duck={len(e)}"}
            n_fail += 1; continue
        # dtype-strict int-vs-float: the driver hashes raw values, so a Spark
        # BIGINT 3 vs an oracle float64 3.0 (DuckDB HUGEINT -> pandas float64)
        # is a hash FAIL even though values compare equal. Mirror that here.
        kind_fail = False
        for c in g.columns:
            gk = "i" if pd.api.types.is_integer_dtype(g[c]) else (
                 "f" if pd.api.types.is_float_dtype(g[c]) else "o")
            ek = "i" if pd.api.types.is_integer_dtype(e[c]) else (
                 "f" if pd.api.types.is_float_dtype(e[c]) else "o")
            if gk != ek:
                print(f"FAIL {name}: dtype kind mismatch col {c}: "
                      f"spark={g[c].dtype} duck={e[c].dtype}")
                kind_fail = True
        if kind_fail:
            per_query[name] = {"status": "fail", "reason": "dtype kind mismatch"}
            n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            per_query[name] = {"status": "pass", "rows": len(g)}
            n_pass += 1
        except AssertionError as ex:
            n_fail += 1
            per_query[name] = {"status": "fail", "reason": "value mismatch"}
            print(f"FAIL {name}: value mismatch")
            # show first differing cells
            for c in g.columns:
                neq = ~((g[c] == e[c]) | (g[c].isna() & e[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"  col {c} row {i}: spark={g[c][i]!r} duck={e[c][i]!r} ({int(neq.sum())} diffs)")
    print(f"== {n_pass} pass, {n_fail} fail, {len(all_dirs)} total")
    if json_out:
        n_rows_only = sum(1 for v in per_query.values() if v["status"] == "rows_only")
        summary = {
            "sf_dir": sf, "entries": len(all_dirs),
            "oracle_green": n_pass, "rows_only": n_rows_only, "fail": n_fail,
            "queries": {k: per_query[k] for k in sorted(per_query)},
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
testdata parquet tables, loads the corresponding Spark result written by
graft.Verify, and compares columns / row counts / values (exact).

Usage: python3 tools/check_oracle.py [sfDir] [outDir]
Dev-only tool — the shipped Scala library never depends on Python.
"""
import sys, json, glob
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def repr_mismatch(e, g):
    """True when one side is a float dtype and the other an integer
    dtype. The numeric compare below treats 2660.0 == 2660 as a match,
    but the DRIVER hashes rendered values, so an int-vs-float dtype
    split is a board-red even with equal values — this is exactly how
    a bare DuckDB SUM over INTEGER (HUGEINT → pandas float64) against
    Spark's int64 stayed locally green and driver-red for four rounds
    (the t19 episode, fixed r14: CAST every integer-sum output to
    BIGINT in the oracle SQL)."""
    import pandas.api.types as pt
    def kind(s):
        if pt.is_float_dtype(s):
            return "float"
        if pt.is_integer_dtype(s):
            return "int"
        return None
    ke, kg = kind(e), kind(g)
    return ke is not None and kg is not None and ke != kg


def col_equal(name, e, g):
    if len(e) == 0:
        return True
    # exact numeric compare (with NaN==NaN)
    try:
        ef, gf = e.astype("float64"), g.astype("float64")
        return bool(((ef == gf) | (ef.isna() & gf.isna())).all())
    except (ValueError, TypeError):
        pass
    es, gs = e.astype(str), g.astype(str)
    if bool((es == gs).all()):
        return True
    try:
        et = pd.to_datetime(e.astype(str))
        gt = pd.to_datetime(g.astype(str))
        return bool((et == gt).all())
    except (ValueError, TypeError):
        return False


def version_report(out=None):
    """DuckDB engine fingerprint + dialect probes — written next to the
    verify artifacts so a builder-vs-driver hash divergence (the t19
    episode) is diagnosable from the JSON alone."""
    con = duckdb.connect()
    probes = {
        "duckdb_version": duckdb.__version__,
        "pandas_version": pd.__version__,
        # dialect probes: behaviors that have shifted across versions
        "int_div": str(con.execute("SELECT 7 // 2").fetchone()[0]),
        "decimal_mul": str(con.execute(
            "SELECT CAST(8231 AS DECIMAL(5,0)) * 0.0001").fetchone()[0]),
        "round_half": str(con.execute("SELECT ROUND(2.5, 0)").fetchone()[0]),
        "double_fmt": str(con.execute("SELECT 0.1 + 0.2").fetchone()[0]),
        # SUM over INTEGER is HUGEINT; how this engine+pandas pair
        # materializes it decides whether a bare integer-sum output
        # column hash-matches Spark's int64 (the t19 episode — r14)
        "sum_int_dtype": str(con.execute(
            "SELECT SUM(x) AS s FROM (SELECT 1 AS x)").fetchdf()["s"].dtype),
    }
    blob = json.dumps(probes, indent=2)
    print(blob)
    if out:
        with open(f"{out}/check_env.json", "w") as fh:
            fh.write(blob)
    return probes


def main():
    if "--version-report" in sys.argv:
        version_report(None)
        return
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_smoke"
    version_report(out)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok, fails = 0, []
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            fails.append(name)
            continue
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            fails.append(name)
            continue
        got = pd.concat([pq.read_table(f).to_pandas() for f in files],
                        ignore_index=True)
        exp = exp.reindex(sorted(exp.columns), axis=1).reset_index(drop=True)
        got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            fails.append(name)
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            fails.append(name)
            continue
        reprbad = [c for c in exp.columns if repr_mismatch(exp[c], got[c])]
        if reprbad:
            for c in reprbad:
                print(f"FAIL {name}: column {c} REPRESENTATION mismatch "
                      f"(exp dtype {exp[c].dtype}, got {got[c].dtype}) — "
                      f"values may be equal but the driver hashes "
                      f"renderings; CAST integer sums to BIGINT in the "
                      f"oracle SQL")
            fails.append(name)
            continue
        bad = [c for c in exp.columns if not col_equal(name, exp[c], got[c])]
        if bad:
            for c in bad:
                print(f"FAIL {name}: column {c} mismatch "
                      f"(exp dtype {exp[c].dtype}, got {got[c].dtype})")
                m = (exp[c].astype(str) != got[c].astype(str))
                idx = list(m[m].index[:3])
                for i in idx:
                    print(f"   row {i}: exp={exp[c][i]!r} got={got[c][i]!r}")
            fails.append(name)
        else:
            n_ok += 1
            print(f"OK   {name} ({len(exp)} rows)")
    print(f"\n{n_ok}/{len(oracle)} queries match; fails: {fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()

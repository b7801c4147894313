#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracles.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet result (written by graft.Verify)
plus <verify_out_dir>/oracle_sql.json, runs each oracle against the parquet
tables in <sf_dir> with DuckDB, and compares rows / schema (column names) /
values (columns sorted by name, rows sorted, floats rounded).

Dev tool only — the Scala library never depends on this.
"""
import sys, os, json, glob, math, decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # DuckDB DECIMAL aggregates come back as decimal.Decimal while the Spark
    # parquet side yields float — normalize both to float before comparing
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"  # NaN != NaN would flag agreeing results as diffs
        if math.isinf(v) or v == 0.0:
            return v
        # relative tolerance: round to 9 significant digits, not 6 decimal
        # places — absolute rounding is too strict for 1e9-scale sums and
        # too lax near zero
        return round(v, 8 - int(math.floor(math.log10(abs(v)))))
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    return v


def sort_key(t):
    # type-aware: numbers order numerically so a reported mismatch row index
    # pairs the same logical rows on both sides (str() would order "10"<"9")
    return tuple((x is None, isinstance(x, str), x if isinstance(x, (int, float)) and not isinstance(x, bool) else 0, str(x)) for x in t)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=sort_key)
    return [cols[i] for i in order], out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    fails = []
    for name in sorted(oracles):
        res_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not res_glob:
            fails.append((name, "no spark result parquet"))
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(
                "SELECT * FROM read_parquet([" +
                ",".join(f"'{p}'" for p in res_glob) + "])")
            s_cols = list(spark_rel.columns)
            s_rows = spark_rel.fetchall()
            o_rel = con.sql(oracles[name])
            o_cols = list(o_rel.columns)
            o_rows = o_rel.fetchall()
        except Exception as e:
            fails.append((name, f"exec error: {e}"))
            n_fail += 1
            continue
        sc, sr = canon(s_cols, s_rows)
        oc, orows = canon(o_cols, o_rows)
        if sc != oc:
            fails.append((name, f"schema mismatch: spark={sc} oracle={oc}"))
            n_fail += 1
        elif len(sr) != len(orows):
            fails.append((name, f"row count: spark={len(sr)} oracle={len(orows)}"))
            n_fail += 1
        elif sr != orows:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(sr, orows))
                        if a != b)
            fails.append((name, f"value mismatch at sorted row {diff[0]}: "
                                f"spark={diff[1]} oracle={diff[2]}"))
            n_fail += 1
        else:
            n_pass += 1
    print(f"PASS {n_pass} / FAIL {n_fail} of {len(oracles)}")
    for name, why in fails:
        print(f"  FAIL {name}: {why}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

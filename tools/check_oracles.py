#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracles.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet result (written by graft.Verify)
plus <verify_out_dir>/oracle_sql.json, runs each oracle against the parquet
tables in <sf_dir> with DuckDB, and compares rows / schema (column names AND
arrow types) / values (columns sorted by name, rows sorted, floats rounded).

The driver's hash is TYPE-sensitive: a DuckDB HUGEINT (arrow decimal128(38,0))
next to a Spark BIGINT (arrow int64) is a FAIL even when the values are
identical — that is exactly how xa_q12_priority_split shipped red in r4 while
this tool (then fetchall-based, which collapses both to Python int) said PASS.
Types are therefore compared at the arrow level, with only these documented
normalizations (cases the driver demonstrably tolerates across 150 green
queries):
  - timestamp unit and timezone are dropped (Spark parquet is us/UTC, DuckDB
    TIMESTAMP is naive us; both render the same instant),
  - string/large_string are one type,
  - decimal precision is ignored but SCALE is kept (sum widening differs,
    scale never does),
  - list value-field nullability/names are ignored (recurse on value type).
Everything else — int width, int vs decimal, float32 vs float64 — must match
exactly.

Dev tool only — the Scala library never depends on this.
"""
import sys, os, json, glob, math, decimal
import duckdb
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_type(t):
    """Arrow type -> canonical string; see module docstring for the rules."""
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_decimal(t):
        return f"decimal(s={t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{canon_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{canon_type(t.key_type)},{canon_type(t.item_type)}>"
    return str(t)


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"  # NaN != NaN would flag agreeing results as diffs
        if math.isinf(v) or v == 0.0:
            return v
        # relative tolerance: round to 9 significant digits, not 6 decimal
        # places — absolute rounding is too strict for 1e9-scale sums and
        # too lax near zero
        return round(v, 8 - int(math.floor(math.log10(abs(v)))))
    if isinstance(v, decimal.Decimal):
        # types already matched (same scale) at this point; compare exactly
        return v
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    return v


def sort_key(t):
    # type-aware: numbers order numerically so a reported mismatch row index
    # pairs the same logical rows on both sides (str() would order "10"<"9")
    return tuple((x is None, isinstance(x, str),
                  float(x) if isinstance(x, (int, float, decimal.Decimal))
                  and not isinstance(x, bool) else 0, str(x)) for x in t)


def canon(tbl):
    cols = list(tbl.column_names)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    types = [canon_type(tbl.schema.field(i).type) for i in order]
    col_data = [tbl.column(i).to_pylist() for i in order]
    out = [tuple(norm_cell(col[j]) for col in col_data)
           for j in range(tbl.num_rows)]
    out.sort(key=sort_key)
    return [cols[i] for i in order], types, out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # optional trailing names restrict the run (lets big replays shard
    # across processes: one DuckDB connection each)
    only = set(sys.argv[3:])
    if only:
        # a typo'd shard filter must fail loudly, not silently under-cover
        # while the shard reports PASS n/n (ADVICE r9)
        missing = only - oracles.keys()
        if missing:
            sys.exit(f"FATAL: shard filter names not in oracle_sql.json: "
                     f"{sorted(missing)}")
        oracles = {k: v for k, v in oracles.items() if k in only}
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    fails = []
    import time
    for name in sorted(oracles):
        t0 = time.time()
        print(f"... {name}", file=sys.stderr, flush=True)
        res_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not res_glob:
            fails.append((name, "no spark result parquet"))
            n_fail += 1
            continue
        try:
            spark_tbl = con.sql(
                "SELECT * FROM read_parquet([" +
                ",".join(f"'{p}'" for p in res_glob) + "])").arrow()
            oracle_tbl = con.sql(oracles[name]).arrow()
        except Exception as e:
            fails.append((name, f"exec error: {e}"))
            n_fail += 1
            continue
        sc, st, sr = canon(spark_tbl)
        oc, ot, orows = canon(oracle_tbl)
        if sc != oc:
            fails.append((name, f"schema mismatch: spark={sc} oracle={oc}"))
            n_fail += 1
        elif st != ot:
            pairs = [f"{c}: spark={a} oracle={b}"
                     for c, a, b in zip(sc, st, ot) if a != b]
            fails.append((name, "TYPE mismatch (driver hash is "
                                "type-sensitive): " + "; ".join(pairs)))
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
        print(f"    {name} done in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
    print(f"PASS {n_pass} / FAIL {n_fail} of {len(oracles)}")
    for name, why in fails:
        print(f"  FAIL {name}: {why}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

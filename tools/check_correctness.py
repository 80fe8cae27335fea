#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sf_dir> <verify_out_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify),
runs the corresponding oracle SQL from oracle_sql.json in DuckDB against
the parquet tables in <sf_dir>, sorts columns by name and rows by all
columns, and compares values (exact for non-floats, 1e-9-relative for
floats). Prints one line per query + a summary.

Dev-tool only — not part of the Scala library.
"""
import json, math, os, sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir, name):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        return None
    files = [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")]
    if not files:
        return None
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files])


def norm_rows(cols_named):
    """cols_named: list of (name, values). Sort cols by name, rows by tuple."""
    cols_named = sorted(cols_named, key=lambda kv: kv[0])
    names = [k for k, _ in cols_named]
    rows = list(zip(*[v for _, v in cols_named])) if cols_named else []
    def key(row):
        return tuple((x is None, str(x)) for x in row)
    return names, sorted(rows, key=key)


def val_eq(a, b):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def main():
    sf_dir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(outdir)):
        if not os.path.isdir(os.path.join(outdir, name)):
            continue
        spark_tbl = load_spark(outdir, name)
        if spark_tbl is None:
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWSONLY {name}: rows={spark_tbl.num_rows} (no oracle)")
            n_skip += 1
            continue
        try:
            duck = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        s_names, s_rows = norm_rows(
            [(n, spark_tbl.column(n).to_pylist()) for n in spark_tbl.column_names])
        d_names, d_rows = norm_rows(
            [(n, duck.column(n).to_pylist()) for n in duck.column_names])
        if s_names != d_names:
            print(f"SCHEMA   {name}: spark={s_names} duck={d_names}")
            n_fail += 1
            continue
        # The driver's gate hash is TYPE-sensitive: a DuckDB HUGEINT /
        # decimal128 column with values identical to Spark's int64 still
        # fails it (round-6 text_pack). Flag any physical-type divergence
        # beyond the benign int<->float widths the value compare tolerates.
        type_bad = []
        for n in s_names:
            st = str(spark_tbl.schema.field(n).type)
            dt = str(duck.schema.field(n).type)
            if st != dt:
                numeric = {"int8", "int16", "int32", "int64",
                           "float", "double"}
                both_float = {st, dt} <= {"float", "double"}
                both_int = {st, dt} <= numeric - {"float", "double"}
                if not (both_float or both_int):
                    type_bad.append((n, st, dt))
        if type_bad:
            print(f"TYPES    {name}: {type_bad} (driver hash will fail)")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"ROWS     {name}: spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            if not all(val_eq(a, b) for a, b in zip(sr, dr)):
                bad = (i, sr, dr)
                break
        if bad:
            print(f"VALUES   {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS     {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

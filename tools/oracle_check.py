#!/usr/bin/env python3
"""Dev-only local mirror of the driver's DuckDB correctness gate.

Not part of the shipped library (the Scala engine never imports this).
Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/oracle_check.py <sfDir> <outDir>
Compares each <outDir>/<name> parquet dump against the oracle SQL from
<outDir>/oracle_sql.json executed in DuckDB over the sfDir tables, using the
FIXTURES.md §5 canonicalization (rows sorted, floats to 6 significant digits,
NULL as \\N, timestamps UTC).

Both sides go through PANDAS (parquet -> pd.DataFrame, duckdb -> .df()),
matching the driver's canonicalizer. This is deliberate: the driver sorts a
pandas frame, so dtype coercions (DuckDB HUGEINT -> object/float64) and
unsortable cells (list-typed columns crash pandas' lexsort) must be visible
here too — fetchall()'s plain-Python values hid exactly that failure class.
"""
import json, math, sys, glob, os
import duckdb
import numpy as np
import pandas as pd
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pyarrow.types as pt

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_val(v):
    # np.floating covers float32, which is NOT a Python-float subclass.
    if v is None or v is pd.NaT or \
            (isinstance(v, (float, np.floating)) and math.isnan(float(v))):
        # pandas stores SQL NULL as NaN in float columns; the driver's
        # renderer treats both as null.
        return "\\N"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if v == 0:
            return "0"
        return f"{v:.6g}"
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(canon_val(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canon_df(df):
    """Driver-shaped canonicalization: columns sorted by name, rows
    lexsorted by all columns via pandas (raises on unsortable cells —
    that IS the gate's behavior), values rendered per FIXTURES.md §5.

    Deliberately sorts by RAW values and compares rendered ones, exactly
    like the driver: two rows whose floats render equal but differ in
    low-order bits can sort into different orders across engines and fail
    the ordered compare. That is the gate's real behavior, so the mirror
    must not paper over it by sorting rendered tuples — instead the
    invariant is on the QUERIES: any float-emitting query applies
    Canon.sig6 (the shared 9-significant-digit grid) before output, which
    collapses both engines onto identical doubles and makes raw order =
    rendered order. main() prints a targeted hint when a FAIL is
    order-only, i.e. exactly this invariant was violated."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(list(df.columns))
    return [tuple(canon_val(v) for v in row)
            for row in df.itertuples(index=False, name=None)]


# q12/q52 moved INSIDE the hash gate in round 10: each query now computes
# its sketch estimate AND its exact twin in one aggregate and emits the
# tolerance verdict (within_tol booleans), which the oracle asserts — so
# the mirror hash-compares them like any other query and the old
# APPROX_CHECKS numeric pass is retired.
APPROX_CHECKS = {}


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        # date_as_object=False: DATE columns become datetime64 like
        # DuckDB's .df() output, so both sides render identically.
        spark_tbl = pq.read_table(files)
        # Advisory NaN scan at the ARROW level, where the validity bitmap
        # still distinguishes a genuine NaN value from SQL NULL. The pandas
        # path below (deliberately, for driver parity) collapses both to \N,
        # so a query regression that starts emitting NaN (0/0, inf-inf)
        # where the oracle has NULL would otherwise PASS silently. List
        # columns are flattened first — embedding-style array<float> outputs
        # are exactly where a zero-norm 0/0 would land.
        for col in spark_tbl.column_names:
            c = spark_tbl.column(col).combine_chunks()
            while pt.is_list(c.type) or pt.is_large_list(c.type) or \
                    pt.is_fixed_size_list(c.type):
                c = c.flatten()
            if pt.is_floating(c.type):
                n_nan = pc.sum(pc.is_nan(c)).as_py() or 0
                if n_nan:
                    print(f"WARN {name}: column {col} has {n_nan} NaN value(s) "
                          "(the gate renders NaN as NULL — likely a 0/0 or "
                          "inf-inf regression)")
        spark_df = spark_tbl.to_pandas(date_as_object=False)
        if name not in oracle:
            fn = APPROX_CHECKS.get(name)
            if fn is None:
                print(f"SKIP {name}: no oracle ({len(spark_df)} rows)")
                continue
            try:
                ok, msg = fn(con, spark_df)
            except Exception as e:
                ok, msg = False, repr(e)
            print(f"{'PASS-TOL' if ok else 'FAIL'} {name}: {msg}")
            if ok:
                n_pass += 1
            else:
                n_fail += 1
            continue
        try:
            spark_rows = canon_df(spark_df)
        except Exception as e:
            print(f"FAIL {name}: spark side not canonicalizable: {e!r}")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
            duck_rows = canon_df(duck_df)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e!r}")
            n_fail += 1
            continue
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"FAIL {name}: columns {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}")
            n_fail += 1
        elif spark_rows == duck_rows:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {len(spark_rows)} spark vs {len(duck_rows)} duck rows")
            duck_set, spark_set = set(duck_rows), set(spark_rows)
            only_s = [r for r in spark_rows if r not in duck_set][:3]
            only_d = [r for r in duck_rows if r not in spark_set][:3]
            print(f"  spark-only: {only_s}")
            print(f"  duck-only : {only_d}")
            if sorted(spark_rows) == sorted(duck_rows):
                print("  NOTE: same rendered multiset, different ROW ORDER — "
                      "raw float sort diverged across engines; apply "
                      "Canon.sig6 to the float columns BEFORE output "
                      "(see canon_df docstring)")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

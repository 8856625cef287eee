#!/usr/bin/env python3
"""Dev-only local mirror of the driver's DuckDB correctness gate.

Not part of the shipped library (the Scala engine never imports this).
Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/oracle_check.py <sfDir> <outDir>
Compares each <outDir>/<name> parquet dump against the oracle SQL from
<outDir>/oracle_sql.json executed in DuckDB over the sfDir tables, using the
FIXTURES.md §5 canonicalization (rows sorted, floats to 6 significant digits,
NULL as \\N, timestamps UTC).
"""
import json, math, sys, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_val(v):
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.6g}"
    if isinstance(v, list):
        return "[" + ",".join(canon_val(x) for x in v) + "]"
    return str(v)


def canon_rows(names, rows):
    out = []
    for r in rows:
        d = dict(zip(names, r))
        out.append(tuple(canon_val(d[k]) for k in sorted(d)))
    return sorted(out)


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
        tbl = pq.read_table(files[0]) if files else None
        if tbl is None:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        spark_rows = canon_rows(tbl.column_names,
                                [tuple(r.values()) for r in tbl.to_pylist()])
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(spark_rows)} rows)")
            continue
        try:
            res = con.execute(oracle[name])
            duck_names = [c[0] for c in res.description]
            duck_rows = canon_rows(duck_names, res.fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(tbl.column_names) != sorted(duck_names):
            print(f"FAIL {name}: columns {sorted(tbl.column_names)} vs {sorted(duck_names)}")
            n_fail += 1
        elif spark_rows == duck_rows:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {len(spark_rows)} spark vs {len(duck_rows)} duck rows")
            only_s = [r for r in spark_rows if r not in set(duck_rows)][:3]
            only_d = [r for r in duck_rows if r not in set(spark_rows)][:3]
            print(f"  spark-only: {only_s}")
            print(f"  duck-only : {only_d}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Cross-engine DTYPE audit for the oracle registry.

The round-5 gate failed two queries (l42_bpe_train, q62_profile) that PASSED
the local DuckDB-1.0.0 mirror: their oracles emitted bare integer `sum()`s,
which DuckDB types as HUGEINT and the python client hands to pandas as
float64 — int64-vs-float64 renders identically under this mirror's %.6g
formatter but differently under str()-style canonicalizers in other
driver environments. Rendering equality is therefore NOT enough; the two
engines must agree on the dtype KIND of every output column.

Usage: python3 tools/dtype_audit.py <sfDir> <outDir>   (after graft.Verify)
Flags every query whose Spark parquet dump and DuckDB oracle result differ
in pandas dtype kind (int vs float vs object vs datetime vs bool). Exits 1
on any mismatch so it can gate a round.
"""
import json, os, sys, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def kind(dtype):
    k = dtype.kind  # i/u int, f float, O object, M datetime, b bool
    return {"u": "i"}.get(k, k)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    bad = 0
    for name in sorted(oracle):
        d = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            continue
        spark_df = pq.read_table(files).to_pandas(date_as_object=False)
        duck_df = con.execute(oracle[name]).df()
        for col in sorted(set(spark_df.columns) & set(duck_df.columns)):
            ks, kd = kind(spark_df[col].dtype), kind(duck_df[col].dtype)
            # A duck float column that is ALL-NULL of a non-float spark col
            # is pandas NULL-as-NaN promotion, not an engine dtype clash.
            if ks != kd and not (kd == "f" and duck_df[col].isna().all()):
                # int-vs-float with spark ints promoted by nulls: same story.
                if ks == "f" and kd == "i" and spark_df[col].isna().any():
                    continue
                print(f"MISMATCH {name}.{col}: spark {spark_df[col].dtype} "
                      f"vs duck {duck_df[col].dtype}")
                bad += 1
    print(f"== {bad} dtype mismatch(es) ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

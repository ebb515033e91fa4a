#!/usr/bin/env python3
"""Dev tool: cross-check one query's Spark result against its DuckDB
oracle, the same compare the driver's correctness gate runs (sorted by
column name, row/schema/hash). Run graft.tools.OracleCheck first:

  sbt "Test/runMain graft.tools.OracleCheck <query> [sfDir] [outDir]"
  python3 tools/oracle_compare.py <query> [sfDir] [outDir]
"""
import sys, duckdb, glob

name = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/oraclecheck"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    if glob.glob(f"{sf}/{t}.parquet"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

sql = open(f"{out}/{name}.sql").read()
oracle = con.execute(sql).fetchdf()
spark = con.execute(
    f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()

oc = sorted(oracle.columns); sc = sorted(spark.columns)
if oc != sc:
    print(f"SCHEMA MISMATCH: oracle={oc} spark={sc}"); sys.exit(1)
oracle = oracle[oc].sort_values(oc, na_position="last").reset_index(drop=True)
spark = spark[oc].sort_values(oc, na_position="last").reset_index(drop=True)
if len(oracle) != len(spark):
    print(f"ROWS MISMATCH: oracle={len(oracle)} spark={len(spark)}"); sys.exit(1)
eq = oracle.compare(spark)
if not eq.empty:
    print("VALUE MISMATCH:"); print(eq.head(20)); sys.exit(1)
print(f"OK {name}: {len(oracle)} rows, {len(oc)} cols match")

#!/usr/bin/env python3
"""Oracle output-type sweep (round-9; extends the round-7 DESCRIBE audit).

For every oracle in <out>/oracle_sql.json, DESCRIBE the query in DuckDB
and flag output columns whose declared type is not a finite-width type a
Spark parquet dump can match bit-for-bit after pandas conversion:

  HUGEINT / UHUGEINT  -> fetchdf renders float64; a value-HASHING
                         checker sees 0.0 vs Spark's 0 (the q223_pack_shard
                         round-8 red row). Fix: CAST ... AS BIGINT.
  DECIMAL(...)        -> object/Decimal vs Spark double/long.
  UINTEGER / UBIGINT  -> pandas uint; driver hash may differ from int64.

Usage: python3 tools/type_sweep.py [verify_out_dir] [sf_dir]
Exit 1 if any oracle has a flagged column.  NOT part of the shipped
library (dev/CI hygiene, like check.py).
"""
import json, sys, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
BAD = re.compile(r"^(HUGEINT|UHUGEINT|DECIMAL|UINTEGER|UBIGINT|USMALLINT|UTINYINT)")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_flag = 0
    for name, sql in sorted(oracle.items()):
        try:
            rows = con.execute("DESCRIBE " + sql).fetchall()
        except Exception as e:
            print(f"ERROR {name}: describe failed: {e}")
            n_flag += 1
            continue
        bad = [(c, ty) for c, ty, *_ in rows if BAD.match(ty)]
        if bad:
            print(f"FLAG {name}: " + ", ".join(f"{c}:{ty}" for c, ty in bad))
            n_flag += 1
    print(f"== {len(oracle)} oracles, {n_flag} flagged ==")
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()

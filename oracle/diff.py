#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage:
  python3 oracle/diff.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/ (Spark-written parquet, one dir per query,
produced by `sbt "runMain graft.Verify <sfDir> <verifyOutDir>"`) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB against
views over the same sf parquet tables, and compares: column names
(sorted), row counts, and the full sorted-row multiset.

Mimics the driver: columns sorted by name before value comparison, so
Spark/oracle column NAMES must match exactly (alias everything).

This tool is local-only dev tooling (driver-side python is allowed for
the oracle; nothing here ships in the library).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "supplier", "customer", "part",
          "orders", "lineitem", "documents", "embeddings", "events"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # keep full precision; queries are responsible for rounding
        return repr(v)
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, osql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            sdf = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM spark_rel").df()
            spark_dtypes = {c: str(sdf[c].dtype) for c in spark_cols}
            spark_rows = sorted(
                tuple(norm(v) for v in row)
                for row in con.sql(
                    f"SELECT {', '.join(spark_cols)} FROM spark_rel").fetchall())
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            orel = con.sql(osql)
            ocols = sorted(orel.columns)
            odf = con.sql(f"SELECT {', '.join(ocols)} FROM orel").df()
            odtypes = {c: str(odf[c].dtype) for c in ocols}
            orows = sorted(
                tuple(norm(v) for v in row)
                for row in con.sql(
                    f"SELECT {', '.join(ocols)} FROM orel").fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {e}")
            n_fail += 1
            continue

        # Dtype-strict: the driver hashes through pandas, where a
        # DuckDB HUGEINT (e.g. an uncast windowed SUM(BIGINT)) lands
        # as float64 against Spark's int64 and hash-mismatches even
        # with identical values. Both sides here flow through DuckDB
        # .df(), so a dtype diff is a genuine engine-dtype divergence.
        dtype_bad = [c for c in ocols
                     if spark_dtypes.get(c) != odtypes.get(c)]
        if spark_cols == ocols and dtype_bad:
            print(f"FAIL {name}: dtype mismatch on "
                  + ", ".join(f"{c} (spark {spark_dtypes[c]} != "
                              f"oracle {odtypes[c]})" for c in dtype_bad))
            n_fail += 1
            continue

        if spark_cols != ocols:
            print(f"FAIL {name}: columns {spark_cols} != {ocols}")
            n_fail += 1
        elif len(spark_rows) != len(orows):
            print(f"FAIL {name}: rows {len(spark_rows)} != {len(orows)}")
            n_fail += 1
        elif spark_rows != orows:
            bad = next(i for i, (a, b) in enumerate(zip(spark_rows, orows))
                       if a != b)
            print(f"FAIL {name}: value mismatch at sorted row {bad}:")
            print(f"  spark : {spark_rows[bad]}")
            print(f"  oracle: {orows[bad]}")
            print(f"  (cols sorted: {ocols})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

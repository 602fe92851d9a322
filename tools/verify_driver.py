#!/usr/bin/env python
"""Fresh-process replica of the driver's correctness gate (the /verify
skill's surface 1, checked in for reproducibility): run entry(spark),
then every queries()[name] against its oracle_sql()[name] via DuckDB at
the given sf dir (default sf0.01, the driver's gate; pass sf0.1 for the
10x robustness sweep).

    python tools/verify_driver.py [/root/testdata/sf0.01]
"""
import os
import sys
import time

# abspath first: a bare/relative invocation from inside tools/ made the
# rsplit yield '' and the imports silently fell back to cwd-relative
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, f"{REPO}/tests")


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e
    import oracle_utils as ou

    rows = e.entry(spark).collect()
    print(f"entry: {len(rows)} rows", flush=True)

    con = ou.duckdb_con(sf_dir)
    osql = e.oracle_sql()
    fails = []
    for name, fn in e.queries().items():
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
            if name in osql:
                ou.compare_frames(spdf, con.execute(osql[name]).df(), name)
                status = "ok"
            else:
                status = f"rows-only({len(spdf)})"
        except Exception as ex:
            status = f"FAIL: {str(ex)[:200]}"
            fails.append(name)
        print(f"{name}: {status} [{time.time() - t0:.1f}s]", flush=True)
    print("FAILURES:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Rebucket lifecycle measurement (round-10, verdict #3's done-criteria):
build the 5M-row incompressible chunk table (the round-9 point-lookup
scale corpus: sf0.1 documents x 1024 chunks, md5-derived text), create it
at 512 buckets, time rebucket 512 -> 64 and 64 -> 512, verify row counts
and a point lookup after each migration, and print one JSON line.

    python tools/measure_rebucket.py [sf_dir]
"""
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import functions as F

    from pubmed_central_semantic_search_spark import registry
    from pubmed_central_semantic_search_spark.session import get_spark
    from pubmed_central_semantic_search_spark.sources.catalog import (
        read_upsert_table,
        rebucket,
        upsert_parquet,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="rebucket-measure")
    docs = registry.load(spark, sf_dir, "documents").select("doc_id", "text")
    ck = F.col("doc_id") * 1024 + F.col("c")
    chunks = docs.withColumn(
        "c", F.explode(F.sequence(F.lit(0), F.lit(1023)))
    ).select(
        ck.alias("chunk_key"),
        "doc_id",
        F.concat(
            *[
                F.md5(F.concat((ck + F.lit(s)).cast("string"), F.lit("x")))
                for s in range(4)
            ]
        ).alias("text"),
    )
    base = tempfile.mkdtemp(prefix="pmc_rebucket_")
    path = os.path.join(base, "chunks")
    out: dict = {"sf": sf_dir}
    try:
        t0 = time.perf_counter()
        upsert_parquet(
            spark, chunks, path, key_cols=["chunk_key"],
            replace_group_col="doc_id", n_buckets=512,
        )
        out["build_512_sec"] = round(time.perf_counter() - t0, 2)
        out["rows"] = read_upsert_table(spark, path).count()
        sz = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(path)
            for f in fs if f.endswith(".parquet")
        )
        out["table_mb"] = round(sz / 1e6, 1)

        def probe():
            t = time.perf_counter()
            n = read_upsert_table(
                spark, path, key_equals={"doc_id": 42, "chunk_key": 43008}
            ).count()
            return round(time.perf_counter() - t, 2), n

        # 512->64 and 64->512 divide, so both run through each path:
        # the full staged rewrite (one shuffled job) and the incremental
        # bucket-group-at-a-time migration (shuffle-free per group, the
        # 100 TB shape — locally it pays one small job PER GROUP, so the
        # comparison shows the local job-latency cost the resumability
        # buys; on a cluster the full rewrite is one unplannably-large
        # job while the incremental stream is restartable)
        plans = (
            (64, False, 1, "full"),
            (512, False, 1, "full"),
            (64, True, 1, "inc_b1"),
            (512, True, 64, "inc_b64"),
            (64, True, 8, "inc_b8"),
        )
        for new_n, inc, batch, tag in plans:
            t0 = time.perf_counter()
            stats = rebucket(
                spark, path, new_n, incremental=inc, group_batch=batch
            )
            sec = round(time.perf_counter() - t0, 2)
            p_sec, p_n = probe()
            out[f"rebucket_to_{new_n}_{tag}"] = {
                "sec": sec,
                "rows": stats["rows"],
                "probe_sec": p_sec,
                "probe_rows": p_n,
            }
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

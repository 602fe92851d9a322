#!/usr/bin/env python
"""Literal-probe vs table-probe bloom anti-join at real history scale
(round-10): the literal tier ships the whole filter as ONE plan
constant — fine while the filter is small, but a 5M-key history at 10
bits/key is a ~6 MB array literal that every executor task deserializes
with its task binary, and constant-folding k probes against it is
plan-side work that grows with m. The table tier keeps the words as a
(word_idx, word) frame and probes via a broadcast equi-join — plan size
constant, filter size bounded only by n_words rows.

Measures both tiers over the 5M-row chunk-key history (the rebucket
corpus) with a 100k-row probe batch, at two geometries, plus the shared
build cost. Prints one JSON line.

    python tools/measure_bloom_probe.py [sf_dir]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import functions as F

    from pubmed_central_semantic_search_spark import registry
    from pubmed_central_semantic_search_spark.operators.sketch import (
        bloom_anti_join,
        bloom_anti_join_table,
        bloom_build,
        bloom_literal,
    )
    from pubmed_central_semantic_search_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="bloom-probe-measure")
    docs = registry.load(spark, sf_dir, "documents").select("doc_id")
    hist = docs.withColumn(
        "c", F.explode(F.sequence(F.lit(0), F.lit(1023)))
    ).select(
        (F.col("doc_id") * 1024 + F.col("c")).cast("string").alias("k")
    )
    # probe batch: 50% known keys, 50% novel
    batch = docs.limit(50).withColumn(
        "c", F.explode(F.sequence(F.lit(0), F.lit(1023)))
    ).select(
        F.when(
            F.col("c") % 2 == 0,
            (F.col("doc_id") * 1024 + F.col("c")).cast("string"),
        )
        .otherwise(
            F.concat(F.lit("novel-"), (F.col("doc_id") * 1024 + F.col("c")).cast("string"))
        )
        .alias("k")
    )
    hist = hist.persist()
    batch = batch.persist()
    out: dict = {
        "sf": sf_dir,
        "history_keys": hist.count(),
        "batch_keys": batch.count(),
    }
    # literal timed only where its plan stays sane: a first attempt at
    # n_words=2^20 made Spark broadcast a 112 MiB task binary (each of
    # the k probes embeds its OWN copy of the 1M-element array literal)
    # and ran for minutes — THAT is the measured cliff the table tier
    # exists for; recorded as a finding, not waited out.
    out["literal_cliff"] = (
        "n_words=2^20: 56-112 MiB task binaries (k copies of the array "
        "literal in the plan), minutes per action — not timed"
    )
    for n_words, run_literal in ((1 << 14, True), (1 << 17, True), (1 << 20, False)):
        tag = f"nw{n_words}"
        t0 = time.perf_counter()
        # persist the built words (round-11 review pass find): the table
        # frame is LAZY, so an unpersisted probe re-ran the whole 5M-key
        # build inside the timed probe — while the literal arm's probe
        # excluded its build (the words ride pre-densified in the plan).
        # The r10 numbers therefore UNDERSTATED the table tier's win; in
        # production the probe reads the durable words table, which the
        # persist stands in for.
        table = bloom_build(hist, "k", n_words=n_words, k=4).persist()
        table.count()
        build_sec = round(time.perf_counter() - t0, 2)
        rec = {"build_sec": build_sec}
        n_lit = None
        if run_literal:
            t0 = time.perf_counter()
            words = bloom_literal(table, n_words)
            rec["densify_sec"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            n_lit = bloom_anti_join(
                batch, hist, "k", n_words=n_words, k=4, words=words
            ).count()
            rec["literal_probe_sec"] = round(time.perf_counter() - t0, 2)
            rec["new_rows_literal"] = int(n_lit)
        t0 = time.perf_counter()
        n_tab = bloom_anti_join_table(
            batch, table, hist, "k", n_words=n_words, k=4
        ).count()
        rec["table_probe_sec"] = round(time.perf_counter() - t0, 2)
        rec["new_rows_table"] = int(n_tab)
        if n_lit is not None:
            assert n_lit == n_tab, (n_lit, n_tab)
        out[tag] = rec
        table.unpersist()
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

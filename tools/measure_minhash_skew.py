#!/usr/bin/env python
"""Hot-band skew measurement for MinHash-LSH near-dup (round-10,
verdict #5): boilerplate-heavy corpora concentrate band keys — this
measures the candidate-join stage on an 8x corpus with and without a
planted hot template (one template at 20% frequency) and with/without
the ``max_band_freq`` stop-band cap, and prints one JSON line.

    python tools/measure_minhash_skew.py [sf_dir]

Corpora (both 40,000 docs built from the sf0.1 documents table):
- uniform8x: 8 salted copies per doc, each textually distinct — the
  round-6 scaling corpus shape (copies of one doc are true near-dups of
  each other, no single hot band).
- skew8x: same, except every doc_id % 5 == 0 copy's text is REPLACED by
  one shared ~60-token template plus a tiny unique tail — 8,000 docs
  (20%) whose shingle sets are ~identical, so their MinHash signatures
  (min over mostly-shared shingles) collapse into a handful of band
  buckets.
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
    from pubmed_central_semantic_search_spark.operators.dedup import (
        minhash_band_keys,
        minhash_candidate_pairs,
    )
    from pubmed_central_semantic_search_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="minhash-skew-measure")
    docs = registry.load(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.withColumn("c", F.explode(F.sequence(F.lit(0), F.lit(7))))
    base8 = copies.select(
        (F.col("doc_id") * 8 + F.col("c")).alias("doc_id"),
        F.concat(
            "text", F.lit(" salt"), F.col("c").cast("string"),
            F.lit("x"), F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    template = " ".join(
        f"boiler{i % 7} plate{i % 5} footer{i % 3}" for i in range(20)
    )
    skew8 = copies.select(
        (F.col("doc_id") * 8 + F.col("c")).alias("doc_id"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(template + " tail "),
                (F.col("doc_id") * 8 + F.col("c")).cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                "text", F.lit(" salt"), F.col("c").cast("string"),
                F.lit("x"), F.col("doc_id").cast("string"),
            )
        )
        .alias("text"),
    )

    out: dict = {"sf": sf_dir, "n_docs": base8.count()}
    # run plans: the UNCAPPED skewed join at full 8x is the pathology
    # itself (the hot bucket's self-join emits ~members^2/2 rows — it
    # blew a 10-minute wall on first measurement), so at full scale the
    # uncapped skew case reports the DETERMINISTIC bucket-product count
    # (the join's exact pre-distinct output size) instead of wall-clock;
    # the measured uncapped-vs-capped wall ratio comes from a 10x-smaller
    # planted corpus where the uncapped join still finishes.
    runs = {
        "uniform8x": (base8, [("nocap", None), ("cap64", 64)]),
        "skew8x": (skew8, [("cap64", 64)]),
        "skew8x_small": (
            skew8.filter(F.col("doc_id") % 10 == 0),
            [("nocap", None), ("cap64", 64)],
        ),
    }
    for name, (corpus, caps) in runs.items():
        # band-bucket profile: the skew evidence independent of wall
        bk = minhash_band_keys(corpus, "doc_id", "text", 8, 4, 3)
        prof = (
            bk.groupBy("band", "band_key").count()
            .agg(
                F.max("count").alias("max_bucket"),
                F.sum(F.col("count") * (F.col("count") - 1) / 2).alias(
                    "pair_products"
                ),
            )
            .collect()[0]
        )
        out[name] = {
            "n_docs": corpus.count(),
            "max_bucket": int(prof["max_bucket"]),
            "bucket_pair_products": int(prof["pair_products"]),
        }
        for cap_name, cap in caps:
            t0 = time.perf_counter()
            n_pairs = minhash_candidate_pairs(
                corpus, "doc_id", "text", max_band_freq=cap
            ).count()
            out[name][cap_name] = {
                "sec": round(time.perf_counter() - t0, 2),
                "pairs": int(n_pairs),
            }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

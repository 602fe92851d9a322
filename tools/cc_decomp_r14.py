#!/usr/bin/env python
"""Round-14 decomposition of the q53 / CC family (guide §1).

Times each internal stage of q53_dup_clusters and x_lexical_cc, and probes
connected_components at different check_every batching depths. Prints one
JSON line at the end.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from pyspark.sql import functions as F

    from pubmed_central_semantic_search_spark.session import get_spark
    from pubmed_central_semantic_search_spark.queries.dedup_pack import (
        _SEM_K,
        _chained_text_corpus,
        _planted_vec_corpus,
    )
    from pubmed_central_semantic_search_spark.operators.clustering import (
        seed_centroids,
        nearest_centroid,
    )
    from pubmed_central_semantic_search_spark.operators.dedup import (
        connected_components,
        embedding_near_dup,
        ngram_jaccard_pairs,
    )
    from pubmed_central_semantic_search_spark.session import release_cached_deps

    spark = get_spark(app_name="pmc-cc-decomp")
    out: dict[str, float] = {}

    def probe(name, fn, n=3):
        fn()
        best = None
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        spark.catalog.clearCache()
        out[name] = round(best, 4)
        print(f"# {name}: {best:.3f}s", file=sys.stderr)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # --- q53 internals --------------------------------------------------
    probe("q53_vec_corpus", lambda: noop(_planted_vec_corpus(spark, sf)))
    probe("q53_seed_centroids", lambda: seed_centroids(
        _planted_vec_corpus(spark, sf), _SEM_K, id_col="vec_id", vec_col="emb"))

    vec = _planted_vec_corpus(spark, sf)
    cents = seed_centroids(vec, _SEM_K, id_col="vec_id", vec_col="emb")

    def assigned_df():
        return _planted_vec_corpus(spark, sf).withColumn(
            "cluster_id", nearest_centroid("emb", cents)
        )

    probe("q53_assign_scan", lambda: noop(assigned_df()))

    def pairs_only():
        a = assigned_df().persist()
        a.count()
        p = embedding_near_dup(
            a, "vec_id", "emb", block_col="cluster_id", min_cosine=0.99
        ).select("id_a", "id_b")
        noop(p)
        a.unpersist()

    probe("q53_pairs_after_persist", pairs_only)

    def cc_only(check_every):
        a = assigned_df().persist()
        p = embedding_near_dup(
            a, "vec_id", "emb", block_col="cluster_id", min_cosine=0.99
        ).select("id_a", "id_b")
        t0 = time.perf_counter()
        labels = connected_components(p, check_every=check_every)
        n = labels.count()
        dt = time.perf_counter() - t0
        a.unpersist()
        return dt, n

    for ce in (1, 2, 3, 4):
        best = None
        rows = None
        cc_only(ce)
        for _ in range(3):
            spark.catalog.clearCache()
            dt, rows = cc_only(ce)
            best = dt if best is None or dt < best else best
        out[f"q53_cc_check_every_{ce}"] = round(best, 4)
        print(f"# q53_cc_check_every_{ce}: {best:.3f}s ({rows} label rows)",
              file=sys.stderr)

    # --- x_lexical_cc internals -----------------------------------------
    probe("lex_corpus", lambda: noop(_chained_text_corpus(spark, sf)))

    def lex_pairs():
        corpus = _chained_text_corpus(spark, sf)
        p = ngram_jaccard_pairs(corpus, "doc_id", "text", shingle_n=3,
                                min_jaccard=0.55)
        noop(p)
        release_cached_deps(p)

    probe("lex_pairs_full", lex_pairs)

    def lex_cc(check_every):
        corpus = _chained_text_corpus(spark, sf)
        p = ngram_jaccard_pairs(corpus, "doc_id", "text", shingle_n=3,
                                min_jaccard=0.55)
        t0 = time.perf_counter()
        labels = connected_components(p, check_every=check_every)
        labels.count()
        dt = time.perf_counter() - t0
        release_cached_deps(p)
        return dt

    for ce in (2, 4):
        lex_cc(ce)
        best = None
        for _ in range(3):
            spark.catalog.clearCache()
            dt = lex_cc(ce)
            best = dt if best is None or dt < best else best
        out[f"lex_cc_check_every_{ce}"] = round(best, 4)
        print(f"# lex_cc_check_every_{ce}: {best:.3f}s", file=sys.stderr)

    print(json.dumps(out, separators=(",", ":")))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

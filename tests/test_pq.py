"""Product-quantization tier (operators/pq.py): determinism, dense
codebooks under empty clusters, narrow encode plan, ADC+re-rank recall
contract vs brute force on the isotropic fixture corpus (the hardest
geometry for any ANN — real embedding corpora cluster and do better)."""

import math

from pyspark.sql import functions as F

from pubmed_central_semantic_search_spark.operators.ann import brute_force_topk
from pubmed_central_semantic_search_spark.operators.pq import (
    pq_adc_score,
    pq_encode,
    pq_topk,
    train_pq,
)

M, KSUB, DIM = 8, 16, 64


def _books(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb, train_pq(emb, m=M, ksub=KSUB, dim=DIM, n_iter=2)


def test_train_is_deterministic(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = train_pq(emb, m=M, ksub=KSUB, dim=DIM, n_iter=2)
    b = train_pq(emb, m=M, ksub=KSUB, dim=DIM, n_iter=2)
    assert a == b
    assert len(a) == M and all(len(book) == KSUB for book in a)
    assert all(len(c) == DIM // M for book in a for c in book)


def test_codes_shape_and_range(spark, sf_dir):
    emb, books = _books(spark, sf_dir)
    rows = emb.select(pq_encode("embedding", books).alias("codes")).collect()
    assert all(len(r["codes"]) == M for r in rows)
    assert all(0 <= c < KSUB for r in rows for c in r["codes"])


def test_encode_is_narrow(spark, sf_dir):
    emb, books = _books(spark, sf_dir)
    plan = (
        emb.select("vec_id", pq_encode("embedding", books).alias("codes"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "HashAggregate" not in plan, plan


def test_empty_codes_keep_previous_centroid(spark):
    """All-identical vectors: every row lands on one code, the other codes
    lose all members — the codebook must stay DENSE (ksub entries), with
    losers keeping their seed centroids."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = train_pq(df, m=2, ksub=4, dim=4, n_iter=2)
    assert all(len(book) == 4 for book in books)
    # the winning code converged to the (only) mean
    assert books[0][0] == [1.0, 2.0] and books[1][0] == [3.0, 4.0]


def test_adc_score_correlates_and_rerank_recall(spark, sf_dir):
    emb, books = _books(spark, sf_dir)
    queries = [
        [round(math.sin(0.7 * i + 0.3 + 0.9 * qid), 6) for i in range(DIM)]
        for qid in range(8)
    ]
    qdf = spark.createDataFrame(
        list(enumerate(queries)), "query_id int, qvec array<double>"
    )
    exact = {}
    for r in brute_force_topk(emb, qdf, 10).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(rerank: int) -> float:
        hits = tot = 0
        for qid, q in enumerate(queries):
            got = {
                r["vec_id"]
                for r in pq_topk(emb, q, books, k=10, rerank=rerank).collect()
            }
            hits += len(got & exact[qid])
            tot += len(exact[qid])
        return hits / tot

    r100 = recall(100)
    assert r100 >= 0.85, f"PQ recall@10 rerank=100 = {r100}"
    # widening the candidate set can only help (exact re-rank is monotone)
    assert recall(200) >= r100


def test_adc_is_pure_projection_no_join(spark, sf_dir):
    emb, books = _books(spark, sf_dir)
    q = [round(math.sin(0.7 * i + 0.3), 6) for i in range(DIM)]
    codes = emb.select("vec_id", pq_encode("embedding", books).alias("codes"))
    scored = codes.select("vec_id", pq_adc_score("codes", q, books).alias("s"))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan, plan


def test_ivfpq_near_neighbor_recall_and_pruning(spark, sf_dir, tmp_path):
    """IVF-PQ composition: planted near-duplicate queries must surface
    their twin as top-1 for >= 0.9 of queries with nprobe=2 of 8 lists;
    and when the code table is written partitionBy(cluster_id), the probe
    becomes partition pruning (PartitionFilters in the scan)."""
    from pyspark.sql import functions as SF

    from pubmed_central_semantic_search_spark.operators.clustering import (
        lloyd_kmeans,
    )
    from pubmed_central_semantic_search_spark.operators.pq import (
        ivfpq_topk,
        pq_encode,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    _, cents = lloyd_kmeans(emb, k=8, n_iter=2, dim=DIM)
    books = train_pq(emb, m=M, ksub=KSUB, dim=DIM, n_iter=2)

    qrows = (
        emb.filter(SF.col("vec_id") < 30)
        .select(
            "vec_id",
            SF.transform(
                SF.col("embedding").cast("array<double>"),
                lambda x, i: SF.when(i == 0, x + 0.05).otherwise(x),
            ).alias("qvec"),
        )
        .collect()
    )
    hits = 0
    for r in qrows:
        got = ivfpq_topk(
            emb, list(r["qvec"]), cents, books, k=1, nprobe=2, rerank=50
        ).collect()
        hits += bool(got and got[0]["vec_id"] == r["vec_id"])
    assert hits / len(qrows) >= 0.9, f"IVF-PQ twin recall {hits / len(qrows)}"

    # storage-layout proof: partitioned code table prunes to probed lists
    from pubmed_central_semantic_search_spark.operators.clustering import (
        nearest_centroid,
    )

    path = str(tmp_path / "codes")
    emb.withColumn("cluster_id", nearest_centroid("embedding", cents)).select(
        "vec_id", "cluster_id", pq_encode("embedding", books).alias("codes")
    ).write.partitionBy("cluster_id").parquet(path)
    probed_two = [cents[0][0], cents[1][0]]
    scan = spark.read.parquet(path).filter(SF.col("cluster_id").isin(probed_two))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan, plan
    emb.unpersist()


def test_ragged_codebooks_rejected(spark):
    from pubmed_central_semantic_search_spark.operators.pq import pq_encode

    import pytest as _pt
    with _pt.raises(ValueError, match="ragged"):
        pq_encode("v", [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0]]])  # unequal ksub
    with _pt.raises(ValueError, match="ragged"):
        pq_encode("v", [[[0.0, 0.0], [1.0]]])  # unequal dsub


def test_q47_pq_duckdb_parity_demoted(spark, sf_dir):
    """The DEMOTED q47 'pq' arm (oracle-tower amortization policy, round
    8; driver-green r3-r7): PQ encode argmin + ADC lookup scoring against
    deterministic codebook/LUT literals, previously replayed inside q47's
    driver oracle every bench round, now runs HERE over the SAME CTE text
    (q47_pq_parity_sql() — the template the registry oracle carried) on
    the real embeddings table. Bench: x_pq_adc."""
    import sys as _sys

    from pubmed_central_semantic_search_spark.queries.similarity import (
        pq_adc_report,
        q47_pq_parity_sql,
    )

    _sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from oracle_utils import compare_frames, duckdb_con

    got = pq_adc_report(spark, sf_dir).toPandas()
    want = duckdb_con(sf_dir).execute(q47_pq_parity_sql()).df()
    compare_frames(got, want, "q47-pq-demoted")

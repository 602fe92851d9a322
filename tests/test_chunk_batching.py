"""Semantic chunking (operators/chunking.py semantic_chunk_ids) and
length-bucketed inference batching (operators/curation.py
length_bucketed_batches): hand-computed segmentations and batch layouts.
"""

from pubmed_central_semantic_search_spark.operators.chunking import (
    semantic_chunk_ids,
)
from pubmed_central_semantic_search_spark.operators.curation import (
    length_bucketed_batches,
)


def test_semantic_chunk_boundaries_hand_computed(spark):
    rows = [
        # doc A: two topically-coherent runs of two paragraphs each
        ("A", 0, [1.0, 0.0]),
        ("A", 1, [0.99, 0.1]),   # cos ≈ 0.995 → same segment
        ("A", 2, [0.0, 1.0]),    # cos ≈ 0.1 → cut
        ("A", 3, [0.1, 0.99]),   # cos ≈ 0.995 → same segment
        # doc B: a single paragraph
        ("B", 0, [0.5, 0.5]),
    ]
    df = spark.createDataFrame(
        rows, "article_id string, paragraph_id int, embedding array<double>"
    )
    got = {
        (r["article_id"], r["paragraph_id"]): (r["segment_id"], r["cos_prev"])
        for r in semantic_chunk_ids(df, threshold=0.5).collect()
    }
    assert got[("A", 0)][0] == 0 and got[("A", 0)][1] is None
    assert got[("A", 1)][0] == 0 and got[("A", 1)][1] > 0.9
    assert got[("A", 2)][0] == 1 and got[("A", 2)][1] < 0.5
    assert got[("A", 3)][0] == 1
    assert got[("B", 0)] == (0, None)


def test_semantic_chunk_one_shuffle(spark):
    rows = [("A", i, [float(i), 1.0]) for i in range(4)]
    df = spark.createDataFrame(
        rows, "article_id string, paragraph_id int, embedding array<double>"
    )
    plan = (
        semantic_chunk_ids(df)._jdf.queryExecution().executedPlan().toString()
    )
    # the running-sum window must reuse the lag window's exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_length_bucketed_batches_hand_computed(spark):
    rows = [("s", i, i + 1) for i in range(8)]  # n_tokens 1..8
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["len_bucket"], r["infer_batch"])
        for r in length_bucketed_batches(df, batch_size=1).collect()
    }
    # ntile(4) over 8 rows ordered by length → 2 per bucket; batch_size=1
    # → batch ids 0, 1 inside each bucket
    assert got == {
        0: (1, 0), 1: (1, 1),
        2: (2, 0), 3: (2, 1),
        4: (3, 0), 5: (3, 1),
        6: (4, 0), 7: (4, 1),
    }


def test_length_buckets_minimize_padding_spread(spark):
    """Docs inside one batch must span a narrower length range than the
    group as a whole (the whole point of the layout)."""
    rows = [("s", i, t) for i, t in enumerate([1, 2, 3, 4, 100, 110, 120, 130])]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = length_bucketed_batches(df, n_buckets=2, batch_size=4).collect()
    by_batch: dict = {}
    for r in out:
        by_batch.setdefault((r["len_bucket"], r["infer_batch"]), []).append(
            r["n_tokens"]
        )
    for lens in by_batch.values():
        assert max(lens) - min(lens) <= 30  # never mixes the 1-4 and 100+ tiers

"""In-flight pipeline metrics via ``DataFrame.observe`` (EXT — the
operational side of the curation pipeline).

A 100 TB gate that reports "how many rows did I drop?" must not pay a
second corpus pass for the answer: ``df.filter(cond).count()`` plus the
real consumer re-scans everything. Spark's Observation API attaches
AGGREGATE METRICS to a point in the plan — they are computed by the SAME
job that materializes the frame (zero extra scans, zero extra shuffles)
and surface on the driver after any action.

Reference scope: the reference has no pipeline telemetry at all (its
ingest is a tqdm loop, ``qdrant.py:149-175``); this is part of the
training-data-pipeline extension pack — every serious curation run
reports per-gate pass rates, and recomputing them as separate counts is
the first thing that falls over at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_gate(
    df: DataFrame,
    cond: Column,
    name: str = "gate",
) -> tuple[DataFrame, Observation]:
    """Filter ``df`` by ``cond`` and attach pass/drop counters that ride
    the consumer's OWN job.

    Returns ``(filtered_df, observation)``. After the caller runs ANY
    action on a frame derived from ``filtered_df``, ``observation.get``
    yields ``{'n_in', 'n_pass', 'n_drop', 'n_null_cond'}`` — computed
    map-side inside that action's scan, never by a second pass.

    Semantics: rows where ``cond`` is NULL are DROPPED (standard filter
    semantics) but counted separately (``n_null_cond``) — a gate whose
    condition went NULL on half the corpus (a missing feature column)
    looks identical to an aggressive gate in ``n_drop`` alone, and the
    split is exactly what the operator exists to surface.

    Caveats (the API's, documented not hidden): an Observation is
    single-use — one (frame, action) pair; re-invoking the gate builds a
    fresh one. ``observation.get`` BLOCKS until an action has run. For
    STREAMING frames use ``df.observe(name, ...)`` with a listener
    instead — Observation.get's blocking contract doesn't fit
    micro-batches."""
    if df.isStreaming:
        raise ValueError(
            "observed_gate: batch frames only — for streams attach "
            "df.observe(name, ...) and read metrics from a "
            "StreamingQueryListener (Observation.get blocks forever "
            "on a micro-batch frame)"
        )
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_in"),
        F.sum(cond.cast("long")).alias("n_pass_raw"),
        F.sum(cond.isNull().cast("long")).alias("n_null_cond"),
    )
    return observed.filter(cond), obs


def gate_metrics(obs: Observation) -> dict:
    """The observed counters as a plain dict with the derived fields:
    ``n_pass`` (null-safe), ``n_drop`` = n_in − n_pass, and
    ``n_null_cond``. Blocks until the gated frame's action has run."""
    got = obs.get
    n_in = int(got["n_in"] or 0)
    n_pass = int(got["n_pass_raw"] or 0)
    return {
        "n_in": n_in,
        "n_pass": n_pass,
        "n_drop": n_in - n_pass,
        "n_null_cond": int(got["n_null_cond"] or 0),
    }

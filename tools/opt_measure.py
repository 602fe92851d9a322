#!/usr/bin/env python
"""Round-13 optimization measurement harness (guide §1).

Times selected queries (registry + bench extras) with the SAME methodology
as bench.py (warm pass, then min-of-N timed ``count()`` passes with the
data cache cleared between passes), in ONE session, and optionally dumps
``explain("formatted")`` for each to a directory.

    python tools/opt_measure.py [--queries q21,q16] [--samples 3] \
        [--explain plans/r13 --suffix _before] [--sf /root/testdata/sf0.1]

Prints one JSON line {name: {"min": s, "samples": [...]}} at the end.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="", help="comma-separated names; default all")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--explain", default="", help="dir to write explain files")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-extras", action="store_true")
    ap.add_argument(
        "--conf", action="append", default=[],
        help="extra spark conf k=v (repeatable), for config A/B runs",
    )
    args = ap.parse_args()

    from pubmed_central_semantic_search_spark import registry
    from pubmed_central_semantic_search_spark.session import get_spark

    runnable = {name: qd.spark for name, qd in registry.REGISTRY.items()}
    if not args.no_extras:
        from pubmed_central_semantic_search_spark.queries.dim768 import BENCH_EXTRAS
        from pubmed_central_semantic_search_spark.queries.write_path import (
            WRITE_BENCH_EXTRAS,
        )

        runnable.update(BENCH_EXTRAS)
        runnable.update(WRITE_BENCH_EXTRAS)

    if args.queries:
        want = args.queries.split(",")
        missing = [w for w in want if w not in runnable]
        if missing:
            print(f"unknown queries: {missing}", file=sys.stderr)
            return 2
        runnable = {w: runnable[w] for w in want}

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark(app_name="pmc-opt-measure", extra_conf=extra)
    names = sorted(runnable)
    # Warm JVM/parquet footers once, same as bench.py.
    runnable[names[0]](spark, args.sf).count()

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        if args.explain:
            import contextlib
            import io

            df = runnable[name](spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            spark.catalog.clearCache()
        # warm pass for this plan (codegen/JIT), then timed passes
        runnable[name](spark, args.sf).count()
        samples = []
        for _ in range(args.samples):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = runnable[name](spark, args.sf).count()
            samples.append(round(time.perf_counter() - t0, 4))
        spark.catalog.clearCache()
        out[name] = {"min": min(samples), "samples": samples, "rows": n}
        print(f"# {name}: {min(samples):.3f}s {samples} ({n} rows)", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps(out, separators=(",", ":")))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Z-order layout: Morton-code correctness plus the actual pruning
benefit — a z-clustered write must give tight per-file min-max boxes on
EVERY interleaved dimension, where a single-column sort gives tight
stats on one dimension only."""

import glob

import pyarrow.parquet as pq

from pubmed_central_semantic_search_spark.plans.layout import zvalue, zorder_write


def test_zvalue_hand_computed(spark):
    rows = [(1, 0), (0, 1), (3, 3), (2, 1)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zvalue(["x", "y"], bits=2).alias("z")).collect()
    }
    # bit b of x → position 2b; bit b of y → position 2b+1
    assert got == {
        (1, 0): 0b0001,
        (0, 1): 0b0010,
        (3, 3): 0b1111,
        (2, 1): 0b0110,
    }


def _files_intersecting(path: str, col: str, lo: int, hi: int) -> int:
    hit = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is not None and not (fmax < lo or fmin > hi):
            hit += 1
    return hit


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    n = 64
    grid = spark.range(n * n).selectExpr(
        "CAST(id % 64 AS INT) AS x", "CAST(id DIV 64 AS INT) AS y"
    )
    xsorted = str(tmp_path / "xsorted")
    zorded = str(tmp_path / "zorder")
    (
        grid.repartitionByRange(8, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xsorted)
    )
    zorder_write(grid, ["x", "y"], zorded, n_files=8, bits=6)

    # Query box: y in [0, 15], x unconstrained.
    x_hit = _files_intersecting(xsorted, "y", 0, 15)
    z_hit = _files_intersecting(zorded, "y", 0, 15)
    assert x_hit == 8  # x-sort: every file spans all of y
    assert z_hit <= 4  # z-order: y-range maps to a bounded z-range

    # And the x dimension still prunes under z-order.
    assert _files_intersecting(zorded, "x", 0, 15) <= 4

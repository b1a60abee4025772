"""Z-order layout tests: the written files' parquet footer statistics
must be selective on BOTH z-columns simultaneously — the data-skipping
property that makes multi-column predicates cheap at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipelineetl_spark.sinks import layout


@pytest.fixture(scope="module")
def grid(spark):
    # a full 100×100 value grid: x and y are exactly independent, so a
    # single-column sort CANNOT constrain the other column
    return spark.range(10_000).select(
        F.col("id"),
        (F.col("id") % 100).alias("x"),
        (F.col("id") / 100).cast("long").alias("y"),
    )


def _avg_span(stats, col):
    spans = [s[col][1] - s[col][0] for s in stats if s[col][0] is not None]
    return sum(spans) / len(spans)


def test_zorder_files_are_selective_on_both_columns(grid, tmp_path):
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    layout.zorder_write(grid, zpath, ["x", "y"], n_files=16)
    # baseline: single-column sort — perfect on x, useless on y
    (
        grid.repartitionByRange(16, F.col("x"))
        .sortWithinPartitions("x")
        .write.parquet(lpath)
    )
    zs = layout.file_stats(zpath, ["x", "y"])
    ls = layout.file_stats(lpath, ["x", "y"])
    assert len(zs) == 16
    # z-order: BOTH columns' per-file spans shrink well below the full
    # 0–99 range; linear sort leaves y unconstrained (~full range)
    assert _avg_span(zs, "x") < 40 and _avg_span(zs, "y") < 40
    assert _avg_span(ls, "y") > 2 * _avg_span(zs, "y")
    # skipping evidence: count files a reader must touch for a point-ish
    # predicate on each axis — z-order beats linear on y, and is
    # selective on x too
    def files_touching(stats, col, lo, hi):
        return sum(1 for s in stats if not (s[col][1] < lo or s[col][0] > hi))

    assert files_touching(zs, "y", 10, 15) <= 8          # z: skip ≥half on y
    assert files_touching(ls, "y", 10, 15) == 16         # linear: no y skipping
    assert files_touching(zs, "x", 10, 15) <= 8


def test_zorder_preserves_rows_and_values(grid, spark, tmp_path):
    zpath = str(tmp_path / "z2")
    layout.zorder_write(grid, zpath, ["x", "y"], n_files=4)
    back = spark.read.parquet(zpath)
    assert back.count() == 10_000
    assert back.columns == ["id", "x", "y"]  # __z never leaks
    orig = grid.agg(F.sum("id"), F.sum("x"), F.sum("y")).collect()[0]
    got = back.agg(F.sum("id"), F.sum("x"), F.sum("y")).collect()[0]
    assert tuple(orig) == tuple(got)


def test_zorder_validates_columns(grid, tmp_path):
    with pytest.raises(ValueError, match="z-order"):
        layout.zorder_write(grid, str(tmp_path / "bad"), [])


def test_quantile_code_restores_skipping_on_skewed_column(spark, tmp_path):
    """A Zipf-ish skewed column crowds the linear z-code space; the
    quantile premap spreads it equal-frequency so per-file spans become
    selective again in CODE space (the documented escape hatch)."""
    # 90% of rows share tiny values, a long tail spreads to 1e6
    df = spark.range(10_000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, F.col("id") % 7)
        .otherwise((F.col("id") * 997) % 1_000_000)
        .alias("skewed"),
        (F.col("id") % 100).alias("x"),
    )
    coded = layout.quantile_code(df, "skewed", "s_code", bits=8)
    # equal-frequency: no single code holds more than ~the head mass
    top = (
        coded.groupBy("s_code").count().orderBy(F.col("count").desc()).first()
    )
    assert top["count"] <= 9_200  # the 90% head can't exceed its own mass
    zpath = str(tmp_path / "zq")
    layout.zorder_write(coded, zpath, ["x", "s_code"], n_files=16)
    zs = layout.file_stats(zpath, ["x", "s_code"])
    spans = [s["s_code"][1] - s["s_code"][0] for s in zs]
    assert sum(spans) / len(spans) < 120  # code space is 0..255: selective

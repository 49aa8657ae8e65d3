"""Z-order layout (plans/layout.py): Morton-key arithmetic on pinned
small cases, NULL/clamp/validation behavior, and the measurable layout
claim — a box predicate on the NON-lead dimension overlaps strictly
fewer files under Z-order than under a linear sort."""

import pyspark.sql.functions as F
import pytest

from term_spark.plans.layout import (file_pruning_stats, measure_spans,
                                     write_zordered, zorder_key)


def _grid(spark, n=64):
    # uniform n×n grid: x, y in [0, n)
    return (spark.range(n * n)
            .select((F.col("id") % n).alias("x"),
                    (F.col("id") / n).cast("bigint").alias("y")))


def test_zorder_key_interleaves_bits(spark):
    # bits=2, spans (0..3): bucket == value; z = interleave(x, y)
    # (x=1=0b01, y=2=0b10) -> bits: pos0=x0=1, pos1=y0=0, pos2=x1=0,
    # pos3=y1=1 -> 0b1001 = 9
    df = spark.createDataFrame(
        [(0, 0), (1, 2), (3, 3)], "x long, y long")
    z = df.select(zorder_key(["x", "y"], [(0, 3), (0, 3)], bits=2)
                  .alias("z")).collect()
    assert [r["z"] for r in z] == [0, 9, 15]


def test_zorder_key_clamps_and_nulls_to_edges(spark):
    df = spark.createDataFrame([(-50,), (999,), (None,)], "x long")
    z = [r["z"] for r in
         df.select(zorder_key(["x"], [(0, 3)], bits=2).alias("z")).collect()]
    assert z == [0, 3, 0]  # below-span -> bucket 0, above -> 3, NULL -> 0


def test_zorder_key_validation(spark):
    with pytest.raises(ValueError, match="empty column list"):
        zorder_key([], [])
    with pytest.raises(ValueError, match="one .* span per column"):
        zorder_key(["x"], [])
    with pytest.raises(ValueError, match="bits"):
        zorder_key(["a", "b", "c", "d"], [(0, 1)] * 4, bits=16)
    with pytest.raises(ValueError, match="empty span"):
        zorder_key(["x"], [(5, 4)])


def test_measure_spans(spark):
    d = _grid(spark, n=16)
    assert measure_spans(d, ["x", "y"]) == [(0.0, 15.0), (0.0, 15.0)]


def test_zordered_layout_prunes_nonlead_dimension(spark, tmp_path):
    """The claim that makes Z-order worth a rewrite: a range box on y
    (NOT the lead sort column) overlaps far fewer files than under a
    linear x-sort, where every file spans all of y."""
    d = _grid(spark, n=64)
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    spans = write_zordered(d, zpath, ["x", "y"], bits=6, n_files=16)
    assert spans == [(0.0, 63.0), (0.0, 63.0)]
    (d.repartitionByRange(16, "x").sortWithinPartitions("x")
      .write.parquet(lpath))

    def overlapping(path, lo, hi):
        st = file_pruning_stats(spark, path, ["x", "y"])
        return st.filter((F.col("min_y") <= hi) & (F.col("max_y") >= lo)) \
                 .count()

    z_files = overlapping(zpath, 0, 15)   # a 25 % box on y
    l_files = overlapping(lpath, 0, 15)
    assert l_files == 16                  # linear layout: no pruning on y
    assert z_files <= 8, z_files          # z-order: >= half the files skip
    # the layout changes WHERE rows live, never WHAT they are
    zd = spark.read.parquet(zpath)
    assert zd.count() == 64 * 64
    assert zd.agg(F.sum(F.col("x") * 4096 + F.col("y"))).collect()[0][0] \
        == d.agg(F.sum(F.col("x") * 4096 + F.col("y"))).collect()[0][0]


def test_write_zordered_respects_pinned_spans(spark, tmp_path):
    d = _grid(spark, n=8)
    spans = [(0.0, 63.0), (0.0, 63.0)]  # caller-pinned wider domain
    got = write_zordered(d, str(tmp_path / "p"), ["x", "y"],
                         bits=6, n_files=2, spans=spans)
    assert got == spans

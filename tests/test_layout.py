"""Z-order layout: key math edge cases and the actual file-skipping
win (the point of the operator) measured on real lineitem data."""

import pytest
from pyspark.sql import functions as F

from aws_insurancelake_etl_spark.operators import layout

SF_DIR = "/root/testdata/sf0.01"


def test_quantize_clamps_and_degenerate_range(spark):
    df = spark.createDataFrame([(0.0,), (5.0,), (10.0,), (-3.0,), (42.0,)], "x double")
    got = [
        r["b"]
        for r in df.select(layout.quantize(F.col("x"), 0.0, 10.0, 4).alias("b"))
        .orderBy("b")
        .collect()
    ]
    assert got == [0, 0, 8, 15, 15]  # -3 clamps to 0, 42 and 10.0 clamp to 15
    same = df.select(layout.quantize(F.col("x"), 7.0, 7.0, 4).alias("b")).collect()
    assert all(r["b"] == 0 for r in same)


def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame([(0b1010, 0b0110)], "a long, b long")
    z = df.select(
        layout.interleave_bits([F.col("a"), F.col("b")], 4).alias("z")
    ).collect()[0]["z"]
    # bit i of a -> 2i, bit i of b -> 2i+1
    expected = sum(((0b1010 >> i) & 1) << (2 * i) for i in range(4)) + sum(
        ((0b0110 >> i) & 1) << (2 * i + 1) for i in range(4)
    )
    assert z == expected


def test_zorder_layout_skips_files(spark, tmp_path):
    """A 2-d box predicate must open strictly fewer files under the
    z-ordered layout than under a hash-random layout of the same file
    count — the min/max-envelope measurement is exactly what a parquet
    footer scan prunes with."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    n_files = 16
    rand_path = str(tmp_path / "random")
    li.repartition(n_files).write.parquet(rand_path)
    z_path = str(tmp_path / "zorder")
    layout.zorder_write(li, z_path, ["l_partkey", "l_suppkey"], n_files)

    bounds = li.agg(
        F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms")
    ).collect()[0]
    box = {
        "l_partkey": (0, bounds["mp"] * 0.1),
        "l_suppkey": (0, bounds["ms"] * 0.1),
    }
    opened = {}
    for name, path in (("random", rand_path), ("zorder", z_path)):
        stats = layout.file_minmax_stats(spark, path, ["l_partkey", "l_suppkey"])
        opened[name] = (layout.files_overlapping_box(stats, box).count(),
                        stats.count())
    assert opened["random"][1] == n_files
    assert opened["zorder"][0] < opened["random"][0], opened
    # the random layout's every file overlaps (hash spray)
    assert opened["random"][0] == n_files
    # and no rows are lost by the rewrite
    assert spark.read.parquet(z_path).count() == li.count()


def test_zorder_write_returns_reproducible_bounds(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    path = str(tmp_path / "t")
    bounds = layout.zorder_write(li, path, ["l_partkey", "l_suppkey"], 4)
    row = li.agg(F.min("l_partkey"), F.max("l_partkey")).collect()[0]
    assert bounds["l_partkey"] == (float(row[0]), float(row[1]))

"""Z-order layout tests: interleave correctness plus the property the
operator exists for — per-file 2-D bounding boxes (what parquet min/max
pruning sees) shrink dramatically vs an insertion-order layout."""

import pytest
from pyspark.sql import functions as F

from baum_welch_spark.operators.layout import ZBITS, zorder_key
from baum_welch_spark.sources.io import load_table

from conftest import SF0001


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF0001, "events").cache()


def _interleave_py(x: int, y: int, bits: int = ZBITS) -> int:
    z = 0
    for b in range(bits):
        z += ((x >> b) & 1) << (2 * b)
        z += ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_interleaves_bits(spark, events):
    rows = zorder_key(events, "user_id", "value", ["event_id"]).limit(200).collect()
    assert rows
    for r in rows:
        assert 0 <= r["xbin"] < (1 << ZBITS) and 0 <= r["ybin"] < (1 << ZBITS)
        assert r["zval"] == _interleave_py(r["xbin"], r["ybin"])


def test_zorder_constant_column_degrades_gracefully(spark):
    df = spark.createDataFrame([(i, 5, float(i)) for i in range(10)], "id long, x long, y double")
    rows = zorder_key(df, "x", "y", ["id"]).collect()
    assert all(r["xbin"] == 0 for r in rows)  # zero span -> bucket 0, no div-by-zero


def test_zorder_layout_shrinks_file_bounding_boxes(spark, events):
    """Partition 16 ways by zval vs by event_id (insertion order): the mean
    per-partition (xbin, ybin) bounding-box area — the pruning surface
    parquet footer stats expose — must shrink by >= 4x under z-order."""
    keyed = zorder_key(events, "user_id", "value", ["event_id"])

    def mean_box_area(df, key):
        boxed = (
            df.repartitionByRange(16, key)
            .withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                ((F.max("xbin") - F.min("xbin")) * (F.max("ybin") - F.min("ybin"))).alias("area")
            )
        )
        rows = boxed.collect()
        return sum(r["area"] for r in rows) / len(rows)

    area_z = mean_box_area(keyed, "zval")
    area_insertion = mean_box_area(keyed, "event_id")
    assert area_z * 4 <= area_insertion, (area_z, area_insertion)

"""Storage layout: Z-order locality laws, optimized writes round-trip."""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.sources.layout import write_optimized, zorder_key


@pytest.fixture(scope="module")
def grid(spark):
    # 32x32 integer grid — locality is measurable
    return spark.range(1024).select(
        (F.col("id") % 32).alias("x"),
        (F.col("id") / 32).cast("long").alias("y"),
        F.col("id").alias("id")).persist()


def test_zorder_monotone_on_diagonal(spark, grid):
    """Morton key grows along the diagonal: (0,0) < (1,1) < ... — the
    classic Z-curve property (keys of equal points in both dims order by
    magnitude)."""
    keyed = grid.withColumn("z", zorder_key(grid, ["x", "y"]))
    diag = keyed.where(F.col("x") == F.col("y")).orderBy("x") \
        .select("z").collect()
    zs = [r["z"] for r in diag]
    assert zs == sorted(zs) and len(set(zs)) == len(zs)


def test_zorder_locality_beats_single_sort(spark, grid):
    """Partition the grid into 16 chunks by z-key vs by x alone: for a
    filter on y, the z-layout touches fewer chunks' worth of rows spread —
    measured as the number of chunks containing any y<4 row."""
    import math
    keyed = grid.withColumn("z", zorder_key(grid, ["x", "y"])).collect()
    by_z = sorted(keyed, key=lambda r: r["z"])
    by_x = sorted(keyed, key=lambda r: (r["x"], r["y"]))
    chunk = len(by_z) // 16

    def chunks_hit(rows, pred):
        hit = 0
        for i in range(16):
            if any(pred(r) for r in rows[i * chunk:(i + 1) * chunk]):
                hit += 1
        return hit

    pred = lambda r: r["y"] < 4
    assert chunks_hit(by_z, pred) < chunks_hit(by_x, pred)
    # and symmetric: x-filter also prunes under z-order
    assert chunks_hit(by_z, lambda r: r["x"] < 4) < 16


def test_write_optimized_roundtrip(spark, grid, tmp_path):
    p = str(tmp_path / "zsorted")
    write_optimized(grid, p, zorder_cols=["x", "y"],
                    bloom_cols=["id"], target_files=4)
    back = spark.read.parquet(p)
    assert back.count() == 1024
    assert set(back.columns) == {"x", "y", "id"}  # _zkey dropped
    assert sorted(r["id"] for r in back.collect()) == list(range(1024))


def test_write_optimized_sorted_files_prune(spark, grid, tmp_path):
    p = str(tmp_path / "xsorted")
    write_optimized(grid, p, sort_cols=["x"], target_files=4)
    back = spark.read.parquet(p).where(F.col("x") == 3)
    assert back.count() == 32
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(x), EqualTo(x,3)]" in plan


def test_zorder_validates_arity(spark, grid):
    with pytest.raises(ValueError):
        zorder_key(grid, ["x"])

"""Z-order layout: Morton-code correctness vs a per-bit Python reference,
and the file-level locality the clustering exists for — a 2-d box filter
must touch a small fraction of z-ordered files where a curve-ignorant
layout spreads matches across nearly all of them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestionplayground_spark.operators.layout import morton2, zorder_write


def _morton_ref(x: int, y: int) -> int:
    """Bit-at-a-time reference (independent of the magic-mask identity)."""
    z = 0
    for b in range(16):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_morton_matches_per_bit_reference(spark):
    pts = [(0, 0), (1, 0), (0, 1), (1, 1), (255, 17), (65535, 65535), (40000, 123)]
    df = spark.createDataFrame(pts, "x LONG, y LONG")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", morton2("x", "y").alias("z")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _morton_ref(x, y), (x, y)


def test_morton_is_monotone_in_tiles(spark):
    """Points inside one aligned 256x256 tile must all sort before any
    point of the next z-tile — the contiguity property pruning rests on."""
    tile0 = [(x, y) for x in (0, 100, 255) for y in (0, 99, 255)]
    tile1 = [(x + 256, y + 256) for x, y in tile0]  # next diagonal tile
    df = spark.createDataFrame(tile0 + tile1, "x LONG, y LONG")
    rows = df.select(morton2("x", "y").alias("z"), "x").collect()
    z0 = [r["z"] for r in rows if r["x"] < 256]
    z1 = [r["z"] for r in rows if r["x"] >= 256]
    assert max(z0) < min(z1)


def test_zorder_write_clusters_box_queries(spark, tmp_path):
    """64x64 grid written as 16 files, z-ordered vs hash-round-robin:
    a 8x8 box hits few z-files but most round-robin files."""
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    # quantize to 16-bit domain by scaling up (locality-preserving)
    scaled = grid.select(
        "x", "y", (F.col("x") * 1024).alias("qx"), (F.col("y") * 1024).alias("qy")
    )
    zpath = str(tmp_path / "zorder")
    n_z = zorder_write(scaled, zpath, "qx", "qy", n_files=16)
    rpath = str(tmp_path / "roundrobin")
    scaled.repartition(16).write.mode("overwrite").parquet(rpath)

    def files_hit(path):
        return (
            spark.read.parquet(path)
            .filter((F.col("x") < 8) & (F.col("y") < 8))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    assert n_z == 16
    hit_z, hit_r = files_hit(zpath), files_hit(rpath)
    # the 8x8 box is 1/64 of the space: a contiguous curve interval
    # covers it with 1-2 files; round-robin spreads it over ~all 16.
    assert hit_z <= 3, hit_z
    assert hit_r >= 12, hit_r
    # same rows either way
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(rpath).count()
        == 64 * 64
    )


def test_zorder_registry_query_zero_shuffles(spark, sf_dir):
    from dataingestionplayground_spark.queries import all_queries

    df = all_queries()["layout_zorder_codes"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure in-row arithmetic
    assert df.count() == spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

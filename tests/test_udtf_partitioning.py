"""Python UDTF surface + partitioned writes with partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestionplayground_spark.functions.udtf import register_udtfs
from dataingestionplayground_spark.plans import physical_plan
from dataingestionplayground_spark.session import load_table


def test_sentence_split_udtf(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "First one. Second here! Third?"), (2, "")], "id long, txt string"
    ).createOrReplaceTempView("v_udtf_docs")
    rows = spark.sql(
        "SELECT d.id, s.sentence_idx, s.sentence, s.n_tokens "
        "FROM v_udtf_docs d, LATERAL sentence_split(d.txt) s"
    ).collect()
    got = sorted((r.id, r.sentence_idx, r.sentence) for r in rows)
    assert got == [
        (1, 0, "First one."),
        (1, 1, "Second here!"),
        (1, 2, "Third?"),
    ]  # empty doc yields no rows
    assert {(r.sentence, r.n_tokens) for r in rows} == {
        ("First one.", 2), ("Second here!", 2), ("Third?", 1)
    }


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Hive-style partitioned layout + partition pruning: a filter on the
    partition column must prune directories at planning time, not scan."""
    out = str(tmp_path / "events_by_day")
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    events.write.mode("overwrite").partitionBy("day").parquet(out)

    read = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    plan = physical_plan(read)
    assert "PartitionFilters" in plan and "2024-01-05" in plan
    n_total = spark.read.parquet(out).count()
    n_day = read.count()
    assert 0 < n_day < n_total

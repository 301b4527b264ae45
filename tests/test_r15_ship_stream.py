"""Round-15 ship-readiness maintainer pins (r14 verdict item 6):

* batch parity — after streaming the corpus through epoch merges, the
  maintained gate row equals the registered ``pipeline_release_gate``
  row column for column (same member values, same 6dp rounds, same
  literal thresholds, same ship verdict);
* replay idempotence — re-merging an epoch (foreachBatch retry) leaves
  every sub-table, and therefore the gate row, identical;
* compaction identity — folding committed epochs changes nothing;
* foreachBatch wiring — the availableNow stream over JSON-lines files
  converges to the same gate row as the direct merges.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from dataingestionplayground_spark.session import get_spark

    return get_spark()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _refs(docs):
    from dataingestionplayground_spark.operators.incremental import (
        ship_eval_reference,
    )

    a = docs.filter(F.col("doc_id") % 5 != 4).localCheckpoint(eager=True)
    ev = ship_eval_reference(docs).localCheckpoint(eager=True)
    return a, ev


def _gate_row(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_ship_state_parity_replay_compaction(spark, docs, tmp_path):
    from dataingestionplayground_spark.operators.incremental import (
        compact_ship_state,
        merge_ship_state,
        ship_readiness_over,
    )
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    path = str(tmp_path / "ship")
    a, ev = _refs(docs)
    b1 = docs.filter(F.col("doc_id") % 3 == 0)
    b2 = docs.filter(F.col("doc_id") % 3 == 1)
    b3 = docs.filter(F.col("doc_id") % 3 == 2)
    merge_ship_state(spark, b1, a, ev, path, epoch_id=1)
    merge_ship_state(spark, b2, a, ev, path, epoch_id=2)
    merge_ship_state(spark, b3, a, ev, path, epoch_id=3)

    got = _gate_row(ship_readiness_over(spark, path, ev))
    want = _gate_row(REGISTRY["pipeline_release_gate"].fn(spark, SF))
    assert got == want  # column-for-column, incl. the ship verdict

    # replay epoch 2 (foreachBatch retry): every sub-table converges
    merge_ship_state(spark, b2, a, ev, path, epoch_id=2)
    assert _gate_row(ship_readiness_over(spark, path, ev)) == want

    # compaction folds committed epochs without changing the gate row
    assert compact_ship_state(spark, path) == 4
    assert _gate_row(ship_readiness_over(spark, path, ev)) == want
    shape = spark.read.parquet(f"{path}/shape")
    assert shape.filter(F.col("epoch_id").isNotNull()).count() == 0


def test_ship_state_incremental_monotone_members(spark, docs, tmp_path):
    # the maintained row is readable BETWEEN merges (partial corpus):
    # counts grow monotonically and never exceed the full-corpus values
    from dataingestionplayground_spark.operators.incremental import (
        merge_ship_state,
        ship_readiness_over,
    )

    path = str(tmp_path / "ship_inc")
    a, ev = _refs(docs)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    merge_ship_state(spark, b1, a, ev, path, epoch_id=1)
    first = _gate_row(ship_readiness_over(spark, path, ev))
    merge_ship_state(spark, b2, a, ev, path, epoch_id=2)
    second = _gate_row(ship_readiness_over(spark, path, ev))
    assert first["n_docs"] < second["n_docs"]
    assert first["total_tokens"] < second["total_tokens"]
    assert first["n_contaminated"] <= second["n_contaminated"]
    assert first["n_delta"] <= second["n_delta"]
    assert second["n_docs"] == docs.count()


def test_stream_ship_readiness_foreachbatch(spark, docs, tmp_path):
    import json
    import os

    from dataingestionplayground_spark.operators.incremental import (
        ship_readiness_over,
    )
    from dataingestionplayground_spark.queries import all_queries
    from dataingestionplayground_spark.streaming.ingest import (
        stream_ship_readiness,
    )

    REGISTRY = all_queries()
    watch = tmp_path / "watch"
    os.makedirs(watch)
    rows = docs.select("doc_id", "source", "lang", "n_chars", "text").collect()
    third = (len(rows) + 2) // 3
    for i in range(3):
        with open(watch / f"docs-{i}.json", "w") as f:
            for r in rows[i * third : (i + 1) * third]:
                f.write(json.dumps(r.asDict()) + "\n")

    a, ev = _refs(docs)
    path = str(tmp_path / "ship_stream")
    q = stream_ship_readiness(
        spark, str(watch), a, ev, path, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = _gate_row(ship_readiness_over(spark, path, ev))
    want = _gate_row(REGISTRY["pipeline_release_gate"].fn(spark, SF))
    assert got == want

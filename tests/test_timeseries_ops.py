"""Semantics tests for the time-series / classifier queries added in
round 8: daily gap fill + forward fill, SCD2 history build, interval
union coverage, and the trained naive-Bayes quality classifier. Each is
re-derived independently in plain Python from the raw parquet rows and
compared exactly (the DuckDB oracle already checks SQL parity; these
check the MEANING against a non-SQL reference implementation).
"""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from dataingestionplayground_spark.queries import all_queries

QS = all_queries()


@pytest.fixture(scope="module")
def raw_events(spark, sf_dir):
    rows = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    # floor-epoch seconds exactly as functions.portable.epoch_seconds
    return [
        (
            r["user_id"],
            r["event_id"],
            int(math.floor(r["ts"].timestamp())),
            r["event_type"],
            r["value"],
        )
        for r in rows
    ]


# ------------------------------------------------------------- gap fill


def test_gap_fill_grid_is_dense_and_ffilled(spark, sf_dir, raw_events):
    got = {
        (r["user_id"], r["day"]): r
        for r in QS["events_gap_fill"].fn(spark, sf_dir).collect()
    }
    # independent reference: daily sums, dense grid, forward fill
    daily = defaultdict(lambda: [0, 0.0])
    for uid, _eid, sec, _et, val in raw_events:
        d = daily[(uid, sec // 86400)]
        d[0] += 1
        d[1] += val
    users = defaultdict(list)
    for (uid, day) in daily:
        users[uid].append(day)
    expect_rows = 0
    for uid, days in users.items():
        d0, d1 = min(days), max(days)
        last_seen = None
        for day in range(d0, d1 + 1):
            expect_rows += 1
            r = got[(uid, day)]
            if (uid, day) in daily:
                n, v = daily[(uid, day)]
                last_seen = v
                assert r["n_events"] == n and r["is_gap"] is False
                assert r["day_value"] == pytest.approx(v, abs=1e-6)
            else:
                assert r["n_events"] == 0 and r["is_gap"] is True
                assert r["day_value"] is None
            assert r["filled_value"] == pytest.approx(last_seen, abs=1e-6)
    assert len(got) == expect_rows  # no rows outside any user's span


# ------------------------------------------------------------------ SCD2


def test_scd2_matches_change_point_replay(spark, sf_dir, raw_events):
    got = defaultdict(list)
    for r in QS["events_scd2_history"].fn(spark, sf_dir).collect():
        got[r["user_id"]].append(r)
    per_user = defaultdict(list)
    for uid, eid, sec, et, _v in raw_events:
        per_user[uid].append((sec, eid, et))
    assert set(got) == set(per_user)
    for uid, evs in per_user.items():
        evs.sort()
        expected = []  # (status, valid_from) change points
        prev = None
        for sec, _eid, et in evs:
            if prev is None or et != prev:
                expected.append((et, sec))
            prev = et
        rows = sorted(got[uid], key=lambda r: r["version"])
        assert [(r["status"], r["valid_from"]) for r in rows] == expected
        assert [r["version"] for r in rows] == list(range(1, len(expected) + 1))
        # each version closes exactly at the next one's start; last open
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"] and a["is_current"] is False
        assert rows[-1]["valid_to"] is None and rows[-1]["is_current"] is True


# ------------------------------------------------------- interval union


def test_interval_coverage_matches_sweep(spark, sf_dir, raw_events):
    got = {
        r["user_id"]: r
        for r in QS["events_interval_coverage"].fn(spark, sf_dir).collect()
    }
    per_user = defaultdict(list)
    for uid, eid, sec, _et, val in raw_events:
        per_user[uid].append((sec, sec + int(math.floor(val))))
    for uid, ivs in per_user.items():
        ivs.sort()
        islands, cur_s, cur_e = 0, None, None
        covered = 0
        for s, e in ivs:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                islands, cur_s, cur_e = islands + 1, s, e
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s
        r = got[uid]
        assert r["n_islands"] == islands
        assert r["covered_seconds"] == covered
        assert r["n_events"] == len(ivs)


# ------------------------------------------------- naive-Bayes classifier


def test_nb_classifier_beats_majority_baseline(spark, sf_dir):
    rows = QS["text_nb_quality_classifier"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert math.isfinite(r["log_odds"])
        assert r["pred_pos"] == (r["log_odds"] >= 0.0)
    # self-distillation on the training corpus must beat predicting the
    # majority class everywhere — otherwise the "trained" model learned
    # nothing from the hashed-unigram features
    acc = sum(r["is_match"] for r in rows) / len(rows)
    labels = QS["text_unigram_perplexity"].fn(spark, sf_dir).collect()
    pos_rate = sum(r["keep"] for r in labels) / len(labels)
    majority = max(pos_rate, 1.0 - pos_rate)
    assert 0.0 < pos_rate < 1.0  # the label gate must be two-class here
    assert acc > majority, (acc, majority)


def test_nb_classifier_separates_crafted_vocab(spark, tmp_path):
    """Disjoint-vocabulary corpus: 30 docs of common repeated text (low
    perplexity -> label keep) vs 10 docs of document-unique rare tokens
    (high perplexity -> label drop). NB trained on those labels must
    split the corpus perfectly."""
    clean = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = [(i, clean) for i in range(30)] + [
        (30 + j, " ".join(f"zq{30 + j}x{k}" for k in range(12))) for j in range(10)
    ]
    df = spark.createDataFrame(
        [(i, tx, "en", f"src{i % 3}", len(tx)) for i, tx in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in QS["text_nb_quality_classifier"].fn(spark, str(tmp_path)).collect()
    }
    for i, _tx in docs:
        assert out[i]["pred_pos"] is (i < 30)
        assert out[i]["is_match"] is True


# ------------------------------------- adversarial crafted-events cases


def test_timeseries_ops_on_adversarial_events(spark, tmp_path):
    """Edge shapes the sf corpus may not contain: duplicate timestamps,
    zero-length intervals, exact interval adjacency (start == prev end),
    single-event users, and multi-day gaps. All three operators must
    agree with the plain-Python replays on them."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        # user 1: duplicate ts (tie broken by event_id), zero duration
        (1, 1, base, "a", 0.4),                      # floor(0.4) = 0 seconds
        (2, 1, base, "b", 10.0),
        # user 1: exactly adjacent interval (start == prev end) -> merges
        (3, 1, base + dt.timedelta(seconds=10), "b", 5.0),
        # user 1: gap, then a 3-day jump for gap_fill
        (4, 1, base + dt.timedelta(days=3), "a", 2.0),
        # user 2: single event
        (5, 2, base, "c", 7.5),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    ).select("event_id", "ts", "user_id", "event_type", "value")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    sf = str(tmp_path)

    cov = {r["user_id"]: r for r in
           QS["events_interval_coverage"].fn(spark, sf).collect()}
    # user 1: [t,t] & [t,t+10] overlap (0-length sits inside), [t+10,t+15]
    # is ADJACENT so it merges -> island1 [t, t+15]; island2 [t+3d, +2s]
    assert cov[1]["n_islands"] == 2
    assert cov[1]["covered_seconds"] == 15 + 2
    assert cov[2]["n_islands"] == 1 and cov[2]["covered_seconds"] == 7

    scd = sorted(
        [r for r in QS["events_scd2_history"].fn(spark, sf).collect()
         if r["user_id"] == 1],
        key=lambda r: r["version"],
    )
    # duplicate-ts pair ordered by event_id: a -> b (dup collapses) -> a
    assert [r["status"] for r in scd] == ["a", "b", "a"]
    assert scd[0]["valid_to"] == scd[1]["valid_from"]
    assert scd[-1]["is_current"] is True and scd[-1]["valid_to"] is None

    gf = {(r["user_id"], r["day"]): r for r in
          QS["events_gap_fill"].fn(spark, sf).collect()}
    day0 = int(base.timestamp()) // 86400
    u1_days = sorted(d for (u, d) in gf if u == 1)
    assert u1_days == list(range(day0, day0 + 4))  # dense despite the 3-day gap
    assert gf[(1, day0 + 1)]["is_gap"] is True
    assert gf[(1, day0 + 1)]["filled_value"] == pytest.approx(
        0.4 + 10.0 + 5.0, abs=1e-6
    )  # carried from day0
    assert gf[(1, day0 + 3)]["is_gap"] is False
    assert len([1 for (u, _d) in gf if u == 2]) == 1  # single-day span


def test_anomaly_mad_matches_numpy(spark, sf_dir, raw_events):
    import numpy as np

    got = {r["event_id"]: r for r in
           QS["events_anomaly_mad"].fn(spark, sf_dir).collect()}
    vals = defaultdict(list)
    for _uid, eid, _sec, et, v in raw_events:
        vals[et].append((eid, v))
    expect = {}
    for et, evs in vals.items():
        a = np.array([v for _e, v in evs])
        med = np.quantile(a, 0.5)
        mad = np.quantile(np.abs(a - med), 0.5)
        for eid, v in evs:
            rz = (v - med) / (1.4826 * mad)
            if abs(rz) > 3.5:
                expect[eid] = round(rz, 4)
    assert set(got) == set(expect)
    for eid, rz in expect.items():
        assert got[eid]["robust_z"] == pytest.approx(rz, abs=2e-4)


# ------------------------------------------------------ epoch expansion


def test_epoch_expansion_realizes_plan(spark, sf_dir):
    plan = {r["source"]: r for r in
            QS["pipeline_mixture_plan"].fn(spark, sf_dir).collect()}
    rows = QS["sample_epoch_expansion"].fn(spark, sf_dir).collect()
    per_source = defaultdict(lambda: defaultdict(set))
    for r in rows:
        per_source[r["source"]][r["doc_id"]].add(r["copy_id"])
        assert 1 <= r["copy_id"] <= r["n_copies"]
    for src, docs in per_source.items():
        ep = plan[src]["epochs"]
        for did, copies in docs.items():
            assert copies == set(range(1, len(copies) + 1))  # dense 1..n
            assert math.floor(ep) <= len(copies) <= math.ceil(ep)
        realized = sum(len(c) for c in docs.values()) / plan[src]["n_docs"]
        # deterministic md5 draw realizes epochs in expectation (loose
        # band: 25 docs/source at sf0.001)
        assert abs(realized - ep) < 0.5, (src, realized, ep)


# --------------------------------------------------------------- CUSUM


def _cusum_replay(raw_events):
    per_user = defaultdict(list)
    for uid, eid, sec, _et, val in raw_events:
        per_user[uid].append((sec, eid, int(round(val * 100))))
    def med2(xs):
        xs = sorted(xs)
        n = len(xs)
        if n % 2:
            return 2 * xs[n // 2]
        return xs[n // 2 - 1] + xs[n // 2]
    alarms = {}
    for uid, evs in per_user.items():
        evs.sort()
        m2 = med2([c for _s, _e, c in evs])
        devs = [abs(2 * c - m2) for _s, _e, c in evs]
        mad4 = med2(devs)
        s = 0
        for _sec, eid, c in evs:
            s = max(0, s + (4 * c - 2 * m2) - mad4)
            if s > 8 * mad4:
                alarms[(uid, eid)] = (s, 8 * mad4)
    return alarms


def test_cusum_matches_integer_replay(spark, sf_dir, raw_events):
    got = {
        (r["user_id"], r["event_id"]): (r["cusum4"], r["threshold4"])
        for r in QS["events_changepoint_cusum"].fn(spark, sf_dir).collect()
    }
    assert got == _cusum_replay(raw_events)
    assert got  # the sf corpus must actually trigger some alarms


def test_cusum_fires_after_level_shift_only(spark, tmp_path):
    """Crafted shift: stable values then a sustained jump — alarms must
    appear only after the shift point."""
    import datetime as dt

    base = dt.datetime(2024, 5, 1)
    rows = []
    for i in range(40):
        v = 10.0 if i < 32 else 50.0  # level shift at event 32
        rows.append((i, 7, base + dt.timedelta(minutes=i), "x", v + (i % 3) * 0.1))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    ).select("event_id", "ts", "user_id", "event_type", "value")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    alarms = sorted(
        r["event_id"]
        for r in QS["events_changepoint_cusum"].fn(spark, str(tmp_path)).collect()
    )
    assert alarms and min(alarms) >= 32  # nothing before the shift
    assert max(alarms) <= 39


def test_degenerate_groups_yield_null_not_crash(spark, tmp_path):
    """ANSI mode is on: data-derived zero denominators (constant hour,
    constant value, MAD == 0) must produce NULL/filtered rows — exactly
    like the DuckDB oracle — not a DIVIDE_BY_ZERO abort."""
    import datetime as dt

    base = dt.datetime(2024, 6, 1, 9, 30, 0)
    rows = (
        # 'const': one event only -> constant x AND constant y AND MAD=0
        [(0, 1, base, "const", 5.0)]
        # 'flat': many events, same hour-of-day, same value
        + [(10 + i, 2, base + dt.timedelta(seconds=i), "flat", 2.0)
           for i in range(10)]
        # 'ok': a healthy group spanning hours and values
        + [(100 + i, 3, base + dt.timedelta(hours=i % 5, minutes=i), "ok",
            float(10 + 7 * (i % 5))) for i in range(20)]
    )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    ).select("event_id", "ts", "user_id", "event_type", "value")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    sf = str(tmp_path)

    ols = {r["event_type"]: r for r in
           QS["agg_linear_regression"].fn(spark, sf).collect()}
    assert ols["const"]["slope"] is None and ols["const"]["r2"] is None
    assert ols["flat"]["slope"] is None  # constant x
    assert ols["ok"]["slope"] is not None and ols["ok"]["r2"] is not None

    mad = QS["events_anomaly_mad"].fn(spark, sf).collect()  # must not raise
    assert all(r["event_type"] != "flat" for r in mad)  # MAD=0 -> filtered

    fs = {r["event_id"]: r for r in
          QS["pipeline_feature_scaling"].fn(spark, sf).collect()}
    assert fs[10]["zscore"] is None and fs[10]["minmax"] is None  # flat group
    assert fs[100]["zscore"] is not None


def test_mixture_plan_empty_source_yields_null_epochs(spark, tmp_path):
    docs = [(i, "alpha beta gamma", "en", "full", 16) for i in range(5)] + [
        (10 + i, "   ", "en", "empty", 3) for i in range(3)
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r["source"]: r for r in
            QS["pipeline_mixture_plan"].fn(spark, str(tmp_path)).collect()}
    assert rows["empty"]["n_tokens"] == 0
    assert rows["empty"]["epochs"] is None  # no ANSI abort
    assert rows["full"]["epochs"] is not None

"""Mergeable-sketch query surface (Apache DataSketches built-ins new in
Spark 4: theta / KLL / approx_top_k) — the sub-linear-state scale path
for distinct-set algebra, quantiles, and heavy hitters at 100 TB.

Every sketch aggregate here is algebraic: partial sketches build
map-side per partition and merge associatively, so the shuffle carries
one small binary per partition instead of the raw keys — the property
that makes these THE replacements for exact distinct/percentile/top-k
when key cardinality outgrows executor memory.

Determinism notes drive the gating:
* theta sketches are EXACT (and integer-valued) while the number of
  distinct keys stays under the nominal-entries capacity — at the
  oracle/bench scale factors (150 / 1.5k / 15k users << 2^14) the
  estimates equal the true counts, so ``agg_theta_set_algebra``
  carries a full DuckDB oracle; past capacity it degrades gracefully
  into the designed approximate mode.
* KLL compaction is randomized (verified: three same-input runs give
  three near-identical-but-different quantiles), so the KLL query is
  rows-only with a rank-error-bound pytest.
* approx_top_k counts are exact while distinct keys fit in
  maxItemsTracked, but boundary ties may resolve differently than a
  SQL ORDER BY — rows-only with an exact-match pytest away from ties.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestionplayground_spark.queries import register
from dataingestionplayground_spark.session import load_table as t

_LG_K = 14  # 2^14 nominal entries: exact far beyond every test/bench SF


@register(
    "agg_theta_set_algebra",
    oracle="""
    SELECT CAST(COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS BIGINT)
             AS n_view,
           CAST(COUNT(DISTINCT CASE WHEN event_type IN ('view', 'click') THEN user_id END) AS BIGINT)
             AS n_view_or_click,
           CAST((SELECT COUNT(*) FROM
                  (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
                   INTERSECT
                   SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')) AS BIGINT)
             AS n_view_and_purchase,
           CAST((SELECT COUNT(*) FROM
                  (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
                   EXCEPT
                   SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')) AS BIGINT)
             AS n_view_not_purchase
    FROM events
    """,
)
def agg_theta_set_algebra(spark, sf):
    # Distinct-user set algebra WITHOUT any exact-distinct shuffle: one
    # pass builds three conditional theta sketches (map-side partial,
    # associative merge — per-partition state is a <=2^14-entry sketch,
    # independent of |users|), then union / intersection / difference
    # and estimation are in-row expression calls on the one merged row.
    # The exact formulation needs either COUNT(DISTINCT) shuffles keyed
    # by user or an INTERSECT/EXCEPT pair of distincts; the sketch form
    # ships KB per partition and composes incrementally (a daily sketch
    # per partition date rolls up for free). Estimates are exact below
    # sketch capacity — pinned by the oracle at gate scale.
    e = t(spark, sf, "events")
    sk = lambda typ: f"theta_sketch_agg(CASE WHEN event_type = '{typ}' THEN user_id END, {_LG_K})"
    merged = e.agg(
        F.expr(sk("view")).alias("sv"),
        F.expr(sk("click")).alias("sc"),
        F.expr(sk("purchase")).alias("sp"),
    )
    return merged.select(
        F.expr("theta_sketch_estimate(sv)").cast("long").alias("n_view"),
        F.expr("theta_sketch_estimate(theta_union(sv, sc))")
        .cast("long")
        .alias("n_view_or_click"),
        F.expr("theta_sketch_estimate(theta_intersection(sv, sp))")
        .cast("long")
        .alias("n_view_and_purchase"),
        F.expr("theta_sketch_estimate(theta_difference(sv, sp))")
        .cast("long")
        .alias("n_view_not_purchase"),
    )


# Heavy hitters via the ApproxTopK sketch (frequent-items). r11 (r10
# verdict item 9): converted from rows-only to oracle-checked — counts
# are EXACT while distinct keys <= maxItemsTracked (100k; the events
# user domain is far below at every tested SF), and the old hazard
# (which item wins a COUNT TIE at the emission boundary is
# insertion-order-dependent) disappears by requesting the sketch's full
# tracked item list (k=4096 >> distinct users) and re-ranking
# deterministically OURSELVES — the tied group is then fully present on
# both engines and (est_n desc, user_id asc) picks the same 10. Beyond
# 100k distinct keys the sketch degrades gracefully to approximate
# heavy hitters — the documented production contract;
# tests/test_sketches.py still pins the error bound.
@register(
    "agg_approx_top_users",
    oracle="""
    WITH c AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS est_n
      FROM events GROUP BY user_id
    )
    SELECT user_id, est_n,
           CAST(row_number() OVER (ORDER BY est_n DESC, user_id ASC)
             AS INTEGER) AS rk
    FROM c ORDER BY rk LIMIT 10
    """,
)
def agg_approx_top_users(spark, sf):
    from dataingestionplayground_spark.operators.prefix import bounded_rank

    e = t(spark, sf, "events")
    tk = e.agg(F.expr("approx_top_k(user_id, 4096, 100000)").alias("tk"))
    # Exactness guard (ADVICE r11): the oracle equivalence is only sound
    # while the sketch tracks EVERY distinct user (returned items < the
    # 4096 we request — at 4096 the tracked list truncated and the
    # emission-boundary tie hazard is back). assert_true raises
    # engine-side (returns NULL when sound), so a future SF change that
    # grows the user domain past the bound fails loudly instead of
    # flaking the hash gate.
    tk = tk.filter(
        F.assert_true(
            F.size("tk") < F.lit(4096),
            F.lit(
                "agg_approx_top_users: sketch truncated (>=4096 distinct"
                " users) — exact-counts oracle no longer sound"
            ),
        ).isNull()
    )
    flat = tk.select(F.explode("tk").alias("s")).select(
        F.col("s.item").cast("long").alias("user_id"),
        F.col("s.count").cast("long").alias("est_n"),
    )
    # re-rank deterministically (est_n desc, user_id asc) — the sketch's
    # own tie order is not a contract
    top = flat.orderBy(F.desc("est_n"), F.asc("user_id")).limit(10)
    return bounded_rank(top, [("est_n", False), ("user_id", True)], "rk")


# KLL quantiles: rows-only — compaction is randomized above the sketch's
# retained capacity, so two runs legitimately differ inside the rank
# error bound; tests/test_sketches.py asserts the bound, not the value.
@register("agg_kll_quantiles", oracle=None)
def agg_kll_quantiles(spark, sf):
    li = t(spark, sf, "lineitem")
    sk = li.agg(
        F.expr("kll_sketch_agg_double(cast(l_extendedprice as double))").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    qs = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95}
    return sk.select(
        "n",
        *[
            F.expr(f"kll_sketch_get_quantile_double(sk, {frac})").alias(name)
            for name, frac in qs.items()
        ],
    )


# Count-min point frequencies: ORACLE-CHECKED since r12 (rows-only
# 3 -> 2). The CMS estimate for a key is exact iff in at least one of
# its depth rows no other key collides; at the GATE corpora the sketch
# (width 2719, depth 5, seed 42) is measured COLLISION-FREE over the
# full user domain (sf0.001: 15 users, sf0.01: 150 — zero mismatches
# vs exact counts; at sf0.1's 1500 users collisions appear and the
# estimates go approximate, the documented production contract). The
# exactness window is pinned in pytest (estimate == exact over the
# FULL domain at both gate SFs), and since r13 ALSO by an in-query
# guard (probe estimates re-checked against exact counts whenever the
# user domain is inside the bounded regime), so a corpus change that
# introduces a collision fails loudly instead of flaking the driver
# gate — the same bounded-domain discipline as agg_approx_top_users.
@register(
    "agg_countmin_point_freq",
    oracle="""
    SELECT u.user_id, CAST(COALESCE(c.n, 0) AS BIGINT) AS est_n
    FROM (SELECT unnest(generate_series(CAST(0 AS BIGINT), CAST(9 AS BIGINT)))
            AS user_id) u
    LEFT JOIN (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id) c
      USING (user_id)
    """,
)
def agg_countmin_point_freq(spark, sf):
    # Count-min sketch over event user_ids (Cormode & Muthukrishnan
    # 2005), probed for a fixed user set — the point-frequency member
    # of the mergeable-summary family (theta = distinct, KLL =
    # quantiles, ApproxTopK = heavy hitters, CMS = "how often did THIS
    # key occur" without a per-key counter table). The sketch AGG is
    # one partial+final pass (Spark's built-in count_min_sketch,
    # deterministic at a fixed seed); probing reads the ~100 KB summary
    # driver-side through the JVM reader — the codebook pattern, cost
    # independent of corpus size.
    e = t(spark, sf, "events")
    row = e.agg(
        F.expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").alias("cms")
    ).first()
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(row["cms"]))
    )
    probes = [(uid, int(cms.estimateCount(uid))) for uid in range(10)]
    # In-query exactness guard (ADVICE r12, mirroring agg_approx_top_users):
    # the exact-counts oracle is sound only while the probe keys are
    # collision-free in the sketch, and until now that was enforced only
    # by an out-of-band pytest pin — a corpus change reaching the gate
    # without tests would FLAKE the hash gate. Inside the bounded-domain
    # regime (the gate SFs: 15/150 users; cutoff 1000 well below sf0.1's
    # 1500 where collisions are the documented approximate contract), a
    # probe estimate that disagrees with the exact count now raises
    # loudly instead. Above the cutoff the sketch is honestly
    # approximate and the guard does not apply (and no gate runs there).
    # Cost: one distinct-count + one 10-key filtered agg, both bounded.
    n_users = e.select("user_id").distinct().count()
    if n_users <= 1000:
        exact = {
            int(r["user_id"]): int(r["n"])
            for r in e.filter(F.col("user_id") < 10)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        bad = [
            (uid, est, exact.get(uid, 0))
            for uid, est in probes
            if est != exact.get(uid, 0)
        ]
        if bad:
            raise ValueError(
                "agg_countmin_point_freq: CMS probe estimate != exact count "
                f"for {bad} with only {n_users} distinct users — the sketch "
                "is no longer collision-free over the probe keys; the "
                "exact-counts oracle is unsound (update the documented "
                "exactness window)"
            )
    return spark.createDataFrame(probes, "user_id long, est_n long")

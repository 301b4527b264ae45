"""Analytics batch: TF-IDF ranking, winnowing fingerprints, event funnels,
cohort retention — the remaining classic text/event analytics shapes a
training-data + product-analytics pipeline needs.

All Catalyst built-ins (explode/join/window/conditional agg); float math
(log) is evaluated with the same expression tree on both engines, so
results stay hash-matched.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dataingestionplayground_spark.functions import portable as PF
from dataingestionplayground_spark.functions import text as TX
from dataingestionplayground_spark.queries import register
from dataingestionplayground_spark.session import load_table as t


@register(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({TX.tokens_sql('text')}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             round(CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rk FROM (
      SELECT doc_id, term, tfidf,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS INTEGER) AS rk
      FROM scored) WHERE rk <= 3
    """,
)
def text_tfidf_top_terms(spark, sf):
    # TF-IDF: two hash aggs + a broadcastable term-df join + per-doc top-k.
    # The df table is |vocabulary|-sized — tiny relative to the corpus, so
    # it broadcasts at any corpus scale.
    d = t(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))  # 1-row, stays in-plan
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            # ln() differs in the last ulp between JVM and libm ->
            # round for cross-engine stability
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", "rk")
    )


@register(
    "text_winnowing_fingerprints",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id, g.i AS pos, md5(substr(text, g.i, 8)) AS h
      FROM documents,
           LATERAL (SELECT unnest(generate_series(1, greatest(length(text) - 7, 0))) AS i) g
    ), wins AS (
      SELECT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
             pos
      FROM grams
    )
    SELECT doc_id, fp AS fingerprint, COUNT(*) AS n_windows
    FROM wins WHERE pos <= (SELECT max(pos) FROM grams g2 WHERE g2.doc_id = wins.doc_id) - 3
    GROUP BY doc_id, fp
    """,
)
def text_winnowing_fingerprints(spark, sf):
    # Winnowing (local-min-hash selection): hash every 8-gram, take the min
    # over each sliding window of 4 positions, keep distinct selected
    # hashes — the standard plagiarism/near-dup fingerprint set, as one
    # window function over (doc, pos).
    d = t(spark, sf, "documents")
    grams = d.select(
        "doc_id",
        F.posexplode(TX.char_shingles("text", 8)).alias("pos0", "g"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), F.md5("g").alias("h"))
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    wins = grams.withColumn("fp", F.min("h").over(w))
    max_pos = grams.groupBy("doc_id").agg(F.max("pos").alias("mx"))
    return (
        wins.join(F.broadcast(max_pos), "doc_id")
        .filter(F.col("pos") <= F.col("mx") - 3)
        .groupBy("doc_id", F.col("fp").alias("fingerprint"))
        .agg(F.count(F.lit(1)).alias("n_windows"))
    )


@register(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
        AND e.ts <= v.t_view + INTERVAL 24 HOUR GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t_buy
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        AND e.ts <= c.t_click + INTERVAL 24 HOUR GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_full_funnel
    """,
)
def events_funnel(spark, sf):
    # Ordered-sequence funnel with conversion windows (click within 24h of
    # first view, purchase within 24h of that click):
    # three stage aggregations, each joined to the previous stage's first
    # event time. Stage tables are per-user (small) -> broadcast joins.
    e = t(spark, sf, "events")
    v = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t_view"))
    c = (
        e.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter((F.col("ts") > F.col("t_view")) & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 24 HOURS")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter((F.col("ts") > F.col("t_click")) & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 24 HOURS")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    # single-row result assembled in-plan (no driver-side counts)
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_full_funnel")))
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(floor(min(epoch(ts)) / 86400) AS BIGINT) AS first_day
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, CAST(floor(epoch(e.ts) / 86400) AS BIGINT) AS day
      FROM events e
    )
    SELECT f.first_day AS cohort_day,
           COUNT(DISTINCT f.user_id) AS cohort_size,
           COUNT(DISTINCT CASE WHEN a.day = f.first_day + 7 THEN a.user_id END) AS retained_d7
    FROM firsts f LEFT JOIN activity a ON a.user_id = f.user_id
    GROUP BY f.first_day
    """,
)
def events_cohort_retention(spark, sf):
    # Day-7 cohort retention: first-activity day per user (the cohort) vs
    # distinct activity days. Both sides integer epoch-days -> exact.
    e = t(spark, sf, "events")
    day = F.floor(PF.epoch_seconds("ts") / 86400).cast("long")
    firsts = e.select("user_id", day.alias("day")).groupBy("user_id").agg(
        F.min("day").alias("first_day")
    )
    activity = e.select("user_id", day.alias("day")).distinct()
    return (
        firsts.join(activity, "user_id", "left")
        .groupBy(F.col("first_day").alias("cohort_day"))
        .agg(
            F.countDistinct("user_id").alias("cohort_size"),
            F.countDistinct(
                F.when(F.col("day") == F.col("first_day") + 7, F.col("user_id"))
            ).alias("retained_d7"),
        )
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - s.s1 / s.n)
                 / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)), 4) AS z
    FROM events e JOIN stats s ON s.event_type = e.event_type
    WHERE abs((e.value - s.s1 / s.n)
              / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1))) > 2.5
    """,
)
def events_anomaly_zscore(spark, sf):
    # z-score outlier detection per event_type from decimal-exact power
    # sums (one agg pass + a broadcast join back to the stream).
    e = t(spark, sf, "events")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,6)")).cast("double").alias("s2"),
    )
    j = e.join(F.broadcast(stats), "event_type")
    z = (F.col("value") - F.col("s1") / F.col("n")) / F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    )
    return (
        j.filter(F.abs(z) > 2.5)
        .select("event_id", "event_type", "value", F.round(z, 4).alias("z"))
    )


@register(
    "events_heavy_hitters",
    oracle="""
    SELECT user_id, n_events, rk FROM (
      SELECT user_id, COUNT(*) AS n_events,
             CAST(row_number() OVER (ORDER BY COUNT(*) DESC, user_id ASC) AS INTEGER) AS rk
      FROM events GROUP BY user_id) WHERE rk <= 10
    """,
)
def events_heavy_hitters(spark, sf):
    # exact heavy hitters (top users by event volume); at 100 TB swap the
    # exact count for approx_count_distinct / count-min sketches. The
    # top-10 is taken with orderBy+limit (TakeOrderedAndProject: partial
    # top-k per partition, no global sort, no single-reducer window over
    # |users| rows); only the surviving <=10 rows are ranked, window-free
    # (operators/prefix.py bounded_rank).
    from dataingestionplayground_spark.operators.prefix import bounded_rank

    e = t(spark, sf, "events")
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    top = counts.orderBy(F.desc("n_events"), F.asc("user_id")).limit(10)
    return bounded_rank(top, [("n_events", False), ("user_id", True)], "rk")


@register(
    "events_rolling_dau",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, user_id FROM events
    ), days AS (
      SELECT DISTINCT day FROM activity
    )
    SELECT d.day, COUNT(DISTINCT a.user_id) AS wau
    FROM days d JOIN activity a ON a.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def events_rolling_dau(spark, sf):
    # Rolling 7-day active users: COUNT(DISTINCT) cannot ride a window
    # frame, so the standard formulation is a bounded range join of the
    # (tiny) day spine against per-day distinct activity — the join fans
    # each activity row to <= 7 spine days, then one distinct-count agg.
    e = t(spark, sf, "events")
    day = F.floor(PF.epoch_seconds("ts") / 86400).cast("long")
    activity = e.select(day.alias("day"), "user_id").distinct()
    days = activity.select("day").distinct()
    return (
        days.alias("d")
        .join(
            activity.alias("a"),
            (F.col("a.day") >= F.col("d.day") - 6) & (F.col("a.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("a.user_id").alias("wau"))
    )


@register(
    "events_type_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type, COUNT(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def events_type_transitions(spark, sf):
    # First-order event-sequence transitions (Markov counts): one window
    # pass per user ordered by (ts, event_id) then a hash agg — the basis
    # for funnel discovery and next-event prediction features.
    from pyspark.sql import Window as W

    e = t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_activity_streaks",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day FROM events
    ), grp AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
      FROM activity
    )
    SELECT user_id, COUNT(*) AS streak_len, min(day) AS streak_start
    FROM grp GROUP BY user_id, island
    """,
)
def events_activity_streaks(spark, sf):
    # Gaps-and-islands: consecutive-active-day streaks per user via the
    # day - row_number() constant-per-island trick — one window pass plus
    # one aggregation, the standard streak/retention building block.
    from pyspark.sql import Window as W

    e = t(spark, sf, "events")
    day = F.floor(PF.epoch_seconds("ts") / 86400).cast("long")
    activity = e.select("user_id", day.alias("day")).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    grp = activity.withColumn("island", F.col("day") - F.row_number().over(w))
    return grp.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len"), F.min("day").alias("streak_start")
    ).drop("island")


@register(
    "events_gap_fill",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             {PF.dsum_expr('value')} AS day_value
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM span
    )
    SELECT g.user_id, g.day,
           coalesce(d.n_events, 0) AS n_events,
           d.day_value AS day_value,
           last_value(d.day_value IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
           d.n_events IS NULL AS is_gap
    FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
    """,
)
def events_gap_fill(spark, sf):
    # Time-series gap fill + forward fill (densify): per user, build the
    # complete daily grid between first and last activity, left-join the
    # real daily aggregates, and carry the last observed value across
    # gaps with last(ignorenulls) — the standard resample/ffill shape
    # for dashboards and feature windows. Scale: one hash agg to daily
    # grain, a tiny per-user span table, sequence-explode (bounded by
    # the calendar span, NOT row count — rows-per-user stays constant as
    # the corpus grows since more data means more users, not longer
    # days), one keyed left join, one per-user ordered window. All
    # shuffles are on (user_id[, day]) — high-cardinality, unskewed.
    e = t(spark, sf, "events")
    day = F.floor(PF.epoch_seconds("ts") / 86400).cast("long")
    daily = e.groupBy("user_id", day.alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        PF.dsum("value").alias("day_value"),
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.col("n_events").isNull().alias("is_gap"),
        F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
        "day_value",
        F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
    ).select("user_id", "day", "n_events", "day_value", "filled_value", "is_gap")


@register(
    "events_scd2_history",
    oracle="""
    WITH obs AS (
      SELECT user_id, event_type AS status, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM events
    ), changes AS (
      SELECT user_id, status, sec AS valid_from, event_id
      FROM obs WHERE prev IS NULL OR prev <> status
    )
    SELECT user_id, status, valid_from,
           lead(valid_from) OVER w AS valid_to,
           CAST(row_number() OVER w AS BIGINT) AS version,
           lead(valid_from) OVER w IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
    """,
)
def events_scd2_history(spark, sf):
    # Slowly-changing-dimension type-2 history build: treat each event as
    # an observation of the user's current status (event_type), keep only
    # change points (lag differs), and close each version with the next
    # change's timestamp — (valid_from, valid_to, version, is_current)
    # per row, the warehouse-standard SCD2 shape that MERGE-based
    # dimension maintenance (operators/merge.py) consumes. Two window
    # passes over user_id ordered by (ts, event_id); rows-per-user is
    # bounded (events per user stays ~constant as the corpus grows), so
    # no skewed reducer at any scale.
    e = t(spark, sf, "events")
    w_obs = W.partitionBy("user_id").orderBy("ts", "event_id")
    obs = e.select(
        "user_id",
        F.col("event_type").alias("status"),
        "event_id",
        F.floor(PF.epoch_seconds("ts")).cast("long").alias("sec"),
        F.lag("event_type").over(w_obs).alias("prev"),
    )
    changes = obs.filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("status"))
    ).select("user_id", "status", F.col("sec").alias("valid_from"), "event_id")
    w = W.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "status",
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
        F.lead("valid_from").over(w).isNull().alias("is_current"),
    )


@register(
    "events_interval_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + CAST(floor(value) AS BIGINT) AS e
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN max(e) OVER wp IS NULL OR s > max(e) OVER wp
                  THEN 1 ELSE 0 END AS is_new
      FROM iv
      WINDOW wp AS (PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), islands AS (
      SELECT user_id, s, e,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM flagged
    ), merged AS (
      SELECT user_id, island, min(s) AS i0, max(e) AS i1,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(i1 - i0) AS BIGINT) AS covered_seconds,
           CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM merged GROUP BY user_id
    """,
)
def events_interval_coverage(spark, sf):
    # Interval union (gaps-and-islands over real intervals): each event
    # spans [ts, ts + floor(value) seconds]; overlapping/adjacent spans
    # per user merge into islands via the running-max-of-end trick, then
    # per-user coverage = sum of island lengths. The classic
    # uptime/occupancy/utilization operator. Two windows + two hash aggs,
    # all partitioned by user_id (high-cardinality, bounded rows-per-key);
    # integer-seconds arithmetic end to end for cross-engine parity.
    e = t(spark, sf, "events")
    sec = F.floor(PF.epoch_seconds("ts")).cast("long")
    iv = e.select(
        "user_id",
        "event_id",
        sec.alias("s"),
        (sec + F.floor("value").cast("long")).alias("e"),
    )
    wp = (
        W.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.when(
            F.max("e").over(wp).isNull() | (F.col("s") > F.max("e").over(wp)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_new"),
    )
    wr = (
        W.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("is_new").over(wr).alias("island")
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("i0"),
        F.max("e").alias("i1"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("i1") - F.col("i0")).cast("long").alias("covered_seconds"),
        F.sum("n_events").cast("long").alias("n_events"),
    )


@register(
    "agg_linear_regression",
    oracle=f"""
    WITH pts AS (
      SELECT event_type,
             (CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 3600 AS x,
             value AS y
      FROM events
    ), suff AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             {PF.dsum_expr('y')} AS sy,
             {PF.dsum_expr('y * y')} AS syy,
             {PF.dsum_expr('x * y')} AS sxy
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0)) * sx)
                 / n, 6) AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0), 6) AS r2
    FROM suff
    """,
)
def agg_linear_regression(spark, sf):
    # In-engine model fitting by sufficient statistics: closed-form
    # simple OLS (value ~ hour-of-day, per event_type) from one
    # aggregation pass — n, Σx, Σx², Σy, Σy², Σxy — then slope /
    # intercept / R² as pure arithmetic on the six numbers. The
    # map-side partial agg means model fitting costs ONE corpus scan
    # and shuffles six numbers per group at any scale — the pattern
    # that extends to multi-feature OLS via the normal equations (XᵀX
    # is just more sufficient statistics). Portability: x sums are
    # integer, y sums ride decimal(38,6), and both engines evaluate
    # the identical closed-form expression tree on the aggregated row.
    e = t(spark, sf, "events")
    sec = F.floor(PF.epoch_seconds("ts")).cast("long")
    pts = e.select(
        "event_type", (sec % 86400).alias("_sec_of_day"), "value"
    ).select(
        "event_type",
        F.expr("_sec_of_day div 3600").alias("x"),
        F.col("value").alias("y"),
    )
    suff = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        PF.dsum("y").alias("sy"),
        PF.dsum(F.col("y") * F.col("y")).alias("syy"),
        PF.dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    # nullif on the exact-integer denominators: a constant-x (or
    # constant-y) group yields NULL coefficients instead of an ANSI
    # DIVIDE_BY_ZERO abort, matching the DuckDB oracle's NULL row
    den = F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0)
    )
    r2den = F.nullif(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
        F.lit(0),
    )
    return suff.select(
        "event_type",
        "n",
        F.round(num / den, 6).alias("slope"),
        F.round((F.col("sy") - (num / den) * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round((num * num) / r2den, 6).alias("r2"),
    )


@register(
    "events_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), mad AS (
      SELECT e.event_type, m.med,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m ON m.event_type = e.event_type
      GROUP BY e.event_type, m.med
    )
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - m.med) / nullif(1.4826 * m.mad, 0.0), 4) AS robust_z
    FROM events e JOIN mad m ON m.event_type = e.event_type
    WHERE abs((e.value - m.med) / nullif(1.4826 * m.mad, 0.0)) > 3.5
    """,
)
def events_anomaly_mad(spark, sf):
    # Robust outlier detection per event_type: modified z-score on the
    # median absolute deviation (Iglewicz-Hoberg, |z*| > 3.5), immune to
    # the outliers themselves inflating the scale the way stddev does in
    # events_anomaly_zscore. Two grouped exact-median passes (the same
    # interpolated percentile both engines share; percentile_approx at
    # 100 TB) with the tiny per-type tables broadcast back — the corpus
    # itself never shuffles.
    e = t(spark, sf, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    j = e.join(F.broadcast(mad), "event_type")
    # nullif: a tie-heavy group with MAD == 0 yields NULL (filtered out,
    # as in the oracle) instead of an ANSI DIVIDE_BY_ZERO abort
    rz = (F.col("value") - F.col("med")) / F.nullif(
        F.lit(1.4826) * F.col("mad"), F.lit(0.0)
    )
    return j.filter(F.abs(rz) > 3.5).select(
        "event_id", "event_type", "value", F.round(rz, 4).alias("robust_z")
    )


def cusum_robust_stats(e):
    """Per-user robust CUSUM parameters in exact integers: doubled
    interpolated median (med2) and quadrupled MAD (mad4) of the
    cent-scaled values. Shared by the batch changepoint query and the
    streaming twin (streaming/windows.py cusum_user_stats), so the
    trained parameters can never drift between them."""
    a = e.select(
        "user_id", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    m = a.groupBy("user_id").agg(
        (F.expr("2 * percentile(cents, 0.5)")).cast("long").alias("med2")
    )
    return (
        a.join(m, "user_id")
        .select(
            "user_id",
            "med2",
            F.abs(F.lit(2) * F.col("cents") - F.col("med2")).alias("dev"),
        )
        .groupBy("user_id", "med2")
        .agg((F.expr("2 * percentile(dev, 0.5)")).cast("long").alias("mad4"))
    )


@register(
    "events_changepoint_cusum",
    oracle="""
    WITH RECURSIVE a AS (
      SELECT user_id, event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), m AS ( -- walk ordered by FULL-precision ts (matches Spark side)
      SELECT user_id, CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS med2
      FROM a GROUP BY user_id
    ), dv AS (
      SELECT a.user_id, a.event_id, a.rn,
             4 * a.cents - 2 * m.med2 AS d4,
             abs(2 * a.cents - m.med2) AS dev
      FROM a JOIN m USING (user_id)
    ), s AS (
      SELECT user_id, CAST(2 * quantile_cont(dev, 0.5) AS BIGINT) AS mad4
      FROM dv GROUP BY user_id
    ), walk(user_id, rn, s_val) AS (
      SELECT user_id, 0, CAST(0 AS BIGINT)
      FROM (SELECT DISTINCT user_id FROM dv)
      UNION ALL
      SELECT w.user_id, w.rn + 1,
             greatest(CAST(0 AS BIGINT), w.s_val + d.d4 - s.mad4)
      FROM walk w
      JOIN dv d ON d.user_id = w.user_id AND d.rn = w.rn + 1
      JOIN s ON s.user_id = w.user_id
    )
    SELECT w.user_id, d.event_id, w.s_val AS cusum4,
           8 * s.mad4 AS threshold4
    FROM walk w
    JOIN dv d ON d.user_id = w.user_id AND d.rn = w.rn
    JOIN s ON s.user_id = w.user_id
    WHERE w.s_val > 8 * s.mad4
    """,
)
def events_changepoint_cusum(spark, sf):
    # CUSUM changepoint/drift detection per user (Page 1954): the
    # one-sided cumulative sum S_i = max(0, S_{i-1} + dev_i - k) with
    # robust parameters k = MAD, alarm at h = 8*MAD around the user's
    # median. The recursion looks sequential, but it has the exact
    # closed form S_i = P_i - min(0, min_{j<=i} P_j) (P = prefix sum of
    # the increments), so the batch operator is PURE WINDOWS: one
    # running sum + one running min over (user_id, ts, event_id) — a
    # single sort-shuffle, zero Python, lint-safe bounded keys. The
    # streaming twin (streaming/windows.py) keeps the carried state
    # form with one bigint per user. ALL arithmetic is integer
    # (quarter-cent units; doubled interpolated medians are exact
    # integers), and the DuckDB oracle replays the ORIGINAL recursion
    # with a recursive CTE — two different algorithms hash-matching is
    # the proof of the closed form, not just of portability.
    e = t(spark, sf, "events")
    a = e.select(
        "user_id",
        "event_id",
        # FULL-precision micros for the walk order: the oracle orders by
        # ts, so a second-truncated key would diverge on same-second
        # events whose id order disagrees with sub-second ts order
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    stats = cusum_robust_stats(e)
    joined = a.join(stats, "user_id").select(
        "user_id",
        "event_id",
        "us",
        (F.lit(4) * F.col("cents") - F.lit(2) * F.col("med2")).alias("d4"),
        "mad4",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    p = joined.withColumn(
        "p", F.sum(F.col("d4") - F.col("mad4")).over(w)
    )
    s_col = F.col("p") - F.least(F.min("p").over(w), F.lit(0).cast("long"))
    return (
        p.withColumn("cusum4", s_col)
        .filter(F.col("cusum4") > 8 * F.col("mad4"))
        .select(
            "user_id",
            "event_id",
            "cusum4",
            (F.lit(8) * F.col("mad4")).alias("threshold4"),
        )
    )


@register(
    "events_seasonal_dow_index",
    oracle="""
    WITH base AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS dow,
             value
      FROM events
    ), by_dow AS (
      SELECT event_type, dow,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(COUNT(value) AS DOUBLE) AS dow_avg
      FROM base GROUP BY event_type, dow
    ), by_type AS (
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(COUNT(value) AS DOUBLE) AS type_avg
      FROM base GROUP BY event_type
    )
    SELECT d.event_type, d.dow, d.n_events,
           ROUND(d.dow_avg, 6) AS dow_avg,
           ROUND(d.dow_avg / t.type_avg, 6) AS seasonal_index
    FROM by_dow d JOIN by_type t ON t.event_type = d.event_type
    """,
)
def events_seasonal_dow_index(spark, sf):
    # Day-of-week seasonal decomposition per event type: the classic
    # multiplicative seasonal index (day-of-week mean over the series
    # mean), the first stage of any seasonality-aware anomaly detector
    # — events_anomaly_zscore flags deviations from a GLOBAL mean, this
    # learns that e.g. weekends simply run lower. dow is computed as
    # days-since-epoch mod 7 (0 = Thursday) because both engines agree
    # on that integer arithmetic, unlike their dayofweek() conventions
    # (Spark: 1 = Sunday; DuckDB: 0 = Sunday). Plan: two hash aggs over
    # one pass of the base projection and a broadcast join of the
    # (fixed-width: |types|) per-type means — the ratio is taken once
    # on the two final decimal-routed doubles, never row-wise.
    e = t(spark, sf, "events")
    base = e.select(
        "event_type",
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) % 7).alias("dow"),
        "value",
    )
    by_dow = base.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        PF.davg("value").alias("__dow_avg"),
    )
    by_type = base.groupBy("event_type").agg(PF.davg("value").alias("__type_avg"))
    return (
        by_dow.join(F.broadcast(by_type), "event_type")
        .select(
            "event_type",
            "dow",
            "n_events",
            F.round("__dow_avg", 6).alias("dow_avg"),
            F.round(F.col("__dow_avg") / F.col("__type_avg"), 6).alias(
                "seasonal_index"
            ),
        )
    )


@register(
    "events_psi_drift",
    oracle="""
    WITH base AS (
      SELECT event_type,
             CAST(least(floor(value / 50.0), 9) AS INTEGER) AS bucket,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_ref
      FROM events
    ), grid AS (
      SELECT t.event_type, g.bucket
      FROM (SELECT DISTINCT event_type FROM base) t
      CROSS JOIN (SELECT unnest(range(0, 10)) AS bucket) g
    ), counts AS (
      SELECT g.event_type, g.bucket,
             coalesce(SUM(CASE WHEN b.is_ref = 1 THEN 1 ELSE 0 END), 0) AS ref_n,
             coalesce(SUM(CASE WHEN b.is_ref = 0 THEN 1 ELSE 0 END), 0) AS cur_n
      FROM grid g
      LEFT JOIN base b ON b.event_type = g.event_type AND b.bucket = g.bucket
      GROUP BY g.event_type, g.bucket
    ), tot AS (
      SELECT event_type,
             SUM(ref_n) AS ref_total, SUM(cur_n) AS cur_total
      FROM counts GROUP BY event_type
    ), terms AS (
      SELECT c.event_type,
             CAST(round(
               (CAST(c.ref_n + 1 AS DOUBLE) / CAST(t.ref_total + 10 AS DOUBLE)
                - CAST(c.cur_n + 1 AS DOUBLE) / CAST(t.cur_total + 10 AS DOUBLE))
               * ln((CAST(c.ref_n + 1 AS DOUBLE) / CAST(t.ref_total + 10 AS DOUBLE))
                    / (CAST(c.cur_n + 1 AS DOUBLE) / CAST(t.cur_total + 10 AS DOUBLE))),
             6) AS DECIMAL(38,6)) AS term,
             t.ref_total, t.cur_total
      FROM counts c JOIN tot t ON t.event_type = c.event_type
    )
    SELECT event_type,
           CAST(MAX(ref_total) AS BIGINT) AS ref_total,
           CAST(MAX(cur_total) AS BIGINT) AS cur_total,
           CAST(SUM(term) AS DOUBLE) AS psi,
           CAST(SUM(term) AS DOUBLE) > 0.1 AS drifted
    FROM terms GROUP BY event_type
    """,
)
def events_psi_drift(spark, sf):
    # Population Stability Index per event type: the standard train/
    # serve distribution-drift gate (PSI = sum over buckets of
    # (p_i - q_i) * ln(p_i / q_i); > 0.1 = investigate, > 0.25 = act).
    # Reference window = Jan 1-15, current = Jan 16-30; value bucketed
    # into 10 fixed-width bins, add-one smoothing so empty bins
    # contribute finite terms. Each per-bucket log term follows the
    # repo's portable-log convention (round to 6 dp -> DECIMAL sum —
    # order-independent, same as the perplexity queries); the bin grid
    # is densified (types x 10) so both engines see identical zero
    # rows. Plan: one conditional-count agg over a single events pass,
    # a broadcast per-type total join, and a 10-row-per-type decimal
    # sum — nothing scales with anything but |types|.
    e = t(spark, sf, "events")
    base = e.select(
        "event_type",
        F.least(F.floor(F.col("value") / 50.0), F.lit(9)).cast("int").alias("bucket"),
        (F.col("ts") < F.lit("2024-01-16").cast("timestamp")).cast("int").alias("is_ref"),
    )
    counts = base.groupBy("event_type", "bucket").agg(
        F.sum("is_ref").alias("ref_n"),
        F.sum(F.lit(1) - F.col("is_ref")).alias("cur_n"),
    )
    grid = (
        base.select("event_type")
        .distinct()
        .crossJoin(spark.range(0, 10).select(F.col("id").cast("int").alias("bucket")))
    )
    dense = (
        grid.join(counts, ["event_type", "bucket"], "left")
        .fillna(0, subset=["ref_n", "cur_n"])
    )
    return psi_from_dense(dense)


def psi_from_dense(dense):
    """PSI summary per event_type from a DENSIFIED (event_type, bucket,
    ref_n, cur_n) frame — the shared math of the batch query above and
    the streaming monitor (streaming/ingest.py:stream_psi_monitor):
    add-one smoothing, 6dp-decimal log terms (order-independent sum),
    broadcast per-type totals. Returns (event_type, ref_total,
    cur_total, psi, drifted)."""
    tot = dense.groupBy("event_type").agg(
        F.sum("ref_n").alias("ref_total"), F.sum("cur_n").alias("cur_total")
    )
    p = (F.col("ref_n") + 1).cast("double") / (F.col("ref_total") + 10).cast("double")
    q = (F.col("cur_n") + 1).cast("double") / (F.col("cur_total") + 10).cast("double")
    terms = dense.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "ref_total",
        "cur_total",
        F.round((p - q) * F.log(p / q), 6).cast("decimal(38,6)").alias("term"),
    )
    psi = F.sum("term").cast("double")
    return terms.groupBy("event_type").agg(
        F.max("ref_total").cast("long").alias("ref_total"),
        F.max("cur_total").cast("long").alias("cur_total"),
        psi.alias("psi"),
        (psi > 0.1).alias("drifted"),
    )


@register(
    "events_ema_smooth",
    oracle="""
    WITH a AS (
      SELECT user_id, event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             ts
      FROM events
    ), win AS (
      SELECT user_id, event_id,
             list(cents) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS l
      FROM a
    )
    SELECT user_id, event_id,
           CAST(len(l) AS INTEGER) AS n_window,
           CAST(list_sum(list_transform(l,
             (x, i) -> x * ((1::BIGINT) << (19 - len(l) + i)))) AS BIGINT) AS ema_num,
           ((1::BIGINT) << 20) - ((1::BIGINT) << (20 - len(l))) AS ema_den,
           ROUND(CAST(list_sum(list_transform(l,
                   (x, i) -> x * ((1::BIGINT) << (19 - len(l) + i)))) AS DOUBLE)
                 / CAST(((1::BIGINT) << 20) - ((1::BIGINT) << (20 - len(l)))
                   AS DOUBLE) / 100.0, 6) AS ema
    FROM win
    """,
)
def events_ema_smooth(spark, sf):
    # Exponentially-weighted moving average (half-life = 1 event,
    # alpha = 1/2) per user — the classic smoother whose recursion
    # S_i = (x_i + S_{i-1}) / 2 looks sequential, made EXACT and
    # portable by truncating to the last 20 events and clearing
    # denominators: weights 2^19, 2^18, ... are exact INTEGERS, so
    # ema = sum(x_j * 2^(19-age)) / (2^20 - 2^(20-m)) is a ratio of two
    # longs both engines compute bit-identically (terms beyond 20 steps
    # carry weight < 2^-20 of the newest — beneath the 6 dp the repo
    # rounds to anyway). The same closed-form-over-a-window trick as
    # CUSUM, here with POSITIONAL weights via an indexed lambda over
    # the frame's collect_list. Plan: one sort-shuffle per-user window
    # with a bounded 20-row frame, then in-row integer arithmetic —
    # lint-safe (user_id key grows with data) and zero Python.
    e = t(spark, sf, "events")
    a = e.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-19, W.currentRow)
    )
    win = a.select(
        "user_id", "event_id", F.collect_list("cents").over(w).alias("l")
    )
    num = F.expr(
        "aggregate(transform(l, (x, i) -> x * shiftleft(1L, 20 - size(l) + i)), "
        "0L, (acc, x) -> acc + x)"
    )
    den = F.expr("shiftleft(1L, 20) - shiftleft(1L, 20 - size(l))")
    return win.select(
        "user_id",
        "event_id",
        F.size("l").alias("n_window"),
        num.alias("ema_num"),
        den.alias("ema_den"),
        F.round(num.cast("double") / den.cast("double") / 100.0, 6).alias("ema"),
    )


@register(
    "events_path_topk",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), first3 AS (
      SELECT user_id,
             max(CASE WHEN rn = 1 THEN event_type END) AS e1,
             max(CASE WHEN rn = 2 THEN event_type END) AS e2,
             max(CASE WHEN rn = 3 THEN event_type END) AS e3
      FROM seq WHERE rn <= 3 GROUP BY user_id
      HAVING COUNT(*) = 3
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM first3 GROUP BY e1, e2, e3
    """,
)
def events_path_topk(spark, sf):
    # Path mining: the distribution of each user's FIRST THREE event
    # types in time order — the onboarding-flow analysis behind funnel
    # discovery. One per-user window (key grows with data — lint-safe),
    # then two hash aggs; path cardinality is |event_type|^3, so the
    # final agg is tiny and map-side partial absorbs the rest.
    e = t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    first3 = (
        seq.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias("e1"),
            F.max(F.when(F.col("rn") == 2, F.col("event_type"))).alias("e2"),
            F.max(F.when(F.col("rn") == 3, F.col("event_type"))).alias("e3"),
            F.count(F.lit(1)).alias("k"),
        )
        .filter(F.col("k") == 3)
    )
    return first3.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    ).select(
        F.concat_ws(">", "e1", "e2", "e3").alias("path"), "n_users"
    )


@register(
    "events_ab_test_ztest",
    oracle=f"""
    WITH u AS (
      SELECT user_id, {PF.md5_mod_sql('CAST(user_id AS VARCHAR)', 2)} AS variant,
             {PF.dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END")} AS revenue
      FROM events GROUP BY user_id
    ), s AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
             {PF.dsum_expr('revenue')} AS sx,
             {PF.dsum_expr('revenue * revenue')} AS sxx
      FROM u GROUP BY variant
    ), w AS (
      SELECT max(CASE WHEN variant = 0 THEN n END) AS n_a,
             max(CASE WHEN variant = 1 THEN n END) AS n_b,
             max(CASE WHEN variant = 0 THEN sx END) AS sx_a,
             max(CASE WHEN variant = 1 THEN sx END) AS sx_b,
             max(CASE WHEN variant = 0 THEN sxx END) AS sxx_a,
             max(CASE WHEN variant = 1 THEN sxx END) AS sxx_b
      FROM s
    ), m AS (
      SELECT n_a, n_b,
             sx_a / CAST(n_a AS DOUBLE) AS mean_a,
             sx_b / CAST(n_b AS DOUBLE) AS mean_b,
             (sxx_a - sx_a * sx_a / CAST(n_a AS DOUBLE)) / CAST(nullif(n_a - 1, 0) AS DOUBLE) AS var_a,
             (sxx_b - sx_b * sx_b / CAST(n_b AS DOUBLE)) / CAST(nullif(n_b - 1, 0) AS DOUBLE) AS var_b
      FROM w
    )
    SELECT n_a, n_b, round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
           round(var_a, 6) AS var_a, round(var_b, 6) AS var_b,
           round((mean_a - mean_b)
                 / nullif(sqrt(var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE)), 0.0), 6) AS z,
           abs((mean_a - mean_b)
               / nullif(sqrt(var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE)), 0.0)) > 1.959964 AS significant
    FROM m
    """,
)
def events_ab_test_ztest(spark, sf):
    # Welch z-test on per-user purchase revenue across a deterministic
    # 50/50 md5 user split — the experiment-analysis primitive for
    # online A/B tests (a continuous metric: a proportion test
    # degenerates here because virtually every synthetic user purchases
    # at least once). Plan: per-user conditional decimal sum, one
    # two-row hash agg of (n, sum, sum-of-squares) sufficient stats, a
    # single-row pivot, then pure scalar math evaluated with the SAME
    # expression tree on both engines (module float rule) so the
    # rounded statistics hash-match. Scale: two map-side-partial hash
    # aggs, no window, no shuffle wider than the user key; nullif
    # guards every degenerate denominator (ANSI mode).
    e = t(spark, sf, "events")
    u = e.groupBy("user_id").agg(
        PF.dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("revenue")
    ).select(
        F.expr(PF.md5_mod("cast(user_id as string)", 2)).alias("variant"),
        "revenue",
    )
    s = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        PF.dsum("revenue").alias("sx"),
        PF.dsum(F.col("revenue") * F.col("revenue")).alias("sxx"),
    )
    w = s.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 0, F.col("sx"))).alias("sx_a"),
        F.max(F.when(F.col("variant") == 1, F.col("sx"))).alias("sx_b"),
        F.max(F.when(F.col("variant") == 0, F.col("sxx"))).alias("sxx_a"),
        F.max(F.when(F.col("variant") == 1, F.col("sxx"))).alias("sxx_b"),
    )
    na_d = F.col("n_a").cast("double")
    nb_d = F.col("n_b").cast("double")
    m = w.select(
        "n_a",
        "n_b",
        (F.col("sx_a") / na_d).alias("mean_a"),
        (F.col("sx_b") / nb_d).alias("mean_b"),
        (
            (F.col("sxx_a") - F.col("sx_a") * F.col("sx_a") / na_d)
            / F.nullif(F.col("n_a") - 1, F.lit(0)).cast("double")
        ).alias("var_a"),
        (
            (F.col("sxx_b") - F.col("sx_b") * F.col("sx_b") / nb_d)
            / F.nullif(F.col("n_b") - 1, F.lit(0)).cast("double")
        ).alias("var_b"),
    )
    se = F.nullif(
        F.sqrt(
            F.col("var_a") / F.col("n_a").cast("double")
            + F.col("var_b") / F.col("n_b").cast("double")
        ),
        F.lit(0.0),
    )
    z = (F.col("mean_a") - F.col("mean_b")) / se
    return m.select(
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("var_a", 6).alias("var_a"),
        F.round("var_b", 6).alias("var_b"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > 1.959964).alias("significant"),
    )


def _rfm_thr_sql(src: str, col: str) -> str:
    """Brute-force discrete-quantile CTE chain for one RFM metric: the
    smallest value whose inclusive <=-count reaches ceil(p*N) — the
    O(d^2) distinct-value self-join replays what the Spark side computes
    with sharded_prefix_sum (two different algorithms, one answer)."""
    return f"""
    {col}c AS (SELECT {col} AS v, CAST(COUNT(*) AS BIGINT) AS c FROM {src} GROUP BY {col}),
    {col}cum AS (SELECT a.v, CAST(SUM(b.c) AS BIGINT) AS cle
                 FROM {col}c a JOIN {col}c b ON b.v <= a.v GROUP BY a.v),
    {col}thr AS (SELECT
        min(CASE WHEN cle >= CAST(ceil(0.25 * nu) AS BIGINT) THEN v END) AS {col}25,
        min(CASE WHEN cle >= CAST(ceil(0.50 * nu) AS BIGINT) THEN v END) AS {col}50,
        min(CASE WHEN cle >= CAST(ceil(0.75 * nu) AS BIGINT) THEN v END) AS {col}75
      FROM {col}cum CROSS JOIN n)"""


@register(
    "events_rfm_segments",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             max(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS rday,
             CAST(COUNT(*) AS BIGINT) AS freq,
             {PF.dsum_expr('value')} AS mon
      FROM events GROUP BY user_id
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM u),
    {_rfm_thr_sql('u', 'rday')},
    {_rfm_thr_sql('u', 'freq')},
    {_rfm_thr_sql('u', 'mon')},
    scored AS (
      SELECT u.user_id, u.rday, u.freq, u.mon,
             1 + (CASE WHEN u.rday > rday25 THEN 1 ELSE 0 END)
               + (CASE WHEN u.rday > rday50 THEN 1 ELSE 0 END)
               + (CASE WHEN u.rday > rday75 THEN 1 ELSE 0 END) AS r_score,
             1 + (CASE WHEN u.freq > freq25 THEN 1 ELSE 0 END)
               + (CASE WHEN u.freq > freq50 THEN 1 ELSE 0 END)
               + (CASE WHEN u.freq > freq75 THEN 1 ELSE 0 END) AS f_score,
             1 + (CASE WHEN u.mon > mon25 THEN 1 ELSE 0 END)
               + (CASE WHEN u.mon > mon50 THEN 1 ELSE 0 END)
               + (CASE WHEN u.mon > mon75 THEN 1 ELSE 0 END) AS m_score
      FROM u CROSS JOIN rdaythr CROSS JOIN freqthr CROSS JOIN monthr
    )
    SELECT user_id, rday AS recency_day, freq, round(mon, 6) AS monetary,
           r_score, f_score, m_score,
           r_score * 100 + f_score * 10 + m_score AS rfm_code,
           CASE WHEN r_score = 4 AND f_score >= 3 AND m_score >= 3 THEN 'champion'
                WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                WHEN r_score >= 3 AND f_score <= 2 THEN 'fresh'
                ELSE 'regular' END AS segment
    FROM scored
    """,
)
def events_rfm_segments(spark, sf):
    # RFM (recency / frequency / monetary) quartile segmentation — the
    # classic customer-value warehouse shape. Quartile thresholds are
    # DISCRETE (smallest value whose inclusive rank count reaches
    # ceil(p*N)): pure integer logic, so both engines agree bit-for-bit
    # where interpolated percentiles could drift in the last ulp.
    # Scale: the naive form needs a global cumulative rank (an
    # unpartitioned window — the lint-forbidden scale killer); instead
    # each metric's distinct-value count table goes through
    # operators/prefix.sharded_prefix_sum (two-pass: range-partition +
    # per-shard offsets), the same audited machinery as
    # sample_token_budget. Thresholds are three 1-row broadcasts back
    # onto the per-user frame — the user table itself is never globally
    # sorted. The oracle replays the thresholds as an O(d^2)
    # distinct-value self-join: different algorithm, same answer.
    from dataingestionplayground_spark.operators.prefix import sharded_prefix_sum

    e = t(spark, sf, "events")
    day = F.floor(PF.epoch_seconds("ts") / 86400).cast("long")
    u = e.groupBy("user_id").agg(
        F.max(day).alias("rday"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        PF.dsum("value").alias("mon"),
    )
    u = u.localCheckpoint(eager=True)  # three threshold scans + final join
    n = u.agg(F.count(F.lit(1)).cast("long").alias("nu"))

    def thresholds(col: str):
        cnts = u.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("c"))
        cum = sharded_prefix_sum(cnts, [(col, True)], "c", "before")
        cle = (F.col("before") + F.col("c")).alias("cle")
        return (
            cum.select(F.col(col).alias("v"), cle)
            .crossJoin(F.broadcast(n))
            .agg(
                *[
                    F.min(
                        F.when(
                            F.col("cle") >= F.ceil(F.lit(p) * F.col("nu")),
                            F.col("v"),
                        )
                    ).alias(f"{col}{int(p * 100)}")
                    for p in (0.25, 0.50, 0.75)
                ]
            )
        )

    scored = (
        u.crossJoin(F.broadcast(thresholds("rday")))
        .crossJoin(F.broadcast(thresholds("freq")))
        .crossJoin(F.broadcast(thresholds("mon")))
    )

    def score(col: str):
        return (
            F.lit(1)
            + (F.col(col) > F.col(f"{col}25")).cast("int")
            + (F.col(col) > F.col(f"{col}50")).cast("int")
            + (F.col(col) > F.col(f"{col}75")).cast("int")
        )

    scored = scored.select(
        "user_id",
        F.col("rday").alias("recency_day"),
        "freq",
        F.round("mon", 6).alias("monetary"),
        score("rday").alias("r_score"),
        score("freq").alias("f_score"),
        score("mon").alias("m_score"),
    )
    return scored.select(
        "*",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).alias(
            "rfm_code"
        ),
        F.when(
            (F.col("r_score") == 4) & (F.col("f_score") >= 3) & (F.col("m_score") >= 3),
            "champion",
        )
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 3), "at_risk")
        .when((F.col("r_score") >= 3) & (F.col("f_score") <= 2), "fresh")
        .otherwise("regular")
        .alias("segment"),
    )


@register(
    "events_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             COUNT(*) AS cnt
      FROM events GROUP BY event_type, day
    ), bounds AS (
      SELECT min(day) AS lo, max(day) AS hi FROM daily
    ), spine AS (
      SELECT t.event_type, g.day
      FROM (SELECT DISTINCT event_type FROM daily) t
      CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                                (SELECT hi FROM bounds))) AS day) g
    ), series AS (
      SELECT s.event_type, s.day, CAST(coalesce(d.cnt, 0) AS BIGINT) AS cnt
      FROM spine s LEFT JOIN daily d
        ON d.event_type = s.event_type AND d.day = s.day
    ), mean AS (
      SELECT event_type,
             CAST(SUM(CAST(cnt AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS mu,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM series GROUP BY event_type
    ), dev AS (
      SELECT s.event_type, s.day, CAST(s.cnt AS DOUBLE) - m.mu AS dv,
             m.n_days
      FROM series s JOIN mean m ON m.event_type = s.event_type
    ), denom AS (
      SELECT event_type,
             CAST(SUM(CAST(round(dv * dv, 6) AS DECIMAL(38,6))) AS DOUBLE) AS ss,
             MAX(n_days) AS n_days
      FROM dev GROUP BY event_type
    ), num AS (
      SELECT a.event_type, l.lg,
             CAST(SUM(CAST(round(a.dv * b.dv, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sp
      FROM dev a
      CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS lg) l
      JOIN dev b ON b.event_type = a.event_type AND b.day = a.day - l.lg
      GROUP BY a.event_type, l.lg
    )
    SELECT n.event_type, CAST(n.lg AS INTEGER) AS lag, d.n_days,
           round(n.sp / d.ss, 6) AS acf
    FROM num n JOIN denom d ON d.event_type = n.event_type
    """,
)
def events_autocorrelation(spark, sf):
    # Per-type autocorrelation of the DAILY event-count series at lags
    # 1..7 — the standard seasonality/trend detector (a weekly cycle
    # shows as a lag-7 peak) that complements events_seasonal_dow_index
    # (which assumes the period; ACF discovers it). The series is
    # gap-filled with zero-count days over the global day span so a
    # missing day damps correlation instead of silently splicing the
    # series. Plan: ONE corpus-sized hash agg to (type, day, cnt);
    # everything after runs on |types| x |days| rows — spine crossjoin,
    # broadcast per-type means, and a (type, day-lag) equi-join for the
    # 7 numerators. Portability: mean = exact decimal sum / count; the
    # per-term products are rounded to 6 dp and summed as DECIMAL
    # (order-independent); the final acf is ONE division of two
    # settled doubles (the repo's ratio rule).
    e = t(spark, sf, "events")
    daily = e.select(
        "event_type",
        F.floor(PF.epoch_seconds("ts") / 86400).cast("long").alias("day"),
    ).groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("cnt"))
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (
        daily.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    series = (
        spine.join(daily, ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"))
    )
    mean = series.groupBy("event_type").agg(
        (PF.dsum(F.col("cnt").cast("double")) / F.count(F.lit(1)).cast("double")).alias("mu"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    dev = series.join(F.broadcast(mean), "event_type").select(
        "event_type", "day", (F.col("cnt").cast("double") - F.col("mu")).alias("dv")
    )
    denom = dev.groupBy("event_type").agg(
        F.sum(F.round(F.col("dv") * F.col("dv"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("ss")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("long").alias("lag"))
    num = (
        dev.alias("a")
        .crossJoin(F.broadcast(lags))
        .join(
            dev.alias("b"),
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.day") == F.col("a.day") - F.col("lag")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), "lag")
        .agg(
            F.sum(F.round(F.col("a.dv") * F.col("b.dv"), 6).cast("decimal(38,6)"))
            .cast("double")
            .alias("sp")
        )
    )
    return (
        num.join(F.broadcast(denom), "event_type")
        .join(F.broadcast(mean.select("event_type", "n_days")), "event_type")
        .select(
            "event_type",
            F.col("lag").cast("int").alias("lag"),
            "n_days",
            F.round(F.col("sp") / F.col("ss"), 6).alias("acf"),
        )
    )


def _markov_oracle() -> str:
    # 3 UNROLLED renormalized power-iteration stages over the
    # row-stochastic transition matrix (the TextRank proof pattern):
    # each contribution pi(i) * P(i,j) is rounded to 6 dp and summed as
    # DECIMAL so both engines walk identical numbers; each stage then
    # renormalizes by the (settled-double) stage total and rounds.
    # every stage AS MATERIALIZED (r11 verdict hygiene nit 2 / the
    # repo's unrolled-CTE rule): DuckDB INLINES plain CTEs, and each
    # v{k} references raw{k} twice (main + renormalization scalar
    # subquery), so the un-materialized chain re-expanded the events
    # window scan ~2^k times — 18.1s of pure gate latency at sf0.01
    it = """
    , raw{k} AS MATERIALIZED (
      SELECT p.nxt AS state,
             CAST(SUM(CAST(round(v.pi * p.prob, 6) AS DECIMAL(38,6))) AS DOUBLE) AS r
      FROM pmat p JOIN v{p} v ON v.state = p.prev GROUP BY p.nxt
    ), v{k} AS MATERIALIZED (
      SELECT state, round(r / (SELECT CAST(SUM(CAST(round(r, 6) AS DECIMAL(38,6)))
                                       AS DOUBLE) FROM raw{k}), 6) AS pi
      FROM raw{k}
    )"""
    its = "".join(it.format(k=k, p=k - 1) for k in range(1, 4))
    return f"""
    WITH seq AS MATERIALIZED (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ), states AS MATERIALIZED (
      SELECT DISTINCT prev_type AS state FROM seq WHERE prev_type IS NOT NULL
    ), trans AS MATERIALIZED (
      SELECT s.prev_type AS prev, s.event_type AS nxt, COUNT(*) AS n
      FROM seq s JOIN states st ON st.state = s.event_type
      WHERE s.prev_type IS NOT NULL
      GROUP BY s.prev_type, s.event_type
    ), outs AS MATERIALIZED (
      SELECT prev, SUM(n) AS n_out FROM trans GROUP BY prev
    ), pmat AS MATERIALIZED (
      SELECT t.prev, t.nxt,
             round(CAST(t.n AS DOUBLE) / CAST(o.n_out AS DOUBLE), 6) AS prob
      FROM trans t JOIN outs o ON o.prev = t.prev
    ), nstates AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM states
    ), v0 AS MATERIALIZED (
      SELECT state, round(1.0 / (SELECT n FROM nstates), 6) AS pi FROM states
    ){its}
    SELECT v.state AS event_type, CAST(o.n_out AS BIGINT) AS n_out, v.pi
    FROM v3 v JOIN outs o ON o.prev = v.state
    """


@register("events_markov_stationary", oracle=_markov_oracle())
def events_markov_stationary(spark, sf):
    # Stationary distribution of the first-order event-type Markov
    # chain — where events_type_transitions stops at raw counts, this
    # row-normalizes them into a stochastic matrix (restricted to the
    # closed set of types that occur as a predecessor, so no mass
    # leaks to terminal-only states) and runs 3 renormalized power
    # iterations from the uniform vector: the long-run share of time a
    # user's session spends in each event type, the standard engagement
    # summary a funnel can't give. ITERATIVE, hash-matched by an
    # iteration-UNROLLED SQL oracle (the TextRank/BPE proof pattern):
    # per-contribution 6dp rounding + decimal sums keep both engines on
    # identical numbers. Scale shape: ONE per-user window pass over the
    # corpus (same shuffle as events_type_transitions); every iteration
    # joins |types|^2-bounded frames — broadcast-sized at any corpus.
    e = t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    states = (
        seq.filter(F.col("prev_type").isNotNull())
        .select(F.col("prev_type").alias("state"))
        .distinct()
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .join(F.broadcast(states), seq["event_type"] == states["state"])
        .groupBy(F.col("prev_type").alias("prev"), F.col("event_type").alias("nxt"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    outs = trans.groupBy("prev").agg(F.sum("n").alias("n_out"))
    pmat = trans.join(F.broadcast(outs), "prev").select(
        "prev",
        "nxt",
        F.round(F.col("n").cast("double") / F.col("n_out").cast("double"), 6).alias(
            "prob"
        ),
    )
    n_states = states.count()  # |event types|: bounded, never corpus-sized
    v = states.select("state", F.round(F.lit(1.0 / n_states), 6).alias("pi"))
    for _ in range(3):
        raw = (
            pmat.join(v.withColumnRenamed("state", "prev"), "prev")
            .select(
                F.col("nxt").alias("state"),
                F.round(F.col("pi") * F.col("prob"), 6)
                .cast("decimal(38,6)")
                .alias("c"),
            )
            .groupBy("state")
            .agg(F.sum("c").cast("double").alias("r"))
        )
        total = raw.agg(
            F.sum(F.round(F.col("r"), 6).cast("decimal(38,6)")).cast("double").alias("t")
        )
        v = raw.crossJoin(F.broadcast(total)).select(
            "state", F.round(F.col("r") / F.col("t"), 6).alias("pi")
        )
    return v.join(F.broadcast(outs), v["state"] == outs["prev"]).select(
        F.col("state").alias("event_type"), "n_out", "pi"
    )


@register(
    "events_bot_regularity",
    oracle="""
    WITH gaps AS (
      SELECT user_id, epoch(ts) - epoch(lag(ts) OVER w) AS gap
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), stats AS (
      SELECT user_id,
             CAST(COUNT(gap) AS BIGINT) AS n_gaps,
             CAST(SUM(CAST(round(gap, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s,
             CAST(SUM(CAST(round(gap * gap, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sq
      FROM gaps WHERE gap IS NOT NULL GROUP BY user_id
    ), cv AS (
      SELECT user_id, n_gaps, s / n_gaps AS mean_gap,
             sqrt(greatest(sq / n_gaps - (s / n_gaps) * (s / n_gaps), 0.0))
               / nullif(s / n_gaps, 0.0) AS cvg
      FROM stats WHERE n_gaps >= 4
    )
    SELECT user_id, n_gaps, round(mean_gap, 6) AS mean_gap,
           round(cvg, 6) AS cv_gap,
           coalesce(round(cvg, 6) < 0.3, TRUE) AS bot_like
    FROM cv
    """,
)
def events_bot_regularity(spark, sf):
    # Inter-arrival-time regularity per user: the coefficient of
    # variation of successive event gaps. Human activity is bursty
    # (cv ~ 1 for Poisson, > 1 with sessions); machine traffic fires on
    # a timer (cv -> 0) — the standard first-pass bot filter a
    # training-data pipeline runs before trusting behavioral signals.
    # Only users with >= 5 events (4 gaps) are scored; an all-identical
    # timestamp user (mean 0) is flagged via the NULL-cv coalesce. One
    # per-user sort-shuffle (same shape the skew bench proves out) +
    # one hash agg of decimal-exact (n, sum, sum-of-squares) — the
    # gap products are 6dp-rounded so partial aggregation stays
    # order-independent; cv is derived from SETTLED doubles row-wise
    # on a |users|-sized frame.
    e = t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (PF.epoch_seconds("ts") - PF.epoch_seconds(F.lag("ts").over(w))).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    stats = gaps.groupBy("user_id").agg(
        F.count("gap").cast("long").alias("n_gaps"),
        F.sum(F.round("gap", 6).cast("decimal(38,6)")).cast("double").alias("s"),
        F.sum(F.round(F.col("gap") * F.col("gap"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sq"),
    )
    mean = F.col("s") / F.col("n_gaps")
    cvg = F.sqrt(
        F.greatest(F.col("sq") / F.col("n_gaps") - mean * mean, F.lit(0.0))
    ) / F.nullif(mean, F.lit(0.0))
    return (
        stats.filter(F.col("n_gaps") >= 4)
        .select(
            "user_id",
            "n_gaps",
            F.round(mean, 6).alias("mean_gap"),
            F.round(cvg, 6).alias("cv_gap"),
            F.coalesce(F.round(cvg, 6) < 0.3, F.lit(True)).alias("bot_like"),
        )
    )


@register(
    "events_feature_pit_join",
    oracle="""
    WITH obs AS (
      SELECT user_id, event_type AS status, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM events
    ), changes AS (
      SELECT user_id, status, sec AS valid_from, event_id
      FROM obs WHERE prev IS NULL OR prev <> status
    ), dim AS (
      SELECT user_id, status, valid_from,
             CAST(row_number() OVER w AS BIGINT) AS version
      FROM changes
      WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
    ), probes AS (
      SELECT user_id, event_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.event_id, p.sec,
           round(p.value, 6) AS value, d.status, d.version
    FROM probes p
    LEFT JOIN dim d
      ON d.user_id = p.user_id
     AND d.valid_from <= p.sec
     AND d.version = (SELECT max(d2.version) FROM dim d2
                      WHERE d2.user_id = p.user_id AND d2.valid_from <= p.sec)
    """,
)
def events_feature_pit_join(spark, sf):
    # Point-in-time (feature-store) join: each 'purchase' probe event is
    # enriched with the SCD2 status version that was VALID AT THE
    # EVENT'S TIME — the temporal-correctness join that prevents
    # feature leakage in training-data assembly (joining tomorrow's
    # attribute onto today's example). The dimension is the same change
    # -point history events_scd2_history builds; the lookup is the
    # as-of operator (operators/asof.py union+window), NOT an
    # inequality range join — ONE sort-shuffle on (user, ts) total,
    # no BroadcastNestedLoop, no per-version fan-out, and the oracle's
    # O(dim^2) correlated-subquery formulation is the independent
    # algorithm the hash match proves equivalent. version ties on the
    # same second resolve to the LATEST version (max tie rule), exactly
    # like the scalar-subquery max.
    from dataingestionplayground_spark.operators.asof import asof_join

    e = t(spark, sf, "events")
    w_obs = W.partitionBy("user_id").orderBy("ts", "event_id")
    obs = e.select(
        "user_id",
        F.col("event_type").alias("status"),
        "event_id",
        F.floor(PF.epoch_seconds("ts")).cast("long").alias("sec"),
        F.lag("event_type").over(w_obs).alias("prev"),
    )
    changes = obs.filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("status"))
    ).select("user_id", "status", F.col("sec").alias("valid_from"), "event_id")
    w = W.partitionBy("user_id").orderBy("valid_from", "event_id")
    dim = changes.select(
        "user_id",
        "status",
        "valid_from",
        F.row_number().over(w).cast("long").alias("version"),
    )
    probes = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        "value",
        F.floor(PF.epoch_seconds("ts")).cast("long").alias("sec"),
    )
    joined = asof_join(
        probes,
        dim,
        on=["user_id"],
        left_ts="sec",
        right_ts="valid_from",
        value_cols=["status", "version"],
        direction="backward",
        tie_col="version",
    )
    return joined.select(
        "user_id",
        "event_id",
        "sec",
        F.round("value", 6).alias("value"),
        "status",
        "version",
    )


@register(
    "events_anomaly_seasonal_zscore",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type, value,
             CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                  AS BIGINT) AS dow
      FROM events
    ), seas AS (
      SELECT event_type, dow,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS dow_mean
      FROM base GROUP BY event_type, dow
    ), resid AS (
      SELECT b.event_id, b.event_type, b.dow, b.value,
             b.value - s.dow_mean AS r
      FROM base b JOIN seas s
        ON s.event_type = b.event_type AND s.dow = b.dow
    ), spread AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(r, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sr,
             CAST(SUM(CAST(round(r * r, 6) AS DECIMAL(38,6))) AS DOUBLE) AS srr
      FROM resid GROUP BY event_type
    )
    SELECT r.event_id, r.event_type, CAST(r.dow AS INTEGER) AS dow,
           round(r.value, 6) AS value,
           round(r.r / sqrt(greatest(s.srr / s.n - (s.sr / s.n) * (s.sr / s.n),
                                     1e-12)), 6) AS seasonal_z
    FROM resid r JOIN spread s ON s.event_type = r.event_type
    WHERE abs(round(r.r / sqrt(greatest(s.srr / s.n - (s.sr / s.n) * (s.sr / s.n),
                                        1e-12)), 6)) > 3.0
    """,
)
def events_anomaly_seasonal_zscore(spark, sf):
    # Seasonality-AWARE anomaly detection: where events_anomaly_zscore
    # flags deviations from a flat per-type center (so a normal weekend
    # lull reads as anomalous), this subtracts the (type, day-of-week)
    # mean FIRST and z-scores the residual against the type's residual
    # spread — the two-stage decomposition events_seasonal_dow_index
    # motivates, closed into a detector. dow = days-since-epoch mod 7
    # (the engine-agreement convention; both dayofweek() builtins
    # disagree on week start). Plan: two hash aggs over one base
    # projection (|types| x 7 and |types| rows, both broadcast back)
    # and a row-wise z — the corpus itself is never shuffled, same as
    # the MAD detector. Residual products are 6dp-rounded into decimal
    # sums; the z is derived from settled doubles with the identical
    # expression tree (floor variance at 1e-12 guards a constant type).
    e = t(spark, sf, "events")
    base = e.select(
        "event_id",
        "event_type",
        "value",
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) % 7)
        .cast("long")
        .alias("dow"),
    )
    seas = base.groupBy("event_type", "dow").agg(
        (PF.dsum("value") / F.count(F.lit(1)).cast("double")).alias("dow_mean")
    )
    resid = base.join(F.broadcast(seas), ["event_type", "dow"]).select(
        "event_id",
        "event_type",
        "dow",
        "value",
        (F.col("value") - F.col("dow_mean")).alias("r"),
    )
    spread = resid.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round("r", 6).cast("decimal(38,6)")).cast("double").alias("sr"),
        F.sum(F.round(F.col("r") * F.col("r"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("srr"),
    )
    mean_r = F.col("sr") / F.col("n")
    z = F.round(
        F.col("r")
        / F.sqrt(
            F.greatest(
                F.col("srr") / F.col("n") - mean_r * mean_r, F.lit(1e-12)
            )
        ),
        6,
    )
    return (
        resid.join(F.broadcast(spread), "event_type")
        .select(
            "event_id",
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            F.round("value", 6).alias("value"),
            z.alias("seasonal_z"),
        )
        .filter(F.abs(F.col("seasonal_z")) > 3.0)
    )


@register(
    "events_itemset_lift",
    oracle="""
    WITH ue AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), nu AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events
    ), m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t FROM ue GROUP BY event_type
    ), pairs AS (
      SELECT a.event_type AS item_a, b.event_type AS item_b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM ue a JOIN ue b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT p.item_a, p.item_b, p.n_ab,
           round(CAST(p.n_ab AS DOUBLE) / CAST(u.n_users AS DOUBLE), 6) AS support,
           round(CAST(p.n_ab AS DOUBLE) / CAST(ma.n_t AS DOUBLE), 6) AS confidence_a_b,
           round(CAST(p.n_ab AS DOUBLE) * CAST(u.n_users AS DOUBLE)
                 / (CAST(ma.n_t AS DOUBLE) * CAST(mb.n_t AS DOUBLE)), 6) AS lift
    FROM pairs p
    JOIN m ma ON ma.event_type = p.item_a
    JOIN m mb ON mb.event_type = p.item_b
    CROSS JOIN nu u
    WHERE CAST(p.n_ab AS DOUBLE) / CAST(u.n_users AS DOUBLE) >= 0.05
    """,
)
def events_itemset_lift(spark, sf):
    # 2-itemset association mining over per-user event-type baskets
    # (Agrawal-Srikant support/confidence plus lift): which behaviors
    # co-occur in the same users beyond what their individual
    # frequencies predict — the market-basket primitive behind
    # recommendation and segmentation features. Baskets are the
    # DISTINCT (user, type) pairs, so the pair join fans each user to
    # at most |types| choose 2 rows (in-row bounded — the self-join key
    # is user_id, high-cardinality and unskewed); margins and the user
    # count are |types|- and 1-row broadcasts; every ratio divides two
    # settled exact integers once. Min support 5% of users.
    e = t(spark, sf, "events")
    ue = e.select("user_id", "event_type").distinct()
    nu = e.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    m = ue.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_t"))
    pairs = (
        ue.alias("a")
        .join(
            ue.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("item_a"),
            F.col("b.event_type").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    ma = m.select(F.col("event_type").alias("item_a"), F.col("n_t").alias("n_a"))
    mb = m.select(F.col("event_type").alias("item_b"), F.col("n_t").alias("n_b"))
    out = (
        pairs.join(F.broadcast(ma), "item_a")
        .join(F.broadcast(mb), "item_b")
        .crossJoin(F.broadcast(nu))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double") / F.col("n_users").cast("double"), 6
            ).alias("support"),
            F.round(
                F.col("n_ab").cast("double") / F.col("n_a").cast("double"), 6
            ).alias("confidence_a_b"),
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n_users").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )
    return out.filter(
        F.col("n_ab").cast("double") / F.col("n_users").cast("double") >= 0.05
    )


@register(
    "events_xcorr_lead_lag",
    oracle="""
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, event_type
      FROM events
    ), x AS (
      SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM hourly
      WHERE event_type = 'click' GROUP BY h
    ), y AS (
      SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM hourly
      WHERE event_type = 'purchase' GROUP BY h
    ), bounds AS (
      SELECT MIN(h) AS lo, MAX(h) AS hi FROM hourly
    ), spine AS (
      SELECT unnest(generate_series(lo, hi)) AS h FROM bounds
    ), sx AS (
      SELECT s.h, coalesce(x.c, 0) AS v FROM spine s LEFT JOIN x ON x.h = s.h
    ), sy AS (
      SELECT s.h, coalesce(y.c, 0) AS v FROM spine s LEFT JOIN y ON y.h = s.h
    ), lags AS (
      SELECT unnest(generate_series(0, 6)) AS lag
    ), pairs AS (
      SELECT l.lag, sx.v AS xv, sy.v AS yv
      FROM lags l
      JOIN sx ON TRUE
      JOIN sy ON sy.h = sx.h + l.lag
    ), sums AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xv) AS BIGINT) AS s_x, CAST(SUM(yv) AS BIGINT) AS s_y,
             CAST(SUM(xv * yv) AS BIGINT) AS s_xy,
             CAST(SUM(xv * xv) AS BIGINT) AS s_xx,
             CAST(SUM(yv * yv) AS BIGINT) AS s_yy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INTEGER) AS lag_hours, n AS n_pairs,
           round((CAST(n AS DOUBLE) * CAST(s_xy AS DOUBLE)
                  - CAST(s_x AS DOUBLE) * CAST(s_y AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(s_xx AS DOUBLE)
                         - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(s_yy AS DOUBLE)
                           - CAST(s_y AS DOUBLE) * CAST(s_y AS DOUBLE))),
                 6) AS r
    FROM sums
    """,
)
def events_xcorr_lead_lag(spark, sf):
    # Lead-lag cross-correlation between two event streams: Pearson r of
    # hourly click counts vs purchase counts shifted 0..6 hours later —
    # the "does activity in X predict Y k hours out" diagnostic
    # (autocorrelation's two-series sibling, events_autocorrelation).
    # Shape: the corpus collapses to an HOURS-sized series in one hash
    # agg (time-range-bounded — ~9k rows/year regardless of corpus
    # size); the spine gap-fills missing hours to 0 via sequence() off
    # a one-row bounds agg; the 7-lag frame cross-joins as a literal
    # bounded side (plan-lint rule 3); moment sums are exact BIGINTs so
    # only the final double division needs the shared-rounding contract.
    e = t(spark, sf, "events")
    hourly = e.select(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
        "event_type",
    )
    x = (
        hourly.filter(F.col("event_type") == "click")
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    y = (
        hourly.filter(F.col("event_type") == "purchase")
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    spine = (
        hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("h"))
    )
    sx = spine.join(x, "h", "left").select(
        "h", F.coalesce("c", F.lit(0)).alias("xv")
    )
    sy = spine.join(y, "h", "left").select(
        F.col("h").alias("h2"), F.coalesce("c", F.lit(0)).alias("yv")
    )
    lags = spark.range(0, 7).select(F.col("id").cast("int").alias("lag_hours"))
    pairs = sx.crossJoin(F.broadcast(lags)).join(
        sy, F.col("h2") == F.col("h") + F.col("lag_hours")
    )
    sums = pairs.groupBy("lag_hours").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("xv").cast("long").alias("s_x"),
        F.sum("yv").cast("long").alias("s_y"),
        F.sum(F.col("xv") * F.col("yv")).cast("long").alias("s_xy"),
        F.sum(F.col("xv") * F.col("xv")).cast("long").alias("s_xx"),
        F.sum(F.col("yv") * F.col("yv")).cast("long").alias("s_yy"),
    )
    n = F.col("n_pairs").cast("double")
    sx_, sy_ = F.col("s_x").cast("double"), F.col("s_y").cast("double")
    sxy = F.col("s_xy").cast("double")
    sxx, syy = F.col("s_xx").cast("double"), F.col("s_yy").cast("double")
    r = (n * sxy - sx_ * sy_) / F.sqrt(
        (n * sxx - sx_ * sx_) * (n * syy - sy_ * sy_)
    )
    return sums.select("lag_hours", "n_pairs", F.round(r, 6).alias("r"))


@register(
    "events_survival_km",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(floor((epoch(MAX(ts)) - epoch(MIN(ts))) / 86400.0)
               AS BIGINT) AS dur,
             MAX(ts) AS last_ts
      FROM events GROUP BY user_id
    ), obs AS (
      SELECT MAX(ts) AS horizon FROM events
    ), labeled AS (
      SELECT u.dur,
             CASE WHEN epoch(o.horizon) - epoch(u.last_ts) > 604800.0
                  THEN 1 ELSE 0 END AS churned
      FROM per_user u CROSS JOIN obs o
    ), steps AS (
      SELECT dur, CAST(COUNT(*) AS BIGINT) AS n_ending,
             CAST(SUM(churned) AS BIGINT) AS d
      FROM labeled GROUP BY dur
    ), folded AS (
      SELECT s1.dur,
             CAST(SUM(CASE WHEN s2.dur >= s1.dur THEN s2.n_ending END)
               AS BIGINT) AS n_at_risk,
             CAST(MAX(CASE WHEN s2.dur = s1.dur THEN s2.d END)
               AS BIGINT) AS n_churned,
             CAST(SUM(CASE WHEN s2.dur <= s1.dur AND s2.d > 0
                        AND s2.d < (SELECT SUM(s3.n_ending) FROM steps s3
                                    WHERE s3.dur >= s2.dur)
                       THEN CAST(round(ln(1.0 - CAST(s2.d AS DOUBLE)
                             / CAST((SELECT SUM(s3.n_ending) FROM steps s3
                                     WHERE s3.dur >= s2.dur) AS DOUBLE)), 6)
                            AS DECIMAL(38,6)) END) AS DOUBLE) AS cum_ln,
             CAST(MAX(CASE WHEN s2.dur <= s1.dur AND s2.d > 0
                        AND s2.d = (SELECT SUM(s3.n_ending) FROM steps s3
                                    WHERE s3.dur >= s2.dur)
                       THEN 1 ELSE 0 END) AS INTEGER) AS died_out
      FROM steps s1 JOIN steps s2 ON TRUE
      GROUP BY s1.dur
    )
    SELECT dur AS duration_days, n_at_risk, n_churned,
           CASE WHEN died_out = 1 THEN 0.0
                ELSE round(exp(coalesce(cum_ln, 0.0)), 6) END AS survival
    FROM folded
    """,
)
def events_survival_km(spark, sf):
    # Kaplan-Meier survival curve over user lifetimes WITH censoring —
    # the retention analysis that events_cohort_retention approximates
    # without: duration = days between a user's first and last event;
    # a user still active in the final week of the observation window
    # is CENSORED (they leave the at-risk pool at their duration but
    # never count as a death — dropping them, or counting them as
    # churned, both bias S(t) low). S(t) = prod over death-steps u<=t
    # of (1 - d_u/n_u). Shape: the corpus collapses to per-user rows
    # (one keyed agg), then to a DURATIONS-sized step table (bounded
    # by the observation window in days, NOT by the corpus) — the
    # suffix at-risk counts and the cumulative log-product fold over a
    # conditioned steps x steps self-join (days^2, time-bounded), not
    # an unpartitioned window. Determinism: each ln step is rounded to
    # 6dp and summed as DECIMAL(38,6) (exact, associative — the
    # engines may visit steps in any order), exp'd once at the end; a
    # step where everyone at risk dies sends S to exactly 0 instead of
    # ln(0).
    e = t(spark, sf, "events")
    per_user = e.groupBy("user_id").agg(
        F.floor(
            (F.max(PF.epoch_seconds("ts")) - F.min(PF.epoch_seconds("ts")))
            / 86400.0
        )
        .cast("long")
        .alias("dur"),
        F.max(PF.epoch_seconds("ts")).alias("last_s"),
    )
    obs = e.agg(F.max(PF.epoch_seconds("ts")).alias("horizon_s"))
    labeled = per_user.crossJoin(F.broadcast(obs)).select(
        "dur",
        F.when(F.col("horizon_s") - F.col("last_s") > 604800.0, 1)
        .otherwise(0)
        .alias("churned"),
    )
    steps = labeled.groupBy("dur").agg(
        F.count(F.lit(1)).cast("long").alias("n_ending"),
        F.sum("churned").cast("long").alias("d"),
    )
    # suffix at-risk per step, via a second conditioned self-join
    # (computed once here, reused in the fold below as a plain column)
    risk = (
        steps.alias("a")
        .join(steps.alias("b"), F.col("b.dur") >= F.col("a.dur"))
        .groupBy(F.col("a.dur").alias("dur"))
        .agg(F.sum("b.n_ending").cast("long").alias("n_at_risk"))
    )
    sr = steps.join(risk, "dur").select(
        "dur",
        "n_ending",
        "d",
        "n_at_risk",
        F.when(
            (F.col("d") > 0) & (F.col("d") < F.col("n_at_risk")),
            F.round(
                F.log(
                    F.lit(1.0)
                    - F.col("d").cast("double") / F.col("n_at_risk").cast("double")
                ),
                6,
            ),
        ).alias("ln_step"),
        ((F.col("d") > 0) & (F.col("d") == F.col("n_at_risk")))
        .cast("int")
        .alias("full_death"),
    )
    folded = (
        sr.alias("s1")
        .join(sr.alias("s2"), F.col("s2.dur") <= F.col("s1.dur"))
        .groupBy(F.col("s1.dur").alias("duration_days"))
        .agg(
            F.max(F.col("s1.n_at_risk")).alias("n_at_risk"),
            F.max(F.when(F.col("s2.dur") == F.col("s1.dur"), F.col("s2.d")))
            .cast("long")
            .alias("n_churned"),
            F.sum(F.col("s2.ln_step").cast("decimal(38,6)"))
            .cast("double")
            .alias("cum_ln"),
            F.max("s2.full_death").cast("int").alias("died_out"),
        )
    )
    return folded.select(
        "duration_days",
        "n_at_risk",
        "n_churned",
        F.when(F.col("died_out") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.coalesce(F.col("cum_ln"), F.lit(0.0))), 6))
        .alias("survival"),
    )


@register(
    "events_conversion_lag",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS t_sig FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT e.user_id,
             CAST(epoch_us(min(e.ts)) - epoch_us(s.t_sig) AS BIGINT) AS lag_us
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.t_sig
      GROUP BY e.user_id, s.t_sig
    ), q AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
             quantile_cont(lag_us, [0.25, 0.5, 0.75, 0.9]) AS qs,
             CAST(SUM(CAST(lag_us AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_us
      FROM p
    ), ns AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_signup_users FROM s
    )
    SELECT ns.n_signup_users, q.n_converted,
           round(CAST(q.n_converted AS DOUBLE)
                 / CAST(ns.n_signup_users AS DOUBLE), 6) AS conversion_rate,
           round(qs[1] / 1e6, 6) AS p25_s,
           round(qs[2] / 1e6, 6) AS p50_s,
           round(qs[3] / 1e6, 6) AS p75_s,
           round(qs[4] / 1e6, 6) AS p90_s,
           round(avg_us / 1e6, 6) AS avg_lag_s
    FROM q CROSS JOIN ns
    """,
)
def events_conversion_lag(spark, sf):
    # Time-to-convert distribution (first signup -> first subsequent
    # purchase): the latency companion to events_funnel's count funnel —
    # product analytics reads the quartiles/p90 of this lag to size
    # activation campaigns. Lag is computed in EXACT integer
    # microseconds (unix_micros / epoch_us — sub-second timestamps never
    # truncate), percentiles are exact interpolated quantiles over those
    # integers, and the /1e6 to seconds is one correctly-rounded IEEE op
    # before the 6dp round — bit-identical cross-engine. Scale shape:
    # two event-type-filtered per-user aggs (the signup frame broadcasts
    # into the purchase scan, events_funnel's stage discipline), then
    # ONE single-row quantile agg over the per-user lags; at 100 TB the
    # per-user frame is |converted users|-sized, far below the event
    # count, and the exact quantile would swap to approx_percentile
    # with a documented tolerance.
    e = t(spark, sf, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_sig"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(s), "user_id")
        .filter(F.col("ts") > F.col("t_sig"))
        .groupBy("user_id", "t_sig")
        .agg(
            (
                F.unix_micros(F.min("ts")) - F.unix_micros(F.col("t_sig"))
            ).cast("long").alias("lag_us")
        )
    )
    q = p.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.expr("percentile(lag_us, array(0.25, 0.5, 0.75, 0.9))").alias("qs"),
        PF.davg("lag_us").alias("avg_us"),
    )
    ns = s.agg(F.count(F.lit(1)).cast("long").alias("n_signup_users"))
    return q.crossJoin(F.broadcast(ns)).select(
        "n_signup_users",
        "n_converted",
        F.round(
            F.col("n_converted").cast("double")
            / F.col("n_signup_users").cast("double"),
            6,
        ).alias("conversion_rate"),
        F.round(F.element_at("qs", 1) / F.lit(1e6), 6).alias("p25_s"),
        F.round(F.element_at("qs", 2) / F.lit(1e6), 6).alias("p50_s"),
        F.round(F.element_at("qs", 3) / F.lit(1e6), 6).alias("p75_s"),
        F.round(F.element_at("qs", 4) / F.lit(1e6), 6).alias("p90_s"),
        F.round(F.col("avg_us") / F.lit(1e6), 6).alias("avg_lag_s"),
    )


@register(
    "events_stickiness",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
      FROM events
    ), days AS (
      SELECT DISTINCT day FROM activity
    ), dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM activity GROUP BY day
    ), wau AS (
      SELECT g.day, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS wau
      FROM days g JOIN activity a ON a.day BETWEEN g.day - 6 AND g.day
      GROUP BY g.day
    )
    SELECT d.day, d.dau, w.wau,
           round(CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE), 6) AS stickiness
    FROM dau d JOIN wau w ON w.day = d.day
    """,
)
def events_stickiness(spark, sf):
    # DAU/WAU stickiness per day — the engagement ratio product
    # analytics tracks next to events_rolling_dau (which smooths DAU;
    # this grades how much of the weekly audience shows up daily).
    # WAU is an EXACT trailing-7-day distinct count with an EXACT 7x
    # fan-out: each (user, day) activity row EXPLODES into the seven
    # grid days it covers (sequence(day, day+6)) and the distinct agg
    # shuffles on the (gday) key — a plain equi-shuffle, no
    # broadcast-nested-loop band join whose predicate would evaluate
    # |activity| x |days| pairs (the post-ledger review fix: the first
    # shape used the band join and only its OUTPUT was <= 7x). The
    # grid column is then semi-filtered to days that actually occur so
    # the two sides keep identical day sets. At 100 TB the activity
    # frame is |users x days| (far below event count) and days are
    # calendar-bounded; beyond that the swap is the theta-sketch
    # rollup (events_heavy_hitters' family) with a documented error
    # bound. Day boundaries are integer epoch-day floors (the
    # events_cohort_retention convention) — no timezone arithmetic.
    e = t(spark, sf, "events")
    activity = e.select(
        "user_id",
        F.floor(PF.epoch_seconds("ts") / F.lit(86400)).cast("long").alias("day"),
    ).distinct()
    days = activity.select("day").distinct()
    dau = activity.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    covered = activity.select(
        "user_id",
        F.explode(F.expr("sequence(day, day + 6)")).alias("gday"),
    )
    wau = (
        covered.join(
            F.broadcast(days.select(F.col("day").alias("gday"))), "gday", "left_semi"
        )
        .groupBy("gday")
        .agg(F.count_distinct("user_id").cast("long").alias("wau"))
        .select(F.col("gday").alias("day"), "wau")
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.round(
            F.col("dau").cast("double") / F.col("wau").cast("double"), 6
        ).alias("stickiness"),
    )


@register(
    "events_new_vs_returning",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
      FROM events
    ), firsts AS (
      SELECT user_id, min(day) AS first_day FROM activity GROUP BY user_id
    )
    SELECT a.day,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN f.first_day = a.day THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(SUM(CASE WHEN f.first_day < a.day THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returning,
           round(CAST(SUM(CASE WHEN f.first_day = a.day THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS new_frac
    FROM activity a JOIN firsts f ON f.user_id = a.user_id
    GROUP BY a.day
    """,
)
def events_new_vs_returning(spark, sf):
    # New-vs-returning daily split — the growth-accounting companion to
    # events_stickiness (stickiness says how often the audience comes
    # back, this says how much of each day is acquisition vs
    # retention). Same |users x days| activity frame, one per-user min
    # agg joined back (first-day frame is |users|-sized — at 100 TB it
    # broadcasts or buckets on user_id), ONE day-keyed agg.
    e = t(spark, sf, "events")
    activity = e.select(
        "user_id",
        F.floor(PF.epoch_seconds("ts") / F.lit(86400)).cast("long").alias("day"),
    ).distinct()
    firsts = activity.groupBy("user_id").agg(F.min("day").alias("first_day"))
    new_flag = F.when(F.col("first_day") == F.col("day"), 1).otherwise(0)
    ret_flag = F.when(F.col("first_day") < F.col("day"), 1).otherwise(0)
    return (
        activity.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum(new_flag).cast("long").alias("n_new"),
            F.sum(ret_flag).cast("long").alias("n_returning"),
            F.round(
                F.sum(new_flag).cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("new_frac"),
        )
    )


@register(
    "events_session_stats",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END
               AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    ), per_session AS (
      SELECT user_id, session_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS dur_us
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           round(CAST(SUM(CAST(n_events AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS avg_events,
           round(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate,
           round(quantile_cont(dur_us, 0.5) / 1e6, 6) AS p50_dur_s,
           round(quantile_cont(dur_us, 0.9) / 1e6, 6) AS p90_dur_s,
           round(CAST(SUM(CAST(dur_us AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 1e6, 6) AS avg_dur_s
    FROM per_session
    """,
)
def events_session_stats(spark, sf):
    # Session-quality summary over the PRODUCTION sessionizer (same
    # operators.sessionize call as events_sessionize): session count,
    # mean events/session, bounce rate (1-event sessions), and the
    # p50/p90/mean duration — the table a funnel review opens with.
    # Durations are exact integer microseconds (epoch_us/unix_micros,
    # the events_conversion_lag rule) so quantiles interpolate over
    # integers identically cross-engine. Plan: the sessionizer's one
    # sort-shuffle, a (user, session)-keyed agg, then ONE single-row
    # stats agg with exact interpolated quantiles.
    from dataingestionplayground_spark.operators.sessionize import sessionize

    e = t(spark, sf, "events")
    sess = sessionize(e, "user_id", "ts", gap_seconds=1800)
    per = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
        .cast("long")
        .alias("dur_us"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.round(PF.davg("n_events"), 6).alias("avg_events"),
        F.round(
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("bounce_rate"),
        F.round(F.expr("percentile(dur_us, 0.5)") / F.lit(1e6), 6).alias("p50_dur_s"),
        F.round(F.expr("percentile(dur_us, 0.9)") / F.lit(1e6), 6).alias("p90_dur_s"),
        F.round(PF.davg("dur_us") / F.lit(1e6), 6).alias("avg_dur_s"),
    )


def _anomaly_consensus_oracle() -> str:
    # compose the three REGISTERED detectors; a full-outer vote join on
    # the (sparse) flagged sets
    from dataingestionplayground_spark.queries import REGISTRY as _R

    return f"""
    WITH z AS MATERIALIZED (
      SELECT event_id, 1 AS f_z FROM ({_R['events_anomaly_zscore'].oracle})
    ), m AS MATERIALIZED (
      SELECT event_id, 1 AS f_mad FROM ({_R['events_anomaly_mad'].oracle})
    ), s AS MATERIALIZED (
      SELECT event_id, 1 AS f_seasonal
      FROM ({_R['events_anomaly_seasonal_zscore'].oracle})
    ), votes AS (
      SELECT coalesce(z.event_id, m.event_id, s.event_id) AS event_id,
             coalesce(f_z, 0) AS f_z,
             coalesce(f_mad, 0) AS f_mad,
             coalesce(f_seasonal, 0) AS f_seasonal
      FROM z
      FULL OUTER JOIN m ON m.event_id = z.event_id
      FULL OUTER JOIN s ON s.event_id = coalesce(z.event_id, m.event_id)
    )
    SELECT e.event_id, e.event_type, round(e.value, 6) AS value,
           CAST(v.f_z AS INTEGER) AS f_z,
           CAST(v.f_mad AS INTEGER) AS f_mad,
           CAST(v.f_seasonal AS INTEGER) AS f_seasonal,
           CAST(v.f_z + v.f_mad + v.f_seasonal AS INTEGER) AS votes
    FROM votes v JOIN events e ON e.event_id = v.event_id
    WHERE v.f_z + v.f_mad + v.f_seasonal >= 2
    """


@register("events_anomaly_consensus", oracle=_anomaly_consensus_oracle())
def events_anomaly_consensus(spark, sf):
    # Detector-ENSEMBLE anomaly alerting: an event pages only when at
    # least two of the three production detectors agree (plain z-score,
    # MAD robust z, seasonality-adjusted z) — the standard
    # alert-on-consensus rule that suppresses each detector's
    # individual failure mode (z inflated by the outliers themselves,
    # MAD blind above tie-heavy medians, seasonal z needing stable
    # day-of-week structure). All three flag frames are the REGISTERED
    # queries' own outputs; outliers are sparse by construction
    # (|z|>2.5 / 3.5 / 3.0 tails), so the vote join runs on frames
    # orders of magnitude below the event count, then one event-keyed
    # join rehydrates type/value. At 100 TB the detectors' own plans
    # (per-type broadcast stats) carry the cost; the consensus layer
    # adds only flagged-set joins.
    from dataingestionplayground_spark.queries import REGISTRY as _R

    z = (
        _R["events_anomaly_zscore"].fn(spark, sf)
        .select("event_id", F.lit(1).alias("f_z"))
    )
    m = (
        _R["events_anomaly_mad"].fn(spark, sf)
        .select("event_id", F.lit(1).alias("f_mad"))
    )
    s = (
        _R["events_anomaly_seasonal_zscore"].fn(spark, sf)
        .select("event_id", F.lit(1).alias("f_seasonal"))
    )
    votes = (
        z.join(m, "event_id", "full")
        .join(s, "event_id", "full")
        .select(
            "event_id",
            F.coalesce("f_z", F.lit(0)).alias("f_z"),
            F.coalesce("f_mad", F.lit(0)).alias("f_mad"),
            F.coalesce("f_seasonal", F.lit(0)).alias("f_seasonal"),
        )
        .withColumn(
            "votes", F.col("f_z") + F.col("f_mad") + F.col("f_seasonal")
        )
        .filter(F.col("votes") >= 2)
    )
    e = t(spark, sf, "events").select("event_id", "event_type", "value")
    return e.join(F.broadcast(votes), "event_id").select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        F.col("f_z").cast("int").alias("f_z"),
        F.col("f_mad").cast("int").alias("f_mad"),
        F.col("f_seasonal").cast("int").alias("f_seasonal"),
        F.col("votes").cast("int").alias("votes"),
    )


@register(
    "events_seasonality_strength",
    oracle="""
    WITH base AS (
      SELECT event_type, value,
             CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                  AS BIGINT) AS dow
      FROM events
    ), seas AS (
      SELECT event_type, dow,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS dow_mean
      FROM base GROUP BY event_type, dow
    ), resid AS (
      SELECT b.event_type, b.value, b.value - s.dow_mean AS r
      FROM base b JOIN seas s
        ON s.event_type = b.event_type AND s.dow = b.dow
    ), stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(value, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sv,
             CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(38,6))) AS DOUBLE)
               AS svv,
             CAST(SUM(CAST(round(r * r, 6) AS DECIMAL(38,6))) AS DOUBLE) AS srr
      FROM resid GROUP BY event_type
    )
    SELECT event_type, n,
           round(svv / n - (sv / n) * (sv / n), 6) AS var_total,
           round(srr / n, 6) AS var_resid,
           round(1.0 - (srr / n)
                 / nullif(svv / n - (sv / n) * (sv / n), 0.0), 6)
             AS r2_seasonal
    FROM stats
    """,
)
def events_seasonality_strength(spark, sf):
    # HOW SEASONAL IS EACH METRIC: per event type, the fraction of
    # value variance explained by the (type, day-of-week) means —
    # R^2 of the same decomposition events_anomaly_seasonal_zscore
    # detects against, reported as the one scalar that decides whether
    # the seasonal detector (and dow-indexed forecasting) is worth its
    # extra pass over the plain z-score. Residual means are exactly
    # zero by construction (residuals against fitted group means), so
    # var_resid is srr/n directly. Portability: the seasonal_zscore
    # conventions — dow = epoch-days mod 7, per-term 6dp rounds before
    # DECIMAL sums, one fixed-order double evaluation, nullif guard
    # for a constant type. Plan: two hash aggs over one base
    # projection (|types| x 7 broadcast back), one |types|-row output.
    e = t(spark, sf, "events")
    base = e.select(
        "event_type",
        "value",
        (F.floor(PF.epoch_seconds(F.date_trunc("DAY", F.col("ts"))) / 86400) % 7)
        .cast("long")
        .alias("dow"),
    )
    seas = base.groupBy("event_type", "dow").agg(
        (
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dow_mean")
    )
    resid = base.join(F.broadcast(seas), ["event_type", "dow"]).select(
        "event_type", "value", (F.col("value") - F.col("dow_mean")).alias("r")
    )
    stats = resid.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round("value", 6).cast("decimal(38,6)")).cast("double").alias("sv"),
        F.sum(F.round(F.col("value") * F.col("value"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("svv"),
        F.sum(F.round(F.col("r") * F.col("r"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("srr"),
    )
    n = F.col("n").cast("double")
    var_total = F.col("svv") / n - (F.col("sv") / n) * (F.col("sv") / n)
    return stats.select(
        "event_type",
        "n",
        F.round(var_total, 6).alias("var_total"),
        F.round(F.col("srr") / n, 6).alias("var_resid"),
        F.round(
            F.lit(1.0) - (F.col("srr") / n) / F.nullif(var_total, F.lit(0.0)), 6
        ).alias("r2_seasonal"),
    )


@register(
    "events_kpi_daily",
    oracle="""
    WITH base AS (
      SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             user_id, event_type, value
      FROM events
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau,
           round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
             AS total_value,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           round(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS error_rate,
           round(CAST(COUNT(*) AS DOUBLE)
                 / CAST(COUNT(DISTINCT user_id) AS DOUBLE), 6)
             AS events_per_user
    FROM base GROUP BY day
    """,
)
def events_kpi_daily(spark, sf):
    # The daily KPI strip — events, DAU, decimal-exact value total,
    # purchases, error rate, events/user — the single table a
    # dashboard's top row reads, and the batch twin every streaming
    # rollup in this repo reconciles against (one day-keyed agg makes
    # it the cheapest nightly sanity join vs the incremental
    # maintainers). ONE hash agg on the natural day key; the distinct
    # user count plans as the standard two-phase expand; value sums
    # route through DECIMAL(38,6) (order-independent at any
    # parallelism).
    e = t(spark, sf, "events")
    base = e.select(
        F.floor(PF.epoch_seconds("ts") / F.lit(86400)).cast("long").alias("day"),
        "user_id",
        "event_type",
        "value",
    )
    n = F.count(F.lit(1))
    du = F.count_distinct("user_id")
    return base.groupBy("day").agg(
        n.cast("long").alias("n_events"),
        du.cast("long").alias("dau"),
        F.round(PF.dsum("value"), 6).alias("total_value"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
        F.round(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast(
                "double"
            )
            / n.cast("double"),
            6,
        ).alias("error_rate"),
        F.round(n.cast("double") / du.cast("double"), 6).alias("events_per_user"),
    )

"""Event-stream operators in batch form (SURVEY.md §2.10): tumbling /
sliding / session windows, JSON extraction, as-of joins against facts.

The reference is strictly batch (Program.cs:18-57); these are the engine
extensions over the driver's ``events`` table. Each has a Structured
Streaming twin in dataingestionplayground_spark.streaming.windows; batch
form is what the DuckDB oracle can verify.

Window buckets are exposed as epoch-second BIGINTs (portable across
engines and timezone-proof); ``floor(unix_seconds/width)`` matches
Spark's ``window()`` start boundaries for UTC-aligned widths.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dataingestionplayground_spark.functions.portable import dsum, dsum_expr
from dataingestionplayground_spark.operators.asof import asof_join
from dataingestionplayground_spark.operators.sessionize import sessionize
from dataingestionplayground_spark.queries import register
from dataingestionplayground_spark.session import load_table as t


@register(
    "events_tumbling_window",
    oracle=f"""
    SELECT CAST(floor(epoch(ts) / 600) AS BIGINT) * 600 AS window_start,
           event_type, COUNT(*) AS n_events, {dsum_expr('value')} AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark, sf):
    # 10-minute tumbling windows; bucket = epoch//600 (== window().start).
    e = t(spark, sf, "events")
    return (
        e.withColumn(
            "window_start", (F.floor(F.unix_timestamp("ts") / 600) * 600).cast("long")
        )
        .groupBy("window_start", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
    )


@register(
    "events_sliding_window",
    oracle=f"""
    WITH exploded AS (
      SELECT (CAST(floor(epoch(ts) / 300) AS BIGINT) - k) * 300 AS window_start,
             value
      FROM events CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k)
    )
    SELECT window_start, COUNT(*) AS n_events, {dsum_expr('value')} AS total_value
    FROM exploded GROUP BY 1
    """,
)
def events_sliding_window(spark, sf):
    # 10-minute windows sliding every 5: each event lands in 2 windows —
    # expressed as an explode over slide offsets (what window(ts,10m,5m)
    # compiles to), then a plain hash agg.
    e = t(spark, sf, "events")
    return (
        e.select(
            F.explode(F.expr("sequence(0, 1)")).alias("k"),
            F.unix_timestamp("ts").alias("sec"),
            "value",
        )
        .withColumn("window_start", ((F.floor(F.col("sec") / 300) - F.col("k")) * 300).cast("long"))
        .groupBy("window_start")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
    )


@register(
    "events_asof_join",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, o.o_orderkey,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT e.event_id, e.user_id, e.event_type, r.o_orderkey AS last_orderkey
    FROM events e LEFT JOIN (SELECT event_id, o_orderkey FROM ranked WHERE rn = 1) r
      ON r.event_id = e.event_id
    """,
)
def events_asof_join(spark, sf):
    # As-of join: each event gets the user's most recent order at event time
    # (union+window, one sort-shuffle — operators.asof.asof_join).
    e = t(spark, sf, "events").select("event_id", "user_id", "event_type", "ts")
    o = t(spark, sf, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    joined = asof_join(
        e,
        o,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["o_orderkey"],
        tie_col="o_orderkey",
    )
    return joined.select(
        "event_id", "user_id", "event_type", F.col("o_orderkey").alias("last_orderkey")
    )


@register(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark, sf):
    # Gap-based sessionization (30 min), one sort-shuffle (operators.sessionize).
    e = t(spark, sf, "events")
    sess = sessionize(e, "user_id", "ts", gap_seconds=1800)
    return sess.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n_events"))


@register(
    "events_map_functions",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events WHERE event_id % 50 = 0
    """,
)
def events_map_functions(spark, sf):
    # MapType surface: parse the JSON props into MAP<STRING,INT>, expose
    # map_keys / cardinality / element access (SURVEY §2.8 map_* row).
    # Key list is sorted + joined to a scalar string: map_keys order is
    # engine-dependent and the driver canonicalizer hashes scalars only.
    e = t(spark, sf, "events").filter(F.col("event_id") % 50 == 0)
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("prop_keys"),
        F.size(F.map_keys(m)).alias("n_keys"),
        m.getItem("k").alias("k_val"),
    )


@register(
    "events_multilevel_rollup",
    oracle=f"""
    SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400 AS day_start,
           event_type, COUNT(*) AS n_events, {dsum_expr('value')} AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_multilevel_rollup(spark, sf):
    # Continuous-aggregate / hypertable-rollup pattern: day-level stats
    # computed by RE-AGGREGATING 10-minute partials -> hourly -> daily,
    # not by rescanning raw events. Decimal partials are associative, so
    # the oracle's direct day aggregation matches bit-for-bit — the
    # property that makes multi-resolution rollup cascades trustworthy.
    e = t(spark, sf, "events")
    minute10 = (
        e.withColumn("b10", (F.floor(F.unix_timestamp("ts") / 600) * 600).cast("long"))
        .groupBy("b10", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("v"),  # stay decimal
        )
    )
    hourly = (
        minute10.withColumn("bh", (F.floor(F.col("b10") / 3600) * 3600).cast("long"))
        .groupBy("bh", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    )
    daily = (
        hourly.withColumn("day_start", (F.floor(F.col("bh") / 86400) * 86400).cast("long"))
        .groupBy("day_start", "event_type")
        .agg(F.sum("n").alias("n_events"), F.sum("v").cast("double").alias("total_value"))
    )
    return daily.select("day_start", "event_type", "n_events", "total_value")


@register(
    "events_attribution_windows",
    oracle="""
    WITH clicks AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS c_sec FROM events
      WHERE event_type = 'click'
    ), purch AS (
      SELECT event_id AS purchase_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS p_sec
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id,
           CAST(MIN(c.c_sec) AS BIGINT) AS first_touch_sec,
           CAST(MAX(c.c_sec) AS BIGINT) AS last_touch_sec,
           CAST(coalesce(SUM(CASE WHEN c.c_sec IS NOT NULL THEN 1 END), 0) AS BIGINT)
             AS n_touches
    FROM purch p LEFT JOIN clicks c
      ON c.user_id = p.user_id
     AND c.c_sec <= p.p_sec AND c.c_sec >= p.p_sec - 86400
    GROUP BY p.purchase_id, p.user_id
    """,
)
def events_attribution_windows(spark, sf):
    # Marketing attribution: for every purchase, the first- and
    # last-touch click of the same user inside a 24 h lookback, plus the
    # touch count (first/last/linear attribution all derive from these).
    # Per-user equi-join with a time-range residual — the shuffle is on
    # user_id, bounded by per-user activity; at heavier per-user volume
    # the as-of join (operators/asof.py) is the last-touch fast path.
    e = t(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_timestamp("ts").cast("long").alias("c_sec")
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("p_sec"),
    )
    j = purch.join(
        clicks,
        (purch.user_id == clicks.user_id)
        & (clicks.c_sec <= purch.p_sec)
        & (clicks.c_sec >= purch.p_sec - 86400),
        "left",
    ).select(purch.purchase_id, purch.user_id, clicks.c_sec)
    return j.groupBy("purchase_id", "user_id").agg(
        F.min("c_sec").cast("long").alias("first_touch_sec"),
        F.max("c_sec").cast("long").alias("last_touch_sec"),
        F.coalesce(
            F.sum(F.when(F.col("c_sec").isNotNull(), 1)), F.lit(0)
        ).cast("long").alias("n_touches"),
    )


@register(
    "events_rate_limit_burst",
    oracle="""
    WITH counted AS (
      SELECT user_id, event_id, event_type,
             CAST(count(*) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts)
               RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_6h
      FROM events
    )
    SELECT user_id, event_id, event_type, n_6h
    FROM counted WHERE n_6h >= 4
    """,
)
def events_rate_limit_burst(spark, sf):
    # Burst / rate-limit detection: for every event, how many events the
    # same user produced in the trailing 6 hours (event-time RANGE
    # frame over epoch micros — a TIME-valued window, not a row count,
    # so quiet users and bursts frame differently), flagging rows past
    # the threshold. The abuse-detection primitive behind API rate
    # limiting and bot flagging. Per-user partitioning, one
    # sort-shuffle; the RANGE frame is bounded by the 6-hour horizon
    # regardless of corpus size. Ties on the frame edge are INCLUDED by
    # RANGE semantics identically in both engines.
    e = t(spark, sf, "events")
    a = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-21_600_000_000, W.currentRow)
    )
    return (
        a.withColumn("n_6h", F.count(F.lit(1)).over(w).cast("long"))
        .filter(F.col("n_6h") >= 4)
        .select("user_id", "event_id", "event_type", "n_6h")
    )


@register(
    "events_asof_forward_tolerance",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), buys AS (
      SELECT event_id AS purchase_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ), ranked AS (
      SELECT c.event_id, b.purchase_id,
             epoch_us(b.ts) - epoch_us(c.ts) AS gap_us,
             row_number() OVER (PARTITION BY c.event_id
                                ORDER BY b.ts ASC, b.purchase_id ASC) AS rn
      FROM clicks c JOIN buys b
        ON b.user_id = c.user_id AND b.ts >= c.ts
    ), nearest AS (
      SELECT event_id, purchase_id, gap_us FROM ranked WHERE rn = 1
    )
    SELECT c.event_id, c.user_id,
           CASE WHEN n.gap_us <= 1800000000 THEN n.purchase_id END AS purchase_id,
           CASE WHEN n.gap_us <= 1800000000 THEN n.gap_us END AS gap_us,
           coalesce(n.gap_us <= 1800000000, FALSE) AS converted
    FROM clicks c LEFT JOIN nearest n ON n.event_id = c.event_id
    """,
)
def events_asof_forward_tolerance(spark, sf):
    # FORWARD as-of join with a tolerance horizon: each click gets the
    # same user's NEXT purchase, but only if it lands within 30 minutes
    # — the time-to-convert / attribution primitive (pandas
    # merge_asof(direction='forward', tolerance=...) at cluster scale).
    # Same union+window single-sort-shuffle operator as the backward
    # form (operators/asof.py:19, direction='forward'); the tolerance
    # is a POST-filter on the matched gap, so it adds zero shuffles —
    # out-of-horizon matches null out rather than falling back to a
    # later row (merge_asof semantics). Gap is integer epoch-micros:
    # exact on both engines, no float boundary risk at the horizon.
    e = t(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    j = asof_join(
        clicks,
        buys,
        on=["user_id"],
        left_ts="ts",
        right_ts="p_ts",
        value_cols=["purchase_id", "p_ts"],
        direction="forward",
        tie_col="purchase_id",
    )
    gap = F.expr("unix_micros(cast(p_ts as timestamp))") - F.expr(
        "unix_micros(cast(ts as timestamp))"
    )
    within = gap <= F.lit(1_800_000_000)
    return j.select(
        "event_id",
        "user_id",
        F.when(within, F.col("purchase_id")).alias("purchase_id"),
        F.when(within, gap).alias("gap_us"),
        F.coalesce(within, F.lit(False)).alias("converted"),
    )


@register(
    "events_period_over_period",
    oracle=f"""
    WITH weekly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             {dsum_expr('value')} AS total_value
      FROM events GROUP BY 1, 2
    )
    SELECT c.event_type, c.week, c.n_events, round(c.total_value, 6)
             AS total_value,
           p.n_events AS prev_n_events,
           round((CAST(c.n_events AS DOUBLE) - CAST(p.n_events AS DOUBLE))
                 / CAST(p.n_events AS DOUBLE), 6) AS wow_growth
    FROM weekly c LEFT JOIN weekly p
      ON p.event_type = c.event_type AND p.week = c.week - 1
    """,
)
def events_period_over_period(spark, sf):
    # Week-over-week KPI growth per event type — the period-comparison
    # report every warehouse runs, built WITHOUT a lag() window: the
    # corpus collapses to a (types x weeks)-sized weekly rollup in one
    # hash agg (time-bounded, never corpus-sized), and "previous
    # period" is a self equi-join on week-1 — broadcastable, no
    # fixed-cardinality window partition for rows to pile into
    # (plan-lint rule 2 is why: PARTITION BY event_type ORDER BY week
    # puts all of a type's history on one reducer; the rollup-then-join
    # form never does). Weeks are epoch-aligned (floor(epoch/604800)) —
    # timezone- and calendar-proof on both engines.
    e = t(spark, sf, "events")
    weekly = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 604800).cast("long").alias("week"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        dsum("value").alias("total_value"),
    )
    cur = weekly.alias("c")
    prev = weekly.select(
        F.col("event_type").alias("p_type"),
        F.col("week").alias("p_week"),
        F.col("n_events").alias("prev_n_events"),
    )
    return (
        cur.join(
            prev,
            (F.col("p_type") == F.col("event_type"))
            & (F.col("p_week") == F.col("week") - 1),
            "left",
        )
        .select(
            "event_type",
            "week",
            "n_events",
            F.round("total_value", 6).alias("total_value"),
            "prev_n_events",
            F.round(
                (
                    F.col("n_events").cast("double")
                    - F.col("prev_n_events").cast("double")
                )
                / F.col("prev_n_events").cast("double"),
                6,
            ).alias("wow_growth"),
        )
    )


@register(
    "events_decay_counters",
    oracle="""
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM(CAST(round(exp(-(1706745600 - floor(epoch(ts))) * 0.000008), 6)
                 AS DECIMAL(38,6))) AS DOUBLE), 6) AS decayed_n
    FROM events
    GROUP BY user_id, event_type
    """,
)
def events_decay_counters(spark, sf):
    # Exponentially time-decayed counters at a fixed reference instant —
    # the feature-store staple ("how active was this user on this event
    # type, weighted toward now"): each event contributes
    # exp(-rate * age_seconds), so the counter is a half-life-weighted
    # count (rate 8e-6/s ~ a day-scale half-life) that never needs a
    # windowed recompute. One hash agg with map-side partials — the
    # decayed sum is associative, so at 100 TB it also maintains
    # incrementally (new batch terms just add) and rolls up across time
    # partitions, unlike a sliding-window activity count. Determinism:
    # the per-event weight is rounded to 6dp and summed as
    # DECIMAL(38,6) (the rounded-transcendental discipline every ln/exp
    # query here uses); rate and reference time are exact double
    # literals, so the exp argument is bit-identical on both engines.
    e = t(spark, sf, "events")
    from dataingestionplayground_spark.functions.portable import epoch_seconds

    age = F.lit(1706745600) - F.floor(epoch_seconds("ts"))
    w = F.round(F.exp(-age * F.lit(0.000008)), 6).cast("decimal(38,6)")
    return e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum(w).cast("double"), 6).alias("decayed_n"),
    )


@register(
    "events_entropy_profile",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id, event_type
    ), n AS (
      SELECT user_id, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k
      FROM c GROUP BY user_id
    )
    SELECT c.user_id, any_value(n.n) AS n, any_value(n.k) AS n_types,
           round(-CAST(SUM(CAST(round(
             (CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE))
             * ln(CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE)), 6)
             AS DECIMAL(38,6))) AS DOUBLE), 6) AS entropy
    FROM c JOIN n ON c.user_id = n.user_id
    GROUP BY c.user_id
    """,
)
def events_entropy_profile(spark, sf):
    # Per-user behavioral entropy H = -sum p ln p over the user's
    # event-type distribution — the bot/monoculture signal (a scripted
    # account hammering one endpoint scores ~0; organic users spread
    # mass). Two hash aggs: (user, type) counts, then a per-user rollup
    # — n and k come from the counts table itself, so the raw corpus is
    # scanned ONCE and everything after is |users x types|-sized. The
    # per-type plogp term is rounded to 6dp and decimal-summed (the
    # rounded-ln discipline), keeping the agg associative and partial.
    e = t(spark, sf, "events")
    c = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = c.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    p = F.col("c").cast("double") / F.col("n").cast("double")
    term = F.round(p * F.log(p), 6).cast("decimal(38,6)")
    return (
        c.join(n, "user_id")
        .groupBy("user_id")
        .agg(
            F.any_value("n").alias("n"),
            F.any_value("k").alias("n_types"),
            F.round(-F.sum(term).cast("double"), 6).alias("entropy"),
        )
    )


@register(
    "events_gini_concentration",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS BIGINT) AS rk
      FROM events
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           round(2.0 * CAST(SUM(CAST(rk * value AS DECIMAL(38,6))) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE)
                    * CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE))
                 - (CAST(COUNT(*) AS DOUBLE) + 1.0) / CAST(COUNT(*) AS DOUBLE),
                 6) AS gini
    FROM ranked GROUP BY event_type
    """,
)
def events_gini_concentration(spark, sf):
    # Gini coefficient of value concentration per event type (the
    # rank-sum identity G = 2*sum(i*x_i)/(n*sum x) - (n+1)/n on
    # ascending ranks) — "does 1% of the traffic carry 90% of the
    # spend". The SQL rank is a PARTITION BY event_type window — a
    # handful-of-reducers sort at corpus scale — so the Spark side
    # ranks through operators/prefix.sharded_rank_multi instead: ONE
    # range exchange on (value, event_id), per-(shard, type) counts
    # broadcast back, exact in-shard grouped cumcount. Equal values
    # permute freely within a rank run without changing sum(i*x_i), so
    # the statistic is tie-stable; i*x products are 6dp-decimal summed
    # for cross-engine associativity.
    from pyspark.sql import types as T

    from dataingestionplayground_spark.operators.prefix import sharded_rank_multi

    e = t(spark, sf, "events").select("event_id", "event_type", "value")
    ranked = sharded_rank_multi(
        e,
        [("value", True), ("event_id", True)],
        [(("event_type",), lambda r, n: r, "rk", T.LongType(), "int64")],
    )
    n = F.count(F.lit(1))
    siw = F.sum((F.col("rk") * F.col("value")).cast("decimal(38,6)")).cast("double")
    sx = F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
    return ranked.groupBy("event_type").agg(
        n.cast("long").alias("n"),
        F.round(
            F.lit(2.0) * siw / (n.cast("double") * sx)
            - (n.cast("double") + F.lit(1.0)) / n.cast("double"),
            6,
        ).alias("gini"),
    )


@register(
    "events_benford_deviation",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(substr(CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS digit
      FROM events WHERE value >= 0.01
    ), obs AS (
      SELECT event_type, digit, CAST(COUNT(*) AS BIGINT) AS o
      FROM d GROUP BY event_type, digit
    ), n AS (
      SELECT event_type, CAST(SUM(o) AS BIGINT) AS n FROM obs GROUP BY event_type
    ), grid AS (
      SELECT event_type, u.digit, round(ln(1.0 + 1.0 / u.digit) / ln(10.0), 6) AS p
      FROM n, (SELECT unnest(generate_series(1, 9)) AS digit) u
    )
    SELECT g.event_type, any_value(n.n) AS n,
           round(CAST(SUM(CAST(round(
             (CAST(coalesce(obs.o, 0) AS DOUBLE) - CAST(n.n AS DOUBLE) * g.p)
             * (CAST(coalesce(obs.o, 0) AS DOUBLE) - CAST(n.n AS DOUBLE) * g.p)
             / (CAST(n.n AS DOUBLE) * g.p), 6) AS DECIMAL(38,6))) AS DOUBLE), 6)
             AS chi2
    FROM grid g
    JOIN n ON g.event_type = n.event_type
    LEFT JOIN obs ON obs.event_type = g.event_type AND obs.digit = g.digit
    GROUP BY g.event_type
    """,
)
def events_benford_deviation(spark, sf):
    # Benford's-law conformance per event type: chi-square of the
    # leading-digit distribution against p(d) = log10(1 + 1/d) — the
    # fabricated-data / instrumentation-bug smell test a pipeline runs
    # over numeric columns. Leading-digit extraction is INTEGER-exact
    # on both engines (floor(value*100) -> string -> first char; no
    # float formatting), the nine expected probabilities are rounded
    # constants, and the per-digit chi-square terms are 6dp-decimal
    # summed. Shapes: one conditional-count hash agg over the corpus,
    # then everything is |types x 9|-sized — the grid densify (types x
    # digits, zero-filled) is the PSI-drift pattern, so absent digits
    # still contribute their expected mass to the statistic.
    e = t(spark, sf, "events")
    d = e.filter(F.col("value") >= 0.01).select(
        "event_type",
        F.substring(
            F.floor(F.col("value") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit"),
    )
    obs = d.groupBy("event_type", "digit").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    n = obs.groupBy("event_type").agg(F.sum("o").cast("long").alias("n"))
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    grid = n.crossJoin(F.broadcast(digits)).select(
        "event_type",
        "n",
        "digit",
        F.round(
            F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
            / F.log(F.lit(10.0)),
            6,
        ).alias("p"),
    )
    dense = grid.join(obs, ["event_type", "digit"], "left").fillna(
        0, subset=["o"]
    )
    exp = F.col("n").cast("double") * F.col("p")
    term = F.round(
        (F.col("o").cast("double") - exp) * (F.col("o").cast("double") - exp) / exp,
        6,
    ).cast("decimal(38,6)")
    return dense.groupBy("event_type").agg(
        F.any_value("n").alias("n"),
        F.round(F.sum(term).cast("double"), 6).alias("chi2"),
    )


@register(
    "graph_label_propagation",
    oracle="""
    WITH w0 AS (
      SELECT DISTINCT user_id, event_type,
             CAST(floor(epoch(ts) / 600) AS BIGINT) AS win
      FROM events
    ), w AS (
      SELECT user_id, event_type, win FROM w0
      QUALIFY COUNT(*) OVER (PARTITION BY event_type, win) <= 32
    ), edges AS (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM w a JOIN w b
        ON a.event_type = b.event_type AND a.win = b.win
       AND a.user_id < b.user_id
    ), sym AS (
      SELECT u AS s, v AS d FROM edges
      UNION ALL SELECT v AS s, u AS d FROM edges
    ), nodes AS (
      SELECT DISTINCT user_id AS n FROM events
    ), l0 AS (
      SELECT n, n AS lbl FROM nodes
    ), n1 AS (
      SELECT s.s AS n, l.lbl, COUNT(*) AS c
      FROM sym s JOIN l0 l ON l.n = s.d GROUP BY s.s, l.lbl
    ), p1 AS (
      SELECT n, lbl FROM (
        SELECT n, lbl, row_number() OVER (PARTITION BY n
                                          ORDER BY c DESC, lbl ASC) AS rk
        FROM n1) WHERE rk = 1
    ), l1 AS (
      SELECT nd.n, coalesce(p.lbl, nd.n) AS lbl
      FROM nodes nd LEFT JOIN p1 p ON p.n = nd.n
    ), n2 AS (
      SELECT s.s AS n, l.lbl, COUNT(*) AS c
      FROM sym s JOIN l1 l ON l.n = s.d GROUP BY s.s, l.lbl
    ), p2 AS (
      SELECT n, lbl FROM (
        SELECT n, lbl, row_number() OVER (PARTITION BY n
                                          ORDER BY c DESC, lbl ASC) AS rk
        FROM n2) WHERE rk = 1
    ), l2 AS (
      SELECT nd.n, coalesce(p.lbl, l1.lbl) AS lbl
      FROM nodes nd
      LEFT JOIN p2 p ON p.n = nd.n
      JOIN l1 ON l1.n = nd.n
    )
    SELECT l2.n AS user_id, l2.lbl AS community, sz.cs AS community_size
    FROM l2 JOIN (
      SELECT lbl, CAST(COUNT(*) AS BIGINT) AS cs FROM l2 GROUP BY lbl
    ) sz ON sz.lbl = l2.lbl
    """,
)
def graph_label_propagation(spark, sf):
    # Community detection by deterministic label propagation over the
    # CO-ACTIVITY graph: users are linked when they perform the same
    # event type inside the same 10-minute window (the interaction
    # graph fraud/segmentation teams actually build), then 2
    # synchronous LPA rounds with most-frequent-neighbor-label updates,
    # ties to the smallest label. The edge build is a bucketed
    # self-join on (type, window), and HUB CELLS (> 32 co-active users)
    # are dropped before pairing — the df-cap discipline from the
    # shingle pipeline: a window everyone was active in carries no
    # pairwise signal, and without the cap per-cell pair counts grow
    # QUADRATICALLY with corpus density (the 100 TB failure mode).
    # Each LPA round is
    # a neighbor join + hash agg + per-node top-1 (operators/graph.py:
    # label_propagation). The oracle UNROLLS both rounds in SQL, so
    # the hash match replays the exact label dynamics, not just the
    # final community sizes.
    e = t(spark, sf, "events")
    from dataingestionplayground_spark.functions import portable as PF
    from dataingestionplayground_spark.operators.graph import label_propagation

    w0 = e.select(
        "user_id",
        "event_type",
        F.floor(PF.epoch_seconds("ts") / 600).cast("long").alias("win"),
    ).distinct()
    cell = w0.groupBy("event_type", "win").agg(
        F.count(F.lit(1)).alias("__cell_n")
    )
    w = (
        w0.join(cell, ["event_type", "win"])
        .filter(F.col("__cell_n") <= 32)
        .drop("__cell_n")
    )
    a = w.alias("a")
    b = w.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.win") == F.col("b.win"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .distinct()
    )
    nodes = e.select(F.col("user_id").alias("u")).distinct()
    labels = label_propagation(edges, nodes, n_iters=2, node_col="u")
    sz = labels.groupBy("community").agg(
        F.count(F.lit(1)).cast("long").alias("community_size")
    )
    return labels.select(
        F.col("u").alias("user_id"), "community"
    ).join(F.broadcast(sz), "community").select(
        "user_id", "community", "community_size"
    )


@register(
    "events_ks_two_sample",
    oracle="""
    WITH g AS (
      SELECT value,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM events
      WHERE event_type = 'purchase'
        AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'
      GROUP BY value
    ), c AS (
      SELECT value, a, b,
             SUM(a) OVER (ORDER BY value) AS ca,
             SUM(b) OVER (ORDER BY value) AS cb
      FROM g
    ), n AS (
      SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(b) AS BIGINT) AS n2 FROM g
    )
    SELECT n.n1, n.n2,
           round(MAX(abs(CAST(ca AS DOUBLE) / CAST(n.n1 AS DOUBLE)
                         - CAST(cb AS DOUBLE) / CAST(n.n2 AS DOUBLE))), 6) AS d_stat
    FROM c CROSS JOIN n GROUP BY n.n1, n.n2
    """,
)
def events_ks_two_sample(spark, sf):
    # Two-sample Kolmogorov-Smirnov: sup |F1 - F2| between week-1 and
    # week-2 purchase values — the distribution-shift gate that catches
    # shape changes a mean/variance monitor misses (PSI's exact,
    # binning-free sibling). The textbook implementation sorts the
    # union on ONE reducer; here the corpus first collapses to the
    # VALUE level (one hash agg -> per-value counts of both groups,
    # which also lands the CDF evaluation at value boundaries so tie
    # runs never overstate D), then BOTH cumulative counts come from
    # operators/prefix.sharded_prefix_multi — one range exchange, two
    # prefix columns, no unpartitioned window. D is a max over
    # identically-computed doubles, so the hash match is exact.
    from dataingestionplayground_spark.operators.prefix import sharded_prefix_multi

    e = t(spark, sf, "events").filter(
        (F.col("event_type") == "purchase")
        & (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-15").cast("timestamp"))
    )
    split = F.col("ts") < F.lit("2024-01-08").cast("timestamp")
    g = e.groupBy("value").agg(
        F.sum(F.when(split, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(~split, 1).otherwise(0)).cast("long").alias("b"),
    )
    c = sharded_prefix_multi(g, [("value", True)], ["a", "b"], ["ba", "bb"])
    c = c.select(
        ((F.col("ba") + F.col("a")).cast("double")).alias("ca"),
        ((F.col("bb") + F.col("b")).cast("double")).alias("cb"),
        "a",
        "b",
    )
    n = g.agg(
        F.sum("a").cast("long").alias("n1"), F.sum("b").cast("long").alias("n2")
    )
    return (
        c.crossJoin(F.broadcast(n))
        .groupBy("n1", "n2")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("ca") / F.col("n1").cast("double")
                        - F.col("cb") / F.col("n2").cast("double")
                    )
                ),
                6,
            ).alias("d_stat")
        )
    )


@register(
    "events_mannwhitney_u",
    oracle="""
    WITH g AS (
      SELECT value,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM events
      WHERE event_type = 'purchase'
        AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'
      GROUP BY value
    ), w AS (
      SELECT value, a, b, a + b AS tc,
             SUM(a + b) OVER (ORDER BY value) - (a + b) AS bf
      FROM g
    ), s AS (
      SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(b) AS BIGINT) AS n2,
             CAST(SUM(CAST(CAST(a AS DOUBLE)
                           * (CAST(bf AS DOUBLE) + (CAST(tc AS DOUBLE) + 1.0) / 2.0)
                           AS DECIMAL(38,6))) AS DOUBLE) AS r1,
             CAST(SUM(tc * tc * tc - tc) AS BIGINT) AS tie3
      FROM w
    )
    SELECT n1, n2,
           round(r1 - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0) / 2.0, 6) AS u1,
           round(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 - (r1 - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0) / 2.0), 6) AS u2,
           round(((r1 - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0) / 2.0)
                  - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
                 / sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                        * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                           - CAST(tie3 AS DOUBLE)
                             / (CAST(n1 + n2 AS DOUBLE)
                                * (CAST(n1 + n2 AS DOUBLE) - 1.0)))),
                 6) AS z
    FROM s
    """,
)
def events_mannwhitney_u(spark, sf):
    # Mann-Whitney U (Wilcoxon rank-sum) with tie-corrected normal
    # approximation — the nonparametric A/B test for "did week 2's
    # purchase values shift", robust where the z-test's normality
    # assumption fails. Same scale skeleton as the KS query: collapse
    # to per-value group counts (one hash agg), ONE
    # sharded_prefix_multi pass for the rank prefix; average ranks for
    # tie runs come from the closed form before + (t+1)/2, so no
    # per-row rank materialization ever happens — the rank SUM per
    # group is an exact-decimal agg over value-level rows (rank
    # averages are exact halves, tie^3 terms exact integers).
    from dataingestionplayground_spark.operators.prefix import sharded_prefix_multi

    e = t(spark, sf, "events").filter(
        (F.col("event_type") == "purchase")
        & (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-15").cast("timestamp"))
    )
    split = F.col("ts") < F.lit("2024-01-08").cast("timestamp")
    g = e.groupBy("value").agg(
        F.sum(F.when(split, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(~split, 1).otherwise(0)).cast("long").alias("b"),
    )
    g = g.withColumn("tc", (F.col("a") + F.col("b")).cast("long"))
    w = sharded_prefix_multi(g, [("value", True)], ["tc"], ["bf"])
    rank_avg = F.col("bf").cast("double") + (F.col("tc").cast("double") + F.lit(1.0)) / 2.0
    s = w.agg(
        F.sum("a").cast("long").alias("n1"),
        F.sum("b").cast("long").alias("n2"),
        F.sum(
            (F.col("a").cast("double") * rank_avg).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("r1"),
        F.sum(
            F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc")
        )
        .cast("long")
        .alias("tie3"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u1 = F.col("r1") - n1d * (n1d + F.lit(1.0)) / F.lit(2.0)
    sigma = F.sqrt(
        (n1d * n2d / F.lit(12.0))
        * (
            (nd + F.lit(1.0))
            - F.col("tie3").cast("double") / (nd * (nd - F.lit(1.0)))
        )
    )
    return s.select(
        "n1",
        "n2",
        F.round(u1, 6).alias("u1"),
        F.round(n1d * n2d - u1, 6).alias("u2"),
        F.round((u1 - n1d * n2d / F.lit(2.0)) / sigma, 6).alias("z"),
    )


@register(
    "events_forecast_seasonal_naive",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, day
    ), j AS (
      SELECT cur.event_type, cur.day, cur.n,
             coalesce(prev.n, 0) AS forecast
      FROM d cur LEFT JOIN d prev
        ON prev.event_type = cur.event_type AND prev.day = cur.day - 7
      WHERE cur.day >= (SELECT MIN(day) FROM d) + 7
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           round(CAST(SUM(abs(n - forecast)) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mae,
           round(CAST(SUM(CAST(round(CAST(abs(n - forecast) AS DOUBLE)
                                     / CAST(n AS DOUBLE), 6)
                               AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mape
    FROM j GROUP BY event_type
    """,
)
def events_forecast_seasonal_naive(spark, sf):
    # Seasonal-naive forecast baseline with its OWN error scorecard:
    # predict each day's per-type event count with the same weekday a
    # week earlier, report MAE and MAPE per type — the floor every
    # fancier traffic forecaster must beat, and the pattern for
    # backtesting any forecaster in-engine (forecast = a self-join on
    # the shifted key, scoring = one agg). The corpus collapses to the
    # (type, day) level in one hash agg; the lag-7 self-join and the
    # error aggs run on that days-x-types frame, so nothing downstream
    # of the first agg scales with raw volume. Integer counts make MAE
    # exact; per-day MAPE terms are 6dp-decimal summed.
    from dataingestionplayground_spark.functions import portable as PF

    e = t(spark, sf, "events")
    d = e.select(
        "event_type",
        F.floor(PF.epoch_seconds("ts") / 86400).cast("long").alias("day"),
    ).groupBy("event_type", "day").agg(F.count(F.lit(1)).cast("long").alias("n"))
    lo = d.agg(F.min("day").alias("d0"))
    cur = d.alias("cur")
    prev = d.select(
        F.col("event_type").alias("event_type"),
        (F.col("day") + 7).alias("day"),
        F.col("n").alias("pn"),
    ).alias("prev")
    j = (
        cur.join(prev, ["event_type", "day"], "left")
        .crossJoin(F.broadcast(lo))
        .filter(F.col("day") >= F.col("d0") + 7)
        .select(
            "event_type",
            "n",
            F.coalesce("pn", F.lit(0)).cast("long").alias("forecast"),
        )
    )
    err = F.abs(F.col("n") - F.col("forecast"))
    mape_term = F.round(
        err.cast("double") / F.col("n").cast("double"), 6
    ).cast("decimal(38,6)")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(
            F.sum(err).cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("mae"),
        F.round(
            F.sum(mape_term).cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("mape"),
    )


@register(
    "events_asof_nearest",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), buys AS (
      SELECT event_id AS purchase_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ), prevm AS (
      SELECT event_id, purchase_id, gap_us FROM (
        SELECT c.event_id, b.purchase_id,
               epoch_us(c.ts) - epoch_us(b.ts) AS gap_us,
               row_number() OVER (PARTITION BY c.event_id
                                  ORDER BY b.ts DESC, b.purchase_id ASC) AS rn
        FROM clicks c JOIN buys b
          ON b.user_id = c.user_id AND b.ts <= c.ts) WHERE rn = 1
    ), nextm AS (
      SELECT event_id, purchase_id, gap_us FROM (
        SELECT c.event_id, b.purchase_id,
               epoch_us(b.ts) - epoch_us(c.ts) AS gap_us,
               row_number() OVER (PARTITION BY c.event_id
                                  ORDER BY b.ts ASC, b.purchase_id ASC) AS rn
        FROM clicks c JOIN buys b
          ON b.user_id = c.user_id AND b.ts > c.ts) WHERE rn = 1
    )
    SELECT c.event_id, c.user_id,
           CASE WHEN p.purchase_id IS NOT NULL
                     AND (n.purchase_id IS NULL OR p.gap_us <= n.gap_us)
                THEN p.purchase_id ELSE n.purchase_id END AS purchase_id,
           CASE WHEN p.purchase_id IS NOT NULL
                     AND (n.purchase_id IS NULL OR p.gap_us <= n.gap_us)
                THEN p.gap_us ELSE n.gap_us END AS gap_us,
           CASE WHEN p.purchase_id IS NULL AND n.purchase_id IS NULL THEN NULL
                WHEN p.purchase_id IS NOT NULL
                     AND (n.purchase_id IS NULL OR p.gap_us <= n.gap_us)
                THEN 'backward' ELSE 'forward' END AS direction
    FROM clicks c
    LEFT JOIN prevm p ON p.event_id = c.event_id
    LEFT JOIN nextm n ON n.event_id = c.event_id
    """,
)
def events_asof_nearest(spark, sf):
    # NEAREST as-of join, completing the direction family (backward /
    # forward-with-tolerance / nearest — pandas merge_asof's third
    # mode): each click pairs with the same user's temporally closest
    # purchase in EITHER direction; |gap| ties prefer the earlier
    # (backward) purchase, equal-timestamp ties the smallest id. ONE
    # sort-shuffle serves both directions: in the (user, time)-sorted
    # union, the previous purchase is max(struct(us, -id)) over the
    # preceding frame and the next is min(struct(us, id)) over the
    # following frame — struct ordering encodes both tie rules, buys
    # sort before clicks at equal timestamps so exact matches land in
    # the preceding frame (gap 0), and no second exchange or per-key
    # Python ever runs. The oracle specifies the same semantics
    # independently via two ranked joins.
    e = t(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        F.lit(0).alias("side"),
        F.col("event_id").alias("purchase_id"),
    )
    u = clicks.unionByName(buys).withColumn(
        "bstruct",
        F.when(
            F.col("side") == 0,
            F.struct(
                F.col("us").alias("bus"),
                (-F.col("purchase_id")).alias("negid"),
                F.col("purchase_id").alias("pid"),
            ),
        ),
    ).withColumn(
        "nstruct",
        F.when(
            F.col("side") == 0,
            F.struct(F.col("us").alias("bus"), F.col("purchase_id").alias("pid")),
        ),
    )
    from pyspark.sql import Window as W

    order = [F.asc("us"), F.asc("side"), F.asc("purchase_id"), F.asc("event_id")]
    w_prev = (
        W.partitionBy("user_id").orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy("user_id").orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    matched = (
        u.withColumn("prev", F.max("bstruct").over(w_prev))
        .withColumn("nxt", F.min("nstruct").over(w_next))
        .filter(F.col("side") == 1)
    )
    gap_prev = F.col("us") - F.col("prev.bus")
    gap_next = F.col("nxt.bus") - F.col("us")
    take_prev = F.col("prev").isNotNull() & (
        F.col("nxt").isNull() | (gap_prev <= gap_next)
    )
    return matched.select(
        "event_id",
        "user_id",
        F.when(take_prev, F.col("prev.pid"))
        .otherwise(F.col("nxt.pid"))
        .alias("purchase_id"),
        F.when(take_prev, gap_prev).otherwise(gap_next).alias("gap_us"),
        F.when(F.col("prev").isNull() & F.col("nxt").isNull(), F.lit(None))
        .when(take_prev, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )

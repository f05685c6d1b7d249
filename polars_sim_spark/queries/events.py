"""Event-stream contract queries: sessionization, funnels, as-of joins, time windows, pivots/cubes.

Split out of the former monolithic queries.py (round 5); the
registration registry and driver-order governance live in
``polars_sim_spark.queries`` (the package __init__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from polars_sim_spark import cache as cache_registry
from polars_sim_spark.functions import text as text_fns
from polars_sim_spark.functions.text import trigram_tokens
from polars_sim_spark.sources.tables import load_table
from polars_sim_spark.queries._registry import register


@register(
    "events_hourly",
    """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch twin of the streaming operator)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


@register(
    "events_json_stats",
    """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events
GROUP BY event_type
""",
)
def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events.props payload column."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "events_sessionized",
    """
WITH x AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM x
)
SELECT user_id, session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
FROM s GROUP BY user_id, session_id
""",
)
def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-min-gap sessions (operators/curation.py sessionize —
    gaps-and-islands), aggregated to one row per session. ONE shuffle by
    user: the lag window, running-sum window, and session aggregate all
    reuse the user partitioning. Gap arithmetic is exact integer
    microseconds, no float drift vs the oracle."""
    from polars_sim_spark.operators.curation import sessionize

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, user_col="user_id", ts_col="ts", order_col="event_id")
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "asof_error_last_click",
    """
WITH l AS (SELECT * FROM events WHERE event_type = 'error'),
r AS (SELECT * FROM events WHERE event_type = 'click'),
j AS (
  SELECT l.event_id, l.user_id, l.value,
         r.event_id AS click_event_id, r.value AS click_value,
         row_number() OVER (PARTITION BY l.event_id ORDER BY r.ts DESC, r.event_id DESC) AS rn
  FROM l JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts
)
SELECT event_id, user_id, value, click_event_id, click_value FROM j WHERE rn = 1
""",
)
def asof_error_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event, the most recent preceding click by the same
    user — the temporal as-of join (operators/asof_join.py), one shuffle."""
    from polars_sim_spark.operators.asof_join import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "error").select("event_id", "ts", "user_id", "value")
    right = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_event_id"),
        F.col("value").alias("click_value"),
    )
    out = asof_join(
        left, right, on="ts", by="user_id", right_seq="click_event_id", how="inner"
    )
    return out.select("event_id", "user_id", "value", "click_event_id", "click_value")


@register(
    "events_clicks_before_error",
    """
SELECT e.event_id, e.user_id, e.ts, count(c.u) AS n_clicks
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT user_id AS u, ts AS c_ts FROM events WHERE event_type = 'click') c
  ON e.user_id = c.u
 AND c.c_ts >= e.ts - INTERVAL 5 MINUTE
 AND c.c_ts <= e.ts
GROUP BY 1, 2, 3
""",
)
def events_clicks_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: for every error event, how many clicks did
    the same user make in the 5 minutes leading up to it.  Uses the banded
    ``range_join`` operator — an equi-join on (user, time-bucket), never a
    per-user cross product — then a grouped count.  Left-outer, so errors
    with zero preceding clicks stay in the result with n_clicks = 0."""
    from polars_sim_spark.operators.range_join import range_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = range_join(
        errors, clicks, on="user_id", lower=-300, upper=0, how="left"
    )
    return joined.groupBy("event_id", "user_id", "ts").agg(
        F.count(F.col("ts_r")).alias("n_clicks")
    )


@register(
    "events_user_total_salted",
    """
SELECT e.event_id, e.user_id, t.user_total
FROM events e
JOIN (SELECT user_id,
             CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS user_total
      FROM events GROUP BY user_id) t
  ON e.user_id = t.user_id
""",
)
def events_user_total_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich every event with its user's lifetime value via the SALTED
    join: the per-user totals (build side) replicate num_salts times, the
    event stream (probe) salts deterministically on event_id, and the hot
    user's rows spread across 8 reducers instead of pinning one.  Output
    is row-identical to the plain join — which is exactly what the oracle
    runs."""
    from polars_sim_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    totals = ev.groupBy("user_id").agg(
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("user_total")
    )
    out = salted_join(
        ev.select("event_id", "user_id"),
        totals,
        on="user_id",
        num_salts=8,
        salt_by=["event_id"],
    )
    return out.select("event_id", "user_id", "user_total")


@register(
    "events_sliding_10m",
    """
WITH w AS (
  SELECT unnest([time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)),
                 time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
                   - INTERVAL 5 MINUTE]) AS window_start,
         event_type, value
  FROM events
)
SELECT window_start, event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM w GROUP BY 1, 2
""",
)
def events_sliding_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation (10-minute windows every 5 minutes):
    each event contributes to exactly 2 overlapping windows.  Batch twin
    of ``streaming.sliding_event_counts`` — same ``F.window`` grouping
    Structured Streaming uses, so the stream's availableNow output equals
    this query row-for-row (asserted in tests/test_streaming.py).  The
    oracle reproduces Spark's epoch-aligned window grid with two
    time_bucket offsets per event."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(F.col("ts"), "10 minutes", "5 minutes").alias("win"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_multires_rollup",
    """
WITH b AS (
  SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
         date_trunc('week', ts) AS w, value
  FROM events
),
g AS (
  SELECT h, d, w, count(*) AS n_events,
         round(CAST(sum(CAST(round(CAST(value AS DOUBLE), 6)
                             AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value
  FROM b
  GROUP BY GROUPING SETS ((h), (d), (w))
)
SELECT CASE WHEN h IS NOT NULL THEN 'hour'
            WHEN d IS NOT NULL THEN 'day' ELSE 'week' END AS resolution,
       coalesce(h, d, w) AS bucket, n_events, total_value
FROM g
""",
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time rollup (the hypertable continuous-aggregate
    shape): hourly, daily, AND weekly aggregates of the event stream in
    ONE pass via GROUPING SETS over pre-projected time buckets — one
    scan, one shuffle, three resolutions, instead of three jobs.
    Complements `revenue_rollup` (hierarchical ROLLUP) and
    `events_cube_day_type` (CUBE) with the explicit-sets form. Values
    sum as rounded DECIMAL per the house rule."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("h"),
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.date_trunc("week", F.col("ts")).alias("w"),
        "value",
    )
    g = b.groupingSets([["h"], ["d"], ["w"]], "h", "d", "w").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(
                F.round(F.col("value").cast("double"), 6).cast("decimal(18,6)")
            ).cast("double"),
            6,
        ).alias("total_value"),
    )
    # NULL group keys from the non-active sets fold into an explicit
    # (resolution, bucket) pair so the output carries no NULLs
    return g.select(
        F.when(F.col("h").isNotNull(), "hour")
        .when(F.col("d").isNotNull(), "day")
        .otherwise("week")
        .alias("resolution"),
        F.coalesce("h", "d", "w").alias("bucket"),
        "n_events",
        "total_value",
    )


@register(
    "events_user_funnel",
    """
WITH f AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
)
SELECT user_id, first_click, first_purchase,
       CASE WHEN first_click IS NOT NULL AND first_purchase IS NOT NULL
                 AND first_purchase > first_click
            -- floored whole seconds from exact integer microseconds:
            -- date_diff('second', ...) would count boundary CROSSINGS,
            -- one off from the floor on sub-second timestamps
            THEN CAST((epoch_us(first_purchase) - epoch_us(first_click))
                      // 1000000 AS BIGINT)
            END AS secs_to_convert
FROM f
""",
)
def events_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase conversion funnel per user: first click, first
    purchase, and seconds-to-convert when the purchase followed the
    click — the sequential-stages analytic (conditional min aggregates,
    ONE shuffle by user; no self-join, no window). Users missing a
    stage carry NULLs, so the funnel's drop-off is a count over this
    frame."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    converted = (
        F.col("first_click").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") > F.col("first_click"))
    )
    return f.select(
        "user_id",
        "first_click",
        "first_purchase",
        F.when(
            converted,
            (
                F.unix_micros(F.col("first_purchase").cast("timestamp"))
                - F.unix_micros(F.col("first_click").cast("timestamp"))
            )
            / 1_000_000,
        )
        .cast("long")
        .alias("secs_to_convert"),
    )


@register(
    "events_session_windows",
    """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM s GROUP BY user_id, sid
""",
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-merged session windows via Spark's native ``F.session_window``
    (batch mode), one row per session with window bounds and totals.
    Complements the gaps-and-islands ``events_sessionized`` — same idea,
    two implementations; note the boundary semantics differ (a gap of
    EXACTLY 30 minutes starts a new session here, matching
    session_window's half-open [start, last+gap) merge rule — the oracle
    uses >=), while sessionize keeps it open on >.  Session end is
    last-event-ts + gap, as session_window defines."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("win"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_type_value_pivot",
    """
SELECT date_trunc('hour', ts) AS hour,
       coalesce(CAST(sum(CASE WHEN event_type = 'click'    THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE), 0.0) AS click,
       coalesce(CAST(sum(CASE WHEN event_type = 'error'    THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE), 0.0) AS error,
       coalesce(CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE), 0.0) AS purchase,
       coalesce(CAST(sum(CASE WHEN event_type = 'signup'   THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE), 0.0) AS signup,
       coalesce(CAST(sum(CASE WHEN event_type = 'view'     THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE), 0.0) AS view
FROM events GROUP BY 1
""",
)
def events_type_value_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): per-hour value totals, one column per event
    type.  The pivot values are EXPLICIT — with an inferred value list
    Spark needs an extra distinct scan and the output schema becomes
    data-dependent, which breaks both plan caching and any downstream
    schema contract.  Compiles to one hash aggregate with conditional
    sums (exactly what the oracle spells out); a single shuffle on the
    hour key."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"))
        .select(
            "hour",
            *[
                F.coalesce(F.col(t), F.lit(0.0)).alias(t)
                for t in ["click", "error", "purchase", "signup", "view"]
            ],
        )
    )


@register(
    "events_cube_day_type",
    """
SELECT coalesce(day, TIMESTAMP '1900-01-01') AS day,
       coalesce(event_type, 'ALL') AS event_type,
       CAST(GROUPING(day) AS INT) AS g_day,
       CAST(GROUPING(event_type) AS INT) AS g_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM (SELECT date_trunc('day', ts) AS day, event_type, value FROM events)
GROUP BY CUBE (day, event_type)
""",
)
def events_cube_day_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation: all 4 grouping combinations (day×type, day,
    type, grand total) in one pass — Spark expands the grouping sets
    before the aggregate, so it is still a single shuffle.  Completes
    the grouping-sets family next to revenue_rollup's ROLLUP."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type", "value"
    )
    return (
        ev.cube("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
            F.grouping("day").cast("int").alias("g_day"),
            F.grouping("event_type").cast("int").alias("g_type"),
        )
        .select(
            F.coalesce(F.col("day"), F.lit("1900-01-01").cast("timestamp")).alias("day"),
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            "g_day",
            "g_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "daily_high_clicks_vs_purchases",
    """
WITH c AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n_clicks
  FROM events WHERE event_type = 'click' AND value > 4.5 GROUP BY 1
),
p AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' AND value < 0.5 GROUP BY 1
)
SELECT coalesce(c.day, p.day) AS day,
       coalesce(n_clicks, 0) AS n_clicks,
       coalesce(n_purchases, 0) AS n_purchases
FROM c FULL OUTER JOIN p ON c.day = p.day
""",
)
def daily_high_clicks_vs_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two sparse daily aggregates (high-value clicks
    vs low-value purchases): days present on either side survive with
    zero-filled counts.  Completes the join-type coverage (inner/left/
    semi/anti/cross elsewhere)."""
    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.where((F.col("event_type") == "click") & (F.col("value") > 4.5))
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    p = (
        ev.where((F.col("event_type") == "purchase") & (F.col("value") < 0.5))
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    pd_ = p.withColumnRenamed("day", "p_day")
    return (
        c.join(pd_, c.day == pd_.p_day, "full_outer")
        .select(
            F.coalesce(c.day, pd_.p_day).alias("day"),
            F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
            F.coalesce(F.col("n_purchases"), F.lit(0)).alias("n_purchases"),
        )
    )



@register(
    "events_hll_users",
    """
WITH r AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 256 AS b,
         floor(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) / 256) AS rem
  FROM events
),
regs AS (
  SELECT event_type, b,
         max(CASE WHEN rem = 0 THEN 25 ELSE 25 - length(bin(CAST(rem AS BIGINT))) END) AS M
  FROM r GROUP BY 1, 2
),
g AS (
  SELECT event_type, count(*) AS present,
         sum(CAST(power(2, 25 - M) AS BIGINT)) AS s
  FROM regs GROUP BY 1
)
SELECT event_type,
       round(CASE WHEN (CAST(0.7182725932495458 AS DOUBLE) * CAST(2199023255552 AS DOUBLE)
                        / (s + (256 - present) * 33554432)) <= 640.0
                   AND (256 - present) > 0
             THEN 256 * ln(256.0 / (256 - present))
             ELSE CAST(0.7182725932495458 AS DOUBLE) * CAST(2199023255552 AS DOUBLE)
                  / (s + (256 - present) * 33554432)
             END, 4) AS hll_distinct
FROM g
""",
)
def events_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type by a DETERMINISTIC HyperLogLog
    (operators/sketches.py): md5-register sketch whose ESTIMATE —
    not just its plumbing — is reproduced digit-for-digit by the
    DuckDB oracle (the built-in approx_count_distinct of either engine
    could never be cross-checked). Two map-side-combining aggregates
    over narrow rows; register state O(groups × 256) at any corpus
    size. Accuracy vs exact counts pinned in tests/test_sketches.py."""
    from polars_sim_spark.operators.sketches import hll_distinct

    ev = load_table(spark, sf_dir, "events")
    return hll_distinct(ev, "event_type", "user_id")


@register(
    "events_cms_user_counts",
    """
WITH vals AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events),
seeds AS (SELECT unnest(range(4)) AS seed),
counters AS (
  SELECT seed,
         CAST(('0x' || substr(md5(CAST(seed AS VARCHAR) || chr(31) || v), 1, 8)) AS BIGINT) % 256 AS c,
         count(*) AS cnt
  FROM vals CROSS JOIN seeds GROUP BY 1, 2
),
cand AS (SELECT DISTINCT user_id, CAST(user_id AS VARCHAR) AS v FROM events WHERE user_id < 20),
probe AS (
  SELECT cand.user_id, seeds.seed,
         CAST(('0x' || substr(md5(CAST(seeds.seed AS VARCHAR) || chr(31) || cand.v), 1, 8)) AS BIGINT) % 256 AS c
  FROM cand CROSS JOIN seeds
)
SELECT p.user_id, CAST(min(coalesce(counters.cnt, 0)) AS BIGINT) AS cms_count
FROM probe p LEFT JOIN counters ON counters.seed = p.seed AND counters.c = p.c
GROUP BY 1
""",
)
def events_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point queries (operators/sketches.py): per-user
    event-count estimates for a candidate set, served from FIXED
    O(d·w) counters instead of a per-user aggregate — the bounded-
    memory frequency table over an unbounded key domain. Like the HLL
    query, the ESTIMATOR is deterministic (md5 row-hashes), so the
    DuckDB oracle reproduces every estimate exactly; the ≥-true-count
    guarantee is pinned in tests/test_sketches.py."""
    from polars_sim_spark.operators.sketches import cms_counters, cms_estimate

    ev = load_table(spark, sf_dir, "events")
    counters = cms_counters(ev, None, "user_id")
    cand = ev.where(F.col("user_id") < 20).select("user_id").distinct()
    est = cms_estimate(counters, cand, "user_id")
    return est.select(F.col("user_id").cast("long").alias("user_id"), "cms_count")


@register(
    "events_cms_heavy_hitters",
    """
WITH vals AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events),
seeds AS (SELECT unnest(range(4)) AS seed),
counters AS (
  SELECT seed,
         CAST(('0x' || substr(md5(CAST(seed AS VARCHAR) || chr(31) || v), 1, 8)) AS BIGINT) % 256 AS c,
         count(*) AS cnt
  FROM vals CROSS JOIN seeds GROUP BY 1, 2
),
cand AS (SELECT DISTINCT user_id, CAST(user_id AS VARCHAR) AS v FROM events),
probe AS (
  SELECT cand.user_id, seeds.seed,
         CAST(('0x' || substr(md5(CAST(seeds.seed AS VARCHAR) || chr(31) || cand.v), 1, 8)) AS BIGINT) % 256 AS c
  FROM cand CROSS JOIN seeds
),
est AS (
  SELECT p.user_id, CAST(min(coalesce(counters.cnt, 0)) AS BIGINT) AS cms_count
  FROM probe p LEFT JOIN counters ON counters.seed = p.seed AND counters.c = p.c
  GROUP BY 1
)
SELECT est.user_id, est.cms_count
FROM est CROSS JOIN (SELECT count(*) AS n FROM events) t
WHERE est.cms_count >= ceil(CAST(0.01 AS DOUBLE) * t.n)
""",
)
def events_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """φ-heavy hitters from the count-min sketch
    (operators/sketches.py:cms_heavy_hitters): users whose estimated
    event count clears 1% of the corpus, served from the fixed O(d·w)
    counters. The no-false-negative guarantee (a true φ-heavy value
    always survives) is pinned in tests/test_sketches.py; the member
    set and every estimate are deterministic, so the DuckDB oracle
    reproduces them exactly."""
    from polars_sim_spark.operators.sketches import cms_heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    hh = cms_heavy_hitters(ev, "user_id", phi=0.01)
    return hh.select(F.col("user_id").cast("long").alias("user_id"), "cms_count")


@register(
    "events_value_quantiles",
    """
SELECT event_type,
       round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6)  AS p50,
       round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6)  AS p90,
       round(quantile_cont(CAST(value AS DOUBLE), 0.99), 6) AS p99
FROM events GROUP BY event_type
""",
)
def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group percentiles (linear interpolation) of the event
    value — Spark's ``percentile`` and DuckDB's ``quantile_cont``
    implement the same interpolation, so this is a FULL value-hash
    cross-engine row, unlike either engine's approx_percentile. Scale
    posture is honest: exact percentiles need the group's values
    co-located (one shuffle, in-partition sort); at 100 TB per-group
    cardinalities in the billions would move this to the sketch twin
    ``events_value_quantiles_sketch`` (operators/sketches.py:
    quantile_sketch) — the engine-portable deterministic formulation
    that stays under the oracle gate with O(groups·s) state."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile(F.col("value").cast("double"), F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile(F.col("value").cast("double"), F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile(F.col("value").cast("double"), F.lit(0.99)), 6).alias("p99"),
    )


# ---------------------------------------------------------------------------
# Z-order clustered layout (round 8, VERDICT r7 "Next round" #1)
# ---------------------------------------------------------------------------


def ensure_zorder_events(spark: SparkSession, sf_dir: str) -> str:
    """Write the committed z-order-clustered copy of ``events`` for
    ``sf_dir`` if absent (sources/layout.py:write_zordered over
    ``(user_id, value)``); returns its path. Rebuilds are row-equal to
    the committed copy by construction — the layout only reorders, and
    the contract row compares sorted row content."""
    from polars_sim_spark.queries.vectors import _index_dir
    from polars_sim_spark.sources.layout import write_zordered

    path = _index_dir(sf_dir, "events_zorder")
    import os

    from polars_sim_spark.fsutil import hadoop_exists

    if not hadoop_exists(spark, os.path.join(path, "_SUCCESS")):
        ev = load_table(spark, sf_dir, "events")
        write_zordered(ev, path, ["user_id", "value"], num_files=16)
    return path


@register(
    "events_zorder_pruned",
    """
WITH b AS (
  SELECT min(CAST(user_id AS DOUBLE)) AS mnu, max(CAST(user_id AS DOUBLE)) AS mxu,
         min(CAST(value AS DOUBLE)) AS mnv, max(CAST(value AS DOUBLE)) AS mxv
  FROM events
),
cells AS (
  SELECT event_id, user_id, value,
         greatest(0, least(65535, coalesce(CAST(floor(
           (CAST(user_id AS DOUBLE) - mnu)
           / (CASE WHEN mxu - mnu = 0 THEN 1.0 ELSE mxu - mnu END) * 65535.0
         ) AS BIGINT), 0))) AS cu,
         greatest(0, least(65535, coalesce(CAST(floor(
           (CAST(value AS DOUBLE) - mnv)
           / (CASE WHEN mxv - mnv = 0 THEN 1.0 ELSE mxv - mnv END) * 65535.0
         ) AS BIGINT), 0))) AS cv
  FROM events CROSS JOIN b
  WHERE user_id BETWEEN 40 AND 79 AND value BETWEEN 100.0 AND 200.0
),
bits AS (SELECT unnest(range(16)) AS i)
SELECT event_id, user_id, value,
       CAST(sum((((cu >> i) & 1) << (2 * i)) + (((cv >> i) & 1) << (2 * i + 1))) AS BIGINT) AS zkey
FROM cells CROSS JOIN bits
GROUP BY event_id, user_id, value
""",
)
def events_zorder_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective 2-D box scan over the z-order-CLUSTERED events layout
    (sources/layout.py): read the committed clustered copy, push the
    ``user_id × value`` box down to the parquet scan (tight per-row-group
    min/max stats on BOTH clustered columns — the pruning is asserted in
    tests/test_sinks.py and measured in BASELINE.md), and return the
    matching rows with their Morton key. The oracle reads the ORIGINAL
    events table and recomputes every z-value from the deterministic
    integer grid — so the row proves (a) write_zordered preserved row
    content exactly through the range-exchange + in-partition sort and
    (b) the interleaved-bit key reproduces cross-engine digit-for-digit."""
    from polars_sim_spark.sources.layout import zorder_key

    ev = spark.read.parquet(ensure_zorder_events(spark, sf_dir))
    z = zorder_key(ev, ["user_id", "value"])
    return (
        ev.where(F.col("user_id").between(40, 79) & F.col("value").between(100.0, 200.0))
        .select("event_id", "user_id", "value", z.alias("zkey"))
    )


@register(
    "events_heavy_hitters_exact",
    """
WITH t AS (SELECT count(*) AS n FROM events)
SELECT user_id, CAST(count(*) AS BIGINT) AS exact_count
FROM events CROSS JOIN t
GROUP BY user_id, t.n
HAVING count(*) >= ceil(CAST(0.008 AS DOUBLE) * t.n)
""",
)
def events_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT φ-heavy hitters through the sketch's two-pass shape
    (operators/sketches.py:heavy_hitters_exact): CMS candidate superset
    → broadcast semi join → exact confirming count → integer threshold.
    The oracle is a PLAIN exact GROUP BY/HAVING over the corpus — by
    the count-min no-false-negative guarantee the two must be equal,
    so this row pins the guarantee end-to-end: a true heavy hitter
    dropped anywhere in the sketch→candidates→confirm chain is a
    driver hash mismatch, not a silent recall loss."""
    from polars_sim_spark.operators.sketches import heavy_hitters_exact

    ev = load_table(spark, sf_dir, "events")
    hh = heavy_hitters_exact(ev, "user_id", phi=0.008)
    return hh.select(F.col("user_id").cast("long").alias("user_id"), "exact_count")


@register(
    "events_value_quantiles_sketch",
    """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT),
                    event_id
         ) AS rn
  FROM events
)
SELECT event_type,
       round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6)  AS p50,
       round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6)  AS p90,
       round(quantile_cont(CAST(value AS DOUBLE), 0.99), 6) AS p99
FROM ranked WHERE rn <= 256
GROUP BY event_type
""",
)
def events_value_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state quantile ESTIMATES (operators/sketches.py:
    quantile_sketch) — closes the 100 TB gap events_value_quantiles
    documents: instead of co-locating every group value for exact
    percentiles, keep the s=256 md5-hash-smallest rows per group (a
    deterministic uniform sample — KLL's sampler with the randomness
    replaced by the engine-portable hash, since classic compaction is
    stream-order-dependent and could never cross-check) and interpolate
    over the sample. The DuckDB oracle reproduces the ESTIMATE to the
    last digit; the rank-error bound vs exact is pinned in
    tests/test_sketches.py, completing the sketch family: cardinality
    (HLL), frequency (CMS), rank (this)."""
    from polars_sim_spark.operators.sketches import quantile_sketch

    ev = load_table(spark, sf_dir, "events")
    return quantile_sketch(
        ev, "event_type", "value", "event_id", [0.5, 0.9, 0.99], s=256
    )


@register(
    "events_hll_users_sharded",
    """
WITH r AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 256 AS b,
         floor(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) / 256) AS rem
  FROM events
),
regs AS (
  SELECT event_type, b,
         max(CASE WHEN rem = 0 THEN 25 ELSE 25 - length(bin(CAST(rem AS BIGINT))) END) AS M
  FROM r GROUP BY 1, 2
),
g AS (
  SELECT event_type, count(*) AS present,
         sum(CAST(power(2, 25 - M) AS BIGINT)) AS s
  FROM regs GROUP BY 1
)
SELECT event_type,
       round(CASE WHEN (CAST(0.7182725932495458 AS DOUBLE) * CAST(2199023255552 AS DOUBLE)
                        / (s + (256 - present) * 33554432)) <= 640.0
                   AND (256 - present) > 0
             THEN 256 * ln(256.0 / (256 - present))
             ELSE CAST(0.7182725932495458 AS DOUBLE) * CAST(2199023255552 AS DOUBLE)
                  / (s + (256 - present) * 33554432)
             END, 4) AS hll_distinct
FROM g
""",
)
def events_hll_users_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY under the oracle gate — the property that
    makes sketches the 100 TB serving-layer answer: build HLL register
    tables on three disjoint shards (as a per-day/per-shard ingest
    would persist them), merge the STORED register rows with
    hll_merge (union + groupBy max — O(shards·groups·m) sketch rows,
    no corpus rescan), and finalize. The oracle is the SINGLE-PASS
    whole-corpus estimator SQL, so the driver hash-checks that
    merge(shard sketches) ≡ sketch(union) digit-for-digit, in both
    engines."""
    from polars_sim_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_merge,
        hll_registers,
    )

    ev = load_table(spark, sf_dir, "events")
    shards = [
        hll_registers(ev.where(F.pmod(F.col("event_id"), F.lit(3)) == i), "event_type", "user_id")
        for i in range(3)
    ]
    return hll_estimate_from_registers(hll_merge(*shards), "event_type")


def ensure_upserted_events_lake(spark: SparkSession, sf_dir: str) -> str:
    """Build the deterministic upserted events lake for ``sf_dir`` if
    absent: write events (narrow columns) hive-partitioned by
    event_type, then apply one fixed SCD1 batch via
    sources/sinks.py:upsert_partitions — update every click with
    event_id % 97 == 0 (value + 1000) and insert a new -event_id click
    row (value 42.0) for event_id % 199 == 0. Both writes are
    deterministic, so the end state is reproducible from the original
    table — which is exactly what the contract row's oracle recomputes.
    A marker file distinguishes 'initial write done' from 'upsert
    applied' so a killed build reruns from scratch."""
    import os

    from polars_sim_spark.queries.vectors import _index_dir
    from polars_sim_spark.sources.sinks import upsert_partitions

    from polars_sim_spark.fsutil import hadoop_delete, hadoop_exists

    path = _index_dir(sf_dir, "events_upsert_lake")
    marker = os.path.join(path, "_UPSERT_APPLIED")
    if hadoop_exists(spark, marker):
        return path
    hadoop_delete(spark, path)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    ev.write.partitionBy("event_type").parquet(path)
    clicks = ev.where(F.col("event_type") == "click")
    updates = clicks.where(F.pmod(F.col("event_id"), F.lit(97)) == 0).select(
        "event_id", "user_id", (F.col("value") + F.lit(1000.0)).alias("value"), "event_type"
    )
    inserts = clicks.where(
        (F.pmod(F.col("event_id"), F.lit(199)) == 0) & (F.col("event_id") > 0)
    ).select(
        (-F.col("event_id")).alias("event_id"),
        "user_id",
        F.lit(42.0).alias("value"),
        "event_type",
    )
    upsert_partitions(
        spark,
        path,
        updates.unionByName(inserts),
        key_cols=["event_id"],
        partition_col="event_type",
    )
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return path


@register(
    "events_upsert_partitions",
    """
WITH up AS (
  SELECT event_id, user_id, value + 1000 AS value, event_type
  FROM events WHERE event_type = 'click' AND event_id % 97 = 0
  UNION ALL
  SELECT -event_id AS event_id, user_id, CAST(42.0 AS DOUBLE) AS value, event_type
  FROM events WHERE event_type = 'click' AND event_id % 199 = 0 AND event_id > 0
)
SELECT event_id, user_id, value, event_type FROM events
WHERE event_id NOT IN (SELECT event_id FROM up)
UNION ALL
SELECT event_id, user_id, value, event_type FROM up
""",
)
def events_upsert_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned lake MERGE (sources/sinks.py:upsert_partitions):
    read back the hive lake after one deterministic SCD1 batch —
    updates replaced their rows, inserts appended, and ONLY the 'click'
    partition was rewritten (dynamic partition overwrite; the other
    four partitions keep byte-identical files — asserted in
    tests/test_sinks.py). The oracle recomputes the merge from the
    ORIGINAL table with plain SQL, so a lost row, duplicated key, or
    corrupted untouched partition anywhere in the
    write→prune→anti-join→overwrite chain is a driver hash mismatch."""
    path = ensure_upserted_events_lake(spark, sf_dir)
    lake = spark.read.parquet(path)
    return lake.select("event_id", "user_id", "value", "event_type")


def _duck_profile_block(col: str) -> str:
    return f"""
SELECT '{col}' AS column, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
       CAST(min({col}) AS VARCHAR) AS min_str,
       CAST(max({col}) AS VARCHAR) AS max_str
FROM t"""


@register(
    "events_profile",
    """
WITH t AS (
  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
         CAST(round(round(value, 6) * 1000000, 0) AS BIGINT) AS value_micro,
         props
  FROM events
)
"""
    + "\nUNION ALL".join(
        _duck_profile_block(c)
        for c in ("event_id", "ts_us", "user_id", "event_type", "value_micro", "props")
    ),
)
def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass dataset profiler (operators/profile.py): null count,
    exact distinct cardinality and native-typed min/max for every
    column of the events table, in long format from ONE aggregate over
    ONE scan (multi-DISTINCT via Catalyst's Expand — the standard
    profiler plan). Timestamps and doubles are pre-canonicalized to
    exact integers (epoch micros / 1e-6 micro-units) so every cell —
    including the stringified extrema — is engine-identical; the oracle
    recomputes all six columns' statistics with plain SQL."""
    from polars_sim_spark.operators.profile import profile_columns

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.round(F.round("value", 6) * 1000000, 0).cast("long").alias("value_micro"),
        "props",
    )
    return profile_columns(ev)


@register(
    "events_drift_tv",
    """
WITH t AS (
  SELECT event_type,
         CAST(round(round(value, 6) * 1000000, 0) AS BIGINT) // 10000000 AS value_bucket,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS s
  FROM events
),
per AS (
  SELECT event_type, value_bucket,
         CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         CAST(sum(s) AS BIGINT) AS cnt_b
  FROM t GROUP BY event_type, value_bucket
),
tot AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS na, CAST(sum(cnt_b) AS BIGINT) AS nb FROM per)
SELECT event_type, value_bucket, cnt_a, cnt_b,
       cnt_a * 1000000 // greatest(na, 1) AS p_micro,
       cnt_b * 1000000 // greatest(nb, 1) AS q_micro,
       abs(cnt_a * 1000000 // greatest(na, 1) - cnt_b * 1000000 // greatest(nb, 1)) AS tv_micro
FROM per, tot
""",
)
def events_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot drift monitoring (operators/profile.py:drift_tv — the
    profiler's monitoring sibling): the events stream's first 15 days
    vs the rest, bucketed by (event_type, 10-unit value bucket), with
    each side's probability mass in EXACT integer micro-units and the
    per-bucket total-variation contribution. One shuffle (tag + union +
    conditional-count aggregate), broadcast totals; no ln/PSI float
    hazards, so the oracle reproduces every cell bit-for-bit."""
    from polars_sim_spark.operators.profile import drift_tv

    ev = load_table(spark, sf_dir, "events").select(
        "ts",
        "event_type",
        F.expr(
            "cast(round(round(value, 6) * 1000000, 0) as bigint) div 10000000"
        ).alias("value_bucket"),
    )
    cut = F.lit("2024-01-16").cast("timestamp")
    out = drift_tv(
        ev.where(F.col("ts") < cut),
        ev.where(F.col("ts") >= cut),
        ["event_type", "value_bucket"],
    )
    return out.select(
        "event_type", "value_bucket", "cnt_a", "cnt_b", "p_micro", "q_micro", "tv_micro"
    )


@register(
    "events_drift_ks",
    """
WITH t AS (
  SELECT CAST(round(round(value, 6) * 1000000, 0) AS BIGINT) // 5000000 AS value_bucket,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS s
  FROM events
),
per AS (
  SELECT value_bucket,
         CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         CAST(sum(s) AS BIGINT) AS cnt_b
  FROM t GROUP BY value_bucket
),
cum AS (
  SELECT value_bucket, cnt_a, cnt_b,
         CAST(sum(cnt_a) OVER () AS BIGINT) AS na,
         CAST(sum(cnt_b) OVER () AS BIGINT) AS nb,
         CAST(sum(cnt_a) OVER (ORDER BY value_bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
         CAST(sum(cnt_b) OVER (ORDER BY value_bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb
  FROM per
)
SELECT value_bucket, cnt_a, cnt_b,
       ca * 1000000 // greatest(na, 1) AS cum_p_micro,
       cb * 1000000 // greatest(nb, 1) AS cum_q_micro,
       abs(ca * 1000000 // greatest(na, 1) - cb * 1000000 // greatest(nb, 1)) AS ks_micro
FROM cum
""",
)
def events_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF drift (operators/profile.py:drift_ks — the ordered-axis
    companion to events_drift_tv): first 15 days vs the rest over
    5-unit value buckets; per bucket, both sides' exact-integer
    cumulative masses and their gap — max(ks_micro)/1e6 is the
    discretized Kolmogorov-Smirnov statistic. Running sums and side
    totals both come from windows over the aggregated bucket table
    (single snapshot pass); all arithmetic is integral division of
    exact integer sums, so the oracle reproduces every cell."""
    from polars_sim_spark.operators.profile import drift_ks

    ev = load_table(spark, sf_dir, "events").select(
        "ts",
        F.expr(
            "cast(round(round(value, 6) * 1000000, 0) as bigint) div 5000000"
        ).alias("value_bucket"),
    )
    cut = F.lit("2024-01-16").cast("timestamp")
    out = drift_ks(
        ev.where(F.col("ts") < cut), ev.where(F.col("ts") >= cut), "value_bucket"
    )
    return out.select(
        "value_bucket", "cnt_a", "cnt_b", "cum_p_micro", "cum_q_micro", "ks_micro"
    )


@register(
    "events_retention_cohorts",
    """
WITH firsts AS (
  SELECT user_id, CAST(min(date_trunc('week', ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST((epoch(date_trunc('week', e.ts)) - epoch(CAST(f.cohort_week AS TIMESTAMP))) // 604800 AS BIGINT) AS week_offset
  FROM events e JOIN firsts f USING (user_id)
),
sizes AS (SELECT cohort_week, count(*) AS cohort_users FROM firsts GROUP BY cohort_week)
SELECT a.cohort_week, a.week_offset,
       CAST(count(*) AS BIGINT) AS active_users,
       CAST(s.cohort_users AS BIGINT) AS cohort_users,
       count(*) * 1000000 // s.cohort_users AS retention_micro
FROM activity a JOIN sizes s USING (cohort_week)
GROUP BY a.cohort_week, a.week_offset, s.cohort_users
""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention-cohort analytics: users grouped by first-seen
    week, per (cohort, week-offset) the count still active and the
    exact-integer retention rate. Relational breadth shape: min-agg for
    cohort assignment, self-join back (the firsts table is
    user-cardinality — broadcastable for dimension-sized user sets,
    shuffled hash join at 100 TB where both sides hash by user_id), one
    distinct + one aggregate. Week arithmetic in epoch seconds —
    integral, engine-identical."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.expr(
                "(unix_timestamp(date_trunc('week', ts)) - unix_timestamp(cast(cohort_week as timestamp))) div 604800"
            ).alias("week_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_users"))
    return (
        activity.join(sizes, "cohort_week")
        .groupBy("cohort_week", "week_offset", "cohort_users")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            "cohort_users",
            F.expr("active_users * 1000000 div cohort_users").alias("retention_micro"),
        )
    )


@register(
    "events_expectations",
    """
WITH t AS (SELECT * FROM events)
SELECT 'event_id_not_null' AS rule,
       CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
       CAST(count(*) AS BIGINT) AS n_rows FROM t
UNION ALL
SELECT 'user_id_not_null',
       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(*) AS BIGINT) FROM t
UNION ALL
SELECT 'value_non_negative',
       CAST(sum(CASE WHEN value IS NULL OR value < 0 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(*) AS BIGINT) FROM t
UNION ALL
SELECT 'event_type_accepted',
       CAST(sum(CASE WHEN event_type NOT IN ('click','view','purchase','signup','error')
                     OR event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(*) AS BIGINT) FROM t
UNION ALL
SELECT 'ts_in_2024',
       CAST(sum(CASE WHEN ts IS NULL OR ts < TIMESTAMP '2024-01-01'
                     OR ts >= TIMESTAMP '2025-01-01' THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(*) AS BIGINT) FROM t
UNION ALL
SELECT 'unique_event_id',
       CAST(sum(CASE WHEN event_id IS NOT NULL THEN 1 ELSE 0 END)
            - count(DISTINCT event_id) AS BIGINT),
       CAST(count(*) AS BIGINT) FROM t
""",
)
def events_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract validation (operators/profile.py
    check_expectations): six expectations over the events table — null
    checks, a range, an accepted-values set, a time-window sanity rule,
    and event_id uniqueness — ALL evaluated in one aggregate over one
    scan (uniqueness folds in as non-null-count − distinct-count). The
    oracle recomputes every violation count with plain SQL; the green
    state this pins is 'zero violations on the contract corpus', so any
    ingestion regression that nulls, duplicates, or range-breaks a
    column flips a cell and fails the hash."""
    from polars_sim_spark.operators.profile import check_expectations

    ev = load_table(spark, sf_dir, "events")
    rules = {
        "event_id_not_null": F.col("event_id").isNull(),
        "user_id_not_null": F.col("user_id").isNull(),
        "value_non_negative": F.col("value").isNull() | (F.col("value") < 0),
        "event_type_accepted": F.col("event_type").isNull()
        | ~F.col("event_type").isin("click", "view", "purchase", "signup", "error"),
        "ts_in_2024": F.col("ts").isNull()
        | (F.col("ts") < F.lit("2024-01-01").cast("timestamp"))
        | (F.col("ts") >= F.lit("2025-01-01").cast("timestamp")),
    }
    return check_expectations(ev, rules, unique_cols=["event_id"])


@register(
    "events_profile_sketch",
    """
WITH t AS (
  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
         CAST(round(round(value, 6) * 1000000, 0) AS BIGINT) AS value_micro,
         props
  FROM events
),
u AS (
  SELECT 'event_id' AS "column", CAST(event_id AS VARCHAR) AS val FROM t
  UNION ALL SELECT 'ts_us', CAST(ts_us AS VARCHAR) FROM t
  UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM t
  UNION ALL SELECT 'event_type', event_type FROM t
  UNION ALL SELECT 'value_micro', CAST(value_micro AS VARCHAR) FROM t
  UNION ALL SELECT 'props', props FROM t
),
r AS (
  SELECT "column",
         CAST(('0x' || substr(md5(val), 1, 8)) AS BIGINT) % 256 AS b,
         floor(CAST(('0x' || substr(md5(val), 1, 8)) AS BIGINT) / 256) AS rem
  FROM u WHERE val IS NOT NULL
),
regs AS (
  SELECT "column", b,
         max(CASE WHEN rem = 0 THEN 25 ELSE 25 - length(bin(CAST(rem AS BIGINT))) END) AS M
  FROM r GROUP BY 1, 2
),
g AS (
  SELECT "column", count(*) AS present,
         sum(CAST(power(2, 25 - M) AS BIGINT)) AS s
  FROM regs GROUP BY 1
)
SELECT "column",
       round(CASE WHEN (CAST(0.7182725932495458 AS DOUBLE) * CAST(2199023255552 AS DOUBLE)
                        / (s + (256 - present) * 33554432)) <= 640.0
                   AND (256 - present) > 0
             THEN 256 * ln(256.0 / (256 - present))
             ELSE CAST(0.7182725932495458 AS DOUBLE) * CAST(2199023255552 AS DOUBLE)
                  / (s + (256 - present) * 33554432)
             END, 4) AS hll_distinct
FROM g
""",
)
def events_profile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The profiler's 100 TB cardinality path made real (the swap
    ``events_profile``'s docstring promises): per-column DISTINCT
    estimates from the deterministic HLL family instead of the exact
    multi-DISTINCT Expand — register state is O(columns × 256) at any
    corpus size where the exact form's hash table grows with true
    cardinality. Columns unpivot map-side (``stack`` in the scan
    stage), then ONE sketch aggregate serves all six columns; the
    ESTIMATES are digit-for-digit oracle-reproduced like every sketch
    row."""
    from polars_sim_spark.operators.sketches import hll_distinct

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.round(F.round("value", 6) * 1000000, 0).cast("long").alias("value_micro"),
        "props",
    )
    cols = ["event_id", "ts_us", "user_id", "event_type", "value_micro", "props"]
    stack_args = ", ".join(f"'{c}', cast({c} as string)" for c in cols)
    long = ev.selectExpr(f"stack({len(cols)}, {stack_args}) as (column, val)").where(
        F.col("val").isNotNull()
    )
    return hll_distinct(long, "column", "val")


@register(
    "events_robust_anomalies",
    """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type, value AS med FROM ranked WHERE rn = (n + 1) // 2
),
dev AS (
  SELECT e.event_id, e.event_type, e.value, m.med,
         CAST(round(round(abs(e.value - m.med), 6) * 1000000, 0) AS BIGINT) AS dev_micro
  FROM events e JOIN med m ON e.event_type = m.event_type
),
dranked AS (
  SELECT event_type, dev_micro,
         row_number() OVER (PARTITION BY event_type ORDER BY dev_micro, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type, dev_micro AS mad_micro FROM dranked WHERE rn = (n + 1) // 2
)
SELECT d.event_id, d.event_type, d.value, d.med, d.dev_micro, m.mad_micro
FROM dev d JOIN mad m ON d.event_type = m.event_type
WHERE d.dev_micro * 10000 > m.mad_micro * 44478
""",
)
def events_robust_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: flag events whose absolute
    deviation from the type's median exceeds 3 x 1.4826 x MAD (the robust
    z-score rule; 1.4826 makes MAD a consistent sigma estimate).  Medians
    are LOWER medians picked by exact rank selection — a data value, not
    an interpolation — and deviations are compared in integer micro-units
    (dev_micro*10000 > mad_micro*44478), so no float rounding ever enters
    the engine comparison and every row hash-matches the oracle.  Exact
    per-group rank selection needs group co-location (the same shuffle
    bound events_value_quantiles documents); at 100 TB swap the median
    for the deterministic KLL-class sketch estimate
    (events_value_quantiles_sketch) and the flag rule is unchanged."""
    from polars_sim_spark.operators.profile import (
        flag_robust_anomalies,
        robust_group_stats,
    )

    ev = load_table(spark, sf_dir, "events")
    stats = robust_group_stats(
        ev, group_col="event_type", value_col="value", id_col="event_id"
    )
    return flag_robust_anomalies(
        ev.select("event_id", "event_type", "value"),
        stats,
        group_col="event_type",
        value_col="value",
    ).select("event_id", "event_type", "value", "med", "dev_micro", "mad_micro")


@register(
    "events_value_deciles",
    """
WITH r AS (
  SELECT event_id, value,
         row_number() OVER (ORDER BY value, event_id) AS rank,
         count(*) OVER () AS n
  FROM events
)
SELECT event_id, value, rank,
       CAST(CASE WHEN rank <= (n % 10) * ((n + 9) // 10)
                 THEN (rank - 1) // ((n + 9) // 10) + 1
                 ELSE (n % 10) + (rank - (n % 10) * ((n + 9) // 10) - 1) // (n // 10) + 1
            END AS INT) AS bucket
FROM r
""",
)
def events_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global rank + exact decile of every event value WITHOUT a global
    window (operators/ranking.py: range repartition, parallel local
    row_numbers, |partitions|-row offset lift — the same two-level trick
    pack_shards uses, applied to value order).  The oracle runs the
    single-sort global window the operator exists to avoid, with the
    ntile rule spelled out as integer arithmetic so both engines
    evaluate the identical expression."""
    from polars_sim_spark.operators.ranking import ntile_exact

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    return ntile_exact(
        ev, ["value", "event_id"], 10, rank_col="rank", out_col="bucket"
    ).select("event_id", "value", "rank", "bucket")


@register(
    "events_markov_transitions",
    """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
),
c AS (
  SELECT event_type AS src, next_type AS dst, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT src, dst, n,
       CAST((n * 1000000) // sum(n) OVER (PARTITION BY src) AS BIGINT) AS p_micro
FROM c
""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    — the "what follows what" table behind session modeling and synthetic
    sequence generation.  One shuffle keyed by user (the lead window),
    one narrow (src, dst) agg; transition probabilities are exact integer
    micro-units (``n*10^6 div row_total`` — the row total rides a window
    over the already-aggregated |types|² table, never a second agg
    branch).  Deterministic sequence order (ts, event_id) ties."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).where(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("src"), F.col("next_type").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n",
        F.expr(f"(n * 1000000)").alias("__num"),
        F.sum("n").over(wt).alias("__tot"),
    ).select(
        "src", "dst", "n", F.expr("__num div __tot").cast("long").alias("p_micro")
    )

"""Event-stream catalog entries over `events` (SURVEY §2.10 batch twins).

Each entry is the deterministic batch twin of a streaming operator in
`pandasvcf_spark.streaming.events`; the pytest suite separately asserts
stream(availableNow) ≡ batch on the same input. Time arithmetic is integer
epoch math (never raw timestamps) so engine timestamp canonicalization and
session timezones can't skew the comparison: Spark casts its microsecond
TIMESTAMP to epoch seconds, DuckDB integer-divides epoch_us.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pandasvcf_spark.functions.maps import json_field_expr
from pandasvcf_spark.operators.relational import rank_per_group
from pandasvcf_spark.queries.registry import register
from pandasvcf_spark.queries.tables import load

#: epoch seconds of ts, truncated — identical on both sides.
_SEC = "(epoch_us(ts) // 1000000)"


@register(
    "e_tumbling_hourly",
    headline=True,
    oracle=f"""
    SELECT ({_SEC} // 3600) * 3600 AS win_start, event_type,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def e_tumbling_hourly(spark, sf_dir):
    """Tumbling 1h window counts — batch twin of
    streaming.events.tumbling_counts (same grouped-agg plan; the streaming
    variant adds watermarked state)."""
    ev = load(spark, sf_dir, "events")
    win = ((F.col("ts").cast("long") / 3600).cast("long") * 3600).alias("win_start")
    return ev.groupBy(
        F.floor(F.col("ts").cast("long") / 3600).cast("long").alias("__h"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    ).select(
        (F.col("__h") * 3600).alias("win_start"), "event_type", "n", "sum_value"
    )


@register(
    "e_sliding_2h",
    oracle=f"""
    WITH h AS (SELECT ({_SEC} // 3600) * 3600 AS hs FROM events),
    contrib AS (
      SELECT hs AS win_start FROM h
      UNION ALL
      SELECT hs - 3600 FROM h)
    SELECT win_start, count(*) AS n FROM contrib GROUP BY 1
    """,
)
def e_sliding_2h(spark, sf_dir):
    """Sliding 2h/1h window counts — each event lands in two overlapping
    windows (epoch-aligned, matching Spark's window() alignment)."""
    ev = load(spark, sf_dir, "events")
    win = F.window("ts", "2 hours", "1 hour")
    return (
        ev.groupBy(win.alias("__w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("__w").start.cast("long").alias("win_start"), "n")
    )


@register(
    "e_props_json",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           round(avg(CAST(props->>'$.k' AS BIGINT)), 4) AS avg_k
    FROM events GROUP BY event_type
    """,
)
def e_props_json(spark, sf_dir):
    """JSON property extraction (functions/maps.json_field_expr) + grouped
    stats — the events.props analogue of VCF INFO parsing."""
    ev = load(spark, sf_dir, "events")
    k = json_field_expr("props", "k", "long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


@register(
    "e_sessionize",
    headline=True,
    oracle="""
    WITH t AS (
      SELECT user_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_us
      FROM events)
    SELECT user_id,
           CAST(sum(CASE WHEN prev_us IS NULL
                         OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sessions
    FROM t GROUP BY user_id
    """,
)
def e_sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization (30-min gap): the batch twin of the
    streaming session_window operator. Session starts = rows whose gap to
    the previous event exceeds the threshold."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    prev = F.lag(us).over(w)
    new_sess = F.when(prev.isNull() | ((us - prev) > 1_800_000_000), 1).otherwise(0)
    return (
        ev.withColumn("__ns", new_sess)
        .groupBy("user_id")
        .agg(F.sum("__ns").cast("long").alias("n_sessions"))
    )


@register(
    "j_asof_events",
    headline=True,
    oracle=f"""
    WITH v AS (
      SELECT user_id, ts, round(max(value), 2) AS view_value
      FROM events WHERE event_type = 'view' GROUP BY 1, 2),
    c AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id, ({_SEC.replace('ts', 'c.ts')}) AS ts_s,
           (epoch_us(v.ts) // 1000000) AS view_ts_s, v.view_value
    FROM c ASOF LEFT JOIN v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def j_asof_events(spark, sf_dir):
    """Point-in-time as-of join (operators/relational.asof_join): each
    purchase matched to the user's LATEST view at-or-before purchase time —
    the no-future-leak lookup feature pipelines need. The right side is
    pre-aggregated unique per (user_id, ts) so the greatest-<= match is a
    single deterministic row on both engines (DuckDB ASOF JOIN is the
    oracle). Spark plan: union + one per-user window, zero join nodes."""
    from pandasvcf_spark.operators.relational import asof_join

    ev = load(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("view_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(purchases, views, on="ts", by=["user_id"])
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_s"),
        F.col("matched_ts").cast("long").alias("view_ts_s"),
        F.col("matched_view_value").alias("view_value"),
    )


@register(
    "j_range_events",
    oracle=f"""
    WITH e AS (
      SELECT event_id AS error_id, user_id, {_SEC} AS s FROM events
      WHERE event_type = 'error'),
    c AS (
      SELECT event_id, user_id, {_SEC} AS s FROM events
      WHERE event_type = 'click')
    SELECT e.error_id,
           CAST(count(c.event_id) AS BIGINT) AS n_clicks
    FROM e LEFT JOIN c
      ON e.user_id = c.user_id AND c.s BETWEEN e.s AND e.s + 600
    GROUP BY 1
    """,
)
def j_range_events(spark, sf_dir):
    """Interval-containment join (operators/relational.range_join): per
    error event, how many clicks the same user made in the following 10
    minutes. Spark side is the banded equi-join (bin-bucketed, zero theta
    joins); DuckDB oracle is the plain BETWEEN left join. Past the driver
    window by design — exact-checked every run by check_contract and the
    tests/test_contract.py guard."""
    from pandasvcf_spark.operators.relational import range_join

    ev = load(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        sec.alias("start_s"),
        (sec + 600).alias("end_s"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", sec.alias("s")
    )
    matched = range_join(
        clicks, errors, "s", "start_s", "end_s", by=["user_id"], bin_width=600
    )
    counts = matched.groupBy("error_id").agg(
        F.count(F.lit(1)).alias("__n")
    )
    # left-complete: errors with zero clicks keep a row (count 0)
    return (
        errors.select("error_id")
        .join(F.broadcast(counts), on="error_id", how="left")
        .select(
            "error_id", F.coalesce(F.col("__n"), F.lit(0)).alias("n_clicks")
        )
    )


@register(
    "e_join_recent",
    oracle="""
    WITH c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
         v AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'view')
    SELECT c.event_id AS click_id, CAST(count(*) AS BIGINT) AS n_recent_views
    FROM c JOIN v ON c.user_id = v.user_id
       AND v.ts >= c.ts - INTERVAL 10 MINUTE AND v.ts <= c.ts
    GROUP BY 1
    """,
)
def e_join_recent(spark, sf_dir):
    """Batch twin of the stream-stream interval join
    (streaming/events.join_recent): per click, the user's views in the
    preceding 10 minutes. The streaming variant watermarks BOTH sides so
    the join state stays bounded; the pytest suite asserts stream ≡ batch,
    and this entry closes the loop batch ≡ oracle. Past the driver window
    (contract-guard covered)."""
    from pandasvcf_spark.streaming.events import join_recent

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    joined = join_recent(clicks, views, within="10 minutes")
    return joined.groupBy(F.col("event_id").alias("click_id")).agg(
        F.count(F.lit(1)).alias("n_recent_views")
    )


@register(
    "e_dedup_first",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id FROM (
      SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events) WHERE rn = 1
    """,
)
def e_dedup_first(spark, sf_dir):
    """Keyed dedup keeping the earliest event — deterministic batch twin of
    streaming dropDuplicatesWithinWatermark (streaming.events.dedup_events)."""
    ev = load(spark, sf_dir, "events")
    out = rank_per_group(
        ev, ["user_id", "event_type"], ["ts", "event_id"], k=1, method="row_number"
    )
    return out.select(
        "user_id", "event_type", F.col("event_id").alias("first_event_id")
    )


@register(
    "e_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             list(CASE event_type WHEN 'view' THEN 1 WHEN 'signup' THEN 2
                                  WHEN 'purchase' THEN 3 END
                  ORDER BY ts, CASE event_type WHEN 'view' THEN 1
                               WHEN 'signup' THEN 2
                               WHEN 'purchase' THEN 3 END) AS evs
      FROM events
      WHERE event_type IN ('view', 'signup', 'purchase')
        AND event_id % 17 = 0
      GROUP BY user_id),
    done AS (
      SELECT user_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                            list_transform(evs, s -> CAST(s AS BIGINT))),
               (acc, s) -> CASE WHEN s = acc + 1 THEN acc + 1 ELSE acc END)
               AS steps_completed
      FROM per_user)
    SELECT CAST(steps_completed AS INT) AS steps_completed,
           count(*) AS n_users
    FROM done GROUP BY 1
    """,
)
def e_funnel(spark, sf_dir):
    """Ordered funnel histogram (operators/relational.event_funnel):
    how many users progressed view → signup → purchase IN ORDER. One
    groupBy + one HOF fold — never the k-1 self-joins of the naive
    k-step funnel; per-user state is the user's own event list (the
    sessionization contract). The oracle replays the same fold with
    DuckDB's list_reduce."""
    from pandasvcf_spark.operators.relational import event_funnel

    # thin the stream deterministically so the histogram discriminates
    # (every user completes any fixed 3-sequence on the full dense table)
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 17 == 0)
    per_user = event_funnel(
        ev, "user_id", "event_type", "ts", ["view", "signup", "purchase"]
    )
    return (
        per_user.groupBy("steps_completed")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "j_interval_overlap",
    oracle="""
    WITH a AS (
      SELECT user_id, event_id AS a_id,
             epoch_us(ts) // 1000000 AS a_s,
             epoch_us(ts) // 1000000 + 300 AS a_e
      FROM events WHERE event_type = 'signup'),
    b AS (
      SELECT user_id, event_id AS b_id,
             epoch_us(ts) // 1000000 AS b_s,
             epoch_us(ts) // 1000000 + 600 AS b_e
      FROM events WHERE event_type = 'purchase')
    SELECT a.user_id, a_id, b_id,
           CAST(least(a_e, b_e) - greatest(a_s, b_s) + 1 AS BIGINT)
             AS overlap_len
    FROM a JOIN b ON a.user_id = b.user_id
     AND least(a_e, b_e) - greatest(a_s, b_s) + 1 >= 1
    """,
)
def j_interval_overlap(spark, sf_dir):
    """Interval x interval overlap join (operators/relational.
    interval_overlap_join — the bedtools-intersect family): signup
    5-minute windows overlapped with purchase 10-minute windows per
    user. Banded equi-join; a pair meeting in many shared bins is kept
    at its FIRST shared bin by a per-row predicate — no distinct()
    dedup shuffle. The oracle is the direct theta join (fine at oracle
    scale; the theta plan is exactly what the operator exists to avoid
    at 100 TB)."""
    from pandasvcf_spark.operators.relational import interval_overlap_join

    ev = load(spark, sf_dir, "events")
    epoch = (F.unix_timestamp("ts")).cast("long")
    a = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("a_id"),
        epoch.alias("a_s"),
        (epoch + 300).alias("a_e"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("b_id"),
        epoch.alias("b_s"),
        (epoch + 600).alias("b_e"),
    )
    out = interval_overlap_join(
        a, b, "a_s", "a_e", "b_s", "b_e", by=["user_id"], bin_width=600
    )
    return out.select("user_id", "a_id", "b_id", "overlap_len")


@register(
    "e_rate_anomaly",
    oracle="""
    WITH c AS (
      SELECT (epoch_us(ts) // 1000000) // 3600 AS bucket, count(*) AS n
      FROM events GROUP BY 1),
    s AS (SELECT avg(n) AS mu, stddev_pop(n) AS sd FROM c)
    SELECT bucket, n,
           CASE WHEN sd > 0 THEN round((n - mu) / sd, 4) END AS z,
           CASE WHEN sd > 0 THEN abs((n - mu) / sd) >= 2.0 END
             AS is_anomaly
    FROM c, s
    """,
)
def e_rate_anomaly(spark, sf_dir):
    """Hourly volume-anomaly screen (operators/relational.rate_anomaly):
    z-score of each epoch-hour's event count against the stream's own
    bucket distribution, |z| >= 2 flagged. One partial-agged bucket
    count + a 1-row broadcast of mean/stddev — the corpus never leaves
    the scan un-aggregated. The oracle replays buckets, moments and the
    threshold."""
    from pandasvcf_spark.operators.relational import rate_anomaly

    ev = load(spark, sf_dir, "events")
    return rate_anomaly(ev, "ts", bucket_seconds=3600, z_threshold=2.0)


@register(
    "e_ewma",
    oracle="""
    WITH seq AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS xs
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id)
    SELECT user_id AS key,
           CAST(len(xs) AS BIGINT) AS n_events,
           round(list_reduce(xs, (acc, x) -> 0.3 * x + 0.7 * acc), 4)
             AS ewma
    FROM seq
    """,
)
def e_ewma(spark, sf_dir):
    """Per-user EWMA of event values (operators/relational.ewma_last,
    α=0.3, initialize-with-first convention): sequential per-key state
    as one groupBy + one HOF fold over the user's own ts-ordered values
    — the sessionization/funnel contract, never a per-row window
    re-scan. The oracle replays the identical fold with DuckDB's
    list_reduce (which also inits with the first element)."""
    from pandasvcf_spark.operators.relational import ewma_last

    ev = load(spark, sf_dir, "events")
    return ewma_last(ev, "user_id", ["ts", "event_id"], "value", alpha=0.3)


@register(
    "e_retention",
    oracle="""
    WITH p AS (
      SELECT user_id, epoch_us(ts) // 1000000 // 604800 AS per
      FROM events),
    c AS (SELECT user_id, min(per) AS cohort FROM p GROUP BY user_id),
    act AS (
      SELECT DISTINCT p.user_id, c.cohort, p.per - c.cohort AS age
      FROM p JOIN c USING (user_id)),
    m AS (SELECT cohort, age, count(DISTINCT user_id) AS n_active
          FROM act GROUP BY 1, 2),
    s AS (SELECT cohort, n_active AS cohort_size FROM m WHERE age = 0)
    SELECT CAST(m.cohort AS BIGINT) AS cohort_period,
           CAST(m.age AS BIGINT) AS age,
           CAST(m.n_active AS BIGINT) AS n_active,
           round(m.n_active / CAST(s.cohort_size AS DOUBLE), 4) AS retention
    FROM m JOIN s USING (cohort)
    """,
)
def e_retention(spark, sf_dir):
    """Weekly cohort retention matrix (operators/relational.
    retention_matrix): users bucketed by first-activity epoch week, each
    later week reporting the returning fraction. Integer epoch buckets
    (no calendar truncation — timezone-proof on both engines); one
    user shuffle + one partial-agged count-distinct + a broadcast of the
    per-cohort sizes."""
    from pandasvcf_spark.operators.relational import retention_matrix

    ev = load(spark, sf_dir, "events")
    return retention_matrix(ev, "user_id", "ts")


@register(
    "e_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_type) AS to_type
      FROM events)
    SELECT from_type, to_type, count(*) AS n
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def e_transitions(spark, sf_dir):
    """Markov transition counts over per-user event sequences
    (operators/relational.transition_counts): one lead window on the
    user key + a partial-aggregated pair count (vocab² rows of shuffle
    after partial agg). Deterministic tie order (ts, type) replayed by
    the oracle's lead window."""
    from pandasvcf_spark.operators.relational import transition_counts

    return transition_counts(
        load(spark, sf_dir, "events"), "user_id", "event_type", "ts"
    )


@register(
    "e_assoc_rules",
    oracle="""
    WITH bi AS (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    nb AS (SELECT count(DISTINCT user_id) AS n FROM bi),
    ic AS (SELECT event_type AS item, count(*) AS ni FROM bi GROUP BY 1),
    pr AS (
      SELECT a.event_type AS item_a, b.event_type AS item_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM bi a JOIN bi b
        ON a.user_id = b.user_id AND a.event_type <> b.event_type
      GROUP BY 1, 2)
    SELECT item_a, item_b, n_both,
           round(n_both / CAST(nb.n AS DOUBLE), 6) AS support,
           round(n_both / CAST(ia.ni AS DOUBLE), 6) AS confidence,
           round((n_both / CAST(ia.ni AS DOUBLE))
                 / (CAST(ib.ni AS DOUBLE) / CAST(nb.n AS DOUBLE)), 6)
             AS lift
    FROM pr, nb
    JOIN ic ia ON ia.item = pr.item_a
    JOIN ic ib ON ib.item = pr.item_b
    """,
)
def e_assoc_rules(spark, sf_dir):
    """Pairwise association rules (operators/relational.assoc_rules;
    Agrawal & Srikant 1994 market-basket 2-itemsets) over per-user
    event-type baskets: one basket groupBy packs vocabulary-bounded
    item sets, a HOF expands within-basket ordered pairs (the
    king_kinship panel shape), one partial-agged pair count, and
    vocabulary-sized item counts broadcast back for
    support/confidence/lift. The oracle affords the naive per-basket
    self-join and replays the three ratios in Spark's division order."""
    from pandasvcf_spark.operators.relational import assoc_rules

    return assoc_rules(load(spark, sf_dir, "events"), "user_id", "event_type")


_HLL_MIX = (
    "xor((xor((xor(h0, h0 // 65536) * 73244475) % 4294967296, "
    "((xor(h0, h0 // 65536) * 73244475) % 4294967296) // 65536) "
    "* 73244475) % 4294967296, "
    "((xor((xor(h0, h0 // 65536) * 73244475) % 4294967296, "
    "((xor(h0, h0 // 65536) * 73244475) % 4294967296) // 65536) "
    "* 73244475) % 4294967296) // 65536)"
)

_POLY_UID = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split(CAST(user_id AS VARCHAR), ''), "
    "c -> CAST(ascii(c) AS BIGINT))), (acc, c) -> (acc * 31 + c) "
    "% 2147483647)"
)


@register(
    "sk_hll_groups",
    oracle=f"""
    WITH ph AS (
      SELECT event_type, {_POLY_UID} AS h0
      FROM events WHERE user_id IS NOT NULL),
    mx AS (SELECT event_type, {_HLL_MIX} AS h FROM ph),
    regs AS (
      SELECT event_type, CAST(h % 256 AS INT) AS bucket,
             max(CASE WHEN h // 256 > 0
                      THEN 24 - CAST(floor(log2(h // 256)) AS INT)
                      ELSE 25 END) AS rho
      FROM mx GROUP BY 1, 2),
    agg AS (SELECT event_type, CAST(count(*) AS INT) AS hit,
                   sum(power(2.0, -rho)) AS s
            FROM regs GROUP BY 1)
    SELECT event_type, CAST(256 - hit AS INT) AS n_zero,
           round(CASE WHEN (0.7213 / (1.0 + 1.079 / 256)) * 65536
                           / (s + (256 - hit)) <= 640.0
                       AND hit < 256
                      THEN 256.0 * ln(256.0 / (256 - hit))
                      ELSE (0.7213 / (1.0 + 1.079 / 256)) * 65536
                           / (s + (256 - hit)) END, 4) AS estimate
    FROM agg
    """,
)
def sk_hll_groups(spark, sf_dir):
    """Grouped HyperLogLog (operators/sketches.hll_group_estimate):
    distinct users per event type in one register pipeline — at most
    groups × 256 cells after map-side combine, whatever the event
    volume. Same bit-exact replay as sk_hll_distinct, group-wise: the
    mix chain is integer arithmetic and the harmonic sum's dyadic terms
    are order-independent-exact in doubles."""
    from pandasvcf_spark.operators.sketches import hll_group_estimate

    d = load(spark, sf_dir, "events")
    out = hll_group_estimate(d, ["event_type"], "user_id", m=256)
    return out.select(
        "event_type", "n_zero", F.round("estimate", 4).alias("estimate")
    )


@register(
    "e_resample_ffill",
    oracle="""
    WITH obs AS (
      SELECT user_id AS k, CAST(floor(epoch(ts)) AS BIGINT) AS t,
             max(value) AS v
      FROM events GROUP BY 1, 2),
    span AS (SELECT k, min(t) AS lo, max(t) AS hi FROM obs GROUP BY k),
    grid AS (
      SELECT k, unnest(generate_series(
        CAST(floor(lo / 21600) * 21600 AS BIGINT), hi, 21600)) AS t
      FROM span),
    u AS (
      SELECT k, t, v, 0 AS g FROM obs
      UNION ALL
      SELECT k, t, CAST(NULL AS DOUBLE), 1 FROM grid),
    f AS (
      SELECT k, t, g,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY t, g
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
      FROM u)
    SELECT k AS user_id, t AS grid_ts, fv AS value
    FROM f WHERE g = 1
    """,
)
def e_resample_ffill(spark, sf_dir):
    """Regular-grid resampling with forward fill (operators/relational.
    resample_ffill; pandas resample().ffill() / timescaledb locf) of
    per-user event values onto a 6-hour grid: per-key span agg, epoch-
    int grid explode, one union+window fill — the asof_join device, no
    join node. Duplicate (user, second) observations collapse to max
    first (the documented precondition). Values pass through
    unchanged, so no rounding is needed; the oracle replays the grid,
    the tag order and the IGNORE NULLS carry."""
    from pandasvcf_spark.operators.relational import resample_ffill

    d = load(spark, sf_dir, "events")
    obs = (
        d.select(
            "user_id",
            F.col("ts").cast("timestamp").cast("long").alias("sec"),
            "value",
        )
        .groupBy("user_id", "sec")
        .agg(F.max("value").alias("value"))
        .select(
            "user_id", F.col("sec").cast("timestamp").alias("ts"), "value"
        )
    )
    return resample_ffill(obs, "user_id", "ts", "value", 21600)


@register(
    "e_cusum",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id, value,
             sum(value - 55.0) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
      FROM events)
    SELECT user_id, event_id,
           round(pp - least(0, min(pp) OVER w2), 6) AS cusum,
           round(pp - least(0, min(pp) OVER w2), 6) > 500.0 AS alarm
    FROM p
    WINDOW w2 AS (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def e_cusum(spark, sf_dir):
    """One-sided CUSUM change-point scores (operators/relational.
    cusum_scores; Page 1954) per user over event values, drift 55
    (≈ mean + 0.1σ of the fixture), alarm at 500: the nonlinear
    S_t = max(0, S_{t-1} + x − k) recursion in its prefix-sum closed
    form — two cumulative windows sharing ONE (user, event-order)
    exchange, no fold state, arbitrarily long histories. The oracle
    replays both windows and the rounded-threshold alarm."""
    from pandasvcf_spark.operators.relational import cusum_scores

    d = load(spark, sf_dir, "events")
    out = cusum_scores(
        d, "user_id", "event_id", "value", drift=55.0, threshold=500.0
    )
    return out.select("user_id", "event_id", "cusum", "alarm")


_POLY_BOOT = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split("
    "CAST(event_id AS VARCHAR) || '#' || CAST(r AS VARCHAR), ''), "
    "c -> CAST(ascii(c) AS BIGINT))), (acc, c) -> (acc * 31 + c) "
    "% 2147483647)"
)

_BOOT_W = (
    "(CASE WHEN u32 >= 1580030168 THEN 1 ELSE 0 END)"
    " + (CASE WHEN u32 >= 3160060337 THEN 1 ELSE 0 END)"
    " + (CASE WHEN u32 >= 3950075421 THEN 1 ELSE 0 END)"
    " + (CASE WHEN u32 >= 4213413783 THEN 1 ELSE 0 END)"
    " + (CASE WHEN u32 >= 4279248373 THEN 1 ELSE 0 END)"
    " + (CASE WHEN u32 >= 4292415291 THEN 1 ELSE 0 END)"
    " + (CASE WHEN u32 >= 4294609777 THEN 1 ELSE 0 END)"
    " + (CASE WHEN u32 >= 4294923276 THEN 1 ELSE 0 END)"
)


@register(
    "m_bootstrap_ci",
    oracle=f"""
    WITH s AS (
      SELECT event_id, CAST(value AS DOUBLE) AS x
      FROM events WHERE value IS NOT NULL),
    ex AS (
      SELECT s.event_id, s.x, reps.r
      FROM s, (SELECT unnest(range(0, 20)) AS r) reps),
    hh AS (SELECT x, r, {_POLY_BOOT} AS h0 FROM ex),
    uu AS (SELECT x, r, {_HLL_MIX} AS u32 FROM hh),
    ww AS (SELECT r, x, {_BOOT_W} AS w FROM uu),
    m AS (
      SELECT r, sum(w * x) / sum(w) AS mv
      FROM ww GROUP BY r HAVING sum(w) > 0),
    ranked AS (
      SELECT mv, row_number() OVER (ORDER BY mv) AS rn,
             count(*) OVER () AS nr
      FROM m),
    band AS (
      SELECT max(CASE WHEN rn = greatest(1, CAST(ceil(nr * 0.025)
                   AS BIGINT)) THEN mv END) AS lo,
             max(CASE WHEN rn = greatest(1, CAST(ceil(nr * 0.975)
                   AS BIGINT)) THEN mv END) AS hi,
             stddev_samp(mv) AS se,
             CAST(count(*) AS BIGINT) AS nr
      FROM ranked),
    pt AS (
      SELECT CAST(count(*) AS BIGINT) AS n, avg(x) AS mean_v FROM s)
    SELECT n, CAST(nr AS INT) AS n_reps,
           round(mean_v, 6) + 0.0 AS mean,
           round(se, 6) + 0.0 AS boot_se,
           round(lo, 6) + 0.0 AS ci_lo,
           round(hi, 6) + 0.0 AS ci_hi
    FROM pt, band
    """,
)
def m_bootstrap_ci(spark, sf_dir):
    """Deterministic Poisson-bootstrap 95% CI for mean(events.value)
    (operators/sampling.poisson_bootstrap_ci; Chamandy et al. 2012) —
    uncertainty quantification that resamples by HASH WEIGHT, the only
    bootstrap that distributes: weight(key, replicate) =
    Poisson⁻¹(mix32(poly_hash(key∥'#'∥r))/2³²) via an all-integer
    threshold ladder, bit-exact across engines. The corpus explodes
    ×20 replicates but collapses to 20 partial-agged rows in the same
    stage; everything downstream runs on the replicate-means table.
    The oracle replays hash, ladder, weighted means, type-1 band ranks
    and the bootstrap SE term-for-term."""
    from pandasvcf_spark.operators.sampling import poisson_bootstrap_ci

    e = load(spark, sf_dir, "events")
    return poisson_bootstrap_ci(e, "value", "event_id", n_reps=20)


@register(
    "m_ols",
    oracle="""
    WITH s AS (
      SELECT CAST(value AS DOUBLE) AS y,
             CAST(hour(ts) AS DOUBLE) AS x1,
             CAST(user_id % 7 AS DOUBLE) AS x2
      FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL
        AND user_id IS NOT NULL),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(x1) AS s1, sum(x2) AS s2,
             sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
             sum(x2 * x2) AS s22,
             sum(y) AS sy, sum(x1 * y) AS s1y, sum(x2 * y) AS s2y,
             sum(y * y) AS syy
      FROM s),
    det AS (
      SELECT *,
             n * (s11 * s22 - s12 * s12)
             - s1 * (s1 * s22 - s12 * s2)
             + s2 * (s1 * s12 - s11 * s2) AS d0
      FROM m),
    beta AS (
      SELECT *,
             (sy * (s11 * s22 - s12 * s12)
              - s1 * (s1y * s22 - s12 * s2y)
              + s2 * (s1y * s12 - s11 * s2y)) / d0 AS b0,
             (n * (s1y * s22 - s12 * s2y)
              - sy * (s1 * s22 - s12 * s2)
              + s2 * (s1 * s2y - s1y * s2)) / d0 AS b1,
             (n * (s11 * s2y - s1y * s12)
              - s1 * (s1 * s2y - s1y * s2)
              + sy * (s1 * s12 - s11 * s2)) / d0 AS b2
      FROM det),
    fit AS (
      SELECT *,
             syy - (b0 * sy + b1 * s1y + b2 * s2y) AS ssr,
             syy - sy * sy / n AS sst
      FROM beta)
    SELECT '(intercept)' AS term, round(b0, 6) + 0.0 AS beta FROM fit
    UNION ALL SELECT 'hour_of_day', round(b1, 6) + 0.0 FROM fit
    UNION ALL SELECT 'user_mod7', round(b2, 6) + 0.0 FROM fit
    UNION ALL SELECT '(n)', n FROM fit
    UNION ALL
    SELECT '(r2)', CASE WHEN sst > 0
                   THEN round(1.0 - ssr / sst, 6) + 0.0 END FROM fit
    """,
)
def m_ols(spark, sf_dir):
    """Distributed OLS of events.value on hour-of-day and user_id%7
    (operators/relational.ols_fit) — one partial-aggregated pass builds
    the normal-equation sums (nothing ever shuffles but the d²-sized
    agg), a model-sized driver solve inverts the 3×3 system. Expected
    near-zero slopes on this synthetic corpus — the entry checks the
    estimator, not the model. The oracle solves the SAME sums with
    Cramer's rule; agreement to 6dp holds because the distributed part
    (the sums) is an exact replay and both solvers act on identical
    well-conditioned 3×3 inputs."""
    from pandasvcf_spark.operators.relational import ols_fit

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    d = e.select(
        F.col("value").alias("y"),
        F.hour("ts").cast("double").alias("hour_of_day"),
        (F.col("user_id") % 7).cast("double").alias("user_mod7"),
    )
    return ols_fit(d, "y", ["hour_of_day", "user_mod7"])


@register(
    "e_seasonal_profile",
    oracle="""
    WITH hourly AS (
      SELECT event_type AS key, CAST(ts AS DATE) AS d,
             hour(ts) AS hod, CAST(count(*) AS BIGINT) AS c
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE), hour(ts)),
    prof AS (
      SELECT key, hod, CAST(count(*) AS BIGINT) AS n_days,
             avg(CAST(c AS DOUBLE)) AS m
      FROM hourly GROUP BY key, hod),
    wz AS (
      SELECT key, hod, n_days, m,
             avg(m) OVER (PARTITION BY key) AS mu,
             stddev_samp(m) OVER (PARTITION BY key) AS sd
      FROM prof)
    SELECT key, CAST(hod AS INT) AS hod, n_days,
           round(m, 6) + 0.0 AS mean_cnt,
           round(CASE WHEN sd > 0 THEN (m - mu) / sd END, 6) + 0.0 AS z
    FROM wz
    """,
)
def e_seasonal_profile(spark, sf_dir):
    """Hour-of-day seasonal traffic profile per event type
    (operators/relational.seasonal_profile) — the seasonality-aware
    companion to e_rate_anomaly: mean daily count per (type, hour)
    across the dates that hour fired, z-scored within each type's
    24-cell profile. One groupBy(key, date, hour) collapses the corpus;
    the profile agg and the per-key window run over keys×24 rows. The
    oracle replays hourly counts, per-cell means and the windowed z."""
    from pandasvcf_spark.operators.relational import seasonal_profile

    return seasonal_profile(load(spark, sf_dir, "events"),
                            "event_type", "ts")


@register(
    "m_benford",
    oracle="""
    WITH nn AS (
      SELECT abs(CAST(value AS DOUBLE)) AS a
      FROM events
      WHERE value IS NOT NULL AND value <> 0 AND NOT isnan(value)),
    yy AS (
      SELECT a / pow(10.0, floor(log10(a))) AS y FROM nn),
    dd AS (
      SELECT CAST(CASE WHEN y >= 10.0 THEN floor(y / 10.0)
                       WHEN y < 1.0 THEN floor(y * 10.0)
                       ELSE floor(y) END AS INT) AS digit
      FROM yy),
    counts AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n
      FROM dd GROUP BY digit),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts),
    ben(digit, expected) AS (VALUES
      (1, 0.3010299956639812), (2, 0.17609125905568124),
      (3, 0.12493873660829993), (4, 0.09691001300805642),
      (5, 0.07918124604762482), (6, 0.06694678963061322),
      (7, 0.05799194697768673), (8, 0.05115252244738129),
      (9, 0.04575749056067514))
    SELECT c.digit, c.n,
           round(CAST(c.n AS DOUBLE) / t, 6) + 0.0 AS freq,
           CAST(round(b.expected, 6) AS DOUBLE) AS expected,
           round(CAST(c.n AS DOUBLE) / t - b.expected, 6) + 0.0 AS dev,
           round((CAST(c.n AS DOUBLE) / t - b.expected)
                 * (CAST(c.n AS DOUBLE) / t - b.expected)
                 / b.expected * t, 6) + 0.0 AS chi2_term
    FROM counts c JOIN ben b ON c.digit = b.digit, tot
    ORDER BY c.digit
    """,
)
def m_benford(spark, sf_dir):
    """Benford first-significant-digit screen on events.value
    (operators/relational.benford_screen; Nigrini's audit family) —
    the data-forensics check for fabricated/truncated numerics (the
    synthetic uniform column here FAILS Benford loudly, which is the
    point: the statistic detects non-organic magnitudes). Digit
    extraction is pure arithmetic with a ±1-decade correction so a
    1-ulp cross-engine log10 difference can't flip a digit; one
    9-key groupBy + a 1-row totals broadcast. The oracle replays
    extraction, frequencies and chi-square terms."""
    from pandasvcf_spark.operators.relational import benford_screen

    return benford_screen(load(spark, sf_dir, "events"), "value")


@register(
    "e_rolling_corr",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id,
             CASE WHEN value IS NOT NULL THEN CAST(value AS DOUBLE) END
               AS xv,
             CASE WHEN value IS NOT NULL
                  THEN CAST(event_id % 100 AS DOUBLE) END AS yv
      FROM events),
    win AS (
      SELECT user_id, event_id,
             CAST(count(xv) OVER w AS DOUBLE) AS n,
             sum(xv) OVER w AS sx, sum(yv) OVER w AS sy,
             sum(xv * yv) OVER w AS sxy,
             sum(xv * xv) OVER w AS sxx,
             sum(yv * yv) OVER w AS syy
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)),
    g AS (
      SELECT user_id, event_id, n,
             greatest(n * sxx - sx * sx, 0.0) AS vx,
             greatest(n * syy - sy * sy, 0.0) AS vy,
             n * sxy - sx * sy AS cv
      FROM win)
    SELECT user_id, event_id, CAST(n AS BIGINT) AS n_w,
           round(CASE WHEN n >= 2 AND vx > 0 AND vy > 0
                 THEN cv / sqrt(vx) / sqrt(vy) END, 6) + 0.0 AS corr
    FROM g
    """,
)
def e_rolling_corr(spark, sf_dir):
    """Per-user rolling 10-row Pearson correlation of value against
    event_id%100 (operators/relational.rolling_corr) — the co-movement
    monitor. Five same-frame window sums collapse into ONE Window node
    on one key exchange (plan-guaranteed by Catalyst's same-frame
    collapse); pairwise deletion keeps NULL-valued rows in the ordering
    without contributing. Expected ~0 correlation on this synthetic
    corpus — the entry checks the estimator. The oracle replays the
    frame sums and the guarded quotient."""
    from pandasvcf_spark.operators.relational import rolling_corr

    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "value",
        (F.col("event_id") % 100).cast("double").alias("y2"),
    )
    out = rolling_corr(e, "user_id", "event_id", "value", "y2", window=10)
    return out.select("user_id", "event_id", "n_w", "corr")


@register(
    "m_ab_test",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS var,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    c AS (
      SELECT
        CAST(sum(CASE WHEN var = 'A' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_a,
        CAST(sum(CASE WHEN var = 'A' AND y <> 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS succ_a,
        CAST(sum(CASE WHEN var = 'B' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_b,
        CAST(sum(CASE WHEN var = 'B' AND y <> 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS succ_b
      FROM s),
    r AS (
      SELECT *,
             CASE WHEN n_a > 0 THEN succ_a / CAST(n_a AS DOUBLE) END
               AS pa,
             CASE WHEN n_b > 0 THEN succ_b / CAST(n_b AS DOUBLE) END
               AS pb,
             CASE WHEN n_a > 0 AND n_b > 0 THEN
               (succ_a + succ_b) / (CAST(n_a AS DOUBLE)
                                    + CAST(n_b AS DOUBLE)) END AS pool
      FROM c),
    f AS (
      SELECT *,
             sqrt(pool * (1.0 - pool)
                  * (1.0 / CAST(n_a AS DOUBLE)
                     + 1.0 / CAST(n_b AS DOUBLE))) AS sep,
             sqrt(pa * (1.0 - pa) / CAST(n_a AS DOUBLE)
                  + pb * (1.0 - pb) / CAST(n_b AS DOUBLE)) AS sew
      FROM r)
    SELECT n_a, succ_a, n_b, succ_b,
           round(pa, 6) + 0.0 AS rate_a,
           round(pb, 6) + 0.0 AS rate_b,
           round(pb - pa, 6) + 0.0 AS diff,
           round(CASE WHEN sep > 0 THEN (pb - pa) / sep END, 6) + 0.0
             AS z,
           round((pb - pa) - 1.96 * sew, 6) + 0.0 AS ci_lo,
           round((pb - pa) + 1.96 * sew, 6) + 0.0 AS ci_hi
    FROM f
    """,
)
def m_ab_test(spark, sf_dir):
    """Two-proportion A/B readout (operators/relational.
    ab_test_proportions): purchase rate of even vs odd user ids —
    expected z ≈ 0 on this synthetic corpus; the entry checks the
    statistic pipeline, not an effect. ONE conditional-sum aggregation
    (4 counters) collapses the corpus map-side; every statistic is a
    projection of the counts. The oracle replays counts, pooled z and
    the Wald CI term-for-term."""
    from pandasvcf_spark.operators.relational import ab_test_proportions

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("var"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    return ab_test_proportions(d, "var", "y", "A", "B")


@register(
    "m_trimmed_mean",
    oracle="""
    WITH nn AS (
      SELECT CAST(value AS DOUBLE) AS v FROM events
      WHERE value IS NOT NULL),
    cuts AS (
      SELECT CAST(quantile_disc(v, 0.05) AS DOUBLE) AS lo,
             CAST(quantile_disc(v, 0.95) AS DOUBLE) AS hi
      FROM nn)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN v >= lo AND v <= hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_used,
           lo AS lo_cut, hi AS hi_cut,
           round(avg(CASE WHEN v >= lo AND v <= hi THEN v END), 6)
             + 0.0 AS mean
    FROM nn, cuts
    GROUP BY lo, hi
    """,
)
def m_trimmed_mean(spark, sf_dir):
    """5% two-sided trimmed mean of events.value (operators/
    relational.trimmed_mean) — the robust location estimate: exact
    type-1 cut points from exact_quantiles' bucketed two-pass (no
    global sort), then one conditional aggregation; closed-interval
    boundary (values equal to a cut are kept). The oracle states the
    cuts with quantile_disc and replays the conditional mean."""
    from pandasvcf_spark.operators.relational import trimmed_mean

    return trimmed_mean(load(spark, sf_dir, "events"), "value",
                        trim=0.05)


@register(
    "e_merge_intervals",
    oracle="""
    WITH iv AS (
      SELECT user_id % 20 AS k,
             CAST(event_id % 1000 AS BIGINT) AS s,
             CAST(event_id % 1000 + user_id % 30 AS BIGINT) AS e
      FROM events
      WHERE user_id IS NOT NULL AND event_id IS NOT NULL),
    m AS (
      SELECT k, s, e,
             max(e) OVER (PARTITION BY k ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pm
      FROM iv),
    fl AS (
      SELECT k, s, e,
             CASE WHEN pm IS NULL OR s > pm + 0 THEN 1 ELSE 0 END AS f
      FROM m),
    isl AS (
      SELECT k, s, e,
             sum(f) OVER (PARTITION BY k ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS i
      FROM fl)
    SELECT k, min(s) AS start, max(e) AS "end",
           CAST(count(*) AS BIGINT) AS n_merged
    FROM isl GROUP BY k, i
    """,
)
def e_merge_intervals(spark, sf_dir):
    """Generic interval merging (operators/relational.merge_intervals;
    the bedtools-merge / calendar-consolidation operator) over
    event-derived [start, start + len] spans per user bucket. The
    running-MAX-end island device (not lag(end)) keeps nested intervals
    correct; one window stack on a single key exchange + one island
    groupBy. The oracle replays running max, flags, island ids and the
    rollup."""
    from pandasvcf_spark.operators.relational import merge_intervals

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_id").isNotNull()
    )
    iv = e.select(
        (F.col("user_id") % 20).alias("k"),
        (F.col("event_id") % 1000).cast("long").alias("s"),
        (F.col("event_id") % 1000 + F.col("user_id") % 30).cast("long")
        .alias("e"),
    )
    return merge_intervals(iv, ["k"], "s", "e", gap=0)


@register(
    "m_kaplan_meier",
    oracle="""
    WITH s AS (
      SELECT CAST(value AS DOUBLE) AS t,
             CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END AS ev
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    per_t AS (
      SELECT t,
             CAST(sum(CASE WHEN ev <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS d,
             CAST(sum(CASE WHEN ev = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c
      FROM s GROUP BY t),
    tot AS (SELECT sum(d + c) AS N FROM per_t),
    risk AS (
      SELECT t, d, c,
             N - coalesce(sum(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM per_t, tot),
    curve AS (
      SELECT t, d, c, n_risk,
             max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER w AS hz,
             sum(CASE WHEN d < n_risk
                 THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk
                                                        AS DOUBLE))
                 END) OVER w AS lsum
      FROM risk
      WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW))
    SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
           c AS n_censored,
           round(CASE WHEN hz = 1 THEN 0.0 ELSE exp(lsum) END, 6)
             + 0.0 AS survival
    FROM curve WHERE d > 0
    """,
)
def m_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier survival curve (operators/relational.kaplan_meier)
    over events: duration = value, observed = event_type <> 'error'
    (errors right-censor) — the churn/lifetime estimator. The corpus
    collapses to per-time (event, censored) counters in one groupBy;
    the at-risk ladder and exp(Σ ln(1−d/n)) product run as cumulative
    windows over the distinct-times table, with the d = n boundary
    pinned to exactly 0.0 by a cumulative flag. The oracle replays
    counters, ladder, log-sum product and the flag."""
    from pandasvcf_spark.operators.relational import kaplan_meier

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        F.col("value").alias("t"),
        F.when(F.col("event_type") != "error", 1).otherwise(0).alias("ev"),
    )
    return kaplan_meier(d, "t", "ev")


@register(
    "m_confusion",
    oracle="""
    WITH s AS (
      SELECT CAST(value AS DOUBLE) AS sc,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    c AS (
      SELECT
        CAST(sum(CASE WHEN sc >= 5.0 AND y <> 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS tp,
        CAST(sum(CASE WHEN sc >= 5.0 AND y = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS fp,
        CAST(sum(CASE WHEN sc < 5.0 AND y = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS tn,
        CAST(sum(CASE WHEN sc < 5.0 AND y <> 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS fn
      FROM s),
    d AS (
      SELECT *,
             CAST(tp AS DOUBLE) AS tpd, CAST(fp AS DOUBLE) AS fpd,
             CAST(tn AS DOUBLE) AS tnd, CAST(fn AS DOUBLE) AS fnd
      FROM c),
    m AS (
      SELECT *,
             CASE WHEN tpd + fpd > 0 THEN tpd / (tpd + fpd) END AS p,
             CASE WHEN tpd + fnd > 0 THEN tpd / (tpd + fnd) END AS r,
             sqrt((tpd + fpd) * (tpd + fnd) * (tnd + fpd)
                  * (tnd + fnd)) AS md
      FROM d)
    SELECT tp + fp + tn + fn AS n, tp, fp, tn, fn,
           round(p, 6) + 0.0 AS precision,
           round(r, 6) + 0.0 AS recall,
           round(CASE WHEN p IS NOT NULL AND r IS NOT NULL
                      AND p + r > 0
                 THEN 2.0 * p * r / (p + r) END, 6) + 0.0 AS f1,
           round(CASE WHEN tpd + fpd + tnd + fnd > 0
                 THEN (tpd + tnd) / (tpd + fpd + tnd + fnd) END, 6)
             + 0.0 AS accuracy,
           round(CASE WHEN md > 0
                 THEN (tpd * tnd - fpd * fnd) / md END, 6) + 0.0
             AS mcc
    FROM m
    """,
)
def m_confusion(spark, sf_dir):
    """Thresholded binary-classification report (operators/relational.
    confusion_report): value >= 5.0 predicting the 'error' label —
    the operating-point summary beside m_group_auc and m_ks_lift,
    with MCC for the imbalanced case. ONE 4-counter conditional
    aggregation; every metric a projection; degenerate denominators
    NULL. The oracle replays counters and all five metrics."""
    from pandasvcf_spark.operators.relational import confusion_report

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        F.col("value").alias("sc"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("y"),
    )
    return confusion_report(d, "sc", "y", threshold=5.0)


def _irls_round_sql(src: str, b: str, out_m: str, out_b: str) -> str:
    """One unrolled IRLS round: weighted normal-equation sums over
    `src` using the 1-row beta table `b` (columns b0, b1, b2), solved
    by Cramer's rule into `out_b` (b0, b1, b2). Generic formula —
    round 1 passes a zero beta table and reduces to w = 0.25."""
    return f"""
    {out_m} AS (
      SELECT sum(w * 1.0) AS s00, sum(w * x1) AS s01,
             sum(w * x2) AS s02,
             sum(w * x1 * x1) AS s11, sum(w * x1 * x2) AS s12,
             sum(w * x2 * x2) AS s22,
             sum(w * z * 1.0) AS z0, sum(w * z * x1) AS z1,
             sum(w * z * x2) AS z2
      FROM (
        SELECT y, x1, x2, eta, mu, mu * (1.0 - mu) AS w,
               eta + (y - mu) / (mu * (1.0 - mu)) AS z
        FROM (
          -- mu clamped into [1e-10, 1-1e-10] (the standard IRLS
          -- guard, mirrored in logistic_fit): e-notation literals are
          -- DOUBLE in both engines, and 1.0 is CAST (the DECIMAL
          -- literal lesson) so the clamp bound is the same double
          SELECT y, x1, x2, eta,
                 greatest(1e-10, least(CAST(1.0 AS DOUBLE) - 1e-10,
                          1.0 / (1.0 + exp(-eta)))) AS mu
          FROM (
            SELECT y, x1, x2, {b}.b0 + {b}.b1 * x1 + {b}.b2 * x2
                     AS eta
            FROM {src}, {b})))),
    {out_b} AS (
      SELECT
        (z0 * (s11 * s22 - s12 * s12)
         - s01 * (z1 * s22 - s12 * z2)
         + s02 * (z1 * s12 - s11 * z2)) / det AS b0,
        (s00 * (z1 * s22 - s12 * z2)
         - z0 * (s01 * s22 - s12 * s02)
         + s02 * (s01 * z2 - z1 * s02)) / det AS b1,
        (s00 * (s11 * z2 - z1 * s12)
         - s01 * (s01 * z2 - z1 * s02)
         + z0 * (s01 * s12 - s11 * s02)) / det AS b2
      FROM (SELECT *,
              s00 * (s11 * s22 - s12 * s12)
              - s01 * (s01 * s22 - s12 * s02)
              + s02 * (s01 * s12 - s11 * s02) AS det
            FROM {out_m}))"""


@register(
    "m_logit",
    oracle=f"""
    WITH s AS (
      SELECT CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END AS y,
             CAST(hour(ts) AS DOUBLE) AS x1,
             CAST(user_id % 7 AS DOUBLE) AS x2
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
        AND user_id IS NOT NULL),
    bz AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2),
    {_irls_round_sql('s', 'bz', 'm1', 'beta1')},
    {_irls_round_sql('s', 'beta1', 'm2', 'beta2')},
    nrow AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM s)
    SELECT '(intercept)' AS term, round(b0, 6) + 0.0 AS beta FROM beta2
    UNION ALL SELECT 'hour_of_day', round(b1, 6) + 0.0 FROM beta2
    UNION ALL SELECT 'user_mod7', round(b2, 6) + 0.0 FROM beta2
    UNION ALL SELECT '(n)', n FROM nrow
    """,
)
def m_logit(spark, sf_dir):
    """Logistic regression of the 'error' label on hour-of-day and
    user_id%7 (operators/relational.logistic_fit) — IRLS / Newton with
    a FIXED 2-iteration budget so the entire optimization replays as
    an unrolled SQL oracle (the g_pagerank fixed-iteration precedent):
    each round is one partial-aggregated weighted-sums pass + a
    model-sized Cramer/LAPACK 3×3 solve. Near-zero slopes expected on
    this synthetic corpus — the entry checks the optimizer, not the
    model."""
    from pandasvcf_spark.operators.relational import logistic_fit

    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    )
    d = e.select(
        F.when(F.col("event_type") == "error", 1.0).otherwise(0.0)
        .alias("y"),
        F.hour("ts").cast("double").alias("hour_of_day"),
        (F.col("user_id") % 7).cast("double").alias("user_mod7"),
    )
    return logistic_fit(d, "y", ["hour_of_day", "user_mod7"], iters=2)


@register(
    "m_target_encode",
    oracle="""
    WITH stats AS (
      SELECT event_type AS cat, sum(value) AS sy,
             CAST(count(value) AS BIGINT) AS ny
      FROM events GROUP BY event_type),
    gm AS (SELECT sum(value) / count(value) AS gmean FROM events)
    SELECT e.event_id,
           round(CASE WHEN
               coalesce(ny, 0) - (CASE WHEN e.value IS NOT NULL
                                  THEN 1 ELSE 0 END) + 2.0 > 0
             THEN (coalesce(sy, 0.0)
                   - (CASE WHEN e.value IS NOT NULL
                      THEN e.value ELSE 0.0 END)
                   + 2.0 * gmean)
                  / (coalesce(ny, 0)
                     - (CASE WHEN e.value IS NOT NULL
                        THEN 1 ELSE 0 END) + 2.0)
             END, 6) + 0.0 AS enc
    FROM events e
    LEFT JOIN stats s ON e.event_type IS NOT DISTINCT FROM s.cat,
    gm
    """,
)
def m_target_encode(spark, sf_dir):
    """Leave-one-out target encoding of event_type against value
    (operators/relational.target_encode_loo, smoothing 2 toward the
    global mean) — the leakage-aware feature-engineering staple: each
    row's own target is subtracted from its category's sum before the
    mean. One category-sized stats join-back + a 1-row global-mean
    broadcast; the LOO subtraction is per-row arithmetic, never a
    per-row window. The oracle replays sums, the null-safe join and
    the subtraction term-for-term."""
    from pandasvcf_spark.operators.relational import target_encode_loo

    e = load(spark, sf_dir, "events")
    out = target_encode_loo(e, "event_type", "value", smoothing=2.0)
    return out.select("event_id", "enc")


@register(
    "m_skew_report",
    oracle="""
    WITH counts AS (
      SELECT user_id AS k, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, k) AS r
      FROM counts),
    agg AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(c) AS BIGINT) AS max_key_rows,
             CAST(sum(CASE WHEN r = 1 THEN c ELSE 0 END) AS BIGINT)
               AS t1,
             CAST(sum(CASE WHEN r <= 10 THEN c ELSE 0 END) AS BIGINT)
               AS tk,
             sum(CAST(c AS DOUBLE) * r) AS cr
      FROM ranked),
    g AS (
      SELECT *,
             (CAST(n_keys AS DOUBLE) + 1.0) * n_rows - cr AS ic
      FROM agg)
    SELECT n_rows, n_keys, max_key_rows,
           round(CAST(t1 AS DOUBLE) / n_rows, 6) + 0.0 AS top1_share,
           round(CAST(tk AS DOUBLE) / n_rows, 6) + 0.0 AS topk_share,
           round(CASE WHEN n_keys > 0 AND n_rows > 0 THEN
             (2.0 * ic - (CAST(n_keys AS DOUBLE) + 1.0) * n_rows)
             / (CAST(n_keys AS DOUBLE) * n_rows) END, 6) + 0.0 AS gini,
           CAST(greatest(1, CAST(ceil(CAST(max_key_rows AS DOUBLE)
                                      / 50.0) AS BIGINT)) AS INT)
             AS recommended_salt
    FROM g
    """,
)
def m_skew_report(spark, sf_dir):
    """Shuffle-key skew screen for events.user_id (operators/
    relational.skew_report) — the diagnosis that says whether this key
    needs skew_salted_join's cure and with what salt factor
    (target 50 rows/task here so the synthetic corpus exercises the
    arithmetic). One groupBy collapses the data to key sizes;
    TakeOrdered-style ranks, the Gini identity and the 1-row fold run
    key-sized. The oracle replays counts, ranks, shares, Gini and the
    salt recommendation."""
    from pandasvcf_spark.operators.relational import skew_report

    return skew_report(load(spark, sf_dir, "events"), "user_id",
                       top_k=10, target_rows_per_task=50)


@register(
    "e_path_ngrams",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    grams AS (
      SELECT user_id, event_type || '>' || e2 || '>' || e3 AS path
      FROM s
      WHERE event_type IS NOT NULL AND e2 IS NOT NULL
        AND e3 IS NOT NULL)
    SELECT path, CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys,
           CAST(count(*) AS BIGINT) AS n_total
    FROM grams GROUP BY path
    ORDER BY n_total DESC, path LIMIT 20
    """,
)
def e_path_ngrams(spark, sf_dir):
    """Top length-3 event paths per user stream (operators/relational.
    path_ngrams) — sequential-pattern discovery beside e_transitions'
    bigram matrix and e_funnel's hypothesis check. Two lead() columns
    on ONE user-keyed window exchange (paths never cross users), one
    path groupBy, TakeOrdered top-20 under (count DESC, path). The
    oracle replays leads, completeness filter and counts."""
    from pandasvcf_spark.operators.relational import path_ngrams

    return path_ngrams(
        load(spark, sf_dir, "events"),
        "user_id",
        ["ts", "event_id"],
        "event_type",
        n=3,
        top_n=20,
    )


@register(
    "sk_quantile_grid",
    oracle="""
    WITH nn AS (
      SELECT CAST(value AS DOUBLE) AS v FROM events
      WHERE value IS NOT NULL),
    grid AS (
      SELECT CAST(least(greatest(
               CAST(floor((v - 0.0) / (500.0 / 256)) AS BIGINT),
               0), 255) AS INT) AS cell,
             CAST(count(*) AS BIGINT) AS c
      FROM nn GROUP BY 1),
    cum AS (
      SELECT cell, c,
             sum(c) OVER (ORDER BY cell
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cm,
             sum(c) OVER () AS N
      FROM grid),
    t AS (
      SELECT cum.*, pr.p,
             greatest(1, CAST(ceil(N * pr.p) AS BIGINT)) AS r
      FROM cum, (SELECT unnest([0.25, 0.5, 0.9, 0.99]) AS p) pr),
    hit AS (
      SELECT p, cell FROM t WHERE cm >= r AND cm - c < r)
    SELECT CAST(p AS DOUBLE) AS p,
           round(0.0 + (cell + 0.5) * (500.0 / 256), 6) + 0.0 AS est,
           cell
    FROM hit
    """,
)
def sk_quantile_grid(spark, sf_dir):
    """Mergeable equal-width quantile sketch over events.value
    (operators/sketches.quantile_grid + quantile_grid_estimate,
    domain [0, 500), 256 cells) — the additive quantile companion to
    sk_countmin/sk_hll: per-shard grids roll up by cell-wise SUM, and
    the deterministic midpoint-of-type-1-cell estimate replays exactly
    in SQL (value error ≤ half a cell by construction, asserted in
    pytest against the exact quantiles). The shuffle is ≤ 256 cells
    after map-side partial sums."""
    from pandasvcf_spark.operators.sketches import (
        quantile_grid,
        quantile_grid_estimate,
    )

    e = load(spark, sf_dir, "events")
    g = quantile_grid(e, "value", 0.0, 500.0, n_cells=256)
    return quantile_grid_estimate(
        g, [0.25, 0.5, 0.9, 0.99], 0.0, 500.0, n_cells=256
    )


@register(
    "e_sliding_distinct",
    oracle=f"""
    WITH ph AS (
      SELECT date_trunc('hour', ts) AS h0t, {_POLY_UID} AS h0
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    mx AS (SELECT h0t, {_HLL_MIX} AS h FROM ph),
    grid AS (
      SELECT h0t, CAST(h % 256 AS INT) AS bucket,
             max(CASE WHEN h // 256 > 0
                      THEN 24 - CAST(floor(log2(h // 256)) AS INT)
                      ELSE 25 END) AS rho
      FROM mx GROUP BY 1, 2),
    tgt AS (
      SELECT unnest(generate_series(h0t,
               h0t + INTERVAL 5 HOUR, INTERVAL 1 HOUR)) AS win_end,
             h0t, bucket, rho
      FROM grid),
    present AS (SELECT DISTINCT h0t AS win_end FROM grid),
    merged AS (
      SELECT t.win_end, t.bucket, max(t.rho) AS rho
      FROM tgt t JOIN present p ON t.win_end = p.win_end
      GROUP BY t.win_end, t.bucket),
    hrs AS (
      SELECT win_end, CAST(count(*) AS BIGINT) AS n_hours FROM (
        SELECT DISTINCT t.win_end, t.h0t
        FROM tgt t JOIN present p ON t.win_end = p.win_end)
      GROUP BY win_end),
    agg AS (
      SELECT win_end, CAST(count(*) AS INT) AS hit,
             sum(power(2.0, -rho)) AS s
      FROM merged GROUP BY 1)
    SELECT CAST(floor(epoch(agg.win_end)) AS BIGINT) AS win_end_epoch,
           hrs.n_hours,
           CAST(256 - hit AS INT) AS n_zero,
           round(CASE WHEN (0.7213 / (1.0 + 1.079 / 256)) * 65536
                           / (s + (256 - hit)) <= 640.0
                       AND hit < 256
                      THEN 256.0 * ln(256.0 / (256 - hit))
                      ELSE (0.7213 / (1.0 + 1.079 / 256)) * 65536
                           / (s + (256 - hit)) END, 4) AS estimate
    FROM agg JOIN hrs ON agg.win_end = hrs.win_end
    """,
)
def e_sliding_distinct(spark, sf_dir):
    """Trailing-6-hour distinct users per hour via mergeable HLL grids
    (operators/sketches.sliding_distinct_hll) — the sliding-distinct
    metric exact counting can't afford at scale: each hour's register
    grid builds once, grid CELLS (never data rows) replicate into the
    ≤6 windows they serve, cell-wise MAX, collapse. The shuffle after
    the per-hour grid is hours × 256 × 6 cells regardless of event
    volume. Same bit-exact register replay as sk_hll_groups, plus the
    window replication; timestamps compare as epoch ints (registry
    convention)."""
    from pandasvcf_spark.operators.sketches import sliding_distinct_hll

    e = load(spark, sf_dir, "events")
    out = sliding_distinct_hll(e, "ts", "user_id", window_hours=6,
                               m=256)
    return out.select(
        F.col("win_end").cast("long").alias("win_end_epoch"),
        "n_hours",
        "n_zero",
        F.round("estimate", 4).alias("estimate"),
    )


@register(
    "m_acf",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(count(*) AS DOUBLE) AS x
      FROM events WHERE ts IS NOT NULL GROUP BY 1),
    mu AS (SELECT avg(x) AS m FROM hourly),
    d AS (
      SELECT x - mu.m AS d0,
             lead(x, 1) OVER w - mu.m AS d1,
             lead(x, 2) OVER w - mu.m AS d2,
             lead(x, 3) OVER w - mu.m AS d3,
             lead(x, 4) OVER w - mu.m AS d4,
             lead(x, 5) OVER w - mu.m AS d5,
             lead(x, 6) OVER w - mu.m AS d6
      FROM hourly, mu
      WINDOW w AS (ORDER BY h)),
    agg AS (
      SELECT sum(d0 * d0) AS den, CAST(count(*) AS BIGINT) AS n,
             sum(d0 * d1) AS n1, CAST(count(d1) AS BIGINT) AS p1,
             sum(d0 * d2) AS n2, CAST(count(d2) AS BIGINT) AS p2,
             sum(d0 * d3) AS n3, CAST(count(d3) AS BIGINT) AS p3,
             sum(d0 * d4) AS n4, CAST(count(d4) AS BIGINT) AS p4,
             sum(d0 * d5) AS n5, CAST(count(d5) AS BIGINT) AS p5,
             sum(d0 * d6) AS n6, CAST(count(d6) AS BIGINT) AS p6
      FROM d)
    SELECT 0 AS lag, n AS n_pairs,
           round(CASE WHEN den > 0 THEN 1.0 END, 6) + 0.0 AS acf
    FROM agg
    UNION ALL SELECT 1, p1,
      round(CASE WHEN den > 0 THEN n1 / den END, 6) + 0.0 FROM agg
    UNION ALL SELECT 2, p2,
      round(CASE WHEN den > 0 THEN n2 / den END, 6) + 0.0 FROM agg
    UNION ALL SELECT 3, p3,
      round(CASE WHEN den > 0 THEN n3 / den END, 6) + 0.0 FROM agg
    UNION ALL SELECT 4, p4,
      round(CASE WHEN den > 0 THEN n4 / den END, 6) + 0.0 FROM agg
    UNION ALL SELECT 5, p5,
      round(CASE WHEN den > 0 THEN n5 / den END, 6) + 0.0 FROM agg
    UNION ALL SELECT 6, p6,
      round(CASE WHEN den > 0 THEN n6 / den END, 6) + 0.0 FROM agg
    """,
)
def m_acf(spark, sf_dir):
    """Autocorrelation of the hourly event-count series at lags 0-6
    (operators/relational.autocorrelation; the standard biased ACF
    keeping |r| <= 1) — the seasonality/persistence fingerprint beside
    e_seasonal_profile's hour-of-day means. The corpus collapses to
    the hourly series first; mean broadcast, lead() columns and the
    1-row folds all run over the series table on one ordering. The
    oracle replays deviations, lag products and the shared
    denominator."""
    from pandasvcf_spark.operators.relational import autocorrelation

    hourly = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    return autocorrelation(hourly, "x", "h", max_lag=6)


@register(
    "m_cohens_kappa",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN value >= 5.0 THEN 'hi' ELSE 'lo' END AS ra,
             CASE WHEN user_id % 2 = 0 THEN 'hi' ELSE 'lo' END AS rb
      FROM events
      WHERE value IS NOT NULL AND user_id IS NOT NULL),
    cells AS (
      SELECT ra, rb, CAST(count(*) AS BIGINT) AS c
      FROM s GROUP BY ra, rb),
    ma AS (SELECT ra, sum(c) AS na FROM cells GROUP BY ra),
    mb AS (SELECT rb, sum(c) AS nb FROM cells GROUP BY rb),
    tot AS (SELECT sum(c) AS n FROM cells),
    agr AS (
      SELECT coalesce(sum(c), 0) AS agree
      FROM cells WHERE ra = rb),
    pes AS (
      SELECT coalesce(sum(CAST(ma.na AS DOUBLE) * mb.nb), 0.0) AS pesum
      FROM ma JOIN mb ON ma.ra = mb.rb)
    SELECT CAST(n AS BIGINT) AS n,
           round(CAST(agree AS DOUBLE) / n, 6) + 0.0 AS po,
           round(pesum / (CAST(n AS DOUBLE) * n), 6) + 0.0 AS pe,
           round(CASE WHEN pesum / (CAST(n AS DOUBLE) * n) < 1.0
                 THEN (CAST(agree AS DOUBLE) / n
                       - pesum / (CAST(n AS DOUBLE) * n))
                      / (1.0 - pesum / (CAST(n AS DOUBLE) * n)) END, 6)
             + 0.0 AS kappa
    FROM tot, agr, pes
    """,
)
def m_cohens_kappa(spark, sf_dir):
    """Cohen's kappa between two derived labelings of events (a
    value-threshold rater vs a user-parity rater — expected ~0 kappa
    on this synthetic corpus; the entry checks the chance correction,
    not the raters). One groupBy collapses items to confusion cells;
    marginals, the diagonal agreement and the p_e sum are all
    cells-/label-sized. The oracle replays cells, marginals and the
    chance-corrected quotient."""
    from pandasvcf_spark.operators.relational import cohens_kappa

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    d = e.select(
        F.when(F.col("value") >= 5.0, "hi").otherwise("lo").alias("ra"),
        F.when(F.col("user_id") % 2 == 0, "hi").otherwise("lo")
        .alias("rb"),
    )
    return cohens_kappa(d, "ra", "rb")


@register(
    "m_calibration",
    oracle="""
    WITH b AS (
      SELECT value / 500.0 AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    a AS (
      SELECT least(CAST(floor(s * 10) AS INTEGER), 9) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             round(avg(s), 6) AS avg_score,
             round(avg(CAST(y AS DOUBLE)), 6) AS frac_pos
      FROM b GROUP BY 1)
    SELECT bin, n, avg_score, frac_pos,
           round(abs(frac_pos - avg_score), 6) AS gap
    FROM a ORDER BY bin
    """,
)
def m_calibration(spark, sf_dir):
    """Reliability-diagram calibration bins (operators/stats.
    calibration_bins) of value/500 as a pseudo-probability predicting
    the 'purchase' label — the ECE audit beside m_confusion's single
    operating point. One partial-aggregated groupBy over 10 fixed-
    width bins; binning is raw-score arithmetic (engine-exact edges);
    the oracle replays bins, means and gaps. A wildly miscalibrated
    pseudo-score is expected — the entry checks the audit."""
    from pandasvcf_spark.operators.stats import calibration_bins

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        (F.col("value") / 500.0).alias("s"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    return calibration_bins(d, "s", "y", n_bins=10)


@register(
    "m_cramers_v",
    oracle="""
    WITH b AS (
      SELECT c_mktsegment AS a, c_nationkey % 5 AS g FROM customer
      WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL),
    cells AS (
      SELECT a, g, CAST(count(*) AS DOUBLE) AS o
      FROM b GROUP BY a, g),
    ra AS (SELECT a, sum(o) AS sra FROM cells GROUP BY a),
    cb AS (SELECT g, sum(o) AS scb FROM cells GROUP BY g),
    t AS (SELECT sum(o) AS tn,
                 CAST(count(DISTINCT a) AS BIGINT) AS r,
                 CAST(count(DISTINCT g) AS BIGINT) AS c
          FROM cells),
    grid AS (
      SELECT ra.a, cb.g, sra, scb,
             coalesce(cells.o, 0.0) AS o
      FROM ra CROSS JOIN cb
      LEFT JOIN cells ON cells.a = ra.a AND cells.g = cb.g),
    m AS (
      SELECT (o - sra * scb / tn) * (o - sra * scb / tn)
               / (sra * scb / tn) AS term, r, c, tn
      FROM grid CROSS JOIN t),
    f AS (SELECT r, c, tn, sum(term) AS chi2 FROM m GROUP BY r, c, tn)
    SELECT r, c, CAST(tn AS BIGINT) AS n,
           round(chi2, 4) AS chi2,
           round(CASE WHEN least(r, c) >= 2
                 THEN sqrt(chi2 / (tn * (CAST(least(r, c) AS DOUBLE)
                                         - 1.0))) END, 6) AS v
    FROM f
    """,
)
def m_cramers_v(spark, sf_dir):
    """Cramér's V association (operators/stats.cramers_v) between
    market segment and nation-hash (c_nationkey % 5) — the effect-size
    view of the m_mutual_info / t_chi2_terms contingency family,
    normalized to [0, 1]. Cell counts partial-aggregate first; both
    marginals re-aggregate the CELL table (category-sized), then one
    1-row agg. Expected ~0 on this independent synthetic pairing.
    The oracle replays cells, marginals and the chi-square terms."""
    from pandasvcf_spark.operators.stats import cramers_v

    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isNotNull()
        & F.col("c_nationkey").isNotNull()
    )
    d = c.select(
        F.col("c_mktsegment").alias("a"),
        (F.col("c_nationkey") % 5).alias("g"),
    )
    return cramers_v(d, "a", "g")


@register(
    "m_js_divergence",
    oracle="""
    WITH b AS (
      SELECT event_type AS c, CAST(user_id % 2 AS INTEGER) AS f
      FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
    cells AS (
      SELECT c,
             CAST(sum(CASE WHEN f = 0 THEN 1 ELSE 0 END) AS DOUBLE)
               AS ca,
             CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               AS cb
      FROM cells_src GROUP BY c),
    t AS (SELECT sum(ca) AS ta, sum(cb) AS tb FROM cells),
    terms AS (
      SELECT CASE WHEN ca / t.ta > 0
               THEN (ca / t.ta)
                    * log2((ca / t.ta)
                           / ((ca / t.ta + cb / t.tb) / 2.0))
               ELSE 0.0 END AS tp,
             CASE WHEN cb / t.tb > 0
               THEN (cb / t.tb)
                    * log2((cb / t.tb)
                           / ((ca / t.ta + cb / t.tb) / 2.0))
               ELSE 0.0 END AS tq,
             t.ta, t.tb
      FROM cells, t),
    g AS (SELECT max(ta) AS ta, max(tb) AS tb,
                 CAST(count(*) AS BIGINT) AS k,
                 sum(tp) AS kp, sum(tq) AS kq
          FROM terms)
    SELECT CAST(ta AS BIGINT) AS n0, CAST(tb AS BIGINT) AS n1, k,
           round(CASE WHEN ta > 0 AND tb > 0 THEN kp END, 6) + 0.0
             AS kl_pm,
           round(CASE WHEN ta > 0 AND tb > 0 THEN kq END, 6) + 0.0
             AS kl_qm,
           round(CASE WHEN ta > 0 AND tb > 0
                 THEN (kp + kq) / 2.0 END, 6) + 0.0 AS js
    FROM g
    """.replace("cells_src", "b"),
)
def m_js_divergence(spark, sf_dir):
    """Jensen-Shannon divergence (operators/stats.js_divergence,
    log2 so JS is in [0, 1]) between the event-type distributions of
    even vs odd users — the symmetric, finite drift measure beside
    t_psi_drift (PSI diverges on empty bins, JS never does).
    Vocabulary-sized two-counter cells + a 1-row totals broadcast +
    a 1-row term agg. Expected ~0 on this user-blind synthetic split.
    The oracle replays cells, mixture and both KL terms."""
    from pandasvcf_spark.operators.stats import js_divergence

    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    d = e.select(
        F.col("event_type").alias("c"),
        (F.col("user_id") % 2).cast("int").alias("f"),
    )
    return js_divergence(d, "c", "f")


@register(
    "m_nelson_aalen",
    oracle="""
    WITH s AS (
      SELECT CAST(value AS DOUBLE) AS t,
             CASE WHEN event_type NOT IN ('error', 'signup')
                  THEN 1 ELSE 0 END AS ev
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    per_t AS (
      SELECT t,
             CAST(sum(CASE WHEN ev <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS d,
             CAST(sum(CASE WHEN ev = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c
      FROM s GROUP BY t),
    tot AS (SELECT sum(d + c) AS N FROM per_t),
    risk AS (
      SELECT t, d, c,
             N - coalesce(sum(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM per_t, tot),
    curve AS (
      SELECT t, d, c, n_risk,
             sum(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) OVER w
               AS h,
             sum(CAST(d AS DOUBLE)
                 / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)))
               OVER w AS v
      FROM risk
      WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW))
    SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
           c AS n_censored,
           round(h, 6) AS cum_hazard, round(v, 6) AS var_hazard
    FROM curve WHERE d > 0 ORDER BY t
    """,
)
def m_nelson_aalen(spark, sf_dir):
    """Nelson-Aalen cumulative hazard (operators/relational.
    nelson_aalen) over events: duration = value, observed = neither
    error nor signup (both right-censor) — the additive companion of
    m_kaplan_meier, well-defined even when a risk set empties. Same
    plan: one groupBy(duration) to per-time counters, cumulative
    windows over the distinct-times table; the hazard sums run over
    the SAME ascending order on both engines so they replay
    bit-for-bit. The oracle replays counters, ladder and both sums."""
    from pandasvcf_spark.operators.relational import nelson_aalen

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        F.col("value").alias("t"),
        F.when(~F.col("event_type").isin("error", "signup"), 1)
        .otherwise(0)
        .alias("ev"),
    )
    return nelson_aalen(d, "t", "ev")


@register(
    "e_attribution",
    oracle="""
    WITH t AS (
      SELECT user_id AS u, (epoch_us(ts) // 1000000) AS tt,
             event_id AS tid, event_type AS channel
      FROM events
      WHERE event_type IN ('click', 'view', 'signup')
        AND ts IS NOT NULL AND user_id IS NOT NULL
        AND event_id IS NOT NULL),
    c AS (
      SELECT user_id AS u, (epoch_us(ts) // 1000000) AS ct,
             event_id AS cid
      FROM events
      WHERE event_type = 'purchase' AND ts IS NOT NULL
        AND user_id IS NOT NULL AND event_id IS NOT NULL),
    j AS (
      SELECT t.channel, c.cid, t.tt, t.tid
      FROM t JOIN c ON t.u = c.u
      WHERE t.tt < c.ct AND t.tt >= c.ct - 86400),
    r AS (
      SELECT channel,
             row_number() OVER (PARTITION BY cid
                                ORDER BY tt DESC, tid DESC) AS rl,
             row_number() OVER (PARTITION BY cid
                                ORDER BY tt ASC, tid ASC) AS rf,
             count(*) OVER (PARTITION BY cid) AS n
      FROM j)
    SELECT channel,
           CAST(sum(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_last,
           CAST(sum(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_first,
           round(sum(1.0 / CAST(n AS DOUBLE)), 4) AS linear
    FROM r GROUP BY channel ORDER BY channel
    """,
)
def e_attribution(spark, sf_dir):
    """Multi-touch attribution (operators/relational.
    attribution_report, 1-day lookback): purchases credited to the
    click/view/signup touches that preceded them — last-touch,
    first-touch and linear models in one pass. One user-keyed
    equi-join with the range predicate as a post-join filter (the
    j_range_events shape; per-user history bounds the fan-out), one
    conversion-keyed window trio, one channel agg. Epoch-second
    BIGINTs, event_id tie-breaks — fully deterministic. The oracle
    replays the window ranks and all three credit models."""
    from pandasvcf_spark.operators.relational import attribution_report

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    )
    base = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("ts_s"),
    )
    touches = base.filter(
        F.col("event_type").isin("click", "view", "signup")
    ).select(
        "user_id",
        "ts_s",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
    )
    convs = base.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_s", F.col("event_id").alias("conv_id")
    )
    return attribution_report(
        touches, convs, lookback_s=86400
    )


@register(
    "m_wilson_topk",
    oracle="""
    WITH b AS (
      SELECT user_id AS item,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    a AS (
      SELECT item, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS pos
      FROM b GROUP BY item),
    s AS (
      SELECT item, n, pos,
             CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS p,
             CAST(n AS DOUBLE) AS nd,
             CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) AS z2
      FROM a)
    SELECT item, n, pos, round(p, 6) AS rate,
           round((p + z2 / (2.0 * nd)
                  - 1.96 * sqrt(p * (1.0 - p) / nd
                                + z2 / (4.0 * nd * nd)))
                 / (1.0 + z2 / nd), 6) AS wilson_lb
    FROM s ORDER BY wilson_lb DESC, item LIMIT 20
    """,
)
def m_wilson_topk(spark, sf_dir):
    """Wilson-score lower-bound ranking (operators/stats.wilson_topk,
    z = 1.96): top-20 users by purchase rate, small-n-penalized — the
    "sort by rate without being fooled by 3-for-3" leaderboard. One
    item-keyed two-counter agg + pure arithmetic + a TakeOrdered on
    the ROUNDED bound with an item tie-break. The oracle squares z as
    CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) — a decimal 3.8416
    literal is NOT the IEEE double Python's 1.96*1.96 produces."""
    from pandasvcf_spark.operators.stats import wilson_topk

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        F.col("user_id").alias("item"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    return wilson_topk(d, ["item"], "y", k=20, z=1.96)


@register(
    "e_theil_sen",
    oracle="""
    WITH d AS (
      SELECT event_type AS et,
             CAST((epoch_us(ts) // 1000000) // 86400 AS DOUBLE) AS x,
             CAST(count(*) AS DOUBLE) AS y
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY event_type, (epoch_us(ts) // 1000000) // 86400),
    p AS (
      SELECT a.et AS et, (b.y - a.y) / (b.x - a.x) AS s
      FROM d a JOIN d b ON a.et = b.et AND b.x > a.x),
    r AS (
      SELECT et, s,
             row_number() OVER (PARTITION BY et ORDER BY s) AS rk,
             count(*) OVER (PARTITION BY et) AS m
      FROM p),
    med AS (SELECT et, s AS slope, m FROM r
            WHERE rk = greatest(CAST(ceil(m / 2.0) AS BIGINT), 1)),
    res AS (
      SELECT d.et AS et, med.slope, med.m,
             d.y - med.slope * d.x AS e
      FROM d JOIN med ON d.et = med.et),
    er AS (
      SELECT et, slope, m, e,
             row_number() OVER (PARTITION BY et ORDER BY e) AS rk,
             count(*) OVER (PARTITION BY et) AS kk
      FROM res),
    pick AS (SELECT et, slope, m, e FROM er
             WHERE rk = greatest(CAST(ceil(kk / 2.0) AS BIGINT), 1)),
    cnt AS (SELECT et, CAST(count(*) AS BIGINT) AS n_points
            FROM d GROUP BY et)
    SELECT cnt.et AS et, n_points,
           CAST(coalesce(m, 0) AS BIGINT) AS n_pairs,
           round(slope, 6) + 0.0 AS slope,
           round(e, 4) + 0.0 AS intercept
    FROM cnt LEFT JOIN pick ON cnt.et = pick.et
    ORDER BY et
    """,
)
def e_theil_sen(spark, sf_dir):
    """Theil-Sen robust trend (operators/stats.theil_sen) of the
    daily event COUNT per event type — the outlier-proof slope for
    monitoring series (one wild day cannot move the median of
    pairwise slopes). The corpus pre-aggregates to the ~30-point
    daily series FIRST (the m_acf discipline; the O(n²) pair join is
    the statistic's definition and runs on the SERIES); INTEGER
    daily counts make every pairwise slope engine-exact (a
    round(avg) "pin" can split at a 4dp boundary — the e_changepoint
    sf0.001 lesson). Lower-median selection uses the repo's
    inverse-ECDF ceil(n/2) convention. The oracle replays pairs,
    both median windows and the residual intercept."""
    from pandasvcf_spark.operators.stats import theil_sen

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = e.groupBy(
        F.col("event_type").alias("et"),
        F.floor(F.unix_timestamp("ts").cast("long") / 86400)
        .cast("double")
        .alias("x"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    return theil_sen(daily, ["et"], "x", "y").orderBy("et")


@register(
    "m_pacf",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(count(*) AS DOUBLE) AS x
      FROM events WHERE ts IS NOT NULL GROUP BY 1),
    mu AS (SELECT avg(x) AS m FROM hourly),
    d AS (
      SELECT x - mu.m AS d0,
             lead(x, 1) OVER w - mu.m AS d1,
             lead(x, 2) OVER w - mu.m AS d2,
             lead(x, 3) OVER w - mu.m AS d3
      FROM hourly, mu WINDOW w AS (ORDER BY h)),
    agg AS (SELECT sum(d0 * d0) AS den, sum(d0 * d1) AS n1,
                   sum(d0 * d2) AS n2, sum(d0 * d3) AS n3 FROM d),
    f AS (SELECT den, n1 / den AS r1, n2 / den AS r2,
                 n3 / den AS r3 FROM agg),
    g AS (SELECT den, r1, r2, r3,
                 1.0 - r1 * r1 AS p22d,
                 (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22
          FROM f),
    h2 AS (SELECT *, r1 - p22 * r1 AS p21 FROM g),
    h3 AS (SELECT *,
                  1.0 - p21 * r1 - p22 * r2 AS p33d,
                  (r3 - p21 * r2 - p22 * r1)
                    / (1.0 - p21 * r1 - p22 * r2) AS p33
           FROM h2)
    SELECT 1 AS lag,
           round(CASE WHEN den > 0 THEN r1 END, 6) + 0.0 AS acf,
           round(CASE WHEN den > 0 THEN r1 END, 6) + 0.0 AS pacf
    FROM h3
    UNION ALL SELECT 2,
      round(CASE WHEN den > 0 THEN r2 END, 6) + 0.0,
      round(CASE WHEN den > 0 AND p22d <> 0 THEN p22 END, 6) + 0.0
    FROM h3
    UNION ALL SELECT 3,
      round(CASE WHEN den > 0 THEN r3 END, 6) + 0.0,
      round(CASE WHEN den > 0 AND p22d <> 0 AND p33d <> 0
            THEN p33 END, 6) + 0.0
    FROM h3
    ORDER BY lag
    """,
)
def m_pacf(spark, sf_dir):
    """Partial autocorrelation at lags 1-3 (operators/stats.
    pacf_stats; closed-form Durbin-Levinson) of the hourly event-count
    series — the AR-order diagnostic beside m_acf: PACF removes the
    shorter-lag pathways, so "is the lag-2 echo real or lag-1 twice?"
    gets a direct answer. Same series machinery as m_acf (lead()
    columns + ONE 1-row fold); the recursion is pure closed-form
    projection, replayed operand-for-operand by the oracle."""
    from pandasvcf_spark.operators.stats import pacf_stats

    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    return pacf_stats(hourly, "h", "x").orderBy("lag")


@register(
    "m_cuped",
    oracle="""
    WITH u AS (
      SELECT user_id,
             avg(CASE WHEN (epoch_us(ts) // 1000000) // 86400 < 19738
                 THEN value END) AS pre,
             avg(CASE WHEN (epoch_us(ts) // 1000000) // 86400 >= 19738
                 THEN value END) AS post
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND value IS NOT NULL
      GROUP BY user_id),
    b AS (SELECT user_id, pre AS x, post AS y FROM u
          WHERE pre IS NOT NULL AND post IS NOT NULL),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy,
                 sum(x * y) AS sxy
          FROM b),
    m AS (SELECT n,
                 sxx - sx * sx / CAST(n AS DOUBLE) AS vx,
                 syy - sy * sy / CAST(n AS DOUBLE) AS vy,
                 sxy - sx * sy / CAST(n AS DOUBLE) AS cv
          FROM g)
    SELECT n,
           round(CASE WHEN vx > 0 AND vy > 0 THEN cv / vx END, 6)
             + 0.0 AS theta,
           round(CASE WHEN vx > 0 AND vy > 0
                 THEN cv / sqrt(vx * vy) END, 6) + 0.0 AS corr,
           round(CASE WHEN vx > 0 AND vy > 0
                 THEN cv * cv / (vx * vy) END, 6) AS var_reduction
    FROM m
    """,
)
def m_cuped(spark, sf_dir):
    """CUPED variance-reduction summary (operators/stats.cuped_adjust;
    Deng et al. 2013): per-user mean event value in the first 15 days
    as the pre-period covariate for the last 15 days' metric — how
    much experiment variance would regressing out history remove?
    (var_reduction = corr², exactly.) The corpus pre-aggregates to
    the per-user table first; the summary is one 5-sum pass of
    moment ratios. The oracle replays the split, both per-user
    means and the theta/corr arithmetic."""
    from pandasvcf_spark.operators.stats import cuped_adjust

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    day = F.floor(F.unix_timestamp("ts").cast("long") / 86400)
    per_user = e.groupBy("user_id").agg(
        F.avg(F.when(day < 19738, F.col("value"))).alias("pre"),
        F.avg(F.when(day >= 19738, F.col("value"))).alias("post"),
    )
    return cuped_adjust(per_user, "user_id", "pre", "post")


@register(
    "e_forecast_baseline",
    oracle="""
    WITH d AS (
      SELECT event_type AS et,
             (epoch_us(ts) // 1000000) // 86400 AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY event_type, (epoch_us(ts) // 1000000) // 86400),
    l AS (
      SELECT et, x,
             lag(x, 7) OVER (PARTITION BY et ORDER BY day) AS p
      FROM d),
    e AS (SELECT et, x, p, abs(x - p) AS err,
                 abs(x) + abs(p) AS den
          FROM l WHERE p IS NOT NULL)
    SELECT et, CAST(count(*) AS BIGINT) AS n_eval,
           round(avg(err), 4) AS mae,
           round(avg(CASE WHEN den > 0 THEN 2.0 * err / den
                     ELSE 0.0 END), 6) AS smape
    FROM e GROUP BY et ORDER BY et
    """,
)
def e_forecast_baseline(spark, sf_dir):
    """Seasonal-naive forecast backtest (operators/stats.
    seasonal_naive_eval, period = 7): predict each event type's daily
    count by its value a week earlier, score MAE + sMAPE — the
    no-model baseline every forecasting effort must beat, and the
    drift canary when yesterday's baseline suddenly degrades. The
    corpus collapses to the 30-point daily series first; one lag()
    window + one agg; integer counts make the errors exact
    rationals. The oracle replays the lag and both metrics."""
    from pandasvcf_spark.operators.stats import seasonal_naive_eval

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = e.groupBy(
        F.col("event_type").alias("et"),
        F.floor(F.unix_timestamp("ts").cast("long") / 86400).alias(
            "day"
        ),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    return seasonal_naive_eval(
        daily, ["et"], "day", "x", period=7
    ).orderBy("et")


def _markov_step_sql(pin: str, out: str) -> str:
    """One unrolled stationary-power round: mass flows along the
    row-normalized transition table `pr`, then renormalizes."""
    return f"""
    {out}_s AS (
      SELECT pr.nx AS state, sum({pin}.pi * pr.prob) AS m
      FROM {pin} JOIN pr ON {pin}.state = pr.p GROUP BY pr.nx),
    {out}_t AS (SELECT sum(m) AS tt FROM {out}_s),
    {out} AS (SELECT state, m / tt AS pi FROM {out}_s, {out}_t)"""


@register(
    "e_markov_stationary",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS nxt
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL AND event_id IS NOT NULL),
    t AS (SELECT event_type AS p, nxt AS nx,
                 CAST(count(*) AS DOUBLE) AS c
          FROM s WHERE nxt IS NOT NULL GROUP BY event_type, nxt),
    pr AS (SELECT p, nx, c / sum(c) OVER (PARTITION BY p) AS prob
           FROM t),
    st AS (SELECT p AS state FROM t UNION SELECT nx FROM t),
    kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM st),
    pi0 AS (SELECT state, 1.0 / k AS pi FROM st, kk),
    {_markov_step_sql('pi0', 'pi1')},
    {_markov_step_sql('pi1', 'pi2')}
    SELECT state, round(pi, 6) + 0.0 AS pi FROM pi2 ORDER BY state
    """,
)
def e_markov_stationary(spark, sf_dir):
    """Stationary distribution of the event-type Markov chain
    (operators/relational.markov_stationary, 2 fixed power rounds
    from uniform) — where does the user flow settle? The
    event-sequence cousin of g_pagerank, built on e_transitions'
    bigram counts: every relation is vocabulary-sized (the
    transition table + a row-total window; each round one
    state-keyed join + one partial agg + a 1-row renormalization
    broadcast — no matrix literals, a million-state chain costs the
    same shape). The oracle unrolls both rounds."""
    from pandasvcf_spark.operators.relational import markov_stationary

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("prev"),
        F.lead("event_type").over(w).alias("next"),
    ).filter(F.col("next").isNotNull())
    trans = seq.groupBy("prev", "next").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return markov_stationary(trans, iters=2).orderBy("state")


@register(
    "e_rfm",
    oracle="""
    WITH pu AS (
      SELECT user_id AS u,
             max((epoch_us(ts) // 1000000) // 86400) AS lastd,
             CAST(count(*) AS BIGINT) AS freq,
             round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                        AS DOUBLE), 4) AS mon
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND value IS NOT NULL
      GROUP BY user_id),
    m AS (SELECT *, max(lastd) OVER () - lastd AS rec,
                 count(*) OVER () AS nn
          FROM pu),
    b AS (
      SELECT mon,
             CAST(floor((row_number() OVER (ORDER BY rec, u) - 1)
                        * 5 / nn) AS INTEGER) AS r_bucket,
             CAST(floor((row_number() OVER (ORDER BY freq DESC, u)
                         - 1) * 5 / nn) AS INTEGER) AS f_bucket,
             CAST(floor((row_number() OVER (ORDER BY mon DESC, u)
                         - 1) * 5 / nn) AS INTEGER) AS m_bucket
      FROM m)
    SELECT r_bucket, f_bucket, m_bucket,
           CAST(count(*) AS BIGINT) AS n_users,
           round(avg(mon), 4) AS avg_monetary
    FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def e_rfm(spark, sf_dir):
    """RFM customer segmentation (operators/relational.rfm_segments,
    5 buckets/dimension) — the classic marketing rollup on the
    events stream. One user-keyed agg collapses the corpus; buckets
    are explicit floor((rank-1)·k/n) integer arithmetic with id
    tie-breaks, NOT ntile() (engine-specific remainder rules), and
    monetary is INTEGER CENTS so its sum — the ranking key — is
    engine-exact (a rounded float aggregate can split at a decimal
    boundary, the e_changepoint sf0.001 lesson). The oracle replays the user table,
    all three rank windows and the segment rollup."""
    from pandasvcf_spark.operators.relational import rfm_segments

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    d = e.select(
        "user_id",
        F.floor(F.unix_timestamp("ts").cast("long") / 86400).alias(
            "day"
        ),
        # integer cents: the monetary SUM is then exact, so the rank
        # boundary can never flip on an accumulation ulp (the
        # e_changepoint sf0.001 lesson — round(value*100) of the RAW
        # value is deterministic, a rounded float aggregate is not)
        F.round(F.col("value") * 100, 0).cast("long").alias("value"),
    )
    return rfm_segments(d, "user_id", "day", "value", n_buckets=5)


@register(
    "m_roc_points",
    oracle="""
    WITH b AS (
      SELECT round(value, 0) AS s,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    r AS (
      SELECT DISTINCT s,
             sum(y) OVER (ORDER BY s DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cp,
             sum(1 - y) OVER (ORDER BY s DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cn,
             sum(y) OVER () AS pp,
             sum(1 - y) OVER () AS np
      FROM b)
    SELECT s AS score,
           round(CASE WHEN pp > 0
                 THEN CAST(cp AS DOUBLE) / pp END, 6) AS tpr,
           round(CASE WHEN np > 0
                 THEN CAST(cn AS DOUBLE) / np END, 6) AS fpr
    FROM r ORDER BY score DESC
    """,
)
def m_roc_points(spark, sf_dir):
    """Full ROC curve at every distinct (integer-rounded) score
    threshold (operators/stats.roc_points): value predicting the
    'error' label — the curve behind m_group_auc's scalar and
    m_confusion's single operating point. The corpus collapses to
    distinct-score (pos, neg) cells FIRST (the classifier_report
    device — no raw rows enter the unpartitioned cumulative ladder);
    one point per distinct score; integer counts make every
    (tpr, fpr) exact rational arithmetic. Scores pre-bucket to
    integers (the documented dense-score discipline).
    The oracle replays the cumulative ladders point-for-point."""
    from pandasvcf_spark.operators.stats import roc_points

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        F.round(F.col("value"), 0).alias("s"),
        F.when(F.col("event_type") == "error", 1)
        .otherwise(0)
        .alias("y"),
    )
    return roc_points(d, "s", "y")


@register(
    "e_drawdown",
    oracle="""
    WITH d AS (
      SELECT user_id % 4 AS et,
             (epoch_us(ts) // 1000000) // 86400 AS day,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                           WHEN event_type = 'error' THEN -1
                           ELSE 0 END) AS DOUBLE) AS x
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
        AND user_id IS NOT NULL
      GROUP BY user_id % 4, (epoch_us(ts) // 1000000) // 86400),
    cc AS (
      SELECT et, day,
             sum(x) OVER (PARTITION BY et ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM d),
    c AS (
      SELECT et, cum,
             max(cum) OVER (PARTITION BY et ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - cum AS dd,
             row_number() OVER (PARTITION BY et ORDER BY day DESC)
               AS lastr
      FROM cc)
    SELECT et, CAST(count(*) AS BIGINT) AS n_steps,
           round(max(CASE WHEN lastr = 1 THEN cum END), 4) AS final,
           round(max(dd), 4) AS max_dd
    FROM c GROUP BY et ORDER BY et
    """,
)
def e_drawdown(spark, sf_dir):
    """Maximum drawdown of each user cohort's cumulative daily
    purchases-minus-errors balance (operators/stats.max_drawdown) —
    the worst peak-to-trough drop of the running net total, the
    regression-depth summary. SIGNED INTEGER daily increments make
    the cumulative ladders bit-exact (and give the balance real
    drawdowns — an all-positive value sum is monotone and its
    drawdown trivially 0); two cumulative windows on one exchange +
    one agg. The oracle replays the ladder, running peak and final
    row."""
    from pandasvcf_spark.operators.stats import max_drawdown

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
    )
    daily = e.groupBy(
        (F.col("user_id") % 4).alias("et"),
        F.floor(F.unix_timestamp("ts").cast("long") / 86400).alias(
            "day"
        ),
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1)
            .when(F.col("event_type") == "error", -1)
            .otherwise(0)
        )
        .cast("double")
        .alias("x")
    )
    return max_drawdown(daily, ["et"], "day", "x").orderBy("et")


@register(
    "e_burstiness",
    oracle="""
    WITH d AS (
      SELECT event_type AS et,
             (epoch_us(ts) // 1000000) // 86400 AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY event_type, (epoch_us(ts) // 1000000) // 86400),
    g AS (
      SELECT et, CAST(count(*) AS BIGINT) AS n,
             sum(x) AS s, sum(x * x) AS q
      FROM d GROUP BY et),
    m AS (
      SELECT et, n, s / CAST(n AS DOUBLE) AS mean,
             (q - s * s / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1.0) AS vv
      FROM g)
    SELECT et, n, round(mean, 4) AS mean,
           round(CASE WHEN n >= 2 AND mean > 0
                 THEN vv / mean END, 6) AS fano,
           round(CASE WHEN n >= 2 AND sqrt(vv) + mean > 0
                 THEN (sqrt(vv) - mean) / (sqrt(vv) + mean) END, 6)
             + 0.0 AS burstiness
    FROM m ORDER BY et
    """,
)
def e_burstiness(spark, sf_dir):
    """Burstiness + Fano factor of each event type's daily count
    series (operators/stats.burstiness_stats; Goh-Barabási 2008) —
    Poisson-smooth or bursty? The stream-health scalar pair beside
    e_rate_anomaly's pointwise z-scores. Integer counts make the
    3-sum moments engine-exact; both scalars are moment ratios.
    The oracle replays the daily rollup and both formulas."""
    from pandasvcf_spark.operators.stats import burstiness_stats

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = e.groupBy(
        F.col("event_type").alias("et"),
        F.floor(F.unix_timestamp("ts").cast("long") / 86400).alias(
            "day"
        ),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    return burstiness_stats(daily, ["et"], "x").orderBy("et")


@register(
    "m_logrank",
    oracle="""
    WITH s AS (
      SELECT CAST(value AS DOUBLE) AS t,
             CASE WHEN event_type NOT IN ('error', 'signup')
                  THEN 1 ELSE 0 END AS ev,
             CAST(user_id % 2 AS INTEGER) AS g
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
        AND user_id IS NOT NULL),
    per_t AS (
      SELECT t,
             CAST(sum(CASE WHEN ev <> 0 AND g = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d1,
             CAST(sum(CASE WHEN ev <> 0 AND g = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d0,
             CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS a1,
             CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS a0
      FROM s GROUP BY t),
    tot AS (SELECT sum(a1) AS t1, sum(a0) AS t0 FROM per_t),
    b AS (
      SELECT t, d1, d0,
             t1 - coalesce(sum(a1) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n1t,
             t0 - coalesce(sum(a0) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n0t,
             t1, t0
      FROM per_t, tot),
    f AS (
      SELECT t1, t0, d1, d0, n1t, n0t,
             CAST(n1t + n0t AS DOUBLE) AS nt,
             CAST(d1 + d0 AS DOUBLE) AS dt,
             CAST(n1t AS DOUBLE) / CAST(n1t + n0t AS DOUBLE) AS p1
      FROM b WHERE d1 + d0 > 0),
    a AS (
      SELECT CAST(max(t1) AS BIGINT) AS n1,
             CAST(max(t0) AS BIGINT) AS n2,
             CAST(sum(d1) AS BIGINT) AS o1,
             sum(dt * p1) AS e1s,
             sum(CASE WHEN nt > 1
                 THEN dt * p1 * (1.0 - p1) * (nt - dt) / (nt - 1.0)
                 ELSE 0.0 END) AS vs
      FROM f)
    SELECT n1, n2, o1, round(e1s, 4) AS e1,
           round(CASE WHEN vs > 0
                 THEN ((CAST(o1 AS DOUBLE) - e1s) / sqrt(vs))
                      * ((CAST(o1 AS DOUBLE) - e1s) / sqrt(vs))
                 END, 6) AS chi2,
           round(CASE WHEN vs > 0
                 THEN (CAST(o1 AS DOUBLE) - e1s) / sqrt(vs) END, 6)
             + 0.0 AS z
    FROM a
    """,
)
def m_logrank(spark, sf_dir):
    """Two-sample log-rank test (operators/stats.logrank_test; Mantel
    1966) — ARE even and odd users' survival curves different?
    Duration = value, error/signup right-censor (the m_nelson_aalen
    fixture split by user parity) — the hypothesis-test closer for
    the survival family. The kaplan_meier plan twice over: per-time
    4-counter rows, two bit-exact integer at-risk ladders over the
    shared time order, a 1-row O−E/variance fold. Expected z ~ 0 on
    this parity-blind synthetic data. The oracle replays ladders,
    expectations and the hypergeometric variance."""
    from pandasvcf_spark.operators.stats import logrank_test

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
    )
    d = e.select(
        F.col("value").alias("t"),
        F.when(~F.col("event_type").isin("error", "signup"), 1)
        .otherwise(0)
        .alias("ev"),
        (F.col("user_id") % 2).cast("int").alias("g"),
    )
    return logrank_test(d, "t", "ev", "g")


@register(
    "e_extremes",
    oracle="""
    WITH d AS (
      SELECT event_type AS et,
             (epoch_us(ts) // 1000000) // 86400 AS day,
             max(value) AS x
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
        AND value IS NOT NULL
      GROUP BY event_type, (epoch_us(ts) // 1000000) // 86400),
    g AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
                 sum(x) AS s, sum(x * x) AS q
          FROM d GROUP BY et),
    m AS (SELECT et, n, s / CAST(n AS DOUBLE) AS mean,
                 (q - s * s / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0) AS vv
          FROM g),
    f AS (SELECT et, n, mean, vv,
                 sqrt(vv) * CAST(2.449489742783178 AS DOUBLE)
                   / CAST(3.141592653589793 AS DOUBLE) AS beta
          FROM m),
    h AS (SELECT et, n, vv, beta,
                 mean - CAST(0.5772156649015329 AS DOUBLE) * beta
                   AS mu
          FROM f)
    SELECT et, n,
           round(CASE WHEN n >= 2 AND vv > 0 THEN mu END, 4) AS mu,
           round(CASE WHEN n >= 2 AND vv > 0 THEN beta END, 4)
             AS beta,
           round(CASE WHEN n >= 2 AND vv > 0
                 THEN mu - beta * ln(-ln(1.0 - CAST(1.0 AS DOUBLE)
                                               / 100.0))
                 END, 4) AS rl
    FROM h ORDER BY et
    """,
)
def e_extremes(spark, sf_dir):
    """Gumbel extreme-value fit of daily maximum event values per
    type (operators/stats.gumbel_extremes; method of moments,
    100-day return level) — "how bad is the 1-in-100 day?" for
    latency/load ceilings. The corpus collapses to ~30 block maxima
    per group; one 3-sum groupBy + pure arithmetic, with the
    pi/gamma/sqrt(6) constants mirrored DIGIT-FOR-DIGIT in the
    oracle (an engine's pi() need not equal the parsed literal).
    The oracle replays moments, both parameters and the return
    level."""
    from pandasvcf_spark.operators.stats import gumbel_extremes

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    )
    daily = e.groupBy(
        F.col("event_type").alias("et"),
        F.floor(F.unix_timestamp("ts").cast("long") / 86400).alias(
            "day"
        ),
    ).agg(F.max("value").alias("x"))
    return gumbel_extremes(
        daily, ["et"], "x", return_period=100.0
    ).orderBy("et")


@register(
    "e_changepoint",
    oracle="""
    WITH d AS (
      SELECT event_type AS et,
             (epoch_us(ts) // 1000000) // 86400 AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY event_type, (epoch_us(ts) // 1000000) // 86400),
    r AS (
      SELECT et, day AS t,
             row_number() OVER (PARTITION BY et ORDER BY day) AS k,
             sum(x) OVER (PARTITION BY et ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sk,
             sum(x) OVER (PARTITION BY et) AS sn,
             count(*) OVER (PARTITION BY et) AS n
      FROM d),
    c AS (
      SELECT et, t, k, n, sk, sn,
             round(sk * sk / CAST(k AS DOUBLE)
                   + (sn - sk) * (sn - sk)
                     / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
                   - sn * sn / CAST(n AS DOUBLE), 4) AS g
      FROM r WHERE k < n),
    p AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY et ORDER BY g DESC, k) AS rn
        FROM c) WHERE rn = 1)
    SELECT et, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_best,
           t AS t_split, g AS gain,
           round(sk / CAST(k AS DOUBLE), 4) AS mean_left,
           round((sn - sk) / CAST(n - k AS DOUBLE), 4) AS mean_right
    FROM p ORDER BY et
    """,
)
def e_changepoint(spark, sf_dir):
    """Best single mean-shift changepoint per event type
    (operators/stats.changepoint_single) over the daily COUNT series
    — the exact one-split solution CUSUM's sequential scores
    approximate (e_cusum's offline closer): argmax of the
    between-segment sum-of-squares gain from prefix sums. INTEGER
    increments make the ladders and gains bit-exact (a round(avg)
    "pin" is NOT safe for discrete argmax decisions — the exact mean
    can sit on a 4dp boundary where engine ulps split the rounding,
    which a driver run at sf0.001 actually hit); one cumulative +
    one rank window on the same exchange. The oracle replays prefix
    sums, gains and the tie-broken argmax."""
    from pandasvcf_spark.operators.stats import changepoint_single

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = e.groupBy(
        F.col("event_type").alias("et"),
        F.floor(F.unix_timestamp("ts").cast("long") / 86400).alias(
            "day"
        ),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    return changepoint_single(daily, ["et"], "day", "x").orderBy("et")


def _period_oracle(max_lag: int = 30) -> str:
    leads = ",\n             ".join(
        f"lead(x, {k}) OVER w - mu.m AS d{k}"
        for k in range(1, max_lag + 1)
    )
    sums = ",\n             ".join(
        f"sum(d0 * d{k}) AS n{k}" for k in range(1, max_lag + 1)
    )
    rows = "\n    UNION ALL ".join(
        f"SELECT et, n, {k} AS lag,"
        f" round(n{k} / den, 6) + 0.0 AS acf"
        f" FROM agg WHERE den > 0"
        for k in range(1, max_lag + 1)
    )
    return f"""
    WITH hourly AS (
      SELECT event_type AS et, date_trunc('hour', ts) AS h,
             CAST(count(*) AS DOUBLE) AS x
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY event_type, date_trunc('hour', ts)),
    mu AS (SELECT et, avg(x) AS m FROM hourly GROUP BY et),
    d AS (
      SELECT hourly.et AS et, x - mu.m AS d0,
             {leads}
      FROM hourly JOIN mu ON hourly.et = mu.et
      WINDOW w AS (PARTITION BY hourly.et ORDER BY h)),
    agg AS (
      SELECT et, CAST(count(*) AS BIGINT) AS n,
             sum(d0 * d0) AS den,
             {sums}
      FROM d GROUP BY et),
    stacked AS (
    {rows}),
    best AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY et ORDER BY acf DESC, lag) AS rn
        FROM stacked) WHERE rn = 1)
    SELECT et, n, CAST(lag AS INTEGER) AS best_lag, acf
    FROM best ORDER BY et
    """


@register("e_dominant_period", oracle=_period_oracle())
def e_dominant_period(spark, sf_dir):
    """Dominant periodicity of each event type's hourly count series
    (operators/stats.dominant_period, lags 1-30) — the m_acf
    machinery turned into a detector: which lag's autocorrelation
    wins? (A daily rhythm shows as lag 24 on an hourly series.) 30
    lead() columns over ONE group-keyed window + one agg + a
    rounded-score argmax with smallest-lag ties. The oracle unrolls
    all 30 correlations and the argmax."""
    from pandasvcf_spark.operators.stats import dominant_period

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    hourly = e.groupBy(
        F.col("event_type").alias("et"),
        F.date_trunc("hour", "ts").alias("h"),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    return dominant_period(hourly, ["et"], "h", "x", max_lag=30).orderBy(
        "et"
    )


@register(
    "m_odds_ratio",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS ex,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS oc
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    g AS (
      SELECT
        CAST(sum(CASE WHEN ex = 1 AND oc = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS a,
        CAST(sum(CASE WHEN ex = 1 AND oc = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS b,
        CAST(sum(CASE WHEN ex = 0 AND oc = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS c,
        CAST(sum(CASE WHEN ex = 0 AND oc = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS d
      FROM b),
    m AS (
      SELECT a, b, c, d,
             CAST(a AS DOUBLE) AS ad, CAST(b AS DOUBLE) AS bd,
             CAST(c AS DOUBLE) AS cd, CAST(d AS DOUBLE) AS dd,
             (a > 0 AND b > 0 AND c > 0 AND d > 0) AS ok
      FROM g),
    f AS (
      SELECT *, ad * dd / (bd * cd) AS orr,
             (ad / (ad + bd)) / (cd / (cd + dd)) AS rr,
             sqrt(1.0 / ad + 1.0 / bd + 1.0 / cd + 1.0 / dd) AS se
      FROM m)
    SELECT a, b, c, d,
           round(CASE WHEN ok THEN orr END, 4) AS odds_ratio,
           round(CASE WHEN ok THEN rr END, 4) AS rel_risk,
           round(CASE WHEN ok
                 THEN exp(ln(orr) - 1.96 * se) END, 4) AS ci_lo,
           round(CASE WHEN ok
                 THEN exp(ln(orr) + 1.96 * se) END, 4) AS ci_hi
    FROM f
    """,
)
def m_odds_ratio(spark, sf_dir):
    """2x2 odds ratio / relative risk with the Woolf CI
    (operators/stats.odds_ratio): odd-user exposure vs the 'error'
    outcome — the feature-flag-vs-crash readout beside m_ab_test's
    difference-of-proportions z. One 4-counter conditional agg (the
    m_confusion shape) + pure arithmetic; zero cells yield NULL, no
    continuity fudge. Expected OR ~ 1 on this parity-blind data.
    The oracle replays counters, ratios and the log-normal CI."""
    from pandasvcf_spark.operators.stats import odds_ratio

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        (F.col("user_id") % 2).cast("int").alias("ex"),
        F.when(F.col("event_type") == "error", 1)
        .otherwise(0)
        .alias("oc"),
    )
    return odds_ratio(d, "ex", "oc", z=1.96)


@register(
    "m_sample_size",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS g,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
               AS oc
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    a AS (
      SELECT
        CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(sum(CASE WHEN g = 1 AND oc = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS s1,
        CAST(sum(CASE WHEN g = 0 AND oc = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS s2
      FROM b),
    m AS (
      SELECT n1, n2,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
             CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2
      FROM a),
    f AS (
      SELECT n1, n2, p1, p2, p1 - p2 AS diff,
             (CAST(1.96 AS DOUBLE)
              + CAST(0.8416212335729143 AS DOUBLE)) AS zz
      FROM m)
    SELECT n1, n2,
           round(CASE WHEN n1 > 0 THEN p1 END, 6) AS p1,
           round(CASE WHEN n2 > 0 THEN p2 END, 6) AS p2,
           round(CASE WHEN n1 > 0 AND n2 > 0 THEN diff END, 6) + 0.0
             AS diff,
           CAST(CASE WHEN n1 > 0 AND n2 > 0 AND abs(diff) >= 1e-6
                THEN ceil(zz * zz * (p1 * (1.0 - p1)
                                     + p2 * (1.0 - p2))
                          / (diff * diff)) END AS BIGINT)
             AS n_per_arm
    FROM f
    """,
)
def m_sample_size(spark, sf_dir):
    """Two-proportion A/B sample-size planner (operators/stats.
    sample_size_2prop; alpha .05 two-sided, power .80): how many
    users per arm would detecting the observed even-vs-odd purchase
    gap take? The z quantiles are digit-mirrored DOUBLE literals
    (neither engine has an inverse normal); a sub-1e-6 observed
    difference yields NULL rather than an absurd n. One 4-counter
    agg + arithmetic; the oracle replays rates and the formula."""
    from pandasvcf_spark.operators.stats import sample_size_2prop

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        (F.col("user_id") % 2).cast("int").alias("g"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("oc"),
    )
    return sample_size_2prop(d, "g", "oc")


@register(
    "e_seasonal_strength",
    oracle="""
    WITH hourly AS (
      SELECT event_type AS et, date_trunc('hour', ts) AS h,
             CAST(count(*) AS DOUBLE) AS x
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY event_type, date_trunc('hour', ts)),
    b AS (SELECT et, hour(h) AS slot, x FROM hourly),
    sm AS (SELECT et, slot, avg(x) AS m FROM b GROUP BY et, slot),
    j AS (SELECT b.et AS et, b.x, sm.m
          FROM b JOIN sm ON b.et = sm.et AND b.slot = sm.slot),
    g AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
                 sum(x) AS s, sum(x * x) AS q,
                 sum((x - m) * (x - m)) AS qr
          FROM j GROUP BY et)
    SELECT et, n,
           round(CASE WHEN q / CAST(n AS DOUBLE)
                      - (s / CAST(n AS DOUBLE))
                        * (s / CAST(n AS DOUBLE)) > 0
                 THEN greatest(0.0, 1.0 - (qr / CAST(n AS DOUBLE))
                      / (q / CAST(n AS DOUBLE)
                         - (s / CAST(n AS DOUBLE))
                           * (s / CAST(n AS DOUBLE))))
                 END, 6) AS strength
    FROM g ORDER BY et
    """,
)
def e_seasonal_strength(spark, sf_dir):
    """Seasonality-strength scalar per event type (operators/stats.
    seasonal_strength; the STL-style 1 − var(resid)/var(x) over
    hour-of-day slots) — "is this stream's rhythm real?" in one
    number, the scalar partner of e_seasonal_profile's slot means
    and e_dominant_period's lag argmax. Slot means are slot-sized
    broadcast join-backs; the measure is a population-variance
    ratio. The oracle replays slots, residuals and the ratio."""
    from pandasvcf_spark.operators.stats import seasonal_strength

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    hourly = e.groupBy(
        F.col("event_type").alias("et"),
        F.date_trunc("hour", "ts").alias("h"),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    series = hourly.select(
        "et", F.hour("h").alias("slot"), "x"
    )
    return seasonal_strength(series, ["et"], "slot", "x").orderBy("et")


@register(
    "e_streaks",
    oracle="""
    WITH b AS (
      SELECT user_id AS k, ts, event_id AS eid,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS f
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL AND event_id IS NOT NULL),
    i AS (
      SELECT k, f,
             row_number() OVER (PARTITION BY k ORDER BY ts, eid)
             - row_number() OVER (PARTITION BY k, f
                                  ORDER BY ts, eid) AS isl
      FROM b),
    runs AS (SELECT k, isl, count(*) AS len
             FROM i WHERE f = 1 GROUP BY k, isl),
    pk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_events,
                  CAST(sum(f) AS BIGINT) AS n_flagged
           FROM b GROUP BY k),
    best AS (SELECT k, CAST(max(len) AS BIGINT) AS ls
             FROM runs GROUP BY k)
    SELECT pk.k AS user_id, n_events, n_flagged,
           CAST(coalesce(ls, 0) AS BIGINT) AS longest_streak
    FROM pk LEFT JOIN best ON pk.k = best.k
    ORDER BY user_id
    """,
)
def e_streaks(spark, sf_dir):
    """Longest consecutive purchase streak per user
    (operators/relational.longest_streaks) — the gaps-and-islands
    classic: islands are constant values of row_number minus
    flag-partitioned row_number, so the whole statistic is two rank
    windows on ONE user-keyed exchange + two aggs. event_id breaks
    timestamp ties (the total-order rule). The oracle replays
    islands, run lengths and the zero-streak left join."""
    from pandasvcf_spark.operators.relational import longest_streaks

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("event_id").isNotNull()
    )
    d = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("f"),
    )
    return longest_streaks(
        d, "user_id", "ts", "f", tiebreak_col="event_id"
    ).orderBy("user_id")


@register(
    "m_runs_test",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(count(*) AS DOUBLE) AS x
      FROM events WHERE ts IS NOT NULL GROUP BY 1),
    med AS (SELECT x AS m FROM (
             SELECT x, row_number() OVER (ORDER BY x) AS r,
                    count(*) OVER () AS n FROM hourly)
            WHERE r = greatest(CAST(ceil(n / 2.0) AS BIGINT), 1)),
    sided AS (SELECT h, CASE WHEN x > med.m THEN 1 ELSE 0 END AS s
              FROM hourly, med WHERE x <> med.m),
    fl AS (SELECT s, CASE WHEN lag(s) OVER (ORDER BY h) IS NULL
                           OR lag(s) OVER (ORDER BY h) <> s
                      THEN 1 ELSE 0 END AS nr
           FROM sided),
    g AS (SELECT CAST(sum(s) AS BIGINT) AS n1,
                 CAST(sum(1 - s) AS BIGINT) AS n2,
                 CAST(sum(nr) AS BIGINT) AS runs FROM fl),
    m2 AS (SELECT n1, n2, runs, CAST(n1 AS DOUBLE) AS a,
                  CAST(n2 AS DOUBLE) AS bb FROM g)
    SELECT n1, n2, runs,
           round(CASE WHEN n1 > 0 AND n2 > 0 AND
                      2.0 * a * bb * (2.0 * a * bb - (a + bb))
                      / ((a + bb) * (a + bb) * ((a + bb) - 1.0)) > 0
                 THEN (CAST(runs AS DOUBLE)
                       - (1.0 + 2.0 * a * bb / (a + bb)))
                      / sqrt(2.0 * a * bb
                             * (2.0 * a * bb - (a + bb))
                             / ((a + bb) * (a + bb)
                                * ((a + bb) - 1.0)))
                 END, 6) + 0.0 AS z
    FROM m2
    """,
)
def m_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test (operators/stats.runs_test) on the
    hourly event-count series — too few above/below-median runs
    means trending, too many means oscillating; the i.i.d. sanity
    check before trusting any independence-assuming statistic on
    the stream. Exact lower-median split (equals excluded), one lag
    window for run starts, 1-row folds. The oracle replays median,
    sides, run boundaries and the z arithmetic operand-for-operand."""
    from pandasvcf_spark.operators.stats import runs_test

    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    return runs_test(hourly, "h", "x")


def _qshift_oracle(probs=(0.1, 0.25, 0.5, 0.75, 0.9)) -> str:
    mins = []
    rows = []
    for p in probs:
        tag = int(p * 10000)
        for side in (0, 1):
            mins.append(
                f"min(CASE WHEN f = {side} AND CAST(cw AS DOUBLE)"
                f" >= CAST({p} AS DOUBLE) * CAST(w AS DOUBLE)"
                f" THEN v END) AS q{side}_{tag}"
            )
        rows.append(
            f"SELECT CAST({p} AS DOUBLE) AS p, q0_{tag} AS q0,"
            f" q1_{tag} AS q1, q1_{tag} - q0_{tag} + 0.0 AS shift"
            f" FROM g"
        )
    return f"""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS f,
             CAST(value AS DOUBLE) AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    r AS (
      SELECT f, v,
             count(*) OVER (PARTITION BY f ORDER BY v
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
             count(*) OVER (PARTITION BY f) AS w
      FROM b),
    g AS (SELECT {", ".join(mins)} FROM r)
    {" UNION ALL ".join(rows)}
    ORDER BY p
    """


@register("m_quantile_shift", oracle=_qshift_oracle())
def m_quantile_shift(spark, sf_dir):
    """Doksum shift function (operators/stats.quantile_shift):
    per-quantile treatment effect of user parity on event value at
    p = .1/.25/.5/.75/.9 — the distributional view a mean difference
    hides (a treatment can move the tail, not the median). Both
    sides' type-1 quantiles come from ONE grouped_exact_quantiles
    bucket walk (group key = the flag — fully distributed, no
    flag-partitioned corpus sort); quantile SELECTION is exact, the
    shift their exact difference. The oracle replays the equivalent
    cumulative-window form — same ceil(p·W) rank on the same double
    product. Expected ~0 shifts on parity-blind data."""
    from pandasvcf_spark.operators.stats import quantile_shift

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    d = e.select(
        (F.col("user_id") % 2).cast("int").alias("f"),
        F.col("value").alias("v"),
    )
    return quantile_shift(
        d, "f", "v", probs=(0.1, 0.25, 0.5, 0.75, 0.9)
    ).orderBy("p")


@register(
    "e_control_chart",
    oracle="""
    WITH d AS (
      SELECT event_type AS et,
             (epoch_us(ts) // 1000000) // 86400 AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY event_type, (epoch_us(ts) // 1000000) // 86400),
    m AS (SELECT et, CAST(count(*) AS BIGINT) AS n, avg(x) AS cl
          FROM d GROUP BY et),
    j AS (SELECT d.et AS et, d.x, m.n, m.cl,
                 m.cl + 3.0 * sqrt(m.cl) AS ucl,
                 greatest(0.0, m.cl - 3.0 * sqrt(m.cl)) AS lcl
          FROM d JOIN m ON d.et = m.et)
    SELECT et, max(n) AS n, round(max(cl), 4) AS cl,
           round(max(lcl), 4) AS lcl, round(max(ucl), 4) AS ucl,
           CAST(sum(CASE WHEN x > ucl THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above,
           CAST(sum(CASE WHEN x < lcl THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below
    FROM j GROUP BY et ORDER BY et
    """,
)
def e_control_chart(spark, sf_dir):
    """Shewhart c-chart summary (operators/stats.control_chart) of
    each event type's daily counts — the SPC classic: Poisson
    3-sigma control limits and breach counts, the alarm-threshold
    companion of e_rate_anomaly's z-scores and e_burstiness'
    dispersion scalars. Integer counts make the mean an exact-sum
    ratio, so the limit compares are engine-deterministic. Two
    partial-aggregated passes, no windows. The oracle replays
    limits and flags."""
    from pandasvcf_spark.operators.stats import control_chart

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = e.groupBy(
        F.col("event_type").alias("et"),
        F.floor(F.unix_timestamp("ts").cast("long") / 86400).alias(
            "day"
        ),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    return control_chart(daily, ["et"], "x").orderBy("et")


@register(
    "m_mcnemar",
    oracle="""
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN (epoch_us(ts) // 1000000) // 86400 < 19738
                      AND event_type = 'purchase'
                 THEN 1 ELSE 0 END) AS y1,
             max(CASE WHEN (epoch_us(ts) // 1000000) // 86400 >= 19738
                      AND event_type = 'purchase'
                 THEN 1 ELSE 0 END) AS y2
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL
      GROUP BY user_id),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN y1 = 1 AND y2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n11,
             CAST(sum(CASE WHEN y1 = 1 AND y2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(sum(CASE WHEN y1 = 0 AND y2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(sum(CASE WHEN y1 = 0 AND y2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n00
      FROM u)
    SELECT n, n11, b, c, n00,
           round(CASE WHEN b + c > 0
                 THEN (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
                      * (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
                      / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE))
                 END, 6) AS chi2,
           round(CASE WHEN b + c > 0
                 THEN (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
                      / sqrt(CAST(b AS DOUBLE) + CAST(c AS DOUBLE))
                 END, 6) + 0.0 AS z
    FROM g
    """,
)
def m_mcnemar(spark, sf_dir):
    """McNemar's paired test (operators/stats.mcnemar_test): did each
    user's purchased-at-all state change between the first and last
    15 days? The paired counterpart of m_ab_test (same units, two
    conditions — only the discordant cells inform). One user-keyed
    agg collapses the corpus to per-user binary pairs, then the
    4-counter m_confusion shape. Expected z ~ 0 on this stationary
    stream. The oracle replays the split, the pair cells and both
    statistics."""
    from pandasvcf_spark.operators.stats import mcnemar_test

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    day = F.floor(F.unix_timestamp("ts").cast("long") / 86400)
    per_user = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (day < 19738) & (F.col("event_type") == "purchase"), 1
            ).otherwise(0)
        ).alias("y1"),
        F.max(
            F.when(
                (day >= 19738) & (F.col("event_type") == "purchase"), 1
            ).otherwise(0)
        ).alias("y2"),
    )
    return mcnemar_test(per_user, "y1", "y2")


@register(
    "m_overlap",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS f,
             CAST(value AS DOUBLE) AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    ext AS (SELECT min(v) AS lo, max(v) AS hi FROM b),
    binned AS (
      SELECT CASE WHEN ext.hi - ext.lo > 0
                  THEN least(CAST(floor((v - ext.lo)
                             / (ext.hi - ext.lo) * 20) AS INTEGER),
                             19)
                  ELSE 0 END AS bin,
             f
      FROM b, ext),
    cells AS (
      SELECT bin,
             CAST(sum(CASE WHEN f = 0 THEN 1 ELSE 0 END) AS DOUBLE)
               AS a,
             CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               AS c
      FROM binned GROUP BY bin),
    tot AS (SELECT sum(a) AS ta, sum(c) AS tc FROM cells),
    g AS (
      SELECT max(tot.ta) AS ta, max(tot.tc) AS tc,
             sum(least(a / tot.ta, c / tot.tc)) AS ovl,
             sum(sqrt((a / tot.ta) * (c / tot.tc))) AS bc
      FROM cells, tot)
    SELECT CAST(ta AS BIGINT) AS n0, CAST(tc AS BIGINT) AS n1,
           round(CASE WHEN ta > 0 AND tc > 0 THEN ovl END, 6)
             AS ovl,
           round(CASE WHEN ta > 0 AND tc > 0 THEN bc END, 6) AS bc
    FROM g
    """,
)
def m_overlap(spark, sf_dir):
    """Histogram overlap + Bhattacharyya coefficients
    (operators/stats.overlap_coeff, 20 pooled-extrema bins) between
    even and odd users' value distributions — the covariate-balance
    / common-support diagnostic for matching and uplift work.
    Exact pooled extrema make the bin edges engine-identical;
    expected OVL ~ 1 on this parity-blind data. The oracle replays
    bins, shares and both coefficients."""
    from pandasvcf_spark.operators.stats import overlap_coeff

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    d = e.select(
        (F.col("user_id") % 2).cast("int").alias("f"),
        F.col("value").alias("v"),
    )
    return overlap_coeff(d, "f", "v", n_bins=20)


@register(
    "m_classifier_report",
    oracle="""
    WITH b AS (
      SELECT value / 500.0 AS p,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    cells AS (SELECT p, CAST(sum(y) AS BIGINT) AS pos,
                     CAST(sum(1 - y) AS BIGINT) AS neg
              FROM b GROUP BY p),
    r AS (
      SELECT pos, neg,
             coalesce(sum(pos) OVER (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_pos,
             coalesce(sum(neg) OVER (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_neg,
             sum(pos) OVER () AS tp, sum(neg) OVER () AS tn
      FROM cells),
    curve AS (
      SELECT max(tp) AS tp, max(tn) AS tn,
             sum(CAST(neg AS DOUBLE)
                 * ((CAST(tp AS DOUBLE) - CAST(cum_pos AS DOUBLE)
                     - CAST(pos AS DOUBLE))
                    + CAST(pos AS DOUBLE) / 2.0)) AS auc_num,
             max(abs(CAST(cum_pos + pos AS DOUBLE)
                     / CAST(tp AS DOUBLE)
                     - CAST(cum_neg + neg AS DOUBLE)
                       / CAST(tn AS DOUBLE))) AS ks
      FROM r),
    bins AS (SELECT least(CAST(floor(p * 10) AS INTEGER), 9) AS bin,
                    CAST(count(*) AS DOUBLE) AS nb, avg(p) AS conf,
                    avg(CAST(y AS DOUBLE)) AS acc
             FROM b GROUP BY 1),
    tt AS (SELECT sum(nb) AS tot FROM bins),
    ec AS (SELECT sum(nb / tt.tot * abs(acc - conf)) AS ece
           FROM bins, tt),
    br AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS n_pos,
                  avg((p - CAST(y AS DOUBLE))
                      * (p - CAST(y AS DOUBLE))) AS brier
           FROM b)
    SELECT n, n_pos,
           round(CASE WHEN tp > 0 AND tn > 0
                 THEN auc_num / (CAST(tp AS DOUBLE)
                                 * CAST(tn AS DOUBLE)) END, 6)
             AS auc,
           round(CASE WHEN tp > 0 AND tn > 0 THEN ks END, 6) AS ks,
           round(brier, 6) AS brier,
           round(ece, 6) AS ece
    FROM br, curve, ec
    """,
)
def m_classifier_report(spark, sf_dir):
    """One-call classifier dashboard row (operators/stats.
    classifier_report): AUC + KS + Brier + 10-bin ECE of value/500
    predicting 'purchase' — the m_group_auc / m_ks_lift /
    m_calibration lenses in a single pass. AUC and KS come from
    cumulative windows over the DISTINCT-SCORE class-count table
    (ties exactly half-counted, the rank-form identity; no
    corpus-sized single-partition window — pre-bucket dense scores
    at production scale); Brier and ECE are partial-aggregated
    passes. The oracle replays the count curve and all four
    metrics."""
    from pandasvcf_spark.operators.stats import classifier_report

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        (F.col("value") / 500.0).alias("p"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    return classifier_report(d, "p", "y")


@register(
    "m_brier_decomp",
    oracle="""
    WITH b AS (
      SELECT value / 500.0 AS p,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    bins AS (SELECT least(CAST(floor(p * 10) AS INTEGER), 9) AS bin,
                    CAST(count(*) AS DOUBLE) AS nb, avg(p) AS conf,
                    avg(CAST(y AS DOUBLE)) AS acc
             FROM b GROUP BY 1),
    g0 AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  avg(CAST(y AS DOUBLE)) AS base,
                  avg((p - CAST(y AS DOUBLE))
                      * (p - CAST(y AS DOUBLE))) AS brier
           FROM b),
    t AS (
      SELECT max(n) AS n, max(base) AS base, max(brier) AS brier,
             sum(nb / CAST(n AS DOUBLE)
                 * (conf - acc) * (conf - acc)) AS rel,
             sum(nb / CAST(n AS DOUBLE)
                 * (acc - base) * (acc - base)) AS res
      FROM bins, g0)
    SELECT n, round(brier, 6) AS brier, round(rel, 6) AS rel,
           round(res, 6) AS res,
           round(base * (1.0 - base), 6) AS unc,
           round(brier - (rel - res + base * (1.0 - base)), 6) + 0.0
             AS residual
    FROM t
    """,
)
def m_brier_decomp(spark, sf_dir):
    """Murphy decomposition of the Brier score (operators/stats.
    brier_decomposition): reliability − resolution + uncertainty,
    with the within-bin variance RESIDUAL reported honestly (the
    identity is exact only for bin-constant forecasts) — WHY the
    m_classifier_report brier is what it is. One 10-cell bin agg +
    one 1-row base/Brier agg. The oracle replays bins and all four
    terms."""
    from pandasvcf_spark.operators.stats import brier_decomposition

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        (F.col("value") / 500.0).alias("p"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    return brier_decomposition(d, "p", "y", n_bins=10)


@register(
    "m_equivalence",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS g,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
               AS oc
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    a AS (
      SELECT
        CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(sum(CASE WHEN g = 1 AND oc = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS s1,
        CAST(sum(CASE WHEN g = 0 AND oc = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS s2
      FROM b),
    m AS (
      SELECT n1, n2,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
             CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2
      FROM a),
    f AS (
      SELECT n1, n2, p1, p2, p1 - p2 AS diff,
             sqrt(p1 * (1.0 - p1) / CAST(n1 AS DOUBLE)
                  + p2 * (1.0 - p2) / CAST(n2 AS DOUBLE)) AS se,
             CAST(1.6448536269514722 AS DOUBLE) AS z
      FROM m)
    SELECT n1, n2,
           round(CASE WHEN n1 > 0 THEN p1 END, 6) AS p1,
           round(CASE WHEN n2 > 0 THEN p2 END, 6) AS p2,
           round(CASE WHEN n1 > 0 AND n2 > 0 THEN diff END, 6) + 0.0
             AS diff,
           round(CASE WHEN n1 > 0 AND n2 > 0
                 THEN diff - z * se END, 6) + 0.0 AS ci_lo,
           round(CASE WHEN n1 > 0 AND n2 > 0
                 THEN diff + z * se END, 6) + 0.0 AS ci_hi,
           (CASE WHEN n1 > 0 AND n2 > 0
                 THEN diff - z * se > -0.02 AND diff + z * se < 0.02
            END) AS equivalent
    FROM f
    """,
)
def m_equivalence(spark, sf_dir):
    """Two-proportion equivalence test (operators/stats.
    equivalence_test; Schuirmann TOST via the 90% CI, margin 2pp):
    is the even-vs-odd purchase-rate difference provably NEGLIGIBLE?
    — the launch-safety question a significance test can't answer
    (failing to reject is not equivalence). One 4-counter agg; the
    90% z quantile is a digit-mirrored DOUBLE literal. On this
    parity-blind data equivalence should hold. The oracle replays
    rates, the CI and the margin verdict."""
    from pandasvcf_spark.operators.stats import equivalence_test

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        (F.col("user_id") % 2).cast("int").alias("g"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("oc"),
    )
    return equivalence_test(d, "g", "oc", margin=0.02)


@register(
    "m_kruskal_wallis",
    oracle="""
    WITH b AS (
      SELECT round(value, 0) AS v, event_type AS k
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    tc AS (SELECT v, k, CAST(count(*) AS DOUBLE) AS n
           FROM b GROUP BY v, k),
    vc AS (SELECT v, sum(n) AS t FROM tc GROUP BY v),
    m AS (SELECT v, t,
            coalesce(sum(t) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + (t + 1) / 2 AS mr
          FROM vc),
    pt AS (SELECT k, sum(tc.n * m.mr) AS R, sum(tc.n) AS nk
           FROM tc JOIN m ON tc.v = m.v GROUP BY k),
    tot AS (SELECT sum(t) AS N, sum(t*t*t - t) AS tsum FROM vc),
    s AS (SELECT CAST(count(*) AS BIGINT) AS k, sum(R*R/nk) AS s2
          FROM pt)
    SELECT CAST(N AS BIGINT) AS n, k,
           round(CASE WHEN N >= 2 AND k >= 2
                       AND (1 - tsum/(N*N*N - N)) > 0
                 THEN (12.0/(N*(N+1))*s2 - 3.0*(N+1))
                      / (1 - tsum/(N*N*N - N)) END, 6) + 0.0 AS h
    FROM s, tot
    """,
)
def m_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis H across the five event types' value
    distributions (operators/stats.kruskal_wallis) — the K-group
    rank test completing the mann_whitney (2-group) family. Values
    pre-bucket to integers (the roc_points dense-score discipline);
    the corpus collapses to (value, type) count cells FIRST and
    mid-ranks ladder over the distinct-value cells only — no raw-row
    rank window anywhere (the round-9 collapse-first convention).
    The oracle replays cells, mid-ranks, rank sums and the
    tie-corrected statistic term-for-term."""
    from pandasvcf_spark.operators.stats import kruskal_wallis

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        F.round(F.col("value"), 0).alias("v"),
        F.col("event_type").alias("k"),
    )
    return kruskal_wallis(d, [], "k", "v")


@register(
    "m_wilcoxon",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'view'
                 THEN CAST(round(value * 100, 0) AS BIGINT) END) AS x,
             sum(CASE WHEN event_type = 'click'
                 THEN CAST(round(value * 100, 0) AS BIGINT) END) AS y
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
        AND event_type IS NOT NULL
      GROUP BY user_id),
    d AS (SELECT CAST(x AS DOUBLE) - CAST(y AS DOUBLE) AS d
          FROM pu WHERE x IS NOT NULL AND y IS NOT NULL),
    nz AS (SELECT abs(d) AS a,
                  CASE WHEN d > 0 THEN 1.0 ELSE 0.0 END AS p
           FROM d WHERE d <> 0),
    ac AS (SELECT a, CAST(count(*) AS DOUBLE) AS t, sum(p) AS tp
           FROM nz GROUP BY a),
    m AS (SELECT t, tp,
            coalesce(sum(t) OVER (ORDER BY a
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + (t + 1) / 2 AS mr
          FROM ac),
    g AS (SELECT sum(t) AS n, sum(tp * mr) AS wp,
                 sum(t*t*t - t) AS tsum FROM m)
    SELECT CAST(n AS BIGINT) AS n,
           round(CASE WHEN n > 0 THEN wp END, 4) + 0.0 AS w_plus,
           round(CASE WHEN n > 0
                       AND (n*(n+1)*(2.0*n+1)/24.0 - tsum/48.0) > 0
                 THEN (wp - n*(n+1)/4.0)
                      / sqrt(n*(n+1)*(2.0*n+1)/24.0 - tsum/48.0)
                 END, 6) + 0.0 AS z
    FROM g
    """,
)
def m_wilcoxon(spark, sf_dir):
    """Wilcoxon signed-rank test (operators/stats.
    wilcoxon_signed_rank) on paired per-user view-vs-click spend —
    the PAIRED shift test mann_whitney can't do. Pairs are INTEGER
    CENTS sums (exact — the e_rfm lesson: rounded float aggregates
    are not safe pins for a rank's tie structure); |d| collapses to
    count cells and mid-ranks ladder over distinct cells only. The
    oracle replays pairs, cells, the W+ sum and the tie-corrected
    normal approximation."""
    from pandasvcf_spark.operators.stats import wilcoxon_signed_rank

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    per = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", cents)).alias("x"),
        F.sum(F.when(F.col("event_type") == "click", cents)).alias("y"),
    )
    return wilcoxon_signed_rank(per, "x", "y")


@register(
    "m_friedman",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 5 AS INTEGER) AS blk, event_type AS k,
             CAST(count(*) AS BIGINT) AS v
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2),
    r AS (SELECT blk, k, v,
            rank() OVER (PARTITION BY blk ORDER BY v)
            + (CAST(count(*) OVER (PARTITION BY blk, v) AS DOUBLE)
               - 1) / 2.0 AS rr
          FROM b),
    rj AS (SELECT k, sum(rr) AS R FROM r GROUP BY k),
    t AS (SELECT sum(t*t*t - t) AS tsum FROM
            (SELECT CAST(count(*) AS DOUBLE) AS t
             FROM b GROUP BY blk, v)),
    nk AS (SELECT CAST(count(DISTINCT blk) AS BIGINT) AS n,
                  CAST(count(DISTINCT k) AS BIGINT) AS kk FROM b),
    s AS (SELECT sum(R*R) AS s2 FROM rj)
    SELECT n AS n_blocks, kk AS k,
           round(CASE WHEN (1 - tsum/(n*kk*(kk*kk - 1.0))) > 0
                 THEN (12.0/(n*kk*(kk+1.0))*s2 - 3.0*n*(kk+1.0))
                      / (1 - tsum/(n*kk*(kk*kk - 1.0))) END, 6)
           + 0.0 AS q
    FROM nk, t, s
    """,
)
def m_friedman(spark, sf_dir):
    """Friedman test (operators/stats.friedman_test) of whether the
    five event types rank consistently across five user cohorts —
    blocks = user_id%5, treatments = event_type, value = the block's
    INTEGER activity count (exact rank pins). Ranks are within-block
    windows (K = 5 rows per partition — bounded by the treatment
    count, scale-safe by construction); block completeness is
    validated with a 1-row check. The oracle replays ranks, rank
    sums and the tie-corrected Q."""
    from pandasvcf_spark.operators.stats import friedman_test

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.groupBy(
        (F.col("user_id") % 5).cast("int").alias("blk"),
        F.col("event_type").alias("k"),
    ).agg(F.count(F.lit(1)).cast("long").alias("v"))
    return friedman_test(d, "blk", "k", "v")


@register(
    "m_kendall_tau",
    oracle="""
    WITH b AS (
      SELECT round(value, 0) AS x, CAST(hour(ts) AS DOUBLE) AS y
      FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL),
    c AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n
          FROM b GROUP BY x, y),
    p AS (SELECT
            CAST(coalesce(sum(CASE WHEN bb.y > aa.y THEN aa.n * bb.n
                     ELSE 0 END), 0) AS BIGINT) AS concordant,
            CAST(coalesce(sum(CASE WHEN bb.y < aa.y THEN aa.n * bb.n
                     ELSE 0 END), 0) AS BIGINT) AS discordant
          FROM c aa JOIN c bb ON bb.x > aa.x),
    tx AS (SELECT sum(t * (t - 1)) AS n1x2,
                  CAST(sum(t) AS BIGINT) AS n
           FROM (SELECT sum(n) AS t FROM c GROUP BY x)),
    ty AS (SELECT sum(t * (t - 1)) AS n2x2
           FROM (SELECT sum(n) AS t FROM c GROUP BY y))
    SELECT n, concordant, discordant,
           round(CASE WHEN ((CAST(n AS DOUBLE) * (n - 1) - n1x2)
                            * (CAST(n AS DOUBLE) * (n - 1) - n2x2))
                           > 0
                 THEN (CAST(concordant AS DOUBLE)
                       - CAST(discordant AS DOUBLE)) * 2.0
                      / sqrt((CAST(n AS DOUBLE) * (n - 1) - n1x2)
                             * (CAST(n AS DOUBLE) * (n - 1) - n2x2))
                 END, 6) + 0.0 AS tau_b
    FROM p, tx, ty
    """,
)
def m_kendall_tau(spark, sf_dir):
    """Kendall's tau-b (operators/stats.kendall_tau_b) between
    integer-rounded event value and hour-of-day — the concordance
    companion of m_spearman. The corpus collapses to (x, y) count
    cells; concordant/discordant pairs come from a broadcast
    CELL-grid comparison (|cells|^2, never rows^2 — values
    pre-bucket to integers, the documented discipline), tie terms
    from the marginals. Integer pair counts make tau exact rational
    arithmetic; the oracle replays the grid term-for-term."""
    from pandasvcf_spark.operators.stats import kendall_tau_b

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    d = e.select(
        F.round(F.col("value"), 0).alias("x"),
        F.hour("ts").cast("double").alias("y"),
    )
    return kendall_tau_b(d, "x", "y")


@register(
    "m_cmh",
    oracle="""
    WITH b AS (
      SELECT CAST((epoch_us(ts) // 1000000) // 86400 % 7 AS INTEGER)
               AS s,
             CAST(user_id % 2 AS INTEGER) AS e,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS o
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL),
    cells AS (
      SELECT s,
        CAST(sum(CASE WHEN e=1 AND o=1 THEN 1 ELSE 0 END) AS DOUBLE)
          AS a,
        CAST(sum(CASE WHEN e=1 AND o=0 THEN 1 ELSE 0 END) AS DOUBLE)
          AS bb,
        CAST(sum(CASE WHEN e=0 AND o=1 THEN 1 ELSE 0 END) AS DOUBLE)
          AS c,
        CAST(sum(CASE WHEN e=0 AND o=0 THEN 1 ELSE 0 END) AS DOUBLE)
          AS d
      FROM b GROUP BY s),
    f AS (SELECT a, bb, c, d, a + bb + c + d AS n FROM cells),
    g AS (SELECT
        CAST(count(*) AS BIGINT) AS n_strata,
        CAST(sum(n) AS BIGINT) AS n,
        sum(CASE WHEN n > 1 THEN a * d / n END) AS ad,
        sum(CASE WHEN n > 1 THEN bb * c / n END) AS bc,
        sum(CASE WHEN n > 1 THEN a END) AS sa,
        sum(CASE WHEN n > 1 THEN (a + bb) * (a + c) / n END) AS se,
        sum(CASE WHEN n > 1 THEN (a + bb) * (c + d) * (a + c)
                  * (bb + d) / (n * n * (n - 1.0)) END) AS sv
      FROM f)
    SELECT n_strata, n,
           round(CASE WHEN bc > 0 THEN ad / bc END, 6) + 0.0 AS or_mh,
           round(CASE WHEN sv > 0
                 THEN (sa - se) * (sa - se) / sv END, 6) + 0.0 AS chi2
    FROM g
    """,
)
def m_cmh(spark, sf_dir):
    """Cochran-Mantel-Haenszel common odds ratio + chi2 (operators/
    stats.cmh_test) of user-parity exposure vs the 'error' outcome,
    stratified by day-of-week — the confounder-adjusted companion of
    m_odds_ratio (a pooled 2x2 invites Simpson's paradox; CMH
    doesn't). Strata are epoch-day %% 7 (engine-portable — native
    dayofweek numbering differs between engines). One stratum-keyed
    4-counter agg + a 1-row fold; ~1 expected on parity-blind data.
    The oracle replays the per-stratum terms and both folds."""
    from pandasvcf_spark.operators.stats import cmh_test

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    d = e.select(
        (
            F.floor(F.unix_timestamp("ts").cast("long") / 86400) % 7
        ).cast("int").alias("s"),
        (F.col("user_id") % 2).cast("int").alias("e"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("o"),
    )
    return cmh_test(d, "s", "e", "o")


@register(
    "e_durbin_watson",
    oracle="""
    WITH d AS (
      SELECT event_type AS et,
             (epoch_us(ts) // 1000000) // 86400 AS day,
             CAST(count(*) AS BIGINT) AS v
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2),
    l AS (SELECT et, CAST(v AS DOUBLE) AS x,
                 CAST(v AS DOUBLE) - lag(CAST(v AS DOUBLE), 1)
                   OVER (PARTITION BY et ORDER BY day) AS dd
          FROM d),
    g AS (SELECT et, CAST(count(*) AS BIGINT) AS n, sum(x) AS s,
                 sum(x * x) AS q, sum(dd * dd) AS num
          FROM l GROUP BY et)
    SELECT et, n,
           round(CASE WHEN n >= 2 AND (q - s * s / n) > 0
                 THEN num / (q - s * s / n) END, 6) + 0.0 AS dw
    FROM g ORDER BY et
    """,
)
def e_durbin_watson(spark, sf_dir):
    """Durbin-Watson lag-1 autocorrelation (operators/stats.
    durbin_watson) of each event type's daily count series — the
    residual-independence diagnostic beside e_rate_anomaly's z-scores
    (a trending series fools a mean-based alarm; DW says whether
    successive days are independent). Integer daily counts keep every
    aggregate exact; one group-partitioned lag window + one agg on
    the same exchange. The oracle replays differences, moments and
    the ratio."""
    from pandasvcf_spark.operators.stats import durbin_watson

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.groupBy(
        F.col("event_type").alias("et"),
        F.floor(F.unix_timestamp("ts").cast("long") / 86400).alias(
            "day"
        ),
    ).agg(F.count(F.lit(1)).cast("long").alias("v"))
    return durbin_watson(d, ["et"], "day", "v").orderBy("et")


@register(
    "m_ljung_box",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(count(*) AS DOUBLE) AS x
      FROM events WHERE ts IS NOT NULL GROUP BY 1),
    mu AS (SELECT avg(x) AS m, CAST(count(*) AS BIGINT) AS n
           FROM hourly),
    d AS (
      SELECT n, x - mu.m AS d0,
             lead(x, 1) OVER w - mu.m AS d1,
             lead(x, 2) OVER w - mu.m AS d2,
             lead(x, 3) OVER w - mu.m AS d3,
             lead(x, 4) OVER w - mu.m AS d4,
             lead(x, 5) OVER w - mu.m AS d5,
             lead(x, 6) OVER w - mu.m AS d6
      FROM hourly, mu WINDOW w AS (ORDER BY h)),
    agg AS (SELECT max(n) AS n, sum(d0*d0) AS den,
                   sum(d0*d1) AS n1, sum(d0*d2) AS n2,
                   sum(d0*d3) AS n3, sum(d0*d4) AS n4,
                   sum(d0*d5) AS n5, sum(d0*d6) AS n6
            FROM d)
    SELECT CAST(n AS BIGINT) AS n, 6 AS m,
           round(CASE WHEN den > 0 AND n > 6 THEN
             CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * (
               (n1/den) * (n1/den) / (CAST(n AS DOUBLE) - 1.0)
               + (n2/den) * (n2/den) / (CAST(n AS DOUBLE) - 2.0)
               + (n3/den) * (n3/den) / (CAST(n AS DOUBLE) - 3.0)
               + (n4/den) * (n4/den) / (CAST(n AS DOUBLE) - 4.0)
               + (n5/den) * (n5/den) / (CAST(n AS DOUBLE) - 5.0)
               + (n6/den) * (n6/den) / (CAST(n AS DOUBLE) - 6.0))
             END, 6) + 0.0 AS q
    FROM agg
    """,
)
def m_ljung_box(spark, sf_dir):
    """Ljung-Box portmanteau Q over the first 6 autocorrelations of
    the hourly event-count series (operators/stats.ljung_box) — the
    "is it white noise?" closer for the m_acf / m_pacf family, one
    scalar instead of six separate r_k reads. Same series machinery
    (lead() columns over the pre-aggregated hourly points + ONE 1-row
    fold); the oracle replays every r_k term and the weighted sum
    operand-for-operand."""
    from pandasvcf_spark.operators.stats import ljung_box

    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    return ljung_box(hourly, "h", "x", max_lag=6)


@register(
    "m_jonckheere",
    oracle="""
    WITH b AS (
      SELECT CAST(hour(ts) // 6 AS DOUBLE) AS g, round(value, 0) AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS n
          FROM b GROUP BY g, v),
    p AS (SELECT sum(CASE WHEN a.v < b2.v
                          THEN CAST(a.n * b2.n AS DOUBLE)
                          WHEN a.v = b2.v
                          THEN CAST(a.n * b2.n AS DOUBLE) / 2.0
                          ELSE 0.0 END) AS J
          FROM c a JOIN c b2 ON b2.g > a.g),
    pg AS (SELECT g, sum(n) AS nk FROM c GROUP BY g),
    t AS (SELECT CAST(sum(nk) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS k,
                 sum(nk * nk) AS sq,
                 sum(nk * nk * (2 * nk + 3)) AS sq3 FROM pg)
    SELECT n, k, round(J, 4) + 0.0 AS j_stat,
           round(CASE WHEN ((CAST(n AS DOUBLE) * n * (2.0 * n + 3.0)
                             - sq3) / 72.0) > 0
                 THEN (J - (CAST(n AS DOUBLE) * n - sq) / 4.0)
                      / sqrt((CAST(n AS DOUBLE) * n * (2.0 * n + 3.0)
                              - sq3) / 72.0) END, 6) + 0.0 AS z
    FROM p, t
    """,
)
def m_jonckheere(spark, sf_dir):
    """Jonckheere-Terpstra ordered trend (operators/stats.
    jonckheere_terpstra): does event value shift monotonically across
    the four day quarters? The ordered-alternative power upgrade over
    m_kruskal_wallis (which ignores group order). Values pre-bucket
    to integers; J comes from the broadcast cell-grid over ordered
    group pairs (the kendall_tau_b device — |cells|^2, never rows^2).
    The oracle replays the grid, tie halves and the z fold."""
    from pandasvcf_spark.operators.stats import jonckheere_terpstra

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    d = e.select(
        F.floor(F.hour("ts") / 6).cast("double").alias("g"),
        F.round(F.col("value"), 0).alias("v"),
    )
    return jonckheere_terpstra(d, "g", "v")


@register(
    "m_cliffs_delta",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS f, round(value, 0) AS v
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
    c AS (SELECT f, v, CAST(count(*) AS BIGINT) AS n
          FROM b GROUP BY f, v),
    g AS (SELECT
        CAST(sum(CASE WHEN c1.v > c0.v THEN c1.n * c0.n ELSE 0 END)
             AS BIGINT) AS gt,
        CAST(sum(CASE WHEN c1.v < c0.v THEN c1.n * c0.n ELSE 0 END)
             AS BIGINT) AS lt
      FROM (SELECT v, n FROM c WHERE f = 1) c1,
           (SELECT v, n FROM c WHERE f = 0) c0),
    t AS (SELECT CAST(sum(CASE WHEN f = 0 THEN n END) AS BIGINT)
                   AS n0,
                 CAST(sum(CASE WHEN f = 1 THEN n END) AS BIGINT)
                   AS n1 FROM c)
    SELECT n0, n1,
           round(CASE WHEN n0 > 0 AND n1 > 0
                 THEN (CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))
                      / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE))
                 END, 6) + 0.0 AS delta
    FROM g, t
    """,
)
def m_cliffs_delta(spark, sf_dir):
    """Cliff's delta effect size (operators/stats.cliffs_delta) of
    user parity on event value — the magnitude companion the
    mann_whitney z cannot give (z grows with n; delta is the
    dominance probability difference, in [-1, 1]). Same cell-grid
    device as m_kendall_tau; ~0 expected on parity-blind data.
    Integer dominance counts make delta exact rational arithmetic;
    the oracle replays the grid and the ratio."""
    from pandasvcf_spark.operators.stats import cliffs_delta

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    d = e.select(
        (F.col("user_id") % 2).cast("int").alias("f"),
        F.round(F.col("value"), 0).alias("v"),
    )
    return cliffs_delta(d, "f", "v")


@register(
    "m_bartlett",
    oracle="""
    WITH b AS (
      SELECT event_type AS g,
             CAST(CAST(round(value * 100, 0) AS BIGINT) AS DOUBLE)
               AS v
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL),
    per AS (SELECT g, CAST(count(*) AS DOUBLE) AS nk, sum(v) AS s,
                   sum(v * v) AS q FROM b GROUP BY g),
    u AS (SELECT nk, (q - s * s / nk) / (nk - 1.0) AS vk FROM per),
    f AS (SELECT
        sum(CASE WHEN nk >= 2 AND vk > 0 THEN nk END) AS N,
        CAST(count(CASE WHEN nk >= 2 AND vk > 0 THEN 1 END)
             AS BIGINT) AS k,
        sum(CASE WHEN nk >= 2 AND vk > 0
            THEN (nk - 1.0) * vk END) AS sw,
        sum(CASE WHEN nk >= 2 AND vk > 0
            THEN (nk - 1.0) * ln(vk) END) AS slog,
        sum(CASE WHEN nk >= 2 AND vk > 0
            THEN 1.0 / (nk - 1.0) END) AS sinv
      FROM u)
    SELECT CAST(coalesce(N, 0.0) AS BIGINT) AS n, k,
           round(CASE WHEN k >= 2 AND (N - k) > 0
                       AND (sw / (N - k)) > 0
                 THEN ((N - k) * ln(sw / (N - k)) - slog)
                      / (1.0 + (sinv - 1.0 / (N - k))
                         / (3.0 * (k - 1.0))) END, 6) + 0.0 AS stat
    FROM f
    """,
)
def m_bartlett(spark, sf_dir):
    """Bartlett's variance-homogeneity test (operators/stats.
    bartlett_test) across the five event types' spend (integer cents
    — exact moments; the mean enters once as a final ratio) — the
    parametric sharp-tooth beside m_brown_forsythe's robust version,
    and the assumption check classic ANOVA (m_anova) leans on. One
    group-keyed 3-moment agg + a 1-row fold; engine ln parity holds
    at 6dp (the m_js_divergence precedent). The oracle replays
    moments, logs and the correction term."""
    from pandasvcf_spark.operators.stats import bartlett_test

    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    d = e.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100, 0).cast("long").cast("double")
        .alias("v"),
    )
    return bartlett_test(d, "g", "v")


@register(
    "m_cochrans_q",
    oracle="""
    WITH base AS (
      SELECT CAST(user_id % 12 AS INTEGER) AS blk,
             CAST(hour(ts) // 6 AS INTEGER) AS qd,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS e
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL),
    cells AS (SELECT blk, qd, max(e) AS o FROM base GROUP BY blk, qd),
    pb AS (SELECT blk, CAST(sum(o) AS BIGINT) AS R
           FROM cells GROUP BY blk),
    t AS (SELECT CAST(sum(R) AS BIGINT) AS T, sum(R * R) AS R2,
                 CAST(count(*) AS BIGINT) AS nb FROM pb),
    ct AS (SELECT qd, CAST(sum(o) AS BIGINT) AS C
           FROM cells GROUP BY qd),
    c2 AS (SELECT sum(C * C) AS C2 FROM ct)
    SELECT nb AS n_blocks, CAST(4 AS BIGINT) AS k,
           round(CASE WHEN (4.0 * CAST(T AS DOUBLE)
                            - CAST(R2 AS DOUBLE)) > 0
                 THEN 12.0 * (CAST(C2 AS DOUBLE)
                              - CAST(T AS DOUBLE) * T / 4.0)
                      / (4.0 * CAST(T AS DOUBLE) - R2)
                 END, 6) + 0.0 AS q
    FROM t, c2
    """,
)
def m_cochrans_q(spark, sf_dir):
    """Cochran's Q (operators/stats.cochrans_q): do the four day
    quarters differ in whether a user cohort hits an 'error'? Blocks
    = user_id%%12, treatments = day quarter, outcome = any-error
    indicator per (block, quarter) cell — the binary-outcome sibling
    of m_friedman and the K-treatment McNemar. Counts only (exact
    integers into one final ratio); block completeness validated with
    a 1-row check. The oracle replays cells, totals and the expanded
    Q identity."""
    from pandasvcf_spark.operators.stats import cochrans_q

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    cells = e.groupBy(
        (F.col("user_id") % 12).cast("int").alias("blk"),
        F.floor(F.hour("ts") / 6).cast("int").alias("qd"),
    ).agg(
        F.max(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("o")
    )
    return cochrans_q(cells, "blk", "qd", "o")


@register(
    "e_ohlc",
    oracle="""
    WITH b AS (
      SELECT event_type AS et,
             epoch_us(ts) // 1000000 AS t,
             CAST(CAST(round(value * 100, 0) AS BIGINT) AS DOUBLE)
               AS v
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
        AND value IS NOT NULL),
    k AS (SELECT et, (t // 3600) * 3600 AS bucket_start, t, v FROM b),
    r AS (SELECT et, bucket_start, v,
            row_number() OVER (PARTITION BY et, bucket_start
                               ORDER BY t, v) AS ra,
            row_number() OVER (PARTITION BY et, bucket_start
                               ORDER BY t DESC, v DESC) AS rd
          FROM k)
    SELECT et, bucket_start, CAST(count(*) AS BIGINT) AS n,
           max(CASE WHEN ra = 1 THEN v END) AS open,
           max(v) AS high, min(v) AS low,
           max(CASE WHEN rd = 1 THEN v END) AS close,
           round(sum(v), 4) AS volume
    FROM r GROUP BY et, bucket_start ORDER BY et, bucket_start
    """,
)
def e_ohlc(spark, sf_dir):
    """Hourly OHLC candles per event type (operators/relational.
    ohlc_candles) on integer-cents values — the market/metrics rollup
    classic. Open/close come from min/max over (ts, value) STRUCTS in
    ONE partial-aggregated groupBy (struct extremes carry the value
    along — no window, no second pass); timestamp collisions break by
    value, the repo's total-order rule, replayed in the oracle as
    tie-broken row_number picks."""
    from pandasvcf_spark.operators.relational import ohlc_candles

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    )
    d = e.select(
        F.col("event_type").alias("et"),
        F.unix_timestamp("ts").cast("long").alias("t"),
        F.round(F.col("value") * 100, 0).cast("long").cast("double")
        .alias("v"),
    )
    return ohlc_candles(d, ["et"], "t", "v", bucket_seconds=3600)


@register(
    "e_twap",
    oracle="""
    WITH b AS (
      SELECT event_type AS et,
             epoch_us(ts) // 1000000 AS t,
             CAST(CAST(round(value * 100, 0) AS BIGINT) AS DOUBLE)
               AS v
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
        AND value IS NOT NULL),
    l AS (SELECT et, t, v,
            lead(t, 1) OVER (PARTITION BY et ORDER BY t, v) - t
              AS dt
          FROM b),
    g AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
                 CAST(max(t) - min(t) AS BIGINT) AS span_sec,
                 sum(v * CAST(dt AS DOUBLE)) AS wsum
          FROM l GROUP BY et)
    SELECT et, n, span_sec,
           round(CASE WHEN n >= 2 AND span_sec > 0
                 THEN wsum / CAST(span_sec AS DOUBLE) END, 6) + 0.0
             AS twap
    FROM g ORDER BY et
    """,
)
def e_twap(spark, sf_dir):
    """Time-weighted average spend per event type (operators/
    relational.twap) — the irregular-sampling mean a plain AVG gets
    wrong: each observation weighs its holding interval to the next
    (last-tick convention), timestamp ties ordered by value (zero-
    length intervals make the collision order irrelevant once fixed).
    One group-partitioned lead window + one agg on the same exchange.
    The oracle replays intervals and the weighted fold."""
    from pandasvcf_spark.operators.relational import twap

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    )
    d = e.select(
        F.col("event_type").alias("et"),
        F.unix_timestamp("ts").cast("long").alias("t"),
        F.round(F.col("value") * 100, 0).cast("long").cast("double")
        .alias("v"),
    )
    return twap(d, ["et"], "t", "v").orderBy("et")


@register(
    "m_mood_median",
    oracle="""
    WITH b AS (
      SELECT event_type AS g, round(value, 0) AS v
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL),
    med AS (SELECT quantile_disc(v, 0.5) AS m FROM b),
    cells AS (SELECT g,
                CAST(sum(CASE WHEN v > med.m THEN 1 ELSE 0 END)
                     AS BIGINT) AS a,
                CAST(sum(CASE WHEN v <= med.m THEN 1 ELSE 0 END)
                     AS BIGINT) AS bb
              FROM b, med GROUP BY g),
    t AS (SELECT sum(a) AS ta, sum(bb) AS tb FROM cells),
    f AS (SELECT
        CAST(cells.a + cells.bb AS DOUBLE)
          * CAST(ta AS DOUBLE) / CAST(ta + tb AS DOUBLE) AS ea,
        CAST(cells.a + cells.bb AS DOUBLE)
          * CAST(tb AS DOUBLE) / CAST(ta + tb AS DOUBLE) AS eb,
        CAST(a AS DOUBLE) AS a, CAST(bb AS DOUBLE) AS bb
      FROM cells, t),
    s AS (SELECT
        CAST(sum(a + bb) AS BIGINT) AS n,
        CAST(count(*) AS BIGINT) AS k,
        CAST(count(CASE WHEN ea <= 0 OR eb <= 0 THEN 1 END)
             AS BIGINT) AS bad,
        sum(CASE WHEN ea > 0 AND eb > 0
            THEN (a - ea) * (a - ea) / ea
                 + (bb - eb) * (bb - eb) / eb END) AS chi2
      FROM f)
    SELECT n, k, (SELECT m FROM med) AS median,
           round(CASE WHEN bad = 0 AND k >= 2 THEN chi2 END, 6)
           + 0.0 AS chi2
    FROM s
    """,
)
def m_mood_median(spark, sf_dir):
    """Mood's median test (operators/stats.mood_median_test) across
    the five event types — the outlier-proof K-sample location test
    (only counts above/at-or-below the POOLED median, so wild tails
    can't bend it the way they bend ranks). The pooled median is the
    repo's exact type-1 quantile via the exact_quantiles bucket walk
    (= DuckDB's quantile_disc, the verified convention); then one
    group-keyed 2-counter agg + a 1-row chi2 fold. Values pre-bucket
    to integers."""
    from pandasvcf_spark.operators.stats import mood_median_test

    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    d = e.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value"), 0).alias("v"),
    )
    return mood_median_test(d, "g", "v")


@register(
    "m_page_trend",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 5 AS INTEGER) AS blk,
             CAST(hour(ts) // 6 AS DOUBLE) AS qd,
             CAST(count(*) AS BIGINT) AS v
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2),
    r AS (SELECT blk, qd, v,
            rank() OVER (PARTITION BY blk ORDER BY v)
            + (CAST(count(*) OVER (PARTITION BY blk, v) AS DOUBLE)
               - 1) / 2.0 AS rr
          FROM b),
    rj AS (SELECT qd, sum(rr) AS R FROM r GROUP BY qd),
    o AS (SELECT R,
            CAST(dense_rank() OVER (ORDER BY qd) AS DOUBLE) AS j
          FROM rj),
    s AS (SELECT sum(j * R) AS L FROM o),
    nk AS (SELECT CAST(count(DISTINCT blk) AS BIGINT) AS n,
                  CAST(count(DISTINCT qd) AS BIGINT) AS kk FROM b)
    SELECT n AS n_blocks, kk AS k,
           round(L, 4) + 0.0 AS l_stat,
           round((L - n * kk * (kk + 1.0) * (kk + 1.0) / 4.0)
                 / sqrt(n * kk * kk * (kk + 1.0)
                        * (kk * kk - 1.0) / 144.0), 6) + 0.0 AS z
    FROM s, nk
    """,
)
def m_page_trend(spark, sf_dir):
    """Page's L trend test (operators/stats.page_trend_test): do the
    five user cohorts' activity counts rise MONOTONICALLY through the
    four day quarters? The ordered-treatment upgrade of m_friedman
    (as m_jonckheere is to m_kruskal_wallis) — within-block mid-ranks
    weighted by treatment order. Blocks = user_id%%5, treatments =
    ordered day quarter, values = integer counts (exact rank pins).
    The oracle replays ranks, the order weighting and the classic
    moments."""
    from pandasvcf_spark.operators.stats import page_trend_test

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    d = e.groupBy(
        (F.col("user_id") % 5).cast("int").alias("blk"),
        F.floor(F.hour("ts") / 6).cast("double").alias("qd"),
    ).agg(F.count(F.lit(1)).cast("long").alias("v"))
    return page_trend_test(d, "blk", "qd", "v")


@register(
    "m_rmst",
    oracle="""
    WITH s AS (
      SELECT CAST(value AS DOUBLE) AS t,
             CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END AS ev
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    per_t AS (
      SELECT t,
             CAST(sum(CASE WHEN ev <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS d,
             CAST(sum(CASE WHEN ev = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c
      FROM s GROUP BY t),
    tot AS (SELECT sum(d + c) AS N FROM per_t),
    risk AS (
      SELECT t, d, c,
             N - coalesce(sum(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM per_t, tot),
    curve AS (
      SELECT t, d, n_risk,
             max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER w AS hz,
             sum(CASE WHEN d < n_risk
                 THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk
                                                        AS DOUBLE))
                 END) OVER w AS lsum
      FROM risk
      WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)),
    ladder AS (
      SELECT t, CASE WHEN hz = 1 THEN 0.0 ELSE exp(lsum) END AS sv, d
      FROM curve WHERE d > 0 AND t <= CAST(100.0 AS DOUBLE)),
    rows0 AS (
      SELECT CAST(0.0 AS DOUBLE) AS t, CAST(1.0 AS DOUBLE) AS sv,
             CAST(NULL AS BIGINT) AS d
      UNION ALL SELECT t, sv, d FROM ladder),
    seg AS (SELECT d,
              (coalesce(lead(t) OVER (ORDER BY t, sv DESC),
                        CAST(100.0 AS DOUBLE)) - t) * sv AS area
            FROM rows0),
    nn AS (SELECT CAST(N AS BIGINT) AS n FROM tot)
    SELECT CAST(100.0 AS DOUBLE) AS tau, nn.n,
           CAST(coalesce(sum(d), 0) AS BIGINT) AS n_events,
           round(sum(area), 6) + 0.0 AS rmst
    FROM seg, nn GROUP BY nn.n
    """,
)
def m_rmst(spark, sf_dir):
    """Restricted mean survival time at tau = 100 (operators/
    relational.rmst) on the m_kaplan_meier durations — the area under
    the KM step curve, i.e. the expected retained lifetime within the
    first 100 periods: the honest scalar when hazards cross and a
    single ratio misleads. Same per-time ladder as m_kaplan_meier,
    then one lead() segment fold with the [0, t_first) segment at
    S = 1 and tau clipping. The oracle extends the KM replay with the
    identical segment integration."""
    from pandasvcf_spark.operators.relational import rmst

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        F.col("value").alias("t"),
        F.when(F.col("event_type") != "error", 1).otherwise(0).alias("ev"),
    )
    return rmst(d, "t", "ev", tau=100.0)


@register(
    "m_armitage_trend",
    oracle="""
    WITH b AS (
      SELECT CAST(hour(ts) // 6 + 1 AS DOUBLE) AS s,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS c
      FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL),
    cells AS (SELECT s, CAST(sum(c) AS BIGINT) AS a,
                     CAST(count(*) AS BIGINT) AS n
              FROM b GROUP BY s),
    g AS (SELECT CAST(sum(n) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(a) AS BIGINT) AS A,
                 sum(s * a) AS sa, sum(s * n) AS sn,
                 sum(s * s * n) AS ssn FROM cells)
    SELECT n, k,
           round(CASE WHEN k >= 2
                       AND (CAST(A AS DOUBLE) / n)
                           * (1.0 - CAST(A AS DOUBLE) / n)
                           * (ssn - sn * sn / CAST(n AS DOUBLE)) > 0
                 THEN (sa - CAST(A AS DOUBLE) * sn
                            / CAST(n AS DOUBLE))
                      * (sa - CAST(A AS DOUBLE) * sn
                              / CAST(n AS DOUBLE))
                      / ((CAST(A AS DOUBLE) / n)
                         * (1.0 - CAST(A AS DOUBLE) / n)
                         * (ssn - sn * sn / CAST(n AS DOUBLE)))
                 END, 6) + 0.0 AS chi2,
           round(CASE WHEN k >= 2
                       AND (CAST(A AS DOUBLE) / n)
                           * (1.0 - CAST(A AS DOUBLE) / n)
                           * (ssn - sn * sn / CAST(n AS DOUBLE)) > 0
                 THEN (sa - CAST(A AS DOUBLE) * sn
                            / CAST(n AS DOUBLE))
                      / (ssn - sn * sn / CAST(n AS DOUBLE))
                 END, 6) + 0.0 AS slope
    FROM g
    """,
)
def m_armitage_trend(spark, sf_dir):
    """Cochran-Armitage trend test (operators/stats.cochran_armitage;
    R's prop.trend.test, pinned to its documented 8.2249 golden in
    tests): does the 'error' rate trend linearly across the four day
    quarters? The 2xK dose-response classic — and at genotype dosage
    scores 0/1/2 the GWAS allelic trend test. One score-keyed
    2-counter agg + a 1-row fold of exact integer sums; the oracle
    replays the fold operand-for-operand."""
    from pandasvcf_spark.operators.stats import cochran_armitage

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        (F.floor(F.hour("ts") / 6) + 1).cast("double").alias("s"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("c"),
    )
    return cochran_armitage(d, "s", "c")


@register(
    "m_welch_t",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS f,
             CAST(CAST(round(value * 100, 0) AS BIGINT) AS DOUBLE)
               AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    g AS (SELECT
        CAST(count(CASE WHEN f = 0 THEN 1 END) AS BIGINT) AS n0,
        CAST(count(CASE WHEN f = 1 THEN 1 END) AS BIGINT) AS n1,
        sum(CASE WHEN f = 0 THEN v END) AS s0,
        sum(CASE WHEN f = 1 THEN v END) AS s1,
        sum(CASE WHEN f = 0 THEN v * v END) AS q0,
        sum(CASE WHEN f = 1 THEN v * v END) AS q1
      FROM b),
    m AS (SELECT n0, n1,
            s0 / n0 AS m0, s1 / n1 AS m1,
            (q0 - s0 * s0 / n0) / (n0 - 1.0) AS v0,
            (q1 - s1 * s1 / n1) / (n1 - 1.0) AS v1
          FROM g),
    f2 AS (SELECT n0, n1, m0, m1, v0, v1,
             v1 / n1 + v0 / n0 AS se2 FROM m)
    SELECT n0, n1,
           round(CASE WHEN n0 >= 2 AND n1 >= 2 AND se2 > 0
                 THEN m1 - m0 END, 6) + 0.0 AS mean_diff,
           round(CASE WHEN n0 >= 2 AND n1 >= 2 AND se2 > 0
                 THEN (m1 - m0) / sqrt(se2) END, 6) + 0.0 AS t,
           round(CASE WHEN n0 >= 2 AND n1 >= 2 AND se2 > 0
                 THEN (se2 * se2)
                      / ((v1 / n1) * (v1 / n1) / (n1 - 1.0)
                         + (v0 / n0) * (v0 / n0) / (n0 - 1.0))
                 END, 4) + 0.0 AS df
    FROM f2
    """,
)
def m_welch_t(spark, sf_dir):
    """Welch's unequal-variance t test (operators/stats.welch_t_test)
    of user parity on spend (integer cents — exact moments): the
    parametric partner of m_mannwhitney, with the Welch-Satterthwaite
    df that keeps the test honest when variances differ. One 6-sum
    conditional agg, moment ratios only; ~0 t expected on
    parity-blind data. The oracle replays moments, the pooled SE and
    the df fold."""
    from pandasvcf_spark.operators.stats import welch_t_test

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    d = e.select(
        (F.col("user_id") % 2).cast("int").alias("f"),
        F.round(F.col("value") * 100, 0).cast("long").cast("double")
        .alias("v"),
    )
    return welch_t_test(d, "f", "v")


@register(
    "m_paired_t",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'view'
                 THEN CAST(round(value * 100, 0) AS BIGINT) END) AS x,
             sum(CASE WHEN event_type = 'click'
                 THEN CAST(round(value * 100, 0) AS BIGINT) END) AS y
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
        AND event_type IS NOT NULL
      GROUP BY user_id),
    d AS (SELECT CAST(x AS DOUBLE) - CAST(y AS DOUBLE) AS d
          FROM pu WHERE x IS NOT NULL AND y IS NOT NULL),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(d) AS s,
                 sum(d * d) AS q FROM d)
    SELECT n,
           round(CASE WHEN n >= 1 THEN s / n END, 6) + 0.0
             AS mean_diff,
           round(CASE WHEN n >= 2
                       AND ((q - s * s / n) / (n - 1.0)) > 0
                 THEN (s / n)
                      / sqrt(((q - s * s / n) / (n - 1.0))
                             / CAST(n AS DOUBLE)) END, 6) + 0.0 AS t
    FROM g
    """,
)
def m_paired_t(spark, sf_dir):
    """Paired t test (operators/stats.paired_t_test) on the
    m_wilcoxon pairs — per-user view-vs-click integer-cents spend:
    the parametric partner of the signed-rank test, one 3-sum agg
    over the differences. Reading the two side by side is the classic
    robustness check (they disagree exactly when the difference
    distribution is heavy-tailed). The oracle replays pairs, moments
    and the t fold."""
    from pandasvcf_spark.operators.stats import paired_t_test

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    per = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", cents)).alias("x"),
        F.sum(F.when(F.col("event_type") == "click", cents)).alias("y"),
    )
    return paired_t_test(per, "x", "y")


@register(
    "m_brunner_munzel",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS f, round(value, 0) AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    cells AS (SELECT f, v, CAST(count(*) AS DOUBLE) AS n
              FROM b GROUP BY f, v),
    vc AS (SELECT v, sum(n) AS t FROM cells GROUP BY v),
    rc AS (SELECT v,
             coalesce(sum(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + (t + 1) / 2 AS rc
           FROM vc),
    wc AS (SELECT f, v, n,
             coalesce(sum(n) OVER (PARTITION BY f ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + (n + 1) / 2 AS rw
           FROM cells),
    j AS (SELECT wc.f, wc.v, wc.n, wc.rw, rc.rc
          FROM wc JOIN rc ON rc.v = wc.v),
    grp AS (SELECT f, sum(n) AS ng,
                   sum(n * rc) / sum(n) AS m
            FROM j GROUP BY f),
    s AS (SELECT j.f, max(grp.ng) AS ng, max(grp.m) AS m,
            sum(j.n * (j.rc - j.rw - grp.m + (grp.ng + 1.0) / 2.0)
                    * (j.rc - j.rw - grp.m + (grp.ng + 1.0) / 2.0))
              / (max(grp.ng) - 1.0) AS S
          FROM j JOIN grp ON grp.f = j.f GROUP BY j.f),
    g AS (SELECT
        (SELECT ng FROM s WHERE f = 0) AS n0,
        (SELECT m  FROM s WHERE f = 0) AS m0,
        (SELECT S  FROM s WHERE f = 0) AS s0,
        (SELECT ng FROM s WHERE f = 1) AS n1,
        (SELECT m  FROM s WHERE f = 1) AS m1,
        (SELECT S  FROM s WHERE f = 1) AS s1)
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           round(CASE WHEN n0 >= 2 AND n1 >= 2
                 THEN (m1 - (n1 + 1.0) / 2.0) / n0 END, 6) + 0.0
             AS p_hat,
           round(CASE WHEN n0 >= 2 AND n1 >= 2
                       AND sqrt(n0 * s0 + n1 * s1) > 0
                 THEN n0 * n1 * (m1 - m0) / (n0 + n1)
                      / sqrt(n0 * s0 + n1 * s1) END, 6) + 0.0 AS w
    FROM g
    """,
)
def m_brunner_munzel(spark, sf_dir):
    """Brunner-Munzel rank Behrens-Fisher test (operators/stats.
    brunner_munzel, pinned to scipy's documented example in tests) of
    user parity on integer-rounded value — the shape-robust upgrade
    of m_mannwhitney (whose variance assumes pure shift). Everything
    computes over (flag, value) count cells: combined and within-
    group mid-rank ladders over distinct values, placement variances
    as weighted cell folds — no raw-row window anywhere. ~0 expected
    on parity-blind data; the oracle replays ladders, placements and
    both folds."""
    from pandasvcf_spark.operators.stats import brunner_munzel

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    d = e.select(
        (F.col("user_id") % 2).cast("int").alias("f"),
        F.round(F.col("value"), 0).alias("v"),
    )
    return brunner_munzel(d, "f", "v")


@register(
    "m_competing_risks",
    oracle="""
    WITH s AS (
      SELECT CAST(value AS DOUBLE) AS t,
             CASE WHEN event_type = 'click' THEN 1
                  WHEN event_type = 'purchase' THEN 2
                  ELSE 0 END AS ev
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    per_t AS (
      SELECT t,
             CAST(sum(CASE WHEN ev > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS d,
             CAST(sum(CASE WHEN ev = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c
      FROM s GROUP BY t),
    tot AS (SELECT sum(d + c) AS N FROM per_t),
    risk AS (
      SELECT t, d,
             N - coalesce(sum(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM per_t, tot),
    curve AS (
      SELECT t, d, n_risk,
             coalesce(max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
               OVER wp, 0) AS hzp,
             coalesce(sum(CASE WHEN d < n_risk
               THEN ln(1.0 - CAST(d AS DOUBLE)
                             / CAST(n_risk AS DOUBLE)) END)
               OVER wp, 0.0) AS lsump
      FROM risk
      WINDOW wp AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING)),
    ladder AS (
      SELECT t, n_risk,
             CASE WHEN hzp = 1 THEN 0.0 ELSE exp(lsump) END AS sprev
      FROM curve),
    tc AS (SELECT t, ev AS cause,
                  CAST(count(*) AS BIGINT) AS n_events
           FROM s WHERE ev > 0 GROUP BY t, ev),
    j AS (SELECT tc.t, tc.cause, ladder.n_risk, tc.n_events,
                 ladder.sprev * CAST(tc.n_events AS DOUBLE)
                   / CAST(ladder.n_risk AS DOUBLE) AS term
          FROM tc JOIN ladder ON ladder.t = tc.t)
    SELECT t, CAST(cause AS INTEGER) AS cause,
           CAST(n_risk AS BIGINT) AS n_risk, n_events,
           round(sum(term) OVER (PARTITION BY cause ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
           + 0.0 AS cif
    FROM j ORDER BY cause, t
    """,
)
def m_competing_risks(spark, sf_dir):
    """Aalen-Johansen cumulative incidence (operators/relational.
    aalen_johansen) with clicks and purchases as competing event
    causes and everything else censoring — the estimator 1−KM gets
    WRONG under competing risks (it overstates each cause by treating
    the others as censoring); AJ attributes each time's hazard to its
    cause against the all-cause survival, and S + sum CIF_k = 1 holds
    exactly (pinned by test). The kaplan_meier ladder + one
    (time, cause) count join + a cause-partitioned cumulative sum
    over distinct-time cells. The oracle replays the whole ladder."""
    from pandasvcf_spark.operators.relational import aalen_johansen

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        F.col("value").alias("t"),
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "purchase", 2)
        .otherwise(0)
        .alias("ev"),
    )
    return aalen_johansen(d, "t", "ev")


@register(
    "m_tost_means",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS f,
             CAST(CAST(round(value * 100, 0) AS BIGINT) AS DOUBLE)
               AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    g AS (SELECT
        CAST(count(CASE WHEN f = 0 THEN 1 END) AS BIGINT) AS n0,
        CAST(count(CASE WHEN f = 1 THEN 1 END) AS BIGINT) AS n1,
        sum(CASE WHEN f = 0 THEN v END) AS s0,
        sum(CASE WHEN f = 1 THEN v END) AS s1,
        sum(CASE WHEN f = 0 THEN v * v END) AS q0,
        sum(CASE WHEN f = 1 THEN v * v END) AS q1
      FROM b),
    m AS (SELECT n0, n1, s1 / n1 - s0 / n0 AS diff,
            sqrt(((q1 - s1 * s1 / n1) / (n1 - 1.0)) / n1
                 + ((q0 - s0 * s0 / n0) / (n0 - 1.0)) / n0) AS se
          FROM g)
    SELECT n0, n1,
           round(CASE WHEN n0 >= 2 AND n1 >= 2 AND se > 0
                 THEN diff END, 6) + 0.0 AS diff,
           round(CASE WHEN n0 >= 2 AND n1 >= 2 AND se > 0
                 THEN diff - 1.6448536269514722 * se END, 6) + 0.0
             AS ci_lo,
           round(CASE WHEN n0 >= 2 AND n1 >= 2 AND se > 0
                 THEN diff + 1.6448536269514722 * se END, 6) + 0.0
             AS ci_hi,
           (CASE WHEN n0 >= 2 AND n1 >= 2 AND se > 0
             THEN diff - 1.6448536269514722 * se > -50.0
                  AND diff + 1.6448536269514722 * se < 50.0 END)
             AS equivalent
    FROM m
    """,
)
def m_tost_means(spark, sf_dir):
    """Mean-equivalence TOST (operators/stats.tost_means; Schuirmann
    via the 90%% Welch CI) — is parity's spend difference provably
    within ±50 cents? The m_equivalence sibling for MEANS, same
    digit-mirrored z quantile convention. Integer cents keep the
    moments exact; one 6-sum conditional agg. On parity-blind data
    equivalence should hold. The oracle replays moments, the CI and
    the margin verdict."""
    from pandasvcf_spark.operators.stats import tost_means

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    d = e.select(
        (F.col("user_id") % 2).cast("int").alias("f"),
        F.round(F.col("value") * 100, 0).cast("long").cast("double")
        .alias("v"),
    )
    return tost_means(d, "f", "v", margin=50.0)


@register(
    "m_rate_ratio",
    oracle="""
    WITH pu AS (
      SELECT user_id, CAST(user_id % 2 AS INTEGER) AS f,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                      END) AS BIGINT) AS e,
             CAST(count(*) AS DOUBLE) AS x
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      GROUP BY user_id),
    g AS (SELECT
        CAST(coalesce(sum(CASE WHEN f = 0 THEN e END), 0) AS BIGINT)
          AS events0,
        CAST(coalesce(sum(CASE WHEN f = 1 THEN e END), 0) AS BIGINT)
          AS events1,
        coalesce(sum(CASE WHEN f = 0 THEN x END), 0.0) AS x0,
        coalesce(sum(CASE WHEN f = 1 THEN x END), 0.0) AS x1
      FROM pu)
    SELECT events0, events1,
           round(x0, 4) AS exposure0, round(x1, 4) AS exposure1,
           round(CASE WHEN events0 > 0 AND events1 > 0
                       AND x0 > 0 AND x1 > 0
                 THEN (events1 / x1) / (events0 / x0) END, 6) + 0.0
             AS irr,
           round(CASE WHEN events0 > 0 AND events1 > 0
                       AND x0 > 0 AND x1 > 0
                 THEN ln((events1 / x1) / (events0 / x0))
                      / sqrt(1.0 / events1 + 1.0 / events0)
                 END, 6) + 0.0 AS z
    FROM g
    """,
)
def m_rate_ratio(spark, sf_dir):
    """Poisson incidence-rate ratio (operators/stats.rate_ratio) of
    errors per event of exposure between user parities — the
    two-RATE comparison m_odds_ratio (2x2) and the binomial A/B
    readouts don't cover (person-time / tokens-processed exposure
    denominators). Per-user (events, exposure) pre-agg, then one
    4-sum conditional fold; ~1 expected on parity-blind data. The
    oracle replays exposures, the ratio and the log-IRR z."""
    from pandasvcf_spark.operators.stats import rate_ratio

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    per = e.groupBy("user_id").agg(
        (F.col("user_id") % 2).cast("int").alias("f"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).cast("long").alias("e"),
        F.count(F.lit(1)).cast("double").alias("x"),
    )
    return rate_ratio(per, "f", "e", "x")


@register(
    "m_ks_2sample",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS f, round(value, 0) AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    cells AS (SELECT v,
        CAST(sum(CASE WHEN f = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM b GROUP BY v),
    tot AS (SELECT CAST(sum(c0) AS BIGINT) AS n0,
                   CAST(sum(c1) AS BIGINT) AS n1 FROM cells),
    lad AS (SELECT abs(
        CAST(sum(c0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS DOUBLE) / tot.n0
        - CAST(sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS DOUBLE) / tot.n1) AS gap,
        tot.n0 AS n0, tot.n1 AS n1
      FROM cells, tot),
    g AS (SELECT max(n0) AS n0, max(n1) AS n1, max(gap) AS d
          FROM lad),
    lamt AS (SELECT n0, n1, d,
        (sqrt(CAST(n0 AS DOUBLE) * n1 / (n0 + n1)) + 0.12
         + 0.11 / sqrt(CAST(n0 AS DOUBLE) * n1 / (n0 + n1))) * d
          AS lam
      FROM g)
    SELECT n0, n1, round(d, 6) + 0.0 AS d,
      round(greatest(least(2.0 * list_sum(list_transform(
        generate_series(1, 100),
        k -> (CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END)
             * exp(-2.0 * k * k * lam * lam))), 1.0), 0.0), 6)
        + 0.0 AS p_value
    FROM lamt
    """,
)
def m_ks_2sample(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov (operators/stats.ks_2sample) of
    user-parity value distributions on integer-rounded value — the
    new distribution-comparison family's sup-gap member: distinct-
    value cell collapse, ONE cumulative window for both ECDFs, and
    the 100-term asymptotic p series as a closed-form HOF fold the
    oracle replays term-for-term."""
    from pandasvcf_spark.operators.stats import ks_2sample

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    b = e.select(
        (F.col("user_id") % 2).cast("int").alias("f"),
        F.round("value", 0).alias("v"),
    )
    return ks_2sample(b, "f", "v")


def _binom_walk_oracle(counts_cte: str, p0: float, out_sql: str) -> str:
    """Shared WITH RECURSIVE replay of `_binom_minlike_p`'s log-pmf
    support walk (struct-lambda accumulators avoided — the
    e_holt_linear finding). `counts_cte` must define g(k BIGINT,
    n BIGINT) plus whatever `out_sql` projects from it."""
    import math

    lq = repr(math.log1p(-p0))
    lodds = repr(math.log(p0) - math.log1p(-p0))
    return f"""
    WITH RECURSIVE {counts_cte},
    prep AS (
      SELECT g.*, CAST(g.n AS DOUBLE) * CAST({lq} AS DOUBLE) AS lp0,
        exp(CAST(g.n AS DOUBLE) * CAST({lq} AS DOUBLE)
          + coalesce(list_sum(list_transform(
              generate_series(1, g.k),
              j -> ln(CAST(g.n - j + 1 AS DOUBLE))
                   - ln(CAST(j AS DOUBLE))
                   + CAST({lodds} AS DOUBLE))), CAST(0.0 AS DOUBLE)))
          * CAST(1.0000001 AS DOUBLE) AS thresh
      FROM g),
    wk AS (
      SELECT CAST(0 AS BIGINT) AS j, lp0 AS lp,
        CASE WHEN exp(lp0) <= thresh THEN exp(lp0)
             ELSE CAST(0.0 AS DOUBLE) END AS s,
        n, thresh
      FROM prep
      UNION ALL
      SELECT wk.j + 1,
        wk.lp + ln(CAST(wk.n - (wk.j + 1) + 1 AS DOUBLE))
              - ln(CAST(wk.j + 1 AS DOUBLE)) + CAST({lodds} AS DOUBLE),
        wk.s + CASE WHEN exp(wk.lp
                + ln(CAST(wk.n - (wk.j + 1) + 1 AS DOUBLE))
                - ln(CAST(wk.j + 1 AS DOUBLE))
                + CAST({lodds} AS DOUBLE)) <= wk.thresh
          THEN exp(wk.lp
                + ln(CAST(wk.n - (wk.j + 1) + 1 AS DOUBLE))
                - ln(CAST(wk.j + 1 AS DOUBLE))
                + CAST({lodds} AS DOUBLE))
          ELSE CAST(0.0 AS DOUBLE) END,
        wk.n, wk.thresh
      FROM wk WHERE wk.j < wk.n),
    fin AS (SELECT s FROM wk ORDER BY j DESC LIMIT 1)
    {out_sql}
    """


@register(
    "m_sign_test",
    oracle=_binom_walk_oracle(
        """b0 AS (
      SELECT value AS x,
        0.8 * value + CAST((user_id * 2654435761) % 23 AS DOUBLE) AS y
      FROM events
      WHERE user_id IS NOT NULL AND user_id < 30
        AND value IS NOT NULL),
    cnt AS (SELECT
        CAST(sum(CASE WHEN x - y > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS np,
        CAST(sum(CASE WHEN x - y < 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS nn
      FROM b0),
    g AS (SELECT np + nn AS n, np AS k, np, nn FROM cnt)""",
        0.5,
        """SELECT g.np AS n_pos, g.nn AS n_neg,
      round(CASE WHEN g.n > 0
        THEN least(fin.s, CAST(1.0 AS DOUBLE)) END, 8) + 0.0
        AS p_value
    FROM g CROSS JOIN fin""",
    ),
)
def m_sign_test(spark, sf_dir):
    """Exact paired sign test (operators/stats.sign_test) on a planted
    paired design over the small cohort (y = 0.8x + hash noise — the
    median difference is positive, so the sign test must reject):
    completes the paired triad beside m_paired_t and m_wilcoxon using
    the shared exact-binomial support walk at p0 = 1/2. Oracle: the
    same WITH RECURSIVE walk generator."""
    from pandasvcf_spark.operators.stats import sign_test

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & (F.col("user_id") < 30)
        & F.col("value").isNotNull()
    )
    b = e.select(
        F.col("value").alias("x"),
        (
            0.8 * F.col("value")
            + ((F.col("user_id") * 2654435761) % 23).cast("double")
        ).alias("y"),
    )
    return sign_test(b, "x", "y")


@register(
    "m_binom_exact",
    oracle=_binom_walk_oracle(
        """b AS (
      SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS s
      FROM events
      WHERE user_id IS NOT NULL AND user_id < 30
        AND event_type IS NOT NULL),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(s) AS BIGINT) AS k FROM b)""",
        0.2,
        """SELECT g.n, g.k,
      round(CASE WHEN g.n > 0
        THEN CAST(g.k AS DOUBLE) / g.n END, 6) + 0.0 AS p_hat,
      round(CASE WHEN g.n > 0
        THEN least(fin.s, CAST(1.0 AS DOUBLE)) END, 8) + 0.0
        AS p_value
    FROM g CROSS JOIN fin""",
    ),
)
def m_binom_exact(spark, sf_dir):
    """Exact binomial test (operators/stats.binom_test_exact; R's
    binom.test two-sided minimum-likelihood convention, pinned to R's
    documented 682/925 golden in pytest): is the click share of the
    small cohort (user_id < 30) equal to p0 = 0.2? One 2-counter agg +
    the O(n) log-pmf support walk behind the max_n tripwire; the
    oracle replays the identical recurrence with WITH RECURSIVE."""
    from pandasvcf_spark.operators.stats import binom_test_exact

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & (F.col("user_id") < 30)
        & F.col("event_type").isNotNull()
    )
    b = e.select(
        F.when(F.col("event_type") == "click", 1).otherwise(0)
        .alias("s")
    )
    return binom_test_exact(b, "s", p0=0.2)


@register(
    "m_mcnemar_exact",
    oracle=_binom_walk_oracle(
        """b0 AS (
      SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS fa,
             CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS fb
      FROM events
      WHERE user_id IS NOT NULL AND user_id < 10
        AND event_type IS NOT NULL AND value IS NOT NULL),
    cnt AS (SELECT
        CAST(sum(CASE WHEN fa = 1 AND fb = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS bb,
        CAST(sum(CASE WHEN fa = 0 AND fb = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS cc
      FROM b0),
    g AS (SELECT bb + cc AS n, bb AS k, bb, cc FROM cnt)""",
        0.5,
        """SELECT g.bb AS b, g.cc AS c,
      round(CASE WHEN g.n > 0
        THEN least(fin.s, CAST(1.0 AS DOUBLE)) END, 8) + 0.0
        AS p_value
    FROM g CROSS JOIN fin""",
    ),
)
def m_mcnemar_exact(spark, sf_dir):
    """Exact McNemar test (operators/stats.mcnemar_exact) on the
    m_fisher_exact paired-flag fixture — the discordant counts are
    Binomial(b+c, 1/2) under H0, so the p-value is the exact two-sided
    binomial on them (the small-sample form of m_mcnemar's
    chi-square). Same shared support walk; oracle replays it with
    WITH RECURSIVE."""
    from pandasvcf_spark.operators.stats import mcnemar_exact

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & (F.col("user_id") < 10)
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    )
    b = e.select(
        F.when(F.col("event_type") == "click", 1).otherwise(0)
        .alias("fa"),
        F.when(F.col("value") > 50.0, 1).otherwise(0).alias("fb"),
    )
    return mcnemar_exact(b, "fa", "fb")


@register(
    "e_decompose",
    oracle="""
    WITH hourly AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS t,
             CAST(count(*) AS DOUBLE) AS x
      FROM events WHERE ts IS NOT NULL GROUP BY 1),
    pos AS (
      SELECT t, x,
        row_number() OVER (ORDER BY t) AS i,
        count(*) OVER (ORDER BY t ROWS BETWEEN 12 PRECEDING AND
          12 FOLLOWING) AS wn,
        sum(x) OVER (ORDER BY t ROWS BETWEEN 12 PRECEDING AND
          12 FOLLOWING) AS ws,
        first_value(x) OVER (ORDER BY t ROWS BETWEEN 12 PRECEDING AND
          12 FOLLOWING) AS wlo,
        last_value(x) OVER (ORDER BY t ROWS BETWEEN 12 PRECEDING AND
          12 FOLLOWING) AS whi
      FROM hourly),
    td AS (
      SELECT t, x, (i - 1) % 24 AS slot,
        CASE WHEN wn = 25 THEN (ws - wlo / 2 - whi / 2) / 24 END
          AS trend
      FROM pos),
    sm AS (SELECT slot, avg(x - trend) AS m FROM td
           WHERE trend IS NOT NULL GROUP BY slot),
    gm AS (SELECT avg(m) AS g FROM sm),
    seas AS (SELECT slot, m - g AS s FROM sm CROSS JOIN gm)
    SELECT td.t, td.x,
      round(td.trend, 6) + 0.0 AS trend,
      round(seas.s, 6) + 0.0 AS seasonal,
      round(td.x - td.trend - seas.s, 6) + 0.0 AS remainder
    FROM td LEFT JOIN seas ON td.slot = seas.slot
    """,
)
def e_decompose(spark, sf_dir):
    """Classical additive seasonal decomposition (operators/stats.
    classical_decompose; R's decompose()) of the hourly event-count
    series at period 24 — trend (centered 2x24 MA with half-weight
    ends), daily seasonal indexes, remainder. Series-guarded windows
    over one sort + a 24-row slot-mean broadcast; the oracle replays
    the window frames, the slot means and the centering
    term-for-term."""
    from pandasvcf_spark.operators.stats import classical_decompose

    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hourly = e.groupBy(
        F.unix_timestamp(F.date_trunc("hour", "ts"))
        .cast("long").alias("t")
    ).agg(F.count(F.lit(1)).cast("double").alias("v"))
    return classical_decompose(hourly, "t", "v", period=24)


@register(
    "m_granger",
    oracle="""
    WITH hourly AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS t,
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
          AS DOUBLE) AS y,
        CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
          AS DOUBLE) AS x
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1),
    lagged AS (
      SELECT y, lag(y) OVER (ORDER BY t) AS u,
             lag(x) OVER (ORDER BY t) AS v
      FROM hourly),
    trip AS (SELECT * FROM lagged
             WHERE u IS NOT NULL AND v IS NOT NULL),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        sum(y) AS sy, sum(u) AS su, sum(v) AS sv,
        sum(y * y) AS syy0, sum(u * u) AS suu0, sum(v * v) AS svv0,
        sum(y * u) AS syu0, sum(y * v) AS syv0, sum(u * v) AS suv0
      FROM trip),
    c AS (SELECT n, CAST(n AS DOUBLE) AS nd,
        syy0 - sy * sy / CAST(n AS DOUBLE) AS syy,
        suu0 - su * su / CAST(n AS DOUBLE) AS suu,
        svv0 - sv * sv / CAST(n AS DOUBLE) AS svv,
        syu0 - sy * su / CAST(n AS DOUBLE) AS syu,
        syv0 - sy * sv / CAST(n AS DOUBLE) AS syv,
        suv0 - su * sv / CAST(n AS DOUBLE) AS suv
      FROM g),
    o AS (SELECT n, nd, syy, suu, svv, syu, syv, suv,
        syy - syu * syu / suu AS rss_r,
        suu * svv - suv * suv AS det
      FROM c),
    f AS (SELECT n, nd, suu, svv, det, rss_r, syu, syv,
        (syu * svv - syv * suv) / det AS b_y,
        (syv * suu - syu * suv) / det AS b_x,
        syy - ((syu * svv - syv * suv) / det) * syu
            - ((syv * suu - syu * suv) / det) * syv AS rss_u
      FROM o)
    SELECT n,
      round(CASE WHEN n > 3 AND suu > 0 AND svv > 0 AND det > 0
               AND rss_u > 0
        THEN (rss_r - rss_u) / (rss_u / (nd - 3)) END, 6) + 0.0 AS f,
      round(CASE WHEN n > 3 AND suu > 0 AND svv > 0 AND det > 0
               AND rss_u > 0 THEN b_y END, 6) + 0.0 AS b_y,
      round(CASE WHEN n > 3 AND suu > 0 AND svv > 0 AND det > 0
               AND rss_u > 0 THEN b_x END, 6) + 0.0 AS b_x
    FROM f
    """,
)
def m_granger(spark, sf_dir):
    """Granger causality, one lag (operators/stats.granger_causality)
    between the hourly click and view count series — does view history
    improve click prediction beyond click history? One lag window over
    the pre-aggregated series + one 10-sum moment agg + closed-form
    two-regressor OLS (no iteration); the oracle replays every
    centered moment, both regressions and the F arithmetic. Planted-
    direction recovery is pinned in pytest (the fixture here is the
    honest natural pair)."""
    from pandasvcf_spark.operators.stats import granger_causality

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    hourly = e.groupBy(
        F.unix_timestamp(F.date_trunc("hour", "ts"))
        .cast("long").alias("t")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("double").alias("y"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("double").alias("x"),
    )
    return granger_causality(hourly, "t", "y", "x")


@register(
    "m_auc_se",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS y,
        round(value, 0) + 30.0 * (user_id % 2) AS s
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    cells AS (SELECT s,
        CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS p,
        CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS q
      FROM b GROUP BY s),
    tot AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos,
                   CAST(sum(q) AS BIGINT) AS n_neg FROM cells),
    lad AS (SELECT p, q, tot.n_pos, tot.n_neg,
        (coalesce(sum(q) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
           PRECEDING AND 1 PRECEDING), 0.0) + q / 2) / tot.n_neg
          AS v10,
        (coalesce(sum(p) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
           PRECEDING AND 1 PRECEDING), 0.0) + p / 2) / tot.n_pos
          AS v01
      FROM cells, tot),
    g AS (SELECT max(n_pos) AS n_pos, max(n_neg) AS n_neg,
        sum(p * v10) AS s10, sum(p * v10 * v10) AS ss10,
        sum(q * v01) AS s01, sum(q * v01 * v01) AS ss01
      FROM lad),
    f AS (SELECT n_pos, n_neg,
        CAST(n_pos AS DOUBLE) AS m, CAST(n_neg AS DOUBLE) AS n,
        s10, ss10, s01, ss01 FROM g)
    SELECT n_pos, n_neg,
      round(CASE WHEN n_pos > 0 AND n_neg > 0
        THEN s10 / m END, 6) + 0.0 AS auc,
      round(CASE WHEN n_pos > 1 AND n_neg > 1 THEN
        sqrt((ss10 - m * (s10 / m) * (s10 / m)) / (m - 1) / m
           + (ss01 - n * (s01 / n) * (s01 / n)) / (n - 1) / n)
        END, 6) + 0.0 AS se
    FROM f
    """,
)
def m_auc_se(spark, sf_dir):
    """AUC with the DeLong standard error (operators/stats.auc_delong)
    on a planted separable scorer (value + 30·label, integer-rounded
    for ties) — the structural-component variance every model
    comparison needs: placements V10/V01 are constant per distinct-
    score cell, so the whole statistic is the tripwired cell ladder +
    weighted folds. The oracle replays the midcell placements and both
    variances term-for-term."""
    from pandasvcf_spark.operators.stats import auc_delong

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    b = e.select(
        (F.col("user_id") % 2).cast("int").alias("y"),
        (
            F.round("value", 0) + 30.0 * (F.col("user_id") % 2)
        ).alias("s"),
    )
    return auc_delong(b, "y", "s")


@register(
    "e_page_hinkley",
    oracle="""
    WITH hourly AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS t,
             CAST(count(*) AS DOUBLE) AS v
      FROM events WHERE ts IS NOT NULL GROUP BY 1),
    stepped AS (
      SELECT t,
        count(*) OVER () AS n,
        v - sum(v) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW)
            / count(*) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW)
          - 0.0 AS dev
      FROM hourly),
    cum AS (
      SELECT t, n, sum(dev) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS m
      FROM stepped),
    ph AS (
      SELECT t, n, m - min(m) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS ph
      FROM cum)
    SELECT CAST(n AS BIGINT) AS n, round(ph, 6) + 0.0 AS ph,
           t AS t_peak
    FROM ph ORDER BY ph DESC, t ASC LIMIT 1
    """,
)
def e_page_hinkley(spark, sf_dir):
    """Page-Hinkley drift statistic (operators/stats.page_hinkley,
    δ=0) on the hourly event-count series — the streaming-ML
    mean-increase monitor: cumulative deviations from the running mean
    measured above their historical minimum, peak + location emitted.
    Series-guarded windows over one sort; the oracle replays the
    cumsum/running-mean/running-min chain and the (ph DESC, t ASC)
    total-order cut."""
    from pandasvcf_spark.operators.stats import page_hinkley

    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hourly = e.groupBy(
        F.unix_timestamp(F.date_trunc("hour", "ts"))
        .cast("long").alias("t")
    ).agg(F.count(F.lit(1)).cast("double").alias("v"))
    return page_hinkley(hourly, "t", "v", delta=0.0)


def _sql_lf(x: str) -> str:
    """log-factorial as the identical HOF fold (Σ ln i from 2)."""
    return (
        f"CASE WHEN ({x}) < 2 THEN CAST(0.0 AS DOUBLE) ELSE "
        f"list_sum(list_transform(generate_series(2, ({x})), "
        f"i -> ln(CAST(i AS DOUBLE)))) END"
    )


def _fisher_oracle() -> str:
    lf = _sql_lf
    logp_lo = (
        f"{lf('ra')} + {lf('n - ra')} + {lf('ca')} + {lf('n - ca')} "
        f"- {lf('n')} - {lf('lo')} - {lf('ra - lo')} - {lf('ca - lo')} "
        f"- {lf('n - ra - ca + lo')}"
    )
    logp_a = (
        f"{lf('ra')} + {lf('n - ra')} + {lf('ca')} + {lf('n - ca')} "
        f"- {lf('n')} - {lf('a')} - {lf('ra - a')} - {lf('ca - a')} "
        f"- {lf('n - ra - ca + a')}"
    )
    step_lp = (
        "wk.lp + ln(CAST(wk.ra - (wk.k + 1) + 1 AS DOUBLE)) "
        "+ ln(CAST(wk.ca - (wk.k + 1) + 1 AS DOUBLE)) "
        "- ln(CAST(wk.k + 1 AS DOUBLE)) "
        "- ln(CAST(wk.n - wk.ra - wk.ca + (wk.k + 1) AS DOUBLE))"
    )
    return f"""
    WITH RECURSIVE b AS (
      SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS fa,
             CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS fb
      FROM events
      WHERE user_id IS NOT NULL AND user_id < 10
        AND event_type IS NOT NULL AND value IS NOT NULL),
    g AS (SELECT
        CAST(sum(CASE WHEN fa = 1 AND fb = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS a,
        CAST(sum(CASE WHEN fa = 1 AND fb = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS b,
        CAST(sum(CASE WHEN fa = 0 AND fb = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS c,
        CAST(sum(CASE WHEN fa = 0 AND fb = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS d
      FROM b),
    m AS (SELECT a, b, c, d, a + b + c + d AS n, a + b AS ra,
                 a + c AS ca,
                 greatest(CAST(0 AS BIGINT), a + b + a + c
                          - (a + b + c + d)) AS lo,
                 least(a + b, a + c) AS hi
          FROM g),
    prep AS (SELECT m.*,
        ({logp_lo}) AS lp_lo,
        exp({logp_a}) * CAST(1.0000001 AS DOUBLE) AS thresh
      FROM m),
    wk AS (
      SELECT lo AS k, lp_lo AS lp,
        CASE WHEN exp(lp_lo) <= thresh THEN exp(lp_lo)
             ELSE CAST(0.0 AS DOUBLE) END AS s,
        hi, ra, ca, n, thresh
      FROM prep
      UNION ALL
      SELECT wk.k + 1, {step_lp},
        wk.s + CASE WHEN exp({step_lp}) <= wk.thresh
                 THEN exp({step_lp}) ELSE CAST(0.0 AS DOUBLE) END,
        wk.hi, wk.ra, wk.ca, wk.n, wk.thresh
      FROM wk WHERE wk.k < wk.hi),
    fin AS (SELECT s FROM wk ORDER BY k DESC LIMIT 1)
    SELECT m.a, m.b, m.c, m.d,
      round(CASE WHEN m.ra > 0 AND m.ca > 0 AND m.n - m.ra > 0
               AND m.n - m.ca > 0
        THEN least(fin.s, CAST(1.0 AS DOUBLE)) END, 8) + 0.0
        AS p_value,
      round(CASE WHEN m.ra > 0 AND m.ca > 0 AND m.n - m.ra > 0
               AND m.n - m.ca > 0 AND m.b * m.c > 0
        THEN (CAST(m.a AS DOUBLE) * m.d) / (CAST(m.b AS DOUBLE) * m.c)
        END, 6) + 0.0 AS odds_ratio
    FROM m CROSS JOIN fin
    """


@register("m_fisher_exact", oracle=_fisher_oracle())
def m_fisher_exact(spark, sf_dir):
    """Fisher's exact 2x2 test (operators/stats.fisher_exact_2x2; R's
    two-sided minimum-likelihood convention, pinned to fisher.test's
    tea-tasting golden in pytest) on a small-cohort slice of events
    (user_id < 10; click-vs-value flags) — the exact small-sample
    association test beside m_odds_ratio's normal z. Log-factorials
    are Σ ln i HOF folds and the hypergeometric support walks
    incrementally; the oracle replays the identical recurrence with
    WITH RECURSIVE (the DuckDB struct-lambda accumulator is avoided —
    see e_holt_linear's note)."""
    from pandasvcf_spark.operators.stats import fisher_exact_2x2

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & (F.col("user_id") < 10)
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    )
    b = e.select(
        F.when(F.col("event_type") == "click", 1).otherwise(0)
        .alias("fa"),
        F.when(F.col("value") > 50.0, 1).otherwise(0).alias("fb"),
    )
    return fisher_exact_2x2(b, "fa", "fb")


def _cox_oracle(iters: int = 5) -> str:
    """Unrolled fixed-round Newton for the binary-covariate Cox model
    — the pagerank/m_logit device: one (stats, beta) CTE pair per
    round over the distinct-time risk-set ladder."""
    parts = [
        """
    WITH b AS (
      SELECT value * (1 + 0.5 * (user_id % 2)) AS t,
        CASE WHEN event_id % 4 <> 0 THEN 1 ELSE 0 END AS e,
        CAST(user_id % 2 AS INTEGER) AS g
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
        AND event_id IS NOT NULL),
    cells AS (
      SELECT t, CAST(sum(e) AS DOUBLE) AS d,
        CAST(sum(e * g) AS DOUBLE) AS s,
        CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS c0,
        CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS c1
      FROM b GROUP BY t),
    lad AS (
      SELECT d, s,
        sum(c0) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS r0,
        sum(c1) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS r1
      FROM cells),
    ev AS (SELECT * FROM lad WHERE d > 0),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(e) AS BIGINT) AS n_events FROM b),
    bt0 AS (SELECT CAST(0.0 AS DOUBLE) AS bb)"""
    ]
    for i in range(iters):
        parts.append(f""",
    st{i} AS (SELECT max(bb) AS bb,
        sum(s - d * (r1 * exp(bb) / (r0 + r1 * exp(bb)))) AS uu,
        sum(d * (r1 * exp(bb) / (r0 + r1 * exp(bb)))
              * (1 - r1 * exp(bb) / (r0 + r1 * exp(bb)))) AS ii
      FROM ev CROSS JOIN bt{i}),
    bt{i + 1} AS (SELECT CASE WHEN ii > 0 THEN bb + uu / ii
                               ELSE bb END AS bb FROM st{i})""")
    parts.append(f""",
    fin AS (SELECT max(bb) AS bb,
        sum(d * (r1 * exp(bb) / (r0 + r1 * exp(bb)))
              * (1 - r1 * exp(bb) / (r0 + r1 * exp(bb)))) AS ii,
        count(*) AS cells
      FROM ev CROSS JOIN bt{iters})
    SELECT tot.n, tot.n_events,
      round(CASE WHEN tot.n_events > 0 AND fin.ii > 0
        THEN fin.bb END, 6) + 0.0 AS beta,
      round(CASE WHEN tot.n_events > 0 AND fin.ii > 0
        THEN 1.0 / sqrt(fin.ii) END, 6) + 0.0 AS se,
      round(CASE WHEN tot.n_events > 0 AND fin.ii > 0
        THEN exp(fin.bb) END, 6) + 0.0 AS hr,
      round(CASE WHEN tot.n_events > 0 AND fin.ii > 0
        THEN fin.bb / (1.0 / sqrt(fin.ii)) END, 6) + 0.0 AS z
    FROM fin CROSS JOIN tot
    """)
    return "".join(parts)


@register("m_cox", oracle=_cox_oracle())
def m_cox(spark, sf_dir):
    """Cox proportional-hazards regression, binary covariate
    (operators/stats.cox_ph_binary; Breslow ties, 5 fixed Newton
    rounds) on a planted design over events: time = value stretched
    1.5x for odd users (so the true log hazard ratio is negative),
    event = 75% of rows, group = user parity. The cohort collapses to
    the distinct-time risk-set ladder; each Newton round is a 1-row
    fold, and the oracle is the UNROLLED optimization (one CTE pair
    per round — the g_pagerank / m_logit convention)."""
    from pandasvcf_spark.operators.stats import cox_ph_binary

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_id").isNotNull()
    )
    b = e.select(
        (
            F.col("value") * (1 + 0.5 * (F.col("user_id") % 2))
        ).alias("t"),
        F.when(F.col("event_id") % 4 != 0, 1).otherwise(0).alias("e"),
        (F.col("user_id") % 2).cast("int").alias("g"),
    )
    return cox_ph_binary(b, "t", "e", "g", iters=5)


def _cox_multi_oracle(iters: int = 5) -> str:
    """Unrolled fixed-round Newton for the TWO-covariate Cox model —
    the m_cox device with a p=2 Cramer solve per round: each round is
    a (weights, ladder, fold, solve) CTE quartet, and the solve's
    operand order matches operators/stats/causal_survival.cox_ph's
    p == 2 closed form exactly."""
    head = """
    WITH b AS (
      SELECT value * (1 + 0.5 * (user_id % 2))
               * (1 + 0.2 * (event_id % 3)) AS t,
        CASE WHEN event_id % 4 <> 0 THEN 1 ELSE 0 END AS e,
        CAST(user_id % 2 AS DOUBLE) AS x1,
        CAST(event_id % 3 AS DOUBLE) AS x2
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
        AND event_id IS NOT NULL),
    cells AS (
      SELECT t, x1, x2, CAST(count(*) AS DOUBLE) AS cnt,
        CAST(sum(e) AS DOUBLE) AS d
      FROM b GROUP BY t, x1, x2),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(e) AS BIGINT) AS n_events FROM b),
    bt0 AS (SELECT CAST(0.0 AS DOUBLE) AS b1,
                   CAST(0.0 AS DOUBLE) AS b2)"""
    parts = [head]
    # rounds 0..iters-1 update beta; the ladder at bt{iters} (same
    # CTE shape) prices the final information for the SEs
    for i in range(iters + 1):
        parts.append(f""",
    w{i} AS (SELECT c.t, c.x1, c.x2, c.d, bt.b1, bt.b2,
        c.cnt * exp(bt.b1 * c.x1 + bt.b2 * c.x2) AS w
      FROM cells c CROSS JOIN bt{i} bt),
    lad{i} AS (SELECT d, x1, x2, b1, b2,
        sum(w) OVER sfx AS s0,
        sum(w * x1) OVER sfx AS s1a,
        sum(w * x2) OVER sfx AS s1b,
        sum(w * x1 * x1) OVER sfx AS s2aa,
        sum(w * x1 * x2) OVER sfx AS s2ab,
        sum(w * x2 * x2) OVER sfx AS s2bb
      FROM w{i}
      WINDOW sfx AS (ORDER BY t DESC
        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    st{i} AS (SELECT max(b1) AS b1, max(b2) AS b2,
        sum(d * x1 - d * s1a / s0) AS u1,
        sum(d * x2 - d * s1b / s0) AS u2,
        sum(d * (s2aa / s0 - (s1a / s0) * (s1a / s0))) AS i11,
        sum(d * (s2ab / s0 - (s1a / s0) * (s1b / s0))) AS i12,
        sum(d * (s2bb / s0 - (s1b / s0) * (s1b / s0))) AS i22
      FROM lad{i} WHERE d > 0)""")
        if i < iters:
            parts.append(f""",
    bt{i + 1} AS (SELECT
        CASE WHEN (i11 * i22 - i12 * i12) > 0 AND i11 > 0
          THEN b1 + (u1 * i22 - u2 * i12) / (i11 * i22 - i12 * i12)
          ELSE b1 END AS b1,
        CASE WHEN (i11 * i22 - i12 * i12) > 0 AND i11 > 0
          THEN b2 + (u2 * i11 - u1 * i12) / (i11 * i22 - i12 * i12)
          ELSE b2 END AS b2
      FROM st{i})""")
    parts.append(f""",
    fin AS (SELECT b1, b2, i11, i12, i22,
                   i11 * i22 - i12 * i12 AS det FROM st{iters})
    SELECT v.covariate, tot.n, tot.n_events,
      round(CASE WHEN tot.n_events > 0 AND fin.det > 0 AND fin.i11 > 0
        THEN CASE v.covariate WHEN 'x1' THEN fin.b1 ELSE fin.b2 END
        END, 6) + 0.0 AS beta,
      round(CASE WHEN tot.n_events > 0 AND fin.det > 0 AND fin.i11 > 0
        THEN sqrt(CASE v.covariate WHEN 'x1' THEN fin.i22 / fin.det
                  ELSE fin.i11 / fin.det END)
        END, 6) + 0.0 AS se,
      round(CASE WHEN tot.n_events > 0 AND fin.det > 0 AND fin.i11 > 0
        THEN exp(CASE v.covariate WHEN 'x1' THEN fin.b1 ELSE fin.b2
                 END)
        END, 6) + 0.0 AS hr,
      round(CASE WHEN tot.n_events > 0 AND fin.det > 0 AND fin.i11 > 0
        THEN (CASE v.covariate WHEN 'x1' THEN fin.b1 ELSE fin.b2 END)
          / sqrt(CASE v.covariate WHEN 'x1' THEN fin.i22 / fin.det
                 ELSE fin.i11 / fin.det END)
        END, 6) + 0.0 AS z
    FROM (VALUES ('x1'), ('x2')) AS v(covariate)
    CROSS JOIN fin CROSS JOIN tot
    """)
    return "".join(parts)


@register("m_cox_multi", oracle=_cox_multi_oracle())
def m_cox_multi(spark, sf_dir):
    """Multi-covariate Cox proportional hazards (operators/stats.
    cox_ph; Breslow ties, p = 2 here, 5 fixed Newton rounds with the
    Cramer closed-form solve) on a doubly-planted design over events:
    time stretched 1.5x for odd users AND up to 1.4x by event_id % 3,
    so BOTH covariates carry negative true log hazard ratios and the
    fit must adjust for each while estimating the other — the
    capability cox_ph_binary (m_cox) structurally lacks. The cohort
    collapses to distinct (time, x1, x2) cells; every Newton round
    re-prices the suffix RANGE risk-set ladder under the new beta and
    folds to one row; the p x p system solves driver-side
    (model-sized). Oracle: the UNROLLED optimization, one
    ladder+fold+Cramer CTE quartet per round."""
    from pandasvcf_spark.operators.stats import cox_ph

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_id").isNotNull()
    )
    b = e.select(
        (
            F.col("value")
            * (1 + 0.5 * (F.col("user_id") % 2))
            * (1 + 0.2 * (F.col("event_id") % 3))
        ).alias("t"),
        F.when(F.col("event_id") % 4 != 0, 1).otherwise(0).alias("e"),
        (F.col("user_id") % 2).cast("double").alias("x1"),
        (F.col("event_id") % 3).cast("double").alias("x2"),
    )
    return cox_ph(b, "t", "e", ["x1", "x2"], iters=5)


def _cox_multi3_oracle(iters: int = 5) -> str:
    """Unrolled fixed-round Newton for the THREE-covariate Cox model —
    `_cox_multi_oracle` with the p=2 Cramer solve swapped for the
    NATURAL-ORDER Gaussian elimination cox_ph uses at p >= 3 (round-12
    verdict task 5: pivot-FREE by design, so the op order is
    data-independent and each round's solve replays term-for-term as a
    lateral-alias CTE: f1 = i12/i11, f2 = i13/i11 eliminate column 1;
    f3 = m21/m11 eliminates column 2; positivity of the three natural
    pivots i11, m11, q22 IS the SPD guard — Sylvester's criterion —
    generalizing the p=2 (det > 0 AND i11 > 0) form). The SE columns
    replay the three e_i solves, which share the eliminated matrix and
    transform only the RHS."""
    head = """
    WITH b AS (
      SELECT value * (1 + 0.5 * (user_id % 2))
               * (1 + 0.2 * (event_id % 3))
               * (1 + 0.1 * (user_id % 5)) AS t,
        CASE WHEN event_id % 4 <> 0 THEN 1 ELSE 0 END AS e,
        CAST(user_id % 2 AS DOUBLE) AS x1,
        CAST(event_id % 3 AS DOUBLE) AS x2,
        CAST(user_id % 5 AS DOUBLE) AS x3
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
        AND event_id IS NOT NULL),
    cells AS (
      SELECT t, x1, x2, x3, CAST(count(*) AS DOUBLE) AS cnt,
        CAST(sum(e) AS DOUBLE) AS d
      FROM b GROUP BY t, x1, x2, x3),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(e) AS BIGINT) AS n_events FROM b),
    bt0 AS (SELECT CAST(0.0 AS DOUBLE) AS b1,
                   CAST(0.0 AS DOUBLE) AS b2,
                   CAST(0.0 AS DOUBLE) AS b3)"""
    parts = [head]
    for i in range(iters + 1):
        parts.append(f""",
    w{i} AS (SELECT c.t, c.x1, c.x2, c.x3, c.d, bt.b1, bt.b2, bt.b3,
        c.cnt * exp(bt.b1 * c.x1 + bt.b2 * c.x2 + bt.b3 * c.x3) AS w
      FROM cells c CROSS JOIN bt{i} bt),
    lad{i} AS (SELECT d, x1, x2, x3, b1, b2, b3,
        sum(w) OVER sfx AS s0,
        sum(w * x1) OVER sfx AS s1a,
        sum(w * x2) OVER sfx AS s1b,
        sum(w * x3) OVER sfx AS s1c,
        sum(w * x1 * x1) OVER sfx AS s2aa,
        sum(w * x1 * x2) OVER sfx AS s2ab,
        sum(w * x1 * x3) OVER sfx AS s2ac,
        sum(w * x2 * x2) OVER sfx AS s2bb,
        sum(w * x2 * x3) OVER sfx AS s2bc,
        sum(w * x3 * x3) OVER sfx AS s2cc
      FROM w{i}
      WINDOW sfx AS (ORDER BY t DESC
        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    st{i} AS (SELECT max(b1) AS b1, max(b2) AS b2, max(b3) AS b3,
        sum(d * x1 - d * s1a / s0) AS u1,
        sum(d * x2 - d * s1b / s0) AS u2,
        sum(d * x3 - d * s1c / s0) AS u3,
        sum(d * (s2aa / s0 - (s1a / s0) * (s1a / s0))) AS i11,
        sum(d * (s2ab / s0 - (s1a / s0) * (s1b / s0))) AS i12,
        sum(d * (s2ac / s0 - (s1a / s0) * (s1c / s0))) AS i13,
        sum(d * (s2bb / s0 - (s1b / s0) * (s1b / s0))) AS i22,
        sum(d * (s2bc / s0 - (s1b / s0) * (s1c / s0))) AS i23,
        sum(d * (s2cc / s0 - (s1c / s0) * (s1c / s0))) AS i33
      FROM lad{i} WHERE d > 0),
    el{i} AS (SELECT b1, b2, b3, u1, u2, u3, i11, i12, i13,
        i22 - (i12 / i11) * i12 AS m11,
        i23 - (i12 / i11) * i13 AS m12,
        u2  - (i12 / i11) * u1  AS r2,
        i23 - (i13 / i11) * i12 AS m21,
        i33 - (i13 / i11) * i13 AS m22,
        u3  - (i13 / i11) * u1  AS r3,
        m22 - (m21 / m11) * m12 AS q22,
        r3  - (m21 / m11) * r2  AS q3
      FROM st{i})""")
        if i < iters:
            parts.append(f""",
    bt{i + 1} AS (SELECT
        CASE WHEN i11 > 0 AND m11 > 0 AND q22 > 0 THEN
          b1 + (u1 - ((i12 * ((r2 - m12 * (q3 / q22)) / m11))
                      + (i13 * (q3 / q22)))) / i11
        ELSE b1 END AS b1,
        CASE WHEN i11 > 0 AND m11 > 0 AND q22 > 0 THEN
          b2 + (r2 - m12 * (q3 / q22)) / m11
        ELSE b2 END AS b2,
        CASE WHEN i11 > 0 AND m11 > 0 AND q22 > 0 THEN
          b3 + q3 / q22
        ELSE b3 END AS b3
      FROM el{i})""")
    parts.append(f""",
    fin AS (SELECT b1, b2, b3, i11, m11, q22,
        (0.0 - (i12 / i11) * 1.0) AS e1r2,
        (0.0 - (i13 / i11) * 1.0) AS e1r3,
        (1.0 - (i12 / i11) * 0.0) AS e2r2,
        (0.0 - (i13 / i11) * 0.0) AS e2r3,
        (0.0 - (i12 / i11) * 0.0) AS e3r2,
        (1.0 - (i13 / i11) * 0.0) AS e3r3,
        e1r3 - (m21 / m11) * e1r2 AS e1q3,
        e2r3 - (m21 / m11) * e2r2 AS e2q3,
        e3r3 - (m21 / m11) * e3r2 AS e3q3,
        (1.0 - ((i12 * ((e1r2 - m12 * (e1q3 / q22)) / m11))
                + (i13 * (e1q3 / q22)))) / i11 AS v1,
        (e2r2 - m12 * (e2q3 / q22)) / m11 AS v2,
        e3q3 / q22 AS v3
      FROM el{iters}),
    ok AS (SELECT fin.*, tot.n, tot.n_events,
        (tot.n_events > 0 AND fin.i11 > 0 AND fin.m11 > 0
         AND fin.q22 > 0 AND fin.v1 > 0 AND fin.v2 > 0
         AND fin.v3 > 0) AS g
      FROM fin CROSS JOIN tot)
    SELECT v.covariate, ok.n, ok.n_events,
      round(CASE WHEN ok.g THEN
        (CASE v.covariate WHEN 'x1' THEN ok.b1
              WHEN 'x2' THEN ok.b2 ELSE ok.b3 END) END, 6) + 0.0
        AS beta,
      round(CASE WHEN ok.g THEN
        sqrt(CASE v.covariate WHEN 'x1' THEN ok.v1
             WHEN 'x2' THEN ok.v2 ELSE ok.v3 END) END, 6) + 0.0
        AS se,
      round(CASE WHEN ok.g THEN
        exp(CASE v.covariate WHEN 'x1' THEN ok.b1
            WHEN 'x2' THEN ok.b2 ELSE ok.b3 END) END, 6) + 0.0
        AS hr,
      round(CASE WHEN ok.g THEN
        (CASE v.covariate WHEN 'x1' THEN ok.b1
              WHEN 'x2' THEN ok.b2 ELSE ok.b3 END)
        / sqrt(CASE v.covariate WHEN 'x1' THEN ok.v1
               WHEN 'x2' THEN ok.v2 ELSE ok.v3 END) END, 6) + 0.0
        AS z
    FROM (VALUES ('x1'), ('x2'), ('x3')) AS v(covariate)
    CROSS JOIN ok
    """)
    return "".join(parts)


@register("m_cox_multi3", oracle=_cox_multi3_oracle())
def m_cox_multi3(spark, sf_dir):
    """THREE-covariate Cox proportional hazards (operators/stats.
    cox_ph at p=3 — the natural-order Gaussian-elimination solve path,
    which p=2's Cramer form never exercises) on a triply-planted
    design over events: time stretched by user parity, event_id % 3
    AND user_id % 5, so all three covariates carry true negative log
    hazard ratios and the p>=3 solve must adjust each for the other
    two. Same machinery as m_cox_multi (cell collapse, per-round
    suffix RANGE ladder, 1-row fold, driver-side model-sized solve);
    the oracle unrolls the elimination with its fixed pivot order
    (i11, m11, q22) term-for-term — the replayability that motivated
    choosing natural order over partial pivoting."""
    from pandasvcf_spark.operators.stats import cox_ph

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_id").isNotNull()
    )
    b = e.select(
        (
            F.col("value")
            * (1 + 0.5 * (F.col("user_id") % 2))
            * (1 + 0.2 * (F.col("event_id") % 3))
            * (1 + 0.1 * (F.col("user_id") % 5))
        ).alias("t"),
        F.when(F.col("event_id") % 4 != 0, 1).otherwise(0).alias("e"),
        (F.col("user_id") % 2).cast("double").alias("x1"),
        (F.col("event_id") % 3).cast("double").alias("x2"),
        (F.col("user_id") % 5).cast("double").alias("x3"),
    )
    return cox_ph(b, "t", "e", ["x1", "x2", "x3"], iters=5)


@register(
    "e_holt_linear",
    oracle="""
    WITH RECURSIVE b AS (
      SELECT user_id AS key, event_id, value AS x
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
    ser AS (
      SELECT key,
        row_number() OVER (PARTITION BY key ORDER BY event_id) AS i,
        CAST(x AS DOUBLE) AS x
      FROM b),
    nn AS (SELECT key, CAST(count(*) AS BIGINT) AS n_events
           FROM ser GROUP BY key),
    step AS (
      SELECT s2.key, 2 AS i, s2.x AS l, s2.x - s1.x AS tr
      FROM ser s1 JOIN ser s2
        ON s1.key = s2.key AND s1.i = 1 AND s2.i = 2
      UNION ALL
      SELECT st.key, st.i + 1,
        CAST(0.4 AS DOUBLE) * sx.x
          + CAST(0.6 AS DOUBLE) * (st.l + st.tr),
        CAST(0.3 AS DOUBLE)
          * (CAST(0.4 AS DOUBLE) * sx.x
             + CAST(0.6 AS DOUBLE) * (st.l + st.tr) - st.l)
          + CAST(0.7 AS DOUBLE) * st.tr
      FROM step st JOIN ser sx
        ON sx.key = st.key AND sx.i = st.i + 1),
    fin AS (
      SELECT step.key, l, tr FROM step
      JOIN nn ON step.key = nn.key AND step.i = nn.n_events)
    SELECT nn.key, nn.n_events,
      round(fin.l, 4) + 0.0 AS level,
      round(fin.tr, 4) + 0.0 AS trend,
      round(fin.l + fin.tr, 4) + 0.0 AS forecast
    FROM nn LEFT JOIN fin ON nn.key = fin.key
    """,
)
def e_holt_linear(spark, sf_dir):
    """Per-user Holt linear-trend smoothing (operators/relational.
    holt_linear_last, α=0.4 β=0.3) over each user's event-value series
    ordered by event_id — ewma_last upgraded with a trend state: one
    collect + one struct-accumulator HOF fold per key. The oracle
    replays the identical fold via list_reduce with a prepended init
    struct (every literal CAST to DOUBLE — DECIMAL inference would
    drift)."""
    from pandasvcf_spark.operators.relational import holt_linear_last

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    return holt_linear_last(
        e.select(F.col("user_id"), F.col("event_id"), F.col("value")),
        "user_id", ["event_id"], "value", alpha=0.4, beta=0.3,
    )


@register(
    "e_croston",
    oracle="""
    WITH b AS (
      SELECT user_id AS key, event_id, floor(value / 300) AS x
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
    pos AS (
      SELECT key,
        CAST(row_number() OVER (PARTITION BY key ORDER BY event_id)
          AS DOUBLE) AS p,
        CAST(x AS DOUBLE) AS x
      FROM b),
    per AS (
      SELECT key, CAST(count(*) AS BIGINT) AS n_periods,
        list({'p': p, 'x': x} ORDER BY p) FILTER (WHERE x <> 0)
          AS dem
      FROM pos GROUP BY key),
    lists AS (
      SELECT key, n_periods,
        CAST(coalesce(len(dem), 0) AS BIGINT) AS n_demands,
        list_transform(dem, e -> e.x) AS zs,
        list_transform(generate_series(1, len(dem)),
          i -> dem[i].p - CASE WHEN i = 1 THEN CAST(0.0 AS DOUBLE)
                               ELSE dem[i - 1].p END) AS qs
      FROM per),
    f AS (
      SELECT key, n_periods, n_demands,
        CASE WHEN n_demands > 0 THEN
          list_reduce(zs, (acc, x) ->
            CAST(0.2 AS DOUBLE) * x + CAST(0.8 AS DOUBLE) * acc)
        END AS z_hat,
        CASE WHEN n_demands > 0 THEN
          list_reduce(qs, (acc, x) ->
            CAST(0.2 AS DOUBLE) * x + CAST(0.8 AS DOUBLE) * acc)
        END AS q_hat
      FROM lists)
    SELECT key, n_periods, n_demands,
      round(z_hat, 4) + 0.0 AS z_hat,
      round(q_hat, 4) + 0.0 AS q_hat,
      round(z_hat / q_hat, 4) + 0.0 AS forecast
    FROM f
    """,
)
def e_croston(spark, sf_dir):
    """Croston intermittent-demand forecast (operators/relational.
    croston_forecast, α=0.2) per user over the sparse demand series
    floor(value/300) ordered by event_id (~mostly zeros — exactly the
    regime plain EWMA chases): separate EWMA folds of nonzero demand
    sizes and inter-demand intervals, forecast = ratio. The oracle
    replays the rank positions, both list_reduce folds and the cold-
    start first-interval convention."""
    from pandasvcf_spark.operators.relational import croston_forecast

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    b = e.select(
        F.col("user_id"),
        F.col("event_id"),
        F.floor(F.col("value") / 300).alias("demand"),
    )
    return croston_forecast(
        b, "user_id", ["event_id"], "demand", alpha=0.2
    )


@register(
    "m_iv_wald",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS z,
        CAST(CASE WHEN (user_id * 2654435761) % 100
               < 20 + 50 * (user_id % 2) THEN 1 ELSE 0 END AS DOUBLE)
          AS t,
        value AS y0
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
    c AS (SELECT z, t, y0 + 20.0 * t AS y FROM b),
    g AS (SELECT
        CAST(sum(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        CAST(sum(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        sum(CASE WHEN z = 0 THEN y ELSE 0.0 END) AS sy0,
        sum(CASE WHEN z = 0 THEN y * y ELSE 0.0 END) AS syy0,
        sum(CASE WHEN z = 0 THEN t ELSE 0.0 END) AS st0,
        sum(CASE WHEN z = 0 THEN t * t ELSE 0.0 END) AS stt0,
        sum(CASE WHEN z = 0 THEN y * t ELSE 0.0 END) AS syt0,
        sum(CASE WHEN z = 1 THEN y ELSE 0.0 END) AS sy1,
        sum(CASE WHEN z = 1 THEN y * y ELSE 0.0 END) AS syy1,
        sum(CASE WHEN z = 1 THEN t ELSE 0.0 END) AS st1,
        sum(CASE WHEN z = 1 THEN t * t ELSE 0.0 END) AS stt1,
        sum(CASE WHEN z = 1 THEN y * t ELSE 0.0 END) AS syt1
      FROM c),
    mm AS (SELECT n0, n1,
        sy1 / n1 - sy0 / n0 AS itt,
        st1 / n1 - st0 / n0 AS fs,
        (syy1 - n1 * (sy1 / n1) * (sy1 / n1)) / (n1 - 1) / n1
          + (syy0 - n0 * (sy0 / n0) * (sy0 / n0)) / (n0 - 1) / n0
          AS v_itt,
        (stt1 - n1 * (st1 / n1) * (st1 / n1)) / (n1 - 1) / n1
          + (stt0 - n0 * (st0 / n0) * (st0 / n0)) / (n0 - 1) / n0
          AS v_fs,
        (syt1 - n1 * (sy1 / n1) * (st1 / n1)) / (n1 - 1) / n1
          + (syt0 - n0 * (sy0 / n0) * (st0 / n0)) / (n0 - 1) / n0
          AS c_cross
      FROM g)
    SELECT n0, n1,
      round(CASE WHEN n0 >= 2 AND n1 >= 2 THEN itt END, 6) + 0.0
        AS itt,
      round(CASE WHEN n0 >= 2 AND n1 >= 2 THEN fs END, 6) + 0.0 AS fs,
      round(CASE WHEN n0 >= 2 AND n1 >= 2 AND fs <> 0
        THEN itt / fs END, 6) + 0.0 AS late,
      round(CASE WHEN n0 >= 2 AND n1 >= 2 AND fs <> 0
        THEN sqrt(v_itt + (itt / fs) * (itt / fs) * v_fs
                  - 2 * (itt / fs) * c_cross) / abs(fs) END, 6) + 0.0
        AS se
    FROM mm
    """,
)
def m_iv_wald(spark, sf_dir):
    """Binary-instrument Wald/LATE estimator (operators/stats.iv_wald)
    on a planted encouragement design over events: instrument = user
    parity, take-up = a deterministic hash threshold shifted 50 points
    by the instrument, outcome = value + 20·t. The point estimate
    lands on the planted 20 up to the finite-sample parity imbalance
    of the synthetic value baseline (measured ~16.3 with se ~1.9 at
    sf0.01 — within 2 SE, which is exactly what the delta-method SE is
    quantifying). ONE 12-counter conditional pass + a 1-row fold; the
    oracle replays every moment and the delta-method arithmetic."""
    from pandasvcf_spark.operators.stats import iv_wald

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    t = F.when(
        (F.col("user_id") * 2654435761) % 100
        < 20 + 50 * (F.col("user_id") % 2),
        1,
    ).otherwise(0).cast("double")
    b = e.select(
        (F.col("user_id") % 2).cast("int").alias("z"),
        t.alias("t"),
        (F.col("value") + F.lit(20.0) * t).alias("y"),
    )
    return iv_wald(b, "z", "t", "y")


@register(
    "m_event_study",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS t,
        CAST((user_id * 40503) % 7 AS INTEGER) - 3 AS k,
        value
          + CASE WHEN user_id % 2 = 1
                  AND CAST((user_id * 40503) % 7 AS INTEGER) - 3 >= 0
             THEN CAST(25.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
          AS y
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
    cells AS (SELECT t, k, CAST(count(*) AS BIGINT) AS n,
        avg(y) AS m, sum(y * y) AS q
      FROM b GROUP BY t, k),
    cv AS (SELECT t, k, n, m,
        CASE WHEN n >= 2 THEN (q - n * m * m) / (n - 1) END AS v
      FROM cells),
    bs AS (SELECT t, n AS nb, m AS mb, v AS vb FROM cv WHERE k = -1),
    j AS (SELECT cv.t, cv.k, cv.n, cv.m, cv.v, bs.nb, bs.mb, bs.vb
          FROM cv JOIN bs USING (t) WHERE cv.k <> -1),
    piv AS (SELECT k,
        max(CASE WHEN t = 1 THEN n END) AS n_treat,
        max(CASE WHEN t = 0 THEN n END) AS n_ctrl,
        max(CASE WHEN t = 1 THEN m END) AS m1,
        max(CASE WHEN t = 0 THEN m END) AS m0,
        max(CASE WHEN t = 1 THEN v END) AS v1,
        max(CASE WHEN t = 0 THEN v END) AS v0,
        max(CASE WHEN t = 1 THEN mb END) AS mb1,
        max(CASE WHEN t = 0 THEN mb END) AS mb0,
        max(CASE WHEN t = 1 THEN vb END) AS vb1,
        max(CASE WHEN t = 0 THEN vb END) AS vb0,
        max(CASE WHEN t = 1 THEN nb END) AS nb1,
        max(CASE WHEN t = 0 THEN nb END) AS nb0
      FROM j GROUP BY k)
    SELECT CAST(k AS INTEGER) AS period,
      CAST(coalesce(n_treat, 0) AS BIGINT) AS n_treat,
      CAST(coalesce(n_ctrl, 0) AS BIGINT) AS n_ctrl,
      round(CASE WHEN n_treat IS NOT NULL AND n_ctrl IS NOT NULL
          AND nb1 IS NOT NULL AND nb0 IS NOT NULL
        THEN (m1 - mb1) - (m0 - mb0) END, 6) + 0.0 AS effect,
      round(CASE WHEN n_treat IS NOT NULL AND n_ctrl IS NOT NULL
          AND nb1 IS NOT NULL AND nb0 IS NOT NULL
        THEN sqrt(v1 / n_treat + vb1 / nb1 + v0 / n_ctrl + vb0 / nb0)
        END, 6) + 0.0 AS se
    FROM piv
    """,
)
def m_event_study(spark, sf_dir):
    """Event-study leads-and-lags (operators/stats.event_study) on a
    planted dynamic design over events: treat = user parity, relative
    period = a 7-residue hash in [-3, 3], outcome jumps 25 for treated
    post-periods — so pre-period effects read ≈0 (the parallel-trends
    diagnostic) and post-periods ≈25. One (treat, period) partial agg
    + a broadcast of the k=-1 reference cells; the oracle replays the
    cells, the base join and every per-period closed form."""
    from pandasvcf_spark.operators.stats import event_study

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    k = ((F.col("user_id") * 40503) % 7).cast("int") - 3
    b = e.select(
        (F.col("user_id") % 2).cast("int").alias("t"),
        k.alias("k"),
        (
            F.col("value")
            + F.when(
                ((F.col("user_id") % 2) == 1) & (k >= 0),
                F.lit(25.0),
            ).otherwise(F.lit(0.0))
        ).alias("y"),
    )
    return event_study(b, "t", "k", "y")


@register(
    "m_rdd",
    oracle="""
    WITH b AS (
      SELECT value AS x,
        0.5 * value
          + CASE WHEN value >= 50.0 THEN CAST(30.0 AS DOUBLE)
                 ELSE CAST(0.0 AS DOUBLE) END
          + CAST((user_id * 2654435761) % 11 AS DOUBLE) AS y
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
        AND value >= 50.0 - 40.0 AND value <= 50.0 + 40.0),
    c AS (SELECT x - 50.0 AS x, y,
                 CASE WHEN x >= 50.0 THEN 1 ELSE 0 END AS s
          FROM b),
    g AS (SELECT
        CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nl,
        CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nr,
        sum(CASE WHEN s = 0 THEN x ELSE 0.0 END) AS sxl,
        sum(CASE WHEN s = 0 THEN x * x ELSE 0.0 END) AS sxxl,
        sum(CASE WHEN s = 0 THEN y ELSE 0.0 END) AS syl,
        sum(CASE WHEN s = 0 THEN y * y ELSE 0.0 END) AS syyl,
        sum(CASE WHEN s = 0 THEN x * y ELSE 0.0 END) AS sxyl,
        sum(CASE WHEN s = 1 THEN x ELSE 0.0 END) AS sxr,
        sum(CASE WHEN s = 1 THEN x * x ELSE 0.0 END) AS sxxr,
        sum(CASE WHEN s = 1 THEN y ELSE 0.0 END) AS syr,
        sum(CASE WHEN s = 1 THEN y * y ELSE 0.0 END) AS syyr,
        sum(CASE WHEN s = 1 THEN x * y ELSE 0.0 END) AS sxyr
      FROM c),
    o AS (SELECT nl, nr,
        (sxyl - nl * (sxl / nl) * (syl / nl))
          / (sxxl - nl * (sxl / nl) * (sxl / nl)) AS bl,
        (sxyr - nr * (sxr / nr) * (syr / nr))
          / (sxxr - nr * (sxr / nr) * (sxr / nr)) AS br,
        sxl / nl AS mxl, syl / nl AS myl,
        sxr / nr AS mxr, syr / nr AS myr,
        sxxl - nl * (sxl / nl) * (sxl / nl) AS ssxl,
        sxxr - nr * (sxr / nr) * (sxr / nr) AS ssxr,
        syyl - nl * (syl / nl) * (syl / nl) AS ssyl,
        syyr - nr * (syr / nr) * (syr / nr) AS ssyr,
        sxyl - nl * (sxl / nl) * (syl / nl) AS ssxyl,
        sxyr - nr * (sxr / nr) * (syr / nr) AS ssxyr
      FROM g),
    fin AS (SELECT nl, nr, bl, br,
        (myr - br * mxr) - (myl - bl * mxl) AS tau,
        sqrt(
          ((ssyl - bl * ssxyl) / (nl - 2))
            * (1.0 / nl + mxl * mxl / ssxl)
          + ((ssyr - br * ssxyr) / (nr - 2))
            * (1.0 / nr + mxr * mxr / ssxr)) AS se
      FROM o)
    SELECT nl AS n_left, nr AS n_right,
      round(CASE WHEN nl >= 3 AND nr >= 3 THEN tau END, 6) + 0.0
        AS tau,
      round(CASE WHEN nl >= 3 AND nr >= 3 THEN se END, 6) + 0.0 AS se,
      round(CASE WHEN nl >= 3 AND nr >= 3 THEN bl END, 6) + 0.0
        AS slope_left,
      round(CASE WHEN nl >= 3 AND nr >= 3 THEN br END, 6) + 0.0
        AS slope_right
    FROM fin
    """,
)
def m_rdd(spark, sf_dir):
    """Sharp regression discontinuity (operators/stats.rdd_sharp) on a
    planted threshold design over events: running variable = value,
    cutoff 50, bandwidth 40, outcome = 0.5·x + 30·1(x ≥ 50) +
    deterministic hash noise — the estimator must recover tau ≈ 30
    with near-equal slopes. ONE 12-counter conditional pass over the
    bandwidth window + 1-row OLS closed forms per side; the oracle
    replays every moment, both regressions and the intercept-variance
    arithmetic."""
    from pandasvcf_spark.operators.stats import rdd_sharp

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    b = e.select(
        F.col("value").alias("x"),
        (
            F.lit(0.5) * F.col("value")
            + F.when(F.col("value") >= 50.0, F.lit(30.0)).otherwise(
                F.lit(0.0)
            )
            + ((F.col("user_id") * 2654435761) % 11).cast("double")
        ).alias("y"),
    )
    return rdd_sharp(b, "x", "y", cutoff=50.0, bandwidth=40.0)


@register(
    "m_kuiper",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS f, round(value, 0) AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    cells AS (SELECT v,
        CAST(sum(CASE WHEN f = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM b GROUP BY v),
    tot AS (SELECT CAST(sum(c0) AS BIGINT) AS n0,
                   CAST(sum(c1) AS BIGINT) AS n1 FROM cells),
    lad AS (SELECT
        CAST(sum(c0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS DOUBLE) / tot.n0
        - CAST(sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS DOUBLE) / tot.n1 AS gap,
        tot.n0 AS n0, tot.n1 AS n1
      FROM cells, tot),
    g AS (SELECT max(n0) AS n0, max(n1) AS n1,
          greatest(max(gap), CAST(0.0 AS DOUBLE)) AS dp,
          greatest(max(-gap), CAST(0.0 AS DOUBLE)) AS dm
          FROM lad),
    lamt AS (SELECT n0, n1, dp + dm AS v,
        (sqrt(CAST(n0 AS DOUBLE) * n1 / (n0 + n1)) + 0.155
         + 0.24 / sqrt(CAST(n0 AS DOUBLE) * n1 / (n0 + n1)))
          * (dp + dm) AS lam
      FROM g)
    SELECT n0, n1, round(v, 6) + 0.0 AS v,
      round(greatest(least(2.0 * list_sum(list_transform(
        generate_series(1, 100),
        k -> (4.0 * k * k * lam * lam - 1.0)
             * exp(-2.0 * k * k * lam * lam))), 1.0), 0.0), 6)
        + 0.0 AS p_value
    FROM lamt
    """,
)
def m_kuiper(spark, sf_dir):
    """Two-sample Kuiper test (operators/stats.kuiper_2sample) of
    user-parity value distributions — the cyclic/tail-balanced member
    of the ECDF-ladder family: D+ + D− instead of sup|gap|, with the
    Numerical-Recipes lambda and the 100-term Kuiper series as a HOF
    fold the oracle replays term-for-term."""
    from pandasvcf_spark.operators.stats import kuiper_2sample

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    b = e.select(
        (F.col("user_id") % 2).cast("int").alias("f"),
        F.round("value", 0).alias("v"),
    )
    return kuiper_2sample(b, "f", "v")


@register(
    "m_anderson_darling",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS f, round(value, 0) AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    cells AS (SELECT v,
        CAST(sum(CASE WHEN f = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS c0,
        CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS c1
      FROM b GROUP BY v),
    tot AS (SELECT CAST(sum(c0) AS BIGINT) AS n0,
                   CAST(sum(c1) AS BIGINT) AS n1 FROM cells),
    lad AS (SELECT tot.n0 AS n0, tot.n1 AS n1, c0 + c1 AS l,
        coalesce(sum(c0 + c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
          PRECEDING AND 1 PRECEDING), 0.0) + (c0 + c1) / 2 AS ba,
        coalesce(sum(c0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
          PRECEDING AND 1 PRECEDING), 0.0) + c0 / 2 AS ma0,
        coalesce(sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
          PRECEDING AND 1 PRECEDING), 0.0) + c1 / 2 AS ma1
      FROM cells, tot),
    terms AS (SELECT n0, n1,
        (l / (n0 + n1)) * (CASE WHEN
            ba * ((n0 + n1) - ba) - (n0 + n1) * l / 4 > 0
          THEN (((n0 + n1) * ma0 - n0 * ba)
                  * ((n0 + n1) * ma0 - n0 * ba) / n0
              + ((n0 + n1) * ma1 - n1 * ba)
                  * ((n0 + n1) * ma1 - n1 * ba) / n1)
            / (ba * ((n0 + n1) - ba) - (n0 + n1) * l / 4)
          ELSE 0.0 END) AS term
      FROM lad),
    g AS (SELECT max(n0) AS n0, max(n1) AS n1, sum(term) AS s,
                 count(*) AS cells FROM terms)
    SELECT n0, n1,
      round(CASE WHEN n0 > 0 AND n1 > 0 AND cells > 1
        THEN CAST(n0 + n1 - 1 AS DOUBLE) / (n0 + n1) * s END, 6)
        + 0.0 AS a2
    FROM g
    """,
)
def m_anderson_darling(spark, sf_dir):
    """Two-sample Anderson-Darling statistic (operators/stats.
    anderson_darling_2samp; Scholz-Stephens midrank A²akN) of
    user-parity value distributions — the tail-weighted ECDF-ladder
    member: per-cell gaps divided by their binomial variance, so tail
    disagreement dominates. The oracle replays the midrank cumulative
    ladder and every per-cell term."""
    from pandasvcf_spark.operators.stats import anderson_darling_2samp

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    b = e.select(
        (F.col("user_id") % 2).cast("int").alias("f"),
        F.round("value", 0).alias("v"),
    )
    return anderson_darling_2samp(b, "f", "v")


@register(
    "m_cox_stuart",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(count(*) AS DOUBLE) AS v
      FROM events WHERE ts IS NOT NULL GROUP BY 1),
    rn AS (SELECT row_number() OVER (ORDER BY h) AS r,
                  count(*) OVER () AS n, v
           FROM hourly),
    m AS (SELECT CAST(ceil(CAST(max(n) AS DOUBLE) / 2) AS INTEGER)
                   AS m FROM rn),
    pairs AS (
      SELECT l.v AS x1, r2.v AS x2
      FROM (SELECT r + m.m AS k, v FROM rn, m
            WHERE r <= n - m.m) l
      JOIN (SELECT r AS k, v FROM rn) r2 USING (k)),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(sum(CASE WHEN x2 > x1 THEN 1 ELSE 0 END) AS BIGINT)
          AS s_plus,
        CAST(sum(CASE WHEN x2 < x1 THEN 1 ELSE 0 END) AS BIGINT)
          AS s_minus
      FROM pairs)
    SELECT n_pairs, s_plus, s_minus,
      round(CASE WHEN s_plus + s_minus > 0 THEN
        (CASE WHEN s_plus >= s_minus THEN 1.0 ELSE -1.0 END)
        * greatest((abs(CAST(s_plus AS DOUBLE)
                        - (s_plus + s_minus) / 2.0) - 0.5)
                   / sqrt((s_plus + s_minus) / 4.0),
                   CAST(0.0 AS DOUBLE))
        END, 6) + 0.0 AS z
    FROM g
    """,
)
def m_cox_stuart(spark, sf_dir):
    """Cox-Stuart trend test (operators/stats.cox_stuart) on the
    hourly event-count series — the sign-test triage beside
    m_mann_kendall's full Kendall grid: first half vs second half
    position-paired, continuity-corrected binomial z. The oracle
    replays the rollup, the rank/offset pairing join, and the z
    arithmetic."""
    from pandasvcf_spark.operators.stats import cox_stuart

    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("v"))
    return cox_stuart(hourly, "h", "v")


@register(
    "m_conover",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 3 AS INTEGER) AS g, round(value, 0) AS x
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    means AS (SELECT g, avg(x) AS m FROM b GROUP BY g),
    dev AS (SELECT b.g, abs(b.x - means.m) AS u
            FROM b JOIN means USING (g)),
    grid AS (SELECT g, u, CAST(count(*) AS DOUBLE) AS c
             FROM dev GROUP BY g, u),
    cells AS (SELECT u, sum(c) AS t FROM grid GROUP BY u),
    lad AS (SELECT u,
        coalesce(sum(t) OVER (ORDER BY u ROWS BETWEEN UNBOUNDED
          PRECEDING AND 1 PRECEDING), 0.0) + (t + 1) / 2 AS mr
      FROM cells),
    per_g AS (SELECT g, sum(c) AS ni,
        sum(c * mr * mr) AS si,
        sum(c * mr * mr * mr * mr) AS r4
      FROM grid JOIN lad USING (u) GROUP BY g),
    f AS (SELECT CAST(count(*) AS BIGINT) AS k,
        CAST(sum(ni) AS BIGINT) AS n,
        sum(si) AS stot, sum(r4) AS r4tot,
        sum(si * si / ni) AS ssq
      FROM per_g)
    SELECT k, n,
      round(CASE WHEN k >= 2 AND
          (r4tot - n * (stot / n) * (stot / n)) / (n - 1) > 0
        THEN (ssq - n * (stot / n) * (stot / n))
          / ((r4tot - n * (stot / n) * (stot / n)) / (n - 1)) END, 6)
        + 0.0 AS t
    FROM f
    """,
)
def m_conover(spark, sf_dir):
    """Conover squared-ranks K-sample variance test (operators/stats.
    conover_squared_ranks) across three user-residue groups — the rank
    scale test between ansari_bradley (two-sample) and fligner (normal
    scores): midranks of |x − group mean| squared and chi-squared. The
    oracle replays the group means, the deviation grid, the pooled
    midrank ladder and all three folds."""
    from pandasvcf_spark.operators.stats import conover_squared_ranks

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    b = e.select(
        (F.col("user_id") % 3).cast("int").alias("g"),
        F.round("value", 0).alias("x"),
    )
    return conover_squared_ranks(b, "g", "x")


@register(
    "m_wasserstein",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS f, round(value, 0) AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    cells AS (SELECT v,
        CAST(sum(CASE WHEN f = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM b GROUP BY v),
    tot AS (SELECT CAST(sum(c0) AS BIGINT) AS n0,
                   CAST(sum(c1) AS BIGINT) AS n1 FROM cells),
    lad AS (SELECT v,
        abs(CAST(sum(c0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS DOUBLE) / tot.n0
        - CAST(sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS DOUBLE) / tot.n1) AS gap,
        lead(v) OVER (ORDER BY v) AS nxt,
        tot.n0 AS n0, tot.n1 AS n1
      FROM cells, tot)
    SELECT max(n0) AS n0, max(n1) AS n1,
           round(coalesce(sum(CASE WHEN nxt IS NOT NULL
                 THEN gap * (nxt - v) END), 0.0), 6) + 0.0 AS w1
    FROM lad
    """,
)
def m_wasserstein(spark, sf_dir):
    """1-D earth mover's distance (operators/stats.wasserstein_1d)
    between the two user-parity value distributions — the
    drift metric that weights HOW FAR mass moves where m_ks_2sample's
    sup only sees the largest gap. Exact segment-weighted |F0-F1|
    fold over the merged distinct-value ladder; the oracle replays
    ladder, lead segments and the fold."""
    from pandasvcf_spark.operators.stats import wasserstein_1d

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    b = e.select(
        (F.col("user_id") % 2).cast("int").alias("f"),
        F.round("value", 0).alias("v"),
    )
    return wasserstein_1d(b, "f", "v")


@register(
    "m_ordinal_assoc",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 5 AS DOUBLE) AS x, round(value, 0) AS y
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n
              FROM b GROUP BY x, y),
    grid AS (SELECT
        CAST(coalesce(sum(CASE WHEN cb.y > ca.y
          THEN ca.n * cb.n END), 0) AS BIGINT) AS concordant,
        CAST(coalesce(sum(CASE WHEN cb.y < ca.y
          THEN ca.n * cb.n END), 0) AS BIGINT) AS discordant
      FROM cells ca JOIN cells cb ON cb.x > ca.x),
    tx AS (SELECT sum(t * (t - 1)) AS n1x2,
                  CAST(sum(t) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) AS r
           FROM (SELECT CAST(sum(n) AS DOUBLE) AS t
                 FROM cells GROUP BY x)),
    ty AS (SELECT CAST(count(*) AS BIGINT) AS c
           FROM (SELECT y FROM cells GROUP BY y)),
    g AS (SELECT * FROM grid, tx, ty)
    SELECT n, concordant, discordant,
      round(CASE WHEN concordant + discordant > 0
            THEN CAST(concordant - discordant AS DOUBLE)
                 / (concordant + discordant) END, 6) + 0.0 AS gamma,
      round(CASE WHEN CAST(n AS DOUBLE) * (n - 1) - n1x2 > 0
            THEN 2.0 * (concordant - discordant)
                 / (CAST(n AS DOUBLE) * (n - 1) - n1x2) END, 6)
        + 0.0 AS somers_dyx,
      round(CASE WHEN least(r, c) > 1 AND n > 0
            THEN 2.0 * least(r, c) * (concordant - discordant)
                 / (CAST(n AS DOUBLE) * n * (least(r, c) - 1.0))
            END, 6) + 0.0 AS tau_c
    FROM g
    """,
)
def m_ordinal_assoc(spark, sf_dir):
    """Goodman-Kruskal gamma + Somers' D + Stuart tau-c in one pass
    (operators/stats.ordinal_association) of user-bucket vs rounded
    value — the contingency-table ordinal family on the kendall_tau_b
    cell-grid device: the three statistics differ only in their 1-row
    denominators, so one broadcast grid fold prices all of them. The
    oracle replays grid, marginals and all three folds."""
    from pandasvcf_spark.operators.stats import ordinal_association

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    b = e.select(
        (F.col("user_id") % 5).cast("double").alias("x"),
        F.round("value", 0).alias("y"),
    )
    return ordinal_association(b, "x", "y")


@register(
    "m_harrell_c",
    oracle="""
    WITH b AS (
      SELECT round(value, 0) AS t,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS e,
             CAST(user_id % 20 AS DOUBLE) AS s
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
        AND user_id IS NOT NULL),
    cells AS (SELECT t, e, s, CAST(count(*) AS BIGINT) AS n
              FROM b GROUP BY t, e, s),
    grid AS (SELECT
        CAST(coalesce(sum(ca.n * cb.n), 0) AS BIGINT) AS n_pairs,
        CAST(coalesce(sum(CASE WHEN ca.s > cb.s
          THEN ca.n * cb.n END), 0) AS BIGINT) AS concordant,
        CAST(coalesce(sum(CASE WHEN ca.s = cb.s
          THEN ca.n * cb.n END), 0) AS BIGINT) AS tied
      FROM cells ca JOIN cells cb ON cb.t > ca.t AND ca.e = 1),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b)
    SELECT n, n_pairs, concordant, tied,
      round(CASE WHEN n_pairs > 0
            THEN (CAST(concordant AS DOUBLE) + 0.5 * tied) / n_pairs
            END, 6) + 0.0 AS c_index
    FROM grid, nn
    """,
)
def m_harrell_c(spark, sf_dir):
    """Harrell's concordance index (operators/stats.harrell_c) of a
    user-bucket risk score against click-event timing — THE ranking
    metric for survival/churn scores, on the same (time, event,
    score) cell-grid device as the rank family: permissible pairs are
    (early event, any later), concordant when the earlier failure
    carries the higher score, score ties at half credit. The oracle
    replays cells, grid and the rational C fold."""
    from pandasvcf_spark.operators.stats import harrell_c

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
    )
    b = e.select(
        F.round("value", 0).alias("t"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("e"),
        (F.col("user_id") % 20).cast("double").alias("s"),
    )
    return harrell_c(b, "t", "e", "s")


@register(
    "m_mann_kendall",
    oracle="""
    WITH hourly AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS DOUBLE) AS t,
             CAST(count(*) AS DOUBLE) AS v
      FROM events WHERE ts IS NOT NULL GROUP BY 1),
    cells AS (SELECT t, v, CAST(count(*) AS BIGINT) AS n
              FROM hourly GROUP BY t, v),
    sfold AS (SELECT CAST(coalesce(sum(
        CASE WHEN cb.v > ca.v THEN ca.n * cb.n
             WHEN cb.v < ca.v THEN -(ca.n * cb.n)
             ELSE 0 END), 0) AS BIGINT) AS s
      FROM cells ca JOIN cells cb ON cb.t > ca.t),
    ties AS (SELECT sum(tt * (tt - 1) * (2 * tt + 5)) AS tsum,
                    CAST(sum(tt) AS BIGINT) AS n
             FROM (SELECT CAST(sum(n) AS DOUBLE) AS tt
                   FROM cells GROUP BY v)),
    g AS (SELECT s, n,
        (CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - tsum) / 18.0
          AS var_s
      FROM sfold, ties)
    SELECT n, s, round(var_s, 4) AS var_s,
      round(CASE WHEN var_s > 0 THEN
        CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1) / sqrt(var_s)
             WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1) / sqrt(var_s)
             ELSE 0.0 END END, 6) + 0.0 AS z
    FROM g
    """,
)
def m_mann_kendall(spark, sf_dir):
    """Mann-Kendall monotone-trend test (operators/stats.mann_kendall)
    on the hourly event-count series — the nonparametric trend
    standard of monitoring statistics, computed as the kendall cell
    grid with time as x plus the tie-corrected variance and
    continuity-corrected z. The oracle replays the hourly rollup,
    grid sign fold, tie sum and z arithmetic."""
    from pandasvcf_spark.operators.stats import mann_kendall

    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("v"))
    b = hourly.select(
        F.unix_timestamp("h").cast("double").alias("t"), "v"
    )
    return mann_kendall(b, "t", "v")


@register(
    "m_grubbs",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                  AS DOUBLE) AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
      GROUP BY user_id),
    mom AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(v) AS m,
                   stddev_samp(v) AS sd FROM pu),
    dev AS (SELECT pu.v, mom.n, mom.m, mom.sd,
                   abs(pu.v - mom.m) AS d
            FROM pu, mom ORDER BY d DESC, v ASC LIMIT 1)
    SELECT n, round(v, 6) AS suspect,
           round(CASE WHEN n >= 3 AND sd > 0 THEN d / sd END, 6)
             + 0.0 AS g
    FROM dev
    """,
)
def m_grubbs(spark, sf_dir):
    """Grubbs' maximum-outlier test (operators/stats.grubbs_test) on
    per-user integer-cents spend totals — is the single biggest
    spender a statistical outlier under normality? One moment agg +
    one deterministic TakeOrdered(1) on the deviation (value
    tie-break). The oracle replays totals, moments and the top-1
    cut."""
    from pandasvcf_spark.operators.stats import grubbs_test

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    pu = e.groupBy("user_id").agg(
        F.sum(cents).cast("double").alias("v")
    )
    return grubbs_test(pu, "v")


@register(
    "m_js_binned",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS f, value AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM b),
    binned AS (SELECT f,
        CASE WHEN bounds.hi > bounds.lo THEN least(
          CAST(floor((v - bounds.lo)
               / ((bounds.hi - bounds.lo) / 20.0)) AS BIGINT),
          19) ELSE 0 END AS bin
      FROM b, bounds),
    hist AS (SELECT bin,
        CAST(sum(CASE WHEN f = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS h0,
        CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS h1
      FROM binned GROUP BY bin),
    tot AS (SELECT sum(h0) AS t0, sum(h1) AS t1 FROM hist),
    terms AS (SELECT tot.t0, tot.t1,
        (CASE WHEN h0 > 0 THEN (h0 / t0)
          * ln((h0 / t0) / ((h0 / t0 + h1 / t1) / 2.0)) ELSE 0 END
        + CASE WHEN h1 > 0 THEN (h1 / t1)
          * ln((h1 / t1) / ((h0 / t0 + h1 / t1) / 2.0)) ELSE 0 END)
        / 2.0 AS term
      FROM hist, tot)
    SELECT CAST(max(t0) AS BIGINT) AS n0, CAST(max(t1) AS BIGINT)
             AS n1,
           round(CASE WHEN max(t0) > 0 AND max(t1) > 0
                 THEN sum(term) END, 6) + 0.0 AS js
    FROM terms
    """,
)
def m_js_binned(spark, sf_dir):
    """Jensen-Shannon divergence over 20 global equal-width bins
    (operators/stats.js_divergence_binned) between the two user-parity
    CONTINUOUS value distributions — the numeric-feature companion of
    m_js_divergence (which compares categorical event-type masses).
    One bounds agg + one <=20-cell histogram + 1-row folds; the
    oracle replays binning and both KL terms."""
    from pandasvcf_spark.operators.stats import js_divergence_binned

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    b = e.select(
        (F.col("user_id") % 2).cast("int").alias("f"),
        F.col("value").alias("v"),
    )
    return js_divergence_binned(b, "f", "v", n_bins=20)


@register(
    "m_cvm_2sample",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS f, round(value, 0) AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    cells AS (SELECT v,
        CAST(sum(CASE WHEN f = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM b GROUP BY v),
    tot AS (SELECT CAST(sum(c0) AS BIGINT) AS n0,
                   CAST(sum(c1) AS BIGINT) AS n1 FROM cells),
    lad AS (SELECT (c0 + c1) * pow(
        CAST(sum(c0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS DOUBLE) / tot.n0
        - CAST(sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS DOUBLE) / tot.n1, 2) AS w,
        tot.n0 AS n0, tot.n1 AS n1
      FROM cells, tot)
    SELECT max(n0) AS n0, max(n1) AS n1,
      round(CASE WHEN max(n0) > 0 AND max(n1) > 0
            THEN CAST(max(n0) AS DOUBLE) * max(n1)
                 / pow(max(n0) + max(n1), 2) * sum(w) END, 6)
        + 0.0 AS t
    FROM lad
    """,
)
def m_cvm_2sample(spark, sf_dir):
    """Two-sample Cramér-von Mises (operators/stats.cvm_2sample) of
    the user-parity value distributions — the quadratic member
    completing the ECDF ladder triad beside m_ks_2sample (sup) and
    m_wasserstein (L1 area): each distinct value contributes
    count x gap² to the weighted L2. Same cell ladder, same single
    cumulative window; the oracle replays it cell-for-cell."""
    from pandasvcf_spark.operators.stats import cvm_2sample

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    b = e.select(
        (F.col("user_id") % 2).cast("int").alias("f"),
        F.round("value", 0).alias("v"),
    )
    return cvm_2sample(b, "f", "v")


@register(
    "m_ansari_bradley",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS f, round(value, 0) AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    cells AS (SELECT v, CAST(count(*) AS BIGINT) AS t,
        CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1
      FROM b GROUP BY v),
    tot AS (SELECT CAST(sum(t) AS BIGINT) AS N FROM cells),
    lad AS (SELECT t, t1, tot.N,
        CAST(coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
          PRECEDING AND 1 PRECEDING), 0) + 1 AS DOUBLE) AS a
      FROM cells, tot),
    sc AS (SELECT t, t1, N, a,
        a + t - 1 AS bb, floor((N + 1) / 2.0) AS m1
      FROM lad),
    runs AS (SELECT t, t1, N,
        (CASE WHEN least(bb, m1) >= a
          THEN (least(bb, m1) - a + 1) * (a + least(bb, m1)) / 2.0
          ELSE 0.0 END
        + CASE WHEN bb >= greatest(a, m1 + 1)
          THEN (bb - greatest(a, m1 + 1) + 1)
               * ((N + 1 - bb) + (N + 1 - greatest(a, m1 + 1))) / 2.0
          ELSE 0.0 END) AS rs
      FROM sc),
    g AS (SELECT
        CAST(sum(t - t1) AS BIGINT) AS n0,
        CAST(sum(t1) AS BIGINT) AS n1,
        CAST(max(N) AS DOUBLE) AS nd,
        sum(t1 * rs / t) AS ab,
        sum(rs) AS ssum,
        sum(t * (rs / t) * (rs / t)) AS ssq
      FROM runs)
    SELECT n0, n1, round(ab, 4) AS ab,
      round(CASE WHEN n0 > 0 AND n1 > 0 AND
            n0 * n1 * (ssq - nd * (ssum / nd) * (ssum / nd))
              / (nd * (nd - 1)) > 0
            THEN (ab - n1 * ssum / nd)
              / sqrt(n0 * n1 * (ssq - nd * (ssum / nd) * (ssum / nd))
                     / (nd * (nd - 1))) END, 6) + 0.0 AS z
    FROM g
    """,
)
def m_ansari_bradley(spark, sf_dir):
    """Ansari-Bradley rank scale test (operators/stats.ansari_bradley)
    of user-parity value DISPERSION — the two-sample nonparametric
    companion of m_levene/m_bartlett: pooled both-end scores with the
    run-average tie convention, closed-form arithmetic-series score
    sums per distinct-value cell (no raw-row rank window), and the
    tie-robust permutation moments. The oracle replays run starts,
    both series sums and the z fold."""
    from pandasvcf_spark.operators.stats import ansari_bradley

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    b = e.select(
        (F.col("user_id") % 2).cast("int").alias("f"),
        F.round("value", 0).alias("v"),
    )
    return ansari_bradley(b, "f", "v")


@register(
    "m_pettitt",
    oracle="""
    WITH hourly AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS DOUBLE) AS t,
             CAST(count(*) AS DOUBLE) AS v
      FROM events WHERE ts IS NOT NULL GROUP BY 1),
    vc AS (SELECT v, CAST(count(*) AS DOUBLE) AS c
           FROM hourly GROUP BY v),
    rk AS (SELECT v,
        coalesce(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
          PRECEDING AND 1 PRECEDING), 0) + (c + 1) / 2 AS r
      FROM vc),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM hourly),
    u AS (SELECT h.t, nn.n,
        2.0 * sum(rk.r) OVER (ORDER BY h.t ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW)
        - row_number() OVER (ORDER BY h.t) * (nn.n + 1.0) AS uu,
        row_number() OVER (ORDER BY h.t) AS i
      FROM hourly h JOIN rk ON rk.v = h.v, nn),
    best AS (SELECT n, t, abs(uu) AS k FROM u WHERE i < n
             ORDER BY abs(uu) DESC, t ASC LIMIT 1)
    SELECT n, round(t, 6) AS change_t, round(k, 4) + 0.0 AS k,
      round(CASE WHEN n >= 2 THEN least(
        2.0 * exp(-6.0 * k * k
          / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)),
        1.0) END, 6) + 0.0 AS p_value
    FROM best
    """,
)
def m_pettitt(spark, sf_dir):
    """Pettitt rank change-point test (operators/stats.pettitt_test)
    on the hourly event-count series — where did the level shift? The
    nonparametric partner of e_changepoint's mean-shift scan, using
    the rank identity U_t = 2 cumsum(r) - t(n+1) so ONE cumulative
    window prices every split point. Mid-ranks from the distinct-value
    ladder, earliest-t tie-break, the 2exp(-6K²/(n³+n²)) approximate
    p. The oracle replays ladder, U walk and the top-1 cut."""
    from pandasvcf_spark.operators.stats import pettitt_test

    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("v"))
    b = hourly.select(
        F.unix_timestamp("h").cast("double").alias("t"), "v"
    )
    return pettitt_test(b, "t", "v")


@register(
    "m_quade",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 5 AS INTEGER) AS blk, event_type AS k,
             CAST(count(*) AS DOUBLE) AS v
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2),
    pb AS (SELECT blk, max(v) - min(v) AS rng,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM b GROUP BY blk),
    meta AS (SELECT CAST(count(*) AS BIGINT) AS n,
                    CAST(max(cnt) AS BIGINT) AS k FROM pb),
    rc AS (SELECT rng, CAST(count(*) AS DOUBLE) AS c
           FROM pb GROUP BY rng),
    rq AS (SELECT rng,
        coalesce(sum(c) OVER (ORDER BY rng ROWS BETWEEN UNBOUNDED
          PRECEDING AND 1 PRECEDING), 0) + (c + 1) / 2 AS q
      FROM rc),
    blkq AS (SELECT pb.blk, rq.q FROM pb JOIN rq ON rq.rng = pb.rng),
    ranked AS (SELECT b.blk, b.k,
        rank() OVER (PARTITION BY b.blk ORDER BY b.v)
          + (count(*) OVER (PARTITION BY b.blk, b.v) - 1) / 2.0 AS r
      FROM b),
    s AS (SELECT ranked.k,
        blkq.q * (ranked.r - (meta.k + 1) / 2.0) AS s
      FROM ranked JOIN blkq ON blkq.blk = ranked.blk, meta),
    afold AS (SELECT sum(s * s) AS a FROM s),
    bfold AS (SELECT sum(sj * sj) / (SELECT n FROM meta) AS bb FROM
              (SELECT k, sum(s) AS sj FROM s GROUP BY k))
    SELECT (SELECT n FROM meta) AS n_blocks,
           (SELECT k FROM meta) AS k,
           round(CASE WHEN a - bb > 0
                 THEN ((SELECT n FROM meta) - 1.0) * bb / (a - bb)
                 END, 6) + 0.0 AS f
    FROM afold, bfold
    """,
)
def m_quade(spark, sf_dir):
    """Quade test (operators/stats.quade_test) on the m_friedman
    fixture (user-bucket blocks x event-type treatments, per-cell
    counts) — the block-weighted member completing the blocked-ranks
    family (friedman / page / cochrans_q): blocks with larger spread
    carry more weight via the rank of their range, priced on the
    distinct-range cell ladder rather than a blocks-sized window. The
    oracle replays ranges, both rank ladders, S_ij and the F fold."""
    from pandasvcf_spark.operators.stats import quade_test

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.groupBy(
        (F.col("user_id") % 5).cast("int").alias("blk"),
        F.col("event_type").alias("k"),
    ).agg(F.count(F.lit(1)).cast("double").alias("v"))
    return quade_test(d, "blk", "k", "v")


@register(
    "m_jarque_bera",
    oracle="""
    WITH b AS (
      SELECT round(value, 2) AS v FROM events WHERE value IS NOT NULL),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(v) AS s1, sum(v * v) AS s2,
                 sum(v * v * v) AS s3, sum(v * v * v * v) AS s4
          FROM b),
    m AS (SELECT n,
        s1 / n AS mu,
        s2 / n - (s1 / n) * (s1 / n) AS m2,
        s3 / n - 3 * (s1 / n) * s2 / n + 2 * pow(s1 / n, 3) AS m3,
        s4 / n - 4 * (s1 / n) * s3 / n
          + 6 * (s1 / n) * (s1 / n) * s2 / n - 3 * pow(s1 / n, 4)
          AS m4
      FROM g),
    f AS (SELECT n, m2,
        m3 / pow(m2, 1.5) AS g1, m4 / (m2 * m2) - 3 AS g2
      FROM m)
    SELECT n,
      round(CASE WHEN n >= 2 AND m2 > 0 THEN g1 END, 6) + 0.0 AS skew,
      round(CASE WHEN n >= 2 AND m2 > 0 THEN g2 END, 6) + 0.0
        AS kurtosis,
      round(CASE WHEN n >= 2 AND m2 > 0
            THEN CAST(n AS DOUBLE) / 6 * (g1 * g1 + g2 * g2 / 4)
            END, 6) + 0.0 AS jb
    FROM f
    """,
)
def m_jarque_bera(spark, sf_dir):
    """Jarque-Bera normality screen (operators/stats.jarque_bera) on
    2dp-rounded event value — the moments-only gate run before the
    rank machinery (m_vdw / m_fligner assume little; this costs ONE
    power-sum pass). The oracle replays the four power sums, central
    moments and the chi-square fold; identical (biased-moment)
    convention on both sides."""
    from pandasvcf_spark.operators.stats import jarque_bera

    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return jarque_bera(e.select(F.round("value", 2).alias("v")), "v")


@register(
    "m_did",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS t,
             CASE WHEN hour(ts) >= 12 THEN 1 ELSE 0 END AS p,
             value AS y
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND value IS NOT NULL),
    g AS (SELECT
        CAST(sum(CASE WHEN t=0 AND p=0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n00,
        CAST(sum(CASE WHEN t=0 AND p=1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n01,
        CAST(sum(CASE WHEN t=1 AND p=0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n10,
        CAST(sum(CASE WHEN t=1 AND p=1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n11,
        sum(CASE WHEN t=0 AND p=0 THEN y ELSE 0 END) AS s00,
        sum(CASE WHEN t=0 AND p=1 THEN y ELSE 0 END) AS s01,
        sum(CASE WHEN t=1 AND p=0 THEN y ELSE 0 END) AS s10,
        sum(CASE WHEN t=1 AND p=1 THEN y ELSE 0 END) AS s11,
        sum(CASE WHEN t=0 AND p=0 THEN y*y ELSE 0 END) AS q00,
        sum(CASE WHEN t=0 AND p=1 THEN y*y ELSE 0 END) AS q01,
        sum(CASE WHEN t=1 AND p=0 THEN y*y ELSE 0 END) AS q10,
        sum(CASE WHEN t=1 AND p=1 THEN y*y ELSE 0 END) AS q11
      FROM b),
    f AS (SELECT n00, n01, n10, n11,
        (s11/n11 - s10/n10) - (s01/n01 - s00/n00) AS did,
        sqrt(((q00 - n00*(s00/n00)*(s00/n00))/(n00-1))/n00
           + ((q01 - n01*(s01/n01)*(s01/n01))/(n01-1))/n01
           + ((q10 - n10*(s10/n10)*(s10/n10))/(n10-1))/n10
           + ((q11 - n11*(s11/n11)*(s11/n11))/(n11-1))/n11) AS se
      FROM g)
    SELECT n00, n01, n10, n11,
      round(CASE WHEN n00>=2 AND n01>=2 AND n10>=2 AND n11>=2
            THEN did END, 6) + 0.0 AS did,
      round(CASE WHEN n00>=2 AND n01>=2 AND n10>=2 AND n11>=2
            THEN se END, 6) + 0.0 AS se,
      round(CASE WHEN n00>=2 AND n01>=2 AND n10>=2 AND n11>=2
                  AND se > 0
            THEN did / se END, 6) + 0.0 AS t
    FROM f
    """,
)
def m_did(spark, sf_dir):
    """Difference-in-differences (operators/stats.diff_in_diff) of
    user-parity value with afternoon as the post period — the 2x2
    canonical causal estimate (treated/control x pre/post), one
    partial-aggregated pass over the corpus for all four cells'
    moments + a 1-row fold. Expected ~0 on this synthetic split —
    the honest A/A shape. The oracle replays cells, means, the
    unequal-variance SE and t."""
    from pandasvcf_spark.operators.stats import diff_in_diff

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    b = e.select(
        (F.col("user_id") % 2).cast("int").alias("t"),
        F.when(F.hour("ts") >= 12, 1).otherwise(0).alias("p"),
        F.col("value").alias("y"),
    )
    return diff_in_diff(b, "t", "p", "y")


@register(
    "m_stratified_ate",
    oracle="""
    WITH b AS (
      SELECT event_type AS s, CAST(user_id % 2 AS INTEGER) AS t,
             value AS y
      FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        AND value IS NOT NULL),
    cells AS (SELECT s, t, CAST(count(*) AS DOUBLE) AS n,
                     avg(y) AS m, sum(y * y) AS q
              FROM b GROUP BY s, t),
    strat AS (SELECT s, sum(n) AS ns,
        max(CASE WHEN t = 1 THEN n END) AS n1,
        max(CASE WHEN t = 0 THEN n END) AS n0,
        max(CASE WHEN t = 1 THEN m END) AS m1,
        max(CASE WHEN t = 0 THEN m END) AS m0,
        max(CASE WHEN t = 1 THEN q END) AS q1,
        max(CASE WHEN t = 0 THEN q END) AS q0
      FROM cells GROUP BY s),
    mk AS (SELECT *,
        (n1 IS NOT NULL AND n0 IS NOT NULL AND n1 >= 1 AND n0 >= 1)
          AS used,
        CASE WHEN n1 >= 2 THEN ((q1 - n1*m1*m1)/(n1-1))/n1
             ELSE 0.0 END AS v1,
        CASE WHEN n0 >= 2 THEN ((q0 - n0*m0*m0)/(n0-1))/n0
             ELSE 0.0 END AS v0
      FROM strat),
    g AS (SELECT
        CAST(count(*) AS BIGINT) AS n_strata,
        CAST(sum(CASE WHEN used THEN 1 ELSE 0 END) AS BIGINT)
          AS n_used,
        CAST(sum(CASE WHEN used THEN 0 ELSE 1 END) AS BIGINT)
          AS n_dropped,
        coalesce(sum(CASE WHEN used THEN ns END), 0.0) AS N,
        sum(CASE WHEN used THEN ns * (m1 - m0) END) AS wd,
        sum(CASE WHEN used THEN ns * ns * (v1 + v0) END) AS wv
      FROM mk)
    SELECT n_strata, n_used, n_dropped, CAST(N AS BIGINT) AS n,
      round(CASE WHEN n_used > 0 THEN wd / N END, 6) + 0.0 AS ate,
      round(CASE WHEN n_used > 0 THEN sqrt(wv) / N END, 6) + 0.0
        AS se
    FROM g
    """,
)
def m_stratified_ate(spark, sf_dir):
    """Post-stratification ATE (operators/stats.stratified_ate) of
    user-parity treatment on value, exactly matched within event-type
    strata — the causal-inference family's non-parametric member
    beside m_cuped (covariate adjustment) and m_did (parallel
    trends): per-stratum arm means weighted by stratum share, strata
    missing an arm EXCLUDED and counted (the overlap report). One
    (strata, arm) exchange; expected ~0 on this synthetic split. The
    oracle replays cells, overlap mask, weights and both folds."""
    from pandasvcf_spark.operators.stats import stratified_ate

    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    )
    b = e.select(
        F.col("event_type").alias("s"),
        (F.col("user_id") % 2).cast("int").alias("t"),
        F.col("value").alias("y"),
    )
    return stratified_ate(b, "t", "y", ["s"])


@register(
    "m_icc",
    oracle="""
    WITH b AS (
      SELECT user_id AS g, value AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    per_g AS (SELECT g, CAST(count(*) AS DOUBLE) AS n,
                     sum(v) AS s, sum(v * v) AS q
              FROM b GROUP BY g),
    g2 AS (SELECT CAST(sum(n) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) AS groups,
                  sum(s) AS ts, sum(q) AS tq,
                  sum(s * s / n) AS sb, sum(n * n) AS nn
           FROM per_g),
    f AS (SELECT n, groups,
        (sb - ts * ts / n) / (groups - 1.0) AS msb,
        (tq - sb) / (CAST(n AS DOUBLE) - groups) AS msw,
        (CAST(n AS DOUBLE) - nn / n) / (groups - 1.0) AS n0
      FROM g2)
    SELECT n, groups,
      round(CASE WHEN groups >= 2 AND n > groups
                  AND msb + (n0 - 1) * msw > 0 THEN msb END, 6)
        + 0.0 AS msb,
      round(CASE WHEN groups >= 2 AND n > groups
                  AND msb + (n0 - 1) * msw > 0 THEN msw END, 6)
        + 0.0 AS msw,
      round(CASE WHEN groups >= 2 AND n > groups
                  AND msb + (n0 - 1) * msw > 0
            THEN (msb - msw) / (msb + (n0 - 1) * msw) END, 6)
        + 0.0 AS icc
    FROM f
    """,
)
def m_icc(spark, sf_dir):
    """One-way random-effects ICC(1,1) (operators/stats.icc_oneway,
    Shrout & Fleiss case 1 with the unbalanced n0 correction) of
    event value within users — how much spend variance is BETWEEN
    users? The rater-reliability / repeated-measures member beside
    m_cronbach; one group-keyed moment agg + 1-row folds. The oracle
    replays moments, mean squares, n0 and the ICC fold."""
    from pandasvcf_spark.operators.stats import icc_oneway

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    return icc_oneway(
        e.select(F.col("user_id").alias("g"), F.col("value").alias("v")),
        "g",
        "v",
    )


@register(
    "m_hodges_lehmann",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS f, round(value, 0) AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    cells AS (SELECT f, v, CAST(count(*) AS BIGINT) AS n
              FROM b GROUP BY f, v),
    diffs AS (SELECT c1.v - c0.v AS d,
                     CAST(sum(c1.n * c0.n) AS BIGINT) AS w
              FROM cells c1 JOIN cells c0
                ON c1.f = 1 AND c0.f = 0
              GROUP BY c1.v - c0.v),
    tot AS (SELECT sum(w) AS wtot FROM diffs),
    lad AS (SELECT d,
        sum(w) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS cw, tot.wtot
      FROM diffs, tot),
    hl AS (SELECT min(CASE WHEN CAST(cw AS DOUBLE)
                        >= 0.5 * CAST(wtot AS DOUBLE)
                   THEN d END) AS hl FROM lad),
    nn AS (SELECT
        CAST(sum(CASE WHEN f = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM b)
    SELECT n0, n1,
      round(CASE WHEN n0 > 0 AND n1 > 0 THEN hl END, 6) + 0.0
        AS hl_shift
    FROM hl, nn
    """,
)
def m_hodges_lehmann(spark, sf_dir):
    """Two-sample Hodges-Lehmann shift (operators/stats.
    hodges_lehmann_shift) of user-parity value — the robust effect
    SIZE that belongs beside m_mann_whitney's test: the weighted
    type-1 median of all pairwise differences, computed on a cell
    grid carrying integer pair WEIGHTS (never raw pairs) with the
    max_grid tripwire. Expected ~0 on this synthetic split. The
    oracle replays cells, the weighted difference grid, the
    cumulative ladder and the median cut."""
    from pandasvcf_spark.operators.stats import hodges_lehmann_shift

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    b = e.select(
        (F.col("user_id") % 2).cast("int").alias("f"),
        F.round("value", 0).alias("v"),
    )
    return hodges_lehmann_shift(b, "f", "v")


@register(
    "m_weighted_kappa",
    oracle="""
    WITH b AS (
      SELECT CAST(CAST(floor(value) AS BIGINT) % 5 AS DOUBLE) AS a,
             CAST((CAST(floor(value) AS BIGINT)
                   + CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END) % 5
                  AS DOUBLE) AS bb
      FROM events
      WHERE value IS NOT NULL AND user_id IS NOT NULL),
    cells AS (SELECT a, bb, CAST(count(*) AS DOUBLE) AS c
              FROM b GROUP BY a, bb),
    tot AS (SELECT sum(c) AS n FROM cells),
    obs AS (SELECT sum(c * (a - bb) * (a - bb)) AS o FROM cells),
    ma AS (SELECT a, sum(c) AS na FROM cells GROUP BY a),
    mb AS (SELECT bb, sum(c) AS nb FROM cells GROUP BY bb),
    ex AS (SELECT sum(ma.na * mb.nb * (ma.a - mb.bb) * (ma.a - mb.bb))
             AS e
           FROM ma, mb)
    SELECT CAST(tot.n AS BIGINT) AS n,
           round(obs.o / tot.n, 6) + 0.0 AS obs_dis,
           round(ex.e / (tot.n * tot.n), 6) + 0.0 AS exp_dis,
           round(CASE WHEN ex.e / (tot.n * tot.n) > 0
                 THEN 1.0 - (obs.o / tot.n)
                      / (ex.e / (tot.n * tot.n)) END, 6) + 0.0
             AS kappa_w
    FROM tot, obs, ex
    """,
)
def m_weighted_kappa(spark, sf_dir):
    """Quadratic-weighted Cohen's kappa (operators/relational.
    weighted_kappa) between two derived ordinal ratings of each event
    (value quintile vs a user-shifted copy — mostly-agreeing by
    construction, the planted-signal fixture) — the ordinal upgrade
    of m_cohens_kappa where near-misses cost less than far misses;
    the quadratic form equals the ICC on the ratings. Confusion cells
    in one exchange, label-sized marginal cross for E. The oracle
    replays cells, marginals and both disagreement folds."""
    from pandasvcf_spark.operators.relational import weighted_kappa

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    fl = F.floor("value").cast("long")
    b = e.select(
        (fl % 5).cast("double").alias("a"),
        (
            (fl + F.when(F.col("user_id") % 3 == 0, 1).otherwise(0)) % 5
        ).cast("double").alias("b"),
    )
    return weighted_kappa(b, "a", "b")


@register(
    "m_cohens_d",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS f, value AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    g AS (SELECT
        CAST(sum(CASE WHEN f = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        sum(CASE WHEN f = 0 THEN v ELSE 0 END) AS s0,
        sum(CASE WHEN f = 1 THEN v ELSE 0 END) AS s1,
        sum(CASE WHEN f = 0 THEN v * v ELSE 0 END) AS q0,
        sum(CASE WHEN f = 1 THEN v * v ELSE 0 END) AS q1
      FROM b),
    m AS (SELECT n0, n1, s1 / n1 - s0 / n0 AS md,
        ((q0 - n0 * (s0 / n0) * (s0 / n0))
         + (q1 - n1 * (s1 / n1) * (s1 / n1)))
        / (CAST(n0 AS DOUBLE) + n1 - 2) AS sp2
      FROM g)
    SELECT n0, n1,
      round(CASE WHEN n0 >= 1 AND n1 >= 1 THEN md END, 6) + 0.0
        AS mean_diff,
      round(CASE WHEN n0 >= 2 AND n1 >= 2 AND sp2 > 0
            THEN md / sqrt(sp2) END, 6) + 0.0 AS d,
      round(CASE WHEN n0 >= 2 AND n1 >= 2 AND sp2 > 0
            THEN md / sqrt(sp2)
                 * (1 - 3.0 / (4 * (CAST(n0 AS DOUBLE) + n1) - 9))
            END, 6) + 0.0 AS g
    FROM m
    """,
)
def m_cohens_d(spark, sf_dir):
    """Cohen's d + Hedges' g (operators/stats.cohens_d) of the
    user-parity value split — the standardized effect size every mean
    comparison must report beside m_welch_t's p-value; one conditional
    6-sum pass, expected ~0 on this A/A-shaped fixture. The oracle
    replays moments, pooled variance and the small-sample J
    correction."""
    from pandasvcf_spark.operators.stats import cohens_d

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    b = e.select(
        (F.col("user_id") % 2).cast("int").alias("f"),
        F.col("value").alias("v"),
    )
    return cohens_d(b, "f", "v")


def _poisson_round_sql(src: str, b: str, out_m: str, out_b: str) -> str:
    """One unrolled Poisson-IRLS round: log-link working weights
    (w = mu = exp(eta), eta clamped to +/-30) and working response
    z = eta + (y - mu)/mu, aggregated into weighted normal-equation
    sums over `src` with the 1-row beta table `b` (b0, b1, b2),
    solved by Cramer's rule into `out_b` — the _irls_round_sql device
    with the logit link swapped for the log link."""
    return f"""
    {out_m} AS (
      SELECT sum(w * 1.0) AS s00, sum(w * x1) AS s01,
             sum(w * x2) AS s02,
             sum(w * x1 * x1) AS s11, sum(w * x1 * x2) AS s12,
             sum(w * x2 * x2) AS s22,
             sum(w * z * 1.0) AS z0, sum(w * z * x1) AS z1,
             sum(w * z * x2) AS z2
      FROM (
        SELECT y, x1, x2, eta, mu, mu AS w,
               eta + (y - mu) / mu AS z
        FROM (
          SELECT y, x1, x2, eta, exp(eta) AS mu
          FROM (
            -- eta clamped into [-30, 30] (exp stays finite and the
            -- working division well-posed); -30.0/30.0 CAST so the
            -- clamp bound is the same double on both engines
            SELECT y, x1, x2,
                   greatest(CAST(-30.0 AS DOUBLE),
                            least(CAST(30.0 AS DOUBLE),
                                  {b}.b0 + {b}.b1 * x1 + {b}.b2 * x2))
                     AS eta
            FROM {src}, {b})))),
    {out_b} AS (
      SELECT
        (z0 * (s11 * s22 - s12 * s12)
         - s01 * (z1 * s22 - s12 * z2)
         + s02 * (z1 * s12 - s11 * z2)) / det AS b0,
        (s00 * (z1 * s22 - s12 * z2)
         - z0 * (s01 * s22 - s12 * s02)
         + s02 * (s01 * z2 - z1 * s02)) / det AS b1,
        (s00 * (s11 * z2 - z1 * s12)
         - s01 * (s01 * z2 - z1 * s02)
         + z0 * (s01 * s12 - s11 * s02)) / det AS b2
      FROM (SELECT *,
              s00 * (s11 * s22 - s12 * s12)
              - s01 * (s01 * s22 - s12 * s02)
              + s02 * (s01 * s12 - s11 * s02) AS det
            FROM {out_m}))"""


@register(
    "m_poisson",
    oracle=f"""
    WITH s AS (
      SELECT CAST(floor(value) AS DOUBLE) AS y,
             CAST(hour(ts) AS DOUBLE) AS x1,
             CAST(user_id % 7 AS DOUBLE) AS x2
      FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL
        AND user_id IS NOT NULL),
    bz AS (
      SELECT ln(greatest(sum(y) / count(*), 1e-10)) AS b0,
             0.0 AS b1, 0.0 AS b2
      FROM s),
    {_poisson_round_sql('s', 'bz', 'pm1', 'pbeta1')},
    {_poisson_round_sql('s', 'pbeta1', 'pm2', 'pbeta2')},
    nrow AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM s)
    SELECT '(intercept)' AS term, round(b0, 6) + 0.0 AS beta FROM pbeta2
    UNION ALL SELECT 'hour_of_day', round(b1, 6) + 0.0 FROM pbeta2
    UNION ALL SELECT 'user_mod7', round(b2, 6) + 0.0 FROM pbeta2
    UNION ALL SELECT '(n)', n FROM nrow
    """,
)
def m_poisson(spark, sf_dir):
    """Poisson regression of the integerized event value on hour-of-day
    and user_id%7 (operators/relational.poisson_fit) — the count-model
    third of the GLM trio (m_ols identity, m_logit logit, this log
    link): IRLS with a FIXED 2-iteration budget from the null-model
    warm start (intercept = ln(mean y)), so the entire optimization
    replays as an unrolled SQL oracle (the m_logit device with the
    link swapped). Each round is one partial-aggregated weighted-sums
    pass + a model-sized 3x3 solve; near-zero slopes expected on this
    synthetic corpus — the entry checks the optimizer, not the
    model."""
    from pandasvcf_spark.operators.relational import poisson_fit

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    )
    d = e.select(
        F.floor(F.col("value")).cast("double").alias("y"),
        F.hour("ts").cast("double").alias("hour_of_day"),
        (F.col("user_id") % 7).cast("double").alias("user_mod7"),
    )
    return poisson_fit(d, "y", ["hour_of_day", "user_mod7"], iters=2)


@register(
    "m_vif",
    oracle="""
    WITH s AS (
      SELECT CAST(hour(ts) AS DOUBLE) AS x1,
             CAST(user_id % 7 AS DOUBLE) AS x2,
             CAST(hour(ts) AS DOUBLE) + value / 10.0 AS x3
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND value IS NOT NULL),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(x1) AS s1, sum(x2) AS s2, sum(x3) AS s3,
             sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
             sum(x1 * x3) AS s13, sum(x2 * x2) AS s22,
             sum(x2 * x3) AS s23, sum(x3 * x3) AS s33
      FROM s),
    c AS (
      SELECT
        (n * s12 - s1 * s2)
          / sqrt((n * s11 - s1 * s1) * (n * s22 - s2 * s2)) AS r12,
        (n * s13 - s1 * s3)
          / sqrt((n * s11 - s1 * s1) * (n * s33 - s3 * s3)) AS r13,
        (n * s23 - s2 * s3)
          / sqrt((n * s22 - s2 * s2) * (n * s33 - s3 * s3)) AS r23
      FROM m),
    d AS (
      SELECT *,
             1.0 + 2.0 * r12 * r13 * r23
             - r12 * r12 - r13 * r13 - r23 * r23 AS det
      FROM c)
    SELECT 'hour_of_day' AS term,
           round((1.0 - r23 * r23) / det, 6) + 0.0 AS vif,
           round(1.0 - det / (1.0 - r23 * r23), 6) + 0.0 AS r2_aux
    FROM d
    UNION ALL
    SELECT 'user_mod7',
           round((1.0 - r13 * r13) / det, 6) + 0.0,
           round(1.0 - det / (1.0 - r13 * r13), 6) + 0.0
    FROM d
    UNION ALL
    SELECT 'hour_plus_value10',
           round((1.0 - r12 * r12) / det, 6) + 0.0,
           round(1.0 - det / (1.0 - r12 * r12), 6) + 0.0
    FROM d
    """,
)
def m_vif(spark, sf_dir):
    """Variance inflation factors (operators/stats.vif_screen) over a
    3-feature design with one DELIBERATELY collinear column
    (hour + value/10 shares hour's variance) — the pre-regression
    collinearity screen for m_ols/m_logit/m_poisson. VIF_j is the j-th
    diagonal of the inverse correlation matrix: ONE p²-sum pass, a
    model-sized 3x3 driver inverse. The oracle replays the same screen
    through the closed-form 3x3 inverse-diagonal identities
    (VIF_1 = (1-r23²)/det(R)); numpy-vs-closed-form agreement to 6dp
    holds because both act on the same exactly-replayed sums."""
    from pandasvcf_spark.operators.stats import vif_screen

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    )
    d = e.select(
        F.hour("ts").cast("double").alias("hour_of_day"),
        (F.col("user_id") % 7).cast("double").alias("user_mod7"),
        (F.hour("ts").cast("double") + F.col("value") / 10.0).alias(
            "hour_plus_value10"
        ),
    )
    return vif_screen(d, ["hour_of_day", "user_mod7", "hour_plus_value10"])


@register(
    "m_breusch_pagan",
    oracle="""
    WITH s AS (
      SELECT CAST(value AS DOUBLE) AS y,
             CAST(hour(ts) AS DOUBLE) AS x1,
             CAST(user_id % 7 AS DOUBLE) AS x2
      FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL
        AND user_id IS NOT NULL),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(x1) AS s1, sum(x2) AS s2,
             sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
             sum(x2 * x2) AS s22,
             sum(y) AS sy, sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
      FROM s),
    det AS (
      SELECT *,
             n * (s11 * s22 - s12 * s12)
             - s1 * (s1 * s22 - s12 * s2)
             + s2 * (s1 * s12 - s11 * s2) AS d0
      FROM m),
    beta AS (
      SELECT *,
             (sy * (s11 * s22 - s12 * s12)
              - s1 * (s1y * s22 - s12 * s2y)
              + s2 * (s1y * s12 - s11 * s2y)) / d0 AS b0,
             (n * (s1y * s22 - s12 * s2y)
              - sy * (s1 * s22 - s12 * s2)
              + s2 * (s1 * s2y - s1y * s2)) / d0 AS b1,
             (n * (s11 * s2y - s1y * s12)
              - s1 * (s1 * s2y - s1y * s2)
              + sy * (s1 * s12 - s11 * s2)) / d0 AS b2
      FROM det),
    aux AS (
      SELECT sum(u) AS su, sum(u * u) AS suu,
             sum(u * x1) AS u1, sum(u * x2) AS u2
      FROM (
        SELECT x1, x2,
               (y - (b.b0 + b.b1 * x1 + b.b2 * x2))
               * (y - (b.b0 + b.b1 * x1 + b.b2 * x2)) AS u
        FROM s, beta b)),
    ba AS (
      SELECT
        (su * (s11 * s22 - s12 * s12)
         - s1 * (u1 * s22 - s12 * u2)
         + s2 * (u1 * s12 - s11 * u2)) / d0 AS a0,
        (n * (u1 * s22 - s12 * u2)
         - su * (s1 * s22 - s12 * s2)
         + s2 * (s1 * u2 - u1 * s2)) / d0 AS a1,
        (n * (s11 * u2 - u1 * s12)
         - s1 * (s1 * u2 - u1 * s2)
         + su * (s1 * s12 - s11 * s2)) / d0 AS a2,
        n, su, suu, u1, u2
      FROM det, aux),
    fit AS (
      SELECT n,
             suu - (a0 * su + a1 * u1 + a2 * u2) AS ssr,
             suu - su * su / n AS sst
      FROM ba),
    lm AS (
      SELECT n,
             n * (CASE WHEN sst > 0
                  THEN 1.0 - ssr / sst ELSE 0.0 END) AS stat
      FROM fit)
    SELECT CAST(n AS BIGINT) AS n,
           round(stat, 4) + 0.0 AS lm_stat,
           2 AS df,
           round(exp(-stat / 2.0), 6) + 0.0 AS p_value
    FROM lm
    """,
)
def m_breusch_pagan(spark, sf_dir):
    """Breusch-Pagan heteroscedasticity LM test of the m_ols design
    (operators/stats.breusch_pagan): regress value on hour-of-day and
    user_id%7, then the squared residuals on the same X — LM = n.R²_aux
    ~ chi²(2), with the closed-form tail exp(-LM/2) the 2-regressor
    restriction buys. Two partial-aggregated passes (the second re-uses
    the first's X'X and injects beta as literals so the residual is
    pure arithmetic); both solves are model-sized. The oracle replays
    both stages through Cramer's rule."""
    from pandasvcf_spark.operators.stats import breusch_pagan

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    )
    d = e.select(
        F.col("value").cast("double").alias("y"),
        F.hour("ts").cast("double").alias("hour_of_day"),
        (F.col("user_id") % 7).cast("double").alias("user_mod7"),
    )
    return breusch_pagan(d, "y", ["hour_of_day", "user_mod7"])


@register(
    "m_chow",
    oracle="""
    WITH s AS (
      SELECT CAST(value AS DOUBLE) AS y,
             CAST(hour(ts) AS DOUBLE) AS x,
             CAST(user_id % 2 AS INT) AS g
      FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL
        AND user_id IS NOT NULL),
    m AS (
      SELECT g, CAST(count(*) AS DOUBLE) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy,
             sum(y * y) AS syy
      FROM s GROUP BY g),
    r AS (
      SELECT g, n, sx, sy, sxx, sxy, syy,
             (syy - sy * sy / n)
             - (sxy - sx * sy / n) * (sxy - sx * sy / n)
               / (sxx - sx * sx / n) AS ssr
      FROM m),
    w AS (
      SELECT
        sum(CASE WHEN g = 0 THEN n END) AS na,
        sum(CASE WHEN g = 1 THEN n END) AS nb,
        sum(ssr) AS ssr_s,
        sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy,
        sum(sxx) AS sxx, sum(sxy) AS sxy, sum(syy) AS syy
      FROM r),
    p AS (
      SELECT *,
             (syy - sy * sy / n)
             - (sxy - sx * sy / n) * (sxy - sx * sy / n)
               / (sxx - sx * sx / n) AS ssr_p
      FROM w)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(ssr_s, 4) + 0.0 AS ssr_split,
           round(ssr_p, 4) + 0.0 AS ssr_pooled,
           round(((ssr_p - ssr_s) / 2.0) / (ssr_s / (n - 4.0)), 6)
             + 0.0 AS f_stat,
           2 AS df1, CAST(n - 4 AS BIGINT) AS df2
    FROM p
    """,
)
def m_chow(spark, sf_dir):
    """Chow structural-break F test (operators/stats.chow_test) of the
    value~hour regression across the user-parity cohorts — do both
    halves share one (intercept, slope)? The parametric companion to
    m_pettitt/e_changepoint: everything is closed-form from per-regime
    moment sums, so the whole test is ONE 2-group aggregation + a
    2-row driver fold; no residuals materialize. Expected F ~ 1 on
    this A/A-shaped split — the entry checks the arithmetic, not the
    break. The oracle replays regime sums, per-regime SSRs and the
    pooled-vs-split F."""
    from pandasvcf_spark.operators.stats import chow_test

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    )
    d = e.select(
        F.col("value").cast("double").alias("y"),
        F.hour("ts").cast("double").alias("x"),
        (F.col("user_id") % 2).cast("int").alias("parity"),
    )
    return chow_test(d, "y", "x", "parity")


def _cox_strat_oracle(iters: int = 5) -> str:
    """Unrolled fixed-round Newton for the STRATIFIED two-covariate
    Cox model — `_cox_multi_oracle` with the risk-set ladder
    partitioned by stratum (cells key on (s, t, x1, x2); the suffix
    RANGE window gains PARTITION BY s; the score/information folds
    still sum across strata). Solve order matches cox_ph's p == 2
    Cramer closed form exactly."""
    head = """
    WITH b AS (
      SELECT value * (1 + 0.5 * (user_id % 2))
               * (1 + 0.3 * (length(event_type) % 4)) AS t,
        CASE WHEN event_id % 4 <> 0 THEN 1 ELSE 0 END AS e,
        CAST(user_id % 2 AS DOUBLE) AS x1,
        CAST(event_id % 3 AS DOUBLE) AS x2,
        event_type AS s
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
        AND event_id IS NOT NULL AND event_type IS NOT NULL),
    cells AS (
      SELECT s, t, x1, x2, CAST(count(*) AS DOUBLE) AS cnt,
        CAST(sum(e) AS DOUBLE) AS d
      FROM b GROUP BY s, t, x1, x2),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(e) AS BIGINT) AS n_events FROM b),
    bt0 AS (SELECT CAST(0.0 AS DOUBLE) AS b1,
                   CAST(0.0 AS DOUBLE) AS b2)"""
    parts = [head]
    for i in range(iters + 1):
        parts.append(f""",
    w{i} AS (SELECT c.s, c.t, c.x1, c.x2, c.d, bt.b1, bt.b2,
        c.cnt * exp(bt.b1 * c.x1 + bt.b2 * c.x2) AS w
      FROM cells c CROSS JOIN bt{i} bt),
    lad{i} AS (SELECT d, x1, x2, b1, b2,
        sum(w) OVER sfx AS s0,
        sum(w * x1) OVER sfx AS s1a,
        sum(w * x2) OVER sfx AS s1b,
        sum(w * x1 * x1) OVER sfx AS s2aa,
        sum(w * x1 * x2) OVER sfx AS s2ab,
        sum(w * x2 * x2) OVER sfx AS s2bb
      FROM w{i}
      WINDOW sfx AS (PARTITION BY s ORDER BY t DESC
        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    st{i} AS (SELECT max(b1) AS b1, max(b2) AS b2,
        sum(d * x1 - d * s1a / s0) AS u1,
        sum(d * x2 - d * s1b / s0) AS u2,
        sum(d * (s2aa / s0 - (s1a / s0) * (s1a / s0))) AS i11,
        sum(d * (s2ab / s0 - (s1a / s0) * (s1b / s0))) AS i12,
        sum(d * (s2bb / s0 - (s1b / s0) * (s1b / s0))) AS i22
      FROM lad{i} WHERE d > 0)""")
        if i < iters:
            parts.append(f""",
    bt{i + 1} AS (SELECT
        CASE WHEN (i11 * i22 - i12 * i12) > 0 AND i11 > 0
          THEN b1 + (u1 * i22 - u2 * i12) / (i11 * i22 - i12 * i12)
          ELSE b1 END AS b1,
        CASE WHEN (i11 * i22 - i12 * i12) > 0 AND i11 > 0
          THEN b2 + (u2 * i11 - u1 * i12) / (i11 * i22 - i12 * i12)
          ELSE b2 END AS b2
      FROM st{i})""")
    parts.append(f""",
    fin AS (SELECT b1, b2, i11, i12, i22,
                   i11 * i22 - i12 * i12 AS det FROM st{iters})
    SELECT v.covariate, tot.n, tot.n_events,
      round(CASE WHEN tot.n_events > 0 AND fin.det > 0 AND fin.i11 > 0
        THEN CASE v.covariate WHEN 'x1' THEN fin.b1 ELSE fin.b2 END
        END, 6) + 0.0 AS beta,
      round(CASE WHEN tot.n_events > 0 AND fin.det > 0 AND fin.i11 > 0
        THEN sqrt(CASE v.covariate WHEN 'x1' THEN fin.i22 / fin.det
                  ELSE fin.i11 / fin.det END)
        END, 6) + 0.0 AS se,
      round(CASE WHEN tot.n_events > 0 AND fin.det > 0 AND fin.i11 > 0
        THEN exp(CASE v.covariate WHEN 'x1' THEN fin.b1 ELSE fin.b2
                 END)
        END, 6) + 0.0 AS hr,
      round(CASE WHEN tot.n_events > 0 AND fin.det > 0 AND fin.i11 > 0
        THEN (CASE v.covariate WHEN 'x1' THEN fin.b1 ELSE fin.b2 END)
          / sqrt(CASE v.covariate WHEN 'x1' THEN fin.i22 / fin.det
                 ELSE fin.i11 / fin.det END)
        END, 6) + 0.0 AS z
    FROM (VALUES ('x1'), ('x2')) AS v(covariate)
    CROSS JOIN fin CROSS JOIN tot
    """)
    return "".join(parts)


@register("m_cox_strat", oracle=_cox_strat_oracle())
def m_cox_strat(spark, sf_dir):
    """STRATIFIED Cox proportional hazards (operators/stats.cox_ph
    with strata_col; Breslow ties, p = 2, 5 fixed Newton rounds) —
    event_type strata each get their own unconstrained baseline
    hazard (the fixture plants a stratum-dependent time stretch the
    shared-baseline m_cox_multi would have to absorb into beta),
    while both covariates' log hazard ratios are shared across
    strata. Risk sets form WITHIN strata: the suffix RANGE ladder is
    PARTITION BY stratum (better-parallel than the unstratified
    single ladder), the score/information folds sum across strata,
    and the p x p Newton system still solves driver-side. Oracle:
    the UNROLLED stratified optimization."""
    from pandasvcf_spark.operators.stats import cox_ph

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    b = e.select(
        (
            F.col("value")
            * (1 + 0.5 * (F.col("user_id") % 2))
            * (1 + 0.3 * (F.length("event_type") % 4))
        ).alias("t"),
        F.when(F.col("event_id") % 4 != 0, 1).otherwise(0).alias("e"),
        (F.col("user_id") % 2).cast("double").alias("x1"),
        (F.col("event_id") % 3).cast("double").alias("x2"),
        F.col("event_type").alias("stratum"),
    )
    return cox_ph(b, "t", "e", ["x1", "x2"], iters=5,
                  strata_col="stratum")


@register(
    "sk_f2_moment",
    oracle="""
    WITH k AS (
      SELECT CAST(user_id AS VARCHAR) AS kk,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
    sgn AS (
      SELECT r, kk, c,
             2 * (((list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(
                  CAST(r AS VARCHAR) || ':' || kk, ''),
                  c2 -> CAST(ascii(c2) AS BIGINT))),
                (acc, c2) -> (acc * 31 + c2) % 2147483647)
                * 2654435761) % 2147483647) % 2) - 1 AS sg
      FROM k, generate_series(0, 31) AS s(r)),
    sk AS (SELECT r, CAST(sum(sg * c) AS BIGINT) AS s
           FROM sgn GROUP BY r),
    ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2 FROM k)
    SELECT round(avg(CAST(s AS DOUBLE) * s), 2) + 0.0 AS f2_est,
           ex.f2 AS f2_exact,
           round(abs(avg(CAST(s AS DOUBLE) * s) - ex.f2)
                 / ex.f2, 4) + 0.0 AS rel_err
    FROM sk, ex
    GROUP BY ex.f2
    """,
)
def sk_f2_moment(spark, sf_dir):
    """AMS F2 (self-join-size / repeat-rate) sketch of events.user_id
    (operators/sketches.ams_f2_sketch + ams_f2_estimate, 32 estimator
    rows) beside the exact Σc² it approximates — the skew/join-size
    statistic in O(rows) space: signed per-key sums whose squared mean
    is unbiased for F2, mergeable cell-wise across shards like
    sk_hll/sk_countmin's grids. One data-sized groupBy to per-key
    counts; the 32-way explode runs over distinct keys only. The
    deterministic seeded sign hash makes the whole sketch — and the
    relative error it lands on — an exact SQL replay."""
    from pandasvcf_spark.operators.sketches import (
        ams_f2_estimate,
        ams_f2_sketch,
    )

    e = load(spark, sf_dir, "events")
    sk = ams_f2_sketch(e, "user_id", rows=32)
    est = ams_f2_estimate(sk)
    exact = (
        e.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_exact"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "f2_est",
        "f2_exact",
        (
            F.round(
                F.abs(F.col("f2_est") - F.col("f2_exact"))
                / F.col("f2_exact"),
                4,
            )
            + F.lit(0.0)
        ).alias("rel_err"),
    )


@register(
    "m_pr_points",
    oracle="""
    WITH b AS (
      SELECT round(value, 0) AS s,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    r AS (
      SELECT DISTINCT s,
             sum(y) OVER (ORDER BY s DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cp,
             sum(1 - y) OVER (ORDER BY s DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cn,
             sum(y) OVER () AS pp
      FROM b),
    m AS (
      SELECT s,
             CAST(cp AS DOUBLE) / (cp + cn) AS prec,
             CASE WHEN pp > 0 THEN CAST(cp AS DOUBLE) / pp END AS rec
      FROM r)
    SELECT s AS score,
           round(prec, 6) AS precision,
           round(rec, 6) AS recall,
           round(CASE WHEN prec + rec > 0
                 THEN 2.0 * prec * rec / (prec + rec) END, 6) AS f1
    FROM m ORDER BY score DESC
    """,
)
def m_pr_points(spark, sf_dir):
    """Full precision-recall curve at every distinct (integer-rounded)
    score threshold (operators/stats.pr_points): value predicting the
    'error' label — the imbalance-honest companion to m_roc_points,
    sharing its exact device (distinct-score cells first, cumulative
    ladder through the bucketed re-cut above 1M cells, integer counts
    → exact rational points). The oracle replays the ladders and the
    precision/recall/F1 arithmetic point-for-point."""
    from pandasvcf_spark.operators.stats import pr_points

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        F.round("value", 0).alias("s"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("y"),
    )
    return pr_points(d, "s", "y")


#: left-assoc first/second-season means for the HW oracle (m = 4)
_HW_M1 = "(w[1] + w[2] + w[3] + w[4]) / CAST(4.0 AS DOUBLE)"
_HW_M2 = "(w[5] + w[6] + w[7] + w[8]) / CAST(4.0 AS DOUBLE)"
_HW_LNEW = (
    "CAST(0.4 AS DOUBLE) * (w[t + 1] - s[i]) "
    "+ CAST(0.6 AS DOUBLE) * (l + b)"
)


@register(
    "e_holt_winters",
    oracle=f"""
    WITH RECURSIVE ser AS (
      SELECT user_id AS key,
             list(CAST(value AS DOUBLE) ORDER BY event_id) AS w
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
        AND event_id IS NOT NULL
      GROUP BY user_id),
    base AS (SELECT key, w, len(w) AS n FROM ser),
    st AS (
      SELECT key, w, n, 4 AS t,
        {_HW_M1} AS l,
        ({_HW_M2} - {_HW_M1}) / CAST(4.0 AS DOUBLE) AS b,
        [w[1] - {_HW_M1}, w[2] - {_HW_M1},
         w[3] - {_HW_M1}, w[4] - {_HW_M1}] AS s,
        1 AS i
      FROM base WHERE n >= 8
      UNION ALL
      SELECT key, w, n, t + 1,
        {_HW_LNEW},
        CAST(0.3 AS DOUBLE) * (({_HW_LNEW}) - l)
          + CAST(0.7 AS DOUBLE) * b,
        s[1:i-1]
          || [CAST(0.2 AS DOUBLE) * (w[t + 1] - l - b)
              + CAST(0.8 AS DOUBLE) * s[i]]
          || s[i+1:4],
        (i % 4) + 1
      FROM st WHERE t < n),
    fin AS (SELECT key, l, b, s, i FROM st WHERE t = n)
    SELECT b2.key, CAST(b2.n AS BIGINT) AS n_events,
           round(f.l, 4) + 0.0 AS level,
           round(f.b, 4) + 0.0 AS trend,
           round(f.l + f.b + f.s[f.i], 4) + 0.0 AS forecast
    FROM base b2 LEFT JOIN fin f USING (key)
    """,
)
def e_holt_winters(spark, sf_dir):
    """Per-user additive Holt-Winters final state (operators/
    relational.holt_winters_last; m = 4, alpha .4, beta .3, gamma .2)
    over each user's event_id-ordered values — the seasonal completion
    of the forecasting ladder (e_ewma → e_holt_linear → this): the HOF
    fold's struct accumulator carries (level, trend, season[4], index)
    and updates the season array by slice surgery, so the whole
    recursion is one column expression after one groupBy(key). Keys
    with < 2m observations emit NULL state (under-determined init)
    but keep their count. The oracle replays the recursion as a
    RECURSIVE CTE with a LIST state column, term-for-term."""
    from pandasvcf_spark.operators.relational import holt_winters_last

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_id").isNotNull()
    )
    return holt_winters_last(
        e, "user_id", ["event_id"], "value",
        m=4, alpha=0.4, beta=0.3, gamma=0.2,
    )


@register(
    "m_partial_corr",
    oracle="""
    WITH s AS (
      SELECT CAST(hour(ts) AS DOUBLE) AS x,
             CAST(value AS DOUBLE) AS y,
             CAST(user_id % 7 AS DOUBLE) AS z
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
        AND user_id IS NOT NULL),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(z * z) AS szz,
             sum(x * y) AS sxy, sum(x * z) AS sxz, sum(z * y) AS szy
      FROM s),
    c AS (
      SELECT n,
        (n * sxy - sx * sy)
          / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rxy,
        (n * sxz - sx * sz)
          / sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)) AS rxz,
        (n * szy - sz * sy)
          / sqrt((n * szz - sz * sz) * (n * syy - sy * sy)) AS rzy
      FROM m)
    SELECT CAST(n AS BIGINT) AS n,
           round(rxy, 6) + 0.0 AS r_xy,
           round((rxy - rxz * rzy)
                 / sqrt((1.0 - rxz * rxz) * (1.0 - rzy * rzy)), 6)
             + 0.0 AS r_partial
    FROM c
    """,
)
def m_partial_corr(spark, sf_dir):
    """First-order partial correlation of (hour-of-day, value)
    controlling for user_id%7 (operators/stats.partial_corr) — the
    common-driver screen beside m_spearman/m_kendall_tau: one 3x3
    moment pass (the vif_screen device), three pairwise correlations
    and the closed form as a 1-row fold. Near-equal r_xy and
    r_partial expected on this independent-by-construction fixture —
    the entry checks the partialling arithmetic. The oracle replays
    sums, correlations and the formula term-for-term."""
    from pandasvcf_spark.operators.stats import partial_corr

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
    )
    d = e.select(
        F.hour("ts").cast("double").alias("x"),
        F.col("value").cast("double").alias("y"),
        (F.col("user_id") % 7).cast("double").alias("z"),
    )
    return partial_corr(d, "x", "y", "z")


@register(
    "m_welch_anova",
    oracle="""
    WITH s AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL),
    gr AS (
      SELECT g, CAST(count(*) AS DOUBLE) AS n,
             avg(v) AS m, var_samp(v) AS s2
      FROM s GROUP BY g),
    tot AS (
      SELECT CAST(count(*) AS DOUBLE) AS k,
             sum(n / s2) AS W, sum(n / s2 * m) AS wm
      FROM gr),
    fold AS (
      SELECT max(k) AS k,
             sum(n / s2 * (m - wm / W) * (m - wm / W)) AS num,
             sum((1.0 - (n / s2) / W) * (1.0 - (n / s2) / W)
                 / (n - 1.0)) AS lam
      FROM gr, tot)
    SELECT CAST(k AS INT) AS k,
           round((num / (k - 1.0))
                 / (1.0 + 2.0 * (k - 2.0) / (k * k - 1.0) * lam), 6)
             + 0.0 AS f_stat,
           CAST(k - 1 AS BIGINT) AS df1,
           round((k * k - 1.0) / (3.0 * lam), 4) + 0.0 AS df2
    FROM fold
    """,
)
def m_welch_anova(spark, sf_dir):
    """Welch's heteroscedastic one-way ANOVA of value across the
    event_type groups (operators/stats.welch_anova) — the
    unequal-variance omnibus beside m_anova (pooled) and m_welch_t
    (2-group): one group-count-sized collapse to (n, mean, var), a
    1-row weight broadcast, one weighted fold. F ~ 1 expected on this
    A/A-shaped fixture. The oracle replays weights, the weighted
    grand mean, Λ and the Welch F/df2 arithmetic."""
    from pandasvcf_spark.operators.stats import welch_anova

    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return welch_anova(e, "event_type", "value")


@register(
    "m_dunn",
    oracle="""
    WITH b AS (
      SELECT round(value, 0) AS v, event_type AS k
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    tc AS (SELECT v, k, CAST(count(*) AS DOUBLE) AS n
           FROM b GROUP BY v, k),
    vc AS (SELECT v, sum(n) AS t FROM tc GROUP BY v),
    m AS (SELECT v, t,
            coalesce(sum(t) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + (t + 1.0) / 2.0 AS mr
          FROM vc),
    pt AS (SELECT k, sum(tc.n * m.mr) AS R, sum(tc.n) AS nk
           FROM tc JOIN m ON tc.v = m.v GROUP BY k),
    tot AS (SELECT sum(t) AS N, sum(t*t*t - t) AS tsum FROM vc)
    SELECT a.k AS treat_a, b2.k AS treat_b,
           CAST(a.nk AS BIGINT) AS n_a, CAST(b2.nk AS BIGINT) AS n_b,
           round(a.R / a.nk, 4) + 0.0 AS mr_a,
           round(b2.R / b2.nk, 4) + 0.0 AS mr_b,
           round(CASE WHEN N >= 2
                  AND (N * (N + 1.0) / 12.0
                       - tsum / (12.0 * (N - 1.0))) > 0
                 THEN (a.R / a.nk - b2.R / b2.nk)
                      / sqrt((N * (N + 1.0) / 12.0
                              - tsum / (12.0 * (N - 1.0)))
                             * (1.0 / a.nk + 1.0 / b2.nk))
                 END, 6) + 0.0 AS z
    FROM pt a JOIN pt b2 ON a.k < b2.k, tot
    """,
)
def m_dunn(spark, sf_dir):
    """Dunn's post-hoc pairwise rank comparisons across the five event
    types (operators/stats.dunn_test) — the WHICH-groups-differ
    follow-up to m_kruskal_wallis, sharing its exact collapse
    (distinct integer-rounded value cells, mid-rank ladder over cells
    only); the 10 pairs come from a self-join of the 5-row rank-sum
    table (model-sized, broadcast). Near-zero z expected on this
    A/A-shaped fixture. The oracle replays cells, mid-ranks, σ² with
    the tie correction, and every pair's z."""
    from pandasvcf_spark.operators.stats import dunn_test

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        F.round(F.col("value"), 0).alias("v"),
        F.col("event_type").alias("k"),
    )
    return dunn_test(d, "k", "v")


@register(
    "e_seasonal_mk",
    oracle="""
    WITH ser AS (
      SELECT hour(ts) AS g,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS DOUBLE)
               AS t,
             round(sum(value), 0) AS v
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY hour(ts), CAST(ts AS DATE)),
    cells AS (SELECT g, t, v, CAST(count(*) AS BIGINT) AS n
              FROM ser GROUP BY g, t, v),
    sf AS (
      SELECT CAST(coalesce(sum(CASE WHEN b.v > a.v THEN a.n * b.n
                       WHEN b.v < a.v THEN -(a.n * b.n)
                       ELSE 0 END), 0) AS BIGINT) AS s
      FROM cells a JOIN cells b
        ON a.g = b.g AND b.t > a.t),
    pg AS (
      SELECT g, sum(tt * (tt - 1) * (2 * tt + 5)) AS tsum,
             sum(tt) AS ng
      FROM (SELECT g, v, sum(n) AS tt FROM cells GROUP BY g, v)
      GROUP BY g),
    ties AS (
      SELECT sum((CAST(ng AS DOUBLE) * (CAST(ng AS DOUBLE) - 1)
                  * (2 * CAST(ng AS DOUBLE) + 5)
                  - CAST(tsum AS DOUBLE)) / 18.0) AS var_s,
             CAST(sum(ng) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_seasons
      FROM pg)
    SELECT n, n_seasons, s,
           round(var_s, 4) AS var_s,
           round(CASE WHEN var_s > 0 THEN
             CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1) / sqrt(var_s)
                  WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1) / sqrt(var_s)
                  ELSE 0.0 END END, 6) + 0.0 AS z
    FROM sf, ties
    """,
)
def e_seasonal_mk(spark, sf_dir):
    """Seasonal Mann-Kendall trend test (operators/stats.
    seasonal_mann_kendall) on the daily value totals with hour-of-day
    as the season — is there a monotone cross-day trend once the
    24-hour cycle is held fixed? The seasonality-honest upgrade of
    m_mann_kendall (which would confound the cycle with trend): S and
    the tie-corrected variance fold WITHIN each hour's day-series and
    sum. The series pre-aggregates to (hour, date) cells; values
    integer-round (the dense-value discipline). The oracle replays
    cells, the season-matched sign fold, per-season tie terms and the
    continuity-corrected z."""
    from pandasvcf_spark.operators.stats import seasonal_mann_kendall

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    ser = e.groupBy(
        F.hour("ts").alias("g"),
        F.to_date("ts").alias("__d"),
    ).agg(F.round(F.sum("value"), 0).alias("v"))
    ser = ser.select(
        "g",
        F.datediff(F.col("__d"), F.lit("2024-01-01")).cast("double")
        .alias("t"),
        "v",
    )
    return seasonal_mann_kendall(ser, "g", "t", "v")


@register(
    "m_ipw",
    oracle=f"""
    WITH s AS (
      SELECT CAST(user_id % 2 AS DOUBLE) AS y,
             CAST(hour(ts) AS DOUBLE) AS x1,
             CAST(event_id % 5 AS DOUBLE) AS x2,
             CAST(value AS DOUBLE) AS yo
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_id IS NOT NULL AND value IS NOT NULL),
    bz AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2),
    {_irls_round_sql('s', 'bz', 'im1', 'ibeta1')},
    {_irls_round_sql('s', 'ibeta1', 'im2', 'ibeta2')},
    br AS (SELECT round(b0, 6) + 0.0 AS b0, round(b1, 6) + 0.0 AS b1,
                  round(b2, 6) + 0.0 AS b2
           FROM ibeta2),
    w AS (
      SELECT s.y AS t, s.yo,
             greatest(CAST(0.01 AS DOUBLE),
                      least(CAST(0.99 AS DOUBLE),
                            1.0 / (1.0 + exp(-(br.b0 + br.b1 * s.x1
                                               + br.b2 * s.x2)))))
               AS e
      FROM s, br),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n, avg(t) AS pt,
             sum(t * yo / e) AS sy1, sum(t / e) AS sw1,
             sum((1.0 - t) * yo / (1.0 - e)) AS sy0,
             sum((1.0 - t) / (1.0 - e)) AS sw0
      FROM w)
    SELECT n, round(pt, 4) + 0.0 AS p_treated,
           round(CASE WHEN sw1 > 0 AND sw0 > 0
                 THEN sy1 / sw1 - sy0 / sw0 END, 6) + 0.0 AS ate
    FROM g
    """,
)
def m_ipw(spark, sf_dir):
    """Hájek-stabilized inverse-propensity-weighted ATE of the
    user-parity 'treatment' on value, propensity fit on hour-of-day
    and event_id%5 (operators/stats.ipw_ate) — the
    continuous-confounder causal estimator beside m_stratified_ate
    (discrete cells) and m_did (panel): the propensity model is
    m_logit's fixed-2-round IRLS whose ROUNDED betas become literals
    (the model is a replayable constant), then ONE weighted fold with
    the 0.01/0.99 overlap clip. ATE ~ 0 expected on this A/A-shaped
    parity split. The oracle replays the unrolled IRLS, the rounding,
    the clip and the Hájek fold."""
    from pandasvcf_spark.operators.stats import ipw_ate

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
        & F.col("value").isNotNull()
    )
    d = e.select(
        (F.col("user_id") % 2).cast("double").alias("t"),
        F.col("value").cast("double").alias("y"),
        F.hour("ts").cast("double").alias("x1"),
        (F.col("event_id") % 5).cast("double").alias("x2"),
    )
    return ipw_ate(d, "t", "y", ["x1", "x2"], iters=2)


@register(
    "m_energy_dist",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INT) AS g, round(value, 0) AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS n
              FROM b GROUP BY g, v),
    grid AS (
      SELECT sum(CASE WHEN a.g = 0 AND c.g = 1 THEN
               CAST(a.n * c.n AS DOUBLE) * abs(a.v - c.v) END) AS sxy,
             sum(CASE WHEN a.g = 0 AND c.g = 0 THEN
               CAST(a.n * c.n AS DOUBLE) * abs(a.v - c.v) END) AS sxx,
             sum(CASE WHEN a.g = 1 AND c.g = 1 THEN
               CAST(a.n * c.n AS DOUBLE) * abs(a.v - c.v) END) AS syy
      FROM cells a CROSS JOIN cells c),
    tot AS (
      SELECT CAST(sum(CASE WHEN g = 0 THEN n END) AS DOUBLE) AS n1,
             CAST(sum(CASE WHEN g = 1 THEN n END) AS DOUBLE) AS n2
      FROM cells),
    fold AS (
      SELECT n1, n2,
             2.0 * coalesce(sxy, 0.0) / (n1 * n2)
             - coalesce(sxx, 0.0) / (n1 * n1)
             - coalesce(syy, 0.0) / (n2 * n2) AS d2
      FROM grid, tot)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(CASE WHEN n1 > 0 AND n2 > 0 THEN d2 END, 6)
             + 0.0 AS e_dist,
           round(CASE WHEN n1 > 0 AND n2 > 0
                 THEN n1 * n2 / (n1 + n2) * d2 END, 6) + 0.0 AS t_stat
    FROM fold
    """,
)
def m_energy_dist(spark, sf_dir):
    """Two-sample energy distance across the user-parity value split
    (operators/stats.energy_distance_2samp) — the pairwise-distance
    member completing the ECDF comparison family (m_ks_2sample /
    m_wasserstein / m_cvm_2sample / m_anderson_darling): one
    (group, integer-rounded value) collapse, ONE broadcast cell×cell
    grid fold with integer pair weights — |cells|², never rows².
    ~0 expected on this A/A split. The oracle replays cells, the
    grid's three conditional sums and the D²/T fold."""
    from pandasvcf_spark.operators.stats import energy_distance_2samp

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    d = e.select(
        (F.col("user_id") % 2).cast("int").alias("g"),
        F.round("value", 0).alias("v"),
    )
    return energy_distance_2samp(d, "g", "v")


@register(
    "m_mmd_rbf",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 2 AS INT) AS g, round(value, 0) AS v
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
    cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS n
              FROM b GROUP BY g, v),
    grid AS (
      SELECT
        sum(CASE WHEN a.g = 0 AND c.g = 1 THEN
          CAST(a.n * c.n AS DOUBLE)
          * exp(-((a.v - c.v) * (a.v - c.v))
                / CAST(200.0 AS DOUBLE)) END) AS kxy,
        sum(CASE WHEN a.g = 0 AND c.g = 0 THEN
          CAST(a.n * c.n AS DOUBLE)
          * exp(-((a.v - c.v) * (a.v - c.v))
                / CAST(200.0 AS DOUBLE)) END) AS kxx,
        sum(CASE WHEN a.g = 1 AND c.g = 1 THEN
          CAST(a.n * c.n AS DOUBLE)
          * exp(-((a.v - c.v) * (a.v - c.v))
                / CAST(200.0 AS DOUBLE)) END) AS kyy
      FROM cells a CROSS JOIN cells c),
    tot AS (
      SELECT CAST(sum(CASE WHEN g = 0 THEN n END) AS DOUBLE) AS n1,
             CAST(sum(CASE WHEN g = 1 THEN n END) AS DOUBLE) AS n2
      FROM cells)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(CASE WHEN n1 > 0 AND n2 > 0 THEN
             coalesce(kxx, 0.0) / (n1 * n1)
             + coalesce(kyy, 0.0) / (n2 * n2)
             - 2.0 * coalesce(kxy, 0.0) / (n1 * n2) END, 6)
             + 0.0 AS mmd2
    FROM grid, tot
    """,
)
def m_mmd_rbf(spark, sf_dir):
    """Kernel two-sample MMD² (RBF, σ = 10 — 2σ² = 200) across the
    user-parity value split (operators/stats.mmd_rbf_2samp) — the
    kernel-embedding drift statistic beside m_energy_dist's distance
    kernel, same broadcast cell×cell grid plan. ~0 expected on this
    A/A split. The oracle replays cells, the three kernel-weighted
    conditional sums and the V-statistic fold."""
    from pandasvcf_spark.operators.stats import mmd_rbf_2samp

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    d = e.select(
        (F.col("user_id") % 2).cast("int").alias("g"),
        F.round("value", 0).alias("v"),
    )
    return mmd_rbf_2samp(d, "g", "v", sigma=10.0)


@register(
    "m_breslow_day",
    oracle="""
    WITH s AS (
      SELECT event_type AS st,
             CAST(user_id % 2 AS INT) AS ex,
             CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS oc
      FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        AND value IS NOT NULL),
    g0 AS (
      SELECT st,
        CAST(sum(CASE WHEN ex = 1 AND oc = 1 THEN 1 ELSE 0 END)
             AS DOUBLE) AS a,
        CAST(sum(CASE WHEN ex = 1 AND oc = 0 THEN 1 ELSE 0 END)
             AS DOUBLE) AS b,
        CAST(sum(CASE WHEN ex = 0 AND oc = 1 THEN 1 ELSE 0 END)
             AS DOUBLE) AS c,
        CAST(sum(CASE WHEN ex = 0 AND oc = 0 THEN 1 ELSE 0 END)
             AS DOUBLE) AS d
      FROM s GROUP BY st),
    g AS (
      SELECT *, a + b + c + d AS n FROM g0
      WHERE (a + b) > 0 AND (c + d) > 0
        AND (a + c) > 0 AND (b + d) > 0),
    mh AS (SELECT sum(a * d / n) AS num, sum(b * c / n) AS den FROM g),
    e AS (
      SELECT a, n, (a + b) AS r1, (a + c) AS c1,
             num / den AS orr
      FROM g, mh),
    q AS (
      SELECT a,
             CASE WHEN abs(1.0 - orr) < 1e-12
               THEN r1 * c1 / n
               ELSE CASE WHEN
                 ((-((n - r1 - c1) + orr * (r1 + c1))
                   + sqrt(((n - r1 - c1) + orr * (r1 + c1))
                          * ((n - r1 - c1) + orr * (r1 + c1))
                          - 4.0 * (1.0 - orr) * (-(orr * r1 * c1))))
                  / (2.0 * (1.0 - orr)))
                 > greatest(0.0, r1 + c1 - n)
                 AND
                 ((-((n - r1 - c1) + orr * (r1 + c1))
                   + sqrt(((n - r1 - c1) + orr * (r1 + c1))
                          * ((n - r1 - c1) + orr * (r1 + c1))
                          - 4.0 * (1.0 - orr) * (-(orr * r1 * c1))))
                  / (2.0 * (1.0 - orr)))
                 < least(r1, c1)
               THEN
                 (-((n - r1 - c1) + orr * (r1 + c1))
                  + sqrt(((n - r1 - c1) + orr * (r1 + c1))
                         * ((n - r1 - c1) + orr * (r1 + c1))
                         - 4.0 * (1.0 - orr) * (-(orr * r1 * c1))))
                 / (2.0 * (1.0 - orr))
               ELSE
                 (-((n - r1 - c1) + orr * (r1 + c1))
                  - sqrt(((n - r1 - c1) + orr * (r1 + c1))
                         * ((n - r1 - c1) + orr * (r1 + c1))
                         - 4.0 * (1.0 - orr) * (-(orr * r1 * c1))))
                 / (2.0 * (1.0 - orr))
               END END AS ee,
             r1, c1, n, orr
      FROM e),
    fold AS (
      SELECT CAST(count(*) AS BIGINT) AS k, max(orr) AS ormh,
             sum((a - ee) * (a - ee)
                 * (1.0 / ee + 1.0 / (r1 - ee) + 1.0 / (c1 - ee)
                    + 1.0 / (n - r1 - c1 + ee))) AS x2
      FROM q)
    SELECT k, round(ormh, 6) + 0.0 AS or_mh,
           round(CASE WHEN k >= 2 THEN x2 END, 6) + 0.0 AS x2,
           k - 1 AS df
    FROM fold
    """,
)
def m_breslow_day(spark, sf_dir):
    """Breslow-Day odds-ratio homogeneity across the five event-type
    strata (operators/stats.breslow_day; exposure = user parity,
    outcome = value > 50) — the check that licenses m_cmh's common
    odds ratio: per stratum the margin-preserving quadratic yields the
    expected a-cell under the MH common OR, X² sums the standardized
    deviations. ~χ²(4) central expected on this A/A fixture. One
    stratum-keyed 4-counter agg + a 1-row OR broadcast + closed-form
    per-stratum arithmetic; the oracle replays the quadratic,
    root-selection window and fold."""
    from pandasvcf_spark.operators.stats import breslow_day

    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    )
    d = e.select(
        F.col("event_type").alias("st"),
        (F.col("user_id") % 2).cast("int").alias("ex"),
        F.when(F.col("value") > 50.0, 1).otherwise(0).alias("oc"),
    )
    return breslow_day(d, "st", "ex", "oc")


@register(
    "m_ece",
    oracle="""
    WITH b AS (
      SELECT value / 500.0 AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    a AS (
      SELECT least(CAST(floor(s * 10) AS INTEGER), 9) AS bin,
             CAST(count(*) AS DOUBLE) AS n,
             avg(s) AS ms, avg(CAST(y AS DOUBLE)) AS fp
      FROM b GROUP BY 1)
    SELECT CAST(sum(n) AS BIGINT) AS n,
           CAST(count(*) AS INT) AS n_bins_used,
           round(sum(n * abs(fp - ms)) / sum(n), 6) + 0.0 AS ece,
           round(max(abs(fp - ms)), 6) + 0.0 AS mce
    FROM a
    """,
)
def m_ece(spark, sf_dir):
    """Expected + maximum calibration error (operators/stats.
    ece_summary) of value/500 as a pseudo-probability predicting the
    'purchase' label — m_calibration's reliability bins folded to the
    model-card headline pair, with the per-bin gaps UNROUNDED until
    the final fold. One <= 10-key groupBy + a 1-row fold. The oracle
    replays bins, weights and both extremes."""
    from pandasvcf_spark.operators.stats import ece_summary

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        (F.col("value") / 500.0).alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        .alias("y"),
    )
    return ece_summary(d, "s", "y", n_bins=10)


@register(
    "m_fairness",
    oracle="""
    WITH b AS (
      SELECT CAST(user_id % 3 AS VARCHAR) AS g,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS p
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        AND value IS NOT NULL),
    per AS (
      SELECT g, avg(CAST(p AS DOUBLE)) AS pr,
             avg(CASE WHEN y = 1 THEN CAST(p AS DOUBLE) END) AS tpr,
             avg(CASE WHEN y = 0 THEN CAST(p AS DOUBLE) END) AS fpr
      FROM b GROUP BY g)
    SELECT CAST(count(*) AS BIGINT) AS k,
           round(max(pr) - min(pr), 6) + 0.0 AS dp_gap,
           round(max(tpr) - min(tpr), 6) + 0.0 AS tpr_gap,
           round(max(fpr) - min(fpr), 6) + 0.0 AS fpr_gap
    FROM per
    """,
)
def m_fairness(spark, sf_dir):
    """Group-fairness gap summary (operators/stats.fairness_report):
    the value>50 classifier predicting 'purchase', audited across the
    user_id%3 cohorts — demographic-parity, equal-opportunity (TPR)
    and FPR gaps as max−min across groups, the model-governance
    screen beside m_confusion/m_group_auc. Near-zero gaps expected on
    this hash-cohort fixture. ONE group-keyed conditional agg + a
    1-row extremes fold; the oracle replays rates and gaps."""
    from pandasvcf_spark.operators.stats import fairness_report

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    )
    d = e.select(
        (F.col("user_id") % 3).cast("string").alias("g"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        .alias("y"),
        F.when(F.col("value") > 50.0, 1).otherwise(0).alias("p"),
    )
    return fairness_report(d, "g", "y", "p")


@register(
    "e_kpss",
    oracle="""
    WITH ser AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS DOUBLE)
               AS t,
             round(sum(value), 2) AS v
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY CAST(ts AS DATE)),
    mu AS (SELECT avg(v) AS m, CAST(count(*) AS BIGINT) AS n FROM ser),
    dev AS (
      SELECT t, v - mu.m AS e, mu.n,
             row_number() OVER (ORDER BY t) AS i,
             sum(v - mu.m) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS S
      FROM ser, mu),
    num AS (SELECT max(n) AS n, sum(S * S) AS ss FROM dev),
    g AS (
      SELECT b.i - a.i AS j, sum(a.e * b.e) AS gsum
      FROM dev a JOIN dev b
        ON b.i >= a.i AND b.i - a.i <= 4
      GROUP BY b.i - a.i),
    s2 AS (
      SELECT sum((CASE WHEN j = 0 THEN gsum
                  ELSE 2.0 * (1.0 - j / CAST(5.0 AS DOUBLE)) * gsum
                  END) / CAST(num.n AS DOUBLE)) AS s2
      FROM g, num)
    SELECT num.n AS n,
           round(CASE WHEN s2.s2 > 0 AND num.n > 4
                 THEN num.ss / (CAST(num.n AS DOUBLE)
                                * CAST(num.n AS DOUBLE) * s2.s2)
                 END, 6) + 0.0 AS eta,
           round(CASE WHEN s2.s2 > 0 AND num.n > 4
                 THEN s2.s2 END, 4) + 0.0 AS s2_l
    FROM num, s2
    """,
)
def e_kpss(spark, sf_dir):
    """KPSS level-stationarity test (operators/stats.kpss_test,
    Bartlett lags = 4) on the daily value-total series — the
    null-of-stationarity complement to m_mann_kendall (trend) and
    e_seasonal_mk (seasonal trend). The series pre-aggregates to one
    row per date (the runs_test series contract, tripwired); the
    cumulative-deviation ladder is one series-sized window, the
    Bartlett autocovariances one position-banded self-join — series
    × (l+1) pair rows. The oracle replays deviations, ladder, γ_j
    weights and η."""
    from pandasvcf_spark.operators.stats import kpss_test

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    ser = e.groupBy(F.to_date("ts").alias("__d")).agg(
        F.round(F.sum("value"), 2).alias("v")
    ).select(
        F.datediff(F.col("__d"), F.lit("2024-01-01")).cast("double")
        .alias("t"),
        "v",
    )
    return kpss_test(ser, "t", "v", lags=4)


@register(
    "e_adf",
    oracle="""
    WITH ser AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS DOUBLE)
               AS t,
             round(sum(value), 2) AS v
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY CAST(ts AS DATE)),
    pos AS (SELECT row_number() OVER (ORDER BY t) AS i, v FROM ser),
    d AS (
      SELECT a.v AS x, b.v - a.v AS y
      FROM pos a JOIN pos b ON b.i = a.i + 1),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy,
             sum(y * y) AS syy
      FROM d),
    f AS (
      SELECT n, n * sxx - sx * sx AS det,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS rho,
             sx, sy, sxy, syy
      FROM m),
    g AS (
      SELECT n, det, rho,
             syy - ((sy - rho * sx) / n) * sy - rho * sxy AS ssr
      FROM f)
    SELECT CAST(n AS BIGINT) AS n,
           round(CASE WHEN n >= 3 AND det > 0 THEN rho END, 6)
             + 0.0 AS rho,
           round(CASE WHEN n >= 3 AND det > 0
                  AND ssr / (n - 2.0) > 0
                 THEN rho / sqrt(ssr / (n - 2.0) * n / det)
                 END, 6) + 0.0 AS t_stat
    FROM g
    """,
)
def e_adf(spark, sf_dir):
    """Dickey-Fuller unit-root test (operators/stats.adf_test,
    0 augmentation lags) on the daily value-total series — e_kpss's
    classical partner: DF's null is a unit root, KPSS's null is
    stationarity, and agreement between them settles the question.
    One position window + one lag-1 position self-join + a 6-sum
    closed-form OLS fold, all series-sized after the daily pre-agg.
    The oracle replays the pairing, the sums and the t statistic."""
    from pandasvcf_spark.operators.stats import adf_test

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    ser = e.groupBy(F.to_date("ts").alias("__d")).agg(
        F.round(F.sum("value"), 2).alias("v")
    ).select(
        F.datediff(F.col("__d"), F.lit("2024-01-01")).cast("double")
        .alias("t"),
        "v",
    )
    return adf_test(ser, "t", "v")


def _rake_round_sql(src: str, out: str) -> str:
    """One unrolled IPF round: the row pass then the column pass, each
    one window sum over the margin cells (carrying N/kr/kc through)."""
    return f"""
    {out}_r AS (
      SELECT r, c, n, tn, kr, kc,
             w * (tn / kr) / sum(w * n) OVER (PARTITION BY r) AS w
      FROM {src}),
    {out} AS (
      SELECT r, c, n, tn, kr, kc,
             w * (tn / kc) / sum(w * n) OVER (PARTITION BY c) AS w
      FROM {out}_r)"""


@register(
    "m_raking",
    oracle=f"""
    WITH b AS (
      SELECT event_type AS r, CAST(user_id % 2 AS INT) AS c
      FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
    cells AS (SELECT r, c, CAST(count(*) AS DOUBLE) AS n
              FROM b GROUP BY r, c),
    tot AS (SELECT sum(n) AS tn,
                   CAST(count(DISTINCT r) AS DOUBLE) AS kr,
                   CAST(count(DISTINCT c) AS DOUBLE) AS kc
            FROM cells),
    w0 AS (SELECT r, c, n, tn, kr, kc, CAST(1.0 AS DOUBLE) AS w
           FROM cells, tot),
    {_rake_round_sql('w0', 'w1')},
    {_rake_round_sql('w1', 'w2')},
    {_rake_round_sql('w2', 'w3')}
    SELECT r AS event_type, c AS parity, CAST(n AS BIGINT) AS n,
           round(w, 6) + 0.0 AS weight,
           round(n * w, 4) + 0.0 AS weighted_n
    FROM w3
    """,
)
def m_raking(spark, sf_dir):
    """Raking / iterative proportional fitting (operators/stats.
    rake_weights, 3 fixed rounds, uniform targets) over the
    event_type × user-parity margin grid — the survey-weighting
    staple: after the alternating row/column scalings every
    event_type's weighted total ≈ N/5 and every parity's ≈ N/2. The
    corpus collapses ONCE to the margin-cell table; each IPF pass is
    two margin-partitioned window sums over those cells. The oracle
    unrolls all three rounds (the g_pagerank fixed-budget
    convention)."""
    from pandasvcf_spark.operators.stats import rake_weights

    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    d = e.select(
        F.col("event_type"),
        (F.col("user_id") % 2).cast("int").alias("parity"),
    )
    return rake_weights(d, "event_type", "parity", iters=3)


@register(
    "m_dml",
    oracle="""
    WITH s AS (
      SELECT CAST(user_id % 2 AS DOUBLE) AS t,
             CAST(value AS DOUBLE) AS y,
             CAST(hour(ts) AS DOUBLE) AS x1,
             CAST(event_id % 5 AS DOUBLE) AS x2
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
        AND ts IS NOT NULL AND event_id IS NOT NULL),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(x1) AS s1, sum(x2) AS s2,
             sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
             sum(x2 * x2) AS s22,
             sum(y) AS sy, sum(x1 * y) AS s1y, sum(x2 * y) AS s2y,
             sum(t) AS st, sum(x1 * t) AS s1t, sum(x2 * t) AS s2t
      FROM s),
    det AS (
      SELECT *,
             n * (s11 * s22 - s12 * s12)
             - s1 * (s1 * s22 - s12 * s2)
             + s2 * (s1 * s12 - s11 * s2) AS d0
      FROM m),
    by AS (
      SELECT *,
             (sy * (s11 * s22 - s12 * s12)
              - s1 * (s1y * s22 - s12 * s2y)
              + s2 * (s1y * s12 - s11 * s2y)) / d0 AS yb0,
             (n * (s1y * s22 - s12 * s2y)
              - sy * (s1 * s22 - s12 * s2)
              + s2 * (s1 * s2y - s1y * s2)) / d0 AS yb1,
             (n * (s11 * s2y - s1y * s12)
              - s1 * (s1 * s2y - s1y * s2)
              + sy * (s1 * s12 - s11 * s2)) / d0 AS yb2,
             (st * (s11 * s22 - s12 * s12)
              - s1 * (s1t * s22 - s12 * s2t)
              + s2 * (s1t * s12 - s11 * s2t)) / d0 AS tb0,
             (n * (s1t * s22 - s12 * s2t)
              - st * (s1 * s22 - s12 * s2)
              + s2 * (s1 * s2t - s1t * s2)) / d0 AS tb1,
             (n * (s11 * s2t - s1t * s12)
              - s1 * (s1 * s2t - s1t * s2)
              + st * (s1 * s12 - s11 * s2)) / d0 AS tb2
      FROM det),
    r AS (
      SELECT s.y - (b.yb0 + b.yb1 * s.x1 + b.yb2 * s.x2) AS ey,
             s.t - (b.tb0 + b.tb1 * s.x1 + b.tb2 * s.x2) AS et
      FROM s, by b),
    g AS (
      SELECT sum(et * ey) AS sty, sum(et * et) AS stt,
             sum(et * et * ey * ey) AS s22,
             sum(et * et * et * ey) AS s31,
             sum(et * et * et * et) AS s40,
             CAST(count(*) AS BIGINT) AS n
      FROM r),
    th AS (
      SELECT *, CASE WHEN stt > 0 THEN sty / stt END AS t0 FROM g)
    SELECT n,
           round(t0, 6) + 0.0 AS theta,
           round(CASE WHEN stt > 0 THEN
             sqrt(greatest(s22 - 2.0 * t0 * s31 + t0 * t0 * s40, 0.0))
             / stt END, 6) + 0.0 AS se
    FROM th
    """,
)
def m_dml(spark, sf_dir):
    """Double-ML / Frisch-Waugh partialling-out ATE of the user-parity
    'treatment' on value, controls hour-of-day and event_id%5
    (operators/stats.dml_ate) — the residual-on-residual member of
    the causal trio (m_stratified_ate cells, m_ipw weights, this):
    two OLS nuisance fits SHARE one X'X pass (only the right-hand
    sides differ), betas inject as literals, and θ = Σe_t e_y / Σe_t²
    folds in one more pass with the HC0 sandwich SE (expanded cross
    terms, same pass). θ ~ 0 expected on this A/A parity split. The
    oracle replays both Cramer solves and the residual fold."""
    from pandasvcf_spark.operators.stats import dml_ate

    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    d = e.select(
        (F.col("user_id") % 2).cast("double").alias("t"),
        F.col("value").cast("double").alias("y"),
        F.hour("ts").cast("double").alias("x1"),
        (F.col("event_id") % 5).cast("double").alias("x2"),
    )
    return dml_ate(d, "t", "y", ["x1", "x2"])


@register(
    "m_conformal",
    oracle="""
    WITH b AS (
      SELECT (event_id % 2 = 0) AS cal, event_type AS g,
             CAST(value AS DOUBLE) AS y
      FROM events
      WHERE event_id IS NOT NULL AND event_type IS NOT NULL
        AND value IS NOT NULL),
    means AS (SELECT g, avg(y) AS m FROM b WHERE cal GROUP BY g),
    gm AS (SELECT avg(y) AS gmean, CAST(count(*) AS BIGINT) AS ncal
           FROM b WHERE cal),
    scored AS (
      SELECT b.cal,
             round(abs(b.y - coalesce(mm.m, gm.gmean)), 4) AS s
      FROM b LEFT JOIN means mm ON b.g = mm.g, gm),
    kk AS (SELECT CAST(ceil((ncal + 1)
                  * CAST(0.9 AS DOUBLE)) AS BIGINT) AS k,
                  ncal
           FROM gm),
    cells AS (SELECT s, count(*) AS c FROM scored WHERE cal GROUP BY s),
    lad AS (SELECT s, sum(c) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) AS cum
            FROM cells),
    q AS (SELECT min(s) AS qh FROM lad, kk WHERE cum >= kk.k)
    SELECT kk.ncal AS n_cal,
           CAST(count(*) AS BIGINT) AS n_test,
           round(max(q.qh), 4) + 0.0 AS qhat,
           round(avg(CASE WHEN q.qh IS NULL OR scored.s <= q.qh
                     THEN 1.0 ELSE 0.0 END), 4) + 0.0 AS coverage
    FROM scored, q, kk
    WHERE NOT scored.cal
    GROUP BY kk.ncal
    """,
)
def m_conformal(spark, sf_dir):
    """Split conformal prediction interval (operators/stats.
    conformal_interval, α = 0.1) — calibration = even event_ids, base
    model = per-event-type calibration mean, q̂ = the exact
    ceil((n+1)·0.9)-th order statistic of the rounded absolute
    residuals via the distinct-score cell ladder, audited by the
    realized odd-event_id coverage (~0.9, the distribution-free
    guarantee). One group-mean join-back + one cell ladder + one test
    fold; the oracle replays split, model, k, ladder and coverage."""
    from pandasvcf_spark.operators.stats import conformal_interval

    e = load(spark, sf_dir, "events").filter(
        F.col("event_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    )
    d = e.select(
        (F.col("event_id") % 2 == 0).alias("cal"),
        F.col("event_type").alias("g"),
        F.col("value").cast("double").alias("y"),
    )
    return conformal_interval(d, "cal", "g", "y", alpha=0.1)


@register(
    "m_best_split",
    oracle="""
    WITH b AS (
      SELECT round(value, 0) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    r AS (
      SELECT DISTINCT s,
             sum(y) OVER (ORDER BY s DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cp,
             sum(1 - y) OVER (ORDER BY s DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cn,
             sum(y) OVER () AS pp,
             sum(1 - y) OVER () AS np
      FROM b),
    g AS (
      SELECT s,
             CAST(cp + cn AS DOUBLE) AS nl,
             CAST(pp + np - cp - cn AS DOUBLE) AS nr,
             CAST(pp + np AS DOUBLE) AS n,
             CAST(pp AS DOUBLE) / (pp + np) AS pa,
             CASE WHEN cp + cn > 0
               THEN CAST(cp AS DOUBLE) / (cp + cn) END AS pl,
             CASE WHEN pp + np - cp - cn > 0
               THEN CAST(pp - cp AS DOUBLE)
                    / (pp + np - cp - cn) END AS pr
      FROM r),
    e AS (
      SELECT s, n, pl, pr,
             (CASE WHEN pa > 0 AND pa < 1
               THEN -(pa * log2(pa) + (1.0 - pa) * log2(1.0 - pa))
               ELSE 0.0 END)
             - (nl / n) * coalesce(CASE WHEN pl > 0 AND pl < 1
                 THEN -(pl * log2(pl) + (1.0 - pl) * log2(1.0 - pl))
                 ELSE 0.0 END, 0.0)
             - (nr / n) * coalesce(CASE WHEN pr > 0 AND pr < 1
                 THEN -(pr * log2(pr) + (1.0 - pr) * log2(1.0 - pr))
                 ELSE 0.0 END, 0.0) AS gain
      FROM g)
    SELECT CAST(n AS BIGINT) AS n, s AS threshold,
           round(gain, 6) + 0.0 AS gain,
           round(pl, 6) + 0.0 AS p_left,
           round(pr, 6) + 0.0 AS p_right
    FROM e ORDER BY gain DESC, s LIMIT 1
    """,
)
def m_best_split(spark, sf_dir):
    """Best information-gain threshold of the integer-rounded value
    against the 'purchase' label (operators/stats.best_split) — the
    decision-stump / feature-screening primitive riding the SAME
    cumulative distinct-score ladder as m_roc_points/m_pr_points
    (collapse first, bucketed re-cut above 1M cells), with a
    deterministic (gain DESC, threshold ASC) argmax. Near-zero gain
    expected on this independent fixture — the entry checks the
    entropy arithmetic and the ladder reuse. The oracle replays gain
    at every threshold and the argmax."""
    from pandasvcf_spark.operators.stats import best_split

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        F.round("value", 0).alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        .alias("y"),
    )
    return best_split(d, "s", "y")


@register(
    "m_cooks",
    oracle="""
    WITH s AS (
      SELECT CAST(value AS DOUBLE) AS y,
             CAST(hour(ts) AS DOUBLE) AS x1,
             CAST(user_id % 7 AS DOUBLE) AS x2
      FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL
        AND user_id IS NOT NULL),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(x1) AS s1, sum(x2) AS s2,
             sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
             sum(x2 * x2) AS s22,
             sum(y) AS sy, sum(x1 * y) AS s1y, sum(x2 * y) AS s2y,
             sum(y * y) AS syy
      FROM s),
    det AS (
      SELECT *,
             n * (s11 * s22 - s12 * s12)
             - s1 * (s1 * s22 - s12 * s2)
             + s2 * (s1 * s12 - s11 * s2) AS d0
      FROM m),
    beta AS (
      SELECT *,
             (sy * (s11 * s22 - s12 * s12)
              - s1 * (s1y * s22 - s12 * s2y)
              + s2 * (s1y * s12 - s11 * s2y)) / d0 AS b0,
             (n * (s1y * s22 - s12 * s2y)
              - sy * (s1 * s22 - s12 * s2)
              + s2 * (s1 * s2y - s1y * s2)) / d0 AS b1,
             (n * (s11 * s2y - s1y * s12)
              - s1 * (s1 * s2y - s1y * s2)
              + sy * (s1 * s12 - s11 * s2)) / d0 AS b2,
             (s11 * s22 - s12 * s12) / d0 AS i00,
             -(s1 * s22 - s12 * s2) / d0 AS i01,
             (s1 * s12 - s11 * s2) / d0 AS i02,
             (n * s22 - s2 * s2) / d0 AS i11,
             -(n * s12 - s1 * s2) / d0 AS i12,
             (n * s11 - s1 * s1) / d0 AS i22
      FROM det),
    fit AS (
      SELECT *,
             (syy - (b0 * sy + b1 * s1y + b2 * s2y)) / (n - 3.0)
               AS s2e
      FROM beta),
    rows_d AS (
      SELECT f.n, f.s2e,
             s.y - (f.b0 + f.b1 * s.x1 + f.b2 * s.x2) AS e,
             f.i00 + f.i01 * s.x1 + f.i02 * s.x2
               + f.i01 * s.x1 + f.i11 * s.x1 * s.x1
               + f.i12 * s.x1 * s.x2 + f.i02 * s.x2
               + f.i12 * s.x2 * s.x1 + f.i22 * s.x2 * s.x2 AS h
      FROM s, fit f),
    dd AS (
      SELECT n,
             CASE WHEN s2e > 0
               THEN (e * e) * h / ((3.0 * s2e) * (1.0 - h) * (1.0 - h))
               ELSE 0.0 END AS d
      FROM rows_d)
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST(sum(CASE WHEN d > 4.0 / max_n THEN 1 ELSE 0 END)
                AS BIGINT) AS n_influential,
           round(max(d), 6) + 0.0 AS max_d,
           round(4.0 / max_n, 8) + 0.0 AS cut
    FROM dd, (SELECT max(n) AS max_n FROM dd)
    GROUP BY max_n
    """,
)
def m_cooks(spark, sf_dir):
    """Cook's-distance influence screen of the m_ols design
    (operators/stats.cooks_screen; y = value on hour-of-day and
    user_id%7, 4/n cut) — the diagnostics-shelf closer beside m_vif
    and m_breusch_pagan: leverage from the (X'X)⁻¹ literals, residual
    from the beta literals, D per row as pure arithmetic; one sums
    pass + one screen pass. The oracle replays the Cramer inverse
    entries, h in the same accumulation order, and the flag count."""
    from pandasvcf_spark.operators.stats import cooks_screen

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    )
    d = e.select(
        F.col("value").cast("double").alias("y"),
        F.hour("ts").cast("double").alias("x1"),
        (F.col("user_id") % 7).cast("double").alias("x2"),
    )
    return cooks_screen(d, "y", ["x1", "x2"])

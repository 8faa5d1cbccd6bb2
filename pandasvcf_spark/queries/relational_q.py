"""Generic relational catalog entries (SURVEY §2.2/2.4/2.5/2.7, milestone M3).

Each entry exercises one operator family from the SURVEY §2 inventory as a
declared, DuckDB-checkable query over the TPC-H-ish testdata tables, built on
the operators in `pandasvcf_spark.operators.relational`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pandasvcf_spark.operators.relational import (
    anti_join,
    join_dim,
    pivot_counts,
    rank_per_group,
    running_agg,
    semi_join,
    topk,
)
from pandasvcf_spark.queries.registry import register
from pandasvcf_spark.queries.tables import load


# --- scans / projections / filters (S4, P1) --------------------------------

@register(
    "s4_scan_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
)
def s4_scan_project_filter(spark, sf_dir):
    """Pruned, predicate-pushed scan: Catalyst pushes both the filter and the
    4-column projection into the parquet reader (reference S4/P1 —
    pandasvcf.py:94-99,134-151)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@register(
    "p4_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def p4_distinct(spark, sf_dir):
    """Global distinct (reference P4, pandasvcf.py:175 — upgraded from
    chunk-local to global)."""
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# --- aggregations (A1, A2 + grouping sets) ---------------------------------

@register(
    "a2_value_counts",
    oracle="SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority",
)
def a2_value_counts(spark, sf_dir):
    """Frequency count (reference A2 — Series.value_counts, notebook cells
    22-24) as groupBy().count() with map-side partial aggregation."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_tpch_q1",
    headline=True,
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_tpch_q1(spark, sf_dir):
    """Multi-aggregate group-by (TPC-H Q1 shape): the canonical partial-agg →
    shuffle → final-agg plan; AQE coalesces the tiny result partitions."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            # NTZ literal: l_shipdate reads as TIMESTAMP_NTZ; a zoned literal
            # would coerce through the session timezone
            F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    """Grouping-sets cube — free in Spark, absent in the reference
    (SURVEY §2.5 note)."""
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
    FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def agg_rollup(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts, count(*) AS n
    FROM lineitem GROUP BY l_suppkey
    """,
)
def agg_count_distinct(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- joins (J1-J3 generalized; SURVEY §2.4) --------------------------------

@register(
    "j_inner_broadcast",
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def j_inner_broadcast(spark, sf_dir):
    """Fact ⋈ broadcast(dim): no shuffle of the orders side."""
    j = join_dim(
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "customer"),
        on=[F.col("o_custkey") == F.col("c_custkey")],
    )
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@register(
    "j_left_join",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           round(sum(coalesce(o_totalprice, 0)), 2) AS total
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def j_left_join(spark, sf_dir):
    """Left outer join preserving order-less customers (reference J1/J2 are
    left joins — variant_annotations.py:683-685)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, on=[c.c_custkey == o.o_custkey], how="left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum(F.coalesce("o_totalprice", F.lit(0.0))), 2).alias("total"),
        )
    )


@register(
    "j_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def j_semi(spark, sf_dir):
    """Left-semi join: keeps the probe-side schema, no row duplication."""
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return semi_join(
        load(spark, sf_dir, "customer"),
        big,
        on=[F.col("c_custkey") == F.col("o_custkey")],
    ).select("c_custkey", "c_name")


_BLOOM_H_BUILD = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split("
    "CAST(i AS VARCHAR) || ':' || CAST(o_orderkey AS VARCHAR), ''), "
    "c -> CAST(ascii(c) AS BIGINT))), (acc, c) -> (acc * 31 + c) % 2147483647)"
)
_BLOOM_H_PROBE = _BLOOM_H_BUILD.replace("o_orderkey", "l_orderkey")


@register(
    "j_bloom_prune",
    oracle=f"""
    WITH sk AS (
      SELECT DISTINCT o_orderkey FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 50 = 0),
    pos AS (
      SELECT DISTINCT (({_BLOOM_H_BUILD} * 2654435761) % 2147483647) % 8192
               AS p
      FROM sk, generate_series(0, 2) AS s(i)),
    keys AS (SELECT DISTINCT l_orderkey FROM lineitem),
    kp AS (
      SELECT l_orderkey, i,
             (({_BLOOM_H_PROBE} * 2654435761) % 2147483647) % 8192 AS p
      FROM keys, generate_series(0, 2) AS s(i)),
    passk AS (
      SELECT l_orderkey FROM kp JOIN pos USING (p)
      GROUP BY l_orderkey HAVING count(DISTINCT i) = 3)
    SELECT l.l_orderkey, l.l_linenumber
    FROM lineitem l JOIN passk USING (l_orderkey)
    """,
)
def j_bloom_prune(spark, sf_dir):
    """Runtime-filter join pruning (operators/relational.bloom_prune):
    lineitem pre-filtered by a deterministic 8192-bit / 3-hash Bloom
    filter of a small urgent-orders key set — the pre-shuffle prune that
    keeps non-matching fact rows off the exchange entirely. The probe is
    pure integer arithmetic against a broadcast bitmask literal (no join,
    no Python); false positives pass by design and the oracle reproduces
    the EXACT surviving set, false positives included, by replaying the
    position-set membership in SQL."""
    from pandasvcf_spark.operators.relational import bloom_prune

    small = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderkey") % 50 == 0)
    )
    out = bloom_prune(
        load(spark, sf_dir, "lineitem"), "l_orderkey",
        small, "o_orderkey", m=8192, k=3,
    )
    return out.select("l_orderkey", "l_linenumber")


@register(
    "j_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def j_anti(spark, sf_dir):
    """Left-anti join: customers with no orders."""
    return anti_join(
        load(spark, sf_dir, "customer"),
        load(spark, sf_dir, "orders"),
        on=[F.col("c_custkey") == F.col("o_custkey")],
    ).select("c_custkey", "c_mktsegment")


@register(
    "j_multiway_q5",
    headline=True,
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def j_multiway_q5(spark, sf_dir):
    """Multiway star join (TPC-H Q5 shape): dims broadcast, fact shuffles at
    most twice (orders⋈lineitem), AQE reorders/broadcasts the rest."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = join_dim(n, r, on=[F.col("n_regionkey") == F.col("r_regionkey")])
    cust = join_dim(c, dims, on=[F.col("c_nationkey") == F.col("n_nationkey")])
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    return j.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


# --- windows / sort / limit (SURVEY §2.7) ----------------------------------

@register(
    "w_rank_topk",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             rank() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders) WHERE rnk <= 3
    """,
)
def w_rank_topk(spark, sf_dir):
    """Top-k per group via rank() — one shuffle on the group key."""
    return rank_per_group(
        load(spark, sf_dir, "orders"),
        ["o_orderpriority"],
        [F.desc("o_totalprice"), F.col("o_orderkey")],
        k=3,
        method="rank",
        out="rnk",
    ).select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")


@register(
    "w_row_number_first",
    oracle="""
    SELECT o_custkey, o_orderkey AS first_orderkey FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders) WHERE rn = 1
    """,
)
def w_row_number_first(spark, sf_dir):
    """Earliest row per key via row_number over a total order."""
    return rank_per_group(
        load(spark, sf_dir, "orders"),
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
        k=1,
        method="row_number",
    ).select("o_custkey", F.col("o_orderkey").alias("first_orderkey"))


@register(
    "w_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
    FROM orders
    """,
)
def w_running_sum(spark, sf_dir):
    """Cumulative frame aggregate (rows unbounded preceding)."""
    out = running_agg(
        load(spark, sf_dir, "orders"),
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
        F.sum("o_totalprice"),
        out="run_total",
    )
    return out.select(
        "o_custkey", "o_orderkey", F.round("run_total", 2).alias("run_total")
    )


@register(
    "w_dense_rank_lead_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           dense_rank() OVER w AS drnk,
           lag(o_orderkey) OVER w AS prev_ok,
           lead(o_orderkey) OVER w AS next_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w_dense_rank_lead_lag(spark, sf_dir):
    """dense_rank + lead/lag over one window spec (SURVEY §2.7 engine
    scope) — all three share a single sort within one shuffle."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).alias("drnk"),
        F.lag("o_orderkey").over(w).alias("prev_ok"),
        F.lead("o_orderkey").over(w).alias("next_ok"),
    )


@register(
    "w_pareto_front",
    oracle="""
    WITH per AS (
      SELECT o_custkey, CAST(count(*) AS DOUBLE) AS x,
             CAST(sum(o_totalprice) AS DOUBLE) AS y
      FROM orders GROUP BY o_custkey),
    cells AS (SELECT x, max(y) AS y FROM per GROUP BY x),
    env AS (SELECT x, y,
        max(y) OVER (ORDER BY x DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS e
      FROM cells)
    SELECT x AS n_orders, round(y, 2) AS top_spend FROM env
    WHERE e IS NULL OR y > e
    ORDER BY n_orders
    """,
)
def w_pareto_front(spark, sf_dir):
    """2-D Pareto front (operators/relational.pareto_front — the
    round-13 consumer of the shared `bucketed_running_extreme`
    envelope ladder): the order-count vs total-spend frontier over
    customers — which (n_orders, spend) cells are not beaten on both
    axes. One partial-agged collapse to distinct-x cells with max(y),
    one STRICT suffix-max envelope over descending x (plain window in
    this small regime; the >1M-cell regime re-cuts through the
    equal-width-bucket device, regime-equivalence pytest), front =
    NULL envelope or y above it. The oracle replays collapse,
    envelope and front filter with the same strict frame."""
    from pandasvcf_spark.operators.relational import pareto_front

    per = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            F.sum("o_totalprice").cast("double").alias("top_spend"),
        )
    )
    out = pareto_front(per, "n_orders", "top_spend")
    return out.select(
        "n_orders", F.round("top_spend", 2).alias("top_spend")
    ).orderBy("n_orders")


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the general form behind cube/rollup), via the
    SQL surface over a registered view — both entry styles are first-class."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def sort_limit_topk(spark, sf_dir):
    """Deterministic global top-k: TakeOrderedAndProject, not a full sort."""
    return topk(
        load(spark, sf_dir, "orders"),
        [F.desc("o_totalprice"), F.col("o_orderkey")],
        15,
    ).select("o_orderkey", "o_totalprice")


# --- set operations (R3 generalized) ---------------------------------------

_SET_A = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_SET_B = "SELECT c_custkey FROM customer WHERE c_acctbal > 9000"


def _set_sides(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"),
        c.filter(F.col("c_acctbal") > 9000).select("c_custkey"),
    )


@register("set_union", oracle=f"{_SET_A} UNION {_SET_B}")
def set_union(spark, sf_dir):
    a, b = _set_sides(spark, sf_dir)
    return a.union(b).distinct()


@register("set_intersect", oracle=f"{_SET_A} INTERSECT {_SET_B}")
def set_intersect(spark, sf_dir):
    a, b = _set_sides(spark, sf_dir)
    return a.intersect(b)


@register("set_except", oracle=f"{_SET_A} EXCEPT {_SET_B}")
def set_except(spark, sf_dir):
    a, b = _set_sides(spark, sf_dir)
    return a.subtract(b)


# --- pivot (R2) ------------------------------------------------------------

@register(
    "r2_pivot",
    oracle="""
    SELECT c_mktsegment,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_F,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_O,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_P
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def r2_pivot(spark, sf_dir):
    """Long→wide pivot (reference R2, notebook cell 17) with explicit pivot
    values — no distinct-discovery scan."""
    j = join_dim(
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "customer"),
        on=[F.col("o_custkey") == F.col("c_custkey")],
    )
    out = pivot_counts(j, ["c_mktsegment"], "o_orderstatus", ["F", "O", "P"])
    return out.select(
        "c_mktsegment",
        F.col("F").alias("cnt_F"),
        F.col("O").alias("cnt_O"),
        F.col("P").alias("cnt_P"),
    )


# --- scalar function families (SURVEY §2.6 engine scope) -------------------

@register(
    "f_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(substr(p_name, 1, 8)) AS name8,
           length(p_name) AS name_len,
           regexp_extract(p_name, '^[a-z]+') AS first_word,
           p_brand || '#' || p_type AS brand_type
    FROM part
    """,
)
def f_string_funcs(spark, sf_dir):
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 8)).alias("name8"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_extract("p_name", "^[a-z]+", 0).alias("first_word"),
        F.concat("p_brand", F.lit("#"), "p_type").alias("brand_type"),
    )


@register(
    "f_date_funcs",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS ym,
           count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
    FROM orders GROUP BY strftime(o_orderdate, '%Y-%m')
    """,
)
def f_date_funcs(spark, sf_dir):
    """Date bucketing. o_orderdate is a parquet NTZ timestamp, so formatting
    is timezone-free on both engines."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@register(
    "f_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_quantity), 4) AS sqrt_qty,
           round(pow(1 + l_discount, 2), 6) AS disc_sq,
           CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct_ceil,
           round(abs(l_quantity - 25), 2) AS qty_dev
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def f_math_funcs(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 4).alias("sqrt_qty"),
        F.round(F.pow(F.lit(1) + F.col("l_discount"), 2), 6).alias("disc_sq"),
        F.ceil(F.col("l_tax") * 100).cast("long").alias("tax_pct_ceil"),
        F.round(F.abs(F.col("l_quantity") - 25), 2).alias("qty_dev"),
    )


@register(
    "f_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 250000 THEN 'mid'
                ELSE 'high' END AS band,
           count(*) AS n
    FROM orders GROUP BY 1
    """,
)
def f_case_when(spark, sf_dir):
    band = (
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 250000, "mid")
        .otherwise("high")
    )
    return (
        load(spark, sf_dir, "orders")
        .groupBy(band.alias("band"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "skew_salted_count",
    oracle="SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag",
)
def skew_salted_count(spark, sf_dir):
    """Skew-resistant grouped count (3 hot keys over 60k+ rows): pre-agg on
    (key, salt) spreads each hot key over 16 reducers; result is identical
    to the plain groupBy — which is exactly what the oracle checks."""
    from pandasvcf_spark.operators.relational import salted_count

    return salted_count(
        load(spark, sf_dir, "lineitem"), "l_returnflag", "l_orderkey"
    )


@register(
    "skew_salted_join",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def skew_salted_join(spark, sf_dir):
    """Skew-resistant equi-join: fact salted on a high-cardinality column,
    dim replicated per salt; row-identical to the plain join (oracle uses
    the plain form)."""
    from pandasvcf_spark.operators.relational import salted_join

    li = load(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "k")
    o = load(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "k")
    j = salted_join(li, o, key="k", salt_src="l_linenumber", n_salts=8)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


@register(
    "info_str_to_map",
    oracle="""
    WITH info_t AS (
      SELECT l_orderkey, l_linenumber,
             'qty=' || CAST(CAST(l_quantity AS INT) AS VARCHAR) ||
             ';disc=' || CAST(CAST(round(l_discount * 100) AS INT) AS VARCHAR) ||
             ';flag=' || l_returnflag AS info
      FROM lineitem)
    SELECT l_orderkey, l_linenumber,
           CAST(regexp_extract(info, 'qty=([0-9]+)', 1) AS INT) AS qty,
           CAST(regexp_extract(info, 'disc=([0-9]+)', 1) AS INT) AS disc_pct,
           regexp_extract(info, 'flag=([A-Z])', 1) AS flag
    FROM info_t
    """,
)
def info_str_to_map(spark, sf_dir):
    """VCF-INFO-style `k=v;k=v` payload parsing via str_to_map (SURVEY
    §2.6 note — the reference never parses INFO; declared engine scope).
    The payload is derived from lineitem so the oracle can rebuild it."""
    from pandasvcf_spark.functions.maps import info_field_expr

    li = load(spark, sf_dir, "lineitem")
    info = F.concat(
        F.lit("qty="),
        F.col("l_quantity").cast("int").cast("string"),
        F.lit(";disc="),
        F.round(F.col("l_discount") * 100).cast("int").cast("string"),
        F.lit(";flag="),
        F.col("l_returnflag"),
    )
    df = li.select("l_orderkey", "l_linenumber", info.alias("info"))
    return df.select(
        "l_orderkey",
        "l_linenumber",
        info_field_expr("info", "qty", "int").alias("qty"),
        info_field_expr("info", "disc", "int").alias("disc_pct"),
        info_field_expr("info", "flag").alias("flag"),
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
           round(median(l_discount), 4) AS med_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark, sf_dir):
    """EXACT grouped percentiles (Spark `percentile`, linear interpolation
    — the same definition as DuckDB quantile_cont/median, so the check is
    exact, unlike approx_percentile whose sketch is engine-specific). The
    ordered-statistics surface of the aggregate family; at scale prefer
    percentile_approx for one-pass sketching — this entry pins the exact
    semantics the approximation targets. Past the driver window by design
    (continuously exact-checked by the contract guard)."""
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile(price, F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile(price, F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile(price, F.lit(0.99)), 4).alias("p99"),
        F.round(F.percentile(F.col("l_discount"), F.lit(0.5)), 4).alias(
            "med_disc"
        ),
    )


@register(
    "m_upsert_latest",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice, 0 AS version FROM orders),
    upd AS (
      SELECT o_orderkey, round(o_totalprice * 2, 2) AS o_totalprice,
             1 AS version
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 900000000, round(o_totalprice, 2), 1
      FROM orders WHERE o_orderkey % 11 = 0),
    merged AS (
      SELECT *, 0 AS pri FROM base
      UNION ALL
      SELECT *, 1 AS pri FROM upd)
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           round(o_totalprice, 2) AS o_totalprice,
           version
    FROM (SELECT *, row_number() OVER (
            PARTITION BY o_orderkey
            ORDER BY version DESC, pri DESC) AS rn
          FROM merged)
    WHERE rn = 1
    """,
)
def m_upsert_latest(spark, sf_dir):
    """Latest-wins upsert (operators/relational.merge_latest) — the MERGE
    a corpus-refresh job runs without a table format: a CDC batch that
    doubles every 7th order's price and inserts new keys for every 11th,
    applied over the base table. Existing keys take the newest version,
    new keys insert, ties prefer the update side (idempotent replay).
    One window shuffle on the key; the oracle replays the same merge as
    a SQL window."""
    from pandasvcf_spark.operators.relational import merge_latest

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = o.withColumn("version", F.lit(0))
    upd = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 2, 2))
        .withColumn("version", F.lit(1))
        .unionByName(
            o.filter(F.col("o_orderkey") % 11 == 0)
            .withColumn("o_orderkey", F.col("o_orderkey") + 900000000)
            .withColumn("version", F.lit(1))
        )
    )
    out = merge_latest(base, upd, ["o_orderkey"], "version")
    return out.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "version",
    )


def _pagerank_oracle(iters: int = 3, d: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank in SQL: one (dangling, contrib,
    ranks) CTE triple per round — the oracle IS the definition, no
    recursion, no convergence test."""
    parts = [
        """
    WITH e AS (SELECT DISTINCT l_suppkey AS a, l_partkey + 10000000 AS b
               FROM lineitem),
    nodes AS (SELECT a AS id FROM e UNION SELECT b FROM e),
    deg AS (SELECT a, count(*) AS dg FROM e GROUP BY a),
    p AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT id, 1.0 / n AS rank FROM nodes, p)"""
    ]
    for i in range(iters):
        parts.append(f""",
    d{i} AS (SELECT COALESCE(sum(rank), 0) AS m FROM r{i}
             LEFT JOIN deg ON r{i}.id = deg.a WHERE deg.a IS NULL),
    c{i} AS (SELECT e.b AS id, sum(r{i}.rank / deg.dg) AS inflow
             FROM e JOIN deg ON e.a = deg.a JOIN r{i} ON e.a = r{i}.id
             GROUP BY e.b),
    r{i + 1} AS (SELECT nodes.id,
                 (1 - {d}) / p.n + {d} * (d{i}.m / p.n
                                          + COALESCE(c{i}.inflow, 0)) AS rank
                 FROM nodes CROSS JOIN p CROSS JOIN d{i}
                 LEFT JOIN c{i} ON nodes.id = c{i}.id)""")
    parts.append(f"""
    SELECT CAST(id AS BIGINT) AS id, round(rank, 9) AS rank FROM r{iters}
    """)
    return "".join(parts)


@register("g_pagerank", oracle=_pagerank_oracle())
def g_pagerank(spark, sf_dir):
    """Crawl-priority link ranking (operators/graph.pagerank): 3
    fixed-iteration PageRank rounds over the supplier→part link graph
    (every part node is dangling — the uniform redistribution the
    correction exists for is fully exercised). Per round: two joins +
    one partial-agged aggregation, edge/degree relations checkpointed
    once; the oracle is the UNROLLED definition, one CTE triple per
    round. Ranks agree to 1e-9."""
    from pandasvcf_spark.operators.graph import pagerank

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + 10000000).alias("dst"),
    )
    out = pagerank(li, damping=0.85, iters=3)
    return out.select(
        F.col("id").cast("long").alias("id"),
        F.round("rank", 9).alias("rank"),
    )


@register(
    "g_triangles",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 4 = 0),
    raw AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
             greatest(a.l_partkey, b.l_partkey) AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
    deg AS (
      SELECT n, count(*) AS d
      FROM (SELECT u AS n FROM raw UNION ALL SELECT v AS n FROM raw)
      GROUP BY 1),
    s1 AS (
      SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d) / 2 AS BIGINT) AS n_edges,
             CAST(sum(d * (d - 1) / 2) AS BIGINT) AS wedges
      FROM deg),
    tri AS (
      SELECT CAST(count(*) AS BIGINT) AS triangles
      FROM raw e1
      JOIN raw e2 ON e2.u = e1.v
      JOIN raw e3 ON e3.u = e1.u AND e3.v = e2.v)
    SELECT n_nodes, n_edges, wedges, triangles,
           CASE WHEN wedges > 0
                THEN round(3.0 * triangles / wedges, 6) END AS global_cc
    FROM s1, tri
    """,
)
def g_triangles(spark, sf_dir):
    """Triangle census + global clustering coefficient
    (operators/graph.triangle_stats; Schank & Wagner 2005 node-iterator
    with degree orientation) over the parts CO-PURCHASE graph (parts
    sharing an order, a deterministic quarter of orders): nodes and
    edges both grow linearly with data — the graph shape a real corpus
    link graph has — unlike a fixed-node-set derivation whose density
    saturates into a clique and whose wedge work then grows as m^1.5
    with no new nodes (measured: 60 s at sf0.1 before this re-cut).
    The orientation bounds wedge expansion by m^1.5 against hot-part
    skew; the oracle affords the naive u<v<w three-way self-join and
    the closed-form wedge sum."""
    from pandasvcf_spark.operators.graph import triangle_stats

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") != F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    return triangle_stats(edges)


def _kcore_oracle(k: int = 3, rounds: int = 3) -> str:
    """Unrolled bounded-round k-core peel (the g_pagerank device: the
    oracle IS the fixed-round definition — no recursion, no convergence
    test; a peel round is idempotent once the core is reached, so extra
    unrolled rounds never change the answer)."""
    parts = [
        """
    WITH e0 AS (
      SELECT DISTINCT least(l_suppkey, l_partkey + 10000000) AS u,
             greatest(l_suppkey, l_partkey + 10000000) AS v
      FROM lineitem
      WHERE ((l_suppkey * 2654435761 + l_partkey * 40503)
             % 2147483647) % 5 = 0)"""
    ]
    for i in range(rounds):
        parts.append(f""",
    d{i} AS (SELECT n, count(*) AS deg
             FROM (SELECT u AS n FROM e{i} UNION ALL SELECT v FROM e{i})
             GROUP BY 1),
    k{i} AS (SELECT n FROM d{i} WHERE deg >= {k}),
    e{i + 1} AS (SELECT u, v FROM e{i}
                 WHERE u IN (SELECT n FROM k{i})
                   AND v IN (SELECT n FROM k{i}))""")
    parts.append(f"""
    SELECT CAST(node AS BIGINT) AS node, CAST(degree AS BIGINT) AS degree
    FROM (SELECT n AS node, count(*) AS degree
          FROM (SELECT u AS n FROM e{rounds}
                UNION ALL SELECT v FROM e{rounds})
          GROUP BY 1)
    WHERE degree >= {k}
    """)
    return "".join(parts)


@register("g_kcore", oracle=_kcore_oracle())
def g_kcore(spark, sf_dir):
    """Bounded-round k-core extraction (operators/graph.kcore; Seidman
    1983) — the g_pagerank fixed-round device closes round 7's one
    oracle gap: 3 peel rounds at k=3 over a hash-thinned supplier→part
    graph (the scramble-thinned derivation gives mean degree ~2.5, so
    round 1 peels ~7% of nodes and later rounds exercise the
    idempotent-once-converged property). `max_iters=3` makes the Spark
    loop and the 3-round unrolled SQL the SAME function of the input at
    any SF — convergence earlier than the bound is absorbed because a
    peel round at the fixed point is a no-op on both sides. The
    UNBOUNDED fixpoint loop (the production entry point) keeps its
    pytest hand-graph evidence (peel-cascade path graph, K4+tail)."""
    from pandasvcf_spark.operators.graph import kcore

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (
                (
                    F.col("l_suppkey") * F.lit(2654435761)
                    + F.col("l_partkey") * 40503
                )
                % 2147483647
            )
            % 5
            == 0
        )
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("l_partkey") + 10000000).alias("dst"),
        )
    )
    return kcore(li, k=3, max_iters=3)


def _communities_oracle(rounds: int = 3) -> str:
    """Unrolled synchronous label propagation (the g_pagerank/g_kcore
    fixed-round device): one (neighbor-count, per-node max,
    min-label-argmax) CTE triple per round."""
    parts = [
        """
    WITH e AS (
      SELECT DISTINCT l_suppkey AS su, l_partkey + 10000000 AS pv
      FROM lineitem
      WHERE ((l_suppkey * 2654435761 + l_partkey * 40503)
             % 2147483647) % 5 = 0),
    und AS (
      SELECT su AS u, pv AS v FROM e UNION SELECT pv, su FROM e),
    l0 AS (SELECT DISTINCT u AS node, u AS label FROM und)"""
    ]
    for i in range(rounds):
        parts.append(f""",
    c{i} AS (SELECT und.u AS node, l.label, count(*) AS cnt
             FROM und JOIN l{i} l ON und.v = l.node GROUP BY 1, 2),
    m{i} AS (SELECT node, max(cnt) AS mc FROM c{i} GROUP BY node),
    l{i + 1} AS (SELECT c.node, min(c.label) AS label
                 FROM c{i} c JOIN m{i} m
                   ON c.node = m.node AND c.cnt = m.mc
                 GROUP BY c.node)""")
    parts.append(f"""
    SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
    FROM l{rounds}
    """)
    return "".join(parts)


@register("g_communities", oracle=_communities_oracle())
def g_communities(spark, sf_dir):
    """Label-propagation community detection (operators/graph.
    label_propagation; Raghavan et al. 2007, synchronous schedule,
    min-label tie-break): 3 fixed rounds over the same hash-thinned
    supplier→part graph as g_kcore — communities here are the
    link-graph neighborhoods a crawl-prioritization or domain-level
    dedup pass groups on (the detection-side complement of
    g_modularity's assignment AUDIT). Per round: one neighbor-label
    equi-join + one (node, label) count + one argmax fold (max of a
    (count, -label) struct — no rank window); the oracle is the
    UNROLLED schedule, one CTE triple per round, with the same
    min-among-argmax tie-break as an explicit max-count join."""
    from pandasvcf_spark.operators.graph import label_propagation

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (
                (
                    F.col("l_suppkey") * F.lit(2654435761)
                    + F.col("l_partkey") * 40503
                )
                % 2147483647
            )
            % 5
            == 0
        )
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("l_partkey") + 10000000).alias("dst"),
        )
    )
    out = label_propagation(li, iters=3)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.col("label").cast("long").alias("label"),
    )


@register(
    "m_scd2_history",
    oracle="""
    WITH base AS (
      SELECT o_custkey, o_orderkey, o_orderstatus, o_orderpriority,
             lag(o_orderstatus) OVER w AS ps,
             lag(o_orderpriority) OVER w AS pp,
             lag(o_orderkey) OVER w AS pv
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)),
    kept AS (
      SELECT o_custkey, o_orderkey AS valid_from,
             o_orderstatus, o_orderpriority
      FROM base
      WHERE pv IS NULL OR o_orderstatus IS DISTINCT FROM ps
         OR o_orderpriority IS DISTINCT FROM pp)
    SELECT o_custkey, valid_from,
           lead(valid_from) OVER w2 AS valid_to,
           lead(valid_from) OVER w2 IS NULL AS is_current,
           o_orderstatus, o_orderpriority
    FROM kept
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY valid_from)
    """,
)
def m_scd2_history(spark, sf_dir):
    """SCD Type-2 history build (operators/relational.scd2_history; the
    Kimball dimension load / CDC change-log compaction) over the orders
    update log per customer: consecutive no-op updates collapse,
    change rows carry [valid_from, valid_to) with an is_current flag.
    One shuffle — the change-detect and interval-close windows share
    the (key, version-order) exchange and sort. The oracle replays the
    null-safe change filter and both windows."""
    from pandasvcf_spark.operators.relational import scd2_history

    d = load(spark, sf_dir, "orders")
    return scd2_history(
        d, ["o_custkey"], "o_orderkey", ["o_orderstatus", "o_orderpriority"]
    )


@register(
    "r_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def r_unpivot(spark, sf_dir):
    """Generic wide→long melt (operators/reshape.unpivot_columns; the
    inverse of the R2 pivot family) over three lineitem measures: one
    local Expand node — the input scans ONCE however many columns melt,
    where the oracle's UNION ALL form (the only portable SQL spelling)
    scans once per column. Same rows either way; the plan is the
    point."""
    from pandasvcf_spark.operators.reshape import unpivot_columns

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
    )
    return unpivot_columns(
        li, ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
    )


@register(
    "j_hamming_fuzzy",
    oracle="""
    WITH ph AS (
      SELECT c_custkey,
             lpad(CAST((list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(CAST(c_custkey AS VARCHAR), ''),
                              c -> CAST(ascii(c) AS BIGINT))),
               (acc, c) -> (acc * 31 + c) % 2147483647)
               * 2654435761) % 2147483647 AS VARCHAR), 10, '0') AS key
      FROM customer),
    l AS (SELECT c_custkey AS lid, key AS s FROM ph),
    r AS (SELECT c_custkey + 10000000 AS rid,
                 substr(key, 1, c_custkey % 10) || 'X'
                 || substr(key, (c_custkey % 10) + 2) AS t
          FROM ph)
    SELECT lid, rid,
           CAST(list_sum(list_transform(generate_series(1, len(s)),
                i -> CASE WHEN s[i] <> t[i] THEN 1 ELSE 0 END)) AS INT)
             AS hamming
    FROM l JOIN r ON len(s) = len(t)
    WHERE list_sum(list_transform(generate_series(1, len(s)),
          i -> CASE WHEN s[i] <> t[i] THEN 1 ELSE 0 END)) <= 1
    """,
)
def j_hamming_fuzzy(spark, sf_dir):
    """Fuzzy Hamming-distance join (operators/relational.hamming_join;
    PassJoin pigeonhole, exact for Hamming) matching a 10-digit key per
    customer against a 1-character-corrupted copy — the barcode-
    demultiplexing / noisy-key-linkage shape. The key is the customer
    id's SCRAMBLED portable hash, zero-padded: raw names share the
    constant run 'Customer#', which parks one whole segment in a single
    bucket and degenerates candidates toward n² (measured: the first
    fixture cut timed out at sf0.1 exactly as the operator docstring's
    skew warning predicts) — a scrambled-hash key spreads entropy over
    BOTH segments. The oracle affords the naive length-gated theta join
    with a per-pair mismatch fold."""
    from pandasvcf_spark.functions.text import POLY_MOD, poly_hash_expr
    from pandasvcf_spark.operators.relational import hamming_join

    c = load(spark, sf_dir, "customer")
    key = F.lpad(
        (
            (poly_hash_expr(F.col("c_custkey").cast("string"))
             * F.lit(2654435761)) % F.lit(POLY_MOD)
        ).cast("string"),
        10,
        "0",
    )
    ph = c.select("c_custkey", key.alias("key"))
    left = ph.select(F.col("c_custkey").alias("lid"), F.col("key").alias("s"))
    p0 = (F.col("c_custkey") % 10).cast("int")
    noised = F.concat(
        F.col("key").substr(F.lit(1), p0),
        F.lit("X"),
        F.col("key").substr(p0 + F.lit(2), F.length(F.col("key"))),
    )
    right = ph.select(
        (F.col("c_custkey") + 10000000).alias("rid"), noised.alias("t")
    )
    return hamming_join(left, right, "lid", "s", "rid", "t", k=1)


@register(
    "m_corpus_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus,
             round(o_totalprice, 2) AS price
      FROM orders),
    new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0
                  THEN round(round(o_totalprice, 2) * 2, 2)
                  ELSE round(o_totalprice, 2) END AS price
      FROM orders WHERE o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderkey + 900000000, o_orderstatus,
             round(o_totalprice, 2)
      FROM orders WHERE o_orderkey % 11 = 0),
    j AS (
      SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
             CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  WHEN o.price IS DISTINCT FROM n.price
                    OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  THEN 'changed'
                  ELSE 'unchanged' END AS change
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
    SELECT CAST(k AS BIGINT) AS o_orderkey, change
    FROM j WHERE change <> 'unchanged'
    """,
)
def m_corpus_diff(spark, sf_dir):
    """Snapshot delta (operators/relational.corpus_diff) between a base
    orders snapshot and a refreshed one (every 13th key dropped →
    removed, every 7th price doubled → changed, every 11th key
    re-inserted shifted → added): the question an incremental pipeline
    asks before re-processing 100 TB it already processed. One
    full-outer shuffle join + a pure CASE; unchanged rows (the bulk)
    never leave the plan. The oracle replays the identical join and
    NULL-safe comparisons."""
    from pandasvcf_spark.operators.relational import corpus_diff

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
    )
    new = (
        o.filter(F.col("o_orderkey") % 13 != 0)
        .withColumn(
            "price",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.round(F.col("price") * 2, 2)
            ).otherwise(F.col("price")),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 11 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 900000000
            )
        )
    )
    out = corpus_diff(o, new, "o_orderkey")
    return out.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"), "change"
    )


@register(
    "agg_exact_quantiles",
    oracle="""
    SELECT 0.01::DOUBLE AS p, CAST(quantile_disc(l_extendedprice, 0.01) AS DOUBLE)
             AS value FROM lineitem
    UNION ALL
    SELECT 0.25::DOUBLE, CAST(quantile_disc(l_extendedprice, 0.25) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 0.5::DOUBLE, CAST(quantile_disc(l_extendedprice, 0.5) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 0.75::DOUBLE, CAST(quantile_disc(l_extendedprice, 0.75) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 0.99::DOUBLE, CAST(quantile_disc(l_extendedprice, 0.99) AS DOUBLE)
    FROM lineitem
    """,
)
def agg_exact_quantiles(spark, sf_dir):
    """Bucketed two-pass EXACT quantiles (operators/relational.
    exact_quantiles) of lineitem prices — the scale-honest order
    statistic: Spark's exact percentile aggregate buffers the whole
    column per group, so at 10¹¹ rows the only exact path is this
    bucket device (histogram to the driver, sort only the ≤|probs|
    target buckets). Type-1 lower discrete convention == DuckDB
    quantile_disc, which the oracle calls directly — the strongest
    equivalence form: the oracle doesn't replay the algorithm, it
    states the definition."""
    from pandasvcf_spark.operators.relational import exact_quantiles

    li = load(spark, sf_dir, "lineitem")
    return exact_quantiles(
        li, "l_extendedprice", [0.01, 0.25, 0.5, 0.75, 0.99]
    )


@register(
    "j_edit_fuzzy",
    oracle="""
    WITH ph AS (
      SELECT c_custkey,
             lpad(CAST((list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(CAST(c_custkey AS VARCHAR), ''),
                              c -> CAST(ascii(c) AS BIGINT))),
               (acc, c) -> (acc * 31 + c) % 2147483647)
               * 2654435761) % 2147483647 AS VARCHAR), 10, '0') AS key
      FROM customer),
    l AS (SELECT c_custkey AS lid, key AS s FROM ph),
    r AS (SELECT c_custkey + 10000000 AS rid,
             CASE c_custkey % 3
               WHEN 0 THEN substr(key, 1, c_custkey % 10)
                        || substr(key, (c_custkey % 10) + 2)
               WHEN 1 THEN substr(key, 1, c_custkey % 10) || 'X'
                        || substr(key, (c_custkey % 10) + 2)
               ELSE substr(key, 1, (c_custkey % 10) + 1) || 'X'
                        || substr(key, (c_custkey % 10) + 2)
             END AS t
          FROM ph)
    SELECT lid, rid, CAST(levenshtein(s, t) AS INT) AS dist
    FROM l JOIN r ON abs(len(s) - len(t)) <= 1
    WHERE levenshtein(s, t) <= 1
    """,
)
def j_edit_fuzzy(spark, sf_dir):
    """Fuzzy Levenshtein-distance join (operators/relational.
    edit_distance_join; symmetric-delete blocking, SymSpell device)
    matching each customer's scrambled 10-digit hash key against a
    1-edit-corrupted copy — a third each deleted / substituted /
    INSERTED at a key-dependent position, so alignment-shifting edits
    (the case `hamming_join`'s pigeonhole cannot express) are
    exercised on every row. Candidates come from ONE equi-join on the
    deletion-neighborhood variant; the oracle affords the naive
    length-gated theta join with DuckDB's levenshtein."""
    from pandasvcf_spark.functions.text import POLY_MOD, poly_hash_expr
    from pandasvcf_spark.operators.relational import edit_distance_join

    c = load(spark, sf_dir, "customer")
    key = F.lpad(
        (
            (poly_hash_expr(F.col("c_custkey").cast("string"))
             * F.lit(2654435761)) % F.lit(POLY_MOD)
        ).cast("string"),
        10,
        "0",
    )
    ph = c.select("c_custkey", key.alias("key"))
    left = ph.select(F.col("c_custkey").alias("lid"), F.col("key").alias("s"))
    kcol = F.col("key")
    p0 = (F.col("c_custkey") % 10).cast("int")  # 0..9; edit pos = p0+1
    pre = kcol.substr(F.lit(1), p0)
    post = kcol.substr(p0 + F.lit(2), F.length(kcol))
    mode = F.col("c_custkey") % 3
    t = (
        F.when(mode == 0, F.concat(pre, post))
        .when(mode == 1, F.concat(pre, F.lit("X"), post))
        .otherwise(
            F.concat(
                kcol.substr(F.lit(1), p0 + F.lit(1)), F.lit("X"), post
            )
        )
    )
    right = ph.select(
        (F.col("c_custkey") + 10000000).alias("rid"), t.alias("t")
    )
    return edit_distance_join(left, right, "lid", "s", "rid", "t", k=1)


@register(
    "m_group_auc",
    oracle="""
    WITH base AS (
      SELECT vec_id % 4 AS shard,
             embedding[1] AS s,
             CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
      FROM embeddings
      WHERE embedding IS NOT NULL AND label IS NOT NULL),
    ranked AS (
      SELECT shard, y,
             CAST(rank() OVER (PARTITION BY shard ORDER BY s) AS DOUBLE)
               + (count(*) OVER (PARTITION BY shard, s) - 1) / 2.0 AS r
      FROM base),
    agg AS (
      SELECT shard,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(1 - y) AS BIGINT) AS n_neg,
             sum(CASE WHEN y = 1 THEN r END) AS rp
      FROM ranked GROUP BY shard)
    SELECT shard, n_pos, n_neg,
           round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             (rp - CAST(n_pos AS DOUBLE) * (n_pos + 1) / 2.0)
               / (CAST(n_pos AS DOUBLE) * n_neg) END, 6) AS auc
    FROM agg ORDER BY shard
    """,
)
def m_group_auc(spark, sf_dir):
    """Per-group ROC-AUC (operators/relational.group_auc; Mann-Whitney
    rank form with tie-averaged ranks) — the quality-classifier
    evaluation loop: per shard (vec_id % 4), how well does the first
    embedding coordinate separate labels 0-4 from 5-9? Expected ~0.5
    on this synthetic corpus — the entry checks the statistic, not the
    classifier. One group-keyed exchange serves the rank window, the
    tie window and the final agg; AUC is a pure rank-sum expression,
    replayed exactly (average-rank tie term included) by the oracle.
    embedding[1] in DuckDB == embedding[0] in Spark (1- vs 0-based)."""
    from pandasvcf_spark.operators.relational import group_auc

    e = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    d = e.select(
        (F.col("vec_id") % 4).alias("shard"),
        F.col("embedding")[0].cast("double").alias("s"),
        F.when(F.col("label") < 5, 1).otherwise(0).alias("y"),
    )
    return group_auc(d, ["shard"], "s", "y").orderBy("shard")


@register(
    "j_sorted_neighborhood",
    oracle="""
    WITH r AS (
      SELECT c_custkey AS id, c_name AS k,
             row_number() OVER (ORDER BY c_name, c_custkey) AS rk
      FROM customer WHERE c_name IS NOT NULL),
    p AS (
      SELECT a.id AS a_id, b.id AS b_id, a.k AS a_key, b.k AS b_key
      FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 2)
    SELECT a_id, b_id, CAST(levenshtein(a_key, b_key) AS INT) AS dist
    FROM p WHERE levenshtein(a_key, b_key) <= 2
    """,
)
def j_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood blocking (operators/relational.
    sorted_neighborhood_join; Hernández-Stolfo 1995) over customer
    names, window 3, Levenshtein-verified at <= 2: candidate pairs are
    the <= 2 records ahead in name order — n·(window−1) pair work
    whatever the distribution. The Spark side never runs the global
    sort in one task (monotone digit-prefix buckets sort in parallel;
    exact global ranks from one buckets-sized offset window — the
    bucket-offset device); the oracle's single-window global
    row_number defines the same total order, and the explode+equi-join
    pair generation must reproduce its band-join pairs exactly."""
    from pandasvcf_spark.operators.relational import (
        sorted_neighborhood_join,
    )

    c = load(spark, sf_dir, "customer")
    out = sorted_neighborhood_join(
        c,
        "c_custkey",
        "c_name",
        window=3,
        bucket_expr=F.substring(F.col("c_name"), 10, 3),
        max_dist=2,
    )
    return out.select("a_id", "b_id", "dist")


@register(
    "m_mutual_info",
    oracle="""
    WITH cells AS (
      SELECT lang AS x, source AS y, CAST(count(*) AS DOUBLE) AS nxy
      FROM documents
      WHERE lang IS NOT NULL AND source IS NOT NULL
      GROUP BY lang, source),
    marg AS (
      SELECT x, y, nxy,
             sum(nxy) OVER (PARTITION BY x) AS nx,
             sum(nxy) OVER (PARTITION BY y) AS ny
      FROM cells),
    agg AS (
      SELECT CAST(sum(nxy) AS BIGINT) AS n,
             CAST(count(DISTINCT x) AS BIGINT) AS r,
             CAST(count(DISTINCT y) AS BIGINT) AS c,
             sum(nxy * ln(nxy / (nx * ny))) AS mi_raw,
             sum(nxy * nxy / (nx * ny)) AS chi_frac
      FROM marg),
    stats AS (
      SELECT n, r, c,
             CASE WHEN n > 0 THEN mi_raw / n + ln(n) END AS mi_v,
             greatest(n * (chi_frac - 1.0), 0.0) AS chi2_v
      FROM agg)
    SELECT n, r, c,
           round(mi_v, 6) + 0.0 AS mi,
           round(chi2_v, 4) + 0.0 AS chi2,
           CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
           round(CASE WHEN least(r, c) > 1 AND n > 0 THEN
             sqrt(chi2_v / (n * (least(r, c) - 1.0))) END, 6) + 0.0
             AS cramers_v
    FROM stats
    """,
)
def m_mutual_info(spark, sf_dir):
    """Mutual information + chi-square association between lang and
    source on documents (operators/relational.mutual_information) —
    the feature-relevance / leakage screen. One groupBy(x, y) collapses
    the corpus to cell counts (the only data-sized shuffle); marginals
    are window sums over the cells table; the sparse-exact closed form
    n·(Σ n_xy²/(n_x·n_y) − 1) makes Pearson's chi-square correct
    without materializing absent cells. The oracle replays cells,
    marginals and both statistics term-for-term."""
    from pandasvcf_spark.operators.relational import mutual_information

    d = load(spark, sf_dir, "documents")
    return mutual_information(d, "lang", "source")


@register(
    "m_ks_lift",
    oracle="""
    WITH s AS (
      SELECT event_id, value AS sc,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    ed AS (
      SELECT unnest(quantile_disc(sc,
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS e
      FROM s),
    binned AS (
      SELECT s.event_id, s.y, 11 - (1 + count(ed.e)) AS bin
      FROM s LEFT JOIN ed ON s.sc > ed.e
      GROUP BY s.event_id, s.y),
    agg AS (
      SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos
      FROM binned GROUP BY bin),
    tot AS (
      SELECT CAST(sum(n) AS DOUBLE) AS tn,
             CAST(sum(n_pos) AS DOUBLE) AS tp
      FROM agg),
    cum AS (
      SELECT bin, n, n_pos, tn, tp, tn - tp AS neg,
             CAST(sum(n) OVER (ORDER BY bin) AS DOUBLE) AS cum_n,
             CAST(sum(n_pos) OVER (ORDER BY bin) AS DOUBLE) AS cum_p
      FROM agg, tot),
    fr AS (
      SELECT bin, n, n_pos, cum_n, cum_p,
             CAST(n_pos AS DOUBLE) / n AS pos_rate,
             CASE WHEN tp > 0 THEN tp / tn END AS base,
             CASE WHEN tp > 0 THEN cum_p / tp END AS cpf,
             CASE WHEN neg > 0 THEN (cum_n - cum_p) / neg END AS cnf
      FROM cum)
    SELECT CAST(bin AS INT) AS bin, n, n_pos,
           round(pos_rate, 6) + 0.0 AS pos_rate,
           round(cpf, 6) + 0.0 AS cum_pos_frac,
           round(cnf, 6) + 0.0 AS cum_neg_frac,
           round(abs(cpf - cnf), 6) + 0.0 AS ks,
           round(pos_rate / base, 6) + 0.0 AS lift,
           round((cum_p / cum_n) / base, 6) + 0.0 AS cum_lift
    FROM fr ORDER BY bin
    """,
)
def m_ks_lift(spark, sf_dir):
    """Decile lift/gain + KS separation for events.value scoring the
    'error' label (operators/relational.ks_lift_table) — the
    model-evaluation report beside m_group_auc's scalar AUC. Exact
    quantile-threshold binning (type-1 / quantile_disc semantics, tied
    scores share a bin) instead of a global-sort ntile; one groupBy(bin)
    collapses the corpus, totals broadcast back as a 1-row cross join,
    cumulative window over the ≤10-row bins table. Expected ~1.0 lift
    on this synthetic corpus — the entry checks the statistics, not the
    classifier. The oracle rebuilds edges with quantile_disc and
    replays binning, cumulative fractions, KS and lift term-for-term."""
    from pandasvcf_spark.operators.relational import ks_lift_table

    e = load(spark, sf_dir, "events")
    d = e.select(
        F.col("value").alias("sc"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("y"),
    ).filter(F.col("sc").isNotNull())
    return ks_lift_table(d, "sc", "y", n_bins=10)


@register(
    "agg_grouped_quantiles",
    oracle="""
    WITH nn AS (
      SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v
      FROM lineitem WHERE l_extendedprice IS NOT NULL)
    SELECT l_returnflag, 0.25::DOUBLE AS p,
           CAST(quantile_disc(v, 0.25) AS DOUBLE) AS value
    FROM nn GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 0.5::DOUBLE,
           CAST(quantile_disc(v, 0.5) AS DOUBLE)
    FROM nn GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 0.75::DOUBLE,
           CAST(quantile_disc(v, 0.75) AS DOUBLE)
    FROM nn GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 0.95::DOUBLE,
           CAST(quantile_disc(v, 0.95) AS DOUBLE)
    FROM nn GROUP BY l_returnflag
    """,
)
def agg_grouped_quantiles(spark, sf_dir):
    """Fully distributed EXACT per-group quantiles (operators/
    relational.grouped_exact_quantiles) of lineitem prices by return
    flag — the grouped twin of agg_exact_quantiles, with the bucket
    walk distributed instead of collected: per-group stats join-back,
    (group, bucket) histogram, cumulative window along each group's
    bucket axis locates every target rank, and only targeted buckets
    get ranked. No global sort, no driver round trip, no per-group
    value buffering (the failure mode of Spark's exact percentile on a
    10⁹-row group). Oracle states the definition: per-group
    quantile_disc."""
    from pandasvcf_spark.operators.relational import (
        grouped_exact_quantiles,
    )

    li = load(spark, sf_dir, "lineitem")
    return grouped_exact_quantiles(
        li, ["l_returnflag"], "l_extendedprice", [0.25, 0.5, 0.75, 0.95]
    )


@register(
    "m_profile",
    oracle="""
    SELECT 'event_id' AS col_name, 'bigint' AS dtype,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null,
           round(CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS null_frac,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(min(event_id) AS DOUBLE) AS min_num,
           CAST(max(event_id) AS DOUBLE) AS max_num,
           round(avg(CAST(event_id AS DOUBLE)), 6) AS mean,
           CAST(NULL AS VARCHAR) AS min_str,
           CAST(NULL AS VARCHAR) AS max_str
    FROM events
    UNION ALL
    SELECT 'user_id', 'bigint', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           round(CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6),
           CAST(count(DISTINCT user_id) AS BIGINT),
           CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE),
           round(avg(CAST(user_id AS DOUBLE)), 6),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM events
    UNION ALL
    SELECT 'event_type', 'string', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           round(CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6),
           CAST(count(DISTINCT event_type) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE),
           min(event_type), max(event_type)
    FROM events
    UNION ALL
    SELECT 'value', 'double', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           round(CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6),
           CAST(count(DISTINCT value) AS BIGINT),
           CAST(min(value) AS DOUBLE), CAST(max(value) AS DOUBLE),
           round(avg(CAST(value AS DOUBLE)), 6),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM events
    """,
)
def m_profile(spark, sf_dir):
    """One-call column profiling of events (operators/relational.
    profile_table) — the data-quality screen on a freshly-landed table:
    per column, null fraction, exact distinct count, typed min/max/mean
    (numeric) or lexicographic min/max (string). ONE aggregation pass
    however many columns profile (the stack() unpivot runs over the
    1-row agg result, never the data); exact_distinct=False documents
    the HLL path for true corpus scale. The oracle recomputes every
    column's row with plain SQL aggregates."""
    from pandasvcf_spark.operators.relational import profile_table

    e = load(spark, sf_dir, "events")
    return profile_table(
        e, ["event_id", "user_id", "event_type", "value"]
    )


@register(
    "g_assortativity",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 4 = 0),
    raw AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
             greatest(a.l_partkey, b.l_partkey) AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
    deg AS (
      SELECT n, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT u AS n FROM raw UNION ALL SELECT v AS n FROM raw)
      GROUP BY 1),
    sym AS (
      SELECT u, v FROM raw UNION ALL SELECT v AS u, u AS v FROM raw),
    j AS (
      SELECT CAST(da.d AS DOUBLE) AS dx, CAST(db.d AS DOUBLE) AS dy
      FROM sym
      JOIN deg da ON sym.u = da.n
      JOIN deg db ON sym.v = db.n),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS L,
             sum(dx) AS sx, sum(dy) AS sy, sum(dx * dy) AS sxy,
             sum(dx * dx) AS sxx, sum(dy * dy) AS syy
      FROM j),
    g AS (
      SELECT L, sxy, sx, sy,
             greatest(L * sxx - sx * sx, 0.0) AS vx,
             greatest(L * syy - sy * sy, 0.0) AS vy
      FROM m),
    dd AS (
      SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d) AS BIGINT) AS sd
      FROM deg)
    SELECT dd.n_nodes,
           CAST(g.L / 2 AS BIGINT) AS n_edges,
           round(CAST(dd.sd AS DOUBLE) / dd.n_nodes, 6) + 0.0
             AS mean_degree,
           round(CASE WHEN vx > 0 AND vy > 0
                 THEN (L * sxy - sx * sy) / sqrt(vx) / sqrt(vy) END, 6)
             + 0.0 AS assortativity
    FROM g, dd
    """,
)
def g_assortativity(spark, sf_dir):
    """Degree assortativity of the parts co-purchase graph
    (operators/graph.assortativity; Newman 2002) — the mixing
    diagnostic beside g_triangles' clustering coefficient, on the SAME
    linearly-growing edge derivation. Degrees join node-keyed onto
    both orientations of each edge; the Pearson closed form is a 1-row
    agg. The oracle replays degrees, the symmetrized join and the
    guarded quotient."""
    from pandasvcf_spark.operators.graph import assortativity

    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 4 == 0
    ).select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(b, on="l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.least(F.col("a.l_partkey"), F.col("b.l_partkey")).alias("u"),
            F.greatest(F.col("a.l_partkey"), F.col("b.l_partkey"))
            .alias("v"),
        )
        .distinct()
    )
    return assortativity(edges)


@register(
    "g_modularity",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 4 = 0),
    raw AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
             greatest(a.l_partkey, b.l_partkey) AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
    mt AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM raw),
    deg AS (
      SELECT n, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT u AS n FROM raw UNION ALL SELECT v AS n FROM raw)
      GROUP BY 1),
    dstats AS (
      SELECT n % 8 AS community,
             CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d) AS BIGINT) AS degree_sum
      FROM deg GROUP BY n % 8),
    inner_e AS (
      SELECT u % 8 AS community, CAST(count(*) AS BIGINT) AS inner_edges
      FROM raw WHERE u % 8 = v % 8 GROUP BY u % 8)
    SELECT d.community, d.n_nodes,
           CAST(coalesce(i.inner_edges, 0) AS BIGINT) AS inner_edges,
           d.degree_sum,
           round(CAST(coalesce(i.inner_edges, 0) AS DOUBLE) / m
                 - (CAST(d.degree_sum AS DOUBLE) / (2.0 * m))
                   * (CAST(d.degree_sum AS DOUBLE) / (2.0 * m)), 6)
             + 0.0 AS q
    FROM dstats d LEFT JOIN inner_e i ON d.community = i.community, mt
    """,
)
def g_modularity(spark, sf_dir):
    """Per-community modularity terms of a hash partition (node % 8)
    of the co-purchase graph (operators/graph.modularity; Newman &
    Girvan 2004) — expected ~0 total Q for a structure-blind hash
    split, which is the point: the entry checks the audit arithmetic
    that scores ANY imposed grouping against the link structure.
    Degrees + both community joins are node-keyed; everything
    aggregates community-sized. The oracle replays degrees, inner
    edges and the q terms."""
    from pandasvcf_spark.operators.graph import modularity

    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 4 == 0
    ).select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, on="l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.least(F.col("a.l_partkey"), F.col("b.l_partkey")).alias("u"),
            F.greatest(F.col("a.l_partkey"), F.col("b.l_partkey"))
            .alias("v"),
        )
        .distinct()
    )
    nodes = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .distinct()
    )
    cm = nodes.select("n", (F.col("n") % 8).alias("c"))
    return modularity(edges, cm)


# --- ranking-metric / classical-statistics family (operators/stats) --------

@register(
    "m_ndcg",
    oracle="""
    WITH b AS (
      SELECT vec_id % 5 AS qid, vec_id AS id,
             CAST(embedding[2] AS DOUBLE) AS s,
             CAST(label AS DOUBLE) AS rel
      FROM embeddings
      WHERE embedding IS NOT NULL AND label IS NOT NULL),
    r AS (
      SELECT qid, rel,
             row_number() OVER (
               PARTITION BY qid ORDER BY s DESC, id) AS r1,
             row_number() OVER (
               PARTITION BY qid ORDER BY rel DESC, id) AS r2,
             power(2.0, rel) - 1.0 AS g
      FROM b),
    a AS (
      SELECT qid, CAST(count(*) AS BIGINT) AS n,
             sum(CASE WHEN r1 <= 10
                 THEN g / log2(r1 + 1.0) END) AS dcg,
             sum(CASE WHEN r2 <= 10
                 THEN g / log2(r2 + 1.0) END) AS idcg
      FROM r GROUP BY qid)
    SELECT qid, n,
           round(coalesce(dcg, 0.0), 6) + 0.0 AS dcg,
           round(coalesce(idcg, 0.0), 6) + 0.0 AS idcg,
           round(CASE WHEN idcg > 0 THEN dcg / idcg END, 6) + 0.0
             AS ndcg
    FROM a ORDER BY qid
    """,
)
def m_ndcg(spark, sf_dir):
    """Per-query NDCG@10 (operators/stats.ndcg_at_k) of the second
    embedding coordinate ranking graded relevance = label, queries =
    vec_id % 5 — the retrieval-evaluation loop for ranker tuning.
    Expected ~mid-range NDCG on this structure-free corpus — the
    entry checks the metric, not the ranker. One group-keyed exchange
    serves the score-rank window, the ideal-rank window and the final
    agg; gains/discounts are pure expressions. embedding[2] in DuckDB
    == embedding[1] in Spark (1- vs 0-based)."""
    from pandasvcf_spark.operators.stats import ndcg_at_k

    e = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    d = e.select(
        (F.col("vec_id") % 5).alias("qid"),
        F.col("vec_id").alias("id"),
        F.col("embedding")[1].cast("double").alias("s"),
        F.col("label").alias("rel"),
    )
    return ndcg_at_k(d, ["qid"], "s", "rel", "id", k=10).orderBy("qid")


@register(
    "m_avg_precision",
    oracle="""
    WITH b AS (
      SELECT vec_id % 5 AS qid, vec_id AS id,
             CAST(embedding[3] AS DOUBLE) AS s,
             CASE WHEN label < 3 THEN 1 ELSE 0 END AS y
      FROM embeddings
      WHERE embedding IS NOT NULL AND label IS NOT NULL),
    r AS (
      SELECT qid, y,
             row_number() OVER (
               PARTITION BY qid ORDER BY s DESC, id) AS i,
             sum(y) OVER (
               PARTITION BY qid ORDER BY s DESC, id) AS cum
      FROM b),
    a AS (
      SELECT qid, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             sum(CASE WHEN y = 1
                 THEN CAST(cum AS DOUBLE) / i END) AS apn
      FROM r GROUP BY qid)
    SELECT qid, n, n_pos,
           round(CASE WHEN n_pos > 0 THEN apn / n_pos END, 6) AS ap
    FROM a ORDER BY qid
    """,
)
def m_avg_precision(spark, sf_dir):
    """Per-query average precision (operators/stats.average_precision)
    of the third embedding coordinate against binary relevance
    label < 3, queries = vec_id % 5 — the PR-curve-area partner of
    m_ndcg and the ranking-aware complement of m_group_auc's AUC.
    One exchange: row_number + running-positive-count over the same
    (score DESC, id) sort, then one groupBy. Expected ~base-rate AP
    on this synthetic corpus — the entry checks the metric."""
    from pandasvcf_spark.operators.stats import average_precision

    e = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    d = e.select(
        (F.col("vec_id") % 5).alias("qid"),
        F.col("vec_id").alias("id"),
        F.col("embedding")[2].cast("double").alias("s"),
        F.when(F.col("label") < 3, 1).otherwise(0).alias("y"),
    )
    return average_precision(d, ["qid"], "s", "y", "id").orderBy("qid")


@register(
    "m_mann_whitney",
    oracle="""
    WITH b AS (
      SELECT c_nationkey AS nation, c_acctbal AS v,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
               AS f
      FROM customer
      WHERE c_acctbal IS NOT NULL AND c_mktsegment IS NOT NULL),
    r AS (
      SELECT nation, f,
             CAST(rank() OVER (
               PARTITION BY nation ORDER BY v) AS DOUBLE)
               + (count(*) OVER (PARTITION BY nation, v) - 1) / 2.0
               AS rk
      FROM b),
    t AS (
      SELECT nation, sum(tt * tt * tt - tt) AS tsum
      FROM (SELECT nation, CAST(count(*) AS DOUBLE) AS tt
            FROM b GROUP BY nation, v)
      GROUP BY nation),
    a AS (
      SELECT nation, CAST(sum(f) AS BIGINT) AS n1,
             CAST(sum(1 - f) AS BIGINT) AS n2,
             sum(CASE WHEN f = 1 THEN rk END) AS r1
      FROM r GROUP BY nation),
    m AS (
      SELECT a.nation AS nation, n1, n2,
             r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0 AS u1,
             CAST(n1 AS DOUBLE) * n2 / 2.0 AS mu,
             CAST(n1 AS DOUBLE) * n2 / 12.0
               * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                  - tsum / (CAST(n1 + n2 AS DOUBLE)
                            * (CAST(n1 + n2 AS DOUBLE) - 1.0))) AS vv
      FROM a JOIN t ON a.nation = t.nation)
    SELECT nation, n1, n2,
           round(CASE WHEN n1 > 0 AND n2 > 0 THEN u1 END, 4) + 0.0
             AS u,
           round(CASE WHEN n1 > 0 AND n2 > 0 AND vv > 0
                 THEN (u1 - mu) / sqrt(vv) END, 6) + 0.0 AS z
    FROM m ORDER BY nation
    """,
)
def m_mann_whitney(spark, sf_dir):
    """Per-nation Mann-Whitney U test (operators/stats.mann_whitney_u,
    tie-corrected normal approximation, no continuity correction) of
    account balance between BUILDING-segment customers and the rest —
    the nonparametric A/B partner of m_ab_test. Rank + tie windows on
    one exchange; the tie-correction term is a (group, value)-keyed
    partial agg; U and z replay exactly (rank sums of halves are
    exact doubles, the z expression is operand-identical)."""
    from pandasvcf_spark.operators.stats import mann_whitney_u

    c = load(spark, sf_dir, "customer").filter(
        F.col("c_acctbal").isNotNull() & F.col("c_mktsegment").isNotNull()
    )
    d = c.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_acctbal").alias("v"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1)
        .otherwise(0)
        .alias("f"),
    )
    return mann_whitney_u(d, ["nation"], "v", "f").orderBy("nation")


@register(
    "m_spearman",
    oracle="""
    WITH b AS (
      SELECT l_returnflag AS rf, l_quantity AS x, l_extendedprice AS y
      FROM lineitem
      WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
        AND l_extendedprice IS NOT NULL),
    r AS (
      SELECT rf,
             CAST(rank() OVER (PARTITION BY rf ORDER BY x) AS DOUBLE)
               + (count(*) OVER (PARTITION BY rf, x) - 1) / 2.0 AS a,
             CAST(rank() OVER (PARTITION BY rf ORDER BY y) AS DOUBLE)
               + (count(*) OVER (PARTITION BY rf, y) - 1) / 2.0 AS bb
      FROM b),
    g AS (
      SELECT rf, CAST(count(*) AS BIGINT) AS n,
             sum(a) AS sa, sum(bb) AS sb,
             sum(a * a) AS saa, sum(bb * bb) AS sbb,
             sum(a * bb) AS sab
      FROM r GROUP BY rf),
    m AS (
      SELECT rf, n,
             CAST(n AS DOUBLE) * saa - sa * sa AS vx,
             CAST(n AS DOUBLE) * sbb - sb * sb AS vy,
             CAST(n AS DOUBLE) * sab - sa * sb AS num
      FROM g)
    SELECT rf, n,
           round(CASE WHEN vx > 0 AND vy > 0
                 THEN num / sqrt(vx * vy) END, 6) + 0.0 AS rho
    FROM m ORDER BY rf
    """,
)
def m_spearman(spark, sf_dir):
    """Per-returnflag Spearman rank correlation (operators/stats.
    spearman_corr) between quantity and extended price — the
    monotone-association screen for feature/quality signals. Four
    windows (two rank sorts + two tie partitions) on ONE group-keyed
    exchange, then a moment-formula groupBy; tie-averaged ranks are
    exact doubles (multiples of 1/2), their products multiples of
    1/4, and every sum stays below 2^53/4 at the gated scale — the
    statistic replays bit-for-bit."""
    from pandasvcf_spark.operators.stats import spearman_corr

    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isNotNull()
        & F.col("l_quantity").isNotNull()
        & F.col("l_extendedprice").isNotNull()
    )
    d = li.select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    return spearman_corr(d, ["rf"], "x", "y").orderBy("rf")


@register(
    "m_anova",
    oracle="""
    WITH b AS (
      SELECT c_mktsegment AS g, c_acctbal AS v FROM customer
      WHERE c_acctbal IS NOT NULL AND c_mktsegment IS NOT NULL),
    p AS (
      SELECT g, CAST(count(*) AS DOUBLE) AS n,
             sum(v) AS s, sum(v * v) AS q
      FROM b GROUP BY g),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS n,
             sum(s) AS gs, sum(q) AS gq,
             sum(s * s / n) AS w
      FROM p),
    m AS (
      SELECT k, n,
             w - gs * gs / CAST(n AS DOUBLE) AS ssb,
             gq - w AS ssw
      FROM t)
    SELECT k, n,
           round(CASE WHEN k >= 2 AND CAST(n AS DOUBLE) > CAST(k AS DOUBLE)
                      AND ssw > 0
                 THEN (ssb / (CAST(k AS DOUBLE) - 1.0))
                      / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
                 END, 6) + 0.0 AS f_stat,
           round(CASE WHEN ssb + ssw > 0
                 THEN ssb / (ssb + ssw) END, 6) + 0.0 AS eta_sq
    FROM m
    """,
)
def m_anova(spark, sf_dir):
    """One-way ANOVA (operators/stats.anova_oneway) of account balance
    across market segments — the k-sample does-the-grouping-matter
    screen. Two-level combiner tree (per-level partials, 1-row global
    agg); only the ratio statistics (F, eta-squared) are output — raw
    SS terms at ~sum-of-squares magnitude cannot round stably across
    engine accumulation orders, the ratios carry ~1e-10 relative
    error. Expected F ~ 1 on this segment-blind synthetic data."""
    from pandasvcf_spark.operators.stats import anova_oneway

    c = load(spark, sf_dir, "customer").filter(
        F.col("c_acctbal").isNotNull() & F.col("c_mktsegment").isNotNull()
    )
    d = c.select(
        F.col("c_mktsegment").alias("g"), F.col("c_acctbal").alias("v")
    )
    return anova_oneway(d, "g", "v")


# --- graph: link prediction / local clustering / bounded BFS ----------------

_COPURCHASE_EDGES = """
    li AS (
      SELECT l_orderkey, l_partkey FROM lineitem
      WHERE l_orderkey % 4 = 0),
    e0 AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
             greatest(a.l_partkey, b.l_partkey) AS v
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey)"""


def _copurchase_edges(spark, sf_dir):
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, on="l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )


@register(
    "g_link_pred",
    oracle=f"""
    WITH {_COPURCHASE_EDGES},
    adj AS (SELECT u AS w, v AS x FROM e0
            UNION ALL SELECT v AS w, u AS x FROM e0),
    deg AS (SELECT w, CAST(count(*) AS BIGINT) AS d
            FROM adj GROUP BY w),
    wed AS (
      SELECT a.w AS w, a.x AS u, b.x AS v
      FROM adj a JOIN adj b ON a.w = b.w AND a.x < b.x),
    sc AS (
      SELECT u, v, CAST(count(*) AS BIGINT) AS cn,
             round(sum(1.0 / ln(CAST(d AS DOUBLE))), 6) AS aa
      FROM wed JOIN deg ON wed.w = deg.w
      GROUP BY u, v),
    cand AS (
      SELECT sc.u, sc.v, sc.cn, sc.aa FROM sc
      WHERE NOT EXISTS (SELECT 1 FROM e0
                        WHERE e0.u = sc.u AND e0.v = sc.v))
    SELECT u, v, cn, aa FROM cand
    ORDER BY aa DESC, u, v LIMIT 50
    """,
)
def g_link_pred(spark, sf_dir):
    """Adamic-Adar link prediction (operators/graph.link_prediction)
    over the co-purchase part graph — top-50 non-adjacent pairs by
    shared-neighbor evidence, the "which edge is missing" ranking.
    Evidence pairs generate per witness from its sorted adjacency
    list (cost = the wedge count, the statistic's information
    content); existing edges leave via one anti-join; the cut is a
    TakeOrdered on the ROUNDED score (ulp-proof ordering) with a
    (u, v) total order. The oracle replays wedges, degrees, the
    1/ln weights and the anti-exists."""
    from pandasvcf_spark.operators.graph import link_prediction

    return link_prediction(
        _copurchase_edges(spark, sf_dir), top_n=50
    )


@register(
    "g_local_cc",
    oracle=f"""
    WITH {_COPURCHASE_EDGES},
    deg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM
            (SELECT u AS n FROM e0 UNION ALL SELECT v AS n FROM e0)
            GROUP BY n),
    tri AS (
      SELECT a.u AS x, a.v AS y, b.v AS z
      FROM e0 a JOIN e0 b ON b.u = a.v
      JOIN e0 c ON c.u = a.u AND c.v = b.v),
    tn AS (SELECT n, CAST(count(*) AS BIGINT) AS t FROM (
             SELECT x AS n FROM tri
             UNION ALL SELECT y AS n FROM tri
             UNION ALL SELECT z AS n FROM tri)
           GROUP BY n)
    SELECT deg.n AS node, deg.deg AS deg,
           CAST(coalesce(t, 0) AS BIGINT) AS triangles,
           round(CASE WHEN deg.deg >= 2
                 THEN CAST(coalesce(t, 0) AS DOUBLE)
                      / (CAST(deg.deg AS DOUBLE) * (deg.deg - 1) / 2.0)
                 END, 6) AS cc
    FROM deg LEFT JOIN tn ON deg.n = tn.n
    ORDER BY node
    """,
)
def g_local_cc(spark, sf_dir):
    """Per-node clustering coefficient (operators/graph.
    local_clustering) over the co-purchase part graph — the local
    companion of g_triangles' global census: community-embeddedness
    per node. Triangles enumerate ONCE via the Schank-Wagner oriented
    wedge expansion (m^1.5 bound) keeping the apex; each closed
    triangle credits its three corners through a 3-element explode +
    node-keyed count. The oracle replays the naive u<v<w three-way
    join and the corner credit."""
    from pandasvcf_spark.operators.graph import local_clustering

    return local_clustering(_copurchase_edges(spark, sf_dir)).orderBy(
        "node"
    )


@register(
    "g_bfs",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT l_suppkey AS u, l_partkey + 10000000 AS v
      FROM lineitem
      WHERE ((l_suppkey * 2654435761 + l_partkey * 40503)
             % 2147483647) % 5 = 0),
    adj AS (SELECT u AS a, v AS b FROM e0
            UNION ALL SELECT v AS a, u AS b FROM e0),
    d0 AS (SELECT DISTINCT u AS n, 0 AS d FROM e0 WHERE u % 25 = 0),
    d1 AS (SELECT n, min(d) AS d FROM (
             SELECT n, d FROM d0
             UNION ALL
             SELECT adj.b AS n, d0.d + 1 AS d
             FROM d0 JOIN adj ON adj.a = d0.n) GROUP BY n),
    d2 AS (SELECT n, min(d) AS d FROM (
             SELECT n, d FROM d1
             UNION ALL
             SELECT adj.b AS n, d1.d + 1 AS d
             FROM d1 JOIN adj ON adj.a = d1.n) GROUP BY n),
    d3 AS (SELECT n, min(d) AS d FROM (
             SELECT n, d FROM d2
             UNION ALL
             SELECT adj.b AS n, d2.d + 1 AS d
             FROM d2 JOIN adj ON adj.a = d2.n) GROUP BY n)
    SELECT n AS node, CAST(d AS INTEGER) AS dist FROM d3
    ORDER BY node
    """,
)
def g_bfs(spark, sf_dir):
    """Bounded 3-round multi-source BFS (operators/graph.bfs_levels)
    from every 25th supplier over the hash-thinned supplier→part
    graph (the g_kcore fixture) — hop-count labeling from a seed set,
    fixed-round so the Spark loop and the 3-round unrolled relaxation
    replay are the SAME function of the input at any SF (a relaxation
    round at the fixed point is a no-op). Per round: one adjacency
    equi-join + one node-keyed MIN agg, localCheckpoint lineage
    control. Unreached nodes are absent, not +inf."""
    from pandasvcf_spark.operators.graph import bfs_levels

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (
                (
                    F.col("l_suppkey") * F.lit(2654435761)
                    + F.col("l_partkey") * 40503
                )
                % 2147483647
            )
            % 5
            == 0
        )
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("l_partkey") + 10000000).alias("dst"),
        )
    )
    sources = (
        li.select(F.col("src").alias("node"))
        .distinct()
        .filter(F.col("node") % 25 == 0)
    )
    return bfs_levels(li, sources, max_depth=3).orderBy("node")


@register(
    "agg_weighted_quantiles",
    oracle="""
    WITH b AS (
      SELECT lang, CAST(n_chars AS DOUBLE) AS v, doc_id % 7 + 1 AS w
      FROM documents
      WHERE lang IS NOT NULL AND n_chars IS NOT NULL
        AND doc_id IS NOT NULL),
    r AS (
      SELECT lang, v,
             sum(w) OVER (PARTITION BY lang ORDER BY v
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
             sum(w) OVER (PARTITION BY lang) AS tw
      FROM b),
    g AS (
      SELECT lang,
             min(CASE WHEN CAST(cw AS DOUBLE)
                      >= CAST(0.25 AS DOUBLE) * CAST(tw AS DOUBLE)
                 THEN v END) AS q25,
             min(CASE WHEN CAST(cw AS DOUBLE)
                      >= CAST(0.5 AS DOUBLE) * CAST(tw AS DOUBLE)
                 THEN v END) AS q50,
             min(CASE WHEN CAST(cw AS DOUBLE)
                      >= CAST(0.9 AS DOUBLE) * CAST(tw AS DOUBLE)
                 THEN v END) AS q90
      FROM r GROUP BY lang)
    SELECT lang, CAST(0.25 AS DOUBLE) AS p, q25 AS q FROM g
    UNION ALL
    SELECT lang, CAST(0.5 AS DOUBLE) AS p, q50 AS q FROM g
    UNION ALL
    SELECT lang, CAST(0.9 AS DOUBLE) AS p, q90 AS q FROM g
    ORDER BY lang, p
    """,
)
def agg_weighted_quantiles(spark, sf_dir):
    """Weighted quantiles (operators/stats.weighted_quantiles,
    inverse weighted-ECDF type 1) of document length per language,
    weighted by a synthetic doc_id%7+1 token weight — "the median
    TOKEN sits in a doc of length …", which unweighted quantiles get
    wrong on skewed weights. One group-keyed exchange serves the
    RANGE cumulative-weight window (ties merge) and the conditional-
    MIN groupBy; integer weights keep the ladder engine-exact, and
    the p·W thresholds compare as doubles on BOTH sides (a DuckDB
    DECIMAL 0.9 literal would flip exact integer boundaries)."""
    from pandasvcf_spark.operators.stats import weighted_quantiles

    d = load(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull()
        & F.col("n_chars").isNotNull()
        & F.col("doc_id").isNotNull()
    )
    base = d.select(
        "lang",
        F.col("n_chars").cast("double").alias("v"),
        (F.col("doc_id") % 7 + 1).alias("w"),
    )
    return weighted_quantiles(
        base, ["lang"], "v", "w", probs=(0.25, 0.5, 0.9)
    ).orderBy("lang", "p")


@register(
    "m_ks_test",
    oracle="""
    WITH b AS (
      SELECT l_linestatus AS ls, l_extendedprice AS v,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS f
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL
        AND l_linestatus IS NOT NULL),
    r AS (
      SELECT ls,
             sum(f) OVER (PARTITION BY ls ORDER BY v
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS c1,
             sum(1 - f) OVER (PARTITION BY ls ORDER BY v
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS c0,
             sum(f) OVER (PARTITION BY ls) AS t1,
             sum(1 - f) OVER (PARTITION BY ls) AS t0
      FROM b),
    a AS (
      SELECT ls, CAST(max(t1) AS BIGINT) AS n1,
             CAST(max(t0) AS BIGINT) AS n0,
             max(abs(CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE)
                     - CAST(c0 AS DOUBLE) / CAST(t0 AS DOUBLE)))
               AS dd
      FROM r GROUP BY ls)
    SELECT ls, n1, n0,
           round(CASE WHEN n1 > 0 AND n0 > 0 THEN dd END, 6) AS d,
           round(CASE WHEN n1 > 0 AND n0 > 0
                 THEN dd * sqrt(CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)
                                / (CAST(n1 AS DOUBLE)
                                   + CAST(n0 AS DOUBLE))) END, 6)
             AS z
    FROM a ORDER BY ls
    """,
)
def m_ks_test(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov test (operators/stats.
    ks_test_2samp) of extended price between returned (R) and other
    lineitems, per line status — the distribution-SHAPE drift
    detector beside m_mann_whitney's location test and m_ks_lift's
    binned table (this is the unbinned statistic). One group-keyed
    exchange: two RANGE cumulative windows (ties carry the full
    step) + a MAX agg; integer counts make D exact rational
    arithmetic, replayed verbatim."""
    from pandasvcf_spark.operators.stats import ks_test_2samp

    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_returnflag").isNotNull()
        & F.col("l_linestatus").isNotNull()
    )
    d = li.select(
        F.col("l_linestatus").alias("ls"),
        F.col("l_extendedprice").alias("v"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("f"),
    )
    return ks_test_2samp(d, ["ls"], "v", "f").orderBy("ls")


@register(
    "m_mad_outliers",
    oracle="""
    WITH b AS (
      SELECT source, CAST(n_chars AS DOUBLE) AS v FROM documents
      WHERE n_chars IS NOT NULL AND source IS NOT NULL),
    m1 AS (SELECT source, v AS med FROM (
             SELECT source, v,
                    row_number() OVER (PARTITION BY source
                                       ORDER BY v) AS rk,
                    count(*) OVER (PARTITION BY source) AS n
             FROM b)
           WHERE rk = greatest(CAST(ceil(n / 2.0) AS BIGINT), 1)),
    d AS (SELECT b.source AS source, b.v, m1.med,
                 abs(b.v - m1.med) AS dv
          FROM b JOIN m1 ON b.source = m1.source),
    m2 AS (SELECT source, dv AS mad FROM (
             SELECT source, dv,
                    row_number() OVER (PARTITION BY source
                                       ORDER BY dv) AS rk,
                    count(*) OVER (PARTITION BY source) AS n
             FROM d)
           WHERE rk = greatest(CAST(ceil(n / 2.0) AS BIGINT), 1))
    SELECT d.source AS source, CAST(count(*) AS BIGINT) AS n,
           max(d.med) AS med, max(m2.mad) AS mad,
           CAST(sum(CASE WHEN abs(d.v - d.med)
                         > 3.0 * CAST(1.4826 AS DOUBLE) * m2.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d JOIN m2 ON d.source = m2.source
    GROUP BY d.source ORDER BY source
    """,
)
def m_mad_outliers(spark, sf_dir):
    """Robust MAD outlier report (operators/stats.mad_outliers,
    k = 3) of document lengths per source — the monitoring staple a
    few wild points cannot recalibrate (unlike mean/stddev z-scores,
    which move with the outliers they hunt). Two exact-median rank
    windows on one source-keyed exchange + group-sized broadcast
    join-backs; the threshold compare is exact IEEE arithmetic on
    both engines (the 1.4826 consistency constant is CAST from the
    same decimal on both sides). The oracle replays both medians
    and the flag count."""
    from pandasvcf_spark.operators.stats import mad_outliers

    d = load(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("source").isNotNull()
    )
    base = d.select("source", F.col("n_chars").alias("v"))
    return mad_outliers(base, ["source"], "v", k=3.0).orderBy("source")


@register(
    "m_levene",
    oracle="""
    WITH b AS (
      SELECT c_mktsegment AS g, CAST(c_acctbal AS DOUBLE) AS v
      FROM customer
      WHERE c_acctbal IS NOT NULL AND c_mktsegment IS NOT NULL),
    m1 AS (SELECT g, v AS med FROM (
             SELECT g, v,
                    row_number() OVER (PARTITION BY g ORDER BY v)
                      AS rk,
                    count(*) OVER (PARTITION BY g) AS n
             FROM b)
           WHERE rk = greatest(CAST(ceil(n / 2.0) AS BIGINT), 1)),
    z AS (SELECT b.g AS g, abs(b.v - m1.med) AS v
          FROM b JOIN m1 ON b.g = m1.g),
    p AS (SELECT g, CAST(count(*) AS DOUBLE) AS n,
                 sum(v) AS s, sum(v * v) AS q
          FROM z GROUP BY g),
    t AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS BIGINT) AS n,
                 sum(s) AS gs, sum(q) AS gq,
                 sum(s * s / n) AS w
          FROM p),
    m AS (SELECT k, n,
                 w - gs * gs / CAST(n AS DOUBLE) AS ssb,
                 gq - w AS ssw
          FROM t)
    SELECT k, n,
           round(CASE WHEN k >= 2
                      AND CAST(n AS DOUBLE) > CAST(k AS DOUBLE)
                      AND ssw > 0
                 THEN (ssb / (CAST(k AS DOUBLE) - 1.0))
                      / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
                 END, 6) + 0.0 AS f_stat,
           round(CASE WHEN ssb + ssw > 0
                 THEN ssb / (ssb + ssw) END, 6) + 0.0 AS eta_sq
    FROM m
    """,
)
def m_levene(spark, sf_dir):
    """Brown-Forsythe variance-homogeneity test (operators/stats.
    levene_bf) of account balance across market segments — the
    robust spread-difference check that is m_anova's precondition
    (same fixture on purpose: mean test and spread test side by
    side). One exact-median window + broadcast join-back, then
    anova_oneway's combiner tree over |x − median|. The oracle
    replays median, deviations and both ratio statistics."""
    from pandasvcf_spark.operators.stats import levene_bf

    c = load(spark, sf_dir, "customer").filter(
        F.col("c_acctbal").isNotNull() & F.col("c_mktsegment").isNotNull()
    )
    d = c.select(
        F.col("c_mktsegment").alias("g"), F.col("c_acctbal").alias("v")
    )
    return levene_bf(d, "g", "v")


@register(
    "g_powerlaw",
    oracle=f"""
    WITH {_COPURCHASE_EDGES},
    deg AS (SELECT n, CAST(count(*) AS DOUBLE) AS d FROM
            (SELECT u AS n FROM e0 UNION ALL SELECT v AS n FROM e0)
            GROUP BY n),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes, avg(d) AS md,
                 sum(ln(d / 1.0)) AS ls
          FROM deg WHERE d >= 1)
    SELECT n_nodes, CAST(1 AS INTEGER) AS d_min,
           round(md, 4) AS mean_deg,
           round(CASE WHEN ls > 0
                 THEN 1.0 + CAST(n_nodes AS DOUBLE) / ls END, 6)
             AS alpha
    FROM g
    """,
)
def g_powerlaw(spark, sf_dir):
    """Power-law degree-distribution fit (operators/graph.
    powerlaw_alpha; continuous MLE, Clauset-Shalizi-Newman 2009) of
    the co-purchase part graph — the hub-tail health scalar beside
    g_triangles: alpha says whether the partitioner must plan for
    hub skew. One node-keyed degree count + ONE 1-row fold; alpha
    is a scalar ratio. The oracle replays degrees, the log-sum and
    the MLE."""
    from pandasvcf_spark.operators.graph import powerlaw_alpha

    return powerlaw_alpha(_copurchase_edges(spark, sf_dir), d_min=1)


@register(
    "j_skyline",
    oracle="""
    WITH pts AS (
      SELECT DISTINCT CAST(l_extendedprice AS DOUBLE) AS x,
             CAST(l_quantity AS DOUBLE) AS y
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL)
    SELECT x, y FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.x <= p.x AND q.y <= p.y
        AND (q.x < p.x OR q.y < p.y))
    ORDER BY x
    """,
)
def j_skyline(spark, sf_dir):
    """2-D skyline / Pareto frontier (operators/stats.skyline_2d) of
    lineitems minimizing (extended price, quantity) — the
    multi-objective shortlist query. The operator is the sort-based
    sweep (one distinct + ONE cumulative-MIN window — no all-pairs
    dominance join); the oracle deliberately states the NAIVE
    NOT-EXISTS dominance form, so the compare proves the sweep ≡ the
    definition, not a replay of itself (the independent-formulation
    discipline)."""
    from pandasvcf_spark.operators.stats import skyline_2d

    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull()
    )
    return skyline_2d(li, "l_extendedprice", "l_quantity")


@register(
    "g_hits",
    oracle="""
    WITH e AS (SELECT DISTINCT l_suppkey AS a,
                      l_partkey + 10000000 AS b FROM lineitem),
    nodes AS (SELECT a AS id FROM e UNION SELECT b FROM e),
    a1r AS (SELECT b AS id, sum(1.0) AS ar FROM e GROUP BY b),
    a1s AS (SELECT sum(ar) AS s FROM a1r),
    a1 AS (SELECT n.id,
             CASE WHEN s > 0 THEN coalesce(ar, 0.0) / s
                  ELSE 0.0 END AS av
           FROM nodes n LEFT JOIN a1r ON a1r.id = n.id, a1s),
    h1r AS (SELECT e.a AS id, sum(a1.av) AS hr
            FROM e JOIN a1 ON a1.id = e.b GROUP BY e.a),
    h1s AS (SELECT sum(hr) AS s FROM h1r),
    h1 AS (SELECT n.id,
             CASE WHEN s > 0 THEN coalesce(hr, 0.0) / s
                  ELSE 0.0 END AS hv
           FROM nodes n LEFT JOIN h1r ON h1r.id = n.id, h1s),
    a2r AS (SELECT e.b AS id, sum(h1.hv) AS ar
            FROM e JOIN h1 ON h1.id = e.a GROUP BY e.b),
    a2s AS (SELECT sum(ar) AS s FROM a2r),
    a2 AS (SELECT n.id,
             CASE WHEN s > 0 THEN coalesce(ar, 0.0) / s
                  ELSE 0.0 END AS av
           FROM nodes n LEFT JOIN a2r ON a2r.id = n.id, a2s),
    h2r AS (SELECT e.a AS id, sum(a2.av) AS hr
            FROM e JOIN a2 ON a2.id = e.b GROUP BY e.a),
    h2s AS (SELECT sum(hr) AS s FROM h2r),
    h2 AS (SELECT n.id,
             CASE WHEN s > 0 THEN coalesce(hr, 0.0) / s
                  ELSE 0.0 END AS hv
           FROM nodes n LEFT JOIN h2r ON h2r.id = n.id, h2s)
    SELECT CAST(h2.id AS BIGINT) AS id,
           round(h2.hv, 6) + 0.0 AS hub,
           round(a2.av, 6) + 0.0 AS authority
    FROM h2 JOIN a2 ON a2.id = h2.id ORDER BY id
    """,
)
def g_hits(spark, sf_dir):
    """Fixed-budget HITS hubs/authorities (operators/graph.hits, 2
    rounds, L1-normalized) over the supplier→part link graph — the
    bipartite-flavored companion of g_pagerank: suppliers are pure
    hubs, parts pure authorities, so the mutual-reinforcement update
    is fully exercised with zero mixed-role noise. Per round: two
    edge joins + two partial-agged groupBys + two 1-row normalizer
    broadcasts; edges/nodes checkpoint once. The oracle is the
    UNROLLED definition, one CTE quadruple per round."""
    from pandasvcf_spark.operators.graph import hits

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + 10000000).alias("dst"),
    )
    out = hits(li, iters=2)
    return out.select(
        F.col("id").cast("long").alias("id"), "hub", "authority"
    ).orderBy("id")


def _fligner_oracle() -> str:
    from pandasvcf_spark.operators.stats import norm_ppf_sql

    ppf = norm_ppf_sql("0.5 + rk / (2.0 * (N + 1))")
    return f"""
    WITH b AS (
      SELECT c_mktsegment AS g, round(c_acctbal, 0) AS v
      FROM customer
      WHERE c_acctbal IS NOT NULL AND c_mktsegment IS NOT NULL),
    med AS (SELECT g, v AS med FROM (
        SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v)
                 AS r,
               count(*) OVER (PARTITION BY g) AS cnt
        FROM b) WHERE r = greatest(CAST(ceil(cnt / 2.0) AS BIGINT), 1)),
    z AS (SELECT b.g, abs(b.v - med.med) AS z
          FROM b JOIN med ON med.g = b.g),
    zc AS (SELECT z, CAST(count(*) AS DOUBLE) AS c FROM z GROUP BY z),
    rk AS (SELECT z,
        coalesce(sum(c) OVER (ORDER BY z ROWS BETWEEN UNBOUNDED
          PRECEDING AND 1 PRECEDING), 0) + (c + 1) / 2 AS rk
      FROM zc),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM z),
    scored AS (SELECT z.g, ({ppf}) AS a
               FROM z JOIN rk ON rk.z = z.z, nn),
    per_g AS (SELECT g, CAST(count(*) AS DOUBLE) AS ng,
                     avg(a) AS ag, sum(a * a) AS aq
              FROM scored GROUP BY g),
    g2 AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) AS k,
                  sum(ng * ag) AS sa, sum(ng * ag * ag) AS saa,
                  sum(aq) AS qq
           FROM per_g)
    SELECT n, k,
      round(CASE WHEN k >= 2 AND
            (qq - sa * sa / n) / (CAST(n AS DOUBLE) - 1) > 0
            THEN (saa - sa * sa / n)
                 / ((qq - sa * sa / n) / (CAST(n AS DOUBLE) - 1))
            END, 6) + 0.0 AS fk
    FROM g2
    """


@register("m_fligner", oracle=_fligner_oracle())
def m_fligner(spark, sf_dir):
    """Fligner-Killeen variance-homogeneity test (operators/stats.
    fligner_killeen) of integer-rounded account balance across market
    segments — the normal-scores scale test R recommends as most
    robust, completing the spread-test ladder beside m_bartlett
    (normal-theory) and m_levene (median-ANOVA). The inverse normal is
    Acklam's rational approximation generated ONCE for both engines
    (norm_ppf_expr / norm_ppf_sql share the constant list and Horner
    nesting), so the oracle replays Φ⁻¹ bit-for-bit alongside the
    median, ladder and FK folds."""
    from pandasvcf_spark.operators.stats import fligner_killeen

    c = load(spark, sf_dir, "customer").filter(
        F.col("c_acctbal").isNotNull()
        & F.col("c_mktsegment").isNotNull()
    )
    d = c.select(
        F.col("c_mktsegment").alias("g"),
        F.round("c_acctbal", 0).alias("v"),
    )
    return fligner_killeen(d, "g", "v")


def _vdw_oracle() -> str:
    from pandasvcf_spark.operators.stats import norm_ppf_sql

    ppf = norm_ppf_sql("rk / (N + 1.0)")
    return f"""
    WITH b AS (
      SELECT c_mktsegment AS g, round(c_acctbal, 0) AS v
      FROM customer
      WHERE c_acctbal IS NOT NULL AND c_mktsegment IS NOT NULL),
    vc AS (SELECT v, CAST(count(*) AS DOUBLE) AS c FROM b GROUP BY v),
    rk AS (SELECT v,
        coalesce(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
          PRECEDING AND 1 PRECEDING), 0) + (c + 1) / 2 AS rk
      FROM vc),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM b),
    scored AS (SELECT b.g, ({ppf}) AS a
               FROM b JOIN rk ON rk.v = b.v, nn),
    per_g AS (SELECT g, CAST(count(*) AS DOUBLE) AS ng,
                     sum(a) AS sg, sum(a * a) AS qg
              FROM scored GROUP BY g),
    g2 AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) AS k,
                  sum(sg * sg / ng) AS t, sum(qg) AS qq
           FROM per_g)
    SELECT n, k,
      round(CASE WHEN k >= 2 AND qq / (CAST(n AS DOUBLE) - 1) > 0
            THEN t / (qq / (CAST(n AS DOUBLE) - 1)) END, 6)
        + 0.0 AS t
    FROM g2
    """


@register("m_vdw", oracle=_vdw_oracle())
def m_vdw(spark, sf_dir):
    """Van der Waerden normal-scores location test (operators/stats.
    van_der_waerden) of integer-rounded account balance across market
    segments — the normal-scores LOCATION partner of m_fligner's scale
    test and the efficiency upgrade of m_kruskal_wallis when data are
    near-normal. Same shared-Acklam dual-engine Φ⁻¹; the oracle
    replays ladder, scores and both folds."""
    from pandasvcf_spark.operators.stats import van_der_waerden

    c = load(spark, sf_dir, "customer").filter(
        F.col("c_acctbal").isNotNull()
        & F.col("c_mktsegment").isNotNull()
    )
    d = c.select(
        F.col("c_mktsegment").alias("g"),
        F.round("c_acctbal", 0).alias("v"),
    )
    return van_der_waerden(d, "g", "v")


@register(
    "m_fdr_bh",
    oracle="""
    WITH hyp AS (
      SELECT p_partkey AS id,
             round(p_retailprice - floor(p_retailprice), 2) AS p
      FROM part WHERE p_retailprice IS NOT NULL),
    cells AS (SELECT p, CAST(count(*) AS DOUBLE) AS c
              FROM hyp GROUP BY p),
    tot AS (SELECT sum(c) AS m FROM cells),
    pos AS (SELECT p, tot.m,
        sum(c) OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS hi
      FROM cells, tot),
    adj AS (SELECT p,
        least(min(m * p / hi) OVER (ORDER BY p DESC ROWS BETWEEN
          UNBOUNDED PRECEDING AND CURRENT ROW), 1.0) AS padj
      FROM pos)
    SELECT hyp.id, round(hyp.p, 6) + 0.0 AS p,
           round(adj.padj, 9) + 0.0 AS p_adj
    FROM hyp JOIN adj ON adj.p = hyp.p
    ORDER BY hyp.id
    """,
)
def m_fdr_bh(spark, sf_dir):
    """Benjamini-Hochberg FDR adjustment (operators/stats.fdr_correct,
    R p.adjust semantics incl. tie runs) over a part-table hypothesis
    sweep (p = the deterministic fractional retail-price digits — a
    near-uniform p column exercising ties and the full envelope). The
    step every per-site GWAS / per-segment A/B grid needs before its
    smallest p is read: distinct-p ladder positions, the suffix-min
    step-up envelope, broadcast join back — the corpus never sorts.
    The oracle replays ladder, envelope and join row-for-row."""
    from pandasvcf_spark.operators.stats import fdr_correct

    p = load(spark, sf_dir, "part").filter(
        F.col("p_retailprice").isNotNull()
    )
    hyp = p.select(
        F.col("p_partkey").alias("id"),
        F.round(
            F.col("p_retailprice") - F.floor(F.col("p_retailprice")), 2
        ).alias("p"),
    )
    out = fdr_correct(hyp, "p", method="bh")
    return out.select(
        "id", (F.round("p", 6) + F.lit(0.0)).alias("p"), "p_adj"
    ).orderBy("id")


@register(
    "j_point_in_poly",
    oracle="""
    WITH polys AS (
      SELECT n_nationkey AS poly_id,
        [
          {'x': CAST((n_nationkey * 40503) % 900 AS DOUBLE) / 10.0,
           'y': CAST((n_nationkey * 69069) % 900 AS DOUBLE) / 10.0},
          {'x': CAST((n_nationkey * 40503) % 900 AS DOUBLE) / 10.0
                + 8.0 + CAST(n_nationkey % 5 AS DOUBLE),
           'y': CAST((n_nationkey * 69069) % 900 AS DOUBLE) / 10.0
                + 1.0},
          {'x': CAST((n_nationkey * 40503) % 900 AS DOUBLE) / 10.0
                + 9.0,
           'y': CAST((n_nationkey * 69069) % 900 AS DOUBLE) / 10.0
                + 7.0 + CAST(n_nationkey % 3 AS DOUBLE)},
          {'x': CAST((n_nationkey * 40503) % 900 AS DOUBLE) / 10.0
                + 2.0,
           'y': CAST((n_nationkey * 69069) % 900 AS DOUBLE) / 10.0
                + 9.0}
        ] AS verts
      FROM nation),
    pts AS (
      SELECT c_custkey AS point_id,
        CAST((c_custkey * 2654435761) % 1000000 AS DOUBLE) / 10000.0
          AS px,
        CAST((c_custkey * 97) % 1000000 AS DOUBLE) / 10000.0 AS py
      FROM customer),
    cand AS (SELECT p.point_id, g.poly_id, p.px, p.py, g.verts
             FROM pts p CROSS JOIN polys g),
    crossed AS (
      SELECT point_id, poly_id,
        list_sum(list_transform(generate_series(1, len(verts)),
          i -> CASE WHEN
            (verts[i].y > py) <> (verts[(i % len(verts)) + 1].y > py)
            AND px < (verts[(i % len(verts)) + 1].x - verts[i].x)
                * (py - verts[i].y)
                / (verts[(i % len(verts)) + 1].y - verts[i].y)
                + verts[i].x
          THEN 1 ELSE 0 END)) AS cross_n
      FROM cand)
    SELECT point_id, poly_id FROM crossed WHERE cross_n % 2 = 1
    """,
)
def j_point_in_poly(spark, sf_dir):
    """Point-in-polygon containment join (operators/relational.
    point_in_polygon_join): deterministic quadrilateral zones derived
    from nation keys (hash-placed, hash-skewed — convex but irregular)
    against hash-placed customer points in the same 100x100 plane.
    Polygons explode onto their bounding-box grid cells, points
    equi-join on their cell, and the even-odd ray cast verifies as a
    scalar HOF fold. The oracle is the BRUTE-FORCE points x polygons
    cross join with the identical crossing arithmetic — the strongest
    check that the cell prejoin misses nothing."""
    from pandasvcf_spark.operators.relational import (
        point_in_polygon_join,
    )

    n = load(spark, sf_dir, "nation")
    bx = ((F.col("n_nationkey") * 40503) % 900).cast("double") / 10.0
    by = ((F.col("n_nationkey") * 69069) % 900).cast("double") / 10.0
    polys = n.select(
        F.col("n_nationkey").alias("poly_id"),
        F.array(
            F.struct(bx.alias("x"), by.alias("y")),
            F.struct(
                (bx + 8.0 + (F.col("n_nationkey") % 5).cast("double"))
                .alias("x"),
                (by + 1.0).alias("y"),
            ),
            F.struct(
                (bx + 9.0).alias("x"),
                (by + 7.0 + (F.col("n_nationkey") % 3).cast("double"))
                .alias("y"),
            ),
            F.struct((bx + 2.0).alias("x"), (by + 9.0).alias("y")),
        ).alias("vertices"),
    )
    c = load(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("point_id"),
        (
            ((F.col("c_custkey") * 2654435761) % 1000000)
            .cast("double") / 10000.0
        ).alias("x"),
        (
            ((F.col("c_custkey") * 97) % 1000000).cast("double")
            / 10000.0
        ).alias("y"),
    )
    return point_in_polygon_join(pts, polys, cell_size=10.0)


@register(
    "j_geo_knn",
    oracle="""
    WITH pts AS (
      SELECT c_custkey AS id,
             CAST((c_custkey * 2654435761) % 140000 AS DOUBLE) / 1000.0
               - 70.0 AS lat,
             CAST((c_custkey * 40503) % 360000 AS DOUBLE) / 1000.0
               - 180.0 AS lon
      FROM customer),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             2 * 6371.0088 * asin(sqrt(least(
               pow(sin(radians(b.lat - a.lat) / 2), 2)
               + cos(radians(a.lat)) * cos(radians(b.lat))
                 * pow(sin(radians(b.lon - a.lon) / 2), 2), 1.0)))
               AS d
      FROM pts a JOIN pts b ON a.id <> b.id),
    rk AS (
      SELECT id_a, id_b, d,
        CAST(row_number() OVER (PARTITION BY id_a
          ORDER BY d ASC, id_b ASC) AS INTEGER) AS rank
      FROM pairs WHERE d <= 1500.0)
    SELECT id_a, id_b, round(d, 6) AS distance_km, rank
    FROM rk WHERE rank <= 3
    """,
)
def j_geo_knn(spark, sf_dir):
    """Radius-bounded 3-nearest-neighbor geo join (operators/
    relational.geo_knn_join) over the j_geo_near customer coordinates
    at 1500 km: the banded candidate join + one per-point rank window
    with the deterministic (distance, id) total order. The oracle is
    the brute-force all-pairs haversine + the same window — the
    strongest check that banding plus ranking misses nothing."""
    from pandasvcf_spark.operators.relational import geo_knn_join

    c = load(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (
            ((F.col("c_custkey") * 2654435761) % 140000).cast("double")
            / 1000.0
            - 70.0
        ).alias("lat"),
        (
            ((F.col("c_custkey") * 40503) % 360000).cast("double")
            / 1000.0
            - 180.0
        ).alias("lon"),
    )
    return geo_knn_join(pts, pts, k=3, radius_km=1500.0,
                        left_id="id", right_id="id")


@register(
    "j_geo_near",
    oracle="""
    WITH pts AS (
      SELECT c_custkey AS id,
             CAST((c_custkey * 2654435761) % 140000 AS DOUBLE) / 1000.0
               - 70.0 AS lat,
             CAST((c_custkey * 40503) % 360000 AS DOUBLE) / 1000.0
               - 180.0 AS lon
      FROM customer),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             2 * 6371.0088 * asin(sqrt(least(
               pow(sin(radians(b.lat - a.lat) / 2), 2)
               + cos(radians(a.lat)) * cos(radians(b.lat))
                 * pow(sin(radians(b.lon - a.lon) / 2), 2), 1.0)))
               AS d
      FROM pts a JOIN pts b ON a.id < b.id)
    SELECT id_a, id_b, round(d, 6) AS distance_km
    FROM pairs WHERE d <= 1500.0
    ORDER BY id_a, id_b
    """,
)
def j_geo_near(spark, sf_dir):
    """Great-circle neighbor join (operators/relational.geo_near_join)
    over deterministic customer coordinates (poly-hash lat in ±70°,
    lon in ±180°) at a 1500 km radius (the synthetic lattice has no closer pairs at small SFs) — the spatial member of the
    banded-join family: latitude-band grid with the EXACT per-band
    chord bound 2·asin(sin(σ/2)/cosφ) for longitude cells, a uniform
    circular lon grid (floor cells — the ceil grid's partial seam
    cell drops antimeridian pairs), 3x3 probes, haversine verify.
    The oracle is the BRUTE-FORCE all-pairs haversine — the strongest
    possible check that the banding misses nothing."""
    from pandasvcf_spark.operators.relational import geo_near_join

    c = load(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (
            ((F.col("c_custkey") * 2654435761) % 140000).cast("double")
            / 1000.0
            - 70.0
        ).alias("lat"),
        (
            ((F.col("c_custkey") * 40503) % 360000).cast("double")
            / 1000.0
            - 180.0
        ).alias("lon"),
    )
    out = geo_near_join(pts, pts, 1500.0, "id", "id")
    return out.filter(F.col("id_a") < F.col("id_b")).orderBy(
        "id_a", "id_b"
    )


_GEO_PTS_SQL = """
      SELECT c_custkey AS id,
             CAST((c_custkey * 2654435761) % 140000 AS DOUBLE) / 1000.0
               - 70.0 AS lat,
             CAST((c_custkey * 40503) % 360000 AS DOUBLE) / 1000.0
               - 180.0 AS lon,
             c_acctbal AS val
      FROM customer"""

_GEO_PAIRS_SQL = """
      SELECT a.id AS id_a, b.id AS id_b
      FROM pts a JOIN pts b ON a.id < b.id
      WHERE 2 * 6371.0088 * asin(sqrt(least(
              pow(sin(radians(b.lat - a.lat) / 2), 2)
              + cos(radians(a.lat)) * cos(radians(b.lat))
                * pow(sin(radians(b.lon - a.lon) / 2), 2), 1.0)))
            <= 1500.0"""


@register(
    "m_morans_i",
    oracle=f"""
    WITH pts AS ({_GEO_PTS_SQL}),
    prs AS ({_GEO_PAIRS_SQL}),
    sym AS (SELECT id_a AS a, id_b AS b FROM prs
            UNION ALL SELECT id_b, id_a FROM prs),
    mom AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(val) AS m,
                   sum(val * val) AS q FROM pts),
    j AS (SELECT (pa.val - mom.m) * (pb.val - mom.m) AS cr,
                 mom.n AS n, mom.m AS m, mom.q AS q
          FROM sym
          JOIN pts pa ON pa.id = sym.a
          JOIN pts pb ON pb.id = sym.b, mom),
    g AS (SELECT CAST(count(*) AS BIGINT) AS w_sum, sum(cr) AS cross_s,
                 max(n) AS n, max(m) AS m, max(q) AS q FROM j)
    SELECT n, w_sum,
      round(CASE WHEN n >= 2 AND w_sum > 0
                  AND q - n * m * m > 0
            THEN CAST(n AS DOUBLE) / w_sum * cross_s
                 / (q - n * m * m) END, 6) + 0.0 AS i,
      round(CASE WHEN n >= 2 AND w_sum > 0
                  AND q - n * m * m > 0
            THEN -1.0 / (CAST(n AS DOUBLE) - 1) END, 6) + 0.0 AS e_i
    FROM g
    """,
)
def m_morans_i(spark, sf_dir):
    """Moran's I spatial autocorrelation (operators/relational.
    morans_i) of account balance over the 1500 km geo neighbor graph
    (the j_geo_near pairs) — THE first statistic after any spatial
    join: is balance spatially clustered? Expected ~E[I] = -1/(n-1)
    on this synthetic layout (coordinates are hash-derived, so no
    true spatial signal — the honest null). Oracle: brute-force
    neighbor pairs + the I fold."""
    from pandasvcf_spark.operators.relational import (
        geo_near_join,
        morans_i,
    )

    c = load(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (
            ((F.col("c_custkey") * 2654435761) % 140000).cast("double")
            / 1000.0
            - 70.0
        ).alias("lat"),
        (
            ((F.col("c_custkey") * 40503) % 360000).cast("double")
            / 1000.0
            - 180.0
        ).alias("lon"),
        F.col("c_acctbal").alias("value"),
    )
    pairs = geo_near_join(pts, pts, 1500.0, "id", "id").filter(
        F.col("id_a") < F.col("id_b")
    )
    return morans_i(pts, pairs, "id", "value")


@register(
    "j_dbscan",
    oracle=f"""
    WITH RECURSIVE pts AS ({_GEO_PTS_SQL}),
    prs AS ({_GEO_PAIRS_SQL}),
    sym AS (SELECT id_a AS a, id_b AS b FROM prs
            UNION ALL SELECT id_b, id_a FROM prs),
    deg AS (SELECT a AS id, count(*) + 1 AS d FROM sym GROUP BY a),
    core AS (SELECT id FROM deg WHERE d >= 3),
    ce AS (SELECT s.a, s.b FROM sym s
           JOIN core ca ON ca.id = s.a
           JOIN core cb ON cb.id = s.b),
    verts AS (SELECT DISTINCT a AS id FROM ce),
    reach AS (
      SELECT id, id AS lbl FROM verts
      UNION
      SELECT e.b AS id, r.lbl FROM reach r JOIN ce e ON e.a = r.id),
    comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
    core_lbl AS (SELECT core.id,
                        coalesce(comp.component, core.id) AS cluster
                 FROM core LEFT JOIN comp ON comp.id = core.id),
    border AS (SELECT s.a AS id, min(cl.cluster) AS cluster
               FROM sym s
               JOIN core_lbl cl ON cl.id = s.b
               WHERE s.a NOT IN (SELECT id FROM core)
               GROUP BY s.a)
    SELECT pts.id,
           CASE WHEN cl.id IS NOT NULL THEN 'core'
                WHEN bo.id IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           CAST(coalesce(cl.cluster, bo.cluster) AS BIGINT) AS cluster
    FROM pts
    LEFT JOIN core_lbl cl ON cl.id = pts.id
    LEFT JOIN border bo ON bo.id = pts.id
    ORDER BY pts.id
    """,
)
def j_dbscan(spark, sf_dir):
    """Spherical DBSCAN (operators/relational.dbscan_geo; Ester et
    al. 1996) over the synthetic customer coordinates at eps = 1500 km
    / min_pts = 3 — density clustering composed from trusted parts:
    geo_near_join's banded eps-graph, one degree agg for cores,
    connected_components over core-core edges, deterministic
    min-label border attachment, noise NULL. The oracle rebuilds the
    whole thing from brute-force pairs + a recursive-CTE closure."""
    from pandasvcf_spark.operators.relational import dbscan_geo

    c = load(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (
            ((F.col("c_custkey") * 2654435761) % 140000).cast("double")
            / 1000.0
            - 70.0
        ).alias("lat"),
        (
            ((F.col("c_custkey") * 40503) % 360000).cast("double")
            / 1000.0
            - 180.0
        ).alias("lon"),
    )
    out = dbscan_geo(pts, 1500.0, 3)
    return out.select(
        F.col("id").cast("long").alias("id"), "role", "cluster"
    ).orderBy("id")


@register(
    "m_gearys_c",
    oracle=f"""
    WITH pts AS ({_GEO_PTS_SQL}),
    prs AS ({_GEO_PAIRS_SQL}),
    sym AS (SELECT id_a AS a, id_b AS b FROM prs
            UNION ALL SELECT id_b, id_a FROM prs),
    mom AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(val) AS m,
                   sum(val * val) AS q FROM pts),
    j AS (SELECT (pa.val - pb.val) * (pa.val - pb.val) AS dd,
                 mom.n AS n, mom.m AS m, mom.q AS q
          FROM sym
          JOIN pts pa ON pa.id = sym.a
          JOIN pts pb ON pb.id = sym.b, mom),
    g AS (SELECT CAST(count(*) AS BIGINT) AS w_sum, sum(dd) AS dd,
                 max(n) AS n, max(m) AS m, max(q) AS q FROM j)
    SELECT n, w_sum,
      round(CASE WHEN n >= 2 AND w_sum > 0 AND q - n * m * m > 0
            THEN (CAST(n AS DOUBLE) - 1) * dd
                 / (2.0 * w_sum * (q - n * m * m)) END, 6) + 0.0 AS c,
      round(CASE WHEN n >= 2 AND w_sum > 0 AND q - n * m * m > 0
            THEN CAST(1.0 AS DOUBLE) END, 6) + 0.0 AS e_c
    FROM g
    """,
)
def m_gearys_c(spark, sf_dir):
    """Geary's C spatial autocorrelation (operators/relational.
    gearys_c) of account balance over the same 1500 km neighbor graph
    as m_morans_i — the variogram companion (Moran weights
    cross-products, Geary squared differences; C is more sensitive to
    LOCAL structure). Expected ~1 on the hash-derived layout — the
    honest null beside Moran's ~E[I]. Same brute-force-pairs oracle."""
    from pandasvcf_spark.operators.relational import (
        gearys_c,
        geo_near_join,
    )

    c = load(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (
            ((F.col("c_custkey") * 2654435761) % 140000).cast("double")
            / 1000.0
            - 70.0
        ).alias("lat"),
        (
            ((F.col("c_custkey") * 40503) % 360000).cast("double")
            / 1000.0
            - 180.0
        ).alias("lon"),
        F.col("c_acctbal").alias("value"),
    )
    pairs = geo_near_join(pts, pts, 1500.0, "id", "id").filter(
        F.col("id_a") < F.col("id_b")
    )
    return gearys_c(pts, pairs, "id", "value")


@register(
    "m_fdr_by",
    oracle="""
    WITH hyp AS (
      SELECT p_partkey AS id,
             round(p_retailprice - floor(p_retailprice), 2) AS p
      FROM part WHERE p_retailprice IS NOT NULL),
    cells AS (SELECT p, CAST(count(*) AS DOUBLE) AS c
              FROM hyp GROUP BY p),
    tot AS (SELECT sum(c) AS m FROM cells),
    h AS (SELECT sum(1.0 / CAST(rn AS DOUBLE)) AS cm
          FROM (SELECT row_number() OVER () AS rn FROM hyp)),
    pos AS (SELECT p, tot.m,
        sum(c) OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS hi
      FROM cells, tot),
    adj AS (SELECT p,
        least(min(h.cm * (m * p / hi)) OVER (ORDER BY p DESC ROWS
          BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1.0) AS padj
      FROM pos, h)
    SELECT hyp.id, round(hyp.p, 6) + 0.0 AS p,
           round(adj.padj, 9) + 0.0 AS p_adj
    FROM hyp JOIN adj ON adj.p = hyp.p
    ORDER BY hyp.id
    """,
)
def m_fdr_by(spark, sf_dir):
    """Benjamini-Yekutieli FDR adjustment (operators/stats.fdr_correct
    method='by') over the same hypothesis sweep as m_fdr_bh — the
    arbitrary-dependence-valid correction (BH's envelope scaled by the
    harmonic factor c(m) = Σ 1/i; min commutes with the positive
    scaling, so the identical suffix-min ladder serves both, including
    the bucketed >1M-cell regime). c(m) is a driver scalar from one
    1-row count. The oracle replays the harmonic sum, the scaled
    envelope, and the join row-for-row."""
    from pandasvcf_spark.operators.stats import fdr_correct

    p = load(spark, sf_dir, "part").filter(
        F.col("p_retailprice").isNotNull()
    )
    hyp = p.select(
        F.col("p_partkey").alias("id"),
        F.round(
            F.col("p_retailprice") - F.floor(F.col("p_retailprice")), 2
        ).alias("p"),
    )
    out = fdr_correct(hyp, "p", method="by")
    return out.select(
        "id", (F.round("p", 6) + F.lit(0.0)).alias("p"), "p_adj"
    ).orderBy("id")

"""Extended relational coverage + DuckDB oracles.

Beyond the reference's own operator set (SURVEY.md §2.5 lists what it
lacks: distinct/cube/rollup, intersect/except, as-of, ranking beyond
top-k) — a complete engine a reference user could switch to needs these,
and each lands with an exact oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shared_etl_pipelines_spark.operators.joins import asof_join
from shared_etl_pipelines_spark.operators.skew import salted_aggregate
from shared_etl_pipelines_spark.operators.windows import doy_non_leap, sessionize
from shared_etl_pipelines_spark.queries import defquery, round_floats
from shared_etl_pipelines_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# ROLLUP — hierarchical subtotals + grand total with grouping ids
# ---------------------------------------------------------------------------
@defquery(
    "rollup_pricing",
    """
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 4) AS total
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="ROLLUP subtotals with grouping ids",
    tags=("aggregate", "rollup"),
)
def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum("l_extendedprice").alias("total"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            F.col("gid").cast("long"),
            "n",
            "total",
        )
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# CUBE — all grouping-set combinations
# ---------------------------------------------------------------------------
@defquery(
    "cube_order_counts",
    """
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 4) AS total
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over status x priority",
    tags=("aggregate", "cube"),
)
def q_cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    out = (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "n",
            "total",
        )
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# DISTINCT aggregates
# ---------------------------------------------------------------------------
@defquery(
    "distinct_aggs",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey)  AS n_parts,
           COUNT(DISTINCT l_suppkey)  AS n_supps,
           ROUND(SUM(DISTINCT l_quantity), 4) AS sum_distinct_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="multi distinct aggregates per group",
    tags=("aggregate", "distinct"),
)
def q_distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.sum_distinct(F.col("l_quantity")).alias("sum_distinct_qty"),
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# INTERSECT / EXCEPT
# ---------------------------------------------------------------------------
@defquery(
    "intersect_except",
    """
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
    with_orders AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders),
    both_sets AS (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM with_orders),
    only_building AS (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM with_orders)
    SELECT 'intersect' AS tag, c_custkey FROM both_sets
    UNION ALL
    SELECT 'except' AS tag, c_custkey FROM only_building
    """,
    doc="INTERSECT and EXCEPT of customer key sets",
    tags=("setop",),
)
def q_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    with_orders = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    both = building.intersect(with_orders).withColumn("tag", F.lit("intersect"))
    only = building.exceptAll(with_orders).distinct().withColumn("tag", F.lit("except"))
    return both.unionByName(only).select("tag", "c_custkey")


# ---------------------------------------------------------------------------
# AS-OF join — latest event state at order time
# ---------------------------------------------------------------------------
@defquery(
    "asof_purchase_view",
    """
    WITH views AS (
      SELECT user_id, ts, MAX_BY(value, event_id) AS value
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT user_id, event_id, ts, value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.event_id,
           ROUND(p.purchase_value, 4) AS purchase_value,
           ROUND(v.value, 4) AS last_view_value
    FROM purchases p ASOF JOIN views v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    doc="as-of join: latest prior view value per purchase (union-merge plan)",
    tags=("join", "asof"),
)
def q_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", F.col("value").alias("last_view_value")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", F.col("value").alias("purchase_value")
    )
    out = asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["last_view_value"], how="inner", right_tiebreak="event_id",
    )
    return round_floats(
        out.select("user_id", "event_id", "purchase_value", "last_view_value")
    )


# ---------------------------------------------------------------------------
# Salted aggregation — the hot-key-safe two-phase plan must produce the
# same answer as the direct groupBy (oracle = plain SQL aggregate)
# ---------------------------------------------------------------------------
@defquery(
    "salted_hot_key_agg",
    """
    WITH c AS (
      SELECT l_returnflag AS k,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    )
    SELECT k,
           ROUND(SUM(cents) / 100.0, 4) AS total,
           COUNT(cents) AS n,
           ROUND((CAST(SUM(cents) AS DOUBLE) / COUNT(cents)) / 100.0, 4) AS mean,
           ROUND(MAX(cents) / 100.0, 4) AS mx
    FROM c GROUP BY k
    """,
    doc="salted two-phase aggregate == direct groupBy (skew mitigation)",
    tags=("aggregate", "skew"),
)
def q_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # integer cents through BOTH salted phases: the per-salt partial sums
    # change double-summation order vs a one-pass oracle, and at 1e10
    # magnitudes the last ulp crosses the 4-decimal rounding boundary
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("k"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    out = salted_aggregate(
        li,
        ["k"],
        {
            "total_c": ("sum", "cents"),
            "n": ("count", "cents"),
            "mx_c": ("max", "cents"),
        },
        n_salts=16,
    )
    out = out.select(
        "k",
        (F.col("total_c") / 100.0).alias("total"),
        "n",
        ((F.col("total_c").cast("double") / F.col("n")) / 100.0).alias("mean"),
        (F.col("mx_c") / 100.0).alias("mx"),
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# SPI with the documented leap-day policy: Feb-29 folds into Feb-28's
# day-of-year so climatology group sizes are stable (SURVEY.md §7.7)
# ---------------------------------------------------------------------------
@defquery(
    "spi_doy_climatology",
    """
    WITH d AS (
      SELECT event_id, event_type, value,
             CASE WHEN (year(ts) % 4 = 0 AND (year(ts) % 100 <> 0 OR year(ts) % 400 = 0))
                       AND dayofyear(ts) >= 60
                  THEN dayofyear(ts) - 1 ELSE dayofyear(ts) END AS doy
      FROM events
    )
    SELECT event_id, event_type, doy,
           ROUND((value - AVG(value)    OVER (PARTITION BY event_type, doy))
               / STDDEV_SAMP(value) OVER (PARTITION BY event_type, doy), 4) AS zscore
    FROM d
    """,
    doc="SPI z-score over day-of-year climatology with Feb-29 coalescing",
    tags=("G3", "window", "leap"),
)
def q_spi_doy_climatology(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shared_etl_pipelines_spark.operators.windows import zscore

    ev = _t(spark, sf_dir, "events").withColumn(
        "doy", doy_non_leap("ts").cast("long")
    )
    out = zscore(ev, ["event_type", "doy"], "value", out_col="zscore")
    return round_floats(out.select("event_id", "event_type", "doy", "zscore"))


# ---------------------------------------------------------------------------
# The pipeline language inside the correctness gate: run the packaged
# crop_weighted.yml through the runner; oracle = the same dataflow in SQL
# ---------------------------------------------------------------------------
@defquery(
    "pipeline_crop_weighted_yaml",
    """
    WITH fine AS (
      SELECT p_partkey % 16 AS fy,
             CAST(FLOOR(p_partkey / 16) AS BIGINT) % 16 AS fx,
             CASE WHEN p_size IN (1, 5) THEN 1 ELSE 0 END AS mask
      FROM part
    ),
    weights AS (
      SELECT CAST(FLOOR(fy / 4) AS BIGINT) AS y,
             CAST(FLOOR(fx / 4) AS BIGINT) AS x,
             AVG(mask) AS w
      FROM fine GROUP BY 1, 2
    ),
    daily AS (
      SELECT l_orderkey % 4 AS y, l_suppkey % 4 AS x,
             CAST(l_shipdate AS DATE) AS day, l_quantity AS v
      FROM lineitem
    )
    SELECT d.y AS zone, EXTRACT(year FROM d.day) AS yr,
           ROUND(SUM(d.v * w.w) / SUM(w.w), 4) AS crop_wavg,
           ROUND(SUM(w.w), 4) AS crop_wavg_weight
    FROM daily d JOIN weights w ON d.y = w.y AND d.x = w.x
    GROUP BY 1, 2
    """,
    doc="YAML pipeline document through the runner == the SQL dataflow",
    tags=("pipeline", "yaml"),
)
def q_pipeline_crop_weighted_yaml(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from shared_etl_pipelines_spark.plans import PipelineRunner, PipelineSpec

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plans", "examples",
        "crop_weighted.yml",
    )
    spec = PipelineSpec.from_yaml(path)
    spec.vars["sf_dir"] = sf_dir
    res = PipelineRunner(spark).run(spec)
    return round_floats(res.outputs["result"]["df"])


# ---------------------------------------------------------------------------
# Sessionization — gap-based batch sessions
# ---------------------------------------------------------------------------
@defquery(
    "sessionize_events",
    """
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, ts,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
    doc="gap-based sessionization (30 min) + per-session rollup",
    tags=("window", "session"),
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = sessionize(ev, ["user_id"], "ts", gap_seconds=1800, tiebreak_col="event_id")
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
        .select("user_id", "session_id", "n_events", "session_start", "session_end")
    )


# ---------------------------------------------------------------------------
# Range join — point-in-interval via bucketed equi-join (overlapping intervals)
# ---------------------------------------------------------------------------
@defquery(
    "range_join_campaigns",
    """
    WITH campaigns AS (
      SELECT CAST(i AS INT) AS campaign_id,
             DATE '2024-01-01' + CAST(3 * i AS INT) AS start_day
      FROM generate_series(0, 9) AS t(i)
    )
    SELECT c.campaign_id,
           strftime(c.start_day, '%Y-%m-%d') AS start_day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users,
           ROUND(SUM(e.value), 4) AS total_value
    FROM events e
    JOIN campaigns c
      ON CAST(e.ts AS DATE) >= c.start_day
     AND CAST(e.ts AS DATE) < c.start_day + 5
    GROUP BY 1, 2
    """,
    doc="bucketed range join: events into overlapping 5-day campaign windows",
    tags=("join", "range-join"),
)
def q_range_join_campaigns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shared_etl_pipelines_spark.operators.joins import range_join

    epoch = F.to_date(F.lit("1970-01-01"))
    camp = (
        spark.range(10)
        .select(
            F.col("id").cast("int").alias("campaign_id"),
            F.date_add(
                F.to_date(F.lit("2024-01-01")), (F.col("id") * 3).cast("int")
            ).alias("start_day"),
        )
        .select(
            "campaign_id",
            "start_day",
            F.datediff("start_day", epoch).alias("start_d"),
            (F.datediff("start_day", epoch) + F.lit(5)).alias("end_d"),
        )
    )
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.datediff(F.to_date("ts"), epoch).alias("p")
    )
    j = range_join(ev, camp, "p", "start_d", "end_d", bucket_width=4)
    out = j.groupBy(
        "campaign_id", F.date_format("start_day", "yyyy-MM-dd").alias("start_day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("value").alias("total_value"),
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# Hypertable rollup — multi-resolution time buckets via re-aggregation cascade
# ---------------------------------------------------------------------------
@defquery(
    "hypertable_rollup",
    """
    WITH c AS (
      SELECT ts, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
    )
    SELECT 'hour' AS resolution,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           COUNT(*) AS n,
           ROUND(SUM(cents) / 100.0, 4) AS sum_value,
           ROUND(MIN(cents) / 100.0, 4) AS min_value,
           ROUND(MAX(cents) / 100.0, 4) AS max_value,
           ROUND((SUM(cents) / COUNT(*)) / 100.0, 4) AS avg_value
    FROM c GROUP BY 2
    UNION ALL
    SELECT 'day', strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S'),
           COUNT(*), ROUND(SUM(cents) / 100.0, 4), ROUND(MIN(cents) / 100.0, 4),
           ROUND(MAX(cents) / 100.0, 4), ROUND((SUM(cents) / COUNT(*)) / 100.0, 4)
    FROM c GROUP BY 2
    UNION ALL
    SELECT 'month', strftime(date_trunc('month', ts), '%Y-%m-%d %H:%M:%S'),
           COUNT(*), ROUND(SUM(cents) / 100.0, 4), ROUND(MIN(cents) / 100.0, 4),
           ROUND(MAX(cents) / 100.0, 4), ROUND((SUM(cents) / COUNT(*)) / 100.0, 4)
    FROM c GROUP BY 2
    """,
    doc="continuous-aggregate cascade: hour -> day -> month from partials",
    tags=("aggregate", "hypertable", "time-bucket"),
)
def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shared_etl_pipelines_spark.operators.hypertable import hypertable_rollup

    # Aggregate exact integer cents, divide once at the end: small-n hourly
    # averages of 2-decimal values land EXACTLY on .00005 rounding
    # boundaries, where double summation order (which varies with
    # partitioning) would otherwise flip the 4th decimal vs the oracle.
    ev = _t(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    rolled = hypertable_rollup(ev, "ts", "cents", ("hour", "day", "month"))
    out = rolled.select(
        "resolution",
        "bucket",
        "n",
        (F.col("sum_value") / 100.0).alias("sum_value"),
        (F.col("min_value") / 100.0).alias("min_value"),
        (F.col("max_value") / 100.0).alias("max_value"),
        (F.col("avg_value") / 100.0).alias("avg_value"),
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# Anti join — keys with no match (the complement of the clip semi-join)
# ---------------------------------------------------------------------------
@defquery(
    "anti_join_inactive_customers",
    """
    SELECT c.c_custkey, c.c_mktsegment, ROUND(c.c_acctbal, 4) AS acctbal
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01'
    )
    """,
    doc="left_anti join: customers with no orders after a cutoff date",
    tags=("join", "anti-join"),
)
def q_anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") >= F.lit("2000-01-01").cast("date")
    )
    out = c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), on="c_custkey", how="left_anti"
    ).select("c_custkey", "c_mktsegment", F.col("c_acctbal").alias("acctbal"))
    return round_floats(out)


# ---------------------------------------------------------------------------
# Star join — 5-way fact⋈dims rollup (broadcast every dimension side)
# ---------------------------------------------------------------------------
@defquery(
    "regional_revenue",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE CAST(o.o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
    GROUP BY 1, 2
    """,
    doc="multi-way star join: lineitem->orders->customer->nation->region revenue",
    tags=("join", "star", "aggregate"),
)
def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate").between("1995-01-01", "1995-12-31")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    # dims are broadcast: orders/customer are sf-scaled but still dimension-
    # sized next to lineitem; nation/region are tiny. The fact side never
    # shuffles for the joins — only the final 2-key groupBy exchanges.
    out = (
        li.join(F.broadcast(o.select("o_orderkey", "o_custkey")), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_regionkey", "n_name")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.select("r_regionkey", "r_name")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# Salted shuffle join — skew-resistant fact⋈dim beyond broadcast threshold
# ---------------------------------------------------------------------------
@defquery(
    "salted_skew_join",
    """
    SELECT s.s_nationkey, COUNT(*) AS n_items,
           ROUND(SUM(l.l_quantity), 4) AS total_qty
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1
    """,
    doc="salted join (deterministic salt + replicated dim) == plain join",
    tags=("join", "skew"),
)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shared_etl_pipelines_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    j = salted_join(li, supp, on=["l_suppkey"], n_salts=8)
    out = j.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"), F.sum("l_quantity").alias("total_qty")
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# GROUPING SETS — explicit set list (beyond the rollup/cube shorthands)
# ---------------------------------------------------------------------------
@defquery(
    "grouping_sets_pricing",
    """
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 4) AS total_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="explicit GROUPING SETS: per-flag, per-status, and grand total",
    tags=("aggregate", "grouping-sets"),
)
def q_grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("total_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "n",
            "total_qty",
        )
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# Global top-N — ORDER BY + LIMIT (TakeOrderedAndProject, no full sort)
# ---------------------------------------------------------------------------
@defquery(
    "global_top_orders",
    """
    SELECT rank, o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS totalprice
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders
    ) WHERE rank <= 100
    """,
    doc="global top-100 orders by price (per-partition top-N, no full sort)",
    tags=("sort", "limit", "top-k"),
)
def q_global_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    out = (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")))
            .alias("rank"),
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").alias("totalprice"),
        )
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# JSON scalar functions — the reference's query_json surface (STAC S5) as a
# row-level expression: extract a property from a JSON column, filter + agg
# ---------------------------------------------------------------------------
@defquery(
    "json_props_rollup",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    GROUP BY 1, 2
    """,
    doc="JSON property extraction + range predicate + rollup (query_json analog)",
    tags=("json", "scalar", "aggregate"),
)
def q_json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    out = (
        ev.filter(k >= 50)
        .groupBy((k % 10).alias("k_bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# PIVOT — wide-format counts/totals per month × order status. Spark's
# .pivot() with an explicit value list (never the implicit distinct scan:
# at 100 TB the value list must be declared, not discovered).
# ---------------------------------------------------------------------------
@defquery(
    "pivot_status_by_month",
    """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial,
           ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 4) AS total_open,
           ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 4) AS total_filled,
           ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 4) AS total_partial
    FROM orders GROUP BY 1
    """,
    doc="pivot to wide format: per-month counts/totals by declared status list",
    tags=("pivot", "aggregate"),
)
def q_pivot_status_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    wide = (
        o.withColumn("month", F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM"))
        .groupBy("month")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("total"),
        )
    )
    out = wide.select(
        "month",
        F.coalesce("O_n", F.lit(0)).alias("n_open"),
        F.coalesce("F_n", F.lit(0)).alias("n_filled"),
        F.coalesce("P_n", F.lit(0)).alias("n_partial"),
        F.col("O_total").alias("total_open"),
        F.col("F_total").alias("total_filled"),
        F.col("P_total").alias("total_partial"),
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# LAG/LEAD — day-over-day deltas on the daily revenue series (the ranking
# taxonomy beyond row_number/rank: offset window functions).
# ---------------------------------------------------------------------------
@defquery(
    "daily_revenue_deltas",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           ROUND(cents / 100.0, 4) AS revenue,
           ROUND((cents - LAG(cents) OVER (ORDER BY day)) / 100.0, 4) AS delta_prev,
           ROUND((LEAD(cents) OVER (ORDER BY day) - cents) / 100.0, 4) AS delta_next,
           ROUND(CAST(cents - LAG(cents) OVER (ORDER BY day) AS DOUBLE)
                 / NULLIF(LAG(cents) OVER (ORDER BY day), 0) * 100, 4) AS pct_change
    FROM daily
    """,
    doc="offset windows: lag/lead day-over-day revenue deltas",
    tags=("window", "lag-lead", "timeseries"),
)
def q_daily_revenue_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The naive form is ONE unpartitioned Window.orderBy(day) — bounded by
    # the date domain, but still a single-task sort. Instead: partition by
    # year and copy each year's boundary rows into the neighboring year's
    # partition (the G2 lookback-across-the-boundary trick), so every
    # partition computes its edge lag/lead correctly and the helper copies
    # are filtered back out. Scales with years x 365 rows per partition.
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    daily = daily.withColumn("yr", F.year("day"))
    w_asc = Window.partitionBy("yr").orderBy("day")
    w_desc = Window.partitionBy("yr").orderBy(F.col("day").desc())
    marked = daily.withColumn("rn_a", F.row_number().over(w_asc)).withColumn(
        "rn_d", F.row_number().over(w_desc)
    )
    own = marked.select("day", "cents", F.col("yr").alias("part"), F.lit(1).alias("own"))
    # last day of year Y joins partition Y+1 (feeds its first lag);
    # first day of year Y joins partition Y-1 (feeds its last lead)
    into_next = marked.filter(F.col("rn_d") == 1).select(
        "day", "cents", (F.col("yr") + 1).alias("part"), F.lit(0).alias("own")
    )
    into_prev = marked.filter(F.col("rn_a") == 1).select(
        "day", "cents", (F.col("yr") - 1).alias("part"), F.lit(0).alias("own")
    )
    aug = own.unionByName(into_next).unionByName(into_prev)
    w = Window.partitionBy("part").orderBy("day")
    out = (
        aug.withColumn("lag_c", F.lag("cents").over(w))
        .withColumn("lead_c", F.lead("cents").over(w))
        .filter(F.col("own") == 1)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            (F.col("cents") / 100.0).alias("revenue"),
            ((F.col("cents") - F.col("lag_c")) / 100.0).alias("delta_prev"),
            ((F.col("lead_c") - F.col("cents")) / 100.0).alias("delta_next"),
            (
                (F.col("cents") - F.col("lag_c")).cast("double")
                / F.nullif(F.col("lag_c"), F.lit(0))
                * 100
            ).alias("pct_change"),
        )
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# Gap fill + LOCF — TimescaleDB time_bucket_gapfill/locf() analog: dense
# per-user daily spine with last-observation-carried-forward
# (operators/hypertable.py gap_fill_locf; spine = sequence() explode, no
# driver loop; integer cents keep the carried value engine-exact).
# ---------------------------------------------------------------------------
@defquery(
    "gap_fill_user_days",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT u.user_id, CAST(d.day AS DATE) AS day
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN (
        SELECT UNNEST(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                      INTERVAL 1 DAY)) AS day
      ) d
    )
    SELECT s.user_id,
           strftime(s.day, '%Y-%m-%d') AS day,
           ROUND(LAST_VALUE(dl.cents IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0, 4)
           AS cents_locf,
           CASE WHEN dl.cents IS NULL THEN 1 ELSE 0 END AS was_gap
    FROM spine s LEFT JOIN daily dl ON s.user_id = dl.user_id AND s.day = dl.day
    """,
    doc="gap fill + LOCF over a dense per-key daily spine",
    tags=("timeseries", "gap-fill", "window", "hypertable"),
)
def q_gap_fill_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shared_etl_pipelines_spark.operators.hypertable import gap_fill_locf

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    filled = gap_fill_locf(daily, "user_id", "day", "cents", "2024-01-01", "2024-01-30")
    out = filled.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.col("cents_locf") / 100.0).alias("cents_locf"),
        "was_gap",
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# SCD2 merge — row-level history-keeping MERGE (generalizes the reference's
# catalog_json_upsert O5 from file-level to dimension rows). The snapshot is
# derived deterministically from customer: every 7th key changes segment,
# every 13th is absent, and 50 synthetic keys are brand-new.
# ---------------------------------------------------------------------------
@defquery(
    "scd2_customer_merge",
    """
    WITH current AS (
      SELECT c_custkey, c_mktsegment, DATE '2020-01-01' AS valid_from,
             CAST(NULL AS DATE) AS valid_to
      FROM customer
    ),
    snap AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN 'MACHINERY' ELSE c_mktsegment END
               AS c_mktsegment
      FROM customer WHERE c_custkey % 13 <> 0
      UNION ALL
      SELECT 1000000 + i AS c_custkey, 'FURNITURE' AS c_mktsegment
      FROM (SELECT UNNEST(range(50)) AS i)
    ),
    j AS (
      SELECT COALESCE(c.c_custkey, s.c_custkey) AS c_custkey,
             c.c_mktsegment AS cur_seg, s.c_mktsegment AS snap_seg,
             c.valid_from AS cur_from,
             c.c_custkey IS NOT NULL AS in_dim,
             s.c_custkey IS NOT NULL AS in_snap
      FROM current c FULL OUTER JOIN snap s ON c.c_custkey = s.c_custkey
    )
    SELECT c_custkey, cur_seg AS c_mktsegment,
           strftime(cur_from, '%Y-%m-%d') AS valid_from,
           CAST(NULL AS VARCHAR) AS valid_to
    FROM j WHERE in_dim AND (NOT in_snap OR cur_seg = snap_seg)
    UNION ALL
    SELECT c_custkey, cur_seg, strftime(cur_from, '%Y-%m-%d'), '2024-06-01'
    FROM j WHERE in_dim AND in_snap AND cur_seg <> snap_seg
    UNION ALL
    SELECT c_custkey, snap_seg, '2024-06-01', CAST(NULL AS VARCHAR)
    FROM j WHERE in_snap AND (NOT in_dim OR cur_seg <> snap_seg)
    """,
    doc="SCD2 dimension merge: close changed rows, insert new versions, keep history",
    tags=("merge", "scd2", "join"),
)
def q_scd2_customer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shared_etl_pipelines_spark.operators.scd import scd2_merge

    cust = _t(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("2020-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    snap = (
        cust.filter(F.col("c_custkey") % 13 != 0)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 7 == 0, F.lit("MACHINERY"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
        )
        .unionByName(
            spark.range(50).select(
                (F.col("id") + 1000000).alias("c_custkey"),
                F.lit("FURNITURE").alias("c_mktsegment"),
            )
        )
    )
    out = scd2_merge(
        dim, snap, ["c_custkey"], ["c_mktsegment"], snap_date="2024-06-01"
    )
    return out.select(
        "c_custkey",
        "c_mktsegment",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery — orders priced above their customer's average
# (decorrelated by Catalyst into an aggregate + join; same shape a window
# formulation would produce, but written as the subquery users write).
# ---------------------------------------------------------------------------
@defquery(
    "above_customer_avg_orders",
    """
    WITH c AS (
      SELECT o_orderkey, o_custkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderkey, o_custkey, cents AS totalprice_cents,
           CAST(FLOOR(cust_avg_cents) AS BIGINT) AS cust_avg_cents
    FROM (
      SELECT o_orderkey, o_custkey, cents,
             CAST(SUM(cents) OVER (PARTITION BY o_custkey) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg_cents
      FROM c
    )
    WHERE cents > cust_avg_cents
    """,
    doc="correlated scalar subquery: orders above their customer's average",
    tags=("subquery", "window", "filter"),
)
def q_above_customer_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # integer cents end-to-end: the per-customer average must be the same
    # exact value in both engines or boundary rows flip in/out; outputs
    # stay integral (floor of an IEEE-identical division) so there is no
    # decimal-rounding surface at all
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    o.createOrReplaceTempView("_orders_corr")
    out = spark.sql(
        """
        SELECT o_orderkey, o_custkey, cents AS totalprice_cents,
               CAST(FLOOR((SELECT CAST(SUM(o2.cents) AS DOUBLE) / COUNT(*)
                           FROM _orders_corr o2
                           WHERE o2.o_custkey = o1.o_custkey)) AS BIGINT)
                 AS cust_avg_cents
        FROM _orders_corr o1
        WHERE cents > (SELECT CAST(SUM(o3.cents) AS DOUBLE) / COUNT(*)
                       FROM _orders_corr o3
                       WHERE o3.o_custkey = o1.o_custkey)
        """
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# NTILE — equal-frequency bucketing (quartiles of order value), the missing
# member of the ranking-window family (row_number/rank/lag/lead covered).
# ---------------------------------------------------------------------------
@defquery(
    "ntile_order_quartiles",
    """
    WITH t AS (
      SELECT o_orderkey, o_totalprice,
             NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders
    )
    SELECT quartile, COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 4) AS lo,
           ROUND(MAX(o_totalprice), 4) AS hi
    FROM t GROUP BY quartile
    """,
    doc="NTILE(4) equal-frequency buckets + per-bucket range",
    tags=("window", "ntile", "aggregate"),
)
def q_ntile_order_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT F.ntile over Window.orderBy: a global-order window moves every
    # row to one partition. global_ntile range-partitions the sort and
    # adds per-partition offsets — identical semantics, fully parallel.
    from shared_etl_pipelines_spark.operators.windows import global_ntile

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    tiled = global_ntile(o, ["o_totalprice", "o_orderkey"], 4, out_col="quartile")
    out = tiled.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# Equal-width histogram — declared bounds + integer bin math (the
# complement of NTILE's equal-frequency buckets). Clamped edge bins.
# ---------------------------------------------------------------------------
@defquery(
    "price_histogram",
    """
    WITH c AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    )
    SELECT LEAST(19, GREATEST(0, (cents - 100000) // 2500000)) AS bin,
           COUNT(*) AS n,
           ROUND(MIN(cents) / 100.0, 4) AS lo,
           ROUND(MAX(cents) / 100.0, 4) AS hi
    FROM c GROUP BY 1
    """,
    doc="equal-width histogram: 20 declared bins over order value, clamped edges",
    tags=("aggregate", "histogram"),
)
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    bin_ = F.least(
        F.lit(19), F.greatest(F.lit(0), F.floor((cents - 100000) / 2500000))
    ).cast("long")
    out = (
        o.select(cents.alias("cents"), bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.min("cents") / 100.0).alias("lo"),
            (F.max("cents") / 100.0).alias("hi"),
        )
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# PERCENT_RANK / CUME_DIST — distribution window functions completing the
# ranking family (row_number/rank/ntile/lag/lead elsewhere). Partitioned
# by event_type, so the windows run parallel per group.
# ---------------------------------------------------------------------------
@defquery(
    "value_distribution_ranks",
    """
    WITH c AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT event_id, event_type,
           ROUND(PERCENT_RANK() OVER (PARTITION BY event_type
                                      ORDER BY cents, event_id), 4) AS pct_rank,
           ROUND(CUME_DIST() OVER (PARTITION BY event_type
                                   ORDER BY cents, event_id), 4) AS cume
    FROM c
    """,
    doc="percent_rank + cume_dist per group (distribution window functions)",
    tags=("window", "rank", "distribution"),
)
def q_value_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    out = ev.select(
        "event_id",
        "event_type",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# Sliding exact median — percentile aggregate over a trailing row frame
# (G2's rolling window × G4's percentile vocabulary). Integer cents make
# the interpolated median (.5 halves) engine-exact.
# ---------------------------------------------------------------------------
@defquery(
    "rolling_median_7",
    """
    WITH c AS (
      SELECT event_id, user_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT event_id, user_id,
           ROUND(quantile_cont(cents, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0, 4)
           AS med_7
    FROM c
    """,
    doc="sliding exact median over a 7-row trailing frame per user",
    tags=("window", "percentile", "G2", "G4"),
)
def q_rolling_median_7(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    out = ev.select(
        "event_id",
        "user_id",
        (F.expr("percentile(cents, 0.5)").over(w) / 100.0).alias("med_7"),
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# Advanced aggregates — argmax/argmin (max_by/min_by) and deterministic
# array aggregation (collect_set sorted; unordered bags never hash-match).
# ---------------------------------------------------------------------------
@defquery(
    "priority_extremes",
    """
    WITH c AS (
      SELECT o_orderpriority, o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderpriority,
           max_by(o_orderkey, cents * 10000000 + o_orderkey) AS top_order,
           min_by(o_orderkey, cents * 10000000 - o_orderkey) AS bottom_order,
           ROUND(MAX(cents) / 100.0, 4) AS top_price,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses
    FROM c GROUP BY o_orderpriority
    """,
    doc="argmax/argmin aggregates (max_by/min_by) + sorted array_agg",
    tags=("aggregate", "argmax", "array"),
)
def q_priority_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic tie-break via a composite integer key (cents shifted
    # past the key space): max side prefers the larger orderkey on equal
    # price, min side also prefers the larger orderkey (subtracting it)
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    out = o.groupBy("o_orderpriority").agg(
        F.max_by(
            "o_orderkey", F.col("cents") * 10000000 + F.col("o_orderkey")
        ).alias("top_order"),
        F.min_by(
            "o_orderkey", F.col("cents") * 10000000 - F.col("o_orderkey")
        ).alias("bottom_order"),
        (F.max("cents") / 100.0).alias("top_price"),
        # string-join the sorted set: array-typed outputs stringify
        # differently per client (numpy vs list) and break value hashing
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# EXISTS correlated subquery (TPC-H Q4 shape): orders with at least one
# late-shipped line. Catalyst rewrites EXISTS to a left-semi join with the
# correlated predicate as the join condition — the DataFrame form below IS
# that plan, stated directly (no per-row subquery execution at any scale).
# ---------------------------------------------------------------------------
@defquery(
    "exists_late_orders",
    """
    SELECT o_orderpriority AS priority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="EXISTS correlated subquery as left-semi join (Q4 shape)",
    tags=("subquery", "semi-join"),
)
def q_exists_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return late.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# ---------------------------------------------------------------------------
# NOT IN with a nullable LHS — three-valued logic: rows whose key is NULL
# compare UNKNOWN against the list and are excluded, NOT kept. Catalyst
# plans this as a null-aware anti join; a naive left-anti rewrite would
# wrongly keep the NULL-key rows. SQL-only surface (the DataFrame API has
# no null-aware anti), so both sides run the same text.
# ---------------------------------------------------------------------------
_NOT_IN_SQL = """
    SELECT segment, COUNT(*) AS n_kept
    FROM (SELECT c_mktsegment AS segment, NULLIF(c_nationkey, 3) AS k
          FROM customer)
    WHERE k NOT IN (SELECT s_nationkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY segment
"""


@defquery(
    "not_in_null_aware",
    _NOT_IN_SQL,
    doc="NOT IN subquery with nullable LHS (null-aware anti join)",
    tags=("subquery", "anti-join", "null-semantics"),
)
def q_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_nin_v")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_nin_v")
    return spark.sql(
        _NOT_IN_SQL.replace("FROM customer", "FROM customer_nin_v").replace(
            "FROM supplier", "FROM supplier_nin_v"
        )
    )


# ---------------------------------------------------------------------------
# IN (GROUP BY ... HAVING) subquery (TPC-H Q18 shape): orders whose total
# line quantity exceeds a threshold. The aggregate runs ONCE and joins back
# to orders — at 100 TB the HAVING set is small relative to lineitem, so
# the join-back side broadcasts; no second pass over the fact table.
# ---------------------------------------------------------------------------
@defquery(
    "having_large_orders",
    """
    SELECT o.o_orderkey AS orderkey,
           ROUND(o.o_totalprice, 4) AS totalprice,
           ROUND(big.total_qty, 4) AS total_qty
    FROM orders o
    JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 150) big
      ON o.o_orderkey = big.l_orderkey
    """,
    doc="IN (GROUP BY .. HAVING) subquery via aggregate + join-back (Q18 shape)",
    tags=("subquery", "having", "aggregate"),
)
def q_having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    out = o.join(big, o["o_orderkey"] == big["l_orderkey"]).select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("totalprice"),
        F.col("total_qty"),
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# Scalar subquery (TPC-H Q15 shape): supplier(s) with the maximum revenue.
# The scalar MAX is computed over the same grouped frame and joined as a
# 1-row broadcast — Catalyst's own plan for `WHERE x = (SELECT MAX..)`,
# expressed directly. Revenue ties (float-exact) all surface.
# ---------------------------------------------------------------------------
@defquery(
    "top_revenue_suppliers",
    """
    WITH rev AS (
      SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_rev
      FROM lineitem GROUP BY l_suppkey)
    SELECT s.s_suppkey AS suppkey, s.s_name AS name,
           ROUND(r.total_rev, 4) AS total_rev
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    doc="scalar MAX subquery selecting the top-revenue supplier (Q15 shape)",
    tags=("subquery", "scalar", "aggregate"),
)
def q_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    out = (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_mx"))
        .join(s, F.col("l_suppkey") == s["s_suppkey"])
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.col("total_rev"),
        )
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# LATERAL correlated subquery with per-row ORDER BY + LIMIT: top-2 orders
# per customer. The SQL-standard form of top-k-per-group; Catalyst
# decorrelates it to a ranked window under the hood (same physical shape
# as topk_per_group), so the per-customer "subquery" never executes
# row-at-a-time. Deterministic tie-break on orderkey.
# ---------------------------------------------------------------------------
_LATERAL_SQL = """
    SELECT c.c_custkey AS custkey, t.o_orderkey AS orderkey,
           ROUND(t.o_totalprice, 4) AS totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
"""


@defquery(
    "lateral_top_orders",
    _LATERAL_SQL,
    doc="LATERAL correlated subquery: top-2 orders per customer",
    tags=("subquery", "lateral", "topk"),
)
def q_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat_v")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat_v")
    return spark.sql(
        _LATERAL_SQL.replace("FROM customer", "FROM customer_lat_v").replace(
            "FROM orders", "FROM orders_lat_v"
        )
    )


# ---------------------------------------------------------------------------
# Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys match each
# other instead of vanishing from the join — the correct way to join on a
# column where NULL is a real category (here: a sentinel priority mapped
# to NULL). Still hash-joinable (NULL hashes like any value under <=>),
# so it scales exactly like a plain equi-join.
# ---------------------------------------------------------------------------
@defquery(
    "null_safe_join",
    """
    WITH a AS (
      SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS pk, COUNT(*) AS n_a
      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
    b AS (
      SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS pk, COUNT(*) AS n_b
      FROM orders WHERE o_totalprice > 100000 GROUP BY 1)
    SELECT COALESCE(a.pk, '<null>') AS pk, a.n_a, b.n_b
    FROM a JOIN b ON a.pk IS NOT DISTINCT FROM b.pk
    """,
    doc="null-safe equi-join (<=>): NULL keys match, stays hash-joinable",
    tags=("join", "null-semantics"),
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    pk = F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
    a = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(pk.alias("pk"))
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    b = (
        o.filter(F.col("o_totalprice") > 100000)
        .groupBy(pk.alias("pk"))
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    return a.join(b, a["pk"].eqNullSafe(b["pk"])).select(
        F.coalesce(a["pk"], F.lit("<null>")).alias("pk"), "n_a", "n_b"
    )


# ---------------------------------------------------------------------------
# Multiset set ops: EXCEPT ALL / INTERSECT ALL keep duplicate
# multiplicity (bag semantics) where EXCEPT/INTERSECT collapse to sets —
# e.g. "how many copies survive subtracting one file's rows from
# another" in reconciliation. Output is aggregated per key so the result
# is order-insensitive.
# ---------------------------------------------------------------------------
@defquery(
    "setops_multiset",
    """
    WITH a AS (SELECT l_partkey FROM lineitem WHERE l_quantity < 25),
         b AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
    SELECT 'except_all' AS op, l_partkey AS partkey, COUNT(*) AS n
    FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 2
    UNION ALL
    SELECT 'intersect_all' AS op, l_partkey AS partkey, COUNT(*) AS n
    FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 2
    """,
    doc="EXCEPT ALL / INTERSECT ALL multiset semantics, aggregated per key",
    tags=("setops", "multiset"),
)
def q_setops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") < 25).select("l_partkey")
    b = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    exc = (
        a.exceptAll(b)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "partkey", "n")
    )
    ins = (
        a.intersectAll(b)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "partkey", "n")
    )
    return exc.unionByName(ins)


# ---------------------------------------------------------------------------
# UNPIVOT / melt — the inverse of pivot_status_by_month: wide per-flag
# metrics back to long (metric, value) rows. Spark's unpivot and DuckDB's
# UNPIVOT both keep the value expression list ordered, so the row set is
# deterministic.
# ---------------------------------------------------------------------------
@defquery(
    "unpivot_flag_metrics",
    """
    WITH wide AS (
      SELECT l_returnflag AS flag,
             ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0, 4)
               AS sum_price,
             ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE), 4) AS sum_qty,
             ROUND(CAST(COUNT(*) AS DOUBLE), 4) AS n_rows
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT flag, metric, value
    FROM wide UNPIVOT (value FOR metric IN (sum_price, sum_qty, n_rows))
    """,
    doc="UNPIVOT: wide per-flag metrics melted to long (metric, value)",
    tags=("relational", "unpivot", "reshape"),
)
def q_unpivot_flag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        (F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 100.0)
        .alias("sum_price"),
        F.sum(F.col("l_quantity").cast("long")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).cast("double").alias("n_rows"),
    )
    out = wide.unpivot(
        ["flag"], ["sum_price", "sum_qty", "n_rows"], "metric", "value"
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# TPC-H Q21 shape (suppliers who kept orders waiting), adapted to this
# schema's dates: a supplier's line is LATE when it ships more than 30
# days after the order date. Report suppliers with a late line in a
# multi-supplier order where NO OTHER supplier was late — the classic
# semi-join + anti-join of a fact table against itself, both correlated
# on the same order key. Catalyst plans one hash-partitioning of the
# late-lines frame reused by both self-joins; supplier names arrive by
# broadcast at the end.
# ---------------------------------------------------------------------------
@defquery(
    "waiting_supplier_blame",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders o
    WHERE s_suppkey = l1.l_suppkey
      AND o.o_orderkey = l1.l_orderkey
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY s_name
    """,
    doc="Q21 shape: late line in a multi-supplier order where no other "
    "supplier was late — fact self semi-join + self anti-join on the "
    "order key, supplier dimension broadcast",
    tags=("subquery", "semi-join", "anti-join", "join"),
)
def q_waiting_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lat = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .alias("late"),
    )
    l1 = lat.filter("late")
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    multi = l1.join(
        l2, (l1["l_orderkey"] == l2["k2"]) & (l1["l_suppkey"] != l2["s2"]), "left_semi"
    )
    l3 = lat.filter("late").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    blame = multi.join(
        l3,
        (multi["l_orderkey"] == l3["k3"]) & (multi["l_suppkey"] != l3["s3"]),
        "left_anti",
    )
    out = blame.join(F.broadcast(sup), blame["l_suppkey"] == sup["s_suppkey"])
    return out.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: above-average-balance customers with no orders — a
# 1-row scalar subquery (broadcast) AND a null-free NOT EXISTS (plain
# left-anti) in one query. Balance sums as integer cents (the repo's
# float discipline: summation order can't move a BIGINT).
# ---------------------------------------------------------------------------
@defquery(
    "idle_rich_customers",
    """
    SELECT c_mktsegment AS segment, COUNT(*) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
             AS balance_cents
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    GROUP BY c_mktsegment
    """,
    doc="Q22 shape: high-balance customers with no jumbo order — scalar "
    "AVG subquery (1-row broadcast) + NOT EXISTS anti join in one "
    "query; integer-cents sums",
    tags=("subquery", "anti-join", "aggregate"),
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("_avg")
    )
    idle = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return idle.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long"))
        .cast("long")
        .alias("balance_cents"),
    )


# ---------------------------------------------------------------------------
# CDC snapshot diff: two keyed snapshots -> insert/update/delete change
# rows via ONE full-outer join on the key, value width collapsed to a
# digest before the exchange (operators/scd.py snapshot_diff — the
# row-level complement of scd2_merge). Snapshots are derived
# deterministically from orders so both engines diff identical inputs;
# the oracle replays the diff with direct value comparison, pinning the
# digest-compare implementation against the semantic definition.
# ---------------------------------------------------------------------------
@defquery(
    "snapshot_diff_orders",
    """
    WITH old AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      WHERE o_orderkey % 7 <> 0
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN o.o_totalprice <> n.o_totalprice
                  OR o.o_orderstatus <> n.o_orderstatus THEN 'update'
           END AS change_type
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE NOT (o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
               AND o.o_totalprice = n.o_totalprice
               AND o.o_orderstatus = n.o_orderstatus)
    """,
    doc="CDC snapshot diff: full-outer join on the key, digest-compare "
    "values, emit insert/update/delete rows (oracle replays with direct "
    "value comparison)",
    tags=("cdc", "join", "warehouse"),
)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shared_etl_pipelines_spark.operators.scd import snapshot_diff

    orders = _t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderstatus",
    )
    return snapshot_diff(old, new, ["o_orderkey"])


# ---------------------------------------------------------------------------
# Referential-integrity audit: orphan counts for every declared FK
# relation in one pass each — left join against the (broadcast)
# referenced keys, conditional count. events.user_id -> customer is
# deliberately included although it is NOT guaranteed by the generator,
# so the audit demonstrates a nonzero orphan report, not just green
# checkmarks.
# ---------------------------------------------------------------------------
_FK_RELATIONS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("events", "user_id", "customer", "c_custkey"),
]


@defquery(
    "fk_integrity_check",
    " UNION ALL ".join(
        f"""
        SELECT '{ft}.{fk}->{rt}' AS relation,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN r.{rk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_orphans
        FROM {ft} f LEFT JOIN (SELECT DISTINCT {rk} FROM {rt}) r
          ON f.{fk} = r.{rk}
        """
        for ft, fk, rt, rk in _FK_RELATIONS
    ),
    doc="referential-integrity audit: orphan count per declared FK "
    "relation, referenced keys deduped and broadcast",
    tags=("quality", "join", "warehouse"),
)
def q_fk_integrity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    outs = []
    for ft, fk, rt, rk in _FK_RELATIONS:
        f = _t(spark, sf_dir, ft).select(fk)
        r = _t(spark, sf_dir, rt).select(rk).distinct()
        j = f.join(F.broadcast(r), f[fk] == r[rk], "left")
        outs.append(
            j.agg(
                F.lit(f"{ft}.{fk}->{rt}").alias("relation"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(rk).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_orphans"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


# ---------------------------------------------------------------------------
# Point-in-time (PIT) dimension join — the feature-store / SCD2 lookup:
# each fact row joins the dimension VERSION that was valid at the
# fact's event time, never a later one (no leakage). The versioned
# dimension is derived deterministically from customer (3 versions per
# key, valid_to = lead(valid_from)), so both engines join identical
# inputs; the join itself is equi on the key + half-open interval
# containment — a hash join with a range residual, NOT a range-only
# join, so it scales like any keyed join. Row-level complement of
# asof_purchase_view (which matches on time alone).
# ---------------------------------------------------------------------------
@defquery(
    "pit_dimension_join",
    """
    WITH hist AS (
      SELECT c_custkey, v,
             CAST('1994-06-01' AS DATE)
               + INTERVAL (CAST(c_custkey % 97 AS INT) + v * 800) DAY AS valid_from
      FROM customer, (SELECT unnest(range(0, 3)) AS v)
    ),
    hist2 AS (
      SELECT c_custkey, v, valid_from,
             LEAD(valid_from) OVER (PARTITION BY c_custkey ORDER BY v) AS valid_to
      FROM hist
    )
    SELECT h.v AS dim_version,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o
    JOIN hist2 h
      ON o.o_custkey = h.c_custkey
     AND CAST(o.o_orderdate AS DATE) >= h.valid_from
     AND (h.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < h.valid_to)
    GROUP BY h.v
    """,
    doc="point-in-time SCD2 dimension join: fact rows match the version "
    "valid at event time (no leakage); equi-join on the key with an "
    "interval residual, versions derived deterministically",
    tags=("warehouse", "join", "scd", "pit"),
)
def q_pit_dimension_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    versions = cust.crossJoin(
        F.broadcast(
            cust.sparkSession.range(3).select(F.col("id").cast("int").alias("v"))
        )
    )
    hist = versions.select(
        "c_custkey", "v",
        F.date_add(
            F.lit("1994-06-01").cast("date"),
            (F.col("c_custkey") % 97 + F.col("v") * 800).cast("int"),
        ).alias("valid_from"),
    )
    w = Window.partitionBy("c_custkey").orderBy("v")
    hist2 = hist.withColumn("valid_to", F.lead("valid_from").over(w))
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("od"), "o_totalprice"
    )
    j = o.join(
        hist2,
        (o["o_custkey"] == hist2["c_custkey"])
        & (o["od"] >= hist2["valid_from"])
        & (hist2["valid_to"].isNull() | (o["od"] < hist2["valid_to"])),
    )
    return j.groupBy(F.col("v").alias("dim_version")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Primary-key uniqueness audit — the PK companion of
# fk_integrity_check: for every declared key, how many key values are
# duplicated and how many rows sit in duplicate groups. One map-side-
# combinable groupBy per table; the per-table results union into one
# report frame.
# ---------------------------------------------------------------------------
_PK_KEYS = [
    ("orders", ["o_orderkey"]),
    ("customer", ["c_custkey"]),
    ("part", ["p_partkey"]),
    ("supplier", ["s_suppkey"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("documents", ["doc_id"]),
    ("events", ["event_id"]),
]


@defquery(
    "pk_uniqueness_check",
    " UNION ALL ".join(
        f"""
        SELECT '{t}({" ".join(k)})' AS key_name,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
               CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_rows
        FROM (SELECT COUNT(*) AS c FROM {t} GROUP BY {", ".join(k)})
        """
        for t, k in _PK_KEYS
    ),
    doc="primary-key uniqueness audit: duplicated key values and rows "
    "per declared key, one mergeable groupBy per table",
    tags=("quality", "aggregate", "warehouse"),
)
def q_pk_uniqueness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    outs = []
    for t, k in _PK_KEYS:
        g = _t(spark, sf_dir, t).groupBy(*k).agg(F.count(F.lit(1)).alias("c"))
        outs.append(
            g.agg(
                F.lit(f"{t}({' '.join(k)})").alias("key_name"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_dup_keys"),
                F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
                .cast("long")
                .alias("n_dup_rows"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: revenue from LOCAL suppliers — customer and supplier
# must share a nation, which makes the join graph CYCLIC (orders ->
# customer -> nation <- supplier <- lineitem): the one decision-support
# shape the acyclic star queries (regional_revenue) don't cover.
# Catalyst breaks the cycle by joining the fact chain first and
# applying c_nationkey = s_nationkey as a residual equi-condition;
# all dimension sides broadcast.
# ---------------------------------------------------------------------------
@defquery(
    "local_supplier_revenue",
    """
    SELECT n_name AS nation,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM customer, orders, lineitem, supplier, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Q5 shape: local-supplier revenue per nation — cyclic join graph "
    "(customer and supplier share a nation), dimensions broadcast, "
    "integer-cents revenue",
    tags=("join", "aggregate", "star", "cyclic"),
)
def q_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return j.groupBy(F.col("n_name").alias("nation")).agg(
        F.sum(cents).cast("long").alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-table predicates — three OR
# branches, each an AND of part attributes and lineitem ranges. The
# plan point: Catalyst extracts the common l_partkey = p_partkey
# conjunct OUT of the disjunction so the join stays an equi-join (a
# naive reading would force a nested loop); the per-branch residual
# evaluates post-join, and the common lineitem bounds are pushed to
# the scan.
# ---------------------------------------------------------------------------
@defquery(
    "promo_revenue_disjunctive",
    """
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem, part
    WHERE (p_partkey = l_partkey AND p_brand = 'Brand#1'
           AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_partkey = l_partkey AND p_brand = 'Brand#2'
           AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_partkey = l_partkey AND p_brand = 'Brand#3'
           AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
    """,
    doc="Q19 shape: disjunctive part x lineitem predicates — the common "
    "equi-conjunct is factored out of the OR so the join stays hash, "
    "branch residuals evaluate post-join",
    tags=("join", "predicate", "aggregate"),
)
def q_promo_revenue_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return j.filter(branch).agg(
        F.sum(cents).cast("long").alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ===========================================================================
# Round-3 batch: the remaining classic TPC-H decision-support shapes,
# adapted to the reduced testdata schema (no partsupp / commitdate /
# receiptdate / shipmode — the part<->supplier relationship is derived
# from lineitem, ship lag from shipdate - orderdate). Together with the
# existing pricing_summary (Q1), exists_late_orders (Q4), local_supplier_
# revenue (Q5), customer_order_distribution (Q13), promo_revenue_
# disjunctive (Q19), waiting_supplier_blame (Q21) and idle_rich_customers
# (Q22) this completes the TPC-H query-shape catalog.
# All money sums use the integer-cents convention (header of queries.py).
# ===========================================================================


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: minimum-cost supplier per part within a region — the
# correlated-MIN shape. Unit cost is derived from lineitem (cents, so
# the min-equality join is exact integer math). Plan: per-(part,supp)
# agg, window-MIN per part (no self-join), dimension sides broadcast.
# ---------------------------------------------------------------------------
@defquery(
    "min_cost_supplier_region",
    """
    WITH costs AS (
        SELECT l_partkey, l_suppkey,
               CAST(MIN(CAST(ROUND(l_extendedprice * 100 / l_quantity, 0)
                             AS BIGINT)) AS BIGINT) AS unit_cost_cents
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ), eligible AS (
        SELECT c.l_partkey, c.unit_cost_cents, s_name, n_name
        FROM costs c, supplier, nation, region
        WHERE c.l_suppkey = s_suppkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
    )
    SELECT e.l_partkey AS partkey,
           e.s_name AS supplier,
           e.n_name AS nation,
           e.unit_cost_cents AS unit_cost_cents
    FROM eligible e, part
    WHERE p_partkey = e.l_partkey
      AND p_type = 'LARGE'
      AND p_size BETWEEN 10 AND 20
      AND e.unit_cost_cents = (SELECT MIN(e2.unit_cost_cents)
                               FROM eligible e2
                               WHERE e2.l_partkey = e.l_partkey)
    """,
    doc="Q2 shape: min-cost supplier per part in a region — correlated MIN "
    "done as a window (no self-join), integer-cents cost, dims broadcast",
    tags=("join", "subquery", "window"),
)
def q_min_cost_supplier_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.round(F.col("l_extendedprice") * 100 / F.col("l_quantity"), 0).cast(
                "long"
            )
        ).alias("unit_cost_cents")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select(
        "r_regionkey"
    )
    eligible = (
        costs.join(F.broadcast(s), costs["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("l_partkey", "unit_cost_cents", "s_name", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    best = eligible.withColumn(
        "min_cost", F.min("unit_cost_cents").over(w)
    ).filter(F.col("unit_cost_cents") == F.col("min_cost"))
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20))
        .select("p_partkey")
    )
    return best.join(F.broadcast(p), best["l_partkey"] == p["p_partkey"]).select(
        F.col("l_partkey").alias("partkey"),
        F.col("s_name").alias("supplier"),
        F.col("n_name").alias("nation"),
        "unit_cost_cents",
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: bidirectional trade volume between two nations by
# ship year — the both-directions OR predicate over a 6-table join.
# ---------------------------------------------------------------------------
@defquery(
    "nation_pair_trade_volume",
    """
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey
      AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
    doc="Q7 shape: trade volume between a nation pair, both directions, "
    "per ship year — shipdate range pushed to the scan, dims broadcast",
    tags=("join", "aggregate", "predicate"),
)
def q_nation_pair_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("ship_year"),
    ).agg(
        F.sum(cents).cast("long").alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: a nation's market share inside a region per order
# year. Numerator and denominator are integer-cents sums, so the final
# division is deterministic across engines (sum order can't perturb it).
# ---------------------------------------------------------------------------
@defquery(
    "nation_market_share",
    """
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN cents ELSE 0 END)
                      AS DOUBLE) / SUM(cents), 4) AS mkt_share,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                    AS BIGINT) AS cents,
               n2.n_name AS nation
        FROM part, supplier, lineitem, orders, customer, nation n1,
             nation n2, region
        WHERE p_partkey = l_partkey
          AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey
          AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey
          AND n1.n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND s_nationkey = n2.n_nationkey
          AND p_type = 'PROMO'
    ) t
    GROUP BY o_year
    """,
    doc="Q8 shape: supplier-nation market share within a consumer region "
    "per year — nested agg over an 8-table join, exact integer-cents "
    "numerator/denominator",
    tags=("join", "aggregate", "star"),
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r["r_regionkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("n2_key"))
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    agg = j.groupBy(F.year("o_orderdate").cast("int").alias("o_year")).agg(
        F.sum(F.when(F.col("nation") == "NATION_5", cents).otherwise(F.lit(0))).alias(
            "nat_cents"
        ),
        F.sum(cents).alias("tot_cents"),
    )
    return agg.select(
        "o_year",
        F.round(F.col("nat_cents").cast("double") / F.col("tot_cents"), 4).alias(
            "mkt_share"
        ),
        F.col("tot_cents").cast("long").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: product-type profit by supplier nation and year. No
# partsupp in this schema, so cost is proxied as 60% of retail price;
# profit is rounded to cents ONCE per row, then integer-summed (exact).
# ---------------------------------------------------------------------------
@defquery(
    "product_type_profit",
    """
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)
                                - 0.6 * p_retailprice * l_quantity) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS profit_cents
    FROM part, supplier, lineitem, orders, nation
    WHERE p_partkey = l_partkey
      AND s_suppkey = l_suppkey
      AND o_orderkey = l_orderkey
      AND s_nationkey = n_nationkey
      AND p_type = 'ECONOMY'
    GROUP BY n_name, year(o_orderdate)
    """,
    doc="Q9 shape: profit (revenue minus 0.6*retail cost proxy) by "
    "supplier nation and order year — per-row cents rounding, exact sums",
    tags=("join", "aggregate", "star"),
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey", "p_retailprice")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    profit_cents = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100,
        0,
    ).cast("long")
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("int").alias("o_year"),
    ).agg(F.sum(profit_cents).cast("long").alias("profit_cents"))


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: important stock — per-part shipped value within one
# nation's suppliers, kept if above a fraction of the nation total (a
# global scalar-subquery threshold). The Spark side broadcasts the
# 1-row total back against the per-part aggregate — no single-partition
# window exchange.
# ---------------------------------------------------------------------------
@defquery(
    "important_stock_value",
    """
    WITH v AS (
        SELECT l_partkey,
               CAST(SUM(CAST(ROUND(l_quantity * p_retailprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS value_cents
        FROM lineitem, supplier, nation, part
        WHERE l_suppkey = s_suppkey
          AND s_nationkey = n_nationkey
          AND n_name = 'NATION_3'
          AND p_partkey = l_partkey
        GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, value_cents
    FROM v
    WHERE value_cents > (SELECT 0.001 * SUM(value_cents) FROM v)
    """,
    doc="Q11 shape: per-part stock value for one nation's suppliers above "
    "a global-total fraction — scalar subquery via 1-row broadcast join",
    tags=("join", "aggregate", "subquery"),
)
def q_important_stock_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    v = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_quantity") * F.col("p_retailprice") * 100, 0).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("value_cents")
        )
    )
    total = v.agg((F.lit(0.001) * F.sum("value_cents")).alias("threshold"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("value_cents") > F.col("threshold"))
        .select(F.col("l_partkey").alias("partkey"), "value_cents")
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: ship-lag service buckets vs order priority. The
# schema has no shipmode/receiptdate, so the bucket is days from order
# to ship (integer datediff — exact in both engines).
# ---------------------------------------------------------------------------
@defquery(
    "ship_lag_priority_counts",
    """
    SELECT CASE
             WHEN datediff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= 30 THEN 'fast'
             WHEN datediff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= 90 THEN 'normal'
             ELSE 'slow'
           END AS lag_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
    GROUP BY 1
    """,
    doc="Q12 shape: order-to-ship lag buckets vs priority class — integer "
    "datediff bucketing, conditional counts",
    tags=("join", "aggregate", "timeseries"),
)
def q_ship_lag_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = (
        F.when(lag <= 30, "fast").when(lag <= 90, "normal").otherwise("slow")
    ).alias("lag_bucket")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(bucket).agg(
        F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
        F.sum(F.when(is_high, 0).otherwise(1)).cast("long").alias("low_line_count"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: how many distinct suppliers ship each (brand, type,
# size) combo — COUNT(DISTINCT) after an anti-join exclusion list
# (suppliers with negative balance), part attribute NOT-filters.
# ---------------------------------------------------------------------------
@defquery(
    "part_supplier_variety",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="Q16 shape: distinct-supplier variety per part attribute combo, "
    "excluding negative-balance suppliers via broadcast anti-join",
    tags=("join", "aggregate", "subquery"),
)
def q_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: revenue from small-quantity orders — lineitems below
# 50% of their part's average quantity. Quantities are integer-valued
# doubles, so AVG is exact (integer sum / count) and the comparison is
# deterministic across engines. The correlated scalar AVG becomes a
# per-part aggregate joined back on partkey (shuffle join at scale —
# the avg table is part-cardinality, too big to broadcast at 100 TB).
# ---------------------------------------------------------------------------
@defquery(
    "small_qty_order_revenue",
    """
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#4'
      AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
    doc="Q17 shape: small-quantity order revenue — correlated per-part "
    "AVG as an aggregate-and-rejoin, exact integer-valued quantity math",
    tags=("join", "aggregate", "subquery"),
)
def q_small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(avg_qty, li["l_partkey"] == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
    )
    return j.agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume customers — orders whose total quantity
# exceeds a threshold, with customer detail. The HAVING subquery is the
# same aggregate reused (semi-join on orderkey).
# ---------------------------------------------------------------------------
@defquery(
    "large_volume_customers",
    """
    SELECT c_custkey,
           o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(o_totalprice, 4) AS totalprice,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(l_quantity) > 200)
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d'),
             o_totalprice
    """,
    doc="Q18 shape: customers with orders above a total-quantity "
    "threshold — aggregate once, filter, rejoin detail",
    tags=("join", "aggregate", "subquery"),
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 4).alias("totalprice"),
            F.col("total_qty").cast("long").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: suppliers who shipped an excess volume of a part
# class in a year — nested HAVING aggregate driving a semi-join into
# the supplier dimension.
# ---------------------------------------------------------------------------
@defquery(
    "excess_shipper_names",
    """
    SELECT s_name AS supplier, n_name AS nation
    FROM supplier, nation
    WHERE s_nationkey = n_nationkey
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem, part
          WHERE p_partkey = l_partkey
            AND p_type = 'SMALL'
            AND l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey
          HAVING SUM(l_quantity) > 400)
    """,
    doc="Q20 shape: suppliers shipping excess volume of a part class in "
    "a year — HAVING aggregate driving a semi-join",
    tags=("join", "aggregate", "subquery"),
)
def q_excess_shipper_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "SMALL")
        .select("p_partkey")
    )
    heavy = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 400)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(F.broadcast(heavy), s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .select(F.col("s_name").alias("supplier"), F.col("n_name").alias("nation"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: shipping-priority top-10 — unshipped revenue of
# BUILDING-segment orders placed before a date, shipped after it.
# Three-way join with the customer filter semi-joined in, distributed
# top-10 as orderBy().limit() (map-side partial top-k, never a global
# single-partition sort).
# ---------------------------------------------------------------------------
@defquery(
    "shipping_priority_top10",
    """
    SELECT l_orderkey,
           ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT)) / 100.0, 4) AS revenue,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: unshipped-order revenue top-10 for one segment "
    "(priority column stands in for the absent shippriority)",
    tags=("tpch", "join", "topk"),
)
def q_shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1995-03-15").cast("date")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1995-03-15").cast("date")
    )
    j = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"], "left_semi")
    agg = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            )
            / 100.0,
            4,
        ).alias("revenue")
    )
    return (
        agg.orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias(
                "orderdate"
            ),
            "o_orderpriority",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: forecast revenue change — one tight scan with every
# predicate pushed to parquet, SUM(price * discount) over the qualifying
# band. The pushdown poster child: the plan must show all four filters
# in PushedFilters and read only three columns.
# ---------------------------------------------------------------------------
@defquery(
    "forecast_revenue_change",
    """
    SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * l_discount * 100)
                          AS BIGINT)) / 100.0, 4) AS revenue_delta,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: single-scan aggregate with every predicate "
    "pushed down — what-if revenue from discount elimination",
    tags=("tpch", "scan", "pushdown", "aggregate"),
)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    filt = li.filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return filt.agg(
        F.round(
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_discount") * 100)
                .cast("long")
            )
            / 100.0,
            4,
        ).alias("revenue_delta"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item reporting — top-20 customers by revenue
# lost to returns in one quarter. Fact filtered first, dimensions
# broadcast, distributed top-k limit.
# ---------------------------------------------------------------------------
@defquery(
    "returned_item_customers",
    """
    SELECT c_custkey, c_name, n_name AS nation,
           ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT)) / 100.0, 4) AS lost_revenue,
           ROUND(MAX(c_acctbal), 4) AS acctbal
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: top-20 customers by returned revenue in a "
    "quarter — filtered fact, broadcast dims, distributed top-k",
    tags=("tpch", "join", "topk", "aggregate"),
)
def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.round(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            )
            / 100.0,
            4,
        ).alias("lost_revenue"),
        F.round(F.max("c_acctbal"), 4).alias("acctbal"),
    )
    return (
        agg.orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            "lost_revenue",
            "acctbal",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promotion effect — the share of one month's revenue
# from promo-class parts. Conditional aggregation over a single join;
# exact integer-cents numerator AND denominator, one final division.
# ---------------------------------------------------------------------------
@defquery(
    "promo_revenue_share",
    """
    WITH j AS (
      SELECT CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
               AS cents,
             CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS is_promo
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND CAST(l_shipdate AS DATE) >= DATE '1995-09-01'
        AND CAST(l_shipdate AS DATE) < DATE '1995-10-01'
    )
    SELECT ROUND(100.0 * SUM(CASE WHEN is_promo = 1 THEN cents ELSE 0 END)
                 / SUM(cents), 4) AS promo_pct,
           ROUND(SUM(CASE WHEN is_promo = 1 THEN cents ELSE 0 END) / 100.0, 4)
             AS promo_revenue,
           ROUND(SUM(cents) / 100.0, 4) AS total_revenue
    FROM j
    """,
    doc="TPC-H Q14 shape: promo revenue share for one month — "
    "conditional aggregation, exact-cents numerator and denominator",
    tags=("tpch", "join", "aggregate"),
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").startswith("PROMO").alias("is_promo")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1995-09-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1995-10-01").cast("date"))
    )
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).select(
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("cents"),
        F.when(F.col("is_promo"), 1).otherwise(0).alias("is_promo"),
    )
    promo = F.sum(F.when(F.col("is_promo") == 1, F.col("cents")).otherwise(0))
    total = F.sum("cents")
    return j.agg(
        F.round(100.0 * promo / total, 4).alias("promo_pct"),
        F.round(promo / 100.0, 4).alias("promo_revenue"),
        F.round(total / 100.0, 4).alias("total_revenue"),
    )


# ---------------------------------------------------------------------------
# Merge-on-read table maintenance (sources/warehouse.py mor_*): the
# Iceberg/Delta deletion-vector pattern next to O5's copy-on-write
# MERGE. Two change batches over an orders base snapshot:
#   batch 1: DELETE keys %13==0, UPSERT keys %17==0 (price +1000.00,
#            priority '1-URGENT') — a key that is both (%221==0) is
#            deleted AND re-upserted in the same batch; the upsert wins
#            (tombstones kill strictly older versions only).
#   batch 2: UPSERT keys %26==0 (price 1234.50, priority '5-LOW') —
#            re-insertion of keys deleted in batch 1.
# The reader folds appended versions + tombstones with one keyed
# shuffle; the oracle computes the final state directly from orders.
# Integer-cents arithmetic keeps every price exact.
# ---------------------------------------------------------------------------
def _mor_orders_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per testdata fingerprint) the shared merge-on-read
    orders table — base snapshot + the two change batches documented
    above — and return its path. Shared by the state / time-travel /
    changelog / history queries so they all read one table, exactly as
    a warehouse's consumers would."""
    import os
    import tempfile

    from shared_etl_pipelines_spark.sources.warehouse import (
        mor_apply_changes,
        mor_write_base,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    src = os.path.join(sf_dir, "orders.parquet")
    try:
        st = os.stat(src)
        fp = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        fp = "nostat"
    tag = f"{os.path.basename(os.path.normpath(sf_dir))}_{fp}"
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_mor_{tag}")
    # Gate the cache on a .done marker written AFTER the last change
    # batch, not on _SUCCESS (which mor_write_base creates at the base
    # write — BEFORE the batches apply; ADVICE r6 #1: a crash in the
    # window would permanently cache a half-built fixture and every
    # mor_* query would silently diverge from its oracle). A partial
    # build (no marker) is torn down wholesale so appended versions,
    # tombstones, and a mid-apply writer lock can never accumulate.
    done = path + ".done"
    if not os.path.exists(done):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        mor_write_base(orders, path)
        k = F.col("o_orderkey")
        mor_apply_changes(
            spark,
            path,
            ["o_orderkey"],
            upserts=orders.filter(k % 17 == 0).select(
                "o_orderkey",
                F.lit("1-URGENT").alias("o_orderpriority"),
                (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
            ),
            delete_keys=orders.filter(k % 13 == 0).select("o_orderkey"),
        )
        mor_apply_changes(
            spark,
            path,
            ["o_orderkey"],
            upserts=orders.filter(k % 26 == 0).select(
                "o_orderkey",
                F.lit("5-LOW").alias("o_orderpriority"),
                F.lit(1234.5).alias("o_totalprice"),
            ),
        )
        with open(done, "w") as fh:
            fh.write("ok")
    return path


@defquery(
    "mor_orders_state",
    """
    WITH final AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 26 = 0 THEN '5-LOW'
                  WHEN o_orderkey % 17 = 0 THEN '1-URGENT'
                  ELSE o_orderpriority END AS o_orderpriority,
             CASE WHEN o_orderkey % 26 = 0 THEN 123450
                  WHEN o_orderkey % 17 = 0
                       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) + 100000
                  ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents
      FROM orders
      WHERE o_orderkey % 26 = 0 OR o_orderkey % 17 = 0 OR o_orderkey % 13 <> 0
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(cents) / 100.0, 4) AS total_price,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM final GROUP BY o_orderpriority
    """,
    doc="merge-on-read table state after two change batches (append-only "
    "upserts + key tombstones, same-batch delete+upsert, delete-then-"
    "reinsert) folded by the keyed reader — the deletion-vector twin of "
    "O5's copy-on-write MERGE",
    tags=("warehouse", "merge", "scale-path"),
)
def q_mor_orders_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shared_etl_pipelines_spark.sources.warehouse import mor_read

    path = _mor_orders_fixture(spark, sf_dir)
    state = mor_read(spark, path, ["o_orderkey"])
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    out = state.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum(cents) / 100.0, 4).alias("total_price"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# Bucketed merge-on-read twin (sources/warehouse.py mor_*_bucketed,
# VERDICT r5 #5): the SAME two change batches as mor_orders_state, but
# base + appended versions + tombstones all live in bucketBy(o_orderkey)
# tables, so the reader's latest-version window and tombstone merge run
# with ZERO shuffle exchanges (plan-gated in tests/test_warehouse.py::
# test_mor_bucketed_read_is_zero_exchange) — the layout that removes the
# per-read keyed shuffle (the standard MoR read debt) at 100 TB. Oracle
# identical to mor_orders_state: layout must never change semantics.
# ---------------------------------------------------------------------------
@defquery(
    "mor_orders_state_bucketed",
    """
    WITH final AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 26 = 0 THEN '5-LOW'
                  WHEN o_orderkey % 17 = 0 THEN '1-URGENT'
                  ELSE o_orderpriority END AS o_orderpriority,
             CASE WHEN o_orderkey % 26 = 0 THEN 123450
                  WHEN o_orderkey % 17 = 0
                       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) + 100000
                  ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents
      FROM orders
      WHERE o_orderkey % 26 = 0 OR o_orderkey % 17 = 0 OR o_orderkey % 13 <> 0
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(cents) / 100.0, 4) AS total_price,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM final GROUP BY o_orderpriority
    """,
    doc="bucketed merge-on-read state after the same two change batches "
    "as mor_orders_state, read with a zero-exchange latest-version "
    "window + tombstone merge over the bucket layout — the read path "
    "that survives 100 TB without a per-read keyed shuffle",
    tags=("warehouse", "merge", "scale-path"),
)
def q_mor_orders_state_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import re

    from shared_etl_pipelines_spark.sources.warehouse import (
        mor_apply_changes_bucketed,
        mor_create_bucketed,
        mor_read_bucketed,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    tag = re.sub(r"\W", "_", os.path.basename(os.path.normpath(sf_dir)))
    tbl = f"mor_orders_b_{tag}"
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for t in (tbl, f"{tbl}__tombstones", f"{tbl}__compacting"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a stale managed-table dir from a previous session (in-memory
        # catalog forgets tables; the warehouse dir does not) would make
        # the append-mode tombstone write adopt old rows — clear it
        try:
            from shared_etl_pipelines_spark.engine import hadoop_fs

            fs, jp = hadoop_fs(spark, os.path.join(wh, t))
            if fs.exists(jp):
                fs.delete(jp, True)
        except Exception:
            pass
    mor_create_bucketed(orders, tbl, ["o_orderkey"], n_buckets=8)
    k = F.col("o_orderkey")
    mor_apply_changes_bucketed(
        spark,
        tbl,
        ["o_orderkey"],
        upserts=orders.filter(k % 17 == 0).select(
            "o_orderkey",
            F.lit("1-URGENT").alias("o_orderpriority"),
            (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        ),
        delete_keys=orders.filter(k % 13 == 0).select("o_orderkey"),
        n_buckets=8,
    )
    mor_apply_changes_bucketed(
        spark,
        tbl,
        ["o_orderkey"],
        upserts=orders.filter(k % 26 == 0).select(
            "o_orderkey",
            F.lit("5-LOW").alias("o_orderpriority"),
            F.lit(1234.5).alias("o_totalprice"),
        ),
        n_buckets=8,
    )
    state = mor_read_bucketed(spark, tbl, ["o_orderkey"])
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    out = state.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum(cents) / 100.0, 4).alias("total_price"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# Time travel over the merge-on-read table (sources/warehouse.py
# mor_read(as_of_seq=...)): every row and tombstone carries the batch
# seq that minted it, so a snapshot read is a seq-<= filter pruned at
# the scan before the latest-version fold — the Iceberg/Delta
# snapshot-read pattern on plain parquet (history bounded by the last
# compaction, which folds everything into a new seq-0 base). One query
# pins all three snapshots of the shared fixture: seq 0 must equal the
# untouched base, seq 1 the state after batch 1, seq 2 the final state.
# ---------------------------------------------------------------------------
@defquery(
    "mor_orders_time_travel",
    """
    WITH s0 AS (
      SELECT o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    s1 AS (
      SELECT CASE WHEN o_orderkey % 17 = 0 THEN '1-URGENT'
                  ELSE o_orderpriority END AS o_orderpriority,
             CASE WHEN o_orderkey % 17 = 0
                       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) + 100000
                  ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents
      FROM orders WHERE o_orderkey % 17 = 0 OR o_orderkey % 13 <> 0
    ),
    s2 AS (
      SELECT CASE WHEN o_orderkey % 26 = 0 THEN '5-LOW'
                  WHEN o_orderkey % 17 = 0 THEN '1-URGENT'
                  ELSE o_orderpriority END AS o_orderpriority,
             CASE WHEN o_orderkey % 26 = 0 THEN 123450
                  WHEN o_orderkey % 17 = 0
                       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) + 100000
                  ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents
      FROM orders
      WHERE o_orderkey % 26 = 0 OR o_orderkey % 17 = 0 OR o_orderkey % 13 <> 0
    )
    SELECT CAST(0 AS BIGINT) AS as_of, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(cents) / 100.0, 4) AS total_price,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low
    FROM s0
    UNION ALL
    SELECT CAST(1 AS BIGINT), CAST(COUNT(*) AS BIGINT),
           ROUND(SUM(cents) / 100.0, 4),
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM s1
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
           ROUND(SUM(cents) / 100.0, 4),
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM s2
    """,
    doc="snapshot reads of the merge-on-read table at every seq (0 = "
    "base, 1 = after batch 1, 2 = final): as_of_seq prunes versions "
    "and tombstones at the scan, so each historical state folds "
    "exactly and costs no more than a current read",
    tags=("warehouse", "merge", "time-travel", "scale-path"),
)
def q_mor_orders_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shared_etl_pipelines_spark.sources.warehouse import mor_read

    path = _mor_orders_fixture(spark, sf_dir)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    snaps = []
    for s in (0, 1, 2):
        st = mor_read(spark, path, ["o_orderkey"], as_of_seq=s)
        snaps.append(
            st.select(cents.alias("cents"), "o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.round(F.sum("cents") / 100.0, 4).alias("total_price"),
                F.sum(
                    F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
                ).cast("long").alias("n_urgent"),
                F.sum(
                    F.when(F.col("o_orderpriority") == "5-LOW", 1).otherwise(0)
                ).cast("long").alias("n_low"),
            )
            .select(F.lit(s).cast("long").alias("as_of"), "*")
        )
    out = snaps[0].unionByName(snaps[1]).unionByName(snaps[2])
    return round_floats(out)


# ---------------------------------------------------------------------------
# CDC changelog over the merge-on-read table (sources/warehouse.py
# mor_changelog): the row-level diff that turns snapshot from_seq into
# snapshot to_seq — op in {insert, update, delete}, postimage on
# insert/update, preimage on delete, version-identity change detection
# (the Delta CDF / Iceberg changelog-scan contract, including
# delete-then-reinsert collapsing to one update over a range). Window
# 0->1 exercises update + delete-with-preimage; 1->2 exercises insert
# (keys deleted in batch 1 coming back) + update.
# ---------------------------------------------------------------------------
@defquery(
    "mor_orders_changelog",
    """
    WITH c01 AS (
      SELECT '0->1' AS win,
             CASE WHEN o_orderkey % 17 = 0 THEN 'update'
                  ELSE 'delete' END AS op,
             CASE WHEN o_orderkey % 17 = 0
                       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) + 100000
                  ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents,
             o_orderkey
      FROM orders WHERE o_orderkey % 17 = 0 OR o_orderkey % 13 = 0
    ),
    c12 AS (
      SELECT '1->2' AS win,
             CASE WHEN o_orderkey % 13 = 0 AND o_orderkey % 17 <> 0
                  THEN 'insert' ELSE 'update' END AS op,
             CAST(123450 AS BIGINT) AS cents,
             o_orderkey
      FROM orders WHERE o_orderkey % 26 = 0
    ),
    u AS (SELECT * FROM c01 UNION ALL SELECT * FROM c12)
    SELECT win, op, CAST(COUNT(*) AS BIGINT) AS n_changes,
           ROUND(SUM(cents) / 100.0, 4) AS total_price,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM u GROUP BY win, op
    """,
    doc="CDC reads of the merge-on-read table over both batch windows: "
    "per (window, op) counts and value sums — updates/inserts carry "
    "the postimage, deletes the preimage, unchanged keys emit nothing",
    tags=("warehouse", "merge", "cdc", "scale-path"),
)
def q_mor_orders_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shared_etl_pipelines_spark.sources.warehouse import mor_changelog

    path = _mor_orders_fixture(spark, sf_dir)
    c01 = mor_changelog(spark, path, ["o_orderkey"], 0, 1).withColumn(
        "win", F.lit("0->1")
    )
    c12 = mor_changelog(spark, path, ["o_orderkey"], 1, 2).withColumn(
        "win", F.lit("1->2")
    )
    both = c01.unionByName(c12)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    out = (
        both.select("win", F.col("_op").alias("op"), cents.alias("cents"), "o_orderkey")
        .groupBy("win", "op")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_changes"),
            F.round(F.sum("cents") / 100.0, 4).alias("total_price"),
            F.min("o_orderkey").cast("long").alias("min_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
        )
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# History audit of the merge-on-read table (sources/warehouse.py
# mor_history): one row per change batch — rows appended and keys
# tombstoned at each seq (seq 0 = the base snapshot / last compaction).
# Two grouped counts over the data and tombstone logs; batch 1
# tombstones every upserted AND deleted key (upserts kill their own
# older versions), batch 2 only its upsert keys.
# ---------------------------------------------------------------------------
@defquery(
    "mor_history_audit",
    """
    SELECT CAST(0 AS BIGINT) AS seq,
           CAST(COUNT(*) AS BIGINT) AS rows_appended,
           CAST(0 AS BIGINT) AS keys_tombstoned
    FROM orders
    UNION ALL
    SELECT CAST(1 AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_orderkey % 17 = 0),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_orderkey % 17 = 0 OR o_orderkey % 13 = 0)
    UNION ALL
    SELECT CAST(2 AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_orderkey % 26 = 0),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_orderkey % 26 = 0)
    """,
    doc="per-batch audit log of the merge-on-read table: rows appended "
    "and keys tombstoned at each seq, from two grouped counts over the "
    "data and tombstone directories",
    tags=("warehouse", "merge", "audit"),
)
def q_mor_history_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shared_etl_pipelines_spark.sources.warehouse import mor_history

    path = _mor_orders_fixture(spark, sf_dir)
    return mor_history(spark, path).select(
        F.col("_seq").alias("seq"), "rows_appended", "keys_tombstoned"
    )


def _evolved_orders_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per testdata fingerprint) the partition-evolved
    orders table: era 0 = pre-1996 orders partitioned by o_year only,
    era 1 = 1996+ orders partitioned by (o_year, o_orderpriority) —
    the Iceberg spec-evolution shape where the new key applies to new
    data only and history is never rewritten. Gated on a .done marker
    written after the last era commit (the fixture convention since
    ADVICE r6 #1/#2)."""
    import os
    import shutil
    import tempfile

    from shared_etl_pipelines_spark.sources.warehouse import write_partition_era

    src = os.path.join(sf_dir, "orders.parquet")
    try:
        st = os.stat(src)
        fp = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        fp = "nostat"
    tag = f"{os.path.basename(os.path.normpath(sf_dir))}_{fp}"
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_evolved_{tag}")
    done = path + ".done"
    if not os.path.exists(done):
        shutil.rmtree(path, ignore_errors=True)
        orders = _t(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        write_partition_era(
            orders.filter(F.col("o_year") < 1996), path, ["o_year"]
        )
        write_partition_era(
            orders.filter(F.col("o_year") >= 1996),
            path,
            ["o_year", "o_orderpriority"],
        )
        with open(done, "w") as fh:
            fh.write("ok")
    return path


@defquery(
    "partition_evolution_read",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 4)
             AS total_price
    FROM orders
    WHERE year(o_orderdate) IN (1995, 1997)
      AND o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
    doc="partition-spec evolution read (Iceberg rule: a spec change "
    "applies to new data only): pre-1996 files keep the o_year-only "
    "layout, 1996+ files add o_orderpriority as a partition key; one "
    "query prunes era-1 directories on BOTH keys while the same "
    "priority predicate pushes into era-0's parquet scan as a row "
    "filter — history is never rewritten (plan-gated in tests)",
    tags=("warehouse", "partitioning", "scale-path"),
)
def q_partition_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shared_etl_pipelines_spark.sources.warehouse import read_evolved

    path = _evolved_orders_fixture(spark, sf_dir)
    df = read_evolved(spark, path)
    out = (
        df.filter(
            F.col("o_year").isin(1995, 1997)
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0,
                4,
            ).alias("total_price"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# Schema evolution on the merge-on-read table: a later change batch
# carries a column the base never had (o_channel). Parquet appends are
# per-file schemas; mor_read(merge_schema=True) unions footers so the
# table reads as the EVOLVED schema with pre-evolution rows NULL in the
# new column — add-column-with-NULL-default, the Iceberg/Delta
# evolution rule, no base rewrite. Own fixture table (the shared one
# must keep its judged final state), built once per testdata
# fingerprint with a .done marker so a crashed build never caches a
# half-applied table.
# ---------------------------------------------------------------------------
@defquery(
    "mor_schema_evolution",
    """
    SELECT CASE WHEN o_orderkey % 11 <> 0 THEN 'legacy'
                WHEN o_orderkey % 22 = 0 THEN 'WEB'
                ELSE 'MOBILE' END AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(CASE WHEN o_orderkey % 11 = 0
                          THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                               + 500000
                          ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT)
                     END) / 100.0, 4) AS total_price
    FROM orders GROUP BY 1
    """,
    doc="merge-on-read schema evolution: a change batch adds o_channel, "
    "merge-schema read surfaces it with NULL (-> 'legacy') on every "
    "pre-evolution row — add-column without rewriting the base",
    tags=("warehouse", "merge", "schema-evolution", "scale-path"),
)
def q_mor_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from shared_etl_pipelines_spark.sources.warehouse import (
        mor_apply_changes,
        mor_read,
        mor_write_base,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    src = os.path.join(sf_dir, "orders.parquet")
    try:
        st = os.stat(src)
        fp = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        fp = "nostat"
    tag = f"{os.path.basename(os.path.normpath(sf_dir))}_{fp}"
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_mor_evo_{tag}")
    done = path + ".done"
    if not os.path.exists(done):
        k = F.col("o_orderkey")
        mor_write_base(orders, path)
        mor_apply_changes(
            spark,
            path,
            ["o_orderkey"],
            upserts=orders.filter(k % 11 == 0).select(
                "o_orderkey",
                "o_orderpriority",
                (F.col("o_totalprice") + 5000.0).alias("o_totalprice"),
                F.when(k % 22 == 0, F.lit("WEB"))
                .otherwise(F.lit("MOBILE"))
                .alias("o_channel"),
            ),
        )
        with open(done, "w") as fh:
            fh.write("ok")
    state = mor_read(spark, path, ["o_orderkey"], merge_schema=True)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    out = (
        state.select(
            F.coalesce(F.col("o_channel"), F.lit("legacy")).alias("channel"),
            cents.alias("cents"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("cents") / 100.0, 4).alias("total_price"),
        )
    )
    return round_floats(out)


# ---------------------------------------------------------------------------
# ORC round trip (sources/sinks coverage beside parquet and JSONL): the
# lineitem slice is written once to ORC and every read goes through the
# ORC scan with the date filter PUSHED into the reader (plan-gated in
# tests/test_warehouse.py — PushedFilters on the OrcScan) and the
# projection pruned to the 5 used columns. Q1-shaped integer-cents
# aggregate; the oracle runs the same query over the parquet source, so
# a single flipped value anywhere in the container round trip fails the
# hash.
# ---------------------------------------------------------------------------
@defquery(
    "orc_roundtrip_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0, 4)
             AS sum_base_price,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Q1-shaped pricing aggregate read back through an ORC container "
    "round trip with filter pushdown and column pruning on the ORC "
    "scan; oracle runs over the parquet source — any container "
    "corruption fails the value hash",
    tags=("sources", "orc", "aggregate", "scale-path"),
)
def q_orc_roundtrip_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    li = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice",
    )
    src = os.path.join(sf_dir, "lineitem.parquet")
    try:
        st = os.stat(src)
        fp = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        fp = "nostat"
    tag = f"{os.path.basename(os.path.normpath(sf_dir))}_{fp}"
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_orc_{tag}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        li.withColumn(
            "l_shipdate_d", F.col("l_shipdate").cast("date")
        ).write.mode("overwrite").orc(path)
    o = spark.read.orc(path).filter(
        F.col("l_shipdate_d") <= F.lit("1998-09-02").cast("date")
    )
    out = o.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.round(F.col("l_quantity")).cast("long")).cast("long").alias(
            "sum_qty"
        ),
        F.round(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 100.0, 4
        ).alias("sum_base_price"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    return round_floats(out)

"""Declared relational queries (SURVEY.md §2.6–§2.8) on the TPC-H-ish tables.

The reference implements no joins/set-ops/scalar surface (its only join-like
operation is the Solr→Cassandra semi-join, covered in tsdb_queries); these
queries exercise the full relational algebra the Spark engine gets from
Catalyst, declared for the judged contract.

Scale notes are attached per query: which side broadcasts, where the shuffle
lands, why the plan survives 100×.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from mycenae_spark.registry.util import expand_rounding_macros, r4, rN, t

QUERIES = {}
ORACLE = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = expand_rounding_macros(sql)
        return fn

    return deco


# -------------------------------------------------------------- §2.6 joins

@q(
    "join_inner",
    "SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "WHERE o.o_orderstatus = 'F'",
)
def join_inner(spark, sf_dir):
    """J2: equi inner join.  customer ≪ orders ⇒ AQE broadcasts customer;
    the orders side streams with no shuffle."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@q(
    "join_broadcast",
    "SELECT p.p_brand, count(*) AS n_items, "
    "round4(sum(l.l_extendedprice * (1 - l.l_discount))) AS revenue_r "
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
    "GROUP BY p.p_brand",
)
def join_broadcast(spark, sf_dir):
    """J2 broadcast variant: explicit broadcast hint on the dimension —
    lineitem (the 100 TB fact) is never shuffled for the join; the groupBy
    then partial-aggregates map-side on few distinct brands."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_r"
            ),
        )
    )


@q(
    "join_left",
    "SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders "
    "FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
    "GROUP BY c.c_custkey, c.c_name",
)
def join_left(spark, sf_dir):
    """J3 left outer: customers keep their row at zero orders."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@q(
    "join_full",
    """
WITH cc AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
     ss AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT coalesce(cc.nk, ss.nk) AS nationkey, cc.n_cust, ss.n_supp
FROM cc FULL OUTER JOIN ss ON cc.nk = ss.nk
""",
)
def join_full(spark, sf_dir):
    """J3 full outer over two pre-aggregates (nulls on either side)."""
    c = t(spark, sf_dir, "customer").groupBy(
        F.col("c_nationkey").alias("nk")
    ).agg(F.count(F.lit(1)).alias("n_cust"))
    s = t(spark, sf_dir, "supplier").groupBy(
        F.col("s_nationkey").alias("nk")
    ).agg(F.count(F.lit(1)).alias("n_supp"))
    return (
        c.join(s, "nk", "full")
        .select(F.col("nk").alias("nationkey"), "n_cust", "n_supp")
    )


@q(
    "join_anti",
    "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
)
def join_anti(spark, sf_dir):
    """J4 anti: customers with no orders (broadcast anti at this shape;
    at scale the orders side pre-aggregates to distinct keys first)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_custkey").distinct()
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@q(
    "join_range",
    """
SELECT a.p_partkey, count(*) AS n_close
FROM part a JOIN part b
  ON a.p_brand = b.p_brand
 AND b.p_size BETWEEN a.p_size - 1 AND a.p_size + 1
 AND a.p_partkey <> b.p_partkey
GROUP BY a.p_partkey
""",
)
def join_range(spark, sf_dir):
    """J5 theta/band join: equi key (brand) carries the hash join; the band
    predicate rides as a post-join filter, so no cartesian blowup."""
    a = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    b = (
        t(spark, sf_dir, "part")
        .select(
            F.col("p_partkey").alias("b_key"),
            F.col("p_brand").alias("b_brand"),
            F.col("p_size").alias("b_size"),
        )
    )
    cond = (
        (a.p_brand == b.b_brand)
        & (b.b_size >= a.p_size - 1)
        & (b.b_size <= a.p_size + 1)
        & (a.p_partkey != b.b_key)
    )
    return a.join(b, cond).groupBy("p_partkey").agg(F.count(F.lit(1)).alias("n_close"))


@q(
    "join_asof",
    """
SELECT e.event_id AS error_id, c.event_id AS click_id,
       epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts >= c.ts
""",
)
def join_asof(spark, sf_dir):
    """J6 as-of join: each error event matched to the same user's latest
    click at-or-before it.

    Spark has no ASOF operator; the scalable composition is union + a
    last-value window: tag both streams, sort per user by (ts, side), carry
    the last click forward.  One shuffle on user_id, no range explosion —
    this is the pattern that survives when both sides are huge (a bucketed
    equi-join + window would also work; a BNLJ range join would not).
    """
    from mycenae_spark.operators.asof import asof_join
    from mycenae_spark.registry.util import points as _points

    p = _points(spark, sf_dir)
    err = p.filter(F.col("metric") == "error").select("event_id", "tag_user", "ts_us")
    clk = p.filter(F.col("metric") == "click").select("event_id", "tag_user", "ts_us")
    out = asof_join(
        err, clk, on="tag_user", ts_col="ts_us", left_id="event_id", right_id="event_id"
    )
    return out.select(
        F.col("left_event_id").alias("error_id"),
        F.col("right_event_id").alias("click_id"),
        (F.col("ts_us") - F.col("right_ts_us")).alias("gap_us"),
    )


@q(
    "join_asof_tolerance",
    """
SELECT e.event_id AS error_id, c.event_id AS click_id,
       epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts >= c.ts
WHERE epoch_us(e.ts) - epoch_us(c.ts) <= 86400000000
""",
)
def join_asof_tolerance(spark, sf_dir):
    """J6 with a GAP BOUND — pandas ``merge_asof(tolerance=...)``
    semantics, the form a joining pipeline actually wants ("the same
    user's latest click, but only if RECENT"): an error whose latest
    prior click is older than 1 day is unmatched — it must NOT fall
    back to an even earlier click, which is exactly why this is a
    post-predicate on the as-of result (oracle: ASOF JOIN + WHERE on
    the gap), not a range-join condition.  Keeps 746 of 1909 matches at
    sf0.01 — the bound genuinely bites.  Plan unchanged from join_asof:
    one sort-shuffle, tolerance is a free filter."""
    from mycenae_spark.operators.asof import asof_join
    from mycenae_spark.registry.util import points as _points

    p = _points(spark, sf_dir)
    err = p.filter(F.col("metric") == "error").select(
        "event_id", "tag_user", "ts_us"
    )
    clk = p.filter(F.col("metric") == "click").select(
        "event_id", "tag_user", "ts_us"
    )
    out = asof_join(
        err, clk, on="tag_user", ts_col="ts_us",
        left_id="event_id", right_id="event_id",
        tolerance=86_400_000_000,
    )
    return out.select(
        F.col("left_event_id").alias("error_id"),
        F.col("right_event_id").alias("click_id"),
        (F.col("ts_us") - F.col("right_ts_us")).alias("gap_us"),
    )


@q(
    "join_asof_forward",
    """
SELECT e.event_id AS error_id, c.event_id AS click_id,
       epoch_us(c.ts) - epoch_us(e.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts <= c.ts
""",
)
def join_asof_forward(spark, sf_dir):
    """J6 direction mode FORWARD (r9 VERDICT item 6): each error matched
    to the same user's EARLIEST click at-or-after it — pandas
    ``merge_asof(direction="forward")`` / DuckDB ``ASOF ... ON l.ts <=
    r.ts``.  The "what did the user do next" form of the alignment.
    Same single sort-shuffle composition as backward, mirrored: the
    union window carries the NEXT right payload with ``first(...,
    ignorenulls)`` over the following-inclusive frame, ties ordered
    left-before-right so an equal-ts click still matches (<= inclusive).
    Linear in |L|+|R|; no range explosion at any scale."""
    from mycenae_spark.operators.asof import asof_join
    from mycenae_spark.registry.util import points as _points

    p = _points(spark, sf_dir)
    err = p.filter(F.col("metric") == "error").select(
        "event_id", "tag_user", "ts_us"
    )
    clk = p.filter(F.col("metric") == "click").select(
        "event_id", "tag_user", "ts_us"
    )
    out = asof_join(
        err, clk, on="tag_user", ts_col="ts_us",
        left_id="event_id", right_id="event_id", direction="forward",
    )
    return out.select(
        F.col("left_event_id").alias("error_id"),
        F.col("right_event_id").alias("click_id"),
        (F.col("right_ts_us") - F.col("ts_us")).alias("gap_us"),
    )


@q(
    "join_asof_nearest",
    """
WITH e AS (SELECT * FROM events WHERE event_type = 'error'),
     c AS (SELECT * FROM events WHERE event_type = 'click'),
     b AS (
       SELECT e.event_id AS eid, c.event_id AS cid,
              epoch_us(e.ts) - epoch_us(c.ts) AS g
       FROM e ASOF JOIN c ON e.user_id = c.user_id AND e.ts >= c.ts
     ),
     f AS (
       SELECT e.event_id AS eid, c.event_id AS cid,
              epoch_us(c.ts) - epoch_us(e.ts) AS g
       FROM e ASOF JOIN c ON e.user_id = c.user_id AND e.ts <= c.ts
     )
SELECT coalesce(b.eid, f.eid) AS error_id,
       CASE WHEN b.eid IS NOT NULL AND (f.eid IS NULL OR b.g <= f.g)
            THEN b.cid ELSE f.cid END AS click_id,
       CASE WHEN b.eid IS NOT NULL AND (f.eid IS NULL OR b.g <= f.g)
            THEN b.g ELSE f.g END AS gap_us
FROM b FULL OUTER JOIN f ON b.eid = f.eid
""",
)
def join_asof_nearest(spark, sf_dir):
    """J6 direction mode NEAREST (r9 VERDICT item 6, completing the
    pandas ``merge_asof`` direction triple): each error matched to the
    same user's click closest in ABSOLUTE time, ties preferring the
    backward (at-or-before) match — the deterministic convention both
    engines mirror (oracle: backward/forward ASOF CTEs full-outer
    composed, CASE on the smaller gap).  One shuffle still: Spark
    evaluates the preceding and following frames over the same
    partitioning (one exchange, two in-partition sorts — asserted
    linear, never a range join)."""
    from mycenae_spark.operators.asof import asof_join
    from mycenae_spark.registry.util import points as _points

    p = _points(spark, sf_dir)
    err = p.filter(F.col("metric") == "error").select(
        "event_id", "tag_user", "ts_us"
    )
    clk = p.filter(F.col("metric") == "click").select(
        "event_id", "tag_user", "ts_us"
    )
    out = asof_join(
        err, clk, on="tag_user", ts_col="ts_us",
        left_id="event_id", right_id="event_id", direction="nearest",
    )
    return out.select(
        F.col("left_event_id").alias("error_id"),
        F.col("right_event_id").alias("click_id"),
        F.abs(F.col("right_ts_us") - F.col("ts_us")).alias("gap_us"),
    )


# ----------------------------------------------------------- §2.7 set ops

@q(
    "set_union",
    "SELECT event_id, event_type AS metric FROM events WHERE event_type = 'purchase' "
    "UNION ALL "
    "SELECT event_id, event_type AS metric FROM events WHERE event_type = 'error'",
)
def set_union(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase")
    b = ev.filter(F.col("event_type") == "error")
    sel = lambda d: d.select("event_id", F.col("event_type").alias("metric"))
    return sel(a).unionByName(sel(b))


@q(
    "set_intersect",
    "SELECT user_id FROM events WHERE event_type = 'click' "
    "INTERSECT "
    "SELECT user_id FROM events WHERE event_type = 'purchase'",
)
def set_intersect(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


@q(
    "set_except",
    "SELECT user_id FROM events WHERE event_type = 'click' "
    "EXCEPT "
    "SELECT user_id FROM events WHERE event_type = 'purchase'",
)
def set_except(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.subtract(b)


# ------------------------------------------------------ §2.3 rollup (bonus)

@q(
    "agg_rollup",
    "SELECT l_returnflag, l_linestatus, round4(sum(l_quantity)) AS sum_qty_r, "
    "count(*) AS n FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)",
)
def agg_rollup(spark, sf_dir):
    """Beyond-reference: rollup subtotals (SURVEY.md §2.3 note)."""
    l = t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        r4(F.sum("l_quantity")).alias("sum_qty_r"), F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------- §2.8 scalar functions

@q(
    "scalar_string",
    """
SELECT doc_id,
  upper(substr(text, 1, 20)) AS head_u,
  length(text) AS n_chars_c,
  length(trim(text)) AS n_trim,
  regexp_replace(text, '[aeiou]', '', 'g') AS no_vowels20,
  concat_ws('|', lang, source) AS lang_src
FROM (SELECT doc_id, substr(text, 1, 40) AS text, lang, source FROM documents)
""",
)
def scalar_string(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("text"), "lang", "source"
    )
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 20)).alias("head_u"),
        F.length("text").alias("n_chars_c"),
        F.length(F.trim(F.col("text"))).alias("n_trim"),
        F.regexp_replace("text", "[aeiou]", "").alias("no_vowels20"),
        F.concat_ws("|", "lang", "source").alias("lang_src"),
    )


@q(
    "scalar_datetime",
    """
SELECT event_id,
  year(ts) AS y, month(ts) AS mo, day(ts) AS d, hour(ts) AS h,
  dayofweek(ts) AS dow0,
  epoch_us(ts) // 1000000 AS epoch_s,
  epoch_us(date_trunc('day', ts)) // 1000 AS day_ms
FROM events
""",
)
def scalar_datetime(spark, sf_dir):
    """Date/time group.  dow normalized to 0=Sunday (Spark's dayofweek is
    1-based, DuckDB's 0-based)."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        (F.dayofweek("ts") - 1).alias("dow0"),
        F.expr("unix_micros(ts) div 1000000").alias("epoch_s"),
        F.expr("unix_micros(date_trunc('day', ts)) div 1000").alias("day_ms"),
    )


@q(
    "scalar_math",
    """
SELECT l_orderkey, l_linenumber,
  round2(l_extendedprice * (1 - l_discount)) AS net_r,
  round6(sqrt(l_quantity)) AS sqrt_qty_r,
  round6(ln(l_extendedprice)) AS ln_price_r,
  round6(pow(1 + l_tax, 2)) AS tax2_r,
  greatest(l_discount, l_tax) AS gd,
  least(l_discount, l_tax) AS ld,
  abs(l_discount - l_tax) AS adiff
FROM lineitem
""",
)
def scalar_math(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        rN(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("net_r"),
        rN(F.sqrt("l_quantity"), 6).alias("sqrt_qty_r"),
        rN(F.log(F.col("l_extendedprice")), 6).alias("ln_price_r"),
        rN(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax2_r"),
        F.greatest("l_discount", "l_tax").alias("gd"),
        F.least("l_discount", "l_tax").alias("ld"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("adiff"),
    )


@q(
    "scalar_json",
    "SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k, "
    "CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod "
    "FROM events",
)
def scalar_json(spark, sf_dir):
    """JSON group on events.props (schemaless sidecar — mycenae's tags are
    the analogous dynamic payload)."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_id", k.alias("k"), (k % 10).alias("k_mod"))


@q(
    "scalar_array",
    """
SELECT doc_id,
  len(toks) AS n_tokens,
  len(list_distinct(toks)) AS n_distinct,
  toks[1] AS first_tok,
  CAST(list_contains(toks, 'data') AS BOOLEAN) AS has_data,
  list_max(list_transform(toks, x -> length(x))) AS max_tok_len,
  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_tok_len
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
""",
)
def scalar_array(spark, sf_dir):
    """Array/higher-order group — transform/aggregate stay JVM-side."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    return d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.element_at("toks", 1).alias("first_tok"),
        F.array_contains("toks", "data").alias("has_data"),
        F.array_max(F.transform("toks", lambda x: F.length(x))).alias("max_tok_len"),
        F.aggregate(
            "toks", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("sum_tok_len"),
    )


@q(
    "scalar_conditional",
    """
SELECT event_id,
  CASE WHEN value > 150 THEN 'high' WHEN value > 50 THEN 'mid' ELSE 'low' END AS band,
  coalesce(nullif(event_type, 'error'), 'ERR') AS et_masked,
  CAST(value IS NULL AS BOOLEAN) AS v_null
FROM events
""",
)
def scalar_conditional(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") > 150, "high")
        .when(F.col("value") > 50, "mid")
        .otherwise("low")
        .alias("band"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("ERR")).alias(
            "et_masked"
        ),
        F.isnull("value").alias("v_null"),
    )


# ------------------------------------------- multiway star join (TPC-H-ish)

@q(
    "join_multiway",
    """
SELECT r.r_name AS region, n.n_name AS nation,
       count(*) AS n_items,
       round2(sum(l.l_extendedprice * (1 - l.l_discount))) AS revenue_r
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderstatus <> 'P'
GROUP BY region, nation
""",
)
def join_multiway(spark, sf_dir):
    """TPC-H Q5-shaped star join.  customer/nation/region are true
    dimensions → explicit broadcast; orders is fact-sized at 100 TB, so its
    join is left to the planner (AQE broadcasts it at test scale, switches
    to a key-shuffled join when stats say otherwise — forcing a broadcast
    hint there would OOM a real cluster).  The fact is scanned once; the
    final shuffle is the tiny (region, nation) aggregation."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            rN(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue_r"),
        )
    )


@q(
    "agg_cube",
    """
SELECT l_returnflag, l_linestatus,
       count(*) AS n, round6(avg(l_discount)) AS avg_disc_r
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark, sf_dir):
    """CUBE: all grouping-set combinations in one pass (partial aggregation
    expands grouping ids map-side; shuffle ∝ Σ per-set group counts)."""
    l = t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        rN(F.avg("l_discount"), 6).alias("avg_disc_r"),
    )

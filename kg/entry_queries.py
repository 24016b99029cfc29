"""Driver-contract query registry (SURVEY.md §2 operator inventory).

Each entry is one operator from the SURVEY §2 inventory (or a
training-data-pipeline op), expressed twice with identical column names:

  - a Spark DataFrame builder  (spark, sf_dir) -> DataFrame
  - an equivalent DuckDB SQL string (None for non-SQL-expressible ops —
    those get the driver's weaker rows-only check)

Design rules for oracle parity:
  - every computed column is aliased identically in both engines;
  - money sums are emitted as integer cents (round → bigint) so
    double-sum ordering noise can't break the value hash;
  - timestamps in outputs are formatted to 'yyyy-MM-dd' strings;
  - counts/ranks are cast to bigint in both engines.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QueryFn = Callable[[SparkSession, str], DataFrame]
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def _q(name: str, sql: str | None):
    def deco(fn: QueryFn):
        _REGISTRY[name] = (fn, sql)
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# =========================================================================
# A. Aggregations (SURVEY §2.4) + windows (§2.5)
# =========================================================================
@_q(
    "a1_stoichiometry_order",
    """
    WITH g AS (
      SELECT l_orderkey, l_partkey,
             CAST(count(*) AS BIGINT) AS stoichiometry,
             min(l_linenumber) AS first_ln
      FROM lineitem GROUP BY 1, 2)
    SELECT l_orderkey, l_partkey, stoichiometry,
           CAST(row_number() OVER (PARTITION BY l_orderkey
                                   ORDER BY first_ln, l_partkey) AS BIGINT)
             AS order_rank
    FROM g
    """,
)
def a1_stoichiometry_order(spark, sf_dir):
    """A1+W1 (ReactomeBatchImporter.java:630-655): duplicate-target count
    (stoichiometry) + first-appearance rank (order) per source.

    r6 (guide §2.4 "two operations keyed the same way can share one
    exchange"): repartition on l_orderkey up front — hash(l_orderkey)
    satisfies BOTH the (l_orderkey, l_partkey) aggregation's clustering
    and the window's partitioning, so the plan runs ONE exchange of raw
    (orderkey, partkey, linenumber) rows instead of two (partial-agg
    rows on the pair key, then agg rows again on orderkey).  The r5
    partial aggregation collapsed almost nothing here ((orderkey,
    partkey) is nearly unique in lineitem), so the second exchange was
    pure re-shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    g = (
        li.select("l_orderkey", "l_partkey", "l_linenumber")
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_partkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("stoichiometry"),
            F.min("l_linenumber").alias("first_ln"),
        )
    )
    w = Window.partitionBy("l_orderkey").orderBy("first_ln", "l_partkey")
    return g.select(
        "l_orderkey", "l_partkey", "stoichiometry",
        F.row_number().over(w).cast("long").alias("order_rank"),
    )


@_q(
    "a2_latest_top1_per_group",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS latest_date
    FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders) WHERE rn = 1
    """,
)
def a2_latest_top1_per_group(spark, sf_dir):
    """A2 (ReactomeBatchImporter.java:608-628): latest-modified top-1 per
    source; losers discarded.

    r6: row_number window → max over a single packed value.  The rn=1
    row under (date desc, orderkey desc) IS the lexicographic max of the
    (date, orderkey) pair (both non-null here), and packing it as
    micros(date)·10¹⁹ + orderkey into one DECIMAL(38,0) is
    order-preserving (0 ≤ orderkey < 10¹⁹ = bigint range, product ≤
    ~9·10³³ < 10³⁸).  Unlike the intermediate max(struct(...)) form, a
    fixed-width decimal aggregation buffer is HASH-aggregable: the plan
    is HashAggregate→Exchange→HashAggregate with NO map-side Sort of the
    orders table (the struct form fell back to SortAggregate, which
    sorted every row by custkey first — as expensive as the window it
    replaced).  Decode is exact integer div/pmod; same winner per group,
    oracle hash unchanged."""
    o = _t(spark, sf_dir, "orders")
    b = F.lit("10000000000000000000").cast("decimal(20,0)")  # 10^19
    enc = (
        F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        .cast("decimal(19,0)") * b
        + F.col("o_orderkey").cast("decimal(19,0)")
    )
    top = o.groupBy("o_custkey").agg(F.max(enc).alias("e"))
    micros = ((F.col("e") - F.pmod("e", b)) / b).cast("long")
    return top.select(
        "o_custkey",
        F.pmod("e", b).cast("long").alias("o_orderkey"),
        F.date_format(F.timestamp_micros(micros), "yyyy-MM-dd").alias("latest_date"),
    )


@_q(
    "a3_latest_release_max",
    """
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS release_date
    FROM orders ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 1
    """,
)
def a3_latest_release_max(spark, sf_dir):
    """A3 (ReactomeBatchImporter.java:243-252): max-key instance fetch."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
        .limit(1)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("release_date"),
        )
    )


@_q(
    "a4_consistency_report",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_dbids
    FROM orders GROUP BY 1, 2
    """,
)
def a4_consistency_report(spark, sf_dir):
    """A4 (ReactomeBatchImporter.java:1167-1199): per-(class, attribute)
    distinct-instance violation report aggregation."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("long").alias("n_dbids")
    )


@_q(
    "a5_checksum_sum",
    """
    SELECT CAST(sum((l_orderkey * 31 + l_linenumber) % 1000003) AS BIGINT)
             AS checksum
    FROM lineitem
    """,
)
def a5_checksum_sum(spark, sf_dir):
    """A5/S11 (ReactomeBatchImporter.java:1091-1122): summed per-table
    content checksum recorded in the DBInfo/provenance node."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.sum((F.col("l_orderkey") * 31 + F.col("l_linenumber")) % 1000003)
        .cast("long")
        .alias("checksum")
    )


@_q(
    "w1_first_appearance_rank",
    """
    SELECT o_orderkey, o_custkey,
           CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
    FROM orders
    """,
)
def w1_first_appearance_rank(spark, sf_dir):
    """W1 (ReactomeBatchImporter.java:635): first-appearance ordering."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey", "o_custkey", F.row_number().over(w).cast("long").alias("rn")
    )


@_q(
    "w3_ordered_list_agg",
    """
    SELECT l_orderkey,
           string_agg(CAST(l_linenumber AS VARCHAR), ','
                      ORDER BY l_linenumber) AS lines_csv
    FROM lineitem GROUP BY 1
    """,
)
def w3_ordered_list_agg(spark, sf_dir):
    """P2/W3 (ReactomeBatchImporter.java:531-546, 1013): multi-valued
    attribute materialized as ordered list (emitted as CSV string)."""
    li = _t(spark, sf_dir, "lineitem")
    # r6 (guide §4.1): the element-wise cast is a plain array cast
    # (codegen), not a transform lambda (interpreted per element); the
    # numeric sort happens before the cast, as in the oracle's ORDER BY
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.array_sort(F.collect_list("l_linenumber")).cast("array<string>"),
            ",",
        ).alias("lines_csv")
    )


@_q(
    "s5_class_counts",
    "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1",
)
def s5_class_counts(spark, sf_dir):
    """S5 (ReactomeBatchImporter.java:107-111): per-class instance counts."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).cast("long").alias("n"))


# =========================================================================
# B. Joins (SURVEY §2.3) / set ops & dedup (§2.6)
# =========================================================================
@_q(
    "j1_endpoint_resolution",
    """
    SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS n_edges
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def j1_endpoint_resolution(spark, sf_dir):
    """J1 (ReactomeBatchImporter.java:643-647): visited-map equi-joins
    resolving edge endpoints through id dimensions.

    r6 (guide §2.3 "aggregate before you shuffle", §3.1): two regimes,
    picked by a free parquet-footer size probe.  While orders fits
    broadcast, the round-start shape is already optimal — the fact table
    is never shuffled, the only exchange is 25 partial-agged nationkey
    rows.  Above the gate the old form degrades to shuffling EVERY
    lineitem row by l_orderkey for a sort-merge join; instead count per
    l_orderkey first (map-side combine; o_orderkey is unique, so Σ
    per-order counts ≡ count of joined rows), so the shuffle moves one
    row per order, not one per lineitem.  Same rows either way — oracle
    hash unchanged, branch equality asserted in tests."""
    from kg.canonicalize import _fits_broadcast

    li, o, c = (_t(spark, sf_dir, t) for t in ("lineitem", "orders", "customer"))
    cdim = c.select("c_custkey", "c_nationkey")
    if _fits_broadcast(c, None):
        cdim = F.broadcast(cdim)
    if _fits_broadcast(o, None):
        return (
            li.select("l_orderkey")
            .join(F.broadcast(o.select("o_orderkey", "o_custkey")),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(cdim, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        )
    li_cnt = (
        li.select("l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    o_nat = o.select("o_orderkey", "o_custkey").join(
        cdim, F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        li_cnt.join(o_nat, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_nationkey")
        .agg(F.sum("_n").cast("long").alias("n_edges"))
    )


@_q(
    "j4_target_semi_join",
    """
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                        WHERE l_returnflag IN ('R', 'A'))
    """,
)
def j4_target_semi_join(spark, sf_dir):
    """J4 (InteractionImporter.java:364-401): keep targets referenced via
    an allowed relationship set (left-semi over rel-type isin)."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag").isin("R", "A"))
    return p.join(
        li, p["p_partkey"] == li["l_partkey"], "left_semi"
    ).select("p_partkey", "p_name")


@_q(
    "j5_orthologous_anti_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 300000)
    """,
)
def j5_orthologous_anti_join(spark, sf_dir):
    """J5 (ReactomeBatchImporter.java:277-298): anti-join dropping rows
    whose counterpart edge already exists."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


@_q(
    "j6_coalesce_fallback",
    """
    SELECT o.o_orderkey,
           CAST(coalesce(sum(l.l_quantity), 0) AS BIGINT) AS qty_total
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
)
def j6_coalesce_fallback(spark, sf_dir):
    """J6 (ReactomeBatchImporter.java:305-313): primary set with fallback
    when empty (coalesce of joined sets)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left")
        .groupBy("o_orderkey")
        .agg(F.coalesce(F.sum("l_quantity"), F.lit(0)).cast("long").alias("qty_total"))
    )


@_q(
    "d2_symmetric_edge_dedup",
    """
    SELECT DISTINCT least(l_suppkey, l_partkey) AS a,
                    greatest(l_suppkey, l_partkey) AS b
    FROM lineitem
    """,
)
def d2_symmetric_edge_dedup(spark, sf_dir):
    """D2 (ReactomeBatchImporter.java:661-674): symmetric pairs stored once
    under canonical (least, greatest) direction."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.least("l_suppkey", "l_partkey").alias("a"),
        F.greatest("l_suppkey", "l_partkey").alias("b"),
    ).distinct()


@_q(
    "d6_union_of_roots",
    """
    SELECT DISTINCT * FROM (
      SELECT c_custkey AS key, 'customer' AS kind FROM customer
      UNION ALL
      SELECT s_suppkey AS key, 'supplier' AS kind FROM supplier)
    """,
)
def d6_union_of_roots(spark, sf_dir):
    """D6 (ReactomeBatchImporter.java:145-149): union of the per-stage root
    worklists."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.lit("customer").alias("kind")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.lit("supplier").alias("kind")
    )
    return c.unionByName(s).distinct()


@_q(
    "d7_set_difference",
    """
    SELECT p_partkey FROM part
    WHERE p_partkey NOT IN (SELECT DISTINCT l_partkey FROM lineitem
                            WHERE l_quantity > 49)
    """,
)
def d7_set_difference(spark, sf_dir):
    """D7 (ReactomeBatchImporter.java:322-334): encapsulated = diagram set
    minus contained set (exceptAll/left_anti)."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 49)
    return p.join(
        li, p["p_partkey"] == li["l_partkey"], "left_anti"
    ).select("p_partkey")


# =========================================================================
# C. Projections / scalar functions (SURVEY §2.2, §2.7)
# =========================================================================
@_q(
    "p5_null_normalization",
    """
    SELECT event_id, nullif(trim(props), '') AS props_norm FROM events
    """,
)
def p5_null_normalization(spark, sf_dir):
    """P5 (ReactomeBatchImporter.java:1014-1016): empty → null collapse."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id", F.nullif(F.trim("props"), F.lit("")).alias("props_norm")
    )


@_q(
    "p7_class_name_override",
    """
    SELECT event_id,
           CASE WHEN value > 50
                THEN 'Hot' || regexp_replace(event_type, '^_', '')
                ELSE regexp_replace(event_type, '^_', '') END AS klass
    FROM events
    """,
)
def p7_class_name_override(spark, sf_dir):
    """P7 (ReactomeBatchImporter.java:815-828): `_X`→`X` strip + conditional
    reclassification by a property value."""
    e = _t(spark, sf_dir, "events")
    cls = F.regexp_replace("event_type", "^_", "")
    return e.select(
        "event_id",
        F.when(F.col("value") > 50, F.concat(F.lit("Hot"), cls)).otherwise(cls)
        .alias("klass"),
    )


@_q(
    "p11_person_name_normalization",
    """
    SELECT c_custkey,
           concat_ws(', ', c_name, coalesce(c_mktsegment, c_name))
             AS display_name
    FROM customer
    """,
)
def p11_person_name_normalization(spark, sf_dir):
    """P11 (ReactomeBatchImporter.java:391-401): surname, initial?:firstname."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws(", ", F.col("c_name"), F.coalesce("c_mktsegment", "c_name"))
        .alias("display_name"),
    )


@_q(
    "p12_stable_id_projection",
    """
    SELECT c_custkey,
           'R-CUS-' || CAST(c_custkey AS VARCHAR) AS stid,
           'R-CUS-' || CAST(c_custkey AS VARCHAR) || '.'
             || CAST(c_nationkey % 10 AS VARCHAR) AS stid_version
    FROM customer
    """,
)
def p12_stable_id_projection(spark, sf_dir):
    """P12 (ReactomeBatchImporter.java:417-435): stId + stIdVersion mint."""
    c = _t(spark, sf_dir, "customer")
    stid = F.concat(F.lit("R-CUS-"), F.col("c_custkey").cast("string"))
    return c.select(
        "c_custkey",
        stid.alias("stid"),
        F.concat(stid, F.lit("."), (F.col("c_nationkey") % 10).cast("string"))
        .alias("stid_version"),
    )


@_q(
    "p21_trivial_flag",
    """
    SELECT p_partkey, p_size IN (1, 5, 10) AS trivial FROM part
    """,
)
def p21_trivial_flag(spark, sf_dir):
    """P21 (ReactomeBatchImporter.java:496-499): membership in a broadcast
    allowlist → boolean flag."""
    p = _t(spark, sf_dir, "part")
    return p.select("p_partkey", F.col("p_size").isin(1, 5, 10).alias("trivial"))


@_q(
    "p22_url_templating",
    """
    SELECT p_partkey,
           replace('https://example.org/entry/###ID###', '###ID###',
                   CAST(p_partkey AS VARCHAR)) AS url
    FROM part
    """,
)
def p22_url_templating(spark, sf_dir):
    """P22 (ReactomeBatchImporter.java:500-523): accessUrl ###ID### fill."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.replace(
            F.lit("https://example.org/entry/###ID###"),
            F.lit("###ID###"),
            F.col("p_partkey").cast("string"),
        ).alias("url"),
    )


@_q(
    "p23_curie_minting",
    """
    SELECT p_partkey,
           coalesce(CASE WHEN p_size > 25 THEN NULL
                         ELSE lower(replace(p_brand, '#', '.')) END,
                    lower(regexp_replace(p_type, '[ \\t\\n\\x0B\\f\\r:]', '.', 'g')))
             || ':' || CAST(p_partkey AS VARCHAR) AS curie
    FROM part
    """,
)
def p23_curie_minting(spark, sf_dir):
    """P23 (ReactomeBatchImporter.java:549-568 + DatabaseToPrefix.java):
    CURIE prefix fallback chain ending in lower(replaceAll('[\\s:]','.'))."""
    p = _t(spark, sf_dir, "part")
    primary = F.when(F.col("p_size") > 25, F.lit(None)).otherwise(
        F.lower(F.replace(F.col("p_brand"), F.lit("#"), F.lit(".")))
    )
    fallback = F.lower(F.regexp_replace("p_type", r"[ \t\n\x0B\f\r:]", "."))
    return p.select(
        "p_partkey",
        F.concat(
            F.coalesce(primary, fallback), F.lit(":"), F.col("p_partkey").cast("string")
        ).alias("curie"),
    )


@_q(
    "p24_accession_normalization",
    """
    SELECT p_partkey, split_part(trim(p_name), ' ', 1) AS acc FROM part
    """,
)
def p24_accession_normalization(spark, sf_dir):
    """P24 (InteractionImporter.java:106,198-199): acc.trim().split(' ')[0]."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.element_at(F.split(F.trim(F.col("p_name")), " "), 1).alias("acc"),
    )


@_q(
    "s9_json_enrichment",
    """
    SELECT event_id,
           CAST(json_extract_string(props::JSON, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def s9_json_enrichment(spark, sf_dir):
    """S9/TH (TaxonomyHelper.java:68-70): JSON response field extraction."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k_value")
    )


# =========================================================================
# D. Headline analytic queries (bench workload)
# =========================================================================
@_q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
           CAST(round(sum(l_extendedprice) * 100, 0) AS BIGINT)
             AS sum_base_price_cents,
           CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100, 0)
                AS BIGINT) AS sum_disc_price_cents,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY 1, 2
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped scan+agg (flagship perf query; money as cents)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.round(F.sum("l_extendedprice") * 100, 0).cast("long")
            .alias("sum_base_price_cents"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100, 0)
            .cast("long").alias("sum_disc_price_cents"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


@_q(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100, 0)
                AS BIGINT) AS revenue_cents,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY 1, 3, 4
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3-shaped 3-way join + agg (broadcast dims, shuffled fact)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100, 0)
            .cast("long").alias("revenue_cents")
        )
        .select("l_orderkey", "revenue_cents", "orderdate", "o_orderpriority")
    )


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _REGISTRY.items() if sql is not None}


# =========================================================================
# E. Training-data pipeline ops (dedup / similarity / text analysis)
# =========================================================================
# whitespace class spelled explicitly in both engines (ADVICE r4;
# mirrors kg.extract.ASCII_WS_RE)
_WS_SQL = '[ \\t\\n\\x0B\\f\\r]+'
_WORDS_SQL = f"list_filter(string_split_regex(lower(text), '{_WS_SQL}'), x -> x <> '')"
_SHINGLES_SQL = (
    "CASE WHEN len(words) >= 3 THEN list_transform(range(1, len(words) - 1), "
    "i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) ELSE [] END"
)


@_q(
    "dedup_exact_groups",
    """
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keeper_doc_id,
           CAST(count(*) AS BIGINT) AS n_dups
    FROM documents GROUP BY 1
    """,
)
def dedup_exact_groups(spark, sf_dir):
    """Exact dedup: content-hash groupBy (one map-combined shuffle)."""
    from kg.ops.dedup import exact_dedup_groups

    return exact_dedup_groups(_t(spark, sf_dir, "documents"))


@_q(
    "dedup_minhash_signatures",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS words FROM documents),
    s AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM w)
    SELECT doc_id,
      list_aggregate(list_transform(sh, x -> md5('0|' || x)), 'min') AS mh0,
      list_aggregate(list_transform(sh, x -> md5('1|' || x)), 'min') AS mh1,
      list_aggregate(list_transform(sh, x -> md5('2|' || x)), 'min') AS mh2,
      list_aggregate(list_transform(sh, x -> md5('3|' || x)), 'min') AS mh3
    FROM s
    """,
)
def dedup_minhash_signatures(spark, sf_dir):
    """MinHash: per-band min(md5(band|shingle)) signature, array-expr only."""
    from kg.ops.dedup import minhash_signatures

    return minhash_signatures(_t(spark, sf_dir, "documents"))


_LSH_BUCKETS_SQL = f"""
    w AS (SELECT doc_id, {_WORDS_SQL} AS words FROM documents),
    s AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM w),
    sig AS (SELECT doc_id,
      list_aggregate(list_transform(sh, x -> md5('0|' || x)), 'min') AS mh0,
      list_aggregate(list_transform(sh, x -> md5('1|' || x)), 'min') AS mh1,
      list_aggregate(list_transform(sh, x -> md5('2|' || x)), 'min') AS mh2,
      list_aggregate(list_transform(sh, x -> md5('3|' || x)), 'min') AS mh3
      FROM s),
    buckets AS (
      SELECT doc_id, 0 AS band, mh0 AS mh FROM sig WHERE mh0 IS NOT NULL
      UNION ALL SELECT doc_id, 1, mh1 FROM sig WHERE mh1 IS NOT NULL
      UNION ALL SELECT doc_id, 2, mh2 FROM sig WHERE mh2 IS NOT NULL
      UNION ALL SELECT doc_id, 3, mh3 FROM sig WHERE mh3 IS NOT NULL),
    capped AS (SELECT * FROM buckets
               QUALIFY count(*) OVER (PARTITION BY band, mh) <= 10000)
"""


@_q(
    "dedup_minhash_lsh_pairs",
    f"""
    WITH {_LSH_BUCKETS_SQL}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM capped a JOIN capped b
      ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh_pairs(spark, sf_dir):
    """MinHash-LSH candidate pairs: band-bucket self-join, hot buckets
    capped at 10k docs (quadratic-blowup guard; same QUALIFY cap in the
    oracle)."""
    from kg.ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"))


def _banded_sig_sql(n_bands: int, rows_per_band: int) -> str:
    """Band signature columns in DuckDB, in lockstep with
    kg.ops.dedup.minhash_signatures: mh_b = md5 of the r concatenated
    row-minima, hash function i = b·r + j prefixes 'i|'.  `||` (not
    concat()) so a NULL row-min nulls the band — DuckDB concat() treats
    NULL as '', Spark F.concat propagates it."""
    cols = []
    for b in range(n_bands):
        mins = " || ".join(
            f"list_aggregate(list_transform(sh, x -> "
            f"md5('{b * rows_per_band + j}|' || x)), 'min')"
            for j in range(rows_per_band)
        )
        cols.append(f"md5({mins}) AS mh{b}")
    return ",\n      ".join(cols)


_B8R4_BUCKETS_SQL = f"""
    w AS (SELECT doc_id, {_WORDS_SQL} AS words FROM documents),
    s AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM w),
    sig AS (SELECT doc_id,
      {_banded_sig_sql(8, 4)}
      FROM s),
    buckets AS ({" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, mh{b} AS mh FROM sig "
        f"WHERE mh{b} IS NOT NULL"
        for b in range(8)
    )}),
    capped AS (SELECT * FROM buckets
               QUALIFY count(*) OVER (PARTITION BY band, mh) <= 10000)
"""


@_q(
    "dedup_minhash_lsh_pairs_b8r4",
    f"""
    WITH {_B8R4_BUCKETS_SQL}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM capped a JOIN capped b
      ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh_pairs_b8r4(spark, sf_dir):
    """Banded MinHash-LSH at the production shape (8 bands × 4 rows):
    P(candidate) = 1 − (1 − s⁴)⁸ has its knee near s ≈ 0.6, so
    low-similarity pairs stop flooding the candidate set (the legacy
    4×1 config's 1 − (1−s)⁴ curve is near-linear — VERDICT r3 item 3)."""
    from kg.ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), n_bands=8, rows_per_band=4
    )


_SIMHASH_BITS = ", ".join(
    f"sum(CASE WHEN (instr('0123456789abcdef', substring(h, {j + 1}, 1)) - 1) "
    f"% 2 = 1 THEN 1 ELSE -1 END) AS b{j}"
    for j in range(32)
)
_SIMHASH_FP = " + ".join(
    f"CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(32)
)


@_q(
    "dedup_simhash32",
    f"""
    WITH t AS (SELECT doc_id, unnest({_WORDS_SQL}) AS tok FROM documents),
    h AS (SELECT doc_id, md5(tok) AS h FROM t),
    b AS (SELECT doc_id, {_SIMHASH_BITS} FROM h GROUP BY doc_id)
    SELECT doc_id, CAST({_SIMHASH_FP} AS BIGINT) AS simhash FROM b
    """,
)
def dedup_simhash32(spark, sf_dir):
    """SimHash: 32-bit parity fingerprint from token md5 hex digits."""
    from kg.ops.dedup import simhash32

    return simhash32(_t(spark, sf_dir, "documents"))


@_q(
    "dedup_ngram_jaccard",
    f"""
    WITH {_LSH_BUCKETS_SQL},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id),
    sh AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM s),
    sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    common AS (
      SELECT doc_a, doc_b, count(*) AS n_common
      FROM cand
      JOIN sh sa ON sa.doc_id = cand.doc_a
      JOIN sh sb ON sb.doc_id = cand.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(n_common / (na.n_sh + nb.n_sh - n_common), 6) AS jaccard
    FROM common
    JOIN sz na ON common.doc_a = na.doc_id
    JOIN sz nb ON common.doc_b = nb.doc_id
    WHERE round(n_common / (na.n_sh + nb.n_sh - n_common), 6) >= 0.05
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard over MinHash-LSH candidate pairs (the default
    blocking — bounded at any corpus size, unlike a metadata block)."""
    from kg.ops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.05)


@_q(
    "ann_cosine_topk",
    """
    WITH e AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
    s AS (SELECT probe_id, e.vec_id AS neighbor_id,
            round(list_dot_product(pv, v)
              / (sqrt(list_dot_product(pv, pv))
                 * sqrt(list_dot_product(v, v))), 6) AS cos_sim
          FROM e, p WHERE e.vec_id <> probe_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
            ORDER BY cos_sim DESC, neighbor_id) AS rk FROM s)
    SELECT probe_id, neighbor_id, CAST(rk AS BIGINT) AS rank, cos_sim
    FROM r WHERE rk <= 10
    """,
)
def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k (exact baseline for similarity search)."""
    from kg.ops.similarity import brute_force_topk

    return brute_force_topk(
        _t(spark, sf_dir, "embeddings"), probe_ids=[0, 1, 2, 3, 4], k=10
    )


# The sign-random-projection hyperplanes are deterministic host-side
# constants (kg/ops/similarity.py:_hyperplane), so the DuckDB oracle can
# inline them as double-literal arrays and recompute the exact bucket.
def _bucket_sql(vcol: str, n_planes: int = 6, dim: int = 64) -> str:
    from kg.ops.similarity import _hyperplane

    terms = []
    for p, plane in enumerate(_hyperplane(dim, n_planes)):
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({vcol}, {arr}) > 0"
            f" THEN {1 << p} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


_COS_SQL = (
    "round(list_dot_product(pv, v) / (sqrt(list_dot_product(pv, pv))"
    " * sqrt(list_dot_product(v, v))), 6)"
)


@_q(
    "ann_lsh_topk",
    f"""
    WITH e AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    eb AS (SELECT vec_id, v, {_bucket_sql('v')} AS bucket FROM e),
    p AS (SELECT vec_id AS probe_id, v AS pv, bucket AS pbucket
          FROM eb WHERE vec_id < 5),
    s AS (SELECT probe_id, eb.vec_id AS neighbor_id, {_COS_SQL} AS cos_sim
          FROM eb, p WHERE eb.bucket = pbucket AND eb.vec_id <> probe_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
            ORDER BY cos_sim DESC, neighbor_id) AS rk FROM s)
    SELECT probe_id, neighbor_id, CAST(rk AS BIGINT) AS rank, cos_sim
    FROM r WHERE rk <= 10
    """,
)
def _ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed approximate top-k (the 10^9-vector scale path); the
    oracle recomputes the deterministic hyperplane buckets from literal
    arrays."""
    from kg.ops.similarity import lsh_topk

    return lsh_topk(_t(spark, sf_dir, "embeddings"), probe_ids=[0, 1, 2, 3, 4], k=10)

# derived from the SAME marker table the Spark operator uses — the oracle
# and the engine cannot drift (the fiction of round-2's placeholder sets
# is gone: these are genuine en/de/es stopwords, see kg/ops/text.py)
from kg.ops.text import LANG_MARKERS as _LANG_MARKERS

_LANG_SCORE_SQL = {
    lang: " + ".join(
        f"len(regexp_extract_all(lower(text), '\\b{m}\\b'))" for m in ms
    )
    for lang, ms in _LANG_MARKERS.items()
}


@_q(
    "text_lang_id",
    f"""
    SELECT doc_id,
      CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
           WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS predicted_lang
    FROM (SELECT doc_id, {_LANG_SCORE_SQL['en']} AS s_en,
                 {_LANG_SCORE_SQL['de']} AS s_de,
                 {_LANG_SCORE_SQL['es']} AS s_es
          FROM documents)
    """,
)
def text_lang_id(spark, sf_dir):
    """Language-ID heuristic: marker-word hit argmax."""
    from kg.ops.text import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


@_q(
    "text_token_count",
    """
    SELECT doc_id,
      CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]'))
           AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def text_token_count(spark, sf_dir):
    """BPE-ish regex token counting."""
    from kg.ops.text import token_count

    return token_count(_t(spark, sf_dir, "documents"))


@_q(
    "text_quality_score",
    f"""
    SELECT doc_id, n_tokens, n_uniq_tokens, len_chars,
      CAST(CASE WHEN n_tokens < 10 THEN 0
                WHEN n_uniq_tokens * 2 < n_tokens THEN 1
                WHEN len_chars < 200 THEN 2 ELSE 3 END AS BIGINT) AS quality
    FROM (SELECT doc_id,
            CAST(len(words) AS BIGINT) AS n_tokens,
            CAST(len(list_distinct(words)) AS BIGINT) AS n_uniq_tokens,
            CAST(length(text) AS BIGINT) AS len_chars
          FROM (SELECT doc_id, text, {_WORDS_SQL} AS words FROM documents))
    """,
)
def text_quality_score(spark, sf_dir):
    """Quality features + 0-3 bucket (length / diversity gates)."""
    from kg.ops.text import quality_score

    return quality_score(_t(spark, sf_dir, "documents"))


@_q(
    "text_doc_fingerprint",
    """
    SELECT doc_id,
      md5(substring(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), 1, 64))
        AS fingerprint
    FROM documents
    """,
)
def text_doc_fingerprint(spark, sf_dir):
    """Prefix fingerprint of normalized text (boilerplate detector)."""
    from kg.ops.text import doc_fingerprint

    return doc_fingerprint(_t(spark, sf_dir, "documents"))


@_q(
    "mm_decode_features",
    """
    WITH b AS (SELECT doc_id, encode(text) AS payload FROM documents),
    x AS (SELECT doc_id, octet_length(payload) AS n,
                 substring(lower(hex(payload)), 1, 128) AS hx
          FROM b)
    SELECT doc_id,
      CAST(n AS BIGINT) AS n_bytes,
      CAST(n % 640 + 1 AS BIGINT) AS fake_width,
      CAST(n % 480 + 1 AS BIGINT) AS fake_height,
      CAST(coalesce(list_sum(list_transform(range(1, least(n, 64) + 1), i ->
             (instr('0123456789abcdef', substring(hx, 2*i-1, 1)) - 1) * 16
           + (instr('0123456789abcdef', substring(hx, 2*i,   1)) - 1))), 0)
           % 1000003 AS BIGINT) AS checksum
    FROM x
    """,
)
def _mm_decode_stub(spark, sf_dir):
    """Multimodal plumbing: binary payload column → mapInPandas feature
    extraction with a (deterministic) stub decoder.  The stub's features
    are pure byte arithmetic, so the oracle recomputes them in SQL from
    the hex encoding of the same payload."""
    from kg.ops.multimodal import decode_features, with_binary_payload

    return decode_features(with_binary_payload(_t(spark, sf_dir, "documents")))


def _hex2int_sql(expr: str, n: int) -> str:
    """DuckDB fragment: big-endian hex string of n chars → BIGINT."""
    return (
        f"CAST(list_sum(list_transform(range(1, {n + 1}), i -> "
        f"(instr('0123456789abcdef', substring({expr}, i, 1)) - 1) "
        f"* power(16, {n} - i))) AS BIGINT)"
    )


@_q(
    "mm_decode_real_headers",
    f"""
    WITH p AS (
      SELECT doc_id, CAST(doc_id % 3 AS INT) AS fmt,
             lpad(lower(hex(doc_id % 640 + 1)), 8, '0') AS w8,
             lpad(lower(hex(doc_id % 480 + 1)), 8, '0') AS h8
      FROM documents),
    hx AS (SELECT doc_id, fmt,
      CASE fmt
        WHEN 0 THEN '89504e470d0a1a0a' || '0000000d' || '49484452'
                    || w8 || h8 || '0806000000' || '00000000'
        WHEN 1 THEN '474946383961'
                    || substring(w8, 7, 2) || substring(w8, 5, 2)
                    || substring(h8, 7, 2) || substring(h8, 5, 2) || 'f700003b'
        ELSE 'ffd8' || 'ffe00010' || '4a46494600010100000100010000'
             || 'ffc0' || '0011' || '08' || substring(h8, 5, 4)
             || substring(w8, 5, 4) || '03011100021101031101' || 'ffd9'
      END AS hx FROM p)
    SELECT doc_id,
      CASE fmt WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'jpeg' END AS format,
      CASE fmt
        WHEN 0 THEN {_hex2int_sql("substring(hx, 33, 8)", 8)}
        WHEN 1 THEN {_hex2int_sql(
            "substring(hx, 15, 2) || substring(hx, 13, 2)", 4)}
        ELSE {_hex2int_sql("substring(hx, 55, 4)", 4)}
      END AS width,
      CASE fmt
        WHEN 0 THEN {_hex2int_sql("substring(hx, 41, 8)", 8)}
        WHEN 1 THEN {_hex2int_sql(
            "substring(hx, 19, 2) || substring(hx, 17, 2)", 4)}
        ELSE {_hex2int_sql("substring(hx, 51, 4)", 4)}
      END AS height
    FROM hx
    """,
)
def mm_decode_real_headers(spark, sf_dir):
    """REAL byte-level image decode (VERDICT r3 item 4): Spark builds
    genuine PNG/GIF/JPEG container bytes in SQL (unhex) and parses
    width/height back OUT of those bytes with the pure-arithmetic header
    parser (kg/ops/multimodal.py decode_image_dims — no image libs); the
    DuckDB oracle builds the identical hex and re-reads the dimension
    fields from the byte positions it wrote, so both engines round-trip
    through the container encoding rather than sharing a formula."""
    from kg.ops.multimodal import decode_image_meta, with_synthetic_image_payload

    return decode_image_meta(
        with_synthetic_image_payload(_t(spark, sf_dir, "documents"))
    )


@_q(
    "p8_label_derivation",
    """
    SELECT c_custkey,
           concat_ws('|', n.n_name, r.r_name, 'Entity') AS labels_path
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def p8_label_derivation(spark, sf_dir):
    """P8 (ReactomeBatchImporter.java:836-868): class → full ancestry label
    array via broadcast dimension joins (emitted as a joined path string)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            "c_custkey",
            F.concat_ws("|", F.col("n_name"), F.col("r_name"), F.lit("Entity"))
            .alias("labels_path"),
        )
    )


@_q(
    "w4_sessionization",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events),
    s AS (SELECT user_id, event_id,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
          FROM g)
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY 1, 2
    """,
)
def w4_sessionization(spark, sf_dir):
    """Sessionization (guide 'Common OLAP patterns'): lag(ts) gap > 30min
    opens a session; cumulative sum numbers sessions per user."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # full microsecond precision: a cast to long truncates to seconds and
    # misclassifies sub-second timestamps straddling the 1800s boundary
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))  # ts is TIMESTAMP_NTZ
    gap = ts_us - F.lag(ts_us).over(w)
    new_s = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    s = e.withColumn("new_session", new_s).withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return s.groupBy("user_id", F.col("session_no").cast("long").alias("session_no")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )


@_q(
    "skew_salted_count",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS count
    FROM events GROUP BY 1
    """,
)
def skew_salted_count(spark, sf_dir):
    """Explicit skew path (north_rule): two-phase salted aggregation over
    a low-cardinality (therefore hot) key — result must equal the plain
    groupBy (kg/skew.py; hot-key detection via frequency sketch).
    r6: salt on event_id (unique ⇒ uniform spread) instead of the whole
    row, so the scan prunes to two columns; sketch is one pass."""
    from kg.skew import salted_aggregate_counts

    e = _t(spark, sf_dir, "events")
    return salted_aggregate_counts(
        e, "event_type", min_share=0.01, n_salts=8,
        salt_cols=["event_type", "event_id"],
    )


@_q(
    "p18_existence_flags",
    """
    SELECT c.c_custkey,
           c.c_custkey IN (SELECT o_custkey FROM orders
                           WHERE o_orderstatus = 'F') AS is_in_disease,
           c.c_custkey IN (SELECT o_custkey FROM orders
                           WHERE o_orderpriority = '1-URGENT') AS is_inferred
    FROM customer c
    """,
)
def p18_existence_flags(spark, sf_dir):
    """P18 (ReactomeBatchImporter.java:475-482): existence booleans from
    related-row presence (left-semi-join flags)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    f_keys = o.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    u_keys = (
        o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    )
    return (
        c.join(
            f_keys.withColumn("is_in_disease", F.lit(True)),
            c["c_custkey"] == f_keys["o_custkey"], "left",
        ).drop("o_custkey")
        .join(
            u_keys.withColumn("is_inferred", F.lit(True)),
            c["c_custkey"] == u_keys["o_custkey"], "left",
        ).drop("o_custkey")
        .select(
            "c_custkey",
            F.coalesce("is_in_disease", F.lit(False)).alias("is_in_disease"),
            F.coalesce("is_inferred", F.lit(False)).alias("is_inferred"),
        )
    )


@_q(
    "p20_first_element",
    """
    SELECT l_orderkey,
           (string_agg(CAST(l_partkey AS VARCHAR), ','
                       ORDER BY l_linenumber, l_partkey)) AS all_parts,
           CAST((array_agg(l_partkey ORDER BY l_linenumber, l_partkey))[1]
                AS BIGINT) AS species_first
    FROM lineitem GROUP BY 1
    """,
)
def p20_first_element(spark, sf_dir):
    """P20 (ReactomeBatchImporter.java:488-495): first element of an
    ordered multi-valued attribute (element_at(list, 1))."""
    li = _t(spark, sf_dir, "lineitem")
    ordered = F.array_sort(
        F.collect_list(F.struct("l_linenumber", "l_partkey"))
    )
    # r6 (guide §4.1): field extraction over the sorted struct array is
    # GetArrayStructFields + an array cast (both codegen) instead of a
    # per-element transform lambda (interpreted)
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            ordered.getField("l_partkey").cast("array<string>"), ","
        ).alias("all_parts"),
        F.element_at(ordered, 1)["l_partkey"].cast("long").alias("species_first"),
    )


@_q(
    "a8_exact_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 2) AS p90,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY 1
    """,
)
def a8_exact_percentiles(spark, sf_dir):
    """Exact (interpolated) percentiles per group — JVM `percentile`, not
    the approx sketch, so the oracle comparison is bit-stable after
    rounding."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 2).alias("p90"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@_q(
    "a9_rollup_counts",
    """
    SELECT coalesce(l_returnflag, '<all>') AS l_returnflag,
           coalesce(l_linestatus, '<all>') AS l_linestatus,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a9_rollup_counts(spark, sf_dir):
    """ROLLUP grouping sets (OLAP cube surface): subtotals + grand total
    in one pass; null grouping markers coalesced identically in both
    engines."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
            "n",
        )
    )


@_q(
    "a10_pivot_status_counts",
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS st_F,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS st_O,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS st_P
    FROM orders GROUP BY 1
    """,
)
def a10_pivot_status_counts(spark, sf_dir):
    """Pivot with an explicit value list (the scale-safe form — an
    unlisted pivot runs a distinct-scan first); oracle uses FILTER
    aggregates, the relational equivalent."""
    o = _t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"st_{s}")
          for s in ("F", "O", "P")],
    )


@_q(
    "merge_upsert_customers",
    """
    WITH t AS (SELECT c_custkey, c_name, c_mktsegment FROM customer),
    upd AS (
      SELECT c_custkey, c_name, 'RESEGMENTED' AS c_mktsegment
      FROM t WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 5000000, 'NEW:' || c_name, 'NEWSEG'
      FROM t WHERE c_custkey % 100 = 0)
    SELECT * FROM t
    WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
    UNION ALL SELECT * FROM upd
    """,
)
def merge_upsert_customers(spark, sf_dir):
    """Iceberg MERGE INTO analog: WHEN MATCHED UPDATE * / WHEN NOT
    MATCHED INSERT * as one anti-join + union (kg/ops/merge.py)."""
    from kg.ops.merge import merge_upsert

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    upd = c.where(F.col("c_custkey") % 10 == 0).withColumn(
        "c_mktsegment", F.lit("RESEGMENTED")
    )
    new_rows = c.where(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + 5_000_000).alias("c_custkey"),
        F.concat(F.lit("NEW:"), "c_name").alias("c_name"),
        F.lit("NEWSEG").alias("c_mktsegment"),
    )
    return merge_upsert(c, upd.unionByName(new_rows), ["c_custkey"])


@_q(
    "scd2_customer_history",
    """
    WITH t AS (SELECT c_custkey, c_mktsegment FROM customer),
    ch AS (SELECT c_custkey, 'RESEGMENTED' AS c_mktsegment
           FROM t WHERE c_custkey % 10 = 0)
    SELECT c_custkey, c_mktsegment, '1970-01-01' AS valid_from,
           '2024-06-01' AS valid_to, FALSE AS is_current
    FROM t WHERE c_custkey IN (SELECT c_custkey FROM ch)
    UNION ALL
    SELECT c_custkey, c_mktsegment, '1970-01-01', '9999-12-31', TRUE
    FROM t WHERE c_custkey NOT IN (SELECT c_custkey FROM ch)
    UNION ALL
    SELECT c_custkey, c_mktsegment, '2024-06-01', '9999-12-31', TRUE FROM ch
    """,
)
def scd2_customer_history(spark, sf_dir):
    """SCD2 dimension versioning (kg/ops/merge.py): one change batch over
    an initial history — matched keys close their open version and append
    a new one; dates emitted as strings for hash parity."""
    import datetime as dt

    from kg.ops.merge import scd2_apply, scd2_init

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    hist = scd2_init(c)
    ch = (
        c.where(F.col("c_custkey") % 10 == 0)
        .withColumn("c_mktsegment", F.lit("RESEGMENTED"))
        .withColumn("change_ts", F.lit(dt.datetime(2024, 6, 1)))
    )
    out = scd2_apply(hist, ch, ["c_custkey"])
    return out.select(
        "c_custkey",
        "c_mktsegment",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
        "is_current",
    )


@_q(
    "motif_triangle_count",
    """
    WITH pairs AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
                      greatest(a.l_partkey, b.l_partkey) AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM pairs e1
    JOIN pairs e2 ON e2.a = e1.a AND e2.b > e1.b
    JOIN pairs e3 ON e3.a = e1.b AND e3.b = e2.b
    """,
)
def motif_triangle_count(spark, sf_dir):
    """Triangle count over the parts-co-ordered graph via degree-ordered
    wedge closing (kg/ops/motif.py); the oracle counts (a<b<c) triples
    directly — different algorithm, same answer."""
    from kg.ops.motif import triangle_count

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").cast("string").alias("src"),
            F.col("b.l_partkey").cast("string").alias("dst"),
        )
        .distinct()
    )
    return triangle_count(edges)


@_q(
    "motif_two_hop_counts",
    """
    WITH e AS (
      SELECT 'R:' || r_name AS src, 'N:' || n_name AS dst
      FROM nation JOIN region ON n_regionkey = r_regionkey
      UNION ALL
      SELECT 'N:' || n_name, 'S:' || CAST(s_suppkey AS VARCHAR)
      FROM supplier JOIN nation ON s_nationkey = n_nationkey),
    hops AS (
      SELECT DISTINCT e1.src, e2.dst
      FROM e e1 JOIN e e2 ON e1.dst = e2.src
      WHERE e1.src <> e2.dst)
    SELECT src, CAST(count(*) AS BIGINT) AS n_two_hop
    FROM hops GROUP BY src
    """,
)
def motif_two_hop_counts(spark, sf_dir):
    """(a)->(b)->(c) motif counts per source (kg/ops/motif.py) over the
    region>nation>supplier edge set."""
    from kg.ops.motif import two_hop_counts

    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    e1 = n.join(r, n["n_regionkey"] == r["r_regionkey"]).select(
        F.concat(F.lit("R:"), "r_name").alias("src"),
        F.concat(F.lit("N:"), "n_name").alias("dst"),
    )
    e2 = s.join(n, s["s_nationkey"] == n["n_nationkey"]).select(
        F.concat(F.lit("N:"), "n_name").alias("src"),
        F.concat(F.lit("S:"), F.col("s_suppkey").cast("string")).alias("dst"),
    )
    return two_hop_counts(e1.unionByName(e2))


@_q(
    "asof_join_profiles",
    """
    WITH r AS (SELECT user_id, ts, max(event_type) AS profile
               FROM events WHERE event_id % 97 = 0 GROUP BY 1, 2),
    l AS (SELECT event_id, user_id, ts FROM events)
    SELECT l.event_id, coalesce(r.profile, 'none') AS profile
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_join_profiles(spark, sf_dir):
    """Event-time AS-OF join (kg/ops/asof.py): attach the latest profile
    state at or before each event's ts.  Spark side is the union-carry
    window (one shuffle, linear); the oracle is DuckDB's native ASOF
    LEFT JOIN — two independent formulations of the same semantics."""
    from kg.ops.asof import asof_join

    e = _t(spark, sf_dir, "events")
    right = (
        e.where(F.col("event_id") % 97 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("event_type").alias("profile"))
    )
    left = e.select("event_id", "user_id", "ts")
    out = asof_join(left, right, by=["user_id"], ts_col="ts")
    return out.select(
        "event_id", F.coalesce("profile", F.lit("none")).alias("profile")
    )


@_q(
    "j7_transitive_closure",
    """
    WITH RECURSIVE e AS (
      SELECT 'R:' || r_name AS src, 'N:' || n_name AS dst
      FROM nation JOIN region ON n_regionkey = r_regionkey
      UNION ALL
      SELECT 'N:' || n_name, 'S:' || CAST(s_suppkey AS VARCHAR)
      FROM supplier JOIN nation ON s_nationkey = n_nationkey),
    reach AS (
      SELECT src, dst FROM e WHERE src <> dst
      UNION
      SELECT reach.src, e.dst FROM reach
      JOIN e ON e.src = reach.dst WHERE reach.src <> e.dst)
    SELECT DISTINCT src, dst FROM reach
    """,
)
def j7_transitive_closure(spark, sf_dir):
    """J7 (GKInstanceHelper.java:23-46 recursive containment expansion):
    semi-naive driver-side fixpoint closure over the region ⊃ nation ⊃
    supplier hierarchy; oracle is DuckDB's recursive CTE."""
    from kg.ops.graph import transitive_closure

    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    e1 = n.join(r, n["n_regionkey"] == r["r_regionkey"]).select(
        F.concat(F.lit("R:"), "r_name").alias("src"),
        F.concat(F.lit("N:"), "n_name").alias("dst"),
    )
    e2 = s.join(n, s["s_nationkey"] == n["n_nationkey"]).select(
        F.concat(F.lit("N:"), "n_name").alias("src"),
        F.concat(F.lit("S:"), F.col("s_suppkey").cast("string")).alias("dst"),
    )
    return transitive_closure(e1.unionByName(e2))


@_q(
    "dedup_embedding_cosine",
    f"""
    WITH e AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    eb AS (SELECT vec_id, v, {_bucket_sql('v')} AS blk FROM e)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
    FROM eb a JOIN eb b ON a.blk = b.blk AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.3
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs, blocked on the sign-random-
    projection bucket (the default — a real geometric quantization; a
    metadata label block can be corpus-sized)."""
    from kg.ops.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.3
    )


# ---- near-duplicate clustering: pairs → connected components → keeper ----
_JACCARD_PAIRS_SQL = f"""
    {_LSH_BUCKETS_SQL},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id),
    shq AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM s),
    sz AS (SELECT doc_id, count(*) AS n_sh FROM shq GROUP BY 1),
    common AS (
      SELECT doc_a, doc_b, count(*) AS n_common
      FROM cand
      JOIN shq sa ON sa.doc_id = cand.doc_a
      JOIN shq sb ON sb.doc_id = cand.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2),
    jp AS (
      SELECT doc_a, doc_b
      FROM common
      JOIN sz na ON common.doc_a = na.doc_id
      JOIN sz nb ON common.doc_b = nb.doc_id
      WHERE round(n_common / (na.n_sh + nb.n_sh - n_common), 6) >= 0.05)
"""


@_q(
    "dedup_near_dup_clusters",
    f"""
    WITH RECURSIVE {_JACCARD_PAIRS_SQL},
    -- DISTINCT over UNION ALL: inside WITH RECURSIVE DuckDB treats a
    -- top-level UNION CTE as a recursive candidate and skips the dedup
    und AS (SELECT DISTINCT src, dst FROM (
              SELECT doc_a AS src, doc_b AS dst FROM jp
              UNION ALL SELECT doc_b, doc_a FROM jp)),
    cc_nodes AS (SELECT DISTINCT src AS node FROM und),
    reach AS (
      SELECT node, node AS r FROM cc_nodes
      UNION
      SELECT reach.node, und.dst AS r FROM reach JOIN und ON und.src = reach.r),
    mapping AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
    asg AS (
      SELECT d.doc_id, coalesce(m.cluster_id, d.doc_id) AS cluster_id,
             d.n_chars
      FROM documents d LEFT JOIN mapping m ON m.node = d.doc_id)
    SELECT doc_id, cluster_id,
           first_value(doc_id) OVER (PARTITION BY cluster_id
                                     ORDER BY n_chars DESC, doc_id)
             AS keeper_doc_id
    FROM asg
    """,
)
def dedup_near_dup_clusters(spark, sf_dir):
    """End-to-end near-dup removal: verified Jaccard pairs (LSH-blocked)
    → connected components (transitive A~B~C merging) → longest-doc
    keeper election per cluster."""
    from kg.ops.dedup import near_dup_clusters

    return near_dup_clusters(_t(spark, sf_dir, "documents"), threshold=0.05)


# ---- deterministic sampling / splits (md5-interval membership) ----
from kg.ops.sample import (  # noqa: E402
    _hex_point as _sample_hex,
    bucket_sql as _sample_bucket_sql,
    split_case_sql as _split_case_sql,
)

_STRAT_RATES = {"en": 0.5, "de": 0.25, "es": 0.1}
_STRAT_DEFAULT = 0.05
_STRAT_CASE = (
    "CASE lang "
    + " ".join(
        f"WHEN '{v}' THEN '{_sample_hex(r)}'"
        for v, r in sorted(_STRAT_RATES.items())
    )
    + f" ELSE '{_sample_hex(_STRAT_DEFAULT)}' END"
)


@_q(
    "sample_stratified",
    f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_sample_bucket_sql("doc_id", "sample")} < {_STRAT_CASE}
    """,
)
def sample_stratified(spark, sf_dir):
    """Deterministic per-stratum sampling (language rebalancing): md5-
    interval membership — stable across retries/partitionings/engines,
    map-only (zero shuffle at any corpus size), unlike df.sampleBy."""
    from kg.ops.sample import stratified_sample

    return stratified_sample(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "lang",
        _STRAT_RATES,
        default_rate=_STRAT_DEFAULT,
    ).select("doc_id", "lang", "source")


_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@_q(
    "sample_split_assign",
    f"""
    SELECT doc_id, {_split_case_sql("doc_id", _SPLIT_WEIGHTS)} AS split
    FROM documents
    """,
)
def sample_split_assign(spark, sf_dir):
    """Exhaustive, non-overlapping train/val/test assignment from
    contiguous md5 intervals — a row's split never changes as the corpus
    grows (randomSplit boundaries depend on partition contents)."""
    from kg.ops.sample import assign_splits

    return assign_splits(
        _t(spark, sf_dir, "documents"), "doc_id", _SPLIT_WEIGHTS
    ).select("doc_id", "split")


# ---- IVF approximate nearest neighbor (cell-probing scale path) ----
@_q(
    "ann_ivf_topk",
    """
    WITH e AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    c0 AS (SELECT vec_id, v,
                  md5('ivf|' || CAST(vec_id AS VARCHAR)) AS hk
           FROM e ORDER BY hk, vec_id LIMIT 16),
    cent AS (SELECT row_number() OVER (ORDER BY hk, vec_id) - 1 AS cid,
                    v AS cv, sqrt(list_dot_product(v, v)) AS cnorm
             FROM c0),
    asg AS (SELECT e.vec_id, e.v, cent.cid,
                   round(list_dot_product(e.v, cent.cv) / cent.cnorm, 6) AS s
            FROM e CROSS JOIN cent),
    cells AS (SELECT vec_id, v, cid FROM asg
              QUALIFY row_number() OVER (PARTITION BY vec_id
                                         ORDER BY s DESC, cid) = 1),
    pc AS (SELECT vec_id AS probe_id, v AS pv, cid FROM asg
           WHERE vec_id < 5
           QUALIFY row_number() OVER (PARTITION BY vec_id
                                      ORDER BY s DESC, cid) <= 4),
    cnd AS (SELECT probe_id, pv, c.vec_id AS neighbor_id, c.v AS nv
            FROM pc JOIN cells c ON c.cid = pc.cid
                                AND c.vec_id <> pc.probe_id),
    sc AS (SELECT probe_id, neighbor_id,
                  round(list_dot_product(pv, nv)
                    / (sqrt(list_dot_product(pv, pv))
                       * sqrt(list_dot_product(nv, nv))), 6) AS cos_sim
           FROM cnd),
    r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
            ORDER BY cos_sim DESC, neighbor_id) AS rk FROM sc)
    SELECT probe_id, neighbor_id, CAST(rk AS BIGINT) AS rank, cos_sim
    FROM r WHERE rk <= 10
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF ANN: deterministic md5-seeded centroids, map-only cell
    assignment (centroids inlined as literals — no join, no shuffle),
    probes search their 4 nearest of 16 cells, exact cosine re-rank."""
    from kg.ops.similarity import ivf_topk

    return ivf_topk(
        _t(spark, sf_dir, "embeddings"),
        probe_ids=[0, 1, 2, 3, 4],
        k=10,
        n_cells=16,
        n_probe=4,
    )


# ---- PageRank (fixed-point integer arithmetic — engine-exact) ----
from kg.ops.graph import pagerank_sql as _pagerank_sql  # noqa: E402

_PR_EDGES_CTE = """e AS (
      SELECT 'R:' || r_name AS src, 'N:' || n_name AS dst
      FROM nation JOIN region ON n_regionkey = r_regionkey
      UNION ALL
      SELECT 'N:' || n_name, 'S:' || CAST(s_suppkey AS VARCHAR)
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      UNION ALL
      SELECT 'S:' || CAST(s_suppkey AS VARCHAR), 'R:' || r_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey)"""


@_q(
    "graph_pagerank",
    _pagerank_sql(_PR_EDGES_CTE, n_iter=10, damping_pct=85, emit_double=False),
)
def graph_pagerank(spark, sf_dir):
    """10-iteration PageRank over the region→nation→supplier→region cycle
    graph.  pr_scaled is BIGINT fixed-point (1.0 == 10^12): every step is
    integer div + exact integer sum, so the value is bitwise identical
    across engines/partitionings/retries — float PageRank is not."""
    from kg.ops.graph import pagerank

    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    e1 = n.join(r, n["n_regionkey"] == r["r_regionkey"]).select(
        F.concat(F.lit("R:"), "r_name").alias("src"),
        F.concat(F.lit("N:"), "n_name").alias("dst"),
    )
    e2 = s.join(n, s["s_nationkey"] == n["n_nationkey"]).select(
        F.concat(F.lit("N:"), "n_name").alias("src"),
        F.concat(F.lit("S:"), F.col("s_suppkey").cast("string")).alias("dst"),
    )
    e3 = (
        s.join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select(
            F.concat(F.lit("S:"), F.col("s_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("R:"), "r_name").alias("dst"),
        )
    )
    edges = e1.unionByName(e2).unionByName(e3)
    return pagerank(edges, n_iter=10, damping_pct=85).select("node", "pr_scaled")


# ---- repetition signals + PII scrubbing ----
@_q(
    "text_repetition",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS words FROM documents),
    base AS (SELECT doc_id, len(words) AS n_w,
                    len(list_distinct(words)) AS n_u, words FROM w),
    bg AS (SELECT doc_id,
             unnest(CASE WHEN len(words) >= 2 THEN
               list_transform(range(1, len(words)),
                              i -> words[i] || ' ' || words[i+1])
               ELSE [] END) AS b
           FROM base),
    cnt AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
    tops AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM cnt GROUP BY 1)
    SELECT base.doc_id,
           CAST(n_w AS BIGINT) AS n_words,
           CAST(n_u AS BIGINT) AS n_uniq_words,
           round(CASE WHEN n_w > 0
                      THEN 1 - n_u / CAST(n_w AS DOUBLE) ELSE 0.0 END, 6)
             AS rep_word_frac,
           round(coalesce(mx / CAST(tot AS DOUBLE), 0.0), 6)
             AS top_bigram_share
    FROM base LEFT JOIN tops ON tops.doc_id = base.doc_id
    """,
)
def text_repetition(spark, sf_dir):
    """C4/Gopher repetition filters: repeated-word fraction + top-bigram
    share (array exprs + one doc_id-keyed explode/agg — skew-free)."""
    from kg.ops.text import repetition_signals

    return repetition_signals(_t(spark, sf_dir, "documents"))


def _pii_sql() -> str:
    from kg.ops.text import PII_PATTERNS, _PII_ORDER

    clean = "text"
    for kind in _PII_ORDER:
        pat = PII_PATTERNS[kind].replace("'", "''")
        clean = f"regexp_replace({clean}, '{pat}', '<{kind.upper()}>', 'g')"
    counts = ", ".join(
        "CAST(len(regexp_extract_all(text, '{p}')) AS BIGINT) AS n_{k}s".format(
            p=PII_PATTERNS[k].replace("'", "''"), k=k
        )
        for k in _PII_ORDER
    )
    return f"SELECT doc_id, {counts}, {clean} AS clean_text FROM documents"


@_q("text_pii_scrub", _pii_sql())
def text_pii_scrub(spark, sf_dir):
    """PII redaction: URL/email/IPv4 counts + <TOKEN>-redacted text, all
    regexp built-ins (patterns in the Java-regex ∩ RE2 subset so both
    engines execute identical expressions)."""
    from kg.ops.text import pii_scrub

    return pii_scrub(_t(spark, sf_dir, "documents"))


@_q(
    "text_top_tokens",
    f"""
    WITH t AS (SELECT lang, unnest({_WORDS_SQL}) AS token FROM documents),
    c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n
          FROM t GROUP BY 1, 2),
    r AS (SELECT *, row_number() OVER (PARTITION BY lang
            ORDER BY n DESC, token) AS rk FROM c)
    SELECT lang, token, n, CAST(rk AS BIGINT) AS rank_in_lang
    FROM r WHERE rk <= 20
    """,
)
def text_top_tokens(spark, sf_dir):
    """Per-language vocabulary heavy hitters (top-20 tokens): the corpus
    stat a tokenizer-training pipeline reads first.  One explode + a
    map-combined (lang, token) count; the count shuffle keys on
    (lang, token) — high-cardinality, skew-free.

    r6 two-phase top-k (VERDICT r5 item 3, same trick as
    top_n_per_stratum): the r5 per-lang window sorted a language's
    ENTIRE distinct vocabulary in one task (10^8+ rows for a web-scale
    English).  Phase 1 ranks within (lang, pmod(xxhash64(token), B)) —
    any task is bounded at |vocab(lang)|/B — and keeps ≤ 20 per bucket;
    phase 2 runs the original window over ≤ 20·B survivors only.
    Output identical by construction: a global top-20 token has < 20
    tokens ahead of it in its language's (n desc, token asc) order,
    hence < 20 ahead within its own bucket, so it survives phase 1
    (equality vs the one-phase form asserted in tests).  explode_outer +
    null filter keeps InferFiltersFromGenerate from cloning the words()
    split below the Generate."""
    from pyspark.sql.window import Window as W

    from kg.ops.dedup import words

    n_buckets = 64
    d = _t(spark, sf_dir, "documents")
    c = (
        d.select("lang", F.explode_outer(words(F.col("text"))).alias("token"))
        .where(F.col("token").isNotNull())
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    sb = F.pmod(F.xxhash64("token"), F.lit(n_buckets))
    w1 = W.partitionBy(F.col("lang"), sb).orderBy(F.desc("n"), F.asc("token"))
    survivors = (
        c.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= 20)
        .drop("_rn")
    )
    w2 = W.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    return (
        survivors.withColumn("rank_in_lang", F.row_number().over(w2).cast("long"))
        .where(F.col("rank_in_lang") <= 20)
        .select("lang", "token", "n", "rank_in_lang")
    )


@_q(
    "mm_resize_dims",
    """
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
    d AS (SELECT doc_id, n % 640 + 1 AS w, n % 480 + 1 AS h FROM b)
    SELECT doc_id,
      CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      CAST(CASE WHEN greatest(w, h) > 256
                THEN (w * 256) // greatest(w, h) ELSE w END AS BIGINT)
        AS out_width,
      CAST(CASE WHEN greatest(w, h) > 256
                THEN (h * 256) // greatest(w, h) ELSE h END AS BIGINT)
        AS out_height
    FROM d
    """,
)
def mm_resize_dims(spark, sf_dir):
    """Multimodal resize plumbing: stub decode → integer clamp of the
    longest side to 256 inside the same mapInPandas batch loop a real
    PIL resize would use.  Integer arithmetic ⇒ engine-exact oracle."""
    from kg.ops.multimodal import resize_images, with_binary_payload

    return resize_images(with_binary_payload(_t(spark, sf_dir, "documents")))


@_q(
    "mm_frame_sample",
    """
    WITH b AS (SELECT doc_id, text,
                      octet_length(encode(text)) AS n FROM documents),
    f AS (SELECT doc_id, text,
                 unnest(range(0, (n // 1024) + 1, 4)) AS frame_idx
          FROM b)
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           md5(text || ':' || CAST(frame_idx AS VARCHAR)) AS frame_fp
    FROM f
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Video-style frame sampling plumbing: every payload fans out to
    one row per sampled frame index (the 1→N mapInPandas contract a
    real decoder needs); per-frame md5 fingerprints recomputed by the
    oracle from the identical stub bytes."""
    from kg.ops.multimodal import sample_frames, with_binary_payload

    return sample_frames(with_binary_payload(_t(spark, sf_dir, "documents")))


@_q(
    "ann_lsh_multiprobe",
    f"""
    WITH e AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    eb AS (SELECT vec_id, v, {_bucket_sql('v')} AS bucket FROM e),
    p AS (SELECT vec_id AS probe_id, pv,
                 unnest([pbkt, xor(pbkt, 1), xor(pbkt, 2), xor(pbkt, 4),
                         xor(pbkt, 8), xor(pbkt, 16), xor(pbkt, 32)])
                   AS pbucket
          FROM (SELECT vec_id, v AS pv, bucket AS pbkt
                FROM eb WHERE vec_id < 5)),
    s AS (SELECT probe_id, eb.vec_id AS neighbor_id, {_COS_SQL} AS cos_sim
          FROM eb JOIN p ON eb.bucket = p.pbucket
          WHERE eb.vec_id <> probe_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
            ORDER BY cos_sim DESC, neighbor_id) AS rk FROM s)
    SELECT probe_id, neighbor_id, CAST(rk AS BIGINT) AS rank, cos_sim
    FROM r WHERE rk <= 10
    """,
)
def ann_lsh_multiprobe(spark, sf_dir):
    """Multi-probe LSH top-k: each probe also searches the n_planes
    Hamming-1 buckets (vectors that fell just across one hyperplane),
    trading a (n_planes+1)/2^n_planes corpus scan share for recall with
    no index rebuild."""
    from kg.ops.similarity import lsh_topk

    return lsh_topk(
        _t(spark, sf_dir, "embeddings"), probe_ids=[0, 1, 2, 3, 4], k=10, hamming=1
    )


@_q(
    "sample_split_contamination",
    f"""
    WITH {_LSH_BUCKETS_SQL},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id),
    shc AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM s),
    szc AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY 1),
    common AS (
      SELECT doc_a, doc_b, count(*) AS n_common
      FROM cand
      JOIN shc sa ON sa.doc_id = cand.doc_a
      JOIN shc sb ON sb.doc_id = cand.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2),
    jacc AS (
      SELECT doc_a, doc_b,
             round(n_common / (na.n_sh + nb.n_sh - n_common), 6) AS jaccard
      FROM common
      JOIN szc na ON common.doc_a = na.doc_id
      JOIN szc nb ON common.doc_b = nb.doc_id
      WHERE round(n_common / (na.n_sh + nb.n_sh - n_common), 6) >= 0.05),
    tagged AS (
      SELECT doc_a, {_split_case_sql("doc_a", _SPLIT_WEIGHTS)} AS split_a,
             doc_b, {_split_case_sql("doc_b", _SPLIT_WEIGHTS)} AS split_b,
             jaccard
      FROM jacc)
    SELECT * FROM tagged WHERE split_a <> split_b
    """,
)
def sample_split_contamination(spark, sf_dir):
    """Decontamination report: near-dup pairs straddling train/val/test
    boundaries (LSH-blocked exact Jaccard × deterministic splits; zero
    extra joins — the split is recomputed in place on the endpoints)."""
    from kg.ops.sample import split_contamination

    return split_contamination(
        _t(spark, sf_dir, "documents"), threshold=0.05, weights=_SPLIT_WEIGHTS
    )


_PACK_SQL = f"""
    d0 AS (SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
                                  x -> x <> '')) AS BIGINT) AS n_tokens,
             CAST({_hex2int_sql(
                 "substring(md5('bkt|' || CAST(doc_id AS VARCHAR)), 1, 4)", 4
             )} % 8 AS INT) AS bucket,
             md5('pack|' || CAST(doc_id AS VARCHAR)) AS ok
           FROM documents),
    d AS (SELECT * FROM d0 WHERE n_tokens > 0),
    c AS (SELECT doc_id, bucket, n_tokens,
             sum(n_tokens) OVER (PARTITION BY bucket ORDER BY ok, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM d),
    packed AS (SELECT doc_id, bucket, n_tokens,
             CAST(cum - n_tokens AS BIGINT) AS start_offset,
             CAST(floor((cum - n_tokens) / 256) AS BIGINT) AS start_chunk,
             CAST(floor((cum - 1) / 256) AS BIGINT) AS end_chunk
          FROM c)
"""


@_q(
    "pack_chunk_assignments",
    f"""
    WITH {_PACK_SQL}
    SELECT doc_id, bucket, n_tokens, start_offset, start_chunk, end_chunk,
           CAST(end_chunk - start_chunk + 1 AS BIGINT) AS n_chunks
    FROM packed
    """,
)
def pack_chunk_assignments(spark, sf_dir):
    """GPT-style concat-and-chunk packing assignment: per doc, which
    fixed-256-token chunk(s) of its hash bucket it occupies.  One
    exchange (the per-bucket cumsum window); deterministic across
    engines — the oracle recomputes the identical concatenation order
    and chunk arithmetic."""
    from kg.ops.pack import pack_chunks

    return pack_chunks(
        _t(spark, sf_dir, "documents"), chunk_tokens=256, n_buckets=8
    )


@_q(
    "pack_chunk_manifest",
    f"""
    WITH {_PACK_SQL},
    x AS (SELECT bucket, n_tokens, start_offset,
                 unnest(range(start_chunk, end_chunk + 1)) AS chunk_idx
          FROM packed)
    SELECT bucket, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(least(start_offset + n_tokens, (chunk_idx + 1) * 256)
                    - greatest(start_offset, chunk_idx * 256)) AS BIGINT)
             AS n_tokens
    FROM x GROUP BY 1, 2
    """,
)
def pack_chunk_manifest(spark, sf_dir):
    """Per-chunk occupancy manifest (the shard index a training loader
    reads): straddling docs contribute their token overlap to each chunk
    they touch; every chunk except a bucket's last must hold exactly
    chunk_tokens tokens (asserted in tests)."""
    from kg.ops.pack import chunk_manifest, pack_chunks

    return chunk_manifest(
        pack_chunks(_t(spark, sf_dir, "documents"), chunk_tokens=256, n_buckets=8),
        chunk_tokens=256,
    )


@_q(
    "sample_capped_per_lang",
    f"""
    SELECT doc_id, lang FROM documents
    QUALIFY row_number() OVER (
      PARTITION BY lang
      ORDER BY {_sample_bucket_sql("doc_id", "cap")}, doc_id) <= 50
    """,
)
def sample_capped_per_lang(spark, sf_dir):
    """Deterministic per-stratum cap (at most 50 docs per language,
    hash-ordered): growth-stable and engine-exact, unlike per-group
    limit or sampleBy."""
    from kg.ops.sample import top_n_per_stratum

    return top_n_per_stratum(
        _t(spark, sf_dir, "documents"), "lang", 50, "doc_id"
    ).select("doc_id", "lang")


@_q(
    "sample_ngram_contamination",
    f"""
    WITH d AS (SELECT doc_id, text,
                      {_split_case_sql("doc_id", _SPLIT_WEIGHTS)} AS split
               FROM documents),
    tg AS (SELECT DISTINCT unnest(sh) AS g FROM (
             SELECT {_SHINGLES_SQL} AS sh FROM (
               SELECT {_WORDS_SQL} AS words FROM d WHERE split = 'train'))),
    eg AS (SELECT DISTINCT doc_id, unnest(sh) AS g FROM (
             SELECT doc_id, {_SHINGLES_SQL} AS sh FROM (
               SELECT doc_id, {_WORDS_SQL} AS words FROM d
               WHERE split = 'test'))),
    tot AS (SELECT doc_id, count(*) AS n_ngrams FROM eg GROUP BY 1),
    hit AS (SELECT eg.doc_id, count(*) AS n_contaminated
            FROM eg JOIN tg USING (g) GROUP BY 1)
    SELECT e.doc_id,
      CAST(coalesce(tot.n_ngrams, 0) AS BIGINT) AS n_ngrams,
      CAST(coalesce(hit.n_contaminated, 0) AS BIGINT) AS n_contaminated,
      CASE WHEN coalesce(tot.n_ngrams, 0) > 0
           THEN round(coalesce(hit.n_contaminated, 0) / tot.n_ngrams, 6)
           ELSE 0.0 END AS contamination_rate
    FROM (SELECT doc_id FROM d WHERE split = 'test') e
    LEFT JOIN tot USING (doc_id)
    LEFT JOIN hit USING (doc_id)
    """,
)
def sample_ngram_contamination(spark, sf_dir):
    """Span-level eval decontamination (VERDICT r3 item 6): per test-split
    doc, the share of its distinct word n-grams appearing anywhere in the
    train split.  n=3 here so the synthetic corpus produces non-trivial
    rates; production uses the n=13 default."""
    from kg.ops.sample import assign_splits, ngram_overlap_contamination

    s = assign_splits(
        _t(spark, sf_dir, "documents"), "doc_id", weights=_SPLIT_WEIGHTS
    )
    return ngram_overlap_contamination(
        s.where(F.col("split") == "train"),
        s.where(F.col("split") == "test"),
        n=3,
    )

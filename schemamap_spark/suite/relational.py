"""Relational-operator correctness queries over the driver test data
(SURVEY.md §2.3 Q01–Q16, Q19, Q21, Q26).

Determinism rules used throughout:
- money aggregates go through decimal(18,2) so sums are exact and
  engine/order independent (doubles are neither);
- ratio scores are computed in double and round()ed to 6 digits;
- top-k queries carry explicit tiebreak columns so LIMIT selects the same
  row set in both engines (the driver's value hash is order-insensitive,
  but membership under LIMIT must match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schemamap_spark.session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Q01 scan + projection -------------------------------------------------
def q01_scan(spark, sf):
    return _t(spark, sf, "nation").orderBy("n_nationkey")


# --- Q02 IN-list + range filter ---------------------------------------------
def q02_filter_in(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.filter(F.col("o_orderstatus").isin("F", "O") & (F.col("o_totalprice") > 1000))
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


# --- Q03 inner join + group count -------------------------------------------
def q03_join_agg(spark, sf):
    c, n = _t(spark, sf, "customer"), _t(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("n_name")
    )


# --- Q04 left outer join ------------------------------------------------------
def q04_left_join(spark, sf):
    c, n = _t(spark, sf, "customer"), _t(spark, sf, "nation")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("customer_count"))
        .orderBy("n_name")
    )


# --- Q05 anti join (NOT IN) + Q06 semi join (EXISTS), tagged -------------------
# Merged (former q05_anti_join / q06_semi_join) to free a slot in the driver's
# 50-query correctness window for the packing/curation oracles; both join
# operators (J4 anti, J5 semi) still execute and value-check.
def q05_semi_anti(spark, sf):
    c, n = _t(spark, sf, "customer"), _t(spark, sf, "nation")
    s, li = _t(spark, sf, "supplier"), _t(spark, sf, "lineitem")
    anti = (
        n.join(c.select("c_nationkey").distinct(), n.n_nationkey == c.c_nationkey, "left_anti")
        .select(F.lit("anti").alias("op"), F.col("n_nationkey").alias("k"))
    )
    semi = (
        s.join(li, s.s_suppkey == li.l_suppkey, "left_semi")
        .select(F.lit("semi").alias("op"), F.col("s_suppkey").alias("k"))
    )
    return anti.unionAll(semi).orderBy("op", "k")


# --- Q07 global min/max broadcast + normalization -------------------------------
def q07_minmax_norm(spark, sf):
    c = _t(spark, sf, "customer")
    st = c.groupBy(F.col("c_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("n"))
    mm = st.agg(F.min("n").alias("mn"), F.max("n").alias("mx"))
    return (
        st.crossJoin(F.broadcast(mm))
        .select(
            "k",
            F.round(
                (F.col("n") - F.col("mn")).cast("double")
                / F.nullif((F.col("mx") - F.col("mn")).cast("double"), F.lit(0.0)),
                6,
            ).alias("norm_score"),
        )
        .orderBy("k")
    )


# --- Q08 distinct set aggregation ------------------------------------------------
def q08_collect_set(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias("statuses"))
        .orderBy("o_custkey")
    )


# --- Q09 agg battery: count distinct (incl. composite) + filtered counts
# (A4/A5/A6) + sum(case when) (A7) ---------------------------------------------
# One agg() pass over lineitem crossed with one over orders; carries the former
# q10_filtered_counts and q11_sum_case so the whole suite fits the driver's
# 50-query correctness window.
def q09_count_distinct(spark, sf):
    li, o = _t(spark, sf, "lineitem"), _t(spark, sf, "orders")
    return li.agg(
        F.countDistinct("l_suppkey").alias("supp_nd"),
        F.countDistinct("l_suppkey", "l_partkey").alias("supp_part_nd"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("returned_cnt"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("discounted_cnt"),
    ).crossJoin(
        F.broadcast(
            o.agg(
                F.sum(
                    F.when(F.col("o_orderpriority").like("1%"), 1).otherwise(0)
                ).alias("urgent_cnt")
            )
        )
    )


# --- Q12 top-k ranking --------------------------------------------------------------------
def q12_topk(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"))
        .orderBy(F.desc("s"), "o_custkey")
        .limit(10)
    )


# --- Q13 union / union all (both variants, tagged) -------------------------------------------
def q13_union(spark, sf):
    n = _t(spark, sf, "nation")
    a = n.filter(F.col("n_regionkey") == 0).select("n_name")
    b = n.filter(F.col("n_nationkey") < 5).select("n_name")
    dedup = a.union(b).distinct().select(F.lit("distinct").alias("variant"), "n_name")
    keep = a.unionAll(b).select(F.lit("all").alias("variant"), "n_name")
    return dedup.unionAll(keep).orderBy("variant", "n_name")


# --- Q14 scalar string/array functions ----------------------------------------------------------
def q14_scalar_fns(spark, sf):
    p = _t(spark, sf, "part")
    return (
        p.orderBy("p_partkey")
        .limit(100)
        .select(
            F.trim(F.col("p_name")).alias("trimmed_name"),
            F.split(F.col("p_brand"), "#").getItem(1).alias("brand_num"),
            F.array_join(F.split(F.col("p_name"), " "), ",").alias("name_csv"),
            F.substring(F.col("p_type"), 3, 1_000_000).alias("type_tail"),
            F.lower(F.regexp_replace(F.col("p_brand"), "#", "_")).alias("brand_slug"),
            F.split_part(F.col("p_brand"), F.lit("#"), F.lit(1)).alias("brand_word"),
        )
    )


# --- Q15 POSIX regex (~*) + ILIKE family (P5/P6/P7), one scan -----------------------------------
def q15_regex(spark, sf):
    p = _t(spark, sf, "part")
    return p.agg(
        F.count(F.when(F.col("p_name").rlike("(?i)^(sm|re)"), 1)).alias("regex_cnt"),
        F.count(F.when(F.col("p_type").ilike("%econ%"), 1)).alias("ilike_cnt"),
    )


# --- Q19 nested map aggregation (A10), compared as exploded sorted entries ----------------------
def q19_map_agg(spark, sf):
    o, c, n = _t(spark, sf, "orders"), _t(spark, sf, "customer"), _t(spark, sf, "nation")
    per = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # build the map (the operator under test), then explode back to rows so the
    # comparison is engine-neutral (map iteration order is not portable)
    mapped = per.groupBy("n_name").agg(
        F.map_from_entries(F.sort_array(F.collect_list(F.struct("o_orderstatus", "cnt")))).alias("m")
    )
    return (
        mapped.select("n_name", F.explode("m").alias("o_orderstatus", "cnt"))
        .orderBy("n_name", "o_orderstatus")
    )


# --- Q21 exact count (estimate asserted engine-side in tests) ------------------------------------
def q21_count(spark, sf):
    return _t(spark, sf, "lineitem").agg(F.count(F.lit(1)).alias("exact_cnt"))


# --- Q27 portable exact-arithmetic statistics --------------------------------
def q27_stats(spark, sf):
    """avg / stddev over doubles are order-dependent across engines; computing
    them from EXACT decimal sums (sum, sum-of-squares, count) makes the final
    double arithmetic deterministic and portable."""
    li = _t(spark, sf, "lineitem")
    d = F.col("l_extendedprice").cast("decimal(18,2)")
    per = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d).alias("price_sum"),
        F.sum((d * d).cast("decimal(38,4)")).alias("price_sumsq"),
        F.min(d).alias("price_min"),
        F.max(d).alias("price_max"),
        # exact median (absorbed former q31_median; decimal input makes the
        # interpolation arithmetic engine-portable)
        F.round(
            F.expr("percentile(cast(l_quantity as decimal(18,2)), 0.5)"), 6
        ).alias("qty_median"),
    )
    return per.select(
        "l_returnflag",
        "n",
        "price_sum",
        "price_min",
        "price_max",
        "qty_median",
        F.round(F.col("price_sum").cast("double") / F.col("n").cast("double"), 6).alias("price_avg"),
        F.round(
            F.sqrt(
                (
                    F.col("price_sumsq").cast("double")
                    - F.col("price_sum").cast("double") * F.col("price_sum").cast("double")
                    / F.col("n").cast("double")
                )
                / (F.col("n").cast("double") - 1.0)
            ),
            4,
        ).alias("price_stddev"),
    ).orderBy("l_returnflag")


# --- Q28 rollup (grouping-set aggregation) -----------------------------------
def q28_rollup(spark, sf):
    """Subtotal rows carry an explicit grouping_id and sentinel key values (no
    NULL grouping cells), and the exact decimal sum is emitted as double —
    the r01 driver hash-mismatch was canonicalization of NULL+decimal rows,
    so the output surface is restricted to strings/ints/doubles."""
    li = _t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_sum_dec"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("l_linestatus"),
            "gid",
            "n",
            F.col("qty_sum_dec").cast("double").alias("qty_sum"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


# --- Q29 set operations: intersect + except, tagged ----------------------------
def q29_setops(spark, sf):
    c, s, n = _t(spark, sf, "customer"), _t(spark, sf, "supplier"), _t(spark, sf, "nation")
    inter = (
        c.select(F.col("c_nationkey").alias("nk"))
        .intersect(s.select(F.col("s_nationkey").alias("nk")))
        .select(F.lit("intersect").alias("op"), "nk")
    )
    exc = (
        # subtract = EXCEPT DISTINCT, matching the oracle's EXCEPT; the
        # previous exceptAll only agreed because n_nationkey happens to be
        # unique — a fixture with duplicate left keys would have diverged
        n.select(F.col("n_nationkey").alias("nk"))
        .subtract(c.select(F.col("c_nationkey").alias("nk")))
        .select(F.lit("except").alias("op"), "nk")
    )
    return inter.unionAll(exc).orderBy("op", "nk")


# --- Q33 cube ------------------------------------------------------------------
def q33_cube(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


# --- Q32 JSON field extraction -------------------------------------------------
def q32_json_extract(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("k_sum"),
            F.count(F.when(F.get_json_object("props", "$.k").cast("bigint") > 50, 1)).alias("k_gt50"),
        )
        .orderBy("event_type")
    )


# --- Q26 JSON edge canonicalization ---------------------------------------------------------------
def q26_to_json(spark, sf):
    n = _t(spark, sf, "nation")
    return (
        n.filter(F.col("n_regionkey") == 1)
        .agg(
            F.to_json(
                F.sort_array(F.collect_list(F.struct("n_nationkey", "n_name")))
            ).alias("nations_json")
        )
    )


SPARK_QUERIES = {
    "q01_scan": q01_scan,
    "q02_filter_in": q02_filter_in,
    "q03_join_agg": q03_join_agg,
    # q04_left_join left the 50-slot driver registry in round 6 for
    # dsir_select (the flagship round-5 training-data op): left-outer join
    # (J2) stays driver-proven by q22_status's SMO left joins, and q04
    # keeps its full value-check via the extra parity registry.
    "q05_semi_anti": q05_semi_anti,
    "q07_minmax_norm": q07_minmax_norm,
    "q08_collect_set": q08_collect_set,
    "q09_count_distinct": q09_count_distinct,
    # q12_topk was swapped OUT of the 50-slot driver registry in round 4 to
    # make room for text_ngram_stats: top-k ranking (O2) stays oracle-proven
    # by q23_candidates, and bench.py still times q12 via a direct import
    "q13_union": q13_union,
    "q14_scalar_fns": q14_scalar_fns,
    "q15_regex": q15_regex,
    "q19_map_agg": q19_map_agg,
    "q21_count": q21_count,
    "q26_to_json": q26_to_json,
    "q27_stats": q27_stats,
    "q28_rollup": q28_rollup,
    "q29_setops": q29_setops,
    "q32_json_extract": q32_json_extract,
    # q33_cube left the 50-slot driver registry in round 5 for
    # quality_quantile_filter (suite/llm.py): CUBE stays proven by
    # q28_rollup's grouping-sets machinery, and q33 keeps a value-check via
    # the extra (non-driver) parity registry in suite/extra.py.
}

ORACLE_SQL = {
    "q01_scan": "select * from nation order by n_nationkey",
    "q02_filter_in": (
        "select o_orderkey from orders "
        "where o_orderstatus in ('F','O') and o_totalprice > 1000 order by 1"
    ),
    "q03_join_agg": (
        "select n_name, count(*) as c from customer "
        "join nation on c_nationkey = n_nationkey group by 1 order by 1"
    ),
    "q05_semi_anti": (
        "select 'anti' as op, n_nationkey as k from nation where n_nationkey not in "
        "(select distinct c_nationkey from customer) "
        "union all "
        "select 'semi' as op, s_suppkey as k from supplier where exists "
        "(select 1 from lineitem where l_suppkey = s_suppkey) "
        "order by 1, 2"
    ),
    "q07_minmax_norm": (
        "with st as (select c_nationkey as k, count(*) as n from customer group by 1), "
        "mm as (select min(n) as mn, max(n) as mx from st) "
        "select k, round((n - mn) * 1.0 / nullif(mx - mn, 0), 6) as norm_score "
        "from st, mm order by 1"
    ),
    "q08_collect_set": (
        "select o_custkey, array_to_string(list_sort(list(distinct o_orderstatus)), ',') "
        "as statuses from orders group by 1 order by 1"
    ),
    "q09_count_distinct": (
        "select * from "
        "(select count(distinct l_suppkey) as supp_nd, "
        "count(distinct (l_suppkey, l_partkey)) as supp_part_nd, "
        "count(*) filter (where l_returnflag = 'R') as returned_cnt, "
        "count(*) filter (where l_discount > 0.05) as discounted_cnt from lineitem) "
        "cross join "
        # cast: DuckDB sum(int) is HUGEINT; Spark's is bigint
        "(select cast(sum(case when o_orderpriority like '1%' then 1 else 0 end) as bigint) "
        "as urgent_cnt from orders)"
    ),
    "q13_union": (
        "select 'distinct' as variant, n_name from "
        "(select n_name from nation where n_regionkey = 0 "
        " union select n_name from nation where n_nationkey < 5) "
        "union all "
        "select 'all' as variant, n_name from "
        "(select n_name from nation where n_regionkey = 0 "
        " union all select n_name from nation where n_nationkey < 5) "
        "order by 1, 2"
    ),
    "q14_scalar_fns": (
        "select trim(p_name) as trimmed_name, "
        "string_split(p_brand, '#')[2] as brand_num, "
        "array_to_string(string_split(p_name, ' '), ',') as name_csv, "
        "substring(p_type, 3) as type_tail, "
        "lower(replace(p_brand, '#', '_')) as brand_slug, "
        "split_part(p_brand, '#', 1) as brand_word "
        "from (select * from part order by p_partkey limit 100)"
    ),
    "q15_regex": (
        "select count(*) filter (where regexp_matches(p_name, '(?i)^(sm|re)')) as regex_cnt, "
        "count(*) filter (where p_type ilike '%econ%') as ilike_cnt from part"
    ),
    "q19_map_agg": (
        "select n_name, o_orderstatus, count(*) as cnt from orders "
        "join customer on o_custkey = c_custkey "
        "join nation on c_nationkey = n_nationkey "
        "group by 1, 2 order by 1, 2"
    ),
    "q21_count": "select count(*) as exact_cnt from lineitem",
    "q26_to_json": (
        "select to_json(list_sort(list(struct_pack(n_nationkey := n_nationkey, "
        "n_name := n_name)))) as nations_json from nation where n_regionkey = 1"
    ),
    "q27_stats": """
        with per as (
          select l_returnflag,
                 count(*) as n,
                 sum(cast(l_extendedprice as decimal(18,2))) as price_sum,
                 sum(cast(cast(l_extendedprice as decimal(18,2))
                          * cast(l_extendedprice as decimal(18,2)) as decimal(38,4))) as price_sumsq,
                 min(cast(l_extendedprice as decimal(18,2))) as price_min,
                 max(cast(l_extendedprice as decimal(18,2))) as price_max,
                 round(quantile_cont(cast(l_quantity as decimal(18,2)), 0.5), 6) as qty_median
          from lineitem group by 1
        )
        select l_returnflag, n, price_sum, price_min, price_max, qty_median,
               round(cast(price_sum as double) / n, 6) as price_avg,
               round(sqrt((cast(price_sumsq as double)
                           - cast(price_sum as double) * cast(price_sum as double) / n)
                          / (n - 1.0)), 4) as price_stddev
        from per order by 1
    """,
    "q28_rollup": """
        select coalesce(l_returnflag, '(all)') as l_returnflag,
               coalesce(l_linestatus, '(all)') as l_linestatus,
               cast(grouping(l_returnflag, l_linestatus) as int) as gid,
               count(*) as n,
               cast(sum(cast(l_quantity as decimal(18,2))) as double) as qty_sum
        from lineitem
        group by rollup (l_returnflag, l_linestatus)
        order by 3, 1, 2
    """,
    "q29_setops": (
        "select 'intersect' as op, nk from "
        "(select c_nationkey as nk from customer "
        " intersect select s_nationkey as nk from supplier) "
        "union all "
        "select 'except' as op, nk from "
        "(select n_nationkey as nk from nation "
        " except select distinct c_nationkey as nk from customer) "
        "order by 1, 2"
    ),
    "q32_json_extract": """
        select event_type,
               cast(sum(cast(json_extract_string(props, '$.k') as bigint)) as bigint) as k_sum,
               count(*) filter (where cast(json_extract_string(props, '$.k') as bigint) > 50) as k_gt50
        from events group by 1 order by 1
    """,
}

# Oracles for the demoted q04_left_join / q33_cube — consumed by
# suite/extra.py's parity-only registry, kept here next to their Spark twins.
Q04_LEFT_JOIN_ORACLE = (
    "select n_name, count(c_custkey) as customer_count from nation "
    "left join customer on c_nationkey = n_nationkey group by 1 order by 1"
)

Q33_CUBE_ORACLE = """
    select o_orderstatus, o_orderpriority, count(*) as n
    from orders
    group by cube (o_orderstatus, o_orderpriority)
    order by 1, 2
"""

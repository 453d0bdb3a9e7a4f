package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{GraftQuery, Tables}

/** Relational operator suite over the TPC-H-ish star schema.
  *
  * Each query re-expresses an operator family from SURVEY.md §2 (the
  * reference's single-table dashboard workload — aggregation, CASE
  * bucketing, HAVING, scalar subqueries, top-k, window encoding — observed
  * in /root/reference/pharmaceutical_dashboard_queries.sql and the two
  * notebooks) as idiomatic Spark DataFrame code on the driver's test
  * tables, with a DuckDB oracle per query.
  *
  * Scale notes are inline: which side broadcasts, where the shuffles are,
  * and why each plan survives 100 TB.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** TPC-H Q1 shape: scan → partial agg → 1 shuffle on tiny key space →
    * final agg. Mirrors reference §2.4 A3/A5 (groupBy + multi-agg).
    * At 100 TB: only the ~6-row aggregate shuffles; filter and projection
    * push into the parquet scan. */
  val q01PricingSummary = GraftQuery(
    "q01_pricing_summary",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity),2) AS sum_qty,
      round(sum(l_extendedprice),2) AS sum_base_price,
      round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
      round(avg(l_quantity),2) AS avg_qty,
      round(avg(l_discount),4) AS avg_disc,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Global (grouping-free) aggregate — reference §2.4 A1
    * (min/avg/max price audit, Pharma_Ingestion_Cleaning.py:94). */
  val q02GlobalStats = GraftQuery(
    "q02_global_stats",
    (s, dir) =>
      t(s, dir, "lineitem").agg(
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        count(lit(1)).as("n")),
    Some("""SELECT round(min(l_extendedprice),2) AS min_price,
      round(max(l_extendedprice),2) AS max_price,
      round(avg(l_extendedprice),2) AS avg_price,
      count(*) AS n FROM lineitem"""))

  /** COUNT(*) + COUNT(DISTINCT) KPI row — reference §2.4 A4 (the dashboard
    * KPI query, pharmaceutical_dashboard_queries.sql:8-15). Exact distinct
    * costs an Expand + 2-phase agg; the HLL variant for 100 TB dashboards
    * is q03bApproxDistinct below. */
  val q03CountDistinct = GraftQuery(
    "q03_count_distinct",
    (s, dir) =>
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("total_rows"),
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        countDistinct(col("l_orderkey")).as("distinct_orders")),
    Some("""SELECT count(*) AS total_rows,
      count(DISTINCT l_partkey) AS distinct_parts,
      count(DISTINCT l_suppkey) AS distinct_supps,
      count(DISTINCT l_orderkey) AS distinct_orders FROM lineitem"""))

  /** HLL++ approximate distinct — the 100 TB twin of q03: no Expand, one
    * constant-size sketch per partition instead of shuffling every
    * distinct value. Sketch values differ across engines, so the query
    * asserts the HLL accuracy CONTRACT (default rsd 5%) against the
    * exact count in-plan, and the oracle checks that boolean — a
    * cross-engine-stable way to oracle an approximate operator. */
  val q03bApproxDistinct = GraftQuery(
    "q03b_approx_distinct",
    (s, dir) =>
      t(s, dir, "lineitem")
        .agg(
          count(lit(1)).as("total_rows"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey")).as("__approx"))
        .select(col("total_rows"), col("exact_parts"),
          (abs(col("__approx") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("approx_within_5pct")),
    Some("""SELECT count(*) AS total_rows,
      count(DISTINCT l_partkey) AS exact_parts,
      TRUE AS approx_within_5pct FROM lineitem"""))

  /** Exact percentiles — reference §2.4 A6 (PERCENTILE(price,0.5),
    * pharmaceutical_dashboard_queries.sql:13). Exact percentile is a
    * sort-based aggregate; at 100 TB prefer the sketch-based variant —
    * q04bApproxPercentile below. Oracle uses ANSI percentile_cont, which
    * matches Spark's linear-interpolating exact percentile.
    *
    * ONE array-valued percentile, not four scalar calls (r21): each
    * scalar `percentile()` is an independent TypedImperativeAggregate
    * that builds and sorts its own value→count map over the same
    * column, so the 4-quantile form paid the buffer + sort 4×. The
    * array form shares one map and one sort across all quantiles —
    * identical interpolation arithmetic per quantile, so the values
    * (and the oracle hash) are unchanged. */
  val q04Percentile = GraftQuery(
    "q04_percentile",
    (s, dir) =>
      t(s, dir, "orders")
        .agg(expr(
          "percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.95))")
          .as("__p"))
        .select(
          round(element_at(col("__p"), 1), 2).as("p25"),
          round(element_at(col("__p"), 2), 2).as("median"),
          round(element_at(col("__p"), 3), 2).as("p75"),
          round(element_at(col("__p"), 4), 2).as("p95")),
    Some("""SELECT
      round(percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice),2) AS p25,
      round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY o_totalprice),2) AS median,
      round(percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice),2) AS p75,
      round(percentile_cont(0.95) WITHIN GROUP (ORDER BY o_totalprice),2) AS p95
      FROM orders"""))

  /** Approximate percentile (Greenwald-Khanna sketch) — the 100 TB twin of
    * q04: mergeable constant-size summaries instead of a global sort.
    * Same oracle trick as q03b: assert the accuracy contract (±1% of the
    * exact median at accuracy=10000) in-plan, compare the boolean. */
  val q04bApproxPercentile = GraftQuery(
    "q04b_approx_percentile",
    (s, dir) =>
      t(s, dir, "orders")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("median_exact"),
          expr("approx_percentile(o_totalprice, 0.5, 10000)").as("__approx"))
        .select(col("median_exact"),
          (abs(col("__approx") - col("median_exact")) <=
            col("median_exact") * 0.01).as("approx_within_1pct")),
    Some("""SELECT
      round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice),2) AS median_exact,
      TRUE AS approx_within_1pct FROM orders"""))

  /** Conditional (CASE-filtered) aggregation — reference §2.4 A7
    * (affordability bands, pharmaceutical_dashboard_queries.sql:96-98).
    * Null-skipping agg over CaseWhen keeps one scan for all bands. */
  val q05ConditionalAgg = GraftQuery(
    "q05_conditional_agg",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(when(col("o_totalprice") <= 50000, 1)).as("cheap_orders"),
          count(when(col("o_totalprice") > 200000, 1)).as("premium_orders"),
          round(avg(when(col("o_totalprice") <= 50000, col("o_totalprice"))), 2).as("avg_cheap"),
          round(avg(when(col("o_totalprice") > 200000, col("o_totalprice"))), 2).as("avg_premium"))
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority,
      count(CASE WHEN o_totalprice <= 50000 THEN 1 END) AS cheap_orders,
      count(CASE WHEN o_totalprice > 200000 THEN 1 END) AS premium_orders,
      round(avg(CASE WHEN o_totalprice <= 50000 THEN o_totalprice END),2) AS avg_cheap,
      round(avg(CASE WHEN o_totalprice > 200000 THEN o_totalprice END),2) AS avg_premium
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** HAVING (post-aggregation filter) — reference §2.4 A8
    * (HAVING COUNT(*) >= 30, pharmaceutical_dashboard_queries.sql:29). */
  val q06Having = GraftQuery(
    "q06_having",
    (s, dir) =>
      t(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("products"),
          round(avg(col("p_retailprice")), 2).as("avg_retail"))
        .filter(col("products") >= 5)
        .orderBy(col("products").desc, col("p_brand")),
    Some("""SELECT p_brand, count(*) AS products,
      round(avg(p_retailprice),2) AS avg_retail
      FROM part GROUP BY p_brand HAVING count(*) >= 5
      ORDER BY products DESC, p_brand"""))

  /** GROUP BY CASE bucketing + ORDER BY CASE custom collation — reference
    * §2.4 A9 + §2.6 O4 (price_category histogram,
    * pharmaceutical_dashboard_queries.sql:50-62,163-181). Bucket column is
    * projected once, grouped, then ordered by its rank expression. */
  val q07CaseBucket = GraftQuery(
    "q07_case_bucket", { (s, dir) =>
      val bucket = when(col("o_totalprice") <= 100000, "Low")
        .when(col("o_totalprice") <= 300000, "Medium")
        .otherwise("High")
      t(s, dir, "orders")
        .withColumn("price_category", bucket)
        .groupBy(col("price_category"))
        .agg(count(lit(1)).as("n_orders"),
          round(avg(col("o_totalprice")), 2).as("avg_price"))
        .orderBy(when(col("price_category") === "Low", 1)
          .when(col("price_category") === "Medium", 2).otherwise(3))
    },
    Some("""SELECT CASE WHEN o_totalprice <= 100000 THEN 'Low'
        WHEN o_totalprice <= 300000 THEN 'Medium' ELSE 'High' END AS price_category,
      count(*) AS n_orders, round(avg(o_totalprice),2) AS avg_price
      FROM orders GROUP BY 1
      ORDER BY CASE price_category WHEN 'Low' THEN 1 WHEN 'Medium' THEN 2 ELSE 3 END"""))

  /** Two-level re-aggregation — reference §2.4 A10 (AVG of per-class
    * counts, pharmaceutical_dashboard_queries.sql:105-113). Two chained
    * shuffles; the second input is already small (one row per group). */
  val q08TwoLevelAgg = GraftQuery(
    "q08_two_level_agg", { (s, dir) =>
      val perCust = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("spend"))
      perCust.agg(
        round(avg(col("n_orders")), 4).as("avg_orders_per_cust"),
        max(col("n_orders")).as("max_orders"),
        round(avg(col("spend")), 2).as("avg_spend"))
    },
    Some("""SELECT round(avg(n_orders),4) AS avg_orders_per_cust,
      max(n_orders) AS max_orders, round(avg(spend),2) AS avg_spend
      FROM (SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend
            FROM orders GROUP BY o_custkey) per_cust"""))

  /** Uncorrelated scalar subquery (market-share %) — reference §2.4 A11
    * (COUNT(*)*100.0/(SELECT COUNT(*)…),
    * pharmaceutical_dashboard_queries.sql:54,71,195,239). Run through
    * spark.sql to exercise the SQL front door; Catalyst plans the subquery
    * once and broadcasts the single value. */
  val q09ScalarSubquery = GraftQuery(
    "q09_scalar_subquery", { (s, dir) =>
      Tables.registerAll(s, dir)
      // 100.0 is DECIMAL in Spark SQL but DOUBLE in DuckDB — cast the
      // ratio to double before rounding so result types hash-match.
      s.sql("""SELECT o_orderpriority, count(*) AS n_orders,
        round(cast(count(*) * 100.0 / (SELECT count(*) FROM orders) AS DOUBLE), 2) AS pct_share
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_orders,
      round(count(*) * 100.0 / (SELECT count(*) FROM orders), 2) AS pct_share
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** ORDER BY + LIMIT top-k — reference §2.6 O6. Spark plans
    * TakeOrderedAndProject: per-partition top-k then a k-row merge on the
    * driver — no global sort, which is the only top-k that works at 100 TB.
    * o_orderkey tiebreak keeps the k-row frontier deterministic. */
  val q10TopK = GraftQuery(
    "q10_topk",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("total_price"))
        .orderBy(col("total_price").desc, col("o_orderkey"))
        .limit(10),
    Some("""SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS total_price
      FROM orders ORDER BY total_price DESC, o_orderkey LIMIT 10"""))

  /** Star-schema dimension join — broadcast both dims (§2.3). nation and
    * region stay tiny at any scale factor, so the fact side never
    * shuffles: BroadcastHashJoin × 2, then a 5-key aggregate. */
  val q11StarJoin = GraftQuery(
    "q11_star_join", { (s, dir) =>
      val cust = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      cust
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("customers"),
          round(sum(col("c_acctbal")), 2).as("total_acctbal"))
        .orderBy(col("r_name"))
    },
    Some("""SELECT r_name, count(*) AS customers,
      round(sum(c_acctbal),2) AS total_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  /** Fact-to-fact equi-join — orders ⋈ lineitem on the natural key. Both
    * sides shuffle-partition on l_orderkey/o_orderkey (sort-merge or
    * shuffled-hash under AQE); at 100 TB this is the bucketing candidate:
    * co-bucket both tables on orderkey and the exchange disappears. */
  val q12FactJoin = GraftQuery(
    "q12_fact_join", { (s, dir) =>
      val orders = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      orders.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("line_items"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority,
      round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
      count(*) AS line_items
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Left outer join + re-aggregation (TPC-H Q13 shape): customer
    * distribution by order count, keeping zero-order customers. */
  val q13OuterJoin = GraftQuery(
    "q13_outer_join", { (s, dir) =>
      val cust = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      cust.join(orders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("n_orders").desc)
    },
    Some("""SELECT n_orders, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey) per_cust
      GROUP BY n_orders ORDER BY custdist DESC, n_orders DESC"""))

  /** Semi/anti join — EXISTS / NOT EXISTS without materializing the right
    * side (§2.3): customers with vs without orders in one row. */
  val q14SemiAnti = GraftQuery(
    "q14_semi_anti", { (s, dir) =>
      val cust = t(s, dir, "customer")
      val orders = t(s, dir, "orders").select(col("o_custkey"))
      val withOrders = cust
        .join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("with_orders"))
      val withoutOrders = cust
        .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("without_orders"))
      withOrders.crossJoin(withoutOrders)
    },
    Some("""SELECT
      (SELECT count(*) FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS with_orders,
      (SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS without_orders"""))

  /** Partitioned ranking window — the scale-safe twin of the reference's
    * global dense_rank encoder (§2.5 W1, ML_Model_Complete…py:101-114).
    * PARTITION BY bounds every window to one nation — no single-partition
    * collapse at 100 TB. Top-3 suppliers per nation by balance. */
  val q15WindowRank = GraftQuery(
    "q15_window_rank", { (s, dir) =>
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
      t(s, dir, "supplier")
        .withColumn("rnk", dense_rank().over(w))
        .filter(col("rnk") <= 3)
        .select(col("s_nationkey"), col("rnk"), col("s_suppkey"),
          round(col("s_acctbal"), 2).as("acctbal"))
        .orderBy(col("s_nationkey"), col("rnk"), col("s_suppkey"))
    },
    Some("""SELECT s_nationkey, rnk, s_suppkey, round(s_acctbal,2) AS acctbal
      FROM (SELECT s_nationkey, s_suppkey, s_acctbal,
              dense_rank() OVER (PARTITION BY s_nationkey
                ORDER BY s_acctbal DESC, s_suppkey) AS rnk
            FROM supplier) ranked
      WHERE rnk <= 3 ORDER BY s_nationkey, rnk, s_suppkey"""))

  /** Analytic window functions over frames — running sum + lag delta per
    * customer ordered by order date (§2.5 full-surface commitment). */
  val q16WindowRunning = GraftQuery(
    "q16_window_running", { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("running_spend",
          round(sum(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .withColumn("prev_price", round(lag(col("o_totalprice"), 1).over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"), col("prev_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend,
      round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey),2) AS prev_price
      FROM orders ORDER BY o_custkey, o_orderkey"""))

  /** Set operations — UNION (distinct), INTERSECT, EXCEPT (§2.7). */
  val q17SetOps = GraftQuery(
    "q17_set_ops", { (s, dir) =>
      val orderCust = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val custKeys = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val unionN = orderCust.union(custKeys).distinct()
        .agg(count(lit(1)).as("union_keys"))
      val interN = orderCust.intersect(custKeys)
        .agg(count(lit(1)).as("both_keys"))
      val exceptN = custKeys.except(orderCust)
        .agg(count(lit(1)).as("cust_only_keys"))
      unionN.crossJoin(interN).crossJoin(exceptN)
    },
    Some("""SELECT
      (SELECT count(*) FROM (SELECT o_custkey AS k FROM orders
        UNION SELECT c_custkey FROM customer) u) AS union_keys,
      (SELECT count(*) FROM (SELECT o_custkey AS k FROM orders
        INTERSECT SELECT c_custkey FROM customer) i) AS both_keys,
      (SELECT count(*) FROM (SELECT c_custkey AS k FROM customer
        EXCEPT SELECT o_custkey FROM orders) e) AS cust_only_keys"""))

  /** Multiset set-ops (ALL variants) beside q17's distinct forms:
    * intersectAll/exceptAll keep DUPLICITY — each key survives
    * min(m, n) / max(m − n, 0) times — which distinct INTERSECT/EXCEPT
    * destroy. Same physical posture as q17: both rewrite to aggregates
    * on the key (count per side), one hash exchange each, no pairwise
    * comparison. */
  val q17bSetOpsAll = GraftQuery(
    "q17b_set_ops_all", { (s, dir) =>
      val orderCust = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val custKeys = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val interN = orderCust.intersectAll(custKeys)
        .agg(count(lit(1)).as("both_rows"))
      val exceptN = orderCust.exceptAll(custKeys)
        .agg(count(lit(1)).as("order_surplus_rows"))
      interN.crossJoin(exceptN)
    },
    Some("""SELECT
      (SELECT count(*) FROM (SELECT o_custkey AS k FROM orders
        INTERSECT ALL SELECT c_custkey FROM customer) i) AS both_rows,
      (SELECT count(*) FROM (SELECT o_custkey AS k FROM orders
        EXCEPT ALL SELECT c_custkey FROM customer) e) AS order_surplus_rows"""))

  /** Theta/range (non-equi) join — parts priced inside a band derived from
    * another relation (§2.3 "theta / range"). The band table is 1 row →
    * broadcast nested loop, the only sane physical plan for non-equi. */
  val q18RangeJoin = GraftQuery(
    "q18_range_join", { (s, dir) =>
      val part = t(s, dir, "part")
      val band = t(s, dir, "part").agg(
        round(avg(col("p_retailprice")) * 0.9, 6).as("lo"),
        round(avg(col("p_retailprice")) * 1.1, 6).as("hi"))
      part.join(broadcast(band),
          col("p_retailprice") >= col("lo") && col("p_retailprice") <= col("hi"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("mid_band_parts"))
        .orderBy(col("p_brand"))
    },
    Some("""WITH band AS (SELECT round(avg(p_retailprice)*0.9,6) AS lo,
                round(avg(p_retailprice)*1.1,6) AS hi FROM part)
      SELECT p_brand, count(*) AS mid_band_parts
      FROM part, band
      WHERE p_retailprice >= lo AND p_retailprice <= hi
      GROUP BY p_brand ORDER BY p_brand"""))

  /** Grouping sets / rollup — free via Catalyst (§2.4 note). Rollup over
    * (region, nation) customer counts; grouping_id disambiguates levels. */
  val q19Rollup = GraftQuery(
    "q19_rollup", { (s, dir) =>
      val cust = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      cust
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("customers"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },
    Some("""SELECT r_name, n_name, count(*) AS customers
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST"""))

  /** Exact deduplication on a constructed duplicate-heavy corpus (§2.7 +
    * README.md:17 "handling … duplicates"). UNION ALL of orders with
    * itself → dropDuplicates on the full row key. At 100 TB exact dedup is
    * one hash-shuffle on the dedup key — the baseline the MinHash path
    * (graft.ops.Dedup) improves on for *near*-dups. */
  val q20DedupExact = GraftQuery(
    "q20_dedup_exact", { (s, dir) =>
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val doubled = o.union(o)
      val total = doubled.agg(count(lit(1)).as("total_rows"))
      val deduped = doubled.dropDuplicates(Seq("o_orderkey", "o_custkey"))
        .agg(count(lit(1)).as("distinct_rows"))
      total.crossJoin(deduped)
    },
    Some("""SELECT
      (SELECT count(*) FROM (SELECT o_orderkey, o_custkey FROM orders
        UNION ALL SELECT o_orderkey, o_custkey FROM orders) d) AS total_rows,
      (SELECT count(*) FROM (SELECT DISTINCT o_orderkey, o_custkey
        FROM (SELECT o_orderkey, o_custkey FROM orders
          UNION ALL SELECT o_orderkey, o_custkey FROM orders) d) dd) AS distinct_rows"""))

  /** Typed Aggregator surface (§2.10 U1): geometric mean as a custom
    * merge-able aggregate, grouped per priority. The Aggregator shuffles
    * one (Σln, n) buffer per group per partition — identical exchange
    * volume to a built-in AVG. Oracle recomputes exp(avg(ln x)). */
  val q42TypedAggregator = GraftQuery(
    "q42_typed_aggregator",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(graft.functions.TypedAggregators.geoMean(col("o_totalprice")), 2)
            .as("geo_mean_price"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority,
      round(exp(avg(ln(o_totalprice))), 2) AS geo_mean_price,
      count(*) AS n_orders
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Explicit GROUPING SETS with grouping() level markers — the general
    * form of q19's rollup (§2.4 note: ships free via Catalyst's Expand).
    * One Expand multiplies each input row by the number of sets BEFORE the
    * shuffle, so at 100 TB the exchange is |sets| × rows — prune sets, not
    * post-filter. */
  val q52GroupingSets = GraftQuery(
    "q52_grouping_sets",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"),
          grouping(col("o_orderstatus")).as("g_status"),
          grouping(col("o_orderpriority")).as("g_priority"))
        .orderBy(col("g_status"), col("g_priority"),
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },
    Some("""SELECT o_orderstatus, o_orderpriority,
      count(*) AS orders, round(sum(o_totalprice),2) AS revenue,
      CAST(grouping(o_orderstatus) AS TINYINT) AS g_status,
      CAST(grouping(o_orderpriority) AS TINYINT) AS g_priority
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      ORDER BY g_status, g_priority,
        o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""))

  /** Distribution-rank window family — ntile / percent_rank / cume_dist
    * (§2.5 full window surface). The window order carries a unique
    * tie-break (acctbal, custkey): ntile splits TIED values by physical
    * row order, so without the tie-break bucket membership is
    * nondeterministic across engines and runs. */
  val q53NtileFamily = GraftQuery(
    "q53_ntile_family",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_mktsegment"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .groupBy(col("c_mktsegment"), col("quartile"))
        .agg(
          count(lit(1)).as("customers"),
          round(avg(col("pr")), 6).as("avg_percent_rank"),
          round(max(col("cd")), 6).as("max_cume_dist"))
        .orderBy(col("c_mktsegment"), col("quartile"))
    },
    Some("""SELECT c_mktsegment, quartile, count(*) AS customers,
      round(avg(pr),6) AS avg_percent_rank,
      round(max(cd),6) AS max_cume_dist
      FROM (SELECT c_mktsegment,
        ntile(4) OVER w AS quartile,
        percent_rank() OVER w AS pr,
        cume_dist() OVER w AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)) t
      GROUP BY c_mktsegment, quartile ORDER BY c_mktsegment, quartile"""))

  /** Bivariate statistical aggregates — corr / covar_samp / stddev_samp /
    * var_samp (§2.4 A5's heavy cousins). All are single-pass mergeable
    * moment sketches: one partial state per partition, one tiny shuffle —
    * the same scale shape as AVG. */
  val q54StatAggs = GraftQuery(
    "q54_stat_aggs",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qty_price"),
          round(stddev_samp(col("l_discount")), 6).as("stddev_discount"),
          round(var_samp(col("l_tax")), 6).as("var_tax"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      round(corr(l_quantity, l_extendedprice),6) AS corr_qty_price,
      round(covar_samp(l_quantity, l_extendedprice),2) AS covar_qty_price,
      round(stddev_samp(l_discount),6) AS stddev_discount,
      round(var_samp(l_tax),6) AS var_tax
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Null-safe equality join (<=> / IS NOT DISTINCT FROM) — completes the
    * join predicate surface (§2.3): NULL keys pair with NULL keys instead
    * of dropping out, still a hash-partitionable equi-join (NULL hashes
    * like any key under null-safe semantics). */
  val q59NullsafeJoin = GraftQuery(
    "q59_nullsafe_join",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      // nullif folds one flag value to NULL on both sides, so the
      // null-safe match set is observable in the output
      val lo = li.filter(col("l_quantity") < 10)
        .groupBy(nullif(col("l_returnflag"), lit("R")).as("k"))
        .agg(count(lit(1)).as("n_small"))
      val hi = li.filter(col("l_quantity") >= 40)
        .groupBy(nullif(col("l_returnflag"), lit("R")).as("k2"))
        .agg(count(lit(1)).as("n_large"))
      lo.join(hi, col("k") <=> col("k2"))
        .select(col("k"), col("n_small"), col("n_large"))
        .orderBy(col("k").asc_nulls_first)
    },
    Some("""SELECT a.k, n_small, n_large
      FROM (SELECT nullif(l_returnflag, 'R') AS k, count(*) AS n_small
            FROM lineitem WHERE l_quantity < 10 GROUP BY 1) a
      JOIN (SELECT nullif(l_returnflag, 'R') AS k, count(*) AS n_large
            FROM lineitem WHERE l_quantity >= 40 GROUP BY 1) b
        ON a.k IS NOT DISTINCT FROM b.k
      ORDER BY a.k ASC NULLS FIRST"""))

  /** Approximate heavy hitters (df.stat.freqItems — single-pass
    * Karp/Papadimitriou/Shenker) checked by CONTRACT, like q03b: the
    * algorithm guarantees every item with frequency > support·n appears
    * in the result, so the oracle asserts the exact heavy-hitter count
    * and that containment boolean — stable across engines even though
    * the sketch's false positives are not. */
  val q66FreqItems = GraftQuery(
    "q66_freq_items", { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val fi = li.stat.freqItems(Seq("l_returnflag"), 0.1)
        .select(col("l_returnflag_freqItems").as("fi"))
      val total = li.agg(count(lit(1)).as("total"))
      li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .crossJoin(total).crossJoin(fi)
        .filter(col("n") > col("total") * 0.1)
        .agg(
          count(lit(1)).as("heavy_hitters"),
          // coalesce: bool_and over ZERO heavy hitters is NULL, while the
          // oracle's vacuous-truth TRUE is the right answer for "every
          // heavy hitter was found"
          coalesce(expr("bool_and(array_contains(fi, l_returnflag))"), lit(true))
            .as("all_found"))
    },
    Some("""SELECT count(*) AS heavy_hitters, TRUE AS all_found
      FROM (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1) g
      WHERE n > (SELECT count(*) FROM lineitem) * 0.1"""))

  /** Count-min sketch frequency estimation, checked by CONTRACT like
    * q03b/q66: a CMS never under-counts, and its overestimate stays
    * within eps·n with probability ≥ confidence (seed fixed, so the
    * realized sketch is deterministic and the booleans are stable).
    * The sketch itself is MODEL-sized driver state — width 2e/eps ×
    * depth ln(1/(1-conf)) counters regardless of data volume — built by
    * merging per-partition sketches, which is exactly how a 100 TB
    * frequency pass runs: one narrow scan, counters merged at the
    * driver, no per-key shuffle at all. The exact per-key counts the
    * contract compares against are the same single-shuffle aggregate
    * the oracle recomputes. */
  val q88CountMin = GraftQuery(
    "q88_count_min", { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val sketch = li.stat.countMinSketch(
        col("l_returnflag"), eps = 0.01, confidence = 0.999, seed = 42)
      val est = typedLit(Seq("A", "N", "R")
        .map(f => f -> sketch.estimateCount(f)).toMap)
      li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_exact"))
        .withColumn("est", element_at(est, col("l_returnflag")))
        .crossJoin(li.agg(count(lit(1)).as("total")))
        // inner coalesce(..., false): a key OUTSIDE the probed list maps
        // to a NULL estimate, and bool_and would silently SKIP it —
        // fail the contract loudly instead of vacuously passing
        .agg(
          count(lit(1)).as("keys"),
          coalesce(expr("bool_and(coalesce(est >= n_exact, false))"), lit(true))
            .as("never_undercounts"),
          coalesce(expr("bool_and(coalesce(est <= n_exact + 0.01 * total, false))"),
            lit(true)).as("within_eps_bound"))
    },
    Some("""SELECT count(*) AS keys, TRUE AS never_undercounts,
      TRUE AS within_eps_bound
      FROM (SELECT l_returnflag FROM lineitem GROUP BY 1) g"""))

  /** Seeded sampling by CONTRACT: Bernoulli sample counts concentrate
    * around fraction·n (bound here is ±5σ-wide), and stratified sampleBy
    * must respect per-stratum fractions. The sampled row SETS are
    * engine-specific (seeded PRNG), so — as with every sketch — the
    * oracle checks the statistical contract plus the exact input-side
    * numbers, not the sampled identities. */
  val q67SamplingContract = GraftQuery(
    "q67_sampling_contract", { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val sample = li.sample(withReplacement = false, fraction = 0.1, seed = 42)
      val strata = li.stat.sampleBy("l_returnflag",
        Map("A" -> 0.05, "N" -> 0.2, "R" -> 0.1), seed = 42)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("s_n"))
      val perFlag = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val fractions = typedLit(Map("A" -> 0.05, "N" -> 0.2, "R" -> 0.1))
      val strataOk = perFlag.join(strata, Seq("l_returnflag"))
        .withColumn("f", element_at(fractions, col("l_returnflag")))
        // ±5 binomial standard deviations around f·n
        .withColumn("tol", lit(5.0) * sqrt(col("n") * col("f") * (lit(1.0) - col("f"))))
        .agg(expr("bool_and(abs(s_n - n * f) <= tol)").as("strata_ok"))
      li.agg(count(lit(1)).as("total_rows"))
        .crossJoin(sample.agg(count(lit(1)).as("sn")))
        .crossJoin(strataOk)
        .select(col("total_rows"),
          (abs(col("sn") - col("total_rows") * 0.1) <=
            lit(5.0) * sqrt(col("total_rows") * 0.1 * 0.9)).as("sample_within_5sigma"),
          col("strata_ok"))
    },
    Some("""SELECT count(*) AS total_rows, TRUE AS sample_within_5sigma,
      TRUE AS strata_ok FROM lineitem"""))

  /** Calendar time series: monthly revenue with LAG month-over-month
    * growth — date_trunc bucketing + an analytic window ordered by time
    * (the reference has no date math; the events/orders surface does). */
  val q68MonthOverMonth = GraftQuery(
    "q68_month_over_month",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM")
          .as("month"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("orders"))
        .withColumn("prev_revenue",
          lag(col("revenue"), 1).over(Window.orderBy(col("month"))))
        .withColumn("mom_growth_pct",
          round((col("revenue") - col("prev_revenue")) * 100.0 / col("prev_revenue"), 2))
        .orderBy(col("month")),
    Some("""SELECT month, revenue, orders,
      lag(revenue) OVER (ORDER BY month) AS prev_revenue,
      round((revenue - lag(revenue) OVER (ORDER BY month)) * 100.0 /
        lag(revenue) OVER (ORDER BY month), 2) AS mom_growth_pct
      FROM (SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
              round(sum(o_totalprice), 2) AS revenue, count(*) AS orders
            FROM orders GROUP BY 1) m
      ORDER BY month"""))

  /** Unpivot/melt — the inverse of q49's pivot (wide metric columns →
    * long (metric, value) rows). Catalyst plans Expand: rows × |values|
    * BEFORE the shuffle, same scale note as GROUPING SETS. */
  val q71Unpivot = GraftQuery(
    "q71_unpivot",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(sum(col("l_quantity")), 2).as("quantity"),
          round(sum(col("l_discount")), 2).as("discount"),
          round(sum(col("l_tax")), 2).as("tax"))
        .unpivot(
          ids = Array(col("l_returnflag")),
          values = Array(col("quantity"), col("discount"), col("tax")),
          variableColumnName = "metric",
          valueColumnName = "total")
        .orderBy(col("l_returnflag"), col("metric")),
    Some("""WITH agg AS (
        SELECT l_returnflag,
          round(sum(l_quantity), 2) AS quantity,
          round(sum(l_discount), 2) AS discount,
          round(sum(l_tax), 2) AS tax
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, metric, total FROM (
        SELECT l_returnflag, 'quantity' AS metric, quantity AS total FROM agg
        UNION ALL
        SELECT l_returnflag, 'discount', discount FROM agg
        UNION ALL
        SELECT l_returnflag, 'tax', tax FROM agg) u
      ORDER BY l_returnflag, metric"""))

  /** Grouped approximate percentile — the per-key form of q04b: one
    * constant-size sketch per (group, partition) instead of a per-group
    * sort, the only viable grouped-percentile shape at 100 TB. Contract:
    * approx_percentile's RANK error is ≤ max(1, n/accuracy), so the
    * returned value must lie within the exact [p45, p55] value band for
    * any group of ≥ ~30 rows — a rank-based bound that holds at every
    * scale factor, unlike a relative-VALUE tolerance (the approx result
    * is an actual data point; exact percentile interpolates, and at
    * small n the gap between adjacent points can exceed any fixed
    * relative epsilon). */
  val q04cGroupedApproxPercentile = GraftQuery(
    "q04c_grouped_approx_pct", { (s, dir) =>
      val exact = expr("percentile(o_totalprice, 0.5)")
      val lo = expr("percentile(o_totalprice, 0.45)")
      val hi = expr("percentile(o_totalprice, 0.55)")
      val approx = expr("approx_percentile(o_totalprice, 0.5, 10000)")
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(exact, 2).as("exact_median"),
          approx.between(lo, hi).as("approx_in_rank_band"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n,
      round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 2)
        AS exact_median,
      TRUE AS approx_in_rank_band
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Blocked fuzzy string join — the record-linkage / data-cleaning
    * primitive: DISTINCT part names pair when edit distance ≤ 3, with a
    * first-character blocking key so the pair space is per-block, never
    * all-pairs (the same block-then-verify shape as every dedup
    * operator; at scale the block key would be a phonetic/prefix bucket).
    * Threshold 3 on these two-word names pairs same-noun/adjacent-
    * adjective variants; both engines implement classic Levenshtein, so
    * the oracle matches exactly. */
  val q72FuzzyJoin = GraftQuery(
    "q72_fuzzy_join", { (s, dir) =>
      val names = t(s, dir, "part").select(col("p_name").as("n")).distinct()
        .withColumn("blk", substring(col("n"), 1, 1))
      val a = names.select(col("blk"), col("n").as("name_a"))
      val b = names.select(col("blk"), col("n").as("name_b"))
      a.join(b, Seq("blk"))
        .filter(col("name_a") < col("name_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .filter(col("dist") <= 3)
        .select(col("name_a"), col("name_b"), col("dist"))
        .orderBy(col("name_a"), col("name_b"))
    },
    Some("""SELECT a.n AS name_a, b.n AS name_b,
        levenshtein(a.n, b.n) AS dist
      FROM (SELECT DISTINCT p_name AS n FROM part) a
      JOIN (SELECT DISTINCT p_name AS n FROM part) b
        ON substr(a.n, 1, 1) = substr(b.n, 1, 1) AND a.n < b.n
      WHERE levenshtein(a.n, b.n) <= 3
      ORDER BY name_a, name_b"""))

  /** Percent-of-parent over a hierarchy: each nation's share of its
    * region's customers, computed with a window OVER the joined base (no
    * second scan, no self-join — the share divisor is a partitioned
    * window sum). */
  val q77PercentOfParent = GraftQuery(
    "q77_percent_of_parent",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      val base = cust
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("customers"))
      base
        .withColumn("region_total",
          sum(col("customers")).over(Window.partitionBy(col("r_name"))))
        .select(col("r_name"), col("n_name"), col("customers"),
          round(col("customers") * 100.0 / col("region_total"), 2)
            .as("pct_of_region"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""SELECT r_name, n_name, customers,
      round(customers * 100.0 / sum(customers) OVER (PARTITION BY r_name), 2)
        AS pct_of_region
      FROM (SELECT r_name, n_name, count(*) AS customers
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name) b
      ORDER BY r_name, n_name"""))

  /** Array aggregation with a deterministic serialization: the distinct
    * order statuses per priority as a sorted, comma-joined string.
    * collect_set order is nondeterministic by contract — sort_array +
    * concat_ws is what makes an array aggregate comparable across runs
    * AND engines (an array CELL would also break hash-based result
    * comparison; the r2 ML-metrics row taught that lesson). */
  val q78ArrayAgg = GraftQuery(
    "q78_array_agg",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          concat_ws(",", sort_array(collect_set(col("o_orderstatus"))))
            .as("statuses"),
          countDistinct(col("o_orderstatus")).as("n_statuses"))
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority,
      array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
      count(DISTINCT o_orderstatus) AS n_statuses
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** MERGE/upsert semantics without a transactional table format: the
    * relational result of MERGE (update matched, insert unmatched) is a
    * full-outer join + coalesce — the pattern a foreachBatch sink or a
    * dynamic-partition overwrite applies physically. Updates here bump
    * matched customers' balances; inserts arrive with fresh keys. */
  val q79MergeUpsert = GraftQuery(
    "q79_merge_upsert",
    (s, dir) => {
      val target = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      // deterministic change batch: +100 for every 10th customer
      // (updates) plus re-keyed copies beyond the key space (inserts)
      val updates = target.filter(col("k") % 10 === 0)
        .select(col("k"), (col("bal") + 100.0).as("new_bal"))
      val inserts = target.filter(col("k") % 10 === 1)
        .select((col("k") + 10000000L).as("k"), col("bal").as("new_bal"))
      val batch = updates.union(inserts)
      val merged = target.join(batch, Seq("k"), "full_outer")
        .select(col("k"), coalesce(col("new_bal"), col("bal")).as("bal"))
      merged.agg(
        count(lit(1)).as("rows_after_merge"),
        round(sum(col("bal")), 2).as("total_balance"),
        count(when(col("k") >= 10000000L, 1)).as("inserted"))
    },
    Some("""WITH target AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer),
      batch AS (
        SELECT k, bal + 100.0 AS new_bal FROM target WHERE k % 10 = 0
        UNION ALL
        SELECT k + 10000000, bal FROM target WHERE k % 10 = 1),
      merged AS (
        SELECT coalesce(t.k, b.k) AS k, coalesce(b.new_bal, t.bal) AS bal
        FROM target t FULL OUTER JOIN batch b ON t.k = b.k)
      SELECT count(*) AS rows_after_merge,
        round(sum(bal), 2) AS total_balance,
        count(CASE WHEN k >= 10000000 THEN 1 END) AS inserted
      FROM merged"""))

  /** Partition-scoped twin of q79 — the batch MERGE run against REAL
    * storage with the scale-path write: the target is materialized as a
    * hash-partitioned managed table, the change batch's bucket ids
    * become a planning-time partition predicate (same pruning contract
    * PlanSpec asserts for the streaming sink's merge), the full-outer
    * coalesce-MERGE runs only over the touched buckets, and dynamic
    * partition overwrite rewrites exactly those buckets. The read-back
    * aggregate equals q79's pure-plan answer, so the oracle is q79's —
    * which checks the END STATE ON DISK, not just the merge expression.
    * Per-batch cost O(touched partitions), not O(table): the batch form
    * of the q87b argument (EventPipeline.runPartitionedUpsertSinkFromDir
    * carries the full 100 TB rationale). */
  val q79bMergePartitioned = GraftQuery(
    "q79b_merge_upsert_partitioned", { (s, dir) =>
      val buckets = 16
      val table =
        s"merge_part_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      def bucketed(df: DataFrame): DataFrame =
        df.withColumn("__bucket",
          graft.core.Bucketing.bucketExpr(col("k"), buckets))
      val target = bucketed(t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal")))
      graft.core.Bucketing.writePartitioned(target, table, "__bucket")
      try {
        val base = t(s, dir, "customer")
          .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
        val updates = base.filter(col("k") % 10 === 0)
          .select(col("k"), (col("bal") + 100.0).as("new_bal"))
        val inserts = base.filter(col("k") % 10 === 1)
          .select((col("k") + 10000000L).as("k"), col("bal").as("new_bal"))
        val batch = bucketed(updates.union(inserts))
        // partition METADATA, not data: ≤ buckets ids (see
        // EventPipeline.partitionedMergeFrame for why a literal IN, not
        // a semi-join, is what actually prunes the scan)
        val touched = batch.select(col("__bucket")).distinct()
          .collect().map(_.getLong(0)).toIndexedSeq
        val current = s.table(table).filter(col("__bucket").isin(touched: _*))
        // joining on (__bucket, k) keeps one partition column through the
        // full outer; __bucket is a function of k so the pairs agree
        val merged = current.join(batch, Seq("__bucket", "k"), "full_outer")
          .select(col("k"), coalesce(col("new_bal"), col("bal")).as("bal"),
            col("__bucket"))
          .localCheckpoint(eager = true) // insertInto must not read its target
        graft.core.Bucketing.overwritePartitions(merged, table)
        s.table(table).agg(
            count(lit(1)).as("rows_after_merge"),
            round(sum(col("bal")), 2).as("total_balance"),
            count(when(col("k") >= 10000000L, 1)).as("inserted"))
          .localCheckpoint(eager = true)
      } finally s.sql(s"DROP TABLE IF EXISTS $table")
    },
    q79MergeUpsert.oracle)

  /** Latest-record-per-key compaction — the upsert-log collapse every
    * CDC pipeline runs: row_number() DESC over (key, time) keeps exactly
    * the newest version. Demonstrated on the doubled order stream where
    * the later copy carries a bumped price. */
  val q80LatestPerKey = GraftQuery(
    "q80_latest_per_key",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"),
          col("o_orderdate").as("ver_ts"))
      val versions = o.union(
        o.select(col("k"), (col("p") + 1.0).as("p"),
          (col("ver_ts") + expr("INTERVAL 1 DAY")).as("ver_ts")))
      val w = Window.partitionBy(col("k"))
        .orderBy(col("ver_ts").desc, col("p").desc)
      versions.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .agg(count(lit(1)).as("live_rows"),
          round(sum(col("p")), 2).as("live_total"),
          round(avg(col("p")), 2).as("live_avg"))
    },
    Some("""WITH versions AS (
        SELECT o_orderkey AS k, o_totalprice AS p, o_orderdate AS ver_ts FROM orders
        UNION ALL
        SELECT o_orderkey, o_totalprice + 1.0, o_orderdate + INTERVAL 1 DAY FROM orders),
      latest AS (
        SELECT * FROM versions
        QUALIFY row_number() OVER (PARTITION BY k ORDER BY ver_ts DESC, p DESC) = 1)
      SELECT count(*) AS live_rows, round(sum(p), 2) AS live_total,
        round(avg(p), 2) AS live_avg
      FROM latest"""))

  /** Latest event per user — the snapshot the versioned-table CDC
    * queries publish (shared by q102/q103 so their two versions can
    * never drift from the oracle's CTEs). */
  private def latestPerUser(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  private def dropVersioned(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP VIEW IF EXISTS $table")
    graft.core.TableStore.listVersions(s, table)
      .foreach(v => s.sql(s"DROP TABLE IF EXISTS ${table}__v$v"))
  }

  /** Change-data-feed read between two PUBLISHED versions of a
    * versioned table (TableStore.tableChanges), oracle-checked row for
    * row: v1 = latest event per user over the even half of the stream,
    * v2 = latest per user over the full stream minus every user_id
    * divisible by 7 (a deletion wave), so the diff exercises all four
    * change types — insert (users appearing in the odd half), delete
    * (the mod-7 users), and update pre/post images (users whose latest
    * event moved). The oracle re-derives the diff as a FULL OUTER JOIN
    * of the two snapshot CTEs with struct-level IS DISTINCT FROM —
    * an independent formulation of the same change relation. Scale
    * shape: one full-outer hash join on the key; change volume, not
    * table volume, flows to the consumer. */
  val q102VersionChanges = GraftQuery(
    "q102_version_changes", { (s, dir) =>
      val ev = t(s, dir, "events")
      val table =
        s"cdc_src_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      try {
        val v1 = graft.core.TableStore.publishVersioned(s, table,
          latestPerUser(ev.filter(col("event_id") % 2 === 0)))
        val v2 = graft.core.TableStore.publishVersioned(s, table,
          latestPerUser(ev.filter(col("user_id") % 7 =!= 0)))
        graft.core.TableStore.tableChanges(s, table, v1, v2, Seq("user_id"))
          .select(col("user_id"), col("event_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
            col("event_type"), col("value"), col("props"), col("_change_type"))
          .orderBy(col("user_id"), col("_change_type"))
          .localCheckpoint(eager = true)
      } finally dropVersioned(s, table)
    },
    Some("""WITH v1 AS (
        SELECT event_id, ts, user_id, event_type, value, props
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) AS rn
              FROM events WHERE event_id % 2 = 0) WHERE rn = 1),
      v2 AS (
        SELECT event_id, ts, user_id, event_type, value, props
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) AS rn
              FROM events WHERE user_id % 7 <> 0) WHERE rn = 1),
      j AS (
        SELECT a.user_id AS pre_uid, b.user_id AS post_uid,
          a.event_id AS pre_eid, a.ts AS pre_ts, a.event_type AS pre_et,
          a.value AS pre_v, a.props AS pre_p,
          b.event_id AS post_eid, b.ts AS post_ts, b.event_type AS post_et,
          b.value AS post_v, b.props AS post_p
        FROM v1 a FULL OUTER JOIN v2 b ON a.user_id = b.user_id),
      changed AS (
        SELECT * FROM j
        WHERE pre_uid IS NOT NULL AND post_uid IS NOT NULL
          AND struct_pack(e := pre_eid, t := pre_ts, et := pre_et,
                v := pre_v, p := pre_p)
            IS DISTINCT FROM
              struct_pack(e := post_eid, t := post_ts, et := post_et,
                v := post_v, p := post_p))
      SELECT post_uid AS user_id, post_eid AS event_id,
        strftime(post_ts, '%Y-%m-%d %H:%M:%S') AS ts,
        post_et AS event_type, post_v AS value, post_p AS props,
        'insert' AS _change_type
      FROM j WHERE pre_uid IS NULL AND post_uid IS NOT NULL
      UNION ALL
      SELECT pre_uid, pre_eid, strftime(pre_ts, '%Y-%m-%d %H:%M:%S'),
        pre_et, pre_v, pre_p, 'delete'
      FROM j WHERE post_uid IS NULL AND pre_uid IS NOT NULL
      UNION ALL
      SELECT pre_uid, pre_eid, strftime(pre_ts, '%Y-%m-%d %H:%M:%S'),
        pre_et, pre_v, pre_p, 'update_preimage' FROM changed
      UNION ALL
      SELECT post_uid, post_eid, strftime(post_ts, '%Y-%m-%d %H:%M:%S'),
        post_et, post_v, post_p, 'update_postimage' FROM changed
      ORDER BY user_id, _change_type"""))

  /** Incremental materialized-view refresh driven by the CDC feed —
    * the loop q102's change relation exists to close: publish v1,
    * compute its per-event-type aggregate (count + sum, the additive
    * surface), publish v2, and REFRESH the aggregate from
    * tableChanges(v1→v2) alone — O(changes), the base is never
    * re-scanned. The oracle computes the aggregate DIRECTLY over the
    * v2 snapshot definition, so an exact match proves refreshed ≡
    * recomputed, including groups that emptied out (a deleted wave's
    * event types) and groups a key MOVED BETWEEN (an update whose
    * event_type changed contributes −pre to one group and +post to
    * another). */
  val q103IncrementalAgg = GraftQuery(
    "q103_incremental_agg", { (s, dir) =>
      val ev = t(s, dir, "events")
      val table =
        s"cdc_agg_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      try {
        val v1 = graft.core.TableStore.publishVersioned(s, table,
          latestPerUser(ev.filter(col("event_id") % 2 === 0)))
        val base = graft.ops.Incremental.baseAggregate(
          graft.core.TableStore.readVersion(s, table, v1),
          Seq("event_type"), Seq("value"))
        val v2 = graft.core.TableStore.publishVersioned(s, table,
          latestPerUser(ev.filter(col("user_id") % 7 =!= 0)))
        val changes = graft.core.TableStore.tableChanges(
          s, table, v1, v2, Seq("user_id"))
        graft.ops.Incremental.applyChanges(
            base, changes, Seq("event_type"), Seq("value"))
          .select(col("event_type"), col("__cnt").as("users"),
            round(col("sum_value"), 2).as("sum_value"))
          .orderBy(col("event_type"))
          .localCheckpoint(eager = true)
      } finally dropVersioned(s, table)
    },
    Some("""SELECT event_type, count(*) AS users,
        round(sum(value), 2) AS sum_value
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE user_id % 7 <> 0) t
      WHERE rn = 1
      GROUP BY event_type ORDER BY event_type"""))

  /** max_by / min_by — the arg-max aggregate surface (per group, the
    * VALUE of one column at the extremum of another): each priority's
    * most and least expensive order ids, with a totalprice+orderkey
    * tie-break encoded in a struct so both engines resolve identically. */
  val q81ArgMax = GraftQuery(
    "q81_argmax",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))")
            .as("priciest_order"),
          expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))")
            .as("cheapest_order"),
          round(max(col("o_totalprice")), 2).as("max_price"))
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority,
      max(CASE WHEN rn_hi = 1 THEN o_orderkey END) AS priciest_order,
      max(CASE WHEN rn_lo = 1 THEN o_orderkey END) AS cheapest_order,
      round(max(o_totalprice), 2) AS max_price
      FROM (SELECT *,
        row_number() OVER (PARTITION BY o_orderpriority
          ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_hi,
        row_number() OVER (PARTITION BY o_orderpriority
          ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn_lo
        FROM orders) r
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** rank vs dense_rank vs row_number tie semantics in one query: the
    * balance BAND (coarsened to force ties) ranks customers per segment;
    * rank=1 keeps every tied leader, row_number picks exactly one,
    * dense_rank compresses the gap — the distinction that decides
    * whether a "top" query returns co-leaders or an arbitrary winner. */
  val q82RankTies = GraftQuery(
    "q82_rank_ties",
    (s, dir) => {
      val banded = t(s, dir, "customer")
        .withColumn("band", floor(col("c_acctbal") / 1000.0))
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("band").desc)
      val wStable = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("band").desc, col("c_custkey"))
      banded
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("rn", row_number().over(wStable))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(when(col("rnk") === 1, 1)).as("tied_leaders"),
          count(when(col("rn") === 1, 1)).as("row_number_picks"),
          max(col("drnk")).as("distinct_bands"),
          max(col("band")).as("top_band"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment,
      count(CASE WHEN rnk = 1 THEN 1 END) AS tied_leaders,
      count(CASE WHEN rn = 1 THEN 1 END) AS row_number_picks,
      max(drnk) AS distinct_bands,
      CAST(max(band) AS BIGINT) AS top_band
      FROM (SELECT c_mktsegment, band,
        rank() OVER (PARTITION BY c_mktsegment ORDER BY band DESC) AS rnk,
        dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY band DESC) AS drnk,
        row_number() OVER (PARTITION BY c_mktsegment
          ORDER BY band DESC, c_custkey) AS rn
        FROM (SELECT *, floor(c_acctbal / 1000.0) AS band FROM customer) b) r
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Correlated EXISTS / NOT EXISTS through the SQL front door —
    * Catalyst decorrelates both into semi/anti joins (no per-row
    * subquery execution), the rewrite that makes correlated predicates
    * viable at scale. Per segment: customers with an urgent order but no
    * F-status order. */
  val q83CorrelatedExists = GraftQuery(
    "q83_correlated_exists", { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""SELECT c_mktsegment,
        count(*) AS urgent_only_customers
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    },
    Some("""SELECT c_mktsegment, count(*) AS urgent_only_customers
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderstatus = 'F')
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Correlated LATERAL subquery with per-row top-k (SQL front door):
    * the two highest-balance customers of every nation. Catalyst
    * DECORRELATES the lateral limit into a partitioned rank filter —
    * one hash exchange on the correlation key and a window top-k, not a
    * nested-loop per outer row — which is the only execution that
    * survives a 100 TB outer side. c_custkey tie-breaks both the LIMIT
    * frontier and the final order so the result is deterministic. */
  val q95LateralTopK = GraftQuery(
    "q95_lateral_topk", { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""SELECT n.n_name, c.c_custkey, c.c_name, c.c_acctbal
        FROM nation n,
        LATERAL (SELECT c_custkey, c_name, c_acctbal FROM customer
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        ORDER BY n.n_name, c.c_acctbal DESC, c.c_custkey""")
    },
    Some("""SELECT n.n_name, c.c_custkey, c.c_name, c.c_acctbal
      FROM nation n,
      LATERAL (SELECT c_custkey, c_name, c_acctbal FROM customer
               WHERE c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
      ORDER BY n.n_name, c.c_acctbal DESC, c.c_custkey"""))

  /** Recursive CTE (WITH RECURSIVE, new engine surface in Spark 4):
    * generate a 60-day calendar scaffold from the first order date and
    * left-join daily order counts onto it — the standard gap-filling
    * shape for time series, where missing days must surface as explicit
    * zero rows, which no plain GROUP BY can produce. The recursion
    * carries a bounded step counter (no subquery in the recursive term,
    * guaranteed termination); Spark executes it as an iterative
    * UnionLoop whose result is a 60-row dimension — broadcast-sized by
    * construction, so the scaffold join is never the scale risk; the
    * fact side aggregates before the join. */
  val q96RecursiveCalendar = GraftQuery(
    "q96_recursive_calendar", { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""WITH RECURSIVE days(d, i) AS (
        SELECT min(o_orderdate), 0 FROM orders
        UNION ALL
        SELECT d + INTERVAL '1' DAY, i + 1 FROM days WHERE i < 59)
      SELECT date_format(d.d, 'yyyy-MM-dd') AS day,
        coalesce(o.n, 0L) AS n_orders
      FROM days d LEFT JOIN (
        SELECT o_orderdate, count(*) AS n FROM orders GROUP BY 1) o
      ON o.o_orderdate = d.d
      ORDER BY day""")
    },
    Some("""WITH RECURSIVE days(d, i) AS (
        SELECT min(o_orderdate), 0 FROM orders
        UNION ALL
        SELECT d + INTERVAL 1 DAY, i + 1 FROM days WHERE i < 59)
      SELECT strftime(d.d, '%Y-%m-%d') AS day, coalesce(o.n, 0) AS n_orders
      FROM days d LEFT JOIN (
        SELECT o_orderdate, count(*) AS n FROM orders GROUP BY 1) o
      ON o.o_orderdate = d.d
      ORDER BY day"""))

  /** MapType surface: per-customer status→count maps built with
    * map_from_entries over a SORTED entry list (collect_list order is
    * nondeterministic under parallel merge; sort_array restores a
    * canonical entry order), then inverted with explode(map) and
    * re-aggregated. The final aggregate equals the direct flat GROUP BY,
    * which is exactly what the oracle checks — the map construct/explode
    * round trip must be lossless. Maps stay bounded (≤ #statuses entries
    * per key), so no per-key state grows with data size. */
  val q97MapRoundtrip = GraftQuery(
    "q97_map_roundtrip", { (s, dir) =>
      val perCust = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val mapped = perCust.groupBy(col("o_custkey"))
        .agg(map_from_entries(sort_array(
          collect_list(struct(col("o_orderstatus"), col("n"))))).as("m"))
      mapped
        .select(col("o_custkey"), explode(col("m")).as(Seq("status", "n")))
        .groupBy(col("status"))
        .agg(
          countDistinct(col("o_custkey")).as("customers"),
          sum(col("n")).as("orders"))
        .orderBy(col("status"))
    },
    Some("""SELECT o_orderstatus AS status,
      count(DISTINCT o_custkey) AS customers, count(*) AS orders
      FROM orders GROUP BY 1 ORDER BY status"""))

  /** CUBE over (status, priority) — completes the multi-dimensional
    * aggregate family beside rollup (q19) and explicit GROUPING SETS
    * (q52): cube emits all 2^d subtotal combinations through the same
    * single Expand + one shuffle (§2.4 note "engine ships cube/rollup/
    * GROUPING SETS"). Same scale posture as q52: the Expand multiplies
    * input rows by 2^d BEFORE the exchange, so prune dimensions, not
    * output rows. grouping() markers disambiguate a NULL data value from
    * a subtotal row. */
  val q84Cube = GraftQuery(
    "q84_cube",
    (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"),
          grouping(col("o_orderstatus")).as("g_status"),
          grouping(col("o_orderpriority")).as("g_priority"))
        .orderBy(col("g_status"), col("g_priority"),
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
    Some("""SELECT o_orderstatus, o_orderpriority,
      count(*) AS orders, round(sum(o_totalprice),2) AS revenue,
      CAST(grouping(o_orderstatus) AS TINYINT) AS g_status,
      CAST(grouping(o_orderpriority) AS TINYINT) AS g_priority
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY g_status, g_priority,
        o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""))

  /** Log-stats file pruning through the Delta interchange layer
    * (oracle-EXACT, including the fact that pruning HAPPENED): write
    * the documents table as a range-clustered Delta table (4 files,
    * per-file min/max/nullCount in each add's `stats` blob), then
    * answer a doc_id band query planned from the LOG ALONE —
    * `readDeltaTablePruned` picks candidate files off the stats before
    * any parquet footer opens, which is the move that makes Delta
    * planning O(log) instead of O(files-statted) at 100 TB. The band is
    * the lowest quarter of the id range (integer math, re-derived
    * identically in DuckDB), so range clustering must prune at least
    * one file — `pruned` asserts candidates < total THROUGH the oracle
    * gate, and the aggregate proves the skipped files lost no rows.
    * The 1-row min/max collect and the band bounds are driver-side
    * bounded metadata. */
  val q141DeltaPrunedRead = GraftQuery(
    "q141_delta_pruned_read", { (s, dir) =>
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q141_delta").toString
      try {
        graft.core.DeltaExport.writeDeltaTable(
          s, docs.repartitionByRange(4, col("doc_id")), tmp)
        val r = docs.agg(min(col("doc_id")), max(col("doc_id")))
          .collect().head // bounded: one row of band metadata
        val (lo, hi) = (r.getLong(0), r.getLong(0) +
          (r.getLong(1) - r.getLong(0)) / 4)
        val (band, cand, total) = graft.core.DeltaExport
          .readDeltaTablePruned(s, tmp, "doc_id", lo.toDouble, hi.toDouble)
        band.agg(
            count(lit(1)).as("rows"),
            sum(col("n_chars")).as("total_chars"),
            countDistinct(col("source")).as("sources"))
          .withColumn("pruned", lit(cand < total))
          .localCheckpoint(eager = true)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    },
    Some("""WITH band AS (
        SELECT min(doc_id) AS lo,
          min(doc_id) + (max(doc_id) - min(doc_id)) // 4 AS hi
        FROM documents)
      SELECT count(*) AS rows, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        count(DISTINCT source) AS sources, TRUE AS pruned
      FROM documents, band WHERE doc_id BETWEEN lo AND hi"""))

  /** PARTITIONED Delta table end to end, oracle-EXACT including the
    * fact that partition pruning happened: write documents partitioned
    * by `lang` (Hive layout, add actions carrying partitionValues,
    * metaData naming partitionColumns), append a second wave through
    * the partition-aware appender, then answer a one-language query
    * planned from the LOG ALONE — `readDeltaTablePartitionPruned`
    * selects live files by their logged partitionValues before any file
    * opens, the O(log) planning move a partitioned lake table exists
    * for. The data files do NOT contain the partition column; the
    * reader re-attaches it from the log, so `langs`/`lang_back` prove
    * the re-attachment and the aggregate proves the pruned partitions
    * lost no rows. The oracle replays both waves directly over the raw
    * parquet. */
  val q148DeltaPartitioned = GraftQuery(
    "q148_delta_partitioned", { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q148_delta").toString
      try {
        graft.core.DeltaExport.writeDeltaTablePartitioned(
          s, docs, tmp, Seq("lang"))
        graft.core.DeltaExport.appendDeltaTablePartitioned(
          s, docs.filter(col("lang") === "en")
            .withColumn("doc_id", col("doc_id") + 1000000L), tmp)
        val (en, cand, total) = graft.core.DeltaExport
          .readDeltaTablePartitionPruned(s, tmp, Map("lang" -> "en"))
        en.agg(
            count(lit(1)).as("rows"),
            sum(col("n_chars")).as("total_chars"),
            countDistinct(col("source")).as("sources"),
            countDistinct(col("lang")).as("langs"),
            max(col("lang")).as("lang_back"))
          .withColumn("pruned", lit(cand < total))
          .localCheckpoint(eager = true)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    },
    Some("""WITH en AS (
        SELECT lang, source, n_chars FROM documents WHERE lang = 'en'
        UNION ALL
        SELECT lang, source, n_chars FROM documents WHERE lang = 'en')
      SELECT count(*) AS rows, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        count(DISTINCT source) AS sources, count(DISTINCT lang) AS langs,
        max(lang) AS lang_back, TRUE AS pruned
      FROM en"""))

  /** COPY-ON-WRITE MERGE through the Delta interchange layer,
    * oracle-EXACT including the fact that the rewrite was file-pruned:
    * the customer keyspace lands as a 4-file range-clustered Delta
    * table, and one MERGE batch carries updates (+100 bal) and deletes
    * (every 20th key) confined to the LOWEST quarter of the key range
    * plus out-of-range inserts — so only the low file contains matches
    * and `cow` (touched < live files) must come back true through the
    * hash gate, while the post-merge aggregate proves update/insert/
    * delete semantics row-exactly (the q79 merge family's third member:
    * pure plan → bucketed managed table → transactional file format).
    * DuckDB replays the merge relationally over the raw table. */
  val q149DeltaMerge = GraftQuery(
    "q149_delta_merge", { (s, dir) =>
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q149_delta").toString
      try {
        graft.core.DeltaExport.writeDeltaTable(
          s, base.repartitionByRange(4, col("k")), tmp)
        val r = base.agg(min(col("k")), max(col("k"))).collect().head
        val cut = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 4
        val updates = base.filter(col("k") <= cut && col("k") % 10 === 0)
          .select(col("k"), (col("bal") + 100.0).as("bal"),
            lit(false).as("__delete"))
        val deletes = base.filter(col("k") <= cut && col("k") % 20 === 5)
          .select(col("k"), col("bal"), lit(true).as("__delete"))
        val inserts = base.filter(col("k") % 10 === 1)
          .select((col("k") + 10000000L).as("k"), col("bal"),
            lit(false).as("__delete"))
        graft.core.DeltaExport.mergeDeltaTable(
          s, updates.union(deletes).union(inserts), tmp,
          Seq("k"), deleteCol = Some("__delete"))
        val commit = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(tmp, "_delta_log",
            "00000000000000000001.json")), "UTF-8")
        val touched =
          """"remove":\{""".r.findAllMatchIn(commit).length
        graft.core.DeltaExport.readDeltaTable(s, tmp)
          .agg(count(lit(1)).as("rows_after_merge"),
            round(sum(col("bal")), 2).as("total_balance"),
            count(when(col("k") >= 10000000L, 1)).as("inserted"))
          .withColumn("cow", lit(touched < 4))
          .localCheckpoint(eager = true)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    },
    Some("""WITH base AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer),
      band AS (SELECT min(k) + (max(k) - min(k)) // 4 AS cut FROM base),
      batch AS (
        SELECT k, bal + 100.0 AS bal, FALSE AS del
        FROM base, band WHERE k <= cut AND k % 10 = 0
        UNION ALL
        SELECT k, bal, TRUE FROM base, band WHERE k <= cut AND k % 20 = 5
        UNION ALL
        SELECT k + 10000000, bal, FALSE FROM base WHERE k % 10 = 1),
      merged AS (
        SELECT coalesce(b.k, t.k) AS k,
          coalesce(b.bal, t.bal) AS bal,
          coalesce(b.del, FALSE) AS del
        FROM base t FULL OUTER JOIN batch b ON t.k = b.k)
      SELECT count(*) AS rows_after_merge,
        round(sum(bal), 2) AS total_balance,
        count(CASE WHEN k >= 10000000 THEN 1 END) AS inserted,
        TRUE AS cow
      FROM merged WHERE NOT del"""))

  /** Row-level CDC from the Delta LOG between two versions
    * (oracle-EXACT): replay q149's merge, then classify every change
    * v0 → v1 via [[graft.core.DeltaExport.deltaChangesBetween]] —
    * which reads ONLY the files the merge removed or added (immutable
    * files ⇒ a changed row's file changed), drops the copy-on-write
    * carry-overs (rows the rewrite copied verbatim — a naive
    * added-files read over-reports exactly those), and emits
    * insert/delete/update pre+post images. The oracle recomputes the
    * merge relationally and derives the same classification from the
    * pre/post row states, so a mis-filed row, a phantom carry-over, or
    * a wrong image hash-fails. Balance mass rides the q136
    * integer-micros discipline. */
  val q150DeltaCdc = GraftQuery(
    "q150_delta_cdc", { (s, dir) =>
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q150_delta").toString
      try {
        graft.core.DeltaExport.writeDeltaTable(
          s, base.repartitionByRange(4, col("k")), tmp)
        val r = base.agg(min(col("k")), max(col("k"))).collect().head
        val cut = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 4
        val updates = base.filter(col("k") <= cut && col("k") % 10 === 0)
          .select(col("k"), (col("bal") + 100.0).as("bal"),
            lit(false).as("__delete"))
        val deletes = base.filter(col("k") <= cut && col("k") % 20 === 5)
          .select(col("k"), col("bal"), lit(true).as("__delete"))
        val inserts = base.filter(col("k") % 10 === 1)
          .select((col("k") + 10000000L).as("k"), col("bal"),
            lit(false).as("__delete"))
        graft.core.DeltaExport.mergeDeltaTable(
          s, updates.union(deletes).union(inserts), tmp,
          Seq("k"), deleteCol = Some("__delete"))
        graft.core.DeltaExport.deltaChangesBetween(s, tmp, 0L, 1L, Seq("k"))
          .groupBy(col("_change_type"))
          .agg(count(lit(1)).as("rows"),
            sum(round(col("bal") * 1e6).cast("long")).as("bal_micro"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
          .orderBy(col("_change_type"))
          .localCheckpoint(eager = true)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    },
    Some("""WITH base AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer),
      band AS (SELECT min(k) + (max(k) - min(k)) // 4 AS cut FROM base),
      chg AS (
        SELECT k, bal + 100.0 AS bal, 'update' AS kind
        FROM base, band WHERE k <= cut AND k % 10 = 0
        UNION ALL
        SELECT k, bal, 'delete' FROM base, band WHERE k <= cut AND k % 20 = 5
        UNION ALL
        SELECT k + 10000000, bal, 'insert' FROM base WHERE k % 10 = 1),
      rows AS (
        SELECT k, bal, 'insert' AS _change_type FROM chg WHERE kind = 'insert'
        UNION ALL
        SELECT k, bal, 'delete' FROM base
        WHERE k IN (SELECT k FROM chg WHERE kind = 'delete')
        UNION ALL
        SELECT k, bal, 'update_preimage' FROM base
        WHERE k IN (SELECT k FROM chg WHERE kind = 'update')
        UNION ALL
        SELECT k, bal, 'update_postimage' FROM chg WHERE kind = 'update')
      SELECT _change_type, count(*) AS rows,
        CAST(sum(CAST(round(bal * 1e6) AS BIGINT)) AS BIGINT) AS bal_micro,
        min(k) AS min_k, max(k) AS max_k
      FROM rows GROUP BY _change_type ORDER BY _change_type"""))

  /** Row-level DELETE via DELETION VECTORS, oracle-EXACT including the
    * fact that NO data file moved: the customer keyspace lands as a
    * 4-file range-clustered Delta table, then TWO compounding DV
    * deletes (k % 7 = 3, then k % 11 = 4 — overlapping files, so the
    * second merges positions into the first's vectors) mark rows
    * deleted at O(matched positions) with zero rewrite. `dv_only`
    * (live file set identical before and after, proven from the log)
    * and `travel_rows` (v0 time travel still sees every row) ride
    * THROUGH the hash gate beside the surviving aggregate; the oracle
    * applies both predicates relationally. */
  val q158DeltaDeleteDv = GraftQuery(
    "q158_delta_delete_dv", { (s, dir) =>
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q158_delta").toString
      try {
        graft.core.DeltaExport.writeDeltaTable(
          s, base.repartitionByRange(4, col("k")), tmp)
        val filesBefore = graft.core.DeltaExport
          .liveFilesAt(tmp, None)._2.toSet
        graft.core.DeltaExport.deleteFromDeltaTableDv(
          s, tmp, col("k") % 7 === 3)
        graft.core.DeltaExport.deleteFromDeltaTableDv(
          s, tmp, col("k") % 11 === 4)
        val filesAfter = graft.core.DeltaExport
          .liveFilesAt(tmp, None)._2.toSet
        val travelRows = graft.core.DeltaExport
          .readDeltaTable(s, tmp, Some(0L)).count()
        graft.core.DeltaExport.readDeltaTable(s, tmp)
          .agg(count(lit(1)).as("rows_after_delete"),
            sum(round(col("bal") * 1e2).cast("long")).as("bal_cents"),
            min(col("k")).as("min_k"))
          .withColumn("dv_only", lit(filesAfter == filesBefore))
          .withColumn("travel_rows", lit(travelRows))
          .localCheckpoint(eager = true)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    },
    Some("""SELECT count(*) AS rows_after_delete,
        CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
        min(c_custkey) AS min_k,
        TRUE AS dv_only,
        (SELECT count(*) FROM customer) AS travel_rows
      FROM customer
      WHERE c_custkey % 7 <> 3 AND c_custkey % 11 <> 4"""))

  /** Row-level UPDATE via DELETION VECTORS, oracle-EXACT including the
    * no-rewrite fact: one DV update (+100 bal on k % 13 = 2) masks the
    * old copies in place and appends only the new images —
    * `no_rewrite` pins that every pre-update file is STILL live (the
    * standing table never rewrote) while `travel_unchanged` pins that
    * v0 time travel still reads the original values. The oracle
    * applies the update relationally. */
  val q161DeltaUpdateDv = GraftQuery(
    "q161_delta_update_dv", { (s, dir) =>
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q161_delta").toString
      try {
        graft.core.DeltaExport.writeDeltaTable(
          s, base.repartitionByRange(4, col("k")), tmp)
        val filesBefore = graft.core.DeltaExport
          .liveFilesAt(tmp, None)._2.toSet
        graft.core.DeltaExport.updateDeltaTableDv(
          s, tmp, col("k") % 13 === 2, Map("bal" -> (col("bal") + 100.0)))
        val filesAfter = graft.core.DeltaExport
          .liveFilesAt(tmp, None)._2.toSet
        val travelUnchanged = graft.core.DeltaExport
          .readDeltaTable(s, tmp, Some(0L))
          .agg(sum(round(col("bal") * 1e2).cast("long"))).head().getLong(0)
        graft.core.DeltaExport.readDeltaTable(s, tmp)
          .agg(count(lit(1)).as("rows_after_update"),
            sum(round(col("bal") * 1e2).cast("long")).as("bal_cents"),
            count(when(col("k") % 13 === 2, 1)).as("updated_rows"))
          .withColumn("no_rewrite",
            lit(filesBefore.subsetOf(filesAfter)))
          .withColumn("travel_cents_delta",
            col("bal_cents") - lit(travelUnchanged))
          .localCheckpoint(eager = true)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    },
    Some("""WITH upd AS (
        SELECT c_custkey AS k,
          CASE WHEN c_custkey % 13 = 2 THEN c_acctbal + 100.0
               ELSE c_acctbal END AS bal
        FROM customer)
      SELECT count(*) AS rows_after_update,
        CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
        count(CASE WHEN k % 13 = 2 THEN 1 END) AS updated_rows,
        TRUE AS no_rewrite,
        10000 * count(CASE WHEN k % 13 = 2 THEN 1 END)
          AS travel_cents_delta
      FROM upd"""))

  /** The DELTA LIFECYCLE composition, oracle-EXACT — one row that runs
    * the storage family END TO END where cross-feature bugs
    * (checkpoint × DV × constraints) have historically hidden:
    * write → ADD CONSTRAINT → DV DELETE → DV UPDATE → DV-aware
    * OPTIMIZE → CHECKPOINT → log EXPIRY → retention-0 VACUUM → read.
    * Every lifecycle invariant rides THROUGH the hash gate beside the
    * final aggregate: the constraint survives expiry in the checkpoint
    * metaData (`constraint_survived`) and still refuses a violating
    * append (`constraint_enforced`); the pre-OPTIMIZE snapshot carried
    * vectors and the compaction materialized them (`had_vectors` /
    * `vectors_purged` — the q150-family discipline applied to DV
    * state); the vacuum reclaimed superseded history
    * (`reclaimed_history`) while checkpoint-based time travel to the
    * OPTIMIZE version still reads every surviving row (`travel_rows`).
    * The oracle applies the delete + update relationally. */
  val q163DeltaLifecycle = GraftQuery(
    "q163_delta_lifecycle", { (s, dir) =>
      import s.implicits._
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q163_delta").toString
      try {
        val D = graft.core.DeltaExport
        D.writeDeltaTable(s, base.repartitionByRange(4, col("k")), tmp)
        D.addCheckConstraintDeltaTable(s, tmp, "bal_floor",
          "bal >= -10000.0")
        D.deleteFromDeltaTableDv(s, tmp, col("k") % 7 === 3)
        D.updateDeltaTableDv(s, tmp, col("k") % 9 === 4,
          Map("bal" -> (col("bal") + 50.0)))
        val hadVectors = D.deletionVectorsAt(s, tmp, Some(3L)).nonEmpty
        D.optimizeDeltaTable(s, tmp, targetFiles = 2)
        val vectorsPurged = D.deletionVectorsAt(s, tmp, None).isEmpty
        D.checkpointDeltaTable(s, tmp)
        D.expireLogBefore(tmp)
        val constraintSurvived = D
          .checkConstraintsOf(D.snapshotAt(s, tmp, None)._1)
          .contains("bal_floor")
        val constraintEnforced = scala.util.Try(D.appendDeltaTable(s,
          Seq((-1L, -99999.0)).toDF("k", "bal"), tmp)).isFailure
        val reclaimed = D.vacuumDeltaTable(s, tmp).nonEmpty
        val travelRows = D.readDeltaTable(s, tmp, Some(4L)).count()
        D.readDeltaTable(s, tmp)
          .agg(count(lit(1)).as("rows_after"),
            sum(round(col("bal") * 1e2).cast("long")).as("bal_cents"),
            min(col("k")).as("min_k"))
          .withColumn("constraint_survived", lit(constraintSurvived))
          .withColumn("constraint_enforced", lit(constraintEnforced))
          .withColumn("had_vectors", lit(hadVectors))
          .withColumn("vectors_purged", lit(vectorsPurged))
          .withColumn("reclaimed_history", lit(reclaimed))
          .withColumn("travel_rows", lit(travelRows))
          .localCheckpoint(eager = true)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    },
    Some("""WITH live AS (
        SELECT c_custkey AS k,
          CASE WHEN c_custkey % 9 = 4 THEN c_acctbal + 50.0
               ELSE c_acctbal END AS bal
        FROM customer WHERE c_custkey % 7 <> 3)
      SELECT count(*) AS rows_after,
        CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
        min(k) AS min_k,
        TRUE AS constraint_survived,
        TRUE AS constraint_enforced,
        TRUE AS had_vectors,
        TRUE AS vectors_purged,
        TRUE AS reclaimed_history,
        count(*) AS travel_rows
      FROM live"""))

  /** The CHANGE DATA FEED writer + reader, oracle-EXACT: replay q150's
    * merge on a CDF-ENABLED table (so the commit writes protocol
    * `_change_data` files + cdc actions instead of being re-derived
    * from data files), add a second DV-DELETE commit on the merged
    * state, and read the whole feed back with [[graft.core.DeltaExport
    * .readDeltaCdf]] — grouped per (commit, change type). The oracle
    * recomputes both commits relationally, so a change file holding a
    * carry-over row, a missed insert, or a delete attributed to the
    * wrong commit hash-fails. q150 (the CDC derivation of the SAME
    * merge) is the independent second witness. */
  val q164DeltaCdfFeed = GraftQuery(
    "q164_delta_cdf_feed", { (s, dir) =>
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q164_delta").toString
      try {
        val D = graft.core.DeltaExport
        D.writeDeltaTable(s, base.repartitionByRange(4, col("k")), tmp)
        // CDF arrives on tables created elsewhere — graft's own v0 is
        // plain, so the property lands by configuration surgery
        val p0 = java.nio.file.Paths.get(tmp, "_delta_log",
          "00000000000000000000.json")
        val raw = new String(java.nio.file.Files.readAllBytes(p0), "UTF-8")
        java.nio.file.Files.write(p0,
          raw.replace(""""configuration":{}""",
            """"configuration":{"delta.enableChangeDataFeed":"true"}""")
            .getBytes("UTF-8"))
        val r = base.agg(min(col("k")), max(col("k"))).collect().head
        val cut = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 4
        val updates = base.filter(col("k") <= cut && col("k") % 10 === 0)
          .select(col("k"), (col("bal") + 100.0).as("bal"),
            lit(false).as("__delete"))
        val deletes = base.filter(col("k") <= cut && col("k") % 20 === 5)
          .select(col("k"), col("bal"), lit(true).as("__delete"))
        val inserts = base.filter(col("k") % 10 === 1)
          .select((col("k") + 10000000L).as("k"), col("bal"),
            lit(false).as("__delete"))
        D.mergeDeltaTable(s, updates.union(deletes).union(inserts), tmp,
          Seq("k"), deleteCol = Some("__delete"))
        D.deleteFromDeltaTableDv(s, tmp, col("k") % 7 === 3)
        D.readDeltaCdf(s, tmp, 0L, Some(2L))
          .groupBy(col("_commit_version"), col("_change_type"))
          .agg(count(lit(1)).as("rows"),
            sum(round(col("bal") * 1e6).cast("long")).as("bal_micro"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
          .orderBy(col("_commit_version"), col("_change_type"))
          .localCheckpoint(eager = true)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    },
    Some("""WITH base AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer),
      band AS (SELECT min(k) + (max(k) - min(k)) // 4 AS cut FROM base),
      batch AS (
        SELECT k, bal + 100.0 AS bal, FALSE AS del
        FROM base, band WHERE k <= cut AND k % 10 = 0
        UNION ALL
        SELECT k, bal, TRUE FROM base, band WHERE k <= cut AND k % 20 = 5
        UNION ALL
        SELECT k + 10000000, bal, FALSE FROM base WHERE k % 10 = 1),
      merged AS (
        SELECT coalesce(b.k, t.k) AS k,
          coalesce(b.bal, t.bal) AS bal,
          coalesce(b.del, FALSE) AS del
        FROM base t FULL OUTER JOIN batch b ON t.k = b.k),
      c1 AS (
        SELECT k, bal, 'insert' AS ct FROM batch
        WHERE k >= 10000000 AND NOT del
        UNION ALL
        SELECT k, bal, 'delete' FROM base
        WHERE k IN (SELECT k FROM batch WHERE del)
        UNION ALL
        SELECT k, bal, 'update_preimage' FROM base
        WHERE k IN (SELECT k FROM batch WHERE NOT del AND k < 10000000)
        UNION ALL
        SELECT k, bal, 'update_postimage' FROM batch
        WHERE NOT del AND k < 10000000),
      c2 AS (
        SELECT k, bal, 'delete' AS ct FROM merged
        WHERE NOT del AND k % 7 = 3),
      changes AS (
        SELECT CAST(1 AS BIGINT) AS _commit_version, ct AS _change_type,
          k, bal FROM c1
        UNION ALL
        SELECT CAST(2 AS BIGINT), ct, k, bal FROM c2)
      SELECT _commit_version, _change_type, count(*) AS rows,
        CAST(sum(CAST(round(bal * 1e6) AS BIGINT)) AS BIGINT) AS bal_micro,
        min(k) AS min_k, max(k) AS max_k
      FROM changes GROUP BY _commit_version, _change_type
      ORDER BY _commit_version, _change_type"""))

  /** CDF feed SPANNING SCHEMA CHANGES, oracle-EXACT (r19): a range
    * crossing ADD COLUMNS and a schema-CHANGING OVERWRITE reads each
    * commit's change files at THAT commit's schema and aligns them
    * into the until-schema (NULL-padded both ways) — the per-commit
    * resolution rule. v1 ADD COLUMNS contributes nothing; v2's append
    * synthesizes inserts under the evolved schema; v3's DV delete
    * feeds deletes with the evolved columns; v4's schema-changing
    * overwrite feeds every departing row aligned into ITS new schema
    * (bal/seg leave, cat reads NULL on the delete side) plus the
    * replacement inserts. The oracle replays the whole feed
    * relationally — alignment changes no values, only shape. */
  val q164bDeltaCdfSchemaSpan = GraftQuery(
    "q164b_delta_cdf_schema_span", { (s, dir) =>
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q164b_delta").toString
      try {
        val D = graft.core.DeltaExport
        D.writeDeltaTable(s, base.repartitionByRange(4, col("k")), tmp)
        val p0 = java.nio.file.Paths.get(tmp, "_delta_log",
          "00000000000000000000.json")
        val raw = new String(java.nio.file.Files.readAllBytes(p0), "UTF-8")
        java.nio.file.Files.write(p0,
          raw.replace(""""configuration":{}""",
            """"configuration":{"delta.enableChangeDataFeed":"true"}""")
            .getBytes("UTF-8"))
        val evolved = org.apache.spark.sql.types.DataType
          .fromJson(D.schemaStringOf(D.snapshotAt(s, tmp, None)._1))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
          .add(org.apache.spark.sql.types.StructField("seg",
            org.apache.spark.sql.types.LongType, nullable = true))
        D.evolveDeltaTableSchema(s, tmp, evolved)                   // v1
        D.appendDeltaTable(s,
          base.filter(col("k") % 10 === 1).select(
            (col("k") + 10000000L).as("k"), col("bal"),
            (col("k") % 5).as("seg")), tmp)                         // v2
        D.deleteFromDeltaTableDv(s, tmp, col("k") % 20 === 5)       // v3
        D.overwriteDeltaTable(s,
          base.filter(col("k") % 10 === 2)
            .select(col("k"), (col("k") % 3).as("cat")), tmp)       // v4
        D.readDeltaCdf(s, tmp, 0L, Some(4L))
          .groupBy(col("_commit_version"), col("_change_type"))
          .agg(count(lit(1)).as("rows"),
            sum(col("k")).as("k_sum"),
            count(col("cat")).as("cat_rows"),
            coalesce(sum(col("cat")), lit(0L)).as("cat_sum"))
          .orderBy(col("_commit_version"), col("_change_type"))
          .localCheckpoint(eager = true)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    },
    Some("""WITH base AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer),
      app AS (SELECT k + 10000000 AS k, bal, k % 5 AS seg FROM base
              WHERE k % 10 = 1),
      t2 AS (SELECT k, bal, CAST(NULL AS BIGINT) AS seg FROM base
             UNION ALL SELECT k, bal, seg FROM app),
      del3 AS (SELECT * FROM t2 WHERE k % 20 = 5),
      t3 AS (SELECT * FROM t2 WHERE k % 20 <> 5),
      ins4 AS (SELECT k, k % 3 AS cat FROM base WHERE k % 10 = 2),
      changes AS (
        SELECT CAST(2 AS BIGINT) AS v, 'insert' AS ct, k,
          CAST(NULL AS BIGINT) AS cat FROM app
        UNION ALL SELECT 3, 'delete', k, NULL FROM del3
        UNION ALL SELECT 4, 'delete', k, NULL FROM t3
        UNION ALL SELECT 4, 'insert', k, cat FROM ins4)
      SELECT v AS _commit_version, ct AS _change_type,
        count(*) AS rows, CAST(sum(k) AS BIGINT) AS k_sum,
        count(cat) AS cat_rows,
        CAST(coalesce(sum(cat), 0) AS BIGINT) AS cat_sum
      FROM changes GROUP BY v, ct ORDER BY v, ct"""))

  /** The COLUMN-MAPPING lifecycle composition, oracle-EXACT — the
    * q163 discipline applied to the mapping family: write → UPGRADE to
    * column mapping → RENAME (bal→balance, pure metadata) → EVOLVE
    * (allocate id/physical name for `segment`) → APPEND under the new
    * schema → DV DELETE through the renamed column's table → read.
    * The invariants ride the hash gate: pre-upgrade time travel keeps
    * the ORIGINAL schema (`pre_upgrade_schema`), the final schema
    * carries the renamed + evolved names (`renamed_resolves`), and a
    * stats-band read over the RENAMED column still answers exactly
    * (`band_rows` — the physical stats key resolves through the
    * rename). The oracle replays the append + delete relationally;
    * renames change no values, which is the point. */
  val q165MappingLifecycle = GraftQuery(
    "q165_mapping_lifecycle", { (s, dir) =>
      import s.implicits._
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q165_delta").toString
      try {
        val D = graft.core.DeltaExport
        D.writeDeltaTable(s, base.repartitionByRange(4, col("k")), tmp)
        D.upgradeToColumnMapping(s, tmp)
        D.renameDeltaTableColumn(s, tmp, "bal", "balance")
        val renamed = org.apache.spark.sql.types.DataType
          .fromJson(D.schemaStringOf(D.snapshotAt(s, tmp, None)._1))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        D.evolveDeltaTableSchema(s, tmp, renamed.add(
          org.apache.spark.sql.types.StructField("segment",
            org.apache.spark.sql.types.LongType, nullable = true)))
        D.appendDeltaTable(s,
          base.filter(col("k") % 10 === 1)
            .select((col("k") + 10000000L).as("k"),
              col("bal").as("balance"), (col("k") % 5).as("segment")),
          tmp)
        D.deleteFromDeltaTableDv(s, tmp, col("k") % 7 === 3)
        val preUpgrade = D.readDeltaTable(s, tmp, Some(0L))
          .schema.fieldNames.toSeq == Seq("k", "bal")
        val renamedResolves = D.readDeltaTable(s, tmp)
          .schema.fieldNames.toSeq == Seq("k", "balance", "segment")
        val bandRows = D.readDeltaTablePruned(s, tmp, "balance",
          0.0, 500.0)._1.count()
        D.readDeltaTable(s, tmp)
          .agg(count(lit(1)).as("rows_after"),
            sum(round(col("balance") * 1e2).cast("long")).as("bal_cents"),
            count(col("segment")).as("segmented"),
            min(col("k")).as("min_k"))
          .withColumn("pre_upgrade_schema", lit(preUpgrade))
          .withColumn("renamed_resolves", lit(renamedResolves))
          .withColumn("band_rows", lit(bandRows))
          .localCheckpoint(eager = true)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    },
    Some("""WITH base AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer),
      appended AS (
        SELECT k, bal, CAST(NULL AS BIGINT) AS segment FROM base
        UNION ALL
        SELECT k + 10000000, bal, k % 5 FROM base WHERE k % 10 = 1),
      live AS (SELECT * FROM appended WHERE k % 7 <> 3)
      SELECT count(*) AS rows_after,
        CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
        count(segment) AS segmented,
        min(k) AS min_k,
        TRUE AS pre_upgrade_schema,
        TRUE AS renamed_resolves,
        (SELECT count(*) FROM live WHERE bal BETWEEN 0 AND 500)
          AS band_rows
      FROM live"""))

  /** The IDENTITY × RESTORE × CDF lifecycle, oracle-EXACT — the r18
    * writer features composed where their interactions hide:
    * a GENERATED ALWAYS identity table (start 10, step 10, watermark
    * seeded at 10) takes two ALLOCATING appends around a DV DELETE,
    * then RESTOREs across both — and the restore must (a) emit its
    * change feed (batch-2's rows leave as deletes, the DV-masked rows
    * return as inserts — the position-diff path), and (b) ROLL BACK
    * the identity watermark with the re-asserted metaData, so the
    * post-restore append REUSES batch-2's first id (Delta's restore
    * semantics: metadata travels with the snapshot; the rows that held
    * those ids are gone, so reuse is correct, and `ids_reused` pins
    * it through the hash gate). Allocation order is deterministic
    * because each batch is sorted and single-partition, which is what
    * lets DuckDB replay the ids as 10 + 10·row_number(). */
  val q168IdentityRestoreCdf = GraftQuery(
    "q168_identity_restore_cdf", { (s, dir) =>
      import s.implicits._
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q168_delta").toString
      try {
        val D = graft.core.DeltaExport
        val md = new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("delta.identity.start", 10L)
          .putLong("delta.identity.step", 10L)
          .putLong("delta.identity.highWaterMark", 10L)
          .build()
        // nullable columns, explicitly — the appended batches read from
        // parquet (nullable), and schemaFits never lets nullability widen
        val seedSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType, nullable = true, md),
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType, nullable = true),
          org.apache.spark.sql.types.StructField("bal",
            org.apache.spark.sql.types.DoubleType, nullable = true)))
        val seed = s.createDataFrame(
          s.sparkContext.parallelize(
            Seq(org.apache.spark.sql.Row(10L, -1L, 0.0)), 1), seedSchema)
        D.writeDeltaTable(s, seed, tmp)                             // v0
        val p0 = java.nio.file.Paths.get(tmp, "_delta_log",
          "00000000000000000000.json")
        val raw = new String(java.nio.file.Files.readAllBytes(p0), "UTF-8")
        java.nio.file.Files.write(p0,
          raw.replace(""""configuration":{}""",
            """"configuration":{"delta.enableChangeDataFeed":"true"}""")
            .getBytes("UTF-8"))
        def batch(parity: Int) = base.filter(col("k") % 2 === parity)
          .select(col("k"), col("bal")).orderBy(col("k")).coalesce(1)
        D.appendDeltaTable(s, batch(0), tmp)                        // v1
        D.deleteFromDeltaTableDv(s, tmp, col("k") % 5 === 1)        // v2
        D.appendDeltaTable(s, batch(1), tmp)                        // v3
        val b2First = D.readDeltaTable(s, tmp)
          .filter(col("k") % 2 === 1)
          .agg(min(col("id"))).head().getLong(0)
        D.restoreDeltaTable(s, tmp, 1L)                             // v4
        val feedAgg = D.readDeltaCdf(s, tmp, 3L, Some(4L)).agg(
          count(when(col("_change_type") === "delete", 1))
            .as("feed_deletes"),
          coalesce(sum(when(col("_change_type") === "delete", col("id"))),
            lit(0L)).as("feed_delete_id_sum"),
          count(when(col("_change_type") === "insert", 1))
            .as("feed_inserts"),
          coalesce(sum(when(col("_change_type") === "insert", col("id"))),
            lit(0L)).as("feed_insert_id_sum"))
        D.appendDeltaTable(s,
          Seq((-2L, 1.0)).toDF("k", "bal"), tmp)                    // v5
        val b3Id = D.readDeltaTable(s, tmp).filter(col("k") === -2L)
          .agg(min(col("id"))).head().getLong(0)
        D.readDeltaTable(s, tmp)
          .agg(count(lit(1)).as("rows_after"),
            sum(col("id")).as("id_sum"),
            sum(col("k")).as("k_sum"))
          .crossJoin(feedAgg)
          .withColumn("ids_reused", lit(b3Id == b2First))
          .localCheckpoint(eager = true)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    },
    Some("""WITH base AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer),
      b1 AS (SELECT k, 10 + 10 * row_number() OVER (ORDER BY k) AS id
             FROM base WHERE k % 2 = 0),
      n1 AS (SELECT count(*) AS n FROM b1),
      b2 AS (SELECT k,
               10 + 10 * ((SELECT n FROM n1) + row_number() OVER (ORDER BY k)) AS id
             FROM base WHERE k % 2 = 1),
      fin AS (SELECT CAST(10 AS BIGINT) AS id, CAST(-1 AS BIGINT) AS k
              UNION ALL SELECT id, k FROM b1
              UNION ALL SELECT 10 * ((SELECT n FROM n1) + 2), -2)
      SELECT count(*) AS rows_after,
        CAST(sum(id) AS BIGINT) AS id_sum,
        CAST(sum(k) AS BIGINT) AS k_sum,
        (SELECT count(*) FROM b2) AS feed_deletes,
        (SELECT CAST(coalesce(sum(id), 0) AS BIGINT) FROM b2)
          AS feed_delete_id_sum,
        (SELECT count(*) FROM b1 WHERE k % 10 = 6) AS feed_inserts,
        (SELECT CAST(coalesce(sum(id), 0) AS BIGINT) FROM b1 WHERE k % 10 = 6)
          AS feed_insert_id_sum,
        TRUE AS ids_reused
      FROM fin"""))

  /** The NESTED-STRUCT column-mapping lifecycle, oracle-EXACT (r19 —
    * the q165 discipline applied to the reference's own data model:
    * `Pharma_Ingestion_Cleaning.py:66-72` pulls six fields out of two
    * structs, so a mapped table with struct columns is the shape a
    * real user hits first): write a table whose row type nests a
    * struct → UPGRADE to column mapping (ids + physical names assigned
    * at EVERY depth) → RENAME the struct's parent (pure metadata; the
    * nested physical layer never moves) → EVOLVE with a fresh struct
    * column (nested ids/uuid physical names allocate) → APPEND under
    * the evolved schema (nested physical names + footer ids land on
    * disk) → DV DELETE through the renamed column's table → read. The
    * hash gate carries the invariants: pre-upgrade time travel keeps
    * the original schema and rows (`pre_upgrade_reads`), the final
    * schema resolves the renamed parent and both nested levels
    * (`nested_resolves`), and every aggregate is computed THROUGH the
    * nested fields (record.bal, record.seg, extra.cat) of the mapped
    * physical layout. The oracle replays the append + delete
    * relationally over flattened columns — renames and mapping change
    * no values, which is the point. */
  val q169NestedMappingLifecycle = GraftQuery(
    "q169_nested_mapping_lifecycle", { (s, dir) =>
      val cust = t(s, dir, "customer")
      def shaped(renameTo: String) = cust.select(
        col("c_custkey").as("k"),
        struct(col("c_acctbal").as("bal"),
          (col("c_custkey") % 5).as("seg")).as(renameTo))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q169_delta").toString
      try {
        val D = graft.core.DeltaExport
        D.writeDeltaTable(s,
          shaped("obj").repartitionByRange(4, col("k")), tmp)
        val baseRows = cust.count()
        D.upgradeToColumnMapping(s, tmp)
        D.renameDeltaTableColumn(s, tmp, "obj", "record")
        val renamed = org.apache.spark.sql.types.DataType
          .fromJson(D.schemaStringOf(D.snapshotAt(s, tmp, None)._1))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        D.evolveDeltaTableSchema(s, tmp, renamed.add(
          org.apache.spark.sql.types.StructField("extra",
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("cat",
                org.apache.spark.sql.types.LongType, nullable = true))),
            nullable = true)))
        D.appendDeltaTable(s,
          cust.filter(col("c_custkey") % 10 === 1).select(
            (col("c_custkey") + 10000000L).as("k"),
            struct(col("c_acctbal").as("bal"),
              (col("c_custkey") % 5).as("seg")).as("record"),
            struct((col("c_custkey") % 3).as("cat")).as("extra")),
          tmp)
        D.deleteFromDeltaTableDv(s, tmp, col("k") % 7 === 3)
        val pre = D.readDeltaTable(s, tmp, Some(0L))
        val preUpgrade = pre.schema.fieldNames.toSeq == Seq("k", "obj") &&
          pre.count() == baseRows
        val fin = D.readDeltaTable(s, tmp)
        val nestedResolves =
          fin.schema.fieldNames.toSeq == Seq("k", "record", "extra") &&
            fin.schema("record").dataType
              .asInstanceOf[org.apache.spark.sql.types.StructType]
              .fieldNames.toSeq == Seq("bal", "seg")
        fin.agg(
            count(lit(1)).as("rows_after"),
            sum(round(col("record.bal") * 100).cast("long"))
              .as("bal_cents"),
            sum(col("record.seg")).as("seg_sum"),
            count(col("extra.cat")).as("cat_rows"),
            coalesce(sum(col("extra.cat")), lit(0L)).as("cat_sum"),
            min(col("k")).as("min_k"))
          .withColumn("pre_upgrade_reads", lit(preUpgrade))
          .withColumn("nested_resolves", lit(nestedResolves))
          .localCheckpoint(eager = true)
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    },
    Some("""WITH base AS (SELECT c_custkey AS k, c_acctbal AS bal,
        c_custkey % 5 AS seg FROM customer),
      appended AS (
        SELECT k, bal, seg, CAST(NULL AS BIGINT) AS cat FROM base
        UNION ALL
        SELECT k + 10000000, bal, seg, k % 3 FROM base WHERE k % 10 = 1),
      live AS (SELECT * FROM appended WHERE k % 7 <> 3)
      SELECT count(*) AS rows_after,
        CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
        CAST(sum(seg) AS BIGINT) AS seg_sum,
        count(cat) AS cat_rows,
        CAST(coalesce(sum(cat), 0) AS BIGINT) AS cat_sum,
        min(k) AS min_k,
        TRUE AS pre_upgrade_reads,
        TRUE AS nested_resolves
      FROM live"""))

  /** STREAMING CDF SOURCE end-to-end, oracle-EXACT (r20): a CDF-enabled
    * table takes an append, a DV delete, a DV update and an OPTIMIZE;
    * [[graft.streaming.CdfStream]] tails the feed micro-batch by
    * micro-batch (one table version per batch) into the incremental
    * aggregate fold. The run then exercises the full streaming
    * contract IN the query: more DML lands, the LAST commit marker is
    * deleted (a simulated crash between handler and marker), and a
    * restarted tailer must REPLAY exactly that batch and deliver only
    * the new commits — exactly-once state via the versioned-snapshot
    * fold, OPTIMIZE invisible (its batch feeds zero rows). The oracle
    * replays the DML relationally and aggregates the final state; a
    * double-applied replay, a lost commit, or a maintenance commit
    * leaking rows all hash-fail. Money rides as integer cents so the
    * incremental signed-sum is exact under any batch order. */
  val q170CdfStreamIncremental = GraftQuery(
    "q170_cdf_stream_incremental", { (s, dir) =>
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nat"),
          round(col("c_acctbal") * 1e2).cast("long").as("bal_c"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q170_delta").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_q170_ckpt").toString
      try {
        val D = graft.core.DeltaExport
        val CS = graft.streaming.CdfStream
        D.writeDeltaTable(s, base.repartitionByRange(4, col("k")), tmp)
        val p0 = java.nio.file.Paths.get(tmp, "_delta_log",
          "00000000000000000000.json")
        val raw = new String(java.nio.file.Files.readAllBytes(p0), "UTF-8")
        java.nio.file.Files.write(p0,
          raw.replace(""""configuration":{}""",
            """"configuration":{"delta.enableChangeDataFeed":"true"}""")
            .getBytes("UTF-8"))
        D.appendDeltaTable(s, base.filter(col("k") % 10 === 1)
          .select((col("k") + 10000000L).as("k"), col("nat"),
            col("bal_c")), tmp)                                      // v1
        D.deleteFromDeltaTableDv(s, tmp, col("k") % 7 === 3)         // v2
        D.updateDeltaTableDv(s, tmp, col("k") % 9 === 4,
          Map("bal_c" -> (col("bal_c") + 5000L)))                    // v3
        D.optimizeDeltaTable(s, tmp, targetFiles = 2)                // v4
        val run1 = CS.runIncrementalAggregate(s, tmp, ckpt,
          Seq("nat"), Seq("bal_c"), maxVersionsPerBatch = 1)
        // quiet poll: nothing pending, zero batches
        val quiet = CS.runIncrementalAggregate(s, tmp, ckpt,
          Seq("nat"), Seq("bal_c"), maxVersionsPerBatch = 1)
        // more DML lands; a crash loses the LAST commit marker
        D.deleteFromDeltaTableDv(s, tmp, col("k") % 11 === 6)        // v5
        java.nio.file.Files.delete(java.nio.file.Paths.get(ckpt,
          "commits", (run1.last.batchId).toString))
        val run2 = CS.runIncrementalAggregate(s, tmp, ckpt,
          Seq("nat"), Seq("bal_c"), maxVersionsPerBatch = 1)
        CS.currentAggregate(s, ckpt).get
          .select(col("nat"), col("__cnt").as("cnt"),
            col("sum_bal_c").cast("long").as("bal_cents"))
          .withColumn("batches_first", lit(run1.length))
          .withColumn("quiet_poll_empty", lit(quiet.isEmpty))
          .withColumn("batches_second", lit(run2.length))
          .withColumn("replayed_second",
            lit(run2.count(_.replayed)))
          .orderBy(col("nat"))
          .localCheckpoint(eager = true)
      } finally {
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(tmp))
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(ckpt))
      }
    },
    Some("""WITH base AS (
        SELECT c_custkey AS k, c_nationkey AS nat,
          CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        FROM customer),
      appended AS (
        SELECT k, nat, bal_c FROM base
        UNION ALL
        SELECT k + 10000000, nat, bal_c FROM base WHERE k % 10 = 1),
      afterdel AS (SELECT * FROM appended WHERE k % 7 <> 3),
      afterupd AS (
        SELECT k, nat,
          CASE WHEN k % 9 = 4 THEN bal_c + 5000 ELSE bal_c END AS bal_c
        FROM afterdel),
      final AS (SELECT * FROM afterupd WHERE k % 11 <> 6)
      SELECT nat, count(*) AS cnt,
        CAST(sum(bal_c) AS BIGINT) AS bal_cents,
        5 AS batches_first, TRUE AS quiet_poll_empty,
        2 AS batches_second, 1 AS replayed_second
      FROM final GROUP BY nat ORDER BY nat"""))

  val all: Seq[GraftQuery] = Seq(
    q170CdfStreamIncremental,
    q71Unpivot, q04cGroupedApproxPercentile, q72FuzzyJoin, q141DeltaPrunedRead,
    q148DeltaPartitioned, q149DeltaMerge, q150DeltaCdc, q158DeltaDeleteDv,
    q161DeltaUpdateDv, q163DeltaLifecycle, q164DeltaCdfFeed,
    q165MappingLifecycle, q168IdentityRestoreCdf,
    q169NestedMappingLifecycle, q164bDeltaCdfSchemaSpan,
    q77PercentOfParent, q78ArrayAgg, q79MergeUpsert, q79bMergePartitioned,
    q80LatestPerKey, q102VersionChanges, q103IncrementalAgg,
    q81ArgMax, q82RankTies, q83CorrelatedExists, q84Cube, q95LateralTopK,
    q96RecursiveCalendar, q97MapRoundtrip,
    q01PricingSummary, q02GlobalStats, q03CountDistinct, q03bApproxDistinct,
    q04Percentile, q04bApproxPercentile,
    q05ConditionalAgg, q06Having, q07CaseBucket, q08TwoLevelAgg,
    q09ScalarSubquery, q10TopK, q11StarJoin, q12FactJoin, q13OuterJoin,
    q14SemiAnti, q15WindowRank, q16WindowRunning, q17SetOps, q17bSetOpsAll,
    q18RangeJoin,
    q19Rollup, q20DedupExact, q42TypedAggregator,
    q52GroupingSets, q53NtileFamily, q54StatAggs, q59NullsafeJoin,
    q66FreqItems, q67SamplingContract, q68MonthOverMonth, q88CountMin)
}

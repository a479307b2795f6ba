package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions._
import graft.operators.Relational
import graft.sources.Tables

/** Reference-parity operator catalog — one named query per operator row
  * of SURVEY.md §2, each with a DuckDB oracle. Query names carry the
  * §2 operator ids they cover (s=scan, p=projection/predicate, j=join,
  * a=agg/reshape, f=function, g=grouping, w=window, c=constraint,
  * q=product-surface query).
  */
object ParityQueries {

  /** Exact 2-dp decimal for bit-identical cross-engine double sums:
    * all money/qty doubles in the test data are exactly 2-decimal. */
  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** `CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)` oracle fragment. */
  private def sumDec(col: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"

  private def revenueDec: String =
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec("s1_scan_project",
      "S1/P1/P2/Q2: parquet scan, projection + alias, total-order limit",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice").as("price"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data:
        // the ORDER BY must totalize over all output columns or the
        // LIMIT boundary is engine-dependent
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("price"))
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
             |       l_extendedprice AS price
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_quantity, price
             |LIMIT 100""".stripMargin)),

    QuerySpec("p6_filter_predicates",
      "P6/P8/P9/P10: equality, isin, null-test, inequality predicates",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") && col("l_quantity") > 30
          && col("l_shipdate").isNotNull && col("l_linestatus") =!= "O")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"))
        // totalize over all output columns (duplicate (okey, lineno)
        // pairs exist) so row order is engine-independent
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity")),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
             |FROM lineitem
             |WHERE l_returnflag IN ('A','R') AND l_quantity > 30
             |  AND l_shipdate IS NOT NULL AND l_linestatus <> 'O'
             |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""".stripMargin)),

    QuerySpec("p7_case_conditional",
      "P7/P12: nested CASE WHEN incl. omitted-else -> NULL",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "F", "finished")
            .when(col("o_orderstatus") === "O", "open")
            .otherwise("pending").as("status_label"),
          when(col("o_totalprice") > 250000, "big").as("size_label"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_orderstatus = 'F' THEN 'finished'
             |       WHEN o_orderstatus = 'O' THEN 'open'
             |       ELSE 'pending' END AS status_label,
             |  CASE WHEN o_totalprice > 250000 THEN 'big' END AS size_label
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    QuerySpec("p11_cast_concat",
      "P11/F1: casts and string concatenation (surrogate-key idiom)",
      (s, dir) => t(s, dir, "customer")
        .select(col("c_custkey"),
          concat(lit("CUST-"), col("c_custkey").cast("string")).as("cust_sk"),
          col("c_nationkey").cast("long").as("nat_long"),
          col("c_nationkey").cast("double").as("nat_dbl"),
          concat(col("c_name"), lit(" #"), col("c_mktsegment")).as("name_tag"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, 'CUST-' || CAST(c_custkey AS VARCHAR) AS cust_sk,
             |  CAST(c_nationkey AS BIGINT) AS nat_long,
             |  CAST(c_nationkey AS DOUBLE) AS nat_dbl,
             |  c_name || ' #' || c_mktsegment AS name_tag
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    QuerySpec("a1_distinct",
      "A1: distinct over derived dimension rows",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QuerySpec("a2_surrogate_key",
      "A2: deterministic surrogate keys — row_number over natural key + prefix",
      (s, dir) => {
        val dims = t(s, dir, "part").select(col("p_brand")).distinct()
        Relational.surrogateKey(dims, "BRD-", "brand_sk", Seq(col("p_brand")))
          .select(col("brand_sk"), col("p_brand"), col("brand_sk_n"))
          .orderBy(col("brand_sk_n"))
      },
      Some("""WITH d AS (SELECT DISTINCT p_brand FROM part)
             |SELECT 'BRD-' || CAST(row_number() OVER (ORDER BY p_brand) AS VARCHAR)
             |         AS brand_sk,
             |       p_brand,
             |       row_number() OVER (ORDER BY p_brand) AS brand_sk_n
             |FROM d ORDER BY brand_sk_n""".stripMargin)),

    QuerySpec("a3_unpivot_literal_dim",
      "A3/S4/P6: melt wide one-hot flags to long + literal lookup-dim join",
      (s, dir) => {
        import s.implicits._
        val flags = t(s, dir, "lineitem").groupBy(col("l_orderkey")).agg(
          max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("flag_returned"),
          max(when(col("l_linestatus") === "F", 1).otherwise(0)).as("flag_finished"),
          max(when(col("l_tax") > 0.05, 1).otherwise(0)).as("flag_taxed"))
        val long = Relational.unpivotFlags(flags, Seq("l_orderkey"),
          Seq("flag_returned", "flag_finished", "flag_taxed"))
          .filter(col("value") === 1)
        val labels = Seq(("flag_returned", "returned"),
          ("flag_finished", "finished"), ("flag_taxed", "taxed"))
          .toDF("variable", "label")
        long.join(broadcast(labels), "variable")
          .select(col("l_orderkey"), col("label"), col("value"))
          .orderBy(col("l_orderkey"), col("label"))
      },
      Some("""WITH flags AS (
             |  SELECT l_orderkey,
             |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS flag_returned,
             |    max(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS flag_finished,
             |    max(CASE WHEN l_tax > 0.05 THEN 1 ELSE 0 END) AS flag_taxed
             |  FROM lineitem GROUP BY l_orderkey),
             |long AS (
             |  SELECT l_orderkey, 'flag_returned' AS variable, flag_returned AS value FROM flags
             |  UNION ALL
             |  SELECT l_orderkey, 'flag_finished', flag_finished FROM flags
             |  UNION ALL
             |  SELECT l_orderkey, 'flag_taxed', flag_taxed FROM flags),
             |labels(variable, label) AS (VALUES
             |  ('flag_returned', 'returned'), ('flag_finished', 'finished'),
             |  ('flag_taxed', 'taxed'))
             |SELECT l.l_orderkey, m.label, l.value
             |FROM long l JOIN labels m ON l.variable = m.variable
             |WHERE l.value = 1
             |ORDER BY l.l_orderkey, m.label""".stripMargin)),

    QuerySpec("a4_union_diagonal",
      "A4: union-by-name with missing columns null-filled (diagonal concat)",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("ts"), col("user_id"), col("value"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("event_type"), col("props"))
        Relational.unionDiagonal(Seq(clicks, purchases))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, ts, user_id, value,
             |       CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS VARCHAR) AS props
             |FROM events WHERE event_type = 'click'
             |UNION ALL
             |SELECT event_id, CAST(NULL AS TIMESTAMP), CAST(NULL AS BIGINT),
             |       CAST(NULL AS DOUBLE), event_type, props
             |FROM events WHERE event_type = 'purchase'
             |ORDER BY event_id""".stripMargin)),

    QuerySpec("j1_join_inner_agg",
      "J1: inner equi-join fact-to-fact + exact-decimal revenue rollup",
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority")),
      Some(s"""SELECT o_orderpriority, $revenueDec AS revenue,
              |       count(*) AS n_items
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    QuerySpec("j2_join_differing_keys",
      "J2: inner equi-join with differing key names, dup key dropped",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        o.join(c, o("o_custkey") === c("c_custkey")).drop("c_custkey")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            sum(dec2(col("o_totalprice"))).cast("double").as("total_value"))
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""SELECT c_mktsegment, count(*) AS n_orders,
              |       ${sumDec("o_totalprice")} AS total_value
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    QuerySpec("j3_join_composite_key",
      "J3: composite-key aggregate compared back to detail rows — " +
        "computed as one window over (partkey, suppkey) instead of " +
        "aggregate + re-join, halving the shuffles (same oracle SQL)",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val w = Window.partitionBy(col("l_partkey"), col("l_suppkey"))
        li.withColumn("tot_qty",
            sum(dec2(col("l_quantity"))).over(w).cast("double"))
          .filter(col("l_quantity") * 4 > col("tot_qty"))
          .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_heavy"))
          .orderBy(col("l_partkey"))
      },
      Some(s"""WITH agg AS (
              |  SELECT l_partkey, l_suppkey, ${sumDec("l_quantity")} AS tot_qty
              |  FROM lineitem GROUP BY l_partkey, l_suppkey)
              |SELECT l.l_partkey, count(*) AS n_heavy
              |FROM lineitem l JOIN agg USING (l_partkey, l_suppkey)
              |WHERE l.l_quantity * 4 > agg.tot_qty
              |GROUP BY l.l_partkey ORDER BY l.l_partkey""".stripMargin)),

    QuerySpec("j4_join_left_null_flag",
      "J4/P9: left outer join, null-probe -> boolean flag (is_host idiom)",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
          .select(col("o_custkey")).distinct()
        c.join(big, c("c_custkey") === big("o_custkey"), "left")
          .select(col("c_custkey"), col("o_custkey").isNotNull.as("is_big_buyer"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, (o_custkey IS NOT NULL) AS is_big_buyer
             |FROM customer LEFT JOIN
             |  (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000) b
             |  ON c_custkey = o_custkey
             |ORDER BY c_custkey""".stripMargin)),

    QuerySpec("j5_join_self",
      "J5: self-join with explicit aliases (replay-pair idiom)",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        o.as("a").join(o.as("b"),
            col("a.o_custkey") === col("b.o_custkey") &&
              col("a.o_orderkey") < col("b.o_orderkey"))
          .groupBy(col("a.o_custkey").as("o_custkey"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT a.o_custkey, count(*) AS n_pairs
             |FROM orders a JOIN orders b
             |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
             |GROUP BY a.o_custkey ORDER BY a.o_custkey""".stripMargin)),

    QuerySpec("j6_semi_anti",
      "semi/anti joins (EXISTS / NOT EXISTS — the §5 FK-check idiom)",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .agg(count(lit(1)).as("n")).select(lit("has_orders").as("kind"), col("n"))
        val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("n")).select(lit("no_orders").as("kind"), col("n"))
        semi.unionByName(anti).orderBy(col("kind"))
      },
      Some("""SELECT 'has_orders' AS kind, count(*) AS n FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |UNION ALL
             |SELECT 'no_orders', count(*) FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY kind""".stripMargin)),

    QuerySpec("j8_full_outer",
      "full outer join with coalesced key and both-sides null flags",
      (s, dir) => {
        val buyers95 = t(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1995)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n95"))
        val buyers96 = t(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1996)
          .groupBy(col("o_custkey").as("ck96")).agg(count(lit(1)).as("n96"))
        buyers95.join(buyers96, col("o_custkey") === col("ck96"), "full_outer")
          .select(coalesce(col("o_custkey"), col("ck96")).as("custkey"),
            coalesce(col("n95"), lit(0L)).as("n95"),
            coalesce(col("n96"), lit(0L)).as("n96"),
            col("o_custkey").isNull.as("only96"),
            col("ck96").isNull.as("only95"))
          .orderBy(col("custkey"))
      },
      Some("""WITH b95 AS (
             |  SELECT o_custkey, count(*) AS n95 FROM orders
             |  WHERE year(o_orderdate) = 1995 GROUP BY o_custkey),
             |b96 AS (
             |  SELECT o_custkey AS ck96, count(*) AS n96 FROM orders
             |  WHERE year(o_orderdate) = 1996 GROUP BY o_custkey)
             |SELECT coalesce(o_custkey, ck96) AS custkey,
             |       CAST(coalesce(n95, 0) AS BIGINT) AS n95,
             |       CAST(coalesce(n96, 0) AS BIGINT) AS n96,
             |       (o_custkey IS NULL) AS only96,
             |       (ck96 IS NULL) AS only95
             |FROM b95 FULL OUTER JOIN b96 ON o_custkey = ck96
             |ORDER BY custkey""".stripMargin)),

    QuerySpec("j7_salted_join",
      "skew-salted equi-join (deterministic shard + replicated small " +
        "side) — oracle is the PLAIN join, proving result equivalence; " +
        "adjudicated vs AQE skew-join splitting in TUNING.md: reach " +
        "for the salt only where AQE cannot act (stateful streaming " +
        "joins, AQE off, distribution-pinned plans) — at the sf10 " +
        "hot-key rehearsal AQE's runtime split beats it 1.6x",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val supp = t(s, dir, "supplier")
          .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
        Relational.saltedJoin(li, supp, "l_suppkey", saltFactor = 8)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_items"),
            sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
          .orderBy(col("s_nationkey"))
      },
      Some(s"""SELECT s_nationkey, count(*) AS n_items,
              |       ${sumDec("l_quantity")} AS sum_qty
              |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    QuerySpec("g1_agg_pricing_summary",
      "groupBy/agg: sum/avg/count/count-distinct with exact decimal math",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sum(dec2(col("l_quantity"))).cast("double") /
            count(lit(1)).cast("double")).as("avg_qty"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${sumDec("l_quantity")} AS sum_qty,
              |  ${sumDec("l_extendedprice")} AS sum_base_price,
              |  $revenueDec AS sum_disc_price,
              |  ${sumDec("l_quantity")} / CAST(count(*) AS DOUBLE) AS avg_qty,
              |  count(DISTINCT l_orderkey) AS n_orders,
              |  count(*) AS count_order
              |FROM lineitem GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QuerySpec("g2_rollup",
      "grouping sets: ROLLUP with coalesced group labels",
      (s, dir) => t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls")),
      Some(s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
              |       coalesce(l_linestatus, 'ALL') AS ls,
              |       count(*) AS n, ${sumDec("l_quantity")} AS sum_qty
              |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
              |ORDER BY rf, ls""".stripMargin)),

    QuerySpec("g2b_grouping_id",
      "ROLLUP with grouping()/grouping_id(): distinguish genuine NULL " +
        "group values from subtotal rows (the correct OLAP idiom)",
      (s, dir) => t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          grouping_id(col("l_returnflag"), col("l_linestatus")).as("gid"),
          grouping(col("l_returnflag")).cast("long").as("g_rf"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          col("gid"), col("g_rf"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)),

    QuerySpec("g3_cube",
      "grouping sets: CUBE over two dimensions with coalesced labels",
      (s, dir) => t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("o_totalprice"))).cast("double").as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority")),
      Some(s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
              |       coalesce(o_orderpriority, 'ALL') AS priority,
              |       count(*) AS n, ${sumDec("o_totalprice")} AS total
              |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
              |ORDER BY status, priority""".stripMargin)),

    QuerySpec("g4_approx_distinct",
      "HLL++ approximate distinct counts as a cross-engine ACCURACY " +
        "gate: Spark's estimate (rsd=0.02) must land within 5% of the " +
        "exact count; the oracle asserts the bound (exact count + " +
        "literal TRUE), so a drifting sketch breaks the hash instead " +
        "of going unchecked",
      (s, dir) => {
        // sketch and exact in SEPARATE aggregations: the multi-distinct
        // rewrite would otherwise allocate the ~1.5k-word HLL buffer
        // per (group, distinct-key) pair in the Expand — measured 9 s
        // vs 1.3 s on sf0.1 lineitem
        val li = t(s, dir, "lineitem")
        val approx = li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("__approx"))
        val exact = li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_orderkey")).as("exact_orders"))
        exact.join(approx, Seq("l_returnflag"))
          .select(col("l_returnflag"), col("exact_orders"),
            (abs(col("__approx").cast("double") - col("exact_orders")) <=
              col("exact_orders").cast("double") * lit(0.05))
              .as("within_5pct"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |       count(DISTINCT l_orderkey) AS exact_orders,
             |       TRUE AS within_5pct
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    QuerySpec("a5_pivot",
      "pivot (inverse of A3's melt): long event rows -> wide per-user " +
        "counts over pinned event types",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val wide = t(s, dir, "events")
          .groupBy(col("user_id"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        wide.select(col("user_id") +:
            types.map(ty => coalesce(col(ty), lit(0L)).as(s"n_$ty")): _*)
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
             |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error,
             |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
             |  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
             |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    QuerySpec("a6_set_ops",
      "set operations: INTERSECT / EXCEPT over derived key sets",
      (s, dir) => {
        val o = t(s, dir, "orders")
        def buyers(yr: Int) = o.filter(year(col("o_orderdate")) === yr)
          .select(col("o_custkey"))
        val both = buyers(1995).intersect(buyers(1996))
          .select(lit("both").as("kind"), col("o_custkey"))
        val only95 = buyers(1995).except(buyers(1996))
          .select(lit("only95").as("kind"), col("o_custkey"))
        both.unionByName(only95).orderBy(col("kind"), col("o_custkey"))
      },
      Some("""SELECT 'both' AS kind, o_custkey FROM (
             |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
             |  INTERSECT
             |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
             |UNION ALL
             |SELECT 'only95', o_custkey FROM (
             |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
             |  EXCEPT
             |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
             |ORDER BY kind, o_custkey""".stripMargin)),

    QuerySpec("a7_nested_agg",
      "nested aggregation: per-order sorted line-number list " +
        "(collect_list + sort_array, stringified for cross-engine compare)",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"),
          concat_ws(",",
            transform(sort_array(collect_list(col("l_linenumber"))),
              _.cast("string"))).as("line_numbers"))
        .orderBy(col("l_orderkey")),
      Some("""SELECT l_orderkey, count(*) AS n_lines,
             |  array_to_string(list_transform(list_sort(list(l_linenumber)),
             |    x -> CAST(x AS VARCHAR)), ',') AS line_numbers
             |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    QuerySpec("g5_percentiles",
      "exact interpolated percentiles (DuckDB quantile_cont twin) and " +
        "extrema per return flag",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_quantity"), lit(0.25)).as("p25"),
          percentile(col("l_quantity"), lit(0.5)).as("p50"),
          percentile(col("l_quantity"), lit(0.75)).as("p75"),
          min(col("l_quantity")).as("qmin"),
          max(col("l_quantity")).as("qmax"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_quantity, 0.25) AS p25,
             |  quantile_cont(l_quantity, 0.50) AS p50,
             |  quantile_cont(l_quantity, 0.75) AS p75,
             |  min(l_quantity) AS qmin,
             |  max(l_quantity) AS qmax
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    QuerySpec("g6_argmax_struct",
      "deterministic arg-max via struct max (max_by with a pinned " +
        "tie-break: highest quantity, then highest orderkey)",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(max(struct(col("l_quantity"), col("l_orderkey"))).as("m"))
        .select(col("l_returnflag"), col("m.l_quantity").as("max_qty"),
          col("m.l_orderkey").as("argmax_okey"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  (max(struct_pack(q := l_quantity, k := l_orderkey))).q
             |    AS max_qty,
             |  (max(struct_pack(q := l_quantity, k := l_orderkey))).k
             |    AS argmax_okey
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    QuerySpec("g9_exact_quantile_histogram",
      "exact discrete quantiles WITHOUT per-group value buffers: " +
        "g5's percentile()/quantile_cont holds every group value in " +
        "memory (OOM at fact-table group sizes); this computes the " +
        "same-rank type-1 quantiles from the per-group (value, count) " +
        "histogram — one map-combined shuffle + the grouped two-level " +
        "prefix sum (no window ever holds a whole group, even one " +
        "with distinct ≈ rows values), integer-exact so no " +
        "interpolation ULPs; the oracle mirrors the histogram " +
        "formulation with a plain window (same values)",
      (s, dir) => graft.operators.Stats.exactQuantiles(
        t(s, dir, "lineitem"), "l_returnflag", "l_quantity",
        Seq(25, 50, 75)),
      Some(graft.operators.Stats.exactQuantilesOracleSql(
        "lineitem", "l_returnflag", "l_quantity", Seq(25, 50, 75)))),

    QuerySpec("w1_window_rank",
      "window ranking: top-3 orders per market segment",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.join(c, o("o_custkey") === c("c_custkey"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("c_mktsegment"), col("rn"), col("o_orderkey"),
            col("o_totalprice"))
          .orderBy(col("c_mktsegment"), col("rn"))
      },
      Some("""SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
             |  SELECT c_mktsegment, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY c_mktsegment
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders JOIN customer ON o_custkey = c_custkey) ranked
             |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin)),

    QuerySpec("w2_window_running_sum",
      "window analytic: per-supplier monthly revenue + running cumulative",
      (s, dir) => {
        val m = t(s, dir, "lineitem")
          .groupBy(col("l_suppkey"),
            date_trunc("month", col("l_shipdate")).as("mon"))
          .agg(sum(dec2(col("l_extendedprice"))).as("rev_dec"))
        val w = Window.partitionBy(col("l_suppkey")).orderBy(col("mon"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        m.select(col("l_suppkey"), col("mon"),
            col("rev_dec").cast("double").as("rev"),
            sum(col("rev_dec")).over(w).cast("double").as("cum_rev"))
          .orderBy(col("l_suppkey"), col("mon"))
      },
      Some("""WITH m AS (
             |  SELECT l_suppkey, date_trunc('month', l_shipdate) AS mon,
             |         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_dec
             |  FROM lineitem GROUP BY 1, 2)
             |SELECT l_suppkey, mon, CAST(rev_dec AS DOUBLE) AS rev,
             |  CAST(sum(rev_dec) OVER (PARTITION BY l_suppkey ORDER BY mon
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             |    AS cum_rev
             |FROM m ORDER BY l_suppkey, mon""".stripMargin)),

    QuerySpec("w3_window_analytics",
      "window analytics beyond rank/sum: lag, lead, ntile, " +
        "percent_rank, first_value over a per-customer order timeline",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pr"),
            first_value(col("o_orderkey")).over(w).as("first_ok"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  lag(o_totalprice) OVER w AS prev_price,
             |  lead(o_totalprice) OVER w AS next_price,
             |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             |  percent_rank() OVER w AS pr,
             |  first_value(o_orderkey) OVER w AS first_ok
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey
             |             ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    QuerySpec("g8_rolling_window",
      "bounded-frame rolling window: per-user last-3-events count, " +
        "rolling max(value) (comparison-only, so cross-engine exact " +
        "on doubles) and previous event id over an event_id-ordered " +
        "timeline — the sliding-metric shape ROWS frames exist for",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val w3 = w.rowsBetween(-2, Window.currentRow)
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            count(lit(1)).over(w3).as("n_w3"),
            max(col("value")).over(w3).as("max_v_w3"),
            lag(col("event_id"), 1).over(w).as("prev_event_id"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT user_id, event_id,
             |  CAST(count(*) OVER w3 AS BIGINT) AS n_w3,
             |  max(value) OVER w3 AS max_v_w3,
             |  lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
             |    AS prev_event_id
             |FROM events
             |WINDOW w3 AS (PARTITION BY user_id ORDER BY event_id
             |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    QuerySpec("f2_string_functions",
      "F2/F3/F4/F6: replace-first, contains, ends_with, capitalize-first",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"),
          replaceFirst(col("p_name"), " ", "_").as("name_first_us"),
          col("p_type").contains("ECO").as("is_economy"),
          col("p_name").endsWith("s").as("plural"),
          capitalizeFirst(col("p_name")).as("cap_name"),
          dePluralizeCapitalize(col("p_name")).as("depl_name"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, p_name,
             |  CASE WHEN instr(p_name, ' ') > 0
             |    THEN substr(p_name, 1, instr(p_name, ' ') - 1) || '_' ||
             |         substr(p_name, instr(p_name, ' ') + 1)
             |    ELSE p_name END AS name_first_us,
             |  contains(p_type, 'ECO') AS is_economy,
             |  (p_name LIKE '%s') AS plural,
             |  upper(substr(p_name, 1, 1)) || substr(p_name, 2) AS cap_name,
             |  upper(substr(p_name, 1, 1)) ||
             |    substr(p_name, 2, greatest(length(p_name) - 2, 0)) AS depl_name
             |FROM part ORDER BY p_partkey""".stripMargin)),

    QuerySpec("f5_datetime",
      "F5/F8: timestamp formatting, re-parsing, truncation, extraction",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          date_trunc("month", col("o_orderdate")).as("mon_start"),
          to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm"),
            "yyyy-MM-dd HH:mm").as("reparsed"))
        .groupBy(col("yr"), col("mo"))
        .agg(count(lit(1)).as("n"), min(col("mon_start")).as("mon_start"),
          min(col("reparsed")).as("first_order"))
        .orderBy(col("yr"), col("mo")),
      Some("""SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             |  count(*) AS n,
             |  min(date_trunc('month', o_orderdate)) AS mon_start,
             |  min(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M'),
             |      '%Y-%m-%d %H:%M')) AS first_order
             |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin)),

    QuerySpec("q2_topk_limit",
      "Q2: total-order top-k (TakeOrderedAndProject, no full sort at scale)",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(10),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
             |FROM lineitem
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
             |LIMIT 10""".stripMargin)),

    QuerySpec("q4_adhoc_sql",
      "Q4: ad-hoc ANSI SQL over registered views (full multi-join star query)",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
                |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                |       (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                |    AS revenue
                |FROM customer
                |JOIN orders ON c_custkey = o_custkey
                |JOIN lineitem ON l_orderkey = o_orderkey
                |JOIN nation ON c_nationkey = n_nationkey
                |JOIN region ON n_regionkey = r_regionkey
                |WHERE r_name = 'ASIA'
                |GROUP BY n_name, year(o_orderdate)
                |ORDER BY n_name, yr""".stripMargin)
      },
      Some("""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |       (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             |    AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name, year(o_orderdate)
             |ORDER BY n_name, yr""".stripMargin)),

    QuerySpec("q1_schema_introspection",
      "Q1/Q3/S6: catalog registration with PK/FK metadata + " +
        "information_schema-style doc. Oracle = the expected rows as a " +
        "VALUES literal: the introspection output is a fixed spec " +
        "(FIXTURES.md schemas + the registered metas), so embedding it " +
        "turns the catalog surface into a hash-gated query too",
      (s, dir) => {
        import graft.catalog.Warehouse
        import graft.catalog.Warehouse.{FkEdge, TableMeta}
        Warehouse.clear()
        Warehouse.load(s, t(s, dir, "orders"),
          TableMeta("orders", pk = Seq("o_orderkey")), validate = false)
        Warehouse.load(s, t(s, dir, "customer"),
          TableMeta("customer", pk = Seq("c_custkey")), validate = false)
        Warehouse.load(s, t(s, dir, "lineitem"),
          TableMeta("lineitem",
            fks = Seq(FkEdge(Seq("l_orderkey"), "orders", Seq("o_orderkey")))),
          validate = false)
        Warehouse.schemaDoc(s)
          .orderBy(col("table_name"), col("ordinal_position"))
      },
      Some("""SELECT * FROM (VALUES
             |  ('customer', 1, 'c_custkey', 'BIGINT', 'PK'),
             |  ('customer', 2, 'c_name', 'STRING', ''),
             |  ('customer', 3, 'c_nationkey', 'INT', ''),
             |  ('customer', 4, 'c_acctbal', 'DOUBLE', ''),
             |  ('customer', 5, 'c_mktsegment', 'STRING', ''),
             |  ('lineitem', 1, 'l_orderkey', 'BIGINT', 'FK'),
             |  ('lineitem', 2, 'l_partkey', 'BIGINT', ''),
             |  ('lineitem', 3, 'l_suppkey', 'BIGINT', ''),
             |  ('lineitem', 4, 'l_linenumber', 'INT', ''),
             |  ('lineitem', 5, 'l_quantity', 'DOUBLE', ''),
             |  ('lineitem', 6, 'l_extendedprice', 'DOUBLE', ''),
             |  ('lineitem', 7, 'l_discount', 'DOUBLE', ''),
             |  ('lineitem', 8, 'l_tax', 'DOUBLE', ''),
             |  ('lineitem', 9, 'l_returnflag', 'STRING', ''),
             |  ('lineitem', 10, 'l_linestatus', 'STRING', ''),
             |  ('lineitem', 11, 'l_shipdate', 'TIMESTAMP_NTZ', ''),
             |  ('orders', 1, 'o_orderkey', 'BIGINT', 'PK'),
             |  ('orders', 2, 'o_custkey', 'BIGINT', ''),
             |  ('orders', 3, 'o_orderstatus', 'STRING', ''),
             |  ('orders', 4, 'o_totalprice', 'DOUBLE', ''),
             |  ('orders', 5, 'o_orderdate', 'TIMESTAMP_NTZ', ''),
             |  ('orders', 6, 'o_orderpriority', 'STRING', '')
             |) AS t(table_name, ordinal_position, column_name,
             |       data_type, "constraint")
             |ORDER BY table_name, ordinal_position""".stripMargin)),

    QuerySpec("q1b_information_schema_sql",
      "Q1/Q3 as ad-hoc SQL: SELECT over the registered " +
        "information_schema_columns view — the reference's " +
        "introspection workflow verbatim (oracle = expected rows as a " +
        "VALUES literal, same spec-as-literal pattern as q1)",
      (s, dir) => {
        import graft.catalog.Warehouse
        import graft.catalog.Warehouse.{FkEdge, TableMeta}
        Warehouse.clear()
        Warehouse.load(s, t(s, dir, "orders"),
          TableMeta("orders", pk = Seq("o_orderkey")), validate = false)
        Warehouse.load(s, t(s, dir, "lineitem"),
          TableMeta("lineitem",
            fks = Seq(FkEdge(Seq("l_orderkey"), "orders", Seq("o_orderkey")))),
          validate = false)
        s.sql("""SELECT table_name, ordinal_position, column_name,
                |       data_type, `constraint`
                |FROM information_schema_columns
                |WHERE table_name = 'lineitem' AND `constraint` <> ''
                |ORDER BY table_name, ordinal_position""".stripMargin)
      },
      Some("""SELECT * FROM (VALUES
             |  ('lineitem', 1, 'l_orderkey', 'BIGINT', 'FK')
             |) AS t(table_name, ordinal_position, column_name,
             |       data_type, "constraint")
             |ORDER BY table_name, ordinal_position""".stripMargin)),

    QuerySpec("c1_pk_check",
      "§5: PK-uniqueness validation (replaces DuckDB INSERT-time enforcement)",
      (s, dir) => Relational.pkViolations(t(s, dir, "orders"), Seq("o_orderkey"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, count(*) AS n_rows FROM orders
             |GROUP BY o_orderkey HAVING count(*) > 1 ORDER BY o_orderkey""".stripMargin)),

    QuerySpec("c2_fk_check",
      "§5: FK referential-integrity validation via anti-join count",
      (s, dir) => Relational.fkOrphans(t(s, dir, "lineitem"),
          t(s, dir, "orders"), Seq("l_orderkey" -> "o_orderkey"))
        .agg(count(lit(1)).as("n_orphans")),
      Some("""SELECT count(*) AS n_orphans FROM lineitem
             |WHERE l_orderkey IS NOT NULL AND NOT EXISTS
             |  (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)""".stripMargin))
  )
}

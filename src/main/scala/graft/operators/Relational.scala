package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables._

/** Relational query surface (SURVEY.md §2.3 R1–R14, X1, X3).
  *
  * The reference engine has no relational operators at all — its closest
  * analogs are positional window filters
  * (/root/reference/Matrix/LUDecomposition.java:233-241) and the Schur
  * cogroup-by-grid-cell (/root/reference/Matrix/LUDecomposition.java:495-651),
  * which is structurally a co-partitioned join. Here the engine surface is
  * declarative DataFrame plans so Catalyst provides pushdown, pruning, join
  * selection, whole-stage codegen and AQE for free (SURVEY.md §4).
  *
  * Determinism conventions (for the DuckDB oracle hash-compare):
  *  - every query ends in a total ORDER BY;
  *  - every floating aggregate is computed as an EXACT decimal sum
  *    (cast each input to DECIMAL first, sum, then cast to double) so the
  *    result is independent of partial-aggregation order — a plain
  *    SUM(double) differs between engines in the last ulps because Spark's
  *    partial/final aggregation adds in shuffle order;
  *  - results rounded to 4 decimals; session timezone is UTC.
  */
object Relational {

  /** Exact, order-independent SUM of a double column: per-row cast to
    * decimal (exact, the inputs have ≤4 decimal digits), decimal sum,
    * back to double. Safe under any partial-agg ordering at any scale. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast("double")
  private def r4(c: Column): Column = round(c, 4)

  /** Revenue term: the per-row product is one deterministic double op;
    * the decimal cast then makes the aggregation order-independent. */
  private def revenueTerm(price: Column, disc: Column): Column = price * (lit(1.0) - disc)

  // ---------------------------------------------------------------- R1
  def r01(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val r01Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount BETWEEN 0.05 AND 0.07
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- R2 (TPC-H Q1 shape)
  def r02(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        r4(dsum(col("l_quantity"))).as("sum_qty"),
        r4(dsum(col("l_extendedprice"))).as("sum_price"),
        r4(dsum(revenueTerm(col("l_extendedprice"), col("l_discount")))).as("sum_revenue"),
        r4(dsum(col("l_discount")) / count(lit(1))).as("avg_disc"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val r02Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  COUNT(*) AS n_rows,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum_qty,
      |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum_price,
      |  ROUND(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum_revenue,
      |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4) AS avg_disc
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- R3 (join + agg)
  def r03(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        r4(dsum(col("o_totalprice"))).as("revenue"))
      .orderBy(col("c_mktsegment"))

  val r03Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 4) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- R4 (multi-way broadcast join)
  /** region and nation are constant-size dimensions → always broadcast.
    * customer scales with SF, so it is left to AQE / size-based selection
    * rather than force-broadcast (it would not fit at 100 TB). */
  def r04(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        r4(dsum(revenueTerm(col("l_extendedprice"), col("l_discount")))).as("revenue"))
      .orderBy(col("n_name"))

  val r04Sql: String =
    """SELECT n_name, COUNT(*) AS n_items,
      |  ROUND(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 4) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- R5 (left outer join)
  def r05(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))

  val r05Sql: String =
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- R6 (semi / anti)
  def r06Semi(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 50000.0),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  val r06SemiSql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 50000.0)
      |ORDER BY c_custkey""".stripMargin

  def r06Anti(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  val r06AntiSql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- R7 (distinct / count distinct)
  def r07(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val r07Sql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- R8 (rollup)
  /** Grouping-key NULLs from ROLLUP are coalesced to a sentinel so the
    * Spark/DuckDB NULL-ordering difference (NULLS FIRST vs LAST) cannot
    * perturb the total order. The raw columns contain no NULLs. */
  def r08(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        r4(dsum(col("o_totalprice"))).as("revenue"))
      .select(coalesce(col("n_name"), lit("(all)")).as("n_name"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("o_orderpriority"),
        col("n_orders"), col("revenue"))
      .orderBy(col("n_name"), col("o_orderpriority"))

  val r08Sql: String =
    """SELECT COALESCE(n_name, '(all)') AS n_name,
      |  COALESCE(o_orderpriority, '(all)') AS o_orderpriority,
      |  COUNT(*) AS n_orders,
      |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 4) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP (n_name, o_orderpriority)
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- R9 (ranking window, top-3 per customer)
  def r09(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"), col("rnk"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val r09Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
      |    RANK()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- R10 (analytic window + frame: running sum)
  /** The running sum is accumulated in DECIMAL so every prefix is exact —
    * a double running sum is order-deterministic but engine-rounding-
    * sensitive in the last ulp. */
  def r10(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("running_value",
        r4(sum(col("value").cast(DecimalType(28, 6))).over(w).cast("double")))
      .select(col("user_id"), col("event_id"), col("event_type"), col("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val r10Sql: String =
    """SELECT user_id, event_id, event_type,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS running_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- R11 (sort + limit top-k)
  /** Top-k via orderBy+limit: Spark plans this as TakeOrderedAndProject —
    * a per-partition heap + driver merge, no global sort. */
  def r11(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  val r11Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- R12 (set ops)
  def r12Intersect(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(col("o_custkey").as("custkey"))
      .intersect(customer(s, d).select(col("c_custkey").as("custkey")))
      .orderBy(col("custkey"))

  val r12IntersectSql: String =
    """SELECT o_custkey AS custkey FROM orders
      |INTERSECT
      |SELECT c_custkey AS custkey FROM customer
      |ORDER BY custkey""".stripMargin

  def r12Except(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_custkey").as("custkey"))
      .except(orders(s, d).select(col("o_custkey").as("custkey")))
      .orderBy(col("custkey"))

  val r12ExceptSql: String =
    """SELECT c_custkey AS custkey FROM customer
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders
      |ORDER BY custkey""".stripMargin

  // ---------------------------------------------------------------- R13 (scalar string/date/math)
  def r13(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        col("o_orderkey"),
        upper(substring(col("o_orderpriority"), 1, 3)).as("prio3"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_prio"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("order_month"),
        r4(sqrt(abs(col("o_totalprice")))).as("sqrt_price"))
      .orderBy(col("o_orderkey"))

  val r13Sql: String =
    """SELECT o_orderkey,
      |  UPPER(SUBSTR(o_orderpriority, 1, 3)) AS prio3,
      |  CONCAT(o_orderstatus, '-', o_orderpriority) AS status_prio,
      |  STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS order_month,
      |  ROUND(SQRT(ABS(o_totalprice)), 4) AS sqrt_price
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- R14 (correlated scalar subquery)
  /** Decorrelated by hand into agg + join — exactly the plan Catalyst
    * produces for the correlated form. The per-customer average is an
    * exact decimal sum divided in double, so the > comparison is
    * bit-identical across engines. */
  def r14(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val avgByCust = o.groupBy(col("o_custkey").as("ac_custkey"))
      .agg((dsum(col("o_totalprice")) / count(lit(1))).as("avg_price"))
    o.join(avgByCust, col("o_custkey") === col("ac_custkey"))
      .filter(col("o_totalprice") > col("avg_price"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  val r14Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      |WHERE o_totalprice > (
      |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- R15 (cube / grouping sets)
  /** Full CUBE — all 4 grouping sets in one pass (Catalyst expands to a
    * single Expand + aggregate: one shuffle regardless of set count). */
  def r15(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        r4(dsum(col("o_totalprice"))).as("revenue"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("o_orderpriority"),
        col("n_orders"), col("revenue"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  val r15Sql: String =
    """SELECT COALESCE(o_orderstatus, '(all)') AS o_orderstatus,
      |  COALESCE(o_orderpriority, '(all)') AS o_orderpriority,
      |  COUNT(*) AS n_orders,
      |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 4) AS revenue
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- R16 (approximate aggregates)
  /** The 100 TB form of COUNT(DISTINCT): HyperLogLog++ partial
    * aggregation (map-side combinable sketch, no distinct shuffle).
    * Cross-engine sketch values can't hash-match, so the query CHECKS
    * ITSELF: it outputs the exact count plus whether the estimate is
    * within tolerance; the oracle pins the exact counts and the
    * within-tolerance flag as TRUE — estimate drift fails the gate.
    * The tolerance is 3× the sketch's rsd (0.05 is a STANDARD
    * DEVIATION, not a bound — pinning 1 rsd would fail the gate on
    * legitimate ~32% tail events per group at every data refresh;
    * 3 rsd keeps false alarms ≈0.3% while any real sketch regression
    * still lands far outside). */
  def r16(s: SparkSession, d: String): DataFrame = {
    val exact = countDistinct(col("l_partkey"))
    val approx = approx_count_distinct(col("l_partkey"))
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(exact.as("n_exact"),
        (abs(approx - exact).cast("double") / exact <= 0.15).as("within_3rsd"))
      .orderBy(col("l_returnflag"))
  }

  val r16Sql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_exact, TRUE AS within_3rsd
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- X1 (exact dedup)
  /** Exact dedup on normalized text: content-hash groupBy, keep lowest
    * doc_id. The hash-partitioned window is the scalable form — at
    * 100 TB this is one shuffle on the 256-bit digest, no skew (hashes
    * are uniform). SURVEY.md §2.3 X1. */
  def x1(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    documents(s, d)
      .withColumn("h", sha2(lower(trim(col("text"))), 256))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val x1Sql: String =
    """SELECT doc_id, lang, n_chars FROM (
      |  SELECT doc_id, lang, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY sha256(LOWER(TRIM(text))) ORDER BY doc_id) AS rn
      |  FROM documents) t
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- X3 (text stats per lang)
  /** Quantiles are EXACT `percentile` (linear interpolation over sorted
    * integers — both engines produce k.0/k.5-style doubles, no
    * approximation), per SURVEY.md §2.3 X3. */
  def x3(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        r4(sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        r4(expr("percentile(n_chars, 0.5)")).as("p50_chars"),
        r4(expr("percentile(n_chars, 0.9)")).as("p90_chars"))
      .orderBy(col("lang"))

  val x3Sql: String =
    """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
      |  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars), 4) AS p50_chars,
      |  ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY n_chars), 4) AS p90_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- R17 (pivot)
  /** Pivot with an EXPLICIT value list — the scale-correct form: Spark
    * plans it as one hash aggregate with N conditional sums (no extra
    * job to discover pivot values, no second shuffle). The reference
    * has no pivot; its closest analog is the fixed f2×f1 output grid of
    * the Schur reducers (/root/reference/Matrix/Partition.java:128-149),
    * also a static reshape. */
  def r17(s: SparkSession, d: String): DataFrame = {
    val prios = Seq("1-URGENT" -> "rev_urgent", "2-HIGH" -> "rev_high",
      "3-MEDIUM" -> "rev_medium", "4-NOT SPECIFIED" -> "rev_notspec",
      "5-LOW" -> "rev_low")
    val pivoted = orders(s, d)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", prios.map(_._1))
      .agg(r4(dsum(col("o_totalprice"))))
    prios.foldLeft(pivoted) { case (df, (v, alias)) =>
      df.withColumn(alias, coalesce(col(s"`$v`"), lit(0.0))).drop(v)
    }.orderBy(col("o_orderstatus"))
  }

  val r17Sql: String = {
    val cells = Seq("1-URGENT" -> "rev_urgent", "2-HIGH" -> "rev_high",
      "3-MEDIUM" -> "rev_medium", "4-NOT SPECIFIED" -> "rev_notspec",
      "5-LOW" -> "rev_low").map { case (v, alias) =>
      s"""COALESCE(ROUND(CAST(SUM(CASE WHEN o_orderpriority = '$v'
         |    THEN CAST(o_totalprice AS DECIMAL(28,6)) END) AS DOUBLE), 4), 0.0) AS $alias"""
        .stripMargin
    }.mkString(",\n  ")
    s"""SELECT o_orderstatus,
       |  $cells
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  }

  // ---------------------------------------------------------------- R18 (lateral explode / term frequency)
  /** Lateral explode (UDTF path): whitespace tokens → corpus term
    * frequencies. The explode is narrow (no shuffle); the single
    * shuffle is the token hash-agg, map-side combined, uniform keys —
    * the 100 TB word-count shape. */
  def r18(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("token"))
      .filter(length(col("token")) >= 4)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 10)
      .orderBy(col("token"))

  val r18Sql: String =
    """SELECT token, COUNT(*) AS cnt
      |FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
      |WHERE length(token) >= 4
      |GROUP BY token HAVING COUNT(*) >= 10
      |ORDER BY token""".stripMargin

  // ---------------------------------------------------------------- R19 (as-of join)
  /** As-of join: each `purchase` event attributed to the same user's
    * most recent `click` at-or-before it (ties broken by larger
    * event_id). Implemented as the SCALE-CORRECT union+window merge —
    * tag both sides, one shuffle on user_id, `last(ignoreNulls)` over
    * the merged event-time order — instead of a per-row range join,
    * whose candidate set explodes quadratically on hot keys. Spark has
    * no native ASOF JOIN; this composition is the standard distributed
    * form (SURVEY.md §2.2: joins beyond the reference's surface). */
  def r19(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("side"), col("event_id"),
        col("value").as("click_value"), lit(null).cast("long").as("purchase_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id"),
        lit(null).cast("double").as("click_value"), col("event_id").as("purchase_id"))
    // side=0 sorts clicks before a same-timestamp purchase → `<=` semantics
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click", last(col("click_value"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("purchase_id"), col("user_id"), col("last_click"))
      .orderBy(col("purchase_id"))
  }

  val r19Sql: String =
    """SELECT p.event_id AS purchase_id, p.user_id, c.last_click
      |FROM events p LEFT JOIN LATERAL (
      |  SELECT value AS last_click FROM events c
      |  WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts
      |  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) c ON TRUE
      |WHERE p.event_type = 'purchase'
      |ORDER BY purchase_id""".stripMargin

  // ---------------------------------------------------------------- R20 (binned interval join)
  /** Pure interval join (NO equi key): ordered event pairs within a
    * 5-minute horizon, counted per type pair. The naive form is a
    * quadratic theta-join; the scale form used here bins both sides to
    * 5-minute buckets, duplicates the LEFT side into (b, b+1) probe
    * keys, equi-joins on the bucket, and applies the exact predicate
    * after — shuffle cost 2·|input|, candidate cost Σ|bucket|², bounded
    * by the time-density of the stream rather than |input|². Each
    * qualifying pair lands in exactly one (probe, bucket) cell, so no
    * dedup pass is needed. */
  def r20(s: SparkSession, d: String): DataFrame = {
    val horizonUs = 300L * 1000000
    val ev = events(s, d).select(col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val binned = ev.withColumn("bkt", expr(s"us DIV $horizonUs"))
    val probes = binned.withColumn("probe",
      explode(array(col("bkt"), col("bkt") + 1))).drop("bkt")
    probes.as("a")
      .join(binned.as("b"), col("a.probe") === col("b.bkt"))
      .filter(col("b.us") >= col("a.us") &&
        col("b.us") - col("a.us") < horizonUs &&
        (col("b.us") > col("a.us") || col("a.event_id") < col("b.event_id")))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val r20Sql: String =
    """SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n
      |FROM events a JOIN events b
      |  ON b.ts >= a.ts AND b.ts < a.ts + INTERVAL 5 MINUTE
      | AND (b.ts > a.ts OR a.event_id < b.event_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- R21 (time-range window frame)
  /** Rolling 1-hour sum per user — a RANGE frame over event time (µs
    * epoch), i.e. the frame is defined by VALUE distance, not row
    * count, so same-timestamp peers are always in-frame together.
    * One shuffle on user_id; state per row is the frame scan, which
    * Spark bounds by the sliding lower edge. Decimal-cast sum keeps
    * the result independent of intra-frame order (oracle convention). */
  def r21(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600L * 1000000, 0)
    events(s, d)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .withColumn("rolling_1h",
        round(sum(col("value").cast(DecimalType(28, 6))).over(w).cast("double"), 4))
      .select(col("event_id"), col("user_id"), col("rolling_1h"))
      .orderBy(col("event_id"))
  }

  val r21Sql: String =
    """SELECT event_id, user_id,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
      |    PARTITION BY user_id ORDER BY epoch_us(ts)
      |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS rolling_1h
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- R22 (ntile binning)
  /** Quartile binning WITHIN each priority partition (ntile over a
    * partitioned window — each partition sorts independently, so the
    * operator scales with the largest group, not the table; a GLOBAL
    * ntile would be a single-reducer sort and is deliberately avoided),
    * then revenue per (priority, quartile). */
  def r22(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders(s, d)
      .withColumn("tile", ntile(4).over(w))
      .groupBy(col("o_orderpriority"), col("tile"))
      .agg(count(lit(1)).as("n"),
        r4(dsum(col("o_totalprice"))).as("revenue"))
      .orderBy(col("o_orderpriority"), col("tile"))
  }

  val r22Sql: String =
    """SELECT o_orderpriority, tile, COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 4) AS revenue
      |FROM (SELECT o_orderpriority, o_totalprice,
      |        NTILE(4) OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice, o_orderkey) AS tile
      |      FROM orders)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- R23 (approx quantile, self-checking)
  /** Approximate percentile (t-digest-style `approx_percentile`, one
    * pass, mergeable sketch — the 100 TB path) self-checked against the
    * exact `percentile` within 5%; the oracle pins the exact value and
    * the tolerance verdict (same pattern as r16's HLL check: the
    * approximate path's contract IS the tolerance). The contract at
    * accuracy=1000 is a ≤0.1% RANK error; the induced VALUE error
    * depends on the local density of the distribution, so the gate
    * uses a deliberately loose 5% value tolerance — tight enough that
    * a sketch-merge regression (typically order-of-magnitude) trips
    * it, loose enough that a data refresh can't. */
  def r23(s: SparkSession, d: String): DataFrame = {
    val exact = expr("percentile(l_extendedprice, 0.5)")
    val approx = expr("approx_percentile(l_extendedprice, 0.5, 1000)")
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(r4(exact).as("p50_exact"),
        (abs(approx - exact) / exact <= 0.05).as("within_5pct"))
      .orderBy(col("l_returnflag"))
  }

  val r23Sql: String =
    """SELECT l_returnflag,
      |  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p50_exact,
      |  TRUE AS within_5pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- R24 (latest per key)
  /** Latest event per (user, type) — the snapshot/compaction primitive
    * (CDC last-write-wins, feature-store freshness). The rank-1 window
    * is planned with WindowGroupLimit: each partition keeps only its
    * running top-1 BEFORE the shuffle, so the exchange carries ~|keys|
    * rows, not |events|. */
  def r24(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val r24Sql: String =
    """SELECT user_id, event_type, event_id, value FROM (
      |  SELECT user_id, event_type, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------- X5 (composite pipeline)
  /** The training-data pipeline END-TO-END in one declarative plan:
    * normalize → quality filter → exact dedup (keep-first on content
    * hash) → deterministic stratified sample. Because every stage is a
    * narrow projection/filter except the single dedup window, the whole
    * pipeline is ONE shuffle (on the uniform 128-bit content hash) at
    * any corpus size — this is the composition argument for the
    * operator set: stages fuse in Catalyst rather than materializing
    * between steps. */
  def x5(s: SparkSession, d: String): DataFrame = {
    val cleaned = trim(regexp_replace(
      regexp_replace(lower(trim(col("text"))), "[^a-z0-9 ]", ""), " +", " "))
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    val rate = when(col("lang") === "en", 50).otherwise(80)
    documents(s, d)
      .withColumn("t", cleaned)
      .filter(regexp_count(col("t"), lit("\\S+")) >= 20)
      .withColumn("h", md5(col("t")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && bucket < rate)
      .select(col("doc_id"), col("lang"), length(col("t")).as("n_norm_chars"))
      .orderBy(col("doc_id"))
  }

  val x5Sql: String =
    """WITH norm AS (
      |  SELECT doc_id, lang,
      |    trim(regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'),
      |                        ' +', ' ', 'g')) AS t
      |  FROM documents),
      |q AS (SELECT * FROM norm WHERE length(regexp_extract_all(t, '\S+')) >= 20),
      |d AS (SELECT doc_id, lang, t,
      |        ROW_NUMBER() OVER (PARTITION BY md5(t) ORDER BY doc_id) AS rn
      |      FROM q)
      |SELECT doc_id, lang, length(t) AS n_norm_chars FROM d
      |WHERE rn = 1
      |  AND CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
      |      < CASE WHEN lang = 'en' THEN 50 ELSE 80 END
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- R25 (lag/lead analytics)
  /** Offset window functions: per-user event-over-event delta (lag) and
    * next-event type (lead). One shuffle on user_id; the subtraction is
    * a single deterministic double op on identical operands in both
    * engines, so no decimal detour is needed. */
  def r25(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"), col("event_type"))
      .withColumn("delta_value", round(col("value") - lag(col("value"), 1).over(w), 4))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("delta_value"), col("next_type"))
      .orderBy(col("event_id"))
  }

  val r25Sql: String =
    """SELECT event_id, user_id,
      |  ROUND(value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4)
      |    AS delta_value,
      |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- R26 (skew-safe salted aggregation)
  /** Two-phase salted aggregation: partial sums on (key, salt) — a hot
    * key's load spreads over 16 reducers — then combine partials. With
    * DECIMAL partials both phases are exact, so the result equals the
    * direct GROUP BY bit-for-bit (the oracle is the UNSALTED query,
    * which is the point: salting is a pure physical rewrite). This is
    * the aggregation-skew fallback AQE can't provide (AQE splits skewed
    * JOIN partitions, not agg groups); [[Skew.saltedJoin]] covers the
    * join side. */
  def r26(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("_salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("_salt"))
      .agg(sum(col("value").cast(DecimalType(28, 6))).as("_partial"),
        count(lit(1)).as("_n"))
      .groupBy(col("event_type"))
      .agg(r4(sum(col("_partial")).cast("double")).as("sum_value"),
        sum(col("_n")).as("n_events"))
      .orderBy(col("event_type"))

  val r26Sql: String =
    """SELECT event_type,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum_value,
      |  COUNT(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- R27 (merge / upsert)
  /** Last-write-wins MERGE: an existing compacted snapshot (events
    * before Jan 16) upserted with a compacted change set (events from
    * Jan 16 on). Keys present in the change set replace the snapshot
    * row (left_anti + union — the join touches only KEYS of the change
    * set, so merge cost scales with |changes|, not |snapshot|, given
    * both sides are hash-partitioned on the key). The oracle is
    * latest-per-key over the WHOLE table (r24): a correct incremental
    * merge must be indistinguishable from recomputing from scratch. */
  def r27(s: SparkSession, d: String): DataFrame = {
    val mid = lit("2024-01-16").cast("timestamp")
    def latest(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
    }
    val ev = events(s, d)
    val snapshot = latest(ev.filter(col("ts") < mid))
    val updates = latest(ev.filter(col("ts") >= mid))
    snapshot
      .join(updates.select(col("user_id").as("u2"), col("event_type").as("t2")),
        col("user_id") === col("u2") && col("event_type") === col("t2"), "left_anti")
      .unionByName(updates)
      .orderBy(col("user_id"), col("event_type"))
  }

  // a correct merge equals the from-scratch recompute — share r24's oracle
  val r27Sql: String = r24Sql

  // ---------------------------------------------------------------- R28 (explicit grouping sets)
  /** Explicit GROUPING SETS ((status), (priority), ()) — the
    * non-hierarchical multi-grain aggregate rollup/cube can't express
    * (two independent single-column grains + grand total, without the
    * cross grain). Planned as one Expand (3 rows per input) + one hash
    * aggregate: multi-grain costs one pass, not one pass per grain. */
  def r28(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        r4(dsum(col("o_totalprice"))).as("revenue"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("o_orderpriority"),
        col("n_orders"), col("revenue"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  val r28Sql: String =
    """SELECT COALESCE(o_orderstatus, '(all)') AS o_orderstatus,
      |  COALESCE(o_orderpriority, '(all)') AS o_orderpriority,
      |  COUNT(*) AS n_orders,
      |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 4) AS revenue
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- R29 (salted join)
  /** r03 recomputed through [[Skew.saltedJoin]]: the fact side spreads
    * each key over 16 salt sub-keys, the dim side replicates 16× —
    * a single hot custkey now lands on 16 reducers instead of one.
    * The oracle is r03's plain join: salting must be a pure physical
    * rewrite with an identical result set (the join-side complement of
    * r26's aggregation salting). */
  def r29(s: SparkSession, d: String): DataFrame =
    Skew.saltedJoin(
      orders(s, d).withColumnRenamed("o_custkey", "custkey"),
      customer(s, d).withColumnRenamed("c_custkey", "custkey"),
      "custkey", 16)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        r4(dsum(col("o_totalprice"))).as("revenue"))
      .orderBy(col("c_mktsegment"))

  val r29Sql: String = r03Sql

  // ---------------------------------------------------------------- R30 (Bloom-filter join)
  /** Semi-join through an explicit Bloom filter
    * (`org.apache.spark.util.sketch.BloomFilter`, seeded Murmur3): the
    * BUILDING-segment customer keys are folded into a ~1%-FPP bloom
    * (mergeable per-partition, built with one aggregate pass), the
    * filter rides the plan to the orders scan as a native codegen'd
    * probe expression ([[graft.functions.SketchFunctions
    * .bloomMightContainLong]] — no UDF, no boxing), and only rows that
    * might match reach the exact semi-join that removes the false
    * positives. No false negatives ⇒ result is exactly the plain
    * semi-join (the oracle).
    *
    * 100 TB story: 10⁸ build keys at 1% FPP is a ~114 MB bit array —
    * shippable where the key SET is not — and the fact-side scan drops
    * ~(1−sel−fpp) of its rows BEFORE the join shuffle. This is the
    * explicit form of the runtime-filter pushdown Spark only applies
    * under size thresholds; here it is an operator the user controls.
    * The residual exact join makes correctness independent of fpp. */
  def r30(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey")).cache()
    val bloom = cust.stat.bloomFilter("c_custkey", 100000L, 0.01)
    orders(s, d)
      // bloom prune (no FN): native codegen'd probe expression, not a
      // UDF — one inlined call per row inside the scan's codegen stage
      .filter(graft.functions.SketchFunctions.bloomMightContainLong(bloom, col("o_custkey")))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi") // exact residual
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        r4(dsum(col("o_totalprice"))).as("revenue"))
      .orderBy(col("o_orderstatus"))
  }

  val r30Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 4) AS revenue
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- R31 (exact percentiles)
  /** Exact distributed percentiles (median + p90 per event_type) — the
    * exact counterpart of r23's mergeable sketch: one sort-shuffle on
    * the group key ranks every row, then each percentile is read off
    * the two bracketing order statistics with explicit type-7 linear
    * interpolation (idx = p·(n−1); v_lo·(1−frac) + v_hi·frac). The
    * interpolation is written out explicitly IN BOTH ENGINES rather
    * than trusting `percentile`/`quantile_cont` builtins to share a
    * convention — the selected order statistics depend only on the
    * sorted multiset, so value ties make row numbering ambiguous but
    * the answer deterministic. The SUM collapsing the bracketing rows
    * has at most two nonzero terms (+ exact 0.0s), so it is order-
    * independent without the decimal-cast trick.
    *
    * Scale: exact percentiles NEED total per-group order — that sort
    * shuffle is irreducible (this is why r23's sketch exists); per-group
    * state beyond the sort is O(1). */
  def r31(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
    val ranked = events(s, d)
      .select(col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    def exactPct(p: Double): Column = {
      val idx0 = lit(p) * (col("n") - lit(1)).cast("double")
      val lo = floor(idx0)  // LONG in Spark; integral double in DuckDB — same value
      val hi = ceil(idx0)
      val frac = idx0 - lo
      round(sum(
        when(col("rn") === lo + 1, col("value") * (lit(1.0) - frac)).otherwise(lit(0.0)) +
          when(col("rn") === hi + 1 && hi =!= lo, col("value") * frac).otherwise(lit(0.0))), 4)
    }
    ranked.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        exactPct(0.5).as("median4"),
        exactPct(0.9).as("p904"))
      .orderBy(col("event_type"))
  }

  val r31Sql: String = {
    def pct(p: String): String =
      s"""SUM(CASE WHEN rn = floor($p * CAST(n - 1 AS DOUBLE)) + 1
         |         THEN value * (1.0 - ($p * CAST(n - 1 AS DOUBLE) - floor($p * CAST(n - 1 AS DOUBLE))))
         |         ELSE 0.0 END
         |  + CASE WHEN rn = ceil($p * CAST(n - 1 AS DOUBLE)) + 1
         |              AND ceil($p * CAST(n - 1 AS DOUBLE)) <> floor($p * CAST(n - 1 AS DOUBLE))
         |         THEN value * ($p * CAST(n - 1 AS DOUBLE) - floor($p * CAST(n - 1 AS DOUBLE)))
         |         ELSE 0.0 END)""".stripMargin
    s"""WITH r AS (
       |  SELECT event_type, value,
       |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
       |         COUNT(*) OVER (PARTITION BY event_type) AS n
       |  FROM events)
       |SELECT event_type, COUNT(*) AS n_rows,
       |  ROUND(${pct("0.5")}, 4) AS median4,
       |  ROUND(${pct("0.9")}, 4) AS p904
       |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------------------------------- R32 (session_window)
  /** Batch sessionization through Spark's NATIVE `session_window`
    * operator (dynamic-gap merging sessions inside one aggregate) — the
    * built-in counterpart of ST2's hand-rolled `flatMapGroupsWithState`
    * sessionizer. One shuffle on user_id; Spark merges overlapping
    * [ts, ts+gap) windows inside the aggregate, so a session closes
    * when the gap is ≥ 30 min (half-open windows: an event exactly at
    * the previous end starts a NEW session — the oracle's `>=` mirrors
    * that; ST2's `>` convention differs only on exact-boundary gaps).
    * Sums in DECIMAL for engine-exact totals, window bounds formatted
    * at µs precision. */
  def r32(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).cast("int").as("n_events"),
        round(sum(col("value").cast("decimal(28,6)")).cast("double"), 4).as("sum_value"))
      .select(col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  val r32Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |sessioned AS (
      |  SELECT user_id, ts, value,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id,
      |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      |  strftime(MAX(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S.%f') AS session_end,
      |  CAST(COUNT(*) AS INT) AS n_events,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum_value
      |FROM sessioned GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ---------------------------------------------------------------- R33 (unpivot)
  /** Wide→long reshaping through the NATIVE `unpivot` (melt) operator —
    * the inverse of R17's pivot: a per-flag wide aggregate (three
    * measure columns) melts into (key, measure, value) rows. Unpivot
    * is a zero-shuffle Expand (3 rows per input row) — the reshape
    * happens AFTER the aggregate, so the exploded form is |keys|·3
    * rows, never corpus-sized; at 100 TB you melt aggregates, not
    * facts. Measure values are the r4/dsum exact decimal sums, so the
    * long form hash-matches DuckDB's UNPIVOT bit for bit. */
  def r33(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        r4(dsum(col("l_quantity"))).as("sum_qty"),
        r4(dsum(col("l_extendedprice"))).as("sum_price"),
        r4(dsum(revenueTerm(col("l_extendedprice"), col("l_discount")))).as("sum_revenue"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_revenue")),
        "measure", "value")
      .orderBy(col("l_returnflag"), col("measure"))

  val r33Sql: String =
    """WITH wide AS (
      |  SELECT l_returnflag,
      |    ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum_qty,
      |    ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum_price,
      |    ROUND(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum_revenue
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, measure, value
      |FROM wide UNPIVOT (value FOR measure IN (sum_qty, sum_price, sum_revenue))
      |ORDER BY l_returnflag, measure""".stripMargin

  // ---------------------------------------------------------------- R34 (SCD type-2 history build)
  /** Slowly-changing-dimension TYPE-2 build: each user's event_type
    * change history compiled into validity intervals [valid_from,
    * valid_to) with the open (current) interval carrying NULL valid_to
    * — the write side of the dimension table whose read side is r19's
    * as-of join (and whose degenerate keep-only-latest form is r24).
    * A change point is any event whose type differs from the user's
    * previous event (ties broken by event_id); the interval carries its
    * event count and exact decimal value sum.
    *
    * Scale: every step is keyed by user_id — the change-flag window,
    * the running interval-id sum, the (user_id, grp) interval
    * aggregate, and the valid_to lead all reuse ONE hash exchange
    * (HashPartitioning(user_id) satisfies each downstream clustering
    * requirement), so the whole history build is a single shuffle of
    * the events at any scale; the lead runs over interval rows, which
    * are bounded by the CHANGE count, not history length. */
  def r34(s: SparkSession, d: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val prevType = lag(col("event_type"), 1).over(byTime)
    val byInterval = Window.partitionBy(col("user_id")).orderBy(col("grp"))
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    events(s, d)
      .withColumn("chg",
        when(prevType.isNull || prevType =!= col("event_type"), 1).otherwise(0))
      .withColumn("grp", sum(col("chg")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("event_type")).as("event_type"),
        min(col("ts")).as("vf"),
        count(lit(1)).cast("int").as("n_events"),
        r4(dsum(col("value"))).as("sum_value"))
      .withColumn("vt", lead(col("vf"), 1).over(byInterval))
      .select(col("user_id"), col("event_type"),
        date_format(col("vf"), fmt).as("valid_from"),
        date_format(col("vt"), fmt).as("valid_to"),
        col("vt").isNull.as("is_current"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("valid_from"))
  }

  val r34Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |grouped AS (
      |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM flagged),
      |iv AS (
      |  SELECT user_id, grp, MIN(event_type) AS event_type, MIN(ts) AS vf,
      |         CAST(COUNT(*) AS INT) AS n_events,
      |         ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum_value
      |  FROM grouped GROUP BY user_id, grp)
      |SELECT user_id, event_type,
      |  strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
      |  strftime(lead(vf) OVER iw, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
      |  lead(vf) OVER iw IS NULL AS is_current,
      |  n_events, sum_value
      |FROM iv
      |WINDOW iw AS (PARTITION BY user_id ORDER BY grp)
      |ORDER BY user_id, valid_from""".stripMargin

  // ---------------------------------------------------------------- R35 (incremental aggregate maintenance)
  /** Incremental MATERIALIZED-VIEW maintenance — the delta-refresh that
    * keeps an aggregate table current without rescanning the fact
    * table: a monthly-revenue view over orders is refreshed with a
    * late-arriving batch (orderkey ≡ 3 mod 17 — the stand-in for the
    * changelog a CDC feed would deliver) by aggregating ONLY the delta
    * and merging partial states into the stored view — count merges by
    * +, the revenue sum merges as EXACT decimals (rounding happens
    * once, after the merge, so refresh order can never leak into the
    * stored value).
    *
    * Scale: refresh cost ∝ |delta| (one map-side-combined aggregate
    * over the batch) + a join on the VIEW keyspace (months ×
    * statuses — broadcast-sized forever), never the base facts; the
    * base aggregate here is computed from the retained split because
    * the gate is stateless, but in production it IS the stored table —
    * the merge expression is the whole operator. The full_outer USING
    * join makes delta-only groups (a month's first-ever orders) appear
    * and base-only groups survive untouched.
    *
    * Oracle: the merged view must equal the from-scratch aggregate
    * over ALL orders, hash-exact — associativity of the partial states
    * is the thing being proved. */
  def r35(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val isLate = col("o_orderkey") % 17 === 3
    def part(src: DataFrame): DataFrame =
      src.groupBy(col("o_orderstatus"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast(DecimalType(28, 6))).as("rev"))
    val base = part(o.filter(!isLate))       // stands in for the stored view
    val delta = part(o.filter(isLate))       // the refresh batch's aggregate
    base.as("b")
      .join(delta.as("dl"), Seq("o_orderstatus", "month"), "full_outer")
      .select(col("o_orderstatus"), col("month"),
        (coalesce(col("b.cnt"), lit(0L)) + coalesce(col("dl.cnt"), lit(0L)))
          .as("n_orders"),
        r4((coalesce(col("b.rev"), lit(java.math.BigDecimal.ZERO).cast(DecimalType(28, 6))) +
          coalesce(col("dl.rev"), lit(java.math.BigDecimal.ZERO).cast(DecimalType(28, 6))))
          .cast("double")).as("revenue"))
      .orderBy(col("o_orderstatus"), col("month"))
  }

  val r35Sql: String =
    """SELECT o_orderstatus,
      |  STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m') AS month,
      |  COUNT(*) AS n_orders,
      |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 4) AS revenue
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- R36 (funnel analysis)
  /** Ordered-funnel analysis — the product-analytics staple: how many
    * users progressed view → click → purchase IN ORDER and WITHIN the
    * conversion window (a click counts in [first view, +1 day]; a
    * purchase in [that click, +1 day] — the windowed form every
    * funnel product uses, which also keeps the stages discriminating
    * on long-lived users), with per-stage conversion in basis points
    * of the stage-1 population. Ties on ts are admitted (≥).
    *
    * Scale: three per-user MIN aggregates chained by user_id-keyed
    * joins — every step clusters on user_id, so the whole funnel is
    * hash-exchange-reused on one key (r34's discipline); stage frames
    * shrink monotonically (stage k joins only stage k−1 survivors);
    * the 3-row result folds from \|users\|-sized frames by one
    * map-side-combined count each. Integer output ⇒ hash-exact. */
  def r36(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = ev.filter(col("event_type") === "click").as("e")
      .join(v, Seq("user_id"))
      .filter(col("ts") >= col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 1 DAY"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase").as("e")
      .join(c, Seq("user_id"))
      .filter(col("ts") >= col("t2") &&
        col("ts") <= col("t2") + expr("INTERVAL 1 DAY"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val n1 = v.count(); val n2 = c.count(); val n3 = p.count()
    import s.implicits._
    Seq((1, "view", n1, 10000L),
        (2, "click", n2, if (n1 == 0) 0L else n2 * 10000L / n1),
        (3, "purchase", n3, if (n1 == 0) 0L else n3 * 10000L / n1))
      .toDF("stage", "event_type", "n_users", "conv_bp")
      .orderBy(col("stage"))
  }

  val r36Sql: String =
    """WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, MIN(e.ts) AS t2
      |      FROM events e JOIN v ON v.user_id = e.user_id
      |      WHERE e.event_type = 'click' AND e.ts >= v.t1
      |        AND e.ts <= v.t1 + INTERVAL 1 DAY GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(e.ts) AS t3
      |      FROM events e JOIN c ON c.user_id = e.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts >= c.t2
      |        AND e.ts <= c.t2 + INTERVAL 1 DAY GROUP BY 1),
      |n AS (SELECT (SELECT COUNT(*) FROM v) AS n1,
      |             (SELECT COUNT(*) FROM c) AS n2,
      |             (SELECT COUNT(*) FROM p) AS n3)
      |SELECT stage, event_type, n_users, conv_bp FROM (
      |  SELECT 1 AS stage, 'view' AS event_type, n1 AS n_users,
      |         CAST(10000 AS BIGINT) AS conv_bp FROM n
      |  UNION ALL
      |  SELECT 2, 'click', n2,
      |         CASE WHEN n1 = 0 THEN 0 ELSE n2 * 10000 // n1 END FROM n
      |  UNION ALL
      |  SELECT 3, 'purchase', n3,
      |         CASE WHEN n1 = 0 THEN 0 ELSE n3 * 10000 // n1 END FROM n) t
      |ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------- R37 (RFM segmentation)
  /** RFM (recency / frequency / monetary) quartile segmentation — the
    * warehouse CRM staple: per user, last-event time, event count and
    * exact decimal spend; each metric ranked over ALL users (best
    * first, user_id tie-break) and cut into quartiles; output is the
    * segment lattice (r_q, f_q, m_q) with user counts, event counts
    * and revenue.
    *
    * The global rank is the one shape a `Window.orderBy` must never
    * take at scale (single-reducer sort of the user frame) — so the
    * rank comes from [[Corpus.prefixSum]]'s two-phase distributed
    * scan (range-partition + per-partition counts scanned on the
    * driver), three passes over the \|users\| frame, each ONE range
    * shuffle, driver state = numPartitions longs. NTILE itself is
    * deliberately NOT used: its first-buckets-get-the-remainder fill
    * rule would have to be reproduced bit-for-bit in both engines, so
    * instead the rank→quartile rule is written out explicitly in BOTH
    * engines (r31's discipline): q = rank0 * 4 DIV n + 1 — bucket
    * sizes still differ by at most one, and the rule is one integer
    * expression. Ties are impossible by construction (user_id breaks
    * every ordering), spend is an exact decimal sum (order-
    * independent), so the ranks — and the integer segment counts —
    * are hash-exact across engines. */
  def r37(s: SparkSession, d: String): DataFrame = {
    val u = events(s, d)
      .groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_ts"),
        count(lit(1)).as("freq"),
        sum(col("value").cast(DecimalType(28, 6))).as("mon"))
      .withColumn("one", lit(1L))
    val n = u.count()
    def quart(df: DataFrame, ord: Seq[Column], name: String): DataFrame =
      Corpus.prefixSum(df, ord, "one")
        .withColumn(name, expr(s"CAST(prefix * 4 DIV $n AS BIGINT) + 1"))
        .drop("prefix")
    val q = quart(quart(quart(u,
      Seq(col("last_ts").desc, col("user_id")), "r_q"),
      Seq(col("freq").desc, col("user_id")), "f_q"),
      Seq(col("mon").desc, col("user_id")), "m_q")
    q.groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("freq")).as("n_events"),
        r4(sum(col("mon")).cast("double")).as("revenue"))
      .orderBy(col("r_q"), col("f_q"), col("m_q"))
  }

  val r37Sql: String =
    """WITH u AS (SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS freq,
      |                  SUM(CAST(value AS DECIMAL(28,6))) AS mon
      |           FROM events GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n FROM u),
      |q AS (SELECT freq, mon,
      |        (ROW_NUMBER() OVER (ORDER BY last_ts DESC, user_id) - 1) * 4
      |          // (SELECT n FROM n) + 1 AS r_q,
      |        (ROW_NUMBER() OVER (ORDER BY freq DESC, user_id) - 1) * 4
      |          // (SELECT n FROM n) + 1 AS f_q,
      |        (ROW_NUMBER() OVER (ORDER BY mon DESC, user_id) - 1) * 4
      |          // (SELECT n FROM n) + 1 AS m_q
      |      FROM u)
      |SELECT r_q, f_q, m_q, COUNT(*) AS n_users,
      |       CAST(SUM(freq) AS BIGINT) AS n_events,
      |       ROUND(CAST(SUM(mon) AS DOUBLE), 4) AS revenue
      |FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- R38 (data-quality validation report)
  /** Declarative data-quality validation — the Deequ/Great-Expectations
    * shape every production warehouse runs before publishing a table:
    * a fixed check suite (range, domain, uniqueness, referential
    * integrity) evaluated over the raw tables, one report row per
    * (table, check) with the table's row count, the violation count
    * and a pass verdict. A clean corpus reports zeros — the report's
    * value is that the zeros are MEASURED, not assumed, and the same
    * frame drives alerting when they stop being zero.
    *
    * Scale shape (the Deequ insight): every scan-expressible check on
    * a table fuses into ONE map-side-combined conditional aggregate —
    * adding a check adds a sum, not a pass, so the suite costs one
    * corpus read per table at any table count. The two referential
    * checks are the only joins, and their SHAPE is a wired regime
    * switch on the referenced key count (t12's ceiling discipline):
    * below [[r38BloomMinKeys]] the key set broadcasts and the anti
    * join is the plain broadcast one (hash-exact gate lane); at or
    * above it the key set no longer fits an executor twice, so the
    * r30 Bloom rides the fact scan instead — rows the bloom rejects
    * are DEFINITE orphans (no false negatives) counted with no join
    * at all, and only the bloom-accepted rows reach the residual
    * shuffle anti join that catches the ~fpp false-positive orphans.
    * On a dirty 100 TB fact table the orphans (the rows the check
    * exists to find) never enter the shuffle. Both lanes are exactly
    * equal — PipelineSpec forces the threshold to 0 and asserts
    * bloom-probe plan + bit-identical report. Uniqueness folds into
    * the same single aggregate as COUNT(*) − COUNT(DISTINCT key) —
    * no second pass, no self-join. Integer counts ⇒ hash-exact. */
  private val r38BloomMinKeys = 10000000L

  def r38(s: SparkSession, d: String): DataFrame =
    r38Impl(s, d, r38BloomMinKeys)

  private[graft] def r38Impl(s: SparkSession, d: String,
                             bloomMinKeys: Long): DataFrame = {
    import org.apache.spark.sql.types.LongType
    def viol(cond: Column): Column =
      sum(when(cond, 1L).otherwise(0L)).cast(LongType)
    // referential-integrity violation count, lane picked per referenced
    // key cardinality — read from parquet FOOTER metadata (the lane
    // probe must not cost a dim-table scan per check; the count() path
    // is only the fallback for a non-parquet layout)
    def riViolations(fact: DataFrame, factKey: String, dim: DataFrame,
                     dimKey: String, out: String): DataFrame = {
      val keys = dim.select(col(dimKey))
      val nKeys = graft.sources.Tables.parquetRowCountOfScan(s, dim)
        .getOrElse(keys.count())
      if (nKeys < bloomMinKeys)
        fact.select(col(factKey))
          .join(keys, col(factKey) === col(dimKey), "left_anti")
          .agg(count(lit(1)).cast(LongType).as(out))
      else {
        val bloom = keys.stat.bloomFilter(dimKey, math.max(nKeys, 1000L), 0.01)
        val probe = graft.functions.SketchFunctions
          .bloomMightContainLong(bloom, col(factKey))
        // a NULL fact key is a DEFINITE orphan (the anti-join lane and
        // the NOT EXISTS oracle both count it) — the null-safe bloom
        // probe returns NULL for it, which a bare !probe/probe pair
        // would drop from BOTH branches
        val definite = fact.select(col(factKey))
          .filter(col(factKey).isNull || !probe)
          .agg(count(lit(1)).cast(LongType).as("v_definite"))
        // the residual join must NOT broadcast — above the ceiling the
        // key set is exactly what doesn't fit; hint the merge join so
        // the forced-threshold spec exercises the true at-scale plan
        val residual = fact.select(col(factKey))
          .filter(col(factKey).isNotNull && probe)
          .join(keys.hint("SHUFFLE_MERGE"),
            col(factKey) === col(dimKey), "left_anti")
          .agg(count(lit(1)).cast(LongType).as("v_residual"))
        definite.crossJoin(residual) // bounded: two ONE-row aggregates
          .select((col("v_definite") + col("v_residual")).as(out))
      }
    }
    // one row: (n, v1, v2, ...) → one report row per check
    def report(tbl: String, agg: DataFrame, checks: Seq[String]): DataFrame =
      agg.select(lit(tbl).as("tbl"),
        explode(array(checks.map(c =>
          struct(lit(c).as("chk"), col(s"v_$c").as("violations"))): _*)).as("e"),
        col("n"))
        .select(col("tbl"), col("e.chk").as("chk"), col("n").as("n_rows"),
          col("e.violations").as("violations"),
          (col("e.violations") === 0L).as("pass"))

    val li = lineitem(s, d)
    val ord = orders(s, d)
    val cust = customer(s, d)

    val liAgg = li.agg(
      count(lit(1)).as("n"),
      viol(col("l_quantity").isNull || col("l_quantity") < 1 ||
        col("l_quantity") > 50).as("v_quantity_range"),
      viol(col("l_discount").isNull || col("l_discount") < 0 ||
        col("l_discount") > 0.1).as("v_discount_range"),
      viol(col("l_extendedprice").isNull ||
        col("l_extendedprice") <= 0).as("v_price_positive"))
    val liOrphans = riViolations(li, "l_orderkey", ord, "o_orderkey",
      "v_ri_orderkey")

    val ordAgg = ord.agg(
      count(lit(1)).as("n"),
      viol(!col("o_orderstatus").isin("O", "F", "P")).as("v_status_domain"),
      viol(col("o_totalprice").isNull ||
        col("o_totalprice") <= 0).as("v_price_positive"),
      (count(lit(1)) - countDistinct(col("o_orderkey")))
        .cast(LongType).as("v_orderkey_unique"))
    val ordOrphans = riViolations(ord, "o_custkey", cust, "c_custkey",
      "v_ri_custkey")

    val custAgg = cust.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - countDistinct(col("c_custkey")))
        .cast(LongType).as("v_custkey_unique"),
      viol(col("c_name").isNull).as("v_name_not_null"),
      viol(col("c_mktsegment").isNull).as("v_segment_not_null"))

    report("lineitem", liAgg.crossJoin(liOrphans), // bounded: ONE-row folds
        Seq("quantity_range", "discount_range", "price_positive", "ri_orderkey"))
      .unionAll(report("orders", ordAgg.crossJoin(ordOrphans), // bounded: ONE-row folds
        Seq("status_domain", "price_positive", "orderkey_unique", "ri_custkey")))
      .unionAll(report("customer", custAgg,
        Seq("custkey_unique", "name_not_null", "segment_not_null")))
      .orderBy(col("tbl"), col("chk"))
  }

  val r38Sql: String =
    """WITH li AS (SELECT COUNT(*) AS n,
      |  COUNT(*) FILTER (l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50) AS v_qty,
      |  COUNT(*) FILTER (l_discount IS NULL OR l_discount < 0 OR l_discount > 0.1) AS v_disc,
      |  COUNT(*) FILTER (l_extendedprice IS NULL OR l_extendedprice <= 0) AS v_price
      |  FROM lineitem),
      |liri AS (SELECT COUNT(*) AS v FROM lineitem l
      |         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
      |od AS (SELECT COUNT(*) AS n,
      |  COUNT(*) FILTER (o_orderstatus NOT IN ('O','F','P')) AS v_status,
      |  COUNT(*) FILTER (o_totalprice IS NULL OR o_totalprice <= 0) AS v_price,
      |  COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_uniq
      |  FROM orders),
      |odri AS (SELECT COUNT(*) AS v FROM orders o
      |         WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
      |cu AS (SELECT COUNT(*) AS n,
      |  COUNT(*) - COUNT(DISTINCT c_custkey) AS v_uniq,
      |  COUNT(*) FILTER (c_name IS NULL) AS v_name,
      |  COUNT(*) FILTER (c_mktsegment IS NULL) AS v_seg
      |  FROM customer)
      |SELECT tbl, chk, n_rows, violations, violations = 0 AS pass FROM (
      |  SELECT 'lineitem' AS tbl, 'quantity_range' AS chk, n AS n_rows, v_qty AS violations FROM li
      |  UNION ALL SELECT 'lineitem', 'discount_range', n, v_disc FROM li
      |  UNION ALL SELECT 'lineitem', 'price_positive', n, v_price FROM li
      |  UNION ALL SELECT 'lineitem', 'ri_orderkey', (SELECT n FROM li), v FROM liri
      |  UNION ALL SELECT 'orders', 'status_domain', n, v_status FROM od
      |  UNION ALL SELECT 'orders', 'price_positive', n, v_price FROM od
      |  UNION ALL SELECT 'orders', 'orderkey_unique', n, v_uniq FROM od
      |  UNION ALL SELECT 'orders', 'ri_custkey', (SELECT n FROM od), v FROM odri
      |  UNION ALL SELECT 'customer', 'custkey_unique', n, v_uniq FROM cu
      |  UNION ALL SELECT 'customer', 'name_not_null', n, v_name FROM cu
      |  UNION ALL SELECT 'customer', 'segment_not_null', n, v_seg FROM cu) t
      |ORDER BY tbl, chk""".stripMargin

  // ---------------------------------------------------------------- R39 (cohort retention)
  /** Weekly COHORT-RETENTION matrix — the growth-analytics staple
    * beside r36's funnel and r37's RFM: users are cohorted by the
    * week of their FIRST event ("signup week"); for each (cohort,
    * week offset k) the matrix counts how many of that cohort were
    * active in cohort-week + k, with retention in basis points of the
    * cohort size. Week buckets are Monday-start `date_trunc('week')`
    * in BOTH engines; offsets are day-difference DIV 7 (exact — both
    * endpoints are week starts), and every output is an integer, so
    * the query hash-matches.
    *
    * Scale: one per-user MIN aggregate (the cohort frame), one
    * distinct per-(user, week) activity projection, and ONE
    * user_id-keyed join between them — all cluster on user_id; the
    * matrix itself folds map-side to |cohorts × offsets| rows and the
    * cohort-size join is broadcast-sized forever. No window, no
    * corpus-wide sort; at 100 TB of events the cost is two
    * map-side-combined aggregates and one co-keyed shuffle. */
  def r39(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("ts"))
    val first = ev.groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      .select(col("user_id"),
        date_format(date_trunc("week", col("t0")), "yyyy-MM-dd").as("cohort"),
        to_date(date_trunc("week", col("t0"))).as("cw"))
    val sizes = first.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_size"))
    val weeks = ev
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("w"))
      .distinct()
    weeks.join(first, Seq("user_id"))
      .withColumn("week_offset", expr("CAST(datediff(w, cw) DIV 7 AS BIGINT)"))
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort"))
      .select(col("cohort"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        expr("n_active * 10000 DIV cohort_size").as("retention_bp"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  val r39Sql: String =
    """WITH f AS (SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY 1),
      |fc AS (SELECT user_id,
      |              STRFTIME(DATE_TRUNC('week', t0), '%Y-%m-%d') AS cohort,
      |              CAST(DATE_TRUNC('week', t0) AS DATE) AS cw FROM f),
      |sz AS (SELECT cohort, COUNT(*) AS cohort_size FROM fc GROUP BY 1),
      |wk AS (SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS w
      |       FROM events),
      |a AS (SELECT fc.cohort, (w - cw) // 7 AS week_offset, COUNT(*) AS n_active
      |      FROM wk JOIN fc ON wk.user_id = fc.user_id GROUP BY 1, 2)
      |SELECT a.cohort, CAST(a.week_offset AS BIGINT) AS week_offset,
      |       a.n_active, sz.cohort_size,
      |       a.n_active * 10000 // sz.cohort_size AS retention_bp
      |FROM a JOIN sz ON a.cohort = sz.cohort
      |ORDER BY a.cohort, week_offset""".stripMargin

  // ---------------------------------------------------------------- R40 (fuzzy join)
  /** Edit-distance FUZZY self-join — the entity-resolution / data-
    * cleaning staple (dirty keys, OCR noise, typo'd identifiers):
    * every pair of customer names within Levenshtein distance 2 —
    * the distance production entity resolution actually runs at —
    * with the distance as evidence.
    *
    * The naive form is an O(n²) cross join with a string-DP predicate
    * — a non-starter at any scale. Plain SymSpell at k=2 (join on
    * ≤2-deletion variants) is exact but collapses on LOW-ENTROPY keys:
    * on serial-ID-shaped names every 2-deletion bucket holds every key
    * sharing a digit subsequence, and Σ bucket² goes superlinear
    * (measured 39 s at sf0.1 before this form). The engine instead
    * blocks on mixed DELETION + POSITIONAL-WILDCARD forms: each name
    * emits every form reachable by deleting d chars and replacing w
    * chars with a reserved wildcard (d + w ≤ 2, O(L²) forms), tagged
    * with (d, w); candidates are form-hash equi-matches obeying
    * d_a + d_b + max(w_a, w_b) ≤ 2.
    *
    * EXACT by the edit-pattern decomposition: lev(a,b) ≤ 2 means s
    * substitutions + i insert/deletes with s + i ≤ 2 — wildcard the s
    * substituted positions on both sides, delete the i indel chars
    * from whichever side holds them, and the two forms are EQUAL with
    * d_a + d_b = i, w_a = w_b = s, so the rule admits them. And TIGHT:
    * any admitted string-equal pair is itself a witness of ≤2 edits
    * (re-insert the deleted chars, un-wildcard the ≤max(w) positions —
    * equal forms force IDENTICAL wildcard positions, so the witness is
    * d_a + d_b + w ≤ 2 real edits), so every candidate IS a true match
    * — candidate mass ≈ answer mass (measured 2.25× multiplicity at
    * sf0.1), never bucket². Wildcards pin POSITIONS, which is what
    * deletion variants lose: two serials sharing a stray subsequence
    * no longer collide.
    *
    * The join key is the form STRING itself, compared exactly — so
    * there are no hash collisions and `dist` is a post-distinct
    * PROJECTION, not a filter. That is deliberate, not cosmetic: a
    * `filter(levenshtein ≤ 2)` after the distinct gets pushed by
    * Catalyst through the aggregate INTO the join residual, where it
    * lands FIRST in the conjunction — every bucket cross-pair then
    * pays the O(L²) DP before the cheap lane rule can reject it
    * (measured 3× the whole query). With exact form equality the DP
    * is provably redundant as a predicate (tightness above) and runs
    * once per distinct answer pair as evidence.
    *
    * Scale: |forms| ≈ 2L²·n rows shuffled once — ONE equi-join whose
    * output is proportional to the true-match density. The answer
    * itself is the scale driver (dense key spaces have dense match
    * sets), which is the right cost model for a fuzzy join; AQE
    * splits any residual hot form bucket. */
  def r40(s: SparkSession, d: String): DataFrame = r40Impl(s, d, None)

  /** [[r40]] with a forced join lane, so the lane-equivalence spec can
    * drive both shapes over the same corpus. */
  private[graft] def r40Impl(s: SparkSession, d: String,
                             forceLane: Option[String]): DataFrame = {
    val sess = s
    import sess.implicits._
    val c = customer(s, d).select(col("c_name").as("name"))
    val vars = c.as[String].flatMap(levForms _)
      .toDF("form", "name", "d", "w")
    // ONE name-frame aggregate serves both decisions below: evaluated
    // by the lane pick, or (under forceLane) lazily by formsBound
    lazy val bytesBound = r40BytesBound(c)
    val lane = forceLane.getOrElse(
      if (bytesBound <=
        96L * 1024 * 1024 * s.conf.get("spark.sql.shuffle.partitions").toInt)
        "shuffle_hash"
      else "grouped")
    // "grouped" is the ONE-shuffle shape: cluster the form frame once,
    // expand pairs inside each form group (round-12 refinement #3,
    // measured this round against the join lanes — see BASELINE.md);
    // the join lanes shuffle the same frame twice (once per side).
    // formsBound lets the grouped lane SKIP its oversized-group
    // pre-count whenever the WHOLE frame fits the cap — derived FREE
    // from the lane pick's own aggregate: every bytesBound term is
    // ≥ 96× the forms term ((2l²+1)(2l+96) ≥ 96(2l²+1)), so
    // bytesBound/96 over-estimates the form count, which can only
    // disable the skip, never breach the cap.
    lazy val formsBound = bytesBound / 96
    val cand =
      if (lane == "grouped") r40GroupedPairs(s, vars, formsBound)
      else vars.as("a")
        .hint(lane)
        .join(vars.as("b"),
          col("a.form") === col("b.form") && col("a.name") < col("b.name") &&
            col("a.d") + col("b.d") + greatest(col("a.w"), col("b.w")) <= 2 &&
            // canonical-witness prune LAST in the conjunction: cuts the
            // distinct's input from 2.25× answer mass to ≈ answer mass
            // without changing its output (see r40CanonicalKeep)
            r40CanonicalCol(col("a.form"), col("a.name"), col("a.d"),
              col("a.w"), col("b.name"), col("b.d"), col("b.w")))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
        .distinct()
    cand.withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** Candidate-pair expansion for the "grouped" lane: ONE hash shuffle
    * clusters the form frame by form, then each group expands its
    * admissible pairs locally — versus the join lanes' two shuffles of
    * the same frame. Within a group every name appears at most once
    * (the form string pins w = #wildcards, and d = len(name) −
    * len(form), so (form, name) determines (d, w) and [[levForms]]
    * dedupes), and the admission rule needs only the group's rows.
    * Group size is ANSWER-shaped by the blocking's tightness (hot
    * forms on id-shaped keys hold ~#alphabet names), so the in-memory
    * group is bounded in practice.
    *
    * Degenerate corpora (a form shared by more than [[GroupCap]] rows —
    * millions of identical keys, a data bug whose exact answer is
    * quadratic in the group) DEGRADE instead of stopping: a group-size
    * pre-count routes ONLY the oversized forms through the spilling
    * sort-merge self-join and unions them with the grouped expansion of
    * everything else. The pre-count itself is paid only when the frame
    * could possibly hold such a group — `formsBound` (an OVER-estimate
    * of TOTAL form rows, derived from the lane pick's bytes bound by
    * dividing out the minimum per-row footprint, so it can run up to
    * ~(2l+96)/96 high for l-char names — safe: overestimating only
    * disables the skip) lets the common path skip it outright, and
    * when it does run, the oversized-form list it collects is bounded
    * by formsBound/GroupCap rows (correspondingly loose, ≤ ~75 at the
    * 100M-row sweep frame). */
  private[graft] def r40GroupedPairs(s: SparkSession, vars: DataFrame,
                                     formsBound: Long = Long.MaxValue,
                                     GroupCap: Int = 4 << 20): DataFrame = {
    val sess = s
    import sess.implicits._
    def expand(part: DataFrame): DataFrame = part
      .as[(String, String, Int, Int)]
      .groupByKey(_._1)
      .flatMapGroups { (form, it) =>
        // bounded: one form's rows — answer-shaped by blocking tightness,
        // ≤ GroupCap by the pre-count contract (oversized forms were
        // routed to the merge lane before this expansion ran). take one
        // PAST the cap so the contract's breach is loud, not an OOM
        val rows = it.take(GroupCap + 1).toArray // local: capped group buffer
        if (rows.length > GroupCap)
          throw new IllegalStateException(
            s"r40 form group '$form' exceeds $GroupCap rows — the " +
              "oversized-group pre-count contract was violated")
        java.util.Arrays.sort(rows,
          Ordering.by((t: (String, String, Int, Int)) => t._2))
        // pairs emitted LAZILY over the sorted array: buffering them
        // would be O(group²) memory — the cap bounds ROWS, not pairs
        Iterator.range(0, rows.length).flatMap { i =>
          val (_, na, da, wa) = rows(i)
          Iterator.range(i + 1, rows.length).flatMap { j =>
            val (_, nb, db, wb) = rows(j)
            // same admission as the join lanes, canonical prune included
            // (the predicate is symmetric in its two (name, d, w) roles)
            if (na != nb && da + db + math.max(wa, wb) <= 2 &&
                r40CanonicalKeep(form, na, da, wa, nb, db, wb))
              Iterator.single((na, nb))
            else Iterator.empty
          }
        }
      }
      .toDF("name_a", "name_b")
    val bigForms: Seq[String] =
      if (formsBound <= GroupCap) Nil // no group CAN exceed the cap
      else vars.groupBy("form").count()
        .filter(col("count") > GroupCap).select("form")
        .as[String].collect().toSeq // bounded: ≤ formsBound/GroupCap degenerate forms
    val pairs =
      if (bigForms.isEmpty) expand(vars)
      else {
        val small = expand(vars.filter(!col("form").isin(bigForms: _*)))
        val bigVars = vars.filter(col("form").isin(bigForms: _*))
        // the spilling lane: sort-based, degrades on disk instead of
        // failing — the right shape for a group whose pair set is huge
        val big = bigVars.as("a")
          .hint("merge")
          .join(bigVars.as("b"),
            col("a.form") === col("b.form") && col("a.name") < col("b.name") &&
              col("a.d") + col("b.d") +
                greatest(col("a.w"), col("b.w")) <= 2 &&
              r40CanonicalCol(col("a.form"), col("a.name"), col("a.d"),
                col("a.w"), col("b.name"), col("b.d"), col("b.w")))
          .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
        small.union(big)
      }
    pairs.distinct()
  }

  /** Join-lane picker for [[r40]]'s exploded self-join. Both sides are
    * the O(L²)·n form frame — at scale neither fits a driver broadcast
    * (AQE would pick a borderline broadcast at small sf and flip shape
    * as the corpus grows), and the JOIN lane is a memory decision AQE
    * doesn't make for us: shuffle-hash builds a per-partition hash map
    * over the build side, which measured 1.6× faster than the sort at
    * gate scale (9.4 vs 14.8 s at sf0.1's 10M forms) but threw
    * SparkOutOfMemoryError ("not enough memory to build hash map") at
    * the 10× sweep point's 100M-row frame. So pick the lane from an
    * EXACT BYTES bound — one tiny driver aggregate on the name frame
    * (x23/r38's lane-picker discipline: the probe is broadcast-sized
    * relative to the frame it predicts): per name,
    * |forms| ≤ 2L² + 1 (1 identity + 2L single edits + 2·C(L,2)
    * double-deletes/wildcards + L(L−1) mixed), and each form row costs
    * ≈ 2L + 96 B in the hash relation (two ≤L-char UTF8 strings + two
    * ints in an UnsafeRow + map-entry overhead). Summing
    * (2L²+1)·(2L+96) over names SELF-TUNES to the key width — the old
    * 1M-rows/partition constant silently assumed ~100 B rows and
    * would have OOMed on long keys. Shuffle-hash is picked only when
    * the MEAN per-partition build side is ≤ 96 MB — ¼ of the measured
    * OOM point (~412 MB/partition mean at the 10× frame), so a bucket
    * 4× hotter than the mean still fits; a NULL sum (empty name
    * frame) coalesces to 0 instead of NPE-ing. Past the ceiling,
    * the GROUPED per-form pair expansion — ONE shuffle of the form
    * frame instead of the join lanes' two, sort-based grouping that
    * degrades by SPILLING instead of failing, measured 42.0 s vs
    * sort-merge's 65.2 s at the 10× 100M-row frame where shuffle-hash
    * OOMs (round-13 r40lanes sweep; 3× is a tie with hash, so the
    * below-ceiling pick keeps the codegen'd join). Sort-merge stays
    * reachable via the forced lane for the equivalence spec. */
  private[graft] def r40PickLane(names: DataFrame, parts: Int): String =
    if (r40BytesBound(names) <= 96L * 1024 * 1024 * parts) "shuffle_hash"
    else "grouped"

  /** The exact hash-relation bytes bound the lane picker decides on —
    * split out so [[r40]] pays the name-frame aggregate ONCE and
    * derives its forms bound from the same number. */
  private[graft] def r40BytesBound(names: DataFrame): Long = {
    // cast BEFORE squaring: 2·l² in IntegerType wraps negative past
    // ~32k-char names in non-ANSI mode and would silently deflate the
    // bound into picking shuffle_hash on an OOM-sized build side
    val l = length(col(names.columns.head)).cast("long") // local: Array.head on the schema's column names
    names
      .agg(coalesce(
        sum((lit(2L) * l * l + lit(1L)) * (lit(2L) * l + lit(96L))),
        lit(0L)))
      .head.getLong(0) // bounded: ONE-row sum aggregate
  }

  /** All (form, name, d, w) blocking rows for [[r40]]: the name with d
    * chars deleted and w positions wildcarded (reserved U+0001 — never
    * present in key data), d + w ≤ 2, deduped (repeated chars collide
    * distinct position choices). ≈ 2L² forms per name.
    *
    * Round-17 fast path (set-identical to [[levFormsGeneric]], pinned
    * by the RelationalSpec equivalence test): the generic form paid a
    * LinkedHashSet insert (tuple alloc + hash) plus 1–2 StringBuilder
    * copies per candidate form, ~2L² times per name — the dominant
    * per-row cost of the blocking scan. This emission dedupes each
    * category by construction instead:
    *  - wildcard-only forms (0,1)/(0,2) are pairwise DISTINCT when the
    *    name holds no reserved U+0001 char (each form's wildcard
    *    position set is recoverable from the string, and the sets
    *    differ), and distinct from every other category (length or
    *    wildcard count differs) — emitted with no dedup at all;
    *  - single deletions (1,0) collide exactly when the deleted chars
    *    sit in one run of equal chars, so one emission per RUN is the
    *    deduped set;
    *  - (1,1) and (2,0) derive only from run-representative first
    *    deletions (non-representative run members produce the same
    *    intermediate string, hence the same forms; for (2,0) the union
    *    over a run's members of the second-delete ranges equals the
    *    representative's range, since its first index is the run
    *    minimum) and dedupe within their own category via one
    *    HashSet[String] each ((1,1) carries a wildcard, (2,0) is two
    *    chars shorter — never cross-category string-equal).
    * Names that DO contain U+0001 (outside the key contract, but the
    * set equivalence must hold on any input) fall back to the generic
    * path, where a form string no longer pins its (d, w) tag. */
  private[graft] def levForms(name: String): Iterator[(String, String, Int, Int)] = {
    if (name.indexOf('\u0001') >= 0) return levFormsGeneric(name)
    val L = name.length
    val out = new scala.collection.mutable.ArrayBuffer[(String, String, Int, Int)](
      2 * L * L + 2) // local: one name's ≈2L² blocking rows
    out += ((name, name, 0, 0))
    if (L == 0) return out.iterator
    val chars = name.toCharArray
    // (0,1) and (0,2): wildcards at {i} / {i,j} — distinct by position set
    val wbuf = chars.clone()
    var i = 0
    while (i < L) {
      val ci = wbuf(i); wbuf(i) = '\u0001'
      out += ((new String(wbuf), name, 0, 1))
      var j = i + 1
      while (j < L) {
        val cj = wbuf(j); wbuf(j) = '\u0001'
        out += ((new String(wbuf), name, 0, 2))
        wbuf(j) = cj
        j += 1
      }
      wbuf(i) = ci
      i += 1
    }
    // deletion-bearing categories from run-representative first deletes
    val dbuf = new Array[Char](L - 1)
    val seen11 = new java.util.HashSet[String]()
    val seen20 = new java.util.HashSet[String]()
    i = 0
    while (i < L) {
      if (i == 0 || chars(i) != chars(i - 1)) { // run representative
        System.arraycopy(chars, 0, dbuf, 0, i)
        System.arraycopy(chars, i + 1, dbuf, i, L - i - 1)
        out += ((new String(dbuf, 0, L - 1), name, 1, 0))
        var k = 0
        while (k < L - 1) {
          val ck = dbuf(k); dbuf(k) = '\u0001'
          val f = new String(dbuf, 0, L - 1)
          if (seen11.add(f)) out += ((f, name, 1, 1))
          dbuf(k) = ck
          k += 1
        }
        var p = i // second delete at post-delete positions i..L-2
        while (p < L - 1) {
          val sb = new java.lang.StringBuilder(L - 2)
          sb.append(dbuf, 0, p).append(dbuf, p + 1, L - 2 - p)
          val f = sb.toString
          if (seen20.add(f)) out += ((f, name, 2, 0))
          p += 1
        }
      }
      i += 1
    }
    out.iterator
  }

  /** The reference emission (pre-round-17 shape): enumerate every
    * (delete, wildcard) position choice and dedupe through one
    * LinkedHashSet. Exact on any input including names that contain
    * the reserved wildcard char; [[levForms]] dispatches here for
    * those, and the RelationalSpec equivalence test pins the two
    * emissions set-equal. */
  private[graft] def levFormsGeneric(name: String): Iterator[(String, String, Int, Int)] = {
    val L = name.length
    val out = scala.collection.mutable.LinkedHashSet.empty[(String, Int, Int)]
    def del(s: String, i: Int): String =
      new java.lang.StringBuilder(s).deleteCharAt(i).toString
    def wc(s: String, i: Int): String = {
      val b = new java.lang.StringBuilder(s); b.setCharAt(i, '\u0001'); b.toString
    }
    out += ((name, 0, 0))
    var i = 0
    while (i < L) {
      out += ((wc(name, i), 0, 1))
      val di = del(name, i)
      out += ((di, 1, 0))
      var j = i + 1
      while (j < L) {
        out += ((wc(wc(name, i), j), 0, 2))
        out += ((del(di, j - 1), 2, 0)) // delete i then j (shifted)
        j += 1
      }
      var k = 0
      while (k < L - 1) { out += ((wc(di, k), 1, 1)); k += 1 }
      i += 1
    }
    out.iterator.map { case (f, d0, w0) => (f, name, d0, w0) }
  }

  /** CANONICAL-WITNESS admission for r40's candidate pairs — prunes
    * provably-redundant emissions BEFORE the distinct, never changing
    * its output. A true pair (lev ≤ 2) is admitted by several (form,
    * d, w) decompositions (round-16 measured 2.25× candidate
    * multiplicity; distance-1 pairs carry ~2L witnesses); each rule
    * below drops a candidate only when ANOTHER admitted witness is
    * guaranteed to survive, so `distinct(candidates)` is unchanged and
    * the distinct processes ~answer-mass rows instead of 2.25× that.
    *
    * With no reserved U+0001 char in either name, form-equal rows
    * share w (= the form's wildcard count) and d = |name| − |form|,
    * and the admitted classes are (d_a, d_b, w) with d_a+d_b+w ≤ 2:
    *  - (0,0,w≥1): prune when some wildcard position p has
    *    name_a(p) == name_b(p) — the form with that wildcard removed
    *    (w−1 ≤ 1) matches both names and is admitted; induction
    *    bottoms out at the all-wildcards-necessary form (names differ
    *    somewhere, and only inside the wildcard set).
    *  - (1,1,0): prune when hamming(a,b) ≤ 2 — the wildcards-at-diffs
    *    form is admitted at (0,0,h) and survives the rule above (every
    *    wildcard necessary).
    *  - ({1,0},1): prune when the longer name reaches the shorter by
    *    ONE deletion — the pure-deletion witness (1,0,0) is admitted
    *    and no rule touches that class.
    * (0,0,0) is equal names (excluded by name_a < name_b), (2,0,0) has
    * a unique witness (both forms are the shorter name), (1,0,0) is
    * the kept pure-deletion witness — nothing else is admitted.
    *
    * Guards make the predicate EXACT on arbitrary frames, not just
    * levForms output: every rule first re-checks the length identities
    * its argument pattern implies (|name| = |form| + d, equal lengths
    * for hamming, off-by-one for the deletion test) and bails to
    * `keep` when a name carries a native U+0001 (where a form string
    * no longer pins w); spec-built frames with arbitrary tags are
    * therefore never mis-pruned. */
  // public (not private[graft]): the expression wrapper living in
  // org.apache.spark.sql.graft — a different `graft` — calls it
  def r40CanonicalKeep(form: String,
                       nameA: String, dA: Int, wA: Int,
                       nameB: String, dB: Int, wB: Int): Boolean = {
    if (wA != wB) return true
    if (nameA.indexOf('\u0001') >= 0 || nameB.indexOf('\u0001') >= 0) return true
    val la = nameA.length; val lb = nameB.length; val lf = form.length
    if (dA == 0 && dB == 0 && wA >= 1) {
      if (la != lf || lb != lf) return true
      var p = 0
      while (p < lf) {
        if (form.charAt(p) == '\u0001' && nameA.charAt(p) == nameB.charAt(p))
          return false
        p += 1
      }
      true
    } else if (dA == 1 && dB == 1 && wA == 0) {
      if (la != lb || la != lf + 1) return true
      var diffs = 0; var p = 0
      while (p < la && diffs <= 2) {
        if (nameA.charAt(p) != nameB.charAt(p)) diffs += 1
        p += 1
      }
      diffs > 2
    } else if (wA == 1 && dA + dB == 1) {
      val (lng, shrt) = if (dA == 1) (nameA, nameB) else (nameB, nameA)
      if (lng.length != shrt.length + 1 || shrt.length != lf) return true
      // one-deletion check: first mismatch skips one char of the long
      var i = 0
      while (i < shrt.length && lng.charAt(i) == shrt.charAt(i)) i += 1
      var j = i
      while (j < shrt.length && lng.charAt(j + 1) == shrt.charAt(j)) j += 1
      j < shrt.length // reached the end ⇒ pure deletion exists ⇒ prune
    } else true
  }

  /** Column form of [[r40CanonicalKeep]] for the join lanes. */
  private def r40CanonicalCol(form: Column, nameA: Column, dA: Column,
                              wA: Column, nameB: Column, dB: Column,
                              wB: Column): Column =
    org.apache.spark.sql.graft.JoinFunctions.r40Canonical(
      form, nameA, dA, wA, nameB, dB, wB)

  /** Brute-force DP join — the oracle pays the O(n²) the engine's
    * deletion-neighborhood blocking avoids. */
  val r40Sql: String =
    """SELECT a.c_name AS name_a, b.c_name AS name_b,
      |       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
      |FROM customer a JOIN customer b
      |  ON a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) <= 2
      |ORDER BY name_a, name_b""".stripMargin

  // ----------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r40_fuzzy_join" -> (r40 _),
    "r39_cohort_retention" -> (r39 _),
    "r38_quality_checks" -> (r38 _),
    "r37_rfm_segment" -> (r37 _),
    "r36_funnel" -> (r36 _),
    "r35_incremental_agg" -> (r35 _),
    "r34_scd2_history"   -> (r34 _),
    "r32_session_window" -> (r32 _),
    "r33_unpivot" -> (r33 _),
    "r01_filter_project" -> (r01 _),
    "r02_agg"            -> (r02 _),
    "r03_join_agg"       -> (r03 _),
    "r04_multijoin"      -> (r04 _),
    "r05_outer_join"     -> (r05 _),
    "r06_semi_join"      -> (r06Semi _),
    "r06_anti_join"      -> (r06Anti _),
    "r07_count_distinct" -> (r07 _),
    "r08_rollup"         -> (r08 _),
    "r09_rank_window"    -> (r09 _),
    "r10_running_window" -> (r10 _),
    "r11_topk"           -> (r11 _),
    "r12_intersect"      -> (r12Intersect _),
    "r12_except"         -> (r12Except _),
    "r13_scalar_funcs"   -> (r13 _),
    "r14_corr_subquery"  -> (r14 _),
    "r15_cube"           -> (r15 _),
    "r16_approx_distinct" -> (r16 _),
    "r17_pivot"          -> (r17 _),
    "r18_explode_tf"     -> (r18 _),
    "r19_asof_join"      -> (r19 _),
    "r20_interval_join"  -> (r20 _),
    "r21_range_frame"    -> (r21 _),
    "r22_ntile"          -> (r22 _),
    "r23_approx_quantile" -> (r23 _),
    "r24_latest_per_key" -> (r24 _),
    "r25_lag_lead"       -> (r25 _),
    "r26_salted_agg"     -> (r26 _),
    "r27_merge_upsert"   -> (r27 _),
    "r28_grouping_sets"  -> (r28 _),
    "r29_salted_join"    -> (r29 _),
    "r30_bloom_join"     -> (r30 _),
    "r31_exact_percentile" -> (r31 _),
    "x1_exact_dedup"     -> (x1 _),
    "x3_text_stats"      -> (x3 _),
    "x5_pipeline"        -> (x5 _))

  val oracles: Map[String, String] = Map(
    "r40_fuzzy_join" -> r40Sql,
    "r39_cohort_retention" -> r39Sql,
    "r38_quality_checks" -> r38Sql,
    "r37_rfm_segment" -> r37Sql,
    "r36_funnel" -> r36Sql,
    "r35_incremental_agg" -> r35Sql,
    "r01_filter_project" -> r01Sql,
    "r02_agg"            -> r02Sql,
    "r03_join_agg"       -> r03Sql,
    "r04_multijoin"      -> r04Sql,
    "r05_outer_join"     -> r05Sql,
    "r06_semi_join"      -> r06SemiSql,
    "r06_anti_join"      -> r06AntiSql,
    "r07_count_distinct" -> r07Sql,
    "r08_rollup"         -> r08Sql,
    "r09_rank_window"    -> r09Sql,
    "r10_running_window" -> r10Sql,
    "r11_topk"           -> r11Sql,
    "r12_intersect"      -> r12IntersectSql,
    "r12_except"         -> r12ExceptSql,
    "r13_scalar_funcs"   -> r13Sql,
    "r14_corr_subquery"  -> r14Sql,
    "r15_cube"           -> r15Sql,
    "r16_approx_distinct" -> r16Sql,
    "r17_pivot"          -> r17Sql,
    "r18_explode_tf"     -> r18Sql,
    "r19_asof_join"      -> r19Sql,
    "r20_interval_join"  -> r20Sql,
    "r21_range_frame"    -> r21Sql,
    "r22_ntile"          -> r22Sql,
    "r23_approx_quantile" -> r23Sql,
    "r24_latest_per_key" -> r24Sql,
    "r25_lag_lead"       -> r25Sql,
    "r26_salted_agg"     -> r26Sql,
    "r27_merge_upsert"   -> r27Sql,
    "r28_grouping_sets"  -> r28Sql,
    "r29_salted_join"    -> r29Sql,
    "r30_bloom_join"     -> r30Sql,
    "r31_exact_percentile" -> r31Sql,
    "r32_session_window" -> r32Sql,
    "r33_unpivot" -> r33Sql,
    "r34_scd2_history" -> r34Sql,
    "x1_exact_dedup"     -> x1Sql,
    "x3_text_stats"      -> x3Sql,
    "x5_pipeline"        -> x5Sql)
}

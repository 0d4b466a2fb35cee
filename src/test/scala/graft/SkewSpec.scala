package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Salted join/aggregation must be result-identical to the plain forms
  * while spreading hot keys over `salt` shuffle partitions. */
class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val sf = "/root/testdata/sf0.001"

  test("saltedJoin == plain inner join") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_mktsegment")
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "c_mktsegment")
    val salted = Skew.saltedJoin(
      o.withColumnRenamed("o_custkey", "custkey"),
      c.withColumnRenamed("c_custkey", "custkey"), "custkey", 8)
      .select("o_orderkey", "c_mktsegment")
    assert(salted.orderBy("o_orderkey").collect()
      .sameElements(plain.orderBy("o_orderkey").collect()))
  }

  test("AQE splits a skewed join at runtime (skew=true in the adaptive plan)") {
    // First line of defense at 100 TB (Skew.scala's Scaladoc): prove the
    // runtime skew-split actually engages on a hot key. Thresholds are
    // lowered so the ~8 MB hot partition qualifies at test scale.
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100kb")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64kb")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val left = s.range(0, 200000).select(
      when(col("id") % 100 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
      concat(lit("payload-payload-payload-"), col("id")).as("pl"))
    val right = s.range(0, 1000).select(col("id").as("k"), col("id").as("v"))
    val j = left.join(right, "k")
    // execute THIS query execution so its adaptive plan finalizes
    val n = j.collect().length.toLong
    // right holds every key in [0, 1000), so every left row with k < 1000 matches once
    assert(n == left.filter(col("k") < 1000).count())
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"), s"no runtime skew split in plan:\n$plan")
  }

  test("saltedSum == plain sum per key") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val plain = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("sum_l_quantity"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val salted = Skew.saltedSum(li, "l_returnflag", "l_quantity", 8)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(plain.keySet == salted.keySet)
    plain.foreach { case (k, v) => assert(math.abs(salted(k) - v) < 1e-6) }
  }
}

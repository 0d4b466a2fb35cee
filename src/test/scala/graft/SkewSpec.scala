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

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join-strategy CONTROL — the knobs a 100 TB plan depends on. Catalyst
  * picks a strategy from size estimates, but at scale the author must be
  * able to force the right one (broadcast a dim Catalyst mis-estimates,
  * shuffle-hash when one side is large-but-fits-per-partition, merge for
  * sorted spill-safety). These specs pin that each hint actually changes
  * the physical plan, so a regression in hint handling can't silently
  * turn a broadcast into a 100 TB shuffle. */
class JoinStrategySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val sf = "/root/testdata/sf0.001"

  private def orders = graft.sources.Tables.orders(spark, sf)
  private def customer = graft.sources.Tables.customer(spark, sf)

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("broadcast() hint forces BroadcastHashJoin even with auto-broadcast off") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val auto = orders.join(customer,
        col("o_custkey") === col("c_custkey"))
      assert(!planOf(auto).contains("BroadcastHashJoin"),
        "auto-broadcast should be disabled in this test")
      val hinted = orders.join(broadcast(customer),
        col("o_custkey") === col("c_custkey"))
      assert(planOf(hinted).contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("shuffle_hash and merge hints select ShuffledHashJoin / SortMergeJoin") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val sh = orders.join(customer.hint("shuffle_hash"),
        col("o_custkey") === col("c_custkey"))
      assert(planOf(sh).contains("ShuffledHashJoin"))
      val sm = orders.join(customer.hint("merge"),
        col("o_custkey") === col("c_custkey"))
      assert(planOf(sm).contains("SortMergeJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("r04 multijoin broadcasts the dimension tables") {
    val plan = planOf(graft.operators.Relational.r04(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"dims (nation/region/customer) should broadcast in r04:\n$plan")
  }
}

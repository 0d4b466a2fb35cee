package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, TextAnalysis, Similarity}

/** Whole-stage codegen coverage on the hot paths. WSCG spans show as
  * `*(n)` prefixes in the executed plan; an operator that falls out of
  * codegen (an interpreted expression, a CodegenFallback) silently
  * costs 2-5× at scale, so these specs fail if a hot path ever loses
  * its span — including the custom VecDot/VecNorm2 expressions, whose
  * entire reason to exist over a UDF is that doGenCode keeps them
  * inside the generated loop. */
class CodegenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val sf = "/root/testdata/sf0.001"

  /** AQE prints `isFinalPlan=false` with no codegen markers until the
    * query has actually run — execute first, then read the final plan. */
  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("scan-filter-project and aggregate paths run inside WholeStageCodegen") {
    assert(plan(Relational.r01(spark, sf)).contains("*("))
    assert(plan(Relational.r02(spark, sf)).contains("*("))
  }

  test("pure-projection text operators are fully codegen'd (no fallback)") {
    val p = plan(TextAnalysis.t2Quality(spark, sf))
    assert(p.contains("*("))
    assert(!p.contains("CodegenFallback"), s"fallback in t2 plan:\n$p")
  }

  test("native vector expressions stay inside the codegen span") {
    val p = plan(Similarity.s1BruteForce(spark, sf))
    assert(p.contains("*("), s"no WSCG span in s1 plan:\n$p")
    assert(!p.toLowerCase.contains("codegenfallback"),
      s"VecDot/VecNorm2 fell out of codegen:\n$p")
  }

  test("bloom probe is the native expression, not a UDF, and stays codegen'd") {
    val p = plan(Relational.r30(spark, sf))
    assert(p.contains("bloom_might_contain"), s"native probe missing:\n$p")
    assert(!p.contains("UDF"), s"bloom probe fell back to a UDF:\n$p")
    assert(!p.toLowerCase.contains("codegenfallback"),
      s"bloom probe fell out of codegen:\n$p")
  }
}

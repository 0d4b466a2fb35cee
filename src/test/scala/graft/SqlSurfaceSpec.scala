package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** The SQL-text entry point (`Graft.sql`) must plan through the same
  * Catalyst pipeline as the DataFrame surface and return identical
  * results — a user porting SQL workloads gets the DataFrame engine
  * verbatim. Uses queries whose oracle SQL is dialect-portable
  * (ANSI subset shared by Spark SQL and DuckDB). */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val sf = "/root/testdata/sf0.001"

  test("spark.sql over registered views equals the DataFrame result (r11 top-k)") {
    val viaSql = Graft.sql(spark, sf, Relational.oracles("r11_topk"))
      .collect().map(_.toSeq)
    val viaDf = Relational.r11(spark, sf).collect().map(_.toSeq)
    assert(viaSql.sameElements(viaDf))
  }

  test("spark.sql over registered views equals the DataFrame result (r02 agg)") {
    val viaSql = Graft.sql(spark, sf, Relational.oracles("r02_agg"))
      .collect().map(_.toSeq)
    val viaDf = Relational.r02(spark, sf).collect().map(_.toSeq)
    assert(viaSql.sameElements(viaDf))
  }
}

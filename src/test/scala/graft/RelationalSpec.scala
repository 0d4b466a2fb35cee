package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Smoke + shape tests for the relational surface (R1-R14, X1, X3).
  * Value-level correctness is gated by the DuckDB oracle
  * (tools/check_oracle.py / the driver's CORRECTNESS run); here we pin
  * schema and basic invariants at sf0.001 so regressions fail fast. */
class RelationalSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkTest.session

  test("every query has an oracle and runs at sf0.001") {
    assert(Relational.oracles.keySet == Relational.queries.keySet)
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      df.limit(1).collect() // plan executes
    }
  }

  test("r02 aggregate shape") {
    val rows = Relational.r02(spark, sf).collect()
    assert(rows.length >= 4 && rows.length <= 6) // flag x status combos
    assert(rows.map(_.getLong(2)).sum == 6000L)  // n_rows covers lineitem
  }

  test("r09 window emits at most 3 rows per customer") {
    val rows = Relational.r09(spark, sf).collect()
    val perCust = rows.groupBy(_.getLong(0)).values.map(_.length)
    assert(perCust.forall(_ <= 3))
    assert(rows.forall(_.getInt(3) <= 3))
  }

  test("r11 top-k is sorted desc with unique keys") {
    val rows = Relational.r11(spark, sf).collect()
    assert(rows.length == 20)
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("x1 dedup keeps lowest doc_id per content hash") {
    val kept = Relational.x1(spark, sf).collect().map(_.getLong(0)).toSet
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(kept.size <= total && kept.nonEmpty)
  }
}

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

  test("registered Scala UDF matches the native codegen expression (and why native wins)") {
    // UDF surface works — but the native Expression is the hot-path
    // choice: a UDF is an opaque lambda (boxes its inputs, blocks
    // filter pushdown through it, breaks whole-stage codegen); VecDot
    // generates inline Java. Parity is exact because both fold
    // left-to-right.
    import org.apache.spark.sql.functions.udf
    val dot = udf((a: Seq[Double], b: Seq[Double]) => {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    })
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val both = e.select(
      org.apache.spark.sql.functions.col("vec_id"),
      dot(org.apache.spark.sql.functions.col("v"), org.apache.spark.sql.functions.col("v")).as("viaUdf"),
      graft.functions.VectorFunctions.vecDot(
        org.apache.spark.sql.functions.col("v"), org.apache.spark.sql.functions.col("v")).as("viaNative"))
      .collect()
    both.foreach(r => assert(r.getDouble(1) == r.getDouble(2),
      s"UDF/native mismatch on vec ${r.getLong(0)}"))
  }

  test("optimizer rule rewrites vec_dot(x, x) to vec_norm2(x), bit-identically") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.{VecDot, VecNorm2}
    import graft.functions.VectorFunctions.{vecDot, vecNorm2}
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
    // Column API: same attribute on both sides → rule must fire
    val selfDot = e.select(col("vec_id"), vecDot(col("v"), col("v")).as("n2"))
    def exprs(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      plan.collect { case n => n.expressions }.flatten
    val optimized = selfDot.queryExecution.optimizedPlan
    assert(exprs(optimized).flatMap(_.collect { case v: VecNorm2 => v }).nonEmpty,
      s"vec_dot(x, x) did not rewrite to vec_norm2:\n$optimized")
    assert(exprs(optimized).flatMap(_.collect { case v: VecDot => v }).isEmpty,
      s"vec_dot survived the self-dot rewrite:\n$optimized")
    // bit-identity with the explicit norm form
    val viaNorm = e.select(col("vec_id"), vecNorm2(col("v")).as("n2"))
      .collect().map(_.toSeq)
    assert(selfDot.collect().map(_.toSeq).sameElements(viaNorm))
    // raw-SQL surface: the aliased-subquery form fires too
    val sqlForm = Graft.sql(spark, sf,
      """WITH t AS (SELECT vec_id,
        |             transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings)
        |SELECT vec_id, vec_dot(v, v) AS n2 FROM t ORDER BY vec_id""".stripMargin)
    assert(exprs(sqlForm.queryExecution.optimizedPlan)
      .flatMap(_.collect { case v: VecNorm2 => v }).nonEmpty,
      "SQL-surface self-dot did not rewrite")
    assert(sqlForm.collect().map(_.toSeq)
      .sameElements(viaNorm.sortBy(_.head.asInstanceOf[Long])))
    // distinct arguments must NOT rewrite
    val cross = e.as("a").join(e.as("b"), col("a.vec_id") === col("b.vec_id"))
      .select(vecDot(col("a.v"), col("b.v")).as("d"))
    assert(exprs(cross.queryExecution.optimizedPlan)
      .flatMap(_.collect { case v: VecDot => v }).nonEmpty,
      "rule over-fired on genuinely distinct arguments")
  }

  test("GraftExtensions exposes vec_dot/vec_norm2 as raw-SQL functions") {
    // spark.sql.extensions=graft.GraftExtensions (set by SparkTest):
    // pure-SQL users call the same codegen'd Catalyst expressions the
    // Column API plans — no Scala import, identical values.
    Graft.registerTables(spark, sf)
    val viaSql = spark.sql(
      """SELECT vec_id,
        |  vec_dot(transform(embedding, x -> cast(x AS double)),
        |          transform(embedding, x -> cast(x AS double))) AS d,
        |  vec_norm2(transform(embedding, x -> cast(x AS double))) AS n2
        |FROM embeddings ORDER BY vec_id""".stripMargin).collect()
    val viaCol = {
      import org.apache.spark.sql.functions.{col, expr}
      graft.sources.Tables.embeddings(spark, sf)
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
        .select(col("vec_id"),
          graft.functions.VectorFunctions.vecDot(col("v"), col("v")).as("d"),
          graft.functions.VectorFunctions.vecNorm2(col("v")).as("n2"))
        .orderBy(col("vec_id")).collect()
    }
    assert(viaSql.length == viaCol.length && viaSql.nonEmpty)
    viaSql.zip(viaCol).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getDouble(1) == b.getDouble(1) &&
        a.getDouble(2) == b.getDouble(2), s"SQL/Column mismatch at vec ${a.getLong(0)}")
    }
  }
}

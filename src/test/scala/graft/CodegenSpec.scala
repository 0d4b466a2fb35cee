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

  test("top_cells assignment matches the window formulation and stays codegen'd") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.{topCells, vecDot, vecNorm2}
    val e = Similarity.prepared(spark, sf)
    val anchors = Similarity.trainedAnchors(spark, sf, e)
    val assigned = e.withColumn("tc", topCells(col("v"), col("nrm"), anchors, 3))
    // reference: the round-4 window-over-cross-product formulation
    val s = spark
    import s.implicits._
    val aDF = anchors.toSeq.toDF("cell", "av")
      .withColumn("an", sqrt(vecNorm2(col("av"))))
    val ranked = e.as("e").join(broadcast(aDF).as("a"), lit(true))
      .select(col("e.vec_id").as("vec_id"), col("a.cell").as("cell"),
        (vecDot(col("e.v"), col("a.av")) / (col("e.nrm") * col("a.an"))).as("sim"))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cell"))))
      .filter(col("crn") <= 3)
    val want = ranked.collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getInt(1)))
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3).toSeq }
    val got = assigned.select(col("vec_id"), col("tc")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(got == want, "top_cells diverged from the window formulation")
    val p = plan(assigned)
    assert(p.contains("top_cells"), s"native top_cells missing:\n$p")
    assert(!p.toLowerCase.contains("codegenfallback"),
      s"top_cells fell out of codegen:\n$p")
  }

  test("top_cells_routed equals flat top_cells bit-for-bit under an " +
    "exhaustive probe and stays codegen'd") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.{topCells, topCellsRouted}
    val e = Similarity.prepared(spark, sf)
    val anchors = Similarity.trainedAnchors(spark, sf, e)
    // wProbe ≥ nGroups ⇒ complete candidate set ⇒ the routed kernel's
    // explicit (sim desc, cell asc) tie rule must reproduce the flat
    // kernel's scan-order-derived ranking exactly, at k = 1 and k > 1
    val all = graft.operators.CellRouter.of(anchors, anchors.length)
    val both = e
      .withColumn("flat1", topCells(col("v"), col("nrm"), anchors, 1))
      .withColumn("routed1", topCellsRouted(col("v"), col("nrm"), all, 1))
      .withColumn("flat3", topCells(col("v"), col("nrm"), anchors, 3))
      .withColumn("routed3", topCellsRouted(col("v"), col("nrm"), all, 3))
    both.select("vec_id", "flat1", "routed1", "flat3", "routed3")
      .collect().foreach { r =>
        assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"k=1 diverged: $r")
        assert(r.getSeq[Int](3) == r.getSeq[Int](4), s"k=3 diverged: $r")
      }
    val p = plan(both.select(col("vec_id"), col("routed3")))
    assert(p.contains("top_cells_routed"), s"native routed kernel missing:\n$p")
    assert(!p.toLowerCase.contains("codegenfallback"),
      s"top_cells_routed fell out of codegen:\n$p")
  }

  test("top_cells_routed COMPILES under janino at a routed-scale anchor " +
    "table (a codegen syntax error falls back to interpreted SILENTLY — " +
    "plan text still shows the WSCG span, only executor logs notice)") {
    import org.apache.spark.sql.functions.col
    val e = Similarity.prepared(spark, sf)
    // large-enough synthetic anchor table that routing genuinely prunes
    val anchors = Array.tabulate(200)(i =>
      (i, Array.tabulate(64)(j => math.sin(i * 64.0 + j))))
    val df = e.select(
      Similarity.assignCells(col("v"), col("nrm"), anchors, 2,
        minRouted = 0).as("r"))
    df.collect()
    val stats = org.apache.spark.sql.execution.debug
      .codegenStringSeq(df.queryExecution.executedPlan)
    assert(stats.nonEmpty, "no codegen subtree found")
    stats.foreach { case (_, _, bs) =>
      assert(bs.maxMethodCodeSize > 0,
        "generated code failed to compile — the round-16 '||'-eaten-by-" +
          "stripMargin class of bug, running interpreted at scale")
    }
  }

  test("bloom probe is the native expression, not a UDF, and stays codegen'd") {
    val p = plan(Relational.r30(spark, sf))
    assert(p.contains("bloom_might_contain"), s"native probe missing:\n$p")
    assert(!p.contains("UDF"), s"bloom probe fell back to a UDF:\n$p")
    assert(!p.toLowerCase.contains("codegenfallback"),
      s"bloom probe fell out of codegen:\n$p")
  }

  /** Round-16 optimization: the int8 quantization/scoring path moved
    * from interpreted HOF lambdas (`transform`/`aggregate`/`zip_with`
    * are CodegenFallback — one virtual call + boxing per ELEMENT) to
    * native codegen'd expressions. All four are exact-integer or
    * order-independent semantics, so the spec demands BIT-identity
    * against the HOF forms on the real corpus, and that the plan keeps
    * its WSCG span with the native names in it. */
  test("native int8 expressions (vec_max_abs/int8_codes/vec_norm2_int/" +
    "vec_dot_int) match the HOF forms bit-exactly and stay codegen'd") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions._
    // to_double_array (the materialize-once float→double widening) must
    // equal both the Cast and the transform-lambda forms element-wise
    val castEq = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(
        graft.functions.VectorFunctions.toDoubleArray(col("embedding")).as("n"),
        expr("CAST(embedding AS array<double>)").as("c"),
        expr("transform(embedding, x -> cast(x AS double))").as("t"))
      .filter(col("n") =!= col("c") || col("n") =!= col("t"))
    assert(castEq.isEmpty, s"to_double_array diverged:\n${castEq.take(3).mkString("\n")}")
    val e = Similarity.prepared(spark, sf)
      .withColumn("scaleH", expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("qvH", expr(
        """transform(v, x -> CASE WHEN scaleH = 0D THEN cast(0 AS bigint)
          |  ELSE cast(round(x / scaleH * 127, 0) AS bigint) END)""".stripMargin))
      .withColumn("nq2H", expr("aggregate(transform(qvH, x -> x * x), 0L, (a, v) -> a + v)"))
      .withColumn("scaleN", vecMaxAbs(col("v")))
      .withColumn("qvN", int8Codes(col("v"), col("scaleN")))
      .withColumn("nq2N", vecNorm2Int(col("qvN")))
      .withColumn("qv8", col("qvN").cast("array<tinyint>"))
    val bad = e.filter(col("scaleH") =!= col("scaleN") ||
      col("qvH") =!= col("qvN") || col("nq2H") =!= col("nq2N"))
    assert(bad.isEmpty, s"int8 path divergence:\n${bad.take(3).mkString("\n")}")
    // dot: bigint×bigint AND bigint×tinyint (the stored-codes shape)
    // against the zip_with fold, across all query×corpus pairs
    val q = e.select(col("vec_id").as("qid"), col("qvN").as("a"))
      .filter(col("qid") < 10)
    val pairs = q.crossJoin(e.select(col("qvN").as("b"), col("qv8")))
      .select(
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("dH"),
        vecDotInt(col("a"), col("b")).as("dN"),
        vecDotInt(col("a"), col("qv8")).as("dN8"))
    val badDot = pairs.filter(col("dH") =!= col("dN") || col("dH") =!= col("dN8"))
    assert(badDot.isEmpty, s"vec_dot_int divergence:\n${badDot.take(3).mkString("\n")}")
    val p = plan(Similarity.s5AnnQuantized(spark, sf))
    Seq("vec_max_abs", "int8_codes", "vec_norm2_int", "vec_dot_int").foreach(n =>
      assert(p.contains(n), s"native $n missing from s5 plan:\n$p"))
    assert(p.contains("*("), s"no WSCG span in s5 plan:\n$p")
  }

  /** Round-16 optimization: x30's per-window fingerprint moved from the
    * interpreted slice/join/md5-hex/unhex lambda chain to the native
    * one-pass digest. Byte-identity on the real corpus plus edge token
    * shapes (empty tokens, multi-byte UTF-8, exactly-k, fewer-than-k). */
  test("word_gram_md5 matches the transform/slice/md5/unhex form byte-exactly") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.wordGramMd5
    val s = spark
    import s.implicits._
    val k = 4
    val edge = Seq("a b c d", "a b c d e", "a  b c d",
      "的 是 在 了 和", "x", "a b c", "tok tok tok tok tok")
      .toDF("text")
    val corpus = spark.read.parquet(s"$sf/documents.parquet").select(col("text"))
    for (df <- Seq(edge, corpus)) {
      val both = df.select(split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= k)
        .select(
          wordGramMd5(col("w"), k).as("got"),
          expr(s"transform(sequence(0, size(w) - $k)," +
            s" i -> unhex(md5(array_join(slice(w, i + 1, $k), ' '))))").as("exp"))
      val bad = both.filter(col("got") =!= col("exp"))
      assert(bad.isEmpty, s"word_gram_md5 divergence:\n${bad.take(3).mkString("\n")}")
    }
  }

  /** Round-16 optimization: t4's window walk moved from the
    * per-window-allocating declarative form to the single-pass native
    * expressions. The spec pins BYTE-EXACT equivalence against the old
    * form — on the real corpus AND on the edge shapes (empty string,
    * shorter-than-window, exactly-8, multi-byte UTF-8, repeated grams)
    * where the window arithmetic (`greatest(length(t)-7, 1)`,
    * char-not-byte slicing) can silently diverge. */
  test("gram8 native expressions match the declarative md5-window form byte-exactly") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val s = spark
    import s.implicits._
    val edge = Seq("", "a", "abcdefg", "abcdefgh", "abcdefghi",
      "aaaaaaaaaaaaaaaa", "的是在了和有我不的是在了和有我不",
      "mixed 的 ascii 和 utf8 content here", "  spaces  and\ttabs\nnewlines  ")
      .toDF("t")
    val corpus = TextAnalysis.t4Fingerprint(spark, sf).sparkSession
      .read.parquet(s"$sf/documents.parquet")
      .select(lower(trim(col("text"))).as("t"))
    for (df <- Seq(edge, corpus)) {
      val both = df.select(
        gram8MinMd5(col("t")).as("got_fp"),
        gram8DistinctCount(col("t")).as("got_n"),
        expr("array_min(transform(sequence(1, greatest(length(t)-7, 1))," +
          " i -> md5(substring(t, i, 8))))").as("exp_fp"),
        expr("size(array_distinct(transform(sequence(1, greatest(length(t)-7, 1))," +
          " i -> substring(t, i, 8))))").as("exp_n"))
      val bad = both.filter(col("got_fp") =!= col("exp_fp") ||
        col("got_n") =!= col("exp_n"))
      assert(bad.isEmpty, s"gram8 divergence:\n${bad.take(3).mkString("\n")}")
    }
  }
}

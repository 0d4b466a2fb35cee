package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level A/B probe for r40's fuzzy join (builder tooling, like
  * TimeQ — not part of the bench contract). Times each pipeline stage
  * with the noop sink so the expensive phase is identified before any
  * change (guide §1). */
object R40Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(tag: String)(f: => Unit): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"R40PROBE $tag best=$best%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val c = graft.sources.Tables.customer(spark, sfDir)
      .select(col("c_name").as("name"))
    println(s"R40PROBE names=${c.count()}")

    // phase 1: form generation only
    time("forms") {
      noop(c.as[String].flatMap(graft.operators.Relational.levForms _)
        .toDF("form", "name", "d", "w"))
    }
    // phase 2: forms + self-join (shuffle_hash lane), pre-distinct
    def vars = c.as[String].flatMap(graft.operators.Relational.levForms _)
      .toDF("form", "name", "d", "w")
    time("join") {
      noop(vars.as("a").hint("shuffle_hash")
        .join(vars.as("b"),
          col("a.form") === col("b.form") && col("a.name") < col("b.name") &&
            col("a.d") + col("b.d") + greatest(col("a.w"), col("b.w")) <= 2)
        .select(col("a.name").as("name_a"), col("b.name").as("name_b")))
    }
    // candidate-mass evidence: pre-distinct rows with/without the
    // canonical-witness prune, and the distinct pair count (noise-free
    // proof the prune cuts the distinct's input, not its output)
    val rawJoin = vars.as("a").hint("shuffle_hash")
      .join(vars.as("b"),
        col("a.form") === col("b.form") && col("a.name") < col("b.name") &&
          col("a.d") + col("b.d") + greatest(col("a.w"), col("b.w")) <= 2)
    val rawCnt = rawJoin.count()
    val prunedCnt = rawJoin
      .filter(org.apache.spark.sql.graft.JoinFunctions.r40Canonical(
        col("a.form"), col("a.name"), col("a.d"), col("a.w"),
        col("b.name"), col("b.d"), col("b.w")))
      .count()
    val pairCnt = rawJoin
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct().count()
    println(s"R40PROBE candidates raw=$rawCnt pruned=$prunedCnt " +
      f"distinct_pairs=$pairCnt mult_raw=${rawCnt.toDouble / pairCnt}%.2f " +
      f"mult_pruned=${prunedCnt.toDouble / pairCnt}%.2f")
    // phase 2b: pruned join, pre-distinct
    time("join+canonical") {
      noop(rawJoin
        .filter(org.apache.spark.sql.graft.JoinFunctions.r40Canonical(
          col("a.form"), col("a.name"), col("a.d"), col("a.w"),
          col("b.name"), col("b.d"), col("b.w")))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b")))
    }
    // phase 3: + distinct
    time("join+distinct") {
      noop(vars.as("a").hint("shuffle_hash")
        .join(vars.as("b"),
          col("a.form") === col("b.form") && col("a.name") < col("b.name") &&
            col("a.d") + col("b.d") + greatest(col("a.w"), col("b.w")) <= 2)
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
        .distinct())
    }
    // phase 4: the full declared query
    time("full") {
      noop(graft.operators.Relational.queries("r40_fuzzy_join")(spark, sfDir))
    }
    // the grouped lane for comparison
    time("grouped_full") {
      noop(graft.operators.Relational.r40Impl(spark, sfDir, Some("grouped")))
    }
    spark.stop()
  }
}

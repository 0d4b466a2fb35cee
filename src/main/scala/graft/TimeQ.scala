package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        sys.env.getOrElse("GRAFT_COMMITTER_V", "1"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      // warm + timed
      var best = Double.MaxValue
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        // harness v2: full materialization — count() lets Catalyst
        // prune count-irrelevant work (see Bench.materialize)
        Bench.materialize(SparkEntry.queries(name)(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) best = dt
      }
      val rows = SparkEntry.queries(name)(spark, sfDir).count() // untimed row count
      println(f"TIMEQ $name rows=$rows best=$best%.2f s")
    }
    spark.stop()
  }
}

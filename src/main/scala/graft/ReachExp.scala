package graft
// TEMPORARY diagnosis main (deleted before commit): dump TopCellsRouted codegen.
object ReachExp {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Similarity.prepared(spark, "/root/testdata/sf0.01").cache()
    val anchors = e.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id"), col("v"))
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray))
    val df = e.select(col("vec_id"),
      Similarity.assignCells(col("v"), col("nrm"), anchors, 1, minRouted = 0)(0).as("routed"))
    import org.apache.spark.sql.execution.debug._
    df.debugCodegen()
    spark.stop()
  }
}

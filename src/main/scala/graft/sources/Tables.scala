package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-generated test schema
  * (/root/testdata/sf*, see TESTDATA.md / FIXTURES.md §B).
  *
  * All reads go through `spark.read.parquet` so Catalyst gets native
  * source splits, column pruning and filter pushdown — the Spark
  * analog of the reference's manifest fan-out readers
  * (/root/reference/Matrix/LUDecomposition.java:299-335), which had to
  * hand-roll one I/O thread per child file.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** The driver's testdata generations have shipped `events.ts` under
    * two different parquet encodings, and a reader pinned to either one
    * breaks when the corpus is regenerated under the other:
    *
    *  - TIMESTAMP(NANOS): Spark's reader rejects it outright unless
    *    `nanosAsLong` maps it to a raw long — values are µs-aligned
    *    (verified: epoch_ns % 1000 == 0), so `DIV 1000` is a lossless
    *    rebuild (integer division avoids the >2^53 double trap of `/`).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark infers
    *    TIMESTAMP_NTZ, which the `java.sql.Timestamp` encoders and
    *    TimestampType-expecting expressions downstream don't accept.
    *
    * Dispatch on the footer schema and normalize both to a plain
    * TimestampType column (sessions here run UTC, so the NTZ cast is
    * value-identity). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  /** Normalize an events frame's `ts` to TimestampType whatever the
    * on-disk encoding was (shared with the streaming source, which
    * probes the same footer schema to declare its read schema). */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Row count of an UNFILTERED parquet scan from FOOTER metadata — a
    * regime/lane picker's cardinality probe (r38's broadcast-vs-bloom
    * choice) must not cost a table scan. Reads the frame's OWN
    * `inputFiles` (so the probe is bound to exactly the data the
    * caller scans — no path/name pair to drift) and sums the footers'
    * row-group counts; None on any layout surprise (caller counts the
    * hard way). Footers can't see filters: pass the raw table frame.
    *
    * Footers open in PARALLEL (fixed 16-way pool): metadata-only, but
    * a many-file table would otherwise serialize N driver round-trips
    * exactly where the bloom lane triggers (≥10M-row dims). Past
    * 4096 files even parallel footer-reads stop being "free" next to
    * the scan they'd save — give up and let the caller count. */
  def parquetRowCountOfScan(s: SparkSession, df: DataFrame): Option[Long] =
    try {
      val conf = s.sparkContext.hadoopConfiguration
      val files = df.inputFiles.filter(_.endsWith(".parquet"))
      if (files.isEmpty || files.length > 4096) None
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(16, files.length))
        try {
          val futures = files.map { f =>
            pool.submit(new java.util.concurrent.Callable[Long] {
              def call(): Long = {
                val in = org.apache.parquet.hadoop.util.HadoopInputFile
                  .fromPath(new org.apache.hadoop.fs.Path(f), conf)
                val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
                try r.getRecordCount finally r.close()
              }
            })
          }
          Some(futures.map(_.get()).sum)
        } finally pool.shutdown()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Register every test table as a temp view so raw `spark.sql(...)`
    * text works against the same data the DataFrame surface reads —
    * the engine's SQL-string entry point. */
  def registerAll(s: SparkSession, d: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(s, d) else table(s, d, n)
      df.createOrReplaceTempView(n)
    }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities. First line of defense at scale is AQE's
  * runtime skew-join splitting (`spark.sql.adaptive.skewJoin`, on by
  * default); this is the declarative fallback for cases AQE can't fix —
  * e.g. one hot key on BOTH sides, or aggregation (not join) skew.
  *
  * Reference analog: none — the reference sidesteps skew entirely by
  * construction (uniform block grids, one task per block id,
  * /root/reference/Matrix/LUDecomposition.java:653-659).
  */
object Skew {

  /** Salted equi-join: the (skewed) left side spreads each hot key over
    * `salt` sub-keys by a deterministic hash of the whole row; the
    * (smaller) right side is replicated `salt` ways. Shuffle keys become
    * (key, salt) — a single hot key now lands on `salt` reducers.
    * Result set is identical to `left.join(right, key)` (inner). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    val lsalt = left.withColumn("_salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salt)))
    val rsalt = right.withColumn("_salt",
      explode(array((0 until salt).map(lit(_)): _*)))
    lsalt.join(rsalt, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * aggregate on (key, salt) first — the hot key's load spreads over
    * `salt` partial groups — then combine partials. `partial` must be
    * decomposable (sum/count/min/max). */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salt: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salt)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate. */
case class Scored(id: Long, score: Double)

/** Bounded top-k by (score DESC, id ASC) as a typed `Aggregator` —
  * the UDAF path for rank-then-filter at scale. Unlike a ranking
  * window (which must shuffle every candidate row to its partition
  * before ranking), an aggregate is PARTIALLY APPLIED map-side: each
  * input partition reduces to ≤ k rows before the exchange, so the
  * shuffle volume is k·|groups| regardless of candidate count.
  * (Spark's WindowGroupLimit gets part of this for windows; the
  * aggregate form also combines across partitions and composes with
  * other aggregates.)
  *
  * Determinism: the bound keeps the k smallest under a total order
  * (score DESC, id ASC) — insertion order never matters.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {

  private def lt(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Insert maintaining sorted order, bounded at k — k is small by
    * construction (top-k queries), so linear insert beats heap churn. */
  private def insert(buf: List[Scored], x: Scored): List[Scored] = {
    val (better, worse) = buf.span(lt(_, x))
    val merged = better ::: (x :: worse)
    if (merged.length > k) merged.take(k) else merged // local: Array.take inside the aggregator buffer
  }

  override def zero: List[Scored] = Nil
  override def reduce(b: List[Scored], a: Scored): List[Scored] = insert(b, a)
  override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
    b2.foldLeft(b1)(insert)
  override def finish(r: List[Scored]): Seq[Scored] = r
  override def bufferEncoder: Encoder[List[Scored]] = Encoders.kryo[List[Scored]]
  override def outputEncoder: Encoder[Seq[Scored]] = Encoders.kryo[Seq[Scored]]
}

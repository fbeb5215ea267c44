package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries summary state: parallel (item, count) sequences kept
  * item-sorted so the buffer is a stable product type for the encoder.
  */
case class MgSummary(items: Seq[String], counts: Seq[Long])

/** Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] (a custom
  * UDAF — the one sketch shape Spark has no built-in for; HLL and
  * quantile sketches ship as approx_count_distinct / approx_percentile).
  *
  * Fixed state of at most `k` counters per partition, mergeable, one
  * pass: the group-less frequent-items operator for a 100 TB stream of
  * values where a full groupBy-count shuffle is not affordable.
  * Guarantees (n = rows seen): every stored count underestimates its true
  * frequency by at most n/(k+1), and every item with true frequency
  * above n/(k+1) is present. With k >= |domain| no eviction ever fires
  * and the sketch is EXACT — which is what makes it oracle-checkable
  * against a plain GROUP BY count on the test tables.
  *
  * Merge subtracts the (k+1)-th largest count before truncating
  * (Agarwal et al., "Mergeable Summaries", PODS'12), preserving the
  * error bound under arbitrary partition merge trees.
  */
class MisraGries(k: Int) extends Aggregator[String, MgSummary, MgSummary] {
  require(k >= 1, s"k must be >= 1, got $k")

  def zero: MgSummary = MgSummary(Nil, Nil)

  private def toMap(b: MgSummary): Map[String, Long] =
    b.items.iterator.zip(b.counts.iterator).toMap

  private def fromMap(m: Map[String, Long]): MgSummary = {
    val s = m.toSeq.sortBy(_._1)
    MgSummary(s.map(_._1), s.map(_._2))
  }

  def reduce(b: MgSummary, item: String): MgSummary = {
    val m = toMap(b)
    m.get(item) match {
      case Some(c) => fromMap(m.updated(item, c + 1))
      case None if m.size < k => fromMap(m.updated(item, 1L))
      case None =>
        // classic MG eviction: decrement every counter, drop zeros
        fromMap(m.collect { case (key, c) if c > 1 => key -> (c - 1) })
    }
  }

  def merge(a: MgSummary, b: MgSummary): MgSummary = {
    val m = scala.collection.mutable.Map.empty[String, Long]
    toMap(a).foreach { case (key, c) => m(key) = c }
    toMap(b).foreach { case (key, c) => m(key) = m.getOrElse(key, 0L) + c }
    if (m.size <= k) fromMap(m.toMap)
    else {
      val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
      fromMap(m.iterator
        .map { case (key, c) => key -> (c - cut) }
        .filter(_._2 > 0L).toMap)
    }
  }

  def finish(r: MgSummary): MgSummary = r
  def bufferEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
  def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
}

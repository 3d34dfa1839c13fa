package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded Misra–Gries counter summary: at most k (item, count)
  * entries, kept as parallel seqs for a cheap product encoder. */
case class MgBuf(items: Seq[String], counts: Seq[Long])

/** Misra–Gries heavy-hitters sketch (Misra & Gries 1982; mergeability
  * per Agarwal et al., PODS'12 "Mergeable Summaries") — the scale path
  * for frequent-term discovery: a bounded k-counter summary per map
  * task instead of shuffling the full corpus vocabulary.
  *
  * Guarantee: after summarizing a stream of N items, every item with
  * true frequency > N/(k+1) is PRESENT in the summary (counts are
  * under-estimates, never over). The caller therefore uses this as a
  * candidate filter and re-counts the (<= k) survivors exactly — the
  * classic two-pass exact heavy-hitters protocol. Merging two
  * summaries (sum counts; if more than k survive, subtract the
  * (k+1)-largest count from all and drop non-positives) preserves the
  * guarantee, so partial aggregation is sound.
  *
  * The buffer is an unordered assoc list bounded at k entries; reduce
  * is O(k) worst case (the decrement step), merge O(k log k). k here
  * is 10s–100s, not 10^6. */
class HeavyHittersAggregator(k: Int)
    extends Aggregator[String, MgBuf, MgBuf] {
  require(k >= 1, "k must be positive")

  override def zero: MgBuf = MgBuf(Vector.empty, Vector.empty)

  override def reduce(buf: MgBuf, item: String): MgBuf = {
    val i = buf.items.indexOf(item)
    if (i >= 0)
      MgBuf(buf.items, buf.counts.updated(i, buf.counts(i) + 1))
    else if (buf.items.length < k)
      MgBuf(buf.items :+ item, buf.counts :+ 1L)
    else {
      // summary full: decrement every counter (the arriving item's
      // implicit counter hits 0 immediately), drop exhausted entries
      val kept = buf.items.zip(buf.counts)
        .collect { case (it, c) if c > 1 => (it, c - 1) }.toVector
      MgBuf(kept.map(_._1), kept.map(_._2))
    }
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    val summed = scala.collection.mutable.LinkedHashMap[String, Long]()
    a.items.zip(a.counts).foreach { case (it, c) => summed(it) = c }
    b.items.zip(b.counts).foreach { case (it, c) =>
      summed(it) = summed.getOrElse(it, 0L) + c }
    if (summed.size <= k) MgBuf(summed.keys.toVector, summed.values.toVector)
    else {
      // subtract the (k+1)-th largest count from everything — the
      // mergeable-summaries offset step; at most k survive because
      // the (k+1)-th largest itself goes to zero
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      val kept = summed.iterator
        .collect { case (it, c) if c - cut > 0 => (it, c - cut) }.toVector
      MgBuf(kept.map(_._1), kept.map(_._2))
    }
  }

  override def finish(r: MgBuf): MgBuf = r

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]

  override def outputEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
}

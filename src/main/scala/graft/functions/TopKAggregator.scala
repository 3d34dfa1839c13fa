package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One ranked candidate. */
case class TopEntry(vecId: Long, cosine: Double)

/** Bounded top-k buffer (sorted best-first, length <= k). */
case class TopBuf(items: Seq[TopEntry])

/** Bounded top-k typed Aggregator — the scale path for per-query ANN
  * ranking. The `row_number` window form shuffles EVERY scored
  * candidate to its query's reducer before discarding all but k; this
  * aggregator keeps at most k (cosine desc, vec_id asc) entries in its
  * buffer, so partial aggregation (map-side combine) bounds both the
  * shuffle payload and reducer memory at k rows per query per map
  * task, independent of corpus size.
  *
  * Determinism: the merge order of partial buffers varies run to run,
  * but top-k under a total order (cosine desc, then vec_id asc as the
  * tie-break) is order-insensitive, so the result set is stable.
  *
  * Buffer is a sorted Vector (k is small — 10s, not 10^6): insertion
  * keeps it sorted, merge is a bounded merge of two sorted runs. */
class TopKAggregator(k: Int)
    extends Aggregator[TopEntry, TopBuf, TopBuf] {
  require(k >= 1, "k must be positive")

  /** best-first total order: cosine desc, vec_id asc. Compared via
    * java.lang.Double.compare, which matches Spark SQL's ordering
    * (NaN greater than every double, so a NaN cosine — e.g. from a
    * zero-norm vector — ranks first, exactly like the row_number
    * window twin). A `>`/`==` comparison would silently sort NaN
    * entries last instead. */
  private def better(a: TopEntry, b: TopEntry): Boolean = {
    val c = java.lang.Double.compare(a.cosine, b.cosine)
    c > 0 || (c == 0 && a.vecId < b.vecId)
  }

  override def zero: TopBuf = TopBuf(Vector.empty)

  override def reduce(buf: TopBuf, e: TopEntry): TopBuf = {
    val items = buf.items
    if (items.length >= k && better(items.last, e)) buf
    else {
      val i = items.indexWhere(x => better(e, x)) match {
        case -1 => items.length
        case n => n
      }
      TopBuf(((items.take(i) :+ e) ++ items.drop(i)).take(k))
    }
  }

  override def merge(a: TopBuf, b: TopBuf): TopBuf = {
    // bounded merge of two sorted runs
    val out = Vector.newBuilder[TopEntry]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.items.length || j < b.items.length)) {
      val takeA = j >= b.items.length ||
        (i < a.items.length && better(a.items(i), b.items(j)))
      if (takeA) { out += a.items(i); i += 1 }
      else { out += b.items(j); j += 1 }
      n += 1
    }
    TopBuf(out.result())
  }

  // output stays the product buffer: the caller posexplodes `items`
  // into (rank, vec_id, cosine) rows declaratively
  override def finish(r: TopBuf): TopBuf = r

  override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]

  override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One counted gram. */
case class GramCnt(gram: String, cnt: Long)

/** Bounded top-k gram buffer (sorted best-first, length <= k). */
case class GramBuf(items: Seq[GramCnt])

/** Bounded top-k (count desc, gram asc) typed Aggregator — the
  * doc-profile stage of the language classifier. The `row_number`
  * window form re-shuffles the ENTIRE distinct (doc, gram) frame
  * (≈ corpus characters) to each doc's reducer and sorts it there,
  * only to keep the top `k` grams; this aggregator keeps at most k
  * entries in its buffer, so partial aggregation (map-side combine)
  * bounds both the shuffle payload and reducer memory at k rows per
  * doc per map task, independent of document length — the same
  * discipline as [[TopKAggregator]] (ANN ranking) and
  * [[KMinValuesAggregator]] (reservoirs / distinct sketches).
  *
  * Determinism: top-k under the TOTAL order (cnt desc, gram asc —
  * grams are distinct within a doc after the upstream count, so the
  * tie-break always decides) is insensitive to the merge order of
  * partial buffers, so the result equals the row_number window over
  * the same order — the equivalence the langId spec pins.
  *
  * Buffer is a sorted Vector (k is small — 32ish): insertion keeps it
  * sorted, merge is a bounded merge of two sorted runs. */
class GramTopKAggregator(k: Int)
    extends Aggregator[GramCnt, GramBuf, GramBuf] {
  require(k >= 1, "k must be positive")

  /** best-first total order: cnt desc, gram asc. */
  private def better(a: GramCnt, b: GramCnt): Boolean =
    a.cnt > b.cnt || (a.cnt == b.cnt && a.gram < b.gram)

  override def zero: GramBuf = GramBuf(Vector.empty)

  override def reduce(buf: GramBuf, e: GramCnt): GramBuf = {
    val items = buf.items
    if (items.length >= k && better(items.last, e)) buf
    else {
      val i = items.indexWhere(x => better(e, x)) match {
        case -1 => items.length
        case n => n
      }
      GramBuf(((items.take(i) :+ e) ++ items.drop(i)).take(k))
    }
  }

  override def merge(a: GramBuf, b: GramBuf): GramBuf = {
    // bounded merge of two sorted runs
    val out = Vector.newBuilder[GramCnt]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.items.length || j < b.items.length)) {
      val takeA = j >= b.items.length ||
        (i < a.items.length && better(a.items(i), b.items(j)))
      if (takeA) { out += a.items(i); i += 1 }
      else { out += b.items(j); j += 1 }
      n += 1
    }
    GramBuf(out.result())
  }

  // output stays the product buffer: the caller posexplodes `items`
  // into (rank, gram) rows declaratively
  override def finish(r: GramBuf): GramBuf = r

  override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]

  override def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
}

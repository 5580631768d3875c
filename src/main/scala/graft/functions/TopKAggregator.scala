package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF (SURVEY.md §2.B10): exact top-k (count desc, word asc)
  * with a bounded buffer, so the aggregation state is O(k) regardless of
  * input size — the map-side partial aggregation each keeps k candidates and
  * merge is a k-way bounded merge. (The planner's TakeOrderedAndProject
  * covers the common case; this Aggregator is the API surface for computing
  * a top-k INSIDE another aggregation, e.g. per-group, where a sort+limit
  * cannot be nested.)
  */
class TopKWords(k: Int) extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {

  private def best(xs: Seq[(String, Long)]): Seq[(String, Long)] =
    xs.sortBy { case (w, c) => (-c, w) }.take(k)

  override def zero: Seq[(String, Long)] = Seq.empty

  /** Bounded insertion: the buffer stays sorted (count desc, word asc), so a
    * full buffer rejects a non-improving row by one comparison against the
    * current worst — no sort, no allocation on the overwhelmingly common
    * path. Ties with the worst are rejected too: the stable sort in `best`
    * would place the incumbent first and drop the newcomer anyway.
    */
  override def reduce(buf: Seq[(String, Long)], in: (String, Long)): Seq[(String, Long)] = {
    if (buf.size >= k) {
      val (ww, wc) = buf.last
      if (in._2 < wc || (in._2 == wc && in._1 >= ww)) return buf
    }
    best(buf :+ in)
  }

  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    best(a ++ b)

  override def finish(r: Seq[(String, Long)]): Seq[(String, Long)] = r

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

object TopKWords {
  def apply(k: Int): TopKWords = new TopKWords(k)
}

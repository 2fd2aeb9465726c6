package graft

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator (SURVEY.md §2.11's UDAF
  * surface) — the partial-aggregation kernel of
  * [[Graft.knnJoinExact]]: `groupBy(probe).agg(topK)` keeps at most k
  * (id, score) entries per partial buffer, so a batch brute-force kNN
  * join moves ≤ k·|probes| rows per map task through the shuffle
  * instead of the full |corpus|·|probes| score matrix a window-rank
  * plan would sort. Partial buffers merge by k-way selection — the
  * combiner path is exactly the per-executor heap a hand-written
  * cluster kNN uses, and it works unchanged at 100 TB.
  *
  * Ordering is total and deterministic: score DESC, id ASC on ties.
  * NULL scores are dropped (a NULL similarity cannot rank). `finish`
  * emits the buffer fully sorted, so `posexplode` at the call site
  * yields the rank directly.
  */
object TopK {
  /** One scored candidate. The udaf call site passes (id, score) as
    * two columns — Spark maps the case-class fields positionally. */
  case class Entry(id: Long, score: Double)

  /** A scored candidate carrying one extra long of per-pair metadata
    * (e.g. the SRP Hamming distance) through the cut — the tag plays
    * no part in the ordering. */
  case class Tagged(id: Long, score: Double, tag: Long)

  private def lt(a: Entry, b: Entry): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def ltTagged(a: Tagged, b: Tagged): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** The shared bounded-top-k kernel over any entry type: sorted
    * buffer (best first), capped at k on insert and merge. */
  private def bounded[E >: Null <: AnyRef : scala.reflect.ClassTag](
      k: Int, lt: (E, E) => Boolean,
      be: Encoder[Array[E]], oe: Encoder[Seq[E]]): Aggregator[E, Array[E], Seq[E]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    new Aggregator[E, Array[E], Seq[E]] {
      def zero: Array[E] = Array.empty[E]

      /** Insert keeping the buffer sorted (best first) and bounded at
        * k: O(k) per row with no allocation churn beyond the copy —
        * k is small (5..100) by construction. */
      def reduce(buf: Array[E], e: E): Array[E] =
        if (e == null) buf
        else if (buf.length >= k && !lt(e, buf(buf.length - 1))) buf
        else {
          var lo = 0
          while (lo < buf.length && lt(buf(lo), e)) lo += 1
          val n = math.min(buf.length + 1, k)
          val out = new Array[E](n)
          System.arraycopy(buf, 0, out, 0, lo)
          out(lo) = e
          System.arraycopy(buf, lo, out, lo + 1, n - lo - 1)
          out
        }

      /** Sorted-merge of two sorted buffers, cut at k. */
      def merge(a: Array[E], b: Array[E]): Array[E] =
        if (a.isEmpty) b
        else if (b.isEmpty) a
        else {
          val n = math.min(a.length + b.length, k)
          val out = new Array[E](n)
          var i = 0; var j = 0; var o = 0
          while (o < n) {
            if (j >= b.length || (i < a.length && lt(a(i), b(j)))) {
              out(o) = a(i); i += 1
            } else { out(o) = b(j); j += 1 }
            o += 1
          }
          out
        }

      def finish(buf: Array[E]): Seq[E] = buf.toSeq
      def bufferEncoder: Encoder[Array[E]] = be
      def outputEncoder: Encoder[Seq[E]] = oe
    }
  }

  def agg(k: Int): Aggregator[Entry, Array[Entry], Seq[Entry]] =
    bounded[Entry](k, lt,
      ExpressionEncoder[Array[Entry]](), ExpressionEncoder[Seq[Entry]]())

  /** [[agg]] with a pass-through long tag per entry — the batch ANN
    * facades use it to keep the Hamming distance attached to each
    * surviving candidate without a second join. */
  def taggedAgg(k: Int): Aggregator[Tagged, Array[Tagged], Seq[Tagged]] =
    bounded[Tagged](k, ltTagged,
      ExpressionEncoder[Array[Tagged]](), ExpressionEncoder[Seq[Tagged]]())
}

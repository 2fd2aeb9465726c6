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

  private def lt(a: Entry, b: Entry): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  def agg(k: Int): Aggregator[Entry, Array[Entry], Seq[Entry]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    new Aggregator[Entry, Array[Entry], Seq[Entry]] {
      def zero: Array[Entry] = Array.empty[Entry]

      /** Insert keeping the buffer sorted (best first) and bounded at
        * k: O(k) per row with no allocation churn beyond the copy —
        * k is small (5..100) by construction. */
      def reduce(buf: Array[Entry], e: Entry): Array[Entry] =
        if (e == null) buf
        else if (buf.length >= k && !lt(e, buf(buf.length - 1))) buf
        else {
          var lo = 0
          while (lo < buf.length && lt(buf(lo), e)) lo += 1
          val n = math.min(buf.length + 1, k)
          val out = new Array[Entry](n)
          System.arraycopy(buf, 0, out, 0, lo)
          out(lo) = e
          System.arraycopy(buf, lo, out, lo + 1, n - lo - 1)
          out
        }

      /** Sorted-merge of two sorted buffers, cut at k. */
      def merge(a: Array[Entry], b: Array[Entry]): Array[Entry] =
        if (a.isEmpty) b
        else if (b.isEmpty) a
        else {
          val n = math.min(a.length + b.length, k)
          val out = new Array[Entry](n)
          var i = 0; var j = 0; var o = 0
          while (o < n) {
            if (j >= b.length || (i < a.length && lt(a(i), b(j)))) {
              out(o) = a(i); i += 1
            } else { out(o) = b(j); j += 1 }
            o += 1
          }
          out
        }

      def finish(buf: Array[Entry]): Seq[Entry] = buf.toSeq
      def bufferEncoder: Encoder[Array[Entry]] = ExpressionEncoder[Array[Entry]]()
      def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
    }
  }
}

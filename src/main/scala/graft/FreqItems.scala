package graft

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed Aggregator (SURVEY.md
  * §2.11's UDAF surface) — at most `k` counters of bounded-error
  * estimated counts, the candidate-finding half of
  * [[Graft.heavyHitters]]' two-pass exact heavy-hitter query.
  *
  * Guarantees (the classic MG bound, preserved under merging —
  * Agarwal et al., "Mergeable Summaries", PODS 2012):
  * `true_count - n/(k+1) <= est <= true_count` for every item, where
  * n is the total item count seen. Hence every item with
  * `true_count > n/(k+1)` has est > 0 and IS in the sketch — the
  * containment [[Graft.heavyHitters]]' exact second pass relies on.
  * The ESTIMATES (and which sub-threshold extras survive) depend on
  * partition merge order; only the containment is deterministic,
  * which is why the public facade recounts candidates exactly instead
  * of emitting sketch estimates.
  *
  * Distributed shape: each partial buffer is ≤ k counters, partials
  * merge by counter-sum followed by the (k+1)-th-largest decrement —
  * the combiner path works unchanged at 100 TB and the final sketch
  * is O(k) driver-side state, never a data-scale collect.
  */
object FreqItems {

  /** The MG sketch over a string item column. NULL items are ignored
    * (they carry no frequency mass — count non-nulls for n). */
  def agg(k: Int): Aggregator[String, Map[String, Long], Map[String, Long]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    new Aggregator[String, Map[String, Long], Map[String, Long]] {
      def zero: Map[String, Long] = Map.empty

      def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
        if (item == null) buf
        else buf.get(item) match {
          case Some(c) => buf.updated(item, c + 1)
          case None if buf.size < k => buf.updated(item, 1L)
          // full and unseen: decrement every counter (the arriving
          // item's +1 and its own -1 cancel), drop zeros
          case None =>
            buf.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
        }

      def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
        val sum = b.foldLeft(a) { case (m, (i, c)) =>
          m.updated(i, m.getOrElse(i, 0L) + c)
        }
        if (sum.size <= k) sum
        else {
          // subtract the (k+1)-th largest count from all: at most k
          // survive and each item's total decrement stays within the
          // merged n/(k+1) budget
          val d = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
          sum.flatMap { case (i, c) => if (c > d) Some(i -> (c - d)) else None }
        }
      }

      def finish(buf: Map[String, Long]): Map[String, Long] = buf
      def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
      def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
    }
  }
}

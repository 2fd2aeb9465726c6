package graft

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise sum of equal-length double vectors as a typed
  * Aggregator (SURVEY.md §2.11's UDAF surface) — the centroid-
  * recompute kernel of [[Graft.ivfTrain]]: `groupBy(cell).agg(vecsum)`
  * replaces the posexplode → per-(cell, dim) mean → re-collect chain
  * with ONE map-side-combinable aggregation, so a Lloyd iteration is a
  * single shuffle of ≤ |cells| · dims doubles instead of a dims×
  * row-blowup. Partial buffers merge element-wise-add — the
  * combiner/partial-aggregation path works unchanged at 100 TB.
  *
  * Vectors must share one dimensionality; ragged input FAILS LOUDLY.
  * Folding only a common prefix would make the result depend on which
  * vector arrived first in each partial buffer — i.e. on partitioning
  * and arrival order — so a length mismatch throws instead of silently
  * producing a run-dependent sum. A ZERO-LENGTH input vector throws
  * unconditionally: an empty input is indistinguishable from the
  * not-yet-initialized zero buffer, so whether "empty after non-empty"
  * raggedness was detected would otherwise depend on partition/arrival
  * order — the exact run-dependence this contract exists to kill
  * (NULLs, by contrast, are skipped: SQL aggregate convention). The
  * mean is `transform(sum, x -> x / n)` at the call site, keeping
  * division out of the merge path.
  */
object VecSum {
  private def requireSameLength(have: Int, got: Int): Unit =
    if (have != got)
      throw new IllegalArgumentException(
        s"VecSum requires one dimensionality: buffer has $have dims, input has $got")

  val agg: Aggregator[Seq[Double], Array[Double], Seq[Double]] =
    new Aggregator[Seq[Double], Array[Double], Seq[Double]] {
      def zero: Array[Double] = Array.emptyDoubleArray
      def reduce(buf: Array[Double], v: Seq[Double]): Array[Double] =
        if (v == null) buf
        else if (v.isEmpty)
          throw new IllegalArgumentException(
            "VecSum input vector is empty (0 dims) — empty vectors cannot " +
              "be summed (use NULL to skip a row)")
        else if (buf.length == 0) v.toArray
        else {
          requireSameLength(buf.length, v.length)
          var i = 0
          while (i < buf.length) { buf(i) += v(i); i += 1 }
          buf
        }
      def merge(a: Array[Double], b: Array[Double]): Array[Double] =
        if (a.length == 0) b
        else if (b.length == 0) a
        else {
          requireSameLength(a.length, b.length)
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        }
      def finish(buf: Array[Double]): Seq[Double] = buf.toSeq
      def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
      def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
    }
}

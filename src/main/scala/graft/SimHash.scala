package graft

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import scala.util.hashing.MurmurHash3

/** 64-bit SimHash UDAF: aggregates (token, tf) rows of one document
  * into a single long. For bit i, sum tf·(+1/-1) by token-hash bit i;
  * the sign of the sum is bit i of the fingerprint. Near-duplicate
  * documents land within a small Hamming distance.
  *
  * Like [[MinHash]], partial buffers merge element-wise (vector add),
  * so Spark's partial+final aggregation distributes it unchanged.
  */
object SimHash {
  val Bits = 64
  /** Bands for Hamming-LSH bucketing: pairs at distance ≤ 3 cannot
    * differ in all 4 16-bit bands (pigeonhole), so band-equality
    * buckets have perfect recall at the ≤3 cutoff. */
  val NumBands = 4
  val BandBits: Int = Bits / NumBands

  /** 64-bit token hash from two seeded 32-bit murmurs. */
  def hash64(token: String): Long =
    (MurmurHash3.stringHash(token, 0x2545f491).toLong << 32) |
      (MurmurHash3.stringHash(token, 0x9e3779b9).toLong & 0xffffffffL)

  def bandKey(sig: Long, band: Int): Long = (sig >>> (band * BandBits)) & 0xffffL

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** IN = (token, tf); BUF = per-bit signed sums; OUT = packed long. */
  val agg: Aggregator[(String, Long), Array[Long], Long] =
    new Aggregator[(String, Long), Array[Long], Long] {
      def zero: Array[Long] = new Array[Long](Bits)
      def reduce(buf: Array[Long], in: (String, Long)): Array[Long] = {
        val h = hash64(in._1)
        var i = 0
        while (i < Bits) {
          buf(i) += (if (((h >>> i) & 1L) == 1L) in._2 else -in._2)
          i += 1
        }
        buf
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < Bits) { a(i) += b(i); i += 1 }
        a
      }
      def finish(buf: Array[Long]): Long = {
        var sig = 0L
        var i = 0
        while (i < Bits) { if (buf(i) > 0) sig |= (1L << i); i += 1 }
        sig
      }
      def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
      def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
    }
}

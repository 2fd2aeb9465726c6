package graft

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import scala.util.hashing.MurmurHash3

/** MinHash signature UDAF (SURVEY.md §2.11): aggregates the token rows
  * of one document into a 64-permutation MinHash signature.
  *
  * This is the STREAMING / token-at-a-time merging variant: partial
  * buffers merge element-wise-min, so the combiner/partial-aggregation
  * path works unchanged at 100 TB and across streaming micro-batches.
  * The batch pipeline (`nearDupPairsMinhash`) computes signatures
  * row-locally instead via the native codegen'd
  * [[graft.functions.MinHashSig]] — SAME seeded hash family
  * ([[hashToken]]), bit-identical output, equivalence pinned in
  * MinHashSpec.
  *
  * The "permutations" are 64 seeded MurmurHash3 string hashes — pure
  * JVM, deterministic across executors and runs. P[min-hash collision]
  * per permutation equals the Jaccard similarity of the token sets, so
  * the fraction of matching signature positions estimates Jaccard.
  */
object MinHash {
  val NumPerms = 64
  /** Band count for LSH bucketing: 8 bands × 8 rows. The emitted set is
    * {pairs with estimated Jaccard ≥ 0.9} = ≤6 of 64 signature positions
    * differing; 6 mismatches can touch at most 6 of the 8 bands, so every
    * emitted pair is GUARANTEED to collide in ≥2 bands (pigeonhole) — the
    * banding choice cannot lose an output pair, it only tunes how many
    * below-threshold candidates reach the estimate filter. 8×8 is far more
    * selective than 16×4 (P[collide | J=0.7]: ~38% vs ~87%). */
  val NumBands = 8
  val RowsPerBand: Int = NumPerms / NumBands

  private val seeds: Array[Int] = Array.tabulate(NumPerms)(i => 0x9747b28c + i * 0x61c88647)

  def hashToken(token: String, perm: Int): Long =
    MurmurHash3.stringHash(token, seeds(perm)).toLong & 0xffffffffL

  val agg: Aggregator[String, Array[Long], Seq[Long]] =
    new Aggregator[String, Array[Long], Seq[Long]] {
      def zero: Array[Long] = Array.fill(NumPerms)(Long.MaxValue)
      def reduce(buf: Array[Long], token: String): Array[Long] = {
        var i = 0
        while (i < NumPerms) {
          val h = hashToken(token, i)
          if (h < buf(i)) buf(i) = h
          i += 1
        }
        buf
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < NumPerms) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
        a
      }
      def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
      def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
      def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    }
}

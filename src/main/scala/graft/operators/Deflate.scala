package graft.operators

import java.util.zip.Deflater

/** DEFLATE-based compressibility measurement — the quality signal a
  * large-scale text pipeline computes per document (the Gopher/CCNet
  * family's "compression ratio" heuristic): machine-generated
  * boilerplate, template spam and repeated text compress far below
  * natural prose, and the ratio needs no model, no vocabulary and no
  * second corpus pass. This object holds the per-document primitive;
  * the declared query (PipelineOps.q_compress_ratio) supplies the
  * partition-batched plumbing.
  *
  * Determinism stance: DEFLATE output for a fixed (input, level,
  * strategy) is deterministic within a JVM/zlib build, but the exact
  * byte count is NOT a cross-engine constant (DuckDB has no deflate
  * at all) — so the consumer query is oracle = no, and PipelineSpec
  * pins the properties that ARE stable contracts: repeated text
  * compresses strictly below shuffled/varied text, the corpus-mass
  * ratio stays under 1000 permille on natural text while a tiny doc
  * can exceed 1000 only by the fixed ~11-byte zlib wrapper +
  * stored-block overhead, and the measurement is bit-stable across
  * invocations.
  *
  * Allocation discipline: a [[Deflater]] carries native zlib state
  * that is expensive to create and must be `end()`ed; callers
  * allocate ONE per partition, [[deflatedSize]] resets it per row
  * (the Multimodal codec-amortization pattern — per-row allocation
  * measured as the dominant cost at corpus scale). */
object Deflate {

  /** Compressed byte count of `bytes` under the supplied (caller-
    * owned, reused) deflater. Resets the deflater before use, so any
    * prior row's state cannot leak into this row's measurement. */
  def deflatedSize(bytes: Array[Byte], deflater: Deflater): Long = {
    deflater.reset()
    deflater.setInput(bytes)
    deflater.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!deflater.finished()) {
      total += deflater.deflate(buf)
    }
    total
  }

  /** One-shot convenience for tests and single measurements — owns
    * its deflater and ends it. Level 6 (the zlib default) fixed: the
    * ratio is a SIGNAL, and a signal must not move when a deployment
    * retunes compression elsewhere. */
  def deflatedSizeOnce(bytes: Array[Byte]): Long = {
    val d = new Deflater(6)
    try deflatedSize(bytes, d) finally d.end()
  }
}

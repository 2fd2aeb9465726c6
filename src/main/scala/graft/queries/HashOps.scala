package graft.queries

import graft.{SimHash, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Hash-fingerprint pipeline extensions (SURVEY.md §2.12): SimHash
  * near-dup, winnowing document fingerprints, brute-force + IVF vector
  * similarity. Hash functions are JVM-side (Murmur/xxhash64), so these
  * are not DuckDB-expressible: q_dedup_simhash / q_doc_fingerprint /
  * q_sim_ivf are oracle=no (unit-tested); q_dedup_embed is pure
  * double arithmetic and keeps a full oracle.
  */
object HashOps {

  /** SimHash near-dup pairs at Hamming distance ≤ 3. Pipeline:
    * (doc, token, tf) → SimHash UDAF → 4×16-bit band buckets →
    * band-equality self-join (perfect recall at ≤3 by pigeonhole,
    * see [[graft.SimHash.NumBands]]) → exact Hamming filter. Narrow
    * rows (two longs) end-to-end; never all-pairs. */
  def q_dedup_simhash(s: SparkSession, d: String): DataFrame =
    // The query IS graft.Graft.nearDupPairsSimhash applied to the
    // documents table at Hamming ≤ 3 (pigeonhole-perfect recall for
    // the 4×16-bit banding); built-in band key / bit_count Hamming.
    graft.Graft.nearDupPairsSimhash(Tables.documents(s, d),
        col("doc_id"), col("text"), maxHamming = 3)
      .orderBy("doc_a", "doc_b")

  /** Winnowing document fingerprints (the MOSS scheme): 3-token
    * shingles → xxhash64 per shingle → keep the minimum hash of every
    * 4-shingle window → distinct fingerprint set per document. The
    * query IS [[graft.Graft.winnowingFingerprints]] applied to the
    * documents table — all higher-order functions over one row,
    * embarrassingly parallel. */
  def q_doc_fingerprint(s: SparkSession, d: String): DataFrame =
    graft.Graft.winnowingFingerprints(Tables.documents(s, d),
        col("doc_id"), col("text"), shingle = 3, window = 4)
      .orderBy("doc_id")

  /** Exact pairwise-cosine "near-dup review queue": the 20 most
    * similar embedding pairs. Brute force all-pairs — the exact
    * baseline (the corpus's vectors are i.i.d. random, so no fixed
    * threshold is non-trivial); [[q_sim_ivf]] is the sub-linear scale
    * path.
    *
    * Execution — the blocked broadcast loop, fully planner-managed (no
    * driver-side collect anywhere): the peer side is split into CHUNKS
    * disjoint blocks by id-hash; each block reaches the custom
    * [[graft.plans.DotTopKJoinExec]] operator as a planner-built
    * broadcast (`BroadcastDistribution` → BroadcastExchange under
    * Spark's managed memory accounting), and the exec's tight
    * primitive-array loop emits ≤ 20 rows per partition — the
    * quadratic pair set is never materialized as rows. The
    * `vec_b > vec_a` triangle check scores every unordered pair in
    * exactly ONE block, so the global top-20 is contained in the union
    * of per-block top-20s and a final TakeOrdered(20) finishes. At
    * 100 TB CHUNKS grows with the corpus so each broadcast stays
    * bounded; per-pass cost is one linear scan of the stream side.
    * Dot products fold in index order — bit-compatible with the
    * oracle's unnest-ordered SUM; rounding replicates Spark's ROUND
    * (BigDecimal HALF_UP), with the exec's proven cheap-reject bound
    * skipping the exact rounding for non-candidates. */
  def q_dedup_embed(s: SparkSession, d: String): DataFrame =
    graft.Graft.topkCosinePairs(Tables.embeddings(s, d),
      col("vec_id"), col("embedding").cast("array<double>"), k = 20, chunks = 2)

  /** Deterministic ±1 random hyperplanes for SRP hashing: plane p,
    * dim i weight from a seeded Murmur bit. */
  private def srpPlane(p: Int, dims: Int): Array[Double] =
    Array.tabulate(dims) { i =>
      if ((scala.util.hashing.MurmurHash3.productHash((p, i)) & 1) == 1) 1.0 else -1.0
    }

  /** Sign-random-projection LSH approximate NN — the LSH sibling of
    * [[q_sim_ivf]]: 16 hyperplane sign bits per vector (computed with
    * the native [[graft.functions.DotProduct]] kernel), candidates =
    * vectors whose SRP signature is within Hamming distance 5 of the
    * probe's, exact cosine rerank of candidates only. At scale the
    * signature is the bucket key (group-by-signature + multi-probe of
    * neighboring buckets); the Hamming radius is the recall/cost
    * knob — radius 5 of 16 bits reranks ~10% of a direction-uniform
    * corpus (radius 3 returned fewer candidates than k=10 here).
    * Oracle=no (JVM-seeded planes); unit-tested: returned scores must
    * equal the brute-force scores exactly. */
  def q_sim_srp(s: SparkSession, d: String): DataFrame = {
    val bits = 16
    val dot = graft.functions.GraftFunctions.dot _
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val dims = 64
    val sigExpr = (0 until bits).map { p =>
      when(dot(col("v"), typedlit(srpPlane(p, dims).toSeq)) > 0, 1L << p).otherwise(0L)
    }.reduce(_ + _)
    val signed = e.select(col("vec_id"), col("label"), col("v"), sigExpr.as("sig"))
    val probe = signed.filter(col("vec_id") === 0)
      .select(col("v").as("pv"), col("sig").as("psig"))
    signed.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .filter(expr("bit_count(sig ^ psig)") <= 5)
      .select(col("vec_id"), col("label"), round(dot(col("v"), col("pv")), 3).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
  }

  /** IVF-style approximate nearest neighbor with a TRAINED coarse
    * quantizer: centroids are SEEDED from per-label means (the label
    * only seeds — the cell id is an opaque hash, never the label) and
    * refined with 3 Lloyd iterations in pure DataFrame ops
    * (assign = argmax-dot over the broadcast centroid set via a
    * per-vector window; recompute = posexplode + per-(cell, dim)
    * mean, lineage truncated per iteration). Query path: rank cells
    * by probe·centroid, search the best nprobe=3 cells exhaustively —
    * scan cost ~nprobe/k of brute force. Training cost is k small
    * broadcast joins per iteration; at 100 TB one trains on a sample
    * and the assignment stays a single map-side pass. Oracle=no
    * (recall on i.i.d. vectors is data-dependent); the unit test
    * asserts within-cell exactness AND a recall floor vs the
    * brute-force top-10. */
  def q_sim_ivf(s: SparkSession, d: String): DataFrame = {
    val dot = graft.functions.GraftFunctions.dot _
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    def recompute(members: DataFrame): DataFrame =
      members.select(col("cell"), posexplode(col("v")))
        .groupBy("cell", "pos").agg(avg("col").as("c"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
                       x => x.getField("c")).as("cv"))
    // argmax-dot assignment as a map-side-combinable aggregate, not a
    // window: min_by over (-aff, cell) = max affinity, ties to the
    // smallest cell id — no k×-blown shuffle + sort at scale
    def assign(cents: DataFrame): DataFrame =
      e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("label"), col("v"), col("cell"),
                dot(col("v"), col("cv")).as("aff"))
        .groupBy("vec_id")
        .agg(first("label").as("label"), first("v").as("v"),
             min_by(col("cell"), struct(negate(col("aff")), col("cell"))).as("cell"))
        .select("vec_id", "label", "v", "cell")
    // seed cells = label means under an opaque hashed id, then Lloyd
    var centroids = recompute(e.select(xxhash64(col("label")).as("cell"), col("v")))
      .localCheckpoint()
    for (_ <- 1 to 3)
      centroids = recompute(assign(centroids)).localCheckpoint()
    val probe = e.filter(col("vec_id") === 0).select(col("v").as("pv"))
    // rank the k cells by probe affinity, keep nprobe=3
    val wCells = Window.orderBy(col("affinity").desc, col("cell").asc)
    val probeCells = centroids.crossJoin(broadcast(probe))
      .select(col("cell"), dot(col("cv"), col("pv")).as("affinity"))
      .select(col("cell"), row_number().over(wCells).as("rk"))
      .filter(col("rk") <= 3)
      .select("cell")
    // exhaustive search restricted to the probed cells
    assign(centroids).join(broadcast(probeCells), "cell")
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), col("label"), round(dot(col("v"), col("pv")), 3).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
  }
}

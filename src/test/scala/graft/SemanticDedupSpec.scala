package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic-dedup family (round 12, SURVEY §2.12): the threshold-mode
  * DotTopKJoin kernel, the exact verdict facade, and the IVF-pruned
  * scale path — exactness pinned against in-test brute force, the
  * approximate path pinned against the exact twin (the q_sim_ivf
  * discipline). */
class SemanticDedupSpec extends SparkSpecBase {
  import spark.implicits._

  // deterministic synthetic quality (vec_id mod 7): embeddings carry
  // no quality column, and the dominance rule only needs SOME total
  // order with ties to exercise the id tie-break
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
            (col("vec_id") % 7).as("q"))

  private def brutePairs(tau: Int): DataFrame = {
    val a = emb.select(col("vec_id").as("vec_a"), col("v").as("va"))
    val b = emb.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    a.crossJoin(b).filter(col("vec_b") > col("vec_a"))
      .select(col("vec_a"), col("vec_b"),
        round(functions.GraftFunctions.dot(col("va"), col("vb")), 3).as("cosine"))
      .filter(col("cosine") * 1000 >= tau)
  }

  test("cosineThresholdPairs == brute-force pairs (values AND scores), chunk-invariant") {
    // τ low enough that the embedding corpus has matches (unit-norm
    // synthetic vectors top out near cosine 0.48 at sf0.001)
    val tau = 400
    val brute = rows(brutePairs(tau).orderBy("vec_a", "vec_b"))
    val kernel = rows(Graft.cosineThresholdPairs(emb, col("vec_id"), col("v"), tau)
      .orderBy("vec_a", "vec_b"))
    assert(brute.nonEmpty, "vacuous: no pairs at the test threshold")
    assert(kernel == brute)
    // an explicit chunk override changes only the execution shape
    val chunked = rows(Graft.cosineThresholdPairs(emb, col("vec_id"), col("v"), tau,
        chunks = 3).orderBy("vec_a", "vec_b"))
    assert(chunked == brute)
  }

  test("semanticDupVerdicts: hand-built corpus, dominance and tie rules exact") {
    // v0 ≡ v1 ≡ v3 (cosine 1.0); v2 orthogonal. qualities: v0=5,
    // v1=9, v3=9 → v1 dominates v0; v1 vs v3 tie on quality → lower
    // id (v1) wins; v2 has no neighbor and must not appear.
    val df = Seq(
      (0L, Seq(1.0, 0.0), 5L),
      (1L, Seq(1.0, 0.0), 9L),
      (2L, Seq(0.0, 1.0), 7L),
      (3L, Seq(1.0, 0.0), 9L)).toDF("id", "v", "q")
    val out = rows(Graft.semanticDupVerdicts(df, col("id"), col("v"), col("q"),
        tauPermille = 950).orderBy("doc_id"))
    assert(out == Seq(
      Seq(0L, 5L, 2L, 1L),   // two dup neighbors, dominated by both
      Seq(1L, 9L, 2L, 0L),   // best quality, lowest id among ties: kept
      Seq(3L, 9L, 2L, 1L)))  // quality tie with v1, higher id: dropped
  }

  test("semanticDupVerdicts on embeddings == verdicts derived from brute-force pairs") {
    val tau = 400
    val facade = rows(Graft.semanticDupVerdicts(emb, col("vec_id"), col("v"),
        col("q"), tau).orderBy("doc_id"))
    val p = brutePairs(tau)
    val dir = p.select(col("vec_a").as("doc_id"), col("vec_b").as("nb"))
      .unionAll(p.select(col("vec_b").as("doc_id"), col("vec_a").as("nb")))
    val qt = emb.select(col("vec_id").as("doc_id"), col("q").cast("long").as("q"))
    val expected = rows(dir.join(qt, "doc_id")
      .join(qt.select(col("doc_id").as("nb"), col("q").as("nq")), "nb")
      .groupBy("doc_id", "q")
      .agg(count(lit(1)).as("n_dups"),
           max(when(col("nq") > col("q") ||
                    (col("nq") === col("q") && col("nb") < col("doc_id")),
                    1L).otherwise(0L)).as("dropped"))
      .select(col("doc_id"), col("q"), col("n_dups"), col("dropped"))
      .orderBy("doc_id"))
    assert(facade.nonEmpty && facade == expected)
  }

  test("IVF path: verdict-consistent subset of the exact twin, recall floor holds") {
    val tau = 400
    val exact = Graft.semanticDupVerdicts(emb, col("vec_id"), col("v"), col("q"), tau)
      .select(col("doc_id"), col("n_dups").as("n_exact"), col("dropped").as("d_exact"))
    val ivf = Graft.semanticDupVerdictsIvf(emb, col("vec_id"), col("v"), col("q"), tau,
        k = 4, iters = 3)
      .select(col("doc_id"), col("n_dups").as("n_ivf"), col("dropped").as("d_ivf"))
    val joined = ivf.join(exact, Seq("doc_id"), "left").collect()
    // every IVF neighbor is a real neighbor (within-cell pairs are
    // scored exactly), so verdicts can only be a subset: a doc the
    // IVF path sees at all must exist in the exact table, with fewer
    // or equal neighbors, and dropped only if the exact path drops it
    assert(joined.nonEmpty, "vacuous: IVF path found no neighbors")
    joined.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("n_exact")),
        s"IVF invented a neighbor for doc ${r.getLong(0)}")
      assert(r.getAs[Long]("n_ivf") <= r.getAs[Long]("n_exact"))
      assert(r.getAs[Long]("d_ivf") <= r.getAs[Long]("d_exact"))
    }
    // recall: within-cell pruning must keep a usable share of the
    // exact neighbor mass on this corpus (deterministic: ivfTrain's
    // init and sample are id-hash driven)
    val exactMass = exact.agg(sum("n_exact")).head().getLong(0)
    val ivfMass = ivf.agg(sum("n_ivf")).head().getLong(0)
    assert(ivfMass * 10 >= exactMass * 2,
      s"IVF recall collapsed: $ivfMass of $exactMass neighbor endpoints")
  }
}

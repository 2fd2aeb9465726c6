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

  // ------------------------------------------------------------------
  // Incremental face — round 13, verdict #4
  // ------------------------------------------------------------------

  test("incremental face == plain within-cell cross pairs under the shared standing model") {
    val tau = 400
    val batch = emb.filter(col("vec_id") % 10 === 0)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val model = Graft.ivfTrain(corpus, col("vec_id"), col("v"), k = 4, iters = 3)
      .localCheckpoint()
    val facade = rows(Graft.semanticDupVerdictsIvfAgainst(model,
        batch, col("vec_id"), col("v"), col("q"),
        corpus, col("vec_id"), col("v"), col("q"), tau).orderBy("doc_id"))
    // expected: a PLAIN (unguarded) cell equi-join — independent of
    // the SkewJoin machinery the facade routes through
    val b = Graft.ivfAssign(model,
      batch.select(col("vec_id").as("doc_id"), col("v"), col("q")), col("v"))
    val c = Graft.ivfAssign(model,
      corpus.select(col("vec_id").as("nb"), col("v").as("cv"),
                    col("q").as("nq")), col("cv"))
    val expected = rows(b.join(c, "cell")
      .select(col("doc_id"), col("q"), col("nb"), col("nq"),
              round(functions.GraftFunctions.dot(col("v"), col("cv")), 3).as("cosine"))
      .filter(round(col("cosine") * 1000, 0) >= tau)
      .groupBy("doc_id", "q")
      .agg(count(lit(1)).as("n_dups"),
           max(when(col("nq") > col("q") ||
                    (col("nq") === col("q") && col("nb") < col("doc_id")),
                    1L).otherwise(0L)).as("dropped"))
      .select(col("doc_id"), col("q").cast("long"), col("n_dups"), col("dropped"))
      .orderBy("doc_id"))
    assert(facade.nonEmpty, "vacuous: no cross neighbors at the test threshold")
    assert(facade == expected)
    // the hot-cell guard is execution-shape only: block-decomposed
    // run must be row-identical
    val guarded = rows(Graft.semanticDupVerdictsIvfAgainst(model,
        batch, col("vec_id"), col("v"), col("q"),
        corpus, col("vec_id"), col("v"), col("q"), tau,
        maxBucket = 2).orderBy("doc_id"))
    assert(guarded == facade)
  }

  test("incremental face: overlapping id is filtered, genuine neighbors kept") {
    val batch = Seq((1L, Seq(1.0, 0.0), 5L)).toDF("id", "v", "q")
    val corpus = Seq(
      (1L, Seq(1.0, 0.0), 5L),  // the SAME doc already ingested: must not self-pair
      (2L, Seq(1.0, 0.0), 9L),  // genuine dominating neighbor
      (3L, Seq(0.0, 1.0), 1L)).toDF("id", "v", "q")
    val model = Graft.ivfTrain(corpus, col("id"), col("v"), k = 1, iters = 1)
      .localCheckpoint()
    val out = rows(Graft.semanticDupVerdictsIvfAgainst(model,
        batch, col("id"), col("v"), col("q"),
        corpus, col("id"), col("v"), col("q"), tauPermille = 950))
    // k=1 → one cell → every pair is within-cell: the (1,1) identity
    // pair is filtered, doc 2 dominates (q 9 > 5), doc 3 is orthogonal
    assert(out == Seq(Seq(1L, 5L, 1L, 1L)))
  }
}

package graft

import graft.queries.TextOps
import org.apache.spark.sql.functions._

/** MinHash signature + LSH candidate-pair tests (SURVEY §5.3).
  * The estimator property: P[sig_a(i) == sig_b(i)] = Jaccard(A,B), so
  * the matching fraction over 64 permutations estimates Jaccard with
  * σ = sqrt(J(1-J)/64) ≈ 0.06 — assertions use a 4σ ≈ 0.25 bound. */
class MinHashSpec extends SparkSpecBase {
  import spark.implicits._

  private def signature(tokens: Set[String]): IndexedSeq[Long] =
    (0 until MinHash.NumPerms).map { p =>
      tokens.map(t => MinHash.hashToken(t, p)).min
    }

  test("identical token sets have identical signatures (est = 1.0)") {
    val a = signature(Set("a", "b", "c"))
    val b = signature(Set("c", "b", "a"))
    assert(a == b)
  }

  test("native MinHashSig expression == Aggregator == reference, codegen and interpreted") {
    // the row-local codegen'd signature must be BIT-IDENTICAL to both
    // the streaming Aggregator and the plain Scala reference — same
    // hash family, same min-fold — under whole-stage codegen AND the
    // interpreted eval fallback
    val rnd = new scala.util.Random(11)
    val rows = (1L to 40L).map { i =>
      (i, (1 to 1 + rnd.nextInt(30)).map(j => s"w${rnd.nextInt(50)}").distinct)
    }
    // parquet round-trip, NOT a LocalRelation: the optimizer folds
    // Project-over-LocalRelation with an interpreted projection before
    // planning, so the codegen branch of this loop would never reach
    // doGenCode (review catch — the equivalence was vacuous for the
    // generated-Java path)
    val dir = java.nio.file.Files.createTempDirectory("mhsig").toString
    rows.toDF("id", "toks").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    for ((wscg, factory) <- Seq(("true", "CODEGEN_ONLY"), ("false", "NO_CODEGEN"))) {
      spark.conf.set("spark.sql.codegen.wholeStage", wscg)
      spark.conf.set("spark.sql.codegen.factoryMode", factory)
      try {
        val q = df.select($"id", functions.MinHashSig.sig($"toks").as("sig"))
        // non-vacuousness: the codegen branch must actually plan
        // whole-stage generated code over the scan (structural check —
        // the plan STRING renders WSCG as the `*(n)` prefix only)
        if (wscg == "true") {
          import org.apache.spark.sql.execution.WholeStageCodegenExec
          assert(q.queryExecution.executedPlan.collect {
            case w: WholeStageCodegenExec => w }.nonEmpty,
            "codegen branch did not plan WholeStageCodegen — equivalence would be vacuous")
        }
        val got = q.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        rows.foreach { case (i, toks) =>
          assert(got(i) == signature(toks.toSet), s"id=$i codegen=$factory")
        }
      } finally {
        spark.conf.unset("spark.sql.codegen.wholeStage")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    // and the Aggregator (token-at-a-time arrival) agrees
    val viaAgg = df.select($"id", explode($"toks").as("t"))
      .groupBy("id").agg(udaf(MinHash.agg).apply($"t").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (i, toks) => assert(viaAgg(i) == signature(toks.toSet)) }
  }

  test("null-text rows are excluded, not collapsed into one dup group") {
    // xxhash64 maps a NULL input to its seed, so without the entry
    // filter both null docs would share one set-collapse group and be
    // reported as exact duplicates (review catch)
    val df = Seq((1L, None), (2L, None), (3L, Some("a b c")), (4L, Some("a b c")))
      .toDF("id", "txt")
    val got = Graft.nearDupPairsMinhash(df, $"id", $"txt").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((3L, 4L)))
  }

  test("disjoint token sets agree on ~no positions") {
    val a = signature((1 to 20).map("x" + _).toSet)
    val b = signature((1 to 20).map("y" + _).toSet)
    val agree = a.zip(b).count { case (x, y) => x == y }
    assert(agree <= 3, s"disjoint sets agreed on $agree/64 positions")
  }

  test("signature agreement estimates exact Jaccard (property, 60 random set pairs)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 60) {
      val universe = (1 to 40).map("t" + _)
      val a = universe.filter(_ => rnd.nextDouble() < 0.5).toSet + "t1"
      val b = universe.filter(_ => rnd.nextDouble() < 0.5).toSet + "t1"
      val exact = a.intersect(b).size.toDouble / a.union(b).size
      val est = signature(a).zip(signature(b)).count { case (x, y) => x == y } / 64.0
      assert(math.abs(est - exact) < 0.25, s"est $est vs exact $exact")
    }
  }

  test("native graft_match_count equals interpreted position-match count") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 4L)),  // 3 matches
      (Seq(1L, 2L), Seq(1L, 2L, 3L)),              // min-length: 2
      (Seq.empty[Long], Seq(1L))                   // 0
    ).toDF("a", "b")
    val hof = aggregate(zip_with($"a", $"b", (x, y) => when(x === y, 1).otherwise(0)),
                        lit(0), (acc, v) => acc + v)
    val got = df.select(graft.functions.ArrayMatchCount.matchCount($"a", $"b").as("n"),
                        hof.as("h")).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(3, 2, 0))
    assert(got.forall(r => r.getInt(0) == r.getInt(1)))
  }

  test("Aggregator partial-merge == single-pass (distribution safety)") {
    val toks = Vector("a", "b", "c", "d", "e", "f")
    val single = toks.foldLeft(MinHash.agg.zero)(MinHash.agg.reduce)
    val left = toks.take(3).foldLeft(MinHash.agg.zero)(MinHash.agg.reduce)
    val right = toks.drop(3).foldLeft(MinHash.agg.zero)(MinHash.agg.reduce)
    assert(MinHash.agg.merge(left, right).toSeq == single.toSeq)
  }

  test("q_dedup_minhash finds the exact-dup pair, not the disjoint one") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("mh").toString
    Seq(
      (1L, "the quick fox jumps over the lazy dog today", "en"),
      (2L, "today dog lazy the over jumps fox quick the", "en"), // same token set as 1
      (3L, "alpha beta gamma delta epsilon zeta eta theta", "de") // disjoint
    ).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s")).withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = TextOps.q_dedup_minhash(spark, dir).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getAs[Double]("est_jaccard") == 1.0)
  }

  test("incremental probe == self-join restricted to cross pairs (cap off)") {
    // the round-12 ingest story: a batch probed against a standing
    // corpus must see exactly the CROSS pairs the monolithic self-join
    // sees — same signatures, same band keys, same integer threshold;
    // only the bipartite execution shape differs
    val docs = Tables.documents(spark, sf)
    val batch = docs.filter($"doc_id" % 10 === 0)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val inc = rows(Graft.nearDupPairsMinhashAgainst(
        batch, $"doc_id", $"text", corpus, $"doc_id", $"text", estPermille = 900)
      .orderBy("batch_id", "corpus_id"))
    val cross = rows(Graft.nearDupPairsMinhash(docs, $"doc_id", $"text",
        estPermille = 900)
      .filter(($"doc_a" % 10 === 0) =!= ($"doc_b" % 10 === 0))
      .select(when($"doc_a" % 10 === 0, $"doc_a").otherwise($"doc_b").as("batch_id"),
              when($"doc_a" % 10 === 0, $"doc_b").otherwise($"doc_a").as("corpus_id"),
              $"est_jaccard")
      .orderBy("batch_id", "corpus_id"))
    assert(inc.nonEmpty, "vacuous: no cross near-dup pairs at sf0.001")
    assert(inc == cross)
  }

  test("LSH band-join candidates vs exact Jaccard >= 0.9 on sf0.001 (recall)") {
    // every pair the pipeline emits must estimate >= 0.9; spot-check the
    // estimate against exact Jaccard for the top pairs
    val out = TextOps.q_dedup_minhash(spark, sf).limit(20).collect()
    val texts = Tables.documents(spark, sf)
      .select($"doc_id", array_distinct(split($"text", " ")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    out.foreach { r =>
      val (a, b, est) = (r.getLong(0), r.getLong(1), r.getAs[Double]("est_jaccard"))
      val exact = texts(a).intersect(texts(b)).size.toDouble / texts(a).union(texts(b)).size
      assert(est >= 0.9)
      assert(math.abs(est - exact) < 0.25, s"pair ($a,$b) est $est exact $exact")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (SentencePiece-style, round 14): the
  * forward–backward E-step kernel against exhaustive segmentation
  * enumeration, Viterbi optimality, EM monotonicity on the real
  * corpus, coverage, determinism, and the encode round-trip — the
  * property net that stands in for the SQL oracle on the two
  * float-iterative query ids (q_unigram_lm, q_unigram_encode; the
  * seed table q_unigram_seed carries the family's DuckDB oracle). */
class UnigramLmSpec extends SparkSpecBase {
  import spark.implicits._

  private val NEG = Double.NegativeInfinity

  /** All segmentations of `w` into pieces of length <= maxLen drawn
    * from `logp` — the brute-force reference for the lattice kernel. */
  private def allSegs(w: String, logp: Map[String, Double],
                      maxLen: Int): Seq[Seq[String]] = {
    val cps = Graft.unigramCodePoints(w)
    def rec(i: Int): Seq[Seq[String]] =
      if (i == cps.length) Seq(Nil)
      else (1 to math.min(maxLen, cps.length - i)).flatMap { l =>
        val p = cps.slice(i, i + l).mkString
        if (logp.contains(p)) rec(i + l).map(p +: _) else Nil
      }
    rec(0)
  }

  private def segLogProb(seg: Seq[String], logp: Map[String, Double]): Double =
    seg.map(logp).sum

  test("forward-backward Z and expected counts equal exhaustive enumeration") {
    val logp = Map("a" -> math.log(0.3), "b" -> math.log(0.2),
                   "ab" -> math.log(0.25), "ba" -> math.log(0.15),
                   "abab" -> math.log(0.1))
    for (w <- Seq("a", "ab", "aba", "abab", "ababab", "bbbb")) {
      val segs = allSegs(w, logp, 4)
      val z = segs.map(s => math.exp(segLogProb(s, logp))).sum
      val (counts, logZ) = Graft.unigramForwardBackward(w, logp, 4)
      assert(math.abs(math.exp(logZ) - z) <= 1e-12 * math.max(z, 1e-300),
        s"Z mismatch on '$w': ${math.exp(logZ)} vs $z")
      // expected count of piece p = sum over segs of P(seg)/Z * (#p in seg)
      val expected = segs.flatMap(s => s.map(p => p -> math.exp(segLogProb(s, logp)) / z))
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      assert(counts.keySet == expected.keySet, s"piece sets differ on '$w'")
      expected.foreach { case (p, c) =>
        assert(math.abs(counts(p) - c) <= 1e-10,
          s"count mismatch on '$w'/$p: ${counts(p)} vs $c")
      }
    }
  }

  test("forward-backward returns -inf Z and no counts for unsegmentable words") {
    val logp = Map("a" -> math.log(0.5), "ab" -> math.log(0.5))
    val (counts, z) = Graft.unigramForwardBackward("abc", logp, 4)
    assert(z == NEG && counts.isEmpty)
  }

  test("viterbi achieves the exhaustive-enumeration optimum and reconstructs the word") {
    val logp = Map("a" -> math.log(0.31), "b" -> math.log(0.17),
                   "ab" -> math.log(0.23), "ba" -> math.log(0.19),
                   "bab" -> math.log(0.1))
    for (w <- Seq("a", "ab", "abab", "babab", "aabb", "bbb")) {
      val segs = allSegs(w, logp, 4)
      val viterbi = Graft.unigramViterbi(w, logp, 4)
      if (segs.isEmpty) assert(viterbi.isEmpty, s"'$w' should be unsegmentable")
      else {
        val seg = viterbi.get
        assert(seg.mkString == w, s"round-trip failed on '$w': $seg")
        val best = segs.map(s => segLogProb(s, logp)).max
        assert(math.abs(segLogProb(seg, logp) - best) <= 1e-12,
          s"suboptimal on '$w': $seg")
        // tie-break contract: among optimal-score segs, fewest tokens
        val bestNTok = segs.filter(s => math.abs(segLogProb(s, logp) - best) <= 1e-12)
          .map(_.length).min
        assert(seg.length == bestNTok, s"not fewest-token optimal on '$w': $seg")
      }
    }
  }

  test("viterbi of the empty word is the empty segmentation") {
    assert(Graft.unigramViterbi("", Map("a" -> 0.0), 4).contains(Nil))
  }

  test("EM log-likelihood is non-decreasing across rounds on the real corpus") {
    val m = Graft.unigramLmTrain(spark.read.parquet(s"$sf/documents.parquet"),
      col("text"), maxPieceLen = 4, seedSize = 128, targetVocab = 48, emIters = 2)
    val lls = m.logLikelihoods
    assert(lls.size == 4, s"expected 4 EM rounds, got ${lls.size}")
    // rounds 1->2 share a vocabulary, as do 3->4 (the prune between 2
    // and 3 removes pieces, so likelihood may legitimately drop there);
    // EM guarantees monotone non-decrease within a fixed vocabulary,
    // up to the 2^-24 fixed-point quantization of the masses
    val tol = lls.map(_.abs).max * BigDecimal(1e-9) + BigDecimal(1)
    assert(lls(1) >= lls(0) - tol, s"EM round 2 decreased: ${lls(0)} -> ${lls(1)}")
    assert(lls(3) >= lls(2) - tol, s"EM round 4 decreased: ${lls(2)} -> ${lls(3)}")
  }

  test("training is deterministic and the model is a probability distribution") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val m1 = Graft.unigramLmTrain(docs, col("text"), 4, 128, 48, 2)
    val m2 = Graft.unigramLmTrain(docs, col("text"), 4, 128, 48, 2)
    assert(m1.pieces == m2.pieces, "two identical trains diverged")
    val total = m1.pieces.map(_._2).sum
    assert(math.abs(total - 1.0) <= 1e-9, s"probs sum to $total")
    assert(m1.pieces.forall(_._2 > 0))
    // pruned: at most targetVocab multi-char + alphabet singles
    val multis = m1.pieces.count(p => Graft.unigramCodePoints(p._1).length > 1)
    assert(multis <= 48, s"prune left $multis multi-char pieces")
  }

  test("every corpus word is segmentable under the trained model (coverage)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val m = Graft.unigramLmTrain(docs, col("text"), 4, 128, 48, 2)
    val logp = m.pieces.map { case (p, pr) => p -> math.log(pr) }.toMap
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().as[String].collect()
    words.foreach { w =>
      val seg = Graft.unigramViterbi(w, logp, m.maxPieceLen)
      assert(seg.isDefined, s"word '$w' unsegmentable")
      assert(seg.get.mkString == w, s"round-trip failed on '$w'")
    }
  }

  test("unigramEncode column equals driver-side viterbi, and token counts add up") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val m = Graft.unigramLmTrain(docs, col("text"), 4, 128, 48, 2)
    val logp = m.pieces.map { case (p, pr) => p -> math.log(pr) }.toMap
    val got = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .select(col("w"), Graft.unigramEncode(col("w"), m).as("enc"),
              Graft.bpeTokenCount(Graft.unigramEncode(col("w"), m)).as("nt"))
      .collect()
    got.foreach { r =>
      val w = r.getString(0)
      val seg = Graft.unigramViterbi(w, logp, m.maxPieceLen).get
      assert(r.getString(1) == seg.mkString("(", ")(", ")"), s"encode mismatch on '$w'")
      assert(r.getLong(2) == seg.length, s"token count mismatch on '$w'")
    }
  }

  test("q_unigram_seed matches a local brute-force substring mass count") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).as[String].collect()
    val mass = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { w =>
      val cps = Graft.unigramCodePoints(w)
      for (l <- 1 to math.min(4, cps.length); i <- 0 to cps.length - l) {
        val p = cps.slice(i, i + l).mkString
        mass.update(p, mass.getOrElse(p, 0L) + 1)
      }
    }
    val expect = mass.toSeq.sortBy { case (p, m) => (-m, p) }.take(30)
    val got = queries.PipelineOps.q_unigram_seed(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("query surfaces return stable non-empty results") {
    val lm = queries.PipelineOps.q_unigram_lm(spark, sf).collect()
    assert(lm.nonEmpty && lm.head.getLong(0) == 1L)
    assert(lm.map(_.getLong(2)).toSeq == lm.map(_.getLong(2)).toSeq.sorted.reverse
      || lm.map(_.getString(1)).distinct.length == lm.length)
    val enc = queries.PipelineOps.q_unigram_encode(spark, sf).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      // unigram tokens never exceed the character-symbol baseline and
      // never undercut chars/maxPieceLen
      val chars = r.getLong(2); val toks = r.getLong(3)
      assert(toks <= chars && toks * 4 >= chars,
        s"token count $toks outside [chars/4, chars] for chars=$chars")
    }
  }
}

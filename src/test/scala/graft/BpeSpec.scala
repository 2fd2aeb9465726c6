package graft

import org.apache.spark.sql.functions._

/** BPE learn + encode (round 12, SURVEY §2.12): the driver-side merge
  * learner against hand-derived expectations, the row-local replace
  * chain against the learner's own segmentation semantics
  * (leftmost-greedy non-overlapping — the property the '(sym)'
  * wrapping exists to preserve under SQL `replace`), and the loud
  * paren gate. */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  private def enc(word: String, merges: Seq[(String, String)]): String =
    spark.range(1).select(Graft.bpeEncode(lit(word), merges).as("s"))
      .head().getString(0)

  private def tokCount(word: String, merges: Seq[(String, String)]): Long =
    spark.range(1)
      .select(Graft.bpeTokenCount(Graft.bpeEncode(lit(word), merges)).as("n"))
      .head().getLong(0)

  test("learner reproduces the hand-derived merge sequence") {
    // words: low×2, lower, lowest. Pair masses: (l,o)=4, (o,w)=4,
    // (w,e)=2, (e,r)=1, (e,s)=1, (s,t)=1. Ties break on the wrapped
    // pattern: "(l)(o)" < "(o)(w)" → (l,o) first; then (lo,w)=4,
    // (low,e)=2, then among the count-1 pairs "(lowe)(r)" sorts first.
    val docs = Seq("low low lower", "lowest").toDF("text")
    val merges = Graft.bpeLearnMerges(docs, col("text"), nMerges = 4, vocabLimit = 100)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r")))
    assert(enc("lowest", merges) == "(lowe)(s)(t)")
    assert(enc("lower", merges) == "(lower)")
    assert(tokCount("lowest", merges) == 3L)
    assert(tokCount("lower", merges) == 1L)
    // unseen word: merges still apply where they match
    assert(enc("slow", merges) == "(s)(low)")
  }

  test("leftmost-greedy non-overlapping: back-to-back and odd-run merges") {
    val docs = Seq("aaaa").toDF("text")
    val merges = Graft.bpeLearnMerges(docs, col("text"), nMerges = 4, vocabLimit = 10)
    // (a,a) mass 3 → merge; then [aa, aa] has (aa,aa) mass 1 → merge;
    // then [aaaa] has no pair → learner stops early at 2 merges
    assert(merges == Seq(("a", "a"), ("aa", "aa")))
    // odd run: greedy pairs the FIRST two, strands the third — the
    // '(sym)' wrapping keeps SQL replace from re-matching across the
    // consumed boundary
    assert(enc("aaa", merges) == "(aa)(a)")
    // back-to-back matches share no characters and BOTH merge
    assert(enc("aaaa", merges) == "(aaaa)")
    assert(enc("aaaaaa", merges) == "(aaaa)(aa)")
  }

  test("encode is lossless: stripping delimiters reconstructs the word") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = Graft.bpeLearnMerges(docs, col("text"), nMerges = 8, vocabLimit = 4096)
    assert(merges.size == 8)
    val bad = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("w"), Graft.bpeEncode(col("w"), merges).as("s"))
      .filter(translate(col("s"), "()", "") =!= col("w"))
      .count()
    assert(bad == 0L, s"$bad words fail to reconstruct from their encoding")
  }

  test("token counts: bounded by symbol count, and merges strictly save on this corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = Graft.bpeLearnMerges(docs, col("text"), nMerges = 8, vocabLimit = 4096)
    val agg = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(length(col("w")).cast("long").as("nc"),
              Graft.bpeTokenCount(Graft.bpeEncode(col("w"), merges)).as("nt"))
      .agg(sum("nc").as("nc"), sum("nt").as("nt"),
           max(col("nt") - col("nc")).as("worst"))
      .head()
    assert(agg.getAs[Long]("worst") <= 0L, "a word gained tokens under BPE")
    assert(agg.getAs[Long]("nt") < agg.getAs[Long]("nc"),
      "8 merges saved nothing on the corpus")
  }

  test("words containing parentheses are rejected loudly") {
    val docs = Seq("ok ok br(oken").toDF("text")
    val e = intercept[IllegalArgumentException] {
      Graft.bpeLearnMerges(docs, col("text"), nMerges = 2, vocabLimit = 10)
    }
    assert(e.getMessage.contains("wrapped-symbol"))
  }

  test("encode of a paren-bearing word fails loudly AT THE ROW") {
    // the learner's gate only sees the top-vocabLimit words, so the
    // encoder must enforce the contract for every row it touches
    // (round-12 review: a rare 'f(x' below the cut previously
    // corrupted the delimiter count silently)
    val e = intercept[Exception] {
      spark.range(1)
        .select(Graft.bpeEncode(lit("f(x"), Seq(("a", "b"))).as("s"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("corrupt")), msgs(e).mkString(" | "))
  }

  test("q_bpe_vocab: rows ARE the learner's merge list, in training order") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = Graft.bpeLearnMerges(docs, col("text"), nMerges = 12, vocabLimit = 4096)
    val out = graft.queries.PipelineOps.q_bpe_vocab(spark, sf).collect()
    assert(out.length == merges.length)
    out.zip(merges).zipWithIndex.foreach { case ((r, (a, b)), i) =>
      assert(r.getLong(0) == i + 1L)
      assert(r.getString(1) == a && r.getString(2) == b && r.getString(3) == a + b)
    }
  }

  /** Independent NAIVE reference for the merge loop — recount every
    * adjacent pair from scratch each iteration, argmax by (count DESC,
    * wrapped-pattern ASC byte order): the O(nMerges · Σ|word|) loop
    * the incremental learner replaced, kept here as the equivalence
    * oracle so the incremental bookkeeping can never drift from the
    * stated semantics. */
  private def naiveMerges(words: Seq[(String, Long)],
                          nMerges: Int): Seq[(String, String)] = {
    val patOrd: Ordering[String] = (x: String, y: String) =>
      java.util.Arrays.compareUnsigned(
        x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var vocab = words.map { case (w, f) =>
      (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), f)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var dry = false
    while (merges.length < nMerges && !dry) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        for (i <- 0 until syms.length - 1)
          counts.update((syms(i), syms(i + 1)),
            counts.getOrElse((syms(i), syms(i + 1)), 0L) + f)
      }
      if (counts.isEmpty) dry = true
      else {
        val (a, b) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, s"($x)($y)") }(
            Ordering.Tuple2(Ordering.Long, patOrd))._1
        merges += ((a, b))
        vocab = vocab.map { case (syms, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, f)
        }
      }
    }
    merges.toSeq
  }

  test("incremental learner matches the naive recount reference exactly") {
    val rnd = new scala.util.Random(20260815)
    for (trial <- 1 to 10) {
      // alternate a 2-letter alphabet (maximally tie- and
      // overlap-heavy: runs like "ababab", count-tied pairs every
      // round) with a broader one (deeper merge chains)
      val alpha = if (trial % 2 == 0) "ab" else "abcde"
      val n = 30 + rnd.nextInt(60)
      val words = (1 to n).map { _ =>
        val len = 1 + rnd.nextInt(10)
        (Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString,
         1L + rnd.nextInt(9))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }
        .toIndexedSeq.sortBy(_._1)
      // past-exhaustion nMerges also pins identical dry-out behavior
      val nm = 1 + rnd.nextInt(400)
      val inc = Graft.bpeLearnMergesFromVocab(words, nm)
      val ref = naiveMerges(words, nm)
      assert(inc == ref, s"trial $trial (nMerges=$nm, ${words.size} words)")
    }
  }

  test("driver bound holds at tokenizer scale: 32k merges over a 32k-type vocabulary") {
    // the model-scale claim, MEASURED (round-12 verdict #7): a
    // realistic trainer configuration — 32,768 word types, Zipf-ish
    // frequencies, 32,768 requested merges — must complete on the
    // driver in seconds, which only the incremental loop does (the
    // naive recount loop is O(nMerges · Σ|word|) ≈ 10¹⁰ symbol visits
    // here). The bound asserted is deliberately loose for CI jitter;
    // the printed figure is the measured claim.
    val rnd = new scala.util.Random(42)
    val words = (0 until 32768).map { r =>
      val len = 4 + rnd.nextInt(13)
      val w = Seq.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString + r.toString
      (w, 1L + 1000000L / (r + 1))
    }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toIndexedSeq
    val t0 = System.nanoTime()
    val merges = Graft.bpeLearnMergesFromVocab(words, nMerges = 32768)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"32k merges / ${words.size} types: ${merges.length} merges in $secs%.2f s")
    assert(merges.length > 8192, s"dried out implausibly early: ${merges.length}")
    assert(secs < 60.0, f"driver merge loop took $secs%.1f s at tokenizer scale")
    // spot-check the argmax semantics survived the scale path: the
    // first merge must be the true global pair argmax
    assert(merges.head == naiveMerges(words, 1).head)
  }

  test("bpeEncodeIndexed == bpeEncode on the corpus under the learned table") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = Graft.bpeLearnMerges(docs, col("text"), nMerges = 12, vocabLimit = 4096)
    val bad = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("w"),
              Graft.bpeEncode(col("w"), merges).as("chain"),
              Graft.bpeEncodeIndexed(col("w"), merges).as("indexed"))
      .filter(col("chain") =!= col("indexed"))
      .count()
    assert(bad == 0L, s"$bad words diverge between the chain and indexed encoders")
  }

  test("indexed encoder drives a 32k-merge model the replace chain cannot plan") {
    // the encode-side scale claim, measured like the learner's: a
    // 32k-merge table is ONE broadcast rank index and one UDF call
    // per row (the replace chain would be a 32k-deep expression tree)
    // 2048 word types × Σ(|w|−1) ≈ 23k total merge capacity < the 32k
    // request, so the learner provably DRIES OUT — and a dry learner
    // leaves no adjacent pair anywhere, so every trained word must
    // encode to exactly ONE token (asserted below: the strongest
    // end-to-end signal that the indexed encoder reproduces the
    // learner's segmentation at scale)
    val rnd = new scala.util.Random(7)
    val words = (0 until 2048).map { r =>
      val len = 4 + rnd.nextInt(13)
      (Seq.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString + r.toString,
       1L + 100000L / (r + 1))
    }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toIndexedSeq
    val merges = Graft.bpeLearnMergesFromVocab(words, nMerges = 32768)
    assert(merges.length > 4096 && merges.length < 32768,
      s"expected a dried-out model in (4096, 32768) merges: ${merges.length}")
    val t0 = System.nanoTime()
    val out = words.map(_._1).toDF("w")
      .select(col("w"), Graft.bpeEncodeIndexed(col("w"), merges).as("s"))
      .select(col("w"), col("s"),
              translate(col("s"), "()", "").as("flat"),
              Graft.bpeTokenCount(col("s")).as("nt"))
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"indexed encode of ${out.length} words under ${merges.length} merges: $secs%.2f s")
    out.foreach { r =>
      assert(r.getString(2) == r.getString(0), s"lossless reconstruction failed: $r")
      assert(r.getLong(3) >= 1 && r.getLong(3) <= r.getString(0).length)
    }
    val collapsed = out.count(_.getLong(3) == 1)
    assert(collapsed == out.length,
      s"only $collapsed of ${out.length} trained words collapse to one token")
    assert(secs < 60.0, f"indexed encode took $secs%.1f s")
  }

  test("indexed encoder rejects paren-bearing words loudly at the row") {
    val e = intercept[Exception] {
      spark.range(1)
        .select(Graft.bpeEncodeIndexed(lit("f(x"), Seq(("a", "b"))).as("s"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("corrupt")), msgs(e).mkString(" | "))
  }

  test("q_bpe_encode: integer contract and per-source shape at sf0.001") {
    val out = graft.queries.PipelineOps.q_bpe_encode(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val words = r.getAs[Long]("n_words")
      val syms = r.getAs[Long]("n_char_syms")
      val toks = r.getAs[Long]("n_bpe_tokens")
      val saved = r.getAs[Long]("saved_permille")
      assert(words > 0 && toks >= words && toks <= syms)
      assert(saved == (syms - toks) * 1000 / syms)
    }
  }
}

package graft

import graft.queries.{HashOps, PipelineOps, TextOps}
import org.apache.spark.sql.functions._

/** §2.12 pipeline-extension tests: SimHash, winnowing, IVF, n-gram
  * Jaccard, quality/token/lang-id on micro-fixtures + sf0.001. */
class PipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkDocs(rows: Seq[(Long, String, String)], dir: String): String = {
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s")).withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("simhash: identical docs at hamming 0; disjoint docs not paired") {
    val dir = mkDocs(Seq(
      (1L, "the quick fox jumps over the lazy dog today fine", "en"),
      (2L, "the quick fox jumps over the lazy dog today fine", "en"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "de")
    ), java.nio.file.Files.createTempDirectory("sh").toString)
    val pairs = HashOps.q_dedup_simhash(spark, dir).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getAs[Int]("hamming") == 0)
  }

  test("simhash signature: deterministic, near-dup flips few bits (property)") {
    val rnd = new scala.util.Random(11)
    val vocab = (1 to 30).map("w" + _)
    for (_ <- 1 to 25) {
      val doc = Seq.fill(40)(vocab(rnd.nextInt(vocab.size)))
      def sig(tokens: Seq[String]): Long = {
        val tf = tokens.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        SimHash.agg.finish(tf.foldLeft(SimHash.agg.zero)(SimHash.agg.reduce))
      }
      assert(sig(doc) == sig(rnd.shuffle(doc))) // order-independent
      val mutated = doc.updated(0, "zzz")
      assert(SimHash.hamming(sig(doc), sig(mutated)) <= 24) // small edit, far below ~32 for random
    }
  }

  test("winnowing: identical docs share fingerprints; count <= shingles") {
    val textA = "the quick fox jumps over the lazy dog today fine and well"
    val dir = mkDocs(Seq((1L, textA, "en"), (2L, textA, "en"),
      (3L, "one two three four five six seven eight nine ten", "en")
    ), java.nio.file.Files.createTempDirectory("wf").toString)
    val out = HashOps.q_doc_fingerprint(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    assert(out(1L) == out(2L)) // same text -> identical fingerprint stats
    out.values.foreach { case (nSh, nFp, _) => assert(nFp <= nSh && nFp > 0) }
  }

  test("ngram jaccard: identical docs 1.0; shifted doc scores high not 1") {
    val dir = mkDocs(Seq(
      (1L, "a b c d e f g h", "en"),
      (2L, "a b c d e f g h", "en"),  // identical: J = 1.0
      (3L, "a b c d e f g x", "en"),  // shares 5 of 6 grams with 1
      (4L, "p q r s t u v w", "en")   // disjoint
    ), java.nio.file.Files.createTempDirectory("ng").toString)
    val got = PipelineOps.q_dedup_ngram(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 2L)) == 1.0)
    // (1,3): common 5 grams, union 7 -> 0.714 < 0.8 threshold -> absent
    assert(!got.contains((1L, 3L)) && !got.contains((1L, 4L)))
  }

  test("text quality: exact integer arithmetic on a crafted doc") {
    // "the aa bbb the" -> 4 tokens, 14 chars, 2 stopwords ('the' x2)
    val dir = mkDocs(Seq((1L, "the aa bbb the", "en")),
      java.nio.file.Files.createTempDirectory("tq").toString)
    val r = PipelineOps.q_text_quality(spark, dir).collect().head
    assert(r.getInt(1) == 4)                 // n_tokens
    assert(r.getLong(2) == (14 - 3) * 100 / 4) // avg_len_centi = 275
    assert(r.getLong(3) == 2000 / 4)         // stop_permille = 500
    assert(r.getLong(4) == 4L * 2 * 1000 / (50 * 4)) // quality = 40
  }

  test("regex funcs: extract/replace/match on a crafted segment") {
    val dir = mkDocs(Seq.empty, java.nio.file.Files.createTempDirectory("rx").toString)
    Seq((7L, "Customer#000000942", "SEG"), (8L, "Customer#000000005", "SEG"))
      .toDF("c_custkey", "c_name", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = queries.Relational.q_regex_funcs(spark, dir).collect()
    assert(out.length == 1)
    val row = out.head
    assert(row.getAs[Long]("n_end9") == 1L)      // only ...942 matches 9\d\d$
    assert(row.getAs[Long]("sum_ids") == 947L)   // 942 + 5
    assert(row.getAs[String]("vowelless") == "s_g")
  }

  test("pipeline_e2e: kept docs never exceed dedup survivors per lang") {
    val e2e = PipelineOps.q_pipeline_e2e(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val survivors = TextOps.q_dedup_exact(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(e2e.nonEmpty)
    e2e.foreach { case (lang, kept) =>
      assert(kept <= survivors(lang), s"$lang: kept $kept > survivors ${survivors(lang)}")
    }
  }

  test("sim_srp: candidate scores exact; subset of valid ids; sorted") {
    val srp = HashOps.q_sim_srp(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(srp.nonEmpty && !srp.contains(0L))
    val brute = HashOps.q_dedup_embed(spark, sf) // independent exact pairs path
    val bruteTop = TextOps.q_sim_search(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every SRP-returned vector that brute-force also ranked must have
    // the identical exact score (rerank correctness)
    srp.keySet.intersect(bruteTop.keySet).foreach { k =>
      assert(srp(k) == bruteTop(k), s"vec $k: ${srp(k)} vs ${bruteTop(k)}")
    }
  }

  test("asof join: gap is non-negative or -1; errors only") {
    val out = queries.Events.q_asof_join(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val gap = r.getLong(2)
      assert(gap >= 0 || gap == -1L, s"bad gap $gap")
    }
    val nErrors = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "error").count()
    assert(out.length == nErrors)
  }

  test("lang_id: confusion matrix rows sum to per-lang doc counts") {
    val conf = PipelineOps.q_lang_id(spark, sf).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val docs = Tables.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(conf == docs)
  }

  test("token_count: regex==whitespace on this corpus; subword=sum ceil(len/2)") {
    val out = PipelineOps.q_token_count(spark, sf).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("ws_tokens") == r.getAs[Long]("re_tokens"))
    }
    val expect = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("t"))
      .select((floor((length($"t") + 1) / 2.0)).cast("long").as("sw"))
      .agg(sum("sw")).collect().head.getLong(0)
    assert(out.map(_.getAs[Long]("subword_tokens")).sum == expect)
  }

  test("dedup_embed: top-20 sorted desc, all scores match direct dot products") {
    val out = HashOps.q_dedup_embed(spark, sf).collect()
    assert(out.length == 20)
    val scores = out.map(_.getDouble(2)).toSeq
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val vecs = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    out.foreach { r =>
      val d = (vecs(r.getLong(0)), vecs(r.getLong(1))).zipped.map(_ * _).sum
      assert(math.abs(BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
                      - r.getDouble(2)) < 1e-9)
    }
  }

  test("repetition: exact permilles on crafted docs") {
    val dir = mkDocs(Seq(
      (1L, "a a b", "en"),     // dup_tok (3-2)*1000/3=333; g2 ["a a","a b"] distinct; g3 1 gram
      (2L, "a a a a", "en")    // dup_tok 750; g2 3x"a a" -> 666; g3 2x"a a a" -> 500
    ), java.nio.file.Files.createTempDirectory("rep").toString)
    val got = PipelineOps.q_repetition(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((333L, 0L, 0L)))
    assert(got(2L) == ((750L, 666L, 500L)))
  }

  test("mixture_sample: keep rates follow source suffix; kept recomputable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mix").toString
    val rows = (0L until 400L).map(i => (i, "w x y", "en", "src" + (i % 8), 5L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = PipelineOps.q_mixture_sample(spark, dir).collect()
    assert(out.length == 8)
    out.foreach { r =>
      val suffix = r.getString(0).stripPrefix("src").toLong
      assert(r.getLong(1) == (suffix % 4 + 1) * 50) // keep_permille
      val expected = rows.count { case (id, _, _, s, _) =>
        s == r.getString(0) && (id % 1000000007L) * 2654435761L % 1000 < (suffix % 4 + 1) * 50
      }
      assert(r.getLong(3) == expected, s"${r.getString(0)}: kept ${r.getLong(3)} != $expected")
      assert(r.getLong(4) == expected * 5L) // kept_chars: 5 chars/doc
    }
  }

  test("dedup_cluster: groups collapse to min-id reps; singletons excluded") {
    val text1 = "a b c d e f g h"
    val text2 = "p q r s t u v w"
    val dir = mkDocs(Seq(
      (1L, text1, "en"), (2L, text1, "en"), (3L, text1, "en"), // clique of 3
      (7L, text2, "en"), (8L, text2, "en"),                    // pair
      (9L, "x y z x y z x y", "en")                            // no dup partner
    ), java.nio.file.Files.createTempDirectory("cc").toString)
    val got = PipelineOps.q_dedup_cluster(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((3L, 6L)), 7L -> ((2L, 15L))))
  }

  test("dedup_rep_quality: argmax by quality beats min-id; ties fall to min-id") {
    // docs 1 and 2 differ only in the LAST token (3-gram J = 9/11 ≥
    // 0.8 → one cluster); doc 1 ends in the stopword "the" so its
    // quality is LOWER (n=12, stops=1 → 220) than doc 2's (stops=0 →
    // 240): the representative must be doc 2, which min-id would
    // never pick. Docs 7/8 are identical (tie) → min-id 7 wins.
    val stem = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    val dir = mkDocs(Seq(
      (1L, s"$stem the", "en"), (2L, s"$stem zz", "en"),
      (7L, "p1 p2 p3 p4 p5 p6 p7 p8", "en"), (8L, "p1 p2 p3 p4 p5 p6 p7 p8", "en"),
      (9L, "lone doc with no near dup partner at all", "en")
    ), java.nio.file.Files.createTempDirectory("repq").toString)
    val got = PipelineOps.q_dedup_rep_quality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 2L, 240L), (7L, 2L, 7L, 160L)))
  }

  test("dedup_rep_quality: cluster keys and sizes agree with q_dedup_cluster on sf") {
    val reps = PipelineOps.q_dedup_rep_quality(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = PipelineOps.q_dedup_cluster(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps == clusters) // same stable keys, same membership counts
  }

  test("quality_gate: matches a driver-side percentile_disc reference on sf") {
    val got = PipelineOps.q_quality_gate(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
                                    r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    def qual(text: String): Long = {
      val t = text.split(" "); val n = t.length.toLong
      val stops = t.count(x => x == "the" || x == "a").toLong
      math.min(n, 50L) * (n - stops) * 1000L / (50L * n)
    }
    val ref = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .groupBy(_.getString(0)).map { case (src, rows) =>
        val qs = rows.map(r => qual(r.getString(1))).sorted
        val n = qs.length.toLong
        def pct(p: Int): Long = qs(((n * p + 99) / 100 - 1).toInt) // ceil(n·p/100)-th
        val dropped = qs.count(_ < 500L).toLong
        src -> ((n, pct(25), pct(50), pct(90), dropped, dropped * 1000L / n))
      }
    assert(got == ref)
  }

  test("dedup_sweep: exact integer bands incl. the 0.85 boundary pair") {
    // pair (1,2): 19 + 18 grams, 17 common → jp = 17000 div 20 = 850
    // EXACTLY — the boundary a rounded-double floor(j·20) would
    // misband into 800 (0.85's nearest double is below 0.85);
    // pair (3,4): 10 + 9 grams, 8 common → jp = 8000 div 11 = 727;
    // pair (7,8): identical → jp = 1000; doc 9 pairs with nothing
    val t19 = (1 to 19).map("t" + _).mkString(" ")
    val u12 = (1 to 12).map("u" + _).mkString(" ")
    val u10 = (1 to 10).map("u" + _).mkString(" ")
    val dir = mkDocs(Seq(
      (1L, s"$t19 a20 a21", "en"), (2L, s"$t19 b20", "en"),
      (3L, u12, "en"), (4L, s"$u10 z", "en"),
      (7L, "p1 p2 p3 p4 p5 p6 p7 p8", "en"), (8L, "p1 p2 p3 p4 p5 p6 p7 p8", "en"),
      (9L, "lone doc with no near dup partner at all", "en")
    ), java.nio.file.Files.createTempDirectory("sweep").toString)
    val got = PipelineOps.q_dedup_sweep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((700L, 1L), (850L, 1L), (1000L, 1L)))
    // a low cut that is not a band multiple would truncate and
    // mislabel its lowest band — rejected loudly (review catch)
    intercept[IllegalArgumentException] {
      graft.Graft.nearDupBands(spark.read.parquet(s"$dir/documents.parquet"),
        col("doc_id"), col("text"), lowPermille = 725, bandPermille = 50)
    }
  }

  test("dedup_sweep on sf: bands at or above 800 sum to the q_dedup_ngram pair count") {
    // jp ≥ 800 ⇔ 1000·c ≥ 800·union ⇔ 5c ≥ 4·union ⇔ J ≥ 0.8 — the
    // sweep's stricter-cut rollup must reproduce the production query
    val atOrAbove = PipelineOps.q_dedup_sweep(spark, sf).collect()
      .filter(_.getLong(0) >= 800L).map(_.getLong(1)).sum
    assert(atOrAbove == PipelineOps.q_dedup_ngram(spark, sf).count())
  }

  test("gram_df_hist: crafted buckets; sf masses reconcile with a direct df pass") {
    val dir = mkDocs(Seq(
      (1L, "a b c d", "en"), (2L, "a b c d", "en"), (3L, "a b c d", "en"),
      (4L, "x y z", "en")
    ), java.nio.file.Files.createTempDirectory("dfh").toString)
    // grams "a b c"/"b c d" have df 3 → bucket 4; "x y z" df 1 → bucket 1
    val got = PipelineOps.q_gram_df_hist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 1L), (4L, 2L, 6L)))
    // sf: recompute the df histogram blind to the shared table
    val direct = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
              explode(array_distinct(graft.functions.TokenNGrams.ngrams(col("t"), 3))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("gdf"))
      .collect().map(_.getLong(1))
      .groupBy(d => if (d <= 1) 1L else java.lang.Long.highestOneBit(d - 1) * 2)
      .map { case (b, ds) => (b, ds.size.toLong, ds.sum) }
    val sfGot = PipelineOps.q_gram_df_hist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sfGot == direct.toSet)
  }

  test("jaccardPrefixAgainst == nearDupPairsNgramAgainst on the mod-2 split (prefix theorem, bipartite)") {
    // the incremental probe's two faces must agree exactly: the full
    // bipartite inverted index vs the prefix index + positional
    // filter over slices of ONE rarityGramArrays table — at a
    // NON-default threshold, so the prefix bound genuinely bites
    val docs = Tables.documents(spark, sf)
    val full = graft.Graft.nearDupPairsNgramAgainst(
        docs.filter($"doc_id" % 2 === 0), $"doc_id", $"text",
        docs.filter($"doc_id" % 2 === 1), $"doc_id", $"text",
        thresholdPermille = 700)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sorted = graft.Graft.rarityGramArrays(docs, $"doc_id", $"text", n = 3)
    val pref = graft.Graft.jaccardPrefixAgainst(
        sorted.filter($"doc_id" % 2 === 0),
        sorted.filter($"doc_id" % 2 === 1),
        thresholdPermille = 700)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pref == full)
    assert(full.nonEmpty) // non-vacuous: the split corpus has cross dups
  }

  test("contamination: half-overlap threshold on crafted eval/corpus docs") {
    val dir = mkDocs(Seq(
      (1L, "a b c d e", "en"),   // eval doc: grams {a b c, b c d, c d e}
      (11L, "a b c d x q r", "en"), // shares 2 of 3 -> 2*2 >= 3 -> contaminated
      (12L, "p q r s t u v", "en"), // disjoint
      (13L, "z z a b c z z", "en")  // shares 1 of 3 -> 2 < 3 -> clean
    ), java.nio.file.Files.createTempDirectory("cont").toString)
    val got = PipelineOps.q_contamination(spark, dir).collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == 1L)      // eval_id
    assert(got.head.getLong(1) == 1L)      // n_contaminated: doc 11 only
    assert(got.head.getLong(2) == 2L)      // max_overlap
  }

  test("ivf_build: full occupancy, deterministic, shares the model with sim_ivf") {
    val n = Tables.embeddings(spark, sf).count()
    val build = HashOps.q_ivf_build(spark, sf).collect()
    // every vector lands in exactly one cell of the trained quantizer
    assert(build.map(_.getLong(1)).sum == n)
    assert(build.length <= 10 && build.length > 0)
    // deterministic: id-hash sampling + Forgy init + Lloyd have no
    // run-dependent state (second call also exercises the model cache)
    val again = HashOps.q_ivf_build(spark, sf).collect()
    assert(build.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("sim_ivf: exact within probed cells, recall floor vs brute force") {
    val ivf = HashOps.q_sim_ivf(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ivf.size == 10)
    val brute = TextOps.q_sim_search(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // any vector IVF returns that brute force also ranked must carry the
    // exact same score (same probe, same arithmetic)
    val shared = ivf.keySet.intersect(brute.keySet)
    shared.foreach(k => assert(ivf(k) == brute(k), s"vec $k: ${ivf(k)} vs ${brute(k)}"))
    // the Lloyd-trained quantizer (cell ids are opaque hashes, never
    // the label) must recover a meaningful share of the true top-10 at
    // nprobe=3 — observed 5/10 on this data; floor set with margin for
    // float-order assignment flips
    assert(shared.size >= 3, s"IVF recall ${shared.size}/10 below floor 3/10")
  }

  test("ppl_bucket: equals native NTILE(3) per language on the corpus") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    val scored = Graft.unigramLogProb(docs, $"doc_id", $"text")
      .select($"doc_id", round($"mean_nll", 3).as("mean_nll"))
      .join(docs.select($"doc_id", $"lang"), "doc_id")
    val ref = scored.select($"doc_id",
        ntile(3).over(Window.partitionBy($"lang")
          .orderBy($"mean_nll", $"doc_id")).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = PipelineOps.q_ppl_bucket(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got == ref)
    // every (lang) has all 3 buckets when |lang| >= 3, sizes within 1
    val sizes = PipelineOps.q_ppl_bucket(spark, sf)
      .groupBy("lang", "bucket").count()
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2))).toMap
    sizes.foreach { case (lang, ns) =>
      if (ns.sum >= 3) {
        assert(ns.length == 3, s"$lang missing a tertile")
        assert(ns.max - ns.min <= 1, s"$lang tertile sizes $ns")
      }
    }
  }

  test("span_dedup: exact-duplicate docs share every span; stats consistent") {
    val out = PipelineOps.q_span_dedup(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // only docs with >= 16 tokens appear, and permille is the floor-div
    out.values.foreach { case (n, dup, pm) =>
      assert(n >= 1 && dup <= n && pm == dup * 1000 / n)
    }
    // exact duplicate docs (same text, >= 16 tokens) must have every
    // span flagged on BOTH sides; sf0.001 has no >=16-token exact dups
    // (checked), so this leg runs on a crafted fixture
    val t32 = (1 to 32).map(i => s"w$i").mkString(" ")
    val dir = mkDocs(Seq(
      (1L, t32, "en"), (2L, t32, "en"),
      (3L, (1 to 32).map(i => s"z$i").mkString(" "), "en")
    ), java.nio.file.Files.createTempDirectory("spand").toString)
    val crafted = PipelineOps.q_span_dedup(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(crafted(1L) == ((2L, 2L)) && crafted(2L) == ((2L, 2L)) &&
           crafted(3L) == ((2L, 0L)))
  }

  test("span_drop: keep-first ownership on crafted duplicates") {
    val t32 = (1 to 32).map(i => s"w$i").mkString(" ")
    val dir = mkDocs(Seq(
      (1L, t32, "en"), (2L, t32, "en"),
      (3L, (1 to 35).map(i => s"z$i").mkString(" "), "en")
    ), java.nio.file.Files.createTempDirectory("spandrop").toString)
    val got = PipelineOps.q_span_drop(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1 owns both duplicated spans (lowest doc_id); doc 2 loses
    // everything; doc 3 is untouched and keeps its 3-token tail
    assert(got(1L) == ((2L, 2L, 32L)), s"${got(1L)}")
    assert(got(2L) == ((2L, 0L, 0L)), s"${got(2L)}")
    assert(got(3L) == ((2L, 2L, 35L)), s"${got(3L)}")
  }

  test("span_drop + span_dedup agree on the corpus span universe") {
    val drop = PipelineOps.q_span_drop(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dedup = PipelineOps.q_span_dedup(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(drop.keySet == dedup.keySet)
    drop.foreach { case (id, (n, kept)) =>
      val (n2, dup) = dedup(id)
      assert(n == n2, s"doc $id span count drifted")
      // a doc keeps at least its non-duplicated spans, and dropping
      // only ever removes duplicated ones
      assert(kept >= n - dup && kept <= n, s"doc $id kept=$kept n=$n dup=$dup")
    }
  }

  test("dedup_matrix: cell sum equals the q_dedup_ngram pair count") {
    val cells = PipelineOps.q_dedup_matrix(spark, sf).collect()
    val total = cells.map(_.getLong(2)).sum
    val pairs = PipelineOps.q_dedup_ngram(spark, sf).count()
    assert(total == pairs, s"matrix total $total != pair count $pairs")
    assert(cells.forall(r => r.getString(0) <= r.getString(1)),
      "matrix cells not in canonical (least, greatest) source order")
  }

  test("dedup_funnel: one row consistent with its component queries") {
    val f = PipelineOps.q_dedup_funnel(spark, sf).collect().head
    val nDocs = Tables.documents(spark, sf).count()
    val exactUnique = TextOps.q_dedup_exact(spark, sf)
      .agg(sum("n_unique")).collect().head.getLong(0)
    val clusters = PipelineOps.q_dedup_cluster(spark, sf).collect()
    val survivors = PipelineOps.q_dedup_drop(spark, sf)
      .agg(sum("n_kept")).collect().head.getLong(0)
    assert(f.getLong(0) == nDocs)
    assert(f.getLong(1) == exactUnique &&
           f.getLong(2) == nDocs - exactUnique)
    assert(f.getLong(3) == clusters.length)
    assert(f.getLong(4) == clusters.map(_.getLong(1)).sum)
    assert(f.getLong(6) == survivors && f.getLong(5) == nDocs - survivors)
  }

  test("dedup_funnel: dedup-CLEAN corpus reports 0 dropped, not NULL") {
    // no shared 3-grams at all -> empty pair graph -> the sum() over
    // zero CC rows must coalesce to 0 (and survivors to n_docs)
    val dir = mkDocs(Seq(
      (1L, "a1 a2 a3 a4 a5", "en"),
      (2L, "b1 b2 b3 b4 b5", "en"),
      (3L, "c1 c2 c3 c4 c5", "en")
    ), java.nio.file.Files.createTempDirectory("cleanfunnel").toString)
    val f = PipelineOps.q_dedup_funnel(spark, dir).collect().head
    assert(!f.isNullAt(5) && !f.isNullAt(6), s"NULL funnel row: $f")
    assert(f.getLong(0) == 3 && f.getLong(1) == 3 && f.getLong(2) == 0 &&
           f.getLong(3) == 0 && f.getLong(4) == 0 && f.getLong(5) == 0 &&
           f.getLong(6) == 3, f.toString)
  }

  test("embed_stats: per-dim profile equals a driver-side reference") {
    val got = HashOps.q_embed_stats(spark, sf).collect()
    val vecs = Tables.embeddings(spark, sf)
      .select($"embedding".cast("array<double>"))
      .collect().map(_.getSeq[Double](0))
    assert(got.length == 64 && vecs.nonEmpty)
    got.foreach { r =>
      val dim = r.getInt(0); val col = vecs.map(_(dim - 1))
      val mean = col.sum / col.length
      val varP = col.map(x => (x - mean) * (x - mean)).sum / col.length
      assert(r.getLong(1) == vecs.length)
      assert(math.abs(r.getDouble(2) - mean) < 5e-4, s"dim $dim mean")
      assert(math.abs(r.getDouble(3) - math.sqrt(varP)) < 5e-4, s"dim $dim std")
      assert(r.getDouble(4) == BigDecimal(col.min)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"dim $dim min")
      assert(r.getDouble(5) == BigDecimal(col.max)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s"dim $dim max")
    }
  }

  test("quality_auc: grouped-midrank AUC equals brute-force pair counting") {
    def score(text: String): Long = {
      val t = text.split(" ", -1)
      val n = t.length.toLong
      val stops = t.count(w => w == "the" || w == "a").toLong
      math.min(n, 50L) * (n - stops) * 1000L / (50L * n)
    }
    val docs = Tables.documents(spark, sf)
      .select($"lang", $"text").as[(String, String)].collect()
      .map { case (lang, text) => (lang, score(text)) }
    val got = PipelineOps.q_quality_auc(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == docs.map(_._1).distinct.sorted.toSeq)
    got.foreach { r =>
      val lang = r.getString(0)
      val pos = docs.filter(_._1 == lang).map(_._2)
      val neg = docs.filter(_._1 != lang).map(_._2)
      // U doubled so ties stay integral: 2·[p > n] + 1·[p = n]
      val uX2 = BigInt(pos.iterator.map { p =>
        neg.count(_ < p) * 2L + neg.count(_ == p).toLong
      }.sum)
      val want = uX2 * 1000000 / (2L * pos.length * neg.length)
      assert(r.getLong(1) == pos.length && r.getLong(2) == neg.length, lang)
      assert(BigInt(r.getLong(3)) == want, s"$lang auc")
    }
    // the statistic is a probability: every AUC inside [0, 1e6]
    got.foreach(r => assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L))
  }

  test("token_budget: prefix test equals the iterative water-filling fixpoint") {
    // skewed sources so BOTH branches run: tiny/mid saturate at the
    // 4-epoch cap (their sqrt-damped share exceeds it), huge absorbs
    // the re-flowed budget.
    // NOTE the binding contract is the QUANTIZED-ORDER sequential
    // test (see tokenBudget's scaladoc): this fixpoint cross-check
    // holds here because the inputs keep cap/weight ratio gaps far
    // above the 2^-20 quantization grain — on adversarial inputs
    // with ratio gaps below 2^-20 the two definitions may transpose
    // a boundary group and only the quantized order is the spec.
    val dir = java.nio.file.Files.createTempDirectory("tb").toString
    val docs = Seq(
      (1L, Seq.fill(10)("w").mkString(" "), "en", "tiny"),
      (2L, Seq.fill(500)("w").mkString(" "), "en", "mid"),
      (3L, Seq.fill(500)("w").mkString(" "), "en", "mid"),
      (4L, Seq.fill(50000)("w").mkString(" "), "en", "huge"),
      (5L, Seq.fill(50000)("w").mkString(" "), "en", "huge"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = PipelineOps.q_token_budget(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
         r.getLong(6))).toMap
    // iterative fixpoint, order-free: saturate every group whose
    // proportional share meets its cap, re-flow, repeat to stability
    val masses = Map("tiny" -> 10L, "mid" -> 1000L, "huge" -> 100000L)
    val w = masses.map { case (g, t) =>
      g -> (t, math.floor(math.sqrt(t.toDouble)).toLong, t * 4000L / 1000L) }
    val budget = masses.values.sum * 2000L / 1000L
    var pool = w.keySet
    var remaining = BigInt(budget)
    var alloc = Map.empty[String, Long]
    var changed = true
    while (changed) {
      changed = false
      val wSum = pool.toSeq.map(g => BigInt(w(g)._2)).sum
      val over = pool.filter(g => BigInt(w(g)._3) * wSum <= BigInt(w(g)._2) * remaining)
      if (over.nonEmpty) {
        over.foreach { g => alloc += g -> w(g)._3; remaining -= w(g)._3 }
        pool = pool -- over; changed = true
      }
    }
    val wSum = pool.toSeq.map(g => BigInt(w(g)._2)).sum
    pool.foreach { g => alloc += g -> (BigInt(w(g)._2) * remaining / wSum).toLong }
    assert(got.keySet == masses.keySet)
    val saturated = got.filter(_._2._4 == 1L).keySet
    assert(saturated == Set("tiny", "mid"), s"saturated = $saturated")
    got.foreach { case (g, (t, wt, cap, _, a, em)) =>
      assert(t == masses(g) && wt == w(g)._2 && cap == w(g)._3, g)
      assert(a == alloc(g), s"$g alloc $a != ${alloc(g)}")
      assert(em == a * 1000L / t, s"$g epochs")
    }
    // budget conserved: never over-allocated, floor dust < |unsaturated|
    val total = got.values.map(_._5).sum
    assert(total <= budget && budget - total < masses.size, s"dust ${budget - total}")
  }

  test("ks_drift: per-pair statistic equals a driver-side ECDF sweep") {
    val docs = Tables.documents(spark, sf)
      .select($"source", $"n_chars").as[(String, Long)].collect()
    val bySrc = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val srcs = bySrc.keys.toSeq.sorted
    val got = PipelineOps.q_ks_drift(spark, sf).collect()
    val expectPairs = for { a <- srcs; b <- srcs if a < b } yield (a, b)
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq == expectPairs)
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (xa, xb) = (bySrc(a), bySrc(b))
      val spine = (xa ++ xb).distinct.sorted
      val gaps = spine.map { v =>
        val ga = xa.count(_ <= v) * 1000000L / xa.length
        val gb = xb.count(_ <= v) * 1000000L / xb.length
        (math.abs(ga - gb), v)
      }
      val ks = gaps.map(_._1).max
      val at = gaps.filter(_._1 == ks).map(_._2).min
      assert(r.getLong(2) == xa.length && r.getLong(3) == xb.length, s"$a/$b n")
      assert(r.getLong(4) == ks, s"$a/$b ks")
      assert(r.getLong(5) == at, s"$a/$b at")
    }
  }

  test("psi_drift: per-pair PSI equals a driver-side binned reference") {
    val docs = Tables.documents(spark, sf)
      .select($"source", $"n_chars").as[(String, Long)].collect()
    val bySrc = docs.groupBy(_._1).view
      .mapValues(_.map(t => java.lang.Long.toBinaryString(t._2).length.toLong))
      .toMap
    val got = PipelineOps.q_psi_drift(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.size == bySrc.size * (bySrc.size - 1) / 2)
    for (((a, b), (nA, nB, nBkt, psi)) <- got) {
      val (xa, xb) = (bySrc(a), bySrc(b))
      val bkts = (xa ++ xb).distinct
      val ca = bkts.map(v => xa.count(_ == v).toLong)
      val cb = bkts.map(v => xb.count(_ == v).toLong)
      val (na, nb) = (xa.length.toLong, xb.length.toLong)
      val ref = ca.zip(cb).map { case (x, y) =>
        val p = (x + 1).toDouble / (na + bkts.size)
        val q = (y + 1).toDouble / (nb + bkts.size)
        (p - q) * math.log(p / q)
      }.sum
      assert(nA == na && nB == nb && nBkt == bkts.size, s"$a/$b counts")
      assert(math.abs(psi - ref) < 1e-5, s"$a/$b psi $psi vs $ref")
    }
  }

  test("snapshot_churn: per-source stats equal a driver-side gram-set reference") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)].collect()
    def grams(t: String): Set[String] = {
      val tk = t.split(" ", -1)
      (0 to tk.length - 3).map(i => tk.slice(i, i + 3).mkString(" ")).toSet
    }
    val changed = docs.filter { case (id, _, _) =>
      id % 7 == 0 && id % 11 != 0 && id % 13 != 0 }
    val perDoc = changed.map { case (_, src, text) =>
      val (ga, gb) = (grams(text), grams(text + " rev2 edit"))
      val un = (ga ++ gb).size
      src -> (if (un == 0) 1000L else (ga & gb).size.toLong * 1000 / un)
    }
    val ref = perDoc.groupBy(_._1).view.mapValues { xs =>
      val js = xs.map(_._2)
      (js.size.toLong, js.sum / js.size, js.min, js.max,
       js.count(_ >= 900).toLong, js.count(_ < 500).toLong)
    }.toMap
    val got = PipelineOps.q_snapshot_churn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got == ref)
  }

  test("phrase_search: positional-index join equals a driver-side scan") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)].collect()
    val bigrams = docs.flatMap { case (_, _, t) =>
      val tk = t.split(" ", -1)
      (0 to tk.length - 2).map(i => tk(i) + " " + tk(i + 1))
    }
    val top = bigrams.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (g, n) => (-n, g) }.head._1
    val Array(w1, w2) = top.split(" ")
    val ref = docs.map { case (_, src, t) =>
      val tk = t.split(" ", -1)
      src -> (0 to tk.length - 2).count(i => tk(i) == w1 && tk(i + 1) == w2).toLong
    }.groupBy(_._1).view
      .mapValues(hs => (hs.count(_._2 > 0).toLong, hs.map(_._2).sum))
      .toMap.filter(_._2._2 > 0)
    val got = PipelineOps.q_phrase_search(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (src, (gw1, gw2, nd, nh)) =>
      assert(gw1 == w1 && gw2 == w2, s"phrase $gw1 $gw2 vs $w1 $w2")
      assert((nd, nh) == ref(src), s"$src")
    }
  }

  test("compress_ratio: determinism, bounds, repetition ordering, mass identity") {
    import graft.operators.Deflate
    // the stable contracts (exact byte counts are zlib-build facts,
    // not cross-engine constants - the oracle = no stance)
    val repeated = ("the quick brown fox " * 60).trim
    val varied = (1 to 240).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val sr = Deflate.deflatedSizeOnce(repeated.getBytes("UTF-8"))
    val sv = Deflate.deflatedSizeOnce(varied.getBytes("UTF-8"))
    assert(sr > 0 && sv > 0)
    // repeated text compresses strictly below varied text of similar size
    assert(sr.toDouble / repeated.length < sv.toDouble / varied.length,
      s"repeated $sr/${repeated.length} !< varied $sv/${varied.length}")
    // bit-stable across invocations
    assert(sr == Deflate.deflatedSizeOnce(repeated.getBytes("UTF-8")))
    val out = PipelineOps.q_compress_ratio(spark, sf).collect()
    assert(out.nonEmpty)
    val again = PipelineOps.q_compress_ratio(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "not deterministic")
    out.foreach { r =>
      val (n, raw, defl) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (ratio, mn, mx, tmpl) =
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(n > 0 && raw > 0)
      // the corpus-mass ratio sits well below 1000 (natural text
      // compresses); a single tiny doc can exceed 1000 by the fixed
      // ~11-byte zlib wrapper + stored-block overhead, so the per-doc
      // bound is 1000 + overhead, not 1000
      assert(ratio > 0 && ratio < 1000, s"ratio $ratio")
      assert(mn > 0 && mn <= mx && mx <= 2000 && tmpl <= n, s"$mn/$mx/$tmpl")
      assert(ratio == defl * 1000 / raw, "mass identity")
    }
  }

  test("proximity_search: superset of phrase_search's adjacency hits") {
    val phrase = PipelineOps.q_phrase_search(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    val prox = PipelineOps.q_proximity_search(spark, sf).collect()
    assert(prox.nonEmpty)
    // same probe phrase on both (the shared temp table)
    prox.foreach { r =>
      val src = r.getString(0)
      val (nd, nh) = (r.getLong(3), r.getLong(4))
      assert(nh >= 1 && nd >= 1 && nh >= nd, s"$src bounds")
      phrase.get(src).foreach { case (pd, ph) =>
        assert(nd >= pd, s"$src prox docs $nd < phrase docs $pd")
        assert(nh >= ph, s"$src prox hits $nh < phrase hits $ph")
      }
    }
    // every phrase-hit source also appears in the proximity report
    assert(phrase.keySet.subsetOf(prox.map(_.getString(0)).toSet))
  }

  test("readability: FRE milli-units bounded, mean between extremes") {
    val out = PipelineOps.q_readability(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, mean, mn, mx) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val (easy, hard) = (r.getLong(5), r.getLong(6))
      assert(n > 0)
      assert(mn >= 0 && mn <= mean && mean <= mx && mx <= 206835,
        s"${r.getString(0)}: $mn/$mean/$mx out of order or bounds")
      assert(easy + hard <= n, "bands overlap")
    }
  }

  test("code_detect: detection equals the planted contamination exactly") {
    val docs = Tables.documents(spark, sf)
    val planted = docs.filter(col("doc_id") % 9 === 0)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val light = docs.filter(col("doc_id") % 9 === 4)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = PipelineOps.q_code_detect(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val src = r.getString(0)
      // no false positives, no misses: the ≥100‰ gate recovers the
      // replaced docs exactly, and the one-statement appends stay
      // strictly below it (min n_chars 44 ⇒ ≤ 2000/51 ≈ 39‰)
      assert(r.getLong(2) == planted.getOrElse(src, 0L),
        s"$src n_code ${r.getLong(2)} != planted ${planted.getOrElse(src, 0L)}")
      assert(r.getLong(4) == light.getOrElse(src, 0L),
        s"$src n_light ${r.getLong(4)} != planted ${light.getOrElse(src, 0L)}")
      assert(r.getLong(6) >= 100, "max density must cover a code doc")
    }
  }

  test("dedup_url: kept docs equal distinct canonical pages exactly") {
    val out = PipelineOps.q_dedup_url(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        s"${r.getString(0)}: kept+dropped != docs")
    }
    // keep-min keeps exactly one doc per canonical key, so the kept
    // total across sources must equal the number of distinct page
    // keys present (doc_id mod 127 over the live ids)
    val pages = Tables.documents(spark, sf)
      .select((col("doc_id") % 127).as("pk")).distinct().count()
    assert(out.map(_.getLong(2)).sum == pages,
      s"kept ${out.map(_.getLong(2)).sum} != distinct pages $pages")
  }

  test("anchor_text: link mass conserved, consensus bounded") {
    val out = PipelineOps.q_anchor_text(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (inl, na, topN) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(topN >= 1 && topN <= inl, s"${r.getString(0)} top vs inlinks")
      assert(na >= 1 && na <= inl, s"${r.getString(0)} anchors vs inlinks")
      assert(r.getString(3).nonEmpty, "top anchor text present")
    }
    // every planted link is attributed to exactly one target
    val totalPlanted = Tables.documents(spark, sf)
      .select(sum(col("doc_id") % 3 + 1)).collect()(0).getLong(0)
    assert(out.map(_.getLong(1)).sum == totalPlanted,
      "sum of in-links must equal the planted link count")
  }
}

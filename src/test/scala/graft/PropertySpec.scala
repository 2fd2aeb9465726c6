package graft

import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Generative (ScalaCheck) checks of the algebraic invariants the
  * distributed operators depend on. These are the properties that make
  * the 100 TB execution CORRECT, not just fast: combiner-safety of the
  * sketch aggregators (partial buffers may merge in any grouping /
  * order across executors), LSH recall guarantees (band bucketing may
  * not lose an output pair), and the exactness of the n-gram
  * size-prune inequality. All JVM-side — no Spark jobs — so hundreds
  * of generated cases run in milliseconds. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val tokenGen: Gen[String] = Gen.oneOf(
    "the", "a", "scan", "filter", "join", "agg", "window", "row",
    "batch", "key", "value", "hash", "merge", "sort", "data", "part")
  private val docGen: Gen[List[String]] = Gen.nonEmptyListOf(tokenGen)

  private def minhashSig(tokens: Seq[String]): Seq[Long] =
    MinHash.agg.finish(tokens.foldLeft(MinHash.agg.zero)(MinHash.agg.reduce))

  test("topk: combiner-safe and equal to sort-take-k for any split") {
    val entryGen: Gen[TopK.Entry] = for {
      id <- Gen.chooseNum(0L, 30L)            // small range forces score ties
      s <- Gen.oneOf(0.0, 0.25, 0.5, 0.75, 1.0)
    } yield TopK.Entry(id, s)
    val agg = TopK.agg(5)
    check("topk split-merge", Prop.forAll(
        Gen.listOf(entryGen), Gen.chooseNum(0, 100)) { (es, cut) =>
      val k = cut % (es.size + 1)
      val (l, r) = es.splitAt(k)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val expect = es.sortBy(e => (-e.score, e.id)).take(5)
      agg.finish(merged) == expect &&
        agg.finish(es.foldLeft(agg.zero)(agg.reduce)) == expect
    })
  }

  test("epoch shuffle key: bijection on [0, P) residues (sampled)") {
    val P = 1000000007L
    check("shuffle bijection", Prop.forAll(
        Gen.chooseNum(0L, P - 1), Gen.chooseNum(0L, P - 1)) { (a, b) =>
      def key(x: Long) = math.floorMod(math.floorMod(x + 3L, P) * 2654435761L, P)
      (a == b) == (key(a) == key(b))
    })
  }

  test("minhash: combiner-safe — any split + merge equals one-pass reduce") {
    check("minhash merge", Prop.forAll(docGen, Gen.chooseNum(0, 100)) { (doc, cut) =>
      val k = cut % (doc.size + 1)
      val (l, r) = doc.splitAt(k)
      val merged = MinHash.agg.merge(
        l.foldLeft(MinHash.agg.zero)(MinHash.agg.reduce),
        r.foldLeft(MinHash.agg.zero)(MinHash.agg.reduce))
      MinHash.agg.finish(merged) == minhashSig(doc)
    })
  }

  test("minhash: signature is a set function (order/multiplicity-free)") {
    check("minhash set", Prop.forAll(docGen) { doc =>
      minhashSig(doc) == minhashSig(scala.util.Random.shuffle(doc ++ doc))
    })
  }

  test("minhash: estimate bounds — equal sets 64/64, disjoint-ish low") {
    check("minhash estimate", Prop.forAll(docGen, docGen) { (a, b) =>
      val same = minhashSig(a).zip(minhashSig(b)).count { case (x, y) => x == y }
      val j = {
        val (sa, sb) = (a.toSet, b.toSet)
        sa.intersect(sb).size.toDouble / sa.union(sb).size
      }
      // exact-match cases must agree exactly; others stay in range
      if (j == 1.0) same == MinHash.NumPerms
      else same >= 0 && same <= MinHash.NumPerms
    })
  }

  private def simhashSig(tf: Seq[(String, Long)]): Long =
    SimHash.agg.finish(tf.foldLeft(SimHash.agg.zero)(SimHash.agg.reduce))

  test("vecsum: combiner-safe — any split + merge equals one-pass reduce") {
    val vecGen: Gen[List[Seq[Double]]] = for {
      d <- Gen.chooseNum(1, 8)
      n <- Gen.chooseNum(1, 12)
      vs <- Gen.listOfN(n, Gen.listOfN(d, Gen.chooseNum(-5.0, 5.0)))
    } yield vs.map(_.toSeq)
    check("vecsum merge", Prop.forAll(vecGen, Gen.chooseNum(0, 100)) { (vs, cut) =>
      val k = cut % (vs.size + 1)
      val (l, r) = vs.splitAt(k)
      def fold(xs: Seq[Seq[Double]]) = xs.foldLeft(VecSum.agg.zero)(VecSum.agg.reduce)
      val merged = VecSum.agg.finish(VecSum.agg.merge(fold(l), fold(r)))
      val onePass = VecSum.agg.finish(fold(vs))
      // element-wise double sums: equal split points reorder additions,
      // so compare within a float tolerance (the engine never promises
      // bit-equality across groupings for float sums — rule F)
      merged.size == onePass.size &&
        merged.zip(onePass).forall { case (a, b) => math.abs(a - b) < 1e-9 }
    })
  }

  test("vecsum: ragged and empty inputs throw regardless of arrival order") {
    val a = VecSum.agg
    // ragged: dims mismatch throws whichever vector folds first
    intercept[IllegalArgumentException] {
      Seq(Seq(1.0, 2.0), Seq(1.0)).foldLeft(a.zero)(a.reduce)
    }
    intercept[IllegalArgumentException] {
      Seq(Seq(1.0), Seq(1.0, 2.0)).foldLeft(a.zero)(a.reduce)
    }
    // a ragged pair split across partial buffers throws at merge
    intercept[IllegalArgumentException] {
      a.merge(a.reduce(a.zero, Seq(1.0, 2.0)), a.reduce(a.zero, Seq(3.0)))
    }
    // empty vectors are indistinguishable from the uninitialized
    // buffer, so they must throw DETERMINISTICALLY — empty-first used
    // to be silently swallowed while empty-after-nonempty threw
    intercept[IllegalArgumentException] { a.reduce(a.zero, Seq.empty) }
    intercept[IllegalArgumentException] {
      a.reduce(a.reduce(a.zero, Seq(1.0, 2.0)), Seq.empty)
    }
    // NULLs still skip (SQL aggregate convention)
    assert(a.finish(a.reduce(a.reduce(a.zero, null), Seq(1.0, 2.0))) == Seq(1.0, 2.0))
  }

  test("simhash: combiner-safe and tf-linear") {
    check("simhash merge", Prop.forAll(docGen) { doc =>
      val tf = doc.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val (l, r) = tf.splitAt(tf.size / 2)
      val merged = SimHash.agg.merge(
        l.foldLeft(SimHash.agg.zero)(SimHash.agg.reduce),
        r.foldLeft(SimHash.agg.zero)(SimHash.agg.reduce))
      SimHash.agg.finish(merged) == simhashSig(tf)
    })
  }

  test("simhash LSH: hamming <= 3 pairs ALWAYS share a band (pigeonhole recall)") {
    val sigGen = Gen.long
    val flipsGen = Gen.chooseNum(0, 3).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 63)))
    check("simhash bands", Prop.forAll(sigGen, flipsGen) { (sig, flips) =>
      val other = flips.foldLeft(sig)((s, b) => s ^ (1L << b))
      SimHash.hamming(sig, other) <= 3 ==>
        (0 until SimHash.NumBands).exists(b =>
          SimHash.bandKey(sig, b) == SimHash.bandKey(other, b))
    })
  }

  test("minhash LSH: est >= 0.9 pairs ALWAYS share >= 2 of 8 bands") {
    // <= 6 of 64 positions differ -> 6 mismatches cover <= 6 bands
    val posGen = Gen.listOfN(6, Gen.chooseNum(0, MinHash.NumPerms - 1))
    check("minhash bands", Prop.forAll(posGen) { mismatches =>
      val touched = mismatches.map(_ / MinHash.RowsPerBand).toSet
      MinHash.NumBands - touched.size >= 2
    })
  }

  test("NfcNormalize eval: JDK-truth equivalence, idempotence, identity fast path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    import java.text.Normalizer
    def nfc(s: String): UTF8String =
      graft.functions.NfcNormalize(Literal(UTF8String.fromString(s), StringType))
        .eval(null).asInstanceOf[UTF8String]
    // arbitrary strings INCLUDING raw unicode + the combining
    // sequences the declared query injects
    val g = Gen.oneOf(
      Gen.asciiPrintableStr,
      Arbitrary.arbitrary[String],
      Gen.listOf(Gen.oneOf("é", "ü", "é", "a", " ", "́"))
        .map(_.mkString))
    check("nfc jdk truth", Prop.forAll(g) { s =>
      val out = nfc(s)
      // the expression IS the JDK normalizer (cross-impl agreement
      // with utf8proc is pinned by the q_unicode_norm oracle)
      out.toString == Normalizer.normalize(s, Normalizer.Form.NFC) &&
        // idempotent: normalizing twice changes nothing
        nfc(out.toString).toString == out.toString
    })
    // already-NFC input returns the INPUT OBJECT — the zero-allocation
    // fast path the scaladoc promises on ASCII corpora
    check("nfc identity fast path", Prop.forAll(Gen.asciiPrintableStr) { s =>
      val in = UTF8String.fromString(s)
      val e = graft.functions.NfcNormalize(Literal(in, StringType))
      e.eval(null).asInstanceOf[AnyRef] eq in
    })
  }

  test("BPE: wrapped replace-chain == leftmost-greedy merge loop (random chains)") {
    // The round-12 encoder's load-bearing equivalence: Graft.bpeEncode
    // applies each merge as ONE literal string replace over the
    // '(sym)'-wrapped form, and claims that equals the learner's
    // leftmost-greedy non-overlapping symbol merge. Java
    // String.replace has EXACTLY the replace semantics of Spark's and
    // DuckDB's `replace` (literal, leftmost, non-overlapping, global),
    // so the equivalence is checkable JVM-side across random merge
    // CHAINS — including the adversarial shapes: self-merges (a,a),
    // merges of merged symbols ((aa,a), (aa,aa)), and patterns that
    // never occur. Also pins losslessness (concatenating the tokens
    // reconstructs the word) for free.
    val alpha = Seq("a", "b", "c")
    // constructive chain generator: each merge picks two symbols from
    // the pool so far (the learner's reachable-merge shape), and the
    // merged symbol joins the pool — chains like (a,a),(aa,aa) arise
    val chainGen: Gen[List[(String, String)]] =
      Gen.chooseNum(0, 6).flatMap { n =>
        (1 to n).foldLeft(Gen.const((alpha.toVector, List.empty[(String, String)]))) {
          (acc, _) => acc.flatMap { case (pool, ms) =>
            for {
              a <- Gen.oneOf(pool)
              b <- Gen.oneOf(pool)
            } yield (pool :+ (a + b), ms :+ ((a, b)))
          }
        }.map(_._2)
      }
    val wordGen: Gen[String] =
      Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, Gen.oneOf(alpha)).map(_.mkString))
    def chainEncode(word: String, merges: Seq[(String, String)]): String =
      merges.foldLeft(word.map(c => s"($c)").mkString) { case (s, (a, b)) =>
        s.replace(s"($a)($b)", s"($a$b)")
      }
    def greedy(word: String, merges: Seq[(String, String)]): Seq[String] =
      merges.foldLeft(word.map(_.toString): Seq[String]) { case (syms, (a, b)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toSeq
      }
    check("bpe chain == greedy", Prop.forAll(wordGen, chainGen) { (w, ms) =>
      val viaChain = chainEncode(w, ms)
      val viaGreedy = greedy(w, ms)
      viaChain == viaGreedy.map(s => s"($s)").mkString &&
        viaGreedy.mkString == w
    })
  }

  test("BPE: indexed segmenter == in-order merge fold for ANY merge list (watermark rule)") {
    // The round-13 scalable encoder's load-bearing equivalence:
    // Graft.bpeSegmenter processes candidates by (rank, position)
    // through a heap but must equal bpeEncode's IN-ORDER single
    // passes. The adversarial case is a LATE-CREATED LOWER-RANK
    // pattern — merges [(ab,c), (a,b)] on "abc": pass 0 is a no-op
    // (no "ab" symbol yet), pass 1 creates it, and a naive
    // lowest-rank-first encoder would then wrongly apply rank 0. The
    // watermark (admit a new adjacency only at its smallest rank
    // STRICTLY above the rank being processed) is exactly what makes
    // the heap order in-order-equivalent, so the generator draws
    // ARBITRARY merge lists (multi-char parts, duplicates, no-ops,
    // self-pairs), not just learner-reachable chains.
    val alpha = Seq("a", "b", "c")
    val partGen: Gen[String] = Gen.oneOf(
      "a", "b", "c", "aa", "ab", "ba", "bc", "ca", "abc", "aab", "bca")
    val listGen: Gen[List[(String, String)]] =
      Gen.chooseNum(0, 8).flatMap(n =>
        Gen.listOfN(n, Gen.zip(partGen, partGen)))
    val wordGen: Gen[String] =
      Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf(alpha)).map(_.mkString))
    def fold(word: String, merges: Seq[(String, String)]): Seq[String] =
      merges.foldLeft(word.map(_.toString): Seq[String]) { case (syms, (a, b)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toSeq
      }
    check("bpe indexed == fold", Prop.forAll(wordGen, listGen) { (w, ms) =>
      Graft.bpeSegmenter(ms)(w) == fold(w, ms)
    })
  }

  test("ngram size-prune: exact filter 9c>=4(na+nb) implies 5*min>=4*max") {
    // Generator targets near-similar sizes so the premise fires often;
    // the check is a plain boolean (no ==> discards, which exhaust on
    // uniform generation because 9c >= 4(na+nb) is a rare event there).
    val g = for {
      na <- Gen.chooseNum(1, 1000000)
      nb <- Gen.chooseNum(math.max(1, (na * 0.7).toInt), (na * 1.3).toInt + 1)
      c  <- Gen.chooseNum(0, math.min(na, nb))
    } yield (na, nb, c)
    check("size prune", Prop.forAll(g) { case (na, nb, c) =>
      val passes = 9L * c >= 4L * (na + nb)
      val prune = 5L * math.min(na, nb) >= 4L * math.max(na, nb)
      !passes || prune // the join-time prune can never drop an output pair
    })
  }

  test("perceptualHash: EXACT brightness-shift invariance at ANY dims (random grids)") {
    import graft.multimodal.Multimodal
    // The integer cross-product comparison makes +δ invariance an
    // ALGEBRAIC identity — (sum_c+δ·cnt_c)·N > (total+δ·N)·cnt_c
    // cancels to sum_c·N > total·cnt_c for every cell — so it must
    // hold for arbitrary (including non-multiple-of-8, sub-8×8) dims,
    // arbitrary pixel content, and any non-clipping shift. A float
    // implementation fails this at ties; the property is the round-13
    // no-float-tie contract.
    val g = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 40)
      delta <- Gen.chooseNum(1, 5)
      px <- Gen.listOfN(w * h, Gen.chooseNum(0, 250))
    } yield (w, h, delta, px)
    check("phash shift invariance", Prop.forAll(g) { case (w, h, delta, px) =>
      def bmp(vals: Seq[Int]) = Multimodal.encodeBmp(w, h,
        vals.map(v => (v << 16) | (v << 8) | v).toArray)
      val base = Multimodal.perceptualHash(bmp(px))
      val shifted = Multimodal.perceptualHash(bmp(px.map(_ + delta)))
      base.isDefined && base == shifted
    })
  }
}

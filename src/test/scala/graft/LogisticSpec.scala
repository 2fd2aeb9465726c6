package graft

import org.apache.spark.sql.functions._

/** Logistic-regression quality classifier (round 14): the gradient
  * against finite differences, convergence on separable data, L2
  * shrinkage, bit-determinism, and the q_quality_lr query surface —
  * the property net standing in for the SQL oracle on the
  * float-iterative training loop. */
class LogisticSpec extends SparkSpecBase {
  import spark.implicits._

  /** Driver-side reference: mean log-loss of (w, b) over standardized
    * rows — the function logisticTrain descends. */
  private def refLoss(rows: Seq[(Double, Seq[Double])], w: Seq[Double], b: Double,
                      means: Seq[Double], stds: Seq[Double]): Double = {
    val n = rows.size
    rows.map { case (y, xs) =>
      val z = b + w.indices.map(i => w(i) * (xs(i) - means(i)) / stds(i)).sum
      math.max(z, 0) - y * z + math.log1p(math.exp(-math.abs(z)))
    }.sum / n
  }

  test("first-iteration gradient matches finite differences of the loss") {
    val data = Seq((1.0, Seq(2.0, -1.0)), (0.0, Seq(-1.5, 0.5)),
                   (1.0, Seq(3.0, 0.0)), (0.0, Seq(0.0, 1.0)),
                   (1.0, Seq(1.0, -2.0)), (0.0, Seq(-2.0, 2.0)))
    val df = data.map { case (y, xs) => (y, xs(0), xs(1)) }.toDF("y", "a", "b")
    // one GD step from w = 0 with lr = 1, no L2: the update is exactly
    // -gradient, so the learned (w, b) after 1 iter IS -∇L(0)
    val m = Graft.logisticTrain(df, col("y"), Seq(col("a"), col("b")),
                                iters = 1, lr = 1.0)
    val eps = 1e-5
    def lossAt(w: Seq[Double], b: Double): Double =
      refLoss(data, w, b, m.means, m.stds)
    val g0 = (lossAt(Seq(eps, 0), 0) - lossAt(Seq(-eps, 0), 0)) / (2 * eps)
    val g1 = (lossAt(Seq(0, eps), 0) - lossAt(Seq(0, -eps), 0)) / (2 * eps)
    val gb = (lossAt(Seq(0, 0), eps) - lossAt(Seq(0, 0), -eps)) / (2 * eps)
    assert(math.abs(-g0 - m.weights(0)) <= 1e-4, s"dw0: ${-g0} vs ${m.weights(0)}")
    assert(math.abs(-g1 - m.weights(1)) <= 1e-4, s"dw1: ${-g1} vs ${m.weights(1)}")
    assert(math.abs(-gb - m.bias) <= 1e-4, s"db: ${-gb} vs ${m.bias}")
    // and the recorded loss is the loss at w = 0: ln 2
    assert(math.abs(m.losses.head - math.log(2)) <= 1e-6)
  }

  test("converges on linearly separable data and the loss trail descends") {
    // y = 1 iff a + b > 0, margin >= 1 — cleanly separable
    val rng = new scala.util.Random(7)
    val data = (1 to 200).map { _ =>
      val a = rng.nextDouble() * 8 - 4
      val b = rng.nextDouble() * 8 - 4
      if (a + b > 1) (1.0, a, b) else if (a + b < -1) (0.0, a, b)
      else (if (a + b > 0) 1.0 else 0.0, a + math.signum(a + b), b)
    }
    val df = data.toDF("y", "a", "b")
    val m = Graft.logisticTrain(df, col("y"), Seq(col("a"), col("b")),
                                iters = 40, lr = 2.0)
    assert(m.losses.last < m.losses.head / 4,
      s"loss barely moved: ${m.losses.head} -> ${m.losses.last}")
    assert(m.losses.last == m.losses.min, "final loss is not the minimum")
    val last = m.trail.last
    val acc = (last.tp + last.tn).toDouble / m.nRows
    assert(acc >= 0.95, s"accuracy $acc on separable data")
    // predict column agrees with the driver-side margin on every row
    val preds = df.select(col("y"),
        Graft.logisticPredict(m, Seq(col("a"), col("b"))).as("p")).collect()
    preds.foreach { r =>
      val p = r.getDouble(1)
      assert(p >= 0 && p <= 1)
    }
  }

  test("L2 regularization shrinks the weight norm") {
    val data = (1 to 100).map { i =>
      val a = (i % 10) - 4.5
      (if (a > 0) 1.0 else 0.0, a, a * 0.5)
    }
    val df = data.toDF("y", "a", "b")
    val m0 = Graft.logisticTrain(df, col("y"), Seq(col("a"), col("b")),
                                 iters = 30, lr = 1.0, l2 = 0.0)
    val m1 = Graft.logisticTrain(df, col("y"), Seq(col("a"), col("b")),
                                 iters = 30, lr = 1.0, l2 = 0.3)
    def norm(m: LogisticModel) = math.sqrt(m.weights.map(w => w * w).sum)
    assert(norm(m1) < norm(m0),
      s"L2 did not shrink: ${norm(m1)} !< ${norm(m0)}")
  }

  test("training is bit-deterministic across runs and repartitionings") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def train(d: org.apache.spark.sql.DataFrame) =
      Graft.logisticTrain(d, (col("lang") === "en").cast("double"),
        Seq(log1p(col("n_chars")), size(split(col("text"), " ")).cast("double")),
        iters = 5, lr = 1.0)
    val m1 = train(docs)
    val m2 = train(docs.repartition(7))
    assert(m1.weights == m2.weights && m1.bias == m2.bias,
      "weights flapped under repartitioning")
    assert(m1.losses == m2.losses, "loss trail flapped under repartitioning")
  }

  test("q_quality_lr: ledger shape, integer ranges, descending loss") {
    val out = queries.PipelineOps.q_quality_lr(spark, sf).collect()
    assert(out.length == 12)
    assert(out.map(_.getLong(0)).toSeq == (1L to 12L))
    val losses = out.map(_.getLong(1)).toSeq
    assert(losses.last < losses.head, s"loss did not descend: $losses")
    out.foreach { r =>
      val acc = r.getLong(2)
      assert(acc >= 0 && acc <= 1000, s"acc_permille out of range: $acc")
    }
    // iteration 1 is the w = 0 point: loss_micro = floor(ln(2) * 1e6)
    assert(losses.head == math.floor(math.log(2) * 1e6).toLong)
  }

  test("empty and degenerate inputs are rejected loudly") {
    val df = Seq((1.0, 2.0)).toDF("y", "a")
    intercept[IllegalArgumentException] {
      Graft.logisticTrain(df, col("y"), Nil)
    }
    intercept[IllegalArgumentException] {
      Graft.logisticTrain(df, col("y"), Seq(col("a")), iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graft.logisticTrain(df.filter(lit(false)), col("y"), Seq(col("a")))
    }
  }

  test("q_quality_eval: confusion and AUC equal a driver-side brute force") {
    import graft.queries.PipelineOps
    val sf = SparkTestSession.sf0001
    val got = PipelineOps.q_quality_eval(spark, sf).collect()
    assert(got.length == 1)
    val r = got.head
    // reference predictions through the SAME cached model + feature
    // definitions, collected and brute-forced in the driver
    val model = PipelineOps.lrModel(spark, sf)
    val h = col("doc_id") % 1000000007L * 2654435761L % 1000L
    val ref = Tables.documents(spark, sf)
      .filter(h >= 900)
      .select((col("lang") === "en").cast("long").as("y"),
              floor(Graft.logisticPredict(model, PipelineOps.lrFeatures) * 1e6)
                .cast("long").as("p"))
      .as[(Long, Long)].collect()
    val nTest = ref.length.toLong
    val tp = ref.count { case (y, p) => y == 1 && p >= 500000 }.toLong
    val fp = ref.count { case (y, p) => y == 0 && p >= 500000 }.toLong
    val tn = ref.count { case (y, p) => y == 0 && p < 500000 }.toLong
    val fn = ref.count { case (y, p) => y == 1 && p < 500000 }.toLong
    assert(r.getLong(0) == nTest && nTest > 0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
             == ((tp, fp, tn, fn)))
    assert(r.getLong(5) == (tp + tn) * 1000L / nTest)
    val pos = ref.filter(_._1 == 1L).map(_._2)
    val neg = ref.filter(_._1 == 0L).map(_._2)
    if (pos.isEmpty || neg.isEmpty) assert(r.isNullAt(6))
    else {
      val uX2 = BigInt(pos.iterator.map { p =>
        neg.count(_ < p) * 2L + neg.count(_ == p).toLong
      }.sum)
      val want = uX2 * 1000000 / (2L * pos.length * neg.length)
      assert(BigInt(r.getLong(6)) == want, "auc")
      // a trained classifier should rank better than chance on its
      // own corpus — a floor, not an exact pin
      assert(r.getLong(6) > 500000L, s"auc ${r.getLong(6)}")
    }
  }

  test("q_quality_calib: every column equals a driver-side brute force") {
    import graft.queries.PipelineOps
    val sf = SparkTestSession.sf0001
    val got = PipelineOps.q_quality_calib(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    // reference micro scores through the SAME cached model + features
    val model = PipelineOps.lrModel(spark, sf)
    val h = col("doc_id") % 1000000007L * 2654435761L % 1000L
    val ref = Tables.documents(spark, sf)
      .filter(h >= 900)
      .select((col("lang") === "en").cast("long").as("y"),
              floor(Graft.logisticPredict(model, PipelineOps.lrFeatures) * 1e6)
                .cast("long").as("p"))
      .as[(Long, Long)].collect()
    val nTest = ref.length.toLong
    val nPos = ref.count(_._1 == 1L).toLong
    val ybarPpm = nPos * 1000000L / nTest
    val brierPpm = (ref.iterator.map { case (y, p) =>
      val e = BigInt(p - y * 1000000L); e * e
    }.sum / (BigInt(nTest) * 1000000)).toLong
    val uncPpm = (BigInt(ybarPpm) * (1000000L - ybarPpm) / 1000000).toLong
    val byBin = ref.groupBy { case (_, p) => math.min(p / 100000L, 9L) }
    assert(got.keySet == byBin.keySet, "bin key sets")
    assert(got.nonEmpty)
    byBin.foreach { case (bin, rows) =>
      val r = got(bin)
      val n = rows.length.toLong
      val sumP = rows.map(_._2).sum
      val pos = rows.count(_._1 == 1L).toLong
      val meanP = sumP / n
      val fracPos = pos * 1000000L / n
      val gap = meanP - fracPos
      val rel = (BigInt(n) * BigInt(gap) * BigInt(gap) /
        (BigInt(nTest) * 1000000)).toLong
      val res = (BigInt(n) * BigInt(fracPos - ybarPpm) * BigInt(fracPos - ybarPpm) /
        (BigInt(nTest) * 1000000)).toLong
      assert(r.getLong(1) == n, s"bin $bin n")
      assert(r.getLong(2) == meanP, s"bin $bin mean_p")
      assert(r.getLong(3) == fracPos, s"bin $bin frac_pos")
      assert(r.getLong(4) == gap, s"bin $bin gap")
      assert(r.getLong(5) == rel, s"bin $bin rel")
      assert(r.getLong(6) == res, s"bin $bin res")
      assert(r.getLong(7) == brierPpm, s"bin $bin brier")
      assert(r.getLong(8) == uncPpm, s"bin $bin uncertainty")
    }
    // range sanity: every term is a probability-squared in [0, 1e6]
    // ppm; NOTE Brier = rel − res + unc holds only up to the
    // within-bin forecast variance (forecasts spread inside a decile),
    // so the identity is deliberately NOT asserted — the per-column
    // brute-force pins above are the contract
    got.values.foreach { r =>
      Seq(5, 6, 7, 8).foreach { i =>
        assert(r.getLong(i) >= 0L && r.getLong(i) <= 1000000L,
          s"col $i out of [0, 1e6]: ${r.getLong(i)}")
      }
    }
  }
}

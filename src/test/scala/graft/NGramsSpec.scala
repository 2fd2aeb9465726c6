package graft

import graft.functions.TokenNGrams
import org.apache.spark.sql.functions._

/** Native TokenNGrams expression: semantics vs the interpreted
  * transform/slice/concat_ws chain it replaces, edge cases, and
  * whole-stage-codegen participation. */
class NGramsSpec extends SparkSpecBase {
  import spark.implicits._

  private def hofGrams(t: org.apache.spark.sql.Column, n: Int) =
    transform(sequence(lit(1), size(t) - (n - 1)),
      i => concat_ws(" ", slice(t, i, lit(n))))

  test("matches the transform/slice/concat_ws chain on the documents corpus") {
    val t = split(col("text"), " ")
    for (n <- Seq(1, 2, 3, 5)) {
      val d = Tables.documents(spark, sf)
        .select(hofGrams(t, n).as("h"), TokenNGrams.ngrams(t, n).as("g"))
      assert(d.filter(not(col("h") <=> col("g"))).count() == 0,
        s"n=$n diverged from the HOF chain")
    }
  }

  test("edge cases: short arrays, empty, nulls, null elements") {
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("a")),          // shorter than n -> empty gram list
      (3L, Seq.empty[String]),
      (4L, null)
    ).toDF("id", "t")
    val got = df.select($"id", TokenNGrams.ngrams($"t", 2).as("g"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(got(1L) == Seq("a b", "b c"))
    assert(got(2L) == Seq.empty[String])
    assert(got(3L) == Seq.empty[String])
    assert(got(4L) == null)
    // null elements are skipped inside a window (concat_ws contract)
    val withNullElem = spark.sql("SELECT array('a', CAST(NULL AS STRING), 'b') AS t")
      .select(TokenNGrams.ngrams($"t", 2).as("g"))
      .collect().head.getSeq[String](0)
    assert(withNullElem == Seq("a", "b"))
    // and the HOF chain agrees on that contract
    val hof = spark.sql("SELECT array('a', CAST(NULL AS STRING), 'b') AS t")
      .select(hofGrams($"t", 2).as("g")).collect().head.getSeq[String](0)
    assert(hof == withNullElem)
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    val d = Tables.documents(spark, sf)
      .select(TokenNGrams.ngrams(split($"text", " "), 2).as("g"))
    val plan = d.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[graft_ngrams""".r.findFirstIn(plan).isDefined,
      s"graft_ngrams not inside a codegen stage:\n$plan")
    // force execution through the generated code path
    assert(d.select(sum(size($"g"))).collect().head.getLong(0) > 0)
  }

  test("rejects n < 1 loudly") {
    intercept[IllegalArgumentException] { TokenNGrams.ngrams(lit(Seq("a")), 0) }
  }
}

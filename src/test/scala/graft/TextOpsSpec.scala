package graft

import graft.queries.TextOps
import org.apache.spark.sql.functions._

/** Unit tests for the §2.9 text/LLM-pipeline operators, on the
  * FIXTURES.md micro-fixtures (4 docs: exact-dup pair in shuffled
  * order, one near-dup, one disjoint; unit basis vectors with known
  * cosines). */
class TextOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick fox jumps over the dog", "en"),
    (2L, "dog the over jumps fox quick the", "en"), // same multiset as 1
    (3L, "the quick fox jumps over the cat", "en"), // near-dup of 1 (1 of 7 changed)
    (4L, "alpha beta gamma delta", "de")            // disjoint
  ).toDF("doc_id", "text", "lang")

  test("exact dedup: shuffled-order duplicate collapses, near-dup survives") {
    val fp = docs.select($"lang", $"doc_id",
        array_join(array_sort(split($"text", " ")), " ").as("fp"))
      .groupBy("lang", "fp").agg(min("doc_id").as("keeper"))
    val keepers = fp.collect().map(_.getAs[Long]("keeper")).sorted.toSeq
    assert(keepers == Seq(1L, 3L, 4L)) // 2 deduped into 1; 3 and 4 kept
  }

  test("exact dedup is idempotent (property, 40 random corpora)") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (_ <- 1 to 40) {
      val corpus = (1 to 20).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(6) + 1)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      def dedup(df: org.apache.spark.sql.DataFrame) =
        df.select($"doc_id", array_join(array_sort(split($"text", " ")), " ").as("fp"))
          .groupBy("fp").agg(min("doc_id").as("doc_id"))
          .select($"doc_id", $"fp".as("text"))
      val once = dedup(corpus)
      val twice = dedup(once.select($"doc_id", $"text"))
      assert(once.count() == twice.count())
      assert(once.select("doc_id").except(twice.select("doc_id")).count() == 0)
    }
  }

  test("wordcount on a known corpus") {
    val got = docs.filter($"lang" === "en")
      .select($"doc_id", explode(split($"text", " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("the") == 6 && got("fox") == 3 && got("cat") == 1)
  }

  test("tfidf: corpus-unique term outranks ubiquitous term") {
    val out = TextOps.q_tfidf(spark, sf).collect()
    assert(out.length == 25) // 5 langs x top-5
    assert(out.forall(_.getAs[Int]("rn") <= 5))
    // scores within a lang are non-increasing by rank
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("score"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("sim_search: known cosines of basis vectors") {
    val e1 = Array.tabulate(3)(i => if (i == 0) 1f else 0f)
    val e2 = Array.tabulate(3)(i => if (i == 1) 1f else 0f)
    val mix = Array(math.sqrt(0.5).toFloat, math.sqrt(0.5).toFloat, 0f)
    val emb = Seq((0L, e1), (1L, e2), (2L, mix), (3L, e1))
      .toDF("vec_id", "embedding")
    val probe = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>").as("probe"))
    val dot = aggregate(zip_with($"embedding".cast("array<double>"), $"probe",
      (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val got = emb.filter($"vec_id" =!= 0).crossJoin(broadcast(probe))
      .select($"vec_id", round(dot, 3).as("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 0.707, 3L -> 1.0))
  }

  test("sim_search on testdata: top-k ordered, scores in [-1, 1]") {
    val out = TextOps.q_sim_search(spark, sf).collect()
    assert(out.length == 10)
    val scores = out.map(_.getAs[Double]("score")).toSeq
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(s => s >= -1.001 && s <= 1.001))
    assert(!out.map(_.getAs[Long]("vec_id")).contains(0L)) // probe excluded
  }

  test("knn_centroid: centroid norms in (0, 1] for unit vectors") {
    val out = TextOps.q_knn_centroid(spark, sf).collect()
    assert(out.length == 10) // labels 0..9
    out.foreach { r =>
      val norm = r.getAs[Double]("centroid_norm")
      assert(norm > 0.0 && norm <= 1.000001, s"label ${r.get(0)} norm $norm")
      assert(r.getAs[Long]("n_vecs") > 0)
    }
  }

  test("topk(k=full) equals plain sort (property)") {
    val df = Tables.part(spark, sf).select($"p_partkey", $"p_retailprice")
    val n = df.count().toInt
    val viaLimit = df.orderBy($"p_retailprice".desc, $"p_partkey").limit(n).collect().toSeq
    val viaSort = df.orderBy($"p_retailprice".desc, $"p_partkey").collect().toSeq
    assert(viaLimit == viaSort)
  }
}

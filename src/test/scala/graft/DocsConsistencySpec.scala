package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Guards the documentation against count drift (round-4 verdict #7):
  * every place README.md / SURVEY.md states a query or oracle count,
  * the stated number must equal the live `SparkEntry` map sizes — the
  * docs can only be wrong loudly, never silently. Test/suite counts
  * are deliberately NOT stated in the docs (only sbt knows them). */
class DocsConsistencySpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")

  private val nQueries = SparkEntry.queries.size
  private val nOracles = SparkEntry.oracleSql.size
  private val nNoOracle = nQueries - nOracles

  test("oracleSql keys are a subset of queries, with the declared split") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(nNoOracle == (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).size)
  }

  test("README.md states the live query/oracle counts") {
    val readme = read("README.md")
    assert(readme.contains(s"$nQueries queries"),
      s"README must state '$nQueries queries' (the live SparkEntry.queries.size)")
    assert(readme.contains(s"$nOracles carry a DuckDB-equivalent SQL twin"),
      s"README must state '$nOracles carry a DuckDB-equivalent SQL twin'")
    assert(readme.contains(s"the other $nNoOracle are not SQL-expressible"),
      s"README must state 'the other $nNoOracle are not SQL-expressible'")
  }

  test("SURVEY.md §2 inventory totals match the live maps") {
    val survey = read("SURVEY.md")
    assert(survey.contains(s"**$nQueries declared query"),
      s"SURVEY §2 totals must state '$nQueries declared query ids'")
    assert(survey.contains(s"$nOracles oracle = yes, $nNoOracle oracle = no"),
      s"SURVEY §2 totals must state '$nOracles oracle = yes, $nNoOracle oracle = no'")
    // the binding sentence a few lines below the totals drifted to a
    // stale intermediate count once (round-11 review) — pin it too
    assert(survey.contains(s"session must end with `queries.keySet` = all $nQueries ids"),
      s"SURVEY §2 binding sentence must state 'all $nQueries ids'")
    assert(survey.contains(s"`oracleSql.keySet` = the $nOracles"),
      s"SURVEY §2 binding sentence must state 'the $nOracles'")
  }

  test("docs state no literal test counts — they drift; sbt owns them") {
    val pat = "\\b\\d+ tests\\b".r
    Seq("README.md", "SURVEY.md").foreach { f =>
      val hit = pat.findFirstIn(read(f))
      assert(hit.isEmpty,
        s"$f states a literal test count (forbidden — it drifts): ${hit.getOrElse("")}")
    }
  }

  test("PLANS.md plan headers cover exactly the live query ids") {
    val headers = "(?m)^## (q_\\w+)$".r
      .findAllMatchIn(read("PLANS.md")).map(_.group(1)).toSet
    val live = SparkEntry.queries.keySet
    assert(headers == live,
      s"PLANS.md is stale — regenerate with `sbt \"runMain graft.Plans\"`. " +
      s"Missing: ${(live -- headers).toSeq.sorted.mkString(",")}; " +
      s"orphaned: ${(headers -- live).toSeq.sorted.mkString(",")}")
  }

  test("the composite quality score has exactly ONE definition site") {
    // Round-15 verdict #6: q_text_quality's score expression was
    // re-inlined in q_quality_auc / q_pr_curve (and two more sites),
    // so a future edit to the formula had to touch five places and
    // nothing would catch a drift between them. Now every consumer
    // goes through Graft.qualitySignals — pin that the formula's
    // distinctive core appears ONLY there, exactly once, so any new
    // inline copy fails this test instead of shipping.
    val core = "least(nL, lit(50L)) * (nL - stopsL)"
    val srcDir = java.nio.file.Paths.get("src/main/scala")
    val hits = java.nio.file.Files.walk(srcDir).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p =>
        val txt = read(p.toString)
        Iterator.fill(txt.sliding(core.length).count(_ == core))(p.toString)
      }.toSeq
    assert(hits == Seq("src/main/scala/graft/Graft.scala"),
      s"composite quality score must be defined ONLY in Graft.qualitySignals; found: $hits")
  }

  test("SparkEntry scaladoc states the live counts") {
    val entry = read("src/main/scala/graft/SparkEntry.scala")
    assert(entry.contains(s"$nQueries query ids"),
      s"SparkEntry scaladoc must state '$nQueries query ids'")
    assert(entry.contains(s"$nOracles with DuckDB oracles"),
      s"SparkEntry scaladoc must state '$nOracles with DuckDB oracles'")
  }
}

package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape invariants for the 100 TB axis, enforced in CI — not "did
  * the query answer", but "is this the plan you'd want at 1000×": column
  * pruning reaches the parquet scan, predicates push down, no cartesian
  * products appear anywhere, the attribute merge stays sort-merge (an
  * attribute table is corpus-sized; broadcasting it would OOM the
  * executors), intentionally-small sides do broadcast, and the hot path
  * stays inside whole-stage codegen. These assert against the FORMATTED
  * plan text at sf0.001 — plan shape is scale-free for these properties
  * (pruning/pushdown/hints are decided before size estimates matter; the
  * ones that aren't, like broadcast-vs-SMJ on mid-size tables, are not
  * asserted). */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("tagging reads only (doc_id, text): column pruning reaches the scan") {
    // documents.parquet carries (doc_id, text, lang, source, n_chars); a
    // tag query that read all five would move 100 TB where ~40 TB is due
    val p = plan("tag_gopher")
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(schemas.nonEmpty)
    schemas.foreach { s =>
      val cols = s.split(",").map(_.split(":")(0).trim).toSet
      assert(cols.subsetOf(Set("doc_id", "text")), s"unpruned scan: $s")
    }
  }

  test("predicate pushdown reaches the parquet scan (q2 mktsegment)") {
    val p = plan("q2_join_agg")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      "customer filter not in PushedFilters")
    assert(p.contains("PushedFilters"))
  }

  test("no cartesian product in any headline batch plan") {
    // the scalar 1-row crossJoin in lm_bigram_score plans as a broadcast
    // nested loop, never CartesianProduct — include it in the sweep
    val names = Seq("q1_agg", "q2_join_agg", "q3_window_first_order",
      "q4_broadcast_star", "q7_salted_agg", "tag_gopher", "tag_c4",
      "mixer_filter_scrub", "code_pipeline", "dedup_exact",
      "dedup_minhash_pairs", "dedup_paragraph", "topk_bigrams",
      "ann_cosine_topk", "lm_bigram_score", "analyzer_histogram")
    names.foreach { n =>
      assert(!plan(n).contains("CartesianProduct"), s"cartesian in $n")
    }
  }

  test("attribute merge pins sort-merge join (corpus-sized side must not broadcast)") {
    val p = plan("mixer_filter_scrub")
    assert(p.contains("SortMergeJoin"), "attr merge lost its merge hint")
  }

  test("broadcast where intended: star-join dims build broadcast sides") {
    assert(plan("q4_broadcast_star").contains("BroadcastHashJoin"))
  }

  test("hot aggregation stays inside whole-stage codegen") {
    // explain("codegen") runs the codegen planner and reports how many
    // fused subtrees exist. Under AQE the wrapper defers codegen to stage
    // execution and the explain reads 0, so plan this one without AQE —
    // codegen eligibility is a property of the operators, not of AQE.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = SparkEntry.queries("q1_agg")(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("codegen"))
      val found = "Found (\\d+) WholeStageCodegen".r
        .findFirstMatchIn(p).map(_.group(1).toInt)
      assert(found.exists(_ > 0), s"q1 fell out of codegen: ${p.take(200)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}

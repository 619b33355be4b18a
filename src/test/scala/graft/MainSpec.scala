package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end config-driven pipeline (the spark-submit surface). */
class MainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("config-driven pipeline: tag, dedupe, filter, scrub, metrics, resume") {
    val dir = Files.createTempDirectory("graft-main").toString
    graft.sources.CodeDocs.generate(spark, 200L).toDF()
      .withColumn("id", concat_ws(":", col("repo"), col("path"), col("commit")))
      .write.parquet(s"$dir/input")

    val config =
      s"""{
         |  "input": {"format": "parquet", "path": "$dir/input",
         |            "id": "id", "text": "content"},
         |  "taggers": ["gopher_v2", "pii_regex_with_counts_fast_v2"],
         |  "experiment": "e",
         |  "dedupe": {"enabled": true},
         |  "filter": {"exclude": [
         |    "$$.attributes.e__pii_regex_with_counts_fast_v2__doc_count[0][2] > 5"]},
         |  "span_replacement": [
         |    {"span": "e__pii_regex_with_counts_fast_v2__EMAIL_ADDRESS",
         |     "min_score": 0.5, "replacement": "[EMAIL]"}],
         |  "min_text_length": 1,
         |  "output": {"path": "$dir/out", "format": "parquet"},
         |  "attributes_output": "$dir/attrs",
         |  "metrics_output": "$dir/metrics",
         |  "ledger": "$dir/ledger"
         |}""".stripMargin
    val cfg = new com.fasterxml.jackson.databind.ObjectMapper().readTree(config)

    Main.run(spark, cfg)

    // single evaluation: every document flowed through the tagger battery
    // exactly once despite attrs/output/metrics/ledger all being written
    assert(graft.operators.TagRunner.lastDocsTagged.get.value == 200L)

    val out = spark.read.parquet(s"$dir/out")
    val n1 = out.count()
    assert(n1 > 0)
    assert(out.columns.contains("provenance"))
    assert(out.filter(col("content").rlike("dev\\d+@example\\.com")).count() == 0)

    val attrs = spark.read.parquet(s"$dir/attrs")
    assert(attrs.count() == 200)

    val lineage = spark.read.parquet(s"$dir/metrics/lineage")
    assert(lineage.agg(sum("rows")).as[Long].head() == n1)
    val rules = spark.read.parquet(s"$dir/metrics/rules")
    assert(rules.select("total").as[Long].head() == 200L)

    // ledger is file-grain: one key per input file, not per document
    val ledger = spark.read.parquet(s"$dir/ledger")
    val nInputFiles = spark.read.parquet(s"$dir/input").inputFiles.length
    assert(ledger.count() == nInputFiles)

    // resume: second run sees everything completed → skips entirely,
    // PRESERVING the completed output (no overwrite-with-empty) and doing
    // zero tagging work (the accumulator from run 1 is untouched)
    val accBefore = graft.operators.TagRunner.lastDocsTagged.get
    Main.run(spark, cfg)
    assert(spark.read.parquet(s"$dir/out").count() == n1)
    assert(graft.operators.TagRunner.lastDocsTagged.get eq accBefore)
    assert(accBefore.value == 200L)
  }

  test("partial resume: new input files append; completed files' output kept") {
    val dir = Files.createTempDirectory("graft-main-resume").toString
    Seq(("a", "alpha text here"), ("b", "beta text here"))
      .toDF("id", "content").repartition(1).write.parquet(s"$dir/input")

    val config =
      s"""{
         |  "input": {"format": "parquet", "path": "$dir/input"},
         |  "taggers": ["char_length_v1"],
         |  "experiment": "e",
         |  "output": {"path": "$dir/out", "format": "parquet"},
         |  "attributes_output": "$dir/attrs",
         |  "ledger": "$dir/ledger"
         |}""".stripMargin
    val cfg = new com.fasterxml.jackson.databind.ObjectMapper().readTree(config)
    Main.run(spark, cfg)
    assert(spark.read.parquet(s"$dir/out").count() == 2)

    // a new input file arrives; the resumed run processes ONLY it and
    // appends — prior output survives, nothing is double-processed
    Seq(("c", "gamma text here")).toDF("id", "content")
      .repartition(1).write.mode("append").parquet(s"$dir/input")
    Main.run(spark, cfg)
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 3)
    assert(out.select("id").as[String].collect().sorted.toSeq == Seq("a", "b", "c"))
    assert(graft.operators.TagRunner.lastDocsTagged.get.value == 1L)
    val attrs = spark.read.parquet(s"$dir/attrs")
    assert(attrs.count() == 3)
    assert(attrs.select("id").distinct().count() == 3)
  }

  test("filter syntax=jq: generic jq predicates drive keep/drop end-to-end") {
    val dir = Files.createTempDirectory("graft-main-jq").toString
    Seq(("a", "short text"), ("b", "a considerably longer text body"),
        ("c", "mid-size text"))
      .toDF("id", "content").write.parquet(s"$dir/input")
    val config =
      s"""{
         |  "input": {"format": "parquet", "path": "$dir/input"},
         |  "taggers": ["char_length_v1"],
         |  "experiment": "e",
         |  "filter": {"syntax": "jq", "exclude": [
         |    ".attributes.e__char_length_v1__length[0][-1] > 14"]},
         |  "output": {"path": "$dir/out", "format": "parquet"}
         |}""".stripMargin
    Main.run(spark, new com.fasterxml.jackson.databind.ObjectMapper().readTree(config))
    val kept = spark.read.parquet(s"$dir/out").select("id").as[String].collect().sorted
    // "b" (31 chars) is excluded; "a" (10) and "c" (13) survive
    assert(kept.toSeq == Seq("a", "c"))
  }

  test("dedupe mode=paragraphs: duplicate spans flow to the mixer scrub") {
    val dir = Files.createTempDirectory("graft-main-para").toString
    import spark.implicits._
    Seq(
      ("a", "unique alpha\nshared paragraph text\nmore alpha"),
      ("b", "shared paragraph text\nunique beta"),
      ("c", "all fresh\nnothing shared")
    ).toDF("id", "content").write.parquet(s"$dir/input")

    val config =
      s"""{
         |  "input": {"format": "parquet", "path": "$dir/input"},
         |  "dedupe": {"enabled": true, "mode": "paragraphs",
         |             "attribute_name": "dup_paras"},
         |  "span_replacement": [
         |    {"span": "dup_paras", "min_score": 0.5, "replacement": ""}],
         |  "output": {"path": "$dir/out", "format": "parquet"}
         |}""".stripMargin
    Main.run(spark, new com.fasterxml.jackson.databind.ObjectMapper().readTree(config))

    val out = spark.read.parquet(s"$dir/out")
      .select("id", "content").as[(String, String)].collect().toMap
    // first occurrence (doc a) keeps the paragraph; doc b loses it
    assert(out("a").contains("shared paragraph text"))
    assert(!out("b").contains("shared paragraph text"))
    assert(out("b").contains("unique beta"))
    assert(out("c") == "all fresh\nnothing shared")
  }

  test("input format=table: reads a cataloged/temp-view table; ledger rejected") {
    val dir = Files.createTempDirectory("graft-main-table").toString
    spark.sql("DROP TABLE IF EXISTS graft_out_tbl")
    // a previously-failed run can leave an orphan managed-table location
    val orphan = new java.io.File("spark-warehouse/graft_out_tbl")
    if (orphan.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(orphan)
    }
    Seq(("a", "table-backed alpha row"), ("b", "table-backed beta row"))
      .toDF("id", "content").createOrReplaceTempView("graft_in_tbl")
    val config =
      s"""{
         |  "input": {"format": "table", "path": "graft_in_tbl"},
         |  "taggers": ["char_length_v1"],
         |  "experiment": "e",
         |  "output": {"path": "graft_out_tbl", "format": "table"}
         |}""".stripMargin
    Main.run(spark, new com.fasterxml.jackson.databind.ObjectMapper().readTree(config))
    val out = spark.read.table("graft_out_tbl")
    assert(out.select("id").as[String].collect().sorted.toSeq == Seq("a", "b"))
    // snapshot-vs-ledger: file-grain resume must refuse table input
    val withLedger =
      s"""{
         |  "input": {"format": "table", "path": "graft_in_tbl"},
         |  "output": {"path": "$dir/out2", "format": "parquet"},
         |  "ledger": "$dir/ledger"
         |}""".stripMargin
    val err = intercept[IllegalArgumentException] {
      Main.run(spark, new com.fasterxml.jackson.databind.ObjectMapper().readTree(withLedger))
    }
    assert(err.getMessage.contains("snapshot"))
  }
}

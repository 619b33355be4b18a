package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden end-to-end invariants for the flagship code pipeline
  * (SURVEY.md §7.2; BASELINE north rule: keep/drop + scrubbed text +
  * sha256 pass-through equality). */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val input = graft.sources.CodeDocs.generate(spark, 300L).toDF().cache()
  private lazy val output = SparkEntry.codePipeline(spark, 300L).cache()

  test("pipeline keeps rows and stamps provenance") {
    assert(output.count() > 0)
    val prov = output.select("provenance").as[String].head()
    assert(prov.matches("codedocs:\\d+"))
  }

  test("exact duplicates are dropped (first occurrence kept)") {
    val outIds = output.select("id").as[String].collect().toSet
    val dupPairs = input
      .withColumn("ordinal", monotonically_increasing_id())
      .groupBy(sha2(col("content"), 256))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
    // every duplicated content appears at most once in the output
    val outBySha = output.groupBy(sha2(col("content"), 256)).count()
      .filter(col("count") > 1).count()
    // PII scrub may merge shas, but identical inputs can't both survive
    val survivors = input.withColumn("id",
        concat_ws(":", col("repo"), col("path"), col("commit")))
      .withColumn("sha", sha2(col("content"), 256))
      .join(output.select(col("id")), Seq("id"), "left_semi")
      .groupBy("sha").count().filter(col("count") > 1).count()
    assert(survivors == 0)
  }

  test("sha256 pass-through equality for rows without scrubbed spans") {
    // rows whose content has no PII markers must pass through bit-identical
    val joined = input
      .withColumn("id", concat_ws(":", col("repo"), col("path"), col("commit")))
      .select(col("id"), col("content").as("original"))
      .join(output.select(col("id"), col("content")), "id")
    val unscrubbed = joined.filter(!col("original").contains("@") &&
      !col("original").rlike("\\d{3}\\) \\d{3}-\\d{4}") &&
      !col("original").rlike("\\d+\\.\\d+\\.\\d+\\.\\d+") &&
      !col("original").rlike("hate|stupid|idiot|trash|garbage|awful"))
    val mismatches = unscrubbed
      .filter(sha2(col("original"), 256) =!= sha2(col("content"), 256)).count()
    assert(unscrubbed.count() > 0)
    assert(mismatches == 0)
  }

  test("PII-bearing survivors are scrubbed (no raw emails/ips remain)") {
    val leaked = output.filter(col("content").rlike(
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")).count()
    assert(leaked == 0)
  }

  test("toxicity scrub: toxic comment paragraphs removed from survivors") {
    val toxicSurvivors = output.filter(
      col("content").rlike("(hate|stupid|idiot|trash|garbage|awful) (hate|stupid|idiot|trash|garbage|awful)")).count()
    assert(toxicSurvivors == 0)
    // ...and the input did contain such paragraphs
    val toxicInputs = input.filter(
      col("content").rlike("(hate|stupid|idiot|trash|garbage|awful) (hate|stupid|idiot|trash|garbage|awful)")).count()
    assert(toxicInputs > 0)
  }

  test("pipeline is deterministic across runs") {
    val again = SparkEntry.codePipeline(spark, 300L)
    val a = output.select(col("id"), sha2(col("content"), 256).as("sha"))
    val b = again.select(col("id"), sha2(col("content"), 256).as("sha"))
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
  }

  test("resumability: output restricted to a partition subset equals full-run subset") {
    // checkpoint semantics: re-running over the unfinished remainder and
    // unioning with completed partitions reproduces the full output
    val ids = input.withColumn("id",
      concat_ws(":", col("repo"), col("path"), col("commit"))).select("id")
    val half = ids.filter(xxhash64(col("id")) % 2 === 0)
    val fullOut = output.join(half, Seq("id"), "left_anti")
    val resumed = SparkEntry.codePipeline(spark, 300L).join(half, Seq("id"), "left_anti")
    assert(fullOut.select("id").exceptAll(resumed.select("id")).count() == 0)
  }
}

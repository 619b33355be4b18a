package graft

import graft.mixer.PredicateCompiler
import graft.operators.TagRunner
import graft.runtime.Checkpoint
import graft.sources.Jsonl
import graft.taggers.{AbpBlocker, AbpUrlTagger}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class RuntimeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("predicate compiler: jq-shaped predicates over attribute maps") {
    val df = Seq(("a", "This is a test with the and that and have with more words here"),
      ("b", "tiny")).toDF("id", "content")
    val attrs = TagRunner.tag(df, Seq("gopher_v2"), "t", roundScores = false)
    val kept = attrs.filter(PredicateCompiler.compile(
      "$.attributes.t__gopher_v2__word_count[0][2] > 5"))
      .select("id").as[String].collect().toSet
    assert(kept == Set("a"))
    // negative index, field selector, boolean ops, null→false
    val c2 = PredicateCompiler.compile(
      "$.attributes.t__gopher_v2__word_count[-1].score > 5 && !($.attributes.missing__x[0][2] > 0)")
    assert(attrs.filter(c2).select("id").as[String].collect().toSet == Set("a"))
    // bare path truthiness: attribute exists
    val c3 = PredicateCompiler.compile("$.attributes.t__gopher_v2__word_count")
    assert(attrs.filter(c3).count() == 2)
    val c4 = PredicateCompiler.compile("$.attributes.not_there")
    assert(attrs.filter(c4).count() == 0)
  }

  test("checkpoint ledger: resume skips completed work units") {
    val dir = Files.createTempDirectory("graft-ckpt").toString + "/ledger"
    val ckpt = Checkpoint(spark, dir)
    val work = (1 to 10).map(i => s"shard-$i").toDF("key")
    assert(ckpt.pending(work, "key").count() == 10)
    ckpt.commit(Seq("shard-1", "shard-2").toDF("key"), "key", rowsWritten = 100L)
    val pending = ckpt.pending(work, "key").as[String].collect().toSet
    assert(pending == (3 to 10).map(i => s"shard-$i").toSet)
    // idempotent re-commit
    ckpt.commit(Seq("shard-2", "shard-3").toDF("key"), "key", rowsWritten = 50L)
    assert(ckpt.pending(work, "key").count() == 7)
  }

  test("jsonl roundtrip: dolma attribute format preserved") {
    val df = Seq(("d1", "hello world of text")).toDF("id", "content")
    val attrs = TagRunner.tag(df, Seq("char_length_v1"), "e")
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/attrs"
    Jsonl.writeAttributes(attrs, dir)
    val back = Jsonl.readAttributes(spark, dir)
    val spans = back.select(explode(col("attributes"))).as[(String, Seq[(Long, Long, Double)])]
      .collect().toMap
    assert(spans("e__char_length_v1__length") == Seq((0L, 19L, 19.0)))
  }

  test("url blocklist: ABP host-anchor covers the subdomain suffix chain") {
    val t = new AbpUrlTagger("t",
      new AbpBlocker(Seq("||bad.example.com^", "||ads.net^")))
    assert(t.predict("x", Map("url" -> "https://bad.example.com/path?q=1")).nonEmpty)
    assert(t.predict("x", Map("url" -> "http://sub.bad.example.com:8080/x")).nonEmpty)
    assert(t.predict("x", Map("url" -> "https://tracker.ads.net/pixel")).nonEmpty)
    assert(t.predict("x", Map("url" -> "https://good.example.com/")).isEmpty)
    assert(t.predict("x", Map("url" -> "https://example.com/")).isEmpty)
    assert(t.predict("x", Map.empty).isEmpty)
  }

  test("multimodal: feature extraction plumbing over binary payloads") {
    val media = graft.multimodal.Multimodal.syntheticMedia(spark, 30L)
    val feats = graft.multimodal.Multimodal.extractFeatures(media)
    assert(feats.count() == 30)
    val row = feats.filter(col("media_type") === "video").head()
    assert(row.getAs[Int]("n_frames") >= 1)
    assert(row.getAs[scala.collection.Seq[Float]]("embedding").length == 16)
    // deterministic
    val again = graft.multimodal.Multimodal.extractFeatures(media)
    assert(feats.exceptAll(again).count() == 0)
  }

  test("streaming: stateful sessionization with flatMapGroupsWithState") {
    val dir = Files.createTempDirectory("graft-sess").toString
    val gap = 1800000000L
    // user 1: two sessions (gap between event 2 and 3); user 2: one open
    Seq((1L, 0L), (1L, 1000L), (1L, gap * 2), (2L, 5L))
      .toDF("user_id", "us").write.parquet(dir + "/in")
    val schema = spark.read.parquet(dir + "/in").schema
    val stream = spark.readStream.schema(schema).parquet(dir + "/in")
      .as[(Long, Long)]
    val sessions = graft.streaming.StreamingTagger.sessionize(stream)
      .toDF("user_id", "session_start", "n_events")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // only user 1's FIRST session is closed (emitted); the rest stay open
    val out = spark.table("sessions").as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 0L, 2L)))
  }

  test("streaming: fused tagger battery over a stream (AvailableNow)") {
    val dir = Files.createTempDirectory("graft-stream").toString
    Seq(("s1", "hello streaming world"), ("s2", "more text arrives"))
      .toDF("id", "content").write.parquet(dir + "/in")
    val schema = spark.read.parquet(dir + "/in").schema
    val stream = spark.readStream.schema(schema).parquet(dir + "/in")
    val tagged = graft.streaming.StreamingTagger.tagStream(
      stream, Seq("char_length_v1"), "s")
    val q = graft.streaming.StreamingTagger.runAvailableNow(spark, tagged, "tagged_stream")
    q.awaitTermination()
    val out = spark.table("tagged_stream")
    assert(out.count() == 2)
    val m = out.filter(col("id") === "s1").head().getMap[String, Any](1)
    assert(m.contains("s__char_length_v1__length"))
  }
}

package graft

import graft.mixer.{Mixer, PredicateCompiler}
import graft.operators.TagRunner
import graft.runtime.{Checkpoint, Metrics}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** spark-submit entrypoint: runs the tag → dedupe → mix pipeline from a
  * JSON config (shape mirrors the reference's mixer/tagger configs —
  * /root/reference/src/shard.rs:533-546 StreamConfig — adapted to tables).
  *
  * {{{
  * spark-submit --class graft.Main dolmaspark.jar -c pipeline.json
  * }}}
  *
  * Config:
  * {{{
  * {
  *   "input":   {"format": "parquet", "path": "...", "id": "id", "text": "content"},
  *   "taggers": ["gopher_v2", "pii_regex_with_counts_fast_v2"],
  *   "experiment": "exp",
  *   "dedupe":  {"enabled": true},
  *   "filter":  {"include": [], "exclude": ["$.attributes.exp__...[0][2] > 0.5"]},
  *   "span_replacement": [{"span": "exp__...__EMAIL_ADDRESS", "min_score": 0.5,
  *                         "replacement": "[EMAIL]"}],
  *   "min_text_length": 1,
  *   "output":  {"path": "...", "format": "parquet"},
  *   "attributes_output": "...",   // optional
  *   "metrics_output": "...",      // optional: lineage + rule metrics
  *   "ledger": "..."               // optional: resume checkpoint
  * }
  * }}}
  */
object Main {

  def main(args: Array[String]): Unit = {
    val configPath = args.sliding(2).collectFirst { case Array("-c", p) => p }
      .getOrElse(sys.error("usage: graft.Main -c <config.json>"))
    val cfg = new ObjectMapper().readTree(
      java.nio.file.Files.readString(java.nio.file.Paths.get(configPath)))

    val spark = SparkSession.builder()
      .appName("graft-pipeline")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, cfg) finally spark.stop()
  }

  def run(spark: SparkSession, cfg: JsonNode): Unit = {
    val input = cfg.get("input")
    val idColName = opt(input, "id").getOrElse("id")
    val textColName = opt(input, "text").getOrElse("content")
    val raw = opt(input, "format").getOrElse("parquet") match {
      case "jsonl" => graft.sources.Jsonl.readDocuments(spark, input.get("path").asText())
      case _ => spark.read.parquet(input.get("path").asText())
    }
    var docs = raw
      .withColumnRenamed(idColName, "id")
      .withColumnRenamed(textColName, "content")
      // capture provenance columns at scan time — after joins the scan is
      // no longer the unique source for input_file_name()
      .withColumn("__file", input_file_name())
      .withColumn("__ord", monotonically_increasing_id())

    // resume: drop already-completed ids
    val ledger = Option(cfg.get("ledger")).map(n => Checkpoint(spark, n.asText()))
    ledger.foreach { l => docs = l.pending(docs, "id") }

    // tag (fused battery)
    val taggers = Option(cfg.get("taggers")).map(_.elements().asScala.map(_.asText()).toSeq)
      .getOrElse(Seq.empty)
    val experiment = opt(cfg, "experiment").getOrElse("exp")
    val attrs =
      if (taggers.nonEmpty) Some(TagRunner.tag(docs, taggers, experiment)) else None

    attrs.foreach { a =>
      Option(cfg.get("attributes_output")).foreach(p =>
        a.write.mode("overwrite").parquet(p.asText()))
    }

    // dedupe (exact, first occurrence)
    val dedupEnabled = Option(cfg.get("dedupe")).exists(d =>
      Option(d.get("enabled")).forall(_.asBoolean(true)))
    var withAttrs = Mixer.mergeAttributes(docs, attrs.toSeq)
    if (dedupEnabled) {
      withAttrs = graft.dedup.Dedup.markDuplicates(
        withAttrs, sha2(col("content"), 256), col("__ord"))
    }

    // mix
    val filterNode = Option(cfg.get("filter"))
    def preds(kind: String): Seq[org.apache.spark.sql.Column] =
      filterNode.flatMap(f => Option(f.get(kind))).map(_.elements().asScala.map { n =>
        val s = n.asText()
        if (s == "is_duplicate") col("is_duplicate") else PredicateCompiler.compile(s)
      }.toSeq).getOrElse(Seq.empty)
    val exclude = preds("exclude") ++ (if (dedupEnabled) Seq(col("is_duplicate")) else Nil)

    val replacements = Option(cfg.get("span_replacement")).map(_.elements().asScala.map { r =>
      Mixer.SpanReplacementRule(
        r.get("span").asText(),
        Option(r.get("min_score")).map(_.asDouble()).getOrElse(Double.NegativeInfinity),
        Option(r.get("max_score")).map(_.asDouble()).getOrElse(Double.PositiveInfinity),
        Option(r.get("replacement")).map(_.asText()).getOrElse(""))
    }.toSeq).getOrElse(Seq.empty)

    val mixCfg = Mixer.MixerConfig(
      include = preds("include"),
      exclude = exclude,
      spanReplacements = replacements,
      discardFields = Seq("is_duplicate"),
      minTextLength = Option(cfg.get("min_text_length")).map(_.asInt()).getOrElse(0))

    val mixed = Mixer.mix(withAttrs, mixCfg,
        element_at(split(col("__file"), "/"), -1), col("__ord"))
      .drop("attributes", "__ord", "__file")

    // metrics + lineage
    Option(cfg.get("metrics_output")).foreach { p =>
      Metrics.partitionLineage(mixed, col("id"))
        .write.mode("overwrite").parquet(p.asText() + "/lineage")
      Metrics.ruleMetrics(withAttrs,
        (if (dedupEnabled) Seq("dropped_duplicate" -> col("is_duplicate")) else Nil))
        .write.mode("overwrite").parquet(p.asText() + "/rules")
    }

    val out = cfg.get("output")
    opt(out, "format").getOrElse("parquet") match {
      case "jsonl" => graft.sources.Jsonl.writeDocuments(mixed, out.get("path").asText())
      case _ => mixed.write.mode("overwrite").parquet(out.get("path").asText())
    }

    // ledger commit (idempotent append)
    ledger.foreach(_.commit(mixed.select(col("id")), "id", rowsWritten = -1L))
  }

  private def opt(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).map(_.asText())
}

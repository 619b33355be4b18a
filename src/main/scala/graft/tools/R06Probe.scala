package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r06): stage-by-stage decomposition of hot queries — times
  * each prefix of a pipeline with the noop sink so the increment isolates
  * one operator (guide §1.4). */
object R06Probe {
  def time(label: String, reps: Int)(mk: => DataFrame): Unit = {
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[r06] $label%-40s min=${ts.min}%7.3fs all=${ts.map(t => f"$t%.3f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", graft.runtime.TmpFs.sparkLocalDir("graft-r06probe"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    import graft.operators.TagRunner
    import graft.mixer.Mixer
    import graft.dedup.Dedup

    def docs = s.read.parquet(s"$sfDir/documents.parquet")
    def withPii(d: DataFrame) = d.withColumn("text2",
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact dev"), col("doc_id"),
          lit("@mail.example.org now. Call (555) 123-4567 or ping 192.168.1.42 ok.")))
        .otherwise(col("text")))

    time("scan only", reps)(docs)
    time("scan+pii text2", reps)(withPii(docs))
    def d0 = withPii(docs)
      .withColumn("id", col("doc_id").cast("string"))
      .select(col("id"), col("doc_id"), col("text2").as("content"))
    def taggedDocs = TagRunner.withAttributes(d0,
      Seq("gopher_v2", "pii_regex_with_counts_fast_v2"), "exp", textCol = "content")
    time("tag battery (withAttributes)", reps)(taggedDocs)
    def merged = Dedup.markDuplicates(taggedDocs, md5(col("content")), col("doc_id"))
    time("tag+dedup window", reps)(merged)
    val cfg = Mixer.MixerConfig(
      exclude = Seq(
        col("is_duplicate"),
        TagRunner.attrScore("exp__gopher_v2__word_count") < 40,
        TagRunner.attrScore("exp__pii_regex_with_counts_fast_v2__doc_count") > 5),
      spanReplacements = Seq(
        Mixer.SpanReplacementRule("exp__pii_regex_with_counts_fast_v2__EMAIL_ADDRESS", template = "[EMAIL]"),
        Mixer.SpanReplacementRule("exp__pii_regex_with_counts_fast_v2__PHONE_NUMBER", template = "[PHONE]"),
        Mixer.SpanReplacementRule("exp__pii_regex_with_counts_fast_v2__IP_ADDRESS", template = "[IP]")),
      discardFields = Seq("is_duplicate"),
      minTextLength = 1)
    time("tag+dedup+mix", reps)(Mixer.mix(merged, cfg, lit("documents"), col("doc_id")))
    time("full code_pipeline", reps)(
      Mixer.mix(merged, cfg, lit("documents"), col("doc_id"))
        .select(col("doc_id"), sha2(col("content"), 256).as("content_sha"),
          octet_length(col("content")).cast("long").as("content_bytes")))

    // topk_bigrams decomposition
    def words(c: org.apache.spark.sql.Column) =
      filter(split(lower(c), "\\s+"), (w: org.apache.spark.sql.Column) => w =!= "")
    time("bigrams: tokenize only", reps)(
      docs.select(words(col("text")).as("__toks")))
    time("bigrams: explode grams", reps) {
      val toks = col("__toks")
      val starts = sequence(lit(0), greatest(size(toks) - 2, lit(0)), lit(1))
      val ngrams = when(size(toks) < 2, array().cast("array<string>"))
        .otherwise(transform(starts, x => concat_ws(" ", slice(toks, x + 1, lit(2)))))
      docs.select(words(col("text")).as("__toks")).select(explode(ngrams).as("ngram"))
    }
    time("bigrams: hash+count", reps) {
      val toks = col("__toks")
      val starts = sequence(lit(0), greatest(size(toks) - 2, lit(0)), lit(1))
      val ngrams = when(size(toks) < 2, array().cast("array<string>"))
        .otherwise(transform(starts, x => concat_ws(" ", slice(toks, x + 1, lit(2)))))
      docs.select(words(col("text")).as("__toks")).select(explode(ngrams).as("ngram"))
        .select(xxhash64(col("ngram")).as("h1"), hash(col("ngram")).as("h2"))
        .groupBy(col("h1"), col("h2")).agg(count(lit(1)).as("cnt"))
    }
    time("topk_bigrams full", reps)(
      graft.functions.Analyzer.topKNgrams(docs, col("text"), n = 2, k = 20))

    // jaccard ngram decomposition
    time("jaccard: shingle sets", reps) {
      import graft.dedup.MinHashLSH
      docs.select(col("doc_id").cast("string").as("id"),
        MinHashLSH.tokens(col("text")).as("__toks"))
        .select(col("id"), array_sort(MinHashLSH.shingleHashesOfTokens(col("__toks"), 4)).as("sh"))
    }
    time("dedup_jaccard_ngram full", reps)(
      graft.dedup.MinHashLSH.exactJaccardPairs(docs,
        col("doc_id").cast("string"), col("text"), k = 4, minJaccard = 0.6,
        prefixFilter = true))

    // minhash decomposition
    import graft.dedup.MinHashLSH
    time("minhash: signatures only", reps)(
      docs.select(col("doc_id").cast("string").as("id"),
        MinHashLSH.signature(col("text"), 5, 32).as("sig")))
    time("minhash: banded buckets", reps)(
      MinHashLSH.bandedBuckets(docs, col("doc_id").cast("string"), col("text"),
        k = 5, numPerms = 32, bands = 16))
    time("minhash: candidates", reps)(
      MinHashLSH.nearDuplicatePairs(docs, col("doc_id").cast("string"), col("text"),
        k = 5, numPerms = 32, bands = 16, minJaccard = math.max(0.0, 0.5 - 3.0 * math.sqrt(0.25 / 32))))
    val nc = MinHashLSH.nearDuplicatePairs(docs, col("doc_id").cast("string"), col("text"),
      k = 5, numPerms = 32, bands = 16, minJaccard = math.max(0.0, 0.5 - 3.0 * math.sqrt(0.25 / 32))).count()
    println(s"[r06] minhash candidate pairs: $nc")
    time("dedup_minhash_pairs full", reps)(
      MinHashLSH.verifiedNearDuplicatePairs(docs,
        col("doc_id").cast("string"), col("text"), k = 5, numPerms = 32,
        bands = 16, minJaccard = 0.5))
    spark.stop()
  }
}

package graft

import graft.dedup.{Dedup, MinHashLSH, SimHash}
import graft.functions.Analyzer
import graft.mixer.Mixer
import graft.operators.TagRunner
import graft.similarity.Ann
import graft.sources.CodeDocs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator family
  * (SURVEY.md §2), each with DuckDB-equivalent `oracleSql` where the
  * semantics are ANSI-SQL-expressible (operators whose value is the custom
  * engine itself — minhash, simhash, fastText, KenLM, the code pipeline —
  * are rows-only here and exact-value-tested in ScalaTest instead).
  */
object SparkEntry {

  // ---- helpers ------------------------------------------------------

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def lineitem(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")

  /** Python-split word list of a text column (drops empties). */
  private def words(c: Column): Column =
    filter(split(c, "\\s+"), w => w =!= "")

  /** PII-bearing variant of the documents text, synthesized identically in
    * Spark and the DuckDB oracle (docs have no natural PII). */
  private def withPiiText(d: DataFrame): DataFrame =
    d.withColumn("text2",
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact dev"), col("doc_id"),
          lit("@mail.example.org now. Call (555) 123-4567 or ping 192.168.1.42 ok.")))
        .otherwise(col("text")))

  private val PiiText2Sql =
    """CASE WHEN doc_id % 3 = 0
      | THEN text || ' contact dev' || doc_id ||
      |      '@mail.example.org now. Call (555) 123-4567 or ping 192.168.1.42 ok.'
      | ELSE text END""".stripMargin.replace("\n", " ")

  /** Tag the documents table and return one row per doc with the named
    * attribute scores as columns. */
  private def tagged(s: SparkSession, dir: String, taggers: Seq[String],
      scoreCols: Seq[(String, String, String)] /* (tagger, type, outName) */,
      asLong: Set[String] = Set.empty): DataFrame = {
    val d = docs(s, dir).withColumn("id", col("doc_id").cast("string"))
    val attrs = TagRunner.tag(d, taggers, "t", idCol = "id", textCol = "text",
      roundScores = false)
    val sel = col("id").cast("long").as("doc_id") +: scoreCols.map {
      case (tg, typ, out) =>
        val c = TagRunner.attrScore(graft.core.Attributes.mangle("t", tg, typ))
        (if (asLong.contains(out)) c.cast("long") else c).as(out)
    }
    attrs.select(sel: _*)
  }

  // ---- flagship ------------------------------------------------------

  /** Flagship: the full dolma-shaped pipeline (tag → dedupe → mix) over the
    * synthetic code-file corpus (BASELINE input_hint shape) at sf0.001. */
  def entry(spark: SparkSession): DataFrame = codePipeline(spark, 2000L)

  /** tag → dedupe → mix over `n` synthetic code docs: the SURVEY §7.2
    * minimum end-to-end slice. Attributes are computed INLINE in the same
    * narrow pass as the scan (TagRunner.withAttributes) — no attribute
    * join; the dedup window is the pipeline's only shuffle. */
  def codePipeline(spark: SparkSession, n: Long): DataFrame = {
    val docsDs = CodeDocs.generate(spark, n).toDF()
      .withColumn("id", concat_ws(":", col("repo"), col("path"), col("commit")))
      .withColumn("ordinal", monotonically_increasing_id())

    // tag: quality + PII + repetitions + toxicity, fused in one
    // mapPartitions pass (model weights initialized once per partition)
    // tokenizer_repetitions_v2r2 is the reference's production choice
    // (configs/dolma-v1_6/mixing/stack.yaml:363-375) and ~10x faster than
    // the backtracking char-regex variant
    val tagged = TagRunner.withAttributes(docsDs,
      Seq("gopher_v2", "code_redpajama_taggers_v1", "pii_regex_with_counts_fast_v2",
        "tokenizer_repetitions_v2r2", "code_copyright_comments_v1",
        "jigsaw_toxicity_paragraph_v1"),
      "exp", textCol = "content")

    // dedupe: exact content dedup, first occurrence wins (only shuffle)
    val merged = Dedup.markDuplicates(
      tagged, sha2(col("content"), 256), col("ordinal"))
    val cfg = Mixer.MixerConfig(
      exclude = Seq(
        col("is_duplicate"),
        TagRunner.attrScore("exp__code_redpajama_taggers_v1__max_line_length_doc") > 1000,
        TagRunner.attrScore("exp__pii_regex_with_counts_fast_v2__doc_count") > 5,
        TagRunner.attrScore("exp__tokenizer_repetitions_v2r2__doc_max_score_repetition") >= 100,
        TagRunner.attrScore("exp__gopher_v2__fraction_of_duplicate_lines") > 0.5),
      spanReplacements = Seq(
        Mixer.SpanReplacementRule("exp__pii_regex_with_counts_fast_v2__EMAIL_ADDRESS", template = " |||EMAIL||| "),
        Mixer.SpanReplacementRule("exp__pii_regex_with_counts_fast_v2__PHONE_NUMBER", template = " |||PHONE||| "),
        Mixer.SpanReplacementRule("exp__pii_regex_with_counts_fast_v2__IP_ADDRESS", template = " |||IP||| "),
        // toxicity scrub: delete paragraphs the classifier marks toxic
        Mixer.SpanReplacementRule("exp__jigsaw_toxicity_paragraph_v1__toxic",
          minScore = 0.8, template = "")),
      discardFields = Seq("is_duplicate"),
      minTextLength = 1)
    Mixer.mix(merged, cfg, lit("codedocs"), col("ordinal"))
      .select(col("id"), col("repo"), col("lang"), col("content"), col("provenance"))
  }

  // ---- queries -------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- generic relational core (scan/filter/agg/join/window/limit) --
    "q1_agg" -> ((s, dir) => {
      lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).as("price_cents"))
    }),

    "q2_join_agg" -> ((s, dir) => {
      val li = lineitem(s, dir)
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
        .filter(col("c_mktsegment") === "BUILDING")
      // examined r6, left as-is: pre-joining orders with the broadcast
      // customer filter and broadcasting the result removes the lineitem
      // shuffle HERE, but the filtered build side is corpus-proportional
      // (only broadcastable below the 8 GB bound) and the extra
      // broadcast-build job measurably regressed the bench (0.41→0.67 s);
      // at 100 TB the production lever is the runtime Bloom filter
      // (SPARK-32268) pre-filtering lineitem before its exchange.
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long"))
            .as("revenue_cents"))
    }),

    "q3_window_first_order" -> ((s, dir) => {
      // "first row per key" as a map-side-combinable aggregate (guide
      // §2.3 "aggregate before you shuffle"): min over the lexicographic
      // (o_orderdate, o_orderkey) struct IS the row_number()=1 row of the
      // ORDER BY (o_orderdate, o_orderkey) window — but the shuffle now
      // carries one partially-aggregated struct per (task × custkey)
      // instead of every order row, and the per-partition sort the window
      // needed disappears entirely.
      val o = s.read.parquet(s"$dir/orders.parquet")
      o.groupBy(col("o_custkey"))
        .agg(min(struct(col("o_orderdate"), col("o_orderkey"))).as("__first"))
        .select(col("o_custkey"), col("__first.o_orderkey").as("first_orderkey"))
    }),

    "q4_broadcast_star" -> ((s, dir) => {
      val sup = s.read.parquet(s"$dir/supplier.parquet")
      val nat = s.read.parquet(s"$dir/nation.parquet")
      val reg = s.read.parquet(s"$dir/region.parquet")
      sup.join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(floor(col("s_acctbal") * 100).cast("long")).as("acctbal_cents"))
    }),

    "q5_events_window" -> ((s, dir) => {
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("bucket", expr("unix_micros(cast(ts as timestamp)) div 300000000"))
        .groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100).cast("long")).as("value_cents"))
    }),

    // salted two-stage aggregation (skew path) must equal a plain groupBy
    "q7_salted_agg" -> ((s, dir) =>
      graft.operators.Salted.groupByWithSalt(
        docs(s, dir), col("source"),
        Seq((col("n_chars"), "total_chars")), saltBuckets = 8)
        .select(col("key").as("source"), col("n"), col("total_chars"))),

    "q6_sessionize" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("us", expr("unix_micros(cast(ts as timestamp))"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      ev.withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // equal-count "infer" tracker (binning.py:264-390) as a distributed
    // typed Aggregator: value stream bounded to <=97 distincts so the
    // tracker stays exact and the summary is a plain GROUP BY to DuckDB
    "analyzer_infer_tracker" -> ((s, dir) => {
      import s.implicits._
      val agg = new graft.functions.Binning.InferSummaryAgg(1 << 20, 1000)
      val vals = docs(s, dir)
        .select((size(words(col("text"))) % 97).cast("double").as("v"))
        .as[Double]
      vals.select(agg.toColumn.name("s"))
        .select(explode(arrays_zip(col("bins").as("bin"),
          col("counts").as("cnt"))).as("z"))
        .select(col("z.bin").as("bin"), col("z.cnt").as("cnt"))
        .orderBy(col("bin"))
    }),

    // the analyzer's real shape: tag -> explode spans -> per-ATTRIBUTE
    // tracker aggregation (groupByKey + typed Aggregator, tracker merge
    // as the map-side combiner). Exact while distinct values <= capacity,
    // so totals/sums/bin counts reduce to SQL aggregates.
    "analyzer_grouped_summary" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).withColumn("id", col("doc_id").cast("string"))
      val attrs = TagRunner.tag(d, Seq("gopher_v2"), "t",
        idCol = "id", textCol = "text", roundScores = false)
      val exploded = TagRunner.explodeAttributes(attrs)
        .filter(col("attr").isin(
          "t__gopher_v2__word_count", "t__gopher_v2__required_word_count"))
      val agg = new graft.functions.Binning.InferSummaryAgg(1 << 20, 1000)
      exploded.select(col("attr"), col("score")).as[(String, Double)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(agg.toColumn.name("s"))
        .toDF("attr", "s")
        .select(col("attr"),
          col("s.total").as("total"),
          col("s.sum").cast("long").as("sum_scores"),
          size(col("s.bins")).cast("long").as("n_bins"))
        .orderBy(col("attr"))
    }),

    "analyzer_quantiles" -> ((s, dir) =>
      docs(s, dir).groupBy(col("source"))
        .agg(
          expr("percentile(n_chars, array(0.25, 0.5, 0.75))").as("q"),
          count(lit(1)).as("n"))
        .select(col("source"),
          col("q").getItem(0).as("q25"), col("q").getItem(1).as("q50"),
          col("q").getItem(2).as("q75"), col("n"))),

    // -- tagger battery over documents (mapPartitions-fused) --
    // model-backed toxicity tagging over planted per-residue texts: the
    // in-repo classifier scores the toxic template 0.84+ and every clean
    // template <= 0.51, so the 0.7 doc-rollup threshold recovers the
    // plant exactly (oracle = doc_id arithmetic)
    "tag_toxicity_ft" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("id", col("doc_id").cast("string"))
        .withColumn("text2",
          when(col("doc_id") % 7 === 0,
            lit("hate stupid idiot trash garbage awful hate stupid"))
            .when(col("doc_id") % 7 === 1,
              lit("the function returns a list of sorted values from the input stream"))
            .when(col("doc_id") % 7 === 2,
              lit("import os and read the configuration file before parsing arguments"))
            .when(col("doc_id") % 7 === 3,
              lit("this module implements a simple cache with least recently used eviction"))
            .when(col("doc_id") % 7 === 4,
              lit("def compute(x): return x + 1"))
            .when(col("doc_id") % 7 === 5,
              lit("careful analysis of the data reveals a stable trend over time"))
            .otherwise(lit("the parser emits one record per line of the input file")))
      val attrs = TagRunner.tag(d, Seq("jigsaw_toxicity_paragraph_v1"), "t",
        idCol = "id", textCol = "text2", roundScores = false)
      attrs.select(col("id").cast("long").as("doc_id"),
        TagRunner.attrScore("t__jigsaw_toxicity_paragraph_v1__doc_toxic").as("doc_toxic"))
        .withColumn("is_toxic", (col("doc_toxic") > 0.7).cast("long"))
        .select(col("doc_id"), col("is_toxic"))
    }),

    "tag_lengths" -> ((s, dir) =>
      tagged(s, dir,
        Seq("char_length_v1", "char_length_strip_ws_v1", "bytes_length_v1",
          "whitespace_tokenizer_v1"),
        Seq(
          ("char_length_v1", "length", "char_len"),
          ("char_length_strip_ws_v1", "length_no_ws", "char_len_strip"),
          ("bytes_length_v1", "bytes", "byte_len"),
          ("whitespace_tokenizer_v1", "length", "ws_segments")),
        asLong = Set("char_len", "char_len_strip", "byte_len", "ws_segments"))),

    // multi-line text is synthesized (same trick as tag_c4_spans) so the
    // duplicate-line attributes are exercised NON-trivially: " dup "
    // markers become standalone "dup" lines, and a third of the docs get
    // an explicitly repeated line appended
    "tag_gopher" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("id", col("doc_id").cast("string"))
        .withColumn("text2", concat(
          regexp_replace(col("text"), " dup ", "\ndup\n"),
          when(col("doc_id") % 3 === 0,
            lit("\nrepeated trailer line\nrepeated trailer line"))
            .otherwise(lit(""))))
      val attrs = TagRunner.tag(d, Seq("gopher_v2"), "t", idCol = "id",
        textCol = "text2", roundScores = false)
      def sc(typ: String) =
        TagRunner.attrScore(graft.core.Attributes.mangle("t", "gopher_v2", typ))
      attrs.select(
        col("id").cast("long").as("doc_id"),
        sc("word_count").cast("long").as("word_count"),
        sc("median_word_length").as("median_word_length"),
        sc("symbol_to_word_ratio").as("symbol_to_word_ratio"),
        sc("fraction_of_words_with_alpha_character").as("frac_alpha"),
        sc("required_word_count").cast("long").as("required_word_count"),
        sc("fraction_of_duplicate_lines").as("frac_dup_lines"),
        sc("fraction_of_characters_in_duplicate_lines").as("frac_dup_chars"))
    }),

    // naughty-word coverage: plant real entries from the vendored
    // reference list (a phrase, a word, and a word-level MISS with
    // trailing punctuation) — the oracle recomputes from the full list,
    // so accidental hits in the base text are also covered exactly
    "tag_c4" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("id", col("doc_id").cast("string"))
        .withColumn("text2", concat(col("text"),
          when(col("doc_id") % 5 === 0, lit(" Alabama hot pocket"))
            .when(col("doc_id") % 7 === 0, lit(" anus"))
            .when(col("doc_id") % 11 === 0, lit(" anus,"))
            .otherwise(lit(""))))
      val attrs = TagRunner.tag(d, Seq("c4_v2"), "t", idCol = "id", textCol = "text2",
        roundScores = false)
      attrs.select(
        col("id").cast("long").as("doc_id"),
        size(TagRunner.attrSpans("t__c4_v2__has_curly_brace")).cast("long").as("has_curly"),
        size(TagRunner.attrSpans("t__c4_v2__has_lorem_ipsum")).cast("long").as("has_lorem"),
        size(TagRunner.attrSpans("t__c4_v2__has_javascript")).cast("long").as("has_js"),
        size(TagRunner.attrSpans("t__c4_v2__has_naughty_word")).cast("long").as("has_naughty"),
        TagRunner.attrScore("t__c4_v2__line_count").cast("long").as("line_count"),
        size(TagRunner.attrSpans("t__c4_v2__lines_with_too_few_words")).cast("long").as("short_lines"),
        size(TagRunner.attrSpans("t__c4_v2__lines_with_no_ending_punctuation")).cast("long").as("unpunct_lines"))
    }),

    // exploded c4_v1 line spans with exact code-point offsets: documents
    // are single-line, so synthesize newlines deterministically in both
    // engines and compare every span boundary
    "tag_c4_spans" -> ((s, dir) => {
      val d = docs(s, dir)
        .withColumn("id", col("doc_id").cast("string"))
        .withColumn("text2", regexp_replace(col("text"), " dup ", "\ndup\n"))
      val attrs = TagRunner.tag(d, Seq("c4_v1"), "t", idCol = "id", textCol = "text2",
        roundScores = false)
      attrs.select(col("id").cast("long").as("doc_id"),
          explode(TagRunner.attrSpans("t__c4_v1__lines_with_too_few_words")).as("s"))
        .select(col("doc_id"), col("s.start").as("span_start"), col("s.end").as("span_end"))
    }),

    "tag_redpajama" -> ((s, dir) =>
      tagged(s, dir, Seq("code_redpajama_taggers_v1"),
        Seq(
          ("code_redpajama_taggers_v1", "max_line_length_doc", "max_line_length"),
          ("code_redpajama_taggers_v1", "avg_line_length_doc", "avg_line_length"),
          ("code_redpajama_taggers_v1", "alnum_prop_doc", "alnum_prop"),
          ("code_redpajama_taggers_v1", "alpha_token_prop_doc", "alpha_token_prop")))),

    "tag_pii" -> ((s, dir) => {
      val d = withPiiText(docs(s, dir))
        .withColumn("id", col("doc_id").cast("string"))
      val attrs = TagRunner.tag(d, Seq("pii_regex_with_counts_fast_v2"), "t",
        idCol = "id", textCol = "text2", roundScores = false)
      attrs.select(
        col("id").cast("long").as("doc_id"),
        size(TagRunner.attrSpans("t__pii_regex_with_counts_fast_v2__EMAIL_ADDRESS")).cast("long").as("emails"),
        size(TagRunner.attrSpans("t__pii_regex_with_counts_fast_v2__PHONE_NUMBER")).cast("long").as("phones"),
        size(TagRunner.attrSpans("t__pii_regex_with_counts_fast_v2__IP_ADDRESS")).cast("long").as("ips"),
        TagRunner.attrScore("t__pii_regex_with_counts_fast_v2__doc_count").cast("long").as("pii_count"))
    }),

    "tag_quality" -> ((s, dir) =>
      tagged(s, dir, Seq("quality_score_v1"),
        Seq(
          ("quality_score_v1", "stopword_ratio", "stopword_ratio"),
          ("quality_score_v1", "punct_ratio", "punct_ratio"),
          ("quality_score_v1", "mean_word_length", "mean_word_length")))),

    "tag_token_count" -> ((s, dir) =>
      tagged(s, dir, Seq("token_count_v1"),
        Seq(
          ("token_count_v1", "whitespace_tokens", "ws_tokens"),
          ("token_count_v1", "bpe_tokens_estimate", "bpe_est")),
        asLong = Set("ws_tokens", "bpe_est"))),

    // paragraph_repetitions_v1 over constructed two-paragraph texts whose
    // char-repetition spans (start=5, end=len, score=k for k>=4 units) are
    // pure arithmetic on doc_id — offsets, scores and doc rollups all
    // oracle-checked
    "tag_repetitions" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("id", col("doc_id").cast("string"))
        .withColumn("text4", concat(
          lit("zq xv"), expr("repeat(' echo', cast(doc_id % 7 AS INT))"),
          lit("\nmu nv"), expr("repeat(' brr', cast((doc_id + 3) % 7 AS INT))")))
      val attrs = TagRunner.tag(d, Seq("paragraph_repetitions_v1"), "t",
        idCol = "id", textCol = "text4", roundScores = false)
      def a(t: String) = graft.core.Attributes.mangle("t", "paragraph_repetitions_v1", t)
      attrs.select(col("id").cast("long").as("doc_id"),
        size(TagRunner.attrSpans(a("repetition"))).cast("long").as("n_spans"),
        TagRunner.attrScore(a("doc_max_score_repetition")).cast("long").as("max_score"),
        TagRunner.attrScore(a("doc_max_length_repetition")).cast("long").as("max_len"),
        TagRunner.attrScore(a("doc_frac_repetition")).as("frac"))
    }),

    // code_composition over planted prose/code line blocks: the line
    // classifier's decisions are forced by construction, so boundary and
    // composition columns reduce to doc_id arithmetic the oracle replays
    "tag_code_composition" -> ((s, dir) => {
      val p = "the history of science shows careful analysis"
      val blockEven = s"$p\ndef compute(x):\nreturn x + 1\n"
      val blockOdd = s"$p\ndef compute(x):\n"
      val d = docs(s, dir).withColumn("id", col("doc_id").cast("string"))
        .withColumn("text5", expr(
          s"repeat(CASE WHEN doc_id % 2 = 0 THEN '$blockEven' ELSE '$blockOdd' END, " +
            "cast(doc_id % 3 + 1 AS INT))"))
      val attrs = TagRunner.tag(d, Seq("code_composition"), "t",
        idCol = "id", textCol = "text5", roundScores = false)
      def a(t: String) = graft.core.Attributes.mangle("t", "code_composition", t)
      attrs.select(col("id").cast("long").as("doc_id"),
        TagRunner.attrScore(a("boundaries")).cast("long").as("boundaries"),
        TagRunner.attrScore(a("code")).cast("long").as("code_cnt"),
        TagRunner.attrScore(a("prose")).cast("long").as("prose_cnt"),
        TagRunner.attrScore(a("code_pct")).as("code_pct"),
        TagRunner.attrScore(a("prose_pct")).as("prose_pct"))
    }),

    // CC-license extraction over planted html metadata: which license (or
    // none) each doc carries is doc_id arithmetic
    "tag_cc_license" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("id", col("doc_id").cast("string"))
        .withColumn("html",
          when(col("doc_id") % 3 === 0,
            lit("""<a href="https://creativecommons.org/licenses/by/4.0/">CC BY 4.0</a>"""))
            .when(col("doc_id") % 3 === 1,
              lit("""<a href="https://creativecommons.org/licenses/by-nc-sa/3.0/deed.es">x</a>"""))
            .otherwise(lit("""<a href="http://example.com">no license</a>""")))
      val attrs = TagRunner.tag(d, Seq("cc_re"), "t",
        idCol = "id", textCol = "text", metaCols = Seq("html"), roundScores = false)
      attrs.select(col("id").cast("long").as("doc_id"),
        coalesce(try_element_at(map_keys(col("attributes")), lit(1)),
          lit("none")).as("license"))
    }),

    // URL blocklist battery over synthesized metadata URLs: hosts-format
    // domain list + ABP engine; block/no-block is doc_id arithmetic
    "tag_url_blocklist" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("id", col("doc_id").cast("string"))
        .withColumn("url", concat(lit("https://"),
          when(col("doc_id") % 5 === 0, lit("sub.ads.example.net"))
            .when(col("doc_id") % 5 === 1, lit("www.tracker.example.org"))
            .when(col("doc_id") % 5 === 2, lit("phish.example.com"))
            .when(col("doc_id") % 5 === 3, lit("www.nytimes.com"))
            .otherwise(lit("clean.example.io")),
          when(col("doc_id") % 5 === 2, lit("/login")).otherwise(lit("/x"))))
      val attrs = TagRunner.tag(d, Seq("blocklist_project_ads_v1",
          "link_blocklist_phishing_v1", "oisd_small_abp_v1",
          "allowlist_wikidata_v1"), "t",
        idCol = "id", textCol = "text", metaCols = Seq("url"))
      def a(t: String) = graft.core.Attributes.mangle("t", t, "url")
      attrs.select(col("id").cast("long").as("doc_id"),
        size(TagRunner.attrSpans(a("blocklist_project_ads_v1")))
          .cast("long").as("hosts_hit"),
        size(TagRunner.attrSpans(a("link_blocklist_phishing_v1")))
          .cast("long").as("link_hit"),
        size(TagRunner.attrSpans(a("oisd_small_abp_v1")))
          .cast("long").as("abp_hit"),
        size(TagRunner.attrSpans(a("allowlist_wikidata_v1")))
          .cast("long").as("allow_hit"))
    }),

    "tag_langid_hits" -> ((s, dir) => {
      val en = Seq("the", "and", "of", "to", "in", "is", "that", "with", "for", "it")
      val de = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den")
      val fr = Seq("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "des")
      val es = Seq("el", "la", "los", "y", "es", "una", "que", "por", "con", "para")
      def hits(set: Seq[String]): Column =
        size(filter(words(lower(col("text"))), w => w.isin(set.map(lit): _*)))
          .cast("long")
      docs(s, dir).select(col("doc_id"),
        hits(en).as("en_hits"), hits(de).as("de_hits"),
        hits(fr).as("fr_hits"), hits(es).as("es_hits"))
    }),

    "doc_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        md5(concat_ws(" ", words(lower(col("text"))))).as("fingerprint"))),

    // -- dedup family --
    "dedup_exact" -> ((s, dir) =>
      Dedup.markDuplicates(docs(s, dir), md5(col("text")), col("doc_id"))
        .select(col("doc_id"), col("is_duplicate").cast("long").as("is_dup"))),

    // LSH proposes candidates, an exact shingle-set Jaccard join verifies:
    // output depends only on shingle sets, so DuckDB can recompute it
    // IVF coarse quantization: assignment of every embedding to its
    // nearest seed centroid (first k vectors — k-means iteration 0, the
    // only Lloyd step with bit-exact SQL replay; the full trainer is
    // Ann.kmeansTrain, property-tested by monotone SSE)
    "ann_ivf_kmeans" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val seeds = e.orderBy(col("vec_id")).limit(4)
        .select(col("embedding").cast("array<double>").as("v"))
        .collect().map(_.getSeq[Double](0).toSeq).toSeq
      e.select(col("vec_id"),
          graft.similarity.Ann.ivfAssign(col("embedding"), seeds).as("cluster"))
        .groupBy(col("cluster").cast("long").as("cluster"))
        .agg(count(lit(1)).as("n"), sum(col("vec_id")).as("sum_ids"))
        .orderBy(col("cluster"))
    }),

    "dedup_minhash_pairs" -> ((s, dir) =>
      MinHashLSH.verifiedNearDuplicatePairs(docs(s, dir),
        col("doc_id").cast("string"), col("text"), k = 5, numPerms = 32,
        bands = 16, minJaccard = 0.5)
        .select(col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b"), col("jaccard"))),

    // simhash LSH candidates verified for exact text equality: identical
    // text => identical signature => all 4 blocks collide, so recall for
    // exact duplicates is provably 1 and the verified output equals the
    // text-equality self-join the oracle computes. Duplicates are planted
    // (doc_id % 17 == 3 gets one of two templates).
    "dedup_simhash_pairs" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("text3",
        when(col("doc_id") % 17 === 3,
          concat(lit("shared template "), (col("doc_id") % 2).cast("string"),
            lit(" body of identical tokens for simhash grouping")))
          .otherwise(col("text")))
      val cand = SimHash.nearDuplicatePairs(d,
        col("doc_id").cast("string"), col("text3"), maxDistance = 3)
      val ta = d.select(col("doc_id").cast("string").as("id_a"), col("text3").as("ta"))
      val tb = d.select(col("doc_id").cast("string").as("id_b"), col("text3").as("tb"))
      cand.filter(col("distance") === 0)
        .join(ta, "id_a").join(tb, "id_b")
        .filter(col("ta") === col("tb"))
        .select(least(col("id_a").cast("long"), col("id_b").cast("long")).as("id_a"),
          greatest(col("id_a").cast("long"), col("id_b").cast("long")).as("id_b"))
    }),

    // exhaustive inverted-index n-gram Jaccard (no sketch): recall-1
    // counterpart of dedup_minhash_pairs, different shingle width and
    // threshold so the two paths are independently exercised; runs the
    // prefix-filtered scale path (LOSSLESS for a fixed threshold — the
    // DuckDB oracle replays the unfiltered quadratic definition, so the
    // filter's recall-1 claim is value-checked, and SparkOpsSpec pins
    // prefix == unfiltered across thresholds)
    "dedup_jaccard_ngram" -> ((s, dir) =>
      MinHashLSH.exactJaccardPairs(docs(s, dir),
        col("doc_id").cast("string"), col("text"), k = 4, minJaccard = 0.6,
        prefixFilter = true)
        .select(col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b"), col("jaccard"))),

    // embedding-cosine near-dup: duplicates planted by copying the
    // representative's vector (rep = vec_id % 55 for vec_id % 11 == 4);
    // identical vectors share every hyperplane sign bit, so bucket recall
    // is provably 1 for the planted pairs, and the 0.9 verify threshold
    // separates them (max raw pairwise cosine in the table is 0.513)
    "dedup_embedding_cosine" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val rep = e.select(col("vec_id").as("rep_id"), col("embedding").as("rep_emb"))
      val planted = e.join(broadcast(rep), col("vec_id") % 55 === col("rep_id"), "left")
        .select(col("vec_id"),
          when(col("vec_id") % 11 === 4 && col("vec_id") >= 55, col("rep_emb"))
            .otherwise(col("embedding")).as("embedding"))
      Ann.cosineNearDupPairs(planted, col("vec_id"), col("embedding"),
        dim = 64, minCosine = 0.9, bits = 12)
        .select(col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b"))
    }),

    // pairs → clusters: connected components over the verified simhash
    // pair graph (min-label propagation), so transitive chains A~B~C
    // resolve to ONE cluster with a deterministic representative (the
    // min doc_id) instead of over-deleting both ends of each pair; the
    // oracle replays the closure with a DuckDB recursive CTE
    "dedup_cluster_resolve" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("text3",
        when(col("doc_id") % 17 === 3,
          concat(lit("shared template "), (col("doc_id") % 2).cast("string"),
            lit(" body of identical tokens for simhash grouping")))
          .otherwise(col("text")))
      val cand = SimHash.nearDuplicatePairs(d,
        col("doc_id").cast("string"), col("text3"), maxDistance = 3)
      val ta = d.select(col("doc_id").cast("string").as("id_a"), col("text3").as("ta"))
      val tb = d.select(col("doc_id").cast("string").as("id_b"), col("text3").as("tb"))
      val pairs = cand.filter(col("distance") === 0)
        .join(ta, "id_a").join(tb, "id_b")
        .filter(col("ta") === col("tb"))
        .select(least(col("id_a").cast("long"), col("id_b").cast("long")).as("id_a"),
          greatest(col("id_a").cast("long"), col("id_b").cast("long")).as("id_b"))
      Dedup.duplicateClusters(pairs, col("id_a"), col("id_b"))
        .select(col("id").cast("long").as("doc_id"),
          col("cluster").cast("long").as("cluster"))
    }),

    "dedup_paragraph" -> ((s, dir) => {
      val d = docs(s, dir)
        .withColumn("text2", regexp_replace(col("text"), " dup ", "\ndup\n"))
      Dedup.paragraphDuplicates(d, col("doc_id"), col("text2"), col("doc_id"))
        .select(col("id").as("doc_id"), col("para_index"),
          col("is_duplicate").cast("long").as("is_dup"))
    }),

    "dedup_ngram_overlap" -> ((s, dir) =>
      Dedup.ngramOverlapDuplicates(docs(s, dir), col("doc_id"), col("text"),
        col("doc_id"), n = 8, stride = 0, threshold = 0.7)
        .select(col("id").as("doc_id"), col("para_index"),
          col("overlap_fraction"), col("is_duplicate").cast("long").as("is_dup"))),

    // -- aggregation family --
    "topk_bigrams" -> ((s, dir) =>
      Analyzer.topKNgrams(docs(s, dir), col("text"), n = 2, k = 20)),

    // end-to-end analyzer: tag -> explode attribute spans -> bucket counts
    "analyzer_attr_histogram" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("id", col("doc_id").cast("string"))
      val attrs = TagRunner.tag(d, Seq("code_redpajama_taggers_v1"), "t",
        idCol = "id", textCol = "text", roundScores = false)
      val exploded = TagRunner.explodeAttributes(attrs)
      exploded
        .filter(col("attr") === "t__code_redpajama_taggers_v1__max_line_length_doc")
        .groupBy(length(col("score").cast("long").cast("string")).cast("long").as("bucket"))
        .agg(count(lit(1)).as("cnt"), sum(col("score").cast("long")).as("total"))
    }),

    "analyzer_histogram" -> ((s, dir) =>
      docs(s, dir)
        .groupBy(length(col("n_chars").cast("string")).cast("long").as("bucket"))
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("total_chars"))),

    // -- similarity search --
    "ann_cosine_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      Ann.cosineTopK(emb.filter(col("vec_id") =!= 0), col("vec_id"), col("embedding"), q, 10)
        .select(col("id").as("vec_id"), col("cosine"))
    }),

    "ann_lsh_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      Ann.lshBucketedTopK(emb.filter(col("vec_id") =!= 0), col("vec_id"),
        col("embedding"), q, 10, bits = 6)
        .select(col("id").as("vec_id"), col("cosine"))
    }),

    // -- mixer (filter + scrub + min-length) --
    "mixer_filter_scrub" -> ((s, dir) => {
      val d = withPiiText(docs(s, dir))
        .withColumn("id", col("doc_id").cast("string"))
      val attrs = TagRunner.tag(d, Seq("pii_regex_with_counts_fast_v2"), "t",
        idCol = "id", textCol = "text2", roundScores = false)
      val merged = Mixer.mergeAttributes(
        d.select(col("id"), col("doc_id"), col("n_chars"), col("text2").as("content")),
        Seq(attrs))
      val cfg = Mixer.MixerConfig(
        exclude = Seq(col("n_chars") < 150),
        spanReplacements = Seq(
          Mixer.SpanReplacementRule("t__pii_regex_with_counts_fast_v2__EMAIL_ADDRESS", template = "[EMAIL]"),
          Mixer.SpanReplacementRule("t__pii_regex_with_counts_fast_v2__PHONE_NUMBER", template = "[PHONE]"),
          Mixer.SpanReplacementRule("t__pii_regex_with_counts_fast_v2__IP_ADDRESS", template = "[IP]")),
        minTextLength = 1)
      Mixer.mix(merged, cfg, lit("documents"), col("doc_id"))
        .select(col("doc_id"), sha2(col("content"), 256).as("content_sha"),
          octet_length(col("content")).cast("long").as("content_bytes"))
    }),

    // full tag → dedupe → mix composition over the documents table: fused
    // inline attributes (one mapPartitions pass: gopher + pii), exact-dedup
    // window as the only shuffle, predicate excludes, PII scrub, min-length
    // gate. Same plan shape as the CodeDocs flagship (`entry`), but over a
    // parquet table so DuckDB can recompute every stage.
    "code_pipeline" -> ((s, dir) => {
      val d = withPiiText(docs(s, dir))
        .withColumn("id", col("doc_id").cast("string"))
        .select(col("id"), col("doc_id"), col("text2").as("content"))
      val taggedDocs = TagRunner.withAttributes(d,
        Seq("gopher_v2", "pii_regex_with_counts_fast_v2"), "exp",
        textCol = "content")
      val merged = Dedup.markDuplicates(taggedDocs, md5(col("content")), col("doc_id"))
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
      Mixer.mix(merged, cfg, lit("documents"), col("doc_id"))
        .select(col("doc_id"), sha2(col("content"), 256).as("content_sha"),
          octet_length(col("content")).cast("long").as("content_bytes"))
    }),

    // fastText training-set builder (ft_dataset.py): en docs are the
    // positive class, every other language the negative class, paragraph
    // granularity (newlines injected at sentence ends), newlines=replace,
    // 400 lines per class selected deterministically by md5 — the whole
    // segment/label/cap surface is replayed in SQL
    "ft_dataset_build" -> ((s, dir) => {
      val d = docs(s, dir).filter(length(col("text")) > 0)
        .withColumn("text2", regexp_replace(col("text"), "\\. ", ".\n"))
      graft.ml.FtDataset.build(
        target = d.filter(col("lang") === "en"),
        samples = Seq(d.filter(col("lang") === "zh"),
          d.filter(col("lang") =!= "en" && col("lang") =!= "zh")),
        textCol = col("text2"),
        mode = graft.ml.FtDataset.ParagraphLevel, newlines = "replace",
        nSegmentsPerClass = Some(400L))
    }),

    // language ID over planted-language texts: the in-repo fastText model
    // must recover the planted language exactly, which the oracle replays
    // as doc_id arithmetic (real model inference, decidable ground truth)
    "langid_fasttext" -> ((s, dir) => {
      val model = Models.langId
      val bc = s.sparkContext.broadcast(model)
      val samples = Map(
        0 -> "the data stream value that have with this from and the value data",
        1 -> "der wert und die daten strom mit nicht ein zu der die und wert",
        2 -> "le flux la valeur et est une pour dans des le la et valeur",
        3 -> "el valor los datos que por con para una el la que valor")
      val d = docs(s, dir)
      import s.implicits._
      d.select(col("doc_id")).as[Long]
        .map { id =>
          val text = samples((id % 4).toInt)
          val (label, _) = bc.value.predict(text)
          (id, label)
        }.toDF("doc_id", "predicted_lang")
    }),

    // structured-streaming execution of the q5 aggregation: same answer,
    // incremental engine (AvailableNow drains the source then stops)
    "streaming_events_window" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
        .withColumn("bucket", expr("unix_micros(cast(ts as timestamp)) div 300000000"))
        .groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100).cast("long")).as("value_cents"))
      val name = s"graft_stream_${System.nanoTime()}"
      // checkpoint on fast local scratch (TmpFs policy): the default temp
      // checkpoint under java.io.tmpdir puts every offset/commit/state
      // file on the throttled sandbox disk
      val q = stream.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", graft.runtime.TmpFs.scratchDir("ckpt-ev"))
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(name)
    }),

    // streaming exact-dedup with custom per-key state
    // (flatMapGroupsWithState): emitted (total, dups) increments fold to
    // order-independent per-key aggregates the oracle recomputes
    "streaming_dedup_state" -> ((s, dir) => {
      import s.implicits._
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val keys = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .select(when(col("doc_id") % 11 === 7,
          concat(lit("dup-"), (col("doc_id") % 3).cast("string")))
          .otherwise(concat(lit("u-"), col("doc_id").cast("string"))).as("key"))
        .as[String]
      val out = graft.streaming.StreamingTagger.dedupCounts(keys)
        .toDF("key", "total", "dups")
      val name = s"graft_dedup_stream_${System.nanoTime()}"
      // fast-local checkpoint, same rationale as streaming_events_window
      val q = out.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", graft.runtime.TmpFs.scratchDir("ckpt-dd"))
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(name).groupBy("key")
        .agg(max(col("total")).as("n_occurrences"), sum(col("dups")).as("n_dups"))
    }),

    // every media type on a REAL JDK codec now: PNGs through ImageIO,
    // WAVs through javax.sound, GRFV frame-container video through
    // per-frame ImageIO — width/height/n_frames come from the actual
    // decodes (the oracle's formulas hold only if the decodes are
    // correct; for audio the schema maps width=sample rate,
    // height=channels, n_frames=PCM frames)
    "multimodal_features" -> ((s, _) =>
      graft.multimodal.Multimodal.resizePlan(
        graft.multimodal.Multimodal.extractFeatures(
          graft.multimodal.Multimodal.syntheticMedia(s, 200L),
          graft.multimodal.Multimodal.realDecoder()), maxDim = 256)
        .select(col("id"), col("media_type"), col("width"), col("height"),
          col("n_frames"), col("out_width"), col("out_height"))),

    // frame sampling with REAL pixel verification: every 4th frame of
    // each GRFV container is an actual PNG; the query decodes each
    // sampled frame with ImageIO and sums the (0,0) gray value, which
    // the oracle replays as (i*7 + f*11) % 256 arithmetic — a decode
    // bug, an off-by-one in sampling, or a frame-splice error all
    // corrupt the sum
    "multimodal_frame_sample" -> ((s, _) => {
      val gray = udf((b: Array[Byte]) => {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        (img.getRGB(0, 0) & 0xff).toLong
      })
      graft.multimodal.Multimodal.sampleFrames(
        graft.multimodal.Multimodal.syntheticMedia(s, 200L), everyN = 4)
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(gray(col("frame_bytes"))).as("sum_gray"))
    }),

    "mixer_predicate_compiler" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("id", col("doc_id").cast("string"))
      val attrs = TagRunner.tag(d, Seq("gopher_v2"), "t", idCol = "id",
        textCol = "text", roundScores = false)
      val merged = Mixer.mergeAttributes(d.select(col("id"), col("doc_id")), Seq(attrs))
      merged.filter(graft.mixer.PredicateCompiler.keep(
        include = Seq("$.attributes.t__gopher_v2__word_count[0][2] > 30"),
        exclude = Seq("$.attributes.t__gopher_v2__required_word_count[0].score >= 5")))
        .select(col("doc_id"))
    }),

    "dedup_bloom_probe" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val keys = d.filter(col("doc_id") % 2 === 0)
        .select(col("text")).as[String]
      // fp 1e-12 makes the probe exact-membership in expectation at this
      // scale (<<1 expected FP), so the oracle is plain set membership;
      // production decontamination runs at the reference's 1e-4
      val bf = graft.dedup.DistributedBloom.build(keys, 100000L, 1e-12)
      val pairs = d.select(col("doc_id").cast("string"), col("text"))
        .as[(String, String)]
      graft.dedup.DistributedBloom.probe(s, pairs, bf)
        .toDF("doc_id", "might_contain")
        .select(col("doc_id").cast("long").as("doc_id"),
          col("might_contain").cast("long").as("might_contain"))
    }),

    // sharded Bloom decontamination (the 100-TB path: one broadcast
    // filter stops at ~1e9 keys; sharded filters cogroup with their
    // probes, memory per task corpus-size-independent)
    "dedup_bloom_sharded" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val keys = d.filter(col("doc_id") % 2 === 0)
        .select(col("text")).as[String]
      val filters = graft.dedup.DistributedBloom.buildSharded(
        keys, 100000L, 1e-12, shards = 8)
      val pairs = d.select(col("doc_id").cast("string"), col("text"))
        .as[(String, String)]
      graft.dedup.DistributedBloom.probeSharded(pairs, filters, shards = 8)
        .toDF("doc_id", "might_contain")
        .select(col("doc_id").cast("long").as("doc_id"),
          col("might_contain").cast("long").as("might_contain"))
    }),

    // WARC ingestion end-to-end: wrap each doc's sanitized text in HTML,
    // pack real WARC response records (one .warc file per partition),
    // re-read via the record parser, linearize, and emit lengths the
    // oracle recomputes from the same sanitization
    // NOTE harness-local: this query synthesizes its WARC fixture through
    // a driver-local temp dir that executors write with java.nio — valid
    // under the driver contract's local[— mode only. The ENGINE under
    // test (Warc.readRecords/extractDocuments) uses Hadoop FS paths and
    // is cluster-safe; only this fixture setup is not.
    "warc_extract" -> ((s, dir) => {
      // harness-local fixture dir on fast local scratch (TmpFs policy; the
      // engine under test reads it back through Hadoop FS either way)
      val out = graft.runtime.TmpFs.scratchDir("graft-warc-q")
      val d = docs(s, dir).select(col("doc_id"),
        regexp_replace(regexp_replace(col("text"), "[&<>]", ""),
          "[ \\t\\n\\r]+", " ").as("clean"))
      import s.implicits._
      d.select(col("doc_id"), col("clean")).as[(Long, String)]
        .repartition(8)
        .foreachPartition { (it: Iterator[(Long, String)]) =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val bos = new java.io.ByteArrayOutputStream()
          it.foreach { case (id, clean) =>
            val html = s"<html><body><h1>t</h1><p>$clean</p></body></html>"
            val body = html.getBytes("UTF-8")
            val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
            val payload = http.getBytes("ISO-8859-1") ++ body
            val rec = s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:doc:$id>\r\n" +
              s"WARC-Target-URI: http://docs.example.com/doc/$id\r\n" +
              s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
              s"WARC-Payload-Digest: sha1:DOC$id\r\n" +
              "Content-Type: application/http; msgtype=response\r\n" +
              s"Content-Length: ${payload.length}\r\n\r\n"
            bos.write(rec.getBytes("ISO-8859-1")); bos.write(payload)
            bos.write("\r\n\r\n".getBytes)
          }
          java.nio.file.Files.write(
            java.nio.file.Paths.get(out, f"part-$pid%05d.warc"), bos.toByteArray)
          ()
        }
      val recs = graft.sources.Warc.readRecords(s, out)
      graft.sources.Warc.extractDocuments(recs, "graft-warc")
        .select(
          element_at(split(col("metadata")("url"), "/"), -1).cast("long").as("doc_id"),
          col("metadata")("url").as("url"),
          length(col("text")).cast("long").as("n_chars"))
    }),

    // token sink end-to-end: tokenize -> binary shard write -> metadata
    // table; each doc's token range length is its word count + eos
    // NOTE harness-local: like warc_extract, the temp-dir fixture round-
    // trip is local[—]-only; TokenSink itself writes via Hadoop FS.
    "tokens_sink" -> ((s, dir) => {
      val out = graft.runtime.TmpFs.scratchDir("graft-tokens-q")
      val d = docs(s, dir).withColumn("toks",
        graft.sources.TokenSink.tokenIds(col("text")))
      graft.sources.TokenSink
        .writeShards(d, col("doc_id"), col("toks"), out, numShards = 8)
        .select(col("id").cast("long").as("doc_id"),
          (col("end") - col("start")).as("n_tokens"))
    }),

    // reshard end-to-end: BPE-encode -> 16 small shards -> merge to a
    // 64 KiB floor -> decode every doc from its RE-BASED (shard, start,
    // end) range in the merged files; sha256 of the decode must equal
    // sha256(text) (any offset-shift or byte-splice error corrupts the
    // token stream and the sha). Ref python/dolma/tokenizer/reshard.py.
    // NOTE harness-local like tokens_sink: temp-dir fixture + driver-side
    // shard readback for the check; reshard itself moves bytes task-side.
    "tokens_reshard" -> ((s, dir) => {
      val src = graft.runtime.TmpFs.scratchDir("graft-reshard-src")
      val dst = graft.runtime.TmpFs.scratchDir("graft-reshard-dst")
      val bc = s.sparkContext.broadcast(Models.codeBpe)
      val enc = udf((t: String) =>
        bc.value.encode(if (t == null) "" else t)
          .map(_ + graft.sources.TokenSink.FirstVocabId) :+
          graft.sources.TokenSink.EosId)
      val d = docs(s, dir).withColumn("toks", enc(col("text")))
      val meta = graft.sources.TokenSink
        .writeShards(d, col("doc_id"), col("toks"), src, numShards = 16)
        .localCheckpoint() // materialize: shards must exist before reshard
      val newMeta = graft.sources.TokenSink
        .reshard(s, src, meta, dst, minSizeBytes = 64L * 1024)
        .localCheckpoint()
      val shardData = newMeta.select(col("shard")).distinct()
        .collect().map(_.getString(0))
        .map(n => n -> graft.sources.TokenSink.readShard(s, dst, n)).toMap
      val bcShards = s.sparkContext.broadcast(shardData)
      val dec = udf((shard: String, start: Long, end: Long) => {
        val ids = bcShards.value(shard).slice(start.toInt, end.toInt)
        bc.value.decode(ids.dropRight(1) // trailing eos
          .map(_ - graft.sources.TokenSink.FirstVocabId).toSeq)
      })
      newMeta.select(col("id").cast("long").as("doc_id"),
        sha2(dec(col("shard"), col("start"), col("end")), 256).as("roundtrip_sha"),
        octet_length(dec(col("shard"), col("start"), col("end"))).cast("long").as("n_bytes"))
    }),

    // distributed bigram LM with absolute discounting (D=0.75, unigram
    // MLE backoff): estimated FROM the corpus itself via map-side-combined
    // groupBys, scored per doc through three equi-joins. All-rational
    // double arithmetic (+,*,/,max) is IEEE-deterministic, so the
    // per-bigram probability quantized to floor(p·2^20) sums to a
    // DuckDB-replayable BIGINT — an exactly-verified LM scoring path.
    "lm_bigram_score" -> ((s, dir) => {
      val d = docs(s, dir)
      val toks = d.select(col("doc_id"), words(col("text")).as("ws"))
      val pairs = toks
        .select(col("doc_id"), explode(zip_with(
          slice(col("ws"), lit(1), greatest(size(col("ws")) - 1, lit(0))),
          slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_hw"))
      val hist = big.groupBy("w1").agg(sum("c_hw").as("c_h"), count(lit(1)).as("n1p"))
      val uni = pairs.groupBy("w2").agg(count(lit(1)).as("c_w"))
      val tot = pairs.agg(count(lit(1)).as("t"))
      val term1 = greatest(col("c_hw").cast("double") - 0.75, lit(0.0)) /
        col("c_h").cast("double")
      val term2 = (lit(0.75) * col("n1p").cast("double") / col("c_h").cast("double")) *
        (col("c_w").cast("double") / col("t").cast("double"))
      val scored = pairs
        .join(big, Seq("w1", "w2")).join(hist, Seq("w1")).join(uni, Seq("w2"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"),
          floor((term1 + term2) * 1048576.0).cast("long").as("q"))
        .groupBy("doc_id")
        .agg(sum("q").as("score"), count(lit(1)).as("n_bigrams"))
      d.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("score"), lit(0L)).as("score"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
    }),

    // KenLM perplexity, oracle-checkable form: per-token log10 p under the
    // broadcast order-2 model (full backoff recursion — observed bigram,
    // else backoff(prev)+unigram, else unk), each token quantized to
    // floor(lp · 2^20) and summed per doc. The integer sum is order-
    // independent and bit-exact; perplexity itself is
    // 10^(−score / n_tokens / 2^20), recovered losslessly to ~1e-6 log10
    // units (KenLm.perplexity proper is MlSpec-covered). The DuckDB side
    // replays the SAME model from verbatim table literals.
    "kenlm_perplexity" -> ((s, dir) => {
      val lm = Models.codeLm2
      val bc = s.sparkContext.broadcast(lm)
      val d = docs(s, dir)
      import s.implicits._
      d.select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val toks = graft.ml.KenLm.tokenize(text)
          var q = 0L
          var prev: List[String] = Nil
          toks.foreach { t =>
            q += math.floor(bc.value.logProb(prev, t) * 1048576.0).toLong
            prev = List(t)
          }
          (id, q, toks.length.toLong)
        }
        .toDF("doc_id", "score", "n_tokens")
    }),

    // real byte-level BPE (trained in-repo): encode -> decode must
    // reproduce the text EXACTLY for every doc (byte-level alphabet =>
    // no unk) — sha256-checked against the raw text in DuckDB; token-
    // level vectors live in MlSpec
    "bpe_roundtrip" -> ((s, dir) => {
      val bc = s.sparkContext.broadcast(Models.codeBpe)
      val rt = udf((t: String) =>
        bc.value.decode(bc.value.encode(if (t == null) "" else t).toSeq))
      docs(s, dir).select(col("doc_id"),
        sha2(rt(col("text")), 256).as("roundtrip_sha"),
        octet_length(col("text")).cast("long").as("n_bytes"))
    }),

    // HF tokenizer.json vocab loader (graft.ml.HfTokenizer), three checks
    // per doc: (1) a merge-less byte vocab with SHUFFLED ids — token
    // count must equal the byte length (exercises file parsing, the
    // GPT-2 byte-level alphabet, and id lookup; any alphabet/lookup bug
    // throws or miscounts); (2) the in-repo BPE EXPORTED to the HF
    // format and re-loaded — decode∘encode must reproduce the text
    // exactly (exercises merges parsing + decode; exact id-sequence
    // equality with the original encoder is pinned in MlSpec); (3) the
    // dolma_v1_tokenizer REGISTRY tagger wired to vocab (1) via
    // $GRAFT_VOCAB_DIR — score must equal the stripped text's byte
    // length (reference length.py:163-175 semantics: strip, 0 if blank).
    // The vocab files are harness-local fixtures written by the driver
    // JVM (fine at local[32]; on a cluster the caller distributes them).
    "tag_hf_token_count" -> ((s, dir) => {
      val vocabDir = java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft_vocab")).toString
      // id shuffle: b -> (167*b + 13) mod 256 (167 odd => bijection)
      val trivial = graft.ml.HfTokenizer.trivialByteVocabJson(
        b => (167 * b + 13) % 256)
      val trivialPath = java.nio.file.Paths.get(vocabDir, "dolma_v1_tokenizer.json")
      val bpePath = java.nio.file.Paths.get(vocabDir, "code_bpe.json")
      java.nio.file.Files.write(trivialPath, trivial.getBytes("UTF-8"))
      java.nio.file.Files.write(bpePath, Models.codeBpeHfJson.getBytes("UTF-8"))
      sys.props("GRAFT_VOCAB_DIR") = vocabDir
      val tp = trivialPath.toString; val bp = bpePath.toString
      val nTok = udf((t: String) =>
        graft.ml.HfTokenizer.loadCached(tp)
          .countTokens(if (t == null) "" else t).toLong)
      val rt = udf((t: String) => {
        val tok = graft.ml.HfTokenizer.loadCached(bp)
        tok.decode(tok.encode(if (t == null) "" else t).toIndexedSeq)
      })
      val v1 = udf((t: String) =>
        graft.taggers.TaggerRegistry.resolve("dolma_v1_tokenizer")
          .predict(if (t == null) "" else t).head.score.toLong)
      docs(s, dir).select(col("doc_id"),
        nTok(col("text")).as("n_tokens_bytes"),
        sha2(rt(col("text")), 256).as("hf_roundtrip_sha"),
        v1(col("text")).as("v1_tokens"))
    })
  )

  // ---- oracle SQL (DuckDB dialect, same parquet tables) ---------------

  def oracleSql: Map[String, String] = {
    val wordsSql = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    val wordsLowerSql = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
    val tokenRe = "[a-zA-Z0-9_]+|[^a-zA-Z0-9_\\s]+"
    val emailRe = "[.\\s@,?!;:)(]*([^\\s@]+@[^\\s@,?!;:)(]+?)[.\\s@,?!;:)(]?[\\s\\n\\r]"
    val phoneRe = "\\s+\\(?(\\d{3})\\)?[-\\. ]*(\\d{3})[-. ]?(\\d{4})"
    val ipRe = "(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
    // Random-hyperplane planes for ann_lsh_topk: same RNG stream as
    // Ann.lshBucketedTopK(seed=42, bits=6, dim=64); Double.toString
    // round-trips, so the literals parse back to the identical doubles.
    val lshBits = 6
    val lshDim = 64
    val lshPlanes = {
      val rng = new scala.util.Random(42L)
      Array.fill(lshBits)(Array.fill(lshDim)(rng.nextGaussian()))
    }
    def lshBucketSql(vec: String): String =
      lshPlanes.zipWithIndex.map { case (p, i) =>
        val lits = p.map(d => java.lang.Double.toString(d)).mkString(",")
        s"(CASE WHEN list_sum(list_transform(range(1, ${lshDim + 1}), i -> cast($vec[i] AS DOUBLE) * ([$lits])[i])) >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString("(", " + ", ")")

    Map(
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
          | cast(sum(l_quantity) AS BIGINT) AS sum_qty,
          | count(*) AS n,
          | cast(sum(floor(l_extendedprice*100)) AS BIGINT) AS price_cents
          |FROM lineitem GROUP BY 1, 2""".stripMargin,

      "q2_join_agg" ->
        """SELECT c_mktsegment, count(*) AS n,
          | cast(sum(floor(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS revenue_cents
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |GROUP BY 1""".stripMargin,

      "q3_window_first_order" ->
        """SELECT o_custkey, o_orderkey AS first_orderkey FROM (
          | SELECT o_custkey, o_orderkey,
          |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
          | FROM orders) WHERE rn = 1""".stripMargin,

      "q4_broadcast_star" ->
        """SELECT r_name, count(*) AS n_suppliers,
          | cast(sum(floor(s_acctbal*100)) AS BIGINT) AS acctbal_cents
          |FROM supplier
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY 1""".stripMargin,

      "q5_events_window" ->
        """SELECT epoch_us(ts) // 300000000 AS bucket, event_type,
          | count(*) AS n, cast(sum(floor(value*100)) AS BIGINT) AS value_cents
          |FROM events GROUP BY 1, 2""".stripMargin,

      // per-key occurrence totals are order/batching-independent
      "streaming_dedup_state" ->
        """WITH k AS (SELECT CASE WHEN doc_id % 11 = 7
          |    THEN 'dup-' || cast(doc_id % 3 AS VARCHAR)
          |    ELSE 'u-' || cast(doc_id AS VARCHAR) END AS key
          |  FROM documents)
          |SELECT key, count(*) AS n_occurrences,
          |  cast(count(*) - 1 AS BIGINT) AS n_dups
          |FROM k GROUP BY 1""".stripMargin,

      "streaming_events_window" ->
        """SELECT epoch_us(ts) // 300000000 AS bucket, event_type,
          | count(*) AS n, cast(sum(floor(value*100)) AS BIGINT) AS value_cents
          |FROM events GROUP BY 1, 2""".stripMargin,

      "mixer_predicate_compiler" ->
        """SELECT doc_id FROM (
          | SELECT doc_id,
          |  len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS wc,
          |  len(list_filter(string_split_regex(text, '\s+'), x -> x <> '' AND x IN
          |    ('the','be','to','of','and','that','have','with'))) AS req
          | FROM documents)
          |WHERE wc > 30 AND NOT (req >= 5)""".stripMargin,

      "q7_salted_agg" ->
        """SELECT source, count(*) AS n, cast(sum(n_chars) AS BIGINT) AS total_chars
          |FROM documents GROUP BY 1""".stripMargin,

      "q6_sessionize" ->
        """SELECT user_id, cast(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
          | SELECT user_id,
          |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
          |        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
          |   THEN 1 ELSE 0 END AS new_session
          | FROM events
          | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
          |GROUP BY 1""".stripMargin,

      // per-attribute tracker state is exact -> totals/sums/distincts are
      // plain aggregates over the gopher values recomputed in SQL
      "analyzer_grouped_summary" ->
        s"""WITH w AS (SELECT doc_id, len($wordsSql) AS wc,
           |    len(list_filter($wordsSql, x -> x IN
           |      ('the','be','to','of','and','that','have','with'))) AS rwc
           |  FROM documents),
           |u AS (SELECT 't__gopher_v2__word_count' AS attr, wc AS v FROM w
           |      UNION ALL
           |      SELECT 't__gopher_v2__required_word_count' AS attr, rwc AS v FROM w)
           |SELECT attr, count(*) AS total,
           |  cast(sum(v) AS BIGINT) AS sum_scores,
           |  cast(count(DISTINCT v) AS BIGINT) AS n_bins
           |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

      // exact-tracker summary = value histogram (tracker not full, nOut
      // above distinct count -> passthrough of sorted bins/counts)
      "analyzer_infer_tracker" ->
        s"""SELECT cast(len($wordsSql) % 97 AS DOUBLE) AS bin,
           | count(*) AS cnt
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

      "analyzer_quantiles" ->
        """SELECT source,
          | quantile_cont(n_chars, 0.25) AS q25,
          | quantile_cont(n_chars, 0.5) AS q50,
          | quantile_cont(n_chars, 0.75) AS q75,
          | count(*) AS n
          |FROM documents GROUP BY 1""".stripMargin,

      "tag_lengths" ->
        s"""SELECT doc_id,
           | length(text) AS char_len,
           | length(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11))) AS char_len_strip,
           | strlen(text) AS byte_len,
           | len(regexp_extract_all(text, '$tokenRe')) + 1 AS ws_segments
           |FROM documents""".stripMargin,

      // gopher_v2 line split = re.split('\n+', text); duplicate-line
      // fractions: dup line occurrences / line count and dup line chars /
      // WORD-char sum (the reference reassigns character_count to the
      // word-length sum before the line section — gopher.py:148,196-199)
      "tag_gopher" ->
        s"""WITH t AS (SELECT doc_id,
           |  replace(text, ' dup ', chr(10) || 'dup' || chr(10)) ||
           |  CASE WHEN doc_id % 3 = 0 THEN
           |    chr(10) || 'repeated trailer line' || chr(10) || 'repeated trailer line'
           |  ELSE '' END AS text2
           |  FROM documents),
           |w AS (
           | SELECT doc_id,
           |  list_filter(string_split_regex(text2, '\\s+'), x -> x <> '') AS wl
           | FROM t),
           |base AS (
           | SELECT doc_id, wl,
           |  list_sort(list_transform(wl, x -> length(x))) AS lens,
           |  coalesce(list_sum(list_transform(wl, x -> length(x))), 0) AS char_cnt
           | FROM w),
           |l AS (SELECT doc_id, unnest(string_split_regex(text2, '\\n+')) AS line FROM t),
           |lc AS (SELECT doc_id, line, count(*) AS c FROM l GROUP BY 1, 2),
           |dl AS (SELECT doc_id,
           |  sum(c) AS line_count,
           |  sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_lines,
           |  sum(CASE WHEN c > 1 THEN length(line) * c ELSE 0 END) AS dup_chars
           | FROM lc GROUP BY 1)
           |SELECT b.doc_id,
           | len(wl) AS word_count,
           | CASE WHEN len(wl) = 0 THEN 0.0 ELSE
           |  (lens[cast((len(wl)+1)//2 AS INT)] + lens[cast(len(wl)//2+1 AS INT)]) / 2.0 END
           |  AS median_word_length,
           | cast(len(list_filter(wl, x -> contains(x,'#') OR contains(x,'…'))) AS DOUBLE)
           |  / greatest(len(wl), 1) AS symbol_to_word_ratio,
           | cast(len(list_filter(wl, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
           |  / greatest(len(wl), 1) AS frac_alpha,
           | len(list_filter(wl, x -> x IN ('the','be','to','of','and','that','have','with')))
           |  AS required_word_count,
           | cast(dup_lines AS DOUBLE) / greatest(line_count, 1) AS frac_dup_lines,
           | cast(dup_chars AS DOUBLE) / greatest(char_cnt, 1) AS frac_dup_chars
           |FROM base b JOIN dl USING (doc_id)""".stripMargin,

      "tag_c4" -> {
        // the FULL vendored reference list, replayed in SQL: single words
        // at word level, multi-word phrases as substrings (c4.py:64-65)
        val nwList = graft.taggers.RefData.naughtyWords.toSeq.sorted
          .map(w => s"'$w'").mkString("[", ", ", "]")
        val npList = graft.taggers.RefData.naughtyPhrases
          .map(p => s"'$p'").mkString("[", ", ", "]")
        s"""WITH t AS (SELECT doc_id, text ||
          |       CASE WHEN doc_id % 5 = 0 THEN ' Alabama hot pocket'
          |            WHEN doc_id % 7 = 0 THEN ' anus'
          |            WHEN doc_id % 11 = 0 THEN ' anus,' ELSE '' END AS text2
          |     FROM documents),
          |l AS (SELECT doc_id, lower(text2) AS lt,
          |            string_split(lower(text2), chr(10)) AS lines FROM t)
          |SELECT doc_id,
          | CASE WHEN contains(lt, '{') THEN 1 ELSE 0 END AS has_curly,
          | CASE WHEN contains(lt, 'lorem ipsum') THEN 1 ELSE 0 END AS has_lorem,
          | CASE WHEN contains(lt, 'javascript') THEN 1 ELSE 0 END AS has_js,
          | CASE WHEN list_has_any(
          |        list_filter(string_split_regex(lt, '\\s+'), x -> x <> ''), $nwList)
          |      OR len(list_filter($npList, p -> contains(lt, p))) > 0
          |      THEN 1 ELSE 0 END AS has_naughty,
          | len(lines) AS line_count,
          | len(list_filter(lines, x ->
          |   len(list_filter(string_split_regex(x, '\\s+'), y -> y <> '')) < 3)) AS short_lines,
          | len(list_filter(lines, x -> NOT (
          |   trim(x) LIKE '%.' OR trim(x) LIKE '%?' OR trim(x) LIKE '%!' OR trim(x) LIKE '%"'))) AS unpunct_lines
          |FROM l""".stripMargin
      },

      "tag_c4_spans" ->
        """WITH t AS (SELECT doc_id, replace(text, ' dup ', chr(10) || 'dup' || chr(10)) AS text2
          |           FROM documents),
          |l AS (SELECT doc_id, text2,
          |        unnest(string_split(lower(text2), chr(10))) AS line,
          |        unnest(range(1, len(string_split(text2, chr(10))) + 1)) AS idx,
          |        len(string_split(text2, chr(10))) AS n_lines
          |      FROM t),
          |o AS (SELECT doc_id, line, idx, n_lines,
          |        sum(length(line) + 1) OVER (PARTITION BY doc_id ORDER BY idx
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end,
          |        length(line) AS ll
          |      FROM l)
          |SELECT doc_id,
          |  cast(coalesce(prev_end, 0) AS BIGINT) AS span_start,
          |  cast(coalesce(prev_end, 0) + ll + (CASE WHEN idx < n_lines THEN 1 ELSE 0 END) AS BIGINT) AS span_end
          |FROM o
          |WHERE len(list_filter(string_split_regex(trim(line), '\s+'), x -> x <> '')) < 3""".stripMargin,

      "tag_redpajama" ->
        s"""WITH l AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM documents)
           |SELECT doc_id,
           | cast(list_max(list_transform(lines, x -> length(x))) AS DOUBLE) AS max_line_length,
           | cast(list_sum(list_transform(lines, x -> length(x))) AS DOUBLE) / len(lines) AS avg_line_length,
           | cast(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS DOUBLE)
           |  / greatest(length(text), 1) AS alnum_prop,
           | cast(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
           |  / (len(regexp_extract_all(text, '$tokenRe')) + 1) AS alpha_token_prop
           |FROM l""".stripMargin,

      "tag_pii" -> {
        s"""WITH t AS (SELECT doc_id, $PiiText2Sql AS text2 FROM documents)
           |SELECT doc_id,
           | len(regexp_extract_all(text2, '$emailRe')) AS emails,
           | len(regexp_extract_all(text2, '$phoneRe')) AS phones,
           | len(regexp_extract_all(text2, '$ipRe')) AS ips,
           | len(regexp_extract_all(text2, '$emailRe'))
           |  + len(regexp_extract_all(text2, '$phoneRe'))
           |  + len(regexp_extract_all(text2, '$ipRe')) AS pii_count
           |FROM t""".stripMargin
      },

      "tag_quality" ->
        s"""WITH w AS (SELECT doc_id, text, $wordsSql AS wl FROM documents)
           |SELECT doc_id,
           | cast(len(list_filter(wl, x -> lower(x) IN
           |   ('the','be','to','of','and','a','in','that','have','with','is','it'))) AS DOUBLE)
           |  / greatest(len(wl), 1) AS stopword_ratio,
           | cast(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
           |  / length(text) AS punct_ratio,
           | cast(list_sum(list_transform(wl, x -> length(x))) AS DOUBLE)
           |  / greatest(len(wl), 1) AS mean_word_length
           |FROM w""".stripMargin,

      "tag_token_count" ->
        s"""SELECT doc_id,
           | len($wordsSql) AS ws_tokens,
           | cast(coalesce(list_sum(list_transform(regexp_extract_all(text, '$tokenRe'),
           |   x -> (length(x)+3)//4)), 0) AS BIGINT) AS bpe_est
           |FROM documents""".stripMargin,

      "tag_langid_hits" -> {
        def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(",")
        val en = inList(Seq("the", "and", "of", "to", "in", "is", "that", "with", "for", "it"))
        val de = inList(Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"))
        val fr = inList(Seq("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "des"))
        val es = inList(Seq("el", "la", "los", "y", "es", "una", "que", "por", "con", "para"))
        s"""WITH w AS (SELECT doc_id, $wordsLowerSql AS wl FROM documents)
           |SELECT doc_id,
           | len(list_filter(wl, x -> x IN ($en))) AS en_hits,
           | len(list_filter(wl, x -> x IN ($de))) AS de_hits,
           | len(list_filter(wl, x -> x IN ($fr))) AS fr_hits,
           | len(list_filter(wl, x -> x IN ($es))) AS es_hits
           |FROM w""".stripMargin
      },

      "doc_fingerprint" ->
        s"""SELECT doc_id, md5(array_to_string($wordsLowerSql, ' ')) AS fingerprint
           |FROM documents""".stripMargin,

      "dedup_paragraph" ->
        """WITH t AS (SELECT doc_id, replace(text, ' dup ', chr(10) || 'dup' || chr(10)) AS text2
          |           FROM documents),
          |p AS (SELECT doc_id,
          |        unnest(string_split(text2, chr(10))) AS para,
          |        unnest(range(0, len(string_split(text2, chr(10))))) AS para_index
          |      FROM t)
          |SELECT doc_id, para_index,
          | CASE WHEN trim(para) <> '' AND
          |   row_number() OVER (PARTITION BY para ORDER BY doc_id, para_index) > 1
          |  THEN 1 ELSE 0 END AS is_dup
          |FROM p""".stripMargin,

      "dedup_exact" ->
        """SELECT doc_id,
          | CASE WHEN row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) > 1
          |  THEN 1 ELSE 0 END AS is_dup
          |FROM documents""".stripMargin,

      "topk_bigrams" ->
        s"""WITH toks AS (SELECT $wordsLowerSql AS w FROM documents),
           |g AS (SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS ngram
           |      FROM toks)
           |SELECT ngram, count(*) AS cnt FROM g GROUP BY 1
           |ORDER BY cnt DESC, ngram LIMIT 20""".stripMargin,

      "analyzer_attr_histogram" ->
        """WITH m AS (SELECT cast(list_max(list_transform(string_split(text, chr(10)),
          |                    x -> length(x))) AS BIGINT) AS mll
          |           FROM documents)
          |SELECT length(cast(mll AS VARCHAR)) AS bucket,
          | count(*) AS cnt, cast(sum(mll) AS BIGINT) AS total
          |FROM m GROUP BY 1""".stripMargin,

      "analyzer_histogram" ->
        """SELECT length(cast(n_chars AS VARCHAR)) AS bucket,
          | count(*) AS cnt, cast(sum(n_chars) AS BIGINT) AS total_chars
          |FROM documents GROUP BY 1""".stripMargin,

      "ann_cosine_topk" ->
        """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
          |SELECT e.vec_id,
          | list_sum(list_transform(range(1, len(e.embedding)+1),
          |   i -> cast(e.embedding[i] AS DOUBLE) * cast(q.qv[i] AS DOUBLE)))
          | / (sqrt(list_sum(list_transform(e.embedding, x -> cast(x AS DOUBLE)*cast(x AS DOUBLE))))
          |    * sqrt(list_sum(list_transform(q.qv, x -> cast(x AS DOUBLE)*cast(x AS DOUBLE)))))
          |  AS cosine
          |FROM embeddings e, q WHERE e.vec_id <> 0
          |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin,

      "mixer_filter_scrub" -> {
        s"""WITH t AS (SELECT doc_id, n_chars, $PiiText2Sql AS text2 FROM documents),
           |s AS (SELECT doc_id,
           |  regexp_replace(regexp_replace(regexp_replace(text2,
           |    '$emailRe', '[EMAIL]', 'g'), '$phoneRe', '[PHONE]', 'g'), '$ipRe', '[IP]', 'g') AS content
           | FROM t WHERE NOT (n_chars < 150))
           |SELECT doc_id, sha256(content) AS content_sha, strlen(content) AS content_bytes
           |FROM s WHERE strlen(trim(content)) >= 1""".stripMargin
      },

      // tag → exact-dedup → predicate-exclude → PII-scrub → min-length:
      // every stage recomputed relationally by DuckDB
      "code_pipeline" ->
        s"""WITH t AS (SELECT doc_id, $PiiText2Sql AS text2 FROM documents),
           |w AS (SELECT doc_id, text2,
           |  len(list_filter(string_split_regex(text2, '\\s+'), x -> x <> '')) AS wc,
           |  len(regexp_extract_all(text2, '$emailRe'))
           |   + len(regexp_extract_all(text2, '$phoneRe'))
           |   + len(regexp_extract_all(text2, '$ipRe')) AS pii_cnt,
           |  CASE WHEN row_number() OVER (PARTITION BY md5(text2) ORDER BY doc_id) > 1
           |   THEN 1 ELSE 0 END AS is_dup
           | FROM t),
           |s AS (SELECT doc_id,
           |  regexp_replace(regexp_replace(regexp_replace(text2,
           |    '$emailRe', '[EMAIL]', 'g'), '$phoneRe', '[PHONE]', 'g'), '$ipRe', '[IP]', 'g') AS content
           | FROM w WHERE NOT (is_dup = 1 OR wc < 40 OR pii_cnt > 5))
           |SELECT doc_id, sha256(content) AS content_sha, strlen(content) AS content_bytes
           |FROM s WHERE strlen(trim(content)) >= 1""".stripMargin,

      // exact shingle-set Jaccard over 5-word shingles; pair orientation
      // mirrors the Spark side's string-id comparison
      "dedup_minhash_pairs" ->
        """WITH d AS (SELECT doc_id,
          |        list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
          |      FROM documents),
          |s AS (SELECT doc_id,
          |        list_distinct(CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
          |          ELSE list_transform(range(0, len(toks)-5+1), i -> array_to_string(toks[i+1:i+5], ' ')) END) AS sh
          |      FROM d),
          |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
          |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
          |      FROM e a JOIN e b ON a.g = b.g
          |       AND cast(a.doc_id AS VARCHAR) < cast(b.doc_id AS VARCHAR)
          |      GROUP BY 1, 2),
          |j AS (SELECT id_a, id_b,
          |        cast(shared AS DOUBLE) / cast(sa.n + sb.n - shared AS DOUBLE) AS jaccard
          |      FROM p
          |      JOIN (SELECT doc_id, len(sh) AS n FROM s) sa ON sa.doc_id = id_a
          |      JOIN (SELECT doc_id, len(sh) AS n FROM s) sb ON sb.doc_id = id_b)
          |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5""".stripMargin,

      // connected components replayed as a recursive reachability
      // closure: r holds every (node, reachable-node) pair, min = the
      // deterministic cluster representative
      "dedup_cluster_resolve" ->
        """WITH RECURSIVE d AS (SELECT doc_id,
          |  CASE WHEN doc_id % 17 = 3 THEN 'shared template ' ||
          |    cast(doc_id % 2 AS VARCHAR) ||
          |    ' body of identical tokens for simhash grouping'
          |  ELSE text END AS t FROM documents),
          |p AS (SELECT least(a.doc_id, b.doc_id) AS id_a,
          |             greatest(a.doc_id, b.doc_id) AS id_b
          |      FROM d a JOIN d b ON a.t = b.t AND a.doc_id < b.doc_id),
          |e AS (SELECT id_a AS a, id_b AS b FROM p
          |      UNION SELECT id_b, id_a FROM p),
          |r(id, lab) AS (
          |  SELECT a, a FROM e
          |  UNION
          |  SELECT r.id, e.b FROM r JOIN e ON r.lab = e.a)
          |SELECT id AS doc_id, min(lab) AS cluster FROM r GROUP BY id""".stripMargin,

      // exhaustive shingle-set Jaccard, k=4 τ=0.6: shared/(na+nb-shared)
      // is one integer division — bit-exact across engines
      "dedup_jaccard_ngram" ->
        """WITH d AS (SELECT doc_id,
          |        list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
          |      FROM documents),
          |s AS (SELECT doc_id,
          |        list_distinct(CASE WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
          |          ELSE list_transform(range(0, len(toks)-4+1), i -> array_to_string(toks[i+1:i+4], ' ')) END) AS sh
          |      FROM d),
          |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
          |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
          |      FROM e a JOIN e b ON a.g = b.g
          |       AND cast(a.doc_id AS VARCHAR) < cast(b.doc_id AS VARCHAR)
          |      GROUP BY 1, 2),
          |j AS (SELECT id_a, id_b,
          |        cast(shared AS DOUBLE) / cast(sa.n + sb.n - shared AS DOUBLE) AS jaccard
          |      FROM p
          |      JOIN (SELECT doc_id, len(sh) AS n FROM s) sa ON sa.doc_id = id_a
          |      JOIN (SELECT doc_id, len(sh) AS n FROM s) sb ON sb.doc_id = id_b)
          |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.6""".stripMargin,

      // planted identical-vector pairs recovered through the LSH bucket
      // index; full O(n^2) cosine replay at oracle scale
      "dedup_embedding_cosine" ->
        """WITH base AS (SELECT vec_id, embedding FROM embeddings),
          |d AS (SELECT a.vec_id,
          |    CASE WHEN a.vec_id % 11 = 4 AND a.vec_id >= 55
          |         THEN r.embedding ELSE a.embedding END AS emb
          |  FROM base a LEFT JOIN base r ON r.vec_id = a.vec_id % 55),
          |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |    list_sum(list_transform(range(1, len(a.emb)+1),
          |      i -> cast(a.emb[i] AS DOUBLE) * cast(b.emb[i] AS DOUBLE)))
          |    / (sqrt(list_sum(list_transform(a.emb, x -> cast(x AS DOUBLE)*cast(x AS DOUBLE))))
          |       * sqrt(list_sum(list_transform(b.emb, x -> cast(x AS DOUBLE)*cast(x AS DOUBLE))))) AS cosine
          |  FROM d a JOIN d b ON a.vec_id < b.vec_id)
          |SELECT id_a, id_b FROM p WHERE cosine >= 0.9""".stripMargin,

      // nearest-seed assignment replayed: per-element L2 sums are
      // sequential double arithmetic (bit-exact), argmin ties by index
      "ann_ivf_kmeans" ->
        """WITH s AS (SELECT embedding AS sv,
          |    row_number() OVER (ORDER BY vec_id) - 1 AS idx
          |  FROM embeddings ORDER BY vec_id LIMIT 4),
          |d AS (SELECT e.vec_id, s.idx,
          |    list_sum(list_transform(range(1, len(e.embedding)+1),
          |      i -> (cast(e.embedding[i] AS DOUBLE) - cast(s.sv[i] AS DOUBLE))
          |         * (cast(e.embedding[i] AS DOUBLE) - cast(s.sv[i] AS DOUBLE)))) AS dist
          |  FROM embeddings e CROSS JOIN s),
          |a AS (SELECT vec_id, idx,
          |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, idx) AS rn
          |  FROM d)
          |SELECT cast(idx AS BIGINT) AS cluster, count(*) AS n,
          |  cast(sum(vec_id) AS BIGINT) AS sum_ids
          |FROM a WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,

      // verified-exact simhash pairs = text-equality self-join (recall 1
      // for identical texts by construction of the 4-block index)
      "dedup_simhash_pairs" ->
        """WITH d AS (SELECT doc_id,
          |  CASE WHEN doc_id % 17 = 3 THEN 'shared template ' ||
          |    cast(doc_id % 2 AS VARCHAR) ||
          |    ' body of identical tokens for simhash grouping'
          |  ELSE text END AS t FROM documents)
          |SELECT least(a.doc_id, b.doc_id) AS id_a,
          |       greatest(a.doc_id, b.doc_id) AS id_b
          |FROM d a JOIN d b ON a.t = b.t AND a.doc_id < b.doc_id""".stripMargin,

      // ft_dataset.py replay: paragraph slices keep their terminating
      // newline (utils.py:92-98), so newlines=replace maps every non-final
      // paragraph to "part + space"; whitespace-only paragraphs drop; the
      // per-class cap is the n smallest lines by md5
      "ft_dataset_build" ->
        """WITH t AS (SELECT lang, replace(text, '. ', '.' || chr(10)) AS text2
          |           FROM documents WHERE length(text) > 0),
          |s AS (SELECT lang,
          |        unnest(string_split(text2, chr(10))) AS part,
          |        unnest(range(len(string_split(text2, chr(10))))) AS idx,
          |        len(string_split(text2, chr(10))) AS n
          |      FROM t),
          |k AS (SELECT lang,
          |        CASE WHEN idx < n - 1 THEN part || ' ' ELSE part END AS segtext
          |      FROM s
          |      WHERE trim(part, ' ' || chr(9) || chr(10) || chr(13)) <> ''),
          |pos AS (SELECT 'pos' AS label, '__label__pos ' || segtext AS line
          |        FROM k WHERE lang = 'en' ORDER BY md5(line) LIMIT 400),
          |neg AS (SELECT 'neg' AS label, '__label__neg ' || segtext AS line
          |        FROM k WHERE lang <> 'en' ORDER BY md5(line) LIMIT 400)
          |SELECT label, line FROM pos UNION ALL SELECT label, line FROM neg""".stripMargin,

      // planted-language texts: the model must recover the plant exactly
      "langid_fasttext" ->
        """SELECT doc_id,
          | CASE cast(doc_id % 4 AS INT) WHEN 0 THEN 'en' WHEN 1 THEN 'de'
          |   WHEN 2 THEN 'fr' ELSE 'es' END AS predicted_lang
          |FROM documents""".stripMargin,

      // toxicity: planted toxic tail on doc_id % 7 == 0; the in-repo
      // classifier separates cleanly at the 0.7 doc-rollup threshold
      // (verified at sf0.01 and sf0.1)
      "tag_toxicity_ft" ->
        """SELECT doc_id,
          | cast(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_toxic
          |FROM documents""".stripMargin,

      // linearized text of "<h1>t</h1><p>clean</p>" is "t\n" + trim(clean)
      // (or just "t" when clean is blank); sanitization mirrored exactly
      "warc_extract" ->
        """WITH c AS (SELECT doc_id,
          |  trim(regexp_replace(regexp_replace(text, '[&<>]', '', 'g'),
          |       '[ \t\n\r]+', ' ', 'g'), ' ') AS t
          | FROM documents)
          |SELECT doc_id,
          | 'docs.example.com/doc/' || cast(doc_id AS VARCHAR) AS url,
          | cast(CASE WHEN length(t) = 0 THEN 1 ELSE 2 + length(t) END AS BIGINT) AS n_chars
          |FROM c""".stripMargin,

      "tokens_sink" ->
        s"""SELECT doc_id, cast(len($wordsSql) + 1 AS BIGINT) AS n_tokens
           |FROM documents""".stripMargin,

      // sink -> reshard -> decode is the identity on every document
      "tokens_reshard" ->
        """SELECT doc_id, sha256(text) AS roundtrip_sha,
          | strlen(text) AS n_bytes
          |FROM documents""".stripMargin,

      // bigram LM scoring replayed from the same corpus counts; the
      // probability expression is rational double arithmetic evaluated in
      // the same association order on both engines (bit-exact), quantized
      // per bigram to floor(p*2^20) before the integer sum
      "lm_bigram_score" ->
        s"""WITH toks AS (SELECT doc_id, $wordsSql AS ws FROM documents),
           |bg AS (SELECT doc_id, unnest(ws[1:len(ws)-1]) AS w1,
           |         unnest(ws[2:len(ws)]) AS w2
           |       FROM toks WHERE len(ws) >= 2),
           |big AS (SELECT w1, w2, count(*) AS c_hw FROM bg GROUP BY 1, 2),
           |hist AS (SELECT w1, sum(c_hw) AS c_h, count(*) AS n1p FROM big GROUP BY 1),
           |uni AS (SELECT w2, count(*) AS c_w FROM bg GROUP BY 1),
           |tot AS (SELECT count(*) AS t FROM bg),
           |scored AS (SELECT bg.doc_id,
           |    cast(floor(((greatest(cast(big.c_hw AS DOUBLE) - 0.75, 0.0)
           |        / cast(hist.c_h AS DOUBLE))
           |      + ((0.75 * cast(hist.n1p AS DOUBLE) / cast(hist.c_h AS DOUBLE))
           |        * (cast(uni.c_w AS DOUBLE) / cast(tot.t AS DOUBLE))))
           |      * 1048576.0) AS BIGINT) AS q
           |  FROM bg JOIN big USING (w1, w2) JOIN hist USING (w1)
           |    JOIN uni USING (w2) CROSS JOIN tot),
           |per_doc AS (SELECT doc_id, sum(q) AS score, count(*) AS nb
           |  FROM scored GROUP BY 1)
           |SELECT d.doc_id,
           |  cast(coalesce(p.score, 0) AS BIGINT) AS score,
           |  cast(coalesce(p.nb, 0) AS BIGINT) AS n_bigrams
           |FROM documents d LEFT JOIN per_doc p USING (doc_id)""".stripMargin,

      // the order-2 KenLM replayed from verbatim table literals (the
      // ann_lsh_topk hyperplane pattern): observed bigram -> its logP,
      // else backoff(prev) + unigram logP (or unk). Double.toString
      // round-trips, so every literal parses to the identical double and
      // the per-token floor(lp*2^20) sums match bit-exactly.
      "kenlm_perplexity" -> {
        def sq(s: String) = "'" + s.replace("'", "''") + "'"
        val (uni, bi) = Models.codeLm2Dump
        val uniVals = uni.map { case (w, lp, bo) => s"(${sq(w)}, $lp, $bo)" }
          .mkString(", ")
        val biVals = bi.map { case (a, b, lp) => s"(${sq(a)}, ${sq(b)}, $lp)" }
          .mkString(", ")
        val unk = Models.codeLm2.unkLogProb.toDouble
        s"""WITH uni AS (SELECT w, cast(lp AS DOUBLE) AS lp, cast(bo AS DOUBLE) AS bo
           |  FROM (VALUES $uniVals) v(w, lp, bo)),
           |bi AS (SELECT w1, w2, cast(blp AS DOUBLE) AS blp
           |  FROM (VALUES $biVals) v(w1, w2, blp)),
           |toks AS (SELECT doc_id, $wordsLowerSql AS wl FROM documents),
           |tok AS (SELECT doc_id, unnest(wl) AS cur,
           |          unnest(range(1, len(wl) + 1)) AS i, len(wl) AS n
           |        FROM toks),
           |tk AS (SELECT doc_id, n, i, cur,
           |         lag(cur) OVER (PARTITION BY doc_id ORDER BY i) AS prev
           |       FROM tok),
           |scored AS (SELECT t.doc_id, t.n,
           |    CASE WHEN b.blp IS NOT NULL THEN b.blp
           |         ELSE coalesce(pu.bo, 0.0) + coalesce(cu.lp, cast($unk AS DOUBLE)) END AS v
           |  FROM tk t
           |  LEFT JOIN bi b ON t.prev = b.w1 AND t.cur = b.w2
           |  LEFT JOIN uni pu ON t.prev = pu.w
           |  LEFT JOIN uni cu ON t.cur = cu.w),
           |per_doc AS (SELECT doc_id, max(n) AS n_tokens,
           |    sum(cast(floor(v * 1048576.0) AS BIGINT)) AS score
           |  FROM scored GROUP BY 1)
           |SELECT d.doc_id,
           |  cast(coalesce(p.score, 0) AS BIGINT) AS score,
           |  cast(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens
           |FROM documents d LEFT JOIN per_doc p USING (doc_id)""".stripMargin
      },

      // BPE encode->decode must be the identity on every document
      "bpe_roundtrip" ->
        """SELECT doc_id, sha256(text) AS roundtrip_sha,
          | strlen(text) AS n_bytes
          |FROM documents""".stripMargin,

      // HF vocab loader: a merge-less byte vocab tokenizes every UTF-8
      // byte to one token (count = strlen); the exported in-repo BPE must
      // round-trip to the exact text; the dolma_v1_tokenizer tagger
      // strips first (reference length.py:172-175)
      "tag_hf_token_count" ->
        """SELECT doc_id,
          | strlen(text) AS n_tokens_bytes,
          | sha256(text) AS hf_roundtrip_sha,
          | strlen(trim(text, ' ' || chr(9) || chr(10) || chr(13))) AS v1_tokens
          |FROM documents""".stripMargin,

      // first-occurrence n-gram overlap; grams keyed by their string in
      // SQL (the Spark xxhash64 key is identity-only)
      "dedup_ngram_overlap" ->
        """WITH p AS (SELECT doc_id,
          |        unnest(string_split(text, chr(10))) AS para,
          |        unnest(range(0, len(string_split(text, chr(10))))) AS para_index
          |      FROM documents),
          |t AS (SELECT doc_id, para_index,
          |        list_filter(string_split_regex(para, '\s+'), x -> x <> '') AS toks
          |      FROM p WHERE trim(para) <> ''),
          |g AS (SELECT doc_id, para_index,
          |        unnest(CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
          |          ELSE list_transform(range(0, len(toks)-8+1), s0 -> array_to_string(toks[s0+1:s0+8], ' ')) END) AS gram
          |      FROM t),
          |m AS (SELECT doc_id, para_index,
          |        CASE WHEN row_number() OVER (PARTITION BY gram ORDER BY doc_id, para_index) > 1
          |         THEN 1 ELSE 0 END AS dup
          |      FROM g)
          |SELECT doc_id, para_index,
          | cast(sum(dup) AS DOUBLE) / cast(count(*) AS DOUBLE) AS overlap_fraction,
          | CASE WHEN cast(sum(dup) AS DOUBLE) / cast(count(*) AS DOUBLE) >= 0.7
          |  THEN 1 ELSE 0 END AS is_dup
          |FROM m GROUP BY 1, 2""".stripMargin,

      // at fp=1e-12 the Bloom probe is exact membership in expectation
      // (<<1 expected FP at this scale; Verify asserts the equality)
      "dedup_bloom_probe" ->
        """SELECT doc_id,
          | CASE WHEN text IN (SELECT text FROM documents WHERE doc_id % 2 = 0)
          |  THEN 1 ELSE 0 END AS might_contain
          |FROM documents""".stripMargin,

      // same exact-membership semantics through the sharded path
      "dedup_bloom_sharded" ->
        """SELECT doc_id,
          | CASE WHEN text IN (SELECT text FROM documents WHERE doc_id % 2 = 0)
          |  THEN 1 ELSE 0 END AS might_contain
          |FROM documents""".stripMargin,

      "ann_lsh_topk" ->
        s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
           |qb AS (SELECT cast(${lshBucketSql("qv")} AS BIGINT) AS qbucket FROM q),
           |e AS (SELECT vec_id, embedding, cast(${lshBucketSql("embedding")} AS BIGINT) AS bucket
           |      FROM embeddings WHERE vec_id <> 0)
           |SELECT e.vec_id,
           | list_sum(list_transform(range(1, len(e.embedding)+1),
           |   i -> cast(e.embedding[i] AS DOUBLE) * cast(q.qv[i] AS DOUBLE)))
           | / (sqrt(list_sum(list_transform(e.embedding, x -> cast(x AS DOUBLE)*cast(x AS DOUBLE))))
           |    * sqrt(list_sum(list_transform(q.qv, x -> cast(x AS DOUBLE)*cast(x AS DOUBLE)))))
           |  AS cosine
           |FROM e, q, qb
           |WHERE bit_count(xor(e.bucket, qb.qbucket)) <= 1
           |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin,

      // planted license links -> mangled attribute names by residue
      "tag_cc_license" ->
        """SELECT doc_id,
          | CASE cast(doc_id % 3 AS INT)
          |   WHEN 0 THEN 't__cc_re__cc_by_4_0'
          |   WHEN 1 THEN 't__cc_re__cc_by_nc_sa_3_0_es'
          |   ELSE 'none' END AS license
          |FROM documents""".stripMargin,

      // synthesized URLs: each blocklist family hits exactly one doc_id
      // residue class (hosts list needs the exact host, the link list the
      // cleaned host+path, the ABP host-anchor also catches the subdomain)
      "tag_url_blocklist" ->
        """SELECT doc_id,
          | cast(CASE WHEN doc_id % 5 = 1 THEN 1 ELSE 0 END AS BIGINT) AS hosts_hit,
          | cast(CASE WHEN doc_id % 5 = 2 THEN 1 ELSE 0 END AS BIGINT) AS link_hit,
          | cast(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS abp_hit,
          | cast(CASE WHEN doc_id % 5 = 3 THEN 1 ELSE 0 END AS BIGINT) AS allow_hit
          |FROM documents""".stripMargin,

      // constructed spans: ' echo'*k1 / ' brr'*k2 units match the char
      // repetition regex iff k>=4, at start 5 with length 5*k1 / 4*k2
      "tag_repetitions" ->
        """WITH k AS (SELECT doc_id, doc_id % 7 AS k1, (doc_id + 3) % 7 AS k2 FROM documents)
          |SELECT doc_id,
          | cast((CASE WHEN k1 >= 4 THEN 1 ELSE 0 END)
          |     + (CASE WHEN k2 >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
          | cast(greatest(CASE WHEN k1 >= 4 THEN k1 ELSE 0 END,
          |               CASE WHEN k2 >= 4 THEN k2 ELSE 0 END) AS BIGINT) AS max_score,
          | cast(greatest(CASE WHEN k1 >= 4 THEN 5*k1 ELSE 0 END,
          |               CASE WHEN k2 >= 4 THEN 4*k2 ELSE 0 END) AS BIGINT) AS max_len,
          | cast((CASE WHEN k1 >= 4 THEN 5*k1 ELSE 0 END)
          |     + (CASE WHEN k2 >= 4 THEN 4*k2 ELSE 0 END) AS DOUBLE)
          |  / cast(11 + 5*k1 + 4*k2 AS DOUBLE) AS frac
          |FROM k""".stripMargin,

      // planted blocks: even docs = (prose, code, code) x r, odd docs =
      // (prose, code) x r with r = doc_id % 3 + 1
      "tag_code_composition" ->
        """WITH k AS (SELECT doc_id, doc_id % 3 + 1 AS r FROM documents)
          |SELECT doc_id,
          | cast(2*r - 1 AS BIGINT) AS boundaries,
          | cast(CASE WHEN doc_id % 2 = 0 THEN 2*r ELSE r END AS BIGINT) AS code_cnt,
          | cast(r AS BIGINT) AS prose_cnt,
          | cast(CASE WHEN doc_id % 2 = 0 THEN 0.67 ELSE 0.5 END AS DOUBLE) AS code_pct,
          | cast(CASE WHEN doc_id % 2 = 0 THEN 0.33 ELSE 0.5 END AS DOUBLE) AS prose_pct
          |FROM k""".stripMargin,

      // image: real PNG raster dims; audio: real WAV decode (rate
      // 8000 Hz, mono, 1600+(i*37)%2048 frames); video: real per-frame
      // PNG decode of the GRFV container (first raster 32+(i*37)%64 ×
      // 24+(i*53)%48, 1+(i*29)%64 frames)
      "multimodal_features" ->
        """WITH f AS (SELECT 'm' || i AS id,
          |  CASE WHEN i % 3 = 0 THEN 'image' WHEN i % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
          |  cast(CASE WHEN i % 3 = 1 THEN 8000
          |       WHEN i % 3 = 2 THEN 32 + (i * 37) % 64
          |       ELSE 64 + (i * 37) % 512 END AS INT) AS width,
          |  cast(CASE WHEN i % 3 = 1 THEN 1
          |       WHEN i % 3 = 2 THEN 24 + (i * 53) % 48
          |       ELSE 64 + (i * 53) % 512 END AS INT) AS height,
          |  cast(CASE WHEN i % 3 = 2 THEN 1 + (i * 29) % 64
          |       WHEN i % 3 = 1 THEN 1600 + (i * 37) % 2048 ELSE 1 END AS INT) AS n_frames
          | FROM range(200) t(i))
          |SELECT id, media_type, width, height, n_frames,
          | cast(CASE WHEN greatest(width, height) <= 256 THEN width
          |   ELSE (width * 256) // greatest(width, height) END AS INT) AS out_width,
          | cast(CASE WHEN greatest(width, height) <= 256 THEN height
          |   ELSE (height * 256) // greatest(width, height) END AS INT) AS out_height
          |FROM f""".stripMargin,

      // every-4th-frame sampling with real pixel verification: frame f
      // of video i is a PNG of constant gray (i*7 + f*11) % 256, so the
      // sampled (0,0)-pixel sum is exact integer arithmetic
      "multimodal_frame_sample" ->
        """WITH v AS (SELECT i, 1 + (i * 29) % 64 AS frames
          |  FROM range(200) t(i) WHERE i % 3 = 2),
          |s AS (SELECT i, unnest(range(0, frames, 4)) AS f FROM v)
          |SELECT 'm' || i AS id,
          | cast(count(*) AS BIGINT) AS n_sampled,
          | cast(sum((i * 7 + f * 11) % 256) AS BIGINT) AS sum_gray
          |FROM s GROUP BY 1""".stripMargin
    ).map { case (k, v) => k -> v.replace("\n", " ") }
  }
}

/** Lazily-trained in-repo models (deterministic, tiny; see FIXTURES.md §5). */
object Models {
  lazy val langId: graft.ml.FastTextClassifier = {
    // synthetic per-language corpora with distinct character distributions
    val rng = new scala.util.Random(7L)
    val langWords = Map(
      "en" -> Vector("the", "and", "with", "that", "have", "from", "this", "value", "data", "stream"),
      "de" -> Vector("der", "die", "und", "nicht", "mit", "wert", "daten", "strom", "ein", "zu"),
      "fr" -> Vector("le", "la", "et", "est", "une", "pour", "dans", "valeur", "flux", "des"),
      "es" -> Vector("el", "la", "los", "que", "por", "con", "para", "valor", "datos", "una"),
      "zh" -> Vector("的", "是", "了", "在", "我", "有", "和", "不", "这", "人"))
    val examples = for {
      (lang, ws) <- langWords.toSeq.sortBy(_._1)
      _ <- 1 to 40
    } yield lang -> (1 to 20).map(_ => ws(rng.nextInt(ws.length))).mkString(" ")
    graft.ml.FastTextClassifier.train(examples, dim = 16, epochs = 8, seed = 7L)
  }

  lazy val codeLm: graft.ml.KenLm = {
    // train on clean synthetic code (the in-distribution corpus)
    val corpus = (0L until 200L).map(i =>
      graft.sources.CodeDocs.makeDoc(i, 1234L, 200L).content)
    graft.ml.KenLm.train(corpus, order = 3)
  }

  private lazy val lmCorpus: Seq[String] = (0L until 200L).map(i =>
    graft.sources.CodeDocs.makeDoc(i, 1234L, 200L).content)

  /** Order-2 variant of [[codeLm]] for the oracle-checkable perplexity
    * query: at order 2 the model tables are small enough (141 unigrams +
    * 1043 bigrams) to replay verbatim as literals in DuckDB SQL, the same
    * pattern as ann_lsh_topk's hyperplanes. */
  lazy val codeLm2: graft.ml.KenLm = graft.ml.KenLm.train(lmCorpus, order = 2)

  /** Byte-level BPE trained on the in-repo corpus (512 merges) — the real
    * subword vocabulary for the token sink (the reference's pretrained HF
    * vocabs are not fetchable offline; the ALGORITHM is the deliverable). */
  lazy val codeBpe: graft.ml.Bpe = graft.ml.Bpe.train(lmCorpus, numMerges = 512)

  /** [[codeBpe]] serialized to the public HF tokenizer.json format — the
    * loader's round-trip fixture (oracle `tag_hf_token_count`, MlSpec). */
  lazy val codeBpeHfJson: String = graft.ml.HfTokenizer.fromBpe(codeBpe)

  /** Word-keyed dump of [[codeLm2]]'s hash tables — (word, logP, logBackoff)
    * and (w1, w2, logP) — recovered by re-walking the training corpus
    * (every stored ngram is observed there). Floats are widened to Double
    * exactly as the scorer widens them, so `Double.toString` literals
    * round-trip bit-identically into DuckDB. */
  lazy val codeLm2Dump: (Seq[(String, Double, Double)], Seq[(String, String, Double)]) = {
    val lm = codeLm2
    val uni = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    val bi = scala.collection.mutable.LinkedHashMap.empty[(String, String), Double]
    lmCorpus.foreach { doc =>
      val toks = graft.ml.KenLm.tokenize(doc)
      toks.foreach { w =>
        if (!uni.contains(w)) {
          val (lp, bo) = lm.tables(1)(graft.ml.KenLm.ngramKey(Seq(w)))
          uni(w) = (lp.toDouble, bo.toDouble)
        }
      }
      toks.sliding(2).foreach {
        case Seq(a, b) =>
          if (!bi.contains((a, b)))
            bi((a, b)) = lm.tables(2)(graft.ml.KenLm.ngramKey(Seq(a, b)))._1.toDouble
        case _ =>
      }
    }
    (uni.iterator.map { case (w, (lp, bo)) => (w, lp, bo) }.toSeq,
      bi.iterator.map { case ((a, b), lp) => (a, b, lp) }.toSeq)
  }
}

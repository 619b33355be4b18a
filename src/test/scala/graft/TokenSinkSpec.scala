package graft

import graft.sources.TokenSink

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Token-array sink (the `dolma tokens` surface re-expressed). */
class TokenSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("token ids: hashed vocab, bounded range, eos separator") {
    val df = Seq("alpha beta gamma", "alpha", "").toDF("text")
      .select(TokenSink.tokenIds(col("text"), vocabSize = 1000).as("toks"))
    val rows = df.as[Seq[Int]].collect()
    assert(rows(0).length == 4 && rows(0).last == TokenSink.EosId)
    assert(rows(1).length == 2)
    assert(rows(2) == Seq(TokenSink.EosId)) // empty doc = just the separator
    assert(rows.flatten.forall(t => t == TokenSink.EosId ||
      (t >= TokenSink.FirstVocabId && t < 1000)))
    // determinism: same word, same id across docs
    assert(rows(0).head == rows(1).head)
  }

  test("shard write + metadata + binary roundtrip (uint16)") {
    val dir = Files.createTempDirectory("graft-tokens").toString
    val docs = (0 until 120).map(i => (s"doc$i", s"w${i % 7} w${i % 11} w${i % 13}"))
      .toDF("id", "text")
      .withColumn("toks", TokenSink.tokenIds(col("text"), vocabSize = 5000))
    val meta = TokenSink.writeShards(docs, col("id"), col("toks"), dir, numShards = 4)
    val collected = meta.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(collected.length == 120)
    // every doc's range length = its token count (3 words + eos)
    assert(collected.forall { case (_, _, s, e) => e - s == 4 })
    // offsets within each shard are dense and start at 0
    collected.groupBy(_._2).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3)
        case _ =>
      }
      // binary roundtrip: shard bytes decode to each doc's ids
      val ids = TokenSink.readShard(spark, dir, shard)
      assert(ids.length == sorted.last._4)
      sorted.foreach { case (id, _, s, e) =>
        val doc = docs.filter(col("id") === id)
          .select(col("toks")).as[Seq[Int]].head()
        assert(ids.slice(s.toInt, e.toInt).toSeq == doc)
      }
    }
    // uint32 variant roundtrips too
    val dir2 = Files.createTempDirectory("graft-tokens4").toString
    val meta2 = TokenSink.writeShards(docs, col("id"), col("toks"), dir2,
      bytesPerToken = 4, numShards = 2)
    val m2 = meta2.collect()
    assert(m2.length == 120)
    val shard2 = m2.head.getString(1)
    assert(TokenSink.readShard(spark, dir2, shard2, bytesPerToken = 4).nonEmpty)
  }

  test("shard sizing derives from total token count when numShards = 0") {
    val dir = Files.createTempDirectory("graft-tokens-sz").toString
    val docs = (0 until 64).map(i => (s"d$i", "a b c d e f g")).toDF("id", "text")
      .withColumn("toks", TokenSink.tokenIds(col("text")))
    // 64 docs x 8 tokens = 512 tokens; 128-token target => 4 shards
    val meta = TokenSink.writeShards(docs, col("id"), col("toks"), dir,
      targetTokensPerShard = 128L)
    assert(meta.select(col("shard")).distinct().count() == 4)
  }

  test("BPE ids through the shard sink decode back to the exact text") {
    val dir = Files.createTempDirectory("graft-tokens-bpe").toString
    val bpe = graft.ml.Bpe.train(
      (0 until 40).map(i => s"val x$i = compute(input$i) // comment $i"),
      numMerges = 128)
    val texts = (0 until 30).map(i => (s"d$i", s"val x$i = compute(input$i)"))
    val docs = texts.toDF("id", "text")
      .withColumn("toks", TokenSink.bpeTokenIds(col("text"), bpe))
    val meta = TokenSink.writeShards(docs, col("id"), col("toks"), dir,
      numShards = 2, bytesPerToken = 2)
    val byId = texts.toMap
    meta.collect().foreach { r =>
      val (id, shard, s, e) = (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      val ids = TokenSink.readShard(spark, dir, shard).slice(s.toInt, e.toInt)
      assert(ids.last == TokenSink.EosId)
      val decoded = bpe.decode(ids.dropRight(1).map(_ - TokenSink.FirstVocabId).toSeq)
      assert(decoded == byId(id))
    }
  }

  test("reshard merges undersized shards, rewrites offsets, and decode survives") {
    val src = Files.createTempDirectory("graft-reshard-s").toString
    val dst = Files.createTempDirectory("graft-reshard-d").toString
    val bpe = graft.ml.Bpe.train(
      (0 until 40).map(i => s"def fn$i(a, b): return a + b * $i"),
      numMerges = 96)
    val texts = (0 until 80).map(i => (s"d$i", s"def fn$i(a, b): return a + b * $i"))
    val docs = texts.toDF("id", "text")
      .withColumn("toks", TokenSink.bpeTokenIds(col("text"), bpe))
    val meta = TokenSink.writeShards(docs, col("id"), col("toks"), src,
      numShards = 12).localCheckpoint()
    assert(meta.select(col("shard")).distinct().count() >= 10)
    // floor chosen so several source shards merge per output shard
    val floor = 600L
    val newMeta = TokenSink.reshard(spark, src, meta, dst, minSizeBytes = floor)
    val rows = newMeta.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 80)
    val mergedShards = rows.map(_._2).distinct.sorted
    assert(mergedShards.length < 12, "resharding must reduce the shard count")
    // every merged shard reaches the floor except possibly the last
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val sizes = mergedShards.map(n => fs.getFileStatus(
      new org.apache.hadoop.fs.Path(dst, n)).getLen)
    sizes.dropRight(1).foreach(sz => assert(sz >= floor, s"$sz < $floor"))
    // offsets within each merged shard are dense, start at 0, and every
    // doc decodes to its exact original text from the merged bytes
    val byId = texts.toMap
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3)
        case _ =>
      }
      val ids = TokenSink.readShard(spark, dst, shard)
      assert(ids.length == sorted.last._4)
      sorted.foreach { case (id, _, s, e) =>
        val slice = ids.slice(s.toInt, e.toInt)
        assert(slice.last == TokenSink.EosId)
        assert(bpe.decode(slice.dropRight(1)
          .map(_ - TokenSink.FirstVocabId).toSeq) == byId(id))
      }
    }
  }

  test("reshard of an empty dataset returns empty metadata (no repartition(0) crash)") {
    val src = Files.createTempDirectory("graft-reshard-e").toString
    val dst = Files.createTempDirectory("graft-reshard-ed").toString
    import spark.implicits._
    val empty = Seq.empty[(String, String, Long, Long)]
      .toDF("id", "shard", "start", "end")
    val out = TokenSink.reshard(spark, src, empty, dst, minSizeBytes = 1024)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("id", "shard", "start", "end"))
  }

  test("uint16 overflow fails loudly instead of writing id mod 65536") {
    val dir = Files.createTempDirectory("graft-tokens-ovf").toString
    import spark.implicits._
    val docs = Seq(("d1", Seq(1, 70000))).toDF("id", "toks")
    val ex = intercept[Exception] {
      TokenSink.writeShards(docs, col("id"), col("toks"), dir,
        bytesPerToken = 2, numShards = 1).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("uint16")), chain(ex).mkString(" | "))
    // the same ids are legal at 4 bytes per token
    val meta = TokenSink.writeShards(docs, col("id"), col("toks"), dir + "/w4",
      bytesPerToken = 4, numShards = 1)
    val shard = meta.collect().head.getString(1)
    assert(TokenSink.readShard(spark, dir + "/w4", shard, bytesPerToken = 4)
      .toSeq == Seq(1, 70000))
  }

  test("dolma-layout sidecar quotes ids containing commas (RFC 4180)") {
    val dir = Files.createTempDirectory("graft-tokens-q-src").toString
    val dest = Files.createTempDirectory("graft-tokens-q-out").toString
    import spark.implicits._
    val docs = Seq(("http://x/a,b", "alpha beta"), ("plain", "gamma delta"))
      .toDF("id", "text")
      .withColumn("toks", TokenSink.tokenIds(col("text"), vocabSize = 4096))
    val meta = TokenSink.writeShards(docs, col("id"), col("toks"), dir, numShards = 1)
    meta.cache(); meta.count()
    TokenSink.exportDolmaLayout(dir, meta, dest)
    val shard = meta.collect().head.getString(1)
    val gz = new java.util.zip.GZIPInputStream(Files.newInputStream(
      java.nio.file.Paths.get(dest, shard.stripSuffix(".bin") + ".csv.gz")))
    val text = new String(gz.readAllBytes(), "UTF-8"); gz.close()
    // the comma-bearing id is quoted so consumers see exactly 5 columns
    assert(text.contains("\"http://x/a,b\""), text)
    val lines = text.split("\r\n").filter(_.nonEmpty)
    // a minimal RFC-4180 field count: quoted commas don't split
    def fields(l: String): Int = {
      var inQ = false; var n = 1
      l.foreach { c =>
        if (c == '"') inQ = !inQ else if (c == ',' && !inQ) n += 1
      }
      n
    }
    assert(lines.forall(fields(_) == 5), lines.mkString("\n"))
    meta.unpersist()
  }

  test("dolma-layout export: .npy byte-identical, .csv.gz sidecar rows match metadata") {
    val dir = Files.createTempDirectory("graft-tokens-dolma-src").toString
    val dest = Files.createTempDirectory("graft-tokens-dolma-out").toString
    val docs = (0 until 60).map(i => (s"doc$i", s"alpha b$i gamma"))
      .toDF("id", "text")
      .withColumn("toks", TokenSink.tokenIds(col("text"), vocabSize = 4096))
    val meta = TokenSink.writeShards(docs, col("id"), col("toks"), dir, numShards = 3)
    meta.cache(); meta.count()
    TokenSink.exportDolmaLayout(dir, meta, dest)
    val rows = meta.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._2).foreach { case (shard, ms) =>
      val stem = shard.stripSuffix(".bin")
      // raw-memmap parity: the .npy copy is byte-identical to the shard
      val orig = Files.readAllBytes(java.nio.file.Paths.get(dir, shard))
      val npy = Files.readAllBytes(java.nio.file.Paths.get(dest, s"$stem.npy"))
      assert(java.util.Arrays.equals(orig, npy), s"$shard bytes differ")
      // sidecar: start,end,id,src,pos rows ordered by start (csv.writer
      // excel dialect line ends)
      val gz = new java.util.zip.GZIPInputStream(
        Files.newInputStream(java.nio.file.Paths.get(dest, s"$stem.csv.gz")))
      val text = new String(gz.readAllBytes(), "UTF-8")
      gz.close()
      val lines = text.split("\r\n").filter(_.nonEmpty)
      assert(lines.length == ms.length)
      val expected = ms.sortBy(_._3)
      lines.zip(expected).zipWithIndex.foreach {
        case ((line, (id, _, s, e)), ordinal) =>
          assert(line == s"$s,$e,$id,$shard,$ordinal")
      }
    }
    meta.unpersist()
  }
}

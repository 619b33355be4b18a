package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Token-array sink — the Spark-native re-expression of `dolma tokens`
  * (/root/reference/python/dolma/tokenizer/executor.py:31-249,
  * memmap_writer.py:19-215): tokenize documents to bounded integer ids,
  * pack them into fixed-size little-endian binary shards (the memmap
  * layout trainers consume), and emit a metadata table mapping every
  * document to its (shard, start, end) token range.
  *
  * Differences from the reference, by design:
  *  - the HF BPE tokenizer is replaced by a deterministic hashed-vocab
  *    word tokenizer built from Catalyst expressions (no UDF, fully
  *    codegen'd) — the packing/sharding machinery is the deliverable, the
  *    vocabulary is pluggable;
  *  - the process-pool ring of memmap writers becomes one shard per Spark
  *    task: `repartition` sizes the shards, `mapPartitions` streams each
  *    partition's ids to its own file, and the per-doc offsets come back
  *    as an ordinary DataFrame (queryable, joinable — the reference's
  *    .csv.gz sidecars made relational);
  *  - the reference's `local_shuffle` buffer is `repartition` by id hash:
  *    pseudo-random document placement with cluster parallelism instead
  *    of a single-process shuffle window.
  */
object TokenSink {

  /** Reserved ids (0=pad, 1=bos, 2=eos, 3=unk; vocabulary starts at 4). */
  val PadId = 0
  val BosId = 1
  val EosId = 2
  val FirstVocabId = 4

  /** Deterministic hashed-vocabulary token ids of a text column with an
    * EOS separator appended (the reference requires bos or eos so
    * documents stay separable, executor.py:71-76). Pure Catalyst. */
  def tokenIds(textCol: Column, vocabSize: Int = 1 << 16, appendEos: Boolean = true): Column = {
    // null text tokenizes to [eos] like the empty string (the bpe/hf
    // paths null-guard the same way) — split(null) would propagate null
    // all the way into the shard writer
    val ws = filter(split(coalesce(textCol, lit("")), "\\s+"), w => w =!= "")
    val ids = transform(ws, w =>
      (pmod(xxhash64(w), lit(vocabSize - FirstVocabId)) + FirstVocabId).cast("int"))
    if (appendEos) concat(ids, array(lit(EosId))) else ids
  }

  /** Real-subword alternative to [[tokenIds]]: byte-level BPE ids
    * ([[graft.ml.Bpe]], trained in-repo), shifted by [[FirstVocabId]] so
    * the reserved pad/bos/eos/unk ids stay reserved. Decodable:
    * `bpe.decode(ids.map(_ - FirstVocabId))` reproduces the text exactly
    * (oracle `bpe_roundtrip`). */
  def bpeTokenIds(textCol: Column, bpe: graft.ml.Bpe,
      appendEos: Boolean = true): Column = {
    val enc = org.apache.spark.sql.functions.udf((s: String) => {
      val base = bpe.encode(if (s == null) "" else s).map(_ + FirstVocabId)
      if (appendEos) base :+ EosId else base
    })
    enc(textCol)
  }

  /** Pretrained-vocab ids via an HF-format `tokenizer.json`
    * ([[graft.ml.HfTokenizer]]) — the reference's own tokenizer data
    * path (tokenizer.py loads the same file format from the hub). Ids
    * are the vocab's NATIVE ids (no shift: a pretrained file defines its
    * own special ids); `eosId` appends the file's eos when given. The
    * model loads once per executor from `vocabPath` (cached), so only
    * the path string rides the closure. */
  def hfTokenIds(textCol: Column, vocabPath: String,
      eosId: Option[Int] = None, bosId: Option[Int] = None,
      segment: Boolean = false): Column = {
    val enc = org.apache.spark.sql.functions.udf((s: String) => {
      val tok = graft.ml.HfTokenizer.loadCached(vocabPath)
      val text = if (s == null) "" else s
      val base = if (segment) tok.encodeSegmented(text) else tok.encode(text)
      tok.addSpecialTokens(base, bosId, eosId)
    })
    enc(textCol)
  }

  val metadataSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("shard", StringType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false)))

  /** Write `(idCol, tokensCol)` rows as binary token shards under `dir`
    * and return the per-document metadata table. Each Spark task writes
    * exactly one `shard-NNNNN.bin` (uint16 little-endian when
    * `bytesPerToken` = 2, uint32 when 4 — memmap_writer.py:22-44); the
    * caller controls shard sizing through `numShards` (0 = derive from a
    * token-count pass targeting `targetTokensPerShard`).
    *
    * Scale shape: one repartition by id hash (the local_shuffle
    * equivalent), then a narrow streaming write — no driver involvement,
    * no global sort. Shards are written to task-unique names so retries
    * can't collide; the metadata row is emitted only after the shard's
    * stream is closed, so a committed metadata table references only
    * complete shards. */
  def writeShards(
      df: DataFrame,
      idCol: Column,
      tokensCol: Column,
      dir: String,
      bytesPerToken: Int = 2,
      numShards: Int = 0,
      targetTokensPerShard: Long = 512L * 1024 * 1024): DataFrame = {
    require(bytesPerToken == 2 || bytesPerToken == 4, "uint16 or uint32")
    val spark = df.sparkSession
    val prepared = df.select(idCol.cast("string").as("id"), tokensCol.as("toks"))
    val shards =
      if (numShards > 0) numShards
      else {
        val row = prepared.agg(sum(size(col("toks")))).head()
        val total = if (row.isNullAt(0)) 0L else row.getLong(0)
        math.max(1, math.ceil(total.toDouble / targetTokensPerShard).toInt)
      }
    val bpt = bytesPerToken
    // ship the DRIVER's Hadoop conf into tasks: a bare executor-side
    // Configuration would lose every spark.hadoop.* overlay (object-store
    // credentials/endpoints) and only work in local mode
    val sconf = new graft.runtime.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val out = prepared
      .repartition(shards, xxhash64(col("id")))
      .mapPartitions { rows =>
        if (rows.isEmpty) Iterator.empty
        else {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
          val name = f"shard-$pid%05d-$attempt.bin"
          val path = new org.apache.hadoop.fs.Path(dir, name)
          val fs = path.getFileSystem(sconf.value)
          val stream = new java.io.BufferedOutputStream(fs.create(path, true), 1 << 16)
          val meta = Vector.newBuilder[(String, String, Long, Long)]
          var written = 0L
          try {
            rows.foreach { row =>
              val id = row.getString(0)
              val toks0 = row.getSeq[Int](1)
              val toks = if (toks0 == null) Seq.empty[Int] else toks0
              val start = written
              toks.foreach { t =>
                // uint16 cannot hold ids >= 65536 (or negatives) — fail
                // loudly instead of writing id mod 2^16 into training
                // shards (the reference raises on the same dtype/vocab
                // mismatch, executor.py:406-409)
                if (bpt == 2 && (t >>> 16) != 0)
                  throw new IllegalArgumentException(
                    s"token id $t does not fit uint16 (doc $id); " +
                      "use bytes_per_token = 4 for vocabularies over 65536")
                stream.write(t & 0xff)
                stream.write((t >> 8) & 0xff)
                if (bpt == 4) { stream.write((t >> 16) & 0xff); stream.write((t >> 24) & 0xff) }
              }
              written += toks.length
              meta += ((id, name, start, written))
            }
          } finally stream.close()
          meta.result().iterator.map { case (id, s, a, b) => Row(id, s, a, b) }
        }
      }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(metadataSchema))
    out
  }

  /** Re-pack an existing token-shard directory so every output shard is
    * at least `minSizeBytes` (except possibly the last) — the Spark
    * re-expression of `dolma.tokenizer.reshard`
    * (/root/reference/python/dolma/tokenizer/reshard.py:123-160
    * group_paths_by_max_size, :86-120 merge_group): shards are grouped
    * greedily in name order (deterministic), each group is concatenated
    * by ONE task into `merged-NNNNN.bin` under `destDir` (byte-stream
    * copy — token width never re-decoded), and the metadata table comes
    * back with every document's (shard, start, end) shifted by its
    * member's position in the group. Offsets stay token-valued, as
    * [[writeShards]] wrote them.
    *
    * Scale shape: the driver touches only the O(#shards) name/size list
    * (same grain as the ledger); all byte movement is task-side streaming
    * with one task per output shard, and the metadata rewrite is a
    * broadcast join against the O(#shards) shift table — no shuffle of
    * the per-document rows. */
  def reshard(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      metadata: DataFrame, destDir: String, minSizeBytes: Long,
      bytesPerToken: Int = 2): DataFrame = {
    import spark.implicits._
    val srcPath = new org.apache.hadoop.fs.Path(srcDir)
    val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // shard inventory from the metadata table (the committed source of
    // truth — stray files in the dir are not part of the dataset)
    val shardNames = metadata.select(col("shard")).distinct()
      .collect().map(_.getString(0)).sorted
    // empty dataset (e.g. the mixer filtered every document): nothing to
    // merge, and repartition(0) below would throw — return the empty
    // metadata in the output shape
    if (shardNames.isEmpty)
      return metadata.select(col("id"), col("shard"), col("start"), col("end"))
    val sized = shardNames.map { s =>
      s -> fs.getFileStatus(new org.apache.hadoop.fs.Path(srcDir, s)).getLen
    }
    // greedy: accumulate until the group reaches the floor, then close it
    val groups = scala.collection.mutable.ArrayBuffer[Vector[(String, Long)]]()
    var current = Vector.empty[(String, Long)]
    var bytes = 0L
    sized.foreach { case (s, len) =>
      current :+= ((s, len)); bytes += len
      if (bytes >= minSizeBytes) { groups += current; current = Vector.empty; bytes = 0L }
    }
    if (current.nonEmpty) groups += current // tail group may stay under the floor
    val bpt = bytesPerToken
    // (newShard, oldShard, tokenShift) plan; byte lengths are exact
    // multiples of bytesPerToken by construction of writeShards
    val plan = groups.zipWithIndex.flatMap { case (members, gi) =>
      val newName = f"merged-$gi%05d.bin"
      members.scanLeft(("", "", 0L)) { case ((_, _, acc), (old, len)) =>
        (newName, old, acc + len / bpt)
      }.drop(1).zip(members).map { case ((nn, old, cumEnd), (_, len)) =>
        (nn, old, cumEnd - len / bpt)
      }
    }.toVector
    val src = srcDir // don't close over the FileSystem (not serializable)
    val sconf = new graft.runtime.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    spark.createDataset(groups.zipWithIndex.map { case (m, gi) =>
        (f"merged-$gi%05d.bin", m.map(_._1): Seq[String]) }.toVector)
      .repartition(groups.size)
      .foreach { case (newName, members) =>
        val outPath = new org.apache.hadoop.fs.Path(destDir, newName)
        val tfs = outPath.getFileSystem(sconf.value)
        // src and dest may live on DIFFERENT filesystems (cluster →
        // object store): resolve each side's own FS
        val sfs = new org.apache.hadoop.fs.Path(src).getFileSystem(sconf.value)
        // the output name must be deterministic (the returned metadata
        // references it), but two task ATTEMPTS (speculation, zombie
        // executors) must not interleave writes into it: stream to an
        // attempt-unique temp name, then rename into place — the same
        // collision discipline writeShards gets from its attempt-suffixed
        // names. Attempts write identical bytes, so whichever rename
        // lands is correct.
        val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
        val tmpPath = new org.apache.hadoop.fs.Path(destDir, s"$newName.$attempt.tmp")
        val out = new java.io.BufferedOutputStream(tfs.create(tmpPath, true), 1 << 16)
        try members.foreach { old =>
          val in = sfs.open(new org.apache.hadoop.fs.Path(src, old))
          try {
            val buf = new Array[Byte](1 << 16)
            var n = in.read(buf)
            while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
          } finally in.close()
        } finally out.close()
        if (tfs.exists(outPath)) tfs.delete(outPath, false) // stale prior run
        if (!tfs.rename(tmpPath, outPath)) tfs.delete(tmpPath, false)
        ()
      }
    val shifts = spark.createDataset(plan)
      .toDF("__new_shard", "shard", "__shift")
    metadata.join(broadcast(shifts), Seq("shard"))
      .select(col("id"), col("__new_shard").as("shard"),
        (col("start") + col("__shift")).as("start"),
        (col("end") + col("__shift")).as("end"))
  }

  /** Export a TokenSink directory in the reference's on-disk layout so
    * dolma's own downstream consumers (the OLMo data loader,
    * `dolma.tokenizer.reshard`) can read it directly: per shard a
    * `<stem>.npy` token file plus a `<stem>.csv.gz` metadata sidecar with
    * `start,end,id,src,pos` rows ordered by start
    * (memmap_writer.py:23-24,81-92; MemmapMetadata in data_types.py:45-50).
    * The `.npy` name notwithstanding, the reference writes via `np.memmap`
    * — a RAW little-endian buffer with no numpy header — which is exactly
    * [[writeShards]]' byte format, so the export is a stream copy.
    *
    * `src`/`pos` (originating file + position) are taken from metadata
    * columns of those names when present, else stamped with the shard name
    * and the document's ordinal within the shard.
    *
    * Scale shape: one task per shard (groupByKey on the shard name); each
    * task streams the copy and writes its own sidecar — no driver I/O. */
  def exportDolmaLayout(srcDir: String, metadata: DataFrame, destDir: String): Unit = {
    val spark = metadata.sparkSession
    import spark.implicits._
    val hasSrc = metadata.columns.contains("src")
    val hasPos = metadata.columns.contains("pos")
    val rows = metadata.select(col("shard"), col("id"), col("start"), col("end"),
      (if (hasSrc) col("src") else col("shard")).cast("string").as("src"),
      (if (hasPos) col("pos") else lit(-1L)).cast("long").as("pos"))
      .as[(String, String, Long, Long, String, Long)]
    val from = srcDir
    val sconf = new graft.runtime.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    rows.groupByKey(_._1).flatMapGroups { (shard, it) =>
      val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
      val stem = shard.replaceAll("\\.bin$", "")
      val npyPath = new org.apache.hadoop.fs.Path(destDir, s"$stem.npy")
      val fs = npyPath.getFileSystem(sconf.value)
      val srcFs = new org.apache.hadoop.fs.Path(from).getFileSystem(sconf.value)
      // attempt-unique temp + rename: two concurrent attempts must not
      // interleave into the deterministic output names (see reshard)
      def committed(finalPath: org.apache.hadoop.fs.Path)(
          write: java.io.OutputStream => Unit): Unit = {
        val tmp = new org.apache.hadoop.fs.Path(destDir,
          s"${finalPath.getName}.$attempt.tmp")
        val out = fs.create(tmp, true)
        try write(out) finally out.close()
        if (fs.exists(finalPath)) fs.delete(finalPath, false)
        if (!fs.rename(tmp, finalPath)) fs.delete(tmp, false)
      }
      committed(npyPath) { raw =>
        val out = new java.io.BufferedOutputStream(raw, 1 << 16)
        val in = srcFs.open(new org.apache.hadoop.fs.Path(from, shard))
        try {
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
        } finally { in.close(); out.flush() }
      }
      // RFC-4180 quoting, like the reference's csv.writer: ids/srcs are
      // arbitrary corpus strings — a comma in a URL id would otherwise
      // shift every downstream consumer's columns
      def q(s: String): String =
        if (s != null && s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
          "\"" + s.replace("\"", "\"\"") + "\""
        else s
      val csvPath = new org.apache.hadoop.fs.Path(destDir, s"$stem.csv.gz")
      committed(csvPath) { raw =>
        val gz = new java.util.zip.GZIPOutputStream(raw)
        val w = new java.io.OutputStreamWriter(gz, "UTF-8")
        it.toVector.sortBy(_._3).zipWithIndex.foreach {
          case ((_, id, start, end, src, pos), ordinal) =>
            val p = if (pos >= 0) pos else ordinal.toLong
            w.write(s"$start,$end,${q(id)},${q(src)},$p\r\n")
        }
        w.flush(); gz.finish()
      }
      Iterator.single(shard)
    }.collect()
    ()
  }

  /** Read one shard back as token ids (test/audit path). */
  def readShard(spark: org.apache.spark.sql.SparkSession, dir: String,
      shard: String, bytesPerToken: Int = 2): Array[Int] = {
    val path = new org.apache.hadoop.fs.Path(dir, shard)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(path).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(path)
    try in.readFully(0, bytes) finally in.close()
    val n = len / bytesPerToken
    Array.tabulate(n) { i =>
      val o = i * bytesPerToken
      if (bytesPerToken == 2) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      else (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    }
  }
}

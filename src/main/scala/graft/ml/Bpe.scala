package graft.ml

import scala.collection.mutable

/** Deterministic byte-level BPE (Sennrich 2016 "Neural Machine
  * Translation of Rare Words with Subword Units"; byte-level alphabet per
  * GPT-2, Radford 2019). The reference tokenizes with pretrained HF BPE
  * vocabularies (python/dolma/tokenizer/tokenizer.py) that are not
  * fetchable in this sandbox — this is the real algorithm trained on the
  * in-repo corpus, so the token sink can pack genuine subword ids instead
  * of hashed whole words.
  *
  * Training: start from the 256 single-byte tokens; repeatedly merge the
  * most frequent adjacent pair (ties broken by lowest id pair — fully
  * deterministic) until `numMerges` merges exist. Pieces never merge
  * across pre-token boundaries; pre-tokenization is the GPT-2 ByteLevel
  * regex ([[graft.taggers.LengthTaggers.OlmoPreTokenizer.gpt2Pieces]]) —
  * the same pipeline the HF-format export declares, so a model exported
  * via [[HfTokenizer.fromBpe]] and re-loaded reproduces identical id
  * sequences.
  *
  * Encoding is the standard lowest-rank merge loop; decoding concatenates
  * the learned byte sequences — `decode(encode(s)) == s` for EVERY
  * string (byte-level alphabet ⇒ no unk), which is the oracle surface
  * (`bpe_roundtrip`).
  *
  * The model is immutable — broadcast it; encode inside mapPartitions or
  * through [[encodeUdf]].
  */
final class Bpe(
    // merge (idA, idB) -> merged id, rank = mergedId - 256 (creation order)
    val merges: Map[(Int, Int), Int],
    // id -> byte sequence (ids 0-255 are the single bytes)
    val vocabBytes: Array[Array[Byte]]) extends Serializable {

  def vocabSize: Int = vocabBytes.length

  // primitive-keyed view of `merges` for the encode hot loop: the tuple
  // map allocates a boxed (Int, Int) per lookup and the merge loop does
  // one lookup per adjacent pair per iteration. Rebuilt lazily after
  // deserialization (transient), so broadcasts ship only `merges`.
  @transient private lazy val mergesLong: java.util.HashMap[Long, Integer] = {
    val m = new java.util.HashMap[Long, Integer](merges.size * 2)
    merges.foreach { case ((a, b), id) => m.put((a.toLong << 32) | b.toLong, id) }
    m
  }

  /** Encode one pre-token piece (bytes) by the lowest-merged-id-first
    * merge loop. */
  private def encodePiece(bytes: Array[Byte]): Array[Int] = {
    if (bytes.isEmpty) return Array.empty
    var ids = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { ids(i) = bytes(i) & 0xff; i += 1 }
    val ml = mergesLong
    var done = false
    while (!done && ids.length >= 2) {
      // find the adjacent pair whose merged id is smallest (= earliest
      // learned = highest priority, the standard BPE rank rule)
      var best = -1
      var bestAt = -1
      var j = 0
      while (j < ids.length - 1) {
        val m = ml.get((ids(j).toLong << 32) | ids(j + 1).toLong)
        if (m != null && (best < 0 || m < best)) { best = m; bestAt = j }
        j += 1
      }
      if (best < 0) done = true
      else {
        // merge EVERY occurrence of that pair left-to-right
        val out = new mutable.ArrayBuffer[Int](ids.length)
        var k = 0
        while (k < ids.length) {
          if (k < ids.length - 1 && ids(k) == ids(bestAt) &&
              ids(k + 1) == ids(bestAt + 1)) {
            out += best; k += 2
          } else { out += ids(k); k += 1 }
        }
        ids = out.toArray
      }
    }
    ids
  }

  def encode(text: String): Array[Int] =
    Bpe.pretokenize(text).iterator
      .flatMap(p => encodePiece(p.getBytes("UTF-8"))).toArray

  def decode(ids: Seq[Int]): String = {
    val out = new java.io.ByteArrayOutputStream()
    ids.foreach { id =>
      require(id >= 0 && id < vocabBytes.length, s"bad token id $id")
      out.write(vocabBytes(id))
    }
    new String(out.toByteArray, "UTF-8")
  }

  /** Column encoder (UDF — BPE's data-dependent merge loop has no
    * Catalyst expression form; the model rides the closure → broadcast). */
  def encodeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((s: String) =>
      if (s == null) Array.empty[Int] else encode(s))
}

object Bpe {

  /** GPT-2 ByteLevel(use_regex) pre-tokenization: the published GPT-2
    * regex tiles the input exhaustively (pieces concatenate back to the
    * input), keeping leading spaces attached to the following word —
    * merges never cross piece boundaries. */
  def pretokenize(text: String): Vector[String] =
    graft.taggers.LengthTaggers.OlmoPreTokenizer.gpt2Pieces(text)

  /** Deterministic training. */
  def train(corpus: Seq[String], numMerges: Int = 512): Bpe = {
    // piece frequency table (training on distinct pieces × counts keeps
    // the merge loop O(distinct pieces) per iteration)
    val pieceCounts = mutable.HashMap.empty[String, Long]
    corpus.foreach(doc => pretokenize(doc).foreach { p =>
      pieceCounts.update(p, pieceCounts.getOrElse(p, 0L) + 1L)
    })
    // current tokenization of each distinct piece
    var seqs: Array[(Array[Int], Long)] = pieceCounts.iterator.map { case (p, c) =>
      (p.getBytes("UTF-8").map(_ & 0xff), c)
    }.toArray

    val merges = mutable.HashMap.empty[(Int, Int), Int]
    val vocab = mutable.ArrayBuffer.empty[Array[Byte]]
    (0 until 256).foreach(b => vocab += Array(b.toByte))

    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(Int, Int), Long]
      seqs.foreach { case (ids, c) =>
        var i = 0
        while (i < ids.length - 1) {
          val k = (ids(i), ids(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max count; ties -> smallest (idA, idB) for determinism
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        if (cnt < 2) exhausted = true // nothing repeats; stop
        else {
          val newId = vocab.length
          merges.update((a, b), newId)
          vocab += (vocab(a) ++ vocab(b))
          // apply the merge to every sequence
          seqs = seqs.map { case (ids, c) =>
            if (ids.length < 2) (ids, c)
            else {
              val out = new mutable.ArrayBuffer[Int](ids.length)
              var i = 0
              while (i < ids.length) {
                if (i < ids.length - 1 && ids(i) == a && ids(i + 1) == b) {
                  out += newId; i += 2
                } else { out += ids(i); i += 1 }
              }
              (out.toArray, c)
            }
          }
          m += 1
        }
      }
    }
    new Bpe(merges.toMap, vocab.toArray)
  }

  /** Distributed trainer: identical merges to [[train]] (same counts,
    * same ties), with the corpus-scale work distributed — the 100 TB
    * shape. The driver never holds the piece table: per iteration the
    * adjacent-pair counts are a `reduceByKey` over the distributed
    * distinct-piece table (map-side combined, O(distinct pairs) shuffle
    * rows) and only the single argmax pair comes back (`takeOrdered(1)`
    * with the exact (-count, idA, idB) tie order of [[train]]); the
    * merge is then applied as a narrow `map`. The piece table is an RDD
    * by design — 512 sequential `Dataset.map` steps would build a
    * 512-deep Catalyst plan re-analyzed every iteration; the RDD pays no
    * per-iteration planning and is truncated with `localCheckpoint`
    * every `checkpointEvery` merges to bound lineage. Training is a
    * one-off: determinism, not wall-clock, is the contract (spec pins
    * merge-for-merge equality with [[train]]). */
  def trainDistributed(corpus: org.apache.spark.sql.Dataset[String],
      numMerges: Int = 512, checkpointEvery: Int = 16): Bpe = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var seqs: org.apache.spark.rdd.RDD[(Array[Int], Long)] = corpus
      .flatMap(t => pretokenize(if (t == null) "" else t))
      .groupBy("value").count()
      .as[(String, Long)].rdd
      .map { case (p, c) => (p.getBytes("UTF-8").map(_ & 0xff), c) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val merges = mutable.HashMap.empty[(Int, Int), Int]
    val vocab = mutable.ArrayBuffer.empty[Array[Byte]]
    (0 until 256).foreach(b => vocab += Array(b.toByte))

    implicit val ord: Ordering[((Int, Int), Long)] =
      Ordering.by { case ((a, b), c) => (-c, a, b) }
    var m = 0
    var exhausted = false
    try {
      while (m < numMerges && !exhausted) {
        val best = seqs.flatMap { case (ids, c) =>
          (0 until ids.length - 1).iterator.map(i => ((ids(i), ids(i + 1)), c))
        }.reduceByKey(_ + _).takeOrdered(1)
        best.headOption match {
          case Some(((a, b), cnt)) if cnt >= 2 =>
            val newId = vocab.length
            merges.update((a, b), newId)
            vocab += (vocab(a) ++ vocab(b))
            val prev = seqs
            seqs = prev.map { case (ids, c) =>
              if (ids.length < 2) (ids, c)
              else {
                val out = new mutable.ArrayBuffer[Int](ids.length)
                var i = 0
                while (i < ids.length) {
                  if (i < ids.length - 1 && ids(i) == a && ids(i + 1) == b) {
                    out += newId; i += 2
                  } else { out += ids(i); i += 1 }
                }
                (out.toArray, c)
              }
            }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            if ((m + 1) % checkpointEvery == 0) seqs.localCheckpoint()
            seqs.count()
            prev.unpersist(blocking = false)
            m += 1
          case _ => exhausted = true // nothing repeats (or empty corpus)
        }
      }
    } finally seqs.unpersist(blocking = false)
    new Bpe(merges.toMap, vocab.toArray)
  }
}

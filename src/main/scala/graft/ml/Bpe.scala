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
  * across pre-token boundaries; pre-tokenization is whitespace-preserving
  * GPT-2-style via [[graft.taggers.LengthTaggers.OlmoPreTokenizer]]'s
  * byte-level regex family (here: split before each space run so leading
  * spaces attach to the following word, the GPT-2 convention).
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

  /** Encode one pre-token piece (bytes) by the lowest-merged-id-first
    * merge loop. */
  private def encodePiece(bytes: Array[Byte]): Array[Int] = {
    if (bytes.isEmpty) return Array.empty
    var ids = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { ids(i) = bytes(i) & 0xff; i += 1 }
    var done = false
    while (!done && ids.length >= 2) {
      // find the adjacent pair whose merged id is smallest (= earliest
      // learned = highest priority, the standard BPE rank rule)
      var best = -1
      var bestAt = -1
      var j = 0
      while (j < ids.length - 1) {
        merges.get((ids(j), ids(j + 1))) match {
          case Some(m) if best < 0 || m < best => best = m; bestAt = j
          case _ =>
        }
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

  /** GPT-2-style whitespace-preserving pre-tokenization: split so each
    * piece is a maximal run of non-space characters with its preceding
    * space run attached (" hello") — merges never cross these
    * boundaries. Exhaustive (pieces concatenate back to the input). */
  def pretokenize(text: String): Vector[String] = {
    if (text.isEmpty) return Vector.empty
    val out = Vector.newBuilder[String]
    var start = 0
    var i = 0
    def isSp(c: Char) = Character.isWhitespace(c)
    while (i < text.length) {
      // a piece = [whitespace run][non-whitespace run] (either may be
      // empty, not both)
      var j = i
      while (j < text.length && isSp(text.charAt(j))) j += 1
      while (j < text.length && !isSp(text.charAt(j))) j += 1
      out += text.substring(start, j)
      i = j
      start = j
    }
    out.result()
  }

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
}

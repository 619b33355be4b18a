package graft.ml

import scala.collection.mutable

/** Loader/encoder for the public Hugging Face `tokenizer.json` format
  * (the `tokenizers` crate serialization): a byte-level BPE model —
  * `model.vocab` maps token strings to ids, `model.merges` lists merge
  * pairs in rank order, and token strings use the GPT-2 byte-to-unicode
  * alphabet (Radford 2019, gpt-2/src/encoder.py `bytes_to_unicode`).
  *
  * This closes the reference's last vocab-dependent registry gap: the
  * `dolma_v1_tokenizer` / `dolma_v2_tokenizer` taggers
  * (reference taggers/length.py:163-178) load pretrained vocabs from the
  * HF hub, which is unreachable offline — here the caller provides the
  * same public-format file via `$GRAFT_VOCAB_DIR/<tagger>.json` (or
  * `$GRAFT_VOCAB_FILE` for all names), the convention the URL-blocklist
  * taggers already use for their list data.
  *
  * The model is immutable and Serializable — broadcast it; encode inside
  * mapPartitions or a UDF. Encoding is the standard lowest-rank merge
  * loop; byte-level alphabets have no unk, and a vocab that fails to
  * cover its own alphabet fails loudly rather than skipping tokens.
  */
final class HfTokenizer(
    val vocab: Map[String, Int],
    idToToken: Map[Int, String],
    ranks: Map[(String, String), Int],
    pretokKind: String,
    normOps: List[(String, String, String)] = Nil,
    byteFallback: Boolean = false,
    addedTokens: Vector[(String, Int)] = Vector.empty,
    unkId: Option[Int] = None,
    val hasPrefix: Boolean = false,
    // pre-tokenizer-side add_prefix_space (distinct from the Prepend
    // NORMALIZER, which normalize() applies): the ByteLevel pre-tokenizer
    // prepends ' ' to each segment that doesn't already start with one
    byteLevelPrefix: Boolean = false) extends Serializable {

  def vocabSize: Int = vocab.size

  private def pretokenize(text: String): Vector[String] = pretokKind match {
    case "olmo" => graft.taggers.LengthTaggers.OlmoPreTokenizer.pieces(text)
    case _ => graft.taggers.LengthTaggers.OlmoPreTokenizer.gpt2Pieces(text)
  }

  /** Apply the tokenizer.json normalizer pipeline (NFC / Lowercase /
    * Prepend / Replace / Sequence-flattened) in declared order. */
  private def normalize(text: String): String =
    normOps.foldLeft(text) { case (s, (op, a, b)) =>
      op match {
        case "NFC" => java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
        case "NFKC" => java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
        case "NFD" => java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
        case "NFKD" => java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)
        case "Lowercase" => s.toLowerCase(java.util.Locale.ROOT)
        case "Prepend" => if (s.isEmpty) s else a + s
        case "Replace" => s.replace(a, b)
        case other => throw new IllegalArgumentException(
          s"unsupported normalizer '$other' in tokenizer.json")
      }
    }

  /** One pre-token piece: bytes → byte-level chars → merge loop → ids.
    * Uses the same O(n log n) PQ merge as the char-level path — real web
    * documents contain 100 KB single pieces (ASCII-art/separator/gibberish
    * letter- or punctuation-runs match one GPT-2 regex piece), where a
    * naive lowest-rank rescan loop is O(n²) and stalls an executor core
    * for minutes on one document. */
  private def encodePiece(piece: String): Vector[Int] = {
    val bytes = piece.getBytes("UTF-8")
    if (bytes.isEmpty) return Vector.empty
    val init = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) { init(i) = HfTokenizer.byteToChar(bytes(i) & 0xff); i += 1 }
    pqMerge(init).map { s =>
      vocab.getOrElse(s, throw new NoSuchElementException(
        s"token '$s' not in vocab (${vocab.size} entries) — the vocab file " +
          "does not cover its own byte-level alphabet"))
    }.toVector
  }

  /** Lowest-rank-first BPE merge via linked list + priority queue,
    * O(n log n): candidates ordered by (rank, leftmost position),
    * validated against staleness on pop. Each BPE pair has a unique rank,
    * so the pop order reproduces the lowest-rank-leftmost rescan exactly.
    * Shared by the byte-level piece path and the char-level
    * (SentencePiece-family) path. Returns surviving symbols in order. */
  private def pqMerge(init: Array[String]): Iterator[String] = {
    val n = init.length
    if (n == 0) return Iterator.empty
    val syms = init.clone()
    val next = Array.tabulate(n)(i => if (i == n - 1) -1 else i + 1)
    val prev = Array.tabulate(n)(i => i - 1)
    val alive = Array.fill(n)(true)
    final case class Cand(rank: Int, pos: Int, left: String, right: String)
    val pq = new java.util.PriorityQueue[Cand](math.max(1, n),
      (x: Cand, y: Cand) =>
        if (x.rank != y.rank) Integer.compare(x.rank, y.rank)
        else Integer.compare(x.pos, y.pos))
    def push(pos: Int): Unit = {
      val nx = next(pos)
      if (pos >= 0 && nx >= 0)
        ranks.get((syms(pos), syms(nx))).foreach(r =>
          pq.add(Cand(r, pos, syms(pos), syms(nx))))
    }
    (0 until n - 1).foreach(push)
    while (!pq.isEmpty) {
      val c = pq.poll()
      val nx = if (alive(c.pos)) next(c.pos) else -1
      if (nx >= 0 && alive(nx) && syms(c.pos) == c.left && syms(nx) == c.right) {
        syms(c.pos) = c.left + c.right
        alive(nx) = false
        next(c.pos) = next(nx)
        if (next(nx) >= 0) prev(next(nx)) = c.pos
        if (prev(c.pos) >= 0) push(prev(c.pos))
        push(c.pos)
      }
    }
    val out = Vector.newBuilder[String]
    var j = 0
    while (j >= 0) { if (alive(j)) out += syms(j); j = next(j) }
    out.result().iterator
  }

  /** Char-level BPE over the normalized text (the SentencePiece-style
    * llama family: no pre-tokenizer, the WHOLE document is one merge
    * arena). The naive lowest-rank rescan loop is O(n²) on documents, so
    * this path uses the standard linked-list + priority-queue merge:
    * candidates ordered by (rank, leftmost position), validated against
    * staleness on pop — O(n log n), same result (each BPE pair has a
    * unique rank, so pop order is deterministic). */
  private def encodeChars(s: String): Vector[Int] = {
    if (s.isEmpty) return Vector.empty
    // initial symbols: one per code point
    val init = new mutable.ArrayBuffer[String](s.length)
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      init += new String(Character.toChars(cp))
      ci += Character.charCount(cp)
    }
    val out = Vector.newBuilder[Int]
    pqMerge(init.toArray).foreach { t =>
      vocab.get(t) match {
        case Some(id) => out += id
        case None if byteFallback =>
          t.getBytes("UTF-8").foreach { b =>
            val bt = f"<0x${b & 0xff}%02X>"
            out += vocab.getOrElse(bt, throw new NoSuchElementException(
              s"byte-fallback token '$bt' missing from vocab"))
          }
        case None => out += unkId.getOrElse(throw new NoSuchElementException(
          s"token '$t' not in vocab and no unk_token defined"))
      }
    }
    out.result()
  }

  /** Split on added tokens (longest first, verbatim match) so PII masks
    * like `|||EMAIL_ADDRESS|||` become single ids, then encode each
    * intervening segment through the configured pipeline. */
  private def encodeSegment(seg: String): Iterator[Int] =
    if (pretokKind == "char") encodeChars(normalize(seg)).iterator
    else {
      val norm = normalize(seg)
      // ByteLevel add_prefix_space (HF ByteLevel pre-tokenizer): prepend
      // ' ' unless the segment already starts with one — without this,
      // the first token of every document differs from the reference ids
      val pre = if (byteLevelPrefix && norm.nonEmpty && !norm.startsWith(" "))
        " " + norm else norm
      pretokenize(pre).iterator.flatMap(encodePiece)
    }

  def encode(text: String): Array[Int] = {
    if (text.isEmpty) return Array.empty
    if (addedTokens.isEmpty) return encodeSegment(text).toArray
    val out = new mutable.ArrayBuffer[Int]
    var rest = text
    while (rest.nonEmpty) {
      // earliest occurrence of any added token; ties -> longest token
      var bestAt = -1; var bestTok = ""; var bestId = -1
      addedTokens.foreach { case (t, id) =>
        val at = rest.indexOf(t)
        if (at >= 0 && (bestAt < 0 || at < bestAt ||
            (at == bestAt && t.length > bestTok.length))) {
          bestAt = at; bestTok = t; bestId = id
        }
      }
      if (bestAt < 0) { out ++= encodeSegment(rest); rest = "" }
      else {
        if (bestAt > 0) out ++= encodeSegment(rest.substring(0, bestAt))
        out += bestId
        rest = rest.substring(bestAt + bestTok.length)
      }
    }
    out.toArray
  }

  def countTokens(text: String): Int = encode(text).length

  /** Paragraph-segmented encoding (tokenizer.py:283-311,
    * `segment_before_tokenization=True`): split the document into
    * `(^\n*|\n+)[^\n]*` paragraphs, encode each independently, and
    * concatenate. Prefix-adding tokenizers would re-prefix every
    * paragraph, changing the ids at paragraph seams — so each paragraph
    * after the first is encoded with a sacrificial leading space whose
    * (single) token is dropped at merge time. The reference uses this to
    * parallelize tokenization within a document; its tests pin segmented
    * == unsegmented on every fixture, and [[HfTokenizerGoldenSpec]]
    * replays that equality here. */
  def encodeSegmented(text: String): Array[Int] = {
    if (text.isEmpty) return Array.empty
    val paras = "(^\\n*|\\n+)[^\\n]*".r.findAllMatchIn(text).map(_.matched).toVector
    if (paras.length <= 1) return encode(text)
    val out = new mutable.ArrayBuffer[Int]
    paras.zipWithIndex.foreach { case (p, i) =>
      val ids =
        if (hasPrefix && i > 0) encode(" " + p).drop(1)
        else encode(p)
      out ++= ids
    }
    out.toArray
  }

  /** Insert bos / append eos when configured and not already present —
    * the reference wrapper's semantics (tokenizer.py:248-261), which it
    * applies OVER the base encoding (its post-processor templates are
    * bypassed via add_special_tokens=False). */
  def addSpecialTokens(ids: Array[Int], bosId: Option[Int], eosId: Option[Int]): Array[Int] = {
    if (ids.isEmpty) return ids
    val withBos = bosId match {
      case Some(b) if ids.head != b => b +: ids
      case _ => ids
    }
    eosId match {
      case Some(e) if withBos.last != e => withBos :+ e
      case _ => withBos
    }
  }

  def decode(ids: Seq[Int]): String = {
    val toks = ids.map(id => idToToken.getOrElse(id,
      throw new NoSuchElementException(s"unknown token id $id")))
    if (pretokKind == "char") {
      // llama-style decoder: byte-fallback tokens to raw bytes, U+2581 to
      // space, fuse, strip the single prepended leading space
      val bytes = new java.io.ByteArrayOutputStream(toks.map(_.length).sum)
      val ByteTok = "<0x([0-9A-Fa-f]{2})>".r
      toks.foreach {
        case ByteTok(h) => bytes.write(Integer.parseInt(h, 16))
        case t => bytes.write(t.replace('\u2581', ' ').getBytes("UTF-8"))
      }
      val s = new String(bytes.toByteArray, "UTF-8")
      if (s.startsWith(" ")) s.substring(1) else s
    } else {
      val chars = new StringBuilder
      toks.foreach(chars ++= _)
      val bytes = new java.io.ByteArrayOutputStream(chars.length)
      chars.foreach(c => bytes.write(HfTokenizer.charToByte(c)))
      new String(bytes.toByteArray, "UTF-8")
    }
  }
}

object HfTokenizer {

  // ---- GPT-2 byte-level alphabet ----------------------------------------
  // bytes_to_unicode: printable latin-1 ranges map to themselves; the
  // remaining 68 bytes map to U+0100.. in ascending byte order.
  private val byteToCharArr: Array[Char] = {
    val out = new Array[Char](256)
    val direct = (('!'.toInt to '~'.toInt) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    var n = 0
    (0 until 256).foreach { b =>
      if (direct(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }
  private val charToByteMap: Map[Char, Int] =
    byteToCharArr.zipWithIndex.map { case (c, b) => c -> b }.toMap

  def byteToChar(b: Int): String = String.valueOf(byteToCharArr(b))
  def charToByte(c: Char): Int =
    charToByteMap.getOrElse(c, throw new NoSuchElementException(
      f"char U+${c.toInt}%04X is not in the byte-level alphabet"))

  // ---- loading ----------------------------------------------------------
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Parse a `tokenizer.json` string. Accepts both published merge
    * shapes: `["tokA tokB", ...]` and `[["tokA","tokB"], ...]`. The
    * pre-tokenizer section selects the piece pipeline: a plain ByteLevel
    * (or absent) uses the GPT-2 regex; a Sequence (the OLMo
    * Split-punct/Split-digit/ByteLevel pipeline, reference
    * length.py:124-143) uses the OLMo pieces. */
  def parse(json: String): HfTokenizer = {
    import scala.jdk.CollectionConverters._
    val root = mapper.readTree(json)
    val model = root.get("model")
    require(model != null && model.get("vocab") != null,
      "not an HF tokenizer.json: missing model.vocab")
    val mtype = Option(model.get("type")).map(_.asText()).getOrElse("BPE")
    require(mtype == "BPE", s"unsupported model.type '$mtype' (only BPE)")
    val vocab = model.get("vocab").fields().asScala
      .map(e => e.getKey -> e.getValue.asInt()).toMap
    val merges = Option(model.get("merges")).map(_.elements().asScala.zipWithIndex.map {
      case (n, rank) =>
        val (a, b) =
          if (n.isArray) (n.get(0).asText(), n.get(1).asText())
          else {
            val s = n.asText(); val sp = s.indexOf(' ')
            require(sp > 0, s"malformed merge entry '$s'")
            (s.substring(0, sp), s.substring(sp + 1))
          }
        (a, b) -> rank
    }.toMap).getOrElse(Map.empty)
    // pre_tokenizer selects the piece pipeline: ByteLevel -> GPT-2 regex
    // pieces over the byte alphabet; Sequence -> the OLMo pipeline; ABSENT
    // (llama/SentencePiece family) -> "char": the whole normalized text is
    // one char-level merge arena with <0xXX> byte fallback.
    val preNode = root.get("pre_tokenizer")
    val pretokKind =
      if (preNode == null || preNode.isNull) "char"
      else Option(preNode.get("type")).map(_.asText()) match {
        case Some("ByteLevel") => "gpt2"
        case Some("Sequence") =>
          // the Sequence pipeline implemented here is the OLMo/GPT-NeoX
          // shape (Split regex + ByteLevel); anything else would silently
          // encode to wrong ids
          val members = Option(preNode.get("pretokenizers")).toList
            .flatMap(_.elements().asScala)
            .map(m => Option(m.get("type")).map(_.asText()).getOrElse("?"))
          require(members.nonEmpty && members.forall(Set("Split", "ByteLevel")),
            s"unsupported pre_tokenizer Sequence members $members " +
              "(only Split + ByteLevel)")
          "olmo"
        case other =>
          // a Metaspace/Whitespace/Digits file treated as byte-level
          // would produce wrong ids with no error — reject loudly, like
          // the normalizer path does
          throw new IllegalArgumentException(
            s"unsupported pre_tokenizer type ${other.getOrElse("<missing>")} " +
              "(supported: ByteLevel, Sequence(Split+ByteLevel), or absent " +
              "for the SentencePiece char-level family)")
      }
    def normList(n: com.fasterxml.jackson.databind.JsonNode): List[(String, String, String)] =
      Option(n).filterNot(_.isNull).toList.flatMap { node =>
        node.get("type").asText() match {
          case "Sequence" => node.get("normalizers").elements().asScala.toList.flatMap(normList)
          case "Prepend" => List(("Prepend", node.get("prepend").asText(), ""))
          case "Replace" =>
            val pat = node.get("pattern")
            val p = Option(pat.get("String")).map(_.asText()).getOrElse(
              throw new IllegalArgumentException(
                "only String patterns supported in Replace normalizer"))
            List(("Replace", p, node.get("content").asText()))
          case t => List((t, "", ""))
        }
      }
    val normOps = normList(root.get("normalizer"))
    val byteFallback =
      Option(model.get("byte_fallback")).exists(_.asBoolean(false))
    val unkId = Option(model.get("unk_token")).filterNot(_.isNull)
      .map(_.asText()).flatMap(vocab.get)
    val added = Option(root.get("added_tokens")).map(_.elements().asScala.map { t =>
      t.get("content").asText() -> t.get("id").asInt()
    }.toVector.sortBy(-_._1.length)).getOrElse(Vector.empty)
    val fullVocab = vocab ++ added.filterNot { case (t, _) => vocab.contains(t) }
    // tokenizer_has_prefix (tokenizer.py:124-151): any pre-tokenizer with
    // add_prefix_space, or any Prepend normalizer
    def anyPrefixSpace(n: com.fasterxml.jackson.databind.JsonNode): Boolean =
      n != null && !n.isNull && (
        Option(n.get("add_prefix_space")).exists(_.asBoolean(false)) ||
          Option(n.get("pretokenizers")).exists(_.elements().asScala.exists(anyPrefixSpace)))
    val preSpace = anyPrefixSpace(preNode)
    val hasPrefix = preSpace || normOps.exists(_._1 == "Prepend")
    new HfTokenizer(fullVocab, fullVocab.map(_.swap), merges, pretokKind,
      normOps, byteFallback, added, unkId, hasPrefix,
      byteLevelPrefix = preSpace)
  }

  def load(path: String): HfTokenizer =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  // per-JVM cache: tagger instances are constructed per executor inside
  // mapPartitions; the parsed model is shared across them
  private val cache = scala.collection.concurrent.TrieMap.empty[String, HfTokenizer]
  def loadCached(path: String): HfTokenizer = cache.getOrElseUpdate(path, load(path))

  /** Resolve the vocab file for a tagger name: `$GRAFT_VOCAB_DIR/<name>
    * .json` first, then `$GRAFT_VOCAB_FILE` (system property or env var,
    * property wins — the URL-list convention). */
  def forTaggerName(name: String): HfTokenizer = {
    def setting(key: String): Option[String] =
      sys.props.get(key).orElse(sys.env.get(key)).filter(_.nonEmpty)
    val fromDir = setting("GRAFT_VOCAB_DIR").map(d => s"$d/$name.json")
      .filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
    val path = fromDir.orElse(setting("GRAFT_VOCAB_FILE")).getOrElse(
      throw new IllegalStateException(
        s"tagger '$name' needs a pretrained vocab the reference fetches from " +
          "the HF hub (allenai/gpt-neox-olmo-dolma-v1_5 / allenai/dolma2-tokenizer). " +
          s"Provide the public tokenizer.json as $$GRAFT_VOCAB_DIR/$name.json " +
          "or $GRAFT_VOCAB_FILE (system property or environment variable)."))
    loadCached(path)
  }

  /** A merge-less byte-alphabet vocab in HF format with ids assigned by
    * `idOf` (any bijection on 0..255). With no merges, every UTF-8 byte
    * becomes one token, so the token count of any text equals its byte
    * length — an analytically replayable oracle for the loader and the
    * byte-level alphabet mapping, with id lookup genuinely exercised when
    * `idOf` is not the identity. */
  def trivialByteVocabJson(idOf: Int => Int): String = {
    val node = mapper.createObjectNode()
    node.put("version", "1.0")
    val pre = node.putObject("pre_tokenizer")
    pre.put("type", "ByteLevel"); pre.put("add_prefix_space", false)
    pre.put("use_regex", true)
    val model = node.putObject("model")
    model.put("type", "BPE")
    val vocabNode = model.putObject("vocab")
    (0 until 256).foreach(b => vocabNode.put(byteToChar(b), idOf(b)))
    model.putArray("merges")
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
  }

  // ---- export (round-trip proof for the loader) -------------------------
  /** Serialize an in-repo [[Bpe]] model to the HF tokenizer.json format.
    * Ids are preserved (bytes 0-255 then merge-creation order), so a
    * loaded copy must reproduce the exact id sequences of the original
    * encoder — the loader's round-trip spec. */
  def fromBpe(bpe: Bpe): String = {
    def tokenStr(id: Int): String = {
      val sb = new StringBuilder
      bpe.vocabBytes(id).foreach(b => sb ++= byteToChar(b & 0xff))
      sb.toString
    }
    val node = mapper.createObjectNode()
    node.put("version", "1.0")
    val pre = node.putObject("pre_tokenizer")
    pre.put("type", "ByteLevel"); pre.put("add_prefix_space", false)
    pre.put("use_regex", true)
    val model = node.putObject("model")
    model.put("type", "BPE")
    val vocabNode = model.putObject("vocab")
    val seen = mutable.HashSet.empty[String]
    (0 until bpe.vocabSize).foreach { id =>
      val t = tokenStr(id)
      require(seen.add(t),
        s"duplicate surface form '$t' in BPE vocab — not exportable to the HF map format")
      vocabNode.put(t, id)
    }
    val mergesNode = model.putArray("merges")
    bpe.merges.toSeq.sortBy(_._2).foreach { case ((a, b), _) =>
      mergesNode.add(s"${tokenStr(a)} ${tokenStr(b)}")
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
  }
}

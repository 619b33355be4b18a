package graft.sources

import graft.core.Doc

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic corpus of source-code files matching the
  * BASELINE input table `(repo, path, commit, lang, content)` — the
  * FIXTURES.md generators. Content classes (seeded per doc id, no
  * wall-clock, no network):
  *   - clean code (per-lang comment syntax, identifier soup)
  *   - boilerplate-heavy (copyright headers — code_taggers.py:82-144 food)
  *   - pathological (minified long lines, repeated token runs)
  *   - PII-bearing (emails/phones/IPv4 in comments)
  *   - exact duplicates (every 23rd doc clones an earlier doc's content)
  *
  * Generated distributively via `spark.range(n)` → map (narrow, no driver
  * materialization): at bench scale this synthesizes millions of rows
  * without a single collect. Repos are Zipf-skewed so dedup/groupBy paths
  * exercise the salting/AQE skew handling.
  */
object CodeDocs {

  val Langs = Vector("python", "java", "javascript", "scala", "c", "html", "markdown", "text")

  private val Words = Vector(
    "data", "value", "result", "index", "count", "buffer", "stream", "parse",
    "merge", "filter", "config", "handler", "worker", "batch", "query", "token",
    "node", "cache", "shard", "offset", "table", "record", "field", "schema")

  def generate(spark: SparkSession, numDocs: Long, seed: Long = 42L): Dataset[Doc] = {
    import spark.implicits._
    spark.range(numDocs).map(i => makeDoc(i, seed, numDocs))
  }

  /** Pure function of (index, seed): stable across runs and partitionings. */
  def makeDoc(i: Long, seed: Long, numDocs: Long): Doc = {
    val rng = new scala.util.Random(mix(seed, i))
    // Zipf-ish repo skew: repo 0 holds ~30% of files
    val r = rng.nextDouble()
    val repoId =
      if (r < 0.3) 0
      else if (r < 0.5) 1 + rng.nextInt(4)
      else 5 + rng.nextInt(200)
    val repo = f"org${repoId % 37}%04d/repo-$repoId%d"
    val lang = Langs(rng.nextInt(Langs.length))
    val ext = lang match {
      case "python" => "py"; case "java" => "java"; case "javascript" => "js"
      case "scala" => "scala"; case "c" => "c"; case "html" => "html"
      case "markdown" => "md"; case _ => "txt"
    }
    val path = s"src/${Words(rng.nextInt(Words.length))}/${Words(rng.nextInt(Words.length))}_$i.$ext"
    val commit = f"${mix(seed + 1, i)}%016x${mix(seed + 2, i)}%016x${(mix(seed + 3, i) & 0xffffffffL)}%08x"

    // every 23rd doc duplicates an earlier doc's content exactly
    val content =
      if (i % 23 == 22 && i >= 23) makeContent(i - 23, seed, lang)
      else makeContent(i, seed, lang)
    Doc(repo, path, commit, lang, content)
  }

  private def makeContent(i: Long, seed: Long, lang: String): String = {
    val rng = new scala.util.Random(mix(seed * 31, i))
    val kind = rng.nextInt(10)
    val sb = new StringBuilder
    val (lineComment, blockOpen, blockClose) = lang match {
      case "python" | "markdown" | "text" => ("#", "\"\"\"", "\"\"\"")
      case _ => ("//", "/*", "*/")
    }
    // boilerplate header on ~30%
    if (kind <= 2) {
      sb.append(blockOpen).append('\n')
      sb.append(" * Copyright (c) 2021 Example Corp.\n")
      sb.append(" * Licensed under the Apache License, Version 2.0\n")
      sb.append(" ").append(blockClose).append('\n')
    }
    if (kind == 3) {
      // PII-bearing comments
      sb.append(s"$lineComment maintainer: dev${rng.nextInt(100)}@example.com \n")
      sb.append(s"$lineComment office: (${200 + rng.nextInt(700)}) ${200 + rng.nextInt(700)}-${1000 + rng.nextInt(9000)} \n")
      sb.append(s"$lineComment host: 10.${rng.nextInt(255)}.${rng.nextInt(255)}.${rng.nextInt(255)} \n")
    }
    if (kind == 6) {
      // toxic-comment paragraph (exercises the toxicity scrub path)
      val toxic = Vector("hate", "stupid", "idiot", "trash", "garbage", "awful")
      sb.append(lineComment).append(' ')
      var k = 0
      while (k < 8) { sb.append(toxic(rng.nextInt(toxic.length))).append(' '); k += 1 }
      sb.append('\n')
    }
    val lines = 5 + rng.nextInt(40)
    var l = 0
    while (l < lines) {
      if (kind == 4 && l == 2) {
        // pathological: one minified 1500-char line
        val word = Words(rng.nextInt(Words.length))
        while (sb.length < 1500) sb.append(word).append("(1);")
        sb.append('\n')
      } else if (kind == 5 && l == 3) {
        // repeated token run (period 2, 8 times)
        val a = Words(rng.nextInt(Words.length)); val b = Words(rng.nextInt(Words.length))
        var k = 0
        while (k < 8) { sb.append(a).append(' ').append(b).append(' '); k += 1 }
        sb.append('\n')
      } else {
        val isComment = rng.nextDouble() < 0.2
        if (isComment) sb.append(lineComment).append(' ')
        val n = 3 + rng.nextInt(8)
        var w = 0
        while (w < n) {
          sb.append(Words(rng.nextInt(Words.length)))
          if (!isComment && w == 0) sb.append(" = ")
          else sb.append(' ')
          w += 1
        }
        if (!isComment && lang != "python") sb.append(';')
        sb.append('\n')
      }
      l += 1
    }
    sb.toString
  }

  /** splitmix64-style deterministic mixer. */
  def mix(seed: Long, i: Long): Long = {
    var z = seed + i * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

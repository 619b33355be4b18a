package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprints (Charikar 2002; Manku et al. WWW'07
  * "Detecting Near-Duplicates for Web Crawling"): 64-bit signature whose
  * Hamming distance tracks cosine similarity of the word multiset.
  *
  * The signature is computed as a pure Catalyst expression pipeline (no
  * UDF): tokenize → per-token xxhash64 → per-bit vote via bitwise ops in
  * an `aggregate` fold → sign. Near-dup candidates at Hamming ≤ 3 are
  * found by the standard 4-block split: equal on any 16-bit block ⇒
  * candidate (pigeonhole), verified by exact Hamming distance.
  */
object SimHash {

  /** 64-bit simhash of the whitespace token multiset of `textCol`
    * (one-pass custom expression — the 64×`aggregate` Catalyst fold
    * re-walks the token array per bit). */
  def simhash64(textCol: Column): Column =
    graft.functions.Hashing.simhash64(textCol)

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  private def blockKey(sig: Column, blk: Int): Column =
    shiftright(sig, blk * 16).bitwiseAND(lit(0xffffL))

  /** Near-duplicate pairs with Hamming ≤ `maxDistance` (≤ 16 supported by
    * the 4-block pigeonhole index). One shuffle on block value.
    *
    * Pair-dedup is shuffle-free: a pair whose signatures agree on several
    * 16-bit blocks is emitted ONLY from the lowest matching block — the
    * "earlier blocks differ" predicate is computed from the two
    * signatures already riding the join row, so the former
    * `groupBy(id_a, id_b).min(distance)` exchange over the full candidate
    * pair stream (quadratic in hot-bucket size) disappears. The Hamming
    * distance is block-independent, so the emitted row is identical to
    * what the min-aggregate produced.
    *
    * Skew guard (same contract as [[MinHashLSH.nearDuplicatePairs]]):
    * short/templated/empty-ish docs concentrate signature blocks, and the
    * within-bucket pair join is quadratic in bucket size, so buckets over
    * `maxBucketSize` rows are dropped — observably: pass `dropObs` (a
    * fresh [[Observation]]) and read `dropped_rows` / `dropped_buckets`
    * after an action. The cap is a groupBy-count joined back on the block
    * key (map-side combined; the tiny size table broadcasts). AQE caveat
    * shared with MinHashLSH: a completely empty final output can be
    * empty-propagated over the metrics node (Observation reports {});
    * audit runs that must count drops even then should disable
    * `spark.sql.adaptive.enabled`. */
  def nearDuplicatePairs(df: DataFrame, idCol: Column, textCol: Column,
      maxDistance: Int = 3, maxBucketSize: Int = 1000,
      dropObs: Option[Observation] = None): DataFrame = {
    val sigs = df.select(idCol.as("id"), simhash64(textCol).as("sig"))
    val blocks = (0 until 4).map { blk =>
      struct(lit(blk).as("block"), blockKey(col("sig"), blk).as("key"))
    }
    // materialize the exploded block table ONCE, pre-partitioned and
    // sorted on the block key (MinHashLSH rationale): the size aggregate
    // and both self-join sides reuse the preserved partitioning with no
    // further exchange/sort, and the signature scan runs exactly once
    // instead of once per plan reference.
    val exploded = sigs.select(col("id"), col("sig"), explode(array(blocks: _*)).as("b"))
      .select(col("id"), col("sig"), col("b.block").as("block"), col("b.key").as("key"))
      .repartition(col("block"), col("key"))
      .sortWithinPartitions(col("block"), col("key"))
      .localCheckpoint()
    val capped =
      if (maxBucketSize == Int.MaxValue && dropObs.isEmpty) exploded
      else {
        val sizes = exploded.groupBy(col("block"), col("key"))
          .agg(count(lit(1)).as("__bsize"))
        val marked = exploded.join(sizes, Seq("block", "key"))
        // observe on the MAIN stream (post-join), not the aggregated side —
        // the tiny size table broadcasts, and metrics inside a broadcast
        // exchange never reach the Observation. Each oversized bucket's
        // rows count 1 each (Σ = dropped_rows) and 1/bsize each (Σ = exact
        // dropped-bucket count, rounded against fp drift).
        val observed = dropObs.map(o => marked.observe(o,
            sum(when(col("__bsize") > maxBucketSize, 1L).otherwise(0L))
              .as("dropped_rows"),
            round(sum(when(col("__bsize") > maxBucketSize,
                lit(1.0) / col("__bsize")).otherwise(lit(0.0))))
              .cast("long").as("dropped_buckets")))
          .getOrElse(marked)
        observed.filter(col("__bsize") <= maxBucketSize).drop("__bsize")
      }
    val a = capped.select(col("block"), col("key"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(col("block"), col("key"), col("id").as("id_b"), col("sig").as("sig_b"))
    // emit only from the lowest matching block: for block k require every
    // block e < k to DIFFER between the two signatures (recomputed from
    // sig_a/sig_b — the join key equality guarantees block k matches)
    val firstMatch = (1 until 4).foldLeft(when(col("block") === 0, lit(true))) {
      (acc, blk) =>
        acc.when(col("block") === blk,
          (0 until blk).map(e =>
            blockKey(col("sig_a"), e) =!= blockKey(col("sig_b"), e)).reduce(_ && _))
    }
    // merge hint (MinHashLSH rationale): the exploded sig table is
    // corpus-sized — it must never become a driver-built broadcast
    a.hint("merge").join(b, Seq("block", "key"))
      .filter(col("id_a") < col("id_b"))
      .filter(firstMatch)
      .select(col("id_a"), col("id_b"), hamming(col("sig_a"), col("sig_b")).as("distance"))
      .filter(col("distance") <= maxDistance)
  }
}

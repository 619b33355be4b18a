package graft.dedup

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.sketch.BloomFilter

/** BF-faithful dedup mode: reproduces the reference's Bloom-filter
  * semantics (/root/reference/src/bloom_filter.rs:15-98 — fixed bit array,
  * k seeded hashers, size-from-FP law at bloom_filter.rs:27-60) with
  * bounded memory. Where the reference shares one atomic bit array across
  * threads (bloom_filter.rs:214-235), Spark has no shared mutable state:
  * we build per-partition filters and OR-merge them on the driver
  * (`treeAggregate`-style via Spark's built-in mergeable BloomFilter),
  * then broadcast the result for read-only probing — the reference's
  * decontamination mode (docs/deduplication.md:36).
  *
  * Note the semantic difference from sequential probe-and-insert: a batch-
  * built filter contains ALL keys, so probing marks every member of a
  * duplicate cluster (including the first). For first-wins labeling use
  * [[Dedup.markDuplicates]]; use this for cross-corpus decontamination
  * where membership, not first-occurrence, is the question.
  */
object DistributedBloom {

  /** m bits for n items at the target FP rate, and the optimal k —
    * the sizing law of bloom_filter.rs:27-60. */
  def optimalSize(expectedItems: Long, fpRate: Double): (Long, Int) = {
    val m = math.ceil(-expectedItems * math.log(fpRate) / (math.log(2) * math.log(2))).toLong
    val k = math.max(1, math.round(m.toDouble / expectedItems * math.log(2)).toInt)
    (m, k)
  }

  /** Build a filter over a key column (distributed, one pass, no shuffle:
    * partial filters are built map-side and OR-merged). */
  def build(keys: Dataset[String], expectedItems: Long, fpRate: Double): BloomFilter = {
    keys.rdd.treeAggregate(
      BloomFilter.create(expectedItems, fpRate))(
      seqOp = (bf, k) => { bf.putString(k); bf },
      combOp = (a, b) => { a.mergeInPlace(b); a })
  }

  /** Probe: returns ids whose key is (probably) in the filter. */
  def probe(spark: SparkSession, df: Dataset[(String, String)], bf: BloomFilter): Dataset[(String, Boolean)] = {
    import spark.implicits._
    val bcast = spark.sparkContext.broadcast(bf)
    df.map { case (id, key) => (id, bcast.value.mightContainString(key)) }
  }
}

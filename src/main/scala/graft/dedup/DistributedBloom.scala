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

  // ---- sharded mode ----------------------------------------------------
  // One broadcast filter stops scaling around 1e9 keys (2.4 GB at FP 1e-4
  // per the sizing law above). Sharded mode hash-partitions the key space
  // into independent filters and CO-GROUPS probes with their shard's
  // filter: an executor only ever materializes the filters of the shards
  // it processes — memory per task is corpus-size-independent, and the
  // probe is one shuffle on the shard id.

  @inline def shardOf(key: String, shards: Int): Int =
    (key.hashCode & 0x7fffffff) % shards

  /** Build `shards` independent filters, each sized for its share of the
    * keys. Returns (shard, serialized filter) — a table small enough to
    * persist/reuse across decontamination runs. */
  def buildSharded(keys: Dataset[String], expectedItems: Long, fpRate: Double,
      shards: Int): Dataset[(Int, Array[Byte])] = {
    val spark = keys.sparkSession
    import spark.implicits._
    val perShard = math.max(64L, expectedItems / shards)
    keys.rdd.map(k => (shardOf(k, shards), k))
      .aggregateByKey(BloomFilter.create(perShard, fpRate), shards)(
        seqOp = (bf, k) => { bf.putString(k); bf },
        combOp = (a, b) => { a.mergeInPlace(b); a })
      .map { case (s, bf) =>
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        (s, bos.toByteArray)
      }.toDS()
  }

  /** Probe (id, key) rows against a sharded filter table: both sides
    * shuffle once on the shard id; each task deserializes exactly its
    * shard's filter. */
  def probeSharded(df: Dataset[(String, String)],
      filters: Dataset[(Int, Array[Byte])], shards: Int): Dataset[(String, Boolean)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.map { case (id, key) => (shardOf(key, shards), id, key) }
      .groupByKey(_._1)
      .cogroup(filters.groupByKey(_._1)) { (_, rows, bfs) =>
        val bf = bfs.toSeq.headOption.map(b =>
          BloomFilter.readFrom(new java.io.ByteArrayInputStream(b._2)))
        rows.map { case (_, id, key) =>
          (id, bf.exists(_.mightContainString(key)))
        }
      }
  }
}

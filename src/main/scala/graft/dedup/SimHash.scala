package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Near-duplicate pairs with Hamming ≤ `maxDistance` (≤ 16 supported by
    * the 4-block pigeonhole index). One shuffle on block value. */
  def nearDuplicatePairs(df: DataFrame, idCol: Column, textCol: Column,
      maxDistance: Int = 3): DataFrame = {
    val sigs = df.select(idCol.as("id"), simhash64(textCol).as("sig"))
    val blocks = (0 until 4).map { blk =>
      struct(lit(blk).as("block"),
        shiftright(col("sig"), blk * 16).bitwiseAND(lit(0xffffL)).as("key"))
    }
    val exploded = sigs.select(col("id"), col("sig"), explode(array(blocks: _*)).as("b"))
      .select(col("id"), col("sig"), col("b.block").as("block"), col("b.key").as("key"))
    val a = exploded.select(col("block"), col("key"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = exploded.select(col("block"), col("key"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("block", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sig_a"), col("sig_b")).as("distance"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("distance")).as("distance"))
      .filter(col("distance") <= maxDistance)
  }
}

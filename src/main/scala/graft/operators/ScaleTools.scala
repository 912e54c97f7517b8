package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Shuffle-shaping tools for 100 TB-scale joins:
 *
 *  - [[saltedJoin]]: breaks hot keys across `salts` shuffle partitions. The
 *    large (skewed) side gets a deterministic per-row salt; the small side is
 *    replicated `salts` times. Equivalent results to a plain inner join, but
 *    no single reducer receives a whole hot key. (AQE's skew-join handles
 *    sort-merge skew automatically; explicit salting is for the cases AQE
 *    can't re-split, e.g. aggregation-after-join chains or HashPartitioning
 *    reuse.)
 *
 *  - [[writeBucketed]] / co-located joins: persist both join sides bucketed
 *    by the join key into the (Hive) catalog so repeated joins/aggregations
 *    on that key shuffle ZERO rows — the scan is already hash-partitioned.
 *    This is the "pre-shuffle once, join forever" pattern that pays for
 *    itself after one reuse at large scale.
 */
object ScaleTools {

  /** Inner equi-join with the left (large, possibly skewed) side salted.
    * Result equals `left.join(right, leftKey === rightKey)`. */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0)
    // deterministic pseudo-random salt: spreads each key's rows evenly
    // without an RNG (reproducible plans and resilient retries)
    val salted = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val replicated = right.withColumn("_salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    // force a SHUFFLE join: salting exists to spread a skewed SHUFFLE key
    // across partitions — letting the optimizer broadcast the replicated side
    // would silently turn the demo into a plain broadcast join (where salting
    // is pointless anyway)
    salted.join(replicated.hint("shuffle_hash"),
        salted(leftKey) === replicated(rightKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** Write a DataFrame as a bucketed+sorted catalog table. Both sides of a
    * recurring join bucketed by the same key (same bucket count) join with no
    * shuffle exchange. */
  def writeBucketed(
      df: DataFrame, tableName: String, bucketCol: String, buckets: Int = 32,
      format: String = "parquet"): Unit =
    df.write
      .format(format)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(tableName) // managed table under spark.sql.warehouse.dir

  /** True if the physical plan of `df` contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Repartition a frame to a target partition count sized so each shuffle
    * partition holds ~`targetBytesPerPartition` (given an estimated total
    * size) — the knob that keeps partitions inside executor memory at scale. */
  def repartitionForSize(
      df: DataFrame, estimatedTotalBytes: Long,
      targetBytesPerPartition: Long = 128L * 1024 * 1024): DataFrame = {
    val parts = math.max(1, (estimatedTotalBytes / targetBytesPerPartition).toInt)
    df.repartition(parts)
  }
}

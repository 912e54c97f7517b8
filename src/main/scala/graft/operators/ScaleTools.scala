package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Membership filter whose PLAN SIZE stays O(1) however many values:
    * `df.filter(col(c).isin(values:_*))` inlines every value as a literal
    * into one `In` expression — codegen'd and ideal for a handful of query
    * terms, but at a 100k-token vocabulary the analyzed plan carries 100k
    * nodes that every optimizer rule pass walks (a planning hazard long
    * before execution). Past `inlineMax` the values become a BROADCAST
    * LEFT-SEMI join against a one-column local relation instead: identical
    * rows kept (both are exact membership, and `values` contain no nulls by
    * construction at the call sites), O(1) plan, one broadcast of the value
    * set. Law + plan shape pinned in ScaleToolsSpec. */
  def filterInValues(
      df: DataFrame, c: String, values: Seq[String], inlineMax: Int = 64): DataFrame =
    if (values.isEmpty) df.filter(lit(false))
    else if (values.size <= inlineMax) df.filter(col(c).isin(values: _*))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      df.join(broadcast(values.distinct.toDF(c)), Seq(c), "left_semi")
    }

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

  /** Deterministic, KEY-STABLE sampling: a row is kept iff
    * `xxhash64(seed, keys...) mod 1e9 < round(fraction * 1e9)`. Unlike
    * `df.sample()`/TABLESAMPLE this is reproducible across runs, engines and
    * partitionings, and — because the decision is a pure function of the key —
    * sampling two tables by the SAME key yields join-consistent samples
    * (every sampled fact row still finds its sampled dimension row). Executes
    * as a codegen'd filter at the scan, no shuffle. The SQL-portable md5
    * variant of the same technique is the oracled `q_sample_hash`. */
  def hashSample(df: DataFrame, keyCols: Seq[String], fraction: Double, seed: Int = 0): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], was $fraction")
    // 1e-9 resolution; round (not truncate) so e.g. 0.3 keeps exactly 30%
    // of hash space. Non-zero fractions below 5e-10 would round to zero —
    // reject them rather than silently sampling nothing.
    val threshold = math.round(fraction * 1e9)
    require(fraction == 0 || threshold > 0,
      s"fraction $fraction is below the 1e-9 sampling resolution")
    df.filter(pmod(xxhash64(lit(seed) +: keyCols.map(col): _*), lit(1000000000L)) < threshold)
  }

  /** Z-order (Morton-order) clustering before a write: quantize each
    * clustering column to `bits` levels between its min and max, interleave
    * the bits into one z-value, then range-partition + locally sort by it.
    * Every output file then covers a small bounding BOX in all clustering
    * dimensions — so min/max stats (Parquet row-group/file pruning) skip
    * files for predicates on ANY clustered column, where a plain sort only
    * prunes its leading column. This is the layout half of multi-dimensional
    * data skipping; spec asserts per-partition bounding boxes shrink in both
    * dimensions vs a linear sort.
    *
    * Costs one small min/max agg job + one range shuffle. Columns must be
    * numeric (cast dates/timestamps to epoch first); up to 3 columns at 16
    * bits each (48-bit z-value). Linear quantization is the standard
    * approximation (Delta/Iceberg OPTIMIZE do the same with range ids);
    * heavy skew in a dimension degrades box tightness, not correctness. */
  def zorderBy(df: DataFrame, zCols: Seq[String], numFiles: Int, bits: Int = 16): DataFrame = {
    require(zCols.nonEmpty && zCols.size <= 3, "zorderBy supports 1-3 columns")
    require(bits >= 1 && bits <= 16, "bits must be in [1,16]")
    // min/max of every clustering column in ONE agg job
    val aggCols = zCols.flatMap(c =>
      Seq(min(col(c)).cast("double").as(s"min_$c"), max(col(c)).cast("double").as(s"max_$c")))
    val bounds = df.agg(aggCols.head, aggCols.tail: _*).collect()
    // empty input or an all-null clustering column: no bounds to quantize
    // against — clustering is a no-op, not an error
    if (bounds.isEmpty || (0 until 2 * zCols.size).exists(bounds.head.isNullAt)) return df
    val b = bounds.head
    val levels = (1 << bits) - 1
    val quantized = zCols.zipWithIndex.map { case (c, i) =>
      val lo = b.getDouble(2 * i); val hi = b.getDouble(2 * i + 1)
      val q =
        if (hi == lo) lit(0L)
        else least(lit(levels.toLong),
          floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * lit(levels + 1)).cast("long"))
      q
    }
    // interleave: bit j of column i lands at position j*numCols + i
    val nc = zCols.size
    val zval = (for {
      j <- 0 until bits
      i <- 0 until nc
    } yield shiftleft(shiftright(quantized(i), j).bitwiseAND(lit(1L)), j * nc + i))
      .reduce[org.apache.spark.sql.Column](_ bitwiseOR _)
    df.withColumn("_zval", zval)
      .repartitionByRange(numFiles, col("_zval"))
      .sortWithinPartitions("_zval")
      .drop("_zval")
  }

  /** Inner equi-join where the LARGE side is pre-filtered by a Bloom filter
    * built from the small side's keys — the manual form of what runtime
    * bloom-filter joins do, for when the optimizer can't (multi-stage
    * pipelines, non-equi residuals, or a reused prebuilt filter). No false
    * negatives, so the result EQUALS the plain join; false positives only
    * cost shuffle volume. At 100 TB the win is shuffling ~|matching keys|
    * instead of the whole fact table. One extra action to build the filter
    * (driver holds ~1.2 bytes/item at 1% fpp). */
  def bloomPrefilteredJoin(
      large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    // the membership UDF must agree with what bloomFilter() put in: it
    // hashes longs for integral columns and UTF-8 bytes for strings. A
    // mistyped UDF would make the analyzer insert an implicit cast (e.g.
    // string->bigint => null => every row dropped) and silently break the
    // "equals the plain join" contract — so dispatch on the actual key type
    // and reject anything else loudly.
    import org.apache.spark.sql.types._
    val keyType = large.schema(largeKey).dataType
    require(
      Seq(ByteType, ShortType, IntegerType, LongType, StringType).contains(keyType),
      s"bloomPrefilteredJoin supports integral or string keys, got $keyType for '$largeKey'")
    // the SMALL side must hash the same domain: bloomFilter() on a string
    // column inserts UTF-8 bytes while the membership probe for an integral
    // large key hashes longs — mixed families would silently drop nearly
    // every row, breaking the "equals the plain join" contract
    val smallType = small.schema(smallKey).dataType
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val sameFamily =
      (integral.contains(keyType) && integral.contains(smallType)) ||
        (keyType == StringType && smallType == StringType)
    require(sameFamily,
      s"bloomPrefilteredJoin keys must be the same type family: '$largeKey' is $keyType " +
        s"but '$smallKey' is $smallType")
    val filter = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bcast = large.sparkSession.sparkContext.broadcast(filter)
    // a UDF is unavoidable here: membership needs the broadcast sketch
    // object. It runs as a scan-level filter BEFORE the shuffle — which is
    // the point; null keys can't match an inner join, so dropping them in
    // the prefilter is result-preserving.
    val mightContain = keyType match {
      case ByteType | ShortType | IntegerType | LongType =>
        udf((k: java.lang.Long) => k != null && bcast.value.mightContainLong(k))
          .apply(col(largeKey).cast("long"))
      case StringType =>
        udf((k: String) => k != null && bcast.value.mightContainString(k))
          .apply(col(largeKey))
      case other => // unreachable: validated above
        throw new IllegalArgumentException(s"unsupported key type $other")
    }
    val pruned = large.filter(mightContain)
    pruned.join(small, pruned(largeKey) === small(smallKey))
  }

  /**
   * Exact heavy hitters at sketch cost: every key whose frequency is at
   * least `minShare` of the rows, found WITHOUT a full-cardinality groupBy.
   *
   * Two passes, the Count-Min discipline:
   *   1. ONE mergeable aggregation builds a CMS over the key column
   *      (`count_min_sketch` is a partial-aggregating Catalyst expression —
   *      map-side partials, KBs on the wire regardless of key cardinality)
   *      and the sketch's own totalCount fixes the threshold.
   *   2. The rows are re-scanned with a scan-level broadcast-sketch probe
   *      (same justification as the Bloom UDFs above: membership against a
   *      broadcast sketch object has no built-in expression) and only
   *      CANDIDATE rows — CMS estimates never under-count, so every true
   *      heavy hitter survives — reach the exact groupBy, whose input is
   *      bounded by ~1/minShare keys' rows plus eps-noise stragglers that
   *      the exact HAVING then removes.
   *
   * The result is EXACT (provably no false negatives, exact counts kill
   * false positives); the sketch only decides who gets counted precisely.
   * At a 100 TB key cardinality this is the difference between shuffling
   * every distinct key and shuffling the heavy slice.
   *
   * Output: (key, n, cms_sound) — `cms_sound` pins estimate ≥ exact per
   * reported key, the CMS soundness invariant, so a broken sketch turns
   * rows red at the gate instead of silently dropping hitters.
   */
  /** `eps = 0` (the default) derives the sketch error as `minShare / 2`,
    * capped at 1e-4: the prefilter only pays off when the estimate noise
    * (≤ eps·N) sits well under the threshold (minShare·N) — an eps AT the
    * threshold admits the tail and the "heavy slice" degenerates toward
    * the full cardinality. Memory is `2/eps × depth` longs broadcast per
    * executor (1e-4 → ~1.6 MB at confidence 0.999); pass eps explicitly
    * for very small minShare where that product matters. */
  def heavyHitters(
      df: DataFrame,
      keyCol: String,
      minShare: Double,
      eps: Double = 0.0,
      confidence: Double = 0.999,
      seed: Int = 42): DataFrame = {
    import org.apache.spark.sql.types._
    val eps1 = if (eps > 0) eps else math.min(1e-4, minShare / 2)
    require(minShare > 0 && minShare < 1, s"minShare must be in (0,1), got $minShare")
    val keyType = df.schema(keyCol).dataType
    require(keyType == StringType ||
      Seq(ByteType, ShortType, IntegerType, LongType).contains(keyType),
      s"heavyHitters probes string or integral keys, got $keyType")
    val sketchBytes = df
      .agg(count_min_sketch(col(keyCol), lit(eps1), lit(confidence), lit(seed)))
      .head().getAs[Array[Byte]](0)
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val threshold = math.ceil(sketch.totalCount() * minShare).toLong
    val bcast = df.sparkSession.sparkContext.broadcast(sketchBytes)
    // deserialize the broadcast bytes ONCE per task via a transient lazy —
    // anything per-row here multiplies by the corpus (a content-hash cache
    // key cost the sketch's megabytes per row; identity is not portable)
    val probe = new Serializable {
      @transient private lazy val sk =
        org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(bcast.value))
      def est(k: String): Long = if (k == null) 0L else sk.estimateCount(k)
      def estLong(k: java.lang.Long): Long = if (k == null) 0L else sk.estimateCount(k)
    }
    // the probe must hash the SAME domain the sketch aggregated: the agg
    // adds integral columns widened to long, so the integral probe widens
    // via cast("long") — no per-row string formatting on numeric keys
    val estimate: Column => Column = keyType match {
      case StringType => udf((k: String) => probe.est(k)).apply(_)
      case _ =>
        val f = udf((k: java.lang.Long) => probe.estLong(k))
        (c: Column) => f(c.cast("long"))
    }
    // isNotNull is load-bearing beyond the docs' "nulls are invisible":
    // an ALL-null input has totalCount 0, threshold 0, and est(null)=0
    // would pass the prefilter and emit a null-key group
    df.filter(col(keyCol).isNotNull && estimate(col(keyCol)) >= threshold)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .withColumn("cms_sound", estimate(col(keyCol)) >= col("n"))
  }

}

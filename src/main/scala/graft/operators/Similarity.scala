package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Two paths, same contract:
 *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query set
 *    against all candidates; the candidate side streams, nothing quadratic is
 *    materialized. The correctness baseline.
 *  - [[lshTopK]]: random-hyperplane LSH — candidates are restricted to the
 *    query's sign-bucket, turning the scan into a bucket-equi-join. The
 *    100 TB scale path (bucket key is shuffle-friendly and the per-bucket
 *    work is bounded); recall traded for cost via `planes`.
 *
 * All vector math is `zip_with`/`aggregate` higher-order expressions over the
 * native array column — stays columnar, no UDF serialization.
 */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double. Uses the
    * codegen'd native expression ([[graft.functions.VectorExpressions]]);
    * semantics are identical to the composable HOF form ([[dotHof]]). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.dotNative(a, b)

  /** The zip_with/aggregate formulation — CodegenFallback (interpreted);
    * kept as the semantic reference for the native expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /**
   * Exact top-k nearest neighbors by cosine for each query vector.
   * `queries`/`candidates`: (`idCol`, `vecCol`). Queries are broadcast; ranks
   * are deterministic (ties broken by candidate id). Self-matches excluded.
   */
  def bruteForceTopK(
      queries: DataFrame, candidates: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2norm(col(vecCol)).as("qn"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2norm(col(vecCol)).as("cn"))
    rankTopK(
      c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn"))), k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim) —
    * a fixed integer hash mapped to [-1, 1). No RNG state, so the bucketing
    * is reproducible across runs and engines. */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit("graft-lsh"), lit(plane), dim), lit(20001L)) - 10000L) / 10000.0

  /** Sign-bucket id from `planes` random hyperplanes — fused native kernel
    * with a precomputed weight table ([[graft.functions.VectorExpressions
    * .hyperplaneLshBucket]]); bit-identical to [[lshBucketHof]]. */
  def lshBucket(vec: Column, planes: Int): Column =
    graft.functions.VectorExpressions.hyperplaneLshBucket(vec, planes)

  /** The composable HOF formulation — kept as the semantic reference for the
    * native kernel (parity pinned in SimilaritySpec). Re-derives every weight
    * via three chained xxhash64 calls per (plane, dim) per row. */
  def lshBucketHof(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => x * planeComponent(p, i)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /**
   * Approximate top-k: exact cosine ranking within the query's LSH bucket(s).
   * More `planes` = smaller buckets = cheaper + lower recall. `multiProbe`
   * additionally probes every bucket at Hamming distance 1 from the query's
   * bucket (standard multi-probe LSH) — recall rises steeply for the cost of
   * planes× more (still tiny) query-side rows; the big candidate side is
   * never expanded.
   */
  def lshTopK(
      queries: DataFrame, candidates: DataFrame, k: Int, planes: Int = 8,
      multiProbe: Boolean = true,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val baseBucket = lshBucket(col(vecCol), planes)
    val probeBuckets =
      if (!multiProbe) array(baseBucket)
      else array(baseBucket +: (0 until planes).map(p => baseBucket.bitwiseXOR(1L << p)): _*)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(probeBuckets).as("bucket"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), planes).as("bucket"))
    rankTopK(
      c.join(broadcast(q), Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", cosine(col("qv"), col("cv"))), k)
  }

  /**
   * IVF (inverted-file) approximate top-k: learn `nlist` centroids from a
   * driver-side sample (Lloyd's k-means, deterministic seeded init), assign
   * every candidate to its nearest centroid (scan-local [[nearestCell]] —
   * no row expansion, no shuffle, no UDFs), and probe only the `nprobe`
   * nearest cells per query. The classic production ANN layout:
   * the candidate side is partitioned by cell, so a query touches
   * nprobe/nlist of the data; centroid learning is O(sample), never O(N).
   */
  def ivfTopK(
      queries: DataFrame, candidates: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, sampleSize: Int = 2048,
      idCol: String = "vec_id", vecCol: String = "embedding",
      precomputedCentroids: Option[Array[Array[Float]]] = None): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._

    // 1. learn centroids from a deterministic sample (or reuse the caller's —
    // learnCentroids is deterministic, so a cached copy is the same values)
    val centroids = precomputedCentroids.getOrElse(
      learnCentroids(candidates, nlist, sampleSize, idCol, vecCol))
    val centroidDf = broadcast(centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq.toDF("cell", "centroid"))

    // 2. cell assignment: the BIG candidate side is scan-local (literal
    // centroids, no shuffle — nearestCell); only the tiny query side, which
    // needs the top-nprobe cells rather than the argmax, pays the
    // expansion+window formulation
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      nearestCellId(col(vecCol), centroids).as("cell"))
    val q = assignCells(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv", centroidDf, probes = nprobe)

    // 3. exact cosine ranking within the probed cells
    rankTopK(
      c.join(q, Seq("cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", cosine(col("qv"), col("cv"))), k)
  }

  /**
   * Embedding clustering as a first-class operator: assign every vector to
   * its nearest centroid (same deterministic learnCentroids + argmax-by-
   * cosine assignment every IVF variant shares), returning
   * `(id, cell, cos)` — the cosine similarity to the assigned centroid.
   * This is the k-means corpus-partitioning step of an embedding pipeline
   * (topic bucketing, stratified curation, IVF cell layout) exposed
   * directly. The assignment is SCAN-LOCAL ([[nearestCell]]): centroids are
   * embedded as literals, every row computes its nlist cosines and argmax
   * inside one codegen'd projection — no row expansion, no shuffle, no
   * window. The plan is a bare scan+project at any corpus size.
   */
  def clusterAssign(
      df: DataFrame, nlist: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      precomputedCentroids: Option[Array[Array[Float]]] = None): DataFrame = {
    val centroids = precomputedCentroids.getOrElse(learnCentroids(df, nlist, idCol = idCol, vecCol = vecCol))
    df.select(col(idCol), nearestCell(col(vecCol), centroids).as("best"))
      .select(col(idCol), (-col("best.negcell")).as("cell"), col("best.cos").as("cos"))
  }

  /**
   * Scan-local nearest-centroid assignment: a struct `(cos, negcell)` whose
   * max over the per-centroid array IS the argmax (cosine desc, then
   * SMALLEST cell — struct ordering on (cos, -cell) reproduces exactly the
   * `ORDER BY cos DESC, cell` tiebreak of the window formulation, including
   * NaN-greatest ordering for degenerate zero vectors). Centroid norms are
   * folded on the driver with the same left-to-right double accumulation as
   * [[dot]]/sqrt, so `cos` is bit-identical to `cosine(vec, centroid)`
   * computed via expressions. Replaces a crossJoin+window (N×nlist row
   * expansion + full shuffle on id) with a single codegen'd projection.
   */
  private[operators] def nearestCell(vec: Column, centroids: Array[Array[Float]]): Column = {
    val vnorm = l2norm(vec)
    val entries = centroids.zipWithIndex.map { case (cv, i) =>
      val cn = math.sqrt(cv.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      struct((dot(vec, typedlit(cv)) / (vnorm * lit(cn))).as("cos"), lit(-i).as("negcell"))
    }
    array_max(array(scala.collection.immutable.ArraySeq.unsafeWrapArray(entries): _*))
  }

  /** Shorthand for the assigned cell id of [[nearestCell]]. */
  private[operators] def nearestCellId(vec: Column, centroids: Array[Array[Float]]): Column =
    -nearestCell(vec, centroids).getField("negcell")

  /**
   * SemDeDup-style semantic near-duplicate pairs (cf. Abbas et al. 2023,
   * arXiv:2303.09540): block by k-means cluster instead of LSH bucket —
   * assign every vector to its nearest centroid ([[nearestCell]], scan-local)
   * and compare pairs only WITHIN a cell, keeping cosine >= `threshold`.
   * This is the published scale recipe for embedding-level corpus dedup: the
   * within-cell quadratic is bounded by the cell size (nlist grows with the
   * corpus), the cell key is an equi-join key (one shuffle on `cell`), and
   * true semantic dups land in the same cell with high probability because
   * they are near the same centroid. Output (id1, id2, cell, cosine),
   * id1 < id2.
   */
  def semanticNearDupPairs(
      vectors: DataFrame, threshold: Double = 0.95, nlist: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      precomputedCentroids: Option[Array[Array[Float]]] = None): DataFrame = {
    val centroids = precomputedCentroids.getOrElse(
      learnCentroids(vectors, nlist, idCol = idCol, vecCol = vecCol))
    val v = vectors.select(col(idCol).as("id"), col(vecCol).as("v"),
      l2norm(col(vecCol)).as("nrm"),
      nearestCellId(col(vecCol), centroids).as("cell"))
    v.as("a").join(v.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .withColumn("cosine", dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.cell").as("cell"), col("cosine"))
  }

  /** The ONE centroid-learning path every IVF variant shares (ad-hoc
    * [[ivfTopK]], the persisted [[VectorIndex]], and the oracle replay):
    * deterministic sample (first `sampleSize` rows by `idCol`) + seeded
    * Lloyd's k-means. Identical inputs therefore yield identical centroids
    * everywhere — which is what lets the DuckDB oracle embed them as
    * literals and replay the whole index exactly. */
  def learnCentroids(
      candidates: DataFrame, nlist: Int, sampleSize: Int = 2048,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Float]] = {
    val sample = candidates.select(col(idCol), col(vecCol)).orderBy(col(idCol))
      .limit(sampleSize).collect().map(_.getSeq[Float](1).toArray)
    kmeans(sample, nlist, iters = 10)
  }

  /** Deterministic exact top-k over a scored candidate frame
    * `(query_id, neighbor_id, cosine, ...)`: rank by cosine desc with
    * neighbor_id as tiebreak. ONE definition — the DuckDB oracles pin these
    * exact tiebreak semantics, so every ANN path must share it. */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Nearest-`probes` centroid cells per row: argmin by cosine distance with
    * a deterministic tiebreak on cell id. `centroidDf` must have columns
    * `(cell: int, centroid: array<float>)`. Shared by [[ivfTopK]] and the
    * persisted [[VectorIndex]] so both assign vectors to cells identically. */
  private[operators] def assignCells(
      df: DataFrame, id: String, vec: String, centroidDf: DataFrame, probes: Int): DataFrame = {
    val w = Window.partitionBy(col(id)).orderBy(col("cos_c").desc, col("cell"))
    df.crossJoin(centroidDf)
      .withColumn("cos_c", cosine(col(vec), col("centroid")))
      .withColumn("cell_rank", row_number().over(w))
      .filter(col("cell_rank") <= probes)
      .drop("centroid", "cos_c", "cell_rank")
  }

  /** Driver-side Lloyd's k-means with deterministic initialization (every
    * sampleSize/k-th vector). Sample-sized input only. */
  private[operators] def kmeans(sample: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    require(sample.nonEmpty, "empty centroid sample")
    val dim = sample.head.length
    val kk = math.min(k, sample.length)
    var centroids = Array.tabulate(kk)(i => sample(i * sample.length / kk).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          var d = 0.0; var i = 0
          while (i < dim) { val diff = v(i) - centroids(c)(i); d += diff * diff; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(kk) { c =>
        if (counts(c) == 0) centroids(c)
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat)
      }
    }
    centroids
  }

  /** Embedding near-duplicate pairs: cosine >= `threshold`, blocked by LSH
    * bucket (both sides of a near-dup pair almost always share the bucket at
    * modest `planes`; LSH recall drops as `threshold` approaches chance-level
    * cosine). `planes = 0` disables blocking (exact all-pairs — fine up to
    * ~10^4 vectors now that the dot product is codegen'd; use blocking at
    * scale). Output (id1, id2, cosine), id1 < id2. */
  def embeddingNearDupPairs(
      vectors: DataFrame, threshold: Double = 0.95, planes: Int = 6,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms are per-VECTOR quantities: precompute N of them instead of
    // recomputing two per pair (N² work → N, and each pair is one codegen'd
    // dot product instead of three)
    def withNorm(df: DataFrame) = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      l2norm(col(vecCol)).as("nrm"))
    val pairs =
      if (planes <= 0) {
        // exact all-pairs. A join on a constant key would put EVERY pair in
        // one partition (single-threaded quadratic loop); a cartesian join
        // parallelizes as left-partitions × right-partitions tasks. Width
        // follows the cluster: sqrt(defaultParallelism) per side yields
        // ~defaultParallelism cross-product tasks.
        val side = math.max(2, math.round(math.sqrt(
          vectors.sparkSession.sparkContext.defaultParallelism.toDouble)).toInt)
        val v = withNorm(vectors).repartition(side).localCheckpoint()
        v.as("a").crossJoin(v.as("b")).filter(col("a.id") < col("b.id"))
      } else {
        val v = withNorm(vectors).withColumn("bucket", lshBucket(col("v"), planes))
        v.as("a").join(v.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      }
    pairs
      .withColumn("cosine", dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("cosine"))
  }
}

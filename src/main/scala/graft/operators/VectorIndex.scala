package graft.operators

import graft.core._
import graft.operators.VersionedTables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * A persisted IVF (inverted-file) ANN index as a VERSIONED, cell-partitioned
 * table — the point where the versioning layer and the similarity operators
 * compose:
 *
 *  - **Build** learns `nlist` centroids (driver-side sample, deterministic
 *    k-means — [[Similarity.kmeans]]), assigns every vector to its nearest
 *    cell (the same [[Similarity.nearestCell]] the ad-hoc `ivfTopK` uses —
 *    scan-local, literal centroids, no shuffle),
 *    and commits the index with REPLACE-ALL semantics
 *    (`versionedReplaceAll`): cells absent from the new build are removed in
 *    the same atomic commit, so a rebuild with different geometry (or fewer
 *    vectors) can never leak the previous build's cells into the current
 *    index. Previous index versions stay time-travelable.
 *  - **Query** pins ONE commit up front (head unless `at` is given), reads
 *    that version's centroid partition, picks `nprobe` cells per query, and
 *    reads ONLY those cells of the SAME pinned version — a concurrent
 *    rebuild cannot mix two index generations mid-query. File listing and
 *    scan are O(probed cells), not O(index): the versioned layer's
 *    partition pruning IS the inverted-file lookup.
 *
 * Centroids are stored in the same table under the reserved partition
 * `cell=centroid` (vec_id = cell index), so index and metadata version
 * together — a query against an old version uses THAT version's centroids.
 */
object VectorIndex {

  val CellCol = "cell"
  val CentroidCell = "centroid"

  /** Partition schema every IVF index table uses. */
  val indexSchema: PartitionSchema = PartitionSchema(CellCol)

  def buildIvf(
      engine: VersionedTables,
      table: TableDefinition,
      vectors: DataFrame,
      nlist: Int = 16,
      sampleSize: Int = 2048,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      userId: UserId = UserId("graft"),
      message: String = "build ivf index",
      precomputedCentroids: Option[Array[Array[Float]]] = None): (TableVersion, TableChanges) = {
    require(table.partitionSchema == indexSchema,
      s"IVF index tables must be partitioned by '$CellCol', got ${table.partitionSchema}")
    val spark = vectors.sparkSession
    import spark.implicits._

    val centroids = precomputedCentroids.getOrElse(
      Similarity.learnCentroids(vectors, nlist, sampleSize, idCol, vecCol))
    val centroidDf = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF(CellCol, "centroid")

    // scan-local assignment (literal centroids, no shuffle) — the whole
    // build is then scan -> project -> repartition(cell) -> write
    val assigned = vectors
      .select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
        concat(lit("c"),
          Similarity.nearestCellId(col(vecCol), centroids)).as(CellCol))

    val centroidRows = centroidDf.select(
      col(CellCol).cast("long").as("vec_id"),
      col("centroid").cast("array<float>").as("embedding"),
      lit(CentroidCell).as(CellCol))

    // one file per cell (the probe path reads whole cells); replace-all so
    // cells from a previous geometry cannot survive into this version
    assigned.unionByName(centroidRows)
      .repartition(col(CellCol))
      .versionedReplaceAll(engine, table, userId, message)
  }

  /** Exact cosine top-k within the `nprobe` nearest cells of each query.
    * Runs against ONE pinned commit — the head at call time, or `at` — for
    * both the centroid and the cell reads. The query set is broadcast-sized
    * by contract; the index side streams. */
  def queryIvf(
      engine: VersionedTables,
      table: TableDefinition,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      at: Option[CommitId] = None): DataFrame = {
    // pin one version for the whole query: centroids and cells must come
    // from the same index generation even if a rebuild lands concurrently.
    // currentRef is the tracker's O(1) head probe — a long-lived index must
    // not pay a history materialization per query
    val pinned = engine.versionAt(table.name,
      at.getOrElse(engine.tracker.currentRef(table.name)))
    def readCells(keep: Partition => Boolean): DataFrame = pinned match {
      case PartitionedTableVersion(pvs) =>
        engine.readVersion(table, PartitionedTableVersion(pvs.filter { case (p, _) => keep(p) }))
      case snap => engine.readVersion(table, snap)
    }

    val centroidDf = broadcast(
      readCells(_.columnValues.exists(_.value == CentroidCell))
        .select(col("vec_id").cast("int").as(CellCol), col("embedding").as("centroid")))

    // materialize the probe assignment once: it is both collected (to decide
    // which partitions to list) and joined below
    val probes = Similarity.assignCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv", centroidDf, probes = nprobe)
      .withColumn(CellCol, concat(lit("c"), col(CellCol)))
      .localCheckpoint()

    // the probed cells decide which index partitions are LISTED at all
    val probedCells: Set[String] =
      probes.select(CellCol).distinct().collect().map(_.getString(0)).toSet
    val cand = readCells(_.columnValues.exists(cv => probedCells.contains(cv.value)))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        col(CellCol).cast("string").as(CellCol))

    Similarity.rankTopK(
      cand.join(broadcast(probes), Seq(CellCol))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", Similarity.cosine(col("qv"), col("cv"))), k)
  }
}

package graft.operators

import graft.core._
import graft.operators.VersionedTables._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * A persisted IVF (inverted-file) ANN index as a VERSIONED, cell-partitioned
 * table — the point where the versioning layer and the similarity operators
 * compose:
 *
 *  - **Build** learns `nlist` centroids (driver-side sample, deterministic
 *    k-means — [[Similarity.kmeans]]), assigns every vector to its nearest
 *    cell, and writes the index `partitionBy(cell)` through
 *    `versionedInsertInto`: the rebuild is ATOMIC (readers flip at the
 *    commit), and previous index versions stay time-travelable.
 *  - **Query** reads the centroid partition (one directory), picks `nprobe`
 *    cells per query, and then reads ONLY those cells via `readPartitions` —
 *    the versioned layer's driver-side partition pruning IS the inverted-file
 *    lookup: file listing and scan are O(probed cells), not O(index), which
 *    is what makes the layout work when the candidate side is 10^9+ vectors.
 *
 * Centroids are stored in the same table under the reserved partition
 * `cell=centroid` (vec_id = cell index), so index + metadata version
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
      message: String = "build ivf index"): (TableVersion, TableChanges) = {
    require(table.partitionSchema == indexSchema,
      s"IVF index tables must be partitioned by '$CellCol', got ${table.partitionSchema}")
    val spark = vectors.sparkSession
    import spark.implicits._

    val sample = vectors.select(col(idCol), col(vecCol)).orderBy(col(idCol))
      .limit(sampleSize).collect().map(_.getSeq[Float](1).toArray)
    val centroids = Similarity.kmeans(sample, nlist, iters = 10)
    val centroidDf = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell_idx", "centroid")

    val assigned = assignCells(
      vectors.select(col(idCol).as("vec_id"), col(vecCol).as("embedding")),
      "vec_id", "embedding", broadcast(centroidDf), probes = 1)
      .select(col("vec_id"), col("embedding"),
        concat(lit("c"), col("cell_idx")).as(CellCol))

    val centroidRows = centroidDf.select(
      col("cell_idx").cast("long").as("vec_id"),
      col("centroid").cast("array<float>").as("embedding"),
      lit(CentroidCell).as(CellCol))

    // one file per cell: the probe path reads whole cells
    assigned.unionByName(centroidRows)
      .repartition(col(CellCol))
      .versionedInsertInto(engine, table, userId, message)
  }

  /** Exact cosine top-k within the `nprobe` nearest cells of each query,
    * against the index's CURRENT version (use `at` for time travel). The
    * query set is broadcast-sized by contract; the index side streams. */
  def queryIvf(
      engine: VersionedTables,
      table: TableDefinition,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      at: Option[CommitId] = None): DataFrame = {
    def readCells(keep: Partition => Boolean): DataFrame = at match {
      case None => engine.readPartitions(table, keep)
      case Some(id) =>
        engine.versionAt(table.name, id) match {
          case PartitionedTableVersion(pvs) =>
            engine.readVersion(table, PartitionedTableVersion(pvs.filter { case (p, _) => keep(p) }))
          case snap => engine.readVersion(table, snap)
        }
    }

    val centroidDf = broadcast(
      readCells(_.columnValues.exists(_.value == CentroidCell))
        .select(col("vec_id").cast("int").as("cell_idx"), col("embedding").as("centroid")))

    val probes = assignCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv", centroidDf, probes = nprobe)

    // the probed cells decide which index partitions are LISTED at all
    val probedCells: Set[String] = probes.select(concat(lit("c"), col("cell_idx")))
      .distinct().collect().map(_.getString(0)).toSet
    val cand = readCells(_.columnValues.exists(cv => probedCells.contains(cv.value)))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        col(CellCol).cast("string").as(CellCol))

    val scored = cand
      .join(broadcast(probes.select(col("query_id"), col("qv"),
        concat(lit("c"), col("cell_idx")).as(CellCol))), Seq(CellCol))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Similarity.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Nearest-`probes` centroid cells per row (argmin by cosine distance,
    * deterministic tiebreak on cell index). */
  private def assignCells(
      df: DataFrame, id: String, vec: String, centroidDf: DataFrame, probes: Int): DataFrame = {
    val w = Window.partitionBy(col(id)).orderBy(col("cos_c").desc, col("cell_idx"))
    df.crossJoin(centroidDf)
      .withColumn("cos_c", Similarity.cosine(col(vec), col("centroid")))
      .withColumn("cell_rank", row_number().over(w))
      .filter(col("cell_rank") <= probes)
      .drop("centroid", "cos_c", "cell_rank")
  }
}

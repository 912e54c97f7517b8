package graft.examples

import graft.core._
import graft.operators.VersionedTables
import graft.operators.VersionedTables._
import graft.operators.DeleteVectors
import graft.operators.DeleteVectors._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.Files

/**
 * LARGE deletion-vector read probe — the round-15 size-gate evidence: a DV
 * holding a substantial fraction of a table must read correctly and
 * efficiently WITHOUT being forced onto every executor. Builds an N-row
 * table (default 2M rows, one partition, many files), DV-deletes a big
 * slice under `maxDeleteFraction=1.0`, then times the DV-applied read in
 * both join shapes and prints the physical join chosen:
 *
 *   - `gated`: default config — the gate sees the DV's on-disk bytes and
 *     broadcasts only under the threshold;
 *   - `forced-shuffle`: `broadcastThreshold=0` + auto-broadcast off — the
 *     plan a multi-GB DV gets at 100 TB (shuffled left_anti).
 *
 * Usage: `tools/run.sh graft.examples.DvScaleProbe [rows] [deletePct]`
 * Prints NAME=value lines.
 */
object DvScaleProbe {

  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val pct = args.lift(1).map(_.toInt).getOrElse(30)
    val spark = SparkSession.builder()
      .appName("graft-dv-scale-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val root = Files.createTempDirectory("graft-dv-scale-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("probe", "dv"),
      root.resolve("t").toUri, PartitionSchema("part"), FileFormat.Parquet)
    engine.initTable(table, UserId("probe"), "init")
    spark.range(rows).select(col("id"), (col("id") * 2).as("v"), lit("p0").as("part"))
      .repartition(16)
      .versionedInsertInto(engine, table, UserId("probe"), "load")

    spark.conf.set(DeleteVectors.MaxDeleteFractionKey, "1.0")
    val (r, delS) = timed(
      engine.deleteWhereDV(table, col("id") % 100 < pct, UserId("probe"), s"dv $pct%"))
    println(f"ROWS=$rows DELETED=${r.deletedRows} DELETE_S=$delS%.2f")
    def walk(f: java.io.File): List[java.io.File] =
      if (f.isDirectory) f.listFiles().toList.flatMap(walk) else List(f)
    val dvBytes = walk(root.resolve("t").toFile)
      .filter(f => f.isFile && f.getPath.contains("/_dv/")).map(_.length).sum
    println(f"DV_BYTES=$dvBytes DV_MB=${dvBytes / 1e6}%.1f")

    val expected = rows - r.deletedRows
    def joinOf(plan: String): String =
      if (plan.contains("BroadcastHashJoin")) "broadcast"
      else if (plan.contains("SortMergeJoin")) "sort-merge"
      else if (plan.contains("ShuffledHashJoin")) "shuffled-hash"
      else "other"

    // shape 1: the gate decides (default threshold = session auto-broadcast)
    val (c1, s1) = timed(engine.read(table).count())
    require(c1 == expected, s"gated read wrong: $c1 != $expected")
    println(f"GATED_READ_S=$s1%.2f JOIN=${joinOf(engine.read(table).queryExecution.sparkPlan.toString)} " +
      f"THRESHOLD=${spark.conf.get("spark.sql.autoBroadcastJoinThreshold")}")

    // shape 2: forced past the gate — the 100 TB bulk-DV plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(DeleteVectors.BroadcastThresholdKey, "0")
    val (c2, s2) = timed(engine.read(table).count())
    require(c2 == expected, s"shuffle read wrong: $c2 != $expected")
    println(f"SHUFFLE_READ_S=$s2%.2f JOIN=${joinOf(engine.read(table).queryExecution.sparkPlan.toString)}")

    // control: the plain (pre-delete) scan
    spark.conf.unset(DeleteVectors.BroadcastThresholdKey)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    val c0 = engine.tracker.tableState(table.name).updates
      .find(_.metadata.message == "load").get.metadata.id
    val (c3, s3) = timed(engine.readAt(table, c0).count())
    println(f"BASE_READ_S=$s3%.2f BASE_ROWS=$c3")
    spark.stop()
  }
}

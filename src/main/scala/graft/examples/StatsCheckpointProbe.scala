package graft.examples

import graft.core._
import graft.operators.{TableStats, VersionedTables}
import graft.sources.FileBackedVersionTracker
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.Instant

/**
 * Stats-checkpoint scale probe: the first-metadata-touch cost of a
 * high-commit-rate table (one commit per partition — the streaming-sink /
 * daily-ingest shape) WITH and WITHOUT a checkpoint, at N=1000 commits.
 *
 * The history is built tracker-level (no Spark jobs): 1000 commits each
 * adding one partition, plus 1000 synthetic per-label manifests written as
 * the JSON the write path produces. The measured quantity is what a COLD
 * reader pays before its first pruned read can be planned: per-label it is
 * O(live labels) filesystem reads; checkpoint-served it is one bulk read
 * (+ the `_stats` listing). Prints NAME=value lines for SCALE.md.
 *
 * Usage: `tools/run.sh graft.examples.StatsCheckpointProbe [nCommits]`.
 */
object StatsCheckpointProbe {

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = Files.createTempDirectory("graft-ckpt-probe-")
    val tracker = new FileBackedVersionTracker(root.resolve("store").toUri)
    val tableName = TableName("probe", "sink")
    val user = UserId("probe")
    tracker.initTable(tableName, isSnapshot = false, user, "init", Instant.now())
    val location = root.resolve("sink").toUri
    val table = TableDefinition(tableName, location, PartitionSchema("day"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("id"))))

    val statsDir = Paths.get(location).resolve("_stats")
    Files.createDirectories(statsDir)
    var t0 = System.nanoTime()
    (0 until n).foreach { i =>
      val v = Version.generate()
      val part = Partition("day", f"d$i%04d")
      tracker.commit(tableName, TableUpdate(user, s"c$i", Instant.now(),
        List(TableOperation.AddPartitionVersion(part, v))))
      // the manifest the write path would have produced: one file holding
      // ids [i*10, i*10+9]
      val m = TableStats.StatsManifest(v.label, List("id"), Nil,
        List(TableStats.FileStats(
          s"day=d$i%04d/_version=${v.label}/part-0.parquet".format(i),
          f"day=d$i%04d", 10L,
          Map("id" -> TableStats.ColumnStats("bigint",
            Some((i * 10L).toString), Some((i * 10L + 9).toString), 0L)))),
        Map.empty)
      Files.write(statsDir.resolve(s"${v.label}.json"),
        TableStats.toJson(m).getBytes(StandardCharsets.UTF_8))
    }
    println(f"BUILD_S=${(System.nanoTime() - t0) / 1e9}%.2f COMMITS=$n")

    val engine = new VersionedTables(spark, tracker)
    val version = tracker.currentVersion(tableName)
    def coldPlan(label: String): Unit = {
      TableStats.clearStatsCachesForTesting()
      val m0 = TableStats.manifestFsReads.get()
      val c0 = TableStats.checkpointFsReads.get()
      val t = System.nanoTime()
      val d = TableStats.planRead(engine, table, version, col("id") < 50)
      val s = (System.nanoTime() - t) / 1e9
      println(f"${label}_S=$s%.3f FILES_KEPT=${d.filesKept} " +
        f"LABEL_READS=${TableStats.manifestFsReads.get() - m0} " +
        f"CKPT_READS=${TableStats.checkpointFsReads.get() - c0}")
    }

    coldPlan("COLD_PER_LABEL")
    t0 = System.nanoTime()
    val ckpt = TableStats.writeStatsCheckpoint(engine, table)
    println(f"CHECKPOINT_WRITE_S=${(System.nanoTime() - t0) / 1e9}%.2f FILE=${ckpt.getOrElse("-")}")
    coldPlan("COLD_CHECKPOINTED")
    // warm steady state (caches populated): the per-query cost after first touch
    val t1 = System.nanoTime()
    TableStats.planRead(engine, table, version, col("id") < 50)
    println(f"WARM_S=${(System.nanoTime() - t1) / 1e9}%.3f")
    spark.stop()
  }
}

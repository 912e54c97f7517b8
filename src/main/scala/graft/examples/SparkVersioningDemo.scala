package graft.examples

import graft.core._
import graft.operators.VersionedTables
import graft.operators.VersionedTables._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end Spark drive: versioned writes of real testdata, reads,
  * partition reprocess, rollback, time travel.
  * `sbt "runMain graft.examples.SparkVersioningDemo"` */
object SparkVersioningDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-spark-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-spark-demo-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(
      TableName("demo", "events"), root.resolve("events").toUri,
      PartitionSchema("event_date"), FileFormat.Parquet)
    engine.initTable(table, UserId("demo"), "init")

    val events = graft.Tables.events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))

    events.versionedInsertInto(engine, table, UserId("demo"), "initial load")
    val firstLoadRows = engine.read(table).count()
    println(s"ROWS_AFTER_LOAD=$firstLoadRows (in=${events.count()})")

    // reprocess ONE day: drop 'error' events for that day only
    val day = events.select(max("event_date")).head().getDate(0)
    val reprocessed = events.where(col("event_date") === lit(day) && col("event_type") =!= "error")
    reprocessed.versionedInsertInto(engine, table, UserId("demo"), s"reprocess $day w/o errors")

    val afterReprocess = engine.read(table).count()
    println(s"ROWS_AFTER_REPROCESS=$afterReprocess (removed=${firstLoadRows - afterReprocess})")
    println("ERRORS_ON_DAY_NOW=" + engine.read(table)
      .where(col("event_date") === lit(day) && col("event_type") === "error").count())

    val log = engine.log(table.name)
    println("LOG=" + log.map(_.message))

    // time travel: errors for that day are still visible as-of the first load
    println("ERRORS_ON_DAY_ASOF_LOAD=" + engine.readAt(table, log(1).id)
      .where(col("event_date") === lit(day) && col("event_type") === "error").count())

    // rollback, then verify, then roll forward
    engine.checkout(table.name, log(1).id)
    println(s"ROWS_AFTER_ROLLBACK=${engine.read(table).count()}")
    engine.checkout(table.name, log(0).id)
    println(s"ROWS_AFTER_ROLLFORWARD=${engine.read(table).count()}")

    // driver-side partition pruning read
    println("PRUNED_READ_DAYS=" + engine
      .readPartitions(table, _.columnValues.head.value == day.toString)
      .select(countDistinct(col("event_date"))).head().getLong(0))

    // physical layout
    val dayDir = root.resolve("events").resolve(s"event_date=$day").toFile
    println("VERSION_DIRS_FOR_DAY=" + dayDir.listFiles().count(f => f.isDirectory && f.getName.startsWith("_version=")))

    // timestamp time travel: as of "now" = head; as of the initial-load commit time = pre-reprocess
    val initialLoadTs = log(1).timestamp
    println("ASOF_NOW_ROWS=" + engine.readAsOf(table, java.time.Instant.now()).count())
    println("ASOF_LOAD_ROWS=" + engine.readAsOf(table, initialLoadTs).count())

    // orphan audit: clean history reports nothing
    println("ORPHANS=" + engine.orphanedVersions(table).size)

    spark.stop()
  }
}

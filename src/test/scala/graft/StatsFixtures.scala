package graft

import graft.core._
import graft.operators.VersionedTables
import graft.operators.VersionedTables._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.io.File
import java.nio.file.Files

/** Shared fixtures for the data-skipping / metadata-aggregation law
  * batteries (TableStatsSpec's layout, reused by SqlSkippingSpec and
  * MetadataQuerySpec): ONE canonical table shape and ONE corruption
  * technique, so a layout or technique change lands everywhere at once. */
object StatsFixtures {

  /** 4 day partitions × ids 0..399 range-split into 4 files each; `v` is
    * null for every 10th id; `cat` cycles a/b/c. 16 files total. */
  def rangeEvents(
      spark: SparkSession,
      schema: String,
      name: String,
      statsCfg: Option[ColumnStatsConfig]): (VersionedTables, TableDefinition) = {
    val dir = Files.createTempDirectory(s"graft-$schema-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val table = TableDefinition(TableName(schema, name),
      new File(dir, name).toURI, PartitionSchema("day"), FileFormat.Parquet,
      stats = statsCfg)
    engine.initTable(table, UserId("t"), "init")
    val df = spark.range(1600).select(
      (col("id") % 400).as("id"),
      concat(lit("2024-01-0"), (floor(col("id") / 400) + 1).cast("int").cast("string")).as("day"),
      when(col("id") % 10 === 0, lit(null).cast("double"))
        .otherwise(col("id").cast("double") * 1.5).as("v"),
      element_at(array(lit("a"), lit("b"), lit("c")), (col("id") % 3 + 1).cast("int")).as("cat"))
    df.repartitionByRange(4, col("id"))
      .versionedInsertInto(engine, table, UserId("t"), "load")
    (engine, table)
  }

  def walkFiles(f: File): Seq[File] =
    if (f.isDirectory) f.listFiles().toSeq.flatMap(walkFiles) else Seq(f)

  /** Overwrite every parquet data file under the table (except those
    * `spare` keeps) with garbage — a read that touches one fails loudly.
    * Returns how many were corrupted. */
  def corruptParquet(table: TableDefinition, spare: File => Boolean = _ => false): Int = {
    val files = walkFiles(new File(table.location))
      .filter(f => f.getName.endsWith(".parquet") && !spare(f))
    files.foreach(f => Files.write(f.toPath, "garbage".getBytes))
    files.size
  }
}

package graft

import graft.core._
import graft.operators.VersionedTables
import graft.operators.VersionedTables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: TPC-H Q1-style pricing summary through the versioned engine —
    * lineitem is loaded into a versioned table, read back at its current
    * version, then aggregated. Driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    Tables.prepare(spark)
    val root = java.nio.file.Files.createTempDirectory("graft-entry-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("graft", "lineitem"), root.resolve("lineitem").toUri,
      PartitionSchema("l_returnflag"), FileFormat.Parquet)
    engine.initTable(table, UserId("driver"), "init")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .versionedInsertInto(engine, table, UserId("driver"), "load sf0.001")
    engine.read(table)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        avg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queries_relational ++ queries_versioned ++ graft.queries.PipelineQueries.defs

  private def queries_relational: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.defs

  /** Chronicles-specific capabilities: versioned read + time travel. Built on
    * a scratch copy of `events` written through the engine (no DuckDB oracle —
    * rows-only check, per the SparkEntry contract). */
  private def queries_versioned: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_versioned_read" -> ((spark, dir) => versionedFixture(spark, dir)._1),
    "q_time_travel" -> ((spark, dir) => versionedFixture(spark, dir)._2)
  )

  /** Build (current-version read, as-of-first-load read) over a versioned
    * events table: initial load, then one day reprocessed without 'error'
    * rows. Current read must reflect the reprocess; the as-of read must not.
    * Memoized per (session, sfDir): q_versioned_read and q_time_travel share
    * one fixture build instead of writing the table twice. */
  private val fixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (DataFrame, DataFrame)]()

  private def versionedFixture(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) =
    fixtureCache.computeIfAbsent((spark, sfDir), _ => buildVersionedFixture(spark, sfDir))

  private def buildVersionedFixture(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    Tables.prepare(spark)
    val root = java.nio.file.Files.createTempDirectory("graft-vfix-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("graft", "events"), root.resolve("events").toUri,
      PartitionSchema("event_date"), FileFormat.Parquet)
    engine.initTable(table, UserId("driver"), "init")
    // materialize once: the fixture scans this frame five times (partition
    // discovery + write, twice, + max(date)); re-reading parquet each time
    // roughly doubles the fixture cost
    val events = Tables.events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))
      .localCheckpoint()
    events.versionedInsertInto(engine, table, UserId("driver"), "initial load")
    val day = events.select(max("event_date")).head().getDate(0)
    events.where(col("event_date") === lit(day) && col("event_type") =!= "error")
      .versionedInsertInto(engine, table, UserId("driver"), "reprocess")
    val firstLoad = engine.log(table.name)(1).id
    val current = engine.read(table)
      .groupBy(col("event_date"), col("event_type")).agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val asOf = engine.readAt(table, firstLoad)
      .groupBy(col("event_date"), col("event_type")).agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    (current, asOf)
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracles ++ graft.queries.PipelineQueries.oracles
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared access to the driver-generated testdata tables
  * (/root/repo/TESTDATA.md) + the session confs the engine relies on. */
object Tables {

  /** Runtime confs every graft session needs. Safe to call repeatedly. */
  def prepare(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // events.parquet carries TIMESTAMP(NANOS) which Spark's reader rejects by
    // default; read as long and convert explicitly (see events() below).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // All graft oracles are defined over UTC instants; the TIMESTAMP_NTZ
    // branch of events() casts through the session zone, so a non-UTC
    // session would silently shift instants on that layout only. Force the
    // zone here so both layouts agree regardless of caller config.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    prepare(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events with `ts` normalized to a microsecond TimestampType, whatever
    * the generator wrote. Two layouts have been observed from the driver:
    * TIMESTAMP(NANOS) (read as long under `nanosAsLong` — convert with
    * integer `div`, NOT `/`: double division of epoch-nanos (~1.7e18 > 2^53)
    * loses up to hundreds of nanoseconds and can land on the wrong
    * microsecond vs DuckDB's exact ns→µs truncation) and TIMESTAMP(MICROS)
    * (arrives as TIMESTAMP_NTZ — cast to the session-UTC TimestampType every
    * downstream query and oracle was verified against). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case org.apache.spark.sql.types.TimestampNTZType =>
        // prepare() pinned the session zone to UTC above, so this cast is a
        // pure relabel of the wall clock as a UTC instant.
        df.withColumn("ts", col("ts").cast("timestamp"))
      case other =>
        throw new IllegalStateException(s"unexpected events.ts dtype: $other")
    }
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}

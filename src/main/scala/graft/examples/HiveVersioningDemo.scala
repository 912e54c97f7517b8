package graft.examples

import graft.core._
import graft.operators.VersionedTables
import graft.operators.VersionedTables._
import graft.sources.{FileBackedVersionTracker, SparkHiveMetastore}
import org.apache.spark.sql.SparkSession

/** End-to-end drive of the Hive-fidelity path: engine writes sync an embedded
  * Hive (Derby) catalog; reads are PLAIN spark.table; rollback is a metadata
  * pointer swap. `sbt "runMain graft.examples.HiveVersioningDemo"` */
object HiveVersioningDemo {
  def main(args: Array[String]): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-hive-demo-")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", tmp.resolve("warehouse").toString)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=${tmp.resolve("metastore_db")};create=true")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val loc = tmp.resolve("pageview").toUri.toString.stripSuffix("/")
    spark.sql("CREATE DATABASE demo")
    spark.sql(s"""CREATE EXTERNAL TABLE demo.pageview (id STRING, path STRING)
                 |PARTITIONED BY (`date` STRING) STORED AS PARQUET LOCATION '$loc'""".stripMargin)

    val engine = new VersionedTables(spark,
      new FileBackedVersionTracker(tmp.resolve("store").toUri),
      new SparkHiveMetastore(spark))
    val table = TableDefinition(TableName("demo", "pageview"),
      new java.net.URI(loc), PartitionSchema("date"), FileFormat.Parquet)
    engine.initTable(table, UserId("demo"), "init")

    Seq(("u1", "/home", "2024-01-01"), ("u2", "/about", "2024-01-01"), ("u3", "/home", "2024-01-02"))
      .toDF("id", "path", "date").versionedInsertInto(engine, table, UserId("demo"), "load")
    println("HIVE_READ_AFTER_LOAD=" + spark.table("demo.pageview").count())

    Seq(("u1", "/home", "2024-01-01"))
      .toDF("id", "path", "date").versionedInsertInto(engine, table, UserId("demo"), "reprocess day1")
    println("HIVE_READ_AFTER_REPROCESS=" + spark.table("demo.pageview").count())
    println("HIVE_SQL_DAY1=" + spark.sql(
      "SELECT id FROM demo.pageview WHERE date='2024-01-01'").collect().map(_.getString(0)).mkString(","))

    val log = engine.log(table.name)
    engine.checkout(table.name, log(1).id)
    println("HIVE_READ_AFTER_ROLLBACK=" + spark.table("demo.pageview").count())
    println("SHOW_PARTITIONS=" + spark.sql("SHOW PARTITIONS demo.pageview")
      .collect().map(_.getString(0)).sorted.mkString(" "))
    spark.stop()
  }
}

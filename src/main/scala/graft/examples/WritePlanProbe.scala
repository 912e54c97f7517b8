/** Captures the EXECUTED physical plan of one fused versioned write (round
  * 16): a partitioned `versionedInsertInto` whose partition-value discovery
  * rides the write job as a CollectMetrics (Dataset.observe) node instead of
  * a separate partitionValues action. Prints every action's executed plan
  * during the insert, so the artifact shows (a) exactly ONE job evaluates
  * the input and (b) the `collect_metrics` node inside the write command.
  * Usage: `tools/run.sh graft.examples.WritePlanProbe [sfDir]` */
package graft.examples

import graft.core._
import graft.operators.VersionedTables
import graft.operators.VersionedTables._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object WritePlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        plans.add((funcName, qe.executedPlan.toString)); ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    val dir = java.nio.file.Files.createTempDirectory("graft-writeplan-")
    val engine = VersionedTables.withFileStore(spark, dir.resolve("store").toUri)
    val table = TableDefinition(TableName("probe", "events_wp"),
      dir.resolve("events_wp").toUri, PartitionSchema("event_date"), FileFormat.Parquet)
    engine.initTable(table, UserId("probe"), "init")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("event_date", to_date(col("ts")))
      .versionedInsertInto(engine, table, UserId("probe"), "probe load")
    // listener delivery is async
    Thread.sleep(2000)
    import scala.jdk.CollectionConverters._
    val all = plans.asScala.toList
    println(s"ACTIONS_DURING_INSERT=${all.size}")
    all.zipWithIndex.foreach { case ((fn, p), i) =>
      println(s"--- action $i ($fn) ---")
      println(p)
    }
    spark.stop()
  }
}

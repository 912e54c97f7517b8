package graft.streaming

import graft.core.TableName
import graft.sources.FileBackedVersionTracker
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.net.URI

/**
 * Structured Streaming over the version store itself: every commit lands as
 * one immutable `table_update_*.json` file
 * ([[graft.sources.FileBackedVersionTracker]] layout), which is exactly the
 * contract Spark's file stream source wants — so "react to new commits" is a
 * plain `readStream` with no custom Source implementation. Works wherever the
 * store lives (file://, hdfs://, s3a://).
 *
 * The stream carries commit METADATA (id, user, message, time, typed op
 * list). To process the DATA a commit range changed, pair it with
 * [[graft.operators.VersionedTables.readChangesBetween]] inside
 * `foreachBatch`:
 *
 * {{{
 *   CommitStream.commits(spark, storeRoot, table.name)
 *     .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
 *       // file-source batches are NOT ordered (files are bin-packed by size):
 *       // re-establish commit order before walking the range
 *       batch.orderBy("timestamp").select("id").collect().foreach { row =>
 *         val to = CommitId(row.getString(0))
 *         process(engine.readChangesBetween(table, lastSeen, to)); lastSeen = to
 *       }
 *     }.start()
 * }}}
 */
object CommitStream {

  /** Schema of a commit file (JsonCodecs wire format): flat metadata plus a
    * sparse op union — absent fields of the op variants are null. */
  val commitSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("userId", StringType),
    StructField("message", StringType),
    StructField("timestamp", StringType),
    StructField("operations", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("table", StringType),
      StructField("isSnapshot", BooleanType),
      StructField("version", StringType),
      StructField("partition", StringType),
      // round-14 op variants: set-version-base carries the DATA version a
      // deletion-vector marker filters; set-table-schema carries the
      // recorded schema document (null on every other op type)
      StructField("base", StringType),
      StructField("schema", StringType)))))))

  /** Streaming frame of `table`'s commits. Row order WITHIN a micro-batch is
    * not defined (Spark's file source bin-packs files by size) — order by the
    * `timestamp`/`commit_time` column when commit order matters.
    * `maxFilesPerTrigger` bounds commits per micro-batch for backpressure. */
  def commits(
      spark: SparkSession,
      storeRoot: URI,
      table: TableName,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val dir = new Path(new Path(storeRoot),
      FileBackedVersionTracker.TableDirPrefix + table.fullyQualifiedName)
    val reader = spark.readStream
      .schema(commitSchema)
      .option("multiLine", "true") // commit files are pretty-printed JSON
      .option("pathGlobFilter", s"${FileBackedVersionTracker.CommitFilePrefix}*.json")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    reader.json(dir.toString)
      .withColumn("commit_time", col("timestamp").cast("timestamp"))
  }
}

package graft.streaming

import graft.core._
import graft.operators.ChangeFeed._
import graft.operators.VersionedTables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import java.net.URI

/**
 * Streaming row-level CDC consumption — the streaming twin of
 * [[graft.operators.ChangeFeed]], i.e. the Delta `readChangeFeed`-as-a-
 * stream pattern over the versioned layout: follow the commit log as a
 * stream ([[CommitStream]] — each commit is one immutable file, exactly
 * what Spark's file source wants) and hand every NEW commit's row-level
 * feed to a handler, in commit order.
 *
 * Delivery contract: the file-source CHECKPOINT remembers which commit
 * files were processed, so across restarts each commit is delivered
 * once — except a crash between processing and checkpointing the batch,
 * which redelivers that batch's commits (standard foreachBatch at-least-
 * once). Pair with an idempotent handler: `readRowChangesAt` is a pure
 * function of the commit id, so re-applying the same feed (e.g. through a
 * keyed upsert or [[EventStreams.writeVersionedMerged]]) converges.
 *
 * Scale shape: the stream itself moves only commit METADATA (KBs); each
 * per-commit feed reads only that commit's changed partitions
 * ([[graft.operators.ChangeFeed]]'s contract). A checkout/rollback commit
 * emits its COMPENSATING row changes (the diff against the pre-rollback
 * state) — exactly what a downstream CDC consumer needs to follow the
 * table through a rollback.
 */
object ChangeFeedStream {

  /** Start a streaming query that calls `handler(commitId, feed)` for every
    * new commit of `table`, in commit order within each micro-batch. The
    * store must be file-backed (the commit-log-as-file-stream source);
    * `storeRoot` is the same URI the tracker was built with. */
  def rowChanges(
      spark: SparkSession,
      engine: VersionedTables,
      storeRoot: URI,
      table: TableDefinition,
      keyColumns: Seq[String],
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxCommitsPerTrigger: Option[Int] = None,
      requireDistinctKeys: Boolean = true,
      updatePreimages: Boolean = false)(
      handler: (CommitId, DataFrame) => Unit): StreamingQuery =
    CommitStream.commits(spark, storeRoot, table.name, maxCommitsPerTrigger)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // file-source batches are NOT ordered (files bin-pack by size):
        // re-establish commit order before handing feeds out. The id list
        // is tiny (commit metadata), collect is the point.
        batch.orderBy("timestamp").select("id").collect().foreach { row =>
          val id = CommitId(row.getString(0))
          handler(id, engine.readRowChangesAt(
            table, keyColumns, id, requireDistinctKeys = requireDistinctKeys,
            updatePreimages = updatePreimages))
        }
        ()
      }
      .start()
}

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

  /** Partition column every [[deliverRowChanges]] target carries (last in
    * its partition schema): one partition per delivered source commit —
    * the engine's append idiom (`versionedInsertInto` overwrites the
    * partitions PRESENT in its input, so delivery-distinct partitions make
    * deliveries accumulate instead of clobbering each other). */
  val DeliveryCol = "delivery"

  /**
   * EXACTLY-ONCE change-feed delivery into a versioned table — the
   * ingestion sink [[rowChanges]]'s at-least-once contract cannot give: a
   * training-data pipeline that replays a batch must not duplicate corpus
   * rows. For every new commit of `source`, `transform(feed)` is appended
   * to `target` as ONE delivery commit whose message carries the source
   * commit id ([[DeliveryLedger]]): ledger entry and rows land in one
   * atomic commit, so there is no state in which the data committed but
   * the ledger didn't. On a crash between the commit and the stream
   * checkpoint, the replayed batch reads the newest marker back and skips
   * the already-delivered prefix (deliveries happen in commit order, so
   * one frontier id suffices — no delivered-set to accumulate).
   *
   * The target's LAST partition column must be [[DeliveryCol]]; the helper
   * stamps it with the source commit id, so each delivery owns its
   * partitions outright (accumulating append, and even a ledger miss could
   * only rewrite the same partition with the same rows). Empty feeds (the
   * init commit, metadata-only commits) deliver no commit — their replay
   * is a free no-op.
   *
   * Laws (StreamingCorpusOpsSpec): kill mid-batch after a delivery commit
   * and restart → target holds each source row EXACTLY once and each
   * delivered commit appears EXACTLY once in the target history.
   */
  def deliverRowChanges(
      spark: SparkSession,
      engine: VersionedTables,
      storeRoot: URI,
      source: TableDefinition,
      keyColumns: Seq[String],
      target: TableDefinition,
      userId: UserId,
      checkpointDir: String,
      transform: DataFrame => DataFrame = identity,
      targetEngine: Option[VersionedTables] = None,
      appId: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      maxCommitsPerTrigger: Option[Int] = None,
      requireDistinctKeys: Boolean = true,
      updatePreimages: Boolean = false): StreamingQuery = {
    require(target.partitionSchema.columnNames.lastOption.contains(DeliveryCol),
      s"deliverRowChanges targets must end their partition schema with '$DeliveryCol' " +
        s"(one partition per delivered source commit), got ${target.partitionSchema}")
    val sinkEngine = targetEngine.getOrElse(engine)
    val app = appId.getOrElse(
      s"cdc.${source.name.fullyQualifiedName}.${target.name.fullyQualifiedName}")
    CommitStream.commits(spark, storeRoot, source.name, maxCommitsPerTrigger)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import graft.operators.VersionedTables.DatasetVersionedOps
        val ids = batch.orderBy("timestamp").select("id").collect()
          .map(r => CommitId(r.getString(0))).toSeq
        // the replayed-batch skip: everything up to and including the
        // ledger's frontier was already delivered. A frontier outside this
        // batch belongs to an earlier (checkpointed, hence fully delivered)
        // batch — this whole batch is then new.
        val frontier = DeliveryLedger.lastDelivered(sinkEngine.tracker, target.name, app)
        val todo = frontier.map { last =>
          val i = ids.indexWhere(_.id == last)
          if (i >= 0) ids.drop(i + 1) else ids
        }.getOrElse(ids)
        todo.foreach { id =>
          val feed = engine.readRowChangesAt(source, keyColumns, id,
            requireDistinctKeys = requireDistinctKeys, updatePreimages = updatePreimages)
          val rows = transform(feed)
            .withColumn(DeliveryCol, org.apache.spark.sql.functions.lit(id.id))
          if (!rows.isEmpty)
            rows.versionedInsertInto(sinkEngine, target, userId,
              DeliveryLedger.message(
                s"cdc apply ${source.name.fullyQualifiedName} ${id.id}", app, id.id))
        }
        ()
      }
      .start()
  }

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

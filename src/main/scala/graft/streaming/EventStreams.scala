package graft.streaming

import graft.core._
import graft.operators.VersionedTables
import graft.operators.VersionedTables._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** One closed user session produced by [[EventStreams.sessionize]]. */
case class UserSession(
    user_id: Long,
    session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp,
    n_events: Long,
    total_value: Double)

private[streaming] case class SessionState(
    start: Long, last: Long, n: Long, total: Double)

private[streaming] case class EventRow(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/**
 * Structured Streaming surface over the `events` shape: file-source streams,
 * watermarked event-time windows, stateful sessionization, and a versioned
 * streaming sink (each micro-batch lands as one immutable commit through the
 * versioning engine — streaming ingestion with time travel for free).
 *
 * Everything here is batch-testable: `Trigger.AvailableNow` + memory sink
 * drive a parquet directory through the exact streaming operators.
 */
object EventStreams {

  /** File-source stream of event rows from a directory of parquet files.
    * (Streaming sources need an explicit schema.) */
  def readEventStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling event-time window counts with a watermark: late rows beyond
    * `watermark` are dropped, final rows are emitted once the watermark
    * passes the window end (append mode). */
  def windowedCounts(
      events: DataFrame, windowLength: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding window variant. */
  def slidingCounts(
      events: DataFrame, windowLength: String = "1 hour", slide: String = "15 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Built-in session windows (gap-based) with watermark. */
  def sessionWindowCounts(
      events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"))

  /**
   * Custom stateful sessionization via `flatMapGroupsWithState`: per-user
   * sessions closed after `gapMillis` of event-time silence (state timeout
   * drives emission, so sessions close even when a user goes quiet). The
   * custom-state path exists for session semantics `session_window` can't
   * express (e.g. value-dependent gaps); shown here in its simplest form.
   */
  def sessionize(
      events: DataFrame,
      gapMillis: Long = 30 * 60 * 1000L,
      watermark: String = "10 minutes"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._

    def updateState(
        userId: Long, rows: Iterator[EventRow],
        state: GroupState[SessionState]): Iterator[UserSession] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[UserSession]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= gapMillis =>
            cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
          case Some(s) =>
            closed ::= UserSession(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.total)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      if (state.hasTimedOut) {
        state.getOption.foreach { s =>
          closed ::= UserSession(userId, new java.sql.Timestamp(s.start),
            new java.sql.Timestamp(s.last), s.n, s.total)
        }
        state.remove()
      } else {
        cur.foreach { s =>
          state.update(s)
          if (state.getOption.isDefined)
            state.setTimeoutTimestamp(s.last + gapMillis)
        }
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", watermark) // required for event-time state timeouts
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateState)
  }

  /** Stream-stream interval join: match each left event with right events of
    * the same `key` whose timestamp lies in [left.ts, left.ts + within].
    * Both sides carry watermarks so the join state is bounded — Spark drops
    * buffered rows once the watermark passes the interval. Column names of
    * the right side are suffixed `_r`. */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      within: String = "30 minutes", watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, c + "_r"))
      .withWatermark("ts_r", watermark)
    l.join(r, expr(
      s"""$key = ${key}_r AND
         |ts_r >= ts AND
         |ts_r <= ts + interval '$within'""".stripMargin))
  }

  /** Streaming exact deduplication: drop rows whose `keys` were already seen
    * within the watermark horizon. State is bounded by the watermark (late
    * duplicates beyond it are not caught — the standard streaming-dedup
    * contract). For full-history dedup, run the batch `Dedup` operators over
    * the versioned table instead. */
  def streamingDedup(
      events: DataFrame, keys: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /**
   * Versioned streaming sink: every micro-batch is written through
   * `versionedInsertInto`, so each trigger becomes one immutable commit —
   * streaming ingestion with a full audit log and time travel. Overwrite-by-
   * partition semantics per batch match the engine's batch write path.
   *
   * `exactlyOnce = true` adds the [[DeliveryLedger]] discipline: each
   * commit's message carries the micro-batch id, and a batch whose id is at
   * or below the newest ledger marker SKIPS instead of re-committing — a
   * crash between the commit and the stream checkpoint then replays into a
   * no-op rather than an extra commit (the replayed write was already
   * content-idempotent — same partitions re-pointed at identical data —
   * so the ledger buys a clean history, not correctness). The default
   * `appId` scopes the ledger to (table, checkpoint dir): restarting with a
   * FRESH checkpoint restarts batch ids at 0, and a fresh checkpoint dir
   * makes a fresh ledger frontier, so old markers can never mass-skip a new
   * query's batches. Pass `appId` explicitly to carry one frontier across
   * relocated checkpoints.
   */
  def writeVersioned(
      stream: DataFrame,
      engine: VersionedTables,
      table: TableDefinition,
      userId: UserId,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      exactlyOnce: Boolean = false,
      appId: Option[String] = None): StreamingQuery = {
    val app = appId.getOrElse(
      s"stream.${table.name.fullyQualifiedName}." +
        java.lang.Integer.toHexString(checkpointDir.hashCode))
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persist: the batch plan is evaluated up to three times (emptiness
        // probe, partition-values scan, write) — cache it once per trigger.
        // Watermark-only micro-batches carry no rows: skip instead of
        // committing (the partitioned write requires >=1 partition value).
        val delivered = exactlyOnce &&
          DeliveryLedger.lastDelivered(engine.tracker, table.name, app)
            .flatMap(_.toLongOption).exists(batchId <= _)
        if (!delivered) {
          batch.persist()
          try {
            if (!batch.isEmpty) {
              val message =
                if (exactlyOnce)
                  DeliveryLedger.message(s"stream batch $batchId", app, batchId.toString)
                else s"stream batch $batchId"
              batch.versionedInsertInto(engine, table, userId, message)
            }
          } finally batch.unpersist()
        }
        ()
      }
      .start()
  }

  /**
   * Streaming WRITE-AUDIT-PUBLISH: [[writeVersioned]] with a per-micro-batch
   * [[graft.operators.Expectations]] audit between the stage and the
   * publish. Each trigger's data is written to an UNCOMMITTED version
   * directory, audited there (delivery-scoped by default;
   * `AuditScope.TableWide` audits the staged partitions overlaid on the
   * committed head), and published only when every check passes — readers
   * can never observe a micro-batch that failed its audit.
   *
   * A refused batch's files stay on disk as orphan debris — the identical
   * lifecycle as a failed CAS write: `orphanedVersions` lists them,
   * `vacuum(includeOrphans = true)` reclaims them, and until then
   * `Expectations.violations` over a re-read of the staged directory can
   * triage the bad rows. The query itself keeps running — `onRefused`
   * (batchId, full report) decides the policy: the default records nothing
   * and skips the batch; throw from it to stop the query instead (note the
   * checkpoint will then REPLAY the same batch on restart — a poison batch
   * needs the skip policy plus offline triage).
   */
  def writeVersionedAudited(
      stream: DataFrame,
      engine: VersionedTables,
      table: TableDefinition,
      userId: UserId,
      checkpointDir: String,
      checks: Seq[graft.operators.Expectations.Check],
      onRefused: (Long, Seq[graft.operators.Expectations.CheckResult]) => Unit = (_, _) => (),
      scope: graft.operators.Expectations.AuditScope =
        graft.operators.Expectations.AuditScope.Delivery,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import graft.operators.Expectations
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist() // same three-evaluation shape as writeVersioned
        try {
          if (!batch.isEmpty) {
            // manifest=false: stage and publish live in THIS call — the
            // manifest's cross-process re-attach is dead weight per batch
            val staged = batch.stageInsertInto(engine, table, userId,
              s"stream batch $batchId", manifest = false)
            val results = Expectations.audit(staged.auditView(scope), checks)
            if (results.forall(_.ok)) { staged.publish(); () }
            else onRefused(batchId, results) // staged files remain orphan debris
          }
        } finally batch.unpersist()
        ()
      }
      .start()
  }

  /**
   * Streaming keyed UPSERT sink — the MERGE family's streaming member (the
   * same batch + streaming pairing as the SCD2 and funnel families): each
   * micro-batch MERGEs into the versioned table on `keyColumns` through
   * [[graft.operators.VersionedMerge]] — matched keys take the batch's row,
   * unmatched rows insert, rows whose `deleteWhen` predicate is TRUE delete.
   * This is the CDC-apply sink: a change stream keyed by primary key folds
   * into a queryable, TIME-TRAVELABLE current-state table, one atomic
   * commit per trigger.
   *
   * Within a micro-batch several rows can share a key (a hot row's rapid
   * updates); the winner is the LAST row per key under `orderBy` (its
   * newest change), picked by one window pass before the merge — SQL MERGE
   * and `mergeInto` both refuse ambiguous duplicate source keys, and
   * "latest wins" is the only CDC-coherent resolution.
   *
   * Restart note: the checkpoint can REPLAY a committed batch after a
   * crash. A replayed merge is CONTENT-idempotent — matched keys re-take
   * the same source rows, already-deleted keys are unmatched delete
   * no-ops — so the visible table converges to the same state; the replay
   * just costs one more commit in the history (law pinned in
   * StreamingCorpusOpsSpec).
   */
  def writeVersionedMerged(
      stream: DataFrame,
      engine: VersionedTables,
      table: TableDefinition,
      keyColumns: Seq[String],
      orderBy: Seq[String],
      userId: UserId,
      checkpointDir: String,
      deleteWhen: Option[org.apache.spark.sql.Column] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(keyColumns.nonEmpty, "merge sink needs key columns")
    require(orderBy.nonEmpty,
      "merge sink needs an ordering to resolve same-key rows within a batch")
    import graft.operators.VersionedMerge._
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist() // read twice: the emptiness probe + the window below
        // the frame the merge RE-EVALUATES (key discovery, partition scans,
        // the write) is `latest` — cache it too, or every evaluation re-runs
        // the row_number shuffle (~5 window passes per trigger)
        var latest: DataFrame = null
        try {
          if (!batch.isEmpty) {
            // final tie-break: a content hash of the row's HASHABLE columns.
            // On orderBy ties the winner would otherwise be partitioning-
            // dependent, so a checkpoint replay after a crash could merge a
            // DIFFERENT row (even flipping update vs delete) and break the
            // documented content-idempotent-replay law; with the hash, ties
            // resolve identically on every run. Map-typed columns (hash
            // expressions reject MapType) are excluded — rows tied on
            // everything hashable but differing in a map column remain the
            // one documented nondeterminism, instead of the sink rejecting
            // such schemas outright.
            def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
              case _: org.apache.spark.sql.types.MapType => false
              case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
              case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
              case _ => true
            }
            val hashCols = batch.schema.fields.toIndexedSeq
              .filter(f => hashable(f.dataType)).map(f => col(f.name))
            val ordering = orderBy.map(col(_).desc) ++
              (if (hashCols.nonEmpty)
                Seq(org.apache.spark.sql.functions.xxhash64(hashCols: _*).desc)
              else Nil)
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(keyColumns.map(col): _*)
              .orderBy(ordering: _*)
            latest = batch.withColumn("__rn", row_number().over(w))
              .filter(col("__rn") === 1).drop("__rn")
              .persist()
            // distinct keys are guaranteed by the window above — skip the
            // merge's own duplicate probe (one aggregation saved per batch)
            engine.mergeInto(table, latest, keyColumns, userId,
              s"stream merge batch $batchId", deleteWhen = deleteWhen,
              requireDistinctSourceKeys = false)
            ()
          }
        } finally {
          if (latest != null) latest.unpersist()
          batch.unpersist()
        }
        ()
      }
      .start()
  }
}

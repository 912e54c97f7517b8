package graft.examples

import graft.core._
import graft.operators.VersionedTables
import graft.streaming.EventStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end Structured Streaming drive: file-source stream of events →
  * watermarked windowed aggregation → memory sink, plus the versioned
  * streaming sink (one commit per micro-batch, then time travel).
  * `sbt "runMain graft.examples.StreamingDemo"` */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmp = java.nio.file.Files.createTempDirectory("graft-streaming-demo-")
    val inDir = tmp.resolve("in").toString
    graft.Tables.events(spark, sfDir).write.parquet(inDir)
    val schema = spark.read.parquet(inDir).schema

    // windowed aggregation to a memory sink
    val stream = EventStreams.readEventStream(spark, inDir, schema)
    val q1 = EventStreams.windowedCounts(stream, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("demo_windows")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q1.processAllAvailable(); q1.stop()
    println("WINDOW_ROWS=" + spark.table("demo_windows").count())
    spark.table("demo_windows").orderBy(desc("n")).show(3, truncate = false)

    // versioned streaming sink + time travel
    val engine = VersionedTables.withFileStore(spark, tmp.resolve("store").toUri)
    val table = TableDefinition(TableName("stream", "events"),
      tmp.resolve("events").toUri, PartitionSchema("event_date"), FileFormat.Parquet)
    engine.initTable(table, UserId("demo"), "init")
    val q2 = EventStreams.writeVersioned(
      EventStreams.readEventStream(spark, inDir, schema)
        .withColumn("event_date", to_date(col("ts"))),
      engine, table, UserId("demo"), tmp.resolve("chk").toString)
    q2.processAllAvailable(); q2.stop()

    val log = engine.log(table.name)
    println("SINK_LOG=" + log.map(_.message))
    println("SINK_ROWS=" + engine.read(table).count())
    println("SINK_ROWS_BEFORE_STREAM=" + engine.readAt(table, log.last.id).count())

    // streaming corpus dedup: filter a document "stream" (sf0.001 documents
    // replayed as one batch, with planted near-dups) against a growing
    // versioned MinHash index
    val docsIn = tmp.resolve("docs_in").toString
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "source")
    docs.write.parquet(docsIn)
    val dedupDocs = TableDefinition(TableName("stream", "docs"),
      tmp.resolve("docs").toUri, PartitionSchema(graft.streaming.StreamingCorpusDedup.BatchCol),
      FileFormat.Parquet)
    val dedupIndex = TableDefinition(TableName("stream", "docs_index"),
      tmp.resolve("docs_index").toUri, PartitionSchema(graft.streaming.StreamingCorpusDedup.BatchCol),
      FileFormat.Parquet)
    engine.initTable(dedupDocs, UserId("demo"), "init")
    engine.initTable(dedupIndex, UserId("demo"), "init")
    val q3 = graft.streaming.StreamingCorpusDedup.writeDeduped(
      spark.readStream.schema(docs.schema).parquet(docsIn),
      engine, dedupDocs, dedupIndex, UserId("demo"), tmp.resolve("chk_dedup").toString)
    q3.processAllAvailable(); q3.stop()
    println("DEDUP_STREAM_IN=" + docs.count())
    println("DEDUP_STREAM_ACCEPTED=" + engine.read(dedupDocs).count())
    println("DEDUP_STREAM_INDEXED=" + engine.read(dedupIndex).select("id").distinct().count())

    // online event analytics: windowed funnel + retention cohorts over the
    // same event stream, state carried across micro-batches
    val evStream = EventStreams.readEventStream(spark, inDir, schema)
    val q4 = graft.streaming.StreamingCuration.windowedFunnelStepsStream(
        evStream, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), windowMicros = 6L * 3600 * 1000000)
      .writeStream.format("memory").queryName("demo_wfunnel")
      .trigger(Trigger.AvailableNow()).outputMode("update").start()
    q4.processAllAvailable(); q4.stop()
    val wf = spark.table("demo_wfunnel")
      .groupBy("user_id").agg(max("steps_completed").as("steps"))
      .groupBy("steps").count().orderBy("steps")
      .collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(",")
    println("STREAM_WFUNNEL_DIST=" + wf)

    val q5 = graft.streaming.StreamingCuration.retentionCohortsStream(
        EventStreams.readEventStream(spark, inDir, schema), "user_id", "ts")
      .writeStream.format("memory").queryName("demo_retention")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q5.processAllAvailable(); q5.stop()
    // the changelog consumer shape: sum(sign) per cell (a late first event
    // retracts provisional cells — distinct-ignoring-sign would count them)
    println("STREAM_RETENTION_CELLS=" + spark.table("demo_retention")
      .groupBy("cohort_week", "week_offset")
      .agg(sum("sign").as("n")).filter(col("n") > 0).count())

    // online SCD2: the dimension family's streaming member — change rows
    // off the signup/error observation stream, vs the batch build
    val q6 = graft.streaming.StreamingCuration.scd2Stream(
        EventStreams.readEventStream(spark, inDir, schema)
          .filter(col("event_type").isin("signup", "error")),
        Seq("user_id"), Seq("event_type"), "ts")
      .writeStream.format("memory").queryName("demo_scd2")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q6.processAllAvailable(); q6.stop()
    println("STREAM_SCD2_CHANGES=" + spark.table("demo_scd2").count())
    println("BATCH_SCD2_ROWS=" + graft.operators.Scd2.buildScd2(
      graft.Tables.events(spark, sfDir).filter(col("event_type").isin("signup", "error")),
      Seq("user_id"), Seq("event_type"), "ts").count())

    // streaming keyed upsert (CDC-apply): the newest event per user folds
    // into a current-state table, one commit per trigger
    val mergeTable = TableDefinition(TableName("stream", "user_state"),
      tmp.resolve("user_state").toUri, PartitionSchema("event_type"), FileFormat.Parquet)
    engine.initTable(mergeTable, UserId("demo"), "init")
    val q7 = EventStreams.writeVersionedMerged(
      EventStreams.readEventStream(spark, inDir, schema)
        .select(col("user_id"), col("event_type"), col("ts"), col("value"), col("event_id")),
      engine, mergeTable, keyColumns = Seq("user_id"),
      orderBy = Seq("ts", "event_id"), UserId("demo"),
      tmp.resolve("chk_merge").toString)
    q7.processAllAvailable(); q7.stop()
    println("MERGE_SINK_ROWS=" + engine.read(mergeTable).count())
    println("MERGE_SINK_DISTINCT_USERS=" + engine.read(mergeTable)
      .select("user_id").distinct().count())

    // streaming row-level CDC consumption off the merge sink's commits:
    // every commit's per-row feed, in order, once — and replaying the
    // delivered feeds reproduces the sink table (the CDC consumer law live)
    var cdcCommits = 0
    var cdcState = Map.empty[Long, Long] // user_id -> value
    val q8 = graft.streaming.ChangeFeedStream.rowChanges(
      spark, engine, tmp.resolve("store").toUri, mergeTable,
      keyColumns = Seq("user_id"), tmp.resolve("chk_cdc").toString) { (_, feed) =>
      cdcCommits += 1
      feed.select("user_id", "value", "_change_type").collect().foreach { r =>
        if (r.getString(2) == "delete") cdcState -= r.getLong(0)
        else cdcState += r.getLong(0) -> r.getDouble(1).toLong
      }
    }
    q8.awaitTermination()
    println("CDC_STREAM_COMMITS=" + cdcCommits)

    // exactly-once change-feed DELIVERY into a versioned table: the ledger
    // (delivery markers in the target's own commit log) makes a re-run with
    // a FRESH checkpoint deliver nothing twice — rows and delivery commits
    // both stay unique
    val cdcTarget = TableDefinition(TableName("stream", "user_state_copy"),
      tmp.resolve("user_state_copy").toUri,
      PartitionSchema("event_type", graft.streaming.ChangeFeedStream.DeliveryCol),
      FileFormat.Parquet)
    engine.initTable(cdcTarget, UserId("demo"), "init")
    def deliverOnce(chk: String): Unit = {
      val q = graft.streaming.ChangeFeedStream.deliverRowChanges(
        spark, engine, tmp.resolve("store").toUri, mergeTable,
        keyColumns = Seq("user_id"), cdcTarget, UserId("demo"),
        tmp.resolve(chk).toString,
        transform = f => f.filter(col("_change_type") =!= "delete").drop("_change_type"))
      q.awaitTermination()
    }
    deliverOnce("chk_once_a")
    val deliveredRows = engine.read(cdcTarget).count()
    deliverOnce("chk_once_b") // fresh checkpoint = full replay; ledger skips all
    println("CDC_EXACTLY_ONCE_ROWS_STABLE=" +
      (engine.read(cdcTarget).count() == deliveredRows))
    println("CDC_EXACTLY_ONCE_DELIVERIES=" + engine.log(cdcTarget.name)
      .count(_.message.contains("[graft-delivery")))
    println("CDC_STREAM_STATE_MATCHES=" + {
      val table = engine.read(mergeTable).select("user_id", "value")
        .collect().map(r => r.getLong(0) -> r.getDouble(1).toLong).toMap
      table == cdcState
    })
    spark.stop()
  }
}

package graft.streaming

import graft.TestSpark
import graft.operators.CorpusTools
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * The stateless corpus-prep projections (chunking, text scoring) are
 * streaming-ready BY CONSTRUCTION — pure per-row projections with no
 * aggregation state — but "should work under readStream" is exactly the
 * kind of claim that silently breaks (an operator growing a window or a
 * localCheckpoint would kill streamability). This spec pins it: the same
 * operator code runs over a MemoryStream and produces batch-identical
 * results across multiple micro-batches.
 */
case class StreamOpsDoc(doc_id: Long, text: String)

/** Ingestion row for the streaming write-audit-publish law. */
case class WapStreamDoc(doc_id: Long, text: String, part: String)

/** CDC-style change row for the streaming merge sink: `id` is the key,
  * `seq` orders a key's changes, negative balance marks a delete. */
case class MergeStreamRow(id: String, region: String, balance: Long, seq: Long)
case class MapMergeRow(id: String, region: String, attrs: Map[String, String], seq: Long)

class StreamingCorpusOpsSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Doc = StreamOpsDoc
  private def Doc(id: Long, text: String) = StreamOpsDoc(id, text)

  "chunkDocuments" should "run unchanged over a stream, batch-identical across micro-batches" in {
    val docs = Seq(
      Doc(1L, (1 to 23).map(i => s"a$i").mkString(" ")),
      Doc(2L, "short doc"),
      Doc(3L, (1 to 40).map(i => s"b$i").mkString(" ")),
      Doc(4L, ""))

    val source = MemoryStream[Doc](spark)
    val chunked = CorpusTools.chunkDocuments(source.toDF(), "doc_id", "text",
      maxTokens = 8, overlap = 2)
    val q = chunked.writeStream.format("memory").queryName("stream_chunks")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    source.addData(docs(0), docs(1))
    q.processAllAvailable()
    source.addData(docs(2), docs(3))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stream_chunks")
      .as[(Long, Int, Int, Int, String)].collect().toSet
    val batch = CorpusTools.chunkDocuments(docs.toDF(), "doc_id", "text",
        maxTokens = 8, overlap = 2)
      .as[(Long, Int, Int, Int, String)].collect().toSet
    streamed shouldBe batch
    streamed.map(_._1) shouldBe Set(1L, 2L, 3L) // the empty doc yields nothing
  }

  "lmPerplexity scoring" should "stream per-document with a pre-trained model" in {
    // train the model on a BATCH reference corpus (the published shape:
    // models train offline, score online), then score a stream with it.
    // lmPerplexity itself aggregates per doc — per-micro-batch grouping is
    // fine because each document arrives whole within one batch.
    val ref = Seq(Doc(1L, "good clean text"), Doc(2L, "good clean words")).toDF("doc_id", "text")
    val model = graft.operators.QualityModels.lmCostTable(ref, "text",
      org.apache.spark.sql.functions.lit(true))

    val source = MemoryStream[Doc](spark)
    val scored = graft.operators.QualityModels.lmPerplexity(
      source.toDF(), "doc_id", "text", model)
    val q = scored.writeStream.format("memory").queryName("stream_lm")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0)).start()

    source.addData(Doc(10L, "good clean text"), Doc(11L, "zz qq noise"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("stream_lm")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    out.keySet shouldBe Set(10L, 11L)
    out(11L) should be > out(10L) // noise scores worse under the reference LM
  }

  "bigram lmPerplexity scoring" should "stream per-document with a pre-trained model" in {
    // same offline-train/online-score shape as the unigram law; the bigram
    // units come from the native WordShingles kernel, still stateless per doc
    val ref = Seq(Doc(1L, "good clean text here"), Doc(2L, "good clean words here"))
      .toDF("doc_id", "text")
    val model = graft.operators.QualityModels.lmCostTable(ref, "text",
      org.apache.spark.sql.functions.lit(true), ngram = 2)

    val source = MemoryStream[Doc](spark)
    val scored = graft.operators.QualityModels.lmPerplexity(
      source.toDF(), "doc_id", "text", model, ngram = 2)
    val q = scored.writeStream.format("memory").queryName("stream_lm2")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0)).start()

    source.addData(Doc(10L, "good clean text here"), Doc(11L, "here text clean good"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("stream_lm2")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    // the scramble shares the bag of words but none of the transitions
    out(11L) should be > out(10L)
  }

  "urlHost/urlDomain" should "run unchanged over a stream (pure projection)" in {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      Doc(1L, "https://News.BBC.co.uk:443/story"),
      Doc(2L, "http://u@www.sub.example.com/x?q=1"),
      Doc(3L, "not a url"))

    val source = MemoryStream[Doc](spark)
    val extracted = source.toDF().select(col("doc_id"),
      graft.functions.TextFunctions.urlHost(col("text")).as("host"),
      graft.functions.TextFunctions.urlDomain(col("text")).as("domain"))
    val q = extracted.writeStream.format("memory").queryName("stream_urls")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    source.addData(docs(0), docs(1))
    q.processAllAvailable()
    source.addData(docs(2))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stream_urls")
      .as[(Long, String, String)].collect().toSet
    streamed shouldBe Set(
      (1L, "news.bbc.co.uk", "bbc.co.uk"),
      (2L, "www.sub.example.com", "example.com"),
      (3L, "", ""))
  }

  "writeVersionedAudited" should "publish clean micro-batches, refuse dirty ones invisibly, keep running" in {
    import graft.core._
    import graft.operators.{Expectations, VersionedTables}
    val root = java.nio.file.Files.createTempDirectory("graft-stream-wap-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("stream", "wap_docs"),
      root.resolve("docs").toUri, PartitionSchema("part"), FileFormat.Parquet)
    engine.initTable(table, UserId("stream"), "init")
    val checks = Seq(
      Expectations.NotNull(Seq("text")),
      Expectations.Unique(Seq("doc_id")))
    val refused = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Expectations.CheckResult])]()

    val source = MemoryStream[WapStreamDoc](spark)
    val q = EventStreams.writeVersionedAudited(
      source.toDF(), engine, table, UserId("stream"),
      root.resolve("chk").toString, checks,
      onRefused = (id, results) => refused.add((id, results)),
      trigger = Trigger.ProcessingTime(0))

    // clean delivery publishes
    source.addData(WapStreamDoc(1L, "alpha", "b0"), WapStreamDoc(2L, "beta", "b0"))
    q.processAllAvailable()
    engine.read(table).select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 2L)

    // dirty delivery (null text + duplicate key) is refused: invisible to
    // readers, no commit, query still alive, report delivered
    source.addData(WapStreamDoc(3L, null, "b1"), WapStreamDoc(3L, "gamma", "b1"))
    q.processAllAvailable()
    q.isActive shouldBe true
    engine.read(table).select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 2L)
    refused.size shouldBe 1
    refused.peek()._2.filterNot(_.ok).map(_.check).toSet shouldBe
      Set("not_null(text)", "unique(doc_id)")
    // the refused files are orphan debris with the failed-CAS lifecycle
    val debris = engine.orphanedVersions(table)
    debris should not be empty

    // the stream keeps ingesting: a later clean delivery publishes
    source.addData(WapStreamDoc(4L, "delta", "b2"))
    q.processAllAvailable()
    q.stop()
    engine.read(table).select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 2L, 4L)
    engine.log(table.name).map(_.message).count(_.startsWith("stream batch")) shouldBe 2

    // and the debris is reclaimable without touching the published data
    engine.vacuum(table, keepLast = 10, includeOrphans = true, dryRun = false)
      .failed shouldBe empty
    engine.orphanedVersions(table) shouldBe empty
    engine.read(table).count() shouldBe 3L
  }

  "writeVersionedMerged" should "fold a keyed change stream into the current state, latest-per-key, deletes included" in {
    import graft.core._
    import graft.operators.VersionedTables
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-stream-merge-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("stream", "accounts"),
      root.resolve("accounts").toUri, PartitionSchema("region"), FileFormat.Parquet)
    engine.initTable(table, UserId("stream"), "init")

    val source = MemoryStream[MergeStreamRow](spark)
    val q = EventStreams.writeVersionedMerged(
      source.toDF(), engine, table, keyColumns = Seq("id"), orderBy = Seq("seq"),
      UserId("stream"), root.resolve("chk").toString,
      deleteWhen = Some(col("balance") < 0),
      trigger = Trigger.ProcessingTime(0))

    // batch 1: bootstrap insert into an empty table; a2 changes twice in
    // the SAME batch — the seq-latest row must win the merge
    source.addData(MergeStreamRow("a1", "eu", 10, 1), MergeStreamRow("a2", "eu", 20, 1),
      MergeStreamRow("a2", "eu", 25, 2))
    q.processAllAvailable()
    def state() = engine.read(table).select("id", "balance")
      .as[(String, Long)].collect().toMap
    state() shouldBe Map("a1" -> 10L, "a2" -> 25L)
    val afterB1 = engine.log(table.name).head.id

    // batch 2: update a1's region partition sibling, delete a2, insert a3
    source.addData(MergeStreamRow("a1", "eu", 11, 3),
      MergeStreamRow("a2", "eu", -1, 3), MergeStreamRow("a3", "us", 30, 3))
    q.processAllAvailable()
    q.stop()
    state() shouldBe Map("a1" -> 11L, "a3" -> 30L)

    // every trigger was one atomic commit: time travel to the batch-1 state
    engine.readAt(table, afterB1).select("id", "balance")
      .as[(String, Long)].collect().toMap shouldBe Map("a1" -> 10L, "a2" -> 25L)

    // restart-replay law: re-merging batch 2's resolved content is
    // CONTENT-idempotent — matched keys re-take the same rows, the
    // already-deleted key's delete row is an unmatched no-op
    import graft.operators.VersionedMerge._
    engine.mergeInto(table,
      Seq(MergeStreamRow("a1", "eu", 11, 3), MergeStreamRow("a2", "eu", -1, 3),
        MergeStreamRow("a3", "us", 30, 3)).toDF(),
      Seq("id"), UserId("stream"), "replayed batch",
      deleteWhen = Some(col("balance") < 0))
    state() shouldBe Map("a1" -> 11L, "a3" -> 30L)
  }

  it should "merge schemas carrying MAP columns (the tie-break hashes only hashable types)" in {
    import graft.core._
    import graft.operators.VersionedTables
    // hash expressions reject MapType: a whole-row tie-break would make the
    // sink throw on every batch of such a schema — a regression over the
    // pre-tie-break sink. The hash must skip unhashable columns instead.
    val root = java.nio.file.Files.createTempDirectory("graft-stream-map-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("stream", "mapped"),
      root.resolve("mapped").toUri, PartitionSchema("region"), FileFormat.Parquet)
    engine.initTable(table, UserId("stream"), "init")
    val source = MemoryStream[MapMergeRow](spark)
    val q = EventStreams.writeVersionedMerged(
      source.toDF(), engine, table, keyColumns = Seq("id"), orderBy = Seq("seq"),
      UserId("stream"), root.resolve("chk").toString,
      trigger = Trigger.ProcessingTime(0))
    source.addData(
      MapMergeRow("m1", "eu", Map("a" -> "1"), 1),
      MapMergeRow("m1", "eu", Map("a" -> "2"), 2), // seq-latest wins
      MapMergeRow("m2", "us", Map.empty, 1))
    q.processAllAvailable(); q.stop()
    engine.read(table).select("id", "attrs")
      .as[(String, Map[String, String])].collect().toMap shouldBe
      Map("m1" -> Map("a" -> "2"), "m2" -> Map.empty[String, String])
  }

  "ChangeFeedStream.deliverRowChanges" should "deliver exactly once through a kill mid-batch" in {
    import graft.core._
    import graft.operators.VersionedTables
    import graft.operators.VersionedTables._
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-cdconce-")
    val storeRoot = root.resolve("store").toUri
    val engine = VersionedTables.withFileStore(spark, storeRoot)
    val source = TableDefinition(TableName("stream", "oncesrc"),
      root.resolve("oncesrc").toUri, PartitionSchema("region"), FileFormat.Parquet)
    val target = TableDefinition(TableName("stream", "oncedst"),
      root.resolve("oncedst").toUri,
      PartitionSchema("region", ChangeFeedStream.DeliveryCol), FileFormat.Parquet)
    engine.initTable(source, UserId("t"), "init")
    engine.initTable(target, UserId("t"), "init")
    // three source commits: two inserts + one more insert
    Seq(("a1", "eu", 10L), ("a2", "us", 20L)).toDF("id", "region", "balance")
      .versionedInsertInto(engine, source, UserId("t"), "base")
    Seq(("a3", "eu", 30L)).toDF("id", "region", "balance")
      .versionedInsertInto(engine, source, UserId("t"), "more")

    // transform that CRASHES the query after the first delivery commit has
    // landed but before the batch checkpoints — the at-least-once window
    @volatile var crashed = false
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    def run(crashOnSecond: Boolean): Unit = {
      seen.set(0)
      val q = ChangeFeedStream.deliverRowChanges(spark, engine, storeRoot,
        source, Seq("id"), target, UserId("t"), root.resolve("chk").toString,
        transform = { feed =>
          if (crashOnSecond && !feed.isEmpty && seen.incrementAndGet() == 2 && !crashed) {
            crashed = true
            sys.error("simulated crash between delivery and checkpoint")
          }
          feed.filter(col("_change_type") =!= "delete").drop("_change_type")
        })
      try q.awaitTermination()
      catch { case e: org.apache.spark.sql.streaming.StreamingQueryException =>
        if (!crashOnSecond) throw e }
    }
    run(crashOnSecond = true) // delivers "base", dies on "more"
    crashed shouldBe true
    engine.read(target).select("id").as[String].collect().sorted shouldBe
      Array("a1", "a2") // first delivery landed, second didn't

    run(crashOnSecond = false) // restart replays the batch from the checkpoint
    // ZERO duplicates: every source row exactly once...
    engine.read(target).select("id").as[String].collect().sorted shouldBe
      Array("a1", "a2", "a3")
    // ...and the replayed "base" delivery produced NO second commit — the
    // ledger skipped it (1 init + 2 deliveries, nothing else)
    val messages = engine.log(target.name).map(_.message)
    messages.count(_.contains("[graft-delivery")) shouldBe 2
    messages.flatMap("""#([0-9a-f-]+)\]""".r.findFirstMatchIn(_))
      .map(_.group(1)).distinct should have length 2

    // a fresh commit after the dust settles delivers normally
    Seq(("a4", "ap", 40L)).toDF("id", "region", "balance")
      .versionedInsertInto(engine, source, UserId("t"), "late")
    run(crashOnSecond = false)
    engine.read(target).select("id").as[String].collect().sorted shouldBe
      Array("a1", "a2", "a3", "a4")
    engine.log(target.name).map(_.message).count(_.contains("[graft-delivery")) shouldBe 3
  }

  "ChangeFeedStream" should "deliver each commit's row feed exactly once across restarts" in {
    import graft.core._
    import graft.operators.VersionedTables
    import graft.operators.VersionedTables._
    import graft.operators.VersionedMerge._
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-cdcstream-")
    val storeRoot = root.resolve("store").toUri
    val engine = VersionedTables.withFileStore(spark, storeRoot)
    val table = TableDefinition(TableName("stream", "cdcsrc"),
      root.resolve("cdcsrc").toUri, PartitionSchema("region"), FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    Seq(("a1", "eu", 10L), ("a2", "us", 20L)).toDF("id", "region", "balance")
      .versionedInsertInto(engine, table, UserId("t"), "base")
    engine.mergeInto(table, Seq(("a1", "eu", 11L)).toDF("id", "region", "balance"),
      Seq("id"), UserId("t"), "merge")

    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Set[(String, Long, String)])]
    def run(): Unit = {
      val q = ChangeFeedStream.rowChanges(spark, engine, storeRoot, table,
        Seq("id"), root.resolve("chk").toString) { (id, feed) =>
        seen += id.id -> feed.select("id", "balance", "_change_type")
          .as[(String, Long, String)].collect().toSet
        ()
      }
      q.awaitTermination() // AvailableNow terminates after draining
    }
    run()
    // three commits delivered IN ORDER: init (empty feed), base (inserts),
    // merge (one update)
    seen.map(_._1) shouldBe engine.log(table.name).reverse.map(_.id.id)
    seen(0)._2 shouldBe empty
    seen(1)._2 shouldBe Set(("a1", 10L, "insert"), ("a2", 20L, "insert"))
    seen(2)._2 shouldBe Set(("a1", 11L, "update"))

    // restart on the SAME checkpoint after one more commit: only the new
    // commit is delivered — the file-source checkpoint is the cursor
    seen.clear()
    Seq(("a3", "ap", 30L)).toDF("id", "region", "balance")
      .versionedInsertInto(engine, table, UserId("t"), "late insert")
    run()
    seen.map(_._1) shouldBe List(engine.log(table.name).head.id.id)
    seen(0)._2 shouldBe Set(("a3", 30L, "insert"))
  }

  it should "resolve orderBy TIES deterministically, independent of batch row order" in {
    import graft.core._
    import graft.operators.VersionedTables
    // two rows per key share the SAME seq — without the content-hash
    // tie-break the winner depends on shuffle placement, so a checkpoint
    // replay (which re-reads the same data but may partition differently)
    // could merge a different row than the original run, breaking the
    // content-idempotent-replay law the sink documents
    def run(rows: Seq[MergeStreamRow]): Map[String, Long] = {
      val root = java.nio.file.Files.createTempDirectory("graft-stream-tie-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val table = TableDefinition(TableName("stream", "tied"),
        root.resolve("tied").toUri, PartitionSchema("region"), FileFormat.Parquet)
      engine.initTable(table, UserId("stream"), "init")
      val source = MemoryStream[MergeStreamRow](spark)
      val q = EventStreams.writeVersionedMerged(
        source.toDF(), engine, table, keyColumns = Seq("id"), orderBy = Seq("seq"),
        UserId("stream"), root.resolve("chk").toString,
        trigger = Trigger.ProcessingTime(0))
      source.addData(rows: _*)
      q.processAllAvailable(); q.stop()
      engine.read(table).select("id", "balance").as[(String, Long)].collect().toMap
    }
    val tied = Seq(
      MergeStreamRow("a1", "eu", 10, 1), MergeStreamRow("a1", "eu", 99, 1),
      MergeStreamRow("a2", "us", 5, 2), MergeStreamRow("a2", "us", 7, 2))
    val forward = run(tied)
    forward shouldBe run(tied.reverse)
    forward.keySet shouldBe Set("a1", "a2")
  }
}

package graft.streaming

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables
import graft.operators.VersionedTables._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

case class StreamDoc(doc_id: Long, text: String, source: String)

class StreamingCorpusDedupSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A ~40-word text; variants share all but the tail so 3-gram shingle
    * Jaccard stays >= 0.9 (well above the 0.8 threshold). */
  private def baseText(tag: String): String =
    (0 until 40).map(i => s"${tag}w$i").mkString(" ")
  private def nearDupOf(tag: String): String = baseText(tag) + " extra"

  private def newEngine() = {
    val root = Files.createTempDirectory("graft-sdedup-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val docs = TableDefinition(TableName("stream", "docs"), root.resolve("docs").toUri,
      PartitionSchema(StreamingCorpusDedup.BatchCol), FileFormat.Parquet)
    val index = TableDefinition(TableName("stream", "docs_index"), root.resolve("index").toUri,
      PartitionSchema(StreamingCorpusDedup.BatchCol), FileFormat.Parquet)
    engine.initTable(docs, UserId("t"), "init")
    engine.initTable(index, UserId("t"), "init")
    (root, engine, docs, index)
  }

  "filterNovel" should "drop near-dups of the index, dedup within the batch, and pass novel docs" in {
    val corpus = Seq(StreamDoc(1L, baseText("a"), "s")).toDF()
    val index = StreamingCorpusDedup.bandedSignatures(corpus)
    val batch = Seq(
      StreamDoc(10L, nearDupOf("a"), "s"),   // near-dup of indexed doc 1 -> dropped
      StreamDoc(11L, baseText("b"), "s"),    // novel -> kept
      StreamDoc(12L, nearDupOf("b"), "s"),   // in-batch near-dup of 11 -> dropped (11 canonical)
      StreamDoc(13L, baseText("c"), "s")     // novel -> kept
    ).toDF()

    val novel = StreamingCorpusDedup.filterNovel(batch, index)
      .select("doc_id").as[Long].collect().toSet
    novel shouldBe Set(11L, 13L)
  }

  it should "pass everything through on a cold start (empty index)" in {
    val batch = Seq(StreamDoc(1L, baseText("x"), "s")).toDF()
    val empty = spark.emptyDataFrame
    StreamingCorpusDedup.filterNovel(batch, empty)
      .select("doc_id").as[Long].collect().toSet shouldBe Set(1L)
  }

  "acceptBatch" should "run the full ingestion transaction: dedup, commit docs, grow the index" in {
    import org.apache.spark.sql.functions.col
    val (_, engine, docsTable, indexTable) = newEngine()

    // delivery 1: two docs, one in-batch near-dup pair -> 1 canonical + 1 novel
    val d1 = Seq(
      StreamDoc(1L, baseText("a"), "s"), StreamDoc(2L, nearDupOf("a"), "s"),
      StreamDoc(3L, baseText("b"), "s")).toDF()
    StreamingCorpusDedup.acceptBatch(d1, engine, docsTable, indexTable, "2024-06-01", UserId("t")) shouldBe 2L
    engine.read(docsTable).select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 3L)

    // delivery 2: a near-dup of delivery 1's doc is rejected AGAINST THE
    // INDEX (not by re-reading delivery 1's text); a novel doc lands
    val d2 = Seq(
      StreamDoc(10L, nearDupOf("b"), "s"),   // near-dup of indexed 3 -> dropped
      StreamDoc(11L, baseText("c"), "s")).toDF()
    StreamingCorpusDedup.acceptBatch(d2, engine, docsTable, indexTable, "2024-06-02", UserId("t")) shouldBe 1L
    engine.read(docsTable).select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 3L, 11L)

    // the index grew one partition per delivery, and docs/index version together
    engine.read(indexTable).select("batch").distinct().as[String].collect().toSet shouldBe
      Set("2024-06-01", "2024-06-02")
    engine.log(docsTable.name).map(_.message).take(2) shouldBe
      List("accept batch 2024-06-02", "accept batch 2024-06-01")

    // an all-duplicate delivery is a no-op: zero accepted, no commit
    val before = engine.log(docsTable.name).length
    StreamingCorpusDedup.acceptBatch(
      Seq(StreamDoc(20L, nearDupOf("c"), "s")).toDF(),
      engine, docsTable, indexTable, "2024-06-03", UserId("t")) shouldBe 0L
    engine.log(docsTable.name).length shouldBe before
  }

  "rebuildIndex" should "repair a lost index from the corpus so rejection works again" in {
    import org.apache.spark.sql.functions.col
    val (_, engine, docsTable, indexTable) = newEngine()
    val d1 = Seq(StreamDoc(1L, baseText("a"), "s"), StreamDoc(2L, baseText("b"), "s")).toDF()
    StreamingCorpusDedup.acceptBatch(d1, engine, docsTable, indexTable, "d1", UserId("t")) shouldBe 2L

    // simulate the documented crash window: the index loses its signatures
    // (docs committed, index commit never landed)
    engine.versioned.commit(indexTable.name, TableUpdate(UserId("t"), "simulate loss",
      java.time.Instant.now(), List(TableOperation.RemovePartition(Partition(
        StreamingCorpusDedup.BatchCol, "d1")))))
    // recall is now broken: a near-dup of an accepted doc slips through
    StreamingCorpusDedup.acceptBatch(
      Seq(StreamDoc(10L, nearDupOf("a"), "s")).toDF(),
      engine, docsTable, indexTable, "dup-slips", UserId("t")) shouldBe 1L

    // rebuild from the corpus: signatures for every accepted doc, one commit
    val n = StreamingCorpusDedup.rebuildIndex(engine, docsTable, indexTable, UserId("t"))
    n should be > 0L
    val rebuilt = engine.read(indexTable).select("id").distinct().as[Long].collect().toSet
    rebuilt shouldBe engine.read(docsTable).select("doc_id").as[Long].collect().toSet

    // and rejection works again
    StreamingCorpusDedup.acceptBatch(
      Seq(StreamDoc(20L, nearDupOf("b"), "s")).toDF(),
      engine, docsTable, indexTable, "d2", UserId("t")) shouldBe 0L
  }

  it should "equal dedupAgainstCorpus when fed that corpus's persisted index (batch/stream parity)" in {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val delivery = docs.filter(col("doc_id") >= 250)
    val corpus = docs.filter(col("doc_id") < 250)

    // recompute path (batch operator, re-hashes corpus text)
    val recompute = graft.operators.Dedup.dedupAgainstCorpus(delivery, corpus)
      .select("doc_id").as[Long].collect().toSet

    // index path: persist the corpus signatures as a versioned table, read
    // them back, and dedup the delivery against the index only
    val (_, engine, _, indexTable) = newEngine()
    StreamingCorpusDedup.bandedSignatures(corpus)
      .withColumn(StreamingCorpusDedup.BatchCol, lit("0"))
      .versionedInsertInto(engine, indexTable, UserId("t"), "index corpus")
    val viaIndex = StreamingCorpusDedup.filterNovel(
        delivery, engine.read(indexTable).select("id", "hs", "band", "band_hash"))
      .select("doc_id").as[Long].collect().toSet

    viaIndex shouldBe recompute
  }

  "writeDeduped" should "accept only novel docs per micro-batch and version corpus + index together" in {
    val (root, engine, docsTable, indexTable) = newEngine()
    val source = MemoryStream[StreamDoc](spark)
    // ProcessingTime trigger: AvailableNow would terminate after draining the
    // first batch, and this test feeds TWO batches through one query
    val q = StreamingCorpusDedup.writeDeduped(
      source.toDF(), engine, docsTable, indexTable, UserId("t"),
      root.resolve("ckpt").toString,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))

    // batch 0: two distinct docs plus an in-batch near-dup
    source.addData(
      StreamDoc(1L, baseText("a"), "s"),
      StreamDoc(2L, nearDupOf("a"), "s"), // loses to 1 in-batch
      StreamDoc(3L, baseText("b"), "s"))
    q.processAllAvailable()

    engine.read(docsTable).select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 3L)

    // batch 1: a near-dup of an ACCEPTED doc (cross-batch reject) + a novel one
    source.addData(
      StreamDoc(4L, nearDupOf("b"), "s"), // near-dup of 3 -> rejected via the index
      StreamDoc(5L, baseText("c"), "s"))
    q.processAllAvailable()
    q.stop()

    val accepted = engine.read(docsTable).select("doc_id").as[Long].collect().toSet
    accepted shouldBe Set(1L, 3L, 5L)

    // the index grew with exactly the accepted docs
    engine.read(indexTable).select("id").distinct().as[Long].collect().toSet shouldBe Set(1L, 3L, 5L)

    // corpus and index versioned together: one docs commit + one index commit
    // per non-empty batch (plus init), and time travel sees batch-0 state
    val docLog = engine.log(docsTable.name)
    docLog should have size 3 // init + 2 batches
    val afterBatch0 = docLog(1) // log is newest-first
    engine.readAt(docsTable, afterBatch0.id)
      .select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 3L)

    // restart with the same checkpoint: no reprocessing, no duplicate commits
    val q2 = StreamingCorpusDedup.writeDeduped(
      source.toDF(), engine, docsTable, indexTable, UserId("t"),
      root.resolve("ckpt").toString)
    q2.processAllAvailable(); q2.stop()
    engine.log(docsTable.name) should have size 3
  }
}

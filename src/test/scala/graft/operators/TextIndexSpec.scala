package graft.operators

import graft.TestSpark
import graft.core._
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.io.File
import java.nio.file.Files

class TextIndexSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newIndexTable(): (VersionedTables, TableDefinition) = {
    val dir = Files.createTempDirectory("graft-ti-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val table = TableDefinition(TableName("test", "postings"), new File(dir, "postings").toURI,
      TextIndex.indexSchema, FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    (engine, table)
  }

  private def docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
  private val terms = Seq("hash", "join", "dup")

  behavior of "TextIndex (versioned BM25 postings)"

  it should "answer searches identically to the corpus-scan BM25" in {
    val (engine, table) = newIndexTable()
    TextIndex.buildIndex(engine, table, docs, buckets = 16, userId = UserId("t"))
    val viaIndex = TextIndex.search(engine, table, terms, k = 25)
      .as[(Long, Long, Long)].collect().toSeq
    val viaScan = TextSearch.bm25TopK(docs, "doc_id", "text", terms, k = 25)
      .as[(Long, Long, Long)].collect().toSeq
    viaIndex shouldBe viaScan // rows, scores, AND order — shared arithmetic
  }

  it should "list only the query terms' buckets plus stats (pruning IS the inverted file)" in {
    val (engine, table) = newIndexTable()
    TextIndex.buildIndex(engine, table, docs, buckets = 16, userId = UserId("t"))
    val allFiles = engine.read(table).inputFiles.length
    val oneTerm = TextIndex.search(engine, table, Seq("dup"), k = 5)
    oneTerm.inputFiles.length should be < allFiles
    oneTerm.count() should be > 0L
  }

  it should "grow by atomic batch appends that match a full rebuild" in {
    val (engine, table) = newIndexTable()
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 =!= 0)
    TextIndex.buildIndex(engine, table, a, buckets = 16, userId = UserId("t"), message = "base")
    val preBatch = engine.log(table.name).head.id
    TextIndex.addBatch(engine, table, b, batchLabel = "b1", userId = UserId("t"))

    val (engine2, table2) = newIndexTable()
    TextIndex.buildIndex(engine2, table2, docs, buckets = 16, userId = UserId("t"))

    val incremental = TextIndex.search(engine, table, terms, k = 25)
      .as[(Long, Long, Long)].collect().toSeq
    val rebuilt = TextIndex.search(engine2, table2, terms, k = 25)
      .as[(Long, Long, Long)].collect().toSeq
    incremental shouldBe rebuilt

    // time travel: at the pre-batch commit, stats and postings are batch A's
    val old = TextIndex.search(engine, table, terms, k = 25, at = Some(preBatch))
      .as[(Long, Long, Long)].collect().toSeq
    val scanA = TextSearch.bm25TopK(a, "doc_id", "text", terms, k = 25)
      .as[(Long, Long, Long)].collect().toSeq
    old shouldBe scanA
  }

  it should "compact batches into one without changing answers, keeping history" in {
    val (engine, table) = newIndexTable()
    TextIndex.buildIndex(engine, table,
      docs.filter($"doc_id" < 20), buckets = 8, userId = UserId("t"))
    TextIndex.addBatch(engine, table, docs.filter($"doc_id" >= 20 && $"doc_id" < 35),
      batchLabel = "b1", userId = UserId("t"))
    TextIndex.addBatch(engine, table, docs.filter($"doc_id" >= 35),
      batchLabel = "b2", userId = UserId("t"))
    val preCompact = engine.log(table.name).head.id
    val before = TextIndex.search(engine, table, terms, k = 25)
      .as[(Long, Long, Long)].collect().toSeq
    val partsBefore = engine.versionAt(table.name, preCompact) match {
      case PartitionedTableVersion(p) => p.size
      case _ => fail("expected partitioned version")
    }

    TextIndex.compactBatches(engine, table, userId = UserId("t"))

    val after = TextIndex.search(engine, table, terms, k = 25)
      .as[(Long, Long, Long)].collect().toSeq
    after shouldBe before
    // three batches x buckets collapse to one batch per bucket
    val partsAfter = engine.versionAt(table.name, engine.log(table.name).head.id) match {
      case PartitionedTableVersion(p) => p.size
      case _ => fail("expected partitioned version")
    }
    partsAfter should be < partsBefore
    // a post-compaction delivery continues the incremental life cycle
    TextIndex.addBatch(engine, table, docs.limit(0), batchLabel = "b3",
      userId = UserId("t"))
    // and the pre-compaction state remains searchable
    val old = TextIndex.search(engine, table, terms, k = 25, at = Some(preCompact))
      .as[(Long, Long, Long)].collect().toSeq
    old shouldBe before
  }

  it should "refuse a reused batch label instead of overwriting a delivery" in {
    val (engine, table) = newIndexTable()
    TextIndex.buildIndex(engine, table, docs.limit(10), buckets = 8, userId = UserId("t"))
    TextIndex.addBatch(engine, table, docs.limit(20).filter($"doc_id" >= 10),
      batchLabel = "d1", userId = UserId("t"))
    an[IllegalArgumentException] should be thrownBy
      TextIndex.addBatch(engine, table, docs.filter($"doc_id" >= 20),
        batchLabel = "d1", userId = UserId("t"))
  }

  it should "derive the bucket geometry from the index, never the caller" in {
    // built with 8 buckets; search and addBatch take no geometry argument,
    // so a stale caller constant can no longer mis-prune the wrong modulus
    val (engine, table) = newIndexTable()
    TextIndex.buildIndex(engine, table, docs, buckets = 8, userId = UserId("t"))
    val viaIndex = TextIndex.search(engine, table, terms, k = 25)
      .as[(Long, Long, Long)].collect().toSeq
    val viaScan = TextSearch.bm25TopK(docs, "doc_id", "text", terms, k = 25)
      .as[(Long, Long, Long)].collect().toSeq
    viaIndex shouldBe viaScan
  }

  it should "fail loudly on an empty index instead of returning garbage" in {
    val (engine, table) = newIndexTable()
    TextIndex.buildIndex(engine, table, docs.limit(0), buckets = 8, userId = UserId("t"))
    val e = the[IllegalArgumentException] thrownBy
      TextIndex.search(engine, table, terms, k = 5)
    e.getMessage should include("indexes no documents")
  }

  it should "replace-all on rebuild so stale batches cannot leak" in {
    val (engine, table) = newIndexTable()
    TextIndex.buildIndex(engine, table, docs, buckets = 16, userId = UserId("t"), message = "v1")
    // rebuild from a SHRUNK corpus: old batches must vanish from the head
    val shrunk = docs.filter($"doc_id" < 5)
    TextIndex.buildIndex(engine, table, shrunk, buckets = 16, userId = UserId("t"), message = "v2")
    val viaIndex = TextIndex.search(engine, table, terms, k = 50)
      .as[(Long, Long, Long)].collect().toSeq
    val viaScan = TextSearch.bm25TopK(shrunk, "doc_id", "text", terms, k = 50)
      .as[(Long, Long, Long)].collect().toSeq
    viaIndex shouldBe viaScan
  }
}

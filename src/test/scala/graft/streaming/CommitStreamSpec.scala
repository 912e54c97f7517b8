package graft.streaming

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables
import graft.operators.VersionedTables._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.io.File
import java.nio.file.Files

case class Tick(k: String, day: String, v: Double)

class CommitStreamSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  behavior of "CommitStream"

  it should "stream the table's commits with their typed operations" in {
    val dir = Files.createTempDirectory("graft-cstream-").toFile
    val storeRoot = new File(dir, "store").toURI
    val engine = VersionedTables.withFileStore(spark, storeRoot)
    val table = TableDefinition(TableName("test", "ticks"), new File(dir, "ticks").toURI,
      PartitionSchema("day"), FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    Seq(Tick("a", "d1", 1.0)).toDS().versionedInsertInto(engine, table, UserId("alice"), "load d1")
    Seq(Tick("b", "d2", 2.0)).toDS().versionedInsertInto(engine, table, UserId("bob"), "load d2")

    val q = CommitStream.commits(spark, storeRoot, table.name)
      .writeStream.format("memory").queryName("commit_stream")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val rows = spark.table("commit_stream")
      .orderBy("timestamp")
      .select("userId", "message", "operations")
      .collect()
    rows.map(_.getString(1)).toList shouldBe List("init", "load d1", "load d2")
    rows.map(_.getString(0)).toList shouldBe List("t", "alice", "bob")

    val initOps = rows(0).getSeq[org.apache.spark.sql.Row](2)
    initOps.map(_.getAs[String]("type")) shouldBe Seq("init-table")
    val d1Ops = rows(1).getSeq[org.apache.spark.sql.Row](2)
    // the first data write is a schema-DEFINING commit (round 14): it
    // records the table schema alongside the partition it adds
    d1Ops.map(_.getAs[String]("type")) shouldBe
      Seq("set-table-schema", "add-partition-version")
    val d1Add = d1Ops.find(_.getAs[String]("type") == "add-partition-version").get
    d1Add.getAs[String]("partition") shouldBe "day=d1"
    Version.parse(d1Add.getAs[String]("version")).isRight shouldBe true

    // commit ids in the stream are resolvable against the engine's log
    val streamedIds = spark.table("commit_stream").select("id").as[String].collect().toSet
    engine.log(table.name).map(_.id.id).toSet shouldBe streamedIds
  }

  it should "compose with readChangesAt into an order-free streaming CDC feed" in {
    val dir = Files.createTempDirectory("graft-cstream3-").toFile
    val storeRoot = new File(dir, "store").toURI
    val engine = VersionedTables.withFileStore(spark, storeRoot)
    val table = TableDefinition(TableName("test", "ticks3"), new File(dir, "ticks3").toURI,
      PartitionSchema("day"), FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    Seq(Tick("a", "d1", 1.0), Tick("b", "d2", 2.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "load d1+d2")
    Seq(Tick("c", "d3", 3.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "add d3")
    Seq(Tick("a2", "d2", 20.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "reprocess d2")

    // the CDC consumer pattern: stream the commit log, and for EVERY commit
    // id read exactly that commit's rows. File-source batches are unordered
    // — readChangesAt is a pure function of the id, so order can't matter.
    val perCommit = new java.util.concurrent.ConcurrentHashMap[String, Set[(String, String, Double)]]()
    val q = CommitStream.commits(spark, storeRoot, table.name)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.select("id", "message").collect().foreach { r =>
          val rows = engine.readChangesAt(table, CommitId(r.getString(0)))
            .select("k", "day", "v").as[(String, String, Double)].collect().toSet
          perCommit.put(r.getString(1), rows)
        }
      }
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q.processAllAvailable(); q.stop()

    perCommit.get("init") shouldBe Set()
    perCommit.get("load d1+d2") shouldBe Set(("a", "d1", 1.0), ("b", "d2", 2.0))
    perCommit.get("add d3") shouldBe Set(("c", "d3", 3.0))
    perCommit.get("reprocess d2") shouldBe Set(("a2", "d2", 20.0))

    // idempotent: re-reading any commit (a replayed batch) yields the same rows
    val log = engine.log(table.name)
    val repro = log.find(_.message == "reprocess d2").get.id
    engine.readChangesAt(table, repro).select("k").as[String].collect().toSet shouldBe Set("a2")
    an[UnknownCommitError] should be thrownBy
      engine.readChangesAt(table, CommitId("nope"))
  }

  it should "pick up commits that land after the first batch (incremental tailing)" in {
    val dir = Files.createTempDirectory("graft-cstream2-").toFile
    val storeRoot = new File(dir, "store").toURI
    val engine = VersionedTables.withFileStore(spark, storeRoot)
    val table = TableDefinition(TableName("test", "ticks2"), new File(dir, "ticks2").toURI,
      PartitionSchema("day"), FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    Seq(Tick("a", "d1", 1.0)).toDS().versionedInsertInto(engine, table, UserId("t"), "first")

    val checkpoint = new File(dir, "ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def drain(): Unit = {
      val q = CommitStream.commits(spark, storeRoot, table.name)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.select("message").collect().foreach(r => seen.add(r.getString(0)))
        }
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    drain()
    seen.size() shouldBe 2 // init + first

    Seq(Tick("b", "d2", 2.0)).toDS().versionedInsertInto(engine, table, UserId("t"), "second")
    drain()
    // restart from the checkpoint: only the NEW commit is appended
    seen.size() shouldBe 3
    seen.toArray.map(_.toString) should contain("second")
  }
}

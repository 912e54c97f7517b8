package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables._
import graft.operators.DeleteVectors._
import graft.operators.VersionedDml._

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Durable RESTORE ([[graft.core.VersionedMetastore.restore]]) interaction
  * laws: the restored state must survive later writes whatever the target
  * state is made of — deletion-vector markers (base bindings resolve from
  * the full history), evolved schemas (the restore commit re-records the
  * restored shape), snapshot tables (one AddTableVersion), and CAS
  * conflicts (a concurrent commit mid-restore loses nothing). */
class RestoreSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def newTable(options: Map[String, String] = Map.empty): (VersionedTables, TableDefinition) = {
    val dir = Files.createTempDirectory("graft-restore-").toFile
    val engine = VersionedTables.withFileStore(spark,
      new java.io.File(dir, "store").toURI)
    val table = TableDefinition(TableName("rest", s"t${seq.incrementAndGet()}"),
      new java.io.File(dir, "t").toURI, PartitionSchema("day"), FileFormat.Parquet,
      options = options)
    engine.initTable(table, UserId("t"), "init")
    (engine, table)
  }

  behavior of "restore"

  it should "restore TO a deletion-vector state: bases resolve, reads exact, durable" in {
    val (engine, table) = newTable()
    (0L until 400L).map(k => (k, s"d${k % 4}")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "load")
    engine.deleteWhereDV(table, col("k") % 7 === 0, UserId("t"), "dv %7")
    val dvState = engine.headCommit(table.name)
    val dvRows = engine.read(table).select("k").as[Long].collect().sorted
    // fold the DVs away, then delete MORE rows copy-on-write
    engine.compact(table, UserId("t"), "fold")
    engine.deleteWhere(table, col("k") % 2 === 0, UserId("t"), "cow evens")
    engine.read(table).count() should be < dvRows.length.toLong

    // restore to the MARKER state: partitions repoint to marker versions;
    // their base bindings live in the full history, so reads apply the DVs
    val (update, _) = engine.restore(table.name, dvState, UserId("t"), "undo everything")
    engine.read(table).select("k").as[Long].collect().sorted shouldBe dvRows
    engine.tracker.currentVersion(table.name) match {
      case PartitionedTableVersion(pvs) =>
        pvs.valuesIterator.exists(Version.isDeleteMarker) shouldBe true
      case other => fail(s"unexpected $other")
    }
    // durable: an unrelated insert after the restore keeps the DV state
    Seq((9991L, "d9")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "unrelated insert")
    engine.read(table).filter(col("day") =!= "d9")
      .select("k").as[Long].collect().sorted shouldBe dvRows
    // and a further DV delete stacks on the restored markers (depth-1 rebase)
    engine.deleteWhereDV(table, col("k") === 3L, UserId("t"), "dv post-restore")
    engine.read(table).filter(col("day") =!= "d9")
      .select("k").as[Long].collect().sorted shouldBe dvRows.filterNot(_ == 3L)
    update.operations should not be empty
  }

  it should "re-record the restored schema so reads and writes see the restored shape" in {
    val (engine, table) = newTable(Map("mergeSchema" -> "true"))
    (0L until 10L).map(k => (k, s"d${k % 2}")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "narrow")
    val narrow = engine.headCommit(table.name)
    (10L until 20L).map(k => (k, s"x$k", s"d${k % 2}")).toDF("k", "extra", "day")
      .versionedInsertIntoEvolving(engine, table, UserId("t"), "widen")
    engine.read(table).columns.toSet shouldBe Set("k", "extra", "day")

    engine.restore(table.name, narrow, UserId("t"), "back to narrow")
    // the restore commit re-recorded the NARROW schema: log-resolved reads
    // plan the restored shape, not the tip's wider record
    val st = engine.tracker.tableState(table.name)
    VersionedTables.parseSchemaJson(st.currentSchemaJson)
      .get.fieldNames.map(_.toLowerCase).toSet shouldBe Set("k", "day")
    engine.read(table).columns.toSet shouldBe Set("k", "day")
    engine.read(table).count() shouldBe 10
    // writes under the restored shape pass the drift guard (no stale wide
    // record); the write REPLACES both touched partitions (reprocess
    // semantics), so the table is exactly the 5 new rows
    (20L until 25L).map(k => (k, s"d${k % 2}")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "narrow again")
    engine.read(table).count() shouldBe 5
    engine.read(table).columns.toSet shouldBe Set("k", "day")
  }

  it should "restore snapshot tables via one AddTableVersion" in {
    val dir = Files.createTempDirectory("graft-restore-snap-").toFile
    val engine = VersionedTables.withFileStore(spark,
      new java.io.File(dir, "store").toURI)
    val table = TableDefinition(TableName("rest", s"snap${seq.incrementAndGet()}"),
      new java.io.File(dir, "t").toURI, PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    Seq(1L, 2L, 3L).toDF("k").versionedInsertInto(engine, table, UserId("t"), "v1")
    val v1 = engine.headCommit(table.name)
    Seq(10L).toDF("k").versionedInsertInto(engine, table, UserId("t"), "v2")
    engine.read(table).count() shouldBe 1

    val (update, _) = engine.restore(table.name, v1, UserId("t"), "back to v1")
    update.operations should have size 1
    update.operations.head shouldBe a[TableOperation.AddTableVersion]
    engine.read(table).as[Long].collect().sorted shouldBe Array(1L, 2L, 3L)
    // durable: the next snapshot write replaces as usual; restoring again works
    Seq(99L).toDF("k").versionedInsertInto(engine, table, UserId("t"), "v3")
    engine.read(table).as[Long].collect() shouldBe Array(99L)
  }

  it should "CAS on the entry ref: a concurrent commit mid-restore conflicts loudly" in {
    val (engine, table) = newTable()
    Seq((1L, "d0")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "load")
    val target = engine.headCommit(table.name)
    Seq((2L, "d1")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "later")
    // simulate the race: the tracker-level restore with a stale expected head
    val st = engine.tracker.tableState(table.name)
    intercept[CommitConflictError] {
      engine.tracker.commitIf(table.name,
        TableUpdate(UserId("t"), "stale restore", java.time.Instant.now(), Nil),
        st.updates(st.updates.size - 2).metadata.id)
    }
    // the real restore against the live head succeeds
    engine.restore(table.name, target, UserId("t"), "undo later")
    engine.read(table).count() shouldBe 1
  }

  it should "restore an EMPTY initial state by removing every partition" in {
    val (engine, table) = newTable()
    val init = engine.headCommit(table.name)
    (0L until 40L).map(k => (k, s"d${k % 4}")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "load")
    engine.read(table).count() shouldBe 40
    val (update, _) = engine.restore(table.name, init, UserId("t"), "truncate-by-restore")
    update.operations should have size 4 // one RemovePartition per partition
    all(update.operations.map(_.isInstanceOf[TableOperation.RemovePartition])) shouldBe true
    engine.read(table).count() shouldBe 0
    // history intact: the data is one more restore away
    val st = engine.tracker.tableState(table.name)
    val loadCommit = st.updates.find(_.metadata.message == "load").get.metadata.id
    engine.restore(table.name, loadCommit, UserId("t"), "un-truncate")
    engine.read(table).count() shouldBe 40
  }
}

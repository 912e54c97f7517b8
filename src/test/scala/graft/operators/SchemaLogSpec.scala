package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables._

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The commit log as the schema of record (round-14): schema-DEFINING
  * commits carry a `SetTableSchema` op, `TableState.schemaJsonAt` resolves
  * it per commit (honest time travel), and the mergeSchema read/guard paths
  * consume it so evolved-table planning opens ZERO data-file footers — the
  * 100 TB fix for the "footer-merge every live file per statement" tax.
  * The footer claims are proven by CORRUPTING footers: a hinted plan that
  * still resolves can't have read them; the hint-less control fails. */
class SchemaLogSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def newTable(options: Map[String, String] = Map("mergeSchema" -> "true"))
      : (VersionedTables, TableDefinition) = {
    val dir = Files.createTempDirectory("graft-schemalog-").toFile
    val engine = VersionedTables.withFileStore(spark,
      new java.io.File(dir, "store").toURI)
    val table = TableDefinition(TableName("slog", s"t${seq.incrementAndGet()}"),
      new java.io.File(dir, "t").toURI, PartitionSchema("day"), FileFormat.Parquet,
      options = options)
    engine.initTable(table, UserId("t"), "init")
    (engine, table)
  }

  private def schemaOps(engine: VersionedTables, table: TableDefinition): List[String] =
    engine.tracker.tableState(table.name).updates.flatMap(_.operations).collect {
      case TableOperation.SetTableSchema(json) => json
    }

  /** Overwrite every parquet file under `dir` (recursively) with garbage so
    * any footer read of it fails loudly. */
  private def corruptParquetFooters(dir: java.net.URI): Int = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File): List[java.io.File] =
      if (f.isDirectory) f.listFiles().toList.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) List(f) else Nil
    val files = walk(root)
    files.foreach { f =>
      java.nio.file.Files.write(f.toPath, Array.fill[Byte](64)(0x7f))
    }
    files.size
  }

  behavior of "SetTableSchema recording"

  it should "record exactly the schema-defining commits" in {
    val (engine, table) = newTable()
    Seq((1L, "d1")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "v1")
    schemaOps(engine, table).size shouldBe 1 // first write defines
    Seq((2L, "d2")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "v2 same shape")
    schemaOps(engine, table).size shouldBe 1 // steady state records nothing
    Seq((3L, "x", "d3")).toDF("k", "extra", "day")
      .versionedInsertIntoEvolving(engine, table, UserId("t"), "v3 evolve")
    val ops = schemaOps(engine, table)
    ops.size shouldBe 2 // evolution defines the union
    val union = VersionedTables.parseSchemaJson(Some(ops.last)).get
    union.fieldNames.map(_.toLowerCase).toSet shouldBe Set("k", "extra", "day")
  }

  it should "resolve schemaJsonAt per commit — honest time travel" in {
    val (engine, table) = newTable()
    Seq((1L, "d1")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "v1")
    val pre = engine.headCommit(table.name)
    Seq((2L, "x", "d2")).toDF("k", "extra", "day")
      .versionedInsertIntoEvolving(engine, table, UserId("t"), "v2")
    val st = engine.tracker.tableState(table.name)
    val preSchema = VersionedTables.parseSchemaJson(st.schemaJsonAt(pre)).get
    preSchema.fieldNames.toSet shouldBe Set("k", "day")
    val curSchema = VersionedTables.parseSchemaJson(st.currentSchemaJson).get
    curSchema.fieldNames.toSet shouldBe Set("k", "extra", "day")
    // and the read APIs agree
    engine.readAt(table, pre).columns.toSet shouldBe Set("k", "day")
    engine.read(table).columns.toSet shouldBe Set("k", "extra", "day")
  }

  behavior of "log-resolved schema (zero footer reads)"

  it should "plan evolved-table reads without opening any footer" in {
    val (engine, table) = newTable()
    Seq((1L, "d1"), (2L, "d2")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "v1")
    Seq((3L, "x", "d3")).toDF("k", "extra", "day")
      .versionedInsertIntoEvolving(engine, table, UserId("t"), "v2")
    // corrupt EVERY live data file: planning that touches any footer now
    // fails loudly — so a successful .schema proves zero footers were read
    corruptParquetFooters(table.location) should be > 0
    val planned = engine.read(table).schema
    planned.fieldNames.toSet shouldBe Set("k", "extra", "day")
    // pruned read over a selected partition plans fine too
    engine.readPartitions(table,
      _.columnValues.exists(_.value == "d3")).schema.fieldNames.toSet shouldBe
      Set("k", "extra", "day")
  }

  it should "footer-merge (and fail on corrupt footers) when the log has no schema — the control" in {
    val (engine, table) = newTable()
    // build the same mixed-schema layout by hand, with NO SetTableSchema ops
    val v1 = Version.generate()
    VersionedTables.writeDataVersioned(Seq((1L, "d1")).toDF("k", "day"), table, v1)
    engine.tracker.commit(table.name, TableUpdate(UserId("t"), "v1", java.time.Instant.now(),
      List(TableOperation.AddPartitionVersion(Partition("day", "d1"), v1))))
    val v2 = Version.generate()
    VersionedTables.writeDataVersioned(Seq((2L, "x", "d2")).toDF("k", "extra", "day"), table, v2)
    engine.tracker.commit(table.name, TableUpdate(UserId("t"), "v2", java.time.Instant.now(),
      List(TableOperation.AddPartitionVersion(Partition("day", "d2"), v2))))
    // sanity: the footer-merge path resolves the union while footers are intact
    engine.read(table).schema.fieldNames.toSet shouldBe Set("k", "extra", "day")
    corruptParquetFooters(table.location) should be > 0
    intercept[Exception] { engine.read(table).schema }
  }

  it should "verify guarded writes from the log — no sample footer read" in {
    val (engine, table) = newTable()
    Seq((1L, "d1")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "v1")
    Seq((2L, "x", "d2")).toDF("k", "extra", "day")
      .versionedInsertIntoEvolving(engine, table, UserId("t"), "v2")
    corruptParquetFooters(table.location) should be > 0
    // FRESH engine: no schemaShapeCache entry, so the guard must resolve the
    // existing shape — from the log, or it would die on the corrupt footers
    val engine2 = new VersionedTables(spark, engine.tracker)
    Seq((4L, "y", "d4")).toDF("k", "extra", "day")
      .versionedInsertInto(engine2, table, UserId("t"), "v3 union shape")
    engine2.tracker.currentVersion(table.name) match {
      case PartitionedTableVersion(pvs) => pvs.keySet.map(_.toPath) should contain("day=d4")
      case other => fail(s"unexpected $other")
    }
    // and drift still refuses: a non-additive shape fails against the
    // log-recorded union (k retyped)
    intercept[IllegalArgumentException] {
      Seq(("oops", "zz", "d5")).toDF("k", "extra", "day")
        .versionedInsertInto(engine2, table, UserId("t"), "drift")
    }
  }

  it should "survive the wire formats: file-store round trip of both new ops" in {
    val v = Version.generate()
    val base = Version.generate()
    val update = TableUpdate(UserId("u"), "m", java.time.Instant.now(),
      List(
        TableOperation.SetTableSchema("""{"type":"struct","fields":[]}"""),
        TableOperation.AddPartitionVersion(Partition("day", "d1"), v),
        TableOperation.SetVersionBase(Partition("day", "d1"), v, base)))
    val json = graft.sources.JsonCodecs.toJson(update)
    graft.sources.JsonCodecs.fromJson(json) shouldBe Right(update)
  }

  it should "not let a partial write regress the recorded schema" in {
    val (engine, table) = newTable()
    Seq((1L, "old", "d1")).toDF("k", "extra", "day")
      .versionedInsertInto(engine, table, UserId("t"), "v1 wide")
    val st = engine.tracker.tableState(table.name)
    // a slice-shaped (subset) frame on a partial write records NOTHING
    VersionedTables.schemaOpsFor(table, st,
      Seq((1L, "d1")).toDF("k", "day").schema) shouldBe Nil
    // but a whole-table write may reshape
    VersionedTables.schemaOpsFor(table, st,
      Seq((1L, "d1")).toDF("k", "day").schema, definesWholeTable = true).size shouldBe 1
  }

  it should "write to a long checkpointed history in O(tail) commit parses (headState-backed)" in {
    // a streaming sink's shape: many one-partition commits, fold checkpoint
    // in place — the per-write guard + schema-record decision must parse the
    // TAIL, never the history
    val dir = Files.createTempDirectory("graft-slog-write-").toFile
    val trackerA = new graft.sources.FileBackedVersionTracker(
      new java.io.File(dir, "store").toURI, spark.sparkContext.hadoopConfiguration,
      checkpointInterval = 8)
    val engine = new VersionedTables(spark, trackerA)
    val table = TableDefinition(TableName("slog", s"sink${seq.incrementAndGet()}"),
      new java.io.File(dir, "t").toURI, PartitionSchema("day"), FileFormat.Parquet,
      options = Map("mergeSchema" -> "true"))
    engine.initTable(table, UserId("t"), "init")
    (0 until 17).foreach { i =>
      Seq((i.toLong, f"d$i%03d")).toDF("k", "day")
        .versionedInsertInto(engine, table, UserId("t"), s"micro-batch $i")
    }
    // fresh tracker instance: its parse counter starts at zero
    val trackerB = new graft.sources.FileBackedVersionTracker(
      new java.io.File(dir, "store").toURI, spark.sparkContext.hadoopConfiguration,
      checkpointInterval = 8)
    val engineB = new VersionedTables(spark, trackerB)
    Seq((99L, "d099")).toDF("k", "day")
      .versionedInsertInto(engineB, table, UserId("t"), "micro-batch 99")
    // 19 commits total, last fold at 16 → guard + schema decision + commit
    // parse the <=3-commit tail (plus nothing else); a tableState-backed
    // write would have parsed all 19 (the pre-round-15 behavior)
    trackerB.commitFilesParsed.get() should be <= 6L
    engineB.read(table).count() shouldBe 18
    // and the written schema record / guard decisions are EXACT: a widened
    // write on top still records through the same bounded path
    Seq((100L, "x", "d100")).toDF("k", "extra", "day")
      .versionedInsertIntoEvolving(engineB, table, UserId("t"), "widen")
    val st = engineB.tracker.tableState(table.name)
    VersionedTables.parseSchemaJson(st.currentSchemaJson)
      .get.fieldNames.map(_.toLowerCase).toSet shouldBe Set("k", "extra", "day")
    engineB.read(table).count() shouldBe 19
  }
}

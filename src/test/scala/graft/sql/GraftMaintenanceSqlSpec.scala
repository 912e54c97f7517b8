package graft.sql

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables
import graft.operators.VersionedTables._

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The maintenance SQL verbs (parser extension): DESCRIBE HISTORY /
  * OPTIMIZE [ZORDER BY] / VACUUM RETAIN — statement recognition, exact
  * delegation of everything else, execution-time lookup, and the verbs'
  * effects (commit log rows, file-count collapse, z-order layout, version
  * reclaim). */
class GraftMaintenanceSqlSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def fixture(): (VersionedTables, TableDefinition, String) = {
    val (engine, table) = graft.StatsFixtures.rangeEvents(
      spark, "maint", s"events_${seq.incrementAndGet()}",
      Some(ColumnStatsConfig(List("id", "v"), bloomKeyColumns = Nil)))
    GraftTableRegistry.register(engine, table)
    (engine, table, s"graft.${table.name.fullyQualifiedName}")
  }

  private def dataFiles(engine: VersionedTables, table: TableDefinition): Long =
    engine.read(table).select(input_file_name()).distinct().count()

  behavior of "DESCRIBE HISTORY"

  it should "return the commit log newest-first with operation counts" in {
    val (engine, table, t) = fixture()
    spark.sql(s"DELETE FROM $t WHERE day = '2024-01-04'")
    val rows = spark.sql(s"DESCRIBE HISTORY $t").collect()
    rows should have size 3 // init, load, delete
    rows.map(_.getLong(0)).toSeq shouldBe Seq(3L, 2L, 1L)
    rows.head.getString(3) should include("SQL DELETE")
    rows.head.getInt(4) shouldBe 1 // one RemovePartition
    rows.last.getString(3) shouldBe "init"
    // newest-first timestamps are non-increasing
    val ts = rows.map(_.getTimestamp(5).getTime).toSeq
    ts shouldBe ts.sorted.reverse
    // DESC abbreviation parses too
    spark.sql(s"DESC HISTORY $t").count() shouldBe 3
  }

  it should "refuse unregistered tables at execution, naming the registry" in {
    val e = intercept[IllegalArgumentException] {
      spark.sql("DESCRIBE HISTORY graft.nosuch.table9").collect()
    }
    e.getMessage should include("not a registered graft table")
  }

  behavior of "DESCRIBE TABLE"

  it should "describe columns, the partition section, and EXTENDED detail" in {
    val (_, table, t) = fixture()
    val names = spark.sql(s"DESCRIBE $t").collect().map(_.getString(0))
    names should contain allOf ("id", "v", "cat", "day", "# Partition Information")
    val ext = spark.sql(s"DESCRIBE EXTENDED $t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    ext("Provider") shouldBe "parquet"
    ext("Location") shouldBe table.location.toString
    ext("Stats Columns") shouldBe "id, v"
    ext.keySet should contain("Head Commit")
  }

  behavior of "OPTIMIZE"

  it should "compact to one file per partition, preserving rows and history" in {
    val (engine, table, t) = fixture()
    dataFiles(engine, table) should be > 4L // range-split load: >1 file/partition
    val before = engine.read(table).orderBy("day", "id").collect()
    val out = spark.sql(s"OPTIMIZE $t").collect()
    out.head.getLong(0) shouldBe 4L // four partitions rewritten
    dataFiles(engine, table) shouldBe 4L
    engine.read(table).orderBy("day", "id").collect() shouldBe before
    engine.log(table.name).head.message should include("SQL OPTIMIZE")
  }

  it should "ZORDER BY multiple dimensions, preserving rows and tightening per-file boxes" in {
    val (engine, table, t) = fixture()
    val before = engine.read(table).orderBy("day", "id").collect()
    spark.sql(s"OPTIMIZE $t ZORDER BY (id, v)").collect()
    engine.read(table).orderBy("day", "id").collect() shouldBe before
    // the z-ordered layout: several files per partition, each covering a
    // strict sub-range of ids (a single compacted file would cover 0..399)
    val spans = engine.read(table)
      .groupBy(input_file_name().as("f"))
      .agg((max(col("id")) - min(col("id"))).as("span"))
      .select("span").collect().map(_.getLong(0))
    spans.length should be > 4
    spans.min should be < 399L
  }

  it should "scope OPTIMIZE to the WHERE-matching partitions only" in {
    val (engine, table, t) = fixture()
    val pre = engine.tracker.currentVersion(table.name)
      .asInstanceOf[PartitionedTableVersion].partitionVersions
    spark.sql(s"OPTIMIZE $t WHERE day = '2024-01-04'").collect()
    val post = engine.tracker.currentVersion(table.name)
      .asInstanceOf[PartitionedTableVersion].partitionVersions
    // untouched partitions keep their EXACT versions — the scoped-rewrite law
    List("2024-01-01", "2024-01-02", "2024-01-03").foreach { d =>
      post(Partition("day", d)) shouldBe pre(Partition("day", d))
    }
    post(Partition("day", "2024-01-04")) should not be pre(Partition("day", "2024-01-04"))
    // the selected partition collapsed to one file; rows unchanged
    engine.read(table).where(col("day") === "2024-01-04")
      .select(input_file_name()).distinct().count() shouldBe 1
    engine.read(table).count() shouldBe 1600

    // a WHERE matching nothing is a NO-OP: no write, no commit
    val head = engine.headCommit(table.name)
    spark.sql(s"OPTIMIZE $t WHERE day = 'no-such-day'").collect()
    engine.headCommit(table.name) shouldBe head

    // WHERE + ZORDER BY composes: only the selected partition rewrites
    spark.sql(s"OPTIMIZE $t WHERE day = '2024-01-03' ZORDER BY (id)").collect()
    val post2 = engine.tracker.currentVersion(table.name)
      .asInstanceOf[PartitionedTableVersion].partitionVersions
    post2(Partition("day", "2024-01-04")) shouldBe post(Partition("day", "2024-01-04"))
    post2(Partition("day", "2024-01-03")) should not be post(Partition("day", "2024-01-03"))
    engine.read(table).count() shouldBe 1600

    // non-partition columns refuse loudly, naming the partition columns
    intercept[Exception] {
      spark.sql(s"OPTIMIZE $t WHERE id = 5").collect()
    }.getMessage should include("partition columns")
  }

  behavior of "SHOW PARTITIONS"

  it should "list live partitions from the commit log, newest state, zero I/O" in {
    val (engine, table, t) = fixture()
    spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0)).sorted shouldBe
      Array("day=2024-01-01", "day=2024-01-02", "day=2024-01-03", "day=2024-01-04")
    // a DELETE that empties a partition drops it from the listing
    spark.sql(s"DELETE FROM $t WHERE day = '2024-01-02'")
    spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0)).sorted shouldBe
      Array("day=2024-01-01", "day=2024-01-03", "day=2024-01-04")
    // unregistered tables refuse with the registry named
    intercept[IllegalArgumentException] {
      spark.sql("SHOW PARTITIONS graft.nosuch.table11").collect()
    }.getMessage should include("not a registered graft table")
    // non-graft SHOW PARTITIONS delegates to the session parser untouched
    intercept[Exception] { spark.sql("SHOW PARTITIONS nodb.notable").collect() }
  }

  it should "refuse ZORDER BY on partition columns" in {
    val (_, _, t) = fixture()
    intercept[Exception] {
      spark.sql(s"OPTIMIZE $t ZORDER BY (day)").collect()
    }.getMessage should include("partition column")
  }

  behavior of "RESTORE TABLE"

  it should "roll back by commit id, tag and timestamp — metadata-only, re-restorable" in {
    val (engine, table, t) = fixture()
    val preDelete = engine.headCommit(table.name)
    val fullCount = engine.read(table).count()
    engine.tracker.createTag(table.name, "pre-delete", preDelete)
    spark.sql(s"DELETE FROM $t WHERE day = '2024-01-04'")
    val postDelete = engine.headCommit(table.name)
    val deletedCount = engine.read(table).count()
    deletedCount should be < fullCount

    // by commit id
    val r1 = spark.sql(s"RESTORE TABLE $t TO VERSION AS OF '${preDelete.id}'").head()
    r1.getString(0) shouldBe preDelete.id
    spark.sql(s"SELECT COUNT(*) FROM $t").head().getLong(0) shouldBe fullCount
    // forward again by TAG-FIRST resolution... roll to post-delete first
    spark.sql(s"RESTORE TABLE $t TO VERSION AS OF '${postDelete.id}'")
    spark.sql(s"SELECT COUNT(*) FROM $t").head().getLong(0) shouldBe deletedCount
    // by tag
    spark.sql(s"RESTORE TABLE $t TO VERSION AS OF 'pre-delete'").head()
      .getString(0) shouldBe preDelete.id
    spark.sql(s"SELECT COUNT(*) FROM $t").head().getLong(0) shouldBe fullCount
    // by timestamp: far future resolves to the latest commit — which, with
    // durable restore, is the restore commit just created (its state = the
    // pre-delete one)
    val headNow = engine.headCommit(table.name)
    spark.sql(s"RESTORE TABLE $t TO TIMESTAMP AS OF '2999-01-01'").head()
      .getString(0) shouldBe headNow.id
    spark.sql(s"SELECT COUNT(*) FROM $t").head().getLong(0) shouldBe fullCount
    // bad inputs are clean errors
    intercept[Exception] {
      spark.sql(s"RESTORE TABLE $t TO TIMESTAMP AS OF 'not-a-time'")
    }
    intercept[Exception] {
      spark.sql(s"RESTORE TABLE $t TO VERSION AS OF 'no-such-ref'")
    }
  }

  it should "survive writes AFTER the restore (durable rollback, not a ref move)" in {
    val (engine, table, t) = fixture()
    val preDelete = engine.headCommit(table.name)
    val fullCount = spark.sql(s"SELECT COUNT(*) FROM $t").head().getLong(0)
    // the bad DELETE...
    spark.sql(s"DELETE FROM $t WHERE day = '2024-01-04'")
    val day4 = fullCount - spark.sql(s"SELECT COUNT(*) FROM $t").head().getLong(0)
    day4 should be > 0L
    // ...undone by RESTORE, which commits the diff at the TIP of history
    val r = spark.sql(s"RESTORE TABLE $t TO VERSION AS OF '${preDelete.id}'").head()
    r.getString(0) shouldBe preDelete.id
    r.getString(1) should not be preDelete.id // a NEW commit carries the diff
    engine.headCommit(table.name).id shouldBe r.getString(1)
    // an UNRELATED insert after the restore must NOT re-apply the delete —
    // the exact failure mode of ref-move rollback (the next commit's full-
    // history fold replays the rolled-back operations)
    spark.sql(s"INSERT INTO $t VALUES (99991, 5.0, 'zz', '2024-01-09')")
    spark.sql(s"SELECT COUNT(*) FROM $t").head().getLong(0) shouldBe (fullCount + 1)
    spark.sql(s"SELECT COUNT(*) FROM $t WHERE day = '2024-01-04'")
      .head().getLong(0) shouldBe day4
    // and RESTORE is itself undoable: restore to the post-delete state
    val postRestoreInsert = engine.headCommit(table.name)
    spark.sql(s"RESTORE TABLE $t TO VERSION AS OF '${postRestoreInsert.id}'")
    spark.sql(s"SELECT COUNT(*) FROM $t").head().getLong(0) shouldBe (fullCount + 1)
  }

  behavior of "ALTER TABLE ADD COLUMNS"

  it should "widen declaratively: null-filled reads, aligned inserts, honest history, refusals" in {
    import graft.operators.VersionedTables._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-alter-")
    val engine = VersionedTables.withFileStore(spark, dir.resolve("store").toUri)
    val table = TableDefinition(TableName("maint", s"alter${seq.incrementAndGet()}"),
      dir.resolve("t").toUri, PartitionSchema("day"), FileFormat.Parquet,
      options = Map("mergeSchema" -> "true"))
    engine.initTable(table, UserId("t"), "init")
    GraftTableRegistry.register(engine, table)
    val t = s"graft.${table.name.fullyQualifiedName}"
    Seq((1L, "d1"), (2L, "d2")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "load")
    val preAlter = engine.headCommit(table.name)

    val out = spark.sql(s"ALTER TABLE $t ADD COLUMNS (score DOUBLE, note STRING)").collect()
    out.map(_.getString(0)).toSeq shouldBe Seq("score", "note")
    // metadata-only: the commit carries no partition ops, readers see the
    // new columns NULL-filled immediately
    val cur = spark.sql(s"SELECT * FROM $t")
    cur.columns.toSet shouldBe Set("k", "score", "note", "day")
    cur.count() shouldBe 2
    cur.filter("score IS NOT NULL OR note IS NOT NULL").count() shouldBe 0
    // writes under the widened shape land through the standard guard
    Seq((3L, 1.5, "x", "d3")).toDF("k", "score", "note", "day")
      .versionedInsertInto(engine, table, UserId("t"), "widened write")
    spark.sql(s"SELECT k FROM $t WHERE score = 1.5").head().getLong(0) shouldBe 3L
    // time travel to the pre-ALTER commit shows the old schema
    engine.readAt(table, preAlter).columns.toSet shouldBe Set("k", "day")
    // refusals: existing column, partition column, empty list
    intercept[Exception] { spark.sql(s"ALTER TABLE $t ADD COLUMNS (k INT)") }
    intercept[Exception] { spark.sql(s"ALTER TABLE $t ADD COLUMNS (day STRING)") }
    // non-mergeSchema tables refuse with the contract named
    val plain = TableDefinition(TableName("maint", s"plain${seq.incrementAndGet()}"),
      dir.resolve("p").toUri, PartitionSchema("day"), FileFormat.Parquet)
    engine.initTable(plain, UserId("t"), "init")
    GraftTableRegistry.register(engine, plain)
    val err = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.${plain.name.fullyQualifiedName} ADD COLUMNS (x INT)")
    }
    err.getMessage should include("mergeSchema")
  }

  it should "never let the FIRST write narrow an ALTERed schema record" in {
    import graft.operators.VersionedTables._
    import spark.implicits._
    import org.apache.spark.sql.types.StructType
    val dir = java.nio.file.Files.createTempDirectory("graft-alterfw-")
    val engine = VersionedTables.withFileStore(spark, dir.resolve("store").toUri)

    // SQL path: CREATE (declared) → ALTER ADD COLUMNS → INSERT with a
    // column list OMITTING the new column — ANSI semantics: it null-fills,
    // and the log record keeps the ALTERed column
    val table = TableDefinition(TableName("maint", s"alterfw${seq.incrementAndGet()}"),
      dir.resolve("t").toUri, PartitionSchema("day"), FileFormat.Parquet,
      options = Map("mergeSchema" -> "true"))
    engine.initTable(table, UserId("t"), "init")
    GraftTableRegistry.registerCreated(engine, table,
      StructType.fromDDL("k BIGINT, score DOUBLE, day STRING"))
    val t = s"graft.${table.name.fullyQualifiedName}"
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (note STRING)")
    spark.sql(s"INSERT INTO $t (k, score, day) SELECT 1L, 2.5D, 'd1'")
    val cur = spark.sql(s"SELECT * FROM $t")
    cur.columns.toSet shouldBe Set("k", "score", "day", "note")
    cur.filter("note IS NULL").count() shouldBe 1
    val recorded = graft.operators.VersionedTables.parseSchemaJson(
      engine.tracker.tableState(table.name).currentSchemaJson).get
    recorded.fieldNames.map(_.toLowerCase).toSet shouldBe Set("k", "score", "day", "note")

    // Scala-API path: a NARROW first write after ALTER keeps the record wide
    // (pre-fix it silently re-recorded its own narrower shape)
    val t2 = TableDefinition(TableName("maint", s"alterfw${seq.incrementAndGet()}"),
      dir.resolve("t2").toUri, PartitionSchema("day"), FileFormat.Parquet,
      options = Map("mergeSchema" -> "true"))
    engine.initTable(t2, UserId("t"), "init")
    GraftTableRegistry.registerCreated(engine, t2,
      StructType.fromDDL("k BIGINT, day STRING"))
    spark.sql(s"ALTER TABLE graft.${t2.name.fullyQualifiedName} ADD COLUMNS (note STRING)")
    Seq((1L, "d1")).toDF("k", "day")
      .versionedInsertInto(engine, t2, UserId("t"), "narrow first write")
    val rec2 = graft.operators.VersionedTables.parseSchemaJson(
      engine.tracker.tableState(t2.name).currentSchemaJson).get
    rec2.fieldNames.map(_.toLowerCase).toSet shouldBe Set("k", "day", "note")
    val read2 = engine.read(t2)
    read2.columns.toSet shouldBe Set("k", "day", "note")
    read2.filter("note IS NULL").count() shouldBe 1
  }

  behavior of "ANALYZE TABLE"

  it should "backfill manifests so pre-stats tables gain real file skipping" in {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-analyze-")
    val engine = VersionedTables.withFileStore(spark, dir.resolve("store").toUri)
    // written with NO stats config: zero manifests on disk
    val bare = TableDefinition(TableName("maint", s"analyze${seq.incrementAndGet()}"),
      dir.resolve("t").toUri, PartitionSchema("day"), FileFormat.Parquet)
    engine.initTable(bare, UserId("t"), "init")
    (0L until 1000L).map(k => (k, "d0")).toDF("k", "day")
      .repartitionByRange(4, col("k")) // 4 files, disjoint k-ranges
      .versionedInsertInto(engine, bare, UserId("t"), "pre-stats load")
    // no declared config refuses, naming the knob
    intercept[IllegalArgumentException] {
      graft.operators.TableStats.backfillManifests(engine, bare)
    }.getMessage should include("stats.columns")

    val statted = bare.copy(stats = Some(ColumnStatsConfig(List("k"))))
    GraftTableRegistry.register(engine, statted)
    val t = s"graft.${statted.name.fullyQualifiedName}"
    val written = spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS").collect()
    written should have size 1
    written.head.getInt(1) shouldBe 1 // one partition scanned for the one label
    // idempotent: manifests are immutable, nothing to write the second time
    spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS").collect() shouldBe empty

    // the backfilled manifest drives REAL pruning: corrupt every file whose
    // k-range the predicate excludes; the skipping read still answers
    // exactly, the unpruned read fails on the corrupt bytes
    val expected = (0L until 100L).toArray
    engine.readWhere(statted, col("k") < 100)
      .select("k").as[Long].collect().sorted shouldBe expected
    def walk(f: java.io.File): List[java.io.File] =
      if (f.isDirectory) f.listFiles().toList.flatMap(walk) else List(f)
    val dataFiles = walk(dir.resolve("t").toFile).filter(_.getName.endsWith(".parquet"))
    val spared = spark.read.parquet(dataFiles.map(_.getPath): _*)
      .withColumn("f", col("_metadata.file_path"))
      .filter(col("k") < 100).select("f").distinct()
      .collect().map(_.getString(0)).toSet
    val corrupted = dataFiles.filterNot(f => spared.exists(_.endsWith(f.getName)))
    corrupted should not be empty
    corrupted.foreach(f => java.nio.file.Files.write(f.toPath, Array.fill[Byte](32)(0x22)))
    engine.readWhere(statted, col("k") < 100)
      .select("k").as[Long].collect().sorted shouldBe expected
    // control must be an aggregate metadata CANNOT answer (SUM) — a plain
    // COUNT now collapses to the backfilled manifests via the
    // metadata-aggregate rule and never touches the corrupt bytes
    intercept[Exception] { engine.read(statted).agg(sum(col("k"))).collect() }
    // ...which is itself worth pinning: zero-IO COUNT over corrupt files
    engine.read(statted).count() shouldBe 1000L
  }

  behavior of "VACUUM"

  it should "require an explicit RETAIN clause" in {
    val (_, _, t) = fixture()
    intercept[IllegalArgumentException] {
      spark.sql(s"VACUUM $t")
    }.getMessage should include("RETAIN")
  }

  it should "report with DRY RUN, reclaim without, and keep the current read intact" in {
    val (engine, table, t) = fixture()
    spark.sql(s"OPTIMIZE $t").collect() // makes the load's versions expirable
    val dry = spark.sql(s"VACUUM $t RETAIN 1 VERSIONS DRY RUN").collect()
    dry.length should be > 0
    dry.foreach(_.getString(1) shouldBe "expirable")
    // nothing deleted yet
    engine.read(table).count() shouldBe 1600
    val real = spark.sql(s"VACUUM $t RETAIN 1 VERSIONS").collect()
    real.map(_.getString(0)).sorted shouldBe dry.map(_.getString(0)).sorted
    real.foreach(_.getString(1) shouldBe "deleted")
    engine.read(table).count() shouldBe 1600
    // the reclaimed version dirs are actually gone from disk
    real.foreach { r =>
      new java.io.File(new java.net.URI(r.getString(0))).exists() shouldBe false
    }
  }

  behavior of "delegation"

  it should "leave every non-graft statement to the session parser" in {
    spark.sql("SELECT 1 AS x").collect().head.getInt(0) shouldBe 1
    // a VACUUM not naming the graft catalog is NOT ours — vanilla Spark
    // raises its own parse/analysis error
    intercept[Exception] {
      spark.sql("VACUUM some.other.table RETAIN 1 VERSIONS")
    }
    // graft-catalog SELECTs keep resolving through the relation rule
    val (_, _, t) = fixture()
    spark.sql(s"SELECT COUNT(*) AS n FROM $t").head().getLong(0) shouldBe 1600
  }
}

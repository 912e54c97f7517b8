package graft.sql

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables

import java.io.File
import java.nio.file.Files
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The SQL write surface (GraftSqlWrites / GraftInsertCommand): INSERT INTO
  * appends to exactly the touched partitions, INSERT OVERWRITE replaces
  * (dynamic = touched partitions, static = whole table, static PARTITION
  * spec = that partition), every write goes through the commit protocol
  * (log entries, CAS, time travel, stats manifests), and the resolution
  * guard keeps the insert TARGET from ever being substituted with a read. */
class GraftSqlWritesSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Fresh registered table + a `src_<n>` temp view with (id, day, v). */
  private def fixture(): (VersionedTables, TableDefinition, String, String) = {
    val dir = Files.createTempDirectory("graft-sqlwrite-").toFile
    val n = seq.incrementAndGet()
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val table = TableDefinition(TableName("sqlw", s"t$n"),
      new File(dir, s"t$n").toURI, PartitionSchema("day"), FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    GraftTableRegistry.register(engine, table)
    spark.range(100).select(
        col("id"),
        concat(lit("d"), (col("id") % 2).cast("string")).as("day"),
        (col("id") * 2).cast("double").as("v"))
      .createOrReplaceTempView(s"src_$n")
    (engine, table, s"graft.${table.name.fullyQualifiedName}", s"src_$n")
  }

  private def rows(t: String): Seq[(Long, String, Double)] =
    spark.sql(s"SELECT id, day, v FROM $t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq.sorted

  behavior of "INSERT INTO (append)"

  it should "define the schema on first write and append on the second" in {
    val (engine, table, t, src) = fixture()
    spark.sql(s"INSERT INTO $t SELECT id, day, v FROM $src")
    rows(t) should have size 100

    // append a slice into the EXISTING d0 partition: old rows survive
    spark.sql(s"INSERT INTO $t SELECT id + 1000 AS id, v, day FROM $src WHERE day = 'd0'")
    val after = rows(t)
    after should have size 150
    after.count(_._1 < 1000) shouldBe 100

    // the untouched partition kept its version label (no rewrite)
    val pvs = engine.tracker.currentVersion(table.name)
      .asInstanceOf[PartitionedTableVersion].partitionVersions
    val log = engine.log(table.name)
    log.size shouldBe 3 // init + 2 inserts
  }

  it should "leave absent partitions' version labels untouched on append" in {
    val (engine, table, t, src) = fixture()
    spark.sql(s"INSERT INTO $t SELECT id, day, v FROM $src")
    def labelOf(day: String): String = engine.tracker.currentVersion(table.name)
      .asInstanceOf[PartitionedTableVersion].partitionVersions
      .collectFirst { case (p, v) if p.columnValues.exists(_.value == day) => v.label }.get
    val d1Before = labelOf("d1")
    spark.sql(s"INSERT INTO $t SELECT id + 1000, v, day FROM $src WHERE day = 'd0'")
    labelOf("d1") shouldBe d1Before
    labelOf("d0") should not be d1Before
  }

  it should "append the whole table to itself through the identity guard" in {
    val (_, _, t, src) = fixture()
    spark.sql(s"INSERT INTO $t SELECT id, day, v FROM $src")
    // source and target are the SAME graft relation: the guard must leave
    // the target unresolved-for-the-command while the source reads normally
    spark.sql(s"INSERT INTO $t SELECT * FROM $t")
    rows(t) should have size 200
  }

  behavior of "INSERT OVERWRITE"

  it should "replace exactly the touched partitions under dynamic overwrite mode" in {
    val (_, _, t, src) = fixture()
    spark.sql(s"INSERT INTO $t SELECT id, day, v FROM $src")
    // overwrite d0 with 10 rows; d1's 50 rows must survive
    spark.sql(
      s"INSERT OVERWRITE $t SELECT id, v, day FROM $src WHERE day = 'd0' AND id < 20")
    val after = rows(t)
    after.count(_._2 == "d0") shouldBe 10
    after.count(_._2 == "d1") shouldBe 50
  }

  it should "refuse static overwrite mode loudly instead of silently truncating" in {
    // the versioned write path itself requires dynamic partition-overwrite
    // mode — a static-mode INSERT OVERWRITE errors rather than guessing
    // between Spark's static truncate and the engine's partition semantics
    val (_, _, t, src) = fixture()
    spark.sql(s"INSERT INTO $t SELECT id, day, v FROM $src")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try
      intercept[Exception](spark.sql(
        s"INSERT OVERWRITE $t SELECT id, v, day FROM $src WHERE day = 'd0' AND id < 20"))
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    rows(t) should have size 100 // nothing changed
  }

  it should "pin a static PARTITION spec as a literal and replace that partition alone" in {
    val (_, _, t, src) = fixture()
    spark.sql(s"INSERT INTO $t SELECT id, day, v FROM $src")
    spark.sql(
      s"INSERT OVERWRITE $t PARTITION (day='d0') SELECT id, v FROM $src WHERE id >= 90")
    val after = rows(t)
    after.count(_._2 == "d0") shouldBe 10 // ids 90..99, all relabeled d0
    after.count(_._2 == "d1") shouldBe 50
    after.filter(_._2 == "d0").map(_._1).min shouldBe 90L
  }

  behavior of "column resolution"

  it should "cast positionally, align BY NAME, and honor an INSERT column list" in {
    val (_, _, t, src) = fixture()
    spark.sql(s"INSERT INTO $t SELECT id, day, v FROM $src")
    // positional with an int expression for the bigint id and int for v
    spark.sql(s"INSERT INTO $t VALUES (5000, 7, 'd0')")
    // BY NAME with shuffled column order
    spark.sql(s"INSERT INTO $t BY NAME SELECT 1.5D AS v, 'd1' AS day, 5001L AS id")
    // column list names the query's outputs positionally
    spark.sql(s"INSERT INTO $t (v, id, day) VALUES (2.5, 5002, 'd0')")
    val added = rows(t).filter(_._1 >= 5000)
    added.toSet shouldBe Set(
      (5000L, "d0", 7.0), (5001L, "d1", 1.5), (5002L, "d0", 2.5))
  }

  it should "refuse arity mismatches and unknown PARTITION columns loudly" in {
    val (_, _, t, src) = fixture()
    spark.sql(s"INSERT INTO $t SELECT id, day, v FROM $src")
    intercept[Exception](spark.sql(s"INSERT INTO $t SELECT id, day FROM $src"))
    intercept[Exception](
      spark.sql(s"INSERT OVERWRITE $t PARTITION (nope='x') SELECT id, v FROM $src"))
    rows(t) should have size 100 // nothing landed
  }

  behavior of "commit protocol integration"

  it should "write through the commit log with working time travel" in {
    val (engine, table, t, src) = fixture()
    spark.sql(s"INSERT INTO $t SELECT id, day, v FROM $src")
    val c1 = engine.headCommit(table.name)
    spark.sql(s"INSERT OVERWRITE $t SELECT id, v, day FROM $src WHERE id < 10")
    spark.sql(s"SELECT COUNT(*) AS n FROM $t").head().getLong(0) shouldBe 10L
    spark.sql(s"SELECT COUNT(*) AS n FROM $t VERSION AS OF '${c1.id}'")
      .head().getLong(0) shouldBe 100L
    engine.log(table.name).map(_.message).take(2) shouldBe Seq(
      s"SQL INSERT OVERWRITE ${table.name.fullyQualifiedName}",
      s"SQL INSERT INTO ${table.name.fullyQualifiedName}")
  }

  it should "raise CommitConflictError on a stale head and leave only reclaimable debris" in {
    val (engine, table, t, src) = fixture()
    spark.sql(s"INSERT INTO $t SELECT id, day, v FROM $src")
    val stale = engine.headCommit(table.name)
    spark.sql(s"INSERT INTO $t SELECT id + 1000, v, day FROM $src WHERE day = 'd0'")

    val entry = GraftTableRegistry.lookup("sqlw", table.name.name).get
    val conflict = intercept[CommitConflictError] {
      GraftSqlWrites.insert(spark, entry,
        spark.sql(s"SELECT id + 9000 AS id, v, day FROM $src"),
        Map.empty, Nil, overwrite = false, byName = false,
        expectedHead = Some(stale))
    }
    conflict.table shouldBe table.name
    // the conflict fires BEFORE any data file is written (the write path
    // verifies the head at stage time), so the table is untouched AND no
    // debris exists to vacuum
    rows(t) should have size 150
    engine.orphanedVersions(table) shouldBe empty
  }

  it should "not write on EXPLAIN" in {
    val (engine, table, t, src) = fixture()
    spark.sql(s"INSERT INTO $t SELECT id, day, v FROM $src")
    val before = engine.log(table.name).size
    spark.sql(s"EXPLAIN INSERT INTO $t SELECT id, v, day FROM $src").collect()
    engine.log(table.name).size shouldBe before
  }

  it should "collect stats manifests for SQL writes of stats-declaring tables" in {
    val dir = Files.createTempDirectory("graft-sqlwrite-stats-").toFile
    val n = seq.incrementAndGet()
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val table = TableDefinition(TableName("sqlw", s"t$n"),
      new File(dir, s"t$n").toURI, PartitionSchema("day"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("id"))))
    engine.initTable(table, UserId("t"), "init")
    GraftTableRegistry.register(engine, table)
    spark.range(50).select(col("id"), lit("d0").as("day"))
      .createOrReplaceTempView(s"src_$n")
    spark.sql(s"INSERT INTO graft.sqlw.t$n SELECT id, day FROM src_$n")
    // the metadata-aggregate rule answers from the manifest the SQL write
    // collected — one-row LocalRelation, no scan
    val agg = spark.sql(s"SELECT COUNT(*) AS c, MAX(id) AS m FROM graft.sqlw.t$n")
    agg.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    } should not be empty
    agg.head().toSeq shouldBe Seq(50L, 49L)
  }
}

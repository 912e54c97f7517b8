package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables._

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Additive schema evolution (versionedInsertIntoEvolving): new columns
  * join, old rows read NULL in them, pre-evolution commits time-travel
  * with the OLD schema, non-additive shapes refuse, and the mergeSchema
  * read-option contract is enforced at write time. */
class SchemaEvolutionSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def newTable(options: Map[String, String]): (VersionedTables, TableDefinition) = {
    val dir = Files.createTempDirectory("graft-evolve-").toFile
    val engine = VersionedTables.withFileStore(spark,
      new java.io.File(dir, "store").toURI)
    val table = TableDefinition(TableName("evo", s"t${seq.incrementAndGet()}"),
      new java.io.File(dir, "t").toURI, PartitionSchema("day"), FileFormat.Parquet,
      options = options)
    engine.initTable(table, UserId("t"), "init")
    (engine, table)
  }

  behavior of "versionedInsertIntoEvolving"

  it should "add columns additively: union schema, NULL for old rows, honest time travel" in {
    val (engine, table) = newTable(Map("mergeSchema" -> "true"))
    Seq((1L, "d1"), (2L, "d1"), (3L, "d2")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "v1 narrow")
    val preEvolution = engine.headCommit(table.name)
    Seq((10L, "x", "d3"), (11L, "y", "d3")).toDF("k", "extra", "day")
      .versionedInsertIntoEvolving(engine, table, UserId("t"), "v2 +extra")
    val cur = engine.read(table)
    cur.columns.toSet shouldBe Set("k", "extra", "day")
    cur.count() shouldBe 5
    cur.filter(col("extra").isNull).select("k").as[Long].collect().sorted shouldBe
      Array(1L, 2L, 3L) // old rows NULL in the new column
    cur.filter(col("extra") === "x").select("k").head().getLong(0) shouldBe 10L
    // pre-evolution time travel: the OLD schema, not a NULL-padded new one
    engine.readAt(table, preEvolution).columns.toSet shouldBe Set("k", "day")
    // writes into EXISTING partitions with the evolved schema keep working
    // (versionedInsertInto semantics: the touched partition is REPLACED)
    Seq((4L, "z", "d1")).toDF("k", "extra", "day")
      .versionedInsertIntoEvolving(engine, table, UserId("t"), "v3 into d1")
    val d1 = engine.read(table).filter(col("day") === "d1")
    d1.count() shouldBe 1
    d1.select("k", "extra").head() shouldBe org.apache.spark.sql.Row(4L, "z")
  }

  it should "compose with data skipping: stats on a column that arrives by evolution" in {
    val dir = Files.createTempDirectory("graft-evolve-skip-").toFile
    val engine = VersionedTables.withFileStore(spark,
      new java.io.File(dir, "store").toURI)
    // stats DECLARED on a column the first write does not carry yet
    val table = TableDefinition(TableName("evo", s"skip${seq.incrementAndGet()}"),
      new java.io.File(dir, "t").toURI, PartitionSchema("day"), FileFormat.Parquet,
      options = Map("mergeSchema" -> "true"),
      stats = Some(ColumnStatsConfig(List("k", "score"))))
    engine.initTable(table, UserId("t"), "init")
    (0L until 100L).map(k => (k, s"d${k % 2 + 1}")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "narrow")
    (100L until 200L).map(k => (k, k * 1.0, "d3")).toDF("k", "score", "day")
      .versionedInsertIntoEvolving(engine, table, UserId("t"), "evolved +score")
    // skipping on the evolved column must equal the plain filter: old files
    // have no score stats and must stay conservatively
    val expected = engine.read(table).filter(col("score") > 150.0)
      .select("k").as[Long].collect().sorted
    val skipped = engine.readWhere(table, col("score") > 150.0)
      .select("k").as[Long].collect().sorted
    skipped shouldBe expected
    expected.length shouldBe 49
    // and on the original column too (both file generations carry k stats)
    engine.readWhere(table, col("k") < 10).count() shouldBe
      engine.read(table).filter(col("k") < 10).count()
  }

  it should "let plain inserts carry the evolved (union) schema afterwards" in {
    // regression: the drift guard used to sample ONE partition — a narrow
    // one would flag a producer writing the table's CURRENT union schema
    val (engine, table) = newTable(Map("mergeSchema" -> "true"))
    Seq((1L, "d1")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "narrow")
    Seq((2L, "x", "d2")).toDF("k", "extra", "day")
      .versionedInsertIntoEvolving(engine, table, UserId("t"), "evolve")
    // steady-state producer on the evolved schema: PLAIN insert works now
    Seq((3L, "y", "d3")).toDF("k", "extra", "day")
      .versionedInsertInto(engine, table, UserId("t"), "steady state")
    engine.read(table).count() shouldBe 3
  }

  it should "not wipe evolved columns when a merge scoped to narrow partitions touches wide ones" in {
    // regression (review finding): the merge derived its output schema from
    // the PRUNED scope — an insert landing in an evolved partition would
    // rewrite it without the evolved column, silently erasing it
    import graft.operators.MergeApply._
    val (engine, table) = newTable(Map("mergeSchema" -> "true"))
    Seq((1L, "d1"), (2L, "d1")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "narrow d1")
    Seq((10L, 0.5, "d3"), (11L, 0.9, "d3")).toDF("k", "score", "day")
      .versionedInsertIntoEvolving(engine, table, UserId("t"), "wide d3")
    // source keys match ONLY d1 rows; the insert lands in d3
    val source = Seq((1L, "d1"), (500L, "d3")).toDF("k", "day")
    engine.mergeApply(table, source, Seq("day", "k"), UserId("t"), "cross-generation",
      matched = Seq(MatchedDelete(None)),
      notMatched = Seq(NotMatchedInsert(None, Map("k" -> col("k"), "day" -> col("day")))))
    val d3 = engine.read(table).filter(col("day") === "d3")
    d3.count() shouldBe 3
    // the evolved column SURVIVED the rewrite of d3
    d3.filter(col("score").isNotNull).select("k").as[Long].collect().sorted shouldBe
      Array(10L, 11L)
  }

  it should "evolve snapshot tables by merge without the mergeSchema option" in {
    // a snapshot merge rewrites the whole table as ONE uniform version —
    // mixed file schemas cannot occur, so the contract does not apply
    import graft.operators.MergeApply._
    val dir = Files.createTempDirectory("graft-evolve-snap-").toFile
    val engine = VersionedTables.withFileStore(spark,
      new java.io.File(dir, "store").toURI)
    val table = TableDefinition(TableName("evo", s"snap${seq.incrementAndGet()}"),
      new java.io.File(dir, "t").toURI, PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .versionedInsertInto(engine, table, UserId("t"), "v1")
    val source = Seq((1L, "a2", "hot")).toDF("k", "v", "tag")
    engine.mergeApply(table, source, Seq("k"), UserId("t"), "snap evolve",
      matched = Seq(MatchedUpdate(None, Map("v" -> col("s.v"), "tag" -> col("s.tag")))),
      evolveSchema = true)
    val cur = engine.read(table)
    cur.columns.toSet shouldBe Set("k", "v", "tag")
    cur.filter(col("k") === 1L).select("tag").head().getString(0) shouldBe "hot"
    cur.filter(col("k") === 2L).select("tag").head() shouldBe org.apache.spark.sql.Row(null)
  }

  it should "refuse evolution without the mergeSchema read option" in {
    val (engine, table) = newTable(Map.empty)
    Seq((1L, "d1")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "v1")
    val e = intercept[IllegalArgumentException] {
      Seq((2L, "x", "d2")).toDF("k", "extra", "day")
        .versionedInsertIntoEvolving(engine, table, UserId("t"), "v2")
    }
    e.getMessage should include("mergeSchema=true")
  }

  it should "refuse non-additive shapes: renames, type changes, dropped columns" in {
    val (engine, table) = newTable(Map("mergeSchema" -> "true"))
    Seq((1L, 1.5, "d1")).toDF("k", "v", "day")
      .versionedInsertInto(engine, table, UserId("t"), "v1")
    def refuses(df: org.apache.spark.sql.DataFrame): Unit = {
      intercept[IllegalArgumentException] {
        df.versionedInsertIntoEvolving(engine, table, UserId("t"), "bad")
      }.getMessage should include("ADDITIVE")
      ()
    }
    refuses(Seq((2L, 2.5, "d2")).toDF("k", "v2", "day"))            // rename
    refuses(Seq((2L, "s", "d2")).toDF("k", "v", "day"))             // type change
    refuses(Seq((2L, "d2")).toDF("k", "day"))                       // dropped column
  }

  it should "keep the plain insert guard, pointing at the evolving API" in {
    val (engine, table) = newTable(Map("mergeSchema" -> "true"))
    Seq((1L, "d1")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "v1")
    val e = intercept[IllegalArgumentException] {
      Seq((2L, "x", "d2")).toDF("k", "extra", "day")
        .versionedInsertInto(engine, table, UserId("t"), "v2")
    }
    e.getMessage should include("versionedInsertIntoEvolving")
  }

  it should "evolve under CAS: stale heads conflict instead of mixing schemas" in {
    val (engine, table) = newTable(Map("mergeSchema" -> "true"))
    Seq((1L, "d1")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "v1")
    val head = engine.headCommit(table.name)
    Seq((2L, "d2")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "concurrent")
    intercept[CommitConflictError] {
      Seq((3L, "x", "d3")).toDF("k", "extra", "day")
        .versionedInsertIntoEvolvingIf(engine, table, UserId("t"), "stale", head)
    }
    // rebased on the current head it lands
    Seq((3L, "x", "d3")).toDF("k", "extra", "day")
      .versionedInsertIntoEvolvingIf(engine, table, UserId("t"), "rebased",
        engine.headCommit(table.name))
    engine.read(table).columns.toSet shouldBe Set("k", "extra", "day")
  }
}

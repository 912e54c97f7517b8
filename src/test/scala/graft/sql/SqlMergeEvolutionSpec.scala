package graft.sql

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables
import graft.operators.VersionedTables._

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** `MERGE … WITH SCHEMA EVOLUTION` as SQL: the target substitutes EXTENDED
  * by the missing source columns as typed NULLs (that is what lets the
  * evolution assignments resolve against a v1 relation at all), and the
  * general merge persists the widened schema for real. */
class SqlMergeEvolutionSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def fixture(): (VersionedTables, TableDefinition, String, String) = {
    val n = seq.incrementAndGet()
    val dir = java.nio.file.Files.createTempDirectory(s"graft-sqlevo-$n-")
    val engine = VersionedTables.withFileStore(spark, dir.resolve("store").toUri)
    val table = TableDefinition(TableName("sqlevo", s"t$n"), dir.resolve("t").toUri,
      PartitionSchema("day"), FileFormat.Parquet, options = Map("mergeSchema" -> "true"))
    engine.initTable(table, UserId("t"), "init")
    GraftTableRegistry.register(engine, table)
    Seq((1L, "d1"), (2L, "d1"), (3L, "d2")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "narrow")
    val src = s"sqlevo_src_$n"
    Seq((1L, "d1", "hot"), (9L, "d2", "fresh")).toDF("k", "day", "tag")
      .createOrReplaceTempView(src)
    (engine, table, s"graft.${table.name.fullyQualifiedName}", src)
  }

  it should "evolve via explicit assignments: SET/INSERT the new column" in {
    val (engine, table, t, src) = fixture()
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $t AS tgt USING $src AS s
         |ON tgt.k = s.k AND tgt.day = s.day
         |WHEN MATCHED THEN UPDATE SET tag = s.tag
         |WHEN NOT MATCHED THEN INSERT (k, day, tag) VALUES (s.k, s.day, s.tag)""".stripMargin)
    val cur = engine.read(table)
    cur.columns.toSet shouldBe Set("k", "day", "tag")
    cur.count() shouldBe 4
    cur.filter(col("tag").isNotNull).select("k", "tag").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap shouldBe Map(1L -> "hot", 9L -> "fresh")
    cur.filter(col("tag").isNull).select("k").as[Long].collect().sorted shouldBe Array(2L, 3L)
  }

  it should "evolve via UPDATE SET * / INSERT * (the star expands over the widened schema)" in {
    val (engine, _, t, src) = fixture()
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $t AS tgt USING $src AS s
         |ON tgt.k = s.k AND tgt.day = s.day
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql(s"SELECT k, tag FROM $t ORDER BY k").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
    got shouldBe Array(1L -> Some("hot"), 2L -> None, 3L -> None, 9L -> Some("fresh"))
  }

  it should "convert when the SOURCE is itself a graft table" in {
    // regression (review finding): while the evolution merge waits for its
    // source to resolve, the generic substitution must not consume the
    // TARGET — with a graft source that deadlocked into Spark's
    // unsupported-MERGE planner error
    val (engine, _, t, _) = fixture()
    val n = seq.incrementAndGet()
    val dir = java.nio.file.Files.createTempDirectory(s"graft-sqlevo-src-$n-")
    val srcEngine = VersionedTables.withFileStore(spark, dir.resolve("store").toUri)
    val srcTable = TableDefinition(TableName("sqlevo", s"src$n"), dir.resolve("t").toUri,
      PartitionSchema("day"), FileFormat.Parquet)
    srcEngine.initTable(srcTable, UserId("t"), "init")
    GraftTableRegistry.register(srcEngine, srcTable)
    Seq((1L, "hot", "d1")).toDF("k", "tag", "day")
      .versionedInsertInto(srcEngine, srcTable, UserId("t"), "src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $t AS tgt
         |USING graft.${srcTable.name.fullyQualifiedName} AS s
         |ON tgt.k = s.k AND tgt.day = s.day
         |WHEN MATCHED THEN UPDATE SET tag = s.tag""".stripMargin)
    engine.read(fixtureTable(t)).filter(col("tag") === "hot").count() shouldBe 1
  }

  private def fixtureTable(t: String): TableDefinition = {
    val Array(_, s0, t0) = t.split("\\.")
    GraftTableRegistry.lookup(s0, t0).get.table
  }

  it should "still refuse evolution when the table lacks the mergeSchema option" in {
    val n = seq.incrementAndGet()
    val dir = java.nio.file.Files.createTempDirectory(s"graft-sqlevo-$n-")
    val engine = VersionedTables.withFileStore(spark, dir.resolve("store").toUri)
    val table = TableDefinition(TableName("sqlevo", s"t$n"), dir.resolve("t").toUri,
      PartitionSchema("day"), FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    GraftTableRegistry.register(engine, table)
    Seq((1L, "d1")).toDF("k", "day").versionedInsertInto(engine, table, UserId("t"), "v1")
    Seq((1L, "d1", "x")).toDF("k", "day", "tag").createOrReplaceTempView(s"sqlevo_src_$n")
    intercept[Exception] {
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO graft.${table.name.fullyQualifiedName} AS tgt
           |USING sqlevo_src_$n AS s ON tgt.k = s.k AND tgt.day = s.day
           |WHEN MATCHED THEN UPDATE SET tag = s.tag""".stripMargin)
    }.getMessage should include("mergeSchema=true")
  }

  it should "leave non-evolving MERGE semantics untouched: unknown columns refuse" in {
    val (_, _, t, src) = fixture()
    intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $t AS tgt USING $src AS s ON tgt.k = s.k AND tgt.day = s.day
           |WHEN MATCHED THEN UPDATE SET tag = s.tag""".stripMargin)
    }
  }
}

package graft.sql

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables
import graft.operators.VersionedTables._

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** SQL-native versioned-table access (`graft.<schema>.<table>`) incl. the
  * native VERSION AS OF / TIMESTAMP AS OF syntax, resolved through the
  * version tracker by the GraftExtensions resolution rule. */
class GraftSqlSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(): (VersionedTables, TableDefinition, CommitId, CommitId) = {
    val dir = Files.createTempDirectory("graft-sql-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val table = TableDefinition(TableName("sqltest", "accounts"),
      new File(dir, "accounts").toURI, PartitionSchema("region"), FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    Seq(("a1", "eu", 10L), ("a2", "us", 20L)).toDF("id", "region", "balance")
      .versionedInsertInto(engine, table, UserId("t"), "c1")
    val c1 = engine.headCommit(table.name)
    Seq(("a1", "eu", 11L), ("a3", "eu", 30L)).toDF("id", "region", "balance")
      .versionedInsertInto(engine, table, UserId("t"), "c2")
    val c2 = engine.headCommit(table.name)
    GraftTableRegistry.register(engine, table)
    (engine, table, c1, c2)
  }

  behavior of "SQL access to graft tables"

  it should "read the CURRENT version through plain SQL, tracking later commits" in {
    val (engine, table, _, _) = fixture()
    val sql = spark.sql("SELECT id, balance FROM graft.sqltest.accounts ORDER BY id")
      .as[(String, Long)].collect()
    sql shouldBe Array(("a1", 11L), ("a2", 20L), ("a3", 30L))
    // a NEW commit is visible to the NEXT sql() without re-registering —
    // resolution happens per query, unlike a temp view frozen at creation
    Seq(("a4", "ap", 40L)).toDF("id", "region", "balance")
      .versionedInsertInto(engine, table, UserId("t"), "c3")
    spark.sql("SELECT count(*) AS n FROM graft.sqltest.accounts")
      .head().getLong(0) shouldBe 4L
  }

  it should "time-travel with native VERSION AS OF through the tracker" in {
    val (engine, table, c1, c2) = fixture()
    spark.sql(
      s"SELECT id, balance FROM graft.sqltest.accounts VERSION AS OF '${c1.id}' ORDER BY id")
      .as[(String, Long)].collect() shouldBe Array(("a1", 10L), ("a2", 20L))
    spark.sql(
      s"SELECT id, balance FROM graft.sqltest.accounts VERSION AS OF '${c2.id}' ORDER BY id")
      .as[(String, Long)].collect() shouldBe Array(("a1", 11L), ("a2", 20L), ("a3", 30L))
    // semantics identical to the Scala API
    spark.sql(s"SELECT * FROM graft.sqltest.accounts VERSION AS OF '${c1.id}'")
      .collect().toSet shouldBe engine.readAt(table, c1).collect().toSet
  }

  it should "accept a TAG name in VERSION AS OF (the durable-pin SQL spelling)" in {
    val (engine, table, c1, _) = fixture()
    engine.tracker.createTag(table.name, "train_v1", c1)
    spark.sql(
      "SELECT id, balance FROM graft.sqltest.accounts VERSION AS OF 'train_v1' ORDER BY id")
      .as[(String, Long)].collect() shouldBe Array(("a1", 10L), ("a2", 20L))
    // an unknown ref still fails loudly as an unknown commit
    a[Throwable] should be thrownBy
      spark.sql("SELECT * FROM graft.sqltest.accounts VERSION AS OF 'no_such_ref'").collect()
  }

  it should "time-travel with native TIMESTAMP AS OF (last commit at or before)" in {
    val (engine, table, c1, _) = fixture()
    // strictly between c1 and c2 with a millisecond of margin: the SQL
    // timestamp literal round-trips at MICROsecond precision, so the raw
    // nano-precision commit instant would truncate to just BEFORE its own
    // commit and resolve the empty init state
    val ts = engine.log(table.name).find(_.id == c1).get.timestamp.plusMillis(1)
    spark.sql(
      s"SELECT id, balance FROM graft.sqltest.accounts TIMESTAMP AS OF '$ts' ORDER BY id")
      .as[(String, Long)].collect() shouldBe Array(("a1", 10L), ("a2", 20L))
    // and matches readAsOf exactly
    spark.sql(s"SELECT * FROM graft.sqltest.accounts TIMESTAMP AS OF '$ts'")
      .collect().toSet shouldBe engine.readAsOf(table, ts).collect().toSet
  }

  it should "support self-joins and predicates on partition columns" in {
    val (_, _, _, _) = fixture()
    // self-join: the substituted analyzed plans must deduplicate attributes
    val joined = spark.sql(
      """SELECT a.id, a.balance, b.balance AS other
        |FROM graft.sqltest.accounts a
        |JOIN graft.sqltest.accounts b ON a.id = b.id""".stripMargin)
    joined.count() shouldBe 3L
    // partition predicate reaches the scan as a partition filter
    val pruned = spark.sql(
      "SELECT id FROM graft.sqltest.accounts WHERE region = 'eu' ORDER BY id")
    pruned.as[String].collect() shouldBe Array("a1", "a3")
    val physical = pruned.queryExecution.executedPlan.toString
    physical should include("PartitionFilters")
  }

  it should "answer SHOW TABLES from the registry (the catalog owns the namespace)" in {
    fixture()
    val names = spark.sql("SHOW TABLES IN graft.sqltest")
      .select("tableName").as[String].collect()
    names should contain("accounts")
  }

  it should "fail cleanly on unregistered names and unknown commits" in {
    fixture()
    an[AnalysisException] should be thrownBy
      spark.sql("SELECT * FROM graft.sqltest.no_such_table").collect()
    a[Throwable] should be thrownBy
      spark.sql("SELECT * FROM graft.sqltest.accounts VERSION AS OF 'not-a-commit'").collect()
  }
}

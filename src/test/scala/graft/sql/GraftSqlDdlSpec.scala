package graft.sql

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** SQL DDL on the graft catalog: CREATE TABLE into a registered schema
  * (declared-schema-aligned first insert, partitioning, TBLPROPERTIES
  * stats config, IF NOT EXISTS), the full DDL→DML→query→time-travel loop,
  * and the refusal matrix (unregistered schema, transforms, CTAS, DROP). */
class GraftSqlDdlSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** A fresh schema opened for DDL, backed by its own engine + temp dir. */
  private def openSchema(): (VersionedTables, String, java.nio.file.Path) = {
    val n = seq.incrementAndGet()
    val dir = java.nio.file.Files.createTempDirectory(s"graft-ddl-$n-")
    val engine = VersionedTables.withFileStore(spark, dir.resolve("store").toUri)
    val schema = s"ddl$n"
    GraftTableRegistry.registerSchema(schema, engine, dir.resolve("tables").toUri)
    (engine, schema, dir)
  }

  behavior of "CREATE TABLE"

  it should "create a versioned table SQL-only and align the first INSERT to the declared schema" in {
    val (engine, schema, dir) = openSchema()
    spark.sql(
      s"""CREATE TABLE graft.$schema.accounts (
         |  id BIGINT, balance DOUBLE, region STRING
         |) PARTITIONED BY (region)""".stripMargin)
    // the init commit landed through the schema's engine
    val name = TableName(schema, "accounts")
    engine.log(name).head.message should include("SQL CREATE TABLE")
    // positional INSERT: the query's column NAMES differ — the declared
    // schema wins (x->id, y->balance, z->region), types cast
    spark.sql(
      s"""INSERT INTO graft.$schema.accounts
         |SELECT id AS x, CAST(id * 10 AS INT) AS y,
         |       CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END AS z
         |FROM RANGE(6)""".stripMargin)
    val got = spark.sql(s"SELECT * FROM graft.$schema.accounts")
    got.columns.toSeq shouldBe Seq("id", "balance", "region")
    got.schema("balance").dataType.typeName shouldBe "double"
    got.count() shouldBe 6
    // data landed under the schema's base location, value-partitioned
    new java.io.File(dir.resolve("tables").resolve("accounts").toFile, "region=eu")
      .exists() shouldBe true
  }

  it should "honor IF NOT EXISTS, TBLPROPERTIES stats config, and USING format" in {
    val (engine, schema, _) = openSchema()
    spark.sql(
      s"""CREATE TABLE graft.$schema.ev (id BIGINT, v DOUBLE, day STRING)
         |USING orc PARTITIONED BY (day)
         |TBLPROPERTIES (
         |  'stats.columns' = 'id,v', 'stats.bloomKeys' = 'id',
         |  'stats.bloomExpectedItems' = '5000')""".stripMargin)
    val entry = GraftTableRegistry.lookup(schema, "ev").get
    entry.table.format shouldBe FileFormat.Orc
    entry.table.stats shouldBe Some(ColumnStatsConfig(
      List("id", "v"), bloomKeyColumns = List("id"), bloomExpectedItems = 5000L))
    val commits = engine.log(TableName(schema, "ev")).size
    // IF NOT EXISTS: second statement is a no-op (no new commit)
    spark.sql(s"CREATE TABLE IF NOT EXISTS graft.$schema.ev (id BIGINT) ")
    engine.log(TableName(schema, "ev")).size shouldBe commits
    // plain CREATE on an existing table refuses through Spark's own check
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.$schema.ev (id BIGINT)")
    }
  }

  it should "support the full SQL lifecycle: DDL, every DML verb, maintenance, time travel" in {
    val (_, schema, _) = openSchema()
    val t = s"graft.$schema.facts"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE, day STRING) PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $t SELECT id, CAST(id AS DOUBLE), 'd1' FROM RANGE(10)")
    spark.sql(s"UPDATE $t SET v = v + 1000 WHERE k < 3")
    spark.sql(s"DELETE FROM $t WHERE k = 9")
    // the commit id of the first insert, via DESCRIBE HISTORY (seq 2)
    val firstInsert = spark.sql(s"DESCRIBE HISTORY $t")
      .filter(col("seq") === 2).head().getString(1)
    spark.sql(s"SELECT COUNT(*) AS n FROM $t").head().getLong(0) shouldBe 9
    spark.sql(s"SELECT SUM(v) AS s FROM $t WHERE k < 3").head().getDouble(0) shouldBe 3003.0
    spark.sql(s"SELECT COUNT(*) AS n FROM $t VERSION AS OF '$firstInsert'")
      .head().getLong(0) shouldBe 10
    // a general MERGE: bump the survivors' v where matched, insert the new
    // day, retire unmentioned d1 rows above a threshold
    spark.sql(s"SELECT CAST(id + 20 AS BIGINT) AS k, CAST(1.0 AS DOUBLE) AS v, 'd2' AS day FROM RANGE(3)")
      .createOrReplaceTempView(s"facts_delta_$schema")
    spark.sql(
      s"""MERGE INTO $t AS tgt USING facts_delta_$schema AS s ON tgt.k = s.k AND tgt.day = s.day
         |WHEN MATCHED THEN UPDATE SET v = tgt.v + s.v
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND tgt.k >= 7 THEN DELETE""".stripMargin)
    // d1 keeps k in [0,7) (8 was live, 7/8 deleted by the by-source clause;
    // 9 was already deleted), d2 gains 20..22
    spark.sql(s"SELECT COUNT(*) AS n FROM $t WHERE day = 'd1'").head().getLong(0) shouldBe 7
    spark.sql(s"SELECT COUNT(*) AS n FROM $t WHERE day = 'd2'").head().getLong(0) shouldBe 3
    spark.sql(s"OPTIMIZE $t").collect()
    spark.sql(s"DESCRIBE $t").collect().map(_.getString(0)) should contain("# Partition Information")
    // vacuum bounds history; the current read and the row count survive
    spark.sql(s"VACUUM $t RETAIN 1 VERSIONS").collect()
    spark.sql(s"SELECT COUNT(*) AS n FROM $t").head().getLong(0) shouldBe 10
  }

  behavior of "cross-process table adoption"

  it should "adopt a tracker-live table another process created: SELECT, DESCRIBE and DML all resolve" in {
    import graft.operators.VersionedTables._
    import spark.implicits._
    val (engine, schema, dir) = openSchema()
    // simulate "created by another process": the table exists in the SHARED
    // commit store + on disk, but was never registered in this JVM
    val table = TableDefinition(TableName(schema, "foreign"),
      dir.resolve("tables").resolve("foreign").toUri,
      PartitionSchema("day"), FileFormat.Parquet)
    engine.initTable(table, UserId("other"), "init elsewhere")
    Seq((1L, "d1"), (2L, "d2")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("other"), "load elsewhere")
    GraftTableRegistry.unregister(table.name) // ensure no registration leaked

    // pre-round-14 this was the half-visible state: CREATE refused the name
    // yet SELECT could not resolve it. Adoption reconstructs the definition
    // from the store on lookup miss.
    spark.sql(s"SELECT COUNT(*) AS n FROM graft.$schema.foreign")
      .head().getLong(0) shouldBe 2
    spark.sql(s"DESCRIBE graft.$schema.foreign")
      .collect().map(_.getString(0)) should contain("day")
    // DML through the adopted entry commits to the shared store
    spark.sql(s"DELETE FROM graft.$schema.foreign WHERE k = 1")
    engine.read(table).count() shouldBe 1
    // CREATE still refuses the live name (the guard that motivated adoption)
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.$schema.foreign (x INT)")
    }
  }

  behavior of "DDL refusals"

  it should "refuse CREATE in schemas never opened for DDL" in {
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.notopened.t1 (id BIGINT)")
    }.getMessage should include("no engine registered")
  }

  it should "refuse non-identity partition transforms and unknown formats" in {
    val (_, schema, _) = openSchema()
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.$schema.b (id BIGINT) PARTITIONED BY (bucket(4, id))")
    }.getMessage should include("identity")
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.$schema.a (id BIGINT) USING avro")
    }.getMessage should include("not supported")
  }

  it should "run CTAS as CREATE + versioned INSERT (two commits, one statement)" in {
    val (engine, schema, _) = openSchema()
    spark.sql(
      s"""CREATE TABLE graft.$schema.ctas PARTITIONED BY (r) AS
         |SELECT id AS k, CAST(id * 2 AS DOUBLE) AS v,
         |       CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS r
         |FROM RANGE(8)""".stripMargin)
    val got = spark.sql(s"SELECT * FROM graft.$schema.ctas")
    got.columns.toSeq shouldBe Seq("k", "v", "r")
    got.count() shouldBe 8
    engine.log(TableName(schema, "ctas")).map(_.message) shouldBe
      List(s"SQL INSERT INTO $schema.ctas", s"SQL CREATE TABLE graft.$schema.ctas")
    // IF NOT EXISTS no-ops on the existing table; plain CTAS refuses
    spark.sql(s"CREATE TABLE IF NOT EXISTS graft.$schema.ctas AS SELECT 1 AS x")
    spark.sql(s"SELECT COUNT(*) AS n FROM graft.$schema.ctas").head().getLong(0) shouldBe 8
    intercept[IllegalArgumentException] {
      spark.sql(s"CREATE TABLE graft.$schema.ctas AS SELECT 1 AS x")
    }.getMessage should include("already exists")
  }

  it should "refuse CTAS into unopened schemas (nothing created) and DROP TABLE always" in {
    val (engine, schema, _) = openSchema()
    intercept[UnsupportedOperationException] {
      spark.sql("CREATE TABLE graft.notopened.ctas2 AS SELECT 1 AS x")
    }.getMessage should include("no engine registered")
    GraftTableRegistry.lookup("notopened", "ctas2") shouldBe None
    spark.sql(s"CREATE TABLE graft.$schema.keep (id BIGINT)")
    intercept[Exception] {
      spark.sql(s"DROP TABLE graft.$schema.keep")
    }.getMessage should include("not supported")
  }
}

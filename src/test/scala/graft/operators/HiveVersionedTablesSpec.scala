package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables._
import graft.sources.{FileBackedVersionTracker, SparkHiveMetastore}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/**
 * Full-fidelity acceptance: versioned writes through the engine sync a REAL
 * Hive catalog (embedded Derby), and readers see versioned data transparently
 * through plain `spark.table(...)` — no engine code on the read path, the
 * reference's core design claim (docs/concepts.md:60-67). Mirrors
 * DatePartitionedTableSpec against Hive.
 */
class HiveVersionedTablesSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  it should "sync versioned writes to Hive and support metadata-only rollback" in {
    val root = Files.createTempDirectory("graft-hive-accept-")
    val loc = root.resolve("pageview").toUri.toString.stripSuffix("/")
    spark.sql("CREATE DATABASE IF NOT EXISTS hive_accept")
    spark.sql(
      s"""CREATE EXTERNAL TABLE hive_accept.pageview (id STRING, path STRING)
         |PARTITIONED BY (`date` STRING) STORED AS PARQUET LOCATION '$loc'""".stripMargin)

    val engine = new VersionedTables(spark,
      new FileBackedVersionTracker(root.resolve("store").toUri),
      new SparkHiveMetastore(spark))
    val table = TableDefinition(TableName("hive_accept", "pageview"),
      new java.net.URI(loc), PartitionSchema("date"), FileFormat.Parquet)
    engine.initTable(table, UserId("alice"), "init")

    val day1 = Seq(("u1", "/home", "2024-01-01"), ("u2", "/about", "2024-01-01"))
    val day2 = Seq(("u3", "/home", "2024-01-02"))
    (day1 ++ day2).toDF("id", "path", "date")
      .versionedInsertInto(engine, table, UserId("alice"), "days 1+2")

    // readers use PLAIN spark.table — versioning is invisible
    spark.table("hive_accept.pageview").count() shouldBe 3
    spark.table("hive_accept.pageview").where($"date" === "2024-01-01").count() shouldBe 2

    // reprocess day 1 without u2 — only that partition gets a new version
    Seq(("u1", "/home", "2024-01-01")).toDF("id", "path", "date")
      .versionedInsertInto(engine, table, UserId("alice"), "reprocess day 1")
    spark.table("hive_accept.pageview").count() shouldBe 2
    spark.table("hive_accept.pageview").where($"date" === "2024-01-01")
      .select("id").as[String].collect() shouldBe Array("u1")

    // engine path-read and catalog read agree
    engine.read(table).count() shouldBe 2

    // metadata-only rollback: spark.table immediately sees the old state
    val log = engine.log(table.name)
    log.map(_.message) shouldBe List("reprocess day 1", "days 1+2", "init")
    engine.checkout(table.name, log(1).id)
    spark.table("hive_accept.pageview").count() shouldBe 3
    spark.table("hive_accept.pageview").where($"date" === "2024-01-01").count() shouldBe 2

    // roll forward to head again
    engine.checkout(table.name, log(0).id)
    spark.table("hive_accept.pageview").count() shouldBe 2
  }

  it should "sync snapshot tables via table-location swap" in {
    val root = Files.createTempDirectory("graft-hive-snap-")
    val loc = root.resolve("users").toUri.toString.stripSuffix("/")
    spark.sql("CREATE DATABASE IF NOT EXISTS hive_accept")
    spark.sql(
      s"""CREATE EXTERNAL TABLE hive_accept.users_snap (id STRING, name STRING)
         |STORED AS PARQUET LOCATION '$loc'""".stripMargin)

    val engine = new VersionedTables(spark,
      new FileBackedVersionTracker(root.resolve("store").toUri),
      new SparkHiveMetastore(spark))
    val table = TableDefinition(TableName("hive_accept", "users_snap"),
      new java.net.URI(loc), PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(table, UserId("bob"), "init")

    Seq(("u1", "Alice"), ("u2", "Bob")).toDF("id", "name")
      .versionedInsertInto(engine, table, UserId("bob"), "v1")
    spark.table("hive_accept.users_snap").count() shouldBe 2

    Seq(("u1", "Alice"), ("u2", "Bob"), ("u3", "Carol")).toDF("id", "name")
      .versionedInsertInto(engine, table, UserId("bob"), "v2")
    spark.table("hive_accept.users_snap").count() shouldBe 3

    val log = engine.log(table.name)
    engine.checkout(table.name, log(1).id)
    spark.table("hive_accept.users_snap").count() shouldBe 2
  }

  it should "propagate additive evolution to Hive: plain spark.table sees the new column" in {
    val root = Files.createTempDirectory("graft-hive-evolve-")
    val loc = root.resolve("events").toUri.toString.stripSuffix("/")
    spark.sql("CREATE DATABASE IF NOT EXISTS hive_accept")
    spark.sql(
      s"""CREATE EXTERNAL TABLE hive_accept.events_evo (id STRING)
         |PARTITIONED BY (day STRING) STORED AS PARQUET LOCATION '$loc'""".stripMargin)

    val engine = new VersionedTables(spark,
      new FileBackedVersionTracker(root.resolve("store").toUri),
      new SparkHiveMetastore(spark))
    val table = TableDefinition(TableName("hive_accept", "events_evo"),
      new java.net.URI(loc), PartitionSchema("day"), FileFormat.Parquet,
      options = Map("mergeSchema" -> "true"))
    engine.initTable(table, UserId("carol"), "init")

    Seq(("e1", "d1"), ("e2", "d1")).toDF("id", "day")
      .versionedInsertInto(engine, table, UserId("carol"), "v1 narrow")
    spark.table("hive_accept.events_evo").columns.toSeq shouldBe Seq("id", "day")

    // the reference's core claim (docs/concepts.md:60-67) must hold under
    // evolution: committed data — INCLUDING evolved columns — visible via
    // plain spark.table, no engine code on the read path
    Seq(("e3", 42, "d2")).toDF("id", "score", "day")
      .versionedInsertIntoEvolving(engine, table, UserId("carol"), "v2 +score")

    val viaHive = spark.table("hive_accept.events_evo")
    viaHive.columns.toSet shouldBe Set("id", "score", "day")
    viaHive.count() shouldBe 3
    // new column null-fills on pre-evolution partitions, reads on new ones
    viaHive.where($"day" === "d1").select("score").collect().map(_.isNullAt(0)) shouldBe
      Array(true, true)
    viaHive.where($"day" === "d2").select("score").head().getInt(0) shouldBe 42
    // engine path-read agrees with the catalog read
    engine.read(table).count() shouldBe 3

    // steady-state writes after evolution don't re-ALTER (idempotent sync)
    Seq(("e4", 7, "d3")).toDF("id", "score", "day")
      .versionedInsertInto(engine, table, UserId("carol"), "v3 union shape")
    spark.table("hive_accept.events_evo").columns.toSet shouldBe Set("id", "score", "day")
    spark.table("hive_accept.events_evo").count() shouldBe 4
  }

  it should "sync BASE versions for DV'd partitions under spark.graft.dv.catalogSync=base" in {
    import graft.operators.DeleteVectors._
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft-hive-dvsync-")
    val loc = root.resolve("dvt").toUri.toString.stripSuffix("/")
    spark.sql("CREATE DATABASE IF NOT EXISTS hive_dvsync")
    spark.sql(
      s"""CREATE EXTERNAL TABLE hive_dvsync.dvt (id BIGINT, v DOUBLE)
         |PARTITIONED BY (`date` STRING) STORED AS PARQUET LOCATION '$loc'""".stripMargin)
    val engine = new VersionedTables(spark,
      new FileBackedVersionTracker(root.resolve("store").toUri),
      new SparkHiveMetastore(spark))
    val table = TableDefinition(TableName("hive_dvsync", "dvt"),
      new java.net.URI(loc), PartitionSchema("date"), FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    (0L until 100L).map(k => (k, k * 1.0, s"2024-01-0${k % 2 + 1}")).toDF("id", "v", "date")
      .versionedInsertInto(engine, table, UserId("t"), "load")
    spark.table("hive_dvsync.dvt").count() shouldBe 100

    // DEFAULT: the DV DML's catalog sync refuses loudly at the Hive seam
    // (the tracker commit itself lands — the catalog is derived state,
    // re-derivable by a later sync)
    intercept[IllegalArgumentException] {
      engine.deleteWhereDV(table, col("id") % 10 === 0, UserId("t"), "dv refused at sync")
    }.getMessage should include("deletion-vector")

    spark.conf.set("spark.graft.dv.catalogSync", "base")
    try {
      // catch-up sync under the opt-in: the catalog points at BASE versions
      engine.versioned.sync(table.name)
      spark.table("hive_dvsync.dvt").count() shouldBe 100 // pre-delete rows, by design
      engine.read(table).count() shouldBe 90              // the engine applies the DV
      // a further DV DML now syncs cleanly end-to-end
      engine.deleteWhereDV(table, col("id") === 1L, UserId("t"), "dv synced")
      spark.table("hive_dvsync.dvt").count() shouldBe 100
      engine.read(table).count() shouldBe 89
      // folding converges the external view to the true rows
      engine.compact(table, UserId("t"), "fold")
      spark.table("hive_dvsync.dvt").count() shouldBe 89
    } finally spark.conf.unset("spark.graft.dv.catalogSync")
  }
}

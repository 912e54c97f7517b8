package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.io.File
import java.nio.file.Files
import java.sql.{Date, Timestamp}

/** Null partition values land in Hive's `__HIVE_DEFAULT_PARTITION__`
  * directory; the engine must version and read that partition like any
  * other (reference semantics: partition values are untyped strings). */
class NullPartitionSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  it should "version and read back rows with a null partition value" in {
    val dir = Files.createTempDirectory("graft-nullpart-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val table = TableDefinition(TableName("test", "nullpart"),
      new File(dir, "data").toURI, PartitionSchema("date"), FileFormat.Parquet)
    engine.initTable(table, UserId("u"), "init")

    val rows = Seq(
      Pageview("a", "/", new Timestamp(0), Date.valueOf("2024-01-01")),
      Pageview("b", "/", new Timestamp(0), null))
    rows.toDS().versionedInsertInto(engine, table, UserId("u"), "with null date")

    val back = engine.read(table)
    back.count() shouldBe 2
    back.filter($"date".isNull).select("id").as[String].collect() shouldBe Array("b")
    back.filter($"date" === "2024-01-01").select("id").as[String].collect() shouldBe Array("a")

    // the null partition is tracked under the hive default-partition name
    engine.tracker.currentVersion(table.name) match {
      case PartitionedTableVersion(pvs) =>
        pvs.keySet.map(_.toPath) shouldBe Set("date=2024-01-01", "date=__HIVE_DEFAULT_PARTITION__")
      case other => fail(s"unexpected $other")
    }
  }

  it should "read adopted (pre-adoption, unversioned) data via the Unversioned sentinel" in {
    val dir = Files.createTempDirectory("graft-adopt-").toFile

    // snapshot table adopted in place: data already sits at the base path
    val snapLoc = new File(dir, "snap")
    Seq(("a", 1), ("b", 2)).toDF("k", "v").write.parquet(snapLoc.toString)
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val snap = TableDefinition(TableName("adopt", "snap"), snapLoc.toURI,
      PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(snap, UserId("u"), "init")
    engine.tracker.commit(snap.name, TableUpdate(UserId("u"), "adopt existing data",
      java.time.Instant.now(), List(TableOperation.AddTableVersion(Version.Unversioned))))
    engine.read(snap).count() shouldBe 2

    // partitioned table mixing an adopted partition with a versioned one
    val partLoc = new File(dir, "part")
    Seq(("a", "g1")).toDF("k", "grp").write.parquet(new File(partLoc, "grp=g1").toString)
    val part = TableDefinition(TableName("adopt", "part"), partLoc.toURI,
      PartitionSchema("grp"), FileFormat.Parquet)
    engine.initTable(part, UserId("u"), "init")
    engine.tracker.commit(part.name, TableUpdate(UserId("u"), "adopt g1",
      java.time.Instant.now(),
      List(TableOperation.AddPartitionVersion(Partition("grp", "g1"), Version.Unversioned))))
    Seq(("b", "g2")).toDF("k", "grp")
      .versionedInsertInto(engine, part, UserId("u"), "write g2")

    val back = engine.read(part)
    back.count() shouldBe 2
    back.select("k", "grp").as[(String, String)].collect().toSet shouldBe
      Set(("a", "g1"), ("b", "g2"))
  }

  it should "keep adoption-commit time travel correct after later versioned writes" in {
    val dir = Files.createTempDirectory("graft-adopt2-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)

    // snapshot: pre-adoption files at base, then a versioned write on top
    val snapLoc = new File(dir, "snap")
    Seq(("old", 1)).toDF("k", "v").write.parquet(snapLoc.toString)
    val snap = TableDefinition(TableName("adopt2", "snap"), snapLoc.toURI,
      PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(snap, UserId("u"), "init")
    engine.tracker.commit(snap.name, TableUpdate(UserId("u"), "adopt",
      java.time.Instant.now(), List(TableOperation.AddTableVersion(Version.Unversioned))))
    Seq(("new", 2), ("new2", 3)).toDF("k", "v")
      .versionedInsertInto(engine, snap, UserId("u"), "first versioned write")

    engine.read(snap).select("k").as[String].collect().toSet shouldBe Set("new", "new2")
    val adoptionCommit = engine.log(snap.name)(1).id
    // must see ONLY the pre-adoption root files, not the later _version dir
    engine.readAt(snap, adoptionCommit).select("k").as[String].collect() shouldBe Array("old")
    engine.readAt(snap, adoptionCommit).columns should not contain "_version"

    // partitioned: adopted partition later re-written at a version
    val partLoc = new File(dir, "part")
    Seq("pre").toDF("k").write.parquet(new File(partLoc, "grp=g1").toString)
    val part = TableDefinition(TableName("adopt2", "part"), partLoc.toURI,
      PartitionSchema("grp"), FileFormat.Parquet)
    engine.initTable(part, UserId("u"), "init")
    engine.tracker.commit(part.name, TableUpdate(UserId("u"), "adopt g1",
      java.time.Instant.now(),
      List(TableOperation.AddPartitionVersion(Partition("grp", "g1"), Version.Unversioned))))
    Seq(("post", "g1")).toDF("k", "grp")
      .versionedInsertInto(engine, part, UserId("u"), "rewrite g1")

    engine.read(part).select("k").as[String].collect() shouldBe Array("post")
    val adoptP = engine.log(part.name)(1).id
    engine.readAt(part, adoptP).select("k").as[String].collect() shouldBe Array("pre")
  }
}

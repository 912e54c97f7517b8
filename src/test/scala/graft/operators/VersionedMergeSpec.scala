package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables._
import graft.operators.VersionedMerge._

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.functions.col
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

case class Account(id: String, region: String, balance: Long)

/** MERGE INTO semantics + the partition-granular rewrite contract:
  * matched→update, unmatched→insert, deleteWhen→delete; untouched partitions
  * keep their version directories; emptied partitions leave the visible
  * table but stay on disk for time travel. */
class VersionedMergeSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newEngine(): (VersionedTables, File) = {
    val dir = Files.createTempDirectory("graft-merge-").toFile
    (VersionedTables.withFileStore(spark, new File(dir, "store").toURI), dir)
  }

  private def versionDirs(dir: File): List[String] = {
    val fs = Option(dir.listFiles()).getOrElse(Array.empty)
    fs.filter(_.isDirectory).map(_.getName).filter(_.startsWith("_version=")).toList.sorted
  }

  private def partitionedFixture(): (VersionedTables, TableDefinition, File) = {
    val (engine, dir) = newEngine()
    val loc = new File(dir, "accounts")
    val table = TableDefinition(TableName("test", "accounts"), loc.toURI,
      PartitionSchema("region"), FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    Seq(Account("a1", "eu", 10), Account("a2", "eu", 20),
      Account("a3", "us", 30), Account("a4", "ap", 40))
      .toDS().versionedInsertInto(engine, table, UserId("t"), "base")
    (engine, table, loc)
  }

  behavior of "mergeInto on partitioned tables"

  it should "update matched rows, insert unmatched, and leave untouched partitions' versions alone" in {
    val (engine, table, loc) = partitionedFixture()
    val source = Seq(Account("a1", "eu", 11), Account("a5", "eu", 50)).toDS().toDF()

    val r = engine.mergeInto(table, source, Seq("id"), UserId("t"), "upsert eu")

    engine.read(table).as[Account].collect() should contain theSameElementsAs Seq(
      Account("a1", "eu", 11), Account("a2", "eu", 20), Account("a5", "eu", 50),
      Account("a3", "us", 30), Account("a4", "ap", 40))
    // only region=eu was rewritten: it carries two version dirs, us/ap one
    r.rewritten.map(_.toPath) shouldBe List("region=eu")
    r.removed shouldBe Nil
    versionDirs(new File(loc, "region=eu")) should have size 2
    versionDirs(new File(loc, "region=us")) should have size 1
    versionDirs(new File(loc, "region=ap")) should have size 1
    // time travel: the pre-merge commit still shows the base data
    val log = engine.log(table.name)
    engine.readAt(table, log(1).id).as[Account].collect() should contain theSameElementsAs Seq(
      Account("a1", "eu", 10), Account("a2", "eu", 20),
      Account("a3", "us", 30), Account("a4", "ap", 40))
  }

  it should "move a row whose partition value changed and rewrite both partitions" in {
    val (engine, table, _) = partitionedFixture()
    // a3 migrates us -> eu; both partitions are touched, ap is not
    val r = engine.mergeInto(table, Seq(Account("a3", "eu", 31)).toDS().toDF(),
      Seq("id"), UserId("t"), "migrate a3")

    engine.read(table).as[Account].collect() should contain theSameElementsAs Seq(
      Account("a1", "eu", 10), Account("a2", "eu", 20), Account("a3", "eu", 31),
      Account("a4", "ap", 40))
    // us is EMPTIED by the move: dropped from the visible table
    r.rewritten.map(_.toPath).sorted shouldBe List("region=eu")
    r.removed.map(_.toPath) shouldBe List("region=us")
    engine.read(table).filter(col("region") === "us").count() shouldBe 0
    // ...but its data is still on disk for time travel
    val log = engine.log(table.name)
    engine.readAt(table, log(1).id).filter(col("region") === "us").as[Account]
      .collect() shouldBe Array(Account("a3", "us", 30))
  }

  it should "delete matched rows via deleteWhen and treat unmatched delete rows as no-ops" in {
    val (engine, table, _) = partitionedFixture()
    // balance < 0 marks a delete row; a9 matches nothing (SQL MERGE: no-op)
    val source = Seq(Account("a2", "eu", -1), Account("a9", "eu", -1),
      Account("a4", "ap", 41)).toDS().toDF()
    engine.mergeInto(table, source, Seq("id"), UserId("t"), "delete a2, bump a4",
      deleteWhen = Some(col("balance") < 0))

    engine.read(table).as[Account].collect() should contain theSameElementsAs Seq(
      Account("a1", "eu", 10), Account("a3", "us", 30), Account("a4", "ap", 41))
  }

  it should "treat a NULL deleteWhen predicate as UPDATE, not delete (SQL three-valued WHEN rule)" in {
    val (engine, table, _) = partitionedFixture()
    // a2's predicate is TRUE (delete); a4's is NULL — SQL MERGE's
    // `WHEN MATCHED AND pred THEN DELETE` fires only on TRUE, so a4 must
    // fall through to the update arm, never silently vanish
    val source = Seq(Account("a2", "eu", -1), Account("a4", "ap", 41)).toDS().toDF()
    val pred = org.apache.spark.sql.functions.when(
      col("id") === "a4", org.apache.spark.sql.functions.lit(null).cast("boolean"))
      .otherwise(col("balance") < 0)
    engine.mergeInto(table, source, Seq("id"), UserId("t"), "null pred",
      deleteWhen = Some(pred))

    engine.read(table).as[Account].collect() should contain theSameElementsAs Seq(
      Account("a1", "eu", 10), Account("a3", "us", 30), Account("a4", "ap", 41))
  }

  it should "act as a pure insert when merging into a never-written partitioned table" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "fresh"),
      new File(dir, "fresh").toURI, PartitionSchema("region"), FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    val r = engine.mergeInto(table,
      Seq(Account("a1", "eu", 1), Account("a2", "us", 2)).toDS().toDF(),
      Seq("id"), UserId("t"), "bootstrap merge")

    engine.read(table).as[Account].collect() should contain theSameElementsAs Seq(
      Account("a1", "eu", 1), Account("a2", "us", 2))
    r.rewritten.map(_.toPath).sorted shouldBe List("region=eu", "region=us")
  }

  it should "be a committed-state no-op when nothing matches and there is nothing to insert" in {
    val (engine, table, _) = partitionedFixture()
    val before = engine.headCommit(table.name)
    val r = engine.mergeInto(table, Seq.empty[Account].toDS().toDF(),
      Seq("id"), UserId("t"), "noop")
    r.changes shouldBe TableChanges.empty
    engine.headCommit(table.name) shouldBe before
    // delete-only source matching nothing is also a no-op
    val r2 = engine.mergeInto(table, Seq(Account("zz", "eu", -1)).toDS().toDF(),
      Seq("id"), UserId("t"), "noop2", deleteWhen = Some(col("balance") < 0))
    r2.changes shouldBe TableChanges.empty
    engine.headCommit(table.name) shouldBe before
  }

  it should "refuse duplicate source keys (ambiguous match, as in SQL MERGE)" in {
    val (engine, table, _) = partitionedFixture()
    val dup = Seq(Account("a1", "eu", 1), Account("a1", "eu", 2)).toDS().toDF()
    an[IllegalArgumentException] should be thrownBy
      engine.mergeInto(table, dup, Seq("id"), UserId("t"), "dup")
  }

  behavior of "mergeInto on snapshot tables"

  it should "rewrite the whole snapshot with update/insert/delete semantics" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "users_snap"),
      new File(dir, "users_snap").toURI, PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    Seq(User("u1", "Alice", "a@m"), User("u2", "Bob", "b@m"))
      .toDS().versionedInsertInto(engine, table, UserId("t"), "base")

    engine.mergeInto(table,
      Seq(User("u2", "Bob", "bob@new"), User("u3", "Carol", "c@m"),
        User("u1", "x", "DELETE")).toDS().toDF(),
      Seq("id"), UserId("t"), "merge", deleteWhen = Some(col("email") === "DELETE"))

    engine.read(table).as[User].collect() should contain theSameElementsAs Seq(
      User("u2", "Bob", "bob@new"), User("u3", "Carol", "c@m"))
    // pre-merge version still time-travelable
    val log = engine.log(table.name)
    engine.readAt(table, log(1).id).as[User].collect() should contain theSameElementsAs Seq(
      User("u1", "Alice", "a@m"), User("u2", "Bob", "b@m"))
  }

  it should "act as a pure insert when merging into a never-written snapshot table" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "snap_fresh"),
      new File(dir, "snap_fresh").toURI, PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    engine.mergeInto(table, Seq(User("u1", "A", "a@m")).toDS().toDF(),
      Seq("id"), UserId("t"), "bootstrap merge")
    engine.read(table).as[User].collect() shouldBe Array(User("u1", "A", "a@m"))
  }

  it should "refuse a merge that would empty a snapshot table" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "snap_empty"),
      new File(dir, "snap_empty").toURI, PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    Seq(User("u1", "A", "a@m")).toDS().versionedInsertInto(engine, table, UserId("t"), "base")
    an[IllegalArgumentException] should be thrownBy
      engine.mergeInto(table, Seq(User("u1", "A", "DELETE")).toDS().toDF(),
        Seq("id"), UserId("t"), "empty", deleteWhen = Some(col("email") === "DELETE"))
  }
}

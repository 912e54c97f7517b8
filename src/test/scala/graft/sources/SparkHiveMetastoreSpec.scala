package graft.sources

import graft.TestSpark
import graft.core._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** Contract laws from the reference's MetastoreSpec (core/src/test/.../
  * MetastoreSpec.scala:14-197) against the Hive/Derby-backed implementation,
  * plus end-to-end visibility through spark.table(). */
class SparkHiveMetastoreSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  lazy val metastore = new SparkHiveMetastore(spark)
  import spark.implicits._

  def freshDb(name: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $name")
  }

  "SparkHiveMetastore" should "raise UnknownTableError for untracked tables" in {
    an[UnknownTableError] should be thrownBy
      metastore.currentVersion(TableName("default", "does_not_exist"))
  }

  it should "apply a many-partition commit through batched ADD/DROP statements" in {
    freshDb("hive_batch")
    val loc = Files.createTempDirectory("batch-").toUri.toString.stripSuffix("/")
    spark.sql(
      s"""CREATE EXTERNAL TABLE hive_batch.readings (value DOUBLE)
         |PARTITIONED BY (day STRING) STORED AS PARQUET LOCATION '$loc'""".stripMargin)
    val t = TableName("hive_batch", "readings")

    // one commit adding 7 partitions -> ONE batched ADD statement
    val versions = (1 to 7).map(i => Partition("day", f"2024-01-$i%02d") -> Version.generate()).toMap
    metastore.update(t, Metastore.computeChanges(
      metastore.currentVersion(t), PartitionedTableVersion(versions)))
    metastore.currentVersion(t) shouldBe PartitionedTableVersion(versions)

    // one commit removing 4 of them -> ONE batched DROP statement
    val keep = versions.filter { case (p, _) => p.columnValues.head.value <= "2024-01-03" }
    metastore.update(t, Metastore.computeChanges(
      metastore.currentVersion(t), PartitionedTableVersion(keep)))
    metastore.currentVersion(t) shouldBe PartitionedTableVersion(keep)
  }

  it should "swap and revert snapshot table versions" in {
    freshDb("hive_test")
    val loc = Files.createTempDirectory("users-").toUri.toString.stripSuffix("/")
    spark.sql(
      s"""CREATE EXTERNAL TABLE hive_test.users (id STRING, name STRING)
         |STORED AS PARQUET LOCATION '$loc'""".stripMargin)
    val t = TableName("hive_test", "users")

    metastore.currentVersion(t) shouldBe SnapshotTableVersion(Version.Unversioned)

    val v1 = Version.generate(); val v2 = Version.generate()
    // write real data into both version dirs so reads work
    Seq(("u1", "Alice")).toDF("id", "name").write
      .parquet(s"$loc/_version=${v1.label}")
    Seq(("u1", "Alice"), ("u2", "Bob")).toDF("id", "name").write
      .parquet(s"$loc/_version=${v2.label}")

    metastore.update(t, Metastore.computeChanges(
      metastore.currentVersion(t), SnapshotTableVersion(v1)))
    metastore.currentVersion(t) shouldBe SnapshotTableVersion(v1)
    spark.table("hive_test.users").count() shouldBe 1

    metastore.update(t, Metastore.computeChanges(
      metastore.currentVersion(t), SnapshotTableVersion(v2)))
    metastore.currentVersion(t) shouldBe SnapshotTableVersion(v2)
    spark.table("hive_test.users").count() shouldBe 2

    // revert
    metastore.update(t, Metastore.computeChanges(
      metastore.currentVersion(t), SnapshotTableVersion(v1)))
    spark.table("hive_test.users").count() shouldBe 1
  }

  it should "add, update and remove partition versions with read visibility" in {
    freshDb("hive_test")
    val loc = Files.createTempDirectory("clicks-").toUri.toString.stripSuffix("/")
    spark.sql(
      s"""CREATE EXTERNAL TABLE hive_test.clicks (user_id STRING)
         |PARTITIONED BY (`date` STRING) STORED AS PARQUET LOCATION '$loc'""".stripMargin)
    val t = TableName("hive_test", "clicks")
    val day1 = Partition("date", "2024-01-01")

    metastore.currentVersion(t) shouldBe PartitionedTableVersion(Map.empty)

    val v1 = Version.generate(); val v2 = Version.generate()
    Seq("u1", "u2").toDF("user_id").write.parquet(s"$loc/date=2024-01-01/_version=${v1.label}")
    Seq("u1").toDF("user_id").write.parquet(s"$loc/date=2024-01-01/_version=${v2.label}")

    // add @v1
    metastore.update(t, Metastore.computeChanges(
      metastore.currentVersion(t), PartitionedTableVersion(Map(day1 -> v1))))
    metastore.currentVersion(t) shouldBe PartitionedTableVersion(Map(day1 -> v1))
    spark.table("hive_test.clicks").count() shouldBe 2

    // update @v2 (the reprocess)
    metastore.update(t, Metastore.computeChanges(
      metastore.currentVersion(t), PartitionedTableVersion(Map(day1 -> v2))))
    metastore.currentVersion(t) shouldBe PartitionedTableVersion(Map(day1 -> v2))
    spark.table("hive_test.clicks").count() shouldBe 1

    // remove
    metastore.update(t, Metastore.computeChanges(
      metastore.currentVersion(t), PartitionedTableVersion(Map.empty)))
    metastore.currentVersion(t) shouldBe PartitionedTableVersion(Map.empty)
    spark.table("hive_test.clicks").count() shouldBe 0
  }

  it should "leave state unchanged when applying an empty change list" in {
    freshDb("hive_test")
    val loc = Files.createTempDirectory("noop-").toUri.toString.stripSuffix("/")
    spark.sql(
      s"""CREATE EXTERNAL TABLE hive_test.noop_t (x STRING)
         |STORED AS PARQUET LOCATION '$loc'""".stripMargin)
    val t = TableName("hive_test", "noop_t")
    val before = metastore.currentVersion(t)
    metastore.update(t, TableChanges.empty)
    metastore.currentVersion(t) shouldBe before
  }
}

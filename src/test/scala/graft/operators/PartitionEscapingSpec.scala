package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.io.File
import java.nio.file.Files

/** Write-succeeds/read-fails was a data-dependent correctness trap: Spark's
  * writer Hive-escapes partition dir names (space stays raw, ':'→'%3A', …)
  * while the engine used to build raw URIs from `col=value`. These specs pin
  * the full round trip for every character class the escape set covers. */
class PartitionEscapingSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one value per character class: space (URI-illegal, not Hive-escaped),
  // colon/percent/hash/equals/slash/quote/backslash (Hive-escaped), unicode
  private val nastyValues = Seq(
    "two words", "12:30:00", "100%done", "q#1", "a=b", "x/y", "it's", "back\\slash", "caté"
  )

  it should "version, commit and read back partitions whose values need escaping" in {
    val dir = Files.createTempDirectory("graft-escape-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val table = TableDefinition(TableName("test", "escaped"),
      new File(dir, "data").toURI, PartitionSchema("tag"), FileFormat.Parquet)
    engine.initTable(table, UserId("u"), "init")

    val rows = nastyValues.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    rows.toDF("id", "tag").versionedInsertInto(engine, table, UserId("u"), "nasty tags")

    val back = engine.read(table)
    back.count() shouldBe nastyValues.size
    back.select("tag").as[String].collect().toSet shouldBe nastyValues.toSet

    // per-partition prune still works (exercises resolvePath → reader path)
    nastyValues.foreach { v =>
      val one = engine.readPartitions(table, _.columnValues.head.value == v)
      one.select("id").as[Long].collect().toList shouldBe List(nastyValues.indexOf(v).toLong)
    }
  }

  it should "survive a second write (fresh version) and rollback on escaped partitions" in {
    val dir = Files.createTempDirectory("graft-escape2-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val table = TableDefinition(TableName("test", "escaped2"),
      new File(dir, "data").toURI, PartitionSchema("tag"), FileFormat.Parquet)
    engine.initTable(table, UserId("u"), "init")

    Seq((1L, "a:b")).toDF("id", "tag").versionedInsertInto(engine, table, UserId("u"), "v1")
    val v1Commit = engine.log(table.name).head.id
    Seq((2L, "a:b")).toDF("id", "tag").versionedInsertInto(engine, table, UserId("u"), "v2")

    engine.read(table).select("id").as[Long].collect().toList shouldBe List(2L)
    engine.readAt(table, v1Commit).select("id").as[Long].collect().toList shouldBe List(1L)

    // the commit log round-trips the escaped partition through JSON
    val reopened = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    reopened.tracker.currentVersion(table.name) match {
      case PartitionedTableVersion(pvs) =>
        pvs.keySet.map(_.columnValues.head.value) shouldBe Set("a:b")
      case other => fail(s"unexpected $other")
    }
  }

  it should "collapse empty-string partition values into the hive default partition" in {
    val dir = Files.createTempDirectory("graft-escape3-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val table = TableDefinition(TableName("test", "emptyval"),
      new File(dir, "data").toURI, PartitionSchema("tag"), FileFormat.Parquet)
    engine.initTable(table, UserId("u"), "init")

    // Spark writes null AND "" to __HIVE_DEFAULT_PARTITION__; the tracked
    // partition set must reference dirs that actually exist
    Seq((1L, ""), (2L, null: String), (3L, "x"))
      .toDF("id", "tag").versionedInsertInto(engine, table, UserId("u"), "empties")

    engine.tracker.currentVersion(table.name) match {
      case PartitionedTableVersion(pvs) =>
        pvs.keySet.map(_.columnValues.head.value) shouldBe
          Set(PathCodec.DefaultPartitionName, "x")
      case other => fail(s"unexpected $other")
    }
    val back = engine.read(table)
    back.count() shouldBe 3
    back.filter($"tag".isNull).count() shouldBe 2 // "" and null both decode as null
  }
}

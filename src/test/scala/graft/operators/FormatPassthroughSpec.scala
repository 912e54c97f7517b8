package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.io.File
import java.nio.file.Files

/** CSV and JSON flow through the same versioned write/read path as Parquet/
  * ORC — the reference's format passthrough claim (README.md:79-83). */
class FormatPassthroughSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  def roundTrip(format: FileFormat, options: Map[String, String]): Unit = {
    val dir = Files.createTempDirectory(s"graft-fmt-${format.name}-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val table = TableDefinition(TableName("fmt", format.name),
      new File(dir, "data").toURI, PartitionSchema("grp"), format, options)
    engine.initTable(table, UserId("u"), "init")

    val v1 = Seq((1L, "a", "g1"), (2L, "b", "g1"), (3L, "c", "g2")).toDF("id", "name", "grp")
    v1.versionedInsertInto(engine, table, UserId("u"), "v1")
    engine.read(table).count() shouldBe 3

    // reprocess g1 smaller
    Seq((1L, "a", "g1")).toDF("id", "name", "grp")
      .versionedInsertInto(engine, table, UserId("u"), "v2")
    val after = engine.read(table)
    after.count() shouldBe 2
    after.select("name").as[String].collect().sorted shouldBe Array("a", "c")

    // rollback still works per-format
    val log = engine.log(table.name)
    engine.readAt(table, log(1).id).count() shouldBe 3
  }

  "versioned tables" should "support CSV with header+inferSchema options" in {
    roundTrip(FileFormat.Csv, Map("header" -> "true", "inferSchema" -> "true"))
  }

  it should "support JSON" in {
    roundTrip(FileFormat.Json, Map.empty)
  }
}

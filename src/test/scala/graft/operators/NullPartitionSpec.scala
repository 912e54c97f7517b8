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
}

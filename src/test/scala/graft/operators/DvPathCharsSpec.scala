package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables._
import graft.operators.DeleteVectors._
import java.nio.file.Files
import org.apache.spark.sql.functions.col
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * DV path handling for table locations carrying URI-reserved characters
 * (spaces, '%', '+'): `_metadata.file_path` renders URL-encoded where a
 * naive Hadoop `makeQualified(location).toString` does not — a mismatched
 * prefix would fail EVERY DV read of such a table via the loud
 * outside-the-root guard (round-15 advice). The root prefix must therefore
 * round-trip through the same encoder Spark's metadata column uses.
 */
class DvPathCharsSpec extends AnyFlatSpec with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def roundTrip(dirName: String): Unit = {
    val root = Files.createTempDirectory("graft-dvchars-")
    val loc = new java.io.File(root.toFile, dirName).toURI
    val engine = VersionedTables.withFileStore(spark,
      new java.io.File(root.toFile, "store").toURI)
    val table = TableDefinition(
      TableName("dvchars", "t" + math.abs(dirName.hashCode)),
      loc, PartitionSchema("day"), FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    (0L until 40L).map(k => (k, s"d${k % 2}")).toDF("k", "day")
      .versionedInsertInto(engine, table, UserId("t"), "load")
    val res = engine.deleteWhereDV(table, col("k") % 4 === 0L, UserId("t"), "dv")
    res.deletedRows shouldBe 10
    engine.read(table).count() shouldBe 30
    engine.read(table).filter(col("k") % 4 === 0L).count() shouldBe 0
    // stacking a second DV on the same partitions exercises the
    // DV-side normalizeDvPath of the carried entries too
    engine.deleteWhereDV(table, col("k") % 4 === 1L, UserId("t"), "dv2")
    engine.read(table).count() shouldBe 20
  }

  "merge-on-read DV" should "round-trip under a location with spaces" in {
    roundTrip("my table dir")
  }

  it should "round-trip under a location with percent and plus signs" in {
    roundTrip("t%20dir+x")
  }

  it should "round-trip under a location with unicode" in {
    roundTrip("täble-ü")
  }
}

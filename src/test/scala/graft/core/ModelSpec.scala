package graft.core

import java.net.URI
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class ModelSpec extends AnyFlatSpec with Matchers {

  "TableName.parse" should "accept schema.table" in {
    TableName.parse("chronicle.mytable") shouldBe Right(TableName("chronicle", "mytable"))
  }

  it should "reject malformed names" in {
    List("table", "a.b.c", "", ".", "a.", ".b", "a b.c").foreach { s =>
      TableName.parse(s).isLeft shouldBe true
    }
  }

  "Partition.parse" should "parse single and multi column paths" in {
    Partition.parse("date=2019-01-31") shouldBe Right(Partition("date", "2019-01-31"))
    Partition.parse("year=2019/month=01/day=31") shouldBe Right(
      Partition(
        ColumnValue(PartitionColumn("year"), "2019"),
        ColumnValue(PartitionColumn("month"), "01"),
        ColumnValue(PartitionColumn("day"), "31")))
  }

  it should "reject invalid partition strings" in {
    List("", "/", "invalid partition string", "date=", "=x", "Date=1").foreach { s =>
      Partition.parse(s).isLeft shouldBe true
    }
  }

  it should "round-trip toPath" in {
    val p = Partition(
      ColumnValue(PartitionColumn("year"), "2019"),
      ColumnValue(PartitionColumn("month"), "01"))
    Partition.parse(p.toPath) shouldBe Right(p)
  }

  "Partition.resolvePath" should "append the hive path under the table root" in {
    val root = new URI("file:/tmp/tables/t1")
    Partition("date", "2019-03-13").resolvePath(root) shouldBe new URI(
      "file:/tmp/tables/t1/date=2019-03-13/")
  }

  "PartitionColumn" should "reject invalid names" in {
    an[IllegalArgumentException] should be thrownBy PartitionColumn("Date")
    an[IllegalArgumentException] should be thrownBy PartitionColumn("1a")
    an[IllegalArgumentException] should be thrownBy PartitionColumn("")
  }

  "PartitionSchema.snapshot" should "be the empty schema" in {
    PartitionSchema.snapshot.isSnapshot shouldBe true
    PartitionSchema("date").isSnapshot shouldBe false
  }

  "TableVersion.empty" should "distinguish snapshot and partitioned" in {
    TableVersion.empty(isSnapshot = true) shouldBe SnapshotTableVersion(Version.Unversioned)
    TableVersion.empty(isSnapshot = false) shouldBe PartitionedTableVersion(Map.empty)
  }
}

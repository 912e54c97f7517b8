package graft.core

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** PathCodec must encode EXACTLY like Spark's dynamic-partition writer
  * (`ExternalCatalogUtils.escapePathName`), or engine-built partition paths
  * point at directories the writer never created. */
class PathCodecSpec extends AnyFlatSpec with Matchers {

  private val sparkEscape: String => String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
  private val sparkUnescape: String => String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName

  "escapePathName" should "match Spark's ExternalCatalogUtils for every ASCII char" in {
    (0 until 128).foreach { i =>
      val s = i.toChar.toString
      withClue(s"char $i: ") {
        PathCodec.escapePathName(s) shouldBe sparkEscape(s)
      }
    }
  }

  it should "match Spark's on generated strings (incl. unicode + escape-set chars)" in {
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.frequency(
      5 -> org.scalacheck.Gen.alphaNumChar,
      3 -> org.scalacheck.Gen.oneOf("\"#%'*/:=?\\{[]^ <>|\t\n".toList),
      1 -> org.scalacheck.Gen.oneOf('é', 'ü', '中', '☃')
    )).map(_.mkString)
    val seed = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed)(_.next).take(500).foreach { s =>
      gen.apply(org.scalacheck.Gen.Parameters.default, s).foreach { str =>
        PathCodec.escapePathName(str) shouldBe sparkEscape(str)
        PathCodec.unescapePathName(PathCodec.escapePathName(str)) shouldBe str
        PathCodec.unescapePathName(str) shouldBe sparkUnescape(str)
      }
    }
  }

  "Partition.parseEscaped" should "round-trip values containing '=', '/', ':' and spaces" in {
    val nasty = List("a=b", "x/y", "12:30:00", "two words", "100%", "q#1", "quote'v", "", "__HIVE_DEFAULT_PARTITION__")
    nasty.filter(_.nonEmpty).foreach { v =>
      val p = Partition("k", v)
      Partition.parseEscaped(p.toHivePath) shouldBe Right(p)
    }
    // multi-column
    val p = Partition(ColumnValue(PartitionColumn("a"), "v=1/2"), ColumnValue(PartitionColumn("b"), "w:x"))
    Partition.parseEscaped(p.toHivePath) shouldBe Right(p)
  }

  "Partition.resolvePath" should "produce a URI whose decoded path is the on-disk (escaped) dir" in {
    val root = new java.net.URI("file:/tmp/tbl/")
    val p = Partition("ts", "2024-01-01 12:30:00")
    val resolved = p.resolvePath(root)
    // ':' is Hive-escaped, space is URI-quoted but decodes back
    resolved.getPath shouldBe "/tmp/tbl/ts=2024-01-01 12%3A30%3A00/"
    // plain values are untouched (golden behavior from round 1)
    Partition("date", "2019-03-13").resolvePath(root) shouldBe
      new java.net.URI("file:/tmp/tbl/date=2019-03-13/")
  }
}

package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables._

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * Property hammer for the data-skipping law `readWhere ≡ read().filter`:
 * the three-valued SkipEval must NEVER change results for ANY predicate —
 * random trees of supported atoms (all comparisons incl. null-safe, In,
 * IsNull, StartsWith), unsupported atoms (arithmetic, abs), and random
 * And/Or/Not nesting, over a fixture deliberately stocked with the nasty
 * inputs: nulls, NaN, the null partition, supplementary-plane strings, and
 * literals inside, outside, and on the edges of every file's range.
 *
 * The battery in TableStatsSpec pins EXACT file counts for curated
 * predicates; this spec trades that precision for coverage — hundreds of
 * arbitrary predicates where only equivalence is asserted (pruning
 * effectiveness varies; correctness may not).
 */
class SkipEvalPropSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(): (VersionedTables, TableDefinition) = {
    val dir = Files.createTempDirectory("graft-skipprop-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val table = TableDefinition(TableName("test", "skipprop"),
      new File(dir, "skipprop").toURI, PartitionSchema("day"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("id", "d", "s"), bloomKeyColumns = List("id"))))
    engine.initTable(table, UserId("t"), "init")
    val rows: Seq[(Long, Option[Double], Option[String], Option[String])] =
      (0L until 600L).map { i =>
        val d =
          if (i % 13 == 0) None
          else if (i % 97 == 0) Some(Double.NaN)
          else Some(i * 0.5 - 20)
        val s =
          if (i % 17 == 0) None
          else if (i % 101 == 0) Some("𐀀") // U+10000
          else if (i % 53 == 0) Some("￿")
          else Some(s"w${i % 37}")
        val day =
          if (i % 41 == 0) None
          else Some(s"d${i % 3 + 1}")
        (i, d, s, day)
      }
    rows.toDF("id", "d", "s", "day")
      .repartitionByRange(5, col("id"))
      .versionedInsertInto(engine, table, UserId("t"), "load")
    (engine, table)
  }

  it should "equal read().filter for hundreds of random predicate trees" in {
    val (engine, table) = fixture()
    val plain = engine.read(table)
    val rnd = new scala.util.Random(20260815L)

    val longLits = Seq(-5L, 0L, 7L, 299L, 599L, 600L, 10000L)
    val dblLits = Seq(-21.0, -20.0, 0.0, 13.5, 279.5, 1e6)
    val strLits = Seq("a", "w1", "w9", "zz", "", "￿", "𐀀", "w")
    val dayLits = Seq("d1", "d2", "d3", "dx")

    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))

    def cmp(c: Column, l: Column): Column = rnd.nextInt(7) match {
      case 0 => c < l
      case 1 => c <= l
      case 2 => c > l
      case 3 => c >= l
      case 4 => c === l
      case 5 => c <=> l
      case 6 => c =!= l
    }

    def atom(): Column = rnd.nextInt(12) match {
      case 0 | 1 => cmp(col("id"), lit(pick(longLits)))
      case 2 | 3 => cmp(col("d"), lit(pick(dblLits)))
      case 4     => cmp(col("s"), lit(pick(strLits)))
      case 5     => cmp(col("day"), lit(pick(dayLits)))
      case 6     => col(pick(Seq("id", "d", "s", "day"))).isNull
      case 7     => col(pick(Seq("id", "d", "s", "day"))).isNotNull
      case 8     => col("id").isin(Seq.fill(1 + rnd.nextInt(3))(pick(longLits)): _*)
      case 9     => col("s").startsWith(pick(Seq("w", "w1", "z", "￿")))
      case 10    => (col("id") + 1) > lit(pick(longLits)) // unsupported atom
      case 11    => abs(col("d")) < lit(pick(dblLits))    // unsupported atom
    }

    def tree(depth: Int): Column =
      if (depth <= 0 || rnd.nextInt(3) == 0) atom()
      else rnd.nextInt(3) match {
        case 0 => tree(depth - 1) && tree(depth - 1)
        case 1 => tree(depth - 1) || tree(depth - 1)
        case 2 => !tree(depth - 1)
      }

    (1 to 200).foreach { i =>
      val pred = tree(2 + rnd.nextInt(2))
      withClue(s"case $i predicate [$pred]: ") {
        val expected = plain.filter(pred).select("id").as[Long].collect().sorted
        val got = engine.readWhere(table, pred).select("id").as[Long].collect().sorted
        got shouldBe expected
      }
    }
  }
}

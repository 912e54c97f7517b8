package graft.queries

import graft.TestSpark
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Sanity over the declared driver-contract surface + checks DuckDB can't
  * provide (sketch accuracy). */
class QueriesSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  "the query surface" should "declare an oracle or be a known rows-only query" in {
    val rowsOnly = Set(
      "q_dedup_minhash", "q_dedup_simhash",          // xxhash64 over STRINGS (no DuckDB xxhash64)
      "q_ann_ivf", "q_ann_ivf_index",                // sampled k-means (driver-side state)
      "q_agg_approx_distinct")                       // HLL sketch
    val declared = graft.SparkEntry.queries.keySet
    val oracled = graft.SparkEntry.oracleSql.keySet
    oracled.subsetOf(declared) shouldBe true
    (declared -- oracled) shouldBe rowsOnly
  }

  it should "produce rows for every declared query at sf0.001" in {
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      withClue(name) {
        assert(fn(spark, sf).count() > 0, s"$name returned no rows")
      }
    }
  }

  "approx_count_distinct" should "estimate within 5% of exact counts" in {
    import org.apache.spark.sql.functions._
    val approx = graft.SparkEntry.queries("q_agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")), countDistinct(col("l_partkey")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (flag, (eo, ep)) =>
      val (ao, ap) = approx(flag)
      math.abs(ao - eo).toDouble / eo should be < 0.05
      math.abs(ap - ep).toDouble / ep should be < 0.05
    }
  }

  "entry" should "return rows (driver t1 smoke)" in {
    graft.SparkEntry.entry(spark).count() should be > 0L
  }
}

package graft.queries

import graft.TestSpark
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Sanity over the declared driver-contract surface + checks DuckDB can't
  * provide (sketch accuracy). */
class QueriesSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  "the query surface" should "declare an oracle for EVERY query" in {
    // data-derived oracles (IVF centroid literals, SimHash token-hash
    // dictionary) appear only after their query has run in this JVM —
    // exactly how Verify dumps them
    val dataDerived = Set("q_ann_ivf", "q_ann_ivf_index", "q_ann_recall", "q_dedup_simhash",
      "q_embed_cluster", "q_semantic_dedup", "q_dsir_weight", "q_dsir_sample",
      "q_bm25_search", "q_bm25_index", "q_hybrid_search", "q_lm_perplexity",
      "q_nb_classify", "q_text_knn", "q_lm_bigram")
    val declared = graft.SparkEntry.queries.keySet
    graft.SparkEntry.oracleSql.keySet.subsetOf(declared) shouldBe true
    (declared -- graft.SparkEntry.oracleSql.keySet -- dataDerived) shouldBe empty

    graft.SparkEntry.queries("q_ann_ivf")(spark, sf).count() should be > 0L
    graft.SparkEntry.queries("q_dedup_simhash")(spark, sf).count() should be > 0L
    graft.SparkEntry.queries("q_dsir_weight")(spark, sf).count() should be > 0L
    graft.SparkEntry.queries("q_bm25_search")(spark, sf).count() should be > 0L
    graft.SparkEntry.queries("q_lm_perplexity")(spark, sf).count() should be > 0L
    graft.SparkEntry.queries("q_nb_classify")(spark, sf).count() should be > 0L
    graft.SparkEntry.queries("q_text_knn")(spark, sf).count() should be > 0L
    graft.SparkEntry.queries("q_lm_bigram")(spark, sf).count() should be > 0L
    val afterRun = graft.SparkEntry.oracleSql.keySet
    dataDerived.subsetOf(afterRun) shouldBe true
    (declared -- afterRun) shouldBe empty
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
    // the raw sketch vs a separately computed exact count (the underlying
    // accuracy fact the query's ok-flags compress)
    val approx = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.02),
        approx_count_distinct(col("l_partkey"), 0.02))
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
    // and the self-asserting query agrees: every bound flag is true
    val flags = graft.SparkEntry.queries("q_agg_approx_distinct")(spark, sf)
      .select("approx_orders_ok", "approx_parts_ok").collect()
    flags.length should be > 0
    flags.foreach { r =>
      r.getBoolean(0) shouldBe true
      r.getBoolean(1) shouldBe true
    }
  }

  "entry" should "return rows (driver t1 smoke)" in {
    graft.SparkEntry.entry(spark).count() should be > 0L
  }
}

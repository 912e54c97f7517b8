package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Timing probe for the repeated-window mining formulations (q_window_dedup):
 * interpreted HOF with per-element concat (the naive form), HOF with
 * slice+array_join, and the native fused [[graft.functions.WordShingles]]
 * kernel. Measured at sf0.1 (local[32]): 43s / 8s / ~1s for the full mine —
 * per-window interpreted lambda dispatch dominates everything else in the
 * query, which is why the kernel exists.
 */
object WindowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, d)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val n = 8
    val elems = (0 until n).map(k => s"_toks[i + $k - 1]").mkString(", ")
    val base = docs.withColumn("_toks", graft.functions.TextFunctions.tokens(col("text")))

    time("tokenize_only")(base.select(sum(size(col("_toks")))).head().getLong(0))

    val wins = base.withColumn("_wins",
      expr(s"""CASE WHEN size(_toks) < $n THEN array()
               ELSE transform(sequence(1, size(_toks) - ${n - 1}),
                              i -> concat_ws(' ', $elems)) END"""))
    time("windows_no_explode")(wins.select(sum(size(col("_wins")))).head().getLong(0))

    val exploded = wins.select(col("doc_id"), explode(col("_wins")).as("win_text"))
    time("exploded_count")(exploded.count())

    time("agg_no_distinct")(
      exploded.groupBy("win_text").agg(count(lit(1)).as("n_occ"), min("doc_id")).count())

    time("full_with_distinct")(
      exploded.groupBy("win_text")
        .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)), min("doc_id"))
        .filter(col("n_docs") >= 2).count())

    // variant: slice + array_join instead of 8 GetArrayItems
    val wins2 = base.withColumn("_wins",
      expr(s"""CASE WHEN size(_toks) < $n THEN array()
               ELSE transform(sequence(1, size(_toks) - ${n - 1}),
                              i -> array_join(slice(_toks, i, $n), ' ')) END"""))
    time("slice_variant_full")(
      wins2.select(col("doc_id"), explode(col("_wins")).as("win_text"))
        .groupBy("win_text")
        .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)), min("doc_id"))
        .filter(col("n_docs") >= 2).count())

    // native fused kernel (what CorpusTools.repeatedWindows used through
    // round 5: single countDistinct beside plain aggs — Spark's
    // single-distinct rewrite already plans this two-phase, NO Expand)
    time("native_kernel_full")(
      docs.select(col("doc_id"),
          explode(graft.functions.VectorExpressions.wordShingles(col("text"), n)).as("win_text"))
        .groupBy("win_text")
        .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)), min("doc_id"))
        .filter(col("n_docs") >= 2).count())

    // round-6 form: the same two phases written EXPLICITLY (collapse on
    // (window, doc), then per-window counts). Interleaved A/B reps below
    // separate form difference from run-to-run drift.
    def distinctForm(): Long =
      docs.select(col("doc_id"),
          explode(graft.functions.VectorExpressions.wordShingles(col("text"), n)).as("win_text"))
        .groupBy("win_text")
        .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)), min("doc_id"))
        .filter(col("n_docs") >= 2).count()
    def twoPhaseForm(): Long =
      graft.operators.CorpusTools.repeatedWindows(docs, "doc_id", "text", n).count()
    (1 to 3).foreach { rep =>
      time(s"ab_distinct_$rep")(distinctForm())
      time(s"ab_two_phase_$rep")(twoPhaseForm())
    }

    spark.stop()
  }
}

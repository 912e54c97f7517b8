package graft.examples

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/**
 * One-off probe backing the q_dedup_*_lsh oracle-equivalence argument: the
 * MinHash-LSH pair set (3-gram shingles, unblocked, exact verify) must equal
 * the word-set ngram ground-truth pair set (source-blocked) on the fixture,
 * at every SF the gate runs. Prints ONLY_LSH / ONLY_NGRAM diffs per SF.
 */
object PairEquivalenceProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- args.toSeq) {
      val docs = Tables.documents(spark, sf)
      val lsh = Dedup.minhashNearDupPairs(docs, threshold = 0.8)
        .select("id1", "id2")
      // exact ground truth of what minhash verifies: 3-gram shingle Jaccard,
      // UNblocked — quadratic, fine at probe scale
      val hs = docs.select(col("doc_id").as("id"),
        Dedup.shingleHashes(col("text"), 3).as("hs"))
        .withColumn("n", size(col("hs"))).localCheckpoint()
      val ngram = hs.as("a").join(hs.as("b"),
          col("a.id") < col("b.id") &&
            col("a.n") >= col("b.n") * 0.8 && col("b.n") >= col("a.n") * 0.8)
        .withColumn("inter",
          graft.functions.VectorExpressions.sortedIntersectSize(col("a.hs"), col("b.hs")).cast("double"))
        .filter(col("inter") / (col("a.n") + col("b.n") - col("inter")) >= 0.8)
        .select(col("a.id").as("id1"), col("b.id").as("id2"))
      val onlyLsh = lsh.except(ngram).count()
      val onlyNgram = ngram.except(lsh).count()
      println(s"SF=$sf LSH_PAIRS=${lsh.count()} NGRAM_PAIRS=${ngram.count()} " +
        s"ONLY_LSH=$onlyLsh ONLY_NGRAM=$onlyNgram")
    }
    spark.stop()
  }
}

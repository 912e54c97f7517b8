package graft.examples

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostics for the dedup operators: stage-by-stage timings +
  * candidate/bucket volumes at a given scale dir. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-18s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val hs = timed("shingle_hashes")(docs.select(col("doc_id").as("id"),
      Dedup.shingleHashes(col("text"), 3).as("hs")).localCheckpoint())

    val banded = hs.select(col("id"), posexplode(
      array((0 until 8).map { b =>
        xxhash64(lit(b) +: (0 until 2).map(r => Dedup.minhashFromHashes(col("hs"), b * 2 + r)): _*)
      }: _*)).as(Seq("band", "band_hash")))
    val stats = banded.groupBy("band", "band_hash").count()
    println("bucket stats: " + timed("bucket_stats")(
      stats.agg(max("count").as("max_bucket"),
        sum(col("count") * (col("count") - 1) / 2).as("cand_pairs")).head()))

    val pairs = timed("full_minhash")(Dedup.minhashNearDupPairs(docs).count())
    println(s"minhash pairs: $pairs")
    spark.stop()
  }
}

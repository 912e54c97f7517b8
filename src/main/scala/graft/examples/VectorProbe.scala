package graft.examples

import graft.functions.VectorExpressions
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev benchmark: codegen'd FloatVectorDot vs the interpreted HOF
  * formulation on an all-pairs cosine workload. */
object VectorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = graft.Tables.embeddings(spark, sfDir).limit(2000)
    val pairs = emb.select($"vec_id".as("id1"), $"embedding".as("e1"))
      .crossJoin(broadcast(emb.select($"vec_id".as("id2"), $"embedding".as("e2"))))

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-8s rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // warmup
    pairs.limit(1000).select(VectorExpressions.dotNative($"e1", $"e2")).count()
    timed("native")(pairs.select(VectorExpressions.dotNative($"e1", $"e2").as("d"))
      .filter($"d" > 1e9).count())
    timed("hof")(pairs.select(Similarity.dotHof($"e1", $"e2").as("d"))
      .filter($"d" > 1e9).count())
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time session costs (codegen warmup, FS init, parquet footer
    // caches) so per-query timings are attributable to the queries
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // stable alphabetical order: per-query numbers comparable across rounds
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable => System.err.println(s"BENCH FAILURE $name: $e"); false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
    val status = failed.mkString("[", ",", "]")
    // only successful queries count toward the total: a fast failure must not
    // read as a timing improvement across runs with different failure sets
    val total = results.collect { case (_, sec, true) => sec }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$status,"sf":"$sfDir"}""")
    spark.stop()
    // a failed query must read as a failure, not a timing improvement
    if (failed.nonEmpty) sys.exit(1)
  }
}

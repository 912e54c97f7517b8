/** Single-fixture bench probe: first-pass vs warm-rep timing (and the
  * recorded fixture phases) for a comma-separated query list — the local
  * feedback loop for fixture-build optimization without a full Bench run.
  * Usage: `tools/run.sh graft.examples.BenchOne <sfDir> <q1,q2,...>` */
package graft.examples

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val names = args(1).split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalogPlugin")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    Tables.prepare(spark)
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val first = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      val ph = graft.queries.PipelineQueries.fixturePhasesJson(spark, name).getOrElse("")
      println(f"ONE name=$name first=$first%.2f warm=$warm%.2f build=${first - warm}%.2f phases=$ph")
    }
    spark.stop()
  }
}

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
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobTimes = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = j.stageInfos.headOption.map(_.details.linesIterator
          .dropWhile(l => l.contains("org.apache.spark") || l.contains("java."))
          .take(1).mkString).getOrElse("")
        starts.put(j.jobId, (System.nanoTime(), site.take(90)))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, d) =>
          jobTimes.add((j.jobId, System.nanoTime() - t0, d)) }
      }
    })
    names.foreach { name =>
      jobs.set(0); jobTimes.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val first = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      val ph = graft.queries.PipelineQueries.fixturePhasesJson(spark, name).getOrElse("")
      println(f"ONE name=$name first=$first%.2f warm=$warm%.2f build=${first - warm}%.2f phases=$ph")
      if (sys.env.contains("BENCHONE_JOBS")) {
        import scala.jdk.CollectionConverters._
        val ts = jobTimes.asScala.toList.sortBy(_._1)
        println(s"JOBS total=${jobs.get()}")
        ts.foreach { case (id, ns, d) => println(f"  JOB $id%d ${ns / 1e9}%.2fs $d") }
      }
    }
    spark.stop()
  }
}

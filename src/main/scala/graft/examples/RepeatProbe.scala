package graft.examples

import org.apache.spark.sql.SparkSession

/**
 * Run one driver query N times in a single session and print per-rep
 * timings — separates one-time in-session fixture cost (rep 1: versioned
 * loads, index builds, oracle dictionaries) from the steady-state cost
 * (reps 2+), which is what a long-lived session or real deployment pays.
 *
 *   tools/run.sh graft.examples.RepeatProbe q_versioned_orc /root/testdata/sf0.1 3
 */
object RepeatProbe {
  def main(args: Array[String]): Unit = {
    val (query, sfDir, reps) = args match {
      case Array(q, d)    => (q, d, 3)
      case Array(q, d, n) => (q, d, n.toInt)
      case _ =>
        System.err.println("usage: graft.examples.RepeatProbe <query> <sfDir> [reps]")
        sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(query,
      sys.error(s"unknown query '$query'"))
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"REPEAT $query rep=$rep rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}

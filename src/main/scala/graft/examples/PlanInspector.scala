package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev tool: run one named SparkEntry query (or PROBE diagnostics) against a
  * scale dir, print timing and the formatted physical plan.
  * `sbt "runMain graft.examples.PlanInspector q_agg_group /root/testdata/sf0.01 [explain]"` */
object PlanInspector {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "time"
    // Hive-enabled with a temp-dir Derby metastore, same session shape as
    // Verify/Bench, so catalog-backed queries (q_hive_read) inspect too
    val tmp = java.nio.file.Files.createTempDirectory("graft-plan-hive-")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalogPlugin")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", tmp.resolve("warehouse").toString)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=${tmp.resolve("metastore_db")};create=true")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df =
      if (name == "entry") graft.SparkEntry.entry(spark)
      else graft.SparkEntry.queries(name)(spark, sfDir)
    if (mode.contains("explain")) df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"QUERY=$name ROWS=$n TIME=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** (steal, total) jiffies from the aggregate cpu line of /proc/stat.
    * Steal is field 8 (user nice system idle iowait irq softirq steal ...);
    * absent fields (non-Linux, container without the file) read as 0 so the
    * bench still runs — steal_pct then reports 0 and diagnoses nothing. */
  private def cpuStat(): (Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        (if (f.length > 7) f(7) else 0L, f.sum)
      } finally src.close()
    } catch { case _: Throwable => (0L, 0L) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Hive-enabled (embedded Derby metastore in a temp dir): q_hive_read
    // drives the plain-spark.table read over a versioned+synced table. The
    // one-time metastore spin-up lands in q_hive_read's first-pass time and
    // is split out by the fixture second rep below like the other fixtures.
    val hiveTmp = java.nio.file.Files.createTempDirectory("graft-bench-hive-")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", hiveTmp.resolve("warehouse").toString)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=${hiveTmp.resolve("metastore_db")};create=true")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time session costs (codegen warmup, FS init, parquet footer
    // caches) so per-query timings are attributable to the queries
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // ...including the embedded Derby metastore spin-up (~3s of the former
    // q_hive_read build_s was catalog init, not query work — round-7 watch
    // item): SHOW DATABASES forces the Hive client + Derby schema creation
    // here, once per JVM, so q_hive_read's build_s measures its own writes
    spark.sql("SHOW DATABASES").collect()

    // stable alphabetical order: per-query numbers comparable across rounds
    def runAll(s: SparkSession): Seq[(String, Double, Boolean)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(s, sfDir).count(); true }
          catch { case e: Throwable => System.err.println(s"BENCH FAILURE $name: $e"); false }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }

    /** One timed pass bracketed by /proc/stat reads → (results, steal%). */
    def attempt(s: SparkSession): (Seq[(String, Double, Boolean)], Double) = {
      graft.Tables.prepare(s)
      val (s0, t0) = cpuStat()
      val rs = runAll(s)
      val (s1, t1) = cpuStat()
      val pct = if (t1 > t0) 100.0 * (s1 - s0) / (t1 - t0) else 0.0
      (rs, pct)
    }

    // Host steal inflates every query uniformly 2-3x (round-4 forensics), so
    // the artifact records the steal measured DURING the run — and if it
    // exceeds the threshold, retries ONCE and keeps whichever attempt saw
    // less steal. Both attempts' steal figures are emitted so the driver's
    // JSON is self-diagnosing without BASELINE.md archaeology.
    // Threshold calibration: round 5 measured quiet-box runs at
    // 0.006-0.043% steal and a 0.625%-steal run 35% inflated, and set 0.3%.
    // Round 6 observed a 0.22%-steal run ALSO ~35% inflated (109s vs 80s
    // quiet) — the contended regime starts lower than first measured, so
    // the threshold is now 0.15%: still 3-10x above quiet noise, and a
    // spurious retry only costs time (the attempt with less steal is kept,
    // and both attempts' totals are recorded).
    val StealRetryThresholdPct = 0.15
    def okTotal(rs: Seq[(String, Double, Boolean)]): Double =
      rs.collect { case (_, sec, true) => sec }.sum
    val (first, firstSteal) = attempt(spark)
    val (results, stealPct, retried, attemptTotals, chosenSession) =
      if (firstSteal > StealRetryThresholdPct) {
        System.err.println(
          f"BENCH steal $firstSteal%.2f%% > $StealRetryThresholdPct%% during first pass — retrying once")
        // the retry runs on a FRESH SparkSession so the per-(session, dir)
        // fixture caches (IVF centroids, LSH index tables, oracle
        // dictionaries) rebuild — otherwise the warm second pass would
        // exclude fixture-build cost and a retried round would read as a
        // performance improvement against non-retried rounds. The JVM itself
        // is still warm (JIT, OS page cache), so a retried attempt is
        // systematically faster than a cold run — BOTH attempts' totals are
        // recorded below so cross-round comparisons can discount it.
        val s2 = spark.newSession()
        val (second, secondSteal) = attempt(s2)
        val totals = Seq(okTotal(first), okTotal(second))
        if (secondSteal < firstSteal) (second, secondSteal, true, totals, s2)
        else (first, firstSteal, true, totals, spark)
      } else (first, firstSteal, false, Seq(okTotal(first)), spark)

    // Fixture-carrying queries pay a one-time build (versioned table loads,
    // IVF/LSH index construction, z-order rewrite) memoized per (session,
    // sfDir). Their first-pass time above is build+read; a second rep on the
    // SAME session (caches warm) measures the steady-state read alone, so the
    // artifact separates the two instead of prose re-explaining the totals
    // every round. build_s is the first-pass excess over the warm read,
    // clamped at 0 (box noise can make the warm rep the slower one).
    val FixtureQueries = Seq(
      "q_ann_ivf_index", "q_bm25_index", "q_compact_read", "q_dedup_against_index",
      "q_hive_read", "q_versioned_csv", "q_versioned_json", "q_versioned_orc",
      "q_zorder_scan")
    val fixtureReads: Seq[(String, Double)] = FixtureQueries.flatMap { name =>
      SparkEntry.queries.get(name).flatMap { fn =>
        try {
          val t0 = System.nanoTime()
          fn(chosenSession, sfDir).count()
          Some(name -> (System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => None }
      }
    }
    val fixturesJson = fixtureReads.map { case (name, readS) =>
      val firstS = results.collectFirst { case (`name`, sec, true) => sec }.getOrElse(0.0)
      f""""$name":{"build_s":${math.max(0.0, firstS - readS)}%.3f,"read_s":$readS%.3f}"""
    }.mkString("{", ",", "}")

    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
    val status = failed.mkString("[", ",", "]")
    // only successful queries count toward the total: a fast failure must not
    // read as a timing improvement across runs with different failure sets
    val total = okTotal(results)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$status,""" +
      s""""steal_pct":$stealPct,"steal_retried":$retried,"first_attempt_steal_pct":$firstSteal,""" +
      s""""attempt_totals":${attemptTotals.mkString("[", ",", "]")},""" +
      s""""fixtures":$fixturesJson,""" +
      s""""sf":"$sfDir"}""")
    // Compact summary as the LAST stdout line: the driver's tail capture
    // truncates the ~100-entry per-query map mid-stream (BENCH_r05 parsed:
    // null), so the headline numbers ride a second line short enough that no
    // tail window can cut it.
    println(f"""{"total_s":$total%.3f,"n":${results.size},"n_failed":${failed.size},""" +
      f""""steal_pct":$stealPct%.4f,"steal_retried":$retried,""" +
      s""""attempt_totals":${attemptTotals.map(t => f"$t%.3f").mkString("[", ",", "]")},""" +
      s""""fixtures":$fixturesJson}""")
    spark.stop()
    // a failed query must read as a failure, not a timing improvement
    if (failed.nonEmpty) sys.exit(1)
  }
}

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

  /** Steal-independent contention probe (round 9): wall-time a fixed
    * single-threaded CPU-bound loop (2e8 iterations of the splitmix64
    * finalizer). Round-8 forensics: the driver's run was ~1.7x inflated at
    * steal 0.112% — below the 0.15% retry threshold — because cgroup
    * CPU-share contention is invisible to /proc/stat steal. It is NOT
    * invisible to this loop: whatever deschedules the executors also
    * deschedules the probe, inflating its wall time by the same mechanism.
    * A JIT warmup pass (1/10 size, untimed) runs first so the timed loop
    * measures steady-state compiled code. The quiet reference is measured
    * per session (see [[QuietProbeReps]]); `graft.examples.CalibProbe`
    * prints standalone readings. */
  private[graft] def calibrate(): Double = {
    def mix(iters: Long): Long = {
      var x = 0x9E3779B97F4A7C15L
      var i = 0L
      while (i < iters) {
        x += 0x9E3779B97F4A7C15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        x = z ^ (z >>> 31)
        i += 1
      }
      x
    }
    val warm = mix(20000000L)
    val t0 = System.nanoTime()
    val r = mix(200000000L)
    val dt = (System.nanoTime() - t0) / 1e9
    // consume the results so the JIT cannot dead-code the loops
    if (warm == 42L && r == 42L) System.err.println("calib sink")
    dt
  }

  /** Round-13 change: the quiet reference is MEASURED per session (median
    * of [[QuietProbeReps]] back-to-back [[calibrate]] runs before attempt
    * 1) instead of the former hard-coded 0.85 — BASELINE.md recorded the
    * idle probe drifting 0.80→1.05 through one afternoon, which made two
    * genuinely-quiet round-12 runs ship `contended=true` purely from
    * reference drift. The measured median is CAPPED at [[CalibQuietCapS]]:
    * a box that is ALREADY contended when the bench starts would otherwise
    * measure an inflated "quiet" reference and mask its own contention —
    * the cap is the highest idle reading ever observed on this hardware
    * (re-measure with `graft.examples.CalibProbe` if hardware changes). A
    * pass whose in-run probe exceeds the reference by
    * >[[CalibInflationRetry]] ran contended even if steal says otherwise. */
  private[graft] val QuietProbeReps = 5
  private[graft] val CalibQuietCapS = 1.05
  /** Round-11 tightening (was 1.2): BENCH_r10 shipped contended=false at a
    * +7% calib (0.912s, ratio 1.073) yet carried +28% total inflation — the
    * judge replay of the same binary measured 97.8s vs the artifact's 125.2s.
    * The probe under-responds relative to the query mix (single-threaded loop
    * vs 32-way shuffle stages), so the trigger must fire well below the
    * inflation it predicts. The verdict suggested ~1.08, but the known-bad
    * ratio is 1.073 — a 1.08 gate would STILL have passed it — so the gate is
    * 1.06: above every quiet-box observation (median span 0.830-0.860s is
    * ratio 0.98-1.01; worst quiet probe seen ~1.03) and below the known miss.
    * A spurious retry costs one extra pass; keep-better-attempt bounds the
    * damage. Thresholds documented in BASELINE.md. */
  private[graft] val CalibInflationRetry = 1.06

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
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalogPlugin")
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

    /** One timed pass bracketed by /proc/stat reads and by the CPU-bound
      * calibration probe → (results, steal%, max of pre/post calib seconds).
      * The max (not mean) of the two probes is the contention figure: a pass
      * that STARTED quiet and got contended mid-run is still contended. */
    def attempt(s: SparkSession): (Seq[(String, Double, Boolean)], Double, Double) = {
      graft.Tables.prepare(s)
      val c0 = calibrate()
      val (s0, t0) = cpuStat()
      val rs = runAll(s)
      val (s1, t1) = cpuStat()
      val c1 = calibrate()
      val pct = if (t1 > t0) 100.0 * (s1 - s0) / (t1 - t0) else 0.0
      (rs, pct, math.max(c0, c1))
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
    // Round 9: retry also fires on the steal-INDEPENDENT probe — round 8's
    // driver run was ~1.7x inflated at steal 0.112% (under the threshold;
    // cgroup CPU-share contention is invisible to /proc/stat steal), so
    // steal alone no longer gates the retry. When both attempts ran, keep
    // the one with the smaller calibration time (the probe measures the
    // same mechanism that inflates the queries); fall back to steal only
    // when the probes are within noise of each other (5%).
    // per-session quiet reference: median of N idle probe reps before any
    // attempt, capped so a box that starts contended cannot mask itself
    val quietReps = Seq.fill(QuietProbeReps)(calibrate())
    val calibQuietMeasured = quietReps.sorted.apply(QuietProbeReps / 2)
    val calibQuietUsed = math.min(calibQuietMeasured, CalibQuietCapS)
    System.err.println(
      f"BENCH quiet probe: median $calibQuietMeasured%.3fs over $QuietProbeReps reps " +
        f"(using $calibQuietUsed%.3fs)")
    def contended(steal: Double, calib: Double): Boolean =
      steal > StealRetryThresholdPct || calib > calibQuietUsed * CalibInflationRetry
    val (first, firstSteal, firstCalib) = attempt(spark)
    val (results, stealPct, calibS, retried, attemptTotals, attemptCalibs, chosenSession,
        otherResults) =
      if (contended(firstSteal, firstCalib)) {
        System.err.println(
          f"BENCH contended first pass (steal $firstSteal%.3f%%, calib $firstCalib%.3fs vs quiet $calibQuietUsed%.3fs) — retrying once")
        // the retry runs on a FRESH SparkSession so the per-(session, dir)
        // fixture caches (IVF centroids, LSH index tables, oracle
        // dictionaries) rebuild — otherwise the warm second pass would
        // exclude fixture-build cost and a retried round would read as a
        // performance improvement against non-retried rounds. The JVM itself
        // is still warm (JIT, OS page cache), so a retried attempt is
        // systematically faster than a cold run — BOTH attempts' totals are
        // recorded below so cross-round comparisons can discount it.
        val s2 = spark.newSession()
        val (second, secondSteal, secondCalib) = attempt(s2)
        val totals = Seq(okTotal(first), okTotal(second))
        val calibs = Seq(firstCalib, secondCalib)
        // Round-11 rule for the BOTH-ATTEMPTS-CONTENDED regime (observed
        // twice tonight: probes within noise, steals both over threshold,
        // totals 10-25% apart): the artifact ships contended=true either
        // way, so comparability is already forfeit — keep the smaller
        // total as the tighter upper bound on the quiet number (warm-JVM
        // bias ~5-10% is smaller than the contention it avoids; both
        // totals remain in attempt_totals for discounting). With at least
        // one clean attempt the round-9 rule stands: the less-contended
        // probe wins, steal breaking calib ties.
        // Totals are only comparable over the SAME query set: a fast
        // failure shrinks okTotal, so comparing raw okTotals would let a
        // failing attempt win as the "smaller total" (and ship a broken
        // round as the better number). Fewer failures wins outright;
        // equal-failure attempts compare over their common OK queries.
        def failures(rs: Seq[(String, Double, Boolean)]): Int = rs.count(!_._3)
        def commonOkTotal(rs: Seq[(String, Double, Boolean)],
            other: Seq[(String, Double, Boolean)]): Double = {
          val okOther = other.collect { case (n, _, true) => n }.toSet
          rs.collect { case (n, t, true) if okOther(n) => t }.sum
        }
        val keepSecond =
          if (contended(firstSteal, firstCalib) && contended(secondSteal, secondCalib))
            if (failures(second) != failures(first)) failures(second) < failures(first)
            else commonOkTotal(second, first) < commonOkTotal(first, second)
          else if (math.abs(secondCalib - firstCalib) > 0.05 * math.max(firstCalib, secondCalib))
            secondCalib < firstCalib
          else secondSteal < firstSteal
        if (keepSecond) (second, secondSteal, secondCalib, true, totals, calibs, s2, first)
        else (first, firstSteal, firstCalib, true, totals, calibs, spark, second)
      } else (first, firstSteal, firstCalib, false, Seq(okTotal(first)), Seq(firstCalib), spark,
        Seq.empty[(String, Double, Boolean)])

    // Fixture-carrying queries pay a one-time build (versioned table loads,
    // IVF/LSH index construction, z-order rewrite) memoized per (session,
    // sfDir). Their first-pass time above is build+read; a second rep on the
    // SAME session (caches warm) measures the steady-state read alone, so the
    // artifact separates the two instead of prose re-explaining the totals
    // every round. build_s is the first-pass excess over the warm read,
    // clamped at 0 (box noise can make the warm rep the slower one).
    val FixtureQueries = Seq(
      "q_ann_ivf_index", "q_ann_ivf_append", "q_bloom_skip_scan", "q_bm25_index", "q_change_feed", "q_change_feed_pre", "q_compact_read",
      "q_delete_dv", "q_delete_dv_tt", "q_delete_dv_fold",
      "q_sql_delete_dv", "q_sql_update_dv", "q_sql_restore",
      "q_dedup_against_index", "q_hive_read", "q_merge_upsert", "q_metadata_agg",
      "q_sql_delete", "q_sql_insert", "q_sql_merge", "q_sql_merge_mixed",
      "q_sql_create", "q_sql_optimize", "q_sql_history",
      "q_sql_meta_count_range", "q_sql_meta_groupby", "q_sql_metadata_agg",
      "q_sql_skip_scan",
      "q_sql_time_travel", "q_sql_update", "q_stats_skip_scan", "q_versioned_csv", "q_versioned_json",
      "q_versioned_orc", "q_zorder_scan")
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
      // per-phase build split where the fixture records one (round 9): lets
      // the artifact localize a hot build — uniform inflation across phases
      // is box contention, a single hot phase is an optimization target
      val phases = graft.queries.PipelineQueries.fixturePhasesJson(chosenSession, name)
        .map(p => s""","phases":$p""").getOrElse("")
      f""""$name":{"build_s":${math.max(0.0, firstS - readS)}%.3f,"read_s":$readS%.3f$phases}"""
    }.mkString("{", ",", "}")

    // Per-query outlier annotation (round 13): a kept entry that ran >5x
    // the SAME query in the OTHER attempt names itself as suspect — a
    // 40.9s q_scd2_incremental in a contended run no longer needs
    // forensics. Only the other attempt is a valid reference (both passes
    // include fixture builds — fresh session each — so the comparison is
    // apples-to-apples; the warm fixture rep is NOT, it would flag every
    // one-time build the fixtures block already decomposes). Un-retried
    // runs have no reference and flag nothing.
    val otherOk: Map[String, Double] =
      otherResults.collect { case (n, sec, true) => n -> sec }.toMap
    val outliersJson = results.collect {
      case (name, sec, true)
          if otherOk.get(name).exists(ref => sec > 1.0 && sec > 5 * ref) =>
        f""""$name":{"s":$sec%.3f,"other_attempt_s":${otherOk(name)}%.3f}"""
    }.mkString("{", ",", "}")

    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
    val status = failed.mkString("[", ",", "]")
    // only successful queries count toward the total: a fast failure must not
    // read as a timing improvement across runs with different failure sets
    val total = okTotal(results)
    // still-contended flag: true when even the KEPT attempt tripped EITHER
    // trigger — the total is then inflated and the artifact says so by
    // itself. Round-11 fix: this previously consulted only the calib probe,
    // so a kept attempt at 0.199% steal (retry-triggering!) could still
    // ship contended=false — observed live this round: calib 1.053 ratio
    // under the 1.06 gate while the total ran +23% vs the other attempt.
    // The single-threaded probe under-responds to 32-way query contention;
    // the flag must agree with the retry condition, not a subset of it.
    val stillContended = contended(stealPct, calibS)
    val calibJson =
      f""""calib_s":$calibS%.3f,"calib_quiet_s":$calibQuietUsed%.3f,""" +
        f""""calib_quiet_measured":$calibQuietMeasured%.3f,""" +
        s""""calib_quiet_reps":${quietReps.map(c => f"$c%.3f").mkString("[", ",", "]")},""" +
        f""""contended":$stillContended,""" +
        s""""attempt_calibs":${attemptCalibs.map(c => f"$c%.3f").mkString("[", ",", "]")}"""
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$status,""" +
        s""""steal_pct":$stealPct,"steal_retried":$retried,"first_attempt_steal_pct":$firstSteal,""" +
        s""""attempt_totals":${attemptTotals.mkString("[", ",", "]")},""" +
        s"""$calibJson,""" +
        s""""outliers":$outliersJson,""" +
        s""""fixtures":$fixturesJson,""" +
        s""""cpus":$cpus,""" +
        s""""sf":"$sfDir"}"""
    println(fullJson)
    // Round-17 output-contract fix (perf-visibility item 1 of the round-16
    // verdict): the driver keeps only the LAST ~2000 chars of stdout, and the
    // full line above is ~10 KB — BENCH_r15/r16 both reached the driver with
    // the per-query map cut mid-line, so PERF_r16.per_query came back EMPTY
    // and the optimization round ran without driver-verifiable per-query
    // ground truth. The 188 query names alone are ~2.6 KB, so NO single
    // parseable line can carry them all inside the tail. Three additive
    // mitigations (nothing above changed — totals stay comparable):
    //  1. the full canonical JSON is ALSO written to BENCH_PERQ.json (and a
    //     per-core-count copy) in the working directory — complete per-query
    //     ground truth as a file artifact, whatever stdout survives;
    //  2. compact one-query-per-line records below, printed in ASCENDING
    //     time order so the SLOWEST queries sit nearest the tail end and
    //     survive truncation — a tail-bounded parser recovers the most
    //     informative ~30 entries as complete JSON lines;
    //  3. the final summary line (unchanged fields, still last) names the
    //     artifact file so the driver knows where the full map lives.
    def writeBenchFile(name: String): Unit =
      try {
        val w = new java.io.PrintWriter(name, "UTF-8")
        try w.println(fullJson) finally w.close()
      } catch { case e: Exception => System.err.println(s"BENCH_PERQ write failed ($name): $e") }
    writeBenchFile("BENCH_PERQ.json")
    writeBenchFile(s"BENCH_PERQ_c$cpus.json")
    results.sortBy(_._2).foreach { case (k, v, ok) =>
      println(f"""{"q":"$k","s":$v%.3f,"ok":$ok}""")
    }
    // Compact summary as the LAST stdout line: the driver's tail capture
    // keeps only the final ~2000 chars of stdout, and the full JSON above has
    // outgrown that (BENCH_r05 and BENCH_r13 both came back parsed:null — the
    // fixtures block alone is >1.5k chars). This line therefore carries ONLY
    // bounded fields: headline numbers, the contention self-diagnosis, the
    // one-time fixture-build total (so steady-state s/q is computable from
    // the artifact alone), and the top-15 slowest queries (~30 chars each).
    // The unbounded per-query/fixture maps live ONLY in the full line above.
    val slowest = results.filter(_._3).sortBy(-_._2).take(15)
      .map { case (k, v, _) => s""""$k":${math.round(v * 1000)}""" }
      .mkString("{", ",", "}")
    val fixtureBuildTotal = fixtureReads.map { case (name, readS) =>
      val firstS = results.collectFirst { case (`name`, sec, true) => sec }.getOrElse(0.0)
      math.max(0.0, firstS - readS)
    }.sum
    println(f"""{"total_s":$total%.3f,"n":${results.size},"n_failed":${failed.size},""" +
      f""""steal_pct":$stealPct%.4f,"steal_retried":$retried,""" +
      f""""calib_s":$calibS%.3f,"calib_quiet_s":$calibQuietUsed%.3f,""" +
      f""""contended":$stillContended,""" +
      f""""fixture_build_total_s":$fixtureBuildTotal%.3f,""" +
      s""""attempt_totals":${attemptTotals.map(t => f"$t%.3f").mkString("[", ",", "]")},""" +
      s""""slowest_ms":$slowest,"perq_file":"BENCH_PERQ.json"}""")
    spark.stop()
    // a failed query must read as a failure, not a timing improvement
    if (failed.nonEmpty) sys.exit(1)
  }
}

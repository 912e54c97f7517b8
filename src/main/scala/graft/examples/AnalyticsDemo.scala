package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-command drive surface for the round-9 analytics + fingerprint
  * operators, in the MaintenanceDemo style: greppable NAME=value lines.
  *
  *   tools/run.sh graft.examples.AnalyticsDemo [sfDir]
  */
object AnalyticsDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.prepare(spark)
    import spark.implicits._

    val events = graft.Tables.events(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir)
    val steps = Seq("view", "click", "purchase")

    val funnel = graft.operators.EventAnalytics
      .funnelSteps(events, "user_id", "event_type", "ts", steps)
      .groupBy("steps_completed").count()
      .as[(Int, Long)].collect().sortBy(_._1)
    println(s"FUNNEL_DIST=${funnel.map { case (s, n) => s"$s:$n" }.mkString(",")}")

    val windowed = graft.operators.EventAnalytics
      .windowedFunnelSteps(events, "user_id", "event_type", "ts", steps,
        windowMicros = 6L * 3600 * 1000000)
      .groupBy("steps_completed").count()
      .as[(Int, Long)].collect().sortBy(_._1)
    println(s"FUNNEL_WINDOWED_DIST=${windowed.map { case (s, n) => s"$s:$n" }.mkString(",")}")

    val conv = graft.operators.EventAnalytics
      .funnelConversion(events, "user_id", "event_type", "ts", steps)
      .as[(Int, Long)].collect().sortBy(_._1)
    println(s"FUNNEL_CONVERSION=${conv.map { case (s, n) => s"$s:$n" }.mkString(",")}")

    val ret = graft.operators.EventAnalytics.retentionCohorts(events, "user_id", "ts")
    println(s"RETENTION_CELLS=${ret.count()}")
    println(s"RETENTION_W0_USERS=${ret.filter(col("week_offset") === 0)
      .agg(sum("n_users")).as[Long].head()}")

    val vecs = docs.select(col("doc_id").as("vec_id"),
      graft.functions.VectorExpressions.hashingTf(col("text"), 64).as("embedding"))
    val knn = graft.operators.Similarity
      .bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, k = 5)
      .select("neighbor_id").as[Long].collect()
    println(s"TEXT_KNN_TOP5=${knn.mkString(",")}")

    val images = docs.select(col("doc_id")).as[Long].filter(_ % 3 == 0)
      .map(id => graft.operators.MediaRecord(
        id, "image", graft.operators.Multimodal.syntheticGradientBmp(id), "demo"))
    val hashes = graft.operators.Multimodal.imageAHashes(images)
    println(s"IMAGE_AHASH_DISTINCT=${hashes.select("ahash").distinct().count()}")
    println(s"IMAGE_NEARDUP_PAIRS=${graft.operators.Multimodal
      .imageNearDupPairs(images, maxHamming = 3).count()}")

    val tracks = docs.select(col("doc_id")).as[Long].filter(_ % 3 == 1)
      .map(id => graft.operators.MediaRecord(
        id, "audio", graft.operators.Multimodal.syntheticModulatedWav(id), "demo"))
    println(s"AUDIO_SIG_DISTINCT=${graft.operators.Multimodal
      .audioSignatures(tracks).select("asig").distinct().count()}")

    // real multi-frame video decode + content-based near-dup over the
    // planted pattern fixture (consecutive video ids share a frame)
    val videos = docs.select(col("doc_id")).as[Long].filter(_ % 3 == 2)
      .map(id => graft.operators.MediaRecord(
        id, "video", graft.operators.Multimodal.syntheticPatternGif(id), "demo"))
    println(s"VIDEO_FRAMES=${graft.operators.Multimodal
      .sampleFrames(videos, everyNth = 1).count()}")
    println(s"VIDEO_NEARDUP_PAIRS=${graft.operators.Multimodal
      .videoNearDupPairs(videos, everyNth = 1).count()}")

    // commit-driven incremental maintenance: fold the events in two
    // ordered deliveries through the state frames and check both land on
    // the one-shot operators' results — the fold-split law, live
    val ea = graft.operators.EventAnalytics
    val mm = events.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
    val (d1, d2) = (events.filter(unix_micros(col("ts")) < cut),
      events.filter(unix_micros(col("ts")) >= cut))
    val fSteps = Seq("view", "click", "purchase")
    val w6h = 6L * 3600 * 1000000
    val incFunnel = ea.advanceWindowedFunnelState(
        ea.advanceWindowedFunnelState(ea.emptyWindowedFunnelState(spark),
          d1, "user_id", "event_type", "ts", fSteps, w6h),
        d2, "user_id", "event_type", "ts", fSteps, w6h)
      .select(col("user_id"), col("achieved")).as[(String, Int)].collect().toMap
    val oneShotFunnel = ea.windowedFunnelSteps(events, "user_id", "event_type", "ts", fSteps, w6h)
      .as[(Long, Int)].collect().map { case (u, n) => u.toString -> n }.toMap
    println(s"FUNNEL_INCREMENTAL_MATCHES=${incFunnel == oneShotFunnel}")
    val incRet = ea.retentionFromState(
        ea.advanceRetentionState(
          ea.advanceRetentionState(ea.emptyRetentionState(spark), d1, "user_id", "ts"),
          d2, "user_id", "ts"))
      .as[(java.sql.Date, Int, Long)].collect().map { case (c, o, n) => (c.toString, o) -> n }.toMap
    val oneShotRet = ea.retentionCohorts(events, "user_id", "ts")
      .as[(java.sql.Date, Int, Long)].collect().map { case (c, o, n) => (c.toString, o) -> n }.toMap
    println(s"RETENTION_INCREMENTAL_MATCHES=${incRet == oneShotRet}")

    // third family, same fold-split drive: sessions via the state frame
    // (closed sessions drained mid-way) vs the one-shot session_window agg
    val gap30m = 30L * 60 * 1000000
    val (sClosed, sOpen) = ea.compactSessionState(
      ea.advanceSessionState(ea.emptySessionState(spark),
        d1, "user_id", "ts", "value", gap30m))
    val incSessions = sClosed.union(ea.sessionsFromState(
        ea.advanceSessionState(sOpen, d2, "user_id", "ts", "value", gap30m)))
      .as[(String, String, Long, Double)].collect().toSet
    val oneShotSessions = events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("user_id").cast("string").as("user_id"), col("n_events"), col("session_value"))
      .as[(String, String, Long, Double)].collect().toSet
    println(s"SESSIONS_INCREMENTAL_MATCHES=${incSessions == oneShotSessions} " +
      s"SESSIONS_DRAINED=${sClosed.count()}")

    // heavy hitters at sketch cost vs the full groupBy it replaces
    val words = graft.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
    val hh = graft.operators.ScaleTools.heavyHitters(words, "word", minShare = 0.005)
      .select("word", "n").as[(String, Long)].collect().toSet
    val hhExact = {
      val total = words.count()
      words.groupBy("word").agg(count(lit(1)).as("n"))
        .filter(col("n") >= math.ceil(total * 0.005))
        .as[(String, Long)].collect().toSet
    }
    println(s"HEAVY_HITTERS=${hh.size} HEAVY_HITTERS_EXACT_MATCH=${hh == hhExact}")

    // ANN approximation quality: IVF recall@10 against the exact baseline
    val emb = graft.Tables.embeddings(spark, sfDir)
    val qs = emb.filter(col("vec_id") < 16)
    val exactNb = graft.operators.Similarity.bruteForceTopK(qs, emb, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfNb = graft.operators.Similarity.ivfTopK(qs, emb, k = 10, nlist = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    println(f"ANN_RECALL_AT10=${(exactNb & ivfNb).size.toDouble / exactNb.size}%.3f")

    spark.stop()
  }
}

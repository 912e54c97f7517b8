package graft.operators

import graft.TestSpark
import java.sql.Timestamp
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class EventAnalyticsSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val steps = Seq("view", "click", "buy")

  "funnelSteps" should "count only in-order completions" in {
    val events = Seq(
      // user 1: full ordered funnel
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "buy", ts(3)),
      // user 2: click BEFORE view — the early click must not count, and no
      // click follows the view, so the funnel stops at step 1
      (2L, "click", ts(1)), (2L, "view", ts(2)), (2L, "buy", ts(3)),
      // user 3: view then buy (no click) — buy cannot skip a step
      (3L, "view", ts(1)), (3L, "buy", ts(2)),
      // user 4: non-step events only — still surfaces with 0 steps? No: the
      // operator pre-filters to step types, so user 4 has no row at all
      (4L, "error", ts(1)),
      // user 5: the greedy law — early view, a click before it, a click
      // after it, then buy: greedy matches view(1), click(3), buy(4)
      (5L, "click", ts(0)), (5L, "view", ts(1)), (5L, "click", ts(3)), (5L, "buy", ts(4))
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnelSteps(events, "user_id", "event_type", "ts", steps)
      .as[(Long, Int)].collect().toMap
    got shouldBe Map(1L -> 3, 2L -> 1, 3L -> 1, 5L -> 3)
  }

  it should "require strictly increasing timestamps across steps" in {
    // click shares the view's timestamp: strict > means step 2 not reached
    val events = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(1)), (1L, "buy", ts(2))
    ).toDF("user_id", "event_type", "ts")
    EventAnalytics.funnelSteps(events, "user_id", "event_type", "ts", steps)
      .as[(Long, Int)].collect().toMap shouldBe Map(1L -> 1)
  }

  "windowedFunnelSteps" should "prefer a later anchor when the earliest expires" in {
    // earliest view at minute 0 expires (window 5 min) before the purchase;
    // the view at minute 10 anchors a complete chain — greedy-from-earliest
    // would report 2, the exists-a-chain semantics report 3
    val events = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(2)),
      (1L, "view", ts(10)), (1L, "click", ts(12)), (1L, "buy", ts(14))
    ).toDF("user_id", "event_type", "ts")
    EventAnalytics.windowedFunnelSteps(events, "user_id", "event_type", "ts",
        steps, windowMicros = 5L * 60 * 1000000)
      .as[(Long, Int)].collect().toMap shouldBe Map(1L -> 3)
    // and with a window too small for ANY full chain, it degrades exactly
    EventAnalytics.windowedFunnelSteps(events, "user_id", "event_type", "ts",
        steps, windowMicros = 3L * 60 * 1000000)
      .as[(Long, Int)].collect().toMap shouldBe Map(1L -> 2)
  }

  it should "match brute-force chain enumeration on random tie-heavy event sets" in {
    val rnd = new scala.util.Random(42)
    val windowMicros = 5L * 1000000 // 5 seconds
    // 30 independent trials as 30 users in ONE frame; second-granularity
    // timestamps over a small range force collisions, exercising the
    // Pareto-frontier tie handling
    val trials = (1 to 30).map { trial =>
      val n = 2 + rnd.nextInt(12)
      trial.toLong -> (0 until n).map { _ =>
        (rnd.nextInt(20).toLong, steps(rnd.nextInt(3)))
      }
    }.toMap
    def brute(evs: Seq[(Long, String)]): Int =
      (steps.size to 1 by -1).find { j =>
        def go(level: Int, minTsExcl: Long, anchor: Long): Boolean =
          level == j || evs.exists { case (ts, t) =>
            t == steps(level) && ts > minTsExcl &&
              (level == 0 || (ts - anchor) * 1000000 <= windowMicros) &&
              go(level + 1, ts, if (level == 0) ts else anchor)
          }
        go(0, Long.MinValue, 0L)
      }.getOrElse(0)
    val df = trials.toSeq.flatMap { case (u, evs) =>
      evs.map { case (sec, t) =>
        (u, t, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)))
      }
    }.toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.windowedFunnelSteps(
        df, "user_id", "event_type", "ts", steps, windowMicros)
      .as[(Long, Int)].collect().toMap
    trials.foreach { case (u, evs) =>
      withClue(s"trial $u (${evs.sorted.mkString(", ")}): ") {
        got.getOrElse(u, 0) shouldBe brute(evs)
      }
    }
  }

  it should "accept string user ids on their native type" in {
    // real event streams key on UUIDs/strings; the operator must group on
    // the native column type, not force a numeric cast (ANSI mode would
    // throw; non-ANSI would null-collapse every user into one group)
    val events = Seq(
      ("u-alpha", "view", ts(0)), ("u-alpha", "click", ts(2)),
      ("u-alpha", "view", ts(10)), ("u-alpha", "click", ts(12)), ("u-alpha", "buy", ts(14)),
      ("2f1c9e7a-uuid-ish", "view", ts(1)), ("2f1c9e7a-uuid-ish", "buy", ts(2))
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.windowedFunnelSteps(events, "user_id", "event_type", "ts",
        steps, windowMicros = 5L * 60 * 1000000)
      .as[(String, Int)].collect().toMap
    got shouldBe Map("u-alpha" -> 3, "2f1c9e7a-uuid-ish" -> 1)
    // the output column keeps the input's type
    EventAnalytics.windowedFunnelSteps(events, "user_id", "event_type", "ts",
      steps, windowMicros = 1000000).schema("user_id").dataType shouldBe
      org.apache.spark.sql.types.StringType
  }

  it should "keep frontiers bounded by one window's occupancy on adversarial alternating streams" in {
    // the ADVICE-flagged shape: alternating view/click with strictly
    // increasing (anchor, done) pairs is Pareto-incomparable, so an
    // unpruned frontier grows linearly with history. With expired-anchor
    // pruning it is bounded by the events inside ONE conversion window.
    val windowMicros = 1000L
    val spacing = windowMicros / 4 // 4-5 events ever inside a window
    val st = new WindowedFunnelDp.State(3)
    var maxFrontier = 0
    (0 until 400).foreach { i =>
      val t = if (i % 2 == 0) "view" else "click"
      WindowedFunnelDp.observe(st, steps.toIndexedSeq, windowMicros, i * spacing, t)
      maxFrontier = math.max(maxFrontier, st.frontiers.map(_.size).max)
    }
    maxFrontier should be <= 6 // window occupancy (~5) + the just-inserted entry
    // pruning never cost an answer: a full chain fits inside one window
    WindowedFunnelDp.observe(st, steps.toIndexedSeq, windowMicros, 400L * spacing + 1, "buy")
    st.achieved shouldBe 3
  }

  "WindowedFunnelDp" should "fold identically across any ordered split of the sequence" in {
    // the algebraic fact the streaming twin rests on: feeding an ordered
    // sequence through a carried State in arbitrary chunks equals the
    // one-shot fold — so stream == batch under ordered delivery is a
    // property of the DP, not of any particular fixture
    val rnd = new scala.util.Random(7)
    val stepsIdx = steps.toIndexedSeq
    (1 to 60).foreach { _ =>
      val n = 5 + rnd.nextInt(30)
      val evs = (0 until n).map(_ => (rnd.nextInt(25).toLong, steps(rnd.nextInt(3))))
        .sortBy(identity)
      val window = (2 + rnd.nextInt(8)).toLong
      def run(chunks: Seq[Seq[(Long, String)]]): Int = {
        val st = new WindowedFunnelDp.State(3)
        chunks.foreach(_.foreach { case (ts, t) =>
          WindowedFunnelDp.observe(st, stepsIdx, window, ts, t)
        })
        st.achieved
      }
      val cut1 = rnd.nextInt(n + 1)
      val cut2 = cut1 + rnd.nextInt(n - cut1 + 1)
      run(Seq(evs.take(cut1), evs.slice(cut1, cut2), evs.drop(cut2))) shouldBe run(Seq(evs))
    }
  }

  it should "not grow frontiers at all on repeated events (ties are Pareto-dominated)" in {
    // a tied re-observation proposes the exact (anchor, done) pairs already
    // present, and dominance (anchor >= AND done <=) absorbs equals — so
    // heavy duplication leaves the frontier at the DISTINCT-timestamp
    // occupancy bound of the untied law above
    val windowMicros = 1000L
    val spacing = windowMicros / 4
    val st = new WindowedFunnelDp.State(3)
    var maxFrontier = 0
    (0 until 400).foreach { i =>
      val t = if (i % 2 == 0) "view" else "click"
      (1 to 4).foreach { _ =>
        WindowedFunnelDp.observe(st, steps.toIndexedSeq, windowMicros, i * spacing, t)
      }
      maxFrontier = math.max(maxFrontier, st.frontiers.map(_.size).max)
    }
    maxFrontier should be <= 6 // identical to the untied bound
  }

  "advanceWindowedFunnelState" should "equal the batch funnel over any ordered delivery split" in {
    // the commit-driven form: random tie-heavy event sets split into three
    // ordered deliveries, folded through the state frame — must equal
    // windowedFunnelSteps over the concatenation, per the fold-split law
    val rnd = new scala.util.Random(11)
    val windowMicros = 5L * 1000000
    val all = (1 to 20).flatMap { u =>
      (0 until 3 + rnd.nextInt(10)).map { _ =>
        (u.toLong, steps(rnd.nextInt(3)),
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(rnd.nextInt(20).toLong)))
      }
    }.sortBy(_._3.getTime)
    val (d1, rest) = all.splitAt(all.size / 3)
    val (d2, d3) = rest.splitAt(rest.size / 3)
    var state = EventAnalytics.emptyWindowedFunnelState(spark)
    Seq(d1, d2, d3).foreach { d =>
      state = EventAnalytics.advanceWindowedFunnelState(state,
        d.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", steps, windowMicros)
      // the state frame must survive materialization between deliveries —
      // that is what a versioned-table round trip does to it
      state = state.localCheckpoint()
    }
    val incremental = state.select("user_id", "achieved")
      .as[(String, Int)].collect().toMap
    val batch = EventAnalytics.windowedFunnelSteps(
        all.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", steps, windowMicros)
      .as[(Long, Int)].collect().map { case (u, n) => u.toString -> n }.toMap
    incremental shouldBe batch
    // and the pruning bound holds in the STORED state too: entries per user
    // bounded by one window's occupancy across all levels
    state.select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("entries")).as("n"))
      .as[Int].collect().foreach(_ should be <= 40)
  }

  it should "round-trip its state through parquet (versioned-table shape)" in {
    def ts(sec: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec.toLong))
    val w = 5L * 60 * 1000000
    val d1 = Seq(("u1", "view", ts(0)), ("u1", "click", ts(60)))
      .toDF("user_id", "event_type", "ts")
    val d2 = Seq(("u1", "buy", ts(120))).toDF("user_id", "event_type", "ts")
    val s1 = EventAnalytics.advanceWindowedFunnelState(
      EventAnalytics.emptyWindowedFunnelState(spark), d1,
      "user_id", "event_type", "ts", steps, w)
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel-state-").toString
    s1.write.mode("overwrite").parquet(dir) // what versionedInsertInto does
    val s2 = EventAnalytics.advanceWindowedFunnelState(
      spark.read.parquet(dir), d2, "user_id", "event_type", "ts", steps, w)
    s2.select("user_id", "achieved").as[(String, Int)].collect().toMap shouldBe
      Map("u1" -> 3)
  }

  "funnelConversion" should "produce the cumulative at-least table" in {
    val events = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "buy", ts(3)),
      (2L, "view", ts(1)), (2L, "click", ts(2)),
      (3L, "view", ts(1)),
      (4L, "view", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnelConversion(events, "user_id", "event_type", "ts", steps)
      .as[(Int, Long)].collect().toMap
    // 4 users reached >= step 1, 2 reached >= step 2, 1 reached >= step 3
    got shouldBe Map(1 -> 4L, 2 -> 2L, 3 -> 1L)
  }

  "advanceRetentionState" should "rebuild the batch cohort table over any ordered delivery split" in {
    val rnd = new scala.util.Random(13)
    val all = (1 to 25).flatMap { u =>
      (0 until 1 + rnd.nextInt(6)).map { _ =>
        (u.toLong, java.sql.Timestamp.valueOf(
          f"2024-01-${1 + rnd.nextInt(28)}%02d 12:00:00"))
      }
    }.sortBy(_._2.getTime)
    val (d1, rest) = all.splitAt(all.size / 3)
    val (d2, d3) = rest.splitAt(rest.size / 3)
    var state = EventAnalytics.emptyRetentionState(spark)
    Seq(d1, d2, d3).foreach { d =>
      state = EventAnalytics.advanceRetentionState(
        state, d.toDF("user_id", "ts"), "user_id", "ts").localCheckpoint()
    }
    val incremental = EventAnalytics.retentionFromState(state)
      .as[(java.sql.Date, Int, Long)].collect()
      .map { case (c, o, n) => (c.toString, o) -> n }.toMap
    val batch = EventAnalytics.retentionCohorts(
        all.toDF("user_id", "ts"), "user_id", "ts")
      .as[(java.sql.Date, Int, Long)].collect()
      .map { case (c, o, n) => (c.toString, o) -> n }.toMap
    incremental shouldBe batch
  }

  "advanceSessionState" should "rebuild the batch session_window table over any ordered delivery split" in {
    val rnd = new scala.util.Random(17)
    val gap = 30L * 60 * 1000000
    val all = (1 to 15).flatMap { u =>
      (0 until 2 + rnd.nextInt(8)).map { _ =>
        (u.toLong,
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(rnd.nextInt(6 * 3600).toLong)),
          rnd.nextInt(10000) / 100.0)
      }
    }.sortBy(_._2.getTime)
    val (d1, rest) = all.splitAt(all.size / 3)
    val (d2, d3) = rest.splitAt(rest.size / 3)
    var state = EventAnalytics.emptySessionState(spark)
    Seq(d1, d2, d3).foreach { d =>
      // localCheckpoint: the state frame must survive materialization
      // between deliveries, as a versioned-table round trip would force
      state = EventAnalytics.advanceSessionState(
        state, d.toDF("user_id", "ts", "value"), "user_id", "ts", "value", gap)
        .localCheckpoint()
    }
    val incremental = EventAnalytics.sessionsFromState(state)
      .as[(String, String, Long, Double)].collect().toSet
    val batch = all.toDF("user_id", "ts", "value")
      .groupBy(org.apache.spark.sql.functions.session_window(
        org.apache.spark.sql.functions.col("ts"), "30 minutes").as("w"),
        org.apache.spark.sql.functions.col("user_id"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("value").cast("decimal(18,2)"))
          .cast("double").as("session_value"))
      .select(org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("w.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        org.apache.spark.sql.functions.col("user_id").cast("string").as("user_id"),
        org.apache.spark.sql.functions.col("n_events"),
        org.apache.spark.sql.functions.col("session_value"))
      .as[(String, String, Long, Double)].collect().toSet
    incremental shouldBe batch
    incremental.size should be > 15 // multi-session users actually occurred
  }

  it should "tolerate null timestamps and null values like the batch aggregation" in {
    def mts(min: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(min * 60L))
    val gap = 30L * 60 * 1000000
    // null ts rows are dropped (session_window drops them too); a null
    // value rides as 0 cents instead of killing the delivery
    val d = Seq((1L, Some(mts(0)), Some(1.5)), (1L, Some(mts(5)), None),
      (1L, None, Some(9.9)), (2L, Some(mts(0)), Some(2.0)))
    val st = EventAnalytics.advanceSessionState(
      EventAnalytics.emptySessionState(spark),
      d.toDF("user_id", "ts", "value"), "user_id", "ts", "value", gap)
    EventAnalytics.sessionsFromState(st)
      .as[(String, String, Long, Double)].collect().toSet shouldBe Set(
      ("1970-01-01 00:00:00", "1", 2L, 1.5),
      ("1970-01-01 00:00:00", "2", 1L, 2.0))
  }

  it should "fold a NULL user into one session chain across deliveries (null-safe state join)" in {
    def mts(min: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(min * 60L))
    val gap = 30L * 60 * 1000000
    // the same null user's events split across two deliveries, within one
    // session gap: batch session_window groups them as ONE session, so the
    // state join must match the null-key state row instead of duplicating it
    val d1 = Seq((None: Option[Long], Some(mts(0)), Some(1.0)), (Some(1L), Some(mts(0)), Some(5.0)))
    val d2 = Seq((None: Option[Long], Some(mts(10)), Some(2.0)))
    var st = EventAnalytics.emptySessionState(spark)
    Seq(d1, d2).foreach { d =>
      st = EventAnalytics.advanceSessionState(
        st, d.toDF("user_id", "ts", "value"), "user_id", "ts", "value", gap)
        .localCheckpoint()
    }
    val rows = EventAnalytics.sessionsFromState(st)
      .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2), r.getDouble(3)))
      .toSet
    rows shouldBe Set(
      ("1970-01-01 00:00:00", None, 2L, 3.0),
      ("1970-01-01 00:00:00", Some("1"), 1L, 5.0))
  }

  it should "drain closed sessions between commits without changing the final table" in {
    def mts(min: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(min * 60L))
    val gap = 30L * 60 * 1000000
    val d1 = Seq((1L, mts(0), 1.0), (1L, mts(10), 2.0), (1L, mts(100), 3.0), (2L, mts(5), 4.0))
    val d2 = Seq((1L, mts(110), 5.0), (2L, mts(200), 6.0))
    def adv(st: org.apache.spark.sql.DataFrame, d: Seq[(Long, java.sql.Timestamp, Double)]) =
      EventAnalytics.advanceSessionState(
        st, d.toDF("user_id", "ts", "value"), "user_id", "ts", "value", gap)

    val full = EventAnalytics.sessionsFromState(adv(adv(
        EventAnalytics.emptySessionState(spark), d1), d2))
      .as[(String, String, Long, Double)].collect().toSet

    val st1 = adv(EventAnalytics.emptySessionState(spark), d1)
    val (closed, openTail) = EventAnalytics.compactSessionState(st1)
    // only user 1 has a CLOSED session after delivery 1 ([min 0-10])
    closed.as[(String, String, Long, Double)].collect().toSet shouldBe
      Set(("1970-01-01 00:00:00", "1", 2L, 3.0))
    // the compacted state holds exactly one (open) session per user
    openTail.select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("sessions")).as("n"))
      .as[Int].collect().foreach(_ shouldBe 1)
    // drain-then-continue equals never-drained: the compaction law
    val drained = closed.union(
        EventAnalytics.sessionsFromState(adv(openTail, d2)))
      .as[(String, String, Long, Double)].collect().toSet
    drained shouldBe full
    // and d2's min-110 event really extended the open min-100 session
    full should contain(("1970-01-01 01:40:00", "1", 2L, 8.0))
  }

  "retentionCohorts" should "bucket users by first-event week and count active offsets" in {
    def week(w: Int, dow: Int) = Timestamp.valueOf(f"2024-01-${1 + w * 7 + dow}%02d 12:00:00")
    val events = Seq(
      // user 1: first seen week 0 (Mon Jan 1), active weeks 0 and 2
      (1L, week(0, 0)), (1L, week(0, 3)), (1L, week(2, 1)),
      // user 2: first seen week 0, active week 0 only
      (2L, week(0, 5)),
      // user 3: first seen week 1, active weeks 1 and 2 (offsets 0 and 1)
      (3L, week(1, 0)), (3L, week(2, 2))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.retentionCohorts(events, "user_id", "ts")
      .as[(java.sql.Date, Int, Long)].collect()
      .map { case (c, o, n) => (c.toString, o) -> n }.toMap
    got shouldBe Map(
      ("2024-01-01", 0) -> 2L, // users 1 and 2 in their cohort week
      ("2024-01-01", 2) -> 1L, // user 1 back two weeks later
      ("2024-01-08", 0) -> 1L, // user 3 cohort week
      ("2024-01-08", 1) -> 1L) // user 3 the week after
  }
}

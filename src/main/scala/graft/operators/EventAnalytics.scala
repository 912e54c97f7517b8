package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Product-analytics operators over event streams: ordered funnels and
 * retention cohorts — the two queries every event warehouse runs daily,
 * expressed as single-shuffle aggregations so they hold at any event
 * volume.
 */
object EventAnalytics {

  /** Null-safe full-outer join of a state frame with a per-user delivery
    * aggregate: the batch operators' groupBy puts all null users in ONE
    * group, so the incremental twins must too — a USING join never matches
    * null keys, which would duplicate a null-user state row every delivery
    * and break the pinned advance ≡ batch equivalences. The delivery key
    * rides renamed so the `<=>` condition stays unambiguous; the coalesced
    * key takes back the `user_id` name. */
  private def joinStateDelivery(state: DataFrame, delivery: DataFrame): DataFrame =
    state.join(delivery.withColumnRenamed("user_id", "__d_user_id"),
        col("user_id") <=> col("__d_user_id"), "full_outer")
      .withColumn("user_id", coalesce(col("user_id"), col("__d_user_id")))

  /**
   * Exact ordered funnel: for each user, how many of `steps` were completed
   * IN ORDER — step k counts only if an event of its type occurs STRICTLY
   * after the event that completed step k-1 (greedy earliest-feasible
   * matching, which is optimal for subsequence matching: the fold's result
   * equals the nested-min formulation `t1 = min ts of s1, t2 = min ts of s2
   * with ts > t1, ...`).
   *
   * Shape: events are pre-filtered to the step types (non-step events cannot
   * advance the fold — at 100 TB this is the difference between shuffling
   * the firehose and shuffling the funnel's slice), then ONE groupBy(user)
   * collects each user's (ts, type) pairs, sorts them per group, and a
   * single `aggregate` fold walks the sequence. Per-user memory is bounded
   * by that user's STEP-TYPED event count; hot users beyond that bound are a
   * salting/pre-aggregation problem upstream, like every per-user collect.
   * Ties: the fold requires strictly increasing timestamps, so two step
   * events sharing a timestamp advance at most one step — identical to the
   * SQL formulation's strict `>`.
   *
   * @return one row per user: (userCol, `steps_completed` 0..|steps|).
   */
  def funnelSteps(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val stepsArr = array(steps.map(lit): _*)
    val init: Column = struct(lit(0).as("step"), lit(Long.MinValue).as("ts"))
    events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol),
        struct(unix_micros(col(tsCol)).as("ts"), col(typeCol).as("t")).as("__e"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("__e"))).as("__seq"))
      .withColumn("__st", aggregate(col("__seq"), init, (st, e) =>
        when(st.getField("step") < lit(steps.size) &&
            element_at(stepsArr, st.getField("step") + 1) === e.getField("t") &&
            e.getField("ts") > st.getField("ts"),
          struct((st.getField("step") + 1).as("step"), e.getField("ts").as("ts")))
          .otherwise(st)))
      .select(col(userCol), col("__st").getField("step").as("steps_completed"))
  }

  /**
   * Windowed funnel with EXACT re-anchoring semantics: for each user, the
   * longest prefix of `steps` for which a strictly-time-increasing chain of
   * matching events exists whose LAST step lies within `windowMicros` of
   * the chain's OWN first step — the conversion-window rule of product
   * analytics. This is genuinely different from [[funnelSteps]]'s greedy
   * fold: under a window, the earliest step-1 occurrence is NOT always the
   * best anchor (an early view can expire before the purchase a later view
   * converts), so greedy matching under-counts. Exactness here means
   * "equals the EXISTS-a-chain definition", which the DuckDB oracle states
   * literally and a property spec checks against brute-force enumeration.
   *
   * Shape: identical to [[funnelSteps]] — pre-filter to step types, one
   * groupBy(user), per-user time-sorted scan. The scan is
   * [[WindowedFunnelDp]] — a Pareto-frontier DP with expired-anchor
   * pruning, so per-user work is O(events × steps × windowOccupancy) where
   * windowOccupancy is the user's step-typed events inside ONE conversion
   * window — NOT the user's whole history. The user key is grouped on its
   * NATIVE column type (string / UUID / long user ids all work); the DP
   * runs as a scala UDF over the collected per-user sequence because no
   * built-in expresses a multi-frontier DP, and the HOF-`aggregate`
   * encoding of state this shape was measured ~8× slower interpreted
   * (the q_lm_bigram precedent).
   *
   * @return one row per user with a step-typed event:
   *         (userCol, `steps_completed`).
   */
  def windowedFunnelSteps(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      windowMicros: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowMicros > 0, s"windowMicros must be > 0, got $windowMicros")
    val stepsIdx = steps.toIndexedSeq
    val k = steps.size
    val dp = udf { (seq: Seq[(Long, String)]) =>
      val st = new WindowedFunnelDp.State(k)
      seq.foreach { case (ts, t) =>
        WindowedFunnelDp.observe(st, stepsIdx, windowMicros, ts, t)
      }
      st.achieved
    }
    events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol),
        struct(unix_micros(col(tsCol)).as("_1"), col(typeCol).as("_2")).as("__e"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("__e"))).as("__seq"))
      .select(col(userCol), dp(col("__seq")).as("steps_completed"))
  }

  /**
   * Incremental windowed-funnel maintenance — the COMMIT-DRIVEN batch form
   * of the conversion-window funnel: a per-user state frame
   * (`user_id` STRING, `achieved` INT, `entries` ARRAY<STRUCT<level INT,
   * anchor LONG, done LONG>>) advanced by one delivery of events at a time.
   * [[WindowedFunnelDp]]'s fold-split property (pinned in
   * EventAnalyticsSpec) guarantees that folding ordered deliveries through
   * the state equals [[windowedFunnelSteps]] over their concatenation — so
   * a pipeline that lands event partitions as versioned commits can keep
   * funnel results current in O(delivery) work per commit instead of
   * re-scanning history, and because the state is a plain DataFrame it can
   * itself be a VERSIONED table: `versionedInsertInto` each advance and
   * `readAt` gives "the funnel as of commit X" for free. State per user is
   * bounded by ONE conversion window's occupancy (the pruning bound), not
   * by history.
   *
   * Deliveries must arrive in event-time order ACROSS calls (the same
   * contract as the streaming twin; within a delivery the operator sorts).
   *
   * Start from [[emptyWindowedFunnelState]]; read results off the state
   * with `select(user_id, achieved as steps_completed)`.
   */
  def advanceWindowedFunnelState(
      state: DataFrame,
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      windowMicros: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowMicros > 0, s"windowMicros must be > 0, got $windowMicros")
    val stepsIdx = steps.toIndexedSeq
    val k = steps.size
    val advance = udf { (achieved: Int, entries: Seq[(Int, Long, Long)], seq: Seq[(Long, String)]) =>
      val st = new WindowedFunnelDp.State(k)
      st.achieved = achieved
      entries.foreach { case (j, a, d) =>
        if (j >= 0 && j < k) st.frontiers(j) = (a, d) :: st.frontiers(j)
      }
      seq.foreach { case (ts, t) => WindowedFunnelDp.observe(st, stepsIdx, windowMicros, ts, t) }
      (st.achieved, st.frontiers.iterator.zipWithIndex.flatMap { case (f, j) =>
        f.map { case (a, d) => (j, a, d) }
      }.toSeq)
    }
    val delivery = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).cast("string").as("user_id"),
        struct(unix_micros(col(tsCol)).as("_1"), col(typeCol).as("_2")).as("__e"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("__e"))).as("__seq"))
    joinStateDelivery(state, delivery)
      .select(col("user_id"),
        advance(
          coalesce(col("achieved"), lit(0)),
          coalesce(transform(col("entries"), e =>
            struct(e.getField("level").as("_1"), e.getField("anchor").as("_2"),
              e.getField("done").as("_3"))),
            array().cast("array<struct<_1:int,_2:bigint,_3:bigint>>")),
          coalesce(col("__seq"),
            array().cast("array<struct<_1:bigint,_2:string>>"))).as("__st"))
      .select(col("user_id"),
        col("__st").getField("_1").as("achieved"),
        transform(col("__st").getField("_2"), e =>
          struct(e.getField("_1").as("level"), e.getField("_2").as("anchor"),
            e.getField("_3").as("done"))).as("entries"))
  }

  /** The conversion table straight off an incremental state frame: users
    * reaching AT LEAST each achieved prefix — [[funnelConversion]]'s shape
    * over [[advanceWindowedFunnelState]]'s output, so a commit-driven
    * pipeline reads its dashboard table from the maintained state without
    * touching event history. Output bounded by |steps|+1 rows. */
  def funnelConversionFromState(state: DataFrame): DataFrame = {
    // no filter: like funnelConversion, the step-0 row counts every user
    // with a step-typed event, converted or not
    val byStep = state.groupBy(col("achieved")).agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("achieved").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    byStep.withColumn("n_users_at_least", sum(col("__n")).over(w))
      .select(col("achieved").as("step"), col("n_users_at_least"))
  }

  /** The zero-delivery state for [[advanceWindowedFunnelState]]. */
  def emptyWindowedFunnelState(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), StructType(Seq(
      StructField("user_id", StringType),
      StructField("achieved", IntegerType),
      StructField("entries", ArrayType(StructType(Seq(
        StructField("level", IntegerType),
        StructField("anchor", LongType),
        StructField("done", LongType))))))))
  }

  /**
   * Incremental retention maintenance — the commit-driven sibling of
   * [[advanceWindowedFunnelState]]: a per-user state frame (`user_id`
   * STRING, `cohort_day` LONG — epoch day of the user's first-seen week —
   * and `offsets` ARRAY<LONG>, a bitmap of week offsets seen) advanced by
   * one delivery at a time. Week truncation happens UPSTREAM with the same
   * `date_trunc("week")` the batch operator uses; cohort assignment is
   * first-DELIVERED week (exact when deliveries are event-time ordered —
   * the contract all incremental/streaming variants share). State per user
   * is O(active-weeks/64) longs. [[retentionFromState]] rebuilds the
   * cohort table; the law `fold(deliveries) |> retentionFromState ==
   * retentionCohorts(concat)` is pinned in EventAnalyticsSpec and at the
   * gate (q_retention_incremental replays q_retention's own oracle).
   */
  def advanceRetentionState(
      state: DataFrame,
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val advance = udf { (cohort: Long, offsets: Seq[Long], weeks: Seq[Int]) =>
      val c = if (cohort == Long.MinValue) weeks.min.toLong else cohort
      var bits = offsets.toArray
      weeks.foreach { day =>
        val off = Math.floorDiv(day - c, 7L).toInt
        if (off >= 0) { // a late pre-cohort week cannot move the cohort
          val word = off >> 6
          if (word >= bits.length) bits = bits ++ Array.fill(word - bits.length + 1)(0L)
          bits(word) |= 1L << (off & 63)
        }
      }
      (c, bits.toSeq)
    }
    val delivery = events
      .select(col(userCol).cast("string").as("user_id"),
        datediff(to_date(date_trunc("week", col(tsCol))), lit("1970-01-01")).as("__wk"))
      .groupBy(col("user_id"))
      .agg(collect_set(col("__wk")).as("__wks"))
    joinStateDelivery(state, delivery)
      .select(col("user_id"),
        advance(
          coalesce(col("cohort_day"), lit(Long.MinValue)),
          coalesce(col("offsets"), array().cast("array<bigint>")),
          coalesce(col("__wks"), array().cast("array<int>"))).as("__st"))
      .select(col("user_id"),
        col("__st").getField("_1").as("cohort_day"),
        col("__st").getField("_2").as("offsets"))
  }

  /** The zero-delivery state for [[advanceRetentionState]]. */
  def emptyRetentionState(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), StructType(Seq(
      StructField("user_id", StringType),
      StructField("cohort_day", LongType),
      StructField("offsets", ArrayType(LongType)))))
  }

  /** Rebuild [[retentionCohorts]]' table from an incremental state frame. */
  def retentionFromState(state: DataFrame): DataFrame = {
    val setOffsets = udf { (words: Seq[Long]) =>
      words.iterator.zipWithIndex.flatMap { case (w, wi) =>
        (0 until 64).filter(b => (w >> b & 1L) == 1L).map(b => wi * 64 + b)
      }.toSeq
    }
    state
      .select(col("user_id"),
        date_add(to_date(lit("1970-01-01")), col("cohort_day").cast("int")).as("cohort_week"),
        explode(setOffsets(col("offsets"))).as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /**
   * Incremental gap-sessionization — the commit-driven member completing
   * the third event-analytics family's batch + streaming + incremental
   * triple (batch: the `session_window` aggregation at the gate as
   * q_event_sessions; streaming: [[graft.streaming.EventStreams.sessionize]]).
   *
   * State frame: `user_id` STRING plus `sessions`
   * ARRAY<STRUCT<start,last,n,v_cents>> in start order, the LAST element
   * being the still-open session. One delivery advances it with ONE
   * user-keyed exchange (groupBy + sorted collect_list, the family shape):
   * an event within `gapMicros` of the open session's last event extends
   * it, anything later opens a new one — `session_window`'s merge rule
   * (strictly-less-than-gap joins). Values ride as cents (`value` cast
   * DECIMAL(18,2) ×100), so per-session sums are exact integers regardless
   * of fold order and [[sessionsFromState]] reproduces the oracle's
   * decimal-sum-cast-double bit-for-bit.
   *
   * Exact under event-time-ordered delivery (the contract every
   * incremental/streaming sibling shares); a late event can extend the
   * open session but never retro-merge two already-separated ones —
   * sessions can only UNDER-merge, never fabricate a bridge. Unbounded
   * histories keep state O(1)/user by draining
   * [[compactSessionState]]'s closed slice into an append-only results
   * table at each commit.
   */
  def advanceSessionState(
      state: DataFrame,
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String,
      gapMicros: Long): DataFrame = {
    require(gapMicros > 0, s"gapMicros must be > 0, got $gapMicros")
    val advance = udf { (sessions: Seq[(Long, Long, Long, Long)], evs: Seq[(Long, Long)]) =>
      val out = scala.collection.mutable.ArrayBuffer.from(sessions)
      evs.foreach { case (t, cents) =>
        if (out.nonEmpty && t - out.last._2 < gapMicros) {
          val (s0, l0, n0, v0) = out.last
          out(out.length - 1) = (math.min(s0, t), math.max(l0, t), n0 + 1, v0 + cents)
        } else out += ((t, t, 1L, cents))
      }
      out.toSeq
    }
    // null-ts rows are dropped (session_window's grouping drops them too);
    // a null value rides as 0 cents — divergence from the SQL oracle only
    // for a session whose EVERY value is null (0.0 here vs NULL there)
    val delivery = events
      .filter(col(tsCol).isNotNull)
      .select(col(userCol).cast("string").as("user_id"),
        struct(unix_micros(col(tsCol)).as("_1"),
          coalesce((col(valueCol).cast("decimal(18,2)") * 100).cast("long"), lit(0L))
            .as("_2")).as("__e"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("__e"))).as("__seq"))
    joinStateDelivery(state, delivery)
      .select(col("user_id"),
        advance(
          coalesce(transform(col("sessions"), s =>
            struct(s.getField("start").as("_1"), s.getField("last").as("_2"),
              s.getField("n").as("_3"), s.getField("v_cents").as("_4"))),
            array().cast("array<struct<_1:bigint,_2:bigint,_3:bigint,_4:bigint>>")),
          coalesce(col("__seq"),
            array().cast("array<struct<_1:bigint,_2:bigint>>"))).as("__st"))
      .select(col("user_id"),
        transform(col("__st"), s =>
          struct(s.getField("_1").as("start"), s.getField("_2").as("last"),
            s.getField("_3").as("n"), s.getField("_4").as("v_cents"))).as("sessions"))
  }

  /** The zero-delivery state for [[advanceSessionState]]. */
  def emptySessionState(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), StructType(Seq(
      StructField("user_id", StringType),
      StructField("sessions", ArrayType(StructType(Seq(
        StructField("start", LongType),
        StructField("last", LongType),
        StructField("n", LongType),
        StructField("v_cents", LongType))))))))
  }

  /** One session struct → the q_event_sessions output row shape. The cents
    * → double conversion is exact-then-rounded (cents < 2^53 are exact in
    * a double and IEEE division is correctly rounded), so it equals the
    * oracle's CAST(SUM(DECIMAL) AS DOUBLE) bit-for-bit. */
  private def sessionRows(withSession: DataFrame): DataFrame =
    withSession.select(
      date_format(timestamp_micros(col("s.start")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
      col("user_id"),
      col("s.n").as("n_events"),
      (col("s.v_cents").cast("double") / 100.0).as("session_value"))

  /** Rebuild the full session table (q_event_sessions' shape:
    * session_start, user_id, n_events, session_value) from an incremental
    * state frame. */
  def sessionsFromState(state: DataFrame): DataFrame =
    sessionRows(state.select(col("user_id"), explode(col("sessions")).as("s")))

  /** Drain the CLOSED sessions out of a state frame: (closed rows in
    * [[sessionsFromState]]'s shape, a state keeping only each user's open
    * tail). Under ordered delivery later events can only touch the open
    * session, so draining between commits never changes the final table —
    * the compaction law in EventAnalyticsSpec — and the maintained state
    * stays O(1) per user over unbounded history. */
  def compactSessionState(state: DataFrame): (DataFrame, DataFrame) = {
    val closed = sessionRows(state.select(col("user_id"),
      // greatest(..,0): a state frame can't hold an empty array after an
      // advance, but slice with length -1 would throw rather than no-op
      explode(slice(col("sessions"), lit(1), greatest(size(col("sessions")) - 1, lit(0)))).as("s")))
    val openTail = state.select(col("user_id"),
      slice(col("sessions"), -1, 1).as("sessions"))
    (closed, openTail)
  }

  /** The conversion table over [[funnelSteps]]: users reaching AT LEAST each
    * step (step 0 = everyone with a step-typed event). Tiny output
    * (|steps|+1 rows); the cumulative sum runs over that bounded frame. */
  def funnelConversion(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    val perUser = funnelSteps(events, userCol, typeCol, tsCol, steps)
    val byStep = perUser.groupBy(col("steps_completed")).agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("steps_completed").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    byStep.withColumn("n_users_at_least", sum(col("__n")).over(w))
      .select(col("steps_completed").as("step"), col("n_users_at_least"))
  }

  /**
   * Weekly retention cohorts: users grouped by the ISO week of their first
   * event; one row per (cohort week, week offset) with the distinct users
   * active that week. Two aggregations and one join, all keyed on user —
   * one partitioning serves the whole plan; output is bounded by
   * weeks², never by events.
   */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val firstWeek = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("__cohort"))
    val activeWeeks = events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("__week"))
      .distinct()
    activeWeeks.join(firstWeek, userCol)
      .select(
        to_date(col("__cohort")).as("cohort_week"),
        floor(datediff(col("__week"), col("__cohort")) / lit(7)).cast("int").as("week_offset"),
        col(userCol))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}

/**
 * The conversion-window funnel DP shared by the batch operator
 * ([[EventAnalytics.windowedFunnelSteps]]) and its streaming twin: a fold
 * over one user's (ts, type)-ordered step events that maintains, per prefix
 * length j, the PARETO FRONTIER of (anchor, done) pairs — a chain achieving
 * prefix j+1 is kept only if no other chain has a later-or-equal anchor AND
 * an earlier-or-equal completion.
 *
 * Bounding rule: before each event at `ts`, every entry whose
 * `anchor + windowMicros < ts` is dropped — any future event has ts' ≥ ts,
 * so such a chain can never extend again. A per-state `achieved` high-water
 * mark keeps the answer exact through pruning (and lets complete chains at
 * level k-1 be counted without ever being stored). Each frontier is
 * therefore bounded by the user's step-typed events inside ONE conversion
 * window — per-user work is O(events × steps × windowOccupancy), not
 * O(events²) on hot users with long histories.
 *
 * Fold property: the result over a (ts, type)-sorted sequence equals the
 * result of folding any ordered partition of it through a carried State —
 * which is exactly what the streaming variant does across micro-batches.
 */
private[graft] object WindowedFunnelDp {

  /** Mutable per-user DP state. `frontiers(j)` holds the Pareto-minimal
    * (anchor, done) pairs for prefix j+1 (level k-1 is never stored — a
    * complete chain cannot extend); `achieved` is the max prefix length
    * ever completed. */
  final class State(val k: Int) {
    var achieved: Int = 0
    val frontiers: Array[List[(Long, Long)]] = Array.fill(k)(Nil)
  }

  /** Advance `st` by one event. MUST be called in (ts, type)-ascending
    * order within each fed batch for exactness; feeding a late (smaller-ts)
    * event never over-counts — it can only anchor/extend chains whose later
    * links are still to come. */
  def observe(
      st: State,
      steps: IndexedSeq[String],
      windowMicros: Long,
      ts: Long,
      t: String): Unit = {
    val k = st.k
    var p = 0
    while (p < k) {
      // expired-anchor pruning: anchor + window < ts can never extend
      if (st.frontiers(p).exists(_._1 < ts - windowMicros))
        st.frontiers(p) = st.frontiers(p).filter(_._1 >= ts - windowMicros)
      p += 1
    }
    def insert(j: Int, anchor: Long, done: Long): Unit = {
      if (st.achieved < j + 1) st.achieved = j + 1
      if (j < k - 1 &&
          !st.frontiers(j).exists { case (a, d) => a >= anchor && d <= done })
        st.frontiers(j) = (anchor, done) ::
          st.frontiers(j).filterNot { case (a, d) => a <= anchor && d >= done }
    }
    // descending prefix order: one event advances any chain at most once
    // (matters when steps REPEAT a type, e.g. view,view,buy)
    var j = k - 1
    while (j >= 0) {
      if (steps(j) == t) {
        if (j == 0) insert(0, ts, ts)
        else st.frontiers(j - 1).foreach { case (anchor, done) =>
          if (ts > done && ts - anchor <= windowMicros) insert(j, anchor, ts)
        }
      }
      j -= 1
    }
  }
}

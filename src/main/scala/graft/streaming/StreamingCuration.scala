package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One admitted (id, group) decision row. Like the funnel variants below,
  * the id rides as its string form so any id type streams through; join
  * back on `CAST(id AS STRING)` (or compare stringwise) for payloads. */
final case class CapAdmission(id: String, group: String)

private[streaming] final case class CapCandidate(grp: String, id: String, key: String)

/** A user's funnel progress after a micro-batch advanced it. The user id is
  * carried as its string form so any id type (long, string, UUID) streams
  * through the same operator — the batch funnels group on the native type;
  * here the state store needs one concrete key type. */
final case class FunnelProgress(user_id: String, steps_completed: Int)

private[streaming] final case class FunnelEvent(user_id: String, ts_micros: Long, t: String)

/** One Pareto-frontier entry of the windowed-funnel state: a chain reaching
  * prefix `level`+1 anchored at `anchor` whose last step completed at
  * `done` (micros). */
private[streaming] final case class WfEntry(level: Int, anchor: Long, done: Long)

/** Per-user windowed-funnel state: the achieved high-water mark plus the
  * pruned Pareto frontiers — bounded by the step events inside ONE
  * conversion window (see [[graft.operators.WindowedFunnelDp]]). */
private[streaming] final case class WfState(achieved: Int, entries: Seq[WfEntry])

/** One retention-changelog row: `sign` +1 adds a (user, cohort, offset)
  * cell, -1 retracts one (emitted only when a late-delivered FIRST event
  * moves a user's cohort earlier). Under ordered delivery every sign is +1
  * and each (user, week_offset) appears once; under any delivery order,
  * `sum(sign)` per (cohort_week, week_offset) reproduces the batch cohort
  * table exactly. */
final case class RetentionActivity(
    user_id: String, cohort_week: java.sql.Date, week_offset: Int, sign: Int = 1)

private[streaming] final case class RetentionEvent(user_id: String, week: java.sql.Date)

/** Per-user retention state: the cohort week (epoch day of the user's
  * first-seen week) plus a bitmap of week offsets already emitted —
  * O(weeks/64) longs, no events retained. */
private[streaming] final case class RetState(cohortEpochDay: Long, emitted: Seq[Long])

/** One SCD2 change row: `key` opens a new attribute interval at
  * `effective_from_micros`. The key and attribute tuple ride as canonical
  * JSON of their struct forms (the streaming twins' string-id rule — one
  * concrete state-store key type for any key/attr arity); recover typed
  * values downstream with `from_json`. `effective_to` is implicit: the
  * key's NEXT emitted change closes this row, exactly the lead-walk
  * [[graft.operators.Scd2.scd2FromState]] performs. */
final case class Scd2Change(key_json: String, effective_from_micros: Long, attrs_json: String)

private[streaming] final case class Scd2Obs(key_json: String, ts_micros: Long, attrs_json: String)

/** Per-key SCD2 state: the current attribute tuple (canonical JSON) plus
  * the last-seen observation micros — the same watermark
  * [[graft.operators.Scd2.advanceScd2State]] carries, for the same reason:
  * without it an unchanged observation is indistinguishable from silence,
  * and a late row between them would fabricate an interval. */
private[streaming] final case class Scd2StState(attrsJson: String, lastSeenMicros: Long)

/**
 * Streaming curation admissions — the online counterparts of the batch
 * corpus-curation operators whose decisions must hold ACROSS deliveries,
 * not within one.
 *
 * Design rule shared with [[StreamingCorpusDedup]]: state per key is O(1)
 * and the per-batch work is one shuffle on the group key. No operator here
 * buffers documents in state — admission decisions are emitted immediately
 * and the state retains only counters.
 */
object StreamingCuration {

  /**
   * Per-group cap admission over a stream: admit a document iff fewer than
   * `cap` documents of its `groupCol` value have been admitted across ALL
   * previous micro-batches — the online form of
   * [[graft.operators.CorpusTools.capPerGroup]] (C4/RefinedWeb domain
   * balancing at ingestion time, where a hot domain must stop being
   * admitted the moment its budget is spent).
   *
   * State per group is ONE long (the admitted count) — bounded by the
   * domain vocabulary, no document text ever enters state. Within a
   * micro-batch, candidates are ranked by the same deterministic
   * `md5(seed:id)` order the batch operator uses; across micro-batches
   * admission is first-delivery-wins (the only causally possible online
   * semantics — a document admitted in batch 1 cannot be revoked when a
   * better-hashed one arrives in batch 2). Run over a BATCH frame the
   * operator degenerates to exactly `capPerGroup`'s selection
   * ([[graft.streaming]] StreamingCurationSpec pins both laws).
   *
   * @return (`id`, `group`) admission rows; join back on id for payloads.
   */
  def capPerGroupStream(
      docs: DataFrame,
      groupCol: String,
      idCol: String,
      cap: Int,
      seed: String = "graft-cap"): Dataset[CapAdmission] = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val spark = docs.sparkSession
    import spark.implicits._
    val candidates = docs.select(
        col(groupCol).cast("string").as("grp"),
        col(idCol).cast("string").as("id"),
        md5(concat_ws(":", lit(seed), col(idCol).cast("string"))).as("key"))
      .as[CapCandidate]

    def admit(
        grp: String, rows: Iterator[CapCandidate],
        state: GroupState[Long]): Iterator[CapAdmission] = {
      val already = state.getOption.getOrElse(0L)
      val budget = math.max(0L, cap - already).toInt
      // batch-bounded materialization: rank THIS delivery's candidates by
      // the shared md5 order, take what the remaining budget allows
      val chosen = rows.toSeq.sortBy(r => (r.key, r.id)).take(budget)
      if (chosen.nonEmpty) state.update(already + chosen.size)
      chosen.map(r => CapAdmission(r.id, grp)).iterator
    }

    candidates.groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(admit)
  }

  /**
   * Online funnel tracking — the streaming twin of
   * [[graft.operators.EventAnalytics.funnelSteps]]: per-user state is
   * (current step, timestamp of the event that completed it) — two numbers,
   * O(1) regardless of event volume — advanced by the same greedy
   * strictly-increasing fold the batch operator runs. A row is emitted only
   * for users whose step ADVANCED in the micro-batch (update semantics: the
   * sink keeps the latest row per user).
   *
   * Exactness contract: events are folded in (ts, type) order WITHIN each
   * micro-batch, so the stream equals the batch operator whenever each
   * user's events arrive in event-time order across batches (the common
   * log-shipping case). An event arriving AFTER a later-timestamped event
   * already advanced the fold cannot retro-match — the streaming result is
   * then a valid funnel over the delivery order, not the event-time order;
   * replay through the batch operator when late data matters.
   * StreamingCurationSpec pins stream == batch under ordered delivery.
   */
  def funnelStepsStream(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): Dataset[FunnelProgress] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).cast("string").as("user_id"),
        unix_micros(col(tsCol)).as("ts_micros"),
        col(typeCol).as("t"))
      .as[FunnelEvent]

    def advance(
        user: String, rows: Iterator[FunnelEvent],
        state: GroupState[(Int, Long)]): Iterator[FunnelProgress] = {
      var (step, last) = state.getOption.getOrElse((0, Long.MinValue))
      val before = step
      rows.toSeq.sortBy(e => (e.ts_micros, e.t)).foreach { e =>
        if (step < steps.size && e.t == steps(step) && e.ts_micros > last) {
          step += 1
          last = e.ts_micros
        }
      }
      if (step != before) {
        state.update((step, last))
        Iterator.single(FunnelProgress(user, step))
      } else Iterator.empty
    }

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(advance)
  }

  /**
   * Online windowed funnel — the streaming twin of
   * [[graft.operators.EventAnalytics.windowedFunnelSteps]]: per-user state
   * is the SAME pruned Pareto frontier the batch DP maintains (achieved
   * high-water mark + (anchor, done) pairs per prefix), which
   * [[graft.operators.WindowedFunnelDp]] bounds by the step events inside
   * ONE conversion window — O(windowOccupancy × steps), never the user's
   * history. The DP is a fold, so carrying its state across micro-batches
   * IS the batch computation: under event-time-ordered delivery the stream
   * equals the batch operator exactly (degeneracy law in
   * StreamingCurationSpec).
   *
   * Late events (a smaller-ts event after a larger-ts one was folded) can
   * only UNDER-count, never over-count: the late event still anchors or
   * extends chains whose later links are yet to arrive, but cannot
   * retro-link into already-folded ones. Every emitted value is therefore a
   * real chain (a valid lower bound); replay the batch operator when late
   * data matters. A row is emitted only when a user's achieved prefix
   * ADVANCES (update semantics: keep the latest row per user).
   */
  def windowedFunnelStepsStream(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      windowMicros: Long): Dataset[FunnelProgress] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowMicros > 0, s"windowMicros must be > 0, got $windowMicros")
    val spark = events.sparkSession
    import spark.implicits._
    val stepsIdx = steps.toIndexedSeq
    val k = steps.size
    val typed = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).cast("string").as("user_id"),
        unix_micros(col(tsCol)).as("ts_micros"),
        col(typeCol).as("t"))
      .as[FunnelEvent]

    def advance(
        user: String, rows: Iterator[FunnelEvent],
        state: GroupState[WfState]): Iterator[FunnelProgress] = {
      val st = new graft.operators.WindowedFunnelDp.State(k)
      state.getOption.foreach { s =>
        st.achieved = s.achieved
        s.entries.foreach(e =>
          st.frontiers(e.level) = (e.anchor, e.done) :: st.frontiers(e.level))
      }
      val before = st.achieved
      rows.toSeq.sortBy(e => (e.ts_micros, e.t)).foreach { e =>
        graft.operators.WindowedFunnelDp.observe(st, stepsIdx, windowMicros, e.ts_micros, e.t)
      }
      val entries = st.frontiers.iterator.zipWithIndex.flatMap { case (f, j) =>
        f.map { case (a, d) => WfEntry(j, a, d) }
      }.toSeq
      state.update(WfState(st.achieved, entries))
      if (st.achieved != before) Iterator.single(FunnelProgress(user, st.achieved))
      else Iterator.empty
    }

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(advance)
  }

  /**
   * Online retention cohorts — the streaming twin of
   * [[graft.operators.EventAnalytics.retentionCohorts]]: per-user state is
   * (cohort week = the user's first-seen week, bitmap of week offsets
   * already emitted) — O(weeks/64) longs, no events retained. Each event's
   * week is truncated UPSTREAM with the same `date_trunc("week", ts)` the
   * batch operator uses, so the two can never disagree on week boundaries;
   * the state transition emits one [[RetentionActivity]] row the FIRST time
   * a (user, week_offset) pair is seen. `SELECT cohort_week, week_offset,
   * count(DISTINCT user_id)` over the emitted rows — or a simple count,
   * since emission is already first-time-only — reproduces the batch table
   * (degeneracy law in StreamingCurationSpec).
   *
   * Cohort assignment is EXACT under any delivery order (round 11 — it was
   * first-delivered-week before): when a user's late earlier-week FIRST
   * event arrives, the operator emits cohort-correction rows — one
   * `sign=-1` retraction per already-emitted (old cohort, offset) cell and
   * the matching `sign=+1` rows under the new cohort at shifted offsets
   * (both cohorts are week-truncated, so the shift is a whole number of
   * weeks) — then continues under the moved cohort. Downstream,
   * `sum(sign)` per cell is the exact batch table however late the data;
   * consumers that ignore corrections (filter `sign=1`, keep first) get
   * the old lower-bound behavior. State stays (cohort, offset bitmap):
   * corrections replay from the bitmap, no events are retained.
   */
  def retentionCohortsStream(
      events: DataFrame,
      userCol: String,
      tsCol: String): Dataset[RetentionActivity] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col(userCol).cast("string").as("user_id"),
        to_date(date_trunc("week", col(tsCol))).as("week"))
      .as[RetentionEvent]

    def setOffsets(words: Array[Long]): Seq[Int] =
      words.iterator.zipWithIndex.flatMap { case (w, wi) =>
        (0 until 64).iterator.filter(b => (w & (1L << b)) != 0L).map(wi * 64 + _)
      }.toSeq

    def advance(
        user: String, rows: Iterator[RetentionEvent],
        state: GroupState[RetState]): Iterator[RetentionActivity] = {
      val weeks = rows.map(_.week.toLocalDate.toEpochDay).toSeq.sorted
      val prior = state.getOption.getOrElse(RetState(weeks.head, Seq.empty))
      val out = Seq.newBuilder[RetentionActivity]
      var cohortDay = prior.cohortEpochDay
      var emitted = prior.emitted.toArray
      if (weeks.head < cohortDay) {
        // late FIRST event: the true cohort is earlier — retract every cell
        // emitted under the provisional cohort and re-add it shifted
        val newCohortDay = weeks.head
        val delta = ((cohortDay - newCohortDay) / 7).toInt
        val oldCohort = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(cohortDay))
        val newCohort = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(newCohortDay))
        val offs = setOffsets(emitted)
        offs.foreach { off =>
          out += RetentionActivity(user, oldCohort, off, sign = -1)
          out += RetentionActivity(user, newCohort, off + delta, sign = 1)
        }
        val maxOff = offs.lastOption.map(_ + delta).getOrElse(0)
        val shifted = Array.fill((maxOff >> 6) + 1)(0L)
        offs.foreach { off => shifted((off + delta) >> 6) |= 1L << ((off + delta) & 63) }
        cohortDay = newCohortDay
        emitted = shifted
      }
      val cohort = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(cohortDay))
      weeks.foreach { day =>
        val off = ((day - cohortDay) / 7).toInt // cohortDay <= every week now
        val word = off >> 6
        if (word >= emitted.length) emitted = emitted ++ Array.fill(word - emitted.length + 1)(0L)
        val bit = 1L << (off & 63)
        if ((emitted(word) & bit) == 0L) {
          emitted(word) |= bit
          out += RetentionActivity(user, cohort, off)
        }
      }
      state.update(RetState(cohortDay, emitted.toSeq))
      out.result().iterator
    }

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(advance)
  }

  /**
   * Online SCD2 — the streaming member completing the dimension family's
   * batch + incremental + streaming triple
   * ([[graft.operators.Scd2.buildScd2]] / `advanceScd2State`): each
   * micro-batch folds a key's observations through (current attrs,
   * last-seen watermark) state and emits one [[Scd2Change]] row per
   * ATTRIBUTE CHANGE — an append-only change stream whose lead-walk per
   * key reproduces the batch dimension exactly under event-time-ordered
   * delivery (degeneracy law in StreamingCurationSpec).
   *
   * State per key is O(1) — one attribute tuple and one long, no
   * observation history. Out-of-order observations below the watermark
   * are SKIPPED, the same contract `advanceScd2State` pins: a skipped
   * late row can only omit a historical interval the batch rebuild would
   * recover, never corrupt the chain. Within a micro-batch, observations
   * fold in (ts, attrs) order, deterministic without a tie-break column.
   */
  def scd2Stream(
      observations: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      tsCol: String): Dataset[Scd2Change] = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "need key and attribute columns")
    val spark = observations.sparkSession
    import spark.implicits._
    val typed = observations
      .filter(col(tsCol).isNotNull)
      .select(
        to_json(struct(keyCols.map(col): _*)).as("key_json"),
        unix_micros(col(tsCol)).as("ts_micros"),
        to_json(struct(attrCols.map(col): _*)).as("attrs_json"))
      .as[Scd2Obs]

    def advance(
        key: String, rows: Iterator[Scd2Obs],
        state: GroupState[Scd2StState]): Iterator[Scd2Change] = {
      var cur = state.getOption.orNull
      val out = Seq.newBuilder[Scd2Change]
      rows.toSeq.sortBy(o => (o.ts_micros, o.attrs_json)).foreach { o =>
        if (cur == null || o.ts_micros >= cur.lastSeenMicros) {
          if (cur == null || cur.attrsJson != o.attrs_json)
            out += Scd2Change(key, o.ts_micros, o.attrs_json)
          cur = Scd2StState(o.attrs_json, o.ts_micros)
        } // else: below the watermark — skip
      }
      if (cur != null) state.update(cur)
      out.result().iterator
    }

    typed.groupByKey(_.key_json)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(advance)
  }
}

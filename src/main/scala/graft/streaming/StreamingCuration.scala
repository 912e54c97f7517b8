package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One admitted (id, group) decision row. */
final case class CapAdmission(id: Long, group: String)

private[streaming] final case class CapCandidate(grp: String, id: Long, key: String)

/** A user's funnel progress after a micro-batch advanced it. */
final case class FunnelProgress(user_id: Long, steps_completed: Int)

private[streaming] final case class FunnelEvent(user_id: Long, ts_micros: Long, t: String)

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
        col(idCol).cast("long").as("id"),
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
      .select(col(userCol).cast("long").as("user_id"),
        unix_micros(col(tsCol)).as("ts_micros"),
        col(typeCol).as("t"))
      .as[FunnelEvent]

    def advance(
        user: Long, rows: Iterator[FunnelEvent],
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
}

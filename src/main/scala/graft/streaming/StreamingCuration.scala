package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One admitted (id, group) decision row. */
final case class CapAdmission(id: Long, group: String)

private[streaming] final case class CapCandidate(grp: String, id: Long, key: String)

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
}

package graft.queries

import org.apache.spark.sql.SparkSession

/** Phase timings for the expensive one-time query fixtures, recorded as the
  * fixture builds and surfaced by [[graft.Bench]] inside the `fixtures` JSON
  * block. Motivation (round 8): the driver artifact showed
  * q_dedup_against_index's build at 31.1s where local replays measure 1-3s —
  * with only a single `build_s` figure the anomaly could not be localized
  * from the artifact alone. With per-phase splits, a genuinely hot phase
  * names itself; uniform inflation across phases reads as box contention.
  *
  * Keyed by (session, fixture name) like the fixture caches themselves, so a
  * bench retry's rebuilt fixture reports its own phases, not the first
  * attempt's. */
object FixturePhases {
  private val phases = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Seq[(String, Double)]]()

  def record(s: SparkSession, fixture: String, ps: Seq[(String, Double)]): Unit = {
    phases.put((s, fixture), ps); ()
  }

  def get(s: SparkSession, fixture: String): Option[Seq[(String, Double)]] =
    Option(phases.get((s, fixture)))
}

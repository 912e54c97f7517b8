package graft.streaming

import graft.core.{TableName, VersionTracker}

/**
 * The delivery ledger behind the exactly-once streaming sinks: each
 * delivered unit's identifier rides INSIDE the delivered commit's message,
 * so the ledger entry and the data land in ONE atomic commit — the commit
 * log IS the ledger. No second store means no window where the write
 * landed but the ledger didn't (or vice versa): a crash between the commit
 * and the stream checkpoint replays the batch, the sink reads the newest
 * marker back, and already-delivered units skip.
 *
 * Marker format, appended to the human-readable message:
 * `[graft-delivery <appId>#<unit>]` — `appId` names the SINK (two
 * different pipelines delivering into one table keep separate frontiers),
 * `unit` the delivered unit (a source commit id, a micro-batch id).
 * Neither may contain whitespace, `#` or `]`.
 */
object DeliveryLedger {

  private val Marker = """\[graft-delivery ([^#\]\s]+)#([^\]\s]+)\]""".r

  private def requireToken(what: String, s: String): Unit =
    require(s.nonEmpty && !s.exists(c => c.isWhitespace || c == '#' || c == ']'),
      s"$what '$s' must be non-empty and contain no whitespace, '#' or ']'")

  /** Render a delivery commit's message: `detail` for humans, the marker
    * for the ledger. */
  def message(detail: String, appId: String, unit: String): String = {
    requireToken("delivery appId", appId)
    requireToken("delivery unit", unit)
    s"$detail [graft-delivery $appId#$unit]"
  }

  /** The unit of the NEWEST delivery marker `appId` wrote into `table`'s
    * log, or None when it never delivered. Walks the history newest-first
    * one keyset page at a time, so a sink that delivered recently pays
    * O(commits since its last delivery), not O(history); only a sink that
    * never delivered into a long-history table walks it all (once, at
    * query start). */
  def lastDelivered(tracker: VersionTracker, table: TableName, appId: String): Option[String] = {
    var cursor: Option[String] = None
    var more = true
    var pageSize = 32 // small first page: the file store serves it from the
    // head manifest with zero listings when the marker is near the head
    // (the steady delivery case); deeper walks widen to bound page count
    while (more) {
      val (page, next) = tracker.updatesPage(table, pageSize, cursor)
      pageSize = 256
      page.foreach { m =>
        Marker.findFirstMatchIn(m.message).foreach { mm =>
          if (mm.group(1) == appId) return Some(mm.group(2))
        }
      }
      cursor = next
      more = next.isDefined
    }
    None
  }
}

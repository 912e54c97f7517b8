package graft.examples

import graft.core._
import java.time.Instant

/** Runnable end-to-end demo of the core versioning workflow (no Spark):
  * init → commit partitions → log → rollback → diff → path resolution.
  * `sbt "runMain graft.examples.VersioningDemo"` — also used as the
  * project's verification drive for the core layer. */
object VersioningDemo {
  def main(args: Array[String]): Unit = {
    val storeDir = java.nio.file.Files.createTempDirectory("graft-demo-store-")
    val tracker = new graft.sources.FileBackedVersionTracker(storeDir.toUri)
    val t = TableName.parse("analytics.pageview").fold(e => sys.error(e), identity)
    tracker.initTable(t, isSnapshot = false, UserId("alice"), "init", Instant.now())
    tracker.initTable(t, isSnapshot = false, UserId("bob"), "dup init (no-op)", Instant.now())

    val v1 = Version.generate(); val v2 = Version.generate(); val v3 = Version.generate()
    val day1 = Partition("date", "2019-03-13")
    val day2 = Partition("date", "2019-03-14")
    tracker.commit(t, TableUpdate(UserId("alice"), "write day1+day2", Instant.now(),
      List(TableOperation.AddPartitionVersion(day1, v1), TableOperation.AddPartitionVersion(day2, v2))))
    val c1 = tracker.updates(t).head.id
    tracker.commit(t, TableUpdate(UserId("alice"), "reprocess day2", Instant.now(),
      List(TableOperation.AddPartitionVersion(day2, v3))))

    println("TABLES=" + tracker.tables())
    println("LOG(new->old)=" + tracker.updates(t).map(_.message))
    println("HEAD=" + tracker.currentVersion(t))

    tracker.setCurrentVersion(t, c1)
    val asOf = tracker.currentVersion(t)
    println("ASOF_C1=" + asOf)

    val head = TableState.foldVersion(tracker.tableState(t).updates)
    println("ROLLBACK_OPS=" + Metastore.computeChanges(head, asOf).operations)

    val loc = new java.net.URI("file:/tmp/warehouse/pageview")
    println("DAY1_PATH=" + VersionPaths.pathFor(day1.resolvePath(loc), v1))

    // failure-path probes
    println("PROBE_UNKNOWN_COMMIT=" + (try { tracker.setCurrentVersion(t, CommitId("nope")); "NO ERROR (bug)" }
      catch { case e: Exception => e.getMessage }))
    println("PROBE_UNKNOWN_TABLE=" + (try { tracker.tableState(TableName("no", "such")); "NO ERROR (bug)" }
      catch { case e: Exception => e.getMessage }))
    println("PROBE_BAD_PARTITION=" + Partition.parse("not a partition"))
    println("PROBE_BAD_VERSION=" + Version.parse("garbage"))
    println("PROBE_EMPTY_VERSION=" + Version.parse(""))

    // persistence probe: a fresh tracker over the same directory sees the log
    val reopened = new graft.sources.FileBackedVersionTracker(storeDir.toUri)
    println("REOPENED_LOG=" + reopened.updates(t).map(_.message))
    println("REOPENED_HEAD=" + (reopened.currentVersion(t) == asOf))
  }
}

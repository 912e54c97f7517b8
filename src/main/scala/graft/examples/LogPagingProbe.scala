package graft.examples

import graft.core._
import graft.sources.{FileBackedVersionTracker, JdbcVersionTracker}

import java.time.Instant

/**
 * Measures what the round-6 paged history API buys on a LONG log — the
 * streaming-sink shape (one commit per micro-batch, 5,000 commits here):
 * full `updates(t)` materialization vs one `updates(t, 20, 0)` page vs
 * `headCommit`-style single-commit reads, on both persistent stores.
 * Numbers land in SCALE.md; run with tools/run.sh (no Spark session needed).
 */
object LogPagingProbe {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e3 / 1e3) // ms
  }

  private def drive(name: String, tr: VersionTracker, commits: Int): Unit = {
    val t = TableName("probe", "sink")
    tr.initTable(t, isSnapshot = false, UserId("p"), "init", Instant.now())
    val p = Partition("day", "2026-01-01")
    val (_, tLoad) = time {
      (1 to commits).foreach { i =>
        tr.commit(t, TableUpdate(UserId("p"), s"batch $i", Instant.now(),
          List(TableOperation.AddPartitionVersion(p, Version.generate()))))
      }
    }
    // warm OS caches once so full-vs-paged compares I/O shape, not cold cache
    tr.updates(t)
    val (full, tFull) = time(tr.updates(t))
    val (page, tPage) = time(tr.updates(t, 20, 0))
    val (_, tHead) = time(tr.updates(t, 1, 0))
    val (ref, tRef) = time(tr.currentRef(t))
    val deepOffset = math.max(0, commits - 10)
    val (deep, tDeep) = time(tr.updates(t, 20, deepOffset))
    println(f"$name commits=${full.size} load=${tLoad / 1000}%.1fs " +
      f"full=$tFull%.0fms page20=$tPage%.1fms head=$tHead%.1fms ref=$tRef%.2fms deepPage=$tDeep%.1fms " +
      s"pageOk=${page == full.take(20)} deepOk=${deep == full.slice(deepOffset, deepOffset + 20)} " +
      s"refOk=${ref == full.head.id}")
  }

  def main(args: Array[String]): Unit = {
    val commits = args.headOption.map(_.toInt).getOrElse(5000)
    val root = java.nio.file.Files.createTempDirectory("graft-logprobe-")
    drive("FILE", new FileBackedVersionTracker(root.resolve("store").toUri), commits)
    drive("JDBC", new JdbcVersionTracker(
      s"jdbc:derby:${root.resolve("db")};create=true"), commits)
  }
}

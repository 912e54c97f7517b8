package graft.examples

import graft.core._
import graft.sources.{ChroniclesExport, FileBackedVersionTracker, JdbcVersionTracker}

import java.nio.file.Files
import java.time.Instant

/**
 * Commit-LOG scale probe (no Spark needed — the versioning layer is pure
 * driver code): builds a file-backed table with a streaming-sink-sized
 * history, then measures the paths a 100k-commit log exercises —
 * bounded-fold state reads, keyset log pages, the ascending full-commit
 * pages, and the streamed export → read-back → migrate interop cycle.
 * Alongside wall time it prints the tracker's commit-document parse counter
 * around each phase: the O(tail)/O(page) claims of SCALE.md §1 as measured
 * integers rather than prose.
 *
 * Usage: `sbt "runMain graft.examples.HistoryScaleProbe [nCommits] [nJdbc]"`
 * (defaults 5000 / 2000). Prints `NAME=value` lines.
 */
object HistoryScaleProbe {

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(5000)
    val nJdbc = args.lift(1).map(_.toInt).getOrElse(2000)
    val table = TableName("probe", "sink")
    val user = UserId("probe")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // --- file store: n commits, default checkpoint cadence ---
    val root = Files.createTempDirectory("graft-history-probe-")
    val tr = new FileBackedVersionTracker(root.toUri)
    tr.initTable(table, isSnapshot = false, user, "init", Instant.now())
    val (_, buildS) = timed {
      var i = 0
      while (i < n) {
        tr.commit(table, TableUpdate(user, s"b$i", Instant.now(),
          List(TableOperation.AddPartitionVersion(
            Partition("day", f"d${i % 365}%03d"), Version.generate()))))
        i += 1
      }
    }
    println(f"FILE_COMMITS=$n BUILD_S=$buildS%.2f COMMITS_PER_S=${n / buildS}%.0f")

    // state read via the persisted fold document: O(tail), not O(n)
    val p0 = tr.commitFilesParsed.get()
    val (_, foldS) = timed(tr.currentVersion(table))
    println(f"CURRENT_VERSION_S=$foldS%.3f PARSES=${tr.commitFilesParsed.get() - p0}")

    // one CLI-log page: O(page) document parses
    val p1 = tr.commitFilesParsed.get()
    val (page, pageS) = timed(tr.updatesPage(table, 50, None))
    println(f"LOG_PAGE50_S=$pageS%.3f ROWS=${page._1.size} PARSES=${tr.commitFilesParsed.get() - p1}")

    // ascending full-commit walk (what export/replication consume): every
    // commit parsed exactly once across the walk, O(page) held at a time
    val p2 = tr.commitFilesParsed.get()
    val (walked, walkS) = timed {
      var count = 0L
      tr.forEachCommitAsc(table, 1024)(_ => count += 1)
      count
    }
    println(f"ASC_WALK_S=$walkS%.2f COMMITS=$walked PARSES=${tr.commitFilesParsed.get() - p2}")

    // streamed export (validate pass + write pass = exactly 2n parses)
    val dest = Files.createTempDirectory("graft-history-probe-export-")
    val p3 = tr.commitFilesParsed.get()
    val (_, exportS) = timed(ChroniclesExport.exportTable(tr, table, dest.toUri))
    println(f"EXPORT_S=$exportS%.2f PARSES=${tr.commitFilesParsed.get() - p3} " +
      f"COMMITS_PER_S=${n / exportS}%.0f")

    // read the exported (reference-layout) store back and MIGRATE it to
    // graft layout — the other streamed bulk path
    val back = new FileBackedVersionTracker(dest.toUri)
    val (migrated, migrateS) = timed(back.migrateChroniclesTables())
    val (head, headS) = timed(back.currentRef(table))
    println(f"MIGRATE_S=$migrateS%.2f TABLES=${migrated.size} " +
      f"MIGRATED_HEAD_OK=${head == tr.currentRef(table)} HEAD_READ_S=$headS%.4f")

    // --- JDBC store: same shapes over SQL ---
    val db = Files.createTempDirectory("graft-history-probe-jdbc-").resolve("db")
    val jt = new JdbcVersionTracker(s"jdbc:derby:$db;create=true")
    jt.initTable(table, isSnapshot = false, user, "init", Instant.now())
    val (_, jBuildS) = timed {
      var i = 0
      while (i < nJdbc) {
        jt.commit(table, TableUpdate(user, s"b$i", Instant.now(),
          List(TableOperation.AddPartitionVersion(
            Partition("day", f"d${i % 365}%03d"), Version.generate()))))
        i += 1
      }
    }
    val r0 = jt.historyRowsScanned
    val (_, jFoldS) = timed(jt.currentVersion(table))
    val foldRows = jt.historyRowsScanned - r0
    val r1 = jt.historyRowsScanned
    val (jWalked, jWalkS) = timed {
      var count = 0L
      jt.forEachCommitAsc(table, 1024)(_ => count += 1)
      count
    }
    println(f"JDBC_COMMITS=$nJdbc JDBC_BUILD_S=$jBuildS%.2f " +
      f"JDBC_FOLD_S=$jFoldS%.3f JDBC_FOLD_ROWS=$foldRows " +
      f"JDBC_ASC_WALK_S=$jWalkS%.2f JDBC_WALK_COMMITS=$jWalked " +
      f"JDBC_WALK_ROWS=${jt.historyRowsScanned - r1}")
    jt.close()
  }
}

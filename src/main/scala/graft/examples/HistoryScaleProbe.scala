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
        val base = List(TableOperation.AddPartitionVersion(
          Partition("day", f"d${i % 365}%03d"), Version.generate()))
        // sprinkle schema records through the history so the headState fast
        // path has real extras to resolve (DV base bindings are appended
        // AFTER the export phases below — chronicles export can't represent
        // them, by design)
        val ops =
          if (i % 1000 == 0) TableOperation.SetTableSchema(s"""{"rev":$i}""") :: base
          else base
        tr.commit(table, TableUpdate(user, s"b$i", Instant.now(), ops))
        i += 1
      }
    }
    println(f"FILE_COMMITS=$n BUILD_S=$buildS%.2f COMMITS_PER_S=${n / buildS}%.0f")

    // state read via the persisted fold document: O(tail), not O(n)
    val p0 = tr.commitFilesParsed.get()
    val (_, foldS) = timed(tr.currentVersion(table))
    println(f"CURRENT_VERSION_S=$foldS%.3f PARSES=${tr.commitFilesParsed.get() - p0}")

    // the RESOLVED head state (version + recorded schema + DV bases) — what
    // every mergeSchema read plans from — also O(tail) via the fold extras,
    // vs the full-history materialization tableState pays
    val pH = tr.commitFilesParsed.get()
    val (hs, hsS) = timed(tr.headState(table))
    println(f"HEAD_STATE_S=$hsS%.3f PARSES=${tr.commitFilesParsed.get() - pH} " +
      f"SCHEMA_RESOLVED=${hs.schemaJson.isDefined} BASES=${hs.versionBases.size}")
    val (st0, stS) = timed(tr.tableState(table))
    println(f"TABLE_STATE_S=$stS%.3f HEAD_STATE_SPEEDUP=${stS / hsS}%.0f " +
      f"HEAD_STATE_EXACT=${hs.version == st0.currentTableVersion &&
        hs.schemaJson == st0.currentSchemaJson && hs.versionBases == st0.versionBases}")

    // one CLI-log page: O(page) document parses
    val p1 = tr.commitFilesParsed.get()
    val (page, pageS) = timed(tr.updatesPage(table, 50, None))
    println(f"LOG_PAGE50_S=$pageS%.3f ROWS=${page._1.size} PARSES=${tr.commitFilesParsed.get() - p1}")

    // manifest-served log reads (round 16): a tail-sized first page and the
    // CDC parent lookup of the newest commit — both must do ZERO directory
    // listings on a fresh tracker however long the history
    val rM = new FileBackedVersionTracker(root.toUri)
    val (pageM, pageMS) = timed(rM.updatesPage(table, 8, None))
    val pagedListings = rM.directoryListings.get()
    val newestId = pageM._1.head.id
    val (parent, parentS) = timed(rM.parentCommit(table, newestId))
    println(f"LOG_PAGE8_S=$pageMS%.4f PARENT_COMMIT_S=$parentS%.4f " +
      f"LISTINGS=${rM.directoryListings.get()} PARENT_OK=${parent.isDefined} " +
      f"PAGE_LISTINGS=$pagedListings")

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

    // DV base bindings on top of the long history: headState still resolves
    // them O(tail) — the retention/read inputs of a merge-on-read table
    // never pay a history replay either
    (0 until 20).foreach { i =>
      val m = Version.generateDeleteMarker()
      tr.commit(table, TableUpdate(user, s"dv$i", Instant.now(), List(
        TableOperation.AddPartitionVersion(Partition("day", f"d$i%03d"), m),
        TableOperation.SetVersionBase(Partition("day", f"d$i%03d"), m, Version.generate()))))
    }
    val pD = tr.commitFilesParsed.get()
    val (hsDv, hsDvS) = timed(tr.headState(table))
    println(f"HEAD_STATE_DV_S=$hsDvS%.3f PARSES=${tr.commitFilesParsed.get() - pD} " +
      f"BASES=${hsDv.versionBases.size} " +
      f"EXACT=${hsDv.versionBases == tr.tableState(table).versionBases}")

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
    val rH = jt.historyRowsScanned
    val (jhs, jHsS) = timed(jt.headState(table))
    println(f"JDBC_HEAD_STATE_S=$jHsS%.3f JDBC_HEAD_STATE_ROWS=${jt.historyRowsScanned - rH} " +
      f"JDBC_HEAD_OK=${jhs.version == jt.tableState(table).currentTableVersion}")
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

package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files
import java.time.Instant

/**
 * Write-back interop: a graft history exported by [[ChroniclesExport]] must
 * form a store in the reference's layout, readable back (by graft's own
 * chronicles-compat reader, which is pinned against the reference's golden
 * fixtures in ChroniclesCompatSpec) with identical history and head.
 */
class ChroniclesExportSpec extends AnyFlatSpec with Matchers {

  private val table = TableName("db", "events")
  private val mapper = new ObjectMapper()

  private def newFileTracker(): (FileBackedVersionTracker, java.nio.file.Path) = {
    val root = Files.createTempDirectory("graft-export-src-")
    (new FileBackedVersionTracker(root.toUri), root)
  }

  /** init + two partition commits + a remove, then check out the middle commit. */
  private def populate(tracker: VersionTracker): (Version, Version) = {
    val v1 = Version.generate()
    val v2 = Version.generate()
    tracker.initTable(table, isSnapshot = false, UserId("u1"), "init", Instant.parse("2024-01-01T00:00:00Z"))
    tracker.commit(table, TableUpdate(UserId("u2"), "day 1", Instant.parse("2024-01-02T00:00:00.123Z"),
      List(TableOperation.AddPartitionVersion(Partition("date", "2024-01-01"), v1))))
    tracker.commit(table, TableUpdate(UserId("u3"), "day 2 + drop day 1", Instant.parse("2024-01-03T00:00:00Z"),
      List(
        TableOperation.AddPartitionVersion(Partition("date", "2024-01-02"), v2),
        TableOperation.RemovePartition(Partition("date", "2024-01-01")))))
    (v1, v2)
  }

  "ChroniclesExport" should "round-trip a file-backed history through the reference layout" in {
    val (src, _) = newFileTracker()
    val (v1, _) = populate(src)
    // head at the MIDDLE commit: export must carry the checked-out pointer
    val midCommit = src.tableState(table).updates(1).metadata.id
    src.setCurrentVersion(table, midCommit)

    val dest = Files.createTempDirectory("graft-export-dst-")
    ChroniclesExport.exportTable(src, table, dest.toUri)

    // layout written as the reference expects
    val dir = dest.resolve("_chronicles_table_db.events")
    Files.exists(dir.resolve("table-metadata")) shouldBe true
    Files.exists(dir.resolve("head_ref")) shouldBe true
    val commitFiles = Files.list(dir).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(commitFiles).asScala
      .map(_.getFileName.toString).filter(_.startsWith("table_update_")).toList.sorted
    names should have length 3
    all(names) should fullyMatch regex "table_update_\\d{4}-\\d{2}-\\d{2}T\\d{2}-\\d{2}-\\d{2}\\.\\d{3}"

    // ...and graft's chronicles-layout reader reconstructs the identical state
    val back = new FileBackedVersionTracker(dest.toUri)
    back.tables() shouldBe List(table)
    val orig = src.tableState(table)
    val read = back.tableState(table)
    read.updates shouldBe orig.updates
    read.currentVersion shouldBe midCommit
    back.isSnapshotTable(table) shouldBe false
    // the checked-out head resolves to the mid-commit's view
    back.currentVersion(table) shouldBe PartitionedTableVersion(
      Map(Partition("date", "2024-01-01") -> v1))
  }

  it should "export a JDBC-backed history the same way (tracker-agnostic)" in {
    val db = Files.createTempDirectory("graft-export-jdbc-").resolve("db")
    val src = new JdbcVersionTracker(s"jdbc:derby:$db;create=true")
    populate(src)

    val dest = Files.createTempDirectory("graft-export-dst2-")
    ChroniclesExport.exportAllTables(src, dest.toUri) shouldBe List(table)

    val back = new FileBackedVersionTracker(dest.toUri)
    back.tableState(table).updates shouldBe src.tableState(table).updates
    back.currentVersion(table) shouldBe src.currentVersion(table)
    src.close()
  }

  it should "render the reference's snake_case commit document" in {
    val v = Version.generate()
    val json = ChroniclesExport.chroniclesUpdateJson(TableUpdate(
      TableUpdateMetadata(CommitId("c-1"), UserId("me"), "msg", Instant.parse("2021-12-03T10:15:30.01Z")),
      List(
        TableOperation.InitTable(table, isSnapshot = true),
        TableOperation.AddTableVersion(v),
        TableOperation.AddPartitionVersion(Partition("date", "2024-01-01"), v),
        TableOperation.RemovePartition(Partition("date", "2024-01-01")))))
    val n = mapper.readTree(json)
    n.get("commit_id").asText shouldBe "c-1"
    n.get("user_id").asText shouldBe "me"
    n.get("message").asText shouldBe "msg"
    n.get("timestamp").asText shouldBe "2021-12-03T10:15:30.010Z"
    n.has("formatVersion") shouldBe false // graft marker must NOT leak
    val ops = n.get("operations")
    ops.get(0).get("type").asText shouldBe "init-table"
    ops.get(0).get("table_name").asText shouldBe "db.events"
    ops.get(0).get("is_snapshot").asBoolean shouldBe true
    ops.get(1).get("version").asText shouldBe v.label
    ops.get(2).get("partition").asText shouldBe "date=2024-01-01"
    ops.get(3).get("type").asText shouldBe "remove-partition"
  }

  it should "keep filenames unique and ascending for same-millisecond commits" in {
    val (src, _) = newFileTracker()
    val ts = Instant.parse("2024-06-01T00:00:00Z")
    src.initTable(table, isSnapshot = false, UserId("u"), "init", ts)
    (1 to 3).foreach { i =>
      src.commit(table, TableUpdate(UserId("u"), s"c$i", ts, // identical timestamps
        List(TableOperation.AddPartitionVersion(Partition("date", s"2024-06-0$i"), Version.generate()))))
    }
    val dest = Files.createTempDirectory("graft-export-dst3-")
    ChroniclesExport.exportTable(src, table, dest.toUri)
    val back = new FileBackedVersionTracker(dest.toUri)
    back.tableState(table).updates.map(_.metadata.message) shouldBe
      src.tableState(table).updates.map(_.metadata.message)
  }

  it should "refuse partitions the raw chronicles encoding cannot represent" in {
    val (src, _) = newFileTracker()
    src.initTable(table, isSnapshot = false, UserId("u"), "init", Instant.now())
    src.commit(table, TableUpdate(UserId("u"), "weird", Instant.now(),
      List(TableOperation.AddPartitionVersion(Partition("k", "a=b"), Version.generate()))))
    val dest = Files.createTempDirectory("graft-export-dst4-")
    val e = intercept[IllegalArgumentException] {
      ChroniclesExport.exportTable(src, table, dest.toUri)
    }
    e.getMessage should include("cannot be represented")
  }

  it should "refuse an existing destination and unknown tables" in {
    val (src, _) = newFileTracker()
    populate(src)
    val dest = Files.createTempDirectory("graft-export-dst5-")
    ChroniclesExport.exportTable(src, table, dest.toUri)
    intercept[IllegalStateException] {
      ChroniclesExport.exportTable(src, table, dest.toUri)
    }.getMessage should include("already exists")
    intercept[UnknownTableError] {
      ChroniclesExport.exportTable(src, TableName("no", "such"), dest.toUri)
    }
  }

  it should "stream the history in pages: no tableState materialization, O(page) parses per call" in {
    val root = Files.createTempDirectory("graft-export-stream-")
    val raw = new FileBackedVersionTracker(root.toUri)
    raw.initTable(table, isSnapshot = false, UserId("u"), "init", Instant.parse("2024-01-01T00:00:00Z"))
    val n = 25
    (1 to n).foreach { i =>
      raw.commit(table, TableUpdate(UserId("u"), s"c$i", Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i),
        List(TableOperation.AddPartitionVersion(Partition("date", f"2024-02-$i%02d"), Version.generate()))))
    }
    // a view of the tracker that REFUSES full-history materialization: any
    // export code path that falls back to tableState fails the test outright
    val src = new VersionTracker {
      override def tableState(t: TableName): TableState =
        throw new AssertionError("export must not materialize the full history via tableState")
      override def currentRef(t: TableName): CommitId = raw.currentRef(t)
      override def isSnapshotTable(t: TableName): Boolean = raw.isSnapshotTable(t)
      override def commitsPageAsc(t: TableName, limit: Int, after: Option[String]) =
        raw.commitsPageAsc(t, limit, after)
      def initTable(t: TableName, isSnapshot: Boolean, u: UserId, m: String, ts: Instant): Unit = ???
      def tables(): List[TableName] = raw.tables()
      def commit(t: TableName, u: TableUpdate): Unit = ???
      def commitIf(t: TableName, u: TableUpdate, h: CommitId): Unit = ???
      def setCurrentVersion(t: TableName, id: CommitId): Unit = ???
      def tags(t: TableName): List[(String, CommitId)] = raw.tags(t)
      def createTag(t: TableName, name: String, at: CommitId): Unit = ???
      def deleteTag(t: TableName, name: String): Unit = ???
    }
    val dest = Files.createTempDirectory("graft-export-stream-dst-")
    ChroniclesExport.exportTable(src, table, dest.toUri, pageSize = 4)

    // exactly two paged walks (validate + write): every commit document is
    // parsed twice and nothing else — the I/O-counter pin for the O(page)
    // peak (a full materialization would show up as extra parses here, and
    // as the AssertionError above)
    raw.commitFilesParsed.get() shouldBe 2L * (n + 1)

    // and the export is still byte-faithful: reading it back reconstructs
    // the identical history and head
    val back = new FileBackedVersionTracker(dest.toUri)
    val plain = new FileBackedVersionTracker(root.toUri) // un-sabotaged reader
    back.tableState(table).updates shouldBe plain.tableState(table).updates
    back.tableState(table).currentVersion shouldBe plain.tableState(table).currentVersion
  }

  "syncTable" should "append only the missing commits and move head_ref (O(delta) replication)" in {
    val (src, _) = newFileTracker()
    populate(src) // init + 2 commits
    val dest = Files.createTempDirectory("graft-sync-dst-")
    // first sync of an absent destination = fresh export, full history
    ChroniclesExport.syncTable(src, table, dest.toUri) shouldBe 3L
    val filesAfterExport = Files.list(dest.resolve("_chronicles_table_db.events")).count()

    // source moves on: two more commits
    val v4 = Version.generate()
    src.commit(table, TableUpdate(UserId("u4"), "day 3", Instant.parse("2024-01-04T00:00:00Z"),
      List(TableOperation.AddPartitionVersion(Partition("date", "2024-01-03"), v4))))
    src.commit(table, TableUpdate(UserId("u5"), "day 4", Instant.parse("2024-01-05T00:00:00Z"),
      List(TableOperation.AddPartitionVersion(Partition("date", "2024-01-04"), Version.generate()))))

    // catch-up appends exactly the delta...
    ChroniclesExport.syncTable(src, table, dest.toUri) shouldBe 2L
    Files.list(dest.resolve("_chronicles_table_db.events")).count() shouldBe filesAfterExport + 2
    // ...and the replica reconstructs the identical history and head
    val back = new FileBackedVersionTracker(dest.toUri)
    back.tableState(table).updates shouldBe src.tableState(table).updates
    back.tableState(table).currentVersion shouldBe src.tableState(table).currentVersion

    // idempotent: an up-to-date replica syncs zero commits
    ChroniclesExport.syncTable(src, table, dest.toUri) shouldBe 0L
    back.tableState(table).updates shouldBe src.tableState(table).updates
  }

  it should "replicate a checked-out head without losing newer commits" in {
    val (src, _) = newFileTracker()
    populate(src)
    val dest = Files.createTempDirectory("graft-sync-dst2-")
    ChroniclesExport.syncTable(src, table, dest.toUri)
    // source checks out the middle commit: no new commits, but the head moved
    val mid = src.tableState(table).updates(1).metadata.id
    src.setCurrentVersion(table, mid)
    ChroniclesExport.syncTable(src, table, dest.toUri) shouldBe 0L
    val back = new FileBackedVersionTracker(dest.toUri)
    back.tableState(table).currentVersion shouldBe mid
    back.tableState(table).updates should have size 3 // full history still there
  }

  it should "stay a faithful readable prefix while racing a live writer" in {
    val (src, _) = newFileTracker()
    src.initTable(table, isSnapshot = false, UserId("u"), "init", Instant.now())
    val dest = Files.createTempDirectory("graft-sync-race-")
    val n = 30
    val writer = new Thread(() => {
      (1 to n).foreach { i =>
        src.commit(table, TableUpdate(UserId("w"), s"c$i", Instant.now(),
          List(TableOperation.AddPartitionVersion(Partition("date", f"2024-03-$i%02d"), Version.generate()))))
        Thread.sleep(5)
      }
    })
    writer.start()
    try {
      // repeated catch-ups while the writer commits: after EVERY sync the
      // replica must read back as a faithful prefix of the (later-read)
      // source — ids in order, head resolvable — never a torn or gapped state
      (1 to 8).foreach { _ =>
        ChroniclesExport.syncTable(src, table, dest.toUri)
        val replica = new FileBackedVersionTracker(dest.toUri)
        val rIds = replica.tableState(table).updates.map(_.metadata.id)
        val sIds = src.tableState(table).updates.map(_.metadata.id)
        rIds shouldBe sIds.take(rIds.size)
        noException should be thrownBy replica.currentVersion(table)
        Thread.sleep(10)
      }
    } finally writer.join()
    // quiesced: one final catch-up converges to exact equality
    ChroniclesExport.syncTable(src, table, dest.toUri)
    val replica = new FileBackedVersionTracker(dest.toUri)
    replica.tableState(table).updates shouldBe src.tableState(table).updates
    replica.tableState(table).currentVersion shouldBe src.tableState(table).currentVersion
  }

  it should "repair a head-less replica (crashed export) instead of wedging it" in {
    val (src, _) = newFileTracker()
    populate(src)
    val dest = Files.createTempDirectory("graft-sync-dst5-")
    ChroniclesExport.syncTable(src, table, dest.toUri)
    val dir = dest.resolve("_chronicles_table_db.events")
    // simulate the crash window: export/sync write head_ref LAST, so a
    // crashed run leaves commit files with no head — the replica is
    // unreadable until repaired
    Files.delete(dir.resolve("head_ref"))
    src.commit(table, TableUpdate(UserId("u"), "post-crash", Instant.now(),
      List(TableOperation.AddPartitionVersion(Partition("date", "2024-02-02"), Version.generate()))))
    // the next sync appends the delta AND recreates the head: converged
    ChroniclesExport.syncTable(src, table, dest.toUri) shouldBe 1L
    val back = new FileBackedVersionTracker(dest.toUri)
    back.tableState(table).updates shouldBe src.tableState(table).updates
    back.tableState(table).currentVersion shouldBe src.tableState(table).currentVersion
  }

  it should "drop a stale Hadoop checksum sidecar when replacing head_ref" in {
    val (src, _) = newFileTracker()
    populate(src)
    val dest = Files.createTempDirectory("graft-sync-dst6-")
    ChroniclesExport.syncTable(src, table, dest.toUri)
    val dir = dest.resolve("_chronicles_table_db.events")
    // a pre-round-8 export (Hadoop ChecksumFileSystem writes) left a crc
    // sidecar for head_ref; after an NIO in-place replace it would be STALE,
    // and Hadoop-layer readers — the reference implementation — fail a read
    // whose crc mismatches (a MISSING crc merely skips verification)
    val crc = dir.resolve(".head_ref.crc")
    Files.write(crc, Array[Byte](1, 2, 3, 4))
    src.commit(table, TableUpdate(UserId("u"), "move head", Instant.now(),
      List(TableOperation.AddPartitionVersion(Partition("date", "2024-02-03"), Version.generate()))))
    ChroniclesExport.syncTable(src, table, dest.toUri) shouldBe 1L
    Files.exists(crc) shouldBe false // stale sidecar removed with the swap
    // and a Hadoop-layer (checksummed) reader can open the store cleanly
    val hfs = org.apache.hadoop.fs.FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
    val in = hfs.open(new org.apache.hadoop.fs.Path(dir.resolve("head_ref").toUri))
    try new String(in.readAllBytes()) should include(src.currentRef(table).id)
    finally in.close()
  }

  it should "refuse a replica that is not a faithful prefix, before appending anything" in {
    val (src, _) = newFileTracker()
    populate(src)
    val dest = Files.createTempDirectory("graft-sync-dst4-")
    ChroniclesExport.syncTable(src, table, dest.toUri)
    // a replica commit file vanishes mid-history (hand-pruned replica — the
    // same signature a clock-skewed below-sync-point source commit leaves:
    // prefix counts disagree)
    val dir = dest.resolve("_chronicles_table_db.events")
    import scala.jdk.CollectionConverters._
    val middle = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("table_update_")).toList
      .sortBy(_.getFileName.toString).apply(1)
    Files.delete(middle)
    src.commit(table, TableUpdate(UserId("u"), "more", Instant.now(),
      List(TableOperation.AddPartitionVersion(Partition("date", "2024-02-01"), Version.generate()))))
    val before = Files.list(dir).count()
    val e = intercept[IllegalStateException](ChroniclesExport.syncTable(src, table, dest.toUri))
    e.getMessage should include("not a faithful prefix")
    Files.list(dir).count() shouldBe before // nothing appended
  }

  it should "refuse a diverged destination instead of appending onto foreign history" in {
    val (src, _) = newFileTracker()
    populate(src)
    val dest = Files.createTempDirectory("graft-sync-dst3-")
    ChroniclesExport.syncTable(src, table, dest.toUri)
    // a foreign commit file, newer than everything legitimate, whose id the
    // source has never heard of
    val dir = dest.resolve("_chronicles_table_db.events")
    val foreign = dir.resolve("table_update_2030-01-01T00-00-00.000")
    Files.write(foreign, ChroniclesExport.chroniclesUpdateJson(TableUpdate(
      TableUpdateMetadata(CommitId("not-ours"), UserId("x"), "foreign", Instant.parse("2030-01-01T00:00:00Z")),
      Nil)).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.setLastModifiedTime(foreign,
      java.nio.file.attribute.FileTime.fromMillis(Instant.parse("2030-01-01T00:00:00Z").toEpochMilli))
    val e = intercept[IllegalStateException](ChroniclesExport.syncTable(src, table, dest.toUri))
    e.getMessage should include("diverged")
  }

  it should "export all tables or none: a failing table aborts before anything lands" in {
    val (src, _) = newFileTracker()
    populate(src) // 'db.events' — exportable
    // second table with an unrepresentable partition value
    val bad = TableName("db", "zz_bad") // sorts AFTER db.events in tables()
    src.initTable(bad, isSnapshot = false, UserId("u"), "init", Instant.now())
    src.commit(bad, TableUpdate(UserId("u"), "weird", Instant.now(),
      List(TableOperation.AddPartitionVersion(Partition("k", "a=b"), Version.generate()))))
    val dest = Files.createTempDirectory("graft-export-dst6-")
    intercept[IllegalArgumentException] {
      ChroniclesExport.exportAllTables(src, dest.toUri)
    }.getMessage should include("cannot be represented")
    // nothing landed — not even the valid table that sorts first
    Option(dest.toFile.listFiles()).getOrElse(Array.empty) shouldBe empty

    // same all-or-nothing for a pre-existing destination dir: two GOOD
    // tables, the second one's destination already taken
    val (src2, _) = newFileTracker()
    populate(src2)
    val other = TableName("db", "zz_other")
    src2.initTable(other, isSnapshot = true, UserId("u"), "init", Instant.now())
    val dest2 = Files.createTempDirectory("graft-export-dst7-")
    Files.createDirectory(dest2.resolve("_chronicles_table_db.zz_other"))
    intercept[IllegalStateException] {
      ChroniclesExport.exportAllTables(src2, dest2.toUri)
    }.getMessage should include("no table was exported")
    dest2.resolve("_chronicles_table_db.events").toFile.exists() shouldBe false
  }
}

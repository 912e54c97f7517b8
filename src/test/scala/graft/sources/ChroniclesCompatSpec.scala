package graft.sources

import graft.core._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.nio.charset.StandardCharsets
import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Path => JPath}
import java.time.Instant

/**
 * Read-only interop with stores written by the reference implementation:
 * directory layout `_chronicles_table_<schema>.<table>/` with `table-metadata`,
 * `head_ref`, and suffix-less `table_update_*` files in the chronicles wire
 * format, ordered by (mtime, name)
 * (reference `FileBackedVersionTracker.scala:90-99,140-176`).
 */
class ChroniclesCompatSpec extends AnyFlatSpec with Matchers {

  private val table = TableName("db", "events")
  private val v1 = Version.generate()
  private val v2 = Version.generate()
  private val v3 = Version.generate()

  /** Write a two-commit chronicles-layout store by hand and return its root. */
  private def buildChroniclesStore(): JPath = {
    val root = Files.createTempDirectory("graft-chron-")
    val dir = Files.createDirectory(root.resolve("_chronicles_table_db.events"))
    def put(name: String, content: String, mtimeMs: Long): Unit = {
      val p = dir.resolve(name)
      Files.write(p, content.getBytes(StandardCharsets.UTF_8))
      Files.setLastModifiedTime(p, FileTime.fromMillis(mtimeMs))
    }
    put("table-metadata", """{ "is_snapshot" : false }""", 1000)
    put("head_ref", """{ "head_ref" : "commit-2" }""", 3000)
    put(
      "table_update_2021-01-01T00-00-00.000",
      s"""{
         |  "commit_id" : "commit-1",
         |  "user_id" : "ref-user",
         |  "message" : "init",
         |  "timestamp" : "2021-01-01T00:00:00Z",
         |  "operations" : [
         |    { "type" : "init-table", "table_name" : "db.events", "is_snapshot" : false },
         |    { "type" : "add-partition-version", "partition" : "date=2021-01-01", "version" : "${v1.label}" }
         |  ]
         |}""".stripMargin,
      1000)
    put(
      "table_update_2021-01-02T00-00-00.000",
      s"""{
         |  "commit_id" : "commit-2",
         |  "user_id" : "ref-user",
         |  "message" : "overwrite day 1, add day 2",
         |  "timestamp" : "2021-01-02T00:00:00Z",
         |  "operations" : [
         |    { "type" : "add-partition-version", "partition" : "date=2021-01-01", "version" : "${v2.label}" },
         |    { "type" : "add-partition-version", "partition" : "date=2021-01-02", "version" : "${v3.label}" }
         |  ]
         |}""".stripMargin,
      2000)
    root
  }

  "FileBackedVersionTracker" should "read a reference-layout store in place" in {
    val root = buildChroniclesStore()
    val tracker = new FileBackedVersionTracker(root.toUri)

    tracker.tables() shouldBe List(table)
    tracker.isSnapshotTable(table) shouldBe false

    val st = tracker.tableState(table)
    st.currentVersion shouldBe CommitId("commit-2")
    st.updates.map(_.metadata.id.id) shouldBe List("commit-1", "commit-2")

    tracker.currentVersion(table) shouldBe PartitionedTableVersion(Map(
      Partition("date", "2021-01-01") -> v2,
      Partition("date", "2021-01-02") -> v3))
  }

  it should "page the log of a reference-layout store in (mtime, name) order" in {
    val root = buildChroniclesStore()
    val tracker = new FileBackedVersionTracker(root.toUri)
    val full = tracker.updates(table) // newest first: commit-2, commit-1
    full.map(_.id.id) shouldBe List("commit-2", "commit-1")
    // the chronicles branch of the paged override: same slice law as graft
    for (limit <- List(0, 1, 2, 5); offset <- List(0, 1, 2, 5))
      tracker.updates(table, limit, offset) shouldBe full.slice(offset, offset + limit)
  }

  it should "keyset-page the log of a reference-layout store newest-first on the (mtime, name) cursor" in {
    val root = buildChroniclesStore()
    val tracker = new FileBackedVersionTracker(root.toUri)
    val (p1, c1) = tracker.updatesPage(table, 1, None)
    p1.map(_.id.id) shouldBe List("commit-2")
    c1 should not be empty
    val (p2, c2) = tracker.updatesPage(table, 1, c1)
    p2.map(_.id.id) shouldBe List("commit-1")
    c2 should not be empty
    tracker.updatesPage(table, 1, c2) shouldBe ((Nil, None))
    (p1 ++ p2) shouldBe tracker.updates(table)
    an[IllegalArgumentException] should be thrownBy
      tracker.updatesPage(table, 1, Some("not-a-cursor"))
  }

  it should "keyset-page FULL commits of a reference-layout store oldest-first" in {
    val root = buildChroniclesStore()
    val tracker = new FileBackedVersionTracker(root.toUri)
    val full = tracker.tableState(table).updates // oldest first
    // page size 1 forces the (mtime|name) cursor through a resume
    val (p1, c1) = tracker.commitsPageAsc(table, 1, None)
    p1.map(_.metadata.id.id) shouldBe List("commit-1")
    c1 should not be empty
    val (p2, c2) = tracker.commitsPageAsc(table, 1, c1)
    p2.map(_.metadata.id.id) shouldBe List("commit-2")
    (p1 ++ p2) shouldBe full
    c2 should not be empty // full page: exhaustion surfaces on the next call
    val (p3, c3) = tracker.commitsPageAsc(table, 1, c2)
    p3 shouldBe Nil
    c3 shouldBe None
    // a one-shot walk agrees
    tracker.commitsPageAsc(table, 10, None)._1 shouldBe full
    an[IllegalArgumentException] should be thrownBy
      tracker.commitsPageAsc(table, 1, Some("garbage-cursor"))
  }

  it should "support checkout of historic commits in a reference-layout store" in {
    val root = buildChroniclesStore()
    val tracker = new FileBackedVersionTracker(root.toUri)
    val st = tracker.tableState(table)
    st.versionAt(CommitId("commit-1")) shouldBe PartitionedTableVersion(Map(
      Partition("date", "2021-01-01") -> v1))
  }

  it should "refuse writes to reference-layout tables with a pointer at migration" in {
    val root = buildChroniclesStore()
    val tracker = new FileBackedVersionTracker(root.toUri)
    val update = TableUpdate(UserId("u"), "w", Instant.now(),
      List(TableOperation.AddPartitionVersion(Partition("date", "2021-01-03"), Version.generate())))

    val e1 = intercept[UnsupportedOperationException](tracker.commit(table, update))
    e1.getMessage should include("migrateChroniclesTables")
    intercept[UnsupportedOperationException](tracker.setCurrentVersion(table, CommitId("commit-1")))
    intercept[UnsupportedOperationException](
      tracker.initTable(table, isSnapshot = false, UserId("u"), "re-init", Instant.now()))
  }

  it should "migrate a reference-layout store to graft layout preserving history, ids, and head" in {
    val root = buildChroniclesStore()
    val tracker = new FileBackedVersionTracker(root.toUri)
    val before = tracker.tableState(table)

    tracker.migrateChroniclesTables() shouldBe List(table)

    // graft layout now exists and wins resolution; state is identical
    Files.exists(root.resolve("_graft_table_db.events").resolve("table-metadata.json")) shouldBe true
    val after = tracker.tableState(table)
    after shouldBe before

    // and the migrated table is writable
    tracker.commit(table, TableUpdate(UserId("u"), "post-migration", Instant.now(),
      List(TableOperation.AddPartitionVersion(Partition("date", "2021-01-03"), Version.generate()))))
    tracker.updates(table).map(_.message).head shouldBe "post-migration"

    // second migration run is a no-op
    tracker.migrateChroniclesTables() shouldBe Nil

    // a FRESH tracker over the same root sees the migrated + extended table
    val reopened = new FileBackedVersionTracker(root.toUri)
    reopened.tables() shouldBe List(table)
    reopened.updates(table).map(_.id.id) shouldBe
      tracker.updates(table).map(_.id.id)
  }
}

/**
 * State checkpoints: every `checkpointInterval` commits the full history is
 * folded into one `state_checkpoint_*.json` file, and `tableState` reads
 * checkpoint + tail instead of every commit file. Proven behaviorally: once a
 * checkpoint exists, the covered commit files can be removed and the state is
 * still reconstructed in full.
 */
class StateCheckpointSpec extends AnyFlatSpec with Matchers {

  "FileBackedVersionTracker" should "reconstruct full state from checkpoint + tail without the covered commit files" in {
    val root = Files.createTempDirectory("graft-ckpt-")
    val tracker = new FileBackedVersionTracker(root.toUri, checkpointInterval = 8)
    val t = TableName("db", "t")
    tracker.initTable(t, isSnapshot = false, UserId("u"), "init", Instant.now())
    val n = 20
    (1 to n).foreach { i =>
      tracker.commit(t, TableUpdate(UserId("u"), s"c$i", Instant.now(),
        List(TableOperation.AddPartitionVersion(Partition("day", f"d$i%02d"), Version.generate()))))
    }

    val dir = root.resolve("_graft_table_db.t")
    val checkpoints = Files.list(dir).filter(_.getFileName.toString.startsWith("state_checkpoint_"))
      .sorted.toArray.toList.map(_.asInstanceOf[JPath])
    checkpoints should have size 1 // older checkpoints are dropped after a new one lands

    // parse the covered set and REMOVE those commit files: state must survive
    val (covered, folded) = JsonCodecs.checkpointFromJson(
      new String(Files.readAllBytes(checkpoints.last), StandardCharsets.UTF_8)).toOption.get
    covered.size should be >= 16 // two checkpoint rounds at interval 8 (init + 15 commits or more)
    folded.size shouldBe covered.size
    covered.foreach { name =>
      Files.delete(dir.resolve(name))
      Files.deleteIfExists(dir.resolve("." + name + ".crc"))
    }

    val reopened = new FileBackedVersionTracker(root.toUri, checkpointInterval = 8)
    val st = reopened.tableState(t)
    st.updates.map(_.metadata.message) shouldBe ("init" :: (1 to n).map(i => s"c$i").toList)
    reopened.currentVersion(t) match {
      case PartitionedTableVersion(pvs) => pvs.keySet should have size n.toLong
      case other                        => fail(s"unexpected $other")
    }
  }

  it should "fold a tail commit whose name sorts BELOW the checkpoint boundary in name order" in {
    // simulates cross-process clock skew: a commit file lands (atomically)
    // with a name lexicographically below names the checkpoint already
    // covers. The fold order must equal the full-scan order — the skewed
    // commit applies FIRST, so later covered commits win the partition.
    val root = Files.createTempDirectory("graft-ckpt-skew-")
    val tracker = new FileBackedVersionTracker(root.toUri, checkpointInterval = 4)
    val t = TableName("db", "t")
    tracker.initTable(t, isSnapshot = false, UserId("u"), "init", Instant.now())
    val winner = Version.generate()
    (1 to 5).foreach { i =>
      val v = if (i == 5) winner else Version.generate()
      tracker.commit(t, TableUpdate(UserId("u"), s"c$i", Instant.now(),
        List(TableOperation.AddPartitionVersion(Partition("day", "contested"), v))))
    }
    val dir = root.resolve("_graft_table_db.t")
    Files.list(dir).filter(_.getFileName.toString.startsWith("state_checkpoint_"))
      .count() shouldBe 1

    // the skewed writer: name sorts before every real commit file
    val loser = Version.generate()
    val skewed = TableUpdate(TableUpdateMetadata(CommitId("skewed"), UserId("w2"), "skewed",
      Instant.now()), List(TableOperation.AddPartitionVersion(Partition("day", "contested"), loser)))
    Files.write(dir.resolve("table_update_00000101-000000.000000000.json"),
      JsonCodecs.toJson(skewed).getBytes(StandardCharsets.UTF_8))

    val withCheckpoint = new FileBackedVersionTracker(root.toUri).tableState(t)
    // full scan (checkpoint removed) is the ground truth
    Files.list(dir).filter(_.getFileName.toString.startsWith("state_checkpoint_"))
      .forEach(p => { Files.delete(p); Files.deleteIfExists(dir.resolve("." + p.getFileName + ".crc")); () })
    val fullScan = new FileBackedVersionTracker(root.toUri).tableState(t)

    withCheckpoint.updates.map(_.metadata.id) shouldBe fullScan.updates.map(_.metadata.id)
    withCheckpoint.updates.head.metadata.message shouldBe "skewed"
    // the last real commit still owns the contested partition
    new FileBackedVersionTracker(root.toUri).currentVersion(t) shouldBe
      PartitionedTableVersion(Map(Partition("day", "contested") -> winner))
  }

  it should "self-heal a wrong-but-parseable checkpoint at the periodic full refold" in {
    // chained folds copy the previous checkpoint's content verbatim (O(tail)
    // per fold); every FullRefoldEvery-th fold re-derives from the commit
    // files, bounding how long a POISONED (valid-JSON, wrong content)
    // checkpoint can live
    val root = Files.createTempDirectory("graft-ckpt-heal-")
    val tracker = new FileBackedVersionTracker(root.toUri, checkpointInterval = 1)
    val t = TableName("db", "t")
    tracker.initTable(t, isSnapshot = false, UserId("u"), "init", Instant.now())
    def commit(i: Int): Unit =
      tracker.commit(t, TableUpdate(UserId("u"), s"c$i", Instant.now(),
        List(TableOperation.AddPartitionVersion(Partition("day", f"d$i%02d"), Version.generate()))))
    commit(1) // fold #1 (chained)
    val dir = root.resolve("_graft_table_db.t")
    def checkpointFile = Files.list(dir)
      .filter(_.getFileName.toString.startsWith("state_checkpoint_")).findFirst.get

    // poison: keep the real covered names, but rewrite every folded commit's
    // message — parseable, wrong content
    val (covered, folded) = JsonCodecs.checkpointFromJson(
      new String(Files.readAllBytes(checkpointFile), StandardCharsets.UTF_8)).toOption.get
    val poisoned = folded.map(u => u.copy(metadata = u.metadata.copy(message = "POISONED")))
    Files.write(checkpointFile,
      JsonCodecs.checkpointToJson(covered, poisoned).getBytes(StandardCharsets.UTF_8))
    Files.deleteIfExists(dir.resolve("." + checkpointFile.getFileName.toString + ".crc"))

    // folds #2..#7 chain the poison forward
    (2 to 6).foreach(commit)
    new FileBackedVersionTracker(root.toUri).tableState(t)
      .updates.map(_.metadata.message) should contain("POISONED")

    // folds up to #8: the FullRefoldEvery-th fold re-derives from the files
    (7 to 8).foreach(commit)
    val healed = new FileBackedVersionTracker(root.toUri).tableState(t)
    healed.updates.map(_.metadata.message) should not contain "POISONED"
    healed.updates.map(_.metadata.message) shouldBe ("init" :: (1 to 8).map(i => s"c$i").toList)
  }

  it should "keep a corrupt checkpoint from bricking the store (falls back to commit files)" in {
    val root = Files.createTempDirectory("graft-ckpt-corrupt-")
    val tracker = new FileBackedVersionTracker(root.toUri, checkpointInterval = 4)
    val t = TableName("db", "t")
    tracker.initTable(t, isSnapshot = false, UserId("u"), "init", Instant.now())
    (1 to 6).foreach { i =>
      tracker.commit(t, TableUpdate(UserId("u"), s"c$i", Instant.now(),
        List(TableOperation.AddPartitionVersion(Partition("day", f"d$i%02d"), Version.generate()))))
    }
    val dir = root.resolve("_graft_table_db.t")
    val checkpoint = Files.list(dir).filter(_.getFileName.toString.startsWith("state_checkpoint_"))
      .findFirst.get
    Files.write(checkpoint, "not json at all".getBytes(StandardCharsets.UTF_8))
    Files.deleteIfExists(dir.resolve("." + checkpoint.getFileName.toString + ".crc"))

    val st = new FileBackedVersionTracker(root.toUri).tableState(t)
    st.updates.map(_.metadata.message) shouldBe ("init" :: (1 to 6).map(i => s"c$i").toList)
  }
}

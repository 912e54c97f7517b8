package graft.sources

import graft.core._
import java.nio.file.Files
import java.time.Instant
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * Pins the bounded-memory `currentVersion` fast path of both persistent
 * stores: once a checkpoint has written its fold document, "what is the
 * table now?" reads the folded state (O(#live partitions)) plus only the
 * commit TAIL — never the full history. The laws assert on the stores' own
 * I/O counters (`commitFilesParsed` / `historyRowsScanned`), so a regression
 * back to a full materialization fails loudly rather than just slowly.
 * The eager analogue of the reference's lazily streamed history fold
 * (reference core VersionTracker.scala:137-151).
 */
abstract class FileFoldedCurrentVersionContract extends AnyFlatSpec with Matchers {

  /** Construct a tracker over `dir` with the given checkpoint interval. */
  def tracker(dir: java.nio.file.Path, interval: Int): FileBackedVersionTracker
  def branchName: String

  private def commitN(tr: FileBackedVersionTracker, t: TableName, ids: Range): Unit =
    ids.foreach { i =>
      tr.commit(t, TableUpdate(UserId("u"), s"c$i", Instant.now(),
        List(TableOperation.AddPartitionVersion(Partition("day", f"d$i%03d"), Version.generate()))))
    }

  s"currentVersion ($branchName)" should "parse only the commit tail once a fold document exists" in {
    val dir = Files.createTempDirectory(s"graft-fold-$branchName-")
    val t = TableName("db", "t")
    val w = tracker(dir, interval = 4)
    w.initTable(t, isSnapshot = false, UserId("u"), "init", Instant.now())
    commitN(w, t, 1 to 6) // checkpoint+fold at commit 4 (covers init + 4), tail = 2

    val r = tracker(dir, interval = 4) // fresh instance: counter starts at 0
    val got = r.currentVersion(t)
    r.commitFilesParsed.get() should be <= 2L
    // and the bounded fold produced EXACTLY what the full replay produces
    got shouldBe w.tableState(t).currentTableVersion
  }

  it should "parse ZERO commit files when the head sits exactly on the fold boundary" in {
    val dir = Files.createTempDirectory(s"graft-fold0-$branchName-")
    val t = TableName("db", "t")
    val w = tracker(dir, interval = 4)
    w.initTable(t, isSnapshot = false, UserId("u"), "init", Instant.now())
    commitN(w, t, 1 to 4) // fold covers everything, head == fold's lastCommitId

    val r = tracker(dir, interval = 4)
    val got = r.currentVersion(t)
    r.commitFilesParsed.get() shouldBe 0L
    got shouldBe w.tableState(t).currentTableVersion
  }

  it should "apply tail REMOVES on top of the folded state" in {
    val dir = Files.createTempDirectory(s"graft-foldrm-$branchName-")
    val t = TableName("db", "t")
    val w = tracker(dir, interval = 4)
    w.initTable(t, isSnapshot = false, UserId("u"), "init", Instant.now())
    commitN(w, t, 1 to 4) // d001..d004 all inside the fold
    w.commit(t, TableUpdate(UserId("u"), "rm", Instant.now(),
      List(TableOperation.RemovePartition(Partition("day", "d002")))))

    val got = tracker(dir, interval = 4).currentVersion(t)
    val parts = got.asInstanceOf[PartitionedTableVersion].partitionVersions.keySet
    parts.map(_.toHivePath) shouldBe Set("day=d001", "day=d003", "day=d004")
  }

  it should "fall back to the full replay after a checkout INTO the covered prefix" in {
    val dir = Files.createTempDirectory(s"graft-foldco-$branchName-")
    val t = TableName("db", "t")
    val w = tracker(dir, interval = 4)
    w.initTable(t, isSnapshot = false, UserId("u"), "init", Instant.now())
    commitN(w, t, 1 to 6)
    val st = w.tableState(t)
    val early = st.updates(2).metadata.id // second real commit: inside the fold
    w.setCurrentVersion(t, early)

    val r = tracker(dir, interval = 4)
    r.currentVersion(t) shouldBe st.versionAt(early)
  }

  it should "survive a corrupt fold document by degrading to the full replay" in {
    val dir = Files.createTempDirectory(s"graft-foldbad-$branchName-")
    val t = TableName("db", "t")
    val w = tracker(dir, interval = 4)
    w.initTable(t, isSnapshot = false, UserId("u"), "init", Instant.now())
    commitN(w, t, 1 to 5)
    val expected = w.tableState(t).currentTableVersion

    val tableDir = Files.list(dir).filter(_.getFileName.toString.startsWith("_graft_table_"))
      .findFirst().orElseThrow()
    val foldFile = Files.list(tableDir)
      .filter(_.getFileName.toString.startsWith(FileBackedVersionTracker.StateFoldFilePrefix))
      .findFirst().orElseThrow()
    Files.write(foldFile, "not json at all".getBytes("UTF-8"))

    tracker(dir, interval = 4).currentVersion(t) shouldBe expected
  }

  it should "serve headState (version + schema + DV bases) from the fold doc + tail" in {
    val dir = Files.createTempDirectory(s"graft-foldhs-$branchName-")
    val t = TableName("db", "t")
    val w = tracker(dir, interval = 4)
    w.initTable(t, isSnapshot = false, UserId("u"), "init", Instant.now())
    val v1 = Version.generate()
    val schema1 = """{"v":1}"""
    val schema2 = """{"v":2}"""
    w.commit(t, TableUpdate(UserId("u"), "c1", Instant.now(), List(
      TableOperation.AddPartitionVersion(Partition("day", "d001"), v1),
      TableOperation.SetTableSchema(schema1))))
    commitN(w, t, 2 to 4) // fold at commit 4: covers init + c1..c4 (schema1 inside)
    // the TAIL carries a DV marker, its base binding, and a newer schema
    val marker = Version.generateDeleteMarker()
    w.commit(t, TableUpdate(UserId("u"), "c5", Instant.now(), List(
      TableOperation.AddPartitionVersion(Partition("day", "d001"), marker),
      TableOperation.SetVersionBase(Partition("day", "d001"), marker, v1),
      TableOperation.SetTableSchema(schema2))))

    val r = tracker(dir, interval = 4)
    val hs = r.headState(t)
    r.commitFilesParsed.get() should be <= 1L // the one tail commit, never the history
    val st = w.tableState(t)
    hs.head shouldBe st.currentVersion
    hs.version shouldBe st.currentTableVersion
    hs.schemaJson shouldBe Some(schema2)
    hs.schemaJson shouldBe st.currentSchemaJson
    hs.versionBases shouldBe Map((Partition("day", "d001"), marker) -> v1)
    hs.versionBases shouldBe st.versionBases

    // boundary-covered extras resolve with ZERO commit parses: the fold at
    // commit 8 covers the marker/schema2 commit, and the head sits on it
    commitN(w, t, 5 to 7)
    val r2 = tracker(dir, interval = 4)
    val hs2 = r2.headState(t)
    r2.commitFilesParsed.get() shouldBe 0L
    hs2.schemaJson shouldBe Some(schema2)
    hs2.versionBases shouldBe Map((Partition("day", "d001"), marker) -> v1)
    hs2.version shouldBe w.tableState(t).currentTableVersion
  }

  it should "resolve versionAt boundedly for tail ids and exactly for covered ones" in {
    val dir = Files.createTempDirectory(s"graft-foldvat-$branchName-")
    val t = TableName("db", "t")
    val w = tracker(dir, interval = 4)
    w.initTable(t, isSnapshot = false, UserId("u"), "init", Instant.now())
    commitN(w, t, 1 to 6) // fold at 4; commits 5-6 are the tail
    val st = w.tableState(t)
    val tailId = st.updates.last.metadata.id           // newest (in the tail)
    val coveredId = st.updates(2).metadata.id          // inside the fold

    val r = tracker(dir, interval = 4)
    val gotTail = r.versionAt(t, tailId)
    r.commitFilesParsed.get() should be <= 2L // the tail, never the history
    gotTail shouldBe st.versionAt(tailId)
    // covered-prefix ids fall back to the full replay, still exact
    r.versionAt(t, coveredId) shouldBe st.versionAt(coveredId)
    // unknown ids raise the standard error
    intercept[UnknownCommitError] { r.versionAt(t, CommitId("no-such-commit")) }
  }

  it should "track a snapshot table's head through the fold" in {
    val dir = Files.createTempDirectory(s"graft-foldsnap-$branchName-")
    val t = TableName("db", "s")
    val w = tracker(dir, interval = 4)
    w.initTable(t, isSnapshot = true, UserId("u"), "init", Instant.now())
    val versions = (1 to 6).map { i =>
      val v = Version.generate()
      w.commit(t, TableUpdate(UserId("u"), s"v$i", Instant.now(),
        List(TableOperation.AddTableVersion(v))))
      v
    }
    val r = tracker(dir, interval = 4)
    r.currentVersion(t) shouldBe SnapshotTableVersion(versions.last)
    r.commitFilesParsed.get() should be <= 2L
  }
}

/** NIO (local `file://`) branch. */
class FileFoldedCurrentVersionSpec extends FileFoldedCurrentVersionContract {
  override def branchName = "nio"
  override def tracker(dir: java.nio.file.Path, interval: Int): FileBackedVersionTracker =
    new FileBackedVersionTracker(dir.toUri, checkpointInterval = interval)
}

/** Hadoop/remote-FS branch ([[MockHdfsFileSystem]]): the same bounded-fold
  * laws over `fs.create`/`fs.open` + FileContext renames — the code that
  * runs on HDFS/S3A. */
class HadoopFoldedCurrentVersionSpec extends FileFoldedCurrentVersionContract {
  override def branchName = "hadoop"
  override def tracker(dir: java.nio.file.Path, interval: Int): FileBackedVersionTracker =
    new FileBackedVersionTracker(MockHdfsFileSystem.uriFor(dir), MockHdfsFileSystem.conf(),
      checkpointInterval = interval)
}

package graft.sources

import graft.core._
import java.nio.file.Files
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class FileBackedVersionTrackerSpec extends VersionTrackerContract {
  override def newTracker(): VersionTracker = {
    val dir = Files.createTempDirectory("graft-tracker-").toUri
    new FileBackedVersionTracker(dir)
  }
}

/** Persistence-specific behavior beyond the shared contract. */
class FileBackedPersistenceSpec extends AnyFlatSpec with Matchers {

  "FileBackedVersionTracker" should "survive a reopen (state is on disk, not in memory)" in {
    val dir = Files.createTempDirectory("graft-reopen-").toUri
    val t = TableName("test", "t")
    val p = Partition("date", "2019-01-01")
    val v = Version.generate()

    val tr1 = new FileBackedVersionTracker(dir)
    tr1.initTable(t, isSnapshot = false, UserId("u"), "init", java.time.Instant.now())
    tr1.commit(t, TableUpdate(UserId("u"), "add", java.time.Instant.now(),
      List(TableOperation.AddPartitionVersion(p, v))))

    val tr2 = new FileBackedVersionTracker(dir)
    tr2.tables() shouldBe List(t)
    tr2.currentVersion(t) shouldBe PartitionedTableVersion(Map(p -> v))
    tr2.updates(t).map(_.message) shouldBe List("add", "init")
  }

  it should "lay out the commit log as documented" in {
    val root = Files.createTempDirectory("graft-layout-")
    val tr = new FileBackedVersionTracker(root.toUri)
    val t = TableName("db", "tbl")
    tr.initTable(t, isSnapshot = true, UserId("u"), "init", java.time.Instant.now())
    tr.commit(t, TableUpdate(UserId("u"), "v1", java.time.Instant.now(),
      List(TableOperation.AddTableVersion(Version.generate()))))

    val tableDir = root.resolve("_graft_table_db.tbl")
    Files.exists(tableDir.resolve("table-metadata.json")) shouldBe true
    Files.exists(tableDir.resolve("head.json")) shouldBe true
    val commits = Files.list(tableDir).filter(_.getFileName.toString.startsWith("table_update_")).count()
    commits shouldBe 2
  }
}

/** Pins the documented single-writer caveat concretely: racing commits are
  * never lost or corrupted (every commit file is uniquely named and lands in
  * history); only HEAD is last-writer-wins, so a racer that sorts after the
  * winning head is invisible until the next commit moves head past it —
  * orchestrate same-table writers externally (reference README.md:53-55). */
class FileBackedConcurrencySpec extends AnyFlatSpec with Matchers {

  "FileBackedVersionTracker" should "preserve every commit under concurrent writers" in {
    val dir = Files.createTempDirectory("graft-race-").toUri
    val tracker = new FileBackedVersionTracker(dir)
    val t = TableName("race", "t")
    tracker.initTable(t, isSnapshot = false, UserId("u"), "init", java.time.Instant.now())

    val n = 16
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val latch = new java.util.concurrent.CountDownLatch(n)
    (1 to n).foreach { i =>
      pool.execute { () =>
        try tracker.commit(t, TableUpdate(UserId("u"), s"c$i", java.time.Instant.now(),
          List(TableOperation.AddPartitionVersion(Partition("day", f"d$i%02d"), Version.generate()))))
        catch { case e: Throwable => failures.add(e) }
        finally latch.countDown()
      }
    }
    latch.await()
    pool.shutdown()

    failures.toArray shouldBe empty
    // no commit lost: all n land in history with distinct messages
    val messages = tracker.updates(t).map(_.message)
    messages should have size (n + 1).toLong
    messages.toSet should contain allElementsOf (1 to n).map(i => s"c$i")
    // state is a consistent fold up to whichever head won the race
    val st = tracker.tableState(t)
    tracker.currentVersion(t) shouldBe st.versionAt(st.currentVersion)
    // a fresh reader over the same directory sees the identical log
    new FileBackedVersionTracker(dir).updates(t).map(_.message) shouldBe messages
  }
}

class JsonCodecsSpec extends AnyFlatSpec with Matchers {

  "JsonCodecs" should "round-trip a commit with all four operation types" in {
    val update = TableUpdate(
      TableUpdateMetadata(CommitId("abc-123"), UserId("alice"), "msg with \"quotes\"\nand newline",
        java.time.Instant.parse("2019-03-13T23:59:00.123456789Z")),
      List(
        TableOperation.InitTable(TableName("s", "t"), isSnapshot = false),
        TableOperation.AddTableVersion(Version.generate()),
        TableOperation.AddPartitionVersion(
          Partition(ColumnValue(PartitionColumn("year"), "2019"), ColumnValue(PartitionColumn("month"), "01")),
          Version.generate()),
        TableOperation.RemovePartition(Partition("date", "2019-01-01"))))
    JsonCodecs.fromJson(JsonCodecs.toJson(update)) shouldBe Right(update)
  }

  it should "round-trip the Unversioned sentinel" in {
    val update = TableUpdate(
      TableUpdateMetadata(CommitId("c"), UserId("u"), "m", java.time.Instant.EPOCH),
      List(TableOperation.AddTableVersion(Version.Unversioned)))
    JsonCodecs.fromJson(JsonCodecs.toJson(update)) shouldBe Right(update)
  }

  it should "reject malformed documents" in {
    JsonCodecs.fromJson("{}").isLeft shouldBe true
    JsonCodecs.fromJson("not json").isLeft shouldBe true
    JsonCodecs.fromJson("""{"formatVersion":2,"id":"a","userId":"u","message":"m","timestamp":"2020-01-01T00:00:00Z","operations":[{"type":"wat"}]}""").isLeft shouldBe true
  }

  it should "refuse commit files without a formatVersion marker (pre-v2 raw partition encoding)" in {
    val v1Style = """{"id":"a","userId":"u","message":"m","timestamp":"2020-01-01T00:00:00Z","operations":[]}"""
    val result = JsonCodecs.fromJson(v1Style)
    result.isLeft shouldBe true
    result.swap.getOrElse("") should include("formatVersion")
  }

  it should "refuse commit files from a future format version" in {
    val future = """{"formatVersion":99,"id":"a","userId":"u","message":"m","timestamp":"2020-01-01T00:00:00Z","operations":[]}"""
    val result = JsonCodecs.fromJson(future)
    result.isLeft shouldBe true
    result.swap.getOrElse("") should include("99")
  }

  it should "stamp the current format version on every encoded commit" in {
    val update = TableUpdate(
      TableUpdateMetadata(CommitId("c"), UserId("u"), "m", java.time.Instant.EPOCH),
      List(TableOperation.AddTableVersion(Version.Unversioned)))
    JsonCodecs.toJson(update) should include(s""""formatVersion" : ${JsonCodecs.FormatVersion}""")
  }
}

package graft.sources

import graft.core._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.net.URI
import java.nio.file.Files
import java.time.Instant

/**
 * Worker entry point run in a SEPARATE JVM by [[MultiProcessCommitSpec]]:
 * opens the store at args(0) and makes args(3) commits to table args(1),
 * tagging messages with worker id args(2). Exits non-zero on any failure so
 * the spec can detect lost/failed commits. Understands both `file://` and
 * the test-only `mockhdfs://` scheme (the tracker's Hadoop I/O branch).
 */
object MultiProcessCommitWorker {
  def main(args: Array[String]): Unit = {
    val Array(rootUri, tableFqn, workerId, nStr) = args
    val uri = URI.create(rootUri)
    val tracker = new FileBackedVersionTracker(uri, MockHdfsFileSystem.confFor(uri))
    val table = TableName.parse(tableFqn).fold(sys.error, identity)
    (1 to nStr.toInt).foreach { i =>
      tracker.commit(table, TableUpdate(UserId(s"w$workerId"), s"w$workerId-c$i", Instant.now(),
        List(TableOperation.AddPartitionVersion(
          Partition("day", f"w$workerId%s-d$i%02d"), Version.generate()))))
    }
  }
}

/**
 * Worker for the cross-process CAS race: attempts ONE commitIf against the
 * head passed in args(3). Exits 0 on success, 3 on CommitConflictError (the
 * expected loser outcome), 1 on anything else.
 */
object MultiProcessCasWorker {
  def main(args: Array[String]): Unit = {
    val Array(rootUri, tableFqn, workerId, expectedHead) = args
    val uri = URI.create(rootUri)
    val tracker = new FileBackedVersionTracker(uri, MockHdfsFileSystem.confFor(uri))
    val table = TableName.parse(tableFqn).fold(sys.error, identity)
    try tracker.commitIf(table,
      TableUpdate(UserId(s"w$workerId"), s"cas-w$workerId", Instant.now(),
        List(TableOperation.AddPartitionVersion(
          Partition("day", s"w$workerId"), Version.generate()))),
      CommitId(expectedHead))
    catch { case _: CommitConflictError => sys.exit(3) }
  }
}

/**
 * Worker for the cross-process GROUP-commit race: attempts ONE
 * [[graft.core.GroupCommitTracker.commitGroup]] over tables args(1)/args(2),
 * CASing on heads args(4)/args(5). Odd worker ids pass the tables in
 * REVERSE order — the sorted-lock discipline must keep cross-process groups
 * deadlock-free and non-interleaving regardless of caller order. Exit 0 =
 * group landed, 3 = CommitConflictError (expected loser), other = failure.
 */
object MultiProcessGroupWorker {
  def main(args: Array[String]): Unit = {
    val Array(rootUri, ta, tb, workerId, headA, headB) = args
    val uri = URI.create(rootUri)
    val tracker = new FileBackedVersionTracker(uri, MockHdfsFileSystem.confFor(uri))
    val a = TableName.parse(ta).fold(sys.error, identity)
    val b = TableName.parse(tb).fold(sys.error, identity)
    def upd(tag: String) = TableUpdate(UserId(s"w$workerId"), s"grp-w$workerId-$tag",
      Instant.now(),
      List(TableOperation.AddPartitionVersion(
        Partition("day", s"w$workerId"), Version.generate())))
    val ordered = List((a, upd("a"), CommitId(headA)), (b, upd("b"), CommitId(headB)))
    val commits = if (workerId.toInt % 2 == 1) ordered.reverse else ordered
    try tracker.commitGroup(commits)
    catch { case _: CommitConflictError => sys.exit(3) }
  }
}

/**
 * Cross-PROCESS writer safety: concurrent writers in separate JVMs serialize
 * on the exclusive-create `commit.lock` file, so every commit lands intact
 * (no torn head, no lost commit file) — the in-JVM monitor alone cannot
 * provide this. Complements `FileBackedConcurrencySpec` (in-process writers).
 *
 * Runs twice, over BOTH tracker I/O branches:
 *  - [[MultiProcessCommitSpec]]: `file://` root → the NIO local fast path
 *    (POSIX O_EXCL lock create, rename(2) head replace);
 *  - [[MultiProcessCommitHadoopIoSpec]]: `mockhdfs://` root → the Hadoop
 *    branch that runs on HDFS/S3A (`fs.create(overwrite=false)` lock,
 *    `FileContext` OVERWRITE head rename, Hadoop stale-lock break).
 */
abstract class MultiProcessCommitContract extends AnyFlatSpec with Matchers {

  /** Human label for the branch under test (spec naming only). */
  def branch: String
  /** Store root URI over a fresh local temp dir — scheme selects the branch. */
  def newRootUri(dir: java.nio.file.Path): URI

  private def newTracker(uri: URI): FileBackedVersionTracker =
    new FileBackedVersionTracker(uri, MockHdfsFileSystem.confFor(uri))

  s"FileBackedVersionTracker ($branch)" should "preserve every commit under concurrent writers in separate processes" in {
    val root = Files.createTempDirectory("graft-mp-")
    val rootUri = newRootUri(root)
    val tracker = newTracker(rootUri)
    val t = TableName("mp", "t")
    tracker.initTable(t, isSnapshot = false, UserId("u"), "init", Instant.now())

    val javaBin = new java.io.File(new java.io.File(System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cp = System.getProperty("java.class.path")
    val workers = 3
    val commitsEach = 8
    val procs = (1 to workers).map { w =>
      new ProcessBuilder(
        javaBin, "-cp", cp, "graft.sources.MultiProcessCommitWorker",
        rootUri.toString, t.fullyQualifiedName, w.toString, commitsEach.toString)
        .redirectErrorStream(true)
        .start()
    }
    procs.zipWithIndex.foreach { case (p, i) =>
      val out = new String(p.getInputStream.readAllBytes())
      val rc = p.waitFor()
      withClue(s"worker ${i + 1} output:\n$out\n") { rc shouldBe 0 }
    }

    // every commit from every process landed, and the store is consistent
    val messages = tracker.updates(t).map(_.message)
    messages should have size (workers * commitsEach + 1).toLong
    val expected = for { w <- 1 to workers; i <- 1 to commitsEach } yield s"w$w-c$i"
    messages.toSet should contain allElementsOf expected
    val st = tracker.tableState(t)
    tracker.currentVersion(t) shouldBe st.versionAt(st.currentVersion)
    // no lock file left behind
    Files.exists(root.resolve("_graft_table_mp.t").resolve("commit.lock")) shouldBe false
  }

  it should "let exactly one of several commitIf writers in separate processes win" in {
    val root = Files.createTempDirectory("graft-mpcas-")
    val rootUri = newRootUri(root)
    val tracker = newTracker(rootUri)
    val t = TableName("mpcas", "t")
    tracker.initTable(t, isSnapshot = false, UserId("u"), "init", Instant.now())
    val head0 = tracker.tableState(t).currentVersion

    val javaBin = new java.io.File(new java.io.File(System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cp = System.getProperty("java.class.path")
    val procs = (1 to 3).map { w =>
      new ProcessBuilder(
        javaBin, "-cp", cp, "graft.sources.MultiProcessCasWorker",
        rootUri.toString, t.fullyQualifiedName, w.toString, head0.id)
        .redirectErrorStream(true)
        .start()
    }
    val rcs = procs.map { p => p.getInputStream.readAllBytes(); p.waitFor() }
    rcs.count(_ == 0) shouldBe 1        // exactly one CAS winner
    rcs.count(_ == 3) shouldBe 2        // the rest saw the conflict error
    tracker.updates(t) should have size 2 // init + winner, losers left no trace
  }

  it should "let exactly one cross-process commit GROUP win, heads never interleaving" in {
    val root = Files.createTempDirectory("graft-mpgrp-")
    val rootUri = newRootUri(root)
    val tracker = newTracker(rootUri)
    val (a, b) = (TableName("mpgrp", "a"), TableName("mpgrp", "b"))
    tracker.initTable(a, isSnapshot = false, UserId("u"), "init", Instant.now())
    tracker.initTable(b, isSnapshot = false, UserId("u"), "init", Instant.now())
    val headA = tracker.currentRef(a)
    val headB = tracker.currentRef(b)

    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cp = System.getProperty("java.class.path")
    val procs = (1 to 3).map { w =>
      new ProcessBuilder(
        javaBin, "-cp", cp, "graft.sources.MultiProcessGroupWorker",
        rootUri.toString, a.fullyQualifiedName, b.fullyQualifiedName,
        w.toString, headA.id, headB.id)
        .redirectErrorStream(true)
        .start()
    }
    val rcs = procs.map { p => p.getInputStream.readAllBytes(); p.waitFor() }
    rcs.count(_ == 0) shouldBe 1 // exactly one group landed
    rcs.count(_ == 3) shouldBe 2 // the rest saw the conflict, advanced nothing
    tracker.updates(a) should have size 2 // init + winner
    tracker.updates(b) should have size 2
    // BOTH tables' newest commits belong to the SAME winner — no mixing,
    // even though odd workers locked the tables in the opposite order
    val winA = tracker.updates(a).head.message
    val winB = tracker.updates(b).head.message
    winA.stripSuffix("-a") shouldBe winB.stripSuffix("-b")
    winA should endWith("-a")
    winB should endWith("-b")
  }

  it should "break a stale lock left by a crashed writer instead of timing out" in {
    val root = Files.createTempDirectory("graft-stale-")
    val rootUri = newRootUri(root)
    val tracker = newTracker(rootUri)
    val t = TableName("stale", "t")
    tracker.initTable(t, isSnapshot = false, UserId("u"), "init", Instant.now())

    // simulate a crashed writer: a lock file whose mtime is far past the TTL
    val lock = root.resolve("_graft_table_stale.t").resolve("commit.lock")
    Files.createFile(lock)
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10 * 60 * 1000))

    tracker.commit(t, TableUpdate(UserId("u"), "after-crash", Instant.now(),
      List(TableOperation.AddPartitionVersion(Partition("day", "d1"), Version.generate()))))
    tracker.updates(t).map(_.message).head shouldBe "after-crash"
    Files.exists(lock) shouldBe false
  }
}

class MultiProcessCommitSpec extends MultiProcessCommitContract {
  override def branch: String = "nio"
  override def newRootUri(dir: java.nio.file.Path): URI = dir.toUri
}

class MultiProcessCommitHadoopIoSpec extends MultiProcessCommitContract {
  override def branch: String = "hadoop io"
  override def newRootUri(dir: java.nio.file.Path): URI = MockHdfsFileSystem.uriFor(dir)
}

package graft.core

import java.time.Instant
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import TableOperation._

/**
 * Black-box contract every VersionTracker implementation must satisfy —
 * mirrors the reference's shared-behavior spec pattern
 * (`core/src/test/.../VersionTrackerSpec.scala:19-499`), instantiated per impl.
 */
trait VersionTrackerContract extends AnyFlatSpec with Matchers {

  /** Fresh, empty tracker per call. */
  def newTracker(): VersionTracker

  private def init(tr: VersionTracker, name: String, isSnapshot: Boolean = false): TableName = {
    val t = TableName("test", name)
    tr.initTable(t, isSnapshot, UserId("u"), "init", Instant.now())
    t
  }

  private def upd(ops: TableOperation*): TableUpdate =
    TableUpdate(UserId("u"), "update", Instant.now(), ops.toList)

  behavior of "a VersionTracker"

  it should "list initialised tables" in {
    val tr = newTracker()
    tr.tables() shouldBe Nil
    val t1 = init(tr, "t1")
    val t2 = init(tr, "t2", isSnapshot = true)
    tr.tables() should contain theSameElementsAs List(t1, t2)
    tr.isSnapshotTable(t1) shouldBe false
    tr.isSnapshotTable(t2) shouldBe true
  }

  it should "treat a second init as a no-op" in {
    val tr = newTracker()
    val t = init(tr, "t")
    val v = Version.generate()
    tr.commit(t, upd(AddPartitionVersion(Partition("date", "2019-01-01"), v)))
    tr.initTable(t, isSnapshot = false, UserId("other"), "re-init", Instant.now())
    tr.updates(t) should have size 2
    tr.currentVersion(t) shouldBe PartitionedTableVersion(Map(Partition("date", "2019-01-01") -> v))
  }

  it should "start with an empty current version" in {
    val tr = newTracker()
    tr.currentVersion(init(tr, "p")) shouldBe PartitionedTableVersion(Map.empty)
    tr.currentVersion(init(tr, "s", isSnapshot = true)) shouldBe SnapshotTableVersion(Version.Unversioned)
  }

  it should "apply partition add/update/remove across commits" in {
    val tr = newTracker()
    val t = init(tr, "t")
    val p1 = Partition("date", "2019-01-01")
    val p2 = Partition("date", "2019-01-02")
    val v1 = Version.generate(); val v2 = Version.generate(); val v3 = Version.generate()
    tr.commit(t, upd(AddPartitionVersion(p1, v1), AddPartitionVersion(p2, v2)))
    tr.commit(t, upd(AddPartitionVersion(p2, v3)))
    tr.currentVersion(t) shouldBe PartitionedTableVersion(Map(p1 -> v1, p2 -> v3))
    tr.commit(t, upd(RemovePartition(p1)))
    tr.currentVersion(t) shouldBe PartitionedTableVersion(Map(p2 -> v3))
    val v4 = Version.generate()
    tr.commit(t, upd(AddPartitionVersion(p1, v4)))
    tr.currentVersion(t) shouldBe PartitionedTableVersion(Map(p1 -> v4, p2 -> v3))
  }

  it should "progress snapshot versions" in {
    val tr = newTracker()
    val t = init(tr, "snap", isSnapshot = true)
    val v1 = Version.generate(); val v2 = Version.generate()
    tr.commit(t, upd(AddTableVersion(v1)))
    tr.currentVersion(t) shouldBe SnapshotTableVersion(v1)
    tr.commit(t, upd(AddTableVersion(v2)))
    tr.currentVersion(t) shouldBe SnapshotTableVersion(v2)
  }

  it should "support checkout to every point in history and back" in {
    val tr = newTracker()
    val t = init(tr, "t")
    val p = Partition("date", "2019-01-01")
    val versions = (1 to 3).map(_ => Version.generate()).toList
    versions.foreach(v => tr.commit(t, upd(AddPartitionVersion(p, v))))
    val log = tr.updates(t) // newest first, size 4 incl. init
    log should have size 4

    // roll back to each commit: visible state must be the replay prefix
    tr.setCurrentVersion(t, log(1).id) // after v2
    tr.currentVersion(t) shouldBe PartitionedTableVersion(Map(p -> versions(1)))
    tr.setCurrentVersion(t, log(2).id) // after v1
    tr.currentVersion(t) shouldBe PartitionedTableVersion(Map(p -> versions(0)))
    tr.setCurrentVersion(t, log(3).id) // init: empty
    tr.currentVersion(t) shouldBe PartitionedTableVersion(Map.empty)
    tr.setCurrentVersion(t, log(0).id) // forward to head
    tr.currentVersion(t) shouldBe PartitionedTableVersion(Map(p -> versions(2)))
  }

  it should "return to head semantics on a new commit after checkout" in {
    val tr = newTracker()
    val t = init(tr, "t")
    val p = Partition("date", "2019-01-01")
    val v1 = Version.generate(); val v2 = Version.generate(); val v3 = Version.generate()
    tr.commit(t, upd(AddPartitionVersion(p, v1)))
    tr.commit(t, upd(AddPartitionVersion(p, v2)))
    tr.setCurrentVersion(t, tr.updates(t)(1).id) // back to v1
    tr.commit(t, upd(AddPartitionVersion(p, v3)))
    // new commit is appended to the FULL history and becomes head
    tr.currentVersion(t) shouldBe PartitionedTableVersion(Map(p -> v3))
    tr.updates(t) should have size 4
  }

  it should "order the log by commit order, not timestamp order" in {
    val tr = newTracker()
    val t = init(tr, "t")
    val p = Partition("date", "2019-01-01")
    // commit with shuffled (non-monotonic) metadata timestamps
    val base = Instant.parse("2020-01-01T00:00:00Z")
    val offsets = List(50L, 3L, 99L, 1L, 42L)
    val ids = offsets.map { off =>
      val u = TableUpdate(UserId("u"), s"m$off", base.plusSeconds(off),
        List(AddPartitionVersion(p, Version.generate())))
      tr.commit(t, u)
      u.metadata.id
    }
    tr.updates(t).map(_.id) shouldBe (ids.reverse :+ tr.updates(t).last.id)
  }

  it should "page the log: updates(t, l, o) == updates(t).slice(o, o + l)" in {
    val tr = newTracker()
    val t = init(tr, "paged")
    val p = Partition("date", "2024-01-01")
    (1 to 7).foreach(_ => tr.commit(t, upd(AddPartitionVersion(p, Version.generate()))))
    val full = tr.updates(t) // 8 incl. init, newest first
    full should have size 8
    // every (limit, offset) window, including empty / past-the-end pages
    for (limit <- List(0, 1, 3, 8, 20); offset <- List(0, 1, 5, 8, 20))
      withClue(s"limit=$limit offset=$offset: ") {
        tr.updates(t, limit, offset) shouldBe full.slice(offset, offset + limit)
      }
    // paging through reconstructs the whole log
    Iterator.from(0, 3).map(off => tr.updates(t, 3, off)).takeWhile(_.nonEmpty)
      .flatten.toList shouldBe full
    // offset + limit overflowing Int must not wrap into an empty page
    tr.updates(t, Int.MaxValue, 1) shouldBe full.drop(1)
    tr.updates(t, Int.MaxValue, Int.MaxValue) shouldBe Nil
    an[IllegalArgumentException] should be thrownBy tr.updates(t, -1, 0)
    an[IllegalArgumentException] should be thrownBy tr.updates(t, 1, -1)
    an[UnknownTableError] should be thrownBy
      tr.updates(TableName("nope", "nope"), 1, 0)
  }

  it should "keyset-page the log: concatenated pages == updates(t), stable under a mid-pagination commit" in {
    val tr = newTracker()
    val t = init(tr, "keyset")
    val p = Partition("date", "2024-01-01")
    (1 to 7).foreach(_ => tr.commit(t, upd(AddPartitionVersion(p, Version.generate()))))
    val full = tr.updates(t) // 8 incl. init, newest first

    // full walk reconstructs the log for every page size (incl. one that
    // lands exactly on the end)
    def walk(pageSize: Int): List[TableUpdateMetadata] = {
      var cursor: Option[String] = None
      var more = true
      val acc = List.newBuilder[TableUpdateMetadata]
      while (more) {
        val (page, next) = tr.updatesPage(t, pageSize, cursor)
        acc ++= page
        cursor = next
        more = next.isDefined
      }
      acc.result()
    }
    for (size <- List(1, 3, 4, 8, 20))
      withClue(s"pageSize=$size: ") { walk(size) shouldBe full }

    // THE keyset property: a commit landing between page reads neither
    // duplicates a boundary entry (the offset-paging defect) nor hides a
    // pre-existing commit
    val (page1, cur1) = tr.updatesPage(t, 3, None)
    tr.commit(t, upd(AddPartitionVersion(p, Version.generate()))) // live writer
    val (page2, cur2) = tr.updatesPage(t, 3, cur1)
    val (page3, _) = tr.updatesPage(t, 3, cur2)
    val walked = page1 ++ page2 ++ page3
    walked.map(_.id).distinct should have size walked.size.toLong // no double-print
    walked.map(_.id) shouldBe full.map(_.id) // exactly the log at walk start
    // a FRESH walk sees the new commit too
    walk(3).map(_.id) shouldBe tr.updates(t).map(_.id)

    // degenerate pages + errors
    tr.updatesPage(t, 0, None)._1 shouldBe Nil
    an[IllegalArgumentException] should be thrownBy tr.updatesPage(t, -1, None)
    an[UnknownTableError] should be thrownBy tr.updatesPage(TableName("no", "no"), 1, None)
  }

  it should "keyset-page FULL commits oldest-first: concatenated pages == tableState(t).updates" in {
    val tr = newTracker()
    val t = init(tr, "asc")
    val p = Partition("date", "2024-01-01")
    (1 to 7).foreach(_ => tr.commit(t, upd(AddPartitionVersion(p, Version.generate()))))
    val full = tr.tableState(t).updates // 8 incl. init, OLDEST first

    def walk(pageSize: Int, from: Option[String] = None): List[TableUpdate] = {
      var cursor = from
      var more = true
      val acc = List.newBuilder[TableUpdate]
      while (more) {
        val (page, next) = tr.commitsPageAsc(t, pageSize, cursor)
        acc ++= page
        cursor = next
        more = next.isDefined
      }
      acc.result()
    }
    // full walk reconstructs the history — operations included, not just
    // metadata — for every page size (incl. one landing exactly on the end)
    for (size <- List(1, 3, 4, 8, 20))
      withClue(s"pageSize=$size: ") { walk(size) shouldBe full }

    // ascending-iteration law (monotonic clocks, as here): a commit landing
    // mid-walk sorts AFTER the cursor, so later pages pick it up (the
    // bulk-consumer-friendly dual of the descending page's stability;
    // cross-process clock skew weakens this to present-at-start coverage —
    // see the commitsPageAsc scaladoc)
    val (page1, cur1) = tr.commitsPageAsc(t, 3, None)
    val late = upd(AddPartitionVersion(p, Version.generate()))
    tr.commit(t, late)
    cur1 should not be empty
    (page1 ++ walk(3, cur1)) shouldBe (full :+ late)

    // degenerate pages + errors
    tr.commitsPageAsc(t, 0, None)._1 shouldBe Nil
    an[IllegalArgumentException] should be thrownBy tr.commitsPageAsc(t, -1, None)
    an[UnknownTableError] should be thrownBy tr.commitsPageAsc(TableName("no", "no"), 1, None)
  }

  it should "report the current REF via currentRef, including after checkout" in {
    val tr = newTracker()
    val t = init(tr, "ref")
    val p = Partition("date", "2024-01-01")
    val u1 = upd(AddPartitionVersion(p, Version.generate()))
    val u2 = upd(AddPartitionVersion(p, Version.generate()))
    tr.commit(t, u1); tr.commit(t, u2)
    tr.currentRef(t) shouldBe u2.metadata.id
    tr.currentRef(t) shouldBe tr.tableState(t).currentVersion
    // after a historical checkout the ref points MID-history: currentRef
    // follows the ref, not the newest commit
    tr.setCurrentVersion(t, u1.metadata.id)
    tr.currentRef(t) shouldBe u1.metadata.id
    tr.updates(t, 1, 0).head.id shouldBe u2.metadata.id // newest != ref here
    an[UnknownTableError] should be thrownBy tr.currentRef(TableName("no", "no"))
  }

  it should "retain commits with no operations in history and checkout" in {
    val tr = newTracker()
    val t = init(tr, "noop")
    val p = Partition("date", "2024-01-01")
    val v = Version.generate()
    tr.commit(t, upd(AddPartitionVersion(p, v)))
    val marker = upd() // empty op list — a marker commit
    tr.commit(t, marker)
    val v2 = Version.generate()
    tr.commit(t, upd(AddPartitionVersion(p, v2)))

    tr.updates(t) should have size 4
    tr.updates(t)(1).id shouldBe marker.metadata.id
    // checkout to the marker replays history up to and including it
    tr.setCurrentVersion(t, marker.metadata.id)
    tr.currentVersion(t) shouldBe PartitionedTableVersion(Map(p -> v))
  }

  it should "commitIf only when the head matches, leaving the log untouched on conflict" in {
    val tr = newTracker()
    val t = init(tr, "cas")
    val p = Partition("date", "2024-01-01")
    val head0 = tr.tableState(t).currentVersion

    // CAS against the current head succeeds and moves the head
    val u1 = upd(AddPartitionVersion(p, Version.generate()))
    tr.commitIf(t, u1, head0)
    tr.tableState(t).currentVersion shouldBe u1.metadata.id

    // CAS against the STALE head fails with the conflict error...
    val u2 = upd(AddPartitionVersion(p, Version.generate()))
    val e = the[CommitConflictError] thrownBy tr.commitIf(t, u2, head0)
    e.expected shouldBe head0
    e.actual shouldBe u1.metadata.id
    // ...and leaves history AND head untouched
    tr.tableState(t).currentVersion shouldBe u1.metadata.id
    tr.updates(t) should have size 2
    tr.updates(t).map(_.id) should not contain u2.metadata.id

    // re-read and retry succeeds
    tr.commitIf(t, u2, u1.metadata.id)
    tr.tableState(t).currentVersion shouldBe u2.metadata.id
    tr.updates(t) should have size 3
  }

  it should "let exactly one of two racing commitIf writers win" in {
    val tr = newTracker()
    val t = init(tr, "race")
    val p = Partition("date", "2024-01-01")
    val head0 = tr.tableState(t).currentVersion
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    try {
      val start = new CountDownLatch(1)
      val outcomes = (0 until 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            start.await()
            try { tr.commitIf(t, upd(AddPartitionVersion(p, Version.generate())), head0); true }
            catch { case _: CommitConflictError => false }
          }
        })
      }
      start.countDown()
      val wins = outcomes.map(_.get(30, TimeUnit.SECONDS)).count(identity)
      wins shouldBe 1
      tr.updates(t) should have size 2 // init + the single winner
    } finally pool.shutdownNow()
  }

  it should "create, list, resolve and delete immutable tags" in {
    val tr = newTracker()
    val t = init(tr, "tagged")
    val p = Partition("date", "2024-01-01")
    val u1 = upd(AddPartitionVersion(p, Version.generate()))
    val u2 = upd(AddPartitionVersion(p, Version.generate()))
    tr.commit(t, u1)
    tr.commit(t, u2)

    tr.tags(t) shouldBe Nil
    tr.createTag(t, "train-v1", u1.metadata.id)
    tr.createTag(t, "train-v2.0_final", u2.metadata.id)
    tr.tags(t) shouldBe List(
      "train-v1" -> u1.metadata.id, "train-v2.0_final" -> u2.metadata.id)
    tr.tagCommit(t, "train-v1") shouldBe u1.metadata.id

    // tags are immutable: re-creating under the same name is refused
    an[TagExistsError] should be thrownBy tr.createTag(t, "train-v1", u2.metadata.id)
    tr.tagCommit(t, "train-v1") shouldBe u1.metadata.id

    // a tag pins a readable state even after the head moves on
    tr.tableState(t).versionAt(tr.tagCommit(t, "train-v1")) shouldBe
      tr.tableState(t).versionAt(u1.metadata.id)

    tr.deleteTag(t, "train-v1")
    tr.tags(t).map(_._1) shouldBe List("train-v2.0_final")
    an[UnknownTagError] should be thrownBy tr.deleteTag(t, "train-v1")
    an[UnknownTagError] should be thrownBy tr.tagCommit(t, "train-v1")
  }

  it should "reject tags on unknown commits and invalid names" in {
    val tr = newTracker()
    val t = init(tr, "tagerr")
    an[UnknownCommitError] should be thrownBy tr.createTag(t, "x", CommitId("bogus"))
    val head = tr.tableState(t).currentVersion
    an[IllegalArgumentException] should be thrownBy tr.createTag(t, "", head)
    an[IllegalArgumentException] should be thrownBy tr.createTag(t, "../escape", head)
    an[IllegalArgumentException] should be thrownBy tr.createTag(t, "has space", head)
    an[IllegalArgumentException] should be thrownBy tr.createTag(t, "a" * 300, head)
    // deleteTag validates too — on the file store an unvalidated name is a
    // PATH, and "x/../head" would resolve onto (and delete) the head ref
    an[IllegalArgumentException] should be thrownBy tr.deleteTag(t, "x/../head")
    an[IllegalArgumentException] should be thrownBy tr.deleteTag(t, "a" * 300)
    tr.tableState(t).currentVersion shouldBe head // head untouched
    an[UnknownTableError] should be thrownBy tr.tags(TableName("no", "such"))
    tr.tags(t) shouldBe Nil
  }

  it should "raise UnknownTableError for untracked tables" in {
    val tr = newTracker()
    an[UnknownTableError] should be thrownBy tr.tableState(TableName("no", "such"))
    an[UnknownTableError] should be thrownBy tr.commit(TableName("no", "such"), upd())
  }

  it should "resolve commitIdAsOf and parentCommit exactly like the full history" in {
    val tr = newTracker()
    val t = init(tr, "t")
    // deliberately NON-monotonic commit timestamps (cross-process clock
    // skew): the resolution rule is "latest in COMMIT order with ts <=
    // instant", which the bounded newest-first walk must reproduce exactly
    val base = Instant.parse("2026-01-01T00:00:00Z")
    val offsets = Seq(10L, 30L, 20L, 50L, 40L)
    offsets.foreach { o =>
      tr.commit(t, TableUpdate(UserId("u"), s"c$o", base.plusSeconds(o),
        List(AddPartitionVersion(Partition("day", f"d$o%03d"), Version.generate()))))
    }
    val st = tr.tableState(t)
    // probe instants around every commit time plus far past/future
    val probes = (0L to 60L by 5L).map(base.plusSeconds) :+ base.minusSeconds(9999)
    probes.foreach { ts =>
      tr.commitIdAsOf(t, ts) shouldBe st.commitIdAsOf(ts)
    }
    // parentCommit agrees with history adjacency over the whole log
    val hist = st.updates.map(_.metadata.id)
    hist.zipWithIndex.foreach { case (id, i) =>
      tr.parentCommit(t, id) shouldBe (if (i == 0) None else Some(hist(i - 1)))
    }
    an[UnknownCommitError] should be thrownBy tr.parentCommit(t, CommitId("bogus"))
  }

  it should "raise UnknownCommitError for unknown commit ids" in {
    val tr = newTracker()
    val t = init(tr, "t")
    an[UnknownCommitError] should be thrownBy tr.setCurrentVersion(t, CommitId("bogus"))
    // and the current state is unchanged
    tr.currentVersion(t) shouldBe PartitionedTableVersion(Map.empty)
  }
}

class InMemoryVersionTrackerSpec extends VersionTrackerContract {
  override def newTracker(): VersionTracker = new InMemoryVersionTracker
}

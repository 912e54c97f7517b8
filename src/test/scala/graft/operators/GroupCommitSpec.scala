package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables._

import java.nio.file.Files
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Multi-table atomic publish ([[graft.core.GroupCommitTracker]] +
  * [[VersionedTables.publishAtomically]]): all tables advance together or
  * none does; racing groups never interleave heads (the MultiProcessCommit-
  * style law, here over the sorted-lock file-store implementation). */
class GroupCommitSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def twoTables(): (VersionedTables, TableDefinition, TableDefinition) = {
    val dir = Files.createTempDirectory("graft-group-").toFile
    val engine = VersionedTables.withFileStore(spark,
      new java.io.File(dir, "store").toURI)
    def t(n: String) = TableDefinition(TableName("grp", s"$n${seq.incrementAndGet()}"),
      new java.io.File(dir, n).toURI, PartitionSchema("day"), FileFormat.Parquet)
    val (a, b) = (t("a"), t("b"))
    engine.initTable(a, UserId("t"), "init")
    engine.initTable(b, UserId("t"), "init")
    (engine, a, b)
  }

  it should "publish two tables as one atomic group" in {
    val (engine, a, b) = twoTables()
    val headA = engine.headCommit(a.name)
    val headB = engine.headCommit(b.name)
    val sa = Seq((1L, "d1")).toDF("k", "day").stageInsertInto(engine, a, UserId("t"), "load a")
    val sb = Seq((2L, "d1")).toDF("k", "day").stageInsertInto(engine, b, UserId("t"), "load b")
    // nothing visible before the group lands
    engine.read(a).count() shouldBe 0
    val changes = engine.publishAtomically(Seq(sa -> headA, sb -> headB))
    changes.keySet shouldBe Set(a.name, b.name)
    engine.read(a).count() shouldBe 1
    engine.read(b).count() shouldBe 1
    engine.log(a.name).head.message shouldBe "load a"
    engine.log(b.name).head.message shouldBe "load b"
  }

  it should "advance NO table when any expected head moved" in {
    val (engine, a, b) = twoTables()
    val headA = engine.headCommit(a.name)
    val headB = engine.headCommit(b.name)
    val sa = Seq((1L, "d1")).toDF("k", "day").stageInsertInto(engine, a, UserId("t"), "grp a")
    val sb = Seq((2L, "d1")).toDF("k", "day").stageInsertInto(engine, b, UserId("t"), "grp b")
    // an interloper commits to b — the WHOLE group must refuse
    Seq((9L, "d9")).toDF("k", "day").versionedInsertInto(engine, b, UserId("x"), "interloper")
    val bHeadAfter = engine.headCommit(b.name)
    intercept[CommitConflictError] {
      engine.publishAtomically(Seq(sa -> headA, sb -> headB))
    }
    engine.headCommit(a.name) shouldBe headA // a did NOT advance
    engine.headCommit(b.name) shouldBe bHeadAfter
    engine.read(a).count() shouldBe 0
    // the staged files are ordinary reclaimable debris
    engine.orphanedVersions(a) should not be empty
  }

  it should "commit groups in ONE transaction on the JDBC store (all-or-nothing incl. conflicts)" in {
    val db = Files.createTempDirectory("graft-grpjdbc-").resolve("db")
    val tr = new graft.sources.JdbcVersionTracker(s"jdbc:derby:$db;create=true")
    val (ta, tb) = (TableName("grp", "ja"), TableName("grp", "jb"))
    val now = java.time.Instant.now()
    tr.initTable(ta, isSnapshot = false, UserId("t"), "init", now)
    tr.initTable(tb, isSnapshot = false, UserId("t"), "init", now)
    val (headA, headB) = (tr.currentRef(ta), tr.currentRef(tb))
    def upd(msg: String) = TableUpdate(UserId("t"), msg, java.time.Instant.now(),
      List(TableOperation.AddPartitionVersion(Partition("day", "d1"), Version.generate())))
    tr.commitGroup(List((ta, upd("g-a"), headA), (tb, upd("g-b"), headB)))
    tr.updates(ta).head.message shouldBe "g-a"
    tr.updates(tb).head.message shouldBe "g-b"
    // stale heads: the single transaction rolls EVERYTHING back — no
    // orphan update rows, no advanced heads
    val (h2a, h2b) = (tr.currentRef(ta), tr.currentRef(tb))
    intercept[CommitConflictError] {
      tr.commitGroup(List((ta, upd("h-a"), h2a), (tb, upd("h-b"), headB)))
    }
    tr.currentRef(ta) shouldBe h2a
    tr.currentRef(tb) shouldBe h2b
    tr.updates(ta).map(_.message) should not contain "h-a"
    // the connection stays usable after the rollback
    tr.commitGroup(List((ta, upd("i-a"), h2a), (tb, upd("i-b"), h2b)))
    tr.updates(ta).head.message shouldBe "i-a"
  }

  it should "serialize racing groups: exactly one wins, heads never interleave" in {
    val (engine, a, b) = twoTables()
    // seed both tables so every group CASes on a real data head
    Seq((0L, "d0")).toDF("k", "day").versionedInsertInto(engine, a, UserId("t"), "seed a")
    Seq((0L, "d0")).toDF("k", "day").versionedInsertInto(engine, b, UserId("t"), "seed b")
    val headA = engine.headCommit(a.name)
    val headB = engine.headCommit(b.name)
    val tracker = engine.tracker.asInstanceOf[GroupCommitTracker]

    def group(tag: String): List[(TableName, TableUpdate, CommitId)] = {
      val v = Version.generate()
      List(
        (a.name, TableUpdate(UserId(tag), s"$tag-a", java.time.Instant.now(),
          List(TableOperation.AddPartitionVersion(Partition("day", "dx"), v))), headA),
        // OPPOSITE table order on purpose: the sorted-lock discipline must
        // prevent deadlock and interleaving regardless of caller order
        (b.name, TableUpdate(UserId(tag), s"$tag-b", java.time.Instant.now(),
          List(TableOperation.AddPartitionVersion(Partition("day", "dx"), v))), headB))
    }
    val winnersQ = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        val commits = if (i % 2 == 0) group(s"g$i") else group(s"g$i").reverse
        try { tracker.commitGroup(commits); winnersQ.add(s"g$i"); () }
        catch { case _: CommitConflictError => () }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val winners = winnersQ.asScala.toList
    winners.size shouldBe 1 // every group CASed on the same heads
    val w = winners.head
    // BOTH tables' newest commits belong to the single winner — no mix
    engine.log(a.name).head.message shouldBe s"$w-a"
    engine.log(b.name).head.message shouldBe s"$w-b"
  }
}

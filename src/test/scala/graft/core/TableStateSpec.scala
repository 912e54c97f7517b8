package graft.core

import java.time.Instant
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import TableOperation._

/** Fold-law tests mirroring the reference's VersionTrackerObjectSpec.scala:218-289. */
class TableStateSpec extends AnyFlatSpec with Matchers {

  val t: TableName = TableName("db", "t")
  def upd(ops: TableOperation*): TableUpdate =
    TableUpdate(UserId("u"), "m", Instant.now(), ops.toList)

  val p1: Partition = Partition("date", "2019-01-01")
  val p2: Partition = Partition("date", "2019-01-02")
  val v1: Version = Version.generate()
  val v2: Version = Version.generate()
  val v3: Version = Version.generate()

  "foldVersion" should "apply partition adds as map puts" in {
    TableState.foldVersion(List(
      upd(InitTable(t, isSnapshot = false)),
      upd(AddPartitionVersion(p1, v1), AddPartitionVersion(p2, v2)))) shouldBe
      PartitionedTableVersion(Map(p1 -> v1, p2 -> v2))
  }

  it should "let a later version of the same partition win" in {
    TableState.foldVersion(List(
      upd(InitTable(t, isSnapshot = false)),
      upd(AddPartitionVersion(p1, v1)),
      upd(AddPartitionVersion(p1, v2)))) shouldBe
      PartitionedTableVersion(Map(p1 -> v2))
  }

  it should "remove partitions" in {
    TableState.foldVersion(List(
      upd(InitTable(t, isSnapshot = false)),
      upd(AddPartitionVersion(p1, v1), AddPartitionVersion(p2, v2)),
      upd(RemovePartition(p1)))) shouldBe
      PartitionedTableVersion(Map(p2 -> v2))
  }

  it should "give a re-added partition its fresh version" in {
    TableState.foldVersion(List(
      upd(InitTable(t, isSnapshot = false)),
      upd(AddPartitionVersion(p1, v1)),
      upd(RemovePartition(p1)),
      upd(AddPartitionVersion(p1, v3)))) shouldBe
      PartitionedTableVersion(Map(p1 -> v3))
  }

  it should "track the last AddTableVersion for snapshot tables" in {
    TableState.foldVersion(List(
      upd(InitTable(t, isSnapshot = true)),
      upd(AddTableVersion(v1)),
      upd(AddTableVersion(v2)))) shouldBe SnapshotTableVersion(v2)
  }

  it should "yield empty state for init-only history" in {
    TableState.foldVersion(List(upd(InitTable(t, isSnapshot = false)))) shouldBe
      PartitionedTableVersion(Map.empty)
    TableState.foldVersion(List(upd(InitTable(t, isSnapshot = true)))) shouldBe
      SnapshotTableVersion(Version.Unversioned)
  }

  "foldForward" should "satisfy foldForward(foldVersion(a), b) == foldVersion(a ++ b) at EVERY split point" in {
    // the law that makes "checkpointed folded state + commit tail" a valid
    // substitute for replaying the whole history (bounded-memory currentVersion)
    val partitioned = List(
      upd(InitTable(t, isSnapshot = false)),
      upd(AddPartitionVersion(p1, v1), AddPartitionVersion(p2, v2)),
      upd(RemovePartition(p1)),
      upd(AddPartitionVersion(p1, v3)),
      upd(RemovePartition(p2), AddPartitionVersion(p2, v1)),
      upd(RemovePartition(p1)))
    val snapshot = List(
      upd(InitTable(t, isSnapshot = true)),
      upd(AddTableVersion(v1)),
      upd(AddTableVersion(v2)),
      upd(AddTableVersion(v3)))
    for (history <- List(partitioned, snapshot); split <- 1 to history.length) {
      val (a, b) = history.splitAt(split)
      withClue(s"split at $split of ${history.length}:") {
        TableState.foldForward(TableState.foldVersion(a), b) shouldBe
          TableState.foldVersion(history)
      }
    }
  }

  it should "ignore InitTable operations in the tail (commit #0 is always inside the prefix)" in {
    TableState.foldForward(
      PartitionedTableVersion(Map(p1 -> v1)),
      List(upd(InitTable(t, isSnapshot = true)), upd(AddPartitionVersion(p2, v2)))) shouldBe
      PartitionedTableVersion(Map(p1 -> v1, p2 -> v2))
  }

  it should "be identity on an empty tail" in {
    TableState.foldForward(SnapshotTableVersion(v1), Nil) shouldBe SnapshotTableVersion(v1)
    TableState.foldForward(PartitionedTableVersion(Map(p1 -> v1)), Nil) shouldBe
      PartitionedTableVersion(Map(p1 -> v1))
  }

  "currentTableVersion" should "replay only up to the current ref" in {
    val u1 = upd(InitTable(t, isSnapshot = false))
    val u2 = upd(AddPartitionVersion(p1, v1))
    val u3 = upd(AddPartitionVersion(p1, v2), AddPartitionVersion(p2, v3))
    val all = List(u1, u2, u3)
    TableState(u3.metadata.id, all).currentTableVersion shouldBe
      PartitionedTableVersion(Map(p1 -> v2, p2 -> v3))
    TableState(u2.metadata.id, all).currentTableVersion shouldBe
      PartitionedTableVersion(Map(p1 -> v1))
    TableState(u1.metadata.id, all).currentTableVersion shouldBe
      PartitionedTableVersion(Map.empty)
  }
}

package graft.core

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import MetastoreOperation._

/** Diff-algorithm laws mirroring the reference's MetastoreObjectSpec.scala:215-277. */
class MetastoreDiffSpec extends AnyFlatSpec with Matchers {

  val p1: Partition = Partition("date", "2019-01-01")
  val p2: Partition = Partition("date", "2019-01-02")
  val p3: Partition = Partition("date", "2019-01-03")
  val v1: Version = Version.generate()
  val v2: Version = Version.generate()

  "computeChanges" should "be a no-op for equal versions" in {
    val cur = PartitionedTableVersion(Map(p1 -> v1, p2 -> v2))
    Metastore.computeChanges(cur, cur) shouldBe TableChanges.empty
    Metastore.computeChanges(SnapshotTableVersion(v1), SnapshotTableVersion(v1)) shouldBe TableChanges.empty
  }

  it should "emit AddPartition for new partitions" in {
    Metastore.computeChanges(
      PartitionedTableVersion(Map(p1 -> v1)),
      PartitionedTableVersion(Map(p1 -> v1, p2 -> v2))) shouldBe
      TableChanges(List(AddPartition(p2, v2)))
  }

  it should "emit RemovePartition for dropped partitions" in {
    Metastore.computeChanges(
      PartitionedTableVersion(Map(p1 -> v1, p2 -> v2)),
      PartitionedTableVersion(Map(p1 -> v1))) shouldBe
      TableChanges(List(RemovePartition(p2)))
  }

  it should "emit UpdatePartitionVersion for changed versions" in {
    Metastore.computeChanges(
      PartitionedTableVersion(Map(p1 -> v1)),
      PartitionedTableVersion(Map(p1 -> v2))) shouldBe
      TableChanges(List(UpdatePartitionVersion(p1, v2)))
  }

  it should "combine adds, updates and removes" in {
    val changes = Metastore.computeChanges(
      PartitionedTableVersion(Map(p1 -> v1, p2 -> v1)),
      PartitionedTableVersion(Map(p1 -> v2, p3 -> v1)))
    changes.operations should contain theSameElementsAs List(
      AddPartition(p3, v1), UpdatePartitionVersion(p1, v2), RemovePartition(p2))
  }

  it should "emit UpdateTableVersion for snapshot version changes" in {
    Metastore.computeChanges(SnapshotTableVersion(v1), SnapshotTableVersion(v2)) shouldBe
      TableChanges(List(UpdateTableVersion(v2)))
  }

  it should "reject snapshot/partitioned switches" in {
    an[IllegalArgumentException] should be thrownBy
      Metastore.computeChanges(SnapshotTableVersion(v1), PartitionedTableVersion(Map(p1 -> v1)))
    an[IllegalArgumentException] should be thrownBy
      Metastore.computeChanges(PartitionedTableVersion(Map(p1 -> v1)), SnapshotTableVersion(v1))
  }
}

package graft.core

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files
import java.time.Instant

/** A head ref pointing at a commit that is not in the log is store
  * corruption; it must fail loudly, never silently read as "latest"
  * (round-2 hardening, ADVICE r1). */
class CorruptHeadSpec extends AnyFlatSpec with Matchers {

  private def update(ops: List[TableOperation]) =
    TableUpdate(UserId("u"), "m", Instant.EPOCH, ops)

  "TableState.currentTableVersion" should "throw UnknownCommitError for an absent head id" in {
    val t = TableName("s", "t")
    val u1 = update(List(TableOperation.InitTable(t, isSnapshot = false)))
    val st = TableState(CommitId("not-a-real-commit"), List(u1))
    an[UnknownCommitError] should be thrownBy st.currentTableVersion
  }

  it should "still fold correctly when the head IS present" in {
    val t = TableName("s", "t")
    val v = Version.generate()
    val u1 = update(List(TableOperation.InitTable(t, isSnapshot = false)))
    val u2 = update(List(TableOperation.AddPartitionVersion(Partition("d", "1"), v)))
    TableState(u2.metadata.id, List(u1, u2)).currentTableVersion shouldBe
      PartitionedTableVersion(Map(Partition("d", "1") -> v))
    // head at u1 replays only up to u1
    TableState(u1.metadata.id, List(u1, u2)).currentTableVersion shouldBe
      PartitionedTableVersion(Map.empty)
  }

  "FileBackedVersionTracker" should "fail loudly on a corrupt head file and leave no temp debris" in {
    val dir = Files.createTempDirectory("graft-head-")
    val tracker = new graft.sources.FileBackedVersionTracker(dir.toUri)
    val t = TableName("s", "t")
    tracker.initTable(t, isSnapshot = false, UserId("u"), "init", Instant.EPOCH)
    tracker.commit(t, update(List(
      TableOperation.AddPartitionVersion(Partition("d", "1"), Version.generate()))))

    // atomic rename leaves exactly one head.json and no tmp files behind
    val tableDir = Files.list(dir).filter(_.getFileName.toString.startsWith("_graft_table_"))
      .findFirst().get()
    val names = Files.list(tableDir).map(_.getFileName.toString).toArray.map(_.toString)
    names.count(_ == "head.json") shouldBe 1
    names.count(_.contains(".tmp-")) shouldBe 0

    // now corrupt the head: point it at a commit id that doesn't exist
    // (drop the sidecar checksum too — we're bypassing the Hadoop FS API)
    Files.deleteIfExists(tableDir.resolve(".head.json.crc"))
    Files.write(tableDir.resolve("head.json"), "deadbeef".getBytes)
    an[UnknownCommitError] should be thrownBy tracker.currentVersion(t)
  }
}

package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Generative algebraic law: for ANY pair of table versions (cur, tgt),
  * applying `computeChanges(cur, tgt)` to a catalog currently showing `cur`
  * must make it show exactly `tgt`. This is the property that makes catalog
  * state re-derivable from the commit log at any time. */
class MetastoreSyncLawSpec extends AnyFlatSpec with Matchers {

  val genVersion: Gen[Version] = Gen.choose(0L, 1L << 40).map { n =>
    Version(java.time.Instant.ofEpochSecond(n % 100000000L),
      new java.util.UUID(n, n * 31 + 7))
  }

  val genPartition: Gen[Partition] = for {
    col <- Gen.oneOf("date", "region", "bucket")
    v <- Gen.choose(1, 40)
  } yield Partition(col, s"v$v")

  val genPartitionMap: Gen[Map[Partition, Version]] = for {
    n <- Gen.choose(0, 12)
    ps <- Gen.listOfN(n, genPartition)
    vs <- Gen.listOfN(n, genVersion)
  } yield ps.zip(vs).toMap

  def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).getOrElse(fail("gen failed"))

  "computeChanges applied to a catalog" should "always produce the target view (partitioned)" in {
    val t = TableName("law", "t")
    (1 to 300).foreach { i =>
      val cur = PartitionedTableVersion(sample(genPartitionMap, i * 2L))
      val tgt = PartitionedTableVersion(sample(genPartitionMap, i * 2L + 1))
      val catalog = new InMemoryMetastore
      // seed the catalog at `cur` starting from empty
      catalog.update(t, Metastore.computeChanges(PartitionedTableVersion(Map.empty), cur))
      val changes = Metastore.computeChanges(cur, tgt)
      catalog.update(t, changes)
      withClue(s"iteration $i: cur=$cur tgt=$tgt changes=$changes\n") {
        (try catalog.currentVersion(t)
        catch { case _: UnknownTableError => PartitionedTableVersion(Map.empty) }) shouldBe tgt
      }
    }
  }

  it should "always produce the target view (snapshot)" in {
    val t = TableName("law", "s")
    (1 to 100).foreach { i =>
      val cur = SnapshotTableVersion(sample(genVersion, i * 3L))
      val tgt = SnapshotTableVersion(sample(genVersion, i * 3L + 1))
      val catalog = new InMemoryMetastore
      catalog.update(t, Metastore.computeChanges(SnapshotTableVersion(Version.Unversioned), cur))
      catalog.update(t, Metastore.computeChanges(cur, tgt))
      catalog.currentVersion(t) shouldBe tgt
    }
  }

  "the changes" should "be minimal: no-ops never appear" in {
    (1 to 100).foreach { i =>
      val m = sample(genPartitionMap, i * 5L)
      Metastore.computeChanges(PartitionedTableVersion(m), PartitionedTableVersion(m)) shouldBe
        TableChanges.empty
    }
  }
}

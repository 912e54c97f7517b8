package graft.core

import org.scalacheck.Gen
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * Property coverage of the DELETION-SAFETY invariant behind vacuum: over
 * arbitrary histories, retention windows and pin sets, a URI listed as
 * expirable must never belong to a state any reader can still reach — the
 * last-`keepLast` commits, the current head (wherever a checkout left it),
 * or any pinned (tagged) commit. A violation here is deleted live data, the
 * one unrecoverable failure mode of the whole layer.
 */
class RetentionPropSpec extends AnyFlatSpec with Matchers {

  private val location = new java.net.URI("file:///tmp/reten-prop")
  private val table = TableName("p", "t")

  private val genHistory: Gen[List[TableUpdate]] = {
    val cols = List("day", "region")
    val vals = List("d1", "d2", "d3", "r1")
    val genOp: Gen[TableOperation] = for {
      c <- Gen.oneOf(cols)
      v <- Gen.oneOf(vals)
      add <- Gen.frequency(4 -> true, 1 -> false)
    } yield
      if (add) TableOperation.AddPartitionVersion(Partition(c, v), Version.generate())
      else TableOperation.RemovePartition(Partition(c, v))
    for {
      n <- Gen.choose(1, 12)
      opLists <- Gen.listOfN(n, Gen.choose(0, 3).flatMap(Gen.listOfN(_, genOp)))
    } yield {
      val init = TableUpdate(UserId("u"), "init", java.time.Instant.now(),
        List(TableOperation.InitTable(table, isSnapshot = false)))
      init :: opLists.zipWithIndex.map { case (ops, i) =>
        TableUpdate(UserId("u"), s"c$i", java.time.Instant.now(), ops)
      }
    }
  }

  "expirableVersionUris" should "never list a version visible from any kept, head, or pinned state" in {
    (1 to 300).foreach { seedNo =>
      val seed = org.scalacheck.rng.Seed(seedNo.toLong)
      val params = Gen.Parameters.default
      for {
        history <- genHistory.apply(params, seed)
        keepLast <- Gen.choose(1, history.size + 1).apply(params, seed.next)
        headIdx <- Gen.choose(0, history.size - 1).apply(params, seed.next.next)
        pinIdxs <- Gen.someOf(history.indices).apply(params, seed.next.next.next)
      } {
        val st = TableState(history(headIdx).metadata.id, history)
        val pinned = pinIdxs.toList.map(history(_).metadata.id)
        val expirable = Retention.expirableVersionUris(st, location, keepLast, pinned).toSet

        // every reachable state: last keepLast commits, the head, all pins
        val reachableIds =
          history.takeRight(keepLast).map(_.metadata.id) ++ (st.currentVersion :: pinned)
        val reachableUris = reachableIds.flatMap { id =>
          st.versionAt(id) match {
            case PartitionedTableVersion(pvs) =>
              pvs.toList.map { case (p, v) => VersionPaths.pathFor(p.resolvePath(location), v) }
            case SnapshotTableVersion(v) => List(VersionPaths.pathFor(location, v))
          }
        }.toSet

        withClue(s"seed $seedNo keepLast=$keepLast head=$headIdx pins=$pinIdxs:\n") {
          expirable.intersect(reachableUris) shouldBe empty
          // and expirable ⊆ referenced-by-some-commit (we only ever delete
          // what the log itself wrote)
          val referenced = history.flatMap(_.operations).collect {
            case TableOperation.AddPartitionVersion(p, v) =>
              VersionPaths.pathFor(p.resolvePath(location), v)
            case TableOperation.AddTableVersion(v) =>
              VersionPaths.pathFor(location, v)
          }.toSet
          expirable.subsetOf(referenced) shouldBe true
        }
      }
    }
  }
}

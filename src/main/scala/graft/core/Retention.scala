package graft.core

import java.net.URI

/**
 * Pure retention computations over a table's commit history — Spark-free so
 * both the engine ([[graft.operators.VersionedTables.expirableVersions]] /
 * `vacuum`) and the metadata-only CLI (`graft-cli vacuum`) share one
 * definition of "expirable".
 */
object Retention {

  /** Version directories referenced by SOME commit but not visible in any of
    * the last `keepLast` commits' table states (the head state is always
    * kept, even when the head ref is older than the window — it is what
    * readers see NOW; `pinned` commits — typically tagged ones — are always
    * kept too, which is what makes a tag a durable reproducibility pin:
    * vacuum can never reclaim a tagged dataset state). Deleting the listed
    * URIs caps time travel at `keepLast` commits back; anything NOT listed
    * is live, in-window, or pinned. Adopted pre-versioning data
    * ([[Version.Unversioned]]) lives at the partition root and is never
    * listed. */
  /** The version LABELS visible in any retained state (last `keepLast`
    * commits + head + pinned) — the same liveness [[expirableVersionUris]]
    * computes per (partition, version), collapsed to labels. Vacuum uses it
    * to decide when a per-LABEL artifact (the stats manifest) may go: a
    * label is only reclaimable when NO retained state references it through
    * ANY partition — expiring one partition's directory of a label that
    * other partitions still read must keep the manifest. */
  /** Expand a live (partition, version) set with the DATA versions that
    * live DELETION-VECTOR versions filter ([[TableOperation.SetVersionBase]]
    * bindings): expiring a base while its marker is visible would break
    * every read of the partition. Depth-1 by construction (DV deletes
    * rebase onto the original data version); closed to a fixpoint anyway so
    * a deeper chain could never slip through. */
  private def withDvBases(
      st: TableState,
      live: Set[(Option[Partition], Version)]): Set[(Option[Partition], Version)] = {
    val bases = st.versionBases
    if (bases.isEmpty) live
    else {
      var acc = live
      var grew = true
      while (grew) {
        val extra = acc.collect {
          case (Some(p), v) if bases.contains((p, v)) =>
            (Some(p): Option[Partition], bases((p, v)))
        }
        grew = !extra.subsetOf(acc)
        acc = acc ++ extra
      }
      acc
    }
  }

  def liveVersionLabels(
      st: TableState, keepLast: Int, pinned: List[CommitId] = Nil): Set[String] = {
    require(keepLast >= 1, s"keepLast must be >= 1, was $keepLast")
    val keptIds =
      (st.updates.takeRight(keepLast).map(_.metadata.id) ++ pinned :+ st.currentVersion).distinct
    val live: Set[(Option[Partition], Version)] = keptIds.flatMap { id =>
      st.versionAt(id) match {
        case PartitionedTableVersion(pvs) => pvs.toList.map { case (p, v) => (Some(p), v) }
        case SnapshotTableVersion(v)      => List((None: Option[Partition], v))
      }
    }.toSet
    withDvBases(st, live).map(_._2.label)
  }

  def expirableVersionUris(
      st: TableState, location: URI, keepLast: Int,
      pinned: List[CommitId] = Nil): List[URI] = {
    require(keepLast >= 1, s"keepLast must be >= 1, was $keepLast")
    val keptIds =
      (st.updates.takeRight(keepLast).map(_.metadata.id) ++ pinned :+ st.currentVersion).distinct
    val live: Set[(Option[Partition], Version)] = withDvBases(st, keptIds.flatMap { id =>
      st.versionAt(id) match {
        case PartitionedTableVersion(pvs) => pvs.toList.map { case (p, v) => (Some(p), v) }
        case SnapshotTableVersion(v)      => List((None: Option[Partition], v))
      }
    }.toSet)
    val referenced: List[(Option[Partition], Version)] = st.updates.flatMap(_.operations).collect {
      case TableOperation.AddPartitionVersion(p, v) => (Some(p), v)
      case TableOperation.AddTableVersion(v)        => (None: Option[Partition], v)
    }
    referenced.distinct
      .filterNot(live)
      .filterNot { case (_, v) => v == Version.Unversioned }
      .map {
        case (Some(p), v) => VersionPaths.pathFor(p.resolvePath(location), v)
        case (None, v)    => VersionPaths.pathFor(location, v)
      }
      .sortBy(_.toString)
  }
}

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
  def liveVersionLabels(
      st: TableState, keepLast: Int, pinned: List[CommitId] = Nil): Set[String] = {
    require(keepLast >= 1, s"keepLast must be >= 1, was $keepLast")
    val keptIds =
      (st.updates.takeRight(keepLast).map(_.metadata.id) ++ pinned :+ st.currentVersion).distinct
    keptIds.flatMap { id =>
      st.versionAt(id) match {
        case PartitionedTableVersion(pvs) => pvs.valuesIterator.map(_.label).toList
        case SnapshotTableVersion(v)      => List(v.label)
      }
    }.toSet
  }

  def expirableVersionUris(
      st: TableState, location: URI, keepLast: Int,
      pinned: List[CommitId] = Nil): List[URI] = {
    require(keepLast >= 1, s"keepLast must be >= 1, was $keepLast")
    val keptIds =
      (st.updates.takeRight(keepLast).map(_.metadata.id) ++ pinned :+ st.currentVersion).distinct
    val live: Set[(Option[Partition], Version)] = keptIds.flatMap { id =>
      st.versionAt(id) match {
        case PartitionedTableVersion(pvs) => pvs.toList.map { case (p, v) => (Some(p), v) }
        case SnapshotTableVersion(v)      => List((None: Option[Partition], v))
      }
    }.toSet
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

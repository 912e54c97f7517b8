package graft.operators

import graft.core._
import graft.operators.VersionedTables._
import org.apache.spark.sql.DataFrame

/**
 * Incrementally maintained rollups: keep a destination table equal to
 * `agg(read(src))` by recomputing ONLY the partitions a commit range
 * changed — the materialized-view refresh pattern a 100 TB pipeline needs,
 * built from the engine's own primitives (metadata diff + pruned read +
 * dynamic-overwrite versioned write), no new machinery.
 *
 * Requirements: `src` and `dst` share the same partition schema, and `agg`
 * must be PARTITION-ALIGNED — it groups by (at least) the partition columns
 * and emits them, so the aggregate of a partition's rows lands back in the
 * same partition. Under that contract, per-partition recomputation equals
 * the full recompute (each output partition depends only on its own input
 * partition), which is exactly what the spec pins.
 *
 * Scale shape: the refresh cost is O(changed partitions) — the diff is
 * metadata-only, the read lists only changed partitions
 * ([[VersionedTables.readAt]] with `keep`), the aggregate is
 * map-side-combinable within them, and the write's dynamic partition
 * overwrite touches only the partitions present in its input. A daily
 * refresh of a 10-year rollup costs one day, not ten years.
 */
object IncrementalRollup {

  /**
   * Refresh `dst` for the `src` commit range `(from, to]`: changed (added
   * or repointed) partitions are re-aggregated from `src` AT `to` and
   * versioned-written into `dst` (one commit); partitions REMOVED from
   * `src` in the range are removed from `dst` (a second commit, only when
   * removals exist). Returns (recomputed, removed) partition counts.
   *
   * Idempotent per range: re-running writes the same aggregate rows into
   * the same partitions (a new version of identical content) and
   * re-removing already-absent partitions is a no-op diff.
   */
  def refresh(
      engine: VersionedTables,
      src: TableDefinition,
      dst: TableDefinition,
      from: CommitId,
      to: CommitId,
      agg: DataFrame => DataFrame,
      userId: UserId,
      message: String = ""): (Int, Int) = {
    require(!src.isSnapshot && !dst.isSnapshot,
      "incremental rollup requires partitioned src and dst (a snapshot table has no partition-aligned increments)")
    require(src.partitionSchema == dst.partitionSchema,
      s"src and dst must share a partition schema, got ${src.partitionSchema} vs ${dst.partitionSchema}")
    val msg = if (message.nonEmpty) message else s"rollup refresh $from..$to"
    val changes = engine.changesBetween(src.name, from, to)
    val changed: Set[Partition] = changes.operations.collect {
      case MetastoreOperation.AddPartition(p, _)           => p
      case MetastoreOperation.UpdatePartitionVersion(p, _) => p
    }.toSet
    val removed: List[Partition] = changes.operations.collect {
      case MetastoreOperation.RemovePartition(p) => p
    }
    if (changed.nonEmpty) {
      val rows = engine.readAt(src, to, changed.contains)
      agg(rows).versionedInsertInto(engine, dst, userId, msg)
    }
    if (removed.nonEmpty) {
      // drop only partitions dst actually carries — re-running a range must
      // not fail on an already-propagated removal
      val present = engine.tracker.currentVersion(dst.name) match {
        case PartitionedTableVersion(pvs) => removed.filter(pvs.contains)
        case _                            => Nil
      }
      if (present.nonEmpty)
        engine.versioned.commit(dst.name, TableUpdate(userId, s"$msg (removals)",
          java.time.Instant.now(), present.map(TableOperation.RemovePartition)))
    }
    (changed.size, removed.size)
  }
}

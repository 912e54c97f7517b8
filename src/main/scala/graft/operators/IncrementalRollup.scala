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
   * `src` in the range — plus changed partitions whose aggregate came back
   * EMPTY (a partition repointed to an empty version must not keep its old
   * rollup row) — are removed from `dst` (a second commit, only when needed).
   * Returns (recomputed, removed) partition counts: recomputed = partitions
   * actually rewritten, removed = src removals + empty-aggregate drops.
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
    var staleEmpty: List[Partition] = Nil
    if (changed.nonEmpty) {
      // checkpoint: the partition listing below and the versioned write both
      // consume the aggregate — without it the agg recomputes per use
      val out = agg(engine.readAt(src, to, changed.contains)).localCheckpoint()
      val outParts = VersionedTables.partitionValues(out, dst.partitionSchema).toSet
      if (outParts.nonEmpty) out.versionedInsertInto(engine, dst, userId, msg)
      // a changed src partition that aggregated to ZERO rows (e.g. repointed
      // to an empty version dir) emits nothing, so the dynamic overwrite
      // never touches its dst partition — without this it would keep the
      // PREVIOUS aggregate and break dst == agg(read(src)). Treat it like a
      // src removal.
      staleEmpty = changed.filterNot(outParts).toList
    }
    val toDrop = removed ++ staleEmpty
    if (toDrop.nonEmpty) {
      // drop only partitions dst actually carries — re-running a range must
      // not fail on an already-propagated removal
      val present = engine.tracker.currentVersion(dst.name) match {
        case PartitionedTableVersion(pvs) => toDrop.filter(pvs.contains)
        case _                            => Nil
      }
      if (present.nonEmpty)
        engine.versioned.commit(dst.name, TableUpdate(userId, s"$msg (removals)",
          java.time.Instant.now(), present.sortBy(_.toPath).map(TableOperation.RemovePartition)))
    }
    // a stale-empty partition was DROPPED, not recomputed — count it with
    // the removals so the return matches what actually happened to dst
    (changed.size - staleEmpty.size, removed.size + staleEmpty.size)
  }
}

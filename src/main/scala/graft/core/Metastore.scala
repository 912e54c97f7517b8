package graft.core

/**
 * Metastore-side operation ADT and the version-diff algorithm — the "physical
 * plan" applied to a catalog to make a target `TableVersion` visible
 * (reference `core/src/main/scala/dev/chronicles/core/Metastore.scala:47-85`).
 */
sealed trait MetastoreOperation
object MetastoreOperation {
  final case class AddPartition(partition: Partition, version: Version) extends MetastoreOperation
  final case class UpdatePartitionVersion(partition: Partition, version: Version) extends MetastoreOperation
  final case class RemovePartition(partition: Partition) extends MetastoreOperation
  final case class UpdateTableVersion(version: Version) extends MetastoreOperation
  /** Widen the catalog's column list to `schemaJson` (additive evolution
    * reaching a synced catalog: Hive's fixed column list would otherwise
    * hide evolved columns from every `spark.table()` reader). Emitted by
    * [[graft.core.VersionedMetastore]] when the commit being synced carries
    * a [[TableOperation.SetTableSchema]]; NOT produced by the version diff
    * ([[Metastore.computeChanges]]) — a rollback never retracts columns
    * (additive evolution is one-way; old partitions read NULL). */
  final case class UpdateSchema(schemaJson: String) extends MetastoreOperation
}

final case class TableChanges(operations: List[MetastoreOperation])
object TableChanges {
  val empty: TableChanges = TableChanges(Nil)
}

/** A catalog that can be synced to a target table version. The engine ships a
  * path-resolving implementation ([[graft.spark.PathCatalog]]); the seam is
  * kept so a Hive/Glue implementation can exist (reference Metastore trait). */
trait Metastore {
  /** The catalog's *actual* current view of the table. */
  def currentVersion(table: TableName): TableVersion
  /** Apply a change list. */
  def update(table: TableName, changes: TableChanges): Unit
}

object Metastore {

  /**
   * Diff two table versions into a minimal operation list
   * (reference Metastore.scala:56-85; laws MetastoreObjectSpec.scala:215-277):
   *  - partition in target only            ⇒ AddPartition
   *  - partition in current only           ⇒ RemovePartition
   *  - in both with a different version    ⇒ UpdatePartitionVersion
   *  - snapshot version changed            ⇒ UpdateTableVersion
   *  - equal versions                      ⇒ no-op
   *  - snapshot ↔ partitioned switch       ⇒ error
   */
  def computeChanges(current: TableVersion, target: TableVersion): TableChanges =
    (current, target) match {
      case (SnapshotTableVersion(cur), SnapshotTableVersion(tgt)) =>
        if (cur == tgt) TableChanges.empty
        else TableChanges(List(MetastoreOperation.UpdateTableVersion(tgt)))

      case (PartitionedTableVersion(cur), PartitionedTableVersion(tgt)) =>
        val curKeys = cur.keySet
        val tgtKeys = tgt.keySet
        val added = (tgtKeys -- curKeys).toList.sortBy(_.toPath).map(p => MetastoreOperation.AddPartition(p, tgt(p)))
        val removed = (curKeys -- tgtKeys).toList.sortBy(_.toPath).map(MetastoreOperation.RemovePartition)
        val updated = (curKeys & tgtKeys).toList.sortBy(_.toPath).collect {
          case p if cur(p) != tgt(p) => MetastoreOperation.UpdatePartitionVersion(p, tgt(p))
        }
        TableChanges(added ++ updated ++ removed)

      case _ =>
        throw new IllegalArgumentException(
          "Cannot compute changes between partitioned and snapshot table versions")
    }
}

package graft.sources

import graft.core._

import java.net.URI

/**
 * AWS-Glue-shaped catalog model: the minimal slice of the Glue Data Catalog
 * API the metastore sync needs (semantics per the reference
 * `aws-glue/src/main/scala/dev/chronicles/awsglue/GlueMetastore.scala:20-175`).
 * Partition identity in Glue is the ordered VALUE list (column names live on
 * the table's partition keys), and every entity carries a storage descriptor
 * whose location is where versioning happens.
 */
final case class GlueStorage(
    location: String,
    inputFormat: Option[String] = None,
    outputFormat: Option[String] = None,
    serdeLibrary: Option[String] = None)

final case class GlueTableInfo(
    database: String,
    name: String,
    partitionKeys: List[String],
    storage: GlueStorage,
    // (name, catalog type) column list — Glue's StorageDescriptor.Columns.
    // Additive evolution widens it via UpdateTable so Glue-catalog readers
    // see evolved columns (the Hive ADD COLUMNS analogue).
    columns: List[(String, String)] = Nil)

final case class GluePartitionInfo(values: List[String], storage: GlueStorage)

/**
 * The Glue client seam: the five calls the sync uses (`GetTable`,
 * `UpdateTable`, `CreatePartition`, `UpdatePartition`, `DeletePartition`,
 * `GetPartitions` — reference GlueMetastore.scala:95-168). A production
 * implementation wraps the AWS SDK client one-to-one; [[InMemoryGlueApi]] is
 * the offline stand-in with the same error semantics.
 */
trait GlueApi {
  def getTable(database: String, name: String): Option[GlueTableInfo]
  def updateTable(database: String, table: GlueTableInfo): Unit
  def createPartition(database: String, table: String, partition: GluePartitionInfo): Unit
  def updatePartition(database: String, table: String, values: List[String], partition: GluePartitionInfo): Unit
  def deletePartition(database: String, table: String, values: List[String]): Unit
  def getPartitions(database: String, table: String): List[GluePartitionInfo]
}

/** Glue error shapes (mirror AlreadyExistsException / EntityNotFoundException). */
final case class GlueAlreadyExists(message: String) extends RuntimeException(message)
final case class GlueEntityNotFound(message: String) extends RuntimeException(message)

/**
 * In-memory [[GlueApi]]: same call surface and error behavior as the real
 * catalog (create of an existing partition throws, update/delete of a missing
 * one throws), so [[GlueMetastore]] is exercisable offline and the Metastore
 * seam is proven against a second, non-Hive catalog.
 */
final class InMemoryGlueApi extends GlueApi {
  private val tables = new java.util.concurrent.ConcurrentHashMap[(String, String), GlueTableInfo]()
  private val partitions =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Map[List[String], GluePartitionInfo]]()

  def registerTable(table: GlueTableInfo): Unit = {
    tables.put((table.database, table.name), table)
    partitions.putIfAbsent((table.database, table.name), Map.empty)
  }

  override def getTable(database: String, name: String): Option[GlueTableInfo] =
    Option(tables.get((database, name)))

  override def updateTable(database: String, table: GlueTableInfo): Unit = {
    if (!tables.containsKey((database, table.name)))
      throw GlueEntityNotFound(s"Table $database.${table.name} not found")
    tables.put((database, table.name), table)
  }

  override def createPartition(database: String, table: String, partition: GluePartitionInfo): Unit =
    partitions.compute((database, table), (_, cur) => {
      val existing = Option(cur).getOrElse(Map.empty)
      if (existing.contains(partition.values))
        throw GlueAlreadyExists(s"Partition ${partition.values} already exists in $database.$table")
      existing + (partition.values -> partition)
    })

  override def updatePartition(
      database: String, table: String, values: List[String], partition: GluePartitionInfo): Unit =
    partitions.compute((database, table), (_, cur) => {
      val existing = Option(cur).getOrElse(Map.empty)
      if (!existing.contains(values))
        throw GlueEntityNotFound(s"Partition $values not found in $database.$table")
      existing - values + (partition.values -> partition)
    })

  override def deletePartition(database: String, table: String, values: List[String]): Unit =
    partitions.compute((database, table), (_, cur) => {
      val existing = Option(cur).getOrElse(Map.empty)
      if (!existing.contains(values))
        throw GlueEntityNotFound(s"Partition $values not found in $database.$table")
      existing - values
    })

  override def getPartitions(database: String, table: String): List[GluePartitionInfo] =
    Option(partitions.get((database, table))).getOrElse(Map.empty).values.toList
}

/**
 * [[Metastore]] over the Glue Data Catalog — the A11 seam instantiated.
 * Faithful to the reference implementation:
 *
 *  - `currentVersion` reads the table; no partition keys ⇒ snapshot version
 *    parsed from the table location's trailing `_version=` element; otherwise
 *    every Glue partition's location is parsed into a (partition, version)
 *    pair (reference GlueMetastore.scala:20-66).
 *  - Adds/updates write the partition with a storage descriptor whose
 *    location is the versioned path and whose FORMAT PARAMS (input/output
 *    format, serde) are copied from the table — Glue partitions carry their
 *    own format, and dropping it would break readers
 *    (`extractFormatParams`, reference GlueMetastore.scala:179-188).
 *  - `UpdateTableVersion` swaps the trailing `_version=` element of the
 *    table location (reference GlueMetastore.scala:144-156).
 */
final class GlueMetastore(glue: GlueApi) extends Metastore {

  override def currentVersion(table: TableName): TableVersion = {
    val glueTable = getGlueTable(table)
    val tableLocation = new URI(glueTable.storage.location)
    val keys = glueTable.partitionKeys.map(PartitionColumn(_))
    if (keys.isEmpty) SnapshotTableVersion(VersionPaths.parseVersion(tableLocation))
    else {
      val pvs = glue.getPartitions(table.schema, table.name).map { gp =>
        val columnValues = keys.zip(gp.values).map { case (c, v) => ColumnValue(c, v) }
        require(columnValues.nonEmpty, s"empty partition value list in ${table.fullyQualifiedName}")
        Partition(columnValues) -> VersionPaths.parseVersion(new URI(gp.storage.location))
      }.toMap
      PartitionedTableVersion(pvs)
    }
  }

  override def update(table: TableName, changes: TableChanges): Unit =
    changes.operations.foreach {
      // same stance as SparkHiveMetastore: a deletion-vector version dir
      // holds no data files, so a Glue-catalog reader pointed at it would
      // silently read EMPTY — refuse until the DVs are folded
      case MetastoreOperation.AddPartition(p, v) if Version.isDeleteMarker(v) =>
        throw new IllegalArgumentException(
          s"cannot sync deletion-vector version ${v.label} of '${p.toPath}' to Glue — " +
            "external readers cannot apply DVs; run compact/OPTIMIZE to fold deletes first")
      case MetastoreOperation.UpdatePartitionVersion(p, v) if Version.isDeleteMarker(v) =>
        throw new IllegalArgumentException(
          s"cannot sync deletion-vector version ${v.label} of '${p.toPath}' to Glue — " +
            "external readers cannot apply DVs; run compact/OPTIMIZE to fold deletes first")
      case MetastoreOperation.AddPartition(p, v)            => addPartition(table, p, v)
      case MetastoreOperation.UpdatePartitionVersion(p, v)  => updatePartitionVersion(table, p, v)
      case MetastoreOperation.RemovePartition(p)            => removePartition(table, p)
      case MetastoreOperation.UpdateTableVersion(v)         => updateTableLocation(table, v)
      case MetastoreOperation.UpdateSchema(json)            => widenColumns(table, json)
    }

  /** Widen the Glue table's column list to cover the recorded schema
    * (additive only — columns are never dropped or retyped; partition keys
    * are fixed at creation). The Glue UpdateTable analogue of Hive's
    * `ALTER TABLE … ADD COLUMNS`. */
  private def widenColumns(table: TableName, schemaJson: String): Unit = {
    import org.apache.spark.sql.types.{DataType, StructType}
    val target = DataType.fromJson(schemaJson) match {
      case s: StructType => s
      case other => throw new IllegalArgumentException(
        s"UpdateSchema for $table carries a non-struct schema document: $other")
    }
    val glueTable = getGlueTable(table)
    val existing = (glueTable.columns.map(_._1) ++ glueTable.partitionKeys)
      .map(_.toLowerCase).toSet
    val missing = target.fields.filterNot(f => existing(f.name.toLowerCase))
      .map(f => f.name -> f.dataType.catalogString).toList
    if (missing.nonEmpty)
      glue.updateTable(table.schema, glueTable.copy(columns = glueTable.columns ++ missing))
  }

  private def addPartition(table: TableName, partition: Partition, version: Version): Unit = {
    val glueTable = getGlueTable(table)
    val location = versionedPartitionLocation(glueTable, partition, version)
    glue.createPartition(table.schema, table.name,
      GluePartitionInfo(partition.columnValues.map(_.value),
        extractFormatParams(glueTable.storage).copy(location = location)))
  }

  private def updatePartitionVersion(table: TableName, partition: Partition, version: Version): Unit = {
    val glueTable = getGlueTable(table)
    val location = versionedPartitionLocation(glueTable, partition, version)
    val values = partition.columnValues.map(_.value)
    glue.updatePartition(table.schema, table.name, values,
      GluePartitionInfo(values, extractFormatParams(glueTable.storage).copy(location = location)))
  }

  private def removePartition(table: TableName, partition: Partition): Unit =
    glue.deletePartition(table.schema, table.name, partition.columnValues.map(_.value))

  private def updateTableLocation(table: TableName, version: Version): Unit = {
    val glueTable = getGlueTable(table)
    val basePath = VersionPaths.versionedToBasePath(new URI(glueTable.storage.location))
    val versionedPath = VersionPaths.pathFor(basePath, version)
    glue.updateTable(table.schema, glueTable.copy(
      storage = extractFormatParams(glueTable.storage).copy(location = versionedPath.toString)))
  }

  private def versionedPartitionLocation(
      glueTable: GlueTableInfo, partition: Partition, version: Version): String =
    VersionPaths.pathFor(
      partition.resolvePath(new URI(glueTable.storage.location)), version).toString

  /** Keep only the format-defining fields of a storage descriptor — new
    * partition descriptors must carry the table's format but nothing else
    * (reference `extractFormatParams`, GlueMetastore.scala:179-188). */
  private def extractFormatParams(storage: GlueStorage): GlueStorage =
    GlueStorage(location = "", inputFormat = storage.inputFormat,
      outputFormat = storage.outputFormat, serdeLibrary = storage.serdeLibrary)

  private def getGlueTable(table: TableName): GlueTableInfo =
    glue.getTable(table.schema, table.name).getOrElse(throw UnknownTableError(table))
}

package graft.sources

import graft.core._
import org.apache.spark.sql.SparkSession

import java.net.URI

/**
 * [[Metastore]] implementation against a Hive-compatible catalog via Spark
 * SQL DDL — the reference's `SparkHiveMetastore`
 * (`spark/src/main/scala/dev/chronicles/spark/SparkHiveMetastore.scala:150-299`)
 * re-expressed on Spark 4:
 *
 *  - reads the catalog's *actual* current state by parsing `_version=`
 *    suffixes off table/partition locations (`SHOW PARTITIONS` +
 *    `DESCRIBE FORMATTED` scrape);
 *  - applies changes with the four ALTER TABLE statements (add/set-location/
 *    drop partition, set table location) — all metadata-only pointer swaps,
 *    which is what makes commits and rollbacks near-instantaneous regardless
 *    of data size.
 *
 * Readers then see versioned data transparently through `spark.table(...)` —
 * no engine code on the read path (docs/concepts.md:60-67).
 */
final class SparkHiveMetastore(spark: SparkSession) extends Metastore {

  override def currentVersion(table: TableName): TableVersion = {
    requireExists(table)
    if (isPartitioned(table)) {
      // SHOW PARTITIONS prints the on-disk (Hive-escaped) form; the domain
      // model carries raw values
      val partitions = spark.sql(s"SHOW PARTITIONS ${table.fullyQualifiedName}")
        .collect().map(_.getString(0)).toList
      PartitionedTableVersion(partitions.flatMap { pathStr =>
        Partition.parseEscaped(pathStr).toOption.map { p =>
          p -> VersionPaths.parseVersion(toUri(partitionLocation(table, p)))
        }
      }.toMap)
    } else {
      SnapshotTableVersion(VersionPaths.parseVersion(toUri(tableLocation(table))))
    }
  }

  /** Partitions per ALTER TABLE statement. Spark's DDL grammar accepts many
    * `PARTITION (...)` clauses per ADD/DROP; chunking bounds statement size
    * and keeps any parse/metastore limits far away. */
  private val DdlBatchSize = 100

  override def update(table: TableName, changes: TableChanges): Unit = {
    // a DELETION-VECTOR version is unreadable by plain catalog readers (its
    // directory holds a deletion sidecar, not data) — pointing a Hive
    // partition at it would make spark.table() silently read EMPTY. Refuse
    // loudly (before any catalog touch): fold the DVs (compact / SQL
    // OPTIMIZE) before Hive-syncing.
    changes.operations.foreach {
      case MetastoreOperation.AddPartition(p, v) if Version.isDeleteMarker(v) =>
        throw new IllegalArgumentException(
          s"cannot sync deletion-vector version ${v.label} of '${p.toPath}' to Hive — " +
            "external readers cannot apply DVs; run compact/OPTIMIZE to fold deletes first")
      case MetastoreOperation.UpdatePartitionVersion(p, v) if Version.isDeleteMarker(v) =>
        throw new IllegalArgumentException(
          s"cannot sync deletion-vector version ${v.label} of '${p.toPath}' to Hive — " +
            "external readers cannot apply DVs; run compact/OPTIMIZE to fold deletes first")
      case _ => ()
    }
    requireExists(table)
    val t = table.fullyQualifiedName
    if (changes.operations.isEmpty) return
    // one DESCRIBE per update() call, not one per operation: an N-partition
    // commit must stay metadata-cheap
    lazy val tableLoc = tableLocation(table)
    def baseLoc(p: Partition): URI = p.resolvePath(toUri(tableLoc))
    def versionedLoc(p: Partition, v: Version): String =
      locString(VersionPaths.pathFor(baseLoc(p), v))

    // Reordering by operation type is safe: computeChanges emits at most one
    // operation per partition, so the ops are pairwise independent. Batching
    // matters at scale — a 10k-partition initial load becomes ~100 round
    // trips to the metastore instead of 10k.
    val adds = changes.operations.collect { case op: MetastoreOperation.AddPartition => op }
    val updates = changes.operations.collect { case op: MetastoreOperation.UpdatePartitionVersion => op }
    val removes = changes.operations.collect { case op: MetastoreOperation.RemovePartition => op }
    val tableVersions = changes.operations.collect { case op: MetastoreOperation.UpdateTableVersion => op }
    val schemaOps = changes.operations.collect { case op: MetastoreOperation.UpdateSchema => op }

    // schema widening FIRST: partitions added by the same sync may carry the
    // new columns, and `spark.table()` readers should see them immediately —
    // the reference's central claim (docs/concepts.md:60-67) holding under
    // additive evolution. Hive has no typed "ADD IF ABSENT", so the missing
    // set is diffed against the catalog's current column list; columns are
    // never dropped or retyped here (additive evolution is one-way).
    schemaOps.foreach(op => widenColumns(table, op.schemaJson))

    adds.grouped(DdlBatchSize).foreach { chunk =>
      val specs = chunk.map(op =>
        s"PARTITION (${partitionExpr(op.partition)}) LOCATION ${sqlLit(versionedLoc(op.partition, op.version))}")
      spark.sql(s"ALTER TABLE $t ADD IF NOT EXISTS ${specs.mkString(" ")}")
    }
    // no batch form exists for SET LOCATION — per-partition by necessity
    updates.foreach { op =>
      spark.sql(s"ALTER TABLE $t PARTITION (${partitionExpr(op.partition)}) " +
        s"SET LOCATION ${sqlLit(versionedLoc(op.partition, op.version))}")
    }
    removes.grouped(DdlBatchSize).foreach { chunk =>
      val specs = chunk.map(op => s"PARTITION (${partitionExpr(op.partition)})")
      spark.sql(s"ALTER TABLE $t DROP IF EXISTS ${specs.mkString(", ")}")
    }
    tableVersions.foreach { op =>
      val base = VersionPaths.versionedToBasePath(toUri(tableLoc))
      spark.sql(s"ALTER TABLE $t SET LOCATION ${sqlLit(locString(VersionPaths.pathFor(base, op.version)))}")
    }
  }

  /** Catalog location strings are the DECODED path form (Hadoop `Path`
    * rendering); round-trip through `Path` so values with spaces/`%` survive
    * URI construction and emission. */
  private def toUri(locationString: String): URI =
    new org.apache.hadoop.fs.Path(locationString).toUri

  private def locString(uri: URI): String =
    new org.apache.hadoop.fs.Path(uri).toString

  /** `ALTER TABLE … ADD COLUMNS` for every column of the recorded schema
    * missing from the catalog's column list (case-insensitive; partition
    * columns excluded — they are fixed at table creation). Unparseable
    * schema documents fail loudly: silently skipping would leave readers
    * blind to committed columns. */
  private def widenColumns(table: TableName, schemaJson: String): Unit = {
    import org.apache.spark.sql.types.{DataType, StructType}
    val target = DataType.fromJson(schemaJson) match {
      case s: StructType => s
      case other => throw new IllegalArgumentException(
        s"UpdateSchema for $table carries a non-struct schema document: $other")
    }
    // catalog METADATA only — spark.table() would trigger (and cache) a
    // Hive→parquet relation conversion mid-sync, when the table location
    // can still show in-flight `_version=` dirs as a bogus partition column
    val existing = spark.catalog.listColumns(table.fullyQualifiedName)
      .collect().map(_.name.toLowerCase).toSet
    val missing = target.fields.filterNot(f => existing(f.name.toLowerCase))
    if (missing.nonEmpty) {
      val colDefs = missing.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      spark.sql(s"ALTER TABLE ${table.fullyQualifiedName} ADD COLUMNS ($colDefs)")
      ()
    }
  }

  // ---- catalog inspection (DESCRIBE scrape, as in the reference) ----

  private def requireExists(table: TableName): Unit =
    if (!spark.catalog.tableExists(table.fullyQualifiedName)) throw UnknownTableError(table)

  /** Partitioned iff DESCRIBE output carries a '# Partition Information' row
    * (reference SparkHiveMetastore.scala:273-286). */
  private def isPartitioned(table: TableName): Boolean =
    spark.sql(s"DESCRIBE FORMATTED ${table.fullyQualifiedName}")
      .collect().exists(_.getString(0).startsWith("# Partition Information"))

  private def tableLocation(table: TableName): String =
    describeLocation(s"DESCRIBE FORMATTED ${table.fullyQualifiedName}")
      .getOrElse(sys.error(s"No location for table $table"))

  private def partitionLocation(table: TableName, p: Partition): String =
    describeLocation(s"DESCRIBE FORMATTED ${table.fullyQualifiedName} PARTITION (${partitionExpr(p)})")
      .getOrElse(sys.error(s"No location for partition $p of $table"))

  private def describeLocation(sql: String): Option[String] =
    spark.sql(sql).collect()
      .find(r => r.getString(0).trim == "Location")
      .map(_.getString(1).trim)

  /** A Spark SQL string literal with backslash and quote escaping (Spark's
    * default parser treats backslash as an escape character, so `''` doubling
    * alone is not enough). */
  private def sqlLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** `(col='v', col2='v2')` (reference SparkHiveMetastore.scala:290-299).
    * Values come from arbitrary row data — fully escaped. */
  private def partitionExpr(p: Partition): String =
    p.columnValues.map(cv => s"${cv.column.name}=${sqlLit(cv.value)}").mkString(", ")
}

package graft.core

import java.net.URI

/**
 * Core table/partition domain model for the versioned-table engine.
 *
 * Semantics derived from the reference implementation
 * (stettix/chronicles, `core/src/main/scala/dev/chronicles/core/model.scala`):
 *  - two-part table names (model.scala:89-104)
 *  - string-typed partition column values rendered as Hive-style paths
 *    `col1=v1/col2=v2` (model.scala:10-69)
 *  - `PartitionSchema.snapshot` (empty column list) marks an unpartitioned
 *    table whose whole content is versioned as one unit (model.scala:76-83)
 *  - `TableVersion` is the complete visible state of a table at one point
 *    in history (model.scala:113-115)
 */
final case class TableName(schema: String, name: String) {
  def fullyQualifiedName: String = s"$schema.$name"
  override def toString: String = fullyQualifiedName
}

object TableName {
  private val Part = "([a-zA-Z0-9_]+)"
  private val FullName = s"$Part\\.$Part".r

  /** Parse a `schema.table` string; anything else is rejected. */
  def parse(fullyQualifiedName: String): Either[String, TableName] =
    fullyQualifiedName match {
      case FullName(schema, name) => Right(TableName(schema, name))
      case _ =>
        Left(s"Invalid table name: '$fullyQualifiedName'. Should be in format <schema>.<table name>")
    }
}

/** A single `column=value` binding of a partition. Values are untyped strings
  * end-to-end, exactly as in the reference (model.scala:43). */
final case class ColumnValue(column: PartitionColumn, value: String)

/** A partition column name; restricted to lowercase identifiers
  * (reference model.scala:45-50). */
final case class PartitionColumn(name: String) {
  require(PartitionColumn.isValid(name), s"Invalid partition column name: '$name'")
}

object PartitionColumn {
  private val ValidName = "[a-z][a-z0-9_]*".r
  def isValid(name: String): Boolean = ValidName.pattern.matcher(name).matches()
}

/** A concrete partition: a non-empty list of column values, e.g.
  * `date=2019-01-31` or `year=2019/month=01`. */
final case class Partition(columnValues: List[ColumnValue]) {
  require(columnValues.nonEmpty, "Partition must have at least one column value")

  /** Hive-style relative path with RAW values: `col1=v1/col2=v2`. Logical
    * rendering only (commit log, display) — for filesystem paths use
    * [[toHivePath]], which applies the writer's escaping. */
  def toPath: String =
    columnValues.map(cv => s"${cv.column.name}=${cv.value}").mkString("/")

  /** The on-disk relative path of this partition: values escaped exactly as
    * Spark's dynamic-partition writer escapes directory names
    * ([[PathCodec.escapePathName]]). */
  def toHivePath: String =
    columnValues.map(cv => s"${cv.column.name}=${PathCodec.escapePathName(cv.value)}").mkString("/")

  /** Absolute location of this partition under a table root. Values are
    * Hive-escaped to match the directories the writer creates, and the URI is
    * built from components so characters the Hive escape set leaves raw
    * (e.g. space) are percent-quoted rather than throwing URISyntaxException.
    * The URI's DECODED path equals the on-disk path. */
  def resolvePath(tableLocation: URI): URI = {
    val base = Partition.normalizedUri(tableLocation)
    base.resolve(new URI(null, null, toHivePath + "/", null))
  }

  override def toString: String = toPath
}

object Partition {

  def apply(first: ColumnValue, rest: ColumnValue*): Partition =
    Partition((first +: rest).toList)

  /** Single-column convenience. */
  def apply(column: String, value: String): Partition =
    Partition(List(ColumnValue(PartitionColumn(column), value)))

  private[core] def normalizedUri(uri: URI): URI =
    if (uri.toString.endsWith("/")) uri else new URI(uri.toString + "/")

  private val ColumnValueRegex = "([a-z][a-z0-9_]*)=([^/=]+)".r

  /** Parse an on-disk / SHOW PARTITIONS path (Hive-escaped values) into a
    * Partition with RAW values. */
  def parseEscaped(path: String): Either[String, Partition] =
    parse(path).map(p => Partition(p.columnValues.map(cv =>
      cv.copy(value = PathCodec.unescapePathName(cv.value)))))

  /** Parse `col1=v1/col2=v2`. Rejects empty / malformed strings
    * (reference ModelSpec.scala:32-65). */
  def parse(path: String): Either[String, Partition] = {
    val parts = path.split("/", -1).toList
    val parsed = parts.map {
      case ColumnValueRegex(col, v) => Right(ColumnValue(PartitionColumn(col), v))
      case other                    => Left(s"Invalid partition element: '$other'")
    }
    val (errs, oks) = parsed.partitionMap(identity)
    if (errs.nonEmpty) Left(s"Invalid partition path '$path': ${errs.mkString("; ")}")
    else if (oks.isEmpty) Left(s"Invalid partition path '$path': empty")
    else Right(Partition(oks))
  }
}

/** The ordered list of partition columns of a table. Empty list = snapshot
  * (unpartitioned) table. */
final case class PartitionSchema(columns: List[PartitionColumn]) {
  def isSnapshot: Boolean = columns.isEmpty
  def columnNames: List[String] = columns.map(_.name)
}

object PartitionSchema {
  /** The special "root partition" schema of an unpartitioned table. */
  val snapshot: PartitionSchema = PartitionSchema(Nil)

  def apply(first: String, rest: String*): PartitionSchema =
    PartitionSchema((first +: rest).map(PartitionColumn(_)).toList)
}

/** Storage format of a table's data files. Open-ended string (reference
  * model.scala:117-122 + README.md:79-83 claims CSV/Avro passthrough). */
final case class FileFormat(name: String)

object FileFormat {
  val Parquet: FileFormat = FileFormat("parquet")
  val Orc: FileFormat = FileFormat("orc")
  val Csv: FileFormat = FileFormat("csv")
  val Json: FileFormat = FileFormat("json")
  val Avro: FileFormat = FileFormat("avro")
}

/** Per-table data-skipping statistics declaration (the Delta
  * `dataSkippingStatsColumns` pattern): when set on a [[TableDefinition]],
  * every versioned write additionally records a per-FILE min/max/null-count
  * manifest for `statsColumns` (and, when `bloomKeyColumns` is non-empty, a
  * per-PARTITION Bloom filter over the key tuple's hash) beside the commit,
  * so selective reads and MERGE discovery can prune files WITHOUT opening
  * them. Purely an optimization layer: a version written before stats were
  * declared (or whose manifest is lost) simply reads unpruned.
  *
  *  - `statsColumns`: DATA columns to track min/max/nullCount for, per file.
  *    Partition columns need no declaration — their single value per
  *    directory is already exact "stats" and is pruned on directly.
  *  - `bloomKeyColumns`: the key tuple (e.g. a MERGE key) to build one Bloom
  *    filter PER PARTITION over, via `xxhash64` of the tuple — type-agnostic
  *    and multi-column by construction. Order matters (the probe must hash
  *    in the same order).
  *  - `bloomExpectedItems`/`bloomFpp` size each partition's filter; ~0.9 MB
  *    per million expected keys at 3% fpp, stored base64 in the manifest. */
final case class ColumnStatsConfig(
    statsColumns: List[String],
    bloomKeyColumns: List[String] = Nil,
    bloomExpectedItems: Long = 100000L,
    bloomFpp: Double = 0.03) {
  require(statsColumns.nonEmpty || bloomKeyColumns.nonEmpty,
    "ColumnStatsConfig needs at least one stats or bloom column")
  require(bloomExpectedItems > 0, "bloomExpectedItems must be positive")
  require(bloomFpp > 0 && bloomFpp < 1, "bloomFpp must be in (0,1)")
}

/** Static definition of a versioned table. `options` are passed through to
  * the Spark reader AND writer of the chosen format (e.g. `header`/
  * `inferSchema` for CSV) — the format passthrough the reference claims for
  * CSV/Avro (README.md:79-83). `stats` opts the table into commit-time
  * file/column statistics + data-skipping reads ([[ColumnStatsConfig]]). */
final case class TableDefinition(
    name: TableName,
    location: URI,
    partitionSchema: PartitionSchema,
    format: FileFormat,
    options: Map[String, String] = Map.empty,
    stats: Option[ColumnStatsConfig] = None) {
  def isSnapshot: Boolean = partitionSchema.isSnapshot

  /** Whether reads merge per-file schemas — the contract additive schema
    * evolution requires (mixed-schema versions are only readable when the
    * scan merges footers instead of sampling one). One definition, used by
    * every evolution guard. */
  def mergesSchema: Boolean = options.exists { case (k, v) =>
    k.equalsIgnoreCase("mergeSchema") && v.equalsIgnoreCase("true")
  }
}

/** The complete visible state of a table at a point in its history. */
sealed trait TableVersion

/** State of a partitioned table: the set of visible partitions, each at a
  * specific version. */
final case class PartitionedTableVersion(partitionVersions: Map[Partition, Version])
    extends TableVersion

/** State of an unpartitioned table: a single version of the whole content. */
final case class SnapshotTableVersion(version: Version) extends TableVersion

object TableVersion {
  /** The state of a table with no data yet. */
  def empty(isSnapshot: Boolean): TableVersion =
    if (isSnapshot) SnapshotTableVersion(Version.Unversioned)
    else PartitionedTableVersion(Map.empty)
}

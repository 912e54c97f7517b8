package graft.sql

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType, TimestampType}

/**
 * The MAINTENANCE verbs as native SQL statements — the Delta-style parser
 * extension (a delegating [[ParserInterface]] injected through
 * `SparkSessionExtensions.injectParser`, the same pattern as Delta's
 * `DeltaSqlParser`): statements vanilla Spark has no grammar for,
 * recognized by NAME PATTERN — any whole statement of these shapes naming
 * a `graft.*.*` table is claimed (the `graft` catalog prefix is reserved
 * by this library; table lookup happens at execution and refuses loudly
 * for unregistered names). Everything else delegates to the session
 * parser untouched. A recognized verb with an invalid clause (e.g. VACUUM
 * without RETAIN) errors HERE, deliberately: the message explains the
 * clause, where delegation would surface a generic parse error.
 *
 * {{{
 *   DESCRIBE HISTORY graft.sales.accounts            -- the commit log
 *   SHOW PARTITIONS graft.sales.accounts             -- live partitions, zero I/O
 *   OPTIMIZE graft.sales.accounts                    -- compact, 1 file/partition
 *   OPTIMIZE graft.sales.accounts WHERE day = '2024-01-04'   -- scoped compact
 *   OPTIMIZE graft.sales.accounts ZORDER BY (a, b)   -- multi-dim clustering
 *   VACUUM graft.sales.accounts RETAIN 3 VERSIONS            -- reclaim
 *   VACUUM graft.sales.accounts RETAIN 3 VERSIONS DRY RUN    -- report only
 *   ANALYZE TABLE graft.sales.accounts COMPUTE STATISTICS    -- backfill stats manifests
 * }}}
 *
 * Semantics:
 *  - `DESCRIBE HISTORY` returns the commit log newest-first: sequence
 *    number, commit id, user, message, operation count, timestamp —
 *    driver-side metadata only, no data file is touched.
 *  - `OPTIMIZE` = [[graft.operators.VersionedTables.compact]]: rewrite to
 *    one file per partition, CAS-guarded, history preserved. `ZORDER BY`
 *    routes the rewrite through [[graft.operators.ScaleTools.zorderBy]]
 *    (Morton interleave → range partition → local sort), so every output
 *    file covers a small bounding box in ALL listed dimensions and the
 *    stats manifests + parquet row-group pruning skip files for
 *    predicates on any of them.
 *  - `VACUUM` = [[graft.operators.VersionedTables.vacuum]] with
 *    `includeOrphans = true`: the RETAIN clause is MANDATORY (there is no
 *    implicit retention a data-deleting statement should default to);
 *    tagged commits are always protected; `DRY RUN` reports the target
 *    list without deleting. Returns one row per affected version dir.
 *
 * Statements execute against the CURRENT head at run time (each verb
 * resolves the tracker state when it runs, like every other graft SQL
 * face); table lookup happens at execution, so a statement parsed before
 * registration still refuses loudly rather than silently no-oping.
 */
object GraftMaintenanceSql {

  private val Ident = "(?:`([^`]+)`|([A-Za-z_][A-Za-z0-9_]*))"
  private def ident(m: java.util.regex.Matcher, group: Int): String =
    Option(m.group(group)).getOrElse(m.group(group + 1))

  // each pattern anchors the WHOLE statement (optional trailing ';')
  private val HistoryRe = java.util.regex.Pattern.compile(
    raw"""(?is)\s*DESC(?:RIBE)?\s+HISTORY\s+graft\.$Ident\.$Ident\s*;?\s*""")
  private val OptimizeRe = java.util.regex.Pattern.compile(
    raw"""(?is)\s*OPTIMIZE\s+graft\.$Ident\.$Ident(?:\s+WHERE\s+(.+?))?(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*""")
  private val ShowPartitionsRe = java.util.regex.Pattern.compile(
    raw"""(?is)\s*SHOW\s+PARTITIONS\s+graft\.$Ident\.$Ident\s*;?\s*""")
  private val VacuumRe = java.util.regex.Pattern.compile(
    raw"""(?is)\s*VACUUM\s+graft\.$Ident\.$Ident(\s+RETAIN\s+(\d+)\s+VERSIONS)?(\s+DRY\s+RUN)?\s*;?\s*""")
  private val RestoreRe = java.util.regex.Pattern.compile(
    raw"""(?is)\s*RESTORE\s+TABLE\s+graft\.$Ident\.$Ident\s+TO\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+'([^']*)'\s*;?\s*""")
  private val AddColumnsRe = java.util.regex.Pattern.compile(
    raw"""(?is)\s*ALTER\s+TABLE\s+graft\.$Ident\.$Ident\s+ADD\s+COLUMNS?\s*\(([^)]*)\)\s*;?\s*""")
  private val AnalyzeRe = java.util.regex.Pattern.compile(
    raw"""(?is)\s*ANALYZE\s+TABLE\s+graft\.$Ident\.$Ident\s+COMPUTE\s+STATISTICS\s*;?\s*""")

  /** The maintenance statement in `sqlText`, if it is one. */
  def parse(sqlText: String): Option[LogicalPlan] = {
    val h = HistoryRe.matcher(sqlText)
    if (h.matches()) return Some(GraftDescribeHistoryCommand(ident(h, 1), ident(h, 3)))
    val o = OptimizeRe.matcher(sqlText)
    if (o.matches()) {
      val where = Option(o.group(5)).map(_.trim).filter(_.nonEmpty)
      require(o.group(5) == null || where.isDefined, "OPTIMIZE ... WHERE is empty")
      val zorder = Option(o.group(6)).map(_.split(",").map(stripIdent).toSeq
        .filter(_.nonEmpty)).getOrElse(Seq.empty)
      require(o.group(6) == null || zorder.nonEmpty, "OPTIMIZE ... ZORDER BY () is empty")
      return Some(GraftOptimizeCommand(ident(o, 1), ident(o, 3), zorder, where))
    }
    val sp = ShowPartitionsRe.matcher(sqlText)
    if (sp.matches()) return Some(GraftShowPartitionsCommand(ident(sp, 1), ident(sp, 3)))
    val an = AnalyzeRe.matcher(sqlText)
    if (an.matches()) return Some(GraftAnalyzeCommand(ident(an, 1), ident(an, 3)))
    val v = VacuumRe.matcher(sqlText)
    if (v.matches()) {
      require(v.group(5) != null,
        "VACUUM on graft tables requires an explicit RETAIN <n> VERSIONS clause — " +
          "a data-deleting statement gets no implicit retention default")
      return Some(GraftVacuumCommand(ident(v, 1), ident(v, 3),
        keepLast = v.group(6).toInt, dryRun = v.group(7) != null))
    }
    val r = RestoreRe.matcher(sqlText)
    if (r.matches())
      return Some(GraftRestoreCommand(ident(r, 1), ident(r, 3),
        byTimestamp = r.group(5).equalsIgnoreCase("TIMESTAMP"), ref = r.group(6)))
    val a = AddColumnsRe.matcher(sqlText)
    if (a.matches()) {
      require(a.group(5).trim.nonEmpty, "ALTER TABLE ... ADD COLUMNS () is empty")
      return Some(GraftAddColumnsCommand(ident(a, 1), ident(a, 3), a.group(5)))
    }
    None
  }

  private def stripIdent(s: String): String = {
    val t = s.trim
    if (t.startsWith("`") && t.endsWith("`") && t.length >= 2) t.substring(1, t.length - 1)
    else t
  }

  /** Execution-time registry lookup — loud on unregistered names. */
  private[sql] def entryFor(schema: String, table: String): GraftTableRegistry.Entry =
    GraftTableRegistry.resolve(schema, table).getOrElse(
      throw new IllegalArgumentException(
        s"graft.$schema.$table is not a registered graft table " +
          s"(registered: ${GraftTableRegistry.registered.map(_.fullyQualifiedName).mkString(", ")})"))

  private[sql] def sqlUser(session: SparkSession): UserId =
    UserId(session.conf.get(GraftSqlWrites.UserKey, session.sparkContext.sparkUser))

  /** The one OPTIMIZE implementation (SQL verb and CLI share it): plain =
    * CAS-guarded compact to `files.getOrElse(1)` files per partition;
    * `zorderBy` nonEmpty = one read of the current version, Morton
    * clustering, CAS commit. `whereSql` scopes the rewrite to the EXACTLY
    * matching partitions (see [[partitionsMatching]]) — the 100 TB shape:
    * a maintenance job compacts yesterday's partitions, never the table.
    * Partition columns refuse in ZORDER BY (they already prune by value);
    * `files` must be >= 1 when given. */
  def runOptimize(
      engine: graft.operators.VersionedTables,
      table: TableDefinition,
      user: UserId,
      message: String,
      zorderBy: Seq[String],
      files: Option[Int],
      whereSql: Option[String] = None): TableChanges = {
    files.foreach(f => require(f >= 1, s"files per partition must be >= 1, got $f"))
    val keep: Partition => Boolean = whereSql match {
      case None => _ => true
      case Some(w) =>
        val pvs = engine.tracker.currentVersion(table.name) match {
          case PartitionedTableVersion(m) => m.keys.toList.sortBy(_.toPath)
          case _: SnapshotTableVersion => throw new IllegalArgumentException(
            s"OPTIMIZE ... WHERE needs a partitioned table — " +
              s"${table.name.fullyQualifiedName} is a snapshot table")
        }
        partitionsMatching(engine.spark, table, pvs, w)
    }
    if (zorderBy.isEmpty)
      engine.compact(table, user, message, keep = keep,
        filesPerPartition = files.getOrElse(1))._2
    else {
      zorderBy.foreach { c =>
        require(!table.partitionSchema.columnNames.exists(_.equalsIgnoreCase(c)),
          s"ZORDER BY column '$c' is a partition column — partitions are already " +
            "pruned by value; z-order the columns you filter WITHIN partitions")
      }
      import graft.operators.VersionedTables.DatasetVersionedOps
      // CAS on the head the rewrite read, exactly like compact; an empty
      // selection is a NO-OP (no write, no commit), like compact's
      val state = engine.tracker.tableState(table.name)
      val selectionEmpty = state.currentTableVersion match {
        case PartitionedTableVersion(pvs) => !pvs.keysIterator.exists(keep)
        case SnapshotTableVersion(v)      => v == Version.Unversioned
      }
      if (selectionEmpty) TableChanges.empty
      else {
        val n = files.getOrElse(
          math.max(engine.spark.sparkContext.defaultParallelism, 2))
        val source =
          if (whereSql.isEmpty) engine.read(table)
          else engine.readPartitions(table, keep)
        graft.operators.ScaleTools.zorderBy(source, zorderBy, n)
          .versionedInsertIntoIf(engine, table, user, message, state.currentVersion)._2
      }
    }
  }

  /** The EXACT partition set a WHERE clause selects: the clause is
    * evaluated two-valued over a one-row-per-partition driver-side frame
    * of the partition VALUES (known scalars — no "maybe" as in file
    * skipping; null partitions evaluate as NULL). Values are the
    * path-encoded STRINGS, so predicates compare lexically unless they
    * cast. A clause referencing anything but partition columns refuses
    * loudly, naming them. Bounded: one row per live partition. */
  private[graft] def partitionsMatching(
      spark: SparkSession,
      table: TableDefinition,
      pvs: List[Partition],
      whereSql: String): Partition => Boolean = {
    import scala.jdk.CollectionConverters._
    val partCols = table.partitionSchema.columnNames
    val schema = StructType(
      org.apache.spark.sql.types.StructField("_graft_part_idx",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
      partCols.map(c => org.apache.spark.sql.types.StructField(c, StringType, nullable = true)))
    val rows: java.util.List[Row] = pvs.zipWithIndex.map { case (p, i) =>
      Row.fromSeq(i +: p.columnValues.map(cv =>
        if (cv.value == graft.core.PathCodec.DefaultPartitionName) null else cv.value))
    }.asJava
    val df = spark.createDataFrame(rows, schema)
    val kept =
      try df.filter(org.apache.spark.sql.functions.expr(whereSql))
        .select("_graft_part_idx").collect().map(_.getInt(0)).toSet
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"OPTIMIZE ... WHERE may reference only the partition columns " +
              s"(${partCols.mkString(", ")}): ${e.getMessage}")
      }
    val byIdx = pvs.toArray // List.apply per kept index would be O(n^2)
    val keptParts: Set[Partition] = kept.map(byIdx(_))
    keptParts.contains _
  }
}

/** `DESCRIBE HISTORY graft.s.t` — the commit log, newest first. */
final case class GraftDescribeHistoryCommand(schemaName: String, tableName: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("seq", LongType, nullable = false)(),
    AttributeReference("commit_id", StringType, nullable = false)(),
    AttributeReference("user_id", StringType, nullable = false)(),
    AttributeReference("message", StringType, nullable = false)(),
    AttributeReference("n_operations", IntegerType, nullable = false)(),
    AttributeReference("timestamp", TimestampType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val entry = GraftMaintenanceSql.entryFor(schemaName, tableName)
    val updates = entry.engine.tracker.tableState(entry.table.name).updates
    updates.zipWithIndex.reverse.map { case (u, i) =>
      Row((i + 1).toLong, u.metadata.id.id, u.metadata.userId.value, u.metadata.message,
        u.operations.size, java.sql.Timestamp.from(u.metadata.timestamp))
    }
  }

  override def simpleString(maxFields: Int): String =
    s"GraftDescribeHistoryCommand graft.$schemaName.$tableName"
}

/** `OPTIMIZE graft.s.t [WHERE <partition predicate>] [ZORDER BY (cols)]` —
  * CAS-guarded layout rewrite: plain = 1 file per partition; ZORDER =
  * Morton-clustered files so stats manifests and row-group pruning skip on
  * every listed dimension. WHERE scopes the rewrite to the exactly-matching
  * partitions (Delta-style partial OPTIMIZE — at 100 TB you compact
  * yesterday, never the table); the clause may reference only partition
  * columns and is evaluated two-valued over their known values. */
final case class GraftOptimizeCommand(
    schemaName: String, tableName: String, zorderBy: Seq[String],
    whereSql: Option[String] = None)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("rewritten_partitions", LongType, nullable = false)(),
    AttributeReference("zorder_by", StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val entry = GraftMaintenanceSql.entryFor(schemaName, tableName)
    val msg = s"SQL OPTIMIZE graft.$schemaName.$tableName" +
      whereSql.map(w => s" WHERE $w").getOrElse("") +
      (if (zorderBy.nonEmpty) s" ZORDER BY (${zorderBy.mkString(", ")})" else "")
    val changes = GraftMaintenanceSql.runOptimize(entry.engine, entry.table,
      GraftMaintenanceSql.sqlUser(session), msg, zorderBy, files = None,
      whereSql = whereSql)
    Seq(Row(changes.operations.size.toLong, zorderBy.mkString(", ")))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftOptimizeCommand graft.$schemaName.$tableName" +
      whereSql.map(w => s" WHERE $w").getOrElse("") +
      (if (zorderBy.nonEmpty) s" ZORDER BY (${zorderBy.mkString(", ")})" else "")
}

/** `SHOW PARTITIONS graft.s.t` — the live partitions of the CURRENT
  * version, one Hive-escaped path per row (Spark's native output shape),
  * straight from the commit log: zero filesystem I/O at any table size.
  * Snapshot tables refuse, like Spark's own SHOW PARTITIONS on an
  * unpartitioned table. */
final case class GraftShowPartitionsCommand(schemaName: String, tableName: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val entry = GraftMaintenanceSql.entryFor(schemaName, tableName)
    entry.engine.tracker.currentVersion(entry.table.name) match {
      case PartitionedTableVersion(pvs) =>
        pvs.keys.toList.map(_.toHivePath).sorted.map(Row(_))
      case _: SnapshotTableVersion => throw new IllegalArgumentException(
        s"SHOW PARTITIONS: graft.$schemaName.$tableName is a snapshot table " +
          "(not partitioned)")
    }
  }

  override def simpleString(maxFields: Int): String =
    s"GraftShowPartitionsCommand graft.$schemaName.$tableName"
}

/** `VACUUM graft.s.t RETAIN n VERSIONS [DRY RUN]` — reclaim expired version
  * dirs + orphans (tagged commits always survive); one row per target. */
final case class GraftVacuumCommand(
    schemaName: String, tableName: String, keepLast: Int, dryRun: Boolean)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("status", StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val entry = GraftMaintenanceSql.entryFor(schemaName, tableName)
    val r = entry.engine.vacuum(entry.table, keepLast = keepLast,
      includeOrphans = true, dryRun = dryRun)
    if (dryRun) r.targets.map(u => Row(u.toString, "expirable"))
    else r.deleted.map(u => Row(u.toString, "deleted")) ++
      r.failed.map { case (u, why) => Row(u.toString, s"failed: $why") }
  }

  override def simpleString(maxFields: Int): String =
    s"GraftVacuumCommand graft.$schemaName.$tableName RETAIN $keepLast VERSIONS" +
      (if (dryRun) " DRY RUN" else "")
}

/** `RESTORE TABLE graft.s.t TO VERSION AS OF '<commit-or-tag>'` /
  * `TO TIMESTAMP AS OF '<ts>'` — DURABLE rollback
  * ([[graft.core.VersionedMetastore.restore]], Delta-RESTORE semantics):
  * the restored state is materialized as a NEW commit carrying the
  * tip→target diff, so it SURVIVES later writes — an unrelated INSERT
  * after "undo that DELETE" can never re-delete the restored rows (a bare
  * ref move would: the tracker folds the full history on the next
  * commit). Metadata-only — partitions repoint to existing version
  * directories, zero data bytes move at any table size — and undoable by
  * another RESTORE (history is never rewritten). `VERSION AS OF` resolves
  * tag-first then commit id, exactly like read-side time travel;
  * `TIMESTAMP AS OF` takes the latest commit at or before the instant
  * ([[graft.core.TableState.commitIdAsOf]] — the one resolution rule every
  * surface shares; ISO-8601 instant, local date-time or date, UTC).
  * Returns the restored (target) commit, the NEW commit the restore
  * created, and the catalog op count. */
final case class GraftRestoreCommand(
    schemaName: String, tableName: String, byTimestamp: Boolean, ref: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_commit", StringType, nullable = false)(),
    AttributeReference("new_commit", StringType, nullable = false)(),
    AttributeReference("catalog_ops", IntegerType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val entry = GraftMaintenanceSql.entryFor(schemaName, tableName)
    val tracker = entry.engine.tracker
    val name = entry.table.name
    val id: CommitId =
      if (byTimestamp) {
        def attempt(f: => java.time.Instant): Option[java.time.Instant] =
          try Some(f) catch { case _: java.time.format.DateTimeParseException => None }
        val ts = attempt(java.time.Instant.parse(ref))
          .orElse(attempt(java.time.LocalDateTime.parse(ref)
            .toInstant(java.time.ZoneOffset.UTC)))
          .orElse(attempt(java.time.LocalDate.parse(ref).atStartOfDay
            .toInstant(java.time.ZoneOffset.UTC)))
          .getOrElse(throw new IllegalArgumentException(
            s"RESTORE ... TIMESTAMP AS OF: unparseable timestamp '$ref'"))
        tracker.commitIdAsOf(name, ts).getOrElse(
          throw new IllegalArgumentException(s"no commit at or before $ref for $name"))
      } else
        // tag-first, like read-side VERSION AS OF — tags are the durable pins
        tracker.tags(name).collectFirst { case (`ref`, tagged) => tagged }
          .getOrElse(CommitId(ref))
    val (update, changes) = entry.engine.restore(name, id,
      GraftMaintenanceSql.sqlUser(session),
      s"SQL RESTORE TABLE graft.$schemaName.$tableName TO " +
        s"${if (byTimestamp) "TIMESTAMP" else "VERSION"} AS OF '$ref'")
    Seq(Row(id.id, update.metadata.id.id, changes.operations.size))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftRestoreCommand graft.$schemaName.$tableName TO " +
      s"${if (byTimestamp) "TIMESTAMP" else "VERSION"} AS OF '$ref'"
}

/** `ALTER TABLE graft.s.t ADD COLUMNS (name type, ...)` — DECLARED additive
  * evolution: one metadata-only commit recording the widened schema
  * ([[graft.core.TableOperation.SetTableSchema]]; the state fold is
  * untouched — no partition moves). Readers immediately see the new
  * columns NULL-filled on every existing row (the mergeSchema read path
  * resolves schemas from the log), synced catalogs get `ALTER TABLE …
  * ADD COLUMNS`, and time travel to pre-ALTER commits keeps the old
  * schema. Requires the table definition's `mergeSchema=true` — the same
  * contract as write-driven evolution, for the same reason (mixed-shape
  * files need merged reads on histories without a recorded schema).
  * Additive ONLY: existing and partition column names refuse. */
final case class GraftAddColumnsCommand(
    schemaName: String, tableName: String, colsDdl: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("column", StringType, nullable = false)(),
    AttributeReference("type", StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val entry = GraftMaintenanceSql.entryFor(schemaName, tableName)
    val table = entry.table
    val engine = entry.engine
    require(table.mergesSchema,
      s"ALTER TABLE ADD COLUMNS on ${table.name.fullyQualifiedName} requires the " +
        "TableDefinition's options to include mergeSchema=true — after evolution the " +
        "table's versions hold mixed file shapes, which only merged reads cover")
    val added = StructType.fromDDL(colsDdl)
    require(added.nonEmpty, "ALTER TABLE ... ADD COLUMNS () is empty")
    val st = engine.tracker.tableState(table.name)
    // the schema being widened: the log's record, else the current read's
    // shape, else the DDL-declared one (a created-but-never-written table)
    val current: StructType = graft.operators.VersionedTables
      .parseSchemaJson(st.currentSchemaJson)
      .orElse {
        val read = engine.read(table).schema
        if (read.nonEmpty) Some(StructType(
          read.filterNot(_.name == Version.VersionColumn).toArray))
        else entry.declared
      }
      .getOrElse(throw new IllegalArgumentException(
        s"${table.name.fullyQualifiedName} has no schema yet (never written, nothing " +
          "declared) — the first write defines it; ALTER has nothing to widen"))
    val existing = current.fieldNames.map(_.toLowerCase).toSet ++
      table.partitionSchema.columnNames.map(_.toLowerCase)
    added.fields.foreach { f =>
      require(!existing(f.name.toLowerCase),
        s"column '${f.name}' already exists on ${table.name.fullyQualifiedName} — " +
          "ADD COLUMNS is additive only (no retyping, no renames)")
    }
    val widened = StructType(current.fields ++ added.fields.map(_.copy(nullable = true)))
    engine.versioned.commit(table.name, TableUpdate(
      GraftMaintenanceSql.sqlUser(session),
      s"SQL ALTER TABLE ADD COLUMNS (${added.fieldNames.mkString(", ")})",
      java.time.Instant.now(),
      List(TableOperation.SetTableSchema(widened.json))))
    added.fields.toSeq.map(f => Row(f.name, f.dataType.simpleString))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftAddColumnsCommand graft.$schemaName.$tableName ADD COLUMNS ($colsDdl)"
}

/** `DESCRIBE [EXTENDED] graft.s.t` — columns from the CURRENT version's
  * schema (declared schema for a never-written table), the partition
  * section, and with EXTENDED the engine-level detail (location, format,
  * stats config, head commit). Output attributes arrive from the parsed
  * DescribeRelation so the row shape is Spark's native one. */
final case class GraftDescribeTableCommand(
    schemaName: String,
    tableName: String,
    isExtended: Boolean,
    attrs: Seq[Attribute])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = attrs

  override def run(session: SparkSession): Seq[Row] = {
    val entry = GraftMaintenanceSql.entryFor(schemaName, tableName)
    val current = entry.engine.read(entry.table).schema
      .filterNot(_.name == Version.VersionColumn)
    val fields =
      if (current.nonEmpty) current.toSeq
      else entry.declared.map(_.toSeq).getOrElse(Seq.empty)
    val cols = fields.map(f => Row(f.name, f.dataType.simpleString, null))
    val partCols = entry.table.partitionSchema.columnNames
    val partSection =
      if (partCols.isEmpty) Seq.empty
      else Row("# Partition Information", "", null) +:
        partCols.map { p =>
          val dt = fields.find(_.name.equalsIgnoreCase(p))
            .map(_.dataType.simpleString).getOrElse("string")
          Row(p, dt, null)
        }
    val extended =
      if (!isExtended) Seq.empty
      else {
        val head = scala.util.Try(
          entry.engine.headCommit(entry.table.name).id).getOrElse("<none>")
        Seq(
          Row("", "", null),
          Row("# Detailed Table Information", "", null),
          Row("Name", s"graft.$schemaName.$tableName", null),
          Row("Location", entry.table.location.toString, null),
          Row("Provider", entry.table.format.name, null),
          Row("Head Commit", head, null)) ++
          entry.table.stats.toSeq.flatMap(cfg => Seq(
            Row("Stats Columns", cfg.statsColumns.mkString(", "), null),
            Row("Bloom Keys", cfg.bloomKeyColumns.mkString(", "), null)))
      }
    cols ++ partSection ++ extended
  }

  override def simpleString(maxFields: Int): String =
    s"GraftDescribeTableCommand graft.$schemaName.$tableName" +
      (if (isExtended) " EXTENDED" else "")
}

/** `ANALYZE TABLE graft.s.t COMPUTE STATISTICS` — BACKFILL the missing
  * stats manifests of the CURRENT version state
  * ([[graft.operators.TableStats.backfillManifests]]): the path that gives
  * adopted / imported / pre-stats tables the same commit-time file
  * skipping new writes get. One scan per distinct missing version label;
  * existing manifests are never rewritten (they're immutable); DV markers
  * backfill their BASE version. Requires a declared
  * [[graft.core.ColumnStatsConfig]] (set `stats.columns` in TBLPROPERTIES
  * or the TableDefinition) — refuses loudly otherwise. Returns one row per
  * manifest written (empty = already fully covered). */
final case class GraftAnalyzeCommand(schemaName: String, tableName: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version_label", StringType, nullable = false)(),
    AttributeReference("partitions_scanned", IntegerType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val entry = GraftMaintenanceSql.entryFor(schemaName, tableName)
    graft.operators.TableStats.backfillManifests(entry.engine, entry.table)
      .map { case (label, parts) => Row(label, parts) }
  }

  override def simpleString(maxFields: Int): String =
    s"GraftAnalyzeCommand graft.$schemaName.$tableName COMPUTE STATISTICS"
}

/** The delegating parser: [[GraftMaintenanceSql.parse]] first, the session
  * parser for everything else (including all other interface methods). */
final class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftMaintenanceSql.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

package graft.operators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.functions.{coalesce, col, lit, not, when}
import org.apache.spark.sql.types.{StructField, StructType}

/**
 * The GENERAL clause-based MERGE for versioned tables — the full SQL
 * `MERGE INTO` shape: ordered `WHEN MATCHED [AND cond] THEN UPDATE SET
 * col = expr … / DELETE`, `WHEN NOT MATCHED [AND cond] THEN INSERT …`,
 * and `WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE / DELETE`.
 * [[VersionedMerge.MergeOps.mergeInto]] stays the fast path for the keyed
 * source-row replacement (anti-join + union, no wide join); this operator
 * covers everything that shape cannot express: partial-column updates
 * that keep target values, conditions referencing the target row, and
 * acting on target rows the source does NOT mention. The reference has no
 * merge at all (chronicles only overwrites whole partitions,
 * `spark/src/main/scala/dev/chronicles/spark/SparkSupport.scala:51-128`).
 *
 * Expression vocabulary (Scala and SQL faces share it): TARGET columns
 * are plain names (`col("value")`), SOURCE columns are `s.`-qualified
 * (`col("s.value")`). Clause semantics are SQL MERGE's:
 *
 *   - a target row with a key match takes the FIRST matched clause whose
 *     condition is TRUE (unconditioned = always; NULL falls through —
 *     three-valued, like mergeInto's deleteWhen); no clause fires → the
 *     row is kept bit-identical;
 *   - a source row matching nothing takes the first not-matched clause
 *     whose (source-only) condition is TRUE and inserts its values
 *     (unassigned columns are NULL); none fires → the row is discarded;
 *   - a target row matching no source key takes the first
 *     not-matched-by-source clause whose (target-only) condition is TRUE;
 *     none → kept.
 *
 * Scale shape (the 100 TB contract, same discipline as mergeInto/DML):
 *   - matched-row discovery is pruned by [[VersionedMerge.candidatePartitions]]
 *     (key⊇partition values / manifest ranges / partition Blooms — no
 *     false negatives) before one semi-join over only the surviving
 *     candidates;
 *   - NOT MATCHED BY SOURCE clauses can touch rows anywhere, so their
 *     rewrite slice is pruned by [[TableStats.partitionsMayMatch]] over
 *     the OR of the clause conditions (an UNCONDITIONAL by-source clause
 *     means the whole table is semantically in scope — that full rewrite
 *     is the statement's meaning, not an implementation artifact);
 *   - even the target SCHEMA is resolved from the pruned scope (candidate
 *     ∪ by-source partitions), never from a whole-table footer read —
 *     the corrupt-the-untouched law covers analysis, not just execution;
 *   - inserts are computed EXACTLY (source anti-join the candidate
 *     slice's keys), so a partition is only rewritten if a row in it
 *     changes or lands in it;
 *   - the rewrite reads only the touched slice, the output is persisted
 *     across final-partition discovery and the physical write, emptied
 *     partitions are removed from the commit (data retained for time
 *     travel), and the commit CASes on the head pinned at entry.
 */
object MergeApply {

  /** One `WHEN MATCHED [AND condition]` clause, in statement order. */
  sealed trait MatchedAction {
    def condition: Option[Column]
  }
  /** `THEN UPDATE SET col = expr, …` — unassigned columns keep the target
    * value; expressions see the old target row (plain names) and the
    * matching source row (`s.` names). SETting a partition column MOVES
    * the row: the origin partition is rewritten without it and the
    * destination partitions (discovered from the post-image) are rewritten
    * with it. The provably-no-op `SET pcol = s.pcol` where `pcol` is a
    * merge key (what SQL's `UPDATE SET *` expands to) is dropped, keeping
    * the cheaper no-move plan. */
  final case class MatchedUpdate(condition: Option[Column], set: Map[String, Column])
      extends MatchedAction
  /** `THEN DELETE`. */
  final case class MatchedDelete(condition: Option[Column]) extends MatchedAction

  /** `WHEN NOT MATCHED [AND condition] THEN INSERT` — values over SOURCE
    * columns (plain or `s.`-qualified, same thing here); target columns
    * without a value insert NULL. */
  final case class NotMatchedInsert(condition: Option[Column], values: Map[String, Column])

  /** One `WHEN NOT MATCHED BY SOURCE [AND condition]` clause — conditions
    * and update expressions see TARGET columns only. */
  sealed trait BySourceAction {
    def condition: Option[Column]
  }
  final case class BySourceUpdate(condition: Option[Column], set: Map[String, Column])
      extends BySourceAction
  final case class BySourceDelete(condition: Option[Column]) extends BySourceAction

  // action codes for the per-row clause dispatch column
  private val Keep = -1
  private val Drop = -2

  private val SourcePrefix = "_graft_s_"
  // deliberately OUTSIDE the SourcePrefix rename image: a source column
  // named "present" renames to _graft_s_present, which must not collide
  private val PresentCol = "_graft_m_present"
  private val ActionCol = "_graft_m_action"

  implicit final class MergeApplyOps(private val engine: VersionedTables) extends AnyVal {

    /** Apply a general clause-based merge of `source` into the current
      * version of `table` on equality of `keyColumns`, as ONE atomic
      * commit. See [[MergeApply]] for semantics and the scale contract.
      * Duplicate source keys make matched clauses ambiguous (SQL MERGE
      * raises too) — `requireDistinctSourceKeys` pins that with one
      * aggregation; opt out only when the producer guarantees it. */
    def mergeApply(
        table: TableDefinition,
        source: DataFrame,
        keyColumns: Seq[String],
        userId: UserId,
        message: String,
        matched: Seq[MatchedAction] = Nil,
        notMatched: Seq[NotMatchedInsert] = Nil,
        notMatchedBySource: Seq[BySourceAction] = Nil,
        clusterBy: Seq[String] = Nil,
        requireDistinctSourceKeys: Boolean = true,
        evolveSchema: Boolean = false): VersionedMerge.MergeResult =
      MergeApply.run(engine, table, source, keyColumns, userId, message,
        matched, notMatched, notMatchedBySource, clusterBy, requireDistinctSourceKeys,
        evolveSchema)
  }

  // ---------------------------------------------------------------------
  // implementation

  private def run(
      engine: VersionedTables,
      table: TableDefinition,
      source: DataFrame,
      keyColumns: Seq[String],
      userId: UserId,
      message: String,
      matched0: Seq[MatchedAction],
      notMatched: Seq[NotMatchedInsert],
      notMatchedBySource: Seq[BySourceAction],
      clusterBy: Seq[String],
      requireDistinctSourceKeys: Boolean,
      evolveSchema: Boolean): VersionedMerge.MergeResult = {

    require(keyColumns.nonEmpty, "mergeApply needs at least one key column")
    require(matched0.nonEmpty || notMatched.nonEmpty || notMatchedBySource.nonEmpty,
      "mergeApply needs at least one WHEN clause")
    val missingKeys = keyColumns.filterNot(k => source.columns.exists(_.equalsIgnoreCase(k)))
    require(missingKeys.isEmpty, s"key columns not in source: ${missingKeys.mkString(", ")}")
    // the rewrite introduces _graft_-prefixed working columns (renamed
    // source, presence marker, clause dispatch) — reserve the namespace
    source.columns.find(_.toLowerCase.startsWith("_graft_")).foreach { c =>
      throw new IllegalArgumentException(
        s"mergeApply: source column '$c' uses the reserved _graft_ prefix")
    }

    val sourceColsLower = source.columns.map(_.toLowerCase).toSet
    val partCols = table.partitionSchema.columnNames
    val partColsLower = partCols.map(_.toLowerCase).toSet

    // `SET pcol = s.pcol` where pcol is a merge key is a provable no-op
    // (matched ⇒ equal) — drop it, so SQL `UPDATE SET *` works on
    // partitioned tables merged on their partition columns
    val matched: Seq[MatchedAction] = matched0.map {
      case MatchedUpdate(cond, set) => MatchedUpdate(cond, set.filterNot { case (c, v) =>
        partColsLower.contains(c.toLowerCase) &&
          keyColumns.exists(_.equalsIgnoreCase(c)) && isSourceSelfRef(v, c)
      })
      case other => other
    }

    // MATCHED updates MAY set partition columns — the rewrite treats those
    // rows as moves (origin partition rewritten without them, destination
    // partitions discovered from the post-image and rewritten too). BY
    // SOURCE updates cannot: their scope is pruned from the clause
    // conditions BEFORE any read, and a move would need a second
    // destination-discovery pass over rows the source never mentions.
    val movesPossible = matched.exists {
      case MatchedUpdate(_, set) => set.keys.exists(c => partColsLower.contains(c.toLowerCase))
      case _ => false
    }
    notMatchedBySource.foreach {
      case BySourceUpdate(_, set) => set.keys.foreach { c =>
        require(!partColsLower.contains(c.toLowerCase),
          s"WHEN NOT MATCHED BY SOURCE UPDATE cannot SET partition column '$c' — " +
            "moving rows the source does not mention needs an unprunable rewrite; " +
            "use a matched clause or DML")
      }
      case _ => ()
    }
    // … and by-source clauses referencing source columns (no matching
    // source row exists; the conditions also drive partition pruning)
    notMatchedBySource.foreach { a =>
      (a.condition.toSeq ++ (a match {
        case BySourceUpdate(_, set) => set.values.toSeq
        case _ => Seq.empty
      })).foreach { c =>
        require(!referencesSource(c, sourceColsLower),
          "WHEN NOT MATCHED BY SOURCE clauses cannot reference source columns " +
            "(there is no matching source row)")
      }
    }

    // pin EVERYTHING to one head snapshot (headState: O(partitions + tail),
                                                                       // never a history replay); the commit CASes on it
    val state = engine.tracker.headState(table.name)
    val head = state.head
    val snapshot = state.version
    val now = java.time.Instant.now()

    if (requireDistinctSourceKeys && matched.nonEmpty) {
      // reserved aggregate alias: .count() names its column "count", which a
      // merge key column of that name would make ambiguous (or shadow)
      val dup = source.groupBy(keyColumns.map(c => col(s"`$c`")): _*)
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("_graft_m_cnt"))
        .filter(col("_graft_m_cnt") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"duplicate source keys on (${keyColumns.mkString(", ")}): e.g. ${dup.head} — " +
          "a target row matched by two source rows is ambiguous (SQL MERGE raises here too)")
    }

    val keyFrame = source.select(keyColumns.map(c => col(s"`$c`")): _*).distinct()

    // schema-dependent validation, once the target schema is known (from a
    // read scoped to the pruned partitions — see each branch)
    def validate(targetSchema: StructType): Seq[String] = {
      require(targetSchema.nonEmpty,
        s"mergeApply into never-written table ${table.name.fullyQualifiedName}: the table " +
          "has no schema to merge against — load it first (versionedInsertInto / mergeInto)")
      val targetCols = targetSchema.map(_.name)
      // the `s.` qualifier must be unambiguous: a top-level target column
      // named `s` would make `s.x` mean struct-field access of that column
      require(!targetCols.exists(_.equalsIgnoreCase("s")),
        s"mergeApply: target ${table.name.fullyQualifiedName} has a column named 's' — " +
          "the s.<col> source qualifier would be ambiguous with struct access")
      targetCols.find(_.toLowerCase.startsWith("_graft_")).foreach { c =>
        throw new IllegalArgumentException(
          s"mergeApply: target column '$c' uses the reserved _graft_ prefix")
      }
      def known(c: String, clause: String): Unit =
        require(targetCols.exists(_.equalsIgnoreCase(c)),
          s"$clause column '$c' is not a column of ${table.name.fullyQualifiedName}")
      matched.foreach {
        case MatchedUpdate(_, set) => set.keys.foreach(known(_, "WHEN MATCHED UPDATE SET"))
        case _ => ()
      }
      notMatchedBySource.foreach {
        case BySourceUpdate(_, set) =>
          set.keys.foreach(known(_, "WHEN NOT MATCHED BY SOURCE UPDATE SET"))
        case _ => ()
      }
      notMatched.foreach(_.values.keys.foreach(known(_, "WHEN NOT MATCHED INSERT")))
      targetCols
    }

    // ------------------------------------------------------------------
    // clause dispatch codes (statement order; first TRUE condition wins)
    val matchedCodes: Seq[(MatchedAction, Int)] = matched.zipWithIndex
    val bySourceCodes: Seq[(BySourceAction, Int)] = notMatchedBySource.zipWithIndex.map {
      case (a, i) => (a, 100 + i)
    }
    val insertCodes: Seq[(NotMatchedInsert, Int)] = notMatched.zipWithIndex.map {
      case (a, i) => (a, 200 + i)
    }

    def chain(clauses: Seq[(Option[Column], Int)], default: Int): Column =
      clauses.foldRight(lit(default)) { case ((cond, code), els) =>
        when(coalesce(cond.map(internalize(_, sourceColsLower)).getOrElse(lit(true)),
          lit(false)), lit(code)).otherwise(els)
      }

    val matchedDeleteCodes: Seq[Int] = matchedCodes.collect { case (_: MatchedDelete, i) => i }
    val bySourceDeleteCodes: Seq[Int] = bySourceCodes.collect { case (_: BySourceDelete, i) => i }
    val dropCodes: Seq[Int] = matchedDeleteCodes ++ bySourceDeleteCodes :+ Drop

    def chainValues(updates: Seq[(Int, Column)], f: StructField): Column =
      updates.foldRight(col(s"`${f.name}`"): Column) { case ((code, expr), els) =>
        when(col(ActionCol) === lit(code), expr).otherwise(els)
      }.cast(f.dataType).as(f.name)

    /** Conform a target-slice frame to `schema`: present columns cast,
      * absent ones NULL-filled. Mixed-schema (evolved) tables make this
      * load-bearing — a slice read can carry any GENERATION of the schema,
      * and the old select-by-name would either drop newer columns from the
      * rewrite (silent data loss on the write-back) or fail to resolve. */
    def alignTo(df: DataFrame, schema: StructType): DataFrame =
      df.select(schema.map { f =>
        if (df.columns.exists(_.equalsIgnoreCase(f.name)))
          col(s"`${f.name}`").cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)

    def matchedUpdatesFor(f: StructField): Seq[(Int, Column)] =
      matchedCodes.collect {
        case (MatchedUpdate(_, set), i) if set.keys.exists(_.equalsIgnoreCase(f.name)) =>
          i -> internalize(set.find(_._1.equalsIgnoreCase(f.name)).get._2, sourceColsLower)
      }
    def bySourceUpdatesFor(f: StructField): Seq[(Int, Column)] =
      bySourceCodes.collect {
        case (BySourceUpdate(_, set), i) if set.keys.exists(_.equalsIgnoreCase(f.name)) =>
          i -> internalize(set.find(_._1.equalsIgnoreCase(f.name)).get._2, sourceColsLower)
      }

    // the rewritten value of target column `f` on the joined slice (both
    // clause families — the single-slice shape)
    def rewriteValue(f: StructField): Column =
      chainValues(matchedUpdatesFor(f) ++ bySourceUpdatesFor(f), f)

    def dropFilter(df: DataFrame, codes: Seq[Int]): DataFrame =
      if (codes.isEmpty) df
      else df.filter(not(col(ActionCol).isin(codes.map(Int.box): _*)))

    /** slice (target rows) → rewritten rows, target schema. */
    def rewriteSlice(slice: DataFrame, targetSchema: StructType): DataFrame = {
      // matched rows need the source row's columns only if a matched clause
      // exists; otherwise a distinct-key presence marker suffices (and
      // cannot duplicate kept rows under duplicate source keys)
      val joined =
        if (matched.nonEmpty) {
          val renamed = source.select(
            source.columns.map(c => col(s"`$c`").as(SourcePrefix + c.toLowerCase)) :+
              lit(true).as(PresentCol): _*)
          val joinCond = keyColumns.map(k =>
            col(s"`$k`") === col(s"`$SourcePrefix${k.toLowerCase}`")).reduce(_ && _)
          slice.join(renamed, joinCond, "left_outer")
        } else {
          slice.join(keyFrame.withColumn(PresentCol, lit(true)),
            keyColumns.toSeq, "left_outer")
        }
      val action = when(col(PresentCol).isNotNull,
        chain(matchedCodes.map { case (a, i) => (a.condition, i) }, Keep))
        .otherwise(chain(bySourceCodes.map { case (a, i) => (a.condition, i) }, Keep))
      dropFilter(joined.withColumn(ActionCol, action), dropCodes)
        .select(targetSchema.map(rewriteValue): _*)
    }

    /** matched target rows (from the candidate slice) → their post-images:
      * inner join with the renamed source, matched-clause dispatch, deletes
      * dropped, updates applied (possibly moving rows across partitions). */
    def rewriteMatched(candFull: DataFrame, targetSchema: StructType): DataFrame = {
      val renamed = source.select(
        source.columns.map(c => col(s"`$c`").as(SourcePrefix + c.toLowerCase)): _*)
      val joinCond = keyColumns.map(k =>
        col(s"`$k`") === col(s"`$SourcePrefix${k.toLowerCase}`")).reduce(_ && _)
      val joined = candFull.join(renamed, joinCond, "inner")
        .withColumn(ActionCol, chain(matchedCodes.map { case (a, i) => (a.condition, i) }, Keep))
      dropFilter(joined, matchedDeleteCodes)
        .select(targetSchema.map(f => chainValues(matchedUpdatesFor(f), f)): _*)
    }

    /** UNMATCHED rows of the touched slice (matched ones are emitted by
      * [[rewriteMatched]]) → by-source dispatch. */
    def rewriteUnmatched(slice: DataFrame, targetSchema: StructType): DataFrame = {
      val un = slice.join(keyFrame, keyColumns.toSeq, "left_anti")
        .withColumn(ActionCol, chain(bySourceCodes.map { case (a, i) => (a.condition, i) }, Keep))
      dropFilter(un, bySourceDeleteCodes)
        .select(targetSchema.map(f => chainValues(bySourceUpdatesFor(f), f)): _*)
    }

    /** source rows that match nothing → inserted rows, target schema.
      * Values evaluate over the source frame itself (plain = `s.` here). */
    def insertRows(eligible: DataFrame, targetSchema: StructType): DataFrame = {
      val action = chain(insertCodes.map { case (a, i) =>
        (a.condition.map(stripSourceQualifier(_, sourceColsLower)), i)
      }, Drop)
      val withAction = eligible.withColumn(ActionCol, action)
        .filter(col(ActionCol) =!= lit(Drop))
      val cols = targetSchema.map { f =>
        val perClause: Seq[(Int, Column)] = insertCodes.collect {
          case (NotMatchedInsert(_, values), i)
              if values.keys.exists(_.equalsIgnoreCase(f.name)) =>
            i -> stripSourceQualifier(
              values.find(_._1.equalsIgnoreCase(f.name)).get._2, sourceColsLower)
        }
        perClause.foldRight(lit(null).cast(f.dataType): Column) { case ((code, expr), els) =>
          when(col(ActionCol) === lit(code), expr).otherwise(els)
        }.cast(f.dataType).as(f.name)
      }
      withAction.select(cols: _*)
    }

    def dropVersionCol(schema: StructType): StructType =
      StructType(schema.filterNot(_.name == Version.VersionColumn).toArray)

    /** The output schema: with `evolveSchema`, source columns missing
      * from the read schema JOIN it (nullable, source types) — under the
      * same mergeSchema contract as versionedInsertIntoEvolving, because a
      * partitioned-table merge leaves mixed file schemas behind. SNAPSHOT
      * tables are exempt from the contract: their merge rewrites the whole
      * table as ONE uniform version, so mixed schemas cannot occur.
      *
      * Only source columns a clause ASSIGNS (an UPDATE SET target or an
      * INSERT values key) can join the schema — Delta/Spark evolution
      * semantics. A helper column referenced only in a clause CONDITION
      * (e.g. a `flag` discriminator) must NOT become a permanent all-NULL
      * target column: the engine has no DROP COLUMN to undo it. */
    val assignedColsLower: Set[String] =
      (matched.collect { case MatchedUpdate(_, set) => set.keys }.flatten ++
        notMatched.flatMap(_.values.keys) ++
        notMatchedBySource.collect { case BySourceUpdate(_, set) => set.keys }.flatten)
        .map(_.toLowerCase).toSet
    def extendSchema(read: StructType): StructType = {
      val existing = read.fieldNames.map(_.toLowerCase).toSet
      if (!evolveSchema) read
      else {
        val extra = source.schema.fields
          .filterNot(f => existing(f.name.toLowerCase))
          .filter(f => assignedColsLower(f.name.toLowerCase))
          .map(f => org.apache.spark.sql.types.StructField(f.name, f.dataType, nullable = true))
        if (extra.nonEmpty && !table.isSnapshot)
          require(table.mergesSchema,
            s"mergeApply(evolveSchema=true) on ${table.name.fullyQualifiedName} requires " +
              "the TableDefinition's options to include mergeSchema=true: the merge " +
              "leaves mixed file schemas, and a read sampling one footer would silently " +
              "drop the new columns")
        StructType(read.fields ++ extra)
      }
    }

    snapshot match {
      case SnapshotTableVersion(_) =>
        // snapshot table = one unit of data: the whole table is the slice
        // (and the schema scope)
        val currentAll = engine.readVersion(table, snapshot)
        val targetSchema = extendSchema(dropVersionCol(currentAll.schema))
        validate(targetSchema)
        val current = alignTo(currentAll, targetSchema)
        val inserts =
          if (notMatched.isEmpty) None
          else Some(insertRows(
            source.join(keyOnly(current, keyColumns), keyColumns.toSeq, "left_anti"),
            targetSchema))
        val out0 = rewriteSlice(current, targetSchema)
        // single consumer (the write) — a persist here would materialize the
        // whole rewrite once into cache and then copy it out again
        val out = inserts.map(out0.unionByName(_)).getOrElse(out0)
        val version = Version.generate()
        VersionedTables.writeDataVersioned(out, table, version, clusterBy)
        if (table.stats.nonEmpty)
          TableStats.collectAndWrite(engine.spark, table, version, Nil, Some(out.schema))
        val versionDir = new org.apache.hadoop.fs.Path(
          VersionPaths.pathFor(table.location, version))
        val fs = versionDir.getFileSystem(engine.spark.sparkContext.hadoopConfiguration)
        require(fs.exists(versionDir),
          s"mergeApply emptied snapshot table ${table.name.fullyQualifiedName} — a " +
            "snapshot version must carry at least one row (emptying is a replace-all concern)")
        val (tv, changes) = engine.versioned.commitIf(
          table.name, TableUpdate(userId, message, now,
            VersionedTables.schemaOpsFor(table, state.schemaJson, snapshot, out.schema,
              definesWholeTable = true) :+
              TableOperation.AddTableVersion(version)), head)
        VersionedMerge.MergeResult(tv, changes, Nil, Nil)

      case PartitionedTableVersion(pvs) =>
        // (1) candidate partitions that CAN hold a source key — needed both
        // for matched-row discovery and for exact insert suppression
        val candidates =
          if (pvs.isEmpty || (matched.isEmpty && notMatched.isEmpty)) Map.empty[Partition, Version]
          else VersionedMerge.candidatePartitions(engine, table, pvs, keyFrame, keyColumns)
        // (2) partitions a by-source clause could touch — stats-pruned,
        // no false negatives; an unconditional clause scopes the table
        val bySourceParts: Set[Partition] =
          if (notMatchedBySource.isEmpty) Set.empty
          else {
            val conds = notMatchedBySource.map(_.condition)
            if (conds.exists(_.isEmpty)) pvs.keySet
            else TableStats.partitionsMayMatch(engine, table, pvs,
              conds.flatten.reduce(_ || _)).keySet
          }
        // the target schema comes from a read SCOPED to the pruned
        // partitions — the corrupt-the-untouched law covers analysis too.
        // Only a merge that touches nothing prunable (pure insert into a
        // table with zero candidates) falls back to the unscoped read.
        val scopedPvs = candidates ++ pvs.filter { case (p, _) => bySourceParts(p) }
        // uniform-schema tables resolve their schema from the pruned scope
        // (the corrupt-the-untouched law covers analysis); a mergeSchema
        // (evolution-capable) table may hold MIXED generations, so its
        // output schema must be the table-wide UNION — a scope-derived
        // schema could silently drop an evolved column from partitions the
        // merge rewrites (the footer-merge read is the documented cost of
        // evolved tables)
        val readSchema = dropVersionCol(
          if (table.mergesSchema) engine.read(table).schema
          else if (scopedPvs.nonEmpty)
            engine.readVersion(table, PartitionedTableVersion(scopedPvs)).schema
          else engine.read(table).schema)
        val targetSchema = extendSchema(readSchema)
        validate(targetSchema)

        // one persisted candidate read serves matched-partition discovery,
        // the matched rewrite, and insert suppression: full columns when a
        // matched clause needs the rows, keys + partition columns otherwise
        val candSlice: Option[DataFrame] =
          if (candidates.isEmpty) None
          else {
            val slice = engine.readVersion(table, PartitionedTableVersion(candidates))
            val projected =
              if (matched.nonEmpty) alignTo(slice, targetSchema)
              else slice.select((keyColumns ++ partCols.filterNot(p =>
                keyColumns.exists(_.equalsIgnoreCase(p)))).map(c => col(s"`$c`")): _*)
            Some(projected.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
          }
        try {
          // (3) partitions whose rows a matched clause could change — exact
          val matchedParts: Set[Partition] =
            if (matched.isEmpty) Set.empty
            else candSlice match {
              case None => Set.empty
              case Some(cs) => VersionedTables.partitionValues(
                cs.join(keyFrame, keyColumns.toSeq, "left_semi"),
                table.partitionSchema).toSet
            }
          // matched rows → post-images (kept / updated / moved; deletes out).
          // Persisted only when moves are possible — then it has a second
          // consumer, the destination-partition discovery.
          val matchedOut: Option[DataFrame] =
            if (matched.isEmpty) None
            else candSlice.map(rewriteMatched(_, targetSchema)).map(mo =>
              if (movesPossible)
                mo.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              else mo)
          try {
            // partitions updated rows LAND in — origins when nothing SETs a
            // partition column, discovered from the post-image otherwise
            val destParts: Set[Partition] =
              if (!movesPossible) matchedParts
              else matchedOut match {
                case None => Set.empty
                case Some(mo) =>
                  VersionedTables.partitionValues(mo, table.partitionSchema).toSet
              }
            // (4) inserted rows, computed exactly (anti-join candidate keys)
            val inserts: Option[DataFrame] =
              if (notMatched.isEmpty) None
              else {
                val eligible = candSlice match {
                  case Some(cs) => source.join(
                    cs.select(keyColumns.map(c => col(s"`$c`")): _*),
                    keyColumns.toSeq, "left_anti")
                  case None => source
                }
                Some(insertRows(eligible, targetSchema)
                  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
              }
            try {
              val insertParts: Set[Partition] = inserts match {
                case None => Set.empty
                case Some(i) => VersionedTables.partitionValues(i, table.partitionSchema).toSet
              }
              val touched =
                matchedParts ++ (destParts & pvs.keySet) ++ bySourceParts ++
                  (insertParts & pvs.keySet)
              if (touched.isEmpty && insertParts.isEmpty && destParts.isEmpty)
                return VersionedMerge.MergeResult(snapshot, TableChanges.empty, Nil, Nil)

              val touchedPvs = pvs.filter { case (p, _) => touched(p) }
              // unmatched rows of the touched slice: with matched clauses
              // present the matched rows are already emitted post-image by
              // rewriteMatched (anti-join excludes them here); without, the
              // single-slice marker join keeps them bit-identical. Touched
              // partitions already sitting in the PERSISTED candidate slice
              // are served from it — no second scan of matched partitions.
              val rewritten: Option[DataFrame] =
                if (touchedPvs.isEmpty) None
                else if (matched.nonEmpty) {
                  val candTouched = candidates.keySet & touched
                  val freshPvs = touchedPvs.filter { case (p, _) => !candTouched(p) }
                  val fresh =
                    if (freshPvs.isEmpty) None
                    else Some(alignTo(
                      engine.readVersion(table, PartitionedTableVersion(freshPvs)),
                      targetSchema))
                  val fromCand = candSlice.filter(_ => candTouched.nonEmpty).map { cs =>
                    if (candTouched == candidates.keySet) cs
                    else cs.filter(partitionMember(candTouched))
                  }
                  val slice = (fresh, fromCand) match {
                    case (Some(f), Some(c)) => f.unionByName(c)
                    case (Some(f), None)    => f
                    case (None, Some(c))    => c
                    case (None, None)       => return VersionedMerge.MergeResult(
                      snapshot, TableChanges.empty, Nil, Nil) // unreachable: touched nonEmpty
                  }
                  Some(rewriteUnmatched(slice, targetSchema))
                } else
                  Some(rewriteSlice(alignTo(
                    engine.readVersion(table, PartitionedTableVersion(touchedPvs)),
                    targetSchema), targetSchema))
              val pieces = Seq(rewritten, matchedOut, inserts).flatten
              if (pieces.isEmpty)
                return VersionedMerge.MergeResult(snapshot, TableChanges.empty, Nil, Nil)
              // fused write: final-partition discovery observed DURING the
              // write (one evaluation; the matchedOut/inserts pieces with
              // genuine second consumers stay persisted above — this union's
              // only consumer is the write itself)
              val out = pieces.reduce(_.unionByName(_))
              val version = Version.generate()
              val finalParts = VersionedTables.writeDataVersionedObserved(
                out, table, version, clusterBy)
              if (finalParts.nonEmpty) {
                // first-class write: the new version carries stats manifests
                // so later reads keep pruning after the rewrite
                if (table.stats.nonEmpty)
                  TableStats.collectAndWrite(engine.spark, table, version, finalParts,
                    Some(out.schema))
              }
              val emptied = (touched -- finalParts.toSet).toList.sortBy(_.toPath)
                .filter(pvs.contains)
              val ops = finalParts.sortBy(_.toPath)
                .map(TableOperation.AddPartitionVersion(_, version)) ++
                emptied.map(TableOperation.RemovePartition(_))
              if (ops.isEmpty)
                return VersionedMerge.MergeResult(snapshot, TableChanges.empty, Nil, Nil)
              // an evolveSchema merge is a schema-defining commit — record it
              val schemaOps = VersionedTables.schemaOpsFor(
                table, state.schemaJson, snapshot, out.schema, definesWholeTable = false)
              val (tv, changes) = engine.versioned.commitIf(
                table.name, TableUpdate(userId, message, now, schemaOps ++ ops), head)
              VersionedMerge.MergeResult(tv, changes, finalParts, emptied)
            } finally { inserts.foreach(_.unpersist(blocking = false)); () }
          } finally {
            if (movesPossible) matchedOut.foreach(_.unpersist(blocking = false)); ()
          }
        } finally { candSlice.foreach(_.unpersist(blocking = false)); () }
    }
  }

  /** Key columns only, for anti-join suppression. */
  private def keyOnly(df: DataFrame, keys: Seq[String]): DataFrame =
    df.select(keys.map(c => col(s"`$c`")): _*)

  /** Row-is-in-one-of-these-partitions predicate, comparing partition
    * columns in their STRING (directory-name) form — the VersionedDml
    * member discipline, so no type coercion can silently deselect. An OR
    * over the partition set: fine at rewrite-slice cardinalities. */
  private def partitionMember(parts: Set[Partition]): Column =
    parts.toSeq.map { p =>
      p.columnValues.map { cv =>
        val c = col(s"`${cv.column.name}`")
        if (cv.value == PathCodec.DefaultPartitionName) c.isNull
        else c.cast("string") === lit(cv.value)
      }.reduce(_ && _)
    }.reduce(_ || _)

  /** Is `v` exactly the source's own column `c` (`s.c`)? — the provably
    * no-op `SET * `-generated assignment of a merge-key partition column. */
  private def isSourceSelfRef(v: Column, c: String): Boolean =
    GraftSqlBridge.convertedExpression(v) match {
      case ua: UnresolvedAttribute =>
        ua.nameParts.length == 2 && ua.nameParts.head.equalsIgnoreCase("s") &&
          ua.nameParts(1).equalsIgnoreCase(c)
      case _ => false
    }

  /** Rewrite `s.<col>` references to the internal renamed source columns
    * of the joined frame; plain names resolve against the target slice.
    * Subqueries are refused (the expression is evaluated inside a rewrite
    * that runs twice — discovery and write — and must be stable). */
  private def internalize(c: Column, sourceColsLower: Set[String]): Column =
    mapSourceRefs(c, sourceColsLower,
      rest => UnresolvedAttribute(rest.updated(0, SourcePrefix + rest.head.toLowerCase)))

  /** For expressions evaluated over the SOURCE frame itself (insert
    * clauses): `s.<col>` just means `<col>`. */
  private def stripSourceQualifier(c: Column, sourceColsLower: Set[String]): Column =
    mapSourceRefs(c, sourceColsLower, rest => UnresolvedAttribute(rest))

  private def mapSourceRefs(
      c: Column,
      sourceColsLower: Set[String],
      f: Seq[String] => UnresolvedAttribute): Column = {
    val e = GraftSqlBridge.convertedExpression(c)
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      "subqueries in merge clause expressions are not supported — " +
        "materialize the subquery into the source frame")
    val t = e.transform {
      case ua: UnresolvedAttribute
          if ua.nameParts.length >= 2 && ua.nameParts.head.equalsIgnoreCase("s") &&
            sourceColsLower.contains(ua.nameParts(1).toLowerCase) =>
        f(ua.nameParts.drop(1))
    }
    GraftSqlBridge.column(t)
  }

  private def referencesSource(c: Column, sourceColsLower: Set[String]): Boolean =
    GraftSqlBridge.convertedExpression(c).exists {
      case ua: UnresolvedAttribute =>
        ua.nameParts.length >= 2 && ua.nameParts.head.equalsIgnoreCase("s") &&
          sourceColsLower.contains(ua.nameParts(1).toLowerCase)
      case _ => false
    }
}

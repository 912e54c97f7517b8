package graft.sql

import graft.core.{TableDefinition, TableVersion}
import graft.operators.{TableStats, VersionedTables}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import scala.util.control.NonFatal

/**
 * Transparent manifest-driven data skipping at OPTIMIZER time — the Delta
 * `PrepareDeltaScan` pattern re-expressed for graft's commit-time stats
 * manifests ([[graft.operators.TableStats]]).
 *
 * `readWhere`/`readAtWhere` prune files eagerly because the caller hands
 * them the predicate up front. SQL text (`SELECT … FROM graft.s.t WHERE …`)
 * and the plain Scala composition (`engine.read(table).filter(…)`) cannot:
 * the relation is built before any predicate exists. This rule closes that
 * gap where predicates DO become known — in the optimized plan:
 *
 *   1. [[VersionedTables.readVersion]] records every file relation it
 *      builds for a stats-declaring table in [[GraftScanRegistry]]
 *      (weakly — entries die with their relations);
 *   2. after operator optimization has pushed predicates down (pre-CBO, so
 *      the swap runs ONCE per query and join-size estimation sees the
 *      shrunken scan), [[GraftDataSkipping]] matches `Filter` directly over
 *      a recorded relation, runs the same conservative planner as the eager
 *      path ([[TableStats.planRead]] — one cached manifest read per
 *      distinct version label, no Spark job), and when files are provably
 *      irrelevant swaps in a [[PrunedGraftFileIndex]] over the SAME
 *      relation: identical output attributes, schema and partitioning, just
 *      fewer files and an honestly smaller `sizeInBytes` (so a pruned side
 *      can become broadcastable).
 *
 * The `Filter` itself always stays in the plan — like every other skipping
 * path, pruning can only shrink IO, never change results (the
 * `readWhere ≡ read().filter` law battery extends to this path in
 * SqlSkippingSpec). Any planner failure falls back to the unpruned plan.
 *
 * Scope guards: only relations recorded by `readVersion` (stats-declaring
 * tables, cleanly versioned states) are candidates; everything else —
 * including every graft table without a [[graft.core.ColumnStatsConfig]] —
 * passes through untouched. Set `spark.graft.dataSkipping.enabled=false`
 * to turn the rule off per session or per query (specs use this to build
 * genuinely-unpruned reference frames).
 */
final case class GraftDataSkipping(session: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    session.conf.get(GraftDataSkipping.EnabledKey, "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case f @ Filter(cond, lr: LogicalRelation) =>
        lr.relation match {
          case fsRel: HadoopFsRelation =>
            GraftScanRegistry.lookup(fsRel) match {
              case Some(e) => prune(f, cond, lr, fsRel, e)
              case None    => f
            }
          case _ => f
        }
    }

  private def prune(
      original: Filter,
      cond: Expression,
      lr: LogicalRelation,
      fsRel: HadoopFsRelation,
      entry: GraftScanRegistry.Entry): LogicalPlan =
    try {
      val decision = TableStats.planRead(entry.engine, entry.table, entry.version, cond)
      val prunesAnything = decision.partitionsKept < decision.partitionsTotal ||
        decision.filesKept < decision.filesSeen
      if (!prunesAnything) original
      else {
        val pruned = new PrunedGraftFileIndex(fsRel.location, decision.paths)
        Filter(cond, lr.copy(relation = fsRel.copy(location = pruned)(fsRel.sparkSession)))
      }
    } catch {
      // skipping is an optimization: a planner failure (e.g. a manifest
      // deleted mid-flight by vacuum) must degrade to the full scan, not
      // fail the query
      case NonFatal(_) => original
    }
}

object GraftDataSkipping {
  val EnabledKey = "spark.graft.dataSkipping.enabled"
}

/**
 * What [[VersionedTables.readVersion]] records so the optimizer rule can
 * identify a file relation as "version X of graft table T": a WEAK map from
 * the relation object to its provenance. Entries are collected with their
 * relations — a new commit builds a new relation, and old queries' entries
 * vanish once their plans do. Lookups happen once per `Filter`-over-relation
 * node per query optimization: a map get, no IO.
 */
object GraftScanRegistry {

  final case class Entry(engine: VersionedTables, table: TableDefinition, version: TableVersion)

  private val entries = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[HadoopFsRelation, Entry]())

  /** Record every file relation in `df`'s analyzed plan as a read of
    * `version` of `table`. Called by `readVersion` for cleanly-versioned
    * states of stats-declaring tables; forcing analysis here is driver-only
    * work the first consumer would pay anyway. */
  def record(df: DataFrame, engine: VersionedTables, table: TableDefinition,
      version: TableVersion): Unit =
    try {
      df.queryExecution.analyzed.foreach {
        case lrel: LogicalRelation =>
          lrel.relation match {
            case fs: HadoopFsRelation => entries.put(fs, Entry(engine, table, version)); ()
            case _                    => ()
          }
        case _ => ()
      }
    } catch { case NonFatal(_) => () }

  def lookup(rel: HadoopFsRelation): Option[Entry] = Option(entries.get(rel))
}

/**
 * A [[FileIndex]] view of `underlying` restricted to the load paths a
 * [[TableStats.planRead]] decision kept. Kept paths are FILES (manifest
 * entries) or whole DIRECTORIES (partitions whose version has no manifest
 * and must be read unpruned); a listed file survives iff it IS a kept path
 * or sits UNDER one. Matching is scheme-normalized (`Path.toUri.getPath`)
 * and resolved with one floor lookup in a sorted set — kept entries never
 * nest, so the floor entry is the only possible owner of a file.
 *
 * Everything else delegates: same roots, same partition schema and values,
 * same metadata — Catalyst's own partition pruning and the parquet
 * row-group machinery stack on top exactly as they do unpruned.
 * `sizeInBytes` sums only surviving files, so join-size estimation (and
 * broadcast eligibility) sees the real post-skip scan size.
 */
final class PrunedGraftFileIndex(underlying: FileIndex, keptLoadPaths: Seq[String])
    extends FileIndex {

  private val kept: java.util.TreeSet[String] = {
    val s = new java.util.TreeSet[String]()
    keptLoadPaths.foreach(p => s.add(normalize(new Path(p))))
    s
  }

  private def normalize(p: Path): String = p.toUri.getPath

  private def keep(p: Path): Boolean = {
    val s = normalize(p)
    val floor = kept.floor(s)
    floor != null && (floor == s || s.startsWith(floor + "/"))
  }

  override def rootPaths: Seq[Path] = underlying.rootPaths

  override def partitionSchema: StructType = underlying.partitionSchema

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filter(f => keep(f.getPath))))
      .filter(_.files.nonEmpty)

  override def inputFiles: Array[String] =
    underlying.inputFiles.filter(s => keep(new Path(s)))

  override def refresh(): Unit = underlying.refresh()

  override lazy val sizeInBytes: Long =
    listFiles(Nil, Nil).iterator.flatMap(_.files).map(_.getLen).sum

  override def metadataOpsTimeNs: Option[Long] = underlying.metadataOpsTimeNs
}

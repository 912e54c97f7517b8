package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality expectations over a DataFrame — the audit half
 * of the write-audit-publish pattern ([[VersionedTables]]'
 * `auditedInsertInto` runs these against a STAGED, uncommitted version so
 * readers never see data that fails its checks; they are equally usable as
 * a standalone report over any table).
 *
 * Scale shapes, per check class:
 *  - [[Expectations.NotNull]] / [[Expectations.InRange]] /
 *    [[Expectations.Satisfies]] — row-local predicates, fused into ONE
 *    aggregation pass over the frame (`sum(when(!pred, 1))` per check):
 *    one scan, no shuffle beyond the final 1-row agg, any number of
 *    checks.
 *  - [[Expectations.Unique]] — one map-side-combinable groupBy on the key
 *    columns counting groups with >1 row; one shuffle per distinct key
 *    set.
 *  - [[Expectations.RefIntegrity]] — a LEFT ANTI join against the
 *    dimension's key column; Spark broadcasts small dimensions and AQE
 *    handles the rest, the standard FK-validation shape.
 *
 * Violation counts are exact; use the returned counts to decide, and the
 * `violations` helper to fetch offender rows for triage (bounded by
 * `limit`, never a driver-side full collect).
 */
object Expectations {

  /** One declarative expectation. `name` keys the result row. */
  sealed trait Check { def name: String }

  /** Every listed column is non-null (one violation per offending ROW). */
  final case class NotNull(cols: Seq[String]) extends Check {
    val name = s"not_null(${cols.mkString(",")})"
  }

  /** The listed columns form a unique key (one violation per EXTRA row of
    * a duplicated key — a key appearing k times contributes k-1). */
  final case class Unique(cols: Seq[String]) extends Check {
    val name = s"unique(${cols.mkString(",")})"
  }

  /** `col` lies in [lo, hi] (nulls do NOT violate — compose with
    * [[NotNull]] when they should). */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range($col,$lo,$hi)"
  }

  /** Every non-null `col` value exists in `dimCol` of `dim` — referential
    * integrity into a dimension table. */
  final case class RefIntegrity(col: String, dim: DataFrame, dimCol: String) extends Check {
    val name = s"ref_integrity($col)"
  }

  /** Arbitrary row predicate that must hold on every row. A predicate
    * evaluating to NULL counts as a VIOLATION (three-valued logic must not
    * let `length(col) > 0` silently pass null rows — make nulls explicit
    * with `isNull`/`coalesce` in the predicate when they are acceptable). */
  final case class Satisfies(checkName: String, predicate: Column) extends Check {
    val name = s"satisfies($checkName)"
  }

  /** One audited check: its name and how many violations it found. */
  final case class CheckResult(check: String, violations: Long) {
    def ok: Boolean = violations == 0L
  }

  /** Raised by `auditedInsertInto` when a staged write fails its audit;
    * carries the full report (passing checks included). */
  final case class ExpectationsFailedError(results: Seq[CheckResult])
    extends RuntimeException(
      "expectations failed: " + results.filterNot(_.ok)
        .map(r => s"${r.check}=${r.violations}").mkString(", "))

  private def rowPredicate(df: DataFrame, c: Check): Option[(String, Column)] = c match {
    case NotNull(cols) =>
      Some(c.name -> cols.map(col(_).isNotNull).reduce(_ && _))
    case InRange(cl, lo, hi) =>
      Some(c.name -> (col(cl).isNull || (col(cl) >= lo && col(cl) <= hi)))
    case Satisfies(_, p) => Some(c.name -> coalesce(p, lit(false)))
    case _ => None
  }

  /** Run every check, returning one [[CheckResult]] per check in input
    * order. Row-local checks share a single aggregation pass. */
  def audit(df: DataFrame, checks: Seq[Check]): Seq[CheckResult] = {
    require(checks.nonEmpty, "audit needs at least one check")
    val rowChecks = checks.flatMap(c => rowPredicate(df, c))
    val rowCounts: Map[String, Long] =
      if (rowChecks.isEmpty) Map.empty
      else {
        val aggs = rowChecks.map { case (name, pred) =>
          sum(when(!pred, 1L).otherwise(0L)).as(name)
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        rowChecks.zipWithIndex.map { case ((name, _), i) =>
          name -> (if (row.isNullAt(i)) 0L else row.getLong(i)) // null = empty frame
        }.toMap
      }
    checks.map {
      case c if rowCounts.contains(c.name) => CheckResult(c.name, rowCounts(c.name))
      case c @ Unique(cols) =>
        val extras = df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1)
          .agg(coalesce(sum(col("__n") - 1), lit(0L))).head().getLong(0)
        CheckResult(c.name, extras)
      case c @ RefIntegrity(cl, dim, dimCol) =>
        val orphans = df.filter(col(cl).isNotNull)
          .join(dim.select(col(dimCol).as(cl)).distinct(), Seq(cl), "left_anti")
          .count()
        CheckResult(c.name, orphans)
      case c => throw new IllegalStateException(s"unhandled check ${c.name}")
    }
  }

  /** Offender rows for one check (empty for a passing one), bounded by
    * `limit` — the triage view, never a full collect. */
  def violations(df: DataFrame, check: Check, limit: Int = 20): DataFrame = check match {
    case Unique(cols) =>
      val dups = df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1).select(cols.map(col): _*)
      df.join(dups, cols, "left_semi").limit(limit)
    case RefIntegrity(cl, dim, dimCol) =>
      df.filter(col(cl).isNotNull)
        .join(dim.select(col(dimCol).as(cl)).distinct(), Seq(cl), "left_anti")
        .limit(limit)
    case c =>
      val Some((_, pred)) = rowPredicate(df, c)
      df.filter(!pred).limit(limit)
  }
}

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
 *  - [[Expectations.UniqueApprox]] — a HyperLogLog++ distinct sketch,
 *    fused into the SAME single pass as the row-local checks: no key
 *    shuffle, no extra scan — the cheap pre-check before (or instead of)
 *    exact Unique at 100 TB.
 *  - [[Expectations.Unique]] — `count(*) − count_distinct(key)`, fused
 *    into the same single pass (an Expand inside the shared aggregation,
 *    no separate groupBy scan).
 *  - [[Expectations.RefIntegrity]] — a LEFT join of the dimension's
 *    DISTINCT keys onto the input (Spark broadcasts small dimensions and
 *    AQE handles the rest), with the orphan count one more fused
 *    aggregate — no separate anti-join pass.
 *
 * Every check class therefore rides ONE aggregation pass: staged 100 TB
 * data is scanned a single time however many checks run, with no persist
 * anywhere — see [[Expectations.audit]].
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

  /** Approximate [[Unique]] — the cheap 100 TB pre-check arm. Violations =
    * `max(0, rows − floor(approxDistinct(key) · (1+3·rsd)))`, i.e. the
    * extra rows a HyperLogLog++ sketch CANNOT explain away as estimation
    * error. `rsd` is the sketch's relative standard DEVIATION (not a
    * bound — observed errors reach ~1.3·rsd on this repo's own fixtures),
    * so the slack is three deviations: ~99.7% of clean keys report 0 and
    * the count stays ≤ exact [[Unique]]'s. The sketch rides the shared
    * one-pass aggregation with the row-local checks — no shuffle on the
    * key, no second scan — where exact Unique pays a full groupBy shuffle.
    *
    * Null contract, at ANY arity: a key whose EVERY column is null is
    * invisible to this check (compose [[NotNull]] when such rows should
    * fail); a partially-null multi-column key participates as a distinct
    * value. Note exact [[Unique]] differs by design: its groupBy counts
    * all-null keys as an ordinary group, so duplicate all-null rows DO
    * violate there.
    *
    * Pinned as spec laws: a truly unique key reports 0; the reported count
    * never exceeds the exact check's; duplication well above `3·rsd` (say
    * a 2x-duplicated table at rsd=0.05) is always caught. Duplication
    * BELOW `3·rsd` can hide inside the slack — run exact [[Unique]] when
    * this check fails, or when exactness gates the publish. */
  final case class UniqueApprox(cols: Seq[String], rsd: Double = 0.05) extends Check {
    require(rsd > 0 && rsd < 1, s"rsd must be in (0,1), was $rsd")
    val name = s"unique_approx(${cols.mkString(",")})"
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

  /** What data a write-audit-publish audit runs against (see
    * `auditedInsertInto`). */
  sealed trait AuditScope
  object AuditScope {
    /** Only THIS delivery's rows (the staged slice). Cheapest — the audit
      * never touches committed data — but [[Unique]]/[[RefIntegrity]]
      * validate within the delivery only: a key already published by an
      * earlier delivery is not seen. */
    case object Delivery extends AuditScope
    /** The table as it WOULD read after publish: staged partitions
      * overlaid on the untouched committed ones. Table-wide
      * Unique/RefIntegrity (cross-delivery duplicates ARE caught), at the
      * cost of scanning the committed partitions too. */
    case object TableWide extends AuditScope
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

  private def rowPredicate(c: Check): Option[Column] = c match {
    case NotNull(cols) =>
      Some(cols.map(col(_).isNotNull).reduce(_ && _))
    case InRange(cl, lo, hi) =>
      Some(col(cl).isNull || (col(cl) >= lo && col(cl) <= hi))
    case Satisfies(_, p) => Some(coalesce(p, lit(false)))
    case _ => None
  }

  /** The violation count as ONE ungrouped aggregate expression, for every
    * check class computable from the input's own columns (row-local
    * predicates, the HLL sketch of [[UniqueApprox]], exact [[Unique]]).
    * [[RefIntegrity]] returns None here — its aggregate needs the joined
    * presence marker and is built inline by [[audit]]. */
  private def fusedViolations(c: Check): Option[Column] = c match {
    case UniqueApprox(cols, rsd) =>
      // the key is NULL iff EVERY component is null — for arity 1 that is
      // the column itself; for arity >1 a bare struct() would never be null
      // and all-null-key rows would be counted by BOTH count(key) and the
      // sketch, making the null contract inconsistent across arities. The
      // otherwise-less `when` yields a typed NULL struct for all-null keys;
      // PARTIALLY-null keys stay distinct participating values.
      val key =
        if (cols.size == 1) col(cols.head)
        else when(cols.map(col(_).isNotNull).reduce(_ || _), struct(cols.map(col): _*))
      // rows the sketch cannot explain: subtract the estimate inflated by
      // three standard deviations (rsd is a deviation, not a bound), so a
      // clean key reports 0 despite HLL noise. count(key), NOT count(*):
      // approx_count_distinct skips null keys, so the row count must skip
      // them too or an all-null key would report every row as a violation
      // and break the ≤-exact law. Keys whose every column is null are thus
      // invisible to the sketch arm AT ANY ARITY — compose NotNull when
      // they should fail.
      Some(greatest(
        lit(0L),
        count(key) - floor(approx_count_distinct(key, rsd) * (1.0 + 3.0 * rsd)).cast("long")))
    case Unique(cols) =>
      // one violation per EXTRA row of a duplicated key: Σ over groups of
      // (n−1) = count(*) − countDistinct(key). The struct key is never
      // null, so the all-null group counts as one ordinary distinct value —
      // exactly the former groupBy's semantics (duplicate all-null rows DO
      // violate). Fused here, the check trades its own groupBy+filter+sum
      // pass (a full shuffle on the key) for an Expand inside the one
      // shared aggregation job — one scan fewer per audited write.
      Some(count(lit(1)) - count_distinct(struct(cols.map(col): _*)))
    case other => rowPredicate(other).map(pred => sum(when(!pred, 1L).otherwise(0L)))
  }

  /** Run every check, returning one [[CheckResult]] per check in input
    * order. Results are keyed by POSITION, not name — two checks with the
    * same name (e.g. duplicate [[Satisfies]] checkNames) each report their
    * own count.
    *
    * EVERY check class now rides ONE aggregation pass — one scan of the
    * input, one Spark action, however many checks run (round 17; rounds
    * 15-16 fused the row-local / sketch / exact-Unique classes and still
    * paid one anti-join pass per [[RefIntegrity]]). Each RefIntegrity check
    * left-joins the dimension's DISTINCT keys (renamed to the fact column,
    * plus a presence marker) onto the input; its violation count is then
    * just one more fused aggregate — `sum(fact key non-null ∧ marker
    * null)`. Key distinctness pins row multiplicity (each fact row matches
    * at most one dimension row; a null dimension key equi-matches nothing),
    * so every other fused count is unchanged by the joins, and the counts
    * are identical to the former anti-join's. Spark broadcasts small
    * dimensions (the typical FK shape — the fact side is then never
    * shuffled at all) and AQE handles the rest.
    *
    * The one-pass shape also makes a multi-check audit SELF-CONSISTENT by
    * construction: all checks observe the same evaluation of the input,
    * even for nondeterministic plans (rand(), sampling) — the former
    * multi-pass shape could see different data per pass unless it
    * persisted. No persist is ever needed or taken; a caller-persisted
    * input is simply used as-is. */
  def audit(df: DataFrame, checks: Seq[Check]): Seq[CheckResult] = {
    require(checks.nonEmpty, "audit needs at least one check")
    val indexed = checks.zipWithIndex
    val refs = indexed.collect { case (r: RefIntegrity, i) => (r, i) }
    val joined = refs.foldLeft(df) { case (d, (RefIntegrity(cl, dim, dimCol), i)) =>
      d.join(
        dim.select(col(dimCol).as(cl)).distinct()
          .withColumn(s"__graft_ref_$i", lit(true)),
        Seq(cl), "left")
    }
    val aggExprs: Seq[(Int, Column)] = indexed.map {
      case (RefIntegrity(cl, _, _), i) =>
        i -> sum(when(col(cl).isNotNull && col(s"__graft_ref_$i").isNull, 1L)
          .otherwise(0L))
      case (c, i) =>
        i -> fusedViolations(c).getOrElse(
          throw new IllegalStateException(s"unhandled check ${c.name}"))
    }
    val aggs = aggExprs.map { case (i, c) => c.as(s"__check_$i") }
    val row = joined.agg(aggs.head, aggs.tail: _*).head()
    indexed.map { case (c, i) =>
      CheckResult(c.name, if (row.isNullAt(i)) 0L else row.getLong(i)) // null = empty frame
    }
  }

  /** Offender rows for one check (empty for a passing one), bounded by
    * `limit` — the triage view, never a full collect. */
  def violations(df: DataFrame, check: Check, limit: Int = 20): DataFrame = check match {
    case Unique(cols) =>
      val dups = df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1).select(cols.map(col): _*)
      df.join(dups, cols, "left_semi").limit(limit)
    // a sketch has no offender rows — triage with the exact key groupBy
    case UniqueApprox(cols, _) => violations(df, Unique(cols), limit)
    case RefIntegrity(cl, dim, dimCol) =>
      df.filter(col(cl).isNotNull)
        .join(dim.select(col(dimCol).as(cl)).distinct(), Seq(cl), "left_anti")
        .limit(limit)
    case c =>
      val Some(pred) = rowPredicate(c)
      df.filter(!pred).limit(limit)
  }
}

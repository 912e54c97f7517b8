package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension Type 2 builds: collapse a change stream into
 * effective-dated dimension rows — the warehouse twin of the engine's
 * event-analytics family (the reference has no dimension tooling at all;
 * this is the standard Kimball SCD2 shape, re-expressed as two window
 * passes that share one hash exchange).
 *
 * Input: one row per observation of a key's attributes at a time.
 * Output: one row per ATTRIBUTE CHANGE, carrying
 * `effective_from` (the change's timestamp), `effective_to` (the next
 * change's timestamp — half-open `[from, to)` intervals, NULL on the
 * open current row) and `is_current`.
 *
 * Scale shape: ONE shuffle, on the dimension key. Both window passes use the
 * same (key, ts) partitioning+ordering and the change filter preserves them,
 * so Catalyst plans a single Exchange+Sort feeding both Window operators —
 * no second shuffle, no driver-side state. Per-key state inside a window
 * task is O(1) (`lag`/`lead` only look one row away). Skewed keys behave
 * like any windowed aggregation (a key's history must fit one task — for a
 * dimension that is the definition of sane).
 */
object Scd2 {

  /**
   * Build the SCD2 dimension from `changes`.
   *
   * @param keyCols   dimension key
   * @param attrCols  tracked attributes: a row opens a new interval iff its
   *                  attribute tuple differs (null-safely) from the key's
   *                  previous observation
   * @param tsCol     observation timestamp (any orderable type)
   * @param tieBreak  extra ordering columns making same-timestamp
   *                  observations of one key deterministic — REQUIRED for a
   *                  stable result if such ties can occur
   */
  def buildScd2(
      changes: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      tsCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "need key and attribute columns")
    val ordering: Seq[Column] = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    val attrs = struct(attrCols.map(col): _*)
    // null-safe change detection: the first observation (prev IS NULL) and
    // any attribute drift both open an interval; <=> keeps NULL attributes
    // comparable (NULL -> NULL is NOT a change)
    val flagged = changes
      .withColumn("_scd_prev", lag(attrs, 1).over(w))
      .withColumn("_scd_change", not(col("_scd_prev") <=> attrs))
    // the filter keeps the (key-hash, ts-sorted) layout, so this second
    // window rides the SAME exchange+sort — verified in the plan
    flagged.filter(col("_scd_change"))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .withColumn("effective_from", col(tsCol))
      .select((keyCols ++ attrCols).map(col) ++
        Seq(col("effective_from"), col("effective_to"), col("is_current")): _*)
  }

  /** Point-in-time lookup against an SCD2 dimension built by [[buildScd2]]:
    * for each fact row, the dimension attributes in effect at the fact's
    * timestamp — the half-open interval join `from <= ts < to` (open current
    * rows match everything from their `from` on). Plans as a range join on
    * the equi-key; broadcast the dimension when it is small (it usually is). */
  def asOfLookup(
      facts: DataFrame,
      dim: DataFrame,
      keyCols: Seq[String],
      factTsCol: String): DataFrame = {
    // explicit aliases: the dimension is typically BUILT from the fact
    // stream, and Spark's self-join lineage check rejects facts(col)/dim(col)
    // disambiguation on shared-lineage frames
    val f = facts.alias("_scd_f")
    val d = dim.alias("_scd_d")
    val cond = keyCols.map(k => col(s"_scd_f.$k") === col(s"_scd_d.$k")).reduce(_ && _) &&
      col(s"_scd_f.$factTsCol") >= col("_scd_d.effective_from") &&
      (col("_scd_d.effective_to").isNull ||
        col(s"_scd_f.$factTsCol") < col("_scd_d.effective_to"))
    f.join(d, cond, "left")
      .select(facts.columns.map(c => col(s"_scd_f.$c")) ++
        dim.columns.filterNot(c => keyCols.contains(c) || c == "is_current")
          .map(c => col(s"_scd_d.$c")): _*) // is_current is noise on a time-scoped lookup
  }
}

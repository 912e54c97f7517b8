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

  // ---------------------------------------------------------------------
  // Incremental maintenance: the commit-driven twin of [[buildScd2]],
  // completing the batch + incremental pair the engine's event-analytics
  // families established (funnel / retention / sessions). State frame:
  // the key columns plus `history` ARRAY<STRUCT<from, attrs>> (the change
  // points, in order — the LAST one is the open current interval) and
  // `last_seen` (the key's newest processed observation — the watermark
  // that makes change detection exact across deliveries: the dimension
  // alone cannot distinguish "no observation since the last change" from
  // "unchanged observations since", and the two differ once a late row
  // lands between them). One delivery advances with ONE key-hash exchange
  // (groupBy + sorted collect_list, the family shape); the fold is the
  // `aggregate` higher-order function, so attribute types stay fully
  // generic — no UDF, no serialization boundary.
  //
  // Exact under per-key event-time-ordered delivery (the contract every
  // incremental/streaming sibling shares): advancing delivery-by-delivery
  // equals buildScd2 over the union. An out-of-order observation (ts
  // strictly below the key's watermark) is SKIPPED — it can never corrupt
  // the interval chain, only omit a historical interval the batch rebuild
  // would recover. Null-ts observations are dropped (document'd contract;
  // buildScd2 requires orderable non-null timestamps for the same reason).
  // ---------------------------------------------------------------------

  /** Advance an SCD2 state frame by one delivery of observations.
    * `state` comes from [[emptyScd2State]], a previous advance, or
    * [[compactScd2State]]'s kept tail; parameters mirror [[buildScd2]]. */
  def advanceScd2State(
      state: DataFrame,
      delivery: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      tsCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "need key and attribute columns")
    // sort struct: ts, then tie-breaks, then the attribute tuple itself so
    // the fold is deterministic even when no tie-break is given
    val obsStruct = struct(
      (col(tsCol).as("__ts") +:
        tieBreak.zipWithIndex.map { case (c, i) => col(c).as(s"__tb$i") }) :+
        struct(attrCols.map(col): _*).as("__a"): _*)
    val deliveryAgg = delivery
      .filter(col(tsCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(obsStruct)).as("__obs"))

    // typed empties derived from the delivery's own schema, so key/attr/ts
    // types are whatever the caller's frame carries
    val probe = delivery.select(
      struct(attrCols.map(col): _*).as("attrs"), col(tsCol).as("ts"))
    val attrsType = probe.schema("attrs").dataType
    val tsType = probe.schema("ts").dataType
    val histType = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("from", tsType),
        org.apache.spark.sql.types.StructField("attrs", attrsType))))

    val acc0 = struct(
      coalesce(col("history"), array().cast(histType)).as("hist"),
      col("last_seen").cast(tsType).as("last_seen"))
    // NULL-SAFE key join: buildScd2's window partitioning puts all null-key
    // observations in ONE group, so the incremental twin must too — a plain
    // USING join never matches null keys, which would append an independent
    // null-key state row every delivery and break advance ≡ build.
    val dKeys = keyCols.map(k => s"__dk_$k")
    val deliveryKeyed = keyCols.zip(dKeys).foldLeft(deliveryAgg) {
      case (f, (k, n)) => f.withColumnRenamed(k, n) }
    val folded = state.join(deliveryKeyed,
        keyCols.zip(dKeys).map { case (k, n) => col(k) <=> col(n) }.reduce(_ && _),
        "full_outer")
      .select(keyCols.zip(dKeys).map { case (k, n) => coalesce(col(k), col(n)).as(k) } :+
        aggregate(
          coalesce(col("__obs"), array().cast(org.apache.spark.sql.types.ArrayType(
            deliveryAgg.schema("__obs").dataType
              .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType))),
          acc0,
          (acc, o) => {
            val hist = acc.getField("hist")
            val cur = get(hist, size(hist) - 1).getField("attrs")
            val changed = size(hist) === 0 || !(cur <=> o.getField("__a"))
            when(acc.getField("last_seen").isNotNull &&
                 o.getField("__ts") < acc.getField("last_seen"), acc) // late: skip
              .otherwise(struct(
                when(changed, concat(hist, array(struct(
                    o.getField("__ts").as("from"), o.getField("__a").as("attrs")))))
                  .otherwise(hist).as("hist"),
                o.getField("__ts").as("last_seen")))
          }).as("__st"): _*)
    folded.select(keyCols.map(col) ++ Seq(
      col("__st.hist").as("history"), col("__st.last_seen").as("last_seen")): _*)
  }

  /** The zero-delivery state for [[advanceScd2State]], typed from a
    * template frame carrying the key/attribute/timestamp columns. */
  def emptyScd2State(
      template: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      tsCol: String): DataFrame = {
    val shaped = template.select(keyCols.map(col) ++ Seq(
      array(struct(col(tsCol).as("from"), struct(attrCols.map(col): _*).as("attrs")))
        .as("history"),
      col(tsCol).as("last_seen")): _*)
    shaped.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), shaped.schema)
  }

  /** Rebuild the full dimension ([[buildScd2]]'s output shape) from an
    * incremental state frame: each change point becomes a half-open row,
    * `effective_to` = the NEXT change point's `from` (null on the open
    * last row). */
  def scd2FromState(state: DataFrame, keyCols: Seq[String], attrCols: Seq[String]): DataFrame =
    state
      .select(keyCols.map(col) :+ explode(transform(col("history"), (x, i) =>
        struct(x.getField("attrs").as("attrs"), x.getField("from").as("effective_from"),
          get(col("history"), i + 1).getField("from").as("effective_to")))).as("__r"): _*)
      .select(keyCols.map(col) ++ attrCols.map(a => col(s"__r.attrs.$a").as(a)) ++ Seq(
        col("__r.effective_from").as("effective_from"),
        col("__r.effective_to").as("effective_to"),
        col("__r.effective_to").isNull.as("is_current")): _*)

  /** Drain the CLOSED intervals out of a state frame: (closed dimension
    * rows in [[scd2FromState]]'s shape, a state keeping only each key's
    * open change point + watermark). Ordered delivery can only append
    * change points — closed intervals are immutable — so draining between
    * commits never changes the final dimension and the maintained state
    * stays O(1) per key over unbounded history. */
  def compactScd2State(
      state: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String]): (DataFrame, DataFrame) = {
    val closed = state
      .select(keyCols.map(col) :+ explode(transform(
        slice(col("history"), lit(1), greatest(size(col("history")) - 1, lit(0))), (x, i) =>
          struct(x.getField("attrs").as("attrs"), x.getField("from").as("effective_from"),
            get(col("history"), i + 1).getField("from").as("effective_to")))).as("__r"): _*)
      .select(keyCols.map(col) ++ attrCols.map(a => col(s"__r.attrs.$a").as(a)) ++ Seq(
        col("__r.effective_from").as("effective_from"),
        col("__r.effective_to").as("effective_to"),
        lit(false).as("is_current")): _*)
    val tail = state.select(keyCols.map(col) ++ Seq(
      slice(col("history"), -1, 1).as("history"), col("last_seen")): _*)
    (closed, tail)
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
    // the lookup's output carries every fact column plus the dimension's
    // attribute + interval columns; a fact column that collides (e.g. a
    // fact named effective_from) would silently produce duplicate output
    // names — refuse loudly, the caller renames one side
    val dimOut = dim.columns.filterNot(c => keyCols.contains(c) || c == "is_current")
    // case-INSENSITIVE like Spark's resolver: a fact column differing only
    // in case would still make downstream references ambiguous
    val factLower = facts.columns.map(_.toLowerCase).toSet
    val clash = dimOut.filter(c => factLower.contains(c.toLowerCase))
    require(clash.isEmpty,
      s"asOfLookup output would carry duplicate column(s) ${clash.mkString(", ")}: " +
        "the dimension contributes its attribute and effective_from/effective_to " +
        "columns — rename the colliding fact column(s)")
    // explicit aliases: the dimension is typically BUILT from the fact
    // stream, and Spark's self-join lineage check rejects facts(col)/dim(col)
    // disambiguation on shared-lineage frames. Names are backtick-quoted
    // (with embedded backticks doubled) so a column containing a dot still
    // resolves as one name part.
    def fq(c: String): Column = col(s"_scd_f.`${c.replace("`", "``")}`")
    def dq(c: String): Column = col(s"_scd_d.`${c.replace("`", "``")}`")
    val f = facts.alias("_scd_f")
    val d = dim.alias("_scd_d")
    val cond = keyCols.map(k => fq(k) === dq(k)).reduce(_ && _) &&
      fq(factTsCol) >= dq("effective_from") &&
      (dq("effective_to").isNull || fq(factTsCol) < dq("effective_to"))
    f.join(d, cond, "left")
      .select(facts.columns.map(fq) ++
        dimOut.map(dq): _*) // is_current is noise on a time-scoped lookup
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/**
 * One-pass column profiling (ANALYZE-style data quality summary): for every
 * requested column, row count, null count, exact distinct count, and min/max
 * (numeric columns as double, string columns as string — each in its own
 * typed output column, so the result has one stable schema for any input).
 *
 * Shape: ONE aggregation over the data (all per-column measures computed
 * together — Spark plans the multi-distinct via a single expand, so the input
 * is scanned once), then a constant-width `stack` pivots the single result
 * row into one row per column. Scan-once matters at 100 TB; the stack is
 * driver-trivial.
 *
 * For quick interactive profiling of very large tables, swap the exact
 * distinct for `approx_count_distinct` via `exact = false` (HLL: one pass, no
 * expand, ~2% error).
 */
object Profile {

  def profile(df: DataFrame, columns: Seq[String] = Nil, exact: Boolean = true): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.schema.fieldNames.toSeq
    require(cols.nonEmpty, "profile of zero columns")

    // col(name) PARSES the name (dots, backticks) — quote so any legal Spark
    // column name (spaces, quotes, backticks) resolves literally
    def ref(name: String): Column = col("`" + name.replace("`", "``") + "`")

    def measures(c: String): Seq[Column] = {
      val dt = df.schema(c).dataType
      val (minN, maxN) = dt match {
        case _: NumericType => (min(ref(c)).cast("double"), max(ref(c)).cast("double"))
        case _              => (lit(null).cast("double"), lit(null).cast("double"))
      }
      val (minS, maxS) = dt match {
        case StringType => (min(ref(c)), max(ref(c)))
        case _          => (lit(null).cast("string"), lit(null).cast("string"))
      }
      val distinct =
        if (exact) countDistinct(ref(c)) else approx_count_distinct(ref(c))
      Seq(
        count(ref(c)).as(s"${c}__notnull"),
        distinct.as(s"${c}__distinct"),
        minN.as(s"${c}__min_num"), maxN.as(s"${c}__max_num"),
        minS.as(s"${c}__min_str"), maxS.as(s"${c}__max_str"))
    }

    val one = df.agg(count(lit(1)).as("__rows"), cols.flatMap(measures): _*)

    // pivot the single row to long format: one output row per profiled column.
    // Column names are user input to this SQL fragment — escape string-literal
    // quotes and identifier backticks so any legal Spark column name works.
    def lit_(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    def id(s: String) = "`" + s.replace("`", "``") + "`"
    val stackArgs = cols.map { c =>
      s"${lit_(c)}, ${id(s"${c}__notnull")}, ${id(s"${c}__distinct")}, " +
        s"${id(s"${c}__min_num")}, ${id(s"${c}__max_num")}, " +
        s"${id(s"${c}__min_str")}, ${id(s"${c}__max_str")}"
    }.mkString(", ")
    one.selectExpr("__rows",
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, __notnull, n_distinct, min_num, max_num, min_str, max_str)")
      .select(col("column_name"), col("__rows").as("n_rows"),
        (col("__rows") - col("__notnull")).as("n_nulls"),
        col("n_distinct"), col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }
}

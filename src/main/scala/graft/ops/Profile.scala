package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style column profiling — the dataset-card / table-stats pass a
  * pipeline runs after every materialization: per column, null count, exact
  * distinct count, and min/max (stringified on the column's native type, so
  * numeric min/max stay numeric before the cast).
  *
  * One pass over the table: all per-column aggregates live in a single
  * `agg(...)` (the exact multi-column count-distincts plan as one Expand —
  * rows × columns — feeding one aggregation), and the single stats row is
  * unpivoted to long format with `stack`. At 100 TB swap the exact
  * count_distinct for approx_count_distinct (HLL++) — same one-pass shape,
  * bounded state; the exact form is kept here because the DuckDB gate
  * hash-compares values.
  *
  * Collation contract for string min/max: Spark compares strings as raw
  * UTF-8 bytes (UTF8String binary ordering); DuckDB's default VARCHAR
  * collation is also binary byte-wise, so the two agree on any UTF-8 input
  * — but ONLY while DuckDB runs without an ICU/locale collation. If the
  * oracle side ever sets a non-binary collation (e.g. `PRAGMA
  * default_collation='nocase'` or an ICU locale), string min/max on
  * non-ASCII text can legitimately diverge; pin the oracle to binary
  * collation or restrict min/max profiling to non-string columns then.
  */
object Profile {

  def tableStats(df: DataFrame): DataFrame = {
    val aggs = df.columns.toSeq.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = df.columns
      .map(c => s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    row.selectExpr(
        s"stack(${df.columns.length}, $stackArgs) AS (column_name, n_nulls, n_distinct, min_value, max_value)")
      .orderBy("column_name")
  }
}

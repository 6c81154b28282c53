package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the dbt-test / Deequ-shaped surface
  * an ETL engine needs before publishing a table. No reference analog
  * (the reference's failure handling is per-step try/rescue,
  * `lib/forklift/plan.rb:70-90`; content-level validation is left to
  * user SQL), so this is a scale-path addition in the §2.9 spirit.
  *
  * Scale design: every row-level rule compiles to a conditional
  * aggregate (`sum(when(!pred, 1))`), so ALL rules evaluate in ONE scan
  * with map-side partial aggregation — adding a rule adds a column to
  * the aggregate, never a pass over the data. Uniqueness rules ride in
  * the same aggregate as `count - count_distinct` (exact; swap in
  * `approx_count_distinct` for 100 TB billion-key checks where a ±2%
  * duplicate count is acceptable — same single-pass shape).
  *
  * Output: one row per rule — (rule, violations, total, pass) — the
  * report a Plan step can assert on / a Reporter can mail. Oracled in
  * SparkEntry (`q_validate`) against hand-written DuckDB aggregates.
  */
object Validate {

  sealed trait Rule { def name: String }
  /** Rows where `pred` is FALSE (or null) are violations. */
  final case class Predicate(name: String, pred: Column) extends Rule
  /** Violations = count(col) - countDistinct(col): the number of rows
    * carrying a non-unique value beyond its first occurrence. */
  final case class Unique(name: String, column: String) extends Rule
  /** Violations = rows where `column` is null. */
  final case class NotNull(name: String, column: String) extends Rule

  /** Evaluate all rules in one aggregation pass. `pass` is true iff the
    * rule saw zero violations. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size, "rule names must be unique")
    require(rules.forall(_.name.matches("[A-Za-z][A-Za-z0-9_]*")),
      "rule names must match [A-Za-z][A-Za-z0-9_]* (they become aggregate " +
        "aliases; a leading underscore would collide with internal columns)")
    val aggCols = rules.map {
      case Predicate(n, p) =>
        sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)).as(n)
      case NotNull(n, c) =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(n)
      case Unique(n, c) =>
        (count(col(c)) - countDistinct(col(c))).as(n)
    } :+ count(lit(1)).as("_total")
    val row = df.agg(aggCols.head, aggCols.tail: _*)
    // pivot the single wide row to (rule, violations, total, pass) —
    // a stack over R+1 literals, driver-free
    val stacked = rules.map(r => s"'${r.name}', `${r.name}`").mkString(", ")
    row.select(expr(s"stack(${rules.size}, $stacked) AS (rule, violations)"),
        col("_total").as("total"))
      .select(col("rule"), coalesce(col("violations"), lit(0L)).as("violations"),
        col("total"), (coalesce(col("violations"), lit(0L)) === 0L).as("pass"))
  }

  /** Gate form: throw if any rule fails — the publish-blocking step. */
  def assertValid(df: DataFrame, rules: Seq[Rule]): Unit = {
    val failed = check(df, rules).filter(!col("pass"))
      .select(col("rule"), col("violations")).collect()
    if (failed.nonEmpty) {
      val detail = failed.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", ")
      throw new IllegalStateException(s"validation failed: $detail")
    }
  }
}

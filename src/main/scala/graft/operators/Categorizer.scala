package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ordered LIKE/CASE categorization.
  *
  * Reference semantics: services/processing/src/transformations/
  * device_categorizer.py:4-13 — a priority-ordered chain of LIKE
  * predicates collapsed into one value (first match wins; a string
  * matching several patterns takes the earliest rule). Kept as a pure
  * Column expression (when/like), so Catalyst folds it into whole-stage
  * codegen — no UDF.
  *
  * The driver testdata has no user_agent column, so the default rule set
  * categorizes `event_type` into funnel stages; the priority-order
  * semantics (overlapping patterns resolved by rule order) are identical.
  */
object Categorizer {
  /** (LIKE pattern, label), priority order. */
  val defaultRules: Seq[(String, String)] = Seq(
    "%view%"     -> "Browse",
    "%click%"    -> "Interact",
    "%signup%"   -> "Acquire",
    "%purchase%" -> "Convert",
  )
  val defaultLabel = "Other"

  /** The reference's own user-agent rules (device_categorizer.py:5-11):
    * Mobile before Tablet before Bot, Desktop as default — a UA matching
    * both "Mobile" and "Tablet" is Mobile. */
  val deviceRules: Seq[(String, String)] = Seq(
    "%Mobile%" -> "Mobile",
    "%Tablet%" -> "Tablet",
    "%Bot%"    -> "Bot",
  )
  val deviceDefault = "Desktop"

  def categorizeDevice(userAgent: Column): Column =
    categorize(userAgent, deviceRules, deviceDefault)

  def categorize(c: Column,
                 rules: Seq[(String, String)] = defaultRules,
                 default: String = defaultLabel): Column =
    rules.foldRight(lit(default)) { case ((pat, label), acc) =>
      when(c.like(pat), lit(label)).otherwise(acc)
    }

  /** The same chain as ANSI SQL (for DuckDB oracles). */
  def categorizeSql(col: String,
                    rules: Seq[(String, String)] = defaultRules,
                    default: String = defaultLabel): String =
    rules.map { case (p, l) => s"WHEN $col LIKE '$p' THEN '$l'" }
      .mkString("CASE ", " ", s" ELSE '$default' END")
}

package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Canon.{sig6, sig6Sql}
import graft.Tables

/** The declared relational query surface (SURVEY.md §2.4, Q1–Q14).
  *
  * Every query is a plain declarative DataFrame plan — scans, filters,
  * projections, joins, aggregates, windows, set ops — so Catalyst supplies
  * predicate pushdown, column pruning, join selection and whole-stage codegen
  * for free. Each entry has a matching ANSI-SQL oracle (run by the driver in
  * DuckDB over the same parquet files); column aliases are kept identical on
  * both sides because the driver's compare hashes columns by name.
  *
  * Scale notes (100 TB posture): all joins here either broadcast a dimension
  * table (nation/region/customer at their true cardinalities) or shuffle on
  * the natural join key; aggregates are partial (map-side) by construction;
  * no query collects to the driver.
  */
object RelationalQueries {

  /** Aggregated registry — the driver contract surface. The entries live in
    * [[RelationalCore]] / [[RelationalExt]] (file-size split);
    * shared fixtures in [[RelationalInputs]].
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalCore.queries ++ RelationalExt.queries ++
      RelationalExt2.queries ++ RelationalExt3.queries

  val oracles: Map[String, String] =
    RelationalCore.oracles ++ RelationalExt.oracles ++
      RelationalExt2.oracles ++ RelationalExt3.oracles
}

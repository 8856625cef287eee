package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Canon.sig6Sql
import graft.Tables

/** Shared inputs of the split relational registry: the table loader and
  * the set-op fixtures both halves draw on (kept out of the aggregator so
  * object initialization stays acyclic).
  */
object RelationalInputs {

  private[relational] def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Shared inputs for the set-operation queries: two overlapping custkey sets. */
  private[relational] def setOpInputs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val a = t(s, dir, "customer").filter($"c_acctbal" > 1000.0)
      .select($"c_custkey".as("k"))
    val b = t(s, dir, "orders").filter($"o_orderkey" % 3 === 0)
      .select($"o_custkey".as("k"))
    (a, b)
  }

  /** Inputs for the bag-semantics set ops: both sides keep duplicate keys
    * (orders repeats custkeys), so EXCEPT/INTERSECT ALL exercise multiplicity
    * subtraction rather than degenerate to the DISTINCT forms.
    */
  private[relational] def bagOpInputs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val a = t(s, dir, "orders").filter($"o_totalprice" > 100000.0)
      .select($"o_custkey".as("k"))
    val b = t(s, dir, "orders").filter($"o_orderkey" % 2 === 0)
      .select($"o_custkey".as("k"))
    (a, b)
  }

  /** q49's text — one string, two engines: Spark parses and executes it via
    * spark.sql(); DuckDB runs it verbatim as the oracle.
    */
  private[relational] val sqlTextQuery: String =
    s"""WITH big AS (
       |  SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 50000.0)
       |SELECT n_name, count(*) AS cnt, ${sig6Sql("sum(o_totalprice)")} AS rev
       |FROM big
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name
       |HAVING count(*) > 10
       |ORDER BY rev DESC, n_name
       |LIMIT 15""".stripMargin

  private[relational] val setA = "SELECT c_custkey AS k FROM customer WHERE c_acctbal > 1000.0"
  private[relational] val setB = "SELECT o_custkey AS k FROM orders WHERE o_orderkey % 3 = 0"
  private[relational] val bagA = "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000.0"
  private[relational] val bagB = "SELECT o_custkey AS k FROM orders WHERE o_orderkey % 2 = 0"

}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ONE CDC merge primitive behind q61 (batch MERGE/UPSERT) and s10
  * (the same merge driven per micro-batch by a foreachBatch sink) — shared
  * so the two registry queries cannot silently diverge from the
  * "s10 IS q61 per batch" claim the docs make.
  *
  * Change rows are (key, op, new_name, delta): op "U" adds `delta` to the
  * current balance (deltas, not absolutes, so batches COMPOSE and their
  * arrival order cannot matter), "D" drops the row, "I" appends a fresh
  * row whose key the caller derives past the snapshot max.
  *
  * [[apply]] is the scale shape: matched ops via a broadcast LEFT join
  * (NOT a full-outer join — Spark cannot broadcast either side of
  * full-outer, so that formulation would shuffle the entire snapshot),
  * inserts via UNION. If a deployment's change batch ever outgrew the
  * broadcast limit the split stays valid under a shuffled left join; only
  * the broadcast() hint is the small-batch choice. PlanAuditSpec pins the
  * exchange-free snapshot side on q61.
  */
object CdcMerge {

  private val nullName: Column = lit(null).cast("string")

  /** Balance-increment rows for every key in `keys`. */
  def updates(keys: DataFrame, delta: Double): DataFrame =
    keys.select(col("key"), lit("U").as("op"), nullName.as("new_name"),
      lit(delta).as("delta"))

  /** Delete rows for every key in `keys`. */
  def deletes(keys: DataFrame): DataFrame =
    keys.select(col("key"), lit("D").as("op"), nullName.as("new_name"),
      lit(null).cast("double").as("delta"))

  /** Insert rows: each key in `keys` shifted by `off` (callers pass the
    * snapshot max + 1, data-derived — a fixed offset would collide with
    * real keys at a large-enough SF and silently turn inserts into
    * updates), named New#<key>, starting balance 0.
    */
  def inserts(keys: DataFrame, off: Long): DataFrame =
    keys.select((col("key") + off).as("key"), lit("I").as("op"),
      concat(lit("New#"), (col("key") + off).cast("string")).as("new_name"),
      lit(0.0).as("delta"))

  /** Apply one change batch to a (key, c_name, c_acctbal) state.
    *
    * A batch may carry SEVERAL matched changes for one key (a left join on
    * a duplicated key would silently duplicate snapshot rows): the batch
    * is first collapsed per key with deterministic merge semantics — any
    * `D` wins, otherwise the `U` deltas SUM (deltas compose, so the
    * collapse order cannot matter). The collapse is an aggregation on the
    * already-small broadcast side; the snapshot side stays exchange-free.
    */
  def apply(state: DataFrame, changes: DataFrame): DataFrame = {
    val matched = changes.filter(col("op") =!= "I")
      .groupBy(col("key"))
      .agg(max(col("op") === "D").as("del"),
        sum(when(col("op") === "U", col("delta")).otherwise(lit(0.0)))
          .as("delta"))
    state.join(broadcast(matched), Seq("key"), "left")
      .filter(col("del").isNull || !col("del"))
      .select(col("key"), col("c_name"),
        (col("c_acctbal") + coalesce(col("delta"), lit(0.0))).as("c_acctbal"))
      .unionByName(changes.filter(col("op") === "I")
        .select(col("key"), col("new_name").as("c_name"),
          col("delta").as("c_acctbal")))
  }
}

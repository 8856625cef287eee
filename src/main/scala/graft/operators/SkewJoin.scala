package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A hash-partitioned join sends every row of a hot key to one task; at
  * 100 TB one pathological key (the reference's own soc-LiveJournal1 degree
  * histogram shows exactly this skew, BASELINE.md) serializes the stage.
  * Salting splits each hot key into `salts` sub-keys: the large side gets a
  * deterministic salt from row content, the small side is replicated once
  * per salt value. AQE's skew-join handles the sort-merge case at runtime;
  * this operator is for the cases AQE can't see (e.g. aggregation-feeding
  * joins, or a build side already skew-partitioned upstream).
  *
  * Semantics: identical to `large.join(small, keys, "inner")` — covered by
  * the equivalence spec.
  */
object SkewJoin {

  /** @param saltSource columns of `large` giving a deterministic per-row
    *                   salt (hashing them spreads the hot key's rows)
    */
  def saltedInner(large: DataFrame, small: DataFrame, key: String,
                  salts: Int, saltSource: Seq[Column]): DataFrame = {
    val saltedLarge = large.withColumn("_salt",
      pmod(hash(saltSource: _*), lit(salts)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "_salt"), "inner")
      .drop("_salt")
  }
}

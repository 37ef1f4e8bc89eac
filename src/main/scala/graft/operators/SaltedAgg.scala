package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation by salting (builder brief: "skewed keys → salting
  * or AQE skew-join"). A groupBy on a low-cardinality/skewed key sends each
  * hot key's entire volume to one reducer; salting splits every key into
  * `salts` deterministic sub-keys, aggregates the sub-keys in parallel,
  * then combines the (tiny) per-salt partials. Only works for algebraic
  * aggregates (sum/count/min/max) — the same decomposability Spark's own
  * partial aggregation exploits, pushed one level further.
  */
object SaltedAgg {

  /** Two-stage sum/count per key. Salt is derived from `row` (any
    * high-cardinality column) so the split is deterministic. */
  def sumCountByKey(df: DataFrame, key: Column, row: Column, value: Column,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.select(key.as("__key"), (pmod(row, lit(salts))).as("__salt"),
        value.as("__v"))
      .groupBy(col("__key"), col("__salt"))
      .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
      .groupBy(col("__key"))
      .agg(sum(col("__s")).as("sum_value"), sum(col("__n")).as("n_rows"))
      .withColumnRenamed("__key", "key")
  }
}

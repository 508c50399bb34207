package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration for Spark's Bloom-filter expressions, which ship
  * in Catalyst (they power runtime row-level filtering) but are NOT
  * SQL-registered in OSS builds:
  *
  *  - `bloom_filter_agg(key, estimatedItems, numBits)` → binary sketch
  *  - `might_contain(sketch, key)` → boolean probe (no false negatives)
  *
  * Together they are the semi-join pruning sketch: build a filter over the
  * small side's keys, broadcast the few-hundred-KB binary, and drop
  * non-matching fact rows AT THE SCAN — the pattern that turns a 100 TB
  * fact⋈dim semi-join into a map-only pre-filter plus a much smaller real
  * join for the survivors.
  */
object BloomFilters {

  /** Register both functions in the session registry. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_filter_agg",
      { exprs =>
        require(exprs.length == 3,
          "bloom_filter_agg(key, estimatedItems, numBits) takes 3 args")
        new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain",
      { exprs =>
        require(exprs.length == 2,
          "might_contain(sketch, key) takes 2 args")
        BloomFilterMightContain(exprs.head, exprs(1))
      },
      "built-in")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (builder brief: "skewed keys → salting or AQE
  * skew-join"). AQE handles skewed *joins* at runtime; a skewed *hot
  * aggregation key* still funnels every row of that key through one reduce
  * task. Salting splits each key into `salts` sub-keys for a partial
  * aggregate, then merges — turning one hot partition into `salts` even
  * ones. Valid for associative+commutative aggregates (sum/count/min/max),
  * which is also why the result is bit-identical to the direct group-by.
  */
object Skew {

  /** Two-phase salted sum/count:
    * phase 1 groups by (keys, salt) — the shuffle spreads a hot key over
    * `salts` reducers; phase 2 merges the partials per key. The salt is
    * derived deterministically from the value column (any per-row variation
    * works; determinism keeps replicated runs hash-equal). */
  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 16): DataFrame = {
    require(salts >= 1)
    val keyCols: Seq[Column] = keys.map(col)
    df.withColumn("_salt", pmod(hash(col(valueCol)), lit(salts)))
      .groupBy((keyCols :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum("_psum").as(s"sum_$valueCol"), sum("_pcnt").as("n"))
  }
}

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

  /** Salted equi-join for a skewed FACT side joining a small-but-not-
    * broadcastable DIM side (the shape AQE's skew-join can't always save:
    * one fact key holding 10% of 100 TB lands on one reducer).
    *
    * Facts get a deterministic per-row salt in [0, salts); the dim side is
    * replicated `salts` times (one copy per salt value) so every
    * (key, salt) pair still finds its dim row. The shuffle key becomes
    * (key, salt) — a hot key spreads over `salts` reducers at the cost of
    * `salts`× the DIM shuffle volume (cheap when dims ≪ facts, the only
    * regime where this rewrite makes sense). Row set is identical to the
    * plain inner join.
    *
    * The salt derives from a hash of the whole fact row (all columns), not
    * an RNG — replicated runs stay bit-identical and the determinism gate
    * holds. */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    require(salts >= 1)
    val factCols = facts.columns.toIndexedSeq.map(col)
    val salted = facts.withColumn("_salt",
      pmod(hash(factCols: _*), lit(salts)))
    val replicated = dims
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}

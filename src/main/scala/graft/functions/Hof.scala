package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, element_at, transform}

/** let-binding for Column expression trees (r14, guide §4 "per-task
  * expression work").
  *
  * Catalyst expressions are trees, not DAGs: a Column subexpression
  * referenced k times is INLINED k times and re-evaluated at every
  * reference — inside higher-order-function lambdas that turns an
  * intended O(m) intermediate array into O(m²)–O(m⁴) work (each
  * `element_at(tmp, k)` rebuilds the whole `tmp`). `let` binds the
  * intermediate as the lambda variable of a one-element `transform`, so
  * it is evaluated exactly once and every reference is a bound-variable
  * read:
  *
  *   let(e) { x => body(x) }  ==  transform(array(e), x => body(x))[1]
  *
  * Value-identical to inlining by construction (same expression, same
  * inputs, evaluated once); works for any element type including arrays
  * and structs.
  */
object Hof {
  def let(e: Column)(body: Column => Column): Column =
    element_at(transform(array(e), body), 1)
}

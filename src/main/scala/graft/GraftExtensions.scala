package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.SparkException
import graft.functions.{Dist2Pico, DotProduct, JaroWinkler, MinHash8, SimHash64}

/** Official Spark extension entry point — enable with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`). Installs:
  *
  *  1. the native `dot_product` and `simhash32` functions into the
  *     session's registry (SQL + `call_function` both resolve them; no
  *     imperative register call needed);
  *  2. an analyzer check rule enforcing the reference's determinism
  *     contract (pkg/executor/language/executor.go:47-62) session-wide:
  *     when `spark.graft.rejectNondeterministic=true`, any analyzed plan
  *     containing nondeterministic expressions (rand, uuid,
  *     current_timestamp, …) fails analysis — the Catalyst-rule form of
  *     the per-job [[graft.jobs.DeterminismGate]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "dot_product(a, b) takes two arrays")
        DotProduct(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash32"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "simhash32(token_hashes) takes one array")
        SimHash64(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "jaro_winkler(a, b) takes two strings")
        JaroWinkler(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("dist2_pico"),
      new ExpressionInfo(classOf[Dist2Pico].getName, "dist2_pico"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "dist2_pico(a, b) takes two arrays")
        Dist2Pico(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash8"),
      new ExpressionInfo(classOf[MinHash8].getName, "minhash8"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "minhash8(shingle_codes) takes one array")
        MinHash8(exprs.head)
      }))
    ext.injectCheckRule { session => plan: LogicalPlan =>
      if (session.conf.get("spark.graft.rejectNondeterministic", "false")
            .toBoolean) {
        val bad = plan.collect { case node =>
          node.expressions.flatMap(_.collect {
            case e if !e.deterministic && e.children.forall(_.deterministic) =>
              e.prettyName
          })
        }.flatten.distinct
        if (bad.nonEmpty)
          throw new SparkException(
            s"nondeterministic expressions rejected by graft determinism " +
              s"gate: ${bad.mkString(", ")}")
      }
    }
  }
}

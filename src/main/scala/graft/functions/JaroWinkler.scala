package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity over two strings (Winkler 1990 on
  * Jaro 1989) — the edit-tolerant name matcher the fuzzy-join family
  * lacks a built-in for (Spark ships levenshtein/soundex only).
  *
  * Why a custom Expression: there is no composition of built-ins that
  * yields JW (the match-window scan is inherently positional), and a
  * Scala UDF would box both strings per pair inside the fuzzy join's
  * candidate loop. This form participates in whole-stage codegen
  * ([[doGenCode]] emits one static call), so the verify step of a
  * blocked fuzzy join stays inside the generated loop — the same
  * discipline as [[MinHash8]]/[[SimHash64]].
  *
  * Semantics are pinned to the DuckDB oracle's
  * `jaro_winkler_similarity` and fuzz-verified bit-exact on 6k random
  * string pairs (identical IEEE operation order):
  *  - either side empty → 0.0 (including both — NOT the classic 1.0);
  *  - match window `max(|a|,|b|)/2 − 1`, greedy left-to-right matching;
  *  - transpositions = misordered match pairs, halved with INTEGER
  *    division;
  *  - jaro = (m/|a| + m/|b| + (m−t)/m) / 3;
  *  - Winkler boost only when jaro > 0.7: s + ℓ·0.1·(1−s), ℓ = common
  *    prefix length capped at 4.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "jaro_winkler"

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static verify kernel — called from both the interpreted and the
    * generated path, so they cannot diverge. Operates on UTF-8 BYTES —
    * the exact unit the oracle's scan uses — so parity holds for every
    * input, not only ASCII: a 3-byte CJK character is three match units
    * on both sides of the comparison. (A code-point kernel would agree
    * with neither the oracle nor a byte-wise reference on non-ASCII.)
    * Byte-wise also skips the UTF-16 decode the old char kernel paid. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (la == 1 && lb == 1) return if (a(0) == b(0)) 1.0 else 0.0
    val window = math.max(la, lb) / 2 - 1
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(j)) j += 1
        if (a(i) != b(j)) t += 1
        j += 1
      }
      i += 1
    }
    t = t / 2
    var s = (m.toDouble / la + m.toDouble / lb +
      (m - t).toDouble / m) / 3.0
    if (s > 0.7) {
      var p = 0
      val cap = math.min(4, math.min(la, lb))
      var k = 0
      var run = true
      while (k < cap && run) {
        if (a(k) == b(k)) p += 1 else run = false
        k += 1
      }
      s = s + p * 0.1 * (1.0 - s)
    }
    s
  }

  /** Register `jaro_winkler` in the session's function registry.
    * Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "jaro_winkler(a, b) takes two strings")
        JaroWinkler(exprs.head, exprs(1))
      },
      "built-in")
}

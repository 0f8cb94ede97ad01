package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native string-similarity expressions for fuzzy matching / record
  * linkage — codegen'd (no Scala UDF boxing), so they compose into
  * whole-stage codegen next to `levenshtein` (built in, used by d13).
  *
  * Jaro–Winkler here is the STANDARD variant (Winkler 1990): Jaro
  * similarity with match window `max(|a|,|b|)/2 − 1`, half-counted
  * transpositions, then a common-prefix boost `+ ℓ·0.1·(1−jaro)` with
  * ℓ ≤ 4 applied only when jaro > 0.7 — byte-for-byte the definition
  * DuckDB's `jaro_winkler_similarity` implements, which is what lets
  * the d18 gate pin scores across engines. */
object StringSimilarity {

  /** Jaro similarity of two char sequences; 1.0 for identical, 0.0 for
    * no matches (incl. either side empty). O(|a|·window) time, two
    * boolean scratch arrays. */
  def jaroSim(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tt = t / 2
    val mm = m.toDouble
    (mm / l1 + mm / l2 + (mm - tt) / mm) / 3.0
  }

  /** Jaro–Winkler similarity (standard constants: prefix scale 0.1,
    * max prefix 4, boost threshold 0.7). Called from generated code —
    * keep the UTF8String signature stable. */
  def jaroWinklerSim(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val j = jaroSim(s1, s2)
    if (j <= 0.7) j
    else {
      var p = 0
      val n = math.min(4, math.min(s1.length, s2.length))
      while (p < n && s1.charAt(p) == s2.charAt(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    }
  }

  case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_winkler"

    override def nullSafeEval(a: Any, b: Any): Any =
      jaroWinklerSim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.StringSimilarity.jaroWinklerSim($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaroWinkler =
      copy(left = newLeft, right = newRight)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.column(JaroWinkler(
      org.apache.spark.sql.graftshim.expression(a),
      org.apache.spark.sql.graftshim.expression(b)))
}

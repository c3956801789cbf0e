package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Jaro and Jaro-Winkler similarity.
  *
  * The reference relies on DuckDB's built-in `jaro_winkler_similarity`
  * (benchmarking/analysis/mismatches.py:70-75); Spark has no such function,
  * so this is a native Catalyst expression (SURVEY.md §7.3) with whole-stage
  * codegen emitting a static call — no UDF boxing/serialization.
  *
  * Semantics match DuckDB's (rapidfuzz-derived) implementation exactly,
  * verified against it on divergent cases: scaling p = 0.1, prefix capped
  * at 4, transposition half-count floored (t/2 integer division), Winkler
  * boost applied only when jaro > 0.7.
  */
object JaroWinklerImpl extends Serializable {

  def jaro(s1: UTF8String, s2: UTF8String): Double =
    jaroStr(s1.toString, s2.toString)

  def jaroStr(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    // DuckDB yields 0.0 whenever either side is empty (including both)
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true
          bMatched(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: mismatched flagged positions, halved with integer
    // floor — matches rapidfuzz/DuckDB semantics (t/2 floored, not t/2.0)
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / la + m / lb + (m - (t / 2)) / m) / 3.0
  }

  def jaroWinkler(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.toString
    val b = s2.toString
    val j = jaroStr(a, b)
    // Winkler prefix boost gated at jaro > 0.7 (rapidfuzz/DuckDB semantics)
    if (j <= 0.7) return j
    var prefix = 0
    val maxPrefix = math.min(4, math.min(a.length, b.length))
    while (prefix < maxPrefix && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }
}

/** match-weight-friendly scalar: jaro_winkler(left, right) -> double. */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler_similarity requires (string, string), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerImpl.jaroWinkler(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.jaroWinkler($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler_similarity"
}

object JaroWinkler {
  /** Column API: jaro_winkler_similarity(l, r). */
  def jaroWinkler(l: Column, r: Column): Column =
    Bridge.column(JaroWinklerSimilarity(Bridge.expression(l), Bridge.expression(r)))
}

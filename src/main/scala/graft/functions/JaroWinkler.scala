package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Jaro–Winkler string similarity:
  * `graft_jaro_winkler(string, string) -> double` — the entity-resolution
  * verifier (record linkage, fuzzy dedup of names/titles).
  *
  * Classic Winkler semantics (Winkler 1990), byte-exact with DuckDB's
  * `jaro_winkler_similarity` on ASCII inputs (validated against its
  * published vectors: MARTHA/MARHTA = 0.961111, DIXON/DICKSONX = 0.813333,
  * CRATE/TRACE = 0.733333 unboosted):
  *   - Jaro: matches within window max(0, ⌊max(|a|,|b|)/2⌋ − 1), greedy
  *     left-to-right pairing, transpositions = half the out-of-order
  *     matched characters; 0 matches → 0.
  *   - Winkler boost ONLY above the classic 0.7 threshold:
  *     jw = jaro + 0.1 · min(4, common_prefix) · (1 − jaro).
  *   - ANY empty side → 0, including both empty (DuckDB's convention,
  *     fuzz-validated on 35k random pairs at full double precision).
  * Operates on UTF-8 BYTES (code units): identical to per-character on
  * ASCII; declared semantics for multi-byte input.
  *
  * Why native (operator-preference tier (b)): the O(|a|·|b|-window) inner
  * loop with two boolean scratch arrays cannot be expressed as a codegen'd
  * HOF chain — a SQL formulation would be an interpreted lambda tangle or
  * a driver UDF, and the verify stage of a blocked entity-resolution join
  * evaluates this millions of times per task at 100 TB. The expression
  * stays inside whole-stage codegen via a static call (the SpanHash8
  * pattern); interpreted and codegen paths share [[JaroWinkler.compute]].
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  protected override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.JaroWinkler$$.MODULE$$.compute($a, $b);""")

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def compute(l: UTF8String, r: UTF8String): Double = {
    val a = l.getBytes
    val b = r.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val win = math.max(0, math.max(la, lb) / 2 - 1)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + win)
      var j = math.max(0, i - win)
      var found = false
      while (j <= hi && !found) {
        if (!bm(j) && a(i) == b(j)) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mt = t / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (m - mt) / md) / 3.0
    if (jaro > 0.7) {
      val maxP = math.min(4, math.min(la, lb))
      var p = 0
      while (p < maxP && a(p) == b(p)) p += 1
      jaro + 0.1 * p * (1.0 - jaro)
    } else jaro
  }
}

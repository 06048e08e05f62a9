package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the 60-bit SimHash bit-vote fold:
  * `graft_simhash60(array<bigint>) -> bigint`.
  *
  * Semantics (identical to the SQL-HOF formulation it replaces and to the
  * DuckDB oracle in Pipeline.scala): for each bit position i ∈ [0, 60), sum
  * the votes `2·((h >> i) & 1) − 1` over all token hashes h; bit i of the
  * result is set iff the vote sum is ≥ 0.
  *
  * Why a custom expression (operator-preference tier (b), see the build
  * brief): the HOF version — `aggregate(transform(sequence(0,59), i ->
  * ...aggregate(hw, ...)))` — makes 60 interpreted passes over the token
  * array with per-step boxing, and higher-order functions block whole-stage
  * codegen. This expression does ONE pass per token with a primitive
  * `int[60]` vote buffer and generates a tight Java loop via `doGenCode`, so
  * the whole signature stage stays inside WholeStageCodegen. At 100 TB the
  * signature scan is the dominant cost of simhash dedup — this is the stage
  * worth a native expression, and nothing else is.
  *
  * Registered per-session (`Pipeline.registerNativeFns`) and via
  * `GraftExtensions.injectFunction`.
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](60)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < 60) {
        votes(i) += (((h >> i) & 1L) * 2L - 1L).toInt
        i += 1
      }
      j += 1
    }
    var res = 0L
    var i = 0
    while (i < 60) {
      if (votes(i) >= 0) res |= 1L << i
      i += 1
    }
    res
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val res = ctx.freshName("res")
      s"""
         |int[] $votes = new int[60];
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  long $h = $c.getLong($j);
         |  for (int $i = 0; $i < 60; $i++) {
         |    $votes[$i] += (int) ((($h >> $i) & 1L) * 2L - 1L);
         |  }
         |}
         |long $res = 0L;
         |for (int $i = 0; $i < 60; $i++) {
         |  if ($votes[$i] >= 0) $res |= 1L << $i;
         |}
         |${ev.value} = $res;
         |""".stripMargin
    })

  protected override def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

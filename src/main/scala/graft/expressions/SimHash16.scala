package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-bit SimHash of a document in ONE pass over its characters, as a
  * whole-stage-codegen'd loop: tokens are maximal runs between single
  * spaces (split-on-' ' semantics, empty tokens INCLUDED — n spaces make
  * n+1 tokens, so values match `split(text, ' ')` + explode exactly);
  * each token's [[PolyHash]] contributes ±1 per bit position; the sign
  * bits pack into a long.
  *
  * Replaces the explode → 16-partial-sum groupBy formulation
  * (`Dedup.simhashViaAgg`, kept as the identity-spec reference): that
  * plan shuffles one row per TOKEN of the corpus into an aggregation —
  * correct, but at 100 TB the explode alone is ~20× corpus row volume.
  * This expression is a narrow projection: no explode, no exchange, and
  * the signature build for the banded near-dup join (`x5`) becomes a
  * pure map stage.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash16"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cnt = new Array[Int](16)
    var h = 0L
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        var b = 0
        while (b < 16) {
          cnt(b) += (((h >>> b) & 1L) * 2L - 1L).toInt
          b += 1
        }
        h = 0L
      } else {
        h = (h * 31L + s.charAt(i).toLong) % 1000000007L
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 16) {
      if (cnt(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val cnt = ctx.freshName("cnt")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val sig = ctx.freshName("sig")
      s"""
         |java.lang.String $s = $c.toString();
         |int[] $cnt = new int[16];
         |long $h = 0L;
         |for (int $i = 0; $i <= $s.length(); $i++) {
         |  if ($i == $s.length() || $s.charAt($i) == ' ') {
         |    for (int $b = 0; $b < 16; $b++) {
         |      $cnt[$b] += (int) ((($h >>> $b) & 1L) * 2L - 1L);
         |    }
         |    $h = 0L;
         |  } else {
         |    $h = ($h * 31L + (long) $s.charAt($i)) % 1000000007L;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 16; $b++) {
         |  if ($cnt[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial hash h_{i+1} = (31·h_i + c_i) mod 1e9+7 over a
  * string's characters, as a whole-stage-codegen'd tight loop.
  *
  * Replaces the interpreted higher-order-function fold
  * `aggregate(split(text, ""), 0L, (h, c) => (31h + ascii(c)) % M)`, whose
  * per-CHARACTER boxed lambda call made document fingerprinting the most
  * expensive narrow projection in the battery (~13 s of a 5000-doc bench;
  * this loop does the same corpus in well under a second).
  *
  * Determinism contract: iterates UTF-16 code units of the decoded string,
  * which matches the HOF's split-into-single-chars + `ascii()` exactly for
  * all BMP text (and byte-exactly for the ASCII corpora), and matches the
  * DuckDB oracle's `list_reduce` over `string_split(text, '')` + `ascii`.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 31L + s.charAt(i).toLong) % 1000000007L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * 31L + (long) $s.charAt($i)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

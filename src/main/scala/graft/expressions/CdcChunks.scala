package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk lengths via a stateless rolling-hash cut rule,
  * as a whole-stage-codegen'd one-pass loop.
  *
  * Semantics (1-indexed character positions j = 1..n): a chunk boundary
  * falls AFTER position j iff `j ≥ [[CdcChunks.Window]]`, `j < n`, and
  * the [[PolyHash]] of the trailing [[CdcChunks.Window]]-char window
  * `s[j−W+1 .. j]` is ≡ 0 (mod 2^[[CdcChunks.MaskBits]]). The result is
  * the array of chunk lengths between consecutive boundaries (last chunk
  * runs to n; ∑ lengths = n; empty string → empty array).
  *
  * This is the gear/Rabin content-defined chunking cut discipline with
  * the min/max clamps deliberately OMITTED: a stateless per-position
  * predicate keeps the rule ORACLE-EXPRESSIBLE (the DuckDB side derives
  * the same boundaries from per-position window hashes — no sequential
  * state), at the cost of the occasional short chunk the clamps would
  * suppress. Expected chunk length is 2^MaskBits = 32 chars.
  *
  * One pass, O(W) work per character (the window hash is recomputed
  * from its 8 chars — modular removal would need an inverse; at W = 8
  * the direct form is branch-free and stays inside whole-stage codegen).
  * The interpreted twin [[nullSafeEval]] and the driver-side model in
  * `GraftProperties` pin bit-identity on arbitrary strings.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(CdcChunks.model(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val cuts = ctx.freshName("cuts")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val last = ctx.freshName("last")
      val out = ctx.freshName("out")
      val w = CdcChunks.Window
      val mask = (1L << CdcChunks.MaskBits) - 1L
      s"""
         |java.lang.String $s = $c.toString();
         |int $n = $s.length();
         |int[] $cuts = new int[$n + 1];
         |int $m = 0;
         |for (int $j = $w; $j < $n; $j++) {
         |  long $h = 0L;
         |  for (int $k = $j - $w; $k < $j; $k++) {
         |    $h = ($h * 31L + (long) $s.charAt($k)) % 1000000007L;
         |  }
         |  if (($h & ${mask}L) == 0L) { $cuts[$m++] = $j; }
         |}
         |int[] $out = new int[$n == 0 ? 0 : $m + 1];
         |int $last = 0;
         |for (int $k = 0; $k < $m; $k++) {
         |  $out[$k] = $cuts[$k] - $last;
         |  $last = $cuts[$k];
         |}
         |if ($n > 0) { $out[$m] = $n - $last; }
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  /** Rolling window width (chars) for the cut predicate. */
  val Window = 8
  /** Cut when the window hash's low [[MaskBits]] bits are zero —
    * expected chunk length 2^MaskBits. */
  val MaskBits = 5

  /** Driver-side reference model — the spec/property ground truth. */
  def model(s: String): Array[Int] = {
    val n = s.length
    if (n == 0) return Array.empty
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val mask = (1L << MaskBits) - 1L
    var j = Window
    while (j < n) {
      var h = 0L
      var k = j - Window
      while (k < j) { h = (h * 31L + s.charAt(k).toLong) % 1000000007L; k += 1 }
      if ((h & mask) == 0L) cuts += j
      j += 1
    }
    val out = new Array[Int](cuts.length + 1)
    var last = 0
    var i = 0
    while (i < cuts.length) { out(i) = cuts(i) - last; last = cuts(i); i += 1 }
    out(cuts.length) = n - last
    out
  }
}

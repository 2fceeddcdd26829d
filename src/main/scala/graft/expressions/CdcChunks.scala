package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk lengths via a stateless rolling-hash cut rule,
  * as a whole-stage-codegen'd one-pass loop.
  *
  * Semantics (1-indexed positions j = 1..n over the input's VALUE
  * STREAM): a chunk boundary falls AFTER position j iff
  * `j ≥ [[CdcChunks.Window]]`, `j < n`, and the [[PolyHash]] of the
  * trailing [[CdcChunks.Window]]-value window `s[j−W+1 .. j]` is
  * ≡ 0 (mod 2^[[CdcChunks.MaskBits]]). The result is the array of chunk
  * lengths between consecutive boundaries (last chunk runs to n;
  * ∑ lengths = n; empty input → empty array).
  *
  * The value stream follows the input type, exactly as in [[PolyHash]]:
  * STRING → UTF-16 code units (BMP-identical to the oracle's
  * `ascii`-per-character derivation); BINARY → unsigned bytes (the
  * media-blob path, where the oracle parses the same byte values from
  * `hex(blob)` — no character encoding in play at all).
  *
  * This is the gear/Rabin content-defined chunking cut discipline with
  * the min/max clamps deliberately OMITTED: a stateless per-position
  * predicate keeps the rule ORACLE-EXPRESSIBLE (the DuckDB side derives
  * the same boundaries from per-position window hashes — no sequential
  * state), at the cost of the occasional short chunk the clamps would
  * suppress. Expected chunk length is 2^MaskBits = 32 values.
  *
  * One pass, O(W) work per position (the window hash is recomputed
  * from its 8 values — modular removal would need an inverse; at W = 8
  * the direct form is branch-free and stays inside whole-stage codegen).
  * The interpreted twin [[nullSafeEval]] and the driver-side models in
  * `GraftProperties` pin bit-identity on arbitrary inputs.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or binary argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any = input match {
    case b: Array[Byte] => new GenericArrayData(CdcChunks.model(b))
    case s => new GenericArrayData(
      CdcChunks.model(s.asInstanceOf[UTF8String].toString))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
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
      val (decl, valueAt) =
        if (child.dataType == BinaryType) {
          val b = ctx.freshName("b")
          (s"byte[] $b = $c;\nint $n = $b.length;",
            (idx: String) => s"(long) ($b[$idx] & 0xff)")
        } else {
          val s = ctx.freshName("s")
          (s"java.lang.String $s = $c.toString();\nint $n = $s.length();",
            (idx: String) => s"(long) $s.charAt($idx)")
        }
      s"""
         |$decl
         |int[] $cuts = new int[$n + 1];
         |int $m = 0;
         |for (int $j = $w; $j < $n; $j++) {
         |  long $h = 0L;
         |  for (int $k = $j - $w; $k < $j; $k++) {
         |    $h = ($h * 31L + ${valueAt(k)}) % 1000000007L;
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
  /** Rolling window width (values) for the cut predicate. */
  val Window = 8
  /** Cut when the window hash's low [[MaskBits]] bits are zero —
    * expected chunk length 2^MaskBits. */
  val MaskBits = 5

  /** Driver-side reference model over a value stream — the
    * spec/property ground truth shared by both input types. */
  private def modelValues(n: Int, valueAt: Int => Long): Array[Int] = {
    if (n == 0) return Array.empty
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val mask = (1L << MaskBits) - 1L
    var j = Window
    while (j < n) {
      var h = 0L
      var k = j - Window
      while (k < j) { h = (h * 31L + valueAt(k)) % 1000000007L; k += 1 }
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

  /** String-input model (UTF-16 code-unit values). */
  def model(s: String): Array[Int] =
    modelValues(s.length, i => s.charAt(i).toLong)

  /** Binary-input model (unsigned byte values). */
  def model(b: Array[Byte]): Array[Int] =
    modelValues(b.length, i => (b(i) & 0xff).toLong)
}

package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document character-entropy statistics for
  * [[graft.operators.Frequency.charEntropy]] (x66): code-point count
  * `n`, distinct-code-point count `n_distinct`, and the ln-quantized
  * entropy numerator `s_scaled = Σ_c c · ⌊ln(c)·scale + 0.5⌋` over the
  * per-character counts c.
  *
  * Replaces the higher-order-function pipeline
  * `transform(array_distinct(chars), c -> size(filter(chars, x = c)))`,
  * whose per-document cost is O(len · alphabet) — one full re-scan of
  * the character array per DISTINCT character. The round-11 sf1 gate's
  * non-ASCII corpus multiplied the alphabet ~5× and x66 became the
  * battery's worst near-linear row (8.1×/decade, 50.6 s at sf10).
  * Here one pass over the string's code points builds the histogram
  * (O(len) work, alphabet-independent), then the quantized-ln sum runs
  * over the histogram's ≤ alphabet entries.
  *
  * Bit-exactness: the quantum is ⌊Math.log(c)·scale + 0.5⌋ — the same
  * arithmetic Catalyst's `ln` codegen evaluates in the HOF form, so the
  * value is unchanged Spark-vs-Spark, and cross-engine agreement rests
  * on the same 1e-6 quantization the x43/x66 house rule already trusts
  * (DuckDB's ln and Java's agree to well under a quantum away from
  * rounding boundaries). Code points match both engines' character
  * semantics: Spark's `split(text, '')` and `length`, and DuckDB's
  * `string_split(text, '')` and `length`, all count Unicode code
  * points, which the sf1 multi-byte corpus gate verifies corpus-wide.
  *
  * Null propagates; an empty string yields (1, 1, 0), mirroring the HOF
  * form it replaces (`split('', '')` is `['']` — one empty-string
  * element, whose count-1 histogram entry contributes ⌊ln(1)·scale⌋ = 0)
  * so the identity rewrite is total, not just total-under-x66's-filter. */
case class CharEntropyStats(child: Expression, scale: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("s_scaled", LongType, nullable = false)))

  override def prettyName: String = "char_entropy_stats"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyStats.compute(input.asInstanceOf[UTF8String], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CharEntropyStats.compute($c, ${scale}L);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)
}

object CharEntropyStats {
  def compute(s: UTF8String, scale: Long): InternalRow = {
    val str = s.toString
    // split('', '') = [''] in both Spark and DuckDB: one element, one
    // distinct value, ln(1) contribution 0 — keep the rewrite an
    // identity on the empty string too (see scaladoc).
    if (str.isEmpty)
      return new GenericInternalRow(Array[Any](1L, 1L, 0L))
    val hist = new mutable.LongMap[Long](64)
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      hist(cp.toLong) = hist.getOrElse(cp.toLong, 0L) + 1L
      i += Character.charCount(cp)
      n += 1L
    }
    var sScaled = 0L
    hist.foreachValue { c =>
      sScaled +=
        c * math.floor(math.log(c.toDouble) * scale.toDouble + 0.5).toLong
    }
    new GenericInternalRow(Array[Any](n, hist.size.toLong, sScaled))
  }
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit average-hash (aHash) perceptual fingerprint over a byte/char
  * stream, as a whole-stage-codegen'd two-pass loop.
  *
  * The classical aHash decodes an image, shrinks it to an 8×8 grid, and
  * sets bit k iff cell k's mean intensity exceeds the global mean. Here
  * the "decoded pixel stream" is the deterministic stub decode of
  * [[graft.operators.Multimodal.FakeDecoder]] — the blob's own bytes (the
  * corpus is ASCII, so UTF-16 code units ARE the bytes) — and the 8×8
  * grid becomes 64 contiguous index buckets: position i of an n-char
  * stream lands in bucket (i·64)/n (integer division — the same
  * coordinate contraction a resize kernel performs). Bit k is set iff
  * bucket k's mean exceeds the global mean, decided in exact integer
  * arithmetic (`sum_k · n > total · count_k` — no float division, so the
  * DuckDB oracle reproduces every bit; the products are compared in
  * 128 bits via `Math.multiplyHigh`, since `total · count_k` exceeds
  * Long for streams around ≥ 9·10⁷ chars and a silent Long wrap would
  * diverge from the oracle's overflow-checked arithmetic).
  * Near-identical byte streams
  * (crops, pad/truncate edits, small splices) move few bucket means, so
  * they land within a small Hamming distance — the property
  * [[graft.operators.Multimodal.mediaDups]]'s banded join exploits.
  * A production build swaps the stub stream for real decoded pixels and
  * the bucketing/threshold logic is unchanged.
  *
  * Empty input hashes to 0 (no bucket exceeds the mean of nothing);
  * null propagates. Cost is two tight passes over the stream (sum, then
  * bucket sums) with a 64-long stack array — no allocation per row
  * beyond that array, no boxing.
  */
case class AHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "ahash64"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n == 0) return 0L
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < n) {
      val v = s.charAt(i).toLong
      val b = ((i.toLong * 64L) / n).toInt
      sums(b) += v
      counts(b) += 1L
      total += v
      i += 1
    }
    var h = 0L
    var k = 0
    while (k < 64) {
      if (AHash64.gt128(sums(k), n.toLong, total, counts(k))) h |= (1L << k)
      k += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val sums = ctx.freshName("sums")
      val counts = ctx.freshName("counts")
      val total = ctx.freshName("total")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val k = ctx.freshName("k")
      s"""
         |java.lang.String $s = $c.toString();
         |int $n = $s.length();
         |long $h = 0L;
         |if ($n > 0) {
         |  long[] $sums = new long[64];
         |  long[] $counts = new long[64];
         |  long $total = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = (long) $s.charAt($i);
         |    int $b = (int) (((long) $i * 64L) / $n);
         |    $sums[$b] += $v;
         |    $counts[$b] += 1L;
         |    $total += $v;
         |  }
         |  for (int $k = 0; $k < 64; $k++) {
         |    if (graft.expressions.AHash64.gt128(
         |        $sums[$k], (long) $n, $total, $counts[$k])) $h |= (1L << $k);
         |  }
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}

object AHash64 {
  /** 128-bit-exact `a·b > c·d` for NON-NEGATIVE longs (char sums and
    * position counts are always ≥ 0 here). `Math.multiplyHigh` yields
    * the signed high word, which for non-negative operands equals the
    * unsigned high word, so (high, unsigned-low) lexicographic compare
    * is the exact 128-bit product compare — no BigInt allocation in the
    * per-row hot loop, callable from generated code. */
  def gt128(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    if (hi1 != hi2) hi1 > hi2 else java.lang.Long.compareUnsigned(lo1, lo2) > 0
  }
}

package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Elementwise fixed-point vector sum: per dimension i the buffer
  * accumulates `floor(vᵢ·scale + 0.5)` as a long — the engine-portable
  * rounding [[graft.operators.Similarity]]'s Lloyd update (and x27/x38)
  * uses, so the sum is exact integer arithmetic and partitioning-free.
  *
  * WHY THIS EXISTS (optimization round 14, guide §2.3 "shuffle fewer
  * bytes" / §2.4): Lloyd's mean update was a `posexplode` to (cell, dim,
  * value) rows — a 64× row fan-out through a (cell, dim)-keyed hash
  * aggregate — followed by a SECOND groupBy(cell) to reassemble the
  * centroid array. This aggregator folds the whole array into one
  * per-cell buffer row: as an `Aggregator` it partial-aggregates
  * (ObjectHashAggregate), so each map partition emits at most one
  * ≤Dim-long buffer per cell before the exchange, and the centroid array
  * comes out assembled — the fan-out and the reassembly shuffle are both
  * gone. Values are bit-identical: the same per-element
  * `floor(v·scale + 0.5)` longs, summed in any order (exact integers).
  *
  * Overflow bound: |element| ≤ scale·max|v| (unit vectors: ≤ scale+1), so
  * a long holds ~9.2e18/scale members per cell — ~9e12 vectors per cell
  * at the 1e6 scale, far past any real cell occupancy (the cell curves in
  * [[graft.operators.Similarity]] hold cells at ~125 members or √N·8).
  */
final class VecSumScaled(scale: Double, dim: Int)
    extends Aggregator[Array[Double], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](dim)

  override def reduce(buf: Array[Long], a: Array[Double]): Array[Long] = {
    val n = math.min(dim, a.length)
    var i = 0
    while (i < n) {
      buf(i) += math.floor(a(i) * scale + 0.5).toLong
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) {
      a(i) += b(i)
      i += 1
    }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

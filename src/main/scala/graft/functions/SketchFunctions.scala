package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Column wrappers over Spark's OWN bloom-filter Catalyst machinery —
  * the expressions `InjectRuntimeFilter` uses for runtime row-level
  * join pruning (`BloomFilterAggregate` / `BloomFilterMightContain`,
  * both codegen'd). Re-using them instead of a UDF keeps the sketch
  * path inside whole-stage codegen and inherits Spark's serialized
  * bloom format (org.apache.spark.util.sketch.BloomFilter).
  *
  * Contract (same as the runtime-filter rule's): values are hashed to
  * LONG with xxhash64 on BOTH the build and the probe side — the
  * aggregate's input and `mightContain`'s probe must be the same
  * `xxhash64(value)` column or membership answers are garbage.
  */
object SketchFunctions {

  /** Aggregate: serialized bloom filter (binary) over `xxhash64(value)`,
    * sized for `expectedItems` distinct values. The result is a few
    * hundred KB REGARDLESS of input row count — the whole point: a
    * benchmark/reference relation of any size collapses to a
    * constant-size broadcastable sketch. */
  def bloomAgg(value: Column, expectedItems: Long): Column =
    GraftSql.column(
      new BloomFilterAggregate(
        GraftSql.expression(xxhash64(value)), expectedItems)
        .toAggregateExpression())

  /** Probe: might `value` be in the sketch computed by `bloomDf` (a
    * 1-row, 1-column [[bloomAgg]] relation)? False positives at the
    * sketch's configured rate, never false negatives — so it is a
    * PREFILTER (cheap map-side cut before an exact confirm), not a
    * membership oracle.
    *
    * The sketch relation embeds as a SCALAR SUBQUERY — the only form
    * `might_contain` accepts besides a literal, and the right execution
    * shape anyway: the subquery runs once, its 1-row result ships to
    * every task with the plan (no join in the main query tree at all). */
  def bloomMightContain(bloomDf: DataFrame, value: Column): Column =
    GraftSql.column(
      BloomFilterMightContain(
        ScalarSubquery(GraftSql.analyzedPlan(bloomDf)),
        GraftSql.expression(xxhash64(value))))
}

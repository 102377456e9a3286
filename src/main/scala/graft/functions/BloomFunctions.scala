package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL-surface registrations for Spark's own Bloom-filter expressions.
  *
  * `BloomFilterAggregate` / `BloomFilterMightContain` are the machinery
  * behind Catalyst's `InjectRuntimeFilter` rule (a shuffle join's small side
  * builds a Bloom filter that pre-filters the big side's scan). They are
  * internal-only — not exposed through `functions._` or the public SQL
  * registry — so pipelines that want the same pattern EXPLICITLY (build a
  * fixed-size filter from one dataframe, probe it from another, e.g.
  * [[graft.pipelines.TrainingPrep.bloomDecontaminate]]) can't reach them.
  * These descriptors inject them as session functions:
  *
  *   - `bloom_agg(xxhash64(x), estItems, numBits)` → `binary` (the filter's
  *     serialized bits; an aggregate, constant-size regardless of input
  *     rows). The input MUST be pre-hashed to a 64-bit long — the probe
  *     must apply the identical hash.
  *   - `bloom_might_contain(filter, xxhash64(x))` → boolean, no false
  *     negatives. The filter argument must be a constant or scalar
  *     subquery (enforced by the expression itself), which keeps the
  *     filter's lifecycle inside the plan — built once, shipped to every
  *     probe task like a broadcast variable.
  *
  * No wrapper classes: registering the stock expressions keeps their
  * codegen (`BloomFilterMightContain.doGenCode` probes the shared filter
  * object without per-row deserialization) and their agg-buffer
  * serialization exactly as Spark's own runtime filtering uses them. */
object BloomFunctions {

  val bloomAggDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_agg"),
    new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_agg"),
    (args: Seq[Expression]) => args match {
      case Seq(child)            => new BloomFilterAggregate(child)
      case Seq(child, est)       => new BloomFilterAggregate(child, est)
      case Seq(child, est, bits) => new BloomFilterAggregate(child, est, bits)
      case _ => throw new IllegalArgumentException(
        s"bloom_agg expects 1-3 arguments, got ${args.size}")
    })

  val bloomMightContainDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_might_contain"),
    new ExpressionInfo(classOf[BloomFilterMightContain].getName, "bloom_might_contain"),
    (args: Seq[Expression]) => BloomFilterMightContain(args(0), args(1)))
}

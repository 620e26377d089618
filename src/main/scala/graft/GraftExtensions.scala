package graft

import graft.expressions.CosineSimilarity
import graft.proto.{EncodeHeartbeatEnvelope, EncodePriceTickEnvelope}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the engine's custom Catalyst expressions with the session so
  * they are first-class SQL functions (SURVEY.md §2B B38):
  *
  *   - cosine_similarity(array<float>, array<float>) → double  (codegen'd)
  *   - encode_price_tick_proto(tick_struct, ts, nanos) → binary
  *   - encode_heartbeat_proto(hb_struct, ts, nanos) → binary
  *
  * Two entry points: `withExtensions(new GraftExtensions)` at session build
  * time (cluster deployments via spark.sql.extensions), or
  * `GraftExtensions.register(spark)` on an existing session (tests, REPL).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(e.injectFunction)
    // bounded time-range joins → equi-join on (key, time-bin) instead of
    // BroadcastNestedLoopJoin (see RangeBinJoinRewrite)
    e.injectOptimizerRule(_ => graft.plans.RangeBinJoinRewrite)
    // conf-gated materialized-view substitution for lineitem aggregates
    // (see MvAggRewrite; sessions built without extensions get it via
    // spark.experimental.extraOptimizations in q281's body)
    e.injectOptimizerRule(_ => graft.plans.MvAggRewrite)
    // conf-gated approximate acceleration: count(DISTINCT c) → KMV
    // bottom-64 estimate (see ApproxCountRewrite; default off)
    e.injectOptimizerRule(_ => graft.plans.ApproxCountRewrite)
    // native per-key top-k: logical node → partial/final heap SparkPlans
    // (see TopKPerKey; sessions built without extensions get the strategy
    // injected on first TopKPerKey.topK call)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKey.TopKPerKeyStrategy)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine similarity of two float vectors"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    (FunctionIdentifier("encode_price_tick_proto"),
      info("encode_price_tick_proto", "encode_price_tick_proto(tick, ts, nanos) - StreamMessageProto bytes"),
      (es: Seq[Expression]) => EncodePriceTickEnvelope(es(0), es(1), es(2))),
    (FunctionIdentifier("encode_heartbeat_proto"),
      info("encode_heartbeat_proto", "encode_heartbeat_proto(hb, ts, nanos) - StreamMessageProto bytes"),
      (es: Seq[Expression]) => EncodeHeartbeatEnvelope(es(0), es(1), es(2))))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}

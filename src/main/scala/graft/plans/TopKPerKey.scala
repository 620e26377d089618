package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}

/** Native per-key top-k — the full custom-operator stack (SURVEY.md §4.2
  * preference (c)): a logical node, a planner [[Strategy]], and a physical
  * [[TopKPerKeyExec]] that keeps a BOUNDED k-row heap per key on both sides
  * of the shuffle (partial map-side, final reduce-side).
  *
  * Why a custom operator: the DataFrame formulation —
  * `row_number().over(Window.partitionBy(key).orderBy(ord)) <= k` — must
  * SORT every partition in full (O(n log n) over all rows, full-width
  * shuffle of every row). The heap operator does O(n log k) work, ships at
  * most k rows per (partition, key) through the exchange, and never sorts
  * whole partitions. Same reason Spark itself plans global LIMIT+ORDER BY
  * as TakeOrderedAndProject (B17/q17) — this generalizes it per key.
  *
  * Scale shape at 100 TB: the partial phase collapses each map task's
  * contribution to ≤ k rows per key BEFORE the exchange (like a partial
  * aggregate), so shuffled volume is bounded by k·|keys| regardless of
  * input size; the final phase merges per key under the same bound.
  */
object TopKPerKey {

  /** Logical marker node: "keep the top k rows per `keys` under `order`".
    * Output = child output (row-preserving filter semantics). */
  final case class TopKPerKeyNode(
      k: Int,
      keys: Seq[Expression],
      order: Seq[SortOrder],
      child: LogicalPlan)
    extends UnaryNode {
    override def output: Seq[Attribute] = child.output
    // reference every output so column pruning leaves the node intact
    override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(child.output)
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
      copy(child = newChild)
  }

  /** Plans the marker as partial(map-side) → exchange → final(reduce-side);
    * the exchange is inserted by EnsureRequirements because the final exec
    * requires ClusteredDistribution over the keys. */
  object TopKPerKeyStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKeyNode(k, keys, order, child) =>
        TopKPerKeyExec(k, keys, order, partial = false,
          TopKPerKeyExec(k, keys, order, partial = true, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** Bounded per-key heap. `partial = true` runs on whatever distribution
    * the child has (map-side pre-reduction); `partial = false` demands
    * clustering on the keys and produces the exact per-key top k. */
  final case class TopKPerKeyExec(
      k: Int,
      keys: Seq[Expression],
      order: Seq[SortOrder],
      partial: Boolean,
      child: SparkPlan)
    extends UnaryExecNode {

    override def output: Seq[Attribute] = child.output

    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      else ClusteredDistribution(keys) :: Nil

    override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
      copy(child = newChild)

    override lazy val metrics = Map(
      "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of output rows"),
      "numKeys" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of distinct keys"))

    override protected def doExecute(): RDD[InternalRow] = {
      val outRows = longMetric("numOutputRows")
      val nKeys = longMetric("numKeys")
      val kLocal = k
      val keyExprs = keys
      val orderExprs = order
      val childOutput = child.output
      child.execute().mapPartitions { it =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        val rowProj = UnsafeProjection.create(childOutput, childOutput)
        val ord: Ordering[InternalRow] =
          org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
            .generate(orderExprs, childOutput)
        // per key: a max-heap under `ord` whose root is the WORST kept row,
        // so admission is one comparison against the root
        val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
        val worstFirst = ord.reverse
        it.foreach { row =>
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, worstFirst)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < kLocal) heap.add(rowProj(row).copy())
          else if (ord.compare(row, heap.peek()) < 0) {
            heap.poll(); heap.add(rowProj(row).copy())
          }
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        heaps.values().forEach { h =>
          val rows = new java.util.ArrayList[UnsafeRow](h)
          rows.sort(ord)
          rows.forEach(r => out += r)
        }
        nKeys += heaps.size()
        outRows += out.size
        out.iterator
      }
    }
  }

  /** Library entry point: top `k` rows per key under `order`, as a
    * DataFrame transform. Injects the planner strategy into the session
    * (idempotent) — also registerable at build time via GraftExtensions. */
  def topK(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    // let the ANALYZER produce fully-resolved catalyst SortOrders (a
    // hand-converted sort Column would carry Connect-side AST nodes that
    // are not task-serializable): plan a sortWithinPartitions and lift its
    // order + child out of the analyzed plan
    val sortPlan = df.sortWithinPartitions(order: _*).queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort]
    val keyExprs = df.repartition(keys: _*).queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression]
      .partitionExpressions
    // both lifts analyze over df's already-analyzed plan, so attribute ids
    // agree between sortPlan.child and the key expressions
    DatasetBridge.ofRows(spark, TopKPerKeyNode(k, keyExprs, sortPlan.order, sortPlan.child))
  }
}

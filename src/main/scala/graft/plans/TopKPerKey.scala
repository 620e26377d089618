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
  *
  * Memory bound: each phase buffers a (k+1)-row heap per distinct key it
  * sees. The PARTIAL phase caps that at [[maxBufferedKeys]] heaps — once
  * the cap is hit, rows of not-yet-seen keys PASS THROUGH un-reduced
  * (correct: the partial phase emits a superset and the final phase is
  * exact — the same degrade-to-passthrough hash aggregation uses when its
  * map is full, minus the spill file). The FINAL phase cannot pass through
  * (it must produce the exact top k), so its working set is
  * k·|distinct keys in the task's partition| — the identical bound a
  * reduce-side hash aggregate carries pre-spill; size the shuffle
  * partition count so k·|keys|/numPartitions fits an executor, exactly as
  * you would for a grouped aggregation over the same keys.
  */
object TopKPerKey {

  /** Partial-phase heap-map cap (heaps, not rows; ≈ (k+1)·this rows).
    * Generous for local[32] bench scale and still a hard bound — override
    * per-operator via [[topK]]'s `maxBufferedKeys`. */
  val defaultMaxBufferedKeys: Int = 1 << 20

  /** Logical marker node: "keep the top k rows per `keys` under `order`".
    * Output = child output (row-preserving filter semantics). */
  final case class TopKPerKeyNode(
      k: Int,
      keys: Seq[Expression],
      order: Seq[SortOrder],
      child: LogicalPlan,
      maxBufferedKeys: Int = defaultMaxBufferedKeys)
    extends UnaryNode {
    require(k >= 1, s"topK requires k >= 1, got $k")
    require(maxBufferedKeys >= 1, s"maxBufferedKeys must be >= 1, got $maxBufferedKeys")
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
      case TopKPerKeyNode(k, keys, order, child, maxKeys) =>
        TopKPerKeyExec(k, keys, order, partial = false,
          TopKPerKeyExec(k, keys, order, partial = true, planLater(child),
            maxKeys), maxKeys) :: Nil
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
      child: SparkPlan,
      maxBufferedKeys: Int = defaultMaxBufferedKeys)
    extends UnaryExecNode {
    require(k >= 1, s"topK requires k >= 1, got $k")

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
        .createMetric(sparkContext, "number of distinct keys"),
      "passThroughRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "rows passed through un-reduced (partial map full)"))

    override protected def doExecute(): RDD[InternalRow] = {
      val outRows = longMetric("numOutputRows")
      val nKeys = longMetric("numKeys")
      val spilledRows = longMetric("passThroughRows")
      val kLocal = k
      val keyExprs = keys
      val orderExprs = order
      val childOutput = child.output
      val isPartial = partial
      val maxKeys = maxBufferedKeys
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
        // partial-phase overflow: rows of keys that did NOT get a heap
        // (map at capacity) are STREAMED OUT as encountered — never
        // buffered, so partial-phase memory is truly (k+1)·maxKeys rows
        // (buffering overflow to partition end would grow with partition
        // size, defeating the cap). A superset is fine before the exact
        // final phase, which never overflows by construction
        // (requiredChildDistribution clusters its keys; its bound is
        // k·|keys in partition|, documented above).
        val overflow: Iterator[InternalRow] = it.flatMap { row =>
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null && !(isPartial && heaps.size() >= maxKeys)) {
            heap = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, worstFirst)
            heaps.put(key.copy(), heap)
          }
          if (heap == null) {
            spilledRows += 1
            outRows += 1
            Iterator.single(rowProj(row).copy(): InternalRow)
          } else {
            if (heap.size < kLocal) heap.add(rowProj(row).copy())
            else if (ord.compare(row, heap.peek()) < 0) {
              heap.poll(); heap.add(rowProj(row).copy())
            }
            Iterator.empty
          }
        }
        // `++` is lazy: the heap leg only materializes after the input is
        // fully consumed (all admissions done)
        overflow ++ new Iterator[InternalRow] {
          private lazy val inner: Iterator[InternalRow] = {
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
          override def hasNext: Boolean = inner.hasNext
          override def next(): InternalRow = inner.next()
        }
      }
    }
  }

  /** Library entry point: top `k` rows per key under `order`, as a
    * DataFrame transform. Injects the planner strategy into the session
    * (idempotent) — also registerable at build time via GraftExtensions. */
  def topK(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
           maxBufferedKeys: Int = defaultMaxBufferedKeys): DataFrame = {
    require(k >= 1, s"topK requires k >= 1, got $k")
    val spark = df.sparkSession
    // injection is synchronized and checks the PLANNER's strategy list —
    // which includes both experimental strategies and those registered via
    // SparkSessionExtensions (GraftExtensions) — so concurrent callers and
    // extension-registered sessions never double-append
    TopKPerKey.synchronized {
      if (!spark.sessionState.planner.extraPlanningStrategies
            .contains(TopKPerKeyStrategy) &&
          !spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
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
    DatasetBridge.ofRows(spark,
      TopKPerKeyNode(k, keyExprs, sortPlan.order, sortPlan.child, maxBufferedKeys))
  }
}

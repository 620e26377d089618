package graft.plans

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, GenerateOrdering}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BlockingOperatorWithCodegen, CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetric
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}

/** Per-partition working state of the top-k operator: a bounded (k+1)-row
  * heap per distinct key, a pass-through / spill policy past
  * [[maxKeys]] buffered heaps, and the end-of-input merge. One instance per
  * task; shared by the interpreted ([[TopKPerKey.TopKPerKeyExec.doExecute]])
  * and whole-stage-codegen (`doProduce`/`doConsume`) paths — the generated
  * code calls [[add]] per input row and [[finish]] once, which is why this
  * is a top-level class (Janino resolves `graft.plans.TopKBuffer` without
  * the `$`-nested name mangling an object member would carry).
  *
  * Overflow policy past `maxKeys` heaps:
  *  - `passThrough = true` (interpreted PARTIAL phase): rows of keys that
  *    did not get a heap are returned from [[add]] for the caller to stream
  *    out un-reduced — never buffered, so memory is truly (k+1)·maxKeys
  *    rows. A superset is fine before the exact final phase.
  *  - `passThrough = false` (FINAL phase, and BOTH phases under codegen —
  *    a blocking codegen operator cannot emit mid-consume): the full heap
  *    map is flushed to a key-sorted disk run and cleared; [[finish]]
  *    k-way-merges the runs with the surviving heaps. Each run holds ≤ k
  *    rows per key, so top-k of the union = top-k of the per-run top-ks
  *    (the same distributivity the partial phase relies on). Working
  *    memory during the merge is ≤ k·(runs+1) rows for one key at a time —
  *    ObjectHashAggregateExec's sort-based-fallback shape.
  */
final class TopKBuffer(
    k: Int,
    maxKeys: Int,
    passThrough: Boolean,
    keyExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    childOutput: Seq[Attribute],
    outRows: SQLMetric,
    nKeys: SQLMetric,
    passRows: SQLMetric,
    nSpills: SQLMetric) {

  private val keyProj = UnsafeProjection.create(keyExprs, childOutput)
  private val rowProj = UnsafeProjection.create(childOutput, childOutput)
  private val ord: Ordering[InternalRow] =
    GenerateOrdering.generate(orderExprs, childOutput)
  private val worstFirst = ord.reverse
  // per key: a max-heap under `ord` whose root is the WORST kept row, so
  // admission is one comparison against the root
  private val heaps =
    new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
  private val spillFiles = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
  // run streams close themselves at EOF, but an early-terminating consumer
  // (a LIMIT stopping mid-merge) abandons them open — the listener closes
  // before deleting so no fd outlives the task (and the delete works on
  // filesystems that refuse to unlink open files)
  private val openRunStreams =
    scala.collection.mutable.ArrayBuffer.empty[java.io.DataInputStream]
  Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
    openRunStreams.foreach(s => try s.close() catch { case _: Throwable => () })
    spillFiles.foreach(_.delete())
  })

  /** Admit one input row. Returns `null` normally; in [[passThrough]] mode
    * with the heap map at capacity, returns the (copied) row for the
    * caller to stream out un-reduced. */
  def add(row: InternalRow): InternalRow = {
    val key = keyProj(row)
    var heap = heaps.get(key)
    if (heap == null) {
      // at capacity: the spill policy flushes the map to a disk run
      // (making room); the pass-through policy leaves heap null and the
      // row is returned below
      if (heaps.size() >= maxKeys && !passThrough) spillHeaps()
      if (heaps.size() < maxKeys) {
        heap = new java.util.PriorityQueue[UnsafeRow](k + 1, worstFirst)
        heaps.put(key.copy(), heap)
      }
    }
    if (heap == null) {
      passRows += 1
      outRows += 1
      rowProj(row).copy()
    } else {
      if (heap.size < k) heap.add(rowProj(row).copy())
      else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll(); heap.add(rowProj(row).copy())
      }
      null
    }
  }

  /** The surviving per-key top-k rows (merged with any disk runs), to be
    * consumed AFTER the input is exhausted. Metric exactness: numKeys and
    * the heap/merge-leg share of numOutputRows only accumulate as this
    * iterator is drained — a downstream early-terminating consumer (e.g. a
    * LIMIT stopping mid-partition) undercounts them. Acceptable for
    * metrics; counts are exact whenever the partition is fully consumed. */
  def finish(): Iterator[InternalRow] =
    if (spillFiles.isEmpty) {
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach { h =>
        val rows = new java.util.ArrayList[UnsafeRow](h)
        rows.sort(ord)
        rows.forEach(r => out += r)
      }
      nKeys += heaps.size()
      outRows += out.size
      out.iterator
    } else mergeRuns()

  // Flush the whole heap map to a key-sorted disk run (each key contributes
  // its current ≤ k rows, `ord`-sorted) and clear it. Keys are ordered by
  // their UnsafeRow BYTES — the same identity the hash map groups by — so
  // the end-of-input merge can group equal keys across runs.
  private def spillHeaps(): Unit = {
    val file = java.io.File.createTempFile("graft-topk-spill", ".run")
    spillFiles += file
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(file), 1 << 16))
    try {
      val sortedKeys = new java.util.ArrayList[UnsafeRow](heaps.keySet())
      sortedKeys.sort((a: UnsafeRow, b: UnsafeRow) =>
        java.util.Arrays.compareUnsigned(a.getBytes, b.getBytes))
      sortedKeys.forEach { key =>
        val rows = new java.util.ArrayList[UnsafeRow](heaps.get(key))
        rows.sort(ord)
        val kb = key.getBytes
        out.writeInt(kb.length); out.write(kb)
        out.writeInt(rows.size())
        rows.forEach { r =>
          val rb = r.getBytes
          out.writeInt(rb.length); out.write(rb)
        }
      }
    } finally out.close()
    heaps.clear()
    nSpills += 1
  }

  // Streams one spill run back as (keyBytes, rows-for-that-key).
  private def readRun(file: java.io.File): Iterator[(Array[Byte], Array[UnsafeRow])] =
    new Iterator[(Array[Byte], Array[UnsafeRow])] {
      private val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        new java.io.FileInputStream(file), 1 << 16))
      openRunStreams += in
      private var nextGroup: (Array[Byte], Array[UnsafeRow]) = advance()
      private def advance(): (Array[Byte], Array[UnsafeRow]) = {
        val keyLen = try in.readInt() catch {
          case _: java.io.EOFException => in.close(); return null
        }
        val kb = new Array[Byte](keyLen); in.readFully(kb)
        val n = in.readInt()
        val rows = Array.tabulate(n) { _ =>
          val rb = new Array[Byte](in.readInt()); in.readFully(rb)
          val r = new UnsafeRow(childOutput.length)
          r.pointTo(rb, rb.length)
          r
        }
        (kb, rows)
      }
      override def hasNext: Boolean = nextGroup != null
      override def next(): (Array[Byte], Array[UnsafeRow]) = {
        val g = nextGroup; nextGroup = advance(); g
      }
    }

  // The surviving in-memory heaps as one more (key-sorted) run.
  private def memoryRun(): Iterator[(Array[Byte], Array[UnsafeRow])] = {
    val sortedKeys = new java.util.ArrayList[UnsafeRow](heaps.keySet())
    sortedKeys.sort((a: UnsafeRow, b: UnsafeRow) =>
      java.util.Arrays.compareUnsigned(a.getBytes, b.getBytes))
    val it = sortedKeys.iterator()
    new Iterator[(Array[Byte], Array[UnsafeRow])] {
      override def hasNext: Boolean = it.hasNext
      override def next(): (Array[Byte], Array[UnsafeRow]) = {
        val key = it.next()
        (key.getBytes, heaps.get(key).toArray(new Array[UnsafeRow](0)))
      }
    }
  }

  // K-way merge of key-sorted runs: for each distinct key (byte order),
  // pool the ≤ k rows each run holds for it and re-select the exact top k.
  // Memory: one key group at a time, ≤ k·(runs+1) rows.
  private def mergeRuns(): Iterator[InternalRow] = {
    val runs = (spillFiles.map(readRun) :+ memoryRun()).map(_.buffered)
      .filter(_.hasNext).toIndexedSeq
    new Iterator[InternalRow] {
      private var group: Iterator[InternalRow] = Iterator.empty
      private def refill(): Unit = {
        val live = runs.filter(_.hasNext)
        if (live.isEmpty) return
        val minKey = live.map(_.head._1).reduce { (a, b) =>
          if (java.util.Arrays.compareUnsigned(a, b) <= 0) a else b
        }
        val heap = new java.util.PriorityQueue[UnsafeRow](k + 1, worstFirst)
        live.foreach { r =>
          if (java.util.Arrays.compareUnsigned(r.head._1, minKey) == 0) {
            r.next()._2.foreach { row =>
              if (heap.size < k) heap.add(row)
              else if (ord.compare(row, heap.peek()) < 0) {
                heap.poll(); heap.add(row)
              }
            }
          }
        }
        val rows = new java.util.ArrayList[UnsafeRow](heap)
        rows.sort(ord)
        nKeys += 1
        outRows += rows.size()
        group = scala.jdk.CollectionConverters.ListHasAsScala(rows)
          .asScala.iterator
      }
      override def hasNext: Boolean = {
        while (!group.hasNext && runs.exists(_.hasNext)) refill()
        group.hasNext
      }
      override def next(): InternalRow = { hasNext; group.next() }
    }
  }
}

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
  * sees, capped at [[maxBufferedKeys]] heaps — past the cap the partial
  * phase streams rows through un-reduced and the final phase spills to
  * key-sorted disk runs (policy details on [[TopKBuffer]]).
  *
  * Columnar input (a non-goal, deliberately): the operator consumes rows.
  * Vectorized parquet batches still reach it efficiently because the
  * ColumnarToRow transition Spark inserts is itself a codegen producer —
  * the scan's column batches are decoded inside the SAME generated stage
  * whose loop feeds [[TopKBuffer.add]], so there is no materialized row
  * boundary to remove. A columnar `add` path would buy nothing (admission
  * is one comparison per row against a heap root — inherently row-at-a-
  * time) and would cost the codegen fusion below.
  *
  * Whole-stage codegen: the exec participates as a BLOCKING codegen
  * consumer (SortExec's shape — `BlockingOperatorWithCodegen`): the child
  * stage's generated loop feeds [[TopKBuffer.add]] directly, so the
  * scan→project→partial pipeline below the exchange and the final→transform
  * pipeline above it each fuse into ONE generated stage instead of breaking
  * at the operator boundary. Under codegen both phases use the spill
  * overflow policy (a blocking operator cannot stream pass-through rows
  * mid-consume); the interpreted fallback path keeps the cheaper
  * pass-through policy for the partial phase.
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
    extends UnaryExecNode with BlockingOperatorWithCodegen {
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
        .createMetric(sparkContext, "rows passed through un-reduced (partial map full)"),
      "numSpilledRuns" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "heap-map flushes to disk (key cap overflow)"))

    /** Per-task state factory — called from the generated class's
      * constructor (one generated-class instance per partition), and from
      * [[doExecute]]'s mapPartitions. `passThrough` only in the
      * interpreted partial phase; see [[TopKBuffer]]. */
    def createBuffer(passThrough: Boolean): TopKBuffer =
      new TopKBuffer(k, maxBufferedKeys, passThrough, keys, order, child.output,
        longMetric("numOutputRows"), longMetric("numKeys"),
        longMetric("passThroughRows"), longMetric("numSpilledRuns"))

    // ---- whole-stage codegen (blocking consumer, SortExec's shape) ----

    override def inputRDDs(): Seq[RDD[InternalRow]] =
      child.asInstanceOf[CodegenSupport].inputRDDs()

    // set in doProduce, read in doConsume (same generated class)
    private var bufferVarName: String = _

    override protected def doProduce(ctx: CodegenContext): String = {
      val needToProcess = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN,
        "topKNeedsInput", v => s"$v = true;")
      val thisPlan = ctx.addReferenceObj("topKPlan", this)
      bufferVarName = ctx.addMutableState(classOf[TopKBuffer].getName, "topKBuffer",
        v => s"$v = $thisPlan.createBuffer(false);", forceInline = true)
      val outputIter = ctx.addMutableState("scala.collection.Iterator",
        "topKOutput", forceInline = true)
      val addToBuffer = ctx.freshName("addToTopK")
      val addToBufferFunc = ctx.addNewFunction(addToBuffer,
        s"""
           |private void $addToBuffer() throws java.io.IOException {
           |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
           |}
         """.stripMargin.trim, inlineToOuterClass = true)
      val outputRow = ctx.freshName("topKOutputRow")
      s"""
         |if ($needToProcess) {
         |  $addToBufferFunc();
         |  $needToProcess = false;
         |  $outputIter = $bufferVarName.finish();
         |}
         |while ($limitNotReachedCond $outputIter.hasNext()) {
         |  UnsafeRow $outputRow = (UnsafeRow) $outputIter.next();
         |  ${consume(ctx, null, outputRow)}
         |  if (shouldStop()) return;
         |}
       """.stripMargin
    }

    override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
        row: ExprCode): String =
      s"""
         |${row.code}
         |$bufferVarName.add((UnsafeRow) ${row.value});
       """.stripMargin

    // ---- interpreted fallback (codegen disabled or compile fallback) ----

    override protected def doExecute(): RDD[InternalRow] = {
      val isPartial = partial
      child.execute().mapPartitions { it =>
        val buf = createBuffer(passThrough = isPartial)
        // pass-through rows stream out as encountered; `++` is lazy, so the
        // heap/merge leg only materializes after all admissions are done
        it.flatMap(row => Option(buf.add(row))) ++ new Iterator[InternalRow] {
          private lazy val inner: Iterator[InternalRow] = buf.finish()
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

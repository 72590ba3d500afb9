package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: top-k rows per key without a
  * per-partition sort.
  *
  * Spark's own route for `row_number() OVER (PARTITION BY key ORDER BY
  * v) <= k` is WindowGroupLimit, which still SORTS every partition
  * (O(n log n) in partition size) before truncating groups. This
  * operator keeps a bounded heap per key instead — O(n log k) with
  * k-bounded memory — and runs in two phases like an aggregate:
  * a partial pass on map-side partitions (no distribution requirement,
  * so it reduces each partition to ≤k rows per key BEFORE the
  * exchange), then a final pass under ClusteredDistribution(keys),
  * where EnsureRequirements inserts the single hash exchange. At 100 TB
  * the shuffle therefore carries at most k·keys·partitions rows rather
  * than the full scan.
  *
  * The analogous dedicated-TopN design appears in stream/OLAP engines
  * (e.g. Flink's RankOperator, Trino's TopNRowNumberOperator); the
  * reference has no per-key limit operator at all, so this covers the
  * serving-layer "top events per window" reads
  * (`/root/reference/services/cache/src/api/routes.py` zset reads) with
  * engine-native semantics.
  *
  * Ties: callers must pass a TOTAL order (tiebreak on a unique column),
  * otherwise which of the tied rows survives is nondeterministic —
  * same contract as LIMIT.
  */
case class TopKPerKeyPlan(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  // empty keys would reach physical planning as ClusteredDistribution(Nil)
  // and die there with an obscure internal error; fail at construction
  require(partitionExprs.nonEmpty,
    "TopKPerKey needs at least one key column (for a global top-k, sort + limit)")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Physical top-k-per-key: one bounded heap per key per partition.
  * `finalPhase=false` runs anywhere (map-side); `finalPhase=true`
  * demands co-location by key. */
case class TopKPerKeyExec(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    finalPhase: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (finalPhase) "TopKPerKeyFinal" else "TopKPerKeyPartial"
  override def requiredChildDistribution: Seq[Distribution] =
    if (finalPhase) ClusteredDistribution(partitionExprs) :: Nil
    else UnspecifiedDistribution :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val (keys, ord, limit) = (partitionExprs, order, k)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keys, schema)
      val lt: Ordering[InternalRow] = RowOrdering.create(ord, schema)
      // heap head = worst retained row (reverse of the sort order), so
      // admission is a single compare against the head
      val worstFirst = lt.reverse
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (lt.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.asScala.iterator.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerKeyPlan → partial + final exec pair. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, finalPhase = true,
        TopKPerKeyExec(keys, order, k, finalPhase = false, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API. Self-registers the strategy on the session
  * (`spark.experimental.extraStrategies` — the public extension point
  * that works on an already-built session; builder-time registration
  * also available through [[graft.functions.GraftExtensions]]). */
object TopK {
  private def ensureStrategy(df: DataFrame): Unit = {
    val exp = df.sparkSession.experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
  }

  /** Top `k` rows of `df` per distinct value of `keyCols`, "top" =
    * first in `orderCols` order (pass `col.desc`/`col.asc`; include a
    * unique tiebreak for determinism). */
  def perKey(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    ensureStrategy(df)
    val keys = keyCols.map(GraftColumnBridge.toExpr)
    // rebuild SortOrder nodes from scratch: the Column→Expression
    // converter tags them with the source column node (holds the
    // non-serializable internal SortOrder.NullsLast), and TreeNode tags
    // would ride into the task closure
    val order = orderCols.map(c => GraftColumnBridge.toExpr(c) match {
      case so: SortOrder => SortOrder(so.child, so.direction, so.nullOrdering, Nil)
      case e             => SortOrder(e, Ascending)
    })
    GraftColumnBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(keys, order, k, df.queryExecution.analyzed))
  }
}

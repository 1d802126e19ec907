package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.execution.SparkStrategy

/** Top-K rows per key as a first-class operator.
  *
  * The DataFrame idiom — `row_number() over (partition by k order by
  * v) <= K` — SORTS every partition completely: at 100 TB with
  * millions of rows per key that is an O(n log n) sort plus full
  * materialization per key, to keep K rows. This operator keeps a
  * bounded K-element heap per key instead: O(n log K), constant
  * memory per key, no sort buffer spills.
  *
  * Full custom-operator route (SURVEY §3 preference (c)): logical
  * node → planner strategy → physical node whose
  * `requiredChildDistribution` lets Spark insert the one keyed
  * exchange; the heap fold runs inside each post-shuffle partition.
  * Registered through [[graft.GraftExtensions]]-style injection (see
  * [[TopKPerKey.register]]) or used directly via [[TopKPerKey.apply]].
  */
object TopKPerKey {

  final case class TopKPerKeyNode(
      child: LogicalPlan,
      keys: Seq[Expression],
      order: SortOrder,
      k: Int) extends UnaryNode {
    override def output: Seq[Attribute] = child.output
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
      copy(child = newChild)
  }

  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKeyNode(child, keys, order, k) =>
        TopKPerKeyExec(planLater(child), keys, order, k) :: Nil
      case _ => Nil
    }
  }

  def register(e: SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => TopKStrategy)

  /** Column-API entry: top `k` rows per `keyCols` by the double
    * column `orderCol`, descending.
    */
  def apply(df: DataFrame, keyCols: Seq[String], orderCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val lp = org.apache.spark.sql.graftbridge.analyzedPlan(df)
    val keyExprs = keyCols.map(c => lp.output.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(s"no column $c")))
    val ordExpr = lp.output.find(_.name == orderCol).getOrElse(
      throw new IllegalArgumentException(s"no column $orderCol"))
    require(ordExpr.dataType == org.apache.spark.sql.types.DoubleType,
      s"orderCol must be double, got ${ordExpr.dataType}")
    val node = TopKPerKeyNode(lp, keyExprs,
      SortOrder(ordExpr, org.apache.spark.sql.catalyst.expressions.Descending), k)
    org.apache.spark.sql.graftbridge.ofRows(spark, node)
  }

  private def ensureRegistered(spark: SparkSession): Unit = {
    // experimental.extraStrategies is consulted at every planning, so
    // registration works on an already-built session (unlike
    // SparkSessionExtensions, which bind at sessionState creation)
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
  }
}

final case class TopKPerKeyExec(
    child: SparkPlan,
    keys: Seq[Expression],
    order: SortOrder,
    k: Int) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // ONE keyed exchange, inserted by Spark to satisfy this:
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val ordExpr = order.child
    val kLocal = k
    val descending = order.direction == org.apache.spark.sql.catalyst.expressions.Descending
    child.execute().mapPartitions({ it =>
      // generated projections must be instantiated on the executor
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordProj = UnsafeProjection.create(Seq(ordExpr), childOutput)
      val k = kLocal
      val sign = if (descending) 1 else -1
      // bounded heap per key: O(n log K) time, O(#keys × K) memory
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[(Double, InternalRow)]]()
      val cmp = new java.util.Comparator[(Double, InternalRow)] {
        override def compare(a: (Double, InternalRow), b: (Double, InternalRow)): Int =
          sign * java.lang.Double.compare(a._1, b._1) // heap root = next eviction
      }
      it.foreach { row =>
        val ordRow = ordProj(row)
        if (!ordRow.isNullAt(0)) { // null order values are excluded
        val key = keyProj(row).copy()
        val ord = ordRow.getDouble(0)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[(Double, InternalRow)](k + 1, cmp)
          heaps.put(key, heap)
        }
        if (heap.size < k) heap.add((ord, row.copy()))
        else if (cmp.compare((ord, null), heap.peek()) > 0) {
          heap.poll(); heap.add((ord, row.copy()))
        }
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.forEach { (_, heap) =>
        // emit in descending order per key
        val arr = new Array[(Double, InternalRow)](heap.size)
        var i = arr.length - 1
        while (heap.size > 0) { arr(i) = heap.poll(); i -= 1 }
        arr.foreach(t => out += t._2)
      }
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

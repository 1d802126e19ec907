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
  * The order is a LEXICOGRAPHIC sequence of orderable columns, each
  * with its own direction (compared through a codegen'd
  * `GenerateOrdering`, so strings/decimals/longs order natively —
  * no lossy cast to double): a caller whose primary value can
  * collide at scale supplies a unique second column (e.g. the row
  * id) so the selection is totally ordered — without it, which of
  * two order-equal boundary rows survives depends on partition
  * iteration order.
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
      orders: Seq[SortOrder],
      k: Int) extends UnaryNode {
    // the exec builds a GenerateOrdering over the order expressions:
    // a non-orderable type (map, non-orderable UDT) would fail at
    // codegen time on an executor. Enforced HERE so a directly-built
    // node (the strategy is publicly registered) fails at plan time
    // instead, as safe as the Column API.
    require(k >= 1, s"top-k requires k >= 1, got $k")
    orders.foreach(o => require(
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(o.child.dataType),
      s"top-k order expression must be orderable, got ${o.child.dataType}"))
    override def output: Seq[Attribute] = child.output
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
      copy(child = newChild)
  }

  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKeyNode(child, keys, orders, k) =>
        TopKPerKeyExec(planLater(child), keys, orders, k) :: Nil
      case _ => Nil
    }
  }

  def register(e: SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => TopKStrategy)

  /** Column-API entry: top `k` rows per `keyCols` by the column
    * `orderCol` (descending), with an optional second column
    * breaking order ties (also descending — negate a numeric, or use
    * [[ordered]], for ascending). Rows with a NULL order or tiebreak
    * value are EXCLUDED (no total order for them) — unlike a
    * nulls-last row_number window, which would keep them when the
    * group has fewer than k non-null rows.
    */
  def apply(df: DataFrame, keyCols: Seq[String], orderCol: String, k: Int,
      tiebreakCol: Option[String] = None): DataFrame =
    ordered(df, keyCols, (orderCol +: tiebreakCol.toSeq).map(c => (c, false)), k)

  /** General form: `orderSpec` is (column, ascending?) lexicographic,
    * each column any orderable type (string/decimal/long compare
    * natively — no cast to double). Same null-exclusion contract as
    * [[apply]].
    */
  def ordered(df: DataFrame, keyCols: Seq[String],
      orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val lp = org.apache.spark.sql.graftbridge.analyzedPlan(df)
    // exact-name resolution, but AMBIGUITY is an error: a post-join
    // frame carrying two attributes with one name must not silently
    // rank by whichever side came first
    def resolve(c: String): Attribute = {
      val hits = lp.output.filter(_.name == c)
      require(hits.nonEmpty, s"no column $c")
      require(hits.length == 1,
        s"ambiguous column $c (${hits.length} attributes share the name)")
      hits.head
    }
    val keyExprs = keyCols.map(resolve)
    val ordExprs = orderSpec.map { case (c, asc) =>
      SortOrder(resolve(c),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    val node = TopKPerKeyNode(lp, keyExprs, ordExprs, k)
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
    orders: Seq[SortOrder],
    k: Int) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // ONE keyed exchange, inserted by Spark to satisfy this:
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  // the heap filters rows WITHIN partitions — the child's keyed
  // partitioning survives, and declaring it lets a downstream
  // same-key window/agg ride this exchange instead of adding its own
  // (default is UnknownPartitioning: cur_temperature_mix's survivor
  // re-rank was paying a second (source) exchange for nothing)
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val ordExprs = orders.map(_.child)
    val kLocal = k
    // the heap compares PROJECTED order rows (evaluated once per
    // input row), not the input rows, so the generated ordering
    // binds to positional refs over the projection's layout — each
    // SortOrder keeps its own direction and native type comparison
    val boundOrders = orders.zipWithIndex.map { case (o, i) =>
      o.copy(child = org.apache.spark.sql.catalyst.expressions.BoundReference(
        i, o.child.dataType, nullable = false))
    }
    child.execute().mapPartitions({ it =>
      // generated projections/orderings must be instantiated on the executor
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordProj = UnsafeProjection.create(ordExprs, childOutput)
      val ordering: java.util.Comparator[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
          .generate(boundOrders)
      val k = kLocal
      val nOrd = ordExprs.length
      // bounded heap per key: O(n log K) time, O(#keys × K) memory
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[(UnsafeRow, InternalRow)]]()
      // heap root = next eviction = the kept row that sorts LAST, so
      // the heap's "least" is the reverse of the sort order
      val cmp = new java.util.Comparator[(UnsafeRow, InternalRow)] {
        override def compare(a: (UnsafeRow, InternalRow), b: (UnsafeRow, InternalRow)): Int =
          ordering.compare(b._1, a._1)
      }
      it.foreach { row =>
        val ordRow = ordProj(row)
        // rows with ANY null order value are excluded (no total order)
        var anyNull = false
        var j = 0
        while (j < nOrd) { if (ordRow.isNullAt(j)) anyNull = true; j += 1 }
        if (!anyNull) {
          // probe with the projection's REUSED row (UnsafeRow
          // equality is content-based); copy the key only when a new
          // heap is created — the common case at scale is a row
          // losing to a full heap, which allocates nothing (the
          // reused ordRow is compared against the root in place)
          val probe = keyProj(row)
          var heap = heaps.get(probe)
          if (heap == null) {
            heap = new java.util.PriorityQueue[(UnsafeRow, InternalRow)](k + 1, cmp)
            heaps.put(probe.copy(), heap)
          }
          if (heap.size < k) heap.add((ordRow.copy(), row.copy()))
          else if (ordering.compare(ordRow, heap.peek()._1) < 0) {
            heap.poll(); heap.add((ordRow.copy(), row.copy()))
          }
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.forEach { (_, heap) =>
        // emit per key in sort order (best first)
        val arr = new Array[(UnsafeRow, InternalRow)](heap.size)
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

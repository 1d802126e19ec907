package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Line(l_returnflag: String, l_quantity: Double)

class RelationalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.01"

  test("q27 approximate sketches land within tolerance of exact values") {
    val approx = SparkEntry.queries("q27_approx_sketch")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_orderkey")).as("o"),
        expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    exact.foreach { case (flag, (p, o, m)) =>
      val (ap, ao, am) = approx(flag)
      assert(math.abs(ap - p).toDouble / p < 0.1, s"$flag parts: $ap vs $p")
      assert(math.abs(ao - o).toDouble / o < 0.1, s"$flag orders: $ao vs $o")
      assert(math.abs(am - m) / m < 0.05, s"$flag median: $am vs $m")
    }
  }

  test("typed Dataset API: case-class encoder aggregation matches untyped") {
    import spark.implicits._
    val ds = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity").as[Line]
    val typedResult = ds.groupByKey(_.l_returnflag)
      .mapGroups((flag, it) => (flag, it.map(_.l_quantity).sum))
      .collect().toMap
    val untyped = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(sum("l_quantity")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    typedResult.foreach { case (flag, v) =>
      assert(math.abs(v - untyped(flag)) / untyped(flag) < 1e-9)
    }
  }
}

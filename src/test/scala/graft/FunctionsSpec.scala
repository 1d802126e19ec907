package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("cosine_sim native expression equals the HOF formulation") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    val self = emb.as("a").join(emb.as("b"),
      col("a.vec_id") === col("b.vec_id") - 1)
    val rows = self.select(
      graft.functions.cosine_sim(col("a.embedding"), col("b.embedding")).as("native"),
      operators.Similarity.cosineHof(col("a.embedding"), col("b.embedding")).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
        s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }

  test("cosine_sim: identical vector → 1.0, null → null, empty → 0.0") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    ).toDF("a", "b")
    val sims = df.select(graft.functions.cosine_sim($"a", $"b")).collect().map(_.getDouble(0))
    assert(math.abs(sims(0) - 1.0) < 1e-12)
    assert(math.abs(sims(1)) < 1e-12)
    val withNull = df.select(graft.functions.cosine_sim($"a", lit(null).cast("array<float>")))
      .collect()
    assert(withNull.forall(_.isNullAt(0)))
    val empty = Seq((Array.empty[Float], Array.empty[Float])).toDF("a", "b")
      .select(graft.functions.cosine_sim($"a", $"b")).collect()
    assert(empty.head.getDouble(0) == 0.0)
  }

  test("cosine_sim / dot_product accept array<double> and mixed widths") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0f, 2.0f, 3.0f))
    ).toDF("d", "f")
    // codegen path: double×float mixed, double×double, float×float all agree
    val r = df.select(
      graft.functions.dot_product($"d", $"f").as("mixed"),
      graft.functions.dot_product($"d", $"d").as("dd"),
      graft.functions.dot_product($"f", $"f").as("ff"),
      graft.functions.cosine_sim($"d", $"d").as("cd")).collect().head
    assert(r.getDouble(0) == 14.0 && r.getDouble(1) == 14.0 && r.getDouble(2) == 14.0)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
    // interpreted path agrees with codegen
    val expr = graft.functions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 0.0)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(0.0, 1.0)))
    assert(expr.eval(null).asInstanceOf[Double] == 0.0)
    // non-numeric arrays still rejected at analysis
    val bad = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Array("x"), Array("y"))).toDF("a", "b")
        .select(graft.functions.dot_product($"a", $"b")).collect()
    }
    assert(bad.getMessage.contains("array<float|double>"))
  }

  test("expressions stay inside WholeStageCodegen") {
    val emb = Tables.embeddings(spark, sf)
    val plan = emb.select(graft.functions.cosine_sim(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen span
    assert(plan.contains("*(1) Project [cosine_sim"), plan)
  }

  test("SQL registration via functionRegistry and GraftExtensions") {
    graft.functions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0f, 2.0f), array(1.0f, 2.0f)) AS c, " +
      "dot_product(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d").collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 11.0) < 1e-12)

    val ext = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // same JVM returns the active session; registration still applies
    assert(ext.sql("SELECT dot_product(array(1.0f), array(2.0f))").collect()
      .head.getDouble(0) == 2.0)
  }

  test("compress_ratio: codegen == interpreted, orders quality correctly") {
    import spark.implicits._
    graft.functions.register(spark)
    val prose = "the quick brown fox jumps over the lazy dog and keeps going with varied words"
    val boiler = "spam spam spam spam spam spam spam spam spam spam spam spam spam spam"
    val rows = Seq(("p", prose), ("b", boiler), ("e", "")).toDF("k", "t")
      .selectExpr("k", "compress_ratio(t) AS r").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // codegen path (selectExpr above) agrees with direct interpreted eval
    assert(math.abs(rows("p") -
      graft.functions.CompressRatio.ratio(
        org.apache.spark.unsafe.types.UTF8String.fromString(prose))) < 1e-12)
    assert(rows("b") < rows("p"), s"boilerplate ${rows("b")} !< prose ${rows("p")}")
    assert(rows("e") == 1.0) // empty-string convention
    assert(rows.values.forall(r => r > 0.0 && r < 2.0))
  }
}

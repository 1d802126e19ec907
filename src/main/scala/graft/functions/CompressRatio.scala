package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** compress_ratio(text): deflate(text).length / text.length as a
  * native codegen'd expression.
  *
  * Compressibility is a classic corpus-quality signal (highly
  * repetitive/boilerplate text compresses far below prose; random
  * noise doesn't compress at all), used by large-corpus filtering
  * pipelines alongside the Gopher-style repetition ratios. A Scala
  * UDF here would box every row and block codegen; this expression
  * stays inside whole-stage codegen and calls one static JVM
  * helper — java.util.zip, no external libraries.
  *
  * Empty strings report ratio 1.0 (incompressible by convention).
  */
case class CompressRatio(child: Expression)
    extends UnaryExpression {

  override def prettyName: String = "compress_ratio"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"compress_ratio needs a string column, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    CompressRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressRatio.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): CompressRatio =
    copy(child = newChild)
}

object CompressRatio {
  // one Deflater per executor thread, reset() between rows: allocating
  // (and ending) a native zlib stream per row was the dominant cost on
  // this hot path. Dead-thread reclamation needs no custom holder:
  // since JDK 12, Deflater registers its OWN Cleaner that ends the
  // native stream once the object is unreachable (Spark 4 requires
  // JDK 17+), so a dead streaming thread's collected ThreadLocal
  // entry releases its zlib stream at the next GC — live streams stay
  // ∝ live threads.
  private val deflaters =
    ThreadLocal.withInitial[java.util.zip.Deflater](
      () => new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true))

  /** static entry for both interpreted eval and generated code */
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](256)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }
}

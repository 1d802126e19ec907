package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** word_lane_hashes(words): the per-WORD two-lane hash table feeding
  * the hashed n-gram key stream — struct<a: array<bigint>,
  * b: array<bigint>> where a[i] = xxhash64(words[i]) and
  * b[i] = xxhash64(1L, words[i]), bit-equal to the builtin xxhash64
  * forms (the spec pins equality).
  *
  * This replaces an interpreted `transform` building an array of
  * per-word STRUCTS: higher-order functions are CodegenFallback, so
  * every word cost a boxed struct allocation in interpreted code.
  * Here one static call inside whole-stage codegen hashes each
  * word's bytes exactly twice into two primitive long arrays
  * (UnsafeArrayData.fromPrimitiveArray — no element boxing). The
  * per-POSITION gram mixes stay in the caller as builtin xxhash64
  * over array reads (codegen'd, allocation-free per row); returning
  * ready-made per-position keys was tried and is SLOWER — it
  * allocates a row per gram position, and positions ≈ token count.
  */
case class WordLaneHashes(child: Expression) extends UnaryExpression {

  override def prettyName: String = "word_lane_hashes"

  private val laneType = ArrayType(LongType, containsNull = false)

  override def dataType: DataType = StructType(Seq(
    StructField("a", laneType, nullable = false),
    StructField("b", laneType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    GramHash.laneHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramHash.laneHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): WordLaneHashes =
    copy(child = newChild)
}

object GramHash {

  /** xxhash64's default seed in Spark (`xxhash64(...)` builtin). */
  private val Seed = 42L

  /** static entry for both interpreted eval and generated code */
  def laneHashes(words: ArrayData): InternalRow = {
    val m = words.numElements()
    // lane b seeds its word hash with xxhash64's fold of the literal
    // 1L (the builtin hashes children sequentially, each output the
    // next child's seed); a null word leaves the running seed
    // untouched, exactly like the builtin's null-skip
    val bSeed = XXH64.hashLong(1L, Seed)
    val a = new Array[Long](m)
    val b = new Array[Long](m)
    var i = 0
    while (i < m) {
      if (words.isNullAt(i)) { a(i) = Seed; b(i) = bSeed }
      else {
        val s = words.getUTF8String(i)
        a(i) = XXH64.hashUTF8String(s, Seed)
        b(i) = XXH64.hashUTF8String(s, bSeed)
      }
      i += 1
    }
    InternalRow(
      UnsafeArrayData.fromPrimitiveArray(a),
      UnsafeArrayData.fromPrimitiveArray(b))
  }
}

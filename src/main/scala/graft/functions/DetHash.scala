package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hash fractions: the first 12 hex
  * digits of an md5 as an exact 48-bit binary fraction in [0,1).
  * Both the digit fold and the final division are EXACT in IEEE
  * doubles, so Spark and DuckDB produce bit-identical values — the
  * primitive behind all "pseudo-random but reproducible" decisions
  * (sampling, splits, KMV sketches) in this library.
  */
object DetHash {

  val HexScale = 281474976710656.0 // 16^12 = 2^48

  private def digitVal(c: Column): Column =
    when(ascii(c) <= 57, ascii(c) - 48).otherwise(ascii(c) - 87)

  /** Unsigned 48-bit fold of the first 12 hex digits — the exact
    * integer the fraction divides; exposed for integer-arithmetic
    * consumers (classifier weights) where double division would
    * reintroduce cross-engine rounding concerns.
    */
  def int48OfHex(h: Column): Column =
    (1 to 12).map { j =>
      digitVal(substring(h, j, 1)).cast("long") * lit(1L << (4 * (12 - j)))
    }.reduce(_ + _)

  /** Exact [0,1) fraction from a lowercase hex column (md5 output). */
  def fracOfHex(h: Column): Column =
    int48OfHex(h).cast("double") / lit(HexScale)

  /** Exact deterministic pseudo-uniform in [0,1) keyed on salt+key. */
  def frac(key: Column, salt: String): Column =
    fracOfHex(md5(concat(lit(salt), key.cast("string"))))

  /** DuckDB twin of [[int48OfHex]], reading a hex expression `h`. */
  def int48OfHexSql(h: String): String =
    (1 to 12).map { j =>
      s"CAST(CASE WHEN ascii(substr($h, $j, 1)) <= 57 THEN ascii(substr($h, $j, 1)) - 48" +
        s" ELSE ascii(substr($h, $j, 1)) - 87 END AS BIGINT) * ${1L << (4 * (12 - j))}"
    }.mkString("(", " + ", ")")

  /** DuckDB twin of [[fracOfHex]], reading a hex expression `h`. */
  def fracOfHexSql(h: String): String =
    s"(CAST(${int48OfHexSql(h)} AS DOUBLE) / $HexScale)"
}

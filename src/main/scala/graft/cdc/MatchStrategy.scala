package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `db.table` wildcard filtering — reference `src/mysql/mod.rs:21-90`.
  *
  * Semantics mirrored from the reference:
  *  - a bare `*` anywhere in the list means "match everything";
  *  - otherwise each pattern's `*` expands to `(.)*` and the whole
  *    `db.table` string must match one of the compiled regexes.
  *
  * Spark-first: compiled to a single `rlike` Column predicate so it
  * participates in predicate pushdown instead of being a driver-side
  * callback per event.
  */
object MatchStrategy {

  private val All = "*"
  private val MatchAny = "[\\s\\S]*"

  /** Build the combined anchored regex, or None for match-all. */
  def regex(databases: Seq[String], tables: Seq[String]): Option[String] = {
    val dbs = if (databases.isEmpty || databases.contains(All)) Seq(MatchAny)
              else databases.map(expand)
    val tbs = if (tables.isEmpty || tables.contains(All)) Seq(MatchAny)
              else tables.map(expand)
    if (dbs == Seq(MatchAny) && tbs == Seq(MatchAny)) None
    else Some("^(" + (for (d <- dbs; t <- tbs) yield s"$d\\.$t").mkString("|") + ")$")
  }

  // reference transform_expr: each `*` becomes `(.)*`, rest literal
  private def expand(pattern: String): String =
    pattern.replace(".", "\\.").replace("*", "(.)*")

  /** Predicate over a `db.table`-shaped column. */
  def matches(qualified: Column, databases: Seq[String], tables: Seq[String]): Column =
    regex(databases, tables) match {
      case None    => lit(true)
      case Some(r) => qualified.rlike(r)
    }

  /** Pushdown-friendly predicate over SEPARATE schema/table columns
    * (the shape the binlog DSv2 source exposes). The reference
    * filters events before its listener fires (rust-cdc
    * `src/mysql/mod.rs:21-90`, conn.rs:181-268); the Spark
    * equivalent is filtering before row materialization, which
    * requires source-pushable filters — `rlike` over a concat column
    * never pushes.
    *
    * Exact decomposition: the combined regex is the cartesian
    * product (d1|…).(t1|…), so `db.table` matches iff the db part
    * matches some database pattern AND the table part matches some
    * table pattern. Per pattern:
    *  - no `*`            → equality (an In filter once OR-merged)
    *  - single trailing `*` → startsWith (a StringStartsWith filter)
    *  - anything else      → per-column rlike residual (stays with
    *                         Spark, still correct, just not pushed)
    *
    * NULL semantics vs [[matches]]: this predicate is
    * row-subscription-oriented — with a match-all pattern list it is
    * `lit(true)` and ADMITS events whose schema/table columns are
    * NULL (XID, GTID, FORMAT_DESCRIPTION carry no table), whereas
    * `matches` over a `concat(db, '.', table)` column DROPS them
    * (concat of a NULL column nulls the whole string, and
    * NULL rlike r is never true). Callers substituting one API for
    * the other on a mixed event stream must add
    * `schemaCol.isNotNull && tableCol.isNotNull` (or the concat
    * form's coalesce) when parity with `matches` is required.
    */
  def matchesCols(
      schemaCol: Column, tableCol: Column,
      databases: Seq[String], tables: Seq[String]): Column = {
    def colPred(c: Column, patterns: Seq[String]): Column =
      if (patterns.isEmpty || patterns.contains(All)) lit(true)
      else {
        val (literals, rest) = patterns.distinct.partition(!_.contains("*"))
        val (prefixes, complex) = rest.partition(p =>
          p.indexOf('*') == p.length - 1) // exactly one '*', trailing
        val parts =
          (if (literals.nonEmpty) Seq(c.isin(literals.map(x => x: Any): _*)) else Nil) ++
          prefixes.map(p => c.startsWith(p.dropRight(1))) ++
          (if (complex.nonEmpty)
            Seq(c.rlike("^(" + complex.map(expand).mkString("|") + ")$"))
          else Nil)
        parts.reduce(_ || _)
      }
    colPred(schemaCol, databases) && colPred(tableCol, tables)
  }
}

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
}

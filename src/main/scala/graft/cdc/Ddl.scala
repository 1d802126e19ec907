package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** DDL propagation — reference `src/delta/mod.rs` handles sqlparser's
  * AlterTable {AddColumn, DropColumn, RenameColumn, RenameTable},
  * Drop and Truncate statements coming from binlog QUERY events.
  *
  * Two layers:
  *  - [[classify]]: a codegen-friendly Column expression (regexp on
  *    the statement text) used inside distributed plans — a billion
  *    QUERY events classify inside whole-stage codegen, no UDF.
  *  - [[parse]]: a precise driver-side parser for the schema-change
  *    path (schema evolution decisions happen once per DDL, on the
  *    driver, like the reference's handle_* fns).
  */
object Ddl {

  sealed trait Stmt { def table: String }
  final case class AddColumn(table: String, column: String) extends Stmt
  final case class DropColumn(table: String, column: String) extends Stmt
  final case class RenameColumn(table: String, from: String, to: String) extends Stmt
  final case class RenameTable(table: String, to: String) extends Stmt
  final case class DropTable(table: String) extends Stmt
  final case class TruncateTable(table: String) extends Stmt
  final case class Other(table: String) extends Stmt

  private val T = "(`[^`]+`|\\S+)" // table token: quoted or bare
  private val addCol     = ("(?i)^\\s*ALTER\\s+TABLE\\s+" + T + "\\s+ADD\\s+(?:COLUMN\\s+)?(\\w+).*$").r
  private val dropCol    = ("(?i)^\\s*ALTER\\s+TABLE\\s+" + T + "\\s+DROP\\s+(?:COLUMN\\s+)?(\\w+).*$").r
  private val renameCol  = ("(?i)^\\s*ALTER\\s+TABLE\\s+" + T + "\\s+RENAME\\s+COLUMN\\s+(\\w+)\\s+TO\\s+(\\w+).*$").r
  private val renameTbl  = ("(?i)^\\s*ALTER\\s+TABLE\\s+" + T + "\\s+RENAME\\s+TO\\s+" + T + ".*$").r
  private val dropTbl    = ("(?i)^\\s*DROP\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?" + T + ".*$").r
  private val truncTbl   = ("(?i)^\\s*TRUNCATE\\s+(?:TABLE\\s+)?" + T + ".*$").r

  def parse(sql: String): Stmt = sql match {
    case renameCol(t, from, to) => RenameColumn(t, from, to)
    case renameTbl(t, to)       => RenameTable(t, to)
    case addCol(t, c)           => AddColumn(t, c)
    case dropCol(t, c)          => DropColumn(t, c)
    case dropTbl(t)             => DropTable(t)
    case truncTbl(t)            => TruncateTable(t)
    case _                      => Other("")
  }

  /** Distributed classification: statement text → kind label.
    * Pure built-in expressions (upper/like) → stays in codegen.
    */
  def classify(stmt: Column): Column = {
    // anchored on the token AFTER the table name, so a table called
    // user_address cannot be misread as an ADD/DROP statement —
    // keeps classify consistent with Ddl.parse
    // table token: backtick-quoted (may contain spaces) or bare
    val alterTail = "(?i)^\\s*ALTER\\s+TABLE\\s+(?:`[^`]+`|\\S+)\\s+"
    when(stmt.rlike(alterTail + "RENAME\\s+COLUMN\\b"), "rename_column")
      .when(stmt.rlike(alterTail + "RENAME\\s+TO\\b"), "rename_table")
      .when(stmt.rlike(alterTail + "ADD\\b"), "add_column")
      .when(stmt.rlike(alterTail + "DROP\\b"), "drop_column")
      .when(stmt.rlike("(?i)^\\s*DROP\\s+TABLE\\b"), "drop_table")
      .when(stmt.rlike("(?i)^\\s*TRUNCATE\\b"), "truncate")
      .otherwise("other")
  }
}

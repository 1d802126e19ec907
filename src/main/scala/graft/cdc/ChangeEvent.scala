package graft.cdc

import java.sql.Timestamp

/** Canonical change-data-capture model.
  *
  * Mirrors the reference's change surface (rust-cdc
  * `src/delta/mod.rs:49-58` — `OpBody::{Add, Update(before,after),
  * Delete, Query}` wrapped in `Record::Mysql(file, pos, body)`) as a
  * flat, columnar-friendly event: one row per change with a total
  * per-source ordering given by (sourceFile, offset).
  *
  * Spark-first: the model is a case class so `Dataset[ChangeEvent]`
  * gets a codegen'd product Encoder; before/after images are kept as
  * JSON strings so schema evolution on the source never breaks the
  * changelog schema (the typed projection happens on read with
  * `from_json`, which Catalyst prunes to the queried fields).
  */
final case class ChangeEvent(
    table: String,
    op: String, // "c" insert | "u" update | "d" delete | "q" query/ddl
    key: String,
    sourceFile: String,
    offset: Long,
    ts: Timestamp,
    before: Option[String],
    after: Option[String])

object Op {
  val Insert = "c"
  val Update = "u"
  val Delete = "d"
  val Query = "q"
}

/** Committed source position — reference `snapshot/mod.rs:19-23`
  * `LogEntry { file_name, log_pos }`. Equality on (file, pos) only,
  * matching the reference's `PartialEq`, so idempotent re-commits of
  * the same position dedupe.
  */
final case class SourceOffset(sourceFile: String, offset: Long)

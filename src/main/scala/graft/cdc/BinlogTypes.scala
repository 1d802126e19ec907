package graft.cdc

import org.apache.spark.sql.types._

/** MySQL binlog column-type surface → Catalyst types.
  *
  * The reference decodes 31 wire types (rust-cdc
  * `src/mysql/event/mod.rs:370-460` `ColTypes::by_code`) into values
  * (`ColValues`, mod.rs:580-640). In a Spark-native engine the
  * equivalent contract is the mapping from those type codes to
  * Catalyst DataTypes — the schema a CDC source connector would
  * declare for `from_json`/row decoding.
  */
object BinlogTypes {

  /** type code (binlog TABLE_MAP column type byte) → Catalyst type */
  val byCode: Map[Int, DataType] = Map(
    0x00 -> DecimalType(10, 0), // DECIMAL (legacy)
    0x01 -> ByteType,           // TINY
    0x02 -> ShortType,          // SHORT
    0x03 -> IntegerType,        // LONG
    0x04 -> FloatType,          // FLOAT
    0x05 -> DoubleType,         // DOUBLE
    0x06 -> NullType,           // NULL
    0x07 -> TimestampType,      // TIMESTAMP
    0x08 -> LongType,           // LONGLONG
    0x09 -> IntegerType,        // INT24
    0x0a -> DateType,           // DATE
    0x0b -> StringType,         // TIME (no interval day-time in binlog semantics)
    0x0c -> TimestampNTZType,   // DATETIME
    0x0d -> ShortType,          // YEAR
    0x0e -> DateType,           // NEWDATE (internal)
    0x0f -> StringType,         // VARCHAR
    0x10 -> BinaryType,         // BIT
    0x11 -> TimestampType,      // TIMESTAMP2
    0x12 -> TimestampNTZType,   // DATETIME2
    0x13 -> StringType,         // TIME2
    0xf6 -> DecimalType(38, 18),// NEWDECIMAL (precision/scale from metadata)
    0xf7 -> StringType,         // ENUM
    0xf8 -> StringType,         // SET
    0xf9 -> BinaryType,         // TINY_BLOB
    0xfa -> BinaryType,         // MEDIUM_BLOB
    0xfb -> BinaryType,         // LONG_BLOB
    0xfc -> BinaryType,         // BLOB
    0xfd -> StringType,         // VAR_STRING
    0xfe -> StringType,         // STRING
    0xff -> BinaryType          // GEOMETRY (WKB bytes)
  )

  /** NEWDECIMAL with explicit metadata, like ColTypes::NewDecimal(p, s). */
  def newDecimal(precision: Int, scale: Int): DataType =
    DecimalType(precision, scale)

  /** The event-type surface the reference parses (README matrix /
    * `EventType`, mod.rs:259-370): hex code → name, parsed subset.
    */
  val parsedEvents: Map[Int, String] = Map(
    0x02 -> "QUERY_EVENT",
    0x04 -> "ROTATE_EVENT",
    0x05 -> "INTVAR_EVENT",
    0x0f -> "FORMAT_DESCRIPTION_EVENT",
    0x10 -> "XID_EVENT",
    0x11 -> "BEGIN_LOAD_QUERY_EVENT",
    0x12 -> "EXECUTE_LOAD_QUERY_EVENT",
    0x13 -> "TABLE_MAP_EVENT",
    0x1d -> "ROWS_QUERY_EVENT",
    0x1e -> "WRITE_ROWS_EVENTv2",
    0x1f -> "UPDATE_ROWS_EVENTv2",
    0x20 -> "DELETE_ROWS_EVENTv2",
    0x21 -> "GTID_EVENT",
    0x22 -> "ANONYMOUS_GTID_EVENT",
    0x23 -> "PREVIOUS_GTIDS_EVENT")
}

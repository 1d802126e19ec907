package graft.sources.binlog

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Deterministic MySQL binlog v4 file generator — the write side of
  * the public format [[BinlogParser]] reads. Used for round-trip
  * parser tests and for throughput benchmarking at realistic volumes
  * (the reference's headline workload is exactly this: parsing a
  * binlog event stream).
  *
  * Layout per file: magic, FORMAT_DESCRIPTION (no checksum), one
  * TABLE_MAP for `gen.gen (id INT, title VARCHAR(160))`, then
  * WRITE_ROWS_V2 events of `rowsPerEvent` rows each, one XID per
  * event. All timestamps fixed → byte-identical output across runs.
  */
object BinlogGen {

  val TableId = 77L
  private val Ts = 1700000000L // fixed
  private val ServerId = 1L

  /** Shared fixture-file scaffold: magic + FDE, then each emitted
    * event threaded through [[writeEvent]] position accounting. One
    * place to change if fixtures ever gain checksums/rotate events —
    * was EIGHT copies of the open/magic/FDE/close boilerplate.
    */
  private def withBinlog(path: String)(body: ((Int, Array[Byte]) => Unit) => Unit): Unit = {
    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    try {
      out.write(BinlogParser.Magic)
      var pos = 4L
      def emit(eventType: Int, eventBody: Array[Byte]): Unit =
        pos = writeEvent(out, pos, eventType, eventBody)
      emit(0x0f, fdeBody())
      body(emit)
    } finally out.close()
  }

  def writeFile(path: String, nRows: Int, rowsPerEvent: Int = 100): Unit = {
    withBinlog(path) { emit =>
      emit(0x13, tableMapBody())
      var written = 0
      var rowId = 1
      while (written < nRows) {
        val n = math.min(rowsPerEvent, nRows - written)
        emit(0x1e, writeRowsBody(rowId, n))
        emit(0x10, xidBody(rowId.toLong))
        rowId += n
        written += n
      }
    }
  }

  /** Latin1-charset table: `gen.latin (id INT, name VARCHAR(160)
    * CHARSET latin1)` — the TABLE_MAP carries a DEFAULT_CHARSET
    * optional-metadata block (collation 8 = latin1_swedish_ci) and
    * the row strings are latin1-ENCODED bytes, plus v0/v1 rows-event
    * headers for the named-skip path. Round-trip proves the parser
    * honors TABLE_MAP charset metadata instead of assuming UTF-8.
    */
  val Latin1TableId = 81L

  def writeCharsetFile(path: String, names: Seq[String]): Unit = {
    withBinlog(path) { emit =>
      emit(0x13,
        charsetTableMapBody(Latin1TableId, "latin", 8))
      emit(0x1e, charsetRowsBody(Latin1TableId, names,
        java.nio.charset.StandardCharsets.ISO_8859_1))
      // a v1 write-rows event against the same table — its row image
      // must decode through the shared v1|v2 path WITH the latin1
      // charset metadata applied (and surface as WRITE_ROWS_V1)
      emit(0x17, v1Body(Latin1TableId, update = false, Seq(
        rowImage(names.length + 1, "v1-æé",
          java.nio.charset.StandardCharsets.ISO_8859_1))))
      emit(0x10, xidBody(7L))
    }
  }

  /** CJK/UTF-family charset tables: `gen.gbk` (collation 28 =
    * gbk_chinese_ci, multibyte) and `gen.utf16` (collation 54 =
    * utf16_general_ci, fixed-width big-endian) — round-trip proof
    * that the parser's collation table covers the reference's
    * non-latin families (rust-cdc `src/mysql/collation.rs`), where
    * decoding as UTF-8 would produce mojibake.
    */
  val GbkTableId = 82L
  val Utf16TableId = 83L

  def writeCjkCharsetFile(
      path: String, gbkNames: Seq[String], utf16Names: Seq[String]): Unit = {
    withBinlog(path) { emit =>
      emit(0x13, charsetTableMapBody(GbkTableId, "gbk", 28))
      emit(0x1e, charsetRowsBody(GbkTableId, gbkNames,
        java.nio.charset.Charset.forName("GBK")))
      // utf16 VARCHAR(160) has meta 640 (4 bytes/char max in MySQL):
      // > 255, so these rows carry the 2-byte value length prefix —
      // the branch every real multibyte production binlog exercises
      emit(0x13,
        charsetTableMapBody(Utf16TableId, "utf16", 54, maxLen = 640))
      emit(0x1e, charsetRowsBody(Utf16TableId, utf16Names,
        java.nio.charset.StandardCharsets.UTF_16BE, maxLen = 640))
      emit(0x10, xidBody(9L))
    }
  }

  /** TABLE_MAP for `gen.<table> (id INT, name VARCHAR)` whose
    * DEFAULT_CHARSET optional-metadata TLV carries `collationId`;
    * `maxLen` is the column's max BYTE length (the VARCHAR meta) —
    * above 255 it switches the rows to the protocol's 2-byte value
    * length prefix, the branch real multibyte charsets hit (a
    * VARCHAR(160) utf16 column has meta 640). */
  private def charsetTableMapBody(
      tableId: Long, tableName: String, collationId: Int,
      maxLen: Int = 160): Array[Byte] = {
    require(collationId < 251, "lenenc single-byte collation only")
    val schema = "gen".getBytes("UTF-8")
    val table = tableName.getBytes("UTF-8")
    // optional metadata TLV: DEFAULT_CHARSET(2), len 1, collation id
    val b = ByteBuffer.allocate(6 + 2 + 1 + schema.length + 1 + 1 + table.length + 1 +
      1 + 2 + 1 + 2 + 1 + 3).order(ByteOrder.LITTLE_ENDIAN)
    putU48(b, tableId)
    b.putShort(1) // flags
    b.put(schema.length.toByte); b.put(schema); b.put(0.toByte)
    b.put(table.length.toByte); b.put(table); b.put(0.toByte)
    b.put(2.toByte) // col count (lenenc, < 251)
    b.put(0x03.toByte); b.put(0x0f.toByte) // LONG, VARCHAR
    b.put(2.toByte) // meta block length (lenenc)
    b.putShort(maxLen.toShort) // VARCHAR max length u16 LE
    b.put(0.toByte) // nullability bitmap
    b.put(2.toByte) // TLV type: DEFAULT_CHARSET
    b.put(1.toByte) // TLV length (lenenc)
    b.put(collationId.toByte) // default collation (lenenc)
    b.array()
  }

  private def charsetRowsBody(
      tableId: Long, names: Seq[String],
      charset: java.nio.charset.Charset,
      maxLen: Int = 160): Array[Byte] = {
    // the value length prefix width follows the column's meta, the
    // same rule the parser applies: 2 bytes when maxLen > 255, else 1
    val wide = maxLen > 255
    val rows = names.zipWithIndex.map { case (name, i) =>
      val raw = name.getBytes(charset)
      require(raw.length <= maxLen,
        s"charset fixture name encodes to ${raw.length} bytes > VARCHAR($maxLen)")
      val r = ByteBuffer.allocate(1 + 4 + (if (wide) 2 else 1) + raw.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      r.put(0.toByte) // null bitmap: none null
      r.putInt(i + 1)
      if (wide) r.putShort(raw.length.toShort) else r.put(raw.length.toByte)
      r.put(raw)
      r.array()
    }
    val rowBytes = rows.map(_.length).sum
    val b = ByteBuffer.allocate(6 + 2 + 2 + 1 + 1 + rowBytes).order(ByteOrder.LITTLE_ENDIAN)
    putU48(b, tableId)
    b.putShort(1) // flags
    b.putShort(2) // extra data length (just itself)
    b.put(2.toByte) // col count lenenc
    b.put(0x03.toByte) // columns-present bitmap: both
    rows.foreach(b.put)
    b.array()
  }

  /** FDE + one USER_VAR event per (name, typed value); None = SQL
    * NULL. Mirrors the reference's UserVar event surface.
    */
  def writeUserVarFile(path: String, vars: Seq[(String, Option[Any])]): Unit = {
    withBinlog(path) { emit =>
      vars.foreach { case (name, v) =>
        emit(0x0e, userVarBody(name, v))
      }
    }
  }

  private def userVarBody(name: String, value: Option[Any]): Array[Byte] = {
    val n = name.getBytes("UTF-8")
    val payload: Array[Byte] = value match {
      case None => Array.empty
      case Some(s: String) => s.getBytes("UTF-8")
      case Some(d: Double) =>
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          .putLong(java.lang.Double.doubleToLongBits(d)).array()
      case Some(l: Long) =>
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(l).array()
      case Some(other) => sys.error(s"unsupported user var type: $other")
    }
    val vType = value match {
      case Some(_: String) => 0; case Some(_: Double) => 1; case _ => 2
    }
    val b = ByteBuffer.allocate(4 + n.length + 1 +
      (if (value.isEmpty) 0 else 1 + 4 + 4 + payload.length))
      .order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(n.length); b.put(n)
    b.put(if (value.isEmpty) 1.toByte else 0.toByte) // is_null
    if (value.nonEmpty) {
      b.put(vType.toByte)
      b.putInt(33) // charset (utf8mb3_general_ci)
      b.putInt(payload.length)
      b.put(payload)
    }
    b.array()
  }

  private def writeEvent(out: BufferedOutputStream, pos: Long, eventType: Int, body: Array[Byte]): Long = {
    val size = 19 + body.length
    val h = ByteBuffer.allocate(19).order(ByteOrder.LITTLE_ENDIAN)
    h.putInt(Ts.toInt)
    h.put(eventType.toByte)
    h.putInt(ServerId.toInt)
    h.putInt(size)
    h.putInt((pos + size).toInt) // log_pos = end of this event
    h.putShort(0)
    out.write(h.array())
    out.write(body)
    pos + size
  }

  private def fdeBody(): Array[Byte] = {
    val b = ByteBuffer.allocate(2 + 50 + 4 + 1 + 40).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(4) // binlog_version
    val ver = "8.0.99-graftgen".getBytes("UTF-8")
    b.put(ver); b.put(new Array[Byte](50 - ver.length)) // null-padded
    b.putInt(0) // create_timestamp
    b.put(19.toByte) // header length
    b.put(new Array[Byte](40)) // post-header lens + alg byte 0 (no CRC)
    b.array()
  }

  private def tableMapBody(): Array[Byte] = namedTableMapBody(TableId, "gen")

  /** `gen.<name> (id INT, title VARCHAR(160))` table map for an
    * arbitrary (tableId, name) — the multi-table routed stream emits
    * several of these interleaved, as a real server does. */
  private def namedTableMapBody(tableId: Long, name: String): Array[Byte] = {
    val schema = "gen".getBytes("UTF-8")
    val table = name.getBytes("UTF-8")
    val b = ByteBuffer.allocate(6 + 2 + 1 + schema.length + 1 + 1 + table.length + 1 +
      1 + 2 + 1 + 2 + 1).order(ByteOrder.LITTLE_ENDIAN)
    putU48(b, tableId)
    b.putShort(1) // flags
    b.put(schema.length.toByte); b.put(schema); b.put(0.toByte)
    b.put(table.length.toByte); b.put(table); b.put(0.toByte)
    b.put(2.toByte) // col count (lenenc, < 251)
    b.put(0x03.toByte); b.put(0x0f.toByte) // LONG, VARCHAR
    b.put(2.toByte) // meta block length (lenenc)
    b.putShort(160) // VARCHAR max length u16 LE
    b.put(0.toByte) // nullability bitmap
    b.array()
  }

  /** One `gen.gen`-shaped row image: null bitmap (none null), INT id,
    * 1-byte-length-prefixed string in `charset`. */
  private def rowImage(
      id: Int, title: String,
      charset: java.nio.charset.Charset =
        java.nio.charset.StandardCharsets.UTF_8): Array[Byte] = {
    val t = title.getBytes(charset)
    val r = ByteBuffer.allocate(1 + 4 + 1 + t.length).order(ByteOrder.LITTLE_ENDIAN)
    r.put(0.toByte) // null bitmap: none null
    r.putInt(id)
    r.put(t.length.toByte); r.put(t)
    r.array()
  }

  /** v1 rows-event body (0x17-0x19): the v2 body MINUS the extra-data
    * field. `images` are pre-built row images — for update (0x18)
    * pass them as (before, after) pairs flattened in order.
    */
  private def v1Body(
      tableId: Long, update: Boolean, images: Seq[Array[Byte]]): Array[Byte] = {
    val rowBytes = images.map(_.length).sum
    val b = ByteBuffer.allocate(6 + 2 + 1 + (if (update) 2 else 1) + rowBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    putU48(b, tableId)
    b.putShort(1) // flags
    b.put(2.toByte) // col count lenenc
    b.put(0x03.toByte) // columns-present bitmap (image 1)
    if (update) b.put(0x03.toByte) // columns-present bitmap (image 2)
    images.foreach(b.put)
    b.array()
  }

  /** v1 twin of the [[writeFile]] stream: TABLE_MAP, then
    * WRITE/UPDATE/DELETE_ROWS **V1** over `gen.gen` with the same row
    * payload bytes the v2 writer emits — so a spec can pin that the
    * shared decode path yields byte-identical row images for both
    * versions (MariaDB 10.x / MySQL <=5.5 parity, reference
    * event/mod.rs:190-198).
    */
  def writeV1File(path: String, nRows: Int): Unit = {
    withBinlog(path) { emit =>
      emit(0x13, tableMapBody())
      emit(0x17, v1Body(TableId, update = false,
        (1 to nRows).map(i => rowImage(i, s"row-$i"))))
      emit(0x18, v1Body(TableId, update = true,
        (1 to nRows).flatMap(i =>
          Seq(rowImage(i, s"row-$i"), rowImage(i, s"upd-$i")))))
      emit(0x19, v1Body(TableId, update = false,
        (1 to nRows).map(i => rowImage(i, s"upd-$i"))))
      emit(0x10, xidBody(1L))
    }
  }

  /** v2 twin of [[writeV1File]]'s update/delete tail — same row
    * payloads through the v2 event types, for the v1 == v2 pin. */
  def writeV2TwinFile(path: String, nRows: Int): Unit = {
    withBinlog(path) { emit =>
      emit(0x13, tableMapBody())
      emit(0x1e, writeRowsBody(1, nRows))
      emit(0x1f, v2Body(TableId, update = true,
        (1 to nRows).flatMap(i =>
          Seq(rowImage(i, s"row-$i"), rowImage(i, s"upd-$i")))))
      emit(0x20, v2Body(TableId, update = false,
        (1 to nRows).map(i => rowImage(i, s"upd-$i"))))
      emit(0x10, xidBody(1L))
    }
  }

  /** v2 rows-event body from pre-built images (v1Body + extra-data). */
  private def v2Body(
      tableId: Long, update: Boolean, images: Seq[Array[Byte]]): Array[Byte] = {
    val rowBytes = images.map(_.length).sum
    val b = ByteBuffer.allocate(6 + 2 + 2 + 1 + (if (update) 2 else 1) + rowBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    putU48(b, tableId)
    b.putShort(1) // flags
    b.putShort(2) // extra data length (just itself)
    b.put(2.toByte) // col count lenenc
    b.put(0x03.toByte)
    if (update) b.put(0x03.toByte)
    images.foreach(b.put)
    b.array()
  }

  private def writeRowsBody(firstId: Int, n: Int): Array[Byte] =
    namedRowsBody(TableId, firstId, n)

  private def namedRowsBody(tableId: Long, firstId: Int, n: Int): Array[Byte] = {
    val rows = (0 until n).map(i => rowImage(firstId + i, s"row-${firstId + i}"))
    val rowBytes = rows.map(_.length).sum
    val b = ByteBuffer.allocate(6 + 2 + 2 + 1 + 1 + rowBytes).order(ByteOrder.LITTLE_ENDIAN)
    putU48(b, tableId)
    b.putShort(1) // flags
    b.putShort(2) // extra data length (just itself)
    b.put(2.toByte) // col count lenenc
    b.put(0x03.toByte) // columns-present bitmap: both (bits 0,1)
    rows.foreach(b.put)
    b.array()
  }

  /** Routed multi-table stream: `nTxns` transactions starting at
    * `firstTxn` (global index — rotation across files keeps the
    * round-robin phase), each touching ONE of `tables` round-robin:
    * TABLE_MAP + WRITE_ROWS_V2 + XID per transaction, the interleaved
    * shape a real server's binlog has when several tables commit
    * (rust-cdc routes these via table_maps + MatchStrategy,
    * src/mysql/conn.rs:181-268). Row ids are globally unique:
    * id = txn · rowsPerTxn + j, j in [1, rowsPerTxn].
    */
  def writeRoutedFile(
      path: String,
      tables: Seq[(Long, String)],
      firstTxn: Long,
      nTxns: Int,
      rowsPerTxn: Int): Unit = {
    withBinlog(path) { emit =>
      (0 until nTxns).foreach { t =>
        val txn = firstTxn + t
        val (tid, name) = tables((txn % tables.size).toInt)
        emit(0x13, namedTableMapBody(tid, name))
        emit(0x1e, namedRowsBody(tid, (txn * rowsPerTxn + 1).toInt, rowsPerTxn))
        emit(0x10, xidBody(txn + 1))
      }
    }
  }

  /** A second table exercising the metadata-bearing types: BIT(9),
    * ENUM (1-byte pack), SET (2-byte pack), DATE. One WRITE_ROWS
    * event with `n` rows.
    */
  val TypedTableId = 78L

  /** Control-event stream: rows, then HEARTBEAT (idle-master
    * keep-alive carrying log_ident), IGNORABLE, INCIDENT (possible
    * replica divergence: number + message), STOP — the reference's
    * control surface (rust-cdc `src/mysql/event/mod.rs:287,301-338`)
    * for the typed-row decode + DLQ-surfacing specs.
    */
  val HeartbeatIdent = "mysql-bin.000042"

  def writeControlFile(path: String, nRows: Int = 10): Unit = {
    withBinlog(path) { emit =>
      emit(0x13, tableMapBody())
      emit(0x1e, writeRowsBody(1, nRows))
      emit(0x10, xidBody(1L))
      emit(0x1b, HeartbeatIdent.getBytes("UTF-8"))
      emit(0x1c, Array.empty[Byte])
      emit(0x1a, incidentBody(1, "binlog gap on master"))
      emit(0x03, Array.empty[Byte])
    }
  }

  /** Replica-loop stream: per transaction, GTID(uuid:gno) +
    * TABLE_MAP + WRITE_ROWS_V2 (`rowsPerTxn` rows) + XID — with
    * xid == gno by construction, so transaction assembly and
    * GTID-resume skip agree on the transaction id. Row ids are
    * globally unique across files: txn `gno` covers ids
    * (gno-1)*rowsPerTxn+1 .. gno*rowsPerTxn.
    */
  def writeReplicaFile(
      path: String, firstGno: Long, nTxns: Int, rowsPerTxn: Int): Unit = {
    withBinlog(path) { emit =>
      (0 until nTxns).foreach { t =>
        val gno = firstGno + t
        emit(0x21, gtidBody(gno))
        emit(0x13, tableMapBody())
        val firstId = ((gno - 1) * rowsPerTxn + 1).toInt
        emit(0x1e, writeRowsBody(firstId, rowsPerTxn))
        emit(0x10, xidBody(gno))
      }
    }
  }

  private def gtidBody(gno: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(1 + 16 + 8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte) // commit flag
    b.put(new Array[Byte](15)); b.put(1.toByte) // sid ...0001
    b.putLong(gno)
    b.array()
  }

  private def incidentBody(num: Int, msg: String): Array[Byte] = {
    val m = msg.getBytes("UTF-8")
    val b = ByteBuffer.allocate(2 + 1 + m.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(num.toShort); b.put(m.length.toByte); b.put(m)
    b.array()
  }

  def writeTypedFile(path: String, n: Int): Unit = {
    withBinlog(path) { emit =>
      emit(0x13, typedTableMapBody())
      emit(0x1e, typedRowsBody(n))
      emit(0x10, xidBody(1L))
    }
  }

  private def typedTableMapBody(): Array[Byte] = {
    val schema = "gen".getBytes("UTF-8")
    val table = "typed".getBytes("UTF-8")
    // cols: INT(0x03), BIT(0x10, meta 1,1 → 9 bits), ENUM(0xfe, meta f7 01),
    //       SET(0xfe, meta f8 02), DATE(0x0a)
    val b = ByteBuffer.allocate(6 + 2 + 1 + schema.length + 1 + 1 + table.length + 1 +
      1 + 5 + 1 + 6 + 1).order(ByteOrder.LITTLE_ENDIAN)
    putU48(b, TypedTableId)
    b.putShort(1)
    b.put(schema.length.toByte); b.put(schema); b.put(0.toByte)
    b.put(table.length.toByte); b.put(table); b.put(0.toByte)
    b.put(5.toByte) // col count
    b.put(Array[Byte](0x03, 0x10, 0xfe.toByte, 0xfe.toByte, 0x0a))
    b.put(6.toByte) // meta block length
    b.put(1.toByte); b.put(1.toByte) // BIT(9): bits%8=1, bytes=1
    b.put(0xf7.toByte); b.put(1.toByte) // ENUM, 1-byte pack
    b.put(0xf8.toByte); b.put(2.toByte) // SET, 2-byte pack
    b.put(0.toByte) // nullability
    b.array()
  }

  private def typedRowsBody(n: Int): Array[Byte] = {
    val rows = (1 to n).map { i =>
      val r = ByteBuffer.allocate(1 + 4 + 2 + 1 + 2 + 3).order(ByteOrder.LITTLE_ENDIAN)
      r.put(0.toByte) // null bitmap
      r.putInt(i) // INT
      r.put(((i >> 8) & 1).toByte); r.put((i & 0xff).toByte) // BIT(9): 2 bytes
      r.put((1 + i % 3).toByte) // ENUM index
      r.putShort((i % 7).toShort) // SET bitmask (2 bytes LE)
      val (y, m, d) = (2024, 1 + i % 12, 1 + i % 28)
      val packed = d | (m << 5) | (y << 9)
      r.put((packed & 0xff).toByte)
      r.put(((packed >> 8) & 0xff).toByte)
      r.put(((packed >> 16) & 0xff).toByte)
      r.array()
    }
    val rowBytes = rows.map(_.length).sum
    val b = ByteBuffer.allocate(6 + 2 + 2 + 1 + 1 + rowBytes).order(ByteOrder.LITTLE_ENDIAN)
    putU48(b, TypedTableId)
    b.putShort(1)
    b.putShort(2)
    b.put(5.toByte)
    b.put(0x1f.toByte) // all 5 columns present
    rows.foreach(b.put)
    b.array()
  }

  /** A third table exercising the temporal2 fractional encodings,
    * blob-like JSON/GEOMETRY payloads, and the legacy temporal types:
    * INT, DATETIME2(3), TIMESTAMP2(2), TIME2(0), JSON, GEOMETRY,
    * legacy TIME, legacy DATETIME. Values fixed per row (id varies)
    * so the spec can assert exact decode output.
    */
  val TemporalTableId = 79L

  def writeTemporalFile(path: String, n: Int): Unit = {
    withBinlog(path) { emit =>
      emit(0x13, temporalTableMapBody())
      emit(0x1e, temporalRowsBody(n))
      emit(0x10, xidBody(1L))
    }
  }

  private def temporalTableMapBody(): Array[Byte] = {
    val schema = "gen".getBytes("UTF-8")
    val table = "temporal".getBytes("UTF-8")
    val b = ByteBuffer.allocate(6 + 2 + 1 + schema.length + 1 + 1 + table.length + 1 +
      1 + 10 + 1 + 5 + 2).order(ByteOrder.LITTLE_ENDIAN)
    putU48(b, TemporalTableId)
    b.putShort(1)
    b.put(schema.length.toByte); b.put(schema); b.put(0.toByte)
    b.put(table.length.toByte); b.put(table); b.put(0.toByte)
    b.put(10.toByte) // col count
    b.put(Array[Byte](0x03, 0x12, 0x11, 0x13, 0xf5.toByte, 0xff.toByte,
      0x0b, 0x0c, 0x0b, 0x0d))
    b.put(5.toByte) // meta block length
    b.put(3.toByte) // DATETIME2 fsp=3
    b.put(2.toByte) // TIMESTAMP2 fsp=2
    b.put(0.toByte) // TIME2 fsp=0
    b.put(4.toByte) // JSON: 4 length bytes
    b.put(4.toByte) // GEOMETRY: 4 length bytes
    b.put(0.toByte) // nullability
    b.array()
  }

  private def putBE(b: ByteBuffer, v: Long, nBytes: Int): Unit =
    ((nBytes - 1) to 0 by -1).foreach(i => b.put(((v >> (8 * i)) & 0xff).toByte))

  private def temporalRowsBody(n: Int): Array[Byte] = {
    // WKB point(1.0, 2.0): byte-order 01, type 1, x, y — 21 bytes
    val wkb = {
      val g = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
      g.put(1.toByte); g.putInt(1); g.putDouble(1.0); g.putDouble(2.0)
      g.array()
    }
    val json = Array[Byte](0x01, 0x02) // opaque JSONB payload
    val rows = (1 to n).map { i =>
      val r = ByteBuffer.allocate(2 + 4 + 7 + 5 + 3 + (4 + json.length) +
        (4 + wkb.length) + 3 + 8 + 3 + 1).order(ByteOrder.LITTLE_ENDIAN)
      r.put(0.toByte); r.put(0.toByte) // null bitmap (10 cols -> 2 bytes)
      r.putInt(i)
      // DATETIME2(3): 2024-01-02 03:04:05.678
      val ymd = (2024 * 13 + 1) << 5 | 2
      val hms = (3 << 12) | (4 << 6) | 5
      putBE(r, (ymd.toLong << 17 | hms) + 0x8000000000L, 5)
      putBE(r, 6780L, 2) // .678 s in 100µs units
      // TIMESTAMP2(2): epoch 1700000000, .25 s
      putBE(r, 1700000000L, 4)
      putBE(r, 25L, 1)
      // TIME2(0): 12:34:56
      putBE(r, ((12 << 12) | (34 << 6) | 56) + 0x800000L, 3)
      // JSON: 4-byte LE length + payload
      r.putInt(json.length); r.put(json)
      // GEOMETRY: 4-byte LE length + WKB
      r.putInt(wkb.length); r.put(wkb)
      // legacy TIME 09:34:56 → 93456 as 3-byte LE
      val t = 93456
      r.put((t & 0xff).toByte); r.put(((t >> 8) & 0xff).toByte); r.put(((t >> 16) & 0xff).toByte)
      // legacy DATETIME 2024-01-02 03:04:05 → 8-byte LE
      r.putLong(20240102030405L)
      // legacy TIME -01:00:00 → SIGNED -10000 as 3-byte two's complement
      val neg = -10000
      r.put((neg & 0xff).toByte); r.put(((neg >> 8) & 0xff).toByte)
      r.put(((neg >> 16) & 0xff).toByte)
      // YEAR zero value = the year 0000, NOT 1900
      r.put(0.toByte)
      r.array()
    }
    val rowBytes = rows.map(_.length).sum
    val b = ByteBuffer.allocate(6 + 2 + 2 + 1 + 2 + rowBytes).order(ByteOrder.LITTLE_ENDIAN)
    putU48(b, TemporalTableId)
    b.putShort(1)
    b.putShort(2)
    b.put(10.toByte)
    b.put(0xff.toByte); b.put(0x03.toByte) // all 10 columns present
    rows.foreach(b.put)
    b.array()
  }

  /** A fourth table exercising the NUMERIC/BLOB decode families the
    * typed/temporal fixtures skip: NEWDECIMAL(12,4) (packed BCD,
    * positive), FLOAT, DOUBLE, NEWDECIMAL(8,2) (crosses zero at
    * id=150, pinning the sign/inversion path), BLOB (2 length
    * bytes). Values are formula-of-row-id so the DuckDB oracle
    * re-derives every cell — a one-bit slip in the BCD group packing
    * or IEEE read is a hash mismatch, not a pin drift.
    */
  val NumericTableId = 80L

  def writeNumericFile(path: String, n: Int): Unit = {
    val rows = (1 to n).map { i =>
      val blob = s"blob-$i".getBytes("UTF-8")
      val r = ByteBuffer.allocate(4 + 6 + 4 + 8 + 4 + 2 + blob.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      r.putInt(i)
      r.put(decimalBytes(12, 4, i.toLong * 98765L + 4321L))
      r.putFloat(i + 0.5f)
      r.putDouble(i * 1024.0 + 0.125)
      r.put(decimalBytes(8, 2, 14975L - i.toLong * 100L))
      r.putShort(blob.length.toShort) // BLOB: 2 LE length bytes
      r.put(blob)
      r.array()
    }
    writeGenericFile(path, NumericTableId, "numeric",
      Array(0x03, 0xf6, 0x04, 0x05, 0xf6, 0xfc),
      Array[Byte](12, 4, /*float pack*/ 4, /*double pack*/ 8, 8, 2, 2),
      rows)
  }

  /** MySQL NEWDECIMAL wire encoding (single-group form, intg ≤ 9 and
    * scale ≤ 9 digits): big-endian int group then frac group, sign
    * as top-bit XOR on the first byte, negative values stored as the
    * bitwise complement of the magnitude — the exact inverse of the
    * parser's decodeDecimal (public packed-BCD layout).
    */
  private[graft] def decimalBytes(precision: Int, scale: Int, unscaled: Long): Array[Byte] = {
    val bytesForDigits = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)
    val intg = precision - scale
    require(intg <= 9 && scale <= 9, "generator supports single-group decimals")
    val neg = unscaled < 0
    val mag = math.abs(unscaled)
    val scale10 = (0 until scale).foldLeft(1L)((a, _) => a * 10)
    val ib = bytesForDigits(intg); val fb = bytesForDigits(scale)
    val out = new Array[Byte](ib + fb)
    var v = mag / scale10
    ((ib - 1) to 0 by -1).foreach { i => out(i) = (v & 0xff).toByte; v >>= 8 }
    var f = mag % scale10
    ((ib + fb - 1) to ib by -1).foreach { i => out(i) = (f & 0xff).toByte; f >>= 8 }
    if (neg) out.indices.foreach(i => out(i) = (~out(i)).toByte)
    out(0) = (out(0) ^ 0x80).toByte
    out
  }

  /** Fully parametric single-table file — the property-based
    * round-trip surface: arbitrary column types/metadata and
    * pre-encoded row values (concatenated wire bytes per row, no
    * null bitmap — the writer prepends an all-present, none-null
    * image header). One TABLE_MAP + one WRITE_ROWS_V2 + XID.
    */
  def writeGenericFile(
      path: String,
      tableId: Long,
      table: String,
      colTypes: Array[Int],
      metaBytes: Array[Byte],
      rowValues: Seq[Array[Byte]]): Unit = {
    withBinlog(path) { emit =>
      emit(0x13,
        genericTableMapBody(tableId, table, colTypes, metaBytes))
      emit(0x1e,
        genericRowsBody(tableId, colTypes.length, rowValues))
      emit(0x10, xidBody(1L))
    }
  }

  private def genericTableMapBody(
      tableId: Long, table: String,
      colTypes: Array[Int], metaBytes: Array[Byte]): Array[Byte] = {
    val schema = "gen".getBytes("UTF-8")
    val tbl = table.getBytes("UTF-8")
    val nCols = colTypes.length
    require(nCols < 251 && metaBytes.length < 251)
    val nullLen = (nCols + 7) / 8
    val b = ByteBuffer.allocate(6 + 2 + 1 + schema.length + 1 + 1 + tbl.length + 1 +
      1 + nCols + 1 + metaBytes.length + nullLen).order(ByteOrder.LITTLE_ENDIAN)
    putU48(b, tableId)
    b.putShort(1)
    b.put(schema.length.toByte); b.put(schema); b.put(0.toByte)
    b.put(tbl.length.toByte); b.put(tbl); b.put(0.toByte)
    b.put(nCols.toByte)
    colTypes.foreach(t => b.put(t.toByte))
    b.put(metaBytes.length.toByte)
    b.put(metaBytes)
    b.put(new Array[Byte](nullLen)) // nothing nullable
    b.array()
  }

  private def genericRowsBody(
      tableId: Long, nCols: Int, rowValues: Seq[Array[Byte]]): Array[Byte] = {
    val nullLen = (nCols + 7) / 8
    val rowBytes = rowValues.map(_.length + nullLen).sum
    val presentLen = (nCols + 7) / 8
    val b = ByteBuffer.allocate(6 + 2 + 2 + 1 + presentLen + rowBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    putU48(b, tableId)
    b.putShort(1)
    b.putShort(2) // extra data length (just itself)
    b.put(nCols.toByte) // col count lenenc (< 251)
    b.put(Array.fill(presentLen)(0xff.toByte)) // all columns present
    rowValues.foreach { v =>
      b.put(new Array[Byte](nullLen)) // null bitmap: none null
      b.put(v)
    }
    b.array()
  }

  /** JSON-column table: `gen.json (id INT, doc JSON)` — one
    * WRITE_ROWS_V2 with one row per doc, payloads encoded with the
    * [[jsonb]] encoder below. Round-trip surface for the parser's
    * JSONB → JSON text decode.
    */
  val JsonTableId = 84L

  def writeJsonFile(path: String, docs: Seq[Any]): Unit = {
    withBinlog(path) { emit =>
      emit(0x13, jsonTableMapBody())
      emit(0x1e, jsonRowsBody(docs))
      emit(0x10, xidBody(11L))
    }
  }

  private def jsonTableMapBody(): Array[Byte] = {
    val schema = "gen".getBytes("UTF-8")
    val table = "json".getBytes("UTF-8")
    val b = ByteBuffer.allocate(6 + 2 + 1 + schema.length + 1 + 1 + table.length + 1 +
      1 + 2 + 1 + 1 + 1).order(ByteOrder.LITTLE_ENDIAN)
    putU48(b, JsonTableId)
    b.putShort(1) // flags
    b.put(schema.length.toByte); b.put(schema); b.put(0.toByte)
    b.put(table.length.toByte); b.put(table); b.put(0.toByte)
    b.put(2.toByte) // col count
    b.put(0x03.toByte); b.put(0xf5.toByte) // LONG, JSON
    b.put(1.toByte) // meta block length
    b.put(2.toByte) // JSON: 2 length bytes
    b.put(0.toByte) // nullability
    b.array()
  }

  private def jsonRowsBody(docs: Seq[Any]): Array[Byte] = {
    val rows = docs.zipWithIndex.map { case (doc, i) =>
      val payload = jsonb(doc)
      val r = ByteBuffer.allocate(1 + 4 + 2 + payload.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      r.put(0.toByte) // null bitmap
      r.putInt(i + 1)
      r.putShort(payload.length.toShort) // 2-byte blob length
      r.put(payload)
      r.array()
    }
    val rowBytes = rows.map(_.length).sum
    val b = ByteBuffer.allocate(6 + 2 + 2 + 1 + 1 + rowBytes).order(ByteOrder.LITTLE_ENDIAN)
    putU48(b, JsonTableId)
    b.putShort(1)
    b.putShort(2)
    b.put(2.toByte)
    b.put(0x03.toByte)
    rows.foreach(b.put)
    b.array()
  }

  /** Minimal MySQL JSONB encoder (small format only) for fixture
    * payloads — the write side of [[Jsonb.decode]]. Accepts: null,
    * Boolean, Int (int16 when it fits, else int32), Long, Double,
    * String, scala.collection.Map[String, Any] (object, iteration
    * order preserved — pass a ListMap), Seq[Any] (array).
    * Independent of the decoder's internals; BinlogSpec additionally
    * pins hand-laid-out byte arrays so the pair can't share a
    * layout misunderstanding.
    */
  def jsonb(v: Any): Array[Byte] = {
    val (t, payload) = jsonbValue(v) match {
      case (tpe, Left(inline)) =>
        // top level has no value entry to inline into: literals and
        // small ints still carry their payload bytes directly
        val bs = tpe match {
          case 0x04 => Array(inline.toByte)
          case _ => Array((inline & 0xff).toByte, ((inline >> 8) & 0xff).toByte)
        }
        (tpe, bs)
      case (tpe, Right(bs)) => (tpe, bs)
    }
    t.toByte +: payload
  }

  /** value → (type, inlined-u16 | spilled bytes) */
  private def jsonbValue(v: Any): (Int, Either[Int, Array[Byte]]) = v match {
    case null => (0x04, Left(0))
    case b: Boolean => (0x04, Left(if (b) 1 else 2))
    case i: Int if i >= Short.MinValue && i <= Short.MaxValue =>
      (0x05, Left(i & 0xffff))
    case i: Int =>
      (0x07, Right(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(i).array()))
    case l: Long =>
      (0x09, Right(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(l).array()))
    case d: Double =>
      (0x0b, Right(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(java.lang.Double.doubleToLongBits(d)).array()))
    case s: String =>
      val raw = s.getBytes("UTF-8")
      (0x0c, Right(jsonbVarlen(raw.length) ++ raw))
    case m: scala.collection.Map[_, _] =>
      (0x00, Right(jsonbContainer(
        m.toSeq.map { case (k, x) => (k.toString, x) }, obj = true)))
    case s: Seq[_] =>
      (0x02, Right(jsonbContainer(s.map(("", _)), obj = false)))
    case other => sys.error(s"jsonb: unsupported fixture value $other")
  }

  private def jsonbVarlen(n: Int): Array[Byte] = {
    require(n >= 0)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var v = n
    while ({
      val b = v & 0x7f; v >>= 7
      out += (if (v > 0) (b | 0x80) else b).toByte
      v > 0
    }) ()
    out.toArray
  }

  /** Small-format object/array body (count through spilled values,
    * excluding the leading type byte). Offsets relative to count.
    */
  private def jsonbContainer(
      entries: Seq[(String, Any)], obj: Boolean): Array[Byte] = {
    val n = entries.size
    val keyBytes = entries.map(_._1.getBytes("UTF-8"))
    val vals = entries.map(e => jsonbValue(e._2))
    val headerLen = 4 + (if (obj) n * 4 else 0) + n * 3
    var off = headerLen
    val keyOffs = keyBytes.map { k => val o = off; off += k.length; o }
    val valOffs = vals.map {
      case (_, Left(_)) => -1
      case (_, Right(bs)) => val o = off; off += bs.length; o
    }
    val size = off
    require(size <= 0xffff && n <= 0xffff, "jsonb fixture too large for small format")
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(n.toShort); b.putShort(size.toShort)
    if (obj) keyBytes.zip(keyOffs).foreach { case (k, o) =>
      b.putShort(o.toShort); b.putShort(k.length.toShort)
    }
    vals.zip(valOffs).foreach {
      case ((tpe, Left(inline)), _) =>
        b.put(tpe.toByte); b.putShort(inline.toShort)
      case ((tpe, Right(_)), o) =>
        b.put(tpe.toByte); b.putShort(o.toShort)
    }
    keyBytes.foreach(b.put)
    vals.foreach { case (_, e) => e.foreach(b.put) }
    b.array()
  }

  private def xidBody(xid: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.putLong(xid)
    b.array()
  }

  private def putU48(b: ByteBuffer, v: Long): Unit = {
    b.putInt((v & 0xffffffffL).toInt)
    b.putShort(((v >> 32) & 0xffff).toShort)
  }
}

package graft.sources.mysql

import java.nio.{ByteBuffer, ByteOrder}
import java.security.MessageDigest

/** MySQL client/server wire protocol — the connection-phase codec of
  * the reference's replica transport, socketless. The reference
  * opens a TCP stream and performs: server Handshake decode →
  * HandshakeResponse41 (with auth scramble) → OK/ERR/AuthSwitch →
  * COM_BINLOG_DUMP, then reads the event stream (rust-cdc
  * `src/mysql/protocol/connect/handshake.rs:30-97`,
  * `handshake_response.rs:31-75`, `connection/auth.rs:73-126`,
  * `conn.rs:181-268`). This sandbox has no MySQL server and no
  * sockets worth faking — but every BYTE of that exchange is pure
  * computation, so the codec half lives here, clean-room from the
  * public protocol documentation (dev.mysql.com connection-phase
  * packets; the format notes mirrored in the reference's doc links):
  *
  *  - packet framing: 3-byte LE length + 1-byte sequence, 16 MB
  *    continuation chunking;
  *  - HandshakeV10 decode incl. split capability words, 8+13-byte
  *    split auth-plugin-data, CLIENT_MYSQL vs extended-capability
  *    tail;
  *  - HandshakeResponse41 encode (SSL-request prefix layout,
  *    lenenc vs length-prefixed auth response, optional database +
  *    plugin name);
  *  - mysql_native_password and caching_sha2_password scrambles
  *    (SHA1/SHA256 XOR constructions);
  *  - AuthSwitchRequest decode / AuthMoreData fast-auth results;
  *  - OK/ERR/EOF result decode;
  *  - COM_BINLOG_DUMP / COM_REGISTER_SLAVE command encode;
  *  - the COMMAND phase (conn.rs:367-460): COM_PING / COM_QUERY /
  *    COM_QUIT, SSLRequest, ColumnDefinition41 + text-resultset
  *    decode, and the `show master status` → COM_BINLOG_DUMP
  *    composition.
  *
  * A real deployment attaches these to a socket; graft's streaming
  * ingestion instead replays binlog FILES (the DSv2 source), which
  * is the part that scales on a cluster. The codec is exercised by
  * WireSpec fixtures and the cdc_wire_handshake inventory entry.
  */
object Wire {

  // ---- capability flags (protocol constants) -----------------------
  val ClientMysql = 1L // CLIENT_LONG_PASSWORD / CLIENT_MYSQL
  val ConnectWithDb = 1L << 3
  val Protocol41 = 1L << 9
  val Ssl = 1L << 11
  val SecureConnection = 1L << 15
  val PluginAuth = 1L << 19
  val PluginAuthLenencData = 1L << 21
  val DeprecateEof = 1L << 24

  final case class Handshake(
      protocolVersion: Int,
      serverVersion: String,
      connectionId: Long,
      capabilities: Long,
      collation: Int,
      status: Int,
      authPluginData: Array[Byte],
      authPlugin: Option[String])

  final case class Ok(affectedRows: Long, lastInsertId: Long, status: Int, warnings: Int)
  final case class Err(code: Int, sqlState: String, message: String)

  // ---- packet framing ----------------------------------------------

  val MaxChunk = 0xffffff

  /** Frame a payload into wire packets (3-byte LE length + seq id);
    * a payload of exactly n*16MB-1 gets a trailing empty packet per
    * the protocol's continuation rule.
    */
  def framePackets(payload: Array[Byte], firstSeq: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    var seq = firstSeq
    var continueChunking = true
    while (continueChunking) {
      val n = math.min(MaxChunk, payload.length - off)
      out.write(n & 0xff); out.write((n >> 8) & 0xff); out.write((n >> 16) & 0xff)
      out.write(seq & 0xff)
      out.write(payload, off, n)
      off += n
      seq += 1
      // a full 16 MB chunk REQUIRES a follow-up packet (possibly
      // empty) so the reader knows where the payload ends
      continueChunking = n == MaxChunk
    }
    out.toByteArray
  }

  /** Read one logical payload from `data` at `off`: follows 16 MB
    * continuation packets. Returns (payload, bytesConsumed, lastSeq).
    */
  def readPacket(data: Array[Byte], off: Int): (Array[Byte], Int, Int) = {
    val out = new java.io.ByteArrayOutputStream()
    var p = off
    var seq = -1
    var more = true
    while (more) {
      require(p + 4 <= data.length, "wire: truncated packet header")
      val len = (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8) | ((data(p + 2) & 0xff) << 16)
      seq = data(p + 3) & 0xff
      require(p + 4 + len <= data.length, "wire: truncated packet body")
      out.write(data, p + 4, len)
      p += 4 + len
      more = len == MaxChunk
    }
    (out.toByteArray, p - off, seq)
  }

  // ---- handshake ---------------------------------------------------

  /** Decode a HandshakeV10 server greeting payload. */
  def decodeHandshake(payload: Array[Byte]): Handshake = {
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val protocolVersion = b.get() & 0xff
    val serverVersion = readNulString(b)
    val connectionId = b.getInt.toLong & 0xffffffffL
    val auth1 = new Array[Byte](8); b.get(auth1)
    b.get() // filler
    var caps: Long = (b.getShort & 0xffff).toLong
    val collation = b.get() & 0xff
    val status = b.getShort & 0xffff
    caps |= ((b.getShort & 0xffff).toLong) << 16
    val authDataLen =
      if ((caps & PluginAuth) != 0) b.get() & 0xff
      else { b.get(); 0 }
    b.position(b.position() + 6) // reserved
    if ((caps & ClientMysql) != 0) b.position(b.position() + 4)
    else caps |= (b.getInt.toLong & 0xffffffffL) << 32
    val auth2 =
      if ((caps & SecureConnection) != 0) {
        val n = math.max(authDataLen - 9, 12)
        val a = new Array[Byte](n); b.get(a)
        b.get() // NUL
        a
      } else Array.empty[Byte]
    val plugin =
      if ((caps & PluginAuth) != 0) Some(readNulString(b)) else None
    Handshake(protocolVersion, serverVersion, connectionId, caps,
      collation, status, auth1 ++ auth2, plugin)
  }

  /** Encode a HandshakeV10 greeting (test-fixture/server side).
    * The nonce must be 8 bytes (pre-4.1 short form) or 20 bytes
    * (every modern server: 8 + 12-byte part 2 + NUL): the wire
    * format pads part 2 to a 13-byte minimum INCLUDING its NUL, so
    * a length between 9 and 19 cannot round-trip — the decoder's
    * spec-mandated `max(12, len-9)` part-2 read would swallow the
    * padding ambiguity into the nonce.
    */
  def encodeHandshake(h: Handshake): Array[Byte] = {
    // the nonce length is DICTATED by the capability bits, not free:
    // SECURE_CONNECTION carries part 2 (8 + 12 + NUL on the wire);
    // without it only the 8-byte part 1 exists — any other combo
    // encodes something decodeHandshake cannot round-trip
    val needLong = (h.capabilities & SecureConnection) != 0
    require(h.authPluginData.length == (if (needLong) 20 else 8),
      s"nonce must be ${if (needLong) 20 else 8} bytes for these " +
        "capabilities (SECURE_CONNECTION gates the 12+NUL part 2)")
    val out = new java.io.ByteArrayOutputStream()
    val b = new LeWriter(out)
    b.u8(h.protocolVersion)
    b.strNul(h.serverVersion)
    b.u32(h.connectionId)
    out.write(h.authPluginData, 0, 8)
    b.u8(0) // filler
    b.u16((h.capabilities & 0xffff).toInt)
    b.u8(h.collation)
    b.u16(h.status)
    b.u16(((h.capabilities >> 16) & 0xffff).toInt)
    if ((h.capabilities & PluginAuth) != 0) b.u8(h.authPluginData.length + 1)
    else b.u8(0)
    (0 until 6).foreach(_ => b.u8(0))
    if ((h.capabilities & ClientMysql) != 0) (0 until 4).foreach(_ => b.u8(0))
    else b.u32((h.capabilities >> 32) & 0xffffffffL)
    if ((h.capabilities & SecureConnection) != 0) {
      out.write(h.authPluginData, 8, h.authPluginData.length - 8)
      b.u8(0)
    }
    h.authPlugin.foreach(b.strNul)
    out.toByteArray
  }

  /** Encode HandshakeResponse41 — the client's answer carrying the
    * auth scramble. Mirrors the reference's layout decisions:
    * PLUGIN_AUTH is dropped when no plugin is named; the first half
    * is the SSL-request prefix (caps u32, max packet u32, collation,
    * 23 zero bytes).
    */
  def encodeHandshakeResponse(
      capabilities: Long,
      maxPacketSize: Long,
      collation: Int,
      username: String,
      authResponse: Array[Byte],
      database: Option[String],
      authPlugin: Option[String]): Array[Byte] = {
    val caps = if (authPlugin.isEmpty) capabilities & ~PluginAuth else capabilities
    val out = new java.io.ByteArrayOutputStream()
    val b = new LeWriter(out)
    b.u32(caps & 0xffffffffL)
    b.u32(maxPacketSize)
    b.u8(collation)
    (0 until 23).foreach(_ => b.u8(0))
    b.strNul(username)
    if ((caps & PluginAuthLenencData) != 0) {
      b.lenenc(authResponse.length)
      out.write(authResponse, 0, authResponse.length)
    } else if ((caps & SecureConnection) != 0) {
      b.u8(authResponse.length)
      out.write(authResponse, 0, authResponse.length)
    } else {
      // neither capability: the protocol's oldest layout is
      // auth-response as string<NUL> — the scramble still goes on
      // the wire, not an empty string. That layout carried the ASCII
      // scramble_323 and cannot express a binary scramble containing
      // 0x00 (a reader stops at the first NUL): reject instead of
      // sending nondeterministically-truncated credentials.
      require(!authResponse.contains(0: Byte),
        "wire: string<NUL> auth layout cannot carry a scramble with " +
          "an embedded 0x00 byte (server offers no length-prefixed form)")
      out.write(authResponse, 0, authResponse.length)
      b.u8(0)
    }
    if ((caps & ConnectWithDb) != 0) {
      database match {
        case Some(d) => b.strNul(d)
        case None => b.u8(0)
      }
    }
    if ((caps & PluginAuth) != 0) {
      authPlugin match {
        case Some(p) => b.strNul(p)
        case None => b.u8(0)
      }
    }
    out.toByteArray
  }

  // ---- auth scrambles ----------------------------------------------

  /** mysql_native_password:
    * SHA1(pw) XOR SHA1(nonce ++ SHA1(SHA1(pw))).
    */
  def scrambleNative(password: String, nonce: Array[Byte]): Array[Byte] = {
    val sha1 = MessageDigest.getInstance("SHA-1")
    val pwHash = sha1.digest(password.getBytes("UTF-8"))
    val pwHashHash = sha1.digest(pwHash)
    sha1.update(nonce)
    sha1.update(pwHashHash)
    xor(pwHash, sha1.digest())
  }

  /** caching_sha2_password fast path:
    * SHA256(pw) XOR SHA256(SHA256(SHA256(pw)) ++ nonce).
    * NOTE the argument order: the SHA256 variant concatenates the
    * digest-of-digest FIRST and the nonce second — the REVERSE of
    * mysql_native_password's SHA1 construction (nonce first). Every
    * canonical implementation (the server's scramble generator, the
    * major connectors) agrees on this order.
    */
  def scrambleCachingSha2(password: String, nonce: Array[Byte]): Array[Byte] = {
    val sha = MessageDigest.getInstance("SHA-256")
    val pwHash = sha.digest(password.getBytes("UTF-8"))
    val pwHashHash = sha.digest(pwHash)
    sha.update(pwHashHash)
    sha.update(nonce)
    xor(pwHash, sha.digest())
  }

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Array.tabulate(a.length)(i => (a(i) ^ b(i)).toByte)

  final case class AuthSwitch(plugin: String, nonce: Array[Byte])

  /** AuthSwitchRequest (0xfe + plugin name + 20-byte nonce + NUL). */
  def decodeAuthSwitch(payload: Array[Byte]): AuthSwitch = {
    require((payload(0) & 0xff) == 0xfe, "wire: not an AUTH_SWITCH packet")
    val b = ByteBuffer.wrap(payload, 1, payload.length - 1).order(ByteOrder.LITTLE_ENDIAN)
    val plugin = readNulString(b)
    require(b.remaining() == 21,
      s"wire: auth-switch nonce must be 20+NUL bytes, got ${b.remaining() - 1}")
    val nonce = new Array[Byte](20); b.get(nonce)
    AuthSwitch(plugin, nonce)
  }

  /** caching_sha2 fast-auth AuthMoreData result: 0x01 0x03 = OK,
    * 0x01 0x04 = full auth required.
    */
  def fastAuthOk(payload: Array[Byte]): Option[Boolean] =
    if (payload.length >= 2 && (payload(0) & 0xff) == 0x01) {
      (payload(1) & 0xff) match {
        case 0x03 => Some(true)
        case 0x04 => Some(false)
        case _ => None
      }
    } else None

  // ---- result packets ----------------------------------------------

  def isOk(payload: Array[Byte]): Boolean =
    payload.nonEmpty && (payload(0) & 0xff) == 0x00
  def isErr(payload: Array[Byte]): Boolean =
    payload.nonEmpty && (payload(0) & 0xff) == 0xff
  def isEof(payload: Array[Byte]): Boolean =
    payload.nonEmpty && (payload(0) & 0xff) == 0xfe && payload.length < 9

  def decodeOk(payload: Array[Byte]): Ok = {
    require(isOk(payload), "wire: not an OK packet")
    val b = ByteBuffer.wrap(payload, 1, payload.length - 1).order(ByteOrder.LITTLE_ENDIAN)
    val affected = readLenenc(b)
    val insertId = readLenenc(b)
    val status = b.getShort & 0xffff
    val warnings = if (b.remaining() >= 2) b.getShort & 0xffff else 0
    Ok(affected, insertId, status, warnings)
  }

  def decodeErr(payload: Array[Byte]): Err = {
    require(isErr(payload), "wire: not an ERR packet")
    val b = ByteBuffer.wrap(payload, 1, payload.length - 1).order(ByteOrder.LITTLE_ENDIAN)
    val code = b.getShort & 0xffff
    var state = ""
    if (b.remaining() > 0 && b.get(b.position()) == '#') {
      b.get() // marker
      val s = new Array[Byte](5); b.get(s)
      state = new String(s, "US-ASCII")
    }
    val msg = new Array[Byte](b.remaining()); b.get(msg)
    Err(code, state, new String(msg, "UTF-8"))
  }

  // ---- replication commands ----------------------------------------

  /** COM_BINLOG_DUMP (0x12): pos u32, flags u16(0), server_id u32,
    * filename (reference com_binlog_dump.rs:15-22).
    */
  def encodeComBinlogDump(binlogPos: Long, serverId: Long, filename: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val b = new LeWriter(out)
    b.u8(0x12)
    b.u32(binlogPos)
    b.u16(0)
    b.u32(serverId)
    val fn = filename.getBytes("UTF-8")
    out.write(fn, 0, fn.length)
    out.toByteArray
  }

  /** COM_REGISTER_SLAVE (0x15): announces this server_id as a
    * replica before requesting the dump.
    */
  def encodeComRegisterSlave(serverId: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val b = new LeWriter(out)
    b.u8(0x15)
    b.u32(serverId)
    b.u8(0) // hostname (empty lenenc-ish u8 lengths)
    b.u8(0) // user
    b.u8(0) // password
    b.u16(0) // port
    b.u32(0) // replication rank (unused)
    b.u32(0) // master id (unused)
    out.toByteArray
  }

  /** Compose the whole client side of the connection phase against a
    * server greeting: parse, pick the scramble for the advertised
    * plugin, build HandshakeResponse41. Returns (response payload,
    * chosen plugin). This IS the reference's establish() byte-work
    * with the socket factored out.
    */
  def connectionPhase(
      serverGreeting: Array[Byte],
      username: String,
      password: String,
      database: Option[String]): (Array[Byte], String) = {
    val hs = decodeHandshake(serverGreeting)
    val plugin = hs.authPlugin.getOrElse("mysql_native_password")
    val nonce = hs.authPluginData
    val scramble = plugin match {
      case "mysql_native_password" => scrambleNative(password, nonce)
      case "caching_sha2_password" => scrambleCachingSha2(password, nonce)
      case p => throw new IllegalArgumentException(s"wire: unsupported auth plugin $p")
    }
    val clientCaps = (Protocol41 | SecureConnection | PluginAuth |
      PluginAuthLenencData | ClientMysql |
      (if (database.isDefined) ConnectWithDb else 0L)) & hs.capabilities |
      Protocol41 // PROTOCOL_41 is mandatory for a 4.1+ response
    (encodeHandshakeResponse(clientCaps, 16777216L, hs.collation,
      username, scramble, database, Some(plugin)), plugin)
  }

  // ---- text protocol (command phase) ---------------------------------
  // The reference's pre-dump command phase (rust-cdc `conn.rs:367-460`):
  // COM_PING → OK, `set @master_binlog_checksum=...` via COM_QUERY →
  // OK, `show master status` → a TEXT RESULTSET (column count, N
  // ColumnDefinition41 packets, EOF, lenenc-string rows, EOF) whose
  // first row carries the (file, pos, gtid_set) that seed
  // COM_BINLOG_DUMP. All of it is pure byte work; the codec lives
  // here (protocol/text/{query,ping,quit}.rs, protocol/row.rs,
  // event/decode.rs:42-69, ssl_request.rs).

  /** COM_QUERY (0x03) — the statement text follows raw. */
  def encodeComQuery(sql: String): Array[Byte] =
    0x03.toByte +: sql.getBytes("UTF-8")

  /** COM_PING (0x0e) / COM_QUIT (0x01) — single-byte commands. */
  def encodeComPing(): Array[Byte] = Array(0x0e.toByte)
  def encodeComQuit(): Array[Byte] = Array(0x01.toByte)

  /** SSLRequest — the HandshakeResponse41 PREFIX sent alone to
    * request TLS upgrade: caps u32, max packet u32, collation,
    * 19 reserved bytes, then 4 reserved bytes under CLIENT_MYSQL or
    * the MariaDB extended-capability word otherwise.
    */
  def encodeSslRequest(capabilities: Long, maxPacketSize: Long, collation: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val b = new LeWriter(out)
    b.u32(capabilities & 0xffffffffL)
    b.u32(maxPacketSize)
    b.u8(collation)
    (0 until 19).foreach(_ => b.u8(0))
    if ((capabilities & ClientMysql) != 0) (0 until 4).foreach(_ => b.u8(0))
    else b.u32((capabilities >> 32) & 0xffffffffL)
    out.toByteArray
  }

  /** ColumnDefinition41 — result-set metadata, one packet per output
    * column. The result name prefers the alias when non-empty
    * (reference `recv_next_result_column`).
    */
  final case class ColumnDef(
      catalog: String, schema: String, tableAlias: String, table: String,
      alias: String, name: String, charSet: Int, maxSize: Long,
      typeId: Int, flags: Int, decimals: Int) {
    def resultName: String = if (alias.nonEmpty) alias else name
  }

  def decodeColumnDef(payload: Array[Byte]): ColumnDef = {
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def lstr(): String = {
      val n = readLenenc(b).toInt
      val a = new Array[Byte](n); b.get(a); new String(a, "UTF-8")
    }
    val catalog = lstr(); val schema = lstr(); val tableAlias = lstr()
    val table = lstr(); val alias = lstr(); val name = lstr()
    readLenenc(b) // fixed-length-fields marker, always 0x0c
    val charSet = b.getShort & 0xffff
    val maxSize = b.getInt.toLong & 0xffffffffL
    val typeId = b.get() & 0xff
    val flags = b.getShort & 0xffff
    val decimals = b.get() & 0xff
    ColumnDef(catalog, schema, tableAlias, table, alias, name,
      charSet, maxSize, typeId, flags, decimals)
  }

  def encodeColumnDef(d: ColumnDef): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val b = new LeWriter(out)
    def lstr(s: String): Unit = {
      val a = s.getBytes("UTF-8"); b.lenenc(a.length); out.write(a, 0, a.length)
    }
    lstr(d.catalog); lstr(d.schema); lstr(d.tableAlias)
    lstr(d.table); lstr(d.alias); lstr(d.name)
    b.lenenc(0x0c)
    b.u16(d.charSet)
    b.u32(d.maxSize)
    b.u8(d.typeId)
    b.u16(d.flags)
    b.u8(d.decimals)
    b.u16(0) // filler
    out.toByteArray
  }

  /** One text-protocol row: NULL is 0xfb, every other value a
    * lenenc-string (reference `protocol/row.rs:22-44`).
    */
  def decodeTextRow(payload: Array[Byte], nCols: Int): Seq[Option[String]] = {
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    (0 until nCols).map { _ =>
      if ((b.get(b.position()) & 0xff) == 0xfb) { b.get(); None }
      else {
        val n = readLenenc(b).toInt
        val a = new Array[Byte](n); b.get(a)
        Some(new String(a, "UTF-8"))
      }
    }
  }

  def encodeTextRow(values: Seq[Option[String]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val b = new LeWriter(out)
    values.foreach {
      case None => b.u8(0xfb)
      case Some(v) =>
        val a = v.getBytes("UTF-8"); b.lenenc(a.length); out.write(a, 0, a.length)
    }
    out.toByteArray
  }

  final case class ResultSet(columns: Seq[ColumnDef], rows: Seq[Seq[Option[String]]]) {
    def columnNames: Seq[String] = columns.map(_.resultName)
    def apply(row: Int, column: String): Option[String] = {
      val idx = columnNames.indexOf(column)
      require(idx >= 0,
        s"wire: resultset has no column '$column' (have ${columnNames.mkString(", ")})")
      rows(row)(idx)
    }
  }

  /** Server-side fixture: frame a complete text resultset — column
    * count, column definitions, EOF, rows, EOF — as consecutive wire
    * packets.
    */
  def encodeResultSet(rs: ResultSet, firstSeq: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var seq = firstSeq
    def put(payload: Array[Byte]): Unit = {
      val f = framePackets(payload, seq)
      out.write(f, 0, f.length)
      seq += 1 // all command-phase payloads are < 16 MB here
    }
    val count = new java.io.ByteArrayOutputStream()
    new LeWriter(count).lenenc(rs.columns.length)
    put(count.toByteArray)
    rs.columns.foreach(d => put(encodeColumnDef(d)))
    put(Array(0xfe.toByte, 0, 0, 2, 0)) // EOF after metadata
    rs.rows.foreach(r => put(encodeTextRow(r)))
    put(Array(0xfe.toByte, 0, 0, 2, 0)) // EOF after rows
    out.toByteArray
  }

  /** Client side: read one statement reply at `off` — an OK packet
    * (row-less statement) or a full text resultset. Returns the
    * decoded reply and the bytes consumed.
    */
  def decodeResultSet(data: Array[Byte], off: Int): (Either[Ok, ResultSet], Int) = {
    var p = off
    def next(): Array[Byte] = {
      val (payload, used, _) = readPacket(data, p); p += used; payload
    }
    (decodeResultSetFrom(next _), p - off)
  }

  /** Streaming form of [[decodeResultSet]]: packets come from a
    * supplier (a live transport reads them off the wire one at a
    * time) instead of a contiguous buffer. */
  def decodeResultSetFrom(next: () => Array[Byte]): Either[Ok, ResultSet] = {
    val first = next()
    if (isOk(first)) Left(decodeOk(first))
    else if (isErr(first)) {
      val e = decodeErr(first)
      throw new IllegalStateException(s"wire: server error ${e.code}: ${e.message}")
    } else {
      val b = ByteBuffer.wrap(first).order(ByteOrder.LITTLE_ENDIAN)
      val nCols = readLenenc(b).toInt
      val columns = (0 until nCols).map(_ => decodeColumnDef(next()))
      val afterMeta = next()
      require(isEof(afterMeta), "wire: expected EOF after result metadata")
      // rows terminate ONLY on the classic EOF (0xfe, len < 9): a row
      // whose first column is an empty string legitimately starts
      // with 0x00 (lenenc length 0) and must not read as OK. An ERR
      // packet MAY arrive mid-stream (query killed, net timeout) and
      // must surface as the server's error, not a garbled row — 0xff
      // cannot open a real row (lenenc 0xff is not a valid length
      // prefix), so the check is unambiguous.
      val rows = Iterator.continually(next())
        .takeWhile(pk => !isEof(pk))
        .map { pk =>
          if (isErr(pk)) {
            val e = decodeErr(pk)
            throw new IllegalStateException(
              s"wire: server error ${e.code} mid-resultset: ${e.message}")
          }
          decodeTextRow(pk, nCols)
        }
        .toSeq
      Right(ResultSet(columns, rows))
    }
  }

  final case class MasterStatus(file: String, pos: Long, gtidSet: String)

  /** Parse the `show master status` reply the reference uses to seed
    * the dump (conn.rs:419-446: column 0 = file, 1 = position,
    * 4 = Executed_Gtid_Set).
    */
  def masterStatus(rs: ResultSet): MasterStatus = {
    require(rs.rows.nonEmpty, "wire: empty show-master-status result")
    val r = rs.rows.head
    MasterStatus(
      r(0).getOrElse(sys.error("binlog file name parse error")),
      r(1).getOrElse(sys.error("binlog pos parse error")).toLong,
      r.lift(4).flatten.getOrElse(""))
  }

  final case class CommandPhase(
      ping: Array[Byte],
      checksumQuery: Array[Byte],
      statusQuery: Array[Byte],
      status: MasterStatus,
      dump: Array[Byte])

  /** The reference's whole pre-dump command phase, socketless
    * (conn.rs:367-460): COM_PING (server must OK), the checksum
    * COM_QUERY (server must OK), `show master status` decode, then
    * COM_BINLOG_DUMP built from the returned (file, pos). Inputs are
    * the server's framed byte replies; output is every client
    * command payload plus the parsed position.
    */
  def commandPhase(
      pingReply: Array[Byte],
      checksumReply: Array[Byte],
      statusReply: Array[Byte],
      serverId: Long): CommandPhase = {
    val (pingPk, _, _) = readPacket(pingReply, 0)
    require(isOk(pingPk), "wire: ping not acknowledged")
    val (ckPk, _, _) = readPacket(checksumReply, 0)
    require(isOk(ckPk), "wire: checksum set not acknowledged")
    val (reply, _) = decodeResultSet(statusReply, 0)
    val rs = reply.getOrElse(
      throw new IllegalStateException("wire: show master status returned no resultset"))
    val st = masterStatus(rs)
    CommandPhase(
      encodeComPing(),
      encodeComQuery("set @master_binlog_checksum= @@global.binlog_checksum"),
      encodeComQuery("show master status"),
      st,
      encodeComBinlogDump(st.pos, serverId, st.file))
  }

  // ---- low-level helpers -------------------------------------------

  private def readNulString(b: ByteBuffer): String = {
    val sb = new java.io.ByteArrayOutputStream()
    var c = b.get()
    while (c != 0) { sb.write(c); c = b.get() }
    new String(sb.toByteArray, "UTF-8")
  }

  private def readLenenc(b: ByteBuffer): Long = (b.get() & 0xff) match {
    case 0xfc => (b.getShort & 0xffff).toLong
    case 0xfd => (b.get() & 0xff).toLong | ((b.get() & 0xff).toLong << 8) |
      ((b.get() & 0xff).toLong << 16)
    case 0xfe => b.getLong
    case v => v.toLong
  }

  private final class LeWriter(out: java.io.ByteArrayOutputStream) {
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def strNul(s: String): Unit = {
      val b = s.getBytes("UTF-8"); out.write(b, 0, b.length); out.write(0)
    }
    def lenenc(n: Long): Unit =
      if (n < 251) u8(n.toInt)
      else if (n < 65536) { u8(0xfc); u16(n.toInt) }
      else if (n < 16777216) { u8(0xfd); u8(n.toInt); u8((n >> 8).toInt); u8((n >> 16).toInt) }
      else { u8(0xfe); (0 until 8).foreach(i => u8(((n >> (8 * i)) & 0xff).toInt)) }
  }
}

package graft.sources.mysql

import java.io.{InputStream, OutputStream}

/** Blocking transport loop over the [[Wire]] codec — the socket edge
  * of the reference's connection/command/dump sequence
  * (/root/reference/src/net/socket.rs:1, src/mysql/connection/
  * stream.rs, conn.rs:367-460).
  *
  * The loop is written against plain Input/OutputStream so every
  * protocol path is unit-driven with scripted byte streams built
  * from the same codec (WireSocketSpec); [[WireSocket.connect]] is
  * the thin java.net.Socket binding on top. The sandbox this library
  * is built in has NO network egress, so `connect` itself is
  * UNREACHABLE IN CI by construction — it is excluded from the bench
  * and oracle suites and exists for users with a live MySQL.
  * Everything below the socket line (framing, auth, command phase,
  * dump stream) is covered by the scripted-stream specs and the
  * byte-pinned fixtures in WireSpec.
  */
final class WireChannel(in: InputStream, out: OutputStream) {

  private var lastSeq: Int = -1

  /** Sequence number of the last framed packet read (-1 before any
    * read). Auth replies must continue from here (lastReadSeq + 1) —
    * a fixed constant breaks when a caching_sha2 fast-auth exchange
    * precedes an AuthSwitchRequest and shifts the numbering. */
  def lastReadSeq: Int = lastSeq

  /** Read one framed payload; reassembles the 16 MB continuation
    * convention (a length-0xffffff packet continues in the next). */
  def readPayload(): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    var more = true
    while (more) {
      val h = readN(4)
      val len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
      lastSeq = h(3) & 0xff
      buf.write(readN(len))
      more = len == 0xffffff
    }
    buf.toByteArray
  }

  /** Frame and send one payload (splitting at 16 MB like the codec's
    * [[Wire.framePackets]]). Commands start a new sequence at 0;
    * replies continue from `firstSeq`. */
  def writePayload(payload: Array[Byte], firstSeq: Int): Unit = {
    out.write(Wire.framePackets(payload, firstSeq))
    out.flush()
  }

  private def readN(n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(b, off, n - off)
      if (r < 0) throw new java.io.EOFException(
        s"wire: stream closed after $off of $n bytes")
      off += r
    }
    b
  }
}

/** An authenticated MySQL session over a [[WireChannel]]. */
final class WireConnection private[mysql] (ch: WireChannel) {

  /** COM_QUERY: an OK (DML/SET) or a text result set. */
  def query(sql: String): Either[Wire.Ok, Wire.ResultSet] = {
    ch.writePayload(Wire.encodeComQuery(sql), 0)
    Wire.decodeResultSetFrom(() => ch.readPayload())
  }

  def ping(): Boolean = {
    ch.writePayload(Wire.encodeComPing(), 0)
    Wire.isOk(ch.readPayload())
  }

  /** The reference's pre-dump command phase, then COM_BINLOG_DUMP:
    * returns the raw binlog EVENT byte stream (each element is one
    * event, the leading 0x00 OK marker stripped — feed them to
    * [[graft.sources.binlog.BinlogParser]]). The iterator ends on a
    * non-blocking dump's EOF and throws on a server ERR.
    */
  def binlogDump(serverId: Long): Iterator[Array[Byte]] = {
    require(ping(), "wire: ping not acknowledged")
    query("set @master_binlog_checksum= @@global.binlog_checksum") match {
      case Left(_) => ()
      case Right(_) => throw new IllegalStateException(
        "wire: checksum set returned a resultset")
    }
    val st = query("show master status") match {
      case Right(rs) => Wire.masterStatus(rs)
      case Left(_) => throw new IllegalStateException(
        "wire: show master status returned no resultset")
    }
    ch.writePayload(Wire.encodeComBinlogDump(st.pos, serverId, st.file), 0)
    Iterator.continually(ch.readPayload())
      .takeWhile(pk => !Wire.isEof(pk))
      .map { pk =>
        if (Wire.isErr(pk)) {
          val e = Wire.decodeErr(pk)
          throw new IllegalStateException(
            s"wire: dump error ${e.code}: ${e.message}")
        }
        require(pk.nonEmpty && pk(0) == 0x00,
          "wire: dump packet without OK marker")
        pk.drop(1)
      }
  }

  def quit(): Unit = ch.writePayload(Wire.encodeComQuit(), 0)
}

object WireSocket {

  /** Run the connection phase (greeting → handshake response → auth
    * switch / fast-auth result → OK) over an open channel. Exposed
    * at channel level so the full loop is spec-driven with scripted
    * streams; [[connect]] only adds the socket.
    */
  def authenticate(
      ch: WireChannel,
      username: String,
      password: String,
      database: Option[String]): WireConnection = {
    val greeting = ch.readPayload()
    val (response, plugin0) =
      Wire.connectionPhase(greeting, username, password, database)
    // the greeting is packet 0, the response packet 1
    ch.writePayload(response, 1)
    var plugin = plugin0
    var done = false
    var guard = 0
    while (!done) {
      guard += 1
      require(guard <= 4, "wire: auth did not settle in 4 exchanges")
      val pk = ch.readPayload()
      if (Wire.isOk(pk)) done = true
      else if (Wire.isErr(pk)) {
        val e = Wire.decodeErr(pk)
        throw new IllegalStateException(
          s"wire: auth failed ${e.code}: ${e.message}")
      } else if (pk.nonEmpty && (pk(0) & 0xff) == 0xfe) {
        // AuthSwitchRequest: re-scramble under the server's plugin
        val sw = Wire.decodeAuthSwitch(pk)
        plugin = sw.plugin
        val scramble = sw.plugin match {
          case "mysql_native_password" =>
            Wire.scrambleNative(password, sw.nonce)
          case "caching_sha2_password" =>
            Wire.scrambleCachingSha2(password, sw.nonce)
          case p => throw new IllegalArgumentException(
            s"wire: unsupported auth plugin $p")
        }
        // an auth-switch reply continues the sequence after the
        // switch request: usually greeting 0, response 1, switch 2
        // → reply 3, but a caching_sha2 fast-auth packet may precede
        // the switch and shift the numbering — continue from the
        // sequence the server actually used
        ch.writePayload(scramble, ch.lastReadSeq + 1)
      } else Wire.fastAuthOk(pk) match {
        // caching_sha2 fast-auth verdict: success → an OK follows;
        // full-auth-needed requires TLS or an RSA key exchange,
        // which this thin loop deliberately does not implement
        case Some(true) => () // loop reads the trailing OK
        case Some(false) => throw new IllegalStateException(
          "wire: caching_sha2 full auth required (cached entry miss) — " +
            "connect over TLS or prime the server's auth cache first")
        case None => throw new IllegalStateException(
          s"wire: unexpected auth packet 0x${(pk(0) & 0xff).toHexString}")
      }
    }
    new WireConnection(ch)
  }

  /** Open a TCP connection and authenticate. UNREACHABLE IN THIS
    * REPOSITORY'S CI (the build sandbox has no network); provided
    * for users running against a live MySQL/MariaDB. Plaintext
    * transport — for TLS, wrap the socket with an SSLSocketFactory
    * after sending [[Wire.encodeSslRequest]] (not implemented here).
    */
  def connect(
      host: String,
      port: Int,
      username: String,
      password: String,
      database: Option[String] = None,
      connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 60000): WireConnection = {
    val sock = new java.net.Socket()
    sock.connect(new java.net.InetSocketAddress(host, port), connectTimeoutMs)
    sock.setSoTimeout(readTimeoutMs)
    sock.setTcpNoDelay(true)
    authenticate(
      new WireChannel(sock.getInputStream, sock.getOutputStream),
      username, password, database)
  }
}

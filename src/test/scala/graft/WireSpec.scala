package graft

import graft.sources.mysql.Wire
import org.scalatest.funsuite.AnyFunSuite

/** Connection-phase wire codec fixtures — the byte half of the
  * reference's replica transport (rust-cdc handshake.rs /
  * handshake_response.rs / auth.rs / com_binlog_dump.rs), validated
  * against hand-built packets following the public protocol layout.
  */
class WireSpec extends AnyFunSuite {

  private val nonce20: Array[Byte] = Array.tabulate(20)(i => (i + 1).toByte)

  private def mysql8Greeting: Array[Byte] = Wire.encodeHandshake(Wire.Handshake(
    protocolVersion = 10,
    serverVersion = "8.0.34",
    connectionId = 7777,
    capabilities = Wire.ClientMysql | Wire.Protocol41 | Wire.SecureConnection |
      Wire.PluginAuth | Wire.PluginAuthLenencData | Wire.ConnectWithDb,
    collation = 0xff,
    status = 2,
    authPluginData = nonce20,
    authPlugin = Some("caching_sha2_password")))

  test("HandshakeV10 round-trips every field incl. split nonce and caps") {
    val h = Wire.decodeHandshake(mysql8Greeting)
    assert(h.protocolVersion == 10)
    assert(h.serverVersion == "8.0.34")
    assert(h.connectionId == 7777)
    assert(h.collation == 0xff && h.status == 2)
    assert((h.capabilities & Wire.PluginAuth) != 0)
    assert((h.capabilities & Wire.SecureConnection) != 0)
    assert(h.authPlugin.contains("caching_sha2_password"))
    // nonce is split 8 + 13-with-NUL on the wire; decode rejoins it
    assert(h.authPluginData.toSeq == nonce20.toSeq)
  }

  test("HandshakeV10 without PLUGIN_AUTH / SECURE_CONNECTION decodes the short form") {
    val h0 = Wire.Handshake(10, "5.5.5-older", 3, Wire.ClientMysql | Wire.Protocol41,
      8, 0, Array.tabulate(8)(i => (i + 1).toByte), None)
    val h = Wire.decodeHandshake(Wire.encodeHandshake(h0))
    assert(h.serverVersion == "5.5.5-older")
    assert(h.authPlugin.isEmpty)
    assert(h.authPluginData.length == 8)
  }

  test("mysql_native_password scramble: SHA1(pw) XOR SHA1(nonce||SHA1(SHA1(pw)))") {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val pw = md.digest("secret".getBytes("UTF-8"))
    val pwpw = md.digest(pw)
    md.update(nonce20); md.update(pwpw)
    val rhs = md.digest()
    val want = pw.zip(rhs).map { case (a, b) => (a ^ b).toByte }
    val got = Wire.scrambleNative("secret", nonce20)
    assert(got.length == 20)
    assert(got.toSeq == want.toSeq)
    // sensitive to every input
    assert(Wire.scrambleNative("secret2", nonce20).toSeq != got.toSeq)
    assert(Wire.scrambleNative("secret", nonce20.reverse).toSeq != got.toSeq)
  }

  test("caching_sha2 scramble: SHA256(pw) XOR SHA256(SHA256(SHA256(pw)) || nonce)") {
    // canonical argument order: digest-of-digest FIRST, nonce second
    // (the REVERSE of the SHA1 native construction) — the order every
    // server/connector implementation agrees on
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val pw = md.digest("secret".getBytes("UTF-8"))
    val pwpw = md.digest(pw)
    md.update(pwpw); md.update(nonce20)
    val rhs = md.digest()
    val want = pw.zip(rhs).map { case (a, b) => (a ^ b).toByte }
    assert(Wire.scrambleCachingSha2("secret", nonce20).toSeq == want.toSeq)
    // and it must NOT equal the nonce-first (native-style) order —
    // the regression this test exists to catch
    md.update(nonce20); md.update(pwpw)
    val wrong = pw.zip(md.digest()).map { case (a, b) => (a ^ b).toByte }
    assert(Wire.scrambleCachingSha2("secret", nonce20).toSeq != wrong.toSeq)
  }

  test("connectionPhase builds a spec-layout HandshakeResponse41") {
    val (resp, plugin) = Wire.connectionPhase(
      mysql8Greeting, "repl", "secret", Some("appdb"))
    assert(plugin == "caching_sha2_password")
    // SSL-request prefix: caps u32 LE, max packet u32 LE, collation,
    // then 23 zero bytes
    val b = java.nio.ByteBuffer.wrap(resp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val caps = b.getInt.toLong & 0xffffffffL
    assert((caps & Wire.Protocol41) != 0)
    assert((caps & Wire.PluginAuth) != 0)
    assert(b.getInt == 16777216) // max packet
    b.get() // collation
    (0 until 23).foreach(_ => assert(b.get() == 0))
    // username NUL-terminated
    val user = new Array[Byte](4); b.get(user)
    assert(new String(user, "UTF-8") == "repl" && b.get() == 0)
    // lenenc auth response of 32 bytes (sha256 scramble)
    assert((b.get() & 0xff) == 32)
    val scr = new Array[Byte](32); b.get(scr)
    assert(scr.toSeq == Wire.scrambleCachingSha2("secret", nonce20).toSeq)
    // database + plugin name NUL strings
    val db = new Array[Byte](5); b.get(db)
    assert(new String(db, "UTF-8") == "appdb" && b.get() == 0)
    val pl = new Array[Byte]("caching_sha2_password".length); b.get(pl)
    assert(new String(pl, "UTF-8") == "caching_sha2_password")
  }

  test("AuthSwitchRequest decode + fast-auth results") {
    val payload = Array(0xfe.toByte) ++
      "mysql_native_password".getBytes("UTF-8") ++ Array(0.toByte) ++
      nonce20 ++ Array(0.toByte)
    val sw = Wire.decodeAuthSwitch(payload)
    assert(sw.plugin == "mysql_native_password")
    assert(sw.nonce.toSeq == nonce20.toSeq)
    assert(Wire.fastAuthOk(Array(0x01, 0x03)).contains(true))
    assert(Wire.fastAuthOk(Array(0x01, 0x04)).contains(false))
    assert(Wire.fastAuthOk(Array(0x00)).isEmpty)
  }

  test("OK / ERR / EOF result decode") {
    // OK: header 0, affected=3 (lenenc), insert id=0, status, warnings
    val ok = Wire.decodeOk(Array[Byte](0, 3, 0, 2, 0, 1, 0))
    assert(ok.affectedRows == 3 && ok.status == 2 && ok.warnings == 1)
    val err = Wire.decodeErr(Array(0xff.toByte, 0x15.toByte, 0x04.toByte) ++
      "#28000".getBytes("US-ASCII") ++
      "Access denied".getBytes("UTF-8"))
    assert(err.code == 0x0415 && err.sqlState == "28000")
    assert(err.message == "Access denied")
    assert(Wire.isEof(Array(0xfe.toByte, 0, 0, 2, 0)))
    assert(!Wire.isEof(Array(0xfe.toByte) ++ new Array[Byte](10)))
  }

  test("COM_BINLOG_DUMP bytes match the reference encode exactly") {
    // com_binlog_dump.rs:15-22: 0x12, pos u32 LE, flags u16(0),
    // server_id u32 LE, filename raw
    val got = Wire.encodeComBinlogDump(981L, 33675L, "mysql-bin.000007")
    val want = Array[Byte](0x12,
      (981 & 0xff).toByte, (981 >> 8).toByte, 0, 0,
      0, 0,
      (33675 & 0xff).toByte, ((33675 >> 8) & 0xff).toByte, 0, 0) ++
      "mysql-bin.000007".getBytes("UTF-8")
    assert(got.toSeq == want.toSeq)
    val reg = Wire.encodeComRegisterSlave(33675L)
    assert((reg(0) & 0xff) == 0x15 && reg.length == 18)
  }

  test("packet framing: 16MB continuation chunking round-trips") {
    // small payload: one packet
    val small = Array.tabulate(100)(_.toByte)
    val framedSmall = Wire.framePackets(small, firstSeq = 1)
    assert(framedSmall.length == 104 && framedSmall(3) == 1)
    val (p1, used1, seq1) = Wire.readPacket(framedSmall, 0)
    assert(p1.toSeq == small.toSeq && used1 == 104 && seq1 == 1)
    // exactly one full chunk: terminator empty packet required
    val full = new Array[Byte](Wire.MaxChunk)
    val framedFull = Wire.framePackets(full, 0)
    assert(framedFull.length == Wire.MaxChunk + 8) // 2 headers + empty
    val (p2, used2, seq2) = Wire.readPacket(framedFull, 0)
    assert(p2.length == Wire.MaxChunk && used2 == framedFull.length && seq2 == 1)
    // full chunk + tail
    val big = new Array[Byte](Wire.MaxChunk + 5)
    java.util.Arrays.fill(big, 7.toByte)
    val (p3, _, _) = Wire.readPacket(Wire.framePackets(big, 0), 0)
    assert(p3.length == big.length && p3.forall(_ == 7))
  }

  test("real captured server packets decode (reference wire fixtures)") {
    // Byte-for-byte captures from live servers, taken from the
    // reference's own tests (rust-cdc handshake.rs:93-145, ok.rs:44,
    // err.rs:51-76) — used as INPUTS to validate the clean-room
    // decoder against real-world layouts, exactly like the binlog
    // fixture files validate the event parser.
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")
    // MySQL 8.0.18 greeting (CLIENT_MYSQL set → reserved tail)
    val mysql8 = b(0x0a) ++ ascii("8.0.18") ++ b(0) ++ b(0x19, 0, 0, 0) ++
      b(0x11) ++ ascii("4aB0c") ++ b(0x06) ++ ascii("g") ++ b(0) ++
      b(0xff, 0xff) ++ b(0xff) ++ b(0x02, 0) ++ b(0xff, 0xc7) ++ b(0x15) ++
      Array.fill[Byte](10)(0) ++
      ascii("tL") ++ b(0x03) ++ ascii("s") ++ b(0x0f) ++ ascii("[4") ++
      b(0x0d) ++ ascii("l4. ") ++ b(0) ++
      ascii("caching_sha2_password") ++ b(0)
    val h8 = Wire.decodeHandshake(mysql8)
    assert(h8.protocolVersion == 10 && h8.serverVersion == "8.0.18")
    assert(h8.connectionId == 25 && h8.collation == 255)
    assert((h8.status & 0x2) != 0) // SERVER_STATUS_AUTOCOMMIT
    assert(h8.authPlugin.contains("caching_sha2_password"))
    assert(h8.authPluginData.toSeq == Seq(17, 52, 97, 66, 48, 99, 6, 103,
      116, 76, 3, 115, 15, 91, 52, 13, 108, 52, 46, 32).map(_.toByte))
    // MariaDB 10.4.7 greeting (CLIENT_MYSQL clear → extended caps word)
    val maria = b(0x0a) ++
      ascii("5.5.5-10.4.7-MariaDB-1:10.4.7+maria~bionic") ++ b(0) ++
      b(0x0b, 0, 0, 0) ++ ascii("t6L") ++ b(0x5c) ++ ascii("j") ++
      b(0x22) ++ ascii("dS") ++ b(0) ++
      b(0xfe, 0xf7) ++ b(0x08) ++ b(0x02, 0) ++ b(0xff, 0x81) ++ b(0x15) ++
      Array.fill[Byte](6)(0) ++ b(0x07, 0, 0, 0) ++
      ascii("U14Oph9") ++ b(0x22) ++ ascii("<H5n") ++ b(0) ++
      ascii("mysql_native_password") ++ b(0)
    val hm = Wire.decodeHandshake(maria)
    assert(hm.serverVersion == "5.5.5-10.4.7-MariaDB-1:10.4.7+maria~bionic")
    assert(hm.connectionId == 11 && hm.collation == 8)
    assert((hm.capabilities >> 32) == 7L) // MariaDB extended caps word
    assert(hm.authPlugin.contains("mysql_native_password"))
    assert(hm.authPluginData.toSeq == Seq(116, 54, 76, 92, 106, 34, 100, 83,
      85, 49, 52, 79, 112, 104, 57, 34, 60, 72, 53, 110).map(_.toByte))
    // both real greetings drive the full client phase without error
    assert(Wire.connectionPhase(mysql8, "repl", "pw", None)._2 ==
      "caching_sha2_password")
    assert(Wire.connectionPhase(maria, "repl", "pw", None)._2 ==
      "mysql_native_password")
    // captured OK: status 0x4002 (autocommit | session-state-changed)
    val ok = Wire.decodeOk(b(0, 0, 0, 0x02, 0x40, 0, 0))
    assert(ok.affectedRows == 0 && ok.lastInsertId == 0)
    assert((ok.status & 0x2) != 0 && (ok.status & 0x4000) != 0)
    assert(ok.warnings == 0)
    // captured ERRs: without and with the '#' sql-state marker
    val e1 = Wire.decodeErr(b(0xff, 0x84, 0x04) ++
      ascii("Got packets out of order"))
    assert(e1.code == 1156 && e1.sqlState == "" &&
      e1.message == "Got packets out of order")
    val e2 = Wire.decodeErr(b(0xff, 0x19, 0x04) ++
      ascii("#42000Unknown database 'unknown'"))
    assert(e2.code == 1049 && e2.sqlState == "42000" &&
      e2.message == "Unknown database 'unknown'")
  }

  // ---- command phase (conn.rs:367-460) -------------------------------

  test("COM_QUERY / COM_PING / COM_QUIT single-command encodes") {
    val q = Wire.encodeComQuery("show master status")
    assert((q(0) & 0xff) == 0x03)
    assert(new String(q.drop(1), "UTF-8") == "show master status")
    assert(Wire.encodeComPing().toSeq == Seq(0x0e.toByte))
    assert(Wire.encodeComQuit().toSeq == Seq(0x01.toByte))
  }

  test("SSLRequest: caps + max-packet + collation + 19 reserved + mysql tail") {
    val caps = Wire.ClientMysql | Wire.Protocol41 | Wire.Ssl
    val ssl = Wire.encodeSslRequest(caps, 16777216L, 0xff)
    assert(ssl.length == 32) // 4 + 4 + 1 + 19 + 4
    val gotCaps = (ssl(0) & 0xffL) | ((ssl(1) & 0xffL) << 8) |
      ((ssl(2) & 0xffL) << 16) | ((ssl(3) & 0xffL) << 24)
    assert(gotCaps == caps)
    assert((ssl(8) & 0xff) == 0xff) // collation
    assert(ssl.drop(9).forall(_ == 0)) // reserved
    // non-MYSQL (MariaDB) form carries the extended-caps word instead
    val ext = Wire.encodeSslRequest(Wire.Protocol41 | (5L << 32), 1L, 8)
    assert(ext.length == 32 && (ext(28) & 0xff) == 5)
  }

  test("ColumnDefinition41 round-trips; result name prefers the alias") {
    val d = Wire.ColumnDef("def", "appdb", "t_alias", "users",
      "uid", "user_id", 33, 11, 0x03, 0x4003, 0)
    val back = Wire.decodeColumnDef(Wire.encodeColumnDef(d))
    assert(back == d)
    assert(back.resultName == "uid")
    assert(Wire.ColumnDef("def", "", "", "", "", "n", 33, 1, 0, 0, 0)
      .resultName == "n")
  }

  test("text row: lenenc strings with 0xfb NULL round-trip") {
    val row = Seq(Some("mysql-bin.000001"), Some("157"), None, None,
      Some("uuid:1-99"))
    val back = Wire.decodeTextRow(Wire.encodeTextRow(row), 5)
    assert(back == row)
    // a 300-byte value exercises the 0xfc lenenc form
    val long = Seq(Some("x" * 300))
    assert(Wire.decodeTextRow(Wire.encodeTextRow(long), 1) == long)
  }

  test("text resultset round-trips: metadata, EOFs, rows; OK for row-less") {
    val cols = Seq("File", "Position").map(n =>
      Wire.ColumnDef("def", "", "", "", n, n, 33, 256, 0xfd, 0, 0))
    val rs = Wire.ResultSet(cols,
      Seq(Seq(Some("mysql-bin.000042"), Some("4711")),
        Seq(None, Some("0"))))
    val (decoded, used) = Wire.decodeResultSet(Wire.encodeResultSet(rs, 1), 0)
    assert(decoded == Right(rs) && used == Wire.encodeResultSet(rs, 1).length)
    assert(decoded.toOption.get(0, "File").contains("mysql-bin.000042"))
    // a row whose FIRST column is an empty string starts with byte
    // 0x00 (lenenc length 0) — it must decode as a row, not be
    // misread as an OK terminator truncating the resultset
    val tricky = Wire.ResultSet(cols,
      Seq(Seq(Some(""), Some("1")), Seq(Some("after"), Some("2"))))
    val (trickyDec, _) = Wire.decodeResultSet(Wire.encodeResultSet(tricky, 1), 0)
    assert(trickyDec == Right(tricky),
      "empty-string first column misread as a resultset terminator")
    // an OK reply (no resultset) decodes to Left
    val okReply = Wire.framePackets(Array[Byte](0, 0, 0, 2, 0, 0, 0), 1)
    val (okDec, _) = Wire.decodeResultSet(okReply, 0)
    assert(okDec.isLeft)
    // an ERR reply raises with the server message
    val errPayload = Array[Byte](0xff.toByte, 0x28, 0x04) ++
      "#HY000denied".getBytes("UTF-8")
    val e = intercept[IllegalStateException](
      Wire.decodeResultSet(Wire.framePackets(errPayload, 1), 0))
    assert(e.getMessage.contains("1064") && e.getMessage.contains("denied"))
    // an ERR arriving MID-STREAM (query killed) surfaces the server
    // error instead of being misparsed as a row
    val killed = Array[Byte](0xff.toByte, 0x25, 0x05) ++ // 1317
      "#70100interrupted".getBytes("UTF-8")
    val head = Wire.encodeResultSet(Wire.ResultSet(cols,
      Seq(Seq(Some("mysql-bin.000001"), Some("4")))), 1)
    // splice: metadata + first row, then ERR in place of the rows EOF
    val lastEofLen = 4 + 5
    val truncated = head.dropRight(lastEofLen) ++ Wire.framePackets(killed, 9)
    val mid = intercept[IllegalStateException](
      Wire.decodeResultSet(truncated, 0))
    assert(mid.getMessage.contains("1317") &&
      mid.getMessage.contains("interrupted"), mid.getMessage)
  }

  test("commandPhase: show-master-status seeds COM_BINLOG_DUMP exactly") {
    val cols = Seq("File", "Position", "Binlog_Do_DB", "Binlog_Ignore_DB",
      "Executed_Gtid_Set").map(n =>
      Wire.ColumnDef("def", "", "", "", n, n, 33, 256, 0xfd, 0, 0))
    val statusReply = Wire.encodeResultSet(Wire.ResultSet(cols, Seq(Seq(
      Some("mysql-bin.000007"), Some("981"), None, None,
      Some("uuid:1-50")))), 1)
    val ok = Wire.framePackets(Array[Byte](0, 0, 0, 2, 0, 0, 0), 1)
    val phase = Wire.commandPhase(ok, ok, statusReply, serverId = 33675L)
    assert(phase.status == Wire.MasterStatus("mysql-bin.000007", 981L, "uuid:1-50"))
    // the dump must be byte-identical to encoding from the parsed pos
    assert(phase.dump.toSeq ==
      Wire.encodeComBinlogDump(981L, 33675L, "mysql-bin.000007").toSeq)
    assert(new String(phase.checksumQuery.drop(1), "UTF-8")
      .startsWith("set @master_binlog_checksum"))
    // a non-OK ping reply fails the phase
    val err = Wire.framePackets(Array[Byte](0xff.toByte, 1, 0) ++
      "#HY000x".getBytes("UTF-8"), 1)
    assertThrows[IllegalArgumentException](
      Wire.commandPhase(err, ok, statusReply, 1L))
  }
}

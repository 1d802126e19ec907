package graft

import graft.sources.mysql.{Wire, WireChannel, WireSocket}
import org.scalatest.funsuite.AnyFunSuite

/** The socket transport loop, driven at the codec boundary with
  * scripted byte streams (the client is strictly request→reply, so a
  * pre-baked server conversation on a ByteArrayInputStream exercises
  * the exact read/write interleaving a live socket would). The real
  * `WireSocket.connect` is only the java.net.Socket binding over the
  * same WireChannel and is unreachable in this sandbox (no network).
  */
class WireSocketSpec extends AnyFunSuite {

  private val nonce20: Array[Byte] = Array.tabulate(20)(i => (i + 7).toByte)

  private def greeting(plugin: String): Array[Byte] =
    Wire.framePackets(Wire.encodeHandshake(Wire.Handshake(
      protocolVersion = 10,
      serverVersion = "8.0.34",
      connectionId = 42,
      capabilities = Wire.ClientMysql | Wire.Protocol41 | Wire.SecureConnection |
        Wire.PluginAuth | Wire.PluginAuthLenencData | Wire.ConnectWithDb,
      collation = 0xff,
      status = 2,
      authPluginData = nonce20,
      authPlugin = Some(plugin))), 0)

  private val okPayload: Array[Byte] =
    Array[Byte](0x00, 0x00, 0x00, 0x02, 0x00, 0x00, 0x00)
  private val eofPayload: Array[Byte] =
    Array[Byte](0xfe.toByte, 0x00, 0x00, 0x02, 0x00)

  private def ok(seq: Int) = Wire.framePackets(okPayload, seq)
  private def eof(seq: Int) = Wire.framePackets(eofPayload, seq)

  private def cd(name: String): Wire.ColumnDef =
    Wire.ColumnDef("def", "", "", "", name, name, 33, 255, 0xfd, 0, 0)

  private def channel(serverBytes: Array[Byte]*):
      (WireChannel, java.io.ByteArrayOutputStream) = {
    val in = new java.io.ByteArrayInputStream(serverBytes.flatten.toArray)
    val out = new java.io.ByteArrayOutputStream()
    (new WireChannel(in, out), out)
  }

  test("native auth: greeting -> response -> OK; response carries the scramble") {
    val (ch, sent) = channel(greeting("mysql_native_password"), ok(2))
    WireSocket.authenticate(ch, "repl", "secret", Some("db1"))
    // what the client wrote: exactly one framed handshake response
    val (payload, _, seq) = Wire.readPacket(sent.toByteArray, 0)
    assert(seq == 1)
    val s = new String(payload, "ISO-8859-1")
    assert(s.contains("repl"))
    assert(s.contains("mysql_native_password"))
    val scramble = Wire.scrambleNative("secret", nonce20)
    assert(s.contains(new String(scramble, "ISO-8859-1")),
      "response must embed the native scramble of the greeting nonce")
  }

  test("auth switch: server redirects caching_sha2 -> native, client re-scrambles") {
    val switchNonce = Array.tabulate(20)(i => (i + 90).toByte)
    val switchPayload = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(0xfe)
      b.write("mysql_native_password".getBytes("UTF-8")); b.write(0)
      b.write(switchNonce); b.write(0)
      b.toByteArray
    }
    val (ch, sent) = channel(
      greeting("caching_sha2_password"),
      Wire.framePackets(switchPayload, 2),
      ok(4))
    WireSocket.authenticate(ch, "repl", "secret", None)
    // second client packet = the re-scrambled reply under the
    // switched plugin and the SWITCH nonce, seq 3
    val raw = sent.toByteArray
    val (_, used, _) = Wire.readPacket(raw, 0)
    val (reply, _, seq) = Wire.readPacket(raw, used)
    assert(seq == 3)
    assert(reply.toSeq == Wire.scrambleNative("secret", switchNonce).toSeq)
  }

  test("auth switch after a fast-auth exchange replies at the shifted sequence") {
    // greeting 0, response 1, fast-auth verdict 2, switch 3 → the
    // reply must continue at 4, not a hardcoded 3 — a
    // sequence-strict server drops the connection otherwise
    val switchNonce = Array.tabulate(20)(i => (i + 33).toByte)
    val switchPayload = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(0xfe)
      b.write("mysql_native_password".getBytes("UTF-8")); b.write(0)
      b.write(switchNonce); b.write(0)
      b.toByteArray
    }
    val fastOk = Wire.framePackets(Array[Byte](0x01, 0x03), 2)
    val (ch, sent) = channel(
      greeting("caching_sha2_password"),
      fastOk,
      Wire.framePackets(switchPayload, 3),
      ok(5))
    WireSocket.authenticate(ch, "repl", "secret", None)
    val raw = sent.toByteArray
    val (_, used, _) = Wire.readPacket(raw, 0)
    val (reply, _, seq) = Wire.readPacket(raw, used)
    assert(seq == 4, s"switch reply must continue the server's sequence, got $seq")
    assert(reply.toSeq == Wire.scrambleNative("secret", switchNonce).toSeq)
  }

  test("caching_sha2 fast-auth success reads through to the OK") {
    val fastOk = Wire.framePackets(Array[Byte](0x01, 0x03), 2)
    val (ch, _) = channel(greeting("caching_sha2_password"), fastOk, ok(3))
    WireSocket.authenticate(ch, "repl", "secret", None) // must not throw
  }

  test("caching_sha2 full-auth demand fails loudly (TLS not implemented)") {
    val fullAuth = Wire.framePackets(Array[Byte](0x01, 0x04), 2)
    val (ch, _) = channel(greeting("caching_sha2_password"), fullAuth)
    val e = intercept[IllegalStateException] {
      WireSocket.authenticate(ch, "repl", "secret", None)
    }
    assert(e.getMessage.contains("full auth"), e.getMessage)
  }

  test("auth ERR surfaces the server's code and message") {
    val errPayload = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(0xff); b.write(0x15); b.write(0x04) // 1045
      b.write('#'); b.write("28000".getBytes); b.write("Access denied".getBytes)
      b.toByteArray
    }
    val (ch, _) = channel(
      greeting("mysql_native_password"), Wire.framePackets(errPayload, 2))
    val e = intercept[IllegalStateException] {
      WireSocket.authenticate(ch, "repl", "bad", None)
    }
    assert(e.getMessage.contains("1045") && e.getMessage.contains("Access denied"))
  }

  test("query over the channel decodes a streamed text resultset") {
    val rs = Wire.ResultSet(
      Seq(cd("File"), cd("Position")),
      Seq(Seq(Some("binlog.000007"), Some("1234"))))
    val (ch, sent) = channel(
      greeting("mysql_native_password"), ok(2),
      Wire.encodeResultSet(rs, 1))
    val conn = WireSocket.authenticate(ch, "repl", "secret", None)
    val got = conn.query("show master status")
    assert(got.isRight)
    assert(got.toOption.get(0, "File").contains("binlog.000007"))
    // the channel sent COM_QUERY with a fresh sequence
    val raw = sent.toByteArray
    val (_, used, _) = Wire.readPacket(raw, 0)
    val (q, _, seq) = Wire.readPacket(raw, used)
    assert(seq == 0 && q(0) == 0x03)
  }

  test("binlogDump: ping + checksum + status seed the dump; events stream OK-stripped") {
    val status = Wire.ResultSet(
      Seq(cd("File"), cd("Position"), cd("Binlog_Do_DB"),
        cd("Binlog_Ignore_DB"), cd("Executed_Gtid_Set")),
      Seq(Seq(Some("binlog.000003"), Some("4"), Some(""), Some(""), Some(""))))
    val ev1 = Array[Byte](1, 2, 3, 4)
    val ev2 = Array[Byte](9, 8, 7)
    val (ch, sent) = channel(
      greeting("mysql_native_password"), ok(2), // auth
      ok(1),                                    // ping reply
      ok(1),                                    // checksum set reply
      Wire.encodeResultSet(status, 1),          // show master status
      Wire.framePackets(0x00.toByte +: ev1, 1), // dump events
      Wire.framePackets(0x00.toByte +: ev2, 2),
      eof(3))
    val conn = WireSocket.authenticate(ch, "repl", "secret", None)
    val events = conn.binlogDump(serverId = 1001L).toSeq
    assert(events.map(_.toSeq) == Seq(ev1.toSeq, ev2.toSeq))
    // the last client command is COM_BINLOG_DUMP seeded from the
    // status row (pos 4, file binlog.000003)
    val raw = sent.toByteArray
    var off = 0
    var last: Array[Byte] = Array.empty
    while (off < raw.length) {
      val (p, used, _) = Wire.readPacket(raw, off); off += used; last = p
    }
    assert(last.toSeq == Wire.encodeComBinlogDump(4L, 1001L, "binlog.000003").toSeq)
  }

  test("channel reassembles the 16MB continuation framing") {
    // a payload of exactly 0xffffff forces an empty continuation
    val big = Array.fill[Byte](Wire.MaxChunk)(0x61)
    val (ch, _) = channel(Wire.framePackets(big, 0))
    assert(ch.readPayload().length == Wire.MaxChunk)
  }
}

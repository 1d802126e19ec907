package graft.sources.binlog

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Clean-room decoder for MySQL's binary JSON ("JSONB") column
  * storage format, written against the public layout documentation
  * (MySQL source `sql/json_binary.h` header comment / WL#8132;
  * the same layout mysqlbinlog's --verbose JSON printing walks).
  * The reference surfaces JSON columns as raw blob bytes
  * (rust-cdc `src/mysql/event/mod.rs` blob path); decoding to JSON
  * text goes beyond it usefully — CDC'd JSON columns become
  * directly queryable (get_json_object / q26-style) off the
  * changelog.
  *
  * Layout summary (all little-endian):
  *  - value = 1 type byte + payload
  *  - 0x00/0x01 small/large object, 0x02/0x03 small/large array:
  *    element-count + byte-size (u16 small / u32 large), then for
  *    objects key entries (offset + u16 key length), then value
  *    entries (type byte + offset-or-inlined-scalar), then the
  *    keys and the non-inlined values. Offsets are relative to the
  *    start of the count field.
  *  - inlined in the value entry: literal (0x04: 0 null / 1 true /
  *    2 false), int16/uint16 (0x05/0x06); in LARGE documents also
  *    int32/uint32 (0x07/0x08).
  *  - 0x07/0x08 int32/uint32, 0x09/0x0a int64/uint64, 0x0b double
  *  - 0x0c string: varint length (7 bits per byte, high bit =
  *    continuation), then utf8 bytes
  *  - 0x0f opaque: 1 field-type byte + varint length + payload —
  *    surfaced as "0x…" hex, the library's binary convention.
  *
  * `decode` is total: any structural violation (offset out of
  * bounds, truncated header, unknown type) returns None so the
  * caller can fall back to the hex surface instead of corrupting
  * the row image.
  */
object Jsonb {

  /** JSONB column payload bytes → canonical JSON text, or None if
    * the bytes are not well-formed JSONB.
    */
  def decode(bytes: Array[Byte]): Option[String] = {
    if (bytes.length < 1) return None
    try {
      val sb = new StringBuilder
      value(bytes, bytes(0) & 0xff, 1, sb, large = false)
      Some(sb.toString)
    } catch {
      case _: MalformedJsonb | _: IndexOutOfBoundsException => None
    }
  }

  private final class MalformedJsonb extends RuntimeException
  private def bad(): Nothing = throw new MalformedJsonb

  private def u16(a: Array[Byte], p: Int): Int = {
    if (p + 2 > a.length) bad()
    (a(p) & 0xff) | ((a(p + 1) & 0xff) << 8)
  }
  private def u32(a: Array[Byte], p: Int): Long = {
    if (p + 4 > a.length) bad()
    (a(p) & 0xffL) | ((a(p + 1) & 0xffL) << 8) |
      ((a(p + 2) & 0xffL) << 16) | ((a(p + 3) & 0xffL) << 24)
  }
  private def i64(a: Array[Byte], p: Int): Long = {
    if (p + 8 > a.length) bad()
    ByteBuffer.wrap(a, p, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
  }

  /** varint (string/opaque length): 7 bits per byte, LSB group
    * first, high bit = continuation; capped at 5 bytes like the
    * server. Returns (value, bytesConsumed).
    */
  private def varlen(a: Array[Byte], p: Int): (Int, Int) = {
    var v = 0L; var i = 0
    while (i < 5) {
      if (p + i >= a.length) bad()
      val b = a(p + i) & 0xff
      v |= (b & 0x7fL) << (7 * i)
      i += 1
      if ((b & 0x80) == 0) {
        if (v > Int.MaxValue) bad()
        return (v.toInt, i)
      }
    }
    bad()
  }

  /** Append one value of `tpe` whose payload starts at `p`.
    * `large` selects the 4-byte offset width for inlined-scalar
    * width decisions at the CONTAINER level; scalars reached
    * through a value-entry pass their own position.
    */
  private def value(a: Array[Byte], tpe: Int, p: Int, sb: StringBuilder,
      large: Boolean): Unit = tpe match {
    case 0x00 | 0x01 => container(a, p, sb, obj = true, large = tpe == 0x01)
    case 0x02 | 0x03 => container(a, p, sb, obj = false, large = tpe == 0x03)
    case 0x04 => // literal
      if (p >= a.length) bad()
      sb.append((a(p) & 0xff) match {
        case 0 => "null"; case 1 => "true"; case 2 => "false"; case _ => bad()
      })
    case 0x05 => sb.append(u16(a, p).toShort.toInt) // int16
    case 0x06 => sb.append(u16(a, p)) // uint16
    case 0x07 => sb.append(u32(a, p).toInt) // int32
    case 0x08 => sb.append(u32(a, p)) // uint32
    case 0x09 => sb.append(i64(a, p)) // int64
    case 0x0a => // uint64: print unsigned
      sb.append(java.lang.Long.toUnsignedString(i64(a, p)))
    case 0x0b => // double — integral values print as "N.0" (MySQL's
      // own JSON text keeps the double-vs-int distinction: 2.0, not 2)
      val d = java.lang.Double.longBitsToDouble(i64(a, p))
      if (d == d.toLong && math.abs(d) < 1e15)
        sb.append(d.toLong).append(".0")
      else sb.append(d)
    case 0x0c => // string
      val (len, n) = varlen(a, p)
      if (p + n + len > a.length) bad()
      appendJsonString(sb, new String(a, p + n, len, StandardCharsets.UTF_8))
    case 0x0f => // opaque: field-type byte + varlen payload → hex
      if (p >= a.length) bad()
      val (len, n) = varlen(a, p + 1)
      val start = p + 1 + n
      if (start + len > a.length) bad()
      sb.append("\"0x")
      (start until start + len).foreach(i => sb.append("%02x".format(a(i) & 0xff)))
      sb.append('"')
    case _ => bad()
  }

  /** Object/array body at `p` (the count field). Value entries hold
    * either an inlined scalar or an offset relative to `p`.
    */
  private def container(a: Array[Byte], p: Int, sb: StringBuilder,
      obj: Boolean, large: Boolean): Unit = {
    val w = if (large) 4 else 2 // count/size/offset width
    val count = (if (large) u32(a, p) else u16(a, p).toLong).toInt
    val size = (if (large) u32(a, p + w) else u16(a, p + w).toLong).toInt
    if (count < 0 || size < 0 || p + size > a.length) bad()
    val keyEntries = p + 2 * w
    val valEntries = keyEntries + (if (obj) count * (w + 2) else 0)
    // every entry header must live inside the declared size
    if (valEntries + count * (1 + w) > p + size) bad()
    sb.append(if (obj) '{' else '[')
    var i = 0
    while (i < count) {
      if (i > 0) sb.append(',')
      if (obj) {
        val ke = keyEntries + i * (w + 2)
        val keyOff = if (large) u32(a, ke).toInt else u16(a, ke)
        val keyLen = u16(a, ke + w)
        if (p + keyOff + keyLen > a.length) bad()
        appendJsonString(sb,
          new String(a, p + keyOff, keyLen, StandardCharsets.UTF_8))
        sb.append(':')
      }
      val ve = valEntries + i * (1 + w)
      val vType = a(ve) & 0xff
      val inlined = vType match {
        case 0x04 | 0x05 | 0x06 => true
        case 0x07 | 0x08 => large // int32 inlines only in large docs
        case _ => false
      }
      if (inlined) value(a, vType, ve + 1, sb, large)
      else {
        val off = if (large) u32(a, ve + 1).toInt else u16(a, ve + 1)
        if (off < 0 || off >= size) bad()
        value(a, vType, p + off, sb, large)
      }
      i += 1
    }
    sb.append(if (obj) '}' else ']')
  }

  private def appendJsonString(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append("\\u%04x".format(c.toInt))
      case c => sb.append(c)
    }
    sb.append('"')
  }
}

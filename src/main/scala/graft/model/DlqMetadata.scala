package graft.model

import java.io.ByteArrayOutputStream

/**
 * The logical-identity envelope carried as the Kafka record *key* on
 * retry/DLQ/resq topics: when a message is re-produced to a queue topic, its
 * original (logical) coordinates + redelivery counters are serialized into
 * the key, and the original user key moves into `data`.
 *
 * Field set and semantics mirror the reference proto
 * (reference: idl/src/main/proto/data/kafka/messaging-consumer/dlq_metadata.proto:16-38).
 *
 * The codec below writes standard proto3 wire format (varint/length-delimited,
 * default-valued fields omitted), so round-trips are stable and the bytes are
 * interoperable with any proto3 parser of the same schema.
 */
final case class DlqMetadata(
    retryCount: Long = 0L,     // field 1
    topic: String = "",        // field 2 — logical (original) topic
    partition: Int = 0,        // field 3
    offset: Long = 0L,         // field 4
    timestampNs: Long = 0L,    // field 5
    data: Array[Byte] = Array.emptyByteArray, // field 6 — original user key
    timeoutCount: Long = 0L) { // field 7

  override def equals(o: Any): Boolean = o match {
    case m: DlqMetadata =>
      retryCount == m.retryCount && topic == m.topic &&
        partition == m.partition && offset == m.offset &&
        timestampNs == m.timestampNs &&
        java.util.Arrays.equals(data, m.data) && timeoutCount == m.timeoutCount
    case _ => false
  }
  override def hashCode: Int =
    (retryCount, topic, partition, offset, timestampNs,
      java.util.Arrays.hashCode(data), timeoutCount).hashCode
}

object DlqMetadata {

  // ---- proto3 wire-format primitives (public wire spec) ----

  private def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeTag(out: ByteArrayOutputStream, field: Int, wireType: Int): Unit =
    writeVarint(out, ((field << 3) | wireType).toLong)

  private def writeVarintField(out: ByteArrayOutputStream, field: Int, value: Long): Unit =
    if (value != 0L) { writeTag(out, field, 0); writeVarint(out, value) }

  private def writeBytesField(out: ByteArrayOutputStream, field: Int, value: Array[Byte]): Unit =
    if (value.nonEmpty) {
      writeTag(out, field, 2); writeVarint(out, value.length.toLong); out.write(value)
    }

  def encode(m: DlqMetadata): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    writeVarintField(out, 1, m.retryCount)
    writeBytesField(out, 2, m.topic.getBytes("UTF-8"))
    // proto3 int32: negatives sign-extend to 10-byte varints (wire-correct).
    writeVarintField(out, 3, m.partition.toLong)
    writeVarintField(out, 4, m.offset)
    writeVarintField(out, 5, m.timestampNs)
    writeBytesField(out, 6, m.data)
    writeVarintField(out, 7, m.timeoutCount)
    out.toByteArray
  }

  private final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < bytes.length
    def readVarint(): Long = {
      var shift = 0; var result = 0L
      while (shift < 64) {
        val b = bytes(pos); pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def readBytes(): Array[Byte] = {
      val len = readVarint().toInt
      if (len < 0 || pos + len > bytes.length)
        throw new IllegalArgumentException("truncated length-delimited field")
      val r = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len
      r
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint(); ()
      case 1 => pos += 8
      case 2 =>
        // validate like readBytes: a hostile length varint whose toInt is
        // negative would move pos BACKWARDS and loop decode() forever
        val len = readVarint().toInt
        if (len < 0 || pos + len > bytes.length)
          throw new IllegalArgumentException("truncated length-delimited field")
        pos += len
      case 5 => pos += 4
      case _ => throw new IllegalArgumentException(s"unsupported wire type $wireType")
    }
  }

  /** Decode; returns None on malformed input (treated as a plain user key). */
  def decode(bytes: Array[Byte]): Option[DlqMetadata] =
    if (bytes == null) None
    else try {
      val r = new Reader(bytes)
      var m = DlqMetadata()
      while (r.hasMore) {
        val tag = r.readVarint()
        val field = (tag >>> 3).toInt
        val wt = (tag & 7).toInt
        field match {
          case 1 if wt == 0 => m = m.copy(retryCount = r.readVarint())
          case 2 if wt == 2 => m = m.copy(topic = new String(r.readBytes(), "UTF-8"))
          case 3 if wt == 0 => m = m.copy(partition = r.readVarint().toInt)
          case 4 if wt == 0 => m = m.copy(offset = r.readVarint())
          case 5 if wt == 0 => m = m.copy(timestampNs = r.readVarint())
          case 6 if wt == 2 => m = m.copy(data = r.readBytes())
          case 7 if wt == 0 => m = m.copy(timeoutCount = r.readVarint())
          case _ => r.skip(wt)
        }
      }
      Some(m)
    } catch { case _: Exception => None }
}

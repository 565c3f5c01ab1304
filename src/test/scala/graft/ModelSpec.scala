package graft

import graft.model._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class ModelSpec extends AnyFunSuite {

  /** Minimal property-check driver over a ScalaCheck Gen (scalatestplus
    * bridge isn't on the offline classpath). Deterministic seeds. */
  private def forAll[T](gen: Gen[T], n: Int = 200)(f: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  // --- response-code mapping (DispatcherImpl.java:70-131 contract) ---

  test("codeFor maps gRPC statuses per contract") {
    import DispatchCode._
    val cases = Seq(
      ("OK", false, Commit), ("ALREADY_EXISTS", false, Skip),
      ("RESOURCE_EXHAUSTED", false, Retry),
      ("NOT_FOUND", false, Dlq), ("INVALID_ARGUMENT", false, Dlq),
      ("FAILED_PRECONDITION", false, Dlq), ("ABORTED", false, Dlq),
      ("OUT_OF_RANGE", false, Dlq), ("DATA_LOSS", false, Dlq),
      ("DEADLINE_EXCEEDED", false, Backoff),
      ("UNAVAILABLE", true, Backoff), ("UNAVAILABLE", false, Invalid),
      ("UNKNOWN", false, Invalid), ("CANCELLED", false, Invalid),
      ("UNIMPLEMENTED", false, Invalid), ("INTERNAL", false, Invalid),
      ("PERMISSION_DENIED", false, Invalid), ("UNAUTHENTICATED", false, Invalid))
    cases.foreach { case (st, overdue, want) =>
      assert(Responses.codeFor(st, overdue, None) == want, s"status=$st")
    }
  }

  test("kafka-action trailer overrides the status mapping") {
    assert(Responses.codeFor("OK", false, Some("Retry")) == DispatchCode.Retry)
    assert(Responses.codeFor("INTERNAL", false, Some("Stash")) == DispatchCode.Dlq)
    assert(Responses.codeFor("INTERNAL", false, Some("Skip")) == DispatchCode.Skip)
    // unknown action falls through to status mapping
    assert(Responses.codeFor("OK", false, Some("Bogus")) == DispatchCode.Commit)
  }

  // --- tiered retry-topic selection (RetryUtils.java:23-58 contract) ---

  private val spec = JobSpec(
    jobGroupId = "t__g", cluster = "c1", topic = "t", consumerGroup = "g",
    rpc = RpcSpec("grpc://svc", "kafka.consumerproxy.g/t", dlqTopic = "t__g__dlq"),
    retryEnabled = true,
    retryTiers = Seq(
      RetryTier("t__g__2__retry", 60000L, 2),   // deliberately unsorted
      RetryTier("t__g__1__retry", 1000L, 3)))

  test("destinationRetryTopic walks cumulative ceilings in delay order") {
    // tier1 covers retryCount 0..3, tier2 covers 4..5, overflow -> DLQ
    (0L to 3L).foreach(rc =>
      assert(Routing.destinationRetryTopic(spec, rc) == "t__g__1__retry", s"rc=$rc"))
    (4L to 5L).foreach(rc =>
      assert(Routing.destinationRetryTopic(spec, rc) == "t__g__2__retry", s"rc=$rc"))
    assert(Routing.destinationRetryTopic(spec, 6L) == "t__g__dlq")
  }

  test("destinationRetryTopic overflow falls back to last tier when DLQ empty") {
    val noDlq = spec.copy(rpc = spec.rpc.copy(dlqTopic = ""))
    assert(Routing.destinationRetryTopic(noDlq, 100L) == "t__g__2__retry")
  }

  test("destinationRetryTopic without tiered retry goes straight to DLQ") {
    val plain = spec.copy(retryEnabled = false)
    assert(Routing.destinationRetryTopic(plain, 0L) == "t__g__dlq")
  }

  // --- timeout escalation (ProcessorImpl.java:417-465 contract) ---

  test("escalateBackoff: DLQ-origin stays DLQ; resq-origin goes in-memory") {
    val s = spec.copy(resqTopic = "t__g__resq", rpc = spec.rpc.copy(maxRpcTimeouts = 3))
    assert(Routing.escalateBackoff(s, "t__g__dlq", 0, dlqTokenAvailable = true) == DispatchCode.Dlq)
    assert(Routing.escalateBackoff(s, "t__g__resq", 9, dlqTokenAvailable = true) == DispatchCode.Invalid)
    assert(Routing.escalateBackoff(s, "t", 2, dlqTokenAvailable = true) == DispatchCode.Retry)
    assert(Routing.escalateBackoff(s, "t", 3, dlqTokenAvailable = true) == DispatchCode.Dlq)
    assert(Routing.escalateBackoff(s, "t", 3, dlqTokenAvailable = false) == DispatchCode.Retry)
    // maxRpcTimeouts unset -> never escalate to DLQ
    assert(Routing.escalateBackoff(spec, "t", 99, dlqTokenAvailable = true) == DispatchCode.Retry)
  }

  // --- destination routing ---

  test("destinationTopic routes RETRY/DLQ/RESQ and acks the rest") {
    val s = spec.copy(resqTopic = "t__g__resq")
    assert(Routing.destinationTopic(s, DispatchCode.Retry, 0) == Some("t__g__1__retry"))
    assert(Routing.destinationTopic(s, DispatchCode.Dlq, 0) == Some("t__g__dlq"))
    assert(Routing.destinationTopic(s, DispatchCode.Resq, 0) == Some("t__g__resq"))
    assert(Routing.destinationTopic(s, DispatchCode.Commit, 0).isEmpty)
    assert(Routing.destinationTopic(s, DispatchCode.Skip, 0).isEmpty)
    assert(Routing.destinationTopic(s, DispatchCode.Invalid, 0).isEmpty)
  }

  // --- topic naming (UforwarderIntegrationTests.java:76-86 convention) ---

  test("topic naming convention") {
    assert(TopicNames.retry("test-topic-2", "test-group") == "test-topic-2__test-group__retry")
    assert(TopicNames.retry("test-topic-3", "test-group", 1) == "test-topic-3__test-group__1__retry")
    assert(TopicNames.dlq("test-topic-2", "test-group") == "test-topic-2__test-group__dlq")
  }

  // --- DlqMetadata codec (dlq_metadata.proto:16-38 wire format) ---

  test("DlqMetadata round-trips arbitrary values") {
    val gen = for {
      rc <- Gen.chooseNum(0L, Long.MaxValue)
      topic <- Gen.alphaNumStr
      part <- Gen.chooseNum(-1, Int.MaxValue)
      off <- Gen.chooseNum(0L, Long.MaxValue)
      ts <- Gen.chooseNum(0L, Long.MaxValue)
      data <- Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      tc <- Gen.chooseNum(0L, Long.MaxValue)
    } yield DlqMetadata(rc, topic, part, off, ts, data, tc)
    forAll(gen) { m =>
      assert(DlqMetadata.decode(DlqMetadata.encode(m)) == Some(m))
    }
  }

  test("DlqMetadata default encodes to empty bytes and decodes back") {
    assert(DlqMetadata.encode(DlqMetadata()).isEmpty)
    assert(DlqMetadata.decode(Array.emptyByteArray) == Some(DlqMetadata()))
  }

  test("DlqMetadata known wire bytes (proto3 interop)") {
    // retry_count=1, topic="t", partition=2, offset=300, data=[0x41]
    val m = DlqMetadata(retryCount = 1, topic = "t", partition = 2,
      offset = 300, data = Array('A'.toByte))
    val bytes = DlqMetadata.encode(m)
    val want = Array[Int](
      0x08, 0x01,             // field 1 varint 1
      0x12, 0x01, 't'.toInt,  // field 2 "t"
      0x18, 0x02,             // field 3 varint 2
      0x20, 0xac, 0x02,       // field 4 varint 300
      0x32, 0x01, 0x41        // field 6 bytes [A]
    ).map(_.toByte)
    assert(bytes.sameElements(want))
  }

  test("DlqMetadata decode rejects garbage") {
    assert(DlqMetadata.decode(Array[Byte](0x0f, 0x7f, -1, -1)).isEmpty ||
      DlqMetadata.decode(Array[Byte](0x0f, 0x7f, -1, -1)).nonEmpty) // no throw
    // truncated length-delimited field -> None
    assert(DlqMetadata.decode(Array[Byte](0x12, 0x7f, 0x41)).isEmpty)
    // hostile skip: unknown field with a length varint whose toInt is
    // negative previously moved the read position BACKWARDS and hung
    // decode() forever — must return None (in bounded time)
    assert(DlqMetadata.decode(
      Array[Byte](0x42, 0xFA.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0x0F)).isEmpty)
  }
}

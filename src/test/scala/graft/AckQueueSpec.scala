package graft

import graft.streaming.{AckTrackingQueue, HeadBlockingDetector}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class AckQueueSpec extends AnyFunSuite {
  import AckTrackingQueue._

  test("in-order acks advance the watermark one by one") {
    val q = new AckTrackingQueue(100)
    (0L until 10L).foreach(o => assert(q.receive(o)))
    (0L until 10L).foreach { o =>
      assert(q.ack(o + 1) == o + 1)
    }
    assert(q.highestCommittedOffset == 10L)
  }

  test("out-of-order acks commit only the contiguous prefix") {
    val q = new AckTrackingQueue(100)
    (0L until 5L).foreach(q.receive)
    assert(q.ack(3) == InMemoryAckOnly) // offset 2 acked, head (0) not
    assert(q.ack(2) == InMemoryAckOnly) // offset 1 acked
    assert(q.ack(1) == 3L)              // offset 0 acked -> prefix 0,1,2 commits
    assert(q.ack(5) == InMemoryAckOnly)
    assert(q.ack(4) == 5L)
    assert(q.highestCommittedOffset == 5L)
  }

  test("property: watermark == longest contiguous acked prefix (random order)") {
    (0 until 50).foreach { seed =>
      val rnd = new Random(seed)
      val n = 1 + rnd.nextInt(60)
      val q = new AckTrackingQueue(1000)
      (0L until n.toLong).foreach(q.receive)
      val ackedSet = scala.collection.mutable.Set.empty[Long]
      var watermark = 0L
      rnd.shuffle((0L until n.toLong).toList).foreach { o =>
        val r = q.ack(o + 1)
        ackedSet.add(o)
        val prefix = Iterator.from(0).map(_.toLong).takeWhile(ackedSet.contains).size.toLong
        if (prefix > watermark) {
          assert(r == prefix, s"seed=$seed o=$o")
          watermark = prefix
        } else assert(r == InMemoryAckOnly, s"seed=$seed o=$o")
      }
      assert(q.highestCommittedOffset == n.toLong)
      assert(q.size == 0)
    }
  }

  test("duplicate / out-of-range acks return sentinels") {
    val q = new AckTrackingQueue(100)
    (0L until 3L).foreach(q.receive)
    assert(q.ack(1) == 1L)
    assert(q.ack(1) == CannotAck)     // already committed
    assert(q.ack(99) == CannotAck)    // never received
    assert(q.ack(3) == InMemoryAckOnly)
    assert(q.ack(3) == DuplicatedAck)
  }

  test("nack only transitions Unset and rejects repeats") {
    val q = new AckTrackingQueue(100)
    (0L until 3L).foreach(q.receive)
    assert(q.nack(2))
    assert(!q.nack(2))       // already nacked
    assert(q.ack(2) == InMemoryAckOnly) // nacked -> acked fine
    assert(!q.nack(2))       // already acked
    assert(!q.nack(99))      // out of range
  }

  test("capacity bounds admission") {
    val q = new AckTrackingQueue(3)
    assert(q.receive(0) && q.receive(1) && q.receive(2))
    assert(q.isFull)
    assert(!q.receive(3))
    assert(q.ack(1) == 1L)
    assert(!q.isFull)
    assert(q.receive(3))
  }

  test("out-of-order receives are ignored") {
    val q = new AckTrackingQueue(100)
    assert(q.receive(5))
    assert(!q.receive(3))
    assert(q.receive(6))
  }

  test("cancel transitions and excludes from cancelable set") {
    val q = new AckTrackingQueue(100)
    (0L until 4L).foreach(q.receive)
    assert(q.lowestCancelableOffset == 0L)
    assert(q.cancel(1))            // cancel offset 0
    assert(!q.cancel(1))           // already canceled
    assert(q.lowestCancelableOffset == 1L)
    assert(q.ack(1) == 1L)         // canceled -> acked commits
    assert(!q.cancel(1))           // committed
  }

  test("head-of-line detector fires only under load with acked tail") {
    val det = HeadBlockingDetector(criticalLoadFactor = 0.9, minAckPercent = 0.7)
    val q = new AckTrackingQueue(10)
    (0L until 10L).foreach(q.receive)
    assert(det.detect(q).isEmpty) // nothing acked yet
    (2L until 10L).foreach(o => q.ack(o + 1)) // 8/10 acked, head blocked
    assert(det.detect(q) == Some(0L))
    q.cancel(1)
    // after canceling the head, next cancelable is offset 1
    assert(det.detect(q) == Some(1L))
  }

  test("sparse offsets (compacted topic) commit correctly") {
    val q = new AckTrackingQueue(100)
    Seq(10L, 20L, 30L).foreach(q.receive)
    assert(q.ack(21) == InMemoryAckOnly)
    assert(q.ack(11) == 21L)  // purges 10 and 20 -> watermark 21
    assert(q.ack(31) == 31L)
  }
}

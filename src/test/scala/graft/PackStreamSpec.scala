package graft

import graft.streaming.PackStream
import graft.streaming.PackStream.{Doc, Packed}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sequence packing: assignments follow the batch q63 rule
  * (sequence = running-total start div budget), are independent of how
  * the ordered feed is batched, and the running fill survives a
  * checkpoint restart. */
class PackStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val Budget = 100L

  /** Independent replay of the q63 assignment rule per source. */
  private def reference(docs: Seq[Doc]): Seq[Packed] =
    docs.groupBy(_.source).toSeq.flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_.docId).map { d =>
        val p = Packed(src, d.docId, d.tokens, cum / Budget, cum % Budget)
        cum += d.tokens
        p
      }
    }

  private def feed: Seq[Doc] =
    (0 until 40).map { i =>
      Doc(if (i % 2 == 0) "src_a" else "src_b", i.toLong, 15L + (i % 4) * 10L)
    } :+ Doc("src_a", 100L, 250L) // bigger than the budget: straddles whole

  private def run(batches: Seq[Seq[Doc]], name: String): Seq[Packed] = {
    val input = MemoryStream[Doc](
      implicitly[org.apache.spark.sql.Encoder[Doc]], spark.sqlContext)
    val q = PackStream.pack(input.toDS(), Budget)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).as[Packed].collect().toSeq
    } finally q.stop()
  }

  test("assignments equal the batch rule and are batching-invariant") {
    val expected = reference(feed).toSet
    // one big trigger vs many small triggers over the same ordered feed
    val oneShot = run(Seq(feed), "pack_one")
    val dribbled = run(feed.grouped(7).toSeq, "pack_many")
    assert(oneShot.toSet == expected)
    assert(dribbled.toSet == expected)
    // the oversized doc occupies its own tail: startOff < budget always
    val big = oneShot.find(_.docId == 100L).get
    assert(big.startOff < Budget && big.tokens > Budget)
    // sequences are dense per source from 0
    oneShot.groupBy(_.source).foreach { case (_, ps) =>
      val idxs = ps.map(_.seqIdx).distinct.sorted
      assert(idxs == (0L to idxs.max).toSeq)
    }
  }

  test("the running fill survives a checkpoint restart") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pack-ckpt").toString
    val input = MemoryStream[Doc](
      implicitly[org.apache.spark.sql.Encoder[Doc]], spark.sqlContext)
    val out = java.util.concurrent.ConcurrentHashMap.newKeySet[Packed]()
    def start() = PackStream.pack(input.toDS(), Budget)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Packed], _: Long) =>
        b.collect().foreach(out.add); ()
      }.start()

    val (first, second) = feed.splitAt(25) // split mid-sequence
    val q1 = start()
    input.addData(first); q1.processAllAvailable()
    q1.stop() // "crash" with open fills in the store

    val q2 = start()
    try {
      input.addData(second); q2.processAllAvailable()
      val got = scala.jdk.CollectionConverters.SetHasAsScala(out).asScala.toSet
      assert(got == reference(feed).toSet,
        "recovered fills diverged from the uninterrupted run")
    } finally q2.stop()
  }
}

package graft

import graft.streaming.CalibrationStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** CalibrationStream must equal batch q139's selection over exactly the
  * documents fed so far, after EVERY trigger — the live threshold is the
  * batch threshold of the accumulated prefix, not an approximation. */
class CalibrationStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val Target = 600L

  /** q139's selection replayed in plain Scala over (source, score) counts */
  private def batchThreshold(scores: Seq[Long]): (Long, Long, Long) = {
    val hist = scores.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(-_._1)
    val total = scores.size.toLong
    var cum = 0L
    for ((s, c) <- hist) {
      cum += c
      if (cum * 1000L >= Target * total) return (s, cum, total)
    }
    (Long.MinValue, total, total)
  }

  /** a doc with an exact token-density score: `tk` one-char tokens over a
    * padded length — score = tk * 1000 DIV len */
  private def docWithScore(tk: Int, len: Int): String = {
    val base = Seq.fill(tk)("a").mkString(" ") // length 2*tk - 1
    base + "x" * (len - base.length) // trailing non-space padding joins the last token
  }

  test("after every trigger the live threshold equals batch q139 on the fed prefix") {
    val rnd = new scala.util.Random(11)
    val input = MemoryStream[(String, String)](
      implicitly[org.apache.spark.sql.Encoder[(String, String)]], spark.sqlContext)
    val q = CalibrationStream.monitor(input.toDF().toDF("source", "text"), Target)
      .writeStream.outputMode("append").format("memory").queryName("calib").start()
    try {
      val fedScores = scala.collection.mutable.Map.empty[String, Vector[Long]]
        .withDefaultValue(Vector.empty)
      for (t <- 1 to 5) {
        val batch = (0 until 2).flatMap { s =>
          (0 until 40).map { _ =>
            val tk = 5 + rnd.nextInt(20)
            val len = 2 * tk - 1 + rnd.nextInt(50)
            (s"src$s", docWithScore(tk, len))
          }
        }
        // expected score from the SAME formula (tokens·1000 DIV length)
        batch.foreach { case (src, text) =>
          val tk = text.split("[ ]+").count(_.nonEmpty).toLong
          fedScores(src) = fedScores(src) :+ (tk * 1000L / text.length)
        }
        input.addData(batch)
        q.processAllAvailable()
        val rows = spark.sql(
            s"SELECT source, threshold, accepted_docs, total_docs FROM calib WHERE trigger = $t")
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        for (src <- Seq("src0", "src1")) {
          val exp = batchThreshold(fedScores(src))
          assert(rows(src) == exp,
            s"trigger $t $src: stream=${rows(src)} batch=$exp scores=${fedScores(src).sorted}")
        }
      }
      // state is bounded by sources × score-domain entries (+ trigger
      // counters), never by the 400 documents fed
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      val domain = fedScores.values.flatten.toSet.size
      assert(stateRows <= (domain + 4L) * 2L,
        s"state not bounded by the score domain: $stateRows rows for domain $domain")
    } finally q.stop()
  }

  test("a drifting source moves its threshold the same trigger") {
    val input = MemoryStream[(String, String)](
      implicitly[org.apache.spark.sql.Encoder[(String, String)]], spark.sqlContext)
    val q = CalibrationStream.monitor(input.toDF().toDF("source", "text"), Target)
      .writeStream.outputMode("append").format("memory").queryName("calib_drift").start()
    try {
      // phase 1: dense docs (high scores); phase 2: a flood of sparse docs
      input.addData((0 until 50).map(_ => ("s", docWithScore(20, 45))))
      q.processAllAvailable()
      input.addData((0 until 200).map(_ => ("s", docWithScore(5, 200))))
      q.processAllAvailable()
      val th = spark.sql("SELECT trigger, threshold FROM calib_drift ORDER BY trigger")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(th.length == 2)
      assert(th(1)._2 < th(0)._2,
        s"sparse flood must pull the 60%-acceptance cutoff down: $th")
    } finally q.stop()
  }
}

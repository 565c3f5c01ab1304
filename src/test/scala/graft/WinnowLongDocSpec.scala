package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q135 long-document chunking: documents beyond the 2^21-char position
  * budget are segmented into overlapping chunks (k+w-2-char overlap)
  * instead of dropped — at production scale the longest documents are
  * prime near-dup candidates. The winnowing guarantee (any shared
  * substring of >= k+w-1 chars yields a shared fingerprint) must survive
  * segmentation, including for content that sits wholly beyond the first
  * chunk and content that straddles the chunk boundary itself. */
class WinnowLongDocSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** deterministic letters+single-spaces text: no doubled whitespace, no
    * leading space, so q135's norm (lowercase, squeeze, trim) is a no-op
    * and substring positions are stable */
  private def lcgText(seed0: Long, n: Int, lo: Char, hi: Char): String = {
    val w = hi - lo + 1
    val sb = new StringBuilder(n)
    var s = seed0
    var i = 0
    while (i < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val r = ((s >>> 33) % (w + 1)).toInt
      sb.append(
        if (r == w && i > 0 && sb.charAt(i - 1) != ' ') ' '
        else (lo + (r % w)).toChar)
      i += 1
    }
    // no trailing space: trim must not shift positions
    if (sb.charAt(n - 1) == ' ') sb.setCharAt(n - 1, lo)
    sb.toString
  }

  test("a >2M-char doc is chunked and pairs with docs sharing tail / boundary content") {
    import graft.operators.TextOps
    val boundary = TextOps.WinPosCap.toInt // 2^21 = 2097152
    val big = lcgText(1, boundary + 52848, 'a', 'm') // 2 chunks (2,150,000 chars)
    // wholly inside the SECOND chunk — the part the old code dropped
    val tail = big.substring(boundary + 2848, boundary + 8848)
    // straddles the chunk boundary: every window still falls fully inside
    // one chunk thanks to the k+w-2 overlap
    val straddle = big.substring(boundary - 3000, boundary + 3000)
    val rows = Seq(
      (1L, big, "en", "web", big.length.toLong),
      (2L, ("zq " * 100) + tail + (" qz" * 100), "en", "web", 6600L),
      (3L, ("xk " * 100) + straddle + (" kx" * 100), "en", "web", 6600L),
      // disjoint alphabet: shares NO true k-gram with the big doc, so any
      // shared fingerprint is pure 2^30-space hash collision (a handful)
      (4L, lcgText(99, 20000, 'n', 'z'), "en", "web", 20000L))
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow").toString
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.q135WinnowPairs(spark, dir).collect()
      .map(r => ((r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    // a 6000-char shared substring yields ~2.4k shared fingerprints at
    // winnowing density 2/(w+1); 50 is far under that but far over the
    // ~handful expected from 2^30-space hash collisions with doc 4
    assert(out.getOrElse((1L, 2L), 0L) >= 50L,
      s"no pair with the long doc's second chunk — its tail was dropped: $out")
    assert(out.getOrElse((1L, 3L), 0L) >= 50L,
      s"no pair across the chunk boundary — the overlap guarantee broke: $out")
    // the control doc must not rival true near-dups (hash-collision noise only)
    assert(out.getOrElse((1L, 4L), 0L) < 50L, s"control doc pairs too strongly: $out")
  }
}

package graft

import graft.plans.MinHashSig
import graft.plans.MinHashSig.minhash_sig
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinHashSigSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("identical texts produce identical signatures") {
    val a = MinHashSig.signature("the quick brown fox jumps".getBytes("UTF-8"), 5, 32)
    val b = MinHashSig.signature("the quick brown fox jumps".getBytes("UTF-8"), 5, 32)
    assert(a.sameElements(b))
    assert(a.length == 32)
  }

  test("signature is permutation-insensitive to shingle multiplicity") {
    // repeating content doesn't change the minimum over the shingle set
    val once = MinHashSig.signature("abcdefgh".getBytes, 5, 16)
    val twice = MinHashSig.signature("abcdefghabcdefgh".getBytes, 5, 16)
    // the doubled text adds new bridging shingles so only containment holds:
    // every min in `twice` is <= the corresponding min in `once`
    once.zip(twice).foreach { case (o, t) => assert(t <= o) }
  }

  test("near-identical texts agree on most hash functions") {
    val base = "spark native minhash over rolling shingles for near dup detection " * 4
    val a = MinHashSig.signature(base.getBytes, 5, 32)
    val b = MinHashSig.signature((base + " tail").getBytes, 5, 32)
    val agree = a.zip(b).count { case (x, y) => x == y }
    assert(agree >= 24, s"only $agree/32 hashes agree")
    // unrelated text agrees on almost nothing
    val c = MinHashSig.signature(("zqx" * 90).getBytes, 5, 32)
    assert(a.zip(c).count { case (x, y) => x == y } <= 2)
  }

  test("short documents still get defined signatures") {
    val s = MinHashSig.signature("ab".getBytes, 5, 8)
    assert(s.length == 8)
    assert(!s.contains(Long.MaxValue))
    assert(MinHashSig.signature("ab".getBytes, 5, 8).sameElements(s))
  }

  test("column expression matches the JVM function (codegen parity)") {
    val df = Seq("hello world document one", "another document entirely").toDF("text")
    val got = df.select(minhash_sig(col("text"), 5, 16).as("sig")).collect()
      .map(_.getSeq[Long](0).toArray)
    val want = Seq("hello world document one", "another document entirely")
      .map(t => MinHashSig.signature(t.getBytes("UTF-8"), 5, 16))
    got.zip(want).foreach { case (g, w) => assert(g.sameElements(w)) }
  }

  test("null input yields null") {
    val df = Seq(Option.empty[String], Some("x")).toDF("text")
    val rows = df.select(minhash_sig(col("text")).as("s")).collect()
    assert(rows.exists(_.isNullAt(0)))
    assert(rows.exists(!_.isNullAt(0)))
  }
}

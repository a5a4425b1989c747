package graft

import graft.functions.hashes
import org.apache.spark.sql.functions._

class HashFunctionsSpec extends SparkSpec {

  test("simhash64 computes strict per-bit majority") {
    import spark.implicits._
    // hashes 1,1,2: bit0 count 2/3 -> set; bit1 count 1/3 -> unset
    val r = Seq(Seq(1L, 1L, 2L)).toDF("hs")
      .select(hashes.simhash64($"hs").as("s")).head().getLong(0)
    assert(r == 1L)
    // empty array -> no bits set
    val e = Seq(Seq.empty[Long]).toDF("hs")
      .select(hashes.simhash64($"hs").as("s")).head().getLong(0)
    assert(e == 0L)
  }

  test("minhash_signature: min over permuted hashes, superset dominates") {
    import spark.implicits._
    val p = 2147483647L
    val a = Seq(3L, 5L); val b = Seq(7L, 11L)
    val df = Seq(
      (1, Seq(100L, 200L)),
      (2, Seq(100L, 200L, 300L))).toDF("id", "hs")
      .select($"id", hashes.minhashSignature($"hs", a, b, p).as("sig"))
    val rows = df.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    // hand-compute for id 1: min over x of (a*x+b) mod p
    assert(rows(1) == Seq(3 * 100 + 7, 5 * 100 + 11).map(_.toLong))
    // signature of a superset is element-wise <= (more candidates to min over)
    assert(rows(1).zip(rows(2)).forall { case (s1, s2) => s2 <= s1 })
  }

  test("simhash of identical inputs identical; one-token change flips few bits") {
    import spark.implicits._
    val toks = (1 to 50).map(i => s"tok$i")
    val mutated = toks.updated(10, "changed")
    val df = Seq(("a", toks), ("b", toks), ("c", mutated)).toDF("id", "toks")
      .select($"id", hashes.simhash64(expr("transform(toks, t -> xxhash64(t))")).as("s"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    assert(java.lang.Long.bitCount(m("a") ^ m("c")) <= 16)
  }
}

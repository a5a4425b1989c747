package graft

import graft.api.VectorCollection
import graft.operators.VectorSearch
import org.apache.spark.sql.functions._

class MmrSpec extends SparkSpec {

  test("searchMmr skips the near-duplicate a plain top-k would take") {
    import spark.implicits._
    // q points along x; a and a' are the SAME vector (an exact dup),
    // b is comparably relevant but on the other side of q. Plain
    // top-2 = {a, a'}; MMR must take b second — a' scores
    // λ·qsim − (1−λ)·1.0 < λ·qsim(b) − (1−λ)·sim(b,a).
    def vec(x: Double, y: Double): Array[Float] =
      Array(x.toFloat, y.toFloat) ++ Array.fill(62)(0.0f)
    val corpus = Seq(
      (1L, vec(0.99, 0.10)),   // a
      (2L, vec(0.99, 0.10)),   // a' (exact dup of a)
      (3L, vec(0.95, -0.31)),  // b (relevant, diverse direction)
      (4L, vec(0.10, 0.99))    // far from q
    ).toDF("id", "embedding")
    val queries = Seq((0L, vec(1.0, 0.0))).toDF("q_id", "q_emb")
    val out = VectorCollection(corpus).searchMmr(queries, k = 3, lambda = 0.5, pool = 4)
      .collect().sortBy(_.getAs[Long]("step"))
      .map(_.getAs[Long]("id"))
    assert(out(0) == 1L, s"step1 must be the top hit, got ${out.toSeq}")
    assert(out(1) == 3L, s"step2 must diversify to b, got ${out.toSeq}")
    assert(out(2) == 2L, s"step3 returns to a', got ${out.toSeq}")
  }

  test("q_mmr returns k deterministic distinct picks per query, top-1 first") {
    val rows = VectorSearch.qMmr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val top1 = VectorSearch.qKnnCosine(spark, sfDir)
      .filter(col("rn") === 1).collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("vec_id")).toMap
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.length == 5)
      assert(rs.map(_.getAs[Long]("vec_id")).distinct.length == 5)
      val first = rs.minBy(_.getAs[Long]("step"))
      assert(first.getAs[Long]("vec_id") == top1(q))
    }
    // deterministic across runs
    val again = VectorSearch.qMmr(spark, sfDir).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }
}

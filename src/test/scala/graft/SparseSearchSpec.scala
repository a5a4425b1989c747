package graft

import graft.operators.SparseSearch
import org.apache.spark.sql.functions._

class SparseSearchSpec extends SparkSpec {

  test("q_sparse_knn scores the sparse dot product over hash buckets") {
    val rows = SparseSearch.qSparseKnn(spark, sfDir).collect()
    assert(rows.length == SparseSearch.K)
    val s = rows.map(_.getAs[Double]("score"))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    assert(s.forall(_ > 0))
    // cross-check the top doc against a driver-side computation
    // (bucket collisions included — that's the sparse encoding)
    val top = rows.head
    val weights = SparseSearch.QueryWeights.map { case (t, w) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16) % SparseSearch.Dims -> w
    }.toMap
    val text = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === top.getAs[Long]("doc_id"))
      .head().getAs[String]("text")
    val expected = text.split(" ").map { tok =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      weights.getOrElse(java.lang.Long.parseLong(md.substring(0, 8), 16) % SparseSearch.Dims, 0.0)
    }.sum
    assert(math.abs(top.getAs[Double]("score") - expected) < 1e-6)
  }
}

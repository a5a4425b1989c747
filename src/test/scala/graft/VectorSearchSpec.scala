package graft

import graft.operators.VectorSearch
import graft.functions.vec
import org.apache.spark.sql.functions._

class VectorSearchSpec extends SparkSpec {

  test("vec expressions match hand-computed values") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(
      vec.dot($"a", $"b").as("d"),
      vec.l2($"a", $"b").as("l"),
      vec.cosine($"a", $"b").as("c"),
      vec.norm($"a").as("n"),
      vec.l1($"a", $"b").as("m")).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(27.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
    assert(math.abs(r.getDouble(3) - math.sqrt(14.0)) < 1e-12)
    assert(r.getDouble(4) == 9.0)
  }

  test("q_knn_cosine: k rows per query, self is rank 1, scores descend") {
    val rows = VectorSearch.qKnnCosine(spark, sfDir).collect()
    val perQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(perQ.nonEmpty)
    perQ.foreach { case (qid, rs) =>
      assert(rs.length == VectorSearch.K)
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      assert(sorted.head.getAs[Long]("vec_id") == qid) // self-match at sim 1.0
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q_knn_l2: self at distance 0, scores ascend") {
    val rows = VectorSearch.qKnnL2(spark, sfDir).collect()
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      assert(sorted.head.getAs[Long]("vec_id") == qid)
      assert(sorted.head.getAs[Double]("score") == 0.0)
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q_knn_filtered only returns corpus with label < 5") {
    val ids = VectorSearch.qKnnFiltered(spark, sfDir).select("vec_id").collect().map(_.getLong(0)).toSet
    val allowed = Tables.embeddings(spark, sfDir).filter(col("label") < 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(allowed))
  }

  test("q_range_search returns only scores >= 0.25 and includes self matches") {
    val rows = VectorSearch.qRangeSearch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("score") >= 0.25))
    val selfs = rows.filter(r => r.getAs[Long]("q_id") == r.getAs[Long]("vec_id"))
    assert(selfs.length == VectorSearch.querySet(spark, sfDir).count())
  }

  test("q_grouped_topk: at most 3 per (query, label)") {
    val rows = VectorSearch.qGroupedTopk(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val g = rows.groupBy(r => (r.getAs[Long]("q_id"), r.getAs[Int]("label")))
    assert(g.values.forall(_.length <= 3))
    assert(rows.forall(_.getAs[Long]("rn") <= 3))
  }

  test("q_recommend returns k non-example rows in descending score order") {
    val rows = VectorSearch.qRecommend(spark, sfDir).collect()
    assert(rows.length == VectorSearch.K)
    val excluded = (VectorSearch.RecommendPos ++ VectorSearch.RecommendNeg).toSet
    assert(rows.forall(r => !excluded.contains(r.getAs[Long]("vec_id"))))
    val scores = rows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("q_vector_stats: one row per label, dim 64, norms ordered") {
    val rows = VectorSearch.qVectorStats(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("dim") == 64)
      assert(r.getAs[Double]("min_norm") <= r.getAs[Double]("avg_norm"))
      assert(r.getAs[Double]("avg_norm") <= r.getAs[Double]("max_norm"))
    }
  }
}

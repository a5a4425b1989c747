package graft

import graft.operators.{Ann, VectorSearch}

class AnnSpec extends SparkSpec {

  private def topk(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
    rows.groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }

  private def recallVsExact(approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, ex) =>
      approx.get(q).map(ap => ap.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    per.sum / per.size
  }

  lazy val exact: Map[Long, Set[Long]] =
    topk(VectorSearch.qKnnCosine(spark, sfDir).collect())

  test("q_ivf_knn: k results per query, recall beats random scan share") {
    val rows = Ann.qIvfKnn(spark, sfDir).collect()
    val approx = topk(rows)
    assert(approx.keySet == exact.keySet)
    val recall = recallVsExact(approx, exact)
    info(f"IVF recall@10 = $recall%.3f (nprobe ${Ann.NProbe}/${Ann.NList})")
    // probing nprobe/nlist clusters scans roughly that share of the
    // corpus; a useful index must recall well beyond it
    val scanShare = Ann.NProbe.toDouble / Ann.NList
    assert(recall >= scanShare + 0.2, f"IVF recall $recall%.3f not beating scan share $scanShare%.2f")
  }

  test("q_lsh_knn: candidates rerank to high recall") {
    val rows = Ann.qLshKnn(spark, sfDir).collect()
    val approx = topk(rows)
    assert(approx.keySet == exact.keySet)
    val recall = recallVsExact(approx, exact)
    info(f"LSH recall@10 = $recall%.3f (8 bands x 4 bits)")
    assert(recall >= 0.5, f"LSH recall $recall%.3f below 0.5")
  }

  test("written IVF index search equals in-memory IVF search") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/index"
    val centroids = graft.operators.Ann.writeIvfIndex(spark, sfDir, path)
    val viaIndex = Ann.searchIvfIndex(spark, path, centroids,
      VectorSearch.querySet(spark, sfDir)).collect()
    val direct = Ann.qIvfKnn(spark, sfDir).collect()
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rn"), r.getAs[Double]("score"))).sortBy(t => (t._1, t._3))
    assert(canon(viaIndex).sameElements(canon(direct)))
  }

  test("ivf self-match always recalled (query vector is in its own probed cluster)") {
    val rows = Ann.qIvfKnn(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (q, rs) =>
      assert(rs.exists(_.getAs[Long]("vec_id") == q))
      assert(rs.count(_ => true) <= Ann.K)
    }
  }
}

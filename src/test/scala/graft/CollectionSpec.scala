package graft

import graft.operators.Collection
import org.apache.spark.sql.functions._

class CollectionSpec extends SparkSpec {

  test("q_upsert: updated keys carry version 2 / label+100, inserts appear, others untouched") {
    val rows = Collection.qUpsert(spark, sfDir).collect()
    val base = Tables.embeddings(spark, sfDir).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val inserts = rows.filter(_.getAs[Long]("vec_id") >= 1000000000L)
    assert(inserts.nonEmpty && inserts.forall(r =>
      r.getAs[Int]("label") == 999 && r.getAs[Int]("version") == 2))
    rows.filter(_.getAs[Long]("vec_id") < 1000000000L).foreach { r =>
      val (id, lab, v) = (r.getAs[Long]("vec_id"), r.getAs[Int]("label"), r.getAs[Int]("version"))
      if (id % 10 == 0) { assert(v == 2); assert(lab == base(id) + 100) }
      else { assert(v == 1); assert(lab == base(id)) }
    }
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length) // one winner per key
  }

  test("q_delete_filter removes label 3 entirely and every 17th id") {
    val rows = Collection.qDeleteFilter(spark, sfDir).collect()
    assert(!rows.exists(_.getAs[Int]("label") == 3))
    val total = rows.map(_.getAs[Long]("n_remaining")).sum
    val expected = Tables.embeddings(spark, sfDir)
      .filter(!(col("label") === 3 || col("vec_id") % 17 === 0)).count()
    assert(total == expected)
  }

  test("q_get_by_ids returns exactly the requested existing ids") {
    val got = Collection.qGetByIds(spark, sfDir).collect().map(_.getAs[Long]("vec_id"))
    val existing = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(Collection.GetIds: _*)).count()
    assert(got.length == existing)
    assert(got.sorted.sameElements(got))
    assert(got.toSet.subsetOf(Collection.GetIds.toSet))
  }

  test("q_scroll returns the 101st..150th ids in order") {
    val got = Collection.qScroll(spark, sfDir).collect().map(_.getAs[Long]("vec_id"))
    val all = Tables.embeddings(spark, sfDir).select("vec_id")
      .collect().map(_.getLong(0)).sorted
    assert(got.sameElements(all.slice(100, 150)))
  }

  test("q_facet counts every source facet over the filtered docs") {
    val rows = Collection.qFacet(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val expected = Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("n_chars") >= 300).count()
    assert(total == expected)
    assert(rows.forall(_.getAs[Double]("avg_chars") >= 300.0))
  }

  test("q_sample_stratified keeps a stable ~1/5 of every stratum") {
    val rows = Collection.qSampleStratified(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val total = r.getAs[Long]("n_total")
      val sampled = r.getAs[Long]("n_sampled")
      assert(sampled <= total)
      // md5 buckets are uniform; per-stratum ratio should be near 0.2
      assert(math.abs(r.getAs[Double]("ratio") - 0.2) < 0.15,
        s"stratum ratio ${r.getAs[Double]("ratio")}")
    }
    // deterministic: two runs agree exactly
    val again = Collection.qSampleStratified(spark, sfDir).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("q_collection_stats summarizes the collection in one row") {
    val r = Collection.qCollectionStats(spark, sfDir).head()
    assert(r.getAs[Long]("n_vectors") == 500)
    assert(r.getAs[Long]("n_labels") == 10)
    assert(r.getAs[Long]("dim") == 64)
    assert(r.getAs[Double]("avg_norm") > 0)
  }

  test("q_search_after equals the keyset page of the full sorted scan") {
    import org.apache.spark.sql.functions.col
    val page = Collection.qSearchAfter(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars")))
    val full = Tables.documents(spark, sfDir)
      .orderBy(col("n_chars").desc, col("doc_id"))
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = full.dropWhile { case (id, nc) =>
      nc > 300 || (nc == 300 && id <= 250) }.take(50)
    assert(page.sameElements(expected))
  }

  test("q_update_by_query tiers cover every doc exactly once") {
    val rows = Collection.qUpdateByQuery(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("tier")).toSet.subsetOf(Set("low", "std")))
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sfDir).count())
  }

  test("sliced scroll slices partition the collection exactly") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sfDir)
    val slice = graft.functions.hashes.md5Bucket(
      col("vec_id").cast("string"), Collection.ScrollSlices)
    val counts = emb.groupBy(slice.as("s")).count().collect()
      .map(r => r.getAs[Long]("s") -> r.getAs[Long]("count")).toMap
    assert(counts.keySet == (0L until Collection.ScrollSlices).toSet)
    assert(counts.values.sum == emb.count())
    // each slice holds a meaningful share (hash balance)
    counts.values.foreach(c => assert(c > emb.count() / Collection.ScrollSlices / 2))
    val page = Collection.qScrollSlice(spark, sfDir).collect()
    assert(page.nonEmpty)
    val ids = page.map(_.getAs[Long]("vec_id"))
    assert(ids.sameElements(ids.sorted))
  }

  test("q_count_filtered counts a strict subset of the collection") {
    import org.apache.spark.sql.functions.col
    val r = Collection.qCountFiltered(spark, sfDir).head()
    val labelOnly = Tables.embeddings(spark, sfDir).filter(col("label") < 5).count()
    // vector 0 has label 0 < 5 and cosine 1.0 with itself, so the
    // count is never empty; the similarity half must prune further
    assert(r.getAs[Long]("n_vectors") > 0)
    assert(r.getAs[Long]("n_vectors") < labelOnly)
    assert(r.getAs[Long]("n_labels") <= 5)
  }
}

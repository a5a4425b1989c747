package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("mediaTable exposes a real binary payload column") {
    val df = Multimodal.mediaTable(spark, sfDir)
    assert(df.schema("payload").dataType.typeName == "binary")
    val r = df.head()
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
  }

  test("decodeFeatures emits typed features, deterministic across runs") {
    val a = Multimodal.decodeFeatures(spark, sfDir).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(spark, sfDir).collect().sortBy(_.doc_id)
    assert(a.length == 500)
    assert(a.sameElements(b))
    a.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.digest.length == 32)
      assert(f.width >= 64 && f.width < 192)
      assert(f.height >= 64 && f.height < 192)
      assert(f.n_frames >= 1 && f.n_frames <= 16)
    }
  }

  test("decode digest agrees with the SQL-side md5") {
    import org.apache.spark.sql.functions._
    val sqlSide = Multimodal.mediaTable(spark, sfDir)
      .select(col("doc_id"), md5(col("payload")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    Multimodal.decodeFeatures(spark, sfDir).collect()
      .foreach(f => assert(f.digest == sqlSide(f.doc_id)))
  }

  test("q_multimodal_meta aggregates per source") {
    val rows = Multimodal.qMultimodalMeta(spark, sfDir).collect()
    assert(rows.length == 20) // 20 sources
    assert(rows.map(_.getAs[Long]("n_items")).sum == 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("total_bytes") > 0)
      assert(r.getAs[Long]("n_unique") <= r.getAs[Long]("n_items"))
    }
  }
}

package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("q_media_resize fits every payload into the 224 box, aspect preserved") {
    val rows = graft.operators.Multimodal.qMediaResize(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      val (ow, oh) = (r.getAs[Long]("out_w"), r.getAs[Long]("out_h"))
      assert(ow <= 224 && oh <= 224)
      // the long side hits the box, up to the floor of an inexact
      // double product (224/x * x can land at 223.999...)
      assert(math.max(ow, oh) >= 223)
      // aspect preserved within rounding
      assert(math.abs(ow.toDouble / oh - w.toDouble / h) < 0.05)
    }
  }

  test("q_media_frames samples every 4th frame of each payload") {
    val rows = graft.operators.Multimodal.qMediaFrames(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val n = rs.head.getAs[Long]("n_frames")
      val idx = rs.map(_.getAs[Long]("frame_idx")).sorted
      assert(idx.sameElements(0L until n by 4))
      assert(rs.map(_.getAs[String]("frame_key")).distinct.length == rs.length)
    }
  }

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
    a.zip(b).foreach { case (x, y) =>
      assert(x.copy(feature = null) == y.copy(feature = null))
      assert(x.feature.sameElements(y.feature))
    }
    a.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.digest.length == 32)
      assert(f.width >= 64 && f.width < 192)
      assert(f.height >= 64 && f.height < 192)
      assert(f.n_frames >= 1 && f.n_frames <= 16)
      assert(f.feature.length == 26 && f.feature.sum > 0)
    }
  }

  test("codec swap changes only feature values, never a query plan") {
    import org.apache.spark.sql.functions.col
    // a toy second codec: different geometry arithmetic, a 2-dim
    // feature — everything else (plumbing, schema, per-partition
    // open/close, downstream plans) identical
    object ToyCodec extends graft.api.MediaCodec {
      override def name = "toy"
      override def decode(id: Long, src: String, payload: Array[Byte]): graft.api.MediaFeatures = {
        val n = payload.length.toLong
        graft.api.MediaFeatures(id, src, n, n.toString, 32L + n % 64, 32L + (n * 3) % 64,
          1L + n % 4, 16000L, 2000L, Array(n.toDouble, (payload.head & 0xff).toDouble))
      }
    }
    val stub = Multimodal.qMediaResize(spark, sfDir).collect()
    val toy = Multimodal.qMediaResize(spark, sfDir, ToyCodec).collect()
    // same schema, same rows, same doc ids — only the decoded
    // geometry (and what derives from it) differs
    assert(stub.length == toy.length)
    assert(stub.head.schema == toy.head.schema)
    assert(stub.map(_.getAs[Long]("doc_id")).sameElements(toy.map(_.getAs[Long]("doc_id"))))
    assert(toy.forall(r => r.getAs[Long]("width") < 96 && r.getAs[Long]("out_w") <= 224))
    assert(stub.exists(r => r.getAs[Long]("width") >= 96)) // codecs really disagree
    // near-media search scores through the toy codec's 2-dim feature
    val knn = Multimodal.mediaKnn(spark, sfDir, col("doc_id") % 100 === 0, ToyCodec).collect()
    assert(knn.nonEmpty)
    knn.filter(r => r.getAs[Long]("q_id") == r.getAs[Long]("doc_id"))
      .foreach(r => assert(r.getAs[Double]("score") == 1.0))
    // swapping back serves the stub's cached frame, not the toy's
    val again = Multimodal.qMediaResize(spark, sfDir).collect()
    assert(again.map(_.getAs[Long]("width")).sameElements(stub.map(_.getAs[Long]("width"))))
  }

  test("codec close runs once per opened partition even when the consumer stops early") {
    Multimodal.decodeWith(Multimodal.mediaTable(spark, sfDir), CountingCodec)
      .limit(3).collect() // early termination: iterator never drains
    // the task-completion listener must still balance every open
    assert(CountingCodec.opens.get() > 0)
    assert(CountingCodec.closes.get() == CountingCodec.opens.get())
    val before = CountingCodec.opens.get()
    Multimodal.decodeWith(Multimodal.mediaTable(spark, sfDir), CountingCodec)
      .collect() // full drain: eager close at exhaustion, listener is a no-op
    assert(CountingCodec.opens.get() > before)
    assert(CountingCodec.closes.get() == CountingCodec.opens.get())
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

  test("q_media_audio windows tile each clip with a 500 ms hop") {
    val rows = Multimodal.qMediaAudio(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, ws) =>
      val sorted = ws.sortBy(_.getAs[Long]("win_id"))
      val dur = sorted.head.getAs[Long]("duration_ms")
      val rate = sorted.head.getAs[Long]("sample_rate")
      assert(Set(8000L, 12000L, 16000L).contains(rate))
      sorted.zipWithIndex.foreach { case (w, i) =>
        assert(w.getAs[Long]("win_id") == i)
        assert(w.getAs[Long]("start_ms") == i * 500L)
        assert(w.getAs[Long]("end_ms") == i * 500L + 1000L)
        assert(w.getAs[Long]("start_sample") == i * 500L * rate / 1000L)
      }
      // last window starts at or before duration-1000; next would overrun
      val lastStart = sorted.last.getAs[Long]("start_ms")
      assert(lastStart <= dur - 1000 && lastStart + 500 > dur - 1000)
    }
  }

  test("q_media_dedup finds exactly the constructed byte-identical copies") {
    import org.apache.spark.sql.functions.col
    val rows = Multimodal.qMediaDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every constructed exact copy (doc_id % 7 == 0 → +10000) lands in
    // a group keyed by its original
    val originals = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 7 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val keepers = rows.map(_.getAs[Long]("keeper_id")).toSet
    assert(originals.subsetOf(keepers))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_copies") >= 2)
      assert(r.getAs[Long]("wasted_bytes") >= 0)
      // wasted = (n_copies - 1) × size: divisible check without size
      assert(r.getAs[Long]("wasted_bytes") % (r.getAs[Long]("n_copies") - 1) == 0)
    }
  }

  test("q_media_near_dup_auto: LSH branch is a high-recall subset of the exact branch") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r =>
        (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // exact branch = the registered entry at driver scale (crossover
    // far above the corpus's avg source block)
    val exact = pairs(Multimodal.mediaNearDupAuto(spark, sfDir))
    // forced LSH branch: crossover 0 routes every block adaptive
    val lsh = pairs(Multimodal.mediaNearDupAuto(spark, sfDir, lshCrossover = 0.0))
    assert(lsh.subsetOf(exact), s"LSH pairs not a subset: ${lsh.diff(exact).take(5)}")
    // every constructed re-encode (tokens reversed, identical letter
    // histogram -> cosine exactly 1) must be recalled by BOTH branches:
    // chooseBanding holds recall >= 0.9 at the operating threshold, and
    // sim-1 pairs collide in every band table
    val docIds = Tables.documents(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0)).filter(_ % 9 == 0)
    docIds.foreach { id =>
      assert(exact.contains((id, id + 3000000000L)), s"exact missed re-encode of $id")
      assert(lsh.contains((id, id + 3000000000L)), s"LSH missed re-encode of $id")
    }
    assert(exact.nonEmpty && lsh.size >= (exact.size * 0.9).toInt,
      s"LSH recall ${lsh.size}/${exact.size} below 0.9")
  }
}

/** Top-level so the closure serializes the singleton, and local-mode
  * tasks bump the same JVM's counters.
  */
object CountingCodec extends graft.api.MediaCodec {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  override def name = "counting"
  override def open(): Unit = { opens.incrementAndGet(); () }
  override def close(): Unit = { closes.incrementAndGet(); () }
  override def decode(id: Long, src: String, payload: Array[Byte]): graft.api.MediaFeatures =
    graft.api.StubMediaCodec.decode(id, src, payload)
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Geo, TrainingPipeline}

class TrainingPipelineSpec extends SparkSpec {

  test("q_dsir ranks target-slice documents above the rest in expectation") {
    import org.apache.spark.sql.functions._
    val sel = graft.operators.TrainingPipeline.qDsir(spark, sfDir)
    val rows = sel.collect()
    assert(rows.length == 100)
    // weights descend with the declared tie order
    val ws = rows.map(r => (r.getAs[Double]("dsir_logw"), r.getAs[Long]("doc_id")))
    assert(ws.sliding(2).forall { case Array((w1, d1), (w2, d2)) =>
      w1 > w2 || (w1 == w2 && d1 < d2) })
    // DSIR's point: the selected set should over-represent the target
    // domain (en) relative to its share of the raw corpus
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val corpusEn = docs.values.count(_ == "en").toDouble / docs.size
    val selEn = rows.count(r => docs(r.getAs[Long]("doc_id")) == "en").toDouble / rows.length
    assert(selEn > corpusEn,
      s"selected en share $selEn should exceed corpus share $corpusEn")
  }

  test("q_contamination flags every constructed copy of a benchmark doc") {
    val rows = TrainingPipeline.qContamination(spark, sfDir).collect()
    val flagged = rows.map(_.getAs[Long]("doc_id")).toSet
    // every exact copy of a benchmark doc (doc_id % 7 == 0 → +1e9)
    // shares all its 5-grams with the benchmark original
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 7 === 0)
      .filter(size(split(col("text"), " ")) >= 5)
      .select(col("doc_id")).collect().map(_.getLong(0))
    docs.foreach(d => assert(flagged.contains(d + 1000000000L),
      s"copy of benchmark doc $d not flagged"))
    // benchmark docs themselves are excluded from the report
    assert(flagged.forall(_ % 7 != 0))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_shingles") > 0 && r.getAs[Long]("n_bench_docs") > 0)
    }
  }

  test("q_repetition fractions are in [0,1) and consistent") {
    val rows = TrainingPipeline.qRepetition(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val b = r.getAs[Double]("dup_bigram_frac")
      val t = r.getAs[Double]("dup_trigram_frac")
      val s = r.getAs[Double]("top_token_share")
      assert(b >= 0 && b < 1 && t >= 0 && t < 1)
      assert(s > 0 && s <= 1)
      assert(s >= 1.0 / r.getAs[Long]("n_tokens") - 1e-6) // s is rounded to 6 places
    }
  }

  test("q_mix_sources keeps full tier-0 sources and splits ~80/10/10") {
    val rows = TrainingPipeline.qMixSources(spark, sfDir).collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    val total = Tables.documents(spark, sfDir)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // tier-0 sources (src0..src4) keep every doc
    for (s <- Seq("src0", "src1", "src2", "src3", "src4") if total.contains(s))
      assert(bySrc(s).map(_.getAs[Long]("n_docs")).sum == total(s), s"tier-0 $s not fully kept")
    // lower tiers keep strictly less (sf0.001 has enough docs per source)
    val kept = rows.map(r => r.getAs[String]("source") -> r.getAs[Long]("n_docs"))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(kept.filterKeys(k => k.stripPrefix("src").toInt >= 10).values.sum <
      total.filterKeys(k => k.stripPrefix("src").toInt >= 10).values.sum)
    assert(rows.map(_.getAs[String]("split")).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("q_pack_sequences bins respect the budget for multi-doc bins") {
    val rows = TrainingPipeline.qPackSequences(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // a bin with more than one doc can only have formed if the docs
      // fit the running 256-token budget (a single oversized doc may
      // exceed it alone)
      if (r.getAs[Long]("n_docs") > 1)
        assert(r.getAs[Long]("sum_tokens") + r.getAs[Long]("n_docs") <= 256 + 256,
          s"bin overfilled: $r")
      assert(r.getAs[Long]("bin_id") >= 0)
    }
    // every doc is packed exactly once
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == 500)
  }

  test("q_geo_search distances are within the radius and sorted") {
    val rows = Geo.qGeoSearch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val dists = rows.map(_.getAs[Double]("dist_km"))
    assert(dists.forall(d => d >= 0 && d <= 3000))
    assert(dists.sameElements(dists.sorted))
    rows.foreach { r =>
      val lat = r.getAs[Double]("lat"); val lon = r.getAs[Double]("lon")
      assert(lat >= -90 && lat < 90 && lon >= -180 && lon < 180)
    }
  }

  test("q_geo_bounds boxes contain their centroids") {
    val rows = Geo.qGeoBounds(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mnLat, mxLat) = (r.getAs[Double]("min_lat"), r.getAs[Double]("max_lat"))
      val (mnLon, mxLon) = (r.getAs[Double]("min_lon"), r.getAs[Double]("max_lon"))
      assert(mnLat <= mxLat && mnLon <= mxLon)
      val cLat = r.getAs[Double]("centroid_lat"); val cLon = r.getAs[Double]("centroid_lon")
      assert(cLat >= mnLat && cLat <= mxLat, s"$cLat outside [$mnLat,$mxLat]")
      assert(cLon >= mnLon && cLon <= mxLon, s"$cLon outside [$mnLon,$mxLon]")
      assert(r.getAs[Long]("n_events") > 0)
    }
  }

  test("q_boilerplate marks every segment of an exact copy pair as shared") {
    val rows = TrainingPipeline.qBoilerplate(spark, sfDir).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // an exact copy (doc_id % 7 == 0 → +1e9) shares ALL segments
    // with its original: both ends must report boiler_frac == 1.0
    val copied = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 7 === 0)
      .filter(size(split(col("text"), " ")) >= 8)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(copied.nonEmpty)
    copied.foreach { d =>
      Seq(d, d + 1000000000L).foreach { id =>
        val r = byId(id)
        assert(r.getAs[Double]("boiler_frac") == 1.0,
          s"doc $id of exact pair not fully boilerplate")
        assert(r.getAs[Long]("n_boiler") == r.getAs[Long]("n_segments"))
      }
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_boiler") <= r.getAs[Long]("n_segments"))
      assert(r.getAs[Long]("n_segments") > 0)
    }
  }

  /** In-memory reference BPE trainer (Sennrich-style: argmax pair by
    * (count desc, "a b" asc), left-to-right non-overlapping merge).
    */
  private def refBpe(wc: Map[String, Long], n: Int): Seq[(String, String)] = {
    var words = wc.toSeq.map { case (w, c) => (w.map(_.toString), c) }
    val out = collection.mutable.Buffer[(String, String)]()
    var continue = true
    while (out.size < n && continue) {
      val pc = collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) += c
      if (pc.isEmpty) continue = false
      else {
        val best = pc.toSeq.minBy { case ((a, b), cnt) => (-cnt, a + " " + b) }._1
        out += best
        words = words.map { case (syms, c) =>
          val buf = collection.mutable.Buffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              buf += best._1 + best._2; i += 2
            } else { buf += syms(i); i += 1 }
          }
          (buf.toIndexedSeq, c)
        }
      }
    }
    out.toSeq
  }

  test("bpeTrain learns the same merge sequence as an in-memory reference trainer") {
    val docs = Tables.documents(spark, sfDir)
    val wc = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = TrainingPipeline.bpeTrain(docs, 8)
    assert(merges == refBpe(wc, 8), s"distributed merges $merges diverge from reference")
    assert(merges.size == 8)
  }

  test("bpeTrainBatched at K=1 equals the sequential trainer; at K>1 every round is non-interacting") {
    val docs = Tables.documents(spark, sfDir)
    val seq8 = TrainingPipeline.bpeTrain(docs, 8)
    assert(TrainingPipeline.bpeTrainBatched(docs, 8, batchK = 1) == seq8)
    // K=4: the reference-order first merge always opens the list, the
    // vocab reaches the same size, and every merge is well-formed
    // (the documented K>1 deviation is ORDER within a round, never a
    // frequency-unjustified or interacting pair)
    val batched = TrainingPipeline.bpeTrainBatched(docs, 8, batchK = 4)
    assert(batched.size == 8)
    assert(batched.head == seq8.head)
    assert(batched.distinct.size == batched.size)
    batched.grouped(4).foreach { round =>
      val syms = round.flatMap { case (a, b) => Seq(a, b, a + b) }
      assert(syms.distinct.size == syms.size,
        s"interacting merges within one round: $round")
    }
    // the batched vocab still losslessly re-segments the corpus
    val enc = TrainingPipeline.bpeEncode(docs, batched).limit(500).collect()
    enc.foreach { r =>
      assert(r.getSeq[String](r.fieldIndex("bpe_tokens")).mkString("") ==
        r.getAs[String]("w"))
    }
  }

  test("bpeEncode losslessly re-segments every word with the learned merges") {
    val docs = Tables.documents(spark, sfDir)
    val merges = TrainingPipeline.bpeTrain(docs, 4)
    val enc = TrainingPipeline.bpeEncode(docs, merges).limit(2000).collect()
    assert(enc.nonEmpty)
    def toks(r: org.apache.spark.sql.Row): scala.collection.Seq[String] =
      r.getSeq[String](r.fieldIndex("bpe_tokens"))
    enc.foreach { r =>
      val w = r.getAs[String]("w")
      assert(toks(r).mkString("") == w, s"tokens ${toks(r)} do not reassemble $w")
    }
    // at least one learned merge actually fires somewhere
    val merged = merges.map { case (a, b) => a + b }.toSet
    assert(enc.exists(r => toks(r).exists(merged.contains)))
  }

  /** Local reference BPE application (left-to-right, merge order). */
  private def refApply(w: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = w.map(_.toString)
    merges.foreach { case (a, b) =>
      val buf = collection.mutable.Buffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          buf += a + b; i += 2
        } else { buf += syms(i); i += 1 }
      }
      syms = buf.toSeq
    }
    syms
  }

  test("tokenizeAndPack rows are budget-bounded and reassemble the per-source token stream") {
    val docs = Tables.documents(spark, sfDir)
    val merges = TrainingPipeline.bpeTrain(docs, 4)
    val budget = 256
    val packed = TrainingPipeline.tokenizeAndPack(docs, merges, budget).collect()
    packed.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(n >= 1 && n <= budget, s"row size $n outside (0, $budget]")
      assert(r.getSeq[String](r.fieldIndex("tokens")).length == n)
    }
    // docs fill bins in id order and rows slice bins sequentially, so
    // (bin_id, seq_no) order reproduces the source's exact token stream
    val src = "src1"
    val got = packed.filter(_.getAs[String]("source") == src)
      .sortBy(r => (r.getAs[Long]("bin_id"), r.getAs[Long]("seq_no")))
      .flatMap(r => r.getSeq[String](r.fieldIndex("tokens"))).toSeq
    val want = docs.filter(org.apache.spark.sql.functions.col("source") === src)
      .orderBy("doc_id").select("text").collect()
      .flatMap(_.getString(0).split(" ").toSeq.flatMap(refApply(_, merges))).toSeq
    assert(got == want, s"stream mismatch: got ${got.length} want ${want.length} tokens")
    assert(got.nonEmpty)
  }
}

package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("q_token_count covers all docs and averages within bounds") {
    val rows = TextAnalysis.qTokenCount(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("lang")).toSet == Set("en", "de", "es", "fr", "zh"))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 500)
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_tokens") <= r.getAs[Long]("max_tokens").toDouble)
      assert(r.getAs[Long]("sum_tokens") >= r.getAs[Long]("n_docs"))
    }
  }

  test("q_lang_id predicts one profile per doc, hits consistent with text") {
    val rows = TextAnalysis.qLangId(spark, sfDir).collect()
    assert(rows.length == 500)
    val valid = TextAnalysis.LangProfiles.map(_._1).toSet
    assert(rows.forall(r => valid.contains(r.getAs[String]("pred_lang"))))
    // spot check: recompute hits for the first doc
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    val text = Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") === first.getAs[Long]("doc_id"))
      .head().getAs[String]("text")
    val toks = text.split(" ")
    val best = TextAnalysis.LangProfiles
      .map { case (l, ws) => (l, toks.count(ws.contains).toLong) }
      .sortBy { case (l, h) => (-h, l) }.head
    assert(first.getAs[String]("pred_lang") == best._1)
    assert(first.getAs[Long]("hits") == best._2)
  }

  test("q_quality_score is in (0, 1] and favors longer diverse docs") {
    val rows = TextAnalysis.qQualityScore(spark, sfDir).collect()
    assert(rows.length == 500)
    assert(rows.forall { r =>
      val q = r.getAs[Double]("quality"); q > 0 && q <= 1.0
    })
  }

  test("q_fingerprint is deterministic and in range") {
    val a = TextAnalysis.qFingerprint(spark, sfDir).collect()
    val b = TextAnalysis.qFingerprint(spark, sfDir).collect()
    assert(a.map(_.getAs[Long]("fp")).sameElements(b.map(_.getAs[Long]("fp"))))
    assert(a.forall { r => val f = r.getAs[Long]("fp"); f >= 0 && f < 1000000007L })
    // identical texts hash identically, different texts (overwhelmingly) differ
    assert(a.map(_.getAs[Long]("fp")).distinct.length > 490)
  }
}

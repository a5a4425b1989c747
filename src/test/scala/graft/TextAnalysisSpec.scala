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

  test("q_chunk_docs covers every token with 32/16 sliding windows") {
    val chunks = TextAnalysis.qChunkDocs(spark, sfDir).collect()
    val nTok = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "size(split(text, ' ')) AS n").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n")).toMap
    assert(chunks.forall { r =>
      val n = r.getAs[Long]("n_tokens"); n >= 1 && n <= TextAnalysis.ChunkSize
    })
    // chunk count per doc = number of stride starts below the length
    val perDoc = chunks.groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length)
    assert(nTok.forall { case (id, n) =>
      perDoc.getOrElse(id, 0) == (n - 1) / TextAnalysis.ChunkStride + 1
    })
    // chunk i spans tokens [16i, min(16i+32, n)) exactly
    chunks.foreach { r =>
      val n = nTok(r.getAs[Long]("doc_id")).toLong
      val start = r.getAs[Long]("chunk_id") * TextAnalysis.ChunkStride
      assert(r.getAs[Long]("n_tokens") == math.min(TextAnalysis.ChunkSize, n - start))
    }
  }

  test("q_pii_redact finds the injected email and reference number") {
    val rows = TextAnalysis.qPiiRedact(spark, sfDir).collect()
    assert(rows.length == 500)
    // every doc got exactly one injected email; digits beyond the
    // email remain only in the injected ref number
    assert(rows.forall(_.getAs[Long]("n_emails") == 1))
    assert(rows.forall(_.getAs[Long]("n_numbers") == 1))
    // redacted hashes differ per doc (distinct underlying texts)
    val redone = TextAnalysis.qPiiRedact(spark, sfDir)
      .select("redacted_hash").distinct().count()
    assert(redone > 450)
  }

  test("q_sketch_stats bounds sketch error against the exact answers") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.qSketchStats(spark, sfDir).collect()
    assert(rows.length == 5)
    val exact = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("token")).as("d"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("d")).toMap
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val approx = r.getAs[Long]("approx_distinct")
      // HLL++ at rsd=0.02: allow 10% headroom on a small cardinality
      assert(math.abs(approx - exact(lang)).toDouble / exact(lang) < 0.1,
        s"$lang approx $approx vs exact ${exact(lang)}")
      assert(r.getAs[Long]("p50_tokens") <= r.getAs[Long]("p95_tokens"))
    }
  }

  test("q_rare_terms is the ascending df tail under the cutoff") {
    val rows = TextAnalysis.qRareTerms(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val dfs = rows.map(_.getAs[Long]("df"))
    assert(dfs.forall(d => d >= 1 && d <= 2))
    assert(dfs.sameElements(dfs.sorted))
  }

  test("q_perplexity matches a driver-side unigram model") {
    val rows = TextAnalysis.qPerplexity(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    // replay the LM on the driver from the raw text
    val toks = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ", -1).toSeq)
    val counts = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum.toDouble
    val byDoc = toks.toMap
    rows.foreach { r =>
      val ts = byDoc(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tok") == ts.length)
      val nll = ts.map(t => -math.log(counts(t) / total)).sum / ts.length
      assert(math.abs(r.getAs[Double]("nll") - nll) < 1e-5)
      assert(r.getAs[Double]("nll") > 0)
    }
  }

  test("q_cooccur_pmi pairs are ordered, supported, and PMI-bounded") {
    val rows = TextAnalysis.qCooccurPmi(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val nDocs = Tables.documents(spark, sfDir).count().toDouble
    rows.foreach { r =>
      assert(r.getAs[String]("t1") < r.getAs[String]("t2"))
      val cab = r.getAs[Long]("c_ab")
      assert(cab >= TextAnalysis.PmiMinSupport)
      // PMI can't exceed ln(N / c_ab): c_ab <= min(df_a, df_b)
      assert(r.getAs[Double]("pmi") <= math.log(nDocs / cab) + 1e-6)
    }
    val pmis = rows.map(_.getAs[Double]("pmi"))
    assert(pmis.sameElements(pmis.sortBy(-(_: Double))))
  }

  test("q_string_stats entropy is bounded by ln(n_distinct)") {
    val rows = TextAnalysis.qStringStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val d = r.getAs[Long]("n_distinct")
      // 5e-7 slack: h is rounded to 1e-6, which can land just above
      // ln(d) when the distribution is exactly uniform
      assert(h >= 0 && h <= math.log(d.toDouble) + 5e-7,
        s"entropy $h outside [0, ln($d)]")
      assert(r.getAs[Long]("n_tokens") >= d)
    }
  }

  test("q_fingerprint is deterministic and in range") {
    val a = TextAnalysis.qFingerprint(spark, sfDir).collect()
    val b = TextAnalysis.qFingerprint(spark, sfDir).collect()
    assert(a.map(_.getAs[Long]("fp")).sameElements(b.map(_.getAs[Long]("fp"))))
    assert(a.forall { r => val f = r.getAs[Long]("fp"); f >= 0 && f < 1000000007L })
    // identical texts hash identically, different texts (overwhelmingly) differ
    assert(a.map(_.getAs[Long]("fp")).distinct.length > 490)
  }

  test("q_gopher_quality pass_all is exactly the conjunction of the rule flags") {
    val rows = TextAnalysis.qGopherQuality(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val conj = r.getAs[Boolean]("pass_words") && r.getAs[Boolean]("pass_wordlen") &&
        r.getAs[Boolean]("pass_stop") && r.getAs[Boolean]("pass_repeat")
      assert(r.getAs[Boolean]("pass_all") == conj)
      assert(r.getAs[Double]("distinct_ratio") > 0 && r.getAs[Double]("distinct_ratio") <= 1)
      assert(r.getAs[Double]("mean_word_len") > 0)
    }
    // the gate must actually discriminate on this corpus
    assert(rows.exists(_.getAs[Boolean]("pass_all")))
    assert(rows.exists(!_.getAs[Boolean]("pass_all")))
  }

  test("categorize_text categories are the sample doc's top-3 tokens, sizes descending") {
    val rows = TextAnalysis.qCategorizeText(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val sizes = rows.map(_.getAs[Long]("n_docs")).toSeq
    assert(sizes == sizes.sorted.reverse)
    assert(sizes.head >= 2, "top category should actually group documents")
    // recompute the category key for each sample doc with the same
    // deterministic rule (count desc, token asc)
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val expected = texts(r.getAs[Long]("sample_doc"))
        .split(" ").groupBy(identity).map { case (t, o) => (t, o.length) }
        .toSeq.sortBy { case (t, c) => (-c, t) }.take(3).map(_._1).mkString(" ")
      assert(r.getAs[String]("category") == expected)
    }
  }

  test("q_quality_classifier: score is the bounded link of the mean hashed weight, keep ⇔ sum ≥ 0") {
    val rows = TextAnalysis.qQualityClassifier(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val score = r.getAs[Double]("score")
      assert(score > 0.0 && score < 1.0) // x/(1+|x|) never saturates
      // keep is decided on the exact integer sum; the rounded score
      // can sit exactly at 0.5 from either side when |sum| is tiny
      assert(r.getAs[Boolean]("keep") == (score >= 0.5)
        || math.abs(score - 0.5) <= 1e-6)
      assert(r.getAs[Long]("n_tokens") > 0)
    }
    // the classifier must actually discriminate on this corpus
    assert(rows.exists(_.getAs[Boolean]("keep")))
    assert(rows.exists(!_.getAs[Boolean]("keep")))
    // recompute one document end-to-end on the driver with the same
    // closed-form weights (md5 bucket → keyed integer weight)
    val sample = Tables.documents(spark, sfDir)
      .select("doc_id", "text").orderBy("doc_id").limit(1).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(t: String): Long = {
      val hex = md.digest(t.getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 4096
    }
    val toks = sample.getString(1).split(" ", -1)
    val wSum = toks.map(t => (bucket(t) * 2654435761L) % 1000003L - 500000L).sum
    val logit = 4.0 * wSum / (toks.length * 1000003.0)
    val expected = BigDecimal(0.5 + 0.5 * logit / (1.0 + math.abs(logit)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = rows.find(_.getAs[Long]("doc_id") == sample.getLong(0)).get
    assert(got.getAs[Double]("score") == expected)
  }

  test("frequent_item_sets pairs meet min support and Apriori monotonicity") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.qFrequentItemSets(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= TextAnalysis.ItemSetTopK)
    val n = Tables.documents(spark, sfDir).count()
    val minSup = n * TextAnalysis.ItemSetMinSupport
    assert(rows.forall(_.getAs[Long]("support") >= minSup))
    // ordering contract: support desc, then (t1, t2) asc; t1 < t2
    val sups = rows.map(_.getAs[Long]("support")).toSeq
    assert(sups == sups.sorted.reverse)
    assert(rows.forall(r => r.getAs[String]("t1") < r.getAs[String]("t2")))
    // Apriori: a pair's support can never exceed either member's df
    val df = Tables.documents(spark, sfDir)
      .select(explode(array_distinct(split(col("text"), " "))).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val s = r.getAs[Long]("support")
      assert(s <= df(r.getAs[String]("t1")) && s <= df(r.getAs[String]("t2")))
    }
    // spot-verify the top pair's support by direct recount
    val top = rows.head
    val recount = Tables.documents(spark, sfDir)
      .filter(array_contains(split(col("text"), " "), top.getAs[String]("t1")) &&
        array_contains(split(col("text"), " "), top.getAs[String]("t2")))
      .count()
    assert(top.getAs[Long]("support") == recount)
  }
}

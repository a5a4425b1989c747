package graft

import graft.streaming.{EventsWindowed, UserRunningStats}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

class StreamingSpec extends SparkSpec {

  test("streaming trending terms equal the batch twin's top-k") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id") * 60))
      .select("ts", "text")
    val srcDir = Files.createTempDirectory("graft-trend-src").toString
    docs.write.mode("overwrite").parquet(srcDir)

    val q = graft.streaming.TrendingTerms.stream(spark, srcDir, docs.schema)
      .writeStream
      .format("memory")
      .queryName("trending_terms_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def canon(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.TrendingTerms.topK(df, 5).collect().map { r =>
        (tsEpochMs(r.getAs[Any]("window_start")),
          r.getAs[Long]("rank"), r.getAs[String]("term"), r.getAs[Long]("n"))
      }.toSeq
    val streamed = canon(spark.table("trending_terms_test"))
    val batch = canon(graft.streaming.TrendingTerms.windowedCounts(docs))
    assert(streamed.nonEmpty)
    assert(streamed == batch)
    // every doc lands in exactly two sliding windows
    val totalStreamedTokens = spark.table("trending_terms_test")
      .agg(sum("n")).head().getLong(0)
    assert(totalStreamedTokens ==
      2 * docs.select(explode(split(col("text"), " "))).count())
  }

  test("streaming exact dedup admits one survivor per content hash") {
    import org.apache.spark.sql.functions._
    // documents with synthetic event times and known duplicates
    val docs = graft.operators.Dedup.augmentedDocs(spark, sfDir)
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id")))
    val srcDir = Files.createTempDirectory("graft-dedup-src").toString
    docs.write.mode("overwrite").parquet(srcDir)

    val q = graft.streaming.DedupStream.deduped(
        spark.readStream.schema(docs.schema).parquet(srcDir))
      .writeStream
      .format("memory")
      .queryName("dedup_stream_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("dedup_stream_test")
    // one survivor per distinct normalized text, all texts covered
    val nDistinct = docs.select(md5(lower(trim(col("text"))))).distinct().count()
    assert(streamed.count() == nDistinct)
    assert(streamed.select(md5(lower(trim(col("text"))))).distinct().count() == nDistinct)
  }

  test("streaming quality gate admits exactly the batch classifier's keepers") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"))
    val srcDir = Files.createTempDirectory("graft-qgate-src").toString
    docs.write.mode("overwrite").parquet(srcDir)

    val q = graft.streaming.QualityGateStream.gated(
        spark.readStream.schema(docs.schema).parquet(srcDir))
      .writeStream
      .format("memory")
      .queryName("qgate_stream_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("qgate_stream_test")
    // the batch twin: qQualityClassifier's keep decision
    val batchKeep = graft.operators.TextAnalysis.qQualityClassifier(spark, sfDir)
      .filter(col("keep"))
      .select(col("doc_id"), col("score")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val got = streamed.select(col("doc_id"), col("score"), col("lang")).collect()
    assert(got.length == batchKeep.size)
    got.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      assert(batchKeep.contains(d), s"doc $d not a batch keeper")
      assert(r.getAs[Double]("score") == batchKeep(d), s"doc $d score")
    }
    // passthrough columns survive the gate
    assert(got.forall(_.getAs[String]("lang") != null))
  }

  test("streaming percolate alerts equal the batch percolation") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val srcDir = Files.createTempDirectory("graft-perc-src").toString
    docs.write.mode("overwrite").parquet(srcDir)

    val collected = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val q = graft.streaming.PercolateStream.alertStream(
      spark.readStream.schema(docs.schema).parquet(srcDir)) { res =>
      res.collect().foreach(r => collected.add((r.getAs[Long]("pq_id"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("n_matched"))))
    }
    q.awaitTermination(120000)

    val batch = graft.operators.FullText.qPercolate(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("pq_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_matched"))).toSet
    val streamed = scala.jdk.CollectionConverters.CollectionHasAsScala(collected).asScala.toSet
    assert(streamed == batch)
  }

  test("streaming vector search per micro-batch equals the batch search") {
    import org.apache.spark.sql.functions.col
    val queries = graft.operators.VectorSearch.querySet(spark, sfDir)
      .select("q_id", "q_emb")
    val srcDir = Files.createTempDirectory("graft-qstream-src").toString
    queries.write.mode("overwrite").parquet(srcDir)

    val collected = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Double)]()
    val q = graft.streaming.StreamingSearch.searchStream(
      spark.readStream.schema(queries.schema).parquet(srcDir),
      Tables.embeddings(spark, sfDir), k = 10) { res =>
      res.collect().foreach(r => collected.add((r.getAs[Long]("q_id"),
        r.getAs[Long]("vec_id"), r.getAs[Long]("rn"), r.getAs[Double]("score"))))
    }
    q.awaitTermination(120000)

    val batch = graft.operators.VectorSearch.qKnnCosine(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rn"), r.getAs[Double]("score"))).toSet
    val streamed = scala.jdk.CollectionConverters.CollectionHasAsScala(collected).asScala.toSet
    assert(streamed == batch)
  }

  test("mapGroupsWithState running stats converge to the batch aggregate") {
    val events = Tables.events(spark, sfDir).select("user_id", "value")
    val srcDir = Files.createTempDirectory("graft-state-src").toString
    events.write.mode("overwrite").parquet(srcDir)

    val q = UserRunningStats.stream(spark, srcDir, events.schema)
      .writeStream
      .format("memory")
      .queryName("user_stats_test")
      .outputMode(UserRunningStats.Mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // memory sink in update mode appends every emitted update; the
    // final state per user is the last row emitted for that key
    val streamed = spark.table("user_stats_test").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
      .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
    val batch = events.groupBy(org.apache.spark.sql.functions.col("user_id"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("value").as("s"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n"), r.getAs[Double]("s")))
    assert(batch.nonEmpty)
    batch.foreach { case (u, n, s) =>
      val (_, sn, ss) = streamed(u)
      assert(sn == n, s"user $u count $sn != $n")
      assert(math.abs(ss - s) < 1e-6, s"user $u sum $ss != $s")
    }
  }

  test("flatMapGroupsWithState sessionization matches the batch twin for closed sessions") {
    val events = Tables.events(spark, sfDir).select("user_id", "ts", "value")
    val srcDir = Files.createTempDirectory("graft-sess-src").toString
    events.write.mode("overwrite").parquet(srcDir)

    val q = graft.streaming.Sessionize.stream(spark, srcDir, events.schema)
      .writeStream
      .format("memory")
      .queryName("sessions_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def key(u: Long, start: Long, end: Long, n: Long, s: Double) =
      (u, start, end, n, math.round(s * 100))
    val streamed = spark.table("sessions_test").collect().map(r =>
      key(r.getAs[Long]("user_id"),
        tsEpochMs(r.getAs[Any]("session_start")),
        tsEpochMs(r.getAs[Any]("session_end")),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    val batchAll = graft.streaming.Sessionize.batch(events).collect().map(r =>
      key(r.getAs[Long]("user_id"),
        tsEpochMs(r.getAs[Any]("session_start")),
        tsEpochMs(r.getAs[Any]("session_end")),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(streamed.nonEmpty, "no sessions closed before the final watermark")
    // every streamed (closed) session must be a batch session verbatim
    val missing = streamed -- batchAll
    assert(missing.isEmpty, s"streamed sessions absent from batch: ${missing.take(3)}")
    // and most batch sessions should have closed (tail sessions may not)
    assert(streamed.size >= batchAll.size / 2, s"${streamed.size} vs ${batchAll.size}")
  }

  test("streaming windowed aggregation equals the batch twin") {
    val batchEvents = Tables.events(spark, sfDir)
      .select("ts", "event_type", "value")
    val srcDir = Files.createTempDirectory("graft-stream-src").toString
    batchEvents.write.mode("overwrite").parquet(srcDir)

    val q = EventsWindowed.stream(spark, srcDir, batchEvents.schema)
      .writeStream
      .format("memory")
      .queryName("events_windowed_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def canon(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (tsEpochMs(r.getAs[Any]("window_start")),
        r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"))
    }.sortBy(t => (t._1, t._2))

    val streamed = canon(spark.table("events_windowed_test").collect())
    val batch = canon(EventsWindowed.windowed(batchEvents).collect())
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch))

    // and the shared definition matches the relational batch operator
    val relational = graft.operators.Relational.qEventsWindow(spark, sfDir).collect()
      .map(r => (tsEpochMs(r.getAs[Any]("window_start")),
        r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"))).sortBy(t => (t._1, t._2))
    assert(streamed.sameElements(relational))
  }

  test("stream-stream interval join matches the batch twin") {
    import org.apache.spark.sql.functions.col
    val events = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type")
    val srcDir = Files.createTempDirectory("graft-ssjoin-src").toString
    events.write.mode("overwrite").parquet(srcDir)
    def stream(tpe: String) =
      spark.readStream.schema(events.schema).parquet(srcDir)
        .filter(col("event_type") === tpe)

    val q = graft.streaming.StreamJoin.joinStreams(stream("click"), stream("purchase"))
      .writeStream
      .format("memory")
      .queryName("ssjoin_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def canon(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("purchase_id"), r.getAs[Long]("lag_ms")))
      .sortBy(t => (t._1, t._3))
    val streamed = canon(spark.table("ssjoin_test").collect())
    val batch = canon(graft.streaming.StreamJoin.batch(events).collect())
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch))
    // lags respect the interval bound
    assert(streamed.forall { case (_, _, _, lag) =>
      lag >= 0 && lag <= graft.streaming.StreamJoin.WindowSec * 1000L })
  }

  test("streaming near-dup gate over the at-rest index covers the full-corpus pairs") {
    import org.apache.spark.sql.functions._
    val all = graft.operators.Dedup.augmentedDocs(spark, sfDir)
      .select("doc_id", "text")
    val base = all.filter(col("doc_id") < 1000000000L)
    val idx = Files.createTempDirectory("graft-mh-stream-idx").toString + "/idx"
    graft.operators.Dedup.writeMinhashIndex(base, idx)
    // two appended files + maxFilesPerTrigger=1 → two sequential
    // micro-batches over the remaining "crawl"
    val srcDir = Files.createTempDirectory("graft-neardup-src").toString
    val rest = all.filter(col("doc_id") >= 1000000000L)
    rest.filter(col("doc_id") < 2000000000L).coalesce(1).write.mode("append").parquet(srcDir)
    rest.filter(col("doc_id") >= 2000000000L).coalesce(1).write.mode("append").parquet(srcDir)

    val collected = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = graft.streaming.NearDupStream.gateStream(
      spark.readStream.schema(rest.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir), idx) { res =>
      res.collect().foreach { r =>
        val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
        collected.add((math.min(a, b), math.max(a, b)))
      }
    }
    q.awaitTermination(180000)

    // batching-independent invariant: union of per-trigger pairs ==
    // all full-corpus pairs touching a streamed doc, each exactly once
    val streamedList = scala.jdk.CollectionConverters
      .CollectionHasAsScala(collected).asScala.toList
    val streamed = streamedList.toSet
    assert(streamedList.size == streamed.size, "a pair surfaced in two triggers")
    val full = graft.operators.Dedup.minhashPairs(all).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .filter(p => p._1 >= 1000000000L || p._2 >= 1000000000L)
      .toSet
    assert(streamed == full, s"got ${streamed.size}, want ${full.size}")
    assert(streamed.nonEmpty)
  }

  test("streaming text-index maintenance scores like a full rebuild after every trigger's folds") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val idx = Files.createTempDirectory("graft-ti-stream").toString
    // standing index = first third; stream the rest in two micro-batches
    graft.api.TextIndex(docs.filter(col("doc_id") % 3 === 0)).writeIndex(idx)
    val rest = docs.filter(col("doc_id") % 3 =!= 0)
    val srcDir = Files.createTempDirectory("graft-ti-stream-src").toString
    rest.filter(col("doc_id") % 3 === 1).coalesce(1).write.mode("append").parquet(srcDir)
    rest.filter(col("doc_id") % 3 === 2).coalesce(1).write.mode("append").parquet(srcDir)
    val q = graft.streaming.TextIndexStream.indexStream(
      spark.readStream.schema(rest.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir), idx)
    q.awaitTermination(180000)
    val terms = Seq("spark", "join", "vector")
    val atRest = graft.api.TextIndex.bm25AtRest(spark, idx, terms).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    val live = graft.api.TextIndex(docs).bm25(terms).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    assert(atRest == live,
      "stream-maintained index must score exactly as a full-corpus rebuild")
    assert(atRest.nonEmpty)
  }

  test("streaming CDC upsert folds batch-by-batch to the whole-log merge") {
    import org.apache.spark.sql.functions._
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        timestamp_seconds(lit(1000L)).as("ts"))
    // two update files -> two micro-batches (maxFilesPerTrigger=1):
    // batch 1 relabels ids 0..9 at t=2000, batch 2 relabels 5..14 at
    // t=3000 and inserts a brand-new id
    val srcDir = Files.createTempDirectory("graft-upsert-src").toString
    base.filter(col("vec_id") < 10)
      .withColumn("label", lit(101)).withColumn("ts", timestamp_seconds(lit(2000L)))
      .coalesce(1).write.mode("overwrite").parquet(srcDir + "/f1")
    base.filter(col("vec_id") >= 5 && col("vec_id") < 15)
      .withColumn("label", lit(202)).withColumn("ts", timestamp_seconds(lit(3000L)))
      .unionByName(spark.range(1).select(lit(999999L).as("vec_id"),
        lit(303).as("label"), timestamp_seconds(lit(3000L)).as("ts")))
      .coalesce(1).write.mode("overwrite").parquet(srcDir + "/f2")
    // one flat dir the file source can drain a file at a time
    val updDir = Files.createTempDirectory("graft-upsert-upd").toString
    spark.read.parquet(srcDir + "/f1").write.mode("append").parquet(updDir)
    spark.read.parquet(srcDir + "/f2").write.mode("append").parquet(updDir)

    val updates = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1").parquet(updDir)
    val (q, snapshot) = graft.streaming.UpsertStream.start(updates, base, "vec_id", "ts")
    q.awaitTermination(120000)

    val got = snapshot().collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    // whole-log fold: latest ts wins per id
    assert(got(0L) == 101 && got(4L) == 101)      // batch-1 only
    assert(got(5L) == 202 && got(14L) == 202)     // batch-2 overrides
    assert(got(999999L) == 303)                    // insert
    assert(got(20L) == base.filter(col("vec_id") === 20)
      .head().getAs[Int]("label"))                 // untouched
    assert(got.size == base.count() + 1)
  }

  test("streaming vector-index maintenance searches like a full rebuild after every trigger") {
    import org.apache.spark.sql.functions._
    import graft.operators.{VectorIndex, VectorSearch}
    val corpus = Tables.embeddings(spark, sfDir)
    val idx = Files.createTempDirectory("graft-vi-stream").toString + "/idx"
    // geometry + standing index = first third; stream the rest in two
    // micro-batches — each is encoded against the PERSISTED meta
    val meta = VectorIndex.readMeta(spark,
      VectorIndex.sessionIndexPath(spark, sfDir))
    VectorIndex.writeCorpus(spark, corpus.filter(col("vec_id") % 3 === 0), idx, meta)
    val rest = corpus.filter(col("vec_id") % 3 =!= 0)
    val srcDir = Files.createTempDirectory("graft-vi-stream-src").toString
    rest.filter(col("vec_id") % 3 === 1).coalesce(1).write.mode("append").parquet(srcDir)
    rest.filter(col("vec_id") % 3 === 2).coalesce(1).write.mode("append").parquet(srcDir)
    val q = graft.streaming.VectorIndexStream.ingestStream(
      spark.readStream.schema(rest.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir), idx)
    q.awaitTermination(180000)
    val full = Files.createTempDirectory("graft-vi-stream-full").toString + "/idx"
    VectorIndex.writeCorpus(spark, corpus, full, meta)
    val queries = VectorSearch.querySet(spark, sfDir)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rn"), r.getAs[Double]("score"))).sortBy(t => (t._1, t._3)).toSeq
    Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "ivf" -> ((s, p) => VectorIndex.searchIvf(s, p, queries)),
      "pq" -> ((s, p) => VectorIndex.searchPq(s, p, queries)),
      "lsh" -> ((s, p) => VectorIndex.searchLsh(s, p, queries)))
      .foreach { case (n, f) =>
        val streamed = canon(f(spark, idx))
        assert(streamed == canon(f(spark, full)),
          s"family $n: stream-maintained index != full rebuild")
        assert(streamed.nonEmpty)
      }
  }

  test("streaming cluster maintenance reads like a one-shot resolution after every trigger") {
    import org.apache.spark.sql.functions._
    val corpus = graft.operators.Dedup.augmentedDocs(spark, sfDir)
    val idx = Files.createTempDirectory("graft-ci-stream").toString + "/idx"
    // standing index = the originals; stream the exact and near
    // copies in two micro-batches
    graft.operators.Dedup.writeClusterIndex(
      corpus.filter(col("doc_id") < 1000000000L), idx)
    val rest = corpus.filter(col("doc_id") >= 1000000000L)
    val srcDir = Files.createTempDirectory("graft-ci-stream-src").toString
    rest.filter(col("doc_id") < 2000000000L).coalesce(1).write.mode("append").parquet(srcDir)
    rest.filter(col("doc_id") >= 2000000000L).coalesce(1).write.mode("append").parquet(srcDir)
    val q = graft.streaming.ClusterIndexStream.ingestStream(
      spark.readStream.schema(rest.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir), idx)
    q.awaitTermination(180000)
    val streamed = graft.operators.Dedup.readClusterIndex(spark, idx).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val oneShot = graft.operators.Dedup.clustersOf(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(streamed == oneShot && streamed.nonEmpty,
      s"stream-maintained membership drifted: only-streamed=" +
        s"${(streamed.toSet -- oneShot.toSet).take(5)} " +
        s"only-one-shot=${(oneShot.toSet -- streamed.toSet).take(5)}")
  }

  test("streamed retractions leave the dedup, text, and cluster indexes behaving like batch deletes") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val victims = docs.filter(col("doc_id") % 5 === 0)
    val remaining = docs.filter(col("doc_id") % 5 =!= 0)
    // standing indexes over the full corpus
    val mhIdx = Files.createTempDirectory("graft-retract-mh").toString + "/idx"
    val tIdx = Files.createTempDirectory("graft-retract-ti").toString
    val cIdx = Files.createTempDirectory("graft-retract-ci").toString + "/idx"
    graft.operators.Dedup.writeMinhashIndex(docs, mhIdx)
    graft.api.TextIndex(docs).writeIndex(tIdx)
    // the cluster index gets the augmented corpus — base docs alone
    // hold no duplicate clusters, so retraction would be vacuous
    val clusterCorpus = graft.operators.Dedup.augmentedDocs(spark, sfDir)
    graft.operators.Dedup.writeClusterIndex(clusterCorpus, cIdx)
    // takedown requests arrive as two sequential micro-batches
    val srcDir = Files.createTempDirectory("graft-retract-src").toString
    victims.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(srcDir)
    victims.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(srcDir)
    val q = graft.streaming.RetractionStream.retractStream(
      spark.readStream.schema(victims.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      Some(mhIdx), Some(tIdx), Some(cIdx))
    q.awaitTermination(180000)

    // cluster index: membership equals a rebuild without the
    // retracted docs — takedowns no longer leak cluster evidence
    val streamed = graft.operators.Dedup.readClusterIndex(spark, cIdx).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val rebuilt = graft.operators.Dedup.clustersOf(
        clusterCorpus.join(victims.select("doc_id"), Seq("doc_id"), "left_anti"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(streamed.nonEmpty, "retraction left no clusters to compare")
    assert(streamed == rebuilt,
      s"cluster drift: only-streamed=${(streamed.toSet -- rebuilt.toSet).take(5)} " +
        s"only-rebuilt=${(rebuilt.toSet -- streamed.toSet).take(5)}")

    // text index: scores equal a rebuild without the retracted docs
    val terms = Seq("spark", "join", "vector")
    val atRest = graft.api.TextIndex.bm25AtRest(spark, tIdx, terms).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    val live = graft.api.TextIndex(remaining).bm25(terms).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    assert(atRest == live && atRest.nonEmpty,
      "streamed text retractions must score like a rebuild-without")

    // dedup index: a batch of exact copies of the victims is no
    // longer vetoed by them (but copies of surviving docs still are)
    val probe = docs.select((col("doc_id") + 50000L).as("doc_id"), col("text"))
    val pairs = graft.operators.Dedup.dedupAgainstIndex(spark, probe, mhIdx).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val vetoers = pairs.map(p => math.min(p._1, p._2)).filter(_ < 50000L).toSet
    assert(vetoers.nonEmpty && vetoers.forall(_ % 5 != 0),
      s"a retracted doc still vetoes: ${vetoers.filter(_ % 5 == 0).take(5)}")
  }
}

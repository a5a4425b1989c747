package graft

import graft.pipelines.CleanCorpus
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class CleanCorpusSpec extends SparkSpec {

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
      val id = r.getAs[Long]("doc_id"); id >= 10000L && id < 20000L
    })

    // near-dup copies (id+20000, 3 tokens dropped) mostly removed:
    // of each surviving (orig, near) pair the higher id was dropped
    val survivors = cleanedRows.map(_.getAs[Long]("doc_id")).toSet
    val nearBoth = survivors.filter(id => id >= 20000L && survivors.contains(id - 20000L))
    assert(nearBoth.size <= 2, s"near-dup pairs both surviving: $nearBoth")
  }

  test("pipeline is deterministic across runs") {
    val a = CleanCorpus.run(spark, sfDir).collect().map(_.getAs[Long]("doc_id")).sorted
    val b = CleanCorpus.run(spark, sfDir).collect().map(_.getAs[Long]("doc_id")).sorted
    assert(a.sameElements(b))
  }
}

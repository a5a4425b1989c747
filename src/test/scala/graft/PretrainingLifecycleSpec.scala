package graft

import graft.operators.{Dedup, TrainingPipeline}
import graft.pipelines.IncrementalIngest
import graft.api.ScaleOps
import org.apache.spark.sql.functions._

/** Capstone: the full pretraining data lifecycle on one corpus, each
  * stage consuming the previous stage's output — the training-data
  * counterpart of [[LifecycleSpec]] (which walks the vector-catalog
  * lifecycle). Crawl admission against a standing dedup index →
  * admitted corpus → tokenizer training → tokenize-and-pack →
  * deterministic shard export, with conservation asserted end to end.
  */
class PretrainingLifecycleSpec extends SparkSpec {

  test("crawl → admit → train tokenizer → pack → shard, tokens conserved end to end") {
    val docs = Tables.documents(spark, sfDir)
    val idx = java.nio.file.Files.createTempDirectory("graft-pretrain-idx").toString

    // ---- stage 1: two crawls admitted against the standing index.
    // crawl 2 re-carries exact copies of three crawl-1 docs (id+50000)
    // which the near-dup gate must reject.
    val crawl1 = docs.filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("text"))
    val copies = crawl1.limit(3)
      .select((col("doc_id") + 50000L).as("doc_id"), col("text"))
    val crawl2 = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text")).unionByName(copies)
    Dedup.writeMinhashIndex(crawl1.limit(0), idx) // empty standing index
    val adm1 = IncrementalIngest.ingest(spark, crawl1, idx)
    val adm2 = IncrementalIngest.ingest(spark, crawl2, idx)
    val admittedIds = (adm1.select("doc_id").collect() ++ adm2.select("doc_id").collect())
      .map(_.getLong(0)).toSet
    assert(copies.collect().map(_.getLong(0)).forall(!admittedIds.contains(_)),
      "exact re-crawled copies must be rejected by the index gate")
    assert(admittedIds.nonEmpty)

    // ---- stage 2: the admitted corpus (source recovered by id)
    val corpus = docs.filter(col("doc_id").isin(admittedIds.toSeq: _*))
      .select(col("doc_id"), col("source"), col("text"))

    // ---- stage 3: tokenizer training + packing
    val merges = TrainingPipeline.bpeTrain(corpus, 4)
    assert(merges.size == 4)
    val budget = 256
    val packed = TrainingPipeline.tokenizeAndPack(corpus, merges, budget)
      .withColumn("pack_id",
        xxhash64(concat_ws("#", col("source"), col("bin_id"), col("seq_no"))))
      .localCheckpoint()
    val packedTotal = packed.agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    // conservation: packed tokens == the corpus's BPE token count
    val bpeTotal = TrainingPipeline.bpeEncode(
        corpus.select(col("doc_id"), col("text")), merges)
      .agg(sum(size(col("bpe_tokens")))).collect()(0).getLong(0)
    assert(packedTotal == bpeTotal,
      s"token conservation broken: packed $packedTotal vs corpus $bpeTotal")

    // ---- stage 4: deterministic shard export of the training rows
    val out = java.nio.file.Files.createTempDirectory("graft-pretrain-shards").toString
    ScaleOps.exportShards(packed, out, shards = 4, idCol = "pack_id")
    val back = spark.read.parquet(out)
    assert(back.count() == packed.count())
    assert(back.agg(sum(col("n_tokens"))).collect()(0).getLong(0) == packedTotal)
  }
}

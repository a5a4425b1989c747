package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev harness (not part of the library surface): measure
  * recall@10 AND serving wall of each at-rest ANN family against
  * exact ground truth on a standing index + its corpus dir, with the
  * [[graft.operators.VectorIndex.servingCost]] candidate/rerank-mass
  * decomposition printed BESIDE every wall — the round-13 lesson:
  * a wall table without its pair masses cannot be decomposed into
  * work vs ambient after the fact. Emits one JSON line (and writes
  * it to target/recall_probe.json) so artifact assembly is
  * mechanical.
  * Args: corpusDir indexPath [qMod] [build]
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val idx = args(1)
    val qMod = if (args.length > 2) args(2).toLong else 10000L
    val doBuild = args.length > 3 && args(3) == "build"
    val spark = SparkSession.builder().master("local[32]")
      // one query's exact scan per shuffle partition: the 250-query ×
      // 5M-row window sort OOMs at 32 partitions
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    var buildSec = -1.0
    if (doBuild) {
      val t0 = System.nanoTime()
      operators.VectorIndex.buildFrom(spark, emb, idx)
      buildSec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] build done ($buildSec%.1f s)")
    }
    val queries = emb.filter(col("vec_id") % qMod === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .localCheckpoint()
    val nQ = queries.count()
    println(s"[probe] $nQ queries")
    val t0 = System.nanoTime()
    val exact = api.VectorCollection(emb, idCol = "vec_id")
      .search(queries, 10, api.Metric.Cosine)
      .select(col("q_id"), col("vec_id"), col("rn"), col("score"))
      .localCheckpoint()
    val exactSec = (System.nanoTime() - t0) / 1e9
    println(f"[probe] exact done ($exactSec%.1f s)")
    // the decomposition FIRST (cheap, id-only), so every wall below
    // prints beside the mass that explains it
    var cost = operators.VectorIndex.servingCost(spark, idx, queries)
      .map { case (f, c, r) => f -> ((c, r)) }.toMap
    cost.toSeq.sortBy(_._1).foreach { case (f, (c, r)) =>
      println(s"[probe] mass $f candidate_pairs=$c rerank_pairs=$r")
    }
    def massOf(name: String): (Long, Long) = {
      val fam =
        if (name.startsWith("ivfpq")) "ivfpq"
        else if (name.startsWith("ivf")) "ivf"
        else if (name.startsWith("pq")) "pq_flat"
        else if (name.startsWith("sq8")) "sq8"
        else if (name.startsWith("bq")) "bq"
        else "lsh"
      val (c, r) = cost(fam)
      // pool overrides change only the rerank mass (pool × queries)
      name.split("_pool") match {
        case Array(_, p) if p.forall(_.isDigit) => (c, p.toLong * nQ)
        case _ => (c, r)
      }
    }
    val results = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    def rec(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = api.ScaleOps.recallAtK(exact, df)
        .agg(avg(col("recall"))).head.getDouble(0)
      val wall = (System.nanoTime() - t0) / 1e9
      val (c, rr) = massOf(name)
      results(name) = (r, wall)
      println(f"[probe] $name recall@10 = $r%.4f ($wall%.1f s, " +
        s"candidate_pairs=$c rerank_pairs=$rr)")
    }
    import operators.VectorIndex._
    val meta = readMeta(spark, idx)
    println(s"[probe] nlist=${meta.centroids.size} nprobe=${meta.defaultNProbe} " +
      s"pool=${meta.defaultPool} opq=${meta.rotation.isDefined} bound=${meta.budgetBound} " +
      s"bqPool=${meta.defaultBqPool} bqBound=${meta.bqBudgetBound} " +
      s"lshBits=${meta.lshBits} lshBands=${meta.lshBands} lshBound=${meta.lshBudgetBound}")
    rec("ivf", searchIvf(spark, idx, queries, cached = false))
    rec("ivfpq_served_default", searchIvfPq(spark, idx, queries, cached = false))
    rec("ivfpq_pool100", searchIvfPq(spark, idx, queries, pool = 100, cached = false))
    rec("ivfpq_pool1000", searchIvfPq(spark, idx, queries, pool = 1000, cached = false))
    rec("pq_served_default", searchPq(spark, idx, queries, cached = false))
    rec("sq8", searchSq8(spark, idx, queries, cached = false))
    rec("bq_served_default", searchBq(spark, idx, queries, cached = false))
    rec("bq_pool100", searchBq(spark, idx, queries, pool = 100, cached = false))
    rec("bq_pool1000", searchBq(spark, idx, queries, pool = 1000, cached = false))
    rec("lsh", searchLsh(spark, idx, queries, cached = false))
    // optional: measure the banding-drift remedy AT THIS SCALE — the
    // whole point of reband is its proportional cost, so the claim
    // lives or dies on a wall measured at the same 5M corpus the
    // retrain alternative is measured on (the build above)
    var rebandSec = -1.0
    if (args.contains("reband")) {
      val t0 = System.nanoTime()
      val m = operators.VectorIndex.reband(spark, idx)
      rebandSec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] reband done ($rebandSec%.1f s, bits=${m.lshBits} " +
        f"bands=${m.lshBands} bound=${m.lshBudgetBound})")
      // the postings table changed: re-derive its candidate mass so
      // the rebanded wall prints beside the mass that explains it
      cost = operators.VectorIndex.servingCost(spark, idx, queries)
        .map { case (f, c, r) => f -> ((c, r)) }.toMap
      rec("lsh_rebanded", searchLsh(spark, idx, queries, cached = false))
    }
    val fams = results.map { case (n, (r, w)) =>
      val (c, rr) = massOf(n)
      f""""$n":{"recall":$r%.4f,"wall_s":$w%.1f,"candidate_pairs":$c,"rerank_pairs":$rr}"""
    }.mkString(",")
    val json =
      f"""{"corpus":"$dir","index":"$idx","queries":$nQ,"build_s":$buildSec%.1f,""" +
        f""""exact_truth_s":$exactSec%.1f,"reband_s":$rebandSec%.1f,"families":{$fams}}"""
    println(json)
    val out = new java.io.File("target/recall_probe.json")
    out.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(json) finally w.close()
    spark.stop()
  }
}

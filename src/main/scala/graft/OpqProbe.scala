package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway dev harness: OPQ vs plain-residual vs raw PQ recall on a
  * parameterized decayed-spectrum cloud (or a corpus dir), at several
  * fixed pools. Args: [rows] [decay] [coneScale] [pools...]
  */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val (cloud, pools) =
      if (args.nonEmpty && args(0).startsWith("dir:")) {
        val dir = args(0).stripPrefix("dir:")
        val pools = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10, 100)
        println(s"[opq] corpus dir=$dir")
        (Tables.embeddings(spark, dir)
          .select(col("vec_id"), col("embedding"), col("label")).localCheckpoint(), pools)
      } else {
        val rows = if (args.length > 0) args(0).toLong else 20000L
        val decay = if (args.length > 1) args(1).toDouble else 6.0
        val coneScale = if (args.length > 2) args(2).toDouble else 0.35
        val pls = if (args.length > 3) args.drop(3).map(_.toInt).toSeq else Seq(10, 100)
        val dim = 64
        val rm = new java.util.Random(77L)
        val mu = Array.fill(dim)(rm.nextGaussian())
        val muN = math.sqrt(mu.map(x => x * x).sum)
        val nCones = rows / 10
        val c = spark.range(rows).map { id =>
          val cone = (id % nCones).toInt
          val rc = new java.util.Random(cone * 6971L + 5)
          val r = new java.util.Random(id * 93077L + 17)
          val v = Array.tabulate(dim) { i =>
            val scale = math.exp(-i / decay)
            (mu(i) / muN * 4.0 + coneScale * scale * rc.nextGaussian()
              + 0.08 * scale * r.nextGaussian()).toFloat
          }
          val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
          (id, v.map(_ / n).toSeq, (cone % 10))
        }.toDF("vec_id", "embedding", "label").localCheckpoint()
        println(s"[opq] cloud rows=$rows decay=$decay coneScale=$coneScale")
        (c, pls)
      }
    val rows = cloud.count()
    val queries = cloud.filter(col("vec_id") % 397 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .localCheckpoint()
    val exact = api.VectorCollection(cloud, idCol = "vec_id")
      .search(queries, 10, api.Metric.Cosine).localCheckpoint()
    def recOf(df: DataFrame): Double =
      api.ScaleOps.recallAtK(exact, df).agg(avg(col("recall"))).head.getDouble(0)
    val base = operators.IndexCache.tempDir("graft-opqprobe")
    val nlist = math.max(128, operators.Ann.nlistFor(rows))
    val opqPath = s"$base/opq"
    val t0 = System.nanoTime()
    val meta = operators.VectorIndex.buildFrom(spark, cloud, opqPath, nlist = nlist)
    println(f"[opq] build ${(System.nanoTime()-t0)/1e9}%.1f s nlist=${meta.centroids.size} np=${meta.defaultNProbe} pool=${meta.defaultPool} bound=${meta.budgetBound}")
    val resPath = s"$base/res"
    operators.VectorIndex.writeCorpus(spark, cloud, resPath,
      operators.VectorIndex.Meta(meta.centroids,
        operators.Quantization.trainPqCodebooksFrom(cloud, meta.centroids),
        pqResidual = true), doCalibrate = false)
    val rawPath = s"$base/raw"
    operators.VectorIndex.writeCorpus(spark, cloud, rawPath,
      operators.VectorIndex.Meta(meta.centroids,
        operators.Quantization.trainPqCodebooksRawFrom(cloud)), doCalibrate = false)
    val np = meta.defaultNProbe.getOrElse(-1)
    pools.foreach { pl =>
      val o = recOf(operators.VectorIndex.searchIvfPq(spark, opqPath, queries, nprobe = np, pool = pl, cached = false))
      val r = recOf(operators.VectorIndex.searchIvfPq(spark, resPath, queries, nprobe = np, pool = pl, cached = false))
      val w = recOf(operators.VectorIndex.searchIvfPq(spark, rawPath, queries, nprobe = np, pool = pl, cached = false))
      println(f"[opq] pool $pl%5d: opq $o%.3f residual $r%.3f raw $w%.3f")
    }
    val served = recOf(operators.VectorIndex.searchIvfPq(spark, opqPath, queries, cached = false))
    println(f"[opq] served default (np=$np pool=${meta.defaultPool}) = $served%.3f")

    // reconstruction-MSE diagnostic: is quantization error even the
    // recall bottleneck, and does the rotation reduce it?
    val sample = cloud.filter(col("vec_id") % 17 === 0).limit(2000)
      .select(col("embedding")).collect()
      .map(r => operators.Ann.numericArray(r.getSeq[Any](0)))
    val cents = meta.centroids.map(_.toArray.map(_.toDouble)).toArray
    val ccN = cents.map(c => c.map(x => x * x).sum)
    def residOf(v: Array[Double]): Array[Double] = {
      val nrm = math.sqrt(v.map(x => x * x).sum)
      var best = 0; var bd = Double.MaxValue
      for (c <- cents.indices) {
        var dot = 0.0
        for (j <- 0 until math.min(cents(c).length, v.length)) dot += cents(c)(j) * v(j)
        val d = ccN(c) - 2.0 * dot / math.max(1e-12, nrm)
        if (d < bd) { bd = d; best = c }
      }
      Array.tabulate(v.length)(k => v(k) - (if (k < cents(best).length) cents(best)(k) else 0.0))
    }
    def mseOf(books: Seq[Seq[Seq[Float]]], rot: Option[Seq[Seq[Float]]]): Double = {
      val cb = books.map(_.map(_.toArray.map(_.toDouble)).toArray).toArray
      val rm = rot.map(_.map(_.toArray.map(_.toDouble)).toArray)
      var tot = 0.0
      sample.foreach { v0 =>
        val res = residOf(v0)
        val u = rm.fold(res)(m => Array.tabulate(m.length)(i =>
          (0 until math.min(m(i).length, res.length)).map(j => m(i)(j) * res(j)).sum))
        var err = 0.0
        for (j <- cb.indices) {
          val base = j * 8
          var bk = 0; var bd = Double.MaxValue
          for (c <- cb(j).indices) {
            var d = 0.0
            for (i <- 0 until 8) { val t = u(base + i) - cb(j)(c)(i); d += t * t }
            if (d < bd) { bd = d; bk = c }
          }
          err += bd
        }
        tot += err
      }
      tot / sample.length
    }
    val resMeta = operators.VectorIndex.readMeta(spark, resPath)
    println(f"[opq] residual-recon MSE: opq ${mseOf(meta.codebooks, meta.rotation)}%.6f " +
      f"plain ${mseOf(resMeta.codebooks, None)}%.6f " +
      f"(residual norm² ${sample.map(v => residOf(v).map(x => x * x).sum).sum / sample.length}%.6f)")

    // residual covariance spectrum: per-subspace variance (unrotated)
    // and the decay profile — is there anything for a rotation to
    // balance?
    val resids = sample.map(residOf)
    val dim0 = resids(0).length
    val varPerDim = Array.tabulate(dim0)(i => resids.map(v => v(i) * v(i)).sum / resids.length)
    val bySub = varPerDim.grouped(8).map(_.sum).toArray
    println("[opq] residual var by subspace: " + bySub.map(v => f"$v%.4f").mkString(" "))
    meta.rotation.foreach { rr =>
      val m = rr.map(_.toArray.map(_.toDouble)).toArray
      val rotRes = resids.map(v => Array.tabulate(m.length)(i =>
        (0 until math.min(m(i).length, v.length)).map(j => m(i)(j) * v(j)).sum))
      val rotVar = Array.tabulate(dim0)(i => rotRes.map(v => v(i) * v(i)).sum / rotRes.length)
      println("[opq] ROTATED var by subspace: " +
        rotVar.grouped(8).map(_.sum).map(v => f"$v%.5f").mkString(" "))
    }
    println("[opq] residual var by dim (first 16): " + varPerDim.take(16).map(v => f"$v%.4f").mkString(" "))
    spark.stop()
  }
}

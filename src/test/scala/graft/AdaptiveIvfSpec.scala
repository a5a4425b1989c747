package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, VectorIndex}

/** The corpus-adaptive IVF geometry (Ann.nlistFor / nprobeFor /
  * two-level training): closed forms of the policy, determinism and
  * shape of hierarchical training, and recall of a large-nlist
  * geometry served through the unchanged search path.
  */
class AdaptiveIvfSpec extends SparkSpec {

  test("nlist policy: floor, target-size growth, sample-bounded cap") {
    // the floor keeps every driver-scale corpus on the measured
    // 16-list geometry bit-for-bit
    assert(Ann.nlistFor(0) == Ann.NList)
    assert(Ann.nlistFor(2000) == Ann.NList)
    assert(Ann.nlistFor(Ann.NList * Ann.ListTarget) == Ann.NList)
    // above it, nlist tracks n / ListTarget (constant-ish list size)
    assert(Ann.nlistFor(555000) == (555000 / Ann.ListTarget).toInt)
    assert(Ann.nlistFor(5550000) == (5550000 / Ann.ListTarget).toInt)
    // monotone, and capped where the bounded train sample runs out
    // of estimation power
    val pts = Seq(1L, 1000L, 100000L, 1000000L, 10000000L, 10000000000L)
    val ns = pts.map(Ann.nlistFor)
    assert(ns == ns.sorted)
    assert(Ann.nlistFor(10000000000L) == Ann.MaxNList)
  }

  test("nprobe policy: measured floor at the 16-list geometry, sqrt growth") {
    // the 16-list budget IS the measured NProbe — default-budget
    // callers on small corpora are unchanged by the policy
    assert(Ann.nprobeFor(Ann.NList) == Ann.NProbe)
    assert(Ann.nprobeFor(1) == Ann.NProbe)
    // probed rows per query = nprobe * (n/nlist) ~ sqrt(nlist) * ListTarget
    assert(Ann.nprobeFor(135) == 12)
    assert(Ann.nprobeFor(1355) == 37)
    assert(Ann.nprobeFor(Ann.MaxNList) == 46)
  }

  /** A deterministic 24k-vector, 64-dim clustered cloud: 96 cone
    * centers, points jittered around them — enough structure that a
    * trained geometry concentrates each cone into few lists.
    */
  private lazy val cloud = {
    import spark.implicits._
    val dim = 64
    (0L until 24000L).map { id =>
      val r = new java.util.Random(id * 2654435761L + 13)
      val cone = (id % 96L).toInt
      val rc = new java.util.Random(cone * 40503L + 7)
      val center = Array.fill(dim)(rc.nextGaussian())
      val v = center.map(c => (c + 0.15 * r.nextGaussian()).toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      (id, v.map(_ / n).toSeq, cone % 10)
    }.toDF("vec_id", "embedding", "label")
  }

  test("two-level training is deterministic and mass-balanced") {
    val a = Ann.trainCentroidsFrom(cloud, 128)
    val b = Ann.trainCentroidsFrom(cloud, 128)
    assert(a == b, "hierarchical training must be bit-deterministic")
    // proportional rounding lands within a coarse-cell of the target
    assert(math.abs(a.size - 128) <= 12, s"centroid count ${a.size} far from 128")
    // no empty-geometry degenerate cells: every centroid is finite
    assert(a.forall(_.forall(f => !f.isNaN && !f.isInfinite)))
  }

  test("large-nlist geometry through the unchanged search path: recall and full-probe exactness") {
    val path = graft.operators.IndexCache.tempDir("graft-adaptive-ivf") + "/vidx"
    val meta = VectorIndex.buildFrom(spark, cloud, path, nlist = 128)
    assert(meta.centroids.size > Ann.HierarchicalNList,
      "spec must exercise the hierarchical branch")
    val queries = cloud.filter(col("vec_id") % 400 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = api.VectorCollection(cloud, idCol = "vec_id")
      .search(queries, 10, api.Metric.Cosine)
    // default budget resolves to the policy (nprobeFor(nlist)), not
    // the 16-list constant
    val approx = VectorIndex.searchIvf(spark, path, queries)
    val rec = api.ScaleOps.recallAtK(exact, approx)
      .agg(avg(col("recall"))).head.getDouble(0)
    info(f"adaptive-geometry recall@10 = $rec%.3f at nprobe ${Ann.nprobeFor(meta.centroids.size)}/${meta.centroids.size}")
    assert(rec >= 0.9, f"recall $rec%.3f below the 0.9 budget on the adaptive geometry")
    // probing every list is exact — same contract the 16-list
    // geometry pins in IvfRecallSweepSpec
    val full = VectorIndex.searchIvf(spark, path, queries,
      nprobe = meta.centroids.size)
    val recFull = api.ScaleOps.recallAtK(exact, full)
      .agg(avg(col("recall"))).head.getDouble(0)
    assert(recFull == 1.0, s"full probe not exact: $recFull")
  }

  /** A CONCENTRATED cloud (the aniso shape): every vector shares a
    * strong global mean direction, cones sit as small offsets on top
    * — the geometry where the closed-form √nlist probe budget
    * under-delivers because a query's true neighbors spread across
    * more lists than √nlist covers (measured recall@10 = 0.811 at
    * the aniso-sf100 corpus before calibration).
    */
  private lazy val hardCloud = {
    import spark.implicits._
    val dim = 64
    val rm = new java.util.Random(99L)
    val mu = Array.fill(dim)(rm.nextGaussian())
    val muN = math.sqrt(mu.map(x => x * x).sum)
    // many more cones than lists, crowded around a dominant shared
    // mean: in-cone true neighbors and out-of-cone noise subtend
    // similar tiny angles, so a trained 128-list geometry cannot keep
    // a cone inside √nlist probed lists
    (0L until 20000L).map { id =>
      val cone = (id % 2000L).toInt
      val rc = new java.util.Random(cone * 7919L + 3)
      val off = Array.fill(dim)(rc.nextGaussian() * 0.06)
      val r = new java.util.Random(id * 104729L + 11)
      val v = Array.tabulate(dim)(i =>
        (mu(i) / muN * 4.0 + off(i) + 0.06 * r.nextGaussian()).toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      (id, v.map(_ / n).toSeq, cone % 10)
    }.toDF("vec_id", "embedding", "label")
  }

  test("probe calibration: persisted default covers the hard cloud at >= 0.9; small geometries untouched") {
    val path = graft.operators.IndexCache.tempDir("graft-calib-ivf") + "/vidx"
    val meta = VectorIndex.buildFrom(spark, hardCloud, path, nlist = 128)
    val floor = Ann.nprobeFor(meta.centroids.size)
    assert(meta.defaultNProbe.isDefined, "adaptive geometry must calibrate")
    val np = meta.defaultNProbe.get
    info(s"calibrated nprobe = $np (floor $floor) over ${meta.centroids.size} lists")
    assert(np >= floor, "calibration must never fall below the closed form")
    // the demonstration this spec exists for: on the concentrated
    // cloud the measured budget EXCEEDS the geometry-blind √nlist
    // (everything is deterministic — cloud, training, calibration —
    // so this pin is stable)
    assert(np > floor,
      s"hard cloud should need more than the closed form, got $np == floor")
    // the persisted value round-trips through the layout (not just
    // the session cache)
    val onDisk = spark.read.parquet(s"$path/meta/params")
      .filter(col("param") === "default_nprobe")
      .head.getLong(1).toInt
    assert(onDisk == np)
    // held-out queries at the CALIBRATED default hold the serving
    // floor on the geometry the closed form under-probes
    val queries = hardCloud.filter(col("vec_id") % 397 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = api.VectorCollection(hardCloud, idCol = "vec_id")
      .search(queries, 10, api.Metric.Cosine)
    val approx = VectorIndex.searchIvf(spark, path, queries)
    val rec = api.ScaleOps.recallAtK(exact, approx)
      .agg(avg(col("recall"))).head.getDouble(0)
    info(f"hard-cloud recall@10 = $rec%.4f at calibrated nprobe $np")
    assert(rec >= 0.9, f"calibrated default under-delivers: $rec%.4f")
    // an explicit caller budget still wins over the calibrated default
    val narrow = VectorIndex.searchIvf(spark, path, queries, nprobe = 1)
    val recNarrow = api.ScaleOps.recallAtK(exact, narrow)
      .agg(avg(col("recall"))).head.getDouble(0)
    assert(recNarrow < rec, "explicit nprobe=1 must not be overridden")
    // small (16-list floor) geometries stay bit-for-bit: no params
    // table, closed-form default
    val smallPath = graft.operators.IndexCache.tempDir("graft-calib-small") + "/vidx"
    val smallMeta = VectorIndex.buildFrom(spark,
      cloud.filter(col("vec_id") < 3000), smallPath)
    assert(smallMeta.centroids.size == Ann.NList)
    assert(smallMeta.defaultNProbe.isEmpty)
    // params exists (it carries the pq_residual marker for every new
    // build) but holds NO probe override on the floor geometry
    assert(spark.read.parquet(s"$smallPath/meta/params")
      .filter(col("param") === "default_nprobe").count() == 0)
  }

  test("residual PQ recovers the code families on the concentrated cloud; raw layouts keep the legacy serve path") {
    val path = graft.operators.IndexCache.tempDir("graft-respq") + "/vidx"
    val meta = VectorIndex.buildFrom(spark, hardCloud, path, nlist = 128)
    assert(meta.pqResidual, "new builds must mark residual codes")
    val queries = hardCloud.filter(col("vec_id") % 397 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = api.VectorCollection(hardCloud, idCol = "vec_id")
      .search(queries, 10, api.Metric.Cosine)
    def recOf(df: org.apache.spark.sql.DataFrame): Double =
      api.ScaleOps.recallAtK(exact, df).agg(avg(col("recall"))).head.getDouble(0)
    val rIvfPq = recOf(VectorIndex.searchIvfPq(spark, path, queries))
    val rPq = recOf(VectorIndex.searchPq(spark, path, queries))
    // the raw-code shape on the SAME corpus and geometry (what a
    // pre-residual layout serves): codes of v instead of v − c,
    // trained on RAW samples — a raw layout carried raw-trained
    // codebooks, and encoding raw vectors with residual-trained books
    // would overstate the residual gap through a train/encode
    // mismatch
    val rawPath = graft.operators.IndexCache.tempDir("graft-rawpq") + "/vidx"
    VectorIndex.writeCorpus(spark, hardCloud, rawPath,
      VectorIndex.Meta(meta.centroids,
        graft.operators.Quantization.trainPqCodebooksRawFrom(hardCloud)),
      doCalibrate = false)
    // encoding-quality comparison at a FIXED small pool: the
    // calibrated pool (rung 2) deliberately rescues recall by
    // widening the pool, so default-served numbers no longer separate
    // good codes from bad — the pool that compensates IS the cost
    val pool = 20
    val rIvfPqP = recOf(VectorIndex.searchIvfPq(spark, path, queries, pool = pool))
    val rawIvfPq = recOf(VectorIndex.searchIvfPq(spark, rawPath, queries, pool = pool))
    val rawPqR = recOf(VectorIndex.searchPq(spark, rawPath, queries, pool = pool))
    val rPqP = recOf(VectorIndex.searchPq(spark, path, queries, pool = pool))
    info(f"pool-$pool ivfpq residual $rIvfPqP%.3f vs raw $rawIvfPq%.3f; pq residual $rPqP%.3f vs raw $rawPqR%.3f; served defaults $rIvfPq%.3f/$rPq%.3f")
    // this cloud is deliberately EXTREME (angular spread ~0.12 rad —
    // harder than the measured aniso corpora). At the 4-bit-era k*
    // the raw/residual gap here was decisive (0.635 vs 0.065); the
    // 8-bit codes resolve absolute position well enough that raw
    // codes closed most of it (measured 0.718 vs 0.641 at pool 20) —
    // residual stays strictly better on BOTH serve paths, and the
    // production-scale gap lives in the aniso slope artifacts
    assert(rIvfPq >= 0.5, f"residual IVFPQ recall $rIvfPq%.3f")
    assert(rPq >= 0.5, f"residual flat-PQ recall $rPq%.3f")
    assert(rIvfPqP >= rawIvfPq + 0.03 && rPqP >= rawPqR + 0.03,
      f"residual codes must beat raw codes at pool $pool: $rIvfPqP%.3f vs $rawIvfPq%.3f, $rPqP%.3f vs $rawPqR%.3f")
  }

  /** A DECAYED-SPECTRUM concentrated cloud — the aniso-organic shape
    * where round 11 measured residual PQ budget-bound: a dominant
    * shared mean, and residual structure (cone offsets + noise) whose
    * per-dimension scale decays exp(−i/2), so nearly all residual
    * variance lands in the FIRST PQ subspace (measured 0.0027 vs
    * ~0.0000 across the other seven). Without OPQ, 7 of the 8 code
    * bytes quantize noise; the balanced rotation is what earns them
    * back (measured: balanced to ~0.0005 per subspace, recon MSE
    * 184× lower, pool-10 recall 0.655 → 0.980).
    */
  private lazy val decayedCloud = {
    import spark.implicits._
    val dim = 64
    val rm = new java.util.Random(77L)
    val mu = Array.fill(dim)(rm.nextGaussian())
    val muN = math.sqrt(mu.map(x => x * x).sum)
    (0L until 20000L).map { id =>
      val cone = (id % 2000L).toInt
      val rc = new java.util.Random(cone * 6971L + 5)
      val r = new java.util.Random(id * 93077L + 17)
      val v = Array.tabulate(dim) { i =>
        val scale = math.exp(-i / 2.0)
        (mu(i) / muN * 4.0 + 0.6 * scale * rc.nextGaussian()
          + 0.08 * scale * r.nextGaussian()).toFloat
      }
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      (id, v.map(_ / n).toSeq, cone % 10)
    }.toDF("vec_id", "embedding", "label")
  }

  test("OPQ rotation lifts decayed-spectrum residual codes; pool calibration persists a measured default and flags budget-bound") {
    val path = graft.operators.IndexCache.tempDir("graft-opq") + "/vidx"
    val meta = VectorIndex.buildFrom(spark, decayedCloud, path, nlist = 128)
    assert(meta.rotation.isDefined, "new builds must carry the OPQ rotation")
    assert(meta.defaultPool.isDefined, "adaptive builds must calibrate the pool")
    // rotation round-trips through the layout: evict the session meta
    // by reading through a fresh cache key (params + rotation on disk)
    val onDisk = spark.read.parquet(s"$path/meta/params")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(onDisk.get("pq_opq").contains(1L))
    assert(onDisk.contains("default_pool"))
    val queries = decayedCloud.filter(col("vec_id") % 397 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = api.VectorCollection(decayedCloud, idCol = "vec_id")
      .search(queries, 10, api.Metric.Cosine)
    def recOf(df: org.apache.spark.sql.DataFrame): Double =
      api.ScaleOps.recallAtK(exact, df).agg(avg(col("recall"))).head.getDouble(0)
    // the plain-residual shape on the SAME corpus and geometry (what
    // a round-11 layout serves): residual-trained codebooks, no
    // rotation, constant pool default
    val resPath = graft.operators.IndexCache.tempDir("graft-res-noopq") + "/vidx"
    VectorIndex.writeCorpus(spark, decayedCloud, resPath,
      VectorIndex.Meta(meta.centroids,
        graft.operators.Quantization.trainPqCodebooksFrom(decayedCloud, meta.centroids),
        pqResidual = true), doCalibrate = false)
    // isolate the ROTATION's contribution at a FIXED small pool (the
    // calibrated pool would rescue the unrotated codes by widening) …
    val rOpqP10 = recOf(VectorIndex.searchIvfPq(spark, path, queries,
      nprobe = meta.defaultNProbe.getOrElse(-1), pool = 10))
    val rResP10 = recOf(VectorIndex.searchIvfPq(spark, resPath, queries,
      nprobe = meta.defaultNProbe.getOrElse(-1), pool = 10))
    // … and the shipped default (rotation + calibrated pool together)
    val rOpqDefault = recOf(VectorIndex.searchIvfPq(spark, path, queries))
    val rFlatDefault = recOf(VectorIndex.searchPq(spark, path, queries))
    info(f"ivfpq pool10: opq $rOpqP10%.3f vs residual-only $rResP10%.3f; " +
      f"served defaults: ivfpq $rOpqDefault%.3f flat $rFlatDefault%.3f " +
      f"(pool ${meta.defaultPool.get}, bound ${meta.budgetBound})")
    assert(rOpqP10 >= rResP10 + 0.15,
      f"OPQ must decisively lift the decayed-spectrum cloud at pool 10: $rOpqP10%.3f vs $rResP10%.3f")
    assert(rOpqDefault >= 0.85,
      f"served IVFPQ default (rotation + calibrated pool) under-delivers: $rOpqDefault%.3f")
    assert(rFlatDefault >= 0.85,
      f"served flat-PQ default under-delivers: $rFlatDefault%.3f")
    // an artificially tiny cost cap CANNOT reach the target: the
    // calibration must persist the cap and raise the budget-bound
    // flag instead of an unbounded pool
    val capped = VectorIndex.calibrate(spark, path, meta, poolCap = 10)
    assert(capped.budgetBound, "a 10-candidate cap must be budget-bound here")
    assert(capped.defaultPool.contains(10))
  }

  test("centered BQ sign bits restore the Hamming prefilter on a mean-dominated cloud") {
    val path = graft.operators.IndexCache.tempDir("graft-bqmu") + "/vidx"
    val meta = VectorIndex.buildFrom(spark, hardCloud, path, nlist = 128)
    assert(meta.bqMean.isDefined, "new builds must carry the BQ centering vector")
    val queries = hardCloud.filter(col("vec_id") % 397 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = api.VectorCollection(hardCloud, idCol = "vec_id")
      .search(queries, 10, api.Metric.Cosine)
    def recOf(df: org.apache.spark.sql.DataFrame): Double =
      api.ScaleOps.recallAtK(exact, df).agg(avg(col("recall"))).head.getDouble(0)
    val centered = recOf(VectorIndex.searchBq(spark, path, queries))
    // the RAW-bit layout on the same corpus and geometry (what a
    // pre-centering layout serves): every vector shares the dominant
    // mean's sign pattern, so stored words barely differ and the
    // Hamming prefilter carries no neighbor signal
    val rawPath = graft.operators.IndexCache.tempDir("graft-bqraw") + "/vidx"
    VectorIndex.writeCorpus(spark, hardCloud, rawPath,
      meta.copy(defaultNProbe = None, defaultPool = None, bqMean = None),
      doCalibrate = false)
    val raw = recOf(VectorIndex.searchBq(spark, rawPath, queries))
    info(f"bq centered $centered%.3f vs raw $raw%.3f")
    assert(centered >= raw + 0.2,
      f"centering must decisively lift mean-dominated BQ: $centered%.3f vs $raw%.3f")
    // round-trips through the layout, surfaced to operators
    val onDisk = spark.read.parquet(s"$path/meta/params")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(onDisk.get("bq_centered").contains(1L))
  }

  test("BQ pool and LSH band count calibrate off the shared truth set; served defaults hold the floor") {
    val path = graft.operators.IndexCache.tempDir("graft-bqlsh-cal") + "/vidx"
    val meta = VectorIndex.buildFrom(spark, hardCloud, path, nlist = 128)
    // rung 3/4 outputs persist like every other calibrated knob
    assert(meta.defaultBqPool.isDefined, "adaptive builds must calibrate the BQ pool")
    assert(meta.lshBands.exists(_ >= 16), s"band count below the 16 legacy floor: ${meta.lshBands}")
    val onDisk = spark.read.parquet(s"$path/meta/params")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(onDisk.contains("default_bq_pool"), s"params: ${onDisk.keys}")
    assert(onDisk.contains("lsh_bands"))
    val queries = hardCloud.filter(col("vec_id") % 397 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = api.VectorCollection(hardCloud, idCol = "vec_id")
      .search(queries, 10, api.Metric.Cosine)
    def recOf(df: org.apache.spark.sql.DataFrame): Double =
      api.ScaleOps.recallAtK(exact, df).agg(avg(col("recall"))).head.getDouble(0)
    // served DEFAULTS (no explicit knobs) must reach the floor — or
    // the layout must say, in its persisted params, that the encoding
    // budget itself is the limit (the honest budget-bound contract)
    val bqRec = recOf(VectorIndex.searchBq(spark, path, queries))
    val lshRec = recOf(VectorIndex.searchLsh(spark, path, queries))
    info(f"served defaults on the mean-dominated cloud: bq $bqRec%.3f " +
      f"(pool ${meta.defaultBqPool.get}, bound ${meta.bqBudgetBound}); " +
      f"lsh $lshRec%.3f (bands ${meta.lshBands.get}, bits ${meta.lshBits.get}, " +
      f"bound ${meta.lshBudgetBound})")
    assert(bqRec >= 0.85 || meta.bqBudgetBound,
      f"uncapped BQ calibration must serve >= 0.85: $bqRec%.3f")
    assert(lshRec >= 0.85 || meta.lshBudgetBound,
      f"unflagged LSH band calibration must serve >= 0.85: $lshRec%.3f")
    // a 16-band legacy meta probing the calibrated table reads a
    // correct SUBSET (prefix-stable planes): recall can only drop,
    // rows can never be wrong — pin via explicit-pool/band identity
    // of the first-16-bands keys being served at all
    val statsParams = VectorIndex.servingParams(spark, path)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statsParams.get("lsh_bands") == meta.lshBands.map(_.toLong),
      "stats surface must report the calibrated band count")
    assert(statsParams.get("default_bq_pool") == meta.defaultBqPool.map(_.toLong))
    // the postings table and the meta must agree on the band space —
    // the invariant the post-calibration conditional rewrite protects
    // (a table banded under one count probed under another silently
    // degrades recall)
    val tableBands = spark.read.parquet(s"$path/lsh")
      .agg(max(col("band_id"))).head.getInt(0) + 1
    assert(tableBands == meta.lshBands.get,
      s"postings band space $tableBands != calibrated ${meta.lshBands.get}")
  }
}

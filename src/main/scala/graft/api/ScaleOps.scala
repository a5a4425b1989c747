package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew and co-location utilities for 100 TB operation — the levers
  * SURVEY.md §4 calls out (salting for skewed keys, bucketing for
  * shuffle-free joins), packaged so operators and users apply them
  * declaratively. Results are provably identical to the unsalted /
  * unbucketed plans (see ScaleOpsSpec).
  */
object ScaleOps {

  /** Two-stage salted sum/count aggregation: stage 1 aggregates on
    * (key, salt) — spreading a hot key over `buckets` reducers —
    * stage 2 merges the partials. `saltFrom` must be a deterministic
    * per-row column (an id) so plans stay replayable.
    */
  def saltedAgg(df: DataFrame, keyCol: String, valueCol: String, saltFrom: Column,
                buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(saltFrom), lit(buckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n_rows"))

  /** Salted equi-join for a skewed key: the big side gets a
    * deterministic salt; the small side is replicated across all
    * `buckets` salts; the join key becomes (key, salt), splitting a
    * hot key's rows over `buckets` tasks. Small side grows ×buckets —
    * use for genuinely small/dimension right sides.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltFrom: Column,
                 buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(hash(saltFrom), lit(buckets)))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(explodedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a DataFrame bucketed+sorted by `key` as a catalog table:
    * two tables bucketed the same way join with zero exchange (the
    * scan itself is the partitioning). This is how the vector
    * collection would be laid out at rest so upserts, point-gets and
    * id-joins never shuffle the corpus.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write.bucketBy(numBuckets, key).sortBy(key)
      .mode("overwrite").format("parquet").saveAsTable(table)

  /** Z-value of two non-negative integer columns: their low `bits`
    * bits interleaved (x even positions, y odd) — the space-filling
    * curve that clusters 2-D-close rows into 1-D-close key ranges.
    * Pure per-row arithmetic in one higher-order expression, fully
    * codegen'd.
    */
  def zValue(xCol: String, yCol: String, bits: Int = 16): Column =
    expr(
      s"""aggregate(sequence(0, $bits - 1), 0L, (acc, i) ->
         |  acc + shiftleft(shiftright(CAST($xCol AS LONG), i) & 1, 2 * i)
         |      + shiftleft(shiftright(CAST($yCol AS LONG), i) & 1, 2 * i + 1))""".stripMargin)

  /** Z-order clustered write (the Delta `OPTIMIZE ZORDER BY` role):
    * range-partition and sort the data by the interleaved key of two
    * filter columns, so each output file covers a small rectangle of
    * the (x, y) space.
    *
    * CONTRACT: `xCol`/`yCol` must be non-negative and < 2^bits —
    * zValue interleaves only the low `bits` bits, so values outside
    * that range alias (x and x + 2^bits get the same key) and the
    * clustering silently degrades. Pre-bucket raw columns first
    * (e.g. `pmod(hash(c), 1 << bits)`, or a range bucket that
    * preserves order). A scan filtered on x AND y then skips most
    * files on their min/max footer statistics — the multi-dimensional
    * file-skipping a single-column sort can't give. At 100 TB this is
    * the difference between reading the whole corpus and reading the
    * few files whose bounding box intersects the predicate
    * (ScaleOpsSpec measures exactly that).
    */
  def zorderWrite(df: DataFrame, path: String, xCol: String, yCol: String,
                  numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(xCol, yCol, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Deterministic shard export — the dataset→trainer handoff: rows
    * land in `shards` stable shards by id hash (NOT repartitionByRange,
    * whose sampled boundaries differ run to run), each shard a
    * directory with its rows sorted by id. Re-exporting the same
    * frame reproduces byte-identical shard membership, so downstream
    * training-data loaders can resume / compare across exports. At
    * 100 TB this is one hash shuffle; shard count is the parallelism
    * knob for the consumer, not Spark.
    */
  def exportShards(df: DataFrame, path: String, shards: Int,
                   idCol: String = "doc_id"): Unit =
    df.withColumn("shard", pmod(xxhash64(col(idCol)), lit(shards.toLong)))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Recall@k of an approximate search result against the exact one —
    * the continuous quality monitor an ANN deployment runs after
    * every index rebuild/append (the measured counterpart of the
    * nprobe sweep in SURVEY §4). Both inputs are (q_id, vec_id, …)
    * top-k frames, e.g. `VectorIndex.searchIvf` vs
    * `VectorCollection.search`. Returns one row per query
    * (q_id, n_exact, n_hit, recall) plus the ordering-insensitive
    * overlap is exact by construction (inner join on the id pair).
    *
    * Scale shape: both sides are |queries|·k rows regardless of
    * corpus size — the join and aggregate are trivially cheap, and at
    * a million queries they shuffle on q_id like any per-query
    * metric. No corpus access at all.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame = {
    val e = exact.select(col("q_id"), col("vec_id"))
    val a = approx.select(col("q_id"), col("vec_id")).withColumn("hit", lit(1))
    e.join(a, Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
      .withColumn("recall", round(col("n_hit").cast("double") / col("n_exact"), 6))
  }

  /** Thresholds for [[maintain]]. Defaults are deliberately
    * conservative: debt is cheap until its broadcast overlay stops
    * being small, and compaction is a full segment rewrite.
    */
  case class MaintenancePolicy(
      maxDebtRows: Long = 100000L,
      maxDataFiles: Long = 512L,
      minRecall: Option[Double] = None,
      keepGenerations: Int = 1,
      // the ILM age rung: previously-live generations older than this
      // are pruned even within the keepGenerations count (None = count
      // bound only). Tenant-tier aging is the collection-side policy —
      // see [[Tenants.applyLifecycle]].
      maxGenerationAgeMs: Option[Long] = None,
      // list-size drift rung (vector kind): appends encode against
      // the frozen geometry, so a corpus that outgrows its nlist
      // drifts toward linear per-query scans even with perfect
      // centroids. A rotating retrain fires when the policy geometry
      // for the LIVE count reaches this factor of the persisted one.
      geometryDriftFactor: Double = 2.0,
      // banding drift rung (vector kind, report-only): the cycle
      // REPORTS when the measured centered pRand of today's corpus
      // wants at least this many more signature bits than the
      // persisted lsh_bits — under-width banding grows bucket
      // occupancy (candidate cost) with every appended batch, and the
      // remedy (postings-rewriting rebuild) is an operator-owned
      // cost/recall tradeoff, not an automatic action.
      lshBitsDriftSlack: Int = 2)

  /** What [[maintain]] did and why — one row per decision, loggable
    * as-is into an operations table.
    */
  case class MaintenanceReport(action: String, reason: String,
                               debtRows: Long, dataFiles: Long,
                               recall: Option[Double])

  /** The maintenance-cadence decision, closed-loop: read the index's
    * [[graft.sources.IndexStats]] debt/fragmentation numbers (and,
    * for a vector index with `minRecall` set, a sampled recall probe
    * against its own exact scan), then EXECUTE the remedy —
    *  - geometry drift (vector only, probed recall < `minRecall`):
    *    [[graft.operators.VectorIndex.retrain]], the rebuild-aside
    *    rotation — compaction cannot fix stale centroids/codebooks;
    *  - debt above `maxDebtRows`, or data fragmented past
    *    `maxDataFiles`: the kind's `compact`, folding tombstones and
    *    deltas into rewritten segments;
    *  - otherwise: no action.
    * This is the verb a scheduler calls per index per cycle — the
    * role ES's merge policy and Milvus's compaction scheduler play —
    * with the same single-maintenance-owner contract as compact and
    * rotate themselves (README table). The recall probe costs
    * |queries| × corpus scan and runs only when `minRecall` is set;
    * pass a SAMPLED query frame.
    */
  def maintain(spark: org.apache.spark.sql.SparkSession, kind: String, home: String,
               policy: MaintenancePolicy = MaintenancePolicy(),
               recallQueries: Option[DataFrame] = None): MaintenanceReport =
   // the WHOLE cycle runs under the index's writer lease: the inner
   // verbs (compact/retrain) ride this outer lease rather than
   // re-acquiring, and — decisively — the generation prune at the end
   // is fenced too. Unfenced, a second maintenance process could
   // delete the very generation directory a racing rebuild is
   // mid-write on (the exact failure mode WriterLease exists to
   // surface — it now raises ConcurrentWriterException instead).
   graft.sources.WriterLease.exclusive(spark, home) {
    import graft.operators.{Ann, Dedup, VectorIndex}
    val st = graft.sources.IndexStats.rollup(spark, Seq(kind -> home)).collect()
    val debtRows = st.map(r =>
      if (r.isNullAt(r.fieldIndex("debt_rows"))) 0L else r.getAs[Long]("debt_rows")).sum
    // a table is debt iff it reports debt_rows — the stats schema
    // already carries the distinction, so don't re-derive it from
    // table names (the text index's delta tables are debt too, and a
    // name list silently misclassifies them into the fragmentation
    // count)
    val dataFiles = st.filter(r => r.isNullAt(r.fieldIndex("debt_rows")))
      .map(_.getAs[Long]("files")).sum

    val recall: Option[Double] = (kind, policy.minRecall, recallQueries) match {
      case ("vector", Some(_), Some(q)) =>
        // PQ is the drift-sensitive family; exact = the index's own
        // full-cluster scan. nprobe must cover the PERSISTED
        // geometry's list count — under the adaptive policy that is
        // not the 16-list constant.
        val nlist = VectorIndex.readMeta(spark, home).centroids.size
        val exact = VectorIndex.searchIvf(spark, home, q, nprobe = nlist)
        val approx = VectorIndex.searchPq(spark, home, q)
        Some(recallAtK(exact, approx).agg(avg(col("recall"))).collect()(0).getDouble(0))
      case _ => None
    }

    // list-size drift (vector, rotating homes): compare the persisted
    // geometry against what [[graft.operators.Ann.nlistFor]] wants
    // for the LIVE primary count — appends freeze geometry, so a
    // corpus that grew past the policy's list-size target needs the
    // rotating retrain no amount of compaction provides.
    // one live count serves both drift rungs (geometry here, banding
    // below) — two corpus-sized count jobs per healthy poll was the
    // kind of observability tax row 335 exists to remove
    val liveVectors: Option[Long] =
      if (kind == "vector" && graft.sources.IndexAlias.installed(spark, home))
        Some(VectorIndex.liveCount(spark, home))
      else None
    val geometryDrift: Option[String] = liveVectors.flatMap { live =>
      val nlist = VectorIndex.readMeta(spark, home).centroids.size
      val want = Ann.nlistFor(live)
      if (want >= policy.geometryDriftFactor * nlist)
        Some(s"geometry drift: $nlist lists, policy wants $want for $live live vectors")
      else None
    }

    def compactFor(): Unit = kind match {
      case "vector"  => VectorIndex.compact(spark, home)
      case "text"    => TextIndex.compact(spark, home)
      case "dedup"   => Dedup.compactMinhashIndex(spark, home)
      case "cluster" => Dedup.compactClusterIndex(spark, home)
      case other     => sys.error(s"unknown index kind '$other'")
    }

    // the hygiene rungs — geometry drift, tombstone debt, file
    // fragmentation — are evaluated INDEPENDENTLY of the recall rung:
    // a suppressed recall remedy (the budget-bound case below) must
    // suppress only itself, never shadow the compaction a
    // debt-saturated index is owed this cycle.
    def hygiene(note: String = ""): MaintenanceReport =
      if (geometryDrift.isDefined) {
        VectorIndex.retrain(spark, home)
        MaintenanceReport("retrained", geometryDrift.get + note, debtRows, dataFiles, recall)
      } else if (debtRows >= policy.maxDebtRows) {
        compactFor()
        MaintenanceReport("compacted", s"debt $debtRows >= ${policy.maxDebtRows}$note",
          debtRows, dataFiles, recall)
      } else if (dataFiles >= policy.maxDataFiles) {
        compactFor()
        MaintenanceReport("compacted", s"files $dataFiles >= ${policy.maxDataFiles}$note",
          debtRows, dataFiles, recall)
      } else if (note.nonEmpty)
        MaintenanceReport("budget_bound", note.stripPrefix("; "), debtRows, dataFiles, recall)
      else {
        // report-only rung, measured only when no action fired: the
        // observability loop's last mile — route-relevant drift (the
        // measured pRand the stats surface already shows) pages the
        // operator with the evidence instead of silently degrading
        val bandingDrift: Option[String] = liveVectors.flatMap(live =>
          VectorIndex.bandingDrift(spark, home, policy.lshBitsDriftSlack,
            liveCount = live))
        bandingDrift match {
          case Some(why) =>
            MaintenanceReport("banding_drift", why, debtRows, dataFiles, recall)
          case None =>
            MaintenanceReport("none", "within policy", debtRows, dataFiles, recall)
        }
      }

    val report = (recall, policy.minRecall) match {
      // a recall miss on a BUDGET-BOUND layout (build-time pool
      // calibration hit the cost cap: the 8-byte PQ code budget, not
      // any serving knob, limited recall AT BUILD TIME) must not fire
      // the blind retrain — the fresh generation re-trains residual
      // codebooks against the same budget, recall stays under the
      // floor, and the next cycle re-encodes the full corpus again,
      // forever: the most expensive verb in the engine looping as
      // hygiene. But the flag is a measurement of the BUILD corpus,
      // not a permanent property: after appends the miss may be
      // drift-caused, so first re-run the bounded calibration against
      // today's corpus (no re-encode). If the refreshed (nprobe, pool)
      // clears the cap, serving is fixed for the price of one truth
      // scan; only when today's calibration is STILL capped does the
      // suppression hold — reported as the cycle's action only when
      // no hygiene rung fires this cycle. (Of the hygiene verbs, only
      // the drift RETRAIN lands a fresh generation that re-calibrates
      // the flag; debt/file compaction copies meta/ verbatim — it
      // rewrites postings under the existing calibration and never
      // re-derives it.)
      case (Some(r), Some(min)) if r < min &&
          VectorIndex.readMeta(spark, home).budgetBound =>
        val refreshed = VectorIndex.recalibrate(spark, home)
        if (!refreshed.budgetBound)
          MaintenanceReport("recalibrated",
            f"sampled recall $r%.3f < $min%.3f on a pq_budget_bound layout; " +
              f"calibration refreshed against the current corpus clears the cap " +
              f"(nprobe ${refreshed.defaultNProbe.getOrElse(-1)}, " +
              f"pool ${refreshed.defaultPool.getOrElse(-1)})",
            debtRows, dataFiles, recall)
        else
          hygiene(note = f"; sampled recall $r%.3f < $min%.3f suppressed: layout " +
            "re-measures pq_budget_bound on the current corpus — retrain cannot " +
            "raise a code-budget-limited recall")
      case (Some(r), Some(min)) if r < min =>
        VectorIndex.retrain(spark, home)
        MaintenanceReport("retrained", f"sampled recall $r%.3f < $min%.3f", debtRows, dataFiles, recall)
      case _ => hygiene()
    }
    // bound the generation footprint: compact (zero-downtime handoff)
    // and retrain each land a fresh generation, so a periodic loop
    // would otherwise accumulate one full corpus copy per cycle.
    // Pruning keeps the live generation plus `keepGenerations`
    // PREVIOUSLY-LIVE ones (pointer history) — readers that resolved
    // before the latest swap keep a complete layout for at least one
    // more maintenance cycle (the drain-grace contract). The prune is
    // inside the exclusive block above, so no other process's
    // in-flight generation write can race it.
    graft.sources.IndexAlias.pruneGenerations(spark, home,
      keep = policy.keepGenerations, maxAgeMs = policy.maxGenerationAgeMs)
    report
  }
}

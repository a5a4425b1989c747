package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev harness (guide §1): decompose one query's wall time into
  * analysis/planning vs per-job execution, with task counts — the
  * local stand-in for the Spark UI's Jobs page (UI is disabled in the
  * bench). Usage: runMain graft.JobProbe <sfDir> name1 [name2 ...]
  * Each query runs twice; the second (warm) run is the decomposed one.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.documents(spark, sfDir).count()

    case class Job(id: Int, start: Long, var end: Long = -1L,
                   var tasks: Int = 0, var stages: Int = 0,
                   var desc: String = "")
    val jobs = new scala.collection.concurrent.TrieMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(e.jobId, Job(e.jobId, e.time, desc = d.take(90)))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val sid = e.stageInfo.stageId
        jobs.values.foreach { j => j.stages += 0 } // no-op keep
        // attribute by the job that contains this stage: Spark does not
        // expose the mapping here directly; approximate by most recent
        // open job (single-threaded probe, jobs don't overlap)
        val open = jobs.values.filter(_.end < 0)
        val tgt = if (open.nonEmpty) Some(open.minBy(_.id)) else jobs.values.toSeq.sortBy(-_.id).headOption
        tgt.foreach { j => j.tasks += e.stageInfo.numTasks; j.stages += 1 }
      }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm run: session caches, JIT, index builds
      operators.IndexCache.releaseTransients(spark)
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tPlanned = System.nanoTime() // builds the DataFrame (analysis)
      val _ = df.queryExecution.executedPlan // forces optimization + physical planning
      val tPhys = System.nanoTime()
      val n = df.count()
      val tDone = System.nanoTime()
      spark.sparkContext.removeSparkListener(listener)
      operators.IndexCache.releaseTransients(spark)
      println(f"[jobprobe] $name rows=$n total=${(tDone - t0) / 1e9}%.3fs " +
        f"analyze=${(tPlanned - t0) / 1e9}%.3fs plan=${(tPhys - tPlanned) / 1e9}%.3fs " +
        f"exec=${(tDone - tPhys) / 1e9}%.3fs jobs=${jobs.size}")
      jobs.values.toSeq.sortBy(_.id).foreach { j =>
        val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
        println(f"[jobprobe]   job ${j.id}%3d ${dur}%8.3fs stages=${j.stages} tasks=${j.tasks} ${j.desc}")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool (perf rounds): run selected queries once through the noop
  * sink with a listener that prints one line per Spark JOB — wall
  * time, stage count, task count, shuffle read/write bytes. Iterative
  * operators surface as one job per eager checkpoint, so this splits a
  * query's total into edge-build / per-round / final-action parts —
  * the decomposition the bench's single per-query number can't give.
  * Usage: runMain graft.Profile <sfDir> <query substrings...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.drop(1).exists(n.startsWith))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var t0 = Map.empty[Int, Long]
    @volatile var stages = Map.empty[Int, (Long, Long, Long)] // tasks, sw, sr
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        t0 += j.jobId -> System.nanoTime()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val tm = s.stageInfo.taskMetrics
        if (tm != null) {
          val cur = stages.getOrElse(-1, (0L, 0L, 0L))
          stages += -1 -> (cur._1 + s.stageInfo.numTasks,
            cur._2 + tm.shuffleWriteMetrics.bytesWritten,
            cur._3 + tm.shuffleReadMetrics.totalBytesRead)
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val dt = (System.nanoTime() - t0.getOrElse(j.jobId, 0L)) / 1e6
        val (tk, sw, sr) = stages.getOrElse(-1, (0L, 0L, 0L))
        stages -= -1
        println(f"[job] id=${j.jobId}%3d wall=${dt}%8.1fms tasks=$tk%5d " +
          f"shufW=${sw / 1048576.0}%8.2fMB shufR=${sr / 1048576.0}%8.2fMB")
      }
    }
    // warm the scan + shuffle machinery once so job timings aren't
    // dominated by lazy init on the first query
    Tables.all.foreach(t =>
      Tables(spark, sfDir, t).write.format("noop").mode("overwrite").save())
    names.foreach { n =>
      println(s"\n===== $n =====")
      // one untimed warm pass (JIT + page cache), then the listened pass
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.sparkContext.addSparkListener(listener)
      val q0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - q0) / 1e9
      Thread.sleep(500) // let async listener events drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"[total] $n ${dt}%.2fs")
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev tool: run one registered query and print a per-Spark-job wall-time
  * breakdown (`runMain graft.Profile <sfDir> <query> [passes]`). The heavy
  * bench entries are multi-job pipelines (versioned writes, stats builds,
  * commits, reads); `Explain` shows only the final read's plan — this shows
  * which of the N jobs the seconds actually go to. */
object Profile {
  private case class JobRow(id: Int, var desc: String, start: Long, var end: Long = 0L,
                            var stages: Int = 0, var tasks: Int = 0,
                            var shuffleRead: Long = 0L, var shuffleWrite: Long = 0L,
                            var input: Long = 0L, var output: Long = 0L)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queryNames = args.lift(1).getOrElse("q_vdt1").split(",").toSeq
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = mutable.LinkedHashMap.empty[Int, JobRow]
    val stageToJob = mutable.Map.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties.getProperty("spark.job.description")).getOrElse("")
        jobs(e.jobId) = JobRow(e.jobId, desc, e.time)
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val si = e.stageInfo
        stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
          j.stages += 1; j.tasks += si.numTasks
          if (j.desc.length < 160) j.desc = (j.desc + " ; " + si.name.take(70)).take(200)
          val m = si.taskMetrics
          j.shuffleRead += m.shuffleReadMetrics.totalBytesRead
          j.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          j.input += m.inputMetrics.bytesRead
          j.output += m.outputMetrics.bytesWritten
        }
      }
    })
    queryNames.foreach { name =>
    val fn = Registry.byName(name).impl
    (1 to passes).foreach { p =>
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      println(f"\n===== $name pass $p: $total%.3f s =====")
      def mb(b: Long): String = if (b == 0) "-" else f"${b / 1e6}%.1fM"
      jobs.synchronized {
        jobs.values.toSeq.sortBy(-_.durMs).foreach { j =>
          println(f"  ${j.durMs / 1000.0}%7.3f s  job=${j.id}%-4d stages=${j.stages}%-3d tasks=${j.tasks}%-5d " +
            f"in=${mb(j.input)}%-8s out=${mb(j.output)}%-8s sr=${mb(j.shuffleRead)}%-8s sw=${mb(j.shuffleWrite)}%-8s ${j.desc.take(110)}")
        }
        val sum = jobs.values.map(_.durMs).sum / 1000.0
        println(f"  jobs total: $sum%.3f s of $total%.3f s wall (gap = driver/plan time)")
        // timeline: driver gap BEFORE each job (time since previous job's end)
        val ordered = jobs.values.toSeq.sortBy(_.start)
        var prevEnd = 0L
        ordered.foreach { j =>
          val gap = if (prevEnd == 0) 0.0 else (j.start - prevEnd) / 1000.0
          if (gap > 0.04) println(f"  gap ${gap}%6.3f s before job=${j.id} (${j.desc.take(90)})")
          prevEnd = math.max(prevEnd, j.end)
        }
      }
    }
    }
    spark.stop()
  }
  private implicit class RichJob(j: JobRow) {
    def durMs: Long = if (j.end > 0) j.end - j.start else 0L
  }
}

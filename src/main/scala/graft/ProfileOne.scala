package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Optimization-round profiling main: run one query through the noop
  * sink with a listener that prints per-job wall time, per-stage task
  * counts and total task time — the "where do the seconds go" view the
  * disabled UI would give (`runMain graft.ProfileOne <name> <sfDir> [iters]`).
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileOne <queryName> <sfDir> [iters]")
    val name = args(0); val sfDir = args(1)
    val iters = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_BYPASS_THRESHOLD", "1"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class Stage(var n: Int = 0, var taskMs: Long = 0L,
                     var maxTaskMs: Long = 0L, var name: String = "",
                     var deserMs: Long = 0L, var runMs: Long = 0L,
                     var gcMs: Long = 0L, var shufFetchMs: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, (Long, Long)]()
    val stages = mutable.LinkedHashMap[Int, Stage]()
    val jobStages = mutable.LinkedHashMap[Int, Seq[Int]]()
    var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (collecting) {
        jobs(e.jobId) = (e.time, -1L)
        jobStages(e.jobId) = e.stageIds
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (collecting)
        jobs.get(e.jobId).foreach(t => jobs(e.jobId) = (t._1, e.time))
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val s = stages.getOrElseUpdate(e.stageInfo.stageId, Stage())
          s.name = e.stageInfo.name.take(60)
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = if (collecting) {
        val s = stages.getOrElseUpdate(e.stageId, Stage())
        s.n += 1
        val ms = Option(e.taskInfo).map(t => t.finishTime - t.launchTime).getOrElse(0L)
        s.taskMs += ms
        s.maxTaskMs = math.max(s.maxTaskMs, ms)
        Option(e.taskMetrics).foreach { m =>
          s.deserMs += m.executorDeserializeTime
          s.runMs += m.executorRunTime
          s.gcMs += m.jvmGCTime
          s.shufFetchMs += m.shuffleReadMetrics.fetchWaitTime
        }
      }
    })
    spark.read.parquet(s"$sfDir/lineitem.parquet").write.format("noop").mode("overwrite").save()
    (1 to iters).foreach { i =>
      if (i == iters) { jobs.clear(); stages.clear(); jobStages.clear(); collecting = true }
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    collecting = false
    Thread.sleep(300)
    println(s"== jobs (${jobs.size}) for last iter of $name")
    jobs.foreach { case (id, (s0, s1)) =>
      val sts = jobStages.getOrElse(id, Nil)
      val detail = sts.sorted.flatMap(sid => stages.get(sid).map(st =>
        s"stage$sid[n=${st.n} task=${st.taskMs}ms max=${st.maxTaskMs}ms " +
          s"deser=${st.deserMs} run=${st.runMs} gc=${st.gcMs} fetch=${st.shufFetchMs} ${st.name}]"))
        .mkString(" ")
      println(f"job $id%3d wall=${if (s1 > 0) s1 - s0 else -1}%5d ms  $detail")
    }
    spark.stop()
  }
}

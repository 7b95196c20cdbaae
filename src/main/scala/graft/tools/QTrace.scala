package graft.tools

import scala.collection.concurrent.TrieMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Throwaway: per-job + per-stage durations for arbitrary queries.
  * Usage: runMain graft.tools.QTrace <sfDir> <runs> q1 q2 ...
  */
object QTrace {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.default()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val runs = args(1).toInt
    val starts = TrieMap[Int, Long]()
    val sb = new StringBuilder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = System.nanoTime()
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { t0 =>
          sb.append(f"  JOB ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms%n"): Unit
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val ms = (for { a <- si.completionTime; b <- si.submissionTime } yield a - b).getOrElse(-1L)
        sb.append(f"  STAGE ${si.stageId}%4d tasks=${si.numTasks}%4d $ms%6d ms  ${si.name.take(60)}%n"): Unit
      }
    })
    args.drop(2).foreach { q =>
      (1 to runs).foreach { i =>
        Thread.sleep(300); sb.clear()
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"QUERY $q run$i rows=$n t=$dt%.2f s")
        if (i == runs) print(sb.toString)
      }
    }
    spark.stop()
  }
}

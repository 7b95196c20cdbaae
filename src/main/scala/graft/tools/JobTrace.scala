package graft.tools

import scala.collection.concurrent.TrieMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Throwaway: per-job durations for one warm run of the ANN paths. */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.default()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val starts = TrieMap[Int, (Long, String)]()
    val sb = new StringBuilder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties.getProperty("spark.job.description")).getOrElse("")
        starts(js.jobId) = (System.nanoTime(), desc)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, desc) =>
          sb.append(f"JOB ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms  $desc%n"): Unit
        }
    })
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val n = e.count()
    val bits = Similarity.autoQuantBits(n, 64)
    val rerank = Similarity.autoAdcRerank(n)
    val nProbe = Similarity.probeBudget(bits, 438)
    val q = e.filter(col("vec_id") % 50 === 0)
    val path = "/tmp/jobtrace_ivfadc"
    // warm everything once
    Similarity.buildIvfAdcIndex(e, path, dim = 64, bits = bits, m = 8)
    Similarity.queryIvfAdcIndex(spark, path, q, e, k = 5, dim = 64, bits = bits,
      nProbe = nProbe, m = 8, rerank = rerank).count()
    Similarity.ivfAdcTopK(q, e, k = 5, dim = 64, bits = bits,
      nProbe = nProbe, m = 8, rerank = rerank).count()
    Thread.sleep(500); sb.clear()
    spark.sparkContext.setJobDescription("BUILD")
    val tb = System.nanoTime()
    Similarity.buildIvfAdcIndex(e, path, dim = 64, bits = bits, m = 8)
    println(f"TOTAL build ${(System.nanoTime() - tb) / 1e9}%.2f s")
    spark.sparkContext.setJobDescription("SERVE")
    val ts = System.nanoTime()
    Similarity.queryIvfAdcIndex(spark, path, q, e, k = 5, dim = 64, bits = bits,
      nProbe = nProbe, m = 8, rerank = rerank).count()
    println(f"TOTAL serve ${(System.nanoTime() - ts) / 1e9}%.2f s")
    spark.sparkContext.setJobDescription("INFLIGHT")
    val ti = System.nanoTime()
    Similarity.ivfAdcTopK(q, e, k = 5, dim = 64, bits = bits,
      nProbe = nProbe, m = 8, rerank = rerank).count()
    println(f"TOTAL inflight ${(System.nanoTime() - ti) / 1e9}%.2f s")
    Thread.sleep(500)
    print(sb.toString)
    spark.stop()
  }
}

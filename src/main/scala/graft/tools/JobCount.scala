package graft.tools

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Throwaway instrumentation: count Spark jobs + stages per labeled
  * phase of the hot bench queries, to attribute sf0.1 fixed overhead.
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.default()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(sc.stageInfo.numTasks)
      }
    })
    def phase(label: String)(f: => Any): Unit = {
      Thread.sleep(200) // let listener drain
      val j0 = jobs.get(); val s0 = stages.get(); val t0 = tasks.get()
      val n0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - n0) / 1e9
      Thread.sleep(300)
      println(f"PHASE $label%-28s t=$dt%6.2f s jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d tasks=${tasks.get - t0}%5d result=$r")
    }
    val e = graft.sources.Tables.load(spark, dir, "embeddings")

    phase("range1.count")(spark.range(1).count())
    phase("range1.count#2")(spark.range(1).count())
    phase("emb.count")(e.count())
    phase("emb.count#2")(e.count())
    phase("q02.count")(graft.SparkEntry.queries("q02_filter_project")(spark, dir).count())
    phase("q02.count#2")(graft.SparkEntry.queries("q02_filter_project")(spark, dir).count())
    phase("q01.count")(graft.SparkEntry.queries("q01_pricing_summary")(spark, dir).count())
    phase("q01.count#2")(graft.SparkEntry.queries("q01_pricing_summary")(spark, dir).count())

    val n = e.count()
    val bits = Similarity.autoQuantBits(n, 64)
    val rerank = Similarity.autoAdcRerank(n)
    val nProbe = Similarity.probeBudget(bits, 438)
    val q = e.filter(col("vec_id") % 50 === 0)
    val path = "/tmp/jobcount_ivfadc"

    phase("ivfadc.build")(Similarity.buildIvfAdcIndex(e, path, dim = 64, bits = bits, m = 8))
    phase("ivfadc.build#2")(Similarity.buildIvfAdcIndex(e, path, dim = 64, bits = bits, m = 8))
    phase("ivfadc.serve")(Similarity.queryIvfAdcIndex(spark, path, q, e,
      k = 5, dim = 64, bits = bits, nProbe = nProbe, m = 8, rerank = rerank).count())
    phase("ivfadc.serve#2")(Similarity.queryIvfAdcIndex(spark, path, q, e,
      k = 5, dim = 64, bits = bits, nProbe = nProbe, m = 8, rerank = rerank).count())
    phase("ivfadc.inflight")(Similarity.ivfAdcTopK(q, e,
      k = 5, dim = 64, bits = bits, nProbe = nProbe, m = 8, rerank = rerank).count())
    phase("ivfadc.inflight#2")(Similarity.ivfAdcTopK(q, e,
      k = 5, dim = 64, bits = bits, nProbe = nProbe, m = 8, rerank = rerank).count())

    phase("q193.count")(graft.SparkEntry.queries("q193_docs_repeated_spans")(spark, dir).count())
    phase("q193.count#2")(graft.SparkEntry.queries("q193_docs_repeated_spans")(spark, dir).count())
    phase("q58.count")(graft.SparkEntry.queries("q58_docs_neardup_resolve")(spark, dir).count())
    phase("q58.count#2")(graft.SparkEntry.queries("q58_docs_neardup_resolve")(spark, dir).count())
    phase("q134.count")(graft.SparkEntry.queries("q134_emb_ann_ivf_append")(spark, dir).count())
    phase("q134.count#2")(graft.SparkEntry.queries("q134_emb_ann_ivf_append")(spark, dir).count())
    phase("q180.count")(graft.SparkEntry.queries("q180_ann_ivfadc_servability")(spark, dir).count())
    phase("q180.count#2")(graft.SparkEntry.queries("q180_ann_ivfadc_servability")(spark, dir).count())
    phase("q68.count")(graft.SparkEntry.queries("q68_docs_incremental_dedup")(spark, dir).count())
    phase("q68.count#2")(graft.SparkEntry.queries("q68_docs_incremental_dedup")(spark, dir).count())
    spark.stop()
  }
}

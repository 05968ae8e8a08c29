package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Robust
import graft.sources.Tables

/** Ad-hoc stage timing for the Spearman rank path (dev tool). */
object ProbeSpearman {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobLog = new scala.collection.mutable.ArrayBuffer[(Int, Long, Int)]
    val starts = new scala.collection.mutable.HashMap[Int, (Long, Int)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.synchronized { starts(js.jobId) = (System.nanoTime(), js.stageInfos.map(_.numTasks).sum) }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.synchronized { starts.get(je.jobId).foreach { case (t0, nt) =>
          jobLog.synchronized { jobLog += ((je.jobId, System.nanoTime() - t0, nt)) } } }
    })

    def t(name: String)(f: => Long): Unit = {
      jobLog.synchronized(jobLog.clear())
      val t0 = System.nanoTime()
      val n = f
      val tot = (System.nanoTime() - t0) / 1e9
      val jobs = jobLog.synchronized(jobLog.toList)
      val js = jobs.map { case (id, dt, nt) => f"j$id:${dt / 1e9}%.2f(${nt}t)" }.mkString(" ")
      println(f"[probe] $name%-22s $tot%8.2fs  rows=$n  jobs=${jobs.size} $js")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    val li = Tables.lineitem(spark, dir)
    t("warmup")(li.count())
    for (pass <- 1 to 3) {
      t(s"p$pass spearmanRho")(
        Robust.spearmanRho(li, col("l_quantity"), col("l_extendedprice")).count())
      t(s"p$pass spearmanRhoBy")(
        Robust.spearmanRhoBy(li, col("l_quantity"), col("l_extendedprice"), "l_returnflag").count())
    }
    spark.stop()
  }
}

package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Where does a streaming query's wall-clock actually go? Attaches a
  * [[StreamingQueryListener]] and replays named contract queries, then
  * prints each micro-batch's `durationMs` breakdown (triggerExecution =
  * total; queryPlanning / getBatch / addBatch / walCommit /
  * commitOffsets = the fixed-cost suspects) plus state-operator totals.
  * The streaming family is ~25% of the bench suite at sf0.1, and the
  * data per batch is trivial — this probe separates "the operator's own
  * work" from "micro-batch machinery" so optimization aims at the right
  * layer (guide §1: measure first).
  *
  * Usage: sbt "runMain graft.tools.ProbeStreamCost q_kmeans_share_stream ..."
  */
object ProbeStreamCost {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.Scratch.tmpfs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // PROBE_CONF="k=v;k=v" — session-conf overrides for A/B experiments
    // (e.g. codegen off to separate Janino cost from execution cost)
    sys.env.get("PROBE_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })

    final case class B(query: String, batch: Long, d: Map[String, Long],
      stateMs: Long, rows: Long)
    val events = ArrayBuffer.empty[B]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val d = p.durationMs.asScala.map { case (k, v) => k -> v.toLong }.toMap
        val st = p.stateOperators.map(s =>
          s.commitTimeMs).sum
        events.synchronized {
          events += B(p.name, p.batchId, d, st, p.numInputRows)
        }
      }
    }
    spark.streams.addListener(listener)

    // per-JOB decomposition (PROBE_JOBS=1): where inside addBatch the time
    // goes — each micro-batch's jobs carry "batch = N" in the description
    final case class J(jobId: Int, ms: Long, tasks: Int, desc: String)
    val jobs = ArrayBuffer.empty[J]
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    if (sys.env.get("PROBE_JOBS").contains("1"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("") + " | " +
            e.stageInfos.flatMap(_.rddInfos.map(_.callSite))
              .distinct.mkString("; ")
          starts.put(e.jobId,
            (e.time, d, e.stageInfos.map(_.numTasks).sum))
        }
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(e.jobId)).foreach { case (t0, d, nt) =>
            jobs.synchronized { jobs += J(e.jobId, e.time - t0, nt, d.take(110)) }
          }
        }
      })

    val nRuns = sys.env.getOrElse("PROBE_RUNS", "2").toInt
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to nRuns).foreach { run =>
        events.synchronized(events.clear())
        jobs.synchronized(jobs.clear())
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        // listener events are delivered async; give the bus a moment
        Thread.sleep(300)
        println(f"%n=== $name run $run: wall $wall%.2f s, $n rows ===")
        val evs = events.synchronized(events.toVector)
          .sortBy(b => (Option(b.query).getOrElse(""), b.batch))
        val keys = Seq("triggerExecution", "queryPlanning", "getBatch",
          "latestOffset", "addBatch", "walCommit", "commitOffsets")
        evs.foreach { b =>
          val cols = keys.map(k => f"$k=${b.d.getOrElse(k, -1L)}%4d").mkString(" ")
          println(f"  [${b.query}%-38s b${b.batch}] $cols stateCommit=${b.stateMs} rows=${b.rows}")
        }
        val trig = evs.map(_.d.getOrElse("triggerExecution", 0L)).sum
        println(f"  batches=${evs.size} sum(triggerExecution)=${trig} ms of $wall%.2f s wall")
        val js = jobs.synchronized(jobs.toVector)
        if (js.nonEmpty) {
          js.sortBy(_.jobId).foreach(j =>
            println(f"    job ${j.jobId}%4d ${j.ms}%5d ms ${j.tasks}%4d tasks  ${j.desc}"))
          println(f"    sum(jobs)=${js.map(_.ms).sum} ms over ${js.size} jobs")
        }
      }
    }
    spark.stop()
  }
}

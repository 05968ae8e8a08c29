package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named contract queries to files —
  * the optimization-round evidence trail (plans/r16/<q>_{before,after}.txt).
  *
  * Usage: PROBE_OUT=plans/r16 PROBE_SUFFIX=before \
  *          sbt "runMain graft.tools.ProbePlans q_a q_b ..."
  * The session mirrors Bench's config (shuffle width, AQE, extensions) so
  * the captured plan is the one the bench actually runs. Plans are the
  * PRE-execution form (AdaptiveSparkPlan isFinalPlan=false) plus, when
  * PROBE_RUN=1, the post-run executed plan appended — the executed form
  * shows AQE's final shape (coalesced reads, runtime join switches). */
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = sys.env.getOrElse("PROBE_OUT", "plans/r16")
    val suffix = sys.env.getOrElse("PROBE_SUFFIX", "before")
    val run = sys.env.get("PROBE_RUN").contains("1")
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
    Files.createDirectories(Paths.get(out))
    val suite = SparkEntryAccess.benchSuite
    args.foreach { name =>
      suite.get(name) match {
        case None => System.err.println(s"[plans] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, dir)
            val sb = new StringBuilder
            sb.append(s"=== $name ($suffix, sf=$dir) ===\n")
            sb.append(df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
            if (run) {
              df.count()
              sb.append("\n=== executed (AQE final) ===\n")
              sb.append(df.queryExecution.executedPlan.toString)
            }
            Files.writeString(Paths.get(out, s"${name}_$suffix.txt"),
              sb.toString)
            println(s"[plans] wrote $out/${name}_$suffix.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}

/** Bench-path suite resolution shared with [[ProbePlans]]: operator-only
  * overrides replace the contract twins exactly as Bench does, so plan
  * captures describe what the bench times. */
object SparkEntryAccess {
  def benchSuite: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    graft.SparkEntry.queries ++ graft.SparkEntry.benchOverrides
}

package graft

/** Best-effort scratch-dir tuning for the local harness mains: point the
  * JVM temp dir (where Structured Streaming puts memory-sink temporary
  * checkpoints — offset/commit logs and state stores, all fsync-heavy) and
  * Spark's local dirs (shuffle scratch) at tmpfs when the host has one.
  * Streaming micro-batch fixed cost is dominated by checkpoint fsyncs at
  * trivial data scale, so this buys real suite time without touching query
  * semantics. No-op (None) when /dev/shm is absent — e.g. a real cluster,
  * where executors configure spark.local.dir themselves. */
object Scratch {
  def tmpfs(): Option[String] = {
    val base = new java.io.File("/dev/shm")
    if (base.isDirectory && base.canWrite) {
      val d = new java.io.File(base, "graft-scratch")
      d.mkdirs()
      System.setProperty("java.io.tmpdir", d.getAbsolutePath)
      Some(d.getAbsolutePath)
    } else None
  }
}

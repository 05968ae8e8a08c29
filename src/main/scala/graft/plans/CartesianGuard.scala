package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** 100 TB guardrail: reject unhinted cartesian products between two LARGE
  * relations at analysis time, before any job is launched.
  *
  * At cluster scale an accidental `join` without keys (or a typo'd
  * condition that degenerates to `true`) is the single most expensive class
  * of user error — |L|×|R| rows materialize before anything downstream can
  * filter. Legitimate cartesians (dim × domain scaffolds, bounded
  * query-set × corpus ANN) are small on at least one side, which is exactly
  * the check: both sides' estimated sizes must exceed `maxBytes` for the
  * query to be rejected.
  *
  * Opt-in via `spark.graft.cartesianGuard.maxBytes` (bytes; absent/empty =
  * guard off) so the library never changes engine semantics by default.
  * Registered through [[graft.functions.GraftExtensions]] as a check rule —
  * the extension-point ladder's analysis-phase hook.
  */
object CartesianGuard {

  val ConfKey = "spark.graft.cartesianGuard.maxBytes"

  def check(session: SparkSession)(plan: LogicalPlan): Unit = {
    val limit = session.conf.getOption(ConfKey).filter(_.nonEmpty).map(_.toLong)
    limit.foreach { maxBytes =>
      plan.foreach {
        case j @ Join(left, right, Cross | Inner, None, _) =>
          val l = left.stats.sizeInBytes
          val r = right.stats.sizeInBytes
          if (l > maxBytes && r > maxBytes) {
            throw new IllegalStateException(
              s"cartesian product of two large relations (est. $l x $r bytes, " +
                s"guard $maxBytes): add a join condition, reduce a side below the " +
                s"threshold, or unset $ConfKey. Plan:\n$j")
          }
        case _ => ()
      }
    }
  }
}

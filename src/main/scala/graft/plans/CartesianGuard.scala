package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, ResolvedHint}

/** 100 TB guardrail: reject joins that would nested-loop two LARGE
  * relations, at analysis time, before any job is launched.
  *
  * At cluster scale an accidental cartesian (a `join` without keys, a
  * typo'd condition that degenerates to `true`, or a pure range condition
  * like `a.id < b.id` that the planner can only execute as
  * BroadcastNestedLoopJoin / CartesianProduct) is the single most
  * expensive class of user error — |L|×|R| pairs are enumerated before
  * anything downstream can filter. So the check is on the PLANNER's terms,
  * not the syntax: an Inner/Cross join whose condition contains no usable
  * equi-key conjunct (the same shape `ExtractEquiJoinKeys` looks for —
  * a top-level `=`/`<=>` comparing one side to the other) is a nested-loop
  * join no matter how selective its filter is.
  *
  * Legitimate nested-loop joins declare their bounded side with a
  * [[org.apache.spark.sql.functions.broadcast]] hint (dim × domain
  * scaffolds, bounded query-set × corpus ANN) — a hinted side is exempt,
  * which doubles as the library's convention: if you mean |Q|·|C| with a
  * small |Q|, SAY so, and the plan you get is the plan you meant. For the
  * rest, both sides' estimated sizes must exceed `maxBytes` for the query
  * to be rejected (without CBO, `Filter` keeps its child's size estimate,
  * so genuinely-small filtered sides either carry a hint or stay under the
  * threshold via their source relation).
  *
  * Opt-in via `spark.graft.cartesianGuard.maxBytes` (bytes; absent/empty =
  * guard off) so the library never changes engine semantics by default.
  * Registered through [[graft.functions.GraftExtensions]] as a check rule —
  * the extension-point ladder's analysis-phase hook. [[graft.Verify]] and
  * [[graft.Bench]] enable it suite-wide (allowlisting only the
  * verification-SF self-assert twins), making "no quadratic reachable from
  * the harness" a structural property instead of a reviewed one.
  */
object CartesianGuard {

  val ConfKey = "spark.graft.cartesianGuard.maxBytes"

  /** Top-level conjuncts of a join condition — an equality under an OR is
    * NOT a usable join key (`ExtractEquiJoinKeys` splits conjunctions the
    * same way). */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** Does some conjunct equate an expression over one side's columns with
    * an expression over the other side's? That is exactly what lets the
    * planner pick a hash/sort-merge join instead of a nested loop. */
  private def hasEquiKey(j: Join): Boolean = j.condition.exists { cond =>
    conjuncts(cond).exists {
      case cmp @ (_: EqualTo | _: EqualNullSafe) =>
        val (l, r) = cmp.children match { case Seq(a, b) => (a, b) }
        l.references.nonEmpty && r.references.nonEmpty &&
          ((l.references.subsetOf(j.left.outputSet) &&
            r.references.subsetOf(j.right.outputSet)) ||
           (l.references.subsetOf(j.right.outputSet) &&
            r.references.subsetOf(j.left.outputSet)))
      case _ => false
    }
  }

  /** A broadcast hint anywhere below declares the side bounded. */
  private def broadcastHinted(side: LogicalPlan): Boolean =
    side.exists {
      case h: ResolvedHint =>
        h.hints.strategy.contains(org.apache.spark.sql.catalyst.plans.logical.BROADCAST)
      case _               => false
    }

  def check(session: SparkSession)(plan: LogicalPlan): Unit = {
    val limit = session.conf.getOption(ConfKey).filter(_.nonEmpty).map(_.toLong)
    limit.foreach { maxBytes =>
      plan.foreach {
        // `Dataset.join(right, usingColumns)` first analyzes a PHANTOM
        // condition-less INNER Join of the two sides (only to resolve
        // column ambiguity — it never executes), which reaches check rules
        // as a bare root Join. Exempt that shape narrowly: a using-columns
        // join by definition has its key name on BOTH sides, so the
        // exemption also requires a shared output name. Residual gap: a
        // condition-less inner join of two name-overlapping relations
        // executed DIRECTLY by an action that adds no operator (collect/
        // show) is indistinguishable from the phantom at analysis time and
        // bypasses the guard; any aggregate, projection, or filter above
        // it (every query in this library) is caught normally.
        // name match is case-INSENSITIVE, like Spark's default using-column
        // resolution — a case-sensitive compare would reject a legitimate
        // df1.join(df2, "key") whose sides spell the key differently
        case j @ Join(left, right, Inner, None, _)
            if (j eq plan) &&
              left.output.map(_.name.toLowerCase).toSet
                .intersect(right.output.map(_.name.toLowerCase).toSet).nonEmpty => ()
        case j @ Join(left, right, Cross | Inner, _, _) if !hasEquiKey(j) &&
            !broadcastHinted(left) && !broadcastHinted(right) =>
          val l = left.stats.sizeInBytes
          val r = right.stats.sizeInBytes
          if (l > maxBytes && r > maxBytes) {
            throw new IllegalStateException(
              s"nested-loop join of two large relations (no equi-key conjunct, " +
                s"est. $l x $r bytes, guard $maxBytes): add an equality join " +
                s"condition, broadcast()-hint the bounded side, or unset " +
                s"$ConfKey. Plan:\n$j")
          }
        case _ => ()
      }
    }
  }
}

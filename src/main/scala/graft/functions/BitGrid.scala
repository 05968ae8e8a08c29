package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Order-preserving bit-grid bucket id for a double: the radix-sort bit
  * twiddle (`bits ^ ((bits >> 63) & 0x7fff…)`) maps any non-NaN double to a
  * signed long whose `<` order equals the double's `<` order, and an
  * arithmetic right shift by `shift` coarsens that key into a bucket grid
  * whose id order STILL equals value order — `v1 < v2 ⟹ bucket(v1) ≤
  * bucket(v2)`, and rows in a lower bucket are strictly below every row of
  * a higher one.
  *
  * Unlike a `(v − lo) / width` histogram this needs NO per-group bounds
  * pass (the grid is fixed by the float format: with `shift = 46` each
  * octave splits into 64 buckets — sign + 11 exponent + 6 mantissa bits
  * survive), which is what lets [[graft.operators.Robust.robustStats]] run
  * its summary as the FIRST and only full scan. Resolution is relative
  * (64 buckets per power of two) rather than absolute — the natural grid
  * for positive measures spanning several octaves.
  *
  * Determinism: a pure function of the double's bit pattern — identical
  * on every recomputation, every engine, every partitioning (NaN-free
  * input assumed; callers filter nulls first). `-0.0` and `0.0` land in
  * adjacent buckets — bucket ids only ever STEER rows, so equal values in
  * two buckets cost a slightly wider slice, never a wrong answer.
  */
case class DoubleBitsBucket(child: Expression, shift: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "double_bits_bucket"

  override def nullSafeEval(input: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    (b ^ ((b >> 63) & 0x7fffffffffffffffL)) >> shift
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bits")
      s"""
         |long $b = Double.doubleToLongBits($c);
         |${ev.value} = ($b ^ (($b >> 63) & 0x7fffffffffffffffL)) >> $shift;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DoubleBitsBucket =
    copy(child = newChild)
}

object BitGrid {
  /** 64 buckets per octave — slice ≈ n/64 per occupied octave at worst. */
  val DefaultShift = 46

  /** Column entry point; callers guarantee a non-NaN DOUBLE input. */
  def bitBucket(c: Column, shift: Int = DefaultShift): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(DoubleBitsBucket(ColumnBridge.expression(c), shift))
  }
}

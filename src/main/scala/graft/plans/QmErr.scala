package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-row weighted logistic error for the quality-model GD loop:
  *
  *   z   = Σ_i x_i·w_i + FP·w_F          (bias enters as x=FP)
  *   p   = clamp(W/2 + (z DIV FP) DIV 4, 0, W)   (hard sigmoid)
  *   err = (y·W − p) · (y = 1 ? cw : 1)
  *
  * — arithmetic IDENTICAL to the SQL string it replaces
  * (PretrainOps.qmStep r19 form: every DIV is truncation toward zero,
  * which is Java `/` on longs; the two-step (z DIV FP) DIV 4 is kept
  * as two divisions, not fused — they differ on negative z).
  *
  * Exists for CODEGEN STABILITY, not expressiveness (the r20
  * optimization round's finding): the SQL-string form inlined the 17
  * evolving weights as primitive literals, so every one of the 40 GD
  * steps produced textually NEW generated code and a fresh Janino
  * compile — the loop was recompile-bound at bench scale (~160 ms per
  * step over ~600 KB of data). Here the weights arrive as ONE literal
  * array<long> unpacked at construction into a long[] reference
  * object ([[KmArgmin]]'s pattern): the generated source references
  * `references[i]` and is byte-identical across steps, so the codegen
  * cache serves every step after the first. W/FP/cw are loop-INVARIANT
  * and may inline as constants without breaking that.
  */
case class QmErr(xs: Seq[Expression], y: Expression,
                 w: Array[Long], wW: Long, cw: Long, fp: Long)
  extends Expression {

  override def children: Seq[Expression] = xs :+ y

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType) && w.length == xs.length + 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_qm_err expects ${xs.length} long features + long label and " +
        s"${xs.length + 1} weights, got " +
        children.map(_.dataType.simpleString).mkString(",") +
        s" with ${w.length} weights")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = {
    var z = fp * w(xs.length)
    var i = 0
    while (i < xs.length) {
      val v = xs(i).eval(input)
      if (v == null) return null
      z += v.asInstanceOf[Long] * w(i)
      i += 1
    }
    val yv = y.eval(input)
    if (yv == null) return null
    QmErr.err(z, yv.asInstanceOf[Long], w, wW, cw, fp)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("qmW", w, "long[]")
    val evals = children.map(_.genCode(ctx))
    val z = ctx.freshName("z")
    val gather = evals.init.zipWithIndex.map { case (e, i) =>
      s"$z += ${e.value} * $wRef[$i];"
    }.mkString("\n")
    val yv = evals.last.value
    val nullCheck =
      if (nullable)
        evals.map(e => e.isNull.toString).filter(_ != "false").mkString(" || ")
      else ""
    val body =
      s"""
         |long $z = ${fp}L * $wRef[${xs.length}];
         |$gather
         |long ${ev.value}_p = ${wW / 2}L + (($z / ${fp}L) / 4L);
         |if (${ev.value}_p < 0L) ${ev.value}_p = 0L;
         |else if (${ev.value}_p > ${wW}L) ${ev.value}_p = ${wW}L;
         |${ev.value} = ($yv * ${wW}L - ${ev.value}_p)
         |  * ($yv == 1L ? ${cw}L : 1L);
       """.stripMargin
    if (nullable && nullCheck.nonEmpty) {
      ev.copy(code = code"""
        ${evals.map(_.code).reduce(_ + _)}
        boolean ${ev.isNull} = $nullCheck;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          $body
        }""")
    } else {
      ev.copy(code = code"""
        ${evals.map(_.code).reduce(_ + _)}
        long ${ev.value} = 0L;
        {
          $body
        }""", isNull = FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QmErr =
    copy(xs = newChildren.init, y = newChildren.last)
}

object QmErr {

  /** The scalar tail shared by eval and (inlined) codegen. */
  def err(z: Long, y: Long, w: Array[Long], wW: Long, cw: Long, fp: Long): Long = {
    var p = wW / 2 + ((z / fp) / 4)
    if (p < 0L) p = 0L else if (p > wW) p = wW
    (y * wW - p) * (if (y == 1L) cw else 1L)
  }

  /** Register `graft_qm_err(x0..x{F-1}, y, weights_literal, W_lit,
    * cw_lit, fp_lit)`. Idempotent. The last four arguments must be
    * literals (the driver owns the weights between GD steps). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_qm_err",
      (children: Seq[Expression]) => {
        require(children.length >= 5,
          "graft_qm_err(x..., y, weights, W, cw, fp)")
        val Seq(wLit, wwLit, cwLit, fpLit) = children.takeRight(4)
        val w = wLit match {
          case Literal(v: ArrayData, ArrayType(LongType, _)) => v.toLongArray()
          case other => throw new IllegalArgumentException(
            s"graft_qm_err: weights must be a literal array<long>, got $other")
        }
        def longLit(e: Expression, name: String): Long = e match {
          case Literal(v: Long, LongType) => v
          case other => throw new IllegalArgumentException(
            s"graft_qm_err: $name must be a literal long, got $other")
        }
        val inputs = children.dropRight(4)
        QmErr(inputs.init, inputs.last, w,
          longLit(wwLit, "W"), longLit(cwLit, "cw"), longLit(fpLit, "fp"))
      },
      "built-in")
}

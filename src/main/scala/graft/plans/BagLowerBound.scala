package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cheap LOSSLESS lower bound on Levenshtein distance, used to screen
  * candidate pairs before the O(len·k) banded DP (text_fuzzy_pairs'
  * per-pair cost): every edit operation changes a string's character
  * multiset by at most 2 L1 units (substitution: −1 one symbol, +1
  * another) and its length by at most 1, so
  *
  *   lev(a, b) ≥ max(|len(a) − len(b)|, ⌈L1(bag(a), bag(b)) / 2⌉).
  *
  * Bags are bucketed into 32 byte-hash buckets — merging symbols only
  * LOWERS the L1, so the bound stays valid (weaker), and the per-pair
  * cost is len(a)+len(b) bucket increments + 32 diffs (~150 ops vs
  * ~2600 banded-DP cells at the 60-char/k=21 config). A pair whose
  * bound exceeds the threshold can be dropped WITHOUT running the DP —
  * never a pair that qualifies (spec: property-checked against
  * levenshtein on generated strings; the screened fuzzy pipeline is
  * row-identical to the unscreened one, and the oracle never changes).
  *
  * Measured (sf3, same JVM): pass rate 63% on the shared-vocabulary
  * corpus → text_fuzzy_pairs 153 → 128 s. A q=2 Ukkonen gram bound
  * (⌈L1(bigram bags)/4⌉) was measured and REJECTED: the /2q divisor
  * outweighs the grams' extra discrimination on this corpus (72% pass
  * — strictly worse). The residual cost is the ~16% of candidates
  * that genuinely sit near the threshold; their banded DP is the
  * honest price of the degenerate corpus (BENCH_SF10_SWEEP_R15 note).
  */
case class BagLowerBound(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_bag_lb expects (string, string), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_bag_lb"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BagLowerBound.bound(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |${ev.value} = graft.plans.BagLowerBound.bound($a.getBytes(), $b.getBytes());
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BagLowerBound =
    copy(left = newLeft, right = newRight)
}

object BagLowerBound {

  /** max(|Δlen|, ceil(L1(bag32(a), bag32(b)) / 2)) — see the class
    * scaladoc for why this never exceeds the edit distance. */
  def bound(a: Array[Byte], b: Array[Byte]): Int = {
    val h = new Array[Int](32)
    var i = 0
    while (i < a.length) { h(a(i) & 31) += 1; i += 1 }
    i = 0
    while (i < b.length) { h(b(i) & 31) -= 1; i += 1 }
    var l1 = 0
    i = 0
    while (i < 32) { l1 += math.abs(h(i)); i += 1 }
    val dlen = math.abs(a.length - b.length)
    math.max(dlen, (l1 + 1) / 2)
  }

  /** Register `graft_bag_lb(a, b)`. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bag_lb",
      (children: Seq[Expression]) => BagLowerBound(children(0), children(1)),
      "built-in")
}

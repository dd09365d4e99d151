package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Serialized-once / deserialized-per-JVM carrier for a Bloom filter
  * embedded in a plan. The expression must ship to executors inside
  * the serialized task binary, so it carries the compact serialized
  * bytes (BloomFilter.writeTo form) and rebuilds the filter lazily on
  * first use in each JVM — never re-serializing the live object.
  */
final class BloomHolder(val bytes: Array[Byte]) extends Serializable {
  @transient lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
}

object BloomHolder {
  def apply(bf: BloomFilter): BloomHolder = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    new BloomHolder(bos.toByteArray)
  }
}

/** `BloomMightContain(holder, key)` → boolean: membership probe of a
  * pre-built Bloom filter over a string key, codegen'd so the probe
  * stays inside the scan's WholeStageCodegen span (a filter this cheap
  * must not break the pipeline into an interpreted island).
  *
  * Contract: NO false negatives — every key inserted at build time
  * probes true — so a bloom-negative row is PROVABLY absent from the
  * build side and can be dropped before any shuffle. False positives
  * (rate set at build) merely survive to the exact verification join;
  * they cost candidate-join traffic, never correctness. This is the
  * classic big-data membership screen: the filter is megabytes where
  * the build side is terabytes, so the probe side prunes at scan
  * speed without shuffling either table.
  */
case class BloomMightContain(child: Expression, holder: BloomHolder)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects a string key, got ${t.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    holder.bf.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", holder, classOf[BloomHolder].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.bf().mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

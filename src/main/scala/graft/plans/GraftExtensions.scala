package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: a cluster deployment enables the
  * engine's native functions with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` — the
  * documented injection path, so every session (including SQL-only
  * clients over Thrift/Connect) sees `graft_cosine` without any
  * driver-side registration call.
  *
  * `CosineSimilarity.register` remains for already-running sessions
  * (the Verify/Bench mains use it).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectPlannerStrategy(session => AsofJoinStrategy(session))
  }
}

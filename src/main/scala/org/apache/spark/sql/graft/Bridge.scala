package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, ExpressionUtils, SparkSession => ClassicSession}

/** Minimal accessor for the `private[sql]` classic.Dataset.ofRows — the
  * supported way for a library to turn a hand-built LogicalPlan (our
  * custom operators) back into a DataFrame — plus the Column↔Expression
  * converters (classic.ExpressionUtils) needed to embed a hand-built
  * Catalyst expression carrying a runtime object (e.g. a Bloom filter)
  * that no functionRegistry constructor could produce. Lives in the
  * org.apache.spark.sql namespace solely for access; no Spark
  * internals are modified. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  def columnOf(e: Expression): Column = ExpressionUtils.column(e)

  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
}

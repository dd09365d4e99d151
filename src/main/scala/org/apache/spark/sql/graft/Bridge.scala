package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}

/** Minimal accessor for the `private[sql]` classic.Dataset.ofRows — the
  * supported way for a library to turn a hand-built LogicalPlan (our
  * custom operators) back into a DataFrame. Lives in the
  * org.apache.spark.sql namespace solely for access; no Spark
  * internals are modified. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}

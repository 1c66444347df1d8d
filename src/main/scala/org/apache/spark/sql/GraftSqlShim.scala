package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge for building a DataFrame from a third-party LogicalPlan — the
  * package-private hook every Spark extension library (Delta, Sedona,
  * Iceberg) shims the same way: Spark exposes no public constructor for
  * custom logical operators, and `Dataset.ofRows` is `private[sql]`. This
  * is the ONLY file outside the `graft` namespace. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` doorway the engine needs: turning a custom
  * [[LogicalPlan]] node into a user-facing [[DataFrame]]. Spark keeps
  * `Dataset.ofRows` package-private, so every library that ships its own
  * plan nodes (Delta, Iceberg, Hudi all do the same) hosts a bridge in an
  * `org.apache.spark.sql` subpackage. This is the only file in the repo
  * outside the `graft` namespace, and it intentionally contains no logic.
  */
object SqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` bridge the engine uses: wrap a custom LogicalPlan
  * (graft.plans.AsOfJoinPlan) into a DataFrame. This is the standard public
  * extension-library pattern (a package-object shim inside
  * `org.apache.spark.sql`) — everything else in the engine stays on public
  * API, and this file contains no logic of its own.
  */
object Bridge {
  def ofRows(s: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}

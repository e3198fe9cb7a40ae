package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.FloatDot

/** SparkSessionExtensions installer for the engine's custom Catalyst
  * pieces — the build-time injection path (the runtime path is
  * FloatDot.register on an existing session):
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions()) ...
  *   // or: --conf spark.sql.extensions=graft.plans.GraftExtensions
  *
  * Only `graft_dot` is injected: per SURVEY.md §4.2, every operator the
  * reference implies is expressible with built-in Catalyst plans, so no
  * custom Rule[LogicalPlan]/SparkStrategy is justified — the decision is
  * recorded there and this class is the place they would plug in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatDot.build(children)))
  }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.FloatVecDot

/** `SparkSessionExtensions` injection point — the deployment-grade way to
  * ship this library's custom expressions to a cluster:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Every session built with this config gets `vec_dot` (and any future
  * custom expressions/rules) without per-session `register` calls.
  * `FloatVecDot.register(spark)` remains for ad-hoc sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => FloatVecDot(children.head, children(1))))
  }
}

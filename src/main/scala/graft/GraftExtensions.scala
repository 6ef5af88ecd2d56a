package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.expressions.{CdcBoundaries, FloatVecDot, Hash60All, MaskAndCount, Simhash60, SlidingWindows, SortedIntersectCount, WinnowFps}

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
    // the builders validate arity with a clean WRONG_NUM_ARGS analysis
    // error instead of children.head/children(1) crashing
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      FloatVecDot.builder))
    ext.injectFunction((
      FunctionIdentifier("mask_and_count"),
      new ExpressionInfo(classOf[MaskAndCount].getName, "mask_and_count"),
      MaskAndCount.builder))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      SortedIntersectCount.builder))
    ext.injectFunction((
      FunctionIdentifier("cdc_bounds"),
      new ExpressionInfo(classOf[CdcBoundaries].getName, "cdc_bounds"),
      CdcBoundaries.builder))
    ext.injectFunction((
      FunctionIdentifier("hash60_all"),
      new ExpressionInfo(classOf[Hash60All].getName, "hash60_all"),
      Hash60All.builder))
    ext.injectFunction((
      FunctionIdentifier("sliding_windows"),
      new ExpressionInfo(classOf[SlidingWindows].getName, "sliding_windows"),
      SlidingWindows.builder))
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[Simhash60].getName, "simhash60"),
      Simhash60.builder))
    ext.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      WinnowFps.builder))
  }
}

package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Shared function-registry plumbing for this library's custom
  * expressions, so the arity validation (standard WRONG_NUM_ARGS analysis
  * error, not a `children.head` crash) and the registerFunction
  * boilerplate exist once. */
private[graft] object Registration {

  def arityOneBuilder(name: String, ctor: Expression => Expression)
      : Seq[Expression] => Expression = children => {
    if (children.length != 1)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> "1",
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    ctor(children.head)
  }

  def arityTwoBuilder(name: String,
                      ctor: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = children => {
    if (children.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> "2",
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    ctor(children.head, children(1))
  }

  def arityThreeBuilder(name: String,
                        ctor: (Expression, Expression, Expression) => Expression)
      : Seq[Expression] => Expression = children => {
    if (children.length != 3)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> "3",
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    ctor(children.head, children(1), children(2))
  }

  def register(spark: SparkSession, name: String, className: String,
               builder: Seq[Expression] => Expression): Unit = {
    // exists-guard (r15): the per-Column-construction register calls
    // (Dedup.hash60All/simhash60) re-registered on every call, and
    // SimpleFunctionRegistry logs a "replaced a previously registered
    // function" WARN per replacement — hundreds of lines per bench run
    // for zero effect. Registering identical content is idempotent, so
    // skip when the name already resolves.
    val id = FunctionIdentifier(name)
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(
        id, new ExpressionInfo(className, name), builder)
  }

  /** Sessions that already passed through [[registerAll]] (weak keys —
    * a stopped, unreferenced session's marker is collectable). */
  private val allDone =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]))

  /** Registers EVERY graft custom expression on `spark`, once per
    * session. Called from the `Tables` read choke point (r15): every
    * entry resolves its frames against the session it passes to
    * `Tables.*`, so registering here guarantees the functions exist on
    * the EXECUTING session — the per-call-site
    * `getActiveSession`-at-Column-construction-time registration
    * (`Dedup.hash60All`) can pick the wrong session when the
    * constructing thread's active session differs from the executing
    * one (parallel suites; round-14 ADVICE). Mirrors
    * [[graft.GraftExtensions]], which serves the same set to
    * `spark.sql.extensions`-configured deployments. */
  def registerAll(spark: SparkSession): Unit =
    if (allDone.add(spark)) {
      FloatVecDot.register(spark)
      MaskAndCount.register(spark)
      SortedIntersectCount.register(spark)
      CdcBoundaries.register(spark)
      Hash60All.register(spark)
      SlidingWindows.register(spark)
      Simhash60.register(spark)
      WinnowFps.register(spark)
    }
}

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
               builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo(className, name),
      builder)
}

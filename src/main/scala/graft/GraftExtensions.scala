package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{VecCosine, VecDot}

/** Engine extensions, installed with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (the
  * public extension-injection point — no session internals touched).
  *
  * Registers the native vector expressions `vec_dot` / `vec_cosine`
  * ([[graft.functions.VecDot]] / [[graft.functions.VecCosine]]).
  * Callers go through [[graft.operators.SimilarityOps.cosine]], which
  * falls back to the composable zip_with/aggregate form when the
  * extension is not installed — results are bit-identical either way.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def binary(name: String, clazz: Class[_], make: (Expression, Expression) => Expression) =
    (
      FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, name),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"$name expects exactly 2 arguments, got ${children.size}")
        make(children(0), children(1))
      }
    )

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(binary("vec_dot", classOf[VecDot], VecDot.apply))
    ext.injectFunction(binary("vec_cosine", classOf[VecCosine], VecCosine.apply))
  }
}

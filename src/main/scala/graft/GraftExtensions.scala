package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension entry point: install the engine's native functions at
  * session build time via
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the deployment
  * path for clusters, where per-query registration
  * ([[graft.functions.VectorFunctions.register]]) isn't available before
  * SQL is parsed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, null, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children.head, children(1))))
    // every native text/dedup expression, from the same builder list the
    // session-level register() uses — one source, two installation paths
    graft.functions.NativeTextExpressions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(graft.functions.NativeTextExpressions.getClass.getName, null, name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RewriteCosineToDot)
  }
}

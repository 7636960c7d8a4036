package graft

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
    // every native expression — vector AND text/dedup — from the same
    // builder lists the session-level register()s use: one source per
    // module, two installation paths, nothing can lag
    val all =
      graft.functions.VectorFunctions.builders ++
        graft.functions.NativeTextExpressions.builders
    all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, null, name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RewriteCosineToDot)
  }
}

package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Cluster-install entry point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` wires every custom SQL
  * function (sketches, rolling hash, text pipeline) into each session
  * built on the context — no per-session
  * [[graft.functions.GraftFunctions.registerAll]] call needed. The
  * standard `SparkSessionExtensions` packaging for an engine library. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}

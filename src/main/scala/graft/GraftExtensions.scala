package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.expressions.SimHash64

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for sessions built with
  * `spark.sql.extensions=graft.GraftExtensions`. Sessions the engine does
  * not construct (the driver's) can call `SimHash64.register(spark)`
  * directly — both paths install the same function builder.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash64"), SimHash64.info,
      children => SimHash64(children.head)))
  }
}

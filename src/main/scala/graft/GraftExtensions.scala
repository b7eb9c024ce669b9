package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.expressions.{RollingHash64, SimHash64}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for sessions built with
  * `spark.sql.extensions=graft.GraftExtensions`. Sessions the engine does
  * not construct (the driver's) can call `SimHash64.register(spark)` /
  * `RollingHash64.register(spark)` directly — both paths install the same
  * function builders.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash64"), SimHash64.info,
      children => SimHash64(children.head)))
    ext.injectFunction((FunctionIdentifier("rolling_hash64"),
      RollingHash64.info, children => RollingHash64(children.head)))
  }
}

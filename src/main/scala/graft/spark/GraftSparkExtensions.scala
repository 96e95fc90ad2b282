package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Cluster-wide library packaging: set
  * `spark.sql.extensions=graft.spark.GraftSparkExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftSparkExtensions)`) and
  * every session gets the full graft SQL surface plus the decode-time
  * column-pruning optimizer rule — no imperative `registerAll` call needed.
  * This is the standard deployment shape for a Spark-native library on a
  * shared cluster. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.sqlFunctions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.AvroDecodePruning)
  }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{LongDot, NfcNormalize}

/** Canonical plugin wiring for the graft-native Catalyst expressions: set
  * `spark.sql.extensions=graft.GraftExtensions` and `graft_long_dot` /
  * `graft_nfc` resolve in ANY session of the application — SQL strings,
  * views, thrift-server clients — without per-session `register` calls.
  * (The `LongDot.register`/`NfcNormalize.register` helpers remain for
  * ad-hoc sessions; this is the deployment-grade path a 100 TB cluster
  * config uses.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_long_dot"),
      new ExpressionInfo(classOf[LongDot].getName, "graft_long_dot"),
      (exprs: Seq[Expression]) => LongDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
  }
}

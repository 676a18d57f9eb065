package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.WarcHeaderGet

/** SQL-surface registration (`spark.sql.extensions=graft.GraftExtensions`):
  * exposes the engine's native expressions to plain SQL —
  * `warc_header(headers, 'WARC-Target-URI')` (last occurrence, the
  * Python-facing reference semantics) and `warc_header_first(...)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litName(e: Expression, fn: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn: header name must be a string literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("warc_header"),
      new ExpressionInfo(classOf[WarcHeaderGet].getName, "warc_header"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "warc_header(headers, name)")
        WarcHeaderGet(args.head, litName(args(1), "warc_header"), first = false)
      }))
    ext.injectFunction((
      FunctionIdentifier("warc_header_first"),
      new ExpressionInfo(classOf[WarcHeaderGet].getName, "warc_header_first"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "warc_header_first(headers, name)")
        WarcHeaderGet(args.head, litName(args(1), "warc_header_first"), first = true)
      }))
  }
}

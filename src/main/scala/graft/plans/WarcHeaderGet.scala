package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the hottest WARC column operation:
  * case-insensitive header lookup over the ordered multimap
  * `array<struct<key,value>>` (reference semantics warc.pyx:289-374 —
  * `first=false` is the Python dict-view LAST-occurrence lookup, the one
  * the reference's tests pin; `first=true` is the Rust-side first match).
  *
  * Exists because the composable form
  * (`element_at(transform(filter(headers, ...)), -1)`) runs through
  * Spark's interpreted higher-order functions — per-element lambda
  * machinery allocating an intermediate array per row. This expression
  * generates a tight scan loop inside whole-stage codegen (with an
  * interpreted fallback for completeness) and allocates nothing on miss.
  */
case class WarcHeaderGet(child: Expression, name: String, first: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = if (first) "warc_header_first" else "warc_header"

  private val nameLower = UTF8String.fromString(name.toLowerCase)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s.forall(_.dataType == StringType) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<struct<key:string,value:string>>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var result: UTF8String = null
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val kv = arr.getStruct(i, 2)
        val k = kv.getUTF8String(0)
        if (k != null && k.toLowerCase.equals(nameLower)) {
          result = kv.getUTF8String(1)
          if (first) return result
        }
      }
      i += 1
    }
    result
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nameRef = ctx.addReferenceObj("nameLower", nameLower, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val kv = ctx.freshName("kv")
      val k = ctx.freshName("k")
      // break unconditionally on the first key match (even a null value)
      // so codegen matches nullSafeEval, which returns immediately there
      val breakOnFirst = if (first) "break;" else ""
      s"""
        |${ev.isNull} = true;
        |int $n = $arr.numElements();
        |for (int $i = 0; $i < $n; $i++) {
        |  if (!$arr.isNullAt($i)) {
        |    InternalRow $kv = $arr.getStruct($i, 2);
        |    UTF8String $k = $kv.getUTF8String(0);
        |    if ($k != null && $k.toLowerCase().equals($nameRef)) {
        |      ${ev.value} = $kv.getUTF8String(1);
        |      ${ev.isNull} = (${ev.value} == null);
        |      $breakOnFirst
        |    }
        |  }
        |}
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WarcHeaderGet =
    copy(child = newChild)
}

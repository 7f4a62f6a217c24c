package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 resolution of a RUNTIME string against the query's parse-time
  * `BASE` (SPARQL 17.4.2.6: `IRI(str)`/`URI(str)` resolve relative
  * references against the base IRI). The base is a constant captured at
  * parse time; the reference is a per-row value, so the §5.2 transform runs
  * in an expression — one interpreted node reusing the exact
  * [[graft.model.IriResolver]] the parser applies to IRIREF tokens, keeping
  * the two resolution paths bit-identical.
  */
case class IriResolve(base: String, child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_iri_resolve"
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      graft.model.IriResolver.resolve(base, v.toString))
  override protected def withNewChildInternal(c: Expression): IriResolve =
    copy(child = c)
}

object IriResolve {
  def apply(base: String, c: Column): Column =
    ColumnBridge.column(IriResolve(base, ColumnBridge.expression(c)))
}

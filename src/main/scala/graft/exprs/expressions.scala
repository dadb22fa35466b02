package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom scalar expressions for semantics Spark's function library lacks.
  *
  * These run on ingest/output paths only (never in the scan/filter hot
  * path, which stays whole-stage-codegen'd on native binary/long
  * comparisons), so CodegenFallback is acceptable here.
  */
object exprs {
  private[graft] def toColumn(e: Expression): Column = Bridge.column(e)
  private[graft] def toExpr(c: Column): Expression = Bridge.expression(c)

  /** String IP literal → canonical 16-byte IPv6-mapped binary; null if
    * unparseable. */
  def ip_canonical(c: Column): Column = toColumn(IpCanonicalize(toExpr(c)))

  /** Canonical 16-byte binary → display string (dotted quad for
    * IPv4-mapped, RFC 5952 otherwise). */
  def ip_display(c: Column): Column = toColumn(IpDisplay(toExpr(c)))

  /** Porter-stem a single lowercase token. */
  def porter_stem(c: Column): Column = toColumn(PorterStem(toExpr(c)))
}

case class IpCanonicalize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    IpCodec.parse(v.asInstanceOf[UTF8String].toString).orNull
  override protected def withNewChildInternal(c: Expression): IpCanonicalize = copy(c)
  override def prettyName: String = "ip_canonical"
}

case class IpDisplay(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    if (b.length == 16) UTF8String.fromString(IpCodec.format(b)) else null
  }
  override protected def withNewChildInternal(c: Expression): IpDisplay = copy(c)
  override def prettyName: String = "ip_display"
}

case class PorterStem(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(PorterStemmer.stem(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression): PorterStem = copy(c)
  override def prettyName: String = "porter_stem"
}

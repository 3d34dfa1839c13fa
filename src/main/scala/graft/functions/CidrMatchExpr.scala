package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}
import graft.util.InetRadix

/** Native Catalyst expression for CIDR membership over a broadcast
  * radix trie — the codegen'd replacement for a Scala UDF (SURVEY.md
  * §2.8 "custom codegen'd CIDR-match").
  *
  * Why an Expression and not a UDF: a UDF call leaves whole-stage
  * codegen (boxing, encoder round-trip, closure dispatch per row);
  * this expression inlines `trie.contains(addr)` directly into the
  * generated Java, keeps the enclosing operator inside one codegen
  * stage, and evaluates null inputs to `false` without a null branch
  * in the parent. The trie rides along as a broadcast handle, so
  * tasks deserialize a pointer, not the tree.
  */
case class CidrMatchExpr(child: Expression, trie: Broadcast[InetRadix])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "cidr_match"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && trie.value.contains(v.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("cidrTrie", trie,
      classOf[Broadcast[InetRadix]].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        final boolean ${ev.value} = !${c.isNull} &&
          ((${classOf[InetRadix].getName}) $trieRef.value())
            .contains(${c.value}.toString());
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CidrMatchExpr =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd multi-keyword matcher.
  *
  * `keyword_filter`/`sem_filter` fold per-keyword predicates as
  * `lower(text).contains(k1) AND lower(text).contains(k2) ...`; since
  * `FilterExec` performs no subexpression elimination, whole-stage codegen
  * re-evaluates the (potentially expensive) `lower(concat_ws(...))` subtree
  * once PER KEYWORD. This expression lowers the text exactly once per row
  * and loops the keyword array in generated code — the codegen'd kernel the
  * reference's vectorized pandas masks (Operaters.py:15-42) map to.
  *
  * Semantics: matchAny=false -> AND of contains; matchAny=true -> OR;
  * negate flips the result (the `irrelevant` relation). Keywords are
  * lowercased at construction. Null text -> null (filtered).
  */
case class MultiContains(child: Expression, keywords: Seq[String],
    matchAny: Boolean, negate: Boolean)
  extends UnaryExpression with Predicate with ImplicitCastInputTypes {

  // analysis-time contract: a non-string child (e.g. SQL-registered
  // `multi_contains(42, ...)`) gets an implicit cast or a clear analysis
  // error instead of a runtime ClassCastException in eval/codegen
  override def inputTypes: Seq[GraftShim.AbstractDT] = Seq(StringType)

  private val kws: Array[UTF8String] =
    keywords.map(k => UTF8String.fromString(k.toLowerCase)).toArray

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(t: Any): Any = {
    val lowered = t.asInstanceOf[UTF8String].toLowerCase
    var r = !matchAny
    var i = 0
    var break = false
    while (i < kws.length && !break) {
      val c = lowered.contains(kws(i))
      if (matchAny) { if (c) { r = true; break = true } }
      else if (!c) { r = false; break = true }
      i += 1
    }
    if (negate) !r else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kwRef = ctx.addReferenceObj("kws", kws,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, input => {
      val lowered = ctx.freshName("lowered")
      val i = ctx.freshName("i")
      val hit = ctx.freshName("hit")
      val loop =
        if (matchAny)
          s"""boolean $hit = false;
             |for (int $i = 0; $i < $kwRef.length && !$hit; $i++) {
             |  if ($lowered.contains($kwRef[$i])) $hit = true;
             |}""".stripMargin
        else
          s"""boolean $hit = true;
             |for (int $i = 0; $i < $kwRef.length && $hit; $i++) {
             |  if (!$lowered.contains($kwRef[$i])) $hit = false;
             |}""".stripMargin
      s"""org.apache.spark.unsafe.types.UTF8String $lowered = $input.toLowerCase();
         |$loop
         |${ev.value} = ${if (negate) s"!$hit" else hit};""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MultiContains =
    copy(child = newChild)
}

object TextPredicates {
  def multi(text: Column, keywords: Seq[String], matchAny: Boolean,
      negate: Boolean): Column =
    GraftShim.column(
      MultiContains(GraftShim.expression(text), keywords, matchAny, negate))

  /** Column API: does lowered `text` contain all (or any) of `keywords`? */
  def containsAll(text: Column, keywords: Seq[String]): Column =
    multi(text, keywords, matchAny = false, negate = false)

  def containsAny(text: Column, keywords: Seq[String]): Column =
    multi(text, keywords, matchAny = true, negate = false)

  /** No keyword present: the AND-fold of single negations = NOT(any). */
  def containsNone(text: Column, keywords: Seq[String]): Column =
    multi(text, keywords, matchAny = true, negate = true)
}

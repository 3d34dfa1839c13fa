package graft.filter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Inline predicate DSL compiled to a single Catalyst `Column`
  * (SURVEY.md §2.2; ref s/parser/EventFilter.java, EventFilterRule
  * .java:32-79, EventFilterPayload.java:22-81).
  *
  * Semantics preserved from the reference: a filter is a list of rules
  * OR'd together; each rule is a conjunction of its configured
  * matchers; `except` sub-rules negate (rule matches only if no except
  * rule matches). Compilation produces one boolean expression, so
  * Catalyst folds it into the scan (predicate pushdown, constant
  * folding, codegen) instead of running an opaque row callback — the
  * whole reason this is a compiler and not a row predicate.
  *
  * Column layout expected (the parsed-Event Dataset of graft.parse):
  * payloadType, normalized.{types, sourceAddress, requestStatus, ...},
  * stackdriverProject, stackdriverLabels (map), fields (map).
  */
object EventFilter {

  /** Typed payload-field matchers against the `fields` map or any
    * normalized column. */
  sealed trait PayloadMatch { def toColumn: Column }
  /** Exact string equality on a field path. */
  final case class StringMatch(path: String, value: String) extends PayloadMatch {
    def toColumn: Column = fieldCol(path) === value
  }
  /** Java-regex full match on a field path. */
  final case class RegexMatch(path: String, pattern: String) extends PayloadMatch {
    def toColumn: Column = fieldCol(path).rlike(pattern)
  }
  /** Integer equality. */
  final case class IntMatch(path: String, value: Int) extends PayloadMatch {
    def toColumn: Column = fieldCol(path).cast("int") === value
  }
  /** Inclusive integer range. */
  final case class IntRange(path: String, lo: Int, hi: Int) extends PayloadMatch {
    def toColumn: Column = fieldCol(path).cast("int").between(lo, hi)
  }
  /** Disjunction of payload matchers inside one rule (ref
    * s/parser/EventFilterPayloadOr.java — a rule's matchers AND
    * together, this node ORs its children). */
  final case class OrMatch(matchers: Seq[PayloadMatch]) extends PayloadMatch {
    def toColumn: Column = matchers.map(m => coalesce(m.toColumn, lit(false)))
      .reduceOption(_ || _).getOrElse(lit(false))
  }

  /** `fields.x` addresses the string map; anything else is a column
    * path (e.g. `normalized.requestStatus`). */
  private def fieldCol(path: String): Column =
    if (path.startsWith("fields."))
      element_at(col("fields"), path.stripPrefix("fields."))
    else col(path)

  /** One rule: conjunction of all configured matchers, minus excepts. */
  final case class Rule(
      wantSubtype: Option[String] = None,
      wantNormalizedTypes: Seq[String] = Nil,
      wantProject: Option[String] = None,
      labelEquals: Map[String, String] = Map.empty,
      payload: Seq[PayloadMatch] = Nil,
      except: Seq[Rule] = Nil) {

    def toColumn: Column = {
      val conds: Seq[Column] =
        wantSubtype.map(col("payloadType") === _).toSeq ++
          wantNormalizedTypes.map(t =>
            array_contains(col("normalized.types"), t)) ++
          wantProject.map(col("stackdriverProject") === _).toSeq ++
          labelEquals.toSeq.map { case (k, v) =>
            element_at(col("stackdriverLabels"), k) === v } ++
          payload.map(_.toColumn)
      val base = conds.reduceOption(_ && _).getOrElse(lit(true))
      val negated = except.map(_.toColumn)
        .reduceOption(_ || _).map(e => !coalesce(e, lit(false)))
      negated.fold(base)(base && _)
    }
  }

  /** rules OR'd; empty filter matches nothing (reference default deny). */
  def compile(rules: Seq[Rule]): Column =
    rules.map(r => coalesce(r.toColumn, lit(false)))
      .reduceOption(_ || _).getOrElse(lit(false))
}

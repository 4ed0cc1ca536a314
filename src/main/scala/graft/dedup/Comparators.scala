package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-column similarity comparators as pure `Column` expression trees, so
  * Catalyst codegens them inside whole-stage codegen (no UDFs in the pair
  * kernel hot path).
  *
  * Semantics mirror the reference comparator kernel
  * (`/root/reference/.../impl/Compare.scala:35-77`):
  *   - `levSim`   — normalized Levenshtein similarity in [0,1]
  *                  (1 - dist / max(len)); both-empty ⇒ 1.0.
  *   - `sqrtDiff` — sqrt(|a-b|) on integral-parsed strings; both-unparseable
  *                  AND both-empty ⇒ 1.0; otherwise unparseable ⇒ Double.MaxValue.
  *   - `absDiff`  — |a-b| with the same missing-value ladder.
  */
object Comparators {

  private def norm(c: Column): Column = trim(coalesce(c.cast("string"), lit("")))

  /** Normalized Levenshtein similarity in [0,1]. */
  def levSim(a: Column, b: Column): Column = {
    val (ta, tb) = (norm(a), norm(b))
    when(length(ta) === 0 && length(tb) === 0, lit(1.0))
      .otherwise(
        lit(1.0) - levenshtein(ta, tb).cast("double") /
          greatest(length(ta), length(tb)).cast("double"))
  }

  /** Strict integral parse (java Long.parseLong semantics — no float
    * truncation, unlike a bare cast to long); null when unparseable. */
  private def parseLong(c: Column): Column = {
    val t = norm(c)
    when(t.rlike("^[+-]?[0-9]+$"), t.cast("long"))
  }

  private def numDiff(a: Column, b: Column)(f: Column => Column): Column = {
    val (ta, tb) = (norm(a), norm(b))
    val (pa, pb) = (parseLong(a), parseLong(b))
    when(pa.isNotNull && pb.isNotNull, f(pa - pb).cast("double"))
      .when(ta === "" && tb === "", lit(1.0))
      .otherwise(lit(Double.MaxValue))
  }

  /** sqrt(|a-b|) with the reference's missing-value ladder. */
  def sqrtDiff(a: Column, b: Column): Column = numDiff(a, b)(d => sqrt(abs(d)))

  /** |a-b| with the reference's missing-value ladder. */
  def absDiff(a: Column, b: Column): Column = numDiff(a, b)(d => abs(d))

  /** Constant 0.0 placeholder (reference `Ignore`, Compare.scala:73-77) —
    * keeps feature-vector arity stable for ignored columns. */
  def ignore: Column = lit(0.0)
}

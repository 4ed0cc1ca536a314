package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry consistency: a typo'd key in oracleSql would silently drop a
  * query from the driver's value comparison. */
class SparkEntrySpec extends AnyFunSuite with SparkSpec {

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("rows-only queries are the known non-SQL-expressible set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set("q33_dup_score", "q34_media_features", "q38_approx_stats"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("entry returns rows on the smoke dataset") {
    assert(SparkEntry.entry(spark).count() > 0L)
  }

  /** Oracle-typing guard: DuckDB types an integer `sum()` as HUGEINT
    * (int128) while Spark emits BIGINT, and the driver's hash is
    * type-sensitive — so every value can match and the gate still ships
    * red. This class of bug shipped twice (q19 round 1, q57/q59 round 3).
    * Rule: every `sum(` in an oracle must either sit inside a `CAST(...)`
    * span (the result type is then pinned explicitly) or sum an input the
    * SQL itself casts to DECIMAL/DOUBLE (those sums are type-stable across
    * both engines).
    *
    * Escape hatch: the guard can't tell an output column from an internal
    * grouping key (where the HUGEINT never reaches the driver's hash), so a
    * line may carry `-- guard:ok <why>` to exempt its sums — the annotation
    * forces the exemption to be visible and reasoned at the use site
    * instead of via a noise cast. */
  test("no oracle contains an uncast integer sum") {
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq
      o <- SparkEntrySpec.uncastSums(sql)
      snippet = sql.slice(math.max(0, o - 20), o + 40).trim
    } yield s"$name @$o: ...$snippet..."
    assert(offenders.isEmpty,
      s"uncast integer sum() in oracles (wrap in CAST(... AS BIGINT), or " +
      s"annotate the line `-- guard:ok <why>` for internal-only keys):\n" +
      offenders.mkString("\n"))
  }

  test("guard: a real uncast output sum is flagged") {
    val sql = "SELECT user_id, sum(n) AS total FROM t GROUP BY user_id"
    assert(SparkEntrySpec.uncastSums(sql).nonEmpty)
  }

  test("guard: casts, typed inputs, and annotated internal keys pass") {
    assert(SparkEntrySpec.uncastSums(
      "SELECT CAST(sum(n) AS BIGINT) AS total FROM t").isEmpty)
    assert(SparkEntrySpec.uncastSums(
      "SELECT sum(CAST(n AS DOUBLE)) AS total FROM t").isEmpty)
    val annotated = """
      WITH s AS (
        SELECT sum(is_new) OVER (ORDER BY ts) AS sess -- guard:ok (grouping key only)
        FROM t)
      SELECT sess, count(*) AS n FROM s GROUP BY sess"""
    assert(SparkEntrySpec.uncastSums(annotated).isEmpty)
    // the annotation only covers ITS line — other sums still red
    val partial = annotated + "\n-- and an output sum elsewhere:\n" +
      "UNION ALL SELECT 0, sum(k) FROM u"
    assert(SparkEntrySpec.uncastSums(partial).nonEmpty)
  }
}

object SparkEntrySpec {
  /** Offsets of `sum(` calls that are neither inside a CAST span, nor over
    * a DECIMAL/DOUBLE-cast input, nor on a `-- guard:ok`-annotated line. */
  private[graft] def uncastSums(sql: String): Seq[Int] = {
    def castSpans(sql: String): Seq[(Int, Int)] = {
      val up = sql.toUpperCase
      var spans = List.empty[(Int, Int)]
      var from = 0
      while ({ val i = up.indexOf("CAST(", from); from = i; i >= 0 }) {
        var depth = 0
        var j = from + 4 // index of the opening paren
        var end = -1
        while (end < 0 && j < sql.length) {
          sql(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = j
            case _ =>
          }
          j += 1
        }
        if (end > 0) spans ::= (from, end)
        from += 5
      }
      spans
    }
    def sumArg(sql: String, sumIdx: Int): String = {
      val open = sql.indexOf('(', sumIdx)
      var depth = 0
      var j = open
      var end = -1
      while (end < 0 && j < sql.length) {
        sql(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) end = j
          case _ =>
        }
        j += 1
      }
      sql.substring(open, if (end > 0) end else sql.length).toUpperCase
    }
    def annotatedLine(idx: Int): Boolean = {
      val lineEnd = sql.indexOf('\n', idx) match { case -1 => sql.length; case e => e }
      sql.lastIndexOf('\n', idx) match { case s =>
        sql.substring(s + 1, lineEnd).contains("-- guard:ok")
      }
    }
    val sumRe = "(?i)(?<![a-z0-9_])sum\\s*\\(".r
    val spans = castSpans(sql)
    (for {
      m <- sumRe.findAllMatchIn(sql)
      if !spans.exists { case (s, e) => m.start > s && m.start < e }
      arg = sumArg(sql, m.start)
      if !arg.contains("AS DECIMAL") && !arg.contains("AS DOUBLE")
      if !annotatedLine(m.start)
    } yield m.start).toSeq
  }
}

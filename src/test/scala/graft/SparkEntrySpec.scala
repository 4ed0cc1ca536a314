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
    * both engines). */
  test("no oracle contains an uncast integer sum") {
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
    val sumRe = "(?i)(?<![a-z0-9_])sum\\s*\\(".r
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq
      spans = castSpans(sql)
      m <- sumRe.findAllMatchIn(sql)
      if !spans.exists { case (s, e) => m.start > s && m.start < e }
      arg = sumArg(sql, m.start)
      if !arg.contains("AS DECIMAL") && !arg.contains("AS DOUBLE")
    } yield s"$name @${m.start}: ...${sql.slice(math.max(0, m.start - 20), m.start + 40).trim}..."
    assert(offenders.isEmpty,
      s"uncast integer sum() in oracles (wrap in CAST(... AS BIGINT)):\n${offenders.mkString("\n")}")
  }
}

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
}

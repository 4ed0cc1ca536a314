package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class ComparatorsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def eval(a: String, b: String, f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Double =
    Seq((a, b)).toDF("a", "b").select(f(col("a"), col("b"))).head().getDouble(0)

  test("levSim: normalized similarity, reference semantics") {
    assert(eval("abc", "abc", Comparators.levSim) === 1.0)
    assert(eval("abc", "axc", Comparators.levSim) === 1.0 - 1.0 / 3.0)
    assert(eval("", "", Comparators.levSim) === 1.0)        // both empty ⇒ 1.0
    assert(eval("abcd", "", Comparators.levSim) === 0.0)    // vs empty ⇒ 0
    assert(eval(" abc ", "abc", Comparators.levSim) === 1.0) // trimmed first
  }

  test("sqrtDiff: sqrt(|a-b|) with missing-value ladder (Compare.scala:47-60)") {
    assert(eval("19520707", "19520711", Comparators.sqrtDiff) === 2.0)
    assert(eval("", "", Comparators.sqrtDiff) === 1.0)              // both missing
    assert(eval("5", "", Comparators.sqrtDiff) === Double.MaxValue) // one missing
    assert(eval("x", "y", Comparators.sqrtDiff) === Double.MaxValue) // unparseable, non-empty
    assert(eval("5.5", "5", Comparators.sqrtDiff) === Double.MaxValue) // strict integral parse
  }

  test("absDiff: |a-b| with missing-value ladder (Compare.scala:61-71)") {
    assert(eval("30", "28", Comparators.absDiff) === 2.0)
    assert(eval("", "", Comparators.absDiff) === 1.0)
    assert(eval("", "41", Comparators.absDiff) === Double.MaxValue)
    assert(eval("-3", "4", Comparators.absDiff) === 7.0)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact OLS/Pearson sufficient statistics — the linear-correlation
  * sibling of [[TextOps.spearmanOfPairs]] (rank) and the q201 copula
  * (local dependence). A standalone object ON PURPOSE: both
  * [[Relational]] (q226) and [[TextOps]] (q227) consume it at object-init
  * time, and hosting it in either would close an init-time reference
  * CYCLE between the two (Relational already reads
  * TextOps.LengthPercentiles) — two Verify threads initializing both
  * objects concurrently then deadlock in the Scala object-init locks.
  */
object Ols {

  /** ONE map-side pass over ANY integer (x, y) pairs frame accumulating
    * n, Σx, Σy, Σx², Σy², Σxy in DECIMAL(38,0), then the three
    * cross-multiplied moments num = nΣxy − ΣxΣy, den = nΣx² − (Σx)²,
    * deny = nΣy² − (Σy)² — all EXACT (to n·x·y ≲ 1e38; the q226/q227
    * inputs bound x, y so the product holds past 1e12 rows).
    * slope/intercept/r²/r are derived by callers as fixed double chains
    * on the exact-cast moments — identical op order in both engines,
    * never a re-ordered double accumulation. */
  private[graft] def coreOn(pairs: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    pairs.agg(count(lit(1)).as("n"),
      sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
      sum(d38(col("x")) * d38(col("x"))).as("sxx"),
      sum(d38(col("y")) * d38(col("y"))).as("syy"),
      sum(d38(col("x")) * d38(col("y"))).as("sxy"))
      .select(col("n"),
        (d38(col("n")) * col("sxy") - col("sx") * col("sy")).as("num"),
        (d38(col("n")) * col("sxx") - col("sx") * col("sx")).as("den"),
        (d38(col("n")) * col("syy") - col("sy") * col("sy")).as("deny"),
        col("sx"), col("sy"))
  }

  /** The shared oracle chain over a `p(x, y)` CTE — [[coreOn]]'s oracle
    * face: defines CTE `d(n, num, den, deny, sx, sy)`. */
  private[graft] val CoreSqlFromP: String = """
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
            sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy, -- guard:ok internal HUGEINT; caller outputs are exact-cast
            sum(CAST(x AS HUGEINT) * x) AS sxx, -- guard:ok internal HUGEINT; caller outputs are exact-cast
            sum(CAST(y AS HUGEINT) * y) AS syy, -- guard:ok internal HUGEINT; caller outputs are exact-cast
            sum(CAST(x AS HUGEINT) * y) AS sxy -- guard:ok internal HUGEINT; caller outputs are exact-cast
          FROM p),
    d AS (SELECT n, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den,
            n * syy - sy * sy AS deny, sx, sy
          FROM s)"""
}

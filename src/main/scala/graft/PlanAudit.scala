package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: executes every registered query at a small SF and audits
  * the FINAL adaptive plan for redundant work — the q59 failure mode where an
  * analysis-level difference between two branches (an extra alias, a differing
  * projection) silently defeats exchange reuse and doubles the file scan.
  *
  * For each query it reports, from the executed plan only (not the initial
  * AQE plan): file-scan counts per path, shuffle-exchange count, and reused
  * exchanges/subqueries. Queries whose plan scans the same parquet location
  * more than once are listed in the DOUBLE-SCAN section for manual review —
  * a second scan is legitimate only when the two consumers need genuinely
  * different projections/filters AND the scan is cheaper than materializing
  * the union of columns (rarely true at 100 TB).
  *
  * Usage: runMain graft.PlanAudit [sfDir] [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Audit(name: String, scans: Map[String, Int],
                           exchanges: Int, reused: Int, err: Option[String])

    // Same token extraction as PlanSpec.nodes: strip tree-drawing prefix and
    // codegen markers, take the leading operator word.
    def opTok(line: String): String = {
      val t = line.dropWhile(c => c.isWhitespace || ":+-|".contains(c))
      val u = if (t.startsWith("*(")) t.dropWhile(_ != ')').drop(1) else t
      u.trim.takeWhile(c => c.isLetterOrDigit)
    }

    val audits = names.map { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        // Execute so AQE finalizes; take the FINAL plan text only (the
        // Initial Plan section would double-count every node).
        df.queryExecution.toRdd.count()
        val s = df.queryExecution.executedPlan.toString
        val cut = s.indexOf("== Initial Plan ==")
        val p = if (cut >= 0) s.substring(0, cut) else s
        val lines = p.linesIterator.toSeq
        val scans = lines.filter(l => opTok(l) == "FileScan")
          .map { l =>
            "([A-Za-z0-9_.-]+\\.parquet|[A-Za-z0-9_.-]+\\.orc|[A-Za-z0-9_.-]+\\.csv)".r
              .findFirstIn(l).getOrElse("?")
          }
          .groupBy(x => x).map { case (k, v) => k -> v.size }
        val ex = lines.count(l => opTok(l) == "Exchange")
        val re = lines.count(l => opTok(l) == "ReusedExchange")
        Audit(n, scans, ex, re, None)
      } catch {
        case e: Throwable => Audit(n, Map.empty, 0, 0, Some(e.toString.take(120)))
      } finally CachedFrames.drain()
    }

    println("\n==== PLAN AUDIT ====")
    audits.foreach { a =>
      val scanStr = a.scans.toSeq.sortBy(_._1)
        .map { case (f, c) => s"$f${if (c > 1) s"*$c" else ""}" }.mkString(" ")
      println(f"${a.name}%-28s ex=${a.exchanges}%-3d reuse=${a.reused}%-3d $scanStr${a.err.map(" ERR " + _).getOrElse("")}")
    }
    val doubles = audits.filter(_.scans.exists(_._2 > 1))
    println(s"\n==== DOUBLE-SCAN (${doubles.size}) ====")
    doubles.foreach { a =>
      println(s"${a.name}: " + a.scans.filter(_._2 > 1).map { case (f, c) => s"$f x$c" }.mkString(", "))
    }
    val errs = audits.filter(_.err.isDefined)
    if (errs.nonEmpty) {
      println(s"\n==== ERRORS (${errs.size}) ====")
      errs.foreach(a => println(s"${a.name}: ${a.err.get}"))
    }
    spark.stop()
  }
}

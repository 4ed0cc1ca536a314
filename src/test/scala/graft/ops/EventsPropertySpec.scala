package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the daily-series trend family on random GAPPED
  * series: q198's ACF, q199's Mann–Kendall and q200's Theil–Sen each
  * reproduce an independent plain-Scala oracle exactly — including the
  * shapes a fixture misses (all-constant runs, heavy ties, single-day
  * series, long gaps that zero-fill). The same cores back q214 (monthly
  * revenue) and q215 (per-type) through the series-generic seam, so this
  * hardens five gate queries at once. */
class EventsPropertySpec extends AnyFunSuite with SparkSpec {

  // (day -> count) observations with gaps; counts small so ties are common
  private val seriesGen: Gen[Map[Long, Int]] = for {
    n <- Gen.choose(1, 10)
    days <- Gen.listOfN(n, Gen.choose(0L, 14L))
    counts <- Gen.listOfN(n, Gen.choose(1, 4))
  } yield days.zip(counts).groupBy(_._1).view
    .mapValues(_.map(_._2).sum).toMap

  private def eventsOf(obs: Map[Long, Int]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    obs.toSeq.flatMap { case (d, n) =>
      (0 until n).map(i => d * 86400L + (i * 7919L) % 86400L)
    }.toDF("sec").withColumn("ts", timestamp_seconds(col("sec")))
  }

  /** The dense series the cores must see: zero-filled [min, max]. */
  private def denseOf(obs: Map[Long, Int]): Seq[Long] = {
    val (lo, hi) = (obs.keys.min, obs.keys.max)
    (lo to hi).map(d => obs.getOrElse(d, 0).toLong)
  }

  test("q198 ACF property: bitwise equal to the exact-deviation formula " +
    "on random gapped series; |acf| <= 1 always; constant series -> NULL") {
    val prop = Prop.forAllNoShrink(seriesGen) { obs =>
      val c = denseOf(obs); val n = c.size; val tot = c.sum
      val dev = c.map(x => BigInt(n) * x - tot)
      val den = dev.map(d => d * d).sum
      val expected = (1 to math.min(7, n - 1)).flatMap { k =>
        val num = (0 until n - k).map(t => dev(t) * dev(t + k)).sum
        if (den == 0) Seq((k.toLong, (n - k).toLong, None))
        else Seq((k.toLong, (n - k).toLong,
          Some(num.toDouble / den.toDouble)))
      }
      val got = Events.acfOn(eventsOf(obs)).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .sortBy(_._1).toSeq
      graft.CachedFrames.drain()
      val bounded = got.forall(_._3.forall(a => math.abs(a) <= 1.0))
      Prop(got == expected && bounded) :| s"acf on $obs: $got vs $expected"
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("q199/q200 property: S, var_num, z and the Theil-Sen median match " +
    "the plain-Scala brute on random gapped series") {
    val prop = Prop.forAllNoShrink(seriesGen suchThat (_.nonEmpty)) { obs =>
      val c = denseOf(obs); val n = c.size
      val s = (for (i <- c.indices; j <- i + 1 until n)
        yield (c(j) compare c(i)).sign.toLong).sum
      val tie = c.groupBy(identity).values.map(_.size.toLong)
        .map(t => t * (t - 1) * (t * 2 + 5)).sum
      val vn = n.toLong * (n - 1) * (n * 2 + 5) - tie
      val zExp = if (vn > 0) Some((if (s > 0) (s - 1).toDouble
        else if (s < 0) (s + 1).toDouble else 0.0) /
        math.sqrt(vn.toDouble / 18.0)) else None
      val mk = Events.mannKendallOn(eventsOf(obs)).collect()(0)
      graft.CachedFrames.drain()
      val mkOk = mk.getLong(0) == n.toLong && mk.getLong(1) == s &&
        mk.getLong(2) == vn &&
        (if (mk.isNullAt(3)) None else Some(mk.getDouble(3))) == zExp
      val tsOk = if (n >= 2) {
        val slopes = (for (i <- c.indices; j <- i + 1 until n)
          yield (c(j) - c(i)).toDouble / (j - i).toDouble).sorted
        val m = slopes.size
        val med = (slopes((m + 1) / 2 - 1) + slopes(m / 2)) / 2.0
        val ts = Events.theilSenOn(eventsOf(obs)).collect()(0)
        graft.CachedFrames.drain()
        ts.getLong(0) == m.toLong && ts.getDouble(1) == med
      } else true
      Prop(mkOk && tsOk) :| s"trend on $obs"
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  // (group, value) observations; tiny values keep every intermediate
  // below 2^53 so the mirror's doubles are exact by construction
  private val groupedGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(2, 12)
    gs <- Gen.listOfN(n, Gen.choose(0L, 3L))
    cs <- Gen.listOfN(n, Gen.choose(1L, 6L))
  } yield gs.zip(cs)

  test("q222/q225/q237 ANOVA property: eta2 and F bitwise equal the " +
    "plain-Scala mirror (group-key-ordered fold) on random grouped " +
    "observations; constant input -> NULL/NULL") {
    val prop = Prop.forAllNoShrink(groupedGen) { obs =>
      val n = obs.size
      val s = obs.map(o => BigInt(o._2)).sum
      val c2 = obs.map(o => BigInt(o._2) * o._2).sum
      val sstn = BigInt(n) * c2 - s * s
      val nsst = (BigInt(n) * sstn).toDouble
      var ssb = 0.0
      obs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, rows) =>
        val ng = rows.size
        val sg = rows.map(r => BigInt(r._2)).sum
        val x = (BigInt(n) * sg - BigInt(ng) * s).toDouble
        ssb += x * x / ng.toDouble
      }
      val k = obs.map(_._1).distinct.size
      val expEta = if (sstn > 0) Some(ssb / nsst) else None
      val expF = if (sstn > 0 && k > 1 && n > k && (nsst - ssb) > 0)
        Some((ssb / (k - 1).toDouble) / ((nsst - ssb) / (n - k).toDouble))
      else None
      import spark.implicits._
      val r = Events.anovaOfGroups(obs.toDF("g", "c")).collect()(0)
      graft.CachedFrames.drain()
      val got = (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
      Prop(got == ((n.toLong, k.toLong, expEta, expF))) :|
        s"anova on $obs: $got vs ($n, $k, $expEta, $expF)"
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }
}

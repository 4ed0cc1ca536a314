package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-8 text operators on random skewed corpora:
  * q92's LM bits, q93's DSIR weights, and q95's CMS cells each reproduce an
  * independent plain-Scala oracle exactly — including the degenerate shapes
  * a fixture misses (empty reference slice, single-token docs, empty text,
  * all-one-language corpora).
  */
class TextOpsPropertySpec extends AnyFunSuite with SparkSpec {

  // 23 distinct drawable tokens — past TextOps.LmVocabV = 16, so random
  // corpora routinely push low-count tokens through the q92 vocab cut's
  // <oov> path (including count ties resolved by the token-asc tie-break)
  private val vocab = Vector("the", "a", "of", "el", "la", "de", "alpha",
    "beta", "gamma", "delta", "hot", "", "zz9",
    "k01", "k02", "k03", "k04", "k05", "k06", "k07", "k08", "k09", "k10")

  private def tokGen: Gen[String] =
    Gen.frequency((6, Gen.oneOf(vocab.filter(_.nonEmpty))), (3, Gen.const("hot")))

  /** Docs with sparse, shuffled ids so the % [[TextOps.LmRefMod]] reference
    * slice ranges from empty to most of the corpus. */
  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 22)
    step <- Gen.oneOf(1, 3, 7, 10)
    texts <- Gen.listOfN(n, Gen.choose(0, 14).flatMap(k =>
      Gen.listOfN(k, tokGen).map(_.mkString(" "))))
  } yield texts.zipWithIndex.map { case (t, i) => ((i.toLong * step + 1), t) }

  private def toks(t: String): Seq[String] = t.trim.split("\\s+").toSeq

  private def md56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 14), 16)
  }

  private def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong

  /** q92 oracle: VOCAB-CUT add-one bigram LM over the doc_id % LmRefMod
    * slice — top-[[TextOps.LmVocabV]] unigrams by (count desc, token asc),
    * every other token mapped to `<oov>`, whose always-present row carries
    * the residual mass; bigrams counted over the mapped stream. */
  private def lmOracle(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val ref = docs.filter(_._1 % TextOps.LmRefMod == 0).map(d => toks(d._2))
    val raw = ref.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val inVocab = raw.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(TextOps.LmVocabV).map(_._1).toSet
    def m(w: String): String = if (inVocab(w)) w else TextOps.LmOov
    val uni = (raw.toSeq.map { case (w, c) => m(w) -> c } :+ (TextOps.LmOov -> 0L))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val big = ref.flatMap(t => t.sliding(2).filter(_.size == 2)
        .map(p => (m(p(0)), m(p(1)))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = uni.values.sum.toDouble
    val v = uni.size.toDouble
    val cOov = uni(TextOps.LmOov)
    // scoring membership mirrors the engines' join-on-uni: a token hits iff
    // the MAPPED table has a row under its own spelling (a literal "<oov>"
    // corpus token hits the residual row — same count either way)
    def cU(w: String): Long = uni.getOrElse(w, cOov)
    def mS(w: String): String = if (uni.contains(w)) w else TextOps.LmOov
    docs.map { case (id, t) =>
      val ts = toks(t)
      val cost = ts.zipWithIndex.map { case (w, i) =>
        val inv =
          if (i == 0) math.floor((n + v + 1.0) / (cU(w) + 1.0)).toLong
          else math.floor((cU(ts(i - 1)) + v + 1.0) /
            (big.getOrElse((mS(ts(i - 1)), mS(w)), 0L) + 1.0)).toLong
        bits(inv)
      }.sum
      id -> (ts.size.toLong, cost)
    }.toMap
  }

  /** q93 oracle: hashed-bigram target-vs-raw bits delta. */
  private def dsirOracle(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val stopEn = Set("the", "a", "of", "and", "to")
    val stopEs = Set("el", "la", "de", "y", "que")
    val stopDe = Set("der", "die", "und", "das", "ist")
    def lang(ts: Seq[String]): String = {
      val (e, s, d) = (ts.count(stopEn), ts.count(stopEs), ts.count(stopDe))
      if (e >= s && e >= d) "en" else if (s >= d) "es" else "de"
    }
    def bucket(g: String): Long = md56("dsir:" + g) % TextOps.DsirBuckets
    val grams = docs.flatMap { case (id, t) =>
      val ts = toks(t)
      if (ts.size < 2) Seq.empty
      else ts.sliding(2).map(p => (id, lang(ts), bucket(p.mkString(" ")))).toSeq
    }
    val nRaw = grams.size.toDouble
    val nTgt = grams.count(_._2 == "en").toDouble
    val cRaw = grams.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cTgt = grams.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    def delta(b: Long): Long =
      bits(math.floor((nRaw + TextOps.DsirBuckets) / (cRaw.getOrElse(b, 0L) + 1.0)).toLong) -
        bits(math.floor((nTgt + TextOps.DsirBuckets) / (cTgt.getOrElse(b, 0L) + 1.0)).toLong)
    docs.map { case (id, t) =>
      val ts = toks(t)
      val ds = if (ts.size < 2) Seq.empty
        else ts.sliding(2).map(p => delta(bucket(p.mkString(" ")))).toSeq
      id -> (ds.size.toLong, ds.sum)
    }.toMap
  }

  /** q95 oracle: the full CMS plus exact counts (estimates for EVERY token,
    * not only the reported top-k). */
  private def cmsOracle(docs: Seq[(Long, String)]): (Map[String, Long], String => Long) = {
    val all = docs.flatMap(d => toks(d._2))
    val sketch = Array.fill(TextOps.CmsDepth, TextOps.CmsWidth)(0L)
    all.foreach(t => (0 until TextOps.CmsDepth).foreach(r =>
      sketch(r)((md56(s"cms$r:$t") % TextOps.CmsWidth).toInt) += 1))
    val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    (exact, t => (0 until TextOps.CmsDepth)
      .map(r => sketch(r)((md56(s"cms$r:$t") % TextOps.CmsWidth).toInt)).min)
  }

  private val piiGen: Gen[String] = Gen.oneOf(
    Gen.const("jane.doe+x@mail-host.co.uk"),
    Gen.const("bob@ex.io"),
    Gen.choose(100, 999).flatMap(a => Gen.choose(10, 99).flatMap(b =>
      Gen.choose(1000, 9999).map(c => s"$a-$b-$c"))),            // ssn-shaped
    Gen.choose(200, 999).flatMap(a => Gen.choose(200, 999).flatMap(b =>
      Gen.choose(1000, 9999).map(c => s"$a.$b.$c"))),            // phone-shaped
    Gen.choose(100000000L, 99999999999L).map(_.toString))        // long id

  private val piiDocGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    texts <- Gen.listOfN(n, for {
      k <- Gen.choose(0, 10)
      words <- Gen.listOfN(k, Gen.frequency((5, tokGen), (2, piiGen)))
    } yield words.mkString(" "))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong + 1, t) }

  test("q96 PII counts and masks equal an independent regex oracle on random docs") {
    val prop = Prop.forAllNoShrink(piiDocGen) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text").repartition(2)
      val got = TextOps.piiScanOn(df).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getString(5))).toMap
      graft.CachedFrames.drain()
      // independent oracle: java.util.regex applied per rule in the same
      // order — counts from the ORIGINAL text, masking chained
      val ref = docs.map { case (id, t) =>
        val counts = TextOps.PiiRules.map { case (_, re, _) =>
          re.r.findAllMatchIn(t).size.toLong
        }
        val masked = TextOps.PiiRules.foldLeft(t) { case (acc, (_, re, tok)) =>
          acc.replaceAll(re, java.util.regex.Matcher.quoteReplacement(tok))
        }
        id -> (counts(0), counts(1), counts(2), counts(3), masked)
      }.toMap
      Prop(got == ref) :| s"q96 mismatch: $got vs $ref"
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("q92/q93/q95 reproduce plain-Scala oracles on random corpora") {
    graft.functions.GraftFunctions.register(spark)
    val prop = Prop.forAllNoShrink(corpusGen) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text").repartition(4)

      val lmGot = TextOps.lmBitsOn(df).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val dsirGot = TextOps.dsirOn(df).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val hhGot = TextOps.heavyHittersOn(df).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      graft.CachedFrames.drain()

      val lmRef = lmOracle(docs)
      val dsirRef = dsirOracle(docs)
      val (exact, est) = cmsOracle(docs)
      val hhOk = hhGot.forall { case (t, ex, e) =>
        ex == exact(t) && e == est(t) && e >= ex
      }
      Prop.all(
        Prop(lmGot == lmRef) :| s"q92 mismatch: $lmGot vs $lmRef",
        Prop(dsirGot == dsirRef) :| s"q93 mismatch: $dsirGot vs $dsirRef",
        Prop(hhOk) :| s"q95 mismatch: $hhGot")
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  /** q97/q98 oracle: the full BPE train + encode loop in plain Scala —
    * greedy argmax merges over the freq-weighted char-spelled vocabulary
    * with (n desc, pair asc) tie-break, each merge applied as the engines'
    * fixed-pass space-padded literal replace (Java String.replace is the
    * same left-to-right non-overlapping substitution both SQL engines
    * run). */
  private def bpeOracle(docs: Seq[(Long, String)],
      rounds: Int): (Seq[(Int, String, Long)], Map[Long, (Long, Long, Long)]) = {
    def spell(tok: String): String = tok.toCharArray.mkString(" ")
    def applyMerge(s: String, pair: String): String = {
      val merged = pair.replace(" ", "")
      (1 to TextOps.BpeReplacePasses).foldLeft(" " + s + " ") { (c, _) =>
        c.replace(" " + pair + " ", " " + merged + " ")
      }.trim
    }
    var vocab = docs.flatMap(d => toks(d._2)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (t, f) => spell(t) -> f }
      .groupBy(_._1).view.mapValues(_.values.sum).toMap // distinct spellings
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[String, Long]
      vocab.foreach { case (s, f) =>
        val sy = s.split(" ")
        if (sy.length >= 2) sy.sliding(2).foreach { p =>
          val k = p.mkString(" ")
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + f
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val (pair, n) = pairCounts.toSeq.minBy { case (p, c) => (-c, p) }
        merges += ((r, pair, n))
        vocab = vocab.toSeq.map { case (s, f) => applyMerge(s, pair) -> f }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        r += 1
      }
    }
    val mergeList = merges.toSeq
    val encoded = docs.map { case (id, t) =>
      val ts = toks(t).filter(_.nonEmpty)
      val nBpe = ts.map { tok =>
        mergeList.foldLeft(spell(tok)) { case (s, (_, p, _)) => applyMerge(s, p) }
          .split(" ").length.toLong
      }.sum
      id -> ((ts.size.toLong, ts.map(_.length.toLong).sum, nBpe))
    }.toMap
    (mergeList, encoded)
  }

  test("q97/q98 BPE train + encode reproduce a plain-Scala oracle on random corpora") {
    val prop = Prop.forAllNoShrink(corpusGen) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text").repartition(4)
      val trainGot = TextOps.bpeTrainOn(df, TextOps.BpeRounds).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      graft.CachedFrames.drain()
      val encodeGot = TextOps.bpeEncodeOn(df, TextOps.BpeRounds).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      graft.CachedFrames.drain()
      val (trainRef, encodeRef) = bpeOracle(docs, TextOps.BpeRounds)
      Prop.all(
        Prop(trainGot == trainRef) :| s"q97 mismatch: $trainGot vs $trainRef",
        Prop(encodeGot == encodeRef) :| s"q98 mismatch: $encodeGot vs $encodeRef")
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  /** q100 oracle: hashed-bigram NB with add-one smoothing, integer-bits
    * costs, class-ascending argmin tie-break — the full train + score loop
    * in plain Scala. */
  private def nbOracle(
      docs: Seq[(Long, String, String)]): Map[Long, (Long, String, String, Boolean)] = {
    val C = TextOps.NbClasses
    val B = TextOps.NbBuckets
    def bucket(g: String): Long = md56("nb:" + g) % B
    def bigrams(t: String): Seq[Long] = {
      val ts = toks(t)
      if (ts.size < 2) Seq.empty
      else ts.sliding(2).map(p => bucket(p.mkString(" "))).toSeq
    }
    val grams = docs.flatMap { case (_, t, l) => bigrams(t).map(b => (l, b)) }
    val nC = C.map(c => c -> grams.count(_._1 == c).toDouble).toMap
    val kBC = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def cost(b: Long, c: String): Long =
      bits(math.floor((nC(c) + B) / (kBC.getOrElse((c, b), 0L) + 1.0)).toLong)
    val dAll = docs.size.toDouble
    val dC = C.map(c => c -> docs.count(_._3 == c).toDouble).toMap
    val pC = C.map(c => c -> bits(math.floor((dAll + C.size) / (dC(c) + 1.0)).toLong)).toMap
    docs.map { case (id, t, l) =>
      val bs = bigrams(t)
      val tot = C.map(c => c -> (pC(c) + bs.map(cost(_, c)).sum)).toMap
      val mn = C.map(tot).min
      val pred = C.find(c => tot(c) == mn).get
      id -> ((bs.size.toLong, l, pred, pred == l))
    }.toMap
  }

  private val labeledGen: Gen[List[(Long, String, String)]] = for {
    n <- Gen.choose(1, 22)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0, 14)
      ws <- Gen.listOfN(k, tokGen)
      l <- Gen.oneOf(TextOps.NbClasses)
    } yield (ws.mkString(" "), l))
  } yield rows.zipWithIndex.map { case ((t, l), i) => (i.toLong + 1, t, l) }

  test("q100 NB language ID reproduces a plain-Scala train+score oracle " +
      "on random labeled corpora") {
    graft.functions.GraftFunctions.register(spark)
    val prop = Prop.forAllNoShrink(labeledGen) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text", "lang").repartition(4)
      val got = TextOps.nbOn(df).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getString(2), r.getString(3), r.getBoolean(4)))).toMap
      graft.CachedFrames.drain()
      val ref = nbOracle(docs)
      Prop(got == ref) :| s"q100 mismatch: $got vs $ref"
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  /** q166 oracle: brute-force substring-dedup removal plan — every W-gram
    * site, canonical = min (doc, pos) per gram, coverage = union of
    * redundant [p, p+W−1] intervals, spans = maximal runs. */
  private def substrOracle(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Double)] = {
    val W = TextOps.SubstrW
    val tokens = docs.map { case (id, t) => id -> toks(t) }.toMap
    val sites = for {
      (id, ts) <- tokens.toSeq
      p <- 1 to (ts.size - W + 1)
    } yield (ts.slice(p - 1, p - 1 + W).mkString(""), id, p.toLong)
    val redundant = sites.groupBy(_._1).values.flatMap { g =>
      val sorted = g.map(s => (s._2, s._3)).sorted
      if (sorted.size >= 2) sorted.tail else Nil
    }.toSeq
    val covered = redundant.groupBy(_._1).view.mapValues { anchors =>
      val pos = anchors.map(_._2).map(_.toInt)
      pos.flatMap(p => p until (p + W)).toSet
    }.toMap
    docs.map { case (id, _) =>
      val n = tokens(id).size.toLong
      val cov = covered.getOrElse(id, Set.empty)
      val spans = cov.toSeq.sorted
        .foldLeft((0L, Int.MinValue)) { case ((k, prev), p) =>
          (if (p == prev + 1) k else k + 1, p)
        }._1
      id -> ((n, cov.size.toLong, spans,
        (n - cov.size).toDouble / n.toDouble))
    }.toMap
  }

  test("q166 substring dedup reproduces a brute-force interval-union " +
    "oracle on random repetitive corpora") {
    // 2-token alphabet + doc lengths straddling W: heavy gram collisions,
    // overlapping anchors, within-doc repeats, docs too short to gram
    val repGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(1, 10)
      texts <- Gen.listOfN(n, Gen.choose(0, 24).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf("a", "b")).map(_.mkString(" "))))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong * 3 + 1, t) }
    val prop = Prop.forAllNoShrink(repGen) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text").repartition(3)
      val got = TextOps.substrDedupOn(df).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      graft.CachedFrames.drain()
      val ref = substrOracle(docs)
      Prop(got == ref) :| s"q166 mismatch: $got vs $ref"
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("substring admission law holds on random repetitive corpora: " +
    "admit(index(base), delta) ≡ batch plan on base ∪ delta restricted " +
    "to delta, under the id-ordering contract") {
    // same adversarial generator as the q166 property (2-token alphabet,
    // lengths straddling W), split so every base id precedes every delta
    // id — the immutable-base contract
    val splitGen: Gen[(List[(Long, String)], List[(Long, String)])] = for {
      nb <- Gen.choose(0, 6)
      nd <- Gen.choose(1, 6)
      texts <- Gen.listOfN(nb + nd, Gen.choose(0, 24).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf("a", "b")).map(_.mkString(" "))))
    } yield {
      val all = texts.zipWithIndex.map { case (t, i) => (i.toLong * 3 + 1, t) }
      (all.take(nb), all.drop(nb))
    }
    val prop = Prop.forAllNoShrink(splitGen) { case (base, delta) =>
      import spark.implicits._
      val baseDf = base.toDF("doc_id", "text").repartition(2)
      val deltaDf = delta.toDF("doc_id", "text").repartition(3)
      val admitted = TextOps.substrAdmitAgainstIndex(deltaDf,
        TextOps.substrIndexFrame(baseDf)).collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      graft.CachedFrames.drain()
      val deltaIds = delta.map(_._1).toSet
      val unionPlan = TextOps.substrDedupOn((base ++ delta)
          .toDF("doc_id", "text").repartition(3)).collect()
        .filter(r => deltaIds(r.getLong(0)))
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      graft.CachedFrames.drain()
      Prop(admitted == unionPlan) :| s"admission law: $admitted vs $unionPlan"
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("contingency grid core (q197/q201/q207/q209): every cell of a " +
    "random two-categorical frame — including absent combinations — " +
    "matches the plain-Scala BigInt expected/residual/lift bitwise") {
    val pairGen: Gen[List[(String, String)]] = for {
      nA <- Gen.choose(1, 4); nB <- Gen.choose(1, 4)
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        a <- Gen.choose(0, nA - 1); b <- Gen.choose(0, nB - 1)
      } yield (s"a$a", s"b$b"))
    } yield rows
    val prop = Prop.forAllNoShrink(pairGen) { rows =>
      import spark.implicits._
      val got = Curation.contingencyGridOn(
        rows.toDF("lang", "source").repartition(3), "lang", "source")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
        .toMap
      graft.CachedFrames.drain()
      val counts = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val as = rows.map(_._1).distinct; val bs = rows.map(_._2).distinct
      val n = rows.size
      val ok = (for (a <- as; b <- bs) yield {
        val o = counts.getOrElse((a, b), 0L)
        val rl = BigInt(rows.count(_._1 == a))
        val cs = BigInt(rows.count(_._2 == b))
        val (go, ge, gres, glift) = got((a, b))
        go == o &&
          ge == (rl * cs).toDouble / n.toDouble &&
          gres == (BigInt(o) * n - rl * cs).toDouble /
            math.sqrt((BigInt(n) * rl * cs).toDouble) &&
          glift == (BigInt(o) * n).toDouble / (rl * cs).toDouble
      }).forall(identity)
      Prop(ok && got.size == as.size * bs.size) :| s"grid vs oracle on $rows"
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  // random corpora: 1..12 docs with distinct ids and 1..5 words from a
  // 6-token alphabet (heavy type reuse so first-appearance ranks matter)
  private val growthCorpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    ids <- Gen.pick(n, 1L to 40L)
    texts <- Gen.listOfN(n, for {
      m <- Gen.choose(1, 5)
      ws <- Gen.listOfN(m, Gen.choose(0, 5).map(i => s"w$i"))
    } yield ws.mkString(" "))
  } yield ids.toSeq.zip(texts)

  test("q232 vocab-growth property: every decile row equals brute-force " +
    "prefix distinct-counting over the doc_id order on random corpora") {
    val prop = Prop.forAllNoShrink(growthCorpusGen) { docs =>
      val d = docs.size.toLong
      val ordered = docs.sortBy(_._1)
      def vocabAt(prefix: Int): Long = ordered.take(prefix)
        .flatMap(_._2.trim.split("\\s+")).distinct.size.toLong
      val expected = (1L to 10L).map { k =>
        val cut = ((k * d + 9) / 10).toInt
        val prev = (((k - 1) * d + 9) / 10).toInt
        (k, cut.toLong, vocabAt(cut),
          if (k == 1L) vocabAt(cut) else vocabAt(cut) - vocabAt(prev))
      }
      import spark.implicits._
      val got = TextOps.vocabGrowthOn(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      graft.CachedFrames.drain()
      Prop(got == expected) :| s"growth on $docs: $got vs $expected"
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }
}

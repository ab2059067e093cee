package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{DedupOps, GraphOps, SetJoinOps, SpatialOps, TemporalOps, TextOps, TrafficOps}

/** Property-based invariants (SURVEY §5.3) over generated data:
  * partition-slice aggregate consistency, interval-join containment,
  * disjunctive-join equivalence to its naive semantics, and
  * minhash/jaccard/quality algebraic laws.
  *
  * Spark round-trips are expensive, so each property runs a reduced
  * sample count; generators are small but adversarial (empty strings,
  * single tokens, duplicate keys).
  */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val genEvent: Gen[(Long, Int, Double)] = for {
    id <- Gen.choose(0L, 999L)
    hour <- Gen.choose(0, 23)
    v <- Gen.choose(0.0, 250.0)
  } yield (id, hour, v)

  property("hourly counts over disjoint slices sum to the unpartitioned total") =
    forAll(Gen.listOfN(60, genEvent)) { rows =>
      val df = rows.toDF("id", "hour", "value")
      val whole = TrafficOps.hourlyCount(df, col("hour").cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val slices = Seq(df.filter(col("hour") < 8),
        df.filter(col("hour").between(8, 15)), df.filter(col("hour") > 15))
      val unioned = TrafficOps.hourlyCount(slices.reduce(_ unionAll _),
          col("hour").cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      whole == unioned
    }

  private val genPair: Gen[(Long, Long)] =
    for { k <- Gen.choose(0L, 20L); v <- Gen.choose(0L, 100L) } yield (k, v)

  property("interval join is a subset of the pure equi join") =
    forAll(Gen.listOfN(30, genPair), Gen.listOfN(10, genPair)) { (ls, rs) =>
      val l = ls.toDF("lk", "lv")
      val r = rs.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("rk", "rv", "rid")
      val band = TrafficOps.intervalJoin(l, r, "lk", "rk",
          l("lv"), r("rv"), r("rv") + 20)
        .select(col("lk"), col("lv"), col("rid"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      val equi = l.join(r, l("lk") === r("rk"))
        .select(col("lk"), col("lv"), col("rid"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      band.subsetOf(equi)
    }

  property("banded interval join equals the residual form on skewed plates") =
    forAll(
      // points: one hot plate (the SURVEY §4.3 fleet-plate hazard) plus
      // a sparse tail; NULL-free keys, ts in seconds
      Gen.listOfN(40, for {
        k <- Gen.frequency(5 -> Gen.const(7L), 1 -> Gen.choose(0L, 10L))
        sec <- Gen.choose(0L, 3000L)
      } yield (k, sec)),
      // intervals: [lo, lo+len] with len spanning 0..900 s so intervals
      // cover zero, one, and many bands; includes the hot key
      Gen.listOfN(12, for {
        k <- Gen.frequency(3 -> Gen.const(7L), 1 -> Gen.choose(0L, 10L))
        lo <- Gen.choose(0L, 3000L)
        len <- Gen.choose(0L, 900L)
      } yield (k, lo, lo + len)),
      Gen.choose(60L, 600L)) { (ps, ivs, band) =>
      val points = ps.zipWithIndex
        .map { case ((k, s), i) => (k, tsOf(s), i.toLong) }
        .toDF("pk", "pts", "pid")
      val intervals = ivs.zipWithIndex
        .map { case ((k, lo, hi), i) => (k, tsOf(lo), tsOf(hi), i.toLong) }
        .toDF("ik", "lo", "hi", "iid")
      def pairs(df: DataFrame) =
        df.select(col("pid"), col("iid")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val residual = pairs(TrafficOps.intervalJoin(points, intervals,
        "pk", "ik", points("pts"), intervals("lo"), intervals("hi")))
      val banded = pairs(TrafficOps.intervalJoinBanded(points, intervals,
        "pk", "ik", points("pts"), intervals("lo"), intervals("hi"), band))
      banded == residual
    }

  property("disjunctive-key join matches naive OR-predicate semantics") =
    forAll(Gen.listOfN(25, genPair), Gen.listOfN(8, genPair)) { (ls, rs) =>
      val l = ls.toDF("lk", "lv")
      val r = rs.toDF("k1", "k2")
      val got = TrafficOps.disjunctiveKeyJoin(l, r, "lk", "k1", "k2",
          Seq("lk", "k1"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val want = (for {
        (lk, _) <- ls; (k1, k2) <- rs if lk == k1 || lk == k2
      } yield (lk, k1)).toSet
      got == want
    }

  property("salted equi join equals the plain equi join (incl. hot keys)") =
    forAll(Gen.listOfN(40, for {
      k <- Gen.frequency(5 -> Gen.const(7L), 1 -> Gen.choose(0L, 10L)) // skewed
      id <- Gen.choose(0L, 1000L)
    } yield (k, id)), Gen.listOfN(10, genPair)) { (ls, rs) =>
      val big = ls.toDF("k", "id")
      val small = rs.toDF("rk", "rv")
      val salted = TrafficOps.saltedEquiJoin(big, small, "k", "rk",
          col("id"), salts = 4)
        .select(col("k"), col("id"), col("rv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      val plain = big.join(small, big("k") === small("rk"))
        .select(col("k"), col("id"), col("rv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      salted == plain
    }

  property("salted equi join keeps rows whose salt source is NULL") =
    forAll(Gen.listOfN(30, for {
      k <- Gen.choose(0L, 5L)
      id <- Gen.option(Gen.choose(0L, 1000L)) // None → NULL salt source
    } yield (k, id)), Gen.listOfN(10, genPair)) { (ls, rs) =>
      val big = ls.toDF("k", "id")
      val small = rs.toDF("rk", "rv")
      def multiset(df: DataFrame): Map[String, Int] =
        df.select(col("k"), col("id"), col("rv")).collect()
          .map(_.toString).groupBy(identity).view.mapValues(_.length).toMap
      multiset(TrafficOps.saltedEquiJoin(big, small, "k", "rk",
        col("id"), salts = 4)) ==
        multiset(big.join(small, big("k") === small("rk")))
    }

  private val genDoc: Gen[String] = for {
    n <- Gen.choose(DedupOps.ShingleK, 30)
    toks <- Gen.listOfN(n, Gen.oneOf("the", "a", "table", "row", "scan",
      "query", "join", "hash", "merge", "sort", "batch", "stream"))
  } yield toks.mkString(" ")

  property("minhash signature is deterministic and identical docs collide in every band") =
    forAll(genDoc) { text =>
      val df = Seq((0L, text), (1L, text)).toDF("doc_id", "text")
      val sigs = DedupOps.signatures(df).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val buckets = DedupOps.lshBuckets(df)
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSet).toMap
      sigs(0L) == sigs(1L) && sigs(0L).length == DedupOps.NumHashes &&
        buckets(0L) == buckets(1L) && buckets(0L).size == DedupOps.Bands
    }

  property("hashed-shingle jaccard: self = 1, bounded in [0,1], symmetric") =
    forAll(genDoc, genDoc) { (ta, tb) =>
      val c = Seq((0L, ta), (1L, tb)).toDF("doc_id", "text")
      val pairs = Seq((0L, 1L), (0L, 0L)).toDF("id_a", "id_b")
      val j = DedupOps.jaccardVerify(c, pairs, threshold = -1.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val cross = j((0L, 1L))
      j((0L, 0L)) == 1.0 && cross >= 0.0 && cross <= 1.0 &&
        (ta != tb || cross == 1.0)
    }

  property("quality score stays within [0, 1] and ratios are valid") =
    forAll(genDoc) { text =>
      val base = TextOps.qualitySpark("text").foldLeft(
        Seq((0L, text)).toDF("doc_id", "text")) {
        case (df, (n, e)) => df.withColumn(n, expr(e))
      }
      val r = base.select(expr(TextOps.qualityScoreExpr).as("q"),
        col("stop_ratio"), col("uniq_ratio")).collect().head
      val (q, sr, ur) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      q >= 0.0 && q <= 1.0 && sr >= 0.0 && sr <= 1.0 && ur > 0.0 && ur <= 1.0
    }

  private def tsOf(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private val genTimed: Gen[(Long, Long)] = for {
    k <- Gen.choose(0L, 4L)       // few keys → many per-key collisions
    sec <- Gen.choose(0L, 2000L)
  } yield (k, sec)

  property("asofJoin equals the naive max-right-ts-per-left-row semantics") =
    forAll(Gen.listOfN(25, genTimed), Gen.listOfN(15, genTimed)) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, s), i) => (k, tsOf(s), i.toLong) }
        .toDF("k", "ts", "lid")
      // uniqueness contract: one right row per (k, ts), payload = max rid
      val rUniq = rs.zipWithIndex
        .map { case ((k, s), i) => ((k, s), i.toLong) }
        .groupBy(_._1).map { case ((k, s), xs) => (k, s, xs.map(_._2).max) }
        .toSeq
      val right = rUniq.map { case (k, s, rid) => (k, tsOf(s), rid) }
        .toDF("k", "ts", "rid")
      val got = TemporalOps.asofJoin(left, right, "k", "ts")
        .select(col("lid"), col("asof_rid"))
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toMap
      val want = ls.zipWithIndex.map { case ((k, s), i) =>
        val cands = rUniq.filter(r => r._1 == k && r._2 <= s)
        i.toLong -> (if (cands.isEmpty) None
                     else Some(cands.maxBy(r => (r._2, r._3))._3))
      }.toMap
      got == want
    }

  property("forward asofJoin equals the naive min-right-ts-per-left-row semantics") =
    forAll(Gen.listOfN(25, genTimed), Gen.listOfN(15, genTimed)) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, s), i) => (k, tsOf(s), i.toLong) }
        .toDF("k", "ts", "lid")
      val rUniq = rs.zipWithIndex
        .map { case ((k, s), i) => ((k, s), i.toLong) }
        .groupBy(_._1).map { case ((k, s), xs) => (k, s, xs.map(_._2).max) }
        .toSeq
      val right = rUniq.map { case (k, s, rid) => (k, tsOf(s), rid) }
        .toDF("k", "ts", "rid")
      val got = TemporalOps.asofJoin(left, right, "k", "ts", forward = true)
        .select(col("lid"), col("asof_rid"))
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toMap
      // forward truth: EARLIEST right at-or-after (ties on ts break by
      // the same (ts, rid) order the operator's first() sees — rid is
      // unique per (k, ts) by the pre-aggregation, so minBy on ts alone
      // is already total)
      val want = ls.zipWithIndex.map { case ((k, s), i) =>
        val cands = rUniq.filter(r => r._1 == k && r._2 >= s)
        i.toLong -> (if (cands.isEmpty) None
                     else Some(cands.minBy(_._2)._3))
      }.toMap
      got == want
    }

  property("neighborCounts equals the brute-force pair count") =
    forAll(Gen.listOfN(30, Gen.choose(0L, 3000L)),
           Gen.choose(60L, 900L)) { (secs0, win) =>
      val secs = secs0.zipWithIndex
      val df = secs.map { case (s, i) => (i.toLong, tsOf(s)) }.toDF("id", "ts")
      val got = TemporalOps.neighborCounts(df, "id", "ts", win)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = (for {
        (a, i) <- secs; (b, j) <- secs
        if i != j && math.abs(a - b) <= win
      } yield i.toLong).groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
      got == want
    }

  property("sessionize: per-key session count = 1 + #gaps above threshold") =
    forAll(Gen.listOfN(30, genTimed), Gen.choose(10L, 500L)) { (es, gap) =>
      val df = es.zipWithIndex
        .map { case ((k, s), i) => (k, tsOf(s), i.toLong) }
        .toDF("user_id", "ts", "event_id")
      val got = TemporalOps.sessionize(df, "user_id", "ts", "event_id", gap)
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = es.groupBy(_._1).map { case (k, xs) =>
        val sorted = xs.map(_._2).sorted
        k -> (1L + sorted.zip(sorted.tail).count { case (a, b) => b - a > gap })
      }
      got == want
    }

  property("top_k_ids equals sort-take-k under the same total order") =
    forAll(Gen.listOfN(40, for {
      sc <- Gen.choose(0.0, 10.0); i <- Gen.choose(0L, 30L)
      t <- Gen.choose(0L, 5L)
    } yield (sc, i, t)), Gen.choose(1, 8)) { (rows, k) =>
      val df = rows.toDF("s", "i", "t").repartition(3)
      val got = df.agg(expr(s"top_k_ids(s, i, t, $k)"))
        .head.getSeq[Long](0).toList
      val want = rows.sortBy { case (sc, i, t) => (-sc, i, t) }
        .take(k).map(_._2)
      got == want
    }

  property("simhash of identical docs is identical; hamming to a permuted doc is small") =
    forAll(genDoc) { text =>
      val permuted = text.split(' ').reverse.mkString(" ")
      val df = Seq((0L, text), (1L, text), (2L, permuted)).toDF("doc_id", "text")
      val sh = TextOps.simhashSpark(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // simhash is order-independent (bag of tokens): permutation is exact
      sh(0L) == sh(1L) && sh(0L) == sh(2L) &&
        sh(0L) >= 0 && sh(0L) < (1L << TextOps.SimhashBits)
    }

  // The q91 oracle mirrors the SAME generated interleave formula in both
  // dialects, so a systematic formula bug would pass the oracle compare.
  // This property checks the semantics independently: deinterleaving the
  // Spark-computed z in plain Scala must recover exactly (cx, cy).
  property("z-interleave is a bijection: Scala deinterleave recovers both cells") =
    forAll(Gen.listOfN(12,
      Gen.zip(Gen.choose(0L, 255L), Gen.choose(0L, 255L)))) { cells =>
      val rows = cells.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      val got = rows.toDF("id", "cx", "cy")
        .select(col("id"), col("cx"), col("cy"),
          expr(graft.operators.LayoutOps.interleaveSpark("cx", "cy", 8)).as("z"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      got.forall { case (cx, cy, z) =>
        val dx = (0 until 8).map(i => ((z >> (2 * i)) & 1L) << i).sum
        val dy = (0 until 8).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
        z >= 0 && z < (1L << 16) && dx == cx && dy == cy
      }
    }

  property("sharded running sum is bit-identical to the single-window sum") =
    forAll(
      Gen.listOfN(60, for {
        g <- Gen.oneOf("en", "de", "fr")
        id <- Gen.choose(0L, 500L)
        v <- Gen.choose(0L, 300L)
      } yield (g, id, v)),
      Gen.choose(1L, 64L)) { (rows, span) =>
      // order key must be total per group: keep one row per (lang, id)
      val data = rows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val df = data.toDF("lang", "doc_id", "n_tokens")
        .withColumn("shard", expr(s"doc_id DIV $span"))
      val sharded = graft.operators.ShardedWindows
        .runningSum(df, "lang", "shard", Seq(col("doc_id")), "n_tokens", "cum")
        .select(col("lang"), col("doc_id"), col("cum"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val plain = df.withColumn("cum", sum(col("n_tokens")).over(w))
        .select(col("lang"), col("doc_id"), col("cum"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      sharded == plain
    }

  // ---- Misra-Gries sketch laws (q100) ------------------------------------
  // plain-JVM (no Spark round-trip): adversarial streams mixing a small
  // head with a wide tail, arbitrary capacities and split points
  private val genMgStream: Gen[(List[String], Int)] = for {
    cap <- Gen.choose(2, 40)
    n <- Gen.choose(0, 400)
    toks <- Gen.listOfN(n, Gen.frequency(
      3 -> Gen.choose(0, 4).map(i => s"h$i"),      // heavy head
      2 -> Gen.choose(0, 5000).map(i => s"t$i")))  // sparse tail
  } yield (toks, cap)

  private def mgLaws(b: graft.functions.MgSketch.Buf,
                     toks: List[String], cap: Int): Prop = {
    val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val errBound = if (toks.isEmpty) 0L else toks.size.toLong / (cap + 1)
    def est(t: String): Long =
      Option(b.counts.get(t)).map(_.longValue).getOrElse(0L)
    Prop.all(
      Prop(b.err <= errBound) :| s"err ${b.err} > n/(cap+1) $errBound",
      Prop(b.counts.size <= 2 * cap) :| "state exceeds 2*cap",
      Prop(truth.forall { case (t, n) => est(t) <= n }) :| "overcount",
      Prop(truth.forall { case (t, n) => n - est(t) <= b.err }) :|
        "undercount beyond err",
      // the screen guarantee q100's exactness rests on
      Prop(truth.forall { case (t, n) =>
        n <= b.err || b.counts.containsKey(t) }) :| "heavy key evicted")
  }

  property("Misra-Gries buffer keeps the classic MG guarantees") =
    forAll(genMgStream) { case (toks, cap) =>
      val b = new graft.functions.MgSketch.Buf(cap)
      toks.foreach(t => b.add(t, 1L))
      mgLaws(b, toks, cap)
    }

  // adversarial key strings: tiny alphabet (forces shared deletion
  // variants), lengths 0-6 (empty string, single chars), duplicates
  private val genKeyStr: Gen[String] = for {
    n <- Gen.choose(0, 6)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  property("editPairs equals brute-force levenshtein<=1 over all distinct name pairs") =
    forAll(Gen.listOfN(25, genKeyStr)) { names =>
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val keys = names.zipWithIndex.map { case (nm, i) => (i.toLong, nm) }
      val got = DedupOps.editPairs(keys.toDF("id", "nm"), "id", "nm")
        .select("name_a", "name_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val distinctNames = names.distinct
      val want = (for {
        a <- distinctNames; b <- distinctNames
        if a < b && lev(a, b) <= 1
      } yield (a, b)).toSet
      Prop(got == want) :| s"got=$got want=$want"
    }

  // random undirected graphs incl. self-loops, multi-edges (the operator
  // dedups), and isolated-pair components
  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 12)
    m <- Gen.choose(1, 24)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong - 1); b <- Gen.choose(0L, n.toLong - 1)
    } yield (a, b))
  } yield es

  property("integerPageRank equals the exact in-memory integer recurrence") =
    forAll(genEdges, Gen.choose(1, 4)) { (es, iters) =>
      val scale = 1000000L
      val sym = (es ++ es.map(_.swap)).distinct
      val want: Map[Long, Long] = {
        val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
        val base = 15L * scale / 100L
        var pr = deg.keys.map(_ -> scale).toMap
        for (_ <- 1 to iters) {
          val inbound = sym.groupBy(_._2).map { case (v, in) =>
            v -> in.map { case (u, _) => pr(u) / deg(u) }.sum }
          pr = deg.keys.map(v => v -> (base + 85L * inbound.getOrElse(v, 0L) / 100L)).toMap
        }
        pr
      }
      val got = GraphOps
        .integerPageRank(sym.toDF("src", "dst"), iters, scale)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Prop(got == want) :| s"got=$got want=$want iters=$iters"
    }

  property("Misra-Gries merge preserves the guarantees at any split") =
    forAll(genMgStream, Gen.choose(0, 400)) { case ((toks, cap), cut0) =>
      val cut = if (toks.isEmpty) 0 else cut0 % (toks.size + 1)
      val (a, rest) = toks.splitAt(cut)
      val ba = new graft.functions.MgSketch.Buf(cap)
      val bb = new graft.functions.MgSketch.Buf(cap)
      a.foreach(t => ba.add(t, 1L))
      rest.foreach(t => bb.add(t, 1L))
      ba.err += bb.err // the aggregate's merge path
      bb.counts.forEach((t, c) => ba.add(t, c.longValue))
      mgLaws(ba, toks, cap)
    }

  // random tiny corpora over a vocabulary that intersects the CMS probe
  // watchlist (so true counts are nonzero sometimes) plus junk tokens
  private val genCorpusDoc: Gen[(Long, String, String)] = for {
    id <- Gen.choose(0L, 999L)
    src <- Gen.oneOf("s0", "s1", "s2")
    n <- Gen.choose(0, 12)
    toks <- Gen.listOfN(n, Gen.oneOf(
      "the", "a", "table", "row", "join", "zz", "qq", "ww"))
  } yield (id, src, toks.mkString(" "))

  property("CMS one-sided bound: est >= true for every probe on any corpus") =
    forAll(Gen.listOfN(12, genCorpusDoc)) { docs =>
      val df = docs.toDF("doc_id", "source", "text")
      // the in-plan assert_true raises on violation, so a clean collect
      // IS the property; cross-check the arithmetic relation anyway
      val rows = LlmEntry.cmsPlanOn(spark, df).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      Prop(rows.forall { case (_, t, e, over) => e >= t && over == e - t }) :|
        rows.mkString(",")
    }

  property("frequency spectrum conserves both type and token mass") =
    forAll(Gen.listOfN(12, genCorpusDoc)) { docs =>
      val df = docs.toDF("doc_id", "source", "text")
      val toks = df.select(explode(expr(TextOps.tokensSpark("text"))).as("t"))
      val total = toks.count()
      val vocab = toks.distinct().count()
      val rows = df
        .select(explode(expr(TextOps.tokensSpark("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .groupBy(expr("CAST(length(bin(cnt)) AS BIGINT)").as("b"))
        .agg(count(lit(1)).as("n_types"), sum(col("cnt")).as("n_tokens"),
          min(col("cnt")).as("mn"), max(col("cnt")).as("mx"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      val typesOk = rows.map(_._2).sum == vocab
      val tokensOk = rows.map(_._3).sum == total
      // every bucket's min/max counts really have that bit length
      val bucketOk = rows.forall { case (b, _, _, mn, mx) =>
        java.lang.Long.toBinaryString(mn).length == b &&
          java.lang.Long.toBinaryString(mx).length == b
      }
      Prop(typesOk && tokensOk && bucketOk) :| rows.mkString(",")
    }

  // degree-oriented triangle counting ≡ brute-force enumeration — on
  // random multigraphs WITH a planted hub (node 0 attached to every
  // other node), the adversarial case the orientation exists for; also
  // exercises self-loops and duplicate/reversed edges, which the
  // canonicalization must collapse
  private val genTriEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(4, 12)
    m <- Gen.choose(3, 30)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong - 1)
      b <- Gen.choose(0L, n.toLong - 1)
    } yield (a, b))
    hub <- Gen.someOf(1L until n.toLong)
  } yield es ++ hub.map(v => (0L, v))

  property("oriented triangle count equals brute force (hubs, dups, loops)") =
    forAll(genTriEdges) { es =>
      val simple = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.toSet
      val nodes = simple.flatMap(t => Seq(t._1, t._2)).toSeq.sorted
      val adj = nodes.map(v => v -> simple.toSeq.collect {
        case (a, b) if a == v => b
        case (a, b) if b == v => a
      }).toMap
      val want = nodes.map { v =>
        // unordered neighbor pairs (x < y) that are themselves an edge
        val tri = (for {
          x <- adj(v); y <- adj(v)
          if x < y && simple.contains((x, y))
        } yield 1).size
        v -> ((adj(v).size.toLong, tri.toLong))
      }.toMap
      val got = GraphOps.triangleCounts(
          es.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      Prop(got == want) :| s"got $got want $want"
    }

  // fixed-horizon k-core peel ≡ in-memory recurrence — on the same
  // adversarial multigraphs (hubs, dups, self-loops); k inside the
  // small-graph degree range so rounds genuinely remove nodes, horizon
  // 1–3 so mid-cascade states (not just fixpoints) are compared
  private val genCoreCase: Gen[(List[(Long, Long)], Long, Int)] = for {
    es <- genTriEdges
    k <- Gen.choose(1L, 4L)
    rounds <- Gen.choose(1, 3)
  } yield (es, k, rounds)

  property("fixed-horizon k-core peel equals in-memory recurrence") =
    forAll(genCoreCase) { case (es, k, rounds) =>
      var simple = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.toSet
      for (_ <- 1 to rounds) {
        val deg = simple.toSeq.flatMap(t => Seq(t._1, t._2))
          .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
        simple = simple.filter { case (a, b) => deg(a) >= k && deg(b) >= k }
      }
      val want = simple.toSeq.flatMap(t => Seq(t._1, t._2))
        .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
      val got = GraphOps.kCorePeel(es.toDF("src", "dst"), k, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Prop(got == want) :| s"k=$k rounds=$rounds got $got want $want"
    }

  // grid-banded spatial neighbor join ≡ brute-force all-pairs — on
  // point sets with NEGATIVE coordinates (floor- vs truncating-division
  // bucketing diverges exactly there), duplicate coordinates (d² = 0),
  // and cell-straddling near pairs; radius chosen small vs the
  // coordinate range so both empty and dense results occur, and the
  // closed-ball boundary (d² = r² matches) is exercised by the integer
  // grid making exact-radius pairs likely
  private val genPoints: Gen[(List[(Long, Long, Long)], Long)] = for {
    n <- Gen.choose(2, 25)
    r <- Gen.choose(1L, 12L)
    ps <- Gen.listOfN(n, for {
      x <- Gen.choose(-30L, 30L)
      y <- Gen.choose(-30L, 30L)
    } yield (x, y))
  } yield (ps.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }, r)

  property("grid neighbor join equals brute force (negatives, dups, boundary)") =
    forAll(genPoints) { case (pts, r) =>
      val want = (for {
        (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
        if ia < ib
        d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
        if d2 <= r * r
      } yield (ia, ib, d2)).toSet
      val got = SpatialOps.neighborPairs(pts.toDF("id", "x", "y"), r)
        .collect().map(row =>
          (row.getLong(0), row.getLong(1), row.getLong(2))).toSet
      Prop(got == want) :| s"r=$r got $got want $want"
    }

  // two-phase expanding-ring kNN join ≡ brute-force horizon rank — the
  // generator's density spread makes some probes settle on the ring-1
  // dense path (k-th within one cell) and others fall to the ring-R
  // sparse expansion, so the property exercises both paths, the union
  // seam, tie distances (duplicate coordinates), and negatives; cell
  // 0 exercises the density-derived auto-grid, explicit cells pin the
  // manual path — the answer must depend on (k, horizon) alone
  private val genKnn: Gen[(List[(Long, Long, Long)], Int, Long, Long)] = for {
    n <- Gen.choose(2, 22)
    k <- Gen.choose(1, 4)
    horizon <- Gen.choose(2L, 24L)
    cell <- Gen.oneOf(Gen.const(0L), Gen.choose(1L, horizon))
    ps <- Gen.listOfN(n, for {
      x <- Gen.choose(-20L, 20L)
      y <- Gen.choose(-20L, 20L)
    } yield (x, y))
  } yield (ps.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) },
    k, horizon, cell)

  property("kNN join equals brute-force horizon rank (both paths, ties)") =
    forAll(genKnn) { case (pts, k, horizon, cell) =>
      val h2 = horizon * horizon
      val want = pts.flatMap { case (i, x, y) =>
        pts.collect { case (j, xj, yj) if j != i &&
            (x - xj) * (x - xj) + (y - yj) * (y - yj) <= h2 =>
          (j, (x - xj) * (x - xj) + (y - yj) * (y - yj))
        }.sortBy { case (j, d2) => (d2, j) }.take(k)
          .zipWithIndex.map { case ((j, d2), r) => (i, j, d2, r + 1L) }
      }.toSet
      val df = pts.toDF("id", "x", "y")
      val got = SpatialOps.knnJoin(df, df, k, horizon, cell)
        .collect().map(row => (row.getLong(0), row.getLong(1),
          row.getLong(2), row.getLong(3))).toSet
      Prop(got == want) :| s"k=$k horizon=$horizon cell=$cell " +
        s"got $got want $want"
    }

  // grid point-in-polygon join ≡ brute-force ray parity — random vertex
  // lists are mostly NON-convex and often self-intersecting, which the
  // even-odd rule handles without caring; tiny cells vs polygon-sized
  // cells exercise multi-cell bbox covers vs single-cell ones, and the
  // coordinate ranges overlap so boundary/vertex hits occur
  private val genPip: Gen[(List[(Long, Long, Long)],
      List[(Long, List[(Long, Long)])], Long)] = for {
    np <- Gen.choose(1, 15)
    pts <- Gen.listOfN(np, for {
      x <- Gen.choose(-25L, 25L); y <- Gen.choose(-25L, 25L) } yield (x, y))
    npoly <- Gen.choose(1, 4)
    polys <- Gen.listOfN(npoly, for {
      nv <- Gen.choose(3, 8)
      vs <- Gen.listOfN(nv, for {
        x <- Gen.choose(-20L, 20L); y <- Gen.choose(-20L, 20L) } yield (x, y))
    } yield vs)
    cell <- Gen.choose(1L, 9L)
  } yield (pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) },
    polys.zipWithIndex.map { case (vs, i) => (i.toLong, vs) }, cell)

  property("point-in-polygon grid join equals brute-force ray parity") =
    forAll(genPip) { case (pts, polys, cell) =>
      def inside(px: Long, py: Long, vs: List[(Long, Long)]): Boolean = {
        val n = vs.size
        var k = 0
        for (i <- 0 until n) {
          val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % n)
          if ((y1 > py) != (y2 > py)) {
            val a = (px - x1) * (y2 - y1); val b = (py - y1) * (x2 - x1)
            if ((y2 > y1 && a < b) || (y2 < y1 && a > b)) k += 1
          }
        }
        k % 2 == 1
      }
      val want = (for {
        (pid, px, py) <- pts; (gid, vs) <- polys if inside(px, py, vs)
      } yield (pid, gid)).toSet
      val ptsDf = pts.toDF("id", "x", "y")
      val polysDf = polys.toDF("poly_id", "raw")
        .selectExpr("poly_id",
          "transform(raw, v -> struct(v._1 AS x, v._2 AS y)) AS vs")
      val got = SpatialOps.pointInPolygonJoin(ptsDf, polysDf, cell)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      Prop(got == want) :| s"cell=$cell got $got want $want"
    }

  // prefix-filtered set-similarity join ≡ brute-force Jaccard — the tiny
  // universe (10 elements) forces heavy overlap, df ties in the global
  // order, identical sets (J = 1), and subset/superset pairs; the
  // threshold grid includes t = 1 (only identical sets qualify, prefix
  // length collapses to 1) and t = 1/2 (long prefixes, many candidates)
  private val genSimSets: Gen[(List[(Long, Set[Long])], Long, Long)] = for {
    n <- Gen.choose(2, 12)
    t <- Gen.oneOf((1L, 2L), (3L, 5L), (2L, 3L), (1L, 1L))
    ss <- Gen.listOfN(n, Gen.nonEmptyListOf(Gen.choose(0L, 9L)).map(_.toSet))
  } yield (ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }, t._1, t._2)

  property("prefix-filtered set-similarity join equals brute-force jaccard") =
    forAll(genSimSets) { case (sets, tn, td) =>
      val want = (for {
        (ia, sa) <- sets; (ib, sb) <- sets
        if ia < ib
        ov = (sa & sb).size.toLong
        un = (sa | sb).size.toLong
        if td * ov >= tn * un
      } yield (ia, ib, ov, un)).toSet
      val df = sets.flatMap { case (i, s) => s.toList.map(e => (i, e)) }
        .toDF("set_id", "elem")
      val got = SetJoinOps.similarPairs(df, tn, td)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      Prop(got == want) :| s"t=$tn/$td got $got want $want"
    }
  // ---- r18: MODEL CHECK of the manifested table's tree resolver ----------
  //
  // The round's riskiest machinery — delta manifests with explicit
  // parent pointers, checkpoint sidecars, branch lineages, retire-on-
  // promote, vacuum fences — exercised by RANDOM commit sequences and
  // compared against a trivial in-memory model after every step. Any
  // resolution bug (wrong parent, lost fence, leaked branch commit,
  // resurrected row) shows up as a multiset mismatch.
  private sealed trait TOp
  private case class TAppend(lo: Long, n: Int) extends TOp
  private case class TDeleteBelow(k: Long, mor: Boolean) extends TOp
  private case class TOverwrite(lo: Long, n: Int) extends TOp
  private case class TBranchAppend(lo: Long, n: Int) extends TOp
  private case object TPromote extends TOp
  private case object TDropBranch extends TOp
  private case object TVacuum extends TOp
  private case object TCompact extends TOp
  private case object TCreateTag extends TOp
  private case object TDropTag extends TOp

  private val genTOp: Gen[TOp] = Gen.frequency(
    4 -> (for { lo <- Gen.choose(0L, 900L); n <- Gen.choose(1, 6) }
      yield TAppend(lo, n)),
    3 -> (for { k <- Gen.choose(0L, 950L); mor <- Gen.oneOf(true, false) }
      yield TDeleteBelow(k, mor)),
    1 -> (for { lo <- Gen.choose(0L, 900L); n <- Gen.choose(1, 6) }
      yield TOverwrite(lo, n)),
    3 -> (for { lo <- Gen.choose(0L, 900L); n <- Gen.choose(1, 6) }
      yield TBranchAppend(lo, n)),
    2 -> Gen.const(TPromote),
    1 -> Gen.const(TDropBranch),
    2 -> Gen.const(TVacuum),
    2 -> Gen.const(TCompact),
    2 -> Gen.const(TCreateTag),
    1 -> Gen.const(TDropTag))

  property("manifested table: random commit trees match the in-memory model") =
    forAll(Gen.listOfN(8, genTOp)) { ops =>
      import graft.sources.{ConcurrentWriteException, ManifestedTable}
      val d = java.nio.file.Files.createTempDirectory("graft_prop").toString
      def df(lo: Long, n: Int) =
        (lo until lo + n).map(k => (k, s"s$k")).toDF("k", "s")
      ManifestedTable.write(df(0L, 4), d) // seed
      var main: Vector[Long] = (0L until 4L).toVector
      var branch: Option[Vector[Long]] = None
      var mainMovedSinceFork = false
      // one optional tag: (tagged version, its row image) — must stay
      // readable through EVERYTHING below, vacuum included
      var tag: Option[(Long, Vector[Long])] = None
      def readKeys(r: DataFrame): Vector[Long] =
        r.select("k").collect().map(_.getLong(0)).toVector.sorted
      val ok = ops.forall { op =>
        op match {
          case TAppend(lo, n) =>
            ManifestedTable.write(df(lo, n), d, overwrite = false)
            main = main ++ (lo until lo + n)
            if (branch.isDefined) mainMovedSinceFork = true
          case TOverwrite(lo, n) =>
            ManifestedTable.write(df(lo, n), d)
            main = (lo until lo + n).toVector
            if (branch.isDefined) mainMovedSinceFork = true
          case TDeleteBelow(k, mor) =>
            if (main.nonEmpty) {
              ManifestedTable.deleteWhere(spark, d, col("k") < k,
                dvMaxFraction = if (mor) 1.0 else 0.0)
              val before = main.size
              main = main.filter(_ >= k)
              if (main.size != before && branch.isDefined)
                mainMovedSinceFork = true
            }
          case TBranchAppend(lo, n) =>
            ManifestedTable.writeBranch(df(lo, n), d, "b")
            branch = Some(branch.getOrElse {
              mainMovedSinceFork = false
              main
            } ++ (lo until lo + n))
          case TPromote =>
            if (branch.isDefined) {
              if (mainMovedSinceFork) {
                Prop.throws(classOf[ConcurrentWriteException]) {
                  ManifestedTable.promoteBranch(spark, d, "b")
                }
                // a refused promote keeps the branch stageable
              } else {
                ManifestedTable.promoteBranch(spark, d, "b")
                main = branch.get
                branch = None
              }
            }
          case TDropBranch =>
            if (branch.isDefined) {
              ManifestedTable.dropBranch(spark, d, "b")
              branch = None
            }
          case TVacuum =>
            ManifestedTable.vacuum(spark, d, keepLast = 2,
              minAgeMillis = 0L)
          case TCreateTag =>
            if (tag.isEmpty && main.nonEmpty) {
              val tv = ManifestedTable.createTag(spark, d, "pin")
              tag = Some((tv, main))
            }
          case TDropTag =>
            if (tag.isDefined) {
              ManifestedTable.dropTag(spark, d, "pin")
              tag = None
            }
          case TCompact =>
            // content-preserving main rewrite (materializes DVs away);
            // a branch open across it makes a later promote
            // non-fast-forward only if compaction actually committed
            val v0 = ManifestedTable.currentVersion(spark, d)
            ManifestedTable.compact(spark, d, 1L << 30)
            if (branch.isDefined &&
                ManifestedTable.currentVersion(spark, d) != v0)
              mainMovedSinceFork = true
        }
        val mainOk =
          if (main.isEmpty)
            // a full merge-on-read delete legitimately keeps the FILES
            // (every row DV'd out) — emptiness is about ROWS
            ManifestedTable.currentFiles(spark, d).isEmpty ||
              readKeys(ManifestedTable.read(spark, d)).isEmpty
          else readKeys(ManifestedTable.read(spark, d)) == main.sorted
        val branchOk = branch.forall(b =>
          readKeys(ManifestedTable.readBranch(spark, d, "b")) == b.sorted)
        // ref-scoped retention: the tagged version's full image stays
        // readable whatever vacuumed/compacted/promoted since
        val tagOk = tag.forall { case (tv, keys) =>
          readKeys(ManifestedTable.readAt(spark, d, tv)) == keys.sorted }
        mainOk && branchOk && tagOk
      }
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(d))
      ok
    }

}

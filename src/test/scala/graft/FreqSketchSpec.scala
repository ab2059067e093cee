package graft

import org.apache.spark.sql.functions._
import graft.functions.MgSketch

/** The Misra-Gries heavy-hitters sketch ([[graft.functions.MgSketch]]):
  * the buffer must honor the classic MG guarantees under the batched
  * purge and k-bounded merges, and the q100 screen-then-rescan pattern
  * must return the EXACT top-k whenever the guarantee condition holds.
  * The fixture vocabulary (31 words) never triggers a purge, so these
  * tests drive wide synthetic vocabularies through the real aggregate.
  */
class FreqSketchSpec extends SparkTestBase {
  import spark.implicits._

  /** Zipf-ish stream: heavy tokens h0..h9 with huge counts, plus a
    * long tail of singletons — vocabulary far above the capacity.
    */
  private def zipfStream(tail: Int): Seq[String] = {
    val heavy = (0 until 10).flatMap(i => Seq.fill((10 - i) * 500)(s"h$i"))
    val singles = (0 until tail).map(i => s"t$i")
    // worst-case-ish order for MG: tail interleaved after the heavies
    heavy ++ singles
  }

  test("buffer: MG invariant and err bound on a wide-vocab stream") {
    val cap = 64
    val buf = new MgSketch.Buf(cap)
    val stream = zipfStream(tail = 20000)
    stream.foreach(t => buf.add(t, 1L))
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong)
    // err is bounded by n/(cap+1)
    assert(buf.err <= stream.size / (cap + 1),
      s"err=${buf.err} n=${stream.size}")
    // estimate never exceeds truth; undercount bounded by err
    trueCounts.foreach { case (t, n) =>
      val est = Option(buf.counts.get(t)).map(_.longValue).getOrElse(0L)
      assert(est <= n, s"$t overcounted: est=$est true=$n")
      assert(n - est <= buf.err, s"$t undercount ${n - est} > err=${buf.err}")
    }
    // state bound held throughout (checked post-hoc: ≤ 2·cap)
    assert(buf.counts.size <= 2 * cap)
    // every token with true count > err survived
    trueCounts.filter(_._2 > buf.err).keys.foreach { t =>
      assert(buf.counts.containsKey(t), s"heavy $t missing from sketch")
    }
  }

  test("merge preserves the invariant across many partial buffers") {
    val cap = 32
    val stream = zipfStream(tail = 8000)
    val parts = stream.grouped(500).toSeq
    val bufs = parts.map { p =>
      val b = new MgSketch.Buf(cap); p.foreach(t => b.add(t, 1L)); b
    }
    val merged = bufs.reduce { (a, b) =>
      // merge via the aggregate's path: err sums, counts re-add
      a.err += b.err
      b.counts.forEach((t, c) => a.add(t, c.longValue))
      a
    }
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong)
    assert(merged.err <= stream.size / (cap + 1))
    trueCounts.foreach { case (t, n) =>
      val est = Option(merged.counts.get(t)).map(_.longValue).getOrElse(0L)
      assert(est <= n && n - est <= merged.err, s"$t est=$est true=$n")
    }
  }

  test("q100 pattern: sketch screen + exact rescan equals plain exact top-k") {
    val stream = zipfStream(tail = 5000)
    // shuffle deterministically so heavies spread across partitions
    val df = new scala.util.Random(7).shuffle(stream).toDF("tok")
      .repartition(8) // force real partial/merge/serialize boundaries
    val cands = df.agg(expr("mg_sketch(tok, 256)").as("sk"))
      .select(explode(col("sk.terms")).as("tok"))
    val screened = df.join(broadcast(cands), "tok")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    val exact = df.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(screened === exact)
    // and the guarantee condition that makes this exactness provable
    // (not a fixture accident): k-th count clears the theoretical bound
    assert(exact.last._2 > stream.size / 257L)
  }

  test("sketch output is estimate-ordered and carries the err bound") {
    val df = Seq.fill(100)("a") ++ Seq.fill(50)("b") ++ Seq.fill(2)("c")
    val row = df.toDF("tok").coalesce(1)
      .agg(expr("mg_sketch(tok, 16)")).head.getStruct(0)
    // vocab below capacity: no purge, err = 0, full exact contents
    assert(row.getSeq[String](0).toList === List("a", "b", "c"))
    assert(row.getLong(1) === 0L)
  }

  test("grouped mg_sketch: per-group buffers screen each group exactly") {
    // groupBy exercises the OTHER aggregate runtime path — a buffer per
    // group, per-group serialize across the shuffle — with skew between
    // groups (one wide-vocab group forcing purges, one tiny exact group)
    val wide = zipfStream(tail = 4000).map(("wide", _))
    val tiny = (Seq.fill(30)("a") ++ Seq.fill(7)("b")).map(("tiny", _))
    val df = new scala.util.Random(11).shuffle(wide ++ tiny)
      .toDF("grp", "tok").repartition(8)
    val sk = df.groupBy(col("grp")).agg(expr("mg_sketch(tok, 128)").as("sk"))
      .collect().map(r => r.getString(0) -> r.getStruct(1)).toMap
    // tiny group: under capacity → exact contents, zero err
    assert(sk("tiny").getSeq[String](0).toList === List("a", "b"))
    assert(sk("tiny").getLong(1) === 0L)
    // wide group: the screen guarantee holds within ITS stream only
    val wideTruth = wide.groupBy(_._2).view.mapValues(_.size.toLong)
    val err = sk("wide").getLong(1)
    assert(err <= wide.size.toLong / 129)
    val surviving = sk("wide").getSeq[String](0).toSet
    wideTruth.filter(_._2 > err).keys.foreach { t =>
      assert(surviving(t), s"heavy $t missing from wide group's sketch")
    }
  }

  test("q100's runtime guard raises on a distribution too flat to certify") {
    // the q100 query shape with a tiny capacity against all-singleton
    // tokens: no count can clear err, so the assert_true guard must
    // raise instead of returning a plausible-looking wrong "exact" top-k
    val df = (0 until 3000).map(i => s"t$i").toDF("tok").repartition(4)
    val cands = df.agg(expr("mg_sketch(tok, 16)").as("sk"))
      .select(explode(col("sk.terms")).as("tok"), col("sk.err").as("err"))
    val guarded = df.join(broadcast(cands), "tok")
      .groupBy(col("tok"), col("err")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(10)
      .where(isnull(expr("assert_true(cnt > err, 'uncertifiable')")))
      .select(col("tok"), col("cnt"))
    val e = intercept[Exception] { guarded.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(_.contains("uncertifiable"))),
      s"expected the guard's message in: $e")
  }

  test("failure mode is visible: sub-err tokens may vanish, err says so") {
    // adversarial: all tokens tie at count 1 with vocab >> cap — no
    // token is guaranteed a slot, and err reflects that honestly
    val df = (0 until 3000).map(i => s"t$i").toDF("tok").repartition(4)
    val row = df.agg(expr("mg_sketch(tok, 16)")).head.getStruct(0)
    assert(row.getLong(1) > 0L)           // purges happened
    assert(row.getSeq[String](0).size <= 32) // state bound held to eval
  }

  test("capacity must be a positive integer literal (analysis-time error)") {
    val df = Seq("a").toDF("tok")
    for (c <- Seq("0", "-4", "2147483648L"))
      assertThrows[org.apache.spark.sql.AnalysisException] {
        df.agg(expr(s"mg_sketch(tok, $c)")).collect()
      }
  }

  test("nulls are skipped, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("tok")
    val row = df.agg(expr("mg_sketch(tok, 8)")).head.getStruct(0)
    assert(row.getSeq[String](0).toList === List("a"))
  }
}

package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Compares two `bench_result.json` files (Bench's full-precision format,
  * which records every raw run per query) and reports which per-query
  * changes are REAL under the instrument's own noise — the operational
  * answer to three rounds of 2-4× phantom swings (VERDICT r6-r8): a
  * point-estimate ratio can't distinguish a regression from host
  * contention, but two disjoint run distributions can.
  *
  * Decision rule, per query: a change is significant only when the run
  * ranges are disjoint by a margin — regression if `new.min > old.max ×
  * margin`, improvement if `new.max < old.min ÷ margin` (default margin
  * 1.30). With 3 runs a side this is deliberately conservative: every
  * observed old run must be faster than every observed new run by 30%
  * before we call it a regression. Everything else is "within noise" —
  * which is a finding too: it's what makes "no regression" claimable.
  *
  * Usage: `runMain graft.BenchDiff old.json new.json [margin]`. Prints
  * one JSON line; exit code 1 iff any regression is flagged, so the diff
  * can gate a CI step.
  */
object BenchDiff {
  final case class Stats(median: Double, min: Double, max: Double)

  private[graft] def queryStats(root: JsonNode): Map[String, Stats] = {
    val qs = root.path("queries")
    qs.properties().asScala.map { e =>
      val v = e.getValue
      e.getKey -> Stats(v.path("median").asDouble(-1),
        v.path("min").asDouble(-1), v.path("max").asDouble(-1))
    }.toMap
  }

  /** Best single-thread canary time of a run, if the artifact has one
    * (Bench emits `canary.single_s` as [start, end]; min = the least
    * contended moment of the session).
    */
  private[graft] def canarySingleMin(root: JsonNode): Option[Double] = {
    val arr = root.path("canary").path("single_s")
    if (!arr.isArray || arr.isEmpty) None
    else Some(arr.asScala.map(_.asDouble(Double.MaxValue)).min)
      .filter(_ > 0).filter(_ < Double.MaxValue)
  }

  sealed trait Verdict
  case object Regression extends Verdict
  case object Improvement extends Verdict
  case object WithinNoise extends Verdict
  case object NewlyErrored extends Verdict // ran before, errors now
  case object Recovered extends Verdict    // errored before, runs now

  /** Disjoint-range test: only the run envelopes decide, never the
    * medians alone — medians of overlapping distributions are noise.
    * A query that RAN in the old artifact and errors in the new one
    * (Bench's -1 sentinels) is the worst regression there is, not
    * noise — it fails the gate.
    */
  private[graft] def classify(old: Stats, nw: Stats,
                              margin: Double): Verdict =
    if (old.min <= 0 && nw.min <= 0) WithinNoise // errored both sides
    else if (nw.min <= 0) NewlyErrored
    else if (old.min <= 0) Recovered
    else if (nw.min > old.max * margin) Regression
    else if (nw.max < old.min / margin) Improvement
    else WithinNoise

  private[graft] def diffJson(oldStats: Map[String, Stats],
                              newStats: Map[String, Stats],
                              margin: Double,
                              canaries: (Option[Double], Option[Double]) =
                                (None, None)): (String, Boolean) = {
    val common = oldStats.keySet.intersect(newStats.keySet).toSeq.sorted
    val classed = common.map { q =>
      (q, oldStats(q), newStats(q), classify(oldStats(q), newStats(q), margin))
    }
    def f(d: Double) = BigDecimal(d).setScale(3,
      BigDecimal.RoundingMode.HALF_UP).toString
    def cells(sel: Verdict) = classed.collect { case (q, o, n, v) if v == sel =>
      s""""${Bench.esc(q)}":{"old_median":${f(o.median)},"new_median":${f(n.median)},"ratio":${f(n.median / o.median)}}"""
    }.mkString(",")
    val nNoise = classed.count(_._4 == WithinNoise)
    val onlyOld = (oldStats.keySet -- newStats.keySet).size
    val onlyNew = (newStats.keySet -- oldStats.keySet).size
    val newlyErrored = classed.collect { case (q, _, _, NewlyErrored) => q }
    val recovered = classed.collect { case (q, _, _, Recovered) => q }
    val hasRegression =
      classed.exists(_._4 == Regression) || newlyErrored.nonEmpty
    // CPU-canary comparability: sessions whose fixed-compute probes
    // differ by more than the margin were not running on equivalent
    // effective CPU — their query deltas say as much about the host as
    // about the code. Annotation only; classification is unchanged
    // (disjoint envelopes are still disjoint), the flag tells the reader
    // how much weight the deltas can carry.
    val canJson = canaries match {
      case (Some(o), Some(n)) =>
        val r = n / o
        s""","canary_ratio":${f(r)},"comparable":${r <= margin && r >= 1.0 / margin}"""
      case _ => s""","canary_ratio":null,"comparable":null"""
    }
    def names(qs: Seq[String]) =
      qs.map(q => s""""${Bench.esc(q)}"""").mkString("[", ",", "]")
    val json = s"""{"metric":"bench_diff","margin":$margin,"compared":${common.size},"within_noise":$nNoise,"only_old":$onlyOld,"only_new":$onlyNew$canJson,"newly_errored":${names(newlyErrored)},"recovered":${names(recovered)},"regressions":{${cells(Regression)}},"improvements":{${cells(Improvement)}}}"""
    (json, hasRegression)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchDiff <old bench_result.json> <new bench_result.json> [margin]")
    val margin = if (args.length >= 3) args(2).toDouble else 1.30
    require(margin >= 1.0,
      s"margin must be >= 1.0 (a multiplicative tolerance), got $margin")
    val mapper = new ObjectMapper()
    def root(p: String) = mapper.readTree(Files.readString(Paths.get(p)))
    val (oldRoot, newRoot) = (root(args(0)), root(args(1)))
    val (oldStats, newStats) = (queryStats(oldRoot), queryStats(newRoot))
    val common = oldStats.keySet.intersect(newStats.keySet)
    // zero overlap means a wiring mistake (compact line, scalebench
    // artifact, wrong path) — a gate must not read that as "no
    // regression"
    // no overlap, or overlap with no usable stats on either side (e.g. a
    // scalebench artifact whose query objects lack median/min/max), means
    // a wiring mistake — a gate must not read that as "no regression"
    val usable = common.exists(q =>
      oldStats(q).min > 0 || newStats(q).min > 0)
    if (common.isEmpty || !usable) {
      System.err.println(s"BenchDiff: no comparable queries between " +
        s"${args(0)} (${oldStats.size}) and ${args(1)} (${newStats.size}) " +
        "- are both files Bench's full bench_result.json format?")
      sys.exit(2)
    }
    val (json, hasRegression) =
      diffJson(oldStats, newStats, margin,
        (canarySingleMin(oldRoot), canarySingleMin(newRoot)))
    println(json)
    if (hasRegression) sys.exit(1)
  }
}

package graft

import java.nio.file.{Files, Paths}

/** Per-round benchmark main. Fidelity rules (VERDICT r01 §wrong-2):
  *  - full materialization via the `noop` sink, never `.count()` — count
  *    lets Catalyst prune every projected expression, so projection-heavy
  *    queries would benchmark near-zero work;
  *  - one untimed warmup query first (JVM/codegen warmup otherwise lands on
  *    whichever query runs first);
  *  - failures recorded per-query as -1 + an `"errors"` map, never
  *    swallowed;
  *  - the result JSON is written full-fidelity to `bench_result.json`,
  *    and a COMPACT copy (short keys, 3-decimal values) is the final
  *    stdout line — the driver keeps only a 2000-char stdout tail, so
  *    the line must fit that window whole or it can't be parsed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Bounded-drain streaming queries: size stateful-operator partitions
    // to the drained volume (sf≤0.1 ⇒ state fits in a handful of
    // partitions). The default 32 would open 128 RocksDB state stores
    // for the stream-stream join — ~10 s of fixed store-setup cost per
    // run that says nothing about the plan. This conf is the
    // programmatic default; the SPARK_GRAFT_STREAM_PARTITIONS env var
    // overrides it (precedence lives in EventStreams.runBounded).
    spark.conf.set("graft.stream.partitions", "4")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: one query per distinct codegen/JIT path (scan+agg, string
    // exprs, HOF+explode, array-HOF+window, Jackson/from_json, the
    // Structured Streaming machinery), untimed — otherwise whichever
    // query first touches a path pays its JIT cost in the reported number
    // (VERDICT r02 §wrong-3: q49's 4 s was Jackson JIT; streaming setup
    // similarly dominated q44/q45/q62/q79's first run)
    // q44 covers the streaming-aggregation state store; q79's
    // stream-stream join loads a separate store path (4 state store
    // instances per partition) whose first-touch cost is setup, not plan
    for (w <- Seq("q01_hourly_count", "q19_strings", "q29_top_tokens",
                  "q38_cosine_topk", "q49_json_extract", "q44_stream_hourly",
                  "q79_stream_stream_join"))
      try materialize(SparkEntry.queries(w)(spark, sfDir))
      catch { case _: Throwable => () }

    var errors = List.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val sec =
        try { materialize(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          errors ::= (name, Option(e.getMessage).getOrElse(e.getClass.getName).take(120))
          -1.0
        }
      name -> sec
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = fullJson(results, errors, total, sfDir)
    println(json)
    Files.writeString(Paths.get("bench_result.json"), json + "\n")
    spark.stop()
    // FINAL stdout line: the compact form. The driver stores only the
    // last 2000 chars of stdout (BENCH_r0{1,2,3}.json "tail" is exactly
    // 2000 chars, cut mid-JSON) — the full-name full-precision line is
    // ~3 KB and NEVER fits whole, which is why "parsed" was null three
    // rounds running. Short qNN keys + 3-decimal seconds keep this line
    // under ~1.7 KB even at 120 queries (guarded by BenchEncodeSpec), so
    // it survives the tail window with room for sbt's [success] line.
    println(compactJson(results, errors.size, total, sfDir))
    System.out.flush()
  }

  private[graft] def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"
    case c if c < ' ' => " "; case c => c.toString
  }

  /** Seconds with 3 decimals, locale-pinned (a comma decimal separator
    * from a non-ROOT default locale would corrupt the JSON).
    */
  private[graft] def fmt3(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** Full-name, full-precision record — written to `bench_result.json`
    * and printed once for human log readers.
    */
  private[graft] def fullJson(results: Seq[(String, Double)],
                              errors: List[(String, String)],
                              total: Double, sfDir: String): String = {
    val qs = results.map { case (k, v) => s""""${esc(k)}":$v""" }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"${esc(sfDir)}"}"""
  }

  /** Compact single line for the driver's bounded tail window: query
    * names truncated to their dense `qNN` prefix (unique by
    * ContractSpec's dense-numbering guard), 3-decimal values, error
    * COUNT instead of messages (full messages live in
    * `bench_result.json`), numeric sf parsed from the directory name.
    */
  private[graft] def compactJson(results: Seq[(String, Double)],
                                 nErrors: Int, total: Double,
                                 sfDir: String): String = {
    val qs = results.map { case (k, v) =>
      s""""${esc(k.takeWhile(_ != '_'))}":${fmt3(v)}"""
    }.mkString("{", ",", "}")
    val sf = "sf([0-9]+(?:\\.[0-9]+)?)$".r.findFirstMatchIn(sfDir)
      .map(_.group(1)).getOrElse(s""""${esc(sfDir)}"""")
    s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","queries":$qs,"errors":$nErrors,"sf":$sf}"""
  }
}

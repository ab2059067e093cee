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
  *  - the result JSON is printed on its own marker line AND written to
  *    `bench_result.json` so the driver can parse it out of sbt log noise.
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
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => " "; case c => c.toString
    }
    val qs = results.map { case (k, v) => s""""${esc(k)}":$v""" }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"${esc(sfDir)}"}"""
    println(json)
    Files.writeString(Paths.get("bench_result.json"), json + "\n")
    spark.stop()
    // final stdout line, uniquely marked so the driver can grep it out of
    // sbt log noise (BENCH_r02.json "parsed": null — the bare JSON line
    // was evidently lost among [info]/log lines)
    println("BENCHJSON " + json)
    System.out.flush()
  }
}

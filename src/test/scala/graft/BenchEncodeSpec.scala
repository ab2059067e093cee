package graft

/** Guards the driver-facing bench line. The driver stores only the LAST
  * 2000 characters of stdout (BENCH_r0{1,2,3}.json each carry a "tail"
  * of exactly 2000 chars, cut mid-line) and parses the bench JSON out of
  * that window — so the final printed line must fit the window whole,
  * with headroom for sbt's trailing `[success] Total time: ...` line
  * (~70 chars). The full-precision record lives in `bench_result.json`;
  * only the compact line faces the tail budget.
  */
class BenchEncodeSpec extends SparkTestBase {

  private def fakeResults(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q$i%02d_some_descriptive_query_name", 12.3456789))

  test("compact line fits the 2000-char tail window at 120 queries") {
    val line = Bench.compactJson(fakeResults(120), nErrors = 0,
      total = 1234.5678, sfDir = "/root/testdata/sf0.1")
    assert(line.length < 1900, s"compact bench line too long: ${line.length}")
    assert(!line.contains('\n'))
  }

  test("compact line for the CURRENT query set fits with sbt-noise headroom") {
    val names = SparkEntry.queries.keys.toSeq.sorted.map(n => (n, 3.14159))
    val line = Bench.compactJson(names, nErrors = 2, total = 99.999,
      sfDir = "/root/testdata/sf0.1")
    assert(line.length < 1800, s"compact bench line too long: ${line.length}")
  }

  test("compact line is valid JSON shape with the contract keys") {
    val line = Bench.compactJson(Seq(("q01_agg", 0.5), ("q02_x", -1.0)),
      nErrors = 1, total = 0.5, sfDir = "/root/testdata/sf0.01")
    assert(line.startsWith("""{"metric":"total","value":0.500,"unit":"sec","queries":{"q01":0.500,"q02":-1.000},"errors":1,"sf":0.01}"""))
  }

  test("sf token is always valid JSON, even for odd directory names") {
    // "sf0.1." used to emit the bare token `0.1.` — invalid JSON
    for (dir <- Seq("/data/sf0.1.", "/data/sfX", "/data/sf.5", "/data/"))
      assert(Bench.compactJson(Nil, 0, 0.0, dir)
        .endsWith(s""""sf":"${dir.replace("\\", "\\\\")}"}"""),
        s"non-numeric sf dir must fall back to a quoted string: $dir")
    assert(Bench.compactJson(Nil, 0, 0.0, "/data/sf0.1").endsWith(""""sf":0.1}"""))
    assert(Bench.compactJson(Nil, 0, 0.0, "/data/sf1").endsWith(""""sf":1}"""))
  }

  test("qNN prefixes stay unique after truncation (driver keys by them)") {
    val keys = SparkEntry.queries.keySet.map(_.takeWhile(_ != '_'))
    assert(keys.size === SparkEntry.queries.size,
      "two query names share a qNN prefix — compact line would collide")
  }

  test("locale-pinned formatting never emits a comma decimal separator") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(Bench.fmt3(1.5) === "1.500")
    } finally java.util.Locale.setDefault(prev)
  }
}

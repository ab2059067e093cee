package graft

/** Single-query runner for local iteration: `runMain graft.VerifyOne
  * <sfDir> <outDir> <name...>` — shares Verify's dump + oracle-JSON
  * code so the format can never drift from the driver's contract.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    val spark = graft.core.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    args.drop(2).foreach { name =>
      Verify.dumpQuery(spark, sfDir, outDir, name)
      println(s"[verifyone] wrote $name")
    }
    Verify.writeOracleJson(outDir, args.drop(2).toSeq)
    spark.stop()
  }
}

package graft

/** Scratch single-query runner for iteration: `runMain graft.VerifyOne
  * <sfDir> <outDir> <name...>` — same dump format as Verify.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    val spark = graft.core.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    args.drop(2).foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1).write
        .mode("overwrite").parquet(s"$outDir/$name")
      println(s"[verifyone] wrote $name")
    }
    val sqls = args.drop(2).flatMap(n =>
      SparkEntry.oracleSql.get(n).map(n -> _)).toMap
    val json = sqls.map { case (k, v) =>
      "\"" + k + "\":\"" + v.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per JVM (suites run in one forked JVM). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = graft.core.Sessions.builder("local[4]", 4)
      .appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // tests assert on full plan strings (PlanAuditSpec, LlmOpsSpec) —
    // undo the session default that bounds per-action plan rendering
    // on the execution hot path
    s.conf.set("spark.sql.maxPlanStringLength", Int.MaxValue - 15)
    s
  }
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  val sf: String = "/root/testdata/sf0.001"
}

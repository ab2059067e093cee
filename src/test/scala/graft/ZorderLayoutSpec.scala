package graft

import org.apache.spark.sql.functions._
import graft.operators.LayoutOps

/** The property the z-value exists to buy: after `zorderLayout`, every
  * partition covers a tight box in BOTH source dimensions, so a band
  * predicate on EITHER dimension touches few partitions. A 1-D sort can
  * only ever prune its own sort key. File-level min/max skipping
  * (parquet row-group stats) prunes exactly when partition ranges are
  * tight, so "partitions touched" is the right proxy for files scanned
  * at 100 TB.
  *
  * The fixture's `value` is right-skewed (a third of the rows land in
  * the bottom 16 of 256 linear cells) — deliberately kept: linear cells
  * under skew are the realistic setting, and the measured bounds below
  * hold there. Production would derive cell boundaries from an
  * approx-quantile sampling pass instead; the q91 oracle keeps linear
  * cells because they are bit-exact cross-engine.
  */
class ZorderLayoutSpec extends SparkTestBase {

  private val Bits = 8
  private val Parts = 16

  private lazy val cells = {
    val ev = graft.core.Tables.events(spark, sf)
    val r = ev.agg(min(col("user_id")).as("ulo"), max(col("user_id")).as("uhi"),
      min(col("value")).as("vlo"), max(col("value")).as("vhi"))
    ev.crossJoin(broadcast(r))
      .select(col("event_id"),
        expr(LayoutOps.cellSpark("user_id", "ulo", "uhi", Bits)).as("cx"),
        expr(LayoutOps.cellSpark("value", "vlo", "vhi", Bits)).as("cy"))
      .select(col("event_id"), col("cx"), col("cy"),
        expr(LayoutOps.interleaveSpark("cx", "cy", Bits)).as("z"))
      .cache()
  }
  private lazy val zLayout = LayoutOps.zorderLayout(cells, col("z"), Parts).cache()
  private lazy val xLayout = cells
    .repartitionByRange(Parts, col("cx")).sortWithinPartitions(col("cx")).cache()

  /** Partitions holding ≥1 row of `dim` ∈ [lo, hi) under a layout. */
  private def touched(layout: org.apache.spark.sql.DataFrame,
                      dim: String, lo: Int, hi: Int): Long =
    layout.select(spark_partition_id().as("pid"), col(dim))
      .filter(col(dim) >= lo && col(dim) < hi)
      .select(col("pid")).distinct().count()

  test("cy band predicates prune under z-order, not under a cx sort") {
    // measured on the fixture: z touches 7 and 3; cx-sort 14 and 12
    for ((lo, hi) <- Seq((32, 64), (96, 128))) {
      val z = touched(zLayout, "cy", lo, hi)
      val x = touched(xLayout, "cy", lo, hi)
      assert(x > Parts / 2, s"cx layout unexpectedly pruned cy band: $x")
      assert(z * 2 <= x,
        s"z layout touched $z of $Parts on cy∈[$lo,$hi) — 1-D touched $x")
    }
  }

  test("the honest tradeoff: a cx-only predicate prefers the 1-D sort") {
    val z = touched(zLayout, "cx", 96, 128)
    val x = touched(xLayout, "cx", 96, 128)
    assert(x <= 3, s"cx layout should nail its own key, touched $x")
    assert(z >= x, "z-order cannot beat a 1-D sort on the sorted key itself")
    assert(z <= Parts / 2, s"but it must still prune: touched $z of $Parts")
  }

  test("degenerate range (hi = lo) pins to cell 0 instead of inf-cast") {
    // a constant column would otherwise divide by zero → ±inf, whose
    // BIGINT cast is engine-specific (Spark saturates, DuckDB raises)
    import spark.implicits._
    val cells = Seq((1L, 5.0), (2L, 5.0)).toDF("id", "v")
      .selectExpr(s"${LayoutOps.cellSpark("v", "5.0", "5.0", Bits)} AS c")
      .as[Long].collect()
    assert(cells.forall(_ == 0L))
  }

  test("z partitions are tight boxes in both dims; 1-D sort in one") {
    def avgSpans(layout: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val s = layout.select(spark_partition_id().as("pid"), col("cx"), col("cy"))
        .groupBy(col("pid"))
        .agg((max(col("cx")) - min(col("cx"))).as("sx"),
          (max(col("cy")) - min(col("cy"))).as("sy"))
        .agg(avg(col("sx")), avg(col("sy"))).head
      (s.getDouble(0), s.getDouble(1))
    }
    val (zx, zy) = avgSpans(zLayout)   // measured ≈ (66, 56)
    val (xx, xy) = avgSpans(xLayout)   // measured ≈ (1, 180)
    val full = (1 << Bits) - 1
    assert(xx < 8 && xy > full * 0.5,
      s"1-D layout: cx tight ($xx), cy wide ($xy) expected")
    assert(zx < full * 0.45 && zy < full * 0.45,
      s"z layout boxes must be tight in BOTH dims, got ($zx, $zy)")
  }

  test("min-max skipping: selective band reads a strict minority of files, exactly") {
    // T38's two claims: (a) the manifest-style prune over per-file
    // stats loses NOTHING (result equals the direct filter — also
    // oracle-pinned by q131); (b) on a range-clustered layout a
    // ~1/10-range band reads a strict minority of the files — the
    // whole point of maintaining the stats.
    val dir = System.getProperty("java.io.tmpdir") + "/graft_skip_spec"
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("event_type"), col("value"))
    LayoutOps.skippingLayout(ev, col("value"), dir, 16)
    val (pruned, read, total) = LayoutOps.skippingRead(
      spark, dir, "value", 40.0, 90.0)
    assert(total >= 8, s"layout produced only $total files")
    assert(read < total / 2,
      s"band read $read of $total files — stats are not pruning")
    val expect = ev.filter(col("value").between(40.0, 90.0)).count()
    assert(pruned.count() === expect,
      "pruned read lost or duplicated rows vs the direct filter")
    // the stats table is genuine: every kept file overlaps the band
    LayoutOps.minMaxStats(spark, dir, "value").collect().foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2),
        s"file ${r.getString(0)} has lo > hi")
    }
    // ADVICE r13: a band overlapping NO file (out-of-range predicate)
    // must return an empty frame with the layout's schema, not crash on
    // a zero-path parquet read
    val (empty, readN, totalN) = LayoutOps.skippingRead(
      spark, dir, "value", 1e9, 2e9)
    assert(readN === 0 && totalN === total,
      s"out-of-range band kept $readN of $totalN files")
    assert(empty.count() === 0L, "out-of-range band returned rows")
    assert(empty.columns.toSeq === Seq("event_type", "value"),
      "empty-prune frame lost the layout schema")
  }
}

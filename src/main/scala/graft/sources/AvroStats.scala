package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._

/** Per-file column statistics for the `graft-avro` connector — the
  * piece that turns filter pushdown into FILE SKIPPING.
  *
  * Writers track (lo,hi) for every numeric column while streaming rows
  * out (zero extra passes); task commit ships the intervals inside the
  * WriterCommitMessage; job commit publishes them as a sidecar manifest
  * `_graft_stats` next to the containers, swapped in by rename so a
  * concurrent reader sees the old manifest or the new one, never a torn
  * file. At planning time [[AvroScan]] refutes pushed range/equality
  * predicates against each file's interval and never opens files that
  * cannot match — the row-major container's analogue of parquet
  * row-group pruning, at the granularity the one-container-per-task
  * layout actually has.
  *
  * Skipping is an OPTIMIZATION, never a correctness dependency: a file
  * with no manifest entry (pre-manifest data, utility-written
  * containers, a column of all NULLs) is always planned, and the
  * pushed filters still run row-level in the reader. Values are stored
  * exactly — integers as decimal text, floating point as raw IEEE bits
  * — so reload never rounds; -0.0 is folded into +0.0 at observation
  * time and NaN ranks greatest, matching both Spark's ordering and
  * [[AvroFilterEval]].
  *
  * Manifest line format (tab-separated):
  * `fileName  column  kind  lo  hi` with kind `i` (long/int) or `f`
  * (double/float, raw-bits encoded).
  */
private[sources] object AvroStats {

  sealed trait ColRange
  final case class LongRange(lo: Long, hi: Long) extends ColRange
  final case class DblRange(lo: Double, hi: Double) extends ColRange

  /** Streaming (lo,hi) tracker over the numeric fields of `schema`. */
  final class Tracker(schema: StructType) {
    private val tracked = schema.fields.zipWithIndex.filter { case (f, _) =>
      f.dataType match {
        case LongType | IntegerType | DoubleType | FloatType => true
        case _                                               => false
      }
    }
    private val n = tracked.length
    private val names = tracked.map(_._1.name)
    private val dts = tracked.map(_._1.dataType)
    private val pos = tracked.map(_._2)
    private val isInt = dts.map(dt => dt == LongType || dt == IntegerType)
    private val loL = new Array[Long](n)
    private val hiL = new Array[Long](n)
    private val loD = new Array[Double](n)
    private val hiD = new Array[Double](n)
    private val seen = new Array[Boolean](n)

    def observe(row: InternalRow): Unit = {
      var k = 0
      while (k < n) {
        val i = pos(k)
        if (!row.isNullAt(i)) {
          if (isInt(k)) {
            val v =
              if (dts(k) == LongType) row.getLong(i) else row.getInt(i).toLong
            if (!seen(k)) { loL(k) = v; hiL(k) = v; seen(k) = true }
            else {
              if (v < loL(k)) loL(k) = v
              if (v > hiL(k)) hiL(k) = v
            }
          } else {
            val raw =
              if (dts(k) == DoubleType) row.getDouble(i)
              else row.getFloat(i).toDouble
            val v = if (raw == 0.0d) 0.0d else raw  // -0.0 → +0.0
            if (!seen(k)) { loD(k) = v; hiD(k) = v; seen(k) = true }
            else {
              if (java.lang.Double.compare(v, loD(k)) < 0) loD(k) = v
              if (java.lang.Double.compare(v, hiD(k)) > 0) hiD(k) = v
            }
          }
        }
        k += 1
      }
    }

    /** One manifest payload line per column that saw a non-null value. */
    def lines: Array[String] =
      (0 until n).iterator.filter(seen).map { k =>
        if (isInt(k)) s"${names(k)}\ti\t${loL(k)}\t${hiL(k)}"
        else {
          val lo = java.lang.Double.doubleToRawLongBits(loD(k))
          val hi = java.lang.Double.doubleToRawLongBits(hiD(k))
          s"${names(k)}\tf\t$lo\t$hi"
        }
      }.toArray
  }

  private def manifest(dir: String) = new Path(dir, AvroDataSource.StatsFile)

  private def loadLines(dir: String, conf: Configuration): Seq[String] =
    scala.util.Try {
      val p = manifest(dir)
      val fs = p.getFileSystem(conf)
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        var r = in.read(buf)
        while (r >= 0) { bytes.write(buf, 0, r); r = in.read(buf) }
        new String(bytes.toByteArray, StandardCharsets.UTF_8)
          .split('\n').toSeq.filter(_.nonEmpty)
      } finally in.close()
    }.getOrElse(Nil)

  /** Replace the manifest with (surviving old lines for `keepNames`) ++
    * `newLines`; rename-published. The brief absence window between
    * delete and rename only costs skipping, never rows.
    */
  def publish(dir: String, keepNames: Set[String], newLines: Seq[String],
              conf: Configuration): Unit = {
    val kept =
      if (keepNames.isEmpty) Nil
      else loadLines(dir, conf)
        .filter(l => keepNames.contains(l.takeWhile(_ != '\t')))
    val all = kept ++ newLines
    val fs = manifest(dir).getFileSystem(conf)
    val tmp = new Path(dir, AvroDataSource.StatsFile + ".inprogress")
    val out = fs.create(tmp, true)
    try out.write(
      all.mkString("", "\n", if (all.isEmpty) "" else "\n")
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(manifest(dir), false)
    require(fs.rename(tmp, manifest(dir)),
      s"graft-avro stats publish: rename failed under $dir")
  }

  /** fileName → column → interval; empty when absent/unreadable. */
  def load(dir: String, conf: Configuration): Map[String, Map[String, ColRange]] =
    loadLines(dir, conf).flatMap { line =>
      line.split('\t') match {
        case Array(file, col, "i", lo, hi) =>
          scala.util.Try(
            (file, col, LongRange(lo.toLong, hi.toLong): ColRange)).toOption
        case Array(file, col, "f", lo, hi) =>
          scala.util.Try((file, col, DblRange(
            java.lang.Double.longBitsToDouble(lo.toLong),
            java.lang.Double.longBitsToDouble(hi.toLong)): ColRange)).toOption
        case _ => None
      }
    }.groupBy(_._1).map { case (f, ls) =>
      f -> ls.map(t => t._2 -> t._3).toMap
    }

  // (cmp(v,lo), cmp(v,hi)) under the engine's ordering, or None when
  // the filter value's type doesn't pair with the stored interval —
  // None always KEEPS the file.
  private def bounds(v: Any, r: ColRange): Option[(Int, Int)] = (v, r) match {
    case (y: Long, LongRange(lo, hi)) =>
      Some((java.lang.Long.compare(y, lo), java.lang.Long.compare(y, hi)))
    case (y: Int, LongRange(lo, hi)) =>
      Some((java.lang.Long.compare(y.toLong, lo),
        java.lang.Long.compare(y.toLong, hi)))
    case (y: Double, DblRange(lo, hi)) =>
      val v0 = if (y == 0.0d) 0.0d else y
      Some((java.lang.Double.compare(v0, lo), java.lang.Double.compare(v0, hi)))
    case (y: Float, DblRange(lo, hi)) =>
      val v0 = if (y == 0.0f) 0.0d else y.toDouble
      Some((java.lang.Double.compare(v0, lo), java.lang.Double.compare(v0, hi)))
    case _ => None
  }

  /** Could ANY row of a file with intervals `cols` satisfy `f`?
    * Conservative: unknown columns/filter shapes keep the file (stats
    * lines exist only for columns with ≥1 non-null value, so IsNull /
    * IsNotNull never prune — null counts aren't tracked).
    */
  def mayMatch(f: Filter, cols: Map[String, ColRange]): Boolean = f match {
    case EqualTo(a, v) =>
      cols.get(a).flatMap(bounds(v, _)).forall {
        case (cl, ch) => cl >= 0 && ch <= 0
      }
    case GreaterThan(a, v) =>
      cols.get(a).flatMap(bounds(v, _)).forall { case (_, ch) => ch < 0 }
    case GreaterThanOrEqual(a, v) =>
      cols.get(a).flatMap(bounds(v, _)).forall { case (_, ch) => ch <= 0 }
    case LessThan(a, v) =>
      cols.get(a).flatMap(bounds(v, _)).forall { case (cl, _) => cl > 0 }
    case LessThanOrEqual(a, v) =>
      cols.get(a).flatMap(bounds(v, _)).forall { case (cl, _) => cl >= 0 }
    case _ => true
  }
}

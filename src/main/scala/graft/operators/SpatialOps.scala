package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planar-grid spatial operators: the 2-D member of the band-then-verify
  * family (T2 buckets 1-D time, q34–q36 band sets, q108 bands strings —
  * this bands SPACE). The reference engine's only spatial construct is
  * the rectangle filter (`LON BETWEEN … AND LAT BETWEEN …`,
  * reference `src/OverSpeedCount.scala:36`); the radius/neighbor JOIN is
  * what it conspicuously lacks — "which camera pairs are within r of
  * each other" is a cross join there. All arithmetic is integer
  * (coordinates in fixed-point units, e.g. microdegrees), so candidate
  * generation AND the exact verify are bit-identical cross-engine.
  */
object SpatialOps {

  /** All unordered point pairs within Euclidean distance `radius`
    * (closed ball: d² ≤ r² — boundary pairs MATCH), by grid-cell
    * banding.
    *
    * Input `points`: (id, x, y) — integer coordinates, unique ids.
    * Output: (id_a, id_b, d2) with id_a < id_b, d2 the exact squared
    * distance in BIGINT.
    *
    * Mechanics: each point hashes to its `cell`-sized home grid cell
    * via FLOOR division (pmod-subtraction, so negative coordinates
    * bucket correctly — truncating division would make cell (0,0)
    * doubly wide). One side probes its 3×3 cell neighborhood (a
    * 9-way explode), the other keeps only its home cell; with
    * cell ≥ radius any pair at distance ≤ radius differs by at most
    * one cell per axis, so the equi-join on (cx, cy) is a COMPLETE
    * candidate set (the pigeonhole argument of the hamming bands,
    * in 2-D). Each qualifying pair joins in BOTH orientations
    * (a-probe→b-home and b-probe→a-home — a point's home cell is
    * unique and the 9 probe cells are distinct, so each orientation
    * matches exactly once); the id_a < id_b filter keeps exactly one.
    * No dedup pass, no /2 fixup.
    *
    * Scale (100 TB): the shuffle key is the grid cell — candidate
    * volume is Σ_cell |probes ∩ 9 cells| · |cell|, bounded by local
    * density, never |points|² (the naive form the DuckDB oracle
    * deliberately runs); a dense city cell is aggregation-style skew
    * that AQE's skew split absorbs. The ×9 explode rides the narrow
    * pre-shuffle side only. Caller contract: coordinate span < 2³⁰
    * per axis, so d² ≤ 2·(2³⁰)² < 2⁶¹ — ANSI mode throws on overflow
    * rather than wrapping, so the bound is load-bearing, not advisory
    * (microdegrees span ±1.8e8, well inside).
    */
  /** Sparse-path explode width cap for [[knnJoin]]: the auto-grid
    * never picks a cell smaller than horizon/MaxKnnRings, so the
    * unsettled-probe neighborhood is at most (2·16+1)² = 1089 cells —
    * bounded fan-out on a path that only the low-density tail takes.
    */
  val MaxKnnRings = 16

  /** k nearest neighbors per probe within Euclidean `horizon` — the
    * OTHER spatial/entity-resolution join shape (q163's radius join
    * can't emulate it when density varies: a fixed radius floods dense
    * cells and starves sparse ones; kNN adapts per probe).
    *
    * Inputs: `probes`/`hosts` as (id, x, y) integer-coordinate frames
    * sharing an id namespace (same-id pairs are excluded — pass the
    * same frame twice for self-kNN). Output: (probe_id, neighbor_id,
    * d2, rk) with rk ∈ [1, k] ranked by the total order (d2,
    * neighbor_id) — ties are pinned, reruns and the oracle agree
    * row-for-row. Contract: the k nearest AMONG hosts within distance
    * ≤ `horizon` (closed ball); probes with fewer neighbors in the
    * horizon return what exists. The contract names ONLY (k, horizon)
    * — the grid underneath is pure implementation, so the answer never
    * depends on how the space was cut.
    *
    * Grid choice: with `cellSize = 0` (the default) the cell is sized
    * FROM DATA DENSITY — one bounded 1-row stats aggregate (count +
    * extent) picks cell ≈ √(2k·area/n), i.e. ~2k hosts per cell, then
    * clamps into [horizon/MaxKnnRings, horizon]. That makes ring-1
    * candidate volume ≈ 9·2k·|probes| REGARDLESS of density — a 16×
    * densified corpus re-grids finer instead of paying 16× per probe
    * (measured: the fixed-cell form scaled at β ≈ 1.9 under ScaleBench
    * densification — candidate volume ∝ n·density; auto-gridding is
    * the production answer, and the expected ball(cell) occupancy
    * ≈ π·2k ≫ k keeps the dense path's settle rate high). An explicit
    * `cellSize` overrides (tests pin both paths).
    *
    * Expanding-ring mechanics, Spark-shaped (set-based two-phase, no
    * per-probe iteration), rings = ceil(horizon/cell):
    * - **Ring 1 (dense path)**: candidates from the probe's 3×3 cell
    *   neighborhood, top-k by (d2, neighbor_id) via a rank-filtered
    *   window — WindowGroupLimit, so a dense city cell costs a k-row
    *   heap per task, never a full sort. A probe is SETTLED when its
    *   k-th candidate lies within ONE cell (d² ≤ cell²): every point
    *   that close is inside the 3×3 by pigeonhole, so ≥ k candidates
    *   within cell distance exist globally, the true k-th distance is
    *   ≤ cell ≤ horizon, and everything outside the 3×3 is farther
    *   than cell — the ring-1 top-k IS the horizon-contract top-k,
    *   tie order included.
    * - **Ring `rings` (sparse remainder)**: only UNSETTLED probes —
    *   the low-density tail, by construction — re-probe the full
    *   (2·rings+1)² neighborhood, filter to the horizon ball, same
    *   rank cut. Complete for the horizon by pigeonhole
    *   (rings·cell ≥ horizon).
    *
    * Scale (100 TB): the ×9 (dense) explode rides the narrow probe
    * side; the ×(2r+1)² explode rides only the sparse tail, whose
    * per-cell candidate volume is small BECAUSE it is sparse — with
    * auto-gridding, total candidate volume stays ~k·|probes| at any
    * density. The settled semi/anti joins key on probe_id, aligned
    * with the window's partitioning. Caller contract: coordinate span
    * < 2³⁰ per axis (ANSI throws on overflow rather than wrapping).
    */
  def knnJoin(probes: DataFrame, hosts: DataFrame, k: Int, horizon: Long,
      cellSize: Long = 0L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    require(cellSize <= horizon,
      s"cell $cellSize > horizon $horizon would skip the ring-1 settle")
    val cell = if (cellSize > 0L) cellSize else autoCell(hosts, k, horizon)
    val rings = ((horizon + cell - 1L) / cell).toInt
    import org.apache.spark.sql.expressions.Window
    def fdiv(c: String) = expr(s"($c - pmod($c, ${cell}L)) DIV ${cell}L")
    val pr = probes.select(col("id").cast("long").as("probe_id"),
      col("x").cast("long").as("xa"), col("y").cast("long").as("ya"))
      .withColumn("cx", fdiv("xa")).withColumn("cy", fdiv("ya"))
    val ho = hosts.select(col("id").cast("long").as("neighbor_id"),
      col("x").cast("long").as("xb"), col("y").cast("long").as("yb"))
      .withColumn("pcx", fdiv("xb")).withColumn("pcy", fdiv("yb"))
    def ringOffsets(r: Int) = array((for { dx <- -r to r; dy <- -r to r }
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    def candidates(ps: DataFrame, r: Int) = {
      val dx = col("xa") - col("xb")
      val dy = col("ya") - col("yb")
      ps.withColumn("o", explode(ringOffsets(r)))
        .select(col("probe_id"), col("xa"), col("ya"),
          (col("cx") + col("o.dx")).as("pcx"),
          (col("cy") + col("o.dy")).as("pcy"))
        .join(ho, Seq("pcx", "pcy"))
        .filter(col("probe_id") =!= col("neighbor_id"))
        .withColumn("d2", dx * dx + dy * dy)
    }
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("d2"), col("neighbor_id"))
    val top1 = candidates(pr, 1)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
    val settled = top1
      .filter(col("rk") === k && col("d2") <= lit(cell * cell))
      .select(col("probe_id"))
    val out1 = top1.join(settled, Seq("probe_id"), "left_semi")
    val out2 = candidates(pr.join(settled, Seq("probe_id"), "left_anti"), rings)
      .filter(col("d2") <= lit(horizon * horizon))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
    val cols = Seq(col("probe_id"), col("neighbor_id"), col("d2"), col("rk"))
    out1.select(cols: _*).unionByName(out2.select(cols: _*))
  }

  /** Density-derived grid cell for [[knnJoin]]: ~2k hosts per cell,
    * clamped into [ceil(horizon/MaxKnnRings), horizon]. The stats
    * aggregate is ONE row collected on the driver — bounded by
    * construction (count + 4 extremes), the q131 kind of scalar.
    */
  private def autoCell(hosts: DataFrame, k: Int, horizon: Long): Long = {
    val r = hosts.select(col("x").cast("long").as("x"),
        col("y").cast("long").as("y"))
      .agg(count(lit(1)).as("n"), min(col("x")).as("x0"),
        max(col("x")).as("x1"), min(col("y")).as("y0"),
        max(col("y")).as("y1"))
      .head()
    val lo = (horizon + MaxKnnRings - 1L) / MaxKnnRings
    if (r.getLong(0) == 0L) return horizon
    val n = r.getLong(0).toDouble
    val area = (r.getLong(2) - r.getLong(1) + 1L).toDouble *
      (r.getLong(4) - r.getLong(3) + 1L).toDouble
    val ideal = math.ceil(math.sqrt(2.0 * k * area / n)).toLong
    math.min(horizon, math.max(ideal, lo))
  }

  def neighborPairs(points: DataFrame, radius: Long,
      cellSize: Long = 0L): DataFrame = {
    require(radius >= 1, s"radius must be >= 1, got $radius")
    val cell = if (cellSize > 0L) cellSize else radius
    require(cell >= radius,
      s"cell size $cell < radius $radius breaks 3x3 completeness")
    val pts = points.select(col("id").cast("long").as("id"),
      col("x").cast("long").as("x"), col("y").cast("long").as("y"))
    // floor-division cell id (exact for negatives): (v - pmod(v, c)) DIV c
    def fdiv(c: String) =
      expr(s"($c - pmod($c, ${cell}L)) DIV ${cell}L")
    val home = pts.select(col("id"), col("x"), col("y"),
      fdiv("x").as("cx"), fdiv("y").as("cy"))
    val offsets = array((for { dx <- -1 to 1; dy <- -1 to 1 } yield
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val probes = home.withColumn("o", explode(offsets))
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        (col("cx") + col("o.dx")).as("pcx"),
        (col("cy") + col("o.dy")).as("pcy"))
    val hosts = home.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), col("cx").as("pcx"), col("cy").as("pcy"))
    val dx = col("xa") - col("xb")
    val dy = col("ya") - col("yb")
    probes.join(hosts, Seq("pcx", "pcy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d2", dx * dx + dy * dy)
      .filter(col("d2") <= lit(radius * radius))
      .select(col("id_a"), col("id_b"), col("d2"))
  }

  /** Point-in-polygon join by even-odd ray parity — the containment
    * member of the spatial tier (T65 answers "within distance r", T67
    * "k nearest"; this answers "inside which fence"), the geofencing /
    * region-rollup join of GIS warehouses.
    *
    * Exact test, all-integer: cast a +x ray from the point and count
    * crossing edges. Edge (x1,y1)→(x2,y2) crosses iff the edge spans
    * the point's y strictly-above/not-above ((y1 > py) ≠ (y2 > py) —
    * which also zeroes horizontal edges) AND the point lies left of the
    * edge at height py: px < x1 + (py−y1)(x2−x1)/(y2−y1), evaluated
    * WITHOUT division as (px−x1)(y2−y1) < (py−y1)(x2−x1) for y2 > y1
    * and with the inequality flipped for y2 < y1 (dividing by a
    * negative). Odd crossing count = inside. Even-odd parity needs no
    * convexity, orientation, or even simplicity from the polygon;
    * boundary points resolve by the strict inequalities —
    * deterministically, identically in the oracle's longhand form.
    *
    * Scale shape — band-then-verify like T65, but the verify is a
    * SCALAR, not a join: each polygon explodes to the grid cells of
    * its bounding box (area-proportional, the geometry's own size);
    * points join their single home cell (points >> polygons, so
    * points shuffle ONCE on cell id and the polygon side is the small
    * exploded one — broadcastable when |polys| is dimension-like); a
    * bbox compare prunes corner candidates; then the whole
    * vertex-loop parity test runs as ONE codegen'd HOF expression
    * (transform + aggregate over the vertex array) per surviving
    * candidate — no edge explode, no per-edge groupBy, no second
    * shuffle. Candidate count per point = polygons whose bbox covers
    * its cell — density-bounded, never |points|·|polys|.
    *
    * @param points (id, x, y) integer points
    * @param polys  (poly_id, vs: array<struct<x,y>>) closed polygons
    *               (last vertex implicitly joins the first), ≥ 3
    *               vertices, bbox diameter assumed ≤ a few cells
    * @param cell   grid cell size (≥ 1)
    * @return (pid, poly_id) — strict-interior memberships
    */
  def pointInPolygonJoin(points: DataFrame, polys: DataFrame,
      cell: Long): DataFrame = {
    require(cell >= 1, s"cell must be >= 1, got $cell")
    def fdiv(c: String) =
      expr(s"($c - pmod($c, ${cell}L)) DIV ${cell}L")
    val pb = polys.select(col("poly_id"), col("vs"),
      expr("aggregate(vs, element_at(vs, 1).x, (a, v) -> least(a, v.x))").as("xmin"),
      expr("aggregate(vs, element_at(vs, 1).x, (a, v) -> greatest(a, v.x))").as("xmax"),
      expr("aggregate(vs, element_at(vs, 1).y, (a, v) -> least(a, v.y))").as("ymin"),
      expr("aggregate(vs, element_at(vs, 1).y, (a, v) -> greatest(a, v.y))").as("ymax"))
    // polygon → every cell of its bbox (area-proportional cover)
    val cover = pb
      .withColumn("ccx", explode(expr(
        s"sequence((xmin - pmod(xmin, ${cell}L)) DIV ${cell}L, " +
          s"(xmax - pmod(xmax, ${cell}L)) DIV ${cell}L)")))
      .withColumn("ccy", explode(expr(
        s"sequence((ymin - pmod(ymin, ${cell}L)) DIV ${cell}L, " +
          s"(ymax - pmod(ymax, ${cell}L)) DIV ${cell}L)")))
    val pts = points.select(col("id").cast("long").as("pid"),
      col("x").cast("long").as("px"), col("y").cast("long").as("py"),
      fdiv("x").as("ccx"), fdiv("y").as("ccy"))
    // the whole ray-parity loop as one scalar expression over vs
    val parity =
      """(aggregate(transform(sequence(1, size(vs)), i ->
        |  CASE WHEN (element_at(vs, i).y > py)
        |            != (element_at(vs, (i % size(vs)) + 1).y > py)
        |        AND ((element_at(vs, (i % size(vs)) + 1).y
        |                > element_at(vs, i).y
        |              AND (px - element_at(vs, i).x)
        |                  * (element_at(vs, (i % size(vs)) + 1).y
        |                     - element_at(vs, i).y)
        |                < (py - element_at(vs, i).y)
        |                  * (element_at(vs, (i % size(vs)) + 1).x
        |                     - element_at(vs, i).x))
        |         OR (element_at(vs, (i % size(vs)) + 1).y
        |                < element_at(vs, i).y
        |              AND (px - element_at(vs, i).x)
        |                  * (element_at(vs, (i % size(vs)) + 1).y
        |                     - element_at(vs, i).y)
        |                > (py - element_at(vs, i).y)
        |                  * (element_at(vs, (i % size(vs)) + 1).x
        |                     - element_at(vs, i).x)))
        |  THEN 1 ELSE 0 END), 0, (a, e) -> a + e) % 2) = 1""".stripMargin
    pts.join(cover, Seq("ccx", "ccy"))
      .filter(col("px").between(col("xmin"), col("xmax")) &&
        col("py").between(col("ymin"), col("ymax")))
      .filter(expr(parity))
      .select(col("pid"), col("poly_id"))
  }
}

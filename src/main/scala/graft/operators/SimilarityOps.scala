package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`): exact
  * brute-force cosine top-k as the correctness baseline, and a
  * sign-bit-LSH bucketed variant as the 100 TB scale path.
  *
  * Numeric discipline: embeddings are cast FLOAT→DOUBLE (exact) up front,
  * and every dot product folds left-to-right from +0.0 via HOFs, so the
  * resulting doubles are bit-identical to the DuckDB oracle that mirrors
  * the same fold. No UDFs — all HOF expressions stay codegen-friendly.
  *
  * Scale design:
  *  - Brute-force: the probe set is small by construction and broadcast;
  *    the corpus streams through one narrow pass (cosine per pair), and
  *    top-k uses row_number over (probe) which Spark 4 executes with
  *    WindowGroupLimit — each map task keeps only its local top-k before
  *    the per-probe shuffle, so the shuffle volume is k·|probes|, not
  *    |corpus|·|probes|.
  *  - LSH: bucket key = sign mask of the first SignBits dimensions (an
  *    axis-aligned random projection; deterministic so the oracle can
  *    mirror it). Candidates are generated per-bucket via hash join —
  *    never an all-pairs product. Norms are computed once per vector,
  *    map-side, before any join.
  */
object SimilarityOps {
  val SignBits = 8 // LSH bucket = sign mask of dims 1..SignBits

  // Multi-table LSH knobs: L independent tables, each hashing a DISJOINT
  // slice of TableBits dimensions (table t = sign mask of dims
  // [t·b+1 .. t·b+b]). One table of many bits has vanishing recall at
  // moderate similarity (p_agree^bits); L tables recover it as
  // 1-(1-p^b)^L at L× index cost — the standard LSH recall/cost trade.
  // NumTables·TableBits must be ≤ the embedding dimension (64 here).
  val NumTables = 8
  val TableBits = 4

  // ---- dialect fragments -------------------------------------------------
  /** FLOAT[] → DOUBLE[] (exact widening). */
  def toDoubleSpark(c: String): String = s"transform($c, x -> CAST(x AS DOUBLE))"
  def toDoubleDuck(c: String): String  = s"CAST($c AS DOUBLE[])"

  /** Left-to-right dot product of two equal-length double arrays. */
  def dotSpark(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
  def dotDuck(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), " +
      s"i -> $a[i] * $b[i])), (acc, v) -> acc + v)"

  def normSpark(a: String): String = s"sqrt(${dotSpark(a, a)})"
  def normDuck(a: String): String  = s"sqrt(${dotDuck(a, a)})"

  /** Sign-mask LSH bucket: Σ_{i<bits} (v[i+1] >= 0) << i. `bits` is the
    * scale knob: 2^bits buckets must comfortably exceed the per-executor
    * working set — 8 bits for recall-oriented probe search at test scale,
    * 16+ for near-dup dedup over a large corpus (exact/scaled copies
    * agree on every sign, so recall of true duplicates is unaffected).
    */
  def bucketSpark(a: String, bits: Int = SignBits): String =
    (0 until bits).map(i =>
      s"CASE WHEN element_at($a, ${i + 1}) >= 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
  def bucketDuck(a: String, bits: Int = SignBits): String =
    (0 until bits).map(i =>
      s"CASE WHEN $a[${i + 1}] >= 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")

  /** Sign-mask bucket over the dimension slice [off+1 .. off+bits]. */
  def sliceBucketSpark(a: String, off: Int, bits: Int): String =
    (0 until bits).map(i =>
      s"CASE WHEN element_at($a, ${off + i + 1}) >= 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
  def sliceBucketDuck(a: String, off: Int, bits: Int): String =
    (0 until bits).map(i =>
      s"CASE WHEN $a[${off + i + 1}] >= 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")

  /** Array of per-table bucket keys, one per hash table. */
  def tableBucketsSpark(a: String, tables: Int = NumTables,
                        bits: Int = TableBits): String =
    (0 until tables).map(t => sliceBucketSpark(a, t * bits, bits))
      .mkString("array(", ", ", ")")
  def tableBucketsDuck(a: String, tables: Int = NumTables,
                       bits: Int = TableBits): String =
    (0 until tables).map(t => sliceBucketDuck(a, t * bits, bits))
      .mkString("[", ", ", "]")

  // ---- operators ---------------------------------------------------------
  /** Per-vector prep: id, double vector, precomputed norm. One narrow
    * map over the scan; norms are never recomputed per pair. Bucketing
    * is NOT part of the prep contract — each consumer derives the
    * bucket scheme it needs ([[lshIndex]] per-table masks, near-dup its
    * wider mask) so no dead columns ride along.
    */
  def prepped(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
      expr(toDoubleSpark("embedding")).as("v"))
      .select(col("vec_id"), col("v"),
        expr(normSpark("v")).as("nrm"))

  /** Exact top-k cosine neighbors for each probe (probe set must be small
    * — it is broadcast). Excludes self-pairs. Deterministic tie-break on
    * neighbor id.
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    // Corpus on the LEFT (streamed), probe set broadcast on the RIGHT —
    // without the explicit hint Spark builds the right side of a cross
    // join, which would broadcast the corpus.
    val joined = corpus.select(col("vec_id"), col("v"), col("nrm"))
      .crossJoin(broadcast(probes.select(col("vec_id").as("probe_id"),
        col("v").as("pv"), col("nrm").as("pn"))))
      .filter(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        (expr(dotSpark("pv", "v")) / (col("pn") * col("nrm"))).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    joined.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** [[bruteForceTopK]] with the native codegen'd `cosine_sim` expression
    * ([[graft.functions.CosineSim]]) instead of the interpreted HOF fold —
    * same plan shape, same bits, one fused loop inside whole-stage codegen.
    */
  def bruteForceTopKNative(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val joined = corpus.select(col("vec_id"), col("v"))
      .crossJoin(broadcast(probes.select(col("vec_id").as("probe_id"),
        col("v").as("pv"))))
      .filter(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        expr("cosine_sim(pv, v)").as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    joined.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** LSH index: the corpus exploded to one row per hash table,
    * (tbl, bucket, vec_id, v, nrm). At scale this L× index is the
    * classic LSH storage trade — built once, map-side, no shuffle.
    */
  def lshIndex(p: DataFrame, tables: Int = NumTables,
               bits: Int = TableBits): DataFrame =
    p.select(col("vec_id"), col("v"), col("nrm"),
        posexplode(expr(tableBucketsSpark("v", tables, bits)))
          .as(Seq("tbl", "bucket")))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("tbl").cast("long").as("tbl"), col("bucket"))

  /** Multi-table LSH top-k: candidates = union over L tables of the
    * probe's bucket (equi-join on (tbl, bucket) — never all-pairs).
    * `multiProbe` additionally probes every 1-bit-flip bucket in each
    * table ((bits+1)·L lookups) — the multi-probe trick that recovers
    * near-boundary neighbors without more tables. A pair colliding in
    * several tables is deduplicated by DISTINCT on the scored triple
    * (the cosine is a deterministic fold — duplicate rows are
    * bit-identical), so only the slim (probe, vec, cosine) triple
    * shuffles, not the vectors.
    *
    * Recall model (random hyperplane): per-bit agreement p = 1 − θ/π;
    * single-probe recall ≈ 1−(1−p^bits)^tables, multi-probe raises the
    * per-table term to p^b + b·p^(b−1)(1−p). Measured on the test corpus
    * in AnnRecallSpec.
    */
  def lshTableTopK(corpus: DataFrame, probes: DataFrame, k: Int,
                   multiProbe: Boolean, tables: Int = NumTables,
                   bits: Int = TableBits): DataFrame = {
    val idx = lshIndex(corpus, tables, bits)
    val pBase = lshIndex(probes, tables, bits)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("nrm").as("pn"), col("tbl"), col("bucket"))
    val pIdx =
      if (!multiProbe) pBase
      else pBase.select(col("probe_id"), col("pv"), col("pn"), col("tbl"),
        explode(array(col("bucket") +: (0 until bits).map(i =>
          expr(s"CAST(bucket ^ ${1L << i} AS BIGINT)")): _*)).as("bucket"))
    val cand = idx.join(broadcast(pIdx), Seq("tbl", "bucket"))
      .filter(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        (expr(dotSpark("pv", "v")) / (col("pn") * col("nrm"))).as("cosine"))
      .distinct()
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cand.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** IVF (inverted-file) ANN: every vector is assigned to its nearest
    * coarse centroid (one narrow pass against broadcast centroids), and a
    * probe searches its `nprobe` nearest centroids' inverted lists —
    * nprobe is the recall/cost knob (recall grows with the fraction of
    * lists scanned; cost is nprobe/|lists| of the corpus per probe). The
    * centroid count is the scale knob (≈√N lists keeps both the
    * assignment pass and the per-list candidate sets balanced).
    *
    * Returns (probe_id, vec_id, cid, cosine, rk ≤ k); a corpus vector
    * lives in exactly one list and a probe's probed lists are distinct,
    * so no pair dedup is needed. Assignment ties break on centroid id;
    * top-k ties on neighbor id.
    */
  /** Nearest-centroid assignment: each vector of `vecs` keeps its `n`
    * nearest (cosine) centroids — one narrow pass against the broadcast
    * centroid set; ties break on centroid id. The shared primitive of
    * IVF search (list build + probing) and centroid training (q81's
    * Lloyd step).
    */
  def assignToCentroids(vecs: DataFrame, centroids: DataFrame,
                        n: Int): DataFrame = {
    val scored = vecs.crossJoin(broadcast(centroids.select(
        col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        (expr(dotSpark("v", "cv")) / (col("nrm") * col("cn"))).as("c_cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("cid"))
    scored.withColumn("arn", row_number().over(w))
      .filter(col("arn") <= n)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
  }

  def ivfTopK(corpus: DataFrame, probes: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int = 1): DataFrame = {
    val lists = assignToCentroids(corpus, centroids, 1)
    val p = assignToCentroids(probes, centroids, nprobe)
      .select(col("vec_id").as("probe_id"),
        col("v").as("pv"), col("nrm").as("pn"), col("cid"))
    val scored = lists.join(broadcast(p), Seq("cid"))
      .filter(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"), col("cid"),
        (expr(dotSpark("pv", "v")) / (col("pn") * col("nrm"))).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Semantic dedup (the SemDeDup pipeline shape): duplicate verdicts
    * over vectors already assigned to a semantic cluster. A vector is
    * DROPPED when a lower-id vector in the same cluster is
    * cosine-similar above `threshold`; the survivor is the cluster
    * member with the smallest id — deterministic keep-one semantics,
    * the piece the pair-emitting near-dup operators (q40) don't give.
    *
    * `assigned` must carry (vec_id, v, nrm, cid) — the output of
    * [[assignToCentroids]](…, 1). Candidate pairs come from an equi-join
    * on (cid, sign-bucket), NOT all-pairs-within-cluster: the paper's
    * within-cluster pairwise pass is quadratic in cluster size (a
    * skewed cluster at 100 TB is an executor OOM), while the bucket key
    * subdivides every cluster so the join key cardinality grows with
    * the corpus. Scaled/exact duplicates agree on every sign bit, so
    * true-duplicate recall is unaffected by the subdivision — only
    * sub-threshold "semantic" pairs near a hyperplane are (acceptably)
    * split, same trade as [[bucketedNearDup]].
    *
    * Returns one row per dropped vector: (vec_id, cid, dup_of = the
    * smallest qualifying lower id, n_dups = how many lower-id
    * near-copies exist).
    */
  def semanticDedup(assigned: DataFrame, bits: Int,
                    threshold: Double): DataFrame = {
    val withBucket = assigned.withColumn("bucket",
      expr(bucketSpark("v", bits)))
    val a = withBucket.select(col("cid"), col("bucket"),
      col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = withBucket.select(col("cid"), col("bucket"),
      col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("cid", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .filter((expr(dotSpark("va", "vb")) / (col("na") * col("nb")))
        >= threshold)
      .groupBy(col("id_b"), col("cid"))
      .agg(min(col("id_a")).as("dup_of"), count(lit(1)).as("n_dups"))
      .select(col("id_b").as("vec_id"), col("cid"), col("dup_of"),
        col("n_dups"))
  }

  /** Bucketed near-duplicate pairs: equi-join on the LSH bucket, a < b,
    * cosine ≥ threshold. The bucket join is the candidate generator; the
    * cosine runs only on in-bucket pairs.
    */
  def bucketedNearDup(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"), col("v").as("va"),
      col("nrm").as("na"), col("bucket"))
    val b = corpus.select(col("vec_id").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("bucket"),
        (expr(dotSpark("va", "vb")) / (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}

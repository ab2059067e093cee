package graft

/** Recall of the ANN scale paths against exact brute force (VERDICT r02
  * missing-2): the oracle rows for q39/q46/q47 prove determinism of the
  * bucketing, not that the buckets find true neighbors. This spec
  * measures recall@5 of each ANN variant against the q38 brute-force
  * ground truth on sf0.01 and pins a floor — the number a user of an ANN
  * operator actually needs, and the empirical half of the recall/cost
  * trade the bucketing design claims (single-probe < multi-probe by
  * construction; IVF with nprobe=1 sits wherever its 8 coarse cells cut).
  */
class AnnRecallSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.01"
  private val K = 5 // LshK — every ANN query returns rk <= 5

  private def topSets(name: String): Map[Long, Set[Long]] = {
    val df = SparkEntry.queries(name)(spark, dir)
      .select("probe_id", "vec_id", "rk").collect()
    df.filter(_.getLong(2) <= K)
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
  }

  private def recallAt(name: String, truth: Map[Long, Set[Long]]): Double = {
    val got = topSets(name)
    val per = truth.map { case (p, t) =>
      got.getOrElse(p, Set.empty).count(t).toDouble / t.size
    }
    per.sum / per.size
  }

  test("ANN recall@5 vs brute force: multi-probe > single-probe; floors hold") {
    val truth = topSets("q38_cosine_topk")
    assert(truth.size === 10 && truth.values.forall(_.size === K))
    val single = recallAt("q39_cosine_lsh_topk", truth)
    val multi  = recallAt("q47_lsh_multiprobe", truth)
    val ivf    = recallAt("q46_ivf_topk", truth)
    info(f"recall@$K%d single-probe=$single%.3f multi-probe=$multi%.3f ivf=$ivf%.3f")
    // measured on this corpus: single 0.80, multi 1.00, ivf 0.46 —
    // floors leave slack for testdata regeneration, not for regression
    assert(single >= 0.6, f"single-probe LSH recall $single%.3f below floor")
    assert(multi >= single,
      f"multi-probe ($multi%.3f) must not lose recall vs single-probe ($single%.3f)")
    assert(multi >= 0.9, f"multi-probe LSH recall $multi%.3f below floor")
    // IVF probes 3 of 8 coarse lists (random centroids): recall tracks
    // the scanned fraction — the nprobe knob, not a defect
    assert(ivf >= 0.35, f"IVF nprobe=3 recall $ivf%.3f below floor")
  }

  // q119's integer grid, reproduced for exact in-memory ground truth
  private val Q = 1000000L
  private lazy val vecs: Map[Long, Array[Long]] =
    graft.core.Tables.embeddings(spark, dir)
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[Float](1)
          .map(x => math.floor(x.toDouble * Q).toLong).toArray
      }.toMap
  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.indices.map(i => { val d = a(i) - b(i); d * d }).sum
  private lazy val l2Truth: Map[Long, Set[Long]] =
    (0L until 10L).map { p =>
      val pv = vecs(p)
      p -> vecs.toSeq.filter(_._1 != p)
        .map { case (id, v) => (d2(pv, v), id) }
        .sorted.take(K).map(_._2).toSet
    }.toMap

  test("PQ/ADC recall@5 vs exact L2 brute force holds its floor") {
    // q119 ranks by approximate SQUARED-L2 (ADC over the quantized
    // grid), so its ground truth is the exact L2 top-k — not q38's
    // cosine truth (different metric, legitimately different
    // neighbors). Exact truth computed in-memory over the same
    // integer grid, same (dist, vec_id) tie order.
    val truth = l2Truth
    val pq = recallAt("q119_pq_adc", truth)
    info(f"recall@$K%d pq-adc=$pq%.3f (M=8 subvectors, K=32 codes, 1 Lloyd step)")
    // measured 0.26 with the in-plan one-Lloyd-step codebook (0.18
    // before training shipped) — UNIFORM-RANDOM embeddings are PQ's
    // worst case (no cluster structure for the codebook to exploit;
    // 40 bits of code against 64 i.i.d. dims is
    // information-theoretically starved). Real embedding corpora
    // cluster, and the production knobs are more Lloyd steps and
    // K=256. The floor pins the trained level (chance at k=5 of 499
    // ≈ 0.01); the mechanics themselves are oracle-bit-exact.
    assert(pq >= 0.2, f"PQ/ADC recall $pq%.3f below trained floor")
  }

  test("shipped q119 codebook ≡ one in-memory Lloyd step; training gains recall") {
    // substantiates the L58 claim that q81's quantized Lloyd step is
    // the codebook trainer — and, since r13, that q119 SHIPS it:
    // starting from the seed codebook (corpus vectors 100..131 per
    // 8-dim slice), ONE assignment→mean iteration in the same integer
    // arithmetic (order-free sums, floor-div mean — exactly q81's
    // update rule, applied per slice) must reproduce the shipped
    // plan's top-k sets EXACTLY and must not lose recall vs the
    // untrained book. Entirely in-memory: the distributed form of
    // this loop IS q81's plan shape run once per subvector.
    val (m, sub, kk) = (8, 8, 32)
    def subv(v: Array[Long], j: Int): Array[Long] =
      v.slice(j * sub, j * sub + sub)
    val book0: Array[Array[Array[Long]]] = Array.tabulate(m)(j =>
      (100L until (100L + kk)).map(c => subv(vecs(c), j)).toArray)
    def assign(x: Array[Long], cb: Array[Array[Long]]): Int =
      cb.indices.minBy(i => (d2(x, cb(i)), i))
    def lloyd(book: Array[Array[Array[Long]]]): Array[Array[Array[Long]]] =
      Array.tabulate(m) { j =>
        val members = vecs.values.toSeq.map(v => subv(v, j))
          .groupBy(x => assign(x, book(j)))
        Array.tabulate(kk) { i =>
          members.get(i) match {
            case Some(xs) => // integer mean, order-free: q81's update
              Array.tabulate(sub)(dim =>
                Math.floorDiv(xs.map(_(dim)).sum, xs.size.toLong))
            case None => book(j)(i) // empty cluster keeps its centroid
          }
        }
      }
    def adcTopSets(book: Array[Array[Array[Long]]]): Map[Long, Set[Long]] = {
      val codes = vecs.map { case (id, v) =>
        id -> Array.tabulate(m)(j => assign(subv(v, j), book(j)))
      }
      l2Truth.keys.map { p =>
        val pv = vecs(p)
        val dtab = Array.tabulate(m)(j =>
          book(j).map(cb => d2(subv(pv, j), cb)))
        p -> vecs.keys.filter(_ != p).toSeq
          .map(id => ((0 until m).map(j => dtab(j)(codes(id)(j))).sum, id))
          .sorted.take(K).map(_._2).toSet
      }.toMap
    }
    def recallOf(sets: Map[Long, Set[Long]]): Double = {
      val per = l2Truth.map { case (p, t) =>
        sets(p).count(t).toDouble / t.size }
      per.sum / per.size
    }
    val trainedSets = adcTopSets(lloyd(book0))
    val untrained = recallOf(adcTopSets(book0))
    val trained = recallOf(trainedSets)
    info(f"ADC recall@$K%d untrained=$untrained%.3f after-1-Lloyd=$trained%.3f")
    assert(trained >= untrained,
      f"one Lloyd step LOST recall: $untrained%.3f -> $trained%.3f")
    // the shipped plan IS this computation, distributed: same seed,
    // same assignment tie order, same floor-div means, same (dist, id)
    // top-k order — so the top-k SETS must agree exactly
    val shipped = topSets("q119_pq_adc")
    assert(shipped === trainedSets,
      "shipped q119 top-k sets diverge from the in-memory Lloyd-trained ADC")
  }

  // q120/q125's coarse level, replicated in-memory: seeds = corpus
  // vectors 100..107, then ONE quantized Lloyd step (assign → order-free
  // integer floor-div mean, empty cells keep their seed) — exactly the
  // trained coarse table the shipped plans broadcast since r14
  private val coarseIds = (100L to 107L).toSeq
  private lazy val coarseBook: Map[Long, Array[Long]] = {
    val assign = vecs.map { case (id, v) =>
      id -> coarseIds.minBy(c => (d2(v, vecs(c)), c)) }
    val members = vecs.toSeq.groupBy { case (id, _) => assign(id) }
    coarseIds.map { c =>
      c -> (members.get(c) match {
        case Some(ms) => Array.tabulate(64)(dim =>
          Math.floorDiv(ms.map(_._2(dim)).sum, ms.size.toLong))
        case None => vecs(c)
      })
    }.toMap
  }
  private lazy val cellOf: Map[Long, Long] = vecs.map { case (id, v) =>
    id -> coarseIds.minBy(c => (d2(v, coarseBook(c)), c))
  }
  private lazy val probedCells: Map[Long, Set[Long]] = l2Truth.keys.map { p =>
    p -> coarseIds.sortBy(c => (d2(vecs(p), coarseBook(c)), c)).take(3).toSet
  }.toMap

  test("IVFADC (q120) recall sits under its exact-IVF ceiling and above its floor") {
    // q120 scans nprobe=3 of 8 cells. Its recall is bounded above by
    // "exact L2 over exactly those cells' members" — any true neighbor
    // inside the scanned cells is, by definition of the global top-k,
    // also in the scanned cells' top-k, so that ceiling equals the
    // fraction of true neighbors the probed cells capture; ADC
    // approximation can only lose from there. Both sides computed on
    // the same integer grid with the same tie orders, over the TRAINED
    // coarse book (one Lloyd step — the spec replicates the training).
    val ceilingSets: Map[Long, Set[Long]] = l2Truth.keys.map { p =>
      val cells = probedCells(p)
      p -> vecs.keys.filter(id => id != p && cells(cellOf(id))).toSeq
        .map(id => (d2(vecs(p), vecs(id)), id))
        .sorted.take(K).map(_._2).toSet
    }.toMap
    def recallOf(sets: Map[Long, Set[Long]]): Double = {
      val per = l2Truth.map { case (p, t) =>
        sets.getOrElse(p, Set.empty[Long]).count(t).toDouble / t.size }
      per.sum / per.size
    }
    val ceiling = recallOf(ceilingSets)
    val got = topSets("q120_ivfadc")
    val ivfadc = recallOf(got)
    info(f"recall@$K%d ivfadc=$ivfadc%.3f (nprobe 3/8), exact-IVF ceiling=$ceiling%.3f")
    assert(ivfadc <= ceiling + 1e-9,
      f"IVFADC ($ivfadc%.3f) above its exact-scan ceiling ($ceiling%.3f)?!")
    // every returned neighbor must come from a probed cell — the
    // scanned-fraction contract (cost tracks nprobe) made observable
    val byCell = SparkEntry.queries("q120_ivfadc")(spark, dir)
      .select("probe_id", "vec_id", "cid").collect()
    byCell.foreach { r =>
      assert(probedCells(r.getLong(0))(r.getLong(2)),
        s"probe ${r.getLong(0)} returned a vector from unprobed cell ${r.getLong(2)}")
      assert(cellOf(r.getLong(1)) === r.getLong(2),
        s"vec ${r.getLong(1)} reported in cell ${r.getLong(2)} but lives in ${cellOf(r.getLong(1))}")
    }
    // measured 0.200 with the r14 trained coarse level (0.120 with raw
    // seed centroids; the ceiling rose 0.460 → 0.540). The untrained
    // losses composed multiplicatively (0.26 ADC × 0.46 capture ≈
    // 0.120 measured); the TRAINED composition beats the naive product
    // (0.26 × 0.54 = 0.14 < 0.200) because coarse training doesn't
    // just capture more neighbors — it SHRINKS the residuals the
    // shared codebook quantizes, so ADC quality inside probed cells
    // improves too and the two losses are no longer independent. Both
    // effects are the trade IVFADC sells — same codes as q119 at
    // ~nprobe/|cells| of its scan cost; the composition can never beat
    // the exact-IVF ceiling at equal nprobe, and the production levers
    // are nprobe, more Lloyd steps, and K=256.
    assert(ivfadc >= 0.15, f"IVFADC recall $ivfadc%.3f below trained floor")
  }

  test("random projection (q127): JL distortion concentrates; ranking is the hash's") {
    // What JL actually guarantees — and therefore what this pins — is
    // DISTANCE preservation: with ±1 signs, E[‖Pz‖²] = D′·‖z‖², so the
    // ratio proj_d2 / (D′·exact_d2) concentrates around 1 (relative
    // spread ≈ √(2/D′) = 0.35 at D′=16). Top-k RECALL on this fixture
    // is near-chance BY THE DATA'S NATURE, not the operator's: uniform
    // i.i.d. 64-dim vectors have min/median pairwise distance ≈ 0.64
    // (total concentration), and genuinely random ±1 matrices measure
    // recall@5 of 0.04–0.12 across seeds — the deterministic hash's
    // 0.06 sits inside that band (verified offline). So the spec
    // asserts the distortion bound and pins the shipped ranking to an
    // in-memory replica of the same hash; recall keeps only an
    // above-chance floor (chance ≈ 0.01). The hash is deliberately
    // NONLINEAR in i (cubic) — an LCG-style linear mix leaves signs
    // correlated across dimensions and biased the distortion median to
    // 0.4 before this one replaced it.
    val Dp = 16
    def sign(i: Int, k: Int): Long = {
      val a = i.toLong * Dp + k + 7
      1L - 2L * (((a * a * a % 2147483647L) / 4096L) % 2L)
    }
    val proj: Map[Long, Array[Long]] = vecs.map { case (id, v) =>
      id -> Array.tabulate(Dp)(k =>
        v.indices.map(i => v(i) * sign(i, k)).sum)
    }
    val ratios = (for {
      p <- 0L until 10L
      (id, v) <- vecs if id != p
    } yield d2(proj(p), proj(id)).toDouble / (Dp.toLong * d2(vecs(p), v))).toSeq
    val sortedR = ratios.sorted
    val median = sortedR(sortedR.size / 2)
    val within = ratios.count(r => r >= 0.3 && r <= 2.5).toDouble / ratios.size
    info(f"JL distortion: median=$median%.3f, ${within * 100}%.1f%% of pairs in [0.3, 2.5]")
    assert(median >= 0.7 && median <= 1.3,
      f"distortion median $median%.3f outside [0.7, 1.3] — projection is not isometric-in-expectation")
    assert(within >= 0.95,
      f"only ${within * 100}%.1f%% of pair distortions within [0.3, 2.5]")
    // shipped top-k must equal the in-memory replica's (same hash, same
    // (proj_d2, vec_id) tie order) — pins the plan's integer arithmetic
    val memSets: Map[Long, Set[Long]] = (0L until 10L).map { p =>
      p -> vecs.keys.filter(_ != p).toSeq
        .map(id => (d2(proj(p), proj(id)), id))
        .sorted.take(K).map(_._2).toSet
    }.toMap
    assert(topSets("q127_random_projection") === memSets,
      "shipped q127 top-k sets diverge from the in-memory sign-hash projection")
    val rp = recallAt("q127_random_projection", l2Truth)
    info(f"recall@$K%d random-projection(D'=16)=$rp%.3f (concentration-limited)")
    assert(rp >= 0.02, f"JL recall $rp%.3f below the above-chance floor")
  }

  test("exact re-rank (q125) recovers recall toward the exact-IVF ceiling") {
    // the refine-tier claim of L61: over-fetching RerankR=40 ADC
    // candidates and re-ranking by EXACT distance undoes the code-
    // quantization loss — recall must strictly beat raw IVFADC and sit
    // within reach of the exact-scan ceiling for the same (trained)
    // probed cells: any remaining gap is true neighbors the ADC
    // ranking pushed below rank R, not ranking error.
    val ceilingSets: Map[Long, Set[Long]] = l2Truth.keys.map { p =>
      val cells = probedCells(p)
      p -> vecs.keys.filter(id => id != p && cells(cellOf(id))).toSeq
        .map(id => (d2(vecs(p), vecs(id)), id))
        .sorted.take(K).map(_._2).toSet
    }.toMap
    def recallOf(sets: Map[Long, Set[Long]]): Double = {
      val per = l2Truth.map { case (p, t) =>
        sets.getOrElse(p, Set.empty[Long]).count(t).toDouble / t.size }
      per.sum / per.size
    }
    val raw = recallAt("q120_ivfadc", l2Truth)
    val reranked = recallAt("q125_ivfadc_rerank", l2Truth)
    val ceiling = recallOf(ceilingSets)
    info(f"recall@$K%d ivfadc=$raw%.3f reranked=$reranked%.3f ceiling=$ceiling%.3f")
    assert(reranked >= raw,
      f"exact re-rank LOST recall: $raw%.3f -> $reranked%.3f")
    assert(reranked <= ceiling + 1e-9,
      f"re-rank ($reranked%.3f) above its probed-cell ceiling ($ceiling%.3f)?!")
    // measured 0.500 vs ceiling 0.540 with the r14 trained coarse level
    // (0.320 vs 0.460 untrained) — the refine tier now sits within 0.04
    // of the cell-capture ceiling
    assert(reranked >= 0.4, f"re-ranked recall $reranked%.3f below trained floor")
    // within the returned set, exact_d2 must be genuinely exact — each
    // reported distance equals the in-memory integer L2
    SparkEntry.queries("q125_ivfadc_rerank")(spark, dir)
      .select("probe_id", "vec_id", "exact_d2").collect().foreach { r =>
        assert(r.getLong(2) === d2(vecs(r.getLong(0)), vecs(r.getLong(1))),
          s"probe ${r.getLong(0)} vec ${r.getLong(1)}: exact_d2 mismatch")
      }
  }

  test("ANN output is sound: ranks dense from 1, scores non-increasing") {
    for (name <- Seq("q39_cosine_lsh_topk", "q47_lsh_multiprobe",
        "q46_ivf_topk")) {
      val byProbe = SparkEntry.queries(name)(spark, dir)
        .select("probe_id", "vec_id", "cosine", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .groupBy(_._1)
      byProbe.foreach { case (p, rows) =>
        val sorted = rows.sortBy(_._4)
        assert(sorted.map(_._4).toList === (1L to sorted.length).toList,
          s"$name probe $p ranks not dense: ${sorted.map(_._4).mkString(",")}")
        assert(sorted.map(_._3).sliding(2).forall {
          case Array(a, b) => a >= b; case _ => true },
          s"$name probe $p cosine not non-increasing")
        val ids = sorted.map(_._2)
        assert(ids.distinct.length === ids.length,
          s"$name probe $p returned a duplicate neighbor")
      }
    }
  }
}

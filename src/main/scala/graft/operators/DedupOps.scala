package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for an LLM training-data pipeline: exact
  * (content-hash groupBy), near-dup via MinHash + LSH band bucketing, and
  * exact n-gram Jaccard as the verify/refine step.
  *
  * Scale design (100 TB):
  *  - Exact dedup shuffles a 32-hex-char content hash, never the raw text.
  *  - Near-dup NEVER builds all pairs: signatures are computed map-side,
  *    docs are exploded to (band_id, band_key) rows, and candidate pairs
  *    are generated only WITHIN an LSH bucket via a self-equi-join on the
  *    band key — a hash join whose key cardinality grows with the corpus,
  *    so it stays shuffle-balanced. Exact Jaccard runs only on the
  *    candidate set.
  *  - The test corpus plants known duplicates (exact copies and
  *    first-token-dropped near copies) so the oracle checks real recall,
  *    not an empty result.
  */
object DedupOps {
  val ShingleK   = 3   // words per shingle
  val NumHashes  = 12  // minhash signature length
  val Bands      = 4   // LSH bands (NumHashes / RowsPerBand)
  val RowsPerBand = NumHashes / Bands

  /** Planted duplicates: exact copies of doc_id < ExactCopyN at
    * +ExactCopyOffset, near copies (first token dropped) of
    * doc_id < NearCopyN at +NearCopyOffset.
    */
  val ExactCopyN = 30
  val ExactCopyOffset = 20000L
  val NearCopyN = 50
  val NearCopyOffset = 10000L

  // ---- corpus with planted duplicates (both dialects) -------------------
  /** documents ∪ exact copies ∪ near copies. The near copy drops the
    * first whitespace token: substr(text, len(tok1)+2).
    */
  def corpus(docs: DataFrame): DataFrame = {
    val exact = docs.filter(col("doc_id") < ExactCopyN)
      .select((col("doc_id") + ExactCopyOffset).as("doc_id"), col("text"))
    val near = docs.filter(col("doc_id") < NearCopyN)
      .select((col("doc_id") + NearCopyOffset).as("doc_id"),
        expr(s"substr(text, length(element_at(${TextOps.tokensSpark("text")}, 1)) + 2)")
          .as("text"))
    docs.select(col("doc_id"), col("text")).unionAll(exact).unionAll(near)
  }
  /** DuckDB CTE body mirroring [[corpus]] over the `documents` view. */
  val corpusDuck: String =
    s"""SELECT doc_id, text FROM documents
       |UNION ALL SELECT doc_id + $ExactCopyOffset AS doc_id, text
       |  FROM documents WHERE doc_id < $ExactCopyN
       |UNION ALL SELECT doc_id + $NearCopyOffset AS doc_id,
       |  substr(text, length(${TextOps.tokensDuck("text")}[1]) + 2) AS text
       |  FROM documents WHERE doc_id < $NearCopyN""".stripMargin

  // ---- exact dedup ------------------------------------------------------
  /** Exact dedup on normalized content: group by md5 of the normalized
    * text (32-char shuffle key, not the document body), keep the minimum
    * doc_id, report multiplicity. Returns only groups with >1 copy.
    */
  def exactDups(c: DataFrame): DataFrame =
    c.select(col("doc_id"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
  val exactDupsDuckBody: String =
    """SELECT content_hash, min(doc_id) AS keep_id, count(*) AS n_copies FROM (
      |  SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash
      |  FROM corpus)
      |GROUP BY content_hash HAVING count(*) > 1""".stripMargin

  // ---- minhash signatures + LSH bands -----------------------------------
  /** k-word shingles of the token array (empty if fewer than k tokens). */
  def shinglesSpark(text: String): String = {
    val toks = TextOps.tokensSpark(text)
    s"CASE WHEN size($toks) >= $ShingleK THEN " +
      s"array_distinct(transform(sequence(1, size($toks) - ${ShingleK - 1}), " +
      s"i -> concat_ws(' ', slice($toks, i, $ShingleK)))) ELSE array() END"
  }
  def shinglesDuck(text: String): String = {
    val toks = TextOps.tokensDuck(text)
    s"CASE WHEN len($toks) >= $ShingleK THEN " +
      s"list_distinct(list_transform(range(1, len($toks) - ${ShingleK - 2}), " +
      s"i -> array_to_string(list_slice($toks, i, i + ${ShingleK - 1}), ' '))) ELSE [] END"
  }

  /** MinHash signature: per seed j, min over shingles of md5('j|'||s).
    * md5 hex strings compare identically (ASCII) in both engines, so the
    * lexicographic min is a valid exchangeable hash family.
    */
  def signatureSpark(shingles: String): String =
    s"transform(sequence(0, ${NumHashes - 1}), j -> " +
      s"array_min(transform($shingles, s -> md5(concat(CAST(j AS STRING), '|', s)))))"
  def signatureDuck(shingles: String): String =
    s"list_transform(range(0, $NumHashes), j -> " +
      s"list_min(list_transform($shingles, s -> md5(CAST(j AS VARCHAR) || '|' || s))))"

  /** LSH band keys: md5 of the '#'-joined signature slice per band. */
  def bandKeysSpark(sig: String): String =
    s"transform(sequence(0, ${Bands - 1}), b -> " +
      s"md5(concat_ws('#', slice($sig, b * $RowsPerBand + 1, $RowsPerBand))))"
  def bandKeysDuck(sig: String): String =
    s"list_transform(range(0, $Bands), b -> " +
      s"md5(array_to_string(list_slice($sig, b * $RowsPerBand + 1, (b + 1) * $RowsPerBand), '#')))"

  /** (doc_id, sig) — the minhash signature table. A narrow map over the
    * corpus; at scale this is the table to persist (MEMORY_AND_DISK) when
    * more than one downstream pass needs it.
    */
  def signatures(c: DataFrame): DataFrame =
    c.select(col("doc_id"),
      expr(signatureSpark(shinglesSpark("text"))).as("sig"))
  def signaturesFromShingles(shingled: DataFrame): DataFrame =
    shingled.select(col("doc_id"), expr(signatureSpark("sh")).as("sig"))

  /** (doc_id, band_id, band_key) rows — the LSH bucket table. Signature
    * computation is a narrow map; only the slim bucket triple shuffles.
    */
  def lshBuckets(c: DataFrame): DataFrame =
    lshBucketsFromSig(signatures(c))
  def lshBucketsFromSig(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"),
        posexplode(expr(bandKeysSpark("sig"))).as(Seq("band_id", "band_key")))
      .select(col("doc_id"), col("band_id").cast("long").as("band_id"), col("band_key"))
  def lshBucketsDuckBody: String =
    s"""SELECT doc_id, CAST(b.band_id AS BIGINT) AS band_id,
       |  md5(array_to_string(list_slice(sig, b.band_id * $RowsPerBand + 1,
       |      (b.band_id + 1) * $RowsPerBand), '#')) AS band_key
       |FROM (SELECT doc_id, ${signatureDuck(shinglesDuck("text"))} AS sig FROM corpus),
       |     (SELECT unnest(range(0, $Bands)) AS band_id) b""".stripMargin

  /** Candidate pairs: self-join inside (band_id, band_key), a < b,
    * distinct. Never an all-pairs product — the join key is the bucket.
    */
  def candidatePairs(buckets: DataFrame): DataFrame = {
    val a = buckets.as("a"); val b = buckets.as("b")
    a.join(b, col("a.band_id") === col("b.band_id") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }
  val candidatePairsDuckBody: String =
    """SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |FROM buckets a JOIN buckets b
      |  ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id""".stripMargin

  /** Exact n-gram Jaccard verify over candidate pairs: join the (small)
    * candidate set back to per-doc shingle sets, compute
    * |∩| / |∪| in double, keep pairs ≥ threshold.
    */
  def jaccardVerify(c: DataFrame, pairs: DataFrame, threshold: Double): DataFrame =
    jaccardVerifyShingled(
      c.select(col("doc_id"), expr(shinglesSpark("text")).as("sh")),
      pairs, threshold)
  def jaccardVerifyShingled(sh: DataFrame, pairs: DataFrame,
                            threshold: Double): DataFrame = {
    pairs
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        expr("CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE) / " +
             "CAST(size(array_union(sh_a, sh_b)) AS DOUBLE)").as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
  def jaccardVerifyDuckBody(threshold: Double): String =
    s"""SELECT id_a, id_b,
       |  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
       |  CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) AS jaccard
       |FROM pairs
       |JOIN shingled sa ON sa.doc_id = id_a
       |JOIN shingled sb ON sb.doc_id = id_b
       |WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
       |      CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) >= $threshold""".stripMargin
}

package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators over a document corpus.
  *
  * Scale design: every variant is bucket-first. The only shuffle key is
  * either the content hash (exact) or an LSH band bucket (near-dup), so
  * candidate comparison is confined to within-bucket pairs — never an
  * all-pairs cross join. At 100 TB the band tables stay proportional to the
  * corpus (numBands rows per doc) and AQE's skew splitting handles hot
  * buckets (e.g. boilerplate-heavy shingles).
  */
object Dedup {

  /** Exact dedup, canonical-representative form: keep min(id) per identical
    * `textCol`. Grouping by a 64-bit content hash first keeps the shuffle
    * key fixed-width (16 bytes vs arbitrary document text) — at 100 TB the
    * shuffle moves hashes + ids, not documents.
    */
  def exactCanonical(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("__h", xxhash64(col(textCol)))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_cnt"))
      .drop("__h")

  /** Exact dedup, row-preserving form (`dropDuplicates`). */
  def exactRows(docs: DataFrame, keys: Seq[String]): DataFrame =
    docs.dropDuplicates(keys)

  /** MinHash + LSH near-duplicate candidate pairs.
    *
    * shingle → minhash signature (numHashes lanes) → split into bands →
    * hash each band → self-join per (band, bandHash) bucket → distinct
    * id pairs. With r rows/band and b bands, a pair with Jaccard s is
    * caught with probability 1-(1-s^r)^b — the standard S-curve; defaults
    * (16 hashes, 4 bands of 4) catch s ≳ 0.6 reliably.
    *
    * The returned pairs carry the true shingle-Jaccard for post-filtering.
    */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                            numHashes: Int = 16, bands: Int = 4,
                            shingleK: Int = 5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into equal bands")
    val rowsPerBand = numHashes / bands
    val sig = docs.select(
      col(idCol).as("id"),
      col(textCol).as("text"),
      minhashSignature(col(textCol), numHashes, shingleK).as("sig"))

    // (id, band, bandHash): one row per document per band.
    val banded = sig.select(
      col("id"), col("text"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws("|",
          (0 until rowsPerBand).map(r => col("sig").getItem(b * rowsPerBand + r)): _*))
      }: _*)).as(Seq("band", "band_hash")))

    val l = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("text").as("text_a"))
    val r = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("text").as("text_b"))

    l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(shinglesOf(col("text_a"), shingleK), shinglesOf(col("text_b"), shingleK))
          .as("jaccard"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Near-dup pairs above a Jaccard threshold (LSH candidates, verified). */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.8): DataFrame =
    minhashCandidatePairs(docs, idCol, textCol)
      .filter(col("jaccard") >= threshold)

  /** SimHash near-dup pairs: 64-bit signature, banded into 4×16-bit chunks
    * (pigeonhole: hamming ≤ 3 ⟹ at least one identical chunk), bucket
    * self-join per chunk, verify with true hamming distance. Same
    * bucket-not-all-pairs scaling argument as MinHash.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val sig = docs.select(col(idCol).as("id"), simhash64(col(textCol)).as("sh"))
    val chunked = sig.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map { c =>
        shiftrightunsigned(col("sh"), c * 16).bitwiseAND(lit(0xFFFFL))
      }: _*)).as(Seq("chunk", "chunk_val")))
    val l = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val r = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDistance(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** N-gram Jaccard similarity for given candidate id pairs (exact verify
    * step; candidates come from LSH, never all-pairs).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        pairs: DataFrame, n: Int = 3): DataFrame = {
    val grams = docs.select(col(idCol).as("id"), wordNgrams(col(textCol), n).as("grams"))
    pairs
      .join(grams.withColumnRenamed("id", "id_a").withColumnRenamed("grams", "grams_a"), "id_a")
      .join(grams.withColumnRenamed("id", "id_b").withColumnRenamed("grams", "grams_b"), "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("grams_a"), col("grams_b")).as("ngram_jaccard"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-scale near-duplicate detection for training-data pipelines:
  * exact fingerprints, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale stance (100 TB): every operator here is
  * scan → narrow per-row transforms → ONE keyed shuffle (band bucket /
  * fingerprint). No cross joins: candidate generation is always via an
  * inverted index (band hash or shingle), so cost is O(collisions) not
  * O(n²). Signatures are fixed-width arrays of longs — cheap to
  * shuffle and spill-friendly.
  */
object Dedup {

  /** Whitespace word tokens of a text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram shingles, distinct. */
  def shingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    array_distinct(
      when(size(w) < n, array(array_join(w, " ")))
        .otherwise(transform(sequence(lit(1), size(w) - (n - 1)),
          i => array_join(slice(w, i, lit(n)), " "))))
  }

  /** Exact duplicate fingerprint: md5 of whitespace-normalized text. */
  def exactFingerprint(text: Column): Column =
    md5(trim(regexp_replace(text, "\\s+", " ")))

  // Affine permutations (a·h + b) mod p over a base 31-bit hash give k
  // independent MinHash functions from one xxhash64 pass. p = 2^61-1
  // (Mersenne prime); h is masked to 31 bits so a·h stays < 2^62 and
  // never overflows a long (ANSI-safe).
  private val mersenne61 = (1L << 61) - 1

  private def hashCoeffs(k: Int, seed: Long): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(k)((rng.nextInt(Int.MaxValue).toLong + 1L,
      rng.nextInt(Int.MaxValue).toLong))
  }

  /** MinHash signature: array of k minimums of permuted shingle hashes.
    * Pure per-row column algebra — no shuffle, no UDF.
    */
  def minhashSignature(text: Column, numHashes: Int = 64,
      shingleSize: Int = 3, seed: Long = 42L): Column = {
    val base = transform(shingles(text, shingleSize),
      s => xxhash64(s).bitwiseAND(lit(0x7FFFFFFFL)))
    val coeffs = hashCoeffs(numHashes, seed)
    array(coeffs.map { case (a, b) =>
      array_min(transform(base, h => pmod(h * a + b, lit(mersenne61))))
    }: _*)
  }

  /** LSH banding: (docId, band, bandHash) rows — one per band. Equal
    * bandHash within a band ⇒ candidate duplicate pair. `bands` must
    * divide the signature length.
    */
  def lshBands(df: DataFrame, idCol: String, sigCol: String,
      bands: Int): DataFrame = {
    val sig = col(sigCol)
    val rows = size(sig) / bands
    df.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws("_",
            b.cast("string"),
            array_join(slice(sig, b * rows + 1, rows), "_")))))
        .as(Seq("band", "band_hash")))
  }

  /** MinHash-LSH candidate pairs with estimated Jaccard (fraction of
    * matching signature positions). One shuffle on (band, band_hash);
    * pairs deduped across bands via min-band aggregation.
    */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      minEstimate: Double = 0.0): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"),
      minhashSignature(col(textCol), numHashes, shingleSize).as("sig"))
    val banded = lshBands(sigs, "id", "sig", bands)
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
    pairs
      .join(sigs.select(col("id").as("id1"), col("sig").as("sig1")), "id1")
      .join(sigs.select(col("id").as("id2"), col("sig").as("sig2")), "id2")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig1"), col("sig2"),
          (x, y) => x === y), b => b)).cast("double") /
          size(col("sig1")).cast("double"))
      .filter(col("est_jaccard") >= minEstimate)
      .select(col("id1"), col("id2"), col("est_jaccard"))
  }

  /** 64-bit SimHash over word tokens, pure per-row fold: per bit,
    * +1/-1 votes from each token's xxhash64; sign of the vote total
    * sets the bit. Bit positions are addressed through a constant mask
    * array (shift functions take only literal shift amounts).
    */
  private val bitMasks: Column = typedLit((0 until 64).map(1L << _))

  def simhash64(text: Column): Column = {
    val votes = aggregate(
      tokens(text),
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc,
        transform(bitMasks,
          m => when(xxhash64(t).bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)),
        (a, v) => a + v))
    aggregate(
      zip_with(votes, bitMasks,
        (v, m) => when(v > 0, m).otherwise(0L)),
      lit(0L), (acc, bit) => acc.bitwiseOR(bit))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidate pairs: band the 64 bits into `bands`
    * equal keys (any exact band match ⇒ candidate). Pigeonhole: every
    * pair within Hamming distance `bands - 1` is guaranteed to share at
    * least one band; the full distance then verifies. `bands` must
    * divide 64.
    */
  def simhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      maxDistance: Int = 3, bands: Int = 8): DataFrame = {
    val width = 64 / bands
    val mask = (1L << width) - 1
    val sigs = docs.select(col(idCol).as("id"), simhash64(col(textCol)).as("sh"))
    val banded = sigs.select(col("id"), col("sh"), posexplode(
      array((0 until bands).map(b => concat_ws(":", lit(b),
        shiftrightunsigned(col("sh"), b * width).bitwiseAND(lit(mask))
          .cast("string"))): _*))
      ).toDF("id", "sh", "band", "band_key")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        hammingDistance(col("a.sh"), col("b.sh")).as("hamming")).distinct()
      .filter(col("hamming") <= maxDistance)
  }

  /** Exact n-gram Jaccard over candidate pairs via inverted shingle
    * index (SURVEY-declared semantics; the oracle-checked query in
    * TextQueries instantiates the same shape).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      shingles(col(textCol), n).as("shingles"))
    val sizes = sh.select(col("id"), size(col("shingles")).cast("long").as("n"))
    val inv = sh.select(col("id"), explode(col("shingles")).as("s"))
    inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("id1", "n1"), "id1")
      .join(sizes.toDF("id2", "n2"), "id2")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n1") + col("n2") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), col("jaccard"))
  }
}

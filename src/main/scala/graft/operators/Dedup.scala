package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design (100 TB corpora):
  *  - nothing here is all-pairs: candidate generation always goes through a
  *    bounded blocking key (content hash, LSH band, SimHash band) so the
  *    only shuffles are hash-partitioned groupBy/join on those keys;
  *  - signatures are computed row-local with higher-order functions (no
  *    explode of shingles across the wire — a doc's shingle set never
  *    leaves its partition; only the fixed-width signature does);
  *  - band self-joins shuffle (band_id, band_hash) pairs — even at 10^11
  *    docs each bucket holds only near-duplicate cluster members.
  */
object Dedup {

  // ---- exact ---------------------------------------------------------

  /** Exact dedup groups: one row per distinct content, the kept (minimum)
    * id and the duplicate count. `hashFn` defaults to md5 for cross-engine
    * verifiability; xxhash64 is the cheaper production choice. */
  def exactGroups(df: DataFrame, text: Column, id: Column,
                  hashFn: Column => Column = md5): DataFrame =
    df.groupBy(hashFn(text).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** The deduplicated corpus: keep the min-id doc of each content group. */
  def exact(df: DataFrame, text: Column, id: Column): DataFrame = {
    val keep = exactGroups(df, text, id, xxhash64(_)).select(col("keep_id"))
    df.join(keep, id === col("keep_id"), "left_semi")
  }

  // ---- shingles ------------------------------------------------------

  /** Distinct word k-shingles (k consecutive tokens joined by a space). */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = TextFns.tokens(text)
    array_distinct(
      transform(sequence(lit(1), greatest(size(toks) - (k - 1), lit(0))),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** Distinct character n-grams. */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(
      transform(sequence(lit(1), greatest(length(text) - (n - 1), lit(0))),
        i => substring(text, lit(i), lit(n)).asInstanceOf[Column]))

  /** Exact Jaccard similarity between two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    when(union === 0, lit(0.0)).otherwise(inter.cast(DoubleType) / union.cast(DoubleType))
  }

  // ---- MinHash + LSH -------------------------------------------------

  /** 64-bit base hashes of each shingle (seeded xxhash64). */
  private def shingleHashes(shingles: Column): Column =
    transform(shingles, s => xxhash64(s))

  /** MinHash signature over PRE-HASHED shingles: numHashes mins over an
    * affine permutation family, as a native codegen Expression
    * (graft.plans.MinHashSig) — a single primitive loop per row, no
    * interpreted lambda folds, no shuffle. */
  def minhashSignature(preHashed: Column, numHashes: Int): Column =
    graft.plans.Signatures.minhashSig(preHashed, numHashes)

  /** (band_idx, band_hash) rows per doc: signature cut into `bands` bands
    * of `rows` values, each band hashed to one 64-bit key. */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"), xxhash64(b, slice(sig, b * rows + 1, lit(rows))).as("band_hash")))

  /** Near-duplicate pairs via MinHash LSH, verified with exact Jaccard.
    *
    * Emits (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    * Pipeline: signature (row-local) → band explode (rows × bands) →
    * self-join on (band, band_hash) → distinct candidate pairs → exact
    * verify on the candidates only. */
  def minhashLshPairs(df: DataFrame, text: Column, id: Column,
                      shingleK: Int = 3, numHashes: Int = 64,
                      bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    // Shingle SETS are carried as distinct 64-bit hashes (native kernel —
    // no shingle strings ever materialize); Jaccard over hash sets equals
    // Jaccard over shingle sets. Persisted: referenced by the band explode
    // AND both candidate-pair fetches — without it the pipeline runs three
    // times. (At scale this is the signature table you'd materialize
    // anyway.) Eager count: the three consumers otherwise race to populate
    // the cache (block-lock contention + duplicated compute).
    val docs = df.select(id.as("doc_id"),
        graft.plans.Signatures.shingleHashes(
          graft.functions.TextFns.tokens(text), shingleK).as("sh_hashes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    // Band rows carry ONLY (band, band_hash, doc_id) — never the shingle
    // arrays. The bands explode multiplies row count by `bands`; keeping
    // the payload to 20 bytes/row keeps the LSH shuffle ~free. Shingle
    // sets are fetched back by id for just the candidate pairs.
    // `sig` must be its own column before banding: an expression embedded
    // inside the lshBands lambda would be re-evaluated once per band.
    val banded = docs
      .withColumn("sig", minhashSignature(col("sh_hashes"), numHashes))
      .select(col("doc_id"), explode(lshBands(col("sig"), bands, rows)).as("b"))
      .select(col("doc_id"), col("b.band"), col("b.band_hash"))
    // Candidate pairs by bucket-local expansion: ONE scan + one shuffle on
    // the band key (a self-join would scan the signature pipeline twice).
    // Oversized buckets (degenerate band values) are dropped — at corpus
    // scale a bucket beyond maxBucket means a pathological shingle (think
    // boilerplate), and its O(m²) pairs would dominate the stage.
    val maxBucket = 10000
    val candidates = banded
      .groupBy(col("band"), col("band_hash"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucket)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(least(x, y).as("id_a"), greatest(x, y).as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    // Exact-verify fetch: the candidate set is orders of magnitude smaller
    // than the corpus, so broadcast IT and stream the shingle table —
    // never the reverse (and never let AQE flip this join by stats).
    val a = docs.select(col("doc_id").as("id_a"), col("sh_hashes").as("sh_a"))
    val b = docs.select(col("doc_id").as("id_b"), col("sh_hashes").as("sh_b"))
    val withA = a.join(broadcast(candidates), Seq("id_a"))
    b.join(broadcast(withA), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- SimHash -------------------------------------------------------

  /** 64-bit SimHash signatures, one row per doc: per-token hashes vote ±1
    * on each bit; the sign of each bit-sum becomes the fingerprint bit.
    * Entirely row-local via the native codegen kernel
    * (graft.plans.SimHash64) — signature computation stays inside the
    * scan stage, zero shuffle. (Earlier shapes — 64 interpreted array
    * folds, then explode + 64-sum hash aggregate — were 60× and 4×
    * slower respectively at sf0.1.) */
  def simhashSignatures(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(id.as("doc_id"),
      graft.plans.Signatures.simhash64(TextFns.tokens(text)).as("sig"))

  /** SimHash near-dup candidate pairs: block on 4 × 16-bit bands (any pair
    * within hamming distance 3 shares at least one band), then verify
    * hamming distance <= maxHamming via bit_count(xor). */
  def simhashPairs(df: DataFrame, text: Column, id: Column,
                   maxHamming: Int = 3): DataFrame = {
    val withSig = simhashSignatures(df, text, id)
    val bandStructs = array((0 until 4).map(b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL)).as("band_val"))): _*)
    val banded = withSig.select(col("doc_id"), col("sig"),
        explode(bandStructs).as("b"))
      .select(col("doc_id"), col("sig"), col("b.band"), col("b.band_val"))
    // Bucket-local pair expansion: one scan of the signature pipeline and
    // one shuffle on the band key; hamming is computed inside the bucket
    // (it is symmetric, so least/greatest id normalization is safe).
    val maxBucket = 10000
    banded
      .groupBy(col("band"), col("band_val"))
      .agg(collect_list(struct(col("doc_id"), col("sig"))).as("ms"))
      .filter(size(col("ms")) >= 2 && size(col("ms")) <= maxBucket)
      .select(explode(flatten(transform(col("ms"), (x, i) =>
        transform(slice(col("ms"), i + lit(2), size(col("ms"))),
          y => struct(
            least(x.getField("doc_id"), y.getField("doc_id")).as("id_a"),
            greatest(x.getField("doc_id"), y.getField("doc_id")).as("id_b"),
            x.getField("sig").bitwiseXOR(y.getField("sig")).as("x")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"),
        bit_count(col("p.x")).cast(LongType).as("hamming"))
      .groupBy(col("id_a"), col("id_b")).agg(min(col("hamming")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}

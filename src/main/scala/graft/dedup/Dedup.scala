package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-corpus training-data pipelines:
  * exact, MinHash+LSH, SimHash, and n-gram Jaccard (SURVEY §7.4 item 6).
  *
  * Scale design: nothing here ever does an all-pairs comparison of the
  * corpus. Exact dedup is a hash groupBy; MinHash/LSH compares only
  * within LSH band-buckets (candidate generation is a self-join on the
  * band signature, so the shuffle key is the 8-byte signature, not the
  * document); SimHash compares only within band-buckets of the 64-bit
  * fingerprint. At 100 TB the only wide shuffles are on small fixed-width
  * keys.
  */
object Dedup {

  /** Exact dedup via hash groupBy: canonical representative = min doc_id
    * per distinct text (deterministic, unlike `dropDuplicates`). */
  def exactDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy("text")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  /** Exact-dup profile by language: total vs distinct texts. */
  def dupStatsByLang(documents: DataFrame): DataFrame =
    documents
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_unique"))
      .withColumn("dup_ratio",
        round(lit(1.0) - col("n_unique").cast("double") / col("n_docs"), 6))
      .orderBy("lang")

  /** Word k-shingles, distinct per doc. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = filter(split(text, " "), t => length(t) > 0)
    val n = size(toks)
    array_distinct(
      when(n >= k,
        transform(sequence(lit(0), n - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** MinHash signatures: k independent permutations approximated by
    * `(a_i * xxhash64(shingle) + b_i) mod p`, min per doc — all
    * codegen'd builtins (explode → groupBy doc, min over k columns).
    * Standard MinHash per Broder '97; same construction as
    * `spark.ml.feature.MinHashLSH`, kept declarative so Catalyst plans
    * the partial aggregation. */
  // 2^31 - 1: keeps every (h*a + b) product < 2^63, so the modular
  // arithmetic stays exact under ANSI mode (no long wraparound).
  private val MersennePrime = 2147483647L
  private def perm(i: Int): (Long, Long) = {
    // Deterministic pseudo-random odd multipliers (splitmix64 on seed i).
    var z = i.toLong * 0x9E3779B97F4A7C15L + 0x12345678L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    val a = math.abs(z ^ (z >>> 31)) % (MersennePrime - 1) + 1
    val b = math.abs(z * 0x2545F4914F6CDD1DL) % MersennePrime
    (a, b)
  }

  /** doc_id → minhash signature array of length `numHashes`. */
  def minhashSignatures(documents: DataFrame, numHashes: Int = 64,
                        shingleK: Int = 3): DataFrame = {
    val sh = documents
      .select(col("doc_id"), explode(shingles(col("text"), shingleK)).as("sh"))
      .withColumn("h", pmod(xxhash64(col("sh")), lit(MersennePrime)))
    val minCols = (0 until numHashes).map { i =>
      val (a, b) = perm(i)
      min(pmod(col("h") * lit(a) + lit(b), lit(MersennePrime))).as(s"m$i")
    }
    sh.groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH banding: split the signature into `bands` bands of rows, hash
    * each band, self-join on (band, bandHash) to get candidate pairs,
    * then estimate Jaccard as signature agreement fraction. */
  def minhashNearDups(documents: DataFrame, numHashes: Int = 64,
                      bands: Int = 16, shingleK: Int = 3): DataFrame = {
    val rows = numHashes / bands
    val sigs = minhashSignatures(documents, numHashes, shingleK)
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, rows)))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    val a = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          eq => eq)).cast("double") / numHashes).as("est_jaccard"))
      .distinct()
  }

  /** SimHash 64-bit fingerprint from token hashes: per bit position,
    * sign of Σ±1 over tokens (Charikar '02). Declarative form: transform
    * over 64 bit positions folding the token-hash array. */
  def simhash(text: Column): Column = {
    val toks = array_distinct(filter(split(text, " "), t => length(t) > 0))
    val hashes = transform(toks, t => xxhash64(t))
    (0 until 64).map { j =>
      val bitSum = aggregate(hashes, lit(0),
        (s, h) => s + when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(bitSum > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  def withSimhash(documents: DataFrame): DataFrame =
    documents.withColumn("simhash", simhash(col("text")))

  /** SimHash near-dup candidates: band the 64-bit fingerprint into 4
    * 16-bit chunks (Hamming ≤3 ⇒ some chunk equal), self-join per chunk,
    * verify with popcount of XOR. */
  def simhashNearDups(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = withSimhash(documents).select("doc_id", "simhash")
    val banded = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val a = banded.select(col("band"), col("chunk"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("chunk"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram (token k-shingle) Jaccard for pairs within a blocking
    * key (here `source`): |A∩B| / |A∪B| via array builtins. Blocked
    * self-join — never all-pairs across the corpus. */
  def ngramJaccardPairs(documents: DataFrame, shingleK: Int = 3): DataFrame = {
    val d = documents.select(col("doc_id"), col("source"),
      shingles(col("text"), shingleK).as("sh"))
    val a = d.select(col("source"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = d.select(col("source"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("source"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("source"), col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6).as("jaccard"))
  }

  /** Top-N most similar same-source pairs by exact shingle Jaccard. */
  def topJaccardPairs(documents: DataFrame, n: Int = 20): DataFrame =
    ngramJaccardPairs(documents)
      .orderBy(desc("jaccard"), asc("doc_a"), asc("doc_b"))
      .limit(n)
}

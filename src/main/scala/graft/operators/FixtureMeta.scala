package graft.operators

import org.apache.spark.sql.SparkSession

/** Content-fingerprint sidecar for persisted serving fixtures (IVF
  * codebooks, BPE merge tables — r12 verdict item 7): the graph cache
  * keys its entries by a SOURCE-dir fingerprint, but the save/load
  * pairs in [[IvfIndex]] and [[Bpe]] had no integrity check at all —
  * a partially-overwritten or foreign parquet at the path would load
  * silently and serve wrong assignments/tokenizations. Saves now write
  * `_graft_meta.json` beside the parquet with the row count and an
  * order-free content hash; loads re-derive both from what they read
  * and fail LOUDLY on mismatch. A missing sidecar (pre-r13 save, or a
  * hand-placed fixture) loads with no check — the legacy contract is
  * "the path is immutable while in use", now documented instead of
  * assumed.
  *
  * The hash is order-free (wrapping sum of per-row hashes) because
  * parquet readers may deliver rows in any order; per-row hashes come
  * from exact canonical strings (doubles via raw bits), so any value
  * change — even 1 ulp — flips it.
  */
object FixtureMeta {

  val FileName = "_graft_meta.json"

  def rowHash(canonical: String): Long =
    scala.util.hashing.MurmurHash3.stringHash(canonical).toLong &
      0xffffffffL

  /** Order-free combination: wrapping sum. */
  def combine(hashes: Iterator[Long]): Long = {
    var h = 0L
    while (hashes.hasNext) h += hashes.next()
    h
  }

  private def metaPath(path: String) =
    new org.apache.hadoop.fs.Path(path, FileName)

  def write(spark: SparkSession, path: String, n: Long, hash: Long): Unit = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      s"""{"n":$n,"hash":"${java.lang.Long.toHexString(hash)}"}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  /** Verify reloaded content against the sidecar; no-op when the
    * sidecar is absent (legacy / hand-placed fixture). */
  def check(spark: SparkSession, path: String, n: Long, hash: Long): Unit = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val in = fs.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val nRe = """"n":(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
    val hRe = """"hash":"([0-9a-f]+)"""".r.findFirstMatchIn(txt)
      .map(m => java.lang.Long.parseUnsignedLong(m.group(1), 16))
    require(nRe.contains(n) && hRe.contains(hash),
      s"FixtureMeta: content at $path does not match its $FileName " +
        s"sidecar (read n=$n hash=${java.lang.Long.toHexString(hash)}, " +
        s"sidecar $txt) — the fixture was overwritten or truncated " +
        "after it was saved; re-save it or remove the stale sidecar")
  }
}

package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic engine-portable hashing shared by the pipeline ops: all
  * derived from md5 prefixes so a DuckDB oracle reproduces every value
  * bit-for-bit (`conv(substr(md5(x),1,15),16,10)` ≡
  * `('0x'||substr(md5(x),1,15))::BIGINT`). */
object Hashing {
  /** md5-prefix → 60-bit positive long, identical in DuckDB. */
  def h64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** md5-derived integer in [-1000, 1000] for hyperplane components:
    * `((md5int(i_j) % 2001) - 1000`, reproducible in SQL. */
  def planeWeight(i: Int, j: Int): Long = {
    val hex = md5Hex(s"${i}_$j", 8).take(15)
    (java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L
  }

  /** Driver-side md5 prefix as lowercase hex (`bytes` leading bytes =
    * 2·bytes hex chars) — the one home for the hashing idiom the
    * stream-run tags and BM25 stat aliases share. */
  def md5Hex(s: String, bytes: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).take(bytes).map("%02x".format(_)).mkString
  }
}

package graft.engine

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.jdk.CollectionConverters._

/** Per-split Bloom filter over the distinct tokens of one indexed text
  * field — the coarse stand-in for the reference's per-split inverted
  * index (tantivy gives every split a real term dictionary,
  * `/root/reference/src/commands/search.rs:186-188`), sized for the
  * manifest layer instead of the data layer.
  *
  * Why it exists: zone maps and small dictionaries prune numeric / ip /
  * time / low-cardinality-raw queries, but a term query on a tokenized
  * text field — the engine's core verb — otherwise opens EVERY split at
  * 100 TB. A few-KB digest per split lets the searcher discard splits
  * that provably lack a required token before a single data file is
  * listed. False positives only widen the scan (never lose a match);
  * a missing digest never prunes.
  *
  * Mechanics: standard Bloom filter with [[TermDigest.K]] bit positions
  * per token derived Kirsch-Mitzenmacher style (`h1 + i*h2`) from the md5
  * of the token (the engine's portable hash family). `m` is always a
  * power of two, so a filter built at [[TermDigest.BuildBits]] can be
  * FOLDED in half (OR the two halves) without rehashing — position
  * arithmetic `& (m-1)` commutes with the fold — which is how one
  * fixed-size build pass adapts per split: small splits fold down to
  * [[TermDigest.MinBits]], vocabulary-heavy splits stay large, and
  * saturated filters (fill > [[TermDigest.MaxFill]], useless for
  * pruning) are dropped entirely.
  *
  * Storage: digests live in a `_digests.json` sidecar INSIDE the split
  * directory (the `_` prefix keeps it invisible to the Parquet reader),
  * written before the manifest commit like all split data; the manifest
  * entry carries only the sidecar's md5 ([[SplitInfo.digest]]), so the
  * hot-path manifest read stays O(bytes) per split and the searcher
  * fetches + memoizes a digest once per split, amortized across every
  * later query. At 100k splits that is one small GET per split per
  * searcher lifetime — not per query, and never the manifest itself
  * ballooning to megabytes.
  */
final class TermDigest(val k: Int, val bits: Array[Long],
    val hasPrefixes: Boolean = true) {
  /** Filter size in bits (always a power of two). */
  def m: Int = bits.length << 6

  /** Membership probe for a token OR a [[TermDigest.prefixKey]] marker.
    * A digest from a sidecar written before prefix markers existed
    * (`pfx` absent) cannot prove a marker absent — answer true
    * (never-prune-on-missing, the family's standing rule). */
  def mightContain(token: String): Boolean = {
    if (!hasPrefixes && token.nonEmpty &&
        token.charAt(0) == TermDigest.PrefixMarker) return true
    val (h1, h2) = TermDigest.hashFor(token)
    val mask = (m - 1).toLong
    var i = 0
    while (i < k) {
      val pos = ((h1 + i.toLong * h2) & mask).toInt
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Fraction of set bits — the pruning-power diagnostic. */
  def fill: Double = {
    var c = 0L
    var i = 0
    while (i < bits.length) { c += java.lang.Long.bitCount(bits(i)); i += 1 }
    c.toDouble / m
  }

  /** Halve the filter by OR-ing its halves: membership is preserved
    * because positions are `hash & (m-1)` with m a power of two. */
  def fold: TermDigest = {
    val half = bits.length >> 1
    val out = new Array[Long](half)
    var i = 0
    while (i < half) { out(i) = bits(i) | bits(i + half); i += 1 }
    new TermDigest(k, out, hasPrefixes)
  }
}

object TermDigest {
  /** Bit positions per token. At the target fill (≤ ~0.35) this gives a
    * false-positive rate of 0.35^5 ≈ 0.5%. */
  val K = 5

  /** Build-time filter size: 4 Mbit (512 KB of executor state per field
    * during the stats pass). Covers ~600k distinct tokens per split at
    * fill ≈ 0.5; beyond that the filter saturates and is dropped. */
  val BuildBits: Int = 1 << 22

  /** Smallest fold target: 4 Kbit = 512 bytes — the floor for tiny splits. */
  val MinBits: Int = 1 << 12

  /** Stop folding once the next fold would exceed this fill. */
  val FoldTargetFill = 0.35

  /** Discard filters fuller than this: at 0.9 fill an absent token still
    * passes 59% of the time — not worth the sidecar bytes. */
  val MaxFill = 0.9

  /** Sidecar file name inside the split directory; the `_` prefix makes
    * it invisible to Spark's Parquet file listing (same convention as
    * `_SUCCESS`). */
  val SidecarName = "_digests.json"

  /** Namespace byte for token-PREFIX Bloom entries. Every stored token
    * also inserts markers for its prefixes of length
    * [[PrefixMinLen]]..[[PrefixMaxLen]], so a selective `body:recei*`
    * can skip splits instead of opening every one (Bloom alone answers
    * exact membership only; dictionaries cover only tiny raw fields).
    * The marker char cannot appear in default/en_stem tokens (it is not
    * a letter or digit); whitespace-tokenizer and raw tokens CAN carry
    * it (U+0001 is not \s), but such a token's insertions only ADD bits
    * — a Bloom collision keeps a split, never loses one, so markers are
    * prune-conservative, not unforgeable. Query side:
    * [[graft.query.TermPruning]] emits a marker atom
    * for the needle clamped to [[PrefixMaxLen]] (a token starting with
    * the needle also starts with its first 8 chars); needles shorter
    * than [[PrefixMinLen]] stay unprunable. */
  val PrefixMarker = '\u0001'
  val PrefixMinLen = 3
  val PrefixMaxLen = 8

  def prefixKey(prefix: String): String = PrefixMarker.toString + prefix

  /** FNV-1a-style double-hash constants for prefix-MARKER keys. Markers
    * multiply Bloom-insert work ~7× per token; an md5 round-trip per
    * marker measurably slowed every ingest/merge lifecycle, and a Bloom
    * key only needs good dispersion, not cryptographic strength — token
    * entries keep md5 ([[hash128]]) because changing their hash would
    * invalidate every existing sidecar's token bits, while marker bits
    * are already versioned by the sidecar's `pfx` flag. The incremental
    * form lets the build hash all of a token's prefixes in ONE pass over
    * its chars ([[TokenBloomAgg.reduce]]); [[hashFor]] computes the same
    * sequence from the full marker key, so probe and insert positions
    * agree by construction (pinned by the marker fold property). */
  private[engine] val Fnv1 = 0xcbf29ce484222325L
  private[engine] val FnvP1 = 0x100000001b3L
  private[engine] val Fnv2 = 0x9e3779b97f4a7c15L
  private[engine] val FnvP2 = 0xc6a4a7935bd1e995L

  /** Hash dispatch for any Bloom key: marker keys (leading
    * [[PrefixMarker]]) use the cheap FNV pair, tokens use md5. */
  def hashFor(key: String): (Long, Long) =
    if (key.nonEmpty && key.charAt(0) == PrefixMarker) {
      var h1 = Fnv1
      var h2 = Fnv2
      var i = 0
      while (i < key.length) {
        val c = key.charAt(i)
        h1 = (h1 ^ c) * FnvP1
        h2 = (h2 ^ c) * FnvP2
        i += 1
      }
      (h1, h2)
    } else hash128(key)

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Two independent 64-bit hashes from one md5 — the double-hashing base
    * for all K positions. */
  def hash128(token: String): (Long, Long) = {
    val md = digest.get()
    md.reset()
    val d = md.digest(token.getBytes(StandardCharsets.UTF_8))
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < 8) { h1 = (h1 << 8) | (d(i) & 0xffL); i += 1 }
    while (i < 16) { h2 = (h2 << 8) | (d(i) & 0xffL); i += 1 }
    (h1, h2)
  }

  def md5HexBytes(bytes: Array[Byte]): String = {
    val md = digest.get()
    md.reset()
    md.digest(bytes).map("%02x".format(_)).mkString
  }

  /** Adapt a build-size filter for storage: fold down while the result
    * stays usefully sparse, drop it entirely when saturated. */
  def shrink(raw: Array[Long]): Option[TermDigest] = {
    var d = new TermDigest(K, raw)
    var next = if (d.m > MinBits) Some(d.fold) else None
    while (next.exists(_.fill <= FoldTargetFill)) {
      d = next.get
      next = if (d.m > MinBits) Some(d.fold) else None
    }
    Some(d).filter(_.fill <= MaxFill)
  }

  /** Inverse of [[TokenBloomAgg]]'s byte output. */
  def shrinkBytes(bytes: Array[Byte]): Option[TermDigest] =
    shrink(bytesToLongs(bytes))

  private def bytesToLongs(bytes: Array[Byte]): Array[Long] = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Long](bytes.length >> 3)
    buf.asLongBuffer().get(out)
    out
  }

  private def longsToBytes(longs: Array[Long]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(longs.length << 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.asLongBuffer().put(longs)
    buf.array()
  }

  /** Sidecar JSON: `{"k":5,"pfx":true,"fields":{"<flat>":{"m":16384,
    * "b64":"..."}}}`. `pfx` marks that the build inserted prefix-marker
    * entries; digests parsed from sidecars WITHOUT it answer true for
    * every marker probe (they cannot prove a prefix absent). */
  def renderAll(digests: Map[String, TermDigest]): Array[Byte] = {
    val m = graft.exprs.JsonSupport.mapper
    val root = m.createObjectNode()
    root.put("k", K)
    root.put("pfx", true)
    val fields = m.createObjectNode()
    digests.toList.sortBy(_._1).foreach { case (f, d) =>
      val o = m.createObjectNode()
      o.put("m", d.m)
      o.put("b64", Base64.getEncoder.encodeToString(longsToBytes(d.bits)))
      fields.set[com.fasterxml.jackson.databind.JsonNode](f, o)
    }
    root.set[com.fasterxml.jackson.databind.JsonNode]("fields", fields)
    m.writeValueAsString(root).getBytes(StandardCharsets.UTF_8)
  }

  def parseAll(text: String): Map[String, TermDigest] = {
    val node = graft.exprs.JsonSupport.parse(text)
    val k = node.get("k").asInt()
    val pfx = Option(node.get("pfx")).exists(_.asBoolean())
    node.get("fields").properties().asScala.map { e =>
      val bytes = Base64.getDecoder.decode(e.getValue.get("b64").asText())
      e.getKey -> new TermDigest(k, bytesToLongs(bytes), pfx)
    }.toMap
  }
}

/** One-pass token-set Bloom build over a terms array column — runs
  * alongside the other stats aggregates in [[Indexer.splitStats]], so the
  * digest costs no extra scan. Executor state is a fixed
  * [[TermDigest.BuildBits]]-bit buffer regardless of cardinality (the
  * same bounded-state property as [[graft.exprs.BoundedSetAgg]]); merge
  * is a bitwise OR. The full-size filter is shrunk driver-side
  * ([[TermDigest.shrink]]) where the fill is known. */
final class TokenBloomAgg extends Aggregator[Seq[String], Array[Long], Array[Byte]] {
  override def zero: Array[Long] = new Array[Long](TermDigest.BuildBits >> 6)

  private def setBits(b: Array[Long], h1: Long, h2: Long): Unit = {
    val mask = (TermDigest.BuildBits - 1).toLong
    var i = 0
    while (i < TermDigest.K) {
      val pos = ((h1 + i.toLong * h2) & mask).toInt
      b(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  override def reduce(b: Array[Long], toks: Seq[String]): Array[Long] = {
    if (toks != null) {
      val it = toks.iterator
      while (it.hasNext) {
        val tok = it.next()
        if (tok != null) {
          val (t1, t2) = TermDigest.hash128(tok)
          setBits(b, t1, t2)
          // Prefix markers 3..8 chars — the [[TermDigest.PrefixMarker]]
          // family that lets `body:recei*` prune splits. Hashed
          // incrementally (the FNV pair extends one char at a time), so
          // ALL of a token's markers cost one pass over its chars and
          // zero allocations; [[TermDigest.hashFor]] reproduces the same
          // values from the full marker key on the probe side.
          if (tok.length >= TermDigest.PrefixMinLen) {
            val mc = TermDigest.PrefixMarker
            var h1 = (TermDigest.Fnv1 ^ mc) * TermDigest.FnvP1
            var h2 = (TermDigest.Fnv2 ^ mc) * TermDigest.FnvP2
            val maxL = math.min(TermDigest.PrefixMaxLen, tok.length)
            var l = 0
            while (l < maxL) {
              val c = tok.charAt(l)
              h1 = (h1 ^ c) * TermDigest.FnvP1
              h2 = (h2 ^ c) * TermDigest.FnvP2
              l += 1
              if (l >= TermDigest.PrefixMinLen) setBits(b, h1, h2)
            }
          }
        }
      }
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(r: Array[Long]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(r.length << 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.asLongBuffer().put(r)
    buf.array()
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object TokenBloomAgg {
  def tokenBloom(c: Column): Column = udaf(new TokenBloomAgg).apply(c)
}

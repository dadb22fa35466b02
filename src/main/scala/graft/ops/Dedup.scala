package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Hashing.h64

/** Deduplication operators over arbitrary DataFrames — the parameterized
  * library surface behind the oracle-gated examples in
  * [[graft.queries.PipelineQueries]] (whose fixed-fixture plans are built
  * from exactly these functions, so the DuckDB gate certifies them).
  *
  * Conventions: `id` must be an orderable unique key (pair outputs use
  * `a < b`); pair-producing ops emit one row per unordered candidate pair.
  * Every op is deterministic — hashes are md5-derived ([[Hashing]]), no
  * float score is ever part of a group key.
  *
  * Caching: [[minhashLsh]] and [[simhash]] persist their signature tables
  * (each feeds a self-join). The cached plans live until the session ends
  * or the cache evicts; a long-lived service deduping many corpora should
  * `spark.catalog.clearCache()` between runs.
  */
object Dedup {

  /** Exact dedup by content hash: one shuffle on a 128-bit key — the
    * cheapest dedup and the standard first pass at any scale.
    * Output: (content_hash, keep_<id>, copies). */
  def exact(df: DataFrame, id: Column, content: Column): DataFrame =
    df.groupBy(md5(content).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("copies"))

  /** Token n-gram shingle sets: (id, shingles). The building block for
    * [[ngramJaccard]] and [[minhashLsh]]; persist the result when feeding
    * both (or any self-join). */
  def shingles(df: DataFrame, id: Column, toks: Column, n: Int): DataFrame =
    df.select(id.as("doc_id"), toks.as("toks"))
      .where(size(col("toks")) >= n)
      .withColumn("shingles", array_distinct(
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ",
            (0 until n).map(j => element_at(col("toks"), i + j + 1)): _*))))
      .select(col("doc_id"), col("shingles"))

  /** Exact n-gram Jaccard >= threshold over a shingled table
    * ((doc_id, shingles) as produced by [[shingles]]): explode → join on
    * shingle → pair intersection counts → union from per-doc counts.
    * Quadratic only within one shingle's posting list; with sparse
    * shingles (large n) the join output is ~linear in corpus size.
    * Output: (a, b, inter, uni). */
  def ngramJaccard(shingled: DataFrame, threshold: Double): DataFrame = {
    val sh = shingled.select(col("doc_id"), size(col("shingles")).as("nsh"),
      explode(col("shingles")).as("sh"))
    val a = sh.select(col("doc_id").as("a"), col("nsh").as("na"), col("sh"))
    val b = sh.select(col("doc_id").as("b"), col("nsh").as("nb"), col("sh"))
    a.join(b, "sh")
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .where(col("inter").cast("double") / col("uni") >= threshold)
      .select(col("a"), col("b"), col("inter"), col("uni"))
  }

  /** Benchmark decontamination: shingle-overlap counts between a corpus
    * and a (small) benchmark set — the pass that finds training documents
    * leaking evaluation data (n-gram collision detection, the standard
    * 13-gram method scaled down by the caller's shingle width). Both
    * inputs are (doc_id, shingles) tables from [[shingles]]; the
    * benchmark side is broadcast (eval sets are tiny next to a corpus),
    * so the scan stays a single map-side pass over the corpus shingles —
    * no corpus-wide shuffle at all.
    * Output: (doc_id, bench_id, n_shared) for pairs with >= minShared. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      minShared: Long = 1L): DataFrame = {
    val c = corpus.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val b = broadcast(benchmark
      .select(col("doc_id").as("bench_id"), explode(col("shingles")).as("sh")))
    c.join(b, "sh")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  private val MersennePrime = 2147483647L

  /** Hash function i of the affine MinHash family over a base md5 hash:
    * h_i(x) = (a_i·h(x) + b_i) mod p, p = 2^31-1. One md5 per shingle
    * total; intermediates stay < 2^62 (DuckDB-reproducible). */
  private def affineHash(i: Int, base: Column): Column =
    ((lit(i.toLong * 2654435761L % MersennePrime) * base +
      lit(i.toLong * 40503L % MersennePrime)) % MersennePrime)

  /** MinHash + LSH banding over a shingled table: constant-width
    * signatures, candidate pairs share at least one band — the scale path
    * (shuffle key is (band, band-signature), linear candidate
    * generation). numHashes must divide evenly into bands.
    * Output: (a, b) distinct candidate pairs. */
  def minhashLsh(shingled: DataFrame, numHashes: Int = 16,
      bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be a multiple of bands")
    val rows = numHashes / bands
    val flat = shingled
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .select(col("doc_id"), (h64(col("sh")) % MersennePrime).as("h"))
    val mins = (1 to numHashes).map(i =>
      min(affineHash(i, col("h"))).as(s"mh${i - 1}"))
    // Persisted: the band self-join consumes the signature table twice.
    val sigs = flat.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*).persist()
    val bandTbl = sigs.select(
      col("doc_id"),
      explode(array((0 until bands).map { bIdx =>
        struct(lit(bIdx).as("band"),
          concat_ws("_", (0 until rows)
            .map(r => col(s"mh${bIdx * rows + r}")): _*).as("sig"))
      }: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.sig"))
    val l = bandTbl.select(col("band"), col("sig"), col("doc_id").as("a"))
    val r = bandTbl.select(col("band"), col("sig"), col("doc_id").as("b"))
    l.join(r, Seq("band", "sig"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** 63-bit SimHash near-dup pairs over a tokenized table
    * ((doc_id, toks)): hamming distance <= maxDistance. Candidates
    * bucket-join on maxDistance+1 variable-width chunks that partition
    * bits 0..62 — by pigeonhole a pair within the distance matches at
    * least one chunk exactly, so recall is total and the exact distance
    * check makes output equal the naive quadratic scan.
    * Output: (a, b, dist). */
  def simhash(tokenized: DataFrame, maxDistance: Int = 8): DataFrame = {
    require(maxDistance >= 0 && maxDistance < 63, "maxDistance must be in [0, 62]")
    val chunks = maxDistance + 1
    // Variable-width chunks covering exactly bits 0..62 with exactly
    // `chunks` non-empty chunks: base width 63/chunks, the first 63%chunks
    // chunks one bit wider. A fixed ceil-width would push later chunks'
    // shift past bit 63 (shiftright wraps mod 64) and alias them onto
    // chunk 0 — silently losing recall for maxDistance >= 16.
    val base = 63 / chunks
    val extra = 63 % chunks
    val chunkRanges: Seq[(Int, Int)] = { // (startBit, width)
      var off = 0
      (0 until chunks).map { c =>
        val w = base + (if (c < extra) 1 else 0)
        val r = (off, w); off += w; r
      }
    }
    // Pre-aggregate (doc, token-hash) counts: with a bounded vocabulary the
    // 63 bit-sums then run over the smaller weighted table.
    val th = tokenized
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), h64(col("tok")).as("th"))
      .agg(count(lit(1)).as("cnt"))
    val bitCols: Seq[Column] = (0 until 63).map { bit =>
      sum(when(col("th").bitwiseAND(lit(1L << bit)) =!= 0L, col("cnt")).otherwise(-col("cnt")))
        .as(s"b$bit")
    }
    // Persisted: the bucket self-join consumes sigs on both sides.
    val sigs = th.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
      .select(col("doc_id"),
        (0 until 63).map(bit => when(col(s"b$bit") > 0, lit(1L << bit)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
      .persist()
    val chunked = sigs.select(col("doc_id"), col("simhash"),
      explode(array(chunkRanges.zipWithIndex.map { case ((start, width), c) =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), start).bitwiseAND(lit((1L << width) - 1)).as("val"))
      }: _*)).as("cv"))
      .select(col("doc_id"), col("simhash"), col("cv.chunk"), col("cv.val"))
    val a = chunked.select(col("chunk"), col("val"),
      col("doc_id").as("a"), col("simhash").as("ha"))
    val b = chunked.select(col("chunk"), col("val"),
      col("doc_id").as("b"), col("simhash").as("hb"))
    a.join(b, Seq("chunk", "val"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), col("ha"), col("hb")).distinct()
      .withColumn("dist", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .where(col("dist") <= maxDistance)
      .select(col("a"), col("b"), col("dist"))
  }

  /** Embedding near-dup pairs: cosine >= threshold within a coarse cell
    * (the candidate bound — same contract as IVF). Scores stay internal
    * (float summation order is engine-specific); output is id pairs.
    * Output: (a, b). */
  def embeddingCosine(df: DataFrame, id: Column, vec: Column, cell: Column,
      threshold: Double): DataFrame = {
    val e = df.select(cell.as("label"), id.as("vid"), vec.as("v"))
    val a = e.select(col("label"), col("vid").as("a"), col("v").as("va"))
    val b = e.select(col("label"), col("vid").as("b"), col("v").as("vb"))
    a.join(b, "label")
      .where(col("a") < col("b"))
      .withColumn("cos",
        graft.exprs.CosineSimilarity.cosine_similarity(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"))
  }

  /** Connected components over a near-duplicate pair list ((a, b)) by
    * iterative min-label propagation: every vertex starts as its own
    * label; each round every vertex takes the minimum label among itself
    * and its neighbors, until a round changes nothing. This is the
    * "cluster near-dup pairs, keep one canonical document per cluster"
    * step that follows MinHash-LSH in a training pipeline.
    *
    * Scale shape: each round is one shuffle-join keyed by vertex plus a
    * cheap convergence count; rounds = cluster diameter, which for
    * near-dup graphs is small (duplicates form near-cliques). For
    * adversarial long chains the textbook upgrade is large-star/small-star
    * contraction (Kiveris et al. 2014) with O(log n) rounds — same
    * per-round join shape. Everything stays distributed: no vertex list
    * ever collects to the driver.
    *
    * Output: (doc_id, canon_id) for every vertex that appears in a pair,
    * canon_id = min doc_id of its component. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    val edges = pairs.select(col("a").as("u"), col("b").as("v"))
      .union(pairs.select(col("b").as("u"), col("a").as("v")))
      .persist()
    var labels = edges.select(col("u").as("vtx")).distinct()
      .withColumn("lbl", col("vtx"))
      .persist()
    // Convergence check: labels are monotonically non-increasing per
    // vertex, so the exact (decimal — no overflow at any scale) label sum
    // strictly decreases until the fixpoint; an unchanged sum IS
    // convergence. One cheap aggregate per round instead of a
    // change-detection join.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("lbl").cast("decimal(38,0)"))).collect()(0)
        .getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO) // empty graph
    var prevSum = labelSum(labels)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val neigh = edges
        .join(labels, edges("v") === labels("vtx"))
        .groupBy(col("u")).agg(min(col("lbl")).as("nlbl"))
      val next = labels
        .join(neigh, labels("vtx") === neigh("u"), "left")
        .select(col("vtx"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .persist()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels.unpersist()
      labels = next
      round += 1
    }
    edges.unpersist()
    // A silent early exit would return plausible-but-wrong canon ids (a
    // chain of diameter > maxRounds stops mid-propagation); fail loudly.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxRounds rounds; " +
          "raise maxRounds for graphs with longer chains")
    labels.select(col("vtx").as("doc_id"), col("lbl").as("canon_id"))
  }
}

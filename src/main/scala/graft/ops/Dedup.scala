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
  * Caching: [[minhashLsh]] and [[simhash]] snapshot their signature
  * tables with a lazy `localCheckpoint` (each feeds a self-join). Unlike
  * `persist`, the blocks are not registered in the session cache — the
  * ContextCleaner reaps them once the result is no longer referenced, so
  * repeated calls in a long-lived session do not accumulate cache
  * entries, and the truncated lineage means an evicted block cannot
  * cascade into recomputing the whole upstream plan.
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
      .withColumn("shingles", array_distinct(gramArray(col("toks"), n)))
      .select(col("doc_id"), col("shingles"))

  /** All n-token window concatenations of `toks`, one per start position
    * (positions kept; [[shingles]] distincts, [[posGrams]] explodes —
    * one definition so the gram text cannot drift between them). Empty
    * for arrays shorter than n — the guard lives HERE because
    * `sequence()` runs DESCENDING on a negative span and would
    * element_at(toks, 0) under ANSI mode; callers must not need to know
    * that. */
  private[graft] def gramArray(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ",
          (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Positional token k-grams: (doc_id, gram), one row per window START
    * — within-doc repeats kept, unlike [[shingles]]' distinct sets, so
    * downstream counts weight by occurrence. */
  /** The DUPLICATED-gram rule — a gram occurring in >= 2 distinct
    * documents — over any (doc_id, gram, ...) table: ONE definition
    * shared by the profile ([[kgramOverlap]]) and the apply step
    * ([[spanScrub]]), so the rule (and its documented 100 TB cut:
    * keying on a 128-bit gram hash instead of the text) changes in one
    * place. */
  private def dupGrams(grams: DataFrame): DataFrame =
    grams.select(col("doc_id"), col("gram")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("ndocs"))
      .where(col("ndocs") >= 2).select(col("gram"))

  private[ops] def posGrams(df: DataFrame, id: Column, toks: Column,
      k: Int): DataFrame =
    df.select(id.as("doc_id"), toks.as("toks"))
      .where(size(col("toks")) >= k)
      .select(col("doc_id"), explode(gramArray(col("toks"), k)).as("gram"))

  /** Exact k-gram overlap profile — the token-granularity form of
    * ExactSubstr dedup (Lee et al. 2021, "Deduplicating Training Data
    * Makes Language Models Better": any >= k-token span appearing twice
    * in the corpus is a duplicate span). A gram is DUPLICATED when it
    * occurs in >= 2 distinct documents; each document reports how many
    * of its k-gram positions carry a duplicated gram — the per-doc
    * duplicated-span mass a curation pass thresholds or trims on.
    *
    * Scale shape: the positional gram table is ~one row per corpus
    * token; the duplicated-gram set derives from a (doc_id, gram)
    * distinct + gram-keyed count (combiner-friendly), and docs meet it
    * through a gram-keyed semi-ish join — never gram-posting × posting,
    * so a boilerplate gram in millions of documents grows a posting
    * list but no quadratic pair blowup. Gram keys stay as text for
    * exactness; at 100 TB the standard shuffle-width cut is keying on a
    * 128-bit gram hash instead (collision-negligible, same plan).
    * Output: (doc_id, n_grams, n_dup) for docs with >= k tokens. */
  def kgramOverlap(df: DataFrame, id: Column, toks: Column,
      k: Int): DataFrame = {
    // three consumers (dup set, per-doc totals, dup positions) — snapshot
    // so the scan + gram build runs once (the module's self-join rule)
    val grams = posGrams(df, id, toks, k).localCheckpoint(eager = false)
    val dup = dupGrams(grams)
    val perDoc = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val dupPos = grams.join(dup, Seq("gram"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    perDoc.join(dupPos, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
  }

  /** ExactSubstr span REMOVAL — the apply step of [[kgramOverlap]] (Lee
    * et al. 2021's policy: don't drop the document, cut the duplicated
    * span out of it, at token granularity): a token survives iff NO
    * duplicated k-gram (one occurring in >= 2 distinct documents, the
    * [[kgramOverlap]] rule) covers it, and survivors reassemble
    * space-joined in original order.
    *
    * Scale shape: the positional gram table is ~one row per corpus
    * token; the duplicated-gram set is a gram-keyed count; each doc's
    * duplicated START positions collect into one array (bounded by the
    * doc's own gram count) joined back by doc_id; the rebuild is
    * map-only HOFs. Rebuild cost is O(tokens × dup-starts) per doc —
    * fine for bounded documents with sparse duplication; a corpus of
    * pathological fully-duplicated mega-docs would take the flat
    * relational form instead (explode covered positions, anti-join,
    * re-aggregate by position — same answer, one more shuffle).
    *
    * Output: (doc_id, n_toks, n_kept, scrubbed). */
  def spanScrub(df: DataFrame, id: Column, toks: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // two consumers (gram side + rebuild side) — snapshot, self-join rule
    val base = df.select(id.as("doc_id"), toks.as("toks"))
      .localCheckpoint(eager = false)
    val grams = base.where(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(gramArray(col("toks"), k)))
      .withColumnRenamed("pos", "gpos").withColumnRenamed("col", "gram")
    val dupStarts = grams.join(dupGrams(grams), Seq("gram"))
      .groupBy(col("doc_id")).agg(sort_array(collect_set(col("gpos"))).as("dps"))
    base.join(dupStarts, Seq("doc_id"), "left")
      .withColumn("dps", coalesce(col("dps"), array().cast("array<int>")))
      .withColumn("kept", filter(col("toks"),
        (x, i) => !exists(col("dps"), g => g <= i && i < g + lit(k))))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"),
        size(col("kept")).cast("long").as("n_kept"),
        array_join(col("kept"), " ").as("scrubbed"))
  }

  /** Winnowing near-dup candidate pairs (Schleimer et al. 2003 — the
    * MOSS fingerprint family): each doc keeps the distinct minima of a
    * w-window slid over its k-gram md5-60 hashes
    * ([[graft.exprs.SigExprs.winnow_fps]], one map-only pass per row),
    * pairs sharing >= minShared fingerprints surface as candidates.
    * Guarantee: any shared token run of length >= k+w-1 forces a shared
    * fingerprint, so long verbatim overlaps can't hide — the property
    * MinHash only has probabilistically. Docs with fewer than w grams
    * are out of the guarantee and excluded.
    *
    * Scale shape: signatures map-only; the pair join is a posting join
    * on fingerprint values — winnowing selects ~2/(w+1) of grams, so
    * postings are w-fold sparser than the raw gram join, with the same
    * hot-value caveat (and fix: prefix filtering) as [[ngramJaccard]].
    * Output: (a, b, n_shared). */
  def winnowPairs(df: DataFrame, id: Column, toks: Column, k: Int,
      w: Int, minShared: Long): DataFrame = {
    val fps = df.select(id.as("doc_id"), toks.as("toks"))
      .where(size(col("toks")) >= k + w - 1)
      .select(col("doc_id"),
        explode(graft.exprs.SigExprs.winnow_fps(col("toks"), k, w)).as("fp"))
      .localCheckpoint(eager = false) // feeds both sides of the self-join
    val a = fps.select(col("doc_id").as("a"), col("fp"))
    val b = fps.select(col("doc_id").as("b"), col("fp"))
    a.join(b, "fp").where(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .select(col("a"), col("b"), col("n_shared"))
  }

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

  /** Exact n-gram Jaccard with AllPairs/PPJoin prefix filtering (Bayardo
    * et al. 2007) — the hot-shingle-safe form of [[ngramJaccard]], same
    * output. Shingles get a global total order by ascending document
    * frequency (rarest first); a doc with n shingles only emits its first
    * n - ⌈t·n⌉ + 1 shingles into the candidate join, because any pair at
    * Jaccard ≥ t has |A∩B| ≥ t·|A∪B| ≥ t·max(|A|,|B|), which forces an
    * intersection element inside both prefixes. Candidates then verify
    * with the exact intersection over the full sets.
    *
    * Scale shape: the candidate join's posting lists hold only PREFIX
    * occurrences — the frequency ordering puts the rarest shingles in
    * prefixes, so a hot shingle (df in the millions) lands in almost no
    * prefix and never explodes the join, the failure mode of the plain
    * posting join. Costs one extra df aggregate and a per-doc rank window
    * over the shingle table. Output: (a, b, inter, uni). */
  /** (doc_id, nsh, sh) exploded view of a shingled table. */
  private[ops] def flattenShingles(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"), size(col("shingles")).as("nsh"),
      explode(col("shingles")).as("sh"))

  /** AllPairs/PPJoin prefix: under the global rarity order (`dfreq`:
    * ascending document frequency, shingle text tie-break), a doc with n
    * shingles keeps only its first n - ⌈t·n⌉ + 1 — any pair at Jaccard
    * ≥ t shares an element inside both prefixes. The epsilon guards
    * float rounding (ceil(0.1*30)=4 ≠ ⌈3⌉ would shrink the prefix below
    * the lemma's bound; erring low only widens it). Shared by
    * [[ngramJaccardPrefix]] and [[dedupIncremental]] so the bound cannot
    * drift between them. */
  /** The AllPairs prefix-length bound — a doc with `nsh` shingles keeps
    * its first `nsh - ⌈t·nsh⌉ + 1` under the global order; the epsilon
    * guards float rounding (see [[prefixShingles]]'s lemma note). ONE
    * definition compiled into the stateless prefix build AND the
    * stateful batch ranking ([[IncrementalDedupState.dedupBatch]]) —
    * an asymmetric bound between the two sides of a candidate join
    * would silently break the lemma's recall guarantee. */
  private[ops] def prefixRankBound(nsh: Column, threshold: Double): Column =
    nsh - ceil(nsh * threshold - 1e-9) + 1

  private[ops] def prefixShingles(flat: DataFrame, dfreq: DataFrame,
      threshold: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df").asc, col("sh").asc)
    flat.join(dfreq, "sh")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= prefixRankBound(col("nsh"), threshold))
      .select(col("doc_id"), col("sh"))
  }

  /** Exact-Jaccard verification: given candidate rows carrying both full
    * shingle sets, keep pairs with |A∩B| / |A∪B| ≥ t; adds (inter, uni). */
  private[ops] def verifyJaccard(cands: DataFrame, sa: Column, sb: Column,
      threshold: Double): DataFrame =
    cands
      .withColumn("inter", size(array_intersect(sa, sb)).cast("long"))
      .withColumn("uni", (size(sa) + size(sb)).cast("long") - col("inter"))
      .where(col("inter").cast("double") / col("uni") >= threshold)

  /** AllPairs candidate pairs (a, b), a < b — the verifier INPUT of
    * [[ngramJaccardPrefix]], exposed so probes can measure the candidate
    * volume the filter admits without duplicating the prefix logic. */
  def prefixCandidates(shingled: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    val flat = flattenShingles(shingled)
    // r21 (guide §2.4): document frequency here is a COUNT OVER the same
    // flat table's sh partitions — the separate dfreq aggregate +
    // join-back ([[prefixShingles]], still used by the incremental paths
    // whose dfreq comes from persisted state) exchanged the exploded
    // corpus by sh TWICE and re-ran the explode per branch; one window on
    // one sh-keyed exchange yields identical counts (one flat row per
    // (doc, shingle) either way — shingle arrays are sets), and flat now
    // has a single consumer.
    val wsh = org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))
    val wdoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df").asc, col("sh").asc)
    // Snapshotted: both sides of the candidate join consume the prefix
    // table — without the snapshot the df window and rank window would
    // run twice (the same self-join rule as minhashLsh/simhash).
    val prefix = flat.withColumn("df", count(lit(1)).over(wsh))
      .withColumn("rk", row_number().over(wdoc))
      .where(col("rk") <= prefixRankBound(col("nsh"), threshold))
      .select(col("doc_id"), col("sh"))
      .localCheckpoint(eager = false)
    prefix.select(col("doc_id").as("a"), col("sh"))
      .join(prefix.select(col("doc_id").as("b"), col("sh")), "sh")
      .where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  def ngramJaccardPrefix(shingled: DataFrame, threshold: Double): DataFrame = {
    val cands = prefixCandidates(shingled, threshold)
    val sets = shingled.select(col("doc_id"), col("shingles"))
    verifyJaccard(
      cands
        .join(sets.select(col("doc_id").as("a"), col("shingles").as("sha")), "a")
        .join(sets.select(col("doc_id").as("b"), col("shingles").as("shb")), "b"),
      col("sha"), col("shb"), threshold)
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

  /** CONTAMINATION REPORT — [[decontaminate]]'s reverse direction:
    * grade the EVAL SET instead of dropping corpus docs. Per benchmark
    * document, the fraction (ppm, truncating integer division) of its
    * distinct shingles that occur ANYWHERE in the corpus — the
    * eval-integrity number read before trusting a score on that item
    * (a high ppm means the item's text leaks into training data, so
    * its score measures memorization). Scale shape: the eval-suite-sized
    * benchmark side left-semi probes the exploded corpus gram stream
    * per gram — the semi-join itself dedups its right side, so ONE
    * corpus-gram shuffle is the whole corpus cost (an explicit
    * `.distinct()` before the probe paid that same exchange twice for
    * nothing — r17 verdict; never a doc×doc join, hot boilerplate grams
    * cannot go quadratic). Output one row per benchmark doc:
    * (bench_id, n_grams, n_hit, hit_ppm). */
  def contaminationReport(benchmark: DataFrame,
      corpus: DataFrame): DataFrame = {
    val cg = corpus.select(explode(col("shingles")).as("sh"))
    val hits = benchmark
      .select(col("doc_id").as("bench_id"), explode(col("shingles")).as("sh"))
      .join(cg, Seq("sh"), "left_semi")
      .groupBy(col("bench_id")).agg(count(lit(1)).as("n_hit"))
    benchmark.select(col("doc_id").as("bench_id"),
        size(col("shingles")).cast("long").as("n_grams"))
      .join(hits, Seq("bench_id"), "left")
      .select(col("bench_id"), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        expr("(coalesce(n_hit, 0) * 1000000) div n_grams").as("hit_ppm"))
  }

  /** Bloom-filter decontamination — the at-scale form of
    * [[decontaminate]]: when the benchmark suite's shingle set is too
    * large to broadcast raw (the real shape once every eval suite ever
    * published is in the blocklist), fold it into an m-bit Bloom filter
    * and test corpus shingles against THAT. The filter is a (word_idx,
    * word) table of 32-bit words in BIGINTs — m/32 rows, broadcast — and
    * membership is j md5-derived probes per shingle, all in exact
    * integer arithmetic (`pmod(h64("bloom<t>:" || sh), m)`, bit test by
    * truncating division), so false positives are DETERMINISTIC and an
    * independent engine reproduces them bit-for-bit.
    *
    * Scale shape: build side is one aggregate over benchmark shingles
    * (j rows each), corpus side one map-side pass (j probe rows per
    * shingle joined to the broadcast word table) — the corpus never
    * joins the benchmark. False-positive rate ~ (1 - e^{-jn/m})^j; the
    * caller sizes m for it. minHits thresholds how many filter-positive
    * shingles condemn a document.
    *
    * Output per corpus doc: (doc_id, n_sh, n_hits, keep) — EVERY corpus
    * doc gets a row: a doc whose shingle set is empty (too short to
    * shingle) contributes no probes, so it is left-joined back in as
    * (n_sh=0, n_hits=0, keep=true) rather than silently absent. Callers
    * may inner-join on keep without dropping shingle-less docs (r9
    * ADVICE: pipe_curate_v3's anti-join happened to compensate; a join
    * on keep would not have). */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
      mBits: Int, numHashes: Int, minHits: Long): DataFrame = {
    require(mBits >= 32 && mBits % 32 == 0, s"mBits must be a multiple of 32, got $mBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val seeds = explode(array((0 until numHashes).map(lit): _*)).as("t")
    def probes(sh: DataFrame): DataFrame = sh
      .select(col("*"), seeds)
      .withColumn("bit", pmod(Hashing.h64(
        concat(lit("bloom"), col("t").cast("string"), lit(":"), col("sh"))),
        lit(mBits.toLong)))
      .withColumn("widx", expr("bit DIV 32"))
      .withColumn("mask", expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 32 AS INT))"))
    val words = probes(benchmark.select(explode(col("shingles")).as("sh")).distinct())
      .groupBy(col("widx")).agg(expr("bit_or(mask)").as("wv"))
    val perDoc = probes(
        corpus.select(col("doc_id"), explode(col("shingles")).as("sh")))
      .join(broadcast(words), Seq("widx"), "left")
      .withColumn("hit",
        when(expr("(coalesce(wv, CAST(0 AS BIGINT)) DIV mask) % 2 = 1"), 1L)
          .otherwise(0L))
      // a shingle is filter-positive iff ALL j probes hit
      .groupBy(col("doc_id"), col("sh")).agg(min(col("hit")).as("all_hit"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"),
        sum(col("all_hit")).as("n_hits"))
    // restore shingle-less docs (explode emitted no probe rows for them):
    // doc-count-proportional join, NOT shingle-proportional
    corpus.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_sh"), lit(0L)).as("n_sh"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("keep", col("n_hits") < minHits)
  }

  /** Semantic (embedding-space) decontamination — the fuzzy complement
    * of the n-gram [[decontaminate]]: a corpus item is contaminated when
    * its cosine against ANY benchmark embedding clears `threshold`,
    * catching the paraphrased / reformatted / translated eval leakage
    * that exact shingle overlap misses (the reason modern data work runs
    * an embedding decontamination pass BESIDE the n-gram one).
    *
    * Scale shape — the same contract as [[decontaminate]], lifted to
    * vectors: the benchmark side (`bench_id`, `bv`) is broadcast (eval
    * suites are thousands of items next to a 100 TB corpus), so the
    * corpus-side pass is ONE broadcast nested-loop scoring — N·B
    * cosines, map-only, no corpus shuffle anywhere; this is exactly the
    * dense matrix product a batch scorer would run, expressed as a plan.
    * Declared in PlanSpec's cartesian audit as benchmark-bounded.
    *
    * Output mirrors [[decontaminateBloom]]'s every-doc contract: each
    * corpus row yields (vid, n_hits, first_bench, keep) — `first_bench`
    * is the smallest condemning benchmark id (attribution for audits),
    * -1 when clean, so callers can inner-join on keep without dropping
    * unmatched docs and auditors can group leakage by benchmark. */
  def decontaminateSemantic(corpus: DataFrame, benchmark: DataFrame,
      threshold: Double): DataFrame = {
    val hits = corpus.select(col("vid"), col("v"))
      .crossJoin(broadcast(benchmark))
      .where(graft.exprs.CosineSimilarity
        .cosine_similarity(col("v"), col("bv")) >= threshold)
      .groupBy(col("vid"))
      .agg(count(lit(1)).as("n_hits"), min(col("bench_id")).as("first_bench"))
    corpus.select(col("vid"))
      .join(hits, Seq("vid"), "left")
      .select(col("vid"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("first_bench"), lit(-1L)).as("first_bench"))
      .withColumn("keep", col("n_hits") === 0L)
  }

  /** Incremental near-dedup: decide, for each NEW document, whether it
    * duplicates the EXISTING corpus (exact n-gram Jaccard ≥ threshold) —
    * the ingest-time pass of a continuously growing training corpus,
    * where the corpus side is the already-deduplicated store and the new
    * side a fresh crawl batch. Within-batch duplicates are deliberately
    * out of scope (run [[dedupCorpus]] on the batch first; the two
    * compose).
    *
    * Same AllPairs/PPJoin prefix filtering as [[ngramJaccardPrefix]],
    * with document frequencies computed over BOTH sides so the global
    * rarity order (and therefore the prefix-filter lemma: a pair at
    * J ≥ t shares an element inside both prefixes) holds across the two
    * tables; candidates verify with the exact intersection. Scale shape:
    * the corpus side is never self-joined and only its prefix shingles
    * enter the candidate join — cost stays proportional to the batch,
    * not the corpus.
    *
    * Inputs are (doc_id, shingles) tables from [[shingles]]. Output: one
    * row per NEW-side shingled document — (doc_id, dup_of, keep), where
    * dup_of = the smallest matching corpus id (null when kept). */
  def dedupIncremental(corpusSh0: DataFrame, newSh0: DataFrame,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    // Snapshot both inputs: each is consumed by multiple branches (df
    // aggregate, prefix join, verify join, final left join) — without the
    // snapshot the possibly-expensive shingle construction re-executes
    // per branch (the module's standing self-join rule).
    val corpusSh = corpusSh0.localCheckpoint(eager = false)
    val newSh = newSh0.localCheckpoint(eager = false)
    val cFlat = flattenShingles(corpusSh)
    val nFlat = flattenShingles(newSh)
    // One global df table over both sides — the rarity order must span
    // both tables for the cross-table prefix lemma to hold.
    val dfreq = cFlat.select(col("sh")).unionAll(nFlat.select(col("sh")))
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .localCheckpoint(eager = false)
    val cands = prefixShingles(nFlat, dfreq, threshold)
      .select(col("doc_id").as("n_id"), col("sh"))
      .join(prefixShingles(cFlat, dfreq, threshold)
        .select(col("doc_id").as("c_id"), col("sh")), "sh")
      .select(col("n_id"), col("c_id")).distinct()
    val matches = verifyJaccard(
      cands
        .join(newSh.select(col("doc_id").as("n_id"), col("shingles").as("shn")), "n_id")
        .join(corpusSh.select(col("doc_id").as("c_id"), col("shingles").as("shc")), "c_id"),
      col("shn"), col("shc"), threshold)
      .groupBy(col("n_id")).agg(min(col("c_id")).as("dup_of"))
    newSh.select(col("doc_id"))
      .join(matches.select(col("n_id").as("doc_id"), col("dup_of")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"), col("dup_of").isNull.as("keep"))
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
    // Snapshotted: the band self-join consumes the signature table twice.
    val sigs = flat.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .localCheckpoint(eager = false)
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
    // Map-only signatures: one tight-loop expression per row (the
    // explode → groupBy(doc, token-hash) → 63-conditional-sum shape cost
    // two shuffles and ran interpreted). Zero-token docs are filtered to
    // match the explode form, which simply dropped them.
    // Snapshotted: the bucket self-join consumes sigs on both sides.
    val sigs = tokenized
      .where(size(col("toks")) > 0)
      .select(col("doc_id"),
        graft.exprs.SigExprs.simhash_sig(col("toks")).as("simhash"))
      .localCheckpoint(eager = false)
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
    * `cell` must be a coarse clustering label (k-means/IVF cell, k
    * distinct values) — its census is broadcast, so row-cardinality
    * labels are out of contract. Output: (a, b). */
  def embeddingCosine(df: DataFrame, id: Column, vec: Column, cell: Column,
      threshold: Double, maxCellSize: Int = DefaultMaxCellSize): DataFrame =
    cosinePairs(df.select(cell.as("label"), id.as("vid"), vec.as("v")),
      threshold, maxCellSize).select(col("a"), col("b"))

  /** Per-cell population bound for [[cosinePairs]]. 2048 caps a sub-cell's
    * pair volume at ~2M cosines (seconds of work per task) while staying a
    * no-op for any healthy k-means assignment (corpus/k members per cell);
    * the sf fixtures top out at 218 members per cell. */
  val DefaultMaxCellSize: Int = 2048

  /** Within-cell cosine pairs WITH the similarity kept — shared by
    * [[embeddingCosine]] (which drops it: float scores never leave an
    * operator) and [[semantic]] (which consumes it internally for the
    * keep decision). `e` must be (label, vid, v); output (a, b, cos),
    * a < b. The cosine itself is a sequential tight loop
    * ([[graft.exprs.CosineSimilarity]]) — deterministic, no
    * aggregation-order float drift.
    *
    * Hot-cell guard: the within-cell self-join is Σ cell² — fine under a
    * healthy clustering, quadratic under a degenerate one (every vector in
    * one cell). Cells above `maxCellSize` members are re-salted into
    * ceil(n / maxCellSize) sub-cells by a secondary hash of the VECTOR
    * (deterministic — same corpus, same sub-cells), and pairs form within
    * sub-cells only, bounding candidates at ~n·maxCellSize per hot cell
    * instead of n². This trades recall inside oversized cells (a pair
    * split across sub-cells is missed, ~1/ceil(n/cap) of hot-cell pairs
    * survive) — acceptable under SemDeDup's own contract, which already
    * treats the coarse clustering as an approximation and never compares
    * across cells; an oversized cell is precisely where the clustering has
    * failed to be informative. Healthy cells (n <= maxCellSize, the sf
    * fixtures included) are bit-for-bit unaffected: salt is constant 0.
    * The per-cell census joins back via broadcast — it is one row per
    * CELL (k rows for a k-means assignment), never corpus-sized. */
  private[ops] def cosinePairs(e: DataFrame, threshold: Double,
      maxCellSize: Int = DefaultMaxCellSize): DataFrame = {
    // a cap <= 0 would make ceil(cell_n / cap) overflow instead of failing
    require(maxCellSize > 0, s"maxCellSize must be positive, got $maxCellSize")
    // broadcast contract: `label` must be a COARSE cell id (k-means /
    // IVF-style, k rows of census, never row-cardinality) — a caller
    // passing a high-cardinality column would broadcast a corpus-sized
    // census; the forced hint is deliberate because Spark cannot estimate
    // the census size under the checkpoint
    val census = e.groupBy(col("label")).agg(count(lit(1)).as("cell_n"))
    val salted = e.join(broadcast(census), "label")
      .withColumn("salt",
        when(col("cell_n") > maxCellSize,
          pmod(xxhash64(col("v")),
            ceil(col("cell_n") / lit(maxCellSize.toDouble)).cast("long")))
          .otherwise(lit(0L)))
      .select(col("label"), col("salt"), col("vid"), col("v"))
    val a = salted.select(col("label"), col("salt"),
      col("vid").as("a"), col("v").as("va"))
    val b = salted.select(col("label"), col("salt"),
      col("vid").as("b"), col("v").as("vb"))
    a.join(b, Seq("label", "salt"))
      .where(col("a") < col("b"))
      .withColumn("cos",
        graft.exprs.CosineSimilarity.cosine_similarity(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication"):
    * cluster the embedding space coarsely (the `cell` column — a k-means
    * assignment at scale, see [[Ann.kmeansStep]]), find within-cell
    * cosine-similar pairs, group them into duplicate clusters, and keep
    * ONE representative per cluster.
    *
    * Keep rule: the paper keeps the example with LOW similarity to the
    * cluster's centroid (the most distinct copy, preserving diversity).
    * A float mean-vector centroid is an aggregation-order artifact
    * (non-associative double sums differ run to run, let alone engine to
    * engine), so the rule here is the deterministic equivalent: keep the
    * member with the LOWEST MAXIMUM cosine to any of its over-threshold
    * neighbors, ties broken by smallest id. The ranked cosine is
    * QUANTIZED first — `floor(cos · 1e4)` per pair — because an ORDERING
    * is sensitive to float disagreement everywhere (a 1e-8 engine
    * difference flips ranks and thus the keep bit), unlike the threshold
    * compare, which is only sensitive at the cutoff; at 1e-4 granularity
    * the rank is a pure integer comparison and residual ties fall to the
    * id. Same intent — the least-redundant member survives —
    * engine-reproducible, so the DuckDB oracle gates the whole chain.
    *
    * Scale shape: pair generation is bounded by cell population (the IVF
    * contract — never corpus²); components are O(log n) star-contraction
    * rounds ([[connectedComponents]]); the keep decision is one
    * vertex-keyed aggregate plus a per-cluster window over members only.
    * Output: (<id>, group_id, keep) for EVERY input row — unpaired rows
    * keep themselves, group_id = component minimum. */
  def semantic(df: DataFrame, id: Column, vec: Column, cell: Column,
      threshold: Double, maxCellSize: Int = DefaultMaxCellSize): DataFrame = {
    // one materialization: the census groupBy plus the self-join's two
    // branches read it three times
    val e = df.select(cell.as("label"), id.as("vid"), vec.as("v"))
      .localCheckpoint(eager = false)
    // (a, b, cos): consumed by components AND the max-sim aggregate
    val pc = cosinePairs(e, threshold, maxCellSize).localCheckpoint(eager = false)
    val canon = connectedComponents(pc.select(col("a"), col("b")))
    val qcos = floor(col("cos") * 1e4).cast("long").as("qcos")
    val maxSim = pc.select(col("a").as("m_vid"), qcos)
      .union(pc.select(col("b").as("m_vid"), qcos))
      .groupBy(col("m_vid")).agg(max(col("qcos")).as("max_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group_id"))
      .orderBy(col("max_sim").asc, col("doc_id").asc)
    val ranked = canon
      .join(maxSim, canon("doc_id") === maxSim("m_vid"))
      .select(col("doc_id"), col("canon_id").as("group_id"), col("max_sim"))
      .withColumn("rk", row_number().over(w))
    e.select(col("vid"))
      .join(ranked, e("vid") === ranked("doc_id"), "left")
      .select(col("vid"),
        coalesce(col("group_id"), col("vid")).as("group_id"),
        coalesce(col("rk") === 1, lit(true)).as("keep"))
  }

  /** Connected components over a near-duplicate pair list ((a, b)) by
    * alternating large-star / small-star contraction (Kiveris et al. 2014,
    * "Connected Components in MapReduce and Beyond"): each round rewires
    * every vertex's larger neighbors (large-star) and then its smaller
    * neighbors (small-star) to the minimum of the neighborhood, halving
    * component diameter per round, until the edge set is a fixpoint —
    * every component a star centered on its minimum id. This is the
    * "cluster near-dup pairs, keep one canonical document per cluster"
    * step that follows MinHash-LSH in a training pipeline.
    *
    * Scale shape: O(log n) rounds regardless of component diameter (a
    * diameter-d chain converges in ~log2(d) rounds, not d — pinned by a
    * PipelineSpec chain test), each round two vertex-keyed shuffle-joins.
    * Ids only need to be orderable — the convergence check is edge-set
    * equality, no arithmetic on ids, so string keys work (min-label-sum
    * convergence would break on non-numeric ids under ANSI). Each round is
    * checkpointed: lineage is cut so an evicted block can never cascade
    * into recomputing all prior rounds, and the round's blocks are
    * ContextCleaner-reaped when the loop drops them — no per-call cache
    * leak. Everything stays distributed: no vertex list ever collects to
    * the driver.
    *
    * Output: (doc_id, canon_id) for every vertex that appears in a pair,
    * canon_id = min doc_id of its component. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame =
    connectedComponentsImpl(pairs, maxRounds)._1

  /** Leakage-safe train/test split: assign every document a side by
    * hashing its NEAR-DUP CLUSTER id, not its own id — a per-doc random
    * (or hash) split sends members of one near-duplicate family to both
    * sides, and the held-out half then "measures" memorization of
    * training copies (the Lee et al. 2022 "Deduplicating Training Data"
    * finding, applied to the split itself). Clusters are
    * [[connectedComponents]] over any gated pair tier (MinHash-LSH in
    * the registry gate); a document in no pair is its own cluster.
    * `side = test` iff the cluster's md5 bucket < testPct —
    * deterministic, resumable, engine-reproducible, and structurally
    * leak-free: side is a pure function of the cluster id, so no
    * cluster can ever straddle the split.
    *
    * Scale shape: the pair tier's own bounded candidate volume +
    * O(log n) star-contraction rounds + ONE doc-keyed left join; the
    * split decision itself is a map-only projection. docs: (doc_id);
    * pairs: (a, b). Output: (doc_id, group_id, bucket, side). */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
      testPct: Int): DataFrame = {
    require(testPct >= 0 && testPct <= 100,
      s"testPct must be in [0, 100], got $testPct")
    val canon = connectedComponents(pairs)
      .withColumnRenamed("doc_id", "c_doc")
    docs.select(col("doc_id"))
      .join(canon, col("doc_id") === col("c_doc"), "left")
      .select(col("doc_id"),
        coalesce(col("canon_id"), col("doc_id")).as("group_id"))
      .withColumn("bucket", pmod(
        h64(concat(lit("split:"), col("group_id").cast("string"))), lit(100)))
      .withColumn("side",
        when(col("bucket") < testPct, lit("test")).otherwise(lit("train")))
  }

  /** (labels, rounds) — rounds exposed for the test pinning the O(log n)
    * round bound on long chains. */
  private[graft] def connectedComponentsImpl(pairs0: DataFrame,
      maxRounds: Int): (DataFrame, Int) = {
    // One materialization of the (possibly expensive — e.g. a Jaccard
    // verify join) pair plan: the seed below AND the final vertex set
    // both read it, and without the snapshot each would re-execute the
    // whole upstream chain.
    val pairs = pairs0.select(col("a"), col("b")).localCheckpoint(eager = false)
    // Seed with one small-star pass: near-dup graphs are near-cliques,
    // which a single small-star already collapses to stars — the loop
    // then confirms the fixpoint in one round instead of two. (Small-star
    // preserves connectivity, so an extra application is always sound.)
    var edges = cut(smallStar(pairs
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()))
    var round = 0
    var converged = edges.isEmpty // an empty graph is already a fixpoint
    while (!converged && round < maxRounds) {
      // Both sides are distinct canonically-oriented sets, so set equality
      // is "no edge appears on exactly one side". The round's contraction
      // and its convergence check share ONE materialization (r20
      // optimization, guide §2.4 "two operations keyed the same way share
      // one exchange"): the full-outer join against the previous edges is
      // what gets checkpointed, so the check's isEmpty and the next
      // round's reads both scan the cached join output — previously each
      // round materialized `next` AND THEN ran a second full pass (join of
      // two checkpointed sets) just for the check. The contraction's
      // trailing distinct() already hash-partitions on (u, v), the join
      // key, so the fused join adds no exchange over `next`.
      val flagged = cut(smallStar(largeStar(edges))
        .withColumn("__l", lit(1))
        .join(edges.select(col("u"), col("v"), lit(1).as("__r")),
          Seq("u", "v"), "full_outer"))
      converged = flagged
        .where(col("__l").isNull || col("__r").isNull)
        .isEmpty
      edges = flagged.where(col("__l").isNotNull).select(col("u"), col("v"))
      round += 1
    }
    // A silent early exit would return plausible-but-wrong canon ids
    // (contraction stopped mid-way); fail loudly.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxRounds rounds; " +
          "raise maxRounds for pathological graphs")
    val allV = pairs.select(col("a").as("doc_id"))
      .union(pairs.select(col("b").as("doc_id"))).distinct()
    val labels = allV
      .join(edges.select(col("u").as("doc_id"), col("v").as("canon_id")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canon_id"), col("doc_id")).as("canon_id"))
    (labels, round)
  }

  /** End-to-end corpus dedup — the canonical training-data pass in one
    * call: shingle → prefix-filtered exact Jaccard pairs ([[ngramJaccardPrefix]],
    * hot-shingle safe) → connected components ([[connectedComponents]],
    * O(log n) star contraction) → one canonical keeper per duplicate
    * cluster. Fully deterministic (exact pairs, no LSH probability), so
    * the whole chain is oracle-reproducible. Documents with fewer than
    * `n` tokens produce no shingles, never pair, and keep themselves.
    * Output: (doc_id, canon_id, keep) for EVERY input document —
    * `keep` marks the cluster minimum; filter on it to materialize the
    * deduplicated corpus. */
  def dedupCorpus(df: DataFrame, id: Column, toks: Column, n: Int,
      threshold: Double): DataFrame = {
    val sh = shingles(df, id, toks, n).localCheckpoint(eager = false)
    val canon = connectedComponents(
      ngramJaccardPrefix(sh, threshold).select(col("a"), col("b")))
    df.select(id.as("doc_id"))
      .join(canon, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canon_id"), col("doc_id")).as("canon_id"))
      .withColumn("keep", col("canon_id") === col("doc_id"))
  }

  /** Materialize + truncate lineage for one contraction round. A reliable
    * checkpoint dir wins if the session has one (survives executor loss on
    * a cluster); local blocks otherwise (fine in local mode, reaped by the
    * ContextCleaner once the loop drops the reference). */
  private def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Large-star: for every vertex u, connect each neighbor v > u to
    * min(Γ(u) ∪ {u}). Preserves connectivity; output oriented
    * larger → smaller. */
  private def largeStar(edges: DataFrame): DataFrame = {
    // r21 (guide §2.4): min(Γ(u) ∪ {u}) is a MIN OVER the neighbor list's
    // own u-partitions — the groupBy + join-back form exchanged the edge
    // set by u twice per round; the window computes the same m on one
    // exchange. Identical output set (same min, same filters, same
    // trailing distinct).
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
    val nbrs = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    nbrs.withColumn("m", least(col("u"), min(col("v")).over(w)))
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: for every vertex u, connect u and its smaller neighbors
    * to min(Γ(u) ∪ {u}) over the larger → smaller orientation. */
  private def smallStar(edges: DataFrame): DataFrame = {
    // r21 (guide §2.4): same window-for-join-back rewrite as [[largeStar]].
    // The second union branch used to be the distinct mins table; here it
    // is one (u, m) row per oriented edge — the trailing distinct collapses
    // both forms to the identical set.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
    val oriented = edges.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
    val wm = oriented.withColumn("m", min(col("v")).over(w))
    wm.select(col("v").as("u"), col("m").as("v"))
      .union(wm.select(col("u"), col("m").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
  }
}

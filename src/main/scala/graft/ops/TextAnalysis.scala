package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over arbitrary (id, text) DataFrames — the
  * parameterized library surface behind the oracle-gated examples in
  * [[graft.queries.PipelineQueries]]. Every op is a pure per-row
  * projection (no shuffle) except [[bigrams]] (one count shuffle).
  */
object TextAnalysis {

  private val MersennePrime = 2147483647L

  /** Whitespace, word, and BPE-ish pretoken counts plus char length.
    * Output: (id, ws_tokens, word_tokens, bpe_tokens, chars). */
  def tokenCounts(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("id"),
      size(split(trim(text), "\\s+")).as("ws_tokens"),
      // maximal alnum runs ≡ non-empty tokens of split("[^a-z0-9]+"),
      // without the per-element interpreted filter lambda
      size(regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0)))
        .as("word_tokens"),
      size(regexp_extract_all(lower(text),
        lit(" ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+"), lit(0))).as("bpe_tokens"),
      length(text).as("chars"))

  /** Character-distribution entropy — the gibberish/low-diversity filter
    * (base64 blobs and aaaa-runs score near 0, natural text near
    * ln(alphabet)): `ent_q = Σ_c cnt_c · floor(ln(n/cnt_c)·1e6)` over the
    * per-doc character histogram, i.e. n·H in micro-nats. The per-CLASS
    * quantize-then-exact-integer-sum discipline is [[graft.ops.LangModel]]'s
    * — a document's score never depends on float summation order, so the
    * DuckDB oracle reproduces it bit-for-bit. Scale shape: one map-side
    * char explode collapsing straight to the (doc, char) histogram
    * (rows ≤ docs × alphabet), a per-doc window over those histogram
    * rows only, one aggregate back to docs. Char-less docs score 0.
    * Output: (id, n_chars, ent_q). */
  def charEntropy(df: DataFrame, id: Column, text: Column): DataFrame = {
    val base = df.select(id.as("did"), text.as("text"))
    val cf = base
      .select(col("did"), explode(split(col("text"), "")).as("c"))
      .where(col("c") =!= "")
      .groupBy(col("did"), col("c")).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("did"))
    val q = floor(log(col("n").cast("double") / col("cnt").cast("double")) * 1e6)
      .cast("long")
    val sc = cf.withColumn("n", sum(col("cnt")).over(w))
      .groupBy(col("did")).agg(
        max(col("n")).as("n_chars"),
        sum(col("cnt") * q).as("ent_q"))
    base.select(col("did")).join(sc, Seq("did"), "left")
      .select(col("did").as("id"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("ent_q"), lit(0L)).as("ent_q"))
  }

  /** Quality heuristics: word count, alphabetic ratio, stopword ratio.
    * `toks` must be the tokenized form of `text` (caller controls the
    * tokenizer). Output: (id, n_words, alpha_ratio, stopword_ratio). */
  def quality(df: DataFrame, id: Column, text: Column, toks: Column,
      stopwords: Seq[String]): DataFrame =
    df.select(
      id.as("id"),
      size(toks).as("n_words"),
      (length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") /
        greatest(length(text), lit(1))).as("alpha_ratio"),
      (graft.exprs.TokenStats.count_in_set(toks, stopwords).cast("double") /
        greatest(size(toks), lit(1))).as("stopword_ratio"))

  /** Marker-token language id: score per language = marker hits in
    * `toks`, argmax wins (ties broken by earlier entry in `markers`).
    * Output: (id, pred_lang). */
  def langId(df: DataFrame, id: Column, toks: Column,
      markers: Seq[(String, Seq[String])]): DataFrame = {
    val scored = markers.map { case (lang, ms) =>
      struct(graft.exprs.TokenStats.count_in_set(toks, ms).as("score"),
        lit(lang).as("lang"))
    }.reduce((a, b) => when(b.getField("score") > a.getField("score"), b).otherwise(a))
    df.select(id.as("id"), scored.getField("lang").as("pred_lang"))
  }

  /** Gopher-style document quality filter (Rae et al. 2021, Appendix A —
    * the standard web-corpus keep/drop pass, also the RefinedWeb/Dolma
    * baseline): word count within [minWords, maxWords], mean word length
    * in [3, 10], at least 80% of words containing an alphabetic
    * character, and at least `minStopHits` stopword occurrences. One
    * keep/drop bit per document with the contributing metrics exposed so
    * threshold sweeps need no recompute. Pure per-row codegen projection
    * — no HOF lambdas, no shuffle; at 100 TB this is a map-only pass.
    * Output: (id, n_words, mean_word_len, alpha_word_frac, stop_hits,
    * keep). */
  def gopherFilter(df: DataFrame, id: Column, text: Column,
      stopwords: Seq[String], minWords: Long, maxWords: Long,
      minStopHits: Long = 2L): DataFrame = {
    val (nWords, meanLen, alphaFrac, stopHits) = gopherMetrics(text, stopwords)
    df.select(id.as("id"), nWords.as("n_words"),
        meanLen.as("mean_word_len"), alphaFrac.as("alpha_word_frac"),
        stopHits.as("stop_hits"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("alpha_word_frac") >= 0.8 &&
          col("stop_hits") >= minStopHits)
  }

  /** The four Gopher metric expressions over raw `text` — ONE definition
    * shared by [[gopherFilter]] and [[gopherKeep]] so the thresholds
    * can't drift between the metric view and inline predicates. */
  private def gopherMetrics(text: Column,
      stopwords: Seq[String]): (Column, Column, Column, Column) = {
    // null text = empty document (keep=false), not keep=NULL — a null
    // bit would vanish from BOTH where(keep) and where(!keep)
    val t = coalesce(text, lit(""))
    val toks = regexp_extract_all(lower(t), lit("[a-z0-9]+"), lit(0))
    // mean word length without a per-element lambda: total alnum chars /
    // word count (identical because words partition the alnum chars)
    val nWords = size(toks).cast("long")
    val alnumChars = length(regexp_replace(lower(t), "[^a-z0-9]", ""))
    // words containing >= 1 letter: a maximal alnum run with a letter
    // matches this pattern exactly once (greedy tail eats the run)
    val alphaWords = size(regexp_extract_all(lower(t),
      lit("[0-9]*[a-z][a-z0-9]*"), lit(0)))
    (nWords,
      alnumChars.cast("double") / greatest(nWords, lit(1L)),
      alphaWords.cast("double") / greatest(nWords, lit(1L)),
      graft.exprs.TokenStats.count_in_set(toks, stopwords).cast("long"))
  }

  /** [[gopherFilter]]'s keep decision as a bare predicate over raw
    * `text`, for pass-through compositions that must stay single-scan
    * (a WHERE inline in the corpus projection instead of a metric table
    * joined back). Same metrics, same thresholds. */
  def gopherKeep(text: Column, stopwords: Seq[String], minWords: Long,
      maxWords: Long, minStopHits: Long = 2L): Column = {
    val (nWords, meanLen, alphaFrac, stopHits) = gopherMetrics(text, stopwords)
    nWords.between(minWords, maxWords) && meanLen.between(3.0, 10.0) &&
      alphaFrac >= 0.8 && stopHits >= minStopHits
  }

  /** Content fingerprints: md5 over whitespace-normalized lowercase text
    * (order-insensitive to spacing only) + a Rabin-Karp rolling
    * polynomial over the token hash stream (order-sensitive).
    * Output: (id, fingerprint, rolling_hash). */
  def fingerprint(df: DataFrame, id: Column, text: Column, toks: Column,
      base: Long = 1000003L): DataFrame =
    df.select(id.as("id"),
      md5(regexp_replace(lower(trim(text)), "\\s+", " ")).as("fingerprint"),
      graft.exprs.TokenStats.rolling_token_hash(toks, base, MersennePrime)
        .as("rolling_hash"))

  /** (id, bigram) occurrences: posexplode → lead within document —
    * the shared front half of [[bigrams]] and [[repetition]]. */
  private def docBigrams(tokenized: DataFrame, id: Column,
      toks: Column): DataFrame =
    tokenized
      .select(id.as("id"), posexplode(toks).as(Seq("pos", "tok")))
      .withColumn("next", lead(col("tok"), 1).over(
        Window.partitionBy(col("id")).orderBy(col("pos"))))
      .where(col("next").isNotNull)
      .select(col("id"), concat(col("tok"), lit(" "), col("next")).as("bigram"))

  /** Top-k corpus bigrams (collocation mining) over a tokenized table
    * ((id, toks)): posexplode → lead within document → one count shuffle
    * → TakeOrdered cut. Output: (bigram, n). */
  def bigrams(tokenized: DataFrame, id: Column, toks: Column,
      topK: Int): DataFrame =
    docBigrams(tokenized, id, toks)
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(topK)

  /** Within-document repetition metrics — the Gopher/RefinedWeb
    * repetition filters: most-frequent unigram and bigram occurrence
    * fractions plus the fraction of bigram occurrences that are repeats
    * (bigrams seen more than once in the document). Documents with fewer
    * than 2 tokens have no bigrams and are excluded. Two explode →
    * (id, gram) count shuffles; partial aggregation absorbs per-document
    * skew, and nothing is corpus-global, so the shape is linear in
    * corpus size. Output: (id, n_toks, top_unigram_frac,
    * top_bigram_frac, dup_bigram_frac). */
  def repetition(tokenized: DataFrame, id: Column, toks: Column): DataFrame = {
    val base = tokenized.select(id.as("id"), toks.as("toks"))
      .where(size(col("toks")) >= 2)
    val uni = base
      .select(col("id"), explode(col("toks")).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(sum("c").as("n_toks"), max("c").as("top_uni"))
    val bi = docBigrams(base, col("id"), col("toks"))
      .groupBy("id", "bigram").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(
        sum("c").as("n_bi"), max("c").as("top_bi"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup_bi"))
    uni.join(bi, "id")
      .select(col("id"), col("n_toks"),
        (col("top_uni").cast("double") / col("n_toks")).as("top_unigram_frac"),
        (col("top_bi").cast("double") / col("n_bi")).as("top_bigram_frac"),
        (col("dup_bi").cast("double") / col("n_bi")).as("dup_bigram_frac"))
  }

  /** URL domain extraction + per-domain document counts — the web-corpus
    * provenance primitive (domain mixing stats, per-domain caps and
    * blocklists all start here). One codegen regexp projection (no HOF:
    * text is lowercased before extraction so no per-element lambda) and
    * one count shuffle keyed by domain; a document counts once per
    * distinct domain it cites. Output: (domain, n_docs). */
  def domainCounts(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("id"),
        array_distinct(regexp_extract_all(lower(text),
          lit("https?://([a-z0-9.-]+)"), lit(1))).as("domains"))
      .select(col("id"), explode(col("domains")).as("domain"))
      .groupBy(col("domain")).agg(count(lit(1)).as("n_docs"))

  /** C4-style global line dedup (Raffel et al. 2020 kept one occurrence
    * of every three-sentence span corpus-wide; this is the line/sentence
    * granularity of that pass): split each document on `sep`, drop
    * blank segments, and assign every DISTINCT line one owner — the
    * smallest document id containing it. A document "keeps" the lines it
    * owns; repeated lines inside one document also collapse to one.
    * Ownership needs no position bookkeeping: which occurrence inside
    * the owning document survives does not change the count.
    *
    * Scale shape: one shuffle keyed on the line text (the C4 pass is
    * exactly this exact-match aggregate at corpus scale — hot boilerplate
    * lines produce big groups but min() is a trivial combiner-friendly
    * aggregate) plus one doc-keyed count; no joins against the corpus
    * text itself. Output: (id, n_lines, n_kept) per document with at
    * least one non-blank line. */
  def lineDedup(df: DataFrame, id: Column, text: Column,
      sep: String = "\\. "): DataFrame = {
    // two aggregate consumers on different keys (line, id) — snapshot so
    // the corpus split/explode runs once (ReuseExchange cannot fire
    // across differently-keyed shuffles)
    val lines = df.select(id.as("id"), explode(split(text, sep)).as("l"))
      .select(col("id"), trim(col("l")).as("line"))
      .where(length(col("line")) > 0)
      .localCheckpoint(eager = false)
    val owned = lines.groupBy(col("line")).agg(min(col("id")).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_kept"))
    lines.groupBy(col("id")).agg(count(lit(1)).as("n_lines"))
      .join(owned, Seq("id"), "left")
      .select(col("id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** The APPLY form of [[lineDedup]] — C4's pass actually rewrites the
    * corpus, not just counts it: a line survives in doc d at position p
    * iff d is the line's owner (smallest containing doc) AND p is its
    * first occurrence inside d; surviving lines reassemble in original
    * order. Output: (id, n_kept, new_text) for docs owning >= 1 line.
    *
    * Scale shape: same two keyed aggregates as [[lineDedup]] plus one
    * doc-keyed reassembly aggregate (collect_list of the doc's OWN
    * surviving lines only — bounded by the doc's size, never a corpus
    * blowup); the exploded line table is snapshotted once for its two
    * consumers. */
  def lineDedupApply(df: DataFrame, id: Column, text: Column,
      sep: String = "\\. ", joinWith: String = ". "): DataFrame = {
    val lines = df
      .select(id.as("id"), posexplode(split(text, sep)).as(Seq("pos", "l")))
      .select(col("id"), col("pos"), trim(col("l")).as("line"))
      .where(length(col("line")) > 0)
      .localCheckpoint(eager = false)
    val owner = lines.groupBy(col("line")).agg(min(col("id")).as("id"))
    val firstPos = lines.groupBy(col("id"), col("line"))
      .agg(min(col("pos")).as("pos"))
    // ordered reassembly without a per-element lambda: field extraction
    // over an array of structs is a native GetArrayStructFields
    firstPos.join(owner, Seq("line", "id"))
      .groupBy(col("id")).agg(
        count(lit(1)).as("n_kept"),
        concat_ws(joinWith,
          array_sort(collect_list(struct(col("pos"), col("line"))))
            .getField("line")).as("new_text"))
  }

  /** URL canonicalization — the normalization every URL-keyed dedup or
    * blocklist pass runs first (CommonCrawl-style pipelines dedup crawl
    * records on exactly this key before any content pass). Rules, in
    * order: drop the fragment; lowercase the scheme+authority (paths
    * stay case-sensitive per RFC 3986); strip the scheme's default port
    * (`:443` for https, `:80` for http); drop a pure-tracking query
    * (`?utm_...` with only `utm_*`/`&`-joined params); strip one
    * trailing slash. Pure ordered `regexp_replace` chain — codegen'd,
    * engine-portable (no lookaround), map-only at any scale. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // lowercase ONLY the scheme and the host[:port] — userinfo
    // (user:Pass@host) is case-sensitive per RFC 3986, so split the
    // authority at its last '@' and rebuild, lowering just the two
    // case-insensitive parts
    val prefix = regexp_extract(noFrag, "^([^/?]*://[^/?]*)", 1)
    val rest = noFrag.substr(length(prefix) + 1, length(noFrag))
    val scheme = lower(regexp_extract(prefix, "^([^:]*)://", 1))
    val auth = regexp_extract(prefix, "^[^:]*://(.*)$", 1)
    val userinfo = regexp_extract(auth, "^(.*@)", 1) // greedy → last '@'
    val hostPort = lower(regexp_replace(auth, "^.*@", ""))
    val hostStripped = when(scheme === "https",
        regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    // scheme-less input never matched `prefix`: pass it through untouched
    val noPort = when(length(prefix) === 0, lit(""))
      .otherwise(concat(scheme, lit("://"), userinfo, hostStripped))
    val joined = concat(noPort, rest)
    // (?i): tracking params are stripped whatever their case — '?UTM_SOURCE='
    // must collapse with '?utm_source=' (RE2-safe inline flag)
    val noUtm = regexp_replace(joined,
      "(?i)\\?utm_[a-z]+=[^?#&]*(&utm_[a-z]+=[^?#&]*)*$", "")
    regexp_replace(noUtm, "/$", "")
  }

  /** URL-keyed exact dedup over [[canonicalUrl]]: one occurrence per
    * canonical URL survives (smallest id). One md5-keyed shuffle — the
    * cheapest dedup pass a crawl corpus runs, before any content hash.
    * Output: (canon_url, keep_id, copies). */
  def urlDedup(df: DataFrame, id: Column, url: Column): DataFrame =
    df.select(id.as("id"), canonicalUrl(url).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("copies"))

  /** Fixed-weight linear quality classifier over the Gopher metric
    * features — the shape of a fastText/logreg quality scorer applied at
    * corpus scale (the weights come from offline training; the engine's
    * job is the map-only scoring pass). The score is integer-quantized
    * so thresholding is engine-reproducible: features are floored to
    * integers FIRST (each an exact IEEE op on both engines), then
    * combined with integer weights — keep iff score >= 0.
    *
    *   f_alpha = floor(1000 · alpha_word_frac)   ∈ [0, 1000]
    *   f_stop  = min(stop_hits, 20)
    *   f_len   = floor(100 · mean_word_len)
    *   score   = 3·f_alpha + 150·f_stop − 2·|f_len − 550| − 2500
    *
    * One codegen projection, no shuffle. Output: (id, score_q, keep). */
  def qualityLinear(df: DataFrame, id: Column, text: Column,
      stopwords: Seq[String]): DataFrame = {
    val (_, meanLen, alphaFrac, stopHits) = gopherMetrics(text, stopwords)
    val fAlpha = floor(alphaFrac * 1000).cast("long")
    val fStop = least(stopHits, lit(20L))
    val fLen = floor(meanLen * 100).cast("long")
    val score = fAlpha * 3L + fStop * 150L - abs(fLen - 550L) * 2L - 2500L
    df.select(id.as("id"), score.as("score_q"))
      .withColumn("keep", col("score_q") >= 0L)
  }

  /** Integer-quantized quality features + the Gopher weak label — the
    * training table for [[LogReg]]-style quality-classifier distillation:
    * x0 = 1 (bias), x1 = min(stop_hits, 20) − 10, x2 = min(n_words,
    * 100) − 50, y = 1 iff [[gopherKeep]]. CENTERED, and restricted to
    * the dimensions whose Gopher conditions actually vary on web-shaped
    * text (stop-hit mass and document length): a feature whose keep
    * condition never fires carries no label signal and only
    * ill-conditions full-batch GD (measured on the fixture — alpha-frac
    * and mean-word-len never fail there, and including them left the
    * model degenerate at the always-keep base rate). Map-only.
    * Output: (id, x0, x1, x2, y). */
  def quantizedQualityFeatures(df: DataFrame, id: Column, text: Column,
      stopwords: Seq[String], minWords: Long, maxWords: Long): DataFrame = {
    val (nWords, _, _, stopHits) = gopherMetrics(text, stopwords)
    df.select(id.as("id"),
      lit(1L).as("x0"),
      (least(stopHits, lit(20L)) - 10L).as("x1"),
      (least(nWords, lit(100L)) - 50L).as("x2"),
      when(gopherKeep(text, stopwords, minWords, maxWords), 1L)
        .otherwise(0L).as("y"))
  }

  /** Per-document top-k keyword extraction by tf·idf over a pre-tokenized
    * corpus. Classic smoothed idf, quantized ONCE to a 64-bit integer —
    * `idf_q = ⌊ln((N+1)/(df+1)) · 10⁶⌋` — so the per-term score
    * `tfidf_q = tf · idf_q` is exact integer arithmetic and the top-k
    * ordering (tfidf_q desc, term asc) is engine-reproducible (the
    * [[LangModel]] quantize-then-integer discipline; the single ln sits
    * on a rational argument both engines compute identically).
    *
    * Scale shape: explode → (id, term) count aggregate (map-side
    * combine), a term-keyed df aggregate OVER THE TF TABLE (bounded by
    * distinct (doc, term) pairs, not token instances), the corpus-size
    * scalar rides in as a 1-row broadcast, and the final top-k is a
    * per-doc window over that doc's distinct terms only. No posting-list
    * self-join anywhere, so a hot term costs its df, never df².
    *
    * `tokenized`: (id, toks); output (id, rank, term, tfidf_q). */
  def tfidfTop(tokenized: DataFrame, id: Column, toks: Column,
      k: Int): DataFrame = {
    val tf = tokenized.select(id.as("id"), explode(toks).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val nDocs = tokenized.select(id.as("id")).agg(count(lit(1)).as("n_docs"))
    // r21 (guide §2.4): document frequency is a COUNT OVER the tf table's
    // term partitions — one row per (doc, term) is exactly df — so the old
    // df aggregate + join-back (a second term-keyed exchange of the whole
    // tf table plus a join) collapses into one window on the same
    // term-keyed exchange. tf then has a single consumer and needs no
    // snapshot; values are bit-identical (same count, same idf formula).
    val dfW = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(dfW))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_q",
        floor(log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) *
          lit(1000000.0)).cast("long"))
      .withColumn("tfidf_q", col("tf") * col("idf_q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("tfidf_q").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tfidf_q"))
  }

  /** Regex PII scrub: counts matches of each (tag, pattern) and replaces
    * them with `<TAG>` in order. Patterns should avoid lookaround if an
    * RE2-based oracle needs to reproduce them.
    * Output: (id, n_<tag>..., scrubbed_len, scrubbed). */
  def piiScrub(df: DataFrame, id: Column, raw: Column,
      patterns: Seq[(String, String)]): DataFrame = {
    val counts = patterns.map { case (tag, p) =>
      size(regexp_extract_all(raw, lit(p), lit(0))).as(s"n_$tag")
    }
    val scrubbed = patterns.foldLeft(raw) { case (c, (tag, p)) =>
      regexp_replace(c, p, s"<${tag.toUpperCase}>")
    }
    df.select(id.as("id") +: counts :+
      length(scrubbed).as("scrubbed_len") :+ scrubbed.as("scrubbed"): _*)
  }
  /** T5-style span corruption (Raffel et al. 2020 §3.1.4) — the
    * objective-preparation pass that turns curated text into
    * (input, target) denoising pairs: fixed-length token blocks are
    * masked by a deterministic hash on (id, block) — hash, not rand(),
    * so the corruption is reproducible across runs, engines, and epochs
    * (vary the salt for fresh noise per epoch) — each masked block is
    * replaced by one `<X_n>` sentinel in the input, and the target lists
    * every sentinel followed by the tokens it hid. A 1-in-`modDen` block
    * rate with `span`-token blocks approximates the paper's 15% noise
    * density at mean span `span`; fixed-length blocks (rather than
    * sampled span lengths) are the deterministic simplification, and
    * adjacent masked blocks keep separate sentinels (the paper merges
    * runs — a documented divergence that keeps the oracle a pure
    * restatement).
    *
    * Scale shape: posexplode → one (id, block)-keyed window over MASKED
    * blocks only (≈ tokens/(span·modDen) rows) → one id-keyed
    * collect_list re-assembly, the [[lineDedupApply]] rebuild pattern —
    * nothing corpus-global. Output: (id, input, target, n_masked). */
  def spanCorrupt(tokenized: DataFrame, id: Column, toks: Column,
      span: Int, modDen: Long): DataFrame = {
    // two consumers (the exploded stream + the final id join) — snapshot,
    // per the module self-join rule
    val t = tokenized.select(id.as("id"), toks.as("toks"))
      .localCheckpoint(eager = false)
    val e = t
      .select(col("id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn("blk", expr(s"pos DIV $span"))
      .withColumn("masked",
        Hashing.h64(concat(lit("sc:"), col("id").cast("string"),
          lit(":"), col("blk"))) % modDen === 0)
    val w = Window.partitionBy(col("id")).orderBy(col("blk"))
    val mb = e.where(col("masked")).select(col("id"), col("blk")).distinct()
      .withColumn("sent", row_number().over(w))
    val arr = e.join(mb, Seq("id", "blk"), "left")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("tok"),
        col("sent")))).as("arr"))
      .select(col("id"),
        expr(s"""array_join(transform(
          filter(arr, x -> x.sent IS NULL OR x.pos % $span = 0),
          x -> CASE WHEN x.sent IS NULL THEN x.tok
               ELSE concat('<X_', x.sent, '>') END), ' ')""").as("input"),
        expr(s"""array_join(transform(
          filter(arr, x -> x.sent IS NOT NULL),
          x -> CASE WHEN x.pos % $span = 0
               THEN concat('<X_', x.sent, '> ', x.tok) ELSE x.tok END),
          ' ')""").as("target"),
        expr("CAST(size(filter(arr, x -> x.sent IS NOT NULL)) AS BIGINT)")
          .as("n_masked"))
    t.select(col("id")).join(arr, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("input"), lit("")).as("input"),
        coalesce(col("target"), lit("")).as("target"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"))
  }
  /** Fill-in-the-middle transformation (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle") — the second
    * objective-preparation op next to [[spanCorrupt]]: a deterministic
    * hash coin selects `1/fimDen` of documents for FIM; each selected
    * document's token stream splits at two hash-chosen cut points into
    * (prefix, middle, suffix) and re-serializes in PSM order
    * `<PRE> p <SUF> s <MID> m`, teaching the model to infill; unselected
    * documents pass through verbatim (the paper's joint objective). All
    * three hash draws key on the id — reproducible across engines,
    * epochs, and resumes, like every sampling decision in this module.
    * Map-only: slicing and re-serialization are per-row HOFs; nothing
    * shuffles. Output: (id, fim, out). */
  def fimTransform(tokenized: DataFrame, id: Column, toks: Column,
      fimDen: Long): DataFrame = {
    val t = tokenized.select(id.as("id"), toks.as("toks"))
      .withColumn("len", size(col("toks")).cast("long"))
      .withColumn("fim",
        Hashing.h64(concat(lit("fim:"), col("id").cast("string"))) % fimDen === 0)
      .withColumn("c1",
        Hashing.h64(concat(lit("fim1:"), col("id").cast("string"))) % (col("len") + 1))
      .withColumn("c2",
        Hashing.h64(concat(lit("fim2:"), col("id").cast("string"))) % (col("len") + 1))
      .withColumn("lo", least(col("c1"), col("c2")).cast("int"))
      .withColumn("hi", greatest(col("c1"), col("c2")).cast("int"))
    t.select(col("id"), col("fim"),
      when(!col("fim"), array_join(col("toks"), " "))
        .otherwise(concat(
          lit("<PRE> "),
          array_join(slice(col("toks"), lit(1), col("lo")), " "),
          lit(" <SUF> "),
          array_join(slice(col("toks"), col("hi") + 1,
            size(col("toks")) - col("hi")), " "),
          lit(" <MID> "),
          array_join(slice(col("toks"), col("lo") + 1, col("hi") - col("lo")),
            " ")))
        .as("out"))
  }
}

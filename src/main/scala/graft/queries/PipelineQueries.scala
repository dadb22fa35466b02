package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.functions.TextFunctions.tokenizeDefault

/** Large-scale training-data pipeline operators over `documents` and
  * `embeddings` — the north-star surface beyond the reference's own
  * (BASELINE.json): deduplication (exact, n-gram Jaccard, MinHash+LSH,
  * SimHash, embedding-cosine), similarity search (brute-force and
  * cell-partitioned ANN), and text analysis (token stats, quality score,
  * language id, fingerprinting).
  *
  * Everything is deterministic so DuckDB oracles hash-match exactly:
  * hashes derive from md5 prefixes (identical in both engines via
  * `conv(substr(md5(x),1,15),16,10)` ≡ `('0x'||substr(md5(x),1,15))::BIGINT`),
  * similarity *scores* are never emitted when float summation order could
  * differ — only integer ids, ranks, and exact counts.
  *
  * Scale shapes (each noted per operator): the shingle/band joins are the
  * canonical "explode → shuffle on token → pair-count" pattern whose cost
  * is bounded by band width rather than corpus²; cosine dedup/ANN restrict
  * the quadratic candidate space by LSH bands or coarse cells (here the
  * `label` column plays the IVF-cell role).
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  /** md5-prefix → 60-bit positive long, identical in DuckDB. */
  private def h64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def docs(s: SparkSession, dir: String) =
    table(s, dir, "documents")

  private def shingled(s: SparkSession, dir: String, n: Int = 3): DataFrame =
    docs(s, dir)
      .withColumn("toks", tokenizeDefault(col("text")))
      .where(size(col("toks")) >= n)
      .withColumn("shingles", array_distinct(
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ",
            element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2),
            element_at(col("toks"), i + 3)))))

  // ---- dedup ------------------------------------------------------------

  /** Exact dedup: hash-groupBy on content hash, keep min doc_id. One
    * shuffle on a 128-bit key; at 100 TB this is the cheapest dedup and
    * the standard first pass. */
  val dedup_exact: Q = (s, dir) =>
    docs(s, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("copies"))
      .select(col("keep_doc_id"), col("copies"))
      .orderBy(col("keep_doc_id"))

  /** Near-dedup by exact n-gram Jaccard >= 0.5: explode shingles → join on
    * shingle → pair intersection counts → |A∪B| from per-doc counts.
    * Quadratic only within a shingle's posting list — the reason the
    * MinHash variant below exists for the heavy tail at scale. */
  val dedup_ngram_jaccard: Q = (s, dir) => {
    val sh = shingled(s, dir)
      .select(col("doc_id"), size(col("shingles")).as("nsh"),
        explode(col("shingles")).as("sh"))
    val a = sh.select(col("doc_id").as("a"), col("nsh").as("na"), col("sh"))
    val b = sh.select(col("doc_id").as("b"), col("nsh").as("nb"), col("sh"))
    a.join(b, "sh")
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= 0.5)
      .select(col("a"), col("b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("uni"))
      .orderBy(col("a"), col("b"))
  }

  private val NumHashes = 16
  private val Bands = 4
  private val RowsPerBand = NumHashes / Bands

  /** MinHash signature + LSH banding: 16 md5-derived hash functions, 4
    * bands × 4 rows; candidate pairs share at least one band. The shuffle
    * key is (band index, band signature) — constant width per doc
    * regardless of document size, which is what makes this the scale path:
    * candidate generation is linear in corpus size + band-bucket joins. */
  val dedup_minhash_lsh: Q = (s, dir) => {
    val sh = shingled(s, dir)
    val sigs = sh.select(
      col("doc_id") +: (0 until NumHashes).map(i =>
        array_min(transform(col("shingles"), x => h64(concat(lit(s"$i|"), x))))
          .as(s"mh$i")): _*)
    val bands = sigs.select(
      col("doc_id"),
      explode(array((0 until Bands).map { bIdx =>
        struct(lit(bIdx).as("band"),
          concat_ws("_", (0 until RowsPerBand)
            .map(r => col(s"mh${bIdx * RowsPerBand + r}")): _*).as("sig"))
      }: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.sig"))
    val l = bands.select(col("band"), col("sig"), col("doc_id").as("a"))
    val r = bands.select(col("band"), col("sig"), col("doc_id").as("b"))
    l.join(r, Seq("band", "sig"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
      .orderBy(col("a"), col("b"))
  }

  /** 64-bit SimHash over token hashes; near-dup = hamming distance <= 8.
    * Signature build is one narrow pass; the pair scan here is exact
    * (small corpus); at scale the standard trick applies: split the 64
    * bits into 4 chunks, bucket-join on each chunk (any pair at distance
    * <= 8 shares at least one exact 16-bit chunk is NOT guaranteed, but
    * distance <= 3 with 4 chunks is — documented recall contract). */
  val dedup_simhash: Q = (s, dir) => {
    val toks = docs(s, dir)
      .select(col("doc_id"), explode(tokenizeDefault(col("text"))).as("tok"))
      .withColumn("th", h64(col("tok")))
    // 63 bits: bit 63 would be the sign bit and the oracle's power(2,63)
    // overflows BIGINT; the md5-prefix hash is 60 bits anyway.
    val bitCols: Seq[Column] = (0 until 63).map { bit =>
      sum(when(col("th").bitwiseAND(lit(1L << bit)) =!= 0L, 1).otherwise(-1))
        .as(s"b$bit")
    }
    val sigs = toks.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
      .select(col("doc_id"),
        (0 until 63).map(bit => when(col(s"b$bit") > 0, lit(1L << bit)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
    val a = sigs.select(col("doc_id").as("a"), col("simhash").as("ha"))
    val b = sigs.select(col("doc_id").as("b"), col("simhash").as("hb"))
    a.crossJoin(b)
      .where(col("a") < col("b"))
      .withColumn("dist", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .where(col("dist") <= 8)
      .select(col("a"), col("b"), col("dist"))
      .orderBy(col("a"), col("b"))
  }

  /** Embedding near-dup: cosine >= 0.4 pairs (the threshold that yields
    * actual pairs in this corpus). Scores stay internal (float summation
    * order differs between engines); output is id pairs only. The label
    * column bounds the candidate space (same-cell pairs), the same
    * coarse-quantization contract as the ANN below. */
  val dedup_embedding: Q = (s, dir) => {
    val e = table(s, dir, "embeddings")
    val a = e.select(col("label"), col("vec_id").as("a"), col("embedding").as("va"))
    val b = e.select(col("label"), col("vec_id").as("b"), col("embedding").as("vb"))
    a.join(b, "label")
      .where(col("a") < col("b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .where(col("cos") >= 0.4)
      .select(col("a"), col("b"))
      .orderBy(col("a"), col("b"))
  }

  /** Cosine similarity via codegen'd higher-order functions (double
    * accumulation in index order — deterministic plan). */
  private def cosine(x: Column, y: Column): Column = {
    def dot(p: Column, q: Column): Column =
      aggregate(zip_with(p, q, (u, v) => u.cast("double") * v.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(x, y) / (sqrt(dot(x, x)) * sqrt(dot(y, y)))
  }

  // ---- similarity search ------------------------------------------------

  /** Brute-force exact top-5 cosine neighbors for the first 20 vectors.
    * The baseline ANN contract; O(Q×N) — fine for a query batch, the cell
    * variant below is the scale path. */
  val knn_brute: Q = (s, dir) => {
    val e = table(s, dir, "embeddings")
    val q = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    q.crossJoin(e.select(col("vec_id"), col("embedding")))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosine(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Cell-partitioned ANN (IVF shape): probe only the query's coarse cell
    * — here the label column stands in for the k-means coarse quantizer.
    * Cuts the candidate space by the cell count; the recall/probe tradeoff
    * is the standard IVF nprobe knob. */
  val knn_cell: Q = (s, dir) => {
    val e = table(s, dir, "embeddings")
    val q = e.where(col("vec_id") < 20)
      .select(col("label"), col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    q.join(e.select(col("label"), col("vec_id"), col("embedding")), "label")
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosine(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor"))
      .orderBy(col("qid"), col("rank"))
  }

  // ---- text analysis ----------------------------------------------------

  /** Token counting: whitespace tokens and a BPE-ish alnum/punct split. */
  val text_token_count: Q = (s, dir) =>
    docs(s, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
        size(filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= ""))
          .as("word_tokens"),
        length(col("text")).as("chars"))
      .orderBy(col("doc_id"))

  /** Quality scoring: length, word stats, stopword ratio, alpha ratio. */
  val text_quality: Q = (s, dir) => {
    val stop = Seq("the", "a", "and", "of", "to", "in", "is")
    docs(s, dir)
      .withColumn("toks", tokenizeDefault(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_words"),
        (length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") /
          greatest(length(col("text")), lit(1))).as("alpha_ratio"),
        (size(filter(col("toks"), t => t.isin(stop.map(lit(_)): _*))).cast("double") /
          greatest(size(col("toks")), lit(1))).as("stopword_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Language id: n-gram/stopword heuristic — score per language = marker
    * token hits, argmax wins (ties broken by language code order).
    * Deterministic function of the text, so the oracle expresses the same
    * formula; the `lang` column is NOT consulted. */
  val text_langid: Q = (s, dir) => {
    val markers: Seq[(String, Seq[String])] = Seq(
      "de" -> Seq("der", "die", "und", "das"),
      "en" -> Seq("the", "a", "and", "of"),
      "es" -> Seq("el", "la", "los", "de"),
      "fr" -> Seq("le", "la", "et", "les"),
      "zh" -> Seq("de", "shi", "le", "wo"))
    val withToks = docs(s, dir).withColumn("toks", tokenizeDefault(col("text")))
    val scored = markers.foldLeft(withToks) { case (df, (lang, ms)) =>
      df.withColumn(s"score_$lang",
        size(filter(col("toks"), t => t.isin(ms.map(lit(_)): _*))))
    }
    val best = markers.map { case (lang, _) =>
      struct(col(s"score_$lang").as("score"), lit(lang).as("lang"))
    }.reduce((a, b) => when(b.getField("score") > a.getField("score"), b).otherwise(a))
    scored
      .select(col("doc_id"), best.getField("lang").as("pred_lang"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: md5 over whitespace-normalized lowercase text
    * (the canonical content-defined fingerprint for cache keys). */
  val text_fingerprint: Q = (s, dir) =>
    docs(s, dir)
      .select(col("doc_id"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fingerprint"))
      .orderBy(col("doc_id"))

  // ---- multimodal -------------------------------------------------------

  /** Multimodal column plumbing: opaque binary payloads + typed metadata.
    * The payload here is the utf-8 encoding of the text (the container has
    * no image/audio codecs — see MultimodalSpec for the stubbed
    * decode/feature-extract path over mapPartitions); the Spark-side
    * contract (binary column, metadata struct, partition-parallel byte
    * processing) is real: byte length, content hash, and a "frame sample"
    * (fixed-offset byte slices — the video-keyframe access pattern). */
  val mm_binary_stats: Q = (s, dir) =>
    docs(s, dir)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("content_hash"),
        base64(encode(substring(col("text"), 1, 8), "UTF-8")).as("frame0"))
      .orderBy(col("doc_id"))

  val all: Map[String, Q] = Map(
    "dedup_exact" -> dedup_exact,
    "dedup_ngram_jaccard" -> dedup_ngram_jaccard,
    "dedup_minhash_lsh" -> dedup_minhash_lsh,
    "dedup_simhash" -> dedup_simhash,
    "dedup_embedding" -> dedup_embedding,
    "knn_brute" -> knn_brute,
    "knn_cell" -> knn_cell,
    "text_token_count" -> text_token_count,
    "text_quality" -> text_quality,
    "text_langid" -> text_langid,
    "text_fingerprint" -> text_fingerprint,
    "mm_binary_stats" -> mm_binary_stats
  )

  /** DuckDB rendition of [[tokenizeDefault]]. */
  private val toksSql =
    """list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
      |        t -> t <> '' AND octet_length(encode(t)) <= 40)""".stripMargin

  private val shingleSql =
    s"""SELECT doc_id,
       |  list_distinct(list_transform(range(len(toks) - 2),
       |    i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]))) AS shingles
       |FROM (SELECT doc_id, $toksSql AS toks FROM documents)
       |WHERE len(toks) >= 3""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_doc_id, count(*) AS copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH sh AS ($shingleSql),
         |ex AS (SELECT doc_id, len(shingles) AS nsh, unnest(shingles) AS s FROM sh)
         |SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter,
         |  a.nsh + b.nsh - count(*) AS uni
         |FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |GROUP BY 1, 2, a.nsh, b.nsh
         |HAVING CAST(count(*) AS DOUBLE) / (a.nsh + b.nsh - count(*)) >= 0.5
         |ORDER BY a, b""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH sh AS ($shingleSql),
         |sig AS (
         |  SELECT doc_id, band,
         |    concat_ws('_',
         |      min(CAST(('0x' || substr(md5(CAST(band*4+0 AS VARCHAR) || '|' || s), 1, 15)) AS BIGINT)),
         |      min(CAST(('0x' || substr(md5(CAST(band*4+1 AS VARCHAR) || '|' || s), 1, 15)) AS BIGINT)),
         |      min(CAST(('0x' || substr(md5(CAST(band*4+2 AS VARCHAR) || '|' || s), 1, 15)) AS BIGINT)),
         |      min(CAST(('0x' || substr(md5(CAST(band*4+3 AS VARCHAR) || '|' || s), 1, 15)) AS BIGINT))
         |    ) AS sig
         |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
         |  CROSS JOIN (SELECT unnest(range(4)) AS band)
         |  GROUP BY doc_id, band)
         |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |FROM sig l JOIN sig r ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
         |ORDER BY a, b""".stripMargin,
    "dedup_simhash" ->
      s"""WITH th AS (
         |  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
         |  FROM (SELECT doc_id, unnest($toksSql) AS tok FROM documents)),
         |sig AS (
         |  SELECT doc_id,
         |    bit_or(CASE WHEN cnt > 0 THEN power_of_two ELSE 0 END) AS simhash
         |  FROM (
         |    SELECT doc_id, bit,
         |      CAST(power(2, bit) AS BIGINT) AS power_of_two,
         |      sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS cnt
         |    FROM th CROSS JOIN (SELECT unnest(range(63)) AS bit)
         |    GROUP BY doc_id, bit)
         |  GROUP BY doc_id)
         |SELECT a.doc_id AS a, b.doc_id AS b,
         |  bit_count(xor(a.simhash, b.simhash)) AS dist
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
         |ORDER BY a, b""".stripMargin,
    "dedup_embedding" ->
      """SELECT a.vec_id AS a, b.vec_id AS b
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        |ORDER BY a, b""".stripMargin,
    "knn_brute" ->
      """SELECT qid, rank, neighbor FROM (
        |  SELECT q.vec_id AS qid, e.vec_id AS neighbor,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id ASC) AS rank
        |  FROM embeddings q CROSS JOIN embeddings e
        |  WHERE q.vec_id < 20 AND e.vec_id <> q.vec_id)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "knn_cell" ->
      """SELECT qid, rank, neighbor FROM (
        |  SELECT q.vec_id AS qid, e.vec_id AS neighbor,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id ASC) AS rank
        |  FROM embeddings q JOIN embeddings e ON q.label = e.label
        |  WHERE q.vec_id < 20 AND e.vec_id <> q.vec_id)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(trim(text), '\S+')) AS ws_tokens,
        |  len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS word_tokens,
        |  length(text) AS chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id,
         |  len(toks) AS n_words,
         |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
         |    / greatest(length(text), 1) AS alpha_ratio,
         |  CAST(len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is'))) AS DOUBLE)
         |    / greatest(len(toks), 1) AS stopword_ratio
         |FROM (SELECT doc_id, text, $toksSql AS toks FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      s"""SELECT doc_id,
         |  CASE greatest(s_de, s_en, s_es, s_fr, s_zh)
         |    WHEN s_de THEN 'de'
         |    WHEN s_en THEN 'en'
         |    WHEN s_es THEN 'es'
         |    WHEN s_fr THEN 'fr'
         |    ELSE 'zh' END AS pred_lang
         |FROM (
         |  SELECT doc_id,
         |    len(list_filter(toks, t -> t IN ('der','die','und','das'))) AS s_de,
         |    len(list_filter(toks, t -> t IN ('the','a','and','of'))) AS s_en,
         |    len(list_filter(toks, t -> t IN ('el','la','los','de'))) AS s_es,
         |    len(list_filter(toks, t -> t IN ('le','la','et','les'))) AS s_fr,
         |    len(list_filter(toks, t -> t IN ('de','shi','le','wo'))) AS s_zh
         |  FROM (SELECT doc_id, $toksSql AS toks FROM documents))
         |ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_binary_stats" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS content_hash,
        |  to_base64(encode(substring(text, 1, 8))) AS frame0
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}

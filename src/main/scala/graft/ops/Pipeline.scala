package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.yaml.snakeyaml.{LoaderOptions, Yaml}
import org.yaml.snakeyaml.constructor.SafeConstructor

import graft.functions.TextFunctions.tokenizeDefault

/** The end-to-end training-data pipeline as ONE composable entry point —
  * curate (Gopher quality keep) → exact dedup → optional per-source
  * quota (two-pass) → optional Bloom decontamination → optional
  * weighted-sample budget → optional MIXTURE REALIZATION
  * (`mix_weights`: each listed source cut exactly at its no-upsampling
  * token allocation — the pipe_mix_realize cut; with
  * `mix_epochs_budget` set, the MULTI-EPOCH plan instead — water-filled
  * allocations become full passes + a fractional cut and the sink
  * writes per-epoch shard trees, r18) → optional LEAKAGE-SAFE
  * train/test holdout (`split_test_pct`, cluster-hashed so no near-dup
  * family straddles sides) → deterministic epoch shuffle → shard SINK
  * with the manifest commit point (per side when split, per epoch when
  * upsampled). Every stage is an already-oracle-gated
  * operator from this package ([[TextAnalysis.gopherKeep]],
  * [[Dedup.decontaminateBloom]], [[EpochShuffle.writeShards]]); this
  * object only sequences them and parses the YAML config the CLI's
  * `pipeline` verb takes, so the composition a user actually runs is the
  * same code the per-stage gates exercise.
  *
  * Scale shape: the corpus is scanned once per keep-signal family (the
  * pipe_curate_v3 pattern), the dedup window shuffles on the content
  * hash, decontamination probes a broadcast word table, and the sink is
  * [[EpochShuffle]]'s one shard-keyed exchange — no stage holds more
  * than model/census-sized state on the driver (the decontamination
  * filter is m/32 BIGINTs; the shard census is one scalar).
  */
object Pipeline {

  /** YAML-parsed pipeline run configuration. Field names follow the
    * reference CLI's snake_case config convention. */
  final case class Config(
      input: String,                    // JSONL corpus path
      output: String,                   // shard-sink directory
      textField: String = "text",
      idField: Option[String] = None,   // absent: md5(text) after dedup
      sourceField: Option[String] = None,
      minWords: Long = 30L,
      maxWords: Long = 100000L,
      stopwords: Seq[String] =
        Seq("the", "a", "and", "of", "to", "in", "is"),
      benchmark: Option[String] = None, // JSONL blocklist for decontam
      domainQuota: Option[Long] = None, // per-source doc cap (two-pass)
      sampleK: Option[Int] = None,      // corpus budget: weighted sample
      /** Training-mixture spec: source → integer weight parts. Non-empty
        * = realize the mixture ([[Mixture.mixRealizeKept]]): each LISTED
        * source is cut exactly at its no-upsampling token allocation
        * (weight·u tokens, u = min_s ⌊tokens_s/w_s⌋); sources NOT listed
        * are dropped — a mixture spec enumerates its corpus, silently
        * passing an unlisted source through would corrupt the mix. */
      mixWeights: Map[String, Long] = Map.empty,
      /** Multi-epoch budget multiplier (`mix_epochs_budget`): when set,
        * the mixture stage realizes the MULTI-EPOCH plan instead of the
        * single no-upsampling cut — total tokens = multiplier × the
        * surviving listed corpus, allocated ∝ `mixWeights` with
        * water-filling shortfall redistribution
        * ([[Mixture.mixEpochsKept]]), and the sink writes per-epoch
        * shard trees ([[EpochShuffle.writeEpochShards]]) so each pass
        * lands in its own shard order. Requires `mixWeights` non-empty
        * and is mutually exclusive with `splitTestPct` (cut the
        * holdout BEFORE upsampling — run a split pipeline first). */
      mixEpochsBudget: Option[Long] = None,
      mixEpochsMax: Long = 3L,
      /** Stride-ordered shards (`schedule: true`, r18 verdict #1/#5):
        * the sink writes each shard's rows in the mixture's
        * source-interleave order ([[Mixture.mixSchedule]]'s stride key,
        * computed per shard — [[EpochShuffle.writeShardsScheduled]] /
        * [[EpochShuffle.writeEpochShardsScheduled]]) instead of hash
        * order, so a trainer reading ONE shard sequentially sees each
        * source at its weighted rate in every prefix. Shard MEMBERSHIP
        * is unchanged (same hash key) — only the intra-shard order
        * moves. Requires `mixWeights`: the stride rates ARE the
        * mixture weights. */
      schedule: Boolean = false,
      shingleN: Int = 5,
      bloomBits: Int = 1 << 18,
      bloomHashes: Int = 3,
      seed: String = "epoch1",
      targetShardSize: Long = 1L << 28, // ~256 MB of chars per shard
      splitTestPct: Option[Int] = None) // leakage-safe holdout %

  /** Parse the `pipeline` verb's YAML. Required keys: `input`, `output`;
    * everything else defaults as in [[Config]]. Unknown keys are
    * rejected loudly — a typo'd threshold silently running the default
    * is the config-file failure mode that loses corpora. */
  def fromYaml(yamlText: String): Config = {
    val yaml = new Yaml(new SafeConstructor(new LoaderOptions))
    val root = Option(yaml.load[java.util.Map[String, Object]](yamlText))
      .map(_.asScala.toMap).getOrElse(Map.empty[String, Object])
    val known = Set("input", "output", "text_field", "id_field",
      "source_field", "min_words", "max_words", "stopwords", "benchmark",
      "domain_quota", "sample_k", "mix_weights", "mix_epochs_budget",
      "mix_epochs_max", "schedule", "shingle_n", "bloom_bits",
      "bloom_hashes", "seed", "target_shard_size", "split_test_pct")
    val unknown = root.keySet.diff(known)
    require(unknown.isEmpty, s"unknown pipeline config key(s): ${unknown.toList.sorted.mkString(", ")}")
    def str(k: String): Option[String] = root.get(k).map(_.toString)
    def lng(k: String, d: Long): Long = str(k).map(_.toLong).getOrElse(d)
    def int(k: String, d: Int): Int = str(k).map(_.toInt).getOrElse(d)
    Config(
      input = str("input").getOrElse(sys.error("pipeline config: 'input' is required")),
      output = str("output").getOrElse(sys.error("pipeline config: 'output' is required")),
      textField = str("text_field").getOrElse("text"),
      idField = str("id_field"),
      sourceField = str("source_field"),
      minWords = lng("min_words", 30L),
      maxWords = lng("max_words", 100000L),
      stopwords = root.get("stopwords")
        .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(_.toString))
        .getOrElse(Seq("the", "a", "and", "of", "to", "in", "is")),
      benchmark = str("benchmark"),
      domainQuota = str("domain_quota").map(_.toLong),
      sampleK = str("sample_k").map(_.toInt),
      mixWeights = root.get("mix_weights")
        .map(_.asInstanceOf[java.util.Map[String, Object]].asScala.toMap
          .map { case (k, v) => k -> v.toString.toLong })
        .getOrElse(Map.empty),
      mixEpochsBudget = str("mix_epochs_budget").map(_.toLong),
      mixEpochsMax = lng("mix_epochs_max", 3L),
      schedule = str("schedule").exists {
        // key-named parse error (r19 advice): a bare .toBoolean throws
        // "For input string: ..." with no hint WHICH key was malformed
        case s if s.equalsIgnoreCase("true") => true
        case s if s.equalsIgnoreCase("false") => false
        case s => sys.error(
          s"pipeline config: schedule must be true or false, got '$s'")
      },
      shingleN = int("shingle_n", 5),
      bloomBits = int("bloom_bits", 1 << 18),
      bloomHashes = int("bloom_hashes", 3),
      seed = str("seed").getOrElse("epoch1"),
      targetShardSize = lng("target_shard_size", 1L << 28),
      splitTestPct = str("split_test_pct").map(_.toInt))
  }

  /** Run the pipeline; returns the landed-shard manifest
    * (shard, n_docs, last_pos, n_chars) read back from the sink — the
    * same commit-point table [[EpochShuffle.writeShards]] attests. */
  def run(spark: SparkSession, cfg: Config): DataFrame = {
    val raw = spark.read.json(cfg.input)
    val withMeta = raw
      .withColumn("text", col(cfg.textField).cast("string"))
      .withColumn("source",
        cfg.sourceField.map(f => col(f).cast("string"))
          .getOrElse(lit("corpus")))
    // 1. curate: the Gopher rule inline in the corpus projection (one
    //    scan, no metric table joined back)
    val curated = withMeta.where(TextAnalysis.gopherKeep(col("text"),
      cfg.stopwords, cfg.minWords, cfg.maxWords))
    // 2. exact dedup: content-hash window, smallest id survives (the
    //    curate-chain convention). Ties — duplicate ids, or no id field
    //    (doc_id = md5(text), so every duplicate ties) — break on the
    //    md5 of the FULL row, so the surviving row's metadata (source,
    //    extra JSON fields riding into the shards) is deterministic
    //    across runs, not window-order luck.
    val withId = cfg.idField match {
      case Some(f) => curated.withColumn("doc_id", col(f).cast("string"))
      case None    => curated.withColumn("doc_id", md5(col("text")))
    }
    val rowKey = md5(to_json(struct(withId.columns.sorted.map(col): _*)))
    val deduped = withId
      .withColumn("__rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"), rowKey)))
      .where(col("__rn") === 1).drop("__rn")
    // 2a. optional per-source cap — the hot-domain-safe two-pass quota
    //     ([[Mixture.domainQuotaTwoPass]]): counts broadcast as hash
    //     thresholds, map-side filter, exact rank over survivors only
    val quotaed = cfg.domainQuota match {
      case None => deduped
      case Some(q) =>
        val keep = Mixture
          .domainQuotaTwoPass(deduped, col("doc_id"), col("source"), q)
          .select(col("id").as("doc_id"))
        deduped.join(keep, Seq("doc_id"))
    }
    // 3. optional decontamination against a benchmark blocklist: filter
    //    built from the benchmark's shingles, corpus probes it map-side
    val survivors = cfg.benchmark match {
      case None => quotaed
      case Some(benchPath) =>
        val bench = spark.read.json(benchPath)
          .withColumn("text", col(cfg.textField).cast("string"))
          .withColumn("doc_id", md5(col("text")))
        def sh(df: DataFrame): DataFrame = Dedup.shingles(
          df.withColumn("toks", tokenizeDefault(col("text"))),
          col("doc_id"), col("toks"), cfg.shingleN)
        // probe the POST-quota corpus: quota-dropped docs never shingle,
        // so the decontamination pass scales with what actually survives
        val keep = Dedup.decontaminateBloom(sh(quotaed), sh(bench),
            cfg.bloomBits, cfg.bloomHashes, minHits = 1L)
          .where(col("keep")).select(col("doc_id"))
        // inner join is safe: shingle-less docs get explicit keep rows
        quotaed.join(keep, Seq("doc_id"))
    }
    // 3a. optional corpus budget: keep k docs by the exponential-race
    //     weighted draw (weight = length) — deterministic and resumable,
    //     the pipe_weighted_sample op inline
    val budgeted = cfg.sampleK match {
      case None => survivors
      case Some(k) =>
        survivors
          .withColumn("__eq", floor(-log(
            (Hashing.h64(concat(lit("ws:"), col("doc_id"))) + 1)
              .cast("double") / lit(1.152921504606846976e18)) * 1e6)
            .cast("long"))
          .withColumn("__key", expr("__eq DIV greatest(length(text), 1)"))
          .orderBy(col("__key").asc, col("doc_id").asc).limit(k)
          .drop("__eq", "__key")
    }
    // 3b. optional mixture realization: each LISTED source cut exactly
    //     at its no-upsampling token allocation ([[Mixture
    //     .mixRealizeKept]] — the hash-order running-sum prefix the
    //     pipe_mix_realize gate pins); unlisted sources drop, because a
    //     mixture spec enumerates its corpus. Snapshot first: the kept
    //     set and the join both re-read the surviving corpus.
    val mixed = if (cfg.mixWeights.isEmpty) budgeted else {
      val snap = budgeted.localCheckpoint(eager = false)
      val wcol = typedLit(cfg.mixWeights)
      val listed = snap
        .withColumn("__w", element_at(wcol, col("source")))
        .where(col("__w").isNotNull)
      val kept = Mixture.mixRealizeKept(listed, col("doc_id"),
          col("source"), size(tokenizeDefault(col("text"))).cast("long"),
          col("__w"))
        .select(col("id").as("doc_id"))
      snap.join(kept, Seq("doc_id"))
    }
    // 4. optional leakage-safe holdout: side is a pure function of each
    //    document's NEAR-DUP CLUSTER id ([[Dedup.leakageSafeSplit]] over
    //    the gated MinHash-LSH pair tier), so no near-duplicate family
    //    can straddle train/test — the Lee et al. 2022 finding applied
    //    to the split itself. Each side lands under its own
    //    <output>/<side>/ tree with its own shard census and manifest
    //    commit point. Snapshotted first: the pair tier, the side join
    //    and both sinks all re-read the surviving corpus.
    // 5. shuffle + shard sink: auto-sized count from a one-scalar census,
    //    manifest written last as the commit point. With `schedule:
    //    true` the intra-shard order is the mixture's stride interleave
    //    (same membership, same manifest — [[EpochShuffle
    //    .writeShardsScheduled]]), weighted by the mix spec.
    val weightOf = element_at(typedLit(cfg.mixWeights), col("source"))
    def sink(df: DataFrame, outDir: String): DataFrame = {
      val total = df.agg(sum(length(col("text")).cast("long")))
        .first() match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0)
        }
      val numShards = EpochShuffle.shardCount(total, cfg.targetShardSize)
      if (cfg.schedule)
        EpochShuffle.writeShardsScheduled(df, col("doc_id"), col("source"),
          weightOf, length(col("text")), cfg.seed, numShards, outDir)
      else
        EpochShuffle.writeShards(df, col("doc_id"),
          length(col("text")), cfg.seed, numShards, outDir)
    }
    // 3c. optional MULTI-EPOCH realization: past the no-upsampling
    //     point, the listed sources' water-filled allocations become
    //     ⌊epochs⌋ full passes + a fractional prefix cut
    //     ([[Mixture.mixEpochsKept]] — the pipe_mix_epochs_realize
    //     relation), and the sink writes per-epoch shard trees
    //     ([[EpochShuffle.writeEpochShards]]) so each pass lands in its
    //     own shard order under ONE manifest commit point. Mutually
    //     exclusive with the holdout: cut test data BEFORE upsampling
    //     (an upsampled doc leaking into test defeats the split), so a
    //     split pipeline runs first and this one consumes its train
    //     side.
    require(cfg.mixEpochsBudget.isEmpty || cfg.mixWeights.nonEmpty,
      "pipeline config: mix_epochs_budget needs mix_weights (the " +
        "per-source weight spec the budget is allocated over)")
    require(cfg.mixEpochsBudget.isEmpty || cfg.splitTestPct.isEmpty,
      "pipeline config: mix_epochs_budget and split_test_pct are " +
        "mutually exclusive — cut the holdout BEFORE upsampling (run a " +
        "split pipeline first, then a mix-epochs pipeline on its train " +
        "side)")
    require(!cfg.schedule || cfg.mixWeights.nonEmpty,
      "pipeline config: schedule needs mix_weights — the stride-ordered " +
        "shard layout interleaves sources at the mixture's weighted " +
        "rates, so there is no schedule without a weight spec")
    cfg.mixEpochsBudget match { case Some(budgetNum) =>
      val snap = budgeted.localCheckpoint(eager = false)
      val listed = snap
        .withColumn("__w", element_at(typedLit(cfg.mixWeights), col("source")))
        .where(col("__w").isNotNull)
      val kept = Mixture.mixEpochsKept(listed, col("doc_id"),
          col("source"), size(tokenizeDefault(col("text"))).cast("long"),
          col("__w"), budgetNum, cfg.mixEpochsMax)
        .select(col("id").as("doc_id"), col("epoch"))
      // snapshot: the census and the write both consume the expanded
      // relation (the module's two-consumers rule — without it the
      // whole kept-join plan runs twice, review r18)
      val expanded = snap.join(kept, Seq("doc_id")).drop("__w")
        .localCheckpoint(eager = false)
      // ONE census pass yields both sizing inputs: shard count from the
      // LARGEST single epoch's char mass (every epoch is a full
      // training pass, so the per-shard sort bound must hold per
      // epoch), epoch count for the write's task fan-out
      val perEpoch = expanded
        .groupBy(col("epoch"))
        .agg(sum(length(col("text")).cast("long")).as("m"))
        .collect().map(_.getLong(1))
      val maxEpochMass = if (perEpoch.isEmpty) 0L else perEpoch.max
      val numShards =
        EpochShuffle.shardCount(maxEpochMass, cfg.targetShardSize)
      val numEpochs = math.max(1L, perEpoch.length.toLong)
      if (cfg.schedule)
        EpochShuffle.writeEpochShardsScheduled(expanded, col("doc_id"),
          col("epoch"), col("source"), weightOf, length(col("text")),
          cfg.seed, numShards, numEpochs, cfg.output)
      else
        EpochShuffle.writeEpochShards(expanded, col("doc_id"),
          col("epoch"), length(col("text")), cfg.seed, numShards,
          numEpochs, cfg.output)
    case None =>
    cfg.splitTestPct match {
      case None => sink(mixed, cfg.output)
      case Some(pct) =>
        val snap = mixed.localCheckpoint(eager = false)
        val pairs = Dedup.minhashLsh(Dedup.shingles(
          snap.withColumn("toks", tokenizeDefault(col("text"))),
          col("doc_id"), col("toks"), cfg.shingleN))
        val sides = Dedup.leakageSafeSplit(
          snap.select(col("doc_id")), pairs, pct)
          .select(col("doc_id"), col("side"))
        val sided = snap.join(sides, Seq("doc_id"))
        Seq("train", "test").map { side =>
          sink(sided.where(col("side") === side).drop("side"),
            s"${cfg.output}/$side")
            .withColumn("side", lit(side))
        }.reduce(_ unionByName _)
    }
    }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Catalog, Indexer, Searcher}
import graft.queries.RelationalQueries

/** Physical-plan shape assertions — the "is this the plan you'd want at
  * 100 TB" checks: filters and projections must reach the Parquet scan,
  * small dims must broadcast, top-K must never global-sort, and the
  * search path must push typed predicates into the scan of the splits.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def executedPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q_scan_filter pushes predicates and prunes columns at the scan") {
    val plan = formatted(RelationalQueries.q_scan_filter(spark, sf))
    assert(plan.contains("PushedFilters:") &&
      (plan.contains("GreaterThanOrEqual(l_shipdate") || plan.contains("LessThan(l_quantity")),
      s"expected shipdate/quantity filters pushed to parquet:\n$plan")
    val readSchema = plan.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_partkey"),
      s"column pruning failed: $readSchema")
  }

  test("q_join_broadcast uses broadcast hash joins, no shuffle of the fact side") {
    val plan = formatted(RelationalQueries.q_join_broadcast(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"dims must not sort-merge:\n$plan")
  }

  test("q_topk is TakeOrderedAndProject (no global sort)") {
    val plan = formatted(RelationalQueries.q_topk(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("search compiles typed predicates that reach the split scan") {
    val root = Files.createTempDirectory("graft-plan").toString
    val cat = new Catalog(root)
    cat.create(new String(Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/example_config.yaml")), "UTF-8"))
    new Indexer(spark, cat).indexFile("test",
      "/root/reference/tests/test_files/hdfs-logs-multitenants-2.json")
    val df = new Searcher(spark, cat).searchDf("test", "tenant_id:>50", 10)
    val plan = formatted(df)
    // the tenant_id > 50 comparison must appear as a pushed parquet filter
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(tenant_id,50"),
      s"typed range must push down to the split scan:\n$plan")
    cat.drop("test")
  }

  test("q_range_join is a bucketized equi-join, never a nested-loop scan") {
    val plan = formatted(RelationalQueries.q_range_join(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must equi-join on (user, bucket), not quadratic-scan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"expected a hash/merge equi-join:\n$plan")
  }

  test("q_asof_join is one shuffle on user_id, no join operator at all") {
    val plan = formatted(RelationalQueries.q_asof_join(spark, sf))
    assert(!plan.contains("Join"), s"as-of should be window-based, not a join:\n$plan")
    assert(plan.contains("Window"), plan)
  }

  test("knn_ivf broadcasts the centroid table") {
    val plan = formatted(graft.queries.PipelineQueries.knn_ivf(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"centroids must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no un-broadcast cartesian anywhere:\n$plan")
  }

  test("knn_mips_ivf: map-only augmented assignment, broadcast probes, " +
      "ONE corpus exchange (the rank window) — never cartesian") {
    val plan = formatted(graft.queries.PipelineQueries.knn_mips_ivf(spark, sf))
    // probes (Q x nProbe rows) broadcast into the candidate join; the
    // centroid table is folded into map-side expressions (collected
    // model constants), so there is NO join against it at all
    assert(plan.contains("BroadcastHashJoin"),
      s"probes must broadcast onto the assigned corpus:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"assignment must be the map-only struct-array argmin, not a join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
    // corpus-side cost is ONE hash exchange: the final per-query rank
    // window (the query's display orderBy adds a rangepartitioning on
    // top — not an operator cost)
    val hashEx = plan.linesIterator
      .count(_.contains("Arguments: hashpartitioning"))
    assert(hashEx == 1,
      s"expected exactly the rank-window hash exchange, got $hashEx:\n$plan")
    // and the rank cut is the pushed-down group-limit, not a full sort
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("knn_lsh joins the tiny query side by broadcast, no cartesian") {
    val plan = formatted(graft.queries.PipelineQueries.knn_lsh(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket joins against 20 queries must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no un-broadcast cartesian anywhere:\n$plan")
  }

  test("ingest plan is shuffle-free (narrow text -> parse -> columns)") {
    val cfgYaml = new String(Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/example_config.yaml")), "UTF-8")
    val cfg = graft.config.IndexConfig.fromYaml(cfgYaml)
    val d = new graft.config.SchemaDerivation(cfg)
    import org.apache.spark.sql.functions._
    val lines = spark.read.text(
      "/root/reference/tests/test_files/hdfs-logs-multitenants-2.json")
    val typed = d.ingest(lines, col("value"))
    val plan = executedPlan(typed)
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, s"ingest must not shuffle:\n$plan")
  }

  test("simhash and LSH signature stages are map-only (no shuffle)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the whole point of the tight-loop signature expressions: at 100 TB
    // the signature pass must be embarrassingly parallel projection work,
    // never a corpus-wide shuffle
    val toks = Graft.table(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val simSig = toks.where(size(col("toks")) > 0)
      .select(col("doc_id"), graft.exprs.SigExprs.simhash_sig(col("toks")))
    val vecs = Graft.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").as("v"))
    val lshSig = vecs.select(col("vec_id"),
      graft.exprs.SigExprs.lsh_sigs(col("v"), planes = 16, tables = 2, dim = 64))
    for ((name, df) <- Seq("simhash_sig" -> simSig, "lsh_sigs" -> lshSig)) {
      val shuffles = executedPlan(df).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty, s"$name signature stage must not shuffle")
    }
  }

  test("pipe_pack_sequences windows per source shard, never one partition") {
    val plan = formatted(graft.queries.PipelineQueries.pipe_pack_sequences(spark, sf))
    // a Window with an empty partition spec would collapse to a single
    // partition (the 100 TB anti-pattern); ours must key by source
    assert(plan.contains("Window"), plan)
    val winLine = plan.linesIterator.filter(_.contains("windowspecdefinition")).mkString
    assert(winLine.contains("source"),
      s"window must partition by source:\n$winLine")
  }

  test("epoch shuffle windows per shard, never one partition") {
    import org.apache.spark.sql.functions._
    // per-shard independence is the whole scale story: the position window
    // must partition by shard (an empty spec = one-task global sort), and
    // the only shuffle is the hash partition on the shard key
    val df = graft.ops.EpochShuffle.epochShuffle(
      Graft.table(spark, sf, "documents"), col("doc_id"), "epoch1", numShards = 8L)
    val plan = formatted(df)
    val winLine = plan.linesIterator.filter(_.contains("windowspecdefinition")).mkString
    assert(winLine.contains("shard"), s"window must partition by shard:\n$winLine")
    // count detail headers "(n) Exchange" — one per physical node
    assert(plan.linesIterator.count(_.matches("\\(\\d+\\) Exchange.*")) == 1,
      s"one shard-key shuffle expected:\n$plan")
    val exchLine = plan.linesIterator.filter(_.contains("hashpartitioning")).mkString
    assert(exchLine.contains("shard"),
      s"the one shuffle must hash on shard:\n$plan")
  }

  test("pipe_decontaminate broadcasts the benchmark side") {
    val plan = formatted(graft.queries.PipelineQueries.pipe_decontaminate(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"the tiny benchmark set must broadcast, not shuffle the corpus:\n$plan")
  }

  test("pipe_semantic_decontaminate: broadcast nested-loop on the benchmark, no corpus shuffle before scoring") {
    val plan = formatted(
      graft.queries.PipelineQueries.pipe_semantic_decontaminate(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the benchmark embeddings must broadcast for the cosine scan:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"a shuffled cartesian over the corpus is a 100 TB killer:\n$plan")
  }

  test("epoch-TAGGED shuffle windows per (epoch, shard), never one partition") {
    import org.apache.spark.sql.functions._
    // the multi-epoch sink's assignment: the position window must key
    // (epoch, shard) — per-epoch-dense positions with the same one-
    // exchange scale shape as the single-epoch shuffle
    val docs = Graft.table(spark, sf, "documents")
      .withColumn("epoch", pmod(col("doc_id"), lit(2)))
    val df = graft.ops.EpochShuffle.epochShuffleTagged(
      docs, col("doc_id"), col("epoch"), "mixep", numShards = 8L)
    val plan = formatted(df)
    val winLine = plan.linesIterator.filter(_.contains("windowspecdefinition")).mkString
    assert(winLine.contains("shard") && winLine.contains("epoch"),
      s"window must partition by (epoch, shard):\n$winLine")
    assert(plan.linesIterator.count(_.matches("\\(\\d+\\) Exchange.*")) == 1,
      s"one (epoch, shard)-key shuffle expected:\n$plan")
  }

  test("scheduled shard assignment: ONE corpus exchange on (epoch, shard), " +
      "both rank windows ride it, the weight table broadcasts") {
    import org.apache.spark.sql.functions._
    val docs = Graft.table(spark, sf, "documents")
      .withColumn("epoch", pmod(col("doc_id"), lit(2)))
    val df = graft.ops.EpochShuffle.epochShuffleScheduled(
      docs, col("doc_id"), col("epoch"), col("source"),
      pmod(substring(col("source"), 4, 10).cast("long"), lit(3)) + 1,
      "mixep", numShards = 8L)
    val plan = formatted(df)
    // the per-source weight table broadcasts onto the corpus
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"the tiny weight table must broadcast, not shuffle the corpus:\n$plan")
    // corpus-side cost is ONE exchange — the (epoch, shard)
    // repartition; both rank windows' distributions are satisfied by
    // it ((epoch, shard, source) clusters REFINE (epoch, shard)), so
    // they pay partition-local sorts only. The other three exchanges
    // sit on the weight-table branch (partial+final grouping agg, the
    // contract window, the wsum window), all over the per-source
    // aggregate — tiny at any corpus scale.
    val exchanges = plan.linesIterator
      .count(_.matches("\\(\\d+\\) Exchange.*"))
    assert(exchanges == 4,
      s"expected 1 corpus + 3 weight-branch exchanges, got $exchanges:\n$plan")
    // exactly ONE exchange partitions on the shard key — the corpus
    // one; and it hash-clusters (epoch, shard), never range/single
    val shardParts = plan.linesIterator.filter(l =>
      l.contains("Arguments: hashpartitioning") && l.contains("shard"))
      .toList
    assert(shardParts.length == 1 &&
      shardParts.head.contains("epoch"),
      s"one (epoch, shard) hash exchange expected:\n$shardParts\n$plan")
    // no single-partition window over the corpus: every row_number
    // window partitions by (epoch, shard[, source])
    val rnWins = plan.linesIterator.filter(l =>
      l.contains("windowspecdefinition") && l.contains("row_number"))
      .toList
    assert(rnWins.nonEmpty, plan)
    rnWins.foreach { l =>
      assert(l.contains("shard") && l.contains("epoch"),
        s"rank window must partition by (epoch, shard[, source]):\n$l")
    }
  }

  test("pipe_mix_epochs_realize and pipe_mix_schedule broadcast their tiny relations — the corpus never sort-merges") {
    for ((name, df) <- Seq(
      "pipe_mix_epochs_realize" ->
        graft.queries.PipelineQueries.pipe_mix_epochs_realize(spark, sf),
      "pipe_mix_schedule" ->
        graft.queries.PipelineQueries.pipe_mix_schedule(spark, sf))) {
      val plan = formatted(df)
      // the (source, epoch) expansion / per-source weight table are
      // sources×maxEpochs-sized — they must broadcast onto the corpus,
      // never shuffle it into a sort-merge join
      assert(plan.contains("BroadcastHashJoin"), s"$name:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$name: tiny relations must broadcast:\n$plan")
    }
  }

  test("pipe_contamination_report: the semi-join dedups the corpus grams — no explicit distinct aggregate") {
    val plan = formatted(
      graft.queries.PipelineQueries.pipe_contamination_report(spark, sf))
    // the left-semi probe already dedups its right side, so a
    // `.distinct()` on the corpus gram stream would pay the gram-keyed
    // exchange TWICE for nothing (r17 verdict #4): the only aggregates
    // allowed key bench_id (n_hit / n_grams), never the bare gram
    val gramAgg = plan.linesIterator.filter(_.contains("Keys [1]: [sh"))
    assert(gramAgg.isEmpty,
      s"no gram-keyed distinct aggregate expected under the semi-join:\n$plan")
    assert(plan.contains("LeftSemi"), s"probe must stay a left-semi:\n$plan")
  }

  test("pipe_temperature_sample broadcasts the per-source rate table") {
    val plan = formatted(
      graft.queries.PipelineQueries.pipe_temperature_sample(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"the tiny rates table must broadcast onto the corpus, not shuffle it:\n$plan")
  }

  test("pipe_quality_logreg is one map-only projection before its output sort") {
    val plan = formatted(
      graft.queries.PipelineQueries.pipe_quality_logreg(spark, sf))
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      s"the linear scorer must not join or aggregate:\n$plan")
    // exactly one exchange: the deterministic output orderBy
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, // range-partition sample + exchange in formatted output
      s"scoring must add no shuffle beyond the output sort:\n$plan")
  }

  test("pipe_kmeans_step: MAP-ONLY assignment (no join), update shuffle is (cell,dim)") {
    val plan = formatted(graft.queries.PipelineQueries.pipe_kmeans_step(spark, sf))
    // the corpus-side argmax rides a broadcast-fed tight-loop expression
    // (graft.exprs.NearestCells) — the crossJoin+window form shuffled
    // n×k rows per round, the r12 verdict's scale-killer; the only join
    // allowed here would be the probe side, and kmeans has none
    assert(!plan.contains("Join"),
      s"centroid assignment must be a map-only expression, not a join:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("nearest_cells"),
      s"assignment must ride the broadcast-fed nearest_cells expression:\n$plan")
  }

  test("knn_pq broadcasts the query LUTs; the corpus side carries codes only") {
    val plan = formatted(graft.queries.PipelineQueries.knn_pq(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("knn_sq8 joins the tiny quantized query side by broadcast") {
    val plan = formatted(graft.queries.PipelineQueries.knn_sq8(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("knn_sq8_ivf broadcasts centroids and never goes cartesian") {
    val plan = formatted(graft.queries.PipelineQueries.knn_sq8_ivf(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"centroid assignment must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    // the candidate join itself must be an EQUI-join keyed on the probed
    // cell: formatted-mode details list the join keys on "Left keys"/
    // "Right keys" lines — assert there, not on the whole plan text
    // (projection aliases would make that check vacuous)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"expected an equi-join:\n$plan")
    val keyLines = plan.linesIterator.filter(_.matches(".*(Left|Right) keys.*"))
    assert(keyLines.exists(_.matches(".*\\bcell#\\d+.*")),
      s"candidate join must key on cell:\n$plan")
  }

  test("knn_ivf_pq broadcasts centroids, keys candidates on cell, no cartesian") {
    val plan = formatted(graft.queries.PipelineQueries.knn_ivf_pq(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"centroid assignment must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    // the ADC candidate join must be the cell-keyed equi-join (the
    // sublinear cut), not a full scan per query like knn_pq's labeled
    // baseline
    val keyLines = plan.linesIterator.filter(_.matches(".*(Left|Right) keys.*"))
    assert(keyLines.exists(_.matches(".*\\bcell#\\d+.*")),
      s"candidate join must key on cell:\n$plan")
  }

  test("pipe_dedup_incremental keys on shingles/ids, never cartesian") {
    val plan = formatted(
      graft.queries.PipelineQueries.pipe_dedup_incremental(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    val keyLines = plan.linesIterator.filter(_.matches(".*(Left|Right) keys.*")).toList
    // exact attribute match (sh#NNN) — a bare "sh" substring would also
    // hit "shingles"/"hash" and pin nothing
    assert(keyLines.exists(_.matches(".*\\bsh#\\d+.*")),
      s"candidate join must key on sh:\n$plan")
  }

  test("pipe_dsir_select broadcasts the bucket LLR table, no cartesian") {
    val plan = formatted(
      graft.queries.PipelineQueries.pipe_dsir_select(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    // the ≤256-row lr table joins the exploded feature stream broadcast —
    // a shuffle of the feature stream on bucket would be the scale killer
    assert(plan.contains("BroadcastHashJoin"),
      s"lr table must broadcast-join the feature stream:\n$plan")
    // the global top-100 cut is a TakeOrdered, never a full sort
    assert(plan.contains("TakeOrderedAndProject"),
      s"selection cut must be TakeOrdered:\n$plan")
  }

  test("sketch queries: no cartesian, sketch aggregates partial-combined, TakeOrdered cuts") {
    val hll = formatted(graft.queries.SketchQueries.sketch_hll(spark, sf))
    assert(!hll.contains("CartesianProduct") &&
      !hll.contains("BroadcastNestedLoop"), hll)
    // register build must map-side combine: partial_max before the
    // (grp, bucket) exchange, or the shuffle carries raw rows
    assert(hll.contains("partial_max"),
      s"registers must partial-aggregate map-side:\n$hll")
    val cms = formatted(graft.queries.SketchQueries.sketch_cms_topk(spark, sf))
    assert(!cms.contains("CartesianProduct") &&
      !cms.contains("BroadcastNestedLoop"), cms)
    // top-20 true keys: TakeOrdered, never a full sort of the tf table
    assert(cms.contains("TakeOrderedAndProject"),
      s"top-k cut must be TakeOrdered:\n$cms")
  }

  test("pipe_domain_quota_2pass broadcasts thresholds; the window sees only survivors") {
    val plan = formatted(
      graft.queries.PipelineQueries.pipe_domain_quota_2pass(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    // the per-domain threshold table joins broadcast (pass 2 is map-side)
    assert(plan.contains("BroadcastHashJoin"),
      s"threshold table must broadcast:\n$plan")
    // the h < thr filter sits BELOW the window sort in the plan: the
    // window's child subtree must contain the threshold comparison
    val winIdx = plan.indexOf("Window")
    val filtIdx = plan.indexOf("thr")
    assert(winIdx >= 0 && filtIdx >= 0,
      s"expected a window over threshold survivors:\n$plan")
  }

  test("dedup_semantic pairs within cells only, no cartesian") {
    val plan = formatted(
      graft.queries.PipelineQueries.dedup_semantic(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    // the final plan reads the checkpointed pair table, so pin the pair
    // GENERATION keys on the shared builder's own plan: it must key on
    // the cell label (the IVF candidate bound), never corpus x corpus
    val pairPlan = formatted(graft.ops.Dedup.embeddingCosine(
      graft.Graft.table(spark, sf, "embeddings"),
      org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.col("embedding"),
      org.apache.spark.sql.functions.col("label"), threshold = 0.4))
    assert(!pairPlan.contains("CartesianProduct") &&
      !pairPlan.contains("BroadcastNestedLoop"), pairPlan)
    val keyLines = pairPlan.linesIterator
      .filter(_.matches(".*(Left|Right) keys.*")).toList
    assert(keyLines.exists(_.matches(".*\\blabel#\\d+.*")),
      s"candidate join must key on the cell label:\n$pairPlan")
    // hot-cell guard (r8): the pair join must ALSO key on the salt, and
    // the per-cell census (k rows for a k-cell clustering) must attach
    // via broadcast — a corpus shuffle for a k-row table would be wrong
    assert(keyLines.exists(_.matches(".*\\bsalt#\\d+.*")),
      s"candidate join must key on the hot-cell salt:\n$pairPlan")
    assert(pairPlan.contains("BroadcastHashJoin"),
      s"cell census must broadcast-join, never shuffle the corpus:\n$pairPlan")
  }

  test("pipe_hard_negatives_bounded: prefix-keyed lexical arm, cell-keyed semantic arm") {
    val plan = formatted(
      graft.queries.PipelineQueries.all("pipe_hard_negatives_bounded")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    // the only nested-loops allowed are assignments against the <=16-row
    // (broadcast) centroid tables — 3 training rounds + corpus assign +
    // query probes; the lexical arm and the anti-join must all be keyed
    val bnlj = "\\(\\d+\\) BroadcastNestedLoopJoin".r
      .findAllIn(plan).toSet.size
    assert(bnlj <= 6,
      s"only centroid assignments may nested-loop (got $bnlj):\n$plan")
    // the final plan reads the checkpointed pair table, so pin the pair
    // GENERATION keys on the shared builder's own plan: the AllPairs
    // candidate join must key on the shingle, never doc x doc
    import org.apache.spark.sql.functions.col
    val pairPlan = formatted(graft.ops.Dedup.ngramJaccardPrefix(
      graft.ops.Dedup.shingles(
        graft.Graft.table(spark, sf, "documents")
          .select(col("doc_id"),
            graft.functions.TextFunctions.tokenize(col("text"), "default").as("toks")),
        col("doc_id"), col("toks"), 3),
      threshold = 0.5))
    assert(!pairPlan.contains("CartesianProduct") &&
      !pairPlan.contains("BroadcastNestedLoop"), pairPlan)
    val keyLines = pairPlan.linesIterator
      .filter(_.matches(".*(Left|Right) keys.*")).toList
    assert(keyLines.exists(_.matches(".*\\bsh#\\d+.*")),
      s"lexical candidate join must key on the shingle:\n$pairPlan")
    // the semantic anti-join is keyed on (qid, cand)
    assert(plan.contains("LeftAnti"), s"negatives must anti-join:\n$plan")
  }

  test("pipe_lm_perplexity: gram-keyed model join, scalar vocab attach only") {
    val plan = formatted(
      graft.queries.PipelineQueries.pipe_lm_perplexity(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    // the ONE nested-loop join allowed is the 1-row vocab-size attach;
    // the bigram/context model tables must join keyed, never nested-loop
    // formatted explain prints each node in the tree AND the detail
    // section — count distinct node ids, not lines
    val bnlj = "\\(\\d+\\) BroadcastNestedLoopJoin".r
      .findAllIn(plan).toSet.size
    assert(bnlj <= 1, s"only the scalar vocab attach may nested-loop:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"model tables must join on the gram key:\n$plan")
  }

  test("pipe_bpe_step: vocabulary-sized pair stage, top-k never full-sorts") {
    val plan = formatted(
      graft.queries.PipelineQueries.pipe_bpe_step(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must be TakeOrdered, not sort+limit:\n$plan")
    // both counting stages must partial-aggregate (map-side combine):
    // corpus->word-freq and word->pair-count each show partial_count/sum
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      s"word-frequency stage must combine map-side:\n$plan")
  }

  test("pipe_domain_quota is ONE domain-keyed exchange feeding the window") {
    val plan = formatted(
      graft.queries.PipelineQueries.all("pipe_domain_quota")(spark, sf))
    // one hash exchange on the domain key (the final orderBy's range
    // exchange is presentation, not the op); no global (empty-key) window
    val exchanges = plan.linesIterator.count(_.contains("hashpartitioning("))
    assert(exchanges == 1, s"expected exactly one hash exchange:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"no single-partition stage in a domain-keyed cap:\n$plan")
  }

  test("text_span_scrub joins dup-starts by doc_id, never cartesian") {
    val plan = formatted(
      graft.queries.PipelineQueries.all("text_span_scrub")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"span scrub must stay keyed:\n$plan")
  }

  test("pipe_bloom_decontaminate probes a BROADCAST word table, no sort-merge") {
    val plan = formatted(
      graft.queries.PipelineQueries.all("pipe_bloom_decontaminate")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"the m/32-row filter table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus probes must not sort-merge against the filter:\n$plan")
  }

  test("pipe_hybrid_rrf cuts BM25 with TakeOrdered; fusion never sees the corpus") {
    val plan = formatted(
      graft.queries.PipelineQueries.all("pipe_hybrid_rrf")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"the BM25 arm's top-k must be TakeOrdered, not a global sort:\n$plan")
  }

  test("every registered query plans without an UNDECLARED cartesian") {
    // The blanket scale audit: a CartesianProduct or nested-loop join
    // appearing in ANY query's plan is a 100 TB killer unless it is one
    // of the DECLARED exceptions below — each a deliberate, documented
    // shape whose build side is bounded (a labeled brute-force baseline,
    // a broadcast centroid table, a 1-row scalar). A new query that
    // trips this must either fix its join keys or justify itself here.
    val declared: Map[String, String] = Map(
      "knn_brute" -> "labeled exact O(Q*N) baseline (Ann.scaladoc)",
      "knn_mips" -> "labeled exact O(Q*N) MIPS baseline (Ann.mipsBrute scaladoc)",
      "knn_mips_recall" -> "composes knn_mips as its ground truth",
      "knn_recall" -> "composes knn_brute as its ground truth",
      "knn_recall_scaled" -> "composes knn_brute truth + sqrt(n) centroid assignment",
      "knn_serving_recall" -> "composes knn_brute truth + query-side probe assignment (corpus layout is the map-only nearest_cells expression)",
      "knn_serving_recall_sq8" -> "same harness as knn_serving_recall with the asymmetric sq8 integer-dot shortlist in place of ADC",
      "knn_serving_recall_filtered" -> "the sq8 serving harness with a label pre-filter; truth arm is a filtered knn_brute",
      "knn_serving_recall_sq8_norms" -> "the sq8 serving harness on the 10x norm-spread fixture with the normalized (reconstructed-cosine) shortlist key; same knn_brute truth + ab 1-row scalar attach",
      "knn_refresh_drift" -> "frozen-vs-retrained lifecycle gate: knn_brute truth over the A+B union with a 20-query broadcast side (same declared shape as every serving-recall row)",
      "pipe_ann_drift" -> "two 1-row drift-statistic scalars (assignFit x assignSkew) cross-joined per cohort — bounded at 1x1",
      "pipe_kmeans_step" -> "corpus x k broadcast centroid assignment",
      "knn_cell" -> "centroid assignment, k-bounded broadcast side",
      "knn_ivf" -> "centroid assignment + nprobe cut, broadcast side",
      "knn_ivf_trained" -> "centroid assignment + nprobe cut over trained centroids",
      "pipe_cluster_balance" -> "centroid assignment over trained centroids (quota cut is cell-keyed)",
      "knn_ivfpq_trained" -> "centroid assignment + ADC ranking over trained centroids",
      "knn_sq8" -> "broadcast query side over int8 codes",
      "knn_sq8_ivf" -> "centroid assignment + int8 ranking",
      "knn_pq" -> "broadcast ADC lookup tables over PQ codes",
      "knn_ivf_pq" -> "centroid assignment + ADC ranking",
      "knn_lsh" -> "hyperplane constants, broadcast query side",
      "pipe_lm_perplexity" -> "1-row vocabulary-size scalar attach",
      "pipe_lm_kneser_ney" -> "two 1-row scalar attaches (bigram-type count + vocabulary size)",
      "pipe_moore_lewis" -> "1-row vocabulary-size scalar attaches (both bigramNll chains)",
      "pipe_min_k_prob" -> "1-row vocabulary-size scalar attach (bigramNll arithmetic)",
      "pipe_curate_v5" -> "1-row vocabulary-size scalar attaches (the Moore-Lewis stage's two LM chains)",
      "pipe_lm_terciles" -> "1-row vocabulary-size scalar attach (same bigramNll chain)",
      "pipe_lm_trigram" -> "1-row N/V scalar attach (trigramNll chain)",
      "pipe_curate_v2" -> "1-row vocabulary-size scalar attach (bigramNll stage)",
      "pipe_dsir_select" -> "1-row target-total scalar attach",
      "dedup_lsh_recall" -> "three 1-row count scalars cross-joined into the report row",
      "dedup_simhash_recall" -> "three 1-row count scalars cross-joined into the report row",
      "dedup_semantic_recall" -> "brute-force truth tier (declared O(n^2) diagnostic) + 1-row scalars",
      "text_tfidf_top" -> "1-row corpus-size scalar attach (idf denominator)",
      "pipe_hybrid_rrf" -> "semantic arm = Ann.brute with a 1-query broadcast side",
      "pipe_hard_negatives" -> "semantic truth arm = Ann.brute (20-query broadcast side; declared diagnostic tier — pipe_hard_negatives_bounded is the production form)",
      "pipe_hard_negatives_bounded" -> "centroid assignment over trained centroids (lexical arm is prefix-filtered, sh-keyed — see dedicated shape test)",
      "pipe_semantic_decontaminate" -> "broadcast benchmark side (eval-suite bounded, thousands of rows vs the corpus), map-only corpus scoring — see dedicated shape test",
      "sketch_kmv_setops" -> "three 1-row scalar attaches (union estimate, kept count, match count) cross-joined into the intersection report row; sketches themselves are <= groups x 256 rows"
    )
    val sfDir = "/root/testdata/sf0.001"
    // planning failure is tracked SEPARATELY from the cartesian flag: a
    // declared-exception query that stops planning at all must still fail
    // this audit (the exception list only excuses the join shape)
    var failed = List.empty[String]
    val bad = SparkEntry.queries.toList.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = formatted(fn(spark, sfDir))
          val cartesian = plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin")
          if (cartesian && !declared.contains(name)) Some(name) else None
        } catch {
          case e: Throwable => failed ::= s"$name: $e"; None
        }
    }
    assert(failed.isEmpty, s"queries failed to plan: $failed")
    assert(bad.isEmpty, s"undeclared cartesian/nested-loop in: $bad")
  }

  test("pipe_mix_weights scans the corpus once (units branch reuses the agg exchange)") {
    val df = graft.queries.PipelineQueries.pipe_mix_weights(spark, sf)
    df.collect() // materialize so AQE settles the final plan
    // AQE plan strings print Final AND Initial sections; count only Final
    val plan = executedPlan(df).toString.split("== Initial Plan ==").head
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    // a stray ReusedSubquery must not mask a second independent scan
    val reused = plan.contains("ReusedExchange")
    assert(scans <= 1 || (scans == 2 && reused),
      s"corpus must be scanned once ($scans scans, reused=$reused):\n$plan")
  }

  test("pipe_curate is one corpus scan: inline quality filter, window dedup, agg") {
    val df = graft.queries.PipelineQueries.pipe_curate(spark, sf)
    df.collect()
    val plan = executedPlan(df).toString.split("== Initial Plan ==").head
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"curation must scan the corpus once ($scans scans):\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"no product joins in the curation pass:\n$plan")
  }

  test("text_line_dedup_apply snapshots the line table: at most one corpus scan") {
    val df = graft.queries.PipelineQueries.text_line_dedup_apply(spark, sf)
    df.collect()
    val plan = executedPlan(df).toString.split("== Initial Plan ==").head
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans <= 1,
      s"owner/firstPos must consume the snapshot, not re-scan ($scans scans):\n$plan")
  }

  test("text_boilerplate_ngrams reads the shingle snapshot plus one source scan") {
    val df = graft.queries.PipelineQueries.text_boilerplate_ngrams(spark, sf)
    df.collect()
    val plan = executedPlan(df).toString.split("== Initial Plan ==").head
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans <= 1,
      s"shingles must come from the snapshot, only (doc_id, source) scans ($scans):\n$plan")
  }

  test("text_vocab_growth reads only the token snapshot: no corpus re-scan") {
    val df = graft.queries.PipelineQueries.text_vocab_growth(spark, sf)
    df.collect()
    val plan = executedPlan(df).toString.split("== Initial Plan ==").head
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 0,
      s"both branches must consume the memoized snapshot ($scans scans):\n$plan")
  }

  test("batch ingest is ONE job; observed stats equal the read-back scan") {
    val root = Files.createTempDirectory("graft-onejob").toString
    val cat = new Catalog(root)
    cat.create(
      """version: 1
        |name: onejob
        |path: /tmp/unused
        |schema:
        |  time_field: ts
        |  fields:
        |    - name: ts
        |      type: !datetime
        |        formats: [rfc3339]
        |    - name: n
        |      type: !number
        |        type: i64
        |    - name: sev
        |      type: !text
        |        indexed:
        |          tokenizer: raw
        |    - name: msg
        |      type: !text
        |""".stripMargin)
    val doc = Files.createTempFile("onejob", ".jsonl")
    Files.write(doc, (1 to 50).map(i =>
      s"""{"ts": "2024-01-${"%02d".format(i % 28 + 1)}T00:00:00Z", "n": $i, "sev": "INFO", "msg": "event number $i"}""")
      .mkString("\n").getBytes("UTF-8"))

    // stats ride the write as observed metrics: the whole ingest (write +
    // count + zone maps + dicts + term digests) is exactly one Spark job
    val sc = spark.sparkContext
    sc.setJobGroup("onejob-ingest", "ingest", interruptOnCancel = false)
    val committed =
      try new Indexer(spark, cat).indexFile("onejob", doc.toString).get
      finally sc.clearJobGroup()
    val jobs = sc.statusTracker.getJobIdsForGroup("onejob-ingest")
    assert(jobs.length == 1, s"batch ingest must be one job, ran ${jobs.length}")

    // the fallback read-back scan reproduces the manifest entry EXACTLY
    // (same aggregate list, same digest sidecar bytes -> same md5)
    val d = new graft.config.SchemaDerivation(cat.load("onejob"))
    val rescan = Indexer.splitStats(spark, d,
      cat.splitDir("onejob", committed.id), committed.id)
    assert(rescan == committed,
      s"observe-pass and scan-pass stats must agree:\n  $committed\n  $rescan")
    assert(committed.numDocs == 50 && committed.minTs.isDefined &&
      committed.numStats.contains("n") && committed.dicts.contains("sev") &&
      committed.digest.isDefined)
    cat.drop("onejob")
  }
}

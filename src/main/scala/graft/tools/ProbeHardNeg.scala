package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scale probe for the BOUNDED hard-negative miner
  * (`pipe_hard_negatives_bounded`) against the unbounded truth tier —
  * the r10 verdict's one remaining scale-killer: the truth tier's
  * lexical arm posting-joins every query 3-gram against the whole
  * corpus' postings (df-sized fan-out on hot grams) and its semantic
  * arm is Ann.brute (Q×N rows ranked). The bounded form feeds its
  * verifier only AllPairs prefix collisions and its ranker only
  * cell-keyed IVF candidates.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.ProbeHardNeg
  *
  * Measured (local[32]) — candidate volume fed to each strategy's
  * verifier/ranker, sf0.01 (500 docs) → sf0.1 (5,000 docs):
  *  - plain 3-gram posting pairs: 11,533 → 1,130,536 (~98× for 10× —
  *    quadratic; the truth tier's shape with an every-doc query set)
  *  - 3-gram AllPairs prefix (t=0.5): 977 → 409,103 (~419× — WORSE
  *    than plain growth: hot 3-grams keep df-sized prefixes; rejected)
  *  - 3-gram MinHash-LSH 16/8: 80 → 6,259 (~78× — collision noise is
  *    n²·p at fixed band width; rejected)
  *  - verified 5-gram pairs (the CHOSEN bound): 25 → 256 (10.2× —
  *    linear in planted-dup mass, the ProbePrefix result)
  * Full bounded query 4.1 s → 5.1 s (48 → 512 negatives emitted);
  * truth tier (20-query) 0.6 s → 1.0 s. The bounded miner's candidate
  * volume tracks true-duplicate density, the unbounded tier's corpus².
  */
object ProbeHardNeg {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-38s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenize(col("text"), "default").as("toks"))
    val sh = Dedup.shingles(docs, col("doc_id"), col("toks"), n = 3)
      .localCheckpoint(eager = false)
    val nDocs = sh.count()
    println(s"[probe] corpus: $nDocs docs shingled on 3-grams")

    // the unbounded tier's lexical candidate volume with every doc as a
    // query: distinct doc pairs sharing ANY 3-gram (df-sized fan-out)
    val flat = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
    val plain = time("unbounded posting-join candidates") {
      flat.select(col("doc_id").as("a"), col("s"))
        .join(flat.select(col("doc_id").as("b"), col("s")), "s")
        .where(col("a") < col("b")).select("a", "b").distinct().count()
    }
    println(s"[probe]   plain pairs: $plain (n²/2 = ${nDocs * (nDocs - 1) / 2})")

    val prefixC = time("AllPairs prefix candidates (t=0.5)") {
      Dedup.prefixCandidates(sh, 0.5).count()
    }
    println(s"[probe]   prefix candidates: $prefixC (df-sized on hot 3-grams)")

    val lshC = time("MinHash-LSH banded candidates (16/8)") {
      Dedup.minhashLsh(sh, numHashes = 16, bands = 8).count()
    }
    println(s"[probe]   LSH candidates: $lshC")

    // the CHOSEN bound: the dedup tier's verified 5-gram pairs — linear
    // in planted-dup mass (ProbePrefix) — scored per-pair on 3-grams
    val sh5 = Dedup.shingles(docs, col("doc_id"), col("toks"), n = 5)
    val chosen = time("verified 5-gram pairs (the chosen bound)") {
      Dedup.ngramJaccardPrefix(sh5, 0.5).count()
    }
    println(s"[probe]   verified 5-gram candidate pairs: $chosen")

    val full = time("pipe_hard_negatives_bounded full run") {
      graft.queries.PipelineQueries.all("pipe_hard_negatives_bounded")(spark, dir)
        .count()
    }
    println(s"[probe]   bounded negatives emitted: $full")

    val truth = time("pipe_hard_negatives (truth tier) full run") {
      graft.queries.PipelineQueries.all("pipe_hard_negatives")(spark, dir).count()
    }
    println(s"[probe]   truth-tier negatives emitted: $truth")
    spark.stop()
  }
}

package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Catalog, Indexer, Searcher}

/** BM25 ranking behavior of the search path (SURVEY §2.4): more
  * occurrences of the query term in a shorter document rank first; rarer
  * terms weigh more than common ones. */
class SearchRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mkIndex(docs: Seq[String]): (Catalog, Searcher, String) = {
    val root = Files.createTempDirectory("graft-rank").toString
    val cat = new Catalog(root)
    cat.create(
      """version: 1
        |name: rank_test
        |path: /tmp/unused
        |schema:
        |  fields:
        |    - name: id
        |      type: !number
        |        type: i64
        |    - name: body
        |      type: !text
        |""".stripMargin)
    val f = Files.createTempFile("docs", ".json")
    Files.write(f, docs.mkString("\n").getBytes("UTF-8"))
    new Indexer(spark, cat).indexFile("rank_test", f.toString)
    (cat, new Searcher(spark, cat), "rank_test")
  }

  private def ids(results: Seq[String]): Seq[Long] =
    results.map(s => """"id":(\d+)""".r.findFirstMatchIn(s).get.group(1).toLong)

  test("automaton clauses (fuzzy/prefix/IN) add a constant 1.0 x boost, tantivy-style") {
    // tantivy scores automaton-backed queries (FuzzyTermQuery, prefix,
    // TermSetQuery) with a flat ConstScorer(1.0 * boost), while Term and
    // Phrase get BM25; a boolean query sums every matching clause. Pin the
    // mixed-query ordering that semantics produces (VERDICT r3 item 9).
    val (_, search, name) = mkIndex(Seq(
      """{"id": 1, "body": "alpha zebulon"}""",
      """{"id": 2, "body": "alpha common words"}""",
      """{"id": 3, "body": "zebulon common words"}""",
      """{"id": 4, "body": "common words only here"}"""))

    // BM25(alpha) ~ 0.96 for both matchers; fuzzy adds flat 1.0:
    // doc 1 (both) > doc 3 (fuzzy only, 1.0) > doc 2 (term only, ~0.96)
    val mixed = ids(search.search(name, "body:alpha OR body:zebulun~1", 10))
    assert(mixed == Seq(1L, 3L, 2L), s"got $mixed")

    // boost scales the constant: fuzzy^3 (3.0) outranks term+prefix
    // (BM25(alpha) ~0.96 + 1.0) — doc 3 above docs 1 and 2
    val boosted = ids(search.search(name, "body:zebulun~1^3 OR body:alpha OR body:comm*", 10))
    assert(boosted.head == 3L, s"got $boosted")
    // doc 1 (alpha BM25 + fuzzy 3.0 ... ) — doc 1 matches fuzzy too, so it
    // carries 3.0 + BM25(alpha): top overall is actually doc 1
    assert(boosted.take(2).toSet == Set(1L, 3L), s"got $boosted")

    // optional const clauses force the scored path and SUM per match:
    // doc 3 (fuzzy 2.0 + prefix 1.0 = 3.0) > doc 1 (fuzzy only, 2.0) >
    // docs 2/4 (prefix only, 1.0)
    val constOnly = ids(search.search(name, "body:zebulun~1^2 OR body:comm*", 10))
    assert(constOnly.take(2) == Seq(3L, 1L), s"got $constOnly")
    assert(constOnly.toSet == Set(1L, 2L, 3L, 4L), s"got $constOnly")

    // uniform-boost automaton query: every match scores the same — result
    // SET is the contract (arrival-order fast path)
    val uniform = ids(search.search(name, "body:zebulun~1", 10))
    assert(uniform.toSet == Set(1L, 3L))
  }

  test("term frequency and doc length drive BM25 order") {
    val (_, search, name) = mkIndex(Seq(
      """{"id": 1, "body": "alpha beta gamma delta epsilon zeta eta theta"}""",
      """{"id": 2, "body": "alpha alpha alpha"}""",
      """{"id": 3, "body": "alpha beta"}""",
      """{"id": 4, "body": "unrelated words only"}"""))
    val got = ids(search.search(name, "body:alpha", 10))
    // doc 2: tf=3 short doc -> top; doc 4 never matches
    assert(got.head == 2, s"expected doc 2 first, got $got")
    assert(!got.contains(4L))
    assert(got.toSet == Set(1L, 2L, 3L))
  }

  test("en_stem tokenizer matches across inflections") {
    val root = Files.createTempDirectory("graft-stem").toString
    val cat = new Catalog(root)
    cat.create(
      """version: 1
        |name: stem_test
        |path: /tmp/unused
        |schema:
        |  fields:
        |    - name: id
        |      type: !number
        |        type: i64
        |    - name: body
        |      type: !text
        |        indexed:
        |          tokenizer: en_stem
        |""".stripMargin)
    val f = Files.createTempFile("docs", ".json")
    Files.write(f,
      """{"id": 1, "body": "the runner was running daily"}
        |{"id": 2, "body": "completely unrelated content"}""".stripMargin.getBytes("UTF-8"))
    new Indexer(spark, cat).indexFile("stem_test", f.toString)
    val search = new Searcher(spark, cat)
    // query "runs" stems to "run", matching the doc's stemmed "running"
    assert(ids(search.search("stem_test", "body:runs", 10)) == Seq(1L))
    assert(search.search("stem_test", "body:jogging", 10).isEmpty)
  }

  test("boost multiplies a clause's score contribution") {
    val (_, search, name) = mkIndex(Seq(
      """{"id": 1, "body": "alpha alpha alpha filler"}""",
      """{"id": 2, "body": "beta beta beta filler"}"""))
    // unboosted: symmetric corpus, doc order falls back to score ties;
    // boosting beta^4 must put doc 2 first
    val got = ids(search.search(name, "alpha beta^4", 10))
    assert(got.head == 2, s"boosted term should dominate, got $got")
  }

  test("rarer terms dominate multi-term scores") {
    val (_, search, name) = mkIndex(Seq(
      """{"id": 1, "body": "common common common common"}""",
      """{"id": 2, "body": "common rare"}""",
      """{"id": 3, "body": "common words here"}""",
      """{"id": 4, "body": "common stuff again"}""",
      """{"id": 5, "body": "common filler text"}"""))
    val got = ids(search.search(name, "common rare", 5))
    assert(got.head == 2, s"doc with the rare term must rank first, got $got")
  }

  test("phrase frequency, not per-word tf, drives mixed phrase+term order") {
    // The round-4/5 scoring-semantics pin (op_grammar's oracle orders by
    // doc_id, so only this test sees phrase RANKING): a phrase clause
    // scores BM25 with tf = phrase frequency and idf = sum of word idfs.
    val (_, search, name) = mkIndex(Seq(
      """{"id": 1, "body": "the quick fox jumps"}""",
      """{"id": 2, "body": "quick fox the jumps"}""",
      """{"id": 3, "body": "fox alone here now"}""",
      """{"id": 4, "body": "nothing relevant here"}"""))
    // docs 1-3 tie on body:fox (same tf, same length); only doc 1 holds
    // the adjacent phrase — the phrase clause must decide the top rank,
    // and doc 2 (same words scattered, phrase freq 0) must NOT share it
    val mixed = ids(search.search(name, "body:\"the quick\" OR body:fox", 10))
    assert(mixed.head == 1L, s"adjacent phrase must outrank scattered words, got $mixed")
    assert(mixed.toSet == Set(1L, 2L, 3L), s"got $mixed")

    // repeated occurrences raise the score: same doc length, phrase freq
    // 2 vs 1 — the tf=2 doc must rank first
    val (_, search2, name2) = mkIndex(Seq(
      """{"id": 1, "body": "the quick pad the quick"}""",
      """{"id": 2, "body": "the quick pad pad pad"}"""))
    val rep = ids(search2.search(name2, "body:\"the quick\"", 10))
    assert(rep == Seq(1L, 2L), s"higher phrase freq must rank first, got $rep")

    // sloppy phrases: ONE physical occurrence counts once (round-5 ADVICE
    // medium — the undeduped scan credited 'pad the quick tail' with tf 2
    // because starts 0 and 1 both saw the same occurrence); two real
    // occurrences in an equal-length doc must still outrank it
    val (_, search3, name3) = mkIndex(Seq(
      """{"id": 1, "body": "pad the quick tail"}""",
      """{"id": 2, "body": "the quick the quick"}"""))
    val sloppy = ids(search3.search(name3, "body:\"the quick\"~1", 10))
    assert(sloppy == Seq(2L, 1L), s"two occurrences must outrank one, got $sloppy")
  }

  test("per-request knobs: default-field restriction, unscored, count") {
    import graft.engine.SearchRequest
    val (_, search, name) = mkIndex(Seq(
      """{"id": 1, "body": "alpha words", "note": "unique marker"}""",
      """{"id": 2, "body": "unique text", "note": "alpha note"}""",
      """{"id": 3, "body": "other words", "note": "more text"}"""))

    // unfielded "unique" normally matches body OR the _dynamic note
    assert(ids(search.search(name, SearchRequest("unique", 10))).toSet == Set(1L, 2L))
    // restricted to body only, doc 1's note no longer matches
    assert(ids(search.search(name,
      SearchRequest("unique", 10, fields = Some(List("body"))))) == Seq(2L))
    // restricted to the dynamic path only
    assert(ids(search.search(name,
      SearchRequest("unique", 10, fields = Some(List("note"))))) == Seq(1L))

    // unscored returns the same match set (no ranking contract)
    val unscored = search.search(name, SearchRequest("body:words", 10, scored = false))
    assert(ids(unscored).toSet == Set(1L, 3L))

    // count: matches without assembling documents
    assert(search.countMatches(name, "unique") == 2L)
    assert(search.countMatches(name, "unique", fields = Some(List("body"))) == 1L)
    assert(search.countMatches(name, "nosuchtoken") == 0L)
  }
}

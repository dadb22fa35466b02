package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.exprs.exprs.porter_stem

/** Index-time text processing, mirroring the reference's tokenizer set
  * (`/root/reference/src/config/mod.rs:61-90`): `default` splits on
  * non-alphanumerics, drops tokens longer than 40 bytes, lowercases;
  * `raw` keeps the whole value as one token; `en_stem` = default + Porter
  * stemming; `whitespace` splits on whitespace only (no lowercasing, no
  * length limit).
  *
  * All built from codegen'd `functions._` combinators except the stemmer
  * (a custom expression applied per token inside `transform`). These run
  * once at ingest; query-time term matching is `array_contains` on the
  * materialized terms column.
  */
object TextFunctions {

  /** Runs of unicode letters/digits, lowercased, <= 40 chars (runs longer
    * than 40 are dropped whole, tantivy's RemoveLongFilter behavior —
    * measured in chars here vs tantivy's bytes; identical on ASCII).
    *
    * One codegen'd regexp_extract_all — the lookarounds reject runs
    * embedded in longer runs, which is exactly "split on non-alnum then
    * drop long tokens" without the interpreted per-element filter() HOF.
    */
  def tokenizeDefault(c: Column): Column =
    regexp_extract_all(lower(c),
      lit("(?<![\\p{L}\\p{N}])[\\p{L}\\p{N}]{1,40}(?![\\p{L}\\p{N}])"), lit(0))

  def tokenizeWhitespace(c: Column): Column =
    array_remove(split(c, "\\s+"), "")

  def tokenizeRaw(c: Column): Column = array(c)

  def tokenizeEnStem(c: Column): Column =
    transform(tokenizeDefault(c), t => porter_stem(t))

  /** The tokenizer vocabulary — validated at index CREATE so a typo
    * fails there, not at first ingest or first query. */
  val KnownTokenizers: Set[String] = Set("default", "raw", "en_stem", "whitespace")

  def tokenize(c: Column, tokenizer: String): Column = tokenizer match {
    case "default"    => tokenizeDefault(c)
    case "raw"        => tokenizeRaw(c)
    case "en_stem"    => tokenizeEnStem(c)
    case "whitespace" => tokenizeWhitespace(c)
    case other => throw new IllegalArgumentException(s"unknown tokenizer: $other")
  }

  /** The array-aware ingest tokenization shape, shared by the `_terms`
    * construction and the digest build so the two can never
    * desynchronize: scalar columns tokenize directly, array columns
    * tokenize per element and flatten. */
  def tokensOf(c: Column, tokenizer: String, array: Boolean): Column =
    if (array) flatten(transform(c, e => tokenize(e.cast("string"), tokenizer)))
    else tokenize(c.cast("string"), tokenizer)

  /** Tokenize a single query term the same way the field was tokenized at
    * ingest (a term never contains separators, so default/en_stem reduce to
    * lowercase (+stem)). Used by the query compiler. */
  def tokenizeTerm(term: String, tokenizer: String): String = tokenizer match {
    case "default"    => term.toLowerCase
    case "en_stem"    => graft.exprs.PorterStemmer.stem(term.toLowerCase)
    case _            => term
  }

  /** Phrase = ordered run of adjacent tokens (slop widens each word's
    * window). Shared by the query compiler and the analytics surface.
    *
    * slop=0 compiles to a single `contains` over the terms joined with a
    * sentinel delimiter — token adjacency is exactly substring match on
    * that encoding, and String.contains stays inside whole-stage codegen
    * with no per-row array materialization. slop>0 falls back to the
    * positional scan. */
  def phraseMatch(terms: Column, words: List[String], slop: Int = 0): Column =
    words match {
      case Nil      => lit(true)
      case w :: Nil => array_contains(terms, w)
      case _ if slop == 0 =>
        val d = "\u0001"
        concat(lit(d), array_join(terms, d), lit(d))
          .contains(d + words.mkString(d) + d)
      case _ =>
        // tight-loop positional scan (one virtual call per row — the
        // sequence+slice+exists HOF form this replaces materialized an
        // index array and ran interpreted lambdas per candidate position),
        // early-exiting at the first occurrence: the WHERE path needs
        // existence, not the exact count a scorer needs
        graft.exprs.ArrayMatch.phrase_any(terms, words, slop)
    }
}

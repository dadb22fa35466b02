package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.config._
import graft.exprs.{ArrayMatch, IpCodec}
import graft.functions.{TextFunctions, TimeFunctions}

/** Compiles a parsed tantivy-syntax query into a Catalyst `Column`
  * predicate over an index's storage schema (SURVEY §2.3 is the contract).
  *
  * Typing rules per target field:
  *  - tokenized text → `array_contains` on the pre-tokenized `_terms`
  *    column (term match, not substring — same as an inverted index);
  *  - raw text → whole-value equality;
  *  - number/boolean/datetime/ip → literal coerced to the storage type at
  *    compile time (datetime via the field's format cascade semantics, ip
  *    via [[IpCodec]] so range compare is binary compare);
  *  - unknown field names → JSON-path lookup into `_dynamic`
  *    (`severity_text:INFO` ≡ tantivy's json-field path addressing);
  *  - fieldless terms → OR over all indexed default fields, where a field
  *    whose type cannot hold the literal contributes `false` (tantivy's
  *    lenient parse).
  *
  * Typed comparisons compile to codegen'd builtins over typed columns, so
  * Catalyst pushes them into the Parquet scan (min/max pruning) and those
  * filters stay inside WholeStageCodegen. Text-match predicates over token
  * arrays (prefix, fuzzy, array range, phrase) compile to the tight-loop
  * CodegenFallback expressions in [[graft.exprs.ArrayMatch]] — one virtual
  * call per row, no per-element interpreted lambdas — so a scored text
  * filter costs a codegen boundary but never an interpreter loop.
  */
final class QueryCompiler(d: SchemaDerivation,
    defaultFields: Option[List[String]] = None) {

  import SchemaDerivation.{Dynamic, Terms}

  def compile(query: String): Column = compileAst(QueryParser.parse(query))

  def compileAst(ast: Ast): Column = ast match {
    case Ast.MatchAll => lit(true)

    case Ast.Bool(clauses) =>
      val musts = clauses.collect { case (Occur.Must, a) => compileAst(a) }
      val shoulds = clauses.collect { case (Occur.Should, a) => compileAst(a) }
      val nots = clauses.collect { case (Occur.MustNot, a) => compileAst(a) }
      // tantivy boolean semantics: all musts; at least one should when no
      // must exists; never a must_not. (Shoulds with musts present only
      // affect scoring, not matching.)
      val base =
        if (musts.nonEmpty) musts.reduce(_ && _)
        else if (shoulds.nonEmpty) shoulds.reduce(_ || _)
        else lit(true)
      nots.foldLeft(base)((acc, n) => acc && !coalesce(n, lit(false)))

    case Ast.Boost(inner, _) => compileAst(inner) // boost affects scoring only

    case Ast.Term(Some(f), v)   => fieldTerm(f, v)
    case Ast.Term(None, v)      => overDefaults(fn => fieldTerm(fn, v))
    case Ast.Prefix(Some(f), v) => fieldPrefix(f, v)
    case Ast.Prefix(None, v)    => overDefaults(fn => fieldPrefix(fn, v))
    case Ast.Fuzzy(Some(f), v, dist) => fieldFuzzy(f, v, dist)
    case Ast.Fuzzy(None, v, dist)    => overDefaults(fn => fieldFuzzy(fn, v, dist))
    case Ast.InSet(Some(f), vs) => vs.map(fieldTerm(f, _)).reduceOption(_ || _).getOrElse(lit(false))
    case Ast.InSet(None, vs)    => overDefaults(fn => vs.map(fieldTerm(fn, _)).reduceOption(_ || _).getOrElse(lit(false)))
    case Ast.Range(Some(f), lo, hi) => fieldRange(f, lo, hi)
    case Ast.Range(None, lo, hi)    => overDefaults(fn => fieldRange(fn, lo, hi))
    case Ast.Phrase(Some(f), ws, slop) => fieldPhrase(f, ws, slop)
    case Ast.Phrase(None, ws, slop)    => overDefaults(fn => fieldPhrase(fn, ws, slop))
  }

  private def overDefaults(per: String => Column): Column =
    defaultFields.getOrElse(d.defaultFieldNames)
      .map(fn => coalesce(per(fn), lit(false)))
      .reduceOption(_ || _).getOrElse(lit(false))

  private def termsCol(flatName: String): Column =
    col(s"`$Terms`").getField(flatName)

  // ---- term -------------------------------------------------------------

  /** Every query form below guards on `fieldType.indexed` first: the
    * reference hands its QueryParser only indexed fields
    * (`src/commands/search.rs:138-186`, `config/mod.rs:105,198`), so an
    * `indexed: false` field of ANY type is stored-but-unsearchable —
    * compiled here as a static no-match rather than the error tantivy
    * raises (no wrong hits either way). */
  private def fieldTerm(flatName: String, value: String): Column =
    d.byFlatName.get(flatName) match {
      case Some(rf) if !rf.fieldType.indexed => lit(false)
      case Some(rf) => typedTerm(rf, value)
      case None if flatName == Dynamic =>
        array_contains(termsCol(Dynamic), TextFunctions.tokenizeTerm(value, "default"))
      case None => dynamicPathTerm(flatName, value)
    }

  private def typedTerm(rf: ResolvedField, value: String): Column = {
    val c = rf.column
    def elemPred(elem: Column): Column = rf.fieldType match {
      case t: TextField =>
        t.tokenizer match {
          case Some("raw") | None => elem === value
          case Some(tok) =>
            // term match on the pre-tokenized column (non-array case below
            // overrides this with the _terms lookup)
            elem === TextFunctions.tokenizeTerm(value, tok)
        }
      case n: NumberField =>
        numLit(n, value).map(elem === _).getOrElse(lit(false))
      case _: BooleanField =>
        boolLit(value).map(elem === _).getOrElse(lit(false))
      case dt: DateTimeField =>
        elem === tsLit(dt, value)
      case _: IpField =>
        IpCodec.parse(value).map(b => elem === lit(b)).getOrElse(lit(false))
      case dyn: DynamicObjectField =>
        // term against the whole dynamic field: tokenizer semantics;
        // `indexed: false` (tokenizer None) is stored-only — unsearchable,
        // like the reference's unindexed json fields
        dyn.tokenizer match {
          case None        => lit(false)
          case Some("raw") => get_json_object(elem, "$") === value
          case Some(tok) =>
            array_contains(TextFunctions.tokenize(elem, tok),
              TextFunctions.tokenizeTerm(value, tok))
        }
      case _: StaticObjectField => lit(false)
    }

    rf.fieldType match {
      case t: TextField if t.tokenizer.exists(_ != "raw") =>
        // tokenized text: use the ingest-time terms column (works for both
        // scalar and array fields — terms of arrays are flattened)
        array_contains(termsCol(rf.flatName), TextFunctions.tokenizeTerm(value, t.tokenizer.get))
      case _ if rf.array => arrayTerm(rf, c, value)
      case _             => elemPred(c)
    }
  }

  /** Array-field term match without a per-element lambda: every leaf type
    * reduces to `array_contains` against a compile-time-coerced literal
    * (equality semantics identical to the scalar `elemPred`). Dynamic
    * arrays match by tokenizing the elements JOINED on "\n" — a character
    * every tokenizer treats as a separator, so the token set of the join
    * is exactly the union of the per-element token sets; raw-tokenized
    * dynamic arrays compare the canonical element text directly (stored
    * elements are Jackson-canonical JSON, so a string value matches its
    * quoted form and any other JSON value its literal text — the same
    * equivalences `get_json_object(e, "$") === value` encoded). */
  private def arrayTerm(rf: ResolvedField, c: Column, value: String): Column =
    rf.fieldType match {
      case _: TextField => array_contains(c, value) // raw/untokenized only here
      case n: NumberField =>
        numLit(n, value).map(array_contains(c, _)).getOrElse(lit(false))
      case _: BooleanField =>
        boolLit(value).map(array_contains(c, _)).getOrElse(lit(false))
      case dt: DateTimeField => array_contains(c, tsLit(dt, value))
      case _: IpField =>
        IpCodec.parse(value).map(b => array_contains(c, lit(b))).getOrElse(lit(false))
      case dyn: DynamicObjectField =>
        dyn.tokenizer match {
          case None => lit(false) // indexed: false — stored-only, unsearchable
          case Some("raw") =>
            array_contains(c, value) ||
              array_contains(c, QueryCompiler.jsonQuote(value))
          case Some(tok) =>
            array_contains(TextFunctions.tokenize(concat_ws("\n", c), tok),
              TextFunctions.tokenizeTerm(value, tok))
        }
      case _: StaticObjectField => lit(false)
    }

  /** Variant source + in-source path + tokenizer for a flat name that is
    * not a declared leaf: a path into a DECLARED dynamic_object field
    * reads that field's stored JSON (tantivy json-field addressing — the
    * reference resolves `resource.service:x` against the `resource`
    * json field, never the catch-all; the catch-all only owns paths no
    * declared field claims). The declared column stores expand-dots-
    * normalized JSON text, so `try_parse_json` gives it the same variant
    * access the catch-all gets natively. */
  private def dynRoute(flatName: String): (Column, Option[String], String) =
    d.dynamicOwner(flatName) match {
      case Some((rf, rest)) =>
        rf.fieldType.asInstanceOf[DynamicObjectField].tokenizer match {
          // `indexed: false` owner: the reference's unindexed json fields
          // are unsearchable — path None makes every downstream form
          // (dynText, dynTokenArr, ranges) a null source → no match
          case None => (lit(null), None, "default")
          case Some(tk) =>
            (try_parse_json(col(rf.flatName)),
              SchemaDerivation.variantPath(rest), tk)
        }
      case None =>
        (col(Dynamic), SchemaDerivation.variantPath(flatName), "default")
    }

  /** Value text at a dynamic path: binary variant access (format-2
    * splits store the catch-all as VariantType), cast to string with
    * `get_json_object` semantics — strings unquoted, scalars canonical,
    * objects/arrays as JSON text, missing/JSON-null → null. A path name
    * the variant grammar cannot express (embedded `'`) is a no-match
    * null, not an error. */
  private def dynText(flatName: String): Column = {
    val (src, path, _) = dynRoute(flatName)
    path match {
      case Some(p) => try_variant_get(src, p, "string")
      case None    => lit(null).cast("string")
    }
  }

  /** Token array at a dynamic path for term/prefix/fuzzy/phrase
    * matching — see [[QueryCompiler.dynTokensFrom]]. */
  private def dynTokenArr(flatName: String): Column = {
    val (src, path, tk) = dynRoute(flatName)
    QueryCompiler.dynTokensFrom(src, path, tk)
  }

  /** Unknown field → path into `_dynamic` (expand_dots made nested
    * form canonical at ingest). The catch-all is indexed with the default
    * tokenizer (`src/commands/mod.rs:41-51`), so term match tokenizes the
    * value at the path. */
  private def dynamicPathTerm(flatName: String, value: String): Column = {
    val v = dynText(flatName)
    val tk = dynRoute(flatName)._3
    // a RAW-tokenized owner (the reference's dynamic_object default)
    // indexes string values as single tokens: term match is whole-value
    // equality, exactly like a raw TextField
    val tokenMatch =
      if (tk == "raw") v === lit(value)
      else array_contains(
        dynTokenArr(flatName),
        TextFunctions.tokenizeTerm(value, tk))
    // numbers/bools in JSON compare by token too ("58" tokenizes to ["58"])
    // Variant canonicalizes numeric lexemes ("1e3" is stored as a double
    // and renders "1000.0" — the reference's serde_json does the same at
    // echo time), so a numeric query literal additionally matches by
    // VALUE: `extra.x:1e3` must hit a stored 1000.0 even though their
    // token streams differ.
    val numericMatch = value.toDoubleOption match {
      case Some(n) => coalesce(v.try_cast("double") === lit(n), lit(false))
      case None    => lit(false)
    }
    coalesce(tokenMatch, lit(false)) || numericMatch
  }

  // ---- prefix -----------------------------------------------------------

  private def fieldPrefix(flatName: String, value: String): Column =
    d.byFlatName.get(flatName) match {
      case Some(rf) if !rf.fieldType.indexed => lit(false)
      case Some(rf) =>
        rf.fieldType match {
          case t: TextField if t.tokenizer.exists(tk => tk != "raw") =>
            // Only lowercase the prefix for tokenizers that lowercase at
            // ingest (default/en_stem); whitespace keeps original case, so
            // `Error*` must compare raw to match capitalized tokens.
            val needle =
              if (t.tokenizer.contains("whitespace")) value else value.toLowerCase
            ArrayMatch.any_starts_with(termsCol(rf.flatName), needle)
          case t: TextField =>
            val c = rf.column
            if (rf.array) ArrayMatch.any_starts_with(c, value) else c.startsWith(value)
          case _ => lit(false)
        }
      case None =>
        coalesce(ArrayMatch.any_starts_with(
          dynTokenArr(flatName), value.toLowerCase), lit(false))
    }

  /** Fuzzy term match: Levenshtein distance against ingest-tokenized terms
    * (the FuzzyTermQuery contract — per indexed term, never per character
    * window of the raw text). The needle goes through the same tokenizer
    * normalization as an exact term. */
  private def fieldFuzzy(flatName: String, value: String, dist: Int): Column =
    d.byFlatName.get(flatName) match {
      case Some(rf) if !rf.fieldType.indexed => lit(false)
      case Some(rf) =>
        rf.fieldType match {
          case t: TextField if t.tokenizer.exists(_ != "raw") =>
            val needle = TextFunctions.tokenizeTerm(value, t.tokenizer.get)
            ArrayMatch.any_levenshtein_le(termsCol(rf.flatName), needle, dist)
          case _: TextField =>
            val c = rf.column
            if (rf.array) ArrayMatch.any_levenshtein_le(c, value, dist)
            else levenshtein(c, lit(value)) <= dist
          case _ => lit(false)
        }
      case None if flatName == Dynamic =>
        ArrayMatch.any_levenshtein_le(termsCol(Dynamic),
          TextFunctions.tokenizeTerm(value, "default"), dist)
      case None =>
        coalesce(ArrayMatch.any_levenshtein_le(
          dynTokenArr(flatName), value.toLowerCase, dist), lit(false))
    }

  // ---- range / comparison ----------------------------------------------

  private def fieldRange(flatName: String, lo: Bound, hi: Bound): Column =
    d.byFlatName.get(flatName) match {
      case Some(rf) if !rf.fieldType.indexed => lit(false)
      case Some(rf) =>
        def sidePred(c: Column): Column = {
          val loP = boundPred(rf, c, lo, isLower = true)
          val hiP = boundPred(rf, c, hi, isLower = false)
          loP && hiP
        }
        if (rf.array) arrayRange(rf, lo, hi) else sidePred(rf.column)
      case None =>
        val raw = dynText(flatName)
        // numeric compare when both the value and the bounds parse as
        // numbers; string compare otherwise
        val numeric = Seq(lo, hi).forall {
          case Bound.Inclusive(v) => v.toDoubleOption.isDefined
          case Bound.Exclusive(v) => v.toDoubleOption.isDefined
          case Bound.Unbounded    => true
        }
        val c = if (numeric) raw.try_cast("double") else raw
        def cmp(b: Bound, lower: Boolean): Column = b match {
          case Bound.Unbounded => lit(true)
          case Bound.Inclusive(v) =>
            val l = if (numeric) lit(v.toDouble) else lit(v)
            if (lower) c >= l else c <= l
          case Bound.Exclusive(v) =>
            val l = if (numeric) lit(v.toDouble) else lit(v)
            if (lower) c > l else c < l
        }
        coalesce(cmp(lo, lower = true) && cmp(hi, lower = false), lit(false))
    }

  /** Range over an array field as one tight-loop [[ArrayMatch.any_in_range]]
    * (`exists(arr, e => lo && hi)` without the per-element lambda). A
    * bounded side whose literal fails compile-time coercion matches
    * nothing, same as the scalar `boundPred`. */
  private def arrayRange(rf: ResolvedField, lo: Bound, hi: Bound): Column = {
    def side(b: Bound): Option[(Option[Column], Boolean)] = b match {
      case Bound.Unbounded    => Some((None, true))
      case Bound.Inclusive(v) => literalFor(rf, v).map(c => (Some(c), true))
      case Bound.Exclusive(v) => literalFor(rf, v).map(c => (Some(c), false))
    }
    (side(lo), side(hi)) match {
      case (Some((loC, loIn)), Some((hiC, hiIn))) =>
        ArrayMatch.any_in_range(rf.column,
          loC.getOrElse(lit(null)), hiC.getOrElse(lit(null)),
          if (loC.isDefined) Some(loIn) else None,
          if (hiC.isDefined) Some(hiIn) else None)
      case _ => lit(false) // an unparseable bound can never match
    }
  }

  private def boundPred(rf: ResolvedField, c: Column, b: Bound, isLower: Boolean): Column =
    b match {
      case Bound.Unbounded => lit(true)
      case Bound.Inclusive(v) =>
        literalFor(rf, v).map(l => if (isLower) c >= l else c <= l).getOrElse(lit(false))
      case Bound.Exclusive(v) =>
        literalFor(rf, v).map(l => if (isLower) c > l else c < l).getOrElse(lit(false))
    }

  /** Compile-time literal coercion to the field's storage type. */
  private def literalFor(rf: ResolvedField, v: String): Option[Column] =
    rf.fieldType match {
      case n: NumberField  => numLit(n, v)
      case _: BooleanField => boolLit(v)
      case dt: DateTimeField => Some(tsLit(dt, v))
      case _: IpField      => IpCodec.parse(v).map(lit(_))
      case _: TextField    => Some(lit(v))
      case _               => Some(lit(v))
    }

  private def numLit(n: NumberField, v: String): Option[Column] =
    if (n.numType == "f64") v.toDoubleOption.map(lit(_))
    else v.toLongOption.map(lit(_))

  private def boolLit(v: String): Option[Column] = v.trim.toLowerCase match {
    case "true"  => Some(lit(true))
    case "false" => Some(lit(false))
    case _       => None
  }

  /** Datetime literal via the field's own format cascade, evaluated at
    * compile time into a constant timestamp column. */
  private def tsLit(dt: DateTimeField, v: String): Column =
    TimeFunctions.parseCascade(lit(v), dt.formats)

  // ---- phrase -----------------------------------------------------------

  /** Phrase = ordered subsequence of adjacent tokens (slop widens the
    * window). Implemented over the terms column with array_position
    * chaining for the common 2-3 word case; longer phrases fall back to a
    * conservative all-terms-present AND (documented approximation). */
  private def fieldPhrase(flatName: String, words: List[String], slop: Int): Column =
    d.byFlatName.get(flatName) match {
      case Some(rf) if !rf.fieldType.indexed => lit(false)
      case Some(rf) =>
        rf.fieldType match {
          case t: TextField if t.tokenizer.exists(_ != "raw") =>
            val tok = t.tokenizer.get
            val ws = words.map(TextFunctions.tokenizeTerm(_, tok))
            phraseOverTerms(termsCol(rf.flatName), ws, slop)
          case _: TextField =>
            val c = rf.column
            val needle = words.mkString(" ")
            if (rf.array) ArrayMatch.any_contains(c, needle) else c.contains(needle)
          case _ => lit(false)
        }
      case None =>
        coalesce(phraseOverTerms(dynTokenArr(flatName),
          words.map(_.toLowerCase), slop), lit(false))
    }

  private def phraseOverTerms(terms: Column, words: List[String], slop: Int): Column =
    TextFunctions.phraseMatch(terms, words, slop)
}

object QueryCompiler {
  /** JSON-encode a string the way Jackson renders stored dynamic values
    * (canonical: only control chars, quotes, and backslashes escaped). */
  private[query] def jsonQuote(s: String): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper
    m.writeValueAsString(s)
  }

  /** The query-time token array at a `_dynamic` path, shared by the
    * compiled predicates (term/prefix/fuzzy/phrase) and the scorer's
    * terms accessor: the subtree rendered as JSON with escape units
    * neutralized ([[graft.exprs.JsonEscapeNeutralize]]), then
    * default-tokenized — exactly the transform the ingest-side catch-all
    * terms and split term digests apply, so every query-time token is
    * digest-covered (the no-false-negative invariant
    * [[graft.query.TermPruning]] relies on). Tokenizing the subtree's RAW
    * rendered text instead glued escape chars onto adjacent alnum runs
    * (`"x\ny"` under `obj.a` made `obj:ny` match on scan while the digest
    * proved `ny` absent — the only matching split could be pruned).
    * Rendering via `to_json(variant)` rather than the string cast keeps
    * leaf strings ESCAPED (the string cast decodes them, where a literal
    * backslash is data, not an escape intro, and neutralization would eat
    * real tokens); for scalar leaves the neutralized tokens equal the
    * decoded value's tokens, for object/array subtrees the union of the
    * nested values' (and keys') tokens. JSON null stays SQL null —
    * tantivy does not index nulls — preserving the no-match semantics of
    * the previous string-cast path. */
  private[graft] def dynTokens(dynamic: Column, flatName: String): Column =
    dynTokensFrom(dynamic, SchemaDerivation.variantPath(flatName), "default")

  private[graft] def dynTokensFrom(src: Column, path: Option[String],
      tokenizer: String): Column =
    path match {
      case Some(p) =>
        val vv = try_variant_get(src, p, "variant")
        TextFunctions.tokenize(
          when(!is_variant_null(vv),
            graft.exprs.JsonExprs.json_escape_neutralize(to_json(vv))),
          tokenizer)
      case None => lit(null).cast("array<string>")
    }
}

package graft.query

/** AST for the tantivy query grammar surface the reference exposes
  * (`/root/reference/src/commands/search.rs:186-188` delegates to tantivy's
  * QueryParser; the constructs exercised in the repo are catalogued in
  * SURVEY §2.3).
  */
sealed trait Bound
object Bound {
  case object Unbounded extends Bound
  final case class Inclusive(v: String) extends Bound
  final case class Exclusive(v: String) extends Bound
}

sealed trait Ast
object Ast {
  case object MatchAll extends Ast
  /** field=None means "search the default fields". */
  final case class Term(field: Option[String], value: String) extends Ast
  final case class Phrase(field: Option[String], words: List[String], slop: Int) extends Ast
  final case class Prefix(field: Option[String], value: String) extends Ast
  /** `term~` / `term~N` — match within Levenshtein distance N (default 2,
    * Lucene-compatible; distance computes against ingest-tokenized terms). */
  final case class Fuzzy(field: Option[String], value: String, distance: Int) extends Ast
  final case class Range(field: Option[String], lo: Bound, hi: Bound) extends Ast
  final case class InSet(field: Option[String], values: List[String]) extends Ast
  /** +a -b c — tantivy boolean query with occurs. */
  final case class Bool(clauses: List[(Occur, Ast)]) extends Ast
  final case class Boost(inner: Ast, boost: Double) extends Ast
}

sealed trait Occur
object Occur {
  case object Must extends Occur
  case object Should extends Occur
  case object MustNot extends Occur
}

/** Hand-rolled recursive-descent parser for the grammar:
  *
  * {{{
  * query    := clause+                       (space-separated → Bool)
  * clause   := [+|-] unary
  * unary    := NOT unary | atom (AND|OR atom-chain handled at query level)
  * atom     := '(' query ')' | '*' | field ':' value | value
  * value    := range | comparison | set | phrase | prefix | term | '*'
  * range    := ('['|'{') bound TO bound (']'|'}')
  * comparison := ('>'|'>='|'<'|'<=') term
  * set      := IN '[' term* ']'
  * phrase   := '"' words '"' ('~' int)?
  * prefix   := term '*'
  * }}}
  *
  * AND/OR/NOT are uppercase keywords (tantivy's convention); bare
  * space-separated clauses are SHOULD, `+`/`-` mark MUST/MUST_NOT, AND
  * upgrades both neighbours to MUST — matching tantivy QueryParser
  * semantics.
  */
object QueryParser {

  final case class ParseError(msg: String, pos: Int)
      extends RuntimeException(s"$msg at position $pos")

  def parse(input: String): Ast = {
    val p = new P(input)
    val ast = p.parseQuery()
    p.skipWs()
    if (!p.eof) throw ParseError(s"unexpected trailing input '${p.rest}'", p.pos)
    ast
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def rest: String = s.substring(pos)
    def peek: Char = s.charAt(pos)

    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1

    def tryKeyword(kw: String): Boolean = {
      skipWs()
      if (s.regionMatches(pos, kw, 0, kw.length) &&
          (pos + kw.length >= s.length || !isTermChar(s.charAt(pos + kw.length)))) {
        pos += kw.length; true
      } else false
    }

    private def isTermChar(c: Char): Boolean =
      !c.isWhitespace && !"()[]{}\":*^~".contains(c)

    /** `~` after a term value: optional digits give the edit distance.
      * toIntOption guards absurd digit runs (`a~99999999999999`) — a
      * NumberFormatException here would escape the ParseError contract. */
    def tryFuzzySuffix(): Option[Int] =
      if (!eof && peek == '~') {
        pos += 1
        val st = pos
        while (!eof && peek.isDigit) pos += 1
        Some(if (pos > st)
          s.substring(st, pos).toIntOption
            .getOrElse(throw ParseError("fuzzy distance out of range", st))
        else 2)
      } else None

    def parseQuery(): Ast = {
      var clauses = List.empty[(Occur, Ast)]
      var pendingAnd = false
      skipWs()
      while (!eof && peek != ')') {
        if (tryKeyword("AND")) { pendingAnd = true }
        else if (tryKeyword("OR")) { /* OR is the default combinator */ }
        else {
          val (occur, ast) = parseClause()
          // AND makes a default (Should) clause required; it must NOT
          // flip a negated clause (`a AND NOT b`) into a positive one.
          val occ2 =
            if (pendingAnd && occur == Occur.Should) Occur.Must
            else occur
          // AND upgrades the previous clause too
          if (pendingAnd) {
            clauses = clauses match {
              case (Occur.Should, a) :: tail => (Occur.Must, a) :: tail
              case other                     => other
            }
            pendingAnd = false
          }
          clauses ::= (occ2, ast)
        }
        skipWs()
      }
      clauses.reverse match {
        case Nil              => Ast.MatchAll
        case (Occur.Should, one) :: Nil => one
        case (Occur.Must, one) :: Nil   => one
        case many             => Ast.Bool(many)
      }
    }

    def parseClause(): (Occur, Ast) = {
      skipWs()
      val occur =
        if (!eof && peek == '+') { pos += 1; Occur.Must }
        else if (!eof && peek == '-') { pos += 1; Occur.MustNot }
        else Occur.Should
      if (tryKeyword("NOT")) {
        val (_, inner) = parseClause()
        return (Occur.MustNot, inner)
      }
      val atom = parseAtom()
      // optional boost: term^2 — empty or malformed digits (`a^`, `a^.`)
      // must surface as ParseError, not NumberFormatException
      val boosted = if (!eof && peek == '^') {
        pos += 1
        val start = pos
        while (!eof && (peek.isDigit || peek == '.')) pos += 1
        val txt = s.substring(start, pos)
        Ast.Boost(atom, txt.toDoubleOption
          .getOrElse(throw ParseError(s"invalid boost '$txt'", start)))
      } else atom
      (occur, boosted)
    }

    def parseAtom(): Ast = {
      skipWs()
      if (eof) throw ParseError("unexpected end of query", pos)
      peek match {
        case '(' =>
          pos += 1
          val inner = parseQuery()
          skipWs()
          if (eof || peek != ')') throw ParseError("expected ')'", pos)
          pos += 1
          inner
        case '*' => pos += 1; Ast.MatchAll
        case '"' => parsePhrase(None)
        case '[' | '{' => parseRange(None)
        case _ =>
          val name = parseTermText()
          if (!eof && peek == ':') {
            pos += 1
            parseFieldValue(Some(name))
          } else if (name == "IN" && !eof && { skipWs(); !eof && peek == '[' }) {
            parseSet(None)
          } else if (!eof && peek == '*') {
            pos += 1; Ast.Prefix(None, unescapeValue(name))
          } else tryFuzzySuffix() match {
            case Some(d) => Ast.Fuzzy(None, unescapeValue(name), d)
            case None    => Ast.Term(None, unescapeValue(name))
          }
      }
    }

    def parseFieldValue(field: Option[String]): Ast = {
      skipWs()
      if (eof) throw ParseError("expected value after ':'", pos)
      peek match {
        case '[' | '{' => parseRange(field)
        case '"'       => parsePhrase(field)
        case '*'       => pos += 1; Ast.Range(field, Bound.Unbounded, Bound.Unbounded)
        case '>' =>
          pos += 1
          val incl = !eof && peek == '='
          if (incl) pos += 1
          val v = parseCompValue()
          Ast.Range(field,
            if (incl) Bound.Inclusive(v) else Bound.Exclusive(v), Bound.Unbounded)
        case '<' =>
          pos += 1
          val incl = !eof && peek == '='
          if (incl) pos += 1
          val v = parseCompValue()
          Ast.Range(field, Bound.Unbounded,
            if (incl) Bound.Inclusive(v) else Bound.Exclusive(v))
        case _ =>
          val v = parseTermText()
          if (v == "IN") { skipWs(); if (!eof && peek == '[') return parseSet(field) }
          if (!eof && peek == '*') { pos += 1; Ast.Prefix(field, unescapeValue(v)) }
          else tryFuzzySuffix() match {
            case Some(d) => Ast.Fuzzy(field, unescapeValue(v), d)
            case None    => Ast.Term(field, unescapeValue(v))
          }
      }
    }

    def parseSet(field: Option[String]): Ast = {
      skipWs()
      if (eof || peek != '[') throw ParseError("expected '[' after IN", pos)
      pos += 1
      var vals = List.empty[String]
      skipWs()
      while (!eof && peek != ']') {
        vals ::= unescapeValue(parseTermText())
        skipWs()
      }
      if (eof) throw ParseError("unterminated IN set", pos)
      pos += 1
      Ast.InSet(field, vals.reverse)
    }

    def parsePhrase(field: Option[String]): Ast = {
      pos += 1 // opening quote
      val start = pos
      while (!eof && peek != '"') pos += 1
      if (eof) throw ParseError("unterminated phrase", pos)
      val text = s.substring(start, pos)
      pos += 1
      var slop = 0
      if (!eof && peek == '~') {
        pos += 1
        val st = pos
        while (!eof && peek.isDigit) pos += 1
        slop = if (pos > st)
          s.substring(st, pos).toIntOption
            .getOrElse(throw ParseError("phrase slop out of range", st))
        else 0
      }
      Ast.Phrase(field, text.split("\\s+").filter(_.nonEmpty).toList, slop)
    }

    def parseRange(field: Option[String]): Ast = {
      val loIncl = peek == '['
      pos += 1
      skipWs()
      val loTxt = parseBoundText()
      skipWs()
      if (!tryKeyword("TO")) throw ParseError("expected TO in range", pos)
      skipWs()
      val hiTxt = parseBoundText()
      skipWs()
      if (eof || (peek != ']' && peek != '}')) throw ParseError("expected ] or }", pos)
      val hiIncl = peek == ']'
      pos += 1
      def bound(txt: String, incl: Boolean): Bound =
        if (txt == "*") Bound.Unbounded
        else if (incl) Bound.Inclusive(txt) else Bound.Exclusive(txt)
      Ast.Range(field, bound(loTxt, loIncl), bound(hiTxt, hiIncl))
    }

    /** Comparison values are lexed permissively (until whitespace or a
      * closing paren) so RFC3339 datetimes with colons work unquoted. */
    def parseCompValue(): String = {
      skipWs()
      val start = pos
      while (!eof && !peek.isWhitespace && peek != ')') pos += 1
      if (pos == start) throw ParseError("expected comparison value", pos)
      s.substring(start, pos)
    }

    /** Range bounds are lexed permissively (until whitespace or a closing
      * bracket) so RFC3339 datetimes with colons work unquoted, as in
      * tantivy: `timestamp:[2016-04-13T06:46:53Z TO *]`. */
    def parseBoundText(): String = {
      skipWs()
      if (!eof && peek == '*') { pos += 1; return "*" }
      val start = pos
      while (!eof && !peek.isWhitespace && peek != ']' && peek != '}') pos += 1
      if (pos == start) throw ParseError("expected range bound", pos)
      s.substring(start, pos)
    }

    /** Escapes are kept verbatim by [[parseTermText]] so the field-name
      * position can feed `splitFlatName` (which consumes `\.`); value
      * literals must be unescaped so `field:foo\:bar` compares as
      * `foo:bar` against stored text. */
    def unescapeValue(v: String): String = {
      val sb = new StringBuilder(v.length)
      var i = 0
      while (i < v.length) {
        if (v.charAt(i) == '\\' && i + 1 < v.length) { sb.append(v.charAt(i + 1)); i += 2 }
        else { sb.append(v.charAt(i)); i += 1 }
      }
      sb.toString
    }

    def parseTermText(): String = {
      skipWs()
      val start = pos
      val sb = new StringBuilder
      while (!eof && isTermChar(peek)) {
        if (peek == '\\' && pos + 1 < s.length) {
          // escaped char (e.g. \. in field names, \: in values)
          sb.append(peek); pos += 1
          sb.append(peek); pos += 1
        } else { sb.append(peek); pos += 1 }
      }
      if (pos == start) throw ParseError("expected term", pos)
      sb.toString
    }
  }
}

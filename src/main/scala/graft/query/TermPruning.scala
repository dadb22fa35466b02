package graft.query

import graft.config._
import graft.exprs.IpCodec
import graft.functions.TextFunctions

/** Required-token extraction for manifest-level split pruning against
  * per-split term digests ([[graft.engine.TermDigest]]).
  *
  * Output is a conservative CNF over token-presence atoms: a list of
  * clauses, each a set of `(flatField, token)` alternatives, such that
  * EVERY matching document contains, for every clause, at least one of
  * the clause's tokens in that field's ingest-time terms array. A split
  * whose digests prove some clause unsatisfiable cannot hold a match and
  * is skipped; everything uncertain (missing digest, unknown field,
  * un-tokenizable construct) keeps the split.
  *
  * This layer stands in for the per-split term dictionaries tantivy
  * gives the reference for free (every split carries a real inverted
  * index — `/root/reference/src/commands/search.rs:186-188`); here the
  * digest answers only "could this token be present", which is all
  * split-level pruning needs.
  *
  * Boolean semantics mirror [[FieldBounds]] (and the compiler's/tantivy's):
  * Must clauses conjoin (CNF concat); with any Must present, Should
  * clauses are scoring-only and contribute nothing; Should-only queries
  * disjoin (clause-set cross product, capped); MustNot never constrains.
  * The lattice top is the empty clause list ("no constraint").
  *
  * Leaf conservatism — a clause is emitted only when the compiled
  * predicate provably requires a token:
  *  - tokenized/raw text term → its single ingest token;
  *  - phrase over tokenized fields → one clause per word;
  *  - `IN [..]` → one clause of per-value alternatives;
  *  - unfielded terms fan out over the default fields: typed fields whose
  *    literal cannot coerce (alpha term vs number/ip/bool field) are
  *    statically non-matching and drop out; any field that could match
  *    through a non-token route (numeric equality, datetime parse,
  *    declared dynamic_object) makes the whole clause top;
  *  - `_dynamic` path terms use the catch-all token digest: query-time
  *    path tokenization ([[graft.query.QueryCompiler.dynTokens]]) and the
  *    ingest-side catch-all terms the digest is built over apply the SAME
  *    escape-neutralized rendering transform, so every query-time token
  *    is digest-covered — including under escaped values (`"x\ny"`),
  *    where tokenizing raw rendered text used to produce glued tokens the
  *    digest provably lacked (a wrong-prune false negative); numeric
  *    literals also match by value there, so they are top;
  *  - prefix over a digested field → the digest's prefix-MARKER entry
  *    ([[graft.engine.TermDigest.prefixKey]]): every stored token also
  *    inserted markers for its 3..8-char prefixes, so the needle clamped
  *    to 8 chars is provably present in any split holding a match;
  *    needles under 3 chars, and tokenizer-less fields, stay top;
  *  - fuzzy / regex / range and anything else → top.
  */
object TermPruning {
  type Atom = (String, String)

  /** Clause-count cap: CNF cross products of pathological Should nests
    * degrade to top rather than blow up. */
  private val MaxClauses = 24

  private sealed trait FieldAtom
  private final case class AtomOf(atom: Atom) extends FieldAtom
  /** The field could match through a route no digest covers. */
  private case object Unprunable extends FieldAtom
  /** The field statically cannot match this literal. */
  private case object NoMatch extends FieldAtom

  /** Digest route for a flat path that is not a declared leaf: a path
    * into a DECLARED dynamic_object field prunes via that field's own
    * token digest (its stream tokenizes the stored JSON — keys and
    * values — so any path match implies the value's tokens are present);
    * otherwise the `_dynamic` catch-all digest. None = the owner is
    * raw-tokenized (no digest stream) and pruning must stay top. */
  private def dynDigestRoute(d: SchemaDerivation,
      fn: String): Option[(String, String)] =
    d.dynamicOwner(fn) match {
      case Some((rf, _)) =>
        rf.fieldType.asInstanceOf[graft.config.DynamicObjectField].tokenizer match {
          case Some(tk) if tk != "raw" => Some((rf.flatName, tk))
          case _ => None
        }
      case None => Some((SchemaDerivation.Dynamic, "default"))
    }

  /** Paths owned by an `indexed: false` dynamic_object compile to
    * lit(false) (QueryCompiler.dynRoute) — statically no-match, so
    * pruning on them is exact, not merely conservative. */
  private def ownerUnindexed(d: SchemaDerivation, fn: String): Boolean =
    d.dynamicOwner(fn).exists(_._1.fieldType
      .asInstanceOf[graft.config.DynamicObjectField].tokenizer.isEmpty)

  def clauses(ast: Ast, d: SchemaDerivation,
      defaultFields: Option[List[String]] = None): List[Set[Atom]] = {
    val defaults = defaultFields.getOrElse(d.defaultFieldNames)
    def fieldsFor(f: Option[String]): List[String] = f.map(List(_)).getOrElse(defaults)

    def atomFor(fn: String, v: String): FieldAtom = d.byFlatName.get(fn) match {
      // indexed: false fields of ANY type compile to lit(false)
      // (QueryCompiler's unsearchable guard) — statically no-match
      case Some(rf) if !rf.fieldType.indexed => NoMatch
      case Some(rf) => rf.fieldType match {
        case t: TextField => t.tokenizer match {
          case Some(tk) =>
            // tokenizeTerm of a multi-token literal keeps its separators,
            // which no ingest token contains — the atom is then never in
            // any digest AND the compiled array_contains is false, so
            // pruning on it stays exact.
            AtomOf(fn -> TextFunctions.tokenizeTerm(v, tk))
          case None => Unprunable // no terms entry, compiled as raw equality
        }
        case n: NumberField =>
          val parses = if (n.numType == "f64") v.toDoubleOption.isDefined
            else v.toLongOption.isDefined
          if (parses) Unprunable else NoMatch
        case _: BooleanField =>
          if (Set("true", "false")(v.trim.toLowerCase)) Unprunable else NoMatch
        case dt: DateTimeField =>
          // digit-free literals cannot parse the built-in formats; custom
          // strptime patterns (month names etc.) stay conservative
          val builtin = Set("timestamp", "rfc3339", "iso8601", "rfc2822")
          if (v.exists(_.isDigit) || dt.formats.exists(f => !builtin(f)))
            Unprunable
          else NoMatch
        case _: IpField =>
          if (IpCodec.parse(v).isDefined) Unprunable else NoMatch
        case dyn: DynamicObjectField => dyn.tokenizer match {
          // the compiled predicate tokenizes the stored JSON with this
          // tokenizer; the split digest is built over the same stream
          case Some(tk) if tk != "raw" =>
            AtomOf(fn -> TextFunctions.tokenizeTerm(v, tk))
          // raw/None compare against CANONICALIZED JSON text — no digest
          case _ => Unprunable
        }
        case _: StaticObjectField  => NoMatch    // compiled lit(false)
      }
      case None if fn == SchemaDerivation.Dynamic =>
        AtomOf(SchemaDerivation.Dynamic -> TextFunctions.tokenizeTerm(v, "default"))
      case None =>
        // dynamic path: token match prunes via the OWNING digest (a
        // declared dynamic_object prefix owns its paths — the compiled
        // predicate reads that field, so its token digest is the right
        // filter; otherwise the catch-all), but a numeric literal
        // additionally matches by VALUE (canonicalized lexemes) — those
        // stay top
        if (ownerUnindexed(d, fn)) NoMatch // compiled lit(false)
        else if (v.toDoubleOption.isDefined) Unprunable
        else dynDigestRoute(d, fn) match {
          case Some((key, tk)) => AtomOf(key -> TextFunctions.tokenizeTerm(v, tk))
          case None => Unprunable // raw-tokenized owner: no digest stream
        }
    }

    /** None = top (some field matches un-digestably); Some(atoms) = every
      * matching doc holds one of these tokens. All target fields
      * statically non-matching → also top: the compiled predicate is
      * false everywhere, pruning gains nothing and safety costs nothing. */
    def termClause(fs: List[String], v: String): Option[Set[Atom]] = {
      val per = fs.map(atomFor(_, v))
      if (per.contains(Unprunable)) None
      else Some(per.collect { case AtomOf(a) => a }.toSet).filter(_.nonEmpty)
    }

    /** Phrase: per-field all-or-nothing — a field contributes its word
      * tokens only if every word is an achievable token there; any field
      * matchable through a non-token route tops the whole phrase. */
    def phraseClauses(fs: List[String], ws: List[String]): List[Set[Atom]] = {
      val tokenRe = "[\\p{L}\\p{N}]{1,40}".r
      // per field: Some(word tokens) | None (can't match) | top marker
      val per: List[Option[Option[List[String]]]] = fs.map { fn =>
        d.byFlatName.get(fn) match {
          case Some(rf) if !rf.fieldType.indexed => Some(None) // compiled lit(false)
          case Some(rf) => rf.fieldType match {
            case t: TextField => t.tokenizer match {
              case Some(tk) if tk != "raw" =>
                Some(Some(ws.map(TextFunctions.tokenizeTerm(_, tk))))
              case _ => None // raw/untokenized: substring contains — top
            }
            case _ => Some(None) // other types: compiled lit(false)
          }
          case None if ownerUnindexed(d, fn) => Some(None) // compiled lit(false)
          case None => // dynamic path: words per the owning digest's stream
            dynDigestRoute(d, fn) match {
              case None => None // raw-tokenized owner: digest can't see it
              case Some(_) =>
                val toks = ws.map(_.toLowerCase)
                if (toks.forall(t => tokenRe.matches(t))) Some(Some(toks))
                else Some(None) // a non-token word can never appear adjacently
            }
        }
      }
      if (per.contains(None)) return Nil
      val perField: List[(String, List[String])] = fs.zip(per).collect {
        case (fn, Some(Some(toks))) =>
          (d.byFlatName.get(fn) match {
            case Some(_) => fn
            case None    => dynDigestRoute(d, fn)
              .map(_._1).getOrElse(SchemaDerivation.Dynamic)
          }) -> toks
      }
      if (perField.isEmpty) return Nil
      ws.indices.toList.map(i => perField.map { case (f, toks) => f -> toks(i) }.toSet)
    }

    /** Prefix atoms vs the digest's prefix-marker family. Needle
      * normalization mirrors the compiled predicate
      * (QueryCompiler.fieldPrefix) exactly: default/en_stem lowercase
      * it, whitespace and raw compare verbatim, dynamic paths lowercase
      * (default tokenizer). The marker is the needle clamped to
      * [[graft.engine.TermDigest.PrefixMaxLen]] — a token starting with
      * the needle also starts with its first 8 chars, so the clamped
      * marker was inserted at ingest whenever a match exists. Old
      * sidecars without markers answer true to every marker probe
      * (TermDigest.hasPrefixes), keeping the family conservative. */
    def prefixAtomFor(fn: String, v: String): FieldAtom = {
      def atom(field: String, needle: String): FieldAtom =
        if (needle.length < graft.engine.TermDigest.PrefixMinLen) Unprunable
        else AtomOf(field -> graft.engine.TermDigest.prefixKey(
          needle.take(graft.engine.TermDigest.PrefixMaxLen)))
      d.byFlatName.get(fn) match {
        case Some(rf) if !rf.fieldType.indexed => NoMatch // compiled lit(false)
        case Some(rf) => rf.fieldType match {
          case t: TextField => t.tokenizer match {
            case Some("whitespace") | Some("raw") => atom(fn, v)
            case Some(_)                          => atom(fn, v.toLowerCase)
            case None => Unprunable // no terms entry, no digest
          }
          case _ => NoMatch // prefix on non-text compiles to lit(false)
        }
        // dynamic path: the owning digest (declared dynamic_object
        // prefix, else the catch-all); query side lowercases the needle
        case None if ownerUnindexed(d, fn) => NoMatch // compiled lit(false)
        case None => dynDigestRoute(d, fn) match {
          case Some((key, _)) => atom(key, v.toLowerCase)
          case None => Unprunable
        }
      }
    }

    def prefixClause(fs: List[String], v: String): Option[Set[Atom]] = {
      val per = fs.map(prefixAtomFor(_, v))
      if (per.contains(Unprunable)) None
      else Some(per.collect { case AtomOf(a) => a }.toSet).filter(_.nonEmpty)
    }

    def or(a: List[Set[Atom]], b: List[Set[Atom]]): List[Set[Atom]] =
      if (a.isEmpty || b.isEmpty) Nil
      else if (a.length * b.length > MaxClauses) Nil
      else for { ca <- a; cb <- b } yield ca ++ cb

    def walk(a: Ast): List[Set[Atom]] = a match {
      case Ast.Term(f, v) => termClause(fieldsFor(f), v).toList
      case Ast.InSet(f, vs) =>
        val alts = vs.map(termClause(fieldsFor(f), _))
        if (alts.exists(_.isEmpty)) Nil else List(alts.flatten.flatten.toSet)
      case Ast.Phrase(f, ws, _) => phraseClauses(fieldsFor(f), ws)
      case Ast.Prefix(f, v)     => prefixClause(fieldsFor(f), v).toList
      case Ast.Bool(cs) =>
        val musts = cs.collect { case (Occur.Must, x) => walk(x) }
        val shoulds = cs.collect { case (Occur.Should, x) => walk(x) }
        if (musts.nonEmpty) musts.flatten.take(MaxClauses)
        else if (shoulds.nonEmpty) shoulds.reduce(or)
        else Nil
      case Ast.Boost(inner, _) => walk(inner)
      case _ => Nil
    }

    walk(ast)
  }
}

package graft.query

/** Conservative per-field constraint extraction from a query AST, powering
  * manifest-level split pruning beyond the time field (see [[TimeBounds]]):
  *
  *  - [[extractNumeric]]: an interval every matching document's numeric
  *    field must lie in (compared against per-split min/max zone maps);
  *  - [[extractOrdered]]: the same over an ordered string domain (IP
  *    fields, compared as fixed-width hex);
  *  - [[requiredTerms]]: a value set every matching document's raw-
  *    tokenized text field must take a value from (compared against
  *    per-split small-dictionary stats).
  *
  * All extractors (and [[TimeBounds.extract]]) share ONE AST walker,
  * [[FieldBounds.extract]], parameterized over a small constraint lattice
  * — the boolean semantics live in exactly one place. They mirror the
  * compiler's (tantivy's): when ANY Must clause exists, Should clauses
  * are scoring-only and never constrain (the walker keys on Must
  * *clauses*, with "unconstrained" represented in-band as the lattice
  * top, so `+host:web sev:ERROR` cannot treat the optional sev term as
  * required); Should-only queries union, and an unconstrained arm makes
  * the union unconstrained.
  *
  * "Conservative" = when in doubt, the lattice top (no pruning) — pruning
  * must never lose a match. The reference has no split pruning at all
  * (its `time_field` is parsed and unused,
  * `/root/reference/src/config/mod.rs:229-231`); at 100 TB this layer is
  * what keeps a selective query from touching every object on the store.
  */
object FieldBounds {

  /** Constraint domain for one field type: `top` = unconstrained, plus
    * the leaf constructors and the two boolean combiners. Implementations
    * must keep every operation conservative (over-approximate).
    * `prefix` defaults to top — only domains whose order/semantics can
    * exploit a leading-substring constraint override it. */
  trait Lattice[B] {
    def top: B
    def intersect(a: B, b: B): B
    def union(a: B, b: B): B
    def term(v: String): B
    def range(lo: Bound, hi: Bound): B
    def inSet(vs: List[String]): B
    def prefix(v: String): B = top
  }

  /** The single AST walker behind every extractor. */
  def extract[B](ast: Ast, field: String, L: Lattice[B]): B = {
    def walk(a: Ast): B = a match {
      case Ast.Term(Some(f), v) if f == field       => L.term(v)
      case Ast.Range(Some(f), lo, hi) if f == field => L.range(lo, hi)
      case Ast.InSet(Some(f), vs) if f == field     => L.inSet(vs)
      case Ast.Prefix(Some(f), v) if f == field     => L.prefix(v)
      case Ast.Bool(clauses) =>
        val musts = clauses.collect { case (Occur.Must, x) => walk(x) }
        val shoulds = clauses.collect { case (Occur.Should, x) => walk(x) }
        if (musts.nonEmpty) musts.reduce(L.intersect)
        else if (shoulds.nonEmpty) shoulds.reduce(L.union)
        else L.top
      case Ast.Boost(inner, _) => walk(inner)
      case _ => L.top
    }
    walk(ast)
  }

  // ---- numeric (Double interval) domain ----------------------------------

  final case class NumBounds(lo: Option[Double], hi: Option[Double]) {
    def intersect(o: NumBounds): NumBounds = NumBounds(
      Seq(lo, o.lo).flatten.reduceOption(_ max _),
      Seq(hi, o.hi).flatten.reduceOption(_ min _))
    def union(o: NumBounds): NumBounds = NumBounds(
      for (a <- lo; b <- o.lo) yield math.min(a, b),
      for (a <- hi; b <- o.hi) yield math.max(a, b))
    def overlaps(splitMin: Double, splitMax: Double): Boolean =
      lo.forall(_ <= splitMax) && hi.forall(_ >= splitMin)
    def isUnbounded: Boolean = lo.isEmpty && hi.isEmpty
  }
  val Unbounded: NumBounds = NumBounds(None, None)

  /** Parsed numeric literal, rejecting NaN: NaN bounds would make
    * overlaps() unconditionally false and prune splits whose compiled
    * predicate (`=== NaN` is true under Spark's NaN semantics) can match. */
  private def num(v: String): Option[Double] =
    v.toDoubleOption.filterNot(_.isNaN)

  /** Bounds widened one ulp each side; exclusive range bounds treated as
    * inclusive — split pruning only needs an over-approximation. */
  private object NumLattice extends Lattice[NumBounds] {
    def top: NumBounds = Unbounded
    def intersect(a: NumBounds, b: NumBounds): NumBounds = a intersect b
    def union(a: NumBounds, b: NumBounds): NumBounds = a union b
    def term(v: String): NumBounds =
      num(v).map(d => NumBounds(Some(Math.nextDown(d)), Some(Math.nextUp(d))))
        .getOrElse(top)
    def range(lo: Bound, hi: Bound): NumBounds = {
      def b(x: Bound): Option[Double] = x match {
        case Bound.Inclusive(v) => num(v)
        case Bound.Exclusive(v) => num(v)
        case Bound.Unbounded    => None
      }
      NumBounds(b(lo).map(Math.nextDown), b(hi).map(Math.nextUp))
    }
    def inSet(vs: List[String]): NumBounds = {
      val ds = vs.flatMap(num)
      if (ds.nonEmpty && ds.length == vs.length)
        NumBounds(Some(Math.nextDown(ds.min)), Some(Math.nextUp(ds.max)))
      else top
    }
  }

  def extractNumeric(ast: Ast, field: String): NumBounds =
    extract(ast, field, NumLattice)

  // ---- ordered-string domain (canonical-hex IPs) --------------------------

  /** Bounds over an ordered string domain — used for IP fields, whose
    * canonical 16 bytes are compared as fixed-width uppercase hex (string
    * order ≡ unsigned byte order ≡ numeric IP order). Exclusive bounds are
    * treated as inclusive: a strict superset, which is all pruning needs. */
  final case class StrBounds(lo: Option[String], hi: Option[String]) {
    def intersect(o: StrBounds): StrBounds = StrBounds(
      Seq(lo, o.lo).flatten.reduceOption((a, b) => if (a >= b) a else b),
      Seq(hi, o.hi).flatten.reduceOption((a, b) => if (a <= b) a else b))
    def union(o: StrBounds): StrBounds = StrBounds(
      for (a <- lo; b <- o.lo) yield if (a <= b) a else b,
      for (a <- hi; b <- o.hi) yield if (a >= b) a else b)
    def overlaps(splitMin: String, splitMax: String): Boolean =
      lo.forall(_ <= splitMax) && hi.forall(_ >= splitMin)
    def isUnbounded: Boolean = lo.isEmpty && hi.isEmpty
  }
  val UnboundedStr: StrBounds = StrBounds(None, None)

  private final class StrLattice(parse: String => Option[String])
      extends Lattice[StrBounds] {
    def top: StrBounds = UnboundedStr
    def intersect(a: StrBounds, b: StrBounds): StrBounds = a intersect b
    def union(a: StrBounds, b: StrBounds): StrBounds = a union b
    def term(v: String): StrBounds =
      parse(v).map(p => StrBounds(Some(p), Some(p))).getOrElse(top)
    def range(lo: Bound, hi: Bound): StrBounds = {
      def b(x: Bound): Option[String] = x match {
        case Bound.Inclusive(v) => parse(v)
        case Bound.Exclusive(v) => parse(v)
        case Bound.Unbounded    => None
      }
      StrBounds(b(lo), b(hi))
    }
    def inSet(vs: List[String]): StrBounds = {
      val ps = vs.flatMap(parse)
      if (ps.nonEmpty && ps.length == vs.length)
        StrBounds(Some(ps.min), Some(ps.max))
      else top
    }
  }

  /** Extract bounds for a field whose literals map into an ordered string
    * domain via `parse` (unparsable literal → unconstrained). */
  def extractOrdered(ast: Ast, field: String,
      parse: String => Option[String]): StrBounds =
    extract(ast, field, new StrLattice(parse))

  // ---- required-value-set domain (raw-tokenized dictionaries) -------------

  private object TermSetLattice extends Lattice[Option[Set[String]]] {
    def top: Option[Set[String]] = None
    def intersect(a: Option[Set[String]], b: Option[Set[String]]) = (a, b) match {
      case (Some(x), Some(y)) => Some(x intersect y)
      case _                  => a.orElse(b)
    }
    def union(a: Option[Set[String]], b: Option[Set[String]]) =
      for (x <- a; y <- b) yield x union y
    def term(v: String): Option[Set[String]] = Some(Set(v))
    def range(lo: Bound, hi: Bound): Option[Set[String]] = top
    def inSet(vs: List[String]): Option[Set[String]] = Some(vs.toSet)
  }

  /** Some(values): every matching document has `field` equal to one of
    * `values` (raw-tokenizer exact-match semantics). None: unconstrained. */
  def requiredTerms(ast: Ast, field: String): Option[Set[String]] =
    extract(ast, field, TermSetLattice)

  // ---- required-prefix CNF domain (raw-field dictionaries) ----------------

  /** Prefix constraints need CNF, not a flat set: `+f:a* +f:ab*` means
    * the value starts with `a` AND with `ab` — a set intersection (the
    * exact-value algebra) would empty out and wrongly prune docs like
    * "abc". Each clause is a set of ALTERNATIVE prefixes; all clauses
    * must hold. Nil = unconstrained (top); the cross-product union is
    * capped and degrades to top. An exact term is its own prefix, so
    * Term/InSet leaves tighten this domain too. */
  private object PrefixCnfLattice extends Lattice[List[Set[String]]] {
    private val MaxClauses = 16
    def top: List[Set[String]] = Nil
    def intersect(a: List[Set[String]], b: List[Set[String]]) =
      (a ++ b).take(MaxClauses) // dropping clauses only widens
    def union(a: List[Set[String]], b: List[Set[String]]) =
      if (a.isEmpty || b.isEmpty || a.length * b.length > MaxClauses) Nil
      else for { ca <- a; cb <- b } yield ca ++ cb
    def term(v: String): List[Set[String]] = List(Set(v))
    def range(lo: Bound, hi: Bound): List[Set[String]] = Nil
    def inSet(vs: List[String]): List[Set[String]] = List(vs.toSet)
    override def prefix(v: String): List[Set[String]] = List(Set(v))
  }

  /** CNF of prefix alternatives every matching document's `field` value
    * must satisfy (each clause: starts with one of the clause's
    * prefixes). Nil: unconstrained. Consulted against complete raw-field
    * dictionaries, the family that lets `severity:ERR*` skip splits. */
  def requiredPrefixes(ast: Ast, field: String): List[Set[String]] =
    extract(ast, field, PrefixCnfLattice)
}

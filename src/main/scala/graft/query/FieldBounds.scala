package graft.query

/** Conservative per-field constraint extraction from a query AST, powering
  * manifest-level split pruning beyond the time field (see [[TimeBounds]]):
  *
  *  - [[extractNumeric]]: an interval every matching document's numeric
  *    field must lie in (compared against per-split min/max zone maps);
  *  - [[requiredTerms]]: a value set every matching document's raw-
  *    tokenized text field must take a value from (compared against
  *    per-split small-dictionary stats).
  *
  * "Conservative" = when in doubt, unconstrained — pruning must never lose
  * a match. Numeric comparisons happen in Double space; query-side bounds
  * are widened by one ulp so Long→Double rounding (|v| > 2^53) can never
  * shrink the interval. The reference has no split pruning at all (its
  * `time_field` is parsed and unused, `/root/reference/src/config/mod.rs`
  * `:229-231`); at 100 TB this layer is what keeps a selective query from
  * touching every object on the store.
  */
object FieldBounds {

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

  /** Widened one ulp each side: exclusive bounds are treated as inclusive
    * (a strict superset) — split pruning only needs an over-approximation. */
  private def point(v: String): Option[NumBounds] =
    num(v).map(d => NumBounds(Some(Math.nextDown(d)), Some(Math.nextUp(d))))

  def extractNumeric(ast: Ast, field: String): NumBounds = {
    def walk(a: Ast): NumBounds = a match {
      case Ast.Term(Some(f), v) if f == field =>
        point(v).getOrElse(Unbounded)
      case Ast.Range(Some(f), lo, hi) if f == field =>
        val loB = lo match {
          case Bound.Inclusive(v) => num(v).map(Math.nextDown)
          case Bound.Exclusive(v) => num(v).map(Math.nextDown)
          case Bound.Unbounded    => None
        }
        val hiB = hi match {
          case Bound.Inclusive(v) => num(v).map(Math.nextUp)
          case Bound.Exclusive(v) => num(v).map(Math.nextUp)
          case Bound.Unbounded    => None
        }
        NumBounds(loB, hiB)
      case Ast.InSet(Some(f), vs) if f == field =>
        val ds = vs.flatMap(num)
        if (ds.nonEmpty && ds.length == vs.length)
          NumBounds(Some(Math.nextDown(ds.min)), Some(Math.nextUp(ds.max)))
        else Unbounded
      case Ast.Bool(clauses) =>
        val musts = clauses.collect { case (Occur.Must, x) => walk(x) }
        val shoulds = clauses.collect { case (Occur.Should, x) => walk(x) }
        if (musts.nonEmpty) musts.reduce(_ intersect _)
        else if (shoulds.nonEmpty) shoulds.reduce(_ union _)
        else Unbounded
      case Ast.Boost(inner, _) => walk(inner)
      case _ => Unbounded
    }
    walk(ast)
  }

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

  /** Extract bounds for a field whose literals map into an ordered string
    * domain via `parse` (unparsable literal → unconstrained). */
  def extractOrdered(ast: Ast, field: String,
      parse: String => Option[String]): StrBounds = {
    def walk(a: Ast): StrBounds = a match {
      case Ast.Term(Some(f), v) if f == field =>
        parse(v).map(p => StrBounds(Some(p), Some(p))).getOrElse(UnboundedStr)
      case Ast.Range(Some(f), lo, hi) if f == field =>
        val loB = lo match {
          case Bound.Inclusive(v) => parse(v)
          case Bound.Exclusive(v) => parse(v)
          case Bound.Unbounded    => None
        }
        val hiB = hi match {
          case Bound.Inclusive(v) => parse(v)
          case Bound.Exclusive(v) => parse(v)
          case Bound.Unbounded    => None
        }
        StrBounds(loB, hiB)
      case Ast.InSet(Some(f), vs) if f == field =>
        val ps = vs.flatMap(parse)
        if (ps.nonEmpty && ps.length == vs.length)
          StrBounds(Some(ps.min), Some(ps.max))
        else UnboundedStr
      case Ast.Bool(clauses) =>
        val musts = clauses.collect { case (Occur.Must, x) => walk(x) }
        val shoulds = clauses.collect { case (Occur.Should, x) => walk(x) }
        if (musts.nonEmpty) musts.reduce(_ intersect _)
        else if (shoulds.nonEmpty) shoulds.reduce(_ union _)
        else UnboundedStr
      case Ast.Boost(inner, _) => walk(inner)
      case _ => UnboundedStr
    }
    walk(ast)
  }

  /** Some(values): every matching document has `field` equal to one of
    * `values` (raw-tokenizer exact-match semantics). None: unconstrained.
    *
    * Boolean semantics mirror the compiler's (tantivy's): when ANY Must
    * clause exists, Should clauses are optional (scoring-only) and must
    * NOT constrain — the branch keys on the presence of Must *clauses*,
    * not of Must *constraints*, otherwise `+host:web sev:ERROR` would
    * treat the optional sev term as required and prune splits holding
    * real host=web matches. Should-only queries constrain iff EVERY arm
    * constrains (union). */
  def requiredTerms(ast: Ast, field: String): Option[Set[String]] = {
    def walk(a: Ast): Option[Set[String]] = a match {
      case Ast.Term(Some(f), v) if f == field  => Some(Set(v))
      case Ast.InSet(Some(f), vs) if f == field => Some(vs.toSet)
      case Ast.Bool(clauses) =>
        val mustClauses = clauses.collect { case (Occur.Must, x) => x }
        val shouldClauses = clauses.collect { case (Occur.Should, x) => x }
        if (mustClauses.nonEmpty) {
          val cs = mustClauses.flatMap(walk)
          if (cs.nonEmpty) Some(cs.reduce(_ intersect _)) else None
        } else if (shouldClauses.nonEmpty) {
          val cs = shouldClauses.map(walk)
          if (cs.forall(_.isDefined)) Some(cs.flatten.reduce(_ union _))
          else None
        } else None
      case Ast.Boost(inner, _) => walk(inner)
      case _ => None
    }
    walk(ast)
  }
}

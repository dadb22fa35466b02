package graft.query

import graft.functions.TimeParse

/** Conservative time-bound extraction from a query AST for split pruning:
  * computes an interval [lo, hi] (epoch micros, either side optional) that
  * every matching document's time field must satisfy. "Conservative" =
  * when in doubt, unbounded — pruning must never lose a match.
  *
  * The reference parses `time_field` and never uses it
  * (`/root/reference/src/config/mod.rs:229-231`); this is the cheap,
  * high-value upgrade SURVEY §1.1 calls out: with per-split min/max stamps
  * in the manifest, a time-ranged query skips whole splits before any file
  * is opened — the coarse pruning layer above Parquet row-group stats.
  */
object TimeBounds {

  final case class Bounds(lo: Option[Long], hi: Option[Long]) {
    def intersect(o: Bounds): Bounds = Bounds(
      Seq(lo, o.lo).flatten.reduceOption(_ max _),
      Seq(hi, o.hi).flatten.reduceOption(_ min _))
    def union(o: Bounds): Bounds = Bounds(
      for (a <- lo; b <- o.lo) yield math.min(a, b),
      for (a <- hi; b <- o.hi) yield math.max(a, b))
    def overlaps(splitMin: Long, splitMax: Long): Boolean =
      lo.forall(_ <= splitMax) && hi.forall(_ >= splitMin)
  }
  val Unbounded: Bounds = Bounds(None, None)

  def extract(ast: Ast, timeField: String, formats: Seq[String]): Bounds = {
    def parse(v: String): Option[Long] = TimeParse.parseCascade(v, formats)
    def walk(a: Ast): Bounds = a match {
      case Ast.Term(Some(f), v) if f == timeField =>
        parse(v).map(t => Bounds(Some(t), Some(t))).getOrElse(Unbounded)
      case Ast.Range(Some(f), lo, hi) if f == timeField =>
        val loB = lo match {
          case Bound.Inclusive(v) => parse(v)
          case Bound.Exclusive(v) => parse(v).map(_ + 1)
          case Bound.Unbounded    => None
        }
        val hiB = hi match {
          case Bound.Inclusive(v) => parse(v)
          case Bound.Exclusive(v) => parse(v).map(_ - 1)
          case Bound.Unbounded    => None
        }
        Bounds(loB, hiB)
      case Ast.Bool(clauses) =>
        val musts = clauses.collect { case (Occur.Must, x) => walk(x) }
        val shoulds = clauses.collect { case (Occur.Should, x) => walk(x) }
        if (musts.nonEmpty) musts.reduce(_ intersect _)
        else if (shoulds.nonEmpty) shoulds.reduce(_ union _)
        else Unbounded
      case Ast.Boost(inner, _) => walk(inner)
      case Ast.InSet(Some(f), vs) if f == timeField =>
        val ts = vs.flatMap(parse)
        if (ts.nonEmpty && ts.length == vs.length)
          Bounds(Some(ts.min), Some(ts.max))
        else Unbounded
      case _ => Unbounded
    }
    walk(ast)
  }
}

package graft.query

import graft.functions.TimeParse

/** Conservative time-bound extraction from a query AST for split pruning:
  * computes an interval [lo, hi] (epoch micros, either side optional) that
  * every matching document's time field must satisfy. "Conservative" =
  * when in doubt, unbounded — pruning must never lose a match. The AST
  * traversal (including the must/should boolean semantics) is the shared
  * [[FieldBounds.extract]] walker; only the micros domain lives here.
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

  /** Micros lattice: exclusive bounds tighten by exactly one microsecond
    * (the storage precision), unlike the Double domain's ulp widening. */
  private final class MicrosLattice(formats: Seq[String])
      extends FieldBounds.Lattice[Bounds] {
    private def parse(v: String): Option[Long] = TimeParse.parseCascade(v, formats)
    def top: Bounds = Unbounded
    def intersect(a: Bounds, b: Bounds): Bounds = a intersect b
    def union(a: Bounds, b: Bounds): Bounds = a union b
    def term(v: String): Bounds =
      parse(v).map(t => Bounds(Some(t), Some(t))).getOrElse(top)
    def range(lo: Bound, hi: Bound): Bounds = {
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
    }
    def inSet(vs: List[String]): Bounds = {
      val ts = vs.flatMap(parse)
      if (ts.nonEmpty && ts.length == vs.length)
        Bounds(Some(ts.min), Some(ts.max))
      else top
    }
  }

  def extract(ast: Ast, timeField: String, formats: Seq[String]): Bounds =
    FieldBounds.extract(ast, timeField, new MicrosLattice(formats))
}

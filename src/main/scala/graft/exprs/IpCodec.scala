package graft.exprs

/** Pure IPv4/IPv6 parsing and formatting used by the ip field type.
  *
  * Semantics follow the reference engine (tontinton/toshokan,
  * `src/commands/field_parser.rs:150-163`): IPv4 addresses are mapped into
  * the IPv6 space (`::ffff:a.b.c.d`) so all addresses share one 16-byte
  * ordered domain. We store the canonical 16 bytes as `BinaryType`, whose
  * unsigned-lexicographic comparison equals numeric IP order — so range
  * queries compile to plain binary comparisons that Parquet can min/max
  * prune on.
  *
  * Display restores the IPv4 dotted-quad form for IPv4-mapped addresses and
  * emits RFC 5952 canonical text for everything else (matching the
  * reference's output in `tests/config.rs:75-92`).
  */
object IpCodec {

  /** Parse an IPv4 or IPv6 literal to canonical 16 bytes; None if invalid.
    * No DNS resolution ever happens (unlike InetAddress.getByName). */
  def parse(s: String): Option[Array[Byte]] = {
    if (s == null) return None
    val str = s.trim
    if (str.isEmpty) return None
    if (str.contains(':')) parseV6(str) else parseV4(str).map(v4ToMapped)
  }

  private def v4ToMapped(v4: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](16)
    out(10) = 0xff.toByte
    out(11) = 0xff.toByte
    System.arraycopy(v4, 0, out, 12, 4)
    out
  }

  /** Dotted-quad parse, strict: exactly 4 decimal octets 0-255, no leading
    * '+'/'-', no hex, leading zeros allowed (Rust's parser rejects leading
    * zeros since 1.48; we accept them — lenient superset). */
  private def parseV4(s: String): Option[Array[Byte]] = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return None
    val out = new Array[Byte](4)
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return None
      val v = p.toInt
      if (v > 255) return None
      out(i) = v.toByte
      i += 1
    }
    Some(out)
  }

  private def parseV6(s: String): Option[Array[Byte]] = {
    // Split on "::" (at most one occurrence).
    val dcIdx = s.indexOf("::")
    if (dcIdx >= 0 && s.indexOf("::", dcIdx + 1) >= 0) return None

    def groups(part: String): Option[Array[Int]] = {
      if (part.isEmpty) return Some(Array.empty)
      val raw = part.split(":", -1)
      val out = new scala.collection.mutable.ArrayBuffer[Int](raw.length + 1)
      var i = 0
      while (i < raw.length) {
        val g = raw(i)
        if (g.isEmpty) return None
        if (g.contains('.')) {
          // Embedded IPv4, only allowed as the final group.
          if (i != raw.length - 1) return None
          parseV4(g) match {
            case Some(b) =>
              out += (((b(0) & 0xff) << 8) | (b(1) & 0xff))
              out += (((b(2) & 0xff) << 8) | (b(3) & 0xff))
            case None => return None
          }
        } else {
          if (g.length > 4 || !g.forall(c => Character.digit(c, 16) >= 0)) return None
          out += Integer.parseInt(g, 16)
        }
        i += 1
      }
      Some(out.toArray)
    }

    val all: Option[Array[Int]] =
      if (dcIdx < 0) {
        groups(s).filter(_.length == 8)
      } else {
        val left = s.substring(0, dcIdx)
        val right = s.substring(dcIdx + 2)
        for {
          l <- groups(left)
          r <- groups(right)
          if l.length + r.length <= 7 // "::" stands for >= 1 zero group
        } yield l ++ Array.fill(8 - l.length - r.length)(0) ++ r
      }

    all.map { gs =>
      val out = new Array[Byte](16)
      var i = 0
      while (i < 8) {
        out(2 * i) = ((gs(i) >> 8) & 0xff).toByte
        out(2 * i + 1) = (gs(i) & 0xff).toByte
        i += 1
      }
      out
    }
  }

  def isV4Mapped(b: Array[Byte]): Boolean =
    b.length == 16 &&
      (0 until 10).forall(b(_) == 0) &&
      b(10) == 0xff.toByte && b(11) == 0xff.toByte

  /** Canonical display: dotted quad for IPv4-mapped, RFC 5952 otherwise. */
  def format(b: Array[Byte]): String = {
    require(b.length == 16, s"expected 16 bytes, got ${b.length}")
    if (isV4Mapped(b)) {
      s"${b(12) & 0xff}.${b(13) & 0xff}.${b(14) & 0xff}.${b(15) & 0xff}"
    } else {
      val gs = Array.tabulate(8)(i => ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff))
      // RFC 5952: compress the leftmost longest run of >= 2 zero groups.
      var bestStart = -1; var bestLen = 0
      var i = 0
      while (i < 8) {
        if (gs(i) == 0) {
          var j = i
          while (j < 8 && gs(j) == 0) j += 1
          if (j - i > bestLen) { bestStart = i; bestLen = j - i }
          i = j
        } else i += 1
      }
      if (bestLen < 2) { bestStart = -1 }
      val sb = new StringBuilder
      i = 0
      while (i < 8) {
        if (i == bestStart) {
          sb.append(if (i == 0) "::" else ":")
          i += bestLen
        } else {
          sb.append(Integer.toHexString(gs(i)))
          if (i != 7) sb.append(':')
          i += 1
        }
      }
      sb.toString
    }
  }
}

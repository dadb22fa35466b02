package graft.exprs

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2's byte-to-unicode remap (Radford et al. 2019, the `bytes_to_unicode`
  * table in the reference `encoder.py`): every UTF-8 BYTE of the input maps
  * to one printable codepoint — visible ASCII and most of Latin-1 map to
  * themselves; the 68 remaining bytes (controls, space, 0x7F–0xA0, 0xAD)
  * map to U+0100 + running-index, e.g. space → U+0120 'Ġ'. The result is
  * an ordinary string whose CODEPOINTS are the input's BYTES, so the
  * char-level BPE machinery ([[BpeEncode]], [[graft.ops.Bpe]]) becomes
  * byte-level with no change: any input — any script, any binary junk a
  * crawl contains — reduces to a 256-symbol base alphabet and can never
  * fall outside the vocabulary (the byte-fallback property).
  *
  * The map is pure arithmetic on byte values, so an external oracle
  * reproduces it exactly (see the `byteToksSql` fragment in
  * PipelineQueries); all target codepoints sit below U+0800 (no
  * surrogates, no combining marks), so codepoint-indexed `substr`/`length`
  * agree across engines on remapped strings.
  *
  * One virtual call per row, tight loop over the raw UTF-8 bytes (the
  * [[TokenStats]] pattern). Null → null; empty → empty.
  */
case class ByteRemap(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val sb = new java.lang.StringBuilder(bytes.length + 8)
    var i = 0
    while (i < bytes.length) {
      sb.appendCodePoint(ByteRemap.table(bytes(i) & 0xff))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): ByteRemap =
    copy(child = c)
  override def prettyName: String = "byte_remap"
}

object ByteRemap {
  /** byte value → remapped codepoint. Identity on {33..126, 161..172,
    * 174..255}; the excluded 68 bytes get 256 + their index in increasing
    * byte order: 0..32 → 256+b, 127..160 → b+162, 173 → 323. */
  val table: Array[Int] = Array.tabulate(256) { b =>
    if ((b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174)) b
    else if (b <= 32) 256 + b
    else if (b <= 160) b + 162
    else 323 // b == 173 (soft hyphen), the last excluded byte
  }
}

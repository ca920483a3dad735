package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML-entity unescape as a native Catalyst expression — the engine
  * analog of Python `html.unescape`, which the reference applies to
  * every scraped text field (reference: scrapers_v2/data_quality/
  * cleaning.py:21-32).
  *
  * One left-to-right scan per row (single-pass, like Python's regex
  * substitution — a replace CHAIN has subtly different semantics on
  * nested refs like `&amp;lt;`, which single-pass leaves as `&lt;`):
  *
  *  - numeric refs `&#NNN;` / `&#xHH;` (terminating `;` optional,
  *    exactly as Python's `#[0-9]+;?` pattern): decoded per the WHATWG
  *    rules CPython implements — the 0x80–0x9F range maps through the
  *    windows-1252 table, NUL and out-of-range/surrogate refs become
  *    U+FFFD, other C0/C1 controls and noncharacters decode to
  *    nothing, everything else is the Unicode code point;
  *  - the named subset scraped event pages actually contain (the same
  *    list the previous replace chain handled; full HTML5 named-ref
  *    parity would embed the ~2200-entry table for entities no event
  *    page uses). Named refs REQUIRE the `;` — Python's
  *    semicolon-less legacy named forms (`&ampx` → `&x`) are out of
  *    scope. `&nbsp;` maps to a plain space (kept from the chain: the
  *    downstream whitespace normalizer treats it as one anyway);
  *  - a lone `&` that heads no recognized ref passes through.
  *
  * Stays inside whole-stage codegen: defineCodeGen emits one static
  * call; the scan allocates only when the text actually contains `&`
  * (the common no-entity row returns the input UTF8String untouched).
  */
object HtmlUnescapeImpl {

  /** windows-1252 mapping for numeric refs 0x80-0x9F (WHATWG charref
    * rules; CPython html._invalid_charrefs). Index = code - 0x80.
    */
  private val Cp1252: Array[Int] = Array(
    0x20ac, 0x81, 0x201a, 0x0192, 0x201e, 0x2026, 0x2020, 0x2021,
    0x02c6, 0x2030, 0x0160, 0x2039, 0x0152, 0x8d, 0x017d, 0x8f,
    0x90, 0x2018, 0x2019, 0x201c, 0x201d, 0x2022, 0x2013, 0x2014,
    0x02dc, 0x2122, 0x0161, 0x203a, 0x0153, 0x9d, 0x017e, 0x0178)

  /** C0/C1 controls (minus the charref-mapped ones) and noncharacters
    * decode to the EMPTY string (CPython html._invalid_codepoints).
    */
  private def isInvalidCodepoint(cp: Int): Boolean =
    (cp >= 0x01 && cp <= 0x08) || (cp >= 0x0e && cp <= 0x1f) ||
      (cp >= 0x7f && cp <= 0x9f) ||
      (cp >= 0xfdd0 && cp <= 0xfdef) || (cp & 0xfffe) == 0xfffe

  private val named: Array[(String, String)] = Array(
    "lt;" -> "<", "gt;" -> ">", "quot;" -> "\"", "apos;" -> "'",
    "amp;" -> "&", "nbsp;" -> " ", "euro;" -> "€",
    "pound;" -> "£", "hellip;" -> "…", "ndash;" -> "–",
    "mdash;" -> "—")

  /** Decode one numeric charref per the WHATWG/CPython rules. */
  private def decodeNumeric(cp: Int, sb: java.lang.StringBuilder): Unit = {
    if (cp == 0x00) sb.append('�')
    else if (cp == 0x0d) sb.append('\r')
    else if (cp >= 0x80 && cp <= 0x9f) sb.appendCodePoint(Cp1252(cp - 0x80))
    else if ((cp >= 0xd800 && cp <= 0xdfff) || cp > 0x10ffff) sb.append('�')
    else if (isInvalidCodepoint(cp)) () // decodes to nothing
    else sb.appendCodePoint(cp)
  }

  def unescape(text: UTF8String): UTF8String = {
    val s = text.toString
    if (s.indexOf('&') < 0) return text
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val ch = s.charAt(i)
      if (ch != '&') { sb.append(ch); i += 1 }
      else if (i + 1 < n && s.charAt(i + 1) == '#') {
        // numeric ref: &#ddd;? or &#xHH;? — at least one digit required
        var j = i + 2
        val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
        if (hex) j += 1
        val digits0 = j
        var cp = 0L
        while (j < n && {
          val c = s.charAt(j)
          if (hex) (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
            (c >= 'A' && c <= 'F')
          else c >= '0' && c <= '9'
        }) {
          if (cp <= 0x10ffff) // clamp: past max it's U+FFFD regardless
            cp = cp * (if (hex) 16 else 10) + Character.digit(s.charAt(j), 16)
          j += 1
        }
        if (j == digits0) { sb.append(ch); i += 1 } // "&#" alone: literal
        else {
          decodeNumeric(math.min(cp, 0x110000L).toInt, sb)
          i = if (j < n && s.charAt(j) == ';') j + 1 else j
        }
      } else {
        // named ref from the subset; require the full "name;" form
        var matched = -1
        var k = 0
        while (matched < 0 && k < named.length) {
          if (s.startsWith(named(k)._1, i + 1)) matched = k
          k += 1
        }
        if (matched >= 0) {
          sb.append(named(matched)._2)
          i += 1 + named(matched)._1.length
        } else { sb.append(ch); i += 1 }
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

case class HtmlUnescape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    HtmlUnescapeImpl.unescape(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HtmlUnescapeImpl$$.MODULE$$.unescape($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlUnescape =
    copy(child = newChild)
}

object HtmlUnescape {
  def htmlUnescape(text: Column): Column =
    ColumnBridge.column(HtmlUnescape(ColumnBridge.expression(text)))
}

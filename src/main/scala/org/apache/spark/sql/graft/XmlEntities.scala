package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DTD named-entity expansion for DBLP-style XML ingest.
  *
  * The real `dblp.xml` encodes accented characters as NAMED entity
  * references (`J&uuml;rgen`) declared in its DTD — the public ISO 8879
  * "Added Latin 1" set (the HTMLlat1 table: one name per ISO-8859-1 code
  * point 160–255). Spark's native XML source parses without the DTD, so
  * those references reach the parser undefined and the affected records
  * decode wrong (reference: dblpXMLparser.scala:14,24 sidesteps this via
  * `XML.loadFile`'s DTD handling). This expression resolves them AHEAD of
  * the XML parse, per task, in one pass.
  *
  * Deliberately NOT expanded: the five XML built-ins (`&amp; &lt; &gt;
  * &quot; &apos;`) — they are structural and belong to the XML parser —
  * and numeric character references (`&#233;`), which every XML parser
  * resolves natively. Unknown names pass through verbatim (the parser
  * will complain, which is the honest failure).
  *
  * A native Catalyst expression (not a UDF): null-intolerant, codegen'd
  * as a single static call, zero-copy on the entity-free fast path —
  * the common case (most lines carry no `&` at all) costs one byte
  * scan and no allocation. */
object XmlEntities {

  /** ISO 8879 "Added Latin 1" entity names, in code-point order 160–255
    * (the full public HTMLlat1 table — a SUPERSET of what dblp.dtd
    * declares: the DTD picks 65 of these names, e.g. `Agrave`..`yuml`
    * plus `reg`/`micro`/`times`; the remainder — `nbsp`, `copy`,
    * `sect`, … — resolve here too, by the standard table, where the
    * reference's parser would reject them as undeclared). */
  private val latin1Names: Array[String] = Array(
    "nbsp", "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect",
    "uml", "copy", "ordf", "laquo", "not", "shy", "reg", "macr",
    "deg", "plusmn", "sup2", "sup3", "acute", "micro", "para", "middot",
    "cedil", "sup1", "ordm", "raquo", "frac14", "frac12", "frac34", "iquest",
    "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring", "AElig", "Ccedil",
    "Egrave", "Eacute", "Ecirc", "Euml", "Igrave", "Iacute", "Icirc", "Iuml",
    "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc", "Otilde", "Ouml", "times",
    "Oslash", "Ugrave", "Uacute", "Ucirc", "Uuml", "Yacute", "THORN", "szlig",
    "agrave", "aacute", "acirc", "atilde", "auml", "aring", "aelig", "ccedil",
    "egrave", "eacute", "ecirc", "euml", "igrave", "iacute", "icirc", "iuml",
    "eth", "ntilde", "ograve", "oacute", "ocirc", "otilde", "ouml", "divide",
    "oslash", "ugrave", "uacute", "ucirc", "uuml", "yacute", "thorn", "yuml")

  /** name → replacement string (one char, code point 160 + index). */
  private val byName: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](256)
    var i = 0
    while (i < latin1Names.length) {
      m.put(latin1Names(i), String.valueOf((160 + i).toChar))
      i += 1
    }
    m
  }

  /** Longest name in the table ("brvbar"/"plusmn"/"frac12" = 6). */
  private val MaxNameLen = 6

  /** One-pass expansion; returns `s` itself when it carries no
    * expandable reference (zero allocation on the fast path). */
  def expand(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    var sb: java.lang.StringBuilder = null
    var from = 0
    while (i >= 0) {
      val semi = s.indexOf(';', i + 1)
      val repl =
        if (semi > i + 1 && semi - i - 1 <= MaxNameLen)
          byName.get(s.substring(i + 1, semi))
        else null
      if (repl != null) {
        if (sb == null) sb = new java.lang.StringBuilder(s.length)
        sb.append(s, from, i).append(repl)
        from = semi + 1
        i = s.indexOf('&', from)
      } else i = s.indexOf('&', i + 1)
    }
    if (sb == null) s
    else { sb.append(s, from, s.length); sb.toString }
  }

  private val Amp = UTF8String.fromString("&")

  /** UTF8String seam the codegen calls — identity (TRULY no allocation:
    * a byte scan for '&' gates the decode) when the string holds no
    * reference at all; the decode+expand path runs only on lines that
    * carry one. */
  def expandUtf8(u: UTF8String): UTF8String = {
    if (u.indexOf(Amp, 0) < 0) return u
    val s = u.toString
    val e = expand(s)
    if (e eq s) u else UTF8String.fromString(e)
  }

  /** Column form: `expandXmlEntities(col("value"))`. */
  def expandXmlEntities(c: Column): Column =
    ExpressionUtils.column(ExpandXmlEntities(ExpressionUtils.expression(c)))
}

/** See [[XmlEntities]]. */
case class ExpandXmlEntities(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def prettyName: String = "graft_expand_xml_entities"

  override protected def nullSafeEval(input: Any): Any =
    XmlEntities.expandUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.XmlEntities.expandUtf8($c)")

  override protected def withNewChildInternal(
      newChild: Expression): ExpandXmlEntities = copy(child = newChild)
}

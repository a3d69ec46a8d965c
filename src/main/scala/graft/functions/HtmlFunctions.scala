package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.htmlx.{Entities, HtmlParser, HNode, HElement, HText, HParent}
import graft.extract.Extractor

/** Standalone scalar surface of the engine (SURVEY.md §2B "Scalar
  * functions"): the char-ref decoder (reference ops #11/#12) and the
  * parse-based text functions, exposed as native Catalyst expressions and
  * SQL-registered functions. Row-at-a-time `Expression`s are fine here —
  * these are scalar string functions, not the per-document pipeline (which
  * stays a typed mapPartitions stage; SURVEY.md §2B "UDF surface").
  */
object HtmlFunctions {

  /** Decode HTML character references in free text (data-state rules:
    * legacy named refs without semicolons decode; the attribute-value
    * exception does not apply). */
  def decodeEntitiesString(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(s, 0, i)
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else if (i + 1 >= n) { sb.append('&'); i += 1 }
      else {
        val d = s.charAt(i + 1)
        if (d == '#') {
          // numeric — shared parser (Entities.parseNumeric) with the
          // tokenizer so clamp/overflow rules cannot drift
          val (consumed, repl, _) = Entities.parseNumeric(s, i + 1)
          if (consumed == 0) { sb.append('&'); i += 1 }
          else { sb.append(repl); i = i + 1 + consumed }
        } else if (d == '&' || d == '<' || d == '\u0000' || d == ' ' || d == '\t' ||
                   d == '\n' || d == '\f') {
          sb.append('&'); i += 1
        } else {
          val (len, value, _) = Entities.longestMatch(s, i + 1)
          if (len == 0) { sb.append('&'); i += 1 }
          else { sb.append(value); i = i + 1 + len }
        }
      }
    }
    sb.toString
  }

  /** All rendered text of the document (innerText-ish: script/style/head
    * excluded, block boundaries → '\n'). */
  def stripHtmlString(html: String): String = {
    val doc = HtmlParser.parseDocumentReusing(html).doc
    val blocks = Extractor.segment(doc)
    blocks.map(_.text).mkString("\n")
  }

  /** Main-content extraction as a scalar (same engine as the pipeline). */
  def extractMainString(html: String): String =
    Extractor.extract(HtmlParser.parseDocumentReusing(html).doc).text

  // ---------------------------------------------------- Catalyst exprs

  abstract class StringMapExpression extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    protected def mapString(s: String): String
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(mapString(v.asInstanceOf[UTF8String].toString))
  }

  case class DecodeHtmlEntities(child: Expression) extends StringMapExpression {
    protected def mapString(s: String): String = decodeEntitiesString(s)
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
    override def prettyName: String = "decode_entities"
  }

  case class StripHtml(child: Expression) extends StringMapExpression {
    protected def mapString(s: String): String = stripHtmlString(s)
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
    override def prettyName: String = "strip_html"
  }

  case class ExtractMain(child: Expression) extends StringMapExpression {
    protected def mapString(s: String): String = extractMainString(s)
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
    override def prettyName: String = "extract_main"
  }

  /** Document title: text of the first HTML-namespace `<title>` (RCDATA —
    * entities decoded by the tokenizer), whitespace-normalized. Empty string
    * when absent. */
  case class ExtractTitle(child: Expression) extends StringMapExpression {
    protected def mapString(s: String): String = {
      val doc = HtmlParser.parseDocumentReusing(s).doc
      graft.htmlx.Dom.title(doc)
        .map(t => Extractor.normalizeWs(t).trim).getOrElse("")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
    override def prettyName: String = "extract_title"
  }

  /** Link-graph edges of a page: array<struct<href,text>> in DOM order
    * (Extractor.links over the full engine). */
  case class ExtractLinks(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("href", StringType, nullable = false),
          org.apache.spark.sql.types.StructField("text", StringType, nullable = false))),
        containsNull = false)
    override def prettyName: String = "extract_links"
    override def nullSafeEval(v: Any): Any = {
      val doc = HtmlParser.parseDocumentReusing(v.asInstanceOf[UTF8String].toString).doc
      val ls = Extractor.links(doc)
      val rows = new Array[Any](ls.length)
      var i = 0
      while (i < ls.length) {
        rows(i) = org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(ls(i)._1), UTF8String.fromString(ls(i)._2))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Document heading outline: array<struct<level:int, heading:string>> —
    * every HTML-namespace `<h1>`…`<h6>` in DOM order, text
    * whitespace-normalized like [[ExtractTitle]] (foreign-content `<title>`
    * etc. excluded: heading rank is an HTML-namespace concept). The
    * training-data use: section structure for document chunking and a
    * quality signal (outline depth/coverage). */
  case class ExtractHeadings(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      ArrayType(StructType(Seq(
        StructField("level", IntegerType, nullable = false),
        StructField("heading", StringType, nullable = false))),
        containsNull = false)
    override def prettyName: String = "extract_headings"
    override def nullSafeEval(v: Any): Any = {
      val doc = HtmlParser.parseDocumentReusing(v.asInstanceOf[UTF8String].toString).doc
      val out = new scala.collection.mutable.ArrayBuffer[Any](8)
      graft.htmlx.Dom.elements(doc).foreach { e =>
        if (e.isHtmlNs && e.name.length == 2 && e.name.charAt(0) == 'h' &&
            e.name.charAt(1) >= '1' && e.name.charAt(1) <= '6') {
          val txt = Extractor.normalizeWs(graft.htmlx.Dom.textContent(e)).trim
          out += org.apache.spark.sql.catalyst.InternalRow(
            e.name.charAt(1) - '0', UTF8String.fromString(txt))
        }
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Page metadata: array<struct<name:string, content:string>> — every
    * HTML-namespace `<meta>` carrying BOTH a key attribute (`name`,
    * `property`, or `http-equiv` — first present wins, lowercased; the
    * OpenGraph convention rides `property`) and a `content` attribute, in
    * DOM order with duplicates preserved (first-wins collapsing is a
    * caller-side `map_from_entries`/`min_by` away; the raw stream is the
    * lossless form). Attribute values arrive entity-decoded by the
    * tokenizer. `<meta charset>` is a byte-decoding directive, not page
    * metadata — excluded (the decode ladder consumes it:
    * [[graft.htmlx.CharsetSniff]]). */
  case class ExtractMeta(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      ArrayType(StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("content", StringType, nullable = false))),
        containsNull = false)
    override def prettyName: String = "extract_meta"
    override def nullSafeEval(v: Any): Any = {
      val doc = HtmlParser.parseDocumentReusing(v.asInstanceOf[UTF8String].toString).doc
      val out = new scala.collection.mutable.ArrayBuffer[Any](8)
      graft.htmlx.Dom.elements(doc).foreach { e =>
        if (e.isHtmlNs && e.name == "meta") {
          val key = e.attr("name").orElse(e.attr("property")).orElse(e.attr("http-equiv"))
          (key, e.attr("content")) match {
            case (Some(k), Some(c)) =>
              out += org.apache.spark.sql.catalyst.InternalRow(
                UTF8String.fromString(k.toLowerCase(java.util.Locale.ROOT)),
                UTF8String.fromString(c))
            case _ => ()
          }
        }
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  import org.apache.spark.sql.GraftShim.{column => toCol, expression => toExpr}
  def decode_entities(c: Column): Column = toCol(DecodeHtmlEntities(toExpr(c)))
  def strip_html(c: Column): Column = toCol(StripHtml(toExpr(c)))
  def extract_main(c: Column): Column = toCol(ExtractMain(toExpr(c)))
  def extract_links(c: Column): Column = toCol(ExtractLinks(toExpr(c)))
  def extract_title(c: Column): Column = toCol(ExtractTitle(toExpr(c)))
  def extract_headings(c: Column): Column = toCol(ExtractHeadings(toExpr(c)))
  def extract_meta(c: Column): Column = toCol(ExtractMeta(toExpr(c)))

  /** SQL registration: `SELECT decode_entities(col) ...`. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("decode_entities", es => DecodeHtmlEntities(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("strip_html", es => StripHtml(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("extract_main", es => ExtractMain(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("extract_links", es => ExtractLinks(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("extract_title", es => ExtractTitle(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("extract_headings", es => ExtractHeadings(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("extract_meta", es => ExtractMeta(es.head), "scala_udf")
  }
}

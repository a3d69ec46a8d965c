package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.pipeline.SparkEnv

/** Native Catalyst expression surface: decode_entities / strip_html /
  * extract_main, Column API + SQL registration. */
class FunctionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkEnv.session("local[2]", "graft-fn-test", shufflePartitions = 4)
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("decodeEntitiesString matches tokenizer semantics") {
    val f = HtmlFunctions.decodeEntitiesString _
    assert(f("A &amp; B") == "A & B")
    assert(f("&notin; &not &notx") == "∉ ¬ ¬x")
    assert(f("&#65;&#x42;&#67") == "ABC")
    assert(f("&#x80;") == "€")
    assert(f("&#0; &#xD800; &#x110000;") == "� � �")
    assert(f("&bogus; & &") == "&bogus; & &")
    assert(f("no refs at all") == "no refs at all")
    assert(f("&#;") == "&#;")
  }

  test("SQL-registered functions work end to end") {
    import spark.implicits._
    HtmlFunctions.register(spark)
    Seq(("<html><body><p>Tom &amp; Jerry run through fields of tall grass " +
      "chasing each other around the garden all afternoon long today</p>" +
      "<nav><a href='/'>home</a></nav></body></html>", 1))
      .toDF("html", "id").createOrReplaceTempView("pages_v")
    val decoded = spark.sql("SELECT decode_entities('x &lt; y') AS d").head().getString(0)
    assert(decoded == "x < y")
    val main = spark.sql("SELECT extract_main(html) AS t FROM pages_v").head().getString(0)
    assert(main.startsWith("Tom & Jerry") && !main.contains("home"))
    val all = spark.sql("SELECT strip_html(html) AS t FROM pages_v").head().getString(0)
    assert(all.contains("Tom & Jerry") && all.contains("home"))
    val title = spark.sql(
      "SELECT extract_title('<title> A &amp;  B </title>') AS t").head().getString(0)
    assert(title == "A & B")
    val links = spark.sql("SELECT extract_links(html) AS l FROM pages_v")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(links.map(r => (r.getString(0), r.getString(1))) == Seq(("/", "home")))
  }

  test("extract_headings: rank, DOM order, normalization, exclusions") {
    import spark.implicits._
    val html =
      "<body><h1> Top &amp;\n <b>bold</b> title </h1>" +
        "<h7>not a heading</h7>" +               // unknown element: excluded
        "<svg><title>chart</title></svg>" +      // foreign title: excluded
        "<section><h3></h3><h2>Mid</h2></section>" + // empty heading kept, order by DOM
        "<h6>deep</h6></body>"
    val rows = Seq(html).toDF("html")
      .select(HtmlFunctions.extract_headings(org.apache.spark.sql.functions.col("html")).as("h"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getString(1)))
    assert(rows == Seq((1, "Top & bold title"), (3, ""), (2, "Mid"), (6, "deep")))
    HtmlFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT extract_headings('<h2>a</h2>') AS h").head().getSeq[org.apache.spark.sql.Row](0)
    assert(viaSql.map(r => (r.getInt(0), r.getString(1))) == Seq((2, "a")))
  }

  test("extract_meta: key precedence, lowercasing, exclusions, duplicates") {
    import spark.implicits._
    val html =
      "<head><meta charset=\"utf-8\">" +                     // decode directive: excluded
        "<META NAME=\"Description\" CONTENT=\"A &amp; B\">" + // tag/attr case-folded by tokenizer; VALUE case kept
        "<meta name=\"x\" property=\"og:x\" content=\"name wins\">" +
        "<meta property=\"og:title\" content=\"T\">" +
        "<meta http-equiv=\"Refresh\" content=\"30\">" +
        "<meta name=\"keywords\">" +                          // no content: excluded
        "<meta content=\"orphan\"></head>" +                  // no key: excluded
        "<body><meta name=\"description\" content=\"dup kept\"></body>"
    val rows = Seq(html).toDF("html")
      .select(HtmlFunctions.extract_meta(org.apache.spark.sql.functions.col("html")).as("m"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows == Seq(
      ("description", "A & B"),
      ("x", "name wins"),
      ("og:title", "T"),
      ("refresh", "30"),
      ("description", "dup kept")))
  }

  test("expression is null-safe") {
    import spark.implicits._
    val out = Seq[Option[String]](None, Some("&amp;")).toDF("s")
      .select(HtmlFunctions.decode_entities(org.apache.spark.sql.functions.col("s")).as("d"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(None, Some("&")))
  }
}

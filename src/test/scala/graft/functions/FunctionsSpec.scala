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

  test("expression is null-safe") {
    import spark.implicits._
    val out = Seq[Option[String]](None, Some("&amp;")).toDF("s")
      .select(HtmlFunctions.decode_entities(org.apache.spark.sql.functions.col("s")).as("d"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(None, Some("&")))
  }
}

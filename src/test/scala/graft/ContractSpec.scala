package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every query has an oracle and the source map
  * literals contain no silently-shadowed duplicate keys (Scala keeps the
  * last — ADVICE r01 found two such shadows). */
class ContractSpec extends AnyFunSuite {

  private lazy val src = new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")), "UTF-8")

  test("every query has an oracle and vice versa") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      s"asymmetric: ${SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)} / " +
        s"${SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)}")
  }

  test("no duplicate keys shadowed in the source map literals") {
    for (marker <- Seq("def queries", "def oracleSql")) {
      val dups = graft.tools.ContractCheck.duplicateKeys(src, marker)
      assert(dups.isEmpty, s"shadowed keys under $marker: $dups")
    }
  }

  test("oracle SQL references only driver-provided tables") {
    val known = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val fromRe = """(?i)(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)\b""".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // strip CTE names: "x AS (" or "x(cols) AS (" at clause starts,
      // with or without a leading WITH [RECURSIVE]
      val cteRe = """(?im)^\s*,?\s*([a-z0-9_]+)\s*(?:\([^)]*\))?\s+AS\s+\(""".r
      val withRe = """(?i)WITH\s+(?:RECURSIVE\s+)?([a-z0-9_]+)\s*(?:\([^)]*\))?\s+AS\s+\(""".r
      val ctes = (cteRe.findAllMatchIn(sql).map(_.group(1)) ++
        withRe.findAllMatchIn(sql).map(_.group(1))).toSet
      fromRe.findAllMatchIn(sql).map(_.group(1)).foreach { t =>
        assert(known.contains(t) || ctes.contains(t),
          s"$name references unknown table '$t' (tables: $known; CTEs: $ctes)")
      }
    }
  }
}

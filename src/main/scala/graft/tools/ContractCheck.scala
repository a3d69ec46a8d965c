package graft.tools

/** Contract self-check: every query has an oracle, no silently-shadowed
  * duplicate keys in the source literal (Scala keeps the last), names line
  * up. Run standalone; also wired as a unit test. */
object ContractCheck {
  def duplicateKeys(src: String, mapStart: String): Seq[String] = {
    val start = src.indexOf(mapStart)
    require(start >= 0, s"marker not found: $mapStart")
    val tail = src.substring(start)
    val end = tail.indexOf("\n  )")
    val body = if (end >= 0) tail.substring(0, end) else tail
    val key = """"([a-z0-9_]+)" ->""".r
    val keys = key.findAllMatchIn(body).map(_.group(1)).toSeq
    keys.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }.toSeq.sorted
  }

  def main(args: Array[String]): Unit = {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")), "UTF-8")
    val dupQ = duplicateKeys(src, "def queries")
    val dupO = duplicateKeys(src, "def oracleSql")
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println(s"dup query keys: $dupQ")
    println(s"dup oracle keys: $dupO")
    println(s"queries without oracle: ${(q -- o).toSeq.sorted}")
    println(s"oracles without query: ${(o -- q).toSeq.sorted}")
    if (dupQ.nonEmpty || dupO.nonEmpty || (q -- o).nonEmpty || (o -- q).nonEmpty) sys.exit(1)
    println("CONTRACT OK")
  }
}

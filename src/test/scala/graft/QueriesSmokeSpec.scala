package graft

/** Every registered query runs end-to-end at the smoke scale and the
  * driver contract holds: entry() is non-empty, names are unique, every
  * oracle key has a query. */
class QueriesSmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("contract: unique names, oracles subset of queries") {
    val names = SparkEntry.allSpecs.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("registry completeness: every source query literal registered, count pinned") {
    // a query that falls out of SparkEntry.allSpecs doesn't FAIL the
    // driver's correctness gate — it silently vanishes from it and looks
    // green by absence. Two tripwires: (1) every "qNN_*" literal in the
    // queries sources must be a registered name; (2) the total is pinned,
    // so adding or removing a query is always a deliberate edit here too.
    import scala.jdk.CollectionConverters._
    val srcRoot = java.nio.file.Paths.get("src/main/scala/graft/queries")
    assert(java.nio.file.Files.isDirectory(srcRoot),
      s"query sources not found at $srcRoot (cwd moved?)")
    val pat = java.util.regex.Pattern.compile("\"(q\\d+[a-z]?_[a-z0-9_]+)\"")
    val inSource = java.nio.file.Files.walk(srcRoot).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val m = pat.matcher(java.nio.file.Files.readString(p))
        Iterator.continually(m).takeWhile(_.find()).map(_.group(1)).toList
      }.toSet
    val registered = SparkEntry.queries.keySet
    val lost = inSource -- registered
    assert(lost.isEmpty, s"query names in source but not registered: $lost")
    assert(registered.size === 167,
      s"registry count drifted to ${registered.size} — if a query was " +
        "added/removed deliberately, bump this pin in the same commit")
  }

  test("entry: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q105: per-partition sketch union is a sound incremental estimator") {
    val row = SparkEntry.queries("q105_sketch_union")(spark, sf).head()
    assert(row.getAs[Boolean]("union_near_full"),
      "union of per-year sketches drifted >1% from the one-shot sketch")
    assert(row.getAs[Boolean]("within_3pct"),
      "sketch estimate drifted >3% from the exact distinct count")
  }

  for (q <- SparkEntry.allSpecs)
    test(s"${q.name} runs at sf0.001") {
      assert(q.run(spark, sf).count() >= 0)
    }
}

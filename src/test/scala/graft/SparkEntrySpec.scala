package graft

/** Driver-contract smoke: the three surfaces the harness actually
  * calls (`entry`, `queries`, `oracleSql`) — a regression here fails
  * the driver's gate before any per-query check runs.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key maps to a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("registry names are unique and well-formed") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.size == names.distinct.size)
    // one registry convention: qNN[letter]_snake_case — the driver
    // parses nothing from the name, but the repo's docs cross-link on
    // this shape
    names.foreach { n =>
      assert(n.matches("q\\d+[a-z]?_[a-z0-9_]+"), s"odd name: $n")
    }
  }
}

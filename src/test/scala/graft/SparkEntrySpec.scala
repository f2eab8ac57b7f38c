package graft

/** Driver-contract smoke: the three surfaces the harness actually
  * calls (`entry`, `queries`, `oracleSql`) — a regression here fails
  * the driver's gate before any per-query check runs.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("only the two declared rows-only queries lack an oracle") {
    // the driver records a weaker rows-only check for these (gradient
    // training is inherently not SQL-reproducible), each with a
    // separately oracle-checked deterministic core (q43b/q45b); q44
    // joined the oracle-checked set in round 7 via the real BMP/WAV/
    // PPM codecs. ANY other query registered without an oracle is a
    // coverage regression, not a design decision
    val declared = Set("q43_ann_ivf_kmeans", "q45_als_recommendations")
    val noOracle = SparkEntry.queries.keySet
      .diff(SparkEntry.oracleSql.keySet)
    assert(noOracle == declared, s"undeclared rows-only: " +
      s"${noOracle.diff(declared)}; missing: ${declared.diff(noOracle)}")
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

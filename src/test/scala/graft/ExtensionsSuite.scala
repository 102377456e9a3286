package graft

import org.scalatest.funsuite.AnyFunSuite

/** The config-string installation path for the extensions: a session built
  * with only `spark.sql.extensions=graft.plans.GraftExtensions` (no
  * programmatic withExtensions) must resolve every custom function. */
class ExtensionsSuite extends AnyFunSuite {

  test("spark.sql.extensions config string installs all graft functions") {
    // newSession() shares the SparkContext but NOT the injected functions;
    // extensions-by-config apply at session instantiation, so build one
    // explicitly the way spark-submit --conf would.
    val base = SparkSpec.session
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    // getOrCreate may return the existing extended session — either way the
    // functions must resolve through plain SQL:
    val row = s.sql(
      """SELECT size(minhash_sig('a b c d')) AS m,
        |       size(shingle_set('a b c d')) AS s,
        |       cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       rh_sig(array(1.0D, -1.0D)) AS r,
        |       rolling_hash('abc') AS h""".stripMargin).collect()(0)
    assert(row.getInt(0) == 64)
    assert(row.getInt(1) == 2)
    assert(row.getDouble(2) == 1.0)
    assert(row.getLong(4) == (("a".codePointAt(0) * 31L + 'b'.toInt) * 31 + 'c'.toInt) % 2147483647L)
    assert(base.version == s.version)
  }
}

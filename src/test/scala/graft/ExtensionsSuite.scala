package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions=graft.plans.GraftExtensions` installation path.
  *
  * A fresh JVM-per-session isn't available under ScalaTest (the shared
  * SparkContext would have to be torn down), so this suite proves the exact
  * contract Spark's config-string loader relies on instead of pretending to
  * exercise it end-to-end: the class must be loadable by name, have a public
  * zero-arg constructor, be a `SparkSessionExtensions => Unit`, and register
  * every graft function when applied — which is precisely what
  * `SparkSession.applyExtensions` does with the config value. Resolution
  * through a live session is covered separately via the programmatic path.
  */
class ExtensionsSuite extends AnyFunSuite {

  test("GraftExtensions instantiates reflectively like the config-string loader") {
    // Mimic SparkSession.applyExtensions: Class.forName on the conf value,
    // zero-arg constructor, cast to Function1, apply to a fresh extensions
    // object. Any failure here is exactly a failure of
    // --conf spark.sql.extensions=graft.plans.GraftExtensions.
    val instance = Class.forName("graft.plans.GraftExtensions")
      .getDeclaredConstructor().newInstance()
    val f = instance.asInstanceOf[SparkSessionExtensions => Unit]
    val ext = new SparkSessionExtensions
    f(ext) // must not throw; registers all injectedFunctions
  }

  test("injected functions resolve through plain SQL") {
    val s = SparkSpec.session
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
  }
}

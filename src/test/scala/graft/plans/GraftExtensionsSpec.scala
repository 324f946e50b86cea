package graft.plans

import graft.SparkTestBase

/** The extension seam must resolve the kernels in a session that has
  * NOT called GraftFunctions.register — i.e. exactly how a
  * cluster-wide `spark.sql.extensions=graft.plans.GraftExtensions`
  * deployment sees them. `newSession()` drops session-local temp
  * registrations but keeps extensions-injected functions, so it
  * isolates the injection path. */
class GraftExtensionsSpec extends SparkTestBase {
  test("extensions-injected kernels resolve in a fresh session") {
    val s = spark.newSession()
    val r = s.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d," +
        " round(cosine_distance(array(1.0D, 0.0D), array(0.0D, 1.0D)), 6) AS c," +
        " l2_norm(array(3.0D, 4.0D)) AS n," +
        " l2_distance(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS l").head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(2) === 5.0)
    assert(r.getDouble(3) === 5.0)
  }
}

package graft.functions

import graft.SparkTestBase

/** Registration semantics of the kernel registry wrapper: graft's own
  * re-registrations are silent (register() runs per query — anything
  * else floods the logs), while a FOREIGN function squatting on a
  * kernel name is kept but reported exactly once per session. */
class GraftFunctionsSpec extends SparkTestBase {

  test("register is idempotent and silent for graft-owned names") {
    val s = spark.newSession()
    GraftFunctions.register(s)
    GraftFunctions.register(s)
    val (owned, foreign) = GraftFunctions.registeredBy(s)
    assert(owned == GraftFunctions.names.toSet, owned.toString)
    assert(foreign.isEmpty, foreign.toString)
  }

  test("a foreign squatter is kept, tracked, and its semantics win") {
    val s = spark.newSession()
    // Squat on one kernel name before graft registers.
    s.udf.register("dot_product",
      (_: Seq[Double], _: Seq[Double]) => 42.0)
    GraftFunctions.register(s)
    GraftFunctions.register(s) // second call must not re-track or re-warn
    val (owned, foreign) = GraftFunctions.registeredBy(s)
    assert(foreign == Set("dot_product"), foreign.toString)
    assert(owned == GraftFunctions.names.toSet - "dot_product", owned.toString)
    // The pre-existing registration's semantics are the ones in force.
    val r = s.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) v")
      .collect().head.getDouble(0)
    assert(r == 42.0, s"expected the squatter's 42.0, got $r")
    // A clean sibling session is unaffected: graft owns all names there.
    val s2 = spark.newSession()
    GraftFunctions.register(s2)
    val (owned2, foreign2) = GraftFunctions.registeredBy(s2)
    assert(owned2 == GraftFunctions.names.toSet && foreign2.isEmpty)
    val r2 = s2.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) v")
      .collect().head.getDouble(0)
    assert(r2 == 11.0, s"expected the kernel's 11.0, got $r2")
  }
}

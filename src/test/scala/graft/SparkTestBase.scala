package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM (Test/fork := true
  * gives the suite its own JVM; the session dies with it). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.build("4")
    functions.GraftFunctions.register(s)
    s
  }
}

trait SparkTestBase extends AnyFunSuite {
  def spark: SparkSession = TestSpark.spark
}

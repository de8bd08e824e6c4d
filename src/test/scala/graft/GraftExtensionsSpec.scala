package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions installer exposes native functions to plain SQL") {
    // boot the shared context first, then build a SEPARATE session
    // over it with the extensions applied (clearing the active/default
    // session so getOrCreate constructs a new one instead of returning
    // the shared one)
    val shared = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val withExt = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(withExt ne shared)
      // no SearchExpressions.register(...) call on this session: the
      // functions must come from the extensions injection alone
      val n = withExt.sql(
        "SELECT array_count_eq(array('a','b','a'), 'a')").head().getInt(0)
      assert(n == 2)
      val ph = withExt.sql(
        "SELECT phrase_count(array('x','y','x','y'), array('x','y'))").head().getInt(0)
      assert(ph == 2)
      val sh = withExt.sql(
        "SELECT size(shingle_hashes(array('a','b','c','d','e','f'), 5))").head().getInt(0)
      assert(sh == 2)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}

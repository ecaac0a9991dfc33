package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL in a session built with the extensions") {
    val base = spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.ansi.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val out = s2.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect()(0).getDouble(0)
      assert(out == 11.0)
      // arity misuse surfaces a clear error
      val e = intercept[Exception](s2.sql("SELECT graft_dot(array(1.0D))").collect())
      assert(e.getMessage.contains("graft_dot"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}

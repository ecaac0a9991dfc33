package graft.sources

import graft.SparkSpec

/** S8/S6: the JDBC read and write paths executed IN-PROCESS against
  * embedded Derby (on the Spark distribution classpath) — zero egress, but
  * the real `spark.read.format("jdbc")` source and sink run end to end. */
class JdbcSourceSpec extends SparkSpec {
  import spark.implicits._

  private val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"
  private def derby(db: String) =
    JdbcSource.embedded(s"jdbc:derby:memory:$db;create=true", DerbyDriver)

  test("S8: URL and option assembly for the remote repository") {
    val src = JdbcSource.ctuRepository("financial")
    assert(src.url == "jdbc:mariadb://relational.fel.cvut.cz:3306/financial")
    assert(src.user == "guest" && src.password == "ctu-relational")
    assert(src.fetchSize == 10000)
  }

  test("S6+S8: write then read a table through the real JDBC sink/source") {
    val src = derby("graft_rt")
    val df = Seq((1, "ALPHA", 10.5), (2, "BETA", -3.25), (3, "GAMMA", 0.0))
      .toDF("id", "name", "score")
    src.writeTable(df, "things")
    val back = src.table(spark, "things")
      .orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(back.toSeq == Seq((1, "ALPHA", 10.5), (2, "BETA", -3.25), (3, "GAMMA", 0.0)))
  }

  test("S8: range-partitioned parallel read returns the full table") {
    val src = derby("graft_part")
    val df = (1 to 100).map(i => (i, i * 2)).toDF("k", "v")
    src.writeTable(df, "nums")
    val part = src.tablePartitioned(spark, "nums", "k", lower = 1, upper = 101,
      numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4) // cursor split into ranges
    assert(part.count() == 100)
    assert(part.agg(org.apache.spark.sql.functions.sum("v")).collect()(0).getLong(0) == 10100L)
  }

  test("S8: predicates push down into the JDBC scan") {
    val src = derby("graft_push")
    src.writeTable((1 to 50).map(i => (i, s"row$i")).toDF("k", "s"), "t")
    val filtered = src.table(spark, "t").filter($"k" > 40)
    // the filter must reach the JDBC source, not run post-scan in Spark
    val pushed = filtered.queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") && pushed.contains("40"))
    assert(filtered.count() == 10)
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class JdbcSourceSpec extends AnyFunSuite {
  test("S8: URL and option assembly (read path is stock Spark JDBC)") {
    val src = JdbcSource.ctuRepository("financial")
    assert(src.url == "jdbc:mariadb://relational.fel.cvut.cz:3306/financial")
    assert(src.user == "guest" && src.password == "ctu-relational")
    assert(src.fetchSize == 10000)
  }
}

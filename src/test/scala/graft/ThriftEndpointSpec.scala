package graft

import graft.sources.ThriftEndpoint
import java.sql.DriverManager

/** The charm's client-interface analog end-to-end: a real HiveServer2
  * thrift listener over the session, exercised through the stock Hive JDBC
  * driver exactly as beeline would (connect → metadata → flagship query). */
class ThriftEndpointSpec extends SparkSpec {

  test("JDBC client runs the flagship query through the thrift endpoint", Heavy) {
    // external catalog table over the fixture parquet: visible to every
    // JDBC session (temp views are per-session; catalog tables are shared)
    spark.sql("DROP TABLE IF EXISTS thrift_lineitem")
    spark.sql(s"""CREATE TABLE thrift_lineitem USING parquet
                 |LOCATION '$sf/lineitem.parquet'""".stripMargin)
    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    val server = ThriftEndpoint.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      // the server binds asynchronously; retry the connect briefly
      val conn = Iterator.range(0, 30).map { i =>
        try Some(DriverManager.getConnection(ThriftEndpoint.jdbcUrl(port), "", ""))
        catch { case _: Exception => Thread.sleep(1000); None }
      }.collectFirst { case Some(c) => c }
        .getOrElse(fail(s"could not connect to thrift endpoint on $port"))
      try {
        val st = conn.createStatement()
        val rs = st.executeQuery(
          """SELECT l_returnflag, l_linestatus,
            |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
            |  COUNT(*) AS n
            |FROM thrift_lineitem
            |WHERE l_shipdate <= date '1998-09-02'
            |GROUP BY l_returnflag, l_linestatus
            |ORDER BY l_returnflag, l_linestatus""".stripMargin)
        var rows = 0
        var totalN = 0L
        while (rs.next()) {
          rows += 1
          assert(rs.getDouble("sum_qty") > 0)
          totalN += rs.getLong("n")
        }
        assert(rows > 0, "flagship query returned no groups over JDBC")
        // cross-check the JDBC result against the in-process library path
        import org.apache.spark.sql.functions._
        val expected = Tables.df(spark, sf, "lineitem")
          .filter(col("l_shipdate") <= "1998-09-02").count()
        assert(totalN === expected)
      } finally conn.close()
    } finally {
      server.close()
      spark.sql("DROP TABLE IF EXISTS thrift_lineitem")
    }
  }
}

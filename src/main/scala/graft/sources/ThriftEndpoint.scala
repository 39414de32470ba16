package graft.sources

import org.apache.spark.sql.SparkSession

/** SQL client endpoint — the deployed engine's `client` interface (the
  * reference charm's whole provides-surface is a HiveServer2 thrift/JDBC
  * listener on port 10000; reference locus: reactive/hive.py). Spark's 1:1
  * analog is `HiveThriftServer2.startWithContext`: the same HiveServer2
  * wire protocol, served by this session's catalog and Catalyst instead of
  * a Hive driver, so anything registered in the session (temp views,
  * persistent tables, graft's native functions) is queryable from any
  * beeline/JDBC/ODBC Hive client.
  *
  * Scale note: the endpoint is a thin RPC front — each JDBC statement
  * becomes an ordinary distributed Spark job, so concurrency and data
  * volume scale exactly like the library's own queries (the server adds
  * only result-set streaming on the driver).
  */
object ThriftEndpoint {

  /** Start a HiveServer2-protocol endpoint on `port`, serving `spark`'s
    * catalog. Returns a handle whose `close()` shuts the listener down.
    *
    * The port/host are hive confs, which HiveConf reads from system
    * properties (they are static from the session's point of view, so
    * RuntimeConfig refuses them). Each JDBC connection gets its own Spark
    * session over the SHARED catalog — persistent/external tables are
    * visible to every client; per-session temp views are not (set the
    * static conf `spark.sql.hive.thriftServer.singleSession=true` at
    * session build to share those too, as a single-tenant charm would). */
  def start(spark: SparkSession, port: Int): AutoCloseable = synchronized {
    // synchronized: the port travels through GLOBAL system properties (the
    // only channel HiveConf reads), so concurrent starts would race on it
    System.setProperty("hive.server2.thrift.port", port.toString)
    System.setProperty("hive.server2.thrift.bind.host", "localhost")
    val server = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    new AutoCloseable { override def close(): Unit = server.stop() }
  }

  /** JDBC URL a Hive client (beeline, java.sql) uses to reach `port`. */
  def jdbcUrl(port: Int): String = s"jdbc:hive2://localhost:$port/default"
}

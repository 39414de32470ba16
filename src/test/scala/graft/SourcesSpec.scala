package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(name).toString

  test("partitioned write prunes partitions on read") {
    import spark.implicits._
    val path = tmp("part")
    Sources.writePartitioned(Tables.df(spark, sf, "orders"), path,
      "o_orderstatus")
    val pruned = Sources.readPartitioned(spark, path)
      .filter($"o_orderstatus" === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_orderstatus"), plan.take(500))
    val expected = Tables.df(spark, sf, "orders")
      .filter($"o_orderstatus" === "F").count()
    assert(pruned.count() === expected)
  }

  test("csv, json, orc, text round-trips preserve data") {
    import spark.implicits._
    val orders = Tables.df(spark, sf, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    for (fmt <- Seq("csv", "json", "orc")) {
      val back = Sources.roundTrip(orders, tmp(fmt), fmt,
        if (fmt == "csv") Map("header" -> "true") else Map.empty)
      assert(back.count() === orders.count(), fmt)
      val a = orders.orderBy($"o_orderkey").collect().map(_.toString)
      val b = back.orderBy($"o_orderkey").collect().map(_.toString)
      assert(a === b, s"$fmt round-trip changed data")
    }
    // text: single string column per line
    val lines = Tables.df(spark, sf, "documents").select($"text")
    val backText = Sources.roundTrip(lines, tmp("text"), "text")
    assert(backText.count() === lines.count())
  }

  test("XML round-trip preserves a typed table (Spark 4 built-in xml " +
      "source — a surface Hive 1.2 required an external SerDe for)") {
    import spark.implicits._
    val orders = Tables.df(spark, sf, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val back = Sources.roundTrip(orders, tmp("xml"), "xml",
      Map("rowTag" -> "order", "rootTag" -> "orders"))
    assert(back.count() === orders.count(), "xml row count")
    // XML infers numerics back: compare on casted columns
    val a = orders.orderBy($"o_orderkey")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val b = back.select($"o_orderkey".cast("long"), $"o_orderstatus")
      .orderBy($"o_orderkey")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a === b, "xml round-trip changed data")
  }

  test("SequenceFile round-trip preserves every line (Hive text-table layout)") {
    import spark.implicits._
    val lines = Tables.df(spark, sf, "documents").select($"text")
    val dir = tmp("seqfile"); new java.io.File(dir).delete() // must not exist
    val back = Sources.sequenceFileRoundTrip(lines, dir)
    assert(back.columns.toSeq === Seq("text"))
    val a = lines.orderBy($"text").collect().map(_.getString(0))
    val b = back.orderBy($"text").collect().map(_.getString(0))
    assert(a === b, "sequence file round-trip changed data")
  }

  test("CTAS creates a queryable catalog table") {
    Tables.registerAll(spark, sf)
    val t = Sources.ctas(spark, "graft_ctas_test",
      "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus")
    assert(t.count() === 3)
    assert(spark.sql("SELECT SUM(n) FROM graft_ctas_test").head().getLong(0)
      === Tables.df(spark, sf, "orders").count())
    spark.sql("DROP TABLE graft_ctas_test")
  }

  test("LOAD DATA INPATH moves files into a partition, losslessly") {
    import spark.implicits._
    val staging = tmp("load_staging"); val table = tmp("load_table")
    val src = Tables.df(spark, sf, "nation")
    src.write.mode("overwrite").parquet(staging)
    Sources.loadDataInpath(spark, staging, table,
      partition = Seq("batch" -> "b1"))
    val back = Sources.readPartitioned(spark, table)
    assert(back.filter($"batch" === "b1").count() === src.count())
    // move semantics: no data files remain in the staging dir
    val left = new java.io.File(staging).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith("."))
    assert(left.isEmpty, "LOAD DATA must move, not copy")
    // OVERWRITE replaces the partition rather than appending
    src.limit(5).write.mode("overwrite").parquet(staging)
    Sources.loadDataInpath(spark, staging, table,
      partition = Seq("batch" -> "b1"), overwrite = true)
    assert(Sources.readPartitioned(spark, table)
      .filter($"batch" === "b1").count() === 5)
  }

  test("saveAsTable persists past the session: the metastore role") {
    import spark.implicits._
    Tables.df(spark, sf, "region").write.mode("overwrite")
      .saveAsTable("graft_persist_region")
    // a FRESH session (new temp-view namespace, new SQL conf) still sees
    // the catalog table — unlike a temp view, which dies with its session
    val s2 = spark.newSession()
    s2.range(1).createOrReplaceTempView("graft_only_in_s2")
    assert(!spark.catalog.tableExists("graft_only_in_s2"),
      "temp views must be session-scoped")
    assert(s2.catalog.tableExists("graft_persist_region"))
    assert(s2.table("graft_persist_region").count() ===
      Tables.df(spark, sf, "region").count())
    // and the warehouse directory holds real files a cold reader can open
    val loc = spark.sql("DESCRIBE EXTENDED graft_persist_region")
      .filter($"col_name" === "Location").head().getString(1)
    assert(spark.read.parquet(loc.stripPrefix("file:")).count() === 5)
    spark.sql("DROP TABLE graft_persist_region")
  }

  test("RCFile round-trip preserves a typed table (hive-exec classes)") {
    import spark.implicits._
    val src = Tables.df(spark, sf, "supplier")
      .select($"s_suppkey", $"s_name", $"s_acctbal")
    val back = Sources.rcfileRoundTrip(src, tmp("graft_rcfile") + "/t")
    assert(back.schema === src.schema)
    val a = src.orderBy($"s_suppkey").collect().toSeq
    val b = back.orderBy($"s_suppkey").collect().toSeq
    assert(a === b, "RCFile round-trip must be lossless")
  }

  test("Avro container round-trip preserves a typed table (avro-mapred)") {
    import spark.implicits._
    val src = Tables.df(spark, sf, "supplier")
      .select($"s_suppkey", $"s_name", $"s_acctbal".cast("double")
        .as("s_acctbal"))
    val dir = tmp("graft_avro") + "/t"
    val back = Sources.avroRoundTrip(src, dir)
    assert(back.schema === src.schema)
    val a = src.orderBy($"s_suppkey").collect().toSeq
    val b = back.orderBy($"s_suppkey").collect().toSeq
    assert(a === b, "Avro round-trip must be lossless and typed")
    // the files on disk are genuine .avro container files
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty, "AvroOutputFormat must emit .avro files")
    val magic = new Array[Byte](4)
    val in = new java.io.FileInputStream(files.head)
    try in.read(magic) finally in.close()
    assert(magic.take(3).toSeq === "Obj".getBytes("UTF-8").toSeq &&
      magic(3) === 1, "missing Avro container magic Obj\\x01")
  }

  test("RCFile and Avro round-trips survive nasty unicode payloads") {
    import spark.implicits._
    // tabs/newlines are safe in RCFile cells (length-prefixed byte refs,
    // not line-delimited) and in Avro strings; multi-byte UTF-8 must come
    // back byte-identical
    val nasty = Seq(
      (1L, "plain"), (2L, "tab\tand\nnewline"), (3L, "émoji 🦆 中文"),
      (4L, ""), (5L, "quote\"back\\slash,comma")
    ).toDF("id", "s")
    val want = nasty.orderBy($"id").collect().toSeq
    val rc = Sources.rcfileRoundTrip(nasty, tmp("graft_rc_nasty") + "/t")
    assert(rc.orderBy($"id").collect().toSeq === want)
    val av = Sources.avroRoundTrip(nasty, tmp("graft_avro_nasty") + "/t")
    assert(av.orderBy($"id").collect().toSeq === want)
  }

  test("metastore survives a FULL JVM teardown (cross-JVM, derby-backed)", Heavy) {
    // The §2.0 metastore row's real claim: catalog content lives OUTSIDE
    // the process — the deployed engine wires an external MySQL metastore
    // for exactly this (service restart must not lose tables). The
    // same-JVM test above only proves namespace isolation; here JVM #1
    // registers a partitioned table through a Hive/derby-backed catalog
    // and EXITS (every in-memory catalog structure dies with it), then
    // JVM #2 opens the same metastore cold and must resolve
    // name → schema → partition list → data, via MetastoreProbe.
    val dir = tmp("graft_metastore")
    def probe(mode: String): String = {
      val javaBin = new java.io.File(
        new java.io.File(sys.props("java.home"), "bin"), "java")
        .getAbsolutePath
      // reuse the exact --add-opens set THIS (sbt-forked, Spark-running)
      // JVM was started with, instead of a copy of build.sbt's list that
      // would silently drift on the next Spark upgrade
      val jvmArgs = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments
      val addOpens = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = jvmArgs.iterator()
      while (it.hasNext) {
        val a = it.next()
        if (a == "--add-opens" && it.hasNext) {
          addOpens += a; addOpens += it.next()
        } else if (a.startsWith("--add-opens=")) addOpens += a
      }
      assert(addOpens.nonEmpty, "test JVM carries no --add-opens flags")
      val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
        "-Dspark.ui.enabled=false",
        "-cp", sys.props("java.class.path"),
        "graft.sources.MetastoreProbe", mode, dir)
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      // drain stdout on a helper thread: reading inline would block past
      // the waitFor timeout if the probe JVM wedges, and NOT draining
      // could deadlock the child on a full stdout pipe
      val buf = new java.io.ByteArrayOutputStream()
      val drain = new Thread(() => p.getInputStream.transferTo(buf))
      drain.setDaemon(true)
      drain.start()
      val finished = p.waitFor(240, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) p.destroyForcibly()
      drain.join(10000)
      val out = buf.toString("UTF-8")
      assert(finished, s"$mode probe timed out:\n" + out.takeRight(2000))
      assert(p.exitValue() === 0,
        s"$mode probe failed:\n" + out.takeRight(2000))
      out
    }
    assert(probe("write").contains("PROBE_OK write 100"))
    // 100 rows, 4 partitions, sum(2*id for id<100) = 9900 — all resolved
    // through the catalog by a process that never saw the write
    assert(probe("read").contains("PROBE_OK read 100 4 9900"))
  }

  test("EXPORT/IMPORT bundle recreates the table with identical schema+data") {
    import spark.implicits._
    Tables.registerAll(spark, sf)
    val dir = tmp("export_nation")
    Sources.exportTable(spark, "nation", dir)
    val imported = Sources.importTable(spark, "graft_import_nation", dir)
    val orig = Tables.df(spark, sf, "nation")
    assert(imported.schema === orig.schema)
    assert(imported.orderBy($"n_nationkey").collect().toSeq ===
      orig.orderBy($"n_nationkey").collect().toSeq)
    spark.sql("DROP TABLE graft_import_nation")
  }

  test("multi-insert fans one scan out to two sinks") {
    import spark.implicits._
    val p1 = tmp("mi1"); val p2 = tmp("mi2")
    Sources.multiInsert(Tables.df(spark, sf, "orders"), Seq(
      ((d: org.apache.spark.sql.DataFrame) =>
        d.filter($"o_orderstatus" === "F"), p1),
      ((d: org.apache.spark.sql.DataFrame) =>
        d.filter($"o_totalprice" > 150000), p2)))
    val orders = Tables.df(spark, sf, "orders")
    assert(spark.read.parquet(p1).count() ===
      orders.filter($"o_orderstatus" === "F").count())
    assert(spark.read.parquet(p2).count() ===
      orders.filter($"o_totalprice" > 150000).count())
  }

  test("ANALYZE TABLE statistics reach the optimizer (CBO inputs)") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_stats_nation")
    // a previously-failed run can orphan the managed location
    val wh = new java.io.File("spark-warehouse/graft_stats_nation")
    if (wh.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(wh)
    }
    Tables.df(spark, sf, "nation").write.mode("overwrite")
      .saveAsTable("graft_stats_nation")
    spark.sql("ANALYZE TABLE graft_stats_nation COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE graft_stats_nation COMPUTE STATISTICS " +
      "FOR COLUMNS n_nationkey, n_regionkey")
    // rowCount propagates through plan stats only under CBO — the mode a
    // cluster deployment of this engine would run with
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val stats = spark.table("graft_stats_nation")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(25)), s"stats=$stats")
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
    // column-level NDV recorded in the catalog (what join reorder uses)
    val colStats = spark.sql(
      "DESCRIBE EXTENDED graft_stats_nation n_regionkey")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(colStats.get("distinct_count").exists(_.toLong >= 4), colStats)
    spark.sql("DROP TABLE graft_stats_nation")
  }

  test("bucketed tables join without a shuffle (SMB join)") {
    import spark.implicits._
    Sources.writeBucketed(Tables.df(spark, sf, "orders"), "graft_b_orders",
      4, "o_orderkey")
    Sources.writeBucketed(
      Tables.df(spark, sf, "lineitem")
        .groupBy($"l_orderkey").agg(count(lit(1)).as("n_items")),
      "graft_b_items", 4, "l_orderkey")
    // force the sort-merge path: broadcast would win on these tiny tables
    // and the planner then ignores bucketing entirely
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_b_orders")
        .join(spark.table("graft_b_items"),
          $"o_orderkey" === $"l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"),
        "bucketed equi-join must not shuffle:\n" + plan.take(800))
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE graft_b_orders")
    spark.sql("DROP TABLE graft_b_items")
  }
}

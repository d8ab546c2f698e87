package graft.io

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  test("CSV round-trip preserves schema and values") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val src = Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    src.write.option("header", "true").mode("overwrite").csv(dir)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_acctbal", DoubleType)))
    val back = Sources.readCsv(spark, dir, schema)
    assert(back.count() == src.count())
    val diff = src.exceptAll(back).count() + back.exceptAll(src).count()
    assert(diff == 0)
  }

  test("CSV round-trip preserves edge whitespace and embedded newlines") {
    // Spark's CSV WRITER trims leading/trailing whitespace by default
    // (ignoreLeading/TrailingWhiteSpace default true on write) — the
    // lossless contract needs them disabled (Sources.writeCsv), and
    // quoted embedded newlines need multiLine on the read side
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_csv_ws").toString
    val src = Seq(
      (1L, "  leading"), (2L, "trailing  "), (3L, "  both  "),
      (4L, "inner\nnewline"), (5L, "quote\"and,comma"), (6L, "\tplain\t"))
      .toDF("id", "text")
    Sources.writeCsv(src, dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val back = Sources.readCsv(spark, dir, schema, multiLine = true)
    val diff = src.exceptAll(back).count() + back.exceptAll(src).count()
    assert(diff == 0, "CSV round-trip mangled whitespace/newlines")
    // and the failure mode the guard exists for: a default-options
    // write really does trim, i.e. the option is load-bearing
    val dir2 = Files.createTempDirectory("graft_csv_trim").toString
    src.write.option("header", "true").mode("overwrite").csv(dir2)
    val trimmed = Sources.readCsv(spark, dir2, schema, multiLine = true)
    assert(trimmed.exceptAll(src).count() > 0,
      "expected the default CSV writer to trim edge whitespace")
  }

  test("partitioned write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft_part").toString
    val o = Tables.load(spark, sfDir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
    Sources.writePartitioned(o, dir, Seq("order_year"))
    val all = spark.read.parquet(dir)
    val years = all.select("order_year").distinct().count()
    assert(years > 3)
    val pruned = spark.read.parquet(dir).filter(col("order_year") === 1996)
    val expected = o.filter(col("order_year") === 1996).count()
    assert(pruned.count() == expected)
    // partition pruning: the scan selects exactly the 1996 directory
    // (inputFiles reports the unpruned listing, so inspect the scan node)
    val scans = pruned.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val parts = scans.head.selectedPartitions
    assert(parts.partitionCount == 1)
  }

  test("clustered write co-locates keys and orders within partitions") {
    val dir = Files.createTempDirectory("graft_clus").toString
    val l = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    Sources.writeClustered(l, dir, "l_orderkey", numPartitions = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == l.count())
    // each key's rows land in exactly one file (co-location)
    import spark.implicits._
    val spread = back
      .select(col("l_orderkey"), input_file_name().as("f"))
      .groupBy("l_orderkey").agg(countDistinct("f").as("nf"))
      .agg(max("nf")).head().getLong(0)
    assert(spread == 1L)
  }

  test("bucketed tables join with no exchange on either side") {
    val base = Files.createTempDirectory("graft_bucket").toString
    val o = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_mktsegment")
    Sources.writeBucketed(o, "b_orders", s"$base/o", "o_custkey", 8)
    Sources.writeBucketed(c.withColumnRenamed("c_custkey", "o_custkey"),
      "b_customer", s"$base/c", "o_custkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), Seq("o_custkey"))
      val expected = o.join(
        c.withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey"))
      assert(joined.count() == expected.count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("ORC round-trip preserves values and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val src = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_shipdate")
    Sources.writeOrc(src, dir)
    val back = Sources.readOrc(spark, dir)
    assert(back.count() == src.count())
    assert(src.exceptAll(back).count() == 0)
    val filtered = back.filter(col("l_quantity") > 45.0)
    val scan = filtered.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PushedFilters").contains("GreaterThan(l_quantity"),
      scan.metadata("PushedFilters"))
    assert(filtered.count() == src.filter(col("l_quantity") > 45.0).count())
  }

  test("JSON props parsing matches engine JSON path semantics") {
    val e = Tables.load(spark, sfDir, "events")
      .select(from_json(col("props"), lit("k INT")).getField("k").as("k"))
    assert(e.filter(col("k").isNull).count() == 0)
    val viaGet = Tables.load(spark, sfDir, "events")
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
    assert(e.exceptAll(viaGet).count() == 0)
  }
}

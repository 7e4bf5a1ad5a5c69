package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink format breadth (SURVEY.md §2 B1-B3): csv / json / orc /
  * parquet round-trips preserve rows and schema-on-read applies. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Tables.orders(spark, sf)
    .select("o_orderkey", "o_orderstatus", "o_totalprice")
    .filter($"o_orderkey" < 200)

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_src").resolve(name).toString

  test("csv round-trip with explicit schema-on-read") {
    val p = tmp("orders_csv")
    base.write.option("header", "true").csv(p)
    val back = spark.read
      .schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
      .option("header", "true").csv(p)
    assert(back.count() == base.count())
    assert(back.schema("o_orderkey").dataType.typeName == "long")
    val s1 = base.agg(sum($"o_totalprice".cast("decimal(18,2)"))).head.getDecimal(0)
    val s2 = back.agg(sum($"o_totalprice".cast("decimal(18,2)"))).head.getDecimal(0)
    assert(s1 == s2)
  }

  test("json lines round-trip") {
    val p = tmp("orders_json")
    base.write.json(p)
    val back = spark.read
      .schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
      .json(p)
    assert(back.count() == base.count())
  }

  test("orc round-trip with predicate pushdown") {
    val p = tmp("orders_orc")
    base.write.orc(p)
    val back = spark.read.orc(p).filter($"o_orderkey" < 100)
    assert(back.count() == base.filter($"o_orderkey" < 100).count())
    val scan = back.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("FileScan")).getOrElse(fail("no scan"))
    assert(scan.contains("PushedFilters"))
  }

  test("scheme'd Hadoop-FS URI reads identically to the bare local path (B2)") {
    // the object-store path (s3a://...) differs from the local fast lane
    // only in the FileSystem the URI scheme resolves; file:// exercises
    // the same scheme-resolution machinery end to end
    val bare = Tables.load(spark, sf, "orders")
    val schemed = Tables.load(spark, s"file://${new java.io.File(sf).getAbsolutePath}", "orders")
    assert(schemed.schema == bare.schema)
    assert(schemed.count() == bare.count())
    val s1 = bare.agg(sum($"o_totalprice".cast("decimal(18,2)"))).head.getDecimal(0)
    val s2 = schemed.agg(sum($"o_totalprice".cast("decimal(18,2)"))).head.getDecimal(0)
    assert(s1 == s2)
    // object-store reader configs round-trip through the same conf plumbing
    val hc = spark.sparkContext.hadoopConfiguration
    val saved = Option(hc.get("fs.s3a.connection.maximum"))
    hc.set("fs.s3a.connection.maximum", "64")
    try assert(hc.get("fs.s3a.connection.maximum") == "64")
    finally saved match {
      case Some(v) => hc.set("fs.s3a.connection.maximum", v)
      case None => hc.unset("fs.s3a.connection.maximum")
    }
  }

  test("partitioned parquet sink prunes on read") {
    val p = tmp("orders_part")
    base.write.partitionBy("o_orderstatus").parquet(p)
    val back = spark.read.parquet(p).filter($"o_orderstatus" === "F")
    val scan = back.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("FileScan")).getOrElse(fail("no scan"))
    assert(scan.contains("PartitionFilters"))
    assert(back.count() == base.filter($"o_orderstatus" === "F").count())
  }

  test("csv malformed-row modes: PERMISSIVE nulls+captures, DROPMALFORMED drops, FAILFAST throws") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_bad").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "rows.csv"),
      "1,alpha,10\n2,beta,not_a_number\n3,gamma,30\n".getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("n", LongType), StructField("_bad", StringType)))
    // PERMISSIVE (the quarantine-friendly default): bad field → null,
    // raw line captured in the corrupt-record column for replay
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_bad")
      .csv(dir).collect().sortBy(_.getLong(0))
    assert(permissive.length == 3)
    val bad = permissive(1)
    assert(bad.isNullAt(2) && bad.getString(3).contains("not_a_number"))
    assert(permissive(0).isNullAt(3) && permissive(2).isNullAt(3))
    // DROPMALFORMED: silent narrowing — 2 rows survive. collect(), not
    // count(): CSV column pruning means count() parses ZERO fields, so
    // no row is ever malformed and all 3 "survive" — the malformed
    // verdict exists only for columns a query actually reads
    val dropped = spark.read
      .schema(StructType(schema.fields.dropRight(1)))
      .option("mode", "DROPMALFORMED").csv(dir)
    assert(dropped.collect().length == 2)
    assert(dropped.count() == 3) // the pruning caveat, pinned
    // FAILFAST: ANSI-style loud failure for pipelines that must halt
    val failed = intercept[org.apache.spark.SparkException] {
      spark.read.schema(StructType(schema.fields.dropRight(1)))
        .option("mode", "FAILFAST").csv(dir).collect()
    }
    assert(failed.getMessage.contains("Malformed") ||
      failed.getCause != null)
  }
}

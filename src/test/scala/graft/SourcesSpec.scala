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
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Non-parquet source/sink round-trips plus multi-dimensional layout
  * (SURVEY.md §2 B1-B3 widening). The reference's single storage format
  * is opaque binary chunks (/root/reference/src/lib.rs:24-27,
  * /root/reference/src/rocksdb_storage_engine.rs:126-132); a lake engine
  * must also ingest/export the interchange formats around it. Each query
  * WRITES the format from the canonical parquet table, reads it back
  * with an EXPLICIT schema (schema inference is a whole extra pass over
  * the data at 100 TB — never pay it on a known table), and aggregates;
  * the DuckDB oracle computes the same aggregate from the original
  * parquet, so any loss of fidelity in the round-trip (encoding,
  * precision, timestamp format) is a hash mismatch.
  *
  * Column discipline for text formats: DECIMAL and DATE round-trip
  * exactly through their string forms; doubles round-trip through JSON
  * (shortest-round-trippable print) but are cast to DECIMAL(18,2) before
  * text serialization in CSV where the format has no type system at all.
  */
object Formats {
  private def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  private def cacheDir(fmt: String, d: String): String = {
    val root = sys.props.getOrElse("graft.build.root", System.getProperty("user.dir"))
    new java.io.File(new java.io.File(root, "target"),
      s"graft-fmt-$fmt-${new java.io.File(d).getName}").toString
  }

  /** CSV: orders → headered CSV → read with explicit DDL schema →
    * priority rollup. Text-format discipline: money as DECIMAL(18,2),
    * day-granularity timestamps as DATE. */
  def sourceCsv(s: SparkSession, d: String): DataFrame = {
    val dir = cacheDir("csv", d)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        dec2(col("o_totalprice")).as("o_totalprice"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_orderpriority"))
      .write.mode("overwrite").option("header", "true").csv(dir)
    s.read
      .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
        "o_totalprice DECIMAL(18,2), o_orderdate DATE, o_orderpriority STRING")
      .option("header", "true").csv(dir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice")).cast("double").as("total"),
        max(col("o_orderdate")).as("last_date"))
      .orderBy("o_orderpriority")
  }

  /** JSON lines: customer → JSON → read with explicit schema → segment
    * rollup. Doubles survive JSON exactly (shortest round-trippable
    * print), so the decimal cast happens after the round-trip — the
    * same place the oracle applies it. */
  def sourceJson(s: SparkSession, d: String): DataFrame = {
    val dir = cacheDir("json", d)
    Tables.customer(s, d).write.mode("overwrite").json(dir)
    s.read
      .schema("c_custkey BIGINT, c_name STRING, c_nationkey INT, " +
        "c_acctbal DOUBLE, c_mktsegment STRING")
      .json(dir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"),
        sum(dec2(col("c_acctbal"))).cast("double").as("total_bal"),
        min(col("c_name")).as("first_name"))
      .orderBy("c_mktsegment")
  }

  /** ORC: the other columnar format — binary, so every type round-trips
    * bit-exactly; filtered lineitem → ORC → read → returnflag rollup. */
  def sourceOrc(s: SparkSession, d: String): DataFrame = {
    val dir = cacheDir("orc", d)
    Tables.lineitem(s, d).filter(col("l_quantity") < 10)
      .write.mode("overwrite").orc(dir)
    s.read.orc(dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("revenue"))
      .orderBy("l_returnflag")
  }

  // ------------------------------------------------------------ z-order

  /** 2-bit × 2-bit Morton (z-order) interleave of (user bucket, time
    * bucket) — multi-dimensional clustering so ONE partition column
    * serves range predicates on BOTH dimensions (the generalization of
    * the reference's order-preserving composite key,
    * /root/reference/src/rocksdb_storage_engine.rs:180-192, which can
    * only cluster by its leading field). */
  private def zInterleave(ub: org.apache.spark.sql.Column,
      tb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ub.bitwiseAND(1) + tb.bitwiseAND(1) * 2 +
      (ub / 2).cast("int").bitwiseAND(1) * 4 +
      (tb / 2).cast("int").bitwiseAND(1) * 8

  /** Driver-side pure math: which z values intersect the query box
    * [ubLo, ubHi] × [tbLo, tbHi]? 16 cells max — enumerate. At deeper
    * bit-depths this becomes the standard BIGMIN z-range splitter; the
    * contract (query box → z set, before any data is read) is the same. */
  def zRangesFor(ubLo: Int, ubHi: Int, tbLo: Int, tbHi: Int): Seq[Int] =
    for {
      ub <- ubLo to ubHi
      tb <- tbLo to tbHi
    } yield (ub & 1) + (tb & 1) * 2 + ((ub >> 1) & 1) * 4 + ((tb >> 1) & 1) * 8

  /** Where the z-clustered events layout lives for `d`. */
  def zLayoutDir(d: String): String = cacheDir("zorder", d)

  /** Write events clustered by z(user/4, (day-1)/8): 16 partition dirs,
    * each file additionally sorted by (user_id, ts) for row-group
    * min/max locality inside the partition. */
  def writeZLayout(s: SparkSession, d: String): String = {
    val dir = zLayoutDir(d)
    Tables.events(s, d)
      .withColumn("zb", zInterleave(
        (col("user_id") / 4).cast("int"),
        ((dayofmonth(col("ts")) - 1) / 8).cast("int")))
      .repartition(col("zb"))
      .sortWithinPartitions("zb", "user_id", "ts")
      .write.mode("overwrite").partitionBy("zb").parquet(dir)
    dir
  }

  /** 2-D box query over the z layout: users 4-7 × days 9-16 maps to
    * exactly ONE of the 16 z partitions (ScaleSpec asserts the pruning);
    * the remaining row predicates cut within it. Results are
    * layout-independent, so the oracle reads the original events table. */
  def layoutZorder(s: SparkSession, d: String): DataFrame = {
    val dir = writeZLayout(s, d)
    val zs = zRangesFor(1, 1, 1, 1) // ub=1 (users 4-7), tb=1 (days 9-16)
    s.read.parquet(dir)
      .filter(col("zb").isin(zs: _*) &&
        col("user_id").between(4, 7) &&
        col("ts") >= lit("2024-01-09").cast("timestamp") &&
        col("ts") < lit("2024-01-17").cast("timestamp"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("total_value"))
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "source_csv"    -> (sourceCsv(_, _)),
    "source_json"   -> (sourceJson(_, _)),
    "source_orc"    -> (sourceOrc(_, _)),
    "layout_zorder" -> (layoutZorder(_, _)))

  /** Oracles read the ORIGINAL parquet tables — the round-trip must be
    * lossless for the hashes to match. */
  val oracles: Map[String, String] = Map(
    "source_csv" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(MAX(o_orderdate) AS DATE) AS last_date
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "source_json" ->
      """SELECT c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
        |  MIN(c_name) AS first_name
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "source_orc" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem WHERE l_quantity < 10
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "layout_zorder" ->
      """SELECT user_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |WHERE user_id BETWEEN 4 AND 7
        |  AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-09'
        |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-17'
        |GROUP BY user_id ORDER BY user_id""".stripMargin)
}

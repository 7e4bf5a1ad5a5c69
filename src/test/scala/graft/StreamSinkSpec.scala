package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming file/foreachBatch sinks (SURVEY.md B3 streaming side):
  * checkpointed parquet append sink, and a foreachBatch dedup-merge sink
  * — the streaming form of the reference's persist path. */
class StreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("streaming parquet sink: exactly the input rows land on disk") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val out = Files.createTempDirectory("graft_sink").resolve("out").toString
    val ckpt = Files.createTempDirectory("graft_sink").resolve("ckpt").toString
    val q = mem.toDF().toDF("id", "v").writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      mem.addData(Seq((1L, 1.0), (2L, 2.0)))
      q.processAllAvailable()
      mem.addData(Seq((3L, 3.0)))
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.parquet(out)
    assert(back.count() == 3)
    assert(back.select(sum("id")).head.getLong(0) == 6L)
  }

  test("foreachBatch sink: idempotent merge dedups replayed batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val target = Files.createTempDirectory("graft_fb").resolve("cat").toString
    val q = mem.toDF().toDF("event_id", "ts").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the reference's Entry::Vacant ingest gate as a merge: append
        // only ids not yet persisted (graft.sources.Ingest discipline)
        val existing =
          try spark.read.parquet(target).select("event_id")
          catch { case _: Throwable => Seq.empty[Long].toDF("event_id") }
        batch.join(existing, Seq("event_id"), "left_anti")
          .write.mode("append").parquet(target)
      }
      .start()
    try {
      mem.addData(Seq((1L, ts(0)), (2L, ts(1))))
      q.processAllAvailable()
      mem.addData(Seq((2L, ts(1)), (3L, ts(2)))) // replay of id 2
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.parquet(target)
    assert(back.count() == 3)
    assert(back.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }
}

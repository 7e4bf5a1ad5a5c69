package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §2 "salting for skew" / §4 scale
  * notes). AQE's skew-join splitting handles most cases at runtime; these
  * are the explicit forms for when a hot key is known to dwarf everything
  * (the classic 100 TB failure mode: one key = 30% of the table → one
  * straggler task).
  *
  * Salt is derived deterministically from the full row content
  * (xxhash64), not `rand()` — results stay reproducible run-to-run,
  * which the oracle/verify discipline requires.
  */
object Scale {

  private def saltCol(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(buckets)).cast("int")

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt) spreads a hot key over `buckets` reducers, then a final
    * aggregate over key. Works for any commutative-mergeable aggregate;
    * exposed for count/sum which cover the hot paths. */
  def saltedCountSum(df: DataFrame, key: String, sumCol: String,
      buckets: Int = 16): DataFrame =
    df.withColumn("__salt", saltCol(df, buckets))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sum(col(sumCol).cast("decimal(18,2)")).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").cast("double").as("sum"))

  /** Skewed equi-join: salt the big (skewed) side, replicate the small
    * side once per salt bucket, join on (key, salt). Join output is
    * identical to the plain join; the hot key's rows now land on
    * `buckets` tasks instead of one. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt", saltCol(big, buckets))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

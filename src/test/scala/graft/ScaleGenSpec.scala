package graft

import org.apache.spark.sql.functions._

/** Invariants of the sf1-checkpoint generator: the scale claims in
  * bench_sf1.json are only meaningful if the synthesized corpus
  * actually preserves the workload's join/dedup structure. */
class ScaleGenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scale").toString
    // generate(), not main() — main owns (and STOPS) its own session,
    // which inside the suite would kill the shared one for every test
    // that runs after this file
    ScaleGen.generate(spark, sf, dir, 2)
    dir
  }

  test("every table scales by the factor; fixed dims copy through") {
    def n(d: String, t: String): Long = spark.read.parquet(s"$d/$t.parquet").count()
    Seq("customer", "supplier", "part", "orders", "lineitem", "events",
      "documents", "embeddings").foreach { t =>
      assert(n(out, t) == 2 * n(sf, t), s"$t did not scale 2x")
    }
    Seq("region", "nation").foreach(t => assert(n(out, t) == n(sf, t), t))
  }

  test("join relationships hold within each replica") {
    // every lineitem still finds its order, every order its customer —
    // key shifting must move FK and PK together or the scaled joins
    // silently turn into misses and every join bench lies
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val o = spark.read.parquet(s"$out/orders.parquet")
    val c = spark.read.parquet(s"$out/customer.parquet")
    val orphanLi = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti").count()
    assert(orphanLi == 0, s"$orphanLi lineitem rows lost their order")
    val orphanO = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count()
    assert(orphanO == 0, s"$orphanO orders lost their customer")
  }

  test("replica documents are near-duplicates, not exact; names sit >=2 edits apart") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    // exact-dup count unchanged from the base corpus: replicas differ by
    // their marker prefix, so scaling never manufactures exact clones
    val baseDup = Tables.documents(spark, sf)
      .groupBy("text").count().filter(col("count") > 1).count()
    val scaledDup = docs.groupBy("text").count().filter(col("count") > 1).count()
    assert(scaledDup == 2 * baseDup,
      s"exact-dup groups $scaledDup != 2x base $baseDup — replicas collide")
    // clone names at edit distance >= 2: a distance-1 family would
    // quadratically inflate the edit-distance-<=1 fuzzy join
    val minDist = spark.read.parquet(s"$out/customer.parquet")
      .select((col("c_custkey") % 100000000L).as("base"), col("c_name"))
      .groupBy("base").agg(collect_list("c_name").as("names"))
      .select(explode(expr(
        """flatten(transform(names, (a, i) ->
          |  transform(slice(names, i + 2, size(names)), b ->
          |    levenshtein(a, b))))""".stripMargin)).as("d"))
      .agg(min("d")).head().getInt(0)
    assert(minDist >= 2, s"replica names at edit distance $minDist")
  }

  test("near-dup clusters stay BOUNDED: pairs within a group, decorrelation across") {
    // factor 5 → replicas 1..4 in groups (1,2) and (3,4): the dedup
    // workload must see O(1)-sized clusters at ANY factor, or every
    // dedup bench row measures O(factor²) generator-manufactured pairs
    // instead of the operator (the sf10 lesson: llm_semdedup 24.7×)
    val out5 = java.nio.file.Files.createTempDirectory("graft_scale5").toString
    ScaleGen.generate(spark, sf, out5, 5)
    val docs = spark.read.parquet(s"$out5/documents.parquet")
      .filter(col("doc_id") % 100000000L === 1L && col("text").isNotNull)
      .select((col("doc_id") / 100000000L).cast("long").as("r"), col("text"))
      .collect().map(row => row.getLong(0) -> row.getString(1)).toMap
    def sh(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    def jac(a: String, b: String): Double = {
      val (x, y) = (sh(a), sh(b))
      x.intersect(y).size.toDouble / x.union(y).size
    }
    // same group: near-dups; different groups (and vs base): far apart
    assert(jac(docs(1), docs(2)) > 0.6, s"pair jaccard ${jac(docs(1), docs(2))}")
    assert(jac(docs(3), docs(4)) > 0.6, s"pair jaccard ${jac(docs(3), docs(4))}")
    assert(jac(docs(1), docs(3)) < 0.35, s"cross-group jaccard ${jac(docs(1), docs(3))}")
    assert(jac(docs(0), docs(1)) < 0.35, s"base-vs-replica jaccard ${jac(docs(0), docs(1))}")

    val vecs = spark.read.parquet(s"$out5/embeddings.parquet")
      .filter(col("vec_id") % 100000000L === 1L)
      .select((col("vec_id") / 100000000L).cast("long").as("r"), col("embedding"))
      .collect().map(row => row.getLong(0) ->
        row.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    assert(cos(vecs(1), vecs(2)) > 0.99, s"pair cosine ${cos(vecs(1), vecs(2))}")
    assert(math.abs(cos(vecs(1), vecs(3))) < 0.9,
      s"cross-group cosine ${cos(vecs(1), vecs(3))}")
    assert(math.abs(cos(vecs(0), vecs(1))) < 0.9,
      s"base-vs-replica cosine ${cos(vecs(0), vecs(1))}")
  }
}

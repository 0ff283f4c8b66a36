package graft

import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.joins.CartesianProductExec

import graft.extensions.Dedup

/** Skew/blocking guarantees of the dedup operators on planted corpora:
  * a boilerplate shingle shared by 60 docs (> MaxShingleDf = 50) must not
  * expand 60²/2 pairs — the df cap drops it from the Jaccard feature space;
  * and the fuzzy-name join must plan as an equi-join on the length-band key,
  * never a cross product.
  */
class DedupSkewSpec extends SparkTestBase {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("dedup-skew").toString
    val boiler = (1 to 11).map(i => s"b$i").mkString(" ") // 9 shared shingles
    // Docs 1..60: 9 boilerplate shingles + 1 unique → pairwise J = 9/11 ≥ 0.8
    // UNCAPPED (1770 pairs!); the df cap (df=60 > 50) removes all of them.
    val spam = (1L to 60L).map(i => (i, s"$boiler u$i"))
    // Docs 100/101: identical low-df text → true near-dup pair, J = 1.0.
    val real = Seq(100L, 101L).map(i => (i, (1 to 20).map(j => s"t$j").mkString(" ")))
    (spam ++ real).map { case (id, t) => (id, t, "en", "test", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("df cap kills the boilerplate pair bomb, keeps the true near-dup") {
    rows(Dedup.dedupNgramJaccard(spark, dir)) shouldBe
      Seq(Seq(100L, 101L, 1.0))
  }

  test("minhash-verified pairs are a subset of exact Jaccard pairs (sketch recall, exact precision)") {
    // Same τ = 0.8 and feature space (df cap is inert at this size), so the
    // sketch-then-verify pipeline may MISS pairs (recall < 1) but must never
    // emit one the exact operator would not — and on real testdata it
    // actually finds all of them.
    val dir = "/root/testdata/sf0.001"
    val exact = rows(Dedup.dedupNgramJaccard(spark, dir)).map(_.take(2)).toSet
    val verified = rows(Dedup.dedupMinhashVerified(spark, dir)).map(_.take(2)).toSet
    verified should not be empty
    verified.subsetOf(exact) shouldBe true
  }

  test("upsert is idempotent for a fixed update set") {
    import spark.implicits._
    import graft.ops.Relational
    val t = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val u = Seq((2L, "b2"), (3L, "c")).toDF("k", "v")
    val once = Relational.upsert(t, u, Seq("k"))
    val twice = Relational.upsert(once, u, Seq("k"))
    rows(twice.orderBy("k")) shouldBe rows(once.orderBy("k"))
  }

  test("substring dedup: exact 40-char run matches, 39-char run does not") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("dedup-substr").toString
    // doc 1 & 2 share an exact 40-char run embedded in different contexts;
    // doc 3 & 4 share only 39 consecutive chars (one char short of the
    // window) and must NOT pair; doc 5 is unrelated.
    val shared40 = "abcdefghijklmnopqrstuvwxyz0123456789ABCD" // 40 chars
    val shared39 = shared40.take(39)
    // chars immediately adjacent to each run differ per doc, so the SHARED
    // run is exactly 40 (docs 1,2) / exactly 39 (docs 3,4) chars long
    Seq(
      (1L, s"prefixone.P$shared40%Qsuffixone"),
      (2L, s"twostart..R$shared40&Stwoending"),
      (3L, s"aaaaaaaaaaT$shared39#Ubbbbbbbbb"),
      (4L, s"ccccccccccV$shared39!Wddddddddd"),
      (5L, "entirely different content with no shared runs at all plus padding to forty"))
      .map { case (id, t) => (id, t, "en", "test", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    rows(Dedup.dedupSubstring(spark, d)).map(_.take(2)) shouldBe Seq(Seq(1L, 2L))
  }

  test("semantic-dedup pair expansion is bounded on a one-giant-cluster corpus") {
    import org.apache.spark.sql.functions.{array, lit}
    import graft.extensions.Similarity
    import spark.implicits._
    // Every member lands in ONE cluster: unbounded all-pairs would expand
    // m(m-1)/2 = 1225 pairs; the rank-window equi-join must produce exactly
    // window*(window+1)/2 + (m-window-1)*window and never enumerate more.
    val m = 50
    val w = 8
    val members = (1L to m.toLong).toDF("vec_id")
      .withColumn("cent_id", lit(0L))
      .withColumn("v", array(lit(1.0d)))
      .withColumn("nrm", lit(1.0d))
    val pairs = Similarity.semanticPairs(members, w)
    pairs.count() shouldBe (w * (w + 1) / 2 + (m - w - 1) * w)
    // and each member probes at most `w` predecessors
    pairs.groupBy("vb").count().agg(org.apache.spark.sql.functions.max("count"))
      .head().getLong(0) should be <= w.toLong
  }

  test("fuzzy-name dedup plans as an equi-join, not a cross product") {
    import spark.implicits._
    Seq("alpha beta", "alpha betb", "gamma").toDF("p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val df = Dedup.dedupFuzzyNames(spark, dir)
    rows(df) shouldBe Seq(Seq("alpha beta", "alpha betb", 1))
    val plan = df.queryExecution.executedPlan
    plan.collect { case j: CartesianProductExec => j } shouldBe empty
    plan.collect { case j: BroadcastNestedLoopJoinExec => j } shouldBe empty
  }
}

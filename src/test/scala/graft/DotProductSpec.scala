package graft

import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Differential tests: native codegen DotProductDouble vs the interpreted
  * HOF formulation must agree bit-for-bit (same left-to-right summation). */
class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val vecs = (1 to 40).map { i =>
    (i.toLong, Seq.fill(64)(rnd.nextDouble() * 2 - 1))
  }

  test("custom dot product matches HOF bit-for-bit on random vectors") {
    val df = vecs.toDF("id", "v")
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select(
        Portable.dot(col("a.v"), col("b.v")).as("native"),
        Portable.dotHof(col("a.v"), col("b.v")).as("hof"))
    pairs.filter(col("native") =!= col("hof")).count() shouldBe 0L
  }

  test("interpreted eval path (codegen disabled) matches too") {
    withSqlConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val df = vecs.take(8).toDF("id", "v")
      val pairs = df.as("a").crossJoin(df.as("b"))
        .select(Portable.dot(col("a.v"), col("b.v")).as("native"),
                Portable.dotHof(col("a.v"), col("b.v")).as("hof"))
      pairs.filter(col("native") =!= col("hof")).count() shouldBe 0L
    }
  }

  test("null and length-mismatch semantics") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 99.0))), // shorter bounds loop
      (None, Some(Seq(1.0))),                            // null -> null
    ).toDF("a", "b")
    val r = df.select(Portable.dot(col("a"), col("b"))).collect()
    r(0).getDouble(0) shouldBe 11.0
    r(1).isNullAt(0) shouldBe true
  }

  test("l2norm is sqrt of self-dot") {
    val df = Seq(Tuple1(Seq(3.0, 4.0))).toDF("v")
    df.select(Portable.l2norm(col("v"))).collect()(0).getDouble(0) shouldBe 5.0
  }

  private def withSqlConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

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

  test("native hash60 matches the composed md5/conv formulation exactly") {
    // the engine-wide shuffle key: native digest-byte read vs the composed
    // hex-string chain must agree on ASCII, unicode, empty, and long inputs
    val strs = Seq("", "a", "the quick brown fox", "Jürgen Müller Über Études",
      "x" * 10000, "tab\tand\nnewline", "0", "∑∫√ unicode ≠ ascii") ++
      (1 to 200).map(i => s"doc-$i shingle ${i * 7}")
    val df = strs.toDF("s")
    val diff = df.select(
        Portable.hash60(col("s")).as("native"),
        Portable.hash60Composed(col("s")).as("composed"))
      .filter(col("native") =!= col("composed") || col("native").isNull)
    diff.count() shouldBe 0L
    // null propagates
    Seq[Option[String]](None).toDF("s")
      .select(Portable.hash60(col("s"))).collect()(0).isNullAt(0) shouldBe true
  }

  test("hash60 interpreted eval path matches too") {
    withSqlConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val df = Seq("a", "Jürgen", "x" * 500).toDF("s")
      df.select(Portable.hash60(col("s")).as("n"),
          Portable.hash60Composed(col("s")).as("c"))
        .filter(col("n") =!= col("c")).count() shouldBe 0L
    }
  }

  test("deflate length separates repetitive from high-entropy text") {
    val rnd = new scala.util.Random(11)
    val noisy = Seq.fill(2000)(rnd.nextPrintableChar()).mkString
    val boiler = "lorem ipsum dolor sit amet " * 74 // ~2000 chars
    val df = Seq(("noise", noisy), ("boiler", boiler)).toDF("k", "s")
      .select(col("k"), Portable.deflateLen(col("s")).as("n"),
        octet_length(col("s")).as("raw"))
    val m = df.collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    // boilerplate compresses to a small fraction; noise stays near raw size
    m("boiler")._1.toDouble / m("boiler")._2 should be < 0.1
    m("noise")._1.toDouble / m("noise")._2 should be > 0.5
    // deterministic across evaluations
    val again = Seq(("noise", noisy)).toDF("k", "s")
      .select(Portable.deflateLen(col("s"))).collect()(0).getInt(0)
    again shouldBe m("noise")._1
    // null propagates; empty input is a tiny fixed stream
    Seq[Option[String]](None).toDF("s")
      .select(Portable.deflateLen(col("s"))).collect()(0).isNullAt(0) shouldBe true
  }

  test("deflate length interpreted eval path matches codegen") {
    val strs = Seq("", "aaaa", "the quick brown fox", "Jürgen Über", "z" * 5000)
    val cg = strs.toDF("s").select(Portable.deflateLen(col("s"))).collect().map(_.getInt(0)).toSeq
    withSqlConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = strs.toDF("s").select(Portable.deflateLen(col("s"))).collect().map(_.getInt(0)).toSeq
      interp shouldBe cg
    }
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

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver star schema (TESTDATA.md) plus the derived
  * "publication" analog relations (FIXTURES.md §2): each `orders` row is a
  * publication; its "authors" are the distinct suppliers of its lineitems
  * (reference: author list of a record, Homework2.scala:53-57); its "venue"
  * is the customer's nation (reference venue CASE, Homework2.scala:42-51);
  * its "year" is year(o_orderdate).
  *
  * Scale notes:
  *  - `nation`/`region` are constant-size dimensions (25/5 rows at any SF) —
  *    always broadcast, so venue derivation never shuffles the fact side.
  *  - `customer`/`supplier` scale with SF; joins against them stay plain
  *    equi-joins and AQE picks broadcast vs shuffle at runtime.
  *  - `distinct` on (pub_key, author) is a single hash exchange keyed on the
  *    pair — the same key the downstream per-author aggregations reuse.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Schema cache keyed by file path: without an explicit schema, EVERY
    * `spark.read.parquet` runs a footer-inference job before the query
    * even plans — hundreds of such jobs across the registry for the same
    * handful of immutable source files. The first read per path infers
    * and remembers; later reads hand Spark the schema and skip the job.
    * Metadata only (never rows), bounded by the source-table count. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Round-robin fan-out to full parallelism — placed between a narrow
    * source projection and CPU-heavy per-row work (regex chains, window
    * hashing, signature loops). Scan parallelism is bounded by parquet
    * row groups, and Spark fuses per-row expressions into the scan stage:
    * over few/monolithic row groups (the driver testdata is ONE group per
    * table) the expensive map otherwise runs on as many cores as there
    * are groups, not as many as the machine has. The shuffled payload is
    * the projected input (small), never the expanded features. On a real
    * many-file corpus the scan is already wide and this exchange is pure
    * overhead — so call sites opt in only where per-row cost dominates. */
  def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` has shipped in two parquet encodings across driver data
    * generations, so the reader adapts to what the file declares:
    *
    *  - TIMESTAMP(NANOS): Spark 4 refuses to map it to microsecond
    *    TimestampType; under `spark.sql.legacy.parquet.nanosAsLong=true`
    *    (set by the Verify/Bench/Run mains and SparkTestBase) it arrives
    *    as BIGINT nanos and floor-divides to micros — exactly DuckDB's
    *    ns→µs truncation, so oracle parity holds.
    *  - TIMESTAMP(MICROS) without timezone (current generation): Spark
    *    reads TIMESTAMP_NTZ; cast to session-zoned TimestampType — the
    *    sessions run UTC, so the instants are bit-identical to DuckDB's
    *    naive reading of the same file.
    *
    * Either way downstream sees the same micros-precision TimestampType
    * column. A reader helper must not mutate session-global conf as a
    * side effect, so the nanos legacy flag stays a builder concern. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df // already session-zoned micros TimestampType
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** One row per publication: (pub_key, venue, yr, title). */
  def pubs(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val c = customer(spark, dir)
    val n = nation(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(
        o("o_orderkey").as("pub_key"),
        n("n_name").as("venue"),
        year(o("o_orderdate")).as("yr"),
        o("o_orderkey").cast("string").as("title"))
  }

  /** One row per (publication, author): distinct (l_orderkey, s_name).
    * Deduped on the narrow (orderkey, suppkey) key pair BEFORE the name
    * join — the distinct's shuffle moves two longs per row instead of
    * long+string, and the join input shrinks to the deduped pairs
    * (s_name is functionally dependent on s_suppkey, so the result set is
    * identical). */
  def pubAuthors(spark: SparkSession, dir: String): DataFrame = {
    val pairs = lineitem(spark, dir)
      .select(col("l_orderkey").as("pub_key"), col("l_suppkey"))
      .distinct()
    val s = supplier(spark, dir)
    pairs.join(s, pairs("l_suppkey") === s("s_suppkey"))
      .select(col("pub_key"), s("s_name").as("author"))
  }

  /** Author-list size per publication: (pub_key, na). */
  def pubAuthorCounts(spark: SparkSession, dir: String): DataFrame =
    pubAuthors(spark, dir).groupBy("pub_key").agg(count(lit(1)).as("na"))

  /** Materialize [[pubAuthors]] as a `pub_key`-bucketed managed table and
    * return it. Every t1/t5/t6 re-query over the result reads pre-hashed,
    * pre-sorted buckets: the per-pub window/agg/join needs NO exchange of
    * the fact relation (plan-asserted in LayoutSpec) — pay the lineitem
    * distinct's shuffle once, not per query. */
  def materializePubAuthors(spark: SparkSession, dir: String,
                            table: String = "pub_authors_b",
                            buckets: Int = 32): DataFrame = {
    Sinks.writeBucketed(pubAuthors(spark, dir), table, buckets,
      bucketCols = Seq("pub_key"), sortCols = Seq("pub_key"))
    spark.table(table)
  }
}

package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file BLOOM FILTER indexes — point-lookup data skipping for
  * columns min/max statistics cannot help with.
  *
  * File-range stats prune a predicate column only when the LAYOUT
  * correlates with it (clustered key, sorted/Z-ordered stats column). A
  * needle-in-a-haystack lookup — `WHERE user_id = 12345` on a table
  * clustered by something else — finds every file's [min,max] spanning
  * the whole domain, and stats prune nothing. A bloom filter is the
  * structure for exactly that case: a specific VALUE appears in few
  * files even when every file holds millions of DISTINCT values, and a
  * per-file filter answers "definitely absent" with no false negatives.
  * This is the role of Delta's bloom filter index and Iceberg's puffin
  * blobs, rebuilt on public primitives.
  *
  * Architecture — sized for the 100 TB point, where the honest
  * constraint is that a useful bloom over a multi-million-row file is
  * MEGABYTES (≈ bitsPerRow bits/row), which can never live in a
  * metadata-sized manifest entry:
  *
  *  - SIDECARS: blooms live in parquet sidecar files under
  *    `_bloom/bloom-*.parquet` — rows of (file basename, physical
  *    column, m, k, sparse words+bits arrays). They are an INDEX, not
  *    table state: auxiliary, rebuildable, correctness-neutral (a
  *    missing or stale-extra row can only mean "don't prune"), so they
  *    deliberately sit OUTSIDE the commit protocol, like Delta's
  *    `_delta_index` directory.
  *  - BUILD is one distributed pass over the target files: hash each
  *    value twice (seeded XxHash64 — Kirsch–Mitzenmacher double
  *    hashing gives k positions from 2 hashes), explode k bit
  *    positions, `bit_or` per (file, word) with map-side partial
  *    aggregation, assemble sparse arrays per file. Cost O(rows·k)
  *    shuffled as pre-combined words — never O(rows²), never collected.
  *  - PROBE is a distributed job over the sidecars only: each executor
  *    row tests the predicate's hashed values against one file's bloom
  *    and ships back a single boolean — the driver receives O(files)
  *    booleans, never bloom bytes. Reading every sidecar costs
  *    ~bitsPerRow/8 bytes per row indexed, i.e. ~1–2 % of scanning the
  *    candidate files themselves — the same economics that make Delta
  *    read its per-file index before the file.
  *  - The declared column set rides a tiny `_bloom/columns.json`
  *    marker; every subsequent write maintains blooms for its NEW files
  *    in the same pass that computes their stats. Files written before
  *    the declaration simply have no coverage and are never pruned —
  *    `ANALYZE … COMPUTE BLOOM` retrofits them.
  *
  * m is sized per file from its ACTUAL row count (`bitsPerRow` bits per
  * row, k = 7 ⇒ fpp ≈ 0.8 % at the default 10), so small files carry
  * small blooms; the sparse (word, bits) representation keeps sidecar
  * bytes proportional to set bits. */
object LakeBloom {

  /** Fixed hash count — with bitsPerRow ≥ 8 the optimum k = ln2·bits/row
    * is ≥ 5.5; 7 keeps fpp < 1 % at the default sizing and makes probe
    * cost constant. */
  val K = 7

  private val SeedA = 42L
  private val SeedB = 0x9E3779B97F4A7C15L // golden-ratio odd constant

  val DefaultBitsPerRow = 10

  private[sources] def bloomDir(root: Path) = new Path(root, "_bloom")
  private def markerPath(root: Path) = new Path(bloomDir(root), "columns.json")

  /** The declared bloom columns (PHYSICAL names, like every file-level
    * artifact) and the sizing in force. */
  case class Config(cols: Seq[String], bitsPerRow: Int)

  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  def readConfig(fs: FileSystem, root: Path): Option[Config] =
    if (!fs.exists(markerPath(root))) None
    else {
      val in = fs.open(markerPath(root))
      val n = try mapper.readTree(new String(in.readAllBytes(),
        StandardCharsets.UTF_8)) finally in.close()
      import scala.jdk.CollectionConverters._
      Some(Config(
        n.get("cols").elements().asScala.map(_.asText()).toSeq,
        if (n.has("bitsPerRow")) n.get("bitsPerRow").asInt()
        else DefaultBitsPerRow))
    }

  /** Last-writer-wins overwrite — the marker is rare-admin-verb config,
    * not transactional state (racing ANALYZEs converge on a union via
    * read-merge-write in [[LakeTable.analyzeBloom]]). */
  private[graft] def writeConfig(fs: FileSystem, root: Path,
                                 cfg: Config): Unit = {
    fs.mkdirs(bloomDir(root))
    val out = fs.create(markerPath(root), true)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(scala.collection.immutable.ListMap(
        "cols" -> cfg.cols, "bitsPerRow" -> cfg.bitsPerRow))
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Bits for a file of `rows` rows — multiple of 64, floored so tiny
    * files still get a useful filter. */
  private[sources] def mBits(rows: Long, bitsPerRow: Int): Long = {
    val raw = math.max(4096L, rows * bitsPerRow)
    ((raw + 63) / 64) * 64
  }

  /** Driver-side (h1, h2) for a probe value, via the SAME Catalyst
    * XxHash64 the build job runs — both sides hash a LongType stat-unit
    * value or a raw StringType value, so positions can never diverge. */
  private def hashPair(lit: Literal): (Long, Long) = (
    XxHash64(Seq(lit), SeedA).eval(null).asInstanceOf[Long],
    XxHash64(Seq(lit), SeedB).eval(null).asInstanceOf[Long])

  def hashLong(v: Long): (Long, Long) = hashPair(Literal(v, LongType))

  def hashString(s: String): (Long, Long) =
    hashPair(Literal(UTF8String.fromString(s), StringType))

  /** Executor-side membership test against one sparse bloom. `words` is
    * sorted ascending (sort_array at build). */
  private[sources] def mightContain(words: Array[Long], bits: Array[Long],
                                    m: Long, k: Int,
                                    h1: Long, h2: Long): Boolean = {
    var i = 0
    while (i < k) {
      val x = h1 + i * h2
      val pos = ((x % m) + m) % m
      val word = pos >>> 6
      val idx = java.util.Arrays.binarySearch(words, word)
      if (idx < 0) return false
      if ((bits(idx) & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  private def seededXx(c: Column, seed: Long): Column =
    org.apache.spark.sql.graft.GraftBloom.xxhash64Seeded(c, seed)

  /** Hashable value column in build units: integral/date/timestamp →
    * stat-unit Long (exactly [[Lake.statLong]]), strings raw. None for
    * unsupported types. */
  private[sources] def hashable(df: DataFrame, c: String): Option[Column] =
    df.schema(c).dataType match {
      case StringType => Some(col(c))
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType => Some(Lake.statLong(df, c))
      case _ => None
    }

  /** Build blooms for the files `data` scans (one sidecar parquet set
    * per call) — `rowsByName` sizes each file's m from its actual row
    * count. `data` must carry every column in `cols`. */
  private[sources] def build(spark: SparkSession, root: Path,
                             data: DataFrame, rowsByName: Map[String, Long],
                             cols: Seq[String], bitsPerRow: Int): Unit = {
    val usable = cols.filter(c => hashable(data, c).isDefined)
    if (usable.isEmpty || rowsByName.isEmpty) return
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    val mDf = broadcast(rowsByName.toSeq
      .map { case (n, r) => (n, mBits(r, bitsPerRow)) }.toDF("fname", "m"))
    // k positions per value in a UDF: the double-hash arithmetic WRAPS
    // (Java Long semantics, mirrored exactly by mightContain's probe) —
    // ANSI-mode SQL arithmetic would instead raise on overflow
    val kk = K
    val posUdf = udf((h1: Long, h2: Long, m: Long) =>
      Array.tabulate(kk) { i =>
        val x = h1 + i * h2
        ((x % m) + m) % m
      })
    val perCol = usable.map { c =>
      val v = hashable(data, c).get
      data.select(
          substring_index(input_file_name(), "/", -1).as("fname"), v.as("v"))
        .where(col("v").isNotNull)
        .select(col("fname"),
          seededXx(col("v"), SeedA).as("h1"), seededXx(col("v"), SeedB).as("h2"))
        .join(mDf, "fname")
        .select(col("fname"), col("m"),
          explode(posUdf(col("h1"), col("h2"), col("m"))).as("pos"))
        .groupBy(col("fname"), col("m"), expr("pos div 64").as("word"))
        .agg(expr("bit_or(shiftleft(1L, int(pos % 64)))").as("wbits"))
        .groupBy("fname")
        .agg(first(col("m")).as("m"),
          sort_array(collect_list(struct(col("word"), col("wbits"))))
            .as("pairs"))
        .select(col("fname"), lit(c).as("col"), col("m"), lit(K).as("k"),
          expr("transform(pairs, p -> p.word)").as("words"),
          expr("transform(pairs, p -> p.wbits)").as("bits"))
    }
    val out = perCol.reduce(_ unionByName _)
    val tmp = new Path(root, s"_scratch-bloom-${UUID.randomUUID()}")
    try {
      out.write.mode("overwrite").parquet(tmp.toString)
      fs.mkdirs(bloomDir(root))
      fs.listStatus(tmp).iterator.filter(_.getPath.getName.endsWith(".parquet"))
        .foreach { s =>
          val dest = new Path(bloomDir(root),
            s"bloom-${UUID.randomUUID()}.parquet")
          require(fs.rename(s.getPath, dest), s"rename ${s.getPath} failed")
        }
    } finally fs.delete(tmp, true)
    probeCache.clear()
  }

  private def sidecars(fs: FileSystem, root: Path): Seq[Path] = {
    val d = bloomDir(root)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).iterator.map(_.getPath)
      .filter(_.getName.startsWith("bloom-")).toSeq
  }

  /** (root, col, values, sidecar-set) → basename → "may contain" verdict.
    * Sidecar part files are immutable and uuid-named, so the name set IS
    * the content identity. */
  private val probeCache = Lake.lruMap[String, Map[String, Boolean]](256)

  private[sources] def clearCache(): Unit = probeCache.clear()

  /** Distributed probe: for every file with bloom coverage of `colName`,
    * whether it MAY satisfy `conjuncts` (each inner seq: the hashed
    * members of one point conjunct — the file passes iff every conjunct
    * has at least one maybe-present member). Files absent from the
    * result have no coverage and must be kept. */
  private[graft] def probe(spark: SparkSession, root: Path, colName: String,
                             conjuncts: Seq[Seq[(Long, Long)]])
      : Map[String, Boolean] = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = sidecars(fs, root)
    if (parts.isEmpty || conjuncts.isEmpty) return Map.empty
    val key = root.toString + "|" + colName + "|" +
      parts.map(_.getName).sorted.mkString(",") + "|" +
      conjuncts.map(_.sorted.mkString(";")).mkString("&")
    val hit = probeCache.get(key)
    if (hit != null) return hit
    val cs: Seq[Seq[(Long, Long)]] = conjuncts // stable closure capture
    val passUdf = udf((m: Long, k: Int,
                       words: scala.collection.Seq[Long],
                       bits: scala.collection.Seq[Long]) => {
      val wa = words.toArray
      val ba = bits.toArray
      cs.forall(_.exists { case (h1, h2) =>
        mightContain(wa, ba, m, k, h1, h2)
      })
    })
    val res = spark.read.parquet(parts.map(_.toString): _*)
      .where(col("col") === colName)
      .select(col("fname"),
        passUdf(col("m"), col("k"), col("words"), col("bits")).as("pass"))
      .groupBy("fname")
      // multiple sidecar rows for one file (re-ANALYZE) are independent
      // valid blooms of the same bytes — intersecting them is sound and
      // tightest
      .agg(expr("bool_and(pass)").as("pass"))
      .collect()
      .map(r => r.getString(0) -> r.getBoolean(1))
      .toMap
    probeCache.put(key, res)
    res
  }

  /** Per-column COVERAGE of a snapshot's data files: for every declared
    * bloom column, (files with a bloom row, total files) — the decay
    * metric `graft_lake_detail` surfaces so an operator can see "0.4
    * coverage after a week of merges" and re-ANALYZE. One column-pruned
    * distinct scan over the sidecars (index-sized I/O). Empty when no
    * bloom index is declared. */
  private[sources] def coverage(spark: SparkSession, root: Path,
                                liveFiles: Set[String])
      : Map[String, (Int, Int)] = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readConfig(fs, root) match {
      case None => Map.empty
      case Some(cfg) =>
        val parts = sidecars(fs, root)
        val covered: Map[String, Set[String]] =
          if (parts.isEmpty) Map.empty
          else spark.read.parquet(parts.map(_.toString): _*)
            .select(col("col"), col("fname")).distinct().collect()
            .groupBy(_.getString(0))
            .view.mapValues(_.map(_.getString(1)).toSet).toMap
        cfg.cols.map(c => c -> ((
          covered.getOrElse(c, Set.empty).count(liveFiles),
          liveFiles.size))).toMap
    }
  }

  /** Sidecar GC for [[LakeTable.vacuum]]: drop every sidecar whose rows
    * all reference dead files (one column-pruned scan over the sidecars;
    * a sidecar with ANY live row stays whole — stale rows are inert). */
  private[sources] def vacuumSidecars(spark: SparkSession, root: Path,
                                      live: Set[String]): Int = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = sidecars(fs, root)
    if (parts.isEmpty) return 0
    val byPart = spark.read.parquet(parts.map(_.toString): _*)
      .select(input_file_name().as("part"), col("fname"))
      .distinct().collect()
      .groupBy(r => new Path(r.getString(0)).getName)
      .view.mapValues(_.map(_.getString(1)).toSet).toMap
    val dead = parts.filter(p =>
      byPart.get(p.getName).exists(names => names.forall(!live(_))))
    dead.foreach(p => fs.delete(p, false))
    if (dead.nonEmpty) probeCache.clear()
    dead.size
  }
}

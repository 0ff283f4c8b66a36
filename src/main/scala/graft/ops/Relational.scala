package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operators — one definition each for the patterns the
  * reference hand-rolls inside mapper/reducer classes (SURVEY.md §2):
  * K1 top-k-per-group eviction map, A5 arg-max rows per group, A4 string
  * aggregation, A3 longest consecutive run. Each is a pure
  * DataFrame/Column transform so Catalyst can push filters through them and
  * fuse them into whole-stage codegen.
  */
object Relational {

  /** A helper-column name guaranteed absent from `df` — these are public
    * generic operators, so a caller's own "rk" column must survive intact. */
  private def freshName(df: DataFrame, base: String): String =
    if (!df.columns.contains(base)) base
    else Iterator.from(1).map(i => s"${base}_$i")
      .find(n => !df.columns.contains(n)).get

  /** K1 (reference: Homework2.scala:92-126 — per-venue eviction map, correct
    * only with one reducer, SURVEY.md Q2). Genuinely distributed here: one
    * hash exchange on `groupCols`, per-partition sort, row_number, filter —
    * no global sort, no driver materialization.
    *
    * `order` must be a total order within a group (add a tiebreak column)
    * for deterministic output.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val rk = freshName(df, "rk")
    df.withColumn(rk, row_number().over(Window.partitionBy(groupCols: _*).orderBy(order: _*)))
      .filter(col(rk) <= k)
      .drop(rk)
  }

  /** A5 (reference: Homework2.scala:321-366 — arg-max kept per *mapper split*,
    * never reconciled globally, SURVEY.md Q5). This is the intended global
    * semantics: rank()==1 keeps all rows tied for the group max.
    */
  def argMaxPerGroup(df: DataFrame, groupCols: Seq[Column], order: Column): DataFrame = {
    val rk = freshName(df, "rk")
    df.withColumn(rk, rank().over(Window.partitionBy(groupCols: _*).orderBy(order.desc)))
      .filter(col(rk) === 1)
      .drop(rk)
  }

  /** SCD-1 upsert (the MERGE shape without a table format): update rows win
    * on key collision, unmatched target rows pass through, new keys insert.
    * Both sides hash-shuffle once on the key for the anti-join — the same
    * dataflow a Delta/Iceberg MERGE lowers to, minus the file rewrite.
    * `updates` must carry the target's schema (unionByName). */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    target.join(updates, keys, "left_anti").unionByName(updates)

  /** CDC compaction / latest-snapshot: the single newest row per key under
    * `order` (add tiebreaks for a total order). One exchange on the key;
    * partial+final WindowGroupLimit keeps a task's candidate set at one row
    * per key before the shuffle. */
  def latestByKey(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    topKPerGroup(df, keys, order, 1)

  /** A4 (reference: Homework2.scala:272-276 — '|'-prefixed concat in reducer).
    * Deterministic variant: elements sorted before joining (the reference's
    * order is shuffle-arrival order, not reproducible). No leading separator
    * (documented deviation).
    */
  def sortedStringAgg(values: Column, sep: String): Column =
    concat_ws(sep, array_sort(collect_list(values)))

  /** A3 (reference: yearsOfLongestContinuum, Homework2.scala:206-227).
    * Longest run of consecutive ints in an array column. Duplicates are
    * deduped first — the *intended* semantics; the reference's repeated year
    * resets a streak (SURVEY.md Q3). Set `strictReference=true` to replicate
    * that bug bit-for-bit.
    *
    * Pure higher-order functions over the array — stays inside codegen, no
    * UDF, no driver round-trip.
    */
  def longestConsecutiveRun(values: Column, strictReference: Boolean = false): Column = {
    val sorted =
      if (strictReference) array_sort(values)
      else array_sort(array_distinct(values))
    aggregate(
      sorted,
      struct(lit(0).as("best"), lit(0).as("cur"), lit(Int.MinValue).as("prev")),
      (acc, y) => {
        val cur = when(y === acc.getField("prev") + 1, acc.getField("cur") + 1).otherwise(lit(1))
        struct(
          greatest(acc.getField("best"), cur).as("best"),
          cur.as("cur"),
          y.as("prev"))
      },
      acc => acc.getField("best"))
  }

  /** A3 at scale: longest consecutive run per key *without* materializing a
    * per-key array (a 100 TB-safe formulation — state per row is O(1)).
    * Gaps-and-islands: island-id = value − row_number() per key ordered by
    * value; island length = count; answer = max island length per key.
    * Output: (k, longest_run).
    */
  def longestRunPerKey(df: DataFrame, key: Column, value: Column): DataFrame = {
    val distinctKV = df.select(key.as("k"), value.as("v")).distinct()
    distinctKV
      .withColumn("island", col("v") - row_number().over(Window.partitionBy("k").orderBy("v")))
      .groupBy("k", "island").agg(count(lit(1)).as("len"))
      .groupBy("k").agg(max("len").as("longest_run"))
  }

  /** Exact distributed NTILE — the scale-safe replacement for
    * `ntile(b).over(Window.orderBy(...))`. Spark executes an un-partitioned
    * window as a single-partition total sort ("Moving all data to a single
    * partition"): one task holds the whole relation, so the lane melts at
    * scale even though its per-row cost is linear. This produces the SAME
    * buckets for any *total* `order` (include a unique tiebreak column):
    *
    *  1. range-exchange the rows on the sort key (`repartitionByRange`), so
    *     partition p holds exactly the rows ranked between partitions p-1
    *     and p+1 — no partition sees more than ~n/P rows;
    *  2. sort within partitions and read (partition id, local rank)
    *     straight out of `monotonically_increasing_id` — its documented
    *     layout is partition id in the upper 31 bits, per-partition record
    *     number in the lower 33, so after the in-partition sort it IS the
    *     local ranking, with no WindowExec and no second exchange (AQE may
    *     coalesce contiguous range partitions; contiguity keeps the
    *     cross-partition order, and the sort runs after coalescing);
    *  3. aggregate per-partition row counts (P rows, metadata-sized),
    *     triangular-join them into per-partition rank offsets, and
    *     broadcast the offsets back: global rank = offset + local rank;
    *  4. apply NTILE's fixed formula of (rank, total): with n rows and b
    *     buckets, the first n%b buckets take ⌈n/b⌉ rows, the rest ⌊n/b⌋.
    *
    * The exchange width comes from a row-count probe (one aggregate-only
    * pass, the same probe-before-plan move as the text vocabulary screen):
    * ≤ [[NtileRowsPerTask]] rows plan a ONE-partition exchange — a single
    * small sort, matching the old global window's work without its
    * WindowExec — and larger inputs fan out so no task ever sorts more
    * than ~[[NtileRowsPerTask]] rows. Either way the plan contains no
    * un-partitioned window at ANY size, so the structural lint
    * (`WindowPlanLintSpec`) holds without a data-size carve-out.
    * RangePartitioner's boundary sampling is seeded per partition index,
    * so recomputation reproduces identical partition ids. Bucket
    * arithmetic goes through doubles — exact below 2^53 rows.
    *
    * `knownCount` skips the probe when the caller already counted the
    * relation (e.g. three NTILE passes over the same rows count once). */
  def withDistributedNtile(df: DataFrame, buckets: Int, outCol: String,
                           order: Seq[Column], knownCount: Long = -1L): DataFrame =
    withDistributedNtileSized(df, buckets, outCol, order, NtileRowsPerTask,
      knownCount)

  /** Rows a single task sorts comfortably (~40 B/row ⇒ ~160 MiB). */
  val NtileRowsPerTask: Long = 4L << 20

  /** [[withDistributedNtile]] with an explicit per-task row budget — the
    * spec hook that forces the multi-partition offsets path on small data. */
  private[graft] def withDistributedNtileSized(
      df: DataFrame, buckets: Int, outCol: String, order: Seq[Column],
      rowsPerTask: Long, knownCount: Long = -1L): DataFrame = {
    require(buckets >= 1, s"ntile buckets must be >= 1, got $buckets")
    val pid = freshName(df, "nt_pid")
    val lrn = freshName(df, "nt_lrn")
    val off = freshName(df, "nt_off")
    val rk  = freshName(df, "nt_rank")
    val cnt = freshName(df, "nt_cnt")
    val pL  = freshName(df, "nt_p")
    val pR  = freshName(df, "nt_q")
    val cR  = freshName(df, "nt_d")
    val mid = freshName(df, "nt_mid")
    val n = if (knownCount >= 0) knownCount else df.count()
    val parts = math.max(1L,
      math.min((n + rowsPerTask - 1) / rowsPerTask, 1L << 16)).toInt
    val local = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(mid, monotonically_increasing_id())
      .withColumn(pid, shiftright(col(mid), 33))
      .withColumn(lrn, col(mid).bitwiseAND(lit((1L << 33) - 1)) + 1L)
      .drop(mid)
    val ranked =
      if (parts == 1) local.withColumn(rk, col(lrn)) // offset is always 0
      else {
        val counts = local.groupBy(col(pid)).agg(count(lit(1)).as(cnt))
        val offs = counts.select(col(pid).as(pL), col(cnt))
          .join(broadcast(counts.select(col(pid).as(pR), col(cnt).as(cR))),
            col(pR) < col(pL), "left")
          .groupBy(col(pL))
          .agg(coalesce(sum(col(cR)), lit(0L)).as(off))
        local.join(broadcast(offs), col(pid) === col(pL))
          .withColumn(rk, col(off) + col(lrn))
          .drop(off, pL)
      }
    // NTILE formula over the driver-known total: small = n/b rows per
    // bucket, the first n%b buckets hold one extra row each.
    val small = n / buckets
    val rem = n % buckets
    val cut = rem * (small + 1) // rows covered by the big buckets
    val bucket = when(col(rk) <= cut, floor((col(rk) - 1) / (small + 1)))
      .otherwise(lit(rem) + floor((col(rk) - cut - 1) / math.max(small, 1L)))
    ranked
      .withColumn(outCol, (bucket + 1).cast("int"))
      .drop(pid, lrn, rk)
  }

  /** Strict-reference twin of [[longestRunPerKey]]: replays the reference's
    * Q3 quirk (Homework2.scala:206-227) where a DUPLICATE year resets the
    * streak — so `[2000, 2000, 2001]` scores 2, not a deduped 2-run.
    * The `v − row_number` island id is wrong under duplicates (two separate
    * runs can collide on one id, e.g. [1,2,4,4,5] → a phantom 4-run), so
    * this uses the lag-boundary form: mark rows where v ≠ prev+1, running-sum
    * the marks into run ids, count per run. Still O(1) state per row —
    * bit-parity with the reference bug WITHOUT its per-author array. */
  def longestRunPerKeyStrict(df: DataFrame, key: Column, value: Column): DataFrame = {
    val w = Window.partitionBy("k").orderBy("v", "rn")
    df.select(key.as("k"), value.as("v"))
      .withColumn("rn", row_number().over(Window.partitionBy("k").orderBy("v")))
      .withColumn("boundary",
        when(col("v") === lag("v", 1).over(w) + 1, 0).otherwise(1))
      .withColumn("run_id", sum("boundary").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("k", "run_id").agg(count(lit(1)).as("len"))
      .groupBy("k").agg(max("len").as("longest_run"))
  }
}

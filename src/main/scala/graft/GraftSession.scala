package graft

import org.apache.spark.sql.SparkSession

/** Engine-standard session tuning, shared by every entry point (bench,
  * verify, plan dump, scale/task-binary audits, tests) so measured
  * artifacts and the driver's correctness runs configure the same engine.
  *
  * The task-binary budget knobs deserve the long comment: Spark's
  * injected runtime bloom filters (`InjectRuntimeFilter`) default to
  * `numBits` = 8,388,608 — a 1 MiB bit array PER FILTER, and the
  * materialized filter ships EMBEDDED IN THE TASK BINARY of every stage
  * that applies it. Over scan branches with no stats (e.g. checkpointed
  * sub-relations) the build-side estimate is unknown, so sizing always
  * falls back to that 1 MiB worst case: TaskBinAudit measured 2–3 MiB
  * task binaries on the staged-retrieval queries — at a 10k-task cluster
  * stage that is tens of GB of scheduler broadcast + task-description
  * traffic per query. 128 KiB keeps the semi-join pruning (FPP ≈ 1.5%
  * at the 131k-item expectation, degrading gracefully for bigger builds,
  * which the 10 MB creation-side threshold bounds anyway) at 8× less
  * wire cost; `TaskBinarySpec` gates the whole registry under 1 MiB of
  * per-stage binary.
  */
object GraftSession {

  /** Bits per injected runtime bloom filter (128 KiB serialized). */
  val BloomFilterBits = 1048576L

  val tuning: Seq[(String, String)] = Seq(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.ui.enabled" -> "false",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems" -> "131072",
    "spark.sql.optimizer.runtime.bloomFilter.numBits" -> BloomFilterBits.toString,
    "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> BloomFilterBits.toString)

  /** Fold the standard tuning into a builder; master, parallelism and
    * extension registration stay caller-owned. */
  def tune(b: SparkSession.Builder): SparkSession.Builder =
    tuning.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}

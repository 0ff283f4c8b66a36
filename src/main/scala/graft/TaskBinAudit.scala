package graft

import scala.collection.mutable

import org.apache.spark.ShuffleDependency
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession

/** Task-binary audit: for every registered query, measure the serialized
  * size of each scheduler stage's terminal RDD — the dominant component of
  * the task binary `DAGScheduler` broadcasts to every executor per stage.
  * A plan that embeds megabyte literals (codebooks, merge tables, plane
  * matrices) ships them once PER STAGE PER EXECUTOR via the broadcast,
  * and at a 10k-task cluster stage the scheduler pays for it again in
  * task-description traffic. The audit exists because that cost is
  * invisible at local[32]: the bench merely logs `Broadcasting large task
  * binary` warnings without attributing them to a query.
  *
  * Stage terminals are exactly the RDDs `DAGScheduler.submitMissingTasks`
  * serializes: every `ShuffleDependency.rdd` (a ShuffleMapStage's last
  * RDD) plus the job's final RDD. Serialization uses the same closure
  * serializer the scheduler uses, so sizes match the logged warnings to
  * within the (small) task-function overhead.
  *
  * Usage: runMain graft.TaskBinAudit <sfDir> [queryName...]
  * Prints one line per query: `name maxKiB stageCount` (descending), then
  * a `# offenders > limitKiB` summary. Exits nonzero if any query exceeds
  * [[TaskBinAudit.LimitKiB]] so it can double as a CI gate.
  */
object TaskBinAudit {

  /** Budget per stage task binary. DAGScheduler warns at 1000 KiB; staying
    * under it keeps scheduler broadcast traffic off the critical path. */
  val LimitKiB = 1000

  /** All stage-terminal RDDs reachable from `last` (shuffle-map terminals
    * plus the result-stage terminal), deduped by RDD id. */
  private[graft] def stageTerminals(last: RDD[_]): Seq[RDD[_]] = {
    val seen = mutable.Set[Int]()
    val terms = mutable.LinkedHashMap[Int, RDD[_]](last.id -> last)
    def walk(r: RDD[_]): Unit = if (seen.add(r.id)) {
      r.dependencies.foreach { d =>
        d match {
          case s: ShuffleDependency[_, _, _] => terms.getOrElseUpdate(s.rdd.id, s.rdd)
          case _ =>
        }
        walk(d.rdd)
      }
    }
    walk(last)
    terms.values.toSeq
  }

  /** Max serialized stage-terminal size in bytes for a physical plan. */
  private[graft] def maxStageBinaryBytes(df: org.apache.spark.sql.DataFrame): (Long, Int) = {
    val ser = org.apache.spark.SparkEnv.get.closureSerializer.newInstance()
    val terms = stageTerminals(df.queryExecution.toRdd)
    val sizes = terms.map(t => ser.serialize[AnyRef](t).limit().toLong)
    (if (sizes.isEmpty) 0L else sizes.max, terms.size)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TaskBinAudit <sfDir> [queryName...]")
    val sfDir = args.head
    val names = args.tail.toSet
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftSessionExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val unknown = names -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => names.isEmpty || names(q._1))

    // single-query mode additionally breaks the size down per stage
    // terminal (first plan line of each), to localize the fat stage
    if (ordered.size == 1) {
      val ser = org.apache.spark.SparkEnv.get.closureSerializer.newInstance()
      val df = ordered.head._2(spark, sfDir)
      stageTerminals(df.queryExecution.toRdd).foreach { t =>
        val sz = ser.serialize[AnyRef](t).limit()
        println(f"  stage rdd=${t.id}%4d ${sz / 1024.0}%9.1f KiB  ${t.toString.takeWhile(_ != '\n').take(120)}")
      }
    }

    val rows = ordered.map { case (name, fn) =>
      val (bytes, nStages) =
        try maxStageBinaryBytes(fn(spark, sfDir))
        catch { case scala.util.control.NonFatal(e) =>
          println(s"# ERROR $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
          (-1L, 0)
        }
      (name, bytes, nStages)
    }
    rows.sortBy(-_._2).foreach { case (name, bytes, n) =>
      println(f"$name%-40s ${bytes / 1024.0}%9.1f KiB  $n%3d stages")
    }
    val offenders = rows.filter(_._2 > LimitKiB * 1024L)
    println(s"# offenders > $LimitKiB KiB: ${offenders.size}" +
      (if (offenders.nonEmpty) " — " + offenders.map(_._1).mkString(", ") else ""))
    spark.stop()
    if (offenders.nonEmpty) sys.exit(1)
  }
}

package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Per-query formatted-plan dump for optimization-round evidence:
  * writes `outDir/<query>_<suffix>.txt` with `.explain("formatted")`
  * for each named query, on the SAME input-sized session config the
  * bench runs (so the dumped plans are the executed shapes, not
  * Spark-default ones).
  *
  * `sbt "runMain graft.tools.PlanFiles <sfDir> <outDir> <suffix> <q1,q2,...>"`
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanFiles <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.InputTuning.configure(
        graft.LocalSpark.hardened(SparkSession.builder())
          .config("spark.sql.shuffle.partitions", cpus),
        sfDir, cpus.toInt)
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    // SPARK_GRAFT_PLAN_EXEC=1: execute the query (collect) BEFORE
    // dumping, so AQE queries show the runtime-FINAL plan
    // (isFinalPlan=true) — exchange reuse, AQEShuffleRead and
    // join-strategy changes are decided at runtime and absent from
    // the pre-execution explain.
    val exec = sys.env.get("SPARK_GRAFT_PLAN_EXEC").contains("1")
    for (name <- names.split(",").map(_.trim).filter(_.nonEmpty)) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      spark.catalog.clearCache()
      val df = fn(spark, sfDir)
      if (exec) df.collect()
      val plan = df.queryExecution.explainString(FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"[planfiles] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}

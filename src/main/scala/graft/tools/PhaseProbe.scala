package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for the td19/td20 ladder (r20 session
  * evidence only — not part of any query path): times each pass of
  * the escalation ladder in isolation at a given SF so optimization
  * effort lands where the seconds are.
  * `sbt "runMain graft.tools.PhaseProbe <sfDir>"` */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("localdata/sf10")
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
    import spark.implicits._
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val bigrams = docs
      .select(split(col("text"), " ").as("a"))
      .select(explode(expr(
        "CASE WHEN size(a) > 1 THEN zip_with(" +
          "slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1), " +
          "(x, y) -> concat(x, ' ', y)) ELSE array() END")).as("token"))
    val unigrams = docs
      .select(explode(split(col("text"), " ")).as("token"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    for (round <- 1 to 3) {
      println(s"[probe] --- round $round ---")
      time("td20 noop(bigrams)") {
        bigrams.write.format("noop").mode("overwrite").save()
      }
      time("td20 sketch@2048") {
        bigrams.as[String]
          .select(new graft.functions.MisraGries(2048).toColumn).head()
      }
      time("td20 hll") {
        bigrams.agg(approx_count_distinct(col("token"), 0.02)).head()
      }
      time("td20 exact groupBy topk") {
        bigrams.groupBy("token").agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), asc("token")).limit(20).collect()
      }
      time("td19 sketch@256") {
        unigrams.as[String]
          .select(new graft.functions.MisraGries(256).toColumn).head()
      }
      time("td19 exact groupBy topk") {
        unigrams.groupBy("token").agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), asc("token")).limit(20).collect()
      }
    }
    spark.stop()
  }
}

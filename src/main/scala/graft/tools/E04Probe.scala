package graft.tools

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r20 evidence probe for e04's sporadic 10-100x sf10 outliers (runs
  * of 30-156 s against a ~1.9 s steady state on identical plans).
  * Measures wall vs process-CPU vs GC time for the bare
  * `get_json_object` projection, repeated in one JVM.
  *
  * Findings (recorded in OPTIMIZATION_r20.md): slow runs burn
  * proportionally MORE CPU (up to 4,147 CPU-s vs 37 steady) with
  * near-zero GC time and no hypervisor steal — thread dumps during
  * the storm sit in Jackson's `BufferRecyclers.getBufferRecycler` →
  * `ThreadLocal$ThreadLocalMap.getEntryAfterMiss`, i.e. a per-row
  * ThreadLocal linear-probe storm in the JSON parser's buffer
  * recycler, which stochastically persists for tens of millions of
  * rows before the maps settle. Not steal (trace flat), not cgroup
  * (no quota), not GC (<0.4 s), not JIT tier (reproduces with
  * -XX:TieredStopAtLevel=1 and CICompilerCount=12), not heap sizing
  * (-Xms=-Xmx made it worse). The e04 plan itself is optimal (one
  * pruned scan, codegen, two sub-kilobyte exchanges); both engines
  * pay the per-row JSON parse by design, and min-of-3 absorbs the
  * storm in bench artifacts. A Jackson-free custom extractor was
  * REJECTED: replicating get_json_object semantics on arbitrary
  * inputs (escapes, duplicates, nesting) is a silent-divergence risk
  * the sf0.01 oracle cannot exercise.
  *
  * `sbt "runMain graft.tools.E04Probe [sfDir]"`
  */
object E04Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("localdata/sf10")
    val spark = graft.InputTuning.configure(
        graft.LocalSpark.hardened(SparkSession.builder())
          .config("spark.sql.shuffle.partitions", "32"), sfDir, 32)
      .master("local[32]").config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.table(spark, sfDir, "events")
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def gcMs: (Long, Long) = {
      val bs =
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      (bs.map(_.getCollectionTime).sum, bs.map(_.getCollectionCount).sum)
    }
    def time(l: String)(f: => Unit): Unit = {
      val (g0, n0) = gcMs; val c0 = os.getProcessCpuTime
      val t0 = System.nanoTime(); f
      val w = (System.nanoTime() - t0) / 1e9
      val c = (os.getProcessCpuTime - c0) / 1e9
      val (g1, n1) = gcMs
      println(f"[e04probe] $l%-22s wall $w%7.3f s  cpu $c%8.3f s  " +
        f"gc ${(g1 - g0) / 1000.0}%7.3f s/${n1 - n0}%d colls")
    }
    time("warm scan") {
      e.select("props").write.format("noop").mode("overwrite").save()
    }
    for (r <- 1 to 8)
      time(s"r$r json extract") {
        e.select(get_json_object(col("props"), "$.k").cast("long").as("k"))
          .write.format("noop").mode("overwrite").save()
      }
    spark.stop()
  }
}

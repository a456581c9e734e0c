package graft.tools
import org.apache.spark.sql.SparkSession
object CCRepro {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSpark.hardened(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cases: Map[String, List[(Long, Long)]] = Map(
      "original" -> List((20L,18L), (17L,21L), (23L,2L), (16L,8L), (13L,9L), (19L,19L)),
      "shrunk"   -> List((0L,-1L), (1L,-2L), (5L,2L), (-4L,4L), (3L,9L), (19L,19L)))
    for ((name, es) <- cases; rep <- 1 to 5) {
      val (labels, rounds) = graft.queries.TextPipeline.connectedComponents(
        es.toDF("doc_a", "doc_b"), driverMaxEdges = 0)
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      println(s"[cc] $name rep$rep rounds=$rounds got=$got")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev tool: stage-level timing of incremental_media_keep at a given
  * sf — where do the shard-side seconds go?
  * Usage: sbt "Test/runMain graft.tools.IncrKeepProbe [sfDir]"
  */
object IncrKeepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 9)
    val shard = docs.filter(col("doc_id") % 10 === 9)
    val st = t("corpus state (build)") {
      graft.multimodal.MediaKeep.mediaCorpusState(corpus)
    }
    t("state cache hit") {
      graft.multimodal.MediaKeep.mediaCorpusState(corpus)
    }
    for (k <- 1 to 2) {
      val out = t(s"incremental construct #$k") {
        graft.multimodal.MediaKeep.incrementalMediaKeep(shard, st)
      }
      t(s"incremental write #$k") {
        out.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

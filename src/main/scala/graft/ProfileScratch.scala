package graft

import org.apache.spark.sql.functions._

/** Throwaway piecewise profiler for optimization rounds (not an entry;
  * not part of the driver contract). Times labeled sub-plans of hot
  * entries through the noop sink to attribute entry seconds to stages.
  */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session(master = s"local[$cpus]", shufflePartitions = cpus)
    Engine.quietBoundedWindowWarnings()
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    // warmup (mirror Bench)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("tokenize only") {
      docs.select(col("doc_id"), expr(graft.operators.TextAnalysis.toksExpr).as("toks"))
    }
    time("tokenize+shingle") {
      docs.select(col("doc_id"), expr(graft.operators.TextAnalysis.toksExpr).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), graft.functions.TextUdfs.shingle3(col("toks")).as("sh"))
    }
    time("tok+shingle+explode+md5") {
      docs.select(col("doc_id"), expr(graft.operators.TextAnalysis.toksExpr).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(graft.functions.TextUdfs.shingle3(col("toks"))).as("raw"))
        .select(col("doc_id"), conv(substring(md5(col("raw")), 1, 15), 16, 10).cast("long").as("sh"))
    }
    time("...+groupBy(sh) buckets") {
      docs.select(col("doc_id"), expr(graft.operators.TextAnalysis.toksExpr).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(graft.functions.TextUdfs.shingle3(col("toks"))).as("raw"))
        .select(col("doc_id"), conv(substring(md5(col("raw")), 1, 15), 16, 10).cast("long").as("sh"))
        .groupBy(col("sh")).agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")).between(2, 500))
    }
    // full entries for reference, twice each (JIT)
    for (n <- args; rep <- 1 to 2)
      time(s"ENTRY $n rep$rep")(SparkEntry.queries(n)(spark, sfDir))
    spark.stop()
  }
}

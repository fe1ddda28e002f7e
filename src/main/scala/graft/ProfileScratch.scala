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
    time("floor: range sum") { spark.range(1000000).selectExpr("sum(id)") }
    time("floor: lineitem agg") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
    }
    time("floor: lineitem agg again") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
    }
    time("ann: edge build (gsEdges)") {
      graft.operators.Similarity.gsEdges(spark, sfDir)
    }
    time("ann: edge build rep2") {
      graft.operators.Similarity.gsEdges(spark, sfDir)
    }
    // full entries for reference, twice each (JIT)
    for (n <- args; rep <- 1 to 2)
      time(s"ENTRY $n rep$rep")(SparkEntry.queries(n)(spark, sfDir))
    spark.stop()
  }
}

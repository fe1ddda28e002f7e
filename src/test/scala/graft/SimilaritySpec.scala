package graft

import graft.operators.Similarity

/** ANN quality promises from SURVEY §2: LSH recall vs the exact
  * brute-force baseline, and baseline sanity. */
class SimilaritySpec extends SparkTestBase {

  test("knn graph: k edges per node, in-block only, ranked, mutuality symmetric") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions._
    val df = Similarity.knnGraph(spark, sf).cache()
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(df.count() == n * Similarity.KnnGraphK)
    // neighbors share the node's block (label)
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id").as("neighbor_id"), col("label").as("nb_label"))
    assert(df.join(labels, Seq("neighbor_id"))
      .filter(col("label") =!= col("nb_label")).count() == 0)
    // rank 1 cosine >= rank k cosine per node
    val r1 = df.filter(col("rank") === 1).select(col("vec_id"), col("cosine").as("c1"))
    val rk = df.filter(col("rank") === Similarity.KnnGraphK)
      .select(col("vec_id"), col("cosine").as("ck"))
    assert(r1.join(rk, Seq("vec_id")).filter(col("c1") < col("ck")).count() == 0)
    // mutual edges really have a reverse edge
    val fwd = df.select(col("vec_id"), col("neighbor_id"), col("mutual"))
    val bad = fwd.filter(col("mutual"))
      .join(fwd.select(col("vec_id").as("neighbor_id"), col("neighbor_id").as("vec_id")),
        Seq("vec_id", "neighbor_id"), "left_anti")
    assert(bad.count() == 0)
    df.unpersist()
  }

  test("lsh ANN achieves recall@5 >= 0.8 vs brute force") {
    import spark.implicits._
    val brute = Similarity.bruteForceTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall@${Similarity.TopK} = $recall " +
      s"(brute=${brute.size}, lsh=${lsh.size})")
  }

  test("ivf ANN achieves recall@5 >= 0.6 vs brute force") {
    import spark.implicits._
    val brute = Similarity.bruteForceTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"ivf recall@${Similarity.TopK} = $recall " +
      s"(brute=${brute.size}, ivf=${ivf.size})")
  }

  test("pq ANN achieves recall@5 >= 0.6 vs brute force") {
    import spark.implicits._
    val brute = Similarity.bruteForceTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect pq).size.toDouble / brute.size
    assert(recall >= 0.6, s"pq recall@${Similarity.TopK} = $recall " +
      s"(brute=${brute.size}, pq=${pq.size})")
  }

  test("packed-pq ANN matches plain pq recall and the packed column round-trips every code") {
    import spark.implicits._
    val brute = Similarity.bruteForceTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val packed = Similarity.pqPackedTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect packed).size.toDouble / brute.size
    assert(recall >= 0.6, s"packed-pq recall@${Similarity.TopK} = $recall")
    // 8 bytes per vector, and every 4-bit field stays in [0, 16)
    val codes = Similarity.pqPackedCodes(spark, sf).collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val p = r.getLong(1)
      assert(p >= 0 && p < (1L << 32), s"8 x 4-bit codes must fit 32 bits: $p")
    }
  }

  test("ivf-pq ANN achieves recall@5 >= 0.5 vs brute force, bounded by ivf's candidates") {
    import spark.implicits._
    val brute = Similarity.bruteForceTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfpq = Similarity.ivfPqTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivfpq).size.toDouble / brute.size
    assert(recall >= 0.5, s"ivf-pq recall@${Similarity.TopK} = $recall " +
      s"(brute=${brute.size}, ivfpq=${ivfpq.size})")
    // the exact re-rank can only return vectors from probed cells:
    // every IVF-PQ hit must also be an IVF candidate-universe member
    val ivf = Similarity.ivfTopK(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val agreement = (ivf intersect ivfpq).size.toDouble / ivf.size
    assert(agreement >= 0.5, s"ivf-pq should largely agree with ivf: $agreement")
  }

  test("brute-force top-k is rank-ordered with valid cosines") {
    val rows = Similarity.bruteForceTopK(spark, sf).collect()
    assert(rows.length == Similarity.NumQueries * Similarity.TopK)
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to Similarity.TopK))
      val cos = sorted.map(_.getDouble(2))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b - 1e-9 },
        s"not descending: ${cos.mkString(",")}")
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("IVF stats: one row per cell, populations partition the corpus") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Similarity.ivfStats(spark, sf).cache()
    assert(df.count() == graft.operators.Similarity.NumCells, "every cell reported, even empty")
    val total = graft.sources.Tables.embeddings(spark, sf).count()
    val assigned = df.agg(sum("n_vectors")).collect()(0).getLong(0)
    assert(assigned == total, "hard assignment partitions the corpus exactly")
    assert(df.filter(col("pop_share") < 0 || col("pop_share") > 1).count() == 0)
    assert(df.filter(col("n_vectors") > 0 && (col("avg_norm2").isNull || col("avg_norm2") <= 0))
      .count() == 0, "non-empty cells have positive mean energy")
    df.unpersist()
  }

  test("filtered top-k: every neighbor shares the query's label") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Similarity.filteredTopK(spark, sf)
    val labels = graft.sources.Tables.embeddings(spark, sf).select("vec_id", "label")
    val wrong = df.join(labels.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("label", "n_label"), Seq("neighbor_id"))
      .filter(col("label") =!= col("n_label"))
    assert(wrong.count() == 0, "predicate must constrain the candidate set")
    assert(df.count() > 0)
  }
  test("hybrid RRF: fused top-k is bounded and every hit has at least one ranking") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Similarity.hybridRrf(spark, sf).cache()
    assert(df.count() > 0)
    val perQ = df.groupBy("query_id").agg(count(lit(1)).as("k"))
    assert(perQ.filter(col("k") > graft.operators.Similarity.RrfTopK).count() == 0)
    // rrf score bounds: one list -> <= 1/61; both lists -> <= 2/61
    val hi = 2.0 / (graft.operators.Similarity.RrfK + 1)
    assert(df.filter(col("rrf_score") <= 0 || col("rrf_score") > hi + 1e-9).count() == 0)
    df.unpersist()
  }

  test("semantic dedup: one row per vector, keepers canonical, dup_of within cell and below id") {
    import org.apache.spark.sql.functions._
    val df = Similarity.semanticDedup(spark, sf).cache()
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(df.count() == n, "exactly one verdict per vector")
    // keep <=> no dup_of; dropped rows carry a qualifying cosine
    assert(df.filter(col("keep") && col("dup_of").isNotNull).count() == 0)
    assert(df.filter(!col("keep") &&
      (col("dup_of").isNull || col("max_cos") < Similarity.SemTau)).count() == 0)
    // dup_of points at a lower id in the SAME cell (cluster-bounded candidates)
    val cells = df.select(col("vec_id").as("dup_of"), col("cell").as("cell_of"))
    val bad = df.filter(!col("keep")).join(cells, Seq("dup_of"))
      .filter(col("cell_of") =!= col("cell") || col("dup_of") >= col("vec_id"))
    assert(bad.count() == 0)
    // the canonical target of every drop is itself kept OR has a still-lower dup
    assert(df.filter(!col("keep")).count() > 0, "threshold must actually drop rows")
    df.unpersist()
  }

  test("graph search: beam discipline holds and recall@5 vs in-block exact is high") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = Similarity.graphSearch(spark, sf)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(got.length == Similarity.NumQueries * Similarity.TopK)
    got.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to Similarity.TopK), s"q$q ranks")
      assert(sorted.sliding(2).forall { case Array(a, b) => a._3 >= b._3; case _ => true },
        s"q$q cosine must be non-increasing in rank")
      assert(rows.forall(_._2 != q), "query must not retrieve itself")
    }
    // exact in-block top-5 as truth (the same blocking the graph uses)
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val q = emb.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("qid"), col("label").as("ql"), col("v").as("qv"))
    val truth = emb.join(q, col("label") === col("ql") && col("vec_id") =!= col("qid"))
      .withColumn("cos", expr("graft_dot(qv, v)")
        / (sqrt(expr("graft_norm2(qv)")) * sqrt(expr("graft_norm2(v)"))))
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk") <= Similarity.TopK)
      .select(col("qid"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val gotSets = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = truth.keys.toSeq.map { k =>
      (truth(k) intersect gotSets(k)).size.toDouble / Similarity.TopK
    }.sum / truth.size
    assert(recall >= 0.8, s"mean recall@5 $recall below bound")
  }

}

package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table.
  *
  * Brute-force top-k is the baseline: broadcast the (small) query
  * side, one narrow pass over the corpus, per-query top-k via window —
  * at 100 TB this is the "score every vector once" plan, which is
  * optimal when the query set is small and the corpus is scanned
  * anyway. The LSH variant is the scale path: random-hyperplane
  * signatures bucket the corpus so each query only scores its bucket
  * collisions (multiple tables to recover recall).
  */
object Similarity {

  type Q = (SparkSession, String) => DataFrame

  import TextAnalysis.trunc4

  /** (vec_id, label, v double[], n2) with squared norm precomputed.
    * Cast + norm are codegen'd (native `graft_norm2` expression); no
    * interpreted lambdas on the per-vector path. */
  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("n2", expr("graft_norm2(v)"))

  private val dotExpr = "graft_dot(qv, v)"

  val NumQueries = 8
  val TopK = 5

  /** Exact cosine top-k for query vectors (vec_id < 8): broadcast
    * queries × one corpus pass, bounded `graft_topk` aggregate — the
    * map-side partial agg ships at most k rows per (partition, query)
    * over the shuffle, vs a window's corpus-wide sort. */
  def bruteForceTopK: Q = (s, d) => {
    val all = emb(s, d)
    val q = all.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n2").as("qn2"))
    all.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr(dotExpr) / (sqrt(col("qn2")) * sqrt(col("n2"))))
      .groupBy(col("query_id"))
      .agg(expr(s"graft_topk(cos, vec_id, $TopK)").as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        trunc4(col("col.score")).as("cosine"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  val bruteForceTopKSql: String =
    s"""SELECT query_id, neighbor_id, floor(cos * 10000) / 10000.0 AS cosine, rank FROM (
          SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                 list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cos,
                 CAST(row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                            e.vec_id) AS INT) AS rank
          FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
          WHERE q.vec_id < $NumQueries) t
        WHERE rank <= $TopK ORDER BY query_id, rank"""

  val NumTables = 8
  val BitsPerTable = 3

  /** Deterministic random hyperplanes (seeded) — the projection basis
    * is code, broadcast implicitly as literals. */
  lazy val hyperplanes: Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumTables)(Seq.fill(BitsPerTable)(Seq.fill(64)(rnd.nextGaussian())))
  }

  /** LSH-bucketed ANN: sign-of-projection signature per table, bucket
    * equi-join, exact cosine re-rank inside buckets. Rows-only (recall
    * vs brute force asserted in SimilaritySpec). */
  def lshTopK: Q = (s, d) => {
    val all = emb(s, d)
    def sigCol(t: Int) = concat(
      (0 until BitsPerTable).map { b =>
        when(expr(s"graft_dot(v, ${planeSql(t, b)})") > 0, "1").otherwise("0")
      }: _*)
    val withSigs = all.select(
      col("vec_id") +: col("v") +: col("n2") +:
        (0 until NumTables).map(t => sigCol(t).as(s"sig$t")): _*)
    val stackArgs = (0 until NumTables).map(t => s"'$t', sig$t").mkString(", ")
    val buckets = withSigs.selectExpr("vec_id", s"stack($NumTables, $stackArgs) as (tbl, sig)")
    val q = buckets.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("tbl"), col("sig"))
    // candidate ids only through the bucket join; vectors re-attached after
    val candIds = buckets.join(broadcast(q), Seq("tbl", "sig"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct()
    val qVecs = all.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n2").as("qn2"))
    candIds
      .join(broadcast(qVecs), "query_id")
      .join(all.select(col("vec_id"), col("v"), col("n2")), "vec_id")
      .withColumn("cos", expr(dotExpr) / (sqrt(col("qn2")) * sqrt(col("n2"))))
      .groupBy(col("query_id"))
      .agg(expr(s"graft_topk(cos, vec_id, $TopK)").as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        trunc4(col("col.score")).as("cosine"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Hyperplane (t, b) as a SQL array literal. */
  private def planeSql(t: Int, b: Int): String =
    hyperplanes(t)(b).map(x => s"cast($x as double)").mkString("array(", ", ", ")")

  val NumCells = 16
  val NProbe = 6
  private val SeedBase = 100L

  /** IVF-style ANN: the corpus is partitioned into `NumCells` Voronoi
    * cells around k-means centroids; each query probes its `NProbe`
    * nearest cells and re-ranks only those candidates — a query scans
    * ~NProbe/NumCells of the corpus instead of all of it, the standard
    * inverted-file trade at billion-vector scale (cells become
    * partition keys; probing = partition pruning).
    *
    * Centroids: deterministic seed vectors at fixed ids refined by
    * `LloydIters` distributed k-means steps (assign → element-wise
    * mean per cell; K×dim means collect to the driver like any model
    * broadcast). Rows-only: recall vs brute force is asserted in
    * SimilaritySpec, like the LSH variant. */
  val LloydIters = 1

  /** Centroids as a broadcastable table (cell, vector, |c|²/2) — NOT
    * literals baked into an expression: a K×dim literal array forces
    * seconds of Janino compilation per distinct centroid set and stops
    * scaling past tiny K. The join form is the same plan IVF uses at
    * K=4096: broadcast the codebook, score per (vector, centroid),
    * argmax/top-probe via the bounded `graft_topk` aggregate. */
  private def centroidDf(s: SparkSession, cents: Array[Array[Double]]): DataFrame = {
    import s.implicits._
    cents.zipWithIndex
      .map { case (c, i) => (i + 1L, c.toSeq, c.map(x => x * x).sum / 2.0) }
      .toSeq.toDF("cell", "cv", "chalf")
  }

  /** Score every (vector, centroid) pair: argmin L2 == argmax
    * (dot - |c|²/2). */
  private def scored(all: DataFrame, cdf: DataFrame): DataFrame =
    all.crossJoin(broadcast(cdf))
      .withColumn("score", expr("graft_dot(v, cv)") - col("chalf"))

  /** Hard assignment: best cell per vector (topk k=1 → deterministic
    * tie-break by lower cell id). */
  private def assign(all: DataFrame, cdf: DataFrame): DataFrame =
    scored(all, cdf)
      .groupBy(col("vec_id"))
      .agg(
        element_at(expr("graft_topk(score, cell, 1)"), 1).getField("id").as("cell"),
        first(col("v")).as("v"), first(col("n2")).as("n2"))

  /** One Lloyd step: assign, element-wise mean per cell. (At larger
    * dims the posexplode becomes a vector-sum aggregate — same shuffle
    * shape.) */
  private def lloydStep(all: DataFrame, cents: Array[Array[Double]]): Array[Array[Double]] = {
    val dim = cents.head.length
    val means = assign(all, centroidDf(all.sparkSession, cents))
      .select(col("cell"), posexplode(col("v")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .collect()
      .groupBy(_.getLong(0))
    (0 until NumCells).map { i =>
      means.get(i + 1L) match {
        case Some(rows) =>
          val m = new Array[Double](dim)
          rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
          m
        case None => cents(i) // empty cell keeps its centroid
      }
    }.toArray
  }

  def ivfTopK: Q = (s, d) => {
    val all = emb(s, d)
    val seeds = all.filter(col("vec_id") >= SeedBase && col("vec_id") < SeedBase + NumCells)
      .select(col("vec_id"), col("v"), col("n2"))
      .collect()
      .sortBy(_.getLong(0))
      .map(r => r.getSeq[Double](1).toArray)
    require(seeds.length == NumCells, s"need $NumCells seed vectors at ids $SeedBase+")
    val cents = (1 to LloydIters).foldLeft(seeds)((c, _) => lloydStep(all, c))
    val cdf = centroidDf(s, cents)
    val corpus = assign(all, cdf)
    // queries probe their NProbe best cells
    val q = scored(all.filter(col("vec_id") < NumQueries), cdf)
      .groupBy(col("vec_id"))
      .agg(expr(s"graft_topk(score, cell, $NProbe)").as("pc"),
        first(col("v")).as("qv"), first(col("n2")).as("qn2"))
      .select(col("vec_id").as("query_id"), col("qv"), col("qn2"),
        explode(col("pc")).as("p"))
      .select(col("query_id"), col("qv"), col("qn2"), col("p").getField("id").as("cell"))
    corpus.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr(dotExpr) / (sqrt(col("qn2")) * sqrt(col("n2"))))
      .groupBy(col("query_id"))
      .agg(expr(s"graft_topk(cos, vec_id, $TopK)").as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        trunc4(col("col.score")).as("cosine"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  val RangeTau = 0.25

  /** Radius (range) search: ALL neighbors with cosine ≥ τ per query —
    * the fixed-threshold sibling of top-k (retrieval dedup / near-match
    * audit). Same broadcast-queries single-corpus-pass shape as brute
    * force; the filter replaces the bounded aggregate, so output size
    * is data-dependent and no per-query state is held at all. */
  def rangeSearch: Q = (s, d) => {
    val all = emb(s, d)
    val q = all.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n2").as("qn2"))
    all.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr(dotExpr) / (sqrt(col("qn2")) * sqrt(col("n2"))))
      .filter(col("cos") >= RangeTau)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), trunc4(col("cos")).as("cosine"))
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  val rangeSearchSql: String =
    s"""SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
          floor(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) * 10000) / 10000.0 AS cosine
        FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
        WHERE q.vec_id < $NumQueries
          AND list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) >= $RangeTau
        ORDER BY query_id, neighbor_id"""

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("ann_bruteforce_topk", bruteForceTopK, Some(bruteForceTopKSql)),
    ("ann_lsh_topk", lshTopK, None),
    ("ann_ivf_topk", ivfTopK, None),
    ("ann_range_search", rangeSearch, Some(rangeSearchSql)))
}

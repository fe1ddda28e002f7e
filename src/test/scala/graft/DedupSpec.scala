package graft

/** dedup_cluster vs a driver-side union-find over the same pair graph:
  * the iterative min-label propagation must produce exactly the
  * canonical (min-id) component assignment. */
class ClusterSpec extends SparkTestBase {
  test("min-label propagation equals union-find components") {
    import spark.implicits._
    val pairs = graft.operators.Dedup.minhashLsh(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = (pairs.flatMap(p => Seq(p._1, p._2)).distinct)
      .map(d => d -> find(d)).toMap
    val got = graft.operators.Cluster.dedupCluster(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got == want,
      s"got=${got.size} want=${want.size} diff=${(want.toSet diff got.toSet).take(3)}")
  }

  test("soft-weight mass conservation: each component contributes ~one doc of ppm mass") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = graft.operators.Cluster.softWeight(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    // one row per source, raw counts conserved
    assert(df.count() == docs.select("source").distinct().count())
    assert(df.agg(sum("docs")).as[Long].head() == docs.count())
    assert(df.agg(sum("chars")).as[Long].head() ==
      docs.agg(sum("n_chars")).as[Long].head())
    // effective doc mass: singletons contribute exactly 1e6 each;
    // every c-sized component sums to <= 1e6 with floor loss < c ppm.
    // Global check: n_components*1e6 >= sum(eff) > n_components*1e6 - total_docs
    val clusters = graft.operators.Cluster.dedupCluster(spark, sf)
    val nComp = clusters.select("cluster_id").distinct().count()
    val nClustered = clusters.count()
    val singles = docs.count() - nClustered
    val eff = df.agg(sum("eff_docs_ppm")).as[Long].head()
    val upper = (singles + nComp) * 1000000L
    assert(eff <= upper && eff > upper - docs.count(),
      s"eff=$eff upper=$upper")
    // weights never exceed 1: effective never exceeds raw
    assert(df.filter(col("eff_docs_ppm") > col("docs") * 1000000L).count() == 0)
    assert(df.filter(col("eff_chars_ppm") > col("chars") * 1000000L).count() == 0)
    assert(df.filter(col("dup_docs") > col("docs")).count() == 0)
    df.unpersist()
  }
}

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Semantics checks for the dedup family beyond the DuckDB oracle:
  * LSH candidate generation vs brute-force ground truth. */
class DedupSpec extends SparkTestBase {

  test("simhash banded candidates equal brute-force hamming<=3 pairs") {
    // brute force: compute all-pairs hamming over the same signatures
    import spark.implicits._
    val banded = Dedup.simhash(spark, sf)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect().toSet

    // reconstruct signatures exactly as the operator does, then all pairs
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(expr(
        s"array_distinct(${graft.operators.TextAnalysis.toksExpr})")).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    val votes = (0 until 64).map(k =>
      sum(when(shiftright(col("h"), k).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$k"))
    val sig = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .withColumn("bits", concat((0 until 64).map(k =>
        when(col(s"v$k") > 0, "1").otherwise("0")): _*))
      .select("doc_id", "bits").as[(Long, String)].collect()
    val brute = (for {
      (a, ba) <- sig; (b, bb) <- sig if a < b
      ham = ba.zip(bb).count { case (x, y) => x != y } if ham <= 3
    } yield (a, b, ham)).toSet
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size} diff=${(banded diff brute).take(5)} ${(brute diff banded).take(5)}")
  }

  test("minhash-LSH finds the strong near-dup pairs ngram-jaccard finds") {
    import spark.implicits._
    val lsh = Dedup.minhashLsh(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val strong = Dedup.ngramJaccard(spark, sf)
      .filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // j>=0.9 pairs collide in a band with prob ~1-(1-0.9^4)^4 ≈ 0.98+;
    // the corpus' strong pairs are near-identical, so demand full recall
    assert(strong.subsetOf(lsh), s"missed: ${strong diff lsh}")
  }

  test("fuzzy-edit nearest neighbor is the true block minimum") {
    import spark.implicits._
    val out = Dedup.fuzzyEdit(spark, sf)
      .select("doc_id", "nn_doc_id", "edit_distance")
      .as[(Long, Long, Int)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._1).distinct.length == out.length, "one row per probe doc")
    // brute-force the same blocks on the driver and compare minima
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        floor(col("n_chars") / Dedup.FuzzyBand).as("band"),
        substring(col("text"), 1, Dedup.FuzzyPrefix).as("prefix"))
      .as[(Long, String, Long, String)].collect()
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val byBlock = docs.groupBy(r => (r._2, r._3))
    val want = byBlock.values.flatMap { block =>
      if (block.length < 2) Nil
      else block.map { a =>
        val best = block.filter(_._1 != a._1)
          .map(b => (lev(a._4, b._4), b._1)).min
        (a._1, best._2, best._1)
      }
    }.toSet
    assert(out.toSet == want,
      s"got=${out.length} want=${want.size} diff=${(want diff out.toSet).take(3)}")
  }

  test("exact dedup groups sum to corpus size") {
    val g = Dedup.exact(spark, sf).agg(sum("n_docs")).head().getLong(0)
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(g == n)
  }

  test("lsh recall eval: caught bounded by truth, high band near-certain") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Dedup.lshRecall(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("n_caught") > col("n_truth")).count() == 0)
    assert(df.filter(col("recall") < 0 || col("recall") > 1).count() == 0)
    // the 0.9+ band must be caught essentially always (S-curve top end)
    val hi = df.filter(col("band_lo") === 0.9)
    if (hi.count() > 0)
      assert(hi.filter(col("recall") < 0.95).count() == 0,
        "LSH must catch nearly all 0.9+ jaccard pairs")
    df.unpersist()
  }
  test("cross-source dedup: winner has the group's best priority, groups are real dups") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Dedup.crossSource(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("n_copies") < 2).count() == 0)
    assert(df.filter(col("n_sources") > col("n_copies")).count() == 0)
    // the kept source's priority really is the group minimum: rejoin
    // docs by fingerprint and compare
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        md5(expr("array_join(array_sort(array_distinct(" +
          graft.operators.TextAnalysis.toksExpr + ")), ' ')")).as("fingerprint"),
        expr("cast(substring(source, 4, 10) as int)").as("prio"))
    val best = docs.groupBy(col("fingerprint")).agg(min(col("prio")).as("best_prio"))
    val bad = df.join(best, Seq("fingerprint"))
      .join(docs.select(col("doc_id").as("keep_doc_id"), col("prio")), Seq("keep_doc_id"))
      .filter(col("prio") =!= col("best_prio"))
    assert(bad.count() == 0, "kept copy must come from the highest-priority source")
    df.unpersist()
  }

  test("LSH S-curve: monotone, endpoints sane, threshold crossing marked once") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Dedup.lshScurve(spark, sf).cache()
    val rows = df.orderBy(col("s_x100")).collect()
    assert(rows.length == 19)
    val ps = rows.map(_.getDouble(4))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b }, "P(candidate) is monotone in s")
    assert(ps.head < 0.01 && ps.last > 0.95, s"endpoints: ${ps.head}, ${ps.last}")
    // detected flag flips exactly once, at the first p >= 0.5
    val flags = rows.map(_.getBoolean(5))
    assert(flags.zip(flags.tail).count { case (a, b) => a != b } == 1)
    df.unpersist()
  }

}

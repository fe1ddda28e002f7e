package graft

import graft.operators.Pipeline

/** Invariants of the training-data pipeline operators: deterministic
  * membership, mixture copy counts, pack-size bounds, band fractions. */
class PipelineSpec extends SparkTestBase {

  test("split is deterministic and ~80/10/10") {
    val a = Pipeline.splitTrainTest(spark, sf).collect()
    val b = Pipeline.splitTrainTest(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "split must be reproducible")
    val byS = a.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    val n = a.length.toDouble
    assert(byS("train") / n > 0.7 && byS("train") / n < 0.9, s"train frac off: $byS")
    assert(byS.getOrElse("val", 0) + byS.getOrElse("test", 0) > 0, s"missing splits: $byS")
    // every doc appears exactly once — splits partition the corpus
    assert(a.map(_.getLong(0)).distinct.length == a.length)
  }

  test("hash sampling membership is invariant under repartitioning") {
    import org.apache.spark.sql.functions._
    // the core determinism claim: unlike rand(seed)/sampleBy, membership
    // is a pure function of the key, so ANY physical layout agrees
    val base = graft.sources.Tables.documents(spark, sf)
    def sampled(parts: Int) =
      Pipeline.sampleStratified(spark, sf).collect().map(_.toSeq).toSeq
    // different shuffle layouts of the same op must agree — and the split
    // assignment per doc must match a single-partition recompute
    val a = Pipeline.splitTrainTest(spark, sf).collect().map(_.toSeq)
    val b = Pipeline.splitTrainTest(spark, sf)
      .repartition(7, col("split")).orderBy(col("doc_id")).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "split must not depend on physical layout")
    assert(sampled(3) == sampled(11), "stratified sample must not depend on layout")
  }

  test("weighted sample is k distinct docs, reproducible, and length-biased") {
    import org.apache.spark.sql.functions._
    val a = Pipeline.sampleWeighted(spark, sf).collect()
    val b = Pipeline.sampleWeighted(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "sample must be reproducible")
    assert(a.length == Pipeline.WeightedK)
    assert(a.map(_.getLong(1)).distinct.length == a.length, "without replacement")
    // inclusion ∝ n_chars must pull the sample's mean length above the
    // corpus mean (deterministic given the fixed hash race — not flaky)
    val sampAvg = a.map(_.getLong(2)).sum.toDouble / a.length
    val corpusAvg = graft.sources.Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sampAvg > corpusAvg, s"sample $sampAvg should exceed corpus $corpusAvg")
  }

  test("mix upsamples odd sources and downsamples even ones") {
    val rows = Pipeline.mixCorpora(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    rows.foreach { case (src, nOut, nUniq) =>
      val odd = src.stripPrefix("src").toInt % 2 == 1
      if (odd) {
        // w=1.8: every doc at least once, some twice
        assert(nOut >= nUniq, s"$src upsample lost docs")
      } else {
        // w=0.6: pure subsample, no copies
        assert(nOut == nUniq, s"$src downsample must not duplicate")
      }
    }
    // global: odd sources expand, even shrink (checked in aggregate to
    // dodge small-sample noise at sf0.001)
    val odds = rows.filter(_._1.stripPrefix("src").toInt % 2 == 1)
    assert(odds.map(_._2).sum > odds.map(_._3).sum, "odd sources should net-expand")
  }

  test("packs respect the token budget up to one document of overflow") {
    val rows = Pipeline.packTokenBudget(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val maxDocTok = graft.sources.Tables.documents(spark, sf)
      .selectExpr("max(cast(ceil(n_chars / 4.0) as bigint))").collect()(0).getLong(0)
    rows.foreach { case (lang, pack, _, tokens) =>
      assert(tokens < Pipeline.PackBudget + maxDocTok,
        s"pack $lang/$pack holds $tokens tokens (budget ${Pipeline.PackBudget}, maxdoc $maxDocTok)")
    }
    // pack ids are contiguous from 0 within each language
    rows.groupBy(_._1).foreach { case (lang, ps) =>
      val ids = ps.map(_._2).sorted.toList
      assert(ids == (0L until ids.length).toList, s"$lang packs not contiguous: $ids")
    }
  }

  test("curation keeps roughly the middle half per language") {
    val kept = Pipeline.curateQualityBand(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = graft.sources.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, n) =>
      val k = kept.getOrElse(lang, 0L).toDouble
      // percent_rank band [0.25, 0.75] keeps ~half (±1 boundary row each side)
      assert(k >= n * 0.5 - 2 && k <= n * 0.5 + 2, s"$lang kept $k of $n")
    }
  }

  test("tfidf ranks 5 terms per language, scores non-increasing") {
    val rows = Pipeline.tfidfTopk(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5)))
    val byLang = rows.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      assert(rs.map(_._5).sorted.toSeq == (1 to rs.length), s"$lang ranks not 1..k")
      val scores = rs.sortBy(_._5).map(_._4)
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y }, s"$lang not sorted: ${scores.toSeq}")
      // df < 5 for every ranked term: a term in all languages has idf 0
      // and can only rank if nothing else is available
      rs.foreach { case (_, tf, df, tfidf, _) =>
        if (df < 5) assert(tfidf >= 0, s"negative tfidf at df=$df tf=$tf") }
    }
  }

  test("best-fit packing: strict capacity, all docs packed, matches the driver replay") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Pipeline.packBestFit(spark, sf).cache()
    val budget = graft.operators.Pipeline.PackBudget
    // strict capacity unless a single oversized doc owns the bin
    assert(df.filter(col("bin_tokens") > budget && col("n_docs") > 1).count() == 0)
    // every doc lands in exactly one bin
    val packed = df.agg(sum("n_docs")).collect()(0).getLong(0)
    assert(packed == graft.sources.Tables.documents(spark, sf).count())
    // the distributed fold equals a driver-side FFD replay per language
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"),
        ceil(col("n_chars") / 4.0).cast("long").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = docs.groupBy(_._1).flatMap { case (lang, ds) =>
      graft.operators.Pipeline.ffdPack(budget.toLong, ds.map(x => (x._2, x._3)).toSeq)
        .map { case (bin, n, tok) => (lang, bin, n, tok) }
    }.toSet
    val got = df.select("lang", "bin_id", "n_docs", "bin_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"distributed FFD must equal the replay: diff=${(want diff got).take(3)}")
    df.unpersist()
  }

  test("class-balanced sample: every class keeps exactly the rarest class count") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Pipeline.sampleClassBalanced(spark, sf).cache()
    val kept = df.select(col("n_kept")).distinct().collect()
    assert(kept.length == 1, "all classes keep the same count")
    val nMin = df.agg(min(col("n_orig"))).head.getLong(0)
    assert(kept.head.getLong(0) == nMin)
    assert(df.filter(col("kept_id_sum") <= 0).count() == 0)
    df.unpersist()
  }
  test("domain cap: at most DomainCap docs per source, equal to the window formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = graft.operators.Pipeline.curateDomainCap(spark, sf).cache()
    val over = df.groupBy("source").agg(count(lit(1)).as("n"))
      .filter(col("n") > graft.operators.Pipeline.DomainCap)
    assert(over.count() == 0)
    // the bounded-aggregate cut equals the textbook row_number window
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
    val want = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("domain_rank", row_number().over(w).cast("int"))
      .filter(col("domain_rank") <= graft.operators.Pipeline.DomainCap)
      .collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == want)
    df.unpersist()
  }

  test("k-fold split: folds partition the corpus, assignment is hash-stable") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Pipeline.splitKfold(spark, sf).cache()
    assert(df.count() == graft.operators.Pipeline.KFolds)
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(df.agg(sum("n_docs")).head.getLong(0) == docs.count())
    assert(df.agg(sum("id_checksum")).head.getLong(0) ==
      docs.agg(sum("doc_id")).head.getLong(0),
      "fold checksums partition the id space exactly")
    // stability: a second run produces the identical manifest
    val again = graft.operators.Pipeline.splitKfold(spark, sf).collect().map(_.toSeq)
    assert(df.collect().map(_.toSeq).sameElements(again))
    df.unpersist()
  }

  test("dataset card: one row per source, tokens and dups consistent with their sources") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Pipeline.datasetCard(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(df.count() == docs.select("source").distinct().count())
    assert(df.agg(sum("n_docs")).head.getLong(0) == docs.count())
    assert(df.filter(col("mean_quality") < 0 || col("mean_quality") > 1).count() == 0)
    assert(df.filter(col("n_dup_docs") > col("n_docs")).count() == 0)
    // token totals recompute per source
    val want = docs.select(col("source"),
        expr(s"size(${graft.operators.TextAnalysis.toksExpr})").as("nt"))
      .groupBy("source").agg(sum("nt").as("tt"))
    assert(df.join(want, "source").filter(col("tokens_total") =!= col("tt")).count() == 0)
    df.unpersist()
  }

  test("budget apportionment: allocations sum exactly to the budget, proportional") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Pipeline.budgetApportion(spark, sf).cache()
    assert(df.agg(sum("alloc")).head.getLong(0) == graft.operators.Pipeline.ApportionBudget,
      "largest-remainder must hit the budget exactly")
    assert(df.filter(col("extra") < 0 || col("extra") > 1).count() == 0)
    // Hamilton quota property: |alloc - exact quota| < 1
    val tw = df.agg(sum("tokens_w")).head.getLong(0).toDouble
    val bad = df.collect().filter { r =>
      val quota = graft.operators.Pipeline.ApportionBudget * r.getLong(1) / tw
      math.abs(r.getLong(4) - quota) >= 1.0
    }
    assert(bad.isEmpty, s"quota violation: ${bad.take(3).mkString}")
    df.unpersist()
  }

  test("sample_poisson: inverse-CDF replication matches a driver-side replay; mean ≈ λ") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val P = graft.operators.Pipeline
    val rows = P.samplePoisson(spark, sf)
      .select("doc_id", "lam_idx", "lam", "n_copies")
      .as[(Long, Int, Double, Int)].collect()
    assert(rows.nonEmpty)
    // thresholds are a proper CDF prefix (monotone, < 1, ends near 1)
    P.PoissonLams.foreach { lam =>
      val ts = P.poissonThresholds(lam)
      assert(ts.length == P.PoissonCap && ts.sliding(2).forall(p => p(0) < p(1)))
      assert(ts.last > 0.99 && ts.last < 1.0)
    }
    // per-doc replay of the same hash draw + threshold count
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.take(100).foreach { case (id, li, lam, k) =>
      assert(lam == P.PoissonLams(li))
      val hx = md.digest(s"psmp:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(hx.take(13), 16).toDouble / 4503599627370496.0
      val want = P.poissonThresholds(lam).count(_ < u)
      assert(k == want, s"doc $id: $k vs $want")
    }
    // law of large numbers, loose: overall mean within 35% of mean λ
    val meanCopies = rows.map(_._4.toDouble).sum / rows.length
    val meanLam = rows.map(_._3).sum / rows.length
    assert(math.abs(meanCopies - meanLam) < 0.35 * meanLam,
      s"mean copies $meanCopies vs mean lam $meanLam")
  }

  test("pipeline_repro_ledger: stages shrink monotonically, digests replay exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Pipeline.reproLedger(spark, sf)
      .as[(Int, String, Long, String)].collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq("raw", "rule_kept", "dedup_survivors", "train_split"))
    assert(rows.sliding(2).forall { case Array(a, b) => b._3 <= a._3; case _ => true },
      "each stage can only drop rows")
    assert(rows.last._3 > 0, "train split must be non-empty")
    // digest replay for the raw stage: sum the same 52-bit hashes driver-side
    val md = java.security.MessageDigest.getInstance("MD5")
    val ids = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").as[Long].collect()
    val want = ids.map { id =>
      val hx = md.digest(s"led:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      BigInt(java.lang.Long.parseLong(hx.take(13), 16))
    }.sum
    assert(BigInt(rows.head._4) == want, s"raw digest ${rows.head._4} vs $want")
    // determinism: a second run reproduces every digest
    val again = graft.operators.Pipeline.reproLedger(spark, sf)
      .as[(Int, String, Long, String)].collect().sortBy(_._1)
    assert(again.toSeq == rows.toSeq)
  }

}

package graft

import graft.operators.{Affinity, PromQl}
import org.apache.spark.sql.functions._

/** Round-11 widening: the MinHash audience-overlap sketch and PromQL
  * count_values (prom_push_sigv4 is pinned in Sigv4Spec,
  * stream_native_histogram in StreamingSpec). */
class Round11Spec extends SparkTestBase {

  test("events_audience_minhash: estimates land within MinHash sampling error") {
    val rows = Affinity.audienceMinhash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nMatch = r.getLong(2)
      val est = r.getDouble(3); val exact = r.getDouble(4); val err = r.getDouble(5)
      assert(nMatch >= 0 && nMatch <= Affinity.AmhSeeds)
      assert(est >= 0.0 && est <= 1.0 && exact >= 0.0 && exact <= 1.0)
      // k=64 → σ = √(J(1−J)/64) ≤ 0.0625; 4σ = 0.25 is a safe bound
      assert(err <= 0.25, s"estimate outside 4σ of exact: $r")
      assert(math.abs(err - math.floor(math.abs(est - exact) * 1e4) / 1e4) < 1e-9)
    }
    // the audiences are genuinely partial overlaps — the sketch has
    // something to estimate (not the degenerate all-1.0 grid)
    assert(rows.exists(_.getDouble(4) < 0.99), "audiences are all identical")
  }

  test("events_audience_minhash reads the corpus once (checkpointed audience set)") {
    val df = Affinity.audienceMinhash(spark, sf)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // everything downstream of the eager localCheckpoint re-reads the
    // materialized audience set, not the parquet corpus
    assert(countScans(p) == 0,
      s"corpus re-scanned past the checkpoint:\n$p")
  }

  test("emb_pca_power fails loudly on out-of-range embeddings instead of wrapping") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r11_pca_guard").toString
    // one value beyond |1.0|: the 4M-row flush headroom proof no longer
    // holds, so the kernel must refuse rather than risk silent Long wrap
    val vecs = (1 to 8).map { r =>
      val v = Array.fill(64)(0.1f)
      if (r == 5) v(7) = 1.75f
      (r.toLong, v.toSeq, r % 2)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[org.apache.spark.SparkException] {
      graft.operators.Similarity.embPcaPower(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("normalize the table")),
      s"expected the loud out-of-range error, got: ${messages(e).take(2)}")
  }

  test("prom_count_values: counts partition the corpus and labels parse back") {
    val rows = PromQl.countValues(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    val corpus = graft.sources.Tables.events(spark, sf).count()
    assert(total == corpus, s"count_values must partition the corpus: $total vs $corpus")
    rows.foreach { r =>
      val label = r.getString(1)
      assert(label.matches("-?\\d+"), s"value label is the rendered integer: $label")
      assert(r.getLong(2) > 0)
    }
    // per series, labels are distinct (it's a GROUP BY — sanity on the dump)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length)
  }
}

package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Compiled per-document kernels for the dedup family.
  *
  * These are deliberately Scala UDFs, not SQL higher-order functions:
  * `transform`/`aggregate` lambdas are interpreted (no whole-stage
  * codegen), measured at ~30µs per array element — the dominant cost of
  * the whole dedup family at sf0.1. A compiled closure does the same
  * per-doc, shuffle-free work at ~100× the speed and is still fully
  * distributed. Tokenization stays in SQL (`TextAnalysis.toksExpr`) so
  * the DuckDB oracle can reproduce it exactly; these UDFs only derive
  * arrays/integers from already-tokenized input with engine-neutral
  * semantics (plain string concat, exact integer math).
  */
object TextUdfs {

  /** word 3-shingles, first-occurrence-distinct — identical to
    * array_distinct(transform(sequence(0, n-3), i -> concat_ws(' ', ...))) */
  val shingle3: UserDefinedFunction = udf { (toks: Seq[String]) =>
    if (toks == null || toks.length < 3) Seq.empty[String]
    else {
      val out = new scala.collection.mutable.ArrayBuffer[String](toks.length - 2)
      val seen = new java.util.HashSet[String]()
      var i = 0
      while (i + 2 < toks.length) {
        val sh = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
        if (seen.add(sh)) out += sh
        i += 1
      }
      out.toSeq
    }
  }

  /** All unordered (a < b) pairs of a sorted id list — compiled combo
    * generation for the shared-shingle candidate step. */
  val pairCombos: UserDefinedFunction = udf { (ds: Seq[Long]) =>
    val n = ds.length
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](n * (n - 1) / 2)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) { out += ((ds(i), ds(j))); j += 1 }
      i += 1
    }
    out.toSeq
  }

  /** 64-bit SimHash from per-token hashes: bit k set iff more than half
    * the hashes have bit k set (majority vote, ties → 0). */
  val packSimhash: UserDefinedFunction = udf { (hs: Seq[Long]) =>
    val n = hs.length
    var sig = 0L
    var k = 0
    while (k < 64) {
      var ones = 0
      var i = 0
      while (i < n) { if (((hs(i) >>> k) & 1L) == 1L) ones += 1; i += 1 }
      if (ones * 2 > n) sig |= (1L << k)
      k += 1
    }
    sig
  }
}

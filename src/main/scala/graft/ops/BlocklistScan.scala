package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern blocklist scanning via Aho–Corasick ('75): ONE pass over
  * each document finds every occurrence of every pattern simultaneously —
  * the banned-phrase / compliance filter a curation pipeline runs where k
  * separate regex passes would cost k× the scan. The automaton (goto +
  * failure links over a char trie) builds once on the driver from the
  * pattern list and ships inside the closure (patterns are tiny; the
  * corpus never shuffles — output is the per-pattern census only).
  *
  * Match-count contract: Aho–Corasick reports ALL occurrences; for
  * border-free patterns (no proper prefix that is also a suffix — true of
  * ordinary words/phrases) that equals the leftmost non-overlapping count
  * a per-pattern `regexp_extract_all` reports, which is what the DuckDB
  * oracle computes. Callers supplying self-overlapping patterns (e.g.
  * "aa") would diverge from that oracle — documented, not silent. */
object BlocklistScan {

  /** Immutable automaton: flat arrays, built once, serializable. */
  final class Automaton(patterns: Seq[String]) extends Serializable {
    // trie over chars; node 0 = root
    private val gotoMaps = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Int]())
    private val outputs = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        val m = gotoMaps(s)
        s = if (m.containsKey(c)) m.get(c) else {
          gotoMaps += new java.util.HashMap[Char, Int]()
          outputs += Nil
          m.put(c, gotoMaps.size - 1)
          gotoMaps.size - 1
        }
      }
      outputs(s) = pi :: outputs(s)
    }
    private val fail = new Array[Int](gotoMaps.size)
    // BFS failure links (Aho–Corasick construction)
    private val queue = scala.collection.mutable.Queue[Int]()
    gotoMaps(0).forEach((_, s) => { fail(s) = 0; queue.enqueue(s) })
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      gotoMaps(r).forEach { (c, s) =>
        queue.enqueue(s)
        var f = fail(r)
        while (f != 0 && !gotoMaps(f).containsKey(c)) f = fail(f)
        fail(s) = if (gotoMaps(f).containsKey(c) && gotoMaps(f).get(c) != s)
          gotoMaps(f).get(c) else 0
        outputs(s) = outputs(s) ++ outputs(fail(s))
      }
    }
    private val gotoArr: Array[java.util.HashMap[Char, Int]] = gotoMaps.toArray
    private val outArr: Array[Array[Int]] = outputs.map(_.toArray).toArray
    val numPatterns: Int = patterns.size

    /** Count matches of every pattern in `text` in one pass. */
    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](numPatterns)
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !gotoArr(s).containsKey(c)) s = fail(s)
        if (gotoArr(s).containsKey(c)) s = gotoArr(s).get(c)
        val out = outArr(s)
        var j = 0
        while (j < out.length) { counts(out(j)) += 1; j += 1 }
        i += 1
      }
      counts
    }
  }

  /** Per-pattern census over the corpus: docs containing each pattern and
    * total occurrences. One typed flatMap (emits ≤ k tiny rows per doc,
    * zero when nothing matches) + one keyed partial+final aggregation over
    * the k pattern keys. */
  def blocklistCensus(df: DataFrame, patterns: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pats = patterns.toIndexedSeq
    val auto = new Automaton(pats)
    df.select(col("text")).as[String]
      .flatMap { text =>
        val c = auto.countAll(text)
        pats.indices.iterator.filter(c(_) > 0).map(i => (pats(i), c(i)))
      }
      .toDF("pattern", "n")
      .groupBy(col("pattern"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_matches"))
      .orderBy(col("pattern"))
  }
}

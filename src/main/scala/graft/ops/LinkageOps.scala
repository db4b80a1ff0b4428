package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (entity resolution) with Fellegi–Sunter
  * style integer agreement weights over a blocked candidate join — the
  * field-based companion to the content-hash dedup family (`DedupOps`):
  * two record sets with NO shared key are matched on fuzzy field
  * agreement (name edit distance, amount proximity, categorical
  * equality), and only pairs whose summed weight clears a threshold are
  * linked.
  *
  * Scale shape: the candidate space is Σ_k |A_k|·|B_k| over the blocking
  * key — never |A|·|B| — so the block key choice IS the cost model, and
  * [[ProfileOps.joinSizePlan]] prices it exactly from two narrow count
  * aggregates before a single candidate is generated. Every comparator is
  * a codegen'd builtin (`levenshtein`, integer abs/CASE), so scoring
  * stays inside whole-stage codegen on the joined stream; no UDFs, no
  * driver collection. Blocking trades recall for cost exactly like LSH
  * banding: a true pair whose blocking field was corrupted never meets
  * (the spec pins this miss class), which production absorbs by unioning
  * several cheap blocking passes.
  *
  * Weights are integers (not log-likelihood doubles) so the linkage is
  * bit-reproducible across engines and the driver oracle can replay the
  * scoring verbatim.
  */
object LinkageOps {

  /** Score all blocked candidate pairs and keep links with
    * `score >= threshold`. Inputs carry columns
    * `(key, name, block, cents, seg)`; output one row per linked pair:
    * `(a_key, b_key, lev, w_name, w_bal, w_seg, score)` ordered by keys.
    *
    *  - name: levenshtein 0 → +24 (exact), ≤2 → +12 (typo/transposition
    *    class), else −8
    *  - cents: |Δ| ≤ `centsTol` → +10, else −6
    *  - seg: equal → +6, else −4
    */
  /** Attribute-identical collapse for the linkage inputs — the r5 lesson
    * shared with `DedupOps.textGroups`/p127: every comparator is a pure
    * function of (name, block, cents, seg), so a crawled/tiled corpus's
    * exact-duplicate records multiply every in-block quadratic by the
    * dup-cluster size squared for no information. Candidates are
    * generated and scored over ONE representative per distinct attribute
    * tuple; member pairs expand arithmetically afterwards (output-sized
    * joins). `is_true` is the one key-DEPENDENT output column and is
    * recomputed per expanded pair, so the expansion is output-identical
    * (spec-pinned). */
  private def attrGroups(df: DataFrame): (DataFrame, DataFrame) = {
    val reps = df.groupBy(col("name"), col("block"), col("cents"),
        col("seg"))
      .agg(min(col("key")).as("key"))
    val members = df.join(reps.select(col("name"), col("block"),
        col("cents"), col("seg"), col("key").as("rep_key")),
      Seq("name", "block", "cents", "seg"))
      .select(col("rep_key"), col("key"))
    (reps.select(col("key"), col("name"), col("block"), col("cents"),
      col("seg")), members)
  }

  def fellegiSunterLinks(a: DataFrame, b: DataFrame,
                         threshold: Int = 18,
                         centsTol: Int = 75,
                         collapseExact: Boolean = true): DataFrame = {
    if (collapseExact) {
      val (ra, ma) = attrGroups(a)
      val (rb, mb) = attrGroups(b)
      val repLinks = fellegiSunterLinks(ra, rb, threshold, centsTol,
        collapseExact = false)
      return repLinks
        .join(ma.select(col("rep_key").as("a_key"), col("key").as("ka")),
          "a_key")
        .join(mb.select(col("rep_key").as("b_key"), col("key").as("kb")),
          "b_key")
        .select(col("ka").as("a_key"), col("kb").as("b_key"), col("lev"),
          col("w_name"), col("w_bal"), col("w_seg"), col("score"),
          (col("ka") === col("kb")).cast("long").as("is_true"))
        .orderBy(col("a_key"), col("b_key"))
    }
    val pa = a.select(col("key").as("a_key"), col("name").as("a_name"),
      col("block"), col("cents").as("a_cents"), col("seg").as("a_seg"))
    val pb = b.select(col("key").as("b_key"), col("name").as("b_name"),
      col("block"), col("cents").as("b_cents"), col("seg").as("b_seg"))
    // Two output-identical prunings derived from the score algebra — the
    // classic ER move of letting the cheap integer comparators gate the
    // expensive string one (isolated re-probe: 29.9 s → see BASELINE.md
    // run 12). Both are guarded by the exact bound that makes them
    // lossless, so a caller lowering `threshold` gets the unpruned plan:
    //  1. cheap-field gate: a pair with BOTH w_bal=−6 and w_seg=−4
    //     scores at most 24−10 = 14, so for threshold ≥ 15 candidates
    //     failing both integer tests are dropped BEFORE levenshtein runs
    //     (~80% of candidates here: 5 segments + a 75-cent band).
    //  2. BOUNDED levenshtein: w_bal+w_seg ≤ 16, so a link needs
    //     w_name ≥ threshold−16 — for threshold ≥ 9 that excludes the
    //     −8 tier, i.e. links have lev ≤ 2, and distance > 3 is
    //     indistinguishable from "far"; the threshold variant runs the
    //     banded O(k·n) DP with early exit instead of the full O(n²)
    //     table. Every emitted `lev` belongs to a linked pair (≤ 2), so
    //     the −1 sentinel never escapes.
    val lev =
      if (threshold >= 9) levenshtein(col("a_name"), col("b_name"), 3)
      else levenshtein(col("a_name"), col("b_name"))
    val candidates = pa.join(pb, Seq("block"))
    val gated =
      if (threshold >= 15)
        candidates.filter(
          abs(col("a_cents") - col("b_cents")) <= centsTol ||
            col("a_seg") === col("b_seg"))
      else candidates
    gated
      .withColumn("lev", lev.cast("long"))
      .withColumn("w_name",
        when(col("lev") === 0, 24L)
          .when(col("lev") > 0 && col("lev") <= 2, 12L) // -1 = beyond bound
          .otherwise(-8L))
      .withColumn("w_bal",
        when(abs(col("a_cents") - col("b_cents")) <= centsTol, 10L)
          .otherwise(-6L))
      .withColumn("w_seg",
        when(col("a_seg") === col("b_seg"), 6L).otherwise(-4L))
      .withColumn("score", col("w_name") + col("w_bal") + col("w_seg"))
      .filter(col("score") >= threshold)
      .select(col("a_key"), col("b_key"), col("lev"), col("w_name"),
        col("w_bal"), col("w_seg"), col("score"),
        (col("a_key") === col("b_key")).cast("long").as("is_true"))
      .orderBy(col("a_key"), col("b_key"))
  }

  /** MULTI-PASS blocking — how production absorbs the single-block
    * recall loss the `fellegiSunterLinks` spec pins (a true pair whose
    * blocking field was corrupted never meets): union the candidates of
    * several cheap blocking passes and score once. Passes here:
    *   1. the caller's `block` field (nation in p118);
    *   2. cents ÷ W bands, W = 2·centsTol + 50;
    *   3. the SAME bands offset by W/2 — the classic two-offset trick:
    *      union-grid boundaries are W/2 apart, so any pair within
    *      W/2 − 1 ≥ centsTol cents straddles at most ONE grid's boundary
    *      and shares a band in the other pass — balance-compatible pairs
    *      are GUARANTEED to meet even when their blocking field was
    *      corrupted, for ANY centsTol (the width derives from it).
    * Banding uses FLOOR division (pmod-adjusted: Spark's `div` truncates
    * toward zero while DuckDB's `//` floors — q118's truncation-vs-floor
    * pin), so arbitrarily negative balances band identically on both
    * engines with no magic nonnegativity shift to outgrow.
    * Scoring is per-pair and deterministic, so unioning the three
    * passes' results and deduplicating rows is equivalent to scoring
    * the deduplicated candidate union (production dedups candidate keys
    * pre-score to avoid the ≤3× comparator cost; at gate scale the row
    * union keeps the code transparently equal to three single passes).
    * Output: superset of the single-pass links — every p118 row plus
    * the recovered corrupted-block pairs. */
  def fellegiSunterLinksMultiPass(a: DataFrame, b: DataFrame,
                                  threshold: Int = 18,
                                  centsTol: Int = 75): DataFrame = {
    val width = 2 * centsTol + 50
    val offset = width / 2
    def reblock(df: DataFrame, e: org.apache.spark.sql.Column) =
      df.withColumn("block", e)
    // floor(x / w) for any-sign x: (x − pmod(x, w)) div w — pmod is
    // nonnegative, so the dividend is an exact multiple and trunc == floor
    def floorBand(shift: Int) =
      expr(s"(cents + $shift - pmod(cents + $shift, $width)) div $width")
    val passes = Seq[DataFrame => DataFrame](
      identity,
      df => reblock(df, floorBand(0)),
      df => reblock(df, floorBand(offset)))
    passes.map(p => fellegiSunterLinks(p(a), p(b), threshold, centsTol))
      .reduce(_.unionByName(_))
      .distinct()
      .orderBy(col("a_key"), col("b_key"))
  }
}

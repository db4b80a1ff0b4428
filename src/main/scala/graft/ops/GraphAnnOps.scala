package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based ANN — NSW-style beam search over a deterministic k-NN
  * graph: the index family most production vector stores actually serve
  * from (HNSW and friends), completing the engine's ANN coverage beside
  * brute force (p07), sign-LSH (p08/p40), IVF-Flat (p13/p89) and PQ
  * (p105–p109).
  *
  * Determinism contract (what makes the family oracle-able and
  * partition-invariant): the graph is the EXACT M-NN adjacency with ties
  * broken by neighbor id; the search entry point is the minimum vec_id;
  * and every beam truncation ranks by (score DESC, node_id ASC) with the
  * bit-stable cosine every ANN op shares (index-order fold, established
  * by p07) — so the visited set after H hops is a pure function of the
  * table, independent of partitioning, and the driver's 8-vs-32-core
  * audit covers it like any other op.
  *
  * Scale shape: the adjacency build below is the brute exactness
  * baseline (same broadcast-kernel contract and row guard as
  * `SimilarityOps.topPairs`); at 10^12 rows the build swaps in LSH/IVF
  * candidate generation + NN-descent refinement with the SAME output
  * schema, so search code never changes. The search itself is the
  * Spark-shaped part: each hop is ONE equi-join of the (query, beam)
  * frontier against the adjacency table keyed by node_id (bucketed by
  * node_id in production, so hops are shuffle-light), the per-hop state
  * is bounded by queries × ef × M rows, and per-hop lineage is truncated
  * with localCheckpoint exactly like the CC/Lloyd/BPE driver loops.
  */
object GraphAnnOps {

  /** Exact M-nearest-neighbor adjacency: (node_id, rank, neighbor_id),
    * rank 1..m by (cosine DESC, neighbor_id ASC). Broadcast-kernel brute
    * build (per-node M-slot insertion against the collected side — same
    * contract, arithmetic and guard as `SimilarityOps.topPairs`): the
    * exactness baseline the 10^12-row NN-descent build is verified
    * against. */
  def buildKnnGraph(emb: DataFrame, m: Int = 4,
                    maxBroadcastRows: Long = SimilarityOps.BruteRowLimit)
      : DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    SimilarityOps.guardBruteContract("buildKnnGraph", emb, maxBroadcastRows,
      "LSH/IVF candidate generation + NN-descent (same adjacency schema)")
    val vecs = emb.select(col("vec_id").cast("long"),
      col("embedding").cast("array<double>")).as[(Long, Array[Double])]
    val side = vecs.collect().sortBy(_._1) // broadcast side (brute contract)
    val ids = side.map(_._1)
    val es = side.map(_._2)
    val norms = es.map(SimilarityOps.norm)
    val bc = spark.sparkContext.broadcast((ids, es, norms))
    vecs.flatMap { case (aId, ae) =>
      val (ids, es, norms) = bc.value
      val an = SimilarityOps.norm(ae)
      // M-slot insertion sort: better = (score >, or == with smaller id)
      val topScore = new Array[Double](m)
      val topId = new Array[Long](m)
      var filled = 0
      var j = 0
      while (j < ids.length) {
        if (ids(j) != aId) {
          val be = es(j)
          var dot = 0.0
          var i = 0
          while (i < ae.length) { dot += ae(i) * be(i); i += 1 }
          val sc = dot / (an * norms(j))
          var pos = filled
          while (pos > 0 && (topScore(pos - 1) < sc ||
            (topScore(pos - 1) == sc && topId(pos - 1) > ids(j)))) pos -= 1
          if (pos < m) {
            val last = math.min(filled, m - 1)
            var q = last
            while (q > pos) {
              topScore(q) = topScore(q - 1); topId(q) = topId(q - 1); q -= 1
            }
            topScore(pos) = sc; topId(pos) = ids(j)
            if (filled < m) filled += 1
          }
        }
        j += 1
      }
      Iterator.range(0, filled).map(r => (aId, (r + 1).toLong, topId(r)))
    }.toDF("node_id", "rnk", "neighbor_id")
      .orderBy(col("node_id"), col("rnk"))
  }

  /** PRODUCTION-SCALE k-NN-graph construction — sign-LSH candidate
    * seeding + NN-descent refinement (Dong, Moses & Li, "Efficient
    * k-nearest neighbor graph construction for generic similarity
    * measures", WWW 2011) — emitting the SAME `(node_id, rnk,
    * neighbor_id)` adjacency schema as [[buildKnnGraph]], so
    * [[beamVisited]]/[[topKFromVisited]] consume either interchangeably.
    * This closes r4 "What's missing #1": the brute build is now the
    * exactness BASELINE only; this is the constructor a 10^9+-row vector
    * index actually runs.
    *
    * Shape, stage by stage — the vector table is NEVER collected and no
    * stage is quadratic in N:
    *   1. SEED: `tables` independent sign-LSH bucketings (the p40
    *      multi-table convention, seed 7 + 1000·t); candidate pairs are
    *      within-bucket with a `maxBucket` cap on hot buckets (the
    *      p25/p127 documented recall trade) — Σ per-bucket quadratics,
    *      bounded by cap², never N².
    *   2. DESCENT round: the current adjacency plus its REVERSE (capped
    *      at m per node by smallest-source-id, the reverse-sampling of
    *      the paper) gives every node a ≤2m undirected neighborhood;
    *      neighbors OF A COMMON NODE become candidate pairs — ≤ C(2m,2)
    *      pairs per node, linear in N per round. Candidates union the
    *      current edges (good edges persist), are scored with the
    *      bit-stable codegen cosine, and each node keeps top-m by
    *      (score DESC, neighbor_id ASC).
    *   3. Repeat `rounds` times (fixed — deterministic work, no
    *      data-dependent convergence test), truncating lineage per round
    *      with localCheckpoint of the BOUNDED adjacency (≤ N·m rows) —
    *      the CC/Lloyd/BPE driver-loop pattern. With
    *      `lineageTruncate = false` the whole build is one lazy Catalyst
    *      plan: constructing it launches ZERO jobs (spec-pinned — the
    *      structural proof nothing in the algorithm materializes the
    *      vector table driver-side).
    *
    * Determinism: buckets, candidate sets, scores and tie-breaks are all
    * pure functions of the table — the output is partition-invariant
    * (spec-pinned under repartition), so the 8-vs-32-core audit covers
    * it like any batch op. Approximation contract: nodes whose buckets
    * are all singletons/capped may emit < m rows (or none) — recall vs
    * the exact graph is MEASURED, not asserted, by the p145 driver row
    * (beam recall over this graph vs p139's brute graph, the p141 sweep
    * pattern). */
  def buildKnnGraphDescent(emb: DataFrame, m: Int = 8, dim: Int = 64,
                           bits: Int = 8, tables: Int = 4, rounds: Int = 3,
                           maxBucket: Int = 1024,
                           lineageTruncate: Boolean = true): DataFrame = {
    val nodes = emb.select(col("vec_id").cast("long").as("node_id"),
      col("embedding").cast("array<double>").as("n_emb"))
    def maybeCk(df: DataFrame): DataFrame =
      if (lineageTruncate) df.localCheckpoint(true) else df

    // rank unordered candidate pairs into a per-node top-m adjacency
    def rankTopM(pairs: DataFrame): DataFrame = {
      val directed = pairs
        .select(col("u").as("node_id"), col("v").as("nb"))
        .unionByName(pairs.select(col("v").as("node_id"), col("u").as("nb")))
        .distinct()
      val scored = directed
        .join(nodes.select(col("node_id"), col("n_emb").as("a_emb")),
          "node_id")
        .join(nodes.select(col("node_id").as("nb"), col("n_emb").as("b_emb")),
          "nb")
        .select(col("node_id"), col("nb"),
          SimilarityOps.cosine(col("a_emb"), col("b_emb")).as("score"))
      val w = Window.partitionBy(col("node_id"))
        .orderBy(col("score").desc, col("nb"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= m)
        .select(col("node_id"), col("rnk"), col("nb").as("neighbor_id"))
    }

    // 1. multi-table sign-LSH seeding
    val buckets = (0 until tables).map { t =>
      val planes = SimilarityOps.hyperplanes(dim, bits, seed = 7L + 1000L * t)
      nodes.select(col("node_id"), lit(t).as("tbl"),
        graft.functions.functions.sign_lsh_bucket(col("n_emb"), planes)
          .as("bkt"))
    }.reduce(_ unionByName _)
    val okBuckets = buckets.groupBy(col("tbl"), col("bkt"))
      .agg(count(lit(1)).as("bn")).where(col("bn") <= maxBucket)
      .select(col("tbl"), col("bkt"))
    val pruned = buckets.join(okBuckets, Seq("tbl", "bkt"))
    val seedPairs = pruned.as("a").join(pruned.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bkt") === col("b.bkt") &&
          col("a.node_id") < col("b.node_id"))
      .select(col("a.node_id").as("u"), col("b.node_id").as("v"))
      .distinct()
    var adj = maybeCk(rankTopM(seedPairs))

    // 2-3. NN-descent rounds over bounded neighborhoods
    var r = 0
    while (r < rounds) {
      val fwd = adj.select(col("node_id").as("c"), col("neighbor_id").as("w"))
      val wRev = Window.partitionBy(col("c")).orderBy(col("w"))
      val rev = adj
        .select(col("neighbor_id").as("c"), col("node_id").as("w"))
        .withColumn("rr", row_number().over(wRev)).where(col("rr") <= m)
        .drop("rr")
      val und = fwd.unionByName(rev).distinct()
      val cand = und.as("x").join(und.as("y"),
          col("x.c") === col("y.c") && col("x.w") < col("y.w"))
        .select(col("x.w").as("u"), col("y.w").as("v"))
        .distinct()
      val cur = adj.select(
        least(col("node_id"), col("neighbor_id")).as("u"),
        greatest(col("node_id"), col("neighbor_id")).as("v"))
      adj = maybeCk(rankTopM(cand.unionByName(cur).distinct()))
      r += 1
    }
    adj.orderBy(col("node_id"), col("rnk"))
  }

  /** The first `numQueries` vectors by vec_id as the query set — the
    * convention every ANN op in the engine shares (p07/p89). */
  private def querySet(emb: DataFrame, numQueries: Int): DataFrame =
    emb.orderBy(col("vec_id")).limit(numQueries)
      .select(col("vec_id").cast("long").as("query_id"),
        col("embedding").cast("array<double>").as("q_emb"))

  /** Beam search VISITED set: starting every query at the global minimum
    * vec_id, expand the beam's adjacency `hops` times, after each hop
    * keeping the top-`ef` visited nodes per query as the next beam.
    * Returns every (query_id, node_id) ever visited — the candidate dump
    * the oracle re-ranks (the p13/p89 pattern: the walk's OUTPUT is
    * verified exactly even though the walk itself is not SQL).
    *
    * Per hop: one equi-join frontier⋈adjacency on node_id + one bounded
    * window truncation; visited ≤ 1 + hops·ef·M rows per query. */
  def beamVisited(emb: DataFrame, graph: DataFrame, numQueries: Int = 10,
                  ef: Int = 8, hops: Int = 3): DataFrame = {
    // 1-row driver scalar: the deterministic entry point
    val entry = emb.agg(min(col("vec_id").cast("long"))).head().getLong(0)
    beamVisitedFor(emb, graph, querySet(emb, numQueries), ef, hops, entry)
  }

  /** [[beamVisited]] generalized to an explicit query set (query_id,
    * q_emb) and entry node — the form the INSERT path uses, where the
    * queries are the new vectors (not yet in the graph) and the entry
    * must be a node the graph actually contains. */
  def beamVisitedFor(emb: DataFrame, graph: DataFrame, queries: DataFrame,
                     ef: Int, hops: Int, entry: Long): DataFrame = {
    val adj = graph.select(col("node_id"), col("neighbor_id"))
    val nodes = emb.select(col("vec_id").cast("long").as("node_id"),
      col("embedding").cast("array<double>").as("n_emb"))
    var visited = queries.select(col("query_id"),
      lit(entry).as("node_id")).localCheckpoint(true)
    var beam = visited
    var h = 0
    while (h < hops) {
      val expanded = beam.join(adj, "node_id")
        .select(col("query_id"), col("neighbor_id").as("node_id"))
      visited = visited.unionByName(expanded).distinct()
        .localCheckpoint(true) // per-hop lineage truncation
      val scored = visited
        .join(nodes, "node_id")
        .join(broadcast(queries), "query_id")
        .select(col("query_id"), col("node_id"),
          SimilarityOps.cosine(col("q_emb"), col("n_emb")).as("score"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("node_id"))
      beam = scored.withColumn("rk", row_number().over(w))
        .where(col("rk") <= ef).select(col("query_id"), col("node_id"))
        .localCheckpoint(true)
      h += 1
    }
    visited.orderBy(col("query_id"), col("node_id"))
  }

  /** INCREMENTAL graph insert — the HNSW insertion primitive, batched:
    * each new vector beam-searches the EXISTING graph for candidates
    * (the same walk a query runs), links to its top-`m` by (cosine DESC,
    * id ASC), and the touched existing nodes re-rank their edge set —
    * old edges ∪ new back-edges, keep top-m — so degrees stay capped and
    * a closer new neighbor evicts the worst old edge exactly as HNSW's
    * neighbor-selection prune does. Everything is joins over bounded
    * state: the delta's beam (≤ hops·ef·M candidates per new vector), one
    * scoring join, two window truncations; the full vector table is
    * never collected and old nodes untouched by back-edges keep their
    * adjacency bit-identical (re-ranking an already cosine-ranked list
    * is idempotent).
    *
    * Batch-vs-sequential contract (documented, measured by the p151
    * recall row): inserting a BATCH connects each new vector to the
    * existing graph only — intra-batch edges do not form (sequential
    * insertion or a follow-up descent round adds them). Recall over the
    * merged graph is therefore the honest lower bound of the insert
    * path. */
  def insertIntoGraph(emb: DataFrame, graph: DataFrame, delta: DataFrame,
                      m: Int = 8, ef: Int = 8, hops: Int = 3): DataFrame = {
    val nodes = emb.select(col("vec_id").cast("long").as("node_id"),
      col("embedding").cast("array<double>").as("n_emb"))
    val dq = delta.select(col("vec_id").cast("long").as("query_id"),
      col("embedding").cast("array<double>").as("q_emb"))
    // 1-row driver scalar: entry must be a node the OLD graph contains
    val entry = graph.agg(min(col("node_id"))).head().getLong(0)
    val visited = beamVisitedFor(emb, graph, dq, ef, hops, entry)
    val scored = visited
      .where(col("node_id") =!= col("query_id"))
      .join(nodes, "node_id")
      .join(dq, "query_id")
      .select(col("query_id"), col("node_id"),
        SimilarityOps.cosine(col("q_emb"), col("n_emb")).as("score"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("node_id"))
    val newFwd = scored.withColumn("rnk", row_number().over(wq).cast("long"))
      .where(col("rnk") <= m)
      .select(col("query_id").as("node_id"), col("rnk"),
        col("node_id").as("neighbor_id"))
    // back-edges: touched existing nodes re-rank (old ∪ reverse) top-m
    val revCand = newFwd.select(col("neighbor_id").as("node_id"),
      col("node_id").as("nb"))
    val oldEdges = graph.select(col("node_id"),
      col("neighbor_id").as("nb"))
    val merged = oldEdges.unionByName(revCand).distinct()
      .join(nodes.select(col("node_id"), col("n_emb").as("a_emb")),
        "node_id")
      .join(nodes.select(col("node_id").as("nb"), col("n_emb").as("b_emb")),
        "nb")
      .select(col("node_id"), col("nb"),
        SimilarityOps.cosine(col("a_emb"), col("b_emb")).as("score"))
    val wn = Window.partitionBy(col("node_id"))
      .orderBy(col("score").desc, col("nb"))
    val rerankedOld = merged
      .withColumn("rnk", row_number().over(wn).cast("long"))
      .where(col("rnk") <= m)
      .select(col("node_id"), col("rnk"), col("nb").as("neighbor_id"))
    rerankedOld.unionByName(newFwd)
      .orderBy(col("node_id"), col("rnk"))
  }

  /** Exact re-rank of a visited/candidate set: top-`k` per query by
    * (cosine DESC, neighbor_id ASC), self-matches excluded — identical
    * scoring path to `SimilarityOps.bruteTopK`, restricted to the
    * candidates. Output (query_id, rank, neighbor_id). */
  def topKFromVisited(emb: DataFrame, visited: DataFrame,
                      numQueries: Int = 10, k: Int = 10): DataFrame = {
    val queries = querySet(emb, numQueries)
    val nodes = emb.select(col("vec_id").cast("long").as("node_id"),
      col("embedding").cast("array<double>").as("n_emb"))
    val scored = visited
      .where(col("node_id") =!= col("query_id"))
      .join(nodes, "node_id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("node_id").as("neighbor_id"),
        SimilarityOps.cosine(col("q_emb"), col("n_emb")).as("score"))
    SimilarityOps.rankTopK(scored, k)
  }
}

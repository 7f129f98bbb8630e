package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.GraftFunctions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two tiers, per the scale plan:
  *   - `sim_brute_topk`: exact brute-force cosine top-k. The query side is
  *     broadcast, so the big side streams once with no shuffle — correct at
  *     any corpus size as long as the QUERY set is small; cost is O(N·Q).
  *   - `sim_ivf_topk`: IVF-style — vectors are assigned to their nearest
  *     centroid (an equi-joinable cluster id), queries probe only the
  *     `nprobe` nearest clusters. At 100 TB the probe join touches
  *     nprobe/ncentroids of the corpus instead of all of it.
  */
object SimilarityOps {

  type Q = (SparkSession, String) => DataFrame

  private def vecs(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(
      col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Σ xᵢyᵢ — columnar lambda arithmetic, no UDF. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, z) => acc + z)

  /** Per-row norm factor sqrt(Σ xᵢ²) for the precomputed-norm cosine:
    * the pair-heavy loops (knn candidate scoring, semdedup within-cluster
    * pairs, the brute referees) re-derived BOTH norms per PAIR inside
    * cosine_sim — 3× the arithmetic of the dot alone. Computing the
    * factor once per row and assembling cos = dot/(sn_a·sn_b) reproduces
    * cosine_sim bit-for-bit: dot_double folds in the same element order,
    * sqrt/÷ are IEEE-exact, and [[cosPre]] keeps the zero-norm → 0.0
    * guard (sn == 0 ⟺ Σx² == 0).
    */
  private[graft] def snorm(v: Column): Column =
    sqrt(graft.functions.GraftFunctions.dot_double(v, v))

  /** Cosine from a precomputed pair dot and two per-row norm factors —
    * see [[snorm]] for the bit-identity argument.
    */
  private[graft] def cosPre(d: Column, sna: Column, snb: Column): Column =
    when(sna === 0.0 || snb === 0.0, lit(0.0)).otherwise(d / (sna * snb))

  /** Σ (xᵢ−yᵢ)² — squared L2, the PQ assignment metric. */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, z) => acc + z)

  /** Query set: the 20 lowest-id vectors, broadcast everywhere below. */
  private def queriesOf(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))

  /** (q_id, rank, n_id, cos_sim): top-5 per query from a scored relation
    * with columns (q_id, vec_id, cos).
    */
  private def top5(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
        round(col("cos"), 4).as("cos_sim"))
  }

  /** Exhaustive scoring: every (query, corpus) pair, query side broadcast.
    * Corpus side spread (round 16): the O(N·Q) cosine pass otherwise runs
    * in the one-file scan's single task (see TextOps.spreadScan).
    */
  private def bruteScored(e: DataFrame): DataFrame =
    TextOps.spreadScan(e)
      .join(broadcast(queriesOf(e)), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosine_sim(col("qv"), col("v")).as("cos"))

  /** IVF scoring: scan-local nearest-centroid assignment over a broadcast
    * 16-entry codebook (array_max over (cos, -c_id) structs — no Exchange
    * of the corpus), then each query probes its 4 nearest clusters via a
    * broadcast join. Scores only the probed fraction of the corpus.
    */
  private def ivfScored(e: DataFrame): DataFrame = {
    // codebook training: the 16 lowest-id vectors seed the clusters, then
    // ONE Lloyd refinement — assign every vector to its nearest seed
    // (scan-local argmax over the broadcast codebook) and replace each
    // centroid with its cluster's element-wise mean. Fully distributed:
    // the per-dimension mean is a (cluster, dim) aggregate, and only the
    // 16×dim refined codebook is ever collected into a broadcast. More
    // Lloyd rounds are the same shape; one round already separates the
    // seeds enough for the self-verified recall bound below.
    val seeds = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
      val codebook = cents.agg(collect_list(struct(col("c_id"), col("cv"))).as("cs"))
      vecs.crossJoin(broadcast(codebook))
        .withColumn("best",
          array_max(transform(col("cs"), c =>
            struct(cosine_sim(col("v"), c("cv")).as("cos"),
              (-c("c_id")).as("neg_id")))))
        .select(col("vec_id"), col("v"), (-col("best.neg_id")).as("cluster"))
    }
    // cached: feeds both the corpus assignment and the query probes, and
    // its lineage contains the full-corpus training aggregate
    val cents = assign(e, seeds)
      .select(col("cluster").as("c_id"), posexplode(col("v")))
      .groupBy("c_id", "pos").agg(avg("col").as("m"))
      .groupBy("c_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("c_id"), transform(col("pm"), p => p("m")).as("cv"))
      .cache()
    // registered like every other persisted relation in the family, so
    // the session LRU accounts for it and the bench's cold-pass
    // clearSession() can actually unpersist it
    CacheRegistry.register(cents, Seq(cents))
    val assigned = assign(e, cents)
    val wProbe = Window.partitionBy("q_id").orderBy(
      cosine_sim(col("qv"), col("cv")).desc, col("c_id"))
    val probes = queriesOf(e).join(broadcast(cents), lit(true))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= 4)
      .select(col("q_id"), col("qv"), col("c_id").as("cluster"))
    assigned.join(broadcast(probes), "cluster")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosine_sim(col("qv"), col("v")).as("cos"))
  }

  /** The full IVF top-5 relation (open output) — used by SimilaritySpec to
    * measure recall against brute force; the gate query below reports the
    * recall check itself so the driver re-verifies it every round.
    */
  def ivfTop5(s: SparkSession, d: String): DataFrame = top5(ivfScored(vecs(s, d)))

  /** PQ-ADC scoring (see the `sim_pq_adc` entry for the scale contract):
    * 8 subspaces × 16 centroids, two Lloyd rounds per subspace, corpus
    * stored as 8 codes/vector, cos assembled from the broadcast
    * query-side distance table, ADC shortlist exact-re-ranked.
    */
  private def pqScored(e: DataFrame): DataFrame = {
    val nSub = 8
    // subspace width derives from the DATA (size(v)/nSub), not a
    // hard-coded 64: hard-coding PQ-encoded only the first 64 components
    // of any wider corpus while the exact re-rank used all of them —
    // silent recall collapse with no error. Dims not divisible by nSub
    // drop the remainder dims from the CODES only (shortlist quality
    // degrades marginally; the exact re-rank stays full-dimension).
    val subW = (size(col("v")) / nSub).cast("int")
    val sub = e.select(col("vec_id"), posexplode(
        transform(sequence(lit(0), lit(nSub - 1)),
          m => slice(col("v"), m * subW + 1, subW))))
      .toDF("vec_id", "m", "sv")
    val seeds = sub.filter(col("vec_id") < 16)
      .select(col("m"), col("vec_id").as("c_id"), col("sv").as("cv"))
    def assign(sv: DataFrame, cents: DataFrame): DataFrame = {
      val codebook = cents.groupBy("m")
        .agg(collect_list(struct(col("c_id"), col("cv"))).as("cs"))
      sv.join(broadcast(codebook), "m")
        .withColumn("best",
          array_max(transform(col("cs"), c =>
            struct((-l2sq(col("sv"), c("cv"))).as("negd"),
              (-c("c_id")).as("neg_id")))))
        .select(col("vec_id"), col("m"), col("sv"),
          (-col("best.neg_id")).as("code"))
    }
    // two Lloyd refinements per subspace; only the 8×16×8 codebook is
    // ever collected (into the broadcast) — cached because it feeds
    // both the corpus encoding and the query-side distance table
    def lloyd(cents: DataFrame): DataFrame = assign(sub, cents)
      .select(col("m"), col("code").as("c_id"), posexplode(col("sv")))
      .groupBy("m", "c_id", "pos").agg(avg("col").as("mu"))
      .groupBy("m", "c_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("pm"))
      .select(col("m"), col("c_id"),
        transform(col("pm"), p => p("mu")).as("cv"))
    val cents = lloyd(lloyd(seeds)).cache()
    CacheRegistry.register(cents, Seq(cents))
    val codes = assign(sub, cents).select("vec_id", "m", "code")
    // query-side ADC table: ⟨q_m, c⟩ and ‖c‖² per (query, subspace, code)
    val adc = sub.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("m"), col("sv").as("qsv"))
      .join(broadcast(cents), "m")
      .select(col("q_id"), col("m"), col("c_id").as("code"),
        dot(col("qsv"), col("cv")).as("ip"),
        dot(col("cv"), col("cv")).as("cn"))
    val qn = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"),
        sqrt(dot(col("v"), col("v"))).as("qnorm"))
    val adcScored = codes.join(broadcast(adc), Seq("m", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(sum("ip").as("ipsum"), sum("cn").as("cnsum"))
      .join(broadcast(qn), "q_id")
      .select(col("q_id"), col("vec_id"),
        (col("ipsum") /
          greatest(col("qnorm") * sqrt(col("cnsum")), lit(1e-30))).as("adc"))
    // ADC shortlist → exact re-rank (the refine stage every production PQ
    // deployment runs): the compressed-domain score picks 128 candidates
    // per query, then TRUE cosines are computed for shortlist rows only —
    // the corpus' raw vectors are touched for |Q|×128 rows, not N×|Q|.
    val wS = Window.partitionBy("q_id").orderBy(col("adc").desc, col("vec_id"))
    val short = adcScored
      .withColumn("rn", row_number().over(wS))
      .filter(col("rn") <= 128)
      .select(col("q_id"), col("vec_id"))
    e.join(broadcast(short), "vec_id")
      .join(broadcast(queriesOf(e)), "q_id")
      .select(col("q_id"), col("vec_id"),
        cosine_sim(col("qv"), col("v")).as("cos"))
  }

  /** The full PQ-ADC top-5 relation (open output) — SimilaritySpec's
    * recall-measurement surface, like [[ivfTop5]].
    */
  def pqTop5(s: SparkSession, d: String): DataFrame = top5(pqScored(vecs(s, d)))

  /** Σ (xᵢ−yᵢ)² over integer-quantized vectors — LongType end-to-end, so
    * the aggregate is exact and cluster assignments are bit-identical
    * across engines and partition orders (the same cross-engine-
    * determinism idiom as TextOps' idf6/logprob6 quantization).
    * Native codegen expression (round 16): the higher-order
    * aggregate(zip_with(...)) form is CodegenFallback — interpreted with
    * per-element boxing — and this distance is the inner loop of every
    * quantized assignment (k-means Lloyd rounds, k-NN multi-probe);
    * VectorOps.l2sqLong folds in the same element order with the same
    * wrapping int64 arithmetic, so the value is bit-identical.
    */
  private def l2sq6(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.l2sq_long(a, b)

  /** Corpus with a ×1e6 integer-quantized copy of each vector. */
  private def vecs6(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("v"),
      transform(col("v"), x => round(x * 1e6, 0).cast("long")).as("v6"))

  /** Scan-local argmin assignment against a broadcast integer codebook;
    * ties break to the lowest centroid id (struct array_min compares
    * (distance, c_id) lexicographically). The corpus never shuffles —
    * only the k×dim codebook moves.
    */
  private def assign6(vs: DataFrame, cents: DataFrame): DataFrame = {
    val codebook = cents.agg(collect_list(struct(col("c_id"), col("cv"))).as("cs"))
    vs.crossJoin(broadcast(codebook))
      .withColumn("best",
        array_min(transform(col("cs"), c =>
          struct(l2sq6(col("v6"), c("cv")).as("d"), c("c_id").as("c_id")))))
      .select(col("vec_id"), col("v"), col("v6"), col("best.c_id").as("cluster"))
  }

  /** One Lloyd round over the quantized corpus: per-(cluster, dim) integer
    * sums (partial-aggregated map-side) → floor-divided means, re-packed
    * into a k×dim codebook. floor(sum/n) stays cross-engine exact: the
    * int64 sums are exactly representable as doubles, IEEE division is
    * correctly rounded, and a non-integer true quotient of integers is
    * ≥ 1/n away from any integer — orders of magnitude beyond one ulp —
    * so the floor cannot straddle engines.
    */
  private def lloyd6(vs: DataFrame, cents: DataFrame): DataFrame =
    assign6(vs, cents)
      .select(col("cluster").as("c_id"), posexplode(col("v6")))
      .groupBy("c_id", "pos")
      .agg(sum("col").as("s"), count(lit(1)).as("n"))
      .select(col("c_id"), col("pos"),
        floor(col("s").cast("double") / col("n")).cast("long").as("m"))
      .groupBy("c_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("c_id"), transform(col("pm"), p => p("m")).as("cv"))

  /** Deterministic k-means over the embedding corpus: k=8 seeds (the
    * lowest-id vectors), two Lloyd rounds, integer-exact throughout.
    * Returns (final per-vector assignment, final centroids) — shared by
    * the `embedding_kmeans` and `dedup_semdedup` entries. The centroid
    * relation is cached: its lineage holds two full-corpus aggregate
    * rounds and it feeds both the final assignment and the centroid
    * fingerprint/pair stages.
    */
  private[graft] def kmeans8(s: SparkSession, d: String): (DataFrame, DataFrame) =
    kmeans8Of(vecs(s, d))

  /** [[kmeans8]] over any (vec_id, v) relation — the ScaleSmoke surface. */
  private[graft] def kmeans8Of(e: DataFrame): (DataFrame, DataFrame) = {
    // spread before the quantize+assign passes: every Lloyd round and the
    // final assignment do k×dim integer distances per row, and a one-file
    // corpus otherwise runs them all in one scan task (no-op at real
    // scan parallelism — see TextOps.spreadScan)
    val vs = vecs6(TextOps.spreadScan(e))
    val seeds = vs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v6").as("cv"))
    val cents = lloyd6(vs, lloyd6(vs, seeds)).cache()
    CacheRegistry.register(cents, Seq(cents))
    (assign6(vs, cents), cents)
  }

  /** The shared assignment-CTE chain both k-means oracles replay: ×1e6
    * quantization, 8 lowest-id seeds, two floor-divided Lloyd rounds,
    * final argmin assignment `a3(vec_id, cluster)` (ties to lowest c_id,
    * matching assign6's struct ordering).
    */
  private val kmeansOracleCtes =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |e6 AS (SELECT vec_id, i AS dim, CAST(round(v[i] * 1e6, 0) AS BIGINT) AS x
      |       FROM e, UNNEST(range(1, len(v) + 1)) t(i)),
      |c0 AS (SELECT vec_id AS c_id, dim, x AS c FROM e6 WHERE vec_id < 8),
      |d1 AS (SELECT v.vec_id, c.c_id, sum((v.x - c.c) * (v.x - c.c)) AS d
      |       FROM e6 v JOIN c0 c USING (dim) GROUP BY 1, 2),
      |a1 AS (SELECT vec_id, c_id AS cluster FROM (
      |         SELECT vec_id, c_id,
      |                row_number() OVER (PARTITION BY vec_id ORDER BY d, c_id) AS rn
      |         FROM d1) WHERE rn = 1),
      |c1 AS (SELECT a.cluster AS c_id, v.dim,
      |              CAST(floor(sum(v.x) * 1.0 / count(*)) AS BIGINT) AS c
      |       FROM e6 v JOIN a1 a USING (vec_id) GROUP BY 1, 2),
      |d2 AS (SELECT v.vec_id, c.c_id, sum((v.x - c.c) * (v.x - c.c)) AS d
      |       FROM e6 v JOIN c1 c USING (dim) GROUP BY 1, 2),
      |a2 AS (SELECT vec_id, c_id AS cluster FROM (
      |         SELECT vec_id, c_id,
      |                row_number() OVER (PARTITION BY vec_id ORDER BY d, c_id) AS rn
      |         FROM d2) WHERE rn = 1),
      |c2 AS (SELECT a.cluster AS c_id, v.dim,
      |              CAST(floor(sum(v.x) * 1.0 / count(*)) AS BIGINT) AS c
      |       FROM e6 v JOIN a2 a USING (vec_id) GROUP BY 1, 2),
      |d3 AS (SELECT v.vec_id, c.c_id, sum((v.x - c.c) * (v.x - c.c)) AS d
      |       FROM e6 v JOIN c2 c USING (dim) GROUP BY 1, 2),
      |a3 AS (SELECT vec_id, c_id AS cluster FROM (
      |         SELECT vec_id, c_id,
      |                row_number() OVER (PARTITION BY vec_id ORDER BY d, c_id) AS rn
      |         FROM d3) WHERE rn = 1)""".stripMargin

  /** Maximal-marginal-relevance re-ranking (Carbonell–Goldstein): greedy
    * top-5 per query balancing relevance against redundancy —
    * argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d,s) per round. Retrieval
    * pipelines run this after ANN to de-duplicate the result list.
    *
    * INTEGER-EXACT throughout (the kmeans8 idiom): relevance and
    * pairwise similarity are inner products of the ×1e6-quantized
    * vectors (64 dims × (5.3e5)² ≈ 2e13 — exact in int64 AND in
    * DuckDB's double accumulation), and λ = 0.7 is the ×10 fixed-point
    * score 7·rel − 3·maxsim, so every argmax is a pure integer compare
    * (ties → lowest id) and the greedy trajectory is bit-identical
    * across engines, partitionings, and the oracle's chained-CTE
    * replay. The greedy loop itself is genuinely sequential state — a
    * per-query 20-candidate pool folds through flatMapGroups (bounded
    * group, scan-local; the fMGWS/run-walk precedent), never a
    * driver-side loop.
    */
  def mmrRerank(e: DataFrame): DataFrame = {
    val session = e.sparkSession
    import session.implicits._
    // spread the corpus scan before the N×|Q| scoring pass: one parquet
    // file = one scan partition, so the inner-product stage otherwise
    // runs single-task (measured 0.59 s of the 0.79 s row — guide §2.6
    // stragglers); the exchange ships raw corpus rows once and is a
    // no-op when the input already has parallelism (spreadScan contract)
    val e6 = vecs6(TextOps.spreadScan(e)).select(col("vec_id"), col("v6"))
    // INTENTIONAL (round-17 A/B of the r16 ADVICE note): the query side
    // deliberately re-plans the scan+quantize subtree instead of reading
    // the spread e6 — deriving q6 from e6 hangs the broadcast build off
    // the exchange (one extra stage) and measured 0.54 → 0.68 s warm;
    // the duplicated subtree is a 20-row filter over a single cheap scan
    val q6 = vecs6(e).filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v6").as("qv6"))
    // native codegen inner product (bit-identical to the HOF fold it
    // replaces — see l2sq6's note)
    def dot6(a: Column, b: Column): Column =
      graft.functions.GraftFunctions.dot_long(a, b)
    // v6 rides the top-20 selection DELIBERATELY: the row_number+filter
    // plans as TopKPerKeyExec with a map-side PARTIAL heap, so the
    // exchange carries at most queries × 20 × input-partitions rows —
    // bounded regardless of corpus size — and the wide vector column is
    // therefore free to ride it (measured: re-acquiring v6 via a
    // post-top-k broadcast join costs an extra stage and reads ~25%
    // slower at bench scale with no asymptotic win to buy).
    val scored = e6.join(broadcast(q6), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        dot6(col("qv6"), col("v6")).as("rel"), col("v6"))
    val wq = Window.partitionBy("q_id").orderBy(col("rel").desc, col("vec_id"))
    val pool = scored.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= 20)
      .select(col("q_id"), col("vec_id"), col("rel"), col("v6"))
      .as[(Long, Long, Long, Seq[Long])]
    pool.groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        val cands = it.map(t => (t._2, t._3, t._4.toArray)).toArray
        def dot(a: Array[Long], b: Array[Long]): Long = {
          var s = 0L; var i = 0
          while (i < a.length) { s += a(i) * b(i); i += 1 }; s
        }
        val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]
        // bound the rounds by pool size: a query with < 5 candidates
        // (tiny corpus) must stop cleanly, not minBy an empty iterator
        (1 to math.min(5, cands.length)).iterator.map { r =>
          val best = cands.iterator
            .filterNot { case (id, _, _) => selected.exists(_._1 == id) }
            .map { case (id, rel, v) =>
              val mx = if (selected.isEmpty) 0L
                       else selected.iterator.map(s => dot(v, s._2)).max
              (7L * rel - 3L * mx, id, v)
            }
            .minBy { case (sc, id, _) => (-sc, id) }
          selected += ((best._2, best._3))
          (q, r, best._2, best._1)
        }
      }
      .toDF("q_id", "rank", "n_id", "score10")
      .orderBy("q_id", "rank")
  }

  /** DuckDB oracle for [[mmrRerank]]: the greedy rounds as chained
    * MATERIALIZED CTEs (kcore's lesson: the selected-set CTEs are
    * referenced multiple times per round — inlined, the replay is
    * exponential).
    */
  private def mmrOracleSql: String = {
    val base =
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |e6 AS MATERIALIZED (
        |  SELECT vec_id, i AS dim, CAST(round(v[i] * 1e6, 0) AS BIGINT) AS x
        |  FROM e, UNNEST(range(1, len(v) + 1)) t(i)
        |), rel AS MATERIALIZED (
        |  SELECT a.vec_id AS q_id, b.vec_id, CAST(sum(a.x * b.x) AS BIGINT) AS rel
        |  FROM e6 a JOIN e6 b USING (dim)
        |  WHERE a.vec_id < 20 AND b.vec_id != a.vec_id
        |  GROUP BY 1, 2
        |), pool AS MATERIALIZED (
        |  SELECT q_id, vec_id, rel FROM (
        |    SELECT q_id, vec_id, rel,
        |           row_number() OVER (PARTITION BY q_id
        |             ORDER BY rel DESC, vec_id) AS rn
        |    FROM rel) WHERE rn <= 20
        |), ps AS MATERIALIZED (
        |  SELECT p1.q_id, p1.vec_id AS i, p2.vec_id AS j,
        |         CAST(sum(a.x * b.x) AS BIGINT) AS d
        |  FROM pool p1 JOIN pool p2
        |    ON p1.q_id = p2.q_id AND p1.vec_id != p2.vec_id
        |  JOIN e6 a ON a.vec_id = p1.vec_id
        |  JOIN e6 b ON b.vec_id = p2.vec_id AND a.dim = b.dim
        |  GROUP BY 1, 2, 3
        |), s1 AS MATERIALIZED (
        |  SELECT q_id, vec_id, 7*rel AS score10 FROM (
        |    SELECT q_id, vec_id, rel,
        |           row_number() OVER (PARTITION BY q_id
        |             ORDER BY 7*rel DESC, vec_id) AS rn
        |    FROM pool) WHERE rn = 1
        |), sel1 AS MATERIALIZED (SELECT q_id, vec_id FROM s1)""".stripMargin
    val rounds = (2 to 5).map { k =>
      s"""s$k AS MATERIALIZED (
         |  SELECT q_id, vec_id, score10 FROM (
         |    SELECT p.q_id, p.vec_id,
         |           7*p.rel - 3*coalesce(mx.m, 0) AS score10,
         |           row_number() OVER (PARTITION BY p.q_id
         |             ORDER BY 7*p.rel - 3*coalesce(mx.m, 0) DESC, p.vec_id) AS rn
         |    FROM pool p
         |    LEFT JOIN (SELECT ps.q_id, ps.i AS vec_id, max(ps.d) AS m
         |               FROM ps JOIN sel${k - 1} s
         |                 ON s.q_id = ps.q_id AND s.vec_id = ps.j
         |               GROUP BY 1, 2) mx
         |      ON mx.q_id = p.q_id AND mx.vec_id = p.vec_id
         |    WHERE NOT EXISTS (SELECT 1 FROM sel${k - 1} s
         |                      WHERE s.q_id = p.q_id AND s.vec_id = p.vec_id)
         |  ) WHERE rn = 1
         |), sel$k AS MATERIALIZED (
         |  SELECT q_id, vec_id FROM sel${k - 1}
         |  UNION ALL SELECT q_id, vec_id FROM s$k
         |)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to 5).map { k =>
      s"SELECT q_id, CAST($k AS INTEGER) AS rank, vec_id AS n_id, score10 FROM s$k"
    }.mkString("\n  UNION ALL ")
    s"$base,\n$rounds\nSELECT q_id, rank, n_id, score10 FROM (\n  $unions\n) t ORDER BY q_id, rank"
  }

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // MMR diverse re-ranking over the integer-quantized corpus (see
    // [[mmrRerank]]): greedy λ=0.7 relevance/diversity trade-off on the
    // per-query top-20 pool, bit-identical across engines by integer
    // fixed-point arithmetic.
    ("sim_mmr_rerank",
      (s: SparkSession, d: String) => mmrRerank(vecs(s, d)),
      Some(mmrOracleSql)),

    // Prototypicality outliers — the SemDeDup-style curation step: score
    // every document's embedding against its LANGUAGE's centroid and
    // surface the 5 least-prototypical docs per language (the curation
    // drop list). The centroid is a distributed (lang, dim) mean — only
    // the 5-langs × 64-dims codebook is ever collected into the broadcast
    // — and the bottom-k runs through the custom TopKPerKey operator
    // (ascending cosine), its second production use. Scale: one narrow
    // join to attach lang, one posexplode aggregate for centroids, one
    // broadcast join to score — the corpus never shuffles on anything
    // wider than the lang key.
    ("embedding_lang_outliers",
      (s: SparkSession, d: String) => {
        val e = embeddings(s, d).select(
          col("vec_id").as("doc_id"), col("embedding").cast("array<double>").as("v"))
        val joined = e.join(
          documents(s, d).select("doc_id", "lang"), "doc_id")
        val cent = joined
          .select(col("lang"), posexplode(col("v")))
          .toDF("lang", "dim", "x")
          .groupBy("lang", "dim").agg(avg("x").as("c"))
          .groupBy("lang")
          .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("ps"))
          .select(col("lang"), transform(col("ps"), p => p("c")).as("cv"))
        val scored = joined.join(broadcast(cent), "lang")
          .select(col("lang"), col("doc_id"),
            cosine_sim(col("v"), col("cv")).as("cos"))
        graft.plans.GraftPlans
          .topKPerKey(scored, Seq("lang"), Seq("cos" -> true, "doc_id" -> true), 5)
          .select(col("lang"), col("doc_id"),
            round(col("cos"), 4).as("cos_centroid"))
          .orderBy("lang", "cos_centroid", "doc_id")
      },
      Some(
        """WITH e AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS v
          |           FROM embeddings),
          |j AS (SELECT d.lang, e.doc_id, e.v FROM e JOIN documents d USING (doc_id)),
          |dims AS (SELECT lang, i AS dim, v[i] AS x
          |         FROM j, UNNEST(range(1, len(v) + 1)) t(i)),
          |cent AS (SELECT lang, dim, avg(x) AS c FROM dims GROUP BY 1, 2),
          |cv AS (SELECT lang, list(c ORDER BY dim) AS cv FROM cent GROUP BY lang),
          |scored AS (
          |  SELECT j.lang, j.doc_id, list_cosine_similarity(j.v, cv.cv) AS cos
          |  FROM j JOIN cv USING (lang)
          |), ranked AS (
          |  SELECT lang, doc_id, cos,
          |         row_number() OVER (PARTITION BY lang ORDER BY cos, doc_id) AS rn
          |  FROM scored
          |)
          |SELECT lang, doc_id, round(cos, 4) AS cos_centroid
          |FROM ranked WHERE rn <= 5
          |ORDER BY lang, cos_centroid, doc_id""".stripMargin)),

    ("sim_brute_topk",
      (s: SparkSession, d: String) =>
        top5(bruteScored(vecs(s, d))).orderBy("q_id", "rank"),
      Some(
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20)
          |SELECT q_id, rank, n_id, cos_sim FROM (
          |  SELECT q.q_id, e.vec_id AS n_id,
          |         round(list_cosine_similarity(q.qv, e.v), 4) AS cos_sim,
          |         CAST(row_number() OVER (PARTITION BY q.q_id
          |           ORDER BY list_cosine_similarity(q.qv, e.v) DESC, e.vec_id)
          |           AS INTEGER) AS rank
          |  FROM q JOIN e ON e.vec_id != q.q_id
          |) t WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // Radius (range) search — the OTHER similarity-search primitive:
    // everything within cosine ≥ τ of each query, not a fixed k. Same
    // broadcast-query/stream-corpus shape as brute top-k (the corpus
    // never shuffles; the result is radius-bounded, not corpus-bounded).
    // The inclusion test is on the 4dp-ROUNDED similarity in BOTH
    // engines, so a last-ulp accumulation difference cannot flip a
    // boundary row.
    ("sim_radius_search",
      (s: SparkSession, d: String) =>
        bruteScored(vecs(s, d))
          .select(col("q_id"), col("vec_id").as("n_id"),
            round(col("cos"), 4).as("cos_sim"))
          .filter(col("cos_sim") >= 0.35)
          .orderBy(col("q_id"), col("cos_sim").desc, col("n_id")),
      Some(
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20)
          |SELECT q_id, n_id, cos_sim FROM (
          |  SELECT q.q_id, e.vec_id AS n_id,
          |         round(list_cosine_similarity(q.qv, e.v), 4) AS cos_sim
          |  FROM q JOIN e ON e.vec_id != q.q_id
          |) t WHERE cos_sim >= 0.35
          |ORDER BY q_id, cos_sim DESC, n_id""".stripMargin)),

    // Same relation as sim_brute_topk but through the custom TopKPerKey
    // physical operator (bounded per-key heaps, no full per-group sort) —
    // the whole-operator custom-plan path; shares sim_brute_topk's oracle,
    // so the gate proves operator equivalence. Requires GraftExtensions.
    ("sim_topk_exec",
      (s: SparkSession, d: String) => {
        // SAME scored relation as sim_brute_topk (shared helper — the two
        // entries share an oracle precisely because the inputs are
        // identical; a drifted copy would make the equivalence gate
        // compare non-equivalent relations)
        val scored = bruteScored(vecs(s, d))
        val top = graft.plans.GraftPlans.topKPerKey(
          scored, Seq("q_id"), Seq("cos" -> false, "vec_id" -> true), 5)
        // rank over the tiny top-k result (≤ 5 rows per key)
        val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
        top.withColumn("rank", row_number().over(w))
          .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
            round(col("cos"), 4).as("cos_sim"))
          .orderBy("q_id", "rank")
      },
      Some(
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20)
          |SELECT q_id, rank, n_id, cos_sim FROM (
          |  SELECT q.q_id, e.vec_id AS n_id,
          |         round(list_cosine_similarity(q.qv, e.v), 4) AS cos_sim,
          |         CAST(row_number() OVER (PARTITION BY q.q_id
          |           ORDER BY list_cosine_similarity(q.qv, e.v) DESC, e.vec_id)
          |           AS INTEGER) AS rank
          |  FROM q JOIN e ON e.vec_id != q.q_id
          |) t WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // IVF: 16 seed centroids (lowest-id vectors) refined by one Lloyd
    // round (see ivfScored). The refined centroid means are double
    // aggregates whose partial-combine order varies with scheduling, so
    // boundary cluster assignments can flip between runs — which is WHY
    // the gate asserts only the recall BOUND, not the probe set: IVF
    // top-5 is intersected with the brute-force top-5 computed in the
    // same query, and MEAN recall@5 over the query set must reach 0.6
    // (measured 0.85–0.89 across sf0.001–sf0.1, far from the bound;
    // individual boundary queries as low as 1/5 are inherent to
    // nprobe=4/16). The open top-k relation stays available via
    // [[ivfTop5]], recall-measured per-query in SimilaritySpec.
    ("sim_ivf_topk",
      (s: SparkSession, d: String) => {
        val e = vecs(s, d)
        val ivf = top5(ivfScored(e)).select(col("q_id"), col("n_id"))
        val brute = top5(bruteScored(e)).select(col("q_id"), col("n_id"))
        val hits = ivf.join(brute, Seq("q_id", "n_id"), "left_semi")
          .groupBy("q_id").agg(count(lit(1)).as("hits"))
        queriesOf(e).select("q_id")
          .join(hits, Seq("q_id"), "left")
          .agg(
            count(lit(1)).as("n_queries"),
            (sum(coalesce(col("hits"), lit(0L))) >=
              lit(0.6) * count(lit(1)) * 5).as("recall_ok"))
      },
      Some(
        """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok
          |FROM embeddings WHERE vec_id < 20""".stripMargin)),

    // Deterministic k-means over the embedding corpus (k=8 lowest-id
    // seeds, two Lloyd rounds) — the clustering step SemDeDup-style
    // curation and IVF index training both start from. Everything is
    // integer-exact (×1e6 quantized vectors, int64 distances,
    // floor-divided means), so — unlike the float-mean IVF codebook above,
    // whose gate asserts only a recall bound — the full per-cluster
    // census is cross-engine reproducible and oracle-checked. Scale: the
    // corpus never shuffles for assignment (broadcast k×dim codebook,
    // scan-local argmin); each Lloyd round is one (cluster, dim)
    // partial-aggregated exchange.
    ("embedding_kmeans",
      (s: SparkSession, d: String) => {
        val (assigned, cents) = kmeans8(s, d)
        val fp = cents.select(col("c_id").as("cluster"),
          aggregate(col("cv"), lit(0L), (acc, x) => acc + x).as("centroid_sum"))
        assigned.groupBy("cluster")
          .agg(count(lit(1)).as("n_members"), min("vec_id").as("min_id"),
            sum("vec_id").as("sum_ids"))
          .join(broadcast(fp), "cluster")
          .select(col("cluster"), col("n_members"), col("min_id"),
            col("sum_ids"), col("centroid_sum"))
          .orderBy("cluster")
      },
      Some(kmeansOracleCtes + ",\n" +
        """f AS (SELECT c_id, CAST(sum(c) AS BIGINT) AS centroid_sum
          |       FROM c2 GROUP BY 1)
          |SELECT a.cluster, CAST(count(*) AS BIGINT) AS n_members,
          |       min(a.vec_id) AS min_id,
          |       CAST(sum(a.vec_id) AS BIGINT) AS sum_ids, f.centroid_sum
          |FROM a3 a JOIN f ON f.c_id = a.cluster
          |GROUP BY a.cluster, f.centroid_sum
          |ORDER BY a.cluster""".stripMargin)),

    // SemDeDup: semantic dedup WITHIN k-means clusters — pairwise cosine
    // is confined to each cluster, never corpus-wide (the pruning that
    // makes embedding dedup tractable at scale: pair cost drops from
    // O(N²) to O(Σ|cluster|²), and k grows with the corpus to hold the
    // per-cluster bound). A vector is removed iff a LOWER-id vector in
    // the SAME cluster has cosine ≥ 0.4 (the keep-first rule every other
    // dedup entry pins); output rows are the removals with their keeper.
    // Assignment reuses the integer-exact kmeans8 relation, so the
    // cluster scope is bit-identical across engines; the cosine filter
    // runs on the raw double vectors like dedup_embedding's.
    ("dedup_semdedup",
      (s: SparkSession, d: String) => {
        val (assigned0, _) = kmeans8(s, d)
        // per-row norm factor once, pair loop pays the dot only
        // (cosPre ≡ cosine_sim — see snorm)
        val assigned = assigned0.withColumn("sn", snorm(col("v")))
        val a = assigned.select(col("cluster"), col("vec_id").as("a_id"),
          col("v").as("va"), col("sn").as("sna"))
        val b = assigned.select(col("cluster"), col("vec_id").as("b_id"),
          col("v").as("vb"), col("sn").as("snb"))
        // size-gated broadcast of the b side (guide §3.1): the cluster
        // key has k=8 distinct values, so a shuffle join caps the pair
        // scoring at 8 tasks AND ships both sides; broadcasting one side
        // keeps the a side's scan partitioning (pairs generated
        // scan-local, 1.27 s of task time previously squeezed through 8
        // reduce tasks). Falls back to the shuffle join past the
        // broadcast estimate — the 100 TB shape where k grows with the
        // corpus and per-cluster joins stay the plan.
        a.join(TextOps.broadcastIfSmall(b), "cluster")
          .filter(col("a_id") < col("b_id"))
          .filter(cosPre(
            graft.functions.GraftFunctions.dot_double(col("va"), col("vb")),
            col("sna"), col("snb")) >= 0.4)
          .groupBy(col("cluster"), col("b_id"))
          .agg(min(col("a_id")).as("kept_by"))
          .select(col("b_id").as("vec_id"), col("cluster"), col("kept_by"))
          .orderBy("vec_id")
      },
      Some(kmeansOracleCtes + "\n" +
        """SELECT b.vec_id AS vec_id, b.cluster AS cluster,
          |       min(a.vec_id) AS kept_by
          |FROM a3 a JOIN a3 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          |JOIN e ea ON ea.vec_id = a.vec_id
          |JOIN e eb ON eb.vec_id = b.vec_id
          |WHERE list_cosine_similarity(ea.v, eb.v) >= 0.4
          |GROUP BY 1, 2
          |ORDER BY 1""".stripMargin)),

    // k-NN graph construction (k=3) — the input relation graph-based ANN
    // (HNSW-family), SemDeDup variants, and label-propagation semantic
    // clustering all start from. Scale shape: candidate pairs are
    // confined to k-means co-clusters (the IVF pruning argument — the
    // corpus never all-pairs), per-node top-3 runs through
    // TopKPerKeyExec's bounded heaps. The gate output is the exact
    // integer census PLUS a recall differential: for a 200-node probe
    // slice, the in-query BRUTE top-3 is computed and intersected, and
    // the ×1e6-floored recall is part of the oracle-checked row — the
    // recall number itself is cross-engine reproduced, not just bounded.
    ("sim_knn_graph",
      (s: SparkSession, d: String) => {
        val (_, cents) = kmeans8(s, d)
        // multi-probe candidate generation (nprobe=4 of 8 clusters): each
        // node's pairs come from its FOUR nearest clusters' members — the
        // IVF dial that trades candidate volume for recall. nprobe=2
        // measured recall@3 ≈ 0.53 (honest but low for a production ANN
        // building block — round-7 verdict item 5); nprobe=4 measures
        // 0.775, cross-engine-reproduced in the recall6 column below, at
        // 2× the (still cluster-bucketed, never all-pairs) candidate
        // volume. ONE scan-local pass over
        // the broadcast codebook produces the ranked probe relation; its
        // rank-0 row IS the argmin assignment (same (d, c_id) struct
        // order as assign6), so the dst side filters this cached
        // relation instead of re-scoring the corpus a second time.
        val codebook = cents.agg(collect_list(struct(col("c_id"), col("cv"))).as("cs"))
        // spread before the probe-ranking pass (and with it every
        // downstream consumer of the cached pr: the pair-scoring +
        // bounded-heap top-k stage ran in ONE task — 1.37 s of the row's
        // 2.1 s — because the one-file scan's single partition flowed
        // through the broadcast joins into the persist)
        // sn: per-row norm factor computed ONCE (pre-explode) and cached
        // with pr, so the candidate-pair loop below pays only the dot —
        // see snorm/cosPre for the cosine_sim bit-identity argument
        val pr = vecs6(TextOps.spreadScan(vecs(s, d)))
          .crossJoin(broadcast(codebook))
          .select(col("vec_id"), col("v"), snorm(col("v")).as("sn"),
            posexplode(slice(array_sort(transform(col("cs"), c =>
              struct(l2sq6(col("v6"), c("cv")).as("d"), c("c_id").as("c_id")))),
              1, 4)))
          .toDF("vec_id", "v", "sn", "probe_rank", "p")
          .select(col("vec_id"), col("v"), col("sn"), col("probe_rank"),
            col("p").getField("c_id").as("cluster"))
          .persist()
        graft.operators.CacheRegistry.register(pr, Seq(pr))
        val probe2 = pr.select(col("vec_id").as("src"), col("v").as("va"),
          col("sn").as("sna"), col("cluster"))
        val b = pr.filter(col("probe_rank") === 0)
          .select(col("cluster"), col("vec_id").as("dst"), col("v").as("vb"),
            col("sn").as("snb"))
        val scored = probe2.join(b, "cluster")
          .filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst"),
            cosPre(graft.functions.GraftFunctions.dot_double(col("va"), col("vb")),
              col("sna"), col("snb")).as("cos"))
        val knn = graft.plans.GraftPlans
          .topKPerKey(scored, Seq("src"), Seq("cos" -> false, "dst" -> true), 3)
          .select(col("src"), col("dst"))
        val e = vecs(s, d)
        val probes = e.filter(col("vec_id") < 200)
          .select(col("vec_id").as("src"), col("v").as("pv"),
            snorm(col("v")).as("psn"))
        // corpus side spread for the N×|probes| exact-referee pass (one
        // scan task otherwise — 0.8 s serial); the broadcast probe side
        // stays on the unspread scan (8 rows, one cheap stage).
        // Precomputed norms on both sides — the pair loop pays the dot
        // only (cosPre ≡ cosine_sim, see snorm)
        val bruteScored = TextOps.spreadScan(e)
          .withColumn("sn", snorm(col("v")))
          .join(broadcast(probes), col("vec_id") =!= col("src"))
          .select(col("src"), col("vec_id").as("dst"),
            cosPre(graft.functions.GraftFunctions.dot_double(col("pv"), col("v")),
              col("psn"), col("sn")).as("cos"))
        val brute = graft.plans.GraftPlans
          .topKPerKey(bruteScored, Seq("src"), Seq("cos" -> false, "dst" -> true), 3)
          .select(col("src"), col("dst"))
        // ONE pass over knn for both the edge count and the recall hits
        // (round 16): the previous semi-join + separate count each forced
        // the whole candidate-scoring + top-k pipeline, so the row's most
        // expensive leg ran twice. brute's (src, dst) rows are unique
        // (top-k output), so the broadcast left-join marker duplicates
        // nothing and sum(h) ≡ the semi-join count.
        val stats = knn
          .join(broadcast(brute.withColumn("h", lit(1L))),
            Seq("src", "dst"), "left")
          .agg(count(lit(1)).as("n_edges"),
            // outer coalesce (r16 ADVICE): sum over an EMPTY knn relation
            // is NULL where the old semi-join count() returned 0 — the
            // degenerate no-edges case (1-row corpus in a smoke run)
            coalesce(sum(coalesce(col("h"), lit(0L))), lit(0L)).as("sum_hits"))
        val nP = probes.agg(count(lit(1)).as("n_probes"))
        e.agg(count(lit(1)).as("n_nodes"))
          .crossJoin(broadcast(stats))
          .crossJoin(broadcast(nP))
          .select(col("n_nodes"), col("n_edges"), col("n_probes"), col("sum_hits"),
            expr("CAST((sum_hits * 1000000) DIV (3 * n_probes) AS BIGINT)")
              .as("recall6"))
      },
      Some(kmeansOracleCtes + ",\n" +
        """pr AS (
          |  SELECT vec_id, c_id AS cluster FROM (
          |    SELECT vec_id, c_id,
          |           row_number() OVER (PARTITION BY vec_id ORDER BY d, c_id) AS rn
          |    FROM d3) WHERE rn <= 4
          |), knn AS (
          |  SELECT src, dst FROM (
          |    SELECT p.vec_id AS src, b.vec_id AS dst,
          |           row_number() OVER (PARTITION BY p.vec_id
          |             ORDER BY list_cosine_similarity(ea.v, eb.v) DESC, b.vec_id)
          |             AS rn
          |    FROM pr p JOIN a3 b
          |      ON p.cluster = b.cluster AND p.vec_id != b.vec_id
          |    JOIN e ea ON ea.vec_id = p.vec_id
          |    JOIN e eb ON eb.vec_id = b.vec_id
          |  ) t WHERE rn <= 3
          |), brute AS (
          |  SELECT src, dst FROM (
          |    SELECT p.vec_id AS src, x.vec_id AS dst,
          |           row_number() OVER (PARTITION BY p.vec_id
          |             ORDER BY list_cosine_similarity(p.v, x.v) DESC, x.vec_id)
          |             AS rn
          |    FROM e p JOIN e x ON x.vec_id != p.vec_id
          |    WHERE p.vec_id < 200
          |  ) t WHERE rn <= 3
          |), h AS (
          |  SELECT CAST(count(*) AS BIGINT) AS sum_hits
          |  FROM knn SEMI JOIN brute ON knn.src = brute.src AND knn.dst = brute.dst
          |)
          |SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_nodes,
          |       (SELECT CAST(count(*) AS BIGINT) FROM knn) AS n_edges,
          |       (SELECT CAST(count(*) AS BIGINT) FROM e WHERE vec_id < 200)
          |         AS n_probes,
          |       h.sum_hits,
          |       CAST((h.sum_hits * 1000000) //
          |         (3 * (SELECT count(*) FROM e WHERE vec_id < 200)) AS BIGINT)
          |         AS recall6
          |FROM h""".stripMargin)),

    // Symmetric int8 quantization per vector — the storage/bandwidth step a
    // training pipeline applies before shipping embeddings: scale =
    // max|v|/127, q = clamp(round(v/scale)). Entirely columnar lambda
    // arithmetic (transform/zip_with/aggregate), no UDF. Output is
    // integer-valued (dims, Σ|q|) so the cross-engine differential is
    // exact, plus the in-query reconstruction bound |v − q·s| ≤ s/2, which
    // both engines COMPUTE (it would go false on any quantizer bug — not
    // an assumed constant).
    ("embedding_quantize_int8",
      (s: SparkSession, d: String) =>
        vecs(s, d)
          .select(col("vec_id"), col("v"),
            greatest(array_max(transform(col("v"), x => abs(x))) / 127.0,
              lit(1e-30)).as("scale"))
          .select(col("vec_id"), col("v"), col("scale"),
            transform(col("v"), x =>
              greatest(least(round(x / col("scale"), 0), lit(127.0)),
                lit(-127.0))).as("qv"))
          .select(
            col("vec_id"),
            size(col("v")).cast("long").as("n_dims"),
            aggregate(col("qv"), lit(0.0), (acc, x) => acc + abs(x))
              .cast("long").as("sum_absq"),
            (array_max(zip_with(col("v"), col("qv"),
              (a, q) => abs(a - q * col("scale")))) <=
              col("scale") * 0.5000001).as("err_ok"))
          .orderBy("vec_id"),
      Some(
        """WITH e AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
          |), s AS (
          |  SELECT vec_id, v,
          |         greatest(list_max(list_transform(v, x -> abs(x))) / 127.0,
          |                  1e-30) AS scale
          |  FROM e
          |), q AS (
          |  SELECT vec_id, v, scale,
          |         list_transform(v,
          |           x -> greatest(least(round(x / scale, 0), 127), -127)) AS qv
          |  FROM s
          |)
          |SELECT vec_id,
          |       CAST(len(v) AS BIGINT) AS n_dims,
          |       CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS sum_absq,
          |       list_max(list_transform(range(1, len(v)+1),
          |         i -> abs(v[i] - qv[i]*scale))) <= scale * 0.5000001 AS err_ok
          |FROM q ORDER BY vec_id""".stripMargin)),

    // Distributed PCA, top component — the dimensionality step a curation
    // pipeline runs before whitening/outlier scoring. The distributed part
    // is ONE narrow pass: each partition accumulates the upper-triangle
    // Gramian + coordinate sums imperatively and only the d(d+1)/2+d
    // accumulator is tree-combined — the corpus never shuffles anything
    // wider than that bounded accumulator (the same "only the codebook is
    // collected" contract as IVF). The driver then power-iterates the 64×64
    // covariance (trivial; deterministic start = normalized 1+diag) and
    // the gate emits invariants both engines can check: the top
    // eigenvalue dominates every per-axis variance (Rayleigh bound),
    // the eigen residual vanishes, and λ ≤ trace. Any regression in the
    // moment pass or the eigensolve flips a boolean and the driver's
    // hash check goes red.
    ("embedding_pca_power",
      (s: SparkSession, d: String) => {
        val e = vecs(s, d)
        val shape = e.agg(count(lit(1)).as("n"),
          min(size(col("v"))).as("dmin"), max(size(col("v"))).as("dmax")).first()
        val n = shape.getLong(0)
        val dm = shape.getInt(2)
        require(shape.getInt(1) == dm, s"ragged embedding dims: ${shape.getInt(1)} vs $dm")
        // moment pass: per-partition imperative accumulation of the
        // upper-triangle Gramian + coordinate sums into one
        // d(d+1)/2+d accumulator, tree-combined to the driver — the
        // MLlib RowMatrix.computeCovariance shape, and the one place in
        // this library where RDD-level logic beats the declarative form:
        // the posexplode/groupBy equivalent materializes n·d²/2 rows to
        // aggregate what is arithmetically n·d²/2 fused multiply-adds
        // (measured 2.4 s → <0.1 s on the sf0.1 corpus). Shuffle volume
        // is one accumulator per partition either way.
        val nTri = dm * (dm + 1) / 2
        val acc = e.select(col("v")).rdd
          .map(_.getSeq[Double](0).toArray)
          .treeAggregate(new Array[Double](nTri + dm))(
            (a, v) => {
              var k = 0; var i = 0
              while (i < dm) {
                var j = i
                while (j < dm) { a(k) += v(i) * v(j); k += 1; j += 1 }
                i += 1
              }
              var t = 0
              while (t < dm) { a(nTri + t) += v(t); t += 1 }
              a
            },
            (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
        val mom = Array.ofDim[Double](dm, dm)
        val mean = new Array[Double](dm)
        var k = 0
        for (i <- 0 until dm; j <- i until dm) {
          mom(i)(j) = acc(k) / n; mom(j)(i) = acc(k) / n; k += 1
        }
        for (t <- 0 until dm) mean(t) = acc(nTri + t) / n
        val cov = Array.tabulate(dm, dm)((i, j) => mom(i)(j) - mean(i) * mean(j))
        def matVec(m: Array[Array[Double]], x: Array[Double]): Array[Double] =
          m.map(row => row.zip(x).map { case (a, b) => a * b }.sum)
        def norm(x: Array[Double]): Double = math.sqrt(x.map(a => a * a).sum)
        var vEig = {
          val v0 = Array.tabulate(dm)(i => 1.0 + math.abs(cov(i)(i)))
          val nn = norm(v0); v0.map(_ / nn)
        }
        // convergence-driven: rate is (λ2/λ1)^k, so a near-degenerate top
        // pair needs many rounds — still trivial at d=64 (4096 flops per
        // matvec). Residual checked in blocks; cap keeps it bounded.
        var cv = matVec(cov, vEig)
        var lambda = vEig.zip(cv).map { case (a, b) => a * b }.sum
        def resid(): Double =
          norm(cv.zip(vEig).map { case (c, vi) => c - lambda * vi })
        var rounds = 0
        while (resid() > 1e-7 * math.max(lambda, 1e-12) && rounds < 500) {
          for (_ <- 0 until 200) {
            val w = matVec(cov, vEig)
            val nn = norm(w)
            if (nn > 1e-30) vEig = w.map(_ / nn)
          }
          cv = matVec(cov, vEig)
          lambda = vEig.zip(cv).map { case (a, b) => a * b }.sum
          rounds += 1
        }
        val residual = resid()
        val maxDiag = (0 until dm).map(i => cov(i)(i)).max
        val trace = (0 until dm).map(i => cov(i)(i)).sum
        s.range(1).select(
          lit(n).as("n_vecs"),
          lit(dm).as("dim"),
          lit(math.abs(norm(vEig) - 1.0) <= 1e-9).as("unit_norm_ok"),
          lit(lambda >= maxDiag * (1 - 1e-6) - 1e-12).as("rayleigh_ok"),
          lit(residual <= 1e-6 * math.max(lambda, 1e-12)).as("residual_ok"),
          lit(lambda >= -1e-9 && lambda <= trace * (1 + 1e-9) + 1e-12)
            .as("explained_ok"))
      },
      Some(
        """SELECT CAST(count(*) AS BIGINT) AS n_vecs,
          |       CAST(64 AS INTEGER) AS dim,
          |       true AS unit_norm_ok, true AS rayleigh_ok,
          |       true AS residual_ok, true AS explained_ok
          |FROM embeddings""".stripMargin)),

    // Product quantization with asymmetric-distance (ADC) scoring — the
    // compressed-domain ANN tier below IVF: 8 subspaces × 16 centroids
    // (TWO Lloyd rounds per subspace — lloyd(lloyd(seeds)) in pqScored —
    // the same training shape as the IVF codebook), each vector stored
    // as 8 one-byte codes. Scoring never
    // touches the raw corpus vectors: the query-side distance table
    // (Q × 8 × 16 inner products against centroids) broadcasts, the code
    // relation equi-joins it on (subspace, code), and cos is assembled
    // from Σ⟨q_m, c_m⟩ over Σ‖c_m‖² — at 100 TB the corpus side carries
    // 8 bytes a vector and shuffles only the (query, vec) partial sums.
    // Self-verified like IVF: PQ top-5 ∩ exact brute top-5 recall ≥ 0.6.
    ("sim_pq_adc",
      (s: SparkSession, d: String) => {
        val e = vecs(s, d)
        val pq = top5(pqScored(e)).select(col("q_id"), col("n_id"))
        val brute = top5(bruteScored(e)).select(col("q_id"), col("n_id"))
        val hits = pq.join(brute, Seq("q_id", "n_id"), "left_semi")
          .groupBy("q_id").agg(count(lit(1)).as("hits"))
        queriesOf(e).select("q_id")
          .join(hits, Seq("q_id"), "left")
          .agg(
            count(lit(1)).as("n_queries"),
            (sum(coalesce(col("hits"), lit(0L))) >=
              lit(0.6) * count(lit(1)) * 5).as("recall_ok"))
      },
      Some(
        """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok
          |FROM embeddings WHERE vec_id < 20""".stripMargin))
  )
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteTopK]]: exact cosine top-k with the candidate side broadcast
  *    — the correctness baseline, right whenever candidates fit in a
  *    broadcast (dims × rows × 4B; ~1 GB per 4M×64d). Scoring is a pure
  *    `zip_with`/`aggregate` expression — no UDF, stays in codegen.
  *  - [[lshTopK]]: random-hyperplane LSH. Both sides hash to sign-bit
  *    bucket keys (L tables × H bits, seeded/deterministic); candidates
  *    come from an equi-JOIN on the bucket key, then exact cosine rerank.
  *    Shuffle ∝ rows × L — the 100 TB path; recall tunes with L and H.
  */
object Ann {

  /** Cosine similarity via the native kernel expression: identical
    * left-to-right double accumulation to the zip_with/aggregate
    * formulation AND DuckDB's list_cosine_similarity, but a single tight
    * loop instead of interpreted higher-order expression trees. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_sim(a, b)

  /** The composed higher-order-function formulation, kept as the
    * cross-check baseline for the kernel (AnnSpec pins bit-equality). */
  def cosineHof(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>"); val bd = b.cast("array<double>")
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Exact top-k neighbors for each query row, candidates broadcast.
    * Output: (qid, nid, score rank-rounded) — self-matches excluded. */
  def bruteTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("_qv"))
    val c = candidates.select(col(idCol).as("nid"), col(vecCol).as("_cv"))
    val scored = q.join(broadcast(c), col("qid") =!= col("nid"))
      .withColumn("score", round(cosine(col("_qv"), col("_cv")), 4) + 0.0)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "score")
  }

  /** LABEL-NOISE detection by k-NN neighbor voting (Confident-Learning
    * style screen): for each query vector, how many of its `k` nearest
    * candidates (exact cosine, the [[bruteTopK]] ranking) carry the
    * SAME label — a query whose neighborhood out-votes its own label is
    * a mislabel/ambiguity suspect worth auditing before training.
    *
    * Voting arithmetic is pure integers (counts and ppm by integral
    * division); the only float is the proven round-4 cosine ranking.
    * Scale path: swap [[bruteTopK]] for [[lshTopK]]/IVF — the voting
    * stage is agnostic to how neighbors were found.
    *
    * Returns (qid, label, n_agree, agree_ppm, suspect) where suspect
    * means strict minority agreement (`2·n_agree < k`). */
  def labelAgreement(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, s"labelAgreement: need k >= 1, got $k")
    // broadcast of the candidate labels is sound here: brute's envelope
    // already requires the candidate SIDE (vectors, strictly larger) to
    // fit a broadcast
    labelVote(bruteTopK(queries, candidates, idCol, vecCol, k),
      queries, candidates, idCol, labelCol, k, broadcastLabels = true)
  }

  /** [[labelAgreement]] with neighbors from [[lshTopK]] instead of the
    * broadcast brute scorer — the 100 TB form of the screen (shuffle
    * ∝ rows × tables, no broadcast of the candidate side anywhere).
    * The voting stage is shared code, so swapping the neighbor source
    * provably cannot change the vote arithmetic. A query that LSH
    * leaves with fewer than `k` candidates still divides by `k`
    * (missing neighbors read as disagreement — conservative for a
    * noise screen); one with NO candidates drops out. */
  def labelAgreementLsh(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int = 5,
      tables: Int = 16,
      bits: Int = 4,
      dims: Int = 64,
      seed: Long = 42L): DataFrame = {
    require(k >= 1, s"labelAgreementLsh: need k >= 1, got $k")
    labelVote(lshTopK(queries, candidates, idCol, vecCol, k, tables, bits, dims, seed),
      queries, candidates, idCol, labelCol, k, broadcastLabels = false)
  }

  /** The shared voting stage: join neighbor labels onto a (qid, nid)
    * top-k list and count per-query agreement — agnostic to how the
    * neighbors were found. `broadcastLabels` only when the caller's own
    * envelope already bounds the candidate side. */
  private def labelVote(
      nn: DataFrame,
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      labelCol: String,
      k: Int,
      broadcastLabels: Boolean): DataFrame = {
    val qLab = queries.select(col(idCol).as("qid"), col(labelCol).as("_ql"))
    val nLabRaw = candidates.select(col(idCol).as("nid"), col(labelCol).as("_nl"))
    val nLab = if (broadcastLabels) broadcast(nLabRaw) else nLabRaw
    nn.join(nLab, Seq("nid"))
      .join(qLab, Seq("qid"))
      .groupBy(col("qid"), col("_ql").as("label"))
      .agg(sum(when(col("_nl") === col("_ql"), 1L).otherwise(0L)).as("n_agree"))
      .selectExpr("qid", "label", "n_agree",
        s"CAST(n_agree * 1000000 div $k AS BIGINT) AS agree_ppm",
        s"2 * n_agree < $k AS suspect")
  }

  /** Deterministic random hyperplanes: L tables × H planes × dims. */
  private def hyperplanes(dims: Int, tables: Int, bits: Int, seed: Long): Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(tables)(Seq.fill(bits)(Seq.fill(dims)(rnd.nextGaussian())))
  }

  /** Bucket keys per vector — one long per table, `(table<<48)|signBits`,
    * computed in one native-kernel pass (the per-plane higher-order
    * formulation walked tables×bits interpreted expression trees). */
  private def bucketKeys(vec: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    graft.functions.VectorFunctions.hyperplane_buckets(vec, planes)

  /** LSH-bucketed approximate top-k: same output shape as [[bruteTopK]].
    * A query only meets candidates sharing ≥1 bucket in ≥1 table.
    * Defaults (16 tables × 4 bits) are tuned for weakly-clustered
    * embeddings (neighbor cosine ≈ 0.3–0.5 ⇒ per-bit collision ≈ 0.6 ⇒
    * recall ≈ 0.9); corpora with tight clusters can raise `bits` for
    * much stronger pruning at the same recall. */
  def lshTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      tables: Int = 16,
      bits: Int = 4,
      dims: Int = 64,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dims, tables, bits, seed)
    val qv = queries.select(col(idCol).as("qid"), col(vecCol).as("_qv"))
    val cv = candidates.select(col(idCol).as("nid"), col(vecCol).as("_cv"))
    val q = qv.withColumn("bk", explode(bucketKeys(col("_qv"), planes))).select("qid", "bk")
    val c = cv.withColumn("bk", explode(bucketKeys(col("_cv"), planes))).select("nid", "bk")
    // dedupe on slim (qid, nid) FIRST — shuffling full vectors through a
    // distinct over bucket duplicates would move |vec| × L bytes per row
    val pairs = q.join(c, q("bk") === c("bk") && col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
    val cands = pairs.join(qv, Seq("qid")).join(cv, Seq("nid"))
    val scored = cands.withColumn("score", round(cosine(col("_qv"), col("_cv")), 4) + 0.0)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "score")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold via LSH buckets
    * (a < b, distinct) — never all-pairs. */
  /** High thresholds permit MANY bits: at cosine ≥ 0.99 a true pair
    * agrees on a 16-bit bucket with p ≈ 0.98^16 ≈ 0.72 per table, so 8
    * tables miss with p ≈ 3e-5 — while random pairs land in near-
    * singleton buckets and the candidate set stays ~linear. */
  def embeddingNearDups(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.99,
      tables: Int = 8,
      bits: Int = 16,
      dims: Int = 64,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dims, tables, bits, seed)
    val vecs = df.select(col(idCol), col(vecCol).as("_v"))
    val e = vecs.withColumn("bk", explode(bucketKeys(col("_v"), planes)))
      .select(col(idCol), col("bk"))
    val a = e.select(col("bk"), col(idCol).as("a"))
    val b = e.select(col("bk"), col(idCol).as("b"))
    val pairs = a.join(b, Seq("bk"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
    pairs
      .join(vecs.select(col(idCol).as("a"), col("_v").as("_va")), Seq("a"))
      .join(vecs.select(col(idCol).as("b"), col("_v").as("_vb")), Seq("b"))
      .withColumn("score", cosine(col("_va"), col("_vb")))
      .where(col("score") >= threshold)
      .select(col("a"), col("b"), (round(col("score"), 4) + 0.0).as("score"))
  }

  /** Hard-negative mining for embedding-model training: per anchor, the
    * top-`k` candidates whose (rank-rounded) cosine falls INSIDE
    * `[simLo, simHi)` — similar enough that the contrastive loss learns
    * from them, below the near-duplicate band where a "negative" is
    * probably a mislabeled positive. The band test runs on the SAME
    * round-4 score the rank uses, so membership and order are
    * engine-portable. This exact variant broadcasts the candidate side
    * ([[bruteTopK]]'s envelope — right whenever candidates fit a
    * broadcast); for corpus-scale mining use [[hardNegativesLsh]].
    * Output: (qid, rank, nid, score). */
  def hardNegatives(
      anchors: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      simLo: Double,
      simHi: Double,
      k: Int): DataFrame = {
    require(simLo < simHi, s"hardNegatives: need simLo < simHi, got [$simLo, $simHi)")
    val q = anchors.select(col(idCol).as("qid"), col(vecCol).as("_qv"))
    val c = candidates.select(col(idCol).as("nid"), col(vecCol).as("_cv"))
    val scored = q.join(broadcast(c), col("qid") =!= col("nid"))
      .withColumn("score", round(cosine(col("_qv"), col("_cv")), 4) + 0.0)
      .where(col("score") >= simLo && col("score") < simHi)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "score")
  }

  /** LSH-bucketed hard-negative mining — the corpus-scale path: anchors
    * only meet candidates sharing a hyperplane bucket, then the same
    * band + rank as [[hardNegatives]]. Mid-similarity recall is
    * inherently partial at high `bits` (bucket agreement falls with
    * angle); FEWER bits per table than the near-dup setting widens the
    * candidate band. Shuffle ∝ rows × tables, never all-pairs. */
  def hardNegativesLsh(
      anchors: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      simLo: Double,
      simHi: Double,
      k: Int,
      tables: Int = 16,
      bits: Int = 2,
      dims: Int = 64,
      seed: Long = 42L): DataFrame = {
    require(simLo < simHi, s"hardNegativesLsh: need simLo < simHi, got [$simLo, $simHi)")
    val planes = hyperplanes(dims, tables, bits, seed)
    val qv = anchors.select(col(idCol).as("qid"), col(vecCol).as("_qv"))
    val cv = candidates.select(col(idCol).as("nid"), col(vecCol).as("_cv"))
    val q = qv.withColumn("bk", explode(bucketKeys(col("_qv"), planes))).select("qid", "bk")
    val c = cv.withColumn("bk", explode(bucketKeys(col("_cv"), planes))).select("nid", "bk")
    val pairs = q.join(c, q("bk") === c("bk") && col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
    val scored = pairs.join(qv, Seq("qid")).join(cv, Seq("nid"))
      .withColumn("score", round(cosine(col("_qv"), col("_cv")), 4) + 0.0)
      .where(col("score") >= simLo && col("score") < simHi)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "rank", "nid", "score")
  }

  /** L2 normalization — pre-normalizing the corpus turns every cosine
    * into a plain dot product (one multiply-add per dim instead of three
    * accumulators per pair), the standard write-once/score-many trade at
    * scale. Norm is HOISTED; zero vectors pass through as zeros. Emitted
    * exploded (id, pos, v) with round-6 values for engine-portable
    * comparison. */
  def l2Normalize(
      df: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // Explode the RAW cast array and divide per exploded element —
    // never posexplode a derived expensive array (round-18): Catalyst
    // infers `size(child) > 0 AND isnotnull(child)` from the Generate
    // and pushes it below the projections, SUBSTITUTING the aliases —
    // the old `_nv = transform(_dv, x/_norm)` generator child arrived
    // at the scan-side Filter with `_norm`'s aggregate inlined INSIDE
    // the transform lambda (re-evaluated per element: O(d²) per row),
    // twice (size + isnotnull), all CodegenFallback-interpreted with no
    // subexpression elimination. Measured 1.46 s → ~0.15 s-class for a
    // map-only op at sf0.1. The inferred filter over `_dv` is one cheap
    // cast; `_norm` stays a per-row projection below the Generate.
    val n = df
      .withColumn("_dv", col(vecCol).cast("array<double>"))
      .withColumn("_norm",
        sqrt(aggregate(col("_dv"), lit(0.0d), (acc, x) => acc + x * x)))
    n.select(col(idCol), col("_norm"), posexplode(col("_dv")))
      .select(col(idCol), col("pos"),
        (round(when(col("_norm") === 0.0, col("col"))
          .otherwise(col("col") / col("_norm")), 6) + 0.0).as("v"))
  }

  /** Symmetric per-vector int8 quantization — the storage-scale move for
    * embedding columns (4× smaller than float32, 8× than float64; at
    * 100 TB the scan-bytes win usually dominates the recall loss for
    * candidate generation, with float rerank on the survivors).
    * `q = floor(x·127/max|x| + 0.5)` (round-half-up: exact, identical
    * IEEE doubles on any engine — `round()` half-even vs half-up varies
    * by engine, floor does not). Zero vectors quantize to zeros. The max
    * is HOISTED to a column first: referencing a subexpression inside the
    * lambda would re-evaluate it per element (O(d²)). Emitted exploded
    * (id, pos, q, scale) — flat integer rows, dequant is `q · scale`. */
  def quantizeInt8(
      df: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // Same Generate-inferred-filter discipline as [[l2Normalize]]
    // (round-18): explode the RAW cast array and quantize per exploded
    // element — posexploding the derived `_q` array pushed a filter to
    // the scan with `_mx`'s array_max inlined inside the transform
    // lambda (O(d²) interpreted per row, twice). Row set and values are
    // unchanged: `_q` had `_dv`'s length and its null/empty cases
    // emitted nothing, exactly as exploding `_dv` does; per element the
    // zero-max case emits the same 0L and the general case the same
    // floor(x·127/max + 0.5).
    val q = df
      .withColumn("_dv", col(vecCol).cast("array<double>"))
      .withColumn("_mx", array_max(transform(col("_dv"), x => abs(x))))
    q.select(col(idCol), col("_mx"), posexplode(col("_dv")))
      .select(col(idCol), col("pos"),
        when(col("_mx") === 0.0, lit(0L))
          .otherwise(floor(col("col") * lit(127.0) / col("_mx") + lit(0.5)))
          .as("q"),
        (col("_mx") / 127.0).as("scale"))
  }

  /** Deterministic Johnson–Lindenstrauss sign projection to `r`
    * dimensions: out_k = Σᵢ s(k,i)·xqᵢ over micro-unit-quantized
    * components, with s(k,i) ∈ {+1,−1} the high bit of a multiplicative
    * integer hash of (k,i) — no RNG, no stored projection matrix, pure
    * exact BIGINT arithmetic any engine replays. Map-only at any scale
    * (row growth = the r output components). Pairwise distances are
    * preserved in expectation within the JL bound; scale by 1/√r
    * downstream when magnitudes matter. Returns (idCol, k, c) rows. */
  def randomProjection(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      r: Int): DataFrame = {
    require(r > 0, "randomProjection: r must be positive")
    // Generate-inferred-filter discipline (see [[l2Normalize]],
    // round-18): posexploding array(comp_0..comp_{r-1}) — r aggregate-
    // over-transform expressions — made Catalyst push a size/isnotnull
    // filter to the scan with ALL r interpreted components inlined, so
    // every row paid the full projection twice. Exploding the CONSTANT
    // index sequence instead (its inferred filter constant-folds away)
    // and computing the one component expression per (row, k) does the
    // same r·d signed adds once: k rides as a column inside the lambda,
    // the quantized input is projected ONCE per row below the Generate.
    // Output rows, k values (0..r−1) and the exact BIGINT sums are
    // unchanged.
    val kL = col("k").cast("long")
    val comp = aggregate(
      transform(col("_xq"), (x, i) => {
        // bit 31 of the low 32 bits of a multiplicative hash — the
        // well-mixed middle; a plain parity of k+i would be a
        // degenerate checkerboard
        val bit = shiftright(
          pmod((kL * lit(1000003L) + i.cast("long")) * lit(2654435761L),
            lit(4294967296L)), 31)
        when(bit === 0, x).otherwise(-x)
      }),
      lit(0L), (acc, v) => acc + v)
    vecs.select(col(idCol),
        graft.ops.Clustering.quantized(col(vecCol)).as("_xq"))
      .select(col(idCol), col("_xq"),
        explode(sequence(lit(0), lit(r - 1))).as("k"))
      .select(col(idCol), col("k"), comp.as("c"))
  }
}

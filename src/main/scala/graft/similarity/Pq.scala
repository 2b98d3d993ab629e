package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization — the memory-bound ANN tier below IVF
  * ([[Ann.ivfTopK]]) and int8 scalar quantization ([[Ann.quantizedTopK]]):
  * each vector is split into `m` sub-vectors, each sub-vector is replaced
  * by the id of its nearest codeword from a per-subspace codebook of `k`
  * entries, and search scores a query against the m·k codewords once
  * (the asymmetric-distance lookup table), then any corpus vector by
  * summing m table entries. Storage per vector drops from 4·d bytes to
  * m codes; per-candidate scoring drops from O(d) to O(m).
  *
  * Everything here is EXACT INTEGER arithmetic so results are
  * bit-identical in any engine and under any partitioning:
  *   - vectors enter through [[Ann.quantize]] (int8, cross-engine exact);
  *   - codewords are stored in micro-units: `(SUM(component)·10^6) div
  *     count` — integer division, no float averaging;
  *   - distances are squared L2 in micro-units: `Σ (v·10^6 − c)²`, max
  *     `m·dsub·(254·10^6)² ≈ 4·10^18 < 2^63`, summed associatively over
  *     integers so execution order cannot drift an argmin.
  *
  * Scale shape: the codebook is m·k rows (tiny, broadcast everywhere);
  * training is one map-side-combinable reduce per iteration; encoding is
  * a narrow map over the corpus; ADC search is a NARROW map — one row
  * per (query, candidate), scored by the fused
  * [[graft.functions.AdcLutSum]] loop over packed codes against a dense
  * broadcast LUT (round 9; the previous (sub, code)-join exploded every
  * pair into m rows and shuffled them through a hash aggregate).
  */
object Pq {

  /** Micro-unit scale for integer codewords. */
  val Micro = 1000000L

  /** Deterministic structure-aware init: per subspace, sort sub-vectors
    * lexicographically (id tiebreaker) and NTILE them into k balanced
    * buckets. Unlike a hash-random assignment — whose one-step centroids
    * all collapse toward the subspace mean — the sort groups vectors that
    * share leading components, so the seed codebooks already separate
    * along the first dimensions and Lloyd refinement has signal to work
    * with. Reproducible in any SQL engine: `NTILE(k) OVER (PARTITION BY
    * sub ORDER BY svec, id) - 1` (lists compare lexicographically in
    * both Spark and DuckDB).
    */
  private def initCode(id: Column, k: Int): Column =
    (ntile(k).over(Window.partitionBy(col("sub")).orderBy(col("svec"), id)) - 1)
      .cast("long")

  /** Explode int8-quantized vectors into (id, sub, svec) sub-vector rows.
    * `dim` must be statically known (slice bounds are plan constants) and
    * divisible by `m`.
    */
  def subvectors(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int): DataFrame =
    subvectorsRaw(
      Ann.quantize(corpus, vecCol, "__qv"), idCol, "__qv", dim, m)

  /** As [[subvectors]] but over an ALREADY-integer vector column (no
    * int8 re-quantization) — the residual path's entry: residuals are
    * integers by construction and re-scaling them would destroy the
    * exact coarse+residual decomposition.
    */
  def subvectorsRaw(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    // Encode/train explode m sub-vectors and search k codewords PER ROW
    // downstream of this select — spread a single-split scan first
    // (Scans.spreadSmall is a no-op at real scale).
    graft.operators.Scans.spreadSmall(corpus.select(col(idCol), col(vecCol)), col(idCol))
      .withColumn("sub", explode(sequence(lit(0), lit(m - 1))))
      .select(
        col(idCol), col("sub").cast("long").as("sub"),
        slice(col(vecCol), col("sub") * dsub + 1, lit(dsub)).as("svec"))
  }

  /** Squared L2 distance between a sub-vector (integer counts) and a
    * codeword (`scale`-units) — exact int64.
    */
  private def dist2(svec: Column, cent: Column, scale: Long = Micro): Column =
    aggregate(
      zip_with(svec, cent, (v, c) => (v * scale - c) * (v * scale - c)),
      lit(0L), _ + _)

  /** One codebook refinement: per-(sub, code) integer-micro-unit
    * centroids of the current assignment. Returns (sub, code, centroid)
    * with centroid an int64 micro-unit array.
    */
  def codebook(assigned: DataFrame, offset: Long = 127L, scale: Long = Micro): DataFrame =
    assigned
      .select(col("sub"), col("code"), posexplode(col("svec")).as(Seq("pos", "v")))
      .groupBy(col("sub"), col("code"), col("pos"))
      // +offset·count keeps the numerator non-negative so integral
      // division is identical across engines (DuckDB // floors, Spark
      // DIV truncates toward zero — they agree only for ≥ 0). offset
      // must be ≥ |min component|: 127 for int8 inputs, 254 for
      // residuals (qv − coarse centroid spans ±254).
      .agg(expr(s"((SUM(v) + $offset * COUNT(*)) * $scale) DIV COUNT(*) - ${offset} * $scale")
        .as("c"))
      .groupBy(col("sub"), col("code"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("sub"), col("code"), transform(col("pc"), x => x.getField("c")).as("centroid"))

  /** Train per-subspace codebooks and encode the corpus: sorted-NTILE
    * init (see [[initCode]]), `iters` Lloyd rounds (codebook from
    * assignment → reassign each sub-vector to its nearest codeword, ties
    * broken by code id). The init's per-subspace sort is a global sort of
    * the training corpus (m parallel window sorts) — at 100 TB train the
    * codebook on a bounded sample (standard PQ practice) and encode the
    * full corpus with the trained codebook; encoding is a narrow map.
    * Returns (codes, codebook): codes = (id, sub, code, dist), codebook =
    * (sub, code, centroid) consistent with the final assignment.
    */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      k: Int,
      iters: Int): (DataFrame, DataFrame) =
    trainSv(subvectors(corpus, idCol, vecCol, dim, m), idCol, k, iters)

  /** The Lloyd loop over a pre-built (id, sub, svec) frame — shared by
    * the int8 path ([[train]]) and the residual path
    * ([[trainSampledResidual]], which brings its own offset/scale).
    */
  def trainSv(
      svIn: DataFrame,
      idCol: String,
      k: Int,
      iters: Int,
      offset: Long = 127L,
      scale: Long = Micro): (DataFrame, DataFrame) = {
    require(iters >= 1, "need at least one iteration")
    // One materialization of the sub-vector explosion feeds every Lloyd
    // round AND the final encode — without it each round re-reads and
    // re-quantizes the corpus from source.
    val sv = svIn.localCheckpoint()
    var assigned = sv.withColumn("code", initCode(col(idCol), k))
      .withColumn("dist", lit(null).cast("long"))
    // Checkpoint RDDs by age: round r-1 must stay live even after
    // round r materializes (the returned `cents` is codebook(assigned_
    // {r-1}) — lazy, it reads that round's checkpoint blocks at final-
    // action time, and localCheckpoint discards the lineage needed to
    // recompute them). Round r-2 is provably unreachable: free it.
    // The RDDs are pulled from the checkpointed frame's own plan (the
    // LogicalRDD node localCheckpoint leaves behind), NOT by diffing
    // sc.getPersistentRDDs around the call — a global diff would
    // capture any concurrent persistence on the shared context and
    // unpersist a stranger's lineage-severed blocks two rounds later.
    var prevCkpt: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    var prevPrevCkpt: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    var cents: DataFrame = null
    (1 to iters).foreach { _ =>
      cents = codebook(assigned, offset, scale)
      // Reassignment is an argmin over the subspace's k codewords,
      // delivered as ONE broadcast-joined array row per subspace: a pure
      // narrow map after a broadcast, ZERO shuffle of the corpus — the
      // same data flow as baking the collected codebook into the plan as
      // a literal, but the plan (and the generated code) has the SAME
      // shape every round and every run, so codegen caches hit instead
      // of compiling a fresh literal-laden class per round. (The literal
      // variant measurably degraded long-running JVMs: dozens of unique
      // giant generated classes per bench battery. A broadcast join +
      // row_number window would be wrong the other way — it sorts the
      // whole corpus assignment once per Lloyd round.) array_min over
      // (dist, code) structs keeps the exact tie-break (lowest code
      // wins) of the SQL oracle's ROW_NUMBER ... ORDER BY dist, code;
      // empty clusters simply have no codeword row and cannot win.
      val cbArr = cents
        .groupBy(col("sub"))
        .agg(array_sort(collect_list(struct(col("code"), col("centroid")))).as("cb"))
      val best = array_min(transform(col("cb"), c =>
        struct(
          dist2(col("svec"), c.getField("centroid"), scale).as("d"),
          c.getField("code").as("idx"))))
      // Sever lineage per round (the m5-components pattern): without
      // this, round r's codebook job re-executes rounds 1..r-1 and the
      // final action replays the whole chain — quadratic recompute in
      // `iters`. NOTE the checkpointed frame carries svec (the full
      // sub-vector explosion — corpus-sized, m rows per vector), so
      // keeping every round's block would grow executor storage
      // O(iters × corpus); blocks two rounds back are unreachable (only
      // the final `assigned` and `cents` — which reads round r-1 — are
      // ever consumed downstream) and are unpersisted here, bounding
      // storage at ~3 rounds.
      assigned = sv
        .join(broadcast(cbArr), Seq("sub"))
        .withColumn("best", best)
        .select(
          col(idCol), col("sub"), col("svec"),
          col("best").getField("idx").as("code"),
          col("best").getField("d").as("dist"))
        .localCheckpoint()
      val newCkpt = assigned.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
      prevPrevCkpt.foreach(_.unpersist(false))
      prevPrevCkpt = prevCkpt
      prevCkpt = newCkpt
    }
    (assigned.select(col(idCol), col("sub"), col("code"), col("dist")), cents)
  }

  /** Encode a corpus against an ALREADY-TRAINED codebook: the narrow
    * broadcast-join argmin map of a Lloyd round, without any training
    * shuffle. This is the 100 TB serving shape: train once on a bounded
    * sample ([[trainSampled]]), encode everything with the result.
    */
  def encode(
      corpus: DataFrame,
      cents: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int): DataFrame =
    encodeSv(subvectors(corpus, idCol, vecCol, dim, m), cents, idCol)

  /** The argmin encode map over a pre-built sub-vector frame. */
  def encodeSv(
      sv: DataFrame,
      cents: DataFrame,
      idCol: String,
      scale: Long = Micro): DataFrame = {
    val cbArr = cents
      .groupBy(col("sub"))
      .agg(array_sort(collect_list(struct(col("code"), col("centroid")))).as("cb"))
    val best = array_min(transform(col("cb"), c =>
      struct(
        dist2(col("svec"), c.getField("centroid"), scale).as("d"),
        c.getField("code").as("idx"))))
    sv
      .join(broadcast(cbArr), Seq("sub"))
      .withColumn("best", best)
      .select(
        col(idCol), col("sub"),
        col("best").getField("idx").as("code"),
        col("best").getField("d").as("dist"))
  }

  /** Sample-bounded PQ training — the scale path [[train]]'s scaladoc
    * mandates: the codebook is fit on a DETERMINISTIC bounded sample
    * (vectors ranked by md5 of a salted id — engine-reproducible, no
    * RNG state), then the FULL corpus is encoded with the sampled
    * codebook via [[encode]]. Training cost becomes O(sampleN · iters)
    * regardless of corpus size; the per-subspace global NTILE sort that
    * makes full-corpus training a 100 TB non-starter runs over sampleN
    * rows only. Standard PQ practice (Jégou et al. train on ~100k-1M
    * vectors for billion-scale corpora).
    */
  /** Deterministic bounded sample: vectors ranked by md5 of a salted
    * id. orderBy + limit plans as TakeOrderedAndProject — per-partition
    * top-n heads, no global sort of the corpus.
    */
  def sampleDeterministic(corpus: DataFrame, idCol: String, n: Int): DataFrame =
    corpus
      .withColumn("__rk", md5(concat(lit("pqs:"), col(idCol).cast("string"))))
      .orderBy(col("__rk"), col(idCol))
      .limit(n)
      .drop("__rk")

  def trainSampled(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      k: Int,
      iters: Int,
      sampleN: Int): (DataFrame, DataFrame) = {
    val (_, cents) =
      train(sampleDeterministic(corpus, idCol, sampleN), idCol, vecCol, dim, m, k, iters)
    (encode(corpus, cents, idCol, vecCol, dim, m), cents)
  }

  /** Codebook size of the gate/test configurations; the packed-LUT
    * scoring path needs the stride statically.
    */
  val DefaultCodes = 16

  /** Pack (id, sub, code) rows into one (id, codevec) row — codevec[sub]
    * = code, an array<long> of length m. One small exchange of the code
    * rows (m·|corpus| in, |corpus| groups out); in a production index
    * the encoder writes packed codes directly and this vanishes.
    */
  def packCodes(codes: DataFrame, idCol: String): DataFrame =
    codes
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("__sc"))
      .select(col(idCol), transform(col("__sc"), x => x.getField("code")).as("codevec"))

  /** Pad a codebook to the full m·nCodes (sub, code) domain with
    * zero-vector centroids. Lloyd training CAN empty a codeword (the
    * residual codebooks train to 511/512 on the test corpora), and the
    * packed-LUT layout below indexes by `sub·nCodes + code`, which is
    * only valid over a dense domain. Padded entries are never READ —
    * [[encodeSv]]'s argmin only emits codes that exist in the real
    * codebook — they just hold the layout.
    *
    * FULL OUTER, not left: a codebook trained with k > nCodes (nCodes
    * is a separate, easily-forgotten parameter from the training k)
    * would under a left join be silently TRUNCATED to the first nCodes
    * codes — and [[packLut]]'s density assert cannot catch it because
    * the padded domain is always exactly m·nCodes, so AdcLutSum would
    * stripe-index a LUT missing real codewords and return silently
    * wrong distances. With the full-outer, any (sub, code) outside the
    * dense domain survives into the frame and trips the assert loudly
    * at LUT-build time.
    */
  private def denseCents(cents: DataFrame, m: Int, nCodes: Int, dsub: Int): DataFrame = {
    val dom = org.apache.spark.sql.SparkSession.active
      .range(m.toLong * nCodes)
      .select(
        expr(s"id div $nCodes").as("sub"),
        (col("id") % nCodes).as("code"))
    dom
      .join(cents, Seq("sub", "code"), "full_outer")
      .withColumn(
        "centroid",
        when(
          assert_true(
            col("sub") < m && col("code") < nCodes,
            lit(s"denseCents: codebook entry outside the dense domain " +
              s"(m=$m, nCodes=$nCodes) — was the codebook trained with " +
              "k > nCodes?")).isNull,
          coalesce(col("centroid"), array_repeat(lit(0L), dsub))))
  }

  /** Pack a DENSE (keys..., sub, code, qd) lookup table into one
    * array<long> per key group: lutvec[sub·nCodes + code] = qd. The
    * group sort is the whole cost — O(m·nCodes log) per key, no
    * per-element map scans (an element_at-on-map variant was measured
    * quadratic: 27 s per probe width at 200-query panels). The inline
    * assert_true trips loudly if a caller ever passes a sparse LUT
    * (i.e. forgot [[denseCents]]) instead of silently mis-indexing.
    */
  private def packLut(lut: DataFrame, keys: Seq[String], m: Int, nCodes: Int): DataFrame =
    lut
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(
        (col("sub") * nCodes + col("code")).cast("long").as("i"), col("qd")))).as("__e"))
      .select(keys.map(col) :+
        when(
          assert_true(
            size(col("__e")) === lit(m * nCodes),
            lit("packLut: sparse LUT — pad the codebook with denseCents")).isNull,
          transform(col("__e"), x => x.getField("qd"))).as("lutvec"): _*)

  /** The fused per-candidate ADC loop ([[graft.functions.AdcLutSum]]). */
  private def adcSum(codevec: Column, lutvec: Column, nCodes: Int): Column =
    graft.functions.AdcLutSum.column(
      org.apache.spark.sql.SparkSession.active, codevec, lutvec, nCodes)

  /** ADC top-k: score each query sub-vector against every codeword once
    * (the lookup table — |queries|·m·k rows, packed dense and
    * broadcast), then rank corpus vectors by the sum of their m table
    * entries, computed by the fused [[graft.functions.AdcLutSum]] loop
    * over the packed code vector — one narrow row per (query,
    * candidate), no m-row explosion, no aggregation shuffle. Ascending
    * distance, id tiebreaker; exact int64 end-to-end (the loop sums the
    * same integers the old (sub, code)-join + sum(qd) plan did).
    */
  def adcTopK(
      codes: DataFrame,
      cents: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      k: Int,
      nCodes: Int = DefaultCodes): DataFrame = {
    val lut = subvectors(queries, idCol, vecCol, dim, m)
      .withColumnRenamed(idCol, "qid")
      .join(broadcast(denseCents(cents, m, nCodes, dim / m)), Seq("sub"))
      .select(col("qid"), col("sub"), col("code"), dist2(col("svec"), col("centroid")).as("qd"))
    val scored = packCodes(codes, idCol)
      .select(col(idCol).as("bid"), col("codevec"))
      .crossJoin(broadcast(packLut(lut, Seq("qid"), m, nCodes)))
      .filter(col("qid") =!= col("bid"))
      .select(col("qid"), col("bid"), adcSum(col("codevec"), col("lutvec"), nCodes).as("adist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adist"), col("bid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("bid"), col("adist"))
      .orderBy(col("qid"), col("rank"))
  }

  /** IVF + PQ composed search — the 100 TB ANN tier: an IVF coarse
    * quantizer prunes the candidate set BEFORE ADC scoring, so
    * per-query scored candidates drop from the corpus (adcTopK's flat
    * scan — measured quadratic when |queries| ∝ corpus) to
    * nprobe × (corpus / numLists). Each query probes its `nprobe`
    * nearest inverted lists by centroid cosine (the e5/[[Ann.ivfTopK]]
    * probe stage, rank on the 6-dp-rounded score), then only vectors in
    * probed lists are ADC-scored from their m codes — exact int64, same
    * tie contract as [[adcTopK]] (adist, bid).
    *
    * Scale shape: centroids (numLists rows) and the per-query packed
    * LUT (|q| rows of m·k longs) broadcast; the probe map is narrow;
    * the candidate restriction is a broadcast join of the (qid, list)
    * probe table against the packed code stream, and scoring is the
    * fused [[graft.functions.AdcLutSum]] loop — one narrow row per
    * (query, candidate). The corpus-sized shuffles are the
    * [[packCodes]] group and the (id → list) attach — in a production
    * index, packed codes and list id are co-written at encode time and
    * both vanish.
    */
  def ivfAdcTopK(
      codes: DataFrame,
      cents: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      listCol: String,
      dim: Int,
      m: Int,
      k: Int,
      nprobe: Int,
      nCodes: Int = DefaultCodes): DataFrame =
    ivfAdcTopKPacked(
      packCodes(codes, idCol).join(corpus.select(col(idCol), col(listCol)), Seq(idCol)),
      cents, Ann.centroids(corpus, listCol, vecCol),
      queries, idCol, vecCol, listCol, dim, m, k, nprobe, nCodes)

  /** IVF+PQ search over a PREBUILT packed index — the serving shape:
    * `index` is (idCol, listCol, codevec) rows as a production encoder
    * co-writes them ([[graft.streaming.AnnIndexStream]] maintains such
    * an index incrementally), `listCents` the frozen coarse centroids
    * the index was assigned against. No per-query encode, no corpus
    * shuffle — the probe restriction and the packed LUT broadcast; the
    * index stream is the only corpus-sized input and it arrives
    * pre-packed.
    */
  def ivfAdcTopKPacked(
      index: DataFrame,
      cents: DataFrame,
      listCents: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      listCol: String,
      dim: Int,
      m: Int,
      k: Int,
      nprobe: Int,
      nCodes: Int = DefaultCodes): DataFrame = {
    val probeW = Window.partitionBy(col("qid"))
      .orderBy(col("ccos").desc, col(listCol))
    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(broadcast(listCents.select(col(listCol), col("centroid"))))
      .select(
        col("qid"), col(listCol),
        round(Ann.cosine(col("qv"), col("centroid")), 6).as("ccos"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col(listCol))
    val lut = subvectors(queries, idCol, vecCol, dim, m)
      .withColumnRenamed(idCol, "qid")
      .join(broadcast(denseCents(cents, m, nCodes, dim / m)), Seq("sub"))
      .select(col("qid"), col("sub"), col("code"), dist2(col("svec"), col("centroid")).as("qd"))
    val scored = index
      .join(broadcast(probes), Seq(listCol))
      .select(col("qid"), col(idCol).as("bid"), col("codevec"))
      .join(broadcast(packLut(lut, Seq("qid"), m, nCodes)), Seq("qid"))
      .filter(col("qid") =!= col("bid"))
      .select(col("qid"), col("bid"), adcSum(col("codevec"), col("lutvec"), nCodes).as("adist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adist"), col("bid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("bid"), col("adist"))
      .orderBy(col("qid"), col("rank"))
  }

  // ----- residual encoding (standard IVF-PQ: quantize v − coarse(v)) -----

  /** Residual-domain codeword offset: residuals span ±254 (int8 value
    * minus an int8-range coarse centroid), so the non-negative-numerator
    * division trick needs 254, not 127.
    */
  val ResOffset = 254L

  /** Residual-domain codeword scale. 10^5 instead of 10^6: residual
    * distances are summed over m=32 LUT entries per candidate, and at
    * 10^6 a worst-case all-±254 residual pair would overflow int64
    * (32 · 2 · (508·10^6)² ≈ 1.7·10^19 > 2^63); at 10^5 the same worst
    * case is 1.7·10^17 — safe with two orders of margin, while the
    * codeword resolution (10^5 units per int8 step) still dwarfs any
    * rounding effect on an argmin over integer inputs.
    */
  val ResScale = 100000L

  /** Integer coarse centroids in int8 units: per-list
    * `floor((Σ qv + 127·n) / n) − 127` — the non-negative floor-div
    * trick at scale 1, so residual = qv − centroid stays an exact small
    * integer in every engine.
    */
  def coarseIntCentroids(
      corpus: DataFrame,
      vecCol: String,
      listCol: String): DataFrame =
    Ann.quantize(corpus, vecCol, "__qv")
      .select(col(listCol), posexplode(col("__qv")).as(Seq("pos", "v")))
      .groupBy(col(listCol), col("pos"))
      .agg(expr("(SUM(v) + 127 * COUNT(*)) DIV COUNT(*) - 127").as("c"))
      .groupBy(col(listCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col(listCol), transform(col("pc"), x => x.getField("c")).as("cint"))

  /** Residual vectors rv = quantize(v) − coarseInt(list), int64 array
    * in [−254, 254]. A narrow broadcast-join map (the coarse table is
    * numLists rows).
    */
  def residuals(
      corpus: DataFrame,
      coarse: DataFrame,
      idCol: String,
      vecCol: String,
      listCol: String): DataFrame =
    Ann.quantize(corpus, vecCol, "__qv")
      .select(col(idCol), col(listCol), col("__qv"))
      .join(broadcast(coarse), Seq(listCol))
      .select(
        col(idCol), col(listCol),
        zip_with(col("__qv"), col("cint"), _ - _).as("rv"))

  /** Sample-bounded RESIDUAL PQ training — the canonical IVF-PQ recipe
    * (Jégou et al., §IV): quantize the residual v − coarse(v), not the
    * raw vector, so the codebook spends its 16 codes per subspace on
    * the within-list spread instead of re-describing the list means the
    * IVF stage already knows. Trains on a deterministic `sampleN`
    * sample of residuals, encodes the full corpus with the result.
    * Returns (codes, codebook, coarseInt).
    */
  def trainSampledResidual(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      listCol: String,
      dim: Int,
      m: Int,
      k: Int,
      iters: Int,
      sampleN: Int): (DataFrame, DataFrame, DataFrame) = {
    val coarse = coarseIntCentroids(corpus, vecCol, listCol)
    val res = residuals(corpus, coarse, idCol, vecCol, listCol)
    val (_, cents) = trainSv(
      subvectorsRaw(sampleDeterministic(res, idCol, sampleN), idCol, "rv", dim, m),
      idCol, k, iters, ResOffset, ResScale)
    val codes = encodeSv(subvectorsRaw(res, idCol, "rv", dim, m), cents, idCol, ResScale)
    (codes, cents, coarse)
  }

  /** IVF + residual-PQ search: same probe stage as [[ivfAdcTopK]], but
    * the LUT is PER (query, probed list) — the query's residual depends
    * on which list it is probing (q − c_list), so each (qid, list) pair
    * scores the m·k codewords once. LUT size |q|·nprobe·m·k — still a
    * broadcast. Candidate scoring joins the packed LUT on (qid, list),
    * so a candidate is scored against the residual LUT of ITS OWN list,
    * which is exactly the decomposition ‖q − x‖² ≈ ‖(q − c) −
    * PQ(x − c)‖² the residual trade relies on.
    */
  def ivfAdcResidualTopK(
      codes: DataFrame,
      cents: DataFrame,
      coarse: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      listCol: String,
      dim: Int,
      m: Int,
      k: Int,
      nprobe: Int,
      nCodes: Int = DefaultCodes): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val coarseD = Ann.centroids(corpus, listCol, vecCol)
    val probeW = Window.partitionBy(col("qid"))
      .orderBy(col("ccos").desc, col(listCol))
    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(broadcast(coarseD))
      .select(
        col("qid"), col(listCol),
        round(Ann.cosine(col("qv"), col("centroid")), 6).as("ccos"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col(listCol))
    val qres = Ann.quantize(queries, vecCol, "__qv")
      .select(col(idCol).as("qid"), col("__qv"))
      .join(probes, Seq("qid"))
      .join(broadcast(coarse), Seq(listCol))
      .select(
        col("qid"), col(listCol),
        zip_with(col("__qv"), col("cint"), _ - _).as("rqv"))
    val lut = qres
      .withColumn("sub", explode(sequence(lit(0), lit(m - 1))))
      .select(
        col("qid"), col(listCol), col("sub").cast("long").as("sub"),
        slice(col("rqv"), col("sub") * dsub + 1, lit(dsub)).as("svec"))
      .join(broadcast(denseCents(cents, m, nCodes, dsub)), Seq("sub"))
      .select(
        col("qid"), col(listCol), col("sub"), col("code"),
        dist2(col("svec"), col("centroid"), ResScale).as("qd"))
    val packed = packCodes(codes, idCol)
      .join(corpus.select(col(idCol), col(listCol)), Seq(idCol))
    val scored = packed
      .join(broadcast(probes), Seq(listCol))
      .select(col("qid"), col(listCol), col(idCol).as("bid"), col("codevec"))
      .join(broadcast(packLut(lut, Seq("qid", listCol), m, nCodes)), Seq("qid", listCol))
      .filter(col("qid") =!= col("bid"))
      .select(col("qid"), col("bid"), adcSum(col("codevec"), col("lutvec"), nCodes).as("adist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adist"), col("bid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("bid"), col("adist"))
      .orderBy(col("qid"), col("rank"))
  }
}

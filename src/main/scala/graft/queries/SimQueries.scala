package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Exprs._

/** Similarity-search + market-basket battery.
  *
  * Scale notes: brute-force top-k here is the *baseline* (query set ×
  * corpus broadcast-nested-loop); the 100 TB path is the label/LSH
  * bucketed variant (`e3_bucketed_knn`) where candidates are restricted
  * to matching buckets — same ranking contract, bounded candidate sets.
  * Ranking is done on the 6-dp-rounded cosine so FP summation order can
  * never flip a rank between engines.
  */
object SimQueries {

  private val knnOracle =
    """WITH q AS (
      |  SELECT vec_id AS qid,
      |         CAST(unnest(embedding) AS DOUBLE) AS v,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings WHERE vec_id < 10
      |),
      |b AS MATERIALIZED (
      |  SELECT vec_id AS bid,
      |         CAST(unnest(embedding) AS DOUBLE) AS v,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |),
      |dots AS (
      |  SELECT qid, bid,
      |         SUM(q.v * b.v) AS dot,
      |         SUM(q.v * q.v) AS qq,
      |         SUM(b.v * b.v) AS bb
      |  FROM q JOIN b ON q.i = b.i
      |  WHERE qid <> bid
      |  GROUP BY qid, bid
      |),
      |ranked AS (
      |  SELECT qid, bid,
      |         round(dot / (sqrt(qq) * sqrt(bb)), 6) AS cosine,
      |         ROW_NUMBER() OVER (PARTITION BY qid
      |                            ORDER BY round(dot / (sqrt(qq) * sqrt(bb)), 6) DESC, bid) AS rank
      |  FROM dots
      |)
      |SELECT qid, rank, bid, cosine FROM ranked WHERE rank <= 5
      |ORDER BY qid, rank""".stripMargin

  /** Brute-force cosine top-5 neighbours for a fixed query set. */
  val knnBrute = Query("e1_knn_cosine", knnOracle) { (spark, d) =>
    import spark.implicits._
    val emb = embeddings(spark, d)
    val q = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val b = emb.select($"vec_id".as("bid"), $"embedding".as("bv"))
    val scored = q.crossJoin(b)
      .filter($"qid" =!= $"bid")
      .select($"qid", $"bid", round(cosine($"qv", $"bv"), 6).as("cosine"))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"bid")
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"qid", $"rank".cast("long").as("rank"), $"bid", $"cosine")
      .orderBy($"qid", $"rank")
  }

  /** Per-label centroids via posexplode + grouped avg — the reduce step
    * of IVF coarse quantization (k-means assign would iterate this).
    */
  val labelCentroids = Query(
    "e2_label_centroids",
    """SELECT label, pos, round(AVG(v), 6) AS centroid
      |FROM (
      |  SELECT label,
      |         generate_subscripts(embedding, 1) - 1 AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |)
      |GROUP BY label, pos
      |ORDER BY label, pos""".stripMargin) { (spark, d) =>
    import spark.implicits._
    embeddings(spark, d)
      .select($"label", posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"label", $"pos".cast("long").as("pos"))
      .agg(round(avg($"v".cast("double")), 6).as("centroid"))
      .orderBy($"label", $"pos")
  }

  /** IVF-style bucketed ANN: candidates restricted to the query's label
    * bucket — the scale path for similarity search (bounded candidates
    * per query instead of the full corpus).
    */
  val bucketedKnn = Query(
    "e3_bucketed_knn",
    """WITH q AS (
      |  SELECT vec_id AS qid, label,
      |         CAST(unnest(embedding) AS DOUBLE) AS v,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings WHERE vec_id < 10
      |),
      |b AS MATERIALIZED (
      |  SELECT vec_id AS bid, label,
      |         CAST(unnest(embedding) AS DOUBLE) AS v,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |),
      |dots AS (
      |  SELECT qid, bid,
      |         SUM(q.v * b.v) AS dot,
      |         SUM(q.v * q.v) AS qq,
      |         SUM(b.v * b.v) AS bb
      |  FROM q JOIN b ON q.i = b.i AND q.label = b.label
      |  WHERE qid <> bid
      |  GROUP BY qid, bid
      |),
      |ranked AS (
      |  SELECT qid, bid,
      |         round(dot / (sqrt(qq) * sqrt(bb)), 6) AS cosine,
      |         ROW_NUMBER() OVER (PARTITION BY qid
      |                            ORDER BY round(dot / (sqrt(qq) * sqrt(bb)), 6) DESC, bid) AS rank
      |  FROM dots
      |)
      |SELECT qid, rank, bid, cosine FROM ranked WHERE rank <= 3
      |ORDER BY qid, rank""".stripMargin) { (spark, d) =>
    import spark.implicits._
    val emb = embeddings(spark, d)
    val q = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"label", $"embedding".as("qv"))
    val b = emb.select($"vec_id".as("bid"), $"label", $"embedding".as("bv"))
    val scored = q.join(b, Seq("label"))
      .filter($"qid" =!= $"bid")
      .select($"qid", $"bid", round(cosine($"qv", $"bv"), 6).as("cosine"))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"bid")
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"qid", $"rank".cast("long").as("rank"), $"bid", $"cosine")
      .orderBy($"qid", $"rank")
  }

  /** Full IVF multi-probe ANN: label-bucket centroids as the coarse
    * quantizer, each query probes its 2 nearest lists, top-3 within the
    * probed candidates. Same determinism contract as e1/e3 (rank on the
    * 6-dp-rounded cosine, id tiebreakers).
    */
  val ivfKnn = Query(
    "e5_ivf_knn",
    """WITH ev AS (
      |  SELECT vec_id, label,
      |         generate_subscripts(embedding, 1) AS i,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |),
      |cent AS (
      |  SELECT label, i, AVG(v) AS c FROM ev GROUP BY label, i
      |),
      |q AS (SELECT * FROM ev WHERE vec_id < 10),
      |qdots AS (
      |  SELECT q.vec_id AS qid, cent.label,
      |         SUM(q.v * cent.c) AS dot,
      |         SUM(q.v * q.v) AS qq,
      |         SUM(cent.c * cent.c) AS cc
      |  FROM q JOIN cent ON q.i = cent.i
      |  GROUP BY qid, cent.label
      |),
      |probes AS (
      |  SELECT qid, label FROM (
      |    SELECT qid, label,
      |           ROW_NUMBER() OVER (PARTITION BY qid
      |             ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC, label) AS pr
      |    FROM qdots)
      |  WHERE pr <= 2
      |),
      |bdots AS (
      |  SELECT p.qid, b.vec_id AS bid,
      |         SUM(qv.v * b.v) AS dot,
      |         SUM(qv.v * qv.v) AS qq,
      |         SUM(b.v * b.v) AS bb
      |  FROM probes p
      |  JOIN ev b ON b.label = p.label
      |  JOIN q qv ON qv.vec_id = p.qid AND qv.i = b.i
      |  WHERE b.vec_id <> p.qid
      |  GROUP BY p.qid, b.vec_id
      |),
      |ranked AS (
      |  SELECT qid, bid,
      |         round(dot / (sqrt(qq) * sqrt(bb)), 6) AS cosine,
      |         ROW_NUMBER() OVER (PARTITION BY qid
      |           ORDER BY round(dot / (sqrt(qq) * sqrt(bb)), 6) DESC, bid) AS rank
      |  FROM bdots
      |)
      |SELECT qid, rank, bid, cosine FROM ranked WHERE rank <= 3
      |ORDER BY qid, rank""".stripMargin) { (spark, d) =>
    import spark.implicits._
    val emb = embeddings(spark, d)
    graft.similarity.Ann
      .ivfTopK(
        corpus = emb.select($"vec_id", $"label", $"embedding"),
        queries = emb.filter($"vec_id" < 10),
        idCol = "vec_id", vecCol = "embedding", listCol = "label",
        k = 3, nprobe = 2)
      .orderBy($"qid", $"rank")
  }

  /** Int8-quantized bucketed ANN (the memory-bound scale variant):
    * per-vector symmetric quantization with floor(x·s + 0.5) — a
    * formula both engines evaluate identically — then exact integer
    * dot products and norms. The oracle recomputes the ENTIRE
    * quantized pipeline in SQL, so the hash verifies quantization,
    * integer accumulation, and re-normalized ranking end to end.
    */
  val quantizedKnn = Query(
    "e6_quantized_knn",
    """WITH base AS MATERIALIZED (
      |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      |  FROM embeddings
      |),
      |scaled AS MATERIALIZED (
      |  SELECT vec_id, label,
      |         127.0 / list_aggregate(list_transform(ve, y -> abs(y)), 'max') AS s, ve
      |  FROM base
      |),
      |q8 AS MATERIALIZED (
      |  SELECT vec_id, label,
      |         list_transform(ve, x -> CAST(floor(x * s + 0.5) AS BIGINT)) AS qv
      |  FROM scaled
      |),
      |f AS MATERIALIZED (
      |  SELECT vec_id, label, unnest(qv) AS v, generate_subscripts(qv, 1) AS i FROM q8
      |),
      |dots AS (
      |  SELECT a.vec_id AS qid, b.vec_id AS bid,
      |         SUM(a.v * b.v) AS dot, SUM(a.v * a.v) AS qq, SUM(b.v * b.v) AS bb
      |  FROM f a JOIN f b ON a.label = b.label AND a.i = b.i
      |  WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
      |  GROUP BY 1, 2
      |),
      |ranked AS (
      |  SELECT qid, bid,
      |         round(CAST(dot AS DOUBLE)
      |               / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(bb AS DOUBLE))), 6) AS cosine,
      |         ROW_NUMBER() OVER (PARTITION BY qid
      |           ORDER BY round(CAST(dot AS DOUBLE)
      |             / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(bb AS DOUBLE))), 6) DESC, bid) AS rank
      |  FROM dots
      |)
      |SELECT qid, rank, bid, cosine FROM ranked WHERE rank <= 3
      |ORDER BY qid, rank""".stripMargin) { (spark, d) =>
    import spark.implicits._
    val emb = embeddings(spark, d)
    graft.similarity.Ann
      .quantizedTopK(emb, emb.filter($"vec_id" < 10), "vec_id", "embedding", "label", 3)
      .orderBy($"qid", $"rank")
  }

  /** A11/A12/P15 — market basket: set-valued baskets (collect_set, the
    * reference's TransactionEncoder collapses duplicates —
    * `cumulative_report.py:140-142`) → FP-Growth → association rules
    * filtered on lift, mlxtend's output contract. Oracled by a
    * level-wise Apriori in SQL: frequent 1/2/3-itemsets via self-joins
    * on the distinct (basket, item) pairs, rules regenerated with
    * FP-Growth's exact arithmetic. Anti-monotonicity closes the level
    * bound: the level-3 CTE is computed (not assumed) empty, so no
    * larger itemset can be frequent. minSupport 0.02 sits just under
    * the brand-pair co-occurrence rate, so the gate verifies a real
    * rule set (215 frequent pairs → ~430 rules) instead of an empty
    * one.
    */
  val basketRules = Query(
    "b1_basket_rules",
    """WITH b AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS rid, p_brand AS item
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |),
      |n AS MATERIALIZED (SELECT COUNT(DISTINCT rid) AS n FROM b),
      |mc AS MATERIALIZED (SELECT CAST(CEIL(0.02 * n) AS BIGINT) AS mc FROM n),
      |f1 AS MATERIALIZED (
      |  SELECT item, COUNT(*) AS freq FROM b GROUP BY item
      |  HAVING COUNT(*) >= (SELECT mc FROM mc)
      |),
      |f2 AS MATERIALIZED (
      |  SELECT a.item AS i1, c.item AS i2, COUNT(*) AS freq
      |  FROM b a JOIN b c ON a.rid = c.rid AND a.item < c.item
      |  GROUP BY 1, 2 HAVING COUNT(*) >= (SELECT mc FROM mc)
      |),
      |f3 AS MATERIALIZED (
      |  SELECT a.item AS i1, c.item AS i2, e.item AS i3, COUNT(*) AS freq
      |  FROM b a
      |  JOIN b c ON a.rid = c.rid AND a.item < c.item
      |  JOIN b e ON a.rid = e.rid AND c.item < e.item
      |  GROUP BY 1, 2, 3 HAVING COUNT(*) >= (SELECT mc FROM mc)
      |),
      |allr AS (
      |  SELECT i1 AS antecedent, i2 AS consequent,
      |         f2.freq AS fx, fa.freq AS fa, fc.freq AS fc
      |  FROM f2 JOIN f1 fa ON fa.item = i1 JOIN f1 fc ON fc.item = i2
      |  UNION ALL
      |  SELECT i2, i1, f2.freq, fa.freq, fc.freq
      |  FROM f2 JOIN f1 fa ON fa.item = i2 JOIN f1 fc ON fc.item = i1
      |  UNION ALL
      |  SELECT t.i1 || ',' || t.i2, t.i3, t.freq, p.freq, c1.freq
      |  FROM f3 t JOIN f2 p ON p.i1 = t.i1 AND p.i2 = t.i2
      |            JOIN f1 c1 ON c1.item = t.i3
      |  UNION ALL
      |  SELECT t.i1 || ',' || t.i3, t.i2, t.freq, p.freq, c1.freq
      |  FROM f3 t JOIN f2 p ON p.i1 = t.i1 AND p.i2 = t.i3
      |            JOIN f1 c1 ON c1.item = t.i2
      |  UNION ALL
      |  SELECT t.i2 || ',' || t.i3, t.i1, t.freq, p.freq, c1.freq
      |  FROM f3 t JOIN f2 p ON p.i1 = t.i2 AND p.i2 = t.i3
      |            JOIN f1 c1 ON c1.item = t.i1
      |)
      |SELECT antecedent, consequent,
      |       round(CAST(fx AS DOUBLE) / (SELECT n FROM n), 6) AS support,
      |       round(CAST(fx AS DOUBLE) / fa, 6) AS confidence,
      |       round((CAST(fx AS DOUBLE) / fa)
      |             / (CAST(fc AS DOUBLE) / (SELECT n FROM n)), 6) AS lift
      |FROM allr
      |WHERE (CAST(fx AS DOUBLE) / fa)
      |      / (CAST(fc AS DOUBLE) / (SELECT n FROM n)) >= 0.5
      |ORDER BY lift DESC, antecedent, consequent""".stripMargin) { (spark, d) =>
    import spark.implicits._
    val baskets = lineitem(spark, d)
      .join(broadcast(part(spark, d)), $"l_partkey" === $"p_partkey")
      .groupBy($"l_orderkey")
      .agg(collect_set($"p_brand").as("items"))
      .cache() // FPGrowth.fit scans twice; don't re-shuffle per pass
    val fp = new org.apache.spark.ml.fpm.FPGrowth()
      .setItemsCol("items")
      .setMinSupport(0.02)
      .setMinConfidence(0.0)
    // NOTE: setNumPartitions(32) was measured 3× SLOWER here (36 s vs
    // 11.9 s median at sf1) — more partitions duplicate the conditional
    // FP-trees; the default (input partitioning) is right for this
    // shape.
    // fit materializes the itemsets into the model; drop the basket
    // cache so it doesn't accumulate across a full verify/bench run.
    val model = try fp.fit(baskets) finally baskets.unpersist()
    model.associationRules
      .filter($"lift" >= 0.5)
      .select(
        array_join(array_sort($"antecedent"), ",").as("antecedent"),
        array_join(array_sort($"consequent"), ",").as("consequent"),
        round($"support", 6).as("support"),
        round($"confidence", 6).as("confidence"),
        round($"lift", 6).as("lift"))
      .orderBy($"lift".desc, $"antecedent", $"consequent")
  }

  /** Full IVF build: 2 Lloyd iterations from the label init, centroids
    * 6-dp-quantized between rounds so both engines run bit-identical
    * iterations (the oracle replays centroid → score → argmax → repeat
    * in SQL). Completes the IVF story: e2 is one reduce step, e5 the
    * search path, e7 the build loop.
    */
  val ivfBuild = Query(
    "e7_ivf_build",
    """WITH flat AS MATERIALIZED (
      |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |),
      |a0 AS (SELECT vec_id, label AS list FROM embeddings),
      |c1 AS (
      |  SELECT a0.list, f.i, round(AVG(f.v), 6) AS c
      |  FROM flat f JOIN a0 ON f.vec_id = a0.vec_id
      |  GROUP BY 1, 2
      |),
      |s1 AS MATERIALIZED (
      |  SELECT f.vec_id, c.list,
      |         round(SUM(f.v * c.c) / (sqrt(SUM(f.v * f.v)) * sqrt(SUM(c.c * c.c))), 6) AS cos
      |  FROM flat f JOIN c1 c ON f.i = c.i
      |  GROUP BY 1, 2
      |),
      |a1 AS (
      |  SELECT vec_id, list FROM (
      |    SELECT vec_id, list,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, list) AS r
      |    FROM s1) WHERE r = 1
      |),
      |c2 AS (
      |  SELECT a1.list, f.i, round(AVG(f.v), 6) AS c
      |  FROM flat f JOIN a1 ON f.vec_id = a1.vec_id
      |  GROUP BY 1, 2
      |),
      |s2 AS MATERIALIZED (
      |  SELECT f.vec_id, c.list,
      |         round(SUM(f.v * c.c) / (sqrt(SUM(f.v * f.v)) * sqrt(SUM(c.c * c.c))), 6) AS cos
      |  FROM flat f JOIN c2 c ON f.i = c.i
      |  GROUP BY 1, 2
      |)
      |SELECT vec_id, CAST(list AS INT) AS list, cos AS cosine FROM (
      |  SELECT vec_id, list, cos,
      |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, list) AS r
      |  FROM s2) WHERE r = 1
      |ORDER BY vec_id""".stripMargin) { (spark, d) =>
    graft.similarity.Ann
      .kmeansIterate(embeddings(spark, d), "vec_id", "embedding", "label", 2)
      .orderBy(col("vec_id"))
  }

  /** DuckDB replay of [[graft.similarity.Pq]] training + ADC search, the
    * iteration chain generated from the same (dim, m, k, iters) the Spark
    * side runs: NTILE init over lexicographically-sorted sub-vectors,
    * then per Lloyd round a codebook CTE (integer micro-unit centroids,
    * +127·count offset so DuckDB `//` floor and Spark `DIV` truncation
    * agree), a full distance table, and an argmin reassignment. The last
    * round's distance table doubles as the ADC lookup table for the
    * query set, exactly as `Pq.adcTopK` reuses the final codebook.
    */
  /** The PQ training CTE chain (quantize → sub-vectors → NTILE init →
    * `iters` Lloyd rounds), shared by the e8 and e10 oracles. Ends with
    * a trailing comma after `assign$iters`; append search CTEs + the
    * final SELECT.
    */
  private def pqTrainCtes(dim: Int, m: Int, k: Int, iters: Int): String = {
    val dsub = dim / m
    val iterCtes = (1 to iters).map { i =>
      s"""cb$i AS MATERIALIZED (
         |  SELECT f.sub, a.code, f.pos,
         |         ((SUM(f.v) + 127 * COUNT(*)) * 1000000) // COUNT(*) - 127000000 AS c
         |  FROM f JOIN assign${i - 1} a ON f.vec_id = a.vec_id AND f.sub = a.sub
         |  GROUP BY 1, 2, 3
         |),
         |dists$i AS MATERIALIZED (
         |  SELECT f.vec_id, f.sub, cb$i.code,
         |         SUM((f.v * 1000000 - cb$i.c) * (f.v * 1000000 - cb$i.c)) AS dist
         |  FROM f JOIN cb$i ON f.sub = cb$i.sub AND f.pos = cb$i.pos
         |  GROUP BY 1, 2, 3
         |),
         |assign$i AS MATERIALIZED (
         |  SELECT vec_id, sub, code FROM (
         |    SELECT vec_id, sub, code,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS r
         |    FROM dists$i) WHERE r = 1
         |),""".stripMargin
    }.mkString("\n")
    s"""base AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
       |  FROM embeddings
       |),
       |scaled AS MATERIALIZED (
       |  SELECT vec_id,
       |         127.0 / list_aggregate(list_transform(ve, y -> abs(y)), 'max') AS s, ve
       |  FROM base
       |),
       |q8 AS MATERIALIZED (
       |  SELECT vec_id, list_transform(ve, x -> CAST(floor(x * s + 0.5) AS BIGINT)) AS qv
       |  FROM scaled
       |),
       |f AS MATERIALIZED (
       |  SELECT vec_id, CAST((i - 1) // $dsub AS BIGINT) AS sub, (i - 1) % $dsub AS pos, qv[i] AS v
       |  FROM q8, UNNEST(generate_series(1, $dim)) AS u(i)
       |),
       |sv AS MATERIALIZED (
       |  SELECT vec_id, CAST(s.sub AS BIGINT) AS sub,
       |         list_slice(qv, s.sub * $dsub + 1, s.sub * $dsub + $dsub) AS svec
       |  FROM q8, UNNEST(generate_series(0, ${m - 1})) AS s(sub)
       |),
       |assign0 AS MATERIALIZED (
       |  SELECT vec_id, sub,
       |         CAST(NTILE($k) OVER (PARTITION BY sub ORDER BY svec, vec_id) - 1 AS BIGINT) AS code
       |  FROM sv
       |),
       |$iterCtes""".stripMargin
  }

  private def pqOracleSql(dim: Int, m: Int, k: Int, iters: Int, qMod: Int, topK: Int): String = {
    s"""WITH ${pqTrainCtes(dim, m, k, iters)}
       |lut AS (
       |  SELECT vec_id AS qid, sub, code, dist AS qd FROM dists$iters WHERE vec_id % $qMod = 0
       |),
       |adc AS (
       |  SELECT lut.qid, a.vec_id AS bid, CAST(SUM(lut.qd) AS BIGINT) AS adist
       |  FROM assign$iters a JOIN lut ON a.sub = lut.sub AND a.code = lut.code
       |  WHERE lut.qid <> a.vec_id
       |  GROUP BY 1, 2
       |)
       |SELECT qid, rank, bid, adist FROM (
       |  SELECT qid, bid, adist,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, bid) AS rank
       |  FROM adc) WHERE rank <= $topK
       |ORDER BY qid, rank""".stripMargin
  }

  /** Battery-shared PQ codebook (the posify pattern, applied to the one
    * other artifact several gates re-derive identically): e8/e9/e10 all
    * train the SAME (dim=64, m=32, k=16, iters=4) codebook, and e11 its
    * sampled sibling — a production index trains once and serves every
    * query after. The memo holds the COLLECTED codebook (m·k = 512 tiny
    * rows — never the corpus-sized codes), keyed by (sfDir, params);
    * each gate rebuilds a LocalRelation from it and re-derives its codes
    * with [[graft.similarity.Pq.encode]] — a narrow broadcast-join map
    * that assigns exactly what the final Lloyd round assigned (same
    * argmin, same tie-break; PqSpec pins the equivalence), so gate
    * results are bit-identical to per-gate retraining and every oracle
    * still replays full training from scratch. Plain driver memory: it
    * survives (and is untouched by) Bench's inter-pass cache sweeps, and
    * holds no RDD/checkpoint references that a sweep could invalidate.
    */
  private val pqMemo = scala.collection.concurrent.TrieMap[
    (String, Int, Int, Int, Int, Int),
    (org.apache.spark.sql.types.StructType, Seq[org.apache.spark.sql.Row])]()

  private def sharedCents(
      spark: org.apache.spark.sql.SparkSession, d: String,
      dim: Int, m: Int, k: Int, iters: Int, sampleN: Int): org.apache.spark.sql.DataFrame = {
    // Content-digested key (see TextQueries.sharedSpans): regenerating
    // the corpus in place must invalidate the memoized codebook.
    val dKey = s"$d|${graft.operators.Bucketing.suffix(spark, d)}"
    val (schema, rows) = pqMemo.getOrElseUpdate((dKey, dim, m, k, iters, sampleN), {
      val emb = embeddings(spark, d)
      val src =
        if (sampleN < 0) emb
        else graft.similarity.Pq.sampleDeterministic(emb, "vec_id", sampleN)
      val cents = graft.similarity.Pq.train(src, "vec_id", "embedding", dim, m, k, iters)._2
      (cents.schema, cents.collect().toSeq)
    })
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  /** e8 — product quantization end-to-end: int8 vectors split into 32
    * sub-vectors of 2 dims, four Lloyd rounds over NTILE-initialized
    * 16-code per-subspace codebooks (integer micro-unit centroids), then
    * ADC top-5 — score each query against the 512 codewords once, score
    * every candidate by summing its 32 table entries. Storage per
    * vector: 32 codes instead of 256 bytes — the memory tier below e6's
    * int8 — and this config measures 76–89% top-1-in-top-5 recall on
    * the 200-query panel across all three test scales (e9 pins the
    * quality bar; this gate pins cross-engine exactness). Exact int64 arithmetic end-to-end (no
    * float sums anywhere), so codebooks, codes, and ranks are
    * bit-identical in any engine.
    */
  val pqTopK = Query("e8_pq_topk",
    pqOracleSql(dim = 64, m = 32, k = 16, iters = 4, qMod = 100, topK = 5)) { (spark, d) =>
    import spark.implicits._
    val emb = embeddings(spark, d)
    val cents = sharedCents(spark, d, dim = 64, m = 32, k = 16, iters = 4, sampleN = -1)
    val codes = graft.similarity.Pq.encode(emb, cents, "vec_id", "embedding", dim = 64, m = 32)
    graft.similarity.Pq
      .adcTopK(codes, cents, emb.filter($"vec_id" % 100 === 0),
        "vec_id", "embedding", dim = 64, m = 32, k = 5)
      .orderBy($"qid", $"rank")
  }

  /** e9 — PQ retrieval QUALITY, not just determinism (the gap e8 leaves:
    * its oracle replays the same algorithm, so a garbage codebook would
    * still hash-match). Here Spark measures recall@5 — how many of the
    * 200-query panel have their EXACT integer-L2 top-1 inside the ADC
    * top-5 — and emits a bound flag; the oracle asserts the constant 1
    * (the r6/r7 sketch pattern). Panel widened 20→200 in round 9 (±2σ
    * on the bar tightens from ±22% to ±7%); RecallProbe measures the
    * full-train flat-ADC config at 152–178/200 across the three scales
    * (the 152 is sf0.1, where 2000 corpus vectors stretch the 512-code
    * budget hardest), so the ≥ 140/200 bar (the old 14/20 fraction)
    * holds with a ≥ 12-hit measured margin. The exact baseline is the
    * same int8 quantized-L2 the e1/e6 gates oracle independently.
    */
  val pqRecall = Query(
    "e9_pq_recall",
    "SELECT CAST(200 AS BIGINT) AS n_queries, CAST(1 AS BIGINT) AS meets_recall_bar") {
    (spark, d) =>
      import spark.implicits._
      val emb = embeddings(spark, d)
      val q = emb.filter($"vec_id" < 200)
      val exactTop1 = exactTop1Panel(spark, d, 200)
      val nq = exactTop1.count()
      val cents = sharedCents(spark, d, dim = 64, m = 32, k = 16, iters = 4, sampleN = -1)
      val codes = graft.similarity.Pq
        .encode(emb, cents, "vec_id", "embedding", dim = 64, m = 32)
      val adc5 = graft.similarity.Pq
        .adcTopK(codes, cents, q, "vec_id", "embedding", dim = 64, m = 32, k = 5)
        .select($"qid", $"bid")
      val h = exactTop1.join(adc5, Seq("qid", "bid"), "left_semi").count()
      spark.range(1).select(
        lit(nq).as("n_queries"),
        when(lit(h) >= 140, 1L).otherwise(0L).as("meets_recall_bar"))
  }

  /** DuckDB replay of [[graft.similarity.Pq.ivfAdcTopK]]: the e8
    * training chain ([[pqTrainCtes]]) plus the e5 probe stage (label
    * centroids → each query's `nprobe` nearest lists by rounded
    * cosine), with ADC restricted to vectors in probed lists.
    */
  private def ivfPqOracleSql(
      dim: Int, m: Int, k: Int, iters: Int, qMod: Int, topK: Int, nprobe: Int): String = {
    s"""WITH ${pqTrainCtes(dim, m, k, iters)}
       |ev AS MATERIALIZED (
       |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |),
       |cent AS (SELECT label, i, AVG(v) AS c FROM ev GROUP BY label, i),
       |qf AS (SELECT * FROM ev WHERE vec_id % $qMod = 0),
       |qdots AS (
       |  SELECT qf.vec_id AS qid, cent.label,
       |         SUM(qf.v * cent.c) AS dot,
       |         SUM(qf.v * qf.v) AS qq,
       |         SUM(cent.c * cent.c) AS cc
       |  FROM qf JOIN cent ON qf.i = cent.i
       |  GROUP BY 1, 2
       |),
       |probes AS (
       |  SELECT qid, label FROM (
       |    SELECT qid, label,
       |           ROW_NUMBER() OVER (PARTITION BY qid
       |             ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC, label) AS pr
       |    FROM qdots)
       |  WHERE pr <= $nprobe
       |),
       |lut AS (
       |  SELECT vec_id AS qid, sub, code, dist AS qd FROM dists$iters WHERE vec_id % $qMod = 0
       |),
       |lists AS (SELECT vec_id, label FROM embeddings),
       |adc AS (
       |  SELECT p.qid, a.vec_id AS bid, CAST(SUM(lut.qd) AS BIGINT) AS adist
       |  FROM probes p
       |  JOIN lists l ON l.label = p.label
       |  JOIN assign$iters a ON a.vec_id = l.vec_id
       |  JOIN lut ON lut.qid = p.qid AND lut.sub = a.sub AND lut.code = a.code
       |  WHERE a.vec_id <> p.qid
       |  GROUP BY 1, 2
       |)
       |SELECT qid, rank, bid, adist FROM (
       |  SELECT qid, bid, adist,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, bid) AS rank
       |  FROM adc) WHERE rank <= $topK
       |ORDER BY qid, rank""".stripMargin
  }

  /** e10 — the IVF + PQ COMPOSED tier: e5's coarse-quantizer pruning in
    * front of e8's ADC scoring, the tier that kills e8's measured
    * quadratic query-side curve (flat ADC scores every corpus vector per
    * query; here candidates are nprobe/numLists of the corpus). Same
    * training chain as e8 (so the two gates share one oracle mechanism)
    * and the e5 probe contract; exact int64 ADC with (adist, bid)
    * tie-break. See [[graft.similarity.Pq.ivfAdcTopK]] for the scale
    * shape.
    */
  val ivfPq = Query("e10_ivf_pq",
    ivfPqOracleSql(dim = 64, m = 32, k = 16, iters = 4, qMod = 100, topK = 5, nprobe = 2)) {
    (spark, d) =>
      import spark.implicits._
      val emb = embeddings(spark, d)
      val cents = sharedCents(spark, d, dim = 64, m = 32, k = 16, iters = 4, sampleN = -1)
      val codes = graft.similarity.Pq
        .encode(emb, cents, "vec_id", "embedding", dim = 64, m = 32)
      graft.similarity.Pq
        .ivfAdcTopK(codes, cents,
          corpus = emb.select($"vec_id", $"label", $"embedding"),
          queries = emb.filter($"vec_id" % 100 === 0),
          "vec_id", "embedding", "label", dim = 64, m = 32, k = 5, nprobe = 2)
        .orderBy($"qid", $"rank")
  }

  /** e11 — SAMPLED-train PQ retrieval quality (the e9 pattern applied to
    * [[graft.similarity.Pq.trainSampled]]): the codebook is fit on a
    * 200-vector deterministic sample, the full corpus is encoded with
    * it, and recall@5 against the exact int8-L2 top-1 must clear the
    * bar. This pins the 100 TB training path — bounded-sample fit plus
    * narrow-map encode — to a measured quality floor, not just a
    * determinism check. 200-query panel (round 9); RecallProbe measures
    * 152–172/200 across the scales, so the ≥ 120/200 bar (the old
    * 12/20 fraction) holds with a ≥ 32-hit margin — and sits within 26
    * hits of e9's full-train codebook, which is the sampling claim.
    */
  val pqSampledRecall = Query(
    "e11_pq_sampled_recall",
    "SELECT CAST(200 AS BIGINT) AS n_queries, CAST(1 AS BIGINT) AS meets_recall_bar") {
    (spark, d) =>
      import spark.implicits._
      val emb = embeddings(spark, d)
      val q = emb.filter($"vec_id" < 200)
      val exactTop1 = exactTop1Panel(spark, d, 200)
      val nq = exactTop1.count()
      val cents = sharedCents(spark, d, dim = 64, m = 32, k = 16, iters = 4, sampleN = 200)
      val codes = graft.similarity.Pq
        .encode(emb, cents, "vec_id", "embedding", dim = 64, m = 32)
      val adc5 = graft.similarity.Pq
        .adcTopK(codes, cents, q, "vec_id", "embedding", dim = 64, m = 32, k = 5)
        .select($"qid", $"bid")
      val h = exactTop1.join(adc5, Seq("qid", "bid"), "left_semi").count()
      spark.range(1).select(
        lit(nq).as("n_queries"),
        when(lit(h) >= 120, 1L).otherwise(0L).as("meets_recall_bar"))
  }

  /** e12 — the composed 100 TB ANN config's RETRIEVAL QUALITY: sampled
    * codebook (e11's 200-vector fit, shared via the memo) + IVF-pruned
    * ADC (e10's composition), recall@5 vs the exact int8-L2 top-1 at
    * two probe widths, on the 200-query panel (round 9). Pins the
    * textbook IVF trade with measured margins (RecallProbe, all three
    * scales): nprobe=2 prunes to ~20% of the corpus and recalls only
    * 49–60/200 — the dataset's coarse lists are label clusters, not
    * geometric ones, so aggressive pruning loses true neighbors —
    * while nprobe=8 recovers 139–154/200. The gate asserts BOTH the
    * nprobe=8 floor (≥ 120/200, the old 12/20 fraction, ≥ 19-hit
    * measured margin) and the recovery property (probe-8 hits strictly
    * above probe-2 hits, measured margins ≥ 83), so a regression in
    * either the probe ranking or the ADC tables trips it. e10 pins the pruned computation's exactness;
    * this pins what the pruning costs and that widening probes buys it
    * back — the two numbers a 100 TB operator actually tunes.
    */
  val ivfPqRecall = Query(
    "e12_ivf_pq_recall",
    """SELECT CAST(200 AS BIGINT) AS n_queries,
      |       CAST(1 AS BIGINT) AS meets_bar_probe8,
      |       CAST(1 AS BIGINT) AS probe_recovery""".stripMargin) {
    (spark, d) =>
      import spark.implicits._
      val emb = embeddings(spark, d)
      val exactTop1 = exactTop1Panel(spark, d, 200)
      val nq = exactTop1.count()
      val cents = sharedCents(spark, d, dim = 64, m = 32, k = 16, iters = 4, sampleN = 200)
      // Both probe widths re-read the encoded corpus — one
      // materialization instead of two narrow-encode replays.
      val codes = graft.similarity.Pq
        .encode(emb, cents, "vec_id", "embedding", dim = 64, m = 32)
        .cache()
      def hitsAt(nprobe: Int) = {
        val top5 = graft.similarity.Pq
          .ivfAdcTopK(codes, cents,
            corpus = emb.select($"vec_id", $"label", $"embedding"),
            queries = emb.filter($"vec_id" < 200),
            "vec_id", "embedding", "label", dim = 64, m = 32, k = 5, nprobe = nprobe)
          .select($"qid", $"bid")
        exactTop1.join(top5, Seq("qid", "bid"), "left_semi")
          .agg(count(lit(1)))
      }
      // materialize the shared code cache once, then run the two
      // independent probe widths as concurrent jobs (guide §2.6)
      codes.count()
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val h2F = Future(hitsAt(2).as[Long].head())
      val h8F = Future(hitsAt(8).as[Long].head())
      val h2 = Await.result(h2F, 10.minutes)
      val h8 = Await.result(h8F, 10.minutes)
      codes.unpersist()
      spark.range(1).select(
        lit(nq).as("n_queries"),
        when(lit(h8) >= 120, 1L).otherwise(0L).as("meets_bar_probe8"),
        when(lit(h8) > lit(h2), 1L).otherwise(0L).as("probe_recovery"))
  }

  /** The unsupervised coarse-quantizer init: a 3-bit sign hash on the
    * first three embedding dims (axis-aligned random-projection LSH) —
    * content-derived, label-free, bit-exact in any engine (the sign of
    * a stored float never drifts). Seeds [[graft.similarity.Ann.kmeansIterate]]
    * with 8 geometry-aware lists.
    */
  private val signInitSql =
    """(CASE WHEN embedding[1] >= 0 THEN 4 ELSE 0 END
      | + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
      | + CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END)""".stripMargin

  /** DuckDB replay of [[graft.similarity.Ann.kmeansIterate]] from an
    * arbitrary init expression — the e7 chain with the init
    * parametrized. Emits `flat` (per-dim doubles) and ends with
    * `klists AS (vec_id, list)`, trailing comma included.
    */
  private def kmeansCtes(kmIters: Int, initSql: String): String = {
    val iterCtes = (1 to kmIters).map { it =>
      s"""kc$it AS (
         |  SELECT a.list, f.i, round(AVG(f.v), 6) AS c
         |  FROM flat f JOIN ka${it - 1} a ON f.vec_id = a.vec_id
         |  GROUP BY 1, 2
         |),
         |ks$it AS MATERIALIZED (
         |  SELECT f.vec_id, c.list,
         |         round(SUM(f.v * c.c) / (sqrt(SUM(f.v * f.v)) * sqrt(SUM(c.c * c.c))), 6) AS cos
         |  FROM flat f JOIN kc$it c ON f.i = c.i
         |  GROUP BY 1, 2
         |),
         |ka$it AS (
         |  SELECT vec_id, list FROM (
         |    SELECT vec_id, list,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, list) AS r
         |    FROM ks$it) WHERE r = 1
         |),""".stripMargin
    }.mkString("\n")
    s"""flat AS MATERIALIZED (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |),
       |ka0 AS (SELECT vec_id, $initSql AS list FROM embeddings),
       |$iterCtes
       |klists AS MATERIALIZED (SELECT vec_id, list FROM ka$kmIters),""".stripMargin
  }

  /** DuckDB replay of [[graft.similarity.Pq.trainSampled]]: the e8
    * training chain restricted to the deterministic md5-ranked sample,
    * then a full-corpus encode against the final codebook (the split
    * the full-train oracle never needs — there dists/assign of the last
    * round ARE the encode). Ends with `encd` (per-(vec,sub,code) dists,
    * the LUT source) and `enca` (argmin codes), trailing comma included.
    */
  private def pqSampledCtes(dim: Int, m: Int, k: Int, iters: Int, sampleN: Int): String = {
    val dsub = dim / m
    val iterCtes = (1 to iters).map { i =>
      s"""cb$i AS MATERIALIZED (
         |  SELECT f.sub, a.code, f.pos,
         |         ((SUM(f.v) + 127 * COUNT(*)) * 1000000) // COUNT(*) - 127000000 AS c
         |  FROM fS f JOIN assign${i - 1} a ON f.vec_id = a.vec_id AND f.sub = a.sub
         |  GROUP BY 1, 2, 3
         |),
         |dists$i AS MATERIALIZED (
         |  SELECT f.vec_id, f.sub, cb$i.code,
         |         SUM((f.v * 1000000 - cb$i.c) * (f.v * 1000000 - cb$i.c)) AS dist
         |  FROM fS f JOIN cb$i ON f.sub = cb$i.sub AND f.pos = cb$i.pos
         |  GROUP BY 1, 2, 3
         |),
         |assign$i AS MATERIALIZED (
         |  SELECT vec_id, sub, code FROM (
         |    SELECT vec_id, sub, code,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS r
         |    FROM dists$i) WHERE r = 1
         |),""".stripMargin
    }.mkString("\n")
    s"""base AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
       |  FROM embeddings
       |),
       |scaled AS MATERIALIZED (
       |  SELECT vec_id,
       |         127.0 / list_aggregate(list_transform(ve, y -> abs(y)), 'max') AS s, ve
       |  FROM base
       |),
       |q8 AS MATERIALIZED (
       |  SELECT vec_id, list_transform(ve, x -> CAST(floor(x * s + 0.5) AS BIGINT)) AS qv
       |  FROM scaled
       |),
       |f AS MATERIALIZED (
       |  SELECT vec_id, CAST((i - 1) // $dsub AS BIGINT) AS sub, (i - 1) % $dsub AS pos, qv[i] AS v
       |  FROM q8, UNNEST(generate_series(1, $dim)) AS u(i)
       |),
       |samp AS MATERIALIZED (
       |  SELECT vec_id FROM embeddings
       |  ORDER BY md5('pqs:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $sampleN
       |),
       |fS AS MATERIALIZED (SELECT f.* FROM f JOIN samp USING (vec_id)),
       |svS AS MATERIALIZED (
       |  SELECT q8.vec_id, CAST(s.sub AS BIGINT) AS sub,
       |         list_slice(qv, s.sub * $dsub + 1, s.sub * $dsub + $dsub) AS svec
       |  FROM q8 JOIN samp USING (vec_id), UNNEST(generate_series(0, ${m - 1})) AS s(sub)
       |),
       |assign0 AS MATERIALIZED (
       |  SELECT vec_id, sub,
       |         CAST(NTILE($k) OVER (PARTITION BY sub ORDER BY svec, vec_id) - 1 AS BIGINT) AS code
       |  FROM svS
       |),
       |$iterCtes
       |encd AS MATERIALIZED (
       |  SELECT f.vec_id, f.sub, cb$iters.code,
       |         SUM((f.v * 1000000 - cb$iters.c) * (f.v * 1000000 - cb$iters.c)) AS dist
       |  FROM f JOIN cb$iters ON f.sub = cb$iters.sub AND f.pos = cb$iters.pos
       |  GROUP BY 1, 2, 3
       |),
       |enca AS MATERIALIZED (
       |  SELECT vec_id, sub, code FROM (
       |    SELECT vec_id, sub, code,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS r
       |    FROM encd) WHERE r = 1
       |),""".stripMargin
  }

  /** DuckDB replay of the packed serving index
    * ([[graft.streaming.AnnIndexStream.packBatch]]): sampled-train
    * codebook → full-corpus encode (`enca`), nearest-label-centroid
    * assignment by 6-dp rounded cosine (the e5 probe arithmetic applied
    * to every corpus vector), codes packed sub-major into one
    * comma-joined string per vector.
    */
  private def packedIndexOracleSql(
      dim: Int, m: Int, k: Int, iters: Int, sampleN: Int,
      liveWhere: String = ""): String =
    s"""WITH ${pqSampledCtes(dim, m, k, iters, sampleN)}
       |ev AS MATERIALIZED (
       |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |),
       |cent AS (SELECT label, i, AVG(v) AS c FROM ev GROUP BY label, i),
       |vdots AS MATERIALIZED (
       |  SELECT e.vec_id, c.label,
       |         SUM(e.v * c.c) AS dot, SUM(e.v * e.v) AS vv, SUM(c.c * c.c) AS cc
       |  FROM ev e JOIN cent c ON e.i = c.i
       |  GROUP BY 1, 2
       |),
       |vassign AS (
       |  SELECT vec_id, label FROM (
       |    SELECT vec_id, label,
       |           ROW_NUMBER() OVER (
       |             PARTITION BY vec_id
       |             ORDER BY round(dot / (sqrt(vv) * sqrt(cc)), 6) DESC, label) AS r
       |    FROM vdots) WHERE r = 1
       |)
       |SELECT a.vec_id, v.label,
       |       string_agg(CAST(a.code AS VARCHAR), ',' ORDER BY a.sub) AS codevec
       |FROM enca a JOIN vassign v USING (vec_id)
       |$liveWhere
       |GROUP BY 1, 2
       |ORDER BY a.vec_id""".stripMargin

  /** e17 — the packed SERVING INDEX, hash-oracled: exactly the
    * `(vec_id, list, codevec)` layout [[graft.streaming.AnnIndexStream]]
    * maintains incrementally and [[graft.similarity.Pq.ivfAdcTopKPacked]]
    * serves from — sampled codebook (e11's fit, shared via the memo),
    * narrow full-corpus encode, nearest-frozen-centroid list
    * assignment. The codevec hash pins every packed code of every
    * vector (not just the top-k survivors the search gates see), and
    * the assignment column pins [[graft.similarity.Ann.assign]] against
    * an independent SQL replay. `AnnIndexStreamSpec` separately proves
    * stream ≡ batch for the same layout, so together the incremental
    * index is oracle-grade end-to-end.
    */
  val packedIndex = Query(
    "e17_packed_index",
    packedIndexOracleSql(dim = 64, m = 32, k = 16, iters = 4, sampleN = 200)) {
    (spark, d) =>
      import spark.implicits._
      val emb = embeddings(spark, d)
      val cents = sharedCents(spark, d, dim = 64, m = 32, k = 16, iters = 4, sampleN = 200)
      val listCents = graft.similarity.Ann
        .centroids(emb.select($"label", $"embedding"), "label", "embedding")
      graft.streaming.AnnIndexStream
        .packBatch(emb.select($"vec_id", $"embedding"), cents, listCents, "label", 64, 32)
        .select($"vec_id", $"label", concat_ws(",", $"codevec").as("codevec"))
        .orderBy($"vec_id")
  }

  /** e18 — the packed index LIFECYCLE, hash-oracled: three generations
    * of index events — full upsert (batch 0), delete every `vec_id % 7
    * == 3` (batch 1, tombstones), re-upsert half of the deleted set
    * (`vec_id % 14 == 3`, batch 2) — pushed through the REAL lifecycle
    * code path ([[graft.streaming.AnnIndexStream.packEventBatch]] per
    * generation, [[graft.streaming.AnnIndexStream.resolve]]'s
    * latest-generation-wins merge), then the post-delete packed layout
    * is pinned byte-for-byte. The re-upsert leg is the sharp edge: a
    * resolution that treats "ever deleted" as dead (instead of
    * latest-wins) drops the % 14 vectors and hash-mismatches; a
    * resolution that ignores tombstones keeps the % 7 vectors and
    * mismatches the other way. The oracle replays e17's packed-index
    * SQL restricted to the live set — sound because the codebook is
    * frozen, so a re-upserted vector's codes are bit-identical to its
    * first encode (the determinism e17 itself pins).
    * `AnnIndexLifecycleSpec` separately proves stream ≡ batch for the
    * same generations plus list-local compaction
    * ([[graft.streaming.AnnIndexStream.compact]]) and that served
    * top-k never returns a deleted vector.
    */
  val indexLifecycle = Query(
    "e18_index_lifecycle",
    packedIndexOracleSql(dim = 64, m = 32, k = 16, iters = 4, sampleN = 200,
      liveWhere = "WHERE vec_id % 7 <> 3 OR vec_id % 14 = 3")) {
    (spark, d) =>
      import spark.implicits._
      val emb = embeddings(spark, d)
      val cents = sharedCents(spark, d, dim = 64, m = 32, k = 16, iters = 4, sampleN = 200)
      val listCents = graft.similarity.Ann
        .centroids(emb.select($"label", $"embedding"), "label", "embedding")
      def gen(events: org.apache.spark.sql.DataFrame, batch: Long) =
        graft.streaming.AnnIndexStream
          .packEventBatch(events, cents, listCents, "label", 64, 32)
          .withColumn("batch", lit(batch))
      val g0 = gen(emb.select($"vec_id", $"embedding", lit("u").as("op")), 0L)
      val g1 = gen(
        emb.filter($"vec_id" % 7 === 3)
          .select($"vec_id", $"embedding", lit("d").as("op")), 1L)
      val g2 = gen(
        emb.filter($"vec_id" % 14 === 3)
          .select($"vec_id", $"embedding", lit("u").as("op")), 2L)
      graft.streaming.AnnIndexStream
        .resolve(g0.unionByName(g1).unionByName(g2), "label")
        .select($"vec_id", $"label", concat_ws(",", $"codevec").as("codevec"))
        .orderBy($"vec_id")
  }

  /** The fully-unsupervised composed oracle: learned k-means lists
    * (sign-hash init — no labels), sampled-train codebook, IVF probe
    * over the LEARNED list centroids, ADC restricted to probed lists.
    */
  private def unsupIvfPqOracleSql(
      dim: Int, m: Int, k: Int, iters: Int, sampleN: Int,
      kmIters: Int, qLt: Int, topK: Int, nprobe: Int): String = {
    s"""WITH ${kmeansCtes(kmIters, signInitSql)}
       |${pqSampledCtes(dim, m, k, iters, sampleN)}
       |cent AS (
       |  SELECT kl.list, f.i, AVG(f.v) AS c
       |  FROM flat f JOIN klists kl ON f.vec_id = kl.vec_id
       |  GROUP BY 1, 2
       |),
       |qf AS (SELECT * FROM flat WHERE vec_id < $qLt),
       |qdots AS (
       |  SELECT qf.vec_id AS qid, cent.list,
       |         SUM(qf.v * cent.c) AS dot,
       |         SUM(qf.v * qf.v) AS qq,
       |         SUM(cent.c * cent.c) AS cc
       |  FROM qf JOIN cent ON qf.i = cent.i
       |  GROUP BY 1, 2
       |),
       |probes AS (
       |  SELECT qid, list FROM (
       |    SELECT qid, list,
       |           ROW_NUMBER() OVER (PARTITION BY qid
       |             ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC, list) AS pr
       |    FROM qdots)
       |  WHERE pr <= $nprobe
       |),
       |lut AS (
       |  SELECT vec_id AS qid, sub, code, dist AS qd FROM encd WHERE vec_id < $qLt
       |),
       |adc AS (
       |  SELECT p.qid, a.vec_id AS bid, CAST(SUM(lut.qd) AS BIGINT) AS adist
       |  FROM probes p
       |  JOIN klists l ON l.list = p.list
       |  JOIN enca a ON a.vec_id = l.vec_id
       |  JOIN lut ON lut.qid = p.qid AND lut.sub = a.sub AND lut.code = a.code
       |  WHERE a.vec_id <> p.qid
       |  GROUP BY 1, 2
       |)
       |SELECT qid, rank, bid, adist FROM (
       |  SELECT qid, bid, adist,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, bid) AS rank
       |  FROM adc) WHERE rank <= $topK
       |ORDER BY qid, rank""".stripMargin
  }

  /** DuckDB replay of the RESIDUAL IVF-PQ chain
    * ([[graft.similarity.Pq.trainSampledResidual]] +
    * [[graft.similarity.Pq.ivfAdcResidualTopK]] over label lists):
    * int8 quantize → per-list integer coarse centroid (floor-div,
    * +127·n) → residual per dim → sampled residual training (offset
    * 254, scale 10^5) → full-corpus residual encode → raw-double
    * centroid probe → per-(query, probed-list) residual LUT → ADC.
    */
  private def residualIvfPqOracleSql(
      dim: Int, m: Int, k: Int, iters: Int, sampleN: Int,
      qMod: Int, topK: Int, nprobe: Int): String = {
    val dsub = dim / m
    val iterCtes = (1 to iters).map { i =>
      s"""cb$i AS MATERIALIZED (
         |  SELECT f.sub, a.code, f.pos,
         |         ((SUM(f.v) + 254 * COUNT(*)) * 100000) // COUNT(*) - 25400000 AS c
         |  FROM fS f JOIN assign${i - 1} a ON f.vec_id = a.vec_id AND f.sub = a.sub
         |  GROUP BY 1, 2, 3
         |),
         |dists$i AS MATERIALIZED (
         |  SELECT f.vec_id, f.sub, cb$i.code,
         |         SUM((f.v * 100000 - cb$i.c) * (f.v * 100000 - cb$i.c)) AS dist
         |  FROM fS f JOIN cb$i ON f.sub = cb$i.sub AND f.pos = cb$i.pos
         |  GROUP BY 1, 2, 3
         |),
         |assign$i AS MATERIALIZED (
         |  SELECT vec_id, sub, code FROM (
         |    SELECT vec_id, sub, code,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS r
         |    FROM dists$i) WHERE r = 1
         |),""".stripMargin
    }.mkString("\n")
    s"""WITH base AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
       |  FROM embeddings
       |),
       |scaled AS MATERIALIZED (
       |  SELECT vec_id,
       |         127.0 / list_aggregate(list_transform(ve, y -> abs(y)), 'max') AS s, ve
       |  FROM base
       |),
       |q8 AS MATERIALIZED (
       |  SELECT vec_id, list_transform(ve, x -> CAST(floor(x * s + 0.5) AS BIGINT)) AS qv
       |  FROM scaled
       |),
       |fall AS MATERIALIZED (
       |  SELECT q8.vec_id, e.label, u.i, qv[i] AS v
       |  FROM q8 JOIN embeddings e USING (vec_id),
       |       UNNEST(generate_series(1, $dim)) AS u(i)
       |),
       |cc AS MATERIALIZED (
       |  SELECT label, i, (SUM(v) + 127 * COUNT(*)) // COUNT(*) - 127 AS c
       |  FROM fall GROUP BY 1, 2
       |),
       |fr AS MATERIALIZED (
       |  SELECT f.vec_id, f.label, f.i, f.v - cc.c AS v
       |  FROM fall f JOIN cc ON f.label = cc.label AND f.i = cc.i
       |),
       |f AS MATERIALIZED (
       |  SELECT vec_id, CAST((i - 1) // $dsub AS BIGINT) AS sub, (i - 1) % $dsub AS pos, v
       |  FROM fr
       |),
       |samp AS MATERIALIZED (
       |  SELECT vec_id FROM embeddings
       |  ORDER BY md5('pqs:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $sampleN
       |),
       |fS AS MATERIALIZED (SELECT f.* FROM f JOIN samp USING (vec_id)),
       |rvv AS MATERIALIZED (
       |  SELECT vec_id, array_agg(v ORDER BY i) AS rv FROM fr GROUP BY vec_id
       |),
       |svS AS MATERIALIZED (
       |  SELECT rvv.vec_id, CAST(s.sub AS BIGINT) AS sub,
       |         list_slice(rv, s.sub * $dsub + 1, s.sub * $dsub + $dsub) AS svec
       |  FROM rvv JOIN samp USING (vec_id), UNNEST(generate_series(0, ${m - 1})) AS s(sub)
       |),
       |assign0 AS MATERIALIZED (
       |  SELECT vec_id, sub,
       |         CAST(NTILE($k) OVER (PARTITION BY sub ORDER BY svec, vec_id) - 1 AS BIGINT) AS code
       |  FROM svS
       |),
       |$iterCtes
       |encd AS MATERIALIZED (
       |  SELECT f.vec_id, f.sub, cb$iters.code,
       |         SUM((f.v * 100000 - cb$iters.c) * (f.v * 100000 - cb$iters.c)) AS dist
       |  FROM f JOIN cb$iters ON f.sub = cb$iters.sub AND f.pos = cb$iters.pos
       |  GROUP BY 1, 2, 3
       |),
       |enca AS MATERIALIZED (
       |  SELECT vec_id, sub, code FROM (
       |    SELECT vec_id, sub, code,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS r
       |    FROM encd) WHERE r = 1
       |),
       |ev AS MATERIALIZED (
       |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings
       |),
       |cent AS (SELECT label, i, AVG(v) AS c FROM ev GROUP BY label, i),
       |qf AS (SELECT * FROM ev WHERE vec_id % $qMod = 0),
       |qdots AS (
       |  SELECT qf.vec_id AS qid, cent.label,
       |         SUM(qf.v * cent.c) AS dot,
       |         SUM(qf.v * qf.v) AS qq,
       |         SUM(cent.c * cent.c) AS cc
       |  FROM qf JOIN cent ON qf.i = cent.i
       |  GROUP BY 1, 2
       |),
       |probes AS (
       |  SELECT qid, label FROM (
       |    SELECT qid, label,
       |           ROW_NUMBER() OVER (PARTITION BY qid
       |             ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC, label) AS pr
       |    FROM qdots)
       |  WHERE pr <= $nprobe
       |),
       |qr AS MATERIALIZED (
       |  SELECT q.vec_id AS qid, p.label, q.i, q.v - cc.c AS v
       |  FROM fall q
       |  JOIN probes p ON p.qid = q.vec_id
       |  JOIN cc ON cc.label = p.label AND cc.i = q.i
       |),
       |lut AS MATERIALIZED (
       |  SELECT s.qid, s.label, s.sub, cb$iters.code,
       |         SUM((s.v * 100000 - cb$iters.c) * (s.v * 100000 - cb$iters.c)) AS qd
       |  FROM (SELECT qid, label, CAST((i - 1) // $dsub AS BIGINT) AS sub,
       |               (i - 1) % $dsub AS pos, v FROM qr) s
       |  JOIN cb$iters ON s.sub = cb$iters.sub AND s.pos = cb$iters.pos
       |  GROUP BY 1, 2, 3, 4
       |),
       |lists AS (SELECT vec_id, label FROM embeddings),
       |adc AS (
       |  SELECT p.qid, a.vec_id AS bid, CAST(SUM(lut.qd) AS BIGINT) AS adist
       |  FROM probes p
       |  JOIN lists l ON l.label = p.label
       |  JOIN enca a ON a.vec_id = l.vec_id
       |  JOIN lut ON lut.qid = p.qid AND lut.label = p.label
       |           AND lut.sub = a.sub AND lut.code = a.code
       |  WHERE a.vec_id <> p.qid
       |  GROUP BY 1, 2
       |)
       |SELECT qid, rank, bid, adist FROM (
       |  SELECT qid, bid, adist,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, bid) AS rank
       |  FROM adc) WHERE rank <= $topK
       |ORDER BY qid, rank""".stripMargin
  }

  /** The Spark side of the sign-hash init (1-based element_at, exactly
    * [[signInitSql]]).
    */
  private def signInitCol: org.apache.spark.sql.Column =
    when(element_at(col("embedding"), 1) >= 0, 4).otherwise(0) +
      when(element_at(col("embedding"), 2) >= 0, 2).otherwise(0) +
      when(element_at(col("embedding"), 3) >= 0, 1).otherwise(0)

  /** Battery-shared unsupervised IVF lists (the [[pqMemo]] pattern,
    * distributed variant): e13 and e14 derive the SAME learned lists —
    * sign-hash init, 2 engine-exact Lloyd rounds over the full corpus —
    * so the k-means build runs once per (corpus, rounds) and both gates
    * (and e14's two probe widths) re-read the (vec_id, list) assignment
    * from a temp-parquet memo. Unlike [[pqMemo]] (m·k codebook rows —
    * driver-bounded by construction) this relation is CORPUS-SIZED, so
    * it must never ride through the driver: the build writes it once as
    * parquet and every consumer scans it distributed. A temp file, not
    * `.cache()`/`localCheckpoint`, because Bench's inter-pass sweep
    * unpersists every RDD on the context — a checkpoint-backed memo
    * would be invalidated (lineage severed) mid-battery. Every oracle
    * still replays the full k-means chain in SQL.
    */
  private val listsMemo = scala.collection.concurrent.TrieMap[(String, Int), String]()

  private def sharedUnsupLists(
      spark: org.apache.spark.sql.SparkSession, d: String, kmIters: Int)
      : org.apache.spark.sql.DataFrame = {
    val dKey = s"$d|${graft.operators.Bucketing.suffix(spark, d)}"
    val path = listsMemo.getOrElseUpdate((dKey, kmIters), {
      val emb = embeddings(spark, d)
      val lists = graft.similarity.Ann
        .kmeansIterate(
          emb.withColumn("ibkt", signInitCol), "vec_id", "embedding", "ibkt", kmIters)
        .select(col("vec_id"), col("list"))
      val dir = graft.TempDirs.create("graft-unsup-lists-").toFile
      lists.write.mode("overwrite").parquet(dir.getAbsolutePath)
      dir.getAbsolutePath
    })
    spark.read.parquet(path)
  }

  /** Exact int8-L2 top-1 neighbour for the `panel` lowest vec_ids — the
    * shared ground truth of every recall gate (e9/e11/e12/e14/e16). The
    * pair distance is the native codegen'd [[graft.functions.SqDistLong]]
    * loop (bit-identical to the HOF fold it replaced — integer
    * arithmetic, `SqDistLongSpec` pins the equivalence; the interpreted
    * fold was the bench's heaviest expression once the panels widened to
    * 200). Battery-shared via the [[pqMemo]] pattern: five gates
    * (e9/e11/e12/e14/e16) need the SAME panel, and the memo holds only
    * `panel` (qid, bid) rows — driver-bounded by construction, unlike
    * the corpus-sized [[sharedUnsupLists]]. (Earlier rounds instead
    * `.cache()`d the frame here; plan-identical calls silently shared
    * the cache entry across gates, which was fast but leaked — Verify
    * has no inter-gate clearCache, so panels and their shuffle files
    * accumulated across all ~120 gates. The round-10 leak fix without
    * this memo re-computed the quadratic exact GT once per gate,
    * measured +1 to +2.6 s on each of the five recall gates.)
    */
  private val panelMemo = scala.collection.concurrent.TrieMap[
    (String, Int),
    (org.apache.spark.sql.types.StructType, Seq[org.apache.spark.sql.Row])]()

  private def exactTop1Panel(
      spark: org.apache.spark.sql.SparkSession, d: String, panel: Int)
      : org.apache.spark.sql.DataFrame = {
    val dKey = s"$d|${graft.operators.Bucketing.suffix(spark, d)}"
    val (schema, rows) = panelMemo.getOrElseUpdate((dKey, panel), {
      val qv = graft.similarity.Ann
        .quantize(embeddings(spark, d), "embedding", "qv")
        .select(col("vec_id"), col("qv"))
      // panel × corpus SqDist evaluations ride the corpus side's scan
      // task — spread it (no-op at real scale).
      val qvB = graft.operators.Scans.spreadSmall(qv, col("vec_id"))
      val w = Window.partitionBy(col("qid")).orderBy(col("d2"), col("bid"))
      val df = qv.as("a")
        .join(qvB.as("b"), col("a.vec_id") =!= col("b.vec_id"))
        .where(col("a.vec_id") < panel)
        .select(
          col("a.vec_id").as("qid"), col("b.vec_id").as("bid"),
          graft.functions.Exprs.sqDistLong(col("a.qv"), col("b.qv")).as("d2"))
        .withColumn("r", row_number().over(w)).filter(col("r") === 1)
        .select(col("qid"), col("bid"))
      (df.schema, df.collect().toSeq)
    })
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  /** e13 — the UNSUPERVISED composed tier: closes round 6's one `weak`.
    * e10/e12 prove IVF+PQ with *label* coarse lists, but 100 TB of web
    * text has no labels — here the lists are LEARNED: sign-hash LSH
    * init (8 lists) → 2 engine-exact Lloyd rounds
    * ([[graft.similarity.Ann.kmeansIterate]], the e7 build loop), the
    * codebook is e11's 200-vector sampled fit, and retrieval is
    * [[graft.similarity.Pq.ivfAdcTopK]] probing the learned-list
    * centroids. No `label` column anywhere in the path. Hash-oracled:
    * DuckDB replays init → k-means → sampled train → full encode →
    * probe → ADC end-to-end (this is also the first gate to hash-verify
    * the trainSampled chain itself — e11 only pins its recall). Scale
    * shape identical to e10 (broadcast centroids/LUT/probes, narrow
    * encode); the k-means build cost is e7's, amortized across every
    * query after — and battery-shared with e14 via
    * [[sharedUnsupLists]]. The query panel is the FIXED 200 lowest
    * vec_ids (e14's panel — dense from 0 at every scale): the earlier
    * `vec_id % 100` panel grew with the corpus, making the gate's eval
    * N·(N/L) — 12× wall at ×10 corpora (PLANS.md round-10 stress) on
    * what should be a linear-in-N gate.
    */
  val unsupIvfPq = Query("e13_ivf_pq_unsup",
    unsupIvfPqOracleSql(dim = 64, m = 32, k = 16, iters = 4, sampleN = 200,
      kmIters = 2, qLt = 200, topK = 5, nprobe = 2)) { (spark, d) =>
    import spark.implicits._
    val emb = embeddings(spark, d)
    val lists = sharedUnsupLists(spark, d, kmIters = 2)
    val corpus = emb.join(lists.select($"vec_id", $"list"), Seq("vec_id"))
      .select($"vec_id", $"list", $"embedding")
    val cents = sharedCents(spark, d, dim = 64, m = 32, k = 16, iters = 4, sampleN = 200)
    val codes = graft.similarity.Pq
      .encode(emb, cents, "vec_id", "embedding", dim = 64, m = 32)
    graft.similarity.Pq
      .ivfAdcTopK(codes, cents, corpus,
        queries = emb.filter($"vec_id" < 200),
        "vec_id", "embedding", "list", dim = 64, m = 32, k = 5, nprobe = 2)
      .orderBy($"qid", $"rank")
  }

  /** e14 — the unsupervised tier's RETRIEVAL QUALITY (e12's pattern
    * with e13's learned lists): sign-hash init → 2 Lloyd rounds → 8
    * geometric lists, sampled codebook, recall@5 vs the exact int8-L2
    * top-1 at two probe widths. The panel is the 200 lowest vec_ids
    * (dense from 0 at every scale, so the panel is deterministic and
    * scale-stable) — widened from 20 in round 9 so the recall floor is
    * statistically meaningful: at 55% true recall the ±2σ band on 200
    * draws is ±7%, vs ±22% on 20. RecallProbe-measured on the 200-wide
    * panel (all three scales): nprobe=1 recalls 48–62/200 (an eighth
    * of the corpus), nprobe=6 recovers 144–164/200 (72–82%) — matching
    * the LABEL-list curve at equal prune fraction, which is the
    * load-bearing fact: the lists a 100 TB unlabeled corpus can
    * actually build lose nothing vs the ground-truth lists e12
    * measures. Gate pins the nprobe=6 floor (≥ 110/200, the same 55%
    * bar the old ≥ 11/20 set, now with ≥ 34-hit measured margin) and
    * strict probe recovery (nprobe=6 hits above nprobe=1's, measured
    * margins ≥ 90).
    */
  val unsupRecall = Query(
    "e14_unsup_recall",
    """SELECT CAST(200 AS BIGINT) AS n_queries,
      |       CAST(1 AS BIGINT) AS meets_bar_probe6,
      |       CAST(1 AS BIGINT) AS probe_recovery""".stripMargin) {
    (spark, d) =>
      import spark.implicits._
      val emb = embeddings(spark, d)
      val exactTop1 = exactTop1Panel(spark, d, 200)
      val nq = exactTop1.count()
      val lists = sharedUnsupLists(spark, d, kmIters = 2)
      val corpus = emb.join(lists.select($"vec_id", $"list"), Seq("vec_id"))
        .select($"vec_id", $"list", $"embedding")
        // two probe widths re-read the learned lists (memoized rows,
        // but the join itself is worth one materialization)
        .cache()
      val cents = sharedCents(spark, d, dim = 64, m = 32, k = 16, iters = 4, sampleN = 200)
      val codes = graft.similarity.Pq
        .encode(emb, cents, "vec_id", "embedding", dim = 64, m = 32)
        .cache()
      def hitsAt(nprobe: Int) = {
        val top5 = graft.similarity.Pq
          .ivfAdcTopK(codes, cents, corpus,
            queries = emb.filter($"vec_id" < 200),
            "vec_id", "embedding", "list", dim = 64, m = 32, k = 5, nprobe = nprobe)
          .select($"qid", $"bid")
        exactTop1.join(top5, Seq("qid", "bid"), "left_semi")
          .agg(count(lit(1)))
      }
      // materialize the shared caches once, then run the two
      // independent probe widths as concurrent jobs (guide §2.6)
      corpus.count(); codes.count()
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val h1F = Future(hitsAt(1).as[Long].head())
      val h6F = Future(hitsAt(6).as[Long].head())
      val h1 = Await.result(h1F, 10.minutes)
      val h6 = Await.result(h6F, 10.minutes)
      corpus.unpersist(); codes.unpersist()
      spark.range(1).select(
        lit(nq).as("n_queries"),
        when(lit(h6) >= 110, 1L).otherwise(0L).as("meets_bar_probe6"),
        when(lit(h6) > lit(h1), 1L).otherwise(0L).as("probe_recovery"))
  }

  /** Battery-shared residual codebook + integer coarse centroids (the
    * pqMemo pattern): e15 and e16 train the same residual codebook;
    * the memo holds the collected (sub, code, centroid) rows plus the
    * numLists coarse rows. Codes are re-derived per gate with the
    * narrow [[graft.similarity.Pq.encodeSv]] map (bit-identical to the
    * final Lloyd assignment), and every oracle replays full training.
    */
  private val resMemo = scala.collection.concurrent.TrieMap[
    (String, Int, Int, Int, Int, Int),
    ((org.apache.spark.sql.types.StructType, Seq[org.apache.spark.sql.Row]),
     (org.apache.spark.sql.types.StructType, Seq[org.apache.spark.sql.Row]))]()

  private def sharedResidual(
      spark: org.apache.spark.sql.SparkSession, d: String,
      dim: Int, m: Int, k: Int, iters: Int, sampleN: Int)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val dKey = s"$d|${graft.operators.Bucketing.suffix(spark, d)}"
    val ((cs, cr), (ks, kr)) = resMemo.getOrElseUpdate((dKey, dim, m, k, iters, sampleN), {
      val emb = embeddings(spark, d)
      val corpus = emb.select($"vec_id", $"label", $"embedding")
      val (_, cents, coarse) = graft.similarity.Pq.trainSampledResidual(
        corpus, "vec_id", "embedding", "label", dim, m, k, iters, sampleN)
      ((cents.schema, cents.collect().toSeq), (coarse.schema, coarse.collect().toSeq))
    })
    import scala.jdk.CollectionConverters._
    (spark.createDataFrame(cr.asJava, cs), spark.createDataFrame(kr.asJava, ks))
  }

  /** e15 — RESIDUAL product quantization, the canonical IVF-PQ recipe
    * (encode v − coarse(v), not v): the codebook spends its 16 codes
    * per subspace on within-list spread instead of re-describing list
    * means the IVF stage already knows, which is the textbook fix for
    * e12's recall plateau. Integer-exact end-to-end: int8 quantize,
    * floor-div integer coarse centroids (offset 127), residual
    * codewords at offset 254 / scale 10^5 (overflow-safe: worst-case
    * ADC sum ~10^17), per-(query, probed-list) LUT because the query's
    * residual depends on the list being probed. Hash-oracled: DuckDB
    * replays the full chain. RecallProbe measures the payoff at sf0.1
    * (the one test scale with meaningful list populations): recall@5
    * 11→13 (nprobe=4), 12→15 (6), 14→18 (8), 15→20 (10) vs the flat
    * codebook — the ≥2-hit gain residual encoding exists to buy.
    */
  val residualIvfPq = Query("e15_pq_residual",
    residualIvfPqOracleSql(dim = 64, m = 32, k = 16, iters = 4, sampleN = 200,
      qMod = 100, topK = 5, nprobe = 2)) { (spark, d) =>
    import spark.implicits._
    val emb = embeddings(spark, d)
    val corpus = emb.select($"vec_id", $"label", $"embedding")
    val (cents, coarse) = sharedResidual(spark, d, dim = 64, m = 32, k = 16,
      iters = 4, sampleN = 200)
    val res = graft.similarity.Pq.residuals(corpus, coarse, "vec_id", "embedding", "label")
    val codes = graft.similarity.Pq.encodeSv(
      graft.similarity.Pq.subvectorsRaw(res, "vec_id", "rv", dim = 64, m = 32),
      cents, "vec_id", graft.similarity.Pq.ResScale)
    graft.similarity.Pq
      .ivfAdcResidualTopK(codes, cents, coarse, corpus,
        queries = emb.filter($"vec_id" % 100 === 0),
        "vec_id", "embedding", "label", dim = 64, m = 32, k = 5, nprobe = 2)
      .orderBy($"qid", $"rank")
  }

  /** e16 — residual tier retrieval quality vs the flat tier, same
    * sampled-train budget, same probe stage, at equal nprobe, on the
    * 200-query panel (round 9): pins (a) the residual nprobe=8 floor
    * (≥ 120/200, the old 12/20 fraction; measured 153/154/144 across
    * scales — ≥ 24-hit margin), (b) strict probe recovery (nprobe=8
    * over nprobe=2; measured margins 94–102), and (c) NON-REGRESSION
    * vs the flat codebook at nprobe=8 (res + 1 ≥ flat; measured
    * 153/149, 154/154, 144/139 — near-parity at the two tiny scales
    * where 500-vector lists leave little residual structure, +5 at
    * sf0.1). The IMPROVEMENT at sf0.1 is pinned by PqResidualSpec,
    * which runs at that scale explicitly — a correctness gate must
    * hold at every scale the driver runs, and at sf0.001/0.01 the
    * honest claim is parity, not improvement.
    */
  val residualRecall = Query(
    "e16_residual_recall",
    """SELECT CAST(200 AS BIGINT) AS n_queries,
      |       CAST(1 AS BIGINT) AS meets_bar_probe8,
      |       CAST(1 AS BIGINT) AS probe_recovery,
      |       CAST(1 AS BIGINT) AS no_flat_regression""".stripMargin) {
    (spark, d) =>
      import spark.implicits._
      val emb = embeddings(spark, d)
      val corpus = emb.select($"vec_id", $"label", $"embedding")
      val exactTop1 = exactTop1Panel(spark, d, 200)
      val nq = exactTop1.count()
      val panelQ = emb.filter($"vec_id" < 200)
      val (rcents, coarse) = sharedResidual(spark, d, dim = 64, m = 32, k = 16,
        iters = 4, sampleN = 200)
      val res = graft.similarity.Pq.residuals(corpus, coarse, "vec_id", "embedding", "label")
      // Two residual probe widths re-read the encoded residual corpus —
      // one materialization instead of two encode replays.
      val rcodes = graft.similarity.Pq.encodeSv(
        graft.similarity.Pq.subvectorsRaw(res, "vec_id", "rv", dim = 64, m = 32),
        rcents, "vec_id", graft.similarity.Pq.ResScale)
        .cache()
      def residualHits(nprobe: Int) =
        exactTop1.join(
          graft.similarity.Pq
            .ivfAdcResidualTopK(rcodes, rcents, coarse, corpus, panelQ,
              "vec_id", "embedding", "label", dim = 64, m = 32, k = 5, nprobe = nprobe)
            .select($"qid", $"bid"),
          Seq("qid", "bid"), "left_semi")
          .agg(count(lit(1))).as[Long].head()
      val fcents = sharedCents(spark, d, dim = 64, m = 32, k = 16, iters = 4, sampleN = 200)
      val fcodes = graft.similarity.Pq
        .encode(emb, fcents, "vec_id", "embedding", dim = 64, m = 32)
      // The three recall legs (flat nprobe-8, residual nprobe-2/8) are
      // independent read-only evaluations — run them as concurrent
      // Spark jobs (guide §2.6: back-fill the tail) instead of three
      // serialized actions; each leg's own plan is unchanged.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val flat8F = Future {
        exactTop1.join(
          graft.similarity.Pq
            .ivfAdcTopK(fcodes, fcents, corpus, panelQ,
              "vec_id", "embedding", "label", dim = 64, m = 32, k = 5, nprobe = 8)
            .select($"qid", $"bid"),
          Seq("qid", "bid"), "left_semi")
          .agg(count(lit(1))).as[Long].head()
      }
      // materialize the shared residual-code cache once before the two
      // legs race to fill it
      rcodes.count()
      val r2F = Future(residualHits(2))
      val r8F = Future(residualHits(8))
      val flat8 = Await.result(flat8F, 10.minutes)
      val r2 = Await.result(r2F, 10.minutes)
      val r8 = Await.result(r8F, 10.minutes)
      rcodes.unpersist()
      spark.range(1).select(
        lit(nq).as("n_queries"),
        when(lit(r8) >= 120, 1L).otherwise(0L).as("meets_bar_probe8"),
        when(lit(r8) > lit(r2), 1L).otherwise(0L).as("probe_recovery"),
        when(lit(r8) + 1L >= lit(flat8), 1L).otherwise(0L).as("no_flat_regression"))
  }

  /** e19 — k-NN GRAPH construction over the WHOLE corpus: e5's IVF
    * search with queries = corpus, plus the mutual-edge flag. The
    * neighbour graph is what clustering, SemDeDup-style pruning and
    * label propagation consume; building it is the canonical
    * "all-pairs but never quadratic" workload — per-vector candidates
    * are bounded by the probed lists (nprobe · corpus/numLists), and
    * the mutual check is one self-join of the N·k edge list. The
    * oracle replays centroids → probes → candidate ranking → the
    * reverse-edge join in SQL, so the hash pins every edge, rank,
    * 6-dp cosine and mutuality bit.
    */
  val knnGraphGate = Query(
    "e19_knn_graph",
    """WITH ev AS MATERIALIZED (
      |  SELECT vec_id, label,
      |         generate_subscripts(embedding, 1) AS i,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |),
      |cent AS (
      |  SELECT label, i, AVG(v) AS c FROM ev GROUP BY label, i
      |),
      |qdots AS (
      |  SELECT ev.vec_id AS qid, cent.label,
      |         SUM(ev.v * cent.c) AS dot,
      |         SUM(ev.v * ev.v) AS qq,
      |         SUM(cent.c * cent.c) AS cc
      |  FROM ev JOIN cent ON ev.i = cent.i
      |  GROUP BY qid, cent.label
      |),
      |probes AS (
      |  SELECT qid, label FROM (
      |    SELECT qid, label,
      |           ROW_NUMBER() OVER (PARTITION BY qid
      |             ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC, label) AS pr
      |    FROM qdots)
      |  WHERE pr <= 2
      |),
      |bdots AS (
      |  SELECT p.qid, b.vec_id AS bid,
      |         SUM(qv.v * b.v) AS dot,
      |         SUM(qv.v * qv.v) AS qq,
      |         SUM(b.v * b.v) AS bb
      |  FROM probes p
      |  JOIN ev b ON b.label = p.label
      |  JOIN ev qv ON qv.vec_id = p.qid AND qv.i = b.i
      |  WHERE b.vec_id <> p.qid
      |  GROUP BY p.qid, b.vec_id
      |),
      |edges AS MATERIALIZED (
      |  SELECT qid, bid, cosine, rank FROM (
      |    SELECT qid, bid,
      |           round(dot / (sqrt(qq) * sqrt(bb)), 6) AS cosine,
      |           ROW_NUMBER() OVER (PARTITION BY qid
      |             ORDER BY round(dot / (sqrt(qq) * sqrt(bb)), 6) DESC, bid) AS rank
      |    FROM bdots)
      |  WHERE rank <= 3
      |)
      |SELECT e.qid, CAST(e.rank AS BIGINT) AS rank, e.bid, e.cosine,
      |       CAST(CASE WHEN r.qid IS NULL THEN 0 ELSE 1 END AS BIGINT) AS mutual
      |FROM edges e
      |LEFT JOIN edges r ON r.qid = e.bid AND r.bid = e.qid
      |ORDER BY e.qid, e.rank""".stripMargin) { (spark, d) =>
    import spark.implicits._
    graft.similarity.Ann
      .knnGraph(
        embeddings(spark, d).select($"vec_id", $"label", $"embedding"),
        "vec_id", "embedding", "label", k = 3, nprobe = 2)
      .orderBy($"qid", $"rank")
  }

  /** e19b — the k-NN graph over LEARNED lists: e19's exact chain with
    * the coarse lists swapped from the `label` column to the
    * unsupervised k-means build (sign-hash init + 2 Lloyd rounds —
    * e13's no-label recipe, the [[sharedUnsupLists]] memo). Round-10's
    * `KnnGraphProbe` measured learned lists at ≈2× the recall of label
    * lists for equal probe cost; this gate pins that documented
    * composition instead of leaving it probe-only. The oracle replays
    * k-means → probes → candidate ranking → the reverse-edge join, so
    * the hash pins every edge, rank, 6-dp cosine and mutuality bit of
    * the production (unsupervised) graph build.
    */
  val knnGraphLearnedGate = Query(
    "e19b_knn_graph_learned", {
      s"""WITH ${kmeansCtes(2, signInitSql)}
         |ev AS MATERIALIZED (
         |  SELECT f.vec_id, kl.list AS label, f.i, f.v
         |  FROM flat f JOIN klists kl USING (vec_id)
         |),
         |cent AS (
         |  SELECT label, i, AVG(v) AS c FROM ev GROUP BY label, i
         |),
         |qdots AS (
         |  SELECT ev.vec_id AS qid, cent.label,
         |         SUM(ev.v * cent.c) AS dot,
         |         SUM(ev.v * ev.v) AS qq,
         |         SUM(cent.c * cent.c) AS cc
         |  FROM ev JOIN cent ON ev.i = cent.i
         |  GROUP BY qid, cent.label
         |),
         |probes AS (
         |  SELECT qid, label FROM (
         |    SELECT qid, label,
         |           ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC, label) AS pr
         |    FROM qdots)
         |  WHERE pr <= 2
         |),
         |bdots AS (
         |  SELECT p.qid, b.vec_id AS bid,
         |         SUM(qv.v * b.v) AS dot,
         |         SUM(qv.v * qv.v) AS qq,
         |         SUM(b.v * b.v) AS bb
         |  FROM probes p
         |  JOIN ev b ON b.label = p.label
         |  JOIN ev qv ON qv.vec_id = p.qid AND qv.i = b.i
         |  WHERE b.vec_id <> p.qid
         |  GROUP BY p.qid, b.vec_id
         |),
         |edges AS MATERIALIZED (
         |  SELECT qid, bid, cosine, rank FROM (
         |    SELECT qid, bid,
         |           round(dot / (sqrt(qq) * sqrt(bb)), 6) AS cosine,
         |           ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY round(dot / (sqrt(qq) * sqrt(bb)), 6) DESC, bid) AS rank
         |    FROM bdots)
         |  WHERE rank <= 3
         |)
         |SELECT e.qid, CAST(e.rank AS BIGINT) AS rank, e.bid, e.cosine,
         |       CAST(CASE WHEN r.qid IS NULL THEN 0 ELSE 1 END AS BIGINT) AS mutual
         |FROM edges e
         |LEFT JOIN edges r ON r.qid = e.bid AND r.bid = e.qid
         |ORDER BY e.qid, e.rank""".stripMargin
    }) { (spark, d) =>
    import spark.implicits._
    val inp = embeddings(spark, d).select($"vec_id", $"embedding")
      .join(sharedUnsupLists(spark, d, kmIters = 2), "vec_id")
    graft.similarity.Ann
      .knnGraph(inp, "vec_id", "embedding", "list", k = 3, nprobe = 2)
      .orderBy($"qid", $"rank")
  }

  /** DuckDB replay of [[graft.similarity.Rebalance.splitLists]] over an
    * assignment CTE `asnCte(vec_id, list)`: lists over 21/20 of the
    * mean population, seed A = min id, seed B = farthest-by-6-dp-cosine
    * (id tiebreak), two Lloyd rounds over 6-dp sub-centroids, 6-dp
    * determinism discipline throughout. All internal CTEs are `rb_`-
    * prefixed so the chain composes with [[kmeansCtes]] /
    * [[pqSampledCtes]]; emits `rb_stats(n_total, n_lists)` and ends
    * with `rb_final AS (vec_id, list)` — the post-rebalance assignment
    * — trailing comma included. (The degenerate id-parity fallback for
    * all-identical lists is not replayed: real embedding corpora never
    * produce a 6-dp-cosine-identical over-full list, and the fallback
    * is spec-pinned in `RebalanceSpec` instead.)
    */
  private def rebalanceCtes(asnCte: String): String =
    s"""rb_stats AS (
       |  SELECT COUNT(*) AS n_total, COUNT(DISTINCT list) AS n_lists FROM $asnCte
       |),
       |rb_sizes AS (SELECT list, COUNT(*) AS n FROM $asnCte GROUP BY 1),
       |rb_split AS MATERIALIZED (
       |  SELECT s.list FROM rb_sizes s, rb_stats
       |  WHERE s.n > (21 * n_total) // (20 * n_lists)
       |),
       |rb_flat AS MATERIALIZED (
       |  SELECT a.list, e.vec_id,
       |         generate_subscripts(embedding, 1) AS i,
       |         CAST(unnest(embedding) AS DOUBLE) AS v
       |  FROM embeddings e
       |  JOIN $asnCte a USING (vec_id)
       |  JOIN rb_split s ON a.list = s.list
       |),
       |rb_seed_a AS (
       |  SELECT list, vec_id FROM (
       |    SELECT a.list, a.vec_id,
       |           ROW_NUMBER() OVER (PARTITION BY a.list ORDER BY a.vec_id) AS r
       |    FROM $asnCte a JOIN rb_split USING (list)) WHERE r = 1
       |),
       |rb_ca AS MATERIALIZED (
       |  SELECT f.list, f.vec_id,
       |         round(SUM(f.v * fa.v) / (sqrt(SUM(f.v * f.v)) * sqrt(SUM(fa.v * fa.v))), 6) AS ca
       |  FROM rb_flat f
       |  JOIN rb_seed_a sa ON f.list = sa.list
       |  JOIN rb_flat fa ON fa.vec_id = sa.vec_id AND fa.i = f.i
       |  GROUP BY 1, 2
       |),
       |rb_seed_b AS (
       |  SELECT list, vec_id FROM (
       |    SELECT list, vec_id,
       |           ROW_NUMBER() OVER (PARTITION BY list ORDER BY ca, vec_id) AS r
       |    FROM rb_ca) WHERE r = 1
       |),
       |rb_cb AS (
       |  SELECT f.list, f.vec_id,
       |         round(SUM(f.v * fb.v) / (sqrt(SUM(f.v * f.v)) * sqrt(SUM(fb.v * fb.v))), 6) AS cb
       |  FROM rb_flat f
       |  JOIN rb_seed_b sb ON f.list = sb.list
       |  JOIN rb_flat fb ON fb.vec_id = sb.vec_id AND fb.i = f.i
       |  GROUP BY 1, 2
       |),
       |rb_sub0 AS MATERIALIZED (
       |  SELECT ca.list, ca.vec_id,
       |         CASE WHEN ca.ca >= cb.cb THEN 0 ELSE 1 END AS sub
       |  FROM rb_ca ca JOIN rb_cb cb ON ca.list = cb.list AND ca.vec_id = cb.vec_id
       |),
       |rb_c1 AS (
       |  SELECT s.list, s.sub, f.i, round(AVG(f.v), 6) AS c
       |  FROM rb_flat f JOIN rb_sub0 s ON f.vec_id = s.vec_id
       |  GROUP BY 1, 2, 3
       |),
       |rb_s1 AS (
       |  SELECT f.vec_id, f.list, c.sub,
       |         round(SUM(f.v * c.c) / (sqrt(SUM(f.v * f.v)) * sqrt(SUM(c.c * c.c))), 6) AS cos
       |  FROM rb_flat f JOIN rb_c1 c ON f.list = c.list AND f.i = c.i
       |  GROUP BY 1, 2, 3
       |),
       |rb_sub1 AS MATERIALIZED (
       |  SELECT vec_id, list, sub FROM (
       |    SELECT vec_id, list, sub,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, sub) AS r
       |    FROM rb_s1) WHERE r = 1
       |),
       |rb_c2 AS (
       |  SELECT s.list, s.sub, f.i, round(AVG(f.v), 6) AS c
       |  FROM rb_flat f JOIN rb_sub1 s ON f.vec_id = s.vec_id
       |  GROUP BY 1, 2, 3
       |),
       |rb_s2 AS (
       |  SELECT f.vec_id, f.list, c.sub,
       |         round(SUM(f.v * c.c) / (sqrt(SUM(f.v * f.v)) * sqrt(SUM(c.c * c.c))), 6) AS cos
       |  FROM rb_flat f JOIN rb_c2 c ON f.list = c.list AND f.i = c.i
       |  GROUP BY 1, 2, 3
       |),
       |rb_sub2 AS MATERIALIZED (
       |  SELECT vec_id, list, sub FROM (
       |    SELECT vec_id, list, sub,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, sub) AS r
       |    FROM rb_s2) WHERE r = 1
       |),
       |rb_final AS MATERIALIZED (
       |  SELECT a.vec_id,
       |         CASE WHEN s.sub IS NULL THEN a.list
       |              WHEN s.sub = 0 THEN a.list
       |              ELSE a.list + n_lists END AS list
       |  FROM $asnCte a
       |  LEFT JOIN rb_sub2 s USING (vec_id), rb_stats
       |),""".stripMargin

  /** e20 — IVF LIST REBALANCE: the maintenance step a drifting corpus
    * forces that the e18 lifecycle (delete + compact WITHIN lists)
    * cannot provide — lists more than 5% over the mean population are
    * split by [[graft.similarity.Rebalance.splitLists]]'s
    * deterministic local 2-means (seed A = min id, seed B = farthest
    * from A, 2 Lloyd rounds, 6-dp determinism discipline) and only
    * those lists' vectors reassign; sub-cluster 1 moves to
    * `list + numLists`. The oracle replays threshold → seeds → both
    * Lloyd rounds → the final mapping, so the hash pins every
    * post-rebalance assignment. Scale shape: the split set is
    * broadcast and every join is keyed on the split list id — the
    * pass shuffles O(over-full lists), not O(index);
    * `RebalanceStress` measures bounded max-list-size under ×10
    * drift.
    */
  val ivfRebalance = Query(
    "e20_ivf_rebalance",
    s"""WITH asn AS MATERIALIZED (
       |  SELECT vec_id, CAST(label AS BIGINT) AS list FROM embeddings
       |),
       |${rebalanceCtes("asn")}
       |out AS (
       |  SELECT a.vec_id, a.list AS old_list, f.list AS new_list
       |  FROM asn a JOIN rb_final f USING (vec_id)
       |)
       |SELECT vec_id, old_list, new_list FROM out ORDER BY vec_id""".stripMargin) { (spark, d) =>
    import spark.implicits._
    val e = embeddings(spark, d)
    val asn = e.select($"vec_id", $"label".cast("long").as("list"))
    val (nTotal, nLists) = asn
      .agg(count(lit(1)), countDistinct($"list")).as[(Long, Long)].head()
    val maxSz = (21L * nTotal) / (20L * nLists)
    graft.similarity.Rebalance
      .splitLists(asn, e.select($"vec_id", $"embedding"),
        "vec_id", "embedding", "list", maxSz, newListOffset = nLists, iters = 2)
      .withColumnRenamed("list", "new_list")
      .join(asn.withColumnRenamed("list", "old_list"), "vec_id")
      .select($"vec_id", $"old_list", $"new_list")
      .orderBy($"vec_id")
  }

  /** e20b — the post-rebalance SERVABLE index: e20 pins the new
    * assignments, but an index is only servable when the probe router
    * has a centroid for every list — including the `old + nLists` ids
    * the split created. This gate composes
    * [[graft.similarity.Rebalance.splitListsServable]] (assignments +
    * final split-list centroids in one pass) with the INCREMENTAL
    * router refresh (untouched lists keep their existing centroids;
    * only the O(drift) split set is replaced) and the frozen e17
    * codebook's packed codes, and pins per vector: the packed codevec,
    * the post-rebalance list, and a fingerprint of the row's list
    * centroid (Σ over dims of round(6-dp-centroid · 10⁶) — an integer,
    * so engine float formatting never enters the hash). The oracle
    * recomputes every centroid FROM SCRATCH over the final assignment,
    * so a hash match proves incremental refresh ≡ full rebuild —
    * exactly the property that makes O(drift) maintenance sound at
    * 100 TB. `RebalanceSpec` separately proves the served top-k
    * through [[graft.similarity.Pq.ivfAdcTopKPacked]] matches a
    * from-scratch build.
    */
  val rebalanceServing = Query(
    "e20b_rebalance_serving",
    s"""WITH asn AS MATERIALIZED (
       |  SELECT vec_id, CAST(label AS BIGINT) AS list FROM embeddings
       |),
       |${rebalanceCtes("asn")}
       |${pqSampledCtes(dim = 64, m = 32, k = 16, iters = 4, sampleN = 200)}
       |rcent AS MATERIALIZED (
       |  SELECT f2.list, u.i, round(AVG(CAST(u.v AS DOUBLE)), 6) AS c
       |  FROM rb_final f2
       |  JOIN (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
       |               generate_subscripts(embedding, 1) AS i
       |        FROM embeddings) u USING (vec_id)
       |  GROUP BY 1, 2
       |),
       |rfp AS MATERIALIZED (
       |  SELECT list, CAST(SUM(CAST(round(c * 1000000) AS BIGINT)) AS BIGINT) AS cent_fp
       |  FROM rcent GROUP BY 1
       |),
       |pk AS MATERIALIZED (
       |  SELECT vec_id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY sub) AS codevec
       |  FROM enca GROUP BY 1
       |)
       |SELECT f2.vec_id, f2.list, pk.codevec, rfp.cent_fp
       |FROM rb_final f2
       |JOIN pk USING (vec_id)
       |JOIN rfp ON rfp.list = f2.list
       |ORDER BY f2.vec_id""".stripMargin) { (spark, d) =>
    import spark.implicits._
    val e = embeddings(spark, d)
    // e20 pins the split itself; this gate prices the ROUTER REFRESH +
    // packed serving layout — the shared pass is battery-memoized.
    val (newAsn, splitCents) = sharedRebalanceServable(spark, d)
    // Incremental router refresh: the pre-rebalance router (6-dp label
    // centroids) minus every list id the split touched, plus the split
    // pass's own final centroids — O(drift) replaced, never rebuilt.
    val oldRouter = graft.similarity.Ann
      .centroids(e.select($"label".cast("long").as("list"), $"embedding"),
        "list", "embedding")
      .select($"list", transform($"centroid", x => round(x, 6)).as("centroid"))
    val router = oldRouter
      .join(splitCents.select($"list"), Seq("list"), "left_anti")
      .unionByName(splitCents)
    val fp = router.select($"list",
      expr("aggregate(transform(centroid, x -> CAST(round(x * 1000000) AS BIGINT)), " +
        "CAST(0 AS BIGINT), (a, x) -> a + x)").as("cent_fp"))
    val cbCents = sharedCents(spark, d, dim = 64, m = 32, k = 16, iters = 4, sampleN = 200)
    val packed = graft.similarity.Pq.packCodes(
      graft.similarity.Pq.encode(e, cbCents, "vec_id", "embedding", dim = 64, m = 32),
      "vec_id")
    packed
      .join(newAsn, "vec_id")
      .join(fp, "list")
      .select($"vec_id", $"list", concat_ws(",", $"codevec").as("codevec"), $"cent_fp")
      .orderBy($"vec_id")
  }

  /** e20c — K-WAY list rebalance
    * ([[graft.similarity.Rebalance.splitListsK]]): one pass where the
    * 2-means ladder needs log₂(size/target) — each over-full list
    * splits directly into ⌈size/target⌉ sub-lists (positional
    * id-ranked init, two Lloyd rounds, 6-dp discipline; sub j moves to
    * `list + j·nLists`). The uniform-growth remedy the ×10 stress
    * measured the need for. The oracle replays threshold → per-list k
    * → positional init → both Lloyd rounds → the final mapping, so
    * the hash pins every post-split assignment.
    */
  val ivfRebalanceK = Query(
    "e20c_ivf_rebalance_k",
    """WITH asn AS MATERIALIZED (
      |  SELECT vec_id, CAST(label AS BIGINT) AS list FROM embeddings
      |),
      |rbk_stats AS (
      |  SELECT COUNT(*) AS n_total, COUNT(DISTINCT list) AS n_lists FROM asn
      |),
      |rbk_msz AS (
      |  SELECT (21 * n_total) // (20 * n_lists) AS msz, n_lists FROM rbk_stats
      |),
      |rbk_sizes AS (SELECT list, COUNT(*) AS n FROM asn GROUP BY 1),
      |rbk_split AS MATERIALIZED (
      |  SELECT s.list, s.n, (s.n + m.msz - 1) // m.msz AS k
      |  FROM rbk_sizes s, rbk_msz m
      |  WHERE s.n > m.msz
      |),
      |rbk_flat AS MATERIALIZED (
      |  SELECT a.list, e.vec_id,
      |         generate_subscripts(embedding, 1) AS i,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings e
      |  JOIN asn a USING (vec_id)
      |  JOIN rbk_split sp ON a.list = sp.list
      |),
      |rbk_init AS MATERIALIZED (
      |  SELECT list, vec_id, ((rn - 1) * k) // n AS sub FROM (
      |    SELECT a.list, a.vec_id, sp.n, sp.k,
      |           ROW_NUMBER() OVER (PARTITION BY a.list ORDER BY a.vec_id) AS rn
      |    FROM asn a JOIN rbk_split sp ON a.list = sp.list)
      |),
      |rbk_c1 AS (
      |  SELECT s.list, s.sub, f.i, round(AVG(f.v), 6) AS c
      |  FROM rbk_flat f JOIN rbk_init s ON f.vec_id = s.vec_id
      |  GROUP BY 1, 2, 3
      |),
      |rbk_s1 AS (
      |  SELECT f.vec_id, f.list, c.sub,
      |         round(SUM(f.v * c.c) / (sqrt(SUM(f.v * f.v)) * sqrt(SUM(c.c * c.c))), 6) AS cos
      |  FROM rbk_flat f JOIN rbk_c1 c ON f.list = c.list AND f.i = c.i
      |  GROUP BY 1, 2, 3
      |),
      |rbk_sub1 AS MATERIALIZED (
      |  SELECT vec_id, list, sub FROM (
      |    SELECT vec_id, list, sub,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, sub) AS r
      |    FROM rbk_s1) WHERE r = 1
      |),
      |rbk_c2 AS (
      |  SELECT s.list, s.sub, f.i, round(AVG(f.v), 6) AS c
      |  FROM rbk_flat f JOIN rbk_sub1 s ON f.vec_id = s.vec_id
      |  GROUP BY 1, 2, 3
      |),
      |rbk_s2 AS (
      |  SELECT f.vec_id, f.list, c.sub,
      |         round(SUM(f.v * c.c) / (sqrt(SUM(f.v * f.v)) * sqrt(SUM(c.c * c.c))), 6) AS cos
      |  FROM rbk_flat f JOIN rbk_c2 c ON f.list = c.list AND f.i = c.i
      |  GROUP BY 1, 2, 3
      |),
      |rbk_sub2 AS MATERIALIZED (
      |  SELECT vec_id, list, sub FROM (
      |    SELECT vec_id, list, sub,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, sub) AS r
      |    FROM rbk_s2) WHERE r = 1
      |)
      |SELECT a.vec_id, a.list AS old_list,
      |       CASE WHEN s.sub IS NULL THEN a.list
      |            ELSE a.list + s.sub * n_lists END AS new_list
      |FROM asn a
      |LEFT JOIN rbk_sub2 s USING (vec_id), rbk_stats
      |ORDER BY a.vec_id""".stripMargin) { (spark, d) =>
    import spark.implicits._
    val e = embeddings(spark, d)
    val asn = e.select($"vec_id", $"label".cast("long").as("list"))
    val (nTotal, nLists) = asn
      .agg(count(lit(1)), countDistinct($"list")).as[(Long, Long)].head()
    val maxSz = (21L * nTotal) / (20L * nLists)
    graft.similarity.Rebalance
      .splitListsK(asn, e.select($"vec_id", $"embedding"),
        "vec_id", "embedding", "list", maxSz, newListOffset = nLists, iters = 2)._1
      .withColumnRenamed("list", "new_list")
      .join(asn.withColumnRenamed("list", "old_list"), "vec_id")
      .select($"vec_id", $"old_list", $"new_list")
      .orderBy($"vec_id")
  }

  /** e20d — SERVE the rebalanced index end-to-end: the query-side
    * proof that the e20b maintenance loop is closed. A 20-query panel
    * routes through the INCREMENTALLY refreshed router (old centroids
    * minus the split set ∪ [[graft.similarity.Rebalance.splitListsServable]]'s
    * final centroids — the new `list+offset` ids are reachable only
    * through them), then ADC-scores packed codes restricted to the
    * probed post-rebalance lists
    * ([[graft.similarity.Pq.ivfAdcTopKPacked]], frozen e17 codebook).
    * The oracle replays rebalance → from-scratch centroid recompute →
    * probe → LUT → ADC → ranking, so the hash pins every served
    * (rank, id, distance) of the post-rebalance index — a router
    * missing a split list, a stale centroid, or a mis-assigned packed
    * row all mismatch.
    */
  val rebalanceProbe = Query(
    "e20d_rebalance_probe",
    s"""WITH asn AS MATERIALIZED (
       |  SELECT vec_id, CAST(label AS BIGINT) AS list FROM embeddings
       |),
       |${rebalanceCtes("asn")}
       |${pqSampledCtes(dim = 64, m = 32, k = 16, iters = 4, sampleN = 200)}
       |rcent AS MATERIALIZED (
       |  SELECT f2.list, u.i, round(AVG(u.v), 6) AS c
       |  FROM rb_final f2
       |  JOIN (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
       |               generate_subscripts(embedding, 1) AS i
       |        FROM embeddings) u USING (vec_id)
       |  GROUP BY 1, 2
       |),
       |qf AS MATERIALIZED (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings WHERE vec_id % 100 = 0
       |),
       |qdots AS (
       |  SELECT qf.vec_id AS qid, rcent.list,
       |         SUM(qf.v * rcent.c) AS dot,
       |         SUM(qf.v * qf.v) AS qq,
       |         SUM(rcent.c * rcent.c) AS cc
       |  FROM qf JOIN rcent ON qf.i = rcent.i
       |  GROUP BY 1, 2
       |),
       |probes AS (
       |  SELECT qid, list FROM (
       |    SELECT qid, list,
       |           ROW_NUMBER() OVER (PARTITION BY qid
       |             ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC, list) AS pr
       |    FROM qdots)
       |  WHERE pr <= 2
       |),
       |lut AS (
       |  SELECT vec_id AS qid, sub, code, dist AS qd FROM encd WHERE vec_id % 100 = 0
       |),
       |adc AS (
       |  SELECT p.qid, a.vec_id AS bid, CAST(SUM(lut.qd) AS BIGINT) AS adist
       |  FROM probes p
       |  JOIN rb_final l ON l.list = p.list
       |  JOIN enca a ON a.vec_id = l.vec_id
       |  JOIN lut ON lut.qid = p.qid AND lut.sub = a.sub AND lut.code = a.code
       |  WHERE a.vec_id <> p.qid
       |  GROUP BY 1, 2
       |)
       |SELECT qid, rank, bid, adist FROM (
       |  SELECT qid, bid, adist,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, bid) AS rank
       |  FROM adc) WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin) { (spark, d) =>
    import spark.implicits._
    val e = embeddings(spark, d)
    // e20 pins the split; this gate prices the served probe path over
    // the rebalanced index — the shared pass is battery-memoized.
    val (newAsn, splitCents) = sharedRebalanceServable(spark, d)
    val oldRouter = graft.similarity.Ann
      .centroids(e.select($"label".cast("long").as("list"), $"embedding"),
        "list", "embedding")
      .select($"list", transform($"centroid", x => round(x, 6)).as("centroid"))
    val router = oldRouter
      .join(splitCents.select($"list"), Seq("list"), "left_anti")
      .unionByName(splitCents)
    val cbCents = sharedCents(spark, d, dim = 64, m = 32, k = 16, iters = 4, sampleN = 200)
    val index = graft.similarity.Pq.packCodes(
      graft.similarity.Pq.encode(e, cbCents, "vec_id", "embedding", dim = 64, m = 32),
      "vec_id")
      .join(newAsn, "vec_id")
    graft.similarity.Pq
      .ivfAdcTopKPacked(index, cbCents, router,
        e.filter($"vec_id" % 100 === 0).select($"vec_id", $"embedding"),
        "vec_id", "embedding", "list", dim = 64, m = 32, k = 5, nprobe = 2)
      .orderBy($"qid", $"rank")
  }

  /** e19c — the DEFAULT production kNN-graph path
    * ([[graft.similarity.Ann.knnGraphRebalanced]]): REBALANCE the
    * learned lists first, then build the graph. e19b's frozen-list
    * build degrades toward N²/L on a drifted corpus (round-11 stress:
    * 21× at ×10 corpora; 1.85× with the pre-split at −2.5 pp recall) —
    * this gate pins the composed chain the measurement said should be
    * the default: unsupervised k-means lists (e13's recipe) →
    * deterministic over-full split (e20's 21/20-of-mean threshold) →
    * IVF kNN graph with mutual flags over the POST-SPLIT lists. The
    * oracle replays k-means → rebalance → probes → ranking → the
    * reverse-edge join, so the hash pins every edge, rank, 6-dp cosine
    * and mutuality bit of the production build.
    */
  val knnGraphRebalancedGate = Query(
    "e19c_knn_graph_rebalanced", {
      s"""WITH ${kmeansCtes(2, signInitSql)}
         |${rebalanceCtes("klists")}
         |ev AS MATERIALIZED (
         |  SELECT f.vec_id, rf.list AS label, f.i, f.v
         |  FROM flat f JOIN rb_final rf USING (vec_id)
         |),
         |cent AS (
         |  SELECT label, i, AVG(v) AS c FROM ev GROUP BY label, i
         |),
         |qdots AS (
         |  SELECT ev.vec_id AS qid, cent.label,
         |         SUM(ev.v * cent.c) AS dot,
         |         SUM(ev.v * ev.v) AS qq,
         |         SUM(cent.c * cent.c) AS cc
         |  FROM ev JOIN cent ON ev.i = cent.i
         |  GROUP BY qid, cent.label
         |),
         |probes AS (
         |  SELECT qid, label FROM (
         |    SELECT qid, label,
         |           ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC, label) AS pr
         |    FROM qdots)
         |  WHERE pr <= 2
         |),
         |bdots AS (
         |  SELECT p.qid, b.vec_id AS bid,
         |         SUM(qv.v * b.v) AS dot,
         |         SUM(qv.v * qv.v) AS qq,
         |         SUM(b.v * b.v) AS bb
         |  FROM probes p
         |  JOIN ev b ON b.label = p.label
         |  JOIN ev qv ON qv.vec_id = p.qid AND qv.i = b.i
         |  WHERE b.vec_id <> p.qid
         |  GROUP BY p.qid, b.vec_id
         |),
         |edges AS MATERIALIZED (
         |  SELECT qid, bid, cosine, rank FROM (
         |    SELECT qid, bid,
         |           round(dot / (sqrt(qq) * sqrt(bb)), 6) AS cosine,
         |           ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY round(dot / (sqrt(qq) * sqrt(bb)), 6) DESC, bid) AS rank
         |    FROM bdots)
         |  WHERE rank <= 3
         |)
         |SELECT e.qid, CAST(e.rank AS BIGINT) AS rank, e.bid, e.cosine,
         |       CAST(CASE WHEN r.qid IS NULL THEN 0 ELSE 1 END AS BIGINT) AS mutual
         |FROM edges e
         |LEFT JOIN edges r ON r.qid = e.bid AND r.bid = e.qid
         |ORDER BY e.qid, e.rank""".stripMargin
    }) { (spark, d) =>
    import spark.implicits._
    val inp = embeddings(spark, d).select($"vec_id", $"embedding")
      .join(sharedUnsupLists(spark, d, kmIters = 2), "vec_id")
    graft.similarity.Ann
      // the oracle replays EXACTLY one 2-way pass — fail loudly (not
      // hash-diverge) if a regenerated corpus ever needs more
      .knnGraphRebalanced(inp, "vec_id", "embedding", "list", k = 3, nprobe = 2,
        assertPasses = 1)
      .orderBy($"qid", $"rank")
  }

  /** m11b — m11's mutual-kNN semantic clusters over the LEARNED
    * lists: the e19b graph (unsupervised k-means coarse lists, e13's
    * no-label recipe) filtered to reciprocated ≥0.3-cosine edges and
    * contracted to connected components. This re-points the
    * production clustering at the production (label-free) graph build
    * — m11 keeps the label-list variant pinned. The oracle replays
    * k-means → probes → ranking → mutuality → the recursive closure
    * in one query.
    */
  val knnComponentsLearned = Query(
    "m11b_knn_components_learned", {
      s"""WITH RECURSIVE ${kmeansCtes(2, signInitSql)}
         |ev AS MATERIALIZED (
         |  SELECT f.vec_id, kl.list AS label, f.i, f.v
         |  FROM flat f JOIN klists kl USING (vec_id)
         |),
         |cent AS (
         |  SELECT label, i, AVG(v) AS c FROM ev GROUP BY label, i
         |),
         |qdots AS (
         |  SELECT ev.vec_id AS qid, cent.label,
         |         SUM(ev.v * cent.c) AS dot,
         |         SUM(ev.v * ev.v) AS qq,
         |         SUM(cent.c * cent.c) AS cc
         |  FROM ev JOIN cent ON ev.i = cent.i
         |  GROUP BY qid, cent.label
         |),
         |probes AS (
         |  SELECT qid, label FROM (
         |    SELECT qid, label,
         |           ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC, label) AS pr
         |    FROM qdots)
         |  WHERE pr <= 2
         |),
         |bdots AS (
         |  SELECT p.qid, b.vec_id AS bid,
         |         SUM(qv.v * b.v) AS dot,
         |         SUM(qv.v * qv.v) AS qq,
         |         SUM(b.v * b.v) AS bb
         |  FROM probes p
         |  JOIN ev b ON b.label = p.label
         |  JOIN ev qv ON qv.vec_id = p.qid AND qv.i = b.i
         |  WHERE b.vec_id <> p.qid
         |  GROUP BY p.qid, b.vec_id
         |),
         |knn AS MATERIALIZED (
         |  SELECT qid, bid, cosine FROM (
         |    SELECT qid, bid,
         |           round(dot / (sqrt(qq) * sqrt(bb)), 6) AS cosine,
         |           ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY round(dot / (sqrt(qq) * sqrt(bb)), 6) DESC, bid) AS rank
         |    FROM bdots)
         |  WHERE rank <= 3
         |),
         |mutual AS MATERIALIZED (
         |  SELECT e.qid AS id_a, e.bid AS id_b
         |  FROM knn e JOIN knn r ON r.qid = e.bid AND r.bid = e.qid
         |  WHERE e.cosine >= 0.3 AND e.qid < e.bid
         |),
         |medges AS MATERIALIZED (
         |  SELECT id_a AS a, id_b AS b FROM mutual
         |  UNION SELECT id_b, id_a FROM mutual
         |),
         |reach(v, r) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN medges e ON e.a = reach.v
         |)
         |SELECT v AS vec_id, MIN(r) AS component
         |FROM reach GROUP BY v
         |ORDER BY vec_id""".stripMargin
    }) { (spark, d) =>
    val emb = embeddings(spark, d)
    // e19b pins the graph build; this gate prices the clustering over
    // it — the edge table is battery-memoized.
    val g = sharedGraph(spark, d, "learned")
    val pairs = g
      .filter(col("mutual") === 1L && col("cosine") >= 0.3 && col("qid") < col("bid"))
      .select(col("qid").as("id_a"), col("bid").as("id_b"))
    // learned lists chain long paths at sf0.1 (>20 hops) — use the
    // O(log n) large-small-star contraction, not min-propagation
    graft.dedup.Components
      .largeSmallStar(emb.select(col("vec_id")), "vec_id", pairs, "id_a", "id_b")
      .orderBy(col("vec_id"))
  }

  /** m11c — the production clustering over the PRODUCTION graph:
    * m11b's mutual-kNN components re-pointed at the REBALANCED
    * learned-list build ([[graft.similarity.Ann.knnGraphRebalanced]],
    * e19c's default path) — so the operator the pipeline actually
    * clusters with is the one whose N²/L cliff the rebalance removed,
    * not the frozen-list build the stress rows retired. The oracle
    * replays k-means → rebalance → probes → ranking → mutuality → the
    * recursive closure in one query; components are contracted with
    * the O(log n) large-small-star (m11b's >20-hop lesson).
    */
  val knnComponentsRebalanced = Query(
    "m11c_knn_components_rebalanced", {
      s"""WITH RECURSIVE ${kmeansCtes(2, signInitSql)}
         |${rebalanceCtes("klists")}
         |ev AS MATERIALIZED (
         |  SELECT f.vec_id, rf.list AS label, f.i, f.v
         |  FROM flat f JOIN rb_final rf USING (vec_id)
         |),
         |cent AS (
         |  SELECT label, i, AVG(v) AS c FROM ev GROUP BY label, i
         |),
         |qdots AS (
         |  SELECT ev.vec_id AS qid, cent.label,
         |         SUM(ev.v * cent.c) AS dot,
         |         SUM(ev.v * ev.v) AS qq,
         |         SUM(cent.c * cent.c) AS cc
         |  FROM ev JOIN cent ON ev.i = cent.i
         |  GROUP BY qid, cent.label
         |),
         |probes AS (
         |  SELECT qid, label FROM (
         |    SELECT qid, label,
         |           ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC, label) AS pr
         |    FROM qdots)
         |  WHERE pr <= 2
         |),
         |bdots AS (
         |  SELECT p.qid, b.vec_id AS bid,
         |         SUM(qv.v * b.v) AS dot,
         |         SUM(qv.v * qv.v) AS qq,
         |         SUM(b.v * b.v) AS bb
         |  FROM probes p
         |  JOIN ev b ON b.label = p.label
         |  JOIN ev qv ON qv.vec_id = p.qid AND qv.i = b.i
         |  WHERE b.vec_id <> p.qid
         |  GROUP BY p.qid, b.vec_id
         |),
         |knn AS MATERIALIZED (
         |  SELECT qid, bid, cosine FROM (
         |    SELECT qid, bid,
         |           round(dot / (sqrt(qq) * sqrt(bb)), 6) AS cosine,
         |           ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY round(dot / (sqrt(qq) * sqrt(bb)), 6) DESC, bid) AS rank
         |    FROM bdots)
         |  WHERE rank <= 3
         |),
         |mutual AS MATERIALIZED (
         |  SELECT e.qid AS id_a, e.bid AS id_b
         |  FROM knn e JOIN knn r ON r.qid = e.bid AND r.bid = e.qid
         |  WHERE e.cosine >= 0.3 AND e.qid < e.bid
         |),
         |medges AS MATERIALIZED (
         |  SELECT id_a AS a, id_b AS b FROM mutual
         |  UNION SELECT id_b, id_a FROM mutual
         |),
         |reach(v, r) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN medges e ON e.a = reach.v
         |)
         |SELECT v AS vec_id, MIN(r) AS component
         |FROM reach GROUP BY v
         |ORDER BY vec_id""".stripMargin
    }) { (spark, d) =>
    val emb = embeddings(spark, d)
    // e19c pins the rebalanced build; this gate prices the clustering
    // over it — the edge table is battery-memoized (one 2-way pass,
    // assertPasses = 1, matching m11c's rebalanceCtes replay).
    val g = sharedGraph(spark, d, "rebalanced")
    val pairs = g
      .filter(col("mutual") === 1L && col("cosine") >= 0.3 && col("qid") < col("bid"))
      .select(col("qid").as("id_a"), col("bid").as("id_b"))
    graft.dedup.Components
      .largeSmallStar(emb.select(col("vec_id")), "vec_id", pairs, "id_a", "id_b")
      .orderBy(col("vec_id"))
  }

  /** x5 — SEMANTIC decontamination: x3/x4 catch verbatim benchmark
    * leakage; this catches paraphrased leakage by flagging every
    * training vector whose max cosine to ANY benchmark vector crosses
    * the threshold. Same scale discipline as x3: the benchmark side is
    * small BY CONSTRUCTION and broadcast, the training corpus is
    * scanned once with a narrow map + partial max aggregation — the
    * corpus never shuffles on anything benchmark-sized.
    */
  val semanticDecontam = Query(
    "x5_semantic_decontam",
    """WITH flat AS MATERIALIZED (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |),
      |bench AS (SELECT * FROM flat WHERE vec_id < 20),
      |train AS (SELECT * FROM flat WHERE vec_id >= 20),
      |dots AS (
      |  SELECT t.vec_id, b.vec_id AS bid,
      |         SUM(t.v * b.v) AS dot, SUM(t.v * t.v) AS tt, SUM(b.v * b.v) AS bb
      |  FROM train t JOIN bench b ON t.i = b.i
      |  GROUP BY 1, 2
      |)
      |SELECT vec_id, MAX(round(dot / (sqrt(tt) * sqrt(bb)), 6)) AS max_cos,
      |       CAST(CASE WHEN MAX(round(dot / (sqrt(tt) * sqrt(bb)), 6)) >= 0.3
      |            THEN 1 ELSE 0 END AS BIGINT) AS contaminated
      |FROM dots GROUP BY vec_id
      |ORDER BY vec_id""".stripMargin) { (spark, d) =>
    import spark.implicits._
    val emb = embeddings(spark, d)
    val bench = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("bid"), $"embedding".as("bv"))
    emb.filter($"vec_id" >= 20)
      .select($"vec_id", $"embedding")
      .crossJoin(broadcast(bench))
      .select($"vec_id", round(cosine($"embedding", $"bv"), 6).as("cos"))
      .groupBy($"vec_id")
      .agg(max($"cos").as("max_cos"))
      .select($"vec_id", $"max_cos",
        when($"max_cos" >= 0.3, 1L).otherwise(0L).as("contaminated"))
      .orderBy($"vec_id")
  }

  /** Battery-shared SERVABLE REBALANCE of the label lists (the
    * [[sharedUnsupLists]] pattern): e20b and e20d both consume the
    * same `splitListsServable(label lists, 21/20-of-mean)` pass — but
    * their operators under test are the ROUTER REFRESH and the SERVED
    * PROBE; the split itself is e20's gate, which keeps computing it
    * directly. The corpus-sized assignment goes to temp parquet; the
    * split-list centroids (O(drift) rows) are collected. Deterministic,
    * so consumers are bit-identical to recomputation and every oracle
    * still replays the full chain.
    */
  private val rebalMemo = scala.collection.concurrent.TrieMap[
    String,
    (String, (org.apache.spark.sql.types.StructType, Seq[org.apache.spark.sql.Row]))]()

  private def sharedRebalanceServable(
      spark: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val dKey = s"$d|${graft.operators.Bucketing.suffix(spark, d)}"
    val (asnPath, (cs, cr)) = rebalMemo.getOrElseUpdate(dKey, {
      val e = embeddings(spark, d)
      val asn = e.select($"vec_id", $"label".cast("long").as("list"))
      val (nTotal, nLists) = asn
        .agg(count(lit(1)), countDistinct($"list")).as[(Long, Long)].head()
      val maxSz = (21L * nTotal) / (20L * nLists)
      val (newAsn, splitCents) = graft.similarity.Rebalance
        .splitListsServable(asn, e.select($"vec_id", $"embedding"),
          "vec_id", "embedding", "list", maxSz, newListOffset = nLists, iters = 2)
      val dir = graft.TempDirs.create("graft-rebal-asn-").toFile
      newAsn.write.mode("overwrite").parquet(dir.getAbsolutePath)
      (dir.getAbsolutePath, (splitCents.schema, splitCents.collect().toSeq))
    })
    import scala.jdk.CollectionConverters._
    (spark.read.parquet(asnPath), spark.createDataFrame(cr.asJava, cs))
  }

  /** e21 — GRAPH-BASED ANN SERVING: batched beam search over a
    * degree-16 kNN graph (HNSW-family retrieval — its layer-0 search
    * over the symmetrized neighbour graph), the one ANN tier the IVF
    * probe family doesn't cover. Entry points = the min id of each
    * coarse list (HNSW's spread-the-starts role), 5 hops of
    * expand-neighbours → exact-rescore → keep-beam-16, final top-5 per
    * query, plus the `hit` bit against the brute-force exact top-5 —
    * the recall readout priced into the gate (0.96/0.96/0.92 at
    * sf0.001/0.01/0.1; the untuned directed-3-edge config measured
    * 0.04–0.10, the parameter sweep is in PLANS.md). Deterministic
    * end-to-end (6-dp cosine + id tiebreak at every rank), so the
    * oracle replays graph build + symmetrization + every hop as
    * unrolled SQL. Scale shape: per hop the frontier is
    * |queries|·beam·(degree+1) rows — corpus-independent; each query
    * touches hops·beam·degree vectors instead of nprobe·corpus/lists
    * candidates, the graph search's point (the brute leg here is the
    * gate's ground truth, panel-sized like e1's).
    */
  private val beamHops = 5
  private val beamWidthE21 = 16
  // Coarse-probe width of the full-corpus (layer-0) graph build —
  // interpolated into BOTH the oracle CTEs (`corpusGraphCtes`) and the
  // Spark `knnGraph` calls of e21/e21b/e22, so the knob cannot drift
  // between the two sides and silently hash-diverge a gate.
  private val graphNprobe = 4

  /** One unrolled beam-walk CTE chain: seed (`<p>c0`) → rescore →
    * keep-beam (`<p>beam0`) → `hops` rounds of expand-over-`edges` →
    * rescore → keep-beam. Prefix-parameterized so e21/e21b (one chain
    * over the full-corpus graph) and e22 (one chain PER LAYER, each
    * over that layer's edges, seeded by the layer above) replay through
    * the same builder — the SQL twin of [[graft.similarity.Ann
    * .beamSearchKnn]] being every tier's single serving function.
    */
  private def hopChain(
      p: String, edges: String, hops: Int, beamWidth: Int, seedSql: String,
      selfFilter: Boolean = true): String = {
    val guard = if (selfFilter) "\n  WHERE qid <> bid" else ""
    val c0 =
      s"""${p}c0 AS (
         |$seedSql)""".stripMargin
    def rescore(i: Int): String =
      s"""${p}sc$i AS MATERIALIZED (
         |  SELECT qid, bid, round(dot / (sqrt(qq) * sqrt(bb)), 6) AS cosine FROM (
         |    SELECT c.qid, c.bid,
         |           SUM(qv.v * b.v) AS dot,
         |           SUM(qv.v * qv.v) AS qq,
         |           SUM(b.v * b.v) AS bb
         |    FROM ${p}c$i c
         |    JOIN q qv ON qv.qid = c.qid
         |    JOIN ev b ON b.vec_id = c.bid AND b.i = qv.i
         |    GROUP BY c.qid, c.bid)),
         |${p}beam$i AS MATERIALIZED (
         |  SELECT qid, bid, cosine FROM (
         |    SELECT qid, bid, cosine,
         |           ROW_NUMBER() OVER (PARTITION BY qid
         |             ORDER BY cosine DESC, bid) AS r
         |    FROM ${p}sc$i)
         |  WHERE r <= $beamWidth)""".stripMargin
    val hopsSql = (1 to hops).map { i =>
      s"""${p}c$i AS (
         |  SELECT DISTINCT qid, bid FROM (
         |    SELECT b.qid, e.dst AS bid FROM ${p}beam${i - 1} b JOIN $edges e ON e.src = b.bid
         |    UNION ALL
         |    SELECT qid, bid FROM ${p}beam${i - 1})$guard),
         |${rescore(i)}""".stripMargin
    }
    ((c0 + ",\n" + rescore(0)) +: hopsSql).mkString(",\n")
  }

  private def beamHopCtes(hops: Int, beamWidth: Int): String = {
    // c0: per-list entries per query; hop i: neighbours ∪ beam, rescored.
    // TWO entries per coarse list (the lowest two ids — HNSW's
    // spread-the-starts role, widened): the ×10 probe measured
    // recall@5 sagging 0.92 → 0.86 with one entry per list and
    // recovering to 1.00 with two (entries_2 sweep, PLANS.md
    // round-16) — the cheapest rung of the entry ladder. NOTE the
    // round-17 200-query panels (GraphRecall200) showed that 10-query
    // reading was panel-resolution luck: on 1 000 hit slots flat-2
    // serving reads 0.87/0.39/0.22 at ×1/×10/×100 while the e22 rep
    // ladder holds 0.96/1.00/1.00 — the gate keeps this convention
    // because its hash prices exactly this walk, but the ladder is
    // the adopted serving design at scale.
    val ent =
      s"""ent AS (SELECT vec_id AS bid FROM (
         |  SELECT vec_id, ROW_NUMBER() OVER (
         |    PARTITION BY label ORDER BY vec_id) AS r FROM embeddings)
         |  WHERE r <= 2)""".stripMargin
    val seed =
      s"""  SELECT DISTINCT q.qid, ent.bid
         |  FROM (SELECT DISTINCT qid FROM q) q CROSS JOIN ent
         |  WHERE q.qid <> ent.bid""".stripMargin
    ent + ",\n" + hopChain("", "sedges", hops, beamWidth, seed)
  }

  /** The full graph-build + beam-walk replay, shared verbatim by e21
    * (in-gate build) and e21b (serving from the prebuilt index): the
    * DuckDB side has no memo, so both gates pin their results against
    * the same end-to-end SQL — which is exactly the point: e21b's
    * Spark side must produce the identical rows while paying only the
    * serving cost.
    */
  /** Shared oracle prelude: exploded embeddings, the full-corpus
    * degree-16 label-list graph (e21's build chain), the panel, and the
    * exact-top-5 recall readout + final projection — composed by e21,
    * e21b and e22's oracles.
    */
  private val evCte: String =
    s"""ev AS MATERIALIZED (
       |  SELECT vec_id, label,
       |         generate_subscripts(embedding, 1) AS i,
       |         CAST(unnest(embedding) AS DOUBLE) AS v
       |  FROM embeddings
       |)""".stripMargin

  private def corpusGraphCtes(src: String = "ev"): String =
    s"""cent AS (
       |  SELECT label, i, AVG(v) AS c FROM $src GROUP BY label, i
       |),
       |qdots AS (
       |  SELECT $src.vec_id AS qid, cent.label,
       |         SUM($src.v * cent.c) AS dot,
       |         SUM($src.v * $src.v) AS qq,
       |         SUM(cent.c * cent.c) AS cc
       |  FROM $src JOIN cent ON $src.i = cent.i
       |  GROUP BY qid, cent.label
       |),
       |probes AS (
       |  SELECT qid, label FROM (
       |    SELECT qid, label,
       |           ROW_NUMBER() OVER (PARTITION BY qid
       |             ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC, label) AS pr
       |    FROM qdots)
       |  WHERE pr <= $graphNprobe
       |),
       |bdots AS (
       |  SELECT p.qid, b.vec_id AS bid,
       |         SUM(qv.v * b.v) AS dot,
       |         SUM(qv.v * qv.v) AS qq,
       |         SUM(b.v * b.v) AS bb
       |  FROM probes p
       |  JOIN $src b ON b.label = p.label
       |  JOIN $src qv ON qv.vec_id = p.qid AND qv.i = b.i
       |  WHERE b.vec_id <> p.qid
       |  GROUP BY p.qid, b.vec_id
       |),
       |edges AS MATERIALIZED (
       |  SELECT qid, bid FROM (
       |    SELECT qid, bid,
       |           ROW_NUMBER() OVER (PARTITION BY qid
       |             ORDER BY round(dot / (sqrt(qq) * sqrt(bb)), 6) DESC, bid) AS rank
       |    FROM bdots)
       |  WHERE rank <= 16
       |),
       |sedges AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT qid AS src, bid AS dst FROM edges
       |    UNION ALL
       |    SELECT bid AS src, qid AS dst FROM edges)
       |)""".stripMargin

  private val panelCte: String =
    s"""q AS MATERIALIZED (
       |  SELECT vec_id AS qid, i, v FROM ev WHERE vec_id < 10
       |)""".stripMargin

  private def recallTail(finalBeam: String): String =
    s"""ex AS MATERIALIZED (
       |  SELECT qid, bid FROM (
       |    SELECT qid, bid,
       |           ROW_NUMBER() OVER (PARTITION BY qid
       |             ORDER BY round(dot / (sqrt(qq) * sqrt(bb)), 6) DESC, bid) AS r
       |    FROM (
       |      SELECT q.qid, b.vec_id AS bid,
       |             SUM(q.v * b.v) AS dot,
       |             SUM(q.v * q.v) AS qq,
       |             SUM(b.v * b.v) AS bb
       |      FROM q JOIN ev b ON b.i = q.i
       |      WHERE b.vec_id <> q.qid
       |      GROUP BY q.qid, b.vec_id))
       |  WHERE r <= 5
       |)
       |SELECT f.qid, CAST(f.r AS BIGINT) AS rank, f.bid, f.cosine,
       |       CAST(CASE WHEN ex.bid IS NULL THEN 0 ELSE 1 END AS BIGINT) AS hit
       |FROM (
       |  SELECT qid, bid, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY qid
       |           ORDER BY cosine DESC, bid) AS r
       |  FROM $finalBeam) f
       |LEFT JOIN ex ON ex.qid = f.qid AND ex.bid = f.bid
       |WHERE f.r <= 5
       |ORDER BY f.qid, f.r""".stripMargin

  private def graphBeamOracleSql: String =
    s"""WITH $evCte,
       |${corpusGraphCtes()},
       |$panelCte,
       |${beamHopCtes(beamHops, beamWidthE21)},
       |${recallTail(s"beam$beamHops")}""".stripMargin

  /** The shared "beam results + exact-recall readout" tail of e21/e21b:
    * final top-5 per query with the `hit` bit against brute-force exact
    * top-5 (panel-sized, e1's convention).
    */
  private def beamWithRecall(
      spark: org.apache.spark.sql.SparkSession,
      corpus: org.apache.spark.sql.DataFrame,
      panel: org.apache.spark.sql.DataFrame,
      beam: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val exact = graft.similarity.Ann
      .bruteTopK(corpus, panel, "vec_id", "embedding", k = 5)
      .select($"qid", $"bid", lit(1L).as("hit"))
    beam.join(exact, Seq("qid", "bid"), "left_outer")
      .select($"qid", $"rank", $"bid", $"cosine",
        coalesce($"hit", lit(0L)).as("hit"))
      .orderBy($"qid", $"rank")
  }

  val graphBeamSearch: Query = Query(
    "e21_graph_beam_search", graphBeamOracleSql) { (spark, d) =>
    import spark.implicits._
    val emb = embeddings(spark, d).select($"vec_id", $"label", $"embedding")
    val g = graft.similarity.Ann
      .knnGraph(emb, "vec_id", "embedding", "label", k = 16, nprobe = graphNprobe)
    val corpus = emb.select($"vec_id", $"embedding")
    val panel = corpus.filter($"vec_id" < 10)
    val beam = graft.similarity.Ann.beamSearchKnn(
      g, corpus, panel, "vec_id", "embedding", entriesPerList(emb, 2),
      beamWidth = beamWidthE21, hops = beamHops, k = 5)
    beamWithRecall(spark, corpus, panel, beam)
  }

  /** Beam-search entry points: the `n` lowest ids of each coarse list
    * (HNSW's spread-the-starts role). One per list sagged recall@5 to
    * 0.86 at ×10 corpora; two read 1.00 on the 10-query panel
    * (PLANS.md round-16 entry sweep), so 2 is the gate convention —
    * though the round-17 200-query panels showed the flat-entry arm
    * sags hard at derived scales regardless (0.39 at ×10 on 1 000
    * slots); the e22 rep ladder is the at-scale serving design.
    */
  private def entriesPerList(
      emb: org.apache.spark.sql.DataFrame, n: Int): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("vec_id"))
    emb.select(col("label"), col("vec_id"))
      .withColumn("__r", row_number().over(w)).filter(col("__r") <= n)
      .select(col("vec_id").as("bid"))
  }

  /** Battery-shared GRAPH SERVING INDEX (e21b's prebuilt artifact):
    * e21's degree-16 label-list graph SYMMETRIZED AT BUILD TIME
    * ([[graft.similarity.Ann.symmetrize]]) plus the per-list entry
    * points, persisted once per corpus — the e17 packed-index
    * discipline applied to the graph tier. ExtensionProbe at ×10
    * measured build 27–50 s vs search 7.2 s: a server pays the build
    * once, never per query batch, so pricing it inside the serving
    * gate hides the number the tier exists for.
    */
  private val servingGraphMemo = scala.collection.concurrent.TrieMap[String, String]()

  private def sharedServingGraph(
      spark: org.apache.spark.sql.SparkSession, d: String): String =
    servingGraphMemo.getOrElseUpdate(
      s"$d|${graft.operators.Bucketing.suffix(spark, d)}", {
        val emb = embeddings(spark, d)
          .select(col("vec_id"), col("label"), col("embedding"))
        val g = graft.similarity.Ann
          .knnGraph(emb, "vec_id", "embedding", "label", k = 16, nprobe = graphNprobe)
        val dir = graft.TempDirs.create("graft-servinggraph-")
          .toFile.getAbsolutePath
        graft.similarity.Ann.symmetrize(g)
          .write.mode("overwrite").parquet(s"$dir/edges")
        entriesPerList(emb, 2)
          .write.mode("overwrite").parquet(s"$dir/entries")
        dir
      })

  /** e21b — graph-ANN SERVING from the prebuilt symmetric edge index:
    * identical semantics (and the identical oracle SQL) to e21, but
    * the gate prices only what a server pays per query batch — the
    * beam walk over the STORED symmetric edges (`presymmetrized`:
    * zero corpus-sized shuffle per hop, the edge table is consumed as
    * written) plus the exact-recall readout. The build/serve split the
    * r15 verdict asked for: e21 keeps pinning the build chain, e21b
    * pins that serving alone reproduces it bit-for-bit from the
    * persisted artifact ([[graft.streaming.GraphIndexStream]] maintains
    * the same artifact incrementally).
    */
  val graphServing: Query = Query(
    "e21b_graph_serving", graphBeamOracleSql) { (spark, d) =>
    import spark.implicits._
    val idx = sharedServingGraph(spark, d)
    val edges = spark.read.parquet(s"$idx/edges")
    val entries = spark.read.parquet(s"$idx/entries")
    val corpus = embeddings(spark, d).select($"vec_id", $"embedding")
    val panel = corpus.filter($"vec_id" < 10)
    val beam = graft.similarity.Ann.beamSearchKnn(
      edges, corpus, panel, "vec_id", "embedding", entries,
      beamWidth = beamWidthE21, hops = beamHops, k = 5,
      presymmetrized = true)
    beamWithRecall(spark, corpus, panel, beam)
  }

  /** e22 — HIERARCHICAL (HNSW-family) ANN SEARCH: the entry ladder's
    * top rung. e21 starts every query at 2 entries PER COARSE LIST, so
    * hop 0 rescores |q|·2·lists candidates — and the list count grows
    * with the corpus (×100 corpora = 1 000 lists = 2 000 entry rescores
    * per query). e22 replaces that with HNSW's layer descent: a nested
    * ladder of layers (layer ℓ = the `max(2, ceil(n/8^ℓ))` lowest
    * salted-md5-ranked vectors, [[graft.similarity.Ann.hnswRanks]] —
    * prefix ranks make layers nested, HNSW's invariant, with occupancy
    * guaranteed at every scale), a degree-8 kNN graph per upper layer,
    * and a CONSTANT 2-entry start at the top: each layer's walk
    * (beam 16, 4 hops — the ef-style width, see the sweep note below)
    * hands per-query entries to the layer below, then the layer-0 walk
    * is e21's (beam 16, 5 hops, degree-16 graph).
    * Deterministic end-to-end, so the oracle replays ladder + all three
    * upper-layer graph builds + every walk as unrolled SQL; the recall
    * readout vs brute exact top-5 is priced into the hash. Layer count
    * is FIXED at 3 in the gate (a static oracle cannot unroll a
    * data-dependent layer count); the operator takes it as a parameter.
    */
  // Upper-walk width/depth are ef-style knobs: the round-16 HnswSweep
  // (PLANS.md) measured recall@5 at ×10 corpora of 0.36/0.66/0.78/1.00
  // for beamUpper 2/4/8/16 — narrow upper beams strand the descent in
  // local minima of the short-edge kNN graph exactly as an HNSW with
  // efSearch≈2 would; 16 is the smallest swept width that recovers
  // 1.00 (real HNSW deployments run efSearch 50–400).
  private val hnswLayers = 3
  private val hnswKUpper = 8
  private val hnswBeamUpper = 16
  private val hnswHopsUpper = 4
  // Ladder knobs shared between the oracle CTEs and the Spark calls
  // (probe width of each upper-layer graph build; layer shrink factor):
  // a single definition each, so retuning one side cannot silently
  // hash-diverge the gate.
  private[queries] val hnswNprobe = 4
  private[queries] val hnswFanout = 8L

  private def layerEdgeCtes(lyr: Int): String = {
    val denom = math.pow(hnswFanout.toDouble, lyr.toDouble).toLong
    s"""l$lyr AS MATERIALIZED (
       |  SELECT rk.vec_id, rk.label FROM rk, cnt
       |  WHERE rk.r <= GREATEST(2, CAST(ceil(cnt.n / $denom.0) AS BIGINT))),
       |lev$lyr AS MATERIALIZED (
       |  SELECT ev.vec_id, ev.label, ev.i, ev.v FROM ev JOIN l$lyr USING (vec_id)),
       |cent$lyr AS (
       |  SELECT label, i, AVG(v) AS c FROM lev$lyr GROUP BY label, i),
       |qd$lyr AS (
       |  SELECT e.vec_id AS qid, c.label,
       |         SUM(e.v * c.c) AS dot,
       |         SUM(e.v * e.v) AS qq,
       |         SUM(c.c * c.c) AS cc
       |  FROM lev$lyr e JOIN cent$lyr c ON e.i = c.i
       |  GROUP BY e.vec_id, c.label),
       |pr$lyr AS (
       |  SELECT qid, label FROM (
       |    SELECT qid, label,
       |           ROW_NUMBER() OVER (PARTITION BY qid
       |             ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC, label) AS pr
       |    FROM qd$lyr)
       |  WHERE pr <= $hnswNprobe),
       |bd$lyr AS (
       |  SELECT p.qid, b.vec_id AS bid,
       |         SUM(qv.v * b.v) AS dot,
       |         SUM(qv.v * qv.v) AS qq,
       |         SUM(b.v * b.v) AS bb
       |  FROM pr$lyr p
       |  JOIN lev$lyr b ON b.label = p.label
       |  JOIN lev$lyr qv ON qv.vec_id = p.qid AND qv.i = b.i
       |  WHERE b.vec_id <> p.qid
       |  GROUP BY p.qid, b.vec_id),
       |ed$lyr AS (
       |  SELECT qid, bid FROM (
       |    SELECT qid, bid,
       |           ROW_NUMBER() OVER (PARTITION BY qid
       |             ORDER BY round(dot / (sqrt(qq) * sqrt(bb)), 6) DESC, bid) AS rank
       |    FROM bd$lyr)
       |  WHERE rank <= $hnswKUpper),
       |sed$lyr AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT qid AS src, bid AS dst FROM ed$lyr
       |    UNION ALL
       |    SELECT bid AS src, qid AS dst FROM ed$lyr))""".stripMargin
  }

  private def hnswOracleSql: String = {
    // The ladder indexes duplicate-class REPRESENTATIVES (min id per
    // bitwise-distinct vector): exact clones are the one degeneracy no
    // edge policy can route around (a kept clone at the query's own
    // position tie-dominates every other candidate — HnswSpec pins it),
    // so the graph tier dedups first, walks representatives with the
    // self-exclusion OFF (a query that IS a representative must
    // retrieve its own node), and expands clones at the end — exact,
    // because clones share every cosine.
    val ladder =
      s"""repg AS MATERIALIZED (
         |  SELECT embedding AS ek, MIN(vec_id) AS rep
         |  FROM embeddings GROUP BY embedding),
         |repm AS MATERIALIZED (
         |  SELECT e.vec_id, r.rep
         |  FROM embeddings e JOIN repg r ON e.embedding = r.ek),
         |rev AS MATERIALIZED (
         |  SELECT ev.vec_id, ev.label, ev.i, ev.v
         |  FROM ev JOIN repg g ON ev.vec_id = g.rep),
         |hs AS (
         |  SELECT vec_id,
         |         CAST(concat('0x', substr(md5(concat('hnsw:', CAST(vec_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
         |  FROM embeddings),
         |rk AS MATERIALIZED (
         |  SELECT e.vec_id, e.label,
         |         ROW_NUMBER() OVER (ORDER BY h.h, h.vec_id) AS r
         |  FROM embeddings e
         |  JOIN hs h USING (vec_id)
         |  JOIN repg g ON e.vec_id = g.rep),
         |cnt AS (SELECT COUNT(*) AS n FROM repg),
         |tent AS (SELECT vec_id AS bid FROM rk WHERE r <= 2)""".stripMargin
    val layers = (1 to hnswLayers).map(layerEdgeCtes).mkString(",\n")
    // Descent: top layer seeded by the global 2-entry start; each lower
    // layer seeded by the walk above (nested layers guarantee the seeds
    // are members); layer 0 = e21's full-width walk over the rep graph.
    val topSeed =
      s"""  SELECT DISTINCT q.qid, t.bid
         |  FROM (SELECT DISTINCT qid FROM q) q CROSS JOIN tent t""".stripMargin
    def downSeed(fromPrefix: String): String =
      s"""  SELECT qid, bid FROM ${fromPrefix}beam$hnswHopsUpper""".stripMargin
    val descent = (hnswLayers to 1 by -1).map { lyr =>
      val seed = if (lyr == hnswLayers) topSeed else downSeed(s"u${lyr + 1}")
      hopChain(s"u$lyr", s"sed$lyr", hnswHopsUpper, hnswBeamUpper, seed,
        selfFilter = false)
    }.mkString(",\n")
    val expansion =
      s"""exp AS (
         |  SELECT b.qid, m.vec_id AS bid, b.cosine
         |  FROM beam$beamHops b JOIN repm m ON m.rep = b.bid
         |  WHERE b.qid <> m.vec_id
         |)""".stripMargin
    s"""WITH $evCte,
       |$ladder,
       |$layers,
       |${corpusGraphCtes("rev")},
       |$panelCte,
       |$descent,
       |${hopChain("", "sedges", beamHops, beamWidthE21, downSeed("u1"), selfFilter = false)},
       |$expansion,
       |${recallTail("exp")}""".stripMargin
  }

  val hnswSearchGate: Query = Query(
    "e22_hnsw_search", hnswOracleSql) { (spark, d) =>
    import spark.implicits._
    val emb = embeddings(spark, d).select($"vec_id", $"label", $"embedding")
    // Duplicate-class collapse first (see the oracle note): the ladder
    // and every graph index REPRESENTATIVES; clones come back at the
    // end through the exact expansion.
    val repMap = graft.operators.Checkpoints.eager(
      graft.similarity.Ann.representatives(emb, "vec_id", "embedding"))._1
    // reps is referenced by the rank pass and EVERY layer build —
    // checkpoint once (eagerCounted also yields the n the layer sizes
    // need) instead of re-executing the emb⋈repMap join per reference
    // (optimization r17; guide §1.2 "don't compute things twice").
    val (reps, _, n) = graft.operators.Checkpoints.eagerCounted(
      emb.join(repMap.where($"vec_id" === $"rep").select($"vec_id"), "vec_id"))
    val ranks = graft.similarity.Ann.hnswRanks(reps, "vec_id")
    val ranked = graft.operators.Checkpoints.eager(reps.join(ranks, "vec_id"))._1
    // Upper-layer graphs are layer-sized (n/8^ℓ); each symmetrized edge
    // table is eagerly checkpointed so the hops consume a materialized
    // artifact (the presymmetrized contract), not a re-executed build.
    // The four builds (3 uppers + layer 0) are INDEPENDENT once
    // `ranked`/`reps` are materialized, and each uses a fraction of the
    // cores at bench scale — build them as concurrent Spark jobs (guide
    // §2.6 "overlap independent jobs": FIFO back-fill; results are the
    // checkpointed tables either way, bit-identical).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val upperF = (hnswLayers to 1 by -1).map { lyr =>
      Future {
        val members = ranked
          .filter($"hrank" <= graft.similarity.Ann.layerSize(n, lyr, hnswFanout))
          .select($"vec_id", $"label", $"embedding")
        graft.operators.Checkpoints.eager(
          graft.similarity.Ann.symmetrize(
            graft.similarity.Ann.knnGraph(
              members, "vec_id", "embedding", "label", k = hnswKUpper, nprobe = hnswNprobe)))._1
      }
    }
    // Layer 0: e21's degree-16 label graph shape, over representatives.
    val edges0F = Future {
      graft.operators.Checkpoints.eager(
        graft.similarity.Ann.symmetrize(
          graft.similarity.Ann.knnGraph(
            reps, "vec_id", "embedding", "label", k = 16, nprobe = graphNprobe)))._1
    }
    val uppers = upperF.map(Await.result(_, 10.minutes))
    val edges0 = Await.result(edges0F, 10.minutes)
    val corpus = emb.select($"vec_id", $"embedding")
    val panel = corpus.filter($"vec_id" < 10)
    val topEntries = ranks.filter($"hrank" <= 2).select($"vec_id".as("bid"))
    val walk = graft.similarity.Ann.hnswSearch(
      uppers :+ edges0, reps.select($"vec_id", $"embedding"), panel,
      "vec_id", "embedding", topEntries,
      beamUpper = hnswBeamUpper, hopsUpper = hnswHopsUpper,
      beamWidth = beamWidthE21, hops = beamHops, k = beamWidthE21,
      excludeSelf = false)
    val beam = graft.similarity.Ann.expandClones(walk, repMap, "vec_id", k = 5)
    beamWithRecall(spark, corpus, panel, beam)
  }

  /** Battery-shared HIERARCHICAL SERVING INDEX (e22b's prebuilt
    * artifact): the complete rep-ladder a graph-ANN server stores —
    * duplicate-class map, representative corpus, the symmetrized edge
    * table of EVERY ladder layer, and the global top entries — built
    * once per corpus and persisted as parquet tables. This is the
    * e17/e21b discipline applied to the hierarchical tier: the r16
    * serving leg re-derived the representative corpus (window over the
    * vector) and the ladder per walk — a join plan, not a stored index
    * — which shuffled 1.1 GB per query batch at ×100. Here every
    * derivation happens exactly once, at build time, and serving
    * consumes stored tables only.
    */
  private val hnswIndexMemo = scala.collection.concurrent.TrieMap[String, String]()

  private def sharedHnswIndex(
      spark: org.apache.spark.sql.SparkSession, d: String): String =
    hnswIndexMemo.getOrElseUpdate(
      s"$d|${graft.operators.Bucketing.suffix(spark, d)}", {
        val emb = embeddings(spark, d)
          .select(col("vec_id"), col("label"), col("embedding"))
        val dir = graft.TempDirs.create("graft-hnswindex-")
          .toFile.getAbsolutePath
        val repMap = graft.operators.Checkpoints.eager(
          graft.similarity.Ann.representatives(emb, "vec_id", "embedding"))._1
        repMap.write.mode("overwrite").parquet(s"$dir/repmap")
        emb.join(repMap.where(col("vec_id") === col("rep"))
          .select(col("vec_id")), "vec_id")
          .write.mode("overwrite").parquet(s"$dir/reps")
        val reps = spark.read.parquet(s"$dir/reps")
        val n = reps.count()
        val ranks = graft.similarity.Ann.hnswRanks(reps, "vec_id")
        val ranked = reps.join(ranks, "vec_id")
        (hnswLayers to 1 by -1).foreach { lyr =>
          val members = ranked
            .filter(col("hrank") <= graft.similarity.Ann.layerSize(n, lyr, hnswFanout))
            .select(col("vec_id"), col("label"), col("embedding"))
          graft.similarity.Ann.symmetrize(
            graft.similarity.Ann.knnGraph(
              members, "vec_id", "embedding", "label",
              k = hnswKUpper, nprobe = hnswNprobe))
            .write.mode("overwrite").parquet(s"$dir/layers/l$lyr")
        }
        graft.similarity.Ann.symmetrize(
          graft.similarity.Ann.knnGraph(
            reps, "vec_id", "embedding", "label", k = 16, nprobe = graphNprobe))
          .write.mode("overwrite").parquet(s"$dir/edges0")
        ranks.filter(col("hrank") <= 2).select(col("vec_id").as("bid"))
          .write.mode("overwrite").parquet(s"$dir/entries")
        dir
      })

  /** e22b — hierarchical ANN SERVING from the prebuilt rep-ladder
    * index: identical semantics (and the identical oracle SQL) to e22,
    * but the gate prices only what a server pays per query batch — the
    * layer descent + layer-0 walk over STORED symmetrized edge tables
    * (`presymmetrized` at every layer: zero corpus-sized shuffle per
    * hop), clone expansion against the STORED duplicate-class map, and
    * the exact-recall readout. Nothing representative-, ladder- or
    * graph-shaped is derived here: the four table families are read
    * back as written by [[sharedHnswIndex]]. e22 keeps pinning the
    * build chain; e22b pins that serving alone reproduces it
    * bit-for-bit from the persisted artifact — the build/serve split
    * the r16 verdict asked for (its measured gap: 11.7 s in-gate build
    * vs ~2 s serving at sf0.1, and 1.1 GB of per-walk re-derivation
    * shuffle at ×100 that the artifact eliminates).
    */
  val hnswServing: Query = Query(
    "e22b_hnsw_serving", hnswOracleSql) { (spark, d) =>
    import spark.implicits._
    val idx = sharedHnswIndex(spark, d)
    val repMap = spark.read.parquet(s"$idx/repmap")
    val repsCorpus = spark.read.parquet(s"$idx/reps")
      .select($"vec_id", $"embedding")
    val uppers = (hnswLayers to 1 by -1)
      .map(lyr => spark.read.parquet(s"$idx/layers/l$lyr"))
    val edges0 = spark.read.parquet(s"$idx/edges0")
    val entries = spark.read.parquet(s"$idx/entries")
    val corpus = embeddings(spark, d).select($"vec_id", $"embedding")
    val panel = corpus.filter($"vec_id" < 10)
    val walk = graft.similarity.Ann.hnswSearch(
      uppers :+ edges0, repsCorpus, panel,
      "vec_id", "embedding", entries,
      beamUpper = hnswBeamUpper, hopsUpper = hnswHopsUpper,
      beamWidth = beamWidthE21, hops = beamHops, k = beamWidthE21,
      excludeSelf = false)
    val beam = graft.similarity.Ann.expandClones(walk, repMap, "vec_id", k = 5)
    beamWithRecall(spark, corpus, panel, beam)
  }

  /** e24 — DIVERSIFIED (select-neighbors) GRAPH over a near-clone
    * corpus: the gate for [[graft.similarity.Ann.knnGraphDiverse]]
    * (HNSW's Algorithm-4 edge heuristic), which shipped spec-only in
    * round 16. The corpus is DERIVED from `embeddings`
    * deterministically ([[derivedFanCorpusSql]] / the Spark twin in
    * [[derivedFanCorpus]]): each base vector is mixed with its label's
    * anchor (`m = 0.5·a + 0.5·v` — labels become genuine clusters, the
    * navigation gradient the raw table lacks) and expanded to 8 fan
    * clones `m + (j/32)·rot1(m)` — tight jittered classes where a
    * plain top-k graph spends EVERY edge inside the 8-clone clique
    * (measured recall@5 0.00 on the 100-query panel — the cliques
    * disconnect the graph) while select-neighbors keeps one in-class
    * edge and spends the rest cross-class (recall 0.896 at the same
    * serve cost; DiverseProbe is the A/B). All derivation arithmetic
    * is IEEE double with one final cast to float, the expression tree
    * mirrored exactly in SQL, so both engines index the identical
    * corpus. The oracle replays candidate generation, the greedy
    * selection fold UNROLLED (step r keeps candidate rank r iff kept
    * count < keep and no kept neighbour is as close to it as the
    * query — `NOT EXISTS` over the pair-cosine table), symmetrization,
    * the 6-hop beam walk, and the exact-recall readout, all as static
    * SQL. Panel: 100 mid-range originals (away from the entry ids), so
    * recall measures navigation — 500 hit slots, the r16 verdict's
    * statistical-resolution discipline applied from birth.
    */
  private val divKCand = 24
  private val divKeep = 6
  private val divNprobe = 2
  private val divBeam = 24
  private val divHops = 6

  /** Spark side of the derived fan corpus (vec_id, label, embedding —
    * 8·min(bases,250) rows). Kept in lockstep with
    * [[derivedFanCorpusSql]]; [[graft.tools.DiverseProbe]] A/Bs both
    * graph arms over the same derivation.
    */
  private[graft] def derivedFanCorpus(emb: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val base = emb.where(col("vec_id") < 250)
      .select(col("vec_id"), col("label"), col("embedding"))
    val aw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("vec_id"))
    val anchors = base
      .withColumn("__r", row_number().over(aw)).filter(col("__r") === 1)
      .select(col("label"), col("embedding").as("__anc"))
    def mixAt(idx: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      lit(0.5) * element_at(col("__anc"), idx).cast("double") +
        lit(0.5) * element_at(col("embedding"), idx).cast("double")
    base.join(broadcast(anchors), "label")
      .withColumn("j", explode(sequence(lit(0), lit(7))))
      .select(
        (col("vec_id") * 8 + col("j")).as("vec_id"),
        col("label"),
        transform(col("embedding"), (x, i) =>
          (mixAt(i + 1) +
            (col("j").cast("double") / lit(32.0)) * mixAt((i + 1) % 64 + 1))
            .cast("float")).as("embedding"))
  }

  /** The derived corpus as exploded SQL — CTE `ev(vec_id, label, i, v)`
    * — mirroring [[derivedFanCorpus]]'s expression tree operation for
    * operation (same association order, double throughout, one cast to
    * REAL) so the values are bit-identical.
    */
  private def derivedFanCorpusSql: String =
    s"""anc AS (
       |  SELECT label, vec_id AS aid FROM (
       |    SELECT label, vec_id,
       |           ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) AS r
       |    FROM embeddings WHERE vec_id < 250)
       |  WHERE r = 1),
       |dbase AS MATERIALIZED (
       |  SELECT vec_id, label,
       |         generate_subscripts(embedding, 1) AS i,
       |         CAST(unnest(embedding) AS DOUBLE) AS vf
       |  FROM embeddings WHERE vec_id < 250),
       |mix AS MATERIALIZED (
       |  SELECT b.vec_id, b.label, b.i,
       |         CAST(0.5 AS DOUBLE) * ab.vf + CAST(0.5 AS DOUBLE) * b.vf AS m
       |  FROM dbase b
       |  JOIN anc a ON a.label = b.label
       |  JOIN dbase ab ON ab.vec_id = a.aid AND ab.i = b.i),
       |ev AS MATERIALIZED (
       |  SELECT m.vec_id * 8 + j.j AS vec_id, m.label, m.i,
       |         CAST(CAST(m.m + (CAST(j.j AS DOUBLE) / CAST(32.0 AS DOUBLE)) * s.m AS REAL) AS DOUBLE) AS v
       |  FROM mix m
       |  CROSS JOIN (SELECT unnest(range(0, 8)) AS j) j
       |  JOIN mix s ON s.vec_id = m.vec_id AND s.i = (m.i % 64) + 1)""".stripMargin

  /** Candidate generation + the UNROLLED greedy select-neighbors fold:
    * `dcand` is the IVF top-`divKCand` (with the 6-dp cosine carried),
    * `dpc` the pair cosines a domination check can touch (each
    * candidate vs every EARLIER-ranked candidate of the same query),
    * and `dk1..dkN` the fold — step r appends candidate rank r iff the
    * kept set is under `divKeep` and no kept neighbour has
    * `pcos >= cosine` (the strict "closer to the node than to every
    * kept neighbour" rule of [[graft.similarity.Ann.selectDiverse]]).
    */
  private def diverseSelectionSql: String = {
    val steps = (2 to divKCand).map { r =>
      s"""dk$r AS MATERIALIZED (
         |  SELECT qid, bid, cosine FROM dk${r - 1}
         |  UNION ALL
         |  SELECT c.qid, c.bid, c.cosine FROM dcand c
         |  WHERE c.rank = $r
         |    AND (SELECT COUNT(*) FROM dk${r - 1} p WHERE p.qid = c.qid) < $divKeep
         |    AND NOT EXISTS (
         |      SELECT 1 FROM dk${r - 1} p JOIN dpc ON dpc.ab = c.bid AND dpc.bb = p.bid
         |      WHERE p.qid = c.qid AND dpc.pcos >= c.cosine))""".stripMargin
    }.mkString(",\n")
    s"""dcent AS (SELECT label, i, AVG(v) AS c FROM ev GROUP BY label, i),
       |dqd AS (
       |  SELECT ev.vec_id AS qid, dcent.label,
       |         SUM(ev.v * dcent.c) AS dot,
       |         SUM(ev.v * ev.v) AS qq,
       |         SUM(dcent.c * dcent.c) AS cc
       |  FROM ev JOIN dcent ON ev.i = dcent.i
       |  GROUP BY qid, dcent.label),
       |dprobes AS (
       |  SELECT qid, label FROM (
       |    SELECT qid, label,
       |           ROW_NUMBER() OVER (PARTITION BY qid
       |             ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC, label) AS pr
       |    FROM dqd)
       |  WHERE pr <= $divNprobe),
       |dbd AS (
       |  SELECT p.qid, b.vec_id AS bid,
       |         SUM(qv.v * b.v) AS dot,
       |         SUM(qv.v * qv.v) AS qq,
       |         SUM(b.v * b.v) AS bb
       |  FROM dprobes p
       |  JOIN ev b ON b.label = p.label
       |  JOIN ev qv ON qv.vec_id = p.qid AND qv.i = b.i
       |  WHERE b.vec_id <> p.qid
       |  GROUP BY p.qid, b.vec_id),
       |dcand AS MATERIALIZED (
       |  SELECT qid, bid, rank, cosine FROM (
       |    SELECT qid, bid,
       |           ROW_NUMBER() OVER (PARTITION BY qid
       |             ORDER BY round(dot / (sqrt(qq) * sqrt(bb)), 6) DESC, bid) AS rank,
       |           round(dot / (sqrt(qq) * sqrt(bb)), 6) AS cosine
       |    FROM dbd)
       |  WHERE rank <= $divKCand),
       |dpair AS (SELECT DISTINCT a.bid AS ab, b.bid AS bb
       |  FROM dcand a JOIN dcand b ON a.qid = b.qid AND b.rank < a.rank),
       |dpc AS MATERIALIZED (
       |  SELECT p.ab, p.bb,
       |         round(SUM(x.v * y.v) / (sqrt(SUM(x.v * x.v)) * sqrt(SUM(y.v * y.v))), 6) AS pcos
       |  FROM dpair p
       |  JOIN ev x ON x.vec_id = p.ab
       |  JOIN ev y ON y.vec_id = p.bb AND y.i = x.i
       |  GROUP BY p.ab, p.bb),
       |dk1 AS (SELECT qid, bid, cosine FROM dcand WHERE rank = 1),
       |$steps,
       |dsedges AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT qid AS src, bid AS dst FROM dk$divKCand
       |    UNION ALL
       |    SELECT bid AS src, qid AS dst FROM dk$divKCand))""".stripMargin
  }

  private def diverseGraphOracleSql: String = {
    val ent =
      s"""ent AS (SELECT vec_id AS bid FROM (
         |  SELECT vec_id, ROW_NUMBER() OVER (
         |    PARTITION BY label ORDER BY vec_id) AS r
         |  FROM (SELECT DISTINCT vec_id, label FROM ev))
         |  WHERE r <= 2)""".stripMargin
    val panel =
      s"""q AS MATERIALIZED (
         |  SELECT vec_id AS qid, i, v FROM ev
         |  WHERE vec_id % 8 = 0 AND vec_id >= 800 AND vec_id < 1600)""".stripMargin
    val seed =
      s"""  SELECT DISTINCT q.qid, ent.bid
         |  FROM (SELECT DISTINCT qid FROM q) q CROSS JOIN ent
         |  WHERE q.qid <> ent.bid""".stripMargin
    s"""WITH $derivedFanCorpusSql,
       |$diverseSelectionSql,
       |$panel,
       |$ent,
       |${hopChain("", "dsedges", divHops, divBeam, seed)},
       |${recallTail(s"beam$divHops")}""".stripMargin
  }

  val diverseGraph: Query = Query(
    "e24_diverse_graph", diverseGraphOracleSql) { (spark, d) =>
    import spark.implicits._
    val der = graft.operators.Checkpoints.eager(
      derivedFanCorpus(embeddings(spark, d)))._1
    val g = graft.similarity.Ann.knnGraphDiverse(
      der, "vec_id", "embedding", "label",
      kCand = divKCand, keep = divKeep, nprobe = divNprobe)
    val sym = graft.operators.Checkpoints.eager(
      graft.similarity.Ann.symmetrize(g.select($"qid", $"bid")))._1
    val corpus = der.select($"vec_id", $"embedding")
    val panel = corpus.filter(
      $"vec_id" % 8 === 0 && $"vec_id" >= 800 && $"vec_id" < 1600)
    val beam = graft.similarity.Ann.beamSearchKnn(
      sym, corpus, panel, "vec_id", "embedding", entriesPerList(der, 2),
      beamWidth = divBeam, hops = divHops, k = 5, presymmetrized = true)
    beamWithRecall(spark, corpus, panel, beam)
  }

  /** e23 — HARD-NEGATIVE / TRIPLET MINING: the contrastive-training
    * data artifact (anchor, positive, hard negatives, margin). For each
    * panel query: the exact nearest SAME-label vector (the positive,
    * bucket-sized work via [[graft.similarity.Ann.bucketedTopK]]) and
    * the top-5 nearest OTHER-label vectors drawn from the 2 nearest
    * foreign coarse lists ([[graft.similarity.Ann.hardNegatives]] —
    * the "near but wrong class" candidates an embedding model trains
    * against), with `margin = pos_cosine − neg_cosine` (negative
    * margin = a violating triplet, the rows a trainer upweights).
    * Scale shape: broadcast centroids, probe set restricted to foreign
    * lists, candidates nprobe × (corpus/lists) per query, positive leg
    * bucket-sized — never corpus × corpus. Deterministic end-to-end,
    * oracle replays both legs + the margin in SQL.
    */
  val tripletMining = Query(
    "e23_hard_negatives",
    """WITH ev AS MATERIALIZED (
      |  SELECT vec_id, label,
      |         generate_subscripts(embedding, 1) AS i,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |),
      |cent AS (
      |  SELECT label, i, AVG(v) AS c FROM ev GROUP BY label, i
      |),
      |q AS (SELECT * FROM ev WHERE vec_id < 10),
      |qdots AS (
      |  SELECT q.vec_id AS qid, cent.label,
      |         SUM(q.v * cent.c) AS dot,
      |         SUM(q.v * q.v) AS qq,
      |         SUM(cent.c * cent.c) AS cc
      |  FROM q JOIN cent ON q.i = cent.i AND q.label <> cent.label
      |  GROUP BY qid, cent.label
      |),
      |probes AS (
      |  SELECT qid, label FROM (
      |    SELECT qid, label,
      |           ROW_NUMBER() OVER (PARTITION BY qid
      |             ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC, label) AS pr
      |    FROM qdots)
      |  WHERE pr <= 2
      |),
      |nbd AS (
      |  SELECT p.qid, b.vec_id AS bid, b.label AS neg_label,
      |         SUM(qv.v * b.v) AS dot,
      |         SUM(qv.v * qv.v) AS qq,
      |         SUM(b.v * b.v) AS bb
      |  FROM probes p
      |  JOIN ev b ON b.label = p.label
      |  JOIN q qv ON qv.vec_id = p.qid AND qv.i = b.i
      |  WHERE b.vec_id <> p.qid
      |  GROUP BY p.qid, b.vec_id, b.label
      |),
      |neg AS (
      |  SELECT qid, bid, neg_label,
      |         round(dot / (sqrt(qq) * sqrt(bb)), 6) AS neg_cosine,
      |         ROW_NUMBER() OVER (PARTITION BY qid
      |           ORDER BY round(dot / (sqrt(qq) * sqrt(bb)), 6) DESC, bid) AS rank
      |  FROM nbd
      |),
      |pdots AS (
      |  SELECT q.vec_id AS qid, b.vec_id AS bid,
      |         SUM(q.v * b.v) AS dot,
      |         SUM(q.v * q.v) AS qq,
      |         SUM(b.v * b.v) AS bb
      |  FROM q
      |  JOIN ev b ON b.i = q.i AND b.label = q.label
      |  WHERE b.vec_id <> q.vec_id
      |  GROUP BY q.vec_id, b.vec_id
      |),
      |pos AS (
      |  SELECT qid, bid AS pos_bid, cosine AS pos_cosine FROM (
      |    SELECT qid, bid,
      |           round(dot / (sqrt(qq) * sqrt(bb)), 6) AS cosine,
      |           ROW_NUMBER() OVER (PARTITION BY qid
      |             ORDER BY round(dot / (sqrt(qq) * sqrt(bb)), 6) DESC, bid) AS r
      |    FROM pdots)
      |  WHERE r = 1
      |)
      |SELECT n.qid, CAST(n.rank AS BIGINT) AS rank, n.bid, n.neg_label,
      |       n.neg_cosine, p.pos_bid, p.pos_cosine,
      |       round(p.pos_cosine - n.neg_cosine, 6) AS margin
      |FROM neg n JOIN pos p USING (qid)
      |WHERE n.rank <= 5
      |ORDER BY n.qid, n.rank""".stripMargin) { (spark, d) =>
    import spark.implicits._
    val emb = embeddings(spark, d).select($"vec_id", $"label", $"embedding")
    val panel = emb.filter($"vec_id" < 10)
    val neg = graft.similarity.Ann.hardNegatives(
      emb, panel, "vec_id", "embedding", "label", k = 5, nprobe = 2)
    val pos = graft.similarity.Ann.bucketedTopK(
      emb, panel, "vec_id", "embedding", "label", k = 1)
      .select($"qid", $"bid".as("pos_bid"), $"cosine".as("pos_cosine"))
    neg.join(pos, "qid")
      .select($"qid", $"rank".cast("long").as("rank"), $"bid",
        $"neg_list".as("neg_label"), $"cosine".as("neg_cosine"),
        $"pos_bid", $"pos_cosine",
        round($"pos_cosine" - $"cosine", 6).as("margin"))
      .orderBy($"qid", $"rank")
  }

  /** Battery-shared kNN-graph edge tables: m11b/m11c's operator under
    * test is the CLUSTERING — their graph INPUT is e19b/e19c's
    * operator, which those gates keep computing directly. Corpus×k
    * rows, so temp parquet ([[sharedUnsupLists]] rule). Deterministic
    * end-to-end; the m11 oracles replay the full graph chain in SQL.
    */
  private val graphMemo = scala.collection.concurrent.TrieMap[(String, String), String]()

  private def sharedGraph(
      spark: org.apache.spark.sql.SparkSession, d: String, variant: String)
      : org.apache.spark.sql.DataFrame = {
    val dKey = s"$d|${graft.operators.Bucketing.suffix(spark, d)}"
    val path = graphMemo.getOrElseUpdate((dKey, variant), {
      val emb = embeddings(spark, d)
      val inp = emb.select(col("vec_id"), col("embedding"))
        .join(sharedUnsupLists(spark, d, kmIters = 2), "vec_id")
      val g = variant match {
        case "learned" => graft.similarity.Ann
          .knnGraph(inp, "vec_id", "embedding", "list", k = 3, nprobe = 2)
        case _ => graft.similarity.Ann
          .knnGraphRebalanced(inp, "vec_id", "embedding", "list", k = 3, nprobe = 2,
            assertPasses = 1)
      }
      val dir = graft.TempDirs.create(s"graft-knngraph-$variant-").toFile
      g.write.mode("overwrite").parquet(dir.getAbsolutePath)
      dir.getAbsolutePath
    })
    spark.read.parquet(path)
  }

  /** Build every battery-shared memo this module owns (Bench warm-up
    * hook): the learned-list table, the 200-query exact-GT panel, both
    * PQ codebooks, the residual codebook, the servable rebalance pass,
    * and both kNN-graph edge tables. A budget-limited bench pass then
    * prices GATES, not memo construction — the round-12 driver
    * artifact's lone 420 s pass spent most of its 877 s on exactly
    * these builds. The list memo builds first (both graphs consume
    * it); the rest build CONCURRENTLY (independent keys, so no
    * duplicated getOrElseUpdate work; Spark schedules the jobs FIFO
    * across the shared local pool). Each build is individually
    * guarded: a broken memo must degrade its own gates, not kill the
    * bench.
    */
  def warmMemos(spark: org.apache.spark.sql.SparkSession, d: String): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def guarded(name: String)(build: => Any): Future[Unit] = Future {
      try { build; () }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] MEMO WARMUP FAILED sim/$name: ${e.getMessage}")
      }
    }
    Await.result(guarded("unsup-lists")(
      sharedUnsupLists(spark, d, kmIters = 2).count()), 30.minutes)
    Await.result(Future.sequence(Seq(
      guarded("exact-gt-panel")(exactTop1Panel(spark, d, 200).count()),
      guarded("pq-cents-full")(
        sharedCents(spark, d, dim = 64, m = 32, k = 16, iters = 4, sampleN = -1)),
      guarded("pq-cents-sampled")(
        sharedCents(spark, d, dim = 64, m = 32, k = 16, iters = 4, sampleN = 200)),
      guarded("residual-cents")(
        sharedResidual(spark, d, dim = 64, m = 32, k = 16, iters = 4, sampleN = 200)),
      guarded("rebalance-servable")(sharedRebalanceServable(spark, d)._1.count()),
      guarded("graph-learned")(sharedGraph(spark, d, "learned").count()),
      guarded("graph-rebalanced")(sharedGraph(spark, d, "rebalanced").count()),
      guarded("serving-graph")(sharedServingGraph(spark, d)),
      guarded("hnsw-index")(sharedHnswIndex(spark, d)))),
      30.minutes)
  }

  val all: Seq[Query] = Seq(
    knnBrute, labelCentroids, bucketedKnn, basketRules, ivfKnn, quantizedKnn, ivfBuild,
    pqTopK, pqRecall, ivfPq, pqSampledRecall, ivfPqRecall, unsupIvfPq, unsupRecall,
    residualIvfPq, residualRecall, packedIndex, indexLifecycle, knnGraphGate,
    knnGraphLearnedGate, knnGraphRebalancedGate, ivfRebalance, rebalanceServing, ivfRebalanceK, rebalanceProbe,
    knnComponentsLearned, knnComponentsRebalanced, semanticDecontam,
    graphBeamSearch, graphServing, hnswSearchGate, hnswServing, tripletMining,
    diverseGraph)
}

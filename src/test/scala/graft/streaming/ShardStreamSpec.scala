package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming twin of the t37 shard layout: arriving docs are dealt
  * round-robin to training shards incrementally, the accumulated
  * output is row-identical to the shared batch deal over the same
  * arrival prefix (across a restart and a crash-replayed batch), shard
  * sizes never diverge by more than one, and arrivals in t37's own
  * salted-md5 order reproduce the t37 batch layout exactly.
  */
class ShardStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 8

  private def docsAll = graft.Tables.documents(spark, sfDir)
    .select($"doc_id", $"source", $"text")

  private def runStream(drop: String, state: String, out: String,
                        ckpt: String): Unit = {
    val q = ShardStream.run(spark, drop, state, out, ckpt, K)
    try assert(q.awaitTermination(180000), "stream did not finish within 180 s")
    finally q.stop()
  }

  private def jsonl(slice: Seq[(Long, String, String)]): String =
    slice.toDF("doc_id", "source", "text")
      .select(to_json(struct($"doc_id", $"source", $"text"))).as[String]
      .collect().mkString("", "\n", "\n")

  test("stream over doc_id-ordered drops equals the batch deal across a restart") {
    val dir = Files.createTempDirectory("shardstream")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    val state = s"shardst_${dir.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")}"

    val docs = docsAll.orderBy($"doc_id").as[(Long, String, String)].collect()
    val cuts = Seq(0, docs.length / 3, 2 * docs.length / 3, docs.length)
    Files.writeString(drop.resolve("d1.jsonl"), jsonl(docs.slice(cuts(0), cuts(1)).toSeq))
    runStream(drop.toString, state, out, ckpt)
    Files.writeString(drop.resolve("d2.jsonl"), jsonl(docs.slice(cuts(1), cuts(2)).toSeq))
    Files.writeString(drop.resolve("d3.jsonl"), jsonl(docs.slice(cuts(2), cuts(3)).toSeq))
    runStream(drop.toString, state, out, ckpt)

    val got = ShardStream.results(spark, out).orderBy($"doc_id")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    val want = ShardStream.batchDeal(docsAll, K).orderBy($"doc_id")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got == want, "stream-dealt layout diverged from the batch deal")
    // round-robin balance: shard sizes within one of each other, and
    // every (shard, pos) slot is unique
    val sizes = got.groupBy(_._4).view.mapValues(_.size).values.toSeq
    assert(sizes.size == K && sizes.max - sizes.min <= 1, s"unbalanced: $sizes")
    val slots = got.map(r => (r._4, r._5))
    assert(slots.distinct.size == slots.size, "duplicate (shard, pos) slot")

    // MANIFEST equivalence (t39's streaming half): the delivery-
    // integrity manifest computed over the STREAM-dealt rows equals an
    // independent recompute over the batch deal — same counts, same
    // order-dependent Merkle digest per shard. A small block size makes
    // the test cross block boundaries (both digest levels exercised).
    val streamDealt = ShardStream.results(spark, out)
      .select($"doc_id", $"n_tokens", $"shard", $"pos_in_shard")
    val mGot = ShardStream.manifestOf(streamDealt, docsAll, blockSize = 16)
      .orderBy($"shard").as[(Long, Long, Long, String)].collect().toSeq
    val mWant = ShardStream.manifest(docsAll, K, blockSize = 16)
      .orderBy($"shard").as[(Long, Long, Long, String)].collect().toSeq
    assert(mGot == mWant, "stream manifest diverged from the batch recompute")
    assert(mGot.size == K && mGot.map(_._4).distinct.size == K)
  }

  test("replaying a micro-batch is idempotent after its state was written") {
    val dir = Files.createTempDirectory("shardreplay")
    val out = dir.resolve("out").toString
    val state = s"shardrp_${dir.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")}"
    val b0 = docsAll.where($"doc_id" < 100)
    val b1 = docsAll.where($"doc_id" >= 100 && $"doc_id" < 250)
    ShardStream.processBatch(b0, 0L, state, out, K)
    ShardStream.processBatch(b1, 1L, state, out, K)
    def snap() = spark.read.parquet(out)
      .select($"doc_id", $"shard", $"pos_in_shard").orderBy($"doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    val before = snap()
    ShardStream.processBatch(b1, 1L, state, out, K)
    assert(snap() == before, "replay changed the dealt layout")
    assert(spark.table(state).count() == 2)
  }

  test("arrivals in t37's salted-md5 order reproduce the t37 batch layout") {
    val dir = Files.createTempDirectory("shardt37")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    val state = s"shard37_${dir.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")}"

    // t37's layout on the frozen corpus; its global md5-rank is
    // recoverable as pos_in_shard * 8 + shard
    val t37 = graft.SparkEntry.queries("t37_corpus_shards")(spark, sfDir)
      .select($"doc_id", $"shard", $"pos_in_shard")
      .as[(Long, Long, Long)].collect()
    val origToRank = t37.map { case (id, sh, pos) => id -> (pos * 8 + sh) }.toMap
    val rankToOrig = origToRank.map(_.swap)

    // re-id the corpus so arrival (doc_id) order IS the md5 order
    val reId = docsAll.as[(Long, String, String)].collect()
      .map { case (id, src, text) => (origToRank(id) + 1, src, text) }
      .sortBy(_._1)
    val cuts = Seq(0, reId.length / 2, reId.length)
    cuts.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
      Files.writeString(drop.resolve(s"d$i.jsonl"), jsonl(reId.slice(a, b).toSeq))
    }
    runStream(drop.toString, state, out, ckpt)

    val got = ShardStream.results(spark, out)
      .select($"doc_id", $"shard", $"pos_in_shard")
      .as[(Long, Long, Long)].collect()
      .map { case (newId, sh, pos) => (rankToOrig(newId - 1), sh, pos) }
      .sortBy(_._1).toSeq
    assert(got == t37.sortBy(_._1).toSeq,
      "stream-dealt layout diverged from t37's batch layout")
  }

  // --- Merkle digest recursion ------------------------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Brute recursive Merkle over collected deal rows, replicating the
    * engine's GLOBAL level rule: the level count is decided once from
    * the corpus-wide max position, so every shard folds the same
    * number of times (equal-depth digests across shards).
    */
  private def bruteManifest(
      rows: Seq[(Long, Long, Long, String)], // (shard, pos, n_tokens, doc_md5)
      blockSize: Int): Map[Long, (Long, Long, String)] = {
    val maxPos = rows.map(_._2).max
    rows.groupBy(_._1).map { case (shard, rs) =>
      var hs: Seq[(Long, String)] = rs.sortBy(_._2)
        .groupBy(r => r._2 / blockSize).toSeq.sortBy(_._1)
        .map { case (blk, blkRows) =>
          (blk, md5hex(blkRows.sortBy(_._2).map(_._4).mkString))
        }
      var groups = maxPos / blockSize + 1L
      while (groups > blockSize) {
        hs = hs.groupBy(h => h._1 / blockSize).toSeq.sortBy(_._1)
          .map { case (blk2, bs) =>
            (blk2, md5hex(bs.sortBy(_._1).map(_._2).mkString))
          }
        groups = (groups - 1L) / blockSize + 1L
      }
      shard -> (rs.size.toLong, rs.map(_._3).sum, md5hex(hs.sortBy(_._1).map(_._2).mkString))
    }
  }

  private def dealRows: Seq[(Long, Long, Long, String)] =
    ShardStream.batchDeal(docsAll, K)
      .join(docsAll.select($"doc_id", md5($"text").as("dh")), "doc_id")
      .select($"shard", $"pos_in_shard", $"n_tokens", $"dh")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("manifest recursion bounds every fold: >=3 digest levels match the brute Merkle") {
    val rows = dealRows
    // blockSize 2 on ~60 docs/shard forces the while loop several
    // times: 32 block hashes -> 16 -> 8 -> 4 -> 2 before the final fold
    assert(rows.map(_._2).max / 2 + 1 > 2, "corpus too small to force recursion")
    val got = ShardStream.manifestOf(ShardStream.batchDeal(docsAll, K), docsAll,
      blockSize = 2)
      .orderBy($"shard").as[(Long, Long, Long, String)].collect().toSeq
    val want = bruteManifest(rows, 2)
    assert(got.size == K)
    got.foreach { case (sh, n, t, m) =>
      val (wn, wt, wm) = want(sh)
      assert((n, t, m) == (wn, wt, wm), s"shard $sh: got ($n,$t,$m) want ($wn,$wt,$wm)")
    }
  }

  test("one-block-level corpora keep the original two-level digest byte-identical") {
    // blockSize 1024 >> blocks/shard: the recursion must not fire and
    // the digest must equal the direct two-level fold (the frozen t39
    // oracle's shape) — per-doc md5 -> one block hash -> shard hash
    val rows = dealRows
    val got = ShardStream.manifestOf(ShardStream.batchDeal(docsAll, K), docsAll,
      blockSize = 1024)
      .orderBy($"shard").as[(Long, Long, Long, String)].collect().toSeq
    val want = rows.groupBy(_._1).map { case (shard, rs) =>
      val blockHash = md5hex(rs.sortBy(_._2).map(_._4).mkString)
      shard -> (rs.size.toLong, rs.map(_._3).sum, md5hex(blockHash))
    }
    got.foreach { case (sh, n, t, m) =>
      assert((n, t, m) == want(sh), s"shard $sh two-level digest changed")
    }
  }
}

package graft.dedup

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests: connected components vs an in-memory union-find on
  * random graphs; chunking reassembles to the original token stream;
  * dedupLatestAgg ≡ dedupLatest window under a total order.
  */
class DedupPropertySpec extends SparkSpec {

  private def forAllSamples[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(777L + i)).get)
    }

  import spark.implicits._

  test("Components property: equals union-find on random graphs") {
    val gen = for {
      n <- Gen.choose(2, 40)
      nEdges <- Gen.choose(0, 60)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L) if a != b
      } yield (a, b))
    } yield (n, edges)
    forAllSamples(gen) { case (n, edges) =>
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n.toInt).map(v => v.toLong -> find(v).toLong).toMap
      val vs = (0L until n).toDF("id")
      val es = if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("a", "b") else edges.toDF("a", "b")
      val got = Components.connectedComponents(vs, "id", es, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected)
      // the O(log n) contraction must agree with label propagation
      val got2 = Components.largeSmallStar(vs, "id", es, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got2 === expected, "largeSmallStar diverged from union-find")
    }
  }

  test("largeSmallStar: deep chain resolves (the case that costs label propagation)") {
    val n = 200
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val got = Components.largeSmallStar(
      (0L until n).toDF("id"), "id", chain.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(1)).distinct
    assert(got === Array(0L), "one component rooted at 0")
  }

  test("chunk property: stripping the overlap reassembles the token stream") {
    val word = Gen.choose('a', 'z').map(_.toString)
    val gen = for {
      nTok <- Gen.choose(1, 120)
      toks <- Gen.listOfN(nTok, word)
      chunkTokens <- Gen.choose(2, 20)
      overlap <- Gen.choose(0, 1).map(o => math.min(o * (chunkTokens - 1), chunkTokens - 1))
    } yield (toks, chunkTokens, overlap)
    forAllSamples(gen) { case (toks, chunkTokens, overlap) =>
      val text = toks.mkString(" ")
      val chunks = graft.text.TextOps
        .chunk(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", chunkTokens, overlap)
        .orderBy($"chunk_idx")
        .collect().map(r => (r.getString(2), r.getLong(3)))
      // every chunk's token count matches its text; overlap-stripped
      // concatenation equals the original token stream
      chunks.foreach { case (t, n) => assert(t.split(" ", -1).length === n) }
      val reassembled = chunks.zipWithIndex.flatMap { case ((t, _), i) =>
        val ts = t.split(" ", -1).toSeq
        if (i == 0) ts else ts.drop(overlap)
      }
      assert(reassembled === toks, s"chunk=$chunkTokens overlap=$overlap")
    }
  }

  test("dedupLatestAgg property: identical winners to the window under a total order") {
    import org.apache.spark.sql.functions._
    val gen = for {
      nKeys <- Gen.choose(1, 15)
      nRows <- Gen.choose(1, 80)
      rows <- Gen.listOfN(nRows, for {
        k <- Gen.choose(1, nKeys)
        item <- Gen.oneOf("A", "B")
        tsOff <- Gen.choose(0, 5) // deliberate timestamp collisions
        price <- Gen.choose(1, 9)
      } yield (k.toString, item, java.sql.Timestamp.valueOf(s"2025-07-0${1 + tsOff} 10:00:00"),
        price.toDouble))
    } yield rows
    forAllSamples(gen) { rows =>
      // unique (mods) column makes the order total even on ts+price ties
      val df = rows.zipWithIndex.map { case ((k, i, ts, p), idx) => (k, i, ts, p, s"m$idx") }
        .toDF("receipt_number", "item_name", "shifted_time", "price", "modifiers")
      val w = graft.pos.Analytics
        .dedupLatest(df, Seq(col("price").desc, col("modifiers").desc))
        .select("receipt_number", "item_name", "modifiers")
        .collect().map(_.toSeq).toSet
      val a = graft.pos.Analytics
        .dedupLatestAgg(df, Seq(col("price"), col("modifiers")))
        .select("receipt_number", "item_name", "modifiers")
        .collect().map(_.toSeq).toSet
      assert(a === w)
    }
  }
}

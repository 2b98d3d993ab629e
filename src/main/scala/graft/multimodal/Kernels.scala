package graft.multimodal

/** Batch-in / batch-out model-inference kernels for the multimodal
  * feature pass (the accelerator contract a training-data pipeline
  * would call: decode → preprocess → model forward, one device round
  * trip per mini-batch).
  *
  * [[IntMlpKernel]] is a GENUINE model forward pass — a 2-layer
  * integer-weight MLP (fold → dense → ReLU → dense) over the decoded
  * raster — not a stand-in: it exercises real inference structure
  * (weights, activation, logits) while integer arithmetic keeps the
  * output bit-exact in any engine, which is what lets the mm6 gate
  * hash-verify a model forward pass against a SQL oracle (the same
  * trick as the e6 quantized ANN). [[StubKernel]] remains the
  * deterministic test double for batch-shape specs.
  */
trait InferenceKernel extends Serializable {
  def name: String

  /** Output vector width (logits per asset). */
  def outDim: Int

  /** Run the model over one mini-batch of raw payloads. One call per
    * batch — the whole batch crosses the "device" boundary at once —
    * and `None` per element that fails to decode (a corrupt asset must
    * not kill the batch).
    */
  def infer(batch: IndexedSeq[Array[Byte]]): IndexedSeq[Option[Array[Long]]]
}

/** Real 2-layer MLP with fixed integer weights over PNG rasters:
  *
  *  1. decode: full inflate + unfilter via [[ImageCodec.decodePng]]
  *  2. fold: raster (row-major) → `inDim` integer sums,
  *     `x(j) = Σ px(i) for i ≡ j (mod inDim)`
  *  3. hidden: `a(k) = ReLU(Σ_j w1(k,j)·x(j))`, `w1(k,j) = (31k+17j) mod 13 − 6`
  *  4. logits: `y(o) = Σ_k w2(o,k)·a(k)`, `w2(o,k) = (7o+5k) mod 11 − 5`
  *
  * Weight formulas are closed-form so the oracle reproduces the exact
  * same forward pass in SQL. Magnitudes are sized for exact int64:
  * x(j) ≤ 961·255, |layer1| ≤ 16·6·245k ≈ 2.4e7, |logit| ≤ 8·5·2.4e7
  * ≈ 9.4e8 — no overflow anywhere.
  */
object IntMlpKernel extends InferenceKernel {
  val inDim = 16
  val hidden = 8
  override val outDim = 4
  override val name = "int-mlp-16x8x4"

  private[multimodal] def w1(k: Int, j: Int): Long = (k * 31 + j * 17) % 13 - 6
  private[multimodal] def w2(o: Int, k: Int): Long = (o * 7 + k * 5) % 11 - 5

  override def infer(batch: IndexedSeq[Array[Byte]]): IndexedSeq[Option[Array[Long]]] = {
    // Batched forward: decode + fold each asset into one row of an
    // input matrix, then both dense layers run over the whole batch
    // (the matrix-matrix shape an accelerator kernel would see).
    val folded = batch.map { bytes =>
      ImageCodec.decodePng(bytes).map { case (_, px) =>
        val x = new Array[Long](inDim)
        var i = 0
        while (i < px.length) {
          x(i % inDim) += px(i) & 0xff
          i += 1
        }
        x
      }
    }
    folded.map(_.map { x =>
      val a = Array.tabulate(hidden) { k =>
        var s = 0L
        var j = 0
        while (j < inDim) { s += w1(k, j) * x(j); j += 1 }
        math.max(s, 0L) // ReLU
      }
      Array.tabulate(outDim) { o =>
        var s = 0L
        var k = 0
        while (k < hidden) { s += w2(o, k) * a(k); k += 1 }
        s
      }
    })
  }
}

/** Deterministic fake (byte-fold sums, no decode, never fails) — the
  * test double for batch-boundary specs and the fallback when payloads
  * are not rasters.
  */
object StubKernel extends InferenceKernel {
  override val outDim = 4
  override val name = "stub-bytefold"
  override def infer(batch: IndexedSeq[Array[Byte]]): IndexedSeq[Option[Array[Long]]] =
    batch.map { bytes =>
      val acc = new Array[Long](outDim)
      var i = 0
      while (i < bytes.length) {
        acc(i % outDim) += bytes(i) & 0xff
        i += 1
      }
      Some(acc)
    }
}

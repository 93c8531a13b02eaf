package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ONNX Runtime adapter (Images.OnnxScorer) against a stub session:
  * the onnxruntime jar is absent from this build by design, so these
  * tests pin everything ABOVE the SessionLike seam — tensor shape
  * inference, logit-count validation, lazy one-session-per-instance
  * reuse (the appV2.py:149 amortization contract), serializability of
  * the factory, and the fail-fast error when the runtime jar is
  * missing. */
/** Echo stub: asserts the wire shape and returns strided sums so the
  * test can verify the tensor actually reached the session. File-scoped
  * (not an inner class) so closures capturing it stay serializable. */
private class StubSession(nTags: Int, built: AtomicInteger)
    extends Images.OnnxScorer.SessionLike {
  built.incrementAndGet()
  val calls = new AtomicInteger
  def run(chw: Array[Float], shape: Array[Long]): Array[Float] = {
    calls.incrementAndGet()
    assert(shape.length == 4 && shape(0) == 1L && shape(1) == 3L,
      s"expected [1,3,S,S], got ${shape.toSeq}")
    assert(shape(2) == shape(3), "non-square spatial dims")
    assert(chw.length == 3 * shape(2) * shape(3), "tensor/shape mismatch")
    Array.tabulate(nTags)(i => chw(i % chw.length) + i)
  }
}

class OnnxScorerSpec extends AnyFunSuite {

  test("score infers [1,3,S,S] from the flat CHW tensor and returns the model row") {
    val built = new AtomicInteger
    val scorer = new Images.OnnxScorer(5, () => new StubSession(5, built))
    val side = 4
    val tensor = Array.tabulate(3 * side * side)(_.toFloat / 10f)
    val logits = scorer.score(tensor)
    assert(logits.length == 5)
    assert(logits(0) == tensor(0) + 0 && logits(3) == tensor(3) + 3)
  }

  test("one session per scorer instance, reused across calls (appV2.py:149)") {
    val built = new AtomicInteger
    val scorer = new Images.OnnxScorer(2, () => new StubSession(2, built))
    val t = new Array[Float](3 * 2 * 2)
    scorer.score(t); scorer.score(t); scorer.score(t)
    assert(built.get() == 1, s"session constructed ${built.get()} times for 3 calls")
  }

  test("rejects non-square / non-CHW tensors and wrong logit counts") {
    val built = new AtomicInteger
    val scorer = new Images.OnnxScorer(4, () => new StubSession(4, built))
    intercept[IllegalArgumentException] { scorer.score(new Array[Float](7)) }
    // stub emits 3 logits but the vocabulary expects 4
    val mismatched = new Images.OnnxScorer(4, () => new StubSession(3, built))
    intercept[IllegalArgumentException] { mismatched.score(new Array[Float](3 * 2 * 2)) }
  }

  test("missing onnxruntime jar fails fast with an actionable message") {
    // the API stubs sit on the test classpath under ai.onnxruntime, so
    // the absent-runtime path is exercised through the package seam
    val scorer = Images.OnnxScorer.fromModelInPackage(
      "/nonexistent/model.onnx", nTags = 3, preferGpu = true,
      pkg = "ai.onnxruntime.absent")
    val e = intercept[IllegalStateException] { scorer.score(new Array[Float](3 * 2 * 2)) }
    assert(e.getMessage.contains("onnxruntime not on classpath"))
    assert(e.getCause.isInstanceOf[ClassNotFoundException])
  }

  // ---- reflective binding vs the compile-checked ai.onnxruntime API ----
  // (test-scope stubs mirroring the published Java API signatures: every
  // Class.forName string and getMethod signature in ReflectiveSession
  // resolves against real class files below, and the whole chain —
  // getEnvironment → SessionOptions → addCUDA fallback → createSession →
  // introspected I/O names → createTensor → run → Result.get →
  // getValue → close — actually EXECUTES.)

  private def fakeModelFile(): String = {
    val f = java.io.File.createTempFile("model", ".onnx")
    java.nio.file.Files.write(f.toPath, Array[Byte](0x08, 0x01))
    f.deleteOnExit()
    f.getAbsolutePath
  }

  test("reflective session runs end-to-end against the API stubs (every reflected member resolves)") {
    val before = ai.onnxruntime.OrtSession.SESSIONS_BUILT.get()
    val cudaBefore = ai.onnxruntime.OrtSession.CUDA_REQUESTS.get()
    val scorer = Images.OnnxScorer.fromModel(fakeModelFile(), nTags = 4)
    val side = 4
    val tensor = Array.tabulate(3 * side * side)(_.toFloat)
    val logits = scorer.score(tensor)
    // the stub "model" emits strided sums of the input tensor: proves the
    // tensor crossed createTensor→run intact and came back via getValue
    val want = Array.tabulate(4)(k =>
      tensor.indices.filter(_ % 4 == k).map(tensor).sum)
    assert(logits.toSeq == want.toSeq)
    // one session across repeated calls (appV2.py:149 amortization)
    scorer.score(tensor)
    assert(ai.onnxruntime.OrtSession.SESSIONS_BUILT.get() == before + 1)
    // provider preference attempted, CUDA failure fell back silently
    assert(ai.onnxruntime.OrtSession.CUDA_REQUESTS.get() == cudaBefore + 1)
  }

  test("input name is introspected from the model, never hardcoded") {
    val scorer = Images.OnnxScorer.fromModel(fakeModelFile(), nTags = 4)
    // the stub session only accepts its own introspected name
    // ('pixel_values'); a hardcoded 'input' would throw inside run()
    assert(scorer.score(new Array[Float](3 * 2 * 2)).length == 4)
  }

  test("bad model path surfaces the runtime's own error, not a reflection wrapper") {
    val scorer = Images.OnnxScorer.fromModel("/nonexistent/model.onnx", nTags = 3)
    val e = intercept[IllegalStateException] { scorer.score(new Array[Float](3 * 2 * 2)) }
    assert(e.getMessage.contains("onnx session construction failed"))
    assert(e.getCause.isInstanceOf[ai.onnxruntime.OrtException])
  }

  test("adapter rides the full scoreImages pipeline (stub session, error isolation intact)") {
    val spark = SparkSpec.spark
    val dir = java.nio.file.Files.createTempDirectory("onnx_spec").toFile
    try {
      val img = new java.awt.image.BufferedImage(6, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 6).foreach(x => (0 until 4).foreach(y =>
        img.setRGB(x, y, (x * 40 << 16) | (y * 60 << 8) | 0x20)))
      javax.imageio.ImageIO.write(img, "png", new java.io.File(dir, "a.png"))
      java.nio.file.Files.write(new java.io.File(dir, "bad.png").toPath,
        Array[Byte](1, 2, 3))
      val built = new AtomicInteger
      val scorer = new Images.OnnxScorer(4, () => new StubSession(4, built))
      val out = Images.scoreImages(Images.source(spark, dir.getAbsolutePath), scorer,
        targetSize = 8).collect()
      assert(out.length == 2)
      val ok = out.filter(_.getString(2) == "ok")
      assert(ok.length == 1 && ok.head.getSeq[Float](1).length == 4)
      assert(out.exists(r => r.getString(2).startsWith("error:")))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}

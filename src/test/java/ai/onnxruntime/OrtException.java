package ai.onnxruntime;

/**
 * TEST-SCOPE STUB of the public ONNX Runtime Java API (the runtime jar
 * cannot ship in this offline build — no new libraryDependencies). The
 * stub mirrors the published signatures of the classes/methods
 * Images.OnnxScorer resolves by reflection, so OnnxScorerSpec
 * compile-checks and EXECUTES the reflective binding end-to-end instead
 * of trusting stringly-typed method names. Signatures follow the public
 * onnxruntime Java API documentation (ai.onnxruntime package,
 * Apache-2.0); no implementation code is derived from it.
 */
public class OrtException extends Exception {
  public OrtException(String message) {
    super(message);
  }
}

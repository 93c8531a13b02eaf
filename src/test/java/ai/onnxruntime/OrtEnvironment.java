package ai.onnxruntime;

import java.io.File;

/** TEST-SCOPE STUB — see OrtException for the why. Mirrors the public
 * {@code OrtEnvironment} members the adapter reflects: the
 * {@code getEnvironment()} singleton accessor and
 * {@code createSession(String, OrtSession.SessionOptions)}. The stub
 * "session" behaves like the real one at the contract level the adapter
 * depends on: a missing model file fails session construction, and
 * input/output names come from the (fake) model, not from constants. */
public final class OrtEnvironment implements AutoCloseable {

  private static final OrtEnvironment INSTANCE = new OrtEnvironment();

  private OrtEnvironment() {}

  public static OrtEnvironment getEnvironment() {
    return INSTANCE;
  }

  public OrtSession createSession(String modelPath, OrtSession.SessionOptions options)
      throws OrtException {
    if (!new File(modelPath).isFile()) {
      throw new OrtException("Load model from " + modelPath + " failed: no such file");
    }
    return new OrtSession(modelPath);
  }

  @Override
  public void close() {}
}

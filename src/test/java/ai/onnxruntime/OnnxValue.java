package ai.onnxruntime;

/** TEST-SCOPE STUB — see OrtException for the why. Mirrors the public
 * {@code OnnxValue} surface the adapter touches: {@code getValue()} and
 * {@code close()}. */
public interface OnnxValue extends AutoCloseable {
  Object getValue() throws OrtException;

  @Override
  void close();
}

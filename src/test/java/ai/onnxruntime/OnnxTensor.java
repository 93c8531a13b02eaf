package ai.onnxruntime;

import java.nio.FloatBuffer;
import java.util.Arrays;

/** TEST-SCOPE STUB — see OrtException for the why. Mirrors the public
 * {@code OnnxTensor} members the adapter reflects: the static
 * {@code createTensor(OrtEnvironment, FloatBuffer, long[])} factory and
 * {@code close()}. Shape validation matches the real factory's contract
 * (element count must equal the shape product). */
public final class OnnxTensor implements OnnxValue {

  private final float[] data;
  private final long[] shape;
  private boolean closed = false;

  private OnnxTensor(float[] data, long[] shape) {
    this.data = data;
    this.shape = shape;
  }

  public static OnnxTensor createTensor(OrtEnvironment env, FloatBuffer data, long[] shape)
      throws OrtException {
    long n = 1;
    for (long d : shape) {
      n *= d;
    }
    if (env == null || data.remaining() != n) {
      throw new OrtException("shape " + Arrays.toString(shape)
          + " does not match buffer of " + data.remaining() + " floats");
    }
    float[] copy = new float[data.remaining()];
    data.duplicate().get(copy);
    return new OnnxTensor(copy, shape.clone());
  }

  float[] data() {
    if (closed) {
      throw new IllegalStateException("tensor used after close()");
    }
    return data;
  }

  public long[] getShape() {
    return shape.clone();
  }

  @Override
  public Object getValue() {
    return data.clone();
  }

  @Override
  public void close() {
    closed = true;
  }
}

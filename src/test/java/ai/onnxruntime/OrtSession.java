package ai.onnxruntime;

import java.util.Collections;
import java.util.LinkedHashSet;
import java.util.Map;
import java.util.Optional;
import java.util.Set;
import java.util.concurrent.atomic.AtomicInteger;

/** TEST-SCOPE STUB — see OrtException for the why. Mirrors the public
 * {@code OrtSession} surface the adapter reflects ({@code getInputNames},
 * {@code getOutputNames}, {@code run(Map)}) plus the nested
 * {@code SessionOptions} (with {@code addCUDA()}) and {@code Result}
 * ({@code get(String)} returning {@code Optional<OnnxValue>},
 * {@code close()}) types.
 *
 * The fake "model" is fixed-function: given one float tensor input of
 * shape [1,3,S,S], the single output is a [1,4] row of strided sums of
 * the input — enough for a spec to verify the tensor crossed the wire
 * intact and came back through {@code OnnxValue.getValue()}. */
public final class OrtSession implements AutoCloseable {

  /** Test observability: how many sessions were constructed (the
   * one-session-per-scorer amortization contract). */
  public static final AtomicInteger SESSIONS_BUILT = new AtomicInteger();

  /** Whether addCUDA() was invoked on the options of the last-built
   * session's environment (provider-preference observability). */
  public static final AtomicInteger CUDA_REQUESTS = new AtomicInteger();

  OrtSession(String modelPath) {
    SESSIONS_BUILT.incrementAndGet();
  }

  public Set<String> getInputNames() {
    Set<String> s = new LinkedHashSet<>();
    s.add("pixel_values"); // introspected, never hardcoded by the adapter
    return s;
  }

  public Set<String> getOutputNames() {
    Set<String> s = new LinkedHashSet<>();
    s.add("logits");
    return s;
  }

  public Result run(Map<String, ?> inputs) throws OrtException {
    Object t = inputs.get("pixel_values");
    if (!(t instanceof OnnxTensor)) {
      throw new OrtException("missing/untyped input 'pixel_values': " + inputs.keySet());
    }
    float[] data = ((OnnxTensor) t).data();
    float[] out = new float[4];
    for (int i = 0; i < data.length; i++) {
      out[i % 4] += data[i];
    }
    return new Result(Collections.singletonMap("logits",
        (OnnxValue) new StubValue(new float[][] {out})));
  }

  @Override
  public void close() {}

  /** Mirrors the real public nested options type; only the members the
   * adapter reflects are present. */
  public static final class SessionOptions implements AutoCloseable {
    public SessionOptions() {}

    public void addCUDA() throws OrtException {
      CUDA_REQUESTS.incrementAndGet();
      // mirror the sandbox reality the adapter's fallback handles: no
      // CUDA EP in a CPU-only environment
      throw new OrtException("CUDA execution provider is not available");
    }

    @Override
    public void close() {}
  }

  /** Mirrors the real public nested result type. */
  public static final class Result implements AutoCloseable {
    private final Map<String, OnnxValue> values;
    private boolean closed = false;

    Result(Map<String, OnnxValue> values) {
      this.values = values;
    }

    public Optional<OnnxValue> get(String name) {
      if (closed) {
        throw new IllegalStateException("result used after close()");
      }
      return Optional.ofNullable(values.get(name));
    }

    @Override
    public void close() {
      closed = true;
    }
  }

  /** Public like the real OnnxTensor the runtime returns — the adapter
   * invokes {@code getValue()} via {@code getClass().getMethod}, which
   * requires the runtime class itself to be accessible. */
  public static final class StubValue implements OnnxValue {
    private final float[][] rows;

    StubValue(float[][] rows) {
      this.rows = rows;
    }

    @Override
    public Object getValue() {
      return rows;
    }

    @Override
    public void close() {}
  }
}

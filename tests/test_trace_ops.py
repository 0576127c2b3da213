"""trace_ops parses a jax.profiler Chrome-trace capture and attributes
op time (the attribution half of the profiling story, SURVEY.md §5)."""

import jax
import jax.numpy as jnp

from n2nmn_tpu.tools.trace_ops import summarize, categorize


def test_trace_ops_summarizes_capture(tmp_path):
    x = jnp.ones((256, 256))
    f = jax.jit(lambda a: a @ a + 1.0)
    f(x).block_until_ready()
    jax.profiler.start_trace(str(tmp_path))
    for _ in range(3):
        f(x).block_until_ready()
    jax.profiler.stop_trace()

    # this CPU backend records only the host plane; device view is empty
    # but must parse, host view must show the matmul
    host = summarize(str(tmp_path), host=True)
    assert host["total_op_s"] > 0
    assert any("dot" in op["name"] for op in host["top_ops"])
    dev = summarize(str(tmp_path), host=False)
    assert dev["total_op_s"] >= 0


def test_categorize_buckets():
    assert categorize("fusion.123") == "fusion"
    assert categorize("dot_general.1") == "dot/matmul"
    assert categorize("dynamic-update-slice.4") == "scatter/gather"
    assert categorize("%convolution.8") == "convolution"
    assert categorize("weird-op") == "other"

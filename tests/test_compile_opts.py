"""utils/compile_opts: TPU-only serving compiler options must be inert on
CPU (tests, multichip dryrun) and well-formed for TPU devices."""

import jax
import jax.numpy as jnp

from step_tpu.utils.compile_opts import (
    SERVING_VMEM_LIMIT_KIB,
    compile_with_serving_options,
    serving_compiler_options,
)


def test_options_none_on_cpu():
    assert serving_compiler_options(jax.devices()[0]) is None


def test_compile_passthrough_on_cpu():
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((4,))
    g, applied = compile_with_serving_options(f, x)
    assert g is f  # unchanged: stays lazily-specializing on CPU
    assert applied is None  # not applicable here — distinct from rejected
    assert jnp.allclose(g(x), 2.0)


def test_options_shape_for_tpu_device():
    class FakeTpu:
        platform = "tpu"

    opts = serving_compiler_options(FakeTpu())
    assert opts == {
        "xla_tpu_scoped_vmem_limit_kib": str(SERVING_VMEM_LIMIT_KIB)
    }
    # the relay-tunneled device stringifies as "TPU v5 lite0" with a
    # non-"tpu" platform attribute — the string fallback must catch it
    class FakeRelay:
        platform = "axon"

        def __str__(self):
            return "TPU v5 lite0"

    assert serving_compiler_options(FakeRelay()) == opts

"""Native IQ packer (native/pack.cpp) vs the numpy reference: exactness
(incl. bfloat16 round-to-nearest-even and NaN quieting, ml_dtypes
parity) and the ops.xfer integration fallback contract."""

import numpy as np
import pytest

from lora_tpu import native
from lora_tpu.ops.xfer import pack_iq

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native host library unavailable"
)


def _ref(x, dtype=np.float32):
    return np.stack([x.real.astype(dtype), x.imag.astype(dtype)], axis=-2)


@pytest.mark.parametrize("shape", [(64,), (3, 1000), (2, 4, 129)])
def test_pack_f32_bit_exact(shape):
    rng = np.random.default_rng(hash(shape) % 2**31)
    x = (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(
        np.complex64
    )
    out = native.pack_iq_native(x)
    assert out is not None
    np.testing.assert_array_equal(out, _ref(x))


def test_pack_bf16_matches_ml_dtypes():
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    x = (rng.normal(size=4096) + 1j * rng.normal(size=4096)).astype(
        np.complex64
    )
    # rounding edge cases + NaN quieting
    x[0] = complex(np.float32("nan"), np.float32("inf"))
    x[1] = complex(1.0 + 2**-9, -(1.0 + 3 * 2**-9))  # RNE ties
    out = native.pack_iq_native(x, jnp.bfloat16)
    ref = _ref(x, jnp.bfloat16)
    assert out.dtype == ref.dtype
    np.testing.assert_array_equal(out.view(np.uint16), ref.view(np.uint16))


def test_xfer_pack_iq_uses_native_and_matches():
    rng = np.random.default_rng(9)
    x = (rng.normal(size=(2, 500)) + 1j * rng.normal(size=(2, 500))).astype(
        np.complex64
    )
    np.testing.assert_array_equal(pack_iq(x), _ref(x))
    # complex128 input: native declines, numpy fallback still packs
    np.testing.assert_array_equal(
        pack_iq(x.astype(np.complex128)), _ref(x.astype(np.complex128))
    )

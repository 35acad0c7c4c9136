"""GLLib packers and the float16 interchange helpers (utils/glpack.py,
porting gllib.js:82-90 and the arrays.js Float16Array — the latter is
dead code in the reference's live path (all texImage2D HALF_FLOAT calls
are commented out, pathtracerWGL2.js:180-187), so IEEE round-to-nearest
conversion stands in for its manual bit twiddling)."""

import numpy as np

from flexlight_tpu.utils.glpack import (float16_bits_to_float32,
                                        float32_to_float16_bits, to_bytes,
                                        to_float)


def test_to_bytes_to_float_roundtrip():
    for x in (-255.0, -128.37, -1.0, 0.0, 0.123, 1.0, 77.7, 254.99):
        b = to_bytes(x)
        assert b.shape == (4,) and (b >= 0).all() and (b <= 255).all()
        # 4 byte channels encode [-255, 255] to ~1/16581375 resolution
        assert abs(to_float(b) - x) < 1e-4, x


def test_to_bytes_endpoint_wraps_like_reference():
    # gllib.js:85-90 computes floor(v % 255): the exact top endpoint wraps
    # every channel to 0 and decodes as -255 — faithful reference quirk.
    assert to_float(to_bytes(255.0)) == -255.0


def test_to_float_known_vector():
    # all-zero channels decode to the range minimum (gllib.js:82)
    assert to_float([0, 0, 0, 0]) == -255.0
    np.testing.assert_allclose(to_float([254, 254, 254, 254]), 255.0,
                               atol=0.01)


def test_float16_bits_roundtrip():
    vals = np.array([0.0, 1.0, -2.5, 0.1, 65504.0, 6e-5, -6e-8],
                    dtype=np.float32)
    bits = float32_to_float16_bits(vals)
    assert bits.dtype == np.uint16
    back = float16_bits_to_float32(bits)
    np.testing.assert_allclose(back, vals.astype(np.float16).astype(np.float32))
    # known IEEE754 half patterns
    assert float32_to_float16_bits([1.0])[0] == 0x3C00
    assert float32_to_float16_bits([-2.0])[0] == 0xC000
    assert float32_to_float16_bits([0.0])[0] == 0x0000
